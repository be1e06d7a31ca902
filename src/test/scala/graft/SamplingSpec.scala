package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.{Mixing, Sampling}

class SamplingSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    ((0 until 40).map(i => (s"s${i % 3}", Option(i.toLong))) :+
      (("s0", Option.empty[Long])))
      .toDF("src", "id")
  }

  "bottomKSample" should {
    "equal the row_number window reference, nulls never sampled" in {
      val k = 4
      val w = Window.partitionBy(col("src"))
        .orderBy(Mixing.sampleHash(col("id"), "graft"), col("id"))
      val ref = docs.where(col("id").isNotNull)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("src", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val got = Sampling.bottomKSample(docs, Seq("src"), "id", k)
        .select("src", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      got shouldBe ref
      got.size shouldBe 3 * k
    }

    "fold batches in any order into the full-build sample exactly" in {
      val k = 4
      val full = Sampling.bottomKSample(docs, Seq("src"), "id", k)
        .collect().map(_.toSeq).toSet
      // late half first; a group's winners split across both halves
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sample").toString
      Sampling.bottomKSample(docs.where(col("id") >= 20), Seq("src"),
        "id", k).write.mode("overwrite").parquet(dir)
      val merged = Sampling.mergeSamples(
        spark.read.parquet(dir),
        Sampling.bottomKSample(docs.where(col("id") < 20), Seq("src"),
          "id", k),
        Seq("src"), "id", k)
      merged.collect().map(_.toSeq).toSet shouldBe full
    }

    "skip null ids instead of crashing, dropping all-null groups" in {
      val s = spark
      import s.implicits._
      // one group entirely null-id: it must vanish from the sample, not
      // fail the input encoder's AssertNotNull
      val df = ((0 until 6).map(i => ("live", Option(i.toLong))) ++
        (0 until 4).map(_ => ("ghost", Option.empty[Long])))
        .toDF("src", "id")
      val got = Sampling.bottomKSample(df, Seq("src"), "id", 3)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      got.map(_._1).toSet shouldBe Set("live")
      got.length shouldBe 3
    }

    "use the bounded-heap aggregate, never a WindowExec" in {
      val out = Sampling.bottomKSample(docs, Seq("src"), "id", 3)
      out.count()
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      plan should not include "Window"
      plan should include("ObjectHashAggregate")
    }

    "reject non-integral ids" in {
      val s = spark
      import s.implicits._
      an[IllegalArgumentException] should be thrownBy
        Sampling.bottomKSample(Seq(("a", "x")).toDF("g", "id"),
          Seq("g"), "id", 3)
    }
  }
}
