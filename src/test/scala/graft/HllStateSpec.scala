package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.sketch.HllState

class HllStateSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def events(n: Int, keys: Int, groups: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i =>
      (s"g${i % groups}", (i * 31) % keys)).toDF("g", "v")
  }

  "HllState" should {
    "estimate per-group distincts within the sketch tolerance" in {
      val df = events(20000, 1500, 4)
      val est = HllState.estimates(
        HllState.distinctState(df, Seq("g"), Seq("v")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = df.groupBy("g").agg(countDistinct(col("v")).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (g, d) =>
        withClue(s"group $g: ") {
          math.abs(est(g) - d).toDouble / d should be < 0.05
        }
      }
    }

    "fold batches in any order into the full-build estimates exactly" in {
      val df = events(20000, 1500, 4)
      val full = HllState.estimates(
        HllState.distinctState(df, Seq("g"), Seq("v")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // late batch first — per-register max commutes; values shared
      // across batches must not double-count
      val dir = java.nio.file.Files
        .createTempDirectory("graft-hll").toString
      HllState.writeState(HllState.distinctState(
        df.where(col("v") >= 700), Seq("g"), Seq("v")), dir)
      val merged = HllState.mergeStates(
        HllState.readState(spark, dir),
        HllState.distinctState(df.where(col("v") < 700), Seq("g"), Seq("v")))
      val m = HllState.estimates(merged)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      m shouldBe full
    }

    "bridge multi-column values through the hash" in {
      val s = spark
      import s.implicits._
      val df = Seq(("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"),
        ("a", 2, "x")).toDF("g", "u", "w")
      HllState.estimates(
        HllState.distinctState(df, Seq("g"), Seq("u", "w")))
        .collect().head.getLong(1) shouldBe 3L
    }
  }
}
