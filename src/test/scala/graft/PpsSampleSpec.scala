package graft

import graft.pipeline.{Mixing, Ranking}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class PpsSampleSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def sample(weights: Seq[Long], k: Int): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = weights.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    Mixing.ppsSystematicSample(df, "id", "w", k)
      .orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("pps_mult")))).toSeq
  }

  "ppsSystematicSample" should {
    "space probes evenly over uniform weights" in {
      // W=4, k=2 -> probes at 1 and 3 -> rows 1 and 3 hit once
      sample(Seq(1L, 1L, 1L, 1L), k = 2) shouldBe
        Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L))
    }

    "hit a heavy row once per probe inside its span" in {
      // W=12, k=3 -> probes at 2, 6, 10: row0 [0,10) takes 2 and 6,
      // row1 [10,11) takes 10, row2 [11,12) takes none
      sample(Seq(10L, 1L, 1L), k = 3) shouldBe
        Seq((0L, 2L), (1L, 1L), (2L, 0L))
    }

    "conserve exactly k hits and skip zero-weight rows" in {
      val out = sample(Seq(3L, 0L, 5L, 0L, 2L, 7L, 1L), k = 5)
      out.map(_._2).sum shouldBe 5L
      out.filter(_._2 > 0).map(_._1) should not contain 1L
      out.filter(_._2 > 0).map(_._1) should not contain 3L
    }

    "reject empty and overflowing inputs" in {
      val s = spark
      import s.implicits._
      an[IllegalArgumentException] should be thrownBy
        Mixing.ppsSystematicSample(
          Seq((1L, 0L)).toDF("id", "w"), "id", "w", 5)
      an[IllegalArgumentException] should be thrownBy
        Mixing.ppsSystematicSample(
          Seq((1L, Long.MaxValue / 2)).toDF("id", "w"), "id", "w", 5)
    }
  }

  "topKPerGroup" should {
    "match the window contract on a multi-group frame" in {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(3)
      val df = Seq.tabulate(300)(i =>
        (s"g${i % 5}", i.toLong, rnd.nextInt(50).toDouble))
        .toDF("g", "id", "score")
      val got = Ranking.topKPerGroup(df, "g", "id", "score", k = 4)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
      val want = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 4).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      got shouldBe want
    }
  }
}
