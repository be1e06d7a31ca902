package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.sketch.Theta

class ThetaSpec extends AnyWordSpec with Matchers with SparkSpec {

  "Theta" should {
    "be exact below nominal entries for all five set estimates" in {
      val s = spark
      import s.implicits._
      // A = 0..599, B = 400..999 per group; intersection 200, union 1000
      val a = (0 until 600).map(i => ("g", i.toLong)).toDF("g", "v")
      val b = (400 until 1000).map(i => ("g", i.toLong)).toDF("g", "v")
      val r = Theta.overlap(
        Theta.thetaState(a, Seq("g"), Seq("v")),
        Theta.thetaState(b, Seq("g"), Seq("v"))).collect().head
      r.getAs[Long]("est_a") shouldBe 600L
      r.getAs[Long]("est_b") shouldBe 600L
      r.getAs[Long]("est_union") shouldBe 1000L
      r.getAs[Long]("est_intersect") shouldBe 200L
      r.getAs[Long]("est_a_not_b") shouldBe 400L
    }

    "fold parquet-staged batches in any order (union monoid)" in {
      val s = spark
      import s.implicits._
      val all = (0 until 3000).map(i => (s"g${i % 2}", (i * 7 % 2200).toLong))
        .toDF("g", "v")
      val full = Theta.thetaState(all, Seq("g"), Seq("v"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft-theta").toString
      Theta.writeState(
        Theta.thetaState(all.where(col("v") >= 1100), Seq("g"), Seq("v")),
        dir)
      val merged = Theta.mergeStates(
        Theta.readState(spark, dir),
        Theta.thetaState(all.where(col("v") < 1100), Seq("g"), Seq("v")))
      val fe = Theta.overlap(full, full).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("est_a")).toMap
      val me = Theta.overlap(merged, merged).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("est_a")).toMap
      me shouldBe fe
    }

    "report one-sided groups through the full outer join" in {
      val s = spark
      import s.implicits._
      val a = Seq(("only_a", 1L), ("both", 1L)).toDF("g", "v")
      val b = Seq(("only_b", 2L), ("both", 1L)).toDF("g", "v")
      val r = Theta.overlap(
        Theta.thetaState(a, Seq("g"), Seq("v")),
        Theta.thetaState(b, Seq("g"), Seq("v"))).collect()
        .map(x => x.getString(0) -> ((x.getAs[Long]("est_a"),
          x.getAs[Long]("est_b"), x.getAs[Long]("est_intersect"),
          x.getAs[Long]("est_a_not_b")))).toMap
      r("only_a") shouldBe ((1L, 0L, 0L, 1L))
      r("only_b") shouldBe ((0L, 1L, 0L, 0L))
      r("both") shouldBe ((1L, 1L, 1L, 0L))
    }

    "stay within tolerance in estimation mode" in {
      val s = spark
      import s.implicits._
      // 40k distinct per side, 20k shared — above 2^12 nominal entries
      val a = (0 until 40000).map(i => ("g", i.toLong)).toDF("g", "v")
      val b = (20000 until 60000).map(i => ("g", i.toLong)).toDF("g", "v")
      val r = Theta.overlap(
        Theta.thetaState(a, Seq("g"), Seq("v")),
        Theta.thetaState(b, Seq("g"), Seq("v"))).collect().head
      math.abs(r.getAs[Long]("est_union") - 60000.0) / 60000.0 should be < 0.05
      math.abs(r.getAs[Long]("est_intersect") - 20000.0) / 20000.0 should be < 0.10
    }
  }
}
