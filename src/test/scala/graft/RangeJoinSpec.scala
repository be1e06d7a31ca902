package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class RangeJoinSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def points = {
    val s = spark
    import s.implicits._
    Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L), (5L, 23L))
      .toDF("pid", "p")
  }

  private def intervals = {
    val s = spark
    import s.implicits._
    Seq(
      (10L, 0L, 10L, "a"),   // catches 5 and 10 (inclusive hi)
      (11L, 10L, 24L, "b"),  // catches 10, 17, 23 — spans 3 bins at w=8
      (12L, 50L, 60L, "c"),  // catches nothing
      (13L, 30L, 20L, "d"))  // inverted: dropped
      .toDF("iid", "lo", "hi", "tag")
  }

  private def pairs(w: Long) =
    RangeJoin.rangeJoin(points, intervals, "p", "lo", "hi",
        binWidth = w, payloadCols = Seq("iid", "tag"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("pid")),
        r.getLong(r.fieldIndex("rj_iid"))))
      .toSet

  "rangeJoin" should {
    "emit every in-range pair exactly once, inclusive on both bounds" in {
      val expected = Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
        (5L, 11L))
      pairs(w = 8) shouldBe expected
      // bin width must not change the answer, only the plan
      pairs(w = 1) shouldBe expected
      pairs(w = 1000) shouldBe expected
    }

    "respect extra equi-keys" in {
      val s = spark
      import s.implicits._
      val p = Seq((1L, "u1", 5L), (2L, "u2", 5L)).toDF("pid", "user", "p")
      val i = Seq(("u1", 0L, 10L, 7L)).toDF("user", "lo", "hi", "iid")
      val out = RangeJoin.rangeJoin(p, i, "p", "lo", "hi", binWidth = 4,
        extraKeyCols = Seq("user"), payloadCols = Seq("iid"))
      out.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    }

    "fail loudly on an interval wider than the bin cap" in {
      val s = spark
      import s.implicits._
      val p = Seq((1L, 5L)).toDF("pid", "p")
      val i = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
      val ex = intercept[Exception] {
        RangeJoin.rangeJoin(p, i, "p", "lo", "hi", binWidth = 1,
          maxBinsPerInterval = 100, payloadCols = Seq("iid")).collect()
      }
      ex.getMessage should include("rangeJoin")
    }

    "plan an equi-join, never a nested loop or cartesian product" in {
      val out = RangeJoin.rangeJoin(points, intervals, "p", "lo", "hi",
        binWidth = 8, payloadCols = Seq("iid"))
      out.collect()
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
      (plan.contains("BroadcastHashJoin") ||
        plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin")) shouldBe true
    }

    "reject bad contracts" in {
      an[IllegalArgumentException] should be thrownBy
        RangeJoin.rangeJoin(points, intervals, "p", "lo", "hi",
          binWidth = 0)
      an[IllegalArgumentException] should be thrownBy
        RangeJoin.rangeJoin(points.withColumnRenamed("pid", "rj_pid"),
          intervals, "p", "lo", "hi", binWidth = 8)
    }
  }

  "intervalOverlapJoin" should {
    def leftIv = {
      val s = spark
      import s.implicits._
      Seq(
        (1L, 0L, 10L),    // overlaps A (touching at 10) and B
        (2L, 15L, 40L),   // overlaps B, C
        (3L, 100L, 110L), // overlaps nothing
        (4L, 60L, 50L))   // inverted: dropped
        .toDF("lid", "llo", "lhi")
    }
    def rightIv = {
      val s = spark
      import s.implicits._
      Seq(
        (10L, 10L, 20L, "A"),
        (11L, 5L, 30L, "B"),
        (12L, 35L, 45L, "C"))
        .toDF("rid", "rlo", "rhi", "tag")
    }
    def overlapPairs(w: Long): Set[(Long, Long)] =
      RangeJoin.intervalOverlapJoin(leftIv, rightIv,
          "llo", "lhi", "rlo", "rhi", binWidth = w,
          payloadCols = Seq("rid"))
        .collect()
        .map(r => (r.getLong(r.fieldIndex("lid")),
          r.getLong(r.fieldIndex("oj_rid")))).toSet

    "emit each intersecting pair exactly once, inclusive bounds" in {
      val expected = Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
        (2L, 12L))
      overlapPairs(8) shouldBe expected
      overlapPairs(1) shouldBe expected
      overlapPairs(1000) shouldBe expected
    }

    "never duplicate a pair sharing many bins" in {
      val s = spark
      import s.implicits._
      val l = Seq((1L, 0L, 100L)).toDF("lid", "llo", "lhi")
      val r = Seq((9L, 0L, 100L)).toDF("rid", "rlo", "rhi")
      val out = RangeJoin.intervalOverlapJoin(l, r, "llo", "lhi",
        "rlo", "rhi", binWidth = 3, payloadCols = Seq("rid"))
      out.count() shouldBe 1
    }

    "respect extra keys" in {
      val s = spark
      import s.implicits._
      val l = Seq((1L, "u1", 0L, 10L), (2L, "u2", 0L, 10L))
        .toDF("lid", "user", "llo", "lhi")
      val r = Seq(("u1", 5L, 15L, 7L)).toDF("user", "rlo", "rhi", "rid")
      val out = RangeJoin.intervalOverlapJoin(l, r, "llo", "lhi",
        "rlo", "rhi", binWidth = 8, extraKeyCols = Seq("user"),
        payloadCols = Seq("rid"))
      out.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    }
  }
}
