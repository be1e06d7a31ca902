package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class ScdSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def history = {
    val s = spark
    import s.implicits._
    Seq(
      // user 1: gold -> gold (collapse) -> silver -> gold
      (1L, 10L, "gold", 100L),
      (1L, 20L, "gold", 101L),
      (1L, 30L, "silver", 102L),
      (1L, 40L, "gold", 103L),
      // user 2: one state, null attr transitions
      (2L, 10L, null, 200L),
      (2L, 20L, null, 201L), // collapses into the null version
      (2L, 30L, "bronze", 202L))
      .toDF("user", "ts", "tier", "eid")
  }

  private def scd =
    Scd.scdType2(history, Seq("user"), "ts", Seq("tier"),
      tiebreakCols = Seq("eid"))

  "scdType2" should {
    "collapse unchanged runs and emit closed/open validity intervals" in {
      val rows = scd.collect().map(r => (
        r.getLong(r.fieldIndex("user")),
        r.getInt(r.fieldIndex("version")),
        Option(r.get(r.fieldIndex("tier"))).orNull,
        r.getLong(r.fieldIndex("valid_from")),
        if (r.isNullAt(r.fieldIndex("valid_to"))) -1L
        else r.getLong(r.fieldIndex("valid_to")),
        r.getBoolean(r.fieldIndex("is_current")))).toSet
      rows shouldBe Set(
        (1L, 1, "gold", 10L, 30L, false),
        (1L, 2, "silver", 30L, 40L, false),
        (1L, 3, "gold", 40L, -1L, true),
        (2L, 1, null, 10L, 30L, false),
        (2L, 2, "bronze", 30L, -1L, true))
    }

    "reconstruct half-open point-in-time snapshots" in {
      def snap(t: Long): Set[(Long, String)] =
        Scd.snapshotAt(scd, lit(t)).collect()
          .map(r => (r.getLong(r.fieldIndex("user")),
            Option(r.get(r.fieldIndex("tier"))).map(_.toString).orNull))
          .toSet
      snap(5L) shouldBe Set.empty
      snap(10L) shouldBe Set((1L, "gold"), (2L, null))
      snap(29L) shouldBe Set((1L, "gold"), (2L, null))
      snap(30L) shouldBe Set((1L, "silver"), (2L, "bronze"))
      snap(100L) shouldBe Set((1L, "gold"), (2L, "bronze"))
    }

    "shuffle once — every windowed step reuses the key partitioning" in {
      val out = scd
      out.collect()
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      plan should not include "Join"
      plan.linesIterator
        .count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }

    "reject reserved column names" in {
      an[IllegalArgumentException] should be thrownBy
        Scd.scdType2(history.withColumnRenamed("eid", "version"),
          Seq("user"), "ts", Seq("tier"))
      an[IllegalArgumentException] should be thrownBy
        Scd.scdType2(history, Seq("user"), "ts", Seq.empty)
    }
  }
}
