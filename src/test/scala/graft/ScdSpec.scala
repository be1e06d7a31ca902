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

  private def rowsOf(df: org.apache.spark.sql.DataFrame) = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toList).toSet
  }

  "applyChanges" should {
    "equal the full rebuild when a later batch folds into a prior build" in {
      // split mid-collapse: user 1's batch opens with an UNCHANGED gold
      // row (must collapse into the seed), user 2's with an unchanged
      // null row (null-safe collapse)
      val first = history.where(col("ts") <= 15)
      val batch = history.where(col("ts") > 15)
      val merged = Scd.applyChanges(
        Scd.scdType2(first, Seq("user"), "ts", Seq("tier"),
          tiebreakCols = Seq("eid")),
        batch, Seq("user"), "ts", Seq("tier"), tiebreakCols = Seq("eid"))
      rowsOf(merged) shouldBe rowsOf(scd)
    }

    "handle brand-new keys, untouched keys, and pure-collapse batches" in {
      val s = spark
      import s.implicits._
      val full = history.unionByName(Seq(
        (3L, 50L, "iron", 300L), // key only in the batch
        (4L, 5L, "gold", 400L)) // key only in the prior build
        .toDF("user", "ts", "tier", "eid"))
      val first = full.where(col("ts") <= 20)
      val batch = full.where(col("ts") > 20)
      val prior = Scd.scdType2(first, Seq("user"), "ts", Seq("tier"),
        tiebreakCols = Seq("eid"))
      val merged = Scd.applyChanges(prior, batch, Seq("user"), "ts",
        Seq("tier"), tiebreakCols = Seq("eid"))
      rowsOf(merged) shouldBe rowsOf(
        Scd.scdType2(full, Seq("user"), "ts", Seq("tier"),
          tiebreakCols = Seq("eid")))
      // a batch that changes nothing returns the dimension unchanged
      val noop = Scd.applyChanges(prior,
        Seq((4L, 30L, "gold", 401L)).toDF("user", "ts", "tier", "eid"),
        Seq("user"), "ts", Seq("tier"), tiebreakCols = Seq("eid"))
      rowsOf(noop.drop("eid")) shouldBe rowsOf(prior.drop("eid"))
    }

    "equal the full rebuild on a randomized stream at every split point" in {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(4242)
      val stream = (0 until 400).map { i =>
        (rnd.nextInt(12).toLong, (rnd.nextInt(50) * 10).toLong,
          s"s${rnd.nextInt(3)}", i.toLong)
      }.toDF("user", "ts", "tier", "eid")
      val fullScd = Scd.scdType2(stream, Seq("user"), "ts", Seq("tier"),
        tiebreakCols = Seq("eid"))
      val expected = rowsOf(fullScd)
      // split on ts so every batch row orders at-or-after its key's
      // current version (the documented ingest contract); eid tiebreak
      // makes equal-ts ordering deterministic — but equal-ts rows MUST
      // stay in the same half, so split between distinct ts values
      Seq(100L, 250L, 400L).foreach { cut =>
        val merged = Scd.applyChanges(
          Scd.scdType2(stream.where(col("ts") <= cut), Seq("user"), "ts",
            Seq("tier"), tiebreakCols = Seq("eid")),
          stream.where(col("ts") > cut),
          Seq("user"), "ts", Seq("tier"), tiebreakCols = Seq("eid"))
        rowsOf(merged) shouldBe expected
      }
    }

    "never reshuffle or re-sort the parquet-staged closed history" in {
      // the production shape: yesterday's dimension reloaded from disk
      val dir = java.nio.file.Files
        .createTempDirectory("graft-scd-inc").toString
      Scd.scdType2(history.where(col("ts") <= 15), Seq("user"), "ts",
        Seq("tier"), tiebreakCols = Seq("eid"))
        .write.mode("overwrite").parquet(dir)
      val prior = spark.read.parquet(dir)
      val merged = Scd.applyChanges(prior,
        history.where(col("ts") > 15), Seq("user"), "ts", Seq("tier"),
        tiebreakCols = Seq("eid"))
      merged.collect()
      val plan = merged.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      // only the mini rebuild windows (scdType2's lag pass + merged
      // lead/row_number pass) — the closed and untouched history slices
      // union in with no Window or Sort of their own
      plan.linesIterator.count(_.trim.startsWith("Window")) should be <= 2
    }
  }
}
