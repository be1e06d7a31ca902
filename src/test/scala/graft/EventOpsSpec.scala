package graft

import graft.operators.{EventAnalytics, Sessionize}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class EventOpsSpec extends AnyWordSpec with Matchers with SparkSpec {

  "sessionize" should {
    def evts = {
      val s = spark
      import s.implicits._
      Seq(
        (1L, 100L, 1L), (1L, 130L, 2L), (1L, 131L, 3L), // session 1
        (1L, 500L, 4L),                                 // session 2
        (1L, 531L, 5L),                                 // session 3 (gap 31)
        (2L, 10L, 6L))                                  // own key
        .toDF("user", "ts", "eid")
    }

    "split on strict gap threshold and number per key" in {
      val out = Sessionize.sessionize(evts, Seq("user"), "ts",
          gapThreshold = 30L, tiebreakCols = Seq("eid"))
        .collect()
        .map(r => (r.getLong(r.fieldIndex("eid")),
          r.getLong(r.fieldIndex("session_id")))).toMap
      out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
        5L -> 3L, 6L -> 1L)
    }

    "roll sessions up with exact durations" in {
      val sess = Sessionize.sessionize(evts, Seq("user"), "ts",
        gapThreshold = 30L, tiebreakCols = Seq("eid"))
      val stats = Sessionize.sessionStats(sess, Seq("user"), "ts")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(r.fieldIndex("n_events")),
            r.getLong(r.fieldIndex("duration"))))).toMap
      stats((1L, 1L)) shouldBe ((3L, 31L))
      stats((1L, 2L)) shouldBe ((1L, 0L))
      stats((2L, 1L)) shouldBe ((1L, 0L))
    }

    "shuffle once across both windowed steps" in {
      val out = Sessionize.sessionize(evts, Seq("user"), "ts",
        gapThreshold = 30L, tiebreakCols = Seq("eid"))
      out.collect()
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      plan.linesIterator
        .count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }
  }

  "applySessions" should {
    def rowsOf(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(r.get).toList).toSet
    }
    def statsOf(e: org.apache.spark.sql.DataFrame, gap: Long) =
      Sessionize.sessionStats(
        Sessionize.sessionize(e, Seq("user"), "ts", gap,
          tiebreakCols = Seq("eid")),
        Seq("user"), "ts").drop("eid")

    "equal the full rebuild: boundary merge, new session, new key" in {
      val s = spark
      import s.implicits._
      val all = Seq(
        // user 1: batch event at 150 lands within gap 30 of 130 -> MERGE
        (1L, 100L, 1L), (1L, 130L, 2L), (1L, 150L, 3L), (1L, 400L, 4L),
        // user 2: batch event far after -> new session
        (2L, 10L, 5L), (2L, 300L, 6L),
        // user 3: untouched by the batch
        (3L, 50L, 7L),
        // user 4: only in the batch
        (4L, 200L, 8L), (4L, 260L, 9L))
        .toDF("user", "ts", "eid")
      val first = all.where(col("ts") <= 130)
      val batch = all.where(col("ts") > 130)
      val merged = Sessionize.applySessions(
        statsOf(first, 30L), batch, Seq("user"), "ts",
        gapThreshold = 30L, tiebreakCols = Seq("eid"))
      rowsOf(merged) shouldBe rowsOf(statsOf(all, 30L))
      // the merge actually happened: user 1 session 1 spans 100..150
      merged.where(col("user") === 1L && col("session_id") === 1L)
        .select("n_events", "session_start", "session_end").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq shouldBe Seq((3L, 100L, 150L))
    }

    "equal the full rebuild on a randomized stream at every split" in {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(99)
      val stream = (0 until 400).map { i =>
        (rnd.nextInt(10).toLong, (rnd.nextInt(300) * 10).toLong, i.toLong)
      }.distinct.toDF("user", "ts", "eid")
        // strict-after contract: one event per (user, ts)
        .groupBy("user", "ts").agg(min(col("eid")).as("eid"))
      val full = rowsOf(statsOf(stream, 40L))
      Seq(500L, 1500L, 2500L).foreach { cut =>
        val merged = Sessionize.applySessions(
          statsOf(stream.where(col("ts") <= cut), 40L),
          stream.where(col("ts") > cut),
          Seq("user"), "ts", gapThreshold = 40L,
          tiebreakCols = Seq("eid"))
        withClue(s"cut=$cut: ") { rowsOf(merged) shouldBe full }
      }
    }

    "never window the parquet-staged session history" in {
      val s = spark
      import s.implicits._
      val all = Seq((1L, 100L, 1L), (1L, 130L, 2L), (1L, 500L, 3L),
        (2L, 10L, 4L), (2L, 700L, 5L)).toDF("user", "ts", "eid")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sess-inc").toString
      statsOf(all.where(col("ts") <= 200), 30L)
        .write.mode("overwrite").parquet(dir)
      val merged = Sessionize.applySessions(
        spark.read.parquet(dir), all.where(col("ts") > 200),
        Seq("user"), "ts", gapThreshold = 30L, tiebreakCols = Seq("eid"))
      merged.collect()
      val plan = merged.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      // exactly the batch's own sessionize window — history only joins
      plan.linesIterator.count(_.trim.startsWith("Window")) should be <= 1
    }
  }

  "funnel" should {
    def evts = {
      val s = spark
      import s.implicits._
      Seq(
        // user 1 completes view->click->buy in order
        (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
        // user 2: click BEFORE view only — stalls after view
        (2L, 10L, "click"), (2L, 20L, "view"),
        // user 3: view then buy (no click) — stalls at step 1
        (3L, 10L, "view"), (3L, 40L, "buy"),
        // user 4: never views — not in the funnel at all
        (4L, 10L, "buy"),
        // user 5: simultaneous view/click — strict > excludes the click
        (5L, 10L, "view"), (5L, 10L, "click"))
        .toDF("user", "ts", "etype")
    }
    def funnelled = EventAnalytics.funnel(evts, Seq("user"), "ts",
      Seq(col("etype") === "view", col("etype") === "click",
        col("etype") === "buy"))

    "walk strictly-ordered steps per key" in {
      val out = funnelled.collect()
        .map(r => r.getLong(r.fieldIndex("user")) ->
          r.getLong(r.fieldIndex("steps_completed"))).toMap
      out shouldBe Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 5L -> 1L)
    }

    "census step populations and lag mass" in {
      val r = EventAnalytics.funnelCensus(funnelled, 3).collect().head
      val m = r.schema.fieldNames.zip(r.toSeq).toMap
      m("step0_users") shouldBe 4L
      m("step1_users") shouldBe 1L
      m("step2_users") shouldBe 1L
      m("step1_lag_sum") shouldBe 10L
      m("step2_lag_sum") shouldBe 10L
    }
  }

  "activityState / mergeActivity" should {
    "fold batches in ANY order into the full-stream retention matrix" in {
      val s = spark
      import s.implicits._
      val all = Seq(
        (1L, 5L), (1L, 12L), (1L, 13L), (2L, 12L), (2L, 25L), (3L, 30L))
        .toDF("user", "ts")
      val per = (_: org.apache.spark.sql.Column) => expr("ts div 10")
      def st(df: org.apache.spark.sql.DataFrame) =
        EventAnalytics.activityState(df, Seq("user"), "ts", per)
      val full = st(all)
      // split mid-period (user 1 active in period 1 on BOTH sides: the
      // distinct union must not double-count) and fold LATE batch FIRST
      // (no ordering contract — commutative monoid)
      val merged = EventAnalytics.mergeActivity(
        st(all.where(col("ts") > 12)), st(all.where(col("ts") <= 12)))
      merged.exceptAll(full).count() shouldBe 0L
      full.exceptAll(merged).count() shouldBe 0L
      val m = EventAnalytics.cohortRetentionFromState(merged, Seq("user"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      m shouldBe Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L,
        (1L, 1L) -> 1L, (3L, 0L) -> 1L)
    }
  }

  "cohortRetention" should {
    "bucket keys by first period and count activity offsets" in {
      val s = spark
      import s.implicits._
      val evts = Seq(
        (1L, 0L), (1L, 5L), (1L, 17L),  // cohort 0, active periods 0,1
        (2L, 12L), (2L, 25L),           // cohort 1, active 1,2
        (3L, 3L))                       // cohort 0, active 0
        .toDF("user", "ts")
      val out = EventAnalytics.cohortRetention(evts, Seq("user"), "ts",
          ts => floor(ts / 10))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      out shouldBe Map((0L, 0L) -> 2L, (0L, 1L) -> 1L,
        (1L, 0L) -> 1L, (1L, 1L) -> 1L)
    }
  }
}
