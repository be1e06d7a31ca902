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
