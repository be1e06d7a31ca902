package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.operators.EventAnalytics

/** Incremental funnel over the bounded per-(key, step) state (q146):
  * replay == batch funnel wherever the replay claims exactness, the
  * state folds across parquet-staged batches in any order, and the
  * truncation case is flagged (and only ever UNDER-counts).
  */
class FunnelIncrementalSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val stepCols = Seq(
    col("et") === "s0", col("et") === "s1", col("et") === "s2")

  private def events(rows: Seq[(String, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user", "ts", "et")
  }

  /** Deterministic pseudo-random timeline over 40 users. */
  private def fixture: Seq[(String, Long, String)] = {
    val rnd = new scala.util.Random(19)
    (0 until 1200).map { i =>
      (s"u${rnd.nextInt(40)}", rnd.nextInt(100000).toLong,
        s"s${rnd.nextInt(3)}")
    }
  }

  private def batchFunnel(df: DataFrame): Map[String, (Seq[Any], Long)] =
    EventAnalytics.funnel(df, Seq("user"), "ts", stepCols)
      .collect().map { r =>
        r.getString(0) -> (Seq(r.get(1), r.get(2), r.get(3)),
          r.getLong(r.fieldIndex("steps_completed")))
      }.toMap

  private def replayed(state: DataFrame): Map[String, (Seq[Any], Long, Boolean)] =
    EventAnalytics.funnelFromState(state, 3)
      .collect().map { r =>
        r.getString(0) -> (Seq(r.get(1), r.get(2), r.get(3)),
          r.getLong(r.fieldIndex("steps_completed")),
          r.getBoolean(r.fieldIndex("exact")))
      }.toMap

  "funnelFromState" should {
    "match the batch funnel exactly when the cap holds every event" in {
      val df = events(fixture)
      val state = EventAnalytics.funnelState(df, Seq("user"), "ts", stepCols,
        cap = 2000)
      val rep = replayed(state)
      val exact = batchFunnel(df)
      rep.keySet shouldBe exact.keySet
      rep.foreach { case (u, (ts, n, ex)) =>
        ex shouldBe true
        (ts, n) shouldBe exact(u)
      }
    }

    "fold parquet-staged batch states in any order to the same replay" in {
      val all = fixture
      val (b1, rest) = all.splitAt(400)
      val (b2, b3) = rest.splitAt(400)
      val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
      try {
        val cap = 64
        def st(rows: Seq[(String, Long, String)]) =
          EventAnalytics.funnelState(events(rows), Seq("user"), "ts",
            stepCols, cap)
        st(b2).write.mode("overwrite").parquet(s"$dir/s2")
        val folded = EventAnalytics.mergeFunnelStates(
          EventAnalytics.mergeFunnelStates(
            spark.read.parquet(s"$dir/s2"), st(b3), cap), st(b1), cap)
        val full = st(all)
        replayed(folded) shouldBe replayed(full)
        // cap 64 > any per-(user, step) count in this fixture: exact
        val rep = replayed(folded)
        rep.values.foreach(_._3 shouldBe true)
        rep.mapValues(v => (v._1, v._2)).toMap shouldBe batchFunnel(events(all))
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }

    "flag truncation instead of silently undercounting" in {
      // u1: step-1 events crowd the cap BELOW the step-0 match; the true
      // chain continues at ts=200 but the replay cannot see it -> exact
      // false, stalled (undercount, flagged). u2: clean chain.
      val rows =
        Seq(("u1", 100L, "s0")) ++
          (1L to 10L).map(t => ("u1", t, "s1")) ++
          Seq(("u1", 200L, "s1"), ("u1", 300L, "s2"),
            ("u2", 10L, "s0"), ("u2", 20L, "s1"), ("u2", 30L, "s2"))
      val state = EventAnalytics.funnelState(events(rows), Seq("user"), "ts",
        stepCols, cap = 4)
      val rep = replayed(state)
      val exact = batchFunnel(events(rows))
      rep("u2")._3 shouldBe true
      (rep("u2")._1, rep("u2")._2) shouldBe exact("u2")
      rep("u1")._3 shouldBe false
      rep("u1")._2 should be <= exact("u1")._2 // never overcounts
      rep("u1")._2 shouldBe 1L // stalled at t0
    }

    "treat an event matching several steps like the batch funnel" in {
      val s = spark
      import s.implicits._
      val df = Seq(("u", 1L, "both"), ("u", 5L, "b")) .toDF("user", "ts", "et")
      val steps = Seq(col("et") === "both" || col("et") === "b",
        col("et") === "both" || col("et") === "b")
      val state = EventAnalytics.funnelState(df, Seq("user"), "ts", steps, 10)
      val rep = EventAnalytics.funnelFromState(state, 2).collect().head
      val bat = EventAnalytics.funnel(df, Seq("user"), "ts", steps)
        .collect().head
      rep.getAs[Long]("t0") shouldBe bat.getAs[Long]("t0")
      rep.getAs[Long]("t1") shouldBe bat.getAs[Long]("t1")
      rep.getAs[Long]("steps_completed") shouldBe 2L
    }
  }
}
