package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators over keyed timelines: ordered funnels and
  * cohort retention. Both decompose into slim per-key aggregations —
  * no per-user window over raw events, no sequence state that cannot
  * merge.
  */
object EventAnalytics {

  /** Ordered funnel: for each key, step k matches at the EARLIEST event
    * satisfying `steps(k)` STRICTLY after the step k-1 match (step 0 at
    * the key's earliest matching event). Returns one row per key that
    * completed step 0: key columns, `t0..t(n-1)` match timestamps (null
    * once the funnel stalls) and `steps_completed`.
    *
    * Each step is one filtered slim aggregation joined on the key — n
    * steps cost n slim shuffles of per-key 1-row frames, never a
    * per-key sort of the raw timeline; the earliest-after-t recurrence
    * is exactly the textbook funnel semantics and is replayable in ANSI
    * SQL.
    *
    * DELIBERATELY batch-only: unlike the SCD2/session/cohort states,
    * the per-key (t0..tn) vector is NOT a foldable state — a batch
    * event matching an EARLIER step can re-qualify history events the
    * previous run discarded (a first signup arriving today makes last
    * month's views eligible as step 1), so an exact increment needs the
    * event log, not the funnel output. Incremental funnels therefore
    * recompute over the retained window; an approximate forward-only
    * variant would silently under-count re-qualified keys.
    */
  def funnel(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      steps: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "funnel needs at least one key column")
    require(steps.nonEmpty, "funnel needs at least one step predicate")
    val keys = keyCols.map(col)
    val t0 = events.where(steps.head)
      .groupBy(keys: _*).agg(min(col(tsCol)).as("t0"))
    val chained = steps.zipWithIndex.tail.foldLeft(t0) {
      case (acc, (step, i)) =>
        val prev = s"t${i - 1}"
        val ti = events.where(step)
          .join(acc.select((keyCols :+ prev).map(col): _*), keyCols)
          .where(col(tsCol) > col(prev))
          .groupBy(keys: _*).agg(min(col(tsCol)).as(s"t$i"))
        acc.join(ti, keyCols, "left_outer")
    }
    val tCols = steps.indices.map(i => col(s"t$i"))
    chained.withColumn("steps_completed",
      tCols.map(t => when(t.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("long"))
  }

  /** Funnel census: users entering each step and the integer conversion-
    * lag mass between consecutive steps (`tsCol` units). One row.
    */
  def funnelCensus(funnelled: DataFrame, nSteps: Int): DataFrame = {
    require(nSteps >= 1, "nSteps must be >= 1")
    val perStep = (0 until nSteps).flatMap { i =>
      Seq(sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L))
        .as(s"step${i}_users")) ++
        (if (i > 0)
          Seq(coalesce(sum(col(s"t$i") - col(s"t${i - 1}")), lit(0L))
            .as(s"step${i}_lag_sum"))
        else Seq.empty)
    }
    funnelled.agg(perStep.head, perStep.tail: _*)
  }

  /** Cohort retention: assign each key to the period of its first event
    * (`period(ts)` must be a monotone integral bucketing, e.g. epoch
    * week), then count distinct keys active at each (cohort, offset).
    * Two slim aggregations — (key → cohort), (cohort, offset → keys);
    * output is periods² rows, catalog-sized by construction.
    */
  def cohortRetention(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      period: Column => Column): DataFrame =
    cohortRetentionFromState(
      activityState(events, keyCols, tsCol, period), keyCols)

  /** The compact, MERGEABLE state behind [[cohortRetention]]: distinct
    * (key..., period) activity rows — bounded by keys × active periods,
    * the natural compaction of an unbounded event log. A true
    * commutative monoid under [[mergeActivity]] (distinct union), so
    * daily batches fold into a persisted state in any order, with no
    * ordering contract at all (late-arriving events included) — unlike
    * the SCD2/sessionization increments, whose last-version/last-session
    * seams need batch timestamps after history.
    */
  def activityState(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      period: Column => Column): DataFrame = {
    require(keyCols.nonEmpty, "activityState needs a key column")
    require(!keyCols.contains("period"),
      "'period' is the state's bucketing column; rename the key")
    events
      .select(keyCols.map(col) :+ period(col(tsCol)).as("period"): _*)
      .distinct()
  }

  /** Fold states (or a state and a new batch's state) together. */
  def mergeActivity(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).dropDuplicates(a.columns.toSeq)

  /** The retention matrix from a (possibly merged, possibly reloaded)
    * activity state: cohort = each key's earliest period, then distinct
    * keys active at each (cohort, offset). Two slim aggregations;
    * output is periods² rows, catalog-sized by construction.
    */
  def cohortRetentionFromState(
      state: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val cohorts = state.groupBy(keys: _*)
      .agg(min(col("period")).as("cohort"))
    state.join(cohorts, keyCols)
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("active_keys"))
  }
}
