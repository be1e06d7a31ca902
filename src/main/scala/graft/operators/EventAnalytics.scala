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
    * event log, not the funnel output. [[funnelState]] /
    * [[funnelFromState]] provide the principled incremental form: a
    * bounded per-(key, step) earliest-timestamps monoid whose replay
    * detects (and flags, per key) the rare truncation where it cannot
    * prove exactness — never silently.
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

  // -- incremental funnel over a BOUNDED per-(key, step) state --------------
  //
  // The exact funnel is not foldable from its own output (see funnel's
  // doc), but it IS foldable from a bounded compaction of the event log:
  // per (key, step), the `cap` EARLIEST matching timestamps plus the
  // total match count. Min-k of a union is the min-k of the parts'
  // min-k's — a true commutative monoid, so daily batches fold in any
  // order, late events included. The greedy earliest-after chain then
  // replays on the kept lists, and the replay KNOWS when it is exact:
  // a step match found inside a kept list is the true earliest-after
  // (everything evicted is >= the list's max), and a stall is exact
  // unless the step's list was truncated at values <= the previous
  // step's match. Keys flagged inexact never OVERcount: the replay only
  // stalls early, so steps_completed is a lower bound there.

  /** Bounded min-k over longs with an exact total — the funnel state's
    * per-(key, step) cell. Max-heap of the k smallest, map-side combine.
    */
  final class MinKLong(val k: Int) extends Serializable {
    var size: Int = 0
    var total: Long = 0L
    var ts = new Array[Long](math.min(k, 16))
    private def swap(i: Int, j: Int): Unit = {
      val t = ts(i); ts(i) = ts(j); ts(j) = t
    }
    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) >> 1
        if (ts(p) < ts(i)) { swap(i, p); i = p } else return
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < size && ts(m) < ts(l)) m = l
        if (r < size && ts(m) < ts(r)) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }
    def insert(t: Long): Unit = {
      total += 1L
      insertKept(t)
    }
    def insertKept(t: Long): Unit = {
      if (size < k) {
        if (size == ts.length) {
          ts = java.util.Arrays.copyOf(ts,
            math.min(k.toLong, ts.length.toLong * 2).toInt)
        }
        ts(size) = t; size += 1; siftUp(size - 1)
      } else if (t < ts(0)) { ts(0) = t; siftDown() }
    }
    def mergeIn(o: MinKLong): MinKLong = {
      total += o.total
      var i = 0
      while (i < o.size) { insertKept(o.ts(i)); i += 1 }
      this
    }
    def sortedAsc: Seq[Long] = {
      val a = java.util.Arrays.copyOf(ts, size)
      java.util.Arrays.sort(a)
      a.toSeq
    }
  }

  final class MinKLongAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, MinKLong, FunnelCell] {
    require(k >= 1, s"cap must be >= 1, got $k")
    override def zero: MinKLong = new MinKLong(k)
    override def reduce(b: MinKLong, a: java.lang.Long): MinKLong = {
      if (a != null) b.insert(a)
      b
    }
    override def merge(a: MinKLong, b: MinKLong): MinKLong = a.mergeIn(b)
    override def finish(b: MinKLong): FunnelCell =
      FunnelCell(b.sortedAsc, b.total)
    override def bufferEncoder: org.apache.spark.sql.Encoder[MinKLong] =
      org.apache.spark.sql.Encoders.kryo[MinKLong]
    override def outputEncoder: org.apache.spark.sql.Encoder[FunnelCell] =
      org.apache.spark.sql.Encoders.product[FunnelCell]
  }

  /** Refolds persisted cells (sorted-merge keep-k; totals add). */
  final class CellMergeAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        FunnelCellIn, MinKLong, FunnelCell] {
    override def zero: MinKLong = new MinKLong(k)
    override def reduce(b: MinKLong, a: FunnelCellIn): MinKLong = {
      if (a != null && a.ts != null && a.total != null) {
        b.total += a.total
        a.ts.foreach(b.insertKept)
      }
      b
    }
    override def merge(a: MinKLong, b: MinKLong): MinKLong = a.mergeIn(b)
    override def finish(b: MinKLong): FunnelCell =
      FunnelCell(b.sortedAsc, b.total)
    override def bufferEncoder: org.apache.spark.sql.Encoder[MinKLong] =
      org.apache.spark.sql.Encoders.kryo[MinKLong]
    override def outputEncoder: org.apache.spark.sql.Encoder[FunnelCell] =
      org.apache.spark.sql.Encoders.product[FunnelCell]
  }

  /** (keyCols..., step, cell: struct&lt;ts: array&lt;long&gt; asc, total: long&gt;) —
    * the `cap` earliest timestamps of each (key, step) plus the exact
    * match count. An event matching several step predicates contributes
    * to each (the batch funnel filters each step independently). One
    * scan, one slim shuffle of bounded cells.
    */
  def funnelState(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      steps: Seq[Column],
      cap: Int): DataFrame = {
    require(keyCols.nonEmpty, "funnelState needs at least one key column")
    require(steps.nonEmpty, "funnelState needs at least one step predicate")
    val flags = array(steps.zipWithIndex.map {
      case (p, i) => when(p, lit(i)) }: _*)
    val agg = udaf(new MinKLongAggregator(cap),
      org.apache.spark.sql.Encoders.LONG)
    events
      .select(keyCols.map(col) ++ Seq(col(tsCol).cast("long").as("graft_ts"),
        explode(filter(flags, _.isNotNull)).as("step")): _*)
      .groupBy((keyCols :+ "step").map(col): _*)
      .agg(agg(col("graft_ts")).as("cell"))
  }

  /** Fold states (or a state and a new batch's state): per-(key, step)
    * sorted-merge keeping the `cap` earliest; totals add. Any order.
    */
  def mergeFunnelStates(a: DataFrame, b: DataFrame, cap: Int): DataFrame = {
    val groupCols = a.columns.filterNot(_ == "cell").toSeq
    val agg = udaf(new CellMergeAggregator(cap),
      org.apache.spark.sql.Encoders.product[FunnelCellIn])
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("cell.ts"), col("cell.total")).as("cell"))
  }

  /** The funnel replayed from a (possibly merged, possibly reloaded)
    * state: same output contract as [[funnel]] (one row per key with a
    * step-0 match; t0..t(n-1), steps_completed) plus `exact` — false
    * only when a stalled step's list was truncated at values at or
    * below the previous match, i.e. the ONLY case where the true chain
    * might continue where the replay cannot see. steps_completed never
    * overcounts.
    */
  def funnelFromState(state: DataFrame, nSteps: Int): DataFrame = {
    require(nSteps >= 1, "nSteps must be >= 1")
    val groupCols = state.columns.filterNot(c => c == "cell" || c == "step").toSeq
    val replay = udf((cells: Map[Int, (Seq[Long], Long)]) => {
      val ts = new Array[java.lang.Long](nSteps)
      var prev = Long.MinValue
      var completed = 0
      var exact = true
      var k = 0
      var stalled = false
      while (k < nSteps && !stalled) {
        cells.get(k) match {
          case Some((kept, total)) =>
            val hit = kept.find(_ > prev)
            hit match {
              case Some(t) =>
                ts(k) = t; prev = t; completed += 1
              case None =>
                stalled = true
                if (total > kept.size) exact = false
            }
          case None => stalled = true
        }
        k += 1
      }
      (ts.toSeq, completed, exact)
    })
    state
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("step"),
        struct(col("cell.ts").as("_1"), col("cell.total").as("_2")))))
        .as("graft_cells"))
      .where(element_at(col("graft_cells"), 0).isNotNull)
      .withColumn("graft_f", replay(col("graft_cells")))
      .select(groupCols.map(col) ++
        (0 until nSteps).map(i =>
          element_at(col("graft_f._1"), i + 1).as(s"t$i")) ++
        Seq(col("graft_f._2").cast("long").as("steps_completed"),
          col("graft_f._3").as("exact")): _*)
  }
}

/** One funnel-state cell: the earliest kept timestamps (ascending) and
  * the exact total match count — truncated iff total > ts.length.
  */
case class FunnelCell(ts: Seq[Long], total: Long)

/** Boxed mirror of [[FunnelCell]] for the merge aggregator's input side
  * (a null state row decodes as nulls; a primitive Long would throw in
  * the encoder before any guard).
  */
case class FunnelCellIn(ts: Seq[Long], total: java.lang.Long)
