package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — split each key's event sequence wherever the
  * gap to the previous event exceeds a threshold, numbering the
  * resulting sessions per key. The batch counterpart of the streaming
  * sessionizer ([[graft.streaming.StreamingVerification]]'s windowed
  * path): one shuffle on the key, and every windowed step (gap
  * detection, boundary cumsum) reuses the same partitioning+ordering —
  * Catalyst plans a single Exchange. Parallelism is the number of keys;
  * a key's own timeline is sequential within its partition, the natural
  * shape for per-entity sessionization.
  */
object Sessionize {

  /** Append `session_id` (1-based per key, in ts order) to `events`.
    * A gap STRICTLY greater than `gapThreshold` (in `tsCol` units)
    * starts a new session; equal-ts rows need `tiebreakCols` for a
    * deterministic sequence.
    */
  def sessionize(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapThreshold: Long,
      tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs at least one key column")
    require(gapThreshold >= 0, "gapThreshold must be >= 0")
    require(!events.columns.exists(c => c.startsWith("graft_") ||
      c == "session_id"),
      "input must not contain graft_-prefixed or session_id columns")
    val ordering = (tsCol +: tiebreakCols).map(c => col(c).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    events
      .withColumn("graft_gap",
        col(tsCol) - lag(col(tsCol), 1).over(w))
      .withColumn("session_id",
        (sum(when(col("graft_gap").isNull ||
          col("graft_gap") > gapThreshold, 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .drop("graft_gap")
  }

  /** Per-session rollup: (key..., session_id, n_events, session_start,
    * session_end, duration). One extra slim aggregation on the same key.
    */
  def sessionStats(
      sessionized: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame =
    sessionized
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))

  /** Fold a NEW batch of events into a persisted per-session stats
    * table (the output of `sessionStats(sessionize(...))` or a previous
    * `applySessions`, typically reloaded from parquet) WITHOUT
    * rescanning event history — the session-state twin of
    * [[Scd.applyChanges]]: applying day N's events to the accumulated
    * stats equals rebuilding from the full event stream, row for row.
    *
    * Only the batch is ever windowed. Closed sessions (every session
    * but each key's last) pass through untouched; unaffected keys'
    * last sessions anti-join through; each affected key's LAST session
    * either extends across the batch boundary (first batch session
    * starts within `gapThreshold` of its end — the two merge: summed
    * events, original start, new end) or passes through unchanged
    * while the batch's sessions renumber after it. Brand-new keys fall
    * through with ids from 1.
    *
    * Ingest contract (the daily-batch shape): every batch event's
    * `tsCol` must be STRICTLY greater than its key's `session_end` in
    * `existing` — an event ordering inside recorded history needs the
    * event-level rebuild, not the stats increment.
    *
    * Output: the [[sessionStats]] schema.
    */
  def applySessions(
      existing: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapThreshold: Long,
      tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    val statsCols =
      Seq("session_id", "n_events", "session_start", "session_end", "duration")
    require(statsCols.forall(existing.columns.contains),
      s"existing must be a sessionStats table with ${statsCols.mkString("/")}")
    val keyC = keyCols.map(col)
    val batchKeys = batch.select(keyC: _*).distinct()
    val untouched = existing.join(batchKeys, keyCols, "left_anti")
    val affected = existing.join(batchKeys, keyCols, "left_semi")
    // each affected key's last session as one slim struct row
    val last = affected
      .groupBy(keyC: _*)
      .agg(max(struct(col("session_id"), col("n_events"),
        col("session_start"), col("session_end"))).as("graft_last"))
    val closedAffected = affected
      .join(last, keyCols)
      .where(col("session_id") =!= col("graft_last.session_id"))
      .drop("graft_last")
    // the batch's own sessions (the only windowed work), joined with the
    // key's prior last session and the boundary-merge decision
    val mini = sessionStats(
      sessionize(batch, keyCols, tsCol, gapThreshold, tiebreakCols),
      keyCols, tsCol)
    val firstStart = mini.where(col("session_id") === 1L)
      .select(keyC :+ col("session_start").as("graft_first_start"): _*)
    val joined = mini
      .join(last, keyCols, "left")
      .join(firstStart, keyCols)
      .withColumn("graft_merge",
        col("graft_last").isNotNull &&
          col("graft_first_start") - col("graft_last.session_end")
            <= gapThreshold)
    val offset = coalesce(col("graft_last.session_id"), lit(0L))
      .cast("long") - when(col("graft_merge"), 1L).otherwise(0L)
    val isMergedFirst = col("graft_merge") && col("session_id") === 1L
    val outStart = when(isMergedFirst, col("graft_last.session_start"))
      .otherwise(col("session_start"))
    val outN = when(isMergedFirst,
      col("graft_last.n_events") + col("n_events"))
      .otherwise(col("n_events"))
    val adjusted = joined.select(
      keyC ++ Seq(
        (col("session_id") + offset).as("session_id"),
        outN.as("n_events"),
        outStart.as("session_start"),
        col("session_end"),
        (col("session_end") - outStart).as("duration")): _*)
    // an UNMERGED prior last session survives as-is; a merged one was
    // replaced by the batch's first session above
    val lastUnmerged = affected
      .join(last, keyCols)
      .join(firstStart, keyCols)
      .where(col("session_id") === col("graft_last.session_id") &&
        col("graft_first_start") - col("graft_last.session_end")
          > gapThreshold)
      .drop("graft_last", "graft_first_start")
    untouched
      .unionByName(closedAffected)
      .unionByName(lastUnmerged)
      .unionByName(adjusted)
  }
}
