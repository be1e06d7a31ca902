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
}
