package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder — turns an append-only
  * change stream into a versioned dimension table with
  * `valid_from`/`valid_to` intervals, and reconstructs point-in-time
  * snapshots from it. The standard companion to [[AsOfJoin]]: as-of
  * answers "latest state per probe", SCD2 materializes the full validity
  * history once so ANY timestamp can be answered with a plain filter.
  *
  * One shuffle on the key, reused by every windowed step (change
  * detection, interval close, version numbering all share the same
  * partitioning and ordering — Catalyst plans a single Exchange).
  * Parallelism is the number of keys; a key's own history is processed
  * sequentially within its partition, the natural shape for
  * per-entity versioning.
  */
object Scd {

  /** Collapse consecutive rows with unchanged `attrCols` per key and emit
    * one row per surviving version with `valid_from` (its first ts),
    * `valid_to` (the next version's ts; null while current),
    * `version` (1-based per key) and `is_current`.
    *
    * Equal-`tsCol` rows within a key need `tiebreakCols` for a
    * deterministic history; change comparison is null-safe (a null
    * attribute differs from a non-null one, equals another null).
    */
  def scdType2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    require(keyCols.nonEmpty, "scdType2 needs at least one key column")
    require(attrCols.nonEmpty, "scdType2 needs at least one attribute")
    require(!changes.columns.exists(c => c.startsWith("graft_") ||
      Set("valid_from", "valid_to", "version", "is_current").contains(c)),
      "input must not contain graft_/valid_from/valid_to/version/" +
        "is_current columns")

    val ordering = (tsCol +: tiebreakCols).map(c => col(c).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val attrStruct = struct(attrCols.map(col): _*)

    val surviving = changes
      .withColumn("graft_prev", lag(attrStruct, 1).over(w))
      // null-safe: the first row (null prev) and any real change survive
      .where(!(col("graft_prev") <=> attrStruct))
      .drop("graft_prev")

    surviving
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The dimension as of `atTs` (inclusive of `valid_from`, exclusive of
    * `valid_to` — half-open intervals, so snapshots partition time).
    */
  def snapshotAt(scd: DataFrame, atTs: Column): DataFrame =
    scd.where(col("valid_from") <= atTs &&
      (col("valid_to").isNull || col("valid_to") > atTs))
}
