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

  private val MetaCols = Seq("valid_from", "valid_to", "version", "is_current")

  /** Fold a NEW batch of change rows into an existing SCD2 dimension
    * (the output of [[scdType2]] or a previous `applyChanges`, typically
    * reloaded from parquet) WITHOUT rescanning history — the persisted-
    * state shape of [[scdType2]], same contract as the incremental
    * exact/fuzzy-dedup and NB/k-means state monoids: applying day N's
    * changes to the accumulated dimension equals rebuilding from the
    * full change stream, row for row.
    *
    * Only three slices of data move:
    *  1. CLOSED versions (`is_current = false`) pass through untouched —
    *     at 100 TB the closed history never shuffles, never re-sorts;
    *  2. current versions of keys NOT in the batch pass through
    *     untouched (anti-join against the batch's distinct keys — tiny,
    *     AQE-broadcastable);
    *  3. current versions of AFFECTED keys seed a mini-rebuild together
    *     with the batch rows: the seed re-enters as a pseudo-change at
    *     its own `tsCol`, so an opening batch row with unchanged
    *     attributes collapses exactly as the full rebuild collapses it,
    *     the seed's `valid_to`/`is_current` re-derive, and `version`
    *     renumbering adds the seed's prior offset. Brand-new keys fall
    *     through with offset 0.
    *
    * Ingest contract (the daily-batch shape): every batch row's
    * (`tsCol`, tiebreak) must order at-or-after its key's current
    * `valid_from`. Rows ordering INSIDE the closed history would need
    * versions the closed slice owns — that is a rebuild
    * ([[scdType2]] over the full stream), not an increment.
    */
  def applyChanges(
      existing: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    require(MetaCols.forall(existing.columns.contains),
      s"existing must be an SCD2 dimension with ${MetaCols.mkString("/")}")
    val closed = existing.where(!col("is_current"))
    val current = existing.where(col("is_current"))
    val batchKeys = changes.select(keyCols.map(col): _*).distinct()
    val untouched = current.join(batchKeys, keyCols, "left_anti")
    val affected = current.join(batchKeys, keyCols, "left_semi")
    // the seed re-enters the change stream as the row that opened the
    // current version (tsCol survives scdType2, so dropping the meta
    // columns reconstructs it exactly); its prior version number rides
    // along for the renumbering join
    val offsets = affected.select(
      keyCols.map(col) :+ (col("version") - 1).as("graft_voff"): _*)
    val seed = affected.drop(MetaCols: _*)
    val mini = scdType2(seed.unionByName(changes), keyCols, tsCol,
      attrCols, tiebreakCols)
      .join(offsets, keyCols, "left")
      .withColumn("version",
        col("version") + coalesce(col("graft_voff"), lit(0)))
      .drop("graft_voff")
    closed.unionByName(untouched).unionByName(mini)
  }
}
