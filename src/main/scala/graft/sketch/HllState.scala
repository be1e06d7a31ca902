package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group approximate-distinct state — the third persisted sketch
  * monoid beside [[CountMin]] (frequencies) and [[Bloom]] (membership):
  * one DataSketches HLL sketch per group key, built with Spark's
  * codegen'd `hll_sketch_agg`, merged with `hll_union_agg`, read with
  * `hll_sketch_estimate`. THE streaming-state shape for "distinct users
  * per domain" over an unbounded ingest: per-register max commutes, so
  * daily batches fold into a parquet-persisted state in any order with
  * no history rescan, and the state size is groups × sketch (KB), not
  * groups × distinct values. Merged-state estimates equal the
  * full-build's exactly while sketches stay in sparse mode; in dense
  * mode the union gadget (HLL_8) takes a different register path than
  * the streaming HLL_4 build and estimates drift by a measured
  * sub-0.1% (q140 bounds it at 1%) — the accuracy CONTRACT (relative
  * error by lgConfigK) holds for both.
  *
  * Values hash through `xxhash64` first: `hll_sketch_agg` accepts
  * int/long/string/binary only, and the hash bridge makes any column
  * (incl. multi-column tuples) sketchable — the same convention as
  * [[graft.operators.ApproxCountDistinct]] and the Bloom semi-join.
  *
  * 100 TB shape: ONE map-side-combinable aggregation per build (sketch
  * states merge in the combiner, so each input partition ships one
  * sketch per group it saw); merging states is a groupBy over
  * KB-sized binaries; estimates never touch the data again.
  *
  * reference capability: ApproxCountDistinct (single, ungrouped) —
  * analyzers/ApproxCountDistinct.scala; the grouped persisted-state
  * form is part of the beyond-reference pipeline family.
  */
object HllState {

  /** (groupCols..., hll: binary) — one sketch per group.
    * `lgConfigK` trades size for accuracy (12 ≈ 1.6 KB / ±2.6%).
    */
  def distinctState(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String],
      lgConfigK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "distinctState needs at least one group col")
    require(valueCols.nonEmpty, "distinctState needs at least one value col")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(xxhash64(valueCols.map(col): _*), lit(lgConfigK))
        .as("hll"))
  }

  /** N-way fold of a frame holding MANY sketches per group (e.g. every
    * per-micro-batch part of a streaming ingest read as one frame) —
    * commutative and associative (per-register max), any batch order.
    * Every non-`hll` column is a group key.
    */
  def foldState(parts: DataFrame): DataFrame = {
    val groupCols = parts.columns.filterNot(_ == "hll").toSeq
    parts.groupBy(groupCols.map(col): _*)
      // allowDifferentLgConfigK: a state written at a larger K folds
      // into a smaller one rather than failing a daily pipeline
      .agg(hll_union_agg(col("hll"), lit(true)).as("hll"))
  }

  /** Fold states (or a state and a new batch's state) together —
    * commutative and associative (per-register max), any batch order.
    */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    foldState(a.unionByName(b))

  /** (groupCols..., distinct_est: long) from a (possibly merged,
    * possibly parquet-reloaded) state.
    */
  def estimates(state: DataFrame): DataFrame = {
    val groupCols = state.columns.filterNot(_ == "hll").toSeq
    state.select(groupCols.map(col) :+
      hll_sketch_estimate(col("hll")).as("distinct_est"): _*)
  }

  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
