package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — interleave the bits of several dimension
  * columns into one clustering key so that range-partitioning by it
  * co-locates rows that are close in EVERY dimension at once. The layout
  * lever behind multi-dimensional data skipping: parquet row-group
  * min/max stats on z-laid-out files prune selective predicates on any
  * participating dimension, where a single-column sort prunes only its
  * own.
  *
  * `zValue` is a pure codegen bit-expression (unrolled shift/mask/or
  * terms — no UDF); `zOrderBy` is the write-side layout
  * (repartitionByRange + sortWithinPartitions on the z key);
  * `pruningAudit` quantifies the win deterministically from values alone
  * (bucket bounding-box areas under z-layout vs a single-dimension
  * layout), so the benefit is oracle-checkable without depending on task
  * or file boundaries.
  */
object ZOrder {

  /** Morton-interleave `cols` (non-negative integrals; values are masked
    * to `bits` each). Result fits a long: requires cols.size * bits <= 63.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got ${cols.size} x $bits")
    val d = cols.size
    val masked = cols.map(c => c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (c, i) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce((a, t) => a.bitwiseOR(t))
  }

  /** Physically cluster `df` by the z-value of `dimCols` — range
    * partition on z (so files hold contiguous z-ranges), sort within
    * partitions (so row groups do too). `numPartitions` sizes the write.
    */
  def zOrderBy(
      df: DataFrame,
      dimCols: Seq[String],
      bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    val z = zValue(dimCols.map(col), bits)
    df.withColumn("graft_z", z)
      .repartitionByRange(numPartitions, col("graft_z"))
      .sortWithinPartitions(col("graft_z"))
      .drop("graft_z")
  }

  /** Deterministic pruning audit for two dimensions: split the z-range
    * into `nBuckets` equal slices (a stand-in for files written in z
    * order) and measure each slice's bounding-box extent PER DIMENSION,
    * against the same measure for an x-only layout. A y-predicate prunes
    * a file iff the file's y-extent misses it — under an x-only sort that
    * extent is the full y-range (no pruning), under z it shrinks toward
    * sqrt scale. Extents derive from VALUES only — no dependence on task
    * or file boundaries — so both engines agree exactly.
    */
  def pruningAudit(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val mask = (1L << bits) - 1
    val x = col(xCol).cast("long").bitwiseAND(lit(mask))
    val y = col(yCol).cast("long").bitwiseAND(lit(mask))
    val z = zValue(Seq(col(xCol), col(yCol)), bits)
    val valued = df
      .withColumn("graft_x", x)
      .withColumn("graft_y", y)
      .withColumn("graft_z", z)
    // bucket over the OBSERVED ranges (files cover the data that exists,
    // not the theoretical bit-space) — a broadcast 1-row bounds frame
    val bounds = valued.agg(
      min(col("graft_z")).as("graft_zlo"),
      max(col("graft_z")).as("graft_zhi"),
      min(col("graft_x")).as("graft_xlo"),
      max(col("graft_x")).as("graft_xhi"))
    val staged = valued.crossJoin(broadcast(bounds))
      .withColumn("graft_zb", expr(
        s"((graft_z - graft_zlo) * $nBuckets) div " +
          "(graft_zhi - graft_zlo + 1)"))
      .withColumn("graft_xb", expr(
        s"((graft_x - graft_xlo) * $nBuckets) div " +
          "(graft_xhi - graft_xlo + 1)"))

    def bucketAreas(bucketCol: String, outPrefix: String): DataFrame =
      staged.groupBy(col(bucketCol))
        .agg(
          (max(col("graft_x")) - min(col("graft_x")) + 1).as("w"),
          (max(col("graft_y")) - min(col("graft_y")) + 1).as("h"))
        .agg(
          count(lit(1)).cast("double").as(s"${outPrefix}_buckets"),
          // exact long sums, ONE double division each — order-free
          round(sum(col("w")).cast("double") /
            count(lit(1)).cast("double"), 3)
            .as(s"${outPrefix}_mean_w_r"),
          round(sum(col("h")).cast("double") /
            count(lit(1)).cast("double"), 3)
            .as(s"${outPrefix}_mean_h_r"))

    staged.agg(count(lit(1)).cast("double").as("n_rows"))
      .crossJoin(bucketAreas("graft_zb", "z"))
      .crossJoin(bucketAreas("graft_xb", "x"))
  }
}
