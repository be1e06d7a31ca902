package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Key-skew census — the pre-flight a pipeline engineer runs on a join or
  * groupBy key before committing a partitioning strategy at scale: how
  * many keys, how hot is the hottest, how heavy the tail (exact
  * disc-quantiles of per-key counts), and how unequal the distribution
  * (Gini over per-key counts).
  *
  * Two distributed aggregations produce bounded intermediates: the
  * per-key counts (one shuffle), then the count-of-counts histogram
  * (a second slim shuffle whose size is provably <= sqrt(2N) rows — the
  * distinct per-key count values of any N-row table). The histogram plus
  * the top-K rows are catalog-sized collects; quantiles and Gini are
  * integer-exact prefix sums over them, so the only float ops are the
  * final ratios (rounded to 6).
  */
object SkewCensus {

  private val schema = StructType(Seq(
    StructField("n_rows", DoubleType),
    StructField("n_keys", DoubleType),
    StructField("null_key_rows", DoubleType),
    StructField("max_cnt", DoubleType),
    StructField("p50_cnt", DoubleType),
    StructField("p90_cnt", DoubleType),
    StructField("p99_cnt", DoubleType),
    StructField("top1_share_r", DoubleType),
    StructField("top10_share_r", DoubleType),
    StructField("gini_r", DoubleType)))

  /** One-row census of the `keyCol` distribution. Null keys count as one
    * key of their own (they hash to one partition in a real shuffle — the
    * exact situation the census exists to catch).
    *
    * `pXX_cnt` is the smallest per-key count c such that at least
    * ceil(q * n_keys) keys have count <= c (disc quantile, lower).
    */
  def skewCensus(df: DataFrame, keyCol: String): DataFrame =
    censusFromState(keyCountState(df, keyCol))

  /** The compact, MERGEABLE state behind [[skewCensus]]: per-key row
    * counts (`key`, `cnt`) — bounded by the key cardinality, a true
    * commutative monoid under [[mergeKeyCounts]] (per-key sum), so a
    * census over an unbounded ingest stream folds daily batches into a
    * persisted table with no ordering contract and no history rescan.
    */
  def keyCountState(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold states (or a state and a new batch's state) together. */
  def mergeKeyCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The one-row census from a (possibly merged, possibly reloaded)
    * key-count state.
    */
  def censusFromState(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    val counts = state
      .select(col("key").as("graft_key"), col("cnt").as("graft_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hist = counts.groupBy(col("graft_cnt"))
        .agg(count(lit(1)).as("graft_keys"),
          sum(when(col("graft_key").isNull, 1L).otherwise(0L))
            .as("graft_null_keys"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val nKeys = hist.map(_._2).sum
      val nRows = hist.map { case (c, k, _) => c * k }.sum
      val nullRows = hist.collect {
        case (c, _, nk) if nk > 0 => c * nk
      }.sum
      val maxCnt = if (hist.isEmpty) 0L else hist.last._1

      def discQuantile(q: Double): Long = {
        if (nKeys == 0L) return 0L
        val target = math.ceil(q * nKeys).toLong.max(1L)
        var acc = 0L
        hist.foreach { case (c, k, _) =>
          acc += k
          if (acc >= target) return c
        }
        maxCnt
      }

      // top shares straight from the histogram tail (largest counts)
      def topShare(k: Int): Double = {
        if (nRows == 0L) return 0.0
        var remaining = k.toLong
        var mass = 0L
        hist.reverseIterator.foreach { case (c, keys, _) =>
          if (remaining > 0) {
            val take = math.min(keys, remaining)
            mass += c * take
            remaining -= take
          }
        }
        mass.toDouble / nRows.toDouble
      }

      // Gini over per-key counts: G = 2*S2/(n*S1) - (n+1)/n with
      // S2 = sum of i*x_(i) over ascending sorted counts; tie blocks
      // contribute x_c * (arithmetic series over their index range) —
      // all integer until the final division.
      val gini: Double = {
        if (nKeys == 0L || nRows == 0L) 0.0
        else {
          var prefix = 0L
          var s2 = BigInt(0)
          hist.foreach { case (c, k, _) =>
            // indices prefix+1 .. prefix+k, summed: k*(2*prefix+k+1)/2
            s2 += BigInt(c) * BigInt(k) * (2 * prefix + k + 1) / 2
            prefix += k
          }
          // double ops in the exact order the SQL replay uses, so both
          // engines round identically before the 6-digit snap
          2.0 * s2.toDouble / (nKeys.toDouble * nRows.toDouble) -
            (nKeys + 1).toDouble / nKeys.toDouble
        }
      }

      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble

      spark.createDataFrame(
        java.util.Arrays.asList(Row(
          nRows.toDouble, nKeys.toDouble, nullRows.toDouble,
          maxCnt.toDouble,
          discQuantile(0.5).toDouble, discQuantile(0.9).toDouble,
          discQuantile(0.99).toDouble,
          r6(topShare(1)), r6(topShare(10)), r6(gini))),
        schema)
    } finally counts.unpersist()
  }
}
