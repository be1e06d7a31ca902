package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{coalesce, col, count, greatest, lit, max, sum, udaf, xxhash64}

/** Scale-safe per-bucket cap enforcement — the de-windowed replacement
  * for `row_number().over(partitionBy(bucket).orderBy(xxhash64(id), id))
  * <= cap`.
  *
  * The window form must shuffle EVERY row of a bucket into one task and
  * sort it there before the filter drops the overflow; a degenerate
  * bucket (boilerplate corpus, one band value) is a corpus fraction, so
  * at 100 TB that one task runs for hours. This form never sorts a
  * bucket anywhere:
  *
  *  1. one `groupBy(bucket)` over a bounded max-heap aggregate
  *     ([[BucketCapAggregator]], ObjectHashAggregate with map-side
  *     partial combine — each input partition contributes at most `cap`
  *     candidates per bucket to the shuffle) finds, per bucket, the
  *     cap-th smallest (hash, tiebreak-hash) pair and the bucket size;
  *  2. the (bucket → threshold) frame — one row per OVERSIZED bucket
  *     only, typically tiny and AQE-broadcastable — joins back and rows
  *     above their bucket's threshold are filtered out. Buckets at or
  *     under the cap never appear in the join side at all.
  *
  * Selection contract: the `cap` survivors of an oversized bucket are
  * the cap smallest rows under signed (xxhash64(id), xxhash64(id,
  * salt)) order — the same uniform, deterministic hash-order exclusion
  * as the window form. The tie-break between two ids that COLLIDE on
  * xxhash64 is the salted second hash rather than the raw id (the heap
  * state is primitive longs, id-typed order would force a generic row
  * buffer); a full 128-bit collision — never observed, ~2^-64 per
  * bucket-pair — admits one extra row rather than dropping one.
  *
  * The same named-observation contract as the window sites rides along:
  * `excluded_rows` (rows the cap dropped) and `banded_rows` (rows
  * entering the cap) fire on `observationName` when the capped frame
  * first materializes.
  */
object Capping {

  /** Salt for the tie-break hash — an arbitrary odd 64-bit constant
    * (the golden-ratio mixing constant), fixed so capping is
    * deterministic across runs and engines.
    */
  private val TieSalt = 0x9E3779B97F4A7C15L

  /** Bounded max-heap over (h1, h2) pairs under signed lexicographic
    * order, keeping the `cap` smallest pairs seen plus a count of all
    * inputs. Primitive parallel arrays — no boxing in the hot path —
    * that GROW on demand (doubling, never past `cap` or the input
    * count): callers use Int.MaxValue as "no cap", which must not
    * allocate a 2^31 buffer per bucket.
    */
  final class CapState(val cap: Int) extends Serializable {
    var nIn: Long = 0L
    var size: Int = 0
    var h1 = new Array[Long](math.min(cap, 16))
    var h2 = new Array[Long](math.min(cap, 16))

    private def ensureRoom(): Unit = {
      if (size == h1.length && size < cap) {
        val next = math.min(cap.toLong, h1.length.toLong * 2).toInt
        h1 = java.util.Arrays.copyOf(h1, next)
        h2 = java.util.Arrays.copyOf(h2, next)
      }
    }

    private def less(a1: Long, a2: Long, b1: Long, b2: Long): Boolean =
      a1 < b1 || (a1 == b1 && a2 < b2)

    private def swap(i: Int, j: Int): Unit = {
      val t1 = h1(i); h1(i) = h1(j); h1(j) = t1
      val t2 = h2(i); h2(i) = h2(j); h2(j) = t2
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) >> 1
        if (less(h1(p), h2(p), h1(i), h2(i))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && less(h1(m), h2(m), h1(l), h2(l))) m = l
        if (r < size && less(h1(m), h2(m), h1(r), h2(r))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    /** Offer a pair to the heap WITHOUT counting it as a new input row
      * (merge path).
      */
    def insert(a1: Long, a2: Long): Unit = {
      if (size < cap) {
        ensureRoom()
        h1(size) = a1; h2(size) = a2; size += 1; siftUp(size - 1)
      } else if (less(a1, a2, h1(0), h2(0))) {
        h1(0) = a1; h2(0) = a2; siftDown(0)
      }
    }

    /** Count an input row and offer its pair. */
    def add(a1: Long, a2: Long): Unit = { nIn += 1L; insert(a1, a2) }

    def mergeIn(o: CapState): CapState = {
      nIn += o.nIn
      var i = 0
      while (i < o.size) { insert(o.h1(i), o.h2(i)); i += 1 }
      this
    }
  }

  /** (bucket size, whether the cap bound, cap-th smallest pair). */
  final case class CapResult(nIn: Long, bounded: Boolean, thrH1: Long, thrH2: Long)

  final class BucketCapAggregator(cap: Int)
      extends Aggregator[(Long, Long), CapState, CapResult] {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    override def zero: CapState = new CapState(cap)
    override def reduce(b: CapState, a: (Long, Long)): CapState = {
      b.add(a._1, a._2); b
    }
    override def merge(b1: CapState, b2: CapState): CapState = b1.mergeIn(b2)
    override def finish(b: CapState): CapResult =
      if (b.nIn > b.cap) CapResult(b.nIn, bounded = true, b.h1(0), b.h2(0))
      else CapResult(b.nIn, bounded = false, 0L, 0L)
    override def bufferEncoder: org.apache.spark.sql.Encoder[CapState] =
      org.apache.spark.sql.Encoders.kryo[CapState]
    override def outputEncoder: org.apache.spark.sql.Encoder[CapResult] =
      ExpressionEncoder[CapResult]()
  }

  /** Keep at most `cap` rows per bucket — all of `df`'s columns survive
    * untouched; rows of an oversized bucket beyond its threshold are
    * dropped. `df` is consumed ONCE EAGERLY at call time (the phase-0
    * oversized-bucket probe runs a Spark job) and, only when some bucket
    * binds, TWICE more in the returned plan (threshold aggregation + the
    * filter join): persist it first — every in-repo call site does — and
    * persist the result when it is consumed more than once (the
    * observation fires on first materialization).
    *
    * Rows with a NULL `idCol` are dropped outright: xxhash64 skips null
    * inputs, so every null-id row would tie on BOTH hashes and a bucket
    * with more than `cap` of them would pass the threshold filter
    * uncapped — reopening the quadratic self-join blowup the cap exists
    * to prevent. All in-repo call sites feed a synthesized non-null id.
    */
  def capBuckets(
      dfIn: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      cap: Int,
      observationName: String): DataFrame = {
    val df = dfIn.where(col(idCol).isNotNull)
    // "no cap": skip the eager probe outright — it costs a full pass to
    // learn nothing (no bucket can bind), and uncapped audit call sites
    // (exact ground-truth paths) pay it per invocation. The fast path's
    // contract survives: bucket-keyed repartition + the observation.
    if (cap == Int.MaxValue) {
      return df.repartition(bucketCols.map(col): _*)
        .observe(observationName,
          coalesce(max(lit(0L)), lit(0L)).as("excluded_rows"),
          coalesce(sum(lit(1L)), lit(0L)).as("banded_rows"))
    }
    val h1 = xxhash64(col(idCol))
    val h2 = xxhash64(col(idCol), lit(TieSalt))
    // Phase 0 — an EAGER probe: one slim count aggregate decides whether
    // ANY bucket exceeds the cap. The common case for a healthy
    // parameterization is "none" — then the threshold aggregate and both
    // filter joins vanish from the returned plan and the cap costs one
    // hash-count pass over the (caller-persisted) input instead of
    // three. The observation contract survives: excluded_rows is
    // provably 0 and banded_rows re-counts on materialization. When some
    // bucket DOES bind, the probe pass is re-paid once inside the lazy
    // plan below — a slim codegen count against the cached input,
    // marginal next to the heap aggregate + joins it gates.
    val anyOversized = !df
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("graft_cnt"))
      .where(col("graft_cnt") > cap)
      .isEmpty
    if (!anyOversized) {
      // Repartition on the bucket keys before returning: the capped
      // frame feeds bucket-keyed self-joins/groupBys at every call
      // site, and passing through the input's (often few, scan-derived)
      // partitions lets AQE pick a broadcast self-join whose
      // parallelism is capped at those few stream partitions — measured
      // as q32's 14 s single-stage candidate-verify on 2 tasks. One
      // slim exchange restores 32-way parallelism and key-aligned
      // partitioning for whatever consumes the frame next.
      return df.repartition(bucketCols.map(col): _*)
        .observe(observationName,
          coalesce(max(lit(0L)), lit(0L)).as("excluded_rows"),
          coalesce(sum(lit(1L)), lit(0L)).as("banded_rows"))
    }
    // Phase 1 — bucket sizes via a plain codegen count aggregate (slim
    // longs, map-side combinable at any key cardinality). Running the
    // HEAP aggregate over every bucket instead was measured 3-5x slower
    // on many-bucket corpora: a typed-imperative aggregate past
    // ObjectHashAggregate's 128-key fallback threshold degrades to
    // sort-based aggregation with kryo buffer churn per bucket. The
    // observation also lives here: excluded = sum over oversized
    // buckets of (size - cap), exactly what the threshold filter drops.
    val counts = df
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("graft_cnt"))
      .observe(observationName,
        coalesce(sum(greatest(col("graft_cnt") - cap, lit(0L))), lit(0L))
          .as("excluded_rows"),
        coalesce(sum(col("graft_cnt")), lit(0L)).as("banded_rows"))
    val oversized = counts
      .where(col("graft_cnt") > cap)
      .select(bucketCols.map(c => col(c).as("graft_ov_" + c)): _*)
    // Phase 2 — the bounded-heap threshold aggregate over ONLY the
    // oversized buckets' rows (by pigeonhole at most rows/cap buckets,
    // typically a handful): the tiny oversized set broadcasts, and the
    // heap state stays inside the object-hash regime. A degenerate
    // corpus where EVERY bucket is hot degrades to sort-based
    // aggregation with map-side-capped partial states — still never a
    // single task sorting a whole bucket.
    val ovCond =
      bucketCols.map(c => col(c) <=> col("graft_ov_" + c)).reduce(_ && _)
    val aggFn =
      udaf(new BucketCapAggregator(cap), ExpressionEncoder[(Long, Long)]())
    val thr = df
      .join(oversized, ovCond, "inner")
      .groupBy(bucketCols.map(col): _*)
      .agg(aggFn(h1, h2).as("graft_cap"))
      .select(bucketCols.map(c => col(c).as("graft_thr_" + c)) ++ Seq(
        col("graft_cap.thrH1").as("graft_thr1"),
        col("graft_cap.thrH2").as("graft_thr2")): _*)
    val joinCond =
      bucketCols.map(c => col(c) <=> col("graft_thr_" + c)).reduce(_ && _)
    df.join(thr, joinCond, "left")
      .where(col("graft_thr1").isNull ||
        h1 < col("graft_thr1") ||
        (h1 === col("graft_thr1") && h2 <= col("graft_thr2")))
      .drop(bucketCols.map("graft_ov_" + _) ++
        bucketCols.map("graft_thr_" + _) ++
        Seq("graft_thr1", "graft_thr2"): _*)
  }
}
