package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed k-means over an embedding column (`Array[Float]`) — the
  * clustering primitive under corpus organization work (topic-balanced
  * mixture sampling, cluster-stratified eval carving, SemDeDup cell
  * structure, IVF coarse quantizers trained on the FULL corpus instead
  * of a driver sample).
  *
  * Scale shape (the whole point): Lloyd's algorithm is iterations of
  * "assign each row to its nearest centroid, then recompute centroids
  * as member means". Both halves distribute without a corpus shuffle:
  *
  *  - ASSIGN is pure map-side expression work — the k×dim centroid
  *    matrix rides into every task as literals (k and dim are small
  *    constants; 1024×1024 doubles is 8 MB, broadcast-sized), and the
  *    nearest cell is an `array_max` over per-centroid score
  *    expressions. No UDF, no shuffle, whole-stage codegen.
  *  - UPDATE is one `groupBy(cell)` over a mergeable vector-stats
  *    aggregator (count, Σx element-wise, Σ|x|²) — map-side partial
  *    combine collapses every task's rows to ≤ k slim states, so the
  *    per-iteration shuffle is numTasks × k rows of dim doubles,
  *    INDEPENDENT of corpus size. The driver folds k states into new
  *    means; nothing corpus-sized ever leaves the executors.
  *
  * Per-iteration cost at 100 TB is therefore one corpus scan (cache
  * the projected (id, vec) frame across iterations — `lloyd` does) plus
  * a k-row collect. Compare mllib KMeans: same asymptotics, but this
  * one is pure DataFrame expressions end-to-end (codegen'd, AQE-planned,
  * no RDD conversion of the input) and its scoring/assignment column is
  * reusable inside larger declarative plans.
  *
  * Determinism: for FIXED initial centroids the trajectory is fully
  * deterministic — assignment ties break to the HIGHER cell (max-struct
  * semantics, the [[Similarity.semDedup]] convention), empty cells keep
  * their previous centroid, and means can be rounded to a fixed decimal
  * grid (`roundDecimals`) so an independent engine replaying the same
  * arithmetic (the DuckDB oracle does, iteration by iteration) lands on
  * bit-identical centroids regardless of summation order.
  *
  * Reference scope note: deequ has no clustering operator — this is
  * part of the training-data-pipeline extension surface, alongside
  * [[Similarity]] (ANN) and [[Mixing]] (mixture sampling).
  */
object Clustering {

  /** Per-centroid assignment scores as one struct-array column:
    * score(c) = x·c − |c|²/2, whose argmax equals the argmin of
    * squared L2 distance (d² = |x|² − 2·score), sharing the |x|² term
    * across all k cells. Left-to-right fold over vector elements —
    * the association order an element-loop replay (DuckDB
    * `list_inner_product`) produces.
    */
  private def cellScores(vec: Column, centroids: Seq[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      val dot = aggregate(
        zip_with(vec, typedLit(c.toSeq), (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, v) => acc + v)
      val halfNorm2 = c.foldLeft(0.0)((a, x) => a + x * x) / 2.0
      struct((dot - lit(halfNorm2)).as("s"), lit(i).as("cell"))
    }: _*)

  /** Nearest-centroid cell id (squared-L2 argmin) as a pure map-side
    * expression; ties break to the higher cell (max-struct semantics).
    */
  def assignCell(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty, "assignCell needs at least one centroid")
    array_max(cellScores(vec, centroids)).getField("cell")
  }

  /** Squared L2 distance from `vec` to its NEAREST centroid:
    * |x|² − 2·max-score. Shares the score computation shape with
    * [[assignCell]]; the two columns fuse into one codegen stage.
    */
  def nearestDist2(vec: Column, centroids: Seq[Array[Double]]): Column =
    Similarity.dot(vec, vec) -
      lit(2.0) * array_max(cellScores(vec, centroids)).getField("s")

  /** Mergeable vector statistics: count, element-wise Σx, Σ|x|².
    * Enough to derive the cell mean (Σx / n) AND the within-cell
    * inertia against any centroid c — Σ|x−c|² = Σ|x|² − 2·(Σx)·c +
    * n·|c|² — without a second corpus pass. Buffer allocates lazily on
    * first input (dim is discovered from the data).
    */
  final class VecStatsState(
      var n: Long,
      var sumSq: Double,
      var sums: Array[Double]) extends Serializable {

    def add(v: Seq[Float]): VecStatsState = {
      if (sums == null) sums = new Array[Double](v.length)
      require(v.length == sums.length,
        s"inconsistent vector dims: ${v.length} vs ${sums.length}")
      var i = 0
      while (i < sums.length) {
        val x = v(i).toDouble
        sums(i) += x
        sumSq += x * x
        i += 1
      }
      n += 1
      this
    }

    def mergeIn(o: VecStatsState): VecStatsState = {
      if (o.sums == null) return this
      if (sums == null) { sums = o.sums; n = o.n; sumSq = o.sumSq; return this }
      require(o.sums.length == sums.length,
        s"inconsistent vector dims: ${o.sums.length} vs ${sums.length}")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
      n += o.n
      sumSq += o.sumSq
      this
    }
  }

  /** [[VecStatsState]] as a typed `Aggregator` — map-side combinable, so
    * a groupBy(cell) over it ships ≤ k slim states per task.
    */
  final class VecStatsAggregator
      extends Aggregator[Seq[Float], VecStatsState, (Long, Double, Seq[Double])] {
    override def zero: VecStatsState = new VecStatsState(0L, 0.0, null)
    override def reduce(b: VecStatsState, a: Seq[Float]): VecStatsState =
      if (a == null) b else b.add(a)
    override def merge(b1: VecStatsState, b2: VecStatsState): VecStatsState =
      b1.mergeIn(b2)
    override def finish(b: VecStatsState): (Long, Double, Seq[Double]) =
      (b.n, b.sumSq, if (b.sums == null) Seq.empty else b.sums.toSeq)
    override def bufferEncoder: org.apache.spark.sql.Encoder[VecStatsState] =
      org.apache.spark.sql.Encoders.kryo[VecStatsState]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[(Long, Double, Seq[Double])] =
      ExpressionEncoder[(Long, Double, Seq[Double])]()
  }

  /** One Lloyd iteration's outcome: per-cell sizes under the ASSIGNING
    * centroids, and the total inertia (Σ over rows of squared distance
    * to the centroid that claimed them) — the monotone non-increasing
    * objective callers use for convergence checks.
    */
  case class IterationStats(cellSizes: Map[Int, Long], inertia: Double)

  case class KMeansModel(
      centroids: Seq[Array[Double]],
      history: Seq[IterationStats])

  /** `iterations` Lloyd steps from `initial` centroids. Rows with null
    * or dim-mismatched vectors are excluded from training (filtered
    * once, up front). The projected vector frame is persisted across
    * iterations (memory-and-disk — at 100 TB that's the difference
    * between `iterations` parquet scans and one) and released before
    * returning.
    *
    * `roundDecimals >= 0` snaps every recomputed mean to that decimal
    * grid — cross-engine-replay determinism (summation order across
    * partitions varies run to run; a 6-decimal grid absorbs the
    * ~1e-13 noise). Negative = no rounding (production default).
    *
    * Empty cells keep their previous centroid (deterministic and
    * replayable; FAISS-style random re-seeding would break both).
    */
  def lloyd(
      corpus: DataFrame,
      vecCol: String,
      initial: Seq[Array[Double]],
      iterations: Int,
      roundDecimals: Int = -1): KMeansModel = {
    require(initial.nonEmpty, "lloyd needs at least one initial centroid")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val dim = initial.head.length
    require(initial.forall(_.length == dim), "initial centroids disagree on dim")

    val vecs = corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).as("graft_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = udaf(new VecStatsAggregator, ExpressionEncoder[Seq[Float]]())
      var centroids = initial.map(_.clone())
      val history = Seq.newBuilder[IterationStats]
      var iter = 0
      while (iter < iterations) {
        val states = vecs
          .groupBy(assignCell(col("graft_v"), centroids).as("graft_cell"))
          .agg(agg(col("graft_v")).as("graft_st"))
          .select(col("graft_cell"),
            col("graft_st._1").as("n"),
            col("graft_st._2").as("sumSq"),
            col("graft_st._3").as("sums"))
          .collect()
          .map(r => r.getInt(0) ->
            ((r.getLong(1), r.getDouble(2), r.getSeq[Double](3).toArray)))
          .toMap
        // inertia under the ASSIGNING centroids, from the slim states:
        // Σ|x−c|² = Σ|x|² − 2·(Σx)·c + n·|c|²
        val inertia = states.map { case (cell, (n, sumSq, sums)) =>
          val c = centroids(cell)
          var dot = 0.0
          var cn = 0.0
          var i = 0
          while (i < dim) { dot += sums(i) * c(i); cn += c(i) * c(i); i += 1 }
          sumSq - 2.0 * dot + n * cn
        }.sum
        history += IterationStats(
          states.map { case (cell, (n, _, _)) => cell -> n }, inertia)
        centroids = centroids.zipWithIndex.map { case (old, cell) =>
          states.get(cell) match {
            case Some((n, _, sums)) if n > 0 =>
              val m = new Array[Double](dim)
              var i = 0
              while (i < dim) {
                val mean = sums(i) / n
                m(i) = if (roundDecimals >= 0)
                  BigDecimal(mean)
                    .setScale(roundDecimals, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble
                else mean
                i += 1
              }
              m
            case _ => old // empty cell: carry the previous centroid
          }
        }
        iter += 1
      }
      KMeansModel(centroids.toSeq, history.result())
    } finally vecs.unpersist(blocking = false)
  }

  /** Deterministic, SQL-replayable init: the (valid) vectors of the k
    * lowest `idCol` rows. A k-row sort+limit — bounded driver collect.
    * Quality is data-dependent (adjacent ids may be similar documents);
    * use [[initKMeansPlusPlus]] when replayability is not required.
    */
  def initMinId(
      corpus: DataFrame, idCol: String, vecCol: String, k: Int): Seq[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = corpus
      .where(col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .select(col(vecCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .toSeq
    require(rows.length == k, s"corpus has only ${rows.length} valid vectors, need $k")
    rows
  }

  /** k-means++ seeding (Arthur & Vassilvitskii 2007) over a bounded
    * whole-corpus sample (per-partition reservoirs — the
    * [[Similarity.sampleVectors]] machinery): first seed = first sample
    * point, each next seed drawn d²-proportionally from the sample.
    * Driver-side over ≤ sampleSize points; deterministic for fixed
    * data + partitioning + seed.
    */
  def initKMeansPlusPlus(
      corpus: DataFrame,
      vecCol: String,
      k: Int,
      sampleSize: Int = 10000,
      seed: Long = 42L): Seq[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sample = Similarity.sampleVectors(corpus, vecCol, sampleSize, seed)
    require(sample.length >= k,
      s"sample has ${sample.length} vectors, need >= $k")
    val rng = new scala.util.Random(seed)
    val picked = scala.collection.mutable.ArrayBuffer(sample.head)
    val d2 = Array.fill(sample.length)(Double.MaxValue)
    while (picked.length < k) {
      val latest = picked.last
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        var d = 0.0
        var j = 0
        while (j < v.length) { val t = v(j) - latest(j); d += t * t; j += 1 }
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val total = d2.sum
      if (total <= 0.0) {
        // all sample mass already covered — fall back to round-robin
        picked += sample(picked.length % sample.length)
      } else {
        var r = rng.nextDouble() * total
        var idx = 0
        while (idx < d2.length - 1 && r >= d2(idx)) { r -= d2(idx); idx += 1 }
        picked += sample(idx)
      }
    }
    picked.toSeq
  }

  /** Full training entry point for production use: k-means++ init on a
    * whole-corpus sample, then `iterations` distributed Lloyd steps.
    */
  def trainKMeans(
      corpus: DataFrame,
      vecCol: String,
      k: Int,
      iterations: Int = 10,
      sampleSize: Int = 10000,
      seed: Long = 42L): KMeansModel =
    lloyd(corpus, vecCol,
      initKMeansPlusPlus(corpus, vecCol, k, sampleSize, seed), iterations)

  // -- integer-grid (quantized) Lloyd — the cross-engine-replay variant -----

  /** Snap a float/double vector column to the 1/`scale` integer grid:
    * q_i = floor(x_i * scale + 0.5) as LONG. `floor(x*s + 0.5)`
    * (round-half-up toward +inf) is the one rounding rule every engine
    * evaluates identically — `round()` tie conventions vary across
    * engines and versions, and FLOAT→DOUBLE widening plus one multiply
    * and one add are exact IEEE operations everywhere. All downstream
    * k-means / cosine math on the grid is EXACT 64-bit integer
    * arithmetic, so an independent engine replaying the same definition
    * (the DuckDB oracle) lands on bit-identical decisions regardless of
    * engine version, kernel precision, or summation order — the
    * cross-version determinism that rounded-double trajectories
    * (r13-r16) could not deliver.
    */
  def quantizeVec(vec: Column, scale: Long = 1000L): Column =
    transform(vec, x => floor(x.cast(DoubleType) * scale + lit(0.5)))

  /** Per-cell assignment scores on the integer grid, as one struct-array
    * column. With vectors at scale S (vq = S·v) and centroids at scale
    * S·M (cq = S·M·c), the squared-L2 argmin over cells equals the
    * argmax of key(c) = 2·M·(vq·cq) − |cq|² — the usual score
    * s = v·c − |c|²/2 scaled by the positive constant 2·S²·M², in exact
    * Long math end to end. Ties break to the HIGHER cell (max-struct
    * semantics, same as [[cellScores]]). Envelope: for unit-norm-ish
    * vectors and S = M = 1000 the key is ~3e12, five orders under Long;
    * genuinely unbounded inputs would fail loudly under ANSI overflow.
    */
  private def quantCellScores(
      vecQ: Column, centroids: Seq[Array[Long]], m: Long): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      // native codegen'd kernel (graft.expressions.LongDotProduct) — a
      // tight primitive loop inside whole-stage codegen, vs the HOF
      // aggregate(zip_with(...)) fallback interpreter
      val dot = graft.expressions.GraftFunctions
        .dot_long(vecQ, typedLit(c.toSeq))
      val norm2 = c.foldLeft(0L)((a, x) => a + x * x)
      struct((lit(2L * m) * dot - lit(norm2)).as("s"), lit(i).as("cell"))
    }: _*)

  /** Nearest-centroid cell on the integer grid (see [[quantCellScores]]);
    * pure map-side expression, whole-stage codegen.
    */
  def assignCellQuantized(
      vecQ: Column, centroids: Seq[Array[Long]], m: Long = 1000L): Column = {
    require(centroids.nonEmpty, "assignCellQuantized needs >= 1 centroid")
    array_max(quantCellScores(vecQ, centroids, m)).getField("cell")
  }

  /** Mergeable integer vector statistics: count, element-wise Σvq, Σ|vq|²
    * — all Long, so the per-cell fold is exact and order-free (a true
    * commutative monoid, not just one up to float rounding).
    */
  final class QuantVecStatsState(
      var n: Long,
      var sumSq: Long,
      var sums: Array[Long]) extends Serializable {

    def add(v: Seq[Long]): QuantVecStatsState = {
      if (sums == null) sums = new Array[Long](v.length)
      require(v.length == sums.length,
        s"inconsistent vector dims: ${v.length} vs ${sums.length}")
      var i = 0
      while (i < sums.length) {
        val x = v(i)
        sums(i) += x
        sumSq += x * x
        i += 1
      }
      n += 1
      this
    }

    def mergeIn(o: QuantVecStatsState): QuantVecStatsState = {
      if (o.sums == null) return this
      if (sums == null) { sums = o.sums; n = o.n; sumSq = o.sumSq; return this }
      require(o.sums.length == sums.length,
        s"inconsistent vector dims: ${o.sums.length} vs ${sums.length}")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
      n += o.n
      sumSq += o.sumSq
      this
    }
  }

  /** [[QuantVecStatsState]] as a typed `Aggregator` — map-side
    * combinable, so groupBy(cell) ships ≤ k slim states per task
    * (the [[VecStatsAggregator]] scale shape, integer-exact).
    */
  final class QuantVecStatsAggregator
      extends Aggregator[Seq[Long], QuantVecStatsState, (Long, Long, Seq[Long])] {
    override def zero: QuantVecStatsState = new QuantVecStatsState(0L, 0L, null)
    override def reduce(b: QuantVecStatsState, a: Seq[Long]): QuantVecStatsState =
      if (a == null) b else b.add(a)
    override def merge(b1: QuantVecStatsState, b2: QuantVecStatsState): QuantVecStatsState =
      b1.mergeIn(b2)
    override def finish(b: QuantVecStatsState): (Long, Long, Seq[Long]) =
      (b.n, b.sumSq, if (b.sums == null) Seq.empty else b.sums.toSeq)
    override def bufferEncoder: org.apache.spark.sql.Encoder[QuantVecStatsState] =
      org.apache.spark.sql.Encoders.kryo[QuantVecStatsState]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[(Long, Long, Seq[Long])] =
      ExpressionEncoder[(Long, Long, Seq[Long])]()
  }

  /** One quantized Lloyd iteration's outcome. `inertiaNum` is the EXACT
    * integer inertia numerator Σ over rows of |M·vq − cq|² (real inertia
    * × (S·M)²) under the ASSIGNING centroids — derived from the slim
    * states as M²·Σ|vq|² − 2M·(Σvq)·cq + n·|cq|², all Long.
    */
  case class QuantIterationStats(cellSizes: Map[Int, Long], inertiaNum: Long)

  /** Quantized k-means model: centroids as Long vectors at scale
    * `scale * m` (components = floor-div exact integers), so any engine
    * can replay assignment bit-for-bit.
    */
  case class QuantKMeansModel(
      centroids: Seq[Array[Long]],
      scale: Long,
      m: Long,
      history: Seq[QuantIterationStats])

  /** Deterministic, SQL-replayable init for [[lloydQuantized]]: the
    * quantized vectors of the k lowest `idCol` rows, pre-scaled by `m`
    * to centroid scale. Bounded k-row collect.
    */
  def initMinIdQuantized(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      scale: Long = 1000L,
      m: Long = 1000L): Seq[Array[Long]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = corpus
      .where(col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .select(quantizeVec(col(vecCol), scale))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).map(_ * m).toArray)
      .toSeq
    require(rows.length == k,
      s"corpus has only ${rows.length} valid vectors, need $k")
    rows
  }

  /** `iterations` Lloyd steps on the 1/`scale` integer grid — the same
    * distribution shape as [[lloyd]] (map-side assignment expressions,
    * one groupBy over slim mergeable states per iteration, k-row driver
    * collect), but with EVERY arithmetic decision in exact 64-bit
    * integer math: assignment keys, centroid updates (floor-division
    * cq_i = floorDiv(M·Σvq_i, n) — `Math.floorDiv`, which equals the
    * SQL-replayable `(a - ((a % b + b) % b)) / b`), and the inertia
    * numerator. Two engines implementing this definition agree
    * bit-for-bit with no rounding-grid or margin argument at all.
    * Empty cells carry their previous centroid ([[lloyd]] semantics).
    */
  def lloydQuantized(
      corpus: DataFrame,
      vecCol: String,
      initial: Seq[Array[Long]],
      iterations: Int,
      scale: Long = 1000L,
      m: Long = 1000L): QuantKMeansModel = {
    require(initial.nonEmpty, "lloydQuantized needs at least one centroid")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val dim = initial.head.length
    require(initial.forall(_.length == dim), "initial centroids disagree on dim")

    val vecs = corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(quantizeVec(col(vecCol), scale).as("graft_vq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = udaf(new QuantVecStatsAggregator, ExpressionEncoder[Seq[Long]]())
      var centroids = initial.map(_.clone())
      val history = Seq.newBuilder[QuantIterationStats]
      var iter = 0
      while (iter < iterations) {
        val states = vecs
          .groupBy(
            assignCellQuantized(col("graft_vq"), centroids, m).as("graft_cell"))
          .agg(agg(col("graft_vq")).as("graft_st"))
          .select(col("graft_cell"),
            col("graft_st._1").as("n"),
            col("graft_st._2").as("sumSq"),
            col("graft_st._3").as("sums"))
          .collect()
          .map(r => r.getInt(0) ->
            ((r.getLong(1), r.getLong(2), r.getSeq[Long](3).toArray)))
          .toMap
        // exact inertia numerator under the ASSIGNING centroids:
        // Σ|M·vq − cq|² = M²·Σ|vq|² − 2M·(Σvq)·cq + n·|cq|²
        val inertiaNum = states.map { case (cell, (n, sumSq, sums)) =>
          val c = centroids(cell)
          var dot = 0L
          var cn = 0L
          var i = 0
          while (i < dim) { dot += sums(i) * c(i); cn += c(i) * c(i); i += 1 }
          m * m * sumSq - 2L * m * dot + n * cn
        }.sum
        history += QuantIterationStats(
          states.map { case (cell, (n, _, _)) => cell -> n }, inertiaNum)
        centroids = centroids.zipWithIndex.map { case (old, cell) =>
          states.get(cell) match {
            case Some((n, _, sums)) if n > 0 =>
              Array.tabulate(dim)(i => Math.floorDiv(m * sums(i), n))
            case _ => old // empty cell: carry the previous centroid
          }
        }
        iter += 1
      }
      QuantKMeansModel(centroids.toSeq, scale, m, history.result())
    } finally vecs.unpersist(blocking = false)
  }

  /** Final quantized assignment: `df`'s columns plus `cell` (exact
    * integer argmin) and `dist2num` (EXACT integer squared distance
    * numerator |M·vq − cq|² = M²·|vq|² − key, at real-distance scale
    * (S·M)²). Rows with null or dim-mismatched vectors get null
    * cell/dist2num ([[assign]] semantics). Pure map-side, one codegen
    * stage — the score array is shared between the argmax and the
    * distance.
    */
  def assignQuantized(
      df: DataFrame, vecCol: String, model: QuantKMeansModel): DataFrame = {
    require(model.centroids.nonEmpty, "assignQuantized needs >= 1 centroid")
    val dim = model.centroids.head.length
    val valid = col(vecCol).isNotNull && size(col(vecCol)) === dim
    // quantize into a NAMED column so the k per-cell score folds and the
    // norm fold reference one computed array instead of re-inlining the
    // quantization transform per use (the q103 expression-shape lesson)
    val vqCol = "graft_vq_assign"
    val vq = col(vqCol)
    val best = array_max(quantCellScores(vq, model.centroids, model.m))
    val n2v = graft.expressions.GraftFunctions.dot_long(vq, vq)
    df.withColumn(vqCol, when(valid, quantizeVec(col(vecCol), model.scale)))
      .withColumn("cell", when(valid, best.getField("cell")))
      .withColumn("dist2num",
        when(valid,
          lit(model.m * model.m) * n2v - best.getField("s")))
      .drop(vqCol)
  }

  // -- incremental QUANTIZED cell state: the exact-integer twin of the
  // double path below — same scale shape (one scan, numTasks × k slim
  // states), but the state is a TRUE monoid (Long counts, Long vector
  // sums, Long Σ|vq|²), so merged == full holds with integer equality,
  // not an epsilon band, and an independent engine replays it exactly.

  /** Per-cell exact-integer sufficient statistics of `corpus` under
    * FIXED quantized centroids — (cell, n, sum_sq, sums), all Long.
    */
  def cellStateQuantized(
      corpus: DataFrame,
      vecCol: String,
      centroids: Seq[Array[Long]],
      scale: Long = 1000L,
      m: Long = 1000L): DataFrame = {
    require(centroids.nonEmpty, "cellStateQuantized needs >= 1 centroid")
    val dim = centroids.head.length
    val agg = udaf(new QuantVecStatsAggregator, ExpressionEncoder[Seq[Long]]())
    corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(quantizeVec(col(vecCol), scale).as("graft_vq"))
      .groupBy(assignCellQuantized(col("graft_vq"), centroids, m).as("cell"))
      .agg(agg(col("graft_vq")).as("graft_st"))
      .select(col("cell"),
        col("graft_st._1").as("n"),
        col("graft_st._2").as("sum_sq"),
        col("graft_st._3").as("sums"))
  }

  /** Exact monoid merge of quantized cell states — integer addition
    * end to end (contrast [[mergeCellStates]]' float-order band).
    */
  def mergeCellStatesQuantized(a: DataFrame, b: DataFrame): DataFrame =
    foldCellStatesQuantized(a.unionByName(b))

  /** [[mergeCellStatesQuantized]] over ONE frame holding any number of
    * stacked state parts — the N-ary fold a streaming ingest
    * ([[graft.streaming.StreamingOps.SketchStateIngest]]) applies at
    * read and compaction time. Counts and sums ADD (non-idempotent):
    * duplicate parts would double them, which is exactly what the
    * ingest's supersession-manifest compaction protocol prevents.
    */
  def foldCellStatesQuantized(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("cell"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_sq")).as("sum_sq"),
        collect_list(col("sums")).as("graft_ls"))
      .select(col("cell"), col("n"), col("sum_sq"),
        aggregate(
          slice(col("graft_ls"), lit(2),
            greatest(size(col("graft_ls")) - 1, lit(0))),
          element_at(col("graft_ls"), 1),
          (acc, v) => zip_with(acc, v, (x, y) => x + y)).as("sums"))

  /** Embedding-space population drift between two cell-state snapshots
    * (the [[cellStateQuantized]] family, FIXED shared centroids): the
    * per-cell occupancy census of both sides FULL OUTER joined on the
    * cell key, with EXACT integer drift lanes —
    *
    *  - `n_a` / `n_b`: the cell's population in each snapshot (0 when
    *    the cell is empty on that side);
    *  - `tot_a` / `tot_b`: whole-snapshot totals (identical on every
    *    row — they ride along so every row is self-contained);
    *  - `l1_num`: |n_a·tot_b − n_b·tot_a| — the cell's contribution to
    *    the population L1 distance at scale tot_a·tot_b.
    *    Σ(l1_num)/(tot_a·tot_b) = Σ|n_a/tot_a − n_b/tot_b| ∈ [0, 2],
    *    and any drift DECISION (alarm thresholds) can be taken on the
    *    cross-multiplied integers — exact on every engine, the same
    *    construction as the integer-grid contamination threshold.
    *
    * This is the q152 drift-report shape applied to embedding geometry:
    * two persisted KB-scale states in, a k-row frame out, the corpora
    * never rescanned. For the CONSTRAINT surface, feed this frame to
    * [[graft.operators.CellPopulationDrift]]
    * (`Check.hasCellPopulationDrift` / DQDL `CellPopulationDrift`).
    */
  def cellPopulationDrift(a: DataFrame, b: DataFrame): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("cell"), col("n").as(s"n_$tag"))
    val joined = side(a, "a").join(side(b, "b"), Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // k-row inputs: the totals frame is 1 row and the join is a k×1
    // broadcast — nothing here scales with the corpus behind the states
    val totals = joined.agg(
      sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    joined.crossJoin(broadcast(totals))
      .withColumn("l1_num",
        abs(col("n_a") * col("tot_b") - col("n_b") * col("tot_a")))
  }

  /** Centroids from a (possibly merged) quantized state: the
    * [[lloydQuantized]] update rule — cq_i = floorDiv(m·Σvq_i, n),
    * empty/absent cells carry `previous`.
    */
  def centroidsFromStateQuantized(
      state: DataFrame,
      previous: Seq[Array[Long]],
      m: Long = 1000L): Seq[Array[Long]] = {
    val dim = previous.head.length
    val rows = state.select(col("cell"), col("n"), col("sums"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2).toArray)))
      .toMap
    previous.zipWithIndex.map { case (old, cell) =>
      rows.get(cell) match {
        case Some((n, sums)) if n > 0 =>
          Array.tabulate(dim)(i => Math.floorDiv(m * sums(i), n))
        case _ => old
      }
    }
  }

  // -- incremental centroid state (the q76/q93 persisted-state shape) -------

  /** Per-cell sufficient statistics of `corpus` under FIXED centroids —
    * the production refresh shape: a daily batch computes ONLY its own
    * state (one scan + the numTasks × k slim-state shuffle), merges with
    * the persisted history ([[mergeCellStates]] — the stats form a
    * commutative monoid), and re-derives centroids from counts
    * ([[centroidsFromState]]) without rescanning history. Output: one
    * row per non-empty cell — (cell, n, sum_sq, sums).
    */
  def cellState(
      corpus: DataFrame,
      vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "cellState needs at least one centroid")
    val dim = centroids.head.length
    val agg = udaf(new VecStatsAggregator, ExpressionEncoder[Seq[Float]]())
    corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).as("graft_v"))
      .groupBy(assignCell(col("graft_v"), centroids).as("cell"))
      .agg(agg(col("graft_v")).as("graft_st"))
      .select(col("cell"),
        col("graft_st._1").as("n"),
        col("graft_st._2").as("sum_sq"),
        col("graft_st._3").as("sums"))
  }

  /** Persist a cell state to parquet (k slim rows). */
  def writeCellState(state: DataFrame, path: String): Unit =
    state.select(col("cell"), col("n"), col("sum_sq"), col("sums"))
      .write.mode("overwrite").parquet(path)

  def readCellState(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame =
    spark.read.parquet(path)

  /** Monoid merge of cell states: integer-exact on counts, element-wise
    * double sums on the vectors (associative up to float rounding — the
    * [[centroidsFromState]] decimal grid absorbs the ~1e-13 order
    * noise). k-row frames; the fold is list-aggregation over at most
    * one row per state per cell.
    */
  def mergeCellStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("cell"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_sq")).as("sum_sq"),
        // collect ONCE, fold in the next select: two collect_list calls
        // would be independent aggregate expressions whose collection
        // orders can disagree, double-counting one vector and dropping
        // another
        collect_list(col("sums")).as("graft_ls"))
      .select(col("cell"), col("n"), col("sum_sq"),
        // element-wise vector sum: fold the (<= 2 per cell) collected
        // sum-vectors with zip_with; zero = the first vector's shape
        aggregate(
          // exact tail length — slice(_, 2, Int.MaxValue) overflows
          // start+length inside Slice and yields an EMPTY tail, silently
          // dropping every vector after the first
          slice(col("graft_ls"), lit(2),
            greatest(size(col("graft_ls")) - 1, lit(0))),
          element_at(col("graft_ls"), 1),
          (acc, v) => zip_with(acc, v, (x, y) => x + y)).as("sums"))

  /** Re-derive centroids from a (possibly merged) state: mean per cell
    * snapped to the `roundDecimals` grid; cells absent from the state
    * (or empty) carry their previous centroid — [[lloyd]] semantics
    * exactly, so `centroidsFromState(merge(state(A), state(B)))` equals
    * one distributed Lloyd step over A ∪ B on the same grid.
    */
  def centroidsFromState(
      state: DataFrame,
      previous: Seq[Array[Double]],
      roundDecimals: Int = 6): Seq[Array[Double]] = {
    val dim = previous.head.length
    val rows = state.select(col("cell"), col("n"), col("sums"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Double](2).toArray)))
      .toMap
    previous.zipWithIndex.map { case (old, cell) =>
      rows.get(cell) match {
        case Some((n, sums)) if n > 0 =>
          Array.tabulate(dim) { i =>
            val mean = sums(i) / n
            if (roundDecimals >= 0)
              BigDecimal(mean)
                .setScale(roundDecimals, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            else mean
          }
        case _ => old
      }
    }
  }

  /** Final cluster assignment: `df`'s columns plus `cell` (nearest
    * centroid) and `dist2` (squared L2 to it). Rows whose vector is
    * null or dim-mismatched get null cell/dist2 — they were never
    * trained on, and a made-up cell would poison downstream stratified
    * sampling. Pure map-side; composes into larger plans unmaterialized.
    */
  def assign(
      df: DataFrame, vecCol: String, centroids: Seq[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    val dim = centroids.head.length
    val valid = col(vecCol).isNotNull && size(col(vecCol)) === dim
    df.withColumn("cell",
        when(valid, assignCell(col(vecCol), centroids)))
      .withColumn("dist2",
        when(valid, nearestDist2(col(vecCol), centroids)))
  }
}
