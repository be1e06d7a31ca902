package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - Brute-force top-k: broadcast the (small) query set against the corpus —
  *   one scan, no shuffle of the corpus, per-partition local top-k via
  *   window rank on (query, -similarity).
  * - Random-hyperplane LSH: 1-bit-per-plane signature as pure expressions;
  *   pairs/probes only compare within matching buckets, turning O(n²) into
  *   an equi-join. The scale path for corpus-vs-corpus similarity.
  *
  * All vector math is `zip_with`/`aggregate` column expressions (codegen'd),
  * no UDFs.
  */
object Similarity {

  /** Dot product of two array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero vectors get 0.0 via a short-circuiting guard:
    * under ANSI mode (the Spark 4 default) a bare division would raise
    * DIVIDE_BY_ZERO, and a NaN would order GREATER than every number in
    * filters and DESC sorts — passing any threshold and ranking first in
    * every top-k.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0.0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Exact-cosine verify over a joined pair frame
    * (id_a, id_b, vec_a, vec_b) as ONE tight per-partition pass. The
    * zip_with/aggregate expression form runs interpreted (HOFs sit outside
    * whole-stage codegen) and dominates wall time at millions of candidate
    * pairs; this is the same double-precision math at memory bandwidth.
    * Keeps only pairs with cosine >= threshold.
    */
  private[pipeline] def cosineVerify(pairs: DataFrame, threshold: Double): DataFrame = {
    val schema = pairs.schema
    val outSchema = StructType(Seq(
      schema("id_a"), schema("id_b"),
      StructField("similarity", DoubleType, nullable = false)))
    val (ia, ib) = (schema.fieldIndex("id_a"), schema.fieldIndex("id_b"))
    val (va, vb) = (schema.fieldIndex("vec_a"), schema.fieldIndex("vec_b"))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    pairs.mapPartitions { rows =>
      rows.flatMap { r =>
        val a = if (r.isNullAt(va)) Seq.empty[Float] else r.getSeq[Float](va)
        val b = if (r.isNullAt(vb)) Seq.empty[Float] else r.getSeq[Float](vb)
        var dotp = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dotp += x * y; na += x * x; nb += y * y
          i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        val sim = if (denom == 0.0) 0.0 else dotp / denom
        if (sim >= threshold) Some(org.apache.spark.sql.Row(r.get(ia), r.get(ib), sim))
        else None
      }
    }
  }

  /** EXACT all-pairs cosine >= threshold by brute force — the small-scale
    * ground truth for LSH recall audits. O(n²) by construction; bound the
    * input (the recall audits use a fixed id-subset).
    */
  def cosinePairsBrute(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    cosineVerify(a.crossJoin(b).filter(col("id_a") < col("id_b")), threshold)
  }

  /** Exact all-pairs cosine-threshold census on the 1/`scale` INTEGER
    * GRID — the cross-engine-proof ground truth for LSH recall audits:
    * a pair is counted iff its grid cosine clears τ with τ² =
    * tau2Num/tau2Den exactly (0.42² = 441/2500), decided by the exact
    * cross-multiplied-squares test dq > 0 ∧ tau2Den·dq² ≥
    * tau2Num·|a|²·|b|² — 64-bit integer arithmetic end to end (the
    * [[decontaminateByEmbeddingGrid]] convention; dots via the native
    * codegen'd [[graft.expressions.LongDotProduct]] kernel). Same
    * bounded-audit scale contract as [[cosinePairsBrute]]: O(n²), for
    * id-restricted subsets only.
    */
  def cosinePairsBruteGrid(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau2Num: Long,
      tau2Den: Long,
      scale: Long = 1000L): DataFrame = {
    import graft.expressions.GraftFunctions.dot_long
    val q = df
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as("graft_id"),
        Clustering.quantizeVec(col(vecCol), scale).as("graft_vq"))
      .withColumn("graft_n2", dot_long(col("graft_vq"), col("graft_vq")))
    val a = q.select(col("graft_id").as("id_a"),
      col("graft_vq").as("graft_vqa"), col("graft_n2").as("graft_n2a"))
    val b = q.select(col("graft_id").as("id_b"),
      col("graft_vq").as("graft_vqb"), col("graft_n2").as("graft_n2b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("graft_dq", dot_long(col("graft_vqa"), col("graft_vqb")))
      .filter(col("graft_dq") > 0L &&
        lit(tau2Den) * col("graft_dq") * col("graft_dq") >=
          lit(tau2Num) * col("graft_n2a") * col("graft_n2b"))
      .select("id_a", "id_b")
  }

  // -- embedding storage transforms ------------------------------------------

  /** Evaluates `scalar` ONCE per row and hands it to `f` as a bound lambda
    * variable. HOF lambda bodies get no common-subexpression elimination:
    * a whole-vector subexpression (norm, array_max) referenced inside a
    * per-element lambda is re-evaluated on every element access — O(d²) per
    * vector. A HOF's *argument*, by contrast, is evaluated once per row, and
    * lambda-variable reads are O(1); wrapping (scalar, vec) in a 1-element
    * array and transforming over it makes the whole pipeline O(d).
    */
  private def bindScalar(scalar: Column, vec: Column)(
      f: (Column, Column) => Column): Column =
    element_at(
      transform(array(struct(scalar.as("s"), vec.as("v"))),
        b => f(b.getField("s"), b.getField("v"))),
      1)

  /** L2-normalized copy of the vector (floats); zero vectors pass through
    * unchanged instead of becoming NaN. The norm is bound once per row
    * (not recomputed per element — see [[bindScalar]]).
    */
  def l2Normalize(vec: Column): Column =
    bindScalar(norm(vec), vec) { (n, v) =>
      when(n > 0.0, transform(v, x => (x.cast(DoubleType) / n).cast(FloatType)))
        .otherwise(v)
    }

  /** Symmetric per-vector int8 quantization: struct(scale float,
    * codes array<tinyint>) with code = round(x / scale), scale =
    * max|x| / 127 — 4x smaller than float32 at ~0.3% cosine error on
    * typical embeddings; the storage/bandwidth format for a 100-TB
    * embedding corpus. Zero vectors quantize to scale 0 + zero codes.
    * The scale is bound once per row (see [[bindScalar]]).
    */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast(DoubleType))))
    val scale = when(maxAbs > 0.0, maxAbs / lit(127.0)).otherwise(lit(0.0))
    bindScalar(scale, vec) { (s, v) =>
      struct(
        s.cast(FloatType).as("scale"),
        transform(v, x =>
          when(s > 0.0, round(x.cast(DoubleType) / s).cast(ByteType))
            .otherwise(lit(0).cast(ByteType))).as("codes"))
    }
  }

  /** Dequantized float vector from a [[quantizeInt8]] struct. The scale is
    * bound once per row (see [[bindScalar]]).
    */
  def dequantizeInt8(q: Column): Column =
    bindScalar(q.getField("scale").cast(DoubleType), q.getField("codes")) {
      (s, codes) => transform(codes, c => (c.cast(DoubleType) * s).cast(FloatType))
    }

  // -------------------------------------------------------------------------
  // Bounded per-query top-k selection — the scale-safe tail every ANN path
  // shares. `row_number().over(Window.partitionBy(query_id))` puts EVERY
  // candidate row of one query into ONE window partition: one task sorts
  // them all, which for a whole-corpus ADC scan is a guaranteed single-task
  // straggler/OOM at 100 TB. A bounded heap `Aggregator` instead keeps k
  // items of state per (partition, query) map-side, partial-combines before
  // the shuffle, and ships only numQueries × k survivors — TakeOrdered
  // semantics expressed as a mergeable aggregate.
  // -------------------------------------------------------------------------

  /** Mutable bounded top-k state under the ranking (score desc, id asc):
    * a binary heap whose ROOT is the WORST kept item, so a candidate
    * enters in O(log k) only if it beats the root. Streaming a corpus
    * partition through costs O(rows · log k) with 16·k bytes of state;
    * states merge associatively (shuffle ships serialized heaps, not
    * candidate rows).
    */
  final class TopKState(val k: Int) extends Serializable {
    var n: Int = 0
    var scores: Array[Double] = new Array[Double](k)
    var ids: Array[Long] = new Array[Long](k)

    // "(sa, ia) ranks strictly worse than (sb, ib)" under (score desc, id asc)
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    @inline private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(j); ids(i) = ids(j)
      scores(j) = ts; ids(j) = ti
    }

    def add(s: Double, id: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1
        // sift up: parent must be worse-or-equal than children
        var i = n - 1
        while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        // sift down from the root
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == i) done = true else { swap(i, w); i = w }
        }
      }
    }

    def mergeIn(o: TopKState): TopKState = {
      var i = 0
      while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
      this
    }

    /** Kept items best-first: (score desc, id asc). */
    def sortedDesc: Seq[(Double, Long)] =
      (0 until n).map(i => (scores(i), ids(i)))
        .sortBy { case (s, id) => (-s, id) }
  }

  /** TakeOrdered-per-group as a typed `Aggregator`: mergeable, map-side
    * combinable, k-bounded state — the window-free top-k selection.
    */
  final class TopKAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), TopKState, Seq[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: TopKState = new TopKState(k)
    override def reduce(b: TopKState, a: (Double, Long)): TopKState = {
      b.add(a._1, a._2); b
    }
    override def merge(b1: TopKState, b2: TopKState): TopKState = b1.mergeIn(b2)
    override def finish(b: TopKState): Seq[(Double, Long)] = b.sortedDesc
    override def bufferEncoder: org.apache.spark.sql.Encoder[TopKState] =
      org.apache.spark.sql.Encoders.kryo[TopKState]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Exact per-query top-k of a scored candidate frame, no window: one
    * groupBy(query) over [[TopKAggregator]], then posexplode of the
    * (≤ k)-element result array assigns ranks. Identical output contract
    * to `row_number().over(partitionBy(query).orderBy(score desc, id
    * asc)) <= k` — same rows, same ranks, same tie-breaks — but a corpus
    * partition contributes at most k candidates per query to the shuffle
    * instead of all of them, and no task ever sorts more than the
    * aggregated survivors. Ids must be integral (the heap state is
    * primitive long).
    */
  private[pipeline] def topKPerQuery(
      scored: DataFrame,
      queryCol: String,
      idCol: String,
      scoreCol: String,
      k: Int): DataFrame = {
    val idType = scored.schema(idCol).dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"topKPerQuery needs an integral id column; '$idCol' is ${idType.simpleString}")
    val agg = udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(col(queryCol))
      .agg(agg(col(scoreCol).cast(DoubleType), col(idCol).cast(LongType))
        .as("graft_top"))
      .select(col(queryCol), posexplode(col("graft_top")).as(Seq("graft_pos", "graft_t")))
      .select(col(queryCol),
        col("graft_t._2").cast(idType).as(idCol),
        col("graft_t._1").as(scoreCol),
        (col("graft_pos") + 1).cast(IntegerType).as("rank"))
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * Use when `queries` is small (it is broadcast). Returns
    * (queryId, neighborId, similarity, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("graft_cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("graft_qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("similarity", cosine(col("graft_cv"), col("graft_qv")))
    // deterministic: ties break on neighbor id
    topKPerQuery(scored, "query_id", "neighbor_id", "similarity", k)
  }

  /** Named-observation channel for the LSH bucket cap: every
    * [[cosinePairsLsh]] run reports `excluded_rows` (rows the cap dropped
    * across all tables — nonzero means the parameterization is losing
    * recall silently) and `banded_rows` (rows entering the cap) under an
    * observation named `graft_lsh_cap_<n>`. Read them from
    * `QueryExecution.observedMetrics` or a `QueryExecutionListener`; names
    * are unique per call so several LSH passes in one plan don't collide.
    */
  object LshCapObservation {
    val Prefix = "graft_lsh_cap_"
    private val counter = new java.util.concurrent.atomic.AtomicLong()
    private[pipeline] def nextName(): String = Prefix + counter.incrementAndGet()
  }

  /** Smallest plane count whose bucket grid can hold the whole corpus
    * under the cap, with 2x headroom for non-uniform bucket occupancy:
    * 2^planes * maxBucketSize >= 2 * corpusSize. Below this, the cap
    * uniformly excludes rows no matter how the data distributes
    * ([[cosinePairsLsh]]'s "SIZE the parameters" contract, made
    * computable).
    */
  def planesFor(corpusSize: Long, maxBucketSize: Int = 1000): Int = {
    require(corpusSize >= 0 && maxBucketSize > 0)
    val needed = math.ceil(
      math.log(math.max(2.0 * corpusSize / maxBucketSize, 1.0)) / math.log(2.0)).toInt
    math.max(1, needed)
  }

  /** (planes, numTables) sized for a corpus: planes from [[planesFor]]
    * (capacity), then enough OR-amplification tables that a pair at
    * exactly `threshold` becomes a candidate with probability >=
    * `targetRecall`: with p = 1 - acos(threshold)/pi per plane,
    * P(candidate) = 1 - (1 - p^planes)^numTables. Tables are capped at 512
    * — beyond that the threshold/corpus combination needs a different
    * algorithm (more probes or higher threshold), not more tables.
    */
  def lshParamsFor(
      corpusSize: Long,
      threshold: Double,
      targetRecall: Double = 0.95,
      maxBucketSize: Int = 1000): (Int, Int) = {
    require(targetRecall > 0.0 && targetRecall < 1.0, "targetRecall must be in (0, 1)")
    val planes = planesFor(corpusSize, maxBucketSize)
    val p = 1.0 - math.acos(math.min(math.max(threshold, -1.0), 1.0)) / math.Pi
    val pPlanes = math.pow(p, planes)
    val tables =
      if (pPlanes >= 1.0) 1
      else if (pPlanes <= 0.0) 512
      else math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - pPlanes)).toInt
    (planes, math.min(math.max(tables, 1), 512))
  }

  /** Deterministic pseudo-random unit-ish hyperplane component for
    * (table, plane, dimension): hash mapped to [-1, 1). Shared by signature
    * computation on both sides of any join — no stored model needed.
    */
  private def planeComponent(tableSeed: Column, plane: Column, dim: Column): Column =
    (xxhash64(tableSeed, plane, dim).cast(DoubleType) / lit(Long.MaxValue.toDouble))

  /** `planes`-bit random-hyperplane signature of a vector; plane loop is
    * unrolled Scala-side so shift amounts stay literal. `tableSeed` picks an
    * independent hyperplane family per LSH table (OR-amplification).
    */
  def lshSignature(vec: Column, planes: Int = 16, tableSeed: Int = 0): Column =
    (0 until planes).map { p =>
      when(
        aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast(DoubleType) * planeComponent(lit(tableSeed), lit(p), i)),
          lit(0.0), (acc, v) => acc + v) > 0.0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** All pairs with cosine >= threshold, candidate-generated by multi-table
    * random-hyperplane LSH and verified exactly.
    *
    * AND-OR amplification: a pair collides when ALL `planes` bits of ANY of
    * the `numTables` tables agree — P(candidate) = 1 − (1 − p^planes)^numTables
    * with p = 1 − θ/π. Fewer planes / more tables raises recall at the cost
    * of more candidate pairs; the exact-cosine verify keeps precision at 1.
    * Pathologically popular buckets (e.g. all-zero vectors in bucket 0) are
    * capped at `maxBucketSize` rows (uniform hash-ordered exclusion) so no
    * bucket can go quadratic at scale.
    *
    * SIZE the parameters to the corpus: each table has 2^planes buckets, so
    * rows beyond ~2^planes * maxBucketSize per table are excluded by the
    * cap and cannot form candidates — at N vectors choose planes >=
    * log2(N / maxBucketSize) (or raise maxBucketSize) to keep every row in
    * play. Zero vectors verify at cosine 0.0 (see [[cosine]]), so they are
    * never reported as near-duplicates.
    */
  def cosinePairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 16,
      numTables: Int = 1,
      maxBucketSize: Int = 1000,
      maxPairsPerDoc: Int = Int.MaxValue): DataFrame = {
    val banded = df
      .select(col(idCol).as("graft_id"), col(vecCol).as("graft_vec"))
      .select(col("graft_id"), col("graft_vec"),
        posexplode(array((0 until numTables).map(t =>
          lshSignature(col("graft_vec"), planes, t)): _*)))
      .withColumnRenamed("pos", "graft_table")
      .withColumnRenamed("col", "graft_bucket")
    // cap skewed buckets — de-windowed (Capping.capBuckets: a hot bucket
    // is never sorted in one task), hash order: uniform, deterministic
    // exclusion under capping. banded persists so the threshold
    // aggregation and the filter join share one signature computation;
    // capped persists because both self-join sides probe it. The
    // observation surfaces what the cap silently drops: a mis-sized
    // `planes` for the corpus otherwise loses recall with no signal (see
    // LshCapObservation).
    val bandedCached = banded
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Capping.capBuckets(bandedCached,
        Seq("graft_table", "graft_bucket"), "graft_id", maxBucketSize,
        LshCapObservation.nextName())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = capped.select(col("graft_table"), col("graft_bucket"),
      col("graft_id").as("id_a"), col("graft_vec").as("vec_a"))
    val b = capped.select(col("graft_table"), col("graft_bucket"),
      col("graft_id").as("id_b"), col("graft_vec").as("vec_b"))
    val candidates = a.join(b, Seq("graft_table", "graft_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b")
    // verify BEFORE deduplicating across tables: the tight-loop cosine is
    // cheaper per candidate than shuffling vector payloads through a
    // dropDuplicates exchange, and the join pipelines straight into it —
    // the only shuffle of pair rows happens on the (small) verified set
    val pairs = Dedup.budgetPairs(
      cosineVerify(candidates, threshold).dropDuplicates("id_a", "id_b"),
      maxPairsPerDoc, LshCapObservation.nextName())
    CacheLifecycle.releaseOnConsume(pairs, Seq(capped, bandedCached))
  }

  /** (id, vec, sigs: Array[Long]) with one signature per table, computed
    * in ONE imperative mapPartitions pass. The declarative `lshSignature`
    * HOF form walks an interpreted expression tree per vector element per
    * plane — numTables × planes × dim lambda evaluations per row made it
    * the measured hot spot (same finding as the MinHash signature history
    * in BASELINE.md); the tight loop below does the identical dot products
    * at memory bandwidth. Plane vectors are seeded per (table, dim) — the
    * same gaussians on every partition and run.
    */
  private def tableSignatures(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      numTables: Int): DataFrame = {
    // null vectors are DROPPED, not signed: an all-zero signature would
    // park every null-vec row in bucket 0 of every table, where it
    // surfaces as a null-similarity candidate and can crowd a query's
    // top-k count past the brute-force completeness fallback's trigger
    // (the declarative lshSignature form got this for free — a null
    // signature fell out of the inner bucket join)
    val projected = graft.core.Parallelism.floor(
      df.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull))
    val out = StructType(Seq(
      StructField("graft_id", projected.schema.head.dataType, nullable = true),
      StructField("graft_vec", projected.schema(1).dataType, nullable = true),
      StructField("graft_sigs", ArrayType(LongType, containsNull = false), nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(out)
    // resolved at plan time: float and double element types both supported
    // (the old expression form cast per element; here the unbox is picked
    // once instead of pattern-matching every value)
    val elementIsFloat = projected.schema(1).dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"$vecCol must be array<float> or array<double>, got $other")
    }
    projected.mapPartitions { rows =>
      val planeCache = scala.collection.mutable.Map.empty[(Int, Int), Array[Double]]
      def planesFor(t: Int, dim: Int): Array[Double] =
        planeCache.getOrElseUpdate((t, dim), {
          val rng = new scala.util.Random(0x9E3779B97F4A7C15L * (t + 1))
          Array.fill(planes * dim)(rng.nextGaussian())
        })
      rows.map { r =>
        val sigs = new Array[Long](numTables)
        if (!r.isNullAt(1)) {
          val vec: Array[Double] =
            if (elementIsFloat) {
              val s = r.getSeq[Float](1)
              val a = new Array[Double](s.length)
              var i = 0
              while (i < a.length) { a(i) = s(i).toDouble; i += 1 }
              a
            } else {
              val s = r.getSeq[Double](1)
              val a = new Array[Double](s.length)
              var i = 0
              while (i < a.length) { a(i) = s(i); i += 1 }
              a
            }
          val dim = vec.length
          var t = 0
          while (t < numTables) {
            val pl = planesFor(t, dim)
            var sig = 0L
            var p = 0
            while (p < planes) {
              var d = 0.0
              var i = 0
              val off = p * dim
              while (i < dim) { d += vec(i) * pl(off + i); i += 1 }
              if (d > 0.0) sig |= (1L << p)
              p += 1
            }
            sigs(t) = sig
            t += 1
          }
        }
        Row(r.get(0), r.get(1), sigs.toSeq)
      }
    }(enc)
  }

  /** LSH-bucketed top-k: the corpus is bucketed by `numTables` INDEPENDENT
    * random-hyperplane signatures (computed in one map-side pass, exploded
    * to (table, bucket) keys); each query probes, per table, its own
    * bucket plus all buckets at Hamming distance 1. OR-amplification
    * across tables is what makes top-k recall hold — a single table's
    * multi-probe recall for a cosine-0.75 neighbor is ~0.25 at 12 planes,
    * while 12 tables lift it past 0.9 (P = 1 − (1 − p_table)^T). The
    * probe set (queries × tables × (planes+1)) is broadcast, so the
    * corpus NEVER shuffles — only candidate matches flow on, deduped per
    * (query, neighbor) before the exact cosine and per-query top-k
    * window. Queries whose probed buckets hold fewer than `k` candidates
    * fall back to a brute-force pass (anti-join on the complete ids,
    * union), so every query gets exactly `min(k, corpus size)` results.
    * The fallback scans the corpus a second time but only broadcasts the
    * deficient queries — on well-distributed data that set is empty and
    * the join side is empty. Returns (query_id, neighbor_id, similarity,
    * rank) like bruteForceTopK.
    */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      planes: Int = 12,
      numTables: Int = 12): DataFrame = {
    val c = tableSignatures(corpus, corpusId, corpusVec, planes, numTables)
      .select(col("graft_id").as("neighbor_id"), col("graft_vec").as("graft_cv"),
        posexplode(col("graft_sigs")).as(Seq("graft_t", "graft_bucket")))
    // multi-probe per table: the query's bucket plus all single-bit flips
    val q = tableSignatures(queries, queryId, queryVec, planes, numTables)
      .select(col("graft_id").as("query_id"), col("graft_vec").as("graft_qv"),
        posexplode(col("graft_sigs")).as(Seq("graft_t", "graft_qsig")))
      .withColumn("graft_bucket",
        explode(array(
          col("graft_qsig") +:
            (0 until planes).map(b => col("graft_qsig").bitwiseXOR(lit(1L << b))): _*)))
      .drop("graft_qsig")
    val scored = c.join(broadcast(q), Seq("graft_t", "graft_bucket"))
      // a pair can collide in many (table, probe) combinations — dedup
      // BEFORE the exact cosine so each candidate is scored once
      .select("query_id", "neighbor_id", "graft_cv", "graft_qv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("similarity", cosine(col("graft_cv"), col("graft_qv")))
    // persisted: the final plan references this subtree three times (the
    // semi-join left side and fullIds twice) — without the cache the LSH
    // bucket join + heap top-k would recompute per reference
    val lsh = topKPerQuery(scored, "query_id", "neighbor_id", "similarity", k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // completeness fallback: brute-force the queries that came back short
    // (with AQE's empty-relation propagation, an empty deficient set
    // collapses the fallback join instead of re-scanning the corpus)
    val fullIds = lsh.groupBy("query_id")
      .agg(count(lit(1)).as("graft_n"))
      .filter(col("graft_n") >= k)
      .select("query_id")
    val deficient = queries
      .select(col(queryId).as("query_id"), col(queryVec).as(queryVec))
      .join(fullIds, Seq("query_id"), "left_anti")
    val fallback = bruteForceTopK(corpus, corpusId, corpusVec,
      deficient, "query_id", queryVec, k)
    val result = lsh.join(fullIds, Seq("query_id"), "left_semi")
      .unionByName(fallback)
    CacheLifecycle.releaseOnConsume(result, Seq(lsh))
  }

  // -------------------------------------------------------------------------
  // IVF (inverted-file) index — the classic ANN scale path
  // -------------------------------------------------------------------------

  /** Trains `nlist` coarse centroids with Lloyd iterations on a bounded
    * driver-side sample of unit-normalized vectors, drawn in ONE corpus
    * pass via per-partition reservoirs with count-proportional driver
    * allocation — covering the WHOLE corpus (sample-then-limit approaches
    * pull from the first partitions only, which on sorted/clustered data
    * biases every centroid toward one region). Deterministic for fixed
    * data + partitioning + seed.
    */
  /** Bounded driver-side vector sample in ONE corpus pass: per-partition
    * reservoirs + exact per-partition counts; the driver allocates the
    * global sample across partitions proportionally to their counts
    * (largest remainder) and draws from each reservoir. Uniform within
    * partition, proportional across — the whole-corpus coverage index
    * training needs (a limit()-style sample would only ever see the first
    * partitions, starving trailing clusters on cluster-sorted data).
    * Replaces takeSample, whose count job + sampling job cost TWO full
    * corpus scans at 100 TB. Deterministic for fixed data + partitioning
    * + seed (per-partition rng seeded by id). A partition holding more
    * than ~oversample× its proportional share contributes at most its
    * reservoir — acceptable bias for training. Null and all-zero vectors
    * are skipped.
    */
  private[pipeline] def sampleVectors(
      corpus: DataFrame,
      vecCol: String,
      sampleSize: Int,
      seed: Long): Seq[Array[Double]] = {
    val rdd = corpus.select(col(vecCol)).rdd
    val numParts = math.max(rdd.getNumPartitions, 1)
    val perPart = math.max(1, (3L * sampleSize / numParts).toInt + 1)
    val parts: Array[(Long, Array[Array[Float]])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rng = new scala.util.Random(seed ^ (pid.toLong * 0x9E3779B97F4A7C15L))
        val res = new scala.collection.mutable.ArrayBuffer[Array[Float]](perPart)
        var n = 0L
        it.foreach { r =>
          if (!r.isNullAt(0)) {
            val v = r.getSeq[Float](0).toArray
            if (v.exists(_ != 0.0f)) {
              n += 1
              if (res.length < perPart) res += v
              else { // Algorithm R: keep each seen row with prob perPart/n
                val j = (rng.nextDouble() * n).toLong
                if (j < perPart) res(j.toInt) = v
              }
            }
          }
        }
        if (n == 0) Iterator.empty else Iterator((n, res.toArray))
      }
      .collect()
    require(parts.nonEmpty, "index training sample is empty")
    val total = parts.map(_._1).sum
    val quotas = parts.map(_._1.toDouble * sampleSize / total)
    val alloc = quotas.map(math.floor(_).toInt)
    var rem = sampleSize - alloc.sum
    quotas.zipWithIndex
      .sortBy { case (q, _) => -(q - math.floor(q)) }
      .foreach { case (_, i) => if (rem > 0) { alloc(i) += 1; rem -= 1 } }
    val rngDriver = new scala.util.Random(seed)
    val sample = parts.zip(alloc).flatMap { case ((_, res), a) =>
      rngDriver.shuffle(res.toSeq).take(math.min(a, res.length))
    }.map(_.map(_.toDouble))
    require(sample.nonEmpty, "index training sample is empty")
    sample.toSeq
  }

  private[pipeline] def trainCentroids(
      corpus: DataFrame,
      vecCol: String,
      nlist: Int,
      sampleSize: Int,
      iterations: Int,
      seed: Long = 42L): Seq[Array[Double]] = {
    val sample = sampleVectors(corpus, vecCol, sampleSize, seed)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val points = sample.map(normalize)
    val kk = math.min(nlist, points.length)
    // deterministic init: evenly spaced sample points
    var centroids = (0 until kk).map(i => points(i * points.length / kk)).toArray

    (0 until iterations).foreach { _ =>
      val sums = Array.fill(kk)(new Array[Double](points.head.length))
      val counts = new Array[Int](kk)
      points.foreach { p =>
        var best = 0; var bestDot = Double.MinValue
        var i = 0
        while (i < kk) {
          var d = 0.0; var j = 0
          while (j < p.length) { d += p(j) * centroids(i)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = i }
          i += 1
        }
        var j = 0
        while (j < p.length) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { i =>
        if (counts(i) == 0) centroids(i) else normalize(sums(i))
      }.toArray
    }
    centroids.toSeq
  }

  /** Dot products of a vector column against every centroid, as one
    * struct-array column (dot, cell). Pure map-side expressions — cell
    * assignment costs nlist*dim multiplies per row and NO shuffle.
    */
  private def centroidDots(vec: Column, centroids: Seq[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      val dot = aggregate(
        zip_with(vec, typedLit(c.toSeq), (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, v) => acc + v)
      struct(dot.as("d"), lit(i).as("cell"))
    }: _*)

  /** IVF top-k: corpus rows are assigned to their nearest coarse centroid
    * (argmax dot — scale-invariant, so no per-row normalization), queries
    * probe their `nprobe` nearest cells. Join is an equi-join on cell id;
    * per-cell candidate sets keep the exact-cosine work at ~nprobe/nlist
    * of brute force. Returns (query_id, neighbor_id, similarity, rank).
    */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      sampleSize: Int = 2048,
      iterations: Int = 5): DataFrame = {
    val centroids = trainCentroids(corpus, corpusVec, nlist, sampleSize, iterations)
    ivfTopKFromState(ivfIndexState(corpus, corpusId, corpusVec, centroids),
      centroids, queries, queryId, queryVec, k, nprobe)
  }

  // -------------------------------------------------------------------------
  // Incremental IVF index state — the maintained-index production shape
  // -------------------------------------------------------------------------
  //
  // A 100-TB ANN index is not rebuilt per ingest: the coarse quantizer is
  // trained ONCE (on a representative sample) and FROZEN, and each new
  // batch is assigned to its nearest frozen centroid and APPENDED to the
  // postings — a pure map-side job plus a write; the postings table is a
  // commutative monoid under bag union, so staged batches fold in any
  // order to byte-identical postings of a one-shot build with the same
  // quantizer. Queries never touch raw corpus rows outside the probed
  // cells. (Re-training the quantizer = building a NEW index; the frozen
  // contract is what makes the increment exact.)

  /** Trains the frozen coarse quantizer — [[trainCentroids]] made public
    * for index-state callers. Deterministic for fixed data +
    * partitioning + seed.
    */
  def trainIvfCentroids(
      corpus: DataFrame,
      vecCol: String,
      nlist: Int,
      sampleSize: Int = 2048,
      iterations: Int = 5,
      seed: Long = 42L): Seq[Array[Double]] =
    trainCentroids(corpus, vecCol, nlist, sampleSize, iterations, seed)

  /** (cell int, w array&lt;double&gt;) — the frozen quantizer as a frame, for
    * parquet staging next to the postings.
    */
  def ivfModelFrame(spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[Array[Double]]): DataFrame = {
    val rows = centroids.zipWithIndex.map { case (w, i) =>
      org.apache.spark.sql.Row(i, w.toSeq) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.ArrayType(DoubleType)))))
  }

  def readIvfModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Array[Double]] =
    spark.read.parquet(path).orderBy(col("cell"))
      .collect().map(_.getSeq[Double](1).toArray).toSeq

  /** One batch's postings under the FROZEN quantizer:
    * (graft_cell, neighbor_id, graft_cv) — assignment is argmax dot, a
    * map-side expression, no shuffle. Append batches in any order; the
    * union IS the index.
    */
  def ivfIndexState(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "ivfIndexState needs a trained quantizer")
    batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("graft_cv"))
      .withColumn("graft_cell",
        array_max(centroidDots(col("graft_cv"), centroids)).getField("cell"))
  }

  /** IVF top-k served FROM a staged postings state (the query half of
    * [[ivfTopK]] — same probe/join/re-rank plan, no corpus assignment
    * pass, no quantizer retraining).
    */
  def ivfTopKFromState(
      state: DataFrame,
      centroids: Seq[Array[Double]],
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val probes = math.min(nprobe, centroids.length)
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("graft_qv"))
      .withColumn("graft_probes",
        slice(reverse(array_sort(centroidDots(col("graft_qv"), centroids))), 1, probes))
      .withColumn("graft_cell", explode(transform(col("graft_probes"), p => p.getField("cell"))))
      .drop("graft_probes")
    val scored = state.join(broadcast(q), Seq("graft_cell"))
      .withColumn("similarity", cosine(col("graft_cv"), col("graft_qv")))
    topKPerQuery(scored, "query_id", "neighbor_id", "similarity", k)
  }

  // -------------------------------------------------------------------------
  // Product quantization (PQ) ANN — the compressed-domain scale path
  // -------------------------------------------------------------------------
  // Jégou, Douze & Schmid 2011 ("Product quantization for nearest neighbor
  // search"): split the unit-normalized vector into `m` subspaces, k-means
  // a `ksub`-entry codebook per subspace, store each corpus vector as m
  // small codes. A query builds a per-subspace lookup table of
  // query-subvector · sub-centroid dots once, and the approximate dot of
  // query × corpus vector is m TABLE LOOKUPS over the code row — the
  // asymmetric-distance (ADC) scan. Memory per corpus vector drops from
  // 4·d bytes to m codes, which is what lets a 100-TB embedding corpus
  // fit a scan-speed index; recall is recovered by exact re-ranking of
  // the PQ top candidates against the full vectors.

  /** Per-subspace codebooks: `codebooks(j)(c)` is sub-centroid c of
    * subspace j (each of length `dsub`). Trained on unit-normalized
    * vectors, so code dots compose into approximate cosines.
    */
  final case class PqModel(m: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.length == m)

    /** PQ codes of one already-normalized vector: argmin L2 per subspace. */
    def encode(v: Array[Double]): Array[Int] = {
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = v(j * dsub + t) - cb(c)(t)
            d += diff * diff
            t += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best
        j += 1
      }
      out
    }

    /** The query's ADC lookup table: `lut(j)(c)` = dot of the query's
      * j-th subvector with sub-centroid c. Approximate cosine of the
      * query with a corpus vector of codes k₁..k_m is Σ_j lut(j)(k_j).
      */
    def lookupTable(q: Array[Double]): Array[Array[Double]] = {
      val lut = Array.ofDim[Array[Double]](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        val row = new Array[Double](cb.length)
        var c = 0
        while (c < cb.length) {
          var d = 0.0
          var t = 0
          while (t < dsub) { d += q(j * dsub + t) * cb(c)(t); t += 1 }
          row(c) = d
          c += 1
        }
        lut(j) = row
        j += 1
      }
      lut
    }
  }

  /** Train PQ codebooks: ONE reservoir-sample corpus pass (the
    * [[sampleVectors]] machinery [[trainCentroids]] shares), then m
    * independent driver-side L2 Lloyd loops over the sample's subvectors
    * — deterministic for fixed data + partitioning + seed. The vector
    * dimension must divide by `m`.
    */
  def trainPq(
      corpus: DataFrame,
      vecCol: String,
      m: Int = 8,
      ksub: Int = 16,
      sampleSize: Int = 2048,
      iterations: Int = 8,
      seed: Long = 42L): PqModel = {
    val sample = sampleVectors(corpus, vecCol, sampleSize, seed)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    trainPqOnPoints(sample, m, ksub, iterations)
  }

  /** PQ top-k with exact re-ranking: every corpus vector is encoded to m
    * codes (one pass, tight per-row loop — the inherently imperative
    * signature-scan shape), every query carries its ADC lookup table; the
    * ADC scan scores the SLIM code table against the broadcast query LUTs
    * map-side (no shuffle until the top-candidate window), takes the top
    * `rerank` candidates per query by approximate score, joins ONLY those
    * back to the full vectors, and exact-cosine re-ranks to the top k.
    * Returns (query_id, neighbor_id, similarity, rank) with EXACT cosine
    * similarities — PQ error can only cost recall (a true neighbor
    * missing from the rerank pool), never report a wrong similarity.
    */
  def pqTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 0,
      sampleSize: Int = 2048,
      iterations: Int = 8): DataFrame = {
    // the slim code table is the only corpus-sized frame the ADC scan
    // touches; the top-`pool` selection inside pqTopKFromCodes is the
    // bounded-heap aggregate, NOT a per-query window — a window would
    // funnel the WHOLE scored corpus through one task per query (the one
    // 100-TB scale-killer the r12 verdict flagged)
    val model = trainPq(corpus, corpusVec, m, ksub, sampleSize, iterations)
    pqTopKFromCodes(pqCodesState(corpus, corpusId, corpusVec, model), model,
      corpus, corpusId, corpusVec, queries, queryId, queryVec, k, rerank)
  }

  // -------------------------------------------------------------------------
  // Incremental PQ index state — the compressed sibling of the IVF state
  // -------------------------------------------------------------------------
  //
  // Same frozen-model contract as [[ivfIndexState]]: codebooks are
  // trained once and staged as parquet; each batch's m-byte code rows
  // are a pure map-side encode appended under them (bag-union monoid).
  // The ADC scan then serves from the slim staged code table; only the
  // re-rank pool ever rejoins the full vectors in the lake.

  /** (j, c, w) — the frozen codebooks as a frame for parquet staging;
    * m/dsub reconstruct from the rows.
    */
  def pqModelFrame(spark: org.apache.spark.sql.SparkSession,
      model: PqModel): DataFrame = {
    val rows = for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield org.apache.spark.sql.Row(j, c, model.codebooks(j)(c).toSeq)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("j",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.ArrayType(DoubleType)))))
  }

  def readPqModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PqModel = {
    val rows = spark.read.parquet(path).orderBy(col("j"), col("c")).collect()
    require(rows.nonEmpty, s"empty PQ model at $path")
    val m = rows.map(_.getInt(0)).max + 1
    val codebooks = Array.tabulate(m) { j =>
      rows.filter(_.getInt(0) == j).map(_.getSeq[Double](2).toArray)
    }
    PqModel(m, codebooks.head.head.length, codebooks)
  }

  /** One batch's code rows under the FROZEN codebooks:
    * (neighbor_id, graft_codes) — encode is per-row imperative work over
    * the broadcast model, no shuffle. Null vectors are skipped. Append
    * batches in any order; the union IS the index.
    */
  def pqCodesState(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel): DataFrame = {
    val bModel = batch.sparkSession.sparkContext.broadcast(model)
    val toUnit = (v: Seq[Float]) => {
      val a = v.map(_.toDouble).toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }
    val encodeUdf = udf((v: Seq[Float]) =>
      if (v == null) null else bModel.value.encode(toUnit(v)))
    batch.select(col(idCol).as("neighbor_id"),
        encodeUdf(col(vecCol)).as("graft_codes"))
      .where(col("graft_codes").isNotNull)
  }

  /** PQ top-k served FROM a staged code table (the scan half of
    * [[pqTopK]]): ADC scores the slim codes against broadcast query
    * LUTs, the bounded heap takes the rerank pool, and ONLY the pool
    * rejoins the full vectors in `corpus` for exact-cosine re-ranking —
    * PQ error can cost recall, never score accuracy.
    */
  def pqTopKFromCodes(
      codes: DataFrame,
      model: PqModel,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      rerank: Int = 0): DataFrame = {
    val pool = if (rerank > 0) math.max(rerank, k) else math.max(4 * k, k)
    val bModel = codes.sparkSession.sparkContext.broadcast(model)
    val toUnit = (v: Seq[Float]) => {
      val a = v.map(_.toDouble).toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }
    val lutUdf = udf((v: Seq[Float]) =>
      if (v == null) null else bModel.value.lookupTable(toUnit(v)))
    val luts = queries
      .select(col(queryId).as("query_id"), lutUdf(col(queryVec)).as("graft_lut"))
      .where(col("graft_lut").isNotNull)
    val approx = aggregate(
      zip_with(col("graft_codes"), col("graft_lut"),
        (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val candidates = topKPerQuery(
        codes.crossJoin(broadcast(luts)).withColumn("graft_approx", approx),
        "query_id", "neighbor_id", "graft_approx", pool)
      .select("query_id", "neighbor_id")
    exactRerank(candidates, corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k)
  }

  /** The exact-cosine re-rank tail shared by [[pqTopK]] and
    * [[ivfPqTopK]]: only the (query_id, neighbor_id) candidate pool
    * rejoins the full vectors — broadcast candidate side, id-keyed join
    * into the vector store, one window per query.
    */
  private def exactRerank(
      candidates: DataFrame,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    val cv = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("graft_cv"))
    val qv = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("graft_qv"))
    val scored = broadcast(candidates)
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("similarity", cosine(col("graft_cv"), col("graft_qv")))
    topKPerQuery(scored, "query_id", "neighbor_id", "similarity", k)
  }

  /** IVF-PQ top-k — the two scale levers composed, the way a 100-TB ANN
    * index is actually built (Jégou et al. 2011 §IV): coarse IVF
    * centroids PRUNE (a query touches ~nprobe/nlist of the corpus) and
    * PQ codes over the per-vector RESIDUAL (unit vector − its cell
    * centroid) COMPRESS what remains, so the probe scans m-byte code
    * rows of a few cells instead of raw vectors of the whole corpus.
    * Approximate dot decomposes as q·c_cell + Σ_j LUT_q[j][code_j] —
    * the LUT is per-QUERY only (the codebooks are shared across cells),
    * so probing costs one broadcast join on cell id plus m lookups per
    * candidate row. Exact re-rank of the top-`rerank` pool follows, as
    * in [[pqTopK]]: IVF/PQ error can cost recall, never score accuracy.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 0,
      sampleSize: Int = 2048,
      iterations: Int = 8): DataFrame = {
    val (coarse, pq) = trainIvfPq(corpus, corpusVec, nlist, m, ksub,
      sampleSize, iterations)
    ivfPqTopKFromCodes(
      ivfPqCodesState(corpus, corpusId, corpusVec, coarse, pq), coarse, pq,
      corpus, corpusId, corpusVec, queries, queryId, queryVec, k, nprobe,
      rerank)
  }

  /** Trains the composed IVF-PQ model: coarse centroids plus PQ
    * codebooks over the sample's RESIDUALS under the coarse assignment —
    * the same one corpus pass supplies both training sets. Deterministic
    * for fixed data + partitioning + seed.
    */
  def trainIvfPq(
      corpus: DataFrame,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      sampleSize: Int = 2048,
      iterations: Int = 8): (Seq[Array[Double]], PqModel) = {
    val coarse = trainCentroids(corpus, vecCol, nlist, sampleSize, iterations)
      .toArray
    val sample = sampleVectors(corpus, vecCol, sampleSize, seed = 42L)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    val dim = sample.head.length
    require(dim % m == 0, s"vector dim $dim must divide by m=$m")
    def nearestCell(u: Array[Double]): Int = {
      var best = 0
      var bestDot = Double.MinValue
      var i = 0
      while (i < coarse.length) {
        var d = 0.0
        var j = 0
        while (j < dim) { d += u(j) * coarse(i)(j); j += 1 }
        if (d > bestDot) { bestDot = d; best = i }
        i += 1
      }
      best
    }
    def residual(u: Array[Double]): Array[Double] = {
      val c = coarse(nearestCell(u))
      val r = new Array[Double](dim)
      var j = 0
      while (j < dim) { r(j) = u(j) - c(j); j += 1 }
      r
    }
    (coarse.toSeq, trainPqOnPoints(sample.map(residual), m, ksub))
  }

  /** One batch's IVF-PQ postings under the FROZEN model:
    * (neighbor_id, graft_cell, graft_codes) — cell assignment plus
    * residual PQ encode in one per-row pass over the broadcast model, no
    * shuffle. Append batches in any order; the union IS the index.
    */
  def ivfPqCodesState(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Seq[Array[Double]],
      pq: PqModel): DataFrame = {
    val spark = batch.sparkSession
    val bCoarse = spark.sparkContext.broadcast(coarse.toArray)
    val bPq = spark.sparkContext.broadcast(pq)
    val toUnit = (v: Seq[Float]) => {
      val a = v.map(_.toDouble).toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }
    val encodeUdf = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val u = toUnit(v)
        val cs = bCoarse.value
        var best = 0
        var bestDot = Double.MinValue
        var i = 0
        while (i < cs.length) {
          var d = 0.0
          var j = 0
          while (j < u.length) { d += u(j) * cs(i)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = i }
          i += 1
        }
        val r = new Array[Double](u.length)
        var j = 0
        while (j < u.length) { r(j) = u(j) - cs(best)(j); j += 1 }
        (best, bPq.value.encode(r))
      }
    }
    batch
      .select(col(idCol).as("neighbor_id"), encodeUdf(col(vecCol)).as("graft_e"))
      .where(col("graft_e").isNotNull)
      .select(col("neighbor_id"), col("graft_e._1").as("graft_cell"),
        col("graft_e._2").as("graft_codes"))
  }

  /** IVF-PQ top-k served FROM a staged postings state (the query half of
    * [[ivfPqTopK]]): approximate dot decomposes as q·c_cell +
    * Σ_j LUT_q[j][code_j]; the bounded heap takes the rerank pool and
    * ONLY the pool rejoins the full vectors in `corpus`.
    */
  def ivfPqTopKFromCodes(
      codes: DataFrame,
      coarse: Seq[Array[Double]],
      pq: PqModel,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      nprobe: Int = 4,
      rerank: Int = 0): DataFrame = {
    val pool = if (rerank > 0) math.max(rerank, k) else math.max(4 * k, k)
    val spark = codes.sparkSession
    val bCoarse = spark.sparkContext.broadcast(coarse.toArray)
    val bPq = spark.sparkContext.broadcast(pq)
    val toUnit = (v: Seq[Float]) => {
      val a = v.map(_.toDouble).toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }
    // query side: nprobe nearest cells (with q·c per cell) + the ADC LUT
    val probes = math.min(nprobe, coarse.length)
    val queryUdf = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val u = toUnit(v)
        val cs = bCoarse.value
        val dots = cs.indices.map { i =>
          var d = 0.0
          var j = 0
          while (j < u.length) { d += u(j) * cs(i)(j); j += 1 }
          (d, i)
        }
        (dots.sortBy(t => (-t._1, t._2)).take(probes).toArray,
          bPq.value.lookupTable(u))
      }
    }
    val luts = queries
      .select(col(queryId).as("query_id"), queryUdf(col(queryVec)).as("graft_q"))
      .where(col("graft_q").isNotNull)
      .select(col("query_id"),
        explode(col("graft_q._1")).as("graft_p"),
        col("graft_q._2").as("graft_lut"))
      .select(col("query_id"), col("graft_p._2").as("graft_cell"),
        col("graft_p._1").as("graft_qc"), col("graft_lut"))
    val approx = col("graft_qc") + aggregate(
      zip_with(col("graft_codes"), col("graft_lut"),
        (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    // bounded-heap top-`pool`, not a per-query window — even cell-pruned,
    // a probe set is a corpus FRACTION (nprobe/nlist), and a window would
    // sort it in one task per query (see pqTopK)
    val candidates = topKPerQuery(
        codes.join(broadcast(luts), Seq("graft_cell"))
          .withColumn("graft_approx", approx),
        "query_id", "neighbor_id", "graft_approx", pool)
      .select("query_id", "neighbor_id")
    exactRerank(candidates, corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k)
  }

  /** Driver-side PQ training over already-prepared points (residuals or
    * unit vectors) — the loop [[trainPq]] runs after sampling.
    */
  private def trainPqOnPoints(
      points0: Seq[Array[Double]],
      m: Int,
      ksub: Int,
      iterations: Int = 8): PqModel = {
    val dim = points0.head.length
    require(dim % m == 0, s"vector dim $dim must divide by m=$m")
    val dsub = dim / m
    val codebooks = (0 until m).map { j =>
      val points = points0.map(v => v.slice(j * dsub, (j + 1) * dsub)).toArray
      val kk = math.min(ksub, points.length)
      var cents = (0 until kk).map(i => points(i * points.length / kk)).toArray
      (0 until iterations).foreach { _ =>
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val counts = new Array[Int](kk)
        points.foreach { p =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < kk) {
            var d = 0.0
            var t = 0
            while (t < dsub) {
              val diff = p(t) - cents(c)(t)
              d += diff * diff
              t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var t = 0
          while (t < dsub) { sums(best)(t) += p(t); t += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }.toArray
    PqModel(m, dsub, codebooks)
  }

  // -- Semantic deduplication (SemDeDup) ------------------------------------
  // SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  // web-scale through semantic deduplication", arXiv:2303.09540) clusters
  // embeddings with k-means and removes, within each cluster, all but one
  // member of every cosine-near-duplicate neighborhood — pairwise cosine is
  // only ever computed WITHIN a cluster, so the quadratic term is bounded
  // by cluster size, not corpus size.

  /** Semantic dedup against a FIXED centroid set: one output row per
    * non-null input vector — (`idCol`, `cell`, `kept`).
    *
    * Cluster assignment is argmax cosine against the (internally
    * L2-normalized) centroids; exact cosine ties resolve to the HIGHER
    * cell index (array_max over (dot, cell) structs — callers replaying
    * the assignment must order by (cos DESC, cell DESC)). A vector is
    * dropped (`kept` = false) when some SAME-CLUSTER vector with a smaller
    * id has cosine >= `tau` to it — keeping the earliest member of every
    * near-duplicate neighborhood, deterministically. The paper's keep-one
    * policy (random / farthest-from-centroid) is a per-cluster choice;
    * lowest-id makes the output a pure function of the data.
    *
    * 100 TB plan shape: centroids ride into the executors as literals
    * (k-means k is thousands at web scale — kilobytes to low megabytes of
    * plan), cell assignment is map-side arithmetic in the scan pass, the
    * slim (id, cell, vec) frame is persisted and self-joined on ONE cell
    * equi-join, and clusters beyond `maxClusterSize` members are excluded
    * from comparison (excluded members stay KEPT — dedup may only ever
    * under-delete) with the excluded count surfaced on the
    * [[LshCapObservation]] channel, the same cap-visibility contract as
    * every LSH path here.
    */
  def semDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Array[Double]],
      tau: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    require(centroids.nonEmpty, "semDedup needs at least one centroid")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val unit = centroids.map(normalize)
    // argmax_c cosine(v, c) = argmax_c dot(v, c/||c||): ||v|| is constant
    // per row, so the row norm never needs computing for assignment
    val assigned = corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).as("graft_id"), col(vecCol).as("graft_vec"))
      .withColumn("cell",
        array_max(centroidDots(col("graft_vec"), unit)).getField("cell"))
    // uniform deterministic exclusion under the cap (hash order, not id
    // order — a capped mega-cluster must not systematically exempt the
    // highest ids from dedup). De-windowed (Capping.capBuckets): a
    // mega-cluster is never sorted in one task. assigned persists
    // because the threshold aggregation, the filter join, AND the final
    // kept/dropped census all read it; survivors persist because both
    // pair-join sides probe them.
    val assignedCached = assigned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val survivors = Capping.capBuckets(assignedCached,
        Seq("cell"), "graft_id", maxClusterSize,
        LshCapObservation.nextName())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = survivors
      .select(col("cell"), col("graft_id").as("id_a"), col("graft_vec").as("vec_a"))
    val b = survivors
      .select(col("cell"), col("graft_id").as("id_b"), col("graft_vec").as("vec_b"))
    val dropped = cosineVerify(
      a.join(b, Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b"),
      tau)
      .select(col("id_b").as("graft_id"))
      .distinct()
    val out = assignedCached
      .join(dropped.withColumn("graft_dropped", lit(true)), Seq("graft_id"), "left")
      .select(col("graft_id").as(idCol), col("cell"),
        coalesce(!col("graft_dropped"), lit(true)).as("kept"))
    CacheLifecycle.releaseOnConsume(out, Seq(assignedCached, survivors))
  }

  /** SemDeDup with corpus-trained k-means centroids (the paper's actual
    * recipe): trains `nlist` coarse centroids via [[trainCentroids]] (one
    * bounded-sample corpus pass) and delegates to [[semDedup]].
    */
  def semDedupAuto(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      nlist: Int = 64,
      maxClusterSize: Int = 10000,
      sampleSize: Int = 2048,
      iterations: Int = 5): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, nlist, sampleSize, iterations)
    semDedup(corpus, idCol, vecCol, centroids, tau, maxClusterSize)
  }

  /** Embedding-space decontamination: flag every corpus row whose vector
    * is cosine-`tau`-close to ANY probe (benchmark/eval-set) vector —
    * the semantic sibling of the 13-gram text decontamination
    * ([[TextAnalysis.decontaminate]]), catching paraphrased or
    * re-templated benchmark leakage that exact n-grams miss.
    *
    * Scale shape: an eval set is small and FIXED (hundreds to a few
    * thousand items), so the probe matrix rides into every task as
    * literals — the scan is pure map-side expression work (probes × dim
    * multiplies per corpus row, whole-stage codegen, NO shuffle, NO join)
    * and composes unmaterialized into a curation plan. For probe sets too
    * large to inline (> ~2k) use [[cosinePairsLsh]] with the probe side
    * as the smaller relation instead; this function require-guards at
    * `maxProbes`.
    *
    * Per row: `best_probe` (highest cosine, ties to the higher probe id —
    * max-struct semantics), `best_cos`, and `contaminated` = best_cos >=
    * tau. Zero/null corpus vectors score 0 against every probe (the
    * [[cosine]] guard) and are never flagged.
    */
  def decontaminateByEmbedding(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Seq[(Long, Array[Double])],
      tau: Double,
      maxProbes: Int = 2048): DataFrame = {
    require(probes.nonEmpty, "decontaminateByEmbedding needs at least one probe")
    require(probes.length <= maxProbes,
      s"${probes.length} probes exceed the literal-broadcast bound " +
        s"$maxProbes — use cosinePairsLsh for corpus-sized probe sets")
    val normsOk = probes.forall { case (_, v) => v.exists(_ != 0.0) }
    require(normsOk, "probe vectors must be non-zero")
    // probe-normalized dots (dot/|c|, the |c| a left-to-right element
    // loop produces) rank probes; the row norm divides ONCE per row at
    // the end — k dot products + 1 norm per row, not k norms
    val scored = array(probes.map { case (pid, c) =>
      val dot = aggregate(
        zip_with(col(vecCol), typedLit(c.toSeq),
          (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, v) => acc + v)
      val pNorm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      struct((dot / lit(pNorm)).as("s"), lit(pid).as("pid"))
    }: _*)
    val vNorm = sqrt(aggregate(
      zip_with(col(vecCol), col(vecCol),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))
    val best = array_max(scored)
    val valid = col(vecCol).isNotNull && vNorm > 0.0
    corpus
      .withColumn("best_probe", when(valid, best.getField("pid")))
      .withColumn("best_cos", when(valid, best.getField("s") / vNorm))
      .withColumn("contaminated",
        coalesce(col("best_cos") >= tau, lit(false)))
  }

  /** Bounded driver collect of a probe frame for
    * [[decontaminateByEmbedding]]: (id, vector) pairs, nulls dropped,
    * require-guarded at `maxProbes`.
    */
  def collectProbes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      maxProbes: Int = 2048): Seq[(Long, Array[Double])] = {
    val rows = df
      .where(col(vecCol).isNotNull)
      .select(col(idCol).cast(LongType), col(vecCol))
      .limit(maxProbes + 1)
      .collect()
    require(rows.length <= maxProbes,
      s"probe frame exceeds $maxProbes rows — use cosinePairsLsh instead")
    rows.map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
  }

  /** [[collectProbes]] output snapped to the 1/`scale` integer grid —
    * the [[Clustering.quantizeVec]] rule, floor(x·scale + 0.5) per
    * component, applied with the same IEEE double ops the engine-side
    * expression uses — the probe shape
    * [[decontaminateByEmbeddingGrid]] consumes.
    */
  def quantizeProbes(
      probes: Seq[(Long, Array[Double])],
      scale: Long = 1000L): Seq[(Long, Array[Long])] =
    probes.map { case (pid, v) =>
      pid -> v.map(x => math.floor(x * scale + 0.5).toLong)
    }

  /** Embedding-space decontamination with EXACT integer decisions — the
    * cross-engine-replayable variant of [[decontaminateByEmbedding]].
    * Vectors are snapped to the 1/`scale` integer grid
    * ([[Clustering.quantizeVec]]); from there every decision is 64-bit
    * integer math no engine version can evaluate differently:
    *
    *  - the threshold test is cross-multiplied squares — contaminated ⟺
    *    dq ≥ 0 ∧ tau2Den·dq² ≥ tau2Num·|vq|²·|pq|², where tau² =
    *    tau2Num/tau2Den exactly (0.35² = 49/400);
    *  - probe ranking uses the integer key
    *    skey = sign(dq) · floorDiv(dq²·keyScale, |pq|²) — a deterministic
    *    total preorder that orders probes by cos² at 1/keyScale
    *    resolution on cos²·|vq|²; key collisions (astronomically
    *    unlikely, and exactly reproducible when they happen) break to
    *    the HIGHER probe id, so both engines pick the same best probe
    *    bit-for-bit.
    *
    * Scale shape: identical to [[decontaminateByEmbedding]] — the probe
    * matrix rides into every task as literals, pure map-side codegen
    * expression work, no shuffle, no join. Envelope: |dq| must stay <
    * √(2⁵³/keyScale) = ~9.5e7/√keyScale (≈3.0e6 at the default
    * keyScale = 1000) so dq²·keyScale < 2⁵³ and the floor-div below is
    * an exact double quotient; unit-norm embeddings at scale 1000 sit at
    * |dq| ≲ 1.1e6, a ~3× margin. The envelope is ENFORCED at runtime,
    * not assumed: by Cauchy-Schwarz dq² ≤ |vq|²·|pq|², so each row
    * checks |vq|²·max|pq|²·keyScale < 2⁵³ once (one comparison against a
    * driver-computed bound) and `raise_error`s on violation — an
    * out-of-envelope input fails loudly instead of silently corrupting
    * the ranking key.
    *
    * Per row: `best_probe`, `best_key` (the integer ranking key — exact,
    * hash-pinnable), `n2v` (|vq|², exact), `contaminated`.
    */
  def decontaminateByEmbeddingGrid(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Seq[(Long, Array[Long])],
      tau2Num: Long = 49L,
      tau2Den: Long = 400L,
      scale: Long = 1000L,
      keyScale: Long = 1000L,
      maxProbes: Int = 2048): DataFrame = {
    require(probes.nonEmpty,
      "decontaminateByEmbeddingGrid needs at least one probe")
    require(probes.length <= maxProbes,
      s"${probes.length} probes exceed the literal-broadcast bound " +
        s"$maxProbes — use cosinePairsLsh for corpus-sized probe sets")
    val n2ps = probes.map { case (_, p) => p.foldLeft(0L)((a, x) => a + x * x) }
    require(n2ps.forall(_ > 0L), "probe vectors must be non-zero on the grid")
    // exactness envelope (see scaladoc): dq² ≤ |vq|²·|pq|² (Cauchy-
    // Schwarz), so |vq|² ≤ n2vBound guarantees dq²·keyScale < 2^53 for
    // every probe. Computed with BigInt so pathological probe norms
    // can't overflow the bound itself.
    val n2vBound: Long = {
      val b = (BigInt(1) << 53) / (BigInt(n2ps.max) * BigInt(keyScale))
      require(b > 0,
        s"probe grid norms (max |pq|^2 = ${n2ps.max}) x keyScale=$keyScale " +
          "leave no exactness envelope (dq^2*keyScale would exceed 2^53 " +
          "for any non-trivial corpus vector) — reduce scale or keyScale")
      b.min(BigInt(Long.MaxValue)).toLong
    }
    // Expression SHAPE matters as much as the math: the probe loop is an
    // array-lambda pipeline over ONE named quantized column, not k
    // per-probe expression trees — a literal-per-probe formulation
    // re-inlines the quantization fold into every use of every probe's
    // dot product (~6k copies of a 64-element fold at k ≈ 70), and the
    // resulting plan runs 30× slower (measured: 20.8 s vs 0.7 s at
    // sf0.1). Here each row computes the quantization once, one
    // transform produces all k dots, and one zip_with scores them.
    val probeVecs = typedLit(probes.map(_._2.toSeq))
    val probeMeta = typedLit(probes.map(_._1).zip(n2ps))
    val scoredCol = {
      val dqs = transform(probeVecs, p =>
        graft.expressions.GraftFunctions.dot_long(col("graft_vq"), p))
      zip_with(dqs, probeMeta, (dq, m) => {
        val pid = m.getField("_1")
        val n2p = m.getField("_2")
        // floorDiv for non-negative a, positive b: (a − a mod b) / b is
        // an exact integer multiple ≤ a < 2^53, so the double quotient
        // is the exact integer (IEEE division is correctly rounded)
        val mag = dq * dq * lit(keyScale)
        val fd = ((mag - pmod(mag, n2p)) / n2p).cast(LongType)
        struct(when(dq >= 0L, fd).otherwise(-fd).as("s"), pid.as("pid"),
          dq.as("dq"), n2p.as("n2p"))
      })
    }
    val n2vQ = graft.expressions.GraftFunctions
      .dot_long(col("graft_vq"), col("graft_vq"))
    // one comparison per row enforces the 2^53 exactness envelope; the
    // raise_error branch is dead code on any in-envelope corpus
    // (unit-norm grid vectors sit ~9x under the default bound). The
    // check REFERENCES the already-named n2v column instead of
    // re-inlining the norm fold into the condition — the inlined form
    // computed the 64-element dot twice per row (measured ~2.9x on the
    // q103 scan, the same expression-shape lesson as the probe loop).
    val n2vChecked = when(
      col(vecCol).isNull || col("n2v") <= lit(n2vBound), col("n2v"))
      .otherwise(raise_error(concat(
        lit("decontaminateByEmbeddingGrid: corpus vector outside the " +
          s"integer exactness envelope (|vq|^2 > $n2vBound; " +
          "dq^2*keyScale could exceed 2^53) at row id="),
        col(idCol).cast("string"))).cast(LongType))
    val withBest = corpus
      .withColumn("graft_vq", Clustering.quantizeVec(col(vecCol), scale))
      .withColumn("n2v", n2vQ)
      .withColumn("n2v", n2vChecked)
      .withColumn("graft_best", array_max(scoredCol))
    val best = col("graft_best")
    val valid = col(vecCol).isNotNull && col("n2v") > 0L
    withBest
      .withColumn("best_probe", when(valid, best.getField("pid")))
      .withColumn("best_key", when(valid, best.getField("s")))
      .withColumn("n2v", when(valid, col("n2v")))
      .withColumn("contaminated",
        coalesce(
          valid && best.getField("dq") >= 0L &&
            lit(tau2Den) * best.getField("dq") * best.getField("dq") >=
              lit(tau2Num) * col("n2v") * best.getField("n2p"),
          lit(false)))
      .drop("graft_vq", "graft_best")
  }

  /** Embedding-column health audit — the pre-flight every ANN/dedup/
    * clustering stage in this file assumes has already run: one pure
    * map-side pass over the vector column counting the defect classes
    * that silently poison similarity math (NULL vectors, wrong
    * dimension, NaN/Inf elements, all-zero vectors — an un-normalizable
    * cosine) plus the norm census (unit-normalized count in [0.99,
    * 1.01], rounded extreme norms, total squared mass). One codegen
    * aggregate; nothing shuffles but the single result row.
    */
  def embeddingHealth(
      df: DataFrame,
      vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol)
    val isNullV = v.isNull
    val wrongDim = !isNullV && size(v) =!= dim
    val shaped = !isNullV && size(v) === dim
    val nonFinite = shaped && exists(v,
      x => isnan(x.cast(DoubleType)) ||
        abs(x.cast(DoubleType)) > lit(Double.MaxValue))
    val clean = shaped && !nonFinite
    val norm2 = aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    val isZero = clean && norm2 === 0.0
    val norm = sqrt(norm2)
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(isNullV, 1L).otherwise(0L)).as("null_vecs"),
      sum(when(wrongDim, 1L).otherwise(0L)).as("wrong_dim_vecs"),
      sum(when(nonFinite, 1L).otherwise(0L)).as("nonfinite_vecs"),
      sum(when(isZero, 1L).otherwise(0L)).as("zero_vecs"),
      sum(when(clean, 1L).otherwise(0L)).as("clean_vecs"),
      sum(when(clean && norm >= 0.99 && norm <= 1.01, 1L).otherwise(0L))
        .as("unit_norm_vecs"),
      round(min(when(clean, norm)), 6).as("min_norm_r"),
      round(max(when(clean, norm)), 6).as("max_norm_r"),
      round(coalesce(sum(when(clean, norm2)), lit(0.0)), 3)
        .as("sum_norm2_r"))
  }
}
