package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core._
import graft.core.Analyzers._
import graft.core.Preconditions._

/** Analyzers that evaluate FROM persisted sketch states instead of the
  * corpus — the reference's state → metric → constraint convention
  * (analyzers/runners/AnalysisRunner.scala runOnAggregatedStates)
  * extended to the pipeline wing's parquet-staged sketch monoids
  * ([[graft.sketch.HllState]] q140, [[graft.sketch.Theta]] q142): a
  * Check runs against KB-per-group state tables with the 100-TB corpus
  * never rescanned. The input DataFrame IS the state table.
  */

/** Approximate distinct count folded from a persisted per-group HLL
  * state table ([[graft.sketch.HllState.distinctState]] parquet): the
  * binary sketches union into one corpus sketch via codegen'd
  * `hll_union_agg` — same DataSketches binary and metric contract as
  * [[ApproxCountDistinct]], no corpus scan. `allowDifferentLgK` folds
  * states written at mixed precisions instead of failing a pipeline.
  */
case class ApproxCountDistinctFromState(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[HllState]("ApproxCountDistinctFromState", column) {

  override def preconditions: Seq[StructType => Unit] = hasColumn(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    hll_union_agg(conditionalSelection(col(column), where), lit(true)) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[HllState] =
    if (result.isNullAt(offset)) None
    else Some(HllState(result.getAs[Array[Byte]](offset)))
}

/** Mergeable pair of theta sketches (snapshot A, snapshot B), folded per
  * side; the metric is the Jaccard overlap estimate |A∩B| / |A∪B| — the
  * cross-snapshot drift signal ("how much of yesterday's distinct set
  * does today's crawl share"). Exact below the sketches' exact-mode
  * bound (2^lgK distincts per side).
  */
case class ThetaOverlapState(aBytes: Array[Byte], bBytes: Array[Byte])
    extends DoubleValuedState[ThetaOverlapState] {

  private def union2(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(x)))
    u.union(Sketches.wrapSketch(Memory.wrap(y)))
    u.getResult.toByteArray
  }

  override def merge(other: ThetaOverlapState): ThetaOverlapState =
    ThetaOverlapState(union2(aBytes, other.aBytes), union2(bBytes, other.bBytes))

  override def metricValue(): Double = {
    val ska = Sketches.wrapSketch(Memory.wrap(aBytes))
    val skb = Sketches.wrapSketch(Memory.wrap(bBytes))
    val un = SetOperation.builder().buildUnion()
    un.union(ska); un.union(skb)
    val uEst = un.getResult.getEstimate
    if (uEst <= 0.0) 0.0
    else {
      val in = SetOperation.builder().buildIntersection()
      in.intersect(ska); in.intersect(skb)
      in.getResult.getEstimate / uEst
    }
  }

  override def equals(o: Any): Boolean = o match {
    case ThetaOverlapState(a, b) =>
      java.util.Arrays.equals(aBytes, a) && java.util.Arrays.equals(bBytes, b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(aBytes) + java.util.Arrays.hashCode(bBytes)
}

/** Approximate quantile folded from a persisted per-group KLL state
  * table ([[graft.sketch.KllGroupState.quantileState]] parquet): the
  * serialized sketches merge into one corpus sketch; the metric is that
  * sketch's `quantile(q)` — accurate to KLL's published rank-error
  * bound, no corpus scan.
  */
case class ApproxQuantileFromState(column: String, quantile: Double,
    where: Option[String] = None)
    extends DoubleResultScanAnalyzer[graft.sketch.KLLState](
      "ApproxQuantileFromState", s"$column:$quantile") {

  require(quantile >= 0.0 && quantile <= 1.0,
    s"quantile must be in [0, 1], got $quantile")

  override def preconditions: Seq[StructType => Unit] = hasColumn(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    graft.sketch.KllGroupState.mergeAggCol(
      conditionalSelection(col(column), where)) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[graft.sketch.KLLState] =
    graft.sketch.KLLAggregator.stateAt(result, offset)

  override protected def valueFromState(state: graft.sketch.KLLState): Double =
    state.sketch.quantile(quantile)
}

/** Folded Misra-Gries summary (counter map + total stream weight) —
  * driver-side merge is the pure pointwise counter sum (no pruning: the
  * map is already capacity-bounded per side and a sum-only merge only
  * refines the undercount bound).
  */
case class FreqItemsState(counters: Map[String, Long], n: Long)
    extends State[FreqItemsState] {
  override def merge(other: FreqItemsState): FreqItemsState = {
    val merged = (counters.keySet ++ other.counters.keySet).iterator.map { k =>
      k -> (counters.getOrElse(k, 0L) + other.counters.getOrElse(k, 0L))
    }.toMap
    FreqItemsState(merged, n + other.n)
  }
}

/** Relative frequency of one item folded from a persisted per-group
  * Misra-Gries state table ([[graft.sketch.FreqItems.freqState]]
  * parquet): the counter maps fold into one corpus summary; the metric
  * is est(item) / n, which NEVER overcounts and undercounts by at most
  * 1 / (capacity + 1) of the corpus — no corpus scan, no candidate set.
  * "is this token/domain still under x% of the corpus" from KB of state.
  */
case class ApproxItemFrequencyFromState(stateColumn: String, item: String,
    where: Option[String] = None)
    extends DoubleResultScanAnalyzer[FreqItemsState](
      "ApproxItemFrequencyFromState", s"$stateColumn:$item") {

  override def preconditions: Seq[StructType => Unit] = hasColumn(stateColumn) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    graft.sketch.FreqItems.mergeAggCol(
      conditionalSelection(col(stateColumn), where)) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[FreqItemsState] =
    if (result.isNullAt(offset)) None
    else {
      val r = result.getStruct(offset)
      val st = FreqItemsState(
        r.getAs[Map[String, Long]]("counters"), r.getAs[Long]("n"))
      if (st.n <= 0L) None else Some(st) // empty fold = empty state
    }

  override protected def valueFromState(state: FreqItemsState): Double =
    state.counters.getOrElse(item, 0L).toDouble / state.n
}

/** Two folded Misra-Gries summaries (snapshot A, snapshot B); the
  * metric is the visible-mass L1 distance between their item
  * distributions — Σ over the union of kept items of |p̂_a − p̂_b| —
  * EXACT when both sides ran in exact mode (capacity >= vocabulary),
  * within each side's (n−S)/((k+1)·n) slack otherwise.
  */
case class FreqDriftState(a: FreqItemsState, b: FreqItemsState)
    extends DoubleValuedState[FreqDriftState] {
  override def merge(other: FreqDriftState): FreqDriftState =
    FreqDriftState(a.merge(other.a), b.merge(other.b))
  override def metricValue(): Double = {
    if (a.n <= 0L && b.n <= 0L) return 0.0
    (a.counters.keySet ++ b.counters.keySet).iterator.map { k =>
      val pa = if (a.n > 0L) a.counters.getOrElse(k, 0L).toDouble / a.n else 0.0
      val pb = if (b.n > 0L) b.counters.getOrElse(k, 0L).toDouble / b.n else 0.0
      math.abs(pa - pb)
    }.sum
  }
}

/** Item-distribution drift between two Misra-Gries state columns on ONE
  * frame (two snapshots' per-group states joined on their group keys —
  * full-outer is fine: a side's null rows skip its fold). Metric: the
  * visible-mass L1 distance in [0, 2]; assert a ceiling to catch a
  * crawl whose token/domain mix silently shifted.
  */
case class ItemFrequencyDrift(mgA: String, mgB: String)
    extends StandardScanShareableAnalyzer[FreqDriftState](
      "ItemFrequencyDrift", s"$mgA,$mgB", Entity.Multicolumn) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(mgA) :: hasColumn(mgB) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    Seq(graft.sketch.FreqItems.mergeAggCol(col(mgA)),
      graft.sketch.FreqItems.mergeAggCol(col(mgB)))

  private def stateAt(result: Row, offset: Int): Option[FreqItemsState] =
    if (result.isNullAt(offset)) None
    else {
      val r = result.getStruct(offset)
      Some(FreqItemsState(
        r.getAs[Map[String, Long]]("counters"), r.getAs[Long]("n")))
    }

  override def fromAggregationResult(result: Row, offset: Int): Option[FreqDriftState] =
    for {
      a <- stateAt(result, offset)
      b <- stateAt(result, offset + 1)
    } yield FreqDriftState(a, b)
}

/** Pair of folded HLL sketches (snapshot A, snapshot B); the metric is
  * |B| / |A| — the distinct-count growth ratio (1.0 when both sides are
  * empty, 0.0 when only A holds values, +∞ when only B does —
  * assertions see the divergence direction instead of a masked value).
  */
case class DistinctRatioState(a: HllState, b: HllState)
    extends DoubleValuedState[DistinctRatioState] {
  override def merge(other: DistinctRatioState): DistinctRatioState =
    DistinctRatioState(a.merge(other.a), b.merge(other.b))
  override def metricValue(): Double = {
    val ea = a.metricValue()
    val eb = b.metricValue()
    if (ea > 0.0) eb / ea
    else if (eb == 0.0) 1.0
    else Double.PositiveInfinity
  }
}

/** Distinct-count drift between two HLL state columns on ONE frame (two
  * snapshots' per-group states joined on their group keys): metric
  * |B| / |A| of the folded corpus sketches — the "did today's crawl
  * shrink/explode" alarm, each side at HLL accuracy. Null sketches skip
  * their side's union.
  */
case class DistinctCountRatio(hllA: String, hllB: String)
    extends StandardScanShareableAnalyzer[DistinctRatioState](
      "DistinctCountRatio", s"$hllA,$hllB", Entity.Multicolumn) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(hllA) :: hasColumn(hllB) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    Seq(hll_union_agg(col(hllA), lit(true)),
      hll_union_agg(col(hllB), lit(true)))

  override def fromAggregationResult(result: Row, offset: Int): Option[DistinctRatioState] =
    if (result.isNullAt(offset) || result.isNullAt(offset + 1)) None
    else Some(DistinctRatioState(
      HllState(result.getAs[Array[Byte]](offset)),
      HllState(result.getAs[Array[Byte]](offset + 1))))
}

/** Quantile shift between two KLL state columns on ONE frame: the
  * metric is quantile_B(q) − quantile_A(q) of the two folded corpus
  * sketches — the "did p95 document length move" alarm, each side
  * accurate to KLL's rank-error bound.
  */
case class QuantileShift(kllA: String, kllB: String, quantile: Double)
    extends DoubleResultScanAnalyzer[QuantileShiftState](
      "QuantileShift", s"$kllA,$kllB:$quantile", Entity.Multicolumn) {

  require(quantile >= 0.0 && quantile <= 1.0,
    s"quantile must be in [0, 1], got $quantile")

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(kllA) :: hasColumn(kllB) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    Seq(graft.sketch.KllGroupState.mergeAggCol(col(kllA)),
      graft.sketch.KllGroupState.mergeAggCol(col(kllB)))

  override def fromAggregationResult(result: Row, offset: Int): Option[QuantileShiftState] =
    for {
      a <- graft.sketch.KLLAggregator.stateAt(result, offset)
      b <- graft.sketch.KLLAggregator.stateAt(result, offset + 1)
    } yield QuantileShiftState(a, b)

  override protected def valueFromState(state: QuantileShiftState): Double =
    state.b.sketch.quantile(quantile) - state.a.sketch.quantile(quantile)
}

/** Pair of folded KLL sketches (snapshot A, snapshot B). */
case class QuantileShiftState(a: graft.sketch.KLLState, b: graft.sketch.KLLState)
    extends State[QuantileShiftState] {
  override def merge(other: QuantileShiftState): QuantileShiftState =
    QuantileShiftState(a.merge(other.a), b.merge(other.b))
}

/** Snapshot-overlap drift from two theta state columns on ONE frame
  * (the per-group states of two snapshots joined on their group keys —
  * full-outer is fine: a group missing on one side carries a null
  * sketch, which the union skips). Metric: Jaccard overlap estimate of
  * the two snapshots' distinct sets, in [0, 1]; assert a floor to catch
  * a crawl that silently diverged from yesterday's.
  */
case class SnapshotOverlap(sketchA: String, sketchB: String)
    extends StandardScanShareableAnalyzer[ThetaOverlapState](
      "SnapshotOverlap", s"$sketchA,$sketchB", Entity.Multicolumn) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(sketchA) :: hasColumn(sketchB) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    Seq(graft.sketch.Theta.unionAggCol(col(sketchA)),
      graft.sketch.Theta.unionAggCol(col(sketchB)))

  override def fromAggregationResult(result: Row, offset: Int): Option[ThetaOverlapState] =
    if (result.isNullAt(offset) || result.isNullAt(offset + 1)) None
    else Some(ThetaOverlapState(
      result.getAs[Array[Byte]](offset),
      result.getAs[Array[Byte]](offset + 1)))
}

/** Mergeable release-parity census: shards in exact parity vs all shards
  * seen (Long pair — a true monoid).
  */
case class ManifestParityState(matched: Long, total: Long)
    extends DoubleValuedState[ManifestParityState] {
  override def merge(other: ManifestParityState): ManifestParityState =
    ManifestParityState(matched + other.matched, total + other.total)
  // two empty manifests ARE in parity — 1.0, not a masked 0/0
  override def metricValue(): Double =
    if (total == 0L) 1.0 else matched.toDouble / total
}

/** Dataset-release parity on the constraint surface: the analyzed frame
  * is two manifests FULL OUTER joined on the shard key
  * ([[graft.pipeline.DatasetManifest.joined]] — `n_rows_<side>`,
  * `id_sum_<side>`, `content_fp_<side>` per side), and the metric is the
  * fraction of shards whose whole census triple matches EXACTLY (a shard
  * present on only one side is a mismatch). 1.0 ⟺ the release-parity
  * proof ([[graft.pipeline.DatasetManifest.diff]] empty); assert `isOne`
  * via `Check.hasManifestParity` to gate a ship on byte-census identity,
  * or a floor (e.g. >= 0.95) to tolerate a bounded drift surface. KB-in:
  * the manifests are per-shard fingerprints, the corpus is never read.
  */
case class ManifestParity(sideA: String = "a", sideB: String = "b")
    extends StandardScanShareableAnalyzer[ManifestParityState](
      "ManifestParity", s"$sideA,$sideB", Entity.Multicolumn) {

  private def sideCols(s: String): Seq[String] =
    Seq(s"n_rows_$s", s"id_sum_$s", s"content_fp_$s")

  override def preconditions: Seq[StructType => Unit] =
    (sideCols(sideA) ++ sideCols(sideB)).map(hasColumn).toList

  override def aggregationFunctions(): Seq[Column] = {
    val eq = sideCols(sideA).zip(sideCols(sideB)).map { case (ca, cb) =>
      col(ca).isNotNull && col(cb).isNotNull && (col(ca) <=> col(cb))
    }.reduce(_ && _)
    Seq(sum(when(eq, 1L).otherwise(0L)), count(lit(1)))
  }

  override def fromAggregationResult(result: Row, offset: Int): Option[ManifestParityState] =
    if (result.isNullAt(offset + 1)) None
    else Some(ManifestParityState(
      if (result.isNullAt(offset)) 0L else result.getLong(offset),
      result.getLong(offset + 1)))
}

/** Per-cell population census of two k-means cell-state snapshots —
  * cell → (n_a, n_b) count pairs, a true Long monoid (counts ADD).
  * Metric: the population L1 distance Σ_cell |n_a/tot_a − n_b/tot_b|
  * in [0, 2] — 0 when the two snapshots distribute embeddings across
  * the cells identically, 2 when they occupy disjoint cells. The L1
  * form (not PSI) is deliberate: it needs no smoothing constant for
  * empty cells and its integer numerator Σ|n_a·tot_b − n_b·tot_a| is
  * exactly replayable by any engine (the PSI's per-cell ln() is not —
  * the q102/q103 integer-grid lesson applied to the drift surface).
  */
case class CellPopDriftState(counts: Map[Int, (Long, Long)])
    extends DoubleValuedState[CellPopDriftState] {
  override def merge(other: CellPopDriftState): CellPopDriftState =
    CellPopDriftState(
      (counts.keySet ++ other.counts.keySet).iterator.map { c =>
        val (a1, b1) = counts.getOrElse(c, (0L, 0L))
        val (a2, b2) = other.counts.getOrElse(c, (0L, 0L))
        c -> ((a1 + a2, b1 + b2))
      }.toMap)
  override def metricValue(): Double = {
    val totA = counts.valuesIterator.map(_._1).sum
    val totB = counts.valuesIterator.map(_._2).sum
    if (totA == 0L && totB == 0L) return 0.0
    // exact integer numerator, divided once — no per-cell float sums
    val num = counts.valuesIterator.map { case (na, nb) =>
      (BigInt(na) * totB - BigInt(nb) * totA).abs
    }.sum
    if (totA == 0L || totB == 0L) 2.0
    else (BigDecimal(num) /
      (BigDecimal(totA) * BigDecimal(totB))).toDouble
  }
}

/** Embedding-space population drift on the constraint surface: the
  * analyzed frame is two cell-state snapshots joined on the cell key
  * ([[graft.pipeline.Clustering.cellPopulationDrift]] — `cell`, `n_a`,
  * `n_b`; full-outer, a cell missing on one side counts 0 there), and
  * the metric is the population L1 distance of the two snapshots'
  * cell-occupancy distributions. Assert a ceiling
  * (`Check.hasCellPopulationDrift`) to catch a corpus whose embedding
  * geometry silently shifted between crawls — computed entirely from
  * two KB-scale persisted states, the corpora never rescanned.
  */
case class CellPopulationDrift(
    cellCol: String = "cell", nA: String = "n_a", nB: String = "n_b")
    extends StandardScanShareableAnalyzer[CellPopDriftState](
      "CellPopulationDrift", s"$cellCol:$nA,$nB", Entity.Multicolumn) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(cellCol) :: hasColumn(nA) :: hasColumn(nB) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    // cell states are k slim rows — a collected list IS the sufficient
    // statistic, same size class as the k-row centroid collects
    Seq(collect_list(struct(
      col(cellCol).cast("int").as("c"),
      coalesce(col(nA).cast("long"), lit(0L)).as("na"),
      coalesce(col(nB).cast("long"), lit(0L)).as("nb"))))

  override def fromAggregationResult(result: Row, offset: Int): Option[CellPopDriftState] =
    if (result.isNullAt(offset)) None
    else {
      val rows = result.getSeq[Row](offset)
      if (rows.isEmpty) None
      // duplicate cell rows (a pre-joined frame fed twice) SUM, the
      // monoid semantics — a plain toMap would silently drop counts
      else Some(rows.iterator.map { r =>
        CellPopDriftState(Map(r.getInt(0) -> ((r.getLong(1), r.getLong(2)))))
      }.reduce(_ merge _))
    }
}
