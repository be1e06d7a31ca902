package graft.core

/** Mergeable sufficient statistic: a commutative semigroup.
  *
  * Every analyzer state must support `merge` so that states computed on
  * disjoint partitions of the data combine to the state of the union —
  * the algebra behind incremental computation (reference:
  * analyzers/Analyzer.scala:44-58, docs/key-concepts.md). At cluster scale
  * this is what lets us compute per-partition/per-day states once and fold
  * them without rescanning 100 TB.
  */
trait State[S <: State[S]] { self: S =>
  def merge(other: S): S

  private[graft] def mergeUntyped(other: State[_]): S =
    merge(other.asInstanceOf[S])
}

trait DoubleValuedState[S <: DoubleValuedState[S]] extends State[S] { self: S =>
  def metricValue(): Double
}

// ---------------------------------------------------------------------------
// Simple count-based states
// ---------------------------------------------------------------------------

case class NumMatches(numMatches: Long) extends DoubleValuedState[NumMatches] {
  override def merge(other: NumMatches): NumMatches = NumMatches(numMatches + other.numMatches)
  override def metricValue(): Double = numMatches.toDouble
}

case class NumMatchesAndCount(numMatches: Long, count: Long)
    extends DoubleValuedState[NumMatchesAndCount] {
  override def merge(other: NumMatchesAndCount): NumMatchesAndCount =
    NumMatchesAndCount(numMatches + other.numMatches, count + other.count)
  override def metricValue(): Double =
    if (count == 0L) Double.NaN else numMatches.toDouble / count
}

// ---------------------------------------------------------------------------
// Order statistics
// ---------------------------------------------------------------------------

case class MinState(minValue: Double) extends DoubleValuedState[MinState] {
  override def merge(other: MinState): MinState = MinState(math.min(minValue, other.minValue))
  override def metricValue(): Double = minValue
}

case class MaxState(maxValue: Double) extends DoubleValuedState[MaxState] {
  override def merge(other: MaxState): MaxState = MaxState(math.max(maxValue, other.maxValue))
  override def metricValue(): Double = maxValue
}

case class MinMaxState(minValue: Double, maxValue: Double) extends DoubleValuedState[MinMaxState] {
  override def merge(other: MinMaxState): MinMaxState =
    MinMaxState(math.min(minValue, other.minValue), math.max(maxValue, other.maxValue))
  override def metricValue(): Double = maxValue - minValue
}

// ---------------------------------------------------------------------------
// Sums and means
// ---------------------------------------------------------------------------

case class SumState(sum: Double) extends DoubleValuedState[SumState] {
  override def merge(other: SumState): SumState = SumState(sum + other.sum)
  override def metricValue(): Double = sum
}

case class MeanState(sum: Double, count: Long) extends DoubleValuedState[MeanState] {
  override def merge(other: MeanState): MeanState =
    MeanState(sum + other.sum, count + other.count)
  override def metricValue(): Double =
    if (count == 0L) Double.NaN else sum / count
}

case class SumPairState(numerator: Double, denominator: Double)
    extends DoubleValuedState[SumPairState] {
  override def merge(other: SumPairState): SumPairState =
    SumPairState(numerator + other.numerator, denominator + other.denominator)
  override def metricValue(): Double = numerator / denominator
}

// ---------------------------------------------------------------------------
// Central moments (stddev / variance / skewness / kurtosis)
// ---------------------------------------------------------------------------

/** Central moments up to order four, merged via the pairwise (Chan et al.)
  * update — numerically stable and associative, so partition-level states
  * fold correctly on a cluster. Backs StandardDeviation, Variance,
  * Skewness and Kurtosis (reference capability:
  * catalyst/StatefulStdDevPop.scala:24, StatefulKurtosis.scala:24).
  */
case class MomentsState(n: Double, mean: Double, m2: Double, m3: Double, m4: Double)
    extends State[MomentsState] {

  override def merge(other: MomentsState): MomentsState = {
    if (n == 0) return other
    if (other.n == 0) return this
    val na = n; val nb = other.n; val nx = na + nb
    val delta = other.mean - mean
    val d2 = delta * delta
    val meanX = mean + delta * nb / nx
    val m2x = m2 + other.m2 + d2 * na * nb / nx
    val m3x = m3 + other.m3 +
      delta * d2 * na * nb * (na - nb) / (nx * nx) +
      3.0 * delta * (na * other.m2 - nb * m2) / nx
    val m4x = m4 + other.m4 +
      d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (nx * nx * nx) +
      6.0 * d2 * (na * na * other.m2 + nb * nb * m2) / (nx * nx) +
      4.0 * delta * (na * other.m3 - nb * m3) / nx
    MomentsState(nx, meanX, m2x, m3x, m4x)
  }

  def stdDevPop: Double = math.sqrt(m2 / n)
  def variancePop: Double = m2 / n
  /** g1 skewness, matching Spark's built-in `skewness`. */
  def skewness: Double = math.sqrt(n) * m3 / math.sqrt(m2 * m2 * m2)
  /** Excess kurtosis, matching Spark's built-in `kurtosis`. */
  def kurtosis: Double = n * m4 / (m2 * m2) - 3.0
}

/** Pearson correlation co-moments with stable pairwise merge (backs
  * Correlation; reference capability: analyzers/Correlation.scala:37-56).
  */
case class CorrelationState(
    n: Double,
    xAvg: Double,
    yAvg: Double,
    ck: Double,
    xMk: Double,
    yMk: Double
) extends DoubleValuedState[CorrelationState] {

  override def merge(other: CorrelationState): CorrelationState = {
    if (n == 0) return other
    if (other.n == 0) return this
    val n1 = n; val n2 = other.n; val nx = n1 + n2
    val dx = other.xAvg - xAvg
    val dy = other.yAvg - yAvg
    CorrelationState(
      nx,
      (xAvg * n1 + other.xAvg * n2) / nx,
      (yAvg * n1 + other.yAvg * n2) / nx,
      ck + other.ck + dx * dy * n1 * n2 / nx,
      xMk + other.xMk + dx * dx * n1 * n2 / nx,
      yMk + other.yMk + dy * dy * n1 * n2 / nx
    )
  }

  override def metricValue(): Double = ck / math.sqrt(xMk * yMk)
}

// ---------------------------------------------------------------------------
// Sketch states
// ---------------------------------------------------------------------------

/** Serialized Apache DataSketches HLL sketch (produced by Spark's built-in
  * `hll_sketch_agg`). Merging unions the sketches driver-side via the
  * bundled datasketches-java library — no extra Spark job.
  */
case class HllState(sketchBytes: Array[Byte]) extends DoubleValuedState[HllState] {
  import org.apache.datasketches.hll.{HllSketch, Union}
  import org.apache.datasketches.memory.Memory

  override def merge(other: HllState): HllState = {
    val union = new Union(HllState.LG_K)
    union.update(HllSketch.heapify(Memory.wrap(sketchBytes)))
    union.update(HllSketch.heapify(Memory.wrap(other.sketchBytes)))
    HllState(union.getResult.toCompactByteArray)
  }

  override def metricValue(): Double =
    HllSketch.heapify(Memory.wrap(sketchBytes)).getEstimate

  override def equals(o: Any): Boolean = o match {
    case HllState(b) => java.util.Arrays.equals(sketchBytes, b)
    case _           => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(sketchBytes)
}

object HllState {
  /** Spark's hll_sketch_agg default lgConfigK. */
  val LG_K = 12
}

/** Marker for analyzer states that cannot be merged (exact quantiles,
  * binned histograms with data-dependent edges). Merging must fail loudly
  * (reference behavior: analyzers/InterquartileRange.scala:28-51).
  */
trait NonMergeableState[S <: NonMergeableState[S]] extends State[S] { self: S =>
  def analyzerName: String
  override def merge(other: S): S =
    throw new UnsupportedOperationException(
      s"$analyzerName computes a non-mergeable state; incremental aggregation is not supported")
}

case class ExactQuantileState(values: Seq[Double], analyzerName: String)
    extends NonMergeableState[ExactQuantileState]
