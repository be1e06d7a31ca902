package graft.anomaly

/** Anomaly detection over metric time series — pure driver-side Scala
  * (reference capability: the anomalydetection package).
  *
  * A strategy inspects a Vector of (time, value) points and returns the
  * anomalous indices within a search interval.
  */
case class Anomaly(value: Option[Double], confidence: Double, detail: Option[String] = None)

case class DetectionResult(anomalies: Seq[(Long, Anomaly)])

trait AnomalyDetectionStrategy {
  /** Search `dataSeries` (index-aligned values) for anomalies inside
    * `searchInterval` [from, to) and return (index, anomaly) pairs.
    */
  def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int) = (0, Int.MaxValue)): Seq[(Int, Anomaly)]
}

/** Flags values outside fixed bounds
  * (reference capability: anomalydetection/SimpleThresholdStrategy.scala:39).
  */
case class SimpleThresholdStrategy(
    lowerBound: Double = Double.MinValue,
    upperBound: Double) extends AnomalyDetectionStrategy {

  require(lowerBound <= upperBound, "The lower bound must be smaller or equal to the upper bound.")

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    val (from, to) = searchInterval
    dataSeries.zipWithIndex
      .slice(from, math.min(to, dataSeries.length))
      .collect { case (v, i) if v < lowerBound || v > upperBound =>
        (i, Anomaly(Some(v), 1.0,
          Some(s"[SimpleThresholdStrategy]: Value $v is not in bounds [$lowerBound, $upperBound]")))
      }
  }
}

/** Base for strategies detecting anomalies in the n-th order difference
  * series (reference capability: anomalydetection/BaseChangeStrategy.scala:80).
  */
abstract class BaseChangeStrategy extends AnomalyDetectionStrategy {

  def maxRateDecrease: Option[Double]
  def maxRateIncrease: Option[Double]
  def order: Int

  require(maxRateDecrease.isDefined || maxRateIncrease.isDefined,
    "At least one of maxRateDecrease or maxRateIncrease must be specified.")
  require(
    maxRateDecrease.getOrElse(Double.MinValue) <= maxRateIncrease.getOrElse(Double.MaxValue),
    "maxRateDecrease must be <= maxRateIncrease.")

  /** The change metric between consecutive points (absolute or relative). */
  protected def diff(current: Double, previous: Double): Double

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    if (dataSeries.isEmpty) return Seq.empty // Vector.empty.tail throws
    val (from, to) = searchInterval
    val lo = math.max(from, order)
    // n-th order differencing
    var series = dataSeries
    var offsets = 0
    (0 until order).foreach { _ =>
      series = series.zip(series.tail).map { case (prev, cur) => diff(cur, prev) }.toVector
      offsets += 1
    }
    series.zipWithIndex
      .map { case (v, i) => (v, i + offsets) } // re-align to original indices
      .filter { case (_, i) => i >= lo && i < math.min(to, dataSeries.length) }
      .collect {
        // a disabled bound (None) means NO check on that side — the
        // getOrElse(MaxValue) form still flagged an infinite change
        case (change, i)
            if maxRateDecrease.exists(change < _) ||
               maxRateIncrease.exists(change > _) =>
          (i, Anomaly(Some(dataSeries(i)), 1.0,
            Some(s"[${getClass.getSimpleName}]: Change of $change is not in bounds " +
              s"[${maxRateDecrease.getOrElse(Double.MinValue)}, " +
              s"${maxRateIncrease.getOrElse(Double.MaxValue)}]. Order=$order")))
      }
  }
}

/** Bounds on the absolute change between consecutive metric values
  * (reference capability: anomalydetection/AbsoluteChangeStrategy).
  */
case class AbsoluteChangeStrategy(
    maxRateDecrease: Option[Double] = None,
    maxRateIncrease: Option[Double] = None,
    order: Int = 1) extends BaseChangeStrategy {
  override protected def diff(current: Double, previous: Double): Double = current - previous
}

/** Bounds on the ratio current/previous
  * (reference capability: anomalydetection/RelativeRateOfChangeStrategy).
  */
case class RelativeRateOfChangeStrategy(
    maxRateDecrease: Option[Double] = None,
    maxRateIncrease: Option[Double] = None,
    order: Int = 1) extends BaseChangeStrategy {
  override protected def diff(current: Double, previous: Double): Double =
    // a zero baseline keeps the SIGN of the move: +Inf for a jump up,
    // -Inf for a crash down (previously always +Inf, inverting the
    // direction and masking decreases), ratio 1.0 for 0 -> 0 (no change)
    if (previous == 0.0) {
      if (current > 0.0) Double.PositiveInfinity
      else if (current < 0.0) Double.NegativeInfinity
      else 1.0
    } else current / previous
}

/** Online mean/stddev (Welford) with optional exclusion of detected
  * anomalies from the running estimate
  * (reference capability: anomalydetection/OnlineNormalStrategy.scala:130).
  */
case class OnlineNormalStrategy(
    lowerDeviationFactor: Option[Double] = Some(3.0),
    upperDeviationFactor: Option[Double] = Some(3.0),
    ignoreStartPercentage: Double = 0.1,
    ignoreAnomalies: Boolean = true) extends AnomalyDetectionStrategy {

  require(lowerDeviationFactor.isDefined || upperDeviationFactor.isDefined,
    "At least one factor must be specified.")
  require(lowerDeviationFactor.getOrElse(1.0) >= 0 && upperDeviationFactor.getOrElse(1.0) >= 0,
    "Factors cannot be smaller than zero.")
  require(ignoreStartPercentage >= 0 && ignoreStartPercentage <= 1.0,
    "the ignoreStartPercentage must be in [0, 1]")

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    val (from, to) = searchInterval
    val numIgnored = math.ceil(ignoreStartPercentage * dataSeries.length).toInt
    var mean = 0.0
    var m2 = 0.0
    var count = 0L
    val out = Seq.newBuilder[(Int, Anomaly)]

    dataSeries.zipWithIndex.foreach { case (v, i) =>
      val stdDev = if (count > 1) math.sqrt(m2 / count) else 0.0
      // a disabled factor (None) means NO bound on that side — the
      // getOrElse(MaxValue) form collapsed to the TIGHTEST bound when
      // stdDev was 0 (MaxValue * 0 = 0)
      val upper = upperDeviationFactor.map(mean + _ * stdDev)
        .getOrElse(Double.PositiveInfinity)
      val lower = lowerDeviationFactor.map(mean - _ * stdDev)
        .getOrElse(Double.NegativeInfinity)
      val isAnomaly = i >= numIgnored && (v > upper || v < lower) && count > 1

      if (isAnomaly && i >= from && i < math.min(to, dataSeries.length)) {
        out += ((i, Anomaly(Some(v), 1.0,
          Some(s"[OnlineNormalStrategy]: Value $v is not in " +
            s"bounds [$lower, $upper]."))))
      }
      if (!(isAnomaly && ignoreAnomalies)) {
        count += 1
        val delta = v - mean
        mean += delta / count
        m2 += delta * (v - mean)
      }
    }
    out.result()
  }
}

/** Mean/stddev from the points OUTSIDE the search interval; values within
  * are judged against those bounds
  * (reference capability: anomalydetection/BatchNormalStrategy.scala:52).
  */
case class BatchNormalStrategy(
    lowerDeviationFactor: Option[Double] = Some(3.0),
    upperDeviationFactor: Option[Double] = Some(3.0),
    includeInterval: Boolean = false) extends AnomalyDetectionStrategy {

  require(lowerDeviationFactor.isDefined || upperDeviationFactor.isDefined,
    "At least one factor must be specified.")

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    val (from, to) = searchInterval
    val hi = math.min(to, dataSeries.length)
    val training =
      if (includeInterval) dataSeries
      else dataSeries.zipWithIndex.collect { case (v, i) if i < from || i >= hi => v }
    require(training.nonEmpty,
      "Excluding the search interval from the calculation leaves no data points.")
    val mean = training.sum / training.length
    val stdDev = math.sqrt(training.map(v => (v - mean) * (v - mean)).sum / training.length)
    // None = no bound on that side (see OnlineNormalStrategy)
    val upper = upperDeviationFactor.map(mean + _ * stdDev)
      .getOrElse(Double.PositiveInfinity)
    val lower = lowerDeviationFactor.map(mean - _ * stdDev)
      .getOrElse(Double.NegativeInfinity)

    dataSeries.zipWithIndex
      .slice(from, hi)
      .collect { case (v, i) if v > upper || v < lower =>
        (i, Anomaly(Some(v), 1.0,
          Some(s"[BatchNormalStrategy]: Value $v is not in bounds [$lower, $upper].")))
      }
  }
}
