package graft.anomaly

import org.apache.commons.math3.analysis.MultivariateFunction
import org.apache.commons.math3.optim.{InitialGuess, MaxEval, MaxIter, SimpleBounds}
import org.apache.commons.math3.optim.nonlinear.scalar.{GoalType, ObjectiveFunction}
import org.apache.commons.math3.optim.nonlinear.scalar.noderiv.BOBYQAOptimizer

/** Additive Holt-Winters (triple exponential smoothing) anomaly detection:
  * train level/trend/seasonality on the series prefix, flag points whose
  * forecast residual exceeds a normal-theory interval
  * (reference capability: anomalydetection/seasonal/HoltWinters.scala:203 —
  * same model family, independent implementation on commons-math3 BOBYQA).
  */
object HoltWinters {
  sealed abstract class SeriesSeasonality(val periodicity: Int)
  object SeriesSeasonality {
    case object Daily extends SeriesSeasonality(7)    // daily series, weekly season
    case object Weekly extends SeriesSeasonality(52)  // weekly series, yearly season
    case class Custom(p: Int) extends SeriesSeasonality(p) {
      // p <= 0 would pass the 2*p length check for any series and then
      // crash deep inside the optimizer objective (mod-by-zero / OOB)
      require(p > 0, s"seasonality periodicity must be positive, got $p")
    }
  }
}

/** @param nWithheld number of trailing points excluded from training.
  *   0 (the default) derives it from the search interval, so the judged
  *   points are always forecast OUT-OF-SAMPLE — the smoothing state never
  *   absorbs the very points being tested.
  */
case class HoltWinters(
    seasonality: HoltWinters.SeriesSeasonality,
    nWithheld: Int = 0) extends AnomalyDetectionStrategy {

  private val period = seasonality.periodicity

  /** One Holt-Winters pass over `series`; returns the one-step-ahead
    * forecasts per index plus the final (level, trend, seasonals) state,
    * from which out-of-sample forecasts extend without further updates.
    */
  private def smooth(series: Vector[Double], alpha: Double, beta: Double,
      gamma: Double): (Vector[Double], Double, Double, Array[Double]) = {
    val n = series.length
    // init: level = mean of first season, trend = average first-vs-second
    // season difference, seasonals = first-season deviations
    var level = series.take(period).sum / period
    var trend =
      if (n >= 2 * period) {
        (0 until period).map(i => (series(period + i) - series(i)) / period).sum / period
      } else 0.0
    val seasonals = Array.tabulate(period)(i => series(i) - level)
    val out = Vector.newBuilder[Double]
    (0 until n).foreach { t =>
      val s = t % period
      val forecast = level + trend + seasonals(s)
      out += forecast
      val v = series(t)
      val lastLevel = level
      level = alpha * (v - seasonals(s)) + (1 - alpha) * (level + trend)
      trend = beta * (level - lastLevel) + (1 - beta) * trend
      seasonals(s) = gamma * (v - level) + (1 - gamma) * seasonals(s)
    }
    (out.result(), level, trend, seasonals)
  }

  private def sse(series: Vector[Double], params: Array[Double]): Double = {
    val f = smooth(series, params(0), params(1), params(2))._1
    series.zip(f).map { case (v, p) => (v - p) * (v - p) }.sum
  }

  /** Fits (alpha, beta, gamma) by BOBYQA minimizing one-step SSE. */
  private def fit(series: Vector[Double]): Array[Double] = {
    val objective = new ObjectiveFunction(new MultivariateFunction {
      override def value(point: Array[Double]): Double = sse(series, point)
    })
    val optimizer = new BOBYQAOptimizer(7)
    try {
      optimizer.optimize(
        objective, GoalType.MINIMIZE,
        new InitialGuess(Array(0.3, 0.1, 0.1)),
        new SimpleBounds(Array(0.0001, 0.0001, 0.0001), Array(0.9999, 0.9999, 0.9999)),
        new MaxIter(200), new MaxEval(1000)
      ).getPoint
    } catch {
      // NonFatal only: swallowing an InterruptedException/OOM here would
      // silently proceed with untuned defaults in a cancelled/corrupted run
      case scala.util.control.NonFatal(_) => Array(0.3, 0.1, 0.1)
    }
  }

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    require(dataSeries.length >= 2 * period,
      s"Need at least ${2 * period} points for seasonality $period")
    val (from, to) = searchInterval
    val hi = math.min(to, dataSeries.length)
    val lo = math.max(from, 0)

    // train/test split: fit on the prefix BEFORE the withheld tail (by
    // default everything from the search start), judge the interval against
    // out-of-sample forecasts. Falls back to whole-series in-sample fitting
    // only when the prefix is too short for the seasonal init (< 2 periods).
    val withheld = if (nWithheld > 0) nWithheld else dataSeries.length - lo
    val trainEnd = dataSeries.length - math.max(withheld, 0)
    val train = if (trainEnd >= 2 * period) dataSeries.take(trainEnd) else dataSeries

    val params = fit(train)
    val (trainF, level, trend, seasonals) = smooth(train, params(0), params(1), params(2))
    // residual spread from TRAINING residuals only
    val trainResiduals = train.zip(trainF).map { case (v, p) => v - p }
    val meanR = trainResiduals.sum / trainResiduals.length
    val sdR = math.sqrt(
      trainResiduals.map(r => (r - meanR) * (r - meanR)).sum / trainResiduals.length)
    // a perfectly-predictable training series (sd 0) means ANY deviation is
    // anomalous — use a float-noise-sized bound instead of flagging nothing
    val bound =
      if (sdR > 0) 1.96 * sdR
      else 1e-9 * math.max(1.0, train.iterator.map(math.abs).max)

    // h-step-ahead forecast from the frozen end-of-training state; the
    // seasonal index stays aligned because smoothing indexed by absolute t
    def forecastAt(i: Int): Double =
      if (i < train.length) trainF(i)
      else level + (i - train.length + 1) * trend + seasonals(i % period)

    dataSeries.indices
      .filter(i => i >= lo && i < hi)
      .flatMap { i =>
        val f = forecastAt(i)
        val resid = dataSeries(i) - f - meanR
        if (math.abs(resid) > bound) {
          Some((i, Anomaly(Some(dataSeries(i)), 1.0,
            Some(f"[HoltWinters]: Forecast $f%.3f for observed value " +
              f"${dataSeries(i)}%.3f exceeds residual bound ±$bound%.3f"))))
        } else None
      }
  }
}
