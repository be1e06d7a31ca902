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
    case class Custom(p: Int) extends SeriesSeasonality(p)
  }
}

case class HoltWinters(
    seasonality: HoltWinters.SeriesSeasonality,
    nWithheld: Int = 0) extends AnomalyDetectionStrategy {

  private val period = seasonality.periodicity

  /** One Holt-Winters pass; returns one-step-ahead forecasts per index. */
  private def forecasts(series: Vector[Double], alpha: Double, beta: Double,
      gamma: Double): Vector[Double] = {
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
    out.result()
  }

  private def sse(series: Vector[Double], params: Array[Double]): Double = {
    val f = forecasts(series, params(0), params(1), params(2))
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
      case _: Throwable => Array(0.3, 0.1, 0.1)
    }
  }

  override def detect(dataSeries: Vector[Double],
      searchInterval: (Int, Int)): Seq[(Int, Anomaly)] = {
    require(dataSeries.length >= 2 * period,
      s"Need at least ${2 * period} points for seasonality $period")
    val (from, to) = searchInterval
    val hi = math.min(to, dataSeries.length)

    val params = fit(dataSeries)
    val f = forecasts(dataSeries, params(0), params(1), params(2))
    val residuals = dataSeries.zip(f).map { case (v, p) => v - p }
    val trainResiduals = residuals.dropRight(math.max(nWithheld, 0))
    val meanR = trainResiduals.sum / trainResiduals.length
    val sdR = math.sqrt(
      trainResiduals.map(r => (r - meanR) * (r - meanR)).sum / trainResiduals.length)
    val bound = 1.96 * sdR

    dataSeries.indices
      .filter(i => i >= from && i < hi)
      .flatMap { i =>
        val resid = residuals(i) - meanR
        if (math.abs(resid) > bound && sdR > 0) {
          Some((i, Anomaly(Some(dataSeries(i)), 1.0,
            Some(f"[HoltWinters]: Forecast ${f(i)}%.3f for observed value " +
              f"${dataSeries(i)}%.3f exceeds residual bound ±$bound%.3f"))))
        } else None
      }
  }
}
