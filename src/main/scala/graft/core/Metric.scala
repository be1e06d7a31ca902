package graft.core

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.Column

/** Entity a metric describes.
  *
  * Mirrors the capability of the reference's metric entity model
  * (reference: metrics/Metric.scala:23-25) — exact entity strings are part
  * of the serialized contract.
  */
sealed trait Entity {
  def repr: String
}

object Entity {
  case object Dataset extends Entity { val repr = "Dataset" }
  case object Column extends Entity { val repr = "Column" }
  case object Multicolumn extends Entity { val repr = "Multicolumn" }

  def fromString(s: String): Entity = s match {
    case "Dataset"     => Dataset
    case "Column"      => Column
    case "Multicolumn" => Multicolumn
    case other         => throw new IllegalArgumentException(s"Unknown entity $other")
  }
}

/** A named measurement over a dataset, column, or column group.
  *
  * `value` is a `Try` so that failures (missing column, empty data, bad
  * predicate) flow through the engine as data instead of exceptions
  * (reference: metrics/Metric.scala:28-40).
  */
trait Metric[+T] {
  def entity: Entity
  def name: String
  def instance: String
  def value: Try[T]
}

/** Metric that can additionally carry an unevaluated per-row outcome
  * expression, later selected against the original data to produce
  * row-level results (reference: metrics/Metric.scala:45-60).
  */
trait FullColumnCarrying[+T] extends Metric[T] {
  def fullColumn: Option[Column]
}

case class DoubleMetric(
    entity: Entity,
    name: String,
    instance: String,
    value: Try[Double],
    fullColumn: Option[Column] = None
) extends FullColumnCarrying[Double]

/** Multiple named double values from one analyzer (e.g. quantiles). */
case class KeyedDoubleMetric(
    entity: Entity,
    name: String,
    instance: String,
    value: Try[Map[String, Double]]
) extends Metric[Map[String, Double]]

/** One bucket of a value distribution. */
case class DistributionValue(absolute: Long, ratio: Double)

/** Top-N value distribution of a column (reference: metrics/HistogramMetric). */
case class Distribution(values: Map[String, DistributionValue], numberOfBins: Long) {
  def apply(key: String): DistributionValue = values(key)
  def argmax: String =
    values.maxBy { case (_, v) => v.absolute }._1
}

case class HistogramMetric(
    column: String,
    value: Try[Distribution]
) extends Metric[Distribution] {
  val entity: Entity = Entity.Column
  val name: String = "Histogram"
  val instance: String = column
}

/** Named attribute counts from a custom aggregator. */
case class AttributeDoubleMetric(
    entity: Entity,
    name: String,
    instance: String,
    value: Try[Map[String, Double]]
) extends Metric[Map[String, Double]]

object Metric {
  def doubleMetricFromValue(
      value: Try[Double],
      entity: Entity,
      name: String,
      instance: String,
      fullColumn: Option[Column] = None
  ): DoubleMetric = DoubleMetric(entity, name, instance, value, fullColumn)

  def failed(entity: Entity, name: String, instance: String, e: Throwable): DoubleMetric =
    DoubleMetric(entity, name, instance, Failure(MetricCalculationException.wrap(e)))
}

class MetricCalculationException(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

object MetricCalculationException {
  def wrap(e: Throwable): MetricCalculationException = e match {
    case m: MetricCalculationException => m
    case other => new MetricCalculationException(Option(other.getMessage).getOrElse(other.toString), other)
  }
}

class EmptyStateException(message: String) extends MetricCalculationException(message)
