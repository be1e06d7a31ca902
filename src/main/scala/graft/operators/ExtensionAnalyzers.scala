package graft.operators

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame

import graft.comparison.DatasetMatch
import graft.core._

/** Keyed counts produced by a user-supplied aggregation function
  * (reference capability: analyzers/CustomAggregator.scala:40).
  */
case class AggregatedMetricState(counts: Map[String, Long], total: Long)
    extends State[AggregatedMetricState] {
  override def merge(other: AggregatedMetricState): AggregatedMetricState = {
    val merged = (counts.keySet ++ other.counts.keySet).map { k =>
      k -> (counts.getOrElse(k, 0L) + other.counts.getOrElse(k, 0L))
    }.toMap
    AggregatedMetricState(merged, total + other.total)
  }
}

/** Pass-through extension point: any DataFrame => keyed-counts function
  * becomes an analyzer whose metric is the per-key ratio map
  * (reference capability: analyzers/CustomAggregator.scala:40-69).
  */
case class CustomAggregator(
    aggregatorFunc: DataFrame => AggregatedMetricState,
    analyzerName: String,
    analyzerInstance: String = "*")
    extends Analyzer[AggregatedMetricState, AttributeDoubleMetric] {

  val name: String = analyzerName
  val instance: String = analyzerInstance
  val entity: Entity = Entity.Dataset

  override def computeStateFrom(data: DataFrame): Option[AggregatedMetricState] =
    Some(aggregatorFunc(data))

  override def computeMetricFrom(state: Option[AggregatedMetricState]): AttributeDoubleMetric =
    state match {
      case Some(s) if s.total > 0 =>
        AttributeDoubleMetric(entity, name, instance,
          Success(s.counts.map { case (k, v) => k -> v.toDouble / s.total }))
      case Some(_) =>
        AttributeDoubleMetric(entity, name, instance,
          Failure(new EmptyStateException(s"Empty state for $name: zero total")))
      case None =>
        AttributeDoubleMetric(entity, name, instance,
          Failure(new EmptyStateException(s"Empty state for $name")))
    }

  override def toFailureMetric(failure: Throwable): AttributeDoubleMetric =
    AttributeDoubleMetric(entity, name, instance,
      Failure(MetricCalculationException.wrap(failure)))
}

/** Ratio of rows in the analyzed dataset with a matching row in
  * `dfToCompare`, keyed by `columnMappings` and compared on
  * `matchColumnMappings` (reference capability:
  * analyzers/DatasetMatchAnalyzer.scala:66-102).
  *
  * At scale: an equi-join Catalyst plans as broadcast or sort-merge on the
  * key columns; no driver-side row movement.
  */
case class DatasetMatchAnalyzer(
    dfToCompare: DataFrame,
    columnMappings: Map[String, String],
    matchColumnMappings: Map[String, String] = Map.empty)
    extends Analyzer[NumMatchesAndCount, DoubleMetric] {

  val name = "DatasetMatch"
  val entity: Entity = Entity.Dataset
  val instance: String = columnMappings.map { case (a, b) => s"$a->$b" }.mkString(",")

  override def computeStateFrom(data: DataFrame): Option[NumMatchesAndCount] = {
    val total = data.count()
    if (total == 0L) return Some(NumMatchesAndCount(0L, 0L))
    DatasetMatch.matchRatio(data, dfToCompare, columnMappings, matchColumnMappings) match {
      case Success(ratio) =>
        Some(NumMatchesAndCount(math.round(ratio * total), total))
      case Failure(e) => throw e
    }
  }

  override def computeMetricFrom(state: Option[NumMatchesAndCount]): DoubleMetric =
    state match {
      case Some(s) if s.count > 0 =>
        DoubleMetric(entity, name, instance, Success(s.metricValue()))
      case Some(_) =>
        DoubleMetric(entity, name, instance, Success(1.0)) // empty data matches trivially
      case None =>
        DoubleMetric(entity, name, instance,
          Failure(new EmptyStateException("Empty state for DatasetMatch")))
    }

  override def toFailureMetric(failure: Throwable): DoubleMetric =
    Metric.failed(entity, name, instance, failure)
}
