package graft.operators

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame

import graft.core._

/** Number of columns — driver-side, no Spark job
  * (reference capability: analyzers/ColumnCount.scala:24).
  */
case class ColumnCount() extends Analyzer[NumMatches, DoubleMetric] {
  val name = "ColumnCount"
  val entity: Entity = Entity.Dataset
  val instance = "*"

  override def computeStateFrom(data: DataFrame): Option[NumMatches] =
    Some(NumMatches(data.columns.length.toLong))

  override def computeMetricFrom(state: Option[NumMatches]): DoubleMetric = state match {
    case Some(s) => DoubleMetric(entity, name, instance, Success(s.metricValue()))
    case None => DoubleMetric(entity, name, instance,
      Failure(new EmptyStateException("Empty state for ColumnCount")))
  }

  override def toFailureMetric(failure: Throwable): DoubleMetric =
    Metric.failed(entity, name, instance, failure)
}

/** 1.0 if the column exists, failure otherwise — schema check only
  * (reference capability: analyzers/ColumnExists.scala:29).
  */
case class ColumnExists(column: String) extends Analyzer[NumMatches, DoubleMetric] {
  val name = "ColumnExists"
  val entity: Entity = Entity.Column
  val instance: String = column

  override def computeStateFrom(data: DataFrame): Option[NumMatches] =
    if (data.columns.exists(_.equalsIgnoreCase(column))) Some(NumMatches(1L)) else None

  override def computeMetricFrom(state: Option[NumMatches]): DoubleMetric = state match {
    case Some(_) => DoubleMetric(entity, name, instance, Success(1.0))
    case None => DoubleMetric(entity, name, instance,
      Failure(new NoSuchColumnException(s"Input data does not include column $column!")))
  }

  override def toFailureMetric(failure: Throwable): DoubleMetric =
    Metric.failed(entity, name, instance, failure)
}

/** Arbitrary SQL returning exactly one row and one numeric column — the
  * full Catalyst surface exposed to users
  * (reference capability: analyzers/CustomSql.scala:42).
  */
case class CustomSql(expression: String) extends Analyzer[SumState, DoubleMetric] {
  val name = "CustomSQL"
  val entity: Entity = Entity.Dataset
  val instance = "*"

  override def computeStateFrom(data: DataFrame): Option[SumState] = {
    val result = data.sparkSession.sql(expression)
    if (result.columns.length != 1) {
      throw new MetricCalculationException("Custom SQL did not return exactly 1 column")
    }
    val rows = result.limit(2).collect()
    if (rows.length != 1) {
      throw new MetricCalculationException("Custom SQL did not return exactly 1 row")
    }
    Analyzers.doubleAt(rows.head, 0).map(SumState)
  }

  override def computeMetricFrom(state: Option[SumState]): DoubleMetric = state match {
    case Some(s) => DoubleMetric(entity, name, instance, Success(s.sum))
    case None => DoubleMetric(entity, name, instance,
      Failure(new EmptyStateException("Custom SQL returned NULL")))
  }

  override def toFailureMetric(failure: Throwable): DoubleMetric =
    Metric.failed(entity, name, instance, failure)
}
