package graft.operators

import scala.util.{Failure, Success}

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.core._
import graft.core.Analyzers._
import graft.core.Preconditions._

/** Per-row regex-inferred type counters. Mergeable by element-wise sum. */
case class DataTypeState(
    numNull: Long,
    numBoolean: Long,
    numIntegral: Long,
    numFractional: Long,
    numString: Long
) extends State[DataTypeState] {

  def total: Long = numNull + numBoolean + numIntegral + numFractional + numString

  override def merge(other: DataTypeState): DataTypeState = DataTypeState(
    numNull + other.numNull,
    numBoolean + other.numBoolean,
    numIntegral + other.numIntegral,
    numFractional + other.numFractional,
    numString + other.numString)
}

object DataTypeInstances {
  val Null = "Unknown"
  val Boolean = "Boolean"
  val Integral = "Integral"
  val Fractional = "Fractional"
  val String = "String"
  val ordered: Seq[String] = Seq(Null, Boolean, Integral, Fractional, String)
}

/** Semantic type inference: classifies every value by regex into
  * {Unknown(null), Boolean, Integral, Fractional, String} and reports the
  * histogram. The reference needs a custom UDAF for this
  * (catalyst/StatefulDataType.scala:26-83); in Spark a when-chain plus five
  * codegen'd sums does the same work inside the fused scan — SURVEY §7.3.
  */
case class DataTypeAnalyzer(column: String, where: Option[String] = None)
    extends ScanShareableAnalyzer[DataTypeState, HistogramMetric] {

  val name = "DataType"
  val entity: Entity = Entity.Column
  val instance: String = column

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNotNested(column) :: Nil

  // same value regexes as the reference (catalyst/StatefulDataType.scala:36-38)
  private val booleanRe = "^(true|false)$"
  private val integralRe = "^(-|\\+)?[0-9]+$"
  private val fractionalRe = "^(-|\\+)?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$"

  /** 0=null 1=boolean 2=integral 3=fractional 4=string, null when filtered out. */
  private def typeIndex: Column = {
    val s = col(column).cast(StringType)
    val idx = when(s.isNull, lit(0))
      .when(s.rlike(booleanRe), lit(1))
      .when(s.rlike(integralRe), lit(2))
      .when(s.rlike(fractionalRe), lit(3))
      .otherwise(lit(4))
    conditionalSelection(idx, where)
  }

  override def aggregationFunctions(): Seq[Column] = {
    val idx = typeIndex
    (0 to 4).map(i => coalesce(sum((idx === lit(i)).cast(LongType)), lit(0L)))
  }

  override def fromAggregationResult(result: Row, offset: Int): Option[DataTypeState] =
    Some(DataTypeState(
      longAt(result, offset), longAt(result, offset + 1), longAt(result, offset + 2),
      longAt(result, offset + 3), longAt(result, offset + 4)))

  override def computeMetricFrom(state: Option[DataTypeState]): HistogramMetric =
    state match {
      case Some(s) =>
        val counts = Seq(s.numNull, s.numBoolean, s.numIntegral, s.numFractional, s.numString)
        val total = math.max(s.total, 1L)
        val dist = Distribution(
          DataTypeInstances.ordered.zip(counts).map { case (k, c) =>
            k -> DistributionValue(c, c.toDouble / total)
          }.toMap,
          numberOfBins = counts.count(_ > 0).toLong)
        HistogramMetric(column, Success(dist))
      case None =>
        HistogramMetric(column, Failure(new EmptyStateException(s"Empty state for DataType $column")))
    }

  override def toFailureMetric(failure: Throwable): HistogramMetric =
    HistogramMetric(column, Failure(MetricCalculationException.wrap(failure)))
}
