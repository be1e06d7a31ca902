package graft.core

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** An analyzer distills a DataFrame into a mergeable [[State]] and renders
  * a [[Metric]] from it (reference capability: analyzers/Analyzer.scala:66-189).
  *
  * The two-phase split (state vs metric) is what enables scan fusion,
  * incremental computation and state persistence: states are cheap rows or
  * small byte arrays; the 100 TB scan happens at most once.
  */
trait Analyzer[S <: State[_], +M <: Metric[_]] {

  /** Metric name, e.g. "Completeness". */
  def name: String

  /** Metric entity (Dataset / Column / Multicolumn). */
  def entity: Entity

  /** Metric instance, e.g. the column name or "*". */
  def instance: String

  /** Schema assertions evaluated driver-side before any job runs. */
  def preconditions: Seq[StructType => Unit] = Seq.empty

  /** Runs the (usually aggregating) computation on the data. */
  def computeStateFrom(data: DataFrame): Option[S]

  /** Renders the metric from a state (None = empty data / nothing to say). */
  def computeMetricFrom(state: Option[S]): M

  def toFailureMetric(failure: Throwable): M

  /** Full, standalone computation: preconditions, state, metric. Only
    * NonFatal errors become failure metrics — an OutOfMemoryError or
    * LinkageError must surface, not masquerade as a failed check in a
    * possibly-corrupted JVM (the reference catches Exception, same idea).
    */
  def calculate(data: DataFrame): M = {
    try {
      preconditions.foreach(_(data.schema))
      computeMetricFrom(computeStateFrom(data))
    } catch {
      case scala.util.control.NonFatal(e) => toFailureMetric(e)
    }
  }
}

/** Analyzer whose state is one or more aggregation expressions, fused by
  * the runner into a single wide `df.agg(...)` together with all other
  * scan-shareable analyzers (reference capability:
  * analyzers/Analyzer.scala:193-220, runners/AnalysisRunner.scala:350-380).
  */
trait ScanShareableAnalyzer[S <: State[_], +M <: Metric[_]] extends Analyzer[S, M] {

  /** Aggregation expressions contributed to the fused scan. */
  def aggregationFunctions(): Seq[Column]

  /** Decodes this analyzer's slice of the single fused result row. */
  def fromAggregationResult(result: Row, offset: Int): Option[S]

  override def computeStateFrom(data: DataFrame): Option[S] = {
    val aggs = aggregationFunctions()
    val row = data.agg(aggs.head, aggs.tail: _*).collect().head
    fromAggregationResult(row, 0)
  }

  /** Metric straight from an already-collected fused row. */
  private[graft] def metricFromAggregationResult(result: Row, offset: Int): M =
    computeMetricFrom(fromAggregationResult(result, offset))
}

/** Convenience base for analyzers producing a DoubleMetric from a
  * DoubleValuedState.
  */
abstract class DoubleResultScanAnalyzer[S <: State[_]](
    analyzerName: String,
    metricInstance: String,
    metricEntity: Entity = Entity.Column
) extends ScanShareableAnalyzer[S, DoubleMetric] {

  def name: String = analyzerName
  def instance: String = metricInstance
  def entity: Entity = metricEntity

  /** Renders the metric value from a non-empty state. */
  protected def valueFromState(state: S): Double

  override def computeMetricFrom(state: Option[S]): DoubleMetric = state match {
    case Some(s) =>
      DoubleMetric(entity, name, instance, Success(valueFromState(s)), fullColumn)
    case None =>
      DoubleMetric(entity, name, instance,
        Failure(new EmptyStateException(
          s"Empty state for analyzer $name $instance, all input values were NULL.")),
        fullColumn)
  }

  override def toFailureMetric(failure: Throwable): DoubleMetric =
    Metric.failed(entity, name, instance, failure)

  /** Per-row outcome expression, if this analyzer supports row-level results. */
  def fullColumn: Option[Column] = None
}

/** Base for analyzers whose state already knows its metric value. */
abstract class StandardScanShareableAnalyzer[S <: DoubleValuedState[S]](
    analyzerName: String,
    metricInstance: String,
    metricEntity: Entity = Entity.Column
) extends DoubleResultScanAnalyzer[S](analyzerName, metricInstance, metricEntity) {
  override protected def valueFromState(state: S): Double = state.metricValue()
}

// ---------------------------------------------------------------------------
// Preconditions — driver-side schema assertions
// (reference capability: analyzers/Analyzer.scala:333-444)
// ---------------------------------------------------------------------------

class NoSuchColumnException(message: String) extends MetricCalculationException(message)
class WrongColumnTypeException(message: String) extends MetricCalculationException(message)
class NumberOfSpecifiedColumnsException(message: String) extends MetricCalculationException(message)

object Preconditions {

  private def find(schema: StructType, column: String): Option[StructField] = {
    // honour spark.sql.caseSensitive=false default
    schema.fields.find(_.name == column)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(column)))
  }

  def hasColumn(column: String): StructType => Unit = { schema =>
    if (find(schema, column).isEmpty) {
      throw new NoSuchColumnException(s"Input data does not include column $column!")
    }
  }

  def isNumeric(column: String): StructType => Unit = { schema =>
    find(schema, column).foreach { f =>
      val ok = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
        case _: DecimalType => true
        case _ => false
      }
      if (!ok) {
        throw new WrongColumnTypeException(
          s"Expected type of column $column to be one of the numeric types, but found ${f.dataType}!")
      }
    }
  }

  def isString(column: String): StructType => Unit = { schema =>
    find(schema, column).foreach { f =>
      if (f.dataType != StringType) {
        throw new WrongColumnTypeException(
          s"Expected type of column $column to be StringType, but found ${f.dataType}!")
      }
    }
  }

  def isNotNested(column: String): StructType => Unit = { schema =>
    find(schema, column).foreach { f =>
      f.dataType match {
        case _: StructType | _: MapType | _: ArrayType =>
          throw new WrongColumnTypeException(
            s"Unsupported nested column type of column $column: ${f.dataType}!")
        case _ => ()
      }
    }
  }

  def atLeastOne(columns: Seq[String]): StructType => Unit = { _ =>
    if (columns.isEmpty) {
      throw new NumberOfSpecifiedColumnsException("At least one column needs to be specified!")
    }
  }

  def exactlyNColumns(columns: Seq[String], n: Int): StructType => Unit = { _ =>
    if (columns.size != n) {
      throw new NumberOfSpecifiedColumnsException(
        s"$n columns have to be specified! Currently, columns contains only ${columns.size} column(s): ${columns.mkString(",")}!")
    }
  }
}

// ---------------------------------------------------------------------------
// Conditional aggregation helpers: WHERE folded into the aggregation
// expressions (never df.filter) so one scan serves differently-filtered
// analyzers (reference capability: analyzers/Analyzer.scala:494-567).
// ---------------------------------------------------------------------------

object Analyzers {

  def conditionalSelection(selection: Column, where: Option[String]): Column =
    where.map(w => when(expr(w), selection)).getOrElse(selection)

  def conditionalSelection(selection: String, where: Option[String]): Column =
    conditionalSelection(col(selection), where)

  /** COUNT(*) respecting an optional WHERE, as an aggregation expression. */
  def conditionalCount(where: Option[String]): Column =
    where
      .map(w => coalesce(sum(when(expr(w), lit(1L)).otherwise(lit(0L))), lit(0L)))
      .getOrElse(count(lit(1)))

  def ifNotNull(result: Row, offset: Int)(f: Row => Double): Option[Double] =
    if (result.isNullAt(offset)) None else Some(f(result))

  def doubleAt(result: Row, offset: Int): Option[Double] =
    if (result.isNullAt(offset)) None
    else Some(result.get(offset) match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: scala.math.BigDecimal => d.doubleValue
      case other => other.toString.toDouble
    })

  def longAt(result: Row, offset: Int): Long =
    if (result.isNullAt(offset)) 0L else result.getLong(offset)
}
