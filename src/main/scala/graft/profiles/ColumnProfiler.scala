package graft.profiles

import scala.util.Success

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core._
import graft.operators._
import graft.runners.AnalysisRunner

/** Per-column profile (reference capability: profiles/ColumnProfile.scala). */
sealed trait ColumnProfile {
  def column: String
  def completeness: Double
  def approximateNumDistinctValues: Long
  def dataType: String
  def isDataTypeInferred: Boolean
  def typeCounts: Map[String, Long]
  def histogram: Option[Distribution]
}

case class StandardColumnProfile(
    column: String,
    completeness: Double,
    approximateNumDistinctValues: Long,
    dataType: String,
    isDataTypeInferred: Boolean,
    typeCounts: Map[String, Long],
    histogram: Option[Distribution]) extends ColumnProfile

case class NumericColumnProfile(
    column: String,
    completeness: Double,
    approximateNumDistinctValues: Long,
    dataType: String,
    isDataTypeInferred: Boolean,
    typeCounts: Map[String, Long],
    histogram: Option[Distribution],
    mean: Option[Double],
    maximum: Option[Double],
    minimum: Option[Double],
    sum: Option[Double],
    stdDev: Option[Double],
    approxPercentiles: Option[Seq[Double]]) extends ColumnProfile

/** String-typed (non-numeric-inferred) columns additionally carry observed
  * value-length bounds (reference capability: profiles/StringColumnProfile,
  * consumed by the HasMinLength/HasMaxLength suggestion rules).
  */
case class StringColumnProfile(
    column: String,
    completeness: Double,
    approximateNumDistinctValues: Long,
    dataType: String,
    isDataTypeInferred: Boolean,
    typeCounts: Map[String, Long],
    histogram: Option[Distribution],
    minLength: Option[Double],
    maxLength: Option[Double]) extends ColumnProfile

case class ColumnProfiles(profiles: Map[String, ColumnProfile], numRecords: Long)

/** Fused-pass profiler (reference capability:
  * profiles/ColumnProfiler.scala:101,124-245):
  * pass 1 computes generic stats for every column AND numeric/length
  * stats for declared-numeric/string columns in ONE fused scan — only
  * string columns whose values turn out to be numeric (known only after
  * pass-1 type inference) need a second, usually empty, cast pass. Type
  * inference runs only where it means something (string columns); declared
  * types synthesize their counts for free. Pass 3 computes full
  * histograms only for low-cardinality columns, submitting the per-column
  * groupBy jobs CONCURRENTLY (independent Spark jobs share the executors;
  * wall time is the slowest column, not the sum).
  * At 100 TB this is 1 full scan + K small parallel groupBys (+1 scan
  * only when inferred-numeric string columns exist).
  */
object ColumnProfiler {

  val DefaultLowCardinalityThreshold = 120L

  /** Cap on columns fused into one aggregation pass. A 1000-column table
    * would otherwise build a single agg with ~9000 expressions — far past
    * whole-stage codegen's method/constant-pool limits, degrading the whole
    * pass to interpreted mode (or failing planning). Chunking keeps every
    * pass codegen'd; wide tables cost ceil(W / cap) scans instead of one
    * giant interpreted scan.
    */
  val DefaultMaxColumnsPerPass = 100

  def profile(
      data: DataFrame,
      restrictToColumns: Option[Seq[String]] = None,
      lowCardinalityHistogramThreshold: Long = DefaultLowCardinalityThreshold,
      maxColumnsPerPass: Int = DefaultMaxColumnsPerPass): ColumnProfiles = {

    val columns = restrictToColumns.getOrElse(data.columns.toSeq)
      .filter(c => data.columns.contains(c))

    def declaredType(c: String): Option[DataType] =
      data.schema.fields.find(_.name == c).map(_.dataType)

    def isNumericDeclared(c: String): Boolean = declaredType(c).exists {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }

    val declaredNumeric = columns.filter(isNumericDeclared)
    val declaredString = columns.filter(c => declaredType(c).contains(StringType))

    def numericStatsFor(c: String): Seq[AnyAnalyzer] =
      Seq[AnyAnalyzer](Minimum(c), Maximum(c), Mean(c), Sum(c), StandardDeviation(c),
        ApproxQuantiles(c, Seq(0.25, 0.5, 0.75)))

    // ---- pass 1 (ONE fused scan): size + per-column completeness and
    // approx distinct for everything, type inference ONLY for string
    // columns (declared types are already known), numeric stats for
    // declared-numeric columns, length bounds for string columns
    val ctx1 = columns.grouped(math.max(maxColumnsPerPass, 1)).zipWithIndex
      .map { case (chunk, i) =>
        val analyzers: Seq[AnyAnalyzer] =
          (if (i == 0) Seq[AnyAnalyzer](Size()) else Seq.empty) ++ chunk.flatMap { c =>
            Seq[AnyAnalyzer](Completeness(c), ApproxCountDistinct(c)) ++
              (if (declaredString.contains(c))
                Seq[AnyAnalyzer](DataTypeAnalyzer(c),
                  graft.operators.MinLength(c), graft.operators.MaxLength(c))
              else Seq.empty) ++
              (if (declaredNumeric.contains(c)) numericStatsFor(c) else Seq.empty)
          }
        AnalysisRunner.run(data, analyzers)
      }
      .reduce((a, b) => graft.runners.AnalyzerContext(a.metricMap ++ b.metricMap))

    val numRecords = ctx1.metric(Size()).flatMap(_.value.toOption)
      .map(_.asInstanceOf[Double].toLong).getOrElse(0L)

    def completenessOf(c: String): Double =
      ctx1.metric(Completeness(c)).flatMap(_.value.toOption)
        .map(_.asInstanceOf[Double]).getOrElse(0.0)

    def approxDistinctOf(c: String): Long =
      ctx1.metric(ApproxCountDistinct(c)).flatMap(_.value.toOption)
        .map(_.asInstanceOf[Double].toLong).getOrElse(0L)

    /** Observed counts for string columns; synthesized from the declared
      * type + completeness for everything else (no scan work needed to
      * "infer" what the schema already states).
      */
    def typeCountsOf(c: String): Map[String, Long] =
      if (declaredString.contains(c)) {
        ctx1.metric(DataTypeAnalyzer(c)) match {
          case Some(HistogramMetric(_, Success(dist))) =>
            dist.values.map { case (k, v) => k -> v.absolute }
          case _ => Map.empty
        }
      } else {
        val nonNull = math.round(completenessOf(c) * numRecords)
        val kind = declaredType(c) match {
          case Some(ByteType | ShortType | IntegerType | LongType) => DataTypeInstances.Integral
          case Some(FloatType | DoubleType) | Some(_: DecimalType) => DataTypeInstances.Fractional
          case Some(BooleanType) => DataTypeInstances.Boolean
          case _ => DataTypeInstances.String
        }
        Map(kind -> nonNull, DataTypeInstances.Null -> (numRecords - nonNull))
          .filter(_._2 > 0)
      }

    /** Inferred semantic type for string columns, by majority of non-null counts. */
    def inferredType(c: String): String = {
      val counts = typeCountsOf(c) - DataTypeInstances.Null
      val nonZero = counts.filter(_._2 > 0)
      if (nonZero.isEmpty) DataTypeInstances.String
      else if (nonZero.keySet == Set(DataTypeInstances.Integral)) DataTypeInstances.Integral
      else if (nonZero.keySet.subsetOf(Set(DataTypeInstances.Integral, DataTypeInstances.Fractional)))
        DataTypeInstances.Fractional
      else if (nonZero.keySet == Set(DataTypeInstances.Boolean)) DataTypeInstances.Boolean
      else DataTypeInstances.String
    }

    // ---- pass 2 (usually skipped): numeric statistics for string columns
    // whose values turned out numeric — known only after pass-1 inference
    // (reference: profiles/ColumnProfiler.scala pass 2 casts
    // inferred-numeric columns)
    val inferredNumeric = columns.filter { c =>
      !isNumericDeclared(c) && declaredType(c).contains(StringType) &&
        Set(DataTypeInstances.Integral, DataTypeInstances.Fractional).contains(inferredType(c))
    }
    val numericColumns = declaredNumeric ++ inferredNumeric
    val pass2Data = inferredNumeric.foldLeft(data) { (d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.col(c).cast(DoubleType))
    }
    val ctx2 = inferredNumeric.grouped(math.max(maxColumnsPerPass, 1))
      .map(chunk => AnalysisRunner.run(pass2Data, chunk.flatMap(numericStatsFor)))
      .foldLeft(ctx1)((a, b) => graft.runners.AnalyzerContext(a.metricMap ++ b.metricMap))

    val stringColumns = declaredString.filterNot(numericColumns.contains)

    def num(a: AnyAnalyzer): Option[Double] =
      ctx2.metric(a).flatMap(_.value.toOption).collect { case d: Double => d }

    // ---- pass 3: full histograms for low-cardinality columns; the
    // per-column groupBy jobs are independent — submit them concurrently
    // and let the scheduler share the executors
    val histogramColumns = columns.filter { c =>
      approxDistinctOf(c) <= lowCardinalityHistogramThreshold &&
        declaredType(c).forall {
          case _: StructType | _: ArrayType | _: MapType | _: BinaryType => false
          case _ => true
        }
    }
    val histograms: Map[String, Distribution] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val futures = histogramColumns.map(c =>
        Future(Histogram(c).calculate(data).value.toOption.map(c -> _)))
      futures.flatMap(f => Await.result(f, Duration.Inf)).toMap
    }

    val profiles = columns.map { c =>
      val base = (completenessOf(c), approxDistinctOf(c), typeCountsOf(c), histograms.get(c))
      val profile: ColumnProfile =
        if (numericColumns.contains(c)) {
          val inferred = !isNumericDeclared(c)
          val quantiles = ctx2.metric(ApproxQuantiles(c, Seq(0.25, 0.5, 0.75)))
            .flatMap(_.value.toOption)
            .map(_.asInstanceOf[Map[String, Double]])
            .map(m => Seq(m("0.25"), m("0.5"), m("0.75")))
          NumericColumnProfile(c, base._1, base._2,
            if (inferred) inferredType(c)
            else declaredType(c).map(_.simpleString).getOrElse("unknown"),
            isDataTypeInferred = inferred, base._3, base._4,
            mean = num(Mean(c)), maximum = num(Maximum(c)), minimum = num(Minimum(c)),
            sum = num(Sum(c)), stdDev = num(StandardDeviation(c)),
            approxPercentiles = quantiles)
        } else if (declaredType(c).contains(StringType)) {
          StringColumnProfile(c, base._1, base._2, inferredType(c),
            isDataTypeInferred = true, base._3, base._4,
            minLength = num(graft.operators.MinLength(c)), maxLength = num(graft.operators.MaxLength(c)))
        } else {
          StandardColumnProfile(c, base._1, base._2,
            declaredType(c).map(_.simpleString).getOrElse("unknown"),
            isDataTypeInferred = false, base._3, base._4)
        }
      c -> profile
    }.toMap

    ColumnProfiles(profiles, numRecords)
  }
}
