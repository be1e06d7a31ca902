package graft.profiles

import scala.util.Success

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

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
    approxPercentiles: Option[Seq[Double]],
    // reference parity: profiles/ColumnProfile.scala:56-78 carries the
    // full numeric statistics family plus an optional KLL sketch
    kll: Option[graft.sketch.BucketDistribution] = None,
    zerosCount: Option[Long] = None,
    range: Option[Double] = None,
    interquartileRange: Option[Double] = None,
    variance: Option[Double] = None,
    skewness: Option[Double] = None,
    kurtosis: Option[Double] = None) extends ColumnProfile

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

/** JSON rendering of profiles (reference capability:
  * profiles/ColumnProfile.scala:84-210 ColumnProfiles.toJson — same field
  * names; we additionally emit the typeCounts map the reference builds but
  * drops).
  */
object ColumnProfiles {

  def toJson(profiles: Seq[ColumnProfile]): String = {
    val columns = profiles.map { p =>
      val base: JObject =
        ("column" -> p.column) ~
          ("dataType" -> p.dataType) ~
          ("isDataTypeInferred" -> p.isDataTypeInferred.toString) ~
          ("completeness" -> p.completeness) ~
          ("approximateNumDistinctValues" -> p.approximateNumDistinctValues)

      val withTypeCounts =
        if (p.typeCounts.nonEmpty)
          base ~ ("typeCounts" -> p.typeCounts.map { case (k, v) => k -> v.toString })
        else base

      val withHistogram = p.histogram match {
        case Some(h) =>
          withTypeCounts ~ ("histogram" -> h.values.toSeq.map { case (value, dv) =>
            ("value" -> value) ~ ("count" -> dv.absolute) ~ ("ratio" -> dv.ratio)
          })
        case None => withTypeCounts
      }

      p match {
        case n: NumericColumnProfile =>
          var json = withHistogram
          n.zerosCount.foreach(v => json = json ~ ("zerosCount" -> v))
          n.mean.foreach(v => json = json ~ ("mean" -> v))
          n.maximum.foreach(v => json = json ~ ("maximum" -> v))
          n.minimum.foreach(v => json = json ~ ("minimum" -> v))
          n.range.foreach(v => json = json ~ ("range" -> v))
          n.interquartileRange.foreach(v => json = json ~ ("interquartileRange" -> v))
          n.sum.foreach(v => json = json ~ ("sum" -> v))
          n.stdDev.foreach(v => json = json ~ ("stdDev" -> v))
          n.variance.foreach(v => json = json ~ ("variance" -> v))
          n.skewness.foreach(v => json = json ~ ("skewness" -> v))
          n.kurtosis.foreach(v => json = json ~ ("kurtosis" -> v))
          n.kll.foreach { bd =>
            json = json ~ ("kll" ->
              (("buckets" -> bd.buckets.map { b =>
                ("low_value" -> b.lowValue) ~ ("high_value" -> b.highValue) ~
                  ("count" -> b.count)
              }) ~
                ("sketch" ->
                  (("parameters" ->
                    (("c" -> bd.parameters.headOption.getOrElse(0.0)) ~
                      ("k" -> bd.parameters.lift(1).getOrElse(0.0)))) ~
                    ("data" -> JsonMethods.compact(JsonMethods.render(
                      JArray(bd.sketch.data.map(buf =>
                        JArray(buf.map(JDouble(_)).toList)).toList))))))))
          }
          json = json ~ ("approxPercentiles" -> n.approxPercentiles.getOrElse(Seq.empty))
          json
        case s: StringColumnProfile =>
          var json = withHistogram
          s.minLength.foreach(v => json = json ~ ("minLength" -> v))
          s.maxLength.foreach(v => json = json ~ ("maxLength" -> v))
          json
        case _ => withHistogram
      }
    }
    JsonMethods.pretty(JsonMethods.render(("columns" -> columns): JObject))
  }

  def writeJson(spark: SparkSession, path: String, profiles: ColumnProfiles,
      overwrite: Boolean): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!overwrite && fs.exists(fsPath)) return
    val out = fs.create(fsPath, true)
    try out.write(toJson(profiles.profiles.values.toSeq.sortBy(_.column)).getBytes("UTF-8"))
    finally out.close()
  }
}


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
      maxColumnsPerPass: Int = DefaultMaxColumnsPerPass,
      kllProfiling: Boolean = false,
      kllParameters: Option[graft.sketch.KLLParameters] = None,
      predefinedTypes: Map[String, String] = Map.empty,
      printStatusUpdates: Boolean = false,
      metricsRepository: Option[graft.repository.MetricsRepository] = None,
      reuseExistingResultsKey: Option[graft.repository.ResultKey] = None,
      failIfResultsMissing: Boolean = false,
      saveOrAppendResultsKey: Option[graft.repository.ResultKey] = None): ColumnProfiles = {

    def status(msg: => String): Unit = if (printStatusUpdates) println(s"[profiler] $msg")

    // metric reuse: analyzers whose metrics are already stored under the
    // reuse key never touch the data (reference capability:
    // ColumnProfilerRunBuilder.reuseExistingResultsForKey)
    val reusedContext: graft.runners.AnalyzerContext =
      (metricsRepository, reuseExistingResultsKey) match {
        case (Some(repo), Some(key)) =>
          repo.loadByKey(key).getOrElse {
            if (failIfResultsMissing)
              throw new IllegalStateException(s"No stored profiling results for $key")
            graft.runners.AnalyzerContext.empty
          }
        case _ =>
          if (reuseExistingResultsKey.isDefined)
            throw new IllegalStateException(
              "a metricsRepository is required to reuse existing results")
          graft.runners.AnalyzerContext.empty
      }

    // every metric produced (or reused) during profiling, for saveOrAppend
    val allMetrics = scala.collection.concurrent.TrieMap.empty[AnyAnalyzer, Metric[_]]

    def runAnalyzers(df: DataFrame, analyzers: Seq[AnyAnalyzer]): graft.runners.AnalyzerContext = {
      val cached = analyzers.filter(a => reusedContext.metric(a).exists(_.value.isSuccess))
      val computed = AnalysisRunner.run(df, analyzers.filterNot(cached.contains))
      val ctx = graft.runners.AnalyzerContext(
        cached.map(a => (a: AnyAnalyzer) -> reusedContext.metric(a).get).toMap ++
          computed.metricMap)
      allMetrics ++= ctx.metricMap
      ctx
    }

    val columns = restrictToColumns.getOrElse(data.columns.toSeq)
      .filter(c => data.columns.contains(c))
    // an empty effective list (typo'd restriction, empty Seq) must yield
    // empty profiles, not an empty.reduce crash in the chunked pass
    if (columns.isEmpty) return ColumnProfiles(Map.empty, 0L)

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
        Variance(c), Skewness(c), Kurtosis(c), ZerosCount(c),
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
                // predefined types skip inference entirely (reference
                // capability: ColumnProfilerRunBuilder.setPredefinedTypes)
                (if (predefinedTypes.contains(c)) Seq.empty[AnyAnalyzer]
                 else Seq[AnyAnalyzer](DataTypeAnalyzer(c))) ++
                  Seq[AnyAnalyzer](graft.operators.MinLength(c), graft.operators.MaxLength(c))
              else Seq.empty) ++
              (if (declaredNumeric.contains(c)) numericStatsFor(c) else Seq.empty)
          }
        runAnalyzers(data, analyzers)
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
      if (predefinedTypes.contains(c)) {
        val nonNull = math.round(completenessOf(c) * numRecords)
        Map(predefinedTypes(c) -> nonNull, DataTypeInstances.Null -> (numRecords - nonNull))
          .filter(_._2 > 0)
      } else if (declaredString.contains(c)) {
        ctx1.metric(DataTypeAnalyzer(c)) match {
          case Some(HistogramMetric(_, Success(dist))) =>
            // same shape as the synthesized branches: zero-count bins out
            dist.values.map { case (k, v) => k -> v.absolute }.filter(_._2 > 0)
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
      .map(chunk => runAnalyzers(pass2Data, chunk.flatMap(numericStatsFor)))
      .foldLeft(ctx1)((a, b) => graft.runners.AnalyzerContext(a.metricMap ++ b.metricMap))

    val stringColumns = declaredString.filterNot(numericColumns.contains)

    def num(a: AnyAnalyzer): Option[Double] =
      ctx2.metric(a).flatMap(_.value.toOption).collect { case d: Double => d }

    // ---- optional KLL pass: sketches for every numeric column share ONE
    // RDD pass (the runner batches per-column updaters, treeReduce merge) —
    // reference capability: ColumnProfilerRunBuilder.withKLLProfiling +
    // runners/KLLRunner.scala:89-177
    val kllByColumn: Map[String, graft.sketch.BucketDistribution] =
      if (kllProfiling && numericColumns.nonEmpty) {
        status(s"KLL pass over ${numericColumns.size} numeric columns")
        val analyzers = numericColumns.map(c =>
          graft.sketch.KLLSketchAnalyzer(c, kllParameters.getOrElse(graft.sketch.KLLParameters())))
        val ctx = runAnalyzers(pass2Data, analyzers)
        analyzers.flatMap { a =>
          ctx.metric(a).flatMap(_.value.toOption)
            .collect { case bd: graft.sketch.BucketDistribution => a.column -> bd }
        }.toMap
      } else Map.empty

    // ---- pass 3: full histograms for low-cardinality columns. ALL columns
    // share ONE job: each row explodes into (column, value-string) pairs and
    // a single groupBy counts them — K narrow per-column groupBy scans
    // collapse into one scan reading the K columns together. The exploded
    // stream is (rows × K) narrow pairs, hash-reduced map-side to at most
    // K × threshold groups, so the shuffle stays tiny at any scale.
    val histogramColumns = columns.filter { c =>
      approxDistinctOf(c) <= lowCardinalityHistogramThreshold &&
        declaredType(c).forall {
          case _: StructType | _: ArrayType | _: MapType | _: BinaryType => false
          case _ => true
        }
    }
    val histograms: Map[String, Distribution] = {
      val reused = histogramColumns.flatMap { c =>
        reusedContext.metric(Histogram(c)).collect {
          case m if m.value.isSuccess =>
            allMetrics += ((Histogram(c): AnyAnalyzer) -> m)
            m.value.toOption.collect { case d: Distribution => c -> d }
        }.flatten
      }.toMap
      val toCompute = histogramColumns.filterNot(reused.contains)
      val computed: Map[String, Distribution] =
        if (toCompute.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.functions.{
            array, coalesce, count, explode, lit, struct}
          val pairs = toCompute.map { c =>
            struct(lit(c).as("graft_hcol"),
              coalesce(col(c).cast(org.apache.spark.sql.types.StringType),
                lit(Histogram.NullFieldReplacement)).as("graft_hval"))
          }
          val grouped = data
            .select(explode(array(pairs: _*)).as("graft_he"))
            .select(col("graft_he.graft_hcol").as("graft_hcol"),
              col("graft_he.graft_hval").as("graft_hval"))
            .groupBy("graft_hcol", "graft_hval")
            .agg(count(lit(1)).as("graft_hcnt"))
            .collect()
          val denom = math.max(numRecords, 1L)
          grouped.groupBy(_.getString(0)).map { case (c, rows) =>
            val values = rows.map { r =>
              r.getString(1) -> DistributionValue(r.getLong(2), r.getLong(2).toDouble / denom)
            }.toMap
            val dist = Distribution(values, values.size.toLong)
            allMetrics += ((Histogram(c): AnyAnalyzer) ->
              HistogramMetric(c, Success(dist)))
            c -> dist
          }
        }
      reused ++ computed
    }

    val profiles = columns.map { c =>
      val base = (completenessOf(c), approxDistinctOf(c), typeCountsOf(c), histograms.get(c))
      val profile: ColumnProfile =
        if (numericColumns.contains(c)) {
          val inferred = !isNumericDeclared(c)
          val quantileMap = ctx2.metric(ApproxQuantiles(c, Seq(0.25, 0.5, 0.75)))
            .flatMap(_.value.toOption)
            .map(_.asInstanceOf[Map[String, Double]])
          // when KLL profiling is on, the percentile vector comes from the
          // sketch (reference: ColumnProfiler.scala:638-645 computes 100
          // percentiles from the KLL); otherwise the fused-scan quartiles
          val quantiles = kllByColumn.get(c)
            .map(bd => (1 to 100).map(i => bd.sketch.quantile(i / 100.0)).sorted: Seq[Double])
            .orElse(quantileMap.map(m => Seq(m("0.25"), m("0.5"), m("0.75"))))
          val minV = num(Minimum(c))
          val maxV = num(Maximum(c))
          NumericColumnProfile(c, base._1, base._2,
            if (inferred) inferredType(c)
            else declaredType(c).map(_.simpleString).getOrElse("unknown"),
            isDataTypeInferred = inferred, base._3, base._4,
            mean = num(Mean(c)), maximum = maxV, minimum = minV,
            sum = num(Sum(c)), stdDev = num(StandardDeviation(c)),
            approxPercentiles = quantiles,
            kll = kllByColumn.get(c),
            zerosCount = num(ZerosCount(c)).map(_.toLong),
            range = for (mx <- maxV; mn <- minV) yield mx - mn,
            // approx IQR from the fused-scan quartiles: scale-safe where the
            // reference buffers every value via the exact `percentile`
            // built-in (analyzers/InterquartileRange.scala:63-69)
            interquartileRange = quantileMap.map(m => m("0.75") - m("0.25")),
            variance = num(Variance(c)),
            skewness = num(Skewness(c)),
            kurtosis = num(Kurtosis(c)))
        } else if (declaredType(c).contains(StringType)) {
          StringColumnProfile(c, base._1, base._2, inferredType(c),
            // a user-declared type (setPredefinedTypes) was NOT inferred
            isDataTypeInferred = !predefinedTypes.contains(c), base._3, base._4,
            minLength = num(graft.operators.MinLength(c)), maxLength = num(graft.operators.MaxLength(c)))
        } else {
          StandardColumnProfile(c, base._1, base._2,
            declaredType(c).map(_.simpleString).getOrElse("unknown"),
            isDataTypeInferred = false, base._3, base._4)
        }
      c -> profile
    }.toMap

    // saveOrAppend: merge with anything already stored under the key, new
    // metrics win (reference capability:
    // ColumnProfilerRunBuilder.saveOrAppendResult)
    for {
      repo <- metricsRepository
      key <- saveOrAppendResultsKey
    } {
      val existing = repo.loadByKey(key).map(_.metricMap).getOrElse(Map.empty)
      repo.save(key, graft.runners.AnalyzerContext(existing ++ allMetrics.toMap))
    }

    ColumnProfiles(profiles, numRecords)
  }
}
