package graft.profiles

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.repository.{MetricsRepository, ResultKey}
import graft.sketch.KLLParameters

/** Fluent front-end for [[ColumnProfiler]] (reference capability:
  * profiles/ColumnProfilerRunner.scala + ColumnProfilerRunBuilder.scala).
  *
  * {{{
  * val profiles = ColumnProfilerRunner()
  *   .onData(df)
  *   .restrictToColumns(Seq("price", "category"))
  *   .withKLLProfiling()
  *   .useRepository(repo)
  *   .saveOrAppendResult(ResultKey(now))
  *   .run()
  * }}}
  */
class ColumnProfilerRunner {
  def onData(data: DataFrame): ColumnProfilerRunBuilder = new ColumnProfilerRunBuilder(data)
}

object ColumnProfilerRunner {
  def apply(): ColumnProfilerRunner = new ColumnProfilerRunner()
}

class ColumnProfilerRunBuilder(data: DataFrame) {

  protected var restrictColumns: Option[Seq[String]] = None
  protected var lowCardinalityThreshold: Long = ColumnProfiler.DefaultLowCardinalityThreshold
  protected var kllProfiling: Boolean = false
  protected var kllParams: Option[KLLParameters] = None
  protected var predefined: Map[String, String] = Map.empty
  protected var statusUpdates: Boolean = false
  protected var cacheInputsFlag: Boolean = false
  protected var repository: Option[MetricsRepository] = None
  protected var reuseKey: Option[ResultKey] = None
  protected var failIfResultsMissing: Boolean = false
  protected var saveKey: Option[ResultKey] = None
  protected var profilesJsonPath: Option[String] = None
  protected var sessionForOutput: Option[SparkSession] = None
  protected var overwriteFiles: Boolean = false

  def restrictToColumns(columns: Seq[String]): this.type = {
    restrictColumns = Some(columns); this
  }

  def withLowCardinalityHistogramThreshold(threshold: Long): this.type = {
    lowCardinalityThreshold = threshold; this
  }

  /** Adds a KLL sketch (and a 100-point percentile vector derived from it)
    * to every numeric column's profile; all sketches share one RDD pass.
    */
  def withKLLProfiling(): this.type = { kllProfiling = true; this }

  def setKLLParameters(parameters: KLLParameters): this.type = {
    kllParams = Some(parameters); this
  }

  /** Columns whose semantic type is known up front skip inference — their
    * DataType scan work is dropped from the fused pass entirely. Values are
    * [[graft.operators.DataTypeInstances]] names.
    */
  def setPredefinedTypes(types: Map[String, String]): this.type = {
    predefined = types; this
  }

  def printStatusUpdates(print: Boolean): this.type = { statusUpdates = print; this }

  /** Persist the input for the profiler's (up to) three passes over it. */
  def cacheInputs(cache: Boolean): this.type = { cacheInputsFlag = cache; this }

  def useRepository(repo: MetricsRepository): this.type = { repository = Some(repo); this }

  def reuseExistingResultsForKey(key: ResultKey, failIfResultsMissing: Boolean = false): this.type = {
    reuseKey = Some(key); this.failIfResultsMissing = failIfResultsMissing; this
  }

  def saveOrAppendResult(key: ResultKey): this.type = { saveKey = Some(key); this }

  /** File outputs go through this session's Hadoop filesystem. */
  def useSparkSession(session: SparkSession): this.type = {
    sessionForOutput = Some(session); this
  }

  def overwritePreviousFiles(overwrite: Boolean): this.type = {
    overwriteFiles = overwrite; this
  }

  def saveColumnProfilesJsonToPath(path: String): this.type = {
    profilesJsonPath = Some(path); this
  }

  def run(): ColumnProfiles = {
    val input = if (cacheInputsFlag) data.persist() else data
    try {
      val result = ColumnProfiler.profile(
        input,
        restrictToColumns = restrictColumns,
        lowCardinalityHistogramThreshold = lowCardinalityThreshold,
        kllProfiling = kllProfiling,
        kllParameters = kllParams,
        predefinedTypes = predefined,
        printStatusUpdates = statusUpdates,
        metricsRepository = repository,
        reuseExistingResultsKey = reuseKey,
        failIfResultsMissing = failIfResultsMissing,
        saveOrAppendResultsKey = saveKey)

      profilesJsonPath.foreach { path =>
        val spark = sessionForOutput.getOrElse(data.sparkSession)
        ColumnProfiles.writeJson(spark, path, result, overwriteFiles)
      }
      result
    } finally {
      if (cacheInputsFlag) input.unpersist()
    }
  }
}
