package graft.suggestions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.profiles.{ColumnProfiler, ColumnProfiles}
import graft.repository.{MetricsRepository, ResultKey}
import graft.sketch.KLLParameters

/** Fluent front-end for constraint suggestion (reference capability:
  * suggestions/ConstraintSuggestionRunner.scala +
  * ConstraintSuggestionRunBuilder.scala).
  *
  * {{{
  * val result = ConstraintSuggestionRunner()
  *   .onData(df)
  *   .addConstraintRules(Rules.EXTENDED)
  *   .useTrainTestSplitWithTestsetRatio(0.2)
  *   .saveConstraintSuggestionsJsonToPath("/tmp/suggestions.json")
  *   .run()
  * }}}
  */
class ConstraintSuggestionRunnerFluent {
  def onData(data: DataFrame): ConstraintSuggestionRunBuilder =
    new ConstraintSuggestionRunBuilder(data)
}

class ConstraintSuggestionRunBuilder(data: DataFrame) {
  import ConstraintSuggestionRunner.SuggestionResult

  private var rules: Seq[ConstraintRule] = Seq.empty
  private var restrictColumns: Option[Seq[String]] = None
  private var testsetRatio: Option[Double] = None
  private var testsetSeed: Long = 42L
  private var lowCardinalityThreshold: Long = ColumnProfiler.DefaultLowCardinalityThreshold
  private var kllProfiling: Boolean = false
  private var kllParams: Option[KLLParameters] = None
  private var predefined: Map[String, String] = Map.empty
  private var statusUpdates: Boolean = false
  private var cacheInputsFlag: Boolean = false
  private var repository: Option[MetricsRepository] = None
  private var reuseKey: Option[ResultKey] = None
  private var failIfResultsMissing: Boolean = false
  private var saveKey: Option[ResultKey] = None
  private var suggestionsJsonPath: Option[String] = None
  private var profilesJsonPath: Option[String] = None
  private var evaluationJsonPath: Option[String] = None
  private var sessionForOutput: Option[SparkSession] = None
  private var overwriteFiles: Boolean = false

  def addConstraintRule(rule: ConstraintRule): this.type = { rules = rules :+ rule; this }

  def addConstraintRules(more: Seq[ConstraintRule]): this.type = { rules = rules ++ more; this }

  def restrictToColumns(columns: Seq[String]): this.type = {
    restrictColumns = Some(columns); this
  }

  /** Profile + suggest on a train split, evaluate every evaluable
    * suggestion on the held-out split (one fused pass).
    */
  def useTrainTestSplitWithTestsetRatio(ratio: Double, seed: Long = 42L): this.type = {
    require(ratio > 0.0 && ratio < 1.0, "testsetRatio must be in (0, 1)")
    testsetRatio = Some(ratio); testsetSeed = seed; this
  }

  def withLowCardinalityHistogramThreshold(threshold: Long): this.type = {
    lowCardinalityThreshold = threshold; this
  }

  def withKLLProfiling(): this.type = { kllProfiling = true; this }

  def setKLLParameters(parameters: KLLParameters): this.type = {
    kllParams = Some(parameters); this
  }

  def setPredefinedTypes(types: Map[String, String]): this.type = { predefined = types; this }

  def printStatusUpdates(print: Boolean): this.type = { statusUpdates = print; this }

  def cacheInputs(cache: Boolean): this.type = { cacheInputsFlag = cache; this }

  def useRepository(repo: MetricsRepository): this.type = { repository = Some(repo); this }

  def reuseExistingResultsForKey(key: ResultKey, failIfResultsMissing: Boolean = false): this.type = {
    reuseKey = Some(key); this.failIfResultsMissing = failIfResultsMissing; this
  }

  def saveOrAppendResult(key: ResultKey): this.type = { saveKey = Some(key); this }

  def useSparkSession(session: SparkSession): this.type = {
    sessionForOutput = Some(session); this
  }

  def overwritePreviousFiles(overwrite: Boolean): this.type = {
    overwriteFiles = overwrite; this
  }

  def saveConstraintSuggestionsJsonToPath(path: String): this.type = {
    suggestionsJsonPath = Some(path); this
  }

  def saveColumnProfilesJsonToPath(path: String): this.type = {
    profilesJsonPath = Some(path); this
  }

  def saveEvaluationResultsJsonToPath(path: String): this.type = {
    evaluationJsonPath = Some(path); this
  }

  def run(): SuggestionResult = {
    val appliedRules = if (rules.nonEmpty) rules else Rules.DEFAULT
    val input = if (cacheInputsFlag) data.persist() else data
    try {
      val (train, test) = testsetRatio match {
        case Some(ratio) =>
          val Array(tr, te) = input.randomSplit(Array(1.0 - ratio, ratio), testsetSeed)
          (tr, Some(te))
        case None => (input, None)
      }

      val profiles = ColumnProfiler.profile(
        train,
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

      val suggestions =
        ConstraintSuggestionRunner.suggestionsFromProfiles(profiles, appliedRules)
      val evaluation = ConstraintSuggestionRunner.evaluateHoldout(suggestions, test)
      val result = ConstraintSuggestionRunner.SuggestionResult(profiles, suggestions, evaluation)

      val spark = sessionForOutput.getOrElse(data.sparkSession)
      suggestionsJsonPath.foreach(p => ConstraintSuggestionJson.write(
        spark, p, ConstraintSuggestionJson.suggestionsJson(result), overwriteFiles))
      profilesJsonPath.foreach(p => ColumnProfiles.writeJson(
        spark, p, profiles, overwriteFiles))
      evaluationJsonPath.foreach(p => ConstraintSuggestionJson.write(
        spark, p, ConstraintSuggestionJson.evaluationJson(result), overwriteFiles))
      result
    } finally {
      if (cacheInputsFlag) input.unpersist()
    }
  }
}

/** JSON rendering (reference capability:
  * suggestions/ConstraintSuggestion.scala:57-133 — same field names).
  */
object ConstraintSuggestionJson {
  import ConstraintSuggestionRunner.SuggestionResult

  private def shared(s: ConstraintSuggestion): JObject =
    ("constraint_name" -> s.constraintName) ~
      ("column_name" -> s.columnName) ~
      ("current_value" -> s.currentValue) ~
      ("description" -> s.description) ~
      ("suggesting_rule" -> s.suggestingRule) ~
      ("rule_description" -> s.ruleDescription) ~
      ("code_for_constraint" -> s.codeForConstraint)

  def suggestionsJson(result: SuggestionResult): String = {
    val entries = result.suggestions.toSeq.sortBy(_._1).flatMap(_._2).map(shared)
    JsonMethods.pretty(JsonMethods.render(
      ("constraint_suggestions" -> entries): JObject))
  }

  /** Suggestions plus their held-out status; `Unknown` when no test split
    * ran (reference: ConstraintSuggestions.evaluationsToJson).
    */
  def evaluationJson(result: SuggestionResult): String = {
    val entries = result.suggestions.toSeq.sortBy(_._1).flatMap(_._2).map { s =>
      val status = result.testEvaluation.get(s.codeForConstraint)
        .map(_.toString).getOrElse("Unknown")
      shared(s) ~ ("constraint_result_on_test_set" -> status)
    }
    JsonMethods.pretty(JsonMethods.render(
      ("constraint_suggestions" -> entries): JObject))
  }

  def write(spark: SparkSession, path: String, json: String, overwrite: Boolean): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!overwrite && fs.exists(fsPath)) return
    val out = fs.create(fsPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }
}
