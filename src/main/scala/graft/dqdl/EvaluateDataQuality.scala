package graft.dqdl

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.checks._
import graft.comparison.{DatasetMatch, ReferentialIntegrity, RowCountMatch, SchemaMatch}
import graft.core._
import graft.operators._
import graft.runners.AnalysisRunner
import DqdlParser._

/** DQDL-style ruleset execution: string ruleset in, outcome DataFrame out
  * (reference capability: dqdl/EvaluateDataQuality.scala:48-96,
  * dqdl/translation/DQDLRuleTranslator.scala:69-95).
  *
  * All constraint-backed rules across ALL rules in the ruleset share one
  * fused analysis run (scan sharing + grouping fusion), exactly like
  * checks do — a ruleset of 20 rules is still one pass over the data.
  */
object EvaluateDataQuality {

  case class RuleOutcome(
      rule: String,
      passed: Boolean,
      failureReason: Option[String],
      evaluatedValue: Option[Double])

  /** One evaluated leaf: constraints to check (all must pass) and/or an
    * eagerly computed outcome for rules that need a second dataset or
    * driver-side logic.
    */
  private sealed trait CompiledRule
  private case class ConstraintRule(rendered: String, constraints: Seq[Constraint])
      extends CompiledRule
  private case class ImmediateRule(rendered: String, outcome: () => RuleOutcome)
      extends CompiledRule
  private case class CompositeCompiled(op: String, left: CompiledRule, right: CompiledRule)
      extends CompiledRule

  private class DqdlTranslationException(message: String)
      extends IllegalArgumentException(message)

  // -------------------------------------------------------------------------
  // public API
  // -------------------------------------------------------------------------

  /** Evaluates the ruleset; returns one row per rule:
    * (rule, outcome, failure_reason, evaluated_value).
    *
    * `repository` feeds dynamic thresholds (`avg(last(10)) * 0.9`-style)
    * with per-analyzer metric history; `saveResultsKey` appends this run's
    * metrics back to the repository afterwards, so consecutive runs build
    * the history the dynamic rules consume.
    */
  def process(
      data: DataFrame,
      ruleset: String,
      additionalSources: Map[String, DataFrame] = Map.empty,
      repository: Option[graft.repository.MetricsRepository] = None,
      saveResultsKey: Option[graft.repository.ResultKey] = None): DataFrame = {
    val spark = data.sparkSession
    data.createOrReplaceTempView("primary") // CustomSql rules refer to `primary`
    additionalSources.foreach { case (name, df) => df.createOrReplaceTempView(name) }

    val doc = DqdlParser.parseDocument(ruleset)
    // ONE history load shared by every dynamic rule in the ruleset (a
    // per-rule repo.load() would rescan the metrics store N times)
    val history: Option[AnyAnalyzer => Seq[Double]] = repository.map { repo =>
      lazy val results = repo.load().get().sortBy(_.resultKey.dataSetDate)
      (a: AnyAnalyzer) => results.flatMap { r =>
        r.analyzerContext.metric(a) match {
          case Some(DoubleMetric(_, _, _, Success(v), _)) => Some(v)
          case _ => None
        }
      }
    }
    val compiled = doc.rules.map(r => compile(r, data, additionalSources, history))

    // one fused run over every constraint-backed analyzer in the ruleset,
    // including the compute-only Analyzers section (shared scan)
    val analyzers =
      (collectAnalyzers(compiled) ++ doc.analyzers.map(analyzerFor)).distinct
    val ctx = AnalysisRunner.run(data, analyzers)
    for (repo <- repository; key <- saveResultsKey) repo.save(key, ctx)

    val outcomes = compiled.map(evaluate(_, ctx))
    val rows = outcomes.map { o =>
      Row(o.rule, if (o.passed) "Passed" else "Failed",
        o.failureReason.orNull, o.evaluatedValue.map(Double.box).orNull)
    }
    val schema = StructType(Seq(
      StructField("rule", StringType, nullable = false),
      StructField("outcome", StringType, nullable = false),
      StructField("failure_reason", StringType, nullable = true),
      StructField("evaluated_value", DoubleType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** Row-level flavor: the input data plus one boolean outcome column per
    * row-level-able rule (reference dqdl/EvaluateDataQuality.scala:80-96).
    */
  def processRows(
      data: DataFrame,
      ruleset: String,
      additionalSources: Map[String, DataFrame] = Map.empty): DataFrame = {
    data.createOrReplaceTempView("primary")
    additionalSources.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val rules = parse(ruleset)
    val checks = rules.flatMap { rule =>
      compile(rule, data, additionalSources, None) match {
        case ConstraintRule(rendered, cs) =>
          Some(Check(CheckLevel.Error, rendered, cs))
        case _ => None // two-source / driver-side rules have no row-level form
      }
    }
    val result = VerificationSuite().onData(data).addChecks(checks).run()
    VerificationResult.rowLevelResultsAsDataFrame(data.sparkSession, result, data)
  }

  // -------------------------------------------------------------------------
  // compilation: DqRule -> constraints or immediate evaluation
  // -------------------------------------------------------------------------

  private def collectAnalyzers(compiled: Seq[CompiledRule]): Seq[AnyAnalyzer] =
    compiled.flatMap {
      case ConstraintRule(_, cs) => cs.map(_.analyzer)
      case CompositeCompiled(_, l, r) => collectAnalyzers(Seq(l, r))
      case _: ImmediateRule => Nil
    }

  private def evaluate(compiled: CompiledRule,
      ctx: graft.runners.AnalyzerContext): RuleOutcome = compiled match {
    case ConstraintRule(rendered, constraints) =>
      val results = constraints.map(_.evaluate(ctx.metricMap))
      val failed = results.filter(_.status == ConstraintStatus.Failure)
      val value = results.headOption.flatMap(_.metric).flatMap {
        case DoubleMetric(_, _, _, Success(v), _) => Some(v)
        case _ => None
      }
      RuleOutcome(rendered, failed.isEmpty,
        if (failed.isEmpty) None else Some(failed.flatMap(_.message).mkString("; ")),
        value)
    case ImmediateRule(_, outcome) => outcome()
    case CompositeCompiled(op, l, r) =>
      val lo = evaluate(l, ctx)
      val ro = evaluate(r, ctx)
      val passed = if (op == "and") lo.passed && ro.passed else lo.passed || ro.passed
      RuleOutcome(s"(${lo.rule}) $op (${ro.rule})", passed,
        if (passed) None
        else Some(Seq(lo, ro).filter(!_.passed).flatMap(_.failureReason).mkString("; ")),
        None)
  }

  private def compile(rule: DqRule, data: DataFrame,
      sources: Map[String, DataFrame],
      history: Option[AnyAnalyzer => Seq[Double]]): CompiledRule = rule match {
    case CompositeRule(op, l, r) =>
      CompositeCompiled(op,
        compile(l, data, sources, history), compile(r, data, sources, history))
    case leaf: LeafRule =>
      try compileLeaf(leaf, data, sources, history)
      catch {
        // any rule-local compile failure — unresolvable dynamic threshold
        // (empty history, non-finite expression), malformed regex, missing
        // parameter/source, unsupported condition — fails THIS rule with
        // its reason instead of aborting the whole ruleset, so the valid
        // rules still produce outcomes. Reference behavior: the single
        // rule is marked failed (dqdl/execution/DQDLExecutor.scala)
        case e @ (_: DqdlParseException | _: DqdlTranslationException |
            _: java.util.regex.PatternSyntaxException) =>
          val rendered = leaf.render
          val reason = Option(e.getMessage).getOrElse(e.toString)
          ImmediateRule(rendered,
            () => RuleOutcome(rendered, passed = false, Some(reason), None))
      }
  }

  /** Metrics for the compute-only `Analyzers = [...]` section: one row per
    * successful metric (name, instance, value), computed in the same fused
    * scan style as rules.
    */
  def analyzerMetrics(
      data: DataFrame,
      ruleset: String,
      additionalSources: Map[String, DataFrame] = Map.empty): DataFrame = {
    val spark = data.sparkSession
    data.createOrReplaceTempView("primary")
    additionalSources.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val doc = DqdlParser.parseDocument(ruleset)
    val analyzers = doc.analyzers.map(analyzerFor).distinct
    val ctx = AnalysisRunner.run(data, analyzers)
    val rows = ctx.metricMap.toSeq.collect {
      case (_, DoubleMetric(_, name, instance, Success(v), _)) => Row(name, instance, v)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("instance", StringType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
  }

  /** Quantile parameter of the from-state quantile rules — a quoted
    * number in [0, 1] (DQDL parameters are strings).
    */
  private def parseQuantile(s: String): Double = {
    val q = try s.toDouble catch {
      case _: NumberFormatException => throw new DqdlTranslationException(
        s"quantile parameter must be a number in [0, 1], got '$s'")
    }
    if (q < 0.0 || q > 1.0) throw new DqdlTranslationException(
      s"quantile parameter must be in [0, 1], got '$s'")
    q
  }

  /** Analyzer for a compute-only declaration (no condition). */
  private def analyzerFor(leaf: LeafRule): AnyAnalyzer = {
    // an assertion on an Analyzers entry would evaluate NOWHERE — the
    // user believes a check ran; reject instead of silently dropping it
    if (leaf.condition.isDefined || leaf.threshold.isDefined) {
      throw new DqdlTranslationException(
        s"Analyzers section entries are compute-only; move '${leaf.render}' " +
          "to the Rules section to assert it")
    }
    def param(i: Int): String =
      if (leaf.parameters.length > i) leaf.parameters(i)
      else throw new DqdlTranslationException(
        s"Analyzer ${leaf.ruleType} requires at least ${i + 1} parameter(s)")
    val where = leaf.whereClause
    // same invariant as the rules path: silently ignoring a parsed filter
    // on a WHERE-less analyzer would report wrong metrics
    def rejectWhere(): Unit =
      if (where.isDefined) throw new DqdlTranslationException(
        s"Analyzer ${leaf.ruleType} does not support a where clause")
    leaf.ruleType.toLowerCase match {
      case "rowcount" => Size(where)
      case "completeness" => Completeness(param(0), where)
      case "uniqueness" => Uniqueness(leaf.parameters, where)
      case "uniquevalueratio" => UniqueValueRatio(leaf.parameters, where)
      case "distinctvaluescount" => rejectWhere(); CountDistinct(leaf.parameters)
      case "entropy" => Entropy(param(0), where)
      case "mean" => Mean(param(0), where)
      case "sum" => Sum(param(0), where)
      case "standarddeviation" => StandardDeviation(param(0), where)
      case "variance" => Variance(param(0), where)
      case "skewness" => Skewness(param(0), where)
      case "kurtosis" => Kurtosis(param(0), where)
      case "interquartilerange" => InterquartileRange(param(0), where)
      case "zeroscount" => ZerosCount(param(0), where)
      case "duplicaterowcount" => DuplicateRowCount(leaf.parameters, where)
      case "columncorrelation" => Correlation(param(0), param(1), where)
      case "columncount" => rejectWhere(); ColumnCount()
      case "customsql" => rejectWhere(); CustomSql(param(0))
      case "approxcountdistinctfromstate" =>
        ApproxCountDistinctFromState(param(0), where)
      case "snapshotoverlap" =>
        rejectWhere(); SnapshotOverlap(param(0), param(1))
      case "approxquantilefromstate" =>
        ApproxQuantileFromState(param(0), parseQuantile(param(1)), where)
      case "approxitemfrequencyfromstate" =>
        ApproxItemFrequencyFromState(param(0), param(1), where)
      case "itemfrequencydrift" =>
        rejectWhere(); ItemFrequencyDrift(param(0), param(1))
      case "quantileshift" =>
        rejectWhere(); QuantileShift(param(0), param(1), parseQuantile(param(2)))
      case "distinctcountratio" =>
        rejectWhere(); DistinctCountRatio(param(0), param(1))
      case "manifestparity" =>
        rejectWhere(); ManifestParity(param(0), param(1))
      case "cellpopulationdrift" =>
        rejectWhere(); CellPopulationDrift(param(0), param(1), param(2))
      case other =>
        throw new DqdlTranslationException(s"Unknown analyzer type '$other'")
    }
  }

  private def source(sources: Map[String, DataFrame], name: String): DataFrame =
    sources.getOrElse(name, throw new DqdlTranslationException(
      s"Rule references unknown data source '$name'; pass it in additionalSources"))

  private def compileLeaf(rule: LeafRule, data: DataFrame,
      sources: Map[String, DataFrame],
      history: Option[AnyAnalyzer => Seq[Double]]): CompiledRule = {
    val rendered = rule.render
    val where = rule.whereClause

    // dynamic thresholds resolve against THIS analyzer's metric history
    // (oldest first) from the repository, at compile time — before the
    // fused run, exactly like the reference's dynamic-rule translation
    def resolvedCondition(a: AnyAnalyzer): Option[DqCondition] = rule.condition.map {
      case d @ (_: DynamicNumericCondition | _: DynamicBetweenCondition) =>
        val h = history.getOrElse(throw new DqdlTranslationException(
          s"Rule '$rendered' uses a dynamic threshold; pass a MetricsRepository"))
        DqdlParser.resolveDynamic(d, h(a))
      case c => c
    }

    def numericFor(a: AnyAnalyzer): Double => Boolean = resolvedCondition(a) match {
      case Some(c) => DqdlParser.assertion(c)
      case None => throw new DqdlTranslationException(
        s"Rule ${rule.ruleType} requires a numeric condition")
    }

    def numeric: Double => Boolean = rule.condition match {
      case Some(c) => DqdlParser.assertion(c)
      case None => throw new DqdlTranslationException(
        s"Rule ${rule.ruleType} requires a numeric condition")
    }
    def param(i: Int): String =
      if (rule.parameters.length > i) rule.parameters(i)
      else throw new DqdlTranslationException(
        s"Rule ${rule.ruleType} requires at least ${i + 1} parameter(s)")
    def thresholdAssertion: Double => Boolean = rule.threshold match {
      case Some(t) => DqdlParser.assertion(t)
      case None => (d: Double) => d == 1.0
    }
    def constraint(name: String, analyzer: AnyAnalyzer,
        asrt: Double => Boolean): CompiledRule =
      ConstraintRule(rendered, Seq(Constraint(name, analyzer, asrt)))
    // numeric-condition rule with dynamic-threshold support
    def constraintN(name: String, analyzer: AnyAnalyzer): CompiledRule =
      constraint(name, analyzer, numericFor(analyzer))
    def immediate(f: => (Boolean, Option[Double])): CompiledRule =
      ImmediateRule(rendered, () => Try(f) match {
        case Success((passed, value)) =>
          RuleOutcome(rendered, passed,
            if (passed) None else Some(s"Value ${value.getOrElse("")} does not satisfy the rule"),
            value)
        case Failure(e) =>
          RuleOutcome(rendered, passed = false, Some(Option(e.getMessage).getOrElse(e.toString)), None)
      })

    def rejectWhere(): Unit =
      if (where.isDefined) throw new DqdlTranslationException(
        s"${rule.ruleType} does not support a where clause")

    // backtick-quote a column name for generated SQL predicates — an
    // unquoted name with a space/keyword would fail expr() parsing and
    // poison the fused scan
    def q(c: String): String = "`" + c.replace("`", "``") + "`"

    // `with threshold` is the row-level pass-ratio of the ColumnValues /
    // ColumnLength / ColumnDataType family; on any other rule it would be
    // silently discarded — reject instead
    if (rule.threshold.isDefined &&
        !Set("columnvalues", "columnlength", "columndatatype")
          .contains(rule.ruleType.toLowerCase)) {
      throw new DqdlTranslationException(
        s"${rule.ruleType} does not support 'with threshold' " +
          "(only ColumnValues/ColumnLength/ColumnDataType do)")
    }

    rule.ruleType.toLowerCase match {
      // -- single-source, constraint-backed ---------------------------------
      case "rowcount" => constraintN("RowCount", Size(where))
      case "columncount" =>
        rejectWhere()
        constraintN("ColumnCount", ColumnCount())
      case "completeness" => constraintN("Completeness", Completeness(param(0), where))
      case "iscomplete" => constraint("IsComplete", Completeness(param(0), where), _ == 1.0)
      case "uniqueness" => constraintN("Uniqueness",
        Uniqueness(rule.parameters, where))
      case "isunique" => constraint("IsUnique", Uniqueness(rule.parameters, where), _ == 1.0)
      case "uniquevalueratio" => constraintN("UniqueValueRatio",
        UniqueValueRatio(rule.parameters, where))
      case "distinctvaluescount" =>
        // CountDistinct has no WHERE surface (same as the reference);
        // silently ignoring a parsed filter would report wrong outcomes
        if (where.isDefined) throw new DqdlTranslationException(
          "DistinctValuesCount does not support a where clause")
        constraintN("DistinctValuesCount", CountDistinct(rule.parameters))
      case "entropy" => constraintN("Entropy", Entropy(param(0), where))
      case "mean" => constraintN("Mean", Mean(param(0), where))
      case "sum" => constraintN("Sum", Sum(param(0), where))
      case "standarddeviation" => constraintN("StandardDeviation",
        StandardDeviation(param(0), where))
      case "variance" => constraintN("Variance", Variance(param(0), where))
      case "skewness" => constraintN("Skewness", Skewness(param(0), where))
      case "kurtosis" => constraintN("Kurtosis", Kurtosis(param(0), where))
      case "interquartilerange" => constraintN("InterquartileRange",
        InterquartileRange(param(0), where))
      case "zeroscount" => constraintN("ZerosCount", ZerosCount(param(0), where))
      case "duplicaterowcount" => constraintN("DuplicateRowCount",
        DuplicateRowCount(rule.parameters, where))
      case "columncorrelation" => constraintN("ColumnCorrelation",
        Correlation(param(0), param(1), where))
      case "customsql" =>
        rejectWhere() // filters belong inside the SQL itself
        constraintN("CustomSql", CustomSql(param(0)))
      case "columnexists" =>
        rejectWhere()
        constraint("ColumnExists", ColumnExists(param(0)), _ == 1.0)

      // -- checks over persisted sketch states (the checked frame IS a
      // state table; the corpus behind it is never rescanned) -----------
      case "approxcountdistinctfromstate" =>
        constraintN("ApproxCountDistinctFromState",
          ApproxCountDistinctFromState(param(0), where))
      case "snapshotoverlap" =>
        rejectWhere() // the two sketch columns are already per-group rows
        constraintN("SnapshotOverlap", SnapshotOverlap(param(0), param(1)))
      case "approxquantilefromstate" =>
        constraintN("ApproxQuantileFromState",
          ApproxQuantileFromState(param(0), parseQuantile(param(1)), where))
      case "approxitemfrequencyfromstate" =>
        constraintN("ApproxItemFrequencyFromState",
          ApproxItemFrequencyFromState(param(0), param(1), where))
      case "itemfrequencydrift" =>
        rejectWhere() // the two state columns are already per-group rows
        constraintN("ItemFrequencyDrift", ItemFrequencyDrift(param(0), param(1)))
      case "quantileshift" =>
        rejectWhere()
        constraintN("QuantileShift",
          QuantileShift(param(0), param(1), parseQuantile(param(2))))
      case "distinctcountratio" =>
        rejectWhere()
        constraintN("DistinctCountRatio", DistinctCountRatio(param(0), param(1)))
      // dataset-release parity: the checked frame is two manifests
      // FULL OUTER joined on the shard key (DatasetManifest.joined);
      // the rule value is the exact-parity shard fraction
      case "manifestparity" =>
        rejectWhere()
        constraintN("ManifestParity", ManifestParity(param(0), param(1)))
      // embedding-space population drift: the checked frame is two
      // cell-state snapshots joined on the cell key
      // (Clustering.cellPopulationDrift); the rule value is the
      // population L1 distance in [0, 2]
      case "cellpopulationdrift" =>
        rejectWhere()
        constraintN("CellPopulationDrift",
          CellPopulationDrift(param(0), param(1), param(2)))
      // the whole drift-alarm loop as ONE rule: the ItemFrequencyDrift
      // metric's full repository history (oldest first) plus the value
      // computed on the data at hand, judged change-by-change — the rule
      // passes iff EVERY consecutive change in that series satisfies the
      // numeric condition (the zero-anomaly AbsoluteChangeStrategy form
      // of Check.hasNonAnomalousDriftHistory). Needs a MetricsRepository
      // passed to process(); pair with saveResultsKey so each run
      // appends today's drift to the history the next run judges.
      case "nonanomalousdrifthistory" =>
        rejectWhere()
        val analyzer = ItemFrequencyDrift(param(0), param(1))
        val cond = rule.condition.getOrElse(throw new DqdlTranslationException(
          "NonAnomalousDriftHistory requires a numeric condition " +
            "(the allowed per-step change band, e.g. between -0.015 and 0.015)"))
        val h = history.getOrElse(throw new DqdlTranslationException(
          s"Rule '$rendered' evaluates a metric history; pass a MetricsRepository"))
        val bandOk = DqdlParser.assertion(cond)
        constraint("NonAnomalousDriftHistory", analyzer, { current =>
          val series = h(analyzer) :+ current
          series.zip(series.tail).forall { case (p, c) => bandOk(c - p) }
        })

      case "isprimarykey" =>
        val cols = rule.parameters
        ConstraintRule(rendered,
          Constraint("PrimaryKeyUniqueness", Uniqueness(cols, where), (d: Double) => d == 1.0) +:
          cols.map(c => Constraint("PrimaryKeyCompleteness",
            Completeness(c, where), (d: Double) => d == 1.0)))

      case "range" =>
        rule.condition match {
          case Some(BetweenCondition(lo, hi)) =>
            ConstraintRule(rendered, Seq(
              Constraint("RangeMin", Minimum(param(0), where), (d: Double) => d > lo),
              Constraint("RangeMax", Maximum(param(0), where), (d: Double) => d < hi)))
          case _ => throw new DqdlTranslationException("Range requires 'between a and b'")
        }

      case "columnvalues" =>
        val c = param(0)
        rule.condition match {
          case Some(InCondition(values, quoted)) =>
            val list =
              if (quoted) values.map(v => "'" + v.replace("'", "''") + "'").mkString(",")
              else values.mkString(",")
            constraint("ColumnValuesIn",
              Compliance(s"$c in set", s"${q(c)} IN ($list)", where), thresholdAssertion)
          case Some(BetweenCondition(lo, hi)) =>
            constraint("ColumnValuesBetween",
              Compliance(s"$c between", s"${q(c)} > $lo AND ${q(c)} < $hi", where),
              thresholdAssertion)
          case Some(MatchesCondition(re)) =>
            constraint("ColumnValuesMatch",
              PatternMatch(c, re, where), thresholdAssertion)
          case Some(NumericCondition(op, v)) =>
            constraint("ColumnValuesCompare",
              Compliance(s"$c $op $v", s"${q(c)} $op $v", where), thresholdAssertion)
          case other => throw new DqdlTranslationException(
            s"ColumnValues does not support condition $other")
        }

      case "columnlength" =>
        val c = param(0)
        val predicate = rule.condition match {
          case Some(NumericCondition(op, v)) => s"length(${q(c)}) $op ${v.toLong}"
          case Some(BetweenCondition(lo, hi)) =>
            s"length(${q(c)}) > ${lo.toLong} AND length(${q(c)}) < ${hi.toLong}"
          case other => throw new DqdlTranslationException(
            s"ColumnLength does not support condition $other")
        }
        constraint("ColumnLength", Compliance(s"length($c)", predicate, where),
          thresholdAssertion)

      case "columndatatype" =>
        val c = param(0)
        val expected = rule.condition match {
          case Some(EqualsStringCondition(v)) => v.toLowerCase match {
            case "integer" | "long" | "integral" => DataTypeInstances.Integral
            case "double" | "float" | "fractional" => DataTypeInstances.Fractional
            case "boolean" => DataTypeInstances.Boolean
            case "string" => DataTypeInstances.String
            case other => throw new DqdlTranslationException(s"Unknown data type '$other'")
          }
          case other => throw new DqdlTranslationException(
            s"ColumnDataType requires = \"Type\", found $other")
        }
        ConstraintRule(rendered, Seq(
          Constraint("ColumnDataType", DataTypeAnalyzer(c, where),
            thresholdAssertion,
            // conformance among NON-NULL values (integers conform to
            // Fractional) — the raw bin ratio failed on incomplete columns
            picker = Constraint.dataTypeConformancePicker(expected))))

      // -- driver-side -------------------------------------------------------
      // where-clause contract for the immediate rules below: schema-level
      // rules (ColumnNamesMatchPattern, SchemaMatch) reject a filter —
      // there are no rows to filter; row-level ones apply it to the
      // PRIMARY side. Silently ignoring a parsed filter would report
      // wrong outcomes (same invariant as DistinctValuesCount above).
      case "columnnamesmatchpattern" =>
        rejectWhere() // schema-level: no rows to filter
        val re = param(0).r
        // user condition on the match ratio when present (>= 0.5 etc.),
        // default all-match
        val assert: Double => Boolean =
          rule.condition.map(DqdlParser.assertion).getOrElse((d: Double) => d == 1.0)
        immediate {
          val cols = data.columns
          // CONTAINS-a-match semantics, not full-match (reference:
          // dqdl/execution/executors/ColumnNamesMatchPatternExecutor
          // .scala:38 uses findAllMatchIn — anchor explicitly for exact)
          val matched = cols.count(n => re.findFirstIn(n).isDefined)
          val ratio = if (cols.isEmpty) 1.0 else matched.toDouble / cols.length
          (assert(ratio), Some(ratio))
        }

      case "datafreshness" =>
        val c = param(0)
        val maxAgeHours = rule.condition match {
          case Some(NumericCondition("<=", v)) => v
          case Some(NumericCondition("<", v)) => v
          case other => throw new DqdlTranslationException(
            s"DataFreshness requires '<= hours', found $other")
        }
        immediate {
          import org.apache.spark.sql.functions._
          val filtered = where.map(data.filter).getOrElse(data)
          val row = filtered.agg(
            coalesce(sum((col(c) >= (current_timestamp() -
              expr(s"INTERVAL ${maxAgeHours} HOURS"))).cast("long")), lit(0L)),
            count(lit(1))).collect().head
          val ratio = if (row.getLong(1) == 0L) 1.0
            else row.getLong(0).toDouble / row.getLong(1)
          (ratio == 1.0, Some(ratio))
        }

      // -- two-source --------------------------------------------------------
      case "rowcountmatch" =>
        val ref = source(sources, param(0))
        immediate {
          val ratio = RowCountMatch.ratio(where.map(data.filter).getOrElse(data), ref)
          (numeric(ratio), Some(ratio))
        }

      case "schemamatch" =>
        rejectWhere() // schema-level: no rows to filter
        val ref = source(sources, param(0))
        val assert: Double => Boolean =
          rule.condition.map(DqdlParser.assertion).getOrElse((d: Double) => d == 1.0)
        immediate {
          val ok = SchemaMatch.matches(data, ref)
          (assert(if (ok) 1.0 else 0.0), Some(if (ok) 1.0 else 0.0))
        }

      case "referentialintegrity" =>
        val cols = param(0)
        val refSpec = param(1) // "refname.refcol"
        val dot = refSpec.lastIndexOf('.')
        if (dot < 0) throw new DqdlTranslationException(
          s"ReferentialIntegrity reference must be 'source.column', got '$refSpec'")
        val ref = source(sources, refSpec.substring(0, dot))
        val refCol = refSpec.substring(dot + 1)
        immediate {
          val ratio = ReferentialIntegrity.subsetCheck(
            where.map(data.filter).getOrElse(data), cols, ref, refCol)
          (rule.condition.map(c => DqdlParser.assertion(c)(ratio)).getOrElse(ratio == 1.0),
            Some(ratio))
        }

      case "datasetmatch" =>
        val ref = source(sources, param(0))
        // "k1->r1,k2->r2" key mapping
        val keyMap = param(1).split(',').map { pair =>
          val parts = pair.split("->").map(_.trim)
          if (parts.length != 2) throw new DqdlTranslationException(
            s"DatasetMatch key mapping must be 'k->r', got '$pair'")
          parts(0) -> parts(1)
        }.toMap
        immediate {
          DatasetMatch.matchRatio(
            where.map(data.filter).getOrElse(data), ref, keyMap) match {
            case Success(ratio) => (numeric(ratio), Some(ratio))
            case Failure(e) => throw e
          }
        }

      case "aggregatematch" =>
        // AggregateMatch "sum(colA)" "ref.sum(colB)" >= 0.9 : ratio of the
        // two aggregates (reference dqdl/execution/executors/AggregateMatchExecutor.scala:32)
        val primaryAgg = param(0)
        val refSpec = param(1)
        val dot = refSpec.indexOf('.')
        if (dot < 0) throw new DqdlTranslationException(
          s"AggregateMatch reference must be 'source.agg(col)', got '$refSpec'")
        val refName = refSpec.substring(0, dot)
        val refAgg = refSpec.substring(dot + 1)
        source(sources, refName) // fail fast if missing
        val spark = data.sparkSession
        immediate {
          val primaryWhere = where.map(w => s" WHERE $w").getOrElse("")
          val a = spark.sql(s"SELECT $primaryAgg FROM primary$primaryWhere").collect().head
          val b = spark.sql(s"SELECT $refAgg FROM $refName").collect().head
          val av = Analyzers.doubleAt(a, 0).getOrElse(Double.NaN)
          val bv = Analyzers.doubleAt(b, 0).getOrElse(Double.NaN)
          val ratio = if (bv == 0.0) Double.NaN else av / bv
          (numeric(ratio), Some(ratio))
        }

      case other =>
        throw new DqdlTranslationException(s"Unknown DQDL rule type '$other'")
    }
  }
}
