package graft.suggestions

import org.apache.spark.sql.DataFrame

import graft.checks.{Check, CheckLevel, Constraint, ConstraintStatus}
import graft.operators.DataTypeInstances
import graft.profiles._

/** A suggested constraint with ready-to-paste check code and an evaluable
  * [[Constraint]] for train/test validation
  * (reference capability: suggestions/ConstraintSuggestion.scala).
  */
case class ConstraintSuggestion(
    constraintName: String,
    columnName: String,
    description: String,
    codeForConstraint: String,
    constraint: Option[Constraint] = None,
    /** observed profile value the suggestion is based on (reference:
      * ConstraintSuggestion.currentValue, emitted as `current_value`) */
    currentValue: String = "",
    /** rule that produced this suggestion (reference: `suggesting_rule`) */
    suggestingRule: String = "",
    ruleDescription: String = "")

/** One heuristic over a column profile
  * (reference capability: suggestions/rules/ConstraintRule.scala).
  */
trait ConstraintRule {
  def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean
  def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion

  /** Human explanation of the heuristic (reference capability:
    * rules/ConstraintRule.ruleDescription).
    */
  def ruleDescription: String = getClass.getSimpleName
}

/** Complete columns stay complete
  * (reference capability: suggestions/rules/CompleteIfCompleteRule.scala). */
case class CompleteIfCompleteRule() extends ConstraintRule {
  override val ruleDescription: String =
    "If a column is complete in the sample, we suggest a NOT NULL constraint"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.completeness == 1.0

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion =
    ConstraintSuggestion("CompletenessConstraint", profile.column,
      s"'${profile.column}' is not null",
      s""".isComplete("${profile.column}")""",
      Some(Constraint("CompletenessConstraint",
        graft.operators.Completeness(profile.column), _ == 1.0)))
}

/** Mostly-complete columns keep at least a Wilson lower bound of their
  * observed completeness
  * (reference capability: suggestions/rules/RetainCompletenessRule.scala). */
/** Lower confidence bound for an observed success ratio — pluggable, like
  * the reference's suggestions/rules/interval package.
  */
sealed trait ConfidenceIntervalStrategy {
  def lowerBound(p: Double, n: Double, z: Double = 1.96): Double
}

/** Wilson score interval: well-behaved near p=0/1 and at small n — the
  * default (reference capability: rules/interval/WilsonScoreIntervalStrategy).
  */
case object WilsonScoreIntervalStrategy extends ConfidenceIntervalStrategy {
  override def lowerBound(p: Double, n: Double, z: Double): Double = {
    val denom = 1 + z * z / n
    val center = p + z * z / (2 * n)
    val margin = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    (center - margin) / denom
  }
}

/** Wald (normal-approximation) interval — simpler, degenerate near the
  * boundaries (reference capability: rules/interval/WaldIntervalStrategy).
  */
case object WaldIntervalStrategy extends ConfidenceIntervalStrategy {
  override def lowerBound(p: Double, n: Double, z: Double): Double =
    p - z * math.sqrt(p * (1 - p) / n)
}

case class RetainCompletenessRule(
    minCompleteness: Double = 0.2,
    intervalStrategy: ConfidenceIntervalStrategy = WilsonScoreIntervalStrategy)
    extends ConstraintRule {
  override val ruleDescription: String =
    "If a column is incomplete in the sample, we model its completeness as a binomial variable and estimate a confidence-interval lower bound for it"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.completeness > minCompleteness && profile.completeness < 1.0

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val p = profile.completeness
    val n = math.max(numRecords, 1L).toDouble
    val bound = math.max(0.0,
      math.floor(intervalStrategy.lowerBound(p, n) * 100) / 100)
    ConstraintSuggestion("CompletenessConstraint", profile.column,
      f"'${profile.column}' has completeness >= $bound%.2f",
      f""".hasCompleteness("${profile.column}", _ >= $bound%.2f)""",
      Some(Constraint("CompletenessConstraint",
        graft.operators.Completeness(profile.column), _ >= bound)))
  }
}

/** Unique-looking columns should be unique
  * (reference capability: suggestions/rules/UniqueIfApproximatelyUniqueRule.scala). */
case class UniqueIfApproximatelyUniqueRule() extends ConstraintRule {
  override val ruleDescription: String =
    "If the ratio of approximate num distinct values in a column is close to the number of records (within HLL error), we suggest a UNIQUE constraint"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean = {
    val nonNull = profile.completeness * numRecords
    nonNull > 0 &&
      math.abs(profile.approximateNumDistinctValues - nonNull) / nonNull < 0.08
  }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion =
    ConstraintSuggestion("UniquenessConstraint", profile.column,
      s"'${profile.column}' is unique",
      s""".isUnique("${profile.column}")""",
      Some(Constraint("UniquenessConstraint",
        graft.operators.Uniqueness(Seq(profile.column)), _ == 1.0)))
}

/** Inferred-typed string columns keep their type
  * (reference capability: suggestions/rules/RetainTypeRule.scala). */
case class RetainTypeRule() extends ConstraintRule {
  override val ruleDescription: String =
    "If we detect a non-string semantic type, we suggest a type constraint"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.isDataTypeInferred && (profile.dataType == DataTypeInstances.Integral ||
      profile.dataType == DataTypeInstances.Fractional ||
      profile.dataType == DataTypeInstances.Boolean)

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion =
    ConstraintSuggestion("DataTypeConstraint", profile.column,
      s"'${profile.column}' has type ${profile.dataType}",
      s""".hasDataType("${profile.column}", "${profile.dataType}")""",
      Some(Constraint("DataTypeConstraint",
        graft.operators.DataTypeAnalyzer(profile.column),
        _ == 1.0,
        picker = Constraint.dataTypeConformancePicker(profile.dataType))))
}

/** Low-cardinality columns keep their value set
  * (reference capability: suggestions/rules/CategoricalRangeRule.scala). */
case class CategoricalRangeRule(maxCategories: Int = 10) extends ConstraintRule {
  override val ruleDescription: String =
    "If we see a categorical range for a column, we suggest an IS IN (...) constraint"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.histogram.exists { h =>
      h.numberOfBins <= maxCategories && h.values.nonEmpty &&
        !h.values.keySet.contains(graft.operators.Histogram.NullFieldReplacement)
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val values = profile.histogram.get.values.keys.toSeq.sorted
    // escape backslashes BEFORE quotes: a value like C:\temp would
    // otherwise compile to a tab (Scala) or a mis-parsed literal (SQL)
    val list = values
      .map(v => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString(", ")
    val predicate = values
      .map(v => "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString(s"${profile.column} IS NULL OR ${profile.column} IN (", ",", ")")
    ConstraintSuggestion("CategoricalRangeConstraint", profile.column,
      s"'${profile.column}' has value range ${values.mkString(", ")}",
      s""".isContainedIn("${profile.column}", Array($list))""",
      Some(Constraint("ComplianceConstraint",
        graft.operators.Compliance(s"${profile.column} contained in set", predicate),
        _ == 1.0)))
  }
}

/** Non-negative numeric columns stay non-negative
  * (reference capability: suggestions/rules/NonNegativeNumbersRule.scala). */
case class NonNegativeNumbersRule() extends ConstraintRule {
  override val ruleDescription: String =
    "If we see only non-negative numbers in a column, we suggest a corresponding constraint"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match {
      case n: NumericColumnProfile => n.minimum.exists(_ >= 0.0)
      case _ => false
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion =
    ConstraintSuggestion("NonNegativeConstraint", profile.column,
      s"'${profile.column}' has no negative values",
      s""".isNonNegative("${profile.column}")""",
      Some(Constraint("ComplianceConstraint",
        graft.operators.Compliance(s"${profile.column} is non-negative",
          s"COALESCE(${profile.column}, 0.0) >= 0"), _ == 1.0)))
}

/** Like CategoricalRangeRule but tolerates a long tail: suggests
  * `isContainedIn` on the categories covering >= `targetCoverage` of rows,
  * asserted with that fraction as the threshold (reference capability:
  * suggestions/rules/FractionalCategoricalRangeRule.scala).
  */
case class FractionalCategoricalRangeRule(
    maxCategories: Int = 100,
    targetCoverage: Double = 0.9) extends ConstraintRule {
  override val ruleDescription: String =
    "If most values in a column fall into a categorical range, we suggest an IS IN (...) constraint that should hold for most values"


  private[suggestions] def topCoverage(profile: ColumnProfile): Option[(Seq[String], Double)] =
    profile.histogram.map { h =>
      val sorted = h.values.toSeq.sortBy { case (_, v) => -v.ratio }
      var acc = 0.0
      val kept = sorted.takeWhile { case (_, v) =>
        val take = acc < targetCoverage
        acc += v.ratio
        take
      }
      (kept.map(_._1), kept.map(_._2.ratio).sum)
    }

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.histogram.exists { h =>
      h.values.size > 1 && h.values.size <= maxCategories &&
        !h.values.keySet.contains(graft.operators.Histogram.NullFieldReplacement)
    } && topCoverage(profile).exists { case (kept, cov) =>
      kept.nonEmpty && cov < 1.0 && cov >= targetCoverage * 0.5
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val (values, coverage) = topCoverage(profile).get
    // leave slack below the observed coverage (sampling noise on new data)
    val threshold = math.max(0.0, math.floor((coverage - 0.05) * 100) / 100)
    val list = values
      .map(v => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString(", ")
    val predicate = values
      .map(v => "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString(s"${profile.column} IN (", ",", ")")
    ConstraintSuggestion("FractionalCategoricalRangeConstraint", profile.column,
      f"'${profile.column}' has >= $threshold%.2f of values in ${values.mkString(", ")}",
      f""".isContainedIn("${profile.column}", Array($list), _ >= $threshold%.2f, None)""",
      Some(Constraint("ComplianceConstraint",
        graft.operators.Compliance(s"${profile.column} mostly contained in set", predicate),
        _ >= threshold)))
  }
}

/** Numeric columns keep their observed minimum as a lower bound
  * (reference capability: suggestions/rules/HasMin.scala, EXTENDED set). */
case class HasMinRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed minimum of a numeric column is retained as a lower bound"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match { case n: NumericColumnProfile => n.minimum.isDefined; case _ => false }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val m = profile.asInstanceOf[NumericColumnProfile].minimum.get
    ConstraintSuggestion("MinimumConstraint", profile.column,
      s"'${profile.column}' >= $m",
      s""".hasMin("${profile.column}", _ >= $m)""",
      Some(Constraint("MinimumConstraint",
        graft.operators.Minimum(profile.column), _ >= m)))
  }
}

/** Numeric columns keep their observed maximum as an upper bound
  * (reference capability: suggestions/rules/HasMax.scala, EXTENDED set). */
case class HasMaxRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed maximum of a numeric column is retained as an upper bound"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match { case n: NumericColumnProfile => n.maximum.isDefined; case _ => false }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val m = profile.asInstanceOf[NumericColumnProfile].maximum.get
    ConstraintSuggestion("MaximumConstraint", profile.column,
      s"'${profile.column}' <= $m",
      s""".hasMax("${profile.column}", _ <= $m)""",
      Some(Constraint("MaximumConstraint",
        graft.operators.Maximum(profile.column), _ <= m)))
  }
}

/** Numeric mean stays within observed mean ± 10x observed stddev/sqrt(n)
  * (reference capability: suggestions/rules/HasMean.scala, EXTENDED set). */
case class HasMeanRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed mean of a numeric column is retained within a stddev-derived band"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match {
      case n: NumericColumnProfile => n.mean.isDefined && n.stdDev.isDefined
      case _ => false
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val p = profile.asInstanceOf[NumericColumnProfile]
    val mu = p.mean.get
    val slack = math.max(10 * p.stdDev.get / math.sqrt(math.max(numRecords, 1L).toDouble),
      math.abs(mu) * 0.1 + 1e-9)
    val (lo, hi) = (mu - slack, mu + slack)
    ConstraintSuggestion("MeanConstraint", profile.column,
      f"'${profile.column}' has mean in [$lo%.4f, $hi%.4f]",
      f""".hasMean("${profile.column}", m => m >= $lo%.4f && m <= $hi%.4f)""",
      Some(Constraint("MeanConstraint",
        graft.operators.Mean(profile.column), m => m >= lo && m <= hi)))
  }
}

/** Standard deviation stays within a 2x band of the observed one
  * (reference capability: suggestions/rules/HasStandardDeviation.scala). */
case class HasStandardDeviationRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed standard deviation of a numeric column is retained within a tolerance band"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match {
      case n: NumericColumnProfile => n.stdDev.exists(_ > 0.0)
      case _ => false
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val sd = profile.asInstanceOf[NumericColumnProfile].stdDev.get
    val (lo, hi) = (sd / 2.0, sd * 2.0)
    ConstraintSuggestion("StandardDeviationConstraint", profile.column,
      f"'${profile.column}' has stddev in [$lo%.4f, $hi%.4f]",
      f""".hasStandardDeviation("${profile.column}", s => s >= $lo%.4f && s <= $hi%.4f)""",
      Some(Constraint("StandardDeviationConstraint",
        graft.operators.StandardDeviation(profile.column), s => s >= lo && s <= hi)))
  }
}

/** String columns keep their observed minimum value length
  * (reference capability: suggestions/rules/HasMinLength.scala). */
case class HasMinLengthRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed minimum string length is retained as a lower bound"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match {
      case s: graft.profiles.StringColumnProfile => s.minLength.isDefined
      case _ => false
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val m = profile.asInstanceOf[graft.profiles.StringColumnProfile].minLength.get
    ConstraintSuggestion("MinLengthConstraint", profile.column,
      s"'${profile.column}' has value length >= ${m.toLong}",
      s""".hasMinLength("${profile.column}", _ >= $m)""",
      Some(Constraint("MinLengthConstraint",
        graft.operators.MinLength(profile.column), _ >= m)))
  }
}

/** String columns keep their observed maximum value length
  * (reference capability: suggestions/rules/HasMaxLength.scala). */
case class HasMaxLengthRule() extends ConstraintRule {
  override val ruleDescription: String =
    "The observed maximum string length is retained as an upper bound"

  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile match {
      case s: graft.profiles.StringColumnProfile => s.maxLength.isDefined
      case _ => false
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val m = profile.asInstanceOf[graft.profiles.StringColumnProfile].maxLength.get
    ConstraintSuggestion("MaxLengthConstraint", profile.column,
      s"'${profile.column}' has value length <= ${m.toLong}",
      s""".hasMaxLength("${profile.column}", _ <= $m)""",
      Some(Constraint("MaxLengthConstraint",
        graft.operators.MaxLength(profile.column), _ <= m)))
  }
}

/** Rule sets mirroring the reference groupings (reference capability:
  * suggestions/ConstraintSuggestionRunner.scala:31-45).
  */
object Rules {
  val COMMON: Seq[ConstraintRule] = Seq(
    CompleteIfCompleteRule(), RetainCompletenessRule(), UniqueIfApproximatelyUniqueRule())
  val STRING: Seq[ConstraintRule] = Seq(
    RetainTypeRule(), CategoricalRangeRule(), FractionalCategoricalRangeRule())
  val NUMERICAL: Seq[ConstraintRule] = Seq(NonNegativeNumbersRule())
  val DEFAULT: Seq[ConstraintRule] = COMMON ++ STRING ++ NUMERICAL
  val EXTENDED: Seq[ConstraintRule] = DEFAULT ++ Seq(
    HasMinRule(), HasMaxRule(), HasMeanRule(), HasStandardDeviationRule(),
    HasMinLengthRule(), HasMaxLengthRule())
}

/** Profile-then-suggest entry point
  * (reference capability: suggestions/ConstraintSuggestionRunner.scala:73).
  */
object ConstraintSuggestionRunner {

  def apply(): ConstraintSuggestionRunnerFluent = new ConstraintSuggestionRunnerFluent()

  /** Observed profile value backing a suggestion (reference:
    * ConstraintSuggestion.currentValue / `current_value` in JSON).
    */
  private[suggestions] def currentValueFor(
      s: ConstraintSuggestion, profile: ColumnProfile): String = {
    def numeric(f: NumericColumnProfile => Option[Double], label: String): String =
      profile match {
        case n: NumericColumnProfile => f(n).map(v => s"$label: $v").getOrElse("")
        case _ => ""
      }
    s.constraintName match {
      case "CompletenessConstraint" => s"Completeness: ${profile.completeness}"
      case "UniquenessConstraint" =>
        s"ApproxDistinctValues: ${profile.approximateNumDistinctValues}"
      case "DataTypeConstraint" => s"DataType: ${profile.dataType}"
      case "CategoricalRangeConstraint" => "Compliance: 1"
      case "FractionalCategoricalRangeConstraint" =>
        // observed coverage of the kept categories, not a hardcoded 1
        profile.histogram
          .flatMap(_ => FractionalCategoricalRangeRule().topCoverage(profile))
          .map { case (_, cov) => f"Compliance: $cov%.4f" }
          .getOrElse("Compliance: 1")
      case "NonNegativeConstraint" | "MinimumConstraint" => numeric(_.minimum, "Minimum")
      case "MaximumConstraint" => numeric(_.maximum, "Maximum")
      case "MeanConstraint" => numeric(_.mean, "Mean")
      case "StandardDeviationConstraint" => numeric(_.stdDev, "StandardDeviation")
      case "MinLengthConstraint" => profile match {
        case p: StringColumnProfile => p.minLength.map(v => s"MinLength: $v").getOrElse("")
        case _ => ""
      }
      case "MaxLengthConstraint" => profile match {
        case p: StringColumnProfile => p.maxLength.map(v => s"MaxLength: $v").getOrElse("")
        case _ => ""
      }
      case _ => ""
    }
  }

  private[suggestions] def suggestionsFromProfiles(
      profiles: ColumnProfiles,
      rules: Seq[ConstraintRule]): Map[String, Seq[ConstraintSuggestion]] =
    profiles.profiles.map { case (column, profile) =>
      column -> rules
        .filter(_.shouldBeApplied(profile, profiles.numRecords))
        .map { r =>
          val c = r.candidate(profile, profiles.numRecords)
          c.copy(
            suggestingRule = r.getClass.getSimpleName.stripSuffix("$"),
            ruleDescription = r.ruleDescription,
            currentValue =
              if (c.currentValue.nonEmpty) c.currentValue
              else currentValueFor(c, profile))
        }
    }

  case class SuggestionResult(
      columnProfiles: ColumnProfiles,
      suggestions: Map[String, Seq[ConstraintSuggestion]],
      /** suggestion code -> held-out evaluation, when a train/test split ran */
      testEvaluation: Map[String, ConstraintStatus] = Map.empty)

  def run(
      data: DataFrame,
      rules: Seq[ConstraintRule] = Rules.DEFAULT,
      restrictToColumns: Option[Seq[String]] = None,
      testsetRatio: Option[Double] = None,
      testsetSeed: Long = 42L): SuggestionResult = {
    require(testsetRatio.forall(r => r > 0.0 && r < 1.0),
      "testsetRatio must be in (0, 1)")

    val (train, test) = testsetRatio match {
      case Some(ratio) =>
        val Array(tr, te) = data.randomSplit(Array(1.0 - ratio, ratio), testsetSeed)
        (tr, Some(te))
      case None => (data, None)
    }

    val profiles = ColumnProfiler.profile(train, restrictToColumns)
    val suggestions = suggestionsFromProfiles(profiles, rules)

    SuggestionResult(profiles, suggestions, evaluateHoldout(suggestions, test))
  }

  /** Hold-out validation: every evaluable suggestion runs as one check on
    * the test split (one fused pass); reports per-suggestion status.
    */
  private[suggestions] def evaluateHoldout(
      suggestions: Map[String, Seq[ConstraintSuggestion]],
      test: Option[DataFrame]): Map[String, ConstraintStatus] = test match {
    case Some(testData) =>
      val evaluable = suggestions.values.flatten.toSeq.flatMap(s =>
        s.constraint.map(c => s -> c))
      if (evaluable.isEmpty) Map.empty[String, ConstraintStatus]
      else {
        // mirror the profiler's pass-2 cast: suggestions derived from
        // inferred-numeric STRING columns carry numeric analyzers, which
        // on the raw test split would fail their isNumeric precondition
        // (reported as false holdout failures) instead of evaluating
        val numericCols = evaluable.map(_._2.analyzer).collect {
          case a: graft.operators.Minimum => a.column
          case a: graft.operators.Maximum => a.column
          case a: graft.operators.Mean => a.column
          case a: graft.operators.StandardDeviation => a.column
        }.distinct.filter(c => testData.schema.fields.exists(f =>
          f.name == c && f.dataType == org.apache.spark.sql.types.StringType))
        val prepared = numericCols.foldLeft(testData)((d, c) =>
          d.withColumn(c, org.apache.spark.sql.functions.col(c).cast(
            org.apache.spark.sql.types.DoubleType)))
        val check = Check(CheckLevel.Warning, "suggestion holdout",
          evaluable.map(_._2))
        val ctx = graft.runners.AnalysisRunner.run(prepared, check.requiredAnalyzers())
        val results = check.evaluate(ctx)
        evaluable.map(_._1).zip(results.constraintResults).map {
          case (s, r) => s.codeForConstraint -> r.status
        }.toMap
      }
    case None => Map.empty[String, ConstraintStatus]
  }
}
