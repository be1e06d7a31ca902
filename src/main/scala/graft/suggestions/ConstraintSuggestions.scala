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
    constraint: Option[Constraint] = None)

/** One heuristic over a column profile
  * (reference capability: suggestions/rules/ConstraintRule.scala).
  */
trait ConstraintRule {
  def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean
  def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion
}

/** Complete columns stay complete
  * (reference capability: suggestions/rules/CompleteIfCompleteRule.scala). */
case class CompleteIfCompleteRule() extends ConstraintRule {
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
        picker = Constraint.distributionPicker { dist =>
          dist.values.get(profile.dataType).map(_.ratio).getOrElse(0.0)
        })))
}

/** Low-cardinality columns keep their value set
  * (reference capability: suggestions/rules/CategoricalRangeRule.scala). */
case class CategoricalRangeRule(maxCategories: Int = 10) extends ConstraintRule {
  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.histogram.exists { h =>
      h.numberOfBins <= maxCategories && h.values.nonEmpty &&
        !h.values.keySet.contains(graft.operators.Histogram.NullFieldReplacement)
    }

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    val values = profile.histogram.get.values.keys.toSeq.sorted
    val list = values.map(v => "\"" + v.replace("\"", "\\\"") + "\"").mkString(", ")
    val predicate = values.map(v => "'" + v.replace("'", "''") + "'")
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

  private def topCoverage(profile: ColumnProfile): Option[(Seq[String], Double)] =
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
    val list = values.map(v => "\"" + v.replace("\"", "\\\"") + "\"").mkString(", ")
    val predicate = values.map(v => "'" + v.replace("'", "''") + "'")
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
    val suggestions = profiles.profiles.map { case (column, profile) =>
      column -> rules
        .filter(_.shouldBeApplied(profile, profiles.numRecords))
        .map(_.candidate(profile, profiles.numRecords))
    }

    // hold-out validation: run every evaluable suggestion as one check on
    // the test split (one fused pass) and report per-suggestion status
    val evaluation = test match {
      case Some(testData) =>
        val evaluable = suggestions.values.flatten.toSeq.flatMap(s =>
          s.constraint.map(c => s -> c))
        if (evaluable.isEmpty) Map.empty[String, ConstraintStatus]
        else {
          val check = Check(CheckLevel.Warning, "suggestion holdout",
            evaluable.map(_._2))
          val ctx = graft.runners.AnalysisRunner.run(testData, check.requiredAnalyzers())
          val results = check.evaluate(ctx)
          evaluable.map(_._1).zip(results.constraintResults).map {
            case (s, r) => s.codeForConstraint -> r.status
          }.toMap
        }
      case None => Map.empty[String, ConstraintStatus]
    }

    SuggestionResult(profiles, suggestions, evaluation)
  }
}
