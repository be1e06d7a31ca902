package graft.suggestions

import org.apache.spark.sql.DataFrame

import graft.operators.DataTypeInstances
import graft.profiles._

/** A suggested constraint with ready-to-paste check code
  * (reference capability: suggestions/ConstraintSuggestion.scala).
  */
case class ConstraintSuggestion(
    constraintName: String,
    columnName: String,
    description: String,
    codeForConstraint: String)

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
      s""".isComplete("${profile.column}")""")
}

/** Mostly-complete columns keep at least a Wilson lower bound of their
  * observed completeness
  * (reference capability: suggestions/rules/RetainCompletenessRule.scala). */
case class RetainCompletenessRule(minCompleteness: Double = 0.2) extends ConstraintRule {
  override def shouldBeApplied(profile: ColumnProfile, numRecords: Long): Boolean =
    profile.completeness > minCompleteness && profile.completeness < 1.0

  override def candidate(profile: ColumnProfile, numRecords: Long): ConstraintSuggestion = {
    // Wilson score lower bound at z=1.96
    val p = profile.completeness
    val n = math.max(numRecords, 1L).toDouble
    val z = 1.96
    val denom = 1 + z * z / n
    val center = p + z * z / (2 * n)
    val margin = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    val bound = math.max(0.0, math.floor(((center - margin) / denom) * 100) / 100)
    ConstraintSuggestion("CompletenessConstraint", profile.column,
      f"'${profile.column}' has completeness >= $bound%.2f",
      f""".hasCompleteness("${profile.column}", _ >= $bound%.2f)""")
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
      s""".isUnique("${profile.column}")""")
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
      s""".hasDataType("${profile.column}", "${profile.dataType}")""")
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
    ConstraintSuggestion("CategoricalRangeConstraint", profile.column,
      s"'${profile.column}' has value range ${values.mkString(", ")}",
      s""".isContainedIn("${profile.column}", Array($list))""")
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
      s""".isNonNegative("${profile.column}")""")
}

object Rules {
  val DEFAULT: Seq[ConstraintRule] = Seq(
    CompleteIfCompleteRule(), RetainCompletenessRule(), UniqueIfApproximatelyUniqueRule(),
    RetainTypeRule(), CategoricalRangeRule(), NonNegativeNumbersRule())
}

/** Profile-then-suggest entry point
  * (reference capability: suggestions/ConstraintSuggestionRunner.scala:73).
  */
object ConstraintSuggestionRunner {

  case class SuggestionResult(
      columnProfiles: ColumnProfiles,
      suggestions: Map[String, Seq[ConstraintSuggestion]])

  def run(
      data: DataFrame,
      rules: Seq[ConstraintRule] = Rules.DEFAULT,
      restrictToColumns: Option[Seq[String]] = None): SuggestionResult = {
    val profiles = ColumnProfiler.profile(data, restrictToColumns)
    val suggestions = profiles.profiles.map { case (column, profile) =>
      column -> rules
        .filter(_.shouldBeApplied(profile, profiles.numRecords))
        .map(_.candidate(profile, profiles.numRecords))
    }
    SuggestionResult(profiles, suggestions)
  }
}
