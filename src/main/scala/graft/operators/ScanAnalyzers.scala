package graft.operators

import scala.util.{Failure, Success}

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.core.Analyzers._
import graft.core.Preconditions._

/** Null handling for length analyzers (reference capability:
  * analyzers/Analyzer.scala:280-283).
  */
sealed trait NullBehavior
object NullBehavior {
  case object Ignore extends NullBehavior
  case object EmptyString extends NullBehavior
  case object Fail extends NullBehavior
}

/** Row count, optionally restricted by a WHERE predicate
  * (reference capability: analyzers/Size.scala:36).
  */
case class Size(where: Option[String] = None)
    extends StandardScanShareableAnalyzer[NumMatches]("Size", "*", Entity.Dataset) {

  override def aggregationFunctions(): Seq[Column] = conditionalCount(where) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[NumMatches] =
    Some(NumMatches(longAt(result, offset)))
}

/** Fraction of non-null values in a column
  * (reference capability: analyzers/Completeness.scala:30).
  */
case class Completeness(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[NumMatchesAndCount]("Completeness", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNotNested(column) :: Nil

  override def aggregationFunctions(): Seq[Column] = Seq(
    coalesce(sum(conditionalSelection(col(column), where).isNotNull.cast(LongType)), lit(0L)),
    conditionalCount(where))

  override def fromAggregationResult(result: Row, offset: Int): Option[NumMatchesAndCount] = {
    // count == 0 means no rows survived the WHERE: empty state, so the
    // constraint layer can apply its all-rows-filtered => Success rule
    val count = longAt(result, offset + 1)
    if (count == 0L) None else Some(NumMatchesAndCount(longAt(result, offset), count))
  }

  override def fullColumn: Option[Column] = Some(
    where.map(w => when(expr(w), col(column).isNotNull)).getOrElse(col(column).isNotNull))
}

/** Fraction of rows satisfying an arbitrary SQL predicate — backs
  * satisfies / isContainedIn / isNonNegative / isPositive / comparisons
  * (reference capability: analyzers/Compliance.scala:41).
  */
case class Compliance(override val instance: String, predicate: String,
    where: Option[String] = None)
    extends StandardScanShareableAnalyzer[NumMatchesAndCount]("Compliance", instance,
      Entity.Column) {

  override def aggregationFunctions(): Seq[Column] = Seq(
    coalesce(sum(conditionalSelection(expr(predicate).cast(LongType), where)), lit(0L)),
    conditionalCount(where))

  override def fromAggregationResult(result: Row, offset: Int): Option[NumMatchesAndCount] = {
    // count == 0 means no rows survived the WHERE: empty state, so the
    // constraint layer can apply its all-rows-filtered => Success rule
    val count = longAt(result, offset + 1)
    if (count == 0L) None else Some(NumMatchesAndCount(longAt(result, offset), count))
  }

  override def fullColumn: Option[Column] = Some(
    where.map(w => when(expr(w), expr(predicate))).getOrElse(expr(predicate)))
}

/** Fraction of values matching a regular expression
  * (reference capability: analyzers/PatternMatch.scala:41).
  */
case class PatternMatch(column: String, pattern: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[NumMatchesAndCount]("PatternMatch", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isString(column) :: Nil

  private def matches: Column =
    // rlike, not regexp_extract(...) != "": a legitimate ZERO-WIDTH match
    // (e.g. ^[a-z]*$ on an empty string) extracts "" and was counted as a
    // violation; rlike has the same find-anywhere semantics without the
    // sentinel collision
    when(col(column).rlike(pattern), lit(1L)).otherwise(lit(0L))

  override def aggregationFunctions(): Seq[Column] = Seq(
    coalesce(sum(conditionalSelection(matches, where)), lit(0L)),
    conditionalCount(where))

  override def fromAggregationResult(result: Row, offset: Int): Option[NumMatchesAndCount] = {
    // count == 0 means no rows survived the WHERE: empty state, so the
    // constraint layer can apply its all-rows-filtered => Success rule
    val count = longAt(result, offset + 1)
    if (count == 0L) None else Some(NumMatchesAndCount(longAt(result, offset), count))
  }

  override def fullColumn: Option[Column] = Some(
    where.map(w => when(expr(w), matches === lit(1L))).getOrElse(matches === lit(1L)))
}

/** Predefined patterns (reference capability: analyzers/PatternMatch.scala:107-119). */
object Patterns {
  val EMAIL: String = """(?i)[a-z0-9!#$%&'*+\/=?^_`{|}~-]+(?:\.[a-z0-9!#$%&'*+\/=?^_`{|}~-]+)*@(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"""
  val URL: String = """(https?|ftp)://[^\s/$.?#].[^\s]*"""
  val SOCIAL_SECURITY_NUMBER_US: String = """((?!219-09-9999|078-05-1120)(?!666|000|9\d{2})\d{3}-(?!00)\d{2}-(?!0{4})\d{4})|((?!219 09 9999|078 05 1120)(?!666|000|9\d{2})\d{3} (?!00)\d{2} (?!0{4})\d{4})|((?!219099999|078051120)(?!666|000|9\d{2})\d{3}(?!00)\d{2}(?!0{4})\d{4})"""
  val CREDITCARD: String = """\b(?:3[47]\d{2}([\ \-]?)\d{6}\1\d|(?:(?:4\d|5[1-5]|65)\d{2}|6011)([\ \-]?)\d{4}\2\d{4}\2)\d{4}\b"""
}

/** Minimum numeric value (reference capability: analyzers/Minimum.scala:45). */
case class Minimum(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[MinState]("Minimum", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    min(conditionalSelection(col(column), where)).cast(DoubleType) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[MinState] =
    doubleAt(result, offset).map(MinState)
}

/** Maximum numeric value (reference capability: analyzers/Maximum.scala:45). */
case class Maximum(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[MaxState]("Maximum", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    max(conditionalSelection(col(column), where)).cast(DoubleType) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[MaxState] =
    doubleAt(result, offset).map(MaxState)
}

/** max - min (reference capability: analyzers/Range.scala:39). */
case class ValueRange(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[MinMaxState]("Range", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] = Seq(
    min(conditionalSelection(col(column), where)).cast(DoubleType),
    max(conditionalSelection(col(column), where)).cast(DoubleType))

  override def fromAggregationResult(result: Row, offset: Int): Option[MinMaxState] =
    for {
      mn <- doubleAt(result, offset)
      mx <- doubleAt(result, offset + 1)
    } yield MinMaxState(mn, mx)
}

/** Arithmetic mean; state keeps (sum, count) for mergeability
  * (reference capability: analyzers/Mean.scala:36).
  */
case class Mean(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[MeanState]("Mean", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] = Seq(
    sum(conditionalSelection(col(column), where)).cast(DoubleType),
    count(conditionalSelection(col(column), where)))

  override def fromAggregationResult(result: Row, offset: Int): Option[MeanState] =
    doubleAt(result, offset).map(s => MeanState(s, longAt(result, offset + 1)))
}

/** Sum (reference capability: analyzers/Sum.scala:36). */
case class Sum(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[SumState]("Sum", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    sum(conditionalSelection(col(column), where)).cast(DoubleType) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[SumState] =
    doubleAt(result, offset).map(SumState)
}

/** sum(numerator) / sum(denominator)
  * (reference capability: analyzers/RatioOfSums.scala:54).
  */
case class RatioOfSums(numerator: String, denominator: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[SumPairState]("RatioOfSums",
      s"$numerator,$denominator", Entity.Multicolumn) {

  override def preconditions: Seq[StructType => Unit] = Seq(
    hasColumn(numerator), isNumeric(numerator), hasColumn(denominator), isNumeric(denominator))

  override def aggregationFunctions(): Seq[Column] = Seq(
    sum(conditionalSelection(col(numerator), where)).cast(DoubleType),
    sum(conditionalSelection(col(denominator), where)).cast(DoubleType))

  override def fromAggregationResult(result: Row, offset: Int): Option[SumPairState] =
    for {
      num <- doubleAt(result, offset)
      den <- doubleAt(result, offset + 1)
    } yield SumPairState(num, den)
}

/** Count of zero values (reference capability: analyzers/ZerosCount.scala:25). */
case class ZerosCount(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[NumMatches]("ZerosCount", column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isNumeric(column) :: Nil

  override def aggregationFunctions(): Seq[Column] =
    coalesce(sum(conditionalSelection(
      when(col(column) === lit(0), lit(1L)).otherwise(lit(0L)), where)), lit(0L)) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[NumMatches] =
    Some(NumMatches(longAt(result, offset)))
}

/** Shared implementation of Min/MaxLength (reference capability:
  * analyzers/MinLength.scala:34, MaxLength.scala:34).
  */
abstract class LengthAnalyzer[S <: DoubleValuedState[S]](
    metricName: String,
    column: String,
    where: Option[String],
    nullBehavior: NullBehavior
) extends StandardScanShareableAnalyzer[S](metricName, column) {

  override def preconditions: Seq[StructType => Unit] =
    hasColumn(column) :: isString(column) :: Nil

  protected def lengthColumn: Column = {
    val raw = nullBehavior match {
      case NullBehavior.Ignore      => length(col(column)).cast(DoubleType)
      case NullBehavior.EmptyString => length(coalesce(col(column), lit(""))).cast(DoubleType)
      case NullBehavior.Fail =>
        when(col(column).isNull, lit(Double.NaN)).otherwise(length(col(column)).cast(DoubleType))
    }
    conditionalSelection(raw, where)
  }
}

case class MinLength(column: String, where: Option[String] = None,
    nullBehavior: NullBehavior = NullBehavior.Ignore)
    extends LengthAnalyzer[MinState]("MinLength", column, where, nullBehavior) {

  // Fail poisons with NaN, but Spark's min DISCARDS NaN (it sorts greatest)
  // — a null would be silently ignored, making Fail behave like Ignore.
  // Detect surviving nulls explicitly and poison the result.
  override def aggregationFunctions(): Seq[Column] = nullBehavior match {
    case NullBehavior.Fail => Seq(
      when(coalesce(sum(conditionalSelection(
            col(column).isNull.cast(LongType), where)), lit(0L)) > 0,
          lit(Double.NaN))
        .otherwise(min(lengthColumn)))
    case _ => min(lengthColumn) :: Nil
  }

  override def fromAggregationResult(result: Row, offset: Int): Option[MinState] =
    doubleAt(result, offset).map(MinState)
}

case class MaxLength(column: String, where: Option[String] = None,
    nullBehavior: NullBehavior = NullBehavior.Ignore)
    extends LengthAnalyzer[MaxState]("MaxLength", column, where, nullBehavior) {

  override def aggregationFunctions(): Seq[Column] = max(lengthColumn) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[MaxState] =
    doubleAt(result, offset).map(MaxState)
}

/** Approximate distinct count backed by Spark's built-in DataSketches HLL
  * aggregate — the binary sketch IS the mergeable state, replacing the
  * reference's 400-line custom HLL++ implementation (reference capability:
  * analyzers/ApproxCountDistinct.scala:47, catalyst/StatefulHyperloglogPlus.scala:33).
  */
case class ApproxCountDistinct(column: String, where: Option[String] = None)
    extends StandardScanShareableAnalyzer[HllState]("ApproxCountDistinct", column) {

  override def preconditions: Seq[StructType => Unit] = hasColumn(column) :: Nil

  // xxhash64 first: makes the sketch type-agnostic (hll_sketch_agg only
  // accepts int/long/string/binary) and cheap for wide types; collisions
  // are far below the sketch's own error at HLL precision
  override def aggregationFunctions(): Seq[Column] =
    hll_sketch_agg(
      when(conditionalSelection(col(column), where).isNotNull,
        xxhash64(conditionalSelection(col(column), where))),
      lit(HllState.LG_K)) :: Nil

  override def fromAggregationResult(result: Row, offset: Int): Option[HllState] =
    if (result.isNullAt(offset)) None
    else Some(HllState(result.getAs[Array[Byte]](offset)))
}
