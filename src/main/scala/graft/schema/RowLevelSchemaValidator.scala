package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared column definitions for row-level schema validation
  * (reference capability: schema/RowLevelSchemaValidator.scala:73-230).
  */
sealed trait ColumnDefinition {
  def name: String
  def isNullable: Boolean

  /** Predicate: does the raw (string) value conform? */
  private[schema] def conforms: Column

  /** Typed output column. */
  private[schema] def converted: Column
}

case class StringColumnDefinition(
    name: String,
    isNullable: Boolean = true,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    matches: Option[String] = None) extends ColumnDefinition {

  private[schema] def conforms: Column = {
    val c = col(name)
    val checks = Seq(
      if (!isNullable) Some(c.isNotNull) else None,
      minLength.map(m => c.isNull || length(c) >= m),
      maxLength.map(m => c.isNull || length(c) <= m),
      // rlike, not regexp_extract =!= "": a legitimate empty-string match
      // (e.g. pattern ^[a-z]*$ on "") must count as conforming
      matches.map(re => c.isNull || c.rlike(re))
    ).flatten
    checks.reduceOption(_ && _).getOrElse(lit(true))
  }

  private[schema] def converted: Column = col(name).cast(StringType).as(name)
}

case class IntColumnDefinition(
    name: String,
    isNullable: Boolean = true,
    minValue: Option[Int] = None,
    maxValue: Option[Int] = None) extends ColumnDefinition {

  private[schema] def conforms: Column = {
    val c = col(name)
    // try_cast: null on non-conforming input even under ANSI mode
    val casted = c.try_cast(IntegerType)
    val checks = Seq(
      Some(c.isNull || casted.isNotNull), // castable
      if (!isNullable) Some(c.isNotNull) else None,
      minValue.map(m => c.isNull || casted >= m),
      maxValue.map(m => c.isNull || casted <= m)
    ).flatten
    checks.reduce(_ && _)
  }

  private[schema] def converted: Column = col(name).try_cast(IntegerType).as(name)
}

case class DecimalColumnDefinition(
    name: String,
    precision: Int,
    scale: Int,
    isNullable: Boolean = true) extends ColumnDefinition {

  private[schema] def conforms: Column = {
    val c = col(name)
    val casted = c.try_cast(DecimalType(precision, scale))
    if (isNullable) c.isNull || casted.isNotNull
    else c.isNotNull && casted.isNotNull
  }

  private[schema] def converted: Column =
    col(name).try_cast(DecimalType(precision, scale)).as(name)
}

case class TimestampColumnDefinition(
    name: String,
    mask: String,
    isNullable: Boolean = true) extends ColumnDefinition {

  private[schema] def conforms: Column = {
    val c = col(name)
    val casted = try_to_timestamp(c, lit(mask))
    if (isNullable) c.isNull || casted.isNotNull
    else c.isNotNull && casted.isNotNull
  }

  private[schema] def converted: Column = try_to_timestamp(col(name), lit(mask)).as(name)
}

/** Declared row-level schema: ordered column definitions. */
case class RowLevelSchema(columnDefinitions: Seq[ColumnDefinition] = Seq.empty) {

  def withStringColumn(name: String, isNullable: Boolean = true,
      minLength: Option[Int] = None, maxLength: Option[Int] = None,
      matches: Option[String] = None): RowLevelSchema =
    RowLevelSchema(columnDefinitions :+
      StringColumnDefinition(name, isNullable, minLength, maxLength, matches))

  def withIntColumn(name: String, isNullable: Boolean = true,
      minValue: Option[Int] = None, maxValue: Option[Int] = None): RowLevelSchema =
    RowLevelSchema(columnDefinitions :+ IntColumnDefinition(name, isNullable, minValue, maxValue))

  def withDecimalColumn(name: String, precision: Int, scale: Int,
      isNullable: Boolean = true): RowLevelSchema =
    RowLevelSchema(columnDefinitions :+ DecimalColumnDefinition(name, precision, scale, isNullable))

  def withTimestampColumn(name: String, mask: String, isNullable: Boolean = true): RowLevelSchema =
    RowLevelSchema(columnDefinitions :+ TimestampColumnDefinition(name, mask, isNullable))
}

case class RowLevelSchemaValidationResult(
    validRows: DataFrame,
    numValidRows: Long,
    invalidRows: DataFrame,
    numInvalidRows: Long)

/** Splits data into conforming rows (typed per the declared schema) and
  * non-conforming raw rows — one cast-and-filter pass each, no UDFs
  * (reference capability: schema/RowLevelSchemaValidator.scala:47-68).
  */
object RowLevelSchemaValidator {

  def validate(data: DataFrame, schema: RowLevelSchema): RowLevelSchemaValidationResult = {
    require(schema.columnDefinitions.nonEmpty,
      "RowLevelSchema must declare at least one column definition")
    // the marker column would silently overwrite (and then discard) a
    // same-named user column in both outputs
    require(!data.columns.contains("graft_conforms"),
      "input data must not contain a column named 'graft_conforms' (reserved)")
    val conformance = schema.columnDefinitions.map(_.conforms).reduce(_ && _)

    // evaluate the conformance predicate ONCE: mark + persist, then both
    // counts come from one aggregation and the returned frames are cheap
    // filters over the marked data instead of re-running every cast/regex
    val marked = data
      .withColumn("graft_conforms", coalesce(conformance, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val countsRow = marked.agg(
      coalesce(sum(col("graft_conforms").cast("long")), lit(0L)),
      count(lit(1))).collect().head
    val numValid = countsRow.getLong(0)
    val numTotal = countsRow.getLong(1)

    val valid = marked
      .filter(col("graft_conforms"))
      .select(schema.columnDefinitions.map(_.converted): _*)
    val invalid = marked.filter(!col("graft_conforms")).drop("graft_conforms")

    // the marked cache lives until both splits are consumed (or the
    // lifecycle valve expires it) — NOT forever: one leaked 100-TB marked
    // frame per validate() call would pin executor storage for the session
    val Seq(validReleased, invalidReleased) = graft.pipeline.CacheLifecycle
      .releaseOnConsumeAll(Seq(valid, invalid), Seq(marked))

    RowLevelSchemaValidationResult(validReleased, numValid,
      invalidReleased, numTotal - numValid)
  }
}
