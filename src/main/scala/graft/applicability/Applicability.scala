package graft.applicability

import scala.util.Try

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.checks.Check
import graft.core._
import graft.runners.AnalysisRunner

/** Dry-runs checks/analyzers against deterministic generated data matching
  * a schema, to tell whether they are applicable before touching real data
  * (reference capability: analyzers/applicability/Applicability.scala:170-280).
  */
class Applicability(spark: SparkSession) {

  private val rng = new scala.util.Random(42)

  private def randomValue(dataType: DataType): Any = dataType match {
    case StringType => rng.alphanumeric.take(8).mkString
    case IntegerType => rng.nextInt(1000)
    case LongType => rng.nextLong() % 100000L
    case ShortType => rng.nextInt(Short.MaxValue).toShort
    case ByteType => rng.nextInt(Byte.MaxValue).toByte
    case FloatType => rng.nextFloat() * 100
    case DoubleType => rng.nextDouble() * 100
    case BooleanType => rng.nextBoolean()
    case d: DecimalType =>
      new java.math.BigDecimal(rng.nextInt(1000)).setScale(d.scale)
    case TimestampType => new java.sql.Timestamp(1700000000000L + rng.nextInt(1000000))
    case DateType => new java.sql.Date(1700000000000L + rng.nextInt(1000000))
    case other => throw new IllegalArgumentException(s"Cannot generate data for $other")
  }

  private def generate(schema: StructType, numRows: Int = 100) = {
    val rows = (0 until numRows).map { _ =>
      Row(schema.fields.map { f =>
        if (f.nullable && rng.nextDouble() < 0.1) null else randomValue(f.dataType)
      }.toSeq: _*)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  case class CheckApplicability(
      isApplicable: Boolean,
      failures: Seq[(String, Option[Throwable])],
      constraintApplicabilities: Map[String, Boolean])

  case class AnalyzersApplicability(
      isApplicable: Boolean,
      failures: Seq[(String, Option[Throwable])])

  /** Can this check run against data of the given schema? */
  def isApplicable(check: Check, schema: StructType): CheckApplicability = {
    val data = generate(schema)
    val ctx = AnalysisRunner.run(data, check.requiredAnalyzers())
    val perConstraint = check.constraints.map { c =>
      val ok = ctx.metric(c.analyzer).exists(_.value.isSuccess)
      c.toString -> ok
    }.toMap
    val failures = check.requiredAnalyzers().flatMap { a =>
      ctx.metric(a).map(_.value) match {
        case Some(scala.util.Failure(e)) => Some(a.toString -> Option(e))
        case None => Some(a.toString -> None)
        case _ => None
      }
    }
    CheckApplicability(failures.isEmpty, failures, perConstraint)
  }

  /** Can these analyzers run against data of the given schema? */
  def isApplicable(analyzers: Seq[AnyAnalyzer], schema: StructType): AnalyzersApplicability = {
    val data = generate(schema)
    val ctx = AnalysisRunner.run(data, analyzers)
    val failures = analyzers.flatMap { a =>
      ctx.metric(a).map(_.value) match {
        case Some(scala.util.Failure(e)) => Some(a.toString -> Option(e))
        case None => Some(a.toString -> None)
        case _ => None
      }
    }
    AnalyzersApplicability(failures.isEmpty, failures)
  }
}
