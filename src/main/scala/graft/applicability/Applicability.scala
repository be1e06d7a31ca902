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

  private def randomValue(dataType: DataType): Option[Any] = dataType match {
    case StringType => Some(rng.alphanumeric.take(8).mkString)
    case IntegerType => Some(rng.nextInt(1000))
    case LongType => Some(rng.nextLong() % 100000L)
    case ShortType => Some(rng.nextInt(Short.MaxValue).toShort)
    case ByteType => Some(rng.nextInt(Byte.MaxValue).toByte)
    case FloatType => Some(rng.nextFloat() * 100)
    case DoubleType => Some(rng.nextDouble() * 100)
    case BooleanType => Some(rng.nextBoolean())
    case d: DecimalType =>
      // integral part bounded by precision - scale so the value always
      // fits DecimalType(p, s) without overflow
      val intDigits = math.max(d.precision - d.scale, 0)
      val bound = math.min(math.pow(10, intDigits.toDouble), 1000.0).toInt
      Some(new java.math.BigDecimal(if (bound == 0) 0 else rng.nextInt(bound))
        .setScale(d.scale))
    case TimestampType => Some(new java.sql.Timestamp(1700000000000L + rng.nextInt(1000000)))
    case DateType => Some(new java.sql.Date(1700000000000L + rng.nextInt(1000000)))
    // unsupported (binary/array/struct/map...): generate null rather than
    // fail the whole dry-run — checks not referencing the column are
    // unaffected, ones that do surface a per-analyzer failure
    case _ => None
  }

  private def generate(schema: StructType, numRows: Int = 100) = {
    // columns we cannot generate become all-null and must read as nullable
    val genSchema = StructType(schema.fields.map { f =>
      if (randomValue(f.dataType).isEmpty) f.copy(nullable = true) else f
    })
    val rows = (0 until numRows).map { _ =>
      Row(genSchema.fields.map { f =>
        if (f.nullable && rng.nextDouble() < 0.1) null
        else randomValue(f.dataType).orNull
      }.toSeq: _*)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      genSchema)
  }

  case class CheckApplicability(
      isApplicable: Boolean,
      failures: Seq[(String, Option[Throwable])],
      constraintApplicabilities: Seq[(String, Boolean)])

  case class AnalyzersApplicability(
      isApplicable: Boolean,
      failures: Seq[(String, Option[Throwable])])

  /** Can this check run against data of the given schema? */
  def isApplicable(check: Check, schema: StructType): CheckApplicability = {
    val data = generate(schema)
    val ctx = AnalysisRunner.run(data, check.requiredAnalyzers())
    // Seq, not Map: distinct constraints can share a toString (same
    // analyzer name + instance) and must not collapse into one entry
    val perConstraint = check.constraints.map { c =>
      val ok = ctx.metric(c.analyzer).exists(_.value.isSuccess)
      c.toString -> ok
    }
    val failures = failuresOf(ctx, check.requiredAnalyzers())
    CheckApplicability(failures.isEmpty, failures, perConstraint)
  }

  /** Can these analyzers run against data of the given schema? */
  def isApplicable(analyzers: Seq[AnyAnalyzer], schema: StructType): AnalyzersApplicability = {
    val data = generate(schema)
    val ctx = AnalysisRunner.run(data, analyzers)
    val failures = failuresOf(ctx, analyzers)
    AnalyzersApplicability(failures.isEmpty, failures)
  }

  private def failuresOf(ctx: graft.runners.AnalyzerContext,
      analyzers: Seq[AnyAnalyzer]): Seq[(String, Option[Throwable])] =
    analyzers.flatMap { a =>
      ctx.metric(a).map(_.value) match {
        case Some(scala.util.Failure(e)) => Some(a.toString -> Option(e))
        case None => Some(a.toString -> None)
        case _ => None
      }
    }
}
