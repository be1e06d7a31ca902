package graft.checks

import scala.util.{Failure, Success, Try}

import graft.core._

sealed trait ConstraintStatus
object ConstraintStatus {
  case object Success extends ConstraintStatus
  case object Failure extends ConstraintStatus
}

case class ConstraintResult(
    constraint: Constraint,
    status: ConstraintStatus,
    message: Option[String] = None,
    metric: Option[Metric[_]] = None)

/** A constraint is an assertion over a metric produced by one analyzer
  * (reference capability: constraints/Constraint.scala,
  * constraints/AnalysisBasedConstraint.scala:26-120).
  *
  * `picker` projects the metric value into the Double the assertion sees
  * (e.g. a histogram's bin count); the default picks a DoubleMetric value.
  */
case class Constraint(
    name: String,
    analyzer: AnyAnalyzer,
    assertion: Double => Boolean,
    picker: Metric[_] => Try[Double] = Constraint.defaultPicker,
    hint: Option[String] = None) {

  def evaluate(metrics: Map[AnyAnalyzer, Metric[_]]): ConstraintResult = {
    metrics.get(analyzer) match {
      case Some(metric) =>
        picker(metric) match {
          case Success(value) =>
            val holds = Try(assertion(value))
            holds match {
              case Success(true) =>
                ConstraintResult(this, ConstraintStatus.Success, None, Some(metric))
              case Success(false) =>
                ConstraintResult(this, ConstraintStatus.Failure,
                  Some(s"Value: $value does not meet the constraint requirement!" +
                    hint.map(h => s" $h").getOrElse("")),
                  Some(metric))
              case Failure(e) =>
                ConstraintResult(this, ConstraintStatus.Failure,
                  Some(s"Can't execute the assertion: ${e.getMessage}!"), Some(metric))
            }
          case Failure(e: EmptyStateException)
              if Constraint.whereOf(analyzer).isDefined =>
            // reference semantics: a WHERE that filters out every row makes
            // the constraint trivially satisfied
            // (constraints/AnalysisBasedConstraint.scala:78-120).
            // An empty VALUE state is ambiguous though: it also arises when
            // rows SURVIVED the filter but every value was NULL — a
            // genuinely failing check. The suite injects a Size(where)
            // probe into the same fused scan; when it shows surviving
            // rows, this is a real failure, not a trivial pass.
            val survivingRows = metrics
              .get(graft.operators.Size(Constraint.whereOf(analyzer)))
              .map(_.value).collect { case Success(n: Double) => n }
            survivingRows match {
              case Some(n) if n > 0 =>
                ConstraintResult(this, ConstraintStatus.Failure,
                  Some(s"${n.toLong} rows survive the filter but the state " +
                    "is empty (all surviving values NULL)"), Some(metric))
              case _ =>
                ConstraintResult(this, ConstraintStatus.Success,
                  Some("All rows were filtered out; constraint trivially holds"),
                  Some(metric))
            }
          case Failure(e) =>
            ConstraintResult(this, ConstraintStatus.Failure,
              Some(Option(e.getMessage).getOrElse(e.toString)), Some(metric))
        }
      case None =>
        ConstraintResult(this, ConstraintStatus.Failure,
          Some(s"Missing Analysis, can't run the constraint!"), None)
    }
  }

  override def toString: String = s"$name(${analyzer.name}(${analyzer.instance}))"
}

object Constraint {

  /** Fraction of NON-NULL values conforming to an expected semantic type
    * from a DataType distribution. Integral values conform to Fractional
    * (every integer is a valid fractional) and everything non-null
    * conforms to String. The raw bin ratio — nulls in the denominator,
    * integers excluded from the Fractional bin — made `== 1.0` type
    * assertions unsatisfiable on any incomplete or mixed column,
    * including the very data a type suggestion was derived from.
    */
  def dataTypeConformancePicker(expected: String): Metric[_] => Try[Double] =
    distributionPicker { dist =>
      import graft.operators.DataTypeInstances
      def cnt(k: String) = dist.values.get(k).map(_.absolute).getOrElse(0L)
      val nonNull = cnt(DataTypeInstances.Boolean) + cnt(DataTypeInstances.Integral) +
        cnt(DataTypeInstances.Fractional) + cnt(DataTypeInstances.String)
      val conforming =
        if (expected == DataTypeInstances.Fractional)
          cnt(DataTypeInstances.Integral) + cnt(DataTypeInstances.Fractional)
        else if (expected == DataTypeInstances.String) nonNull
        else cnt(expected)
      if (nonNull == 0) 1.0 else conforming.toDouble / nonNull
    }

  /** Size(where) probes for every where-carrying analyzer — fused into
    * the SAME scan by the runner, so they cost no extra pass. They let
    * the EmptyStateException branch distinguish all-rows-filtered (a
    * trivial pass) from rows-survived-but-all-values-NULL (a real
    * failure).
    */
  private[checks] def whereSizeProbes(analyzers: Seq[AnyAnalyzer]): Seq[AnyAnalyzer] =
    analyzers
      .flatMap(a => whereOf(a).map(w => graft.operators.Size(Some(w))))
      .distinct

  /** The analyzer's WHERE filter, if it has one. */
  def whereOf(analyzer: AnyAnalyzer): Option[String] = {
    import graft.operators._
    analyzer match {
      case a: Size => a.where
      case a: Completeness => a.where
      case a: Compliance => a.where
      case a: PatternMatch => a.where
      case a: Minimum => a.where
      case a: Maximum => a.where
      case a: ValueRange => a.where
      case a: Mean => a.where
      case a: Sum => a.where
      case a: RatioOfSums => a.where
      case a: ZerosCount => a.where
      case a: MinLength => a.where
      case a: MaxLength => a.where
      case a: ApproxCountDistinct => a.where
      case a: StandardDeviation => a.where
      case a: Variance => a.where
      case a: Skewness => a.where
      case a: Kurtosis => a.where
      case a: Correlation => a.where
      case a: ApproxQuantile => a.where
      case a: ApproxQuantiles => a.where
      case a: ExactQuantile => a.where
      case a: InterquartileRange => a.where
      case a: DataTypeAnalyzer => a.where
      case a: GroupingAnalyzer[_] => a.where
      case a: Histogram => a.where
      case a: HistogramBinned => a.where
      case a: graft.sketch.KLLSketchAnalyzer => a.where
      case _ => None
    }
  }

  val defaultPicker: Metric[_] => Try[Double] = {
    case DoubleMetric(_, _, _, value, _) => value
    case other => other.value.flatMap {
      case d: Double => Success(d)
      case v => Failure(new MetricCalculationException(
        s"Metric value $v of ${other.name} is not a Double"))
    }
  }

  /** Picks from a HistogramMetric's distribution. */
  def distributionPicker(f: Distribution => Double): Metric[_] => Try[Double] = {
    case HistogramMetric(_, value) => value.map(f)
    case other => Failure(new MetricCalculationException(
      s"Metric ${other.name} is not a histogram"))
  }
}
