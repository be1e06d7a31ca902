package graft.repository

import scala.util.{Failure, Success, Try}

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.core._
import graft.operators._
import graft.runners.AnalyzerContext

/** JSON round-trip for analysis results
  * (reference capability: repository/AnalysisResultSerde.scala).
  *
  * Analyzers serialize to a typed parameter object so a repository written
  * by one run can be queried by analyzer instance in a later run.
  */
object AnalysisResultSerde {

  // -- analyzer <-> json ------------------------------------------------------

  private def whereJson(where: Option[String]): JValue =
    where.map(JString).getOrElse(JNull)

  def analyzerToJson(a: AnyAnalyzer): JValue = a match {
    case Size(w) => ("type" -> "Size") ~ ("where" -> w)
    case Completeness(c, w) => ("type" -> "Completeness") ~ ("column" -> c) ~ ("where" -> w)
    case Compliance(i, p, w) =>
      ("type" -> "Compliance") ~ ("instance" -> i) ~ ("predicate" -> p) ~ ("where" -> w)
    case PatternMatch(c, p, w) =>
      ("type" -> "PatternMatch") ~ ("column" -> c) ~ ("pattern" -> p) ~ ("where" -> w)
    case Minimum(c, w) => ("type" -> "Minimum") ~ ("column" -> c) ~ ("where" -> w)
    case Maximum(c, w) => ("type" -> "Maximum") ~ ("column" -> c) ~ ("where" -> w)
    case Mean(c, w) => ("type" -> "Mean") ~ ("column" -> c) ~ ("where" -> w)
    case Sum(c, w) => ("type" -> "Sum") ~ ("column" -> c) ~ ("where" -> w)
    case ValueRange(c, w) => ("type" -> "Range") ~ ("column" -> c) ~ ("where" -> w)
    case RatioOfSums(n, d, w) =>
      ("type" -> "RatioOfSums") ~ ("numerator" -> n) ~ ("denominator" -> d) ~ ("where" -> w)
    case ZerosCount(c, w) => ("type" -> "ZerosCount") ~ ("column" -> c) ~ ("where" -> w)
    case MinLength(c, w, nb) => ("type" -> "MinLength") ~ ("column" -> c) ~
      ("where" -> w) ~ ("nullBehavior" -> nb.toString)
    case MaxLength(c, w, nb) => ("type" -> "MaxLength") ~ ("column" -> c) ~
      ("where" -> w) ~ ("nullBehavior" -> nb.toString)
    case StandardDeviation(c, w) =>
      ("type" -> "StandardDeviation") ~ ("column" -> c) ~ ("where" -> w)
    case Variance(c, w) => ("type" -> "Variance") ~ ("column" -> c) ~ ("where" -> w)
    case Skewness(c, w) => ("type" -> "Skewness") ~ ("column" -> c) ~ ("where" -> w)
    case Kurtosis(c, w) => ("type" -> "Kurtosis") ~ ("column" -> c) ~ ("where" -> w)
    case Correlation(a1, a2, w) =>
      ("type" -> "Correlation") ~ ("first" -> a1) ~ ("second" -> a2) ~ ("where" -> w)
    case ApproxCountDistinct(c, w) =>
      ("type" -> "ApproxCountDistinct") ~ ("column" -> c) ~ ("where" -> w)
    case ExactQuantile(c, q, w) =>
      ("type" -> "ExactQuantile") ~ ("column" -> c) ~ ("quantile" -> q) ~ ("where" -> w)
    case ApproxQuantile(c, q, e, w) =>
      ("type" -> "ApproxQuantile") ~ ("column" -> c) ~ ("quantile" -> q) ~
        ("relativeError" -> e) ~ ("where" -> w)
    case InterquartileRange(c, w) =>
      ("type" -> "InterquartileRange") ~ ("column" -> c) ~ ("where" -> w)
    case Uniqueness(cols, w) =>
      ("type" -> "Uniqueness") ~ ("columns" -> cols) ~ ("where" -> w)
    case UniqueValueRatio(cols, w) =>
      ("type" -> "UniqueValueRatio") ~ ("columns" -> cols) ~ ("where" -> w)
    case Distinctness(cols, w) =>
      ("type" -> "Distinctness") ~ ("columns" -> cols) ~ ("where" -> w)
    case CountDistinct(cols) => ("type" -> "CountDistinct") ~ ("columns" -> cols)
    case Entropy(c, w) => ("type" -> "Entropy") ~ ("column" -> c) ~ ("where" -> w)
    case DuplicateRowCount(cols, w) =>
      ("type" -> "DuplicateRowCount") ~ ("columns" -> cols) ~ ("where" -> w)
    case MutualInformation(cols, w) =>
      ("type" -> "MutualInformation") ~ ("columns" -> cols) ~ ("where" -> w)
    case DataTypeAnalyzer(c, w) => ("type" -> "DataType") ~ ("column" -> c) ~ ("where" -> w)
    case ColumnCount() => JObject("type" -> JString("ColumnCount"))
    case ColumnExists(c) => ("type" -> "ColumnExists") ~ ("column" -> c)
    case CustomSql(e) => ("type" -> "CustomSql") ~ ("expression" -> e)
    case Histogram(c, None, bins, w, ratio, agg) =>
      ("type" -> "Histogram") ~ ("column" -> c) ~ ("maxDetailBins" -> bins) ~
        ("where" -> w) ~ ("computeFrequenciesAsRatio" -> ratio) ~
        ("aggColumn" -> (agg match {
          case HistogramAggregate.SumAggregate(ac) => Some(ac)
          case _ => None
        }))
    case HistogramBinned(c, binCount, edges, w) =>
      ("type" -> "HistogramBinned") ~ ("column" -> c) ~ ("binCount" -> binCount) ~
        ("customEdges" -> edges) ~ ("where" -> w)
    case ApproxQuantiles(c, qs, e, w) =>
      ("type" -> "ApproxQuantiles") ~ ("column" -> c) ~ ("quantiles" -> qs.toList) ~
        ("relativeError" -> e) ~ ("where" -> w)
    case k: graft.sketch.KLLSketchAnalyzer =>
      ("type" -> "KLL") ~ ("column" -> k.column) ~
        ("sketchSize" -> k.parameters.sketchSize) ~
        ("shrinkingFactor" -> k.parameters.shrinkingFactor) ~
        ("numberOfBuckets" -> k.parameters.numberOfBuckets) ~ ("where" -> k.where)
    // function-valued analyzers (custom aggregators, binning lambdas,
    // dataset-holding comparisons) have no faithful JSON form
    case other =>
      ("type" -> "Opaque") ~ ("descriptor" -> other.toString)
  }

  private def str(j: JValue, field: String): String =
    (j \ field) match { case JString(s) => s; case _ => throw new IllegalArgumentException(field) }

  private def nullBehavior(j: JValue): NullBehavior =
    strOpt(j, "nullBehavior") match {
      case Some("EmptyString") => NullBehavior.EmptyString
      case Some("Fail") => NullBehavior.Fail
      case _ => NullBehavior.Ignore
    }

  private def strOpt(j: JValue, field: String): Option[String] =
    (j \ field) match { case JString(s) => Some(s); case _ => None }

  private def dbl(j: JValue, field: String): Double =
    (j \ field) match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case _ => throw new IllegalArgumentException(field)
    }

  private def strSeq(j: JValue, field: String): Seq[String] =
    (j \ field) match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Seq.empty
    }

  def analyzerFromJson(j: JValue): Option[AnyAnalyzer] = Try[AnyAnalyzer] {
    str(j, "type") match {
      case "Size" => Size(strOpt(j, "where"))
      case "Completeness" => Completeness(str(j, "column"), strOpt(j, "where"))
      case "Compliance" => Compliance(str(j, "instance"), str(j, "predicate"), strOpt(j, "where"))
      case "PatternMatch" => PatternMatch(str(j, "column"), str(j, "pattern"), strOpt(j, "where"))
      case "Minimum" => Minimum(str(j, "column"), strOpt(j, "where"))
      case "Maximum" => Maximum(str(j, "column"), strOpt(j, "where"))
      case "Mean" => Mean(str(j, "column"), strOpt(j, "where"))
      case "Sum" => Sum(str(j, "column"), strOpt(j, "where"))
      case "Range" => ValueRange(str(j, "column"), strOpt(j, "where"))
      case "RatioOfSums" =>
        RatioOfSums(str(j, "numerator"), str(j, "denominator"), strOpt(j, "where"))
      case "ZerosCount" => ZerosCount(str(j, "column"), strOpt(j, "where"))
      case "MinLength" =>
        MinLength(str(j, "column"), strOpt(j, "where"), nullBehavior(j))
      case "MaxLength" =>
        MaxLength(str(j, "column"), strOpt(j, "where"), nullBehavior(j))
      case "StandardDeviation" => StandardDeviation(str(j, "column"), strOpt(j, "where"))
      case "Variance" => Variance(str(j, "column"), strOpt(j, "where"))
      case "Skewness" => Skewness(str(j, "column"), strOpt(j, "where"))
      case "Kurtosis" => Kurtosis(str(j, "column"), strOpt(j, "where"))
      case "Correlation" => Correlation(str(j, "first"), str(j, "second"), strOpt(j, "where"))
      case "ApproxCountDistinct" => ApproxCountDistinct(str(j, "column"), strOpt(j, "where"))
      case "ExactQuantile" =>
        ExactQuantile(str(j, "column"), dbl(j, "quantile"), strOpt(j, "where"))
      case "ApproxQuantile" =>
        ApproxQuantile(str(j, "column"), dbl(j, "quantile"), dbl(j, "relativeError"),
          strOpt(j, "where"))
      case "InterquartileRange" => InterquartileRange(str(j, "column"), strOpt(j, "where"))
      case "Uniqueness" => Uniqueness(strSeq(j, "columns"), strOpt(j, "where"))
      case "UniqueValueRatio" => UniqueValueRatio(strSeq(j, "columns"), strOpt(j, "where"))
      case "Distinctness" => Distinctness(strSeq(j, "columns"), strOpt(j, "where"))
      case "CountDistinct" => CountDistinct(strSeq(j, "columns"))
      case "Entropy" => Entropy(str(j, "column"), strOpt(j, "where"))
      case "DuplicateRowCount" => DuplicateRowCount(strSeq(j, "columns"), strOpt(j, "where"))
      case "MutualInformation" => MutualInformation(strSeq(j, "columns"), strOpt(j, "where"))
      case "DataType" => DataTypeAnalyzer(str(j, "column"), strOpt(j, "where"))
      case "ColumnCount" => ColumnCount()
      case "ColumnExists" => ColumnExists(str(j, "column"))
      case "CustomSql" => CustomSql(str(j, "expression"))
      case "Histogram" =>
        Histogram(str(j, "column"), None,
          int(j, "maxDetailBins"), strOpt(j, "where"),
          bool(j, "computeFrequenciesAsRatio", default = true),
          strOpt(j, "aggColumn")
            .map(HistogramAggregate.SumAggregate(_): HistogramAggregate)
            .getOrElse(HistogramAggregate.CountAggregate))
      case "HistogramBinned" =>
        HistogramBinned(str(j, "column"), intOpt(j, "binCount"),
          dblSeqOpt(j, "customEdges"), strOpt(j, "where"))
      case "ApproxQuantiles" =>
        ApproxQuantiles(str(j, "column"), dblSeq(j, "quantiles"),
          dbl(j, "relativeError"), strOpt(j, "where"))
      case "KLL" =>
        graft.sketch.KLLSketchAnalyzer(str(j, "column"),
          graft.sketch.KLLParameters(int(j, "sketchSize"), dbl(j, "shrinkingFactor"),
            int(j, "numberOfBuckets")), strOpt(j, "where"))
      case other => throw new IllegalArgumentException(s"Unknown analyzer type $other")
    }
  }.toOption

  private def int(j: JValue, field: String): Int =
    (j \ field) match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case JDouble(d) => d.toInt
      case _ => throw new IllegalArgumentException(field)
    }

  private def intOpt(j: JValue, field: String): Option[Int] =
    Try(int(j, field)).toOption

  private def bool(j: JValue, field: String, default: Boolean): Boolean =
    (j \ field) match { case JBool(b) => b; case _ => default }

  private def dblSeq(j: JValue, field: String): Seq[Double] =
    (j \ field) match {
      case JArray(vs) => vs.collect {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JLong(l) => l.toDouble
      }
      case _ => Seq.empty
    }

  private def dblSeqOpt(j: JValue, field: String): Option[Seq[Double]] =
    (j \ field) match {
      case JArray(_) => Some(dblSeq(j, field))
      case _ => None
    }

  // -- results <-> json -------------------------------------------------------

  /** Serialize successful metrics of every typed kind: double, keyed,
    * attribute, histogram and KLL (sketch embedded as base64, so the
    * round-tripped metric remains mergeable/queryable). Failed metrics are
    * never persisted (as in the reference). With `failOnUnsupported`,
    * successful metrics that have no JSON form (e.g. function-valued
    * custom aggregators under an Opaque analyzer) raise instead of being
    * silently dropped.
    */
  def serialize(results: Seq[AnalysisResult], failOnUnsupported: Boolean = false): String = {
    def metricJson(a: AnyAnalyzer, m: Metric[_]): Option[JValue] = m match {
      case DoubleMetric(entity, name, instance, Success(v), _) =>
        Some(("analyzer" -> analyzerToJson(a)) ~ ("kind" -> "double") ~
          ("entity" -> entity.repr) ~ ("name" -> name) ~
          ("instance" -> instance) ~ ("value" -> v))
      case KeyedDoubleMetric(entity, name, instance, Success(kv)) =>
        Some(("analyzer" -> analyzerToJson(a)) ~ ("kind" -> "keyed") ~
          ("entity" -> entity.repr) ~ ("name" -> name) ~
          ("instance" -> instance) ~ ("values" -> kv))
      case AttributeDoubleMetric(entity, name, instance, Success(kv)) =>
        Some(("analyzer" -> analyzerToJson(a)) ~ ("kind" -> "attribute") ~
          ("entity" -> entity.repr) ~ ("name" -> name) ~
          ("instance" -> instance) ~ ("values" -> kv))
      case HistogramMetric(column, Success(dist)) =>
        Some(("analyzer" -> analyzerToJson(a)) ~ ("kind" -> "histogram") ~
          ("instance" -> column) ~ ("numberOfBins" -> dist.numberOfBins) ~
          ("values" -> JObject(dist.values.toList.map { case (k, dv) =>
            k -> (("absolute" -> dv.absolute) ~ ("ratio" -> dv.ratio)): JField
          })))
      case km: graft.sketch.KLLMetric if km.value.isSuccess =>
        val d = km.value.get
        Some(("analyzer" -> analyzerToJson(a)) ~ ("kind" -> "kll") ~
          ("instance" -> km.instance) ~
          ("buckets" -> JArray(d.buckets.toList.map(b =>
            ("low" -> b.lowValue) ~ ("high" -> b.highValue) ~ ("count" -> b.count)))) ~
          ("parameters" -> d.parameters.toList) ~
          ("sketch" -> java.util.Base64.getEncoder.encodeToString(d.sketch.serialize())))
      case _ => None
    }
    val json = JArray(results.toList.map { r =>
      val entries = r.analyzerContext.metricMap.toList
      val metrics = entries.flatMap { case (a, m) => metricJson(a, m) }
      if (failOnUnsupported) {
        val dropped = entries.filter { case (a, m) =>
          m.value.isSuccess && metricJson(a, m).isEmpty
        }
        if (dropped.nonEmpty) {
          throw new MetricCalculationException(
            "Metrics without a JSON form: " + dropped.map(_._2.name).mkString(", "))
        }
      }
      ("resultKey" ->
        (("dataSetDate" -> r.resultKey.dataSetDate) ~ ("tags" -> r.resultKey.tags))) ~
        ("metrics" -> JArray(metrics))
    })
    JsonMethods.pretty(JsonMethods.render(json))
  }

  def deserialize(jsonStr: String): Seq[AnalysisResult] = {
    val json = JsonMethods.parse(jsonStr)
    json match {
      case JArray(entries) => entries.flatMap { e =>
        Try {
          val dataSetDate = (e \ "resultKey" \ "dataSetDate") match {
            case JInt(i) => i.toLong
            case JLong(l) => l
            case _ => 0L
          }
          val tags = (e \ "resultKey" \ "tags") match {
            case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          val metrics: Seq[(AnyAnalyzer, Metric[_])] = (e \ "metrics") match {
            case JArray(ms) => ms.flatMap { m =>
              // per-METRIC containment: one corrupted entry (e.g. a
              // truncated base64 KLL sketch) must not discard the other
              // metrics of the same snapshot
              Try(analyzerFromJson(m \ "analyzer").map { a =>
                a -> metricFromJson(m)
              }).toOption.flatten
            }
            case _ => Seq.empty
          }
          AnalysisResult(ResultKey(dataSetDate, tags), AnalyzerContext(metrics.toMap))
        }.toOption
      }
      case _ => Seq.empty
    }
  }

  private def dblMap(j: JValue, field: String): Map[String, Double] =
    (j \ field) match {
      case JObject(fields) => fields.collect {
        case (k, JDouble(d)) => k -> d
        case (k, JInt(i)) => k -> i.toDouble
        case (k, JLong(l)) => k -> l.toDouble
      }.toMap
      case _ => Map.empty
    }

  private def metricFromJson(m: JValue): Metric[_] =
    strOpt(m, "kind").getOrElse("double") match {
      case "keyed" =>
        KeyedDoubleMetric(Entity.fromString(str(m, "entity")), str(m, "name"),
          str(m, "instance"), Success(dblMap(m, "values")))
      case "attribute" =>
        AttributeDoubleMetric(Entity.fromString(str(m, "entity")), str(m, "name"),
          str(m, "instance"), Success(dblMap(m, "values")))
      case "histogram" =>
        val values = (m \ "values") match {
          case JObject(fields) => fields.map { case (k, v) =>
            k -> DistributionValue(
              (v \ "absolute") match {
                case JInt(i) => i.toLong; case JLong(l) => l
                case JDouble(d) => d.toLong; case _ => 0L
              },
              dbl(v, "ratio"))
          }.toMap
          case _ => Map.empty[String, DistributionValue]
        }
        HistogramMetric(str(m, "instance"),
          Success(Distribution(values, (m \ "numberOfBins") match {
            case JInt(i) => i.toLong; case JLong(l) => l; case _ => values.size.toLong
          })))
      case "kll" =>
        val buckets = (m \ "buckets") match {
          case JArray(bs) => bs.map(b => graft.sketch.BucketValue(
            dbl(b, "low"), dbl(b, "high"),
            (b \ "count") match {
              case JInt(i) => i.toLong; case JLong(l) => l
              case JDouble(d) => d.toLong; case _ => 0L
            }))
          case _ => Seq.empty
        }
        val sketch = graft.sketch.KLLSketch.deserialize(
          java.util.Base64.getDecoder.decode(str(m, "sketch")))
        graft.sketch.KLLMetric(str(m, "instance"),
          Success(graft.sketch.BucketDistribution(buckets, dblSeq(m, "parameters"), sketch)))
      case _ =>
        DoubleMetric(Entity.fromString(str(m, "entity")), str(m, "name"),
          str(m, "instance"), Success(dbl(m, "value")))
    }
}
