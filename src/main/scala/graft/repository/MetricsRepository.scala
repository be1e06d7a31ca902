package graft.repository

import scala.collection.concurrent.TrieMap
import scala.util.{Success, Try}

import graft.core._
import graft.runners.AnalyzerContext

/** Identifies one metrics snapshot: a timestamp plus free-form tags
  * (reference capability: repository/MetricsRepository.scala:25-51).
  */
case class ResultKey(dataSetDate: Long, tags: Map[String, String] = Map.empty)

case class AnalysisResult(resultKey: ResultKey, analyzerContext: AnalyzerContext)

/** Store + query interface for computed metrics over time — the substrate
  * for anomaly detection and metric reuse
  * (reference capability: repository/MetricsRepository.scala).
  */
trait MetricsRepository {
  def save(resultKey: ResultKey, analyzerContext: AnalyzerContext): Unit
  def loadByKey(resultKey: ResultKey): Option[AnalyzerContext]
  def load(): MetricsRepositoryMultipleResultsLoader
}

/** Fluent query over the stored results. */
trait MetricsRepositoryMultipleResultsLoader {
  def withTagValues(tagValues: Map[String, String]): MetricsRepositoryMultipleResultsLoader
  def forAnalyzers(analyzers: Seq[AnyAnalyzer]): MetricsRepositoryMultipleResultsLoader
  def after(dateTime: Long): MetricsRepositoryMultipleResultsLoader
  def before(dateTime: Long): MetricsRepositoryMultipleResultsLoader
  def get(): Seq[AnalysisResult]

  /** All stored success metrics as one (entity, instance, name, value,
    * dataset_date, tag...) DataFrame — tag columns sanitized and unioned
    * across results, null where a result lacks the tag (reference
    * capability: repository/MetricsRepositoryMultipleResultsLoader.scala:64,
    * AnalysisResult.getSuccessMetricsAsDataFrame).
    */
  def getSuccessMetricsAsDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      withTags: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val flat = MetricsRepositoryMultipleResultsLoader.flatten(get(), withTags)
    val tagColumns = flat.flatMap(_._6.keys).distinct
    val schema = StructType(
      Seq(
        StructField("entity", StringType, nullable = false),
        StructField("instance", StringType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("value", DoubleType, nullable = false),
        StructField("dataset_date", LongType, nullable = false)) ++
        tagColumns.map(StructField(_, StringType, nullable = true)))
    val rows = flat.map { case (entity, instance, name, value, date, tags) =>
      Row.fromSeq(Seq(entity, instance, name, value, date) ++
        tagColumns.map(tags.get(_).orNull))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Same rows as JSON (reference capability:
    * MetricsRepositoryMultipleResultsLoader.getSuccessMetricsAsJson).
    */
  def getSuccessMetricsAsJson(withTags: Seq[String] = Seq.empty): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val entries = MetricsRepositoryMultipleResultsLoader.flatten(get(), withTags).map {
      case (entity, instance, name, value, date, tags) =>
        tags.foldLeft(
          ("entity" -> entity) ~ ("instance" -> instance) ~ ("name" -> name) ~
            ("value" -> value) ~ ("dataset_date" -> date)) {
          case (json, (k, v)) => json ~ (k -> v)
        }
    }
    JsonMethods.compact(JsonMethods.render(entries))
  }

  /** Time series of successful values for one analyzer, oldest first. */
  def timeSeriesOf(analyzer: AnyAnalyzer): Seq[(Long, Double)] =
    get()
      .sortBy(_.resultKey.dataSetDate)
      .flatMap { r =>
        r.analyzerContext.metric(analyzer).flatMap {
          case DoubleMetric(_, _, _, Success(v), _) => Some(r.resultKey.dataSetDate -> v)
          case _ => None
        }
      }
}

object MetricsRepositoryMultipleResultsLoader {

  /** One row per successful metric VALUE — double metrics directly;
    * keyed/attribute metrics as one row per key (`name.key`); histograms
    * as absolute + ratio rows per bin (`Histogram.abs.<bin>` /
    * `Histogram.ratio.<bin>`, like the reference's flattening) — plus
    * (dataset_date, sanitized tags).
    */
  private[repository] def flatten(
      results: Seq[AnalysisResult],
      withTags: Seq[String]): Seq[(String, String, String, Double, Long, Map[String, String])] = {
    val reserved = Set("entity", "instance", "name", "value", "dataset_date")
    results.sortBy(_.resultKey.dataSetDate).flatMap { r =>
      val date = r.resultKey.dataSetDate
      // sanitized keys can COLLIDE ("env" and "ENV") or come out empty
      // (fully non-alphanumeric) — disambiguate deterministically instead
      // of silently dropping one tag's value
      val cleanedPairs = r.resultKey.tags.toSeq
        .filter { case (k, _) => withTags.isEmpty || withTags.contains(k) }
        .sortBy(_._1)
        .map { case (k, v) =>
          val base0 = k.replaceAll("[^A-Za-z0-9_]", "")
            .toLowerCase(java.util.Locale.ROOT)
          val base = if (base0.isEmpty) "tag" else base0
          (if (reserved.contains(base)) base + "_2" else base) -> v
        }
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val tags = cleanedPairs.map { case (k, v) =>
        val n = seen.getOrElse(k, 0)
        seen(k) = n + 1
        (if (n == 0) k else s"${k}_${n + 1}") -> v
      }.toMap
      r.analyzerContext.metricMap.values.toSeq.flatMap {
        case DoubleMetric(entity, name, instance, Success(v), _) =>
          Seq((entity.repr, instance, name, v, date, tags))
        case KeyedDoubleMetric(entity, name, instance, Success(kv)) =>
          kv.toSeq.sortBy(_._1).map { case (k, v) =>
            (entity.repr, instance, s"$name.$k", v, date, tags)
          }
        case AttributeDoubleMetric(entity, name, instance, Success(kv)) =>
          kv.toSeq.sortBy(_._1).map { case (k, v) =>
            (entity.repr, instance, s"$name.$k", v, date, tags)
          }
        case HistogramMetric(column, Success(dist)) =>
          dist.values.toSeq.sortBy(_._1).flatMap { case (k, dv) =>
            Seq(
              (Entity.Column.repr, column, s"Histogram.abs.$k",
                dv.absolute.toDouble, date, tags),
              (Entity.Column.repr, column, s"Histogram.ratio.$k",
                dv.ratio, date, tags))
          }
        case _ => Nil
      }
    }
  }
}

private[repository] case class LoaderImpl(
    results: () => Seq[AnalysisResult],
    tagFilter: Option[Map[String, String]] = None,
    analyzerFilter: Option[Seq[AnyAnalyzer]] = None,
    afterTime: Option[Long] = None,
    beforeTime: Option[Long] = None
) extends MetricsRepositoryMultipleResultsLoader {

  override def withTagValues(tagValues: Map[String, String]): MetricsRepositoryMultipleResultsLoader =
    copy(tagFilter = Some(tagValues))

  override def forAnalyzers(analyzers: Seq[AnyAnalyzer]): MetricsRepositoryMultipleResultsLoader =
    copy(analyzerFilter = Some(analyzers))

  override def after(dateTime: Long): MetricsRepositoryMultipleResultsLoader =
    copy(afterTime = Some(dateTime))

  override def before(dateTime: Long): MetricsRepositoryMultipleResultsLoader =
    copy(beforeTime = Some(dateTime))

  override def get(): Seq[AnalysisResult] = {
    results()
      .filter(r => afterTime.forall(r.resultKey.dataSetDate >= _))
      .filter(r => beforeTime.forall(r.resultKey.dataSetDate <= _))
      .filter(r => tagFilter.forall(t => t.toSet.subsetOf(r.resultKey.tags.toSet)))
      .map { r =>
        analyzerFilter match {
          case Some(as) =>
            AnalysisResult(r.resultKey,
              AnalyzerContext(r.analyzerContext.metricMap.filter { case (a, _) => as.contains(a) }))
          case None => r
        }
      }
  }
}

/** Thread-safe in-memory repository
  * (reference capability: repository/memory/InMemoryMetricsRepository.scala:28).
  */
class InMemoryMetricsRepository extends MetricsRepository {

  private val store = new TrieMap[ResultKey, AnalyzerContext]

  override def save(resultKey: ResultKey, analyzerContext: AnalyzerContext): Unit = {
    // only successful metrics are persisted, as in the reference
    val successful = analyzerContext.metricMap.filter { case (_, m) => m.value.isSuccess }
    store.put(resultKey, AnalyzerContext(successful))
  }

  override def loadByKey(resultKey: ResultKey): Option[AnalyzerContext] = store.get(resultKey)

  override def load(): MetricsRepositoryMultipleResultsLoader =
    LoaderImpl(() => store.toSeq.map { case (k, v) => AnalysisResult(k, v) })
}
