package graft.repository

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.runners.AnalyzerContext

/** Spark-table repository: each save appends one row
  * (dataset_date, tag columns..., serialized_result) to a catalog table —
  * the warehouse-native deployment of the metrics history
  * (reference capability: repository/sparktable/SparkMetricsRepository.scala:25-62).
  *
  * Scale design: `after`/`before` time filters are pushed into the table
  * scan as predicates on the `dataset_date` column (partition/row-group
  * pruning applies when the table is laid out by date), so loading a
  * 30-day window from years of metrics history never collects the whole
  * table to the driver. Tag and analyzer filters apply after
  * deserialization, on the already date-pruned rows.
  */
class SparkTableMetricsRepository(spark: SparkSession, tableName: String)
    extends MetricsRepository {

  import spark.implicits._

  override def save(resultKey: ResultKey, analyzerContext: AnalyzerContext): Unit = {
    val serialized = AnalysisResultSerde.serialize(
      Seq(AnalysisResult(resultKey, analyzerContext)))
    // saved_at orders re-saves of the SAME key: an append table's scan
    // order is not file-append order, so "last write wins" needs an
    // explicit column (wall millis + a per-JVM sequence for same-ms saves)
    val df = Seq((resultKey.dataSetDate, resultKey.tags.map { case (k, v) => s"$k=$v" }
      .mkString(","), serialized, SparkTableMetricsRepository.nextSaveStamp()))
      .toDF("dataset_date", "tags", "serialized_result", "saved_at")
    // appending to a table created by the pre-saved_at layout must not
    // throw on schema mismatch; such tables keep the legacy 3 columns
    val legacyTable = spark.catalog.tableExists(tableName) &&
      !spark.table(tableName).columns.contains("saved_at")
    (if (legacyTable) df.drop("saved_at") else df)
      .write.mode("append").saveAsTable(tableName)
  }

  /** Read rows whose dataset_date is within [after, before] — filters are
    * part of the Spark plan, not driver-side post-processing.
    */
  private def readRange(after: Option[Long], before: Option[Long]): Seq[AnalysisResult] = {
    if (!spark.catalog.tableExists(tableName)) return Seq.empty
    val table = spark.table(tableName)
    val pruned = Seq(
      after.map(t => col("dataset_date") >= t),
      before.map(t => col("dataset_date") <= t)
    ).flatten.foldLeft(table)(_.filter(_))
    // explicit save order: scan order of an append table is arbitrary
    val ordered =
      if (table.columns.contains("saved_at")) pruned.orderBy(col("saved_at"))
      else pruned
    ordered
      .select("serialized_result")
      .collect()
      .toSeq
      .flatMap(r => AnalysisResultSerde.deserialize(r.getString(0)))
      // append-style store keeps every save; the LAST entry for a key wins
      .groupBy(_.resultKey).map(_._2.last).toSeq
      .sortBy(_.resultKey.dataSetDate)
  }

  override def loadByKey(resultKey: ResultKey): Option[AnalyzerContext] =
    readRange(Some(resultKey.dataSetDate), Some(resultKey.dataSetDate))
      .filter(_.resultKey == resultKey).lastOption.map(_.analyzerContext)

  override def load(): MetricsRepositoryMultipleResultsLoader =
    SparkTableLoader(readRange)
}

private object SparkTableMetricsRepository {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotonic within a JVM, wall-clock-comparable across writers. */
  private def nextSaveStamp(): Long =
    (System.currentTimeMillis() << 16) | (seq.incrementAndGet() & 0xFFFFL)
}

/** Loader that forwards its time bounds into the table scan; the remaining
  * tag/analyzer filtering reuses the shared driver-side [[LoaderImpl]]
  * over the pruned rows.
  */
private[repository] case class SparkTableLoader(
    read: (Option[Long], Option[Long]) => Seq[AnalysisResult],
    tagFilter: Option[Map[String, String]] = None,
    analyzerFilter: Option[Seq[graft.core.AnyAnalyzer]] = None,
    afterTime: Option[Long] = None,
    beforeTime: Option[Long] = None
) extends MetricsRepositoryMultipleResultsLoader {

  override def withTagValues(tagValues: Map[String, String]): MetricsRepositoryMultipleResultsLoader =
    copy(tagFilter = Some(tagValues))

  override def forAnalyzers(analyzers: Seq[graft.core.AnyAnalyzer]): MetricsRepositoryMultipleResultsLoader =
    copy(analyzerFilter = Some(analyzers))

  override def after(dateTime: Long): MetricsRepositoryMultipleResultsLoader =
    copy(afterTime = Some(dateTime))

  override def before(dateTime: Long): MetricsRepositoryMultipleResultsLoader =
    copy(beforeTime = Some(dateTime))

  override def get(): Seq[AnalysisResult] =
    LoaderImpl(() => read(afterTime, beforeTime),
      tagFilter, analyzerFilter, afterTime, beforeTime).get()
}
