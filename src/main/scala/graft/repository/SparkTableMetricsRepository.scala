package graft.repository

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_contains, col, split}

import graft.runners.AnalyzerContext

/** Spark-table repository: each save appends one row
  * (dataset_date, tag columns..., serialized_result) to a catalog table —
  * the warehouse-native deployment of the metrics history
  * (reference capability: repository/sparktable/SparkMetricsRepository.scala:25-62).
  *
  * Scale design: `after`/`before` time filters AND tag filters are pushed
  * into the table scan as plan predicates (`dataset_date` bounds prune
  * partitions/row groups when the table is laid out by date; tag equality
  * becomes `array_contains(split(tags, ','), 'k=v')` on the stored tag
  * string), so loading a 30-day window or one pipeline's history from
  * years of metrics never collects the whole table to the driver. Only
  * analyzer filtering applies after deserialization, on the already-pruned
  * rows. A fully unbounded `load().get()` still materializes everything —
  * by design the same contract as the reference — so callers over large
  * histories should always bound by time or tags.
  *
  * Ordering: re-saves of the same ResultKey are resolved by `saved_at`
  * (wall millis << 16 | per-JVM sequence). This orders totally within one
  * JVM; ACROSS writers it is wall-clock-comparable, so two processes
  * saving the same key within the same millisecond can still interleave
  * arbitrarily — acceptable for a metrics store where same-ms concurrent
  * re-saves of one key are equivalent.
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
    // one-time migration for tables created by the pre-saved_at layout:
    // add the column (old rows read it as NULL and order first, i.e.
    // oldest) so NEW saves carry ordering instead of dropping it forever
    if (spark.catalog.tableExists(tableName) &&
        !spark.table(tableName).columns.contains("saved_at")) {
      val quoted = tableName.split('.').map(p => s"`$p`").mkString(".")
      // concurrent writers can race the exists/ALTER check — losing the
      // race is fine as long as the column is there afterwards
      try spark.sql(s"ALTER TABLE $quoted ADD COLUMNS (saved_at BIGINT)")
      catch {
        case e: Exception
            if spark.table(tableName).columns.contains("saved_at") => ()
      }
    }
    df.write.mode("append").saveAsTable(tableName)
  }

  /** Scan of the table with date bounds and tag equality as PLAN
    * predicates (package-visible so tests can assert the pruned plan).
    * The stored tag string joins `k=v` pairs with ',', so only pairs
    * whose rendered form contains no comma can be matched per-element —
    * comma-carrying tags are left for the driver-side subset filter
    * (LoaderImpl re-checks EVERY requested tag on the deserialized keys,
    * so a partial pushdown never changes results, only prunes less).
    */
  private[graft] def scanPlan(
      after: Option[Long],
      before: Option[Long],
      tags: Option[Map[String, String]]): DataFrame = {
    val table = spark.table(tableName)
    val predicates =
      after.map(t => col("dataset_date") >= t).toSeq ++
        before.map(t => col("dataset_date") <= t).toSeq ++
        tags.toSeq.flatMap(_.collect {
          case (k, v) if !s"$k=$v".contains(",") =>
            array_contains(split(col("tags"), ","), s"$k=$v")
        })
    predicates.foldLeft(table)(_.filter(_))
  }

  /** Read rows within [after, before] carrying all requested tags —
    * filters run inside the Spark plan, not driver-side post-processing.
    */
  private def readRange(
      after: Option[Long],
      before: Option[Long],
      tags: Option[Map[String, String]] = None): Seq[AnalysisResult] = {
    if (!spark.catalog.tableExists(tableName)) return Seq.empty
    val pruned = scanPlan(after, before, tags)
    // explicit save order: scan order of an append table is arbitrary;
    // legacy pre-migration rows (null saved_at) order as oldest
    val ordered =
      if (pruned.columns.contains("saved_at"))
        pruned.orderBy(col("saved_at").asc_nulls_first)
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
    readRange(Some(resultKey.dataSetDate), Some(resultKey.dataSetDate),
      Some(resultKey.tags))
      .filter(_.resultKey == resultKey).lastOption.map(_.analyzerContext)

  override def load(): MetricsRepositoryMultipleResultsLoader =
    SparkTableLoader(readRange)
}

private object SparkTableMetricsRepository {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Monotonic within a JVM, wall-clock-comparable across writers (see
    * class scaladoc for the cross-JVM same-millisecond caveat).
    */
  private def nextSaveStamp(): Long =
    (System.currentTimeMillis() << 16) | (seq.incrementAndGet() & 0xFFFFL)
}

/** Loader that forwards its time bounds AND tag filter into the table
  * scan; the remaining analyzer filtering (plus a re-check of the tag
  * subset on deserialized keys) reuses the shared driver-side
  * [[LoaderImpl]] over the pruned rows.
  */
private[repository] case class SparkTableLoader(
    read: (Option[Long], Option[Long], Option[Map[String, String]]) => Seq[AnalysisResult],
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
    LoaderImpl(() => read(afterTime, beforeTime, tagFilter),
      tagFilter, analyzerFilter, afterTime, beforeTime).get()
}
