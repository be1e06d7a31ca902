package graft.repository

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.runners.AnalyzerContext

/** JSON-file repository on any Hadoop-compatible filesystem (local, HDFS,
  * S3A…) — the same file works from a laptop and a 1000-executor cluster
  * (reference capability: repository/fs/FileSystemMetricsRepository.scala:39-91).
  */
class FileSystemMetricsRepository(spark: SparkSession, path: String) extends MetricsRepository {

  private def hadoopConf: Configuration = spark.sparkContext.hadoopConfiguration

  private def readAll(): Seq[AnalysisResult] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    try {
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val content = Iterator.continually(reader.readLine()).takeWhile(_ != null).mkString("\n")
      AnalysisResultSerde.deserialize(content)
    } finally in.close()
  }

  private def writeAll(results: Seq[AnalysisResult]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(AnalysisResultSerde.serialize(results).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // HDFS rename reports failure as FALSE, not an exception — ignoring it
    // (or a failed delete) silently loses the save or the whole history
    if (fs.exists(p) && !fs.delete(p, false)) {
      throw new IllegalStateException(
        s"Could not replace metrics file $p (delete failed — concurrent writer?)")
    }
    if (!fs.rename(tmp, p)) {
      throw new IllegalStateException(
        s"Could not move $tmp to $p (rename returned false — concurrent writer?)")
    }
  }

  /** save() is a read-modify-write of one JSON file: synchronized so
    * concurrent saves WITHIN this JVM cannot drop each other's results.
    * Writers in DIFFERENT processes still race (a plain file has no
    * compare-and-swap) — use [[SparkTableMetricsRepository]] for
    * multi-writer deployments; a cross-process loser here at least fails
    * loudly via the rename check above instead of vanishing.
    */
  override def save(resultKey: ResultKey, analyzerContext: AnalyzerContext): Unit =
    this.synchronized {
      val successful = AnalyzerContext(
        analyzerContext.metricMap.filter { case (_, m) => m.value.isSuccess })
      val existing = readAll().filterNot(_.resultKey == resultKey)
      writeAll(existing :+ AnalysisResult(resultKey, successful))
    }

  override def loadByKey(resultKey: ResultKey): Option[AnalyzerContext] =
    // append-style stores keep every save; the LAST entry for a key wins
    readAll().filter(_.resultKey == resultKey).lastOption.map(_.analyzerContext)

  override def load(): MetricsRepositoryMultipleResultsLoader =
    // dedupe re-saved keys to their latest append (matching loadByKey),
    // in time order for the anomaly-detection series consumers
    LoaderImpl(() => readAll().groupBy(_.resultKey).map(_._2.last).toSeq
      .sortBy(_.resultKey.dataSetDate))
}

