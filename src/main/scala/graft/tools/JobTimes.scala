package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r13): per-job wall time of one query, warm run. */
object JobTimes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "q96_curation_v2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var record = false
    val rows = new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse(js.stageInfos.map(_.name).mkString(" | ").take(200))))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.get(je.jobId)
        if (record && s != null) {
          val sec = (System.nanoTime() - s._1) / 1e9
          rows.add(f"job ${je.jobId}%4d ${sec}%6.2f s  ${s._2.take(140)}")
        }
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    fn(spark, sfDir).count() // warm
    Thread.sleep(500)
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    scala.jdk.CollectionConverters.ListHasAsScala(rows).asScala
      .foreach(println)
    println(f"TOTAL $total%.2f s")
    spark.stop()
  }
}
