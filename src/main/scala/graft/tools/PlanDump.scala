package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dumps the FORMATTED physical plan of every action one SparkEntry
  * query executes (the round's plans/r18 artifacts). Env:
  * SPARK_GRAFT_Q (query name), SPARK_GRAFT_SF_DIR (data dir),
  * SPARK_GRAFT_PLAN_OUT (output file). Each action's plan is preceded
  * by a numbered separator; plans are truncated to 300 lines each.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "q01_size")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", s"/tmp/$qname.plan.txt")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        plans.add(
          qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    graft.SparkEntry.queries(qname)(spark, sfDir).count()
    Thread.sleep(2000)
    val sb = new StringBuilder
    var i = 0
    plans.forEach { p =>
      i += 1
      sb.append("=" * 100).append(s"\n== action $i ==\n")
      sb.append(p.linesIterator.take(300).mkString("\n")).append("\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"))
    spark.stop()
    println(s"wrote $outPath ($i actions)")
  }
}
