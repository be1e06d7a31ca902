package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Diagnostic: run one SparkEntry query and dump the executed plan of
  * every action slower than SPARK_GRAFT_SLOW_MS (default 3000).
  */
object DiagSlowPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "q32_embedding_neardup")
    val slowMs = sys.env.getOrElse("SPARK_GRAFT_SLOW_MS", "3000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, durationNs: Long): Unit =
        if (durationNs / 1000000 >= slowMs) {
          println(s"==== SLOW ACTION ${durationNs / 1000000} ms ====")
          println(qe.executedPlan.toString().take(120000))
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    graft.SparkEntry.queries(qname)(spark, sfDir).count()
    Thread.sleep(2000)
    spark.stop()
  }
}
