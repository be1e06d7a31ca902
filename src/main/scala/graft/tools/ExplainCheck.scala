package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core._
import graft.operators._
import graft.runners.AnalysisRunner

/** Prints the physical plans the fused runner actually executes, to verify
  * column pruning (ReadSchema) and whole-stage codegen coverage.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.explainString(org.apache.spark.sql.execution.SimpleMode))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    AnalysisRunner.run(li, Seq[AnyAnalyzer](
      Size(), Completeness("l_orderkey"), Mean("l_quantity", Some("l_discount > 0.02")),
      Minimum("l_extendedprice"), Uniqueness(Seq("l_orderkey", "l_linenumber"))))
    // percentile sharing: 3 quantile analyzers on one column -> ONE
    // percentile aggregate in the plan
    AnalysisRunner.run(li, Seq[AnyAnalyzer](
      ExactQuantile("l_quantity", 0.5), InterquartileRange("l_quantity"),
      ExactQuantile("l_quantity", 0.9)))
    Thread.sleep(2000)
    plans.forEach { p =>
      println("=" * 100)
      println(p.linesIterator.take(30).mkString("\n"))
      p.linesIterator.find(_.contains("ReadSchema")).foreach(l => println("READSCHEMA>> " + l.trim))
    }
    spark.stop()
  }
}
