package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke driver: runs the flagship SparkEntry.entry end-to-end and prints
  * the check-results DataFrame. Usage: sbt "runMain graft.tools.Demo".
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = graft.SparkEntry.entry(spark)
    results.show(100, truncate = false)
    println(s"rows=${results.count()}")
    spark.stop()
  }
}
