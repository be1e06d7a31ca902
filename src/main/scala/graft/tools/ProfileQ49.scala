package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the decontamination scan (q49's engine path):
  * times contaminationMatches end-to-end on sf0.1 after a warmup rep,
  * isolating the corpus gram-generation cost from bench-suite noise.
  */
object ProfileQ49 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probes = docs.filter(col("doc_id").isin(20L, 30L, 45L))
      .select(col("text").as("probe"))
    def run(): Long = graft.pipeline.TextAnalysis
      .contaminationMatches(docs, "doc_id", "text", probes, "probe", n = 13)
      .agg(coalesce(sum(col("matched_ngrams")), lit(0L)))
      .collect().head.getLong(0)
    run() // warmup
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val m = run()
      println(f"rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, matched=$m")
    }
    spark.stop()
  }
}
