package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Isolated re-measure of the fuzzy_para_skew probe (the 20,000×-dup
  * paragraph corpus) — exists to attribute swings in the full
  * ScaleProbe run (which executes it LAST, after the emb_neardup burst,
  * in the documented ordering-contention band) to contention vs plan.
  */
object ProfileSkewPara {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SKEW_COPIES", "20000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docN = docs0.count()
    val work = "/tmp/graft_profile_skew"
    val first = docs0.orderBy("doc_id").limit(1)
      .select(col("text").as("t")).persist()
    docs0.unionByName(
      spark.range(copies).crossJoin(broadcast(first))
        .select((col("id") + lit(11L * docN)).as("doc_id"), col("t").as("text")))
      .write.mode("overwrite").parquet(s"$work/documents_skew.parquet")
    first.unpersist(blocking = false)
    val docsSkew = spark.read.parquet(s"$work/documents_skew.parquet")
    def probe(): Long = {
      val paraDocs = docsSkew.select(col("doc_id"),
        regexp_replace(col("text"), graft.SparkEntry.ParaInjectPattern,
          graft.SparkEntry.ParaInjectReplacement).as("text"))
      Dedup.nearDupParagraphs(paraDocs, "doc_id", "text", threshold = 0.5)
        .agg(coalesce(sum(col("n_removed")), lit(0L)))
        .collect().head.getLong(0)
    }
    // warm the machinery on a slice first (the ScaleProbe convention)
    Dedup.nearDuplicatePairs(docs0.limit(200), "doc_id", "text", 0.5).count()
    (1 to reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val removed = probe()
      println(f"[profile] fuzzy_para_skew rep $i: ${(System.nanoTime() - t0) / 1e9}%.1f s removed=$removed")
    }
    spark.stop()
  }
}
