package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.pipeline.Dedup

/** Scratch diagnostic (r16): per-action wall time of q104's stages. */
object ProfileQ104 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (0 until 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id").isNotNull)
      val paraDocs = docs.select(col("doc_id"),
        regexp_replace(col("text"), graft.SparkEntry.ParaInjectPattern,
          graft.SparkEntry.ParaInjectReplacement).as("text"))
      // decomposed construct: occurrences -> packed -> signatures ->
      // pairs (eager cap probes) -> CC (eager)
      val occ = Dedup.paragraphOccurrences(paraDocs, "doc_id", "text")
      val paras = occ.select(
        (shiftleft(col("graft_id").cast(LongType), 20) + col("graft_pos"))
          .as("graft_pid"),
        col("graft_id"), col("graft_pos"), col("graft_para"))
      val sf2 = timed("corpus signatures") {
        val f = Dedup.textSignatures(
          paras.select(col("graft_pid"), col("graft_para")),
          "graft_pid", "graft_para").persist()
        f.count()
        f
      }
      val pairs2 = timed("pairs construct (cap probes)") {
        Dedup.nearDuplicatePairsFromSignatures(sf2, 0.5, 64, 16, 1000)
      }
      println("[prof] pairs n = " + timed("pairs count") { pairs2.select("id_a", "id_b").count() })
      timed("clusters (CC eager)") {
        Dedup.clustersFromPairs(paras, "graft_pid", pairs2).count()
      }
      sf2.unpersist(blocking = false)
      val fuzzy = timed("nearDupParagraphs construct") {
        Dedup.nearDupParagraphs(paraDocs, "doc_id", "text", threshold = 0.5)
      }
      timed("fuzzy agg (engine pass)") {
        fuzzy.agg(count(lit(1)),
          coalesce(sum(col("n_paras")), lit(0L)),
          coalesce(sum(col("n_removed")), lit(0L))).collect()
      }
      timed("distinct paras census") {
        Dedup.paragraphOccurrences(paraDocs, "doc_id", "text")
          .agg(countDistinct(col("graft_para"))).collect()
      }
      val subOcc = Dedup.paragraphOccurrences(
        paraDocs.where(col("doc_id") < 60), "doc_id", "text")
      val subParas = subOcc.select(
        (shiftleft(col("graft_id").cast(LongType), 20) + col("graft_pos"))
          .as("pid"),
        col("graft_para").as("text"))
      val sigs = timed("audit signatures") {
        val f = Dedup.textSignatures(subParas, "pid", "text").persist()
        f.count()
        f
      }
      val exact = Dedup.exactJaccardPairsFromSignatures(sigs, threshold = 0.5)
        .withColumn("graft_ident", when(col("jaccard") >= 1.0, 1L))
        .select(col("id_a"), col("id_b"), lit(1L).as("graft_e"),
          col("graft_ident"))
      val cand = timed("nearDupPairs construct") {
        Dedup.nearDuplicatePairsFromSignatures(sigs, threshold = 0.5,
          numHashes = 64, bands = 16, maxBucketSize = Int.MaxValue)
          .select("id_a", "id_b").distinct().withColumn("graft_mh", lit(1L))
      }
      timed("audit join+agg") {
        exact.join(cand, Seq("id_a", "id_b"), "left_outer").agg(
          sum(col("graft_e")), sum(col("graft_ident")),
          sum(when(col("graft_mh").isNotNull, 1L).otherwise(0L)),
          sum(when(col("graft_ident").isNotNull && col("graft_mh").isNotNull,
            1L).otherwise(0L))).collect()
      }
      sigs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
