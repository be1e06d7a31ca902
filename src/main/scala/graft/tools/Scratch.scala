package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** Ad-hoc profiling entry — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warm tokenize") {
      docs.select(TextAnalysis.normalizedTokens(col("text")).as("t"))
        .agg(sum(size(col("t")))).collect().head.getLong(0)
    }
    time("shingles") {
      docs.select(Dedup.shingles(col("text"), 3).as("sh"))
        .agg(sum(size(col("sh")))).collect().head.getLong(0)
    }
    time("shingle hashes") {
      docs.select(Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("h"))
        .agg(sum(size(col("h")))).collect().head.getLong(0)
    }
    time("minhash sigs") {
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("hs"))
        .select(col("doc_id"), Dedup.minHashSignatureFromHashes(col("hs"), 64).as("sig"))
        .agg(sum(size(col("sig")))).collect().head.getLong(0)
    }
    time("minhash candidates") {
      Dedup.minHashCandidatePairs(docs, "doc_id", "text", 64, 16).count()
    }
    time("minhash full (verify)") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", 0.5, 64, 16).count()
    }
    time("simhash sigs") {
      docs.select(col("doc_id"),
        transform(TextAnalysis.normalizedTokens(col("text")), t => xxhash64(t)).as("th"))
        .select(Dedup.simHashFromHashes(col("th")).as("s"))
        .agg(count(col("s"))).collect().head.getLong(0)
    }
    time("simhash pairs") {
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8).count()
    }
    spark.stop()
  }
}
