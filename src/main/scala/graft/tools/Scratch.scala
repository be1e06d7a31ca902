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

/** Full-suite soak at sf0.1: every constraint family in one verification
  * run over 600k rows, plus row-level results and a suggestion holdout.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    import graft.checks._
    import graft.core._
    import graft.operators._

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    val t0 = System.nanoTime()
    val check = Check(CheckLevel.Error, "soak")
      .hasSize(_ > 100000)
      .isComplete("l_orderkey")
      .hasCompleteness("l_shipdate", _ == 1.0)
      .areComplete(Seq("l_partkey", "l_suppkey"))
      .satisfies("l_quantity > 0", "positive qty", _ == 1.0)
      .isNonNegative("l_extendedprice")
      .isLessThanOrEqualTo("l_discount", "l_quantity")
      .hasMin("l_quantity", _ >= 1.0)
      .hasMax("l_quantity", _ <= 50.0)
      .hasMean("l_quantity", m => m > 20 && m < 30)
      .hasSum("l_quantity", _ > 0)
      .hasStandardDeviation("l_quantity", _ > 0)
      .hasApproxCountDistinct("l_partkey", _ > 1000)
      .hasApproxQuantile("l_extendedprice", 0.5, _ > 0)
      .hasExactQuantile("l_quantity", 0.5, _ > 0).where("l_returnflag = 'N'")
      .hasUniqueness(Seq("l_orderkey", "l_linenumber"), _ > 0.5)
      .hasDistinctness(Seq("l_returnflag"), _ < 0.001)
      .hasEntropy("l_returnflag", _ > 0)
      .hasNumberOfDistinctValues("l_linestatus", _ == 2)
      .hasHistogramValues("l_returnflag", _.values.nonEmpty)
      .hasCorrelation("l_quantity", "l_extendedprice", _ > 0)
      .hasPattern("l_returnflag", "^[ANR]$")
      .kllSketchSatisfies("l_extendedprice", _.buckets.nonEmpty)
    val result = VerificationSuite().onData(li).addCheck(check).run()
    val suiteSec = (System.nanoTime() - t0) / 1e9

    val failed = result.checkResults.values.flatMap(_.constraintResults)
      .filter(_.status != ConstraintStatus.Success)
    println(f"SOAK suite: status=${result.status} constraints=" +
      s"${result.checkResults.values.map(_.constraintResults.size).sum} " +
      f"failed=${failed.size} in $suiteSec%.1f s")
    failed.foreach(f => println(s"  FAILED: ${f.constraint} -> ${f.message}"))

    val t1 = System.nanoTime()
    val rl = VerificationResult.rowLevelResultsAsDataFrame(spark, result, li)
    val passing = rl.filter(org.apache.spark.sql.functions.col("soak")).count()
    println(f"SOAK row-level: $passing of ${li.count()} passing " +
      f"in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    val t2 = System.nanoTime()
    val sugg = graft.suggestions.ConstraintSuggestionRunner.run(
      spark.read.parquet(s"$sf/orders.parquet"),
      rules = graft.suggestions.Rules.EXTENDED,
      testsetRatio = Some(0.2))
    val okRatio = sugg.testEvaluation.values.count(_ ==
      graft.checks.ConstraintStatus.Success).toDouble / math.max(sugg.testEvaluation.size, 1)
    println(f"SOAK suggestions: ${sugg.suggestions.values.map(_.size).sum} suggested, " +
      f"holdout success ratio $okRatio%.2f in ${(System.nanoTime() - t2) / 1e9}%.1f s")

    spark.stop()
  }
}
