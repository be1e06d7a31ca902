package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Classify, Domains, Mixing, TextAnalysis}

/** Stage-level timing for q96 (curation v2): where do the seconds go. */
object ProfileQ96 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q96] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"-- rep $rep --")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id").isNotNull)
      val withFooter = docs.select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(3)) =!= 2,
          concat(col("text"), lit("\nFOOTER "), col("source"),
            lit(" all rights reserved"))).otherwise(col("text")).as("text"))
      val cleaned = TextAnalysis
        .removeBoilerplateLines(withFooter, "doc_id", "text", "source",
          maxDocFrac = 0.4, minDocs = 5).persist()
      t("boilerplate")(cleaned
        .agg(count(lit(1)), coalesce(sum(col("removed_lines")), lit(0L)))
        .collect())
      val isKeep = pmod(col("doc_id"), lit(2)) === 0
      val marker = when(isKeep,
        lit("qkeepa qkeepb qkeepa qkeepb qkeepa qkeepb"))
        .otherwise(lit("qtossa qtossb qtossa qtossb qtossa qtossb"))
      val marked = cleaned.select(col("doc_id"), col("source"),
        concat_ws(" ", col("text"), marker).as("text")).persist()
      val model = t("nb_train")(Classify.trainNaiveBayes(
        marked.where(pmod(col("doc_id"), lit(10)) < 2)
          .select(col("doc_id"), col("text"),
            when(isKeep, lit("keep")).otherwise(lit("toss")).as("label")),
        "doc_id", "text", "label"))
      val nbKept = marked.join(
        Classify.scoreNaiveBayes(marked, "doc_id", "text", model)
          .where(col("predicted") === "keep").select(col("doc_id")),
        Seq("doc_id")).persist()
      t("nb_score")(nbKept.count())
      val perpKept = nbKept.join(
        t("perplexity")(TextAnalysis
          .perplexityBuckets(nbKept, "doc_id", "text", "source", 3))
          .where(col("bucket") <= 2).select(col("doc_id")),
        Seq("doc_id")).persist()
      t("perp_join")(perpKept.count())
      val g = floor(col("doc_id") / 5).cast(LongType)
      val host = concat(lit("s"), pmod(g, lit(20)).cast(StringType),
        lit(".example.com"))
      val path = concat(lit("/p/"), g.cast(StringType))
      val m5 = pmod(col("doc_id"), lit(5))
      val idS = col("doc_id").cast(StringType)
      val url = when(pmod(col("doc_id"), lit(97)) === 0, lit("page moved"))
        .when(m5 === 0, concat(lit("https://www."), host, path))
        .when(m5 === 1, concat(lit("HTTPS://"), host, lit(":443"), path, lit("/")))
        .when(m5 === 2, concat(lit("https://user:pw@"), host, path,
          lit("?utm_source=x&fbclid="), idS))
        .when(m5 === 3, concat(lit("https://"), host, path, lit("?b=2&a=1#frag")))
        .otherwise(concat(lit("https://"), host, path,
          lit("?a=1&utm_medium=y&b=2")))
      val dd = Domains.dedupByCanonicalUrl(
        perpKept.withColumn("url", url), "url", "doc_id")
      t("url_dedup+shards")(Mixing.shardStats(dd, "doc_id", "text", 8)
        .agg(count(lit(1))).collect())
      Seq(cleaned, marked, nbKept, perpKept).foreach(_.unpersist(blocking = false))
      model.release()
    }
    spark.stop()
  }
}
