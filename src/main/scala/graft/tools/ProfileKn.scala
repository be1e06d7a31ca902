package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.TextAnalysis

/** Stage-level timing for the order-n Kneser-Ney scorers (q98/q101):
  * where do the seconds go at sf0.1.
  */
object ProfileKn {
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
      println(f"[kn] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"-- rep $rep --")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")

      // isolate the n-gram frame cost
      for (n <- Seq(3, 5)) {
        val tf = TextAnalysis.ngramFrequencies(docs, "doc_id", "text", n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t(s"ngramFreq(n=$n) count")(println("  rows=" + tf.count()))
        t(s"countDistinct 2-suffix n=$n")(
          tf.agg(countDistinct(col(s"w${n - 1}"), col(s"w$n")))
            .collect())
        tf.unpersist(blocking = true)
      }

      // full scorers
      t("kn order=3 full")(
        TextAnalysis.lmCrossEntropy(docs, "doc_id", "text", order = 3,
            smoothing = TextAnalysis.LmSmoothing.KneserNey(0.75))
          .agg(count(lit(1)), sum(col("nll"))).collect())
      t("kn order=5 full")(
        TextAnalysis.lmCrossEntropy(docs, "doc_id", "text", order = 5,
            smoothing = TextAnalysis.LmSmoothing.KneserNey(0.75))
          .agg(count(lit(1)), sum(col("nll"))).collect())
    }
    spark.stop()
  }
}
