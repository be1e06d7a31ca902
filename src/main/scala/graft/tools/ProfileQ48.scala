package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the q48 latency work (round 11). */
object ProfileQ48 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.filter(col("l_orderkey") < 300)
      .select(col("l_orderkey").cast("long").as("a"),
        (lit(1000000L) + col("l_partkey")).as("b"))
    for (rep <- 1 to 4) {
      t(s"q48_full rep$rep") {
        graft.SparkEntry.queries("q48_components")(spark, sfDir).count()
      }
    }
    for (rep <- 1 to 3) {
      t(s"cc_distributed rep$rep") {
        graft.pipeline.Dedup.connectedComponents(edges, localSolveMaxEdges = 0).count()
      }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 2000)
    for (rep <- 1 to 2) {
      val sigs = t(s"signatures rep$rep") {
        val x = graft.pipeline.Dedup.textSignatures(docs, "doc_id", "text").persist()
        x.count(); x
      }
      val pairs = t(s"pairs rep$rep") {
        val x = graft.pipeline.Dedup
          .nearDuplicatePairsFromSignatures(sigs, threshold = 0.5)
          .select("id_a", "id_b").persist()
        x.count(); x
      }
      t(s"clustersFromPairs rep$rep") {
        graft.pipeline.Dedup.clustersFromPairs(docs, "doc_id", pairs).count()
      }
      pairs.unpersist(blocking = false)
      sigs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
