package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.{Capping, Dedup, Similarity, TextAnalysis}

/** The de-windowed bucket-cap (Capping.capBuckets) must select exactly
  * the rows the row_number-window form selected — same uniform
  * hash-order exclusion — while never putting a WindowExec (which would
  * sort a whole hot bucket in one task) into any capped pipeline's
  * physical plan.
  */
class CappingSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def capturePlans(f: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString())
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      f
      Thread.sleep(1500)
    } finally spark.listenerManager.unregister(listener)
    scala.jdk.CollectionConverters.ListHasAsScala(plans).asScala.toSeq
  }

  "capBuckets" should {
    "keep exactly the window-selected rows on a skewed bucket profile" in {
      val s = spark
      import s.implicits._
      // buckets: one hot (60 rows), several warm/cold, plus a null-key
      // bucket — ids deliberately non-contiguous so hash order differs
      // from id order
      val rows = (0 until 60).map(i => (Option("hot"), i * 37L)) ++
        (0 until 7).map(i => (Option("warm"), 1000L + i * 13)) ++
        Seq((Option("cold"), 5000L)) ++
        (0 until 9).map(i => (Option.empty[String], 7000L + i * 11))
      val df = rows.toDF("bucket", "id")
      val cap = 5
      val windowed = df
        .withColumn("graft_bn", row_number().over(
          Window.partitionBy(col("bucket"))
            .orderBy(xxhash64(col("id")), col("id"))))
        .where(col("graft_bn") <= cap)
        .select("bucket", "id")
      val capped = Capping.capBuckets(df, Seq("bucket"), "id", cap,
        "graft_test_cap_1")
      capped.columns.toSeq shouldBe Seq("bucket", "id")
      val w = windowed.collect().map(r => (r.getAs[String]("bucket"), r.getLong(1))).toSet
      val c = capped.collect().map(r => (r.getAs[String]("bucket"), r.getLong(1))).toSet
      c shouldBe w
      // null-key bucket capped too (the <=> join condition matches nulls)
      c.count(_._1 == null) shouldBe cap
    }

    "match the window selection over composite bucket keys and string ids" in {
      val s = spark
      import s.implicits._
      val rows = for {
        band <- 0 until 3
        i <- 0 until 25
      } yield (band, s"bucket${i % 2}", s"doc-$band-$i")
      val df = rows.toDF("band", "bkt", "id")
      val cap = 4
      val windowed = df
        .withColumn("graft_bn", row_number().over(
          Window.partitionBy(col("band"), col("bkt"))
            .orderBy(xxhash64(col("id")), col("id"))))
        .where(col("graft_bn") <= cap)
        .select("band", "bkt", "id")
      val capped = Capping.capBuckets(df, Seq("band", "bkt"), "id", cap,
        "graft_test_cap_2")
      val w = windowed.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      val c = capped.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      c shouldBe w
      w.size shouldBe 3 * 2 * cap
    }

    "pass under-cap buckets through untouched with a huge cap" in {
      val s = spark
      import s.implicits._
      val df = (0 until 100).map(i => (s"b${i % 10}", i.toLong)).toDF("bucket", "id")
      // Int.MaxValue is the "no cap" convention — must not allocate a
      // 2^31 heap per bucket
      Capping.capBuckets(df, Seq("bucket"), "id", Int.MaxValue,
        "graft_test_cap_3").count() shouldBe 100L
    }

    "repartition on the bucket keys on BOTH fast paths" in {
      // the r15 q32 failure mode: without this exchange the capped frame
      // passes through the scan's (often few) partitions and AQE picks a
      // broadcast self-join whose parallelism is capped at those few
      // stream partitions — a near-serial candidate-verify stage. Pin it
      // so the fast paths can't silently lose the exchange again.
      val s = spark
      import s.implicits._
      val df = (0 until 100).map(i => (s"b${i % 10}", i.toLong))
        .toDF("bucket", "id")
      Seq(Int.MaxValue, 1000).foreach { cap =>
        val plan = Capping.capBuckets(df, Seq("bucket"), "id", cap,
          s"graft_test_cap_rp_$cap").queryExecution.optimizedPlan.toString()
        withClue(s"cap=$cap: ") {
          plan.toLowerCase should include("repartitionbyexpression")
        }
      }
    }

    "skip the threshold phase entirely when no bucket exceeds the cap" in {
      val s = spark
      import s.implicits._
      val df = (0 until 30).map(i => (s"b${i % 10}", i.toLong)).toDF("bucket", "id")
      val observed = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          observed.synchronized { observed ++= qe.observedMetrics }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val capped = Capping.capBuckets(df, Seq("bucket"), "id", 5,
          "graft_test_cap_fast")
        // phase-0 proved nothing binds: the returned plan has no
        // threshold join (its graft_thr columns never appear)
        capped.queryExecution.analyzed.toString() should not include "graft_thr"
        capped.count() shouldBe 30L
        def row = observed.synchronized { observed.get("graft_test_cap_fast") }
        val deadline = System.currentTimeMillis() + 15000
        while (row.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        row.get.getAs[Long]("excluded_rows") shouldBe 0L
        row.get.getAs[Long]("banded_rows") shouldBe 30L
      } finally spark.listenerManager.unregister(listener)
    }

    "drop null-id rows so an all-tie bucket cannot blow past the cap" in {
      val s = spark
      import s.implicits._
      // 40 null-id rows in one bucket: all tie on both hashes (xxhash64
      // skips nulls), so keeping them would leave the bucket uncapped —
      // the quadratic-blowup hole the cap exists to close
      val rows = (0 until 40).map(_ => ("hot", Option.empty[Long])) ++
        (0 until 12).map(i => ("hot", Option(i.toLong))) ++
        (0 until 3).map(i => ("cold", Option(100L + i)))
      val df = rows.toDF("bucket", "id")
      val capped = Capping.capBuckets(df, Seq("bucket"), "id", 5,
        "graft_test_cap_null")
      val got = capped.collect().map(r => (r.getString(0), r.get(1)))
      got.count(_._2 == null) shouldBe 0
      got.count(_._1 == "hot") shouldBe 5
      got.count(_._1 == "cold") shouldBe 3
    }

    "report excluded_rows/banded_rows on the observation channel" in {
      val s = spark
      import s.implicits._
      val df = ((0 until 40).map(i => ("hot", i.toLong)) ++
        (0 until 3).map(i => ("cold", 100L + i))).toDF("bucket", "id")
      val observed = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          observed.synchronized { observed ++= qe.observedMetrics }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        Capping.capBuckets(df, Seq("bucket"), "id", 10, "graft_test_cap_obs")
          .count() shouldBe 13L
        def row = observed.synchronized { observed.get("graft_test_cap_obs") }
        val deadline = System.currentTimeMillis() + 15000
        while (row.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        row.get.getAs[Long]("excluded_rows") shouldBe 30L
        row.get.getAs[Long]("banded_rows") shouldBe 43L
      } finally spark.listenerManager.unregister(listener)
    }
  }

  "the capped pipelines" should {
    // a corpus where every doc is identical — the degenerate one-bucket
    // shape that makes a window cap sort the whole corpus in one task
    def hotDocs = {
      val s = spark
      import s.implicits._
      (0 until 60).map(i =>
        (i.toLong, "the same exact document text repeated for every row"))
        .toDF("doc_id", "text")
    }

    "run MinHash candidate capping with no WindowExec" in {
      val plans = capturePlans {
        Dedup.nearDuplicatePairs(hotDocs, "doc_id", "text",
          threshold = 0.9).count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }

    "run the LSH-state build with no WindowExec" in {
      val plans = capturePlans {
        val st = Dedup.lshState(hotDocs, "doc_id", "text", maxBucketSize = 10)
        st.buckets.count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }

    "run SimHash chunk capping with no WindowExec" in {
      val plans = capturePlans {
        Dedup.simHashPairs(hotDocs, "doc_id", "text", maxHamming = 3,
          maxBucketSize = 10).count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }

    "run cosine-LSH capping with no WindowExec" in {
      val s = spark
      import s.implicits._
      val vecs = (0 until 60).map(i => (i.toLong, Array.fill(8)(1.0f)))
        .toDF("id", "vec")
      val plans = capturePlans {
        Similarity.cosinePairsLsh(vecs, "id", "vec", threshold = 0.99,
          planes = 2, numTables = 1, maxBucketSize = 10).count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }

    "run SemDeDup cell capping with no WindowExec" in {
      val s = spark
      import s.implicits._
      val vecs = (0 until 60).map(i => (i.toLong, Array.fill(8)(1.0)))
        .toDF("id", "vec")
      val plans = capturePlans {
        Similarity.semDedup(vecs, "id", "vec",
          centroids = Seq(Array.fill(8)(1.0)), tau = 0.99,
          maxClusterSize = 10).count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }

    "run cross-source overlap gram capping with no WindowExec" in {
      val s = spark
      import s.implicits._
      val docs = (0 until 20).map(i =>
        (s"src${i % 4}", "alpha beta gamma delta epsilon zeta eta theta " +
          "iota kappa lambda mu nu xi omicron pi rho sigma"))
        .toDF("source", "text")
      val plans = capturePlans {
        TextAnalysis.crossSourceOverlap(docs, "source", "text", n = 13,
          maxGroupsPerGram = 2).count()
      }
      plans should not be empty
      plans.foreach(_ should not include "Window")
    }
  }
}
