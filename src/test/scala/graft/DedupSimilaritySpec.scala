package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.{Dedup, Similarity, TextAnalysis}

/** Unit specs for the dedup + similarity pipeline operators (previously
  * covered only through the driver correctness gate).
  */
class DedupSimilaritySpec extends AnyWordSpec with Matchers with SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
      (3L, "completely different content about spark engines and data"),
      (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (5L, "short text"),
      (6L, "")                                               // empty
    ).toDF("doc_id", "text")
  }

  "Dedup.exact" should {
    "keep one row per key deterministically" in {
      val s = spark
      import s.implicits._
      val df = Seq((1, "b"), (1, "a"), (2, "z")).toDF("k", "v")
      val out = Dedup.exact(df, Seq("k"), "v").orderBy("k").collect()
      out.map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe Seq((1, "a"), (2, "z"))
      Dedup.exactCounts(df, Seq("k")) shouldBe ((2L, 1L))
    }
  }

  "MinHash near-dup" should {
    "find the near and exact duplicates but not unrelated docs" in {
      val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 64, bands = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 4L)) // exact dup
      pairs should contain((1L, 2L)) // near dup (8/10 shared 3-grams)
      pairs should contain((2L, 4L))
      pairs.flatMap(p => Set(p._1, p._2)) should not contain 3L
    }

    "estimate jaccard 1.0 for identical docs" in {
      val cands = Dedup.minHashCandidatePairs(docs, "doc_id", "text", 64, 16)
        .filter(col("id_a") === 1L && col("id_b") === 4L)
        .collect()
      cands.length shouldBe 1
      cands.head.getDouble(2) shouldBe 1.0
    }
  }

  "SimHash" should {
    "give identical signatures to identical docs and near ones to near-dups" in {
      val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
      val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
      exact.map(_._3) shouldBe Some(0) // identical => hamming 0
      pairs.exists(p => p._1 == 1L && p._2 == 2L) shouldBe true
    }
  }

  "Similarity" should {
    val s0 = spark
    import s0.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    "rank brute-force top-k by cosine" in {
      val res = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 1L), "vec_id", "embedding", k = 3)
        .orderBy("rank").collect()
      res.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L, 3L) // self, near, orthogonal
      res.head.getDouble(2) shouldBe (1.0 +- 1e-6)
    }

    "find high-cosine pairs via LSH buckets" in {
      val pairs = Similarity.cosinePairsLsh(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))       // cosine ≈ 0.994
      pairs should not contain ((1L, 4L))  // opposite vectors
    }

    "reach high recall vs brute force with the IVF index" in {
      val s = spark
      import s.implicits._
      // deterministic synthetic corpus: 8 clusters of 25 vectors in R^16
      val rng = new scala.util.Random(7)
      val centers = (0 until 8).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
      val corpus = (0 until 200).map { i =>
        val c = centers(i % 8)
        (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 8L)

      def topSets(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap

      val exact = topSets(Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10))
      val ivf = topSets(Similarity.ivfTopK(
        corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 2, sampleSize = 200, iterations = 5))

      val recall = exact.keys.toSeq.map { q =>
        ivf.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
      }.sum / exact.size
      recall should be >= 0.9
    }
  }

  "TextAnalysis primitives" should {
    "tokenize, count and score deterministically" in {
      val s = spark
      import s.implicits._
      val df = Seq("Hello, wonderful world!").toDF("text")
      val row = df.select(
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.charCount(col("text")),
        TextAnalysis.alphaRatio(col("text"))).collect().head
      row.getInt(0) shouldBe 3
      row.getInt(1) shouldBe 23
      row.getDouble(2) shouldBe (19.0 / 23.0 +- 1e-9)
    }
  }
}
