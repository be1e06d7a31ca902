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

    "bound the pair list per doc under maxPairsPerDoc" in {
      val s = spark
      import s.implicits._
      // 30 identical docs -> C(30,2) = 435 true pairs even with healthy
      // banding (one honest duplicate group): the budget bounds the pair
      // LIST at <= 3 per id_a (a deterministic hash-ordered subset of
      // the true pairs), it never invents pairs
      val dup = (0 until 30).map(i =>
        (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text")
      val fullSet = Dedup.nearDuplicatePairs(dup, "doc_id", "text",
        threshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      fullSet.size shouldBe 435
      val got = Dedup.nearDuplicatePairs(dup, "doc_id", "text",
        threshold = 0.9, maxPairsPerDoc = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.groupBy(_._1).values.foreach(_.length should be <= 3)
      got.toSet.subsetOf(fullSet) shouldBe true
      // id 29 pairs only as id_b (canonical order) — still present
      got.map(_._1).toSet.size should be >= 20
    }
  }

  "Exact Jaccard pairs (inverted index)" should {
    "match brute-force set Jaccard exactly, without a crossJoin" in {
      val out = Dedup.exactJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      out.keySet shouldBe Set((1L, 4L), (1L, 2L), (2L, 4L))
      out((1L, 4L)) shouldBe 1.0
      // docs 1/2 differ only in the last token, so exactly one of their 7
      // 3-gram shingles differs: j = 6 / (7 + 7 - 6) = 0.75
      out((1L, 2L)) shouldBe (0.75 +- 1e-12)
    }

    "generate nothing for docs sharing no shingles" in {
      Dedup.exactJaccardPairs(docs, "doc_id", "text", threshold = 0.0)
        .filter((col("id_a") === 3L) || (col("id_b") === 3L))
        .count() shouldBe 0L
    }

    "agree with brute-force string-shingle Jaccard on randomized corpora" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(19)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
      // random docs incl. empty, single-token and duplicate-heavy cases
      (0 until 3).foreach { round =>
        val corpus = (0 until 40).map { i =>
          val len = rng.nextInt(12) // 0..11 tokens
          val toks = Seq.fill(len)(vocab(rng.nextInt(vocab.length)))
          (i.toLong, toks.mkString(" "))
        }.toDF("doc_id", "text")
        val fast = Dedup.exactJaccardPairs(corpus, "doc_id", "text", threshold = 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val sh = corpus.select(col("doc_id"),
          org.apache.spark.sql.functions.array_distinct(
            Dedup.shingles(col("text"), 3)).as("sh"))
        val brute = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
          .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.array_intersect(col("sh_a"), col("sh_b")))
              .cast("double") /
              org.apache.spark.sql.functions.greatest(
                org.apache.spark.sql.functions.size(
                  org.apache.spark.sql.functions.array_union(col("sh_a"), col("sh_b"))),
                lit(1)).cast("double")).as("j"))
          .filter(col("j") >= 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        withClue(s"round $round: ") {
          fast.keySet shouldBe brute.keySet
          fast.foreach { case (k, v) => v shouldBe (brute(k) +- 1e-12) }
        }
      }
    }
  }

  "SimHash" should {
    "give identical signatures to identical docs and near ones to near-dups" in {
      val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
      val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
      exact.map(_._3) shouldBe Some(0) // identical => hamming 0
      // near-dup (one of ~10 tokens changed): SimHash distance over such
      // short docs is high-variance, so assert ORDERING rather than a
      // hash-dependent absolute distance — the near-dup pair must be
      // closer than any (related, unrelated) pair
      val sigs = Dedup.simHashSignatures(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      ham(1L, 2L) should be < ham(1L, 3L)
      ham(1L, 2L) should be < ham(2L, 3L)
    }

    "find EVERY pair within maxHamming (pigeonhole completeness)" in {
      // 60 synthetic docs; banding must equal brute-force over the very
      // signatures it banded — for a maxHamming (8) that the old fixed
      // 4x16-bit chunking could NOT guarantee (it only covered hamming<=3)
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(13)
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
      val corpus = (0 until 60).map { i =>
        val base = Seq.fill(12)(words(rng.nextInt(words.size)))
        // half the docs are light mutations of the previous doc -> mid-range hamming
        (i.toLong, base.mkString(" "))
      } ++ (0 until 60 by 2).map { i =>
        (1000L + i, (Seq.fill(11)(words(rng.nextInt(words.size))) :+ words(i % words.size)).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")

      for (maxHamming <- Seq(3, 8, 12)) {
        val sigs = Dedup.simHashSignatures(df, "doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val exactPairs = (for {
          (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
          if java.lang.Long.bitCount(sa ^ sb) <= maxHamming
        } yield (ia, ib)).toSet
        val banded = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = maxHamming)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        banded shouldBe exactPairs
      }
    }

    "yield identical in-subset pairs whether banded over the subset or the corpus" in {
      // Pins the q24 audit parameterization: chunk-equality candidacy is
      // PAIRWISE, so the uncapped banding pass may run over the bounded
      // audit subset alone — the in-subset pair set is identical to what a
      // full-corpus (quadratic-risk) pass would produce. q24 relies on
      // this to keep the recall audit exact without ever banding the full
      // corpus uncapped.
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(29)
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa", "lambda", "mu")
      val base = (0 until 200).map(_ =>
        Seq.fill(10)(words(rng.nextInt(words.size))).mkString(" "))
      // every 4th doc duplicates its predecessor -> guaranteed hamming-0
      // pairs both inside and outside the audit subset
      val df = base.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i % 4 == 3) base(i - 1) else t)
      }.toDF("doc_id", "text")
      val subN = 80L
      val inSub = col("id_a") < subN && col("id_b") < subN
      val sigs = Dedup.textSignatures(df, "doc_id", "text").persist()
      try {
        val subSigs = sigs.filter(col("graft_id") < subN)
        val fromSub = Dedup.simHashPairsFromSignatures(subSigs, maxHamming = 8,
            maxBucketSize = Int.MaxValue)
          .filter(inSub).select("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val fromFull = Dedup.simHashPairsFromSignatures(sigs, maxHamming = 8,
            maxBucketSize = Int.MaxValue)
          .filter(inSub).select("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        fromSub shouldBe fromFull
        fromSub should not be empty
      } finally sigs.unpersist(blocking = false)
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
      // multi-table OR-amplification: P(miss) = (1 - p^planes)^numTables,
      // ~4e-3 here for cosine 0.994 — and fully deterministic hashing
      val pairs = Similarity.cosinePairsLsh(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 8, numTables = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))       // cosine ≈ 0.994
      pairs should not contain ((1L, 4L))  // opposite vectors
    }

    "reach >=0.9 recall vs exact pairs with multi-table LSH at a LOW threshold" in {
      val s = spark
      import s.implicits._
      // weakly similar pairs (cos ~0.45-0.6) — a single table has near-zero
      // recall here; 4 planes x 24 tables is the q32 configuration
      val rng = new scala.util.Random(11)
      val base = (0 until 120).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
      val corpus = base.zipWithIndex.flatMap { case (v, i) =>
        // every even id gets a weakly-correlated partner
        if (i % 2 == 0)
          Seq((i * 2L, v),
            (i * 2L + 1, v.map(x => (0.7f * x + 0.7f * rng.nextGaussian().toFloat))))
        else Seq((i * 2L, v))
      }.toDF("vec_id", "embedding")
      val thr = 0.42
      val exact = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .crossJoin(corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
        .filter(col("id_a") < col("id_b"))
        .filter(Similarity.cosine(col("va"), col("vb")) >= thr)
        .select("id_a", "id_b")
      val lsh = Similarity.cosinePairsLsh(corpus, "vec_id", "embedding",
        thr, planes = 4, numTables = 24).select("id_a", "id_b")
      val nExact = exact.count()
      val found = exact.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
      nExact should be > 10L
      found.toDouble / nExact should be >= 0.9
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

  "incremental IVF index state" should {
    "fold staged batches to the one-shot postings and serve identically" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(11)
      val centers = (0 until 8).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
      val corpus = (0 until 200).map { i =>
        val c = centers(i % 8)
        (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 8L)
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      try {
        val trained = Similarity.trainIvfCentroids(corpus, "embedding",
          nlist = 8, sampleSize = 200)
        Similarity.ivfModelFrame(s, trained)
          .write.mode("overwrite").parquet(s"$dir/model")
        val centroids = Similarity.readIvfModel(s, s"$dir/model")
        centroids.length shouldBe trained.length
        centroids.zip(trained).foreach { case (a, b) =>
          a.toSeq shouldBe b.toSeq } // bit-exact parquet round trip
        // three out-of-order staged batches == one-shot build
        Seq(2, 0, 1).foreach { p =>
          Similarity.ivfIndexState(
              corpus.where(pmod(col("vec_id"), lit(3)) === p),
              "vec_id", "embedding", centroids)
            .write.mode("overwrite").parquet(s"$dir/post/batch=$p")
        }
        val state = s.read.parquet(s"$dir/post")
          .select(col("graft_cell"), col("neighbor_id"), col("graft_cv"))
        val oneShot = Similarity.ivfIndexState(corpus, "vec_id", "embedding",
          centroids).select(col("graft_cell"), col("neighbor_id"))
        state.select(col("graft_cell"), col("neighbor_id"))
          .exceptAll(oneShot).count() shouldBe 0L
        oneShot.exceptAll(state.select(col("graft_cell"), col("neighbor_id")))
          .count() shouldBe 0L
        // serving from the staged state == the one-shot ivfTopK plan on
        // the same frozen quantizer
        def sets(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
            .view.mapValues(_.map(_._2).toSet).toMap
        val served = sets(Similarity.ivfTopKFromState(state, centroids,
          queries, "vec_id", "embedding", k = 10, nprobe = 2))
        val direct = sets(Similarity.ivfTopKFromState(
          Similarity.ivfIndexState(corpus, "vec_id", "embedding", centroids),
          centroids, queries, "vec_id", "embedding", k = 10, nprobe = 2))
        served shouldBe direct
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  "incremental PQ index state" should {
    "round-trip the model, fold staged codes, and serve identically" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(29)
      val centers = (0 until 8).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
      val corpus = (0 until 200).map { i =>
        val c = centers(i % 8)
        (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 8L)
      val dir = java.nio.file.Files.createTempDirectory("graft-pqstate").toString
      try {
        val trained = Similarity.trainPq(corpus, "embedding",
          m = 4, ksub = 8, sampleSize = 200)
        Similarity.pqModelFrame(s, trained)
          .write.mode("overwrite").parquet(s"$dir/model")
        val model = Similarity.readPqModel(s, s"$dir/model")
        model.m shouldBe trained.m
        model.dsub shouldBe trained.dsub
        model.codebooks.indices.foreach { j =>
          model.codebooks(j).indices.foreach { c =>
            model.codebooks(j)(c).toSeq shouldBe trained.codebooks(j)(c).toSeq
          }
        }
        Seq(1, 0).foreach { p =>
          Similarity.pqCodesState(
              corpus.where(pmod(col("vec_id"), lit(2)) === p),
              "vec_id", "embedding", model)
            .write.mode("overwrite").parquet(s"$dir/codes/batch=$p")
        }
        val codes = s.read.parquet(s"$dir/codes")
          .select(col("neighbor_id"), col("graft_codes"))
        val oneShot = Similarity.pqCodesState(corpus, "vec_id", "embedding",
          model)
        codes.exceptAll(oneShot).count() shouldBe 0L
        oneShot.exceptAll(codes).count() shouldBe 0L
        def sets(df: org.apache.spark.sql.DataFrame) =
          df.select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
            .view.mapValues(_.map(_._2).toSet).toMap
        val served = sets(Similarity.pqTopKFromCodes(codes, model,
          corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 10, rerank = 40))
        val direct = sets(Similarity.pqTopKFromCodes(oneShot, model,
          corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 10, rerank = 40))
        served shouldBe direct
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  "int8 quantization" should {
    "round-trip embeddings with high cosine fidelity and bounded codes" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(23)
      val vecs = ((0 until 50).map(i => (i.toLong, Array.fill(32)(rng.nextGaussian().toFloat))) :+
        (99L, Array.fill(32)(0.0f))).toDF("vec_id", "embedding")
      val staged = vecs
        .withColumn("q", Similarity.quantizeInt8(col("embedding")))
        .withColumn("deq", Similarity.dequantizeInt8(col("q")))
      val rows = staged.select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("deq")),
        org.apache.spark.sql.functions.array_max(
          org.apache.spark.sql.functions.transform(col("q.codes"),
            c => org.apache.spark.sql.functions.abs(c.cast("int"))))).collect()
      rows.filter(_.getLong(0) != 99L).foreach { r =>
        r.getDouble(1) should be >= 0.999
        r.getInt(2) should be <= 127
      }
      // zero vector: scale 0, zero codes, cosine guard yields 0 not NaN
      val zero = rows.find(_.getLong(0) == 99L).get
      zero.getDouble(1) shouldBe 0.0
      zero.getInt(2) shouldBe 0

      // normalization: unit norms, zero vector untouched
      val norms = vecs.select(col("vec_id"),
        Similarity.norm(Similarity.l2Normalize(col("embedding")))).collect()
      norms.filter(_.getLong(0) != 99L).foreach(_.getDouble(1) shouldBe (1.0 +- 1e-6))
      norms.find(_.getLong(0) == 99L).get.getDouble(1) shouldBe 0.0
    }
  }

  "IVF centroid training" should {
    "stay representative on cluster-SORTED input (seeded sample, not limit)" in {
      val s = spark
      import s.implicits._
      // 8 clusters laid out CONTIGUOUSLY: a limit(sample) would only ever
      // see the first clusters and recall for the rest would collapse
      val rng = new scala.util.Random(7)
      val centers = (0 until 8).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
      val corpus = (0 until 8).flatMap { cl =>
        (0 until 50).map { j =>
          ((cl * 50 + j).toLong, centers(cl).map(x => x + 0.05f * rng.nextGaussian().toFloat))
        }
      }.toDF("vec_id", "embedding").repartition(1).sortWithinPartitions("vec_id")
      // queries: one per cluster, including the LAST clusters
      val queries = corpus.filter(col("vec_id") % 50 === 0L)

      def topSets(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap

      val exact = topSets(Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10))
      val ivf = topSets(Similarity.ivfTopK(
        corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 2, sampleSize = 100, iterations = 5))
      val recall = exact.keys.toSeq.map { q =>
        ivf.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
      }.sum / exact.size
      recall should be >= 0.9
    }
  }

  "connectedComponents" should {
    "label chains and separate components with the minimum node id" in {
      val s = spark
      import s.implicits._
      // chain 1-2-3-4, pair 6-5 (reversed), isolated self-loop 9-9,
      // duplicate + reversed edges sprinkled in
      val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L), (4L, 3L),
        (9L, 9L), (1L, 2L)).toDF("a", "b")
      val comps = Dedup.connectedComponents(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      comps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L) // the self-loop node has no real edge: absent
    }

    "converge on a long chain in O(log n) rounds" in {
      val s = spark
      import s.implicits._
      // a 500-node path: diameter 499 — naive propagation would need ~500
      // rounds, the star algorithm must finish well inside maxRounds=30
      val chain = (0L until 499L).map(i => (i, i + 1)).toDF("a", "b")
      // localSolveMaxEdges = 0 forces the distributed star rounds — the
      // O(log n) claim under test is about THAT path, not the local solve
      val comps = Dedup.connectedComponents(chain, localSolveMaxEdges = 0)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      comps.size shouldBe 500
      comps.values.toSet shouldBe Set(0L)
    }

    "fail loudly instead of returning multi-labeled output when rounds run out" in {
      val s = spark
      import s.implicits._
      val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
      an[IllegalStateException] should be thrownBy
        Dedup.connectedComponents(chain, maxRounds = 1, localSolveMaxEdges = 0)
          .count()
    }

    "match a driver-side union-find on random graphs" in {
      val s = spark
      import s.implicits._
      for (seed <- Seq(7, 21)) {
        val rng = new scala.util.Random(seed)
        val n = 300
        val edges = (0 until 380).map(_ =>
          (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        // reference union-find with path compression
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        edges.foreach { case (x, y) =>
          if (x != y) {
            val (rx, ry) = (find(x.toInt), find(y.toInt))
            if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
          }
        }
        val touched = edges.flatMap { case (x, y) => Seq(x, y) }
          .filter(v => edges.exists { case (p, q) => p != q && (p == v || q == v) })
          .distinct
        val expected = touched.map { v =>
          // component label = min node in component among TOUCHED nodes
          val root = find(v.toInt)
          v -> touched.filter(u => find(u.toInt) == root).min
        }.toMap
        // BOTH paths — the distributed star rounds and the adaptive
        // small-graph local solve — must reproduce the reference labels
        val distributed = Dedup.connectedComponents(edges.toDF("a", "b"),
          localSolveMaxEdges = 0).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val localPath = Dedup.connectedComponents(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"seed $seed (distributed): ") { distributed shouldBe expected }
        withClue(s"seed $seed (local): ") { localPath shouldBe expected }
      }
    }
  }

  "nearDuplicateClusters" should {
    "cluster transitively and keep one canonical doc per cluster" in {
      val s = spark
      import s.implicits._
      // 1 and 4 are exact dups; 2 is a near-dup of both -> one cluster
      // {1,2,4} labeled 1; 3, 5, 6 are singletons
      val clustered = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
        threshold = 0.5)
      val byDoc = clustered.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
      byDoc(1L) shouldBe 1L
      byDoc(4L) shouldBe 1L
      byDoc(2L) shouldBe 1L
      byDoc(3L) shouldBe 3L
      byDoc(5L) shouldBe 5L
      clustered.columns.toSeq shouldBe (docs.columns.toSeq :+ "cluster")

      val kept = Dedup.deduplicateNear(docs, "doc_id", "text", threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      kept should contain allOf (1L, 3L, 5L)
      kept should contain noneOf (2L, 4L)
      Dedup.deduplicateNear(docs, "doc_id", "text", threshold = 0.5)
        .columns.toSeq shouldBe docs.columns.toSeq
    }
  }

  "exact dedup edge cases" should {
    "survive all-null tie-breakers and break ties deterministically" in {
      val s = spark
      import s.implicits._
      // min_by skips null ordering values: a group whose tieBreakers are
      // ALL null previously collapsed to a garbage all-NULL row
      val df = Seq(
        (1, Option.empty[Int], "x"), (1, Option.empty[Int], "y"),
        (2, Option(5), "a"), (2, Option.empty[Int], "b")).toDF("k", "tb", "v")
      val out = Dedup.exact(df, Seq("k"), "tb").collect()
        .map(r => r.getInt(0) -> r.getString(2)).toMap
      out.size shouldBe 2
      out.keySet shouldBe Set(1, 2)   // no null-key garbage row
      out(2) shouldBe "a"             // non-null tieBreaker wins
      // equal tieBreakers: same survivor on every run (row-hash tie-break)
      val tied = Seq((7, 1, "p"), (7, 1, "q")).toDF("k", "tb", "v")
      val picks = (1 to 5).map(_ =>
        Dedup.exact(tied.repartition(4), Seq("k"), "tb").collect().head.getString(2))
      picks.distinct.size shouldBe 1
    }

    "exclude shingle-less docs from MinHash candidates instead of pairing them at 1.0" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
        (4L, "the quick brown fox jumps over the lazy dog"),
        (5L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
      val pairs = Dedup.minHashCandidatePairs(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the empty/whitespace/null docs share the sentinel signature and
      // previously reported certain jaccard_est = 1.0 for all their pairs
      pairs shouldBe Set((4L, 5L))
    }
  }

  "pqTopK" should {
    "recover the exact top-k on a clustered corpus and score exactly" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(5)
      // 4 well-separated direction clusters in 16 dims; within a cluster
      // the exact-cosine gaps are FINER than PQ resolution, so the rerank
      // pool (60 > the 50-member cluster) must cover the query's whole
      // cluster — then recall is perfect and similarities EXACT (the
      // re-rank contract: PQ error may cost recall, never score accuracy)
      val centers = Array.fill(4, 16)(rng.nextGaussian() * 3)
      val corpus = (0 until 200).map { i =>
        val c = centers(i % 4)
        (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat))
      }.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 3L)
      val pq = Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, m = 8, ksub = 16,
        rerank = 60)
      val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      val pqRows = pq.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val bfRows = bf.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      pqRows.keySet shouldBe bfRows.keySet
      pqRows.foreach { case (k0, sim) => sim shouldBe bfRows(k0) +- 1e-12 }
    }

    "prune to the query's own cells on a clustered corpus (ivfPqTopK) and stay exact" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(5)
      // same 4-cluster fixture: with nlist = 4 the coarse cells track
      // the clusters, but k-means init can SPLIT one cluster across two
      // cells (observed: cluster 1 here) or merge two — so the probe
      // reads the query's 2 nearest cells and the rerank pool covers a
      // merged cell (120 >= 100); that recovers the exact top-k with
      // exact similarities while still pruning half the corpus
      val centers = Array.fill(4, 16)(rng.nextGaussian() * 3)
      val corpus = (0 until 200).map { i =>
        val c = centers(i % 4)
        (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat))
      }.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 3L)
      val ivfpq = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nlist = 4, nprobe = 2,
        m = 8, ksub = 16, rerank = 120)
      val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      val a = ivfpq.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val b = bf.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      a.keySet shouldBe b.keySet
      a.foreach { case (k0, sim) => sim shouldBe b(k0) +- 1e-12 }
    }

    "drop null vectors and respect the dim % m contract" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(9)
      val corpus = ((0 until 30).map(i =>
        (i.toLong, Option(Array.fill(8)(rng.nextGaussian().toFloat)))) ++
        Seq((900L, None: Option[Array[Float]])))
        .toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 2L)
      val out = Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 3, m = 4, ksub = 8).collect()
      out.groupBy(_.getLong(0)).values.foreach(_.length shouldBe 3)
      out.foreach(r => r.getLong(1) should not be 900L)
      an[IllegalArgumentException] should be thrownBy
        Similarity.trainPq(corpus, "embedding", m = 3)
    }
  }

  "lshTopK" should {
    "handle array<double> vector columns like the expression path did" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(11)
      val corpus = (0 until 100).map(i =>
        (i.toLong, Array.fill(8)(rng.nextGaussian()))).toDF("vec_id", "embedding")
      corpus.schema("embedding").dataType shouldBe
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)
      val queries = corpus.filter(col("vec_id") < 3L)
      val out = Similarity.lshTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      out.groupBy("query_id").count().collect()
        .foreach(_.getLong(1) shouldBe 5L)
    }

    "drop null-vector corpus rows instead of signing them into bucket 0" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(7)
      // null-vec rows previously got an ALL-ZERO signature in every table
      // (not a null bucket that falls out of the join) — landing in bucket
      // 0 everywhere, surfacing as null-similarity candidates that can
      // crowd out real neighbors from the top-k count
      val good = (0 until 30).map(i =>
        (i.toLong, Array.fill(6)(rng.nextGaussian().toFloat)))
      val corpus = (good.map { case (i, v) => (i, Option(v)) } ++
        Seq((900L, None: Option[Array[Float]]), (901L, None)))
        .toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 2L)
      val out = Similarity.lshTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5).collect()
      out.groupBy(_.getLong(0)).values.foreach(_.length shouldBe 5)
      out.foreach { r =>
        withClue(s"row $r: ") {
          Set(900L, 901L) should not contain r.getLong(1)
          r.isNullAt(2) shouldBe false
        }
      }
    }

    "return exactly k results per query even when probed buckets are empty" in {
      val s = spark
      import s.implicits._
      // adversarial: corpus clustered in one orthant, queries in the
      // opposite one — single-bit multi-probe cannot reach the corpus bucket
      val corpus = (0 until 40).map { i =>
        (i.toLong, Array(1.0f + i * 0.01f, 1.0f, 1.0f, 1.0f))
      }.toDF("vec_id", "embedding")
      val queries = Seq(
        (100L, Array(-1.0f, -1.0f, -1.0f, -1.0f)),
        (101L, Array(-1.0f, -0.9f, -1.0f, -1.0f))
      ).toDF("vec_id", "embedding")
      val res = Similarity.lshTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, planes = 12)
        .collect().map(r => (r.getLong(0), r.getInt(3))).groupBy(_._1)
      res.keySet shouldBe Set(100L, 101L)
      res(100L).map(_._2).sorted.toSeq shouldBe Seq(1, 2, 3, 4, 5)
      res(101L).map(_._2).sorted.toSeq shouldBe Seq(1, 2, 3, 4, 5)
    }
  }

  "LSH scale guards" should {
    "size planes and tables to the corpus and threshold" in {
      // capacity: 2^planes * maxBucketSize >= 2 * corpus
      Similarity.planesFor(100, 1000) shouldBe 1
      Similarity.planesFor(4000, 1000) shouldBe 3
      Similarity.planesFor(1000000, 1000) shouldBe 11
      // more corpus -> more planes; higher recall target -> more tables
      val (p1, t1) = Similarity.lshParamsFor(4000, 0.42, targetRecall = 0.95)
      val (p2, t2) = Similarity.lshParamsFor(4000, 0.42, targetRecall = 0.99)
      p1 shouldBe 3
      p2 shouldBe 3
      t2 should be > t1
      val (p3, _) = Similarity.lshParamsFor(4000000, 0.42)
      p3 should be > p1
      // tighter thresholds collide more -> need fewer tables
      val (_, tTight) = Similarity.lshParamsFor(4000, 0.9, targetRecall = 0.95)
      tTight should be < t1
    }

    "report bucket-cap exclusions via a named observation" in {
      val s = spark
      import s.implicits._
      // 300 identical-direction vectors: every table hashes them into ONE
      // bucket, so a cap of 50 must exclude 250 rows and say so
      val df = (0 until 300).map(i => (i.toLong, Array.fill(8)(1.0f)))
        .toDF("id", "vec")
      val observed = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          observed.synchronized { observed ++= qe.observedMetrics }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        Similarity.cosinePairsLsh(df, "id", "vec", threshold = 0.99,
          planes = 2, numTables = 1, maxBucketSize = 50).count()
        def capRows = observed.synchronized {
          observed.collect {
            case (name, row) if name.startsWith(Similarity.LshCapObservation.Prefix) => row
          }.toSeq
        }
        val deadline = System.currentTimeMillis() + 15000
        while (capRows.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val row = capRows.head
        row.getAs[Long]("excluded_rows") shouldBe 250L
        row.getAs[Long]("banded_rows") shouldBe 300L
      } finally {
        spark.listenerManager.unregister(listener)
      }
    }

    "report MinHash and SimHash bucket-cap exclusions via the Dedup channel" in {
      val s = spark
      import s.implicits._
      // 100 identical docs: one bucket per band/chunk; cap 10 keeps 10 rows
      // per bucket. MinHash bands 16: banded 1600, excluded 90*16; SimHash
      // chunks maxHamming+1 = 9: banded 900, excluded 90*9. Verified pairs
      // from the surviving bucket: C(10,2) = 45 in both pipelines.
      val df = (0 until 100).map(i =>
        (i.toLong, "the same exact document text repeated for every row"))
        .toDF("doc_id", "text")
      val observed = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          observed.synchronized { observed ++= qe.observedMetrics }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val sigs = Dedup.textSignatures(df, "doc_id", "text").persist()
        Dedup.nearDuplicatePairsFromSignatures(sigs, threshold = 0.9,
          numHashes = 64, bands = 16, maxBucketSize = 10)
          .count() shouldBe 45L
        Dedup.simHashPairsFromSignatures(sigs, maxHamming = 8, maxBucketSize = 10)
          .count() shouldBe 45L
        sigs.unpersist(blocking = false)
        def capRows = observed.synchronized {
          observed.collect {
            case (name, row) if name.startsWith(Dedup.DedupCapObservation.Prefix) => row
          }.toSeq
        }
        val deadline = System.currentTimeMillis() + 15000
        while (capRows.size < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val byBanded = capRows.map(r =>
          r.getAs[Long]("banded_rows") -> r.getAs[Long]("excluded_rows")).toMap
        byBanded(1600L) shouldBe (90L * 16) // MinHash bands
        byBanded(900L) shouldBe (90L * 9) // SimHash chunks
      } finally {
        spark.listenerManager.unregister(listener)
      }
    }
  }

  "internal caches" should {
    "survive the declared number of consumptions under withConsumptions" in {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val pairs = graft.pipeline.CacheLifecycle.withConsumptions(2) {
        Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      }
      pairs.count()
      // first consumption: caches must still be alive (give the async
      // listener time to have fired if it were going to release wrongly)
      Thread.sleep(1500)
      (sc.getPersistentRDDs.keySet -- before) should not be empty
      pairs.count()
      // second consumption: released
      def leaked = sc.getPersistentRDDs.keySet -- before
      val deadline = System.currentTimeMillis() + 15000
      while (leaked.nonEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      leaked shouldBe empty
    }

    "be released after the returned pairs are consumed" in {
      val sc = spark.sparkContext
      // delta-based: other suites share this session and may hold caches
      val before = sc.getPersistentRDDs.keySet
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5).count()
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 4).count()
      Dedup.minHashCandidatePairs(docs, "doc_id", "text").count()
      // the release listener fires asynchronously on the listener bus
      def leaked = sc.getPersistentRDDs.keySet -- before
      val deadline = System.currentTimeMillis() + 15000
      while (leaked.nonEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      leaked shouldBe empty
    }
  }

  "languageIdCounts" should {
    "agree exactly with the expression-form languageId grouping" in {
      val s = spark
      import s.implicits._
      val texts = Seq(
        "the quick brown fox is on the hill and it is fine",
        "el perro y la casa en un lugar de los campos",
        "der hund und die katze ist mit einem ball von zu hause",
        "le chat est dans la maison pour les amis et des autres",
        "这是一个中文文档 with some latin",
        "xyzzy plugh qwerty",
        "",
        "la que", // es/fr marker tie -> alphabetical winner (es)
        null
      ).toDF("text")
      val fast = graft.pipeline.TextAnalysis.languageIdCounts(texts, "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val slow = texts
        .select(col("text"),
          graft.pipeline.TextAnalysis.normalizedTokens(col("text")).as("toks"))
        .groupBy(graft.pipeline.TextAnalysis
          .languageIdFromTokens(col("toks"), col("text")).as("p"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fast shouldBe slow
      fast("es") shouldBe 2L // includes the tie-break doc
      fast("zh") shouldBe 1L
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

    "detect and redact PII artifacts" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        "write to a.b+c@mail-host.org or see https://x.io/p?q=1 from 192.168.0.1",
        "nothing sensitive here",
        "two mails: a@b.co c@d.org").toDF("text")
      val t = col("text")
      val rows = df.select(
        TextAnalysis.emailCount(t), TextAnalysis.urlCount(t),
        TextAnalysis.ipCount(t), TextAnalysis.containsPii(t),
        TextAnalysis.redactPii(t)).collect()
      rows(0).getInt(0) shouldBe 1
      rows(0).getInt(1) shouldBe 1
      rows(0).getInt(2) shouldBe 1
      rows(0).getBoolean(3) shouldBe true
      rows(0).getString(4) shouldBe "write to [EMAIL] or see [URL] from [IP]"
      rows(1).getBoolean(3) shouldBe false
      rows(1).getString(4) shouldBe "nothing sensitive here"
      rows(2).getInt(0) shouldBe 2
      rows(2).getString(4) shouldBe "two mails: [EMAIL] [EMAIL]"
    }
  }

  "repetition stats" should {
    "compute n-gram cover and duplicate-item fractions by hand-checkable values" in {
      val s = spark
      import s.implicits._
      import graft.pipeline.Repetition
      val docs = Seq(
        // tokens: a b a b c -> 2-grams: "a b"(2) "b a"(1) "b c"(1)
        // total_chars = 5 tokens * 1 + 4 spaces = 9; top cover = 2*3 = 6
        (1L, "A b a  B c"),
        // lines: x / x / y -> 3 lines, 2 duplicates; chars 2 of 3
        (2L, "x\nx\ny"),
        // paragraphs: "p q" twice, "r" once (blank-line separated)
        (3L, "p q\n\np q\n \nr"),
        (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val m = Repetition.stats(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap

      m(1L).getLong(1) shouldBe 5L            // n_tokens
      m(1L).getLong(2) shouldBe 9L            // total_chars
      m(1L).getAs[Long]("top_gram_cover_2") shouldBe 6L
      m(1L).getAs[Double]("top_gram_frac_2") shouldBe 6.0 / 9.0
      m(1L).getAs[Long]("dup_gram_chars_5") shouldBe 0L

      m(2L).getLong(3) shouldBe 3L            // n_lines
      m(2L).getAs[Double]("dup_line_frac") shouldBe 2.0 / 3.0
      m(2L).getAs[Double]("dup_line_char_frac") shouldBe 2.0 / 3.0

      m(3L).getAs[Long]("n_paras") shouldBe 3L
      m(3L).getAs[Double]("dup_para_frac") shouldBe 2.0 / 3.0
      m(3L).getAs[Double]("dup_para_char_frac") shouldBe 6.0 / 7.0

      m(4L).getLong(1) shouldBe 0L
      m(4L).getAs[Double]("dup_line_frac") shouldBe 0.0
      m(4L).getAs[Double]("top_gram_frac_2") shouldBe 0.0
    }

    "count character masses in code points, not UTF-16 units" in {
      val s = spark
      import s.implicits._
      import graft.pipeline.Repetition
      // U+1F600 is one code point but two UTF-16 units; lines "😀","😀","x"
      // give dup chars 2 of 3 in code points (4 of 5 in UTF-16 units)
      val docs = Seq((1L, "😀\n😀\nx"))
        .toDF("doc_id", "text")
      val r = Repetition.stats(docs, "doc_id", "text").collect().head
      r.getAs[Double]("dup_line_char_frac") shouldBe 2.0 / 3.0
      r.getAs[Long]("total_chars") shouldBe 5L // 3 one-cp tokens + 2 spaces
    }

    "count overlapping occurrences and fire the Gopher filter on degenerate docs" in {
      val s = spark
      import s.implicits._
      import graft.pipeline.Repetition
      val spam = ("buy now " * 40).trim            // one 2-gram dominates
      val clean = (1 to 80).map(i => s"tok$i").mkString(" ")
      val docs = Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
      val st = Repetition.stats(docs, "doc_id", "text")
      val withKeep = st.select(col("graft_id"), Repetition.gopherKeep().as("keep"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      withKeep shouldBe Map(1L -> false, 2L -> true)
      // "buy now" repeated: dup 5-grams cover the whole text (frac > 1 is
      // legal under the per-occurrence convention)
      st.where(col("graft_id") === 1L)
        .select(col("dup_gram_frac_5")).collect().head.getDouble(0) should be > 1.0
      Repetition.filter(docs, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    }
  }

  "decontamination" should {
    "flag exactly the documents sharing a probe n-gram" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (1L, "alpha beta gamma delta epsilon"),   // contains probe 1
        (2L, "zz Alpha BETA gamma yy"),           // probe 1, case/position shifted
        (3L, "alphax beta gamma delta"),          // token boundary breaks the match
        (4L, "beta gamma alpha delta"),           // same tokens, wrong order
        (5L, "unrelated text entirely here"),
        (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val probes = Seq(
        "ALPHA  beta GAMMA",   // normalization: case + whitespace runs
        "delta epsilon",       // < n tokens: ignored
        "no match anywhere9"   // 3 tokens, matches nothing
      ).toDF("probe")
      val m = TextAnalysis.contaminationMatches(
        corpus, "doc_id", "text", probes, "probe", n = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      m shouldBe Map(1L -> 1L, 2L -> 1L)

      val kept = TextAnalysis.decontaminate(
        corpus, "doc_id", "text", probes, "probe", n = 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      kept shouldBe Set(3L, 4L, 5L, 6L)
    }

    "count distinct probe n-grams per document" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (1L, "one two three four five six one two three"),
        (2L, "four five six")).toDF("doc_id", "text")
      val probes = Seq("one two three", "four five six").toDF("probe")
      val m = TextAnalysis.contaminationMatches(
        corpus, "doc_id", "text", probes, "probe", n = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // doc 1 contains probe 1 twice but it counts ONCE; both probes hit
      m shouldBe Map(1L -> 2L, 2L -> 1L)
    }
  }

  "Dedup.dedupParagraphs" should {
    def paraDocs = {
      val s = spark
      import s.implicits._
      Seq(
        (1L, "a b\nc d\ne f"),       // all first occurrences
        (2L, "c d\ng h"),            // "c d" repeats doc 1 pos 1
        (3L, "a b\nc d"),            // fully emptied
        (4L, null.asInstanceOf[String]), // null text: zero paragraphs
        (5L, "  \n \n"),             // whitespace-only: zero paragraphs
        (6L, "x y\nx y\nz")          // in-document repeat
      ).toDF("doc_id", "text")
    }

    "keep globally-first occurrences and reassemble in original order" in {
      val out = Dedup.dedupParagraphs(paraDocs, "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      out(1L) shouldBe (("a b\nc d\ne f", 3L, 3L, 0L))
      out(2L) shouldBe (("g h", 2L, 1L, 1L))
      out(3L) shouldBe (("", 2L, 0L, 2L))     // emptied, not dropped
      out(4L) shouldBe (("", 0L, 0L, 0L))
      out(5L) shouldBe (("", 0L, 0L, 0L))
      out(6L) shouldBe (("x y\nz", 3L, 2L, 1L))
    }

    "elect winners by (id, position) and never lose a distinct paragraph" in {
      val s = spark
      import s.implicits._
      // same paragraphs, ids reversed: the winner must follow the SMALLER
      // id, so doc 10's copy goes, doc 9 keeps it
      val df = Seq((10L, "p q\nr s"), (9L, "r s\nt u")).toDF("doc_id", "text")
      val out = Dedup.dedupParagraphs(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out(9L) shouldBe "r s\nt u"
      out(10L) shouldBe "p q"
      // corpus-wide: kept paragraphs == distinct paragraphs, always
      val occ = Dedup.paragraphOccurrences(paraDocs, "doc_id", "text")
      val distinct = occ.select("graft_para").distinct().count()
      val kept = Dedup.dedupParagraphs(paraDocs, "doc_id", "text")
        .agg(org.apache.spark.sql.functions.sum("n_kept"))
        .collect().head.getLong(0)
      kept shouldBe distinct
    }

    "agree with a local replay and keep a Window-free, cartesian-free plan" in {
      val s = spark
      import s.implicits._
      // adversarial corpus: heavy cross-doc repetition, in-doc repeats,
      // variable paragraph widths
      val words = Array("red", "blue", "green", "gold")
      val docs = (0L until 60L).map { i =>
        val paras = (0 to (i % 5).toInt).map { j =>
          val w = words(((i + j) % 4).toInt); s"$w ${words((j % 4))}"
        }
        (i, paras.mkString("\n"))
      }
      val df = docs.toDF("doc_id", "text")
      // local replay of the exact contract
      val occ = docs.flatMap { case (id, t) =>
        t.split("\n+").map(_.trim).filter(_.nonEmpty).zipWithIndex
          .map { case (p, pos) => (id, pos, p) }
      }
      val winner = occ.groupBy(_._3).map { case (p, g) =>
        p -> g.map(t => (t._1, t._2)).min
      }
      val expected = docs.map { case (id, t) =>
        val keptParas = t.split("\n+").map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.filter { case (p, pos) => winner(p) == ((id, pos)) }
        id -> keptParas.map(_._1).mkString("\n")
      }.toMap
      val result = Dedup.dedupParagraphs(df, "doc_id", "text")
      result.collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
        expected
      val plan = result.queryExecution.executedPlan.toString()
      plan should not include "Window"
      plan should not include "CartesianProduct"
    }

    "use a \\S-free injection pattern that Java and RE2 read identically" in {
      val s = spark
      import s.implicits._
      // Java's \s includes vertical tab (\x0B); RE2's does not, so a `\S`
      // in the q54 injection regex would make the engine and the DuckDB
      // oracle split DIFFERENT corpora on any document containing \x0B.
      // The shared pattern spells the class out — pin that it stays
      // \S-free, that the SQL mirror carries the identical pattern text
      // (same escaping on both sides), and that \x0B behaves as
      // "neither word char nor separator" on the engine side.
      SparkEntry.ParaInjectPattern should not include "\\S"
      SparkEntry.oracleSql("q54_paragraph_dedup") should
        include (SparkEntry.ParaInjectPattern)
      val out = Seq(
        "w1 w2 w3 w4 w5 w6 w7 w8 x",  // breaks after every 4th word
        "a\u000Bb c d e f"            // \x0B splits "a" off the word run
      ).toDF("text")
        .select(org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("text"),
          SparkEntry.ParaInjectPattern, SparkEntry.ParaInjectReplacement))
        .as[String].collect()
      out(0) shouldBe "w1 w2 w3 w4\nw5 w6 w7 w8\nx"
      // no match can start at "a" (\x0B is not the required separator
      // space), so the 4-word run is "b c d e" — same under RE2
      out(1) shouldBe "a\u000Bb c d e\nf"
    }
  }

  "TextAnalysis tf-idf" should {
    def tfDocs = {
      val s = spark
      import s.implicits._
      Seq[(java.lang.Long, String)](
        (1L, "apple banana apple"),           // tf(apple)=2
        (2L, "banana cherry"),
        (3L, "apple Cherry CHERRY date"),     // case folds to cherry tf=2
        (4L, ""),                             // no tokens: excluded from N
        (5L, null),                           // null text: excluded from N
        (null, "dropped row"))                // null id: dropped
        .toDF("doc_id", "text")
    }

    "count exact per-document term frequencies" in {
      val tf = TextAnalysis.termFrequencies(tfDocs, "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      tf shouldBe Map(
        (1L, "apple") -> 2L, (1L, "banana") -> 1L,
        (2L, "banana") -> 1L, (2L, "cherry") -> 1L,
        (3L, "apple") -> 1L, (3L, "cherry") -> 2L, (3L, "date") -> 1L)
    }

    "rank by the smoothed tf-idf with an ascending-term tie-break" in {
      // N = 3 (docs 4/5 have no tokens, null id dropped).
      // df: apple 2, banana 2, cherry 2, date 1.
      // idf(df=2) = ln(4/3)+1 ~ 1.2877, idf(df=1) = ln(4/2)+1 ~ 1.6931.
      // doc 1: apple 2*1.2877=2.575 > banana 1.2877 — apple first.
      // doc 2: banana vs cherry tie at 1.2877 — banana wins rank 1 by term.
      // doc 3: cherry 2.575 > date 1.693 > apple 1.2877.
      val top = TextAnalysis.tfidfTopTerms(tfDocs, "doc_id", "text", k = 2)
      val byDoc = top.collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getString(1), r.getAs[Int]("rank"))).toSeq).toMap
      byDoc shouldBe Map(
        1L -> Seq(("apple", 1), ("banana", 2)),
        2L -> Seq(("banana", 1), ("cherry", 2)),
        3L -> Seq(("cherry", 1), ("date", 2)))
      // the score column carries the documented smoothed formula
      val s13 = top.where(col("doc_id") === 3L && col("rank") === 2)
        .select(col("score")).collect().head.getDouble(0)
      s13 shouldBe (math.log(4.0 / 2.0) + 1.0) +- 1e-12
    }

    "skip the count job when totalDocs is supplied, same result" in {
      val implicitN = TextAnalysis.tfidfTopTerms(tfDocs, "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("rank")))
        .toSet
      val explicitN = TextAnalysis
        .tfidfTopTerms(tfDocs, "doc_id", "text", 3, totalDocs = 3L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("rank")))
        .toSet
      explicitN shouldBe implicitN
      // plan shape: per-document window (bounded state), never a global sort
      val plan = TextAnalysis.tfidfTopTerms(tfDocs, "doc_id", "text", 3,
        totalDocs = 3L).queryExecution.executedPlan.toString()
      plan should not include "CartesianProduct"
    }
  }

  "c4Clean" should {
    "apply the C4 line and document rules" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        // 5 lines: kept, too-few-words, no-terminal-punct, kept, kept
        (1L, "this line has five words.\nshort line.\n" +
          "no terminal punct here at all\nanother good line with words!\n" +
          "a third fine line right here?"),
        // only one surviving line -> document dropped
        (2L, "only one good line here.\ntiny."),
        // enough good lines but the doc-blocklist phrase kills the page
        (3L, "lorem ipsum dolor sit amet.\ngood line number two here.\n" +
          "good line number three here.\ngood line number four here."),
        // enough good lines but a curly brace kills the page
        (4L, "braces are code marks right.\ngood line { two here.\n" +
          "good line number three here.\ngood line number four here."),
        // line blocklist: the javascript line is dropped, doc falls to 2
        (5L, "visit our javascript powered site.\ngood line number two here.\n" +
          "good line number three here."),
        (6L, null.asInstanceOf[String])
      ).toDF("doc_id", "text")

      val out = TextAnalysis.c4Clean(docs, "doc_id", "text").collect()
        .map(r => r.getLong(0) ->
          (r.getInt(2), r.getInt(3), r.getBoolean(4), r.getString(1))).toMap

      out(1L)._1 shouldBe 5
      out(1L)._2 shouldBe 3
      out(1L)._3 shouldBe true
      out(1L)._4 shouldBe "this line has five words.\n" +
        "another good line with words!\na third fine line right here?"
      out(2L)._3 shouldBe false
      out(3L)._2 shouldBe 4 // lines survive; the DOC rule blocks it
      out(3L)._3 shouldBe false
      out(4L)._3 shouldBe false
      out(5L)._2 shouldBe 2 // javascript line dropped by the LINE rule
      out(5L)._3 shouldBe false
      out(6L) shouldBe ((0, 0, false, ""))
    }

    "shuffle nothing — the whole operator is map-side" in {
      val s = spark
      import s.implicits._
      val docs = Seq((1L, "a b c d e.\nf g h i j!")).toDF("doc_id", "text")
      val plan = TextAnalysis.c4Clean(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString()
      plan should not include "Exchange"
    }
  }

  "unigramCrossEntropy" should {
    "match hand-computed Laplace-smoothed entropies" in {
      val s = spark
      import s.implicits._
      // corpus: T = 5 tokens, V = 3 terms; c(a)=2, c(b)=2, c(c)=1
      val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
      val out = TextAnalysis.unigramCrossEntropy(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      val z = math.log(8.0) // T + V = 8
      val lpA = math.log(3.0) - z // (2+1)/8
      val lpB = math.log(3.0) - z
      val lpC = math.log(2.0) - z // (1+1)/8
      out(1L)._1 shouldBe 3L
      out(1L)._2 shouldBe -(2 * lpA + lpB) +- 1e-12
      out(1L)._3 shouldBe -(2 * lpA + lpB) / 3.0 +- 1e-12
      out(2L)._1 shouldBe 2L
      out(2L)._2 shouldBe -(lpB + lpC) +- 1e-12
      out(2L)._3 shouldBe -(lpB + lpC) / 2.0 +- 1e-12
    }

    "release the internal tf cache after consumption" in {
      val s = spark
      import s.implicits._
      val before = s.sparkContext.getPersistentRDDs.size
      val docs = Seq((1L, "x y z"), (2L, "x x")).toDF("doc_id", "text")
      TextAnalysis.unigramCrossEntropy(docs, "doc_id", "text").count() shouldBe 2L
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (s.sparkContext.getPersistentRDDs.size > before &&
          System.nanoTime() < deadline) Thread.sleep(100)
      s.sparkContext.getPersistentRDDs.size shouldBe before
    }
  }

  "contaminationReport" should {
    "count contaminated docs and match pairs per probe" in {
      val s = spark
      import s.implicits._
      val corpus = Seq((1L, "a b c d"), (2L, "c d e"), (3L, "x y z"))
        .toDF("doc_id", "text")
      val probes = Seq((100L, "a b c"), (200L, "c d q"), (300L, "q"))
        .toDF("probe_id", "probe")
      val out = TextAnalysis
        .contaminationReport(corpus, "doc_id", "text", probes,
          "probe_id", "probe", n = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // probe 100 grams {a b, b c}: both in doc 1 only -> 1 doc, 2 pairs
      // probe 200 grams {c d, d q}: c d in docs 1 and 2 -> 2 docs, 2 pairs
      // probe 300 is shorter than n -> excluded entirely
      out shouldBe Map(100L -> ((1L, 2L)), 200L -> ((2L, 2L)))
    }
  }

  "bigramCrossEntropy" should {
    "match hand-computed smoothed bigram entropies and skip short docs" in {
      val s = spark
      import s.implicits._
      // doc1 bigrams: (a,b)x2, (b,a); doc2: (b,b); doc3 has no bigram
      // corpus: c(a,b)=2, c(b,a)=1, c(b,b)=1; heads c(a.)=2, c(b.)=2; V=2
      val docs = Seq((1L, "a b a b"), (2L, "b b"), (3L, "x"))
        .toDF("doc_id", "text")
      val out = TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      out.keySet shouldBe Set(1L, 2L) // the 1-token doc emits nothing
      val lpAB = math.log(3.0) - math.log(4.0) // (2+1)/(2+2)
      val lpBA = math.log(2.0) - math.log(4.0) // (1+1)/(2+2)
      val lpBB = math.log(2.0) - math.log(4.0)
      out(1L)._1 shouldBe 3L
      out(1L)._2 shouldBe -(2 * lpAB + lpBA) +- 1e-12
      out(1L)._3 shouldBe -(2 * lpAB + lpBA) / 3.0 +- 1e-12
      out(2L)._1 shouldBe 1L
      out(2L)._2 shouldBe -lpBB +- 1e-12
    }
  }

  "dsirLogWeights" should {
    "match hand-computed target-vs-raw log ratios" in {
      val s = spark
      import s.implicits._
      // target = doc 1: cr = {a:2, b:2, c:1}, ct = {a:2, b:1, c:0},
      // Tr=5, Tt=3, V=3 -> Zr=ln 8, Zt=ln 6
      val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
      val out = TextAnalysis
        .dsirLogWeights(docs, "doc_id", "text", col("doc_id") === 1L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val z8 = math.log(8.0); val z6 = math.log(6.0)
      def ratio(ct: Long, cr: Long): Double =
        (math.log(ct + 1.0) - z6) - (math.log(cr + 1.0) - z8)
      out(1L)._1 shouldBe 3L
      out(1L)._2 shouldBe (2 * ratio(2, 2) + ratio(1, 2)) +- 1e-12
      out(2L)._1 shouldBe 2L
      out(2L)._2 shouldBe (ratio(1, 2) + ratio(0, 1)) +- 1e-12
    }
  }

  "semDedup" should {
    val centroids = Seq(Array(1.0, 0.0), Array(0.0, 1.0))

    "drop within-cluster near-duplicates, keeping the lowest id" in {
      val s = spark
      import s.implicits._
      val emb = Seq(
        (0L, Seq(1.0f, 0.05f)), // cell 0, survivor
        (1L, Seq(1.0f, 0.06f)), // cell 0, cosine ~1 to id 0 -> dropped
        (2L, Seq(0.05f, 1.0f)), // cell 1, survivor
        (3L, Seq(-0.5f, 1.0f)), // cell 1, cosine to id 2 ~0.87 -> kept at 0.95
        (4L, Seq(0.06f, 1.0f))  // cell 1, cosine ~1 to id 2 -> dropped
      ).toDF("vec_id", "embedding")
      val res = Similarity.semDedup(emb, "vec_id", "embedding", centroids, 0.95)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
      res(0L) shouldBe ((0, true))
      res(1L) shouldBe ((0, false))
      res(2L) shouldBe ((1, true))
      res(3L) shouldBe ((1, true))
      res(4L) shouldBe ((1, false))
    }

    "never drop members excluded by the cluster-size cap" in {
      val s = spark
      import s.implicits._
      // three identical vectors in one cell; cap 1 -> no pair is ever
      // compared, so dedup under-deletes instead of comparing a capped set
      val emb = (0L to 2L).map(i => (i, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
      val res = Similarity
        .semDedup(emb, "vec_id", "embedding", centroids, 0.9, maxClusterSize = 1)
        .collect()
      res.length shouldBe 3
      all(res.map(_.getBoolean(2))) shouldBe true
    }

    "semDedupAuto trains centroids and produces one verdict per vector" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(7)
      val emb = (0L until 40L).map { i =>
        val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f)
        (i, base.map(x => x + rng.nextFloat() * 0.01f).toSeq)
      }.toDF("vec_id", "embedding")
      val res = graft.pipeline.CacheLifecycle.withConsumptions(2) {
        Similarity.semDedupAuto(emb, "vec_id", "embedding",
          tau = 0.9, nlist = 4, maxClusterSize = 100)
      }
      res.count() shouldBe 40L
      // every within-cell pair is same-base (cosine ~0.99995 >= 0.9), so
      // exactly ONE member survives per occupied cell
      val perCell = res.groupBy("cell")
        .agg(sum(when(col("kept"), 1).otherwise(0)).as("k"))
        .collect().map(_.getLong(1))
      all(perCell) shouldBe 1L
    }
  }

  "interpolatedCrossEntropy" should {
    "match the hand-computed Jelinek-Mercer mixture" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a b a")).toDF("doc_id", "text")
      val r = TextAnalysis.interpolatedCrossEntropy(df, "doc_id", "text", 0.7)
        .collect().head
      // bigrams (a,b),(b,a): c12=1, ch=1, ct=1, vh=vt=2, B=2
      // p = 0.7*(2/3) + 0.3*(2/4) for both
      val p = 0.7 * (2.0 / 3) + 0.3 * (2.0 / 4)
      r.getLong(1) shouldBe 2L
      r.getDouble(3) shouldBe -math.log(p) +- 1e-12
    }

    "reduce to the pure bigram model at lambda = 1" in {
      val both = TextAnalysis
        .interpolatedCrossEntropy(docs, "doc_id", "text", lambda = 1.0)
        .select(col("doc_id"), col("cross_entropy").as("h_i"))
        .join(TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
          .select(col("doc_id"), col("cross_entropy").as("h_b")), Seq("doc_id"))
        .collect()
      both should not be empty
      both.foreach(r => r.getDouble(1) shouldBe r.getDouble(2) +- 1e-12)
    }
  }

  "kneserNeyCrossEntropy" should {
    "match the hand-computed interpolated KN model" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
      // pairs: (a,b)=2, (b,a)=1, (a,c)=1; heads a: ch=3 nfwd=2, b: ch=1
      // nfwd=1; conts b=1, a=1, c=1; ntypes=3; D=0.75
      val pBgivenA = (2 - 0.75) / 3 + 0.75 * 2 / 3.0 * (1.0 / 3)
      val pAgivenB = (1 - 0.75) / 1 + 0.75 * 1 / 1.0 * (1.0 / 3)
      val pCgivenA = (1 - 0.75) / 3 + 0.75 * 2 / 3.0 * (1.0 / 3)
      val out = TextAnalysis
        .kneserNeyCrossEntropy(df, "doc_id", "text", discount = 0.75)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      out(1L)._1 shouldBe 3L
      out(1L)._2 shouldBe -(2 * math.log(pBgivenA) + math.log(pAgivenB)) +- 1e-12
      out(2L)._1 shouldBe 1L
      out(2L)._2 shouldBe -math.log(pCgivenA) +- 1e-12
    }

    "stay strictly positive and finite on the shared doc fixture" in {
      val out = TextAnalysis.kneserNeyCrossEntropy(docs, "doc_id", "text")
        .collect()
      out should not be empty
      out.foreach { r =>
        val h = r.getAs[Double]("cross_entropy")
        h should be > 0.0
        java.lang.Double.isFinite(h) shouldBe true
      }
    }
  }

  "kneserNeyNgramCrossEntropy" should {
    "reduce to the bigram Kneser-Ney model at order 2" in {
      val out = TextAnalysis
        .kneserNeyNgramCrossEntropy(docs, "doc_id", "text", order = 2)
        .select(col("doc_id"), col("cross_entropy").as("h_g"))
        .join(TextAnalysis.kneserNeyCrossEntropy(docs, "doc_id", "text")
          .select(col("doc_id"), col("cross_entropy").as("h_b")), Seq("doc_id"))
        .collect()
      out should not be empty
      out.foreach(r => r.getDouble(1) shouldBe r.getDouble(2) +- 1e-12)
    }

    "match an independent in-memory reference at order 4" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (1L, "a b c a b c a b"),
        (2L, "b c a b d a b c"),
        (3L, "a b c d a b c d a"),
        (4L, "c a b c a"))
      val d = 0.75
      val n = 4
      // reference: the strict suffix-type recursion, computed naively
      val grams: Seq[(Long, Vector[String])] = corpus.flatMap { case (id, t) =>
        val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
        if (ws.length < n) Vector.empty
        else ws.sliding(n).map(g => (id, g.toVector)).toVector
      }
      val full = grams.map(_._2)
      val types = full.distinct
      def suffixTypes(k: Int): Seq[Vector[String]] =
        types.map(_.takeRight(k)).distinct
      val s2 = suffixTypes(2)
      def p(g: Vector[String]): Double = {
        var prob = s2.count(_.last == g.last).toDouble / s2.size
        for (k <- 2 to n) {
          val sK = g.takeRight(k)
          val cK = sK.dropRight(1)
          val (num, den, gam) =
            if (k == n) (
              math.max(full.count(_ == g) - d, 0.0),
              full.count(_.dropRight(1) == cK).toDouble,
              types.count(_.dropRight(1) == cK).toDouble)
            else {
              val sk1 = suffixTypes(k + 1)
              (math.max(sk1.count(_.takeRight(k) == sK) - d, 0.0),
                sk1.count(_.slice(1, k) == cK).toDouble,
                suffixTypes(k).count(_.dropRight(1) == cK).toDouble)
            }
          prob = num / den + d * gam / den * prob
        }
        prob
      }
      val expected: Map[Long, (Long, Double)] = grams.groupBy(_._1).map {
        case (id, gs) => id -> ((gs.size.toLong,
          gs.map(g => -math.log(p(g._2))).sum))
      }
      val out = TextAnalysis
        .kneserNeyNgramCrossEntropy(corpus.toDF("doc_id", "text"),
          "doc_id", "text", order = n, discount = d)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      out.keySet shouldBe expected.keySet
      expected.foreach { case (id, (cnt, nll)) =>
        out(id)._1 shouldBe cnt
        out(id)._2 shouldBe nll +- 1e-9
      }
    }

    "stay positive/finite at order 5 via lmCrossEntropy and drop short docs" in {
      import TextAnalysis.LmSmoothing
      val out = TextAnalysis
        .lmCrossEntropy(docs, "doc_id", "text", order = 5,
          smoothing = LmSmoothing.KneserNey(0.75))
        .collect()
      out should not be empty
      out.foreach { r =>
        val h = r.getAs[Double]("cross_entropy")
        h should be > 0.0
        java.lang.Double.isFinite(h) shouldBe true
      }
      val s = spark
      import s.implicits._
      TextAnalysis.kneserNeyNgramCrossEntropy(
        Seq((1L, "one two three four")).toDF("doc_id", "text"),
        "doc_id", "text", order = 5)
        .count() shouldBe 0L
    }
  }

  "kneserNeyTrigramCrossEntropy" should {
    "match the hand-computed order-3 interpolated KN model" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a b a b a"), (2L, "a b c")).toDF("doc_id", "text")
      // trigram counts: aba=2, bab=1, abc=1; ntypes=3; D=0.75
      // contexts: c(ab·)=3 with 2 continuation types, c(ba·)=1 with 1
      // continuation counts: N1+(·ba)=1, N1+(·ab)=1, N1+(·bc)=1
      // middles: N1+(·b·)=2 types, N1+(·a·)=1; fan-outs N1+(b·*)=2, N1+(a·*)=1
      // lasts: N1+(··a)=1, N1+(··b)=1, N1+(··c)=1
      val p2aGivenB = (1 - 0.75) / 2 + 0.75 * 2 / 2.0 * (1.0 / 3)
      val p2bGivenA = (1 - 0.75) / 1 + 0.75 * 1 / 1.0 * (1.0 / 3)
      val p2cGivenB = (1 - 0.75) / 2 + 0.75 * 2 / 2.0 * (1.0 / 3)
      val p3aba = (2 - 0.75) / 3 + 0.75 * 2 / 3.0 * p2aGivenB
      val p3bab = (1 - 0.75) / 1 + 0.75 * 1 / 1.0 * p2bGivenA
      val p3abc = (1 - 0.75) / 3 + 0.75 * 2 / 3.0 * p2cGivenB
      val out = TextAnalysis
        .kneserNeyTrigramCrossEntropy(df, "doc_id", "text", discount = 0.75)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      out(1L)._1 shouldBe 3L
      out(1L)._2 shouldBe -(2 * math.log(p3aba) + math.log(p3bab)) +- 1e-12
      out(2L)._1 shouldBe 1L
      out(2L)._2 shouldBe -math.log(p3abc) +- 1e-12
    }

    "stay strictly positive and finite, drop short docs, and dispatch via lmCrossEntropy" in {
      import TextAnalysis.LmSmoothing
      val out = TextAnalysis
        .lmCrossEntropy(docs, "doc_id", "text", order = 3,
          smoothing = LmSmoothing.KneserNey(0.75))
        .join(TextAnalysis
          .kneserNeyTrigramCrossEntropy(docs, "doc_id", "text")
          .select(col("doc_id"), col("cross_entropy").as("h_k")),
          Seq("doc_id"))
        .collect()
      out should not be empty
      out.foreach { r =>
        val h = r.getAs[Double]("cross_entropy")
        h should be > 0.0
        java.lang.Double.isFinite(h) shouldBe true
        h shouldBe r.getAs[Double]("h_k") +- 1e-12
      }
      // a 2-token doc has no trigram: absent from the output
      val s = spark
      import s.implicits._
      TextAnalysis.kneserNeyTrigramCrossEntropy(
        Seq((1L, "only two")).toDF("doc_id", "text"), "doc_id", "text")
        .count() shouldBe 0L
    }
  }

  "lmCrossEntropy" should {
    "dispatch to the matching scorer and reject unknown combinations" in {
      import TextAnalysis.LmSmoothing
      val kn = TextAnalysis
        .lmCrossEntropy(docs, "doc_id", "text", order = 2,
          smoothing = LmSmoothing.KneserNey(0.75))
        .select(col("doc_id"), col("cross_entropy").as("h_d"))
        .join(TextAnalysis.kneserNeyCrossEntropy(docs, "doc_id", "text")
          .select(col("doc_id"), col("cross_entropy").as("h_k")), Seq("doc_id"))
        .collect()
      kn should not be empty
      kn.foreach(r => r.getDouble(1) shouldBe r.getDouble(2) +- 1e-12)
      an[IllegalArgumentException] should be thrownBy
        TextAnalysis.lmCrossEntropy(docs, "doc_id", "text", order = 3)
    }
  }

  "perplexityBuckets" should {
    "cut each group into equal-frequency buckets ordered by entropy" in {
      val s = spark
      import s.implicits._
      // 6 docs per group: 3 clean (repetitive = low entropy under the
      // corpus unigram model) and 3 junk (all-distinct rare tokens)
      val rows = for {
        g <- Seq("a", "b"); i <- 0 until 6
      } yield {
        val id = (if (g == "a") 0L else 100L) + i
        val text =
          if (i < 3) "the cat sat on the mat the cat sat"
          else s"zq${id}x wq${id}y vq${id}z uq${id}w tq${id}v sq${id}u"
        (id, g, text)
      }
      val df = rows.toDF("doc_id", "grp", "text")
      val out = TextAnalysis
        .perplexityBuckets(df, "doc_id", "text", "grp", nBuckets = 3)
        .collect()
      out.length shouldBe 12
      // ntile(3) over 6 rows: exactly 2 per bucket per group
      out.groupBy(r => (r.getAs[String]("grp"), r.getAs[Int]("bucket")))
        .foreach { case (_, rs) => rs.length shouldBe 2 }
      // every bucket-1 doc scores at or below every bucket-3 doc in-group
      out.groupBy(_.getAs[String]("grp")).foreach { case (_, rs) =>
        val h1 = rs.filter(_.getAs[Int]("bucket") == 1)
          .map(_.getAs[Double]("cross_entropy")).max
        val h3 = rs.filter(_.getAs[Int]("bucket") == 3)
          .map(_.getAs[Double]("cross_entropy")).min
        h1 should be <= h3
      }
      // the repetitive docs land in the head, the junk in the tail
      out.filter(_.getAs[Long]("doc_id") % 100 < 3)
        .map(_.getAs[Int]("bucket")).max should be < 3
    }

    "skip unscoreable docs and reject nBuckets < 2" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "g", "some text here"), (2L, "g", ""),
        (3L, "g", null.asInstanceOf[String]), (4L, "g", "more text here"))
        .toDF("doc_id", "grp", "text")
      val out = TextAnalysis
        .perplexityBuckets(df, "doc_id", "text", "grp", nBuckets = 2)
        .collect()
      out.map(_.getAs[Long]("doc_id")).sorted shouldBe Array(1L, 4L)
      an[IllegalArgumentException] should be thrownBy
        TextAnalysis.perplexityBuckets(df, "doc_id", "text", "grp",
          nBuckets = 1)
    }
  }

  "luhnValid / ccFindings" should {
    "validate the checksum and extract card-length candidates" in {
      val s = spark
      import s.implicits._
      val cases = Seq(
        ("4111111111111111", true),   // classic valid Visa test number
        ("4242424242424242", true),
        ("4111111111111112", false),
        ("79927398713", true),        // the ISO example number
        ("79927398710", false),
        ("4111-1111-1111-1111", true), // separators ignored
        ("", false))
      val got = cases.map(_._1).toDF("d")
        .select(TextAnalysis.luhnValid(col("d"))).as[Boolean].collect()
      got.toSeq shouldBe cases.map(_._2)

      val f = TextAnalysis.ccFindings(
        Seq((1L, "pay 4111111111111111 or 1234567890123 now x12"),
          (2L, "no cards, just 123 and 99999"),
          (3L, null.asInstanceOf[String]),
          // the dominant human formats: space- and dash-separated PANs
          // extract (normalized to digits); a 20+-digit blob does not
          (4L, "card 4111 1111 1111 1111 ok"),
          (5L, "ref 4111-1111-1111-1111 and 123456789012345678901"))
          .toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      f.toSet shouldBe Set(
        (1L, "4111111111111111", true),
        (1L, "1234567890123", false),
        (4L, "4111111111111111", true),
        (5L, "4111111111111111", true))
    }
  }

  "corpusDrift" should {
    "compute smoothed joint-vocab KL/JS/TVD" in {
      val s = spark
      import s.implicits._
      val oldC = Seq((1L, "a a b")).toDF("doc_id", "text")
      val newC = Seq((2L, "a b b")).toDF("doc_id", "text")
      val r = TextAnalysis.corpusDrift(oldC, newC, "doc_id", "text")
        .collect().head
      r.getLong(0) shouldBe 2L  // joint vocab {a, b}
      r.getLong(1) shouldBe 3L
      r.getLong(2) shouldBe 3L
      // p = (0.6, 0.4) mirrored: KL = 0.2 ln 1.5
      r.getDouble(3) shouldBe 0.2 * math.log(1.5) +- 1e-12
      val js = 0.6 * math.log(0.6 / 0.5) / 2 + 0.4 * math.log(0.4 / 0.5) / 2 +
        0.4 * math.log(0.4 / 0.5) / 2 + 0.6 * math.log(0.6 / 0.5) / 2
      r.getDouble(4) shouldBe js +- 1e-12
      r.getDouble(5) shouldBe 0.2 +- 1e-12
      // identical corpora -> zero everywhere
      val z = TextAnalysis.corpusDrift(oldC, oldC, "doc_id", "text")
        .collect().head
      z.getDouble(3) shouldBe 0.0 +- 1e-15
      z.getDouble(4) shouldBe 0.0 +- 1e-15
      z.getDouble(5) shouldBe 0.0 +- 1e-15
    }
  }

  "removeBoilerplateLines" should {
    "strip lines frequent within a group, keep rare and small-group ones" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "d1", "alpha\nFOOT"),
        (2L, "d1", "beta\nFOOT"),
        (3L, "d1", "gamma\nFOOT\nrare line"),
        (4L, "d1", "delta only"),
        (5L, "d2", "solo\nFOOT"), // group of 1 < minDocs -> kept
        (6L, "d1", null.asInstanceOf[String]))
        .toDF("doc_id", "grp", "text")
      val out = TextAnalysis
        .removeBoilerplateLines(df, "doc_id", "text", "grp",
          maxDocFrac = 0.5, minDocs = 2)
        .collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(2)).orNull,
          r.getLong(3)))).toMap
      out(1L) shouldBe (("alpha", 1L))
      out(2L) shouldBe (("beta", 1L))
      out(3L) shouldBe (("gamma\nrare line", 1L))
      out(4L) shouldBe (("delta only", 0L))
      out(5L) shouldBe (("solo\nFOOT", 0L))
      out(6L) shouldBe ((null, 0L))
    }
  }

  "noveltyCurve" should {
    "count first-seen grams per group in ascending group order" in {
      val s = spark
      import s.implicits._
      // 3-grams; groups a < b < c. b repeats a's text (zero novel),
      // c adds one new trigram on top of a's
      val df = Seq(
        ("a", "w1 w2 w3 w4"),  // grams: (w1 w2 w3), (w2 w3 w4)
        ("b", "w1 w2 w3 w4"),
        ("c", "w2 w3 w4 w5"),  // (w2 w3 w4) old, (w3 w4 w5) new
        ("c", "zz"),           // < n tokens -> contributes nothing
        (null.asInstanceOf[String], "w9 w9 w9 w9"))
        .toDF("src", "text")
      val out = TextAnalysis.noveltyCurve(df, "src", "text", n = 3)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      out("a") shouldBe ((2L, 2L, 1.0))
      out("b") shouldBe ((2L, 0L, 0.0))
      out("c") shouldBe ((2L, 1L, 0.5))
      out.size shouldBe 3 // null group dropped
    }
  }

  "htmlToText" should {
    "drop script/style/comments, strip tags, unescape, collapse" in {
      val s = spark
      import s.implicits._
      val cases = Seq(
        ("<html><head><STYLE>p{x}</STYLE><script a=1>if(a<b){}</script>" +
          "</head><body><!-- c --><h1>Hi</h1> <p>there\n\n now</p></body>",
          "Hi there now"),
        ("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&nbsp;end",
          "A & B <tag> \"q\" 's end"),
        // double-escaped stays single-escaped (single-pass unescape)
        ("&amp;lt;", "&lt;"),
        // unclosed tag eats to the next '>' only
        ("a <b unclosed c> d", "a d"),
        ("", ""))
      val got = cases.map(_._1).toDF("h")
        .select(TextAnalysis.htmlToText(col("h"))).as[String].collect()
      got.toSeq shouldBe cases.map(_._2)
    }
  }

  "collapseAdjacentLines" should {
    "drop only consecutive identical lines" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "a\na\nb\nb\nb\na"),   // runs collapse, the return of 'a' stays
        (2L, "x\ny\nz"),            // nothing adjacent-equal
        (3L, ""),                   // single empty line
        (4L, null.asInstanceOf[String])
      ).toDF("doc_id", "text")
      val out = df.select(col("doc_id"),
        TextAnalysis.collapseAdjacentLines(col("text")).as("c"),
        TextAnalysis.adjacentDuplicateLineCount(col("text")).as("r"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
      out(1L) shouldBe (("a\nb\na", 3))
      out(2L) shouldBe (("x\ny\nz", 0))
      out(3L) shouldBe (("", 0))
      out(4L) shouldBe (("", 0))
    }
  }

  "corpusDiff" should {
    "label added, removed, changed, and unchanged ids" in {
      val s = spark
      import s.implicits._
      val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"),
        (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val nw = Seq((1L, "same"), (2L, "after"), (4L, "fresh"),
        (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val out = Dedup.corpusDiff(old, nw, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out shouldBe Map(1L -> "unchanged", 2L -> "changed",
        3L -> "removed", 4L -> "added", 5L -> "unchanged")
    }
  }

  "nearDedupIncremental" should {
    // history: one 15-token doc; batch fuzzy-dups sit at shingle Jaccard
    // ~0.86/1.0 (far above the 0.5 threshold) and novel docs near 0, so
    // the MinHash-agreement estimate (±1/√64 ≈ 0.125 σ) cannot flip a
    // decision — the fixture is deterministic at any hash seed
    def history = {
      val s = spark
      import s.implicits._
      Seq((1L,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"
      )).toDF("doc_id", "text")
    }
    def batch = {
      val s = spark
      import s.implicits._
      Seq(
        // fuzzy dup of history doc 1 (last token changed, J = 12/14)
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi pi"),
        // exact dup of history doc 1
        (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"),
        // within-batch near-dup pair, unrelated to history: keep 12
        (12L, "one two three four five six seven eight nine ten eleven twelve thirteen"),
        (13L, "one two three four five six seven eight nine ten eleven twelve fourteen"),
        // novel
        (14L, "totally novel content words completely unrelated any overlap whatsoever distinct vocabulary"),
        // empty text: no shingles, never matches anything
        (16L, "")
      ).toDF("doc_id", "text")
    }

    "dedup a batch within itself and against the persisted state" in {
      val state = Dedup.lshState(history, "doc_id", "text")
      val surv = Dedup.nearDedupIncremental(batch, "doc_id", "text", state,
        threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      surv shouldBe Set(12L, 14L, 16L)
    }

    "reproduce full-corpus deduplicateNear on the batch side" in {
      val full = Dedup.deduplicateNear(history.unionByName(batch),
        "doc_id", "text", threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val state = Dedup.lshState(history, "doc_id", "text")
      val incr = Dedup.nearDedupIncremental(batch, "doc_id", "text", state,
        threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      incr shouldBe full.filter(_ >= 10L)
      full.filter(_ < 10L) shouldBe Set(1L)
    }

    "round-trip state through parquet and merge halves associatively" in {
      val s = spark
      import s.implicits._
      val h2 = Seq((2L,
        "red orange yellow green blue indigo violet crimson amber teal navy maroon"
      )).toDF("doc_id", "text")
      // state(history ∪ h2) == merge of per-half states, through disk
      val merged = Dedup.lshState(history, "doc_id", "text")
        .merge(Dedup.lshState(h2, "doc_id", "text"))
      val dir = java.nio.file.Files.createTempDirectory("graft_lsh").toString
      try {
        Dedup.writeLshState(merged, dir)
        val loaded = Dedup.readLshState(s, dir)
        loaded.numHashes shouldBe 64
        loaded.signatures.count() shouldBe 2L
        // a batch near-dup of EACH half must be caught from the one state
        val b = Seq(
          (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi pi"),
          (21L, "red orange yellow green blue indigo violet crimson amber teal navy gold"),
          (22L, "fresh unseen material nothing shared here at all today")
        ).toDF("doc_id", "text")
        val surv = Dedup.nearDedupIncremental(b, "doc_id", "text", loaded,
          threshold = 0.5)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        surv shouldBe Set(22L)
        // merge is idempotent: folding a state into itself changes nothing
        merged.merge(merged).signatures.count() shouldBe 2L
      } finally {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try st.iterator().asScala.toSeq.reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally st.close()
      }
    }

    "drop a whole within-batch cluster when any member matches history" in {
      val s = spark
      import s.implicits._
      // shingle sets: R = A, M = A ++ B (boundary-bridged), H = B —
      // J(R,M) ≈ J(M,H) ≈ 10/22, J(R,H) = 0; threshold 0.35 keeps both
      // real pairs >0.1 above it and the null pair far below. 128 hashes
      // halve the estimator σ for the history-side (estimated) decision;
      // 64 bands (2 rows each) put the LSH S-curve's steep part well
      // BELOW J = 0.45, so banding recall at these pairs is ~1 − 4e-7.
      val aToks = (1 to 12).map(i => s"a$i").mkString(" ")
      val bToks = (1 to 12).map(i => s"b$i").mkString(" ")
      val hist = Seq((1L, bToks)).toDF("doc_id", "text")
      val b = Seq(
        (10L, aToks),                 // R: near-dup of M only
        (11L, s"$aToks $bToks"),      // M: near-dup of R AND of history
        (12L, "untouched bystander document with its own words entirely")
      ).toDF("doc_id", "text")
      val state = Dedup.lshState(hist, "doc_id", "text",
        numHashes = 128, bands = 64)
      val surv = Dedup.nearDedupIncremental(b, "doc_id", "text", state,
        threshold = 0.35)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // the {10, 11} cluster dies whole: full-corpus dedup would keep only
      // history doc 1 from the {1, 10, 11} component
      surv shouldBe Set(12L)
    }

    "refuse to merge states built under different parameters" in {
      val a = Dedup.lshState(history, "doc_id", "text", numHashes = 64)
      val b = Dedup.lshState(history, "doc_id", "text", numHashes = 128)
      an[IllegalArgumentException] should be thrownBy a.merge(b)
    }
  }

  "exactDedupIncremental" should {
    "dedup within the batch and against the persisted seen state" in {
      val s = spark
      import s.implicits._
      val old = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      val seen = Dedup.seenTextKeys(old, "text")
      seen.count() shouldBe 2L
      val batch = Seq(
        (10L, "alpha"),                    // seen in the previous batch
        (11L, "gamma"), (12L, "gamma"),    // within-batch dup: keep 11
        (13L, null.asInstanceOf[String]),  // nulls dedup within the batch
        (14L, null.asInstanceOf[String])   //   but never against the state
      ).toDF("doc_id", "text")
      val surv = Dedup.exactDedupIncremental(batch, "text", "doc_id", seen)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      surv shouldBe Set(11L, 13L)
    }
  }

  "duplicationProfile" should {
    "count distinct and corpus-duplicated grams per document" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "a b c d"),    // grams: "a b c", "b c d"
        (2L, "a b c x"),    // shares "a b c" with doc 1
        (3L, "q r s t"),    // no shared grams
        (4L, "xy")          // < n tokens
      ).toDF("doc_id", "text")
      val out = Dedup.duplicationProfile(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      out shouldBe Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)),
        3L -> ((2L, 0L)), 4L -> ((0L, 0L)))
    }
  }

  "vocabularyStats" should {
    "report token totals, vocabulary, hapax count and top-k mass" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a A a b B c"), (2L, "")).toDF("doc_id", "text")
      val r = TextAnalysis.vocabularyStats(df, "text", topK = Seq(2)).collect().head
      r.getLong(0) shouldBe 6L        // total tokens (lowercased)
      r.getLong(1) shouldBe 3L        // vocab {a, b, c}
      r.getLong(2) shouldBe 1L        // hapax {c}
      r.getDouble(3) shouldBe (5.0 / 6) +- 1e-15  // a(3) + b(2) of 6
    }

    "handle an empty corpus" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val r = TextAnalysis.vocabularyStats(df, "text", topK = Seq(10)).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) shouldBe
        ((0L, 0L, 0L, 0.0))
    }
  }

  "crossSourceOverlap" should {
    "count distinct shared n-grams per group pair" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        ("A", "the shared phrase here ends now"),
        ("A", "the shared phrase here again today"),   // same grams re-counted once
        ("B", "prefix words the shared phrase here suffix"),
        ("C", "totally different words in this document")
      ).toDF("source", "text")
      val out = TextAnalysis.crossSourceOverlap(df, "source", "text", n = 3)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // A∩B distinct 3-grams: "the shared phrase", "shared phrase here"
      out shouldBe Map(("A", "B") -> 2L)
    }

    "exclude ubiquitous grams at the cap instead of fanning out" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        ("A", "common boilerplate line alpha"),
        ("B", "common boilerplate line beta"),
        ("C", "common boilerplate line gamma")
      ).toDF("source", "text")
      // "common boilerplate line" is in all 3 groups; cap 2 excludes it
      TextAnalysis.crossSourceOverlap(df, "source", "text", n = 3,
        maxGroupsPerGram = 2).count() shouldBe 0L
      // uncapped: all three pairs share exactly that one gram
      val full = TextAnalysis.crossSourceOverlap(df, "source", "text", n = 3)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      full shouldBe Map(("A", "B") -> 1L, ("A", "C") -> 1L, ("B", "C") -> 1L)
    }
  }

  "pmiCollocations" should {
    "match hand-computed PMI over adjacent pairs" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a b a b"), (2L, ""), (3L, null.asInstanceOf[String]),
        (4L, "solo")).toDF("doc_id", "text")
      val out = TextAnalysis.pmiCollocations(df, "text", minCount = 1)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      // pairs: (a,b)x2, (b,a)x1; B=3; heads a=2 b=1; tails b=2 a=1
      out.keySet shouldBe Set(("a", "b"), ("b", "a"))
      out(("a", "b"))._1 shouldBe 2L
      out(("a", "b"))._2 shouldBe math.log(2.0 * 3 / (2 * 2)) +- 1e-12
      out(("b", "a"))._2 shouldBe math.log(1.0 * 3 / (1 * 1)) +- 1e-12
      // minCount filters the singleton pair but keeps its marginal mass
      val filtered = TextAnalysis.pmiCollocations(df, "text", minCount = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
      filtered.length shouldBe 1
      filtered.head._3 shouldBe math.log(2.0 * 3 / (2 * 2)) +- 1e-12
    }
  }

  "crossCorpus near-dup join" should {
    "report exact jaccard for fuzzy probe matches and nothing for unrelated docs" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight again happily"),
        (2L, "the quick brown fox jumps over the lazy dog tonight again sadly"),
        (3L, "completely unrelated content about spark engines and big data processing")
      ).toDF("doc_id", "text")
      val probes = Seq(
        (100L, "the quick brown fox jumps over the lazy dog tonight again happily junk1 junk2")
      ).toDF("pid", "ptext")
      val exact = Dedup.crossCorpusJaccardPairs(corpus, "doc_id", "text",
        probes, "pid", "ptext", threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // doc1: 10 shingles all shared of the probe's 12 -> 10/12
      // doc2: 9 shared (the final-token shingle differs) -> 9/13
      exact.map(t => (t._1, t._2)).toSet shouldBe Set((1L, 100L), (2L, 100L))
      exact.find(_._1 == 1L).get._3 shouldBe (10.0 / 12) +- 1e-12
      exact.find(_._1 == 2L).get._3 shouldBe (9.0 / 13) +- 1e-12
      // the LSH-banded path agrees exactly at this jaccard level
      val fuzzy = Dedup.crossCorpusNearDups(corpus, "doc_id", "text",
        probes, "pid", "ptext", threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      fuzzy.sortBy(_._1) shouldBe exact.sortBy(_._1)
    }

    "generate nothing when the probe shares no shingles" in {
      val s = spark
      import s.implicits._
      val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
      val probes = Seq((9L, "zeta eta theta iota kappa")).toDF("pid", "ptext")
      Dedup.crossCorpusJaccardPairs(corpus, "doc_id", "text",
        probes, "pid", "ptext", threshold = 0.01).count() shouldBe 0L
      Dedup.crossCorpusNearDups(corpus, "doc_id", "text",
        probes, "pid", "ptext", threshold = 0.01).count() shouldBe 0L
    }

    "match brute-force cross-corpus jaccard on randomized corpora" in {
      val s = spark
      import s.implicits._
      def shingles(t: String): Set[Seq[String]] = {
        val ts = t.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty).toSeq
        if (ts.isEmpty) Set.empty
        else if (ts.length < 3) Set(ts)
        else ts.sliding(3).map(_.toSeq).toSet
      }
      val rnd = new scala.util.Random(97)
      for (_ <- 1 to 3) {
        val corpus = (1L to 15L).map(id =>
          id -> (0 until rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(5)}").mkString(" "))
        val probes = (100L to 104L).map(id =>
          id -> (0 until rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(5)}").mkString(" "))
        val expect = (for {
          (cid, ct) <- corpus; (pid, pt) <- probes
          cs = shingles(ct); ps = shingles(pt)
          if cs.nonEmpty && ps.nonEmpty
          j = (cs & ps).size.toDouble / math.max((cs | ps).size, 1)
          if j >= 0.3
        } yield (cid, pid) -> j).toMap
        val got = Dedup.crossCorpusJaccardPairs(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          probes.toDF("pid", "ptext"), "pid", "ptext", threshold = 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        got.keySet shouldBe expect.keySet
        got.foreach { case (k, j) => j shouldBe expect(k) +- 1e-12 }
      }
    }

    "match a brute-force duplication profile on randomized corpora" in {
      val s = spark
      import s.implicits._
      val n = 3
      val rnd = new scala.util.Random(733)
      for (_ <- 1 to 3) {
        val docs = (1L to 16L).map(id =>
          id -> (0 until rnd.nextInt(24)).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
        val gramSets = docs.map { case (id, t) =>
          val ts = t.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty).toSeq
          id -> (if (ts.length < n) Set.empty[Seq[String]]
          else ts.sliding(n).map(_.toSeq).toSet)
        }
        val dfreq = gramSets.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
        val expect = gramSets.map { case (id, gs) =>
          id -> ((gs.size.toLong, gs.count(g => dfreq(g) >= 2).toLong))
        }.toMap
        val got = Dedup.duplicationProfile(
          docs.toDF("doc_id", "text"), "doc_id", "text", n)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        got shouldBe expect
      }
    }
  }

  "exactSubstringDedup" should {
    "cut every duplicated n-token span except its globally-first occurrence" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "a b c d e f"),                // gram winners live here
        (2L, "x y a b c d z"),              // shares the 4-token run a b c d
        (3L, "a b c d e f"),                // verbatim copy of doc 1
        (4L, "p q r p q r p q r"),          // WITHIN-doc repetition
        (5L, "U V"),                        // < n tokens: no grams, normalized only
        (6L, ""),                           // empty
        (7L, null.asInstanceOf[String])     // null
      ).toDF("doc_id", "text")
      val out = Dedup.exactSubstringDedup(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      out(1L) shouldBe ((6, 0, "a b c d e f"))     // winner keeps everything
      // covered [2,5) ∪ [3,6) merges to [2,6): the whole shared run goes
      out(2L) shouldBe ((7, 4, "x y z"))
      out(3L) shouldBe ((6, 6, ""))                // full duplicate: all removed
      // winners at pos 0..2 keep "p q r"; occurrences 3..6 cover [3,9)
      out(4L) shouldBe ((9, 6, "p q r"))
      out(5L) shouldBe ((2, 0, "u v"))
      out(6L) shouldBe ((0, 0, ""))
      out(7L) shouldBe ((0, 0, ""))
      // token conservation: kept + removed = total for every doc
      out.values.foreach { case (total, removed, kept) =>
        val keptCount = if (kept.isEmpty) 0 else kept.split(" ").length
        keptCount + removed shouldBe total
      }
    }

    "leave a corpus with no duplicated spans untouched" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (10L, "one two three four"),
        (11L, "five six seven eight")).toDF("doc_id", "text")
      val out = Dedup.exactSubstringDedup(df, "doc_id", "text", n = 3)
        .collect().map(r => (r.getInt(1), r.getInt(2)))
      out.toSet shouldBe Set((4, 0))
    }

    "match a brute-force reference on randomized small-vocab corpora" in {
      val s = spark
      import s.implicits._
      val n = 3
      // driver-side reference: same winner election and interval merge,
      // O(corpus^2) naive
      def brute(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
        val toks = docs.map { case (id, t) =>
          id -> (if (t == null) Array.empty[String]
          else t.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty))
        }
        val occ = scala.collection.mutable.LinkedHashMap
          .empty[Seq[String], scala.collection.mutable.ArrayBuffer[(Long, Int)]]
        for ((id, ts) <- toks; i <- 0 to ts.length - n if ts.length >= n)
          occ.getOrElseUpdate(ts.slice(i, i + n).toSeq,
            scala.collection.mutable.ArrayBuffer.empty) += ((id, i))
        val covered = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.HashSet[Int]]
        for ((_, os) <- occ if os.length > 1) {
          val winner = os.minBy(identity)
          for ((id, p) <- os if (id, p) != winner; j <- p until p + n)
            covered.getOrElseUpdate(id,
              scala.collection.mutable.HashSet.empty) += j
        }
        toks.map { case (id, ts) =>
          val cov = covered.getOrElse(id, Set.empty[Int])
          val kept = ts.indices.filterNot(cov).map(ts)
          id -> ((ts.length, cov.size, kept.mkString(" ")))
        }.toMap
      }
      val rnd = new scala.util.Random(421)
      for (_ <- 1 to 4) {
        val docs = (1L to 18L).map { id =>
          val len = rnd.nextInt(28)
          id -> (0 until len).map(_ => s"w${rnd.nextInt(7)}").mkString(" ")
        }
        val expect = brute(docs)
        val got = Dedup
          .exactSubstringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", n)
          .collect()
          .map(r => r.getLong(0) ->
            ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
        got shouldBe expect
      }
    }
  }

  "nearDupParagraphs" should {
    // ~30 tokens; one token changed at the END (B) / START (C) keeps the
    // pairwise shingle Jaccard ≈ 0.85 — far above the 0.5 threshold and
    // high enough that 16-band LSH candidacy is near-certain
    val boilerMid = "quick brown fox jumps over lazy dog while seven " +
      "sailors watch from the old harbor wall under grey november skies " +
      "counting distant ships and waiting for"
    val boilerA = s"begin $boilerMid river"
    val boilerB = s"begin $boilerMid ocean"
    val boilerC = s"start $boilerMid ocean"

    "collapse near-duplicate paragraphs to the globally-first occurrence" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (1L, s"unique alpha text one two three\n$boilerA"),
        (2L, s"$boilerB\nunique beta text four five six"),
        (3L, s"$boilerC\nanother body seven eight nine ten")).toDF("doc_id", "text")
      val out = Dedup.nearDupParagraphs(docs, "doc_id", "text",
          threshold = 0.5)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // A~B (J=7/9), B~C (J=7/9): one transitive cluster; first occurrence
      // is (doc 1, pos 1) so docs 2 and 3 lose their variant
      out(1L) shouldBe ((s"unique alpha text one two three\n$boilerA", 2L, 2L, 0L))
      out(2L) shouldBe (("unique beta text four five six", 2L, 1L, 1L))
      out(3L) shouldBe (("another body seven eight nine ten", 2L, 1L, 1L))
    }

    "keep the first occurrence of exact duplicates and preserve order" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (5L, "first para here now\nshared line body text\nlast para here now"),
        (6L, "shared line body text\nother content entirely different")).toDF("doc_id", "text")
      val out = Dedup.nearDupParagraphs(docs, "doc_id", "text",
          threshold = 0.9)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
      out(5L) shouldBe (("first para here now\nshared line body text\n" +
        "last para here now", 0L))
      out(6L) shouldBe (("other content entirely different", 1L))
    }

    "raise on ids outside the packing range" in {
      val s = spark
      import s.implicits._
      val docs = Seq((-1L, "some text here")).toDF("doc_id", "text")
      val ex = intercept[Exception] {
        Dedup.nearDupParagraphs(docs, "doc_id", "text").collect()
      }
      ex.getMessage should include("packing range")
    }

    "reject non-integral id columns" in {
      val s = spark
      import s.implicits._
      val docs = Seq(("a", "text")).toDF("doc_id", "text")
      an[IllegalArgumentException] should be thrownBy
        Dedup.nearDupParagraphs(docs, "doc_id", "text")
    }
  }

  "nearDupParagraphsIncremental" should {
    val boilerMid = "quick brown fox jumps over lazy dog while seven " +
      "sailors watch from the old harbor wall under grey november skies " +
      "counting distant ships and waiting for"
    val boilerA = s"begin $boilerMid river"
    val boilerB = s"begin $boilerMid ocean"

    def historyDocs = {
      val s = spark
      import s.implicits._
      Seq(
        (1L, s"unique alpha text one two three\n$boilerA"),
        (2L, "standalone history body four five six")).toDF("doc_id", "text")
    }

    def batchDocs = {
      val s = spark
      import s.implicits._
      Seq(
        // near-match of history's boilerplate (J≈0.85) + a fresh line
        (10L, s"$boilerB\nfresh batch content seven eight nine"),
        // within-batch exact dup of doc 10's fresh line + its own line
        (11L, "fresh batch content seven eight nine\nanother body ten"),
        // untouched by anything
        (12L, "entirely novel text eleven twelve thirteen"))
        .toDF("doc_id", "text")
    }

    "match the full rebuild restricted to the batch documents" in {
      val full = Dedup.nearDupParagraphs(
        historyDocs.unionByName(batchDocs), "doc_id", "text",
          threshold = 0.5)
        .where(col("doc_id") >= 10L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val dir = java.nio.file.Files
        .createTempDirectory("graft-para-state").toString
      Dedup.writeLshState(
        Dedup.paragraphLshState(historyDocs, "doc_id", "text"), dir)
      val st = Dedup.readLshState(spark, dir)
      val inc = Dedup.nearDupParagraphsIncremental(batchDocs, "doc_id",
          "text", st, threshold = 0.5)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      inc shouldBe full
      // the history near-match was actually dropped (not a vacuous pass)
      inc(10L)._4 shouldBe 1L
      // within-batch exact dup kept only at its first occurrence
      inc(11L)._4 shouldBe 1L
      inc(12L)._4 shouldBe 0L
    }

    "fold batch survivors back into the state for the next batch" in {
      val s = spark
      import s.implicits._
      val st0 = Dedup.paragraphLshState(historyDocs, "doc_id", "text")
      val st1 = st0.merge(
        Dedup.paragraphLshState(batchDocs, "doc_id", "text"))
      // a later batch repeating doc 11's novel line must now match state
      val batch2 = Seq(
        (20L, "another body ten\nsecond wave fourteen fifteen"))
        .toDF("doc_id", "text")
      val out = Dedup.nearDupParagraphsIncremental(batch2, "doc_id",
          "text", st1, threshold = 0.5)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(4)))).toMap
      out(20L) shouldBe (("second wave fourteen fifteen", 1L))
    }

    "FromOccurrences variants equal the text-scanning forms" in {
      // the shared-tokenize-scan hooks (q133's one-pass-per-side shape):
      // state built from a precomputed occurrence frame and the
      // incremental pass fed the same frame must reproduce the plain
      // variants row-for-row
      val occHist = Dedup.paragraphOccurrences(historyDocs, "doc_id", "text")
      val occBatch = Dedup.paragraphOccurrences(batchDocs, "doc_id", "text")
      val plain = Dedup.nearDupParagraphsIncremental(batchDocs, "doc_id",
          "text", Dedup.paragraphLshState(historyDocs, "doc_id", "text"),
          threshold = 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val shared = Dedup.nearDupParagraphsIncrementalFromOccurrences(
          batchDocs, "doc_id", occBatch,
          Dedup.paragraphLshStateFromOccurrences(occHist), threshold = 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      shared shouldBe plain
    }
  }

  "decontaminateByEmbedding" should {
    val probes = Seq(
      100L -> Array(1.0, 0.0, 0.0),
      200L -> Array(0.0, 1.0, 0.0))

    "flag rows cosine-close to any probe, with max-struct tie-breaks" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (1L, Some(Seq(2.0f, 0.1f, 0.0f))),  // ~probe 100
        (2L, Some(Seq(0.0f, 0.0f, 5.0f))),  // orthogonal to both
        (3L, Some(Seq(1.0f, 1.0f, 0.0f))),  // exact tie -> higher pid
        (4L, None),                          // null vector
        (5L, Some(Seq(0.0f, 0.0f, 0.0f)))   // zero vector
      ).toDF("id", "vec")
      val out = Similarity
        .decontaminateByEmbedding(corpus, "id", "vec", probes, tau = 0.9)
        .select(col("id"), col("best_probe"), col("best_cos"),
          col("contaminated"))
        .collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2),
          r.getBoolean(3)))).toMap
      out(1L)._1 shouldBe 100L
      out(1L)._2 shouldBe
        (2.0 / math.sqrt(4.0 + 0.1f.toDouble * 0.1f.toDouble)) +- 1e-12
      out(1L)._3 shouldBe true
      out(2L)._3 shouldBe false
      out(2L)._2 shouldBe 0.0 +- 1e-12
      out(3L)._1 shouldBe 200L // equal cosine to both -> higher probe id
      out(3L)._3 shouldBe false // cos ~0.707 < 0.9
      out(4L) shouldBe ((-1L, -1.0, false))
      out(5L) shouldBe ((-1L, -1.0, false))
    }

    "guard the literal-broadcast bound" in {
      val s = spark
      import s.implicits._
      val corpus = Seq((1L, Seq(1.0f))).toDF("id", "vec")
      val many = (1L to 5L).map(i => i -> Array(1.0))
      an[IllegalArgumentException] should be thrownBy
        Similarity.decontaminateByEmbedding(
          corpus, "id", "vec", many, tau = 0.5, maxProbes = 4)
      an[IllegalArgumentException] should be thrownBy
        Similarity.decontaminateByEmbedding(
          corpus, "id", "vec", Seq(7L -> Array(0.0, 0.0)), tau = 0.5)
    }

    "collectProbes drops nulls and guards the bound" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None),
        (3L, Some(Seq(3.0f, 4.0f)))).toDF("pid", "vec")
      val got = Similarity.collectProbes(df, "pid", "vec")
        .map { case (id, v) => id -> v.toSeq }.toMap
      got shouldBe Map(1L -> Seq(1.0, 2.0), 3L -> Seq(3.0, 4.0))
      an[IllegalArgumentException] should be thrownBy
        Similarity.collectProbes(df, "pid", "vec", maxProbes = 1)
    }
  }
}
