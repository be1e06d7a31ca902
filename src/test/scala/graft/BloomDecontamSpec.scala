package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class BloomDecontamSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val phrase = (1 to 13).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, s"prefix words here $phrase and a tail"),
      (2L, s"$phrase"),
      (3L, "entirely different content with no overlap at all " +
        "padding padding padding padding padding"),
      (4L, s"another document carrying $phrase inside its body"),
      (5L, null: String)).toDF("doc_id", "text")
  }

  private def probes = {
    val s = spark
    import s.implicits._
    Seq((1 to 13).map(i => s"w$i").mkString(" "))
      .toDF("probe")
  }

  "bloomContaminationMatches" should {
    "equal the exact broadcast-join contamination matches" in {
      val docs = fixture
      val exact = TextAnalysis.contaminationMatches(
        docs, "doc_id", "text", probes, "probe", n = 13)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaBloom = TextAnalysis.bloomContaminationMatches(
        docs, "doc_id", "text", probes, "probe", n = 13,
        estimatedItems = 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 1L)
      viaBloom shouldBe exact
    }

    "prefilter to a superset of true matches with no false negatives" in {
      val docs = fixture
      val pg = TextAnalysis.probeGramHashes(probes, "probe", n = 13)
      val cands = TextAnalysis.bloomGramFilter(
        docs, "doc_id", "text", pg, n = 13, estimatedItems = 100L)
      val candPairs = cands.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truePairs = cands.join(pg, "graft_gram")
        .select(col("doc_id"), col("graft_gram")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truePairs.subsetOf(candPairs) shouldBe true
      truePairs.map(_._1) shouldBe Set(1L, 2L, 4L)
    }
  }

  "removeContaminatedSpans" should {
    "excise exactly the matching spans and keep the rest" in {
      val docs = fixture
      val out = TextAnalysis.removeContaminatedSpans(
        docs, "doc_id", "text", probes, "probe", n = 13)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      // doc 1: 3 prefix tokens + 13 phrase + 3 tail = 19 tokens; the
      // phrase span [3, 16) is removed, prefix and tail survive
      out(1L) shouldBe ((19, 13, "prefix words here and a tail"))
      // doc 2 IS the phrase: everything removed
      out(2L) shouldBe ((13, 13, ""))
      // doc 3: untouched
      out(3L)._2 shouldBe 0
      out(3L)._3 should include("entirely different content")
      // doc 4: phrase inside a longer body
      out(4L)._2 shouldBe 13
      out(4L)._3 shouldBe "another document carrying inside its body"
      // null text: empty everything
      out(5L) shouldBe ((0, 0, ""))
    }

    "merge overlapping spans from repeated probes" in {
      val s = spark
      import s.implicits._
      val phrase = (1 to 13).map(i => s"w$i").mkString(" ")
      // phrase twice with a 5-token overlap window between: spans
      // [2, 15) and [15, 28) are adjacent — removed = 26, no double count
      val doc = Seq((1L, s"a b $phrase $phrase tail"))
        .toDF("doc_id", "text")
      val out = TextAnalysis.removeContaminatedSpans(
        doc, "doc_id", "text", probes, "probe", n = 13)
        .collect().head
      out.getInt(1) shouldBe 29
      out.getInt(2) shouldBe 26
      out.getString(3) shouldBe "a b tail"
    }
  }

  "Bloom" should {
    "merge as a bitwise-OR monoid with no false negatives" in {
      import graft.sketch.Bloom
      val s = spark
      import s.implicits._
      val keys = (0L until 500L).map(i => i * 7919L)
      val a = Bloom.build(keys.take(250).toDF("k"), col("k"), 500L)
      val b = Bloom.build(keys.drop(250).toDF("k"), col("k"), 500L)
      val full = Bloom.build(keys.toDF("k"), col("k"), 500L)
      val merged = a.mergeWith(b)
      merged.words.toSeq shouldBe full.words.toSeq
      keys.foreach(k => merged.mightContain(k) shouldBe true)
      // fpp sanity at the 1% sizing: absent keys rarely test true
      val fps = (1L to 2000L).count(i => merged.mightContain(i * 7919L + 3L))
      fps should be < 60 // 3x the 1% design point
      intercept[IllegalArgumentException] {
        a.mergeWith(Bloom.build(keys.toDF("k"), col("k"), 500L, fpp = 0.1))
      }
    }
  }

  "per-shard gram-bloom states" should {
    val (bits, k) = graft.sketch.Bloom.sizeFor(200L, 0.01)

    "flag every truly contaminated (shard, suite) pair and verify exactly" in {
      val docs = fixture // ids 1,2,4 carry the phrase; shards = id % 2
      val states = TextAnalysis.shardGramBloomStates(
        docs, "doc_id", "text", shards = 2,
        bitsPerShard = bits, numHashes = k)
      states.count() shouldBe 2 // null-id rows dropped, two shards
      val suiteGrams = TextAnalysis
        .probeGramHashes(probes, "probe", n = 13)
        .collect().map(_.getLong(0)).toSeq
      val cand = TextAnalysis.shardContaminationCandidates(
        states, Seq(1L -> suiteGrams), bits, k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      // phrase docs 1 and 2 land in shards 1 and 0 and 4 in 0: both
      // shards must be flagged (no false negatives)
      cand((0L, 1L)) should be >= 1L
      cand((1L, 1L)) should be >= 1L
      val census = TextAnalysis.shardContaminationCensus(
        docs, "doc_id", "text",
        TextAnalysis.probeGramHashes(probes, "probe", n = 13)
          .select(lit(1L).as("suite"), col("graft_gram")),
        "suite", shards = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      census((0L, 1L)) shouldBe ((1L, 2L)) // docs 2, 4
      census((1L, 1L)) shouldBe ((1L, 1L)) // doc 1
    }

    "fold batch-sliced states to the one-shot state byte-for-byte" in {
      val docs = fixture
      def st(d: org.apache.spark.sql.DataFrame) =
        TextAnalysis.shardGramBloomStates(
          d, "doc_id", "text", shards = 2,
          bitsPerShard = bits, numHashes = k)
      val parts = Seq(0, 1, 2).map(p =>
        st(docs.where(pmod(col("doc_id"), lit(3)) === p)))
      val folded = TextAnalysis
        .foldShardGramBlooms(parts.reduce(_ unionByName _))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2))))
        .toMap
      val oneShot = st(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2))))
        .toMap
      folded shouldBe oneShot
    }

    "refuse to fold states built with different parameters" in {
      val docs = fixture
      val a = TextAnalysis.shardGramBloomStates(
        docs, "doc_id", "text", 2, bits, k)
      val b = TextAnalysis.shardGramBloomStates(
        docs, "doc_id", "text", 2, bits + 64, k)
      val ex = intercept[org.apache.spark.SparkException] {
        TextAnalysis.foldShardGramBlooms(a.unionByName(b)).collect()
      }
      ex.getMessage should include("incompatible bloom states")
    }

    "admit nothing for an absent suite beyond the designed fp rate" in {
      val docs = fixture
      val states = TextAnalysis.shardGramBloomStates(
        docs, "doc_id", "text", shards = 2,
        bitsPerShard = bits, numHashes = k)
      // 200 absent grams against each shard: expect ~1% admitted
      val absent = (1L to 200L).map(_ * 104729L + 17L)
      val cand = TextAnalysis.shardContaminationCandidates(
        states, Seq(9L -> absent), bits, k)
        .collect().map(_.getLong(2))
      all(cand) should be <= 12L // 3x the 1% design point, 2 shards
    }
  }
}
