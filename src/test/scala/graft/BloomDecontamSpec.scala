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
}
