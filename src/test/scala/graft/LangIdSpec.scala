package graft

import graft.pipeline.{Classify, LangId}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class LangIdSpec extends AnyWordSpec with Matchers with SparkSpec {

  // held-out sentences, one per seeded language — none appear in the seed
  private val heldOut = Seq(
    ("en", "yesterday evening we walked along the river and watched the boats come home before dinner"),
    ("de", "gestern abend gingen wir am fluss entlang und sahen den booten zu bevor wir zum essen gingen"),
    ("fr", "hier soir nous avons marché le long de la rivière et regardé les bateaux rentrer avant le dîner"),
    ("es", "ayer por la noche caminamos junto al río y vimos los barcos volver antes de la cena"),
    ("it", "ieri sera abbiamo camminato lungo il fiume e guardato le barche tornare prima di cena"),
    ("pt", "ontem à noite caminhámos ao longo do rio e vimos os barcos voltarem antes do jantar não são horas más"),
    ("ru", "вчера вечером мы гуляли вдоль реки и смотрели как лодки возвращаются домой к ужину"),
    ("ja", "昨日の夕方私たちは川沿いを歩いて夕食の前に船が帰ってくるのを眺めた"))

  "charGramFrequencies" should {
    "emit every 1-3 char gram of the boundary-padded normalized text" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "  Ab  c ")).toDF("id", "text")
      val rows = LangId.charGramFrequencies()(df, "id", "text")
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      // normalized = " ab c " (6 chars): 6 unigrams, 5 bigrams, 4 trigrams
      rows.values.sum shouldBe (6 + 5 + 4)
      rows(" ") shouldBe 3L
      rows("ab") shouldBe 1L
      rows(" ab") shouldBe 1L
      rows("b c") shouldBe 1L
      // short text: no trigram from a 2-char normalized string
      val tiny = LangId.charGramFrequencies()(
        Seq((1L, "")).toDF("id", "text"), "id", "text")
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      // normalized = "  " (2 spaces): 2 unigrams + 1 bigram, no trigram
      tiny.values.sum shouldBe 3L
    }

    "gram multi-byte scripts by characters and match an independent count" in {
      val s = spark
      import s.implicits._
      val text = "Быстрая лиса 日本語"
      val df = Seq((7L, text)).toDF("id", "text")
      val got = LangId.charGramFrequencies()(df, "id", "text")
        .collect().map(r => (r.getString(1), r.getLong(2))).toMap
      // independent reference over code points of the padded normalization
      val norm = " " + text.toLowerCase.trim.replaceAll("\\s+", " ") + " "
      val cps = norm.codePoints().toArray
      val expected = (1 to 3).flatMap { n =>
        (0 to cps.length - n).map(i => new String(cps, i, n))
      }.groupBy(identity).map { case (g, l) => g -> l.size.toLong }
      got shouldBe expected
      got.keys.exists(_.contains("日")) shouldBe true
    }
  }

  "localCountState" should {
    def stateMaps(st: Classify.NbCountState) = (
      st.termCounts.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      st.classDocs.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)

    "match the distributed count state exactly on the default seed" in {
      val s = spark
      val local = stateMaps(LangId.localCountState(s))
      val dist = stateMaps(Classify.countState(
        LangId.seedFrame(s), "seed_id", "text", "lang",
        LangId.charGramFrequencies()))
      local shouldBe dist
    }

    "match on hostile whitespace (tabs, leading/trailing runs, CJK)" in {
      val s = spark
      val seed = Seq(
        "xx" -> "  A\tb É  c\n d ",
        "xx" -> "",
        "yy" -> "\t\tПривет  мир 日本\t")
      val local = stateMaps(LangId.localCountState(s, seed))
      import s.implicits._
      val frame = seed.zipWithIndex
        .map { case ((l, t), i) => (i.toLong, l, t) }
        .toDF("seed_id", "lang", "text")
      val dist = stateMaps(Classify.countState(
        frame, "seed_id", "text", "lang", LangId.charGramFrequencies()))
      local shouldBe dist
    }

    "derive a model whose scores equal the distributed model's" in {
      val s = spark
      import s.implicits._
      val docs = heldOut.zipWithIndex
        .map { case ((_, t), i) => (i.toLong, t) }.toDF("id", "text")
      val mLocal = Classify.modelFromCounts(LangId.localCountState(s))
      val mDist = LangId.trainDefault(s)
      val a = LangId.scoreLanguages(docs, "id", "text", mLocal)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
      val b = LangId.scoreLanguages(docs, "id", "text", mDist)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
      a shouldBe b // bit-identical: same expressions over the same counts
      mLocal.release(); mDist.release()
    }
  }

  "the default language model" should {
    "classify held-out sentences of all eight seeded languages" in {
      val s = spark
      import s.implicits._
      val m = LangId.trainDefault(s)
      val docs = heldOut.zipWithIndex
        .map { case ((lang, text), i) => (i.toLong, lang, text) }
        .toDF("doc_id", "expected", "text")
      val out = LangId.scoreLanguages(docs, "doc_id", "text", m)
        .join(docs.select(col("doc_id"), col("expected")), Seq("doc_id"))
        .collect()
        .map(r => (r.getAs[String]("expected"), r.getAs[String]("predicted"),
          r.getAs[Double]("margin")))
      m.release()
      out should have size 8
      out.foreach { case (expected, predicted, margin) =>
        withClue(s"expected=$expected predicted=$predicted margin=$margin: ") {
          predicted shouldBe expected
          margin should be > 0.0
        }
      }
    }

    "still classify an unseeded script deterministically (priors + space grams only)" in {
      val s = spark
      import s.implicits._
      val m = LangId.trainDefault(s)
      // Greek is not in the seed: every non-space gram is OOV, so the
      // posterior is driven by the boundary-space grams alone — a
      // deterministic (if meaningless) label with a small margin, never
      // a crash or a null
      val out = LangId.scoreLanguages(
        Seq((1L, "αβγδε")).toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().head
      m.release()
      val langs = LangId.DefaultSeed.map(_._1).toSet
      langs should contain(out.getAs[String]("predicted"))
      val margin = out.getAs[Double]("margin")
      margin.isNaN shouldBe false
      margin should be >= 0.0
      // far weaker evidence than any real in-script sentence carries
      margin should be < 3.0
    }

    "train identically from merged per-shard count states" in {
      val s = spark
      val seed = LangId.seedFrame(s)
      val half1 = seed.where(col("seed_id") % 2 === 0)
      val half2 = seed.where(col("seed_id") % 2 === 1)
      val fz = LangId.charGramFrequencies()
      val merged = Classify.modelFromCounts(Classify.mergeCounts(
        Classify.countState(half1, "seed_id", "text", "lang", fz),
        Classify.countState(half2, "seed_id", "text", "lang", fz)))
      val full = Classify.modelFromCounts(
        Classify.countState(seed, "seed_id", "text", "lang", fz))
      val a = merged.termLogProb.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val b = full.termLogProb.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      merged.release(); full.release()
      a shouldBe b
    }
  }
}
