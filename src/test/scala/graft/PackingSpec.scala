package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.Packing

class PackingSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Local replay of the contract: concatenate tokens in id order, cut at
    * every seqLen tokens, report (seq_id, text, nTokens, nDocs).
    */
  private def localPack(
      docs: Seq[(Long, String)],
      seqLen: Int,
      keepPartial: Boolean): Seq[(Long, String, Long, Long)] = {
    val stream = docs.sortBy(_._1).flatMap { case (id, t) =>
      val toks =
        if (t == null) Array.empty[String]
        else t.split("\\s+").filter(_.nonEmpty)
      toks.map(tok => (id, tok))
    }
    stream.zipWithIndex
      .groupBy { case (_, g) => (g / seqLen).toLong }
      .toSeq
      .map { case (seqId, part) =>
        val toks = part.map(_._1._2)
        val ids = part.map(_._1._1).distinct
        (seqId, toks.mkString(" "), toks.size.toLong, ids.size.toLong)
      }
      .filter { case (_, _, n, _) => keepPartial || n == seqLen.toLong }
      .sortBy(_._1)
  }

  "packSequences" should {
    "cut the id-ordered token stream into fixed windows across doc bounds" in {
      val s = spark
      import s.implicits._
      // stream: a b c | d e | f g h i j  -> L=4: [a b c d][e f g h][i j]
      val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j"))
      val out = Packing
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text",
          seqLen = 4, keepPartial = true)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      out shouldBe Seq(
        (0L, "a b c d", 4L, 2L),
        (1L, "e f g h", 4L, 2L),
        (2L, "i j", 2L, 1L))
      out shouldBe localPack(docs, 4, keepPartial = true)
      // default drops the trailing partial
      Packing.packSequences(docs.toDF("doc_id", "text"), "doc_id", "text", 4)
        .count() shouldBe 2L
    }

    "drop null ids, count null/blank text as zero tokens, keep id order" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (java.lang.Long.valueOf(3L), "x y"),
        (java.lang.Long.valueOf(1L), "w1 w2 w3"),
        (null.asInstanceOf[java.lang.Long], "dropped entirely"),
        (java.lang.Long.valueOf(2L), "   "),
        (java.lang.Long.valueOf(4L), null.asInstanceOf[String]))
      val out = Packing
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text",
          seqLen = 2, keepPartial = true)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      // stream in id order (nulls gone, blanks empty): w1 w2 w3 x y
      out shouldBe Seq((0L, "w1 w2", 2L), (1L, "w3 x", 2L), (2L, "y", 1L))
    }

    "agree with a local replay and keep a Window-free plan on random corpora" in {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(29)
      val vocab = Vector("kea", "tui", "ruru", "weka", "huia", "moa")
      (0 until 3).foreach { round =>
        val docs = (0 until 50).map { i =>
          val len = rng.nextInt(9) // 0..8 tokens, some docs empty
          (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
        }
        for (l <- Seq(3, 7, 16); kp <- Seq(true, false)) {
          val got = Packing
            .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text",
              seqLen = l, keepPartial = kp)
            .collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
            .toSeq.sortBy(_._1)
          withClue(s"round $round L=$l keepPartial=$kp: ") {
            got shouldBe localPack(docs, l, kp)
          }
        }
      }
      val plan = Packing
        .packSequences(docs(spark), "doc_id", "text", 32, keepPartial = true)
        .queryExecution.executedPlan.toString()
      plan should not include "Window"
      plan should not include "CartesianProduct"
    }

    "reassemble the exact corpus when sequences are re-joined in order" in {
      val s = spark
      import s.implicits._
      val docs = (0 until 30).map(i =>
        (i.toLong, (0 until (i % 5) * 2).map(j => s"w${i}_$j").mkString(" ")))
      val seqs = Packing
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text",
          seqLen = 5, keepPartial = true)
        .orderBy("seq_id")
        .collect().map(_.getString(1))
      val corpus = docs.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      seqs.mkString(" ") shouldBe corpus.mkString(" ")
    }
  }

  "packStats" should {
    "report exclusive offsets, sequence spans and boundary crossings" in {
      val s = spark
      import s.implicits._
      val docs = Seq((1L, "a b c"), (2L, ""), (3L, "d e f g"), (4L, "h"))
      val out = Packing
        .packStats(docs.toDF("doc_id", "text"), "doc_id", "text", seqLen = 4)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4),
            r.getBoolean(5))))
        .toMap
      out(1L) shouldBe ((3L, 0L, 0L, 0L, false))   // tokens 0..2 in seq 0
      out(2L) shouldBe ((0L, 3L, -1L, -1L, false)) // empty: null span
      out(3L) shouldBe ((4L, 3L, 0L, 1L, true))    // tokens 3..6 cross 4
      out(4L) shouldBe ((1L, 7L, 1L, 1L, false))   // token 7 in seq 1
    }
  }

  "lengthBuckets / paddingWasteStats" should {
    "bucket by token length and account every pad token" in {
      val s = spark
      import s.implicits._
      // lengths 1..12 (ids shuffled vs length so the rank key matters),
      // plus a null-text and a null-id row
      val df = ((1 to 12).map(n => ((13 - n).toLong, Seq.fill(n)("w").mkString(" "))) ++
        Seq((50L, null.asInstanceOf[String])))
        .toDF("doc_id", "text")
        .unionByName(Seq((null.asInstanceOf[java.lang.Long], "x y"))
          .toDF("doc_id", "text"))
      val bk = Packing.lengthBuckets(df, "doc_id", "text", nBuckets = 4)
      val rows = bk.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2)))
      rows.length shouldBe 13 // null id dropped, null text kept at 0
      rows.find(_._1 == 50L).get._2 shouldBe 0L // null text -> 0 tokens
      // ntile(4) over 13 rows: tile sizes 4,3,3,3 ordered by (nt, id)
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2).toSeq).toMap
      byBucket(1).size shouldBe 4
      byBucket(1).max should be <= byBucket(2).min
      byBucket(3).max should be <= byBucket(4).min
      val stats = Packing.paddingWasteStats(bk).collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      stats.values.foreach { case (docs, sumT, maxL, waste) =>
        waste shouldBe maxL * docs - sumT
      }
      // bucketed waste must not exceed the single-batch baseline
      val totalDocs = rows.length.toLong
      val totalTok = rows.map(_._2).sum
      val baseline = rows.map(_._2).max * totalDocs - totalTok
      stats.values.map(_._4).sum should be <= baseline
    }
  }

  private def docs(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (0L until 20L).map(i => (i, s"a$i b$i c$i")).toDF("doc_id", "text")
  }
}
