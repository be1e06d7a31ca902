package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.Chunking

class ChunkingSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Local replay of the emit rule for expectations. */
  private def localChunks(text: String, chunkTokens: Int, overlap: Int): Seq[(Long, String, Long)] = {
    val toks =
      if (text == null) Array.empty[String]
      else text.split("\\s+").filter(_.nonEmpty)
    val stride = chunkTokens - overlap
    if (toks.isEmpty) Seq.empty
    else Iterator.from(0).map(_ * stride)
      .takeWhile(_ < toks.length)
      .filter(s => s == 0 || s + overlap < toks.length)
      .toSeq.zipWithIndex.map { case (s, i) =>
        val slice = toks.slice(s, s + chunkTokens)
        (i.toLong, slice.mkString(" "), slice.length.toLong)
      }
  }

  "chunking" should {
    "emit sliding windows with overlap and skip fully-redundant tails" in {
      val s = spark
      import s.implicits._
      val text = (1 to 10).map(i => s"t$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val out = Chunking.chunk(df, "text", chunkTokens = 8, overlap = 4)
        .select("chunk_idx", "chunk_text", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        .sortBy(_._1)
      // starts 0, 4; start 8 adds no token beyond chunk [4..10) -> skipped
      out shouldBe Seq(
        (0L, (1 to 8).map(i => s"t$i").mkString(" "), 8L),
        (1L, (5 to 10).map(i => s"t$i").mkString(" "), 6L))
      out shouldBe localChunks(text, 8, 4)
      // map-side only: no exchange in the plan
      Chunking.chunk(df, "text", 8, 4)
        .queryExecution.executedPlan.toString should not include "Exchange"
    }

    "partition exactly at overlap zero and keep short documents whole" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, (1 to 9).map(i => s"w$i").mkString(" ")), // 9 toks, chunks of 4
        (2L, "a b"),                                   // shorter than chunk
        (3L, null.asInstanceOf[String]),
        (4L, "   ")).toDF("doc_id", "text")
      val out = Chunking.chunk(df, "text", chunkTokens = 4, overlap = 0)
        .select("doc_id", "chunk_idx", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sorted
      out shouldBe Seq((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 1L), (2L, 0L, 2L))
      // chunkCount contract: 0 (not NULL) for null and blank text
      val counts = df
        .select(col("doc_id"), Chunking.chunkCount(col("text"), 4, 0).as("c"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      counts(3L) shouldBe 0L
      counts(4L) shouldBe 0L
    }

    "agree with chunkCount and the local replay across sizes, losing no token" in {
      val s = spark
      import s.implicits._
      val docs = (0 to 40).map(n => (n.toLong, (1 to n).map(i => s"x$i").mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val rows = Chunking.chunk(df, "text", 8, 3)
        .select("doc_id", "chunk_idx", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // coverage invariant: emitted starts are chunk_idx * stride, and the
      // last chunk must end exactly at the document's token count — the
      // emit rule may skip a redundant tail window but never a token
      val stride = 8 - 3
      rows.groupBy(_._1).foreach { case (id, grp) =>
        val lastEnd = grp.map(t => t._2 * stride + t._3).max
        lastEnd shouldBe id // doc_id == its token count by construction
      }
      val fromChunk = rows.groupBy(_._1).map { case (id, g) => id -> g.length.toLong }
      val fromCount = df
        .select(col("doc_id"), Chunking.chunkCount(col("text"), 8, 3).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.foreach { case (id, text) =>
        val expected = localChunks(text, 8, 3).size.toLong
        fromChunk.getOrElse(id, 0L) shouldBe expected
        fromCount(id) shouldBe expected
      }
    }
  }
}
