package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** Text-encoding health audit: defect-class counting semantics, the
  * clean/defective partition, and the plan shape (one map-side aggregate,
  * no joins/windows).
  */
class EncodingSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def census(rows: Seq[(Long, String)]): Map[String, Any] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("doc_id", "text")
    val r = TextAnalysis.encodingHealth(df, "doc_id", "text").collect().head
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  "encodingHealth" should {
    "count each defect class exactly once per occurrence" in {
      val out = census(Seq(
        (1L, "perfectly ordinary text"),
        (2L, null),
        (3L, "   "),
        (4L, "lossy \uFFFD decode \uFFFD\uFFFD here"),
        (5L, "bell\u0007 and del\u007F and c1\u0085"),
        (6L, "zero\u200Bwidth\u200Cjoin\u200Der\uFEFF"),
        (7L, "caf\u00C3\u00A9 menu"), // mojibake e-acute
        (8L, "tabs\tand\nnewlines\rare fine")))
      out("n_docs") shouldBe 8L
      out("null_docs") shouldBe 1L
      out("blank_docs") shouldBe 1L
      out("repl_docs") shouldBe 1L
      out("repl_chars") shouldBe 3L
      out("ctrl_docs") shouldBe 1L
      out("ctrl_chars") shouldBe 3L
      out("zw_docs") shouldBe 1L
      out("zw_chars") shouldBe 4L
      out("mojibake_docs") shouldBe 1L
      out("mojibake_hits") shouldBe 1L
      out("clean_docs") shouldBe 2L // docs 1 and 8
      out("defective_id_sum") shouldBe (2L + 3L + 4L + 5L + 6L + 7L)
    }

    "count overlapping signature classes independently" in {
      // the right-double-quote mojibake ends in U+009D, which is ALSO a C1
      // control char — both censuses must see it
      val out = census(Seq((9L, "quote\u00E2\u20AC\u009Dend")))
      out("mojibake_hits") shouldBe 1L
      out("ctrl_chars") shouldBe 1L
      out("clean_docs") shouldBe 0L
    }

    "treat an empty frame as all-zero, not null" in {
      val out = census(Seq.empty)
      out("n_docs") shouldBe 0L
      out("repl_chars") shouldBe 0L
      out("defective_id_sum") shouldBe 0L
    }

    "never shuffle more than the single result row" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      val out = TextAnalysis.encodingHealth(df, "doc_id", "text")
      out.collect()
      val plan = out.queryExecution.executedPlan.toString()
      plan should not include "Join"
      plan should not include "Window"
      // partial agg then a single-partition exchange for the final row
      plan should include("HashAggregate")
    }
  }

  "withEncodingFlags" should {
    "flag rows for routing without dropping any" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "clean text"),
        (2L, "bad �"),
        (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val flagged = TextAnalysis.withEncodingFlags(df, "text")
      flagged.count() shouldBe 3L
      val byId = flagged.collect().map(r => r.getLong(0) -> r).toMap
      byId(1L).getInt(byId(1L).fieldIndex("enc_repl_chars")) shouldBe 0
      byId(2L).getInt(byId(2L).fieldIndex("enc_repl_chars")) shouldBe 1
      byId(3L).getBoolean(byId(3L).fieldIndex("enc_null")) shouldBe true
    }

    "no alternation signature is a prefix of another" in {
      val sigs = TextAnalysis.MojibakeSignatures
      for (a <- sigs; b <- sigs if a != b)
        b.startsWith(a) shouldBe false
    }
  }
}
