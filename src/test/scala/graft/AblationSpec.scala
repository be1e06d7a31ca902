package graft

import graft.pipeline.Ablation
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class AblationSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "clean text here"),        // kept
      (2L, "short"),                  // rule 0 only
      (3L, "has { brace }"),          // rule 1 only
      (4L, "x {"),                    // rules 0 and 1
      (5L, null: String))             // rule 0 (null counts as short)
      .toDF("doc_id", "text")
  }

  private def rules = {
    import org.apache.spark.sql.functions.{size => fsize, trim => ftrim}
    Seq(
      "too_short" ->
        (fsize(split(ftrim(coalesce(col("text"), lit(""))), "\\s+")) < 3 ||
          coalesce(col("text"), lit("")) === ""),
      "has_brace" -> coalesce(col("text"), lit("")).contains("{"))
  }

  "withReasonMask" should {
    "set one bit per fired rule" in {
      val m = Ablation.withReasonMask(docs, rules)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("reason_mask"))
        .toMap
      m shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 1L)
    }

    "fail loudly on a NULL rule verdict" in {
      val bad = Seq("nullable" -> col("text").contains("{"))
      val e = intercept[Exception] {
        Ablation.withReasonMask(docs, bad).collect()
      }
      e.getMessage should include("evaluated to NULL")
    }
  }

  "attributionCensus" should {
    "attribute fired/unique counts and totals exactly" in {
      val rows = Ablation.attributionCensus(docs, "doc_id", rules)
        .collect().map(r => r.getString(1) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows("too_short") shouldBe ((3L, 11L, 2L)) // docs 2,4,5; unique 2,5
      rows("has_brace") shouldBe ((2L, 7L, 1L))  // docs 3,4; unique 3
      val t = Ablation.attributionCensus(docs, "doc_id", rules)
        .collect().head
      t.getAs[Long]("n_docs") shouldBe 5L
      t.getAs[Long]("kept_docs") shouldBe 1L
      t.getAs[Long]("dropped_docs") shouldBe 4L
      t.getAs[Long]("multi_reason_docs") shouldBe 1L
      // 1*0 + 2*1 + 3*2 + 4*3 + 5*1 = 25
      t.getAs[Long]("mask_id_weighted") shouldBe 25L
    }
  }
}
