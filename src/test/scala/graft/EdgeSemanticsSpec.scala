package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import org.apache.spark.sql.functions.lit

import graft.checks._
import graft.core._
import graft.operators._

/** Empty-data / all-rows-filtered edge semantics (SURVEY §7.4: encode
  * these in tests first — reference constraints/AnalysisBasedConstraint
  * .scala:78-120, analyzers/Completeness.scala:41-58,
  * analyzers/DuplicateRowCount.scala:45-49).
  */
class EdgeSemanticsSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
  }

  private def emptyDf = df.filter(org.apache.spark.sql.functions.lit(false))

  "a WHERE that filters out every row" should {
    "make constraints trivially succeed" in {
      val check = Check(CheckLevel.Error, "edge")
        .hasCompleteness("v", _ >= 0.5).where("id > 100")
        .hasMin("v", _ > 0).where("id > 100")
        .satisfies("v > 1000", "impossible", _ == 1.0).where("id > 100")
        .hasMean("v", _ > 0).where("id > 100")
      val r = VerificationSuite().onData(df).addCheck(check).run()
      r.status shouldBe CheckStatus.Success
      r.checkResults.values.head.constraintResults.foreach { cr =>
        cr.status shouldBe ConstraintStatus.Success
      }
    }
  }

  "a WHERE that keeps rows whose values are all NULL" should {
    "fail value constraints instead of trivially passing" in {
      val s = spark
      import s.implicits._
      val allNull = Seq((1, Option.empty[Double]), (2, Option.empty[Double]))
        .toDF("id", "v")
      // rows SURVIVE the filter but every value is NULL: before the
      // Size(where) probe this was indistinguishable from all-filtered
      // and reported a false trivial Success
      val check = Check(CheckLevel.Error, "allnull")
        .hasMin("v", _ > 0).where("id > 0")
      val r = VerificationSuite().onData(allNull).addCheck(check).run()
      r.status shouldBe CheckStatus.Error
      r.checkResults.values.head.constraintResults.head.message.get should
        include("all surviving values NULL")
      // the probe is internal: it must not leak into the reported metrics
      r.metrics.keys.collect { case sz: Size => sz } shouldBe empty
    }
  }

  "genuinely empty data without a WHERE" should {
    "fail value constraints (there is no value to assert on)" in {
      val check = Check(CheckLevel.Error, "empty")
        .hasMin("v", _ > 0)
        .hasCompleteness("v", _ >= 0.5)
      val r = VerificationSuite().onData(emptyDf).addCheck(check).run()
      r.status shouldBe CheckStatus.Error
    }

    "still satisfy size and duplicate-count assertions" in {
      val check = Check(CheckLevel.Error, "empty counts")
        .hasSize(_ == 0)
        .hasDuplicateRowCount(_ == 0, Seq("id"))
      val r = VerificationSuite().onData(emptyDf).addCheck(check).run()
      r.status shouldBe CheckStatus.Success
    }
  }

  "NaN never leaks from ratio analyzers" should {
    "produce empty state instead of 0/0" in {
      val m = Completeness("v", Some("id > 100")).calculate(df)
      m.value.isFailure shouldBe true
      m.value.failed.get shouldBe an[EmptyStateException]
    }
  }

  "LM scorers and SemDeDup on degenerate inputs" should {
    import graft.pipeline.{Similarity, TextAnalysis}

    "score an empty / all-null-text corpus as zero rows, not an error" in {
      val s = spark
      import s.implicits._
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val nulls = Seq((1L, null.asInstanceOf[String]), (2L, ""))
        .toDF("doc_id", "text")
      for (d <- Seq(empty, nulls)) {
        TextAnalysis.unigramCrossEntropy(d, "doc_id", "text").count() shouldBe 0L
        TextAnalysis.bigramCrossEntropy(d, "doc_id", "text").count() shouldBe 0L
        TextAnalysis.dsirLogWeights(d, "doc_id", "text", lit(true))
          .count() shouldBe 0L
      }
    }

    "give a single-token document a unigram score but no bigram row" in {
      val s = spark
      import s.implicits._
      val d = Seq((1L, "solo")).toDF("doc_id", "text")
      TextAnalysis.unigramCrossEntropy(d, "doc_id", "text").count() shouldBe 1L
      TextAnalysis.bigramCrossEntropy(d, "doc_id", "text").count() shouldBe 0L
    }

    "dsir with an empty target domain still scores (target counts all zero)" in {
      val s = spark
      import s.implicits._
      val d = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
      val out = TextAnalysis.dsirLogWeights(d, "doc_id", "text", lit(false))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // every ct = 0, Tt = 0: lw(d) = sum tf * (ln(1/(0+V)) - ln p_raw)
      // — finite for every document, never NaN/Inf
      out.values.foreach { v =>
        java.lang.Double.isFinite(v) shouldBe true
      }
    }

    "semDedup keeps zero-norm vectors (cosine 0 to everything)" in {
      val s = spark
      import s.implicits._
      val emb = Seq(
        (0L, Seq(1.0f, 0.0f)),
        (1L, Seq(0.0f, 0.0f)), // zero vector: assigned, never dropped
        (2L, Seq(1.0f, 0.001f))
      ).toDF("vec_id", "embedding")
      val res = Similarity
        .semDedup(emb, "vec_id", "embedding", Seq(Array(1.0, 0.0)), 0.9)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      res(0L) shouldBe true
      res(1L) shouldBe true // sim(zero, anything) = 0 < tau
      res(2L) shouldBe false // near-dup of id 0
    }

    "semDedup drops null and empty vectors from the output" in {
      val s = spark
      import s.implicits._
      val emb = Seq(
        (0L, Some(Seq(1.0f, 0.0f))),
        (1L, None),
        (2L, Some(Seq.empty[Float]))
      ).toDF("vec_id", "embedding")
      Similarity.semDedup(emb, "vec_id", "embedding", Seq(Array(1.0, 0.0)), 0.9)
        .count() shouldBe 1L
    }
  }
}
