package graft

import graft.pipeline.LogReg
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class LogRegSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Independent in-memory replica of the whole pipeline — tokenize,
    * md5-hash features, L1-normalize, full-batch GD with the decimal
    * snap — sharing no code with the engine (the q101 reference-impl
    * convention).
    */
  private object Reference {
    def featIdx(term: String, dim: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"feat:$term".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }

    def features(text: String, dim: Int): Map[Int, Double] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val byF = toks.groupBy(featIdx(_, dim)).map { case (f, ts) =>
        f -> ts.length.toDouble
      }
      val tot = toks.length.toDouble
      val scaled =
        if (tot == 0) Map.empty[Int, Double]
        else byF.map { case (f, c) => f -> c / tot }
      scaled + (dim -> 1.0)
    }

    def snap(v: Double, d: Int): Double =
      BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

    def train(
        docs: Seq[(String, Double)],
        dim: Int,
        iterations: Int,
        lr: Double,
        l2: Double,
        decimals: Int): Array[Double] = {
      val xs = docs.map { case (t, y) => (features(t, dim), y) }
      var w = Array.fill(dim + 1)(0.0)
      for (_ <- 1 to iterations) {
        val g = Array.fill(dim + 1)(0.0)
        xs.foreach { case (x, y) =>
          val z = x.map { case (f, v) => w(f) * v }.sum
          val r = 1.0 / (1.0 + math.exp(-z)) - y
          x.foreach { case (f, v) => g(f) += r * v }
        }
        w = Array.tabulate(dim + 1)(f =>
          snap(w(f) - lr * (g(f) / xs.length + l2 * w(f)), decimals))
      }
      w
    }
  }

  private val corpus = Seq(
    (1L, "good clean prose with substance and good structure", 1.0),
    (2L, "more good text that reads well and informs", 1.0),
    (3L, "useful good notes on a clean subject", 1.0),
    (4L, "spam spam click here buy now spam", 0.0),
    (5L, "junk junk gibberish click buy junk", 0.0),
    (6L, "noise spam click junk noise noise", 0.0))

  "LogReg.train" should {
    "match the independent in-memory GD trajectory on snapped weights" in {
      val s = spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "text", "y")
      val m = LogReg.train(df, "doc_id", "text", "y",
        dim = 16, iterations = 3, lr = 0.5)
      val ref = Reference.train(
        corpus.map { case (_, t, y) => (t, y) },
        dim = 16, iterations = 3, lr = 0.5, l2 = 0.0, decimals = 6)
      m.weights.length shouldBe 17
      m.weights.zip(ref).foreach { case (a, b) =>
        a shouldBe b +- 1e-12
      }
      m.history.length shouldBe 3
      m.history.last.toSeq shouldBe m.weights.toSeq
    }

    "separate the classes it was trained on" in {
      val s = spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "text", "y")
      val m = LogReg.train(df, "doc_id", "text", "y",
        dim = 16, iterations = 20, lr = 1.0)
      val scored = LogReg.score(df, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
      scored(1L) shouldBe 1
      scored(2L) shouldBe 1
      scored(3L) shouldBe 1
      scored(4L) shouldBe 0
      scored(5L) shouldBe 0
      scored(6L) shouldBe 0
    }

    "reject non-binary labels and empty training sets loudly" in {
      val s = spark
      import s.implicits._
      val bad = Seq((1L, "a b", 2.0)).toDF("doc_id", "text", "y")
      val e1 = intercept[IllegalArgumentException] {
        LogReg.train(bad, "doc_id", "text", "y", 8, 1, 0.5)
      }
      e1.getMessage should include("0/1")
      val empty = Seq.empty[(Long, String, Double)].toDF("doc_id", "text", "y")
      val e2 = intercept[IllegalArgumentException] {
        LogReg.train(empty, "doc_id", "text", "y", 8, 1, 0.5)
      }
      e2.getMessage should include("non-empty")
    }
  }

  "LogReg.score / filterByModel" should {
    "score token-less documents on the intercept alone" in {
      val s = spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "text", "y")
      val m = LogReg.train(df, "doc_id", "text", "y",
        dim = 16, iterations = 3, lr = 0.5)
      val nullish = Seq((7L, null: String), (8L, "   "))
        .toDF("doc_id", "text")
      val out = LogReg.score(nullish, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val intercept = m.weights(16)
      out(7L) shouldBe intercept +- 1e-12
      out(8L) shouldBe intercept +- 1e-12
    }

    "keep exactly the rows at p >= minP" in {
      val s = spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "text", "y")
      val m = LogReg.train(df, "doc_id", "text", "y",
        dim = 16, iterations = 20, lr = 1.0)
      val kept = LogReg.filterByModel(
        df.select("doc_id", "text"), "doc_id", "text", m)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      kept shouldBe Set(1L, 2L, 3L)
    }
  }
}
