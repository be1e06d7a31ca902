package graft

import graft.pipeline.Classify
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class ClassifySpec extends AnyWordSpec with Matchers with SparkSpec {

  "trainNaiveBayes / scoreNaiveBayes" should {
    "reproduce the closed-form multinomial NB posteriors" in {
      val s = spark
      import s.implicits._
      val train = Seq(
        (1L, "good good nice", "hi"),
        (2L, "bad awful", "lo"))
        .toDF("doc_id", "text", "label")
      val m = Classify.trainNaiveBayes(train, "doc_id", "text", "label")
      m.vocabSize shouldBe 4L
      // V=4, alpha=1: P(good|hi)=(2+1)/(3+4), P(good|lo)=(0+1)/(2+4)
      val probs = m.termLogProb.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      probs(("good", "hi")) shouldBe math.log(3.0 / 7) +- 1e-12
      probs(("good", "lo")) shouldBe math.log(1.0 / 6) +- 1e-12
      probs(("awful", "hi")) shouldBe math.log(1.0 / 7) +- 1e-12
      probs.size shouldBe 8 // dense: 4 terms x 2 classes

      val scored = Classify.scoreNaiveBayes(
        Seq((10L, "good nice zzz"), (11L, "awful bad bad"),
          (12L, "zzz yyy")).toDF("doc_id", "text"),
        "doc_id", "text", m)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
          r.getDouble(3)))).toMap
      // OOV 'zzz' ignored; scores are prior + sum tf*log_cond
      val hi10 = math.log(0.5) + math.log(3.0 / 7) + math.log(2.0 / 7)
      val lo10 = math.log(0.5) + math.log(1.0 / 6) + math.log(1.0 / 6)
      scored(10L)._1 shouldBe "hi"
      scored(10L)._2 shouldBe hi10 +- 1e-12
      scored(10L)._3 shouldBe (hi10 - lo10) +- 1e-12
      scored(11L)._1 shouldBe "lo"
      // all-OOV doc: priors tie -> ascending label wins
      scored(12L)._1 shouldBe "hi"
      scored(12L)._3 shouldBe 0.0 +- 1e-12
    }

    "merge count states exactly (monoid laws + train-on-union equality)" in {
      val s = spark
      import s.implicits._
      val a = Seq((1L, "x x y", "hi"), (2L, "z", "lo")).toDF("doc_id", "text", "label")
      val b = Seq((3L, "x z z", "hi"), (4L, "y y", "lo")).toDF("doc_id", "text", "label")
      val both = a.unionByName(b)
      def counts(st: Classify.NbCountState) =
        st.termCounts.collect()
          .map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
      def docs(st: Classify.NbCountState) =
        st.classDocs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sa = Classify.countState(a, "doc_id", "text", "label")
      val sb = Classify.countState(b, "doc_id", "text", "label")
      val merged = Classify.mergeCounts(sa, sb)
      val full = Classify.countState(both, "doc_id", "text", "label")
      counts(merged) shouldBe counts(full) // integer-exact
      docs(merged) shouldBe docs(full)
      // commutative
      counts(Classify.mergeCounts(sb, sa)) shouldBe counts(merged)
      // derived models classify identically
      val corpus = Seq((10L, "x y"), (11L, "z z")).toDF("doc_id", "text")
      def preds(m: Classify.NbModel) =
        Classify.scoreNaiveBayes(corpus, "doc_id", "text", m)
          .select("doc_id", "predicted").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      preds(Classify.modelFromCounts(merged)) shouldBe
        preds(Classify.modelFromCounts(full))
    }

    "filter by label and margin" in {
      val s = spark
      import s.implicits._
      val train = Seq(
        (1L, "alpha alpha beta", "keep"),
        (2L, "gamma delta delta", "toss"))
        .toDF("doc_id", "text", "label")
      val m = Classify.trainNaiveBayes(train, "doc_id", "text", "label")
      val corpus = Seq(
        (10L, "alpha beta"), (11L, "gamma delta"), (12L, "oov only"))
        .toDF("doc_id", "text")
      val kept = Classify
        .filterByClassifier(corpus, "doc_id", "text", m, "keep",
          minMargin = 0.1)
        .select("doc_id").as[Long].collect().toSet
      kept shouldBe Set(10L) // 11 predicts toss; 12 ties at margin 0
    }

    "persist count states through parquet and merge to the full-train model" in {
      val s = spark
      import s.implicits._
      val day1 = Seq(
        (1L, "alpha alpha beta", "keep"),
        (2L, "gamma delta", "toss")).toDF("doc_id", "text", "label")
      val day2 = Seq(
        (3L, "alpha beta beta", "keep"),
        (4L, "delta delta epsilon", "toss")).toDF("doc_id", "text", "label")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_nbstate_spec").toString
      // day 1 writes; day 2 reads it back, merges its own shard, writes
      // the union; a fresh read of the union derives the model
      Classify.writeCountState(
        Classify.countState(day1, "doc_id", "text", "label"), s"$dir/s1")
      val merged = Classify.mergeCounts(
        Classify.readCountState(s, s"$dir/s1"),
        Classify.countState(day2, "doc_id", "text", "label"))
      Classify.writeCountState(merged, s"$dir/union")
      val viaDisk = Classify.modelFromCounts(
        Classify.readCountState(s, s"$dir/union"))
      val full = Classify.modelFromCounts(Classify.countState(
        day1.unionByName(day2), "doc_id", "text", "label"))
      def probs(m: Classify.NbModel) = m.termLogProb.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      def priors(m: Classify.NbModel) = m.classLogPrior.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      probs(viaDisk) shouldBe probs(full) // bit-identical from integer counts
      priors(viaDisk) shouldBe priors(full)
      viaDisk.release(); full.release()
    }
  }
}
