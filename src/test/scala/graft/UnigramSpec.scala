package graft

import graft.pipeline.Unigram
import graft.pipeline.Unigram.UnigramModel
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class UnigramSpec extends AnyWordSpec with Matchers with SparkSpec {

  "UnigramModel Viterbi" should {
    "pick the max-probability segmentation" in {
      val m = UnigramModel(
        Map("a" -> math.log(0.2), "b" -> math.log(0.2),
          "c" -> math.log(0.1), "ab" -> math.log(0.4)),
        unkLogProb = math.log(0.01))
      m.encodeWord("ab").toSeq shouldBe Seq("ab")
      m.encodeWord("abc").toSeq shouldBe Seq("ab", "c")
      m.encodeWord("ba").toSeq shouldBe Seq("b", "a")
      // unknown single chars segment as UNK, multi-char gaps never
      m.encodeWord("axb").toSeq shouldBe Seq("a", "x", "b")
      m.encode("ab  ba").toSeq shouldBe Seq("ab", "b", "a")
      m.countTokens(null) shouldBe 0L
      m.scoreWord("ab") shouldBe math.log(0.4) +- 1e-15
    }

    "break exact score ties toward the shortest last piece" in {
      // lp(aa) = -2.0 exactly equals lp(a)+lp(a): the DP keeps the
      // first (shortest-last-piece) candidate on a tie
      val m = UnigramModel(Map("a" -> -1.0, "aa" -> -2.0), -10.0)
      m.encodeWord("aa").toSeq shouldBe Seq("a", "a")
      m.scoreWord("aa") shouldBe -2.0
      // and a strictly better long piece still wins
      val m2 = UnigramModel(Map("a" -> -1.0, "aa" -> -1.5), -10.0)
      m2.encodeWord("aa").toSeq shouldBe Seq("aa")
    }
  }

  "Unigram.train" should {
    "learn frequent substrings and explain the corpus more briefly" in {
      val s = spark
      import s.implicits._
      val df = (0 until 50).map(i => (i.toLong, "abab abab cdcd"))
        .toDF("doc_id", "text")
      val m = Unigram.train(df, "text", vocabSize = 8, maxPieceLen = 4,
        emIters = 2)
      // a frequent multi-char piece exists and the word segments with it
      m.pieces.keySet.exists(_.length > 1) shouldBe true
      m.encodeWord("abab").length should be < 4
      // deterministic: same input, same model
      val m2 = Unigram.train(df, "text", vocabSize = 8, maxPieceLen = 4,
        emIters = 2)
      m2.pieces shouldBe m.pieces
    }

    "round-trip through writeModel/readModel" in {
      val s = spark
      val m = UnigramModel(Map("a" -> -1.0, "ab" -> -0.5), -9.0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_unigram").toString
      try {
        Unigram.writeModel(m, s, dir)
        val back = Unigram.readModel(s, dir)
        back.pieces shouldBe m.pieces
        back.unkLogProb shouldBe m.unkLogProb
        back.encodeWord("ab").toSeq shouldBe m.encodeWord("ab").toSeq
      } finally {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try st.iterator().asScala.toSeq.reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally st.close()
      }
    }
  }
}
