package graft

import graft.pipeline.WordPiece
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class WordPieceSpec extends AnyWordSpec with Matchers with SparkSpec {

  "WordPieceModel greedy segmentation" should {
    val vocab = Set("un", "##able", "##a", "##ble", "a", "b", "##b",
      "able", "##n", "##un")
    val m = WordPiece.WordPieceModel(vocab)

    "take the longest match at every position" in {
      m.encodeWord("unable") shouldBe List("un", "##able")
      m.encodeWord("able") shouldBe List("able")
      // no 'ab' piece: 'a', then continuations
      m.encodeWord("aba") shouldBe List("a", "##b", "##a")
    }

    "emit [UNK] for any position failure (no partial segmentations)" in {
      m.segmentWord("xyz") shouldBe None
      m.encodeWord("xyz") shouldBe List(WordPiece.Unk)
      // fails midway (no '##x'): whole word is one UNK token
      m.encodeWord("ax") shouldBe List(WordPiece.Unk)
      m.countTokens("unable able xyz") shouldBe 4L
      m.countUnk("unable able xyz") shouldBe 1L
      m.countTokens(null) shouldBe 0L
    }
  }

  "WordPiece.train" should {
    "pick merges by likelihood score with the (score, l, r) tie-break" in {
      val s = spark
      import s.implicits._
      // words: 'aa' x2, 'ab' x1. symCnt: a=3, ##a=2, ##b=1.
      // score(a,##a) = 2/(3*2) = 1/3 == score(a,##b) = 1/(3*1) —
      // an EXACT rational tie (IEEE division is correctly rounded, so
      // both engines see equal doubles); (a,##a) wins on the tie-break.
      val df = Seq((1L, "aa aa ab")).toDF("id", "text")
      val m = WordPiece.train(df, "text", numMerges = 1)
      m.merges shouldBe Seq(("a", "##a"))
      m.vocab should contain("aa")
      m.encodeWord("aa") shouldBe List("aa")
      m.encodeWord("ab") shouldBe List("a", "##b")
    }

    "round-trip the vocabulary through parquet" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "hello hello help")).toDF("id", "text")
      val m = WordPiece.train(df, "text", numMerges = 3)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-wp").toString
      WordPiece.writeModel(m, s, s"$dir/wp")
      val back = WordPiece.readModel(s, s"$dir/wp")
      back.vocab shouldBe m.vocab
      back.countTokens("hello help") shouldBe m.countTokens("hello help")
    }
  }
}
