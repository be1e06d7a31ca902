package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.{ByteBpe, Mixing}
import graft.pipeline.ByteBpe.ByteBpeModel

class ByteBpeSpec extends AnyWordSpec with Matchers with SparkSpec {

  // café / résumé / naïve / the / stark exercise every merge level incl.
  // multi-byte UTF-8 pairs (c3a9 = é, c3af = ï)
  private val demoMerges = Seq(
    "c3" -> "a9", "c3" -> "af", "74" -> "68", "7468" -> "65",
    "63" -> "61", "6361" -> "66", "636166" -> "c3a9", "72" -> "c3a9",
    "73" -> "74", "6e" -> "61", "6e61" -> "c3af", "76" -> "65")
  private val demo = ByteBpeModel(demoMerges)

  /** The same sequential-replace fixpoint replay BpeSpec pins, over hex
    * byte symbols — what the DuckDB oracle's recursive chain does.
    */
  private def replayEncode(model: ByteBpeModel, word: String): Seq[String] = {
    var s = " " + ByteBpe.byteSymbols(word).mkString(" ") + " "
    model.merges.foreach { case (a, b) =>
      var prev = ""
      while (prev != s) {
        prev = s
        s = s.replace(s" $a $b ", s" $a$b ")
      }
    }
    s.trim.split(" ").filter(_.nonEmpty).toSeq
  }

  "byteSymbols" should {
    "spell UTF-8 bytes as lowercase hex, incl. multi-byte code points" in {
      ByteBpe.byteSymbols("abc").toSeq shouldBe Seq("61", "62", "63")
      ByteBpe.byteSymbols("café").toSeq shouldBe
        Seq("63", "61", "66", "c3", "a9")
      // U+1F600 is a 4-byte UTF-8 sequence
      val emoji = new String(Character.toChars(0x1F600))
      ByteBpe.byteSymbols(emoji).toSeq shouldBe Seq("f0", "9f", "98", "80")
      ByteBpe.byteSymbols("").toSeq shouldBe Seq.empty
    }
  }

  "ByteBpeModel.encodeWord" should {
    "merge byte pairs up through multi-byte UTF-8 boundaries" in {
      demo.encodeWord("café").toSeq shouldBe Seq("636166c3a9")
      demo.encodeWord("the").toSeq shouldBe Seq("746865")
      demo.encodeWord("stark").toSeq shouldBe Seq("7374", "61", "72", "6b")
      demo.encodeWord("naïve").toSeq shouldBe Seq("6e61c3af", "7665")
      demo.encodeWord("résumé").toSeq shouldBe
        Seq("72c3a9", "73", "75", "6d", "c3a9")
    }

    "equal the sequential-replace replay on randomized words" in {
      val rnd = new scala.util.Random(7)
      val alphabet = "thecaférsunïv"
      (1 to 500).foreach { _ =>
        val w = (1 to (1 + rnd.nextInt(10)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        withClue(s"word=$w: ") {
          demo.encodeWord(w).toSeq shouldBe replayEncode(demo, w)
        }
      }
    }
  }

  "ByteBpe.countTokens" should {
    "sum per-word segment counts; null counts zero" in {
      demo.countTokens("the café  stark") shouldBe 1L + 1L + 4L
      demo.countTokens(null) shouldBe 0L
      demo.countTokens("   ") shouldBe 0L
    }
  }

  "ByteBpe.train" should {
    "learn the weighted argmax byte pair first, ties by smallest bytes" in {
      val s = spark
      import s.implicits._
      // "aa" x3 -> pair (61,61) mass 3; "bé" x2 -> (62,c3)+(c3,a9) mass 2
      val df = Seq("aa aa", "aa bé", "bé x").toDF("text")
      val m = ByteBpe.train(df, "text", numMerges = 2)
      m.merges.head shouldBe ("61" -> "61")
      m.merges should have size 2
    }

    "round-trip through the parquet model format" in {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-bytebpe").toString
      ByteBpe.writeModel(demo, spark, dir)
      ByteBpe.readModel(spark, dir).merges shouldBe demoMerges
    }
  }

  "ByteBpe.tokenCountCol" should {
    "plug into the mixture family as the token counter" in {
      val s = spark
      import s.implicits._
      val docs = Seq(
        (1L, "a", "the café"), (2L, "a", "stark naïve"),
        (3L, "b", "résumé résumé")).toDF("doc_id", "source", "text")
      val counter = ByteBpe.tokenCountCol(demo)
      val budgets = Mixing.temperatureBudgets(docs, "source", "text",
        totalBudget = 100L, alpha = 0.5, tokenCount = counter)
      budgets.keySet shouldBe Set("a", "b")
      val kept = Mixing.tokenBudgetSample(docs, "doc_id", "text",
        "source", budgets, tokenCount = counter)
      kept.count() should be >= 1L
    }
  }
}
