package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.{Bpe, Chunking, Mixing, Packing}
import graft.pipeline.Bpe.BpeModel

class BpeSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val demoMerges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "e" -> "s")
  private val demo = BpeModel(demoMerges)

  /** In-order sequential-replace over the space-delimited symbol string,
    * each merge iterated to ITS OWN fixpoint before the next — EXACTLY
    * what the DuckDB oracle's recursive replace() chain does. The
    * fixpoint matters: a single replace pass misses an occurrence whose
    * leading delimiter the previous (adjacent) match consumed, and a
    * LATER-rank merge could then poach its symbols. For well-formed merge
    * lists (components created before use) this equals rank-priority BPE;
    * the property is load-bearing for q77.
    */
  private def replayEncode(model: BpeModel, word: String): Seq[String] = {
    var s = " " + word.toCharArray.mkString(" ") + " "
    model.merges.foreach { case (a, b) =>
      var prev = ""
      while (prev != s) {
        prev = s
        s = s.replace(s" $a $b ", s" $a$b ")
      }
    }
    s.trim.split(" ").filter(_.nonEmpty).toSeq
  }

  "BpeModel.encodeWord" should {
    "apply merges by rank priority, all occurrences leftmost-first" in {
      demo.encodeWord("the").toSeq shouldBe Seq("the")
      demo.encodeWord("then").toSeq shouldBe Seq("the", "n")
      demo.encodeWord("and").toSeq shouldBe Seq("and")
      demo.encodeWord("intern").toSeq shouldBe Seq("in", "t", "er", "n")
      demo.encodeWord("x").toSeq shouldBe Seq("x")
      demo.encodeWord("").toSeq shouldBe Seq.empty
      // leftmost-first on overlapping occurrences: "ttt" + (t,t) -> tt t
      BpeModel(Seq("t" -> "t")).encodeWord("ttt").toSeq shouldBe Seq("tt", "t")
    }

    "equal the one-pass sequential-replace replay on a word corpus" in {
      val words = Seq("the", "then", "and", "intern", "another", "rest",
        "matter", "motor", "es", "theses", "attendant", "errores",
        "onion", "resonant", "x", "tttt", "thethe")
      words.foreach { w =>
        demo.encodeWord(w).toSeq shouldBe replayEncode(demo, w)
      }
    }

    "equal the replay on randomized words over a small alphabet" in {
      // small alphabet maximizes adjacent-repeat runs — the exact shape
      // where single-pass replace diverges from priority BPE
      val rnd = new scala.util.Random(42)
      val alphabet = "theansdr"
      (1 to 500).foreach { _ =>
        val w = (1 to (1 + rnd.nextInt(12)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        withClue(s"word=$w: ") {
          demo.encodeWord(w).toSeq shouldBe replayEncode(demo, w)
        }
      }
    }

    "handle supplementary code points as single symbols" in {
      val emoji = new String(Character.toChars(0x1F600))
      demo.encodeWord(s"a${emoji}b").toSeq shouldBe Seq("a", emoji, "b")
    }
  }

  "BpeModel.countTokens" should {
    "sum per-word segment counts; null and blank count zero" in {
      demo.countTokens("the then and") shouldBe 1L + 2L + 1L
      demo.countTokens(null) shouldBe 0L
      demo.countTokens("   ") shouldBe 0L
    }
  }

  "Bpe.train" should {
    "pick the highest-count pair each step, ties lexicographic" in {
      val s = spark
      import s.implicits._
      // "ab" appears 5x, "abc" 2x: pair counts (a,b)=7, (b,c)=2
      val df = Seq((1L, "ab ab ab ab ab abc abc")).toDF("doc_id", "text")
      val m = Bpe.train(df, "text", numMerges = 2)
      m.merges.head shouldBe ("a" -> "b")
      // after merge 1: abc segments as [ab, c] -> pair (ab, c)=2
      m.merges(1) shouldBe ("ab" -> "c")
      m.encodeWord("abc").toSeq shouldBe Seq("abc")
    }

    "stop early when no pairs remain" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
      Bpe.train(df, "text", numMerges = 5).merges shouldBe Seq.empty
    }

    "round-trip through writeModel/readModel" in {
      val s = spark
      val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
      try {
        Bpe.writeModel(demo, s, dir)
        Bpe.readModel(s, dir).merges shouldBe demoMerges
      } finally {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try st.iterator().asScala.toSeq.reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally st.close()
      }
    }
  }

  "BPE as the pluggable tokenizer" should {
    "drive temperature budgets by BPE token counts" in {
      val s = spark
      import s.implicits._
      // group a: "the the" = 2 bpe tokens; group b: "xy xy xy xy xy xy xy xy"
      // = 16 bpe tokens (xy has no merges -> 2 symbols each)
      val df = Seq(
        (1L, "a", "the the"),
        (2L, "b", "xy xy xy xy xy xy xy xy")).toDF("doc_id", "grp", "text")
      Mixing.temperatureBudgets(df, "grp", "text", totalBudget = 18L,
        alpha = 1.0, tokenCount = Bpe.tokenCountCol(demo)) shouldBe
        Map("a" -> 2L, "b" -> 16L)
      // whitespace counts would be 2 vs 8 — the learned budget differs
      Mixing.temperatureBudgets(df, "grp", "text", totalBudget = 10L,
        alpha = 1.0) shouldBe Map("a" -> 2L, "b" -> 8L)
    }

    "pack a BPE token stream with conserved totals" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, "the then"), (2L, "and intern"), (3L, "rest on")
      ).toDF("doc_id", "text")
      // bpe tokens: [the][the,n] [and][in,t,er,n] [re,s,t][on] = 12
      // ("rest": (r,e) rank 7 beats (e,s) rank 11)
      val packed = Packing.packSequences(df, "doc_id", "text", seqLen = 4,
        keepPartial = true, tokens = Bpe.tokensCol(demo))
      val rows = packed.orderBy(col("seq_id")).collect()
      rows.map(_.getAs[Long]("n_tokens")).sum shouldBe 12L
      rows.head.getAs[String]("seq_text") shouldBe "the the n and"
    }

    "chunk by BPE windows" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "the then and intern")).toDF("doc_id", "text")
      // bpe stream: the, the, n, and, in, t, er, n (8 tokens)
      val chunks = Chunking.chunk(df, "text", chunkTokens = 4, overlap = 0,
        tokens = Bpe.tokensCol(demo)).collect()
      chunks.length shouldBe 2
      chunks.map(_.getAs[Long]("n_tokens")).sum shouldBe 8L
    }
  }
}
