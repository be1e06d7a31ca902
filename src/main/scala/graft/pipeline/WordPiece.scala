package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT tokenizer)
  * — the third learned-tokenizer family next to BPE (q77, merge-rank
  * replace) and unigram (q94, Viterbi): APPLY is greedy
  * longest-match-first against a piece vocabulary with `##` continuation
  * marking, and a word that fails at ANY position becomes a single
  * `[UNK]` token (the BERT convention — no partial segmentations).
  * TRAINING is the likelihood-gain merge loop: like BPE's, but the next
  * merge maximizes `score = count(ab) / (count(a)·count(b))` instead of
  * raw pair count — pairs win by how much more often they co-occur than
  * their parts predict.
  *
  * Scale shape (the [[Bpe]] contract exactly): APPLY is a per-row loop
  * against a task-serialized vocabulary — one text scan, no shuffle;
  * TRAINING's corpus-side work is ONE tokenize+groupBy word histogram
  * (frequency-capped), with the merge loop driver-side over the
  * histogram, because pair statistics are a pure function of it.
  *
  * Determinism: merges tie-break on (score DESC, left ASC, right ASC);
  * scores are IEEE divisions of exact integer counts, so equal rationals
  * compare equal in any engine (correctly-rounded division) and the
  * trained vocabulary is a pure function of the data.
  *
  * reference capability: none (deequ has no tokenizer); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object WordPiece {

  val Unk = "[UNK]"

  /** A piece vocabulary: word-initial pieces plain, continuations
    * `##`-prefixed. `maxPieceChars` bounds the longest BODY (marker
    * excluded) — greedy matching probes descending lengths from it.
    */
  final case class WordPieceModel(
      vocab: Set[String],
      merges: Seq[(String, String)] = Nil) {
    @transient private lazy val maxPieceChars: Int =
      if (vocab.isEmpty) 0
      else vocab.iterator.map(p =>
        if (p.startsWith("##")) p.length - 2 else p.length).max

    /** Greedy longest-match segmentation; None = `[UNK]` (some position
      * had no matching piece).
      */
    def segmentWord(word: String): Option[List[String]] = {
      if (word.isEmpty) return Some(Nil)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var pos = 0
      while (pos < word.length) {
        var len = math.min(maxPieceChars, word.length - pos)
        var hit: String = null
        while (len >= 1 && hit == null) {
          val body = word.substring(pos, pos + len)
          val candidate = if (pos == 0) body else "##" + body
          if (vocab.contains(candidate)) hit = candidate
          else len -= 1
        }
        if (hit == null) return None
        out += hit
        pos += (if (pos == 0) hit.length else hit.length - 2)
      }
      Some(out.toList)
    }

    /** WordPiece tokens of one word — the segmentation, or `[UNK]`. */
    def encodeWord(word: String): List[String] =
      segmentWord(word).getOrElse(List(Unk))

    /** Piece count of a text (whitespace words, each segmented; an UNK
      * word counts 1); null counts 0.
      */
    def countTokens(text: String): Long =
      if (text == null) 0L
      else {
        var n = 0L
        text.split("\\s+").iterator.filter(_.nonEmpty)
          .foreach(w => n += encodeWord(w).length)
        n
      }

    /** UNK words in a text; null counts 0. */
    def countUnk(text: String): Long =
      if (text == null) 0L
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .count(w => segmentWord(w).isEmpty).toLong
  }

  /** Piece count as a Column — the pluggable `tokenCount` for the
    * mixture/packing family (the [[Bpe.tokenCountCol]] twin).
    */
  def tokenCountCol(model: WordPieceModel): Column => Column = {
    val f = udf((s: String) => model.countTokens(s))
    text => coalesce(f(text), lit(0L))
  }

  def unkCountCol(model: WordPieceModel): Column => Column = {
    val f = udf((s: String) => model.countUnk(s))
    text => coalesce(f(text), lit(0L))
  }

  /** Code-point symbols with the `##` continuation convention. */
  private def wordSymbols(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      val c = w.substring(i, i + n)
      out += (if (i == 0) c else "##" + c)
      i += n
    }
    out.toArray
  }

  private def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Train a vocabulary by `numMerges` likelihood-gain merges over the
    * word histogram (top `maxWords` by frequency — the [[Bpe.train]]
    * cap). The vocabulary is the character alphabet (with `##` variants
    * as observed) plus every merge product.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1000000): WordPieceModel = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val hist: Array[(Array[String], Long)] = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("graft_w"))
      .groupBy(col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
      .orderBy(col("graft_c").desc, col("graft_w"))
      .limit(maxWords)
      .collect()
      .map(r => wordSymbols(r.getString(0)) -> r.getLong(1))

    val vocab = scala.collection.mutable.Set.empty[String]
    val mergeLog = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    hist.foreach { case (syms, _) => syms.foreach(vocab += _) }
    var words = hist
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCnt.update(k, pairCnt.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        val best = pairCnt.toSeq.minBy { case ((a, b), c) =>
          (-(c.toDouble / (symCnt(a).toDouble * symCnt(b).toDouble)), a, b)
        }._1
        val (a, b) = best
        mergeLog += best
        val product = a + stripCont(b)
        vocab += product
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val m = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                m += product
                j += 2
              } else {
                m += syms(j)
                j += 1
              }
            }
            (m.toArray, c)
          }
        }
        step += 1
      }
    }
    WordPieceModel(vocab.toSet, mergeLog.toSeq)
  }

  /** Persist the vocabulary as parquet (one piece per row). */
  def writeModel(model: WordPieceModel,
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.vocab.toSeq.sorted.toDF("piece")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String)
      : WordPieceModel =
    WordPieceModel(spark.read.parquet(path)
      .collect().map(_.getString(0)).toSet)
}
