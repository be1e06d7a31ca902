package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018,
  * arXiv:1804.10959) — the second learned-tokenizer family beside
  * [[Bpe]]: a vocabulary of pieces with log-probabilities, applied by
  * Viterbi (the max-probability segmentation of each word), trained by
  * hard-EM over the word histogram.
  *
  * Determinism (the property everything here is built around):
  *
  *  - APPLY is per-word dynamic programming with a FIXED operation
  *    order: positions left to right, candidate last-piece lengths
  *    1..maxPieceLen, a candidate replaces the incumbent only when
  *    STRICTLY better — so equal-score ties keep the shortest last
  *    piece. Scores are single-addition chains (never reductions), so
  *    any engine replaying the same rule produces bit-identical doubles
  *    and the identical segmentation; the q94 oracle replays the DP as
  *    generated position-step CTEs in DuckDB.
  *  - Characters outside the vocabulary segment as single-character UNK
  *    pieces at `unkLogProb` — every word is segmentable.
  *  - TRAINING never iterates the corpus: ONE tokenize+groupBy builds
  *    the word histogram ([[Bpe.train]]'s convention) and hard-EM
  *    (Viterbi E-step, count-normalize M-step — the standard EM with
  *    the expectation collapsed to the best path) runs driver-side over
  *    it. Ties and orders are pinned: candidate pieces rank by
  *    (count DESC, piece ASC), prune keeps the top `vocabSize`.
  *
  * Scale shape: apply is a broadcast-model per-row loop (same plumbing
  * as [[Bpe.tokenCountCol]]); training's corpus-side work is one
  * map-side-combinable histogram groupBy capped at `maxWords`.
  *
  * reference capability: none (deequ has no tokenizer); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object Unigram {

  /** A unigram tokenizer model: piece → natural-log probability, plus
    * the UNK score for out-of-vocabulary single characters. Multi-char
    * pieces never fall back to UNK — only length-1 gaps do.
    */
  final case class UnigramModel(
      pieces: Map[String, Double],
      unkLogProb: Double) {

    @transient lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max

    private def lpOf(piece: String): Double =
      pieces.getOrElse(piece,
        if (piece.length == 1) unkLogProb else Double.NegativeInfinity)

    /** Viterbi segmentation of one word (code-unit positions; the demo
      * and trained vocabularies are BMP-safe). Returns the pieces of
      * the best-scoring path under the deterministic tie rule.
      */
    def encodeWord(word: String): Array[String] = {
      val n = word.length
      if (n == 0) return Array.empty
      val best = new Array[Double](n + 1)
      val backLen = new Array[Int](n + 1)
      java.util.Arrays.fill(best, Double.NegativeInfinity)
      best(0) = 0.0
      var j = 1
      while (j <= n) {
        var l = 1
        val lMax = math.min(maxPieceLen, j)
        while (l <= lMax) {
          val lp = lpOf(word.substring(j - l, j))
          if (lp != Double.NegativeInfinity &&
            best(j - l) != Double.NegativeInfinity) {
            val s = best(j - l) + lp
            if (s > best(j)) { best(j) = s; backLen(j) = l }
          }
          l += 1
        }
        j += 1
      }
      // reconstruct (reachability is guaranteed by the single-char UNK)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) {
        val l = backLen(p)
        out += word.substring(p - l, p)
        p -= l
      }
      out.reverseIterator.toArray
    }

    /** Best-path score of a word (the DP terminal value). */
    def scoreWord(word: String): Double = {
      var s = 0.0
      encodeWord(word).foreach(p => s += lpOf(p))
      s
    }

    /** All unigram pieces of a text (whitespace words, each
      * segmented); null → empty. */
    def encode(text: String): Array[String] =
      if (text == null) Array.empty
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(encodeWord).toArray

    /** Piece count of a text; null counts 0. */
    def countTokens(text: String): Long =
      if (text == null) 0L
      else {
        var n = 0L
        text.split("\\s+").iterator.filter(_.nonEmpty)
          .foreach(w => n += encodeWord(w).length)
        n
      }
  }

  /** Piece count as a Column — the pluggable `tokenCount` for
    * [[Mixing.temperatureBudgets]] / [[Mixing.tokenBudgetSample]]. */
  def tokenCountCol(model: UnigramModel): Column => Column = {
    val f = udf((s: String) => model.countTokens(s))
    text => coalesce(f(text), lit(0L))
  }

  /** Pieces as an array Column — the pluggable `tokens` for
    * [[Packing.packSequences]] / [[Chunking]]. */
  def tokensCol(model: UnigramModel): Column => Column = {
    val f = udf((s: String) => model.encode(s))
    text => coalesce(f(text), array())
  }

  /** Train by hard-EM over the word histogram.
    *
    *  - seed: every substring of length 1..`maxPieceLen` of the top
    *    `maxWords` words, counted frequency-weighted; all single chars
    *    kept, multi-char candidates pruned to the `vocabSize` best by
    *    (count DESC, piece ASC); log-probs normalized over the kept set.
    *  - each of `emIters` rounds re-segments the histogram by Viterbi
    *    under the current model, re-counts piece usage
    *    frequency-weighted, drops unused multi-char pieces, and
    *    re-normalizes. Hard EM (best path instead of the full
    *    forward-backward expectation) — deterministic by the apply
    *    rule's tie-breaks.
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int = 200,
      maxPieceLen: Int = 4,
      emIters: Int = 2,
      maxWords: Int = 50000): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emIters >= 0,
      "bad unigram train parameters")
    val hist: Array[(String, Long)] = df
      .select(explode(TextAnalysis.normalizedTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // seed counts
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seed(p) = seed.getOrElse(p, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val singles = seed.filter(_._1.length == 1)
    val multis = seed.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    var counts: Map[String, Long] = (singles ++ multis).toMap

    def normalized(cs: Map[String, Long]): UnigramModel = {
      val total = cs.values.sum.toDouble
      val lps = cs.map { case (p, c) => p -> math.log(c / total) }
      val unk = (if (lps.isEmpty) 0.0 else lps.values.min) - math.log(10.0)
      UnigramModel(lps, unk)
    }

    var model = normalized(counts)
    var iter = 0
    while (iter < emIters) {
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, c) =>
        model.encodeWord(w).foreach(p =>
          usage(p) = usage.getOrElse(p, 0L) + c)
      }
      // keep all single chars ever seen (reachability) + used multis
      counts = counts.flatMap { case (p, _) =>
        val u = usage.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(u, 1L))
        else if (u > 0L) Some(p -> u)
        else None
      }
      model = normalized(counts)
      iter += 1
    }
    model
  }

  /** Persist as parquet: one (piece, logp, is_unk=false) row per piece
    * plus exactly one (null, unkLogProb, is_unk=true) row. The UNK
    * marker is a dedicated boolean column, NOT a reserved piece key —
    * pieces come from corpus substrings, so with `maxPieceLen >= 5` a
    * corpus that literally contains `<unk>` would train it as a genuine
    * piece and a key-based scheme would collide with it (two rows under
    * one key, model unreadable).
    */
  def writeModel(
      model: UnigramModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    (model.pieces.toSeq.sortBy(_._1).map { case (p, lp) => (p, lp, false) } :+
        ((null: String, model.unkLogProb, true)))
      .toDF("piece", "logp", "is_unk").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def readModel(spark: SparkSession, path: String): UnigramModel = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val (unk, pieces) = rows.partition(_._3)
    require(unk.length == 1, s"model at $path has ${unk.length} unk rows")
    UnigramModel(pieces.map(t => t._1 -> t._2).toMap, unk.head._2)
  }
}
