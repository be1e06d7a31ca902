package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenization — learned-vocabulary token counting for
  * the mixture/packing/chunking family, whose budgets are otherwise
  * whitespace-token budgets. Real training-data budgets are tokenizer
  * tokens: a 10k-token-budget mixture sampled by whitespace counts is off
  * by the corpus's tokens-per-word ratio, differently per source.
  *
  * The model is the standard ordered merge list (Sennrich et al. 2016;
  * the merges.txt convention): a word starts as its code-point symbols
  * and repeatedly merges the lowest-rank adjacent pair present, all
  * occurrences leftmost-first, until none applies. Words are the repo's
  * canonical whitespace tokens ([[TextAnalysis.tokens]] — split on \s+,
  * empties dropped, case preserved); no byte-fallback alphabet is needed
  * because code-point symbols cover any input.
  *
  * Scale shape:
  *  - APPLY is embarrassingly parallel: the merge-rank table is a small
  *    task-serialized map; encoding is a per-row loop (a Scala UDF /
  *    mapPartitions job, like the signature scans — inherently imperative,
  *    no expression form exists). Cost is one text scan.
  *  - TRAINING never iterates over the corpus: the corpus-side work is
  *    ONE tokenize+groupBy building the word histogram (capped at
  *    `maxWords` by frequency), and the merge loop runs driver-side over
  *    that histogram — exactly how sentencepiece/HF train, because pair
  *    statistics are a pure function of the word histogram.
  *
  * reference capability: none (deequ has no tokenizer); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object Bpe {

  /** An ordered BPE merge list. Ranks are list positions: lower = earlier
    * = higher priority. Well-formed lists (every pair's symbols are
    * single code points or products of EARLIER merges — all trained lists
    * are) make rank-priority application equal to one in-order
    * sequential-replace pass per merge, which is what the DuckDB oracle
    * replays.
    */
  /** Code-point symbols of a word (surrogate-pair safe). */
  private[pipeline] def charSymbols(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** BPE segmentation of one word: repeatedly merge the lowest-rank
      * adjacent pair present (all occurrences, leftmost-first).
      */
    def encodeWord(word: String): Array[String] =
      encodeSymbols(Bpe.charSymbols(word))

    /** The merge loop itself, over an arbitrary initial symbol sequence —
      * [[ByteBpe]] feeds UTF-8 byte symbols through the same machinery.
      */
    def encodeSymbols(init: Array[String]): Array[String] = {
      var syms = init
      while (syms.length >= 2) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          ranks.get((syms(i), syms(i + 1))) match {
            case Some(r) if r < bestRank => bestRank = r
            case _ =>
          }
          i += 1
        }
        if (bestRank == Int.MaxValue) return syms
        val (a, b) = merges(bestRank)
        val merged = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            merged += a + b
            j += 2
          } else {
            merged += syms(j)
            j += 1
          }
        }
        syms = merged.toArray
      }
      syms
    }

    /** All BPE tokens of a text (whitespace words, each segmented). */
    def encode(text: String): Array[String] =
      if (text == null) Array.empty
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(encodeWord).toArray

    /** BPE token count of a text; null counts 0. */
    def countTokens(text: String): Long =
      if (text == null) 0L
      else {
        var n = 0L
        text.split("\\s+").iterator.filter(_.nonEmpty)
          .foreach(w => n += encodeWord(w).length)
        n
      }
  }

  /** BPE token count as a Column — the pluggable `tokenCount` for
    * [[Mixing.temperatureBudgets]] / [[Mixing.tokenBudgetSample]]. A
    * Scala UDF (the per-word merge loop has no expression form); the
    * model is closure-serialized once per task, not per row.
    */
  def tokenCountCol(model: BpeModel): Column => Column = {
    val f = udf((s: String) => model.countTokens(s))
    text => coalesce(f(text), lit(0L))
  }

  /** BPE tokens as an array Column — the pluggable `tokens` for
    * [[Packing.packSequences]] (packing a BPE token stream instead of a
    * whitespace one).
    */
  def tokensCol(model: BpeModel): Column => Column = {
    val f = udf((s: String) => model.encode(s))
    text => coalesce(f(text), array())
  }

  /** Train a merge list from the corpus. Corpus-side work is ONE
    * tokenize+groupBy producing the word histogram (top `maxWords` by
    * frequency, ties by word — a cap so a 100-TB corpus's long vocabulary
    * tail never reaches the driver; pair statistics concentrate in the
    * head). The merge loop then runs over the histogram: per step, the
    * highest-total adjacent pair wins, ties broken by the lexicographically
    * smallest (left, right) — fully deterministic.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1000000): BpeModel =
    BpeModel(trainMerges(df, textCol, numMerges, maxWords, charSymbols))

  /** The shared trainer: corpus-side word histogram, then the
    * driver-side merge loop over `init`-symbol sequences ([[ByteBpe]]
    * passes UTF-8 byte symbols).
    */
  private[pipeline] def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int,
      init: String => Array[String]): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val hist: Array[(String, Long)] = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("graft_w"))
      .groupBy(col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
      .orderBy(col("graft_c").desc, col("graft_w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // driver-side merge loop over (symbols, freq) word entries
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => init(w) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val m = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                m += a + b
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
    merges.toSeq
  }

  /** (idCol, bpe_tokens) per row — one text scan, no shuffle. */
  def tokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel): DataFrame =
    df.select(col(idCol), tokenCountCol(model)(col(textCol)).as("bpe_tokens"))

  /** Persist the ordered merge list as parquet (rank, left, right) — the
    * FS-agnostic twin of a merges.txt file; one tiny file.
    */
  def writeModel(model: BpeModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
}
