package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BYTE-level byte-pair encoding — the GPT-2/Llama production tokenizer
  * family ([[Bpe]]'s code-point alphabet is the SentencePiece-char
  * style): a word starts as its UTF-8 BYTES and merges upward, so any
  * input — any script, emoji, mojibake, binary-ish junk — tokenizes
  * with a closed 256-symbol base alphabet and no UNK.
  *
  * Symbols are rendered as 2-char lowercase hex ("c3", "a9", merged
  * "c3a9") — a readable, order-stable byte spelling the DuckDB oracle
  * reproduces with `hex(encode(word))`, exercising multi-byte UTF-8
  * splits byte for byte. All merge machinery (rank-priority
  * application, histogram trainer, tie-breaks) is [[Bpe]]'s, shared via
  * `encodeSymbols`/`trainMerges` — one implementation, two alphabets.
  *
  * Scale shape: identical to [[Bpe]] — apply is one text scan with a
  * task-serialized model; training is one tokenize+groupBy histogram
  * plus a driver-side merge loop.
  *
  * reference capability: none (deequ has no tokenizer); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object ByteBpe {

  private val HexDigits = "0123456789abcdef"

  /** UTF-8 byte symbols of a word, each as 2-char lowercase hex. */
  def byteSymbols(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = new String(
        Array(HexDigits.charAt(b >> 4), HexDigits.charAt(b & 0xf)))
      i += 1
    }
    out
  }

  /** An ordered byte-level merge list over hex symbols; same
    * rank-priority semantics (and the same sequential-replace oracle
    * equivalence for well-formed lists) as [[Bpe.BpeModel]].
    */
  final case class ByteBpeModel(merges: Seq[(String, String)]) {
    @transient private lazy val inner = Bpe.BpeModel(merges)

    /** Byte-BPE segmentation of one word (hex-spelled tokens). */
    def encodeWord(word: String): Array[String] =
      inner.encodeSymbols(byteSymbols(word))

    /** All byte-BPE tokens of a text (whitespace words, each segmented). */
    def encode(text: String): Array[String] =
      if (text == null) Array.empty
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(encodeWord).toArray

    /** Byte-BPE token count of a text; null counts 0. */
    def countTokens(text: String): Long =
      if (text == null) 0L
      else {
        var n = 0L
        text.split("\\s+").iterator.filter(_.nonEmpty)
          .foreach(w => n += encodeWord(w).length)
        n
      }
  }

  /** Byte-BPE token count as a Column — the same pluggable `tokenCount`
    * contract [[Bpe.tokenCountCol]] satisfies for
    * [[Mixing.temperatureBudgets]] / [[Mixing.tokenBudgetSample]] /
    * [[Packing]] consumers.
    */
  def tokenCountCol(model: ByteBpeModel): Column => Column = {
    val f = udf((s: String) => model.countTokens(s))
    text => coalesce(f(text), lit(0L))
  }

  /** Byte-BPE tokens as an array Column (hex-spelled), for
    * [[Packing.packSequences]].
    */
  def tokensCol(model: ByteBpeModel): Column => Column = {
    val f = udf((s: String) => model.encode(s))
    text => coalesce(f(text), array())
  }

  /** Train a byte-level merge list from the corpus — [[Bpe.train]]'s
    * trainer over the byte alphabet: one word-histogram scan, then the
    * driver-side merge loop; per step the highest-total adjacent pair
    * wins, ties by lexicographically smallest (left, right) hex
    * spelling (= smallest byte value — hex order is byte order).
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1000000): ByteBpeModel =
    ByteBpeModel(
      Bpe.trainMerges(df, textCol, numMerges, maxWords, byteSymbols))

  /** (idCol, byte_bpe_tokens) per row — one text scan, no shuffle. */
  def tokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: ByteBpeModel): DataFrame =
    df.select(col(idCol),
      tokenCountCol(model)(col(textCol)).as("byte_bpe_tokens"))

  /** Persist/reload the merge list ([[Bpe.writeModel]]'s parquet shape). */
  def writeModel(model: ByteBpeModel,
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    Bpe.writeModel(Bpe.BpeModel(model.merges), spark, path)

  def readModel(spark: org.apache.spark.sql.SparkSession,
      path: String): ByteBpeModel =
    ByteBpeModel(Bpe.readModel(spark, path).merges)
}
