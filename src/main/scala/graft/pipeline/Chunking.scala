package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sliding-window document chunking — the sequence-prep step of a training
  * pipeline: each document is split into fixed-token-budget windows with a
  * configurable overlap (the Hugging-Face `return_overflowing_tokens` /
  * stride convention), producing the rows a packer or tokenizer consumes.
  *
  * Definitions (exact, oracle-replayable):
  *  - tokens: whitespace-split, empties dropped — the same convention as
  *    [[Repetition]] / [[Mixing]] — unless a custom `tokens` column fn is
  *    passed (e.g. [[Bpe.tokensCol]] for learned-tokenizer windows);
  *    chunk text is the single-space re-join of its token slice.
  *  - windows start at 0, stride, 2*stride, ... with
  *    `stride = chunkTokens - overlap`; a window is emitted iff it is the
  *    first (`start == 0`) or it contains at least one token the previous
  *    window did not (`start + overlap < nTokens`) — no fully-redundant
  *    trailing windows. Documents with zero tokens (null/blank) emit no
  *    chunks.
  *  - `chunk_idx` numbers emitted windows 0..k-1 in order; `n_tokens` is
  *    the window's actual token count (the last window may be short).
  *
  * Execution shape (100 TB): everything is built from codegen'd HOFs
  * (`split`/`filter`/`sequence`/`transform`/`slice`/`array_join`) and one
  * narrow `explode` — zero shuffles, zero UDFs, fully map-side and
  * pipelined into whatever consumes the chunks; column pruning and filter
  * pushdown on the document side survive untouched. Per-row memory is
  * O(doc tokens), independent of corpus size.
  *
  * reference capability: none (deequ has no corpus prep); part of the
  * beyond-reference LLM-pipeline family.
  */
object Chunking {

  /** One row per emitted window: all columns of `df` plus `chunk_idx`,
    * `chunk_text`, `n_tokens`.
    */
  def chunk(
      df: DataFrame,
      textCol: String,
      chunkTokens: Int = 512,
      overlap: Int = 64,
      tokens: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap of $chunkTokens")
    val stride = chunkTokens - overlap
    // Tokenize ONCE into a materialized column below the Generate: an
    // expression referenced from inside a HOF lambda is re-evaluated on
    // every lambda invocation, so inlining the tokenizer here would
    // re-split the document once per window start AND once per emitted
    // window (the ngramFrequencies lesson). CollapseProject never inlines
    // a non-cheap alias referenced more than once, so the projection holds.
    val toks = col("graft_toks")
    val n = size(toks)
    // emitted window starts: 0, stride, ... while start < n and the window
    // adds at least one new token past the previous window's coverage
    // (n-1) div stride via floor: Column `/` is DOUBLE division in Spark
    val lastK = floor((n - 1).cast(DoubleType) / stride).cast(IntegerType)
    val starts = when(n > 0,
      filter(
        transform(
          sequence(lit(0), greatest(lastK, lit(0))),
          i => i * stride),
        s => (s === 0) || (s + overlap < n)))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val windows = transform(starts, (s, i) =>
      struct(
        i.cast(LongType).as("chunk_idx"),
        array_join(slice(toks, s + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), n - s).cast(LongType).as("n_tokens")))
    df.select(col("*"), tokens(col(textCol)).as("graft_toks"))
      .select(col("*"), explode(windows).as("graft_w"))
      .select(col("*"), col("graft_w.chunk_idx"), col("graft_w.chunk_text"),
        col("graft_w.n_tokens"))
      .drop("graft_w", "graft_toks")
  }

  /** Per-document chunk count under the same emit rule, without
    * materializing chunk text — for sizing/reporting passes.
    */
  def chunkCount(
      text: Column,
      chunkTokens: Int = 512,
      overlap: Int = 64): Column = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap of $chunkTokens")
    val stride = chunkTokens - overlap
    val n = size(TextAnalysis.tokens(text))
    // #starts with start == 0 or start + overlap < n, start = k*stride:
    // 1 + ceil((n - overlap - stride) / stride) clamped at >= 1 for n > 0.
    // The null guard is EXPLICIT: null text makes n NULL (size(null)),
    // and greatest() skips nulls — greatest(1, NULL) is 1, so without the
    // isNull arm a null document would count one phantom chunk instead of
    // the contract's 0 (= chunk()'s zero emitted rows)
    when(n.isNull || n <= 0, lit(0L))
      .otherwise(greatest(lit(1),
        -floor((-(n - overlap)).cast(DoubleType) / stride).cast(IntegerType))
        .cast(LongType))
  }
}
