package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Repetition-based document quality statistics — the "Gopher rules" family
  * (Rae et al. 2021, "Scaling Language Models: Methods, Analysis & Insights
  * from Training Gopher", table A1; also applied by RefinedWeb and Dolma):
  * documents dominated by repeated lines, paragraphs, or n-grams are
  * boilerplate/spam and get filtered before LLM training.
  *
  * Per document this computes:
  *  - duplicate line / paragraph fractions (by item count and by character
  *    mass): lines are `\n`-separated, paragraphs are blank-line-separated,
  *    both trimmed, empty items dropped, compared exactly (case-sensitive);
  *    every member of a group occurring >= 2 times counts as a duplicate.
  *  - top n-gram character fraction (n = 2, 3, 4): over positional token
  *    n-grams of the single-space-normalized lowercase text, the largest
  *    count*charlen product of any distinct n-gram, divided by the
  *    normalized text length. ("The most covering n-gram" — count-ties
  *    resolve by the product itself, so no tie-breaking is needed.)
  *  - duplicated n-gram character fraction (n = 5..10): sum of
  *    count*charlen over distinct n-grams occurring >= 2 times, divided by
  *    the normalized text length. Overlapping occurrences are counted per
  *    occurrence (the cheap convention — the fraction can exceed 1 on
  *    degenerate docs, which only makes the filter fire harder).
  *
  * All metrics are exact integer ratios evaluated in one IEEE division, so
  * an external oracle replaying the same definition reproduces them
  * bit-for-bit. Character masses count Unicode CODE POINTS (what SQL
  * `length()`/`len()` return), not UTF-16 units.
  *
  * Execution shape (100 TB): one mapPartitions pass per row — per-doc
  * hash-map counting is imperative, non-relational work (the same reasoning
  * as [[Dedup.textSignatures]]); nothing shuffles, the stats column along
  * with the keep/filter decision is computed where the row already lives,
  * and the pass pipelines into any downstream scan consumer. Work and
  * memory are O(doc length) per row (9 counting passes), independent of
  * corpus size.
  */
object Repetition {

  /** Gopher table-A1 thresholds; a document is kept when every metric is
    * <= its bound.
    */
  final case class Thresholds(
      dupLineFrac: Double = 0.30,
      dupParaFrac: Double = 0.30,
      dupLineCharFrac: Double = 0.20,
      dupParaCharFrac: Double = 0.20,
      topGramFrac: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupGramFrac: Map[Int, Double] = Map(
        5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10))

  val TopNs: Seq[Int] = Seq(2, 3, 4)
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  /** Per-document repetition statistics: `graft_id` (the id column,
    * original type) plus, per doc — `n_tokens`, `total_chars` (normalized
    * join length), `n_lines`/`dup_line_frac`/`dup_line_char_frac`,
    * `n_paras`/`dup_para_frac`/`dup_para_char_frac`,
    * `top_gram_cover_N` + `top_gram_frac_N` (N = 2,3,4), and
    * `dup_gram_chars_N` + `dup_gram_frac_N` (N = 5..10). The `_cover_` /
    * `_chars_` columns are the exact integer numerators (count*charlen)
    * backing the fractions.
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val fields = scala.collection.mutable.ArrayBuffer(
      idField.copy(name = "graft_id"),
      StructField("n_tokens", LongType, nullable = false),
      StructField("total_chars", LongType, nullable = false),
      StructField("n_lines", LongType, nullable = false),
      StructField("dup_line_frac", DoubleType, nullable = false),
      StructField("dup_line_char_frac", DoubleType, nullable = false),
      StructField("n_paras", LongType, nullable = false),
      StructField("dup_para_frac", DoubleType, nullable = false),
      StructField("dup_para_char_frac", DoubleType, nullable = false))
    TopNs.foreach { n =>
      fields += StructField(s"top_gram_cover_$n", LongType, nullable = false)
      fields += StructField(s"top_gram_frac_$n", DoubleType, nullable = false)
    }
    DupNs.foreach { n =>
      fields += StructField(s"dup_gram_chars_$n", LongType, nullable = false)
      fields += StructField(s"dup_gram_frac_$n", DoubleType, nullable = false)
    }
    val outSchema = StructType(fields.toSeq)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    graft.core.Parallelism.floor(df.select(col(idCol), col(textCol)))
      .mapPartitions { rows =>
      rows.map { r =>
        val text = if (r.isNullAt(1)) null else r.getString(1)
        val vals = new scala.collection.mutable.ArrayBuffer[Any](outSchema.length)
        vals += r.get(0)

        val toks = normTokens(text)
        var totalChars = 0L
        toks.foreach(t => totalChars += cpLen(t))
        if (toks.nonEmpty) totalChars += toks.length - 1
        vals += toks.length.toLong
        vals += totalChars

        val (nl, dupL, totL, dupLC) = groupDupStats(splitItems(text, "\n"))
        vals += nl.toLong
        vals += fracOf(dupL.toLong, nl.toLong)
        vals += fracOf(dupLC, totL)
        val (np, dupP, totP, dupPC) = groupDupStats(splitItems(text, "\n\\s*\n"))
        vals += np.toLong
        vals += fracOf(dupP.toLong, np.toLong)
        vals += fracOf(dupPC, totP)

        TopNs.foreach { n =>
          val (top, _) = ngramCover(toks, n)
          vals += top
          vals += fracOf(top, totalChars)
        }
        DupNs.foreach { n =>
          val (_, dup) = ngramCover(toks, n)
          vals += dup
          vals += fracOf(dup, totalChars)
        }
        Row.fromSeq(vals.toSeq)
      }
    }
  }

  /** Boolean keep-column over a [[stats]] frame: true when every metric is
    * within its threshold.
    */
  def gopherKeep(t: Thresholds = Thresholds()): Column = {
    val conds =
      Seq(
        col("dup_line_frac") <= t.dupLineFrac,
        col("dup_para_frac") <= t.dupParaFrac,
        col("dup_line_char_frac") <= t.dupLineCharFrac,
        col("dup_para_char_frac") <= t.dupParaCharFrac) ++
        TopNs.map(n => col(s"top_gram_frac_$n") <= t.topGramFrac(n)) ++
        DupNs.map(n => col(s"dup_gram_frac_$n") <= t.dupGramFrac(n))
    conds.reduce(_ && _)
  }

  /** The filtered corpus: rows of `df` whose repetition metrics all pass.
    * The stats pass is map-side, so this joins nothing — it recomputes the
    * per-row metrics inline and filters where the row lives.
    */
  def filter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val keepIds = stats(df, idCol, textCol)
      .where(gopherKeep(t))
      .select(col("graft_id").as(idCol))
    // left-semi on the id column: the stats frame is 1:1 with df (same
    // scan), so AQE broadcasts the usually-large-but-thin id set or falls
    // back to shuffle — callers wanting a single-scan variant can select
    // through stats() directly
    df.join(keepIds, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------------------

  private def fracOf(num: Long, den: Long): Double =
    if (den <= 0) 0.0 else num.toDouble / den

  // character masses count CODE POINTS, not UTF-16 units — the convention
  // any external replay uses (SQL length()/len() are code-point counts);
  // String.length would double-count supplementary-plane characters
  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  private def normTokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  // regex-whitespace trim (not String.trim, which also eats control chars
  // below U+0020) so an external oracle can replay the definition exactly
  private def splitItems(text: String, sep: String): Array[String] =
    if (text == null) Array.empty
    else text.split(sep).map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)

  /** (nItems, dupItems, totalChars, dupChars) over exact-match groups. */
  private def groupDupStats(items: Array[String]): (Int, Int, Long, Long) = {
    val counts = new java.util.HashMap[String, Int]()
    items.foreach(s => counts.merge(s, 1, Integer.sum))
    var dupItems = 0
    var totalChars = 0L
    var dupChars = 0L
    counts.forEach { (s, c) =>
      val l = cpLen(s)
      totalChars += l * c
      if (c >= 2) { dupItems += c; dupChars += l * c }
    }
    (items.length, dupItems, totalChars, dupChars)
  }

  /** (maxCover, dupChars) over positional token n-grams: cover =
    * count * charlen of a distinct n-gram; dupChars sums cover over
    * n-grams occurring >= 2 times. Exact string keys — two windows count
    * together iff their token sequences are identical.
    */
  private def ngramCover(toks: Array[String], n: Int): (Long, Long) = {
    if (toks.length < n) return (0L, 0L)
    val counts = new java.util.HashMap[String, Array[Long]]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val key = sb.toString
      val e = counts.get(key)
      if (e == null) counts.put(key, Array(1L, cpLen(key)))
      else e(0) += 1
      i += 1
    }
    var top = 0L
    var dup = 0L
    counts.forEach { (_, e) =>
      val cover = e(0) * e(1)
      if (cover > top) top = cover
      if (e(0) >= 2) dup += cover
    }
    (top, dup)
  }
}
