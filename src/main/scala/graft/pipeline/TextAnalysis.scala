package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  *
  * Everything is pure `org.apache.spark.sql.functions` column expressions —
  * fully codegen'd inside whole-stage codegen, no UDFs, no shuffles; these
  * scale linearly with the scan and pipeline with any downstream groupBy.
  */
object TextAnalysis {

  /** Non-empty whitespace-separated tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Number of whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Lowercased tokens for language / dedup work. */
  def normalizedTokens(text: Column): Column = tokens(lower(text))

  /** Crude BPE-ish subword count: whitespace tokens plus intra-token
    * transitions (case changes, digit/letter boundaries) — a deterministic
    * stand-in for a real tokenizer's token count.
    */
  def subwordCount(text: Column): Column = {
    // zero-width lookarounds: the consuming form "([0-9])([a-z])" ate both
    // boundary characters, so alternating runs like "1a1" missed every
    // second transition (counted 2 subwords instead of 3)
    val boundaries = size(filter(
      split(regexp_replace(text,
        "(?<=[a-z])(?=[A-Z])|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])", " "),
      "\\s+"), t => length(t) > 0))
    boundaries
  }

  /** Character-class counts used by quality scoring. */
  def charCount(text: Column): Column = length(text)

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def whitespaceRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\s", ""))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) /
        size(ts).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Small multilingual stopword marker sets for heuristic language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "une", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val set = stopwords(lang)
    val ts = normalizedTokens(text)
    when(size(ts) > 0,
      size(filter(ts, t => t.isInCollection(set))).cast(DoubleType) /
        size(ts).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Marker-token count for one language (used by languageId and by the
    * DuckDB oracle, which mirrors the exact same counting).
    */
  def markerCount(text: Column, lang: String): Column =
    markerCountFromTokens(normalizedTokens(text), lang)

  /** Marker count over an ALREADY BOUND token-array column — pass a
    * materialized column when counting several languages, or the tokenize
    * subtree is re-evaluated once per language (HOF bodies get no
    * common-subexpression elimination).
    */
  def markerCountFromTokens(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /** Heuristic language ID: argmax of marker counts with a CJK-character
    * override; ties break alphabetically; no markers => "und".
    *
    * Prefer [[languageIdFromTokens]] with a bound tokens column in hot
    * paths: this convenience form re-tokenizes once per language.
    */
  def languageId(text: Column): Column =
    languageIdFromTokens(normalizedTokens(text), text)

  def languageIdFromTokens(toks: Column, text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // argmax by (count, earlier-alphabetical wins ties): maximize the struct
    // (count, -alphabetical_index), then read the language back out
    val scores = langs.zipWithIndex.map { case (l, idx) =>
      struct(markerCountFromTokens(toks, l).as("c"), lit(-idx).as("nidx"), lit(l).as("l"))
    }
    val best = array_max(array(scores: _*))
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    when(cjk > lit(0), lit("zh"))
      .when(best.getField("c") > lit(0), best.getField("l"))
      .otherwise(lit("und"))
  }

  /** Language-ID counts over a whole table: (lang_pred, cnt) with EXACTLY
    * the [[languageIdFromTokens]] semantics (CJK override, marker argmax
    * with alphabetical tie-break, "und" fallback), computed as one tight
    * per-partition pass with per-partition partial counts — the five
    * interpreted HOF `filter` passes per row made the expression form the
    * slowest per-byte query in the suite. Output is at most 6 rows per
    * partition, so the final aggregation is negligible.
    */
  def languageIdCounts(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted // tie-break: earlier alphabetical wins
    val nLangs = langs.length
    // token -> indexes of every language claiming it (markers overlap:
    // "la" is both es and fr, "que" both es and fr, ...)
    val markerLangs: Map[String, Array[Int]] = langs.zipWithIndex
      .flatMap { case (l, i) => stopwords(l).map(_ -> i) }
      .groupBy(_._1).map { case (t, ls) => t -> ls.map(_._2).toArray }
    val outSchema = StructType(Seq(
      StructField("lang_pred", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    graft.core.Parallelism.floor(df.select(col(textCol))).mapPartitions { rows =>
      val partial = new java.util.HashMap[String, Long]()
      val counts = new Array[Int](nLangs)
      rows.foreach { row =>
        val text = if (row.isNullAt(0)) null else row.getString(0)
        var pred = "und"
        if (text != null) {
          // CJK override first, identical to the expression form
          var cjk = false
          var ci = 0
          while (!cjk && ci < text.length) {
            val c = text.charAt(ci)
            if (c >= 0x4E00 && c <= 0x9FFF) cjk = true
            ci += 1
          }
          if (cjk) pred = "zh"
          else {
            java.util.Arrays.fill(counts, 0)
            // Locale.ROOT for determinism. CAVEAT: Spark's lower() uses
            // the JVM DEFAULT locale for non-ASCII strings, so on a tr/az
            // locale JVM the expression form can diverge on mixed-script
            // text — run the driver with -Duser.language=en (or any
            // non-Turkic locale) when exact scalar/expression parity on
            // non-ASCII corpora matters
            val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            var ti = 0
            while (ti < toks.length) {
              if (toks(ti).nonEmpty) {
                val ls = markerLangs.getOrElse(toks(ti), null)
                if (ls != null) {
                  var li = 0
                  while (li < ls.length) { counts(ls(li)) += 1; li += 1 }
                }
              }
              ti += 1
            }
            var best = 0
            var bi = 1
            while (bi < nLangs) {
              if (counts(bi) > counts(best)) best = bi // ties keep earlier lang
              bi += 1
            }
            if (counts(best) > 0) pred = langs(best)
          }
        }
        partial.merge(pred, 1L, (a, b) => a + b)
      }
      scala.jdk.CollectionConverters.MapHasAsScala(partial).asScala.iterator
        .map { case (l, c) => org.apache.spark.sql.Row(l, c) }
    }.groupBy("lang_pred").agg(sum(col("cnt")).as("cnt"))
  }

  /** 64-bit document fingerprint over normalized text: lowercased,
    * whitespace runs collapsed AND leading/trailing whitespace trimmed
    * (so "a  b " and "a b" fingerprint identically) — deterministic and
    * distributed.
    */
  def fingerprint(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Best-effort HTML → text extraction — the step between a raw crawl
    * and every text operator in this file (C4 runs remove-markup before
    * its line rules; trafilatura/jusText fill this role in production
    * pipelines). Deliberately heuristic and DETERMINISTIC (a fixed
    * regexp chain, exactly replayable by an oracle), not a DOM parser:
    *
    *  1. `<script>…</script>`, `<style>…</style>` and `<!-- … -->`
    *     blocks are dropped WITH their content (case-insensitive,
    *     dot-matches-newline, non-greedy);
    *  2. every remaining `<…>` tag becomes a space (content kept);
    *  3. the common entities `&lt; &gt; &quot; &#39; &nbsp;` are
    *     unescaped, then `&amp;` LAST (single-pass unescape — the
    *     standard approximation, `&amp;lt;` becomes `&lt;` not `<`);
    *  4. whitespace runs collapse to one space; ends trimmed.
    *
    * Malformed markup degrades gracefully (an unclosed `<` eats to the
    * next `>` at most). Pure codegen `regexp_replace` chain — one
    * map-side pass, no UDF, nothing shuffles.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val e1 = regexp_replace(noTags, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&#39;", "'")
    val e5 = regexp_replace(e4, "&nbsp;", " ")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  // -- PII / web-artifact detection for training-data scrubbing -------------
  // Patterns restricted to syntax Java regex and RE2 (the DuckDB oracle)
  // interpret identically; all ops are pure codegen'd expressions.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0)))

  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))

  /** Card-number candidates in a text column: maximal runs of digits
    * with optional single space/dash separators (how humans actually
    * write PANs — `4111 1111 1111 1111`), separators stripped, kept
    * when 13-19 digits remain. Returned NORMALIZED (digits only), ready
    * for [[luhnValid]]. RE2-safe (no lookarounds), so the oracle
    * replays it verbatim. Adjacent numbers with no word between them
    * merge into one over-long (rejected) run — maximal-run semantics,
    * identical in both engines.
    */
  def ccCandidates(text: Column): Column =
    filter(
      transform(
        regexp_extract_all(text, lit("[0-9][0-9 -]*[0-9]"), lit(0)),
        r => regexp_replace(r, "[ -]", "")),
      s => length(s) >= 13 && length(s) <= 19)

  /** Luhn checksum (ISO/IEC 7812) over a digit-string column: from the
    * RIGHTMOST digit (position 0), every odd-position digit doubles
    * (minus 9 when > 9), and the total must divide by 10. The standard
    * card-number check — a random digit run passes ~1/10, so validating
    * candidates cuts PII false positives by ~90%. Non-digit characters
    * are ignored; empty/null → false. Pure codegen HOFs, no UDF.
    */
  def luhnValid(digits: Column): Column = {
    val ds = reverse(filter(split(digits, ""), c => c.rlike("^[0-9]$")))
    val contrib = zip_with(ds, sequence(lit(0), size(ds) - 1), (c, i) => {
      val d = c.cast(IntegerType)
      when(pmod(i, lit(2)) === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    coalesce(
      when(size(ds) > 0,
        pmod(aggregate(contrib, lit(0), (acc, x) => acc + x), lit(10)) === 0),
      lit(false))
  }

  /** Checksum-verified card findings: one row per (document, candidate)
    * with `luhn_ok` — the [[piiScrub]] family upgraded from
    * pattern-match to checksum-verified detection. One map-side explode
    * per candidate; nothing shuffles.
    */
  def ccFindings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(col(idCol),
        explode(ccCandidates(col(textCol))).as("candidate"))
      .withColumn("luhn_ok", luhnValid(col("candidate")))

  /** True when the text contains any detectable PII/web artifact. */
  def containsPii(text: Column): Column =
    (emailCount(text) > 0) || (urlCount(text) > 0) || (ipCount(text) > 0)

  /** Replaces every email/URL/IPv4 occurrence with a typed placeholder —
    * the standard pre-training scrub; map-side, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        UrlPattern, "[URL]"),
      Ipv4Pattern, "[IP]")

  /** Composite quality score in [0, 1]: length, alpha share, stopword
    * presence, token-length sanity — the standard pre-training heuristics.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / lit(200.0), lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val tokLen = meanTokenLength(text)
    val tokScore = when(tokLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    (lenScore * lit(0.3)) + (alpha * lit(0.3)) + (stop * lit(0.2)) + (tokScore * lit(0.2))
  }

  /** All features as a select-ready list (single scan, codegen'd). */
  def featureColumns(text: Column): Seq[Column] = Seq(
    charCount(text).as("n_chars"),
    tokenCount(text).as("n_tokens"),
    alphaRatio(text).as("alpha_ratio"),
    digitRatio(text).as("digit_ratio"),
    punctRatio(text).as("punct_ratio"),
    whitespaceRatio(text).as("whitespace_ratio"),
    meanTokenLength(text).as("mean_token_len"),
    stopwordRatio(text).as("stopword_ratio"),
    // NOTE: the expression forms re-evaluate the tokenize subtree per
    // feature (HOF bodies get no CSE) — fine for one-off feature frames;
    // the measured hot path for corpus-wide language ID is the
    // mapPartitions languageIdCounts, not this convenience projection
    languageId(text).as("lang_id"),
    fingerprint(text).as("fingerprint"),
    qualityScore(text).as("quality_score"))

  def withFeatures(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*") +: featureColumns(col(textCol)): _*)

  // -- benchmark decontamination --------------------------------------------
  // Test-set contamination removal by token n-gram overlap — the GPT-3 /
  // Dolma convention (default n = 13): a training document is contaminated
  // when it contains any n-token sequence that also appears in a held-out
  // probe set. Token n-grams over single-space-normalized lowercase text
  // make "contains the n-gram" EXACTLY substring containment of the
  // space-padded normalized text, which is what the oracle checks.

  /** Per-document contamination matches: one row per contaminated document
    * with `matched_ngrams` = the number of DISTINCT probe n-grams it
    * contains. Documents with zero matches are absent.
    *
    * 100 TB plan shape: the probe side (a benchmark suite: thousands of
    * n-grams, not billions) is aggregated to a distinct hash set and
    * BROADCAST — the corpus is scanned once, n-gram hashes are generated
    * map-side (narrow `explode`), the broadcast hash join filters
    * non-matches before anything shuffles, and only the surviving
    * (contaminated) rows reach the final tiny groupBy. The corpus itself
    * never shuffles and nothing is collected.
    *
    * Probes with fewer than `n` tokens carry no n-gram and are ignored —
    * match shorter phrases by lowering `n`, not by padding.
    */
  def contaminationMatches(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 13): DataFrame = {
    // both sides hash grams through the SAME token-hash construction, so
    // matching stays exact token-sequence equality (64-bit collision
    // class, as everywhere in the dedup family). The < n-token whole-text
    // fallback gram is filtered off the probe side — a short probe must
    // not match short corpus documents wholesale. Gram generation is one
    // imperative mapPartitions pass (the interpreted HOF string-gram form
    // was the measured scan hot spot: 4.0 -> ~2 s at sf0.1).
    val probeGrams = Dedup.gramHashRows(
      probes
        .where(size(normalizedTokens(col(probeTextCol))) >= n)
        .select(lit(0L).as("graft_pid"), col(probeTextCol)),
      "graft_pid", probeTextCol, n)
      .select(col("graft_gram"))
      .distinct()
    Dedup.gramHashRows(corpus, idCol, textCol, n)
      .join(broadcast(probeGrams), "graft_gram")
      .groupBy(idCol)
      .agg(countDistinct(col("graft_gram")).as("matched_ngrams"))
  }

  /** The distinct probe-side gram-hash set for decontamination — the
    * [[contaminationMatches]] probe side exposed for staged pipelines
    * (bloom prefilter, persisted probe states). Probes shorter than `n`
    * tokens are excluded (their whole-text fallback gram must not match
    * short documents wholesale).
    */
  def probeGramHashes(
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 13): DataFrame =
    Dedup.gramHashRows(
      probes
        .where(size(normalizedTokens(col(probeTextCol))) >= n)
        .select(lit(0L).as("graft_pid"), col(probeTextCol)),
      "graft_pid", probeTextCol, n)
      .select(col("graft_gram"))
      .distinct()

  /** Bloom-prefiltered contamination candidates — the decontamination
    * shape for probe sets too large to broadcast as a hash join: a
    * [[graft.sketch.Bloom]] bitset over the probe gram hashes (bits, not a
    * hash table — a 1B-gram benchmark suite fits in ~1.7 GB at 1% fpp
    * where its 8-byte hash set alone is 8 GB before join overhead) rides
    * into the corpus scan as a one-row broadcast, and `might_contain`
    * kills non-matching grams map-side at bitset-lookup cost. NO FALSE
    * NEGATIVES: the survivors are a guaranteed superset of the truly
    * matching (id, gram) rows, so an exact verify join on the (tiny)
    * candidate stream restores exactness — only candidates ever shuffle,
    * the corpus never does (same contract as [[contaminationMatches]],
    * cheaper map side at large probe scale).
    */
  def bloomGramFilter(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probeGrams: DataFrame,
      n: Int = 13,
      estimatedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = graft.sketch.Bloom.build(
      probeGrams, col("graft_gram"), estimatedItems, fpp)
    Dedup.gramHashRows(corpus, idCol, textCol, n)
      .where(graft.sketch.Bloom.mightContainCol(bloom)(col("graft_gram")))
      .select(col(idCol), col("graft_gram"))
  }

  /** [[contaminationMatches]] semantics through the bloom prefilter:
    * identical output (the exact verify join removes every bloom false
    * positive), different scale envelope (see [[bloomGramFilter]]). The
    * verify join is NOT broadcast-hinted: at production probe scale the
    * probe gram table shuffles once at its own size and only bloom
    * survivors shuffle from the corpus side; AQE still picks broadcast
    * when the probe side is small.
    */
  def bloomContaminationMatches(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 13,
      estimatedItems: Long = 1000000L): DataFrame = {
    val probeGrams = probeGramHashes(probes, probeTextCol, n)
    bloomGramFilter(corpus, idCol, textCol, probeGrams, n, estimatedItems)
      .join(probeGrams, "graft_gram")
      .groupBy(idCol)
      .agg(countDistinct(col("graft_gram")).as("matched_ngrams"))
  }

  /** SPAN-level decontamination — the surgical alternative to dropping
    * contaminated documents ([[decontaminate]]): every n-token span of a
    * document that matches a probe n-gram is removed (overlapping spans
    * merge), the rest of the document survives — the C4-style "cut the
    * benchmark sentence, keep the page" behavior that preserves corpus
    * mass when probes are short relative to documents. Output is the
    * [[Dedup.exactSubstringDedup]] contract: one row per document with
    * `total_tokens`, `removed_tokens`, `kept_text` (normalized surviving
    * tokens).
    *
    * Scale shape: the positional gram stream (one slim row per token
    * position) dies in the broadcast join against the probe gram set —
    * only matching (id, pos) rows shuffle to the per-doc interval
    * assembly, whose state is bounded by each document's own token
    * count. The corpus never shuffles its text; reconstruction is one
    * linear walk per document.
    */
  def removeContaminatedSpans(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 13): DataFrame = {
    val probeGrams = probeGramHashes(probes, probeTextCol, n)
    val starts = Dedup.posGramHashRows(corpus, idCol, textCol, n)
      .join(broadcast(probeGrams), "graft_gram")
      .select(col(idCol), col("graft_pos"))
    Dedup.removeSpansAt(corpus, idCol, textCol, starts, n)
  }

  /** Per-PROBE contamination report: which benchmark items leak into the
    * corpus, not just which documents are contaminated — the view a
    * benchmark owner needs. One row per probe with at least one hit:
    * (`probeIdCol`, contaminated_docs, matched_pairs) where
    * `matched_pairs` counts distinct (document, probe-gram) matches.
    *
    * Same 100 TB plan shape as [[contaminationMatches]]: probe grams
    * (keyed by probe id) broadcast, the corpus gram stream generated in
    * one imperative mapPartitions pass, non-matches die in the broadcast
    * hash join, and only surviving match rows reach the tiny per-probe
    * groupBy. Probes shorter than `n` tokens are excluded (their
    * whole-text fallback gram must not match short documents wholesale).
    */
  def contaminationReport(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTextCol: String,
      n: Int = 13): DataFrame = {
    require(probeIdCol != idCol,
      s"probe id column must differ from corpus id column ($idCol)")
    val probeGrams = Dedup.gramHashRows(
      probes.where(size(normalizedTokens(col(probeTextCol))) >= n),
      probeIdCol, probeTextCol, n)
    Dedup.gramHashRows(corpus, idCol, textCol, n)
      .join(broadcast(probeGrams), "graft_gram")
      .groupBy(col(probeIdCol))
      .agg(
        countDistinct(col(idCol)).as("contaminated_docs"),
        count(lit(1)).as("matched_pairs"))
  }

  /** The decontaminated corpus: every row of `corpus` whose text shares no
    * token `n`-gram with the probe set. Left-anti against the
    * contaminated-id side — usually tiny, so AQE picks a broadcast anti
    * join at runtime; no explicit hint because a pathologically broad
    * probe set can contaminate an unbounded fraction of the corpus, and
    * forcing a broadcast there would OOM the driver exactly when the
    * sort-merge fallback is needed.
    */
  def decontaminate(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeTextCol: String,
      n: Int = 13): DataFrame =
    corpus.join(
      contaminationMatches(corpus, idCol, textCol, probes, probeTextCol, n)
        .select(idCol),
      Seq(idCol), "left_anti")

  // -- persisted per-shard gram-bloom states (release contamination) --------

  /** Per-SHARD n-gram Bloom states — the persisted-index direction of
    * [[bloomGramFilter]] (which blooms the PROBES and rescans the
    * corpus): the release is reduced ONCE, at ship time, to one bloom
    * bitset per shard over its documents' token n-gram hashes, and every
    * later "is eval suite X leaking into this release, and into which
    * shards" audit runs against the KB-per-shard state table alone — the
    * same two-stage discipline as the manifest family (diff names
    * shards, drillDown reads only those): the bloom stage names
    * candidate (shard, suite) pairs with NO FALSE NEGATIVES, and the
    * exact gram join then reads only flagged shards. Bitset OR is a
    * commutative monoid (same-parameter states merge by element-wise
    * OR), so per-batch states fold like every other persisted family.
    *
    * Scale shape: one gram pass (the [[Dedup.gramHashRows]] machinery —
    * no gram string is ever built), map-side partial bloom buffers, one
    * K-row shuffle (K = shards); the state is `bits/8` bytes per shard
    * regardless of corpus size.
    */
  def shardGramBloomStates(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int,
      bitsPerShard: Int,
      numHashes: Int,
      n: Int = 13,
      seed: Int = 42): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val agg = udaf(
      new graft.sketch.Bloom.BloomAggregator(bitsPerShard, numHashes, seed),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[java.lang.Long]())
    Dedup.gramHashRows(
        corpus.where(col(idCol).isNotNull), idCol, textCol, n)
      .groupBy(pmod(col(idCol), lit(shards)).as("shard"))
      .agg(
        count(lit(1)).as("n_gram_rows"),
        agg(col("graft_gram")).as("bloom_bits"))
  }

  /** Read-time fold for [[shardGramBloomStates]] parts: per shard,
    * gram-row counts add and same-parameter bitsets OR — the bloom
    * monoid, so per-micro-batch states staged by a streaming ingest
    * ([[graft.streaming.StreamingOps.SketchStateIngest]] with
    * `shardGramBloomStates(batch, …)` as the batch state) fold to
    * BYTE-FOR-BYTE the one-shot whole-release state: the bitset is a
    * pure function of the key set (OR over any partition of the rows
    * lands the same bits), so equality here is exact, not approximate.
    * The bitset lane is additionally IDEMPOTENT (a ∨ a = a) — only the
    * count lane relies on the replay-overwrite / supersession-manifest
    * machinery.
    */
  def foldShardGramBlooms(parts: DataFrame): DataFrame = {
    val orWords = udaf(new graft.sketch.Bloom.OrWordsAggregator(),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Long]]())
    parts.groupBy(col("shard"))
      .agg(
        sum(col("n_gram_rows")).cast(LongType).as("n_gram_rows"),
        orWords(col("bloom_bits")).as("bloom_bits"))
  }

  /** The states-only candidate matrix: for every (shard, suite) pair,
    * how many of the suite's probe-gram hashes the shard's bloom admits.
    * `cand_hits > 0` flags the pair for exact verification; a truly
    * contaminated pair is ALWAYS flagged (bloom guarantee), a flagged
    * pair may be clean (bounded false-positive rate). The corpus is
    * never touched — input is the K-row state table and the broadcast
    * suite gram lists (eval suites are KBs).
    */
  def shardContaminationCandidates(
      states: DataFrame,
      suiteGrams: Seq[(Long, Seq[Long])],
      bitsPerShard: Int,
      numHashes: Int,
      seed: Int = 42): DataFrame = {
    require(suiteGrams.nonEmpty, "need at least one suite")
    val hits = udf((words: Seq[Long], grams: Seq[Long]) => {
      val f = graft.sketch.Bloom.BloomFilter(
        bitsPerShard, numHashes, seed, words.toArray)
      grams.count(f.mightContain).toLong
    })
    states
      .withColumn("graft_suite", explode(typedLit(suiteGrams)))
      .select(col("shard"),
        col("graft_suite._1").as("suite"),
        hits(col("bloom_bits"), col("graft_suite._2")).as("cand_hits"))
  }

  /** The exact (shard, suite) contamination census — stage two of the
    * audit, run over ONLY the shards the candidate matrix flagged
    * (restrict `corpus` before calling; at 100 TB with the
    * [[DatasetManifest.writeSharded]] layout the un-flagged shards'
    * bytes are never read). Per pair: distinct matched suite grams and
    * distinct contaminated documents.
    */
  def shardContaminationCensus(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      suiteGrams: DataFrame,
      suiteCol: String,
      shards: Int,
      n: Int = 13): DataFrame =
    Dedup.gramHashRows(
        corpus.where(col(idCol).isNotNull), idCol, textCol, n)
      .join(broadcast(suiteGrams), "graft_gram")
      .groupBy(pmod(col(idCol), lit(shards)).as("shard"), col(suiteCol))
      .agg(
        countDistinct(col("graft_gram")).as("matched_grams"),
        countDistinct(col(idCol)).as("contaminated_docs"))

  // -- TF-IDF keyword extraction --------------------------------------------
  // Corpus-level term weighting over the canonical lowercase-whitespace
  // tokens: tf(d, t) = occurrences of t in d, df(t) = documents containing
  // t, idf = ln((N + 1) / (df + 1)) + 1 (the smoothed scikit-learn
  // convention — never negative, never a division by zero), score =
  // tf * idf. Used for per-document keyword extraction and corpus
  // vocabulary profiling.

  /** (idCol, term, tf) — one row per distinct (document, term): a narrow
    * map-side `explode` of the token array into ONE groupBy exchange with
    * map-side partial counts. Null-id rows are dropped; empty/null text
    * contributes nothing.
    */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(col(idCol), explode(normalizedTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document top-`k` terms by TF-IDF: (idCol, term, tf, df, score,
    * rank), rank 1..k ordered by score descending with an ascending-term
    * tie-break (so the result is a pure function of the data — ties in
    * (tf, df) are common and MUST not be left to partition order).
    *
    * 100 TB plan shape: the corpus is tokenized EXACTLY ONCE — the
    * (doc, term) counts shuffle once on their grouping key, and document
    * frequencies come from a count-over-window partitioned by term on
    * that same frame (one slim exchange carrying one long per distinct
    * (doc, term); per-partition window state is a single count). The
    * earlier dfreq-join formulation re-evaluated the whole
    * tokenize→explode→count subtree on both join sides whenever exchange
    * reuse didn't kick in — ~3× the scan cost, found by the whale-doc
    * scale probe. The ranking window partitions BY DOCUMENT — bounded
    * per-partition state (one doc's vocabulary), never a global sort. `n`
    * (document count) is a cheap non-tokenizing `\S` scan; pass
    * `totalDocs` when the caller already knows it to keep the operator to
    * a single job.
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 10,
      totalDocs: Long = -1L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = termFrequencies(df, idCol, textCol)
    val n =
      if (totalDocs >= 0) totalDocs
      // "has at least one token" without building the token array: any
      // non-whitespace character ⇔ split-then-filter yields ≥ 1 token
      else df.where(col(idCol).isNotNull &&
        col(textCol).rlike("\\S")).count()
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(wTerm))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * (log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0)))
          + lit(1.0))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // -- C4-style heuristic corpus cleaning -----------------------------------
  // Line- and document-level quality rules from the public C4 recipe
  // (Raffel et al. 2020, "Exploring the Limits of Transfer Learning with a
  // Unified Text-to-Text Transformer", section 2.2): keep only lines that
  // end in a terminal punctuation mark, carry at least `minWordsPerLine`
  // words and contain no blocklisted token; then drop documents with fewer
  // than `minLinesPerDoc` surviving lines, any document-blocklist phrase
  // ("lorem ipsum"), or a curly brace (the paper's code-page marker).

  /** Kept lines of `text` under the C4 line rules, as an array column.
    * Pure codegen HOFs (split / transform / filter / size) — zero shuffles,
    * zero UDFs; cost is one pass over the characters, so the operator
    * scales with the scan and pipelines into any downstream aggregation.
    */
  def c4KeptLines(
      text: Column,
      minWordsPerLine: Int = 5,
      lineBlocklist: Seq[String] = Seq("javascript")): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    filter(lines, l => {
      val keep = l.rlike("[.!?\"]$") && (size(tokens(l)) >= minWordsPerLine)
      lineBlocklist.foldLeft(keep)((acc, w) =>
        acc && !lower(l).contains(w.toLowerCase))
    })
  }

  /** Document-level C4 cleaning: one row per input document with the
    * surviving lines reassembled and the keep/drop verdict.
    *
    * Output columns: `idCol`, `text_clean` (kept lines joined by '\n'),
    * `n_lines` (non-empty input lines), `n_kept`, `kept` (boolean — at
    * least `minLinesPerDoc` surviving lines, no `docBlocklist` phrase in
    * the ORIGINAL lowercased text, and no curly brace when `dropBraces`).
    *
    * 100 TB plan shape: entirely map-side — every rule is a per-row
    * expression, nothing shuffles, and callers filtering on `kept` push
    * the predicate into the same scan pass.
    */
  def c4Clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWordsPerLine: Int = 5,
      minLinesPerDoc: Int = 3,
      lineBlocklist: Seq[String] = Seq("javascript"),
      docBlocklist: Seq[String] = Seq("lorem ipsum"),
      dropBraces: Boolean = true): DataFrame = {
    // null text behaves as empty (0 lines, dropped) instead of poisoning
    // the counts with null-propagating size(null)
    val text = coalesce(col(textCol), lit(""))
    val keptLines = c4KeptLines(text, minWordsPerLine, lineBlocklist)
    val nLines = size(filter(transform(split(text, "\n"),
      l => trim(l)), l => length(l) > 0))
    val blockedDoc = {
      val phraseHit = docBlocklist.foldLeft(lit(false))((acc, p) =>
        acc || lower(text).contains(p.toLowerCase))
      if (dropBraces) phraseHit || text.contains("{") else phraseHit
    }
    df.select(
      col(idCol),
      array_join(keptLines, "\n").as("text_clean"),
      nLines.as("n_lines"),
      size(keptLines).as("n_kept"),
      (size(keptLines) >= minLinesPerDoc && !blockedDoc).as("kept"))
  }

  // -- Unigram LM quality scoring (CCNet-style) -----------------------------
  // CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  // Datasets from Web Crawl Data") buckets documents by language-model
  // perplexity. The distributable simplification here trains the model ON
  // the corpus itself: a Laplace-smoothed unigram LM
  //   p(t) = (c(t) + 1) / (T + V)
  // (c(t) = corpus count of term t, T = total tokens, V = vocabulary size)
  // and scores each document by its per-token cross-entropy
  //   H(d) = -(1/|d|) * sum_t tf(d,t) * ln p(t).
  // Low H = the document looks like the corpus; high H = rare-token salad.

  /** Per-document cross-entropy under the corpus unigram LM:
    * (`idCol`, n_tokens, nll, cross_entropy, perplexity).
    *
    * 100 TB plan shape: the corpus is tokenized EXACTLY ONCE into the
    * (doc, term, tf) frame, which is persisted (it is orders of magnitude
    * slimmer than the text); corpus term counts come from a
    * count-over-window partitioned by term on that same frame (one slim
    * exchange — the q56 whale-probe lesson: a dfreq self-join re-tokenizes
    * both sides when exchange reuse misses), the two model scalars (T, V)
    * are a bounded driver aggregate over it, and the per-document rollup
    * is the second and final exchange, on the grouping id. The returned
    * frame releases the persisted tf via [[CacheLifecycle.releaseOnConsume]].
    */
  def unigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    unigramCrossEntropy(df, idCol, textCol, None)

  /** As above, with the composition-fusion hook: `precomputedTf` (when
    * set) must be a CALLER-PERSISTED frame equal to
    * `termFrequencies(df, idCol, textCol)` — a pipeline that already
    * tokenized the same text (q96: NB scoring + LM ranking over one
    * corpus) passes it so the corpus is tokenized once for the whole
    * chain. The caller owns that cache's lifecycle.
    */
  def unigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      precomputedTf: Option[DataFrame]): DataFrame = {
    val owned = precomputedTf.isEmpty
    val tf = precomputedTf.getOrElse(termFrequencies(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // T (total tokens) and V (vocabulary) fold into the plan as a
    // broadcast 1-row aggregate instead of a driver collect: the scorer
    // is then FULLY LAZY — zero actions of its own — so a composing
    // caller (perplexityBuckets → groupedNtile, the q83/q96 chain) pays
    // tokenize + window + rollup in ONE materializing job rather than a
    // separate totals round-trip first. log() here is the same
    // java.lang.Math.log the driver-side fold used — values identical.
    val totals = tf.agg(
      coalesce(sum(col("tf")), lit(0L)).as("graft_t"),
      countDistinct(col("term")).as("graft_v"))
    val logZ = log(greatest(
      (col("graft_t") + col("graft_v")).cast(DoubleType), lit(1.0)))
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val perDoc = tf
      .withColumn("graft_c", sum(col("tf")).over(wTerm))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(-col("tf") * (log(col("graft_c") + 1.0) - logZ)).as("nll"))
      .withColumn("cross_entropy", col("nll") / col("n_tokens"))
      .withColumn("perplexity", exp(col("cross_entropy")))
    if (owned) CacheLifecycle.releaseOnConsume(perDoc, Seq(tf)) else perDoc
  }

  /** Collapse runs of consecutive IDENTICAL lines to one occurrence —
    * the within-document twin of corpus-level paragraph dedup: repeated
    * navigation rows, table borders, and scraper stutter appear as
    * adjacent duplicate lines and survive every cross-document pass.
    * Pure narrow expressions (split + shifted-array zip) — map-side, no
    * shuffle, composes into any pipeline stage. Null text collapses to
    * the empty string.
    */
  // prev(i) = line(i-1) with a null sentinel at i = 0: comparing each
  // line against a SHIFTED COPY of the array keeps the lambda body
  // element-local — referencing the split array inside the lambda would
  // re-evaluate the whole split() per element (HOF bodies get no
  // common-subexpression elimination), turning a 10k-line document into
  // O(lines × text-length)
  private def shiftedLines(ls: Column): Column =
    concat(array(lit(null).cast(StringType)),
      slice(ls, lit(1), greatest(size(ls) - 1, lit(0))))

  def collapseAdjacentLines(text: Column): Column = {
    val ls = split(coalesce(text, lit("")), "\n")
    // a dropped line maps to null (split output itself is never null)
    concat_ws("\n", filter(
      zip_with(ls, shiftedLines(ls),
        (c, p) => when(c <=> p, lit(null).cast(StringType)).otherwise(c)),
      x => x.isNotNull))
  }

  /** How many lines [[collapseAdjacentLines]] would drop. */
  def adjacentDuplicateLineCount(text: Column): Column = {
    val ls = split(coalesce(text, lit("")), "\n")
    size(filter(zip_with(ls, shiftedLines(ls), (c, p) => c <=> p), b => b))
  }

  /** Corpus vocabulary statistics: token total, vocabulary size, hapax
    * legomena count, and the probability-mass share of the top-k most
    * frequent tokens for each k in `topK` — the Zipf-shape health check
    * of a training corpus (a top-100 share far off its expected band
    * signals boilerplate flooding or a broken tokenizer upstream).
    *
    * Output: ONE row — (total_tokens, vocab_size, hapax_count,
    * top<k>_share...). Shares are tie-insensitive: equal counts straddling
    * the rank-k boundary contribute the same sum whichever terms rank in.
    *
    * Scale shape: one tokenize scan into a map-side-combinable
    * groupBy(term); the scalar aggregate and the top-max(k) selection
    * (TakeOrdered — per-partition heaps, no global sort) are the only
    * actions, collecting max(k) rows and three longs to the driver.
    */
  def vocabularyStats(
      df: DataFrame,
      textCol: String,
      topK: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(topK.nonEmpty && topK.forall(_ > 0), "topK must be positive")
    val counts = df.select(explode(normalizedTokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = counts.agg(sum(col("n")), count(lit(1)),
      sum(when(col("n") === 1, 1L).otherwise(0L))).collect().head
    val total = if (a.isNullAt(0)) 0L else a.getLong(0)
    val vocab = a.getLong(1)
    val hapax = if (a.isNullAt(2)) 0L else a.getLong(2)
    val top = counts.orderBy(col("n").desc, col("term"))
      .limit(topK.max).collect().map(_.getLong(1))
    counts.unpersist(blocking = false)
    val spark = df.sparkSession
    import spark.implicits._
    val shares = topK.sorted.map { k =>
      val share = if (total == 0L) 0.0 else top.take(k).sum.toDouble / total
      s"top${k}_share" -> share
    }
    val base = Seq((total, vocab, hapax)).toDF(
      "total_tokens", "vocab_size", "hapax_count")
    shares.foldLeft(base) { case (acc, (name, v)) =>
      acc.withColumn(name, lit(v))
    }
  }

  /** Cross-group verbatim-overlap matrix: for every pair of groups
    * (sources, domains, snapshots, shards), how many DISTINCT token
    * `n`-grams they share — the provenance-leakage view of the q49/q62
    * contamination machinery, answering "which sources copy from each
    * other" before any pairwise dedup is attempted. Documents with fewer
    * than `n` tokens contribute nothing (no whole-text fallback).
    *
    * Output: (group_a, group_b, shared_grams) with group_a < group_b,
    * counting distinct shared grams once per pair.
    *
    * 100 TB plan shape: the gram stream reduces to DISTINCT (group, gram)
    * rows in one map-side-combinable exchange; the pair fan-out is a
    * self-join on the gram key whose per-gram output is bounded by
    * `maxGroupsPerGram`² — a ubiquitous boilerplate gram present in more
    * groups than the cap is EXCLUDED (observed on the
    * [[Dedup.DedupCapObservation]] channel) instead of exploding
    * quadratically in the number of groups. Group cardinality is assumed
    * catalog-sized (sources, not documents).
    */
  def crossSourceOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 13,
      maxGroupsPerGram: Int = 256): DataFrame = {
    // de-windowed: the per-gram group count is a map-side-combinable
    // groupBy (never a WindowExec sorting a hot gram's partition); hot
    // grams — typically a handful, AQE-broadcastable — anti-join the
    // distinct rows out. Exclusion here is all-or-nothing per gram, so
    // no threshold machinery is needed.
    val distinctRows = Dedup
      .gramHashRows(df, groupCol, textCol, n, shortDocFallback = false)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hotGrams = distinctRows.groupBy(col("graft_gram"))
      .agg(count(lit(1)).as("graft_gn"))
      .observe(Dedup.DedupCapObservation.nextName(),
        coalesce(
          sum(when(col("graft_gn") > maxGroupsPerGram, col("graft_gn"))),
          lit(0L)).as("excluded_rows"),
        coalesce(sum(col("graft_gn")), lit(0L)).as("banded_rows"))
      .where(col("graft_gn") > maxGroupsPerGram)
      .select(col("graft_gram"))
    val capped = distinctRows
      .join(hotGrams, Seq("graft_gram"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = capped.select(col(groupCol).as("group_a"), col("graft_gram"))
    val b = capped.select(col(groupCol).as("group_b"), col("graft_gram"))
    val out = a.join(b, Seq("graft_gram"))
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("shared_grams"))
    CacheLifecycle.releaseOnConsume(out, Seq(capped, distinctRows))
  }

  /** Corpus distribution drift between two snapshots — did this month's
    * crawl change what the model will read? Both sides' unigram
    * distributions are Laplace-smoothed over the JOINT vocabulary
    * (`p_t = (c_t + α) / (T + αV)` — proper distributions by
    * construction, so the divergences are exact, not heuristic), and the
    * returned single row carries `v_joint`, both token totals, and
    * `kl` (KL(new‖old) — the retraining-pressure direction), `js`
    * (Jensen-Shannon, symmetric and bounded by ln 2), `tvd` (total
    * variation, the L1 view). Complements [[graft.sketch]] Distance
    * (per-column categorical drift) at corpus-text level and
    * [[Dedup.corpusDiff]] (per-document identity diff).
    *
    * 100 TB plan shape: each side tokenizes ONCE into
    * map-side-combinable (term, count) rollups; the only join is a full
    * outer on the term key — vocabulary-sized, never the corpus — and
    * the divergences are one aggregate over that slim joined frame
    * (totals come off the same persisted frame first; two actions
    * total).
    */
  def corpusDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    def termCounts(df: DataFrame, name: String) =
      termFrequencies(df, idCol, textCol)
        .groupBy(col("term")).agg(sum(col("tf")).as(name))
    val joined = termCounts(oldDf, "graft_c1")
      .join(termCounts(newDf, "graft_c2"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("graft_c1"), lit(0L)).as("graft_c1"),
        coalesce(col("graft_c2"), lit(0L)).as("graft_c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tot = joined
        .agg(count(lit(1)), sum(col("graft_c1")), sum(col("graft_c2")))
        .collect().head
      val v = tot.getLong(0)
      val t1 = if (tot.isNullAt(1)) 0L else tot.getLong(1)
      val t2 = if (tot.isNullAt(2)) 0L else tot.getLong(2)
      val dOld = lit(t1 + alpha * v)
      val dNew = lit(t2 + alpha * v)
      val p = (col("graft_c2") + lit(alpha)) / dNew // new side
      val q = (col("graft_c1") + lit(alpha)) / dOld // old side
      val m = (p + q) / lit(2.0)
      val out = joined
        .agg(
          sum(p * log(p / q)).as("kl"),
          sum(p * log(p / m) / lit(2.0) + q * log(q / m) / lit(2.0))
            .as("js"),
          (sum(abs(p - q)) / lit(2.0)).as("tvd"))
        .select(
          lit(v).as("v_joint"), lit(t1).as("tokens_old"),
          lit(t2).as("tokens_new"),
          col("kl"), col("js"), col("tvd"))
      // one-row result: materialize before releasing the joined cache so
      // the caller's consumption doesn't re-run both term-count scans
      val row = out.collect()
      oldDf.sparkSession.createDataFrame(
        java.util.Arrays.asList(row: _*), out.schema)
    } finally {
      joined.unpersist(blocking = false)
      ()
    }
  }

  /** Cross-document boilerplate line removal — the RefinedWeb/CCNet rule
    * that kills repeated headers, footers, nav bars and cookie banners:
    * a line appearing in at least `maxDocFrac` of a group's documents
    * (and at least `minDocs` of them — small groups can't convict) is
    * boilerplate and is removed from EVERY document of that group.
    * Groups are typically domains ([[Domains.urlHost]]) — boilerplate is
    * a per-site phenomenon. Contrast [[collapseAdjacentLines]] (within
    * one doc) and [[c4KeptLines]] (content-free lines by shape).
    *
    * Line identity is the exact line string (split on `\n`); blank lines
    * are never candidates. Null-id rows are dropped; null-text rows pass
    * through (removed = 0).
    *
    * 100 TB plan shape: ONE posexplode of the corpus into slim
    * (id, group, pos, line-hash) rows; document frequencies are two
    * map-side-combinable groupBys (distinct doc per (group, line), then
    * count) against a group-cardinality-sized doc census; the removal
    * join ships line HASHES on a (group, hash) key — boilerplate by
    * definition concentrates into few distinct lines, and the partial
    * aggregate collapses each hot (group, line) per map partition.
    * Reassembly groups by document with per-doc-bounded state (one doc's
    * lines), never a corpus-wide window.
    *
    * Returns `idCol`, `groupCol`, cleaned `text`, and `removed_lines`.
    */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      maxDocFrac: Double = 0.5,
      minDocs: Int = 5): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1,
      s"maxDocFrac must be in (0, 1], got $maxDocFrac")
    val base = df.where(col(idCol).isNotNull)
    val withText = base.where(col(textCol).isNotNull)
    val lines = withText.select(
      col(idCol), col(groupCol),
      posexplode(split(col(textCol), "\n")).as(Seq("graft_pos", "graft_line")))
      .withColumn("graft_lh", xxhash64(col("graft_line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-group doc counts from the PERSISTED lines frame, not a second
    // corpus scan: posexplode(split(text, "\n")) emits at least one row
    // per non-null-text document (split never returns an empty array),
    // so the distinct (group, id) set of `lines` IS withText's doc set
    val groupDocs = lines.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("graft_gd"))
    val boiler = lines
      .where(trim(col("graft_line")) =!= "")
      .select(col(groupCol), col("graft_lh"), col(idCol)).distinct()
      .groupBy(col(groupCol), col("graft_lh"))
      .agg(count(lit(1)).as("graft_ld"))
      .join(groupDocs, Seq(groupCol))
      .where(col("graft_ld") >= minDocs &&
        col("graft_ld").cast(DoubleType) >=
          lit(maxDocFrac) * col("graft_gd").cast(DoubleType))
      .select(col(groupCol), col("graft_lh"),
        lit(true).as("graft_boiler"))
    val marked = lines
      .join(boiler, Seq(groupCol, "graft_lh"), "left_outer")
    val rebuilt = marked
      .groupBy(col(idCol), col(groupCol))
      .agg(
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(
                col("graft_pos"),
                coalesce(col("graft_boiler"), lit(false)).as("graft_b"),
                col("graft_line")))),
              s => !s.getField("graft_b")),
            s => s.getField("graft_line")), "\n").as("text"),
        coalesce(sum(when(col("graft_boiler"), 1L)), lit(0L))
          .as("removed_lines"))
    val out = rebuilt.unionByName(
      base.where(col(textCol).isNull)
        .select(col(idCol), col(groupCol),
          lit(null).cast(StringType).as("text"),
          lit(0L).as("removed_lines")))
    CacheLifecycle.releaseOnConsume(out, Seq(lines))
  }

  /** Corpus novelty curve — how much NEW content each group (crawl dump,
    * snapshot date, source) contributes: per group, its distinct n-grams
    * and the subset first seen in that group, where "first" follows the
    * groups' natural ascending order (dump ids and dates sort
    * chronologically; the FineWeb/RefinedWeb ablation that decides
    * whether ingesting the next dump is worth it). `novelty` =
    * novel/distinct — 1.0 for the first group, falling toward 0 as the
    * corpus saturates.
    *
    * 100 TB plan shape: one imperative gram-hash scan (the
    * [[Dedup.gramHashRows]] machinery — no gram string is ever built)
    * feeding a distinct on slim (group, hash) rows; first-seen is a
    * map-side-combinable min over the hash key, and both rollups are
    * group-cardinality-sized. Short docs (< n tokens) contribute
    * nothing, matching the q66 shingle convention.
    */
  def noveltyCurve(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    val grams = Dedup
      .gramHashRows(df.where(col(groupCol).isNotNull), groupCol, textCol,
        n, shortDocFallback = false)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perGroup = grams.groupBy(col(groupCol))
      .agg(count(lit(1)).as("distinct_grams"))
    val novel = grams.groupBy(col("graft_gram"))
      .agg(min(col(groupCol)).as(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("novel_grams"))
    val out = perGroup.join(novel, Seq(groupCol), "left_outer")
      .select(
        col(groupCol),
        col("distinct_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        (coalesce(col("novel_grams"), lit(0L)).cast(DoubleType) /
          col("distinct_grams").cast(DoubleType)).as("novelty"))
    CacheLifecycle.releaseOnConsume(out, Seq(grams))
  }

  /** Corpus-level PMI collocations (Church & Hanks 1990): every adjacent
    * token pair seen at least `minCount` times, scored with pointwise
    * mutual information over the bigram corpus —
    * `pmi = ln(c(w1,w2) · B / (c(w1·) · c(·w2)))` with B the total bigram
    * count and the marginals counted as bigram head / tail slots. High
    * PMI surfaces multi-word expressions and domain jargon; strongly
    * NEGATIVE PMI over a large corpus is a tokenization-health signal
    * (pairs glued together far less often than chance).
    *
    * Output: (w1, w2, pair_count, pmi), unordered — callers rank.
    *
    * 100 TB plan shape: one tokenize scan feeding ONE map-side-combinable
    * groupBy(w1, w2) exchange; both marginals come from window sums over
    * that same slim pair-count frame (two exchanges carrying one row per
    * DISTINCT pair, never the corpus; per-key window state is one long —
    * a stopword head like "the" partitions by its distinct continuations,
    * bounded by vocabulary, not occurrences), and B is a bounded driver
    * aggregate. No joins, no second scan.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5): DataFrame = {
    val toks = normalizedTokens(col(textCol))
    val pairs = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val pc = df.select(explode(pairs).as("graft_bg"))
      .select(col("graft_bg.w1").as("w1"), col("graft_bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_count"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = pc.agg(sum(col("pair_count"))).collect().head match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val wHead = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wTail = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val out = pc
      .withColumn("graft_h", sum(col("pair_count")).over(wHead))
      .withColumn("graft_t", sum(col("pair_count")).over(wTail))
      .where(col("pair_count") >= minCount)
      .withColumn("pmi",
        log(col("pair_count").cast(DoubleType) * lit(b.toDouble) /
          (col("graft_h").cast(DoubleType) * col("graft_t").cast(DoubleType))))
      .select(col("w1"), col("w2"), col("pair_count"), col("pmi"))
    CacheLifecycle.releaseOnConsume(out, Seq(pc))
  }

  /** Per-document cross-entropy under a Jelinek-Mercer INTERPOLATED
    * language model — `p(w2|w1) = λ·p_bi(w2|w1) + (1−λ)·p_uni(w2)` with
    * Laplace-smoothed components (`p_bi = (c(w1,w2)+1)/(c(w1·)+V_head)`,
    * `p_uni = (c(·w2)+1)/(B+V_tail)`, marginals counted on bigram slots) —
    * the smoothing step between [[unigramCrossEntropy]] and a full
    * KenLM-style backoff: a rare continuation of a common head is no
    * longer scored as if the unigram evidence did not exist. Documents
    * with < 2 tokens are absent from the output.
    *
    * 100 TB plan shape: the q58/q60 machinery — ONE tokenize pass into
    * the persisted slim (doc, w1, w2, tf) frame; pair, head, and tail
    * counts are THREE count-over-window passes on that same frame (slim
    * exchanges carrying one long per distinct (doc, bigram); never a
    * re-tokenize or self-join), the three model scalars one bounded
    * driver agg, the per-document rollup the final exchange.
    */
  def interpolatedCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val bf = bigramFrequencies(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = bf.agg(countDistinct(col("w1")), countDistinct(col("w2")),
      sum(col("tf"))).collect().head
    val vHead = g.getLong(0)
    val vTail = g.getLong(1)
    val b = if (g.isNullAt(2)) 0L else g.getLong(2)
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"), col("w2"))
    val wHead = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wTail = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val perDoc = bf
      .withColumn("graft_c12", sum(col("tf")).over(wPair))
      .withColumn("graft_ch", sum(col("tf")).over(wHead))
      .withColumn("graft_ct", sum(col("tf")).over(wTail))
      .withColumn("graft_p",
        lit(lambda) *
          ((col("graft_c12") + lit(1L)).cast(DoubleType) /
            (col("graft_ch") + lit(vHead)).cast(DoubleType)) +
        lit(1.0 - lambda) *
          ((col("graft_ct") + lit(1L)).cast(DoubleType) /
            lit((b + vTail).toDouble)))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(-col("tf") * log(col("graft_p"))).as("nll"))
      .withColumn("cross_entropy", col("nll") / col("n_bigrams"))
    CacheLifecycle.releaseOnConsume(perDoc, Seq(bf))
  }

  /** (idCol, w1, w2, tf) — one row per distinct (document, adjacent token
    * pair): the bigram twin of [[termFrequencies]]. Pair construction is a
    * narrow zip of the token array with its own tail (pure codegen HOFs),
    * exploded into ONE groupBy exchange with map-side partial counts.
    * Documents with fewer than two tokens contribute nothing.
    */
  def bigramFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = normalizedTokens(col(textCol))
    val pairs = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    df.where(col(idCol).isNotNull)
      .select(col(idCol), explode(pairs).as("graft_bg"))
      .select(col(idCol), col("graft_bg.w1").as("w1"), col("graft_bg.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-document cross-entropy under a corpus BIGRAM language model with
    * Laplace smoothing — `p(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)`
    * where `c(w1·)` counts w1 as a bigram head and V is the bigram-head
    * vocabulary: (`idCol`, n_bigrams, nll, cross_entropy). One step up
    * the n-gram ladder from [[unigramCrossEntropy]] toward CCNet's 5-gram
    * KenLM scoring; documents with < 2 tokens are absent from the output.
    *
    * 100 TB plan shape: ONE tokenize pass into the persisted slim
    * (doc, w1, w2, tf) frame; both model counts come from count-over-
    * window passes on that same frame — two slim exchanges carrying one
    * long per distinct (doc, bigram), never a re-tokenize or a self-join
    * (the q56 lesson); V is a bounded driver agg; the per-document
    * rollup is the final exchange.
    */
  def bigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val bf = bigramFrequencies(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = bf.agg(countDistinct(col("w1"))).collect().head.getLong(0)
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"), col("w2"))
    val wHead = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"))
    val perDoc = bf
      .withColumn("graft_cbg", sum(col("tf")).over(wPair))
      .withColumn("graft_ch", sum(col("tf")).over(wHead))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(-col("tf") * (log(col("graft_cbg") + 1.0)
          - log(col("graft_ch") + lit(v.toDouble)))).as("nll"))
      .withColumn("cross_entropy", col("nll") / col("n_bigrams"))
    CacheLifecycle.releaseOnConsume(perDoc, Seq(bf))
  }

  /** Per-document cross-entropy under an INTERPOLATED KNESER-NEY bigram
    * model (Kneser & Ney 1995; the Chen & Goodman 1998 interpolated form
    * with one absolute discount D) — the standard rung above
    * [[interpolatedCrossEntropy]]'s Jelinek-Mercer and what CCNet-style
    * KenLM scoring uses:
    *
    *   p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * where N1+(w1·) counts distinct continuations of w1, N1+(·w2)
    * distinct heads preceding w2 (the continuation probability: "how
    * novel are the contexts this word appears in", not raw frequency),
    * and N1+(··) the distinct bigram types. The model is trained on `df`
    * itself, so every scored bigram has c ≥ 1 and probabilities are
    * strictly positive for D < 1. Documents with < 2 tokens are absent.
    *
    * 100 TB plan shape: the q58/q60/q72 machinery — ONE tokenize pass
    * into the persisted slim (doc, w1, w2, tf) frame; pair totals, head
    * totals, and both continuation-type counts are count-over-window
    * passes on that same frame (the distinct-type counts ride a
    * row_number-flag sum, no countDistinct-over-window and no self-join);
    * N1+(··) is one bounded driver agg; the per-document rollup is the
    * final exchange.
    */
  def kneserNeyCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount >= 0.0 && discount < 1.0, "discount must be in [0, 1)")
    val bf = bigramFrequencies(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTypes = bf.agg(countDistinct(col("w1"), col("w2")))
      .collect().head.getLong(0)
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"), col("w2"))
    val wPairOrd = wPair.orderBy(col(idCol))
    val wHead = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val wTail = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val d = lit(discount)
    val perDoc = bf
      // one row per (doc, w1, w2): flag each PAIR's first row so summing
      // the flag over head/tail windows yields distinct-type counts
      .withColumn("graft_f",
        (row_number().over(wPairOrd) === 1).cast(LongType))
      .withColumn("graft_c12", sum(col("tf")).over(wPair))
      .withColumn("graft_ch", sum(col("tf")).over(wHead))
      .withColumn("graft_nfwd", sum(col("graft_f")).over(wHead))
      .withColumn("graft_ncont", sum(col("graft_f")).over(wTail))
      .withColumn("graft_p",
        greatest(col("graft_c12") - d, lit(0.0)) /
          col("graft_ch").cast(DoubleType) +
        d * col("graft_nfwd").cast(DoubleType) /
          col("graft_ch").cast(DoubleType) *
          (col("graft_ncont").cast(DoubleType) / lit(nTypes.toDouble)))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(-col("tf") * log(col("graft_p"))).as("nll"))
      .withColumn("cross_entropy", col("nll") / col("n_bigrams"))
    CacheLifecycle.releaseOnConsume(perDoc, Seq(bf))
  }

  /** (idCol, w1..wn, tf) — the order-`n` generalization of
    * [[bigramFrequencies]]: a narrow position-indexed zip of the token
    * array (pure codegen HOFs — `element_at` reads are O(1) per
    * position), exploded into ONE groupBy exchange with map-side partial
    * counts. Documents with fewer than `n` tokens contribute nothing.
    */
  def ngramFrequencies(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ws = (1 to n).map(i => s"w$i")
    // Tokenize ONCE into a materialized column below the Generate: an
    // expression referenced from inside a higher-order-function lambda is
    // re-evaluated on EVERY lambda invocation, so inlining the tokenizer
    // into element_at would re-split the whole document n times per
    // token position (measured 10-15 s at sf0.1 vs <1 s materialized).
    // CollapseProject keeps the projection: a non-cheap alias referenced
    // more than once is never inlined.
    val toks = col("graft_toks")
    val m = size(toks) - (n - 1)
    val structType = StructType(ws.map(StructField(_, StringType, nullable = true)))
    // sequence(1, x) runs DESCENDING when x < 1 — guard short docs
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), m),
        i => struct(ws.zipWithIndex.map { case (w, j) =>
          element_at(toks, i + j).as(w)
        }: _*)))
      .otherwise(array().cast(ArrayType(structType)))
    df.where(col(idCol).isNotNull)
      .select(col(idCol), normalizedTokens(col(textCol)).as("graft_toks"))
      .select(col(idCol), explode(grams).as("graft_ng"))
      .select(col(idCol) +: ws.map(w => col(s"graft_ng.$w").as(w)): _*)
      .groupBy((col(idCol) +: ws.map(col)): _*)
      .agg(count(lit(1)).as("tf"))
  }

  /** (idCol, w1, w2, w3, tf) — see [[ngramFrequencies]]. */
  def trigramFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ngramFrequencies(df, idCol, textCol, 3)

  /** Per-document cross-entropy under an INTERPOLATED KNESER-NEY model
    * of ORDER `order` — the general Chen & Goodman 1998 recursion with
    * one absolute discount D at every level, which at order 5 is the
    * actual CCNet/KenLM scorer shape:
    *
    *   p_n(w | ctx_n)  = max(c(g) − D, 0)/c(ctx_n)
    *                   + D·N1+(ctx_n ·)/c(ctx_n) · p_{n-1}
    *   p_k(w | ctx_k)  = max(N1+(· s_k) − D, 0)/N1+(· ctx_k ·)
    *                   + D·N1+(ctx_k ·)/N1+(· ctx_k ·) · p_{k-1}   (1 < k < n)
    *   p_1(w)          = N1+(· w)/N1+(· ·)
    *
    * where s_k is the length-k suffix of the scored n-gram, ctx_k its
    * first k−1 words, and every continuation count N1+ at level k is a
    * DISTINCT-TYPE count over the (k+1)-length suffixes observed in the
    * corpus — the strict suffix-type chain (p_1's counts come from
    * 2-suffix types, not full n-gram types). Trained on `df` itself, so
    * probabilities are strictly positive for D < 1; documents with
    * < `order` tokens are absent. Output: (idCol, n_ngrams, nll,
    * cross_entropy).
    *
    * 100 TB plan shape: the q78/q98 plan at order n — ONE tokenize pass
    * into the persisted slim (doc, w1..wn, tf) frame; all 3(n−1) model
    * counts are sum-over-window passes on that frame (type counts ride
    * n−1 row_number-flag sums — no countDistinct-over-window, no
    * self-join); one bounded driver agg for the base denominator; the
    * per-document rollup is the final exchange.
    */
  def kneserNeyNgramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      order: Int,
      discount: Double = 0.75): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    require(discount >= 0.0 && discount < 1.0, "discount must be in [0, 1)")
    import org.apache.spark.sql.expressions.Window
    val n = order
    val ws = (1 to n).map(i => s"w$i")
    val tf = ngramFrequencies(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // base denominator: distinct 2-suffix types (one bounded driver agg)
    val baseDen = tf
      .agg(countDistinct(col(ws(n - 2)), col(ws(n - 1))))
      .collect().head.getLong(0)
    val d = lit(discount)
    // first-row flags per distinct k-suffix type, k = 2..n (ordered by
    // the remaining columns + id for a total order)
    var cur = tf
    for (k <- 2 to n) {
      val sfx = ws.takeRight(k).map(col)
      val rest = ws.take(n - k).map(col) :+ col(idCol)
      cur = cur.withColumn(s"graft_f$k",
        (row_number().over(
          Window.partitionBy(sfx: _*).orderBy(rest: _*)) === 1)
          .cast(LongType))
    }
    // p_1, then interpolate up through the levels
    cur = cur.withColumn("graft_p",
      sum(col("graft_f2")).over(Window.partitionBy(col(ws.last)))
        .cast(DoubleType) / lit(baseDen.toDouble))
    for (k <- 2 to n) {
      val sK = ws.takeRight(k).map(col)
      val cK = ws.slice(n - k, n - 1).map(col)
      val (num, den, gam) =
        if (k == n) (
          sum(col("tf")).over(Window.partitionBy(sK: _*)),
          sum(col("tf")).over(Window.partitionBy(cK: _*)),
          sum(col(s"graft_f$n")).over(Window.partitionBy(cK: _*)))
        else (
          sum(col(s"graft_f${k + 1}")).over(Window.partitionBy(sK: _*)),
          sum(col(s"graft_f${k + 1}")).over(Window.partitionBy(cK: _*)),
          sum(col(s"graft_f$k")).over(Window.partitionBy(cK: _*)))
      cur = cur.withColumn("graft_p",
        greatest(num.cast(DoubleType) - d, lit(0.0)) / den.cast(DoubleType) +
          d * gam.cast(DoubleType) / den.cast(DoubleType) * col("graft_p"))
    }
    val perDoc = cur
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_ngrams"),
        sum(-col("tf") * log(col("graft_p"))).as("nll"))
      .withColumn("cross_entropy", col("nll") / col("n_ngrams"))
    CacheLifecycle.releaseOnConsume(perDoc, Seq(tf))
  }

  /** Per-document cross-entropy under the INTERPOLATED KNESER-NEY
    * TRIGRAM model: [[kneserNeyNgramCrossEntropy]] at order 3 (the
    * strict suffix-type recursion), output column named `n_trigrams`.
    * Documents with < 3 tokens are absent.
    */
  def kneserNeyTrigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame =
    kneserNeyNgramCrossEntropy(df, idCol, textCol, order = 3, discount)
      .withColumnRenamed("n_ngrams", "n_trigrams")

  /** The LM-scoring family behind ONE entry point — pick the model order
    * and smoothing instead of remembering the function names:
    * (1, Laplace) → [[unigramCrossEntropy]]; (2, Laplace) →
    * [[bigramCrossEntropy]]; (2, JelinekMercer) →
    * [[interpolatedCrossEntropy]]; (2, KneserNey) →
    * [[kneserNeyCrossEntropy]]; (n ≥ 3, KneserNey) →
    * [[kneserNeyNgramCrossEntropy]] (order 3 through the `n_trigrams`
    * alias, higher orders — KenLM's 5 included — with the generic
    * `n_ngrams` column). All share the output contract (`idCol`,
    * n-gram-count column, nll, cross_entropy) and the one-tokenize-
    * pass/window plan shape.
    */
  sealed trait LmSmoothing
  object LmSmoothing {
    case object Laplace extends LmSmoothing
    final case class JelinekMercer(lambda: Double = 0.7) extends LmSmoothing
    final case class KneserNey(discount: Double = 0.75) extends LmSmoothing
  }

  def lmCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      order: Int,
      smoothing: LmSmoothing = LmSmoothing.Laplace): DataFrame =
    (order, smoothing) match {
      case (1, LmSmoothing.Laplace) => unigramCrossEntropy(df, idCol, textCol)
      case (2, LmSmoothing.Laplace) => bigramCrossEntropy(df, idCol, textCol)
      case (2, LmSmoothing.JelinekMercer(l)) =>
        interpolatedCrossEntropy(df, idCol, textCol, l)
      case (2, LmSmoothing.KneserNey(d)) =>
        kneserNeyCrossEntropy(df, idCol, textCol, d)
      case (3, LmSmoothing.KneserNey(d)) =>
        kneserNeyTrigramCrossEntropy(df, idCol, textCol, d)
      case (k, LmSmoothing.KneserNey(d)) if k >= 4 =>
        kneserNeyNgramCrossEntropy(df, idCol, textCol, k, d)
      case other => throw new IllegalArgumentException(
        s"unsupported (order, smoothing) combination: $other")
    }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): within
    * each group (CCNet buckets per language; any column works — source,
    * domain), rank documents by LM cross-entropy and cut into `nBuckets`
    * equal-frequency buckets. Bucket 1 is the head (cleanest), bucket
    * `nBuckets` the tail; CCNet keeps head+middle for training. Returns
    * (`idCol`, `groupCol`, n_tokens/n_bigrams, nll, cross_entropy,
    * bucket). Documents the scorer skips (null id, zero scoreable
    * grams) are absent — unscoreable text has no perplexity.
    *
    * 100 TB plan shape: the scorer's own one-tokenize-pass plan produces
    * a SLIM per-doc frame (id + three numbers); the group column rides a
    * slim projection joined on the id key, and the rank comes from
    * [[Ranking.groupedNtile]] — a range repartition plus broadcast
    * prefix offsets, NOT an `ntile` window partitioned by group (a
    * window would sort each group in ONE task, and at corpus scale the
    * biggest group — CCNet's group is a language — IS most of the
    * corpus). Nothing re-reads the text after the scoring pass.
    *
    * Determinism across engines: ordering by a raw double invites
    * cross-engine summation-order noise at bucket boundaries, so the
    * rank key is `round(cross_entropy, 6)` with the document id as the
    * tiebreak — identical-text documents (exactly equal entropy) order
    * by id, and an oracle replay disagrees only if its value rounds
    * differently at the 6th decimal (measured boundary distances are
    * orders of magnitude wider; see the q83 margin note).
    */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      nBuckets: Int = 3,
      order: Int = 1,
      smoothing: LmSmoothing = LmSmoothing.Laplace,
      precomputedTf: Option[DataFrame] = None): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(precomputedTf.isEmpty ||
      (order == 1 && smoothing == LmSmoothing.Laplace),
      "precomputedTf is the unigram-Laplace fusion hook only")
    val scored =
      if (precomputedTf.isDefined)
        unigramCrossEntropy(df, idCol, textCol, precomputedTf)
      else lmCrossEntropy(df, idCol, textCol, order, smoothing)
    val groups = df.select(col(idCol), col(groupCol))
    Ranking.groupedNtile(
      scored
        .join(groups, Seq(idCol))
        .withColumn("graft_rank_key", round(col("cross_entropy"), 6)),
      groupCol, Seq("graft_rank_key", idCol), nBuckets)
      .drop("graft_rank_key")
  }

  // -- DSIR importance weighting --------------------------------------------
  // Data Selection via Importance Resampling (Xie et al. 2023,
  // arXiv:2302.03169): score every raw document by the log-likelihood
  // ratio of a TARGET-domain language model to the RAW-corpus model,
  //   lw(d) = sum_t tf(d,t) * (ln p_target(t) - ln p_raw(t)),
  // then keep the high-weight documents — "make the kept data look like
  // the target domain". Both models here are Laplace-smoothed unigram LMs
  // over the SHARED raw vocabulary (the paper uses hashed n-grams; the
  // unigram form keeps the algebra exact for the oracle).

  /** Per-document DSIR log importance weights:
    * (`idCol`, n_tokens, log_weight). `isTarget` is a boolean row
    * predicate over `df` marking the target-domain documents (e.g.
    * `col("lang") === "en"`); the target model counts only their tokens.
    *
    * 100 TB plan shape: ONE tokenize pass into the persisted
    * (doc, term, tf, target-flag) frame — the flag is constant per
    * document, so BOTH models' term counts come from the SAME single
    * count-over-window exchange partitioned by term (raw = sum tf,
    * target = sum tf·flag; no second scan, no term join); the four model
    * scalars are one bounded driver agg, and the per-document rollup is
    * the final exchange.
    */
  def dsirLogWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    val tf = df.where(col(idCol).isNotNull)
      .select(col(idCol), isTarget.as("graft_t"),
        explode(normalizedTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("graft_t"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = tf.agg(
      coalesce(sum(col("tf")), lit(0L)),
      coalesce(sum(when(col("graft_t"), col("tf"))), lit(0L)),
      countDistinct(col("term"))).collect().head
    val tRaw = totals.getLong(0)
    val tTgt = totals.getLong(1)
    val v = totals.getLong(2)
    val logZRaw = math.log((tRaw + v).toDouble.max(1.0))
    val logZTgt = math.log((tTgt + v).toDouble.max(1.0))
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val perDoc = tf
      .withColumn("graft_cr", sum(col("tf")).over(wTerm))
      .withColumn("graft_ct",
        coalesce(sum(when(col("graft_t"), col("tf"))).over(wTerm), lit(0L)))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * ((log(col("graft_ct") + 1.0) - logZTgt)
          - (log(col("graft_cr") + 1.0) - logZRaw))).as("log_weight"))
    CacheLifecycle.releaseOnConsume(perDoc, Seq(tf))
  }

  /** Control characters that have no business in training text: C0 minus
    * tab/newline/carriage-return, DEL, and the C1 block (a classic
    * byte-level corruption residue).
    */
  val CtrlPattern =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{0080}-\\x{009F}]"

  /** Zero-width / invisible formatting characters (ZWSP, ZWNJ, ZWJ, and a
    * stray BOM) — invisible to the eye, poison to tokenizers and dedup.
    */
  val ZeroWidthPattern =
    "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"

  /** Curated mojibake signatures: the characteristic residue of UTF-8 text
    * mis-decoded as cp1252/Latin-1 (the most common double-encoding
    * corruption in web corpora). Built from explicit code points so the
    * same byte-exact alternation can be embedded in any engine's regex;
    * every entry is a plain multi-char literal (no regex metacharacters),
    * none a prefix of another, so leftmost-first and leftmost-longest
    * engines count identically.
    */
  val MojibakeSignatures: Seq[String] = Seq(
    "\u00C3\u00A9", // e-acute  (C3 A9)
    "\u00C3\u00A8", // e-grave  (C3 A8)
    "\u00C3\u00BC", // u-uml    (C3 BC)
    "\u00C3\u00A4", // a-uml    (C3 A4)
    "\u00C3\u00B6", // o-uml    (C3 B6)
    "\u00C3\u00B1", // n-tilde  (C3 B1)
    "\u00C3\u00A7", // c-cedil  (C3 A7)
    "\u00E2\u20AC\u2122", // right single quote (E2 80 99)
    "\u00E2\u20AC\u0153", // left double quote  (E2 80 9C)
    "\u00E2\u20AC\u009D", // right double quote (E2 80 9D)
    "\u00E2\u20AC\u201C", // en dash            (E2 80 93)
    "\u00E2\u20AC\u201D", // em dash            (E2 80 94)
    "\u00E2\u201A\u00AC", // euro sign          (E2 82 AC)
    "\u00C2\u00B0", // degree   (C2 B0)
    "\u00C2\u00A9", // copyright(C2 A9)
    "\u00C2\u00BB", // raquo    (C2 BB)
    "\u00C2\u00AB") // laquo    (C2 AB)

  private val MojibakePattern =
    MojibakeSignatures.mkString("(", "|", ")")

  /** Text-encoding health audit — the char-level pre-flight a curation
    * pipeline runs before any tokenizer/LM/dedup stage trusts the text
    * column: one pure map-side codegen pass counting the defect classes
    * that survive parquet's UTF-8 guarantee yet still poison downstream
    * stages — NULL text, whitespace-only text, U+FFFD replacement chars
    * (the residue of a lossy upstream decode), control characters,
    * zero-width characters, and curated mojibake signatures. Nothing
    * shuffles but the single result row.
    */
  def encodingHealth(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val isNullT = t.isNull
    val isBlank = !isNullT && length(trim(t)) === 0
    def hits(pattern: String): Column =
      when(isNullT, 0).otherwise(
        size(regexp_extract_all(t, lit(pattern), lit(0))))
    val repl = hits("\\x{FFFD}")
    val ctrl = hits(CtrlPattern)
    val zw = hits(ZeroWidthPattern)
    val moji = hits(MojibakePattern)
    val defective = isNullT || isBlank ||
      repl > 0 || ctrl > 0 || zw > 0 || moji > 0
    df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(isNullT, 1L).otherwise(0L)).as("null_docs"),
      sum(when(isBlank, 1L).otherwise(0L)).as("blank_docs"),
      sum(when(repl > 0, 1L).otherwise(0L)).as("repl_docs"),
      coalesce(sum(repl.cast(LongType)), lit(0L)).as("repl_chars"),
      sum(when(ctrl > 0, 1L).otherwise(0L)).as("ctrl_docs"),
      coalesce(sum(ctrl.cast(LongType)), lit(0L)).as("ctrl_chars"),
      sum(when(zw > 0, 1L).otherwise(0L)).as("zw_docs"),
      coalesce(sum(zw.cast(LongType)), lit(0L)).as("zw_chars"),
      sum(when(moji > 0, 1L).otherwise(0L)).as("mojibake_docs"),
      coalesce(sum(moji.cast(LongType)), lit(0L)).as("mojibake_hits"),
      sum(when(!defective, 1L).otherwise(0L)).as("clean_docs"),
      coalesce(sum(when(defective, col(idCol))), lit(0L))
        .as("defective_id_sum"))
  }

  /** Per-document encoding flags for row-level routing (quarantine /
    * re-decode / drop): same defect classes as [[encodingHealth]], kept as
    * columns so the caller can filter or bucket without a second scan.
    */
  def withEncodingFlags(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val isNullT = t.isNull
    def hits(pattern: String): Column =
      when(isNullT, 0).otherwise(
        size(regexp_extract_all(t, lit(pattern), lit(0))))
    df.withColumn("enc_null", isNullT)
      .withColumn("enc_blank", !isNullT && length(trim(t)) === 0)
      .withColumn("enc_repl_chars", hits("\\x{FFFD}"))
      .withColumn("enc_ctrl_chars", hits(CtrlPattern))
      .withColumn("enc_zw_chars", hits(ZeroWidthPattern))
      .withColumn("enc_mojibake_hits", hits(MojibakePattern))
  }
}
