package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based quality classification — the GPT-3/LLaMA/DCLM pipeline
  * step that trains a lightweight text classifier on labeled seed sets
  * (e.g. curated-reference vs random-web) and scores the whole corpus,
  * keeping documents the model judges reference-like. The classifier
  * here is multinomial Naive Bayes with additive (Lidstone) smoothing:
  * closed-form, deterministic, and exactly replayable from integer
  * count aggregates — no SGD state, no initialization order.
  *
  * Scale shape: TRAINING runs on the seed set (labeled data is small by
  * construction — it's hand-curated), one tokenize + one groupBy; the
  * model is a catalog-sized (term × class) log-probability table.
  * SCORING is the corpus-sized pass: one tokenize into (doc, term, tf),
  * a BROADCAST join against the model (the corpus never shuffles for
  * the lookup), and one map-side-combinable groupBy(doc, class) summing
  * `tf · log P(term|class)`. The per-doc class ranking collects C
  * structs per document (C = number of classes, 2-5 in practice) —
  * bounded by the label alphabet, never by the corpus.
  *
  * Out-of-vocabulary corpus terms are IGNORED (the standard multinomial
  * NB convention: the event space is the training vocabulary); training
  * terms unseen in a class get the smoothed floor `alpha / (tokens_c +
  * alpha·V)`. Tokenization is [[TextAnalysis.normalizedTokens]] — the
  * repo's one lowercased tokenizer, shared with the LM scorers.
  *
  * reference capability: none (deequ has no classifier); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object Classify {

  /** A trained NB model: `termLogProb` = (term, label, log_cond) for
    * EVERY training-vocabulary term × class (dense, so scoring needs no
    * per-class OOV bookkeeping), `classLogPrior` = (label, log_prior),
    * plus the vocabulary size and smoothing used.
    */
  final case class NbModel(
      termLogProb: DataFrame,
      classLogPrior: DataFrame,
      vocabSize: Long,
      alpha: Double)

  /** Train multinomial NB on `labeled` (`idCol`, `textCol`, `labelCol`;
    * null-label rows are dropped). `log P(term|class)` = `ln((count +
    * alpha) / (class_tokens + alpha·V))` with V = training vocabulary
    * size across ALL classes; `log P(class)` = `ln(docs_c /
    * total_docs)`. The (vocab × classes) densification is a crossJoin of
    * two seed-bounded frames — deliberate and documented, never
    * corpus-sized.
    */
  def trainNaiveBayes(
      labeled: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val rows = labeled.where(col(labelCol).isNotNull)
    val counts = TextAnalysis.termFrequencies(rows, idCol, textCol)
      .join(rows.select(col(idCol), col(labelCol).as("label")), Seq(idCol))
      .groupBy(col("label"), col("term"))
      .agg(sum(col("tf")).as("graft_c"))
      .persist()
    val vocab = counts.select(col("term")).distinct()
    val v = vocab.count()
    val classTotals = counts.groupBy(col("label"))
      .agg(sum(col("graft_c")).as("graft_tot"))
    val labels = rows.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("graft_docs"))
    val total = rows.count()
    val termLogProb = vocab
      .crossJoin(labels.select(col("label")))
      .join(counts, Seq("term", "label"), "left_outer")
      .join(classTotals, Seq("label"))
      .select(
        col("term"), col("label"),
        log((coalesce(col("graft_c"), lit(0L)) + lit(alpha)) /
          (col("graft_tot") + lit(alpha) * lit(v.toDouble)))
          .as("log_cond"))
      .persist()
    termLogProb.count() // materialize before the counts cache is dropped
    counts.unpersist(blocking = false)
    val classLogPrior = labels
      .select(col("label"),
        log(col("graft_docs").cast(DoubleType) / lit(total.toDouble))
          .as("log_prior"))
    NbModel(termLogProb, classLogPrior, v, alpha)
  }

  /** Score `df` against a trained model: one row per (non-null-id)
    * document with `predicted` (highest posterior, ties broken by
    * ascending label so the result is a pure function of the data),
    * `score` (the winning log posterior) and `margin` (winner minus
    * runner-up; +Infinity for a single-class model). Documents with no
    * in-vocabulary token are still classified — by priors alone.
    */
  def scoreNaiveBayes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel): DataFrame = {
    val tf = TextAnalysis.termFrequencies(df, idCol, textCol)
    val contrib = tf
      .join(broadcast(model.termLogProb), Seq("term"))
      .select(col(idCol), col("label"),
        (col("tf") * col("log_cond")).as("graft_part"))
    // the prior rides in as one seed row per (doc, class) through the
    // SAME aggregation — no (doc, class)-keyed join of two corpus-sized
    // frames ever happens (an earlier left-outer formulation sort-merged
    // the corpus twice; the plan audit pins this shape now). Seed rows
    // also carry OOV-only and empty docs to a priors-only score.
    val seeds = df.where(col(idCol).isNotNull)
      .select(col(idCol))
      .crossJoin(broadcast(model.classLogPrior))
      .select(col(idCol), col("label"), col("log_prior").as("graft_part"))
    val perClass = contrib.unionByName(seeds)
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("graft_part")).as("graft_score"))
    // C structs per doc (C = class count) — bounded by the label
    // alphabet; sort ascending on (-score, label) so element 0 is the
    // winner with the deterministic tie-break
    perClass
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        (-col("graft_score")).as("n"), col("label").as("l")))).as("graft_r"))
      .select(
        col(idCol),
        col("graft_r")(0).getField("l").as("predicted"),
        (-col("graft_r")(0).getField("n")).as("score"),
        when(size(col("graft_r")) > 1,
          col("graft_r")(1).getField("n") - col("graft_r")(0).getField("n"))
          .otherwise(lit(Double.PositiveInfinity)).as("margin"))
  }

  /** The filter step: rows of `df` the model assigns `keepLabel` with at
    * least `minMargin` of log-posterior headroom over the runner-up.
    * One broadcast-model scoring pass + a slim id-keyed join.
    */
  def filterByClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel,
      keepLabel: String,
      minMargin: Double = 0.0): DataFrame = {
    val kept = scoreNaiveBayes(df, idCol, textCol, model)
      .where(col("predicted") === keepLabel && col("margin") >= minMargin)
      .select(col(idCol))
    df.join(kept, Seq(idCol))
  }
}
