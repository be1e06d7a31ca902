package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Discriminative quality classification — the DCLM/FineWeb-Edu rung
  * above the generative NB filter (q86): binary logistic regression over
  * hashed bag-of-words features, trained with full-batch gradient
  * descent. Unlike NB, the decision boundary is trained directly on the
  * keep/toss separation, so correlated evidence isn't double-counted —
  * the practical reason quality pipelines moved from NB to linear
  * classifiers (fastText, DCLM's logistic filter).
  *
  * Determinism contract (the q102 k-means convention): the weight vector
  * is snapped to a fixed decimal grid after every update
  * (`roundDecimals`), so the entire GD trajectory is a pure function of
  * the data — an independent engine replaying the same iterations (the
  * DuckDB oracle does) reproduces every weight bit-for-bit, and Spark's
  * own partition-order float-sum jitter (~1e-15 relative) dies at the
  * grid snap instead of compounding across iterations.
  *
  * Scale shape: features are built ONCE into a persisted slim frame —
  * one row per document carrying a bounded array of (hashed index,
  * L1-normalized value) pairs plus the label; each GD iteration is ONE
  * scan of that frame (dot product and residual computed in-row against
  * the broadcast weight literal, gradient contributions exploded and
  * collapsed by a map-side-combinable groupBy to `dim + 1` rows). No
  * iteration ever joins corpus-sized frames or shuffles document rows:
  * per-iteration shuffle volume is `numTasks × (dim + 1)` partial rows.
  * The model is `dim + 1` doubles on the driver — broadcast back as a
  * literal, never a join side. Scoring is the same in-row dot product:
  * pure map-side over any corpus.
  *
  * Feature hashing (Weinberger et al. 2009) keys on
  * `md5("<seed>:<term>")` — stable across engines, sessions and
  * languages (no JVM `hashCode` dependence), replayable in SQL as
  * `('0x' || substr(md5(...), 1, 8))::BIGINT % dim`. Collisions are part
  * of the model (both engines hash identically), and `dim` bounds every
  * downstream structure regardless of corpus vocabulary — the property
  * that lets the classifier run at 100 TB without a vocabulary pass.
  *
  * reference capability: none (deequ has no classifier); part of the
  * beyond-reference LLM-pipeline family (SURVEY §2 pipeline block).
  */
object LogReg {

  /** A trained model: `weights(f)` for hashed features `f < dim`,
    * `weights(dim)` = the intercept (a constant feature x = 1.0 appended
    * to every document — no special bias handling anywhere). `history`
    * holds the weight vector after every iteration (element 0 = after
    * iteration 1), for trajectory audits.
    */
  final case class LogRegModel(
      weights: Array[Double],
      dim: Int,
      lr: Double,
      l2: Double,
      history: List[Array[Double]]) {
    require(weights.length == dim + 1,
      s"weights must have dim+1 entries, got ${weights.length} for dim $dim")
  }

  /** Hashed feature index in [0, dim) for a term — the cross-engine
    * md5-prefix hash ([[Mixing.shardOf]] convention, distinct seed).
    */
  def featureIndex(term: Column, dim: Int, seed: String = "feat"): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    pmod(
      conv(substring(md5(concat(lit(seed + ":"), term)), 1, 8), 16, 10)
        .cast(LongType),
      lit(dim.toLong))
  }

  /** The persisted training/scoring representation: one row per
    * (non-null-id) document of `df` with `graft_feats` = a sorted array
    * of (f, x) structs — hashed term-frequency mass L1-normalized per
    * document, with the constant intercept feature (f = dim, x = 1.0)
    * appended. Token-less documents (null/empty text) still get the
    * intercept-only array, so every document is scored. Two doc-keyed
    * exchanges build it; everything per-iteration reads it in place.
    */
  def hashedFeatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      featurizer: Classify.Featurizer = TextAnalysis.termFrequencies)
      : DataFrame = {
    val base = df.where(col(idCol).isNotNull)
    val tf = featurizer(base, idCol, textCol)
    val byFeature = tf
      .groupBy(col(idCol), featureIndex(col("term"), dim).as("graft_f"))
      .agg(sum(col("tf")).as("graft_cnt"))
    val packed = byFeature
      .groupBy(col(idCol))
      .agg(
        collect_list(struct(col("graft_f").as("f"),
          col("graft_cnt").cast(DoubleType).as("c"))).as("graft_raw"),
        sum(col("graft_cnt")).cast(DoubleType).as("graft_tot"))
      .select(col(idCol),
        // sort for a deterministic in-row sum order, normalize, intercept
        concat(
          transform(sort_array(col("graft_raw")),
            e => struct(e.getField("f").as("f"),
              (e.getField("c") / col("graft_tot")).as("x"))),
          array(struct(lit(dim.toLong).as("f"), lit(1.0).as("x"))))
          .as("graft_feats"))
    base.select(col(idCol)).distinct()
      .join(packed, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("graft_feats"),
          array(struct(lit(dim.toLong).as("f"), lit(1.0).as("x"))))
          .as("graft_feats"))
  }

  /** `w · x` over a feature array against a weight-vector literal —
    * in-row, no join, no shuffle. `weights` must have dim+1 entries.
    */
  private def dotExpr(feats: Column, weights: Array[Double]): Column = {
    val wLit = typedlit(weights.toSeq)
    aggregate(feats, lit(0.0),
      (acc, e) => acc +
        element_at(wLit, e.getField("f").cast(IntegerType) + 1) *
          e.getField("x"))
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def snap(v: Double, decimals: Int): Double =
    BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Full-batch GD on `labeled` (labelCol must be 0/1 — validated in the
    * featurize pass): `w ← round(w − lr·(∇/n + l2·w), roundDecimals)`
    * per iteration, from a zero initialization (deterministic — no RNG
    * seed to disagree on). Returns the model plus the per-iteration
    * trajectory. The labeled frame is featurized ONCE and persisted;
    * each iteration is one scan + a (dim+1)-row map-side-combinable
    * aggregate collected to the driver.
    */
  def train(
      labeled: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      iterations: Int,
      lr: Double,
      l2: Double = 0.0,
      roundDecimals: Int = 6,
      featurizer: Classify.Featurizer = TextAnalysis.termFrequencies)
      : LogRegModel = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(lr > 0, s"lr must be positive, got $lr")
    require(roundDecimals >= 0,
      s"roundDecimals must be >= 0 (the determinism grid), got $roundDecimals")
    val feats = hashedFeatures(labeled, idCol, textCol, dim, featurizer)
      .join(
        labeled.where(col(idCol).isNotNull)
          .select(col(idCol), col(labelCol).cast(DoubleType).as("graft_y")),
        Seq(idCol))
      .persist()
    val counts = feats.agg(
      count(lit(1)),
      count(when(col("graft_y") =!= 0.0 && col("graft_y") =!= 1.0, 1)))
      .collect().head
    val n = counts.getLong(0)
    require(n > 0, "train needs a non-empty labeled set")
    require(counts.getLong(1) == 0,
      s"labelCol '$labelCol' must be 0/1; ${counts.getLong(1)} rows are not")
    var w = Array.fill(dim + 1)(0.0)
    var history = List.empty[Array[Double]]
    for (_ <- 1 to iterations) {
      // residual in-row, gradient exploded and collapsed map-side: the
      // only shuffle is numTasks × (dim+1) partial rows
      val grad = feats
        .select(col("graft_feats"),
          (sigmoid(dotExpr(col("graft_feats"), w)) - col("graft_y"))
            .as("graft_r"))
        .select(explode(col("graft_feats")).as("e"), col("graft_r"))
        .groupBy(col("e.f").as("f"))
        .agg(sum(col("graft_r") * col("e.x")).as("g"))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      w = Array.tabulate(dim + 1)(f =>
        snap(w(f) - lr * (grad.getOrElse(f, 0.0) / n + l2 * w(f)),
          roundDecimals))
      history ::= w
    }
    feats.unpersist(blocking = false)
    LogRegModel(w, dim, lr, l2, history.reverse)
  }

  /** Score `df` against a trained model: one row per (non-null-id)
    * document with the raw `logit`, the probability `p`, and `predicted`
    * = 1 when p >= 0.5. Pure map-side after the feature build — the
    * weights ride in as a literal, nothing joins.
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: LogRegModel,
      featurizer: Classify.Featurizer = TextAnalysis.termFrequencies)
      : DataFrame =
    hashedFeatures(df, idCol, textCol, model.dim, featurizer)
      .select(col(idCol),
        dotExpr(col("graft_feats"), model.weights).as("logit"))
      .select(col(idCol), col("logit"), sigmoid(col("logit")).as("p"),
        when(col("logit") >= 0.0, 1).otherwise(0).as("predicted"))

  /** The filter step: rows of `df` the model scores at `p >= minP`.
    * One scoring pass + a slim id-keyed join.
    */
  def filterByModel(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: LogRegModel,
      minP: Double = 0.5): DataFrame = {
    val kept = score(df, idCol, textCol, model)
      .where(col("p") >= minP)
      .select(col(idCol))
    df.join(kept, Seq(idCol))
  }
}
