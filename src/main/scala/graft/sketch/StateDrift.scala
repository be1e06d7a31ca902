package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot drift from persisted sketch states — the "did my corpus
  * shift between crawls" report computed entirely from KB-per-group
  * state tables: two snapshots' staged states join on their group keys
  * and every drift signal comes out of the sketches, the corpora never
  * rescanned. One module composes the whole persisted family:
  * distincts ([[HllState]]), set overlap ([[Theta]], already
  * `Theta.overlap`), quantiles ([[KllGroupState]]), and item
  * frequencies ([[FreqItems]]).
  *
  * Group-key convention: every non-sketch column is a group key (the
  * family's shared shape), and all joins are FULL OUTER — a group
  * present in only one snapshot is a drift signal, not a dropped row.
  */
object StateDrift {

  private def fullJoin(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.join(b, groupCols, "full_outer")

  /** (groupCols..., distinct_a, distinct_b, distinct_ratio) from two
    * per-group HLL state frames; a side missing the group reports 0 and
    * a null ratio (division by an absent baseline is a signal, not a
    * number).
    */
  def distinctDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val groupCols = a.columns.filterNot(_ == "hll").toSeq
    val ea = HllState.estimates(a)
      .withColumnRenamed("distinct_est", "distinct_a")
    val eb = HllState.estimates(b)
      .withColumnRenamed("distinct_est", "distinct_b")
    fullJoin(ea, eb, groupCols)
      .withColumn("distinct_a", coalesce(col("distinct_a"), lit(0L)))
      .withColumn("distinct_b", coalesce(col("distinct_b"), lit(0L)))
      .withColumn("distinct_ratio",
        when(col("distinct_a") > 0L,
          col("distinct_b").cast("double") / col("distinct_a")))
  }

  /** (groupCols..., &lt;name&gt;_a..., &lt;name&gt;_b..., &lt;name&gt;_shift...) from two
    * per-group KLL state frames at the requested quantiles; shifts are
    * b − a, null when either side misses the group.
    */
  def quantileDrift(a: DataFrame, b: DataFrame, qs: Seq[Double],
      names: Seq[String] = Seq.empty): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    val colNames =
      if (names.nonEmpty) { require(names.length == qs.length); names }
      else qs.indices.map(i => s"q${i + 1}")
    val groupCols = a.columns.filterNot(_ == "kll").toSeq
    val qa = KllGroupState.quantiles(a, qs, colNames.map(_ + "_a"))
    val qb = KllGroupState.quantiles(b, qs, colNames.map(_ + "_b"))
    colNames.foldLeft(fullJoin(qa, qb, groupCols)) { (df, n) =>
      df.withColumn(s"${n}_shift", col(s"${n}_b") - col(s"${n}_a"))
    }
  }

  /** Frequency drift from two per-group Misra-Gries state frames:
    * (groupCols..., n_a, n_b, l1_est, l1_err, new_items, lost_items).
    *
    *  - `l1_est`: Σ over the UNION of kept items of
    *    |est_a/n_a − est_b/n_b| — the visible-mass L1 distance between
    *    the two snapshots' item distributions;
    *  - `l1_err`: a deterministic TOTAL error bound on l1_est — the
    *    true (full-vocabulary) L1 distance lies within l1_est ± l1_err.
    *    Built from the per-item undercount bounds err_x =
    *    (n−S)/((capacity+1)·n): each of the U union items can move by
    *    at most errA + errB, and items invisible on BOTH summaries
    *    carry total mass at most each side's global undercount
    *    err_x·(capacity+1), so l1_err = (errA+errB)·(U + capacity + 1).
    *    EXACT (l1_err = 0) when both summaries ran in exact mode
    *    (capacity >= vocabulary) — the `l1_err === 0` flag is the
    *    exact-mode signal;
    *  - `new_items` / `lost_items`: kept items present in only one
    *    snapshot's summary — the qualitative churn signal.
    *
    * A group present in only one snapshot reports the other side as
    * empty (n 0, all its mass "new"/"lost").
    */
  def frequencyDrift(a: DataFrame, b: DataFrame,
      capacity: Int = FreqItems.DefaultCapacity): DataFrame = {
    val groupCols = a.columns.filterNot(_ == "mg").toSeq
    // slim per-group (n, err) frames — joined back after the item-level
    // full outer, so a one-sided item still sees BOTH sides' totals
    def stats(df: DataFrame, tag: String): DataFrame = {
      val s = aggregate(map_values(col("mg.counters")), lit(0L), _ + _)
      df.select(groupCols.map(col) ++ Seq(
        col("mg.n").as(s"n_$tag"),
        ((col("mg.n") - s).cast("double") /
          (lit(capacity + 1.0) * col("mg.n"))).as(s"err_$tag")): _*)
    }
    def items(df: DataFrame, tag: String): DataFrame =
      df.select(groupCols.map(col) :+
        explode(col("mg.counters")).as(Seq("item", s"est_$tag")): _*)
    val joined = items(a, "a").join(items(b, "b"),
        groupCols :+ "item", "full_outer")
      .join(stats(a, "a"), groupCols, "left_outer")
      .join(stats(b, "b"), groupCols, "left_outer")
    joined
      .withColumn("p_a",
        when(col("n_a") > 0L,
          coalesce(col("est_a"), lit(0L)).cast("double") / col("n_a"))
          .otherwise(lit(0.0)))
      .withColumn("p_b",
        when(col("n_b") > 0L,
          coalesce(col("est_b"), lit(0L)).cast("double") / col("n_b"))
          .otherwise(lit(0.0)))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(coalesce(col("n_a"), lit(0L))).as("n_a"),
        max(coalesce(col("n_b"), lit(0L))).as("n_b"),
        sum(abs(col("p_a") - col("p_b"))).as("l1_est"),
        // total bound, not per-item slack: (errA+errB) × (union items +
        // capacity+1) — the second term covers both-side-invisible mass
        ((max(coalesce(col("err_a"), lit(0.0))) +
          max(coalesce(col("err_b"), lit(0.0)))) *
          (count(lit(1)) + lit(capacity + 1.0))).as("l1_err"),
        sum(when(col("est_a").isNull, 1L).otherwise(0L)).as("new_items"),
        sum(when(col("est_b").isNull, 1L).otherwise(0L)).as("lost_items"))
  }
}
