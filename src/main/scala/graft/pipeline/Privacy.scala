package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Re-identification risk audits for training-data governance —
  * k-anonymity (Sweeney 2002) and l-diversity (Machanavajjhala 2007)
  * over quasi-identifier columns: every row whose quasi-identifier
  * combination is shared by fewer than k rows is re-identifiable by
  * linkage, and a class whose sensitive attribute takes a single value
  * discloses it to anyone who can place a person in the class. The
  * PII-scrub step (TextAnalysis) removes direct identifiers; these
  * audits quantify what the INDIRECT identifiers still leak before a
  * dataset ships.
  *
  * Scale shape: everything is one map-side-combinable groupBy over the
  * quasi-identifier columns (equivalence classes), then catalog-sized
  * follow-ups — the size histogram groups the class sizes (at most
  * distinct-size rows), l-diversity adds one distinct-count per class.
  * Nothing corpus-sized shuffles twice; no windows, no joins except the
  * optional row-level flag join (slim class keys).
  *
  * NULL quasi-identifier values form their own class (SQL groupBy
  * semantics) — deliberately: "value withheld" is itself a linkable
  * signature.
  *
  * reference capability: none (deequ audits quality, not
  * re-identification); part of the beyond-reference pipeline family.
  */
object Privacy {

  /** Per-class-size census: one row per distinct equivalence-class size
    * with (class_size, n_classes, n_rows). The k-anonymity verdict reads
    * off it: rows in classes of size < k are linkage-vulnerable.
    */
  def kAnonymityHistogram(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("graft_sz"))
      .groupBy(col("graft_sz").as("class_size"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("graft_sz")).as("n_rows"))
  }

  /** Aggregate k-anonymity/l-diversity verdict: one row with the class
    * count, the minimum class size (= the dataset's k), rows and classes
    * below the `k` bar, and — when `sensitiveCol` is given — the minimum
    * per-class distinct-sensitive-value count (= the dataset's l) and
    * the number of l=1 classes (attribute disclosure).
    */
  def kAnonymityStats(
      df: DataFrame,
      qiCols: Seq[String],
      k: Long,
      sensitiveCol: Option[String] = None): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val sens = sensitiveCol.map(col)
    val perClass = df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("graft_sz"),
        (sens match {
          case Some(c) => countDistinct(c)
          case None    => lit(null).cast(LongType)
        }).as("graft_l"))
    perClass.agg(
      count(lit(1)).as("n_classes"),
      coalesce(sum(col("graft_sz")), lit(0L)).as("n_rows"),
      min(col("graft_sz")).as("min_class_size"),
      coalesce(sum(when(col("graft_sz") < k, col("graft_sz"))), lit(0L))
        .as("below_k_rows"),
      count(when(col("graft_sz") < k, 1)).as("below_k_classes"),
      min(col("graft_l")).as("min_l"),
      count(when(col("graft_l") === 1, 1)).as("l1_classes"))
  }

  /** Row-level vulnerability flag: `df` plus `class_size` and
    * `k_anonymous` (class size >= k) — the rows a release gate holds
    * back. One groupBy + one slim join on the class keys.
    */
  def flagBelowK(
      df: DataFrame,
      qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    val sizes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .select(qiCols.map(c => col(c).as(s"graft_$c")) :+
        col("class_size"): _*)
    // null-SAFE key equality: a null quasi-identifier forms a real class
    // (groupBy semantics) and must match its own size row — a bare USING
    // join would leave every null-QI row unflagged
    val cond = qiCols.map(c => df(c) <=> sizes(s"graft_$c"))
      .reduce(_ && _)
    df.join(sizes, cond, "left_outer")
      .drop(qiCols.map(c => s"graft_$c"): _*)
      .withColumn("k_anonymous", col("class_size") >= k)
  }
}
