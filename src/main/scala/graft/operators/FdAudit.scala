package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Functional-dependency audit — does `lhs -> rhs` hold, how badly is it
  * violated, and what is the minimal repair? The profiling question
  * underneath key discovery, normalization checks, and dimension-table
  * hygiene ("one name per id"), answered in two map-side-combinable
  * aggregations: distinct (lhs, rhs) pair counts, then per-lhs group
  * stats. No windows, no joins; both shuffles carry only group keys and
  * counts.
  *
  * Null semantics are NULL-SAFE on both sides: a null LHS forms a group
  * of its own (as SQL GROUP BY does) and a null RHS is a value of its
  * own — an id mapping to both 'x' and NULL IS a violation, which plain
  * COUNT(DISTINCT) would silently miss.
  */
object FdAudit {

  /** One-row census: group/violation counts, violating row mass, and
    * `repair_rows` — the minimum number of rows to delete so the FD
    * holds (each group keeps its plurality RHS value).
    */
  def fdAudit(df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdAudit needs at least one LHS column")
    require(!lhs.contains(rhs), s"rhs '$rhs' must not appear in lhs")
    groupStats(df, lhs, rhs).agg(
      coalesce(sum(col("graft_rows")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("graft_dv") > 1, 1L).otherwise(0L))
        .as("violating_groups"),
      coalesce(sum(when(col("graft_dv") > 1, col("graft_rows"))
        .otherwise(0L)), lit(0L)).as("violating_rows"),
      coalesce(sum(col("graft_rows") - col("graft_maxc")), lit(0L))
        .as("repair_rows"))
  }

  /** The violating groups themselves (lhs columns + `distinct_rhs` +
    * `rows` + `plurality_rows`), for row-level inspection or quarantine.
    */
  def fdViolations(
      df: DataFrame,
      lhs: Seq[String],
      rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdViolations needs at least one LHS column")
    groupStats(df, lhs, rhs)
      .where(col("graft_dv") > 1)
      .select(lhs.map(col) ++ Seq(
        col("graft_dv").as("distinct_rhs"),
        col("graft_rows").as("rows"),
        col("graft_maxc").as("plurality_rows")): _*)
  }

  private def groupStats(
      df: DataFrame,
      lhs: Seq[String],
      rhs: String): DataFrame =
    df.groupBy((lhs :+ rhs).map(col): _*)
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(lhs.map(col): _*)
      .agg(
        count(lit(1)).as("graft_dv"),
        sum(col("graft_c")).as("graft_rows"),
        max(col("graft_c")).as("graft_maxc"))
}
