package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for every left row, the most recent right row
  * with the same key and an earlier (or equal) timestamp. The operator
  * Spark's relational algebra lacks natively; ubiquitous in event
  * attribution (click → latest prior view), feature lookup (event →
  * latest dimension snapshot), and market data (trade → latest quote).
  *
  * Implementation is the one-shuffle union/carry-forward plan rather than
  * a range join: both sides are tagged and unioned, shuffled ONCE by key,
  * sorted within partitions by (ts, side, tiebreak), and the latest right
  * payload is carried forward with `last(ignoreNulls)` over an
  * unbounded-preceding running window — a streaming pass within each key
  * partition, never a per-row range probe. Cost is one exchange of
  * |L|+|R| rows and a per-key sort; parallelism is the number of distinct
  * keys, the natural production shape (users / instruments / shards). A
  * single pathologically hot key serializes its own rows only — salting
  * by time-range with a per-chunk seed pass is the known extension if one
  * key dominates a cluster.
  *
  * Right-side ties on (key, ts) resolve deterministically to the largest
  * tiebreak value; `allowEqual` picks whether an exactly-simultaneous
  * right row is visible to the left row. `toleranceUs` (microseconds)
  * nulls out matches older than the bound — evaluated AFTER the match, so
  * a stale match inside the tolerance window is not replaced by an even
  * staler one (standard as-of tolerance semantics).
  */
object AsOfJoin {

  /** Left columns pass through unchanged; matched right columns arrive as
    * `asof_<col>` (null when unmatched), with the match timestamp as
    * `asof_ts`.
    *
    * @param keyCols      equi-join key columns present on both sides
    * @param tsCol        timestamp (or any orderable) column on both sides
    * @param payloadCols  right-side columns to carry (must not collide
    *                     with `asof_`-prefixed left names)
    * @param tiebreakCol  right-side column ordering simultaneous right
    *                     rows (largest wins); defaults to the ts column
    * @param allowEqual   whether right.ts == left.ts may match
    * @param toleranceUs  optional max staleness in microseconds (ts must
    *                     be a timestamp when set)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tiebreakCol: Option[String] = None,
      allowEqual: Boolean = true,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(!payloadCols.contains(tsCol),
      s"right ts column '$tsCol' is carried as asof_ts automatically")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("graft_")),
      "left side must not contain graft_-prefixed columns")
    require(!leftCols.exists(c => c.startsWith("asof_")),
      "left side must not contain asof_-prefixed columns")

    val tb = tiebreakCol.getOrElse(tsCol)
    // side 0 sorts before side 1 at equal ts when equality may match
    // (the right row becomes visible to the simultaneous left row);
    // flipped when it may not.
    val (rightSide, leftSide) = if (allowEqual) (0, 1) else (1, 0)

    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("graft_ts"),
        lit(rightSide).as("graft_side"),
        col(tb).as("graft_tb"),
        struct(col(tsCol).as("asof_ts") +:
          payloadCols.map(c => col(c).as(s"asof_$c")): _*).as("graft_rpay"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*))
          .schema.head.dataType).as("graft_lpay")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("graft_ts"),
        lit(leftSide).as("graft_side"),
        lit(null).cast(rTagged.schema("graft_tb").dataType).as("graft_tb"),
        lit(null).cast(rTagged.schema("graft_rpay").dataType)
          .as("graft_rpay"),
        struct(leftCols.map(col): _*).as("graft_lpay")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("graft_ts").asc, col("graft_side").asc,
        col("graft_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("graft_match", last(col("graft_rpay"), ignoreNulls = true)
        .over(w))
      .where(col("graft_side") === leftSide)

    val tolFiltered = toleranceUs match {
      case Some(tol) =>
        carried.withColumn("graft_match",
          when(col("graft_match").isNotNull &&
            unix_micros(col("graft_ts").cast("timestamp")) -
              unix_micros(col("graft_match.asof_ts").cast("timestamp"))
              <= tol,
            col("graft_match")))
      case None => carried
    }

    tolFiltered.select(
      leftCols.map(c => col(s"graft_lpay.$c").as(c)) ++
        (s"asof_ts" +: payloadCols.map(c => s"asof_$c"))
          .map(c => col(s"graft_match.$c").as(c)): _*)
  }
}
