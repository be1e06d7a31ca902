package graft.comparison

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-to-dataset comparison operators
  * (reference capability: comparison/DataSynchronization.scala,
  * comparison/ReferentialIntegrity.scala, comparison/RowCountMatch.scala,
  * comparison/SchemaMatch.scala).
  *
  * Scale notes: all comparisons are expressed as joins/aggregations that
  * Catalyst plans — the reference-side key set of a referential-integrity
  * check is reduced to distinct keys before joining, so the join input is
  * bounded by key cardinality, not table size, and broadcasts when small.
  */
object ComparisonResult {
  sealed trait Outcome
  case class Succeeded(ratio: Double) extends Outcome
  case class Errored(message: String) extends Outcome
}

object ReferentialIntegrity {

  /** Fraction of (non-null) values of `column` in `primary` that exist in
    * `referenceColumn` of `reference`
    * (reference capability: comparison/ReferentialIntegrity.scala:48).
    */
  def subsetCheck(
      primary: DataFrame,
      column: String,
      reference: DataFrame,
      referenceColumn: String): Double = {
    val total = primary.filter(col(column).isNotNull).count()
    if (total == 0L) return 1.0
    // left_semi against the distinct reference keys: Catalyst broadcasts the
    // (distinct, small) build side or shuffles on the key at scale
    val matched = primary
      .filter(col(column).isNotNull)
      .join(
        reference.select(col(referenceColumn).as(column)).distinct(),
        Seq(column), "left_semi")
      .count()
    matched.toDouble / total
  }

  /** Row-level variant: original rows plus a boolean `graft_ri_outcome`. */
  def subsetCheckRowLevel(
      primary: DataFrame,
      column: String,
      reference: DataFrame,
      referenceColumn: String): DataFrame = {
    val refKeys = reference
      .select(col(referenceColumn).as(column)).distinct()
      .withColumn("graft_ri_hit", lit(true))
    primary
      .join(refKeys, Seq(column), "left")
      .withColumn("graft_ri_outcome", coalesce(col("graft_ri_hit"), lit(false)))
      .drop("graft_ri_hit")
  }
}

object RowCountMatch {

  /** count(primary) / count(reference)
    * (reference capability: comparison/RowCountMatch.scala:31). */
  def ratio(primary: DataFrame, reference: DataFrame): Double = {
    val refCount = reference.count()
    if (refCount == 0L) Double.NaN else primary.count().toDouble / refCount
  }
}

object SchemaMatch {

  /** Driver-side schema equality on (name, datatype), order-insensitive
    * (reference capability: comparison/SchemaMatch.scala:30). */
  def matches(df1: DataFrame, df2: DataFrame): Boolean = {
    def norm(df: DataFrame) =
      df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1).toSeq
    norm(df1) == norm(df2)
  }
}

/** Aggregate + row-level dataset match
  * (reference capability: comparison/DataSynchronization.scala:249-334).
  */
object DatasetMatch {

  /** Ratio of ds1 rows with a matching ds2 row: equi-join on `colKeyMap`,
    * equality on `matchColMap` (or full key-match when empty).
    */
  def matchRatio(
      ds1: DataFrame,
      ds2: DataFrame,
      colKeyMap: Map[String, String],
      matchColMap: Map[String, String] = Map.empty): Try[Double] = Try {
    val total = ds1.count()
    if (total == 0L) return Success(1.0)
    val a = ds1.alias("graft_a")
    val b = ds2.alias("graft_b")
    val keyCond = colKeyMap.map { case (c1, c2) =>
      col(s"graft_a.$c1") === col(s"graft_b.$c2")
    }.reduce(_ && _)
    val matchCond = matchColMap.map { case (c1, c2) =>
      col(s"graft_a.$c1") <=> col(s"graft_b.$c2")
    }.foldLeft(keyCond)(_ && _)
    val matched = a.join(b, matchCond, "inner").count()
    matched.toDouble / total
  }

  /** Row-level variant via the hash trick: ds2 reduced to keys + hash of
    * compared columns, left-joined — one shuffle, no wide row comparison
    * (reference capability: comparison/DataSynchronization.scala:278-334).
    */
  def matchRowLevel(
      ds1: DataFrame,
      ds2: DataFrame,
      colKeyMap: Map[String, String],
      matchColMap: Map[String, String]): DataFrame = {
    val hashCols1 = matchColMap.keys.toSeq.sorted.map(col)
    val hashCols2 = matchColMap.toSeq.sortBy(_._1).map { case (_, c2) => col(c2) }
    val a = ds1.withColumn("graft_hash", xxhash64(hashCols1: _*)).alias("graft_a")
    val bReduced = ds2
      .select(colKeyMap.values.toSeq.map(col) :+ xxhash64(hashCols2: _*).as("graft_hash2"): _*)
      .alias("graft_b")
    val keyCond = colKeyMap.map { case (c1, c2) =>
      col(s"graft_a.$c1") === col(s"graft_b.$c2")
    }.reduce(_ && _)
    a.join(bReduced, keyCond && col("graft_hash") === col("graft_hash2"), "left")
      .withColumn("graft_match_outcome", col("graft_hash2").isNotNull)
      .drop(colKeyMap.values.toSeq: _*)
      .drop("graft_hash", "graft_hash2")
  }
}
