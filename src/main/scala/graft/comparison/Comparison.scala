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
    // ONE job: left join against the distinct reference keys (Catalyst
    // broadcasts the small build side or shuffles on the key at scale)
    // with total and matched fused into a single aggregation — a separate
    // count() would scan the large primary twice, and non-atomically
    val refKeys = reference
      .select(col(referenceColumn).as(column)).distinct()
      .withColumn("graft_ri_hit", lit(true))
    val row = primary
      .filter(col(column).isNotNull)
      .join(refKeys, Seq(column), "left")
      .agg(count(lit(1)),
        coalesce(sum(when(col("graft_ri_hit"), 1L).otherwise(0L)), lit(0L)))
      .collect().head
    val total = row.getLong(0)
    if (total == 0L) 1.0 else row.getLong(1).toDouble / total
  }

  /** Row-level variant: original rows plus `graft_ri_outcome` — true/false
    * for non-null keys, NULL for null keys. The aggregate [[subsetCheck]]
    * excludes null keys from its denominator, so the row-level outcome is
    * ternary to stay reconstructable: `avg(graft_ri_outcome)` (which skips
    * nulls) equals the aggregate ratio; marking null keys false would
    * contradict it on the same data.
    */
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
      .withColumn("graft_ri_outcome",
        when(col(column).isNull, lit(null))
          .otherwise(coalesce(col("graft_ri_hit"), lit(false))))
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
    // Locale.ROOT: the default-locale toLowerCase turns "ID" into a
    // dotless-i form under a Turkish JVM locale, failing schemas that are
    // case-insensitively identical
    def norm(df: DataFrame) =
      df.schema.fields
        .map(f => (f.name.toLowerCase(java.util.Locale.ROOT), f.dataType))
        .sortBy(_._1).toSeq
    norm(df1) == norm(df2)
  }
}

/** Aggregate + row-level dataset match
  * (reference capability: comparison/DataSynchronization.scala:249-334).
  */
object DatasetMatch {

  /** Ratio of ds1 rows with a matching ds2 row: equi-join on `colKeyMap`,
    * equality on `matchColMap` (or full key-match when empty). A LEFT SEMI
    * join counts each ds1 row at most once, so duplicate ds2 rows can
    * neither inflate the ratio past 1.0 nor mask unmatched rows (an inner
    * join's count would do both — the reference validates ds2 key
    * uniqueness for the same reason).
    */
  def matchRatio(
      ds1: DataFrame,
      ds2: DataFrame,
      colKeyMap: Map[String, String],
      matchColMap: Map[String, String] = Map.empty): Try[Double] = Try {
    require(colKeyMap.nonEmpty, "colKeyMap must name at least one key column")
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
    val matched = a.join(b, matchCond, "left_semi").count()
    matched.toDouble / total
  }

  /** Null-sensitive hash of `cols`: xxhash64 SKIPS null children, so two
    * rows whose columns differ only in WHICH one is null would otherwise
    * hash identically; interleaving each column's isnull flag keeps the
    * processed-children sequence distinct and matches `<=>` semantics.
    * Empty input (key-only matching) hashes to a constant.
    */
  private def nullSafeHash(cols: Seq[Column]): Column =
    if (cols.isEmpty) lit(0L)
    else xxhash64(cols.flatMap(c => Seq(isnull(c).cast("int"), c)): _*)

  /** Row-level variant via the hash trick: ds2 reduced to keys + hash of
    * compared columns (deduplicated — an exact-duplicate ds2 row must not
    * fan the left join out past 1:1 with ds1), left-joined — one shuffle,
    * no wide row comparison. ds2's key columns are renamed to reserved
    * names before the join so dropping them afterwards cannot also drop
    * same-named ds1 columns
    * (reference capability: comparison/DataSynchronization.scala:278-334).
    */
  def matchRowLevel(
      ds1: DataFrame,
      ds2: DataFrame,
      colKeyMap: Map[String, String],
      matchColMap: Map[String, String]): DataFrame = {
    require(colKeyMap.nonEmpty, "colKeyMap must name at least one key column")
    val hashCols1 = matchColMap.keys.toSeq.sorted.map(col)
    val hashCols2 = matchColMap.toSeq.sortBy(_._1).map { case (_, c2) => col(c2) }
    val a = ds1.withColumn("graft_hash", nullSafeHash(hashCols1)).alias("graft_a")
    val keyRename: Map[String, String] = colKeyMap.values.toSeq.distinct
      .zipWithIndex.map { case (c2, i) => c2 -> s"graft_key$i" }.toMap
    val bReduced = ds2
      .select(keyRename.toSeq.map { case (c2, tmp) => col(c2).as(tmp) } :+
        nullSafeHash(hashCols2).as("graft_hash2"): _*)
      .distinct()
      .alias("graft_b")
    val keyCond = colKeyMap.map { case (c1, c2) =>
      col(s"graft_a.$c1") === col(s"graft_b.${keyRename(c2)}")
    }.reduce(_ && _)
    a.join(bReduced, keyCond && col("graft_hash") === col("graft_hash2"), "left")
      .withColumn("graft_match_outcome", col("graft_hash2").isNotNull)
      .drop(keyRename.values.toSeq: _*)
      .drop("graft_hash", "graft_hash2")
  }
}
