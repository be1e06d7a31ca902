package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.Bloom

/** Join execution techniques for the shapes AQE can't fix by itself:
  * hot-key salting (skewed aggregate-free equi-joins) and bloom-
  * prefiltered semi-joins (selective semi-joins whose build side is too
  * big to broadcast as a hash table but fits as BITS). Both preserve
  * exact join semantics — the technique changes the plan, never the
  * answer, and the oracles pin that.
  */
object JoinOps {

  /** Inner equi-join with the right side replicated `saltFactor` times
    * and the left side routed by a deterministic salt — the classic
    * skew-mitigation for a hot join key: the hot key's rows spread over
    * `saltFactor` reducers instead of serializing on one. Results are
    * EXACTLY the plain inner join's rows (each left row carries one
    * salt; the right copy with that salt is unique).
    *
    * `saltSourceCol` drives the left salt (any column; a unique id gives
    * the evenest spread). Right columns arrive `sj_`-prefixed. Use when
    * the right side is too big to broadcast but small enough that
    * `saltFactor` copies are acceptable — the textbook regime between
    * broadcast and a skew-doomed shuffle join.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      saltSourceCol: String,
      saltFactor: Int,
      rightPayloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "saltedJoin needs at least one key column")
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val lCols = left.columns.toSeq
    require(!lCols.exists(c => c.startsWith("graft_") ||
      c.startsWith("sj_")),
      "left side must not contain graft_/sj_-prefixed columns")
    val lSide = left.withColumn("graft_salt",
      pmod(xxhash64(col(saltSourceCol)), lit(saltFactor.toLong)))
    val rSide = right.select(
      keyCols.map(col) ++
        rightPayloadCols.map(c => col(c).as(s"sj_$c")): _*)
      .withColumn("graft_salt",
        explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    lSide.join(rSide,
        keyCols.map(k => lSide(k) === rSide(k))
          .foldLeft(lSide("graft_salt") === rSide("graft_salt"))(_ && _))
      .select(lCols.map(lSide.apply) ++
        rightPayloadCols.map(c => col(s"sj_$c")): _*)
  }

  /** Left-semi join through a bloom prefilter: a bitset over the right
    * side's keys rides into the left scan as a broadcast and kills
    * non-members map-side (no false negatives — survivors are a superset
    * of true members), then an exact semi-join on the survivors removes
    * the false positives. The left side never shuffles in full; only
    * bloom survivors do. Use when the right key set is too big for a
    * broadcast hash join but fits as bits (1B keys ≈ 1.2 GB at 1% fpp).
    *
    * Keys are compared through `xxhash64` on BOTH the bloom and the
    * exact verify, so any key type works; hash collisions cannot create
    * false members because the verify join also matches the raw keys.
    */
  def bloomSemiJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    require(keyCols.nonEmpty, "bloomSemiJoin needs at least one key column")
    val keyHash: DataFrame => Column =
      df => xxhash64(keyCols.map(df.apply): _*)
    val bloom = Bloom.build(right, keyHash(right), expectedItems, fpp)
    val survivors = left
      .where(Bloom.mightContainCol(bloom)(keyHash(left)))
    survivors.join(right.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_semi")
  }
}
