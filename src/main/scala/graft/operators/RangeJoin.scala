package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join — every (point, interval) pair
  * with `lo <= point <= hi` (and equal extra keys), without the
  * BroadcastNestedLoopJoin Spark plans for a bare inequality join.
  *
  * The scalable shape is bin bucketing: pick a bin width, explode each
  * interval into the bins it covers (bounded per interval), map each
  * point to the ONE bin containing it, equi-join on (keys, bin), and
  * apply the exact `lo <= p <= hi` residual filter. Because a point lives
  * in exactly one bin and an interval covers that bin at most once, the
  * join emits each qualifying pair exactly once — no dedup pass. Cost is
  * one equi-shuffle (or a broadcast when the exploded interval side is
  * small — AQE decides) instead of a |P|×|I| loop; bin width tunes the
  * explode factor against residual-filter selectivity.
  *
  * Intervals wider than `maxBinsPerInterval` bins fail LOUDLY inside the
  * expression (raise_error), not silently explode the cluster — resize
  * the bin width for genuinely wide intervals.
  */
object RangeJoin {

  /** Inner point-in-interval join. Point columns pass through; interval
    * payload columns arrive prefixed `rj_`.
    *
    * @param points      left side; `pointCol` must be integral (cast
    *                    timestamps to epoch micros first)
    * @param intervals   right side with `loCol`/`hiCol` integral bounds
    *                    (inclusive); rows with lo > hi are dropped
    * @param binWidth    bucketing granularity in `pointCol` units
    * @param extraKeyCols equi-keys present on both sides
    * @param payloadCols interval columns carried to the output
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      extraKeyCols: Seq[String] = Seq.empty,
      payloadCols: Seq[String] = Seq.empty,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val pCols = points.columns.toSeq
    require(!pCols.exists(c => c.startsWith("graft_") || c.startsWith("rj_")),
      "points must not contain graft_/rj_-prefixed columns")

    def bin(c: Column): Column = floor(c / binWidth)

    val nBins = bin(col(hiCol)) - bin(col(loCol)) + 1
    val guarded = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("graft_bins",
        when(nBins > maxBinsPerInterval,
          raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth; widen binWidth ("),
            col(loCol).cast("string"), lit(".."),
            col(hiCol).cast("string"), lit(")"))))
          .otherwise(sequence(bin(col(loCol)), bin(col(hiCol)))))

    val rSide = guarded.select(
      extraKeyCols.map(col) ++ Seq(
        col(loCol).as("graft_lo"),
        col(hiCol).as("graft_hi"),
        explode(col("graft_bins")).as("graft_bin")) ++
        payloadCols.map(c => col(c).as(s"rj_$c")): _*)

    val lSide = points.withColumn("graft_bin", bin(col(pointCol)))

    lSide.join(rSide,
        extraKeyCols.map(k => lSide(k) === rSide(k))
          .foldLeft(lSide("graft_bin") === rSide("graft_bin"))(_ && _) &&
          lSide(pointCol) >= rSide("graft_lo") &&
          lSide(pointCol) <= rSide("graft_hi"))
      .select(pCols.map(lSide.apply) ++
        Seq(col("graft_lo").as("rj_lo"), col("graft_hi").as("rj_hi")) ++
        payloadCols.map(c => col(s"rj_$c")): _*)
  }

  /** Interval-overlap join: every (left, right) pair whose inclusive
    * intervals intersect (and extra keys match). Both sides explode into
    * covered bins and equi-join; a shared pair would match in EVERY
    * shared bin, so each pair is emitted only in its FIRST shared bin —
    * max(bin(left.lo), bin(right.lo)), a responsibility assignment
    * evaluated as a residual predicate — keeping the exactly-once
    * contract without a dedup pass.
    *
    * Left columns pass through; right columns arrive as `oj_<col>` plus
    * `oj_lo`/`oj_hi`. Same bin-cap guard as [[rangeJoin]].
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      binWidth: Long,
      extraKeyCols: Seq[String] = Seq.empty,
      payloadCols: Seq[String] = Seq.empty,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val lCols = left.columns.toSeq
    require(!lCols.exists(c => c.startsWith("graft_") || c.startsWith("oj_")),
      "left side must not contain graft_/oj_-prefixed columns")

    def bin(c: Column): Column = floor(c / binWidth)

    def explodeBins(lo: String, hi: String): Column = {
      val nBins = bin(col(hi)) - bin(col(lo)) + 1
      when(nBins > maxBinsPerInterval,
        raise_error(concat(
          lit(s"intervalOverlapJoin: interval spans more than " +
            s"$maxBinsPerInterval bins at binWidth=$binWidth ("),
          col(lo).cast("string"), lit(".."),
          col(hi).cast("string"), lit(")"))))
        .otherwise(sequence(bin(col(lo)), bin(col(hi))))
    }

    val lSide = left.where(col(leftLo) <= col(leftHi))
      .withColumn("graft_bin",
        explode(explodeBins(leftLo, leftHi)))
    val rSide = right.where(col(rightLo) <= col(rightHi))
      .select(
        extraKeyCols.map(col) ++ Seq(
          col(rightLo).as("oj_lo"),
          col(rightHi).as("oj_hi")) ++
          payloadCols.map(c => col(c).as(s"oj_$c")): _*)
      .withColumn("graft_bin",
        explode(explodeBins("oj_lo", "oj_hi")))

    lSide.join(rSide,
        extraKeyCols.map(k => lSide(k) === rSide(k))
          .foldLeft(lSide("graft_bin") === rSide("graft_bin"))(_ && _) &&
          lSide(leftLo) <= rSide("oj_hi") &&
          rSide("oj_lo") <= lSide(leftHi) &&
          // first-shared-bin responsibility: emit once per pair
          lSide("graft_bin") ===
            greatest(bin(lSide(leftLo)), bin(rSide("oj_lo"))))
      .select(lCols.map(lSide.apply) ++
        Seq(rSide("oj_lo"), rSide("oj_hi")) ++
        payloadCols.map(c => rSide(s"oj_$c")): _*)
  }
}
