package graft.sketch

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-group KLL quantile state — the QUANTILE member of the persisted
  * sketch family ([[CountMin]] frequencies, [[Bloom]] membership,
  * [[HllState]] distinct counts, [[Theta]] set operations): one
  * serialized KLL sketch per group, built in a single map-side-combining
  * pass, folded across parquet-staged batches in any order (KLL merge is
  * commutative up to its published rank-error bound), and queried for
  * any quantile without rescanning the corpus. THE length/score-drift
  * question at 100 TB: "what is each source's p50/p95 document length
  * today vs last week" from KB of sketch per group.
  *
  * reference capability: the ungrouped KLL runner
  * (analyzers/runners/KLLRunner.scala); the grouped persisted-state form
  * is part of the beyond-reference pipeline family.
  */
object KllGroupState {

  /** Fold serialized KLL sketches (null inputs skip) into one sketch. */
  private final class BytesMergeAggregator(
      sketchSize: Int, shrinkingFactor: Double)
      extends Aggregator[Array[Byte], KLLSketch, Array[Byte]] {
    override def zero: KLLSketch = {
      val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
      new KLLSketch(sketchSize, shrinkingFactor,
        seed = (pid.toLong << 20) ^ 0x5851f42d4c957f2dL)
    }
    override def reduce(b: KLLSketch, a: Array[Byte]): KLLSketch =
      if (a == null) b else b.merge(KLLSketch.deserialize(a))
    override def merge(b1: KLLSketch, b2: KLLSketch): KLLSketch = b1.merge(b2)
    override def finish(r: KLLSketch): Array[Byte] = r.serialize()
    override def bufferEncoder: Encoder[KLLSketch] =
      Encoders.javaSerialization[KLLSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate column folding serialized sketches — shared by
    * [[mergeStates]] and the from-state analyzers
    * ([[graft.operators.ApproxQuantileFromState]]).
    */
  def mergeAggCol(
      c: Column,
      sketchSize: Int = KLLSketch.DefaultSketchSize,
      shrinkingFactor: Double = KLLSketch.DefaultShrinkingFactor): Column =
    udaf(new BytesMergeAggregator(sketchSize, shrinkingFactor),
      Encoders.BINARY)(c)

  /** (groupCols..., kll: binary) — one serialized sketch per group over
    * the (cast-to-double, null-skipping) value column.
    */
  def quantileState(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      sketchSize: Int = KLLSketch.DefaultSketchSize): DataFrame = {
    require(groupCols.nonEmpty, "quantileState needs a group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(KLLAggregator.sketchBytes(col(valueCol).cast(DoubleType),
        sketchSize).as("kll"))
  }

  /** N-way fold of a frame holding MANY sketches per group (e.g. every
    * per-micro-batch part of a streaming ingest read as one frame) —
    * per-group sketch merge, any batch order within the rank-error
    * bound. Every non-`kll` column is a group key.
    */
  def foldState(
      parts: DataFrame,
      sketchSize: Int = KLLSketch.DefaultSketchSize): DataFrame = {
    val groupCols = parts.columns.filterNot(_ == "kll").toSeq
    parts.groupBy(groupCols.map(col): _*)
      .agg(mergeAggCol(col("kll"), sketchSize).as("kll"))
  }

  /** Fold states (or a state and a new batch's state) — per-group sketch
    * merge, any batch order within the rank-error bound.
    */
  def mergeStates(
      a: DataFrame,
      b: DataFrame,
      sketchSize: Int = KLLSketch.DefaultSketchSize): DataFrame =
    foldState(a.unionByName(b), sketchSize)

  /** (groupCols..., q_1..q_n) — the requested quantiles per group from a
    * (possibly merged, possibly parquet-reloaded) state; column names
    * come from `names` (defaults to q1..qn).
    */
  def quantiles(
      state: DataFrame,
      qs: Seq[Double],
      names: Seq[String] = Seq.empty): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    require(qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0, 1]")
    val colNames =
      if (names.nonEmpty) { require(names.length == qs.length); names }
      else qs.indices.map(i => s"q${i + 1}")
    val groupCols = state.columns.filterNot(_ == "kll").toSeq
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val sk = KLLSketch.deserialize(bytes)
        if (sk.count == 0L) null else qs.map(sk.quantile).toArray
      })
    state
      .withColumn("graft_qs", f(col("kll")))
      .select(groupCols.map(col) ++ colNames.zipWithIndex.map {
        case (n, i) => element_at(col("graft_qs"), i + 1).as(n)
      }: _*)
  }

  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
