package graft.sketch

import scala.collection.concurrent.TrieMap

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** KLL sketch as a Spark `Aggregator`: one fused-scan slot per (column,
  * where, params) yielding the serialized sketch bytes. This is what makes
  * approximate quantiles carry a MERGEABLE state — partial sketches union
  * losslessly across partitions, days or table shards, so ApproxQuantile
  * participates in `aggregateWith`/`runOnAggregatedStates`/state
  * persistence exactly like the moment and HLL states (reference
  * capability: catalyst/StatefulApproxQuantile.scala:29-125, which persists
  * a serialized PercentileDigest for the same reason).
  *
  * Spark plans a `udaf`-registered Aggregator as a TypedImperativeAggregate
  * (object buffer held live per partition, serialized only at exchange
  * boundaries) — the same physical shape as the built-in `percentile` /
  * `percentile_approx` the scan family already fuses with.
  */
case class KLLAggregator(sketchSize: Int, shrinkingFactor: Double)
    extends Aggregator[java.lang.Double, KLLSketch, Array[Byte]] {

  override def zero: KLLSketch = {
    // partition-derived seed: deterministic for a fixed partitioning while
    // keeping per-partition compaction coin flips uncorrelated (the KLL
    // error bound assumes independence); TaskContext is null only in
    // driver-local evaluation, where a fixed seed is fine
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
    new KLLSketch(sketchSize, shrinkingFactor,
      seed = (pid.toLong << 20) ^ 0x9e3779b97f4a7cL)
  }

  override def reduce(b: KLLSketch, a: java.lang.Double): KLLSketch = {
    if (a != null) b.update(a.doubleValue())
    b
  }

  override def merge(b1: KLLSketch, b2: KLLSketch): KLLSketch = b1.merge(b2)

  override def finish(r: KLLSketch): Array[Byte] = r.serialize()

  override def bufferEncoder: Encoder[KLLSketch] = Encoders.javaSerialization[KLLSketch]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KLLAggregator {

  private val cache = new TrieMap[(Int, Double), UserDefinedFunction]

  /** Fused-scan aggregation slot: serialized KLL sketch of `c`'s non-null
    * values. The UserDefinedFunction is cached per parameter set so
    * identical slots contributed by different analyzers (ApproxQuantile at
    * several quantiles, ApproxQuantiles) are semantically equal and
    * Catalyst deduplicates them into ONE sketch buffer — the same sharing
    * the exact-percentile family gets from the built-in `percentile`.
    */
  def sketchBytes(
      c: Column,
      sketchSize: Int = KLLSketch.DefaultSketchSize,
      shrinkingFactor: Double = KLLSketch.DefaultShrinkingFactor): Column = {
    val f = cache.getOrElseUpdate((sketchSize, shrinkingFactor),
      udaf(KLLAggregator(sketchSize, shrinkingFactor), Encoders.DOUBLE))
    f(c)
  }

  /** Sketch size for a requested relative rank error: the compactor
    * hierarchy's normalized rank error shrinks ~linearly in the sketch
    * size, and the default (2048) is sized for the default 1% request;
    * clamped so extreme requests stay within executor-memory reason.
    */
  def sketchSizeFor(relativeError: Double): Int = {
    require(relativeError > 0.0 && relativeError < 1.0,
      "relativeError must be in (0, 1)")
    math.max(256, math.min(1 << 16,
      math.ceil(KLLSketch.DefaultSketchSize * (0.01 / relativeError)).toInt))
  }

  /** Decodes a [[sketchBytes]] slot from the fused result row: None for an
    * empty sketch (all inputs NULL), mirroring every other scan state.
    */
  def stateAt(result: org.apache.spark.sql.Row, offset: Int): Option[KLLState] =
    if (result.isNullAt(offset)) None
    else {
      val sketch = KLLSketch.deserialize(result.getAs[Array[Byte]](offset))
      if (sketch.count == 0L) None else Some(KLLState(sketch))
    }
}
