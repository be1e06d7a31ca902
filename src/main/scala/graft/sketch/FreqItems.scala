package graft.sketch

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Serialized Misra-Gries summary: up to `capacity` counters plus the
  * total stream weight `n` folded in (including pruned mass). The
  * deterministic guarantee carried by every summary this module
  * produces, regardless of partitioning or merge order:
  *
  *   est(x) <= true(x) <= est(x) + (n - S) / (capacity + 1)
  *
  * where S = sum of surviving counter values and est(x) = 0 for absent
  * items (Misra-Gries 1982; merge rule and bound from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). In particular every item with
  * true(x) > (n - S) / (capacity + 1) is PRESENT in the summary, and
  * when `capacity` >= the group's distinct-item count no pruning ever
  * fires, so the summary is EXACT (the theta-sketch exact-mode analogue).
  */
case class Mg(counters: Map[String, Long], n: Long)

/** Per-group frequent-items state — the FREQUENCY member of the
  * persisted sketch family ([[CountMin]] point frequencies with a known
  * candidate set, [[Bloom]] membership, [[HllState]] distinct counts,
  * [[Theta]] set operations, [[KllGroupState]] quantiles): one bounded
  * Misra-Gries counter map per group, built in a single
  * map-side-combining pass, folded across parquet-staged batches in any
  * order, and queried for heavy hitters without rescanning the corpus —
  * unlike CMS it needs NO candidate set, the summary IS the candidates.
  * THE "which tokens/domains dominate each source today" question at
  * 100 TB from KB of state per group.
  *
  * reference capability: none (deequ's Histogram materializes exact
  * frequencies); part of the beyond-reference pipeline family.
  */
object FreqItems {

  val DefaultCapacity = 64

  /** Mutable fold buffer; `counters` may temporarily hold up to
    * 2×capacity entries between amortized prunes.
    */
  final class MgBuffer(
      val counters: mutable.HashMap[String, Long],
      var n: Long) extends Serializable

  /** Subtract the (capacity+1)-th largest counter value from every
    * counter and drop the non-positive — at most `capacity` survive, and
    * total mass shed >= (capacity+1) × the per-item undercount added,
    * which is what preserves the (n - S) / (capacity + 1) bound.
    */
  private def prune(b: MgBuffer, capacity: Int): Unit = {
    if (b.counters.size > capacity) {
      val vals = b.counters.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      b.counters.filterInPlace((_, v) => v > cut)
      if (cut > 0L) b.counters.mapValuesInPlace((_, v) => v - cut)
      b.counters.filterInPlace((_, v) => v > 0L)
    }
  }

  private def mergeInto(b: MgBuffer, counters: Map[String, Long], n: Long,
      capacity: Int): Unit = {
    counters.foreach { case (k, v) => b.counters.update(k, b.counters.getOrElse(k, 0L) + v) }
    b.n += n
    prune(b, capacity)
  }

  /** Builds one summary per group from raw items (nulls skip). */
  private final class MgAggregator(capacity: Int)
      extends Aggregator[String, MgBuffer, Mg] {
    override def zero: MgBuffer = new MgBuffer(mutable.HashMap.empty, 0L)
    override def reduce(b: MgBuffer, item: String): MgBuffer = {
      if (item != null) {
        b.n += 1L
        b.counters.update(item, b.counters.getOrElse(item, 0L) + 1L)
        if (b.counters.size > 2 * capacity) prune(b, capacity)
      }
      b
    }
    override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
      mergeInto(b1, b2.counters.toMap, b2.n, capacity)
      b1
    }
    override def finish(b: MgBuffer): Mg = {
      prune(b, capacity)
      Mg(b.counters.toMap, b.n)
    }
    override def bufferEncoder: Encoder[MgBuffer] =
      Encoders.javaSerialization[MgBuffer]
    override def outputEncoder: Encoder[Mg] = Encoders.product[Mg]
  }

  /** Boxed mirror of [[Mg]] for the merge aggregator's INPUT side: a
    * null state row (e.g. filtered away by a `where` selection) decodes
    * as (null, null) — a primitive Long field would throw in the encoder
    * before any null guard could run.
    */
  private[sketch] case class MgIn(counters: Map[String, Long], n: java.lang.Long)

  /** Folds summaries (null rows skip) into one summary of the combined
    * stream; `capacity` bounds the RESULT (inputs may have been built at
    * any capacity — folding at a larger capacity only refines error).
    */
  private final class MgMergeAggregator(capacity: Int)
      extends Aggregator[MgIn, MgBuffer, Mg] {
    override def zero: MgBuffer = new MgBuffer(mutable.HashMap.empty, 0L)
    override def reduce(b: MgBuffer, a: MgIn): MgBuffer = {
      if (a != null && a.counters != null && a.n != null) {
        mergeInto(b, a.counters, a.n, capacity)
      }
      b
    }
    override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
      mergeInto(b1, b2.counters.toMap, b2.n, capacity)
      b1
    }
    override def finish(b: MgBuffer): Mg = {
      prune(b, capacity)
      Mg(b.counters.toMap, b.n)
    }
    override def bufferEncoder: Encoder[MgBuffer] =
      Encoders.javaSerialization[MgBuffer]
    override def outputEncoder: Encoder[Mg] = Encoders.product[Mg]
  }

  /** Aggregate column building a summary from a string item column. */
  def sketchAggCol(c: Column, capacity: Int = DefaultCapacity): Column =
    udaf(new MgAggregator(capacity), Encoders.STRING)(c)

  /** Aggregate column folding `mg` struct columns — shared by
    * [[mergeStates]] and the from-state analyzer
    * ([[graft.operators.ApproxItemFrequencyFromState]]). The product
    * encoder flattens [[Mg]] into two UDAF parameters, so the struct's
    * fields are passed separately.
    */
  def mergeAggCol(c: Column, capacity: Int = 4096): Column =
    udaf(new MgMergeAggregator(capacity), Encoders.product[MgIn])(
      c.getField("counters"), c.getField("n"))

  /** (groupCols..., mg: struct&lt;counters: map&lt;string,bigint&gt;, n: bigint&gt;)
    * — one summary per group over the (null-skipping) item column.
    */
  def freqState(df: DataFrame, groupCols: Seq[String], itemCol: String,
      capacity: Int = DefaultCapacity): DataFrame = {
    require(groupCols.nonEmpty, "freqState needs a group column")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    df.groupBy(groupCols.map(col): _*)
      .agg(sketchAggCol(col(itemCol), capacity).as("mg"))
  }

  /** [[freqState]] over PRE-AGGREGATED (item, weight) rows — the shape a
    * tokenizer or upstream groupBy hands over. Each row is treated as a
    * one-item summary of `weight` occurrences and folded through the
    * merge aggregator, so the Misra-Gries bound holds with n = the total
    * weight. Null items or null/non-positive weights skip.
    */
  def freqStateWeighted(df: DataFrame, groupCols: Seq[String],
      itemCol: String, weightCol: String,
      capacity: Int = DefaultCapacity): DataFrame = {
    require(groupCols.nonEmpty, "freqStateWeighted needs a group column")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val w = col(weightCol).cast("long")
    val asCell = when(col(itemCol).isNotNull && w > 0L,
      struct(map(col(itemCol), w).as("counters"), w.as("n")))
    df.groupBy(groupCols.map(col): _*)
      .agg(mergeAggCol(asCell, capacity).as("mg"))
  }

  /** N-way fold of a frame holding MANY summaries per group (e.g. every
    * per-micro-batch part of a streaming ingest read as one frame) —
    * per-group summary merge, any batch order within the Misra-Gries
    * bound. Every non-`mg` column is a group key.
    */
  def foldState(parts: DataFrame, capacity: Int = DefaultCapacity): DataFrame = {
    val groupCols = parts.columns.filterNot(_ == "mg").toSeq
    parts.groupBy(groupCols.map(col): _*)
      .agg(mergeAggCol(col("mg"), capacity).as("mg"))
  }

  /** Fold states (or a state and a new batch's state) — per-group
    * summary merge, any batch order within the Misra-Gries bound.
    */
  def mergeStates(a: DataFrame, b: DataFrame,
      capacity: Int = DefaultCapacity): DataFrame =
    foldState(a.unionByName(b), capacity)

  /** (groupCols..., item, est, n, err) — every summary item whose upper
    * bound est + err reaches phi×n, where err = (n - S)/(capacity + 1)
    * is the group's deterministic undercount bound. GUARANTEED to
    * contain every item with true frequency > phi×n PROVIDED `capacity`
    * is <= the smallest capacity the summaries were built/folded at:
    * err shrinks as capacity grows, so passing a LARGER value than the
    * build capacity understates the undercount bound and can silently
    * drop a guaranteed item. (A smaller value only widens err — sound,
    * less precise.) The guarantee is also vacuous for items the summary
    * evicted entirely when phi×n < err — choose capacity > 1/phi at
    * build time so phi×n >= err always holds.
    */
  def heavyHitters(state: DataFrame, phi: Double,
      capacity: Int = DefaultCapacity): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    val groupCols = state.columns.filterNot(_ == "mg").toSeq
    val s = aggregate(map_values(col("mg.counters")), lit(0L), _ + _)
    val err = (col("mg.n") - s).cast("double") / (capacity + 1.0)
    state
      .withColumn("graft_err", err)
      .select((groupCols.map(col) :+ col("mg.n").as("n") :+
        col("graft_err").as("err") :+
        explode(col("mg.counters")).as(Seq("item", "est"))): _*)
      .where(col("est") + col("err") >= lit(phi) * col("n"))
      .select((groupCols.map(col) :+ col("item") :+ col("est") :+
        col("n") :+ col("err")): _*)
  }

  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
