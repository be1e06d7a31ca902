package graft.sketch

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta sketches — the set-OPERATION member of the persisted sketch
  * family ([[CountMin]] frequencies, [[Bloom]] membership, [[HllState]]
  * distinct counts): per group, a compact theta sketch of the distinct
  * value set, supporting UNION, INTERSECTION and DIFFERENCE estimates
  * between two states. THE cross-snapshot question HLL cannot answer:
  * "how many of yesterday's distinct documents does today's crawl
  * share, and how many are new" — at 100 TB, per group, without ever
  * joining the corpora (KB of sketch per group cross the wire, nothing
  * else).
  *
  * Below the nominal entry count (2^lgK) a theta sketch is EXACT; in
  * estimation mode relative error ~1/sqrt(2^lgK) per operand (set-op
  * results compound it — the q142 flags bound the realized error).
  * Values hash through `xxhash64` first (any column set sketchable,
  * the [[HllState]] convention).
  */
object Theta {

  /** Serializable union buffer: the live off-heap Union is transient;
    * java serialization writes the compact immutable form (the
    * [[KLLAggregator]] buffer convention).
    */
  final class ThetaBuffer(val lgK: Int) extends Serializable {
    @transient private var union: Union = newUnion()
    private def newUnion(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    def update(v: Long): Unit = union.update(v)
    def mergeIn(o: ThetaBuffer): ThetaBuffer = {
      union.union(o.result); this
    }
    def mergeBytes(bytes: Array[Byte]): ThetaBuffer = {
      union.union(Sketches.wrapSketch(Memory.wrap(bytes))); this
    }
    def result: CompactSketch = union.getResult

    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      val bytes = result.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      val n = in.readInt()
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      union = newUnion()
      union.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    }
  }

  final class ThetaAggregator(lgK: Int)
      extends Aggregator[java.lang.Long, ThetaBuffer, Array[Byte]] {
    override def zero: ThetaBuffer = new ThetaBuffer(lgK)
    override def reduce(b: ThetaBuffer, a: java.lang.Long): ThetaBuffer = {
      if (a != null) b.update(a.longValue())
      b
    }
    override def merge(a: ThetaBuffer, b: ThetaBuffer): ThetaBuffer =
      a.mergeIn(b)
    override def finish(b: ThetaBuffer): Array[Byte] = b.result.toByteArray
    override def bufferEncoder: Encoder[ThetaBuffer] =
      Encoders.javaSerialization[ThetaBuffer]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class BytesUnionAggregator(lgK: Int)
      extends Aggregator[Array[Byte], ThetaBuffer, Array[Byte]] {
    override def zero: ThetaBuffer = new ThetaBuffer(lgK)
    override def reduce(b: ThetaBuffer, a: Array[Byte]): ThetaBuffer = {
      if (a != null) b.mergeBytes(a)
      b
    }
    override def merge(a: ThetaBuffer, b: ThetaBuffer): ThetaBuffer =
      a.mergeIn(b)
    override def finish(b: ThetaBuffer): Array[Byte] = b.result.toByteArray
    override def bufferEncoder: Encoder[ThetaBuffer] =
      Encoders.javaSerialization[ThetaBuffer]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** (groupCols..., theta: binary) — one compact sketch per group. */
  def thetaState(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "thetaState needs a group column")
    require(valueCols.nonEmpty, "thetaState needs a value column")
    val aggFn = udaf(new ThetaAggregator(lgK))
    df.groupBy(groupCols.map(col): _*)
      .agg(aggFn(xxhash64(valueCols.map(col): _*)).as("theta"))
  }

  /** N-way fold of a frame holding MANY sketches per group (e.g. every
    * per-micro-batch part of a streaming ingest read as one frame) —
    * distinct union per group, commutative. Every non-`theta` column is
    * a group key.
    */
  def foldState(parts: DataFrame, lgK: Int = 12): DataFrame = {
    val groupCols = parts.columns.filterNot(_ == "theta").toSeq
    val aggFn = udaf(new BytesUnionAggregator(lgK))
    parts.groupBy(groupCols.map(col): _*)
      .agg(aggFn(col("theta")).as("theta"))
  }

  /** Fold states together (distinct union per group — commutative). */
  def mergeStates(a: DataFrame, b: DataFrame, lgK: Int = 12): DataFrame =
    foldState(a.unionByName(b), lgK)

  /** Per-group set-operation estimates between two states (FULL outer
    * on the group keys — a group present on one side reports the other
    * side as empty): `est_a`, `est_b`, `est_union`, `est_intersect`,
    * `est_a_not_b`, as rounded long estimates.
    */
  def overlap(a: DataFrame, b: DataFrame): DataFrame = {
    val groupCols = a.columns.filterNot(_ == "theta").toSeq
    def est(s: Array[Byte]): Double =
      if (s == null) 0.0
      else Sketches.wrapSketch(Memory.wrap(s)).getEstimate
    val f = udf((sa: Array[Byte], sb: Array[Byte]) => {
      val estA = est(sa)
      val estB = est(sb)
      val (u, i, d) =
        if (sa == null) (estB, 0.0, 0.0)
        else if (sb == null) (estA, 0.0, estA)
        else {
          val ska = Sketches.wrapSketch(Memory.wrap(sa))
          val skb = Sketches.wrapSketch(Memory.wrap(sb))
          val un = SetOperation.builder().buildUnion()
          un.union(ska); un.union(skb)
          val in = SetOperation.builder().buildIntersection()
          in.intersect(ska); in.intersect(skb)
          val ab = SetOperation.builder().buildANotB()
          (un.getResult.getEstimate, in.getResult.getEstimate,
            ab.aNotB(ska, skb).getEstimate)
        }
      (math.round(estA), math.round(estB), math.round(u),
        math.round(i), math.round(d))
    })
    a.withColumnRenamed("theta", "graft_ta")
      .join(b.withColumnRenamed("theta", "graft_tb"), groupCols, "full_outer")
      .withColumn("graft_o", f(col("graft_ta"), col("graft_tb")))
      .select(groupCols.map(col) ++ Seq(
        col("graft_o._1").as("est_a"),
        col("graft_o._2").as("est_b"),
        col("graft_o._3").as("est_union"),
        col("graft_o._4").as("est_intersect"),
        col("graft_o._5").as("est_a_not_b")): _*)
  }

  /** Theta-union aggregate over a BINARY sketch column — the scan-side
    * bridge for analyzers that fold a persisted per-group theta state
    * into one corpus-level sketch (null sketches skip).
    */
  def unionAggCol(c: Column, lgK: Int = 12): Column =
    udaf(new BytesUnionAggregator(lgK), Encoders.BINARY)(c)

  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  def readState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
