package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic CONSISTENT sampling — the sample-as-state member of
  * the persisted-monoid family: per group, the k rows with the
  * smallest (md5-prefix hash, id) rank ([[Mixing.sampleHash]], the
  * mixture family's replayable hash convention). Bottom-k by a fixed
  * hash is a true commutative monoid (min-k of a union = min-k of the
  * parts' min-k's), so daily batches fold into a parquet-persisted
  * sample in any order, the sample only ever REFINES (a row once
  * evicted never returns), and two pipelines sampling the same ids
  * agree row-for-row — the property "10% random sample" jobs lose the
  * moment data arrives twice.
  *
  * Scale shape: one groupBy over a bounded-heap aggregate
  * (ObjectHashAggregate, map-side partial combine — each input
  * partition contributes at most k candidates per group), never a
  * per-group sort or window; state size is groups × k rows.
  */
object Sampling {

  /** Bounded max-heap over (hash, id) pairs keeping the k smallest —
    * the string-keyed sibling of [[graft.pipeline.Capping.CapState]].
    */
  final class MinKState(val k: Int) extends Serializable {
    var size: Int = 0
    var hs = new Array[String](math.min(k, 16))
    var ids = new Array[Long](math.min(k, 16))

    private def less(h1: String, i1: Long, h2: String, i2: Long): Boolean = {
      val c = h1.compareTo(h2)
      c < 0 || (c == 0 && i1 < i2)
    }
    private def swap(i: Int, j: Int): Unit = {
      val th = hs(i); hs(i) = hs(j); hs(j) = th
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }
    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) >> 1
        if (less(hs(p), ids(p), hs(i), ids(i))) { swap(i, p); i = p }
        else return
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && less(hs(m), ids(m), hs(l), ids(l))) m = l
        if (r < size && less(hs(m), ids(m), hs(r), ids(r))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }
    def insert(h: String, id: Long): Unit = {
      if (size < k) {
        if (size == hs.length) {
          val next = math.min(k.toLong, hs.length.toLong * 2).toInt
          hs = java.util.Arrays.copyOf(hs, next)
          ids = java.util.Arrays.copyOf(ids, next)
        }
        hs(size) = h; ids(size) = id; size += 1; siftUp(size - 1)
      } else if (less(h, id, hs(0), ids(0))) {
        hs(0) = h; ids(0) = id; siftDown()
      }
    }
    def mergeIn(o: MinKState): MinKState = {
      var i = 0
      while (i < o.size) { insert(o.hs(i), o.ids(i)); i += 1 }
      this
    }
    def sortedAsc: Seq[(String, Long)] =
      (0 until size).map(i => (hs(i), ids(i)))
        .sortBy(identity)
  }

  final class BottomKAggregator(k: Int)
      extends Aggregator[(String, Long), MinKState, Seq[(String, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: MinKState = new MinKState(k)
    override def reduce(b: MinKState, a: (String, Long)): MinKState = {
      if (a._1 != null) b.insert(a._1, a._2)
      b
    }
    override def merge(a: MinKState, b: MinKState): MinKState = a.mergeIn(b)
    override def finish(b: MinKState): Seq[(String, Long)] = b.sortedAsc
    override def bufferEncoder: org.apache.spark.sql.Encoder[MinKState] =
      org.apache.spark.sql.Encoders.kryo[MinKState]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** The per-group consistent sample: (groupCols..., idCol, sample_hash,
    * rank 1..k by ascending (hash, id)). Null-id rows rank null and are
    * never sampled (the [[Mixing.sampleHash]] contract); ids must be
    * integral. The output IS the state — persist it as parquet and fold
    * the next batch's sample in with [[mergeSamples]].
    */
  def bottomKSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      seed: String = "graft"): DataFrame = {
    require(groupCols.nonEmpty, "bottomKSample needs a group column")
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"bottomKSample needs an integral id column; '$idCol' is " +
        idType.simpleString)
    fromRanked(df.select(groupCols.map(col) :+ col(idCol).cast(LongType)
      .as("graft_sid") :+ Mixing.sampleHash(col(idCol), seed)
      .as("graft_sh"): _*), groupCols, idCol, idType, k)
  }

  /** Fold two samples (states) of the SAME (groupCols, k, seed)
    * parameterization: min-k of the concatenation.
    */
  def mergeSamples(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    val u = a.unionByName(b)
    val idType = u.schema(idCol).dataType
    fromRanked(u.select(groupCols.map(col) :+ col(idCol).cast(LongType)
      .as("graft_sid") :+ col("sample_hash").as("graft_sh"): _*),
      groupCols, idCol, idType, k)
  }

  private def fromRanked(
      ranked: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      idType: org.apache.spark.sql.types.DataType,
      k: Int): DataFrame = {
    val aggFn =
      udaf(new BottomKAggregator(k), ExpressionEncoder[(String, Long)]())
    ranked
      // Null ids rank null and are never sampled; the input encoder's
      // Long field is non-nullable, so they must be dropped BEFORE the
      // aggregate (a null graft_sid would fail AssertNotNull, not skip).
      .filter(col("graft_sid").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(aggFn(col("graft_sh"), col("graft_sid")).as("graft_sample"))
      .select(groupCols.map(col) :+
        posexplode(col("graft_sample")).as(Seq("graft_pos", "graft_t")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("graft_t._2").cast(idType).as(idCol),
        col("graft_t._1").as("sample_hash"),
        (col("graft_pos") + 1).cast(IntegerType).as("rank")): _*)
  }
}
