package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a string column —
  * the bounded-memory frequency primitive next to KLL (quantiles) and HLL
  * (cardinality): a depth × width counter matrix where item estimates are
  * the MINIMUM over d seeded-hash rows. Two properties carry the design:
  *
  *  - NEVER underestimates: `estimate(x) >= true_count(x)` always (each
  *    row's counter absorbs x's full count plus collisions). So a
  *    heavy-hitter scan that keeps items with `estimate >= threshold` is
  *    a SUPERSET of the true `count >= threshold` set — candidates can
  *    then be exact-counted in a second, bounded pass.
  *  - PERFECT monoid: the counter matrix of a union is the element-wise
  *    sum of the parts' matrices, integer-exact — the deequ state-algebra
  *    convention (sketch per shard/day, merge, query once).
  *
  * Scale shape: the build is one corpus scan through a map-side-combining
  * `Aggregator` whose buffer is the depth × width long matrix (4 × 2048 =
  * 64 KB — thousands of tasks partial-combine locally, the shuffle carries
  * numTasks matrices, never items). The heavy-hitter pass broadcasts the
  * finished sketch into a map-side filter (`estimate >= threshold` via a
  * closure UDF — the sketch is data, not a join side), and only the
  * surviving candidate terms reach the exact-count groupBy: at 100 TB the
  * full (term, count) table may not fit anywhere, but the
  * above-threshold slice is bounded by construction (≤ N/threshold
  * distinct items can exceed threshold).
  *
  * reference capability: none (deequ sketches quantiles and cardinality,
  * not frequencies); part of the beyond-reference pipeline family.
  */
object CountMin {

  /** A finished sketch: `table` is row-major depth × width, `total` the
    * number of items offered. Immutable; `estimate` is driver/executor
    * cheap (d hashes + d reads).
    */
  final case class CmsSketch(
      depth: Int,
      width: Int,
      seed: Int,
      total: Long,
      table: Array[Long]) {

    def estimate(item: String): Long = {
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = table(i * width + CountMin.bucket(item, seed + i, width))
        if (c < best) best = c
        i += 1
      }
      if (best == Long.MaxValue) 0L else best
    }

    /** Element-wise sum — the exact monoid merge. */
    def mergeWith(o: CmsSketch): CmsSketch = {
      require(depth == o.depth && width == o.width && seed == o.seed,
        s"incompatible sketches: ($depth,$width,$seed) vs " +
          s"(${o.depth},${o.width},${o.seed})")
      val t = new Array[Long](table.length)
      var i = 0
      while (i < t.length) { t(i) = table(i) + o.table(i); i += 1 }
      CmsSketch(depth, width, seed, total + o.total, t)
    }
  }

  /** Row hash: Murmur3 over the string with a per-row seed, folded into
    * [0, width). Deterministic across JVMs (MurmurHash3.stringHash is a
    * pure function of the UTF-16 contents).
    */
  private[sketch] def bucket(item: String, rowSeed: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(item, rowSeed)
    ((h % width) + width) % width
  }

  final class CmsBuffer(
      var total: Long,
      var table: Array[Long]) extends Serializable

  /** The map-side-combining build: buffer = the counter matrix. */
  final class CmsAggregator(depth: Int, width: Int, seed: Int)
      extends Aggregator[String, CmsBuffer, (Long, Seq[Long])] {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")

    override def zero: CmsBuffer =
      new CmsBuffer(0L, new Array[Long](depth * width))

    override def reduce(b: CmsBuffer, item: String): CmsBuffer = {
      if (item != null) {
        var i = 0
        while (i < depth) {
          b.table(i * width + bucket(item, seed + i, width)) += 1L
          i += 1
        }
        b.total += 1L
      }
      b
    }

    override def merge(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
      var i = 0
      while (i < a.table.length) { a.table(i) += b.table(i); i += 1 }
      a.total += b.total
      a
    }

    // output rides an ExpressionEncoder (struct of (total, table)) — a
    // kryo-encoded case class would surface as raw bytes in the Row
    override def finish(b: CmsBuffer): (Long, Seq[Long]) =
      (b.total, b.table.toSeq)

    override def bufferEncoder: org.apache.spark.sql.Encoder[CmsBuffer] =
      org.apache.spark.sql.Encoders.kryo[CmsBuffer]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[(Long, Seq[Long])] =
      ExpressionEncoder[(Long, Seq[Long])]()
  }

  /** Build a sketch over `itemCol` (nulls ignored) — one scan, one
    * matrix-sized state per task, one driver matrix out.
    */
  def sketch(
      df: DataFrame,
      itemCol: Column,
      depth: Int = 4,
      width: Int = 2048,
      seed: Int = 42): CmsSketch = {
    val agg = udaf(new CmsAggregator(depth, width, seed),
      ExpressionEncoder[String]())
    val r = df
      .select(itemCol.cast(org.apache.spark.sql.types.StringType)
        .as("graft_item"))
      .agg(agg(col("graft_item")).as("graft_cms"))
      .select(col("graft_cms._1").as("t"), col("graft_cms._2").as("m"))
      .collect().head
    CmsSketch(depth, width, seed, r.getLong(0), r.getSeq[Long](1).toArray)
  }

  /** Persist / reload / merge — the incremental-state shape (q43/q76/q93
    * convention): one row of (depth, width, seed, total, table).
    */
  def writeSketch(spark: SparkSession, s: CmsSketch, path: String): Unit = {
    import spark.implicits._
    Seq((s.depth, s.width, s.seed, s.total, s.table.toSeq))
      .toDF("depth", "width", "seed", "total", "table")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readSketch(spark: SparkSession, path: String): CmsSketch = {
    val r = spark.read.parquet(path).collect().head
    CmsSketch(r.getAs[Int]("depth"), r.getAs[Int]("width"),
      r.getAs[Int]("seed"), r.getAs[Long]("total"),
      r.getAs[Seq[Long]]("table").toArray)
  }

  /** Map-side estimate column against a finished (closure-captured)
    * sketch — the broadcast-lookup pattern: the sketch rides into tasks
    * as serialized closure data, no join.
    */
  def estimateCol(s: CmsSketch)(item: Column): Column = {
    val est = udf((x: String) => if (x == null) 0L else s.estimate(x))
    est(item)
  }

  /** Heavy hitters: exact counts of every item whose SKETCH estimate
    * reaches `threshold`. Because estimates never underestimate, the
    * candidate set is a superset of the true `count >= threshold` items,
    * so the returned exact counts are complete above the threshold. Two
    * scans (build rides `sketch`; this is the filter + bounded groupBy);
    * callers with a persisted item frame pay one.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: Column,
      s: CmsSketch,
      threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    df.select(itemCol.cast(org.apache.spark.sql.types.StringType)
        .as("item"))
      .where(col("item").isNotNull)
      .where(estimateCol(s)(col("item")) >= threshold)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
