package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class ZOrderSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Reference Morton interleave for the property check. */
  private def refZ(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = xs.size
    for (b <- 0 until bits; i <- 0 until d) {
      val m = (xs(i) & ((1L << bits) - 1)) >> b & 1L
      z |= m << (b * d + i)
    }
    z
  }

  "zValue" should {
    "interleave bits like the reference on known points" in {
      val s = spark
      import s.implicits._
      // (x=0b11, y=0b01) at 2 bits: z = y1 x1 y0 x0 = 0 1 1 1 = 7
      val rows = Seq((3L, 1L), (0L, 0L), (3L, 3L), (2L, 1L))
        .toDF("x", "y")
        .select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
        .collect().map(_.getLong(0)).toSeq
      rows shouldBe Seq(7L, 0L, 15L, 6L)
    }

    "agree with the reference over a 3-dim random sweep and mask" in {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(7)
      val pts = Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs,
        rnd.nextLong().abs))
      val got = pts.toDF("a", "b", "c")
        .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 8)
          .as("z"))
        .collect().map(_.getLong(0)).toSeq
      got shouldBe pts.map(p => refZ(Seq(p._1, p._2, p._3), 8))
    }

    "reject dims*bits over a long" in {
      an[IllegalArgumentException] should be thrownBy
        ZOrder.zValue(Seq(col("a"), col("b")), 32)
    }
  }

  "zOrderBy" should {
    "produce globally z-ordered, count-preserving partitions" in {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(11)
      val df = Seq.fill(500)((rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong)).toDF("x", "y")
      val laid = ZOrder.zOrderBy(df, Seq("x", "y"), bits = 8,
        numPartitions = 4)
      laid.count() shouldBe 500
      val zPerPartition = laid
        .select(ZOrder.zValue(Seq(col("x"), col("y")), 8).as("z"))
        .rdd.glom().collect()
        .map(_.map(_.getLong(0)).toSeq).filter(_.nonEmpty)
      // sorted within each partition
      zPerPartition.foreach(zs => zs shouldBe zs.sorted)
      // partitions cover disjoint, increasing z ranges
      val ranges = zPerPartition.map(zs => (zs.head, zs.last))
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) => hi should be <= lo2
        case _ =>
      }
    }
  }

  "pruningAudit" should {
    "show the y-extent shrinking under z but not under x layout" in {
      val s = spark
      import s.implicits._
      // full 16x16 grid; 4 buckets: z buckets are 8x8 quadrants,
      // x buckets are 4-wide full-height stripes
      val grid = (for (x <- 0 until 16; y <- 0 until 16)
        yield (x.toLong, y.toLong)).toDF("x", "y")
      val r = ZOrder.pruningAudit(grid, "x", "y", bits = 4, nBuckets = 4)
        .collect().head
      val m = r.schema.fieldNames.zip(r.toSeq).toMap
      m("n_rows") shouldBe 256.0
      m("z_buckets") shouldBe 4.0
      m("x_buckets") shouldBe 4.0
      m("z_mean_w_r") shouldBe 8.0
      m("z_mean_h_r") shouldBe 8.0 // quadrants: half the y-range
      m("x_mean_w_r") shouldBe 4.0
      m("x_mean_h_r") shouldBe 16.0 // stripes: NO y locality
    }
  }
}
