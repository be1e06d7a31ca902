package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class JoinOpsSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def left = {
    val s = spark
    import s.implicits._
    // key 1 is pathologically hot
    (Seq.tabulate(300)(i => (i.toLong, 1L)) ++
      Seq((1000L, 2L), (1001L, 3L), (1002L, 99L)))
      .toDF("lid", "k")
  }

  private def right = {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
  }

  "saltedJoin" should {
    "return exactly the plain inner join's rows" in {
      val salted = JoinOps.saltedJoin(left, right, Seq("k"), "lid",
          saltFactor = 8, rightPayloadCols = Seq("v"))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      val plain = left.join(right, Seq("k"))
        .select(col("lid"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      salted shouldBe plain
      salted.size shouldBe 302 // 300 hot + keys 2,3; 99 unmatched
    }

    "route the hot key across many salt partitions" in {
      val lSide = left.withColumn("graft_salt",
        pmod(xxhash64(col("lid")), lit(8L)))
      val saltsUsed = lSide.where(col("k") === 1L)
        .select(countDistinct(col("graft_salt"))).collect().head.getLong(0)
      saltsUsed should be >= 6L // 300 rows over 8 salts
    }
  }

  "bloomSemiJoin" should {
    "equal the plain left-semi join" in {
      val bloomed = JoinOps.bloomSemiJoin(left, right, Seq("k"),
          expectedItems = 10)
        .collect().map(r => r.getLong(r.fieldIndex("lid"))).toSet
      val plain = left.join(right, Seq("k"), "left_semi")
        .collect().map(r => r.getLong(r.fieldIndex("lid"))).toSet
      bloomed shouldBe plain
      bloomed should not contain 1002L // key 99 absent from right
    }

    "keep duplicate left rows and survive multi-column keys" in {
      val s = spark
      import s.implicits._
      val l = Seq((1L, "x", 10L), (2L, "x", 10L), (3L, "y", 20L))
        .toDF("lid", "a", "b")
      val r = Seq(("x", 10L)).toDF("a", "b")
      val out = JoinOps.bloomSemiJoin(l, r, Seq("a", "b"), 10)
        .collect().map(r => r.getLong(r.fieldIndex("lid"))).toSet
      out shouldBe Set(1L, 2L)
    }
  }
}
