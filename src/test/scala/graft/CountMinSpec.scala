package graft

import graft.sketch.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class CountMinSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // zipf-ish: term t_i appears (50 - i) times
    (0 until 50).flatMap(i => Seq.fill(50 - i)(s"t$i"))
      .zipWithIndex.map { case (t, id) => (id.toLong, t) }
      .toDF("id", "term")
  }

  "CountMin.sketch" should {
    "never underestimate and be exact without collisions" in {
      val s = CountMin.sketch(corpus, col("term"), depth = 4, width = 2048)
      s.total shouldBe (1 to 50).sum.toLong
      (0 until 50).foreach { i =>
        s.estimate(s"t$i") should be >= (50L - i)
      }
      // 50 distinct items in 4 x 2048 cells: the min row is collision-free
      // with overwhelming probability for this fixed seed — exactness here
      // pins the hash/bucket arithmetic
      s.estimate("t0") shouldBe 50L
      s.estimate("t49") shouldBe 1L
      s.estimate("never-seen") shouldBe 0L
    }

    "merge as an exact monoid and round-trip through parquet" in {
      val a = CountMin.sketch(corpus.where(col("id") % 2 === 0), col("term"))
      val b = CountMin.sketch(corpus.where(col("id") % 2 === 1), col("term"))
      val full = CountMin.sketch(corpus, col("term"))
      val merged = a.mergeWith(b)
      merged.total shouldBe full.total
      merged.table.toSeq shouldBe full.table.toSeq

      val dir = java.nio.file.Files
        .createTempDirectory("graft-cms").toString
      CountMin.writeSketch(spark, merged, s"$dir/cms")
      val back = CountMin.readSketch(spark, s"$dir/cms")
      back.table.toSeq shouldBe merged.table.toSeq
      back.total shouldBe merged.total

      intercept[IllegalArgumentException] {
        a.mergeWith(CountMin.sketch(corpus, col("term"), width = 64))
      }
    }
  }

  "CountMin.heavyHitters" should {
    "return exactly the true above-threshold items with exact counts" in {
      val s = CountMin.sketch(corpus, col("term"))
      val hh = CountMin.heavyHitters(corpus, col("term"), s, threshold = 40L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // true counts >= 40: t0..t10 (50..40)
      hh shouldBe (0 to 10).map(i => s"t$i" -> (50L - i)).toMap
    }
  }
}
