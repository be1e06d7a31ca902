package graft

import graft.operators.SkewCensus
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class SkewCensusSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def census(keys: Seq[java.lang.Long]): Map[String, Double] = {
    val s = spark
    import s.implicits._
    val df = keys.map(Option(_).map(_.toLong)).toDF("k")
    val r = SkewCensus.skewCensus(df, "k").collect().head
    r.schema.fieldNames.zip(r.toSeq.map(_.asInstanceOf[Double])).toMap
  }

  "skewCensus" should {
    "report exact counts, quantiles, shares and Gini" in {
      // keys: 1 x10, 2 x4, 3 x1, null x5  -> counts (10,4,1,5)
      val keys: Seq[java.lang.Long] =
        Seq.fill(10)(java.lang.Long.valueOf(1L)) ++
          Seq.fill(4)(java.lang.Long.valueOf(2L)) ++
          Seq(java.lang.Long.valueOf(3L)) ++
          Seq.fill(5)(null.asInstanceOf[java.lang.Long])
      val out = census(keys)
      out("n_rows") shouldBe 20.0
      out("n_keys") shouldBe 4.0 // null is its own key
      out("null_key_rows") shouldBe 5.0
      out("max_cnt") shouldBe 10.0
      // sorted counts: 1,4,5,10; disc quantiles (lower):
      // p50 -> 2nd of 4 -> 4; p90 -> ceil(3.6)=4th -> 10; p99 -> 10
      out("p50_cnt") shouldBe 4.0
      out("p90_cnt") shouldBe 10.0
      out("p99_cnt") shouldBe 10.0
      out("top1_share_r") shouldBe 0.5
      out("top10_share_r") shouldBe 1.0
      // Gini of (1,4,5,10): S1=20, ascending S2=1*1+2*4+3*5+4*10=64
      // G = 2*64/(4*20) - 5/4 = 1.6 - 1.25 = 0.35
      out("gini_r") shouldBe 0.35
    }

    "handle the uniform and single-key edges" in {
      val uniform = census(Seq(1L, 2L, 3L, 4L).map(java.lang.Long.valueOf))
      uniform("gini_r") shouldBe 0.0
      uniform("p50_cnt") shouldBe 1.0
      uniform("top1_share_r") shouldBe 0.25
      val single = census(Seq.fill(7)(java.lang.Long.valueOf(42L)))
      single("n_keys") shouldBe 1.0
      single("max_cnt") shouldBe 7.0
      single("top1_share_r") shouldBe 1.0
      single("gini_r") shouldBe 0.0
    }

    "return zeros on an empty frame" in {
      val out = census(Seq.empty)
      out("n_rows") shouldBe 0.0
      out("n_keys") shouldBe 0.0
      out("gini_r") shouldBe 0.0
    }

    "fold batches in any order through the key-count state" in {
      import graft.operators.SkewCensus
      val s = spark
      import s.implicits._
      val all = (Seq.fill(6)(Option(1L)) ++ Seq.fill(3)(Option(2L)) ++
        Seq(Option(3L)) ++ Seq.fill(2)(Option.empty[Long]))
        .zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "i")
      def st(df: org.apache.spark.sql.DataFrame) =
        SkewCensus.keyCountState(df.select("k"), "k")
      val full = st(all)
      // late batch folds FIRST (commutative monoid); keys (incl. the
      // NULL key) split across both batches must sum, not duplicate
      val merged = SkewCensus.mergeKeyCounts(
        st(all.where(col("i") >= 6)), st(all.where(col("i") < 6)))
      merged.exceptAll(full).count() shouldBe 0L
      full.exceptAll(merged).count() shouldBe 0L
      val c = SkewCensus.censusFromState(merged).collect().head
      c.getAs[Double]("n_rows") shouldBe 12.0
      c.getAs[Double]("n_keys") shouldBe 4.0
      c.getAs[Double]("null_key_rows") shouldBe 2.0
      c.getAs[Double]("max_cnt") shouldBe 6.0
    }
  }
}
