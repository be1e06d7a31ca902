package graft

import graft.pipeline.Privacy
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class PrivacySpec extends AnyWordSpec with Matchers with SparkSpec {

  private def people = {
    val s = spark
    import s.implicits._
    Seq(
      // (id, zip, age_band, condition)
      (1L, "10001", "30s", "flu"),
      (2L, "10001", "30s", "cold"),
      (3L, "10001", "30s", "flu"),
      (4L, "20002", "40s", "flu"),   // k=1 class, l=1
      (5L, "30003", "50s", "cold"),
      (6L, "30003", "50s", "cold"),  // k=2 class but l=1 (both cold)
      (7L, null: String, "30s", "flu"),
      (8L, null: String, "30s", "flu")) // null zip forms its own class
      .toDF("id", "zip", "age", "cond")
  }

  "kAnonymityHistogram" should {
    "census equivalence-class sizes with nulls as real classes" in {
      val h = Privacy.kAnonymityHistogram(people, Seq("zip", "age"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      h shouldBe Map(3L -> ((1L, 3L)), 1L -> ((1L, 1L)), 2L -> ((2L, 4L)))
    }
  }

  "kAnonymityStats" should {
    "report min class size, below-k mass, and l-diversity" in {
      val r = Privacy.kAnonymityStats(people, Seq("zip", "age"), k = 2,
        sensitiveCol = Some("cond")).collect().head
      r.getAs[Long]("n_classes") shouldBe 4L
      r.getAs[Long]("n_rows") shouldBe 8L
      r.getAs[Long]("min_class_size") shouldBe 1L
      r.getAs[Long]("below_k_rows") shouldBe 1L
      r.getAs[Long]("below_k_classes") shouldBe 1L
      // class (10001,30s) has {flu, cold} = 2; three classes have l = 1
      r.getAs[Long]("min_l") shouldBe 1L
      r.getAs[Long]("l1_classes") shouldBe 3L
    }
  }

  "flagBelowK" should {
    "flag rows in small classes, null-QI rows included" in {
      val flags = Privacy.flagBelowK(people, Seq("zip", "age"), k = 2)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("class_size"), r.getAs[Boolean]("k_anonymous"))))
        .toMap
      flags(4L) shouldBe ((1L, false))
      flags(1L) shouldBe ((3L, true))
      flags(7L) shouldBe ((2L, true)) // null zip matched via null-safe keys
      flags(8L) shouldBe ((2L, true))
    }
  }
}
