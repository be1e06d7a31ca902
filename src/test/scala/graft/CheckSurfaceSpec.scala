package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks._
import graft.core._
import graft.operators._

/** Check-surface tail: .where() retro-filtering, doesDatasetMatch,
  * CustomAggregator, binned-histogram constraints.
  */
class CheckSurfaceSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def items = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 1, 10.0), ("b", 2, 20.0), ("c", 3, 30.0),
      ("d", 4, 40.0), ("e", 5, 50.0), ("f", 6, 60.0)
    ).toDF("name", "id", "price")
  }

  ".where()" should {
    "retro-filter the last constraint only" in {
      val check = Check(CheckLevel.Error, "filtered")
        .hasSize(_ == 6)                       // unfiltered
        .hasMax("price", _ == 30.0).where("id <= 3") // filtered
        .hasMean("price", _ == 55.0).where("id >= 5")
      val result = VerificationSuite().onData(items).addCheck(check).run()
      result.status shouldBe CheckStatus.Success
    }

    "AND-combine with an existing filter" in {
      val base = Check(CheckLevel.Error, "combine")
        .hasSize(_ == 2)
      val check = base.where("id > 2").where("id < 5") // 3, 4
      val result = VerificationSuite().onData(items).addCheck(check).run()
      result.status shouldBe CheckStatus.Success
    }

    "reject analyzers without a WHERE surface" in {
      an[IllegalArgumentException] should be thrownBy {
        Check(CheckLevel.Error, "bad").hasColumnCount(_ == 3).where("id > 0")
      }
    }
  }

  "doesDatasetMatch" should {
    "compute the match ratio against a reference dataset" in {
      val s = spark
      import s.implicits._
      val reference = Seq((1, "x"), (2, "y"), (3, "z")).toDF("ref_id", "payload")
      val check = Check(CheckLevel.Error, "match")
        .doesDatasetMatch(reference, Map("id" -> "ref_id"), _ == 0.5)
      val result = VerificationSuite().onData(items).addCheck(check).run()
      result.status shouldBe CheckStatus.Success
    }
  }

  "CustomAggregator" should {
    "produce keyed ratios from a user function" in {
      val agg = CustomAggregator(
        df => {
          val rows = df.groupBy("name").count().collect()
          AggregatedMetricState(
            rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
            rows.map(_.getLong(1)).sum)
        },
        "NameShare")
      val metric = agg.calculate(items)
      metric.value.get("a") shouldBe (1.0 / 6.0)
      metric.value.get.values.sum shouldBe (1.0 +- 1e-9)

      // states merge as a semigroup
      val s1 = AggregatedMetricState(Map("x" -> 2L), 2L)
      val s2 = AggregatedMetricState(Map("x" -> 1L, "y" -> 3L), 4L)
      s1.merge(s2) shouldBe AggregatedMetricState(Map("x" -> 3L, "y" -> 3L), 6L)
    }
  }

  "binned histogram constraints" should {
    "assert on bin count and bucket contents" in {
      val check = Check(CheckLevel.Error, "binned")
        .hasHistogramBinnedBins("price", _ == 5L, binCount = Some(5))
        .hasHistogramBinnedValues("price",
          dist => dist.values.values.map(_.absolute).sum == 6L, binCount = Some(5))
      val result = VerificationSuite().onData(items).addCheck(check).run()
      result.status shouldBe CheckStatus.Success
    }
  }
}
