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

    "not let duplicate reference rows inflate the ratio or mask misses" in {
      val s = spark
      import s.implicits._
      import graft.comparison.DatasetMatch
      val ds1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
      // two copies matching id=1, NOTHING for id=2: semi-join semantics
      // must report 0.5, not the inner-join count's 2/2 = 1.0
      val ds2 = Seq((1, "a"), (1, "a")).toDF("id", "v")
      DatasetMatch.matchRatio(ds1, ds2,
        Map("id" -> "id"), Map("v" -> "v")).get shouldBe 0.5 +- 1e-12
    }

    "keep same-named key columns and stay 1:1 under duplicate reference rows" in {
      val s = spark
      import s.implicits._
      import graft.comparison.DatasetMatch
      val ds1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
      val ds2 = Seq((1, "a"), (1, "a"), (2, "x")).toDF("id", "v")
      val rl = DatasetMatch.matchRowLevel(ds1, ds2,
        Map("id" -> "id"), Map("v" -> "v"))
      // the ds1 key survives (drop-by-name must not take both sides) and
      // exact-duplicate ds2 rows do not fan the left join out
      rl.columns should contain("id")
      val rows = rl.select("id", "graft_match_outcome").collect()
        .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      rows.size shouldBe 2
      rows(1) shouldBe true
      rows(2) shouldBe false
    }

    "treat null-column asymmetry as a mismatch like the aggregate does" in {
      val s = spark
      import s.implicits._
      import graft.comparison.DatasetMatch
      // values differ only in WHICH column is null: a null-skipping hash
      // would call these equal; <=> semantics (and the aggregate) do not
      val ds1 = Seq((1, Option.empty[String], Option("x"))).toDF("id", "a", "b")
      val ds2 = Seq((1, Option("x"), Option.empty[String])).toDF("id", "a", "b")
      val rl = DatasetMatch.matchRowLevel(ds1, ds2,
        Map("id" -> "id"), Map("a" -> "a", "b" -> "b"))
      rl.collect().head.getAs[Boolean]("graft_match_outcome") shouldBe false
      DatasetMatch.matchRatio(ds1, ds2,
        Map("id" -> "id"), Map("a" -> "a", "b" -> "b")).get shouldBe 0.0
      // and identical null layouts still match
      DatasetMatch.matchRatio(ds1, ds1.toDF(),
        Map("id" -> "id"), Map("a" -> "a", "b" -> "b")).get shouldBe 1.0
    }

    "emit ternary row-level referential-integrity outcomes for null keys" in {
      val s = spark
      import s.implicits._
      import graft.comparison.ReferentialIntegrity
      val primary = Seq(Option(1), Option(2), Option.empty[Int]).toDF("k")
      val reference = Seq(1).toDF("rk")
      // aggregate excludes null keys: 1 of 2 non-null present
      ReferentialIntegrity.subsetCheck(primary, "k", reference, "rk") shouldBe 0.5
      val rl = ReferentialIntegrity.subsetCheckRowLevel(primary, "k", reference, "rk")
      // avg over the ternary outcome (nulls skipped) reconstructs the ratio
      val avg = rl.agg(org.apache.spark.sql.functions
        .avg(org.apache.spark.sql.functions.col("graft_ri_outcome").cast("double")))
        .collect().head.getDouble(0)
      avg shouldBe 0.5 +- 1e-12
      rl.filter("k IS NULL").collect().head.isNullAt(
        rl.columns.indexOf("graft_ri_outcome")) shouldBe true
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
