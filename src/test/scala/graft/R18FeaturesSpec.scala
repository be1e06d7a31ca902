package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.DatasetManifest

/** Round-18 surfaces: cross-release manifest lineage. */
class R18FeaturesSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def release(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  "DatasetManifest.lineage" should {
    "name the release that introduced every drift, split by cause" in {
      // shards = id % 4. Timeline:
      //  r1: ids 0,1,2,5            (shards 0, 1, 2, 1)
      //  r2: shard 2 vanishes       (ids 0,1,5)
      //  r3: shard 2 reappears, id 0's text mutates (content-only),
      //      id 9 joins shard 1 (census AND content)
      val r1 = release(Seq(0L -> "a", 1L -> "b", 2L -> "c", 5L -> "d"))
      val r2 = release(Seq(0L -> "a", 1L -> "b", 5L -> "d"))
      val r3 = release(Seq(
        0L -> "a!", 1L -> "b", 5L -> "d", 9L -> "e", 2L -> "c"))
      def m(df: DataFrame) = DatasetManifest.build(df, "id", Seq("text"), 4)
      val out = DatasetManifest
        .lineage(Seq(10L -> m(r1), 20L -> m(r2), 30L -> m(r3)))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      out shouldBe Set(
        (2L, 20L, "removed", 0L, 0L),
        (0L, 30L, "changed", 0L, 1L),
        (1L, 30L, "changed", 1L, 1L),
        (2L, 30L, "added", 0L, 0L))
    }

    "produce no rows for an unchanged chain" in {
      val r = release(Seq(0L -> "a", 1L -> "b"))
      def m(df: DataFrame) = DatasetManifest.build(df, "id", Seq("text"), 4)
      DatasetManifest.lineage(Seq(1L -> m(r), 2L -> m(r), 3L -> m(r)))
        .isEmpty shouldBe true
    }

    "reject unsorted or duplicate release ids" in {
      val m = DatasetManifest.build(
        release(Seq(0L -> "a")), "id", Seq("text"), 4)
      an[IllegalArgumentException] should be thrownBy
        DatasetManifest.lineage(Seq(2L -> m, 1L -> m))
      an[IllegalArgumentException] should be thrownBy
        DatasetManifest.lineage(Seq(1L -> m, 1L -> m))
      an[IllegalArgumentException] should be thrownBy
        DatasetManifest.lineage(Seq(1L -> m))
    }
  }

  "keyed manifests" should {
    def tagged(rel: Long, rows: Seq[(Long, String)]): DataFrame =
      release(rows).withColumn("release", lit(rel))

    "fold arbitrary batch slices to the per-release one-shot manifests" in {
      val r1 = Seq(0L -> "a", 1L -> "b", 2L -> "c", 5L -> "d")
      val r2 = Seq(0L -> "a!", 1L -> "b", 9L -> "e")
      val all = tagged(1L, r1).unionByName(tagged(2L, r2))
      // three slices that each span BOTH releases — batch boundaries
      // must not matter (per-(release, shard) monoid law)
      val parts = (0 until 3).map(p =>
        DatasetManifest.buildKeyed(
          all.where(pmod(col("id"), lit(3)) === p),
          "release", "id", Seq("text"), shards = 4))
      val folded = DatasetManifest
        .foldKeyedManifests(parts.reduce(_ unionByName _))
      val oneShot = Seq(1L -> r1, 2L -> r2).map { case (rid, rows) =>
        DatasetManifest.build(release(rows), "id", Seq("text"), 4)
          .select(lit(rid).as("release"), col("shard"), col("n_rows"),
            col("id_sum"), col("content_fp"))
      }.reduce(_ unionByName _)
      folded.exceptAll(oneShot).isEmpty shouldBe true
      oneShot.exceptAll(folded).isEmpty shouldBe true
    }

    "manifest a custom layout via buildAt, matching build on the pmod key" in {
      val r = release(Seq(0L -> "a", 1L -> "b", 2L -> "c", 5L -> "d"))
      val viaAt = DatasetManifest
        .buildAt(r, pmod(col("id"), lit(4)), "id", Seq("text"))
        .collect().map(x => x.getLong(0) ->
          ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      val viaBuild = DatasetManifest.build(r, "id", Seq("text"), 4)
        .collect().map(x => x.getLong(0) ->
          ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      viaAt shouldBe viaBuild
      // and a genuinely different layout produces a different census
      val custom = DatasetManifest
        .buildAt(r, when(col("id") < 2, 0L).otherwise(1L), "id", Seq("text"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      custom shouldBe Map(0L -> 2L, 1L -> 2L)
    }

    "answer lineage from the keyed frame and reject a one-release frame" in {
      val r1 = Seq(0L -> "a", 1L -> "b")
      val r2 = Seq(0L -> "a!", 1L -> "b")
      val keyed = DatasetManifest.buildKeyed(
        tagged(5L, r1).unionByName(tagged(9L, r2)),
        "release", "id", Seq("text"), shards = 4)
      val out = DatasetManifest.lineageFromKeyed(keyed).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      out shouldBe Set((0L, 9L, "changed"))
      an[IllegalArgumentException] should be thrownBy
        DatasetManifest.lineageFromKeyed(
          keyed.where(col("release") === 5L))
    }
  }

  "cell-population drift" should {
    import graft.pipeline.Clustering

    def state(rows: Seq[(Int, Long)]): DataFrame = {
      val s = spark
      import s.implicits._
      // (cell, n, sum_sq, sums) — the cellStateQuantized shape
      rows.map { case (c, n) => (c, n, 0L, Seq(0L)) }
        .toDF("cell", "n", "sum_sq", "sums")
    }

    "compute exact integer L1 lanes over the full-outer cell join" in {
      // A: 60/40 over cells 0,1; B: 20/20/10 over cells 0,1,2
      val drift = Clustering.cellPopulationDrift(
        state(Seq(0 -> 60L, 1 -> 40L)),
        state(Seq(0 -> 20L, 1 -> 20L, 2 -> 10L)))
      val rows = drift.collect()
        .map(r => r.getAs[Int]("cell") ->
          ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("l1_num"), r.getAs[Long]("tot_a"),
            r.getAs[Long]("tot_b")))).toMap
      // tot_a=100, tot_b=50; l1_num = |n_a*50 - n_b*100|
      rows(0) shouldBe ((60L, 20L, 1000L, 100L, 50L))
      rows(1) shouldBe ((40L, 20L, 0L, 100L, 50L))
      rows(2) shouldBe ((0L, 10L, 1000L, 100L, 50L))
      // L1 = 2000 / 5000 = 0.4 exactly
    }

    "expose the L1 metric on the check and DQDL surfaces" in {
      import graft.checks.{Check, CheckLevel, CheckStatus, VerificationSuite}
      val drift = Clustering.cellPopulationDrift(
        state(Seq(0 -> 60L, 1 -> 40L)),
        state(Seq(0 -> 20L, 1 -> 20L, 2 -> 10L)))
      def run(ceiling: Double): CheckStatus =
        VerificationSuite().onData(drift)
          .addCheck(Check(CheckLevel.Error, "drift")
            .hasCellPopulationDrift()(_ <= ceiling))
          .run().status
      run(0.5) shouldBe CheckStatus.Success // L1 = 0.4
      run(0.3) shouldBe CheckStatus.Error
      val out = graft.dqdl.EvaluateDataQuality.process(drift,
        """Rules = [ CellPopulationDrift "cell" "n_a" "n_b" <= 0.5,
          |          CellPopulationDrift "cell" "n_a" "n_b" <= 0.3 ]"""
          .stripMargin)
      out.where(col("outcome") === "Passed").count() shouldBe 1L
      out.where(col("outcome") === "Failed").count() shouldBe 1L
    }

    "report 2.0 for disjoint occupancy and 0.0 for identical states" in {
      import graft.operators.CellPopulationDrift
      import graft.runners.AnalysisRunner
      import graft.core.DoubleMetric
      def l1(a: Seq[(Int, Long)], b: Seq[(Int, Long)]): Double = {
        val drift = Clustering.cellPopulationDrift(state(a), state(b))
        AnalysisRunner.run(drift, Seq(CellPopulationDrift()))
          .allMetrics.head.asInstanceOf[DoubleMetric].value.get
      }
      l1(Seq(0 -> 10L), Seq(1 -> 7L)) shouldBe 2.0
      l1(Seq(0 -> 10L, 1 -> 5L), Seq(0 -> 20L, 1 -> 10L)) shouldBe 0.0
    }
  }
}
