package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks.{Check, CheckLevel, CheckStatus, VerificationSuite}
import graft.operators.{ManifestParity, ManifestParityState}
import graft.pipeline.DatasetManifest

/** Round-17 additions: the manifest monoid (foldManifests — the
  * streaming twin's fold) and release parity on the constraint surface
  * (ManifestParity analyzer, Check.hasManifestParity, the DQDL rule).
  */
class R17FeaturesSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "src", "text")
  }

  private val base = docs(Seq(
    (0L, "a", "alpha"), (1L, "a", "beta"), (2L, "b", "gamma"),
    (3L, "b", "delta"), (4L, "c", "epsilon"), (5L, "c", null),
    (6L, "a", "zeta"), (7L, "b", "eta")))

  "DatasetManifest.foldManifests" should {
    "fold per-batch manifests to the one-shot manifest exactly (monoid law)" in {
      val one = DatasetManifest.build(base, "id", Seq("src", "text"), 4)
      val parts = (0 until 3).map(p => DatasetManifest.build(
        base.where(pmod(col("id"), lit(3)) === p), "id", Seq("src", "text"), 4))
      val folded = DatasetManifest.foldManifests(
        parts.reduce(_.unionByName(_)))
      DatasetManifest.diff(folded, one).isEmpty shouldBe true
      // and pairwise merge agrees with the n-way fold
      val merged = DatasetManifest.mergeManifests(
        DatasetManifest.mergeManifests(parts(0), parts(1)), parts(2))
      DatasetManifest.diff(merged, one).isEmpty shouldBe true
    }
  }

  "ManifestParity" should {
    "report the exact matching-shard fraction and 1.0 on self" in {
      val m1 = DatasetManifest.build(base, "id", Seq("src", "text"), 4)
      // mutate one row (shard 2) and drop another (shard 3)
      val tampered = base
        .where(col("id") =!= 3)
        .withColumn("text",
          when(col("id") === 2, lit("GAMMA")).otherwise(col("text")))
      val m2 = DatasetManifest.build(tampered, "id", Seq("src", "text"), 4)
      ManifestParity().calculate(
        DatasetManifest.joined(m1, m1)).value.get shouldBe 1.0
      ManifestParity().calculate(
        DatasetManifest.joined(m1, m2)).value.get shouldBe 0.5
    }

    "treat one-sided shards as mismatches and empty joins as parity" in {
      val s = spark
      import s.implicits._
      val m1 = DatasetManifest.build(base, "id", Seq("src"), 4)
      // ids 1 and 5 are ALL of shard 1 — the shard vanishes from m2
      // entirely (one-sided), and must count as a mismatch: 3/4
      val m2 = DatasetManifest.build(
        base.where(pmod(col("id"), lit(4)) =!= 1), "id", Seq("src"), 4)
      ManifestParity().calculate(
        DatasetManifest.joined(m1, m2)).value.get shouldBe 0.75 +- 1e-12
      ManifestParityState(0L, 0L).metricValue() shouldBe 1.0
      val empty = Seq.empty[(Int, Long, Long, Long, Long, Long, Long)]
        .toDF("shard", "n_rows_a", "id_sum_a", "content_fp_a",
          "n_rows_b", "id_sum_b", "content_fp_b")
      ManifestParity().calculate(empty).value.get shouldBe 1.0
    }
  }

  "DatasetManifest.drillDown" should {
    "name the differing rows inside the drifted shards only" in {
      // shard layout at shards=4: id%4. Tamper: mutate id 2 (shard 2),
      // drop id 3 (shard 3), duplicate id 4 (shard 0) -> shard 1 clean
      val tampered = base
        .where(col("id") =!= 3)
        .withColumn("text",
          when(col("id") === 2, lit("GAMMA")).otherwise(col("text")))
        .unionByName(base.where(col("id") === 4))
      val drifted = DatasetManifest.diff(
        DatasetManifest.build(base, "id", Seq("src", "text"), 4),
        DatasetManifest.build(tampered, "id", Seq("src", "text"), 4))
        .select(col("shard")).collect().map(_.getLong(0)).toSeq
      drifted.sorted shouldBe Seq(0L, 2L, 3L)
      val rows = DatasetManifest.drillDown(
          base, tampered, "id", Seq("src", "text"), 4, drifted)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      rows shouldBe Set(
        (2L, "changed"), (3L, "removed"), (4L, "changed"))
      // an empty drifted-shard list scans nothing and names nothing
      DatasetManifest.drillDown(
        base, tampered, "id", Seq("src", "text"), 4, Seq.empty)
        .isEmpty shouldBe true
    }
  }

  "DatasetManifest.buildColumnar / diffColumnar" should {
    "name the drifted column lanes per shard" in {
      val cols = Seq("src", "text")
      val m1 = DatasetManifest.buildColumnar(base, "id", cols, 4)
      // shard 2: text-only mutation; shard 3: row removed; shard 0:
      // src-only mutation on id 4
      val tampered = base
        .where(col("id") =!= 3)
        .withColumn("text",
          when(col("id") === 2, lit("GAMMA")).otherwise(col("text")))
        .withColumn("src",
          when(col("id") === 4, lit("Z")).otherwise(col("src")))
      val m2 = DatasetManifest.buildColumnar(tampered, "id", cols, 4)
      DatasetManifest.diffColumnar(m1, m1, cols).isEmpty shouldBe true
      val d = DatasetManifest.diffColumnar(m1, m2, cols)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2)))).toMap
      d(2L) shouldBe (("changed", "text"))
      d(3L) shouldBe (("changed", "src,text"))
      d(0L) shouldBe (("changed", "src"))
      d.size shouldBe 3
    }

    "report membership-only drift with an empty column list (even-multiplicity XOR cancellation)" in {
      val cols = Seq("src", "text")
      val m1 = DatasetManifest.buildColumnar(base, "id", cols, 4)
      // id 0 appears THREE times in release B: every XOR lane cancels
      // back to its original value while n_rows flips
      val tripled = base
        .unionByName(base.where(col("id") === 0))
        .unionByName(base.where(col("id") === 0))
      val m2 = DatasetManifest.buildColumnar(tripled, "id", cols, 4)
      val d = DatasetManifest.diffColumnar(m1, m2, cols)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2)))).toMap
      d(0L) shouldBe (("changed", ""))
      d.size shouldBe 1
    }
  }

  "DatasetManifest sharded layout" should {
    "prune the drill-down to the drifted shard directories" in {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-sharded").toString
      try {
        val tampered = base
          .where(col("id") =!= 3)
          .withColumn("text",
            when(col("id") === 2, lit("GAMMA")).otherwise(col("text")))
        DatasetManifest.writeSharded(base, s"$tmp/r1", "id", 4)
        DatasetManifest.writeSharded(tampered, s"$tmp/r2", "id", 4)
        val drifted = Seq(2L, 3L)
        val rows = DatasetManifest.drillDownSharded(spark,
            s"$tmp/r1", s"$tmp/r2", "id", Seq("src", "text"), drifted)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        rows shouldBe Set((2L, "changed"), (3L, "removed"))
        // the pruned read's files all live under drifted shard dirs
        val files = DatasetManifest.readShards(spark, s"$tmp/r1", drifted)
          .inputFiles
        files should not be empty
        all(files.toSeq) should (include("shard=2/") or include("shard=3/"))
        // and an empty drift list reads NOTHING
        DatasetManifest.drillDownSharded(spark,
          s"$tmp/r1", s"$tmp/r2", "id", Seq("src", "text"), Seq.empty)
          .isEmpty shouldBe true
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  "hasManifestParity / DQDL ManifestParity" should {
    "gate a release on census identity" in {
      val m1 = DatasetManifest.build(base, "id", Seq("src", "text"), 4)
      val m2 = DatasetManifest.build(
        base.withColumn("text",
          when(col("id") === 0, lit("ALPHA")).otherwise(col("text"))),
        "id", Seq("src", "text"), 4)
      val selfJ = DatasetManifest.joined(m1, m1)
      val tampJ = DatasetManifest.joined(m1, m2)
      VerificationSuite().onData(selfJ)
        .addCheck(Check(CheckLevel.Error, "parity").hasManifestParity())
        .run().status shouldBe CheckStatus.Success
      VerificationSuite().onData(tampJ)
        .addCheck(Check(CheckLevel.Error, "parity").hasManifestParity())
        .run().status shouldBe CheckStatus.Error
      val out = graft.dqdl.EvaluateDataQuality.process(tampJ,
        """Rules = [ ManifestParity "a" "b" >= 1.0, ManifestParity "a" "b" >= 0.7 ]""")
      out.where(col("outcome") === "Failed").count() shouldBe 1L
      out.where(col("outcome") === "Passed").count() shouldBe 1L
    }
  }
}
