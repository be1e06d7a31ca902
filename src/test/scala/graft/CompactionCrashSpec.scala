package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.streaming.StreamingOps
import graft.sketch.{FreqItems, KllGroupState, KLLSketch}

/** The r17 compaction crash window: a crash BETWEEN the compacted part's
  * rename and the superseded-part deletes must NOT double-count
  * non-idempotent state folds. Misra-Gries counters and KLL weights merge
  * by SUMMING — "the commutative fold absorbs duplicate parts" is only
  * true for idempotent folds (min-id dedup, HLL register-max, theta
  * union). The supersession manifest closes the window: readers exclude
  * every part a completed compaction covers, and the next compact()
  * sweeps the leftovers.
  */
class CompactionCrashSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def docs(rows: Seq[(String, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("source", "doc_id", "text")
  }

  private val corpus = docs(Seq(
    ("s1", 1L, "a b a"), ("s1", 2L, "b c"), ("s1", 3L, "a a"),
    ("s2", 4L, "x y"), ("s2", 5L, "y y z"), ("s2", 6L, "x")))

  private def toks(d: DataFrame): DataFrame =
    d.select(col("source"), explode(split(col("text"), " ")).as("item"))

  private def mgCells(st: DataFrame): Set[(String, String, Long, Long)] =
    st.select(col("source"), col("mg.n").as("n"),
        explode(col("mg.counters")).as(Seq("item", "est")))
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(1)))
      .toSet

  private def ingestThreeBatches(
      ingest: StreamingOps.SketchStateIngest): Unit = {
    ingest.processBatch(corpus.where(col("doc_id") <= 2), 0L)
    ingest.processBatch(
      corpus.where(col("doc_id") > 2 && col("doc_id") <= 4), 1L)
    ingest.processBatch(corpus.where(col("doc_id") > 4), 2L)
  }

  "compactStateDir crash window (rename done, deletes skipped)" should {

    "not double Misra-Gries counts (sum-merged, NON-idempotent)" in {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-crash-mg").toString
      try {
        val fold = (parts: DataFrame) => FreqItems.foldState(parts, 16)
        val ingest = new StreamingOps.SketchStateIngest(s"$tmp/mg",
          b => FreqItems.freqState(toks(b), Seq("source"), "item", 16), fold)
        ingestThreeBatches(ingest)
        val oneShot = FreqItems.freqState(
          toks(corpus), Seq("source"), "item", 16)

        // crash simulation: fold + manifest + rename land, deletes do not
        StreamingOps.compactStateDir(spark, s"$tmp/mg", fold,
          skipDeletesForCrashTest = true)
        val fs = new org.apache.hadoop.fs.Path(s"$tmp/mg")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/mg"))
          .map(_.getPath.getName).toSet
        // the duplicates ARE on disk: compacted part + all three sources
        names.count(_.startsWith("batch=")) shouldBe 4
        names.exists(_.startsWith("_superseded_")) shouldBe true

        // ... but the state read excludes the superseded parts
        mgCells(ingest.state(spark)) shouldBe mgCells(oneShot)

        // the next compact() self-heals: leftovers swept, fold unchanged
        ingest.compact(spark)
        val after = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/mg"))
          .map(_.getPath.getName).toSet
        after.count(_.startsWith("batch=")) shouldBe 1
        after.exists(_.startsWith("_superseded_")) shouldBe false
        mgCells(ingest.state(spark)) shouldBe mgCells(oneShot)
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    "not double KLL weights (weight-additive, NON-idempotent)" in {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-crash-kll").toString
      try {
        val fold = (parts: DataFrame) => KllGroupState.foldState(parts)
        val ingest = new StreamingOps.SketchStateIngest(s"$tmp/kll",
          b => KllGroupState.quantileState(b, Seq("source"), "doc_id"), fold)
        ingestThreeBatches(ingest)
        // total mass per group: doubled parts would double n
        def mass(st: DataFrame): Map[String, Long] =
          st.collect().map { r =>
            r.getString(0) ->
              KLLSketch.deserialize(r.getAs[Array[Byte]]("kll")).count
          }.toMap
        val oneShot = mass(
          KllGroupState.quantileState(corpus, Seq("source"), "doc_id"))
        oneShot.values.sum shouldBe 6L

        StreamingOps.compactStateDir(spark, s"$tmp/kll", fold,
          skipDeletesForCrashTest = true)
        mass(ingest.state(spark)) shouldBe oneShot

        ingest.compact(spark)
        mass(ingest.state(spark)) shouldBe oneShot
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    "not double k-means cell counts (sum-merged, NON-idempotent)" in {
      import graft.pipeline.Clustering
      val s = spark
      import s.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-crash-cells").toString
      try {
        val vecs = Seq(
          (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)),
          (4L, Seq(0.1f, 0.9f)), (5L, Seq(-1.0f, 0.0f)), (6L, Seq(0.8f, 0.2f)))
          .toDF("id", "vec")
        val cents = Seq(Array(1000000L, 0L), Array(0L, 1000000L))
        val fold = (parts: DataFrame) =>
          Clustering.foldCellStatesQuantized(parts)
        val ingest = new StreamingOps.SketchStateIngest(s"$tmp/cells",
          b => Clustering.cellStateQuantized(b, "vec", cents), fold)
        ingest.processBatch(vecs.where(col("id") <= 2), 0L)
        ingest.processBatch(vecs.where(col("id") > 2 && col("id") <= 4), 1L)
        ingest.processBatch(vecs.where(col("id") > 4), 2L)
        def cells(st: DataFrame): Map[Int, (Long, Long, Seq[Long])] =
          st.collect().map(r => r.getInt(0) ->
            ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
        val oneShot = cells(
          Clustering.cellStateQuantized(vecs, "vec", cents))
        oneShot.values.map(_._1).sum shouldBe 6L

        // crash window: compacted part + sources both on disk, but the
        // manifest keeps the read single-counted (counts SUM — doubled
        // parts would double every n and vector sum)
        StreamingOps.compactStateDir(spark, s"$tmp/cells", fold,
          skipDeletesForCrashTest = true)
        cells(ingest.state(spark)) shouldBe oneShot

        ingest.compact(spark)
        cells(ingest.state(spark)) shouldBe oneShot
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    "leave originals intact and fail loudly when the rename fails" in {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-crash-rename").toString
      try {
        val fold = (parts: DataFrame) => FreqItems.foldState(parts, 16)
        val ingest = new StreamingOps.SketchStateIngest(s"$tmp/mg",
          b => FreqItems.freqState(toks(b), Seq("source"), "item", 16), fold)
        ingestThreeBatches(ingest)
        val oneShot = FreqItems.freqState(
          toks(corpus), Seq("source"), "item", 16)
        // force the rename to fail: occupy the destination name with a
        // FILE (not a dir, so neither the live-part listing nor the
        // compaction-id scan sees it) — local FileSystem.rename reports
        // dest-exists by returning false, and the guard must throw and
        // delete NOTHING
        val fs = new org.apache.hadoop.fs.Path(s"$tmp/mg")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dest = new org.apache.hadoop.fs.Path(
          s"$tmp/mg/batch=${Long.MaxValue}")
        fs.create(dest, true).close()
        an[java.io.IOException] should be thrownBy
          StreamingOps.compactStateDir(spark, s"$tmp/mg", fold)
        val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/mg"))
          .map(_.getPath.getName).toSet
        Seq("batch=0", "batch=1", "batch=2").foreach(n =>
          names should contain(n))
        names.exists(_.startsWith("_superseded_")) shouldBe false
        fs.delete(dest, true)
        mgCells(ingest.state(spark)) shouldBe mgCells(oneShot)
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  "livePartPaths" should {
    "fall back to the state path for an existing dir with zero live parts" in {
      // an existing-but-empty state dir must surface the parquet reader's
      // own error (like a missing dir does), not a zero-path
      // schema-inference failure from spark.read.parquet(Seq.empty)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-liveparts-empty").toString
      try {
        StreamingOps.livePartPaths(spark, tmp) shouldBe Seq(tmp)
        an[Exception] should be thrownBy
          spark.read.parquet(StreamingOps.livePartPaths(spark, tmp): _*)
            .count()
      } finally
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
