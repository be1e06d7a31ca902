package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks.{Check, CheckLevel, CheckStatus, VerificationSuite}
import graft.operators.ApproxItemFrequencyFromState
import graft.sketch.FreqItems

/** Misra-Gries per-group frequent-items state (q145): the deterministic
  * undercount bound must hold for EVERY partitioning/merge order, the
  * summary must be exact when capacity >= the group's vocabulary, and
  * the from-state Check/DQDL surface must fold parquet-staged states.
  */
class FreqItemsSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Zipf-ish skewed stream over `vocab` items, fixed seed. */
  private def stream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      // rank ~ floor(vocab * u^2) skews mass toward low ranks
      val u = rnd.nextDouble()
      s"w${(vocab * u * u).toInt}"
    }
  }

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def boundHolds(mg: Map[String, Long], n: Long, capacity: Int,
      exact: Map[String, Long]): Unit = {
    val s = mg.values.sum
    val err = (n - s).toDouble / (capacity + 1)
    mg.foreach { case (k, est) =>
      est should be <= exact.getOrElse(k, 0L)
      (exact(k) - est).toDouble should be <= err + 1e-9
    }
    exact.foreach { case (k, true_) =>
      if (!mg.contains(k)) true_.toDouble should be <= err + 1e-9
    }
  }

  private def summaryOf(df: org.apache.spark.sql.DataFrame): (Map[String, Long], Long) = {
    val row = df.select(col("mg")).collect().head.getStruct(0)
    (row.getAs[Map[String, Long]]("counters"), row.getAs[Long]("n"))
  }

  "FreqItems.freqState" should {
    "honor the Misra-Gries undercount bound on a skewed stream" in {
      val s = spark
      import s.implicits._
      val items = stream(20000, 500, seed = 7)
      val exact = exactCounts(items)
      val df = items.map(("g", _)).toDF("grp", "item").repartition(13)
      val state = FreqItems.freqState(df, Seq("grp"), "item", capacity = 16)
      val (mg, n) = summaryOf(state)
      n shouldBe 20000L
      mg.size should be <= 16
      boundHolds(mg, n, 16, exact)
    }

    "be exact when capacity covers the vocabulary, across partitionings" in {
      val s = spark
      import s.implicits._
      val items = stream(5000, 20, seed = 11)
      val exact = exactCounts(items)
      Seq(1, 7, 32).foreach { parts =>
        val df = items.map(("g", _)).toDF("grp", "item").repartition(parts)
        val (mg, n) = summaryOf(
          FreqItems.freqState(df, Seq("grp"), "item", capacity = 64))
        n shouldBe 5000L
        mg shouldBe exact
      }
    }

    "skip null items and keep groups independent" in {
      val s = spark
      import s.implicits._
      val df = Seq(("a", "x"), ("a", "x"), ("a", null), ("b", "y"))
        .toDF("grp", "item")
      val state = FreqItems.freqState(df, Seq("grp"), "item", capacity = 4)
      val rows = state.orderBy("grp").collect()
      rows(0).getStruct(1).getAs[Long]("n") shouldBe 2L
      rows(0).getStruct(1).getAs[Map[String, Long]]("counters") shouldBe Map("x" -> 2L)
      rows(1).getStruct(1).getAs[Map[String, Long]]("counters") shouldBe Map("y" -> 1L)
    }
  }

  "FreqItems.freqStateWeighted" should {
    "equal the unweighted build on pre-aggregated counts" in {
      val s = spark
      import s.implicits._
      val items = stream(6000, 18, seed = 53)
      val exact = exactCounts(items)
      val weighted = exact.toSeq.map { case (k, c) => ("g", k, c) }
        .toDF("grp", "item", "w")
      val (mg, n) = summaryOf(
        FreqItems.freqStateWeighted(weighted, Seq("grp"), "item", "w", 64))
      n shouldBe 6000L
      mg shouldBe exact // capacity >= vocab: exact
      // null items and non-positive weights skip
      val dirty = (weighted.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSeq ++
        Seq(("g", null, 5L), ("g", "wx", 0L), ("g", "wy", -3L)))
        .toDF("grp", "item", "w")
      val (mg2, n2) = FreqItems.freqStateWeighted(
        dirty, Seq("grp"), "item", "w", 64) match {
        case df => summaryOf(df)
      }
      n2 shouldBe 6000L
      mg2 shouldBe exact
    }
  }

  "FreqItems.mergeStates" should {
    "fold parquet-staged batch states with the bound intact" in {
      val s = spark
      import s.implicits._
      val items = stream(30000, 800, seed = 23)
      val exact = exactCounts(items)
      val (h1, h2) = items.splitAt(items.size / 3)
      val dir = java.nio.file.Files.createTempDirectory("graft-mg").toString
      try {
        FreqItems.writeState(FreqItems.freqState(
          h1.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item", 24), dir)
        val merged = FreqItems.mergeStates(
          FreqItems.readState(spark, dir),
          FreqItems.freqState(h2.map(("g", _)).toDF("grp", "item"),
            Seq("grp"), "item", 24), 24)
        val (mg, n) = summaryOf(merged)
        n shouldBe 30000L
        mg.size should be <= 24
        boundHolds(mg, n, 24, exact)
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }

    "be exact under merge when capacity covers the vocabulary" in {
      val s = spark
      import s.implicits._
      val items = stream(4000, 15, seed = 41)
      val exact = exactCounts(items)
      val (h1, h2) = items.splitAt(1234)
      val merged = FreqItems.mergeStates(
        FreqItems.freqState(h1.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item", 32),
        FreqItems.freqState(h2.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item", 32),
        32)
      val (mg, n) = summaryOf(merged)
      n shouldBe 4000L
      mg shouldBe exact
    }
  }

  "FreqItems.heavyHitters" should {
    "contain every true phi-heavy hitter and never overcount" in {
      val s = spark
      import s.implicits._
      val items = stream(20000, 300, seed = 61)
      val exact = exactCounts(items)
      val n = items.size.toLong
      val phi = 0.02
      val state = FreqItems.freqState(
        items.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item", 32)
      val hh = FreqItems.heavyHitters(state, phi, 32)
        .select("item", "est").as[(String, Long)].collect().toMap
      val trueHH = exact.filter { case (_, c) => c > phi * n }
      trueHH.keySet.foreach(k => hh.keySet should contain(k))
      hh.foreach { case (k, est) => est should be <= exact.getOrElse(k, 0L) }
    }
  }

  "ApproxItemFrequencyFromState" should {
    "fold a parquet-staged state table through Check and DQDL" in {
      val s = spark
      import s.implicits._
      val items = stream(10000, 25, seed = 83) // capacity 64 >= vocab: exact
      val exact = exactCounts(items)
      val top = exact.maxBy { case (k, c) => (c, k) }
      val perGrp = items.zipWithIndex.map { case (it, i) => (s"g${i % 4}", it) }
      val dir = java.nio.file.Files.createTempDirectory("graft-mgstate").toString
      try {
        FreqItems.writeState(FreqItems.freqState(
          perGrp.toDF("grp", "item"), Seq("grp"), "item", 64), dir)
        val state = FreqItems.readState(spark, dir)
        state.count() shouldBe 4L
        val exactRatio = top._2.toDouble / items.size
        val m = ApproxItemFrequencyFromState("mg", top._1).calculate(state)
        m.value.get shouldBe exactRatio +- 1e-12
        VerificationSuite().onData(state)
          .addCheck(Check(CheckLevel.Error, "item freq from state")
            .hasApproxItemFrequencyFromState("mg", top._1,
              d => math.abs(d - exactRatio) <= 1e-9))
          .run().status shouldBe CheckStatus.Success
        val dq = graft.dqdl.EvaluateDataQuality.process(state,
          s"""Rules = [ ApproxItemFrequencyFromState "mg" "${top._1}" between ${exactRatio - 0.001} and ${exactRatio + 0.001} ]""")
        dq.where(col("outcome") === "Passed").count() shouldBe 1L
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }

    "skip where-filtered state rows instead of failing the null decode" in {
      val s = spark
      import s.implicits._
      val items = stream(2000, 8, seed = 101)
      val perGrp = items.zipWithIndex.map { case (it, i) => (s"g${i % 2}", it) }
      val state = FreqItems.freqState(
        perGrp.toDF("grp", "item"), Seq("grp"), "item", 32)
      val only = ApproxItemFrequencyFromState("mg", "w0", Some("grp = 'g0'"))
        .calculate(state).value.get
      val direct = ApproxItemFrequencyFromState("mg", "w0")
        .calculate(state.where(col("grp") === "g0")).value.get
      only shouldBe direct +- 1e-12
    }

    "round-trip through HdfsStateProvider like every other analyzer" in {
      val s = spark
      import s.implicits._
      val items = stream(3000, 10, seed = 97)
      val state = FreqItems.freqState(
        items.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item", 32)
      val analyzer = ApproxItemFrequencyFromState("mg", "w0")
      val direct = analyzer.calculate(state).value.get
      val dir = java.nio.file.Files.createTempDirectory("graft-mgsp").toString
      try {
        val provider = new graft.core.HdfsStateProvider(spark, s"$dir/st")
        analyzer.computeStateFrom(state).foreach(provider.persist(analyzer, _))
        val restored = provider.load(analyzer)
        restored should not be empty
        analyzer.computeMetricFrom(restored).value.get shouldBe direct +- 1e-12
      } finally org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }
}
