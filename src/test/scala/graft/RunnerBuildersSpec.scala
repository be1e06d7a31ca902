package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks._
import graft.core.InMemoryStateProvider
import graft.operators.{Completeness, Size}
import graft.profiles._
import graft.repository.{InMemoryMetricsRepository, ResultKey}
import graft.runners.{AnalysisRunner, AnalyzerContext}
import graft.suggestions._

/** Fluent run-builder parity: file outputs, repository reuse/append, and
  * incremental state on all four runner surfaces
  * (reference capability: runners/AnalysisRunBuilder.scala,
  * VerificationRunBuilder.scala, profiles/ColumnProfilerRunBuilder.scala,
  * suggestions/ConstraintSuggestionRunBuilder.scala).
  */
class RunnerBuildersSpec extends AnyWordSpec with Matchers with SparkSpec {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def tmpJson(name: String): String =
    Files.createTempDirectory("graft-builders").resolve(name).toString

  private def readFile(path: String): String =
    new String(Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")

  "ColumnProfilerRunner" should {
    "profile restricted columns with KLL and write profiles JSON" in {
      val path = tmpJson("profiles.json")
      val profiles = ColumnProfilerRunner()
        .onData(orders)
        .restrictToColumns(Seq("o_orderkey", "o_orderstatus"))
        .withKLLProfiling()
        .saveColumnProfilesJsonToPath(path)
        .overwritePreviousFiles(true)
        .run()

      profiles.profiles.keySet shouldBe Set("o_orderkey", "o_orderstatus")
      val key = profiles.profiles("o_orderkey").asInstanceOf[NumericColumnProfile]
      key.kll.isDefined shouldBe true
      key.approxPercentiles.get should not be empty

      val json = readFile(path)
      json should include ("o_orderkey")
      json should include ("completeness")
    }

    "reuse repository metrics instead of rescanning" in {
      val repo = new InMemoryMetricsRepository
      val key = ResultKey(1L, Map("run" -> "profiler"))
      ColumnProfilerRunner().onData(orders)
        .restrictToColumns(Seq("o_totalprice"))
        .useRepository(repo)
        .saveOrAppendResult(key)
        .run()
      repo.loadByKey(key).map(_.metricMap.size).getOrElse(0) should be > 0

      // a second run against the stored key must produce the same profile
      val again = ColumnProfilerRunner().onData(orders)
        .restrictToColumns(Seq("o_totalprice"))
        .useRepository(repo)
        .reuseExistingResultsForKey(key)
        .run()
      val p = again.profiles("o_totalprice").asInstanceOf[NumericColumnProfile]
      p.completeness shouldBe 1.0
      p.mean.isDefined shouldBe true
    }
  }

  "ConstraintSuggestionRunner fluent builder" should {
    "suggest with metadata and write all three JSON outputs" in {
      val sPath = tmpJson("suggestions.json")
      val pPath = tmpJson("profiles.json")
      val ePath = tmpJson("evaluation.json")

      val result = ConstraintSuggestionRunner()
        .onData(orders)
        .addConstraintRules(Rules.DEFAULT)
        .useTrainTestSplitWithTestsetRatio(0.2)
        .saveConstraintSuggestionsJsonToPath(sPath)
        .saveColumnProfilesJsonToPath(pPath)
        .saveEvaluationResultsJsonToPath(ePath)
        .overwritePreviousFiles(true)
        .run()

      val all = result.suggestions.values.flatten.toSeq
      all should not be empty
      // every suggestion carries the reference's JSON metadata fields
      all.foreach { s =>
        s.suggestingRule should not be empty
        s.ruleDescription should not be empty
      }
      all.exists(_.currentValue.nonEmpty) shouldBe true
      result.testEvaluation should not be empty

      readFile(sPath) should include ("suggesting_rule")
      readFile(pPath) should include ("completeness")
      readFile(ePath) should include ("constraint_result_on_test_set")
    }
  }

  "VerificationRunBuilder" should {
    "write check results and success metrics JSON, respecting overwrite" in {
      val cPath = tmpJson("checkResults.json")
      val mPath = tmpJson("successMetrics.json")
      val check = Check(CheckLevel.Error, "basics")
        .hasSize(_ == 1500)
        .isComplete("o_orderkey")

      val result = new VerificationSuite().onData(orders)
        .addCheck(check)
        .saveCheckResultsJsonToPath(cPath)
        .saveSuccessMetricsJsonToPath(mPath)
        .overwritePreviousFiles(true)
        .run()
      result.status shouldBe CheckStatus.Success
      readFile(cPath) should include ("basics")
      val firstMetrics = readFile(mPath)
      firstMetrics should include ("Completeness")

      // overwrite=false leaves the existing file untouched
      new VerificationSuite().onData(orders.limit(10))
        .addCheck(Check(CheckLevel.Error, "other").hasSize(_ == 10))
        .saveSuccessMetricsJsonToPath(mPath)
        .overwritePreviousFiles(false)
        .run()
      readFile(mPath) shouldBe firstMetrics
    }

    "append metrics for repeated saves under one key" in {
      val repo = new InMemoryMetricsRepository
      val key = ResultKey(7L)
      new VerificationSuite().onData(orders)
        .addCheck(Check(CheckLevel.Error, "size").hasSize(_ == 1500))
        .useRepository(repo).saveOrAppendResult(key)
        .run()
      new VerificationSuite().onData(orders)
        .addCheck(Check(CheckLevel.Error, "complete").isComplete("o_orderkey"))
        .useRepository(repo).saveOrAppendResult(key)
        .run()

      val stored = repo.loadByKey(key).get.metricMap
      stored.keySet should contain (Size(): graft.core.AnyAnalyzer)
      stored.keySet should contain (Completeness("o_orderkey"): graft.core.AnyAnalyzer)
    }
  }

  "AnalysisRunBuilder" should {
    "reuse stored metrics and only compute the missing ones" in {
      val repo = new InMemoryMetricsRepository
      val key = ResultKey(11L)
      AnalysisRunner.onData(orders)
        .addAnalyzer(Size())
        .useRepository(repo).saveOrAppendResult(key)
        .run()

      val context = AnalysisRunner.onData(orders)
        .addAnalyzers(Seq(Size(), Completeness("o_orderkey")))
        .useRepository(repo).reuseExistingResultsForKey(key)
        .saveOrAppendResult(key)
        .run()
      context.metricMap.size shouldBe 2
      repo.loadByKey(key).get.metricMap.size shouldBe 2
    }

    "merge states across incremental runs" in {
      val provider = new InMemoryStateProvider
      val firstHalf = orders.limit(700)
      AnalysisRunner.onData(firstHalf)
        .addAnalyzer(Size())
        .saveStatesWith(provider)
        .run()

      val rest = orders.limit(800) // overlap-free split isn't needed for Size algebra
      val merged = AnalysisRunner.onData(rest)
        .addAnalyzer(Size())
        .aggregateWith(provider)
        .run()
      val value = merged.metric(Size()).collect {
        case m: graft.core.DoubleMetric => m.value.get
      }
      value shouldBe Some(1500.0)
    }

    "write success metrics JSON" in {
      val path = tmpJson("analysis.json")
      AnalysisRunner.onData(orders)
        .addAnalyzer(Completeness("o_orderkey"))
        .saveSuccessMetricsJsonToPath(path)
        .overwritePreviousFiles(true)
        .run()
      val json = readFile(path)
      json should include ("Completeness")
      json should include ("o_orderkey")
    }
  }

  "AnalyzerContext output helpers" should {
    "render success metrics as a DataFrame restricted to given analyzers" in {
      val context = AnalysisRunner.run(orders,
        Seq(Size(), Completeness("o_orderkey")))
      val df = AnalyzerContext.successMetricsAsDataFrame(
        spark, context, forAnalyzers = Seq(Size()))
      val rows = df.collect()
      rows should have length 1
      rows.head.getString(2) shouldBe "Size"
      rows.head.getDouble(3) shouldBe 1500.0
    }
  }
}
