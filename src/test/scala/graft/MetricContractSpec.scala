package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks.{Check, CheckLevel, VerificationResult, VerificationSuite}
import graft.core._
import graft.operators._

/** The metric (entity, name, instance) triple is part of the public
  * contract — JSON outputs and repository keys depend on the exact strings
  * (SURVEY §7.4: "Metric entity/instance naming is part of the contract").
  */
class MetricContractSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1, "a", 2.0), (2, "b", 3.0), (3, "c", 4.0)).toDF("id", "cat", "num")
  }

  "metric naming" should {
    "use Dataset entity and '*' instance for dataset-level analyzers" in {
      val m = Size().calculate(df)
      m.entity shouldBe Entity.Dataset
      m.name shouldBe "Size"
      m.instance shouldBe "*"
      ColumnCount().calculate(df).entity shouldBe Entity.Dataset
    }

    "use Column entity and the column name for single-column analyzers" in {
      val cases: Seq[(AnyAnalyzer, String, String)] = Seq(
        (Completeness("cat"): AnyAnalyzer, "Completeness", "cat"),
        (Minimum("num"): AnyAnalyzer, "Minimum", "num"),
        (Maximum("num"): AnyAnalyzer, "Maximum", "num"),
        (Mean("num"): AnyAnalyzer, "Mean", "num"),
        (Sum("num"): AnyAnalyzer, "Sum", "num"),
        (StandardDeviation("num"): AnyAnalyzer, "StandardDeviation", "num"),
        (Entropy("cat"): AnyAnalyzer, "Entropy", "cat"),
        (ApproxCountDistinct("cat"): AnyAnalyzer, "ApproxCountDistinct", "cat"))
      cases.foreach { case (a, name, instance) =>
        val m = a.calculate(df)
        withClue(s"$a: ") {
          m.entity shouldBe Entity.Column
          m.name shouldBe name
          m.instance shouldBe instance
        }
      }
    }

    "use Multicolumn entity and comma-joined instance for multi-column analyzers" in {
      val u = Uniqueness(Seq("id", "cat")).calculate(df)
      u.entity shouldBe Entity.Multicolumn
      u.instance shouldBe "id,cat"
      val mi = MutualInformation(Seq("id", "cat")).calculate(df)
      mi.entity shouldBe Entity.Multicolumn
      mi.instance shouldBe "id,cat"
    }
  }

  "JSON reports" should {
    "render check results and metrics with the contract fields" in {
      val result = VerificationSuite().onData(df)
        .addCheck(Check(CheckLevel.Error, "contract")
          .hasSize(_ == 3).isComplete("cat")).run()

      val checksJson = VerificationResult.checkResultsAsJson(result)
      checksJson should include(""""check":"contract"""")
      checksJson should include(""""constraint_status":"Success"""")

      val metricsJson = VerificationResult.successMetricsAsJson(result)
      metricsJson should include(""""entity":"Dataset"""")
      metricsJson should include(""""name":"Size"""")
      metricsJson should include(""""instance":"cat"""")

      // round-trips through the filesystem helper
      val path = java.nio.file.Files.createTempDirectory("graft-json")
        .resolve("checks.json").toString
      VerificationResult.saveJsonToPath(spark, path, checksJson)
      val readBack = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      readBack shouldBe checksJson
    }
  }
}
