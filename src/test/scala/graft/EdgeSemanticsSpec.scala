package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks._
import graft.core._
import graft.operators._

/** Empty-data / all-rows-filtered edge semantics (SURVEY §7.4: encode
  * these in tests first — reference constraints/AnalysisBasedConstraint
  * .scala:78-120, analyzers/Completeness.scala:41-58,
  * analyzers/DuplicateRowCount.scala:45-49).
  */
class EdgeSemanticsSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
  }

  private def emptyDf = df.filter(org.apache.spark.sql.functions.lit(false))

  "a WHERE that filters out every row" should {
    "make constraints trivially succeed" in {
      val check = Check(CheckLevel.Error, "edge")
        .hasCompleteness("v", _ >= 0.5).where("id > 100")
        .hasMin("v", _ > 0).where("id > 100")
        .satisfies("v > 1000", "impossible", _ == 1.0).where("id > 100")
        .hasMean("v", _ > 0).where("id > 100")
      val r = VerificationSuite().onData(df).addCheck(check).run()
      r.status shouldBe CheckStatus.Success
      r.checkResults.values.head.constraintResults.foreach { cr =>
        cr.status shouldBe ConstraintStatus.Success
      }
    }
  }

  "a WHERE that keeps rows whose values are all NULL" should {
    "fail value constraints instead of trivially passing" in {
      val s = spark
      import s.implicits._
      val allNull = Seq((1, Option.empty[Double]), (2, Option.empty[Double]))
        .toDF("id", "v")
      // rows SURVIVE the filter but every value is NULL: before the
      // Size(where) probe this was indistinguishable from all-filtered
      // and reported a false trivial Success
      val check = Check(CheckLevel.Error, "allnull")
        .hasMin("v", _ > 0).where("id > 0")
      val r = VerificationSuite().onData(allNull).addCheck(check).run()
      r.status shouldBe CheckStatus.Error
      r.checkResults.values.head.constraintResults.head.message.get should
        include("all surviving values NULL")
      // the probe is internal: it must not leak into the reported metrics
      r.metrics.keys.collect { case sz: Size => sz } shouldBe empty
    }
  }

  "genuinely empty data without a WHERE" should {
    "fail value constraints (there is no value to assert on)" in {
      val check = Check(CheckLevel.Error, "empty")
        .hasMin("v", _ > 0)
        .hasCompleteness("v", _ >= 0.5)
      val r = VerificationSuite().onData(emptyDf).addCheck(check).run()
      r.status shouldBe CheckStatus.Error
    }

    "still satisfy size and duplicate-count assertions" in {
      val check = Check(CheckLevel.Error, "empty counts")
        .hasSize(_ == 0)
        .hasDuplicateRowCount(_ == 0, Seq("id"))
      val r = VerificationSuite().onData(emptyDf).addCheck(check).run()
      r.status shouldBe CheckStatus.Success
    }
  }

  "NaN never leaks from ratio analyzers" should {
    "produce empty state instead of 0/0" in {
      val m = Completeness("v", Some("id > 100")).calculate(df)
      m.value.isFailure shouldBe true
      m.value.failed.get shouldBe an[EmptyStateException]
    }
  }
}
