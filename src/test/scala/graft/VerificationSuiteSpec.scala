package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.checks._

class VerificationSuiteSpec extends AnyWordSpec with Matchers with SparkSpec {

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  "VerificationSuite" should {

    "keep duplicate-description checks distinct in results and row-level columns" in {
      val c1 = Check(CheckLevel.Error, "dup").isComplete("l_orderkey")
      val c2 = Check(CheckLevel.Warning, "dup")
        .satisfies("l_quantity > 0", "qty pos", _ >= 0.0)
      val result = VerificationSuite().onData(lineitem)
        .addCheck(c1).addCheck(c2).run()
      result.checkResultPairs should have size 2
      val rl = VerificationResult.rowLevelResultsAsDataFrame(spark, result, lineitem)
      rl.columns.filter(_.startsWith("dup")).toSeq shouldBe Seq("dup_1", "dup_2")
    }

    "run the flagship check end-to-end" in {
      val check = Check(CheckLevel.Error, "lineitem integrity")
        .hasSize(_ > 0)
        .isComplete("l_orderkey")
        .satisfies("l_quantity > 0 AND l_quantity <= 50", "qty range", _ >= 0.99)
        .isNonNegative("l_extendedprice")
        .hasMin("l_discount", _ >= 0.0)
        .hasMax("l_discount", _ <= 0.2)

      val result = VerificationSuite().onData(lineitem).addCheck(check).run()
      result.status shouldBe CheckStatus.Success
      result.checkResults.head._2.constraintResults.foreach { cr =>
        withClue(s"${cr.constraint}: ${cr.message}") {
          cr.status shouldBe ConstraintStatus.Success
        }
      }
    }

    "report failures with messages" in {
      val check = Check(CheckLevel.Error, "failing check")
        .hasSize(_ > 1000000)
        .isComplete("l_orderkey")

      val result = VerificationSuite().onData(lineitem).addCheck(check).run()
      result.status shouldBe CheckStatus.Error
      val failed = result.checkResults.head._2.constraintResults
        .filter(_.status == ConstraintStatus.Failure)
      failed should have size 1
      failed.head.message.get should include("does not meet the constraint requirement")
    }

    "honour warning level" in {
      val check = Check(CheckLevel.Warning, "warning check").hasSize(_ > 1000000)
      val result = VerificationSuite().onData(lineitem).addCheck(check).run()
      result.status shouldBe CheckStatus.Warning
    }

    "produce a check results DataFrame" in {
      val check = Check(CheckLevel.Error, "df check").hasSize(_ > 0)
      val result = VerificationSuite().onData(lineitem).addCheck(check).run()
      val df = VerificationResult.checkResultsAsDataFrame(spark, result)
      df.count() shouldBe 1
      df.columns should contain("constraint_status")
    }

    "evaluate constraints on uniqueness and distribution" in {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val check = Check(CheckLevel.Error, "orders")
        .isUnique("o_orderkey")
        .isPrimaryKey("o_orderkey")
        .hasNumberOfDistinctValues("o_orderstatus", _ <= 3)
        .isContainedIn("o_orderstatus", Array("F", "O", "P"))
        // the reference's convenience ladder: hint-only and assertion-only
        .isContainedIn("o_orderstatus", Array("F", "O", "P"),
          Some("status alphabet"))
        .isContainedIn("o_orderstatus", Array("F", "O", "P", "X"),
          (d: Double) => d == 1.0)
        .isContainedIn("o_totalprice", 0.0, 1e9,
          includeLowerBound = false, hint = Some("positive bounded"))
        .hasUniqueness(Seq("o_orderkey"), _ == 1.0)
      val result = VerificationSuite().onData(orders).addCheck(check).run()
      withClue(result.checkResults.head._2.constraintResults
        .filter(_.status != ConstraintStatus.Success).map(c => (c.constraint, c.message))) {
        result.status shouldBe CheckStatus.Success
      }
    }
  }
}
