package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.dqdl.DqdlParser
import graft.dqdl.DqdlParser._
import graft.dqdl.EvaluateDataQuality
import graft.repository.{InMemoryMetricsRepository, ResultKey}

class DqdlSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def orders = {
    val s = spark
    import s.implicits._
    Seq(
      (1, "F", 100.0, "1-URGENT"),
      (2, "O", 250.0, "2-HIGH"),
      (3, "F", 75.5, "1-URGENT"),
      (4, "P", 310.0, "3-MEDIUM"),
      (5, "O", 42.0, "2-HIGH"),
      (6, "F", 99.0, "5-LOW")
    ).toDF("o_id", "o_status", "o_total", "o_priority")
  }

  "DqdlParser" should {
    "parse a full ruleset with every condition shape" in {
      val rules = DqdlParser.parse(
        """Rules = [
          |  RowCount > 100,
          |  IsComplete "colA",
          |  Completeness "colA" >= 0.95,
          |  ColumnValues "status" in ["F", "O", "P"],
          |  ColumnValues "qty" between 0 and 51,
          |  ColumnValues "email" matches "[a-z]+@[a-z.]+" with threshold > 0.8,
          |  Mean "price" between 10.0 and 1000.0 where "qty > 0",
          |  ColumnCorrelation "a" "b" > 0.5,
          |  ColumnDataType "c" = "Integer",
          |  (RowCount > 10) and (IsComplete "colA")
          |]""".stripMargin)
      rules.length shouldBe 10

      rules.head shouldBe LeafRule("RowCount", Nil,
        Some(NumericCondition(">", 100.0)), None, None)
      rules(3) shouldBe LeafRule("ColumnValues", Seq("status"),
        Some(InCondition(Seq("F", "O", "P"), quoted = true)), None, None)
      rules(5).asInstanceOf[LeafRule].threshold shouldBe Some(NumericCondition(">", 0.8))
      rules(6).asInstanceOf[LeafRule].whereClause shouldBe Some("qty > 0")
      rules(9) shouldBe a[CompositeRule]
    }

    "parse dynamic thresholds and an Analyzers section" in {
      val doc = DqdlParser.parseDocument(
        """Rules = [
          |  RowCount between min(last(3)) * 0.9 and max(last(3)) * 1.1,
          |  Mean "o_total" > avg(last(5))
          |],
          |Analyzers = [
          |  Completeness "o_status",
          |  Mean "o_total",
          |  RowCount
          |]""".stripMargin)
      doc.rules.length shouldBe 2
      doc.analyzers.map(_.ruleType) shouldBe Seq("Completeness", "Mean", "RowCount")
      doc.rules.head.asInstanceOf[LeafRule].condition.get shouldBe a[DynamicBetweenCondition]
      doc.rules(1).asInstanceOf[LeafRule].condition.get shouldBe a[DynamicNumericCondition]
    }

    "apply standard operator precedence and left associativity in dynamic expressions" in {
      val hist = Seq(10.0)
      def eval(src: String): Double = {
        val rule = DqdlParser.parse(s"""Mean "x" > $src""").head.asInstanceOf[LeafRule]
        val resolved = DqdlParser.resolveDynamic(rule.condition.get, hist)
        resolved.asInstanceOf[NumericCondition].value
      }
      eval("avg(last(1)) * 2 + 10") shouldBe 30.0 // (10*2)+10, not 10*12
      eval("avg(last(1)) + 2 * 10") shouldBe 30.0 // 10+(2*10)
      eval("avg(last(1)) / 2 / 2") shouldBe 2.5   // (10/2)/2, not 10/(2/2)
    }

    "evaluate dynamic expressions against metric history" in {
      val hist = Seq(90.0, 100.0, 110.0, 120.0)
      DqdlParser.evalExpr(Call("min", Seq(Call("last", Seq(Lit(3))))), hist) shouldBe Seq(100.0)
      DqdlParser.evalExpr(
        BinOp("*", Call("avg", Seq(Call("last", Seq(Lit(2))))), Lit(0.5)), hist) shouldBe Seq(57.5)
      DqdlParser.resolveDynamic(
        DynamicBetweenCondition(
          BinOp("*", Call("min", Seq(Call("last", Seq(Lit(4))))), Lit(0.9)),
          BinOp("*", Call("max", Seq(Call("last", Seq(Lit(4))))), Lit(1.1))),
        hist) shouldBe BetweenCondition(81.0, 132.0)
    }

    "reject malformed input with a useful error" in {
      a[DqdlParser.DqdlParseException] should be thrownBy
        DqdlParser.parse("""Rules = [ RowCount > ]""")
      a[DqdlParser.DqdlParseException] should be thrownBy
        DqdlParser.parse("""Rules = [ Completeness "unterminated ]""".stripMargin)
    }
  }

  "EvaluateDataQuality.process" should {
    "evaluate a mixed ruleset in one shared analysis pass" in {
      val outcome = EvaluateDataQuality.process(orders,
        """Rules = [
          |  RowCount = 6,
          |  IsComplete "o_status",
          |  Completeness "o_total" >= 0.99,
          |  ColumnValues "o_status" in ["F", "O", "P"],
          |  ColumnValues "o_total" between 0 and 1000,
          |  Mean "o_total" between 100 and 200,
          |  Uniqueness "o_id" >= 1.0,
          |  IsPrimaryKey "o_id",
          |  DistinctValuesCount "o_status" = 3,
          |  ZerosCount "o_total" = 0,
          |  ColumnExists "o_priority",
          |  ColumnCount = 4,
          |  CustomSql "SELECT count(*) FROM primary WHERE o_total > 50" = 5,
          |  ColumnNamesMatchPattern "o_.*",
          |  (RowCount > 100) or (RowCount = 6),
          |  ColumnLength "o_status" = 1
          |]""".stripMargin)

      val rows = outcome.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      outcome.count() shouldBe 16
      all(rows.values) shouldBe "Passed"
    }

    "fail rules that do not hold and report the value" in {
      val outcome = EvaluateDataQuality.process(orders,
        """Rules = [ RowCount > 100, Mean "o_total" < 50 ]""")
      val rows = outcome.collect()
      rows.foreach { r => r.getString(1) shouldBe "Failed" }
      rows.find(_.getString(0).startsWith("RowCount")).get.getDouble(3) shouldBe 6.0
    }

    "support two-source rules via additionalSources" in {
      val s = spark
      import s.implicits._
      val reference = Seq((1, "F"), (2, "O"), (3, "F")).toDF("r_id", "r_status")
      val outcome = EvaluateDataQuality.process(orders,
        """Rules = [
          |  RowCountMatch "reference" = 2.0,
          |  ReferentialIntegrity "o_id" "reference.r_id" = 0.5,
          |  DatasetMatch "reference" "o_id->r_id" = 0.5,
          |  AggregateMatch "sum(o_id)" "reference.sum(r_id)" = 3.5
          |]""".stripMargin,
        additionalSources = Map("reference" -> reference))
      val rows = outcome.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      all(rows.values) shouldBe "Passed"
    }

    "contain unknown sources, unknown rules and malformed regexes as per-rule failures" in {
      // one bad rule must not abort the ruleset: the valid RowCount rule
      // still produces its outcome (reference: per-rule failure marking)
      val out = EvaluateDataQuality.process(orders,
        """Rules = [ RowCountMatch "nope" > 0, NotARule "x" > 0,
          |          ColumnNamesMatchPattern "[", RowCount > 0 ]""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      out.size shouldBe 4
      out.count(_._2 == "Failed") shouldBe 3
      out.find(_._1.startsWith("RowCount >")).get._2 shouldBe "Passed"
    }

    "honor standard and/or precedence in unparenthesized chains" in {
      // A or B and C == A or (B and C): A passes, C fails -> overall pass
      val out = EvaluateDataQuality.process(orders,
        """Rules = [ RowCount > 0 or RowCount < -1 and IsComplete "no_such" ]""")
        .collect()
      out.length shouldBe 1
      out.head.getString(1) shouldBe "Passed"
    }

    "preserve regex escapes in matches patterns" in {
      // \d must stay a digit class, not become a literal 'd'
      val out = EvaluateDataQuality.process(orders,
        "Rules = [ ColumnValues \"o_priority\" matches \"\\d-[A-Z]+\" with threshold >= 0.99 ]")
        .collect()
      out.head.getString(1) shouldBe "Passed"
    }

    "apply the condition on ColumnNamesMatchPattern and reject its where clause" in {
      // 4 of 4 columns start with o_ -> ratio 1.0; >= 0.5 passes; a
      // deliberately impossible = 0.25 fails
      EvaluateDataQuality.process(orders,
        """Rules = [ ColumnNamesMatchPattern "^o_" >= 0.5 ]""")
        .collect().head.getString(1) shouldBe "Passed"
      EvaluateDataQuality.process(orders,
        """Rules = [ ColumnNamesMatchPattern "^o_" = 0.25 ]""")
        .collect().head.getString(1) shouldBe "Failed"
      // where on a schema-level rule is contained as that rule's failure
      val contained = EvaluateDataQuality.process(orders,
        """Rules = [ ColumnNamesMatchPattern "^o_" where "o_total > 0" ]""")
        .collect().head
      contained.getString(1) shouldBe "Failed"
      contained.getString(2) should include("where")
    }

    "apply where clauses on two-source rules instead of ignoring them" in {
      val ref = orders.filter("o_status = 'F'") // 3 rows
      // filtered primary (3 F rows) vs 3-row reference -> ratio 1.0
      EvaluateDataQuality.process(orders,
        """Rules = [ RowCountMatch "ref" >= 1.0 where "o_status = 'F'" ]""",
        Map("ref" -> ref)).collect().head.getString(1) shouldBe "Passed"
      // unfiltered would be 6/3 = 2.0: prove the filter actually applied
      EvaluateDataQuality.process(orders,
        """Rules = [ RowCountMatch "ref" = 2.0 where "o_status = 'F'" ]""",
        Map("ref" -> ref)).collect().head.getString(1) shouldBe "Failed"
    }

    "reject 'with threshold' on rules that cannot consume it" in {
      val out = EvaluateDataQuality.process(orders,
        """Rules = [ Mean "o_total" > 0 with threshold >= 0.5 ]""")
        .collect().head
      out.getString(1) shouldBe "Failed"
      out.getString(2) should include("with threshold")
    }

    "quote column names needing backticks in generated predicates" in {
      val df = orders.withColumnRenamed("o_total", "order total")
      val out = EvaluateDataQuality.process(df,
        """Rules = [ ColumnValues "order total" between 0 and 1000,
          |          ColumnLength "o_status" between 0 and 2 ]""".stripMargin)
        .collect()
      out.foreach(_.getString(1) shouldBe "Passed")
    }

    "reject malformed numeric literals as parse errors" in {
      a[DqdlParser.DqdlParseException] should be thrownBy
        DqdlParser.parse("""Rules = [ RowCount > 1.2.3 ]""")
    }

    "reject non-finite dynamic thresholds from NaN history" in {
      a[DqdlParser.DqdlParseException] should be thrownBy
        DqdlParser.resolveDynamic(
          DynamicNumericCondition(">", Call("avg", Seq(Call("last", Seq(Lit(3)))))),
          Seq(1.0, Double.NaN))
    }

    "reject Analyzers entries carrying a condition" in {
      a[IllegalArgumentException] should be thrownBy
        EvaluateDataQuality.analyzerMetrics(orders,
          """Analyzers = [ Completeness "o_status" > 0.9 ]""")
    }
  }

  "EvaluateDataQuality.processRows" should {
    "resolve dynamic thresholds from repository history and save runs back" in {
      import graft.repository.{InMemoryMetricsRepository, ResultKey}
      val repo = new InMemoryMetricsRepository
      // seed two historical runs via process itself (saveResultsKey)
      Seq(1L, 2L).foreach { t =>
        EvaluateDataQuality.process(orders,
          """Rules = [ RowCount > 0, Mean "o_total" > 0 ]""",
          repository = Some(repo), saveResultsKey = Some(ResultKey(t)))
      }
      // history now holds RowCount=6 twice; 6 is within [0.9*6, 1.1*6]
      val out = EvaluateDataQuality.process(orders,
        """Rules = [
          |  RowCount between min(last(2)) * 0.9 and max(last(2)) * 1.1,
          |  Mean "o_total" > avg(last(2)) * 2.0
          |]""".stripMargin,
        repository = Some(repo)).collect()
      out(0).getString(1) shouldBe "Passed"
      // mean history equals the current mean, so "mean > 2x history" fails
      out(1).getString(1) shouldBe "Failed"
    }

    "fail a dynamic rule when no repository is supplied" in {
      // contained per rule, like every other rule-local compile failure
      val out = EvaluateDataQuality.process(orders,
        """Rules = [ RowCount > avg(last(3)) ]""").collect().head
      out.getString(1) shouldBe "Failed"
      out.getString(2) should include("MetricsRepository")
    }

    "contain a dynamic-resolution failure to its own rule" in {
      // empty repository: the dynamic rule has no history to resolve
      // against and must fail ALONE — the static rules still evaluate
      val repo = new InMemoryMetricsRepository
      val out = EvaluateDataQuality.process(orders,
        """Rules = [
          |  RowCount > 0,
          |  Mean "o_total" > avg(last(3)),
          |  IsComplete "o_id"
          |]""".stripMargin,
        repository = Some(repo)).collect()
      out.length shouldBe 3
      out(0).getString(1) shouldBe "Passed"
      out(1).getString(1) shouldBe "Failed"
      out(1).getString(2) should include("history")
      out(2).getString(1) shouldBe "Passed"
    }

    "reject a non-finite dynamic threshold (division by zero) per rule" in {
      val repo = new InMemoryMetricsRepository
      EvaluateDataQuality.process(orders,
        """Rules = [ RowCount > 0 ]""",
        repository = Some(repo), saveResultsKey = Some(ResultKey(1L)))
      val out = EvaluateDataQuality.process(orders,
        """Rules = [ RowCount > 0, RowCount > avg(last(1)) / 0 ]""",
        repository = Some(repo)).collect()
      out(0).getString(1) shouldBe "Passed"
      out(1).getString(1) shouldBe "Failed"
      out(1).getString(2) should include("finite")
    }

    "pass ColumnNamesMatchPattern on a contains-match like the reference" in {
      // all columns CONTAIN "o_" but none equals it - contains semantics
      // must pass, and an impossible anchor must fail
      val out = EvaluateDataQuality.process(orders,
        """Rules = [
          |  ColumnNamesMatchPattern "o_",
          |  ColumnNamesMatchPattern "^nope$"
          |]""".stripMargin).collect()
      out(0).getString(1) shouldBe "Passed"
      out(1).getString(1) shouldBe "Failed"
    }

    "compute the Analyzers section as metrics sharing the rules' scan" in {
      val metrics = EvaluateDataQuality.analyzerMetrics(orders,
        """Rules = [ RowCount > 0 ],
          |Analyzers = [ Completeness "o_status", Mean "o_total", RowCount ]""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      metrics(("Size", "*")) shouldBe 6.0
      metrics(("Completeness", "o_status")) shouldBe 1.0
      metrics(("Mean", "o_total")) shouldBe ((100.0 + 250.0 + 75.5 + 310.0 + 42.0 + 99.0) / 6)
    }

    "emit per-row outcome columns for row-level rules" in {
      val out = EvaluateDataQuality.processRows(orders,
        """Rules = [
          |  ColumnValues "o_total" between 0 and 300,
          |  IsComplete "o_status"
          |]""".stripMargin)
      out.count() shouldBe 6
      val outcomeCols = out.columns.filterNot(orders.columns.contains)
      outcomeCols.length shouldBe 2
      // o_total = 310.0 violates the between rule for exactly one row
      val betweenCol = outcomeCols.find(_.contains("between")).get
      out.filter(org.apache.spark.sql.functions.col(s"`$betweenCol`") === false)
        .count() shouldBe 1
    }
  }
}
