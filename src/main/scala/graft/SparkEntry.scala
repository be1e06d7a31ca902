package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.checks._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full VerificationSuite pipeline (fused scan + grouping
    * fusion + constraint evaluation) and returns the check results.
    */
  def entry(spark: SparkSession): DataFrame = {
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val check = Check(CheckLevel.Error, "lineitem integrity")
      .hasSize(_ > 0)
      .isComplete("l_orderkey")
      .isComplete("l_quantity")
      .satisfies("l_quantity > 0 AND l_quantity <= 50", "qty range", _ >= 0.99)
      .isNonNegative("l_extendedprice")
      .hasUniqueness(Seq("l_orderkey", "l_linenumber"), _ >= 0.5)
      .hasMin("l_discount", _ >= 0.0)
      .hasMax("l_quantity", _ <= 50.0)
      .hasCompleteness("l_shipdate", _ == 1.0)
    val result = VerificationSuite().onData(lineitem).addCheck(check).run()
    VerificationResult.checkResultsAsDataFrame(spark, result)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
