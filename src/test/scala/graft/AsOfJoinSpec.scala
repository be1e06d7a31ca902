package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class AsOfJoinSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def quotes = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 9.0),
      (1L, ts("2024-01-01 10:00:05"), 101L, 10.0),
      (1L, ts("2024-01-01 10:00:05"), 102L, 11.0), // tie on ts
      (1L, ts("2024-01-01 10:00:20"), 103L, 12.0),
      (2L, ts("2024-01-01 10:00:01"), 200L, 50.0))
      .toDF("key", "ts", "qid", "price")
  }

  private def trades = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:03"), 1000L), // after 100
      (1L, ts("2024-01-01 10:00:05"), 1001L), // simultaneous with 101/102
      (1L, ts("2024-01-01 10:00:30"), 1002L), // after everything
      (2L, ts("2024-01-01 10:00:00"), 2000L), // before any key-2 quote
      (3L, ts("2024-01-01 10:00:00"), 3000L)) // key with no quotes
      .toDF("key", "ts", "tid")
  }

  private def matchMap(allowEqual: Boolean, tolUs: Option[Long] = None) =
    AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts",
      payloadCols = Seq("qid", "price"),
      tiebreakCol = Some("qid"),
      allowEqual = allowEqual, toleranceUs = tolUs)
      .collect()
      .map(r => r.getLong(r.fieldIndex("tid")) ->
        (if (r.isNullAt(r.fieldIndex("asof_qid"))) -1L
         else r.getLong(r.fieldIndex("asof_qid"))))
      .toMap

  "asofJoin" should {
    "match the latest prior-or-equal right row, largest tiebreak on ties" in {
      val m = matchMap(allowEqual = true)
      m(1000L) shouldBe 100L // only 10:00:00 is prior
      m(1001L) shouldBe 102L // equal ts visible; tie -> larger qid
      m(1002L) shouldBe 103L
      m(2000L) shouldBe -1L // key-2 quote is 1s later
      m(3000L) shouldBe -1L // no right rows for key 3
    }

    "hide simultaneous right rows when allowEqual is false" in {
      val m = matchMap(allowEqual = false)
      m(1001L) shouldBe 100L // 10:00:05 quotes no longer visible
      m(1000L) shouldBe 100L
      m(1002L) shouldBe 103L
    }

    "null out matches staler than the tolerance" in {
      // trade 1002 at 10:00:30 matched quote 103 at 10:00:20 (10s stale)
      val strict = matchMap(allowEqual = true, tolUs = Some(5L * 1000000))
      strict(1002L) shouldBe -1L
      strict(1000L) shouldBe 100L // 3s stale, inside tolerance
      val loose = matchMap(allowEqual = true, tolUs = Some(15L * 1000000))
      loose(1002L) shouldBe 103L
    }

    "pass left columns through unchanged and prefix right payloads" in {
      val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts",
        payloadCols = Seq("price"), tiebreakCol = Some("qid"))
      out.columns.toSeq shouldBe
        Seq("key", "ts", "tid", "asof_ts", "asof_price")
      out.count() shouldBe trades.count()
    }

    "shuffle exactly once, on the key" in {
      val out = AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts",
        payloadCols = Seq("price"), tiebreakCol = Some("qid"))
      out.collect()
      // AQE prints the plan twice (final + initial); audit the final only
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      plan should not include "Join" // never a range/cross join
      plan.linesIterator
        .count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }

    "reject colliding or missing contract columns" in {
      an[IllegalArgumentException] should be thrownBy
        AsOfJoin.asofJoin(trades, quotes, Seq.empty, "ts", Seq("price"))
      an[IllegalArgumentException] should be thrownBy
        AsOfJoin.asofJoin(trades, quotes, Seq("key"), "ts", Seq("ts"))
      an[IllegalArgumentException] should be thrownBy
        AsOfJoin.asofJoin(
          trades.withColumnRenamed("tid", "asof_tid"),
          quotes, Seq("key"), "ts", Seq("price"))
    }
  }
}
