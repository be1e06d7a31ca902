package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.operators.EventAnalytics
import graft.sketch.{FreqItems, StateDrift}

/** Degenerate-input behavior of the round-15 state families: empty
  * frames produce empty (not crashing, not null-poisoned) states, and
  * empty states fold as identities.
  */
class R15EdgeCasesSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def emptyItems = {
    val s = spark
    import s.implicits._
    Seq.empty[(String, String)].toDF("grp", "item")
  }

  "FreqItems" should {
    "produce an empty state from an empty frame and fold it as identity" in {
      val s = spark
      import s.implicits._
      val empty = FreqItems.freqState(emptyItems, Seq("grp"), "item", 8)
      empty.count() shouldBe 0L
      val real = FreqItems.freqState(
        Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("grp", "item"),
        Seq("grp"), "item", 8)
      val merged = FreqItems.mergeStates(real, empty, 8)
      val row = merged.collect().head.getStruct(1)
      row.getAs[Long]("n") shouldBe 3L
      row.getAs[Map[String, Long]]("counters") shouldBe Map("x" -> 2L, "y" -> 1L)
      FreqItems.heavyHitters(empty, 0.1, 8).count() shouldBe 0L
    }

    "survive an all-null item group" in {
      val s = spark
      import s.implicits._
      val st = FreqItems.freqState(
        Seq(("g", null: String), ("g", null: String)).toDF("grp", "item"),
        Seq("grp"), "item", 8)
      val row = st.collect().head.getStruct(1)
      row.getAs[Long]("n") shouldBe 0L
      row.getAs[Map[String, Long]]("counters") shouldBe Map.empty
      // n = 0 groups contribute no heavy hitters and no divide-by-zero
      FreqItems.heavyHitters(st, 0.1, 8).count() shouldBe 0L
    }
  }

  "funnelState/funnelFromState" should {
    "return empty output for events matching no step" in {
      val s = spark
      import s.implicits._
      val ev = Seq(("u", 1L, "other")).toDF("user", "ts", "et")
      val st = EventAnalytics.funnelState(ev, Seq("user"), "ts",
        Seq(col("et") === "s0", col("et") === "s1"), cap = 4)
      st.count() shouldBe 0L
      EventAnalytics.funnelFromState(st, 2).count() shouldBe 0L
    }

    "exclude keys without a step-0 match, like the batch funnel" in {
      val s = spark
      import s.implicits._
      val ev = Seq(("u1", 1L, "s1"), ("u2", 2L, "s0")).toDF("user", "ts", "et")
      val steps = Seq(col("et") === "s0", col("et") === "s1")
      val rep = EventAnalytics.funnelFromState(
        EventAnalytics.funnelState(ev, Seq("user"), "ts", steps, 4), 2)
      rep.select("user").collect().map(_.getString(0)).toSeq shouldBe Seq("u2")
    }
  }

  "StateDrift" should {
    "treat an entirely empty snapshot side as all-churn, not a crash" in {
      val s = spark
      import s.implicits._
      val real = FreqItems.freqState(
        Seq(("g", "x"), ("g", "y")).toDF("grp", "item"), Seq("grp"), "item", 8)
      val empty = FreqItems.freqState(emptyItems, Seq("grp"), "item", 8)
      val d = StateDrift.frequencyDrift(real, empty, 8).collect()
      d.length shouldBe 1
      d.head.getAs[Long]("n_b") shouldBe 0L
      d.head.getAs[Long]("lost_items") shouldBe 2L
      d.head.getAs[Double]("l1_est") shouldBe 1.0 +- 1e-12
    }
  }
}
