package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.sketch.{FreqItems, HllState, KllGroupState, StateDrift}

/** Snapshot drift composed from persisted sketch states (q152): full
  * outer on the group keys (a one-sided group is a signal), exact-mode
  * equalities where the sketches are exact, churn bookkeeping.
  */
class StateDriftSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def frame(rows: Seq[(String, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("grp", "item", "len")
  }

  private val snapA = frame(Seq(
    ("g1", "x", 10L), ("g1", "x", 20L), ("g1", "y", 30L),
    ("g2", "a", 5L), ("g2", "b", 15L)))
  private val snapB = frame(Seq(
    ("g1", "x", 12L), ("g1", "z", 40L), ("g1", "z", 50L),
    ("g3", "q", 7L)))

  "distinctDrift" should {
    "report both sides with zeros for one-sided groups" in {
      val d = StateDrift.distinctDrift(
        HllState.distinctState(snapA, Seq("grp"), Seq("item")),
        HllState.distinctState(snapB, Seq("grp"), Seq("item")))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      d("g1") shouldBe ((2L, 2L)) // {x,y} vs {x,z}
      d("g2") shouldBe ((2L, 0L))
      d("g3") shouldBe ((0L, 1L))
    }
  }

  "quantileDrift" should {
    "shift per group and null out one-sided groups" in {
      val d = StateDrift.quantileDrift(
        KllGroupState.quantileState(snapA, Seq("grp"), "len"),
        KllGroupState.quantileState(snapB, Seq("grp"), "len"),
        Seq(0.5), Seq("p50"))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(r.fieldIndex("p50_a"))),
            Option(r.get(r.fieldIndex("p50_b"))),
            Option(r.get(r.fieldIndex("p50_shift"))))).toMap
      // KLL rule: smallest v with cum weight >= 0.5*n
      d("g1") shouldBe ((Some(20.0), Some(40.0), Some(20.0)))
      d("g2")._1 shouldBe Some(5.0)
      d("g2")._2 shouldBe None
      d("g2")._3 shouldBe None
      d("g3")._1 shouldBe None
    }
  }

  "frequencyDrift" should {
    "be exact (zero err) when both summaries cover the vocabulary" in {
      val d = StateDrift.frequencyDrift(
        FreqItems.freqState(snapA, Seq("grp"), "item", 16),
        FreqItems.freqState(snapB, Seq("grp"), "item", 16), 16)
        .collect().map(r => r.getString(0) -> r).toMap
      val g1 = d("g1")
      g1.getAs[Long]("n_a") shouldBe 3L
      g1.getAs[Long]("n_b") shouldBe 3L
      // p_a: x 2/3, y 1/3; p_b: x 1/3, z 2/3 -> L1 = 1/3 + 1/3 + 2/3
      g1.getAs[Double]("l1_est") shouldBe (4.0 / 3.0) +- 1e-12
      g1.getAs[Double]("l1_err") shouldBe 0.0
      g1.getAs[Long]("new_items") shouldBe 1L // z
      g1.getAs[Long]("lost_items") shouldBe 1L // y
      // one-sided groups: all mass new/lost, the other side 0
      d("g2").getAs[Long]("n_b") shouldBe 0L
      d("g2").getAs[Double]("l1_est") shouldBe 1.0 +- 1e-12
      d("g2").getAs[Long]("lost_items") shouldBe 2L
      d("g3").getAs[Long]("n_a") shouldBe 0L
      d("g3").getAs[Long]("new_items") shouldBe 1L
    }
  }
}
