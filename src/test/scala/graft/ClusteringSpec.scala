package graft

import graft.pipeline.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class ClusteringSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Plain-Scala Lloyd replay with the engine's exact conventions:
    * squared-L2 argmin via score = x·c − |c|²/2, ties to the higher
    * cell, empty cells carry, means on the rounding grid.
    */
  private def localLloyd(
      vecs: Seq[Array[Float]],
      init: Seq[Array[Double]],
      iterations: Int,
      roundDecimals: Int): (Seq[Array[Double]], Seq[(Map[Int, Long], Double)]) = {
    val dim = init.head.length
    var cents = init.map(_.clone())
    val hist = Seq.newBuilder[(Map[Int, Long], Double)]
    for (_ <- 0 until iterations) {
      val assigned = vecs.map { v =>
        // higher score wins, tie -> higher cell (max-struct semantics)
        val scored = cents.zipWithIndex.map { case (c, i) =>
          var dot = 0.0
          var j = 0
          while (j < dim) { dot += v(j).toDouble * c(j); j += 1 }
          (dot - c.map(x => x * x).sum / 2.0, i)
        }
        val best = scored.maxBy { case (s, cell) => (s, cell) }._2
        (best, v)
      }
      val inertia = assigned.map { case (cell, v) =>
        val c = cents(cell)
        v.zip(c).map { case (x, cx) => (x.toDouble - cx) * (x.toDouble - cx) }.sum
      }.sum
      val sizes = assigned.groupBy(_._1).map { case (c, g) => c -> g.size.toLong }
      hist += ((sizes, inertia))
      cents = cents.zipWithIndex.map { case (old, cell) =>
        val members = assigned.filter(_._1 == cell).map(_._2)
        if (members.isEmpty) old
        else {
          val m = new Array[Double](dim)
          members.foreach(v => (0 until dim).foreach(j => m(j) += v(j)))
          (0 until dim).foreach { j =>
            val mean = m(j) / members.length
            m(j) = if (roundDecimals >= 0)
              BigDecimal(mean)
                .setScale(roundDecimals, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            else mean
          }
          m
        }
      }
    }
    (cents, hist.result())
  }

  private val points: Seq[(Long, Array[Float])] = Seq(
    // two tight groups around (0,0) and (10,10), one outlier
    0L -> Array(0.1f, 0.2f), 1L -> Array(-0.1f, 0.1f), 2L -> Array(0.2f, -0.2f),
    3L -> Array(10.1f, 9.9f), 4L -> Array(9.8f, 10.2f), 5L -> Array(10.0f, 10.0f),
    6L -> Array(4.9f, 5.1f))

  "lloyd" should {
    "match a local replay step for step (sizes, inertia, centroids)" in {
      val s = spark
      import s.implicits._
      val df = points.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      val init = Seq(Array(0.0, 0.0), Array(1.0, 1.0))
      val model = Clustering.lloyd(df, "vec", init, iterations = 4,
        roundDecimals = 6)
      val (expCents, expHist) = localLloyd(points.map(_._2), init, 4, 6)
      model.history.map(h => (h.cellSizes, h.inertia)).zip(expHist).foreach {
        case ((gotSizes, gotIn), (expSizes, expIn)) =>
          gotSizes shouldBe expSizes
          gotIn shouldBe expIn +- 1e-9
      }
      model.centroids.zip(expCents).foreach { case (g, e) =>
        g.zip(e).foreach { case (a, b) => a shouldBe b +- 1e-12 }
      }
      // objective is monotone non-increasing
      model.history.map(_.inertia).sliding(2).foreach {
        case Seq(a, b) => b should be <= a + 1e-9
        case _         =>
      }
    }

    "carry the previous centroid through an empty cell" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.2f, 0.0f)))
        .toDF("id", "vec")
      val far = Array(1000.0, 1000.0)
      val model = Clustering.lloyd(df, "vec", Seq(Array(0.0, 0.0), far), 3)
      model.centroids(1) shouldBe far // never claimed a row, never moved
      model.history.foreach(_.cellSizes.getOrElse(1, 0L) shouldBe 0L)
    }

    "exclude null and dim-mismatched vectors from training" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, Some(Seq(1.0f, 1.0f))), (2L, Some(Seq(3.0f, 3.0f))),
        (3L, None), (4L, Some(Seq(1.0f, 2.0f, 3.0f)))).toDF("id", "vec")
      val model = Clustering.lloyd(df, "vec", Seq(Array(0.0, 0.0)), 1)
      model.history.head.cellSizes shouldBe Map(0 -> 2L)
      model.centroids.head.toSeq shouldBe Seq(2.0, 2.0)
    }
  }

  "VecStatsAggregator merge" should {
    "equal single-pass accumulation for any split" in {
      val vs = Seq(Array(1.0f, 2.0f), Array(3.0f, -1.0f), Array(0.5f, 0.5f),
        Array(-2.0f, 4.0f))
      val full = vs.foldLeft(new Clustering.VecStatsState(0, 0.0, null))(_.add(_))
      for (cut <- 0 to vs.length) {
        val a = vs.take(cut).foldLeft(new Clustering.VecStatsState(0, 0.0, null))(_.add(_))
        val b = vs.drop(cut).foldLeft(new Clustering.VecStatsState(0, 0.0, null))(_.add(_))
        val m = a.mergeIn(b)
        m.n shouldBe full.n
        m.sumSq shouldBe full.sumSq +- 1e-12
        m.sums.toSeq.zip(full.sums.toSeq).foreach { case (x, y) =>
          x shouldBe y +- 1e-12
        }
      }
    }
  }

  "assign" should {
    "give nearest cells with null for invalid vectors" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1L, Some(Seq(0.0f, 0.1f))), (2L, Some(Seq(9.9f, 10.0f))),
        (3L, None)).toDF("id", "vec")
      val cents = Seq(Array(0.0, 0.0), Array(10.0, 10.0))
      val rows = Clustering.assign(df, "vec", cents)
        .select(col("id"), col("cell"), col("dist2")).collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) -1 else r.getInt(1)),
            if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
      rows(1L)._1 shouldBe 0
      rows(1L)._2 shouldBe 0.01 +- 1e-9
      rows(2L)._1 shouldBe 1
      rows(2L)._2 shouldBe 0.01 +- 1e-6
      rows(3L) shouldBe ((-1, -1.0))
    }
  }

  "cellState / mergeCellStates / centroidsFromState" should {
    "merge to the full-corpus state exactly and step like lloyd" in {
      val s = spark
      import s.implicits._
      val all = points.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      val a = all.where(col("id") % 2 === 0)
      val b = all.where(col("id") % 2 === 1)
      val init = Clustering.initMinId(all, "id", "vec", 2)

      val merged = Clustering.mergeCellStates(
        Clustering.cellState(a, "vec", init),
        Clustering.cellState(b, "vec", init))
      val full = Clustering.cellState(all, "vec", init)
      def snapshot(st: org.apache.spark.sql.DataFrame) = st.collect()
        .map(r => r.getInt(0) -> ((r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP),
          r.getSeq[Double](3).map(x => BigDecimal(x).setScale(9,
            BigDecimal.RoundingMode.HALF_UP)).toList))).toMap
      snapshot(merged) shouldBe snapshot(full)

      // centroidsFromState over the merged state == one lloyd step on
      // the same grid
      val stepped = Clustering.centroidsFromState(merged, init, 6)
      val viaLloyd = Clustering.lloyd(all, "vec", init,
        iterations = 1, roundDecimals = 6).centroids
      stepped.map(_.toSeq) shouldBe viaLloyd.map(_.toSeq)
    }

    "round-trip through parquet and carry empty cells" in {
      val s = spark
      import s.implicits._
      val all = points.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      val init = Clustering.initMinId(all, "id", "vec", 2)
      // a far-away third centroid claims nothing: absent from the state
      val far = init :+ Array(100.0, 100.0)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-kmstate").toString
      Clustering.writeCellState(
        Clustering.cellState(all, "vec", far), s"$dir/st")
      val re = Clustering.readCellState(s, s"$dir/st")
      re.select("cell").collect().map(_.getInt(0)).toSet shouldBe Set(0, 1)
      val stepped = Clustering.centroidsFromState(re, far, 6)
      stepped(2).toSeq shouldBe Seq(100.0, 100.0) // carried, not invented
    }
  }

  "initMinId and initKMeansPlusPlus" should {
    "return k vectors; ++ seeds spread across the groups" in {
      val s = spark
      import s.implicits._
      val df = points.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      val minId = Clustering.initMinId(df, "id", "vec", 2)
      minId.map(_.toSeq) shouldBe Seq(Seq(0.1f.toDouble, 0.2f.toDouble),
        Seq((-0.1f).toDouble, 0.1f.toDouble))
      val pp = Clustering.initKMeansPlusPlus(df, "vec", 3, sampleSize = 7)
      pp should have length 3
      // d²-proportional draws never repeat a point while distinct ones remain
      pp.map(_.toSeq).distinct.length shouldBe 3
    }
  }
}
