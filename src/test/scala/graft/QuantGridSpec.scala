package graft

import graft.pipeline.{Clustering, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** The integer-grid (quantized) k-means and embedding-decontamination
  * paths: every decision is exact 64-bit integer math, so a plain-Scala
  * BigInt replay must agree BIT-FOR-BIT — no tolerance, no grid-margin
  * argument. This is the property that makes the q102/q103 oracles
  * engine-version-proof.
  */
class QuantGridSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def quant(v: Array[Float], scale: Long = 1000L): Array[Long] =
    v.map(x => math.floor(x.toDouble * scale + 0.5).toLong)

  /** Exact integer Lloyd replay (BigInt to rule out any replay-side
    * overflow masking an engine-side one).
    */
  private def localQuantLloyd(
      vecs: Seq[Array[Long]],
      init: Seq[Array[Long]],
      iterations: Int,
      m: Long): Seq[Array[Long]] = {
    val dim = init.head.length
    var cents = init.map(_.clone())
    def assign(v: Array[Long]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        val dot = v.zip(c).map { case (a, b) => BigInt(a) * b }.sum
        (BigInt(2 * m) * dot - c.map(x => BigInt(x) * x).sum, i)
      }.maxBy(identity)._2
    for (_ <- 0 until iterations) {
      val byCell = vecs.groupBy(assign)
      cents = cents.zipWithIndex.map { case (old, cell) =>
        byCell.get(cell) match {
          case Some(mem) if mem.nonEmpty =>
            Array.tabulate(dim) { j =>
              val s = mem.map(v => BigInt(v(j))).sum * m
              val fd = (s - (((s mod mem.length) + mem.length) mod mem.length)) / mem.length
              fd.toLong
            }
          case _ => old
        }
      }
    }
    cents
  }

  private val points: Seq[(Long, Array[Float], Int)] = Seq(
    (0L, Array(0.11f, 0.27f), 1), (1L, Array(-0.13f, 0.12f), 1),
    (2L, Array(0.21f, -0.23f), 2), (3L, Array(0.91f, 0.89f), 2),
    (4L, Array(0.82f, 1.02f), 3), (5L, Array(1.01f, 0.99f), 3),
    (6L, Array(0.49f, 0.51f), 1), (7L, Array(-0.77f, -0.68f), 2))

  "lloydQuantized" should {
    "match an exact BigInt replay bit-for-bit (centroids, assignment, dist2num)" in {
      val s = spark
      import s.implicits._
      val df = points.map { case (id, v, lab) => (id, v.toSeq, lab) }
        .toDF("id", "vec", "label")
      val init = Clustering.initMinIdQuantized(df, "id", "vec", 2)
      val model = Clustering.lloydQuantized(df, "vec", init, iterations = 3)

      val qvecs = points.map(p => quant(p._2))
      val localInit = points.sortBy(_._1).take(2)
        .map(p => quant(p._2).map(_ * 1000L))
      init.map(_.toSeq) shouldBe localInit.map(_.toSeq)
      val localCents = localQuantLloyd(qvecs, localInit, 3, 1000L)
      model.centroids.map(_.toSeq) shouldBe localCents.map(_.toSeq)

      val assigned = Clustering.assignQuantized(df, "vec", model)
        .select(col("id"), col("cell"), col("dist2num"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      points.foreach { case (id, v, _) =>
        val vq = quant(v)
        val scored = localCents.zipWithIndex.map { case (c, i) =>
          val dot = vq.zip(c).map { case (a, b) => BigInt(a) * b }.sum
          (BigInt(2000L) * dot - c.map(x => BigInt(x) * x).sum, i)
        }
        val (bestKey, bestCell) = scored.maxBy(identity)
        val n2v = vq.map(x => BigInt(x) * x).sum
        val d2 = BigInt(1000000L) * n2v - bestKey
        val (_, cell, dist2num) = (id, assigned(id)._1, assigned(id)._2)
        cell shouldBe bestCell
        BigInt(dist2num) shouldBe d2
      }
    }

    "carry empty cells and keep exact history inertia" in {
      val s = spark
      import s.implicits._
      val df = points.map { case (id, v, _) => (id, v.toSeq) }.toDF("id", "vec")
      val far = Array(900000000L, 900000000L) // a centroid no row is near
      val model = Clustering.lloydQuantized(
        df, "vec", Seq(Array(0L, 0L), far), iterations = 2)
      model.centroids(1).toSeq shouldBe far.toSeq
      model.history.foreach(_.cellSizes.getOrElse(1, 0L) shouldBe 0L)
      // exact inertia numerator under the assigning centroid at iter 1:
      // all rows in cell 0 with c = (0,0) -> inertiaNum = M^2 * sum |vq|^2
      val expected = points.map(p =>
        quant(p._2).map(x => x * x).sum * 1000000L).sum
      model.history.head.inertiaNum shouldBe expected
    }

    "agree with the double-path lloyd on well-separated data" in {
      val s = spark
      import s.implicits._
      val sep = Seq(
        (0L, Seq(0.1f, 0.2f)), (1L, Seq(-0.1f, 0.1f)), (2L, Seq(0.2f, -0.2f)),
        (3L, Seq(10.1f, 9.9f)), (4L, Seq(9.8f, 10.2f)), (5L, Seq(10.0f, 10.0f)))
      val df = sep.toDF("id", "vec")
      val initD = Clustering.initMinId(df, "id", "vec", 2)
      val modelD = Clustering.lloyd(df, "vec", initD, iterations = 3)
      val cellsD = Clustering.assign(df, "vec", modelD.centroids)
        .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val initQ = Clustering.initMinIdQuantized(df, "id", "vec", 2)
      val modelQ = Clustering.lloydQuantized(df, "vec", initQ, iterations = 3)
      val cellsQ = Clustering.assignQuantized(df, "vec", modelQ)
        .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      cellsQ shouldBe cellsD
    }
  }

  "decontaminateByEmbeddingGrid" should {
    "match an exact BigInt replay (best probe, key, contamination)" in {
      val s = spark
      import s.implicits._
      val corpus = Seq(
        (10L, Seq(0.71f, 0.70f)), (11L, Seq(-0.71f, 0.70f)),
        (12L, Seq(0.99f, 0.14f)), (13L, Seq(0.00f, -1.00f)),
        (14L, Seq(0.35f, 0.94f)), (15L, Seq(-0.6f, -0.8f)))
        .toDF("id", "vec")
      val probesF = Seq(
        1L -> Array(1.0, 0.0), 2L -> Array(0.6, 0.8), 3L -> Array(-0.8, 0.6))
      val probes = Similarity.quantizeProbes(probesF)
      val out = Similarity.decontaminateByEmbeddingGrid(
          corpus, "id", "vec", probes, tau2Num = 49L, tau2Den = 400L)
        .select(col("id"), col("best_probe"), col("best_key"),
          col("contaminated"), col("n2v"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap

      val qp = probes.map { case (pid, p) => (pid, p, p.map(x => BigInt(x) * x).sum) }
      Seq(
        (10L, Array(0.71f, 0.70f)), (11L, Array(-0.71f, 0.70f)),
        (12L, Array(0.99f, 0.14f)), (13L, Array(0.00f, -1.00f)),
        (14L, Array(0.35f, 0.94f)), (15L, Array(-0.6f, -0.8f))
      ).foreach { case (id, v) =>
        val vq = quant(v)
        val n2v = vq.map(x => BigInt(x) * x).sum
        val best = qp.map { case (pid, p, n2p) =>
          val dq = vq.zip(p).map { case (a, b) => BigInt(a) * b }.sum
          val fd = (dq * dq * 1000) / n2p // operands >= 0: / == floorDiv
          (if (dq >= 0) fd else -fd, pid, dq, n2p)
        }.maxBy { case (k, pid, _, _) => (k, pid) }
        val (k, pid, dq, n2p) = best
        val contam = dq >= 0 && dq * dq * 400 >= n2v * n2p * 49
        val (gotPid, gotKey, gotContam, gotN2v) = out(id)
        gotPid shouldBe pid
        BigInt(gotKey) shouldBe k
        gotContam shouldBe contam
        BigInt(gotN2v) shouldBe n2v
      }
    }

    "flag exact-threshold equality as contaminated (>= semantics)" in {
      val s = spark
      import s.implicits._
      // colinear vectors: cos == 1 exactly on the grid; 400*dq^2 ==
      // 400*n2v*n2p >= 49*n2v*n2p holds with integer equality math
      val corpus = Seq((1L, Seq(0.6f, 0.8f))).toDF("id", "vec")
      val probes = Seq(5L -> Array(600L, 800L))
      val out = Similarity.decontaminateByEmbeddingGrid(
          corpus, "id", "vec", probes).collect().head
      out.getAs[Boolean]("contaminated") shouldBe true
      // cos = 1 -> skey = floorDiv(dq^2*1000, n2p) = n2v*1000 exactly
      out.getAs[Long]("best_key") shouldBe 1000000L * 1000L
    }

    "break ranking-key ties to the higher probe id" in {
      val s = spark
      import s.implicits._
      val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
      // two identical probes -> identical keys -> higher pid wins
      val probes = Seq(7L -> Array(500L, 0L), 9L -> Array(500L, 0L))
      val out = Similarity.decontaminateByEmbeddingGrid(
          corpus, "id", "vec", probes).collect().head
      out.getAs[Long]("best_probe") shouldBe 9L
    }

    "fail loudly on corpus vectors outside the 2^53 exactness envelope" in {
      val s = spark
      import s.implicits._
      val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
      val probes = Seq(1L -> Array(1000L, 0L))
      // keyScale 2^33 shrinks the |vq|^2 bound to ~1; the unit vector's
      // n2v = 1e6 must trip the runtime guard, not corrupt the key
      val ex = intercept[Exception] {
        Similarity.decontaminateByEmbeddingGrid(
          corpus, "id", "vec", probes, keyScale = 1L << 33).collect()
      }
      val messages = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(String.valueOf(_)).mkString("\n")
      messages should include("exactness envelope")
      // and a keyScale so large even an EMPTY envelope remains is
      // rejected at the driver, before any job runs
      val ex2 = intercept[IllegalArgumentException] {
        Similarity.decontaminateByEmbeddingGrid(
          corpus, "id", "vec", probes, keyScale = 1L << 60)
      }
      ex2.getMessage should include("no exactness envelope")
    }
  }
}
