package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.expressions.{GraftFunctions, LongDotProduct}

/** The native codegen'd integer dot-product kernel: interpreted eval,
  * whole-stage-codegen eval, and the SQL-registered form must all agree
  * with a BigInt replay; nulls and length mismatches follow the
  * documented contract (null array → null, null elements skipped, sum
  * over the shared prefix).
  */
class GridExpressionsSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val cases: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (Seq(-1000L, 999L, 0L), Seq(1000L, 1000L, -7L)),
    (Seq.empty, Seq(1L)),
    (Seq(5L, null, 7L), Seq(2L, 3L, null)),
    (Seq(1L, 2L, 3L, 4L), Seq(10L, 20L)), // length mismatch: shared prefix
    (Seq(1000000L, -1000000L), Seq(1000000L, 1000000L)))

  private def expected(a: Seq[java.lang.Long], b: Seq[java.lang.Long]): Long =
    a.zip(b).collect {
      case (x, y) if x != null && y != null => x.longValue * y.longValue
    }.sum

  "LongDotProduct" should {
    "match the BigInt replay through the DataFrame (codegen) path" in {
      val s = spark
      import s.implicits._
      val df = cases.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }.toDF("i", "a", "b")
      val got = df.select(col("i"),
          GraftFunctions.dot_long(col("a"), col("b")).as("d"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      cases.zipWithIndex.foreach { case ((a, b), i) =>
        got(i) shouldBe expected(a, b)
      }
    }

    "return null for a null array side and survive both eval modes" in {
      val s = spark
      import s.implicits._
      val df = Seq(
        (1, Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
        (2, None: Option[Seq[Long]], Some(Seq(3L))),
        (3, Some(Seq(2L, 3L)), Some(Seq(5L, 7L)))).toDF("i", "a", "b")
      val viaCodegen = df
        .select(col("i"), GraftFunctions.dot_long(col("a"), col("b")).as("d"))
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      viaCodegen(1) shouldBe None
      viaCodegen(2) shouldBe None
      viaCodegen(3) shouldBe Some(31L)
      // interpreted path: direct expression eval over literals
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.sql.types.{ArrayType, LongType}
      def arr(xs: Seq[Long]) =
        Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
      LongDotProduct(arr(Seq(2L, 3L)), arr(Seq(5L, 7L)))
        .eval(null) shouldBe 31L
      Option(LongDotProduct(
        Literal(null, ArrayType(LongType)), arr(Seq(1L)))
        .eval(null)) shouldBe None
    }

    "reject non-long-array inputs at analysis time" in {
      val s = spark
      import s.implicits._
      val df = Seq((1, Seq(1.0, 2.0))).toDF("i", "a")
      an[Exception] should be thrownBy
        df.select(GraftFunctions.dot_long(col("a"), col("a"))).collect()
    }

    "be callable from SQL once registered" in {
      GraftFunctions.register(spark)
      spark.sql("SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .collect().head.getLong(0) shouldBe 32L
    }

    "appear inside the codegen'd projection (no fallback)" in {
      // a non-foldable source, so the projection cannot constant-fold
      val df = spark.range(100)
        .select(transform(sequence(lit(0L), col("id") % 4),
          x => x + 1L).as("a"))
        .select(GraftFunctions.dot_long(col("a"), col("a")).as("d"))
      val plan = df.queryExecution.executedPlan.toString
      // the `*(n)` prefix is the whole-stage-codegen marker: the
      // projection holding graft_dot_long must carry it (the HOF
      // transform feeding it is fallback — exactly why the kernel is a
      // native expression)
      val dotLine = plan.linesIterator
        .find(_.contains("graft_dot_long")).getOrElse("")
      dotLine.trim should startWith("*(")
      df.agg(sum(col("d"))).collect().head.getLong(0) should be > 0L
    }
  }
}
