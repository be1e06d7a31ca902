package graft

import graft.pipeline.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** [[Ranking.groupedNtile]] must be bit-identical to Spark's own
  * `ntile(...).over(Window.partitionBy(g).orderBy(k...))` — the window IS
  * the semantics; groupedNtile only changes the execution shape (range
  * repartition + broadcast prefix offsets instead of a per-group
  * single-task sort).
  */
class RankingSpec extends AnyWordSpec with Matchers with SparkSpec {

  "groupedNtile" should {
    "match the Spark ntile window exactly on skewed groups" in {
      val s = spark
      import s.implicits._
      // deterministic pseudo-random data; group sizes 1, 2, 37, 160 —
      // including groups smaller than nBuckets and a null group
      val rows = (0 until 200).map { i =>
        val g =
          if (i == 0) "solo"
          else if (i <= 2) "pair"
          else if (i <= 39) null
          else "big"
        // xorshift-ish deterministic key with DELIBERATE ties (mod 17)
        val k = ((i * 2654435761L) >>> 7) % 17
        (i.toLong, g, k)
      }
      val df = rows.toDF("id", "grp", "k").repartition(7)
      for (nb <- Seq(2, 3, 5, 64)) {
        val got = Ranking
          .groupedNtile(df, "grp", Seq("k", "id"), nb)
          .select("id", "bucket").as[(Long, Int)].collect().toMap
        val want = df
          .withColumn("bucket",
            ntile(nb).over(Window.partitionBy("grp").orderBy("k", "id")))
          .select("id", "bucket").as[(Long, Int)].collect().toMap
        got shouldBe want
      }
    }

    "preserve the input columns and reject bad arguments" in {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "a", 5L), (2L, "a", 3L)).toDF("id", "grp", "k")
      val out = Ranking.groupedNtile(df, "grp", Seq("k"), 2)
      out.columns.toSeq shouldBe Seq("id", "grp", "k", "bucket")
      out.orderBy("id").select("bucket").as[Int].collect() shouldBe
        Array(2, 1) // id=2 has the smaller key -> bucket 1
      an[IllegalArgumentException] should be thrownBy
        Ranking.groupedNtile(df, "grp", Seq.empty, 2)
      an[IllegalArgumentException] should be thrownBy
        Ranking.groupedNtile(df, "grp", Seq("k"), 0)
    }
  }
}
