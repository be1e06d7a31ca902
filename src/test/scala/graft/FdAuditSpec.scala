package graft

import graft.operators.FdAudit
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

class FdAuditSpec extends AnyWordSpec with Matchers with SparkSpec {

  private def frame = {
    val s = spark
    import s.implicits._
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    Seq[(java.lang.Long, String)](
      (L(1), "a"), (L(1), "a"), (L(1), "b"), // violated: plurality a
      (L(2), "x"), (L(2), "x"),              // clean
      (L(3), null),                          // clean (single null value)
      (L(4), "y"), (L(4), null),             // violated: null is a value
      (null, "z"))                           // null LHS group, clean
      .toDF("id", "v")
  }

  "fdAudit" should {
    "census violations with null-safe semantics and repair cost" in {
      val r = FdAudit.fdAudit(frame, Seq("id"), "v").collect().head
      val m = r.schema.fieldNames.zip(r.toSeq).toMap
      m("n_rows") shouldBe 9L
      m("n_groups") shouldBe 5L
      m("violating_groups") shouldBe 2L // ids 1 and 4
      m("violating_rows") shouldBe 5L   // 3 + 2
      m("repair_rows") shouldBe 2L      // drop 'b' from id 1, one of id 4
    }

    "report a clean FD as zero-violation" in {
      val s = spark
      import s.implicits._
      val clean = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v")
      val r = FdAudit.fdAudit(clean, Seq("id"), "v").collect().head
      r.getLong(r.fieldIndex("violating_groups")) shouldBe 0L
      r.getLong(r.fieldIndex("repair_rows")) shouldBe 0L
    }

    "list the violating groups with plurality sizes" in {
      val rows = FdAudit.fdViolations(frame, Seq("id"), "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      rows shouldBe Set((1L, 2L, 3L, 2L), (4L, 2L, 2L, 1L))
    }

    "reject rhs inside lhs" in {
      an[IllegalArgumentException] should be thrownBy
        FdAudit.fdAudit(frame, Seq("v"), "v")
    }
  }
}
