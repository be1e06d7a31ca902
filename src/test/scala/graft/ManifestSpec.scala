package graft

import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** Oracle-suite manifest guard (round-11 verdict item #2).
  *
  * Round 9/10 incident: q37/q38 started erroring at analysis time and the
  * correctness suite silently shrank 56 → 54 — the driver just omits
  * erroring queries from CORRECTNESS, so nothing failed loudly for two
  * rounds. This spec makes that class of silence impossible:
  *
  *   1. the query count is PINNED — adding a query means updating the pin
  *      (a conscious act), and a query vanishing fails the build;
  *   2. every query key has an oracle entry (the driver's hash gate needs
  *      both) — a key drifting between the two maps fails here, not in a
  *      weaker rows-only check nobody asked for;
  *   3. every query EXECUTES against sf0.001 — analysis errors (stale
  *      schema adapters, renamed columns in regenerated test data) surface
  *      in `sbt test`, not two rounds later in a bench errors map.
  */
class ManifestSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val ExpectedQueryCount = 174
  private val smokeSf = "/root/testdata/sf0.001"

  "the oracle suite manifest" should {
    "pin the query count" in {
      SparkEntry.queries.size shouldBe ExpectedQueryCount
    }

    "give every query an oracle (keysets identical)" in {
      SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
    }

    "use q<nn>_ naming so driver ordering is stable" in {
      all(SparkEntry.queries.keys.toSeq) should fullyMatch regex "q\\d{2,3}_[a-z0-9_]+"
      // no duplicate numeric prefixes — two q37s would shadow in reports
      // (compare the full qNNN prefix, not a fixed 3 chars: q10 vs q100)
      val prefixes = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
      prefixes.distinct.size shouldBe prefixes.size
    }
  }

  "every manifest query" should {
    "execute end-to-end at sf0.001 with rows > 0" in {
      assume(new java.io.File(smokeSf).isDirectory, s"$smokeSf not present")
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            val n = fn(spark, smokeSf).count()
            if (n > 0) None else Some(s"$name: 0 rows")
          } catch {
            case e: Throwable =>
              Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
          }
      }
      withClue(failures.mkString("\n")) { failures shouldBe empty }
    }
  }
}
