package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.pipeline.Mixing

class MixingSpec extends AnyWordSpec with Matchers with SparkSpec {

  /** Local replay of Mixing.sampleHash for oracle-style expectations. */
  private def localHash(seed: String, id: Any): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$seed:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
  }

  private def localTokens(text: String): Long =
    if (text == null) 0L else text.split("\\s+").count(_.nonEmpty).toLong

  "hash sampling" should {
    "keep nothing at 0, everything at 1, and be deterministic in between" in {
      val s = spark
      import s.implicits._
      val ids = (1L to 2000L).map(i => Tuple1(i)).toDF("doc_id")
      Mixing.sample(ids, "doc_id", 0.0).count() shouldBe 0L
      Mixing.sample(ids, "doc_id", 1.0).count() shouldBe 2000L
      val a = Mixing.sample(ids, "doc_id", 0.5)
        .collect().map(_.getLong(0)).toSet
      val b = Mixing.sample(ids, "doc_id", 0.5)
        .collect().map(_.getLong(0)).toSet
      a shouldBe b
      a.size.toDouble should (be > 800.0 and be < 1200.0)
      // matches the local md5 replay exactly — the oracle's contract
      val expected = (1L to 2000L)
        .filter(i => localHash("graft", i) < Mixing.hexThreshold(0.5)).toSet
      a shouldBe expected
      // disjoint corpora agree row-by-row: growing the corpus never flips
      // the verdict on an existing id
      val sub = Mixing.sample(ids.where(col("doc_id") <= 700L), "doc_id", 0.5)
        .collect().map(_.getLong(0)).toSet
      sub shouldBe a.filter(_ <= 700L)
    }

    "drop null ids under SQL concatenation semantics" in {
      val s = spark
      import s.implicits._
      val df = Seq(Some(1L), Some(2L), None, Some(4L))
        .map(o => (o, "en", "a b")).toDF("doc_id", "lang", "text")
      // null id -> null rank -> never kept, matching the oracle's
      // 'seed:' || NULL = NULL behavior
      Mixing.sample(df, "doc_id", 1.0).count() shouldBe 3L
      Mixing.tokenBudgetSample(df, "doc_id", "text", "lang",
        Map("en" -> 100L)).count() shouldBe 3L
    }

    "apply per-group fractions with a map-side-only plan" in {
      val s = spark
      import s.implicits._
      val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
        .toDF("doc_id", "lang")
      val out = Mixing.stratifiedSample(df, "doc_id", "lang",
        Map("en" -> 1.0, "zh" -> 0.0), defaultFraction = 0.5)
      val kept = out.collect().map(r => r.getLong(0) -> r.getString(1))
      kept.count(_._2 == "en") shouldBe 100
      kept.count(_._2 == "zh") shouldBe 0
      val de = kept.filter(_._2 == "de").map(_._1).toSet
      de shouldBe (2L to 299L by 3)
        .filter(i => localHash("graft", i) < Mixing.hexThreshold(0.5)).toSet
      // pure filter above the scan: no exchange anywhere in the plan
      out.queryExecution.executedPlan.toString should not include "Exchange"
    }
  }

  "token-budget sampling" should {
    "keep exactly the hash-ordered prefix within each group's budget" in {
      val s = spark
      import s.implicits._
      val docs = (1L to 400L).map { i =>
        val g = if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"
        // 1..7 tokens, deterministic; a few nulls and empties
        val t =
          if (i % 37 == 0) null
          else if (i % 23 == 0) "   "
          else (1 to (i % 7 + 1).toInt).map(k => s"w$k").mkString(" ")
        (i, g, t)
      }.toDF("doc_id", "lang", "text")
      val budgets = Map("en" -> 120L, "de" -> 37L)

      val kept = Mixing.tokenBudgetSample(docs, "doc_id", "text", "lang", budgets)
      val keptIds = kept.collect().map(_.getLong(0)).toSet

      // local replay: per group, order by (hash, id), inclusive cumsum <= budget
      val rows = docs.collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
      val expected = rows.groupBy(_._2).collect {
        case (g, grp) if budgets.contains(g) =>
          var cum = 0L
          grp.sortBy(t => (localHash("graft", t._1), t._1)).flatMap { t =>
            cum += localTokens(t._3)
            if (cum <= budgets(g)) Some(t._1) else None
          }.toSet
      }.flatten.toSet
      keptIds shouldBe expected
      keptIds.nonEmpty shouldBe true
      // budget respected exactly, groups outside the recipe dropped
      val tokensByGroup = rows.filter(t => keptIds.contains(t._1))
        .groupBy(_._2).map { case (g, grp) => g -> grp.map(t => localTokens(t._3)).sum }
      tokensByGroup.getOrElse("en", 0L) should be <= 120L
      tokensByGroup.getOrElse("de", 0L) should be <= 37L
      tokensByGroup.contains("fr") shouldBe false
      // the prefix is maximal: the next doc in hash order would overflow
      val keptRows = kept.queryExecution.executedPlan.toString
      keptRows should not include "WindowExec"
    }

    "survive many partitions with cross-partition group runs" in {
      val s = spark
      import s.implicits._
      // one dominant group spread over every partition: the offsets path,
      // not a per-group single task, must produce the running sums
      val docs = (1L to 2000L)
        .map(i => (i, "en", "a b c"))
        .toDF("doc_id", "lang", "text").repartition(8)
      val out = Mixing.tokenBudgetSample(
        docs, "doc_id", "text", "lang", Map("en" -> 300L))
      out.count() shouldBe 100L // 3 tokens each, 300 / 3
      val ids = out.collect().map(_.getLong(0)).toSet
      val expected = (1L to 2000L)
        .sortBy(i => (localHash("graft", i), i)).take(100).toSet
      ids shouldBe expected
    }
  }

  "splitAssign and groupSample" should {
    "assign every row to exactly one stable split" in {
      val s = spark
      import s.implicits._
      val docs = (1L to 400L).map(i => (i, s"g${i % 4}"))
        .toDF("doc_id", "grp")
      val out = Mixing.splitAssign(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      out.count() shouldBe 400L
      val bySplit = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      bySplit.keySet shouldBe Set("train", "val", "test")
      bySplit.values.sum shouldBe 400L
      // membership is a pure function of the id: repartitioned input
      // produces the identical assignment
      val again = Mixing.splitAssign(docs.repartition(7), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      out.select("doc_id", "split").collect()
        .foreach(r => again(r.getLong(0)) shouldBe r.getString(1))
      // null ids get a NULL split (the sampleHash contract), not a
      // silent landing in the last range
      val withNull = Mixing.splitAssign(
        Seq((Option(1L), "a"), (Option.empty[Long], "b"))
          .toDF("doc_id", "grp"),
        "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      withNull.where(col("doc_id").isNull)
        .select("split").collect().head.isNullAt(0) shouldBe true
      // over-allocated fractions fail loudly instead of emptying a split
      an[IllegalArgumentException] should be thrownBy
        Mixing.splitAssign(docs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.5, "test" -> 0.1))
    }

    "carve a stable per-group holdout of the k smallest hashes" in {
      val s = spark
      import s.implicits._
      val docs = (1L to 100L).map(i => (i, s"g${i % 2}")).toDF("doc_id", "grp")
      val ev = Mixing.groupSample(docs, "doc_id", "grp", k = 3)
      ev.count() shouldBe 6L
      val expected = (1L to 100L).groupBy(i => i % 2).values.flatMap { ids =>
        ids.sortBy(i => (localHash("graft", i), i)).take(3)
      }.toSet
      ev.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe expected
      // growing the corpus only evicts ids ranked below new smaller hashes
      val grown = Mixing.groupSample(
        docs.unionByName(Seq((1000L, "g0")).toDF("doc_id", "grp")),
        "doc_id", "grp", k = 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      (grown -- expected).size should be <= 1
    }

    "carve via the bounded heap — no WindowExec, nulls dropped, null groups kept" in {
      val s = spark
      import s.implicits._
      val docs = ((1L to 50L).map(i => (Option(i), Option(s"g${i % 2}"))) ++
        Seq((Option.empty[Long], Option("g0"))) ++ // null id: dropped
        (100L to 110L).map(i => (Option(i), Option.empty[String]))) // null group: a group
        .toDF("doc_id", "grp")
      val ev = Mixing.groupSample(docs, "doc_id", "grp", k = 3)
      ev.count() shouldBe 9L
      val got = ev.collect()
        .map(r => (r.getAs[String]("grp"), r.getLong(0))).toSet
      got.count(_._2 == 0L) shouldBe 0 // no null ids survived
      got.count(_._1 == null) shouldBe 3 // the null group carved too
      // window-form parity on the non-null groups
      val expected = (1L to 50L).groupBy(i => s"g${i % 2}").toSeq.flatMap {
        case (g, ids) =>
          ids.sortBy(i => (localHash("graft", i), i)).take(3).map(g -> _)
      }.toSet
      got.filter(_._1 != null) shouldBe expected
      ev.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head should not include "Window"
    }
  }

  "temperatureBudgets" should {
    "split the total proportionally to n^alpha" in {
      val s = spark
      import s.implicits._
      // group a: 9 tokens, group b: 36 → sqrt weights 3 : 6 of z = 9
      val docs = Seq(
        (1L, "a", Seq.fill(9)("t").mkString(" ")),
        (2L, "b", Seq.fill(36)("t").mkString(" ")),
        (3L, null.asInstanceOf[String], "ignored tokens here")
      ).toDF("doc_id", "grp", "text")
      Mixing.temperatureBudgets(docs, "grp", "text",
        totalBudget = 90L, alpha = 0.5) shouldBe Map("a" -> 30L, "b" -> 60L)
      // alpha = 1 is proportional sampling
      Mixing.temperatureBudgets(docs, "grp", "text",
        totalBudget = 45L, alpha = 1.0) shouldBe Map("a" -> 9L, "b" -> 36L)
      // flattening: alpha = 0 gives every group an equal share
      Mixing.temperatureBudgets(docs, "grp", "text",
        totalBudget = 10L, alpha = 0.0) shouldBe Map("a" -> 5L, "b" -> 5L)
    }

    "give zero-token groups budget 0 even at alpha = 0" in {
      val s = spark
      import s.implicits._
      // group "empty" has 0 tokens: pow(0, 0) == 1 must NOT hand it an
      // equal share of the flattened mixture
      val docs = Seq(
        (1L, "a", "one two three four"),
        (2L, "b", "five six seven eight"),
        (3L, "empty", "")
      ).toDF("doc_id", "grp", "text")
      Mixing.temperatureBudgets(docs, "grp", "text",
        totalBudget = 10L, alpha = 0.0) shouldBe
        Map("a" -> 5L, "b" -> 5L, "empty" -> 0L)
      // all-empty corpus: no division by zero, all budgets 0
      val allEmpty = Seq((1L, "a", ""), (2L, "b", ""))
        .toDF("doc_id", "grp", "text")
      Mixing.temperatureBudgets(allEmpty, "grp", "text",
        totalBudget = 10L, alpha = 0.5) shouldBe Map("a" -> 0L, "b" -> 0L)
    }
  }

  "shardOf / shardStats / writeSharded" should {
    "assign deterministic shards and conserve totals" in {
      val s = spark
      import s.implicits._
      val df = (0L until 200L).map(i => (i, s"w$i x$i")).toDF("doc_id", "text")
      val a = df.select(Mixing.shardOf(col("doc_id"), 8)).as[Long].collect()
      val b = df.select(Mixing.shardOf(col("doc_id"), 8)).as[Long].collect()
      a.toSeq shouldBe b.toSeq // pure function of (seed, id)
      all(a) should (be >= 0L and be < 8L)
      a.distinct.length shouldBe 8 // 200 coins land in all 8 buckets
      val stats = Mixing.shardStats(df, "doc_id", "text", 8).collect()
      stats.map(_.getLong(1)).sum shouldBe 200L
      stats.map(_.getLong(2)).sum shouldBe 400L // 2 tokens per doc
      stats.map(_.getLong(3)).sum shouldBe (0L until 200L).sum
      // a different seed is a different assignment
      val c = df.select(Mixing.shardOf(col("doc_id"), 8, "other"))
        .as[Long].collect()
      c.toSeq should not be a.toSeq
    }

    "write one parquet file per shard and round-trip the rows" in {
      val s = spark
      import s.implicits._
      val df = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_shards").toString
      try {
        Mixing.writeSharded(df, "doc_id", dir, nShards = 4)
        val back = s.read.parquet(dir)
        back.count() shouldBe 100L
        back.select("doc_id").as[Long].collect().sorted shouldBe
          (0L until 100L).toArray
        // shard column materialized from the directory layout and
        // consistent with shardOf
        val pairs = back.select("doc_id", "shard").as[(Long, Int)]
          .collect().toMap
        val want = df.select(col("doc_id"),
          Mixing.shardOf(col("doc_id"), 4)).as[(Long, Long)].collect().toMap
        pairs.map { case (k, v) => k -> v.toLong } shouldBe want
        // no small-file spray: at most one part file per shard directory
        new java.io.File(dir).listFiles().filter(_.isDirectory).foreach { d =>
          d.listFiles().count(_.getName.startsWith("part-")) should be <= 1
        }
      } finally {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try st.iterator().asScala.toSeq.reverseIterator
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        finally st.close()
      }
    }
  }

  "domainReweight" should {
    "match an independent in-memory replay of the whole chain" in {
      val s = spark
      import s.implicits._
      // two domains with very different surprise under the corpus LM:
      // 'a' dominates the corpus, so the all-rare domain scores higher NLL
      val df = Seq(
        (1L, "common", "a a a a a a a a"),
        (2L, "common", "a a a a b"),
        (3L, "rare", "x y z b"),
        (4L, "rare", "x q r")).toDF("doc_id", "source", "text")
      val res = Mixing.domainReweight(df, "source", "text",
        iterations = 3, eta = 0.5, uniformMix = 0.1)

      // in-memory replica sharing no engine code
      def snap(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val docs = Seq(
        ("common", "a a a a a a a a"), ("common", "a a a a b"),
        ("rare", "x y z b"), ("rare", "x q r"))
      val toks = docs.flatMap { case (d, t) =>
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).map(d -> _) }
      val cnt = toks.groupBy(_._2).map { case (t, g) => t -> g.size }
      val tTot = toks.size.toDouble
      val nll = toks.groupBy(_._1).map { case (d, g) =>
        d -> snap(g.map { case (_, t) =>
          -math.log(cnt(t) / tTot) }.sum / g.size)
      }
      val doms = nll.keys.toSeq.sorted
      var a = doms.map(_ => snap(1.0 / doms.size)).toArray
      for (_ <- 1 to 3) {
        val base = doms.zip(a).map { case (d, w) => w * nll(d) }.sum
        val u = doms.zip(a).map { case (d, w) =>
          w * math.exp(0.5 * (nll(d) - base)) }
        val z = u.sum
        a = u.map(x => snap(0.9 * x / z + 0.1 / doms.size)).toArray
      }
      res.nll shouldBe nll
      doms.zip(a).foreach { case (d, w) =>
        res.weights(d) shouldBe w +- 1e-12
      }
      // the rare domain is more surprising than the mixture -> gains mass
      res.weights("rare") should be > res.weights("common")
      res.tokens shouldBe Map("common" -> 13L, "rare" -> 7L)
      res.history should have length 3
    }

    "reject empty input and bad parameters loudly" in {
      val s = spark
      import s.implicits._
      val empty = Seq.empty[(Long, String, String)]
        .toDF("doc_id", "source", "text")
      intercept[IllegalArgumentException] {
        Mixing.domainReweight(empty, "source", "text")
      }.getMessage should include("at least one domain")
      val one = Seq((1L, "d", "a")).toDF("doc_id", "source", "text")
      intercept[IllegalArgumentException] {
        Mixing.domainReweight(one, "source", "text", uniformMix = 1.0)
      }
      intercept[IllegalArgumentException] {
        Mixing.domainReweight(one, "source", "text", iterations = 0)
      }
    }
  }

  "curriculum shuffle" should {
    def docs = {
      val s = spark
      import s.implicits._
      (0L until 800L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    }

    /** Local replay of the key arithmetic — the oracle's view. */
    def localKey(epoch: Int, id: Long): Long = {
      val (_, a, b) = Mixing.curriculumConstants(epoch)(epoch - 1)
      val idm = id % Mixing.CurriculumP
      (a * (idm ^ (idm >> 15)) + b) % Mixing.CurriculumP
    }

    "reproduce every key, shard, and ord bit-for-bit from (id, epoch)" in {
      val shardWidth = (Mixing.CurriculumP + 7) / 8
      val out = Mixing.curriculumAssign(docs, "doc_id", epochs = 2, nShards = 8)
        .select("doc_id", "epoch", "sort_key", "shard", "ord")
        .collect()
      out should have length 1600
      out.foreach { r =>
        val (id, e) = (r.getLong(0), r.getLong(1))
        val k = localKey(e.toInt, id)
        r.getLong(2) shouldBe k
        r.getLong(3) shouldBe k / shardWidth
        r.getLong(4) shouldBe k * (1L << 31) + (id % Mixing.CurriculumP)
      }
    }

    "give every epoch a distinct permutation with unique ord positions" in {
      val out = Mixing.curriculumAssign(docs, "doc_id", epochs = 3, nShards = 8)
        .select("epoch", "doc_id", "ord").collect()
        .groupBy(_.getLong(0))
        .map { case (e, rs) => e -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
      out.values.foreach(m => m.values.toSet.size shouldBe m.size) // unique ord
      // the epoch-2 order of any two docs disagrees with epoch 1 somewhere
      val ids = (0L until 800L).toSeq
      def order(e: Long) = ids.sortBy(out(e))
      order(1L) should not equal order(2L)
      order(2L) should not equal order(3L)
    }

    "spread every stratum across every shard, every epoch (the audit)" in {
      val audit = Mixing.curriculumAudit(
        docs, "doc_id", "source", epochs = 2, nShards = 8).collect()
      audit should have length (2 * 8 * 5)
      val counts = audit.map(_.getLong(3))
      all(counts) should be >= 5L   // 20 expected; >3σ band — the mixer
      all(counts) should be <= 45L  // must leave no empty/hot cell
      // first_doc really is the ord-minimal member of its slice
      val byKey = Mixing.curriculumAssign(docs, "doc_id", 2, 8)
        .select("epoch", "shard", "source", "doc_id", "ord").collect()
        .groupBy(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      audit.foreach { r =>
        val slice = byKey((r.getLong(0), r.getLong(1), r.getString(2)))
        r.getLong(6) shouldBe slice.minBy(_.getLong(4)).getLong(3)
      }
    }

    "fan out epochs from ONE scan with no join and no window" in {
      val s = spark
      val dir = java.nio.file.Files
        .createTempDirectory("graft-curriculum-plan").toString
      try {
        docs.write.mode("overwrite").parquet(dir)
        val audit = Mixing.curriculumAudit(
          s.read.parquet(dir), "doc_id", "source", epochs = 4, nShards = 8)
        audit.count()
        val plan = audit.queryExecution.executedPlan.toString()
        plan.linesIterator.count(_.contains("FileScan")) shouldBe 1
        plan should not include "Join"
        plan should not include "Window"
        plan should include("partial_count") // map-side combine
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        ()
      }
    }

    "drop null ids and reject bad parameters" in {
      val s = spark
      import s.implicits._
      val withNull = Seq(Some(1L), None, Some(2L))
        .map(Tuple1(_)).toDF("doc_id")
      Mixing.curriculumAssign(withNull, "doc_id", 1, 4)
        .count() shouldBe 2L
      intercept[IllegalArgumentException] {
        Mixing.curriculumAssign(docs, "doc_id", 0, 4)
      }
      intercept[IllegalArgumentException] {
        Mixing.curriculumAssign(docs, "doc_id", 1, 0)
      }
    }
  }
}
