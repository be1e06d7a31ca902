package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.pipeline.{Clustering, Dedup, Similarity}

/** Scale probe for the dedup/ANN family: runs the q24/q32/q45 engine
  * operators on the sf corpus and on a MULT×-enlarged variant, reporting
  * runtime growth, output sizes, and bucket-cap activity. A superlinear
  * ratio or an un-capped pathological bucket is the failure signal the
  * probe exists to surface.
  *
  * Corpus construction (deterministic — every copy is derived by a fixed
  * per-copy rewrite, no RNG state):
  *
  *  - documents ×MULT: copy k suffixes every 2nd word with `_c<k>` —
  *    cross-copy shingle overlap collapses, so the TRUE near-dup pair
  *    count stays ~linear in MULT. A plain exact duplication would
  *    quadratically inflate the genuine pair count per duplicate group —
  *    that measures the data, not the engine.
  *  - embeddings ×MULT: copy k flips the sign of a per-(copy, dim)
  *    pseudo-random half of the dimensions. Signs square away within a
  *    copy (cos(s∘x, s∘y) = cos(x, y) — each copy is an isometric image
  *    with the identical pair structure) while cross-copy cosine ≈ 0, so
  *    the true pair count scales EXACTLY linearly in MULT.
  *  - skew probe: the first document exact-duplicated `SKEW_COPIES`
  *    times into one pathologically popular bucket, run with a small cap —
  *    asserts the cap observation fired (excluded_rows > 0) and the run
  *    completes instead of going quadratic.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.ScaleProbe"`; one JSON line on stdout (also written to
  * SPARK_GRAFT_SCALE_OUT, default scale_probe.json).
  */
object ScaleProbe {

  private val SkewCopies = 20000
  private val SkewCap = 200

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // accumulate every cap observation (names are unique per pass)
    val caps = new scala.collection.concurrent.TrieMap[String, (Long, Long)]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(Dedup.DedupCapObservation.Prefix) ||
            name.startsWith(Similarity.LshCapObservation.Prefix)) {
            caps.put(name, (row.getLong(row.fieldIndex("excluded_rows")),
              row.getLong(row.fieldIndex("banded_rows"))))
          }
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // the listener bus is async; give in-flight observation events time to
    // land before snapshotting (probe-side bookkeeping only)
    def capExcluded(): Long = { Thread.sleep(500); caps.values.map(_._1).sum }

    // -----------------------------------------------------------------
    // corpus construction
    // -----------------------------------------------------------------
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val docN = docs0.count()
    val embN = emb0.count()

    def docsCopy(c: Int): DataFrame =
      if (c == 0) docs0
      else docs0.select(
        (col("doc_id") + lit(c * docN)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          (w, i) => when(pmod(i, lit(2)) === 0, concat(w, lit(s"_c$c")))
            .otherwise(w)), " ").as("text"))

    def embCopy(c: Int): DataFrame =
      if (c == 0) emb0
      else emb0.select(
        (col("vec_id") + lit(c * embN)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(pmod(xxhash64(lit(c), i), lit(2)) === 0, x)
            .otherwise(-x)).as("embedding"))

    val docsXPath = s"$work/documents_x$mult.parquet"
    val embXPath = s"$work/embeddings_x$mult.parquet"
    (0 until mult).map(docsCopy).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(docsXPath)
    (0 until mult).map(embCopy).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(embXPath)
    val docsX = spark.read.parquet(docsXPath)
    val embX = spark.read.parquet(embXPath)

    // skew corpus: base + one doc duplicated SkewCopies times (fresh ids)
    val skewPath = s"$work/documents_skew.parquet"
    val first = docs0.orderBy("doc_id").limit(1)
      .select(col("text").as("graft_skew_text")).persist()
    docs0.unionByName(
      spark.range(SkewCopies).crossJoin(broadcast(first))
        .select((col("id") + lit((mult + 1) * docN)).as("doc_id"),
          col("graft_skew_text").as("text")))
      .write.mode("overwrite").parquet(skewPath)
    first.unpersist(blocking = false)
    val docsSkew = spark.read.parquet(skewPath)

    // -----------------------------------------------------------------
    // probes — untimed warmup first so first-touch JIT isn't charged
    // -----------------------------------------------------------------
    Dedup.nearDuplicatePairs(docs0.limit(200), "doc_id", "text", 0.5).count()
    Similarity.lshTopK(emb0.limit(200), "vec_id", "embedding",
      emb0.limit(2), "vec_id", "embedding", k = 3, planes = 6, numTables = 4).count()

    def timed(f: => Long): (Double, Long, Long) = {
      System.gc()
      val before = capExcluded()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n, capExcluded() - before)
    }

    def minhash(d: DataFrame): Long =
      Dedup.nearDuplicatePairs(d, "doc_id", "text",
        threshold = 0.5, numHashes = 64, bands = 16).count()
    def simhash(d: DataFrame): Long =
      Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 8).count()
    def embNearDup(e: DataFrame, n: Long): Long = {
      val (planes, tables) = Similarity.lshParamsFor(n, 0.42, targetRecall = 0.98)
      Dedup.embeddingNearDuplicates(e, "vec_id", "embedding",
        threshold = 0.42, planes = planes, numTables = tables).count()
    }
    def topK(e: DataFrame): Long = {
      val queries = e.filter(col("vec_id") < 8L)
      Similarity.lshTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, planes = 6, numTables = 12).count()
    }
    // IVF ANN (q27 engine path): FIXED 8-query set and FIXED nlist/nprobe
    // while the corpus grows — the per-query candidate set is a corpus
    // FRACTION (nprobe/nlist), the exact shape the bounded-heap top-k
    // selection must keep off a single task
    def ivfTopK(e: DataFrame): Long = {
      val queries = e.filter(col("vec_id") < 8L)
      Similarity.ivfTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4).count()
    }
    // one-exchange / map-side-by-design operators: these SHOULD scale at
    // ~1x per 10x corpus growth per core-second — the probe proves it
    // instead of asserting it
    def exactDedup(d: DataFrame): Long = {
      val (kept, _) = Dedup.exactCounts(d, Seq("text"))
      val survivors = Dedup.exact(d, Seq("text"), "doc_id").count()
      kept + survivors
    }
    // exact substring dedup (q63 engine path): positional gram groupBy +
    // occurrence join + per-doc interval walk — removed-token totals
    // returned so a wrong winner election can't hide in a timing row
    def substrDedup(d: DataFrame): Long =
      Dedup.exactSubstringDedup(d, "doc_id", "text", 13)
        .agg(sum(col("removed_tokens"))).collect().head.getLong(0)
    // cross-corpus fuzzy decontamination (q64 engine path): FIXED 3-probe
    // set (a benchmark does not grow with the training data), probe bands
    // + shingles broadcast, corpus never shuffles its own rows. The
    // decorrelated xMULT copies share zero shingles with the probes, so
    // the matched-pair count must stay CONSTANT as the corpus grows
    def fuzzyDecon(d: DataFrame): Long = {
      val probes = docs0.orderBy("doc_id").limit(3)
        .select(col("doc_id").as("pid"),
          concat(col("text"),
            lit(" zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8")).as("ptext"))
      Dedup.crossCorpusNearDups(d, "doc_id", "text",
        probes, "pid", "ptext", threshold = 0.5).count()
    }
    // cross-source overlap matrix (q66 engine path): synthetic 20-way
    // source column; shared-gram totals returned (the decorrelated copies
    // add only in-copy overlaps, so the total tracks corpus volume)
    def srcOverlap(d: DataFrame, cap: Int): Long =
      graft.pipeline.TextAnalysis.crossSourceOverlap(
        d.withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20)))),
        "source", "text", n = 13, maxGroupsPerGram = cap)
        .agg(sum(col("shared_grams"))).collect().head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // per-doc duplication profile (q67 engine path)
    def dupProfile(d: DataFrame): Long =
      Dedup.duplicationProfile(d, "doc_id", "text", 13)
        .agg(sum(col("dup_grams"))).collect().head.getLong(0)
    // incremental dedup (q69 engine path): FIXED seen-state built from the
    // base corpus ONCE and persisted (rebuilding it inside the timing
    // would add a constant full-corpus job to both runs and compress the
    // batch-scaling ratio the probe measures), batch grows — the anti-join
    // must scale with the batch. At x1 the batch IS the state's corpus, so
    // survivors pin to ZERO; at xMULT only the decorrelated copies survive
    lazy val increSeen = {
      val x = Dedup.seenTextKeys(docs0, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count()
      x
    }
    def increDedup(d: DataFrame): Long =
      Dedup.exactDedupIncremental(d, "text", "doc_id", increSeen).count()
    // incremental FUZZY dedup (q76 engine path): FIXED LSH state built
    // from the base corpus ONCE and persisted through parquet (the
    // production shape — write/read, not a live lineage back to the
    // text), batch grows — the probe join and estimate verify must scale
    // with the batch and its collided buckets, never the history
    lazy val fuzzyState = {
      val dir = s"$work/lsh_state"
      Dedup.writeLshState(Dedup.lshState(docs0, "doc_id", "text"), dir)
      val st = Dedup.readLshState(spark, dir)
      st.copy(
        buckets = st.buckets
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        signatures = st.signatures
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    def increNearDedup(d: DataFrame): Long =
      Dedup.nearDedupIncremental(d, "doc_id", "text", fuzzyState,
        threshold = 0.5).count()
    def langId(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.languageIdCounts(d, "text")
        .agg(sum(col("cnt"))).collect().head.getLong(0)
    def quality(d: DataFrame): Long =
      d.select(graft.pipeline.TextAnalysis.qualityScore(col("text")).as("q"))
        .agg(count(when(col("q") >= 0.5, 1))).collect().head.getLong(0)
    def chunking(d: DataFrame): Long =
      graft.pipeline.Chunking.chunk(d, "text", chunkTokens = 64, overlap = 16)
        .count()
    // paragraph dedup (q54 engine path): one md5-group exchange with
    // map-side partial min_by + slim per-doc joins — removed counts
    // returned so a wrong winner election can't hide in a timing row
    def paraDedup(d: DataFrame): Long =
      Dedup.dedupParagraphs(
        d.withColumn("text",
          regexp_replace(col("text"), graft.SparkEntry.ParaInjectPattern,
            graft.SparkEntry.ParaInjectReplacement)),
        "doc_id", "text")
        .agg(coalesce(sum(col("n_removed")), lit(0L)))
        .collect().head.getLong(0)
    // sequence packing (q55 engine path): the range-partition prefix-sum
    // pass + one seq_id-keyed assembly shuffle — the returned value is the
    // conserved token total, so a lost or duplicated piece can't hide in
    // a timing row
    def packing(d: DataFrame): Long =
      graft.pipeline.Packing.packSequences(
        d, "doc_id", "text", seqLen = 128, keepPartial = true)
        .agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .collect().head.getLong(0)
    def repetition(d: DataFrame): Long =
      graft.pipeline.Repetition.stats(d, "doc_id", "text")
        .agg(count(when(graft.pipeline.Repetition.gopherKeep(), 1)))
        .collect().head.getLong(0)
    // token-budget mixing: the BUDGET stays fixed while the corpus grows
    // (a mixture recipe is corpus-independent), so the probe measures the
    // range-partition prefix-sum machinery — the kept prefix is constant
    // size and the cost should be the one slim exchange + two cached
    // passes, ~1x per 10x per core-second. The synthetic group column
    // splits docs 4 ways so group runs straddle partitions at both scales.
    def tokenBudget(d: DataFrame): Long =
      graft.pipeline.Mixing.tokenBudgetSample(
        d.withColumn("graft_grp", pmod(col("doc_id"), lit(4)).cast("string")),
        "doc_id", "text", "graft_grp",
        Map("0" -> 50000L, "1" -> 50000L, "2" -> 50000L, "3" -> 50000L))
        .count()
    // decontamination: the probe set stays FIXED (a benchmark suite does
    // not grow with the corpus) while the corpus scales ×MULT — the
    // broadcast-join scan shape should give ~1x per 10x per core-second
    val decontamProbes = docs0
      .filter(col("doc_id").isin(20L, 30L, 45L))
      .select(col("text").as("probe"))
    def decontam(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.contaminationMatches(
        d, "doc_id", "text", decontamProbes, "probe", n = 13)
        .agg(coalesce(sum(col("matched_ngrams")), lit(0L)))
        .collect().head.getLong(0)
    // decontamination under a MEGA-HOT n-gram (q49 shape, worst case): the
    // same 13-token phrase is appended to EVERY document and is also the
    // probe, so every corpus document survives the broadcast join — the
    // worst contamination rate possible. The join key is a single hash
    // value, but it never shuffles (broadcast side), and the post-join
    // groupBy key is doc_id (uniform) — so the run must stay ~linear in
    // the corpus; the returned sum(matched_ngrams) == corpus size pins
    // that every document matched exactly its one probe gram.
    val hotPhrase = ('a' to 'm').map(c => s"hotgram_$c").mkString(" ")
    def hotDecontam(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.contaminationMatches(
        d.select(col("doc_id"),
          concat(col("text"), lit(" " + hotPhrase)).as("text")),
        "doc_id", "text",
        spark.range(1).select(lit(hotPhrase).as("probe")), "probe", n = 13)
        .agg(coalesce(sum(col("matched_ngrams")), lit(0L)))
        .collect().head.getLong(0)
    // TF-IDF under whale-document skew (q56 shape): one synthetic document
    // owns as many tokens as the ENTIRE rest of the corpus (50% of all
    // tokens). Its explode runs in one task and its (doc, term) partials
    // must collapse map-side (64-term vocabulary, huge tf) before the
    // exchange; the ranking window sees a 64-row partition, not a
    // 50%-of-corpus one. A hot doc_id that still finishes ~linearly is
    // exactly the skew-safety claim q56's plan makes.
    def tfidfWhale(d: DataFrame, whaleTokens: Long): Long = {
      val block = (0 until 64).map(i => s"wtok$i").mkString(" ") + " "
      // the repeat count rides on col("id") so it is NOT constant-foldable:
      // a foldable repeat(lit, lit) would embed the whole multi-megabyte
      // whale as a literal inside the logical plan, and plan
      // canonicalization/codegen over that literal — not the engine —
      // dominates the timing (measured: 14 s vs 0.9 s at 1M tokens)
      val whale = spark.range(1).select(lit(-1L).as("doc_id"),
        org.apache.spark.sql.functions.repeat(
          lit(block),
          (col("id") + math.max(1L, whaleTokens / 64)).cast("int")).as("text"))
      graft.pipeline.TextAnalysis.tfidfTopTerms(
        d.select(col("doc_id"), col("text")).unionByName(whale),
        "doc_id", "text", k = 10).count()
    }
    val baseTokens = docs0
      .agg(coalesce(sum(size(split(col("text"), " "))), lit(0L)))
      .collect().head.getLong(0)
    // C4 heuristic filters (q57 engine path): pure codegen line HOFs over
    // the injected line/punctuation structure, ZERO shuffles — the
    // returned kept-doc count pins the verdicts at both scales
    def c4filters(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.c4Clean(
        d.select(col("doc_id"), array_join(transform(
          split(regexp_replace(col("text"), graft.SparkEntry.ParaInjectPattern,
            graft.SparkEntry.ParaInjectReplacement), "\n"),
          l => when(length(l) % 3 === 0, concat(l, lit("."))).otherwise(l)),
          "\n").as("text")),
        "doc_id", "text", minWordsPerLine = 4, minLinesPerDoc = 3,
        lineBlocklist = Seq("vector"), docBlocklist = Seq("customer query"))
        .agg(count(when(col("kept"), 1))).collect().head.getLong(0)
    // unigram-LM scoring (q58 engine path): tokenize-once persisted tf
    // frame, one term-window exchange + one per-doc rollup; the returned
    // token total is conserved, so a lost (doc, term) row can't hide in a
    // timing row
    def unigramLm(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.unigramCrossEntropy(d, "doc_id", "text")
        .agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .collect().head.getLong(0)
    // boilerplate line removal (q89 engine path): a 4-way synthetic group
    // column and a per-group footer injected into 2/3 of docs; removed
    // totals scale exactly 10x (the footer count tracks the docs). The
    // conviction join ships line hashes; reassembly is per-doc bounded
    def boilerLines(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.removeBoilerplateLines(
        d.select(col("doc_id"),
          concat(lit("g"), pmod(col("doc_id"), lit(4))).as("grp"),
          when(pmod(col("doc_id"), lit(3)) =!= 2,
            concat(col("text"), lit("\nFOOTER g"),
              pmod(col("doc_id"), lit(4)))).otherwise(col("text")).as("text")),
        "doc_id", "text", "grp", maxDocFrac = 0.4, minDocs = 5)
        .agg(coalesce(sum(col("removed_lines")), lit(0L)))
        .collect().head.getLong(0)
    // corpus drift (q90 engine path): old = even ids, new = odd ids with
    // an injected drift token; the only join is vocabulary-sized. The
    // returned pin is the joint vocab size (scales with the decorrelated
    // copies' suffixed words — growth is the designed data property)
    def drift(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.corpusDrift(
        d.where(pmod(col("doc_id"), lit(2)) === 0),
        d.where(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"),
            concat_ws(" ", col("text"), lit("drifttoken")).as("text")),
        "doc_id", "text")
        .select(col("v_joint")).collect().head.getLong(0)
    // URL dedup (q85 engine path): five messy disguises per page derived
    // from doc_id, canonicalized and deduped — ONE map-side-combinable
    // groupBy on the canonical key; survivor count scales exactly with
    // the page count (ids extend with the corpus, so pages do too)
    def urlDedup(d: DataFrame): Long = {
      val g = floor(col("doc_id") / 5).cast("long")
      val host = concat(lit("s"), pmod(g, lit(20)).cast("string"),
        lit(".example.com"))
      val path = concat(lit("/p/"), g.cast("string"))
      val m = pmod(col("doc_id"), lit(5))
      val url = when(m === 0, concat(lit("https://www."), host, path))
        .when(m === 1, concat(lit("HTTPS://"), host, lit(":443"), path, lit("/")))
        .when(m === 2, concat(lit("https://u@"), host, path, lit("?utm_source=x")))
        .when(m === 3, concat(lit("https://"), host, path, lit("?b=2&a=1#f")))
        .otherwise(concat(lit("https://"), host, path, lit("?a=1&utm_c=y&b=2")))
      graft.pipeline.Domains.dedupByCanonicalUrl(
        d.select(col("doc_id"), url.as("url")), "url", "doc_id").count()
    }
    // NB classifier scoring (q86 engine path): the model is trained ONCE
    // on a FIXED seed (seed sets are hand-curated — they don't grow with
    // the corpus) outside the timed closure; the timed pass is the
    // corpus-sized scoring scan — tokenize + broadcast model join +
    // map-side-combinable groupBy. Returned predicted-keep count scales
    // exactly 10x (markers decide every doc; docN is even, so copy
    // offsets preserve parity)
    def nbMark(d: DataFrame): DataFrame = d.select(
      col("doc_id"),
      concat_ws(" ", col("text"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit("qkeepa qkeepb qkeepa qkeepb"))
          .otherwise(lit("qtossa qtossb qtossa qtossb"))).as("text"))
    lazy val nbModel = graft.pipeline.Classify.trainNaiveBayes(
      nbMark(docs0.orderBy("doc_id").limit(1000))
        .withColumn("label",
          when(pmod(col("doc_id"), lit(2)) === 0, lit("keep"))
            .otherwise(lit("toss"))),
      "doc_id", "text", "label")
    def nbScore(d: DataFrame): Long =
      graft.pipeline.Classify
        .scoreNaiveBayes(nbMark(d), "doc_id", "text", nbModel)
        .agg(count(when(col("predicted") === "keep", 1)))
        .collect().head.getLong(0)
    // logistic regression (q106 engine path): FIXED dim and iteration
    // count while the corpus grows — each GD iteration is one scan of
    // the persisted feature frame plus a (dim+1)-row map-side-combinable
    // gradient reduce, so cost must track the scan; the predicted-keep
    // count pins exactly 10x (marker parity is preserved across the
    // decorrelated copies)
    def logregProbe(d: DataFrame): Long = {
      val labeled = nbMark(d)
        .withColumn("y", when(pmod(col("doc_id"), lit(2)) === 0, 1.0)
          .otherwise(0.0))
      val m = graft.pipeline.LogReg.train(labeled, "doc_id", "text", "y",
        dim = 32, iterations = 3, lr = 0.5)
      graft.pipeline.LogReg.score(labeled, "doc_id", "text", m)
        .agg(count(when(col("predicted") === 1, 1)))
        .collect().head.getLong(0)
    }
    // bloom decontamination (q110 engine path): FIXED probe set (built
    // once from the base corpus, outside the timing) — the timed pass is
    // the corpus gram scan dying in the map-side bitset filter plus the
    // candidate-only verify join; matched-gram totals stay constant at
    // both scales (the decorrelated copies share no grams with the
    // probes), so cost must track the scan
    lazy val bloomProbeGrams = {
      val ntoks = graft.pipeline.TextAnalysis.normalizedTokens(col("text"))
      val probes = docs0.filter(col("doc_id").isin(20L, 30L, 45L))
        .filter(size(ntoks) >= 18)
        .select(concat_ws(" ",
          slice(ntoks, 6, 13)).as("probe"))
        .distinct()
      val pg = graft.pipeline.TextAnalysis
        .probeGramHashes(probes, "probe", n = 13)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pg.count()
      pg
    }
    def bloomDecontamProbe(d: DataFrame): Long =
      graft.pipeline.TextAnalysis
        .bloomGramFilter(d, "doc_id", "text", bloomProbeGrams,
          n = 13, estimatedItems = 1000L)
        .join(bloomProbeGrams, "graft_gram")
        .count()
    // WordPiece apply (q111 engine path): task-serialized vocabulary,
    // per-row greedy loop, pure map-side — piece totals scale with the
    // decorrelated copies' suffixed words by design, doc count pins 10×
    lazy val wpModel =
      graft.pipeline.WordPiece.WordPieceModel(graft.SparkEntry.WordPieceDemoVocab)
    def wordpieceProbe(d: DataFrame): Long =
      d.select(graft.pipeline.WordPiece.tokenCountCol(wpModel)(
          lower(col("text"))).as("p"))
        .agg(count(when(col("p") > 0, 1))).collect().head.getLong(0)
    // CMS heavy hitters (q109 engine path): FIXED 4×2048 matrix while the
    // corpus grows — build is one scan with 64 KB task states, the
    // candidate filter is map-side; above-threshold term counts stay
    // catalog-sized at any corpus scale
    def cmsProbe(d: DataFrame): Long = {
      import graft.sketch.CountMin
      val terms = d.select(explode(
        graft.pipeline.TextAnalysis.normalizedTokens(col("text"))).as("term"))
      val cms = CountMin.sketch(terms, col("term"))
      val thr = math.max(1L, cms.total / 500L)
      CountMin.heavyHitters(terms, col("term"), cms, thr).count()
    }
    // domain reweighting (q108 engine path): ONE corpus pass for the
    // per-domain NLLs (K-row result), iterations driver-side — cost must
    // track the tokenize scan; token totals pin exactly 10×
    def reweightProbe(d: DataFrame): Long = {
      val res = graft.pipeline.Mixing.domainReweight(
        d.withColumn("src", pmod(col("doc_id"), lit(4))),
        "src", "text", iterations = 5, eta = 0.5)
      res.tokens.values.sum
    }
    // unigram tokenizer apply (q94 engine path): broadcast-model Viterbi
    // per word inside a udf scan — pure map-side, nothing shuffles; the
    // scored-doc count pins exactly 10x (piece totals vary with the
    // decorrelated copies' suffixed words by design, so the count, not
    // the pieces, is the conserved invariant)
    lazy val uniModel = graft.pipeline.Unigram.UnigramModel(
      graft.SparkEntry.UnigramDemoPieces.toMap,
      graft.SparkEntry.UnigramDemoUnk)
    def unigramCount(d: DataFrame): Long = {
      val cnt = graft.pipeline.Unigram.tokenCountCol(uniModel)
      d.agg(count(when(cnt(lower(col("text"))) > 0, 1)))
        .collect().head.getLong(0)
    }
    // perplexity bucketing (q83 engine path) with ONE group — the shape a
    // per-group ntile window would serialize into a single sort task:
    // groupedNtile's range repartition spreads the group across the
    // cluster and ranks from broadcast prefix offsets. The returned token
    // total is conserved (scales exactly 10x), so a lost or double-ranked
    // doc can't hide in the timing row.
    def perpBuckets(d: DataFrame): Long =
      graft.pipeline.TextAnalysis.perplexityBuckets(
        d.withColumn("grp", lit("all")), "doc_id", "text", "grp",
        nBuckets = 10)
        .agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .collect().head.getLong(0)
    // domain curation (q79 engine path): ONE map-side-combinable groupBy
    // over a slim projection; 20 synthetic domains at both scales, so the
    // returned doc total scales exactly 10x while the domain cardinality
    // (and the result size) stays fixed
    def domainStats(d: DataFrame): Long =
      graft.pipeline.Domains.domainStats(
        d.withColumn("domain",
          concat(lit("d"), pmod(col("doc_id"), lit(20)), lit(".example.com"))),
        "domain", "text")
        .agg(coalesce(sum(col("n_docs")), lit(0L))).collect().head.getLong(0)
    // PQ ANN (q80 engine path): FIXED 8-query set while the corpus grows —
    // the ADC scan is the corpus-sized term (m lookups per code row);
    // training re-samples per run (fixed sampleSize, so its cost is flat)
    def pqTopK(e: DataFrame): Long = {
      val queries = e.filter(col("vec_id") < 8L)
      Similarity.pqTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, m = 8, ksub = 16,
        rerank = 40).count()
    }
    // IVF-PQ (q82 engine path): coarse pruning ON (nprobe/nlist = 1/4 of
    // the cells) — the probe measures the cost shape of the pruned scan,
    // not recall (q82 pins recall with index params sized per-corpus)
    def ivfPqTopK(e: DataFrame): Long = {
      val queries = e.filter(col("vec_id") < 8L)
      Similarity.ivfPqTopK(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4,
        m = 8, ksub = 16, rerank = 40).count()
    }
    // SemDeDup (q59 engine path): the centroid count scales WITH the
    // corpus (8 at x1, 8*MULT at x10) so per-cell membership stays ~fixed
    // — the paper's own scale lever (cluster count grows, cluster size
    // doesn't), making the within-cell quadratic term constant per cell
    // and the whole run ~linear; the returned dropped count pins the
    // verdicts
    def semdedup(e: DataFrame, nc: Int): Long = {
      val cs = e.orderBy("vec_id").limit(nc).select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
      Similarity.semDedup(e, "vec_id", "embedding", cs, tau = 0.4)
        .agg(count(when(!col("kept"), 1))).collect().head.getLong(0)
    }
    // distributed connected components: FIXED chain depth (so the round
    // count — the log-diameter term — is identical at both scales) with
    // the number of chain components scaled by MULT; the returned count is
    // the number of components found, so a wrong result can't hide in a
    // timing row. localSolveMaxEdges = 0 because the probe measures the
    // distributed star rounds, not the small-graph union-find shortcut.
    val CcDepth = 64
    def ccEdges(comps: Long): DataFrame =
      spark.range(comps * CcDepth)
        .where(pmod(col("id"), lit(CcDepth)) =!= (CcDepth - 1))
        .select(col("id").as("a"), (col("id") + 1).as("b"))
    def cc(e: DataFrame): Long =
      Dedup.connectedComponents(e, localSolveMaxEdges = 0)
        .agg(countDistinct(col("component"))).collect().head.getLong(0)
    val ccComps1 = 3125L // ~200k nodes ×1; ~2M nodes ×MULT

    // warm the text/dedup probes with their EXACT plan shapes on a tiny
    // slice: the HOF/regex expression trees janino-compile per distinct
    // generated source, a fixed ~2 s that would otherwise land entirely on
    // the x1 runs and fake a sub-linear x10 ratio
    exactDedup(docs0.limit(200))
    substrDedup(docs0.limit(200))
    fuzzyDecon(docs0.limit(200))
    srcOverlap(docs0.limit(200), 256)
    dupProfile(docs0.limit(200))
    increDedup(docs0.limit(200))
    increNearDedup(docs0.limit(200))
    langId(docs0.limit(200))
    quality(docs0.limit(200))
    decontam(docs0.limit(200))
    hotDecontam(docs0.limit(200))
    tfidfWhale(docs0.limit(200), 6400L)
    repetition(docs0.limit(200))
    tokenBudget(docs0.limit(200))
    chunking(docs0.limit(200))
    paraDedup(docs0.limit(200))
    packing(docs0.limit(200))
    c4filters(docs0.limit(200))
    domainStats(docs0.limit(200))
    perpBuckets(docs0.limit(200))
    unigramCount(docs0.limit(200))
    urlDedup(docs0.limit(200))
    nbScore(docs0.limit(200)) // also forces the one-time model build
    boilerLines(docs0.limit(200))
    drift(docs0.limit(200))
    pqTopK(emb0.limit(200))
    ivfPqTopK(emb0.limit(200))
    ivfTopK(emb0.limit(200))
    unigramLm(docs0.limit(200))
    semdedup(emb0.limit(200), 2)
    cc(ccEdges(4))

    // distributed k-means (q102 engine path): FIXED k and iteration count
    // while the corpus grows — each iteration is one scan plus a
    // numTasks × k slim-state shuffle, so cost must track the scan
    def kmeansProbe(e: DataFrame): Long = {
      val init = Clustering.initMinId(e, "vec_id", "embedding", 8)
      val model = Clustering.lloyd(e, "embedding", init, iterations = 3)
      model.history.last.cellSizes.values.sum
    }
    // embedding decontamination (q103 engine path): FIXED 64-probe set
    // (an eval set does not grow with the training corpus) broadcast as
    // literals — pure map-side, must scale ~linearly with the scan
    def embDecontamProbe(e: DataFrame): Long = {
      val probes = Similarity.collectProbes(
        e.where(pmod(col("vec_id"), lit(997)) === 0).limit(64),
        "vec_id", "embedding")
      Similarity.decontaminateByEmbedding(
        e, "vec_id", "embedding", probes, tau = 0.35)
        .agg(count(when(col("contaminated"), 1))).collect().head.getLong(0)
    }
    // fuzzy paragraph dedup (q104 engine path): injected-break corpus,
    // capped LSH + CC at paragraph granularity; the decorrelated copies
    // keep cross-copy shingle overlap near zero so removal stays ~linear
    def fuzzyParaProbe(d: DataFrame): Long = {
      val paraDocs = d.select(col("doc_id"),
        regexp_replace(col("text"), graft.SparkEntry.ParaInjectPattern,
          graft.SparkEntry.ParaInjectReplacement).as("text"))
      Dedup.nearDupParagraphs(paraDocs, "doc_id", "text", threshold = 0.5)
        .agg(coalesce(sum(col("n_removed")), lit(0L)))
        .collect().head.getLong(0)
    }

    val resultsHead = Seq(
      ("minhash", timed(minhash(docs0)), timed(minhash(docsX))),
      ("simhash", timed(simhash(docs0)), timed(simhash(docsX))),
      ("emb_neardup", timed(embNearDup(emb0, embN)),
        timed(embNearDup(embX, embN * mult))),
      ("lsh_topk", timed(topK(emb0)), timed(topK(embX))),
      ("exact_dedup", timed(exactDedup(docs0)), timed(exactDedup(docsX))),
      ("substring_dedup", timed(substrDedup(docs0)), timed(substrDedup(docsX))),
      ("fuzzy_decontam", timed(fuzzyDecon(docs0)), timed(fuzzyDecon(docsX))),
      ("source_overlap", timed(srcOverlap(docs0, 256)), timed(srcOverlap(docsX, 256))),
      ("dup_profile", timed(dupProfile(docs0)), timed(dupProfile(docsX))),
      ("incremental_dedup", timed(increDedup(docs0)), timed(increDedup(docsX))),
      ("incremental_neardup",
        timed(increNearDedup(docs0)), timed(increNearDedup(docsX))))
    // the seen/LSH state frames are done after the incremental rows —
    // release their MEMORY_AND_DISK blocks before the remaining probes run
    increSeen.unpersist(blocking = false)
    fuzzyState.buckets.unpersist(blocking = false)
    fuzzyState.signatures.unpersist(blocking = false)
    val resultsTail = Seq(
      ("lang_id", timed(langId(docs0)), timed(langId(docsX))),
      ("quality_score", timed(quality(docs0)), timed(quality(docsX))),
      ("decontamination", timed(decontam(docs0)), timed(decontam(docsX))),
      ("decontam_hot_gram", timed(hotDecontam(docs0)), timed(hotDecontam(docsX))),
      ("tfidf_whale", timed(tfidfWhale(docs0, baseTokens)),
        timed(tfidfWhale(docsX, baseTokens * mult))),
      ("repetition", timed(repetition(docs0)), timed(repetition(docsX))),
      ("token_budget_mix", timed(tokenBudget(docs0)), timed(tokenBudget(docsX))),
      ("chunking", timed(chunking(docs0)), timed(chunking(docsX))),
      ("paragraph_dedup", timed(paraDedup(docs0)), timed(paraDedup(docsX))),
      ("seq_packing", timed(packing(docs0)), timed(packing(docsX))),
      ("c4_filters", timed(c4filters(docs0)), timed(c4filters(docsX))),
      ("domain_stats", timed(domainStats(docs0)), timed(domainStats(docsX))),
      ("pq_topk", timed(pqTopK(emb0)), timed(pqTopK(embX))),
      ("ivfpq_topk", timed(ivfPqTopK(emb0)), timed(ivfPqTopK(embX))),
      ("ivf_topk", timed(ivfTopK(emb0)), timed(ivfTopK(embX))),
      ("unigram_lm", timed(unigramLm(docs0)), timed(unigramLm(docsX))),
      ("perplexity_buckets",
        timed(perpBuckets(docs0)), timed(perpBuckets(docsX))),
      ("url_dedup", timed(urlDedup(docs0)), timed(urlDedup(docsX))),
      ("nb_score", timed(nbScore(docs0)), timed(nbScore(docsX))),
      ("logreg_train",
        timed(logregProbe(docs0)), timed(logregProbe(docsX))),
      ("bloom_decontam",
        timed(bloomDecontamProbe(docs0)), timed(bloomDecontamProbe(docsX))),
      ("wordpiece_apply",
        timed(wordpieceProbe(docs0)), timed(wordpieceProbe(docsX))),
      ("cms_heavy_hitters", timed(cmsProbe(docs0)), timed(cmsProbe(docsX))),
      ("domain_reweight",
        timed(reweightProbe(docs0)), timed(reweightProbe(docsX))),
      ("boilerplate_lines",
        timed(boilerLines(docs0)), timed(boilerLines(docsX))),
      ("unigram_tokens",
        timed(unigramCount(docs0)), timed(unigramCount(docsX))),
      ("corpus_drift", timed(drift(docs0)), timed(drift(docsX))),
      ("semdedup", timed(semdedup(emb0, 8)), timed(semdedup(embX, 8 * mult))),
      ("kmeans", timed(kmeansProbe(emb0)), timed(kmeansProbe(embX))),
      ("emb_decontam",
        timed(embDecontamProbe(emb0)), timed(embDecontamProbe(embX))),
      ("fuzzy_para_dedup",
        timed(fuzzyParaProbe(docs0)), timed(fuzzyParaProbe(docsX))),
      ("connected_components",
        timed(cc(ccEdges(ccComps1))), timed(cc(ccEdges(ccComps1 * mult)))))

    // -----------------------------------------------------------------
    // relational/layout operators (q117-q122 engine paths) on an events
    // corpus replicated with SHIFTED user/event ids — per-key densities
    // stay constant, so the one-shuffle-per-key operators must scale with
    // rows while their per-key window state stays fixed (the production
    // shape: more users, not deeper histories)
    // -----------------------------------------------------------------
    val ev0 = graft.SparkEntry.eventsTable(spark, sfDir)
      .select(col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        col("user_id"), col("event_type"))
    val evX = (0 until mult).map(k => ev0.select(
      (col("event_id") + lit(k * 1000000000L)).as("event_id"),
      col("ts_us"),
      (col("user_id") + lit(k * 10000000L)).as("user_id"),
      col("event_type"))).reduce(_ union _)

    def asofProbe(e: DataFrame): Long = {
      import graft.operators.AsOfJoin
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us"))
      val views = e.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts_us"))
      AsOfJoin.asofJoin(clicks, views, Seq("user_id"), "ts_us",
        payloadCols = Seq("view_id"), tiebreakCol = Some("view_id"))
        .where(col("asof_view_id").isNotNull).count()
    }
    def rangeProbe(e: DataFrame): Long = {
      import graft.operators.RangeJoin
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us").as("p"))
      val inc = e.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts_us").as("lo"),
          (col("ts_us") + lit(21600L * 1000000L)).as("hi"))
      RangeJoin.rangeJoin(clicks, inc, "p", "lo", "hi",
        binWidth = 21600L * 1000000L, extraKeyCols = Seq("user_id"),
        payloadCols = Seq("err_id")).count()
    }
    def scdProbe(e: DataFrame): Long = {
      import graft.operators.Scd
      Scd.scdType2(e, Seq("user_id"), "ts_us", Seq("event_type"),
        tiebreakCols = Seq("event_id")).count()
    }
    def encodingProbe(d: DataFrame): Long = {
      import graft.pipeline.TextAnalysis
      val r = TextAnalysis.encodingHealth(d, "doc_id", "text")
        .collect().head
      r.getLong(r.fieldIndex("clean_docs")) +
        r.getLong(r.fieldIndex("mojibake_hits"))
    }
    def skewProbe(e: DataFrame): Long = {
      import graft.operators.SkewCensus
      val r = SkewCensus.skewCensus(e, "user_id").collect().head
      r.getDouble(r.fieldIndex("n_keys")).toLong +
        r.getDouble(r.fieldIndex("max_cnt")).toLong
    }
    def zorderProbe(e: DataFrame): Long = {
      import graft.operators.ZOrder
      val dims = e.select(col("user_id").as("x"),
        expr("ts_us div 1000000").as("y"))
      val r = ZOrder.pruningAudit(dims, "x", "y", bits = 16,
        nBuckets = 64).collect().head
      r.getDouble(r.fieldIndex("z_buckets")).toLong +
        math.round(r.getDouble(r.fieldIndex("z_mean_h_r")))
    }

    def sessionProbe(e: DataFrame): Long = {
      import graft.operators.Sessionize
      Sessionize.sessionStats(
        Sessionize.sessionize(e, Seq("user_id"), "ts_us",
          gapThreshold = 1800L * 1000000L,
          tiebreakCols = Seq("event_id")),
        Seq("user_id"), "ts_us").count()
    }
    def funnelProbe(e: DataFrame): Long = {
      import graft.operators.EventAnalytics
      val f = EventAnalytics.funnel(e, Seq("user_id"), "ts_us",
        Seq(col("event_type") === "signup",
          col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
      f.agg(sum(when(col("t3").isNotNull, 1L).otherwise(0L)))
        .collect().head.getLong(0)
    }
    def cohortProbe(e: DataFrame): Long = {
      import graft.operators.EventAnalytics
      EventAnalytics.cohortRetention(e, Seq("user_id"), "ts_us",
          _ => expr("(ts_us div 86400000000) div 7"))
        .agg(sum(col("active_keys"))).collect().head.getLong(0)
    }

    // incremental SCD2: the prior dimension (first half of the stream)
    // is parquet-staged UNTIMED; the timed phase applies a FIXED-size
    // batch (the base corpus's second half) to a 10x-deeper history.
    // applyChanges never re-windows the closed history, so the timed
    // cost is the mini rebuild + one pass-through scan of the staged
    // dimension — expect well under the 10x a full rebuild would pay.
    val scdCutUs = 1705276800000000L
    def scdApplySetup(e: DataFrame, path: String): Unit = {
      import graft.operators.Scd
      Scd.scdType2(e.where(col("ts_us") <= scdCutUs), Seq("user_id"),
          "ts_us", Seq("event_type"), tiebreakCols = Seq("event_id"))
        .write.mode("overwrite").parquet(path)
    }
    val scdBatch = ev0.where(col("ts_us") > scdCutUs)
    def scdApplyProbe(path: String): Long = {
      import graft.operators.Scd
      Scd.applyChanges(spark.read.parquet(path), scdBatch,
        Seq("user_id"), "ts_us", Seq("event_type"),
        tiebreakCols = Seq("event_id")).count()
    }
    scdApplySetup(ev0, s"$work/scd_state_x1")
    scdApplySetup(evX, s"$work/scd_state_x$mult")

    // incremental funnel (q146): per-(user, step) bounded-cell states
    // staged UNTIMED at both history sizes; the timed phase folds a
    // FIXED batch (the base corpus's post-cut events) and replays the
    // chain — fold cost tracks the state rows (users x steps), the
    // replay output users, never the staged event volume
    val funnelSteps = Seq(col("event_type") === "signup",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    def funnelStateSetup(e: DataFrame, path: String): Unit =
      graft.operators.EventAnalytics.funnelState(
        e.where(col("ts_us") <= scdCutUs), Seq("user_id"), "ts_us",
        funnelSteps, cap = 64)
        .write.mode("overwrite").parquet(path)
    funnelStateSetup(ev0, s"$work/funnel_state_x1")
    funnelStateSetup(evX, s"$work/funnel_state_x$mult")
    val funnelBatch = ev0.where(col("ts_us") > scdCutUs)
    def funnelStateProbe(path: String): Long = {
      import graft.operators.EventAnalytics
      EventAnalytics.funnelFromState(
        EventAnalytics.mergeFunnelStates(
          spark.read.parquet(path),
          EventAnalytics.funnelState(funnelBatch, Seq("user_id"), "ts_us",
            funnelSteps, cap = 64), cap = 64), 4)
        .agg(coalesce(sum(col("steps_completed")), lit(0L)))
        .collect().head.getLong(0)
    }

    // incremental paragraph fuzzy dedup: paragraph LSH states staged
    // UNTIMED at both history sizes; the timed phase dedups a FIXED
    // 200-doc re-crawl batch against them — probe cost must track the
    // batch and its collided buckets, not the history
    def paraStateSetup(d: DataFrame, path: String): Unit =
      Dedup.writeLshState(
        Dedup.paragraphLshState(d, "doc_id", "text",
          maxBucketSize = SkewCap), path)
    val paraBatch = docs0.orderBy("doc_id").limit(200)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
    def paraIncProbe(path: String): Long = {
      val st = Dedup.readLshState(spark, path)
      Dedup.nearDupParagraphsIncremental(paraBatch, "doc_id", "text",
          st, threshold = 0.5)
        .agg(sum(col("n_removed"))).collect().head.getLong(0)
    }
    paraStateSetup(docs0, s"$work/para_state_x1")
    paraStateSetup(docsX, s"$work/para_state_x$mult")

    // byte-level BPE apply: embarrassingly parallel map — the per-row
    // cost must stay flat at 10x
    def byteBpeProbe(d: DataFrame): Long = {
      import graft.pipeline.ByteBpe
      val model = ByteBpe.ByteBpeModel(graft.SparkEntry.ByteBpeDemoMerges)
      ByteBpe.tokenCounts(d, "doc_id", "text", model)
        .agg(sum(col("byte_bpe_tokens"))).collect().head.getLong(0)
    }

    // persisted-sketch convention (theta q142 / HLL q140): the STATE is
    // staged from a 10x corpus while the probed BATCH stays fixed — the
    // probe cost must track the fixed batch plus KB-of-sketch-per-group,
    // never the staged corpus. Self-verification rides the returned
    // estimate sum: the word-suffix-decorrelated copies multiply
    // distinct texts ~exactly 10x, so the x10 estimate must read ~10x
    // the x1 one (a broken parquet round-trip or union would not).
    import graft.sketch.{HllState, Theta}
    def grouped(d: DataFrame): DataFrame =
      d.select(pmod(col("doc_id"), lit(4)).as("grp"), col("text"))
    def thetaStateSetup(d: DataFrame, path: String): Unit =
      Theta.writeState(
        Theta.thetaState(grouped(d), Seq("grp"), Seq("text")), path)
    thetaStateSetup(docs0, s"$work/theta_state_x1")
    thetaStateSetup(docsX, s"$work/theta_state_x$mult")
    val sketchBatch = grouped(docs0.orderBy("doc_id").limit(500))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sketchBatch.count()
    def thetaProbe(path: String): Long =
      Theta.overlap(Theta.readState(spark, path),
          Theta.thetaState(sketchBatch, Seq("grp"), Seq("text")))
        .agg(coalesce(sum(col("est_a")), lit(0L)))
        .collect().head.getLong(0)
    def hllStateSetup(d: DataFrame, path: String): Unit =
      HllState.writeState(
        HllState.distinctState(grouped(d), Seq("grp"), Seq("text")), path)
    hllStateSetup(docs0, s"$work/hll_state_x1")
    hllStateSetup(docsX, s"$work/hll_state_x$mult")
    def hllProbe(path: String): Long =
      HllState.estimates(HllState.mergeStates(
          HllState.readState(spark, path),
          HllState.distinctState(sketchBatch, Seq("grp"), Seq("text"))))
        .agg(coalesce(sum(col("distinct_est")), lit(0L)))
        .collect().head.getLong(0)
    // KLL quantile state (q144): fixed batch folded into a 10x-staged
    // state; the probed value is the folded global median of text
    // length, which must stay ~flat (both corpora share the same length
    // distribution — the decorrelated copies only suffix words)
    import graft.sketch.KllGroupState
    def kllStateSetup(d: DataFrame, path: String): Unit =
      KllGroupState.writeState(
        KllGroupState.quantileState(
          grouped(d).withColumn("len", length(col("text"))),
          Seq("grp"), "len"), path)
    kllStateSetup(docs0, s"$work/kll_state_x1")
    kllStateSetup(docsX, s"$work/kll_state_x$mult")
    def kllProbe(path: String): Long = {
      val merged = KllGroupState.mergeStates(
        KllGroupState.readState(spark, path),
        KllGroupState.quantileState(
          sketchBatch.withColumn("len", length(col("text"))),
          Seq("grp"), "len"))
      math.round(KllGroupState.quantiles(merged, Seq(0.5), Seq("med"))
        .agg(coalesce(sum(col("med")), lit(0.0)))
        .collect().head.getDouble(0))
    }

    // Misra-Gries frequent-items state (q145): fixed batch folded into
    // a 10x-staged state; the probed value is the folded total stream
    // weight n, which must scale ~10x (exact bookkeeping survives the
    // parquet round-trip and fold) while the fold cost tracks the state
    // rows, not the staged corpus
    import graft.sketch.FreqItems
    def tokenized(d: DataFrame): DataFrame =
      d.select(col("grp"),
        explode(graft.pipeline.TextAnalysis.tokens(lower(col("text"))))
          .as("item"))
    def freqStateSetup(d: DataFrame, path: String): Unit =
      FreqItems.writeState(
        FreqItems.freqState(tokenized(grouped(d)), Seq("grp"), "item", 64),
        path)
    freqStateSetup(docs0, s"$work/freq_state_x1")
    freqStateSetup(docsX, s"$work/freq_state_x$mult")
    def freqProbe(path: String): Long =
      FreqItems.mergeStates(
          FreqItems.readState(spark, path),
          FreqItems.freqState(tokenized(sketchBatch), Seq("grp"), "item", 64),
          64)
        .agg(coalesce(sum(col("mg.n")), lit(0L)))
        .collect().head.getLong(0)

    // weighted pre-aggregated build (q155): the same MG family fed
    // (item, weight) rows — a fixed weighted batch folds into the
    // 10x-staged state, so the fold cost must track state rows exactly
    // like its raw-stream twin above; the probed value is the folded
    // total weight n (exact bookkeeping through the round-trip)
    def weightedItems(d: DataFrame): DataFrame =
      tokenized(d).groupBy(col("grp"), col("item"))
        .agg(count(lit(1)).as("w"))
    def freqWeightedSetup(d: DataFrame, path: String): Unit =
      FreqItems.writeState(
        FreqItems.freqStateWeighted(
          weightedItems(grouped(d)), Seq("grp"), "item", "w", 64),
        path)
    freqWeightedSetup(docs0, s"$work/freqw_state_x1")
    freqWeightedSetup(docsX, s"$work/freqw_state_x$mult")
    def freqWeightedProbe(path: String): Long =
      FreqItems.mergeStates(
          FreqItems.readState(spark, path),
          FreqItems.freqStateWeighted(
            weightedItems(sketchBatch), Seq("grp"), "item", "w", 64),
          64)
        .agg(coalesce(sum(col("mg.n")), lit(0L)))
        .collect().head.getLong(0)

    // incremental IVF index state (q148): a FROZEN quantizer, postings
    // staged UNTIMED at both corpus sizes. ivf_state_append assigns and
    // counts a FIXED 500-vector batch — pure map-side under the frozen
    // centroids, must stay flat however large the staged index is.
    // ivf_state_serve answers a fixed 8-query top-k from the staged
    // postings — candidates grow with corpus/nlist, the bounded heap
    // keeps the output at queries x k.
    val ivfCentroids = Similarity.trainIvfCentroids(
      emb0, "embedding", nlist = 16)
    def ivfStateSetup(e: DataFrame, path: String): Unit =
      Similarity.ivfIndexState(e, "vec_id", "embedding", ivfCentroids)
        .write.mode("overwrite").parquet(path)
    ivfStateSetup(emb0, s"$work/ivf_state_x1")
    ivfStateSetup(embX, s"$work/ivf_state_x$mult")
    val ivfBatch = emb0.orderBy("vec_id").limit(500)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivfBatch.count()
    def ivfAppendProbe(): Long =
      Similarity.ivfIndexState(ivfBatch, "vec_id", "embedding", ivfCentroids)
        .count()
    val ivfQueries = emb0.where(col("vec_id") < 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivfQueries.count()
    def ivfServeProbe(path: String): Long =
      Similarity.ivfTopKFromState(spark.read.parquet(path), ivfCentroids,
        ivfQueries, "vec_id", "embedding", k = 10, nprobe = 4).count()

    // snapshot drift report (q152): the frequency-drift join over two
    // staged snapshots' per-group MG states — cost tracks STATE rows
    // (groups x kept items, capacity-bounded), never the corpora behind
    // them, so the wall must stay ~flat however large the staged corpus
    // was; the probed value is the summed new+lost churn (corpus-
    // dependent: the x10 copies suffix words, so kept sets differ)
    def driftProbe(aPath: String, bPath: String): Long = {
      import graft.sketch.StateDrift
      val fd = StateDrift.frequencyDrift(
        spark.read.parquet(aPath), spark.read.parquet(bPath), 64)
      fd.agg(coalesce(sum(col("new_items") + col("lost_items")), lit(0L)))
        .collect().head.getLong(0)
    }
    def driftStateSetup(d: DataFrame, tag: String, path: String): Unit =
      graft.sketch.FreqItems.writeState(
        graft.sketch.FreqItems.freqState(
          tokenized(grouped(d).where(
            if (tag == "a") pmod(col("grp"), lit(2)) === 0 else lit(true))),
          Seq("grp"), "item", 64), path)
    driftStateSetup(docs0, "a", s"$work/drift_a_x1")
    driftStateSetup(docs0, "b", s"$work/drift_b_x1")
    driftStateSetup(docsX, "a", s"$work/drift_a_x$mult")
    driftStateSetup(docsX, "b", s"$work/drift_b_x$mult")

    // consistent bottom-k sample (q141): fixed k over a 10x corpus — the
    // bounded-heap aggregate's cost is one map-side pass; the sampled
    // row count pins flat at groups x k at both scales
    def bottomkProbe(d: DataFrame): Long =
      graft.pipeline.Sampling.bottomKSample(
        d.select(pmod(col("doc_id"), lit(4)).as("grp"), col("doc_id")),
        Seq("grp"), "doc_id", k = 8).count()

    // one-group holdout (Mixing.groupSample, the q71 public surface,
    // post-r15 bounded-heap delegate): EVERY row lands in ONE group —
    // the exact shape the retired row_number window would have sorted in
    // a single task; must stay ~flat at 10x with the row count pinned k
    def groupHoldoutHot(d: DataFrame): Long =
      graft.pipeline.Mixing.groupSample(
        d.select(col("doc_id"), lit("g").as("grp"), col("text")),
        "doc_id", "grp", k = 8).count()

    def manifestBuildProbe(d: DataFrame): Long =
      graft.pipeline.DatasetManifest
        .build(d, "doc_id", Seq("text"), shards = 64).count()

    // r18: the curriculum audit — one scan, epoch fan-out as a narrow
    // explode, map-side partial agg; cost must track the scan and the
    // output stays epochs x shards x strata rows at any corpus size
    def curriculumProbe(d: DataFrame): Long =
      graft.pipeline.Mixing
        .curriculumAudit(
          d.withColumn("graft_src",
            pmod(col("doc_id"), lit(5)).cast("string")),
          "doc_id", "graft_src", epochs = 2, nShards = 8)
        .agg(coalesce(sum(col("n_docs")), lit(0L)))
        .collect().head.getLong(0)

    // a sparse tamper (one of 64 shards, every 5th row in it mutated):
    // the drill-down names the rows of THAT shard only
    def manifestDrillProbe(d: DataFrame): Long = {
      val t = d.withColumn("text",
        when(pmod(col("doc_id"), lit(64)) === 7 &&
          pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit("X"))).otherwise(col("text")))
      graft.pipeline.DatasetManifest
        .drillDown(d, t, "doc_id", Seq("text"), 64, Seq(7L)).count()
    }

    // r18 adversarial manifest shapes:
    // (a) a columnar manifest with 100 content lanes — the lane-explosion
    // failure mode; cost must track rows x lanes ONCE (one wide codegen
    // projection + one shard aggregate), output stays 64 slim rows
    val wideLaneCols = (0 until 100).map(i => s"c$i")
    def manifestColumnarWideProbe(d: DataFrame): Long = {
      val wide = d.select(col("doc_id") +: wideLaneCols.zipWithIndex.map {
        case (c, i) => xxhash64(col("text"), lit(i)).cast("string").as(c)
      }: _*)
      graft.pipeline.DatasetManifest
        .buildColumnar(wide, "doc_id", wideLaneCols, 64).count()
    }
    // (b) a drill-down where EVERY shard drifted — the restriction prunes
    // nothing, so the path must degrade to ONE full row-census diff
    // (linear in rows, like manifest_build), never anything quadratic
    def manifestDrillAllProbe(d: DataFrame): Long = {
      val t = d.withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit("X"))).otherwise(col("text")))
      graft.pipeline.DatasetManifest
        .drillDown(d, t, "doc_id", Seq("text"), 64, 0L until 64L).count()
    }

    val resultsRelational = Seq(
      ("asof_join", timed(asofProbe(ev0)), timed(asofProbe(evX))),
      ("range_join", timed(rangeProbe(ev0)), timed(rangeProbe(evX))),
      ("scd2_build", timed(scdProbe(ev0)), timed(scdProbe(evX))),
      ("encoding_health",
        timed(encodingProbe(docs0)), timed(encodingProbe(docsX))),
      ("skew_census", timed(skewProbe(ev0)), timed(skewProbe(evX))),
      ("zorder_audit", timed(zorderProbe(ev0)), timed(zorderProbe(evX))),
      ("sessionize", timed(sessionProbe(ev0)), timed(sessionProbe(evX))),
      ("funnel", timed(funnelProbe(ev0)), timed(funnelProbe(evX))),
      ("cohort", timed(cohortProbe(ev0)), timed(cohortProbe(evX))),
      ("scd2_apply",
        timed(scdApplyProbe(s"$work/scd_state_x1")),
        timed(scdApplyProbe(s"$work/scd_state_x$mult"))),
      ("para_incremental",
        timed(paraIncProbe(s"$work/para_state_x1")),
        timed(paraIncProbe(s"$work/para_state_x$mult"))),
      ("byte_bpe_tokens",
        timed(byteBpeProbe(docs0)), timed(byteBpeProbe(docsX))),
      ("theta_overlap",
        timed(thetaProbe(s"$work/theta_state_x1")),
        timed(thetaProbe(s"$work/theta_state_x$mult"))),
      ("hll_state",
        timed(hllProbe(s"$work/hll_state_x1")),
        timed(hllProbe(s"$work/hll_state_x$mult"))),
      ("kll_state",
        timed(kllProbe(s"$work/kll_state_x1")),
        timed(kllProbe(s"$work/kll_state_x$mult"))),
      ("freq_state",
        timed(freqProbe(s"$work/freq_state_x1")),
        timed(freqProbe(s"$work/freq_state_x$mult"))),
      ("freq_state_weighted",
        timed(freqWeightedProbe(s"$work/freqw_state_x1")),
        timed(freqWeightedProbe(s"$work/freqw_state_x$mult"))),
      ("funnel_state",
        timed(funnelStateProbe(s"$work/funnel_state_x1")),
        timed(funnelStateProbe(s"$work/funnel_state_x$mult"))),
      ("ivf_state_append",
        timed(ivfAppendProbe()), timed(ivfAppendProbe())),
      ("ivf_state_serve",
        timed(ivfServeProbe(s"$work/ivf_state_x1")),
        timed(ivfServeProbe(s"$work/ivf_state_x$mult"))),
      ("state_drift",
        timed(driftProbe(s"$work/drift_a_x1", s"$work/drift_b_x1")),
        timed(driftProbe(s"$work/drift_a_x$mult", s"$work/drift_b_x$mult"))),
      ("bottomk_sample",
        timed(bottomkProbe(docs0)), timed(bottomkProbe(docsX))),
      ("group_holdout_hot",
        timed(groupHoldoutHot(docs0)), timed(groupHoldoutHot(docsX))),
      // r17: the manifest family — build is ONE map-side-combinable pass
      // (cost tracks the scan, output stays 64 slim rows at any scale);
      // drill-down's join/shuffle work tracks only the DRIFTED shard's
      // rows (the scan is linear here because pmod isn't a parquet
      // partition key — with shard-partitioned layout it prunes too)
      ("manifest_build",
        timed(manifestBuildProbe(docs0)), timed(manifestBuildProbe(docsX))),
      ("manifest_drilldown",
        timed(manifestDrillProbe(docs0)), timed(manifestDrillProbe(docsX))),
      ("manifest_columnar_wide",
        timed(manifestColumnarWideProbe(docs0)),
        timed(manifestColumnarWideProbe(docsX))),
      ("manifest_drill_all_shards",
        timed(manifestDrillAllProbe(docs0)),
        timed(manifestDrillAllProbe(docsX))),
      ("curriculum_audit",
        timed(curriculumProbe(docs0)), timed(curriculumProbe(docsX))))

    val results = resultsHead ++ resultsTail ++ resultsRelational
    // the NB model's cached log-prob table is done after its rows
    nbModel.release()

    // skew: cap must engage and the run must complete
    val (skewSec, skewPairs, skewExcluded) = timed(
      Dedup.nearDuplicatePairsFromSignatures(
        Dedup.textSignatures(docsSkew, "doc_id", "text"),
        threshold = 0.5, numHashes = 64, bands = 16,
        maxBucketSize = SkewCap).count())

    // graph-skew: a 500k-degree hub node — per-node minima are aggregates
    // (map-side partial min), the fan-out join is AQE-splittable; the
    // failure mode probed is an executor-killing neighbor materialization
    val (hubSec, hubComps, _) = timed(cc(
      spark.range(1, 500001).select(lit(0L).as("a"), col("id").as("b"))))

    // paragraph-skew: every paragraph of the 20,000x-duplicated doc hits
    // ONE md5 group — the partial min_by must collapse the copies before
    // the shuffle (the failure mode probed is a hot-key reduce partition)
    val (pskewSec, pskewRemoved, _) = timed(paraDedup(docsSkew))

    // substring-skew: the 20,000x-duplicated doc makes every one of its
    // 13-grams a 20,001-way duplicate — the gram groupBy's partial agg
    // collapses each hot gram per map partition, and the occurrence join
    // hits the hot keys with AQE skew splitting (the failure mode probed
    // is a hot gram key melting one reduce task)
    val (sskewSec, sskewRemoved, _) = timed(substrDedup(docsSkew))

    // boilerplate-skew: the 20,000x-duplicated doc convicts its every
    // line as boilerplate of ONE group — the distinct and frequency
    // partials collapse the hot (group, line) keys map-side, the
    // conviction join's hot keys are AQE-splittable, and reassembly
    // stays per-doc bounded; the removed count pins the semantics
    val (bskewSec, bskewRemoved, _) = timed(
      graft.pipeline.TextAnalysis.removeBoilerplateLines(
        docsSkew.select(col("doc_id"), lit("g").as("grp"), col("text")),
        "doc_id", "text", "grp", maxDocFrac = 0.4, minDocs = 5)
        .agg(coalesce(sum(col("removed_lines")), lit(0L)))
        .collect().head.getLong(0))

    // source-overlap ubiquity skew: the 20,000x-duplicated doc's grams
    // land in ALL 20 synthetic sources; cap 10 must EXCLUDE those rows
    // (observed on the dedup cap channel) instead of fanning out 20^2 per
    // gram x 20,001 copies
    val (soSkewSec, soSkewShared, soSkewExcluded) =
      timed(srcOverlap(docsSkew, 10))

    // semdedup mega-cluster: ONE centroid puts the entire xMULT corpus in
    // a single cell — the worst clustering possible. The cluster-size cap
    // must engage (excluded members stay kept — under-deletion only) and
    // the run must complete without a quadratic blowup; excluded count
    // rides the LshCapObservation channel
    val semSkewCentroid = emb0.orderBy("vec_id").limit(1)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    val (semSkewSec, semSkewDropped, semSkewExcluded) = timed(
      Similarity.semDedup(embX, "vec_id", "embedding", semSkewCentroid,
        tau = 0.4, maxClusterSize = 1000)
        .agg(count(when(!col("kept"), 1))).collect().head.getLong(0))

    // incremental-fuzzy-state skew: the 20,000x-duplicated doc makes ONE
    // (band, bucket) pathologically popular in the persisted state — the
    // build-time cap must engage (observed on the dedup cap channel) and
    // a batch probing that bucket must complete without fanning out
    // 20,001 candidates per band; the duplicated text itself must still
    // be caught (capped buckets keep up to maxBucketSize members)
    val fuzzySkewDir = s"$work/lsh_state_skew"
    val (fskewSec, fskewSurvivors, fskewExcluded) = timed {
      Dedup.writeLshState(
        Dedup.lshState(docsSkew, "doc_id", "text", maxBucketSize = SkewCap),
        fuzzySkewDir)
      val st = Dedup.readLshState(spark, fuzzySkewDir)
      Dedup.nearDedupIncremental(
        docsSkew.orderBy("doc_id").limit(50)
          .select((col("doc_id") + lit(100000000L)).as("doc_id"), col("text")),
        "doc_id", "text", st, threshold = 0.5).count()
    }

    // pair-budget skew: MULT EXACT embedding copies make the TRUE pair
    // mass quadratic per duplicate cluster (C(MULT, 2) per base vector —
    // ~45x the corpus at x10) even with healthy banding: the boilerplate
    // shape where the pair LIST itself is the blowup. maxPairsPerDoc
    // bounds it at <= budget per id_a with the dropped pairs observed on
    // the LSH cap channel — under-reporting, never a quadratic output.
    val embDupPath = s"$work/embeddings_dup.parquet"
    (0 until mult).map(c =>
        if (c == 0) emb0
        else emb0.select((col("vec_id") + lit(c * embN)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(embDupPath)
    val embDup = spark.read.parquet(embDupPath)
    val (pbSec, pbPairs, pbExcluded) = timed {
      val (planes, tables) =
        Similarity.lshParamsFor(embN * mult, 0.42, targetRecall = 0.98)
      Dedup.embeddingNearDuplicates(embDup, "vec_id", "embedding",
        threshold = 0.42, planes = planes, numTables = tables,
        maxPairsPerDoc = 10).count()
    }

    // fuzzy-para skew: the 20,000×-duplicated doc's paragraphs form
    // identical-signature hot buckets at paragraph granularity — the
    // bucket cap must engage, CC must contract the capped pair list, and
    // every duplicated paragraph must still be removed (identical texts
    // collapse through the exact md5 fallback inside the capped buckets
    // only partially — under-removal is allowed, quadratic blowup is not)
    val (fpSkewSec, fpSkewRemoved, fpSkewExcluded) =
      timed(fuzzyParaProbe(docsSkew))

    val probeJson = results.map { case (name, (s1, n1, c1), (sx, nx, cx)) =>
      val ratio = if (s1 > 0) sx / s1 else -1.0
      f""""$name":{"x1_sec":$s1%.2f,"x${mult}_sec":$sx%.2f,"ratio":$ratio%.2f,"x1_pairs":$n1,"x${mult}_pairs":$nx,"x1_cap_excluded":$c1,"x${mult}_cap_excluded":$cx}"""
    }.mkString(",")
    val line =
      f"""{"mult":$mult,$probeJson,"skew":{"sec":$skewSec%.2f,"pairs":$skewPairs,"cap_excluded_rows":$skewExcluded,"cap":$SkewCap,"copies":$SkewCopies},"cc_hub":{"sec":$hubSec%.2f,"components":$hubComps,"degree":500000},"para_skew":{"sec":$pskewSec%.2f,"removed":$pskewRemoved,"copies":$SkewCopies},"boiler_skew":{"sec":$bskewSec%.2f,"removed":$bskewRemoved,"copies":$SkewCopies},"substr_skew":{"sec":$sskewSec%.2f,"removed":$sskewRemoved,"copies":$SkewCopies},"source_overlap_skew":{"sec":$soSkewSec%.2f,"shared":$soSkewShared,"cap_excluded_rows":$soSkewExcluded,"cap":10},"sem_skew":{"sec":$semSkewSec%.2f,"dropped":$semSkewDropped,"cap_excluded_rows":$semSkewExcluded,"cap":1000},"fuzzy_state_skew":{"sec":$fskewSec%.2f,"survivors":$fskewSurvivors,"cap_excluded_rows":$fskewExcluded,"cap":$SkewCap,"copies":$SkewCopies},"pair_budget":{"sec":$pbSec%.2f,"pairs":$pbPairs,"cap_excluded_rows":$pbExcluded,"budget":10,"copies":$mult},"fuzzy_para_skew":{"sec":$fpSkewSec%.2f,"removed":$fpSkewRemoved,"cap_excluded_rows":$fpSkewExcluded,"copies":$SkewCopies}}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "scale_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
