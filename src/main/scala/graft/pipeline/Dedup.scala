package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Deduplication for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes:
  * - exact dedup = one hash-shuffle on the dedup key (or its xxhash64 for
  *   wide keys), no sort, map-side partial aggregation
  * - MinHash: signatures are pure column expressions (no UDF); LSH banding
  *   turns the quadratic pair search into an equi-join on (band, bandHash),
  *   so candidate generation is a shuffle on band keys; only bucket-mates
  *   are verified. Skewed buckets are capped to bound worst-case blowup.
  * - SimHash: 64-bit signature from pure expressions; near-dup candidates
  *   via banded equality on signature chunks (Hamming ≤ k ⇒ some chunk equal).
  */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact deduplication
  // -------------------------------------------------------------------------

  /** Keep exactly one row per distinct key, deterministically (smallest
    * `tieBreaker`). One shuffle on the key columns.
    */
  def exact(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreaker).asc)
    df.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** (rows kept, duplicate rows dropped) without materializing the result.
    * One groupBy job computes both: distinct keys AND total rows come out
    * of the same frequency aggregation.
    */
  def exactCounts(df: DataFrame, keys: Seq[String]): (Long, Long) = {
    val row = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("graft_c"))
      .agg(count(lit(1)), coalesce(sum(col("graft_c")), lit(0L)))
      .collect().head
    val kept = row.getLong(0)
    (kept, row.getLong(1) - kept)
  }

  // -------------------------------------------------------------------------
  // MinHash + LSH near-duplicate detection
  // -------------------------------------------------------------------------

  /** Word n-gram shingles of the normalized text, as an array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.normalizedTokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(when(size(toks) > 0, array(concat_ws(" ", toks))).otherwise(array()))
  }

  /** 64-bit hashes of a shingle-array column — hash each shingle STRING
    * exactly once; every downstream per-seed pass then works on fixed-width
    * longs instead of re-hashing variable-length strings.
    */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => xxhash64(s))

  /** Per-token 64-bit hashes. */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.normalizedTokens(text), t => xxhash64(t))

  /** Shingle-set hashes straight from token hashes: the hash of an n-gram
    * is the hash of its n consecutive token hashes — no n-gram STRING is
    * ever built (no slice/concat/string alloc), and set identity is
    * preserved with 64-bit collision probability.
    */
  def shingleHashesFromTokenHashes(tokenHashesCol: Column, n: Int = 3): Column = {
    val ngram = when(size(tokenHashesCol) >= n,
      array_distinct(transform(
        sequence(lit(0), size(tokenHashesCol) - lit(n)),
        i => xxhash64((1 to n).map(k => element_at(tokenHashesCol, i + lit(k))): _*))))
    // short docs: one shingle = hash of the whole token-hash array
    ngram.otherwise(
      when(size(tokenHashesCol) > 0, array(xxhash64(tokenHashesCol)))
        .otherwise(array().cast(ArrayType(LongType))))
  }

  /** MinHash signature from an ALREADY MATERIALIZED shingle-HASH column.
    * Materializing first matters twice over: (a) higher-order functions
    * inline their argument subtree, so passing the raw shingle expression
    * would re-tokenize the text once per hash seed (64x); (b) hashing the
    * string per seed makes each seed O(shingle length) — re-hashing the
    * 8-byte long is O(1) per seed.
    */
  def minHashSignatureFromHashes(hashesCol: Column, numHashes: Int = 64): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed =>
        when(size(hashesCol) > 0,
          array_min(transform(hashesCol, h => xxhash64(h, seed))))
          .otherwise(lit(Long.MaxValue)))

  def minHashSignatureFromShingles(shinglesCol: Column, numHashes: Int = 64): Column =
    minHashSignatureFromHashes(shingleHashes(shinglesCol), numHashes)

  /** Convenience: signature straight from text (materializes internally
    * when used via minHashCandidatePairs).
    */
  def minHashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    minHashSignatureFromShingles(shingles(text, shingleSize), numHashes)

  /** Candidate near-duplicate pairs via LSH banding over the MinHash
    * signature: rows agreeing on ANY band land in the same bucket.
    * Returns (idA, idB, jaccardEstimate) with idA < idB, deduplicated.
    *
    * `maxBucketSize` caps pathological buckets (e.g. empty docs) so a skewed
    * key cannot produce a quadratic explosion at scale.
    */
  def minHashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    // staged projection: EACH stage binds its result as a column before the
    // next references it. shingleHashesFromTokenHashes reads its input via
    // element_at once per shingle element — if the token-hash expression
    // were inlined there, every element access would re-tokenize the text
    // (quadratic). A bound multi-referenced alias is a projection barrier
    // (CollapseProject keeps non-cheap aliases referenced more than once).
    val sigs = df
      .select(col(idCol).as("graft_id"), tokenHashes(col(textCol)).as("graft_th"))
      .select(col("graft_id"),
        shingleHashesFromTokenHashes(col("graft_th"), shingleSize).as("graft_hs"))
      .select(col("graft_id"),
        minHashSignatureFromHashes(col("graft_hs"), numHashes).as("graft_sig"))

    // explode to (band, hash(band slice)) — one row per band per doc;
    // xxhash64 hashes the long-array slice directly (no string building)
    val banded = sigs.select(
      col("graft_id"), col("graft_sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("graft_sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "graft_band")
      .withColumnRenamed("col", "graft_bucket")

    // cap skewed buckets
    val wBucket = Window.partitionBy(col("graft_band"), col("graft_bucket"))
      .orderBy(col("graft_id"))
    // persist before the self-join: signatures are ~64 longs/doc (orders of
    // magnitude smaller than the text) — without this, both join sides
    // recompute the whole tokenize→shingle→hash→minhash pipeline
    val capped = banded
      .withColumn("graft_bn", row_number().over(wBucket))
      .filter(col("graft_bn") <= maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val a = capped.select(col("graft_band"), col("graft_bucket"),
      col("graft_id").as("id_a"), col("graft_sig").as("sig_a"))
    val b = capped.select(col("graft_band"), col("graft_bucket"),
      col("graft_id").as("id_b"), col("graft_sig").as("sig_b"))

    a.join(b, Seq("graft_band", "graft_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast(IntegerType)),
          v => v === 1)).cast(DoubleType) / lit(numHashes.toDouble)).as("jaccard_est"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Near-duplicate pairs with an exact n-gram Jaccard verification pass on
    * the LSH candidates only.
    */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val candidates = minHashCandidatePairs(df, idCol, textCol, numHashes, bands, shingleSize)
    // verify on 64-bit shingle hashes: set ops over longs, not strings
    // (collision probability at 64 bits is negligible for dedup purposes);
    // persisted because the pair join probes it once per pair side
    val docs = df
      .select(col(idCol).as("graft_doc_id"), tokenHashes(col(textCol)).as("graft_th"))
      .select(col("graft_doc_id"),
        shingleHashesFromTokenHashes(col("graft_th"), shingleSize).as("graft_shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    candidates
      .join(docs.withColumnRenamed("graft_doc_id", "id_a")
        .withColumnRenamed("graft_shingles", "sh_a"), Seq("id_a"))
      .join(docs.withColumnRenamed("graft_doc_id", "id_b")
        .withColumnRenamed("graft_shingles", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash over the token set, as a LongType column built from
    * pure expressions: per-bit vote of the token hashes.
    */
  /** SimHash from an already materialized token-hash array column: ONE
    * aggregate pass accumulates all 64 per-bit vote counters in an array
    * accumulator, then the sign vector is packed into a long. Keeping the
    * hash array a bound column avoids re-tokenizing per bit.
    */
  def simHashFromHashes(hashesCol: Column): Column = {
    val votes = aggregate(
      hashesCol,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, b) => a + when(getbit(h, b) === 1, lit(1L)).otherwise(lit(-1L))))
    // pack sign bits: sum of 2^b over bits with positive vote (bits disjoint)
    val powers = array((0 until 64).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0L, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  def simHash(text: Column): Column =
    simHashFromHashes(transform(TextAnalysis.normalizedTokens(text), t => xxhash64(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash: candidates agree on at least one of
    * four 16-bit chunks (pigeonhole: Hamming ≤ 3 guarantees a match),
    * verified by exact Hamming distance.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persist the 8-byte signatures before the self-join (see minhash note)
    val sigs = df
      .select(col(idCol).as("graft_id"),
        transform(TextAnalysis.normalizedTokens(col(textCol)), t => xxhash64(t)).as("graft_th"))
      .select(col("graft_id"), simHashFromHashes(col("graft_th")).as("graft_sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val chunked = sigs.select(
      col("graft_id"), col("graft_sim"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftrightunsigned(col("graft_sim"), c * 16)
          .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)))
      .select(col("graft_id"), col("graft_sim"),
        col("col.chunk").as("graft_chunk"), col("col.v").as("graft_chunk_val"))

    val a = chunked.select(col("graft_chunk"), col("graft_chunk_val"),
      col("graft_id").as("id_a"), col("graft_sim").as("sim_a"))
    val b = chunked.select(col("graft_chunk"), col("graft_chunk_val"),
      col("graft_id").as("id_b"), col("graft_sim").as("sim_b"))

    a.join(b, Seq("graft_chunk", "graft_chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
  }

  // -------------------------------------------------------------------------
  // Embedding near-duplicate (cosine) — delegates to Similarity
  // -------------------------------------------------------------------------

  /** Pairs of embeddings with cosine similarity above `threshold`, using
    * the LSH-bucketed path from [[Similarity]].
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      embeddingCol: String,
      threshold: Double = 0.95,
      planes: Int = 16): DataFrame =
    Similarity.cosinePairsLsh(df, idCol, embeddingCol, threshold, planes)
}
