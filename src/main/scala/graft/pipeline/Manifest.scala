package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dataset release manifests — the reproducibility primitive of a
  * training-data pipeline: after a curation run ships a dataset, a slim
  * per-shard fingerprint table pins WHAT shipped, and any later rescan
  * (or the next release) diffs against it without re-reading matching
  * shards' bytes anywhere else.
  *
  * Shape per shard: `(shard, n_rows, id_sum, content_fp)` —
  *  - `n_rows` / `id_sum`: membership census (catches drops, additions,
  *    and duplications);
  *  - `content_fp`: bit_xor of per-row 60-bit fingerprints — an
  *    ORDER-INDEPENDENT content hash with no overflow semantics to
  *    drift across engines (a sum of 2^60-scale values overflows a
  *    signed 64-bit accumulator at ~16 rows; XOR never carries). XOR
  *    cancels identical rows pairwise, which is why the census columns
  *    ride alongside: a row duplicated twice flips `n_rows`, a
  *    mutation flips `content_fp`, a swap between shards flips both
  *    shards' triples.
  *
  * Row fingerprint: the first 15 hex digits (60 bits) of
  * `md5(id <U+001F> canon(col1) <U+001F> canon(col2) ...)` where `canon` is
  * cast-to-string with an explicit U+0001-prefixed null sentinel ("\u0001NULL" — a
  * NULL must not collide with the empty string — both engines'
  * concat_ws would otherwise silently skip it).
  *
  * Scale shape: ONE map-side-combinable pass over the dataset builds
  * the manifest (groupBy on the shard key — thousands of slim rows at
  * 100 TB); [[diff]] is a manifest-vs-manifest FULL OUTER join, KB in,
  * KB out — release-to-release audits never touch the corpus.
  */
object DatasetManifest {

  private def canon(c: Column): Column =
    coalesce(c.cast("string"), lit("\u0001NULL"))

  /** Per-row 60-bit fingerprint of (id, contentCols...) — cross-engine
    * reproducible (DuckDB: `CAST('0x' || substr(md5(...), 1, 15) AS
    * BIGINT)` of the identical canonical encoding).
    */
  def rowFingerprint(idCol: Column, contentCols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u001f",
      (canon(idCol) +: contentCols.map(canon)): _*).cast("binary")), 1, 15),
      16, 10).cast(LongType)

  /** The manifest: one row per shard (`pmod(id, shards)` — deterministic
    * and replayable by any engine; pass a pre-computed shard column via
    * `shardCol` to pin a custom layout). Null ids land in shard NULL —
    * visible in the manifest rather than silently skipped.
    */
  def build(
      df: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(contentCols.nonEmpty, "build needs at least one content column")
    df.groupBy(pmod(col(idCol), lit(shards)).as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(idCol).cast(LongType)).as("id_sum"),
        bit_xor(rowFingerprint(col(idCol), contentCols.map(col)))
          .as("content_fp"))
  }

  /** [[build]] with a caller-supplied shard key: manifests a frame laid
    * out by something OTHER than `pmod(id, shards)` — a curriculum
    * shard, a z-order bucket, an externally assigned partition. Same
    * lanes, same per-shard monoid; [[diff]]/[[joined]]/[[lineage]]
    * compose unchanged because they only see the (shard, triple) shape.
    */
  def buildAt(
      df: DataFrame,
      shardCol: Column,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "buildAt needs at least one content column")
    df.groupBy(shardCol.cast(LongType).as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(idCol).cast(LongType)).as("id_sum"),
        bit_xor(rowFingerprint(col(idCol), contentCols.map(col)))
          .as("content_fp"))
  }

  /** The manifest triple is a per-shard COMMUTATIVE MONOID (Long sums +
    * XOR — no float, no order sensitivity, no overflow in the fp lane),
    * so per-batch manifests fold to the whole-dataset manifest exactly:
    * every row lands in exactly one batch, sums add, and the per-row
    * fingerprints XOR together regardless of which batch carried them.
    * This is what makes the manifest family streamable
    * ([[graft.streaming.StreamingOps.SketchStateIngest]] with
    * `build(batch, ...)` as the batch state and this fold at read):
    * release N+1's manifest accretes from micro-batch manifests while
    * the release ships, the corpus never rescanned.
    */
  def foldManifests(parts: DataFrame): DataFrame =
    parts.groupBy(col("shard"))
      .agg(
        sum(col("n_rows")).cast(LongType).as("n_rows"),
        sum(col("id_sum")).cast(LongType).as("id_sum"),
        bit_xor(col("content_fp")).as("content_fp"))

  /** Monoid merge of two manifests (a persisted release-so-far and a new
    * batch's manifest) — [[foldManifests]] over the union.
    */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    foldManifests(a.unionByName(b))

  /** Per-(release, shard) manifest of a frame whose rows carry a release
    * tag — the streaming form of [[build]] for a MULTI-RELEASE stream:
    * micro-batches may slice releases arbitrarily (a trigger can carry
    * the tail of release N and the head of N+1), and the triple is the
    * same commutative monoid per (release, shard), so per-batch keyed
    * manifests fold ([[foldKeyedManifests]]) to exactly the manifests a
    * one-shot per-release [[build]] produces. This is how lineage gets
    * its streaming twin: the release CHAIN accretes while releases
    * ship, and [[lineageFromKeyed]] answers "which release introduced
    * this shard's drift" from the folded state alone.
    */
  def buildKeyed(
      df: DataFrame,
      releaseCol: String,
      idCol: String,
      contentCols: Seq[String],
      shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(contentCols.nonEmpty, "buildKeyed needs a content column")
    df.groupBy(col(releaseCol).cast(LongType).as("release"),
        pmod(col(idCol), lit(shards)).as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(idCol).cast(LongType)).as("id_sum"),
        bit_xor(rowFingerprint(col(idCol), contentCols.map(col)))
          .as("content_fp"))
  }

  /** [[foldManifests]] with the release key kept — the read-time fold
    * for [[buildKeyed]] parts. */
  def foldKeyedManifests(parts: DataFrame): DataFrame =
    parts.groupBy(col("release"), col("shard"))
      .agg(
        sum(col("n_rows")).cast(LongType).as("n_rows"),
        sum(col("id_sum")).cast(LongType).as("id_sum"),
        bit_xor(col("content_fp")).as("content_fp"))

  /** [[lineage]] over a keyed manifest frame (the [[buildKeyed]] /
    * [[foldKeyedManifests]] shape). Only the DISTINCT RELEASE IDS are
    * collected to the driver — tens of longs for a real chain; the
    * manifests themselves stay distributed.
    */
  def lineageFromKeyed(keyed: DataFrame): DataFrame = {
    val rids = keyed.select(col("release").cast(LongType))
      .distinct().collect().map(_.getLong(0)).sorted
    require(rids.length >= 2,
      s"lineage needs at least two releases, found ${rids.length}")
    lineage(rids.toSeq.map(r =>
      r -> keyed.where(col("release") === r).drop("release")))
  }

  /** Cross-release LINEAGE over an ordered chain of release manifests:
    * for every shard, which release introduced each drift — answered
    * from the manifests alone (KB-scale frames), no corpus read
    * anywhere. Output: one row per (shard, release) TRANSITION where
    * the shard's triple changed vs the previous release —
    * `status` ∈ added/removed/changed plus two 0/1 lanes splitting the
    * cause: `census_changed` (n_rows or id_sum moved — membership) and
    * `content_changed` (content_fp moved — bytes). A shard absent from
    * a middle release yields `removed` there and `added` where it
    * reappears. Release ids must be strictly increasing; the first
    * release is the baseline (no transition rows).
    *
    * Scale shape: manifests are thousands of rows at 100 TB and the
    * release chain is tens long, so the dense (shard × release) grid
    * this builds is ~10⁵ slim rows; the per-shard window orders a
    * handful of rows per partition. Nothing here ever touches the
    * datasets the manifests describe — that is the point.
    */
  def lineage(releases: Seq[(Long, DataFrame)]): DataFrame = {
    require(releases.length >= 2, "lineage needs at least two releases")
    require(releases.map(_._1) == releases.map(_._1).sorted &&
      releases.map(_._1).distinct.length == releases.length,
      "release ids must be strictly increasing")
    val tagged = releases.map { case (rid, m) =>
      m.select(lit(rid).as("release"), col("shard"), col("n_rows"),
        col("id_sum"), col("content_fp"))
    }.reduce(_ unionByName _)
    // dense grid: every shard ever seen × every release, so absence is a
    // comparable state (a LEFT-JOIN null), not a missing row the window
    // would silently skip over
    val grid = tagged.select(col("shard")).distinct()
      .select(col("shard"),
        explode(typedLit(releases.map(_._1))).as("release"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("release"))
    val firstRelease = releases.head._1
    val dense = grid.join(tagged, Seq("shard", "release"), "left_outer")
      .withColumn("graft_prev_n", lag(col("n_rows"), 1).over(w))
      .withColumn("graft_prev_ids", lag(col("id_sum"), 1).over(w))
      .withColumn("graft_prev_fp", lag(col("content_fp"), 1).over(w))
      .withColumn("graft_prev_present",
        lag(col("n_rows").isNotNull, 1).over(w))
    val present = col("n_rows").isNotNull
    val censusMoved = !(col("n_rows") <=> col("graft_prev_n")) ||
      !(col("id_sum") <=> col("graft_prev_ids"))
    val contentMoved = !(col("content_fp") <=> col("graft_prev_fp"))
    dense
      .where(col("release") =!= firstRelease)
      .withColumn("status",
        when(present && !col("graft_prev_present"), "added")
          .when(!present && col("graft_prev_present"), "removed")
          .when(present && col("graft_prev_present") &&
            (censusMoved || contentMoved), "changed"))
      .where(col("status").isNotNull)
      .select(col("shard"), col("release"), col("status"),
        when(col("status") === "changed" && censusMoved, 1L).otherwise(0L)
          .as("census_changed"),
        when(col("status") === "changed" && contentMoved, 1L).otherwise(0L)
          .as("content_changed"))
  }

  /** Two manifests FULL OUTER joined on the shard key with `_a`/`_b`
    * suffixed census columns — the input shape of [[diff]] and of the
    * [[graft.operators.ManifestParity]] analyzer
    * (`Check.hasManifestParity`), which puts release parity on the
    * constraint surface.
    */
  def joined(a: DataFrame, b: DataFrame): DataFrame = {
    val la = a.select(col("shard"), col("n_rows").as("n_rows_a"),
      col("id_sum").as("id_sum_a"), col("content_fp").as("content_fp_a"))
    val lb = b.select(col("shard"), col("n_rows").as("n_rows_b"),
      col("id_sum").as("id_sum_b"), col("content_fp").as("content_fp_b"))
    la.join(lb, Seq("shard"), "full_outer")
  }

  /** Shards that drifted between two manifests: FULL OUTER on the shard
    * key (a shard present on one side IS drift), one row per differing
    * shard with a status — `added` (only in `b`), `removed` (only in
    * `a`), `changed` (any of the triple differs). Matching shards are
    * absent from the output: an empty diff IS the release-parity proof.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame =
    joined(a, b)
      .withColumn("status",
        when(col("n_rows_b").isNull, "removed")
          .when(col("n_rows_a").isNull, "added")
          .when(!(col("n_rows_a") <=> col("n_rows_b")) ||
            !(col("id_sum_a") <=> col("id_sum_b")) ||
            !(col("content_fp_a") <=> col("content_fp_b")), "changed"))
      .where(col("status").isNotNull)

  /** Row-level drill-down into the shards [[diff]] named: scan ONLY
    * those shards of the two datasets (the shard predicate prunes every
    * matching shard — at 100 TB this is the difference between
    * re-reading two releases and re-reading the handful of drifted
    * shards) and name the exact rows that differ. Per id the row census
    * is (occurrences, XOR of row fingerprints), so duplicated ids and
    * content mutations are distinguished from membership changes:
    * `added` (id only in `b`), `removed` (only in `a`), `changed`
    * (occurrence count or content differs). Rows identical on both
    * sides are absent from the output — the row-level analogue of the
    * empty-diff parity proof.
    */
  def drillDown(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      shards: Int,
      driftedShards: Seq[Long]): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(contentCols.nonEmpty, "drillDown needs at least one content column")
    def restrict(df: DataFrame): DataFrame = {
      val pred =
        if (driftedShards.isEmpty) lit(false)
        else pmod(col(idCol), lit(shards)).isin(driftedShards: _*)
      df.where(pred)
    }
    rowCensusDiff(restrict(a), restrict(b), idCol, contentCols)
  }

  /** The per-id census diff shared by [[drillDown]] and
    * [[drillDownSharded]]: (occurrences, fingerprint XOR) per id, FULL
    * OUTER on id, one (id, status) row per differing id.
    */
  private def rowCensusDiff(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, suffix: String): DataFrame =
      df.groupBy(col(idCol).cast(LongType).as("id"))
        .agg(count(lit(1)).as(s"n_$suffix"),
          bit_xor(rowFingerprint(col(idCol), contentCols.map(col)))
            .as(s"fp_$suffix"))
    side(a, "a").join(side(b, "b"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("n_b").isNull, "removed")
          .when(col("n_a").isNull, "added")
          .when(!(col("n_a") <=> col("n_b")) ||
            !(col("fp_a") <=> col("fp_b")), "changed"))
      .where(col("status").isNotNull)
      .select(col("id"), col("status"))
  }

  /** Manifest with PER-COLUMN fingerprint lanes: the [[build]] census
    * plus one XOR'd fingerprint per content column (the row fingerprint
    * of `(id, that column alone)`), so a release-to-release diff names
    * WHICH FIELD drifted per shard — the shard → column → row
    * localization pyramid runs entirely on KB manifests until the final
    * [[drillDown]] step. XOR semantics per lane match the whole-row
    * lane: membership changes flip every lane, a single-column mutation
    * flips exactly its lane.
    */
  def buildColumnar(
      df: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      shards: Int = 64): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(contentCols.nonEmpty,
      "buildColumnar needs at least one content column")
    val lanes = contentCols.map(c =>
      bit_xor(rowFingerprint(col(idCol), Seq(col(c)))).as(s"fp_$c"))
    val aggs = Seq(
      sum(col(idCol).cast(LongType)).as("id_sum"),
      bit_xor(rowFingerprint(col(idCol), contentCols.map(col)))
        .as("content_fp")) ++ lanes
    df.groupBy(pmod(col(idCol), lit(shards)).as("shard"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Column-level diff of two [[buildColumnar]] manifests: one row per
    * drifted shard with the membership status ([[diff]] semantics) and
    * `drifted_columns` — the comma-joined content columns whose lane
    * differs (all of them for added/removed shards). A `changed` shard
    * can carry an EMPTY column list: even-multiplicity duplication
    * cancels in every XOR lane while the `n_rows` census still flips —
    * that combination reads "membership drift, no field-content drift",
    * which is exactly right.
    */
  def diffColumnar(
      a: DataFrame,
      b: DataFrame,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty,
      "diffColumnar needs at least one content column")
    val laneCols = contentCols.map(c => s"fp_$c")
    val la = a.select((Seq(col("shard"), col("n_rows").as("n_rows_a"),
      col("id_sum").as("id_sum_a"), col("content_fp").as("content_fp_a")) ++
      laneCols.map(c => col(c).as(s"${c}_a"))): _*)
    val lb = b.select((Seq(col("shard"), col("n_rows").as("n_rows_b"),
      col("id_sum").as("id_sum_b"), col("content_fp").as("content_fp_b")) ++
      laneCols.map(c => col(c).as(s"${c}_b"))): _*)
    val laneDrift = array(contentCols.map(c =>
      when(!(col(s"fp_${c}_a") <=> col(s"fp_${c}_b")), lit(c))): _*)
    la.join(lb, Seq("shard"), "full_outer")
      .withColumn("status",
        when(col("n_rows_b").isNull, "removed")
          .when(col("n_rows_a").isNull, "added")
          .when(!(col("n_rows_a") <=> col("n_rows_b")) ||
            !(col("id_sum_a") <=> col("id_sum_b")) ||
            !(col("content_fp_a") <=> col("content_fp_b")), "changed"))
      .where(col("status").isNotNull)
      .withColumn("drifted_columns",
        when(col("status") === "changed",
          array_join(filter(laneDrift, x => x.isNotNull), ","))
          .otherwise(lit(contentCols.mkString(","))))
      .select(col("shard"), col("status"), col("drifted_columns"))
  }

  /** Ship a release LAID OUT BY SHARD (`path/shard=<s>/…`, the manifest's
    * own `pmod(id, shards)` key) so release audits are partition-pruned
    * at the SOURCE: [[drillDownSharded]] opens only the drifted shards'
    * directories — at 100 TB the matching shards' files are never
    * listed, opened, or read, which is the physical guarantee the
    * in-memory [[drillDown]]'s post-scan filter can only approximate.
    */
  def writeSharded(
      df: DataFrame,
      path: String,
      idCol: String,
      shards: Int = 64): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.withColumn("shard", pmod(col(idCol), lit(shards)))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Read ONLY the named shards of a [[writeSharded]] release — explicit
    * subdirectory paths (the deterministic pruning no optimizer has to
    * prove), with `basePath` so the shard partition column survives.
    */
  def readShards(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      shards: Seq[Long]): DataFrame = {
    require(shards.nonEmpty, "readShards needs at least one shard")
    spark.read.option("basePath", path)
      .parquet(shards.map(s => s"$path/shard=$s"): _*)
  }

  /** [[drillDown]] over two [[writeSharded]] releases: the row-level
    * audit touches ONLY the drifted shards' files on both sides.
    */
  def drillDownSharded(
      spark: org.apache.spark.sql.SparkSession,
      pathA: String,
      pathB: String,
      idCol: String,
      contentCols: Seq[String],
      driftedShards: Seq[Long]): DataFrame = {
    require(contentCols.nonEmpty,
      "drillDownSharded needs at least one content column")
    if (driftedShards.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", LongType),
          org.apache.spark.sql.types.StructField("status",
            org.apache.spark.sql.types.StringType))))
    rowCensusDiff(
      readShards(spark, pathA, driftedShards),
      readShards(spark, pathB, driftedShards), idCol, contentCols)
  }

  def writeManifest(manifest: DataFrame, path: String): Unit =
    manifest.write.mode("overwrite").parquet(path)

  def readManifest(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)
}
