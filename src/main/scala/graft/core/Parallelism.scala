package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-heavy per-row pipelines.
  *
  * Heavy per-row work (tokenize + MinHash signatures, n-gram hashing,
  * exact-percentile buffers, per-row regex type inference, KLL updates)
  * is dominated by per-row CPU, not scan I/O. When the source's scan
  * parallelism is degenerate relative to the cluster — a single-row-group
  * parquet file, a coalesced upstream — the whole corpus' work serializes
  * into one task (measured: a 584 KB single-file `documents.parquet`
  * yields ONE scan partition, and a persisted tokenize+MinHash derivation
  * of it materialized as a 20.3 s single-task job). ONE narrow round-robin
  * shuffle of the slim input rows converts that map from single-core to
  * parallel, and Catalyst still prunes columns below the exchange.
  *
  * The floor target is SIZE-SCALED, not a blanket `defaultParallelism`:
  * ~[[BytesPerTask]] of source data per task, capped at the cluster
  * parallelism. Tokenize+hash throughput is ~30 ms/KB at the slow end,
  * so a 64 KB chunk is a 1-2 s task — big enough that scheduling
  * overhead is noise, small enough that a single degenerate file spreads
  * wide. A blanket 32-way repartition of a KB-sized frame was measured
  * 30-60% SLOWER end-to-end on signature-heavy pipelines (dozens of
  * near-empty tasks per stage across many small stages); the byte-scaled
  * target keeps those frames at a handful of partitions.
  *
  * On a healthy layout (100 TB = tens of thousands of row groups) the
  * partition count already exceeds the parallelism and [[floor]] is a
  * no-op — a real large scan never pays a corpus shuffle. The check
  * itself is plan-time only for file-source and explicitly-repartitioned
  * plans (no Spark job, no RDD DAG build); cached (InMemoryRelation)
  * leaves are trusted as healthy, and only local/v2 leaves fall back to
  * an RDD partition count.
  */
object Parallelism {

  /** ~bytes of (compressed, plan-time) source data per floored task. */
  private val BytesPerTask: Long = 64L * 1024

  /** `df` repartitioned to the size-scaled floor target iff its
    * estimated partition count is degenerate (under half the target);
    * otherwise `df` unchanged. Call it on the SLIM projection feeding a
    * CPU-heavy map, before the map.
    */
  def floor(df: DataFrame): DataFrame = {
    // a streaming frame has no static partition count to inspect (and
    // .rdd would throw); micro-batch parallelism is the source's concern
    if (df.isStreaming) return df
    // escape hatch for benchmarking / pathological cases: the floor is a
    // heuristic, and `spark.graft.parallelismFloor=off` restores the raw
    // scan parallelism everywhere
    if (df.sparkSession.conf
        .getOption("spark.graft.parallelismFloor").contains("off")) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val (estimate, rawBytes) = partitionEstimateWithBytes(df, cores)
    val target = rawBytes match {
      // size-scaled: one task per ~BytesPerTask of source, capped at the
      // cluster width — a 584 KB file spreads ~10-wide, a 30 KB frame
      // stays put, a multi-GB coalesced frame gets the full width
      case Some(b) =>
        math.min(cores.toLong, math.max(1L, (b + BytesPerTask - 1) / BytesPerTask))
      case None => cores.toLong
    }
    if (estimate * 2 <= target) df.repartition(target.toInt) else df
  }

  private[graft] def partitionEstimate(df: DataFrame, cores0: Int): Long =
    partitionEstimateWithBytes(df, cores0)._1

  /** (partition-count estimate, raw source bytes when file-rooted) —
    * WITHOUT `df.rdd` where possible. `.rdd` builds the full physical
    * RDD DAG on every call, and under AQE it EXECUTES upstream shuffle
    * stages just to read a partition count.
    *
    *  - a plan whose topmost node chain contains an explicit
    *    repartition/coalesce/rebalance is sized by that operator
    *    (its declared partition count, or `spark.sql.shuffle.partitions`
    *    when keyed without an explicit count);
    *  - pure file-source plans replicate Spark's FilePartition sizing
    *    (maxSplitBytes = min(maxPartitionBytes, max(openCost,
    *    bytesPerCore))) from the relation's plan-time byte size, and
    *    also report the raw (no open-cost) byte size for the size-scaled
    *    floor target;
    *  - cached (InMemoryRelation) leaves are trusted as healthy — under
    *    AQE, `.rdd` on a cached-but-unmaterialized plan executes the
    *    cached child's shuffle stages eagerly, and that work is NOT
    *    reused by the later real action (exchange reuse is
    *    per-QueryExecution). In-repo persisted frames are shuffle- or
    *    floor-produced and never degenerate; a caller persisting a
    *    1-partition frame should floor before the persist;
    *  - anything else (local relations, v2 sources) falls back to the
    *    RDD partition count.
    */
  private def partitionEstimateWithBytes(
      df: DataFrame, cores0: Int): (Long, Option[Long]) = {
    import org.apache.spark.sql.catalyst.plans.logical.{RebalancePartitions, Repartition, RepartitionByExpression}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val plan = df.queryExecution.optimizedPlan
    // the TOPMOST explicit repartition governs the output partitioning of
    // everything below it (collectFirst is pre-order from the root)
    val declared = plan.collectFirst {
      case r: Repartition => r.numPartitions.toLong
      case r: RepartitionByExpression =>
        r.optNumPartitions.map(_.toLong)
          .getOrElse(conf.numShufflePartitions.toLong)
      case r: RebalancePartitions =>
        r.optNumPartitions.map(_.toLong)
          .getOrElse(conf.numShufflePartitions.toLong)
    }
    declared match {
      case Some(n) => (n, None)
      case None =>
        val leaves = plan.collectLeaves()
        val hasCached = leaves.exists {
          case _: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            true
          case _ => false
        }
        if (hasCached) return (Int.MaxValue.toLong, None) // *2 must not overflow
        val fileRelations = leaves
          .collect { case l: LogicalRelation => l.relation }
          .collect { case fs: HadoopFsRelation => fs }
        if (fileRelations.nonEmpty && fileRelations.length == leaves.length) {
          val openCost = math.max(conf.filesOpenCostInBytes, 1L)
          val cores = math.max(cores0, 1)
          val rawBytes = fileRelations.map(_.location.sizeInBytes).sum
          val totalBytes = rawBytes +
            fileRelations.map(_.location.inputFiles.length.toLong * openCost).sum
          val maxSplitBytes = math.min(
            math.max(conf.filesMaxPartitionBytes, 1L),
            math.max(openCost, totalBytes / cores))
          (math.max(1L, (totalBytes + maxSplitBytes - 1) / maxSplitBytes),
            Some(rawBytes))
        } else (df.rdd.getNumPartitions.toLong, None)
    }
  }
}
