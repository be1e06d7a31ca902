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
  * shuffle of the slim input rows to `defaultParallelism` converts that
  * map from single-core to cluster-wide, and Catalyst still prunes
  * columns below the exchange.
  *
  * On a healthy layout (100 TB = tens of thousands of row groups) the
  * partition count already exceeds the parallelism and [[floor]] is a
  * no-op — a real large scan never pays a corpus shuffle. The check
  * itself is plan-time only for file-source and explicitly-repartitioned
  * plans (no Spark job, no RDD DAG build); only in-memory/local-relation
  * leaves fall back to an RDD partition count.
  */
object Parallelism {

  /** `df` repartitioned to `defaultParallelism` iff its estimated
    * partition count is degenerate (under half the default parallelism);
    * otherwise `df` unchanged. Call it on the SLIM projection feeding a
    * CPU-heavy map, before the map.
    */
  def floor(df: DataFrame): DataFrame = {
    // a streaming frame has no static partition count to inspect (and
    // .rdd would throw); micro-batch parallelism is the source's concern
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (partitionEstimate(df, target) * 2 <= target) df.repartition(target)
    else df
  }

  /** Partition-count estimate WITHOUT `df.rdd` where possible — `.rdd`
    * builds the full physical RDD DAG on every call, and under AQE it
    * EXECUTES upstream shuffle stages just to read a partition count.
    *
    *  - a plan whose topmost node chain contains an explicit
    *    repartition/coalesce/rebalance is sized by that operator
    *    (its declared partition count, or `spark.sql.shuffle.partitions`
    *    when keyed without an explicit count);
    *  - pure file-source plans replicate Spark's FilePartition sizing
    *    (maxSplitBytes = min(maxPartitionBytes, max(openCost,
    *    bytesPerCore))) from the relation's plan-time byte size;
    *  - anything else (in-memory relations, local relations, v2 sources)
    *    falls back to the RDD partition count.
    */
  private[graft] def partitionEstimate(df: DataFrame, cores0: Int): Long = {
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
      case Some(n) => n
      case None =>
        val leaves = plan.collectLeaves()
        val fileRelations = leaves
          .collect { case l: LogicalRelation => l.relation }
          .collect { case fs: HadoopFsRelation => fs }
        if (fileRelations.nonEmpty && fileRelations.length == leaves.length) {
          val openCost = math.max(conf.filesOpenCostInBytes, 1L)
          val cores = math.max(cores0, 1)
          val totalBytes = fileRelations.map(fs =>
            fs.location.sizeInBytes +
              fs.location.inputFiles.length.toLong * openCost).sum
          val maxSplitBytes = math.min(
            math.max(conf.filesMaxPartitionBytes, 1L),
            math.max(openCost, totalBytes / cores))
          math.max(1L, (totalBytes + maxSplitBytes - 1) / maxSplitBytes)
        } else df.rdd.getNumPartitions.toLong
    }
  }
}
