package graft.pipeline

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener

/** Automatic release of internally persisted frames.
  *
  * Pipeline pair-search functions persist small intermediate frames
  * (signatures, capped LSH buckets) because several join sides probe them.
  * The result DataFrame is lazy, so the function itself cannot unpersist —
  * instead the result is tagged with a uniquely named `observe` metric and a
  * one-shot [[QueryExecutionListener]] unpersists the caches the first time
  * an action executes a plan carrying that tag. On a long-lived session
  * (the 100-TB pipeline case) caches therefore live exactly as long as the
  * result is unconsumed, instead of forever.
  *
  * Re-consuming the result after the first action recomputes the lineage
  * without the caches — correct (everything is deterministic), just slower;
  * callers that iterate should persist the *result* themselves.
  */
private[graft] object CacheLifecycle {

  /** Actions (with or without the tag) after which an unconsumed result's
    * caches are released anyway — a safety valve for results that are
    * abandoned, or whose tagged subtree an optimization pruned away (e.g.
    * AQE empty-relation propagation short-circuiting a join side): the
    * listener and cache markings must not outlive the session.
    */
  private val MaxUnconsumedActions = 200

  /** Tag `result` so that `caches` are unpersisted (non-blocking) after the
    * first action that consumes it.
    */
  def releaseOnConsume(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    if (caches.isEmpty) return result
    val tag = "graft_release_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val spark = result.sparkSession
    val tagged = result.observe(tag, count(lit(1)))
    val done = new AtomicBoolean(false)
    val unrelatedActions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val expired =
          !qe.observedMetrics.contains(tag) &&
            unrelatedActions.incrementAndGet() >= MaxUnconsumedActions
        if ((qe.observedMetrics.contains(tag) || expired) && done.compareAndSet(false, true)) {
          caches.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    tagged
  }
}
