package graft.core

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache lifetime discipline for catalog queries.
  *
  * Several operators persist() a small intermediate (e.g. the per-doc
  * LSH profile table) that the returned — still lazy — DataFrame
  * references from multiple subtrees. The persist is what keeps the
  * profile aggregation from running 3-4×, but the query builder has no
  * action of its own to unpersist after: the consuming action happens
  * later, in whoever materializes the result (Verify, Bench, a user's
  * write). Left alone, those caches accumulate for the session's
  * lifetime.
  *
  * [[releaseAfterUse]] closes that gap without touching the laziness
  * contract: it registers a QueryExecutionListener that watches for the
  * FIRST query execution (success or failure) whose analyzed plan
  * contains the result's plan as a subtree — i.e. the action that
  * consumed the result — then unpersists the registered intermediates
  * and unregisters itself. Matching is by canonicalized `sameResult`,
  * so writes that wrap the result (coalesce + InsertInto, noop
  * AppendData, count aggregates) still match. A false-positive match
  * from an identical-canonical-plan sibling is harmless: unpersisting
  * early only costs recomputation, never correctness.
  *
  * Listener delivery is asynchronous (the SQL execution-end event bus),
  * so the cache drop lands shortly after the action returns, not
  * synchronously inside it — callers polling cache state (tests) must
  * allow for that.
  */
object CacheScope {

  /** Eagerly localCheckpoint `df`, returning the checkpointed frame
    * together with the checkpoint's RDDs (named `name` so leak checks
    * can attribute them) for the caller's release discipline. The RDD
    * set is derived by diffing `getPersistentRDDs` around the
    * checkpoint — valid only for a sequentially-used session (the
    * assumption every iterative operator in this library documents);
    * the shared helper exists so the pattern can't drift per call
    * site.
    */
  def trackedCheckpoint(df: DataFrame, name: String)
      : (DataFrame, Iterable[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val rdds = (sc.getPersistentRDDs -- before).values
    rdds.foreach(_.setName(name))
    (out, rdds)
  }

  /** Arrange for `cached` (already persisted) to be unpersisted once the
    * first action consuming `result` completes. Returns `result`
    * unchanged.
    */
  def releaseAfterUse(result: DataFrame, cached: Dataset[_]*): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val done = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit =
        if (qe.analyzed.find(_.sameResult(target)).isDefined &&
            done.compareAndSet(false, true)) {
          cached.foreach(_.unpersist(false))
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }

  /** Unpersist every RDD still pinned in the block store — the harness
    * sweep for the one cache [[releaseAfterUse]] cannot cover: an
    * iterative operator's final localCheckpoint (see
    * `Dedup.connectedComponents`), which is unrecomputable by design and
    * therefore must stay resident as long as its result might be
    * re-materialized. Call between independent materializations (Verify
    * and Bench both do per query) when every previously returned
    * DataFrame is dead. NOT safe while a checkpoint-backed result is
    * still awaiting (re-)use.
    */
  def releaseStragglers(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
