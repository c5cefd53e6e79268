package org.apache.spark.sql.graftbridge

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.{CachedRDDBuilder, InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache-lifecycle scoping for operators that cache an internal frame
  * feeding several branches of ONE result plan (dedup shingle sets,
  * LSH signatures): the operator returns a lazy DataFrame, so it has
  * no synchronous point at which to unpersist — by the time the
  * caller has executed the result, the operator is long gone. Without
  * scoping, a long-lived server session issuing repeated dedup
  * queries accumulates pinned cache blocks until the session dies
  * (the reference never hits this: its engine evaluates eagerly
  * inside one request, `lib/src/server/http/handlers/query.rs`).
  *
  * [[releaseAfterUse]] ties the cache's lifetime to the FIRST
  * completed execution that reads it: a QueryExecutionListener
  * watches for a query whose analyzed-with-cache plan contains this
  * cache entry (matched by `CachedRDDBuilder` identity — the cache
  * manager shares one builder across all `withOutput` copies of an
  * entry) and unpersists + deregisters itself. Success and failure
  * both release.
  *
  * Contract: the consumer executes the returned frame ONCE (the
  * server materializes each query result exactly once; Verify writes
  * once; Bench noop-writes once). A second execution recomputes
  * without the cache — correct, just not accelerated. A frame that is
  * never executed pins nothing: an unmaterialized cache entry holds
  * no blocks, only a plan-registry row.
  *
  * Lives in the `org.apache.spark.sql` namespace for
  * `InMemoryRelation`/`CachedRDDBuilder` access (private[sql]
  * surface), like [[ArrowBridge]].
  */
object CacheScope {

  /** Does reading `r` (directly or through nested cache layers) pull
    * on the entry identified by `b`? Caches can layer: an operator
    * that caches a frame built ON TOP of another scoped cache (e.g.
    * connectedComponents caching the pair frame over the shingle-set
    * cache) buries the inner InMemoryRelation inside the outer
    * entry's PHYSICAL cachedPlan, where a logical-plan scan never
    * sees it — so the match recurses through
    * InMemoryTableScanExec.relation as well.
    */
  private def relationUses(r: InMemoryRelation, b: CachedRDDBuilder): Boolean =
    (r.cacheBuilder eq b) || physicalUses(r.cacheBuilder.cachedPlan, b)

  /** Physical-side search: AQE wrappers and materialized query stages
    * are LEAF nodes exposing their real plan via fields, not
    * children, so a plain TreeNode traversal stops at them.
    */
  private def physicalUses(p: SparkPlan, b: CachedRDDBuilder): Boolean =
    p.exists {
      case s: InMemoryTableScanExec => relationUses(s.relation, b)
      case a: AdaptiveSparkPlanExec =>
        physicalUses(a.inputPlan, b) || physicalUses(a.executedPlan, b)
      case q: QueryStageExec => physicalUses(q.plan, b)
      case _ => false
    }

  private def builderOf(df: DataFrame): Option[CachedRDDBuilder] = {
    // a FRESH QueryExecution: the Dataset's own queryExecution may
    // have computed its lazy withCachedData before cache() registered
    // the entry, in which case it would never show the relation
    val ds = df.asInstanceOf[ClassicDataset[Row]]
    val qe = ds.sparkSession.sessionState.executePlan(ds.logicalPlan)
    qe.withCachedData.collectFirst {
      case r: InMemoryRelation => r.cacheBuilder
    }
  }

  /** Cache `df` and schedule it for unpersist after the first
    * completed downstream execution that reads the cache. Returns the
    * cached frame — use its return value in place of `df.cache()`.
    */
  def releaseAfterUse(df: DataFrame): DataFrame = {
    val cached = df.cache()
    // the entry registered by cache(): reading the frame's own
    // analyzed plan back through the cache manager yields the
    // InMemoryRelation wrapper whose builder identifies the entry
    builderOf(cached) match {
      case Some(b) => watch(cached, b)
      case None => // lookup failed (should not happen): stay unscoped
    }
    cached
  }

  /** Scope an ALREADY-cached frame (e.g. the survivor of an iterative
    * loop) the same way: unpersist after its first downstream use.
    */
  def releaseAfterUseExisting(cached: DataFrame): DataFrame =
    releaseAfterUseExisting(cached, () => ())

  /** [[releaseAfterUseExisting]] with a post-release hook, run once
    * after the unpersist: the place to drop auxiliary state the
    * frame's recompute path pinned (e.g. the closure loop's reliable
    * checkpoint files — load-bearing for fault tolerance until the
    * first execution completes, garbage after it, exactly like the
    * cache blocks themselves under the execute-once server contract).
    */
  def releaseAfterUseExisting(cached: DataFrame, onRelease: () => Unit): DataFrame = {
    builderOf(cached).foreach(b => watch(cached, b, onRelease))
    cached
  }

  private def watch(cached: DataFrame, b: CachedRDDBuilder,
      onRelease: () => Unit = () => ()): Unit = {
    val spark = cached.sparkSession
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def maybeRelease(qe: QueryExecution): Unit = {
        // builder identity, not plan equality: the cache manager hands
        // each reader a withOutput copy of the relation, but all copies
        // share the one CachedRDDBuilder
        val usesThisCache =
          try qe.withCachedData.exists {
            case r: InMemoryRelation => relationUses(r, b)
            case _ => false
          } catch { case _: Throwable => false }
        if (usesThisCache && done.compareAndSet(false, true)) {
          try cached.unpersist()
          finally {
            try onRelease()
            catch { case _: Throwable => () }
            finally spark.listenerManager.unregister(this)
          }
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
  }
}
