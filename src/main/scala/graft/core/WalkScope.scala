package graft.core

import org.apache.spark.sql.{DataFrame, GraftSqlShim}

/** Deterministic release of an iterative walk's materialized state.
  *
  * Iterative DataFrame walks ([[graft.pipeline.KnnGraph.search]])
  * MUST `localCheckpoint(true)` per hop
  * (lineage truncation — see the CLAUDE.md gotcha: plain `persist` leaves
  * the composite plan growing exponentially in hops). But checkpoint
  * persistence is RDD-level: it bypasses the CacheManager, so
  * `spark.catalog.clearCache()` never frees it, and without an explicit
  * release the blocks linger until the GC-driven ContextCleaner happens to
  * collect the dropped references — which is NONdeterministic and trips
  * the memory-discipline contracts (`getPersistentRDDs.isEmpty`) of
  * long-running streaming services and their specs.
  *
  * A WalkScope tracks every checkpoint/persist a walk creates and frees
  * them all in [[release]]. Contract: callers materialize whatever they
  * intend to keep (collect / write / re-checkpoint) BEFORE releasing —
  * checkpointed lineage is truncated, so released rows are unrecoverable,
  * and a post-release action on a plan over them fails rather than
  * silently recomputing.
  */
final class WalkScope {
  private val tracked = scala.collection.mutable.ArrayBuffer[() => Unit]()

  /** Eager localCheckpoint with the checkpointed blocks registered for
    * release. */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    GraftSqlShim.checkpointedRdd(cp)
      .foreach(r => tracked += (() => r.unpersist(blocking = false)))
    cp
  }

  /** CacheManager-level persist registered for release (idempotent with a
    * caller's own `clearCache()`). */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    tracked += (() => df.unpersist(blocking = false))
    df
  }

  /** Free every tracked block; safe to call more than once. */
  def release(): Unit = {
    tracked.foreach(_())
    tracked.clear()
  }
}
