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

  /** LAZY localCheckpoint with the checkpoint RDD registered for release:
    * the caller's next job materializes the blocks (one job per step — the
    * Bpe.train discipline) while the returned plan is already an O(1)
    * LogicalRDD. Same release contract as [[checkpoint]]. */
  def checkpointLazy(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(false)
    GraftSqlShim.checkpointedRdd(cp)
      .foreach(r => tracked += (() => r.unpersist(blocking = false)))
    cp
  }

  /** Release ONE tracked table's blocks before the scope ends — the
    * rolling-release shape of sequential trainers (step k−1 frees once
    * step k is materialized). Idempotent with [[release]]. */
  def releaseEarly(df: DataFrame): Unit =
    GraftSqlShim.checkpointedRdd(df)
      .foreach(_.unpersist(blocking = false))

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
