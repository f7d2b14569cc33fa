package graft.streaming

import graft.core.{ArrayMeta, DeisaArray}
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Structured-Streaming chunk assembly — the production ingest path.
  *
  * A stream of ChunkRows (any source: MemoryStream in tests, files/Kafka in
  * production) is consumed in micro-batches via foreachBatch. Each batch is
  * persisted ON THE EXECUTORS; the driver pulls only per-(array, timestep)
  * chunk COUNTS (a few rows), decides completeness against the catalog, and
  * hands the executor a lazy DataFrame over the cached batches — chunk data
  * itself never moves to the driver, so the design holds when a chunk is
  * 100 MB and there are a million of them.
  *
  * This replaces the reference's two-tier SchedulingActor → HeadNodeActor
  * rendezvous (`scheduling_actor.py:230-320`, `head_node.py:305-395`): in
  * Spark a single completeness count per (name, t) suffices, and locality
  * comes from the block cache instead of actor placement.
  *
  * Cached source batches are reference-counted: once every (name, t) group a
  * batch contributed to has been assembled (and the assembled window array
  * itself persisted), the batch is unpersisted — the memory-release protocol
  * the reference pins with its zero-spill test.
  */
final class StreamingAssembler(
    executor: WindowedExecutor,
    arrays: Seq[ArrayMeta],
    completenessDeadlineMs: Long = 0 // 0 = disabled
) {
  private val metas: Map[String, ArrayMeta] =
    (arrays :+ ArrayMeta.SentinelMeta).map(m => m.name -> m).toMap

  private final class BatchRef(val df: DataFrame) {
    var pendingGroups: Int = 0
    def release(): Unit = { pendingGroups -= 1; if (pendingGroups <= 0) df.unpersist() }
  }
  private final class GroupState {
    val positions = mutable.Set.empty[List[Int]]
    val contributors = mutable.ArrayBuffer.empty[BatchRef]
    val openedAt: Long = System.currentTimeMillis()
    var dtype: String = "float64"
  }
  private val groups = mutable.Map.empty[(String, Long), GroupState]

  // Exactly-once per batch id: foreachBatch is at-least-once — after a
  // sink/driver hiccup Structured Streaming re-delivers the last batch
  // with the SAME id on restart. Without this watermark a replay would
  // trip the duplicate-position hard-fail (positions already registered)
  // or, for a completed timestep, re-offer the array and violate the D3
  // ordering contract. Re-delivered ids are absorbed as no-ops instead —
  // the standard foreachBatch idempotence recipe (ids are monotone within
  // a query). The id is advanced only after SUCCESSFUL processing: replay
  // after a failed batch is deliberately NOT absorbed, because a failure
  // poisons this assembler (hard-fail contract) — rebuild it fresh.
  // Pinned by StreamingSpec's replay test.
  private var lastProcessedBatchId: Long = -1L

  def attach(chunkStream: DataFrame, queryName: String = "graft-ingest"): StreamingQuery =
    chunkStream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch(processBatch _)
      .start()

  /** One micro-batch: record the arrived chunk POSITIONS per (name, t)
    * (positions, not counts — a duplicate must never mask a missing
    * chunk), then offer completed arrays to the windowed executor in
    * timestep order. Only grid coordinates travel to the driver. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= lastProcessedBatchId) return // replayed batch: absorbed
    val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
    val stats = cached.groupBy(F.col("name"), F.col("t"))
      .agg(F.collect_list(F.col("pos")).as("positions"),
        // per-timestep dtype rides with the chunks (reference allows the
        // dtype to change between timesteps, types.py:654-673); chunks of
        // one (name, t) share it, so first() is exact
        F.first(F.col("dtype")).as("dtype"))
      .collect()
      .sortBy(r => (r.getLong(1), r.getString(0))) // timestep order (D1)
    if (stats.isEmpty) { cached.unpersist(); lastProcessedBatchId = batchId; return }
    val ref = new BatchRef(cached)
    try { processStats(stats, ref); lastProcessedBatchId = batchId }
    catch {
      case e: Throwable =>
        // a failed batch fails the whole query (hard-fail contract); its
        // cache must not outlive it — unpersist is idempotent, so releasing
        // here is safe even if some groups already emitted and released
        cached.unpersist()
        throw e
    }
  }

  private def processStats(stats: Array[org.apache.spark.sql.Row],
      ref: BatchRef): Unit = {
    // first pass: register contributions
    stats.foreach { r =>
      val name = r.getString(0); val t = r.getLong(1)
      val positions = r.getSeq[scala.collection.Seq[Int]](2).map(_.toList)
      val meta = metas.getOrElse(name, throw new IllegalArgumentException(
        s"ContractError: array '$name' was not declared"))
      val g = groups.getOrElseUpdate((name, t), new GroupState)
      g.dtype = r.getString(3)
      positions.foreach { p =>
        if (!g.positions.add(p))
          throw new IllegalStateException(
            s"array '$name' t=$t received duplicate chunk position $p " +
              s"(expected ${meta.numChunks} distinct positions)")
      }
      g.contributors += ref
      ref.pendingGroups += 1
    }
    // second pass: emit completed groups in timestep order; the sentinel
    // must go LAST within its timestep (its name sorts before typical
    // array names, and offering it first would terminate the executor
    // before the final timestep's data arrays)
    val completed = groups.toSeq
      .filter { case ((name, _), g) => g.positions.size.toLong == metas(name).numChunks }
      .sortBy { case ((name, t), _) =>
        (t, name == ArrayMeta.LastIterationArray, name) }
    completed.foreach { case ((name, t), g) =>
      groups.remove((name, t))
      val source =
        if (g.contributors.size == 1) g.contributors.head.df
        else g.contributors.map(_.df).reduce(_ union _)
      val arr = DeisaArray.fromChunkRows(source, metas(name), t, g.dtype)
      executor.offer(arr) // persists into the window before we release sources
      g.contributors.foreach(_.release())
    }
    checkDeadlines()
  }

  /** Under-subscription hard-fail (reference startup contract: the engine
    * refuses to run when fewer ranks join than the declared grid within the
    * discovery deadline, `utils.py:67-113`, `tests/test_startup_order.py`).
    * A (name, t) group still incomplete `completenessDeadlineMs` after its
    * first chunk arrived raises, naming the missing grid positions —
    * instead of stalling the pipeline forever on a silent gap. Checked at
    * every micro-batch; callable directly from a watchdog. */
  def checkDeadlines(): Unit = synchronized {
    if (completenessDeadlineMs <= 0) return
    val now = System.currentTimeMillis()
    groups.foreach { case ((name, t), g) =>
      if (now - g.openedAt > completenessDeadlineMs) {
        val meta = metas(name)
        throw new IllegalStateException(
          s"array '$name' t=$t is still incomplete after ${completenessDeadlineMs} ms: " +
            s"${g.positions.size} of ${meta.numChunks} chunks arrived — " +
            "not enough ranks joined (under-subscribed grid or a dead writer)")
      }
    }
  }

  /** Release every cached batch still referenced by incomplete groups —
    * call when tearing down an ingest whose stream ended mid-timestep
    * (otherwise those batches stay persisted; a failed batch fails the
    * whole query, matching the engine's hard-fail ordering contract). */
  def shutdown(): Unit = synchronized {
    groups.values.flatMap(_.contributors).toSet[BatchRef].foreach(_.df.unpersist())
    groups.clear()
  }
}
