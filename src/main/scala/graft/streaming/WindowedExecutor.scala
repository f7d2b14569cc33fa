package graft.streaming

import graft.core.{ArrayMeta, ChunkRow, DeisaArray}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Request the latest `size` timesteps of array `name` in a callback
  * (reference `types.py:180-201`). */
final case class ArrayWindow(name: String, size: Int = 1) {
  require(size >= 1, "window size must be >= 1")
}

/** Trigger mode for multi-array callbacks (reference `window_handler.py:432-453`):
  * `All` (AND) fires only when every requested array got a new share in the
  * batch; `AnyOf` (OR) fires when at least one did AND every array has been
  * seen at least once (stale windows are reused). */
sealed trait When
case object All extends When
case object AnyOf extends When

final case class CallbackConfig(
    windows: Seq[ArrayWindow],
    when: When,
    handler: Map[String, Seq[DeisaArray]] => Unit,
    exceptionHandler: Throwable => Unit
)

/** The analytics orchestration loop — Spark-native port of the reference's
  * `WindowHandler`/`Deisa.execute_callbacks` (`window_handler.py:295-453`).
  *
  * Semantics preserved exactly (SURVEY §2.D):
  *  - D1  timestep batching: arrays accumulate for timestep t; the first
  *        array arriving with t' > t closes batch t, fires callbacks, and
  *        the boundary array is re-applied to the new batch — analytics runs
  *        exactly one timestep behind the stream.
  *  - D2  per-array sliding windows (deques of the max requested size),
  *        shorter than `size` during warm-up.
  *  - D3  ordering enforcement: an arriving timestep below the current batch
  *        raises ("Logical flow of data was violated"); no late-data
  *        tolerance, matching the reference rather than Spark's
  *        drop-late-rows default.
  *  - D4  AND/OR trigger matrix.
  *  - D5  the first observed timestep may be anything.
  *  - D9  a chunk for the reserved sentinel array flushes the final batch
  *        and terminates.
  *  - D10 per-callback exception policy: assertion/interrupt errors
  *        propagate, everything else goes to the pluggable handler.
  *  - D11 callbacks are evaluated in registration order and share effects.
  *
  * Memory discipline (reference `test_memory_release.py` invariant): every
  * assembled array is persisted on entry to its window and unpersisted when
  * it slides out — nothing stays cached after eviction.
  */
final class WindowedExecutor(
    val spark: SparkSession,
    arrays: Seq[ArrayMeta],
    val feedback: FeedbackService = new FeedbackService(),
    persistWindows: Boolean = true
) {
  arrays.foreach(_.validate())
  private val metas: Map[String, ArrayMeta] =
    (arrays :+ ArrayMeta.SentinelMeta).map(m => m.name -> m).toMap

  private val callbacks = mutable.ArrayBuffer.empty[CallbackConfig]
  // sliding windows, oldest -> newest (D2)
  private val windows = mutable.Map.empty[String, mutable.ArrayDeque[DeisaArray]]
  private val maxWindow = mutable.Map.empty[String, Int].withDefaultValue(1)
  private val everSeen = mutable.Set.empty[String]
  // batch state (D1)
  private var currentT: Option[Long] = None
  private val updatedInBatch = mutable.Set.empty[String]
  private val pendingBatch = mutable.ArrayBuffer.empty[DeisaArray]
  private var terminated = false
  private var closingT: Option[Long] = None

  def registerCallback(
      windowSpecs: Seq[ArrayWindow],
      when: When = All,
      exceptionHandler: Throwable => Unit = defaultExceptionHandler
  )(handler: Map[String, Seq[DeisaArray]] => Unit): Unit = synchronized {
    require(windowSpecs.nonEmpty, "callback must request at least one array")
    windowSpecs.foreach { w =>
      require(metas.contains(w.name), s"unknown array '${w.name}' — declare it in the executor's metadata")
      maxWindow(w.name) = math.max(maxWindow(w.name), w.size)
    }
    callbacks += CallbackConfig(windowSpecs, when, handler, exceptionHandler)
  }

  private def defaultExceptionHandler(e: Throwable): Unit =
    e.printStackTrace(System.err)

  def isTerminated: Boolean = synchronized(terminated)
  def closingTimestep: Option[Long] = synchronized(closingT)

  /** Offer one fully-assembled array (the completeness aggregation upstream
    * guarantees all chunks are present). FIFO order across arrays of one
    * timestep is preserved; crossing into a later timestep flushes. */
  def offer(arr: DeisaArray): Unit = synchronized {
    require(!terminated, "executor already terminated by the end-of-stream sentinel")
    if (arr.name == ArrayMeta.LastIterationArray) {
      flushBatch()
      closingT = Some(arr.t)
      terminated = true
      return
    }
    currentT match {
      case Some(t) if arr.t < t =>
        throw new RuntimeException(
          s"Logical flow of data was violated: received timestep ${arr.t} while processing $t")
      case Some(t) if arr.t > t =>
        flushBatch()
        startBatch(arr)
      case Some(_) => addToBatch(arr)
      case None => startBatch(arr)
    }
  }

  private def startBatch(arr: DeisaArray): Unit = {
    currentT = Some(arr.t)
    addToBatch(arr)
  }

  private def addToBatch(arr: DeisaArray): Unit = {
    // persist eagerly: upstream (e.g. StreamingAssembler) may release its
    // cached source batches as soon as offer() returns
    pendingBatch += (if (persistWindows) arr.persist() else arr)
    updatedInBatch += arr.name
  }

  /** Close the current batch: push arrays into their windows (evicting and
    * unpersisting expired members) and evaluate callbacks (D4, D10, D11). */
  private def flushBatch(): Unit = {
    if (currentT.isEmpty) return
    pendingBatch.foreach { arr =>
      val q = windows.getOrElseUpdate(arr.name, mutable.ArrayDeque.empty)
      q.append(arr)
      everSeen += arr.name
      while (q.size > maxWindow(arr.name)) {
        val evicted = q.removeHead()
        if (persistWindows) evicted.unpersist()
      }
    }
    callbacks.foreach { cb =>
      if (shouldFire(cb)) {
        val args: Map[String, Seq[DeisaArray]] = cb.windows.map { w =>
          w.name -> windows(w.name).takeRight(w.size).toSeq
        }.toMap
        try cb.handler(args)
        catch {
          case e @ (_: AssertionError | _: InterruptedException) => throw e
          case e: Throwable => cb.exceptionHandler(e)
        }
      }
    }
    pendingBatch.clear()
    updatedInBatch.clear()
    currentT = None
  }

  private def shouldFire(cb: CallbackConfig): Boolean = {
    val names = cb.windows.map(_.name)
    cb.when match {
      case All => names.forall(updatedInBatch.contains)
      case AnyOf =>
        names.exists(updatedInBatch.contains) && names.forall(everSeen.contains)
    }
  }

  /** Remaining persisted window members, for the memory-discipline check. */
  def liveWindowArrays: Seq[DeisaArray] = synchronized {
    windows.values.flatten.toSeq
  }

  /** Drop every window and unpersist its members (end-of-run cleanup). */
  def shutdown(): Unit = synchronized {
    if (persistWindows) windows.values.flatten.foreach(_.unpersist())
    windows.clear()
  }
}

/** Driver-side chunk assembly: accumulates chunk rows per (array, timestep)
  * and forwards completed arrays to the executor in arrival order — the
  * single-process equivalent of the reference's two-tier
  * SchedulingActor/HeadNodeActor completeness rendezvous (SURVEY §2.B: in
  * Spark one completeness count suffices, there is no actor topology).
  */
final class LocalAssembler(executor: WindowedExecutor, arrays: Seq[ArrayMeta]) {
  private val metas: Map[String, ArrayMeta] =
    (arrays :+ ArrayMeta.SentinelMeta).map(m => m.name -> m).toMap
  private val pending = mutable.Map.empty[(String, Long), mutable.ArrayBuffer[ChunkRow]]

  /** Push one chunk; assembles + offers the array when every chunk-grid
    * POSITION has arrived (a duplicate position is rejected immediately —
    * counting alone would let a duplicate mask a missing chunk and emit a
    * silently corrupt array). Throws for undeclared arrays (the
    * reference's ContractError, `scheduling_actor.py:281-287`). */
  def push(chunk: ChunkRow): Unit = synchronized {
    val meta = metas.getOrElse(chunk.name,
      throw new IllegalArgumentException(
        s"ContractError: array '${chunk.name}' was not declared"))
    meta.validatePosition(chunk.pos)
    require(chunk.shape == meta.chunkShape,
      s"chunk shape ${chunk.shape} != declared ${meta.chunkShape} for '${chunk.name}'")
    require(chunk.data.length == meta.chunkShape.product,
      s"chunk payload ${chunk.data.length} != declared size ${meta.chunkShape.product}")
    val key = (chunk.name, chunk.t)
    val buf = pending.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
    if (buf.exists(_.pos == chunk.pos))
      throw new IllegalStateException(
        s"duplicate chunk position ${chunk.pos} for array '${chunk.name}' t=${chunk.t}")
    buf += chunk
    if (buf.length.toLong == meta.numChunks) {
      pending.remove(key)
      executor.offer(DeisaArray.fromChunks(executor.spark, buf.toSeq, meta, chunk.t))
    }
  }

  /** Collective close: rank 0 sends the sentinel (reference
    * `bridge.py:425-459`). */
  def close(t: Long): Unit = push(ChunkRow.sentinel(t))
}
