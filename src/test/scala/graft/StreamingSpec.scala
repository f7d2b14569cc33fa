package graft

import graft.core._
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The production ingest path end-to-end: a Structured Streaming source of
  * ChunkRows (MemoryStream plays the simulation bridges, as SURVEY §2.A
  * maps them) → micro-batch completeness counting → windowed callbacks. */
class StreamingSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()

  test("structured-streaming ingest: full workflow via MemoryStream bridges") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[ChunkRow]
    val ex = new WindowedExecutor(spark, Seq(meta))
    val assembler = new StreamingAssembler(ex, Seq(meta))
    var seen = List.empty[(Long, Double)]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val a = args("array").last
      assert(a.dtype == "int64", "per-timestep chunk dtype must ride through assembly")
      seen ::= (a.t, a.meanScalar().compute())
    }
    val query = assembler.attach(stream.toDF(), "graft-test-ingest")
    try {
      // ranks send chunk-by-chunk; micro-batch boundaries land arbitrarily
      for (t <- 0L until 4L) {
        stream.addData(ChunkRow("array", t, Seq(0, 0), Seq(1, 1), Array(t.toDouble), "int64"))
        if (t % 2 == 1) query.processAllAvailable() // split timesteps across batches
        stream.addData(ChunkRow("array", t, Seq(0, 1), Seq(1, 1), Array(2.0 * t), "int64"))
      }
      stream.addData(ChunkRow.sentinel(4))
      query.processAllAvailable()
    } finally query.stop()
    assert(ex.isTerminated && ex.closingTimestep.contains(4L))
    assert(seen.reverse == (0L until 4L).map(t => (t, 3.0 * t / 2)).toList)
    ex.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "streaming batches and window members must all be released")
  }

  test("sentinel arriving in the same micro-batch as final data flushes data first") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[ChunkRow]
    val ex = new WindowedExecutor(spark, Seq(meta))
    val assembler = new StreamingAssembler(ex, Seq(meta))
    var seen = List.empty[Long]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      seen ::= args("array").last.t
    }
    val query = assembler.attach(stream.toDF(), "graft-test-sentinel")
    try {
      // final timestep's chunks AND the close sentinel land in ONE batch;
      // the sentinel name sorts lexicographically before "array"
      stream.addData(
        ChunkRow("array", 0, Seq(0, 0), Seq(1, 1), Array(1.0), "int64"),
        ChunkRow("array", 0, Seq(0, 1), Seq(1, 1), Array(2.0), "int64"),
        ChunkRow.sentinel(1))
      query.processAllAvailable()
    } finally query.stop()
    assert(ex.isTerminated)
    assert(seen == List(0L), "the final timestep's callback must fire before termination")
    ex.shutdown()
    assembler.shutdown()
  }

  test("long streaming run keeps cached data bounded (zero-spill analogue)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = ArrayMeta("stream", Seq(2, 2), Seq(1, 1)).validate()
    val stream = MemoryStream[ChunkRow]
    val ex = new WindowedExecutor(spark, Seq(m))
    val assembler = new StreamingAssembler(ex, Seq(m))
    var fired = 0
    ex.registerCallback(Seq(ArrayWindow("stream"))) { _ => fired += 1 }
    val query = assembler.attach(stream.toDF(), "graft-test-bounded")
    try {
      for (t <- 0L until 40L) {
        for (r <- 0 until 4)
          stream.addData(ChunkRow("stream", t, Seq(r / 2, r % 2), Seq(1, 1),
            Array(t.toDouble), "float64"))
        query.processAllAvailable()
        // reference invariant (test_memory_release): a long run must not
        // accumulate cached state — at most the live window member, the
        // open batch's array, and the current source batch
        val cached = spark.sparkContext.getPersistentRDDs.size
        assert(cached <= 6, s"t=$t: $cached cached RDDs — caches are leaking")
      }
      stream.addData(ChunkRow.sentinel(40))
      query.processAllAvailable()
    } finally query.stop()
    assert(fired == 40)
    ex.shutdown(); assembler.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("under-subscribed grid hard-fails after the completeness deadline") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = ArrayMeta("grid", Seq(1, 3), Seq(1, 1)).validate() // 3 ranks expected
    val stream = MemoryStream[ChunkRow]
    val ex = new WindowedExecutor(spark, Seq(m), persistWindows = false)
    val assembler = new StreamingAssembler(ex, Seq(m), completenessDeadlineMs = 200)
    ex.registerCallback(Seq(ArrayWindow("grid"))) { _ => () }
    val query = assembler.attach(stream.toDF(), "graft-test-deadline")
    try {
      // only 2 of 3 declared ranks ever send
      stream.addData(
        ChunkRow("grid", 0, Seq(0, 0), Seq(1, 1), Array(1.0), "float64"),
        ChunkRow("grid", 0, Seq(0, 1), Seq(1, 1), Array(2.0), "float64"))
      query.processAllAvailable()
      Thread.sleep(300)
      // next batch (any progress) trips the deadline check
      stream.addData(ChunkRow("grid", 1, Seq(0, 0), Seq(1, 1), Array(1.0), "float64"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(s => s.contains("not enough ranks joined") &&
        s.contains("2 of 3")), msgs(e).mkString(" | "))
    } finally query.stop()
    assembler.shutdown()
  }

  test("replayed micro-batch (same batch id) is absorbed exactly-once") {
    // foreachBatch is at-least-once: after a sink/driver hiccup the SAME
    // batch id is re-delivered on restart. The assembler must absorb the
    // replay as a no-op — no duplicate-position hard-fail for a
    // still-open group, no re-fired callback or D3 ordering violation for
    // a completed one. (Replay after a FAILED batch is deliberately not
    // absorbed: a failure poisons the assembler, hard-fail contract.)
    import spark.implicits._
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val assembler = new StreamingAssembler(ex, Seq(meta))
    var fired = List.empty[Long]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      fired ::= args("array").last.t
    }
    val b0 = Seq(ChunkRow("array", 0, Seq(0, 0), Seq(1, 1), Array(1.0), "float64")).toDF()
    assembler.processBatch(b0, 0L)
    // replay while the t=0 group is still open: would be a duplicate
    // position without the batch-id watermark
    assembler.processBatch(b0, 0L)
    val b1 = Seq(ChunkRow("array", 0, Seq(0, 1), Seq(1, 1), Array(2.0), "float64")).toDF()
    assembler.processBatch(b1, 1L)
    // sentinel flushes t=0 (D1 one-step lag) and terminates the executor
    assembler.processBatch(Seq(ChunkRow.sentinel(1)).toDF(), 2L)
    assert(fired == List(0L), "completing t=0 fires the callback exactly once")
    // replay of the completed batch: absorbed — re-offering t=0 into the
    // now-terminated executor would throw, and the callback must not refire
    assembler.processBatch(b1, 1L)
    assert(fired == List(0L) && ex.isTerminated)
    ex.shutdown(); assembler.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "absorbed replays must not leak cached batches")
  }

  test("chunk-count overflow is rejected (duplicate chunk guard)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[ChunkRow]
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val assembler = new StreamingAssembler(ex, Seq(meta))
    ex.registerCallback(Seq(ArrayWindow("array"))) { _ => () }
    val query = assembler.attach(stream.toDF(), "graft-test-dup")
    try {
      stream.addData(
        ChunkRow("array", 0, Seq(0, 0), Seq(1, 1), Array(1.0), "int64"),
        ChunkRow("array", 0, Seq(0, 0), Seq(1, 1), Array(1.0), "int64"),
        ChunkRow("array", 0, Seq(0, 1), Seq(1, 1), Array(2.0), "int64"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("expected"), e.getCause.getMessage)
    } finally {
      query.stop()
      // the failed batch's cache is still referenced by the poisoned group;
      // teardown must release it (the API contract for a failed ingest)
      assembler.shutdown()
    }
  }
}
