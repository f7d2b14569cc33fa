package graft

import java.nio.file.Files

import graft.core._
import graft.sources.{FileBridge, FileChunkSource, FileFeedbackPublisher}
import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ingest across a real process boundary: Spark-free FileBridge
  * writers spool chunk files (atomic rename), Spark's file streaming source
  * discovers them, and the assembler/executor run the canonical 2-rank
  * workflow — the cross-process analogue of StreamingSpec's MemoryStream
  * path (reference `bridge.py:343-407` semantics: either side can start
  * first, chunks arrive rank-interleaved, rank 0 closes collectively). */
class FileIngestSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()

  test("file-spool ingest: full 2-rank workflow with staged discovery") {
    val spool = Files.createTempDirectory("graft-spool")
    // writers exist BEFORE the reader attaches (either side may start first)
    val bridge0 = new FileBridge(spool, 0, Seq(meta), Map("array" -> Seq(0, 0)))
    val bridge1 = new FileBridge(spool, 1, Seq(meta), Map("array" -> Seq(0, 1)))
    // first two timesteps are already spooled before the reader starts —
    // the file source must pick up pre-existing files
    for (t <- 0L until 2L) {
      bridge0.send("array", Array(t.toDouble), t)
      bridge1.send("array", Array(2.0 * t), t)
    }
    val ex = new WindowedExecutor(spark, Seq(meta))
    val assembler = new StreamingAssembler(ex, Seq(meta))
    // analytics publishes each timestep's mean as cross-process feedback —
    // the reverse channel the simulation steers on (reference feedback loop)
    val feedback = new FileFeedbackPublisher(spool)
    var seen = List.empty[(Long, Double)]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val a = args("array").last
      val m = a.meanScalar().compute()
      seen ::= (a.t, m)
      feedback.set("mean", m, a.t)
    }
    val query = assembler.attach(
      FileChunkSource.stream(spark, spool.toString), "graft-file-ingest")
    try {
      query.processAllAvailable()
      // remaining timesteps land while the query is live, split so that a
      // timestep's two chunks straddle a micro-batch boundary
      bridge0.send("array", Array(2.0), 2L)
      query.processAllAvailable()
      bridge1.send("array", Array(4.0), 2L)
      bridge0.send("array", Array(3.0), 3L)
      bridge1.send("array", Array(6.0), 3L)
      bridge1.close(4L) // non-zero rank: no-op
      bridge0.close(4L)
      query.processAllAvailable()
    } finally query.stop()
    assert(ex.isTerminated && ex.closingTimestep.contains(4L))
    assert(seen.reverse == (0L until 4L).map(t => (t, 3.0 * t / 2)).toList)
    // the writer process reads analytics' feedback back: callbacks run one
    // timestep behind, so while the sim is at t it steers on t-1 (here:
    // everything through the final processed timestep is visible, and both
    // ranks observe identical values — the spool dir is the bcast medium)
    assert(bridge0.get("mean", 2L).contains(3.0))
    assert(bridge1.get("mean", 2L).contains(3.0))
    assert(bridge0.get("mean", 9L).isEmpty) // never published -> found=false
    assert(bridge0.getAll("mean") == (0L until 4L).map(t => (t, 3.0 * t / 2)))
    ex.shutdown(); assembler.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "spooled batches and window members must all be released")
  }

  test("feedback protocol: scalar round-trips, guards, bounded retention") {
    val spool = Files.createTempDirectory("graft-spool-fb")
    val b = new FileBridge(spool, 0, Seq(meta), Map("array" -> Seq(0, 0)))
    assert(b.get("steer", 0L).isEmpty) // channel not even created yet
    val pub = new FileFeedbackPublisher(spool)
    // every supported scalar type round-trips with its type class
    pub.set("steer", 0.5, 0L)
    pub.set("steer", 3L, 1L)
    pub.set("note", "cool \"down\"\n", 1L)
    pub.set("flag", true, 1L)
    pub.set("none", null, 1L)
    assert(b.get("steer", 0L).contains(0.5))
    assert(b.get("steer", 1L).contains(3L))
    assert(b.get("note", 1L).contains("cool \"down\"\n"))
    assert(b.get("flag", 1L).contains(true))
    assert(b.get("none", 1L).contains(null)) // found=true, value=null is legal
    assert(b.get("steer", 2L).isEmpty && b.get("ghost", 0L).isEmpty)
    // strictly-increasing timesteps per key, same as the in-process service
    intercept[IllegalArgumentException] { pub.set("steer", 9.9, 1L) }
    // non-scalar values rejected before anything is spooled
    intercept[IllegalArgumentException] { pub.set("steer", Seq(1, 2), 5L) }
    // bounded retention: oldest entries beyond queueSize are deleted
    val spool2 = Files.createTempDirectory("graft-spool-fb2")
    val small = new FileFeedbackPublisher(spool2, queueSize = 2)
    val b2 = new FileBridge(spool2, 0, Seq(meta), Map("array" -> Seq(0, 0)))
    for (t <- 0L until 5L) small.set("k", t.toDouble, t)
    assert(b2.get("k", 0L).isEmpty, "evicted")
    assert(b2.getAll("k") == Seq((3L, 3.0), (4L, 4.0)))
  }

  test("json line round-trips exact double bits and contract validation holds") {
    val spool = Files.createTempDirectory("graft-spool-rt")
    val m = ArrayMeta("a", Seq(1, 1), Seq(1, 1)).validate()
    val b = new FileBridge(spool, 0, Seq(m), Map("a" -> Seq(0, 0)))
    // values chosen to stress the codec: subnormal, negative, many digits
    val v = Array(1.0 / 3.0)
    b.send("a", v, 7L)
    import org.apache.spark.sql.functions.col
    val rows = spark.read.schema(ChunkRow.schema)
      .json(spool.toString).filter(col("name") === "a").collect()
    assert(rows.length == 1)
    assert(rows(0).getSeq[Double](4) == Seq(1.0 / 3.0)) // bit-exact
    assert(rows(0).getLong(1) == 7L)
    // A1 contract: undeclared array / bad position rejected at the writer
    intercept[IllegalArgumentException] { b.send("ghost", Array(1.0), 0L) }
    intercept[IllegalArgumentException] {
      new FileBridge(spool, 0, Seq(m), Map("a" -> Seq(0, 5)))
    }
  }
}
