package graft

import java.nio.file.Files

import graft.core._
import graft.sources.{FileBridge, FileChunkSource}
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
    var seen = List.empty[(Long, Double)]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val a = args("array").last
      seen ::= (a.t, a.meanScalar().compute())
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
    ex.shutdown(); assembler.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "spooled batches and window members must all be released")
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
