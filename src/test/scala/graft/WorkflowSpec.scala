package graft

import graft.core._
import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's end-to-end semantic pins (SURVEY §5):
  * full workflow closed forms, sliding windows, AND/OR matrix, ordering
  * violation, start-at-any-timestep, multiple callbacks with shared state,
  * feedback round trip, memory discipline. */
class WorkflowSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()

  /** Canonical 2-rank fixture: chunk r at timestep t holds t*(r+1), so the
    * global array is [[t, 2t]] (reference tests/test_full_workflow.py). */
  private def sendTimestep(asm: LocalAssembler, t: Long, name: String = "array"): Unit =
    for (r <- 0 to 1)
      asm.push(ChunkRow(name, t, Seq(0, r), Seq(1, 1), Array((t * (r + 1)).toDouble), "int64"))

  test("full workflow: mean == 3t/2 for every timestep (test_full_workflow)") {
    val ex = new WindowedExecutor(spark, Seq(meta))
    val asm = new LocalAssembler(ex, Seq(meta))
    var seen = List.empty[(Long, Double)]
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val a = args("array").last
      seen ::= (a.t, a.meanScalar().compute())
    }
    for (t <- 0L until 5L) sendTimestep(asm, t)
    asm.close(5)
    assert(seen.reverse == (0L until 5L).map(t => (t, 3.0 * t / 2)).toList)
    ex.shutdown()
  }

  test("sliding window: warm-up, per-member sums, cross-timestep diff (test_sliding_window)") {
    val ex = new WindowedExecutor(spark, Seq(meta))
    val asm = new LocalAssembler(ex, Seq(meta))
    var checks = 0
    ex.registerCallback(Seq(ArrayWindow("array", 2))) { args =>
      val w = args("array")
      if (w.last.t == 0) assert(w.length == 1)
      else {
        assert(w(0).sumScalar().compute() == 3.0 * w(0).t)
        assert(w(1).sumScalar().compute() == 3.0 * w(1).t)
        assert((w(1) - w(0)).sumScalar().compute() == 3.0)
        checks += 1
      }
    }
    for (t <- 0L until 5L) sendTimestep(asm, t)
    asm.close(5)
    assert(checks == 4)
    ex.shutdown()
  }

  test("AND/OR matrix: alternating exposure fires OR 4x, AND 0x (test_when)") {
    val m1 = ArrayMeta("array1", Seq(1, 2), Seq(1, 1))
    val m2 = ArrayMeta("array2", Seq(1, 2), Seq(1, 1))
    val ex = new WindowedExecutor(spark, Seq(m1, m2), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(m1, m2))
    var orCount = 0; var andCount = 0
    ex.registerCallback(Seq(ArrayWindow("array1"), ArrayWindow("array2")), AnyOf) { _ => orCount += 1 }
    ex.registerCallback(Seq(ArrayWindow("array1"), ArrayWindow("array2")), All) { _ => andCount += 1 }
    // t: 0..4; array1 on even t, array2 on odd t — never together
    for (t <- 0L until 5L)
      sendTimestep(asm, t, if (t % 2 == 0) "array1" else "array2")
    asm.close(5)
    assert(orCount == 4, s"OR should fire 4x (suppressed at t=0), got $orCount")
    assert(andCount == 0, s"AND should never fire, got $andCount")
    ex.shutdown()
  }

  test("AND/OR counts match when all arrays update together (test_when control)") {
    val m1 = ArrayMeta("array1", Seq(1, 2), Seq(1, 1))
    val m2 = ArrayMeta("array2", Seq(1, 2), Seq(1, 1))
    val ex = new WindowedExecutor(spark, Seq(m1, m2), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(m1, m2))
    var orCount = 0; var andCount = 0
    ex.registerCallback(Seq(ArrayWindow("array1"), ArrayWindow("array2")), AnyOf) { _ => orCount += 1 }
    ex.registerCallback(Seq(ArrayWindow("array1"), ArrayWindow("array2")), All) { _ => andCount += 1 }
    for (t <- 0L until 5L) { sendTimestep(asm, t, "array1"); sendTimestep(asm, t, "array2") }
    asm.close(5)
    assert(orCount == andCount && andCount == 5)
    ex.shutdown()
  }

  test("ordering violation raises (test_sequential_consistency)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    ex.registerCallback(Seq(ArrayWindow("array"))) { _ => () }
    sendTimestep(asm, 2)
    val e = intercept[RuntimeException] { sendTimestep(asm, 1) }
    assert(e.getMessage.contains("Logical flow of data was violated"))
    ex.shutdown()
  }

  test("start at any timestep (test_start_any_timestep)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    var first = -1L
    ex.registerCallback(Seq(ArrayWindow("array", 2))) { args =>
      if (first < 0) { first = args("array").head.t; assert(args("array").length == 1) }
    }
    sendTimestep(asm, 3)
    asm.close(4)
    assert(first == 3L)
    ex.shutdown()
  }

  test("multiple callbacks run in order and share state (test_multiple_callbacks, test_exchange_data_between_cb)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    var exchanged: Option[Double] = None
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      order += "first"
      exchanged = Some(args("array").last.sumScalar().compute())
    }
    ex.registerCallback(Seq(ArrayWindow("array"))) { _ =>
      order += "second"
      assert(exchanged.contains(3.0)) // sees the earlier callback's effect
    }
    sendTimestep(asm, 1)
    asm.close(2)
    assert(order.toList == List("first", "second"))
    ex.shutdown()
  }

  test("callback exceptions go to the handler; assertion errors propagate (test_error_handler)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    var handled: Option[Throwable] = None
    var laterRan = false
    ex.registerCallback(Seq(ArrayWindow("array")),
      exceptionHandler = e => handled = Some(e)) { _ =>
      throw new IllegalStateException("boom")
    }
    ex.registerCallback(Seq(ArrayWindow("array"))) { _ => laterRan = true }
    sendTimestep(asm, 0)
    asm.close(1)
    assert(handled.exists(_.getMessage == "boom"))
    assert(laterRan, "later callbacks still run after a handled failure")
    ex.shutdown()
  }

  test("feedback round trip incl. visibility after close (test_feedback_loop)") {
    val fb = new FeedbackService(2)
    val ex = new WindowedExecutor(spark, Seq(meta), fb, persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val t = args("array").last.t
      ex.feedback.set("foo", s"value-$t", t)
    }
    for (t <- 1L to 2L) sendTimestep(asm, t)
    // t=2's callback hasn't fired yet (batch still open) — analytics runs
    // one timestep behind, exactly like the reference
    assert(fb.get("foo", 2).isEmpty)
    asm.close(3)
    assert(fb.get("foo", 1).contains("value-1"))
    assert(fb.get("foo", 2).contains("value-2"))
    assert(fb.get("foo", 3).isEmpty)
    assert(fb.getAll("foo") == Seq((1L, "value-1"), (2L, "value-2")))
    ex.shutdown()
  }

  test("4-rank 2x2 grid workflow: sum == 10t (mpi_full_workflow_runner)") {
    val m = ArrayMeta("grid", Seq(2, 2), Seq(1, 1)).validate()
    val ex = new WindowedExecutor(spark, Seq(m), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(m))
    val fb = ex.feedback
    var sums = List.empty[(Long, Double)]
    ex.registerCallback(Seq(ArrayWindow("grid"))) { args =>
      val a = args("grid").last
      sums ::= (a.t, a.sumScalar().compute())
    }
    val bridges = (0 until 4).map(r => new GraftBridge(asm, fb, r, Seq(m),
      Map("grid" -> Seq(r / 2, r % 2))))
    for (t <- 1L to 3L; b <- bridges)
      b.send("grid", Array((t * (b.rank + 1)).toDouble), t)
    bridges.foreach(_.close(4))
    assert(sums.reverse == (1L to 3L).map(t => (t, 10.0 * t)).toList)
    ex.shutdown()
  }

  test("bridge construction validates metadata and positions (test_bridge_init)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    val asm = new LocalAssembler(ex, Seq(meta))
    // out-of-bounds declared position
    intercept[IllegalArgumentException] {
      new GraftBridge(asm, ex.feedback, 0, Seq(meta), Map("array" -> Seq(0, 5)))
    }
    // position for an undeclared array
    intercept[IllegalArgumentException] {
      new GraftBridge(asm, ex.feedback, 0, Seq(meta), Map("ghost" -> Seq(0, 0)))
    }
    // invalid metadata propagates from validate()
    intercept[IllegalArgumentException] {
      new GraftBridge(asm, ex.feedback, 0,
        Seq(ArrayMeta("bad", Seq(3, 2), Seq(2, 1))), Map.empty)
    }
    // wrong payload size at send time
    val b = new GraftBridge(asm, ex.feedback, 0, Seq(meta), Map("array" -> Seq(0, 0)))
    intercept[IllegalArgumentException] { b.send("array", Array(1.0, 2.0), 0) }
    // duplicate position for the same timestep is rejected (not masked)
    b.send("array", Array(1.0), 0)
    intercept[IllegalStateException] { b.send("array", Array(2.0), 0) }
    ex.shutdown()
  }

  test("callback registration rejects unknown arrays (test_callback_registration)") {
    val ex = new WindowedExecutor(spark, Seq(meta), persistWindows = false)
    intercept[IllegalArgumentException] {
      ex.registerCallback(Seq(ArrayWindow("nope"))) { _ => () }
    }
    intercept[IllegalArgumentException] {
      ex.registerCallback(Seq.empty) { _ => () }
    }
    intercept[IllegalArgumentException] { ArrayWindow("array", 0) }
    ex.shutdown()
  }

  test("memory discipline: windows evict + shutdown leaves nothing persisted (test_memory_release)") {
    val big = ArrayMeta("big", Seq(64, 64), Seq(64, 64)).validate()
    val ex = new WindowedExecutor(spark, Seq(big))
    val asm = new LocalAssembler(ex, Seq(big))
    ex.registerCallback(Seq(ArrayWindow("big"))) { _ => () }
    for (t <- 0L until 12L)
      asm.push(ChunkRow("big", t, Seq(0, 0), Seq(64, 64),
        Array.fill(64 * 64)(t.toDouble), "float64"))
    asm.close(12)
    // window size 1: at most the final window member may still be cached
    assert(ex.liveWindowArrays.size <= 1)
    ex.shutdown()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "no cached data may survive shutdown (zero-spill analogue)")
  }
}
