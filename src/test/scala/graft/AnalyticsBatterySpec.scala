package graft

import graft.core._
import graft.functions.FFT
import graft.linalg.Linalg
import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's operator-conformance battery
  * (deisa-ray `tests/test_analytics.py:26-101`): two ranks send chunks
  * forming the global array [[1, 2]] at timestep 0; a single callback
  * asserts every pinned operator against the exact numpy values.
  */
class AnalyticsBatterySpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark

  test("full operator battery matches the reference's closed-form values") {
    val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()
    val executor = new WindowedExecutor(spark, Seq(meta))
    val assembler = new LocalAssembler(executor, Seq(meta))
    var fired = 0

    executor.registerCallback(Seq(ArrayWindow("array"))) { args =>
      fired += 1
      val arr = args("array").last

      // persist works and is used below
      val arrP = arr.persist()

      assert(arr.compute().data.toSeq == Seq(1.0, 2.0))

      assert(arrP.meanScalar().compute() == 1.5)
      assert(arr.sumScalar().compute() == 3.0)
      assert(arr.minScalar().compute() == 1.0)
      assert(arr.maxScalar().compute() == 2.0)
      assert(arr.stdScalar().compute() == 0.5)

      assert((arr * 2.0).compute().data.toSeq == Seq(2.0, 4.0))
      assert((arr * arr).compute().data.toSeq == Seq(1.0, 4.0))

      val sliced = arr.slice(Seq((0, 1), (0, 1))).compute()
      assert(sliced.shape == Seq(1, 1) && sliced.data.toSeq == Seq(1.0))

      val transposed = arr.T.compute()
      assert(transposed.shape == Seq(2, 1))
      assert(transposed.data.toSeq == Seq(1.0, 2.0))

      val mm = Linalg.matmul(arr.T, arr).compute()
      assert(mm.shape == Seq(2, 2))
      assert(mm.data.toSeq == Seq(1.0, 2.0, 2.0, 4.0))

      assert(arr.clip(1, 1).compute().data.toSeq == Seq(1.0, 1.0))
      assert(arr.whereGt(1.0, 0.0).compute().data.toSeq == Seq(0.0, 2.0))

      val sq = arr.astype("float64").sqrtElems().compute()
      assert(math.abs(sq.data(0) - 1.0) < 1e-12)
      assert(math.abs(sq.data(1) - math.sqrt(2.0)) < 1e-12)

      val stacked = arr.concatenate(Seq(arr * 2.0, arr * 3.0), axis = 0)
        .rechunk(Seq(3, 2))
      val st = stacked.compute()
      assert(st.shape == Seq(3, 2))
      assert(st.data.toSeq == Seq(1.0, 2.0, 2.0, 4.0, 3.0, 6.0))

      // SVD of the centered stack: singular values [sqrt(10), 0],
      // |first principal component| == [1/sqrt(5), 2/sqrt(5)]
      val centered = stacked.minusBroadcast(stacked.reduceAxis(0, "mean"), axis = 0)
      val (sv, vt) = Linalg.svd(centered)
      assert(math.abs(sv(0) - math.sqrt(10.0)) < 1e-12)
      assert(math.abs(sv(1)) < 1e-12)
      assert(math.abs(math.abs(vt(0)(0)) - 1.0 / math.sqrt(5.0)) < 1e-9)
      assert(math.abs(math.abs(vt(0)(1)) - 2.0 / math.sqrt(5.0)) < 1e-9)

      // FFT along axis 1 (rechunked so the axis is contiguous, as dask requires)
      val (re, im) = FFT.fft(arr.rechunk(Seq(1, 2)), axis = 1)
      val reC = re.compute(); val imC = im.compute()
      assert(math.abs(reC.data(0) - 3.0) < 1e-12 && math.abs(reC.data(1) + 1.0) < 1e-12)
      assert(math.abs(imC.data(0)) < 1e-12 && math.abs(imC.data(1)) < 1e-12)

      arrP.unpersist()
      ()
    }

    // two "ranks" send their chunk for timestep 0, then rank 0 closes
    for (rank <- 0 to 1)
      assembler.push(ChunkRow("array", 0, Seq(0, rank), Seq(1, 1),
        Array((rank + 1).toDouble), "int64"))
    assembler.close(1)

    assert(fired == 1, "callback must fire exactly once")
    assert(executor.isTerminated)
    executor.shutdown()
  }
}
