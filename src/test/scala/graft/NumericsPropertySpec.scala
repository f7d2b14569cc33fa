package graft

import graft.core._
import graft.functions.FFT
import graft.linalg.Linalg
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized conformance against naive dense references: multi-chunk
  * matmul, axis reductions, rechunk/transpose/slice round trips, and the
  * Bluestein FFT path (non-power-of-two lengths), none of which the
  * reference's own battery exercises beyond single tiny blocks. */
class NumericsPropertySpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val rng = new Random(42)

  private def mkArray(rows: Int, cols: Int, chunkR: Int, chunkC: Int,
      name: String): (DeisaArray, Array[Array[Double]]) = {
    val dense = Array.fill(rows, cols)(rng.nextInt(20).toDouble - 10)
    val meta = ArrayMeta(name, Seq(rows, cols), Seq(chunkR, chunkC)).validate()
    val chunks = for (pr <- 0 until rows / chunkR; pc <- 0 until cols / chunkC) yield {
      val data = new Array[Double](chunkR * chunkC)
      for (i <- 0 until chunkR; j <- 0 until chunkC)
        data(i * chunkC + j) = dense(pr * chunkR + i)(pc * chunkC + j)
      ChunkRow(name, 0, Seq(pr, pc), Seq(chunkR, chunkC), data, "float64")
    }
    (DeisaArray.fromChunks(spark, chunks, meta, 0), dense)
  }

  test("TopKByScore is partition-split invariant (merge order never changes the result)") {
    // the ANN/quota ranking contract: for ANY way the scored rows split
    // into partitions and ANY merge order of the partial buffers, the
    // result equals global sort-take-k. The oracle only ever checks one
    // partitioning — this property is what makes the others safe.
    import graft.functions.{ScoredHit, TopKByScore}
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 200) {
      val k = 1 + rng.nextInt(6)
      val agg = new TopKByScore(k)
      val n = rng.nextInt(40)
      // duplicate scores (and whole duplicate rows) on purpose: the
      // vec_id tie-break must hold, and identical rows keep multiset
      // semantics exactly like the row_number window they replaced
      val rows = Seq.fill(n)(ScoredHit(rng.nextInt(6).toDouble, rng.nextInt(30).toLong))
      val expected = rows.sortBy(h => (-h.cosine, h.vec_id)).take(k)
      // random split into partial buffers, random merge order
      val parts = rows.grouped(1 + rng.nextInt(5)).toSeq
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rng.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected,
        s"trial $trial k=$k: got ${agg.finish(merged)}, expected $expected from $rows")
    }
  }

  test("multi-chunk matmul equals dense reference (chunked contraction dim)") {
    val (a, da) = mkArray(6, 4, 2, 2, "ma") // contraction dim chunked in 2s
    val (b, db) = mkArray(4, 6, 2, 3, "mb")
    val got = Linalg.matmul(a, b).compute()
    for (i <- 0 until 6; j <- 0 until 6) {
      val expect = (0 until 4).map(k => da(i)(k) * db(k)(j)).sum
      assert(got(i, j) == expect, s"($i,$j)")
    }
  }

  test("reduceAxis across chunk boundaries equals dense reference") {
    val (a, d) = mkArray(6, 6, 2, 3, "ra")
    val s0 = a.reduceAxis(0, "sum").compute()
    for (j <- 0 until 6) assert(s0(j) == (0 until 6).map(d(_)(j)).sum)
    val m1 = a.reduceAxis(1, "mean").compute()
    for (i <- 0 until 6) assert(m1(i) == d(i).sum / 6.0)
    val mx = a.reduceAxis(0, "max").compute()
    for (j <- 0 until 6) assert(mx(j) == (0 until 6).map(d(_)(j)).max)
  }

  test("stdAxis equals dense population std per axis") {
    val (a, d) = mkArray(6, 6, 2, 3, "sd")
    val s0 = a.stdAxis(0).compute()
    for (j <- 0 until 6) {
      val colVals = (0 until 6).map(d(_)(j))
      val mean = colVals.sum / 6.0
      val expect = math.sqrt(colVals.map(v => (v - mean) * (v - mean)).sum / 6.0)
      assert(math.abs(s0(j) - expect) < 1e-9, s"col $j")
    }
  }

  test("rechunk preserves content for several target shapes") {
    val (a, d) = mkArray(6, 6, 2, 3, "rc")
    for (target <- Seq(Seq(3, 2), Seq(6, 6), Seq(1, 1), Seq(2, 2))) {
      val r = a.rechunk(target).compute()
      for (i <- 0 until 6; j <- 0 until 6)
        assert(r(i, j) == d(i)(j), s"rechunk $target at ($i,$j)")
    }
  }

  test("transpose + slice compose correctly over chunks") {
    val (a, d) = mkArray(6, 4, 3, 2, "ts")
    val t = a.T.compute()
    for (i <- 0 until 4; j <- 0 until 6) assert(t(i, j) == d(j)(i))
    val s = a.slice(Seq((1, 5), (1, 3))).compute()
    assert(s.shape == Seq(4, 2))
    for (i <- 0 until 4; j <- 0 until 2) assert(s(i, j) == d(i + 1)(j + 1))
  }

  test("FFT matches naive DFT for non-power-of-two lengths (Bluestein)") {
    for (n <- Seq(5, 12, 31, 8, 16)) {
      val re = Array.fill(n)(rng.nextDouble() * 10 - 5)
      val im = new Array[Double](n)
      val (fr, fi) = FFT.dft(re, im)
      for (k <- 0 until n) {
        var er = 0.0; var ei = 0.0
        for (t <- 0 until n) {
          val ang = -2.0 * math.Pi * k * t / n
          er += re(t) * math.cos(ang)
          ei += re(t) * math.sin(ang)
        }
        assert(math.abs(fr(k) - er) < 1e-8, s"n=$n k=$k re")
        assert(math.abs(fi(k) - ei) < 1e-8, s"n=$n k=$k im")
      }
    }
  }

  test("distributed FFT along a chunked-then-rechunked axis") {
    val (a, d) = mkArray(4, 6, 2, 3, "fa") // axis 1 chunked -> rechunk first
    val (re, im) = FFT.fft(a.rechunk(Seq(2, 6)), axis = 1)
    val reC = re.compute(); val imC = im.compute()
    for (i <- 0 until 4; k <- 0 until 6) {
      var er = 0.0; var ei = 0.0
      for (t <- 0 until 6) {
        val ang = -2.0 * math.Pi * k * t / 6
        er += d(i)(t) * math.cos(ang)
        ei += d(i)(t) * math.sin(ang)
      }
      assert(math.abs(reC(i, k) - er) < 1e-8)
      assert(math.abs(imC(i, k) - ei) < 1e-8)
    }
  }

  test("empty slice: sum is 0 (numpy), other reductions raise a clear error") {
    val (a, _) = mkArray(6, 4, 3, 2, "es")
    val empty = a.slice(Seq((2, 2), (0, 4)))
    assert(empty.sumScalar().compute() == 0.0)
    val e = intercept[IllegalStateException] { empty.minScalar().compute() }
    assert(e.getMessage.contains("empty"))
    intercept[IllegalArgumentException] { a.slice(Seq((5, 3), (0, 4))) } // inverted
  }

  test("foldBlocks raises on mismatched partial shapes (differently chunked inputs)") {
    val (a, _) = mkArray(6, 6, 2, 3, "fb1")
    val b = a.rechunk(Seq(2, 2))
    // concatenating differently chunked arrays then reducing the concat
    // axis puts unequal-shape partials at one position
    val e = intercept[Exception] {
      a.concatenate(Seq(b), axis = 0).reduceAxis(0, "sum").compute()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("mismatched block shapes")))
  }

  test("combineBroadcast distributed path (multi-block reduced operand) equals dense reference") {
    val (a, d) = mkArray(6, 6, 2, 3, "cbd") // mean(axis=0) has 2 blocks of 3
    val mean0 = a.reduceAxis(0, "mean")
    // limit 0 forces the equi-join path regardless of size
    val got = a.combineBroadcast(mean0, axis = 0, _ - _, broadcastElemLimit = 0).compute()
    val viaBroadcast = a.combineBroadcast(mean0, axis = 0, _ - _).compute()
    for (i <- 0 until 6; j <- 0 until 6) {
      val colMean = (0 until 6).map(d(_)(j)).sum / 6.0
      assert(math.abs(got(i, j) - (d(i)(j) - colMean)) < 1e-12, s"($i,$j)")
      assert(got(i, j) == viaBroadcast(i, j), s"paths diverge at ($i,$j)")
    }
    // axis=1: reduced operand blocks along rows
    val mean1 = a.reduceAxis(1, "mean")
    val got1 = a.combineBroadcast(mean1, axis = 1, _ - _, broadcastElemLimit = 0).compute()
    for (i <- 0 until 6; j <- 0 until 6) {
      val rowMean = d(i).sum / 6.0
      assert(math.abs(got1(i, j) - (d(i)(j) - rowMean)) < 1e-12, s"axis1 ($i,$j)")
    }
  }

  test("combineBroadcast distributed path raises on misprojected reduced grid") {
    val (a, _) = mkArray(6, 6, 2, 3, "cbm")
    val mis = a.reduceAxis(0, "mean").rechunk(Seq(2)) // grid no longer the projection
    val e = intercept[Exception] {
      a.combineBroadcast(mis, axis = 0, _ - _, broadcastElemLimit = 0).compute()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("rechunk first")))
  }

  test("astype applies value semantics (int truncation, float32 rounding)") {
    val (a, d) = mkArray(6, 6, 2, 3, "at")
    val frac = a / 3.0
    val asInt = frac.astype("int32").compute()
    for (i <- 0 until 6; j <- 0 until 6)
      assert(asInt(i, j) == (d(i)(j) / 3.0).toInt.toDouble, s"($i,$j)")
    val asF32 = frac.astype("float32").compute()
    for (i <- 0 until 6; j <- 0 until 6)
      assert(asF32(i, j) == (d(i)(j) / 3.0).toFloat.toDouble, s"f32 ($i,$j)")
    assert(frac.astype("int64").dtype == "int64")
    intercept[IllegalArgumentException] { a.astype("complex128") }
  }

  test("combine raises on misaligned chunk layouts instead of dropping blocks") {
    val (a, _) = mkArray(6, 6, 2, 3, "ca")
    val b = a.rechunk(Seq(3, 2))
    val e = intercept[Exception] { (a + b).sumScalar().compute() }
    assert(e.getMessage.contains("not aligned") ||
      Option(e.getCause).exists(_.getMessage.contains("not aligned")))
  }
}
