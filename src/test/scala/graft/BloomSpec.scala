package graft

import graft.functions.Bloom
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom membership prefilter (qd10): one-sided error, mergeability,
  * and partition-layout invariance of the distributed build. */
class BloomSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val M = 1 << 16
  private val K = 4

  test("no false negatives, ever") {
    val bits = new Array[Long](M / 64)
    val keys = (1L to 5000L).map(i => i * 0x9E3779B97F4A7C15L + i)
    keys.foreach(Bloom.set(bits, _, K))
    assert(keys.forall(Bloom.mightContain(bits, _, K)))
  }

  test("false-positive rate stays near the analytic expectation") {
    val bits = new Array[Long](M / 64)
    val n = 2000L
    (1L to n).foreach(h => Bloom.set(bits, h * 0x5851F42D4C957F2DL + 11, K))
    val probes = (1L to 20000L).map(i => i * 0xC2B2AE3D27D4EB4FL + 977)
    val fp = probes.count(p => Bloom.mightContain(bits, p, K))
    val expected = Bloom.expectedFpp(M, K, n) * probes.size
    // one-sided generosity: inserted keys are disjoint from probes (mixes
    // differ), so every hit is a false positive; allow 3x the expectation
    assert(fp <= math.max(20.0, 3 * expected), s"fp=$fp expected≈$expected")
  }

  test("merge of partial filters equals the sequential build") {
    val a = new Array[Long](M / 64)
    val b = new Array[Long](M / 64)
    val whole = new Array[Long](M / 64)
    val keys = (1L to 1000L).map(i => i * 0x9E3779B97F4A7C15L)
    keys.take(500).foreach(Bloom.set(a, _, K))
    keys.drop(500).foreach(Bloom.set(b, _, K))
    keys.foreach(Bloom.set(whole, _, K))
    val merged = a.zip(b).map { case (x, y) => x | y }
    assert(merged.sameElements(whole))
  }

  test("distributed build is partition-layout invariant and matches local") {
    val keys = (1L to 3000L).map(i => i * 0x9E3779B97F4A7C15L + 7)
    val local = new Array[Long](M / 64)
    keys.foreach(Bloom.set(local, _, K))
    val agg = Bloom.bloomBuild(M, K)
    def built(parts: Int): Array[Long] =
      keys.toDS().repartition(parts).agg(agg(org.apache.spark.sql.functions.col("value")))
        .head().getSeq[Long](0).toArray
    assert(built(1).sameElements(local))
    assert(built(8).sameElements(local))
  }

  test("filter sizing is validated") {
    intercept[IllegalArgumentException](new Bloom.Build(1000, 4)) // not 2^n
    intercept[IllegalArgumentException](new Bloom.Build(1 << 16, 0))
  }
}
