package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Mergeable Count-Min sketch over 60-bit key hashes — the point-frequency
  * complement to the Misra-Gries heavy-hitter summary (qt08) and the HLL++
  * cardinality sketch (qt10): answer "how often does THIS token / n-gram /
  * URL occur?" over a 100 TB stream from a fixed d×w counter grid
  * (Cormode & Muthukrishnan 2005), without materializing the
  * vocabulary-sized exact table.
  *
  * Error model (the contract qt11 gates): estimates NEVER undercount
  * (deterministic one-sided error — every occurrence increments every
  * row's counter), and the overcount of `min` across d rows stays within
  * e·N/w with probability ≥ 1 − e^(−d) per query; with the fixed
  * double-hash family below the sketch is a pure function of the input
  * multiset, so both properties are replayable bit-identically across
  * partitionings (merge = elementwise add, trivially commutative/
  * associative — Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Row hashes are Kirsch–Mitzenmacher double hashes of the input's 60-bit
  * key (h + i·h2(h) mod w, w a power of two) — the same family as
  * [[Bloom]]: d probed cells from one input hash, no re-hashing at
  * estimate time.
  *
  * The aggregation buffer is the d·w counter grid itself (d·w·8 bytes,
  * independent of corpus and vocabulary size); the shuffle carries one
  * grid per map-side partition.
  */
object CountMin {
  /** splitmix64 tail mix, forced odd — identical family to Bloom.h2 so
    * the two sketches' probe sequences stay independently documented. */
  private def h2(h: Long): Long = {
    var z = h * 0x9E3779B97F4A7C15L
    z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 32)
    z | 1L
  }

  /** Column index probed by row i for key hash h (w a power of two). */
  private def cell(h: Long, i: Int, w: Int): Int =
    ((h + i.toLong * h2(h)) & (w - 1L)).toInt

  def add(grid: Array[Long], h: Long, d: Int, w: Int): Unit = {
    var i = 0
    while (i < d) { grid(i * w + cell(h, i, w)) += 1L; i += 1 }
  }

  /** Point-frequency estimate: min of the d probed counters. */
  def estimate(grid: Array[Long], h: Long, d: Int, w: Int): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = grid(i * w + cell(h, i, w))
      if (c < m) m = c
      i += 1
    }
    m
  }

  /** Analytic per-query overcount scale ε·N = e·N/w — for sizing
    * assertions in specs/contracts (the classic CM bound). */
  def expectedOvercount(w: Int, n: Long): Double = math.E * n / w

  /** JVM-side mirror of `TextOps.hash60` (first 15 hex chars of md5 as a
    * number = first 8 digest bytes unsigned, >>> 4) — for driver-side
    * estimate lookups over an already-collected sketch. */
  def hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  final class Build(d: Int, w: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(d >= 1 && d <= 16, s"depth must be in [1, 16], got $d")
    require(w >= 64 && (w & (w - 1)) == 0,
      s"width must be a power of two >= 64, got $w")
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(grid: Array[Long], h: Long): Array[Long] = {
      add(grid, h, d, w); grid
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(grid: Array[Long]): Array[Long] = grid
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Column-level UDAF: `cmsBuild(4, 1 << 16)(col("h"))` yields the
    * counter grid (collectable: d·w·8 bytes total). */
  def cmsBuild(d: Int, w: Int): UserDefinedFunction = udaf(new Build(d, w))
}
