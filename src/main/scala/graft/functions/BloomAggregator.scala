package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Mergeable Bloom filter over 64-bit keys — the decontamination /
  * membership-prefilter primitive (qd10): build the filter distributively
  * over the SMALL side (an eval/benchmark corpus' n-gram hashes), collect
  * the fixed-size bit array (m/8 bytes, independent of corpus size),
  * broadcast it, and probe the 100 TB side with a stateless per-row test —
  * the classic "broadcast a summary, never shuffle the big side" shape,
  * with the summary orders of magnitude smaller than a broadcast hash set.
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing off the input's
  * 60-bit hash (h1 + i·h2 mod m): k probes from one input hash, no string
  * re-hashing at probe time. Deterministic — probe(build(S), x) is a pure
  * function of (S, x, m, k) — so contract gates (zero false negatives,
  * bounded false-positive count) are replayable across partitionings.
  *
  * The aggregation buffer is the m-bit word array itself: reduce sets k
  * bits in place, merge ORs word-wise — both O(1)-ish per element, and the
  * shuffle carries ≤ one m/64-word array per map-side partition.
  */
object Bloom {
  /** Second hash for double hashing: odd multiplier mix (splitmix64 tail)
    * so h2 is well-spread and, forced odd, coprime with power-of-two m. */
  private def h2(h: Long): Long = {
    var z = h * 0x9E3779B97F4A7C15L
    z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 32)
    z | 1L
  }

  /** The i-th probed bit index for key hash `h` in an m-bit filter
    * (m must be a power of two). */
  private def bitIndex(h: Long, i: Int, mBits: Int): Int =
    ((h + i.toLong * h2(h)) & (mBits - 1L)).toInt

  def set(bits: Array[Long], h: Long, k: Int): Unit = {
    val m = bits.length * 64
    var i = 0
    while (i < k) {
      val b = bitIndex(h, i, m)
      bits(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], h: Long, k: Int): Boolean = {
    val m = bits.length * 64
    var i = 0
    while (i < k) {
      val b = bitIndex(h, i, m)
      if ((bits(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Expected false-positive probability after n insertions
    * ((1 - e^(-kn/m))^k) — for sizing assertions in specs/contracts. */
  def expectedFpp(mBits: Int, k: Int, n: Long): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / mBits), k.toDouble)

  final class Build(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    def zero: Array[Long] = new Array[Long](mBits / 64)
    def reduce(bits: Array[Long], h: Long): Array[Long] = { set(bits, h, k); bits }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(bits: Array[Long]): Array[Long] = bits
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Column-level UDAF: `bloomBuild(1 << 21, 4)(col("h"))` yields the
    * filter's word array (collectable: m/8 bytes total). */
  def bloomBuild(mBits: Int, k: Int): UserDefinedFunction = udaf(new Build(mBits, k))
}
