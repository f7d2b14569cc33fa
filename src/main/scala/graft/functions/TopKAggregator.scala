package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside a top-k buffer: (cosine, vec_id), ordered
  * cosine DESC with vec_id ASC as the tie-break — the same total order the
  * ANN queries' `row_number` window used. */
final case class ScoredHit(cosine: Double, vec_id: Long)

/** The top-k aggregation buffer: parallel primitive arrays holding the
  * current best `n ≤ k` hits in [[ScoredHit]] order, MUTATED IN PLACE by
  * reduce/merge (the Aggregator contract allows it). `hasNaN` guards the
  * O(1) tail-skip: a NaN score breaks the total order, so a buffer that
  * ever absorbed one falls back to the exact prefix-scan semantics. */
final case class TopKBuf(scores: Array[Double], ids: Array[Long],
    var n: Int, var hasNaN: Boolean)

/** Bounded per-partition top-k: the scale-safe replacement for
  * `row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC)` over a
  * scored candidate set.
  *
  * The window formulation sorts EVERY surviving candidate of a query inside
  * one task — with few queries over a 100 TB corpus that is a single-task
  * sort of ~nprobe/K of the corpus. As an [[Aggregator]] the aggregation
  * runs with map-side partials: each input partition reduces to at most k
  * buffered rows per query, the shuffle carries ≤ partitions × k rows per
  * query, and the final merge touches only those survivors. Memory is
  * O(queries-per-task × k) everywhere; nothing ever holds, or sorts, the
  * full candidate set.
  *
  * The buffer ([[TopKBuf]]) is a pair of primitive arrays kept in
  * [[ScoredHit]] order and mutated in place. The previous immutable-List
  * buffer allocated and traversed O(k) cells per INPUT ROW, which at the
  * rerank-candidate widths (candK = 240) made buffer churn the dominant
  * cost of the PQ batch serve (measured: the candK axis of
  * PqBatchTimeMain's sensitivity grid). Now a row that does not beat the
  * current k-th hit is rejected in O(1) against the buffer tail (valid
  * exactly when the buffer is NaN-free — the order is total, so "doesn't
  * beat the last" ⟺ "beaten by, or equal to, all k"); qualifying rows pay
  * one short prefix scan plus an arraycopy shift, no allocation. The
  * result multiset is IDENTICAL to the List form's on every input,
  * including NaN scores (which disable the fast path and replay the exact
  * takeWhile insertion).
  *
  * `dedup = true` fuses an upstream `.distinct()` into the aggregation:
  * an incoming hit equal to a buffered one (same id, same score — NaN
  * equal to NaN, mirroring distinct()'s null-safe double equality) is
  * dropped instead of occupying a second slot. For inputs whose duplicate
  * rows are exact replays of the same deterministic score expression
  * (the KnnGraph build's shared-cell pairs), `topK(k, dedup = true)` over
  * the raw rows is row-identical to `distinct()` THEN `topK(k)` — minus
  * the distinct's full shuffle of the candidate relation: the map-side
  * partial truncates each partition to ≤ k rows per key BEFORE the
  * exchange, so the shuffle carries the survivors only.
  */
final class TopKByScore(k: Int, dedup: Boolean = false)
    extends Aggregator[ScoredHit, TopKBuf, Seq[ScoredHit]] {
  require(k > 0)

  private def beats(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
    aScore > bScore || (aScore == bScore && aId < bId)

  /** distinct()'s equality on (cosine, vec_id): doubles compare NaN == NaN
    * (SQL null-safe/binary row equality), ids exactly. Equal elements are
    * adjacent in the buffer order, so checking the insertion point is a
    * complete duplicate test. */
  private def sameHit(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
    aId == bId && (aScore == bScore || (aScore.isNaN && bScore.isNaN))

  private def insert(b: TopKBuf, score: Double, id: Long): TopKBuf = {
    val nanIn = score.isNaN
    // O(1) rejection of the common case (full buffer, hit below the k-th):
    // sound only under the total order — any NaN (incoming or buffered)
    // takes the exact path below
    if (b.n == k && !b.hasNaN && !nanIn &&
        !beats(score, id, b.scores(k - 1), b.ids(k - 1))) {
      // content-equivalent to the insertion semantics: an incoming hit
      // equal to the k-th would displace-and-drop its own duplicate
      return b
    }
    // exact takeWhile(beats(_, in)) prefix — the List form's insertion
    // point, valid sorted or not (NaN buffers are arrival-ordered)
    var i = 0
    while (i < b.n && beats(b.scores(i), b.ids(i), score, id)) i += 1
    if (i >= k) return b
    if (dedup && i < b.n && sameHit(b.scores(i), b.ids(i), score, id)) return b
    val end = math.min(b.n, k - 1) // the element at k-1 (if full) falls off
    if (end > i) {
      System.arraycopy(b.scores, i, b.scores, i + 1, end - i)
      System.arraycopy(b.ids, i, b.ids, i + 1, end - i)
    }
    b.scores(i) = score
    b.ids(i) = id
    if (b.n < k) b.n += 1
    if (nanIn) b.hasNaN = true
    b
  }

  def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0, false)
  def reduce(buf: TopKBuf, in: ScoredHit): TopKBuf =
    insert(buf, in.cosine, in.vec_id)
  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    var acc = a
    while (i < b.n) { acc = insert(acc, b.scores(i), b.ids(i)); i += 1 }
    acc
  }
  def finish(buf: TopKBuf): Seq[ScoredHit] = {
    val out = new Array[ScoredHit](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = ScoredHit(buf.scores(i), buf.ids(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredHit]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column-level UDAF: `topK(10)(col("cosine"), col("vec_id"))` yields an
    * `array<struct<cosine,vec_id>>` already in rank order (rank = array
    * position + 1). `dedup` fuses an upstream distinct() — see
    * [[TopKByScore]]'s contract for when that is row-identical. */
  def topK(k: Int, dedup: Boolean = false): UserDefinedFunction =
    udaf(new TopKByScore(k, dedup))
}
