package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One scored candidate inside a top-k buffer: (cosine, vec_id), ordered
  * cosine DESC with vec_id ASC as the tie-break — the same total order the
  * ANN queries' `row_number` window used. */
final case class ScoredHit(cosine: Double, vec_id: Long)

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
  * The buffer is a ≤k list kept sorted by [[ScoredHit]] order, so insert
  * and merge are O(k) per element — k is small (10 here) by construction.
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
    extends Aggregator[ScoredHit, List[ScoredHit], Seq[ScoredHit]] {
  require(k > 0)

  private def beats(a: ScoredHit, b: ScoredHit): Boolean =
    a.cosine > b.cosine || (a.cosine == b.cosine && a.vec_id < b.vec_id)

  /** distinct()'s equality on (cosine, vec_id): doubles compare NaN == NaN
    * (SQL null-safe/binary row equality), ids exactly. Equal elements are
    * adjacent in the buffer order, so checking the insertion point's
    * successor is a complete duplicate test. */
  private def sameHit(a: ScoredHit, b: ScoredHit): Boolean =
    a.vec_id == b.vec_id &&
      (a.cosine == b.cosine || (a.cosine.isNaN && b.cosine.isNaN))

  private def insert(buf: List[ScoredHit], in: ScoredHit): List[ScoredHit] = {
    val (pre, post) = buf.span(beats(_, in))
    if (pre.length >= k) buf
    else if (dedup && post.headOption.exists(sameHit(_, in))) buf
    else pre ::: in :: post.take(k - pre.length - 1)
  }

  def zero: List[ScoredHit] = Nil
  def reduce(buf: List[ScoredHit], in: ScoredHit): List[ScoredHit] = insert(buf, in)
  def merge(a: List[ScoredHit], b: List[ScoredHit]): List[ScoredHit] =
    b.foldLeft(a)(insert)
  def finish(buf: List[ScoredHit]): Seq[ScoredHit] = buf

  def bufferEncoder: Encoder[List[ScoredHit]] = ExpressionEncoder()
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
