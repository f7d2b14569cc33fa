package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One heavy-hitter candidate: (token, estimated count). Estimates are
  * UNDERestimates: 0 ≤ true − estimate ≤ n/(k+1) (see [[MisraGriesAgg]]). */
final case class HeavyHitter(token: String, count: Long)

/** Mergeable Misra-Gries heavy-hitters summary with k counters.
  *
  * The exact token-frequency table over a 100 TB corpus is vocabulary-sized
  * — fine to compute, but any consumer that only needs the dominant tokens
  * (stopword mining, tokenizer sanity, skew alarms) can hold a summary of
  * FIXED size instead: k counters per partition partial, k after every
  * merge, independent of both corpus and vocabulary size.
  *
  * Guarantees (Misra–Gries 1982; merging per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): after summarizing a stream of n tokens,
  *   - every token with true count > n/(k+1) is present in the summary;
  *   - every estimate undercounts by at most n/(k+1) and never overcounts.
  * Both survive arbitrary merge trees, so the guarantee is partitioning-
  * invariant — the property `qt08_heavy_hitters` gates and
  * `MisraGriesSpec` property-tests across partition splits.
  *
  * reduce: resident token → +1; room → insert at 1; otherwise decrement
  * all k counters (the classic "cancel k+1 distinct tokens" step).
  * merge: sum counts by token; if over k, subtract the (k+1)-th largest
  * count from every counter and drop the non-positive ones.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[HeavyHitter]] {
  require(k > 0)

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c)                => buf.updated(tok, c + 1)
      case None if buf.size < k   => buf.updated(tok, 1L)
      case None                   =>
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  def finish(buf: Map[String, Long]): Seq[HeavyHitter] =
    buf.toSeq.map { case (t, c) => HeavyHitter(t, c) }
      .sortBy(h => (-h.count, h.token))

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[HeavyHitter]] = ExpressionEncoder()
}

object MisraGries {
  /** Column-level UDAF: `summary(32)(col("token"))` yields an
    * `array<struct<token,count>>` of ≤ k candidates, count DESC. */
  def summary(k: Int): UserDefinedFunction = udaf(new MisraGriesAgg(k))
}
