package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE ranking/truncation contract — one definition of the total order
  * every ANN/retrieval oracle in the gate depends on, shared by the
  * in-memory engine ([[graft.pipeline.KnnGraph]]), the persistent stores
  * ([[graft.sinks.IvfIndexStore]], [[graft.sinks.GraphIndexStore]],
  * [[graft.sinks.TextIndexStore]]) and the driver-side walk folds.
  *
  * The order is [[ScoredHit]]'s: score DESC, id ASC on ties — identical to
  * the oracles' `row_number() OVER (ORDER BY cosine DESC, vec_id)`. It
  * used to live in four private copies (KnnGraph.topPerKey,
  * GraphIndexStore.topPerKey/beats, IvfIndexStore.rankTopK, the
  * TextIndexStore finish); a tie-break edit to one copy would have
  * silently drifted the others while every mirror contract still named
  * the same convention. Any future change lands HERE or nowhere.
  */
object Ranking {

  /** The [[ScoredHit]] total order as a primitive-double comparison — for
    * driver-side folds (the graph stores' walk state) that must truncate
    * identically to the distributed aggregator. */
  def beats(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
    aScore > bScore || (aScore == bScore && aId < bId)

  /** Bounded top-`k` per `key` — the scale-safe replacement for a
    * per-key window sort ([[TopKByScore]]'s map-side-partial shape).
    * Input needs (key, idCol, scoreCol); output is (key, idCol, scoreCol)
    * with ≤ k rows per key, ordered within each key by the contract. */
  def topPerKey(scored: DataFrame, key: String, k: Int, idCol: String,
      scoreCol: String = "cosine"): DataFrame =
    topPerKeyImpl(scored, key, k, idCol, scoreCol, dedup = false)

  /** `scored.distinct()` then [[topPerKey]], fused into ONE aggregation —
    * row-identical whenever duplicate (key, id) rows carry the identical
    * score bits (replays of one deterministic expression — the KnnGraph
    * build's contract), and one full shuffle of the candidate relation
    * cheaper: the aggregator's map-side partial truncates to ≤ k rows per
    * key before the exchange ([[TopKByScore]]'s dedup doc). */
  def topPerKeyDistinct(scored: DataFrame, key: String, k: Int, idCol: String,
      scoreCol: String = "cosine"): DataFrame =
    topPerKeyImpl(scored, key, k, idCol, scoreCol, dedup = true)

  private def topPerKeyImpl(scored: DataFrame, key: String, k: Int,
      idCol: String, scoreCol: String, dedup: Boolean): DataFrame = {
    val topk = TopKAggregator.topK(k, dedup)
    scored.groupBy(col(key))
      .agg(topk(col(scoreCol), col(idCol)).as("top"))
      .select(col(key), explode(col("top")).as("hit"))
      .select(col(key), col("hit.vec_id").as(idCol),
        col("hit.cosine").as(scoreCol))
  }

  /** The bounded top-k rank FINISH shared by the serve paths:
    * (query_id, rank, idCol) output, rank = position in the contract
    * order + 1, ordered (query_id, rank). */
  def rankTopK(scored: DataFrame, topK: Int, idCol: String = "vec_id",
      scoreCol: String = "cosine"): DataFrame = {
    val topk = TopKAggregator.topK(topK)
    scored.groupBy(col("query_id"))
      .agg(topk(col(scoreCol), col(idCol)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.vec_id").as(idCol))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[rankTopK]] with the score kept in the output —
    * (query_id, rank, idCol, scoreCol), the BM25 serve shape. */
  def rankTopKScored(scored: DataFrame, topK: Int, idCol: String,
      scoreCol: String): DataFrame = {
    val topk = TopKAggregator.topK(topK)
    scored.groupBy(col("query_id"))
      .agg(topk(col(scoreCol), col(idCol)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.vec_id").as(idCol), col("col.cosine").as(scoreCol))
      .orderBy(col("query_id"), col("rank"))
  }
}
