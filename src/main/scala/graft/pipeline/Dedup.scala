package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: collapse the pair graph that MinHash-LSH (or
  * any similarity stage) emits into canonical-document assignments via
  * connected components — min-label propagation with one hash join per
  * iteration, the standard DataFrame-scale formulation (a driver-side
  * union-find would not distribute). Converges in O(graph diameter)
  * iterations; near-dup graphs are shallow in practice. */
object Dedup {

  /** `pairs`: columns (id_a, id_b). Returns (doc_id, canonical_id) for
    * every id that appears in a pair, canonical = smallest id reachable.
    * The result is localCheckpoint-backed (lineage truncation is what
    * makes the iteration feasible) — `unpersist()` it when done. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct().persist()
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")).persist()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per node: min over its own label and neighbors'
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "nlabel"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nlabel")).as("nmin"))
      // localCheckpoint truncates the lineage — without it each round's
      // plan embeds every previous round and analysis cost (and the plan
      // itself) grows exponentially with iterations
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // pointer jumping (label := label(label)) halves chain lengths each
      // round, giving O(log diameter) convergence instead of O(diameter)
      val jumpTo = stepped.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = stepped.join(jumpTo, stepped("label") === jumpTo("jid"), "left")
        .select(stepped("id"),
          least(stepped("label"), coalesce(col("jlabel"), stepped("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }
}
