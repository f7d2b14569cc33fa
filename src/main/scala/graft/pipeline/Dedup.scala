package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: collapse the pair graph that MinHash-LSH (or
  * any similarity stage) emits into canonical-document assignments via
  * connected components — min-label propagation with pointer jumping
  * (label := label(label)), one hash join per round, O(log diameter)
  * rounds. A driver-side union-find would not distribute.
  *
  * Iteration mechanics: each round's result is (a) persisted through the
  * CacheManager so it is deterministically releasable (localCheckpoint's
  * cache is RDD-level and ignores DataFrame.unpersist), and (b) wrapped as
  * a plan-opaque DataFrame over its RDD so the Catalyst plan does not grow
  * with the iteration count (an unbroken lineage makes analysis cost — and
  * the plan itself — explode exponentially).
  */
object Dedup {

  /** `pairs`: columns (id_a, id_b). Returns (doc_id, canonical_id) for
    * every id that appears in a pair, canonical = smallest id reachable.
    * The result is persisted — `unpersist()` it when done.
    *
    * Throws if the propagation has not converged after `maxIter` rounds:
    * pointer jumping makes the default 20 astronomically sufficient
    * (2^20-diameter components), but silently returning partial labels
    * would be the worst failure mode an offline dedup can have — a wrong
    * canonical assignment that LOOKS complete. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    def opaque(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct().persist()
    var cached = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")).persist()
    cached.count()
    var labels = opaque(cached)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per node: min over its own label and neighbors'
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "nlabel"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nlabel")).as("nmin"))
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // pointer jumping halves chain lengths every round
      val jumpTo = stepped.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = stepped.join(jumpTo, stepped("label") === jumpTo("jid"), "left")
        .select(stepped("id"),
          least(stepped("label"), coalesce(col("jlabel"), stepped("label"))).as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count() // also materializes next
      cached.unpersist()
      cached = next
      labels = opaque(next)
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      cached.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds 2^maxIter or the input pair graph is " +
          "pathological; raise maxIter rather than trusting partial labels")
    }
    // re-cache under the final plan so the caller's unpersist() matches it
    val result = cached
      .select(col("id").as("doc_id"), col("label").as("canonical_id")).persist()
    result.count()
    cached.unpersist()
    result
  }
}
