package graft

import graft.pipeline.KnnGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the graph-ANN engine behind qs27: the builder's degree
  * bound, bit-determinism of both build and search across input
  * partitionings (every truncation orders by (cosine DESC, id ASC), every
  * cosine is the same left-fold expression — so the graph and the walk
  * cannot depend on how Spark split the input), and the end-to-end recall
  * contract the gate row relies on.
  */
class KnnGraphSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val Dim = 8
  private val N = 240

  /** Seeded gaussian-ish cloud: deterministic, no ties in practice. */
  private def vecs(parts: Int): DataFrame = {
    val rnd = new scala.util.Random(0xD1CE)
    val rows = (0 until N).map { i =>
      (i.toLong, Seq.fill(Dim)(rnd.nextGaussian()))
    }
    rows.toDF("vec_id", "v").repartition(parts)
  }

  private def cents(e: DataFrame, k: Int): DataFrame =
    e.filter(col("vec_id") < k)

  /** Collect to a comparable set; cosines rounded to 12 places only to keep
    * the assertion message readable — determinism is actually bit-level,
    * which the exact-equality variant below pins. */
  private def edgeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("src"), col("dst"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build bounds out-degree and orders each neighbourhood deterministically") {
    val e = vecs(7).persist()
    val edges = KnnGraph.build(e, cents(e, 4), assign = 2, degree = 6)
    val perSrc = edges.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), count(lit(1)).as("srcs")).collect()(0)
    assert(perSrc.getLong(0) <= 6, "out-degree bound")
    assert(perSrc.getLong(1) == N.toLong, "every vector gets a neighbourhood")
    // no (src,dst) appears twice (the distinct()s collapse multi-cell meets)
    assert(edges.groupBy(col("src"), col("dst")).count()
      .filter(col("count") > 1).isEmpty, "edge rows are unique")
    spark.catalog.clearCache()
  }

  test("fused dedup-truncate equals distinct() then truncate (r16 shuffle fusion)") {
    // the build replaced its distinct()-then-topPerKey stages with the
    // dedup-fused aggregator (Ranking.topPerKeyDistinct) — valid ONLY
    // because duplicate candidate rows replay one deterministic score
    // expression. Pin the equivalence on a relation with genuine
    // duplicates and score ties: duplicates must collapse to one slot,
    // non-duplicates with TIED scores must each keep their slot, and the
    // result must equal the unfused formulation row for row.
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 10L, 0.9), // exact replays
      (1L, 11L, 0.9), (1L, 12L, 0.9),                 // tied, distinct ids
      (1L, 13L, 0.8), (1L, 14L, 0.7), (1L, 15L, 0.6),
      (2L, 10L, 0.5), (2L, 10L, 0.5)
    ).toDF("src", "dst", "cosine")
    for (k <- Seq(1, 2, 3, 4, 8)) {
      val fused = graft.functions.Ranking
        .topPerKeyDistinct(rows, "src", k, "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val unfused = graft.functions.Ranking
        .topPerKey(rows.distinct(), "src", k, "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fused == unfused,
        s"k=$k fused dedup-truncate must match distinct-then-truncate")
    }
    // NaN replays collapse like distinct() collapses them (null-safe double
    // equality); no truncation pressure here — with NaN in a buffer the
    // insertion order is not a total order, so ranking UNDER truncation is
    // arrival-dependent in the unfused form too (real inputs are NaN-free
    // by the normalization guards)
    val nanDups = Seq((2L, 16L, Double.NaN), (2L, 16L, Double.NaN))
      .toDF("src", "dst", "cosine")
    assert(graft.functions.Ranking
      .topPerKeyDistinct(nanDups, "src", 8, "dst").count() == 1L,
      "NaN duplicates collapse to one slot")
  }

  test("build and search are bit-identical across input partitionings") {
    val e1 = vecs(1).persist()
    val e7 = vecs(7).persist()
    val g1 = edgeSet(KnnGraph.build(e1, cents(e1, 4), 2, 6))
    val g7 = edgeSet(KnnGraph.build(e7, cents(e7, 4), 2, 6))
    assert(g1 == g7, "graph independent of partitioning")
    val q1 = e1.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val q7 = e7.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def visitedSet(e: DataFrame, q: DataFrame): Set[(Long, Long, Double)] = {
      val scope = new graft.core.WalkScope
      try KnnGraph.search(e, KnnGraph.build(e, cents(e, 4), 2, 6), q,
          Seq(0L, 1L), beam = 8, hops = 2, scope)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      finally scope.release()
    }
    assert(visitedSet(e1, q1) == visitedSet(e7, q7),
      "walk independent of partitioning")
    spark.catalog.clearCache()
  }

  test("beam search recovers the brute-force top-k (recall contract)") {
    val e = vecs(5).persist()
    val edges = KnnGraph.build(e, cents(e, 4), assign = 2, degree = 8).persist()
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scope = new graft.core.WalkScope
    val visited = KnnGraph.search(e, edges, q, Seq(0L, 1L, 2L, 3L),
      beam = 16, hops = 3, scope)
    val topk = graft.functions.TopKAggregator.topK(5)
    def top5(scored: DataFrame): Set[(Long, Long)] =
      scored.filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = top5(visited)
    // exact truth: brute force over the tiny fixture
    val qb = broadcast(q)
    val truth = top5(e.crossJoin(qb).select(col("query_id"), col("vec_id"),
      (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
        (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
          sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _))))
        .as("cosine")))
    val recall = (got intersect truth).size.toDouble / truth.size
    // measured 1.0 on this fixture; the gate constant (0.90 avg) keeps a
    // margin below the worst measured config — see GraphAnnProbeMain
    assert(recall >= 0.9, s"recall $recall (got ${got.size}, truth ${truth.size})")
    scope.release()
    spark.catalog.clearCache()
  }
}
