package graft

import graft.pipeline.KnnGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: decompose qs27 / GraphIndexStore cost into graph BUILD vs beam
  * SEARCH vs exact-truth scan at one SF — regression triage for the graph
  * path (not part of the gate). Args: [sfdir] [runs]. */
object GraphTimeMain {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[30]")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[gtime] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val Assign = 2; val Degree = 12; val Beam = 32; val Hops = 4
    for (_ <- 1 to runs) {
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist()
      val n = e.count()
      val K = math.max(16L, n / 400L)
      val cents = t("centroids") { e.filter(col("vec_id") < K) }
      val edges = t("build") {
        val g = KnnGraph.build(e, cents, Assign, Degree).persist()
        g.count(); g
      }
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      t("search") {
        KnnGraph.search(e, edges, q, Seq(0L, 1L, 2L, 3L), Beam, Hops).count()
      }
      // instrumented copy of the search loop (current mechanics: per-hop
      // lineage cut via WalkScope.checkpoint — the r9 diagnosis showed a
      // plain-persist union chain re-analyses exponentially and is
      // unusable at sf0.1): where does the time go?
      t("search-instr") {
        def vdotL(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
          graft.functions.expressions.VectorExpressions.vecDot(x, y)
        val scope = new graft.core.WalkScope
        val ev = e.select(col("vec_id"), col("v"))
          .withColumn("vnorm", sqrt(vdotL(col("v"), col("v"))))
        val qh = q.withColumn("qnorm", sqrt(vdotL(col("qv"), col("qv"))))
        val cosine = (vdotL(col("qv"), col("v")) / (col("qnorm") * col("vnorm"))).as("cosine")
        val edgeTab = edges.select(col("src"), col("dst"))
        var visited = t("  entry") {
          scope.checkpoint(ev.filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L, 3L)))
            .crossJoin(broadcast(qh))
            .select(col("query_id"), col("vec_id"), cosine))
        }
        var frontier = visited.select(col("query_id"), col("vec_id"))
        val topk = graft.functions.TopKAggregator.topK(Beam)
        for (h <- 1 to Hops) {
          val scored = t(s"  h$h-score") {
            val cand = frontier
              .join(edgeTab, frontier("vec_id") === edgeTab("src"))
              .select(col("query_id"), col("dst").as("vec_id"))
              .distinct()
              .join(visited.select(col("query_id"), col("vec_id")),
                Seq("query_id", "vec_id"), "left_anti")
            scope.checkpoint(cand.join(ev, Seq("vec_id"))
              .join(broadcast(qh), Seq("query_id"))
              .select(col("query_id"), col("vec_id"), cosine))
          }
          visited = visited.union(scored)
          frontier = t(s"  h$h-topk") {
            scope.checkpoint(scored.groupBy(col("query_id"))
              .agg(topk(col("cosine"), col("vec_id")).as("top"))
              .select(col("query_id"), explode(col("top")).as("hit"))
              .select(col("query_id"), col("hit.vec_id").as("vec_id")))
          }
        }
        val n = visited.count()
        scope.release()
        n
      }
      t("truth") {
        graft.relational.QueryCatalog.byName("qs01_ann_topk").build(spark, d).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
