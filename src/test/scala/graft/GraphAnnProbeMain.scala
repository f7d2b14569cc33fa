package graft

import graft.pipeline.KnnGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: qs27 graph-ANN recall vs the exact truth at each SF across
  * (degree, beam, hops) — threshold-margin measurement; not part of the
  * gate. */
object GraphAnnProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val Assign = 2; val NQueries = 5; val TopK = 10
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist()
      val K = math.max(16L, e.count() / 400L) // qs27's adaptive cell count
      val cents = e.filter(col("vec_id") < K)
      // exact truth: qs01's brute-force plan
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(TopK)
      val truth = scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .persist()
      truth.count()
      for (degree <- Seq(8, 12); beam <- Seq(24, 32); hops <- Seq(3, 4)) {
        val edges = KnnGraph.build(e, cents, Assign, degree).persist()
        val visited = KnnGraph.search(e, edges, q, Seq(0L, 1L, 2L, 3L), beam, hops)
        val got = visited.filter(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"))
          .agg(topk(col("cosine"), col("vec_id")).as("top"))
          .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        println(f"$sf deg=$degree beam=$beam hops=$hops avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
        spark.catalog.clearCache()
        e.persist(); truth.persist(); truth.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
