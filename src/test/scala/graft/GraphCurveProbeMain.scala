package graft

import graft.relational.PipelineQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the qs38 operating curve measured from the STORE — recall vs
  * the exact truth and avg visited candidates per query at
  * beam ∈ {16,32,48,64} × hops ∈ {3,4}, per SF. Run before touching the
  * qs38 gate constants, the beam-monotonicity gate, or the walk. */
object GraphCurveProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val NQueries = 5
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val idx = PipelineQueries.Serve.buildGraphIndex(spark, d)
      spark.catalog.clearCache()
      val queries = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < NQueries).persist()
      val truth = graft.relational.QueryCatalog.byName("qs01_ann_topk")
        .build(spark, d).select(col("query_id"), col("vec_id")).persist()
      truth.count()
      for (b <- Seq(16, 32, 48, 64); h <- Seq(3, 4)) {
        val vis = graft.sinks.GraphIndexStore
          .visitedCandidates(spark, idx, queries, b, h).persist()
        val avgVisited = vis.count().toDouble / NQueries
        val topk = graft.functions.TopKAggregator.topK(10)
        val got = vis.filter(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"))
          .agg(topk(col("cosine"), col("vec_id")).as("top"))
          .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        vis.unpersist()
        println(f"$sf beam=$b hops=$h avg=${rec.getDouble(0)}%.3f " +
          f"min=${rec.getDouble(1)}%.3f visited/q=$avgVisited%.0f")
        truth.persist(); truth.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
