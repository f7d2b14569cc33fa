package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: filtered graph serving (GraphIndexStore.queryFiltered) recall vs
  * the exact same-label brute force at each SF across (beam, hops) — the
  * threshold-margin measurement behind the qs30 pin (re-run before
  * shrinking any constant). r13: the scoped store's edge plane is
  * label-disjoint and the walk seeds from the query's own label's
  * entries, so the filtered problem is an unfiltered one on a corpus L×
  * smaller — the grid spans the small beams that geometry serves at. */
object GraphFilteredProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[30]")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val TopK = 10
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = QueryHelpers.table(spark, d, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-gfprobe").toString
      graft.sinks.GraphIndexStore.build(e, idx, degree = 12, assign = 2,
        nEntries = 4, metaCol = Some("label"))
      spark.catalog.clearCache()
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      // exact same-label truth, per query
      val ev = e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        col("label").cast("string").as("vmeta"))
      val scored = ev.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id") && col("vmeta") === col("meta"))
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
      for (beam <- Seq(8, 16, 32, 64); hops <- Seq(3, 4)) {
        val got = graft.sinks.GraphIndexStore.queryFiltered(spark, idx,
          queries, beam, hops, TopK)
          .select(col("query_id"), col("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        println(f"$sf beam=$beam hops=$hops avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
