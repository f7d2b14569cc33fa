package graft

import graft.relational.{PipelineQueries, QueryCatalog, QueryHelpers}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: qs29 graph-store delete-serve recall vs the surviving-corpus
  * truth at each SF — the threshold-margin measurement behind the 0.90
  * pin (re-run before shrinking any qs29 constant). Replicates the gate
  * row's exact path through the catalog Serve helpers so the probe can't
  * drift from the query. */
object GraphDeleteProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val idxDir = PipelineQueries.Serve.buildGraphIndex(spark, d)
      val truthFull = QueryCatalog.byName("qs01_ann_topk").build(spark, d)
      val deleted = truthFull
        .filter(col("rank") === 1 && col("vec_id") >= 5)
        .select(col("vec_id")).distinct().as[Long].collect().sorted.toSeq
      graft.sinks.GraphIndexStore.delete(spark, idxDir, deleted)
      val served = PipelineQueries.Serve.queryGraphIndex(spark, d, idxDir)
        .select(col("query_id"), col("vec_id")).persist()
      val nDeletedServed = served
        .filter(col("vec_id").isInCollection(deleted)).count()
      val e = QueryHelpers.table(spark, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = e.filter(!col("vec_id").isInCollection(deleted))
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(10)
      val truth = scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val rec = truth.join(served.withColumn("hit", lit(1L)),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
        .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
        .collect()(0)
      println(f"$sf nDeleted=${deleted.length} deletedServed=$nDeletedServed " +
        f"avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
