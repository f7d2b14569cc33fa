package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: filtered PQ serving (IvfPqIndexStore.queryFiltered) recall vs
  * the exact same-label brute force at each SF across (nProbe, candK) —
  * the threshold-margin measurement behind the qs36 pin (re-run before
  * shrinking any constant). r13: the hot plane is (cell, meta)-scoped,
  * so every ADC candidate is already within-label — candK truncation is
  * within-scope and the only loss mechanism left is probe loss (a
  * same-label neighbour in an unprobed cell), the same statistic the
  * unfiltered qs31 pin carries. The grid spans the plain constants the
  * scoped layout is meant to serve at (NProbe=10 / CandK=24·topK) plus
  * the old rank-filter oversample points for comparison. */
object PqFilteredProbeMain {
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
        .createTempDirectory(s"graft-pqfprobe").toString
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx,
        metaCol = Some("label"))
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
      for (nProbe <- Seq(8, 10, 16); candK <- Seq(12 * TopK, 24 * TopK, 48 * TopK)) {
        val got = graft.sinks.IvfPqIndexStore.queryFiltered(spark, idx,
          queries, nProbe, TopK, candK)
          .select(col("query_id"), col("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        println(f"$sf nprobe=$nProbe candK=$candK avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
