package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe (r14, not gated): qs24's corpus-batch kernel with and without
  * the posted relation spread to scheduler width — the MaxSim batch
  * path's parallelism-ceiling class (the corpus postings broadcast at
  * small SFs, so the cosine stage pipelines onto the posted probe rows'
  * partitions — one parquet split unless spread). */
object IvfBatchTimeMain {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val slots = math.max(1, cpus - 2)
    val spark = SparkSession.builder().master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val e = QueryHelpers.table(spark, d, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfbt").toString
    graft.sinks.IvfIndexStore.build(e, 16, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    for ((tag, batch) <- Seq(("as_arrived", q), ("pre_spread", q.repartition(slots)))) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.sinks.IvfIndexStore.queryBatch(spark, idx, batch,
          nProbe = 4, topK = 3).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[ivfbt] $tag%-12s run$i $sec%8.3f s")
      }
    }
    spark.stop()
  }
}
