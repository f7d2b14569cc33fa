package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: serve-only latency of the PQ distributed corpus-batch path
  * (qs32_batch_only's kernel) — store built once untimed, then
  * IvfPqIndexStore.queryBatch over the whole corpus, min of 3. Run
  * before/after touching the batch ADC join shape. */
object PqBatchTimeMain {
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
    val idx = java.nio.file.Files.createTempDirectory("graft-pqbt").toString
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    // sensitivity grid: which stage dominates — the ADC scan (scales with
    // nProbe) or the exact rerank (scales with candK)?
    for ((np, ck) <- Seq((10, 240), (10, 24), (2, 240), (10, 240))) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.sinks.IvfPqIndexStore.queryBatch(spark, idx, q,
          nProbe = np, topK = 10, candK = ck).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"run $i nprobe=$np candK=$ck queryBatch $sec%.3f s")
      }
    }
    spark.stop()
  }
}
