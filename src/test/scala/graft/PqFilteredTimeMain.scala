package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: serve-only latency of the FILTERED PQ distributed corpus-batch
  * path (qs36_batch_only's kernel) — scoped store built once untimed,
  * then IvfPqIndexStore.queryFilteredBatch over the whole corpus (each
  * query scoped to its own label), min of 3 at the pinned constants plus
  * the unfiltered twin for the scope-cut ratio. r13 context: the
  * (cell, meta)-partitioned hot plane serves the filter as partition
  * pruning (scan ~1/L of the code bytes) at CandK = the plain 24·topK;
  * the r12 rank-filter design paid NProbe=16/CandK=480 over the FULL
  * plane and read 19.99 s in-suite at sf0.1. Run before/after touching
  * the scoped layout or the filtered join shape. */
object PqFilteredTimeMain {
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
    val idx = java.nio.file.Files.createTempDirectory("graft-pqft").toString
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx,
      metaCol = Some("label"))
    spark.catalog.clearCache()
    val qf = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"),
      col("label").cast("string").as("meta"))
    val q = qf.select(col("query_id"), col("qv"))
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.sinks.IvfPqIndexStore.queryFilteredBatch(spark, idx, qf,
        nProbe = 16, topK = 10, candK = 240).count()
      val tf = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.sinks.IvfPqIndexStore.queryBatch(spark, idx, q,
        nProbe = 10, topK = 10, candK = 240).count()
      val tu = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"filteredBatch(16,240) $tf%.3f s | unfiltered queryBatch(10,240) $tu%.3f s")
    }
    spark.stop()
  }
}
