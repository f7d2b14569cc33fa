package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe (r14, not gated): does AQE's post-shuffle partition coalescing
  * starve the PQ corpus-batch ADC/rerank stages? The candidate shuffle's
  * BYTES are slim (8-byte codes + ids), so AQE's 64 MB advisory target
  * can legally coalesce the stage that then EXPANDS each row against a
  * 2 KB broadcast-joined ADC table — the classic narrow-stage trap the
  * MaxSim batch path had (13.6 -> 2.3 s). Grid: coalescing on/off and a
  * smaller advisory size, same kernel otherwise. */
object PqCoalesceProbeMain {
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
    val idx = java.nio.file.Files.createTempDirectory("graft-pqcoal").toString
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    for ((tag, setup) <- Seq[(String, () => Unit)](
      ("baseline", () => ()),
      ("coalesce_off", () =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")),
      ("advisory_1m", () => {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      }),
      ("baseline_again", () => {
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      }))) {
      setup()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.sinks.IvfPqIndexStore.queryBatch(spark, idx, q,
          nProbe = 10, topK = 10, candK = 240).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[pqcoal] $tag%-16s run$i $sec%8.3f s")
      }
    }
    spark.stop()
  }
}
