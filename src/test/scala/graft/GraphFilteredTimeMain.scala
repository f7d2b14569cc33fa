package graft

import graft.relational.QueryHelpers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: serve-only latency of the FILTERED graph distributed
  * corpus-batch path (qs35_batch_only's kernel) — scoped store built once
  * untimed, then GraphIndexStore.queryFilteredBatch over the whole corpus
  * (each query scoped to its own label), min of 3 at the pinned
  * constants, plus the unfiltered twin for the scope-cut ratio. r13
  * context: the label-disjoint edge plane + per-label seeding walk
  * replaces the beam-64 rank-filter (r12 baseline 7.06 s in-suite at
  * sf0.1); the scoped walk runs at beam 32 over subgraphs L× smaller.
  * Run before/after touching the scoped build or the seeded walk. */
object GraphFilteredTimeMain {
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
    val idx = java.nio.file.Files.createTempDirectory("graft-gft").toString
    graft.sinks.GraphIndexStore.build(e, idx, degree = 12, assign = 2,
      nEntries = 4, metaCol = Some("label"))
    spark.catalog.clearCache()
    val qf = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"),
      col("label").cast("string").as("meta"))
    val q = qf.select(col("query_id"), col("qv"))
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.sinks.GraphIndexStore.queryFilteredBatch(spark, idx, qf,
        beam = 32, hops = 4, topK = 10).count()
      val tf = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.sinks.GraphIndexStore.queryBatch(spark, idx, q,
        beam = 32, hops = 4, topK = 10).count()
      val tu = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"filteredBatch(beam32) $tf%.3f s | unfiltered queryBatch(beam32) $tu%.3f s")
    }
    spark.stop()
  }
}
