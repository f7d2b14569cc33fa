package graft

import graft.relational.{PipelineQueries, QueryHelpers}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: serve-only latency of the GRAPH distributed corpus-batch path
  * (qs33_batch_only's kernel) — store built once untimed, then
  * GraphIndexStore.queryBatch over the whole corpus, 3 runs per state.
  * States: CLEAN (fresh build — the r12 verbatim-plane fast path),
  * DIRTY (after an append + delete — the full serve-view fold), and
  * RE-CLEANED (after compact). Run before/after touching the clean
  * marker, the fold, or the distributed walk. Args: [sfdir]. */
object GraphBatchTimeMain {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val slots = math.max(1, cpus - 2)
    val spark = SparkSession.builder().master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val idx = PipelineQueries.Serve.buildGraphIndex(spark, d)
    spark.catalog.clearCache()
    def time(state: String): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = PipelineQueries.Serve.queryGraphBatch(spark, d, idx).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[$state] run $i rows=$n queryBatch $sec%.3f s")
    }
    time("clean")
    // dirty the store: one small append (reverse in-edges inflate
    // neighbourhoods) + one tombstone — the full-fold path
    val e = QueryHelpers.table(spark, d, "embeddings")
    graft.sinks.GraphIndexStore.append(
      e.filter(col("vec_id") < 3)
        .select(col("vec_id") + 10000000L as "vec_id", col("embedding")),
      idx, beam = 32, hops = 4)
    graft.sinks.GraphIndexStore.delete(spark, idx, Seq(10000001L))
    spark.catalog.clearCache()
    time("dirty")
    graft.sinks.GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    time("recleaned")
    spark.stop()
  }
}
