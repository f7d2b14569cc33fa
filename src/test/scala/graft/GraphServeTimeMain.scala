package graft

import graft.relational.PipelineQueries
import org.apache.spark.sql.SparkSession

/** Probe: GraphIndexStore serve-only latency — build once untimed, time N
  * serves of the qs28 batch (Bench's `qs28_graph_only` shape) for
  * regression triage of the driver-fold walk. Args: [sfdir] [runs]. */
object GraphServeTimeMain {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[30]")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = PipelineQueries.Serve.buildGraphIndex(spark, d)
    spark.catalog.clearCache()
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = PipelineQueries.Serve.queryGraphIndex(spark, d, idx).count()
      System.err.println(
        f"[gserve] run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
