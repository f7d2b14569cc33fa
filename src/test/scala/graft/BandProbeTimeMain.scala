package graft

import graft.relational.PipelineQueries
import org.apache.spark.sql.SparkSession

/** Probe: BandIndexStore serve-only latency — build once untimed, time N
  * probes of the qd17 held-out batch (Bench's `qd17_probe_only` shape)
  * for regression triage of the band probe path. Written for the r14
  * verdict's drift adjudication (qd17_probe_only read 1.89 → 2.36 →
  * 2.89 in-suite over r12-r14 while calm references stayed flat).
  * Args: [sfdir] [runs]. */
object BandProbeTimeMain {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[30]")
      .config("spark.sql.shuffle.partitions", "30")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = PipelineQueries.Serve.buildBandIndex(spark, d)
    spark.catalog.clearCache()
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = PipelineQueries.Serve.probeBandIndex(spark, d, idx).count()
      System.err.println(
        f"[bprobe] run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
