package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the ADC quantization-error margin for the PQ RANGE prefilter
  * (qs39). For the whole corpus as a query batch at the gate geometry
  * (k=16, 8x256 codebooks, nProbe=4), measures over every probed
  * (query, candidate) pair: max(cosine - adc) — the one-sided error the
  * prefilter margin must cover for the ADC cut to be LOSSLESS (every
  * true >= radius answer must survive to the exact verify) — plus the
  * symmetric max |cosine - adc| and the pair count the margin admits at
  * radius 0.30 for a given candidate-volume feel. Run before shrinking
  * IvfPqIndexStore.rangeQueryBatch's AdcRangeMargin. */
object PqRangeProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val slots = math.max(1, cpus - 2)
    val spark = SparkSession.builder().master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$d/embeddings.parquet")
      val idx = java.nio.file.Files.createTempDirectory("graft-pqrange").toString
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
      spark.catalog.clearCache()
      val q = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      // margin 1.0 disables the prefilter: the probe sees EVERY probed
      // pair's (adc, cosine) through the exact serve kernels
      val scored = graft.sinks.IvfPqIndexStore.rangeScoredPairs(
        spark, idx, q, nProbe = 4)
      val stats = scored.agg(
        max(col("cosine") - col("adc")).as("max_under"),
        // the margin rangeQueryBatch actually needs: an answer is dropped
        // iff margin < radius - adc, so the binding statistic is
        // max(radius - adc) over TRUE answers (cosine >= radius)
        max(when(col("cosine") >= 0.30, lit(0.30) - col("adc"))).as("needed_margin"),
        count(lit(1)).as("pairs"),
        sum(when(col("cosine") >= 0.30, 1L).otherwise(0L)).as("answers"),
        sum(when(col("adc") >= 0.30 - 0.20, 1L).otherwise(0L)).as("admitted_m020"),
        sum(when(col("adc") >= 0.30 - 0.28, 1L).otherwise(0L)).as("admitted_m028"))
        .collect()(0)
      println(f"$sf max_under=${stats.getDouble(0)}%.4f " +
        f"needed_margin=${stats.getDouble(1)}%.4f pairs=${stats.getLong(2)} " +
        f"answers=${stats.getLong(3)} admitted(m=.20)=${stats.getLong(4)} " +
        f"admitted(m=.28)=${stats.getLong(5)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
