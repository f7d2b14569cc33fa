package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: qs40 serve-path latency decomposition (not gated) — times the
  * in-query qs19 plan vs the store's driver serve (the hoisted-norm FLOP
  * win) and the corpus batch (qs40_batch_only's kernel), and prints the
  * batch plan's join strategy + scored-stage partition count, the
  * suspected parallelism ceiling at nProbe=K (join-key cardinality = K
  * cells ≤ slots). Bench's scheduler config. */
object MaxSimTimeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors()
    val slots = math.max(1, cpus - 2)
    val spark = SparkSession.builder().master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[mstime] $tag%-22s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
        spark.catalog.clearCache()
      }
    }
    val idx = PipelineQueries_buildMaxSim(spark, sfDir)
    val e = graft.relational.QueryHelpers.table(spark, sfDir, "embeddings")
    val q5 = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    val corpus = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    time("qs19_inquery") {
      graft.relational.QueryCatalog.byName("qs19_multivector_maxsim")
        .build(spark, sfDir).count()
    }
    time("store_query5") {
      graft.sinks.MaxSimIndexStore.query(spark, idx, q5, 16, 10).count()
    }
    val batchDf = graft.sinks.MaxSimIndexStore.queryBatch(spark, idx, corpus, 16, 10)
    println("[mstime] batch plan skeleton:\n" +
      batchDf.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan parquet") || l.contains("Aggregate") ||
          l.contains("AQE"))
        .map(_.take(200)).mkString("\n"))
    spark.catalog.clearCache()
    time("store_batch") {
      graft.sinks.MaxSimIndexStore.queryBatch(spark, idx, corpus, 16, 10).count()
    }
    // the suspected fix: spread the posted probe rows to scheduler width
    // BEFORE the broadcast-posting join pipelines the pair scoring onto
    // their partitions (corpus arrives as ~1 parquet split here)
    time("store_batch_repart") {
      graft.sinks.MaxSimIndexStore.queryBatch(spark, idx,
        corpus.repartition(slots), 16, 10).count()
    }
    spark.stop()
  }

  private def PipelineQueries_buildMaxSim(spark: SparkSession, d: String): String = {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mstime").toString
    graft.sinks.MaxSimIndexStore.build(
      graft.relational.QueryHelpers.table(spark, d, "embeddings"),
      k = 16, subs = 4, subDim = 16, idxDir)
    idxDir
  }
}
