package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: qs40 MaxSim store recall vs the exact qs19 truth at each SF
  * across nProbe — the operating curve behind the gate row's nProbe=K
  * pin; not part of the gate.
  *
  * MEASURED (r14, all three SFs, 5 queries, K=16 pooled cells): on the
  * near-random synthetic embeddings the pooled proxy ranks MaxSim poorly
  * — recall at nProbe=8 reads ~0.82-0.94 avg / 0.60-0.90 min, nProbe=12
  * reads ~0.98 avg / 0.90 min (sf0.1 happens to read 1.0), and the true
  * top-10's worst member sits past 60% of ANY proxy ranking measured
  * (pooled cosine, full-vector cosine, sub-vs-pooled sums — driver-side
  * numpy sweep, r14). So no nProbe < K is gate-safe across testdata
  * regenerations: the gate pins nProbe = K (exact by construction) and
  * this curve documents what the approximate knob buys on clusterable
  * data. The two provable contracts (recall nondecreasing in nProbe,
  * exactly 1.0 at nProbe=K) are spec-pinned in MaxSimIndexStoreSpec. */
object MaxSimProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val NQueries = 5; val TopK = 10; val Subs = 4; val SubDim = 16; val K = 16
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$d/embeddings.parquet").persist()
      // exact truth: qs19's brute-force MaxSim plan, verbatim conventions
      def sub(v: Column, i: Int): Column = slice(v, i * SubDim + 1, SubDim)
      def vd(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
      def scos(a: Column, b: Column): Column =
        vd(a, b) / (sqrt(greatest(vd(a, a), lit(1e-30))) *
          sqrt(greatest(vd(b, b), lit(1e-30))))
      val ev = e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      val q = ev.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val maxsim = (0 until Subs).map { i =>
        round(greatest((0 until Subs).map(j =>
          scos(sub(col("qv"), i), sub(col("v"), j))): _*), 12)
      }.reduce(_ + _)
      val scored = ev.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), maxsim.as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(TopK)
      val truth = scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .persist()
      truth.count()
      val idx = java.nio.file.Files.createTempDirectory("graft-maxsimprobe").toString
      graft.sinks.MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
      spark.catalog.clearCache(); e.persist(); truth.persist(); truth.count()
      for (nProbe <- Seq(4, 8, 12, 16)) {
        val got = graft.sinks.MaxSimIndexStore.query(spark, idx, q, nProbe, TopK)
          .select(col("query_id"), col("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        println(f"$sf nprobe=$nProbe%2d avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
        spark.catalog.clearCache()
        e.persist(); truth.persist(); truth.count()
      }
      truth.unpersist()
      // RANGE ANSWER LOSS vs nProbe (r15 — the curve behind
      // [[MaxSimIndexStore.rangeQuery]]'s WARNING): unlike the PQ range
      // path's lossless ADC-margin cut, a sub-K probe here silently
      // drops qualifying answers whose pooled cell went unprobed — this
      // measures exactly how many, at the qs42 gate radius. Truth = the
      // nProbe=K sweep (exact by construction).
      val Radius = 1.5
      // the exact sweep's (query_id, vec_id) pairs collect ONCE (answer
      // sets are radius-bounded and small here) — re-persisting through
      // the clearCache cycle would re-run the brute-force sweep per
      // grid point (r15 review finding)
      val sweepTruth: Set[(Long, Long)] = graft.sinks.MaxSimIndexStore
        .rangeQuery(spark, idx, q, K, Radius)
        .select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache(); e.persist()
      val nTruth = sweepTruth.size
      for (nProbe <- Seq(4, 8, 12)) {
        val got = graft.sinks.MaxSimIndexStore
          .rangeQuery(spark, idx, q, nProbe, Radius)
          .select(col("query_id"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val kept = (got & sweepTruth).size
        val loss = if (nTruth == 0) 0.0 else 1.0 - kept.toDouble / nTruth
        println(f"$sf range nprobe=$nProbe%2d kept=$kept/$nTruth loss=$loss%.3f")
        spark.catalog.clearCache()
        e.persist()
      }
      e.unpersist()
    }
    spark.stop()
  }
}
