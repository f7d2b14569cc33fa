package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: qs31 IVF-PQ store recall vs the exact truth at each SF across
  * (nProbe, candK) — threshold-margin measurement; not part of the gate.
  * Geometry held at the gate row's K=16 cells / S=8 / SubK=256. */
object PqIndexProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val NQueries = 5; val TopK = 10
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$d/embeddings.parquet").persist()
      // exact truth: qs01's brute-force plan
      val ev = e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      val q = ev.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = ev.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(TopK)
      val truth = scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .persist()
      truth.count()
      val idx = java.nio.file.Files.createTempDirectory(s"graft-pqprobe").toString
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
      spark.catalog.clearCache(); e.persist(); truth.persist(); truth.count()
      for (nProbe <- Seq(8, 10); candK <- Seq(16 * TopK, 24 * TopK)) {
        val got = graft.sinks.IvfPqIndexStore.query(spark, idx, q, nProbe,
          TopK, candK).select(col("query_id"), col("vec_id"))
        val rec = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
          .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
          .collect()(0)
        println(f"$sf nprobe=$nProbe candk=$candK avg=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.3f")
        spark.catalog.clearCache()
        e.persist(); truth.persist(); truth.count()
      }
      // corpus-batch recall (qs32's contract): EVERY vector queries via
      // the distributed queryBatch path; truth = exact all-pairs top-10
      val allQ = ev.select(col("vec_id").as("query_id"), col("v").as("qv"))
      val allScored = ev.crossJoin(allQ)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _) /
            (sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0.0), _ + _)) *
             sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))).as("cosine"))
      val allTruth = allScored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
        .persist()
      allTruth.count()
      val gotAll = graft.sinks.IvfPqIndexStore.queryBatch(spark, idx, allQ,
        nProbe = 10, topK = TopK, candK = 240)
        .select(col("query_id"), col("vec_id"))
      val recAll = allTruth.join(gotAll.withColumn("hit", lit(1L)),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
        .agg(avg(col("recall")).as("r"), min(col("recall")).as("rmin"))
        .collect()(0)
      println(f"$sf corpus-batch nprobe=10 candk=240 avg=${recAll.getDouble(0)}%.3f min=${recAll.getDouble(1)}%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
