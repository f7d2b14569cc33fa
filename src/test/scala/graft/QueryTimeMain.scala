package graft

import graft.relational.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Time one catalog query in isolation (fresh JVM).
  *
  * Scheduler config MIRRORS Bench (local[cpus−2] slots, shuffle partitions
  * = slots): this main exists to re-time bench rows in a calm window, so a
  * reading here must be apples-to-apples with the bench minima — a fully
  * subscribed local[n] serializes scheduler RPC behind thread wakeups under
  * host contention and reads systematically slower (see Bench's note). */
object QueryTimeMain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "qs01_ann_topk"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val slots = math.max(1, cpus.toInt - 2)
    val spark = SparkSession.builder()
      .master(s"local[$slots]")
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = QueryCatalog.byName(name)
    // warmup at sf0.001
    q.build(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      q.build(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[scratch] $name run$i $sec%.3f s")
    }
    q.build(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
