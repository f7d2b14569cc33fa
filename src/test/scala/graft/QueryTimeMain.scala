package graft

import graft.relational.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Time one catalog query in isolation (fresh JVM). */
object QueryTimeMain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "qs01_ann_topk"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
