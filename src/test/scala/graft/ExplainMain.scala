package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of a catalog query (debug helper). */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.relational.QueryCatalog.byName(args(0))
    val df = q.build(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.explain("formatted")
    spark.stop()
  }
}
