package graft

import graft.pipeline.{LogReg, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: train the qp09 classifier at each SF and print raw accuracy
  * (threshold-margin measurement; not part of the gate). */
object ClfProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val D = 256
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val txt = col("text")
      val toks = TextOps.tokens(txt)
      val nStop = size(filter(toks, t => t === "the" || t === "a"))
      val ratio = round(nStop.cast("double") / size(toks), 6)
      val raw = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("text"), when(ratio >= 0.06, 1.0).otherwise(0.0).as("y"))
        .as[(String, Double)]
        .map { case (t, y) => (LogReg.featurize(t, D).toSeq, y) }
        .persist()
      val (mu, sd) = LogReg.standardize(raw, D)
      val bcStat = spark.sparkContext.broadcast((mu, sd))
      val data = raw.map { case (x, y) =>
        val (m, s) = bcStat.value
        (x.indices.map(i => (x(i) - m(i)) / s(i)): Seq[Double], y)
      }.persist()
      data.count(); raw.unpersist()
      for (iters <- Seq(30, 50); lr <- Seq(0.5, 1.0, 2.0)) {
        val (w, b) = LogReg.fit(data, D, iters, lr)
        val bc = spark.sparkContext.broadcast((w, b))
        val (ok, m) = data.mapPartitions { it =>
          val (cw, cb) = bc.value
          var ok = 0L; var nn = 0L
          it.foreach { case (x, y) =>
            var z = cb; var i = 0
            while (i < cw.length) { z += cw(i) * x(i); i += 1 }
            if ((if (z > 0) 1.0 else 0.0) == y) ok += 1
            nn += 1
          }
          Iterator.single((ok, nn))
        }.collect().foldLeft((0L, 0L)) { case ((a, b2), (c, e)) => (a + c, b2 + e) }
        bc.unpersist()
        println(f"[clf] $sf iters=$iters lr=$lr acc=${ok.toDouble / m}%.4f ($ok/$m)")
      }
      data.unpersist(); bcStat.unpersist()
    }
    spark.stop()
  }
}
