package graft

import graft.relational.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data, for every join type") {
    // heavy skew: 90% of left rows share one key
    val left = (0 until 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, s"l$i")).toDF("k", "lv")
    val right = (0L until 50L).map(k => (k, s"r$k")).toDF("rk", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, col("k") === col("rk"), jt)
        .select("k", "lv", "rv").collect().map(_.toString).sorted
      val salted = SkewJoin.saltedEquiJoin(left, right, "k", "rk", 8, jt)
        .select("k", "lv", "rv").collect().map(_.toString).sorted
      assert(salted.toSeq == plain.toSeq, s"join type $jt")
    }
  }

  test("salting spreads a hot key across buckets") {
    val left = (0 until 100).map(i => (1L, s"x$i")).toDF("k", "lv")
    val right = Seq((1L, "r")).toDF("rk", "rv")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(8)))
    // the hot key's rows land in more than one salt bucket
    assert(salted.select("__salt").distinct().count() > 1)
    assert(SkewJoin.saltedEquiJoin(left, right, "k", "rk", 8).count() == 100)
  }

  // ---- q21 under bursty event-time skew -------------------------------
  // q21's range join bins the time dimension, so a traffic burst (one hot
  // five-minute window) funnels into one bin key — exactly the skew the
  // binned plan inherits. These tests pin BOTH mitigations on the q21 join
  // shape itself: AQE splits the hot bin's shuffle partition at runtime,
  // and explicit salting on the bin key preserves results when AQE is
  // unavailable (e.g. the join is not sort-merge).

  private val BandUs = 300000000L // q21's five-minute band
  /** Bursty fixture: `nHot` events inside one band (mutually neighbors)
    * plus isolated stragglers spaced a day apart (no neighbors). */
  private def burstyEvents(nHot: Int, nCold: Int) =
    ((0 until nHot).map(i => (i.toLong, 10L * BandUs + i)) ++
      (0 until nCold).map(i => ((nHot + i).toLong, 1000L * BandUs * (i + 1))))
      .toDF("event_id", "eus")

  private def binnedNeighborCounts(e: org.apache.spark.sql.DataFrame) = {
    val a = e.withColumn("bin", floor(col("eus") / BandUs))
    val b = e.select(col("event_id").as("other_id"), col("eus").as("ous"))
      .withColumn("obin", floor(col("ous") / BandUs))
      .withColumn("bin", explode(array(col("obin") - 1, col("obin"), col("obin") + 1)))
      .drop("obin")
    a.join(b, Seq("bin"))
      .filter(col("event_id") =!= col("other_id") &&
        abs(col("eus") - col("ous")) <= BandUs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_neighbors"))
  }

  test("AQE splits the hot bin of q21's binned join (skewed shuffle partition)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> conf.get(k))
    // force the shuffle-join path and scale AQE's skew thresholds down to
    // fixture size (defaults target multi-GB partitions)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val nHot = 3000
      val df = binnedNeighborCounts(burstyEvents(nHot, 40))
      val rows = df.collect()
      // correctness under the burst: every hot event sees the other
      // nHot-1; stragglers have no neighbors and don't appear
      assert(rows.length == nHot && rows.forall(_.getLong(1) == nHot - 1))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark/split the hot bin's partition:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("salting the bin key preserves q21 results on the bursty fixture") {
    val e = burstyEvents(400, 30)
    val a = e.withColumn("bin", floor(col("eus") / BandUs))
    val b = e.select(col("event_id").as("other_id"), col("eus").as("ous"))
      .withColumn("obin", floor(col("ous") / BandUs))
      .withColumn("bin_r", explode(array(col("obin") - 1, col("obin"), col("obin") + 1)))
      .drop("obin")
    val salted = SkewJoin.saltedEquiJoin(a, b, "bin", "bin_r", 8)
      .filter(col("event_id") =!= col("other_id") &&
        abs(col("eus") - col("ous")) <= BandUs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_neighbors"))
    val plain = binnedNeighborCounts(e)
    assert(salted.orderBy("event_id").collect().toSeq ==
      plain.orderBy("event_id").collect().toSeq)
  }
}
