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
}
