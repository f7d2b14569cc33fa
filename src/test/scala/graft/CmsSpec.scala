package graft

import graft.functions.CountMin
import org.scalatest.funsuite.AnyFunSuite

/** The Count-Min point-frequency sketch (qt11): one-sided error (never
  * undercounts), analytic overcount bound, mergeability, and partition-
  * layout invariance of the distributed build. */
class CmsSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 1 << 12

  /** Zipf-ish multiset: key i occurs about 3000/i times. */
  private def zipf: Seq[Long] =
    (1 to 200).flatMap(i => Seq.fill(3000 / i)(i.toLong * 0x9E3779B97F4A7C15L + i))

  test("estimates never undercount, for every key") {
    val grid = new Array[Long](D * W)
    val keys = zipf
    keys.foreach(CountMin.add(grid, _, D, W))
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (h, c) =>
      assert(CountMin.estimate(grid, h, D, W) >= c, s"undercount for $h")
    }
  }

  test("overcount stays within 3x the analytic e*N/w expectation") {
    val grid = new Array[Long](D * W)
    val keys = zipf
    keys.foreach(CountMin.add(grid, _, D, W))
    val n = keys.size.toLong
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = 3.0 * CountMin.expectedOvercount(W, n)
    exact.foreach { case (h, c) =>
      val over = CountMin.estimate(grid, h, D, W) - c
      assert(over <= bound, s"overcount $over > $bound for $h")
    }
  }

  test("merge of partial grids equals the sequential build") {
    val a = new Array[Long](D * W)
    val b = new Array[Long](D * W)
    val whole = new Array[Long](D * W)
    val keys = zipf
    val (ka, kb) = keys.splitAt(keys.size / 2)
    ka.foreach(CountMin.add(a, _, D, W))
    kb.foreach(CountMin.add(b, _, D, W))
    keys.foreach(CountMin.add(whole, _, D, W))
    val merged = a.zip(b).map { case (x, y) => x + y }
    assert(merged.sameElements(whole))
  }

  test("distributed build is partition-layout invariant and matches local") {
    val keys = zipf
    val local = new Array[Long](D * W)
    keys.foreach(CountMin.add(local, _, D, W))
    val agg = CountMin.cmsBuild(D, W)
    def built(parts: Int): Array[Long] =
      keys.toDS().repartition(parts)
        .agg(agg(org.apache.spark.sql.functions.col("value")))
        .head().getSeq[Long](0).toArray
    assert(built(1).sameElements(local))
    assert(built(8).sameElements(local))
  }

  test("jvm-side hash60 mirrors the SQL convention") {
    // TextOps.hash60 == CAST('0x'||substr(md5(x),1,15) AS BIGINT); the
    // driver-side mirror must agree so estimate lookups probe the same
    // cells the distributed build incremented
    val df = spark.createDataset(Seq("alpha", "beta", "Ωmega", "")).toDF("s")
      .select(org.apache.spark.sql.functions.col("s"),
        graft.pipeline.TextOps.hash60(org.apache.spark.sql.functions.col("s")).as("h"))
    df.collect().foreach { r =>
      assert(CountMin.hash60(r.getString(0)) == r.getLong(1), s"for '${r.getString(0)}'")
    }
  }

  test("grid sizing is validated") {
    intercept[IllegalArgumentException](new CountMin.Build(0, 1 << 12))
    intercept[IllegalArgumentException](new CountMin.Build(4, 1000)) // not 2^n
  }
}
