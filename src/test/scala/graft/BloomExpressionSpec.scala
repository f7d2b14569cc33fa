package graft

import graft.functions.Bloom
import graft.functions.expressions.BloomExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd Bloom probe must agree probe-for-probe with
  * `Bloom.mightContain` (which the qd10 contracts are defined against),
  * stay inside whole-stage codegen with fallback disabled, and be
  * reachable from plain SQL through the GraftExtensions registration. */
class BloomExpressionSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val K = 4
  private val MBits = 1 << 12

  private def buildFilter(keys: Seq[Long]): Array[Long] = {
    val bits = new Array[Long](MBits / 64)
    keys.foreach(h => Bloom.set(bits, h, K))
    bits
  }

  test("expression probes agree with Bloom.mightContain for members and non-members") {
    val members = (0L until 200L).map(i => i * 0x9E3779B97F4A7C15L >>> 4)
    val bits = buildFilter(members)
    val bc = spark.sparkContext.broadcast(bits)
    try {
      val probes = (members.take(50) ++ (1000L until 1200L).map(_ * 31L + 7L))
      val rows = probes.toDF("h").repartition(3)
        .withColumn("hit", BloomExpressions.bloomMightContain(col("h"), bc, K))
        .collect()
      assert(rows.length == probes.length)
      rows.foreach { r =>
        assert(r.getBoolean(1) == Bloom.mightContain(bits, r.getLong(0), K),
          s"probe mismatch at h=${r.getLong(0)}")
      }
      // one-sided error: every inserted key is a hit
      val memberHits = members.toDF("h")
        .withColumn("hit", BloomExpressions.bloomMightContain(col("h"), bc, K))
        .filter(!col("hit")).count()
      assert(memberHits == 0, "a Bloom filter can never false-negative")
    } finally bc.unpersist()
  }

  test("probe runs under whole-stage codegen with fallback disabled") {
    val bits = buildFilter(Seq(11L, 22L, 33L))
    val bc = spark.sparkContext.broadcast(bits)
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq(11L, 22L, 33L, 44L, 55L).toDF("h").repartition(2)
        .withColumn("hit", BloomExpressions.bloomMightContain(col("h"), bc, K))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(Seq(11L, 22L, 33L).forall(got(_)))
      assert(got ==
        Seq(11L, 22L, 33L, 44L, 55L).map(h => h -> Bloom.mightContain(bits, h, K)).toMap)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", saved)
      bc.unpersist()
    }
  }

  test("SQL registration: bloom_might_contain over a constant filter array") {
    import graft.functions.GraftExtensions
    GraftExtensions.sqlFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val bits = buildFilter(Seq(5L, 17L))
    val bitsSql = bits.mkString("array(", "L,", "L)")
    Seq(5L, 17L, 99L).toDF("h").repartition(2).createOrReplaceTempView("bloom_probe_t")
    val got = spark.sql(
      s"SELECT h, bloom_might_contain(h, $bitsSql, $K) AS hit FROM bloom_probe_t")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(5L) && got(17L))
    assert(got(99L) == Bloom.mightContain(bits, 99L, K))
    // a per-row (non-constant) bits argument must be rejected
    val err = intercept[Exception] {
      spark.sql(s"SELECT bloom_might_contain(h, array(h), $K) FROM bloom_probe_t")
        .collect()
    }
    assert(err.getMessage.contains("constant"))
  }
}
