package graft

import graft.functions.GraftOptimizations
import graft.functions.expressions.ShingleExpressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rules must rewrite plans (elide redundant work
  * the built-in optimizer can't know is redundant) WITHOUT changing
  * results. */
class ExtensionsSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  // repartition keeps the projection out of ConvertToLocalRelation's reach —
  // otherwise the optimizer folds the whole query into a LocalRelation and
  // the plan-shape assertions below would be vacuous
  private val texts = Seq("the quick brown fox", "aaaa bbbb cccc", "abcd")
    .toDF("text").repartition(2)

  test("array_distinct over ShingleHash60 is elided; self-intersect becomes size") {
    spark.experimental.extraOptimizations = Seq(GraftOptimizations)
    try {
      val df = texts.select(
        array_distinct(shingleHash60(col("text"), 4)).as("hs"),
        sortedIntersectCount(shingleHash60(col("text"), 4),
          shingleHash60(col("text"), 4)).as("selfCount"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("array_distinct"),
        s"redundant distinct must be elided:\n$optimized")
      assert(!optimized.toLowerCase.contains("sortedlongintersectcount"),
        s"self-intersection must rewrite to size:\n$optimized")
      // and the results are unchanged
      val rows = df.collect()
      rows.foreach { r =>
        val hs = r.getSeq[Long](0)
        assert(hs == hs.distinct && hs == hs.sorted, "contract: sorted+distinct")
        assert(r.getInt(1) == hs.length, "selfCount must equal size")
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("SQL functions: custom expressions reachable from plain SQL") {
    // a SQL-only user on a session configured with GraftExtensions gets
    // the same codegen'd expressions the Scala API uses; register the
    // shared descriptors on the live session and drive them through SQL
    import graft.functions.GraftExtensions
    GraftExtensions.sqlFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    texts.createOrReplaceTempView("ext_texts")
    val rows = spark.sql("""
      SELECT shingle_hash60(text, 4) AS hs,
             minhash_sig(shingle_hash60(text, 4), 8) AS sig,
             sorted_intersect_count(shingle_hash60(text, 4),
                                    shingle_hash60(text, 4)) AS self_n,
             nfc_normalize(text) AS norm
      FROM ext_texts""").collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(hs == hs.sorted && hs == hs.distinct)
      assert(r.getSeq[Long](1).length == 8)
      assert(r.getInt(2) == hs.length)
    }
    // SQL and Scala-API forms must agree exactly
    val viaSql = spark.sql("SELECT shingle_hash60(text, 4) AS hs FROM ext_texts")
      .collect().map(_.getSeq[Long](0).toVector).toSet
    val viaApi = texts.select(shingleHash60(col("text"), 4).as("hs"))
      .collect().map(_.getSeq[Long](0).toVector).toSet
    assert(viaSql == viaApi)
    // arity-style args must be literals (they size codegen'd loops)
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hash60(text, length(text)) FROM ext_texts").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("rule is inert for distinct over other arrays and differing operands") {
    spark.experimental.extraOptimizations = Seq(GraftOptimizations)
    try {
      val df = texts.select(
        array_distinct(split(col("text"), " ")).as("words"),
        sortedIntersectCount(shingleHash60(col("text"), 4),
          shingleHash60(concat(col("text"), lit("x")), 4)).as("crossCount"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("array_distinct"),
        "distinct over non-contract arrays must survive")
      assert(optimized.toLowerCase.contains("sortedlongintersectcount"),
        "different operands must not rewrite")
      df.collect() // still executes
    } finally spark.experimental.extraOptimizations = Nil
  }
}
