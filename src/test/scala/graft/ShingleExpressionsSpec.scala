package graft

import graft.functions.expressions.ShingleExpressions._
import graft.pipeline.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom single-pass expressions must be bit-identical to the
  * composed higher-order-function formulation they replace (which is in
  * turn oracle-checked against DuckDB). */
class ShingleExpressionsSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaa", "aaab", "abc", "", "ab",
    "utf8 check: déjà vu — naïve façade", // multi-byte path
    "emoji 😀 and 🤖 split grams", // supplementary plane
    "x" * 500
  ).toDF("text")

  test("ShingleHash60 == array_distinct(transform(shingles, hash60))") {
    val n = 4
    val rows = texts.select(
      shingleHash60(col("text"), n).as("fast"),
      array_distinct(transform(TextOps.charShingles(col("text"), n),
        g => TextOps.hash60(g))).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted,
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("MinHashSig == per-permutation array_min(transform(...))") {
    val rows = texts.filter(length(col("text")) >= 4).select(
      minhashSig(shingleHash60(col("text"), 4), 8).as("fast"),
      TextOps.minhashSignature(shingleHash60(col("text"), 4), 8).as("ref")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("SortedLongIntersectCount == size(array_intersect) on sorted inputs") {
    val pairs = texts.as[String].filter(_.length >= 4).collect().flatMap { a =>
      texts.as[String].filter(_.length >= 4).collect().map(b => (a, b))
    }.toSeq.toDF("ta", "tb")
    val rows = pairs.select(
      sortedIntersectCount(shingleHash60(col("ta"), 4), shingleHash60(col("tb"), 4)).as("fast"),
      size(array_intersect(shingleHash60(col("ta"), 4), shingleHash60(col("tb"), 4))).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("expressions run under whole-stage codegen with fallback disabled") {
    // spark.sql.codegen.fallback=true (the default) would silently mask a
    // broken doGenCode by reverting to interpreted eval — disable it so a
    // codegen compile error fails the test instead
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = texts.filter(length(col("text")) >= 4)
        .select(col("text"), shingleHash60(col("text"), 4).as("hs"))
        .select(
          minhashSig(col("hs"), 8).as("sig"),
          sortedIntersectCount(col("hs"), col("hs")).as("self"),
          size(col("hs")).as("n"))
        .collect()
      assert(r.nonEmpty)
      r.foreach(row => assert(row.getInt(1) == row.getInt(2))) // |a ∩ a| == |a|
      r.foreach(row => assert(row.getSeq[Long](0).length == 8))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("NfcNormalize composes decomposed sequences; ASCII passes through (codegen)") {
    import graft.functions.expressions.NfcNormalize.nfc
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // "e" + combining acute U+0301 (decomposed) vs precomposed \u00e9 --
      // explicit escapes so the source encoding can't blur the fixture
      val rows = Seq("e\u0301clair", "plain ascii", "caf\u00e9", "")
        .toDF("s").select(nfc(col("s")).as("n"), length(nfc(col("s"))).as("len"))
        .collect()
      assert(rows(0).getString(0) == "\u00e9clair" && rows(0).getInt(1) == 6,
        "decomposed e + combining acute must compose to \u00e9")
      assert(rows(1).getString(0) == "plain ascii") // ASCII fast path
      assert(rows(2).getString(0) == "caf\u00e9") // already NFC
      assert(rows(3).getString(0) == "")
      // normalized identity: both spellings hash to the same dedup key
      val hashes = Seq("cafe\u0301", "caf\u00e9").toDF("s")
        .select(md5(nfc(col("s")))).collect().map(_.getString(0))
      assert(hashes(0) == hashes(1), "NFC must unify the two spellings")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("hash60 matches the documented md5-prefix convention") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72; first 15 hex digits
    // as a number = 648541476951500027 (cross-checked against DuckDB)
    val v = spark.range(1).select(TextOps.hash60(lit("abc"))).first().getLong(0)
    assert(v == 648541476951500027L)
    val f = texts.limit(1).select(shingleHash60(lit("abc"), 3)).first().getSeq[Long](0)
    assert(f == Seq(648541476951500027L))
  }

  test("SignSketch == aggregate/slice builtin fold, bit for bit (codegen)") {
    // the binary-ANN sketch pack (qs11/qs13's per-row hot path): the
    // codegen'd expression must reproduce the CodegenFallback builtin
    // fold exactly — including negative values, exact zeros (NOT set:
    // bit = x > 0), and short arrays
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rng = new scala.util.Random(42)
      val vecs = (0L until 50L).map { i =>
        (i, Seq.tabulate(64)(j =>
          if ((i + j) % 11 == 0) 0.0 else rng.nextGaussian()))
      }.toDF("id", "v")
      def fold(start1: Int, len: Int) =
        aggregate(slice(col("v"), start1, len), lit(0L),
          (acc, x) => acc * 2 + when(x > 0, 1L).otherwise(0L))
      val r = vecs.select(
        signSketch(col("v"), 0, 32).as("hi"), fold(1, 32).as("hiRef"),
        signSketch(col("v"), 32, 32).as("lo"), fold(33, 32).as("loRef"))
        .collect()
      assert(r.length == 50)
      r.foreach { row =>
        assert(row.getLong(0) == row.getLong(1), "hi half diverged")
        assert(row.getLong(2) == row.getLong(3), "lo half diverged")
      }
      // short array: fold stops at the array end on both formulations
      val short = Seq((0L, Seq(1.0, -1.0, 0.0))).toDF("id", "v")
      val sr = short.select(signSketch(col("v"), 0, 32).as("a"), fold(1, 32).as("b")).first()
      assert(sr.getLong(0) == sr.getLong(1) && sr.getLong(0) == 4L) // bits 1,0,0
      // SQL registration parity
      graft.functions.GraftExtensions.sqlFunctions.foreach { case (id, fi, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, fi, b)
      }
      val sqlR = short.createOrReplaceTempView("sketch_probe")
      val sv = spark.sql("SELECT sign_sketch(v, 0, 32) FROM sketch_probe").first().getLong(0)
      assert(sv == 4L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
