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

  test("VecDot == aggregate(zip_with(...)) builtin fold, bit for bit (codegen)") {
    // the engine-wide dot-product kernel (every cosine/norm in the ANN
    // paths, the IVF store's persisted vnorm, the kNN-graph build): the
    // fused loop must reproduce the CodegenFallback builtin left fold on
    // the FULL semantic surface — same IEEE sequence on equal-length
    // arrays (raw-bit equality, not epsilon), null on length mismatch,
    // null propagation from null elements, 0.0 seed on empty arrays
    import graft.functions.expressions.VectorExpressions.vecDot
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ref = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
      // seeded vectors incl. exact zeros, denormal-scale and huge values —
      // any reassociation or FMA contraction in the fused loop would show
      val rng = new scala.util.Random(7)
      val vecs = (0L until 40L).map { i =>
        (i, Seq.tabulate(64)(j => rng.nextGaussian() *
            (if (j % 13 == 0) 1e-300 else if (j % 17 == 0) 1e300 else 1.0)),
          Seq.tabulate(64)(_ => rng.nextGaussian()))
      }.toDF("id", "x", "y")
      val rows = vecs.select(vecDot(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(rows.length == 40)
      rows.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"IEEE sequence diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
      // edge surface: empty → 0.0; length mismatch → null; null element →
      // null; null array → null — each checked against the builtin
      val edges = spark.sql("""
        SELECT * FROM VALUES
          (CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)),
          (array(1.0D, 2.0D), array(3.0D)),
          (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
          (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D)) t(x, y)""")
      val er = edges.select(vecDot(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(er(0).getDouble(0) == 0.0 && er(0).getDouble(1) == 0.0)
      (1 to 3).foreach { i =>
        assert(er(i).isNullAt(0) == er(i).isNullAt(1) && er(i).isNullAt(0),
          s"edge row $i: fast=${er(i)} must be null like the builtin")
      }
      // SQL registration parity
      graft.functions.GraftExtensions.sqlFunctions.foreach { case (id, fi, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, fi, b)
      }
      vecs.createOrReplaceTempView("vecdot_probe")
      val sqlRows = spark.sql(
        "SELECT vec_dot(x, y) FROM vecdot_probe ORDER BY id").collect()
      sqlRows.zip(vecs.orderBy(col("id"))
          .select(ref(col("x"), col("y"))).collect()).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(0)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("VecL2Sq == aggregate(zip_with diff-square) builtin fold, bit for bit (codegen)") {
    // the kNN-graph build's distributed cell-assignment kernel: the fused
    // squared-L2 loop must reproduce BOTH the builtin left fold and (by
    // construction, same arithmetic) the driver-side widening loop's
    // `acc += d*d` — raw-bit equality, null on length mismatch / null
    // element, 0.0 on empty arrays. A divergence here would silently move
    // vectors across fine cells and shift every graph recall margin.
    import graft.functions.expressions.VectorExpressions.vecL2Sq
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ref = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        aggregate(zip_with(x, y, (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)
      val rng = new scala.util.Random(11)
      val vecs = (0L until 40L).map { i =>
        (i, Seq.tabulate(64)(j => rng.nextGaussian() *
            (if (j % 13 == 0) 1e-300 else if (j % 17 == 0) 1e300 else 1.0)),
          Seq.tabulate(64)(_ => rng.nextGaussian()))
      }.toDF("id", "x", "y")
      val rows = vecs.select(vecL2Sq(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(rows.length == 40)
      rows.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"IEEE sequence diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
      val edges = spark.sql("""
        SELECT * FROM VALUES
          (CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)),
          (array(1.0D, 2.0D), array(3.0D)),
          (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
          (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D)) t(x, y)""")
      val er = edges.select(vecL2Sq(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(er(0).getDouble(0) == 0.0 && er(0).getDouble(1) == 0.0)
      (1 to 3).foreach { i =>
        assert(er(i).isNullAt(0) == er(i).isNullAt(1) && er(i).isNullAt(0),
          s"edge row $i: fast=${er(i)} must be null like the builtin")
      }
      // SQL registration parity
      graft.functions.GraftExtensions.sqlFunctions.foreach { case (id, fi, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, fi, b)
      }
      vecs.createOrReplaceTempView("vecl2_probe")
      val sqlRows = spark.sql(
        "SELECT vec_l2sq(x, y) FROM vecl2_probe ORDER BY id").collect()
      sqlRows.zip(vecs.orderBy(col("id"))
          .select(ref(col("x"), col("y"))).collect()).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(0)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("VecDotLong == aggregate(zip_with(cast long)) builtin fold (codegen)") {
    // the int8-quantized path's kernel (qs05's corpus-scan stage): same
    // equivalence discipline as VecDot on the non-overflowing-product
    // domain — the builtin's entire value domain under ANSI mode (values
    // here reach ~1.4e8 products, 1000× the int8 range, without
    // overflowing)
    import graft.functions.expressions.VectorExpressions.vecDotLong
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ref = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        aggregate(zip_with(x, y, (a, b) => (a * b).cast("long")), lit(0L), _ + _)
      val rng = new scala.util.Random(11)
      // large values on DISJOINT positions (j≡5 mod 19 vs j≡7 mod 23 never
      // coincide below 64): products reach ~1.4e8 without overflowing INT
      // — ANSI mode throws on an overflowing a*b, so the shared domain is
      // exactly the non-overflow one
      val vecs = (0L until 40L).map { i =>
        (i, Seq.tabulate(64)(j => if (j % 19 == 5) 100000 + rng.nextInt(1000000)
             else rng.nextInt(255) - 127),
          Seq.tabulate(64)(j => if (j % 23 == 7) -100000 - rng.nextInt(1000000)
             else rng.nextInt(255) - 127))
      }.toDF("id", "x", "y")
      val rows = vecs.select(vecDotLong(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(rows.length == 40)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"int fold diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
      // edges: empty → 0; length mismatch → null; null element → null
      val edges = spark.sql("""
        SELECT * FROM VALUES
          (CAST(array() AS ARRAY<INT>), CAST(array() AS ARRAY<INT>)),
          (array(1, 2), array(3)),
          (array(1, CAST(NULL AS INT)), array(3, 4)) t(x, y)""")
      val er = edges.select(vecDotLong(col("x"), col("y")).as("fast"),
        ref(col("x"), col("y")).as("slow")).collect()
      assert(er(0).getLong(0) == 0L && er(0).getLong(1) == 0L)
      (1 to 2).foreach(i => assert(er(i).isNullAt(0) && er(i).isNullAt(1)))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("PqAdc == aggregate(zip_with(codes, sequence), element_at) fold (codegen)") {
    // the IVF-PQ store's ADC kernel: S table lookups summed left-to-right
    // from a 0.0 seed must reproduce the composed-builtin formulation
    // bit for bit on the valid domain (raw-bit equality); the defensive
    // edges (out-of-range code, table length not a multiple of the code
    // count) null out where the builtin element_at would raise under ANSI
    import graft.functions.expressions.VectorExpressions.pqAdc
    val S = 8; val SubK = 16
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ref = (codes: org.apache.spark.sql.Column, tbl: org.apache.spark.sql.Column) =>
        aggregate(
          zip_with(codes, sequence(lit(0), lit(S - 1)),
            (c, s) => element_at(tbl, s * lit(SubK) + c + 1)),
          lit(0.0), _ + _)
      val rng = new scala.util.Random(13)
      val rows = (0L until 40L).map { i =>
        (i, Seq.tabulate(S)(_ => rng.nextInt(SubK)),
          Seq.tabulate(S * SubK)(j => rng.nextGaussian() *
            (if (j % 13 == 0) 1e-300 else if (j % 17 == 0) 1e300 else 1.0)))
      }.toDF("id", "codes", "tbl")
      val got = rows.select(pqAdc(col("codes"), col("tbl")).as("fast"),
        ref(col("codes"), col("tbl")).as("slow")).collect()
      assert(got.length == 40)
      got.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"ADC fold diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
      // edges: empty codes → 0.0; null element → null (like the builtin);
      // out-of-range code / non-multiple table length → null (defensive —
      // the builtin raises there under ANSI, so no cross-check)
      val edges = spark.sql(s"""
        SELECT * FROM VALUES
          (CAST(array() AS ARRAY<INT>), array(1.0D, 2.0D)),
          (array(1, CAST(NULL AS INT)), array(${Seq.fill(2 * SubK)("1.0D").mkString(",")})),
          (array($SubK), array(${Seq.fill(SubK)("1.0D").mkString(",")})),
          (array(1, 2), array(1.0D, 2.0D, 3.0D)) t(codes, tbl)""")
      val er = edges.select(pqAdc(col("codes"), col("tbl")).as("fast")).collect()
      assert(er(0).getDouble(0) == 0.0, "empty code array must fold to the 0.0 seed")
      (1 to 3).foreach(i => assert(er(i).isNullAt(0), s"edge row $i must be null"))
      // SQL registration parity
      graft.functions.GraftExtensions.sqlFunctions.foreach { case (id, fi, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, fi, b)
      }
      rows.createOrReplaceTempView("pqadc_probe")
      val sqlRows = spark.sql(
        "SELECT pq_adc(codes, tbl) FROM pqadc_probe ORDER BY id").collect()
      sqlRows.zip(rows.orderBy(col("id"))
          .select(ref(col("codes"), col("tbl"))).collect()).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(0)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("SimHashPack == per-bit aggregate vote fold (codegen)") {
    // qd03's kernel: one fused pass must equal the `bits` separate
    // interpreted per-bit folds — pure integer arithmetic, exact equality —
    // including the composed form's null collapse (null array / null
    // element → every when() takes otherwise(0) → 0L) and empty → 0L
    import graft.functions.expressions.ShingleExpressions.simHashPack
    val bits = 16
    def composed(hashes: org.apache.spark.sql.Column) = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // real path: hash60 over distinct tokens of the text fixtures
      val hs = texts.select(array_distinct(transform(
        split(trim(col("text")), "\\s+"), t => TextOps.hash60(t))).as("hs"))
      val rows = hs.select(simHashPack(col("hs"), bits).as("fast"),
        composed(col("hs")).as("slow")).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"simhash diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
      // edges: empty, null element, null array — all 0L on both sides
      val edges = spark.sql("""
        SELECT * FROM VALUES
          (CAST(array() AS ARRAY<BIGINT>)),
          (array(CAST(5 AS BIGINT), CAST(NULL AS BIGINT))),
          (CAST(NULL AS ARRAY<BIGINT>)) t(hs)""")
      val er = edges.select(simHashPack(col("hs"), bits).as("fast"),
        composed(col("hs")).as("slow")).collect()
      er.foreach(r => assert(!r.isNullAt(0) && r.getLong(0) == 0L &&
        r.getLong(1) == 0L))
      // SQL registration parity
      graft.functions.GraftExtensions.sqlFunctions.foreach { case (id, fi, b) =>
        spark.sessionState.functionRegistry.registerFunction(id, fi, b)
      }
      val sv = spark.sql(
        s"""SELECT simhash_pack(array(CAST(5 AS BIGINT), CAST(6 AS BIGINT),
            CAST(3 AS BIGINT)), $bits) AS a""").first().getLong(0)
      val dv = spark.range(1).select(simHashPack(
        array(lit(5L), lit(6L), lit(3L)), bits)).first().getLong(0)
      assert(sv == dv)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
