package graft

import graft.functions.expressions.ShingleExpressions
import graft.relational.{PipelineQueries, QueryCatalog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-heavy LSH fixtures: the exact-content pre-collapse must keep
  * the band self-join's input proportional to DISTINCT content (not corpus
  * rows) while the expanded pair output stays bit-identical to the
  * uncollapsed all-member formulation the oracle uses. This is the guard
  * against the hot-band quadratic-candidate blowup on a 100 TB pre-dedup
  * crawl, where 10k byte-identical copies of one boilerplate page are the
  * norm, not the exception.
  */
class LshSkewSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Mutually-dissimilar distinct contents (seeded random alnum, so two
    * contents share essentially no char-4-shingles — no flaky near-dup
    * pairs across groups). */
  private def content(i: Int): String = {
    val rnd = new scala.util.Random(0xC0FFEE + i)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    (0 until 120).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }

  /** Write a documents.parquet fixture: `copies(i)` rows of content(i),
    * doc_ids assigned sequentially. Returns (dir, groups) where groups maps
    * each content index to its member doc_ids. */
  private def writeFixture(copies: Seq[Int]): (String, Seq[Seq[Long]]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-skew").toString
    var next = 0L
    val groups = copies.zipWithIndex.map { case (m, i) =>
      val ids = (0 until m).map(_ => { val id = next; next += 1; id })
      ids.map(id => (id, content(i)))
    }
    val rows = groups.flatten.map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (dir, groups.map(_.map(_._1)))
  }

  test("pre-collapse bounds band-join input by distinct content, not corpus size") {
    // 5 boilerplate pages x 2000 copies + 40 unique docs = 10040 rows.
    // Uncollapsed, each boilerplate band bucket holds 2000 rows -> 2000^2
    // candidate rows per band per page (4x10^7 total) before the distinct.
    val (dir, groups) = writeFixture(Seq.fill(5)(2000) ++ Seq.fill(40)(1))
    try {
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          ShingleExpressions.shingleHash60(col("text"), 4).as("hs"))
      val (reps, memb, repCand) = PipelineQueries.collapsedLshCandidates(docs0)
      try {
        assert(reps.count() == 45, "one representative per distinct content")
        assert(memb.count() == 10040, "every doc keeps a membership row")
        // candidate volume is over representatives only: <= C(45,2), vs
        // ~4x10^7 uncollapsed. (In practice far lower — dissimilar
        // contents rarely share a band.)
        val nCand = repCand.count()
        assert(nCand <= 45L * 44 / 2,
          s"candidates must be bounded by distinct-content pairs, got $nCand")
      } finally spark.catalog.clearCache()
    } finally deleteRecursively(dir)
  }

  test("collapsed qd02/qd07 equal the all-member pair set on a duplicate-heavy corpus") {
    // 3 pages x 25 copies + 10 uniques: expected answer = every
    // within-group pair at score exactly 1.0 (cross-content shingle
    // overlap ~0 at threshold 0.80/0.90).
    val (dir, groups) = writeFixture(Seq(25, 25, 25) ++ Seq.fill(10)(1))
    try {
      val expected = groups.filter(_.size > 1).flatMap { ids =>
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.sorted
      val qd02 = QueryCatalog.byName("qd02_minhash_lsh").build(spark, dir).collect()
      assert(qd02.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == expected)
      assert(qd02.forall(_.getDouble(2) == 1.0), "identical sets score exactly 1.0")
      spark.catalog.clearCache()
      val qd07 = QueryCatalog.byName("qd07_containment").build(spark, dir).collect()
      assert(qd07.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted == expected)
      assert(qd07.forall(_.getDouble(2) == 1.0))
      spark.catalog.clearCache()
    } finally deleteRecursively(dir)
  }

  test("collapsed qd04 equals the all-member pair set and bounds the prefix join") {
    // qd04's integer length-pruning cannot bound identical-content hot
    // keys (equal lengths always pass the prune), so it needs the same
    // exact-content pre-collapse as qd02/qd07. Fixture: 3 pages x 30
    // copies + 8 uniques; the fixture spreads copies across 3 sources
    // (source = id % 3), and qd04 pairs only WITHIN a source — expected
    // answer = within-group same-source pairs at exactly 1.0.
    val (dir, groups) = writeFixture(Seq(30, 30, 30) ++ Seq.fill(8)(1))
    try {
      val expected = groups.filter(_.size > 1).flatMap { ids =>
        for (a <- ids; b <- ids if a < b && a % 3 == b % 3) yield (a, b)
      }.sorted
      val qd04 = QueryCatalog.byName("qd04_ngram_jaccard").build(spark, dir).collect()
      assert(qd04.map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted == expected)
      assert(qd04.forall(_.getDouble(3) == 1.0), "identical sets score exactly 1.0")
      spark.catalog.clearCache()
    } finally deleteRecursively(dir)
  }

  test("near-identical variants: the residual m^2 stays at the representative level and IS the answer") {
    // The residual skew class pre-collapse cannot absorb: m templated
    // variants differing by one small edit (distinct shingle SETS, so
    // every variant is its own representative) share most bands and
    // produce O(m^2) representative candidates. This is measured here,
    // not capped: with shingle overlap J >= ~0.87 by construction, every
    // candidate pair verifies above the 0.80 threshold, so the m^2
    // candidates ARE the operator's answer — a band-frequency cap would
    // silently drop true near-dup pairs (unsound; see the
    // collapsedLshCandidates doc). What the measurement pins:
    //  - candidate volume ~= banding recall x C(m,2), with recall
    //    1-(1-J^4)^2 in [0.6, 1.0] for this fixture (measured ~0.8-0.95);
    //  - zero candidate waste: verified pairs == candidates (every
    //    generated pair is a real answer row — no quadratic intermediate
    //    that verification then discards).
    val m = 600
    val base = content(0) * 2 // ~240 chars, ~230 distinct 4-shingles
    // variant i: replace 4 chars at a per-variant offset with a unique
    // 4-char block drawn from i — one-edit-apart template pages
    val variants = (0 until m).map { i =>
      val off = 8 + (i % 50) * 4
      val block = f"${i}%04d"
      (i.toLong, base.substring(0, off) + block + base.substring(off + 4))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-near").toString
    try {
      val rows = variants ++ (0 until 20).map(j => (1000L + j, content(100 + j)))
      rows.map { case (id, t) => (id, t, "en", s"src${id % 3}", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          ShingleExpressions.shingleHash60(col("text"), 4).as("hs"))
      val (reps, _, repCand) = PipelineQueries.collapsedLshCandidates(docs0)
      try {
        assert(reps.count() >= m, "every variant must be its own representative")
        val nCand = repCand.filter(col("id_a") < m && col("id_b") < m).count()
        val allPairs = m.toLong * (m - 1) / 2
        assert(nCand >= (allPairs * 0.6).toLong && nCand <= allPairs,
          s"banding recall out of the expected range: $nCand of $allPairs")
        // zero waste: every candidate is a true >= 0.80 near-dup, so the
        // answer set equals the candidate set (plus nothing)
        val t0 = System.nanoTime()
        val out = QueryCatalog.byName("qd02_minhash_lsh").build(spark, dir)
          .filter(col("id_a") < m && col("id_b") < m)
        val nOut = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        info(f"m=$m variants: candidates=$nCand of C(m,2)=$allPairs " +
          f"(recall ${nCand.toDouble / allPairs}%.3f), verified=$nOut, qd02 in $sec%.1f s")
        assert(nOut == nCand,
          "every near-identical candidate must verify (candidates == answers)")
      } finally spark.catalog.clearCache()
    } finally deleteRecursively(dir)
  }

  test("qd15 incremental probe matches all-member truth on a duplicate-heavy corpus") {
    // Hot existing-side content is qd15's risk class: the existing side
    // is exact-collapsed, so 60 copies of one page band ONCE and partner
    // counts expand by group size. Expected answer, from first
    // principles: an arriving doc (qp01 bucket >= 90) near-dups exactly
    // the EXISTING members of its own content group (cross-content
    // similarity ~0), at Jaccard exactly 1.0.
    val (dir, groups) = writeFixture(Seq(60, 60, 60) ++ Seq.fill(12)(1))
    try {
      val allIds = groups.flatten
      val buckets = allIds.toDF("doc_id")
        .select(col("doc_id"),
          pmod(graft.pipeline.TextOps.hash60(col("doc_id").cast("string")), lit(100))
            .as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = groups.flatMap { ids =>
        val existing = ids.count(buckets(_) < 90).toLong
        ids.filter(buckets(_) >= 90).map(a => (a, existing, 1.0))
      }.filter(_._2 > 0).sortBy(_._1)
      val got = QueryCatalog.byName("qd15_incremental_dedup").build(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      assert(expected.nonEmpty, "fixture must place arriving docs in dup groups")
      assert(got == expected)
    } finally deleteRecursively(dir)
  }

  test("expandRepPairs emits exactly cross x members + within-group pairs") {
    // groups: rep 5 -> {5, 20}, rep 10 -> {10, 11, 12}; one verified rep
    // pair (5, 10, 0.9). Cross pairs order by least/greatest per member
    // pair, NOT by representative order.
    val memb = Seq((5L, 5L), (5L, 20L), (10L, 10L), (10L, 11L), (10L, 12L))
      .toDF("rep_id", "doc_id")
    val repPairs = Seq((5L, 10L, 0.9)).toDF("rep_a", "rep_b", "jaccard")
    val got = PipelineQueries.expandRepPairs(repPairs, memb, "jaccard", lit(1.0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val want = Seq(
      (5L, 10L, 0.9), (5L, 11L, 0.9), (5L, 12L, 0.9),   // cross: 5 vs group 10
      (10L, 20L, 0.9), (11L, 20L, 0.9), (12L, 20L, 0.9), // cross: 20 vs group 10 (reordered)
      (5L, 20L, 1.0),                                    // within group 5
      (10L, 11L, 1.0), (10L, 12L, 1.0), (11L, 12L, 1.0)  // within group 10
    ).sorted
    assert(got == want)
  }

  private def deleteRecursively(dir: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
  }
}
