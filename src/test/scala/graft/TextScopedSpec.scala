package graft

import graft.relational.QueryHelpers
import graft.sinks.TextIndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TENANT-SCOPED text plane (qt38): per-label BM25 — df, N, avgdl
  * from each label's own sub-corpus — served from the (bucket, meta)
  * layout + labelstats component. Pins: single/batch path identity,
  * label exactness, global serving unchanged by scoping, loud contracts
  * (unscoped store refuses filtered serving, scoped build/append refuse
  * nulls / missing meta), the full mutation protocol (append + delete +
  * compact serve score-identically to a from-scratch scoped rebuild of
  * the surviving corpus — per-label stats exact through replays,
  * tombstones, and the epoch flip), both-axis partition pruning, and
  * the shared null-meta / over-cap fallback contracts. */
class TextScopedSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val TopK = 10

  private def docs: DataFrame = QueryHelpers.table(spark, dir, "documents")

  private val evalSet = Seq(
    (0L, Seq("spark", "join", "window"), "en"),
    (1L, Seq("merge", "column"), "fr"),
    (2L, Seq("scan", "filter", "hash"), "zh"))

  private def evalDf: DataFrame = evalSet.toDF("query_id", "terms", "meta")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def servedBatch(idx: String, q: DataFrame = evalDf): Seq[(Long, Int, Long, Double)] = {
    val rows = TextIndexStore.queryBm25FilteredBatch(spark, idx, q, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    spark.catalog.clearCache()
    rows
  }

  test("filtered batch == standalone filtered per query; label-exact; scores differ from global") {
    val idx = tmp("graft-tscoped")
    TextIndexStore.build(docs, buckets = 64, idx, metaCol = Some("lang"))
    spark.catalog.clearCache()
    val batch = servedBatch(idx)
    assert(batch.nonEmpty && batch.map(_._1).distinct.length == 3)
    // per-query identity with the standalone path (shared slice + stats
    // machinery — df from the union slice is per-(token,label), so the
    // batch can never bleed one label's stats into another's scores)
    evalSet.foreach { case (qid, terms, label) =>
      val single = TextIndexStore.queryBm25Filtered(spark, idx, terms, label, TopK)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(2)) }.toSeq
      assert(batch.filter(_._1 == qid) == single,
        s"batch path diverges from standalone queryBm25Filtered for query $qid")
    }
    // label exactness: every served doc belongs to its query's label
    val langOf = docs.select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val labelOf = evalSet.map(e => e._1 -> e._3).toMap
    batch.foreach { case (qid, _, did, _) =>
      assert(langOf(did) == labelOf(qid),
        s"query $qid (${labelOf(qid)}) served doc $did (${langOf(did)})")
    }
    // the per-label stats genuinely differ from global scoring: the en
    // query's scores must not equal the global-corpus scores for the
    // same terms (df/N/avgdl all change) — guards against a regression
    // where the filtered path silently scores with global stats
    val globalScores = TextIndexStore.queryBm25(spark, idx,
        Seq("spark", "join", "window"), TopK)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    spark.catalog.clearCache()
    val enScores = batch.filter(_._1 == 0L).map(r => r._3 -> r._4)
    assert(enScores.exists { case (d, s) =>
      globalScores.get(d).forall(g => math.abs(g - s) > 1e-9) },
      "per-label scores must differ from global scores (df/N/avgdl are label-scoped)")
  }

  test("global BM25 serving is unchanged by scoping; loud contracts on misuse") {
    val scoped = tmp("graft-tscoped-g")
    val plain = tmp("graft-tplain-g")
    TextIndexStore.build(docs, buckets = 64, scoped, metaCol = Some("lang"))
    TextIndexStore.build(docs, buckets = 64, plain)
    spark.catalog.clearCache()
    def global(idx: String) = {
      val r = TextIndexStore.queryBm25(spark, idx, Seq("spark", "join", "window"), TopK)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache(); r
    }
    assert(global(scoped) == global(plain),
      "scoping must not change global (unfiltered) BM25 serving")
    // phrase serving stays available on the scoped layout too
    val ph = TextIndexStore.queryPhrase(spark, scoped, Seq("fast", "table")).count()
    val ph0 = TextIndexStore.queryPhrase(spark, plain, Seq("fast", "table")).count()
    spark.catalog.clearCache()
    assert(ph == ph0, "phrase serving must be layout-agnostic")
    // an unscoped store refuses filtered serving loudly (format marker,
    // not a nulls-serve-empty wrong answer)
    Seq(
      () => TextIndexStore.queryBm25Filtered(spark, plain, Seq("spark"), "en", TopK),
      () => TextIndexStore.queryBm25FilteredBatch(spark, plain, evalDf, TopK)
    ).foreach { f =>
      val ex = intercept[IllegalArgumentException] { f() }
      assert(ex.getMessage.contains("metadata-scoped"), ex.getMessage)
    }
    // scoped build rejects null labels loudly (the graph store's
    // total-labelling discipline)
    val exB = intercept[IllegalArgumentException] {
      TextIndexStore.build(docs.withColumn("lang",
          when(col("doc_id") === 0, lit(null).cast("string")).otherwise(col("lang"))),
        buckets = 64, tmp("graft-tnull"), metaCol = Some("lang"))
    }
    assert(exB.getMessage.contains("NULL"), exB.getMessage)
    // scoped append without the meta column refused before any write
    val exA = intercept[IllegalArgumentException] {
      TextIndexStore.appendBatch(docs.select(col("doc_id"), col("text")),
        scoped, batchId = 1L)
    }
    assert(exA.getMessage.contains("metadata-scoped"), exA.getMessage)
  }

  test("append + delete + compact serve score-identically to a from-scratch scoped rebuild") {
    val idx = tmp("graft-tscoped-mut")
    val base = docs.filter(col("doc_id") < 400)
    val arriving = docs.filter(col("doc_id") >= 400)
    val deadIds = Seq(3L, 96L, 206L, 388L, 404L, 471L)
    TextIndexStore.build(base, buckets = 64, idx, metaCol = Some("lang"))
    TextIndexStore.appendBatch(arriving, idx, batchId = 7L)
    // at-least-once replay of the same batch: byte-identical rows, the
    // serve-time distinct absorbs them (postings, doclens, labelstats)
    TextIndexStore.appendBatch(arriving, idx, batchId = 7L)
    TextIndexStore.delete(spark, idx, deadIds)
    spark.catalog.clearCache()
    val truthIdx = tmp("graft-tscoped-truth")
    TextIndexStore.build(docs.filter(!col("doc_id").isInCollection(deadIds)),
      buckets = 64, truthIdx, metaCol = Some("lang"))
    spark.catalog.clearCache()
    val want = servedBatch(truthIdx)
    val dirty = servedBatch(idx)
    assert(dirty == want,
      s"dirty store (replayed append + tombstones) must serve the rebuild's " +
        s"exact rows+scores (${dirty.length} vs ${want.length})")
    // compact folds everything (incl. the labelstats plane) behind one
    // atomic commit — serving identical across the epoch flip
    TextIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedBatch(idx) == want, "compacted store must serve identically")
    // and the compacted store serves the clean fast path: a fresh append
    // then delete of a brand-new doc still folds exactly
    val extra = Seq((9999L, "spark spark join window table", "en"))
      .toDF("doc_id", "text", "lang")
    TextIndexStore.appendBatch(extra, idx, batchId = 8L)
    spark.catalog.clearCache()
    val withExtra = servedBatch(idx)
    assert(withExtra.exists(r => r._1 == 0L && r._3 == 9999L),
      "the fresh en doc must rank for the en query (it is term-dense)")
    TextIndexStore.delete(spark, idx, Seq(9999L))
    spark.catalog.clearCache()
    assert(servedBatch(idx) == want, "tombstoning the new doc must restore the rebuild rows")
  }

  test("crashed append (labelstats landed, stats file not) compacted before its replay stays exactly-once") {
    // the r15 review's double-count sequence: an append crashes between
    // writeLabelStats and writeStats (stats is written LAST, so this is
    // exactly the at-least-once window), compact runs BEFORE the replay,
    // then the replay lands. The labelstats increment's batch id sits
    // ABOVE the global watermark (its stats file never landed), so
    // compact must CARRY it forward — folding it into base would count
    // the replayed rows on top of it forever. Storage-layer injection is
    // valid here: a real mutator (appendBatch) dirtied the store first;
    // deleting its last-written file reproduces the crash prefix.
    val idx = tmp("graft-tsc-crash")
    val base = docs.limit(60).select(col("doc_id"), col("text"), col("lang"))
    TextIndexStore.build(base, 64, idx, metaCol = Some("lang"))
    val batch = Seq(
      (20001L, "spark join window crash batch content", "en"),
      (20002L, "merge column crash batch content", "fr")).toDF("doc_id", "text", "lang")
    TextIndexStore.appendBatch(batch, idx, batchId = 5L)
    val ctx = graft.sinks.ArtifactStore.open(spark, idx)
    assert(ctx.fs.delete(
      new org.apache.hadoop.fs.Path(ctx.dir("stats"), "batch-5.json"), false))
    TextIndexStore.compact(spark, idx)
    TextIndexStore.appendBatch(batch, idx, batchId = 5L) // the replay
    spark.catalog.clearCache()
    val truthIdx = tmp("graft-tsc-crash-truth")
    TextIndexStore.build(base.unionByName(batch), 64, truthIdx,
      metaCol = Some("lang"))
    spark.catalog.clearCache()
    val want = servedBatch(truthIdx)
    assert(servedBatch(idx) == want,
      "per-label stats must count the crashed-then-replayed batch exactly once")
    // a second compact (the stats file has landed now) absorbs the
    // carried increment into base — serving unchanged across it
    TextIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedBatch(idx) == want,
      "absorbing the carried increment must not change serving")
  }

  test("scoped append stream valve: labelstats fold through mid-stream compactions, filtered serving unchanged") {
    // the unscoped valve test's twin on the scoped layout — what it
    // additionally proves is the labelstats plane surviving VALVE
    // compactions interleaved with appends (base rows re-folded at each
    // epoch flip, later increments landing on top) with per-label
    // scores unchanged vs a never-compacted control
    val valved = tmp("graft-tsc-valve"); val control = tmp("graft-tsc-ctl")
    val base = docs.limit(40)
    Seq(valved, control).foreach(p =>
      TextIndexStore.build(base, 64, p, metaCol = Some("lang")))
    val langs = Seq("en", "fr", "zh", "de", "es")
    (1 to 6).foreach { i =>
      val batch = Seq((10000L + i, s"spark join window batch $i content",
        langs((i - 1) % langs.length))).toDF("doc_id", "text", "lang")
      TextIndexStore.appendBatch(batch, valved, i.toLong, compactFactor = 2)
      TextIndexStore.appendBatch(batch, control, i.toLong, compactFactor = 0)
      spark.catalog.clearCache()
    }
    assert(graft.sinks.ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    assert(servedBatch(valved) == servedBatch(control),
      "valve compactions must not change tenant-scoped BM25 serving")
  }

  test("filtered scan prunes bucket AND meta; over-cap label domains fall back; null metas serve empty") {
    val idx = tmp("graft-tscoped-pf")
    TextIndexStore.build(docs, buckets = 64, idx, metaCol = Some("lang"))
    spark.catalog.clearCache()
    val served = TextIndexStore.queryBm25FilteredBatch(spark, idx, evalDf, TopK)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(served.queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("bucket") && pf.contains("meta"),
      s"filtered serving must prune bucket AND meta partitions, got $pf")
    val want = servedBatch(idx)
    // over-cap: 3 labels > cap 1 → the STATIC meta IN-list drops out of
    // PartitionFilters (a truncated list would silently prune unsampled
    // labels away). Spark then recovers meta pruning DYNAMICALLY — a
    // dynamicpruningexpression derived at runtime from the broadcast
    // (token, meta) join key, complete by construction — which is
    // exactly the graceful degradation the cap wants: never wrong,
    // still pruned. Rows stay bit-identical either way.
    spark.conf.set("graft.store.maxMetaFilter", "1")
    try {
      val overCap = TextIndexStore.queryBm25FilteredBatch(spark, idx, evalDf, TopK)
      assert("PartitionFilters: \\[[^\\]]*meta#\\d+L? IN \\(".r
        .findFirstIn(overCap.queryExecution.executedPlan.toString).isEmpty,
        "past the cap no static meta value-list may survive in PartitionFilters")
      val got = overCap.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      spark.catalog.clearCache()
      assert(got == want, "the fallback must serve bit-identical rows")
    } finally spark.conf.unset("graft.store.maxMetaFilter")
    // a null-meta query row serves empty without perturbing the others
    val withNull = (evalSet :+ (3L, Seq("spark"), null: String))
      .toDF("query_id", "terms", "meta")
    val got = servedBatch(idx, withNull)
    assert(!got.exists(_._1 == 3L), "a null-meta query must serve empty")
    assert(got == want, "the null row must not perturb the other queries")
  }
}
