package graft

import graft.relational.{QueryCatalog, QueryHelpers}
import graft.sinks.BandIndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent LSH band index: build-once/probe-many must reproduce the
  * fused in-query incremental dedup (qd15) exactly, and probing must read
  * only the arriving bands' bucket partitions. */
class BandIndexSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val bucket =
    pmod(graft.pipeline.TextOps.hash60(col("doc_id").cast("string")), lit(100))

  test("prebuilt band index probes to qd15's exact results; scan prunes to probe buckets") {
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("b"))
    BandIndexStore.build(docs.filter(col("b") < 90).select(col("doc_id"), col("text")),
      idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    val probed = BandIndexStore.probe(spark, idx,
      docs.filter(col("b") >= 90).select(col("doc_id"), col("text")), 0.80)
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"probe-bucket filter must prune partitions:\n${plan.take(2000)}")
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qd15_incremental_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want,
      s"band-index probe diverges from qd15 (${got.length} vs ${want.length} rows)")
  }

  test("tombstone deletes probe as if the corpus never held the docs") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx-del").toString
    // duplicate-heavy fixture: one boilerplate page in 5 copies (a
    // collapsed group), one near-dup pair, one unique page — exercises
    // partial-group decrement, full-group drop, and inert postings
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val near = page + " tail"
    val existing = (
      (0L until 5L).map(i => (i, page)) ++
      Seq((10L, near), (20L, "completely unrelated content lives here"))
    ).toDF("doc_id", "text")
    val arriving = Seq((100L, page), (101L, near)).toDF("doc_id", "text")
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    def serve() = BandIndexStore.probe(spark, idx, arriving, 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def truth(deleted: Set[Long]) = {
      val t = java.nio.file.Files.createTempDirectory("graft-bidx-del-truth").toString
      BandIndexStore.build(existing.filter(!col("doc_id").isin(deleted.toSeq: _*)),
        t, shingleN = 4, numPerms = 8, rowsPerBand = 4)
      BandIndexStore.probe(spark, t, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val before = serve()
    assert(before == truth(Set.empty))
    // partial-group delete: 2 of 5 boilerplate copies — counts decrement,
    // the group's representative still serves for the survivors
    BandIndexStore.delete(spark, idx, Seq(0L, 3L))
    assert(serve() == truth(Set(0L, 3L)),
      "partial-group deletion must decrement partner counts exactly")
    assert(serve() != before, "the deletion must visibly change the answer")
    // delete the remaining group members (incl. the representative id) —
    // the whole group must vanish; the near-dup pair must be untouched
    BandIndexStore.delete(spark, idx, Seq(1L, 2L, 4L))
    assert(serve() == truth(Set(0L, 1L, 2L, 3L, 4L)),
      "a fully-deleted group must drop out of probing entirely")
    // repeated deletes are absorbed; re-append does not resurrect
    BandIndexStore.delete(spark, idx, Seq(1L))
    BandIndexStore.appendBatch(Seq((2L, page)).toDF("doc_id", "text"), idx)
    val afterDeletes = truth(Set(0L, 1L, 2L, 3L, 4L))
    assert(serve() == afterDeletes,
      "re-appending a tombstoned doc must not resurrect it")
    // compact folds the tombstones in: probing identical, tombstones gone
    BandIndexStore.compact(spark, idx)
    assert(serve() == afterDeletes, "probing must be identical across compact")
    assert(!graft.sinks.ArtifactStore.open(spark, idx).exists("tombstones"))
  }

  test("re-appending a group's REPRESENTATIVE folds deterministically; deleting it keeps the survivors") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx-rep").toString
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = (
      (0L until 5L).map(i => (i, page)) ++
        Seq((20L, "completely unrelated content lives here"))
    ).toDF("doc_id", "text")
    val arriving = Seq((100L, page)).toDF("doc_id", "text")
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    def serve() = BandIndexStore.probe(spark, idx, arriving, 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def truth(deleted: Set[Long]) = {
      val t = java.nio.file.Files.createTempDirectory("graft-bidx-rep-t").toString
      BandIndexStore.build(existing.filter(!col("doc_id").isin(deleted.toSeq: _*)),
        t, shingleN = 4, numPerms = 8, rowsPerBand = 4)
      BandIndexStore.probe(spark, t, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    // doc 0 is the 5-member group's representative (min doc_id). Re-append
    // it: its fresh grp_n=1 posting must fold back into the group's count
    // via max (a nondeterministic row pick could keep the 1)
    BandIndexStore.appendBatch(Seq((0L, page)).toDF("doc_id", "text"), idx)
    assert(serve() == truth(Set.empty),
      "re-appending a representative must be absorbed (deterministic max fold)")
    // ...and tombstoning that representative must decrement, not destroy:
    // the 4 surviving members still answer (1 - 1 = 0 would drop them all)
    BandIndexStore.delete(spark, idx, Seq(0L))
    assert(serve() == truth(Set(0L)),
      "deleting a re-appended representative must keep the surviving members")
    // the same fold must hold through compact's rewrite
    BandIndexStore.compact(spark, idx)
    assert(serve() == truth(Set(0L)),
      "compact must apply the same deterministic grp_n fold")
    spark.catalog.clearCache()
  }

  test("appendStream maintains the index live: post-stream probing == full build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bidx-ckpt").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("b"))
    val existing = docs.filter(col("b") < 90).select(col("doc_id"), col("text"))
    BandIndexStore.build(existing.filter(col("doc_id") < 200),
      idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    val arrivals = existing.filter(col("doc_id") >= 200)
      .as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = BandIndexStore.appendStream(
      stream.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      stream.addData(a.toSeq)
      q.processAllAvailable() // two distinct micro-batches
      stream.addData(b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = BandIndexStore.probe(spark, idx,
      docs.filter(col("b") >= 90).select(col("doc_id"), col("text")), 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qd15_incremental_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want,
      "an index maintained by appendStream must probe the full-corpus answer")
  }

  test("appended corpus batches are probed; replays change nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx-app").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("b"))
    val existing = docs.filter(col("b") < 90).select(col("doc_id"), col("text"))
    // build from half the existing corpus, append the other half
    BandIndexStore.build(existing.filter(col("doc_id") < 250),
      idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    val tail = existing.filter(col("doc_id") >= 250)
    BandIndexStore.appendBatch(tail, idx)
    def serve() = BandIndexStore.probe(spark, idx,
      docs.filter(col("b") >= 90).select(col("doc_id"), col("text")), 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qd15_incremental_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(serve() == want,
      "build(half) + append(half) must probe identically to the full build " +
        "(appends post uncollapsed — collapse is an optimization, not a semantic)")
    BandIndexStore.appendBatch(tail, idx)
    assert(serve() == want, "a replayed append batch must change nothing")
  }
}
