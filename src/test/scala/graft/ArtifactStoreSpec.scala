package graft

import graft.sinks.{ArtifactStore, BandIndexStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared artifact-store maintenance protocol (epoch-marker commit +
  * compaction guard), pinned through [[BandIndexStore]] as the
  * representative store: a compaction crash at ANY point leaves the live
  * view fully pre- or fully post-compact, mutations racing a compaction
  * fail loudly instead of being silently folded away, and re-running
  * compact() always recovers. */
class ArtifactStoreSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val page = "the quick brown fox jumps over the lazy dog again and again"
  private def existing = (
    (0L until 5L).map(i => (i, page)) ++
      Seq((10L, page + " tail"), (20L, "completely unrelated content lives here"))
  ).toDF("doc_id", "text")
  private def arriving = Seq((100L, page)).toDF("doc_id", "text")

  private def freshIndex(): String = {
    val idx = java.nio.file.Files.createTempDirectory("graft-astore").toString
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    idx
  }

  private def serve(idx: String): Seq[(Long, Long, Double)] = {
    val got = BandIndexStore.probe(spark, idx, arriving, 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache() // probe persists its arriving side
    got
  }

  test("mutations fail loudly while a compaction is in flight; re-running compact recovers") {
    val idx = freshIndex()
    BandIndexStore.delete(spark, idx, Seq(0L, 3L))
    val want = serve(idx)
    // simulate a compaction that started (guard raised) and crashed
    // before its commit marker
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("postings", "members"))
    intercept[IllegalStateException] {
      BandIndexStore.appendBatch(Seq((200L, "fresh arrival text here")).toDF("doc_id", "text"), idx)
    }
    intercept[IllegalStateException] {
      BandIndexStore.delete(spark, idx, Seq(1L))
    }
    // reads stay correct against the intact pre-compact view
    assert(serve(idx) == want, "a crashed compaction must not disturb serving")
    // re-running compact completes the fold, advances the epoch, and
    // releases the guard for mutations
    BandIndexStore.compact(spark, idx)
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve(idx) == want, "probing must be identical across the recovered compact")
    BandIndexStore.appendBatch(Seq((200L, "fresh arrival text here")).toDF("doc_id", "text"), idx)
    assert(serve(idx) == want, "post-recovery appends must land (inert here)")
  }

  test("pre-commit crash: half-written staging never leaks into the live view and is swept on retry") {
    val idx = freshIndex()
    BandIndexStore.delete(spark, idx, Seq(0L, 3L))
    val want = serve(idx)
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("postings", "members"))
    // half-written staging garbage from the crashed attempt
    val staged = java.nio.file.Paths.get(ArtifactStore.stagingDir(ctx, "postings"))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.writeString(staged.resolve("part-junk.parquet"), "not parquet")
    assert(serve(idx) == want, "staging must be invisible until the commit marker")
    BandIndexStore.compact(spark, idx) // sweeps the junk, folds, commits
    assert(serve(idx) == want, "recovered compact must serve identically")
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
  }

  test("post-commit crash: stale guard and old-epoch garbage neither block nor corrupt") {
    val idx = freshIndex()
    BandIndexStore.delete(spark, idx, Seq(0L, 3L))
    val want = serve(idx)
    BandIndexStore.compact(spark, idx) // live epoch is now 1
    // simulate a compact that committed but crashed mid-cleanup: a guard
    // naming the already-folded epoch 0 plus a resurrected old-epoch dir
    val root = java.nio.file.Paths.get(idx)
    java.nio.file.Files.writeString(root.resolve("_COMPACTING"), "0")
    val stale = root.resolve("postings")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("part-junk.parquet"), "not parquet")
    assert(serve(idx) == want, "serving resolves the live epoch, never stale dirs")
    // the stale guard is provably post-commit (its epoch < live) — swept,
    // not thrown
    BandIndexStore.appendBatch(Seq((300L, "another fresh arrival")).toDF("doc_id", "text"), idx)
    val fs = ArtifactStore.fileSystem(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "_COMPACTING")),
      "a stale post-commit guard must be swept by the next mutation")
    assert(serve(idx) == want)
  }
}
