package graft

import graft.relational.{QueryCatalog, QueryHelpers}
import graft.sinks.TextIndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent inverted text index: build-once/serve-many must reproduce
  * the fused in-query BM25 plan (qt12) exactly, and serving must read only
  * the query terms' bucket partitions (partition pruning at the scan). */
class TextIndexSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "window")

  test("prebuilt index serves qt12's exact ranking; scan prunes to term buckets") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs, buckets = 64, idx)

    // artifact shape: manifest + bucket-partitioned postings whose row
    // count equals the distinct (doc, token) pairs of the corpus
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(idx, "manifest.json")))
    val postings = spark.read.parquet(s"$idx/postings")
    val want = docs
      .select(col("doc_id"), explode(graft.pipeline.TextOps.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(postings.count() == want, "one posting per distinct (doc, token)")
    // every posting sits in the bucket its token hashes to
    val misplaced = postings.filter(
      pmod(graft.pipeline.TextOps.hash60(col("token")), lit(64L)) =!= col("bucket")).count()
    assert(misplaced == 0, "bucket column must equal hash60(token) mod B")

    val served = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
    // partition pruning is the scale property: the bucket filter must
    // reach the postings scan as a PartitionFilter
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"term-bucket filter must prune partitions:\n${plan.take(2000)}")

    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromQuery = QueryCatalog.byName("qt12_bm25").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(got == fromQuery,
      s"served BM25 diverges from qt12 (${got.length} vs ${fromQuery.length} rows)")
  }

  test("tombstone deletes serve as if the corpus never held the docs") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx-del").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs, buckets = 64, idx)
    def serve() = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // delete two of the served top docs (+ one absent id, which must be
    // inert) — df, corpus stats (N, Σdl) and the ranking must all match
    // an index built from the corpus WITHOUT those docs
    val victims = serve().take(2).map(_._1)
    TextIndexStore.delete(spark, idx, victims :+ 999999L)
    val truthIdx = java.nio.file.Files.createTempDirectory("graft-tidx-del-t").toString
    TextIndexStore.build(docs.filter(!col("doc_id").isin(victims: _*)),
      buckets = 64, truthIdx)
    val want = TextIndexStore.queryBm25(spark, truthIdx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(serve() == want,
      "deleted docs must vanish from ranking, df, and the corpus stats")
    // repeated deletes are absorbed; a re-appended tombstoned doc stays
    // deleted (its new stats contribution is subtracted per batch id)
    TextIndexStore.delete(spark, idx, Seq(victims.head))
    TextIndexStore.appendBatch(docs.filter(col("doc_id") === victims.head),
      idx, batchId = 7L)
    assert(serve() == want, "re-append of a tombstoned doc must not resurrect it")
    // compact folds the tombstones in: serving identical (score equality
    // covers the collapsed stats arithmetic), tombstones gone
    TextIndexStore.compact(spark, idx)
    assert(serve() == want, "serving must be identical across compact")
    assert(!graft.sinks.ArtifactStore.open(spark, idx).exists("tombstones"))
  }

  test("appended batches reach parity with a full build; replays change nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx-app").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs.filter(col("doc_id") < 250), buckets = 64, idx)
    val tail = docs.filter(col("doc_id") >= 250)
    TextIndexStore.appendBatch(tail, idx, batchId = 1L)
    def serve() = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qt12_bm25").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(serve() == want,
      "build(250) + append(rest) must serve the full-corpus qt12 ranking " +
        "(df, N and avgdl all reflect the appended docs)")
    // at-least-once replay: the same micro-batch delivered twice must be
    // absorbed — stats are idempotent by batch id, postings dedup at serve
    TextIndexStore.appendBatch(tail, idx, batchId = 1L)
    assert(serve() == want, "a replayed append batch must change nothing")
  }

  test("a batch replayed AFTER compact folded it stays inert (no stats double-count)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx-foldrep").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs.filter(col("doc_id") < 250), buckets = 64, idx)
    val tail = docs.filter(col("doc_id") >= 250)
    TextIndexStore.appendBatch(tail, idx, batchId = 3L)
    def serve() = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val victim = serve().head._1
    TextIndexStore.delete(spark, idx, Seq(victim))
    TextIndexStore.compact(spark, idx) // folds batch-3's stats into base
    val want = serve()
    // a foreachBatch replay of batch 3 landing after the compact (crash
    // before the stream's checkpoint commit) re-creates batch-3.json —
    // the folded-id record in base.json must keep it out of (N, Σdl),
    // and the replayed postings dedup away at serve time
    TextIndexStore.appendBatch(tail, idx, batchId = 3L)
    assert(serve() == want,
      "a replay of a batch the compact already folded must change nothing")
    spark.catalog.clearCache()
  }

  test("appendStream maintains the index live: post-stream serving == full build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tidx-ckpt").toString
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs.filter(col("doc_id") < 200), buckets = 64, idx)
    val arrivals = docs.filter(col("doc_id") >= 200)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TextIndexStore.appendStream(
      stream.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      stream.addData(a.toSeq)
      q.processAllAvailable() // two distinct micro-batches, two stat files
      stream.addData(b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qt12_bm25").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want,
      "an index maintained by appendStream must serve the full-corpus ranking")
  }

  test("a query of absent terms returns empty, not an error") {
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx-abs").toString
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    TextIndexStore.build(docs, buckets = 8, idx)
    assert(TextIndexStore.queryBm25(spark, idx,
      Seq("nosuchterm", "alsoabsent"), 10).collect().isEmpty)
    // mixed present/absent: the absent term simply contributes nothing
    val hit = TextIndexStore.queryBm25(spark, idx, Seq("alpha", "nosuchterm"), 10)
      .collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(1L) && hit.head.getLong(1) == 1L)
  }

  test("serving reads only the probed bucket slice (df derives from it)") {
    // an index with ONE searchable term per bucket class: scoring "alpha"
    // must not depend on postings outside its bucket — corrupt every
    // other bucket directory and the answer must be unchanged
    val idx = java.nio.file.Files.createTempDirectory("graft-tidx2").toString
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "beta gamma delta")).toDF("doc_id", "text")
    TextIndexStore.build(docs, buckets = 64, idx)
    val before = TextIndexStore.queryBm25(spark, idx, Seq("alpha"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val keep = graft.functions.CountMin.hash60("alpha") % 64
    java.nio.file.Files.list(java.nio.file.Paths.get(idx, "postings"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .forEachRemaining { p =>
        val name = p.getFileName.toString
        if (name.startsWith("bucket=") && name != s"bucket=$keep") {
          // truncate every parquet part in the non-probed bucket: a read
          // attempt would now fail loudly
          java.nio.file.Files.list(p).iterator()
            .forEachRemaining { f =>
              if (f.getFileName.toString.endsWith(".parquet"))
                java.nio.file.Files.write(f, Array[Byte](0, 1, 2))
            }
        }
      }
    val after = TextIndexStore.queryBm25(spark, idx, Seq("alpha"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(after == before, "pruned serving must never touch unprobed buckets")
  }
}
