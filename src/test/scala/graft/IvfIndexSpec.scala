package graft

import graft.relational.{QueryCatalog, QueryHelpers}
import graft.sinks.IvfIndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent IVF index: build-once/serve-many must reproduce the fused
  * in-query IVF plan (qs02) exactly, and serving must read only the probed
  * cell partitions (partition pruning at the scan). */
class IvfIndexSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("prebuilt index serves qs02's exact results; scan prunes to probe cells") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)

    // the index artifact: 16 centroids, every vector posted exactly once
    val cents = spark.read.parquet(s"$idx/centroids")
    assert(cents.count() == 16)
    val postings = spark.read.parquet(s"$idx/postings")
    assert(postings.count() == e.count())
    assert(postings.select(col("cell")).distinct().count() <= 16)

    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    val served = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)

    // partition pruning is the scale property: the probe-cell filter must
    // reach the postings scan as a PartitionFilter (unprobed cell
    // directories are never opened)
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe-cell filter must prune partitions:\n${plan.take(2000)}")

    // serving parity: identical rows, identical rank order, vs the fused
    // in-query formulation (which is itself oracle-checked)
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = QueryCatalog.byName("qs02_ann_ivf").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want, s"served ranks diverge from qs02 (${got.length} vs ${want.length} rows)")
  }

  test("range serving prunes to probe cells and equals the fused qs20 plan") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-rng").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    val served = IvfIndexStore.rangeQuery(spark, idx, queries,
      nProbe = 4, radius = 0.30)
    // same scale property as top-k serving: the radius sweep must still
    // open only the probed cell directories
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"range serving must prune partitions:\n${plan.take(2000)}")
    // and no top-k state anywhere: the finish is a stateless filter
    assert(!plan.contains("TopKByScore") && !plan.contains("Window"),
      "range serving must not carry top-k or window state")
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = QueryCatalog.byName("qs20_range_search").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want, s"range serving diverges from qs20 (${got.length} vs ${want.length} rows)")
    // tombstoned ids leave the radius sweep like they leave top-k
    val victim = want.head._2
    IvfIndexStore.delete(spark, idx, Seq(victim))
    val after = IvfIndexStore.rangeQuery(spark, idx, queries,
      nProbe = 4, radius = 0.30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == want.filterNot(_._2 == victim),
      "a tombstoned id must vanish from range results and nothing else may move")
  }

  test("streamed appends reach parity with a full build; replays change nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    // build from the first 400 vectors (includes the 16 centroid ids),
    // append the remaining 100 as a "stream" batch
    IvfIndexStore.build(e.filter(col("vec_id") < 400), k = 16, idx)
    val tail = e.filter(col("vec_id") >= 400)
    IvfIndexStore.appendBatch(tail, idx)
    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def serve() = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val afterAppend = serve()
    val want = QueryCatalog.byName("qs02_ann_ivf").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(afterAppend == want,
      "build(400) + append(100) must serve the same ranks as a full-corpus index")
    // at-least-once replay: the same micro-batch delivered twice must be
    // absorbed (postings dedup on (cell, vec_id) at serve time)
    IvfIndexStore.appendBatch(tail, idx)
    assert(serve() == want, "a replayed append batch must change nothing")
  }

  test("appendStream maintains the index live: post-stream serving == full build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-ckpt").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e.filter(col("vec_id") < 400), k = 16, idx)
    val arrivals = e.filter(col("vec_id") >= 400)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = IvfIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      stream.addData(a.toSeq)
      q.processAllAvailable() // two distinct micro-batches
      stream.addData(b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    val got = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = QueryCatalog.byName("qs02_ann_ivf").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want,
      "an index maintained by appendStream must serve the full-corpus ranks")
  }

  test("label-partitioned index prunes on (cell, meta) and serves qs12's exact results") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-meta").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx, metaCol = Some("label"))
    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    val served = IvfIndexStore.queryFiltered(spark, idx, queries, nProbe = 4, topK = 10)
    // BOTH partition axes must reach the scan: probe cells AND the
    // queries' own metadata values — a tenant's query never opens
    // another tenant's partition directories
    val plan = served.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("cell") && pf.contains("meta"),
      s"scan must prune on cell AND meta, got $pf")
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = QueryCatalog.byName("qs12_filtered_ann").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want, "filtered serving must equal qs12's fused in-query plan")
  }

  test("tombstone deletes serve as if the corpus never held the ids; compact folds them in") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    val deleted: Seq[Long] = Seq(7L, 42L, 137L, 300L) // incl. a centroid-seed id (7 < 16)
    IvfIndexStore.delete(spark, idx, deleted)

    val queries = e
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def serve() = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    // ground truth: an index built from the corpus WITHOUT the deleted
    // vectors — but with the ORIGINAL geometry (centroids are fixed at
    // build time; deleting a centroid-seed id removes its posting only)
    val cents = spark.read.parquet(s"$idx/centroids")
      .orderBy(col("cid")).collect()
      .map(_.getSeq[Double](1).toArray)
    val truthIdx = java.nio.file.Files.createTempDirectory("graft-ivf-del-truth").toString
    IvfIndexStore.build(e.filter(!col("vec_id").isInCollection(deleted)),
      k = 16, truthIdx, centroids = Some(cents))
    val want = IvfIndexStore.query(spark, truthIdx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    val got = serve()
    assert(got == want, "tombstoned ids must never serve")
    assert(!got.exists(r => deleted.contains(r._3)))

    // deletes are terminal until compact: re-appending a tombstoned id
    // does not resurrect it; repeated deletes are absorbed
    IvfIndexStore.appendBatch(e.filter(col("vec_id") === 42L), idx)
    IvfIndexStore.delete(spark, idx, Seq(137L))
    assert(serve() == want, "re-append of a tombstoned id must not resurrect it")

    // pruning survives the tombstone anti-join
    val plan = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "probe-cell pruning must survive the tombstone anti-join")

    // compact: serving identical, tombstones gone (from the live epoch's
    // view — the commit marker flips atomically), store holds exactly
    // the surviving vectors once
    IvfIndexStore.compact(spark, idx)
    assert(serve() == want, "serving must be identical across compact")
    val ctx = graft.sinks.ArtifactStore.open(spark, idx)
    assert(ctx.epoch == 1L, "compact must advance the live epoch")
    assert(!ctx.exists("tombstones"))
    val n = spark.read.parquet(ctx.dir("postings")).count()
    assert(n == e.count() - deleted.size,
      s"compacted store must hold each surviving vector exactly once (got $n)")
  }
}
