package graft

import graft.relational.{QueryCatalog, QueryHelpers}
import graft.sinks.{ArtifactStore, BandIndexStore, GraphIndexStore, IvfIndexStore, TextIndexStore}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 hardening contracts across the persistent artifact plane:
  * the distributed IVF batch serve path, the driver-batch bound, compact
  * folding replays WITHOUT tombstones, metadata-scoped compaction,
  * rebuild resetting the mutation plane, corrupt-guard recovery, the
  * serve retry-at-new-epoch protocol, and the crash-protocol trio pushed
  * through IvfIndexStore, TextIndexStore and GraphIndexStore
  * (ArtifactStoreSpec pins it through BandIndexStore). */
class StoreHardeningSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "window")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- distributed batch serving ----

  test("queryBatch serves the fused qs04 plan bit-identically without collecting the batch") {
    val idx = tmp("graft-qbatch")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    val queries = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val served = IvfIndexStore.queryBatch(spark, idx, queries, nProbe = 4, topK = 3)
    // the scale property survives: even the large-batch path drives a
    // probe-cell PartitionFilter into the postings scan (the cell domain
    // is ≤ K values whatever the batch size)
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"batch serving must still prune partitions:\n${plan.take(2000)}")
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = QueryCatalog.byName("qs04_ann_batch").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got == want, s"queryBatch diverges from qs04 (${got.length} vs ${want.length} rows)")
  }

  test("rangeQueryBatch agrees bit-identically with the driver-side range path; stateless finish") {
    val idx = tmp("graft-rbatch")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    val queries = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val served = IvfIndexStore.rangeQueryBatch(spark, idx, queries,
      nProbe = 4, radius = 0.30)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKByScore") && !plan.contains("Window"),
      "batch range serving must not carry top-k or window state")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"batch range serving must still prune partitions:\n${plan.take(2000)}")
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    spark.catalog.clearCache()
    val want = IvfIndexStore.rangeQuery(spark, idx, queries, nProbe = 4, radius = 0.30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want,
      s"batch range path diverges from the driver-side path (${got.length} vs ${want.length} rows)")
  }

  test("queryFilteredBatch agrees bit-identically with the driver-side filtered path; prunes both axes") {
    val idx = tmp("graft-fbatch")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx, metaCol = Some("label"))
    val queries = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"),
      col("label").cast("string").as("meta"))
    val served = IvfIndexStore.queryFilteredBatch(spark, idx, queries,
      nProbe = 4, topK = 3)
    // the label domain is small, so BOTH partition axes prune even at
    // batch scale (high-cardinality meta degrades to cell-only pruning)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(served.queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("cell") && pf.contains("meta"),
      s"batch filtered serving must prune on cell AND meta, got $pf")
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val want = IvfIndexStore.queryFiltered(spark, idx, queries, nProbe = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want,
      s"batch filtered path diverges from the driver-side path (${got.length} vs ${want.length} rows)")
  }

  test("driver-side serve paths refuse an oversized query batch with a pointer at queryBatch") {
    val idx = tmp("graft-qbound")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    // 65537 rows trips the bound before any vector math touches qv
    val big = spark.range(0, 65537)
      .select(col("id").as("query_id"), array(lit(0.0)).as("qv"))
    val ex = intercept[IllegalArgumentException] {
      IvfIndexStore.query(spark, idx, big, nProbe = 4, topK = 10)
    }
    assert(ex.getMessage.contains("queryBatch"),
      "the bound violation must point the caller at the distributed path")
  }

  test("queryBm25Batch serves each keyword query bit-identically to standalone queryBm25") {
    import spark.implicits._
    val idx = tmp("graft-bm25batch")
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs, buckets = 64, idx)
    val querySet = Seq(
      (0L, Seq("spark", "join", "window")),
      (1L, Seq("merge", "column")),
      (2L, Seq("scan", "filter", "hash")))
    val batch = TextIndexStore.queryBm25Batch(spark, idx,
        querySet.toDF("query_id", "terms"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    querySet.foreach { case (qid, terms) =>
      val single = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(2)) }.toSeq
      assert(batch.getOrElse(qid, Array.empty).toSeq == single,
        s"batch path diverges from standalone queryBm25 for query $qid")
    }
  }

  // ---- compact folds replays even without tombstones ----

  test("BandIndexStore.compact reclaims replayed postings when no tombstones exist") {
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = ((0L until 5L).map(i => (i, page)) ++
      Seq((10L, page + " tail"), (20L, "completely unrelated content lives here")))
      .toDF("doc_id", "text")
    val arriving = Seq((100L, page)).toDF("doc_id", "text")
    val batch = Seq((200L, page + " fresh"), (201L, "another brand new page"))
      .toDF("doc_id", "text")
    val idx = tmp("graft-bidx-replay")
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    def serve() = {
      val got = BandIndexStore.probe(spark, idx, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      got
    }
    BandIndexStore.appendBatch(batch, idx)
    BandIndexStore.appendBatch(batch, idx) // at-least-once replay
    val want = serve()
    val before = spark.read.parquet(
      ArtifactStore.open(spark, idx).dir("postings")).count()
    BandIndexStore.compact(spark, idx) // NO tombstones — must still fold
    val ctx = ArtifactStore.open(spark, idx)
    assert(ctx.epoch == 1L, "a replay-only compact must still commit an epoch")
    val after = spark.read.parquet(ctx.dir("postings")).count()
    assert(after < before,
      s"compact must reclaim the duplicated posting rows ($before -> $after)")
    assert(serve() == want, "probing must be identical across a replay-only compact")
  }

  test("TextIndexStore.compact reclaims replayed postings and folds batch stats without tombstones") {
    val idx = tmp("graft-tidx-replay")
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs.filter(col("doc_id") < 250), buckets = 64, idx)
    val tail = docs.filter(col("doc_id") >= 250)
    TextIndexStore.appendBatch(tail, idx, batchId = 1L)
    TextIndexStore.appendBatch(tail, idx, batchId = 1L) // at-least-once replay
    def serve() = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = serve()
    val before = spark.read.parquet(
      ArtifactStore.open(spark, idx).dir("postings")).count()
    TextIndexStore.compact(spark, idx) // NO tombstones — must still fold
    val ctx = ArtifactStore.open(spark, idx)
    assert(ctx.epoch == 1L)
    val after = spark.read.parquet(ctx.dir("postings")).count()
    assert(after < before,
      s"compact must reclaim the duplicated posting rows ($before -> $after)")
    // batch stats fold into the base: the stats dir collapses to one file
    assert(ArtifactStore.listNames(ctx.fs, ctx.path("stats")) == Seq("base.json"),
      "batch stats files must fold into base.json")
    assert(serve() == want, "serving must be identical across a replay-only compact")
    // and the folded watermark keeps a post-compact replay of batch 1 inert
    TextIndexStore.appendBatch(tail, idx, batchId = 1L)
    assert(serve() == want, "a replay of a folded batch must stay inert after compact")
  }

  // ---- metadata-scoped compaction ----

  test("compact preserves the meta partition axis of a metadata-scoped IVF store") {
    val idx = tmp("graft-ivf-metacompact")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx, metaCol = Some("label"))
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    def serve() = IvfIndexStore.queryFiltered(spark, idx, queries, nProbe = 4, topK = 10)
    val want = serve().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    IvfIndexStore.delete(spark, idx, Seq(want.head._3))
    val afterDelete = serve().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    IvfIndexStore.compact(spark, idx)
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    val served = serve()
    // filtered serving still works AND still prunes on BOTH partition axes
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(served.queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("cell") && pf.contains("meta"),
      s"compacted store must keep the (cell, meta) layout, got $pf")
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == afterDelete, "filtered serving must be identical across compact")
  }

  test("appendBatch on a metadata-scoped store carries the meta partition axis; refuses a meta-less batch") {
    val idx = tmp("graft-ivf-metaappend")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e.filter(col("vec_id") < 400), k = 16, idx,
      metaCol = Some("label"))
    // a batch without the store's meta column must be refused loudly —
    // appending it plain would corrupt the (cell, meta) directory layout
    val ex = intercept[IllegalArgumentException] {
      IvfIndexStore.appendBatch(
        e.filter(col("vec_id") >= 400).select(col("vec_id"), col("embedding")), idx)
    }
    assert(ex.getMessage.contains("label"))
    // a batch carrying it appends into the same layout: serving reaches
    // parity with a full build and still prunes both partition axes
    IvfIndexStore.appendBatch(e.filter(col("vec_id") >= 400), idx)
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    val served = IvfIndexStore.queryFiltered(spark, idx, queries, nProbe = 4, topK = 10)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(served.queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("cell") && pf.contains("meta"),
      s"appended meta store must keep pruning on cell AND meta, got $pf")
    val got = served.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val fullIdx = tmp("graft-ivf-metaappend-full")
    IvfIndexStore.build(e, k = 16, fullIdx, metaCol = Some("label"))
    val want = IvfIndexStore.queryFiltered(spark, fullIdx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, "build(400) + meta append(rest) must serve the full-build ranks")
  }

  test("compact preserves the (cell, meta) HOT-plane axis of a metadata-scoped PQ store") {
    // r13: the scoped PQ store's predicate lives in the CODE plane's
    // partition key — a compact that dropped it would silently unscope
    // every later filtered serve (cross-label candidates), so the layout
    // and the serving identity are pinned through delete + compact
    val idx = tmp("graft-pq-metacompact")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx,
      metaCol = Some("label"))
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    def serve() = graft.sinks.IvfPqIndexStore.queryFiltered(spark, idx, queries,
      nProbe = 16, topK = 10, candK = 240)
    val want = serve().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    graft.sinks.IvfPqIndexStore.delete(spark, idx, Seq(want.head._3))
    val afterDelete = serve().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(afterDelete != want, "the delete must change filtered serving")
    graft.sinks.IvfPqIndexStore.compact(spark, idx)
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    // the compacted hot plane still prunes on BOTH partition axes
    val ctx = ArtifactStore.open(spark, idx)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(graft.sinks.IvfPqIndexStore
        .servedPostings(spark, ctx, Seq(0L, 3L), Some(Seq("1", "2")))
        .queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("cell") && pf.contains("meta"),
      s"compacted scoped PQ store must keep the (cell, meta) layout, got $pf")
    val got = serve().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == afterDelete, "filtered serving must be identical across compact")
  }

  test("appendBatch on a metadata-scoped PQ store carries both planes' meta; refuses a meta-less batch") {
    val idx = tmp("graft-pq-metaappend")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.IvfPqIndexStore.build(e.filter(col("vec_id") < 400), k = 16,
      nSub = 8, subK = 256, idx, metaCol = Some("label"))
    // a batch without the store's meta column is refused BEFORE any write
    // (appending it plain would corrupt the (cell, meta) hot-plane layout)
    val ex = intercept[IllegalArgumentException] {
      graft.sinks.IvfPqIndexStore.appendBatch(
        e.filter(col("vec_id") >= 400).select(col("vec_id"), col("embedding")), idx)
    }
    assert(ex.getMessage.contains("label"))
    // a batch carrying it appends into the same layout: filtered serving
    // reaches parity with a full build (same stored geometry — centroids
    // and codebooks seed from the same lowest-id vectors)
    graft.sinks.IvfPqIndexStore.appendBatch(e.filter(col("vec_id") >= 400), idx)
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    def serve(p: String) = {
      val rows = graft.sinks.IvfPqIndexStore.queryFiltered(spark, p, queries,
        nProbe = 16, topK = 10, candK = 240)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    val got = serve(idx)
    val fullIdx = tmp("graft-pq-metaappend-full")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, fullIdx,
      metaCol = Some("label"))
    val want = serve(fullIdx)
    assert(got.nonEmpty && got.map(_._1).distinct.length == 5)
    // label exactness on the appended store: every served neighbour
    // carries its query's label
    val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.forall { case (q, _, v) => labels(q) == labels(v) },
      "filtered serving must stay label-exact on an appended scoped store")
    assert(want.forall { case (q, _, v) => labels(q) == labels(v) })
  }

  // ---- rebuild resets the mutation plane ----

  // ---- pressure valves: bounded append footprint on every store ----
  // (GraphIndexStoreSpec pins the graph store's row-count valve; these
  // pin the file-count/stats-count valves ported to the other four in
  // r11.) Pattern: a VALVE store and a valve-DISABLED control store feed
  // on identical appends; the valve store's footprint must stay bounded
  // (an epoch must advance — proof a compaction actually ran) while
  // serving stays row-identical to the control.

  test("IVF store: append pressure valve bounds per-cell file counts; serving unchanged") {
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val valved = tmp("graft-ivf-valve"); val control = tmp("graft-ivf-ctl")
    Seq(valved, control).foreach(p => IvfIndexStore.build(e, k = 16, p))
    val batch = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"))
    val Factor = 2
    (1 to 6).foreach { _ =>
      IvfIndexStore.appendBatch(batch, valved, compactFactor = Factor)
      IvfIndexStore.appendBatch(batch, control, compactFactor = 0)
      val ctx = ArtifactStore.open(spark, valved)
      val maxFiles = ArtifactStore.maxPartitionFiles(ctx, "postings",
        (0 until 16).map(c => s"cell=$c"))
      assert(maxFiles <= Factor.toLong,
        s"valve must keep per-cell file counts <= $Factor (got $maxFiles)")
      spark.catalog.clearCache()
    }
    assert(ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 4)
    def serve(p: String) = {
      val rows = IvfIndexStore.query(spark, p, q, nProbe = 4, topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    assert(serve(valved) == serve(control),
      "valve compactions must not change serving")
  }

  test("MaxSim store: append pressure valve bounds per-cell file counts; serving unchanged") {
    import graft.sinks.MaxSimIndexStore
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val valved = tmp("graft-ms-valve"); val control = tmp("graft-ms-ctl")
    Seq(valved, control).foreach(p =>
      MaxSimIndexStore.build(e, k = 16, subs = 4, subDim = 16, p))
    val batch = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"))
    val Factor = 2
    (1 to 6).foreach { _ =>
      MaxSimIndexStore.appendBatch(batch, valved, compactFactor = Factor)
      MaxSimIndexStore.appendBatch(batch, control, compactFactor = 0)
      val ctx = ArtifactStore.open(spark, valved)
      val maxFiles = ArtifactStore.maxPartitionFiles(ctx, "postings",
        (0 until 16).map(c => s"cell=$c"))
      assert(maxFiles <= Factor.toLong,
        s"valve must keep per-cell file counts <= $Factor (got $maxFiles)")
      spark.catalog.clearCache()
    }
    assert(ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 4)
    def serve(p: String) = {
      val rows = MaxSimIndexStore.query(spark, p, q, nProbe = 16, topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    assert(serve(valved) == serve(control),
      "valve compactions must not change serving")
  }

  test("MaxSim appendStream self-heals a crashed valve compaction; one-shot mutators stay loud") {
    import graft.sinks.MaxSimIndexStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val idx = tmp("graft-ms-heal"); val ckpt = tmp("graft-ms-hck")
    MaxSimIndexStore.build(e, k = 16, subs = 4, subDim = 16, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs, new Path(idx, "_COMPACTING"),
      ctx.epoch.toString)
    intercept[IllegalStateException] {
      MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 2), idx)
    }
    val arrivals = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L, transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val sq = MaxSimIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      stream.addData(arrivals.toSeq)
      sq.processAllAvailable() // completes the crashed compact, then appends
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    assert(!ctx.fs.exists(new Path(idx, "_COMPACTING")),
      "the guard must be gone after the healed fold")
    // the appended ids duplicate corpus vectors: MaxSim of an identical
    // vector is the 4.0 ceiling, a TIE with the original — assert the
    // insert serves in the top ranks, not that it wins the tie
    val probe = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 2000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    val served = MaxSimIndexStore.query(spark, idx, probe, nProbe = 16, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q0, arr) => q0 -> arr.map(_._2).toSet }
    spark.catalog.clearCache()
    (0L until 3L).foreach { id =>
      assert(served.get(id + 2000000L).exists(_.contains(id + 1000L)),
        s"the healed stream's insert must serve (got ${served.get(id + 2000000L)})")
    }
  }

  test("PQ store: append pressure valve bounds per-cell file counts; serving unchanged") {
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val valved = tmp("graft-pq-valve"); val control = tmp("graft-pq-ctl")
    Seq(valved, control).foreach(p =>
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, p))
    val batch = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"))
    val Factor = 2
    (1 to 6).foreach { _ =>
      graft.sinks.IvfPqIndexStore.appendBatch(batch, valved, compactFactor = Factor)
      graft.sinks.IvfPqIndexStore.appendBatch(batch, control, compactFactor = 0)
      val ctx = ArtifactStore.open(spark, valved)
      val maxFiles = ArtifactStore.maxPartitionFiles(ctx, "postings",
        (0 until 16).map(c => s"cell=$c"))
      assert(maxFiles <= Factor.toLong,
        s"valve must keep per-cell file counts <= $Factor (got $maxFiles)")
      spark.catalog.clearCache()
    }
    assert(ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 4)
    def serve(p: String) = {
      val rows = graft.sinks.IvfPqIndexStore.query(spark, p, q,
          nProbe = 10, topK = 5, candK = 120)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    assert(serve(valved) == serve(control),
      "valve compactions must not change serving")
  }

  test("band store: append pressure valve bounds per-bucket file counts; serving unchanged") {
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = (0L until 5L).map(i => (i, page + s" v$i")).toDF("doc_id", "text")
    val batch = Seq((200L, page + " fresh")).toDF("doc_id", "text")
    val arriving = Seq((100L, page + " fresh")).toDF("doc_id", "text")
    val valved = tmp("graft-bidx-valve"); val control = tmp("graft-bidx-ctl")
    Seq(valved, control).foreach(p =>
      BandIndexStore.build(existing, p, shingleN = 4, numPerms = 8, rowsPerBand = 4))
    val Factor = 2
    val buckets = (0 until 64).map(b => s"bucket=$b") // DefaultBuckets domain
    (1 to 6).foreach { _ =>
      BandIndexStore.appendBatch(batch, valved, compactFactor = Factor)
      BandIndexStore.appendBatch(batch, control, compactFactor = 0)
      val ctx = ArtifactStore.open(spark, valved)
      val maxFiles = ArtifactStore.maxPartitionFiles(ctx, "postings", buckets)
      assert(maxFiles <= Factor.toLong,
        s"valve must keep per-bucket file counts <= $Factor (got $maxFiles)")
      spark.catalog.clearCache()
    }
    assert(ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    def serve(p: String) = {
      val rows = BandIndexStore.probe(spark, p, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    assert(serve(valved) == serve(control),
      "valve compactions must not change probing")
  }

  test("text store: append pressure valve bounds unfolded stats files; serving unchanged") {
    val docs = QueryHelpers.table(spark, dir, "documents").limit(40)
    val valved = tmp("graft-tidx-valve"); val control = tmp("graft-tidx-ctl")
    Seq(valved, control).foreach(p => TextIndexStore.build(docs, 64, p))
    val Factor = 2
    (1 to 6).foreach { i =>
      // distinct docs + monotone batch ids: the genuine long-stream shape
      // whose unfolded stats increments grow without a valve
      val batch = Seq((10000L + i, s"spark join window batch $i content"))
        .toDF("doc_id", "text")
      TextIndexStore.appendBatch(batch, valved, i.toLong, compactFactor = Factor)
      TextIndexStore.appendBatch(batch, control, i.toLong, compactFactor = 0)
      val ctx = ArtifactStore.open(spark, valved)
      val unfolded = ArtifactStore.listNames(ctx.fs, ctx.path("stats"))
        .count(s => s.startsWith("batch-") && s.endsWith(".json"))
      // compact deletes absorbed batch files, so the live count IS the
      // unfolded count
      assert(unfolded <= Factor,
        s"valve must keep unfolded stats files <= $Factor (got $unfolded)")
      spark.catalog.clearCache()
    }
    assert(ArtifactStore.open(spark, valved).epoch >= 1L,
      "the valve must actually have compacted")
    def serve(p: String) = {
      val rows = TextIndexStore.queryBm25(spark, p, terms, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    assert(serve(valved) == serve(control),
      "valve compactions must not change BM25 serving")
  }

  test("IVF appendStream self-heals a crashed valve compaction; one-shot mutators stay loud") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val idx = tmp("graft-ivf-heal"); val ckpt = tmp("graft-ivf-hck")
    IvfIndexStore.build(e, k = 16, idx)
    spark.catalog.clearCache()
    // the valve makes a crashed compact reachable unattended: live-epoch
    // guard left mid-fold — the stream must complete it, not wedge
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs, new Path(idx, "_COMPACTING"),
      ctx.epoch.toString)
    intercept[IllegalStateException] {
      IvfIndexStore.appendBatch(e.filter(col("vec_id") < 2), idx)
    }
    val arrivals = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L, transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val sq = IvfIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      stream.addData(arrivals.toSeq)
      sq.processAllAvailable() // completes the crashed compact, then appends
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    assert(!ctx.fs.exists(new Path(idx, "_COMPACTING")),
      "the guard must be gone after the healed fold")
    val probe = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 2000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    // the appended ids duplicate corpus vectors, so they TIE at cosine 1
    // and rank behind the lower original id — assert they serve in the
    // top ranks, not that they win the tie
    val served = IvfIndexStore.query(spark, idx, probe, nProbe = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q0, arr) => q0 -> arr.map(_._2).toSet }
    spark.catalog.clearCache()
    (0L until 3L).foreach { id =>
      assert(served.get(id + 2000000L).exists(_.contains(id + 1000L)),
        s"the healed stream's insert must serve (got ${served.get(id + 2000000L)})")
    }
  }

  test("PQ appendStream self-heals a crashed valve compaction; one-shot mutators stay loud") {
    // the r11 valve made unattended compactions routine on the PQ stream
    // too — the heal path (code-identical to IVF's) needs its own pin:
    // a crashed fold's live-epoch guard must wedge one-shot mutators but
    // be completed by the stream's next micro-batch
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val idx = tmp("graft-pq-heal"); val ckpt = tmp("graft-pq-hck")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs, new Path(idx, "_COMPACTING"),
      ctx.epoch.toString)
    intercept[IllegalStateException] {
      graft.sinks.IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 2), idx)
    }
    val arrivals = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L, transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val sq = graft.sinks.IvfPqIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      stream.addData(arrivals.toSeq)
      sq.processAllAvailable() // completes the crashed compact, then appends
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    assert(!ctx.fs.exists(new Path(idx, "_COMPACTING")),
      "the guard must be gone after the healed fold")
    // appended ids duplicate corpus vectors: exact-rerank cosine 1.0 ties
    // put them in the top ranks (behind the lower original id)
    val probe = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 2000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    val served = graft.sinks.IvfPqIndexStore.query(spark, idx, probe,
        nProbe = 10, topK = 3, candK = 72)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q0, arr) => q0 -> arr.map(_._2).toSet }
    spark.catalog.clearCache()
    (0L until 3L).foreach { id =>
      assert(served.get(id + 2000000L).exists(_.contains(id + 1000L)),
        s"the healed stream's insert must serve (got ${served.get(id + 2000000L)})")
    }
  }

  test("band appendStream self-heals a crashed valve compaction; one-shot mutators stay loud") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = (0L until 5L).map(i => (i, page + s" v$i")).toDF("doc_id", "text")
    val idx = tmp("graft-bidx-heal"); val ckpt = tmp("graft-bidx-hck")
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs, new Path(idx, "_COMPACTING"),
      ctx.epoch.toString)
    intercept[IllegalStateException] {
      BandIndexStore.appendBatch(Seq((300L, page + " wedged")).toDF("doc_id", "text"), idx)
    }
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sq = BandIndexStore.appendStream(
      stream.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      stream.addData(Seq((200L, page + " fresh")))
      sq.processAllAvailable() // completes the crashed compact, then appends
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    assert(!ctx.fs.exists(new Path(idx, "_COMPACTING")),
      "the guard must be gone after the healed fold")
    // the streamed doc must probe as a near-dup partner of an arriving twin
    val got = BandIndexStore.probe(spark, idx,
        Seq((100L, page + " fresh")).toDF("doc_id", "text"), 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(got.exists(r => r._1 == 100L && r._2 >= 1L),
      s"the healed stream's doc must serve as a probe partner (got $got)")
  }

  test("text appendStream self-heals a crashed valve compaction before its next batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmp("graft-tidx-heal"); val ckpt = tmp("graft-tidx-hck")
    TextIndexStore.build(
      QueryHelpers.table(spark, dir, "documents").limit(30), 64, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs, new Path(idx, "_COMPACTING"),
      ctx.epoch.toString)
    intercept[IllegalStateException] {
      TextIndexStore.appendBatch(
        Seq((9000L, "wedged")).toDF("doc_id", "text"), idx, 0L)
    }
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sq = TextIndexStore.appendStream(
      stream.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      stream.addData(Seq((9001L, "spark join window healed stream doc")))
      sq.processAllAvailable()
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    val got = TextIndexStore.queryBm25(spark, idx, Seq("healed"), 5)
      .collect().map(_.getLong(0)).toSeq
    spark.catalog.clearCache()
    assert(got == Seq(9001L), s"the healed stream's doc must serve (got $got)")
  }

  test("maxPartitionFiles counts per served leaf dir; scoped builds refuse manifest-breaking meta names") {
    // (a) the valve metric must measure the unit a pruned serve OPENS: a
    // (cell, meta) layout's per-meta subdirectory, never the sum across
    // meta values (which would compact a many-label store on every append)
    val root = tmp("graft-valve-leaf")
    val fs = ArtifactStore.fileSystem(spark, root)
    def mk(rel: String): Unit =
      ArtifactStore.writeString(fs, new Path(root, rel), "x")
    Seq("flat/cell=0/a.parquet", "flat/cell=0/b.parquet", "flat/cell=0/c.parquet",
      "flat/cell=0/_SUCCESS",
      "scoped/cell=0/meta=x/a.parquet", "scoped/cell=0/meta=x/b.parquet",
      "scoped/cell=0/meta=y/a.parquet").foreach(mk)
    val ctx = ArtifactStore.open(spark, root)
    assert(ArtifactStore.maxPartitionFiles(ctx, "flat", Seq("cell=0")) == 3L,
      "flat layouts count their own data files (markers excluded)")
    assert(ArtifactStore.maxPartitionFiles(ctx, "scoped", Seq("cell=0")) == 2L,
      "nested layouts count per meta leaf dir, not the cross-meta sum")
    assert(ArtifactStore.maxPartitionFiles(ctx, "scoped", Seq("cell=9")) == 0L)
    // (b) a metaCol name that would corrupt manifest.json's regex-parsed
    // JSON is refused at build time, before any write, on every scoped store
    val e = QueryHelpers.table(spark, dir, "embeddings")
    Seq(
      () => IvfIndexStore.build(e, k = 16, tmp("graft-badmeta-ivf"),
        metaCol = Some("bad\"name")),
      () => graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256,
        tmp("graft-badmeta-pq"), metaCol = Some("bad\\name")),
      () => GraphIndexStore.build(e, tmp("graft-badmeta-g"), degree = 8,
        metaCol = Some("bad,name"))
    ).foreach { b =>
      val ex = intercept[IllegalArgumentException](b())
      assert(ex.getMessage.contains("manifest"), ex.getMessage)
    }
  }

  test("rebuilding a store in place clears tombstones recorded against the old corpus") {
    // IVF: a fresh corpus reusing a tombstoned vec_id must serve
    val ivf = tmp("graft-ivf-rebuild")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, ivf)
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def ivfServe() = IvfIndexStore.query(spark, ivf, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = ivfServe()
    IvfIndexStore.delete(spark, ivf, Seq(want.head._3))
    assert(ivfServe() != want, "sanity: the tombstone visibly reshapes serving")
    IvfIndexStore.build(e, k = 16, ivf) // rebuild with the same ids
    assert(ivfServe() == want,
      "a rebuild must not inherit tombstones from the previous corpus")

    // Text: stale per-batch stats files must not double-count on rebuild
    val tidx = tmp("graft-tidx-rebuild")
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs, buckets = 64, tidx)
    def tServe() = TextIndexStore.queryBm25(spark, tidx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val tWant = tServe()
    TextIndexStore.delete(spark, tidx, Seq(tWant.head._1))
    TextIndexStore.appendBatch(docs.limit(5), tidx, batchId = 9L)
    TextIndexStore.build(docs, buckets = 64, tidx) // rebuild in place
    assert(tServe() == tWant,
      "a rebuild must reset tombstones AND stale batch stats (scores depend on N, Σdl)")
  }

  test("a rebuild that fails validation leaves the delete plane intact (no resurrection)") {
    val idx = tmp("graft-ivf-failedrebuild")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def serve() = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val victim = serve().head._3
    IvfIndexStore.delete(spark, idx, Seq(victim))
    val want = serve()
    assert(!want.exists(_._3 == victim))
    // rebuild with a corpus lacking the deterministic centroid ids
    // 0..k-1 fails validation — the mutation plane resets only AFTER all
    // writes succeed, so the tombstone must survive the failed attempt
    intercept[IllegalArgumentException] {
      IvfIndexStore.build(e.filter(col("vec_id") >= 100), k = 16, idx)
    }
    assert(serve() == want,
      "a failed rebuild must not resurrect tombstoned documents")
  }

  // ---- corrupt guard recovery ----

  test("an empty/corrupt _COMPACTING guard fails mutations loudly but compact still recovers") {
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = ((0L until 5L).map(i => (i, page)) ++
      Seq((20L, "completely unrelated content lives here"))).toDF("doc_id", "text")
    val arriving = Seq((100L, page)).toDF("doc_id", "text")
    val idx = tmp("graft-corrupt-guard")
    BandIndexStore.build(existing, idx, shingleN = 4, numPerms = 8, rowsPerBand = 4)
    def serve() = {
      val got = BandIndexStore.probe(spark, idx, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      got
    }
    val want = serve()
    // crash mid-write of the guard on a non-atomic FS: an EMPTY file
    val fs = ArtifactStore.fileSystem(spark, idx)
    ArtifactStore.writeString(fs, new Path(idx, "_COMPACTING"), "")
    intercept[IllegalStateException] { // loud, not NumberFormatException
      BandIndexStore.appendBatch(Seq((300L, "fresh text")).toDF("doc_id", "text"), idx)
    }
    assert(serve() == want, "a corrupt guard must not disturb serving")
    // the documented recovery path works: compact() overwrites the junk
    BandIndexStore.compact(spark, idx)
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve() == want, "recovery through a corrupt guard must serve identically")
    BandIndexStore.appendBatch(Seq((300L, "fresh text")).toDF("doc_id", "text"), idx)
  }

  // ---- serve retry-at-new-epoch ----

  test("serving() retries once when the live epoch advanced; rethrows otherwise") {
    val root = tmp("graft-serve-retry")
    val fs = ArtifactStore.fileSystem(spark, root)
    fs.mkdirs(new Path(root))
    var calls = 0
    val got = ArtifactStore.serving(spark, root) { ctx =>
      calls += 1
      if (calls == 1) {
        // a compact commits between our open and the component read: its
        // GC deletes the epoch-0 files out from under the listing
        ArtifactStore.writeString(fs, new Path(root, "epoch-1"), "")
        throw new RuntimeException("simulated: epoch-0 files lost to GC")
      }
      ctx.epoch
    }
    assert(calls == 2 && got == 1L,
      "a proven commit race must retry exactly once at the new epoch")
    // no epoch advance → a genuine failure propagates untouched
    val ex = intercept[RuntimeException] {
      ArtifactStore.serving(spark, root) { _ => throw new RuntimeException("real failure") }
    }
    assert(ex.getMessage == "real failure")
  }

  // ---- crash-protocol trio through IvfIndexStore and TextIndexStore ----

  test("IVF store: crashed compaction blocks mutations, never serving; compact recovers; post-commit garbage is inert") {
    val idx = tmp("graft-ivf-crash")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    IvfIndexStore.delete(spark, idx, Seq(42L, 137L))
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def serve() = IvfIndexStore.query(spark, idx, queries, nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = serve()
    // pre-commit crash: guard raised, staging garbage half-written
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("postings"))
    val staged = java.nio.file.Paths.get(ArtifactStore.stagingDir(ctx, "postings"))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.writeString(staged.resolve("part-junk.parquet"), "not parquet")
    intercept[IllegalStateException] {
      IvfIndexStore.appendBatch(e.filter(col("vec_id") === 450L), idx)
    }
    intercept[IllegalStateException] { IvfIndexStore.delete(spark, idx, Seq(1L)) }
    assert(serve() == want, "a crashed compaction must not disturb IVF serving")
    IvfIndexStore.compact(spark, idx) // sweeps staging junk, folds, commits
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve() == want, "IVF serving must be identical across the recovered compact")
    // post-commit crash: stale guard + resurrected old-epoch dir
    val root = java.nio.file.Paths.get(idx)
    java.nio.file.Files.writeString(root.resolve("_COMPACTING"), "0")
    val stale = root.resolve("postings")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("part-junk.parquet"), "not parquet")
    assert(serve() == want, "serving resolves the live epoch, never stale dirs")
    IvfIndexStore.appendBatch(e.filter(col("vec_id") === 450L), idx) // sweeps the guard
    val fs = ArtifactStore.fileSystem(spark, idx)
    assert(!fs.exists(new Path(idx, "_COMPACTING")),
      "a stale post-commit guard must be swept by the next mutation")
  }

  test("PQ store: crashed compaction blocks mutations, never serving; compact recovers; post-commit garbage is inert") {
    val idx = tmp("graft-pq-crash")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
    graft.sinks.IvfPqIndexStore.delete(spark, idx, Seq(42L, 137L))
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    def serve() = {
      val rows = graft.sinks.IvfPqIndexStore
        .query(spark, idx, queries, nProbe = 10, topK = 10, candK = 240)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    val want = serve()
    // pre-commit crash: guard raised, staging garbage half-written (BOTH
    // epoched components — the PQ store rewrites two planes)
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("postings", "vectors"))
    Seq("postings", "vectors").foreach { comp =>
      val staged = java.nio.file.Paths.get(ArtifactStore.stagingDir(ctx, comp))
      java.nio.file.Files.createDirectories(staged)
      java.nio.file.Files.writeString(staged.resolve("part-junk.parquet"), "not parquet")
    }
    intercept[IllegalStateException] {
      graft.sinks.IvfPqIndexStore.appendBatch(e.filter(col("vec_id") === 450L), idx)
    }
    intercept[IllegalStateException] {
      graft.sinks.IvfPqIndexStore.delete(spark, idx, Seq(1L))
    }
    assert(serve() == want, "a crashed compaction must not disturb PQ serving")
    graft.sinks.IvfPqIndexStore.compact(spark, idx) // sweeps staging junk, folds, commits
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve() == want, "PQ serving must be identical across the recovered compact")
    // post-commit crash: stale guard + resurrected old-epoch dirs
    val root = java.nio.file.Paths.get(idx)
    java.nio.file.Files.writeString(root.resolve("_COMPACTING"), "0")
    Seq("postings", "vectors").foreach { comp =>
      val stale = root.resolve(comp)
      java.nio.file.Files.createDirectories(stale)
      java.nio.file.Files.writeString(stale.resolve("part-junk.parquet"), "not parquet")
    }
    assert(serve() == want, "serving resolves the live epoch, never stale dirs")
    graft.sinks.IvfPqIndexStore.appendBatch(e.filter(col("vec_id") === 450L), idx)
    val fs = ArtifactStore.fileSystem(spark, idx)
    assert(!fs.exists(new Path(idx, "_COMPACTING")),
      "a stale post-commit guard must be swept by the next mutation")
  }

  test("text store: crashed compaction blocks mutations, never serving; compact recovers; post-commit garbage is inert") {
    val idx = tmp("graft-tidx-crash")
    val docs = QueryHelpers.table(spark, dir, "documents")
    TextIndexStore.build(docs, buckets = 64, idx)
    def serve() = TextIndexStore.queryBm25(spark, idx, terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val victims = serve().take(1).map(_._1)
    TextIndexStore.delete(spark, idx, victims)
    val want = serve()
    // pre-commit crash: guard raised, staging garbage half-written (the
    // text store's compact has store-specific fold logic — doclens +
    // stats — that the shared BandIndexStore pin doesn't reach)
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("postings", "doclens", "stats"))
    val staged = java.nio.file.Paths.get(ArtifactStore.stagingDir(ctx, "stats"))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.writeString(staged.resolve("base.json"), "{corrupt")
    intercept[IllegalStateException] {
      TextIndexStore.appendBatch(docs.limit(3), idx, batchId = 5L)
    }
    intercept[IllegalStateException] { TextIndexStore.delete(spark, idx, Seq(1L)) }
    assert(serve() == want, "a crashed compaction must not disturb BM25 serving")
    TextIndexStore.compact(spark, idx) // sweeps staging junk, folds, commits
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve() == want,
      "BM25 serving (scores included — the folded stats arithmetic) must be identical across the recovered compact")
    // post-commit crash: stale guard + resurrected old-epoch stats dir
    // (would double-count N and Σdl if the live view ever read it)
    val root = java.nio.file.Paths.get(idx)
    java.nio.file.Files.writeString(root.resolve("_COMPACTING"), "0")
    val stale = root.resolve("stats")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("base.json"),
      """{"n":999999,"sumdl":999999}""")
    assert(serve() == want, "serving resolves the live epoch's stats, never stale dirs")
    TextIndexStore.appendBatch(docs.limit(3), idx, batchId = 6L) // sweeps the guard
    val fs = ArtifactStore.fileSystem(spark, idx)
    assert(!fs.exists(new Path(idx, "_COMPACTING")),
      "a stale post-commit guard must be swept by the next mutation")
  }

  // ---- clean-store certificates (r12: ArtifactStore.isClean on every
  // store — GraphIndexStoreSpec pins the graph's; these pin the other
  // four). Pattern: a DIRTY store (replayed appends) and a CLEAN control
  // (same content, compacted) must serve row-identically — the dirty fold
  // and the clean verbatim fast path check each other — plus the marker
  // state machine: build certifies, append revokes, a tombstone revokes
  // without touching the marker file, compact re-certifies.

  private def cleanOf(p: String): Boolean =
    ArtifactStore.isClean(ArtifactStore.open(spark, p))

  test("IVF store: clean certificate state machine; clean fast path serves the dirty fold's exact rows") {
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val dirty = tmp("graft-ivf-dirty"); val clean = tmp("graft-ivf-clean")
    val head = e.filter(col("vec_id") < 400); val tail = e.filter(col("vec_id") >= 400)
    Seq(dirty, clean).foreach { p =>
      IvfIndexStore.build(head, k = 16, p)
      assert(cleanOf(p), "a fresh build must certify clean")
      IvfIndexStore.appendBatch(tail, p, compactFactor = 0)
      assert(!cleanOf(p), "an append must revoke the certificate")
    }
    IvfIndexStore.appendBatch(tail, dirty, compactFactor = 0) // at-least-once replay
    IvfIndexStore.compact(spark, clean)
    assert(cleanOf(clean), "compact must re-certify (the rewrite IS the fold)")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 6)
    def serve(p: String) = {
      val rows = IvfIndexStore.query(spark, p, q, nProbe = 4, topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache(); rows
    }
    val want = serve(dirty)
    assert(serve(clean) == want,
      "the clean verbatim fast path must serve the dirty fold's exact rows")
    // a tombstone revokes cleanliness WITHOUT touching the marker file,
    // and the fold honors it despite the epoch's marker
    IvfIndexStore.delete(spark, clean, Seq(want.head._3))
    assert(!cleanOf(clean), "a tombstone must revoke cleanliness")
    val afterDelete = serve(clean)
    assert(!afterDelete.exists(_._3 == want.head._3),
      "a tombstone must be honored despite the epoch's marker file")
    IvfIndexStore.compact(spark, clean)
    assert(cleanOf(clean) && serve(clean) == afterDelete,
      "re-certified serving must match the pre-compact tombstone fold")
  }

  test("PQ store: clean certificate state machine; clean fast path serves the dirty fold's exact rows") {
    val e = QueryHelpers.table(spark, dir, "embeddings")
    val dirty = tmp("graft-pq-dirty"); val clean = tmp("graft-pq-clean")
    val head = e.filter(col("vec_id") < 400); val tail = e.filter(col("vec_id") >= 400)
    Seq(dirty, clean).foreach { p =>
      graft.sinks.IvfPqIndexStore.build(e = head, k = 16, nSub = 8, subK = 256, path = p)
      assert(cleanOf(p), "a fresh build must certify clean")
      graft.sinks.IvfPqIndexStore.appendBatch(tail, p, compactFactor = 0)
      assert(!cleanOf(p), "an append must revoke the certificate")
    }
    graft.sinks.IvfPqIndexStore.appendBatch(tail, dirty, compactFactor = 0) // replay
    graft.sinks.IvfPqIndexStore.compact(spark, clean)
    assert(cleanOf(clean), "compact must re-certify (the rewrite IS the fold)")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 6)
    def serve(p: String) = {
      val rows = graft.sinks.IvfPqIndexStore
        .query(spark, p, q, nProbe = 10, topK = 10, candK = 240)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache(); rows
    }
    val want = serve(dirty)
    assert(serve(clean) == want,
      "the clean verbatim fast path must serve the dirty fold's exact rows")
    graft.sinks.IvfPqIndexStore.delete(spark, clean, Seq(want.head._3))
    assert(!cleanOf(clean), "a tombstone must revoke cleanliness")
    val afterDelete = serve(clean)
    assert(!afterDelete.exists(_._3 == want.head._3),
      "a tombstone must be honored despite the epoch's marker file")
    graft.sinks.IvfPqIndexStore.compact(spark, clean)
    assert(cleanOf(clean) && serve(clean) == afterDelete,
      "re-certified serving must match the pre-compact tombstone fold")
  }

  test("band store: clean certificate state machine; clean fast path probes the dirty fold's exact rows") {
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val existing = ((0L until 5L).map(i => (i, page)) ++
      Seq((20L, "completely unrelated content lives here"))).toDF("doc_id", "text")
    val batch = Seq((200L, page + " fresh"), (201L, "another brand new page"))
      .toDF("doc_id", "text")
    val arriving = Seq((100L, page), (101L, page + " fresh")).toDF("doc_id", "text")
    val dirty = tmp("graft-bidx-dirty"); val clean = tmp("graft-bidx-clean")
    Seq(dirty, clean).foreach { p =>
      BandIndexStore.build(existing, p, shingleN = 4, numPerms = 8, rowsPerBand = 4)
      assert(cleanOf(p), "a fresh build must certify clean")
      BandIndexStore.appendBatch(batch, p, compactFactor = 0)
      assert(!cleanOf(p), "an append must revoke the certificate")
    }
    BandIndexStore.appendBatch(batch, dirty, compactFactor = 0) // replay
    BandIndexStore.compact(spark, clean)
    assert(cleanOf(clean), "compact must re-certify (the rewrite IS the fold)")
    def serve(p: String) = {
      val rows = BandIndexStore.probe(spark, p, arriving, 0.80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache(); rows
    }
    val want = serve(dirty)
    assert(serve(clean) == want,
      "the clean verbatim fast path must probe the dirty max-fold's exact rows")
    // delete one member of the collapsed 5-doc page group: the decrement
    // fold must run despite the epoch's marker file
    BandIndexStore.delete(spark, clean, Seq(1L))
    assert(!cleanOf(clean), "a tombstone must revoke cleanliness")
    val afterDelete = serve(clean)
    assert(afterDelete.find(_._1 == 100L).map(_._2) ==
      want.find(_._1 == 100L).map(_._2 - 1L),
      "the tombstone must decrement the partner count despite the marker file")
    BandIndexStore.compact(spark, clean)
    assert(cleanOf(clean) && serve(clean) == afterDelete,
      "re-certified probing must match the pre-compact tombstone fold")
  }

  test("text store: clean certificate state machine; clean fast path serves the dirty fold's exact scores") {
    val docs = QueryHelpers.table(spark, dir, "documents")
    val dirty = tmp("graft-tidx-dirty"); val clean = tmp("graft-tidx-clean")
    val head = docs.filter(col("doc_id") < 250); val tail = docs.filter(col("doc_id") >= 250)
    Seq(dirty, clean).foreach { p =>
      TextIndexStore.build(head, buckets = 64, p)
      assert(cleanOf(p), "a fresh build must certify clean")
      TextIndexStore.appendBatch(tail, p, batchId = 1L, compactFactor = 0)
      assert(!cleanOf(p), "an append must revoke the certificate")
    }
    TextIndexStore.appendBatch(tail, dirty, batchId = 1L, compactFactor = 0) // replay
    TextIndexStore.compact(spark, clean)
    assert(cleanOf(clean), "compact must re-certify (the rewrite IS the fold)")
    def serve(p: String) = {
      val rows = TextIndexStore.queryBm25(spark, p, terms, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache(); rows
    }
    val want = serve(dirty)
    assert(serve(clean) == want,
      "the clean verbatim fast path must serve the dirty fold's exact " +
        "rows AND scores (stats arithmetic included)")
    TextIndexStore.delete(spark, clean, Seq(want.head._1))
    assert(!cleanOf(clean), "a tombstone must revoke cleanliness")
    val afterDelete = serve(clean)
    assert(!afterDelete.exists(_._1 == want.head._1),
      "a tombstone must be honored despite the epoch's marker file")
    TextIndexStore.compact(spark, clean)
    assert(cleanOf(clean) && serve(clean) == afterDelete,
      "re-certified serving must match the pre-compact tombstone fold")
  }

  test("text store: phrase serving intersects positional postings; agrees with a scan twin through replay/delete/compact") {
    // queryPhrase (qt32) answers quoted queries from the stored position
    // lists without touching document text; this pins it against an
    // INDEPENDENT full-scan formulation (qt31's expression shape) through
    // every mutation state, plus the bucket-axis partition pruning
    val idx = tmp("graft-tidx-phrase")
    val docs = QueryHelpers.table(spark, dir, "documents")
    val head = docs.filter(col("doc_id") < 250)
    val tail = docs.filter(col("doc_id") >= 250)
    val phrase = Seq("fast", "table")
    def twin(dset: org.apache.spark.sql.DataFrame) = {
      val toks = graft.pipeline.TextOps.tokens(col("text"))
      val n = size(col("toks"))
      val ps = when(n >= 2, filter(sequence(lit(1), n - 1),
          i => element_at(col("toks"), i.cast("int")) === phrase.head &&
            element_at(col("toks"), (i + 1).cast("int")) === phrase(1)))
        .otherwise(array().cast("array<int>"))
      dset.select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), ps.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("doc_id"), size(col("ps")).cast("long"),
          element_at(col("ps"), 1).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    def serve() = {
      val df = TextIndexStore.queryPhrase(spark, idx, phrase)
      val pf = "PartitionFilters: \\[[^\\]]*\\]".r
        .findFirstIn(df.queryExecution.executedPlan.toString).getOrElse("")
      assert(pf.contains("bucket"),
        s"phrase serving must prune the token-hash bucket axis, got $pf")
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      spark.catalog.clearCache(); rows
    }
    TextIndexStore.build(head, buckets = 64, idx)
    assert(serve() == twin(head),
      "clean-path phrase serving must match the scan twin")
    TextIndexStore.appendBatch(tail, idx, batchId = 1L, compactFactor = 0)
    TextIndexStore.appendBatch(tail, idx, batchId = 1L, compactFactor = 0) // replay
    val full = twin(docs)
    assert(serve() == full,
      "phrase serving must fold replayed appends to the full-corpus twin")
    val victim = full.head._1
    TextIndexStore.delete(spark, idx, Seq(victim))
    val want = full.filterNot(_._1 == victim)
    assert(serve() == want, "a tombstoned doc must vanish from phrase hits")
    TextIndexStore.compact(spark, idx)
    assert(serve() == want, "phrase serving must be identical across compact")
  }

  test("text store: batch phrase serving equals standalone queryPhrase per query, incl. single-token and duplicate-word phrases") {
    val idx = tmp("graft-tidx-phraseb")
    TextIndexStore.build(QueryHelpers.table(spark, dir, "documents"),
      buckets = 64, idx)
    val phrases = Seq(
      (0L, Seq("fast", "table")),
      (1L, Seq("table")), // single slot: the sequence(1,0) guard branch
      (2L, Seq("table", "table")), // two slots over the SAME posting row
      (3L, Seq("stream", "table", "hash")))
    val batch = TextIndexStore
      .queryPhraseBatch(spark, idx, phrases.toDF("query_id", "phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.groupBy(_._1)
    spark.catalog.clearCache()
    phrases.foreach { case (qid, ph) =>
      val single = TextIndexStore.queryPhrase(spark, idx, ph)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single,
        s"batch phrase path diverges from standalone queryPhrase for $ph")
    }
    assert(batch.getOrElse(1L, Seq.empty).nonEmpty &&
      batch.getOrElse(2L, Seq.empty).nonEmpty,
      "fixture sanity: the edge-branch phrases must actually match docs")
    spark.catalog.clearCache()
  }

  test("text store: proximity at window = L-1 degenerates to the exact phrase; window bounds are enforced") {
    // the algebraic pin tying the two positional-serve paths together:
    // L strictly-increasing positions spanning <= L-1 tokens are exactly
    // consecutive, so queryProximity(terms, L-1) must equal
    // queryPhrase(terms) row for row — if either path's position
    // semantics drift, this breaks before any oracle does
    val idx = tmp("graft-tidx-prox")
    TextIndexStore.build(QueryHelpers.table(spark, dir, "documents"),
      buckets = 64, idx)
    for (terms <- Seq(Seq("fast", "table"), Seq("stream", "table", "hash"))) {
      val prox = TextIndexStore
        .queryProximity(spark, idx, terms, window = terms.length - 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val phrase = TextIndexStore.queryPhrase(spark, idx, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(prox == phrase,
        s"window=L-1 proximity must equal the exact phrase for $terms")
      spark.catalog.clearCache()
    }
    // a wider window can only add docs/anchors (monotone in the window)
    val tight = TextIndexStore.queryProximity(spark, idx, Seq("fast", "table"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wide = TextIndexStore.queryProximity(spark, idx, Seq("fast", "table"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tight.keySet.subsetOf(wide.keySet) &&
      tight.forall { case (d, n) => wide(d) >= n },
      "widening the window must never lose a doc or an anchor")
    spark.catalog.clearCache()
    intercept[IllegalArgumentException] {
      TextIndexStore.queryProximity(spark, idx, Seq("fast", "table"), 0)
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryProximity(spark, idx, Seq("fast"), 3)
    }
  }

  test("text store: batch proximity serving equals standalone queryProximity per query (greedy fold == nested exists)") {
    // the dominance-argument pin: queryProximityBatch decides chain
    // existence by a greedy fold (min next position per slot) while the
    // standalone path nests existential lambdas — two independent
    // decision procedures that must agree anchor-for-anchor. The set
    // covers 2- and 3-term chains, the window = L-1 phrase degeneration,
    // and a duplicate-word query (both slots over one posting row).
    import spark.implicits._
    val idx = tmp("graft-tidx-proxb")
    TextIndexStore.build(QueryHelpers.table(spark, dir, "documents"),
      buckets = 64, idx)
    val queries = Seq(
      (0L, Seq("fast", "table"), 4),
      (1L, Seq("stream", "table", "hash"), 2), // window = L-1: the phrase
      (2L, Seq("table", "table"), 3),
      (3L, Seq("fast", "table", "scan"), 5))
    val batch = TextIndexStore
      .queryProximityBatch(spark, idx, queries.toDF("query_id", "terms", "window"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.groupBy(_._1)
    spark.catalog.clearCache()
    queries.foreach { case (qid, ts, w) =>
      val single = TextIndexStore.queryProximity(spark, idx, ts, w)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single,
        s"batch proximity path diverges from standalone for $ts ~$w")
      spark.catalog.clearCache()
    }
    assert(queries.map(_._1).forall(q => batch.getOrElse(q, Seq.empty).nonEmpty),
      "fixture sanity: every gated proximity query must actually match docs")
    // input-contract errors surface before any job runs
    intercept[IllegalArgumentException] {
      TextIndexStore.queryProximityBatch(spark, idx,
        Seq((0L, Seq("fast", "table"), 4), (0L, Seq("stream", "hash"), 8))
          .toDF("query_id", "terms", "window"))
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryProximityBatch(spark, idx,
        Seq((0L, Seq("fast", "table", "scan"), 1))
          .toDF("query_id", "terms", "window"))
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryProximityBatch(spark, idx,
        Seq((0L, Seq("fast"), 3)).toDF("query_id", "terms", "window"))
    }
  }

  test("text store: NEAR (unordered proximity) contains the ordered chain; doc set is term-order invariant") {
    // the two algebraic pins tying queryNear to queryProximity: every
    // ordered chain within a window is also an unordered one (NEAR's doc
    // set ⊇ proximity's at the same terms/window), and NEAR's matched
    // DOC SET is symmetric in the terms (anchors count on the first
    // listed term, so n_anchors/first_pos legitimately differ — only the
    // doc_id set is order-free)
    val idx = tmp("graft-tidx-near")
    TextIndexStore.build(QueryHelpers.table(spark, dir, "documents"),
      buckets = 64, idx)
    for ((terms, w) <- Seq((Seq("fast", "table"), 4),
        (Seq("stream", "table", "hash"), 5))) {
      val near = TextIndexStore.queryNear(spark, idx, terms, w)
        .collect().map(_.getLong(0)).toSet
      val ordered = TextIndexStore.queryProximity(spark, idx, terms, w)
        .collect().map(_.getLong(0)).toSet
      assert(ordered.subsetOf(near),
        s"every ordered chain is an unordered one: $terms ~$w")
      spark.catalog.clearCache()
      val reversed = TextIndexStore.queryNear(spark, idx, terms.reverse, w)
        .collect().map(_.getLong(0)).toSet
      assert(near == reversed,
        s"NEAR's doc set must be symmetric in the terms: $terms ~$w")
      spark.catalog.clearCache()
    }
    // the gated pair finds STRICTLY more docs than the ordered chain
    // (reversed-order hits) — the fixture property the qt36 comment cites
    val near = TextIndexStore.queryNear(spark, idx, Seq("fast", "table"), 4)
      .collect().map(_.getLong(0)).toSet
    val ordered = TextIndexStore
      .queryProximity(spark, idx, Seq("fast", "table"), 4)
      .collect().map(_.getLong(0)).toSet
    assert(ordered.size < near.size,
      "fixture sanity: NEAR must find reversed-order docs the chain misses")
    spark.catalog.clearCache()
    intercept[IllegalArgumentException] {
      TextIndexStore.queryNear(spark, idx, Seq("table", "table"), 4)
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryNear(spark, idx, Seq("fast"), 4)
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryNear(spark, idx, Seq("fast", "table", "scan"), 1)
    }
  }

  test("text store: batch NEAR serving equals standalone queryNear per query (window cover == nested pairwise)") {
    // the equivalence pin: queryNearBatch decides anchors by the
    // candidate-window-min cover check while the standalone path nests
    // pairwise lambdas — independent decision procedures that must agree
    // anchor-for-anchor (the window-min argument: a valid choice's
    // minimum is the anchor or an occurrence within [p−w, p], and its
    // w-window covers every slot)
    import spark.implicits._
    val idx = tmp("graft-tidx-nearb")
    TextIndexStore.build(QueryHelpers.table(spark, dir, "documents"),
      buckets = 64, idx)
    val queries = Seq(
      (0L, Seq("fast", "table"), 4),
      (1L, Seq("stream", "hash"), 6),
      (2L, Seq("fast", "table", "scan"), 6),
      (3L, Seq("stream", "table", "hash"), 2)) // window = L-1, the tightest
    val batch = TextIndexStore
      .queryNearBatch(spark, idx, queries.toDF("query_id", "terms", "window"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.groupBy(_._1)
    spark.catalog.clearCache()
    queries.foreach { case (qid, ts, w) =>
      val single = TextIndexStore.queryNear(spark, idx, ts, w)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single,
        s"batch NEAR path diverges from standalone for $ts N$w")
      spark.catalog.clearCache()
    }
    assert(queries.take(3).map(_._1)
      .forall(q => batch.getOrElse(q, Seq.empty).nonEmpty),
      "fixture sanity: the gated NEAR queries must actually match docs")
    intercept[IllegalArgumentException] {
      TextIndexStore.queryNearBatch(spark, idx,
        Seq((0L, Seq("table", "table"), 4)).toDF("query_id", "terms", "window"))
    }
    intercept[IllegalArgumentException] {
      TextIndexStore.queryNearBatch(spark, idx,
        Seq((0L, Seq("fast", "table"), 4), (0L, Seq("stream", "hash"), 6))
          .toDF("query_id", "terms", "window"))
    }
  }

  test("store health surface tracks the mutation state machine") {
    // the when-to-compact observability table (ArtifactStore.health via
    // per-store wrappers): every signal a deploy on its own maintenance
    // cadence keys on must move with the state machine
    val idx = tmp("graft-ivf-health")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    IvfIndexStore.build(e, k = 16, idx)
    def h() = IvfIndexStore.health(spark, idx).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val h0 = h()
    assert(h0("epoch") == 0L && h0("clean") == 1L && h0("tombstones") == 0L &&
      h0("compacting") == 0L && h0("postings_files") > 0L &&
      h0("postings_bytes") > 0L && h0("postings_max_leaf_files") >= 1L,
      s"fresh build health wrong: $h0")
    val batch = e.filter(col("vec_id") < 3)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"))
    IvfIndexStore.appendBatch(batch, idx, compactFactor = 0)
    IvfIndexStore.appendBatch(batch, idx, compactFactor = 0)
    IvfIndexStore.delete(spark, idx, Seq(0L, 1L))
    val h1 = h()
    assert(h1("clean") == 0L && h1("tombstones") == 2L &&
      h1("postings_files") > h0("postings_files"),
      s"mutated health must show the dirt: $h1")
    IvfIndexStore.compact(spark, idx)
    val h2 = h()
    assert(h2("epoch") == 1L && h2("clean") == 1L && h2("tombstones") == 0L &&
      h2("postings_files") <= h1("postings_files"),
      s"compacted health must show the fold: $h2")
    // a crashed fold's guard is visible (mutations are blocked until
    // compact() re-runs — exactly what an operator needs surfaced)
    ArtifactStore.writeString(ArtifactStore.fileSystem(spark, idx),
      new Path(idx, "_COMPACTING"), "1")
    assert(h()("compacting") == 1L)
    // a multi-component store reports every epoched component
    val tidx = tmp("graft-tidx-health")
    TextIndexStore.build(
      QueryHelpers.table(spark, dir, "documents").limit(30), 64, tidx)
    val th = TextIndexStore.health(spark, tidx).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(th("clean") == 1L && th("postings_files") > 0L &&
      th("doclens_files") > 0L && th("stats_files") > 0L, s"text health: $th")
  }

  test("graph store: crashed compaction blocks mutations, never serving; compact recovers; post-commit garbage is inert") {
    val idx = tmp("graft-gidx-crash")
    val e = QueryHelpers.table(spark, dir, "embeddings")
    GraphIndexStore.build(e, idx, degree = 8, assign = 2, nEntries = 4,
      buckets = 16)
    val queries = e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 4)
    def serve() = {
      val rows = GraphIndexStore.query(spark, idx, queries,
        beam = 8, hops = 2, topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    GraphIndexStore.delete(spark, idx, Seq(serve().head._3))
    val want = serve()
    // pre-commit crash: guard raised, staging garbage half-written (the
    // graph compact's fold — tombstone-before-truncation, entry
    // re-derivation — is store-specific logic the shared pin doesn't reach)
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.beginCompact(ctx, Seq("edges", "vectors", "entries"))
    val staged = java.nio.file.Paths.get(ArtifactStore.stagingDir(ctx, "edges"))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.writeString(staged.resolve("part-junk.parquet"), "not parquet")
    intercept[IllegalStateException] {
      GraphIndexStore.append(e.filter(col("vec_id") === 3L), idx)
    }
    intercept[IllegalStateException] { GraphIndexStore.delete(spark, idx, Seq(1L)) }
    assert(serve() == want, "a crashed compaction must not disturb graph serving")
    GraphIndexStore.compact(spark, idx) // sweeps staging junk, folds, commits
    assert(ArtifactStore.open(spark, idx).epoch == 1L)
    assert(serve() == want,
      "graph serving must be identical across the recovered compact " +
        "(tombstone-before-truncation fold order on both sides)")
    // post-commit crash: stale guard + resurrected old-epoch edge dir
    val root = java.nio.file.Paths.get(idx)
    java.nio.file.Files.writeString(root.resolve("_COMPACTING"), "0")
    val stale = root.resolve("edges")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("part-junk.parquet"), "not parquet")
    assert(serve() == want, "serving resolves the live epoch, never stale dirs")
    GraphIndexStore.delete(spark, idx, Seq(499L)) // sweeps the stale guard
    val fs = ArtifactStore.fileSystem(spark, idx)
    assert(!fs.exists(new Path(idx, "_COMPACTING")),
      "a stale post-commit guard must be swept by the next mutation")
  }
}
