package graft

import graft.relational.QueryHelpers
import graft.sinks.{ArtifactStore, IvfPqIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent IVF-PQ index: the compressed plane must hold one bounded
  * code row per vector, both serve scans must prune at the partition
  * level (probed cells / candidate vbuckets only), the recall contract
  * must hold, replays/tombstones must fold exactly like the peer stores,
  * and compaction must serve identically across the epoch flip. */
class PqIndexStoreSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private val K = 16; private val S = 8; private val SubK = 256
  private val NProbe = 10; private val TopK = 10; private val CandK = 240

  private def embeddings: DataFrame = QueryHelpers.table(spark, dir, "embeddings")

  private def queriesOf(e: DataFrame, n: Int): DataFrame =
    e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < n)

  private def servedRows(idx: String, queries: DataFrame): Seq[(Long, Int, Long)] = {
    val rows = IvfPqIndexStore.query(spark, idx, queries, NProbe, TopK, CandK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    rows
  }

  test("build shape, partition-pruned serve scans, and the recall contract") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val e = embeddings
    IvfPqIndexStore.build(e, K, S, SubK, idx)
    spark.catalog.clearCache()

    // artifact shape: every vector coded once (S small ints — the 64×
    // compression this store exists for), exact vectors on the cold plane
    val postings = spark.read.parquet(s"$idx/postings")
    assert(postings.count() == e.count())
    assert(postings.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(S), "every code row holds S codes")
    assert(postings.agg(max(array_max(col("codes")))).collect()(0).getInt(0) < SubK,
      "codes index into the subK codebooks")
    assert(spark.read.parquet(s"$idx/vectors").count() == e.count())
    assert(spark.read.parquet(s"$idx/codebooks").count() == S * SubK)

    // both serve scans prune at the partition level — the scale property
    val ctx = ArtifactStore.open(spark, idx)
    val pPlan = IvfPqIndexStore.servedPostings(spark, ctx, Seq(0L, 3L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(pPlan).isDefined,
      s"code scan must prune cell partitions:\n${pPlan.take(1500)}")
    val vPlan = IvfPqIndexStore.vectorSlice(spark, ctx, Seq(0L, 1L, 2L), 64)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*vbucket".r.findFirstIn(vPlan).isDefined,
      s"rerank point reads must prune vbucket partitions:\n${vPlan.take(1500)}")

    // recall contract at this SF (qs31's gate shape; margins measured
    // across SFs by PqIndexProbeMain — 0.98 avg here)
    val q = queriesOf(e, 5)
    val served = servedRows(idx, q)
    assert(served.map(_._1).distinct.length == 5)
    served.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (1 to TopK), "dense ranks 1..topK per query")
    }
    assert(!served.exists(r => r._1 == r._3), "self matches excluded")
    val truth = graft.relational.QueryCatalog.byName("qs01_ann_topk")
      .build(spark, dir).select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val hits = served.count(r => truth((r._1, r._3)))
    assert(hits.toDouble / truth.size >= 0.90,
      s"avg recall must clear the contract (got $hits/${truth.size})")
  }

  test("queryBatch (distributed) is bit-identical to the driver path on the same batch") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-bat").toString
    val e = embeddings
    IvfPqIndexStore.build(e, K, S, SubK, idx)
    spark.catalog.clearCache()
    // every corpus vector queries — the offline-inference shape; the two
    // paths share normalize/adcTable/PqAdc/Ranking, so rows must match
    // exactly (any drift means the shared-kernel discipline broke)
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val viaBatch = IvfPqIndexStore.queryBatch(spark, idx, q, NProbe, TopK, CandK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val viaDriver = servedRows(idx, q)
    assert(viaBatch == viaDriver,
      s"distributed and driver serve paths diverge (${viaBatch.length} vs ${viaDriver.length} rows)")
    assert(viaBatch.map(_._1).distinct.length == e.count(),
      "every corpus vector must be served as a query")
  }

  test("rangeQueryBatch: ADC prefilter is lossless vs a disabled-cut control; tombstones exclude") {
    // the qs39 contract's mechanics: the pinned AdcRangeMargin must admit
    // every true >= radius answer into the exact verify stage, so the
    // served rows must EQUAL a control serve whose margin disables the
    // cut entirely (every probed pair verified exactly) — any divergence
    // is a silently dropped answer
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-range").toString
    val e = embeddings
    IvfPqIndexStore.build(e, K, S, SubK, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    def serve(margin: Double): Seq[(Long, Long, Double)] = {
      val rows = IvfPqIndexStore.rangeQueryBatch(spark, idx, q,
          nProbe = 4, radius = 0.30, adcMargin = margin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    val got = serve(IvfPqIndexStore.AdcRangeMargin)
    val control = serve(2.0) // cut <= -1.7: no pair ever filtered
    assert(got.nonEmpty && got == control,
      s"the pinned margin dropped answers (${got.length} vs ${control.length} rows)")
    // tombstones fold on the code plane, so a deleted id never ANSWERS
    // (no cold-plane read ever happens for it); it may still QUERY — the
    // batch is caller-supplied, the IvfIndexStore range semantics
    val victim = got.head._2
    IvfPqIndexStore.delete(spark, idx, Seq(victim))
    val after = serve(IvfPqIndexStore.AdcRangeMargin)
    assert(!after.exists(_._2 == victim),
      "a tombstoned id must never serve as an answer in the range sweep")
    assert(after == control.filterNot(_._2 == victim),
      "the surviving rows must be exactly the control minus the victim's answer rows")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "range serving must release its pair cache")
  }

  test("appended vectors serve through the stored geometry; replays change nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    val e = embeddings
    IvfPqIndexStore.build(e.filter(col("vec_id") >= 10), K, S, SubK, idx)
    spark.catalog.clearCache()
    val batch = e.filter(col("vec_id") < 10)
    IvfPqIndexStore.appendBatch(batch, idx)
    spark.catalog.clearCache()
    // an exact-duplicate probe must surface the inserted vector at rank 1:
    // its query posts to the same cell the vector coded into, and the
    // exact rerank pins cosine 1.0 first (synthetic ids dodge self-filter)
    val probe = batch.select((col("vec_id") + 1000000L).as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val rank1 = IvfPqIndexStore.query(spark, idx, probe, NProbe, TopK, CandK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(rank1.get(id + 1000000L).contains(id),
        s"appended vector $id must be its own exact query's rank-1 " +
          s"(got ${rank1.get(id + 1000000L)})")
    }
    // at-least-once replay: identical rows in, identical serving out
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    IvfPqIndexStore.appendBatch(batch, idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == before, "a replayed append must not change serving")
  }

  test("appendStream maintains the index live: streamed vectors reach parity with a full build") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pq-sck").toString
    val e = embeddings
    IvfPqIndexStore.build(e.filter(col("vec_id") >= 10), K, S, SubK, idx)
    spark.catalog.clearCache()
    val arrivals = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val sq = IvfPqIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt)
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      stream.addData(a.toSeq)
      sq.processAllAvailable() // two distinct micro-batches
      stream.addData(b.toSeq)
      sq.processAllAvailable()
    } finally sq.stop()
    spark.catalog.clearCache()
    // every streamed vector is its own exact query's rank-1 across
    // micro-batch boundaries (cell + codes computed against the STORED
    // geometry; the exact rerank pins cosine 1.0 first)
    val probe = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    val rank1 = IvfPqIndexStore.query(spark, idx, probe, NProbe, TopK, CandK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(rank1.get(id + 1000000L).contains(id),
        s"streamed vector $id must be its own exact query's rank-1 " +
          s"(got ${rank1.get(id + 1000000L)})")
    }
    // a re-delivered micro-batch (checkpoint replay) changes nothing —
    // serve-time dedup absorbs the byte-identical rows
    val q4 = queriesOf(e, 4)
    val before = servedRows(idx, q4)
    IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 10), idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q4) == before,
      "a replayed streamed batch must not change serving")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "streaming maintenance must leave zero persistent RDDs behind")
  }

  test("tombstones exclude immediately and terminally; compact folds and serves identically") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-del").toString
    val e = embeddings
    IvfPqIndexStore.build(e.filter(col("vec_id") >= 10), K, S, SubK, idx)
    IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 10), idx)
    IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 10), idx) // replay rows
    spark.catalog.clearCache()
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    val victim = before.head._3
    IvfPqIndexStore.delete(spark, idx, Seq(victim))
    val afterDel = servedRows(idx, q)
    assert(!afterDel.exists(_._3 == victim), "tombstoned id must vanish")
    IvfPqIndexStore.appendBatch(e.filter(col("vec_id") === victim), idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == afterDel,
      "re-appending a tombstoned id must not resurrect it")
    IvfPqIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == afterDel, "compaction must not change serving")
    val ctx = ArtifactStore.open(spark, idx)
    assert(ctx.epoch > 0L)
    assert(!ctx.exists("tombstones"), "compaction retires tombstones")
    val posts = spark.read.parquet(ctx.dir("postings"))
    assert(posts.filter(col("vec_id") === victim).take(1).isEmpty,
      "compaction drops tombstoned code rows")
    assert(posts.groupBy(col("cell"), col("vec_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0) == 1L,
      "compaction dedups replayed code rows")
  }

  test("mutations fail loudly behind the compaction guard; batch cap routes loudly") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-grd").toString
    val e = embeddings
    IvfPqIndexStore.build(e, K, S, SubK, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(idx, "_COMPACTING"), ctx.epoch.toString)
    intercept[IllegalStateException] {
      IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 3), idx)
    }
    intercept[IllegalStateException] { IvfPqIndexStore.delete(spark, idx, Seq(5L)) }
    IvfPqIndexStore.compact(spark, idx) // recovery completes the fold
    spark.catalog.clearCache()
    assert(servedRows(idx, queriesOf(e, 3)).nonEmpty, "compact() must recover")
    // the ADC batch cap points at the distributed exact path
    val big = spark.range(4097).select(col("id").as("query_id"),
      array(lit(1.0), lit(0.0)).as("qv"))
    val ex = intercept[IllegalArgumentException] {
      IvfPqIndexStore.query(spark, idx, big, NProbe, TopK, CandK)
    }
    assert(ex.getMessage.contains("queryBatch"), ex.getMessage)
    spark.catalog.clearCache()
  }

  test("metadata-scoped store: filtered serving is label-exact; meta survives append and compact") {
    // the qs36 pin's mechanics: label exactness, loud rejection on an
    // unscoped store / meta-less append, driver/batch path identity, and
    // the meta column surviving append + compact (the IvfIndexStore
    // advice-class bug the graph spec also pins against)
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-meta").toString
    val e = embeddings
    IvfPqIndexStore.build(e.filter(col("vec_id") >= 10), K, S, SubK, idx,
      metaCol = Some("label"))
    spark.catalog.clearCache()
    val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val queries = e.filter(col("vec_id") < 14 && col("vec_id") >= 10)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    def servedFiltered(): Seq[(Long, Int, Long)] = {
      val rows = IvfPqIndexStore.queryFiltered(spark, idx, queries,
          NProbe, TopK, CandK)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    val got = servedFiltered()
    assert(got.nonEmpty)
    got.foreach { case (qid, _, vid) =>
      assert(labels(vid) == labels(qid),
        s"filtered serving must be label-exact: query $qid (${labels(qid)}) " +
          s"got $vid (${labels(vid)})")
    }
    // the distributed filtered path returns the identical row set
    val viaBatch = IvfPqIndexStore.queryFilteredBatch(spark, idx, queries,
        NProbe, TopK, CandK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(viaBatch == got.toSet,
      "queryFilteredBatch must match the driver filtered path row-for-row")
    // an unscoped store rejects filtered queries loudly (both paths)
    val plain = java.nio.file.Files.createTempDirectory("graft-pq-plain").toString
    IvfPqIndexStore.build(e.filter(col("vec_id") >= 10), K, S, SubK, plain)
    spark.catalog.clearCache()
    Seq(
      () => IvfPqIndexStore.queryFiltered(spark, plain, queries, NProbe, TopK, CandK),
      () => IvfPqIndexStore.queryFilteredBatch(spark, plain, queries, NProbe, TopK, CandK)
    ).foreach { f =>
      val ex = intercept[IllegalArgumentException] { f() }
      assert(ex.getMessage.contains("metadata-scoped"), ex.getMessage)
    }
    // append must carry the meta column — loudly without it, exactly with
    val exApp = intercept[IllegalArgumentException] {
      IvfPqIndexStore.appendBatch(
        e.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")), idx)
    }
    assert(exApp.getMessage.contains("metadata-scoped"), exApp.getMessage)
    IvfPqIndexStore.appendBatch(e.filter(col("vec_id") < 10), idx)
    spark.catalog.clearCache()
    val probe = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    val ranked = IvfPqIndexStore.queryFiltered(spark, idx, probe,
        NProbe, TopK, CandK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(ranked.get(id + 1000000L).contains(id),
        s"appended vector $id must be its own exact same-label query's rank-1")
    }
    // compact carries the meta column through the epoch flip
    val before = servedFiltered()
    IvfPqIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedFiltered() == before,
      "filtered serving must be identical across a compact (meta carried)")
  }
}
