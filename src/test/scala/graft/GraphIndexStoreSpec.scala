package graft

import graft.pipeline.KnnGraph
import graft.relational.QueryHelpers
import graft.sinks.{ArtifactStore, GraphIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent graph-ANN index: a fresh store must serve the in-memory
  * [[KnnGraph]] walk bit-identically; per-hop scans must prune to the
  * frontier's bucket partitions; NSW insertion makes appended vectors
  * reachable; tombstones exclude without resurrection; compact folds
  * reverse/replayed edges back under the degree bound and serves
  * identically. */
class GraphIndexStoreSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private val Degree = 8; private val Beam = 8; private val Hops = 2
  private val TopK = 5; private val Buckets = 16

  private def embeddings: DataFrame = QueryHelpers.table(spark, dir, "embeddings")

  private def queriesOf(e: DataFrame, n: Int): DataFrame =
    e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < n)

  private def servedRows(idx: String, queries: DataFrame): Seq[(Long, Int, Long)] =
    GraphIndexStore.query(spark, idx, queries, Beam, Hops, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("fresh store serves the in-memory graph walk bit-identically; scans prune") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)

    // artifact shape: every vector stored once, ≤ degree out-edges per src
    val vecs = spark.read.parquet(s"$idx/vectors")
    assert(vecs.count() == e.count())
    val edges = spark.read.parquet(s"$idx/edges")
    assert(edges.groupBy(col("src")).count().agg(max(col("count"))).first().getLong(0)
      <= Degree, "fresh build must respect the degree bound")

    // the per-hop slice builders are the scale property: both scans must
    // prune at the partition level (unlisted buckets never open)
    val ctx = ArtifactStore.open(spark, idx)
    val ePlan = GraphIndexStore.edgeSlice(spark, ctx, Seq(0L, 1L, 2L),
      Buckets).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ebucket".r.findFirstIn(ePlan).isDefined,
      s"edge slice must prune ebucket partitions:\n${ePlan.take(1500)}")
    val vPlan = GraphIndexStore.vectorSlice(spark, ctx, Seq(0L, 1L, 2L),
      Buckets).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*vbucket".r.findFirstIn(vPlan).isDefined,
      s"vector slice must prune vbucket partitions:\n${vPlan.take(1500)}")

    // serving parity vs the in-memory engine on the same geometry: the
    // store pins entries = the 4 lowest ids and cells = the qs27 adaptive
    // count (max(16, n/400) = 16 on this fixture)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")).persist()
    val cents = v.filter(col("vec_id") < 16)
    val g = KnnGraph.build(v, cents, 2, Degree).persist()
    val q = queriesOf(e, 4)
    val scope = new graft.core.WalkScope
    val visited = KnnGraph.search(v, g,
      q.select(col("query_id"), col("qv")), Seq(0L, 1L, 2L, 3L), Beam, Hops,
      scope)
    val topk = graft.functions.TopKAggregator.topK(TopK)
    val want = visited.filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("col.vec_id"))
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    scope.release()
    val got = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(got == want,
      s"store serving diverges from KnnGraph.search (${got.length} vs ${want.length} rows)")
    assert(got.nonEmpty && got.map(_._1).distinct.length == 4)
    // memory discipline: the serve path released its walk state (checkpoint
    // blocks are RDD-level — clearCache alone cannot free them)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "graph serving must leave zero persistent RDDs behind")
  }

  test("NSW append makes new vectors reachable; replays are absorbed") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-app").toString
    val e = embeddings
    // build on ids >= 10, then insert ids < 10 (entries become 10..13)
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    val batch = e.filter(col("vec_id") < 10)
    GraphIndexStore.append(batch, idx, beam = 32, hops = 4)
    spark.catalog.clearCache()

    // reachability: probing with an inserted vector's exact values must
    // surface that vector at rank 1 (cosine 1.0 — reachable only through
    // its reverse in-edges; a synthetic query id avoids the self filter)
    val probe = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    // generous walk budget: the contract is reachability of the reverse
    // in-edges, not a minimal-budget walk — once reached, cosine 1.0
    // makes rank 1 unconditional. hops=5 because an inserted vector sits
    // one hop BEYOND its (possibly only-just-reached) nearest neighbour:
    // at hops=4 one of the 10 probes surfaced the near-duplicate of its
    // target (found on the last hop, never expanded) instead of the
    // target itself
    val ranked = GraphIndexStore.query(spark, idx, probe, beam = 32,
        hops = 5, TopK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(ranked.get(id + 1000000L).contains(id),
        s"inserted vector $id must be its own exact query's rank-1 " +
          s"(got ${ranked.get(id + 1000000L)})")
    }

    // at-least-once replay: appending the same batch again changes nothing
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    spark.catalog.clearCache()
    GraphIndexStore.append(batch, idx, beam = 32, hops = 4)
    spark.catalog.clearCache()
    val after = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(after == before, "a replayed append must not change serving")
  }

  test("appendStream maintains the graph live: streamed vectors reachable, replays inert") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gidx-sck").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    val arrivals = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = GraphIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt, beam = 32, hops = 4)
    try {
      val (a, b) = arrivals.splitAt(arrivals.length / 2)
      stream.addData(a.toSeq)
      q.processAllAvailable() // two distinct micro-batches
      stream.addData(b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.clearCache()
    // reachability across micro-batch boundaries: each streamed vector is
    // its own exact query's rank-1 (hops=5 — the append test's rationale)
    val probe = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    val ranked = GraphIndexStore.query(spark, idx, probe, beam = 32,
        hops = 5, TopK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(ranked.get(id + 1000000L).contains(id),
        s"streamed vector $id must be its own exact query's rank-1 " +
          s"(got ${ranked.get(id + 1000000L)})")
    }
    // a re-delivered micro-batch (checkpoint replay after restart) is an
    // exact no-op — the vector-row landed marker, no batch-id bookkeeping
    val q4 = queriesOf(e, 4)
    val before = servedRows(idx, q4)
    spark.catalog.clearCache()
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx,
      beam = 32, hops = 4)
    spark.catalog.clearCache()
    assert(servedRows(idx, q4) == before,
      "a replayed streamed batch must not change serving")
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "streaming maintenance must leave zero persistent RDDs behind")
  }

  test("delete excludes immediately and terminally; compact folds and serves identically") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-del").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx,
      beam = 32, hops = 4)
    spark.catalog.clearCache()
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    spark.catalog.clearCache()

    // tombstone a served id: it vanishes; re-append does not resurrect
    val victim = before.head._3
    GraphIndexStore.delete(spark, idx, Seq(victim))
    val afterDel = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(!afterDel.exists(_._3 == victim), "tombstoned id must vanish")
    GraphIndexStore.append(e.filter(col("vec_id") === victim), idx,
      beam = 32, hops = 4)
    spark.catalog.clearCache()
    val afterRe = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(afterRe == afterDel, "re-appending a tombstoned id must not resurrect it")

    // compact: serves identically, retires tombstones, restores the
    // degree bound the append's reverse edges exceeded
    val rawOver = spark.read.parquet(s"$idx/edges")
      .groupBy(col("src")).count().filter(col("count") > Degree).count()
    assert(rawOver > 0, "fixture must exercise reverse-edge overflow")
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val afterCompact = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(afterCompact == afterDel, "compaction must not change serving")
    val ctx2 = ArtifactStore.open(spark, idx)
    assert(!ctx2.exists("tombstones"), "compaction retires tombstones")
    assert(spark.read.parquet(ctx2.dir("edges"))
      .groupBy(col("src")).count().agg(max(col("count"))).first().getLong(0) <= Degree,
      "compaction re-truncates every neighbourhood to the degree bound")
    assert(!spark.read.parquet(ctx2.dir("vectors"))
      .filter(col("vec_id") === victim).take(1).nonEmpty,
      "compaction drops tombstoned vectors")
  }

  test("rebuild resets the mutation plane: old tombstones die with the old corpus") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-reb").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    val q = queriesOf(e, 4)
    val victim = servedRows(idx, q).head._3
    spark.catalog.clearCache()
    GraphIndexStore.delete(spark, idx, Seq(victim))
    assert(!servedRows(idx, q).exists(_._3 == victim))
    spark.catalog.clearCache()
    // a rebuild replaces the corpus — the stale tombstone must not keep
    // suppressing a fresh document that reuses the id
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    assert(servedRows(idx, q).exists(_._3 == victim),
      "rebuild must clear tombstones recorded against the old corpus")
    spark.catalog.clearCache()
  }

  test("all-entries-tombstoned fails loudly; compact re-derives entries") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-ent").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 2, buckets = Buckets)
    spark.catalog.clearCache()
    GraphIndexStore.delete(spark, idx, Seq(0L, 1L)) // both entry points
    val q = queriesOf(e, 3)
    val ex = intercept[IllegalArgumentException] { servedRows(idx, q) }
    assert(ex.getMessage.contains("entry point"), ex.getMessage)
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val served = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(served.nonEmpty, "compact must re-derive entries from survivors")
    assert(!served.exists(r => r._3 == 0L || r._3 == 1L),
      "deleted former entries must stay deleted after the re-derivation")
  }

  test("metadata-scoped store: filtered serving is label-exact through append and compact") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-meta").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx, degree = Degree,
      assign = 2, nEntries = 4, buckets = Buckets, metaCol = Some("label"))
    val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val queries = e.filter(col("vec_id") < 14 && col("vec_id") >= 10)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    def servedFiltered(): Seq[(Long, Int, Long)] = {
      val rows = GraphIndexStore.queryFiltered(spark, idx, queries,
        beam = 16, hops = 3, topK = TopK)
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
    // an unscoped store rejects filtered queries loudly
    val plain = java.nio.file.Files.createTempDirectory("graft-gidx-plain").toString
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), plain,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    val exPlain = intercept[IllegalArgumentException] {
      GraphIndexStore.queryFiltered(spark, plain, queries, 16, 3, TopK)
    }
    assert(exPlain.getMessage.contains("metadata-scoped"), exPlain.getMessage)
    // append must carry the meta column — loudly without it, exactly with
    val exApp = intercept[IllegalArgumentException] {
      GraphIndexStore.append(
        e.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
        idx, beam = 16, hops = 3)
    }
    assert(exApp.getMessage.contains("metadata-scoped"), exApp.getMessage)
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx,
      beam = 32, hops = 4)
    spark.catalog.clearCache()
    val probe = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    val ranked = GraphIndexStore.queryFiltered(spark, idx, probe,
        beam = 32, hops = 5, TopK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 10L).foreach { id =>
      assert(ranked.get(id + 1000000L).contains(id),
        s"appended vector $id must be its own exact same-label query's rank-1")
    }
    // compact carries the meta column (dropping it would break filtered
    // serving after a compact — the IvfIndexStore advice-class bug)
    val before = servedFiltered()
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedFiltered() == before,
      "filtered serving must be identical across a compact (meta carried)")
  }

  test("scoped store: appending a NEVER-SEEN label bootstraps its subgraph; absent labels serve empty") {
    // the r13 new-label path: rows of a label the store has never seen
    // cannot walk (no entries) — they bootstrap the label's subgraph
    // (in-batch exact kNN + the group's lowest ids become entries,
    // appended BEFORE edges and vectors), after which both filtered
    // paths serve the label like any other
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-boot").toString
    val e = embeddings
    val heldOut = "0"
    GraphIndexStore.build(e.filter(col("label").cast("string") =!= heldOut),
      idx, degree = Degree, assign = 2, nEntries = 4, buckets = Buckets,
      metaCol = Some("label"))
    val held = e.filter(col("label").cast("string") === heldOut)
    val heldIds = held.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val qHeld = held
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 1000000L + 200L)
    // before the append: the label is ABSENT — filtered serving is empty
    // through both paths, not an error
    assert(GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().isEmpty, "an absent label must serve empty (driver fold)")
    val preBatch = GraphIndexStore.queryFilteredBatch(spark, idx, qHeld, 16, 3, TopK)
    assert(preBatch.collect().isEmpty,
      "an absent label must serve empty (distributed walk)")
    spark.catalog.clearCache()
    // bootstrap: append the whole held-out label in one batch
    GraphIndexStore.append(held, idx, beam = 16, hops = 3)
    spark.catalog.clearCache()
    // entries now exist for the label, and every query's own vector is
    // its rank-1 same-label neighbour (reachable through the in-batch
    // kNN edges + per-label entries)
    val got = GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got.nonEmpty, "the bootstrapped label must serve")
    val rank1 = got.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    qHeld.select(col("query_id")).collect().map(_.getLong(0)).foreach { qid =>
      assert(rank1.get(qid).contains(qid - 1000000L),
        s"bootstrapped vector ${qid - 1000000L} must be its own query's rank-1")
    }
    assert(got.forall(t => heldIds(t._3)),
      "bootstrapped-label serving must stay label-exact")
    // batch path identity on the bootstrapped label
    val viaBatch = GraphIndexStore.queryFilteredBatch(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(viaBatch.sorted == got.sorted,
      "distributed and driver folds must agree on a bootstrapped label")
    // a replayed bootstrap batch is an exact no-op (vector-row markers)
    GraphIndexStore.append(held, idx, beam = 16, hops = 3)
    spark.catalog.clearCache()
    val afterReplay = GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(afterReplay == got, "a replayed bootstrap batch must change nothing")
    // compact preserves the per-label entry plane: serving identical after
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val afterCompact = GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(afterCompact == got,
      "scoped serving must be identical across compact (entries per label)")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the walks must release their checkpoint state")
  }

  test("scoped store: a bootstrap append that crashed after its entry write heals on retry") {
    // the crash window the entries-first write order opens: a new-label
    // bootstrap lands its entry rows, then dies before edges/vectors.
    // The retry MUST NOT classify the label as known off entry existence
    // (it would walk a vector-less subgraph, write zero edges, and serve
    // only the nEntries ids forever) — known means at least one entry id
    // has a LANDED vector row, so all-orphan labels re-bootstrap.
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-bcrash").toString
    val e = embeddings
    val heldOut = "0"
    GraphIndexStore.build(e.filter(col("label").cast("string") =!= heldOut),
      idx, degree = Degree, assign = 2, nEntries = 4, buckets = Buckets,
      metaCol = Some("label"))
    // dirty the store through a REAL mutator first (a real crashed append
    // always revoked the clean marker before its first write — storage
    // injection must only ever model states reachable that way)
    GraphIndexStore.delete(spark, idx,
      Seq(e.filter(col("label").cast("string") =!= heldOut)
        .agg(max(col("vec_id"))).head().getLong(0)))
    val held = e.filter(col("label").cast("string") === heldOut)
    val heldIds = held.select(col("vec_id")).collect().map(_.getLong(0)).sorted
    // inject the crashed bootstrap's footprint: entry rows only
    val ctx = ArtifactStore.open(spark, idx)
    heldIds.take(4).toSeq.map(id => (id, heldOut)).toDF("vec_id", "meta")
      .coalesce(1).write.mode("append").parquet(ctx.dir("entries"))
    // the retry (the at-least-once redelivery) must re-bootstrap
    GraphIndexStore.append(held, idx, beam = 16, hops = 3)
    spark.catalog.clearCache()
    val qHeld = held
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    val got = GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val rank1 = got.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    heldIds.foreach { id =>
      assert(rank1.get(id + 1000000L).contains(id),
        s"after the heal, vector $id must be its own query's rank-1 — " +
          "an entry-existence classification would strand the label")
    }
    // and the label serves MORE than its entry ids (edges exist)
    assert(got.map(_._3).distinct.length > 4,
      "the healed label must serve beyond its entry points")
    // compact sweeps any duplicate/orphan entry rows; serving unchanged
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val afterCompact = GraphIndexStore.queryFiltered(spark, idx, qHeld, 16, 3, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(afterCompact == got, "serving must be identical across compact")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("query batches beyond the walk-slice bound serve by internal chunking; appends stay capped") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-bnd").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    // a >4096-query batch (real vectors, wrapped around the corpus): the
    // serve path folds per ≤4096-query slice — per-hop driver state stays
    // bounded by the slice — and the result is bit-identical to ANY other
    // slicing, because each query's walk is independent (the property a
    // future cross-query optimization must not break)
    val n = e.count()
    val big = spark.range(4200)
      .select(col("id").as("query_id"), pmod(col("id"), lit(n)).as("vec_id"))
      .join(e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("qv")), Seq("vec_id"))
      .select(col("query_id"), col("qv"))
      .persist()
    val served = GraphIndexStore.query(spark, idx, big, beam = 8, hops = 1,
        topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache(); big.persist()
    assert(served.map(_._1).distinct.length == 4200,
      "every query of the large batch must be served")
    val fine = GraphIndexStore.queryChunked(spark, idx, big, beam = 8,
        hops = 1, topK = 3, chunk = 997)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(fine == served, "serving must be slice-size invariant")
    // APPEND batches stay capped (an append is a sequential insert — the
    // remediation is smaller batches, not a bigger walk), with
    // append-specific advice
    val bigBatch = spark.range(4097)
      .select(col("id").as("vec_id"), array(lit(1.0), lit(0.0)).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      GraphIndexStore.append(bigBatch, idx, beam = 8, hops = 1)
    }
    assert(ex.getMessage.contains("split the append"), ex.getMessage)
    assert(!ex.getMessage.contains("queryBatch"),
      "append remediation must not point at the query-only IVF batch path")
    spark.catalog.clearCache()
  }

  test("orphan edges (crashed append footprint) never occupy degree slots; compact removes them") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-orp").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    spark.catalog.clearCache()
    // simulate an append that crashed between its edge and vector writes:
    // edge rows to a dst that has NO vector row, at an impossible-high
    // cosine so naive truncation would rank the orphan FIRST in every
    // entry's neighbourhood and evict a real edge from its degree slot
    val orphan = 999999L
    Seq(0L, 1L, 2L, 3L).map(src => (src, orphan, 2.0))
      .toDF("src", "dst", "cosine")
      .withColumn("ebucket", pmod(col("src"), lit(Buckets.toLong)))
      .coalesce(1)
      .write.partitionBy("ebucket").mode("append").parquet(s"$idx/edges")
    val withOrphans = servedRows(idx, q)
    spark.catalog.clearCache()
    assert(!withOrphans.exists(_._3 == orphan), "an orphan id must never serve")
    assert(withOrphans == before,
      "orphans must not evict live edges from truncated neighbourhoods " +
        "(the fold re-truncates after proving the dst vector-less)")
    // compact applies the same exclusion (dst semi-joined against live
    // vector ids) — serve identity across compact holds, orphan rows die
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    assert(spark.read.parquet(ctx.dir("edges"))
      .filter(col("dst") === orphan).take(1).isEmpty,
      "compact must drop orphan edges")
    assert(servedRows(idx, q) == before,
      "serving must be identical across a compact that swept orphans")
    spark.catalog.clearCache()
  }

  test("queryBatch (distributed walk) is bit-identical to the driver fold across appends, tombstones and orphans") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-qb").toString
    val e = embeddings
    // exercise EVERY fold the two paths must share: append-inflated
    // neighbourhoods (reverse in-edges past degree), replayed rows,
    // tombstones, and orphan edges from a simulated crashed append
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx, beam = 32, hops = 4)
    GraphIndexStore.delete(spark, idx, Seq(25L, 37L))
    // REAL replayed rows: a retried append whose first attempt landed its
    // edges but not its vector marker re-writes byte-identical edge rows
    // (append()'s marker makes a full replay a no-op, so duplicates must
    // be injected at the storage layer to exercise both folds' dedup)
    val dupes = spark.read.parquet(s"$idx/edges")
      .select(col("src"), col("dst"), col("cosine"), col("ebucket"))
      .orderBy(col("src"), col("dst")).limit(7).collect()
    spark.createDataFrame(spark.sparkContext.parallelize(dupes.toIndexedSeq),
        spark.read.parquet(s"$idx/edges")
          .select(col("src"), col("dst"), col("cosine"), col("ebucket")).schema)
      .coalesce(1)
      .write.partitionBy("ebucket").mode("append").parquet(s"$idx/edges")
    // and an orphan (crashed append: edges without a vector row)
    Seq(10L, 11L).map(src => (src, 888888L, 2.0))
      .toDF("src", "dst", "cosine")
      .withColumn("ebucket", pmod(col("src"), lit(Buckets.toLong)))
      .coalesce(1)
      .write.partitionBy("ebucket").mode("append").parquet(s"$idx/edges")
    spark.catalog.clearCache()
    assert(spark.read.parquet(s"$idx/edges")
      .groupBy(col("src"), col("dst")).count()
      .filter(col("count") > 1).count() > 0,
      "fixture must contain real duplicate edge rows")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val viaBatch = GraphIndexStore.queryBatch(spark, idx, q, Beam, Hops, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val viaDriver = GraphIndexStore.query(spark, idx, q, Beam, Hops, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(viaBatch == viaDriver,
      s"distributed and driver-fold walks diverge (${viaBatch.length} vs ${viaDriver.length} rows)")
    assert(viaBatch.nonEmpty && !viaBatch.exists(r =>
      r._3 == 888888L || r._3 == 25L || r._3 == 37L),
      "orphans and tombstoned ids must serve from neither path")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the distributed walk must release its checkpoint state")
  }

  test("queryFilteredBatch (distributed) matches the driver filtered fold through append and delete") {
    // the qs35 pin's mechanics: the distributed filtered path must return
    // the driver fold's exact row set — including after the mutation
    // plane has diverged the stored view from the built one
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-fqb").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx, degree = Degree,
      assign = 2, nEntries = 4, buckets = Buckets, metaCol = Some("label"))
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx, beam = 32, hops = 4)
    GraphIndexStore.delete(spark, idx, Seq(25L, 37L))
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"),
      col("label").cast("string").as("meta"))
    val viaBatch = GraphIndexStore.queryFilteredBatch(spark, idx, q,
        Beam, Hops, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val viaDriver = GraphIndexStore.queryFiltered(spark, idx, q,
        Beam, Hops, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(viaBatch.sorted == viaDriver.sorted,
      s"distributed and driver filtered walks diverge " +
        s"(${viaBatch.length} vs ${viaDriver.length} rows)")
    assert(viaBatch.nonEmpty && !viaBatch.exists(r => r._3 == 25L || r._3 == 37L),
      "tombstoned ids must serve from neither filtered path")
    // label exactness on the distributed path
    val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    viaBatch.foreach { case (qid, _, vid) =>
      assert(labels(vid) == labels(qid), s"cross-label row: $qid -> $vid")
    }
    // an unscoped store rejects the distributed filtered path loudly too
    val plain = java.nio.file.Files.createTempDirectory("graft-gidx-fqbp").toString
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), plain,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    val ex = intercept[IllegalArgumentException] {
      GraphIndexStore.queryFilteredBatch(spark, plain, q, Beam, Hops, TopK)
    }
    assert(ex.getMessage.contains("metadata-scoped"), ex.getMessage)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the distributed filtered walk must release its checkpoint state")
  }

  test("clean-store marker: build/compact certify, append/delete revoke, serving identical through every state") {
    // the r12 serve fast path: a certified-clean store serves the stored
    // planes VERBATIM (no distributed fold); the marker state machine and
    // the serve identity across clean → dirty → re-cleaned states are the
    // whole contract — a wrong transition either wastes the fold forever
    // (perf) or serves unfolded garbage (correctness)
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-clean").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    def clean() = GraphIndexStore.isClean(ArtifactStore.open(spark, idx))
    assert(clean(), "a fresh build is its own serve view — must certify clean")
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    def viaBatch() = {
      val rows = GraphIndexStore.queryBatch(spark, idx, q, Beam, Hops, TopK)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    def viaDriver() = {
      val rows = GraphIndexStore.query(spark, idx, q, Beam, Hops, TopK)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    // clean fast path (verbatim planes) == the driver fold's semantics
    assert(viaBatch() == viaDriver(),
      "the clean fast path must serve the driver fold's exact rows")
    // an append revokes the certificate (reverse in-edges inflate
    // neighbourhoods — the planes are no longer their own serve view)
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx, beam = 32, hops = 4)
    spark.catalog.clearCache()
    assert(!clean(), "an append must revoke the clean certificate")
    assert(viaBatch() == viaDriver(), "the dirty full fold must stay path-identical")
    // a tombstone alone revokes it too (marker file untouched by delete —
    // cleanliness requires BOTH marker and empty tombstone set)
    GraphIndexStore.compact(spark, idx)
    assert(clean(), "compact must re-certify (the rewrite IS the fold)")
    GraphIndexStore.delete(spark, idx, Seq(25L))
    assert(!clean(), "a tombstone must revoke cleanliness without touching the marker")
    val afterDelete = viaBatch()
    assert(afterDelete == viaDriver() && !afterDelete.exists(_._3 == 25L),
      "a post-compact tombstone must be honored despite the epoch's marker file")
    // compact folds the tombstone and re-certifies at the new epoch
    GraphIndexStore.compact(spark, idx)
    assert(clean(), "compact must re-certify the new epoch")
    assert(viaBatch() == afterDelete,
      "re-cleaned serving (verbatim planes at epoch 2) must equal the dirty fold's rows")
    // a full replay writes nothing — the store STAYS clean
    GraphIndexStore.append(e.filter(col("vec_id") < 10), idx, beam = 32, hops = 4)
    spark.catalog.clearCache()
    assert(clean(), "a no-op replayed append must keep the clean certificate")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clean-path serving must release its walk state too")
  }

  test("append pressure valve bounds stored neighbourhood footprints under hub-heavy streams") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-prs").toString
    val e = embeddings
    val SmallDegree = 4; val Factor = 2 // threshold: 8 stored rows per src
    GraphIndexStore.build(e.filter(col("vec_id") < 40), idx,
      degree = SmallDegree, assign = 2, nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    // hub-heavy stream: every appended vector duplicates id 20's values,
    // so each insert's reverse in-edges land on the same few nodes (id 20
    // and the earlier duplicates) — the linear-growth worst case
    val hub = e.filter(col("vec_id") === 20)
      .select(transform(col("embedding"), _.cast("double")).as("embedding"))
      .collect()(0).getSeq[Double](0)
    (0 until 12).foreach { i =>
      val batch = Seq((1000L + i, hub)).toDF("vec_id", "embedding")
      GraphIndexStore.append(batch, idx, beam = 8, hops = 2,
        compactFactor = Factor)
      spark.catalog.clearCache()
      val ctx = ArtifactStore.open(spark, idx)
      val maxPerSrc = spark.read.parquet(ctx.dir("edges"))
        .groupBy(col("src")).count().agg(max(col("count"))).first().getLong(0)
      assert(maxPerSrc <= (Factor * SmallDegree).toLong,
        s"after append $i the stored footprint must stay bounded " +
          s"(got $maxPerSrc rows for one src)")
    }
    // the valve actually fired (epoch advanced past the fresh-build 0) —
    // without it the hub would hold build+12 > 8 rows
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the pressure valve must have compacted at least once")
    // and the appended vectors still serve: reachability survived the
    // auto-compacts (exact-duplicate probes rank SOME duplicate of the
    // hub at cosine 1.0 — ties break by id, so rank-1 is the lowest
    // surviving exact-duplicate id, not necessarily the probed one)
    val probe = Seq((2000000L, hub)).toDF("query_id", "qv")
    val top = GraphIndexStore.query(spark, idx, probe, beam = 8, hops = 3,
        topK = 3)
      .filter(col("rank") === 1).collect()(0).getLong(2)
    spark.catalog.clearCache()
    assert(top == 20L || top >= 1000L,
      s"an exact-duplicate probe must surface the hub or a duplicate (got $top)")
  }

  test("appendStream self-heals a crashed valve compaction; one-shot mutators stay loud") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-heal").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gidx-hck").toString
    val e = embeddings
    GraphIndexStore.build(e.filter(col("vec_id") >= 10), idx,
      degree = Degree, assign = 2, nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    // simulate the valve's compact crashing mid-fold: live-epoch guard +
    // half-written staging garbage (the pressure valve makes this state
    // reachable with zero operator involvement, so the stream must not
    // wedge on it)
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(idx, "_COMPACTING"), ctx.epoch.toString)
    // a one-shot append stays loud — only the stream (the single
    // maintainer) may auto-complete someone's crashed fold
    intercept[IllegalStateException] {
      GraphIndexStore.append(e.filter(col("vec_id") === 0L), idx)
    }
    val arrivals = e.filter(col("vec_id") < 3)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val sq = GraphIndexStore.appendStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, ckpt, beam = 32, hops = 4)
    try {
      stream.addData(arrivals.toSeq)
      sq.processAllAvailable() // completes the crashed compact, then appends
    } finally sq.stop()
    spark.catalog.clearCache()
    assert(ArtifactStore.open(spark, idx).epoch > 0L,
      "the stream must have completed the crashed compaction (epoch flip)")
    assert(!ctx.fs.exists(new org.apache.hadoop.fs.Path(idx, "_COMPACTING")),
      "the guard must be gone after the healed fold")
    val probe = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    val rank1 = GraphIndexStore.query(spark, idx, probe, beam = 32, hops = 5, TopK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 3L).foreach { id =>
      assert(rank1.get(id + 1000000L).contains(id),
        s"the healed stream's insert $id must serve (got ${rank1.get(id + 1000000L)})")
    }
  }

  test("mutations fail loudly behind the compaction guard") {
    val idx = java.nio.file.Files.createTempDirectory("graft-gidx-grd").toString
    val e = embeddings
    GraphIndexStore.build(e, idx, degree = Degree, assign = 2,
      nEntries = 4, buckets = Buckets)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(idx, "_COMPACTING"), ctx.epoch.toString)
    intercept[IllegalStateException] {
      GraphIndexStore.append(e.filter(col("vec_id") < 3), idx)
    }
    intercept[IllegalStateException] {
      GraphIndexStore.delete(spark, idx, Seq(5L))
    }
    intercept[IllegalStateException] {
      GraphIndexStore.build(e, idx, degree = Degree)
    }
    // recovery path: compact() completes the interrupted fold
    GraphIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    val q = queriesOf(e, 3)
    assert(servedRows(idx, q).nonEmpty, "compact() must recover the store")
    spark.catalog.clearCache()
  }
}
