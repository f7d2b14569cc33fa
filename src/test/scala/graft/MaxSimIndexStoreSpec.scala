package graft

import graft.relational.QueryHelpers
import graft.sinks.{ArtifactStore, MaxSimIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent multi-vector (MaxSim) index: the stored sub-norms must be
  * bit-identical to an inline evaluation (the mirror contract behind
  * qs40's verbatim-qs19 oracle), serving at nProbe=K must reproduce the
  * in-query qs19 plan exactly, the serve scan must prune at the
  * partition level, the two recall contracts (nondecreasing in nProbe,
  * exactly 1.0 at nProbe=K) must hold, and replays / tombstones /
  * compaction must fold exactly like the peer stores. */
class MaxSimIndexStoreSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private val K = 16; private val Subs = 4; private val SubDim = 16
  private val TopK = 10

  private def embeddings: DataFrame = QueryHelpers.table(spark, dir, "embeddings")

  private def queriesOf(e: DataFrame, n: Int): DataFrame =
    e.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < n)

  private def servedRows(idx: String, queries: DataFrame,
      nProbe: Int = K): Seq[(Long, Int, Long)] = {
    val rows = MaxSimIndexStore.query(spark, idx, queries, nProbe, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    rows
  }

  test("build shape, stored-norm bit-identity, pruned serve scan, and exactness at nProbe=K") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()

    // artifact shape: one posting per vector, S hoisted sub-norms each
    val postings = spark.read.parquet(s"$idx/postings")
    assert(postings.count() == e.count())
    assert(postings.select(size(col("sn"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(Subs), "every posting holds S sub-norms")
    assert(spark.read.parquet(s"$idx/centroids").count() == K)

    // MIRROR CONTRACT: the stored norm is the SAME IEEE double an inline
    // qs19-style evaluation produces — sqrt(greatest(dot, 1e-30)) over
    // the slice; any drift breaks the verbatim-oracle rank order
    def vd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    val drift = postings.filter((0 until Subs).map { i =>
      val s = slice(col("v"), i * SubDim + 1, SubDim)
      element_at(col("sn"), i + 1) =!= sqrt(greatest(vd(s, s), lit(1e-30)))
    }.reduce(_ || _)).count()
    assert(drift == 0L, "stored sub-norms must be bit-identical to inline")

    // the serve scan prunes at the partition level — the scale property
    val ctx = ArtifactStore.open(spark, idx)
    val plan = MaxSimIndexStore.servedPostings(spark, ctx, Seq(0L, 3L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"posting scan must prune cell partitions:\n${plan.take(1500)}")

    // nProbe = K probes every cell = the brute-force scan: rows must be
    // BIT-IDENTICAL to qs19's in-query plan (the qs40 gate's argument)
    val served = servedRows(idx, queriesOf(e, 5))
    val inQuery = graft.relational.QueryCatalog
      .byName("qs19_multivector_maxsim").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(served == inQuery,
      s"store serve at nProbe=K must equal the in-query qs19 plan " +
        s"(${served.length} vs ${inQuery.length} rows)")
  }

  test("recall is nondecreasing in nProbe and exactly 1.0 at nProbe=K") {
    // the qs17 contract pair on the multi-vector axis: candidate sets
    // nest (the probed-cell prefix grows) and the scorer is exact on
    // candidates, so a truth member enters the served top-k the moment
    // its cell is probed — and probing all K cells IS brute force
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-rc").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()
    val q = queriesOf(e, 5)
    val truth = servedRows(idx, q, nProbe = K)
      .map(r => (r._1, r._3)).toSet
    val recalls = Seq(2, 4, 8, 16).map { nProbe =>
      val got = servedRows(idx, q, nProbe).map(r => (r._1, r._3)).toSet
      (got & truth).size.toDouble / truth.size
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be nondecreasing in nProbe: $recalls")
    assert(recalls.last == 1.0, "nProbe=K must be exact")
  }

  test("queryBatch (distributed) is bit-identical to the driver path on the same batch") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-bat").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()
    // every corpus vector queries — the offline-inference shape; the two
    // paths share pooled/maxsimExpr/Ranking, so rows must match exactly
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    val viaBatch = MaxSimIndexStore.queryBatch(spark, idx, q, K, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    val viaDriver = servedRows(idx, q)
    assert(viaBatch == viaDriver,
      s"distributed and driver serve paths diverge (${viaBatch.length} vs ${viaDriver.length} rows)")
    assert(viaBatch.map(_._1).distinct.length == e.count(),
      "every corpus vector must be served as a query")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the batch path must release its posted-query cache")
  }

  test("appended vectors serve through the stored geometry; replays change nothing") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-app").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()
    assert(ArtifactStore.isClean(ArtifactStore.open(spark, idx)),
      "a fresh build certifies clean")
    // append an exact copy of query 0's vector under a fresh id: MaxSim
    // of an identical vector is the 4.0 ceiling, so it must take rank 1
    val freshId = e.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
    val copy = e.filter(col("vec_id") === 0L)
      .select(lit(freshId).as("vec_id"), col("embedding"))
    MaxSimIndexStore.appendBatch(copy, idx)
    spark.catalog.clearCache()
    assert(!ArtifactStore.isClean(ArtifactStore.open(spark, idx)),
      "an append revokes the clean certificate")
    val q = queriesOf(e, 3)
    val after = servedRows(idx, q)
    assert(after.find(r => r._1 == 0L && r._2 == 1).map(_._3).contains(freshId),
      "the appended copy must take rank 1 for its twin query")
    MaxSimIndexStore.appendBatch(copy, idx) // at-least-once replay
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == after, "a replayed append changes nothing")
  }

  test("tombstones exclude immediately and terminally; compact folds and serves identically") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-del").toString
    val e = embeddings
    MaxSimIndexStore.build(e.filter(col("vec_id") >= 20), K, Subs, SubDim, idx,
      centroids = Some(e.filter(col("vec_id") < K)
        .select(transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map { r =>
          val v = r.getSeq[Double](0)
          (0 until SubDim).map(t =>
            (0 until Subs).map(i => v(i * SubDim + t)).sum / Subs).toArray
        }))
    MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 20), idx)
    MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 20), idx) // replay
    spark.catalog.clearCache()
    val q = queriesOf(e, 4)
    val before = servedRows(idx, q)
    val victim = before.head._3
    MaxSimIndexStore.delete(spark, idx, Seq(victim))
    val afterDel = servedRows(idx, q)
    assert(!afterDel.exists(_._3 == victim), "tombstoned id must vanish")
    MaxSimIndexStore.appendBatch(e.filter(col("vec_id") === victim), idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == afterDel,
      "re-appending a tombstoned id must not resurrect it")
    MaxSimIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedRows(idx, q) == afterDel, "compaction must not change serving")
    val ctx = ArtifactStore.open(spark, idx)
    assert(ctx.epoch > 0L)
    assert(ArtifactStore.isClean(ctx), "compact re-certifies clean")
    assert(!ctx.exists("tombstones"), "compaction retires tombstones")
    val posts = spark.read.parquet(ctx.dir("postings"))
    assert(posts.filter(col("vec_id") === victim).take(1).isEmpty,
      "compaction drops tombstoned postings")
    assert(posts.groupBy(col("cell"), col("vec_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0) == 1L,
      "compaction dedups replayed postings")
  }

  test("rangeQueryBatch is bit-identical to the driver range path; tombstones exclude; stateless finish") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-range").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    def serve(f: => org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
      val rows = f.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.catalog.clearCache()
      rows
    }
    val Radius = 1.5
    val viaDriver = serve(
      MaxSimIndexStore.rangeQuery(spark, idx, q.filter(col("query_id") < 5), K, Radius))
    assert(viaDriver.nonEmpty, "the measured radius must yield answers at this SF")
    val viaBatch = serve(
      MaxSimIndexStore.rangeQueryBatch(spark, idx, q.filter(col("query_id") < 5), K, Radius))
    assert(viaBatch == viaDriver,
      s"distributed and driver range paths diverge (${viaBatch.length} vs ${viaDriver.length} rows)")
    // a tombstoned id never answers; the surviving rows are exactly the
    // control minus the victim's rows (stateless finish — no rank shifts)
    val victim = viaDriver.head._2
    MaxSimIndexStore.delete(spark, idx, Seq(victim))
    val after = serve(
      MaxSimIndexStore.rangeQuery(spark, idx, q.filter(col("query_id") < 5), K, Radius))
    assert(!after.exists(_._2 == victim), "tombstoned id must never answer")
    assert(after == viaDriver.filterNot(_._2 == victim),
      "surviving rows must be exactly the control minus the victim")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "range serving must release its posted cache")
  }

  test("metadata-scoped store: filtered serving is label-exact; meta survives append and compact") {
    // qs41's mechanics: label exactness, two-axis partition pruning,
    // driver/batch path identity, loud rejection on an unscoped store /
    // meta-less append, and the meta column surviving append + compact
    // (the peer stores' advice-class bug)
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-meta").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx, metaCol = Some("label"))
    spark.catalog.clearCache()
    val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    def servedFiltered(): Seq[(Long, Int, Long)] = {
      val rows = MaxSimIndexStore.queryFiltered(spark, idx, queries, K, TopK)
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
    // two-axis partition pruning on the scoped plane
    val ctx = ArtifactStore.open(spark, idx)
    val plan = MaxSimIndexStore.servedPostings(spark, ctx, Seq(0L, 3L),
        Some(Seq("1", "2"))).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*meta".r.findFirstIn(plan).isDefined
      || "PartitionFilters: \\[[^\\]]*meta[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"scoped serve must prune BOTH partition axes:\n${plan.take(1500)}")
    // the distributed filtered path returns the identical row set
    val viaBatch = MaxSimIndexStore.queryFilteredBatch(spark, idx, queries, K, TopK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(viaBatch == got.toSet,
      "queryFilteredBatch must match the driver filtered path row-for-row")
    // an unscoped store rejects filtered queries loudly (both paths)
    val plain = java.nio.file.Files.createTempDirectory("graft-ms-plain").toString
    MaxSimIndexStore.build(e, K, Subs, SubDim, plain)
    spark.catalog.clearCache()
    Seq(
      () => MaxSimIndexStore.queryFiltered(spark, plain, queries, K, TopK),
      () => MaxSimIndexStore.queryFilteredBatch(spark, plain, queries, K, TopK)
    ).foreach { f =>
      val ex = intercept[IllegalArgumentException] { f() }
      assert(ex.getMessage.contains("metadata-scoped"), ex.getMessage)
    }
    // append must carry the meta column — loudly without it, exactly with
    val exApp = intercept[IllegalArgumentException] {
      MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 2)
        .select(col("vec_id") + 1000L as "vec_id", col("embedding")), idx)
    }
    assert(exApp.getMessage.contains("metadata-scoped"), exApp.getMessage)
    MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 2)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"), col("label")), idx)
    spark.catalog.clearCache()
    // an appended exact copy must take rank 1 for its same-label twin
    // query (MaxSim ceiling 4.0; lower-id original ties behind? no — the
    // original IS the query id and self-filters, so the copy wins)
    val probe = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
    val rank1 = MaxSimIndexStore.queryFiltered(spark, idx, probe, K, TopK)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    spark.catalog.clearCache()
    (0L until 2L).foreach { id =>
      assert(rank1.get(id).contains(id + 1000L),
        s"appended same-label copy must be query $id's rank-1 (got ${rank1.get(id)})")
    }
    // compact carries the meta partition axis through the epoch flip
    val before = servedFiltered()
    MaxSimIndexStore.compact(spark, idx)
    spark.catalog.clearCache()
    assert(servedFiltered() == before,
      "filtered serving must be identical across a compact (meta carried)")
    assert(spark.read.parquet(ArtifactStore.open(spark, idx).dir("postings"))
      .columns.contains("meta"), "compact must keep the meta partition column")
  }

  test("mutations fail loudly behind the compaction guard; batch cap routes loudly") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ms-grd").toString
    val e = embeddings
    MaxSimIndexStore.build(e, K, Subs, SubDim, idx)
    spark.catalog.clearCache()
    val ctx = ArtifactStore.open(spark, idx)
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(idx, "_COMPACTING"), ctx.epoch.toString)
    intercept[IllegalStateException] {
      MaxSimIndexStore.appendBatch(e.filter(col("vec_id") < 3), idx)
    }
    intercept[IllegalStateException] { MaxSimIndexStore.delete(spark, idx, Seq(5L)) }
    MaxSimIndexStore.compact(spark, idx) // recovery completes the fold
    spark.catalog.clearCache()
    assert(servedRows(idx, queriesOf(e, 3)).nonEmpty, "compact() must recover")
    val big = spark.range(65537).select(col("id").as("query_id"),
      array((0 until Subs * SubDim).map(_ => lit(1.0)): _*).as("qv"))
    val ex = intercept[IllegalArgumentException] {
      MaxSimIndexStore.query(spark, idx, big, K, TopK)
    }
    assert(ex.getMessage.contains("queryBatch"), ex.getMessage)
    spark.catalog.clearCache()
  }
}
