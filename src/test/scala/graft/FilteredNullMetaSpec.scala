package graft

import graft.relational.QueryHelpers
import graft.sinks.{GraphIndexStore, IvfIndexStore, IvfPqIndexStore, MaxSimIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13/r14 advice CLASS pinned structurally, across every
  * meta-scoped paradigm at once: filtered serving must treat NULL query
  * metas and over-cap meta domains identically on all three stores that
  * carry a (cell, meta) plane (IVF / IVF-PQ / MaxSim), so the class of
  * bug fixed in IvfPqIndexStore (r13), born-fixed in MaxSimIndexStore
  * (r14), and fixed in IvfIndexStore (r15, after it was found by the
  * r14 review) can never diverge per-store again.
  *
  * Two contracts, each driven through BOTH the driver-side and the
  * distributed filtered path of every store:
  *
  *  1. NULL-META → SERVE-EMPTY, NEVER CRASH, NEVER PERTURB. A query row
  *     whose meta is null matches no (cell, meta) partition value (SQL
  *     null-key join semantics) and contributes zero answer rows; the
  *     remaining queries' rows are bit-identical to the same batch
  *     without the null row. Pre-fix, IvfIndexStore NPE'd in
  *     Ordering.String on both paths — this suite would have caught it.
  *
  *  2. OVER-CAP META DOMAIN → FALLBACK, NEVER AN INCOMPLETE PRUNE. When
  *     the batch's distinct metas exceed [[graft.sinks.ArtifactStore
  *     .maxMetaFilter]] (conf-shrunk here so 10 labels exceed it), the
  *     meta partition axis must drop out of the scan's PartitionFilters
  *     entirely — never a truncated value list that silently prunes
  *     unsampled labels' postings away — while the (cell, meta) join
  *     key still carries the predicate, so the served rows stay
  *     bit-identical to the under-cap run. */
class FilteredNullMetaSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** One adapter per meta-scoped paradigm — the suite's whole point is
    * that the SAME assertions run against all three. */
  private case class ScopedStore(
      name: String,
      build: (DataFrame, String) => Unit,
      driver: (String, DataFrame) => DataFrame,
      batch: (String, DataFrame) => DataFrame)

  // serving constants: nProbe pinned to the stores' exact operating
  // points where exactness matters (MaxSim nProbe=K), the gate pins
  // elsewhere; topK small — the contracts here are set-identity, not
  // recall
  private val stores = Seq(
    ScopedStore("ivf",
      (e, idx) => IvfIndexStore.build(e, k = 16, idx, metaCol = Some("label")),
      (idx, q) => IvfIndexStore.queryFiltered(spark, idx, q, nProbe = 4, topK = 3),
      (idx, q) => IvfIndexStore.queryFilteredBatch(spark, idx, q, nProbe = 4, topK = 3)),
    ScopedStore("ivfpq",
      (e, idx) => IvfPqIndexStore.build(e, 16, 8, 256, idx, metaCol = Some("label")),
      (idx, q) => IvfPqIndexStore.queryFiltered(spark, idx, q, 10, 3, 72),
      (idx, q) => IvfPqIndexStore.queryFilteredBatch(spark, idx, q, 10, 3, 72)),
    ScopedStore("maxsim",
      (e, idx) => MaxSimIndexStore.build(e, 16, 4, 16, idx, metaCol = Some("label")),
      (idx, q) => MaxSimIndexStore.queryFiltered(spark, idx, q, nProbe = 16, topK = 3),
      (idx, q) => MaxSimIndexStore.queryFilteredBatch(spark, idx, q, nProbe = 16, topK = 3)))

  // the graph paradigm's scoped serving is structural (label-disjoint
  // subgraphs, per-label seeding) rather than meta-domain-pruned, so the
  // over-cap contract does not apply — but the null-meta contract does:
  // a null label finds no entry set (driver fold) / joins no seed row
  // (distributed walk) and must serve empty, never crash
  private val graphStore = ScopedStore("graph",
    (e, idx) => GraphIndexStore.build(e, idx,
      degree = 12, assign = 2, nEntries = 4, metaCol = Some("label")),
    (idx, q) => GraphIndexStore.queryFiltered(spark, idx, q, beam = 16, hops = 3, topK = 3),
    (idx, q) => GraphIndexStore.queryFilteredBatch(spark, idx, q, beam = 16, hops = 3, topK = 3))

  /** Build each store once; both tests serve from the same artifacts. */
  private lazy val builtAt: Map[String, String] = {
    val e = QueryHelpers.table(spark, dir, "embeddings")
    (stores :+ graphStore).map { s =>
      val idx = java.nio.file.Files.createTempDirectory(s"graft-nullmeta-${s.name}").toString
      s.build(e, idx)
      spark.catalog.clearCache()
      s.name -> idx
    }.toMap
  }

  private def queriesUpTo(n: Int): DataFrame =
    QueryHelpers.table(spark, dir, "embeddings")
      .filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))

  private def rows(df: DataFrame): Seq[(Long, Int, Long)] = {
    val out = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    out
  }

  test("null-meta query rows serve empty — never crash, never perturb peers (all four scoped paradigms)") {
    val withNull = queriesUpTo(6)
      .withColumn("meta",
        when(col("query_id") === 0, lit(null).cast("string")).otherwise(col("meta")))
    val control = queriesUpTo(6).filter(col("query_id") =!= 0)
    (stores :+ graphStore).foreach { s =>
      val idx = builtAt(s.name)
      Seq("driver" -> s.driver, "batch" -> s.batch).foreach { case (path, serve) =>
        val got = rows(serve(idx, withNull)) // pre-fix: NPE on IVF, both paths
        assert(!got.exists(_._1 == 0L),
          s"${s.name}/$path: a null-meta query must serve EMPTY, got rows for it")
        val want = rows(serve(idx, control))
        assert(got == want,
          s"${s.name}/$path: the null row must not perturb the other queries " +
            s"(${got.length} vs ${want.length} rows)")
      }
    }
  }

  test("over-cap meta domains fall back to cell-only pruning without losing labels (all three scoped paradigms)") {
    // 40 queries span all 10 labels at this SF; cap shrunk to 4 so the
    // domain genuinely exceeds it without materializing 1025 partitions
    val q = queriesUpTo(40)
    val metaPf = "PartitionFilters: \\[[^\\]]*meta".r
    stores.foreach { s =>
      val idx = builtAt(s.name)
      val underCap = s.batch(idx, q)
      assert(metaPf.findFirstIn(underCap.queryExecution.executedPlan.toString).isDefined,
        s"${s.name}: an enumerable meta domain must prune the meta partition axis")
      val want = rows(underCap)
      spark.conf.set("graft.store.maxMetaFilter", "4")
      try {
        val overCap = s.batch(idx, q)
        assert(metaPf.findFirstIn(overCap.queryExecution.executedPlan.toString).isEmpty,
          s"${s.name}: past the cap the meta axis must drop out of PartitionFilters " +
            "ENTIRELY — a truncated value list would silently prune unsampled labels")
        val got = rows(overCap)
        assert(got == want,
          s"${s.name}: the fallback must serve bit-identical rows " +
            s"(${got.length} vs ${want.length})")
      } finally spark.conf.unset("graft.store.maxMetaFilter")
    }
  }
}
