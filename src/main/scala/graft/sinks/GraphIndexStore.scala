package graft.sinks

import graft.pipeline.{KMeans, KnnGraph}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent GRAPH ANN index — the fourth build-once/serve-many artifact
  * next to [[IvfIndexStore]] (dense cells), [[BandIndexStore]] (LSH bands)
  * and [[TextIndexStore]] (sparse terms): the bounded-degree kNN graph
  * behind qs27 ([[graft.pipeline.KnnGraph]]), persisted so beam-search
  * serving never rebuilds the graph — the index paradigm whose QUERY cost
  * is independent of corpus size (per hop: frontier × degree edge rows,
  * whatever n is).
  *
  * Layout under `path` (epoched components via [[ArtifactStore]] — all
  * metadata I/O through the Hadoop `FileSystem` API):
  * {{{
  *   manifest.json                     {"degree":D,"dim":d,"buckets":B,"entries":E}
  *   edges/ebucket=K/<parts>.parquet   (src, dst, cosine) — ebucket = src % B
  *   vectors/vbucket=K/<parts>.parquet (vec_id, v, vnorm) — vbucket = vec_id % B
  *   entries/<part>.parquet            (vec_id) — the pinned entry points
  *   tombstones/                       parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING              ArtifactStore commit/guard markers
  * }}}
  *
  * Serving reads ONLY pruned slices: each hop's frontier is a bounded id
  * set (≤ queries × beam — the serve entry point enforces a query-batch
  * bound, [[MaxQueryBatch]]), so the edge scan opens only the frontier
  * ids' `ebucket` partitions and the vector scan only the candidate ids'
  * `vbucket` partitions — per-hop I/O scales with the walk, never the
  * corpus (PartitionFilters spec-pinned like the other three stores).
  *
  * APPEND is navigable-small-world insertion: each new vector beam-searches
  * the EXISTING graph for its `degree` nearest reachable nodes, appends
  * those as its out-edges AND the reverse rows as in-edges (reachability —
  * out-edges alone would leave new nodes unreachable), plus its vector
  * row. Reverse edges can push a node past `degree`; the serve-time fold
  * re-truncates every touched neighbourhood to the best `degree` by
  * (cosine DESC, dst ASC) — a deterministic improvement fold (a reverse
  * edge evicts an edge only by strictly better cosine or tie-lower id).
  * Replays are exact no-ops by construction: vectors write LAST, so a
  * present vector row is the per-id marker that an insert fully landed,
  * and [[append]] skips marked ids outright (a re-run walk over the
  * since-grown graph could otherwise pick different neighbours); the
  * serve-time fold additionally absorbs the orphan edge rows of an
  * insert that crashed between its edge and vector writes.
  * Append links new nodes to the existing corpus, not to one another —
  * the classic sequential-insert semantic; batch-internal near-pairs
  * become mutually reachable through their shared neighbours.
  *
  * DELETE is an O(|ids|) tombstone ([[IvfIndexStore]] semantics): serving
  * anti-joins the tombstone set AFTER partition pruning, and a tombstoned
  * node is excluded from candidates entirely — the walk routes as if the
  * node never existed (its out-edges stop expanding; recall around dense
  * deleted regions degrades gracefully until [[compact]] rewrites the
  * graph without them). Re-appending a tombstoned id does not resurrect
  * it (tombstone outranks posting). Deleting an entry point disables that
  * entry; if EVERY entry is tombstoned, serving fails loudly and
  * [[compact]] re-derives entries from the surviving corpus.
  *
  * Reference behaviour mirrored: none — deisa-ray has no ANN surface;
  * this is part of the training-data-pipeline extension (SURVEY §2's
  * pipeline families), completing the persistent-store matrix on the
  * graph paradigm.
  */
object GraphIndexStore {

  private val DefaultBuckets = 64

  /** Components rewritten by [[compact]] (epoched). */
  private val Components = Seq("edges", "vectors", "entries")

  /** Serve/append paths collect per-hop frontier and candidate id sets to
    * drive partition pruning (bounded by queries × beam and
    * queries × beam × degree); the query batch itself is the only
    * unbounded input, so it is capped loudly — a corpus-scale batch
    * belongs on the IVF store's distributed `queryBatch` path or a
    * rebuilt index, not a graph walk per row. */
  private val MaxQueryBatch = 4096

  /** One norm definition for build, append and query sides — the same
    * sqrt-of-[[graft.functions.expressions.VecDot]] left fold as
    * [[IvfIndexStore]], so stored and inline evaluations (and therefore
    * every rank) are bit-identical. */
  private def normExpr(v: Column): Column =
    sqrt(graft.functions.expressions.VectorExpressions.vecDot(v, v))

  private def cosineExpr: Column =
    (graft.functions.expressions.VectorExpressions.vecDot(col("qv"), col("v")) /
      (col("qnorm") * col("vnorm"))).as("cosine")

  private def manifest(ctx: ArtifactStore.Ctx): (Int, Int, Int, Int) = {
    val s = ArtifactStore.readString(ctx.fs,
      new org.apache.hadoop.fs.Path(ctx.root, "manifest.json"))
    def field(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    (field("degree"), field("dim"), field("buckets"), field("entries"))
  }

  private def bucketOf(id: Long, buckets: Int): Long =
    java.lang.Math.floorMod(id, buckets.toLong)

  /** Bounded top-`k` per `key` by (cosine DESC, id ASC) — the
    * [[graft.functions.TopKAggregator]] everywhere a neighbourhood or
    * frontier truncates, identical to [[KnnGraph]]'s convention so a
    * fresh store serves bit-identically to the in-memory engine. */
  private def topPerKey(scored: DataFrame, key: String, k: Int,
      idCol: String): DataFrame = {
    val topk = graft.functions.TopKAggregator.topK(k)
    scored.groupBy(col(key))
      .agg(topk(col("cosine"), col(idCol)).as("top"))
      .select(col(key), explode(col("top")).as("hit"))
      .select(col(key), col("hit.vec_id").as(idCol), col("hit.cosine").as("cosine"))
  }

  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
      what: String): Array[T] = {
    val rows = ds.take(MaxQueryBatch + 1)
    require(rows.length <= MaxQueryBatch,
      s"$what exceeds $MaxQueryBatch rows — graph serving collects per-hop " +
        "frontier id sets sized by the batch; route corpus-scale batches " +
        "through IvfIndexStore.queryBatch or a dedicated rebuild instead")
    rows
  }

  /** Build the index over `e` (vec_id: bigint, embedding: array<float|double>):
    * run [[KnnGraph.build]] (cell-blocked candidates, one NN-descent
    * round, ≤ `degree` out-edges per node), persist bucket-partitioned
    * edges + vectors + the `nEntries` lowest-id entry points. Blocking
    * cells scale with the corpus (~400 rows/cell — qs27's linear-build
    * geometry). Callers `clearCache()` after build (the graph builder
    * persists its intermediates). */
  def build(e: DataFrame, path: String, degree: Int, assign: Int = 2,
      nEntries: Int = 4, buckets: Int = DefaultBuckets): Unit = {
    require(degree > 0 && assign > 0 && nEntries > 0 && buckets > 0)
    val spark = e.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")).persist()
    val k = math.max(16L, v.count() / 400L)
    val cents = v.filter(col("vec_id") < k)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(cents.nonEmpty, "empty corpus")
    val dim = cents(0)._2.length
    KnnGraph.build(v, cents, assign, degree)
      .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
      .write.partitionBy("ebucket").mode("overwrite")
      .parquet(ctx.dir("edges"))
    v.withColumn("vnorm", normExpr(col("v")))
      .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
      .write.partitionBy("vbucket").mode("overwrite")
      .parquet(ctx.dir("vectors"))
    v.select(col("vec_id")).orderBy(col("vec_id")).limit(nEntries)
      .coalesce(1).write.mode("overwrite").parquet(ctx.dir("entries"))
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(path, "manifest.json"),
      s"""{"degree":$degree,"dim":$dim,"buckets":$buckets,"entries":$nEntries}""")
    v.unpersist()
    // rebuild replaces the corpus: stale tombstones die with it (LAST, so
    // a crashed build leaves the delete plane intact — over-suppression,
    // never resurrection)
    ArtifactStore.resetMutationPlane(ctx)
  }

  /** The folded, tombstone-free edge slice for a frontier id set: pruned
    * partition read → exact-replay dedup (`distinct`) → tombstoned
    * destinations dropped → per-src re-truncation to `degree` (absorbs
    * append's reverse in-edges). The anti-join runs AFTER partition
    * pruning (only the probed slice pays) but BEFORE the truncation —
    * the SAME fold order [[compact]] rewrites with, so a neighbourhood
    * whose tombstoned member frees a slot promotes the identical
    * replacement edge on both sides and serving is unchanged across a
    * compact (spec-pinned). */
  private[graft] def servedEdges(spark: SparkSession, ctx: ArtifactStore.Ctx,
      frontierIds: Seq[Long], degree: Int, buckets: Int,
      tomb: Option[DataFrame]): DataFrame = {
    val ebuckets = frontierIds.map(bucketOf(_, buckets)).distinct.sorted
    val slice = spark.read
      // schema declared (partition column included, typed BIGINT): no
      // footer reads outside the probed slice — the TextIndexStore rule
      .schema("src BIGINT, dst BIGINT, cosine DOUBLE, ebucket BIGINT")
      .parquet(ctx.dir("edges"))
      .filter(col("ebucket").isInCollection(ebuckets)) // partition pruning
      .filter(col("src").isInCollection(frontierIds))
      .select(col("src"), col("dst"), col("cosine"))
      .distinct()
    val alive = tomb match {
      case Some(t) => slice.join(
        broadcast(t.withColumnRenamed("doc_id", "dst")), Seq("dst"), "left_anti")
      case None => slice
    }
    topPerKey(alive, "src", degree, "dst")
  }

  /** The deduped, tombstone-free (vec_id, v, vnorm) slice for a bounded
    * id set — pruned to the ids' `vbucket` partitions. */
  private[graft] def servedVectors(spark: SparkSession, ctx: ArtifactStore.Ctx,
      ids: Seq[Long], buckets: Int, tomb: Option[DataFrame]): DataFrame = {
    val vbuckets = ids.map(bucketOf(_, buckets)).distinct.sorted
    val slice = spark.read
      .schema("vec_id BIGINT, v ARRAY<DOUBLE>, vnorm DOUBLE, vbucket BIGINT")
      .parquet(ctx.dir("vectors"))
      .filter(col("vbucket").isInCollection(vbuckets)) // partition pruning
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("v"), col("vnorm"))
      .dropDuplicates("vec_id") // replayed append rows are byte-identical
    tomb match {
      case Some(t) => slice.join(
        broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
      case None => slice
    }
  }

  /** The live (non-tombstoned) entry-point ids. */
  private def liveEntries(spark: SparkSession, ctx: ArtifactStore.Ctx,
      tomb: Option[DataFrame]): Seq[Long] = {
    val base = spark.read.schema("vec_id BIGINT").parquet(ctx.dir("entries"))
    val kept = tomb match {
      case Some(t) => base.join(
        broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
      case None => base
    }
    kept.collect().map(_.getLong(0)).sorted.toSeq
  }

  /** Beam-search the stored graph and return every visited
    * (query_id, vec_id, cosine) — the engine behind [[query]] and
    * [[append]]. Identical hop mechanics, scoring expressions and
    * truncation order to [[KnnGraph.search]], so a freshly built store
    * serves bit-identically to the in-memory engine (spec-pinned). */
  private def searchVisited(spark: SparkSession, ctx: ArtifactStore.Ctx,
      queries: DataFrame, beam: Int, hops: Int,
      scope: graft.core.WalkScope): DataFrame = {
    import spark.implicits._
    val (degree, _, buckets, _) = manifest(ctx)
    val tomb = ArtifactStore.readTombstones(spark, ctx)
    val qs = collectBounded(queries.select(col("query_id"), col("qv"))
      .as[(Long, Seq[Double])], "query batch")
    val q = broadcast(qs.toSeq.toDF("query_id", "qv")
      .withColumn("qnorm", normExpr(col("qv"))))
    val entryIds = liveEntries(spark, ctx, tomb)
    require(entryIds.nonEmpty,
      s"every entry point of ${ctx.root} is tombstoned — run compact() " +
        "to re-derive entries from the surviving corpus")
    var visited = scope.checkpoint(servedVectors(spark, ctx, entryIds, buckets, tomb)
      .crossJoin(q)
      .select(col("query_id"), col("vec_id"), cosineExpr)
      ) // lineage TRUNCATION per hop (the
    // KnnGraph.search discipline): a persisted relation still embeds —
    // and prints — its full child plan, so an iterative walk's composite
    // tree grows exponentially in hops without the cut; checkpointed
    // frontier state is bounded by queries × beam × degree rows per hop.
    // All walk state (checkpoints + frontier persists) registers with the
    // caller's WalkScope: serve/append entry points release it once their
    // result is materialized, so serving leaves zero persistent blocks
    // behind (RDD-level checkpoint persistence is invisible to
    // clearCache — see WalkScope)
    var frontierIds = entryIds
    var frontier = visited.select(col("query_id"), col("vec_id"))
    for (_ <- 1 to hops) {
      val edges = servedEdges(spark, ctx, frontierIds, degree, buckets, tomb)
      val cand = scope.persist(frontier
        .join(edges.select(col("src"), col("dst")),
          frontier("vec_id") === col("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
        .distinct()
        .join(visited.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti"))
      // bounded: ≤ |frontier ids| × degree — drives the vector pruning
      val candIds = cand.select(col("vec_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      if (candIds.isEmpty) {
        return visited
      }
      val scored = scope.checkpoint(cand
        .join(servedVectors(spark, ctx, candIds, buckets, tomb), Seq("vec_id"))
        .join(q, Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineExpr))
      // lazy union of the checkpointed per-hop relations — the
      // KnnGraph.search discipline (the walk's cost on small frontiers
      // is job and plan-analysis overhead, not data)
      visited = visited.union(scored)
      val next = scope.persist(topPerKey(scored, "query_id", beam, "vec_id")
        .select(col("query_id"), col("vec_id")))
      frontierIds = next.select(col("vec_id")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      frontier = next
    }
    visited
  }

  /** Serve a query batch from the stored graph: beam search, then the
    * bounded top-`topK` rank finish — (query_id, rank, vec_id) in the
    * shared (cosine DESC, vec_id ASC) order, self-matches excluded
    * ([[IvfIndexStore.query]]'s output conventions). The ranked result
    * (≤ batch × topK rows — bounded like the batch itself) materializes
    * to the driver so every walk block releases deterministically before
    * returning: serving leaves zero persistent RDDs behind, whatever the
    * caller does with the result. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      val scope = new graft.core.WalkScope
      try {
        val visited = searchVisited(spark, ctx, queries, beam, hops, scope)
        val topk = graft.functions.TopKAggregator.topK(topK)
        val rows = visited.filter(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"))
          .agg(topk(col("cosine"), col("vec_id")).as("top"))
          .select(col("query_id"), posexplode(col("top")))
          .select(col("query_id"), (col("pos") + 1).as("rank"),
            col("col.vec_id").as("vec_id"))
          .orderBy(col("query_id"), col("rank"))
          .as[(Long, Int, Long)].collect()
        rows.toSeq.toDF("query_id", "rank", "vec_id")
      } finally scope.release()
    }

  /** Navigable-small-world insertion of one batch (vec_id, embedding):
    * each new vector beam-searches the existing graph for its `degree`
    * best reachable neighbours (tombstoned nodes excluded — an insert
    * never links to deleted content), then appends its out-edges, the
    * reverse in-edges, and its vector row. At-least-once replays are
    * exact no-ops (the vector row is the per-id landed marker — see the
    * class doc), which also makes re-appending a tombstoned id inert: its
    * marker survives deletion, so the id stays dead until a compact
    * (where marker and tombstone fold away together). Appending while a
    * compaction folds fails loudly behind the [[ArtifactStore]] guard. */
  def append(batch: DataFrame, path: String, beam: Int = 32,
      hops: Int = 3): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val (degree, _, buckets, _) = manifest(ctx)
    // idempotence marker: vectors write LAST, so a present vector row
    // proves that id's insert fully landed (edges included) — a replayed
    // id is skipped outright, which keeps replays byte-exact no-ops even
    // though a re-run walk over the since-grown graph could legitimately
    // pick different (better) neighbours. A crash between the edge and
    // vector writes leaves no marker: the retry re-inserts, and the
    // serve-time fold absorbs the crashed attempt's orphan edge rows.
    val batchIds = collectBounded(
      batch.select(col("vec_id")).as[Long], "append batch")
    val present = servedVectors(spark, ctx, batchIds.toSeq, buckets, None)
      .select(col("vec_id")).as[Long].collect().toSet
    val freshIds = batchIds.filterNot(present)
    if (freshIds.isEmpty) return
    val scope = new graft.core.WalkScope
    try {
      val newVecs = scope.persist(batch
        .filter(col("vec_id").isInCollection(freshIds))
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("vnorm", normExpr(col("v"))))
      val visited = searchVisited(spark, ctx,
        newVecs.select(col("vec_id").as("query_id"), col("v").as("qv")),
        beam, hops, scope)
      // the new node's neighbourhood: its `degree` best visited nodes
      // (self excluded — a replayed insert of an indexed id must not
      // self-link)
      val out = scope.persist(topPerKey(
        visited.filter(col("vec_id") =!= col("query_id")),
        "query_id", degree, "vec_id")
        .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cosine")))
      out.count() // materialize before writing out + reverse from one plan
      val reverse = out.select(col("dst").as("src"), col("src").as("dst"),
        col("cosine")) // cosine is symmetric
      out.union(reverse)
        .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
        .write.partitionBy("ebucket").mode("append")
        .parquet(ctx.dir("edges"))
      newVecs.select(col("vec_id"), col("v"), col("vnorm"))
        .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
        .write.partitionBy("vbucket").mode("append")
        .parquet(ctx.dir("vectors"))
    } finally scope.release()
  }

  /** Streaming maintenance — the graph member of the live-index quartet
    * (Ivf/Band/Text appendStream): each micro-batch NSW-inserts its
    * (vec_id, embedding) rows. At-least-once foreachBatch delivery folds
    * to exactly-once indexing WITHOUT batch-id bookkeeping: [[append]]'s
    * vector-row landed marker makes any replayed id an exact no-op (see
    * the class doc), so a restarted query that re-delivers a micro-batch
    * changes nothing. */
  def appendStream(stream: DataFrame, path: String, checkpoint: String,
      beam: Int = 32, hops: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => append(b, path, beam, hops))
      .start()

  /** Delete by tombstone — O(|ids|), the shared takedown plane. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones and replayed/reverse append rows into the stored
    * graph: rewrite vectors without tombstoned/duplicate ids, rewrite
    * every neighbourhood through the SAME fold serving applies
    * (distinct → tombstoned endpoints dropped → per-src re-truncation to
    * `degree` — order matters: a freed slot promotes the identical
    * replacement edge on both sides), and rewrite entries minus
    * tombstones — re-deriving them
    * from the surviving corpus only when every pinned entry was deleted
    * (serving is otherwise identical before and after, spec-pinned).
    * Stages at epoch+1, commits via the single atomic marker create. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    val (degree, _, buckets, nEntries) = manifest(ctx)
    ArtifactStore.beginCompact(ctx, Components)
    val tomb = ArtifactStore.readTombstones(spark, ctx)
    def dropIds(df: DataFrame, idCol: String): DataFrame = tomb match {
      case Some(t) => df.join(
        broadcast(t.withColumnRenamed("doc_id", idCol)), Seq(idCol), "left_anti")
      case None => df
    }
    val keptVecs = dropIds(
      spark.read.parquet(ctx.dir("vectors"))
        .select(col("vec_id"), col("v"), col("vnorm"))
        .dropDuplicates("vec_id"), "vec_id").persist()
    keptVecs
      .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
      .write.partitionBy("vbucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "vectors"))
    val deduped = spark.read.parquet(ctx.dir("edges"))
      .select(col("src"), col("dst"), col("cosine")).distinct()
    topPerKey(dropIds(dropIds(deduped, "src"), "dst"), "src", degree, "dst")
      .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
      .write.partitionBy("ebucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "edges"))
    val keptEntries = dropIds(
      spark.read.schema("vec_id BIGINT").parquet(ctx.dir("entries")), "vec_id")
    val entryRows =
      if (keptEntries.isEmpty)
        keptVecs.select(col("vec_id")).orderBy(col("vec_id")).limit(nEntries)
      else keptEntries
    entryRows.coalesce(1).write.mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "entries"))
    keptVecs.unpersist()
    ArtifactStore.commitCompact(ctx, Components)
  }
}
