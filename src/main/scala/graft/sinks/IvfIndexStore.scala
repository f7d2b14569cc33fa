package graft.sinks

import graft.pipeline.KMeans
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF index artifact — build the inverted-list structure once,
  * serve many query batches from it without ever re-scanning or
  * re-assigning the corpus (the production split the in-query IVF paths
  * qs02/qs03 fuse into one plan).
  *
  * Layout under `path` (epoched components via [[ArtifactStore]] — all
  * I/O through the Hadoop `FileSystem` API, so the store runs unchanged
  * on `file://`, HDFS, or an object-store connector):
  * {{{
  *   manifest.json                  {"k":K,"dim":D}
  *   centroids/                     parquet (cid, cv array<double>) — immutable
  *   postings/cell=C/<parts>.parquet  (vec_id, v array<double>, vnorm) per cell
  *   tombstones/                    parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING           ArtifactStore commit/guard markers
  *   _clean-N                       clean-store marker ([[ArtifactStore.isClean]])
  * }}}
  *
  * The scale property is PARTITION PRUNING at serve time: postings are
  * `partitionBy(cell)`, and [[query]] filters on the probe-cell set
  * computed from the (tiny) query batch, so the parquet reader opens only
  * the ≤ queries × nprobe cell directories — nprobe/K of the index,
  * enforced by the scan's PartitionFilters (spec-pinned), not by trust.
  * Centroids default to the deterministic lowest-k vec_ids (the
  * qs02/qd05 oracle-mirrorable convention); a [[KMeans.fit]] result slots
  * in unchanged via `centroids`.
  *
  * Norms are NEVER recomputed per candidate: each posting stores its own
  * `vnorm` (written by the same sqrt-of-[[graft.functions.expressions.VecDot]]
  * expression serving would use — itself pinned bit-identical to the
  * `sqrt(aggregate(zip_with(v,v,*),0,+))` left fold — so the stored
  * double is bit-identical to an inline evaluation and every rank-order
  * mirror contract holds),
  * and the query-side norm is projected ONCE onto the tiny broadcast
  * probe table instead of per posting row — together they halve the
  * FLOPs of the hot serve kernel.
  */
object IvfIndexStore {

  /** Operational health snapshot ([[ArtifactStore.health]]): epoch,
    * clean/compacting flags, pending tombstones, and per-component
    * file/byte/leaf-partition footprints of the live epoch — the
    * when-to-compact observability table for deploys on their own
    * maintenance cadence (immutable unepoched components are excluded;
    * they never grow). */
  def health(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    ArtifactStore.health(spark, path, Seq("postings"))


  /** Driver-side serve paths ([[query]]/[[rangeQuery]]/[[queryFiltered]])
    * collect the query batch to compute probe cells and build the
    * broadcast probe table — bounded by construction for ONLINE serving,
    * and now enforced: a batch larger than this throws with a pointer at
    * [[queryBatch]], the distributed path, instead of silently OOMing the
    * driver. */
  private val MaxDriverBatch = 65536

  /** The norm expression shared by build, append, and the query side —
    * ONE definition so stored and inline evaluations are the same IEEE
    * double op sequence (left fold over squared elements, one sqrt). */
  private def normExpr(v: Column): Column =
    sqrt(graft.functions.expressions.VectorExpressions.vecDot(v, v))

  private def cosineExpr: Column =
    (graft.functions.expressions.VectorExpressions.vecDot(col("qv"), col("v")) /
      (col("qnorm") * col("vnorm"))).as("cosine")

  /** The meta column name a metadata-scoped store was built with (from
    * the manifest), if any — compact must know it to carry the column
    * and the (cell, meta) partition layout through the rewrite. */
  private def manifestMeta(ctx: ArtifactStore.Ctx): Option[String] =
    """"meta":"([^"]+)"""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs,
        new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
      .map(_.group(1))

  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
      what: String): Array[T] =
    ArtifactStore.collectBounded(ds, MaxDriverBatch, what,
      "the driver-side serve paths collect the batch to compute probes; " +
        "use IvfIndexStore.queryBatch (distributed map-side cell " +
        "assignment + keyed join) for large batches")

  /** The stored centroid array, sorted by cid — ONE definition for every
    * serve/append path so the assignment geometry can never drift
    * between them (bounded: K rows). */
  private def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** Map-side cell assignment of a (query_id, qv[, meta]) batch: each
    * query posts to its `nProbe` nearest stored cells on the executors
    * (centroids broadcast; the batch never touches the driver) with the
    * query norm projected once per posted row — the shared preamble of
    * every `*Batch` serve path, persisted because both the probe-cell
    * domain scan and the candidate join read it (callers clearCache). */
  private def postQueries(spark: SparkSession, path: String,
      queries: DataFrame, nProbe: Int, withMeta: Boolean): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
    val posted =
      if (withMeta)
        queries.select(col("query_id"), col("qv"), col("meta"))
          .as[(Long, Seq[Double], String)]
          .flatMap { case (id, qv, mv) =>
            KMeans.nearestK(bc.value, qv, nProbe).map(c => (id, qv, c.toLong, mv)) }
          .toDF("query_id", "qv", "cell", "meta")
      else
        queries.select(col("query_id"), col("qv"))
          .as[(Long, Seq[Double])]
          .flatMap { case (id, qv) =>
            KMeans.nearestK(bc.value, qv, nProbe).map(c => (id, qv, c.toLong)) }
          .toDF("query_id", "qv", "cell")
    // SPREAD TO SCHEDULER WIDTH (r14, measured — IvfBatchTimeMain): when
    // the posting side broadcasts (it is the smaller relation for
    // corpus-scale batches at gate SFs), the cosine stage pipelines onto
    // THIS relation's partitions, and a batch arriving as one parquet
    // split caps the compute at its split count (qs24 kernel 1.94 →
    // 1.35 s; the MaxSim twin measured 13.6 → 2.3 s). One round-robin
    // shuffle of the probe rows is batch-proportional; under a keyed
    // join both sides re-shuffle anyway and this is noise.
    posted.withColumn("qnorm", normExpr(col("qv")))
      .repartition(spark.sparkContext.defaultParallelism).persist()
  }

  /** The probed cell domain of a posted batch — ≤ K values whatever the
    * batch size, so this collect is bounded by the index geometry. */
  private def probedCells(posted: DataFrame): Seq[Long] =
    posted.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

  /** The bounded top-k rank finish shared by every top-k serve path —
    * (score DESC, vec_id ASC) order, (query_id, rank, vec_id) output:
    * [[graft.functions.Ranking]]'s single contract. */
  private def rankTopK(scored: DataFrame, topK: Int): DataFrame =
    graft.functions.Ranking.rankTopK(scored, topK)

  /** Build the index: assign every vector to its nearest centroid's
    * inverted list and persist centroids + cell-partitioned postings.
    * `e` must have (vec_id: bigint, embedding: array<float|double>). */
  def build(e: DataFrame, k: Int, path: String,
      centroids: Option[Array[Array[Double]]] = None,
      metaCol: Option[String] = None): Unit = {
    require(k > 0)
    ArtifactStore.requireValidMetaCol(metaCol)
    val spark = e.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    // a rebuild-in-place must not leave the OLD epoch's clean marker
    // certifying half-overwritten postings ([[ArtifactStore]]'s marker
    // ordering): drop it before the first write, re-create it last
    ArtifactStore.revokeClean(ctx)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
    val cents: Array[Array[Double]] = centroids.getOrElse {
      val init = v.filter(_._1 < k).collect().sortBy(_._1).map(_._2.toArray)
      require(init.length == k, s"need vec_ids 0..${k - 1} for deterministic centroids")
      init
    }
    val dim = cents(0).length
    val bc = spark.sparkContext.broadcast(cents)
    metaCol match {
      case None =>
        // cluster each cell into ONE file before the partitioned write
        // (the store-wide measured rule): without the repartition every
        // map task writes a sliver into every cell dir it touches —
        // tasks × cells small files every probed scan pays to open
        v.map { case (id, vec) => (id, vec, KMeans.nearest(bc.value, vec).toLong) }
          .toDF("vec_id", "v", "cell")
          .withColumn("vnorm", normExpr(col("v")))
          .select(col("vec_id"), col("v"), col("vnorm"), col("cell"))
          .repartition(k, col("cell"))
          .write.partitionBy("cell").mode("overwrite")
          .parquet(ctx.dir("postings"))
      case Some(m) =>
        // metadata-scoped index (tenant/label/language search): the
        // predicate value joins the PARTITION KEY, so filtered serving
        // prunes on (cell, meta) — qs12's posting-key insight, persisted.
        // Meta is stored as a string (partition dirs are strings anyway).
        e.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"),
            col(m).cast("string").as("meta"))
          .as[(Long, Seq[Double], String)]
          .map { case (id, vec, mv) =>
            (id, vec, KMeans.nearest(bc.value, vec).toLong, mv) }
          .toDF("vec_id", "v", "cell", "meta")
          .withColumn("vnorm", normExpr(col("v")))
          .select(col("vec_id"), col("v"), col("vnorm"), col("cell"), col("meta"))
          .repartition(col("cell"), col("meta")) // one file per leaf dir
          .write.partitionBy("cell", "meta").mode("overwrite")
          .parquet(ctx.dir("postings"))
    }
    cents.zipWithIndex.map { case (cv, cid) => (cid.toLong, cv.toSeq) }
      .toSeq.toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val metaField = metaCol.map(m => s""","meta":"$m"""").getOrElse("")
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(path, "manifest.json"),
      s"""{"k":$k,"dim":$dim$metaField}""")
    // a rebuild replaces the corpus, so tombstones recorded against the
    // OLD corpus must not survive to delete fresh docs reusing an id —
    // cleared LAST, after every write has succeeded: a build that fails
    // validation (or crashes mid-write) leaves the delete plane intact,
    // so a half-rebuilt store can only over-suppress (the conservative
    // failure for a takedown plane), never resurrect deleted documents
    ArtifactStore.resetMutationPlane(ctx)
    // a fresh build IS its own serve view — one (cell, vec_id) row per
    // input vector (build input carries unique vec_ids by the store
    // contract), no tombstones — certify it only now, after every write
    // (a crashed build leaves no marker and the serve-time fold runs)
    ArtifactStore.certifyClean(ctx)
  }

  /** Append one batch of new vectors to an EXISTING index: assignment
    * uses the stored centroids (an index's geometry is fixed at build
    * time — re-clustering is a rebuild, not an append), and postings
    * append into the same cell-partitioned layout. Under `foreachBatch`
    * retries a batch may append twice (at-least-once); [[query]] absorbs
    * replays by deduplicating the probed postings on (cell, vec_id) —
    * replayed rows are byte-identical, so dedup restores exactly-once
    * serving (spec-pinned: double-append changes nothing). Appending
    * while a compaction folds is refused loudly ([[ArtifactStore]]'s
    * single-maintainer guard) — the fold would silently discard it. */
  def appendBatch(batch: DataFrame, path: String,
      compactFactor: Int = 8): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
    // a metadata-scoped store's postings live under (cell, meta)
    // directories — an append must carry the same meta column, or the
    // mixed layout would break partition discovery for every later
    // serve; the manifest says which column the store was built with
    val assigned = (manifestMeta(ctx) match {
      case None =>
        batch.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"))
          .as[(Long, Seq[Double])]
          .map { case (id, vec) => (id, vec, KMeans.nearest(bc.value, vec).toLong) }
          .toDF("vec_id", "v", "cell")
          .withColumn("vnorm", normExpr(col("v")))
          .select(col("vec_id"), col("v"), col("vnorm"), col("cell"))
      case Some(m) =>
        require(batch.columns.contains(m),
          s"store at $path is metadata-scoped on '$m'; the append batch " +
            s"must carry that column (appending without it would corrupt " +
            "the (cell, meta) partition layout)")
        batch.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"),
            col(m).cast("string").as("meta"))
          .as[(Long, Seq[Double], String)]
          .map { case (id, vec, mv) =>
            (id, vec, KMeans.nearest(bc.value, vec).toLong, mv) }
          .toDF("vec_id", "v", "cell", "meta")
          .withColumn("vnorm", normExpr(col("v")))
          .select(col("vec_id"), col("v"), col("vnorm"), col("cell"), col("meta"))
    }).persist() // written once, then the valve reads the touched cells
    try {
      val partCols = if (manifestMeta(ctx).isEmpty) Seq("cell")
        else Seq("cell", "meta")
      // the appended rows may duplicate stored ones (at-least-once
      // replays): revoke the clean certificate BEFORE the first write so
      // a crash anywhere leaves a dirty-but-correct store (the fold runs)
      ArtifactStore.revokeClean(ctx)
      assigned.write.partitionBy(partCols: _*).mode("append")
        .parquet(ctx.dir("postings"))
      // PRESSURE VALVE (the GraphIndexStore discipline, file-count
      // flavor — [[ArtifactStore.maxPartitionFiles]]): the touched cells
      // are a bounded domain (≤ k whatever the batch), so the footprint
      // check is one tiny job + one pruned FS listing; compactFactor = 0
      // disables for deploys on their own compaction cadence
      if (compactFactor > 0) {
        val touched = assigned.select(col("cell")).distinct()
          .collect().map(r => s"cell=${r.getLong(0)}").toSeq
        if (ArtifactStore.maxPartitionFiles(ctx, "postings", touched)
            > compactFactor.toLong) compact(spark, path)
      }
    } finally assigned.unpersist()
  }

  /** Delete vectors from the index by TOMBSTONE — O(|ids|) whatever the
    * index size (the GDPR/takedown path: a delete must not rewrite a
    * 100 TB posting store). Tombstones append and [[query]] anti-joins
    * the (small, broadcast) tombstone set against the probed slice only,
    * AFTER partition pruning — so serving cost is unchanged and deleted
    * vectors stop appearing immediately. Deletion is terminal for a
    * vec_id until [[compact]]: re-appending a tombstoned id does NOT
    * resurrect it (the tombstone outranks the posting — the unambiguous
    * semantic when appends replay at-least-once). Repeated deletes of
    * the same id are absorbed the same way duplicate appends are.
    * Deleting a vector that seeded a centroid removes its POSTING only;
    * the geometry is fixed at build time, exactly like appends. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones and replayed appends into the posting store: rewrite
    * postings without tombstoned ids or duplicate (cell, vec_id) rows,
    * then retire the tombstone set. Serving is identical before and after
    * (spec-pinned) — compaction buys back storage and the serve-time
    * dedup/anti-join work, on whatever cadence the deploy prefers. The
    * rewrite stages at epoch+1 and commits via [[ArtifactStore]]'s single
    * atomic marker create, so a crash at any point leaves the live index
    * either fully pre- or fully post-compact; concurrent appends/deletes
    * fail loudly behind the compaction guard instead of being silently
    * folded away. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    val names = Seq("postings")
    ArtifactStore.beginCompact(ctx, names)
    val live = spark.read.parquet(ctx.dir("postings"))
      .dropDuplicates("cell", "vec_id")
    val kept = ArtifactStore.readTombstones(spark, ctx) match {
      case Some(t) => live.join(broadcast(t.withColumnRenamed("doc_id", "vec_id")),
        Seq("vec_id"), "left_anti")
      case None => live
    }
    // metadata-scoped stores carry the meta column (a PARTITION key —
    // queryFiltered prunes on it) through the rewrite; dropping it would
    // destroy the (cell, meta) layout and break filtered serving
    val (cols, parts) = manifestMeta(ctx) match {
      case Some(_) => (Seq("vec_id", "v", "vnorm", "cell", "meta"), Seq("cell", "meta"))
      case None => (Seq("vec_id", "v", "vnorm", "cell"), Seq("cell"))
    }
    kept.select(cols.map(col): _*)
      .write.partitionBy(parts: _*).mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "postings"))
    // the rewrite above IS the serve-view fold, so epoch+1 is clean by
    // construction: stage its marker (inert until the commit), commit,
    // then garbage-collect the superseded epoch's marker
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, names)
    ArtifactStore.retireCleanMarker(ctx)
  }

  /** Continuous index maintenance: stream arriving vectors into the
    * postings via [[appendBatch]] per micro-batch. SELF-HEALING on
    * restart ([[GraphIndexStore.appendStream]]'s argument): the pressure
    * valve means a compaction can run (and crash) with zero operator
    * involvement; the stream IS the store's single maintainer by
    * protocol, so a pending crashed compact at micro-batch time is
    * provably its own and each batch completes it before appending —
    * one-shot mutators stay loud behind the guard. */
  def appendStream(stream: DataFrame, path: String, checkpoint: String,
      compactFactor: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (ArtifactStore.crashedCompactPending(b.sparkSession, path))
          compact(b.sparkSession, path)
        appendBatch(b, path, compactFactor)
      }
      .start()

  /** The probed + replay-deduped + tombstone-folded posting slice every
    * serve kernel starts from. */
  private def servedPostings(spark: SparkSession, ctx: ArtifactStore.Ctx,
      probeCells: Seq[Long], metaFilter: Option[Seq[String]]): DataFrame = {
    // partition pruning: the isInCollection filter on the partition column
    // keeps every non-probed cell directory unopened (spec asserts the
    // scan's PartitionFilters carry it)
    // dropDuplicates absorbs at-least-once streaming appends (replayed
    // postings are identical rows); it runs AFTER the partition filter,
    // so the dedup shuffle touches only the probed nprobe/K slice
    val base = spark.read.parquet(ctx.dir("postings"))
      .filter(col("cell").isInCollection(probeCells))
    val scoped = metaFilter match {
      case Some(ms) => base.filter(col("meta").isInCollection(ms))
      case None => base
    }
    // CLEAN fast path ([[ArtifactStore.isClean]]): a certified-clean
    // store's postings ARE the serve view — no replayed duplicates, no
    // tombstones — so the dedup shuffle and the anti-join are identities
    // and serving reads the pruned slice verbatim (on the corpus-batch
    // paths the dedup is a corpus-wide shuffle per serve)
    if (ArtifactStore.isClean(ctx)) scoped
    else {
      val pruned = scoped.dropDuplicates("cell", "vec_id")
      // tombstoned ids never serve: broadcast anti-join against the (small)
      // delete set, after pruning — only the probed slice pays for it
      ArtifactStore.readTombstones(spark, ctx) match {
        case Some(t) => pruned.join(broadcast(t.withColumnRenamed("doc_id", "vec_id")),
          Seq("vec_id"), "left_anti")
        case None => pruned
      }
    }
  }

  /** Serve a query batch from the prebuilt index: cosine top-`topK` per
    * query over the `nProbe` nearest cells' postings only. `queries` must
    * have (query_id: bigint, qv: array<double>); output is
    * (query_id, rank, vec_id) in qs02's exact rank order. The query batch
    * is collected (bounded — serving batches are small by construction)
    * to drive both the partition-pruning filter and the broadcast probe
    * map. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double])] = collectBounded(
        queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])],
        "query batch")
      val probes: Seq[(Long, Seq[Double], Long)] = qs.toSeq.flatMap { case (id, qv) =>
        KMeans.nearestK(cents, qv, nProbe).map(c => (id, qv, c.toLong))
      }
      val probeCells = probes.map(_._3).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells, None)
      // query-side norm projected ONCE onto the tiny probe table (same
      // expression as an inline evaluation — bit-identical ranks)
      val probeDf = probes.toDF("query_id", "qv", "cell")
        .withColumn("qnorm", normExpr(col("qv")))
      val scored = postings.join(broadcast(probeDf), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineExpr)
      rankTopK(scored, topK)
    }
  }

  /** DISTRIBUTED serving for LARGE query batches — the offline-inference
    * shape ("top-k neighbors for every vector of a second corpus") where
    * [[query]]'s driver-side collect would OOM: nothing about the batch
    * ever lands on the driver. Centroids (K rows — small by construction)
    * broadcast to the executors, each query row is posted to its `nProbe`
    * nearest cells MAP-SIDE, and candidates come from an ordinary KEYED
    * equi-join on cell against the pruned postings (both sides shuffle on
    * cell — no broadcast of either), finished by the bounded top-k
    * aggregator. Identical assignment, scoring, and rank conventions to
    * [[query]] (same `KMeans.nearestK` geometry, same hoisted-norm cosine
    * expression), so the two paths return bit-identical rows on the same
    * batch — the fused qs04 plan served from the artifact. Partition
    * pruning still applies: the probed-cell set is a ≤K-value domain
    * whatever the batch size, so the one bounded collect here is over
    * cells, never queries. Tombstones and at-least-once appends are
    * absorbed exactly as in [[query]]. CACHE CONTRACT (every `*Batch`
    * path here and in the peer stores): the posted probe rows stay
    * cached after a successful serve — a long-lived session issuing
    * many batch serves must `spark.catalog.clearCache()` between them
    * (Verify/Bench already do); the exception path unpersists eagerly
    * per [[ArtifactStore.serving]]'s retry contract. */
  def queryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      val posted = postQueries(spark, path, queries, nProbe, withMeta = false)
      // serving() may retry at a new epoch: a failed attempt must not
      // leak its posted-query cache into the block cache (the retry
      // re-posts), so construction failures unpersist before rethrowing
      try {
        val postings = servedPostings(spark, ctx, probedCells(posted), None)
        val scored = postings.join(posted, Seq("cell")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), cosineExpr)
        rankTopK(scored, topK)
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }

  /** DISTRIBUTED RANGE serving for LARGE query batches — [[queryBatch]]'s
    * discipline on the radius primitive (the corpus-wide takedown sweep /
    * contamination audit: "everything within r of ANY of these vectors",
    * where the probe list is itself corpus-sized): map-side cell
    * assignment, keyed join on cell against the pruned postings, and a
    * STATELESS filter finish — no per-query state anywhere, so output
    * volume is exactly the answer set. Identical probe geometry, scoring
    * and output conventions to [[rangeQuery]] (the two paths return
    * bit-identical rows on the same batch); the only serve-time collect
    * is the ≤K-value probed-cell domain. */
  def rangeQueryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, radius: Double): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      val posted = postQueries(spark, path, queries, nProbe, withMeta = false)
      try {
        val postings = servedPostings(spark, ctx, probedCells(posted), None)
        postings.join(posted, Seq("cell")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), cosineExpr)
          .filter(col("cosine") >= radius)
          .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("vec_id"))
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }

  /** DISTRIBUTED FILTERED serving for LARGE query batches on a
    * metadata-scoped store — [[queryBatch]]'s discipline with the
    * predicate IN THE JOIN KEY: each query posts to (cell, its own meta
    * value) map-side and joins the postings on BOTH axes, so candidates
    * shrink by predicate selectivity before any distance computes
    * (qs12's posting-key shape at batch scale). Partition pruning uses
    * the probed-cell domain (≤K values) and, when the batch's distinct
    * meta values are few enough to enumerate (≤1024 — the tenant/label/
    * language case), the meta axis too; a high-cardinality meta domain
    * falls back to cell-only directory pruning while the join still
    * keys on (cell, meta) — graceful degradation, never a driver OOM.
    * Bit-identical rows to [[queryFiltered]] on the same batch. */
  def queryFilteredBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    val MaxMetaFilter = ArtifactStore.maxMetaFilter(spark)
    ArtifactStore.serving(spark, path) { ctx =>
      val posted = postQueries(spark, path, queries, nProbe, withMeta = true)
      try {
        // Nulls are excluded BEFORE the cap (the r13 advice class, same
        // two lines as IvfPqIndexStore/MaxSimIndexStore): a sampled null
        // must never shrink the domain under MaxMetaFilter while real
        // labels go unsampled — that would silently partition-prune
        // those labels' postings away instead of falling back to
        // cell-only pruning. Null-meta queries serve empty through the
        // null-key (cell, meta) join, never a crash.
        val probeMetas = posted.filter(col("meta").isNotNull)
          .select(col("meta")).distinct()
          .limit(MaxMetaFilter + 1).collect().map(_.getString(0))
        val metaFilter =
          if (probeMetas.length > MaxMetaFilter) None
          else Some(probeMetas.sorted.toSeq)
        val postings = servedPostings(spark, ctx, probedCells(posted), metaFilter)
        val scored = postings.join(posted, Seq("cell", "meta")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), cosineExpr)
        rankTopK(scored, topK)
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }
  }

  /** RANGE (radius) serving from the prebuilt index — the takedown-sweep
    * / contamination-check primitive next to top-k: every posting within
    * `radius` cosine of each query, however many there are. Identical
    * probe pruning, replay dedup, and tombstone semantics to [[query]];
    * the finish is a STATELESS filter (no per-query sort, no top-k
    * state), so output volume is exactly the answer set. Output:
    * (query_id, vec_id, cosine rounded to 6) ordered by (query_id,
    * vec_id) — the qs20 conventions, so the shared oracle SQL grades
    * this path verbatim. */
  def rangeQuery(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, radius: Double): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double])] = collectBounded(
        queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])],
        "query batch")
      val probes: Seq[(Long, Seq[Double], Long)] = qs.toSeq.flatMap { case (id, qv) =>
        KMeans.nearestK(cents, qv, nProbe).map(c => (id, qv, c.toLong))
      }
      val probeCells = probes.map(_._3).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells, None)
      val probeDf = probes.toDF("query_id", "qv", "cell")
        .withColumn("qnorm", normExpr(col("qv")))
      postings.join(broadcast(probeDf), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineExpr)
        .filter(col("cosine") >= radius)
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("vec_id"))
    }
  }

  /** Filtered serving from a metadata-scoped index (built with
    * `metaCol = Some(...)`): top-`topK` per query over the `nProbe`
    * nearest cells' postings RESTRICTED to the query's own metadata
    * value — the predicate prunes at the PARTITION level ((cell, meta)
    * directories), so selective predicates shrink the scan before any
    * distance computes (qs12's posting-key shape served from the
    * artifact). `queries` must have (query_id: bigint, qv: array<double>,
    * meta: string). Tombstones and at-least-once appends are absorbed
    * exactly as in [[query]]. */
  def queryFiltered(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double], String)] = collectBounded(queries
        .select(col("query_id"), col("qv"), col("meta"))
        .as[(Long, Seq[Double], String)], "query batch")
      val probes: Seq[(Long, Seq[Double], Long, String)] =
        qs.toSeq.flatMap { case (id, qv, mv) =>
          KMeans.nearestK(cents, qv, nProbe).map(c => (id, qv, c.toLong, mv))
        }
      val probeCells = probes.map(_._3).distinct.sorted
      // Nulls dropped before the sort (Ordering.String NPEs on null —
      // the r13 advice class); a null-meta query row still posts, and
      // serves empty through the null-key (cell, meta) join.
      val probeMetas = probes.map(_._4).filter(_ != null).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells, Some(probeMetas))
      val probeDf = probes.toDF("query_id", "qv", "cell", "meta")
        .withColumn("qnorm", normExpr(col("qv")))
      val scored = postings.join(broadcast(probeDf), Seq("cell", "meta"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineExpr)
      rankTopK(scored, topK)
    }
  }
}
