package graft.sinks

import graft.pipeline.KMeans
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MULTI-VECTOR (late-interaction / MaxSim) index artifact —
  * the build-once/serve-many member of the retrieval matrix's last
  * paradigm (dense [[IvfIndexStore]] / compressed [[IvfPqIndexStore]] /
  * graph [[GraphIndexStore]] / sparse+positional [[TextIndexStore]] /
  * multi-vector HERE): documents are SETS of sub-vectors (qs19's
  * ColBERT-style slicing — Khattab & Zaharia 2020, SIGIR) and
  * score(q, d) = Σᵢ round(maxⱼ cos(qᵢ, dⱼ), 12), the exact qs19
  * convention, so the gate row qs40 grades this store against qs19's
  * brute-force oracle SQL VERBATIM.
  *
  * Layout under `path` (epoched components via [[ArtifactStore]] — all
  * I/O through the Hadoop `FileSystem` API):
  * {{{
  *   manifest.json                  {"k":K,"dim":D,"subs":S,"subdim":SD}
  *   centroids/                     parquet (cid, cv array<double>) — POOLED space, immutable
  *   postings/cell=C/<parts>.parquet  (vec_id, v array<double>, sn array<double>[S])
  *   tombstones/                    parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING, _clean-N   ArtifactStore markers
  * }}}
  *
  * TWO wins over re-running qs19's in-query plan, and one honest limit:
  *
  *  - **Hoisted sub-norms** (the store's FLOP win): each posting stores
  *    its S per-sub-vector norms `sn` — written by the SAME
  *    `sqrt(greatest(vecDot(slice,slice), 1e-30))` expression serving
  *    would inline, so the stored double is bit-identical and every
  *    rank-order mirror contract holds — and the query side's S norms
  *    project ONCE onto the tiny probe table. qs19's inline scorer pays
  *    3 dots per (i,j) sub-pair (ab, aa, bb = 48 dots/candidate at
  *    S=4); the served scorer pays S² = 16 — a 3× kernel reduction
  *    before any pruning.
  *  - **IVF pruning over the POOLED vector** (the standard multi-vector
  *    candidate recipe — PLAID, Santhanam et al. 2022): each document is
  *    assigned to its nearest pooled-space centroid (pooled = per-dim
  *    mean of the S sub-vectors) and a query probes its `nProbe` nearest
  *    cells, so the scan opens nProbe/K of the posting directories
  *    (PartitionFilters, spec-pinned).
  *  - **The honest limit**: on THIS repo's near-random synthetic
  *    embeddings the pooled proxy ranks MaxSim poorly (measured,
  *    MaxSimProbeMain: recall at nProbe=12/16 reads 0.98 avg / 0.90 min
  *    across SFs; the true top-10 needs a 60-90% scan under ANY proxy —
  *    pooled cosine, full-vector cosine, sub-vs-pooled all measured) —
  *    the qs32 story on the multi-vector axis. The GATE therefore pins
  *    `nProbe = K` (exact by construction: probing every cell IS the
  *    brute-force scan, so qs19's oracle grades the whole
  *    build→persist→prune→serve path bit-exactly at any SF), and
  *    `nProbe < K` is the deploy-tunable approximate knob for real
  *    clustered corpora, with MaxSimProbeMain as its measured operating
  *    curve. Recall is NONDECREASING in nProbe (candidate sets nest and
  *    the scorer is exact on candidates) and EXACTLY 1.0 at nProbe=K —
  *    the qs17 contract pair, both spec-pinned.
  *
  * Mutations follow the shared [[ArtifactStore]] protocol: appends write
  * into the same cell layout (at-least-once replays absorbed by the
  * serve-time (cell, vec_id) dedup; certified-clean stores skip the
  * fold), deletes are O(|ids|) tombstones anti-joined AFTER partition
  * pruning, compact folds both at epoch+1 behind the single atomic
  * marker create, and append's pressure valve bounds per-cell file
  * counts exactly like [[IvfIndexStore.appendBatch]]'s.
  */
object MaxSimIndexStore {

  /** Operational health snapshot ([[ArtifactStore.health]]). */
  def health(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.health(spark, path, Seq("postings"))

  private val MaxDriverBatch = 65536

  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
      what: String): Array[T] =
    ArtifactStore.collectBounded(ds, MaxDriverBatch, what,
      "the driver-side serve path collects the batch to compute probes; " +
        "use MaxSimIndexStore.queryBatch (distributed map-side cell " +
        "assignment + keyed join) for large batches")

  private def vdot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.vecDot(a, b)

  /** The posting/probe sides of every pair-scoring join, pre-sliced
    * ([[subsExpr]] doc): the full vector column is REPLACED by its S
    * sub-vector views before the join, so per-candidate-pair work is the
    * S² dots alone — no per-pair slicing — and the broadcast/shuffled
    * relation carries the same payload bytes, one column over. */
  private def slicedPostings(postings: DataFrame, subs: Int, subDim: Int): DataFrame =
    postings.withColumn("vsub", subsExpr(col("v"), subs, subDim)).drop("v")

  private def slicedProbes(probes: DataFrame, subs: Int, subDim: Int): DataFrame =
    probes.withColumn("qsub", subsExpr(col("qv"), subs, subDim)).drop("qv")

  /** Sub-vector i of a flat vector column — qs19's 1-based slice. */
  private def subCol(v: Column, i: Int, subDim: Int): Column =
    slice(v, i * subDim + 1, subDim)

  /** One sub-vector's norm — the EXACT expression qs19's inline scorer
    * uses under its divisor (`sqrt(greatest(dot, 1e-30))`), shared by
    * build (stored `sn`), append, and the query side (`qn`), so stored
    * and inline evaluations are the same IEEE double. */
  private def subNormExpr(v: Column, i: Int, subDim: Int): Column =
    sqrt(greatest(vdot(subCol(v, i, subDim), subCol(v, i, subDim)), lit(1e-30)))

  private def subNormsExpr(v: Column, subs: Int, subDim: Int): Column =
    array((0 until subs).map(i => subNormExpr(v, i, subDim)): _*)

  /** All S sub-vector views of a flat vector as ONE array<array<double>>
    * column — projected on each join side BEFORE the pair join (r17), so
    * the S slice copies happen once per ROW instead of once per candidate
    * PAIR inside [[maxsimExpr]] (the batch kernel scores |queries| ×
    * |cell postings| pairs; the per-pair slices were the measured bulk of
    * its CPU). The slices are the identical [[subCol]] expressions, just
    * hoisted — the doubles [[maxsimExpr]] consumes are bit-identical. */
  private def subsExpr(v: Column, subs: Int, subDim: Int): Column =
    array((0 until subs).map(i => subCol(v, i, subDim)): _*)

  /** The MaxSim scoring expression over (qsub, qn) × (vsub, sn) — qs19's
    * exact construction (per-(i,j) cosine → 4-way greatest → round 12 →
    * left-assoc sum) with the sub-vectors AND norms read from hoisted
    * arrays ([[subsExpr]]/[[subNormsExpr]], projected once per row before
    * the pair join): `dot/(qnᵢ·snⱼ)` is the same Divide-of-Multiply node
    * over the same doubles as qs19's inline
    * `dot(slice,slice)/(sqrt(g(aa))·sqrt(g(bb)))`, so scores are
    * bit-identical and the shared (score DESC, vec_id ASC) rank order
    * reproduces the oracle's row_number exactly. */
  private def maxsimExpr(subs: Int): Column =
    (0 until subs).map { i =>
      round(greatest((0 until subs).map { j =>
        vdot(element_at(col("qsub"), i + 1), element_at(col("vsub"), j + 1)) /
          (element_at(col("qn"), i + 1) * element_at(col("sn"), j + 1))
      }: _*), 12)
    }.reduce(_ + _)

  /** Pooled (per-dim mean of the S sub-vectors) view — the candidate
    * plane's geometry, computed in ONE definition for build assignment,
    * append assignment, and query probing so they can never drift. */
  private def pooled(v: Seq[Double], subs: Int, subDim: Int): Seq[Double] = {
    val out = new Array[Double](subDim)
    var i = 0
    while (i < subs) {
      var t = 0
      while (t < subDim) { out(t) += v(i * subDim + t); t += 1 }
      i += 1
    }
    var t = 0
    while (t < subDim) { out(t) /= subs; t += 1 }
    out.toSeq
  }

  private def manifest(ctx: ArtifactStore.Ctx): (Int, Int, Int, Int) = {
    val s = ArtifactStore.readString(ctx.fs,
      new org.apache.hadoop.fs.Path(ctx.root, "manifest.json"))
    def field(n: String): Int =
      s""""$n":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    (field("k"), field("dim"), field("subs"), field("subdim"))
  }

  /** The meta column a metadata-scoped store was built with, if any —
    * appends and compact must carry the (cell, meta) layout through. */
  private def manifestMeta(ctx: ArtifactStore.Ctx): Option[String] =
    """"meta":"([^"]+)"""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs,
        new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
      .map(_.group(1))

  private def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** Build the index: pooled-space assignment into `k` inverted lists,
    * postings persisted cell-partitioned with their hoisted sub-norms.
    * `e` must have (vec_id: bigint, embedding: array<float|double>) with
    * dim = subs·subDim; centroids default to the pooled views of the
    * lowest-k vec_ids (the deterministic oracle-mirrorable convention);
    * a KMeans fit over pooled views slots in via `centroids`. */
  def build(e: DataFrame, k: Int, subs: Int, subDim: Int, path: String,
      centroids: Option[Array[Array[Double]]] = None,
      metaCol: Option[String] = None): Unit = {
    require(k > 0 && subs > 0 && subDim > 0)
    ArtifactStore.requireValidMetaCol(metaCol)
    val spark = e.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    // marker ordering: revoke before the first write, certify last
    ArtifactStore.revokeClean(ctx)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
    val cents: Array[Array[Double]] = centroids.getOrElse {
      val init = v.filter(_._1 < k).collect().sortBy(_._1)
        .map(r => pooled(r._2, subs, subDim).toArray)
      require(init.length == k,
        s"need vec_ids 0..${k - 1} for deterministic centroids")
      init
    }
    val dim = subs * subDim
    val bc = spark.sparkContext.broadcast(cents)
    metaCol match {
      case None =>
        v.map { case (id, vec) =>
          require(vec.length == dim,
            s"vector $id has dim ${vec.length}, store needs $dim")
          (id, vec, KMeans.nearest(bc.value, pooled(vec, subs, subDim)).toLong)
        }.toDF("vec_id", "v", "cell")
          .withColumn("sn", subNormsExpr(col("v"), subs, subDim))
          .select(col("vec_id"), col("v"), col("sn"), col("cell"))
          .repartition(k, col("cell")) // one file per cell (store-wide rule)
          .write.partitionBy("cell").mode("overwrite")
          .parquet(ctx.dir("postings"))
      case Some(m) =>
        // metadata-scoped store (tenant/label/language retrieval): the
        // predicate value joins the PARTITION KEY, so filtered serving
        // prunes on (cell, meta) — the IvfIndexStore posting-key recipe
        // on the multi-vector paradigm
        e.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"),
            col(m).cast("string").as("meta"))
          .as[(Long, Seq[Double], String)]
          .map { case (id, vec, mv) =>
            require(vec.length == dim,
              s"vector $id has dim ${vec.length}, store needs $dim")
            (id, vec, KMeans.nearest(bc.value, pooled(vec, subs, subDim)).toLong, mv)
          }.toDF("vec_id", "v", "cell", "meta")
          .withColumn("sn", subNormsExpr(col("v"), subs, subDim))
          .select(col("vec_id"), col("v"), col("sn"), col("cell"), col("meta"))
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
      s"""{"k":$k,"dim":$dim,"subs":$subs,"subdim":$subDim$metaField}""")
    // old-corpus tombstones die with the corpus they described — cleared
    // LAST so a crashed build can only over-suppress, never resurrect
    ArtifactStore.resetMutationPlane(ctx)
    ArtifactStore.certifyClean(ctx)
  }

  /** Append new vectors: assignment uses the STORED centroids (geometry
    * is fixed at build — re-clustering is a rebuild), postings append
    * into the same cell layout; at-least-once replays are absorbed by
    * serve-time (cell, vec_id) dedup. The pressure valve bounds per-cell
    * file counts ([[ArtifactStore.maxPartitionFiles]]); `compactFactor=0`
    * disables it. */
  def appendBatch(batch: DataFrame, path: String,
      compactFactor: Int = 8): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val (_, dim, subs, subDim) = manifest(ctx)
    val metaColName = manifestMeta(ctx) // parsed ONCE per append (r14 advice)
    val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
    // a metadata-scoped store's postings live under (cell, meta) — the
    // append must carry the same column or the mixed layout would break
    // partition discovery for every later serve
    val assigned = (metaColName match {
      case None =>
        batch.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"))
          .as[(Long, Seq[Double])]
          .map { case (id, vec) =>
            require(vec.length == dim,
              s"vector $id has dim ${vec.length}, store needs $dim")
            (id, vec, KMeans.nearest(bc.value, pooled(vec, subs, subDim)).toLong)
          }.toDF("vec_id", "v", "cell")
          .withColumn("sn", subNormsExpr(col("v"), subs, subDim))
          .select(col("vec_id"), col("v"), col("sn"), col("cell"))
      case Some(m) =>
        require(batch.columns.contains(m),
          s"store at $path is metadata-scoped on '$m'; the append batch " +
            "must carry that column (appending without it would corrupt " +
            "the (cell, meta) partition layout)")
        batch.select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"),
            col(m).cast("string").as("meta"))
          .as[(Long, Seq[Double], String)]
          .map { case (id, vec, mv) =>
            require(vec.length == dim,
              s"vector $id has dim ${vec.length}, store needs $dim")
            (id, vec, KMeans.nearest(bc.value, pooled(vec, subs, subDim)).toLong, mv)
          }.toDF("vec_id", "v", "cell", "meta")
          .withColumn("sn", subNormsExpr(col("v"), subs, subDim))
          .select(col("vec_id"), col("v"), col("sn"), col("cell"), col("meta"))
    }).persist() // written once, then the valve reads the touched cells
    try {
      val partCols = if (metaColName.isEmpty) Seq("cell")
        else Seq("cell", "meta")
      ArtifactStore.revokeClean(ctx)
      assigned.write.partitionBy(partCols: _*).mode("append")
        .parquet(ctx.dir("postings"))
      if (compactFactor > 0) {
        val touched = assigned.select(col("cell")).distinct()
          .collect().map(r => s"cell=${r.getLong(0)}").toSeq
        if (ArtifactStore.maxPartitionFiles(ctx, "postings", touched)
            > compactFactor.toLong) compact(spark, path)
      }
    } finally assigned.unpersist()
  }

  /** O(|ids|) tombstone delete — [[IvfIndexStore.delete]]'s semantics:
    * terminal until compact, immediate at serve time, geometry fixed. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones + replayed appends at epoch+1 behind the single
    * atomic marker create — serving identical before and after. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    val names = Seq("postings")
    ArtifactStore.beginCompact(ctx, names)
    val live = spark.read.parquet(ctx.dir("postings"))
      .dropDuplicates("cell", "vec_id")
    val kept = ArtifactStore.readTombstones(spark, ctx) match {
      case Some(t) => live.join(
        broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
      case None => live
    }
    // metadata-scoped stores carry the meta PARTITION key through the
    // rewrite — dropping it would destroy the (cell, meta) layout and
    // break filtered serving (the peer stores' advice-class bug)
    val (cols, parts) = manifestMeta(ctx) match {
      case Some(_) => (Seq("vec_id", "v", "sn", "cell", "meta"), Seq("cell", "meta"))
      case None => (Seq("vec_id", "v", "sn", "cell"), Seq("cell"))
    }
    kept.select(cols.map(col): _*)
      .write.partitionBy(parts: _*).mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "postings"))
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, names)
    ArtifactStore.retireCleanMarker(ctx)
  }

  /** Continuous maintenance — self-heals a crashed valve compaction per
    * micro-batch (the single-maintainer argument shared by every store's
    * appendStream; one-shot mutators stay loud behind the guard). */
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

  /** The probed + replay-deduped + tombstone-folded posting slice —
    * partition pruning on the cell column (spec-pinned PartitionFilters),
    * declared schema (footer inference would read unprobed cells), clean
    * fast path skipping the fold wholesale. */
  private[graft] def servedPostings(spark: SparkSession, ctx: ArtifactStore.Ctx,
      probeCells: Seq[Long],
      metaFilter: Option[Seq[String]] = None): DataFrame = {
    val schema = "vec_id BIGINT, v ARRAY<DOUBLE>, sn ARRAY<DOUBLE>, cell BIGINT" +
      manifestMeta(ctx).map(_ => ", meta STRING").getOrElse("")
    val base = spark.read.schema(schema)
      .parquet(ctx.dir("postings"))
      .filter(col("cell").isInCollection(probeCells))
    val scoped = metaFilter match {
      case Some(ms) => base.filter(col("meta").isInCollection(ms))
      case None => base
    }
    if (ArtifactStore.isClean(ctx)) scoped
    else {
      val pruned = scoped.dropDuplicates("cell", "vec_id")
      ArtifactStore.readTombstones(spark, ctx) match {
        case Some(t) => pruned.join(
          broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
        case None => pruned
      }
    }
  }

  /** Serve a query batch: MaxSim top-`topK` per query over the `nProbe`
    * nearest pooled cells' postings. `queries` needs (query_id: bigint,
    * qv: array<double>); output (query_id, rank, vec_id) in qs19's exact
    * rank order. `nProbe = k` is EXACT (the gate pin — see class doc);
    * `nProbe < k` is the measured approximate knob (MaxSimProbeMain). */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, subs, subDim) = manifest(ctx)
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double])] = collectBounded(
        queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])],
        "query batch")
      val probes: Seq[(Long, Seq[Double], Long)] = qs.toSeq.flatMap {
        case (id, qv) =>
          KMeans.nearestK(cents, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong))
      }
      val probeCells = probes.map(_._3).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells)
      // query-side sub-norms projected ONCE onto the tiny probe table
      val probeDf = probes.toDF("query_id", "qv", "cell")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
      val scored = postings.join(broadcast(probeDf), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          maxsimExpr(subs, subDim).as("cosine"))
      graft.functions.Ranking.rankTopK(scored, topK)
    }
  }

  /** DISTRIBUTED serving for LARGE batches — nothing about the batch
    * lands on the driver: pooled centroids broadcast, each query posts to
    * its `nProbe` cells MAP-SIDE, candidates come from the KEYED cell
    * join against the pruned postings (both sides shuffle on cell), and
    * the only collect is the ≤K probed-cell domain. Bit-identical rows to
    * [[query]] on the same batch (same assignment, scoring and rank
    * conventions).
    *
    * CACHE CONTRACT (all `*Batch` paths here and in the peer stores):
    * the posted probe rows stay cached after a SUCCESSFUL serve — both
    * the probed-cell domain scan and the candidate join read them, and
    * unpersisting before the caller materializes the result would
    * recompute the posting pass. A long-lived session issuing many
    * batch serves must `spark.catalog.clearCache()` between them
    * (Verify/Bench already do); the exception path unpersists eagerly
    * per [[ArtifactStore.serving]]'s retry contract. */
  def queryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      val (_, _, subs, subDim) = manifest(ctx)
      val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
      val posted = queries.select(col("query_id"), col("qv"))
        .as[(Long, Seq[Double])]
        .flatMap { case (id, qv) =>
          KMeans.nearestK(bc.value, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong))
        }.toDF("query_id", "qv", "cell")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
        // SPREAD TO SCHEDULER WIDTH (measured, MaxSimTimeMain): when the
        // posting side broadcasts (it is the SMALLER relation whenever
        // the batch is corpus-scale), the S²-deep pair scoring pipelines
        // onto THIS relation's partitions — and a batch arriving as one
        // parquet split would cap the whole compute at ~1 task (13.6 s →
        // 1.7 s at the sf0.1 corpus batch from this line alone). One
        // round-robin shuffle of the slim probe rows is batch-
        // proportional and buys full-width scoring; under a keyed join
        // (both sides huge) the join re-shuffles anyway and this is noise
        .repartition(spark.sparkContext.defaultParallelism)
        .persist() // probed-cell domain scan + the candidate join read it
      // serving() may retry at a new epoch: a failed attempt must not
      // leak its posted cache (the shared *Batch contract)
      try {
        val probeCells = posted.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // ≤ K values
        val postings = servedPostings(spark, ctx, probeCells)
        val scored = postings.join(posted, Seq("cell")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            maxsimExpr(subs, subDim).as("cosine"))
        graft.functions.Ranking.rankTopK(scored, topK)
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }

  /** RANGE (radius) serving — the takedown-sweep / contamination-audit
    * primitive on the multi-vector axis ([[IvfIndexStore.rangeQuery]]'s
    * semantics): every posting whose MaxSim score reaches `radius`,
    * however many there are. Identical probe pruning, replay dedup and
    * tombstone semantics to [[query]]; the finish is a STATELESS filter
    * (no per-query sort, no top-k state), so output volume is exactly
    * the answer set.
    *
    * WARNING — nProbe < K range serving is LOSSY, unlike
    * [[IvfPqIndexStore.rangeQueryBatch]]: the PQ path's ADC-margin cut
    * certifies completeness at any nProbe, but here a qualifying
    * posting whose pooled cell is not probed is SILENTLY DROPPED from
    * the sweep — there is no completeness mechanism below nProbe = K.
    * Range semantics are exact ONLY at nProbe = K (probing every
    * pooled cell IS the brute-force scan — the qs40 argument; qs42
    * gates that point verbatim). The measured answer-loss curve vs
    * nProbe lives in MaxSimProbeMain's range grid — at the qs42 radius
    * on the synthetic corpora it reads 36-54% of the answer set LOST at
    * nProbe=4, 13-16% at 8, 3-4% at 12 (r15) — real, not theoretical,
    * loss. Callers needing a
    * certified-complete sweep below a full probe should use the PQ
    * range path. Output: (query_id, vec_id, cosine rounded to 6)
    * ordered by (query_id, vec_id) — the qs20 conventions. */
  def rangeQuery(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, radius: Double): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, subs, subDim) = manifest(ctx)
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double])] = collectBounded(
        queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])],
        "query batch")
      val probes: Seq[(Long, Seq[Double], Long)] = qs.toSeq.flatMap {
        case (id, qv) =>
          KMeans.nearestK(cents, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong))
      }
      val probeCells = probes.map(_._3).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells)
      val probeDf = probes.toDF("query_id", "qv", "cell")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
      postings.join(broadcast(probeDf), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          maxsimExpr(subs, subDim).as("cosine"))
        .filter(col("cosine") >= radius)
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("vec_id"))
    }
  }

  /** DISTRIBUTED RANGE serving for LARGE batches — [[queryBatch]]'s
    * discipline (map-side cell posting, spread to scheduler width, keyed
    * cell join) with [[rangeQuery]]'s stateless filter finish — AND its
    * nProbe < K WARNING: completeness is certified only at nProbe = K.
    * Bit-identical rows to the driver path on the same batch. Caches
    * the posted probe rows until the caller's `clearCache()` (the
    * [[queryBatch]] contract). */
  def rangeQueryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, radius: Double): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      val (_, _, subs, subDim) = manifest(ctx)
      val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
      val posted = queries.select(col("query_id"), col("qv"))
        .as[(Long, Seq[Double])]
        .flatMap { case (id, qv) =>
          KMeans.nearestK(bc.value, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong))
        }.toDF("query_id", "qv", "cell")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
        .repartition(spark.sparkContext.defaultParallelism) // [[queryBatch]]'s measured fix
        .persist()
      try {
        val probeCells = posted.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // ≤ K values
        val postings = servedPostings(spark, ctx, probeCells)
        postings.join(posted, Seq("cell")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            maxsimExpr(subs, subDim).as("cosine"))
          .filter(col("cosine") >= radius)
          .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("vec_id"))
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }

  /** FILTERED serving from a metadata-scoped store (built with
    * `metaCol = Some(...)`): MaxSim top-`topK` per query over the probed
    * cells' postings RESTRICTED to the query's own metadata value — the
    * predicate prunes at the PARTITION level ((cell, meta) directories)
    * and joins the key, so candidates are within-scope before any
    * sub-cosine computes. At nProbe = K this is EXACT within the label
    * (every cell probed ⇒ the candidate set IS the label's sub-corpus),
    * so a brute-force label-scoped oracle grades it verbatim — the qs40
    * argument carried onto the filtered axis. `queries` must have
    * (query_id: bigint, qv: array<double>, meta: string). */
  def queryFiltered(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, subs, subDim) = manifest(ctx)
      require(manifestMeta(ctx).nonEmpty,
        s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
          "to serve filtered queries")
      val cents = loadCentroids(spark, path)
      val qs: Array[(Long, Seq[Double], String)] = collectBounded(queries
        .select(col("query_id"), col("qv"), col("meta"))
        .as[(Long, Seq[Double], String)], "query batch")
      val probes: Seq[(Long, Seq[Double], Long, String)] =
        qs.toSeq.flatMap { case (id, qv, mv) =>
          KMeans.nearestK(cents, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong, mv))
        }
      val probeCells = probes.map(_._3).distinct.sorted
      val probeMetas = probes.map(_._4).filter(_ != null).distinct.sorted
      val postings = servedPostings(spark, ctx, probeCells, Some(probeMetas))
      val probeDf = probes.toDF("query_id", "qv", "cell", "meta")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
      val scored = postings.join(broadcast(probeDf), Seq("cell", "meta"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          maxsimExpr(subs, subDim).as("cosine"))
      graft.functions.Ranking.rankTopK(scored, topK)
    }
  }

  /** DISTRIBUTED FILTERED serving for LARGE batches — [[queryBatch]]'s
    * discipline with the predicate IN THE JOIN KEY: each query posts to
    * (cell, its own meta value) map-side and joins the postings on BOTH
    * axes. Partition pruning uses the probed-cell domain and, when the
    * batch's distinct metas enumerate (≤1024, nulls excluded BEFORE the
    * limit — the r13 advice discipline), the meta axis too; a larger
    * domain falls back to cell-only directory pruning with the predicate
    * still in the join key. Bit-identical rows to [[queryFiltered]].
    * Caches the posted probe rows until the caller's `clearCache()`
    * (the [[queryBatch]] contract). */
  def queryFilteredBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int): DataFrame = {
    val MaxMetaFilter = ArtifactStore.maxMetaFilter(spark)
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      val (_, _, subs, subDim) = manifest(ctx)
      require(manifestMeta(ctx).nonEmpty,
        s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
          "to serve filtered queries")
      val bc = spark.sparkContext.broadcast(loadCentroids(spark, path))
      val posted = queries.select(col("query_id"), col("qv"), col("meta"))
        .as[(Long, Seq[Double], String)]
        .flatMap { case (id, qv, mv) =>
          KMeans.nearestK(bc.value, pooled(qv, subs, subDim), nProbe)
            .map(c => (id, qv, c.toLong, mv))
        }.toDF("query_id", "qv", "cell", "meta")
        .withColumn("qn", subNormsExpr(col("qv"), subs, subDim))
        // spread to scheduler width — [[queryBatch]]'s measured fix; the
        // scoring stage pipelines onto this relation's partitions when
        // the pruned posting side broadcasts
        .repartition(spark.sparkContext.defaultParallelism)
        .persist() // probed-cell domain + meta domain + candidate join
      try {
        val probeCells = posted.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // ≤ K values
        // null metas drop out of the filter domain BEFORE the limit (a
        // sampled null must never shrink the domain under the cap while
        // real labels go unsampled — the r13 advice class); their
        // queries serve empty through the null-key join, never a crash
        val ms = posted.filter(col("meta").isNotNull)
          .select(col("meta")).distinct()
          .limit(MaxMetaFilter + 1).collect().map(_.getString(0))
        val metaFilter =
          if (ms.length > MaxMetaFilter) None else Some(ms.sorted.toSeq)
        val postings = servedPostings(spark, ctx, probeCells, metaFilter)
        val scored = postings.join(posted, Seq("cell", "meta")) // keyed
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            maxsimExpr(subs, subDim).as("cosine"))
        graft.functions.Ranking.rankTopK(scored, topK)
      } catch { case e: Throwable => posted.unpersist(); throw e }
    }
  }
}
