package graft.sinks

import graft.pipeline.KMeans
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index — the COMPRESSED member of the store matrix
  * next to [[IvfIndexStore]] (raw postings), [[BandIndexStore]] (LSH),
  * [[TextIndexStore]] (sparse terms) and [[GraphIndexStore]] (kNN graph).
  * Memory-per-vector is the real 100 TB serving constraint: a raw
  * fp64 posting row costs dim × 8 bytes, while a PQ code costs `nSub`
  * bytes (dim 64 / nSub 8 ⇒ 64× smaller), so the HOT plane a query scans
  * — nprobe/k of the code store — fits in memory at corpus sizes where
  * raw postings could not. Exactness is recovered the standard way:
  * asymmetric-distance (ADC) scoring ranks a bounded candidate set, and
  * an exact-cosine RERANK over only those candidates (vectors fetched by
  * partition-pruned point reads from the cold plane) produces the final
  * top-k — qs07's norm-free recipe (L2-normalize first, so cosine ≡ dot
  * and quantization has no norm term to approximate) behind the
  * build-once/serve-many artifact protocol.
  *
  * Layout under `path` (epoched mutable components via [[ArtifactStore]];
  * centroids/codebooks are immutable — geometry is fixed at build time,
  * re-clustering is a rebuild):
  * {{{
  *   manifest.json                    {"k":K,"dim":D,"nsub":S,"subk":SK,"vbuckets":B[,"meta":col]}
  *   centroids/                       parquet (cid, cv) — coarse cells over UNIT vectors
  *   codebooks/                       parquet (sub, code, cv) — S × SK sub-centroids
  *   postings/cell=C/<parts>.parquet  (vec_id, codes array<int>) — the HOT compressed plane
  *     (metadata-scoped store: postings/cell=C/meta=M/ — the predicate is
  *      a PARTITION KEY of the hot plane, [[IvfIndexStore]]'s qs18 layout
  *      transposed to the 8-byte code rows)
  *   vectors/vbucket=K/<parts>.parquet (vec_id, v, vnorm[, meta]) — the COLD exact plane, point-read only
  *   tombstones/, epoch-N, _COMPACTING  ArtifactStore mutation/commit plane
  *   _clean-N                         clean-store marker ([[ArtifactStore.isClean]])
  * }}}
  *
  * Serve shape: probe cells prune the code scan at the PARTITION level
  * (spec-pinned PartitionFilters, the [[IvfIndexStore]] property); ADC
  * scores compute via the codegen'd
  * [[graft.functions.expressions.PqAdc]] kernel (S table reads per
  * candidate instead of a dim-length multiply-accumulate) against
  * per-query lookup tables broadcast ONCE per query (never per probed
  * cell); candidates truncate through the shared
  * [[graft.functions.Ranking]] contract; the rerank reads ≤ batch × candK
  * exact rows through vbucket partition pruning. Recall is a measured
  * contract (qs31: ≥0.90 vs exact brute force, margins probed at every
  * SF — PqIndexProbeMain), not an oracle mirror: quantization error makes
  * the plan non-mirrorable, exactly like qs03/qs05/qs07.
  *
  * Mutation plane = the shared [[ArtifactStore]] protocol: appends assign
  * against the STORED geometry and are absorbed on replay by serve-time
  * dedup; deletes are O(|ids|) tombstones anti-joined after pruning;
  * compact folds both into an epoch+1 rewrite behind the single atomic
  * marker create; build() resets tombstones LAST.
  *
  * Reference behaviour mirrored: none — deisa-ray has no ANN surface;
  * this is the training-data-pipeline extension's compressed-serving
  * path (SURVEY §2 pipeline families).
  */
object IvfPqIndexStore {

  /** Operational health snapshot ([[ArtifactStore.health]]): epoch,
    * clean/compacting flags, pending tombstones, and per-component
    * file/byte/leaf-partition footprints of the live epoch — the
    * when-to-compact observability table for deploys on their own
    * maintenance cadence (immutable unepoched components are excluded;
    * they never grow). */
  def health(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    ArtifactStore.health(spark, path, Components)


  /** The driver-side serve path collects the query batch to build ADC
    * tables (each nSub × subK doubles — 16 KB at the 8×256 default), so
    * it is capped where the table broadcast stays ≤ ~64 MB. Corpus-scale
    * batches go through [[queryBatch]] — map-side tables, keyed joins,
    * nothing on the driver. */
  private val MaxAdcBatch = 4096

  private val DefaultVBuckets = 64

  /** Components rewritten by [[compact]] (epoched). */
  private val Components = Seq("postings", "vectors")

  /** One norm definition shared with the peer stores (sqrt of the
    * codegen'd VecDot left fold) — rerank cosines stay bit-identical to
    * the inline qs-path form. */
  private def normExpr(v: Column): Column =
    sqrt(graft.functions.expressions.VectorExpressions.vecDot(v, v))

  private def cosineExpr: Column =
    (graft.functions.expressions.VectorExpressions.vecDot(col("qv"), col("v")) /
      (col("qnorm") * col("vnorm"))).as("cosine")

  /** qs07's normalization: unit = v / sqrt(max(Σv², 1e-30)) — the guard
    * keeps zero vectors finite (they quantize arbitrarily and rerank to
    * cosine NaN-free zero-adjacent scores). */
  private def normalize(v: Seq[Double]): Array[Double] = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    val n = math.sqrt(math.max(acc, 1e-30))
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) / n; i += 1 }
    out
  }

  /** Per-subspace code assignment against trained codebooks —
    * [[KMeans.nearest]]'s tie rule (lowest code index) in every subspace. */
  private def codesOf(cbs: Array[Array[Array[Double]]],
      u: Array[Double]): Array[Int] = {
    val s = cbs.length
    val subDim = u.length / s
    Array.tabulate(s) { sub =>
      KMeans.nearest(cbs(sub),
        java.util.Arrays.copyOfRange(u, sub * subDim, (sub + 1) * subDim).toSeq)
    }
  }

  /** The flat ADC lookup table of one unit query (qs07's driver recipe):
    * entry sub·subK + j = dot(û sub-slice, codebook(sub)(j)) — ONE
    * definition shared by the driver and distributed serve paths, so the
    * two produce bit-identical scores on the same batch (spec-pinned). */
  private def adcTable(cbs: Array[Array[Array[Double]]], u: Array[Double]): Array[Double] = {
    val nSub = cbs.length
    val subK = cbs(0).length
    val subDim = u.length / nSub
    val tbl = new Array[Double](nSub * subK)
    var sub = 0
    while (sub < nSub) {
      var j = 0
      while (j < subK) {
        val c = cbs(sub)(j)
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += u(sub * subDim + i) * c(i); i += 1 }
        tbl(sub * subK + j) = acc
        j += 1
      }
      sub += 1
    }
    tbl
  }

  private def manifest(ctx: ArtifactStore.Ctx): (Int, Int, Int, Int, Int) = {
    val s = ArtifactStore.readString(ctx.fs,
      new org.apache.hadoop.fs.Path(ctx.root, "manifest.json"))
    def field(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    (field("k"), field("dim"), field("nsub"), field("subk"), field("vbuckets"))
  }

  /** The meta column name a metadata-scoped store was built with (from
    * the manifest), if any — append and compact must carry the column
    * through, and the filtered serve paths require it
    * ([[GraphIndexStore]]'s convention). */
  private def manifestMeta(ctx: ArtifactStore.Ctx): Option[String] =
    """"meta":"([^"]+)"""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs,
        new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
      .map(_.group(1))

  /** Refuse metadata-scoped stores that predate the r13 (cell, meta)
    * hot-plane layout (no `"scopedcodes":1` in manifest.json — their
    * code rows carry no meta partition column): the filtered paths'
    * declared-schema read would see meta = null and the (cell, meta)
    * join would silently serve EMPTY, and a scoped append would mix
    * partition layouts — wrong answers, not errors, without this guard
    * (the TextIndexStore `"positional"` discipline). */
  private def requireScopedCodes(ctx: ArtifactStore.Ctx, what: String): Unit =
    require(""""scopedcodes":1""".r.findFirstIn(ArtifactStore.readString(
        ctx.fs, new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
        .isDefined,
      s"metadata-scoped store at ${ctx.root} predates the (cell, meta) " +
        s"hot-plane layout — $what needs the scoped code partitions; " +
        "rebuild the index with build()")

  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
      what: String): Array[T] =
    ArtifactStore.collectBounded(ds, MaxAdcBatch, what,
      "the driver-side serve path broadcasts a per-query lookup table; " +
        "use IvfPqIndexStore.queryBatch (map-side tables, keyed joins, " +
        "nothing on the driver) for large batches")

  /** Stored coarse centroids, sorted by cid (bounded: k rows). */
  private def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** Stored codebooks as [sub][code][subDim] (bounded: nSub × subK rows). */
  private def loadCodebooks(spark: SparkSession, path: String, nSub: Int,
      subK: Int): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Seq[Double])].collect()
    val out = Array.ofDim[Array[Double]](nSub, subK)
    rows.foreach { case (sub, code, cv) => out(sub)(code) = cv.toArray }
    out
  }

  private def bucketOf(id: Long, buckets: Int): Long =
    java.lang.Math.floorMod(id, buckets.toLong)

  /** Build the index over `e` (vec_id: bigint, embedding: array<float|double>):
    * L2-normalize, train/accept coarse centroids (`k` cells over unit
    * vectors; default = the k lowest-id unit vectors, the deterministic
    * convention that works on any sub-corpus) and `nSub` per-subspace
    * codebooks of `subK` sub-centroids (default: [[KMeans.fitSubspaces]]
    * on a deterministic ~14% id-sample, seeded by the subK lowest-id unit
    * vectors), then persist cell-partitioned CODES and bucket-partitioned
    * EXACT vectors. One corpus pass assigns both cell and codes. */
  def build(e: DataFrame, k: Int, nSub: Int, subK: Int, path: String,
      iters: Int = 4, vbuckets: Int = DefaultVBuckets,
      centroids: Option[Array[Array[Double]]] = None,
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      metaCol: Option[String] = None): Unit = {
    require(k > 0 && nSub > 0 && subK > 0 && vbuckets > 0)
    ArtifactStore.requireValidMetaCol(metaCol)
    val spark = e.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    // a rebuild-in-place must not leave the OLD epoch's clean marker
    // certifying half-overwritten planes ([[ArtifactStore]]'s marker
    // ordering): drop it before the first write, re-create it last
    ArtifactStore.revokeClean(ctx)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
    // try/finally: a failed build (dim mismatch, too-small corpus, write
    // error) must not leak the cached corpus into the shared block cache
    val unit = v.map { case (id, x) => (id, normalize(x).toSeq) }.persist()
    try {
      def lowestIdUnits(n: Int, what: String): Array[Array[Double]] = {
        val rows = unit.toDF("vec_id", "u").orderBy(col("vec_id")).limit(n)
          .as[(Long, Seq[Double])].collect().sortBy(_._1)
        require(rows.length == n, s"corpus too small to seed $n $what")
        rows.map(_._2.toArray)
      }
      val cents = centroids.getOrElse(lowestIdUnits(k, "coarse centroids"))
      val dim = cents(0).length
      require(dim % nSub == 0, s"dim $dim must split evenly into $nSub subspaces")
      val cbs = codebooks.getOrElse {
        // deterministic ~14% id-sample (stable-id discipline — production
        // trains on a sample, assigns everything in one broadcast pass);
        // init from the subK lowest ids so sub-corpus builds work too
        val init = lowestIdUnits(subK, "codebook init vectors")
        KMeans.fitSubspaces(unit.filter(_._1 % 7 == 0), nSub, subK, iters,
          Some(init))
      }
      val bcC = spark.sparkContext.broadcast(cents)
      val bcCb = spark.sparkContext.broadcast(cbs)
      // HOT plane: one corpus pass assigns cell + codes; repartition by the
      // partition key so each leaf directory holds one file (the
      // small-files discipline). A metadata-scoped store puts the
      // predicate value IN THE PARTITION KEY — (cell, meta) directories,
      // IvfIndexStore's qs18 layout on the 8-byte plane — so filtered
      // serving prunes the scan to the query's own meta value and joins
      // candidates on BOTH axes: the candidate set is within-scope before
      // any ADC score computes, and the filtered path serves at the PLAIN
      // probe constants instead of rank-filtering a cross-label
      // oversample (which starves rare meta values at scale — the r12
      // design caveat this layout closes).
      val codeRows = unit.map { case (id, u) =>
        val ua = u.toArray
        (id, KMeans.nearest(bcC.value, u).toLong, codesOf(bcCb.value, ua).toSeq)
      }.toDF("vec_id", "cell", "codes")
      metaCol match {
        case Some(m) =>
          codeRows
            .join(e.select(col("vec_id"), col(m).cast("string").as("meta")),
              Seq("vec_id")) // keyed — one corpus shuffle at build time
            .repartition(k, col("cell"), col("meta"))
            .write.partitionBy("cell", "meta").mode("overwrite")
            .parquet(ctx.dir("postings"))
        case None =>
          codeRows
            .repartition(k, col("cell"))
            .write.partitionBy("cell").mode("overwrite")
            .parquet(ctx.dir("postings"))
      }
      // COLD plane: raw vectors + stored vnorm, bucket-partitioned so the
      // rerank's point reads prune (GraphIndexStore's vector layout).
      // Metadata-scoped stores ALSO carry the predicate value on the
      // vector rows (the audit/debug column and the compat surface —
      // filtered serving itself scopes on the hot plane's partition key,
      // so the rerank never needs it)
      val vMeta = metaCol match {
        case Some(m) => v.toDF("vec_id", "v").join(
          e.select(col("vec_id"), col(m).cast("string").as("meta")), Seq("vec_id"))
        case None => v.toDF("vec_id", "v")
      }
      vMeta
        .withColumn("vnorm", normExpr(col("v")))
        .withColumn("vbucket", pmod(col("vec_id"), lit(vbuckets.toLong)))
        .repartition(vbuckets, col("vbucket"))
        .write.partitionBy("vbucket").mode("overwrite")
        .parquet(ctx.dir("vectors"))
      cents.zipWithIndex.map { case (cv, cid) => (cid.toLong, cv.toSeq) }
        .toSeq.toDF("cid", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      (for (s0 <- cbs.indices; j <- cbs(s0).indices)
        yield (s0, j, cbs(s0)(j).toSeq))
        .toDF("sub", "code", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      // "scopedcodes":1 records the r13 scoped FORMAT ((cell, meta)
      // hot-plane partitions) — the filtered paths and scoped appends
      // require it ([[requireScopedCodes]])
      val metaField = metaCol
        .map(m => s""","meta":"$m","scopedcodes":1""").getOrElse("")
      ArtifactStore.writeString(ctx.fs,
        new org.apache.hadoop.fs.Path(path, "manifest.json"),
        s"""{"k":$k,"dim":$dim,"nsub":$nSub,"subk":$subK,"vbuckets":$vbuckets$metaField}""")
      // rebuild replaces the corpus: stale tombstones die with it (LAST —
      // a crashed build over-suppresses, never resurrects)
      ArtifactStore.resetMutationPlane(ctx)
      // a fresh build IS its own serve view — one code row per (cell,
      // vec_id), one vector row per vec_id, no tombstones — certified
      // only now, after every write (a crashed build leaves no marker)
      ArtifactStore.certifyClean(ctx)
    } finally unit.unpersist()
  }

  /** The probed + replay-deduped + tombstone-folded code slice (schema
    * declared — no footer reads outside the probed cells). `metaFilter`
    * prunes a scoped store's (cell, meta) directories to the batch's meta
    * domain (the filtered paths' partition-level scope cut). private[graft]
    * so the spec pins its PartitionFilters. */
  private[graft] def servedPostings(spark: SparkSession, ctx: ArtifactStore.Ctx,
      probeCells: Seq[Long],
      metaFilter: Option[Seq[String]] = None): DataFrame =
    servedCodes(spark, ctx, Some(probeCells), metaFilter)

  /** [[servedPostings]]'s core with an optional probe set — `None` is the
    * deliberate full-plane scan ([[cellSizes]]): at corpus-scaled
    * k = n/400 an "all cells" isInCollection list would itself grow with
    * the corpus, so the whole-plane reader skips the filter instead of
    * enumerating the domain. A scoped store's rows carry the meta
    * partition column whether or not a filter applies (unfiltered serving
    * on a scoped store scans across meta values and joins on cell only). */
  private def servedCodes(spark: SparkSession, ctx: ArtifactStore.Ctx,
      probeCells: Option[Seq[Long]],
      metaFilter: Option[Seq[String]] = None): DataFrame = {
    val schema =
      if (manifestMeta(ctx).nonEmpty)
        "vec_id BIGINT, codes ARRAY<INT>, cell BIGINT, meta STRING"
      else "vec_id BIGINT, codes ARRAY<INT>, cell BIGINT"
    val base = spark.read
      .schema(schema)
      .parquet(ctx.dir("postings"))
    val cellScoped = probeCells match {
      case Some(cs) => base.filter(col("cell").isInCollection(cs)) // partition pruning
      case None => base
    }
    val scoped = metaFilter match {
      case Some(ms) => cellScoped.filter(col("meta").isInCollection(ms)) // partition pruning
      case None => cellScoped
    }
    // CLEAN fast path ([[ArtifactStore.isClean]]): a certified-clean
    // store's code rows ARE the serve view, so the dedup shuffle (corpus-
    // wide on the batch paths) and the tombstone anti-join are identities
    if (ArtifactStore.isClean(ctx)) scoped
    else {
      val pruned = scoped.dropDuplicates("cell", "vec_id") // at-least-once appends
      ArtifactStore.readTombstones(spark, ctx) match {
        case Some(t) => pruned.join(
          broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
        case None => pruned
      }
    }
  }

  /** The rerank's exact-vector point reads: vbucket-pruned, declared
    * schema, replay-deduped. The scoped store's stored meta never serves
    * from here — filtered candidates are already within-scope off the
    * (cell, meta) hot plane, so the rerank is the plain exact-cosine
    * finish on every path. private[graft] for the spec's pruning pin. */
  private[graft] def vectorSlice(spark: SparkSession, ctx: ArtifactStore.Ctx,
      ids: Seq[Long], vbuckets: Int): DataFrame = {
    val bs = ids.map(bucketOf(_, vbuckets)).distinct.sorted
    val slice = spark.read
      .schema("vec_id BIGINT, v ARRAY<DOUBLE>, vnorm DOUBLE, vbucket BIGINT")
      .parquet(ctx.dir("vectors"))
      .filter(col("vbucket").isInCollection(bs)) // partition pruning
      .filter(col("vec_id").isInCollection(ids))
    // clean ⇒ one vector row per id by construction (class doc)
    val folded = if (ArtifactStore.isClean(ctx)) slice
      else slice.dropDuplicates("vec_id") // at-least-once appends
    folded.select(col("vec_id"), col("v"), col("vnorm"))
  }

  /** Serve a query batch: ADC-rank the probed cells' codes, exact-rerank
    * the top `candK` survivors per query, return (query_id, rank, vec_id)
    * top-`topK` in the shared (cosine DESC, vec_id ASC) contract, self
    * matches excluded — [[IvfIndexStore.query]]'s output conventions, so
    * the two stores are drop-in peers. `queries` rows are
    * (query_id: bigint, qv: array<double>). */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int): DataFrame =
    driverServe(spark, path, queries, nProbe, topK, candK, filtered = false)

  /** Filtered serving from a metadata-scoped store — top-`topK` among the
    * stored vectors whose meta equals the QUERY's meta, the tenant/label-
    * scoped retrieval shape on the COMPRESSED paradigm. The predicate is
    * a PARTITION KEY of the hot plane ((cell, meta) directories —
    * [[IvfIndexStore.queryFiltered]]'s qs18 layout on the code rows), so
    * the ADC scan prunes to the query's own meta value and the probe
    * join keys on BOTH axes: every candidate is within-scope before any
    * score computes, so the CandK oversample collapses to the plain
    * 24·topK (measured: recall is IDENTICAL at candK 120/240/480 — the
    * within-scope candidate volume never reaches the truncation) and the
    * scan reads ~1/L of the hot plane's bytes instead of all of them.
    * NProbe=16 (all cells at the gate geometry) stays pinned: probe loss
    * under a label filter remains the one loss mechanism, and on these
    * near-random synthetics nprobe=10 reads avg 0.82-0.96 across SFs
    * (PqFilteredProbeMain r13 — within-label truth is strictly harder
    * for nprobe<K than global truth, qs32's caveat; clustered real
    * corpora serve at corpus-scaled nprobe/K fractions). The pre-r13
    * rank-filter design needed CandK=48·topK of cross-label oversampling
    * and starved rare meta values at scale; this layout's cost no longer
    * depends on label balance at all.
    * `queries` rows are (query_id, qv, meta); everything else is
    * [[query]]'s machinery (same core), so the filtered and unfiltered
    * paths cannot drift. Recall under the filter is a measured contract
    * (the qs30 discipline). */
  def queryFiltered(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int): DataFrame =
    driverServe(spark, path, queries, nProbe, topK, candK, filtered = true)

  /** The driver-side serve core behind [[query]] / [[queryFiltered]] —
    * per-query ADC tables broadcast once and joined by query_id (never
    * through the probe-cell relation), bounded candidates, exact rerank
    * over cold-plane point reads; `filtered` scopes the code scan to the
    * batch's meta domain (partition pruning) and keys the probe join on
    * (cell, meta), so candidates are within-scope from the first ADC
    * score — the rerank itself is identical on both paths. */
  private def driverServe(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int, filtered: Boolean): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, nSub, subK, vbuckets) = manifest(ctx)
      if (filtered) {
        require(manifestMeta(ctx).nonEmpty,
          s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
            "to enable queryFiltered")
        requireScopedCodes(ctx, "queryFiltered")
      }
      val cents = loadCentroids(spark, path)
      val cbs = loadCodebooks(spark, path, nSub, subK)
      val qs: Array[(Long, Seq[Double], String)] =
        if (filtered) collectBounded(queries
            .select(col("query_id"), col("qv"), col("meta").cast("string"))
            .as[(Long, Seq[Double], String)], "query batch")
        else collectBounded(queries.select(col("query_id"), col("qv"))
            .as[(Long, Seq[Double])], "query batch")
          .map(t => (t._1, t._2, null: String))
      // per-query flat ADC table ([[adcTable]]) — one table per QUERY,
      // broadcast once and joined by query_id (joining it through the
      // probe-cell relation would replicate it nProbe times)
      val tables: Seq[(Long, Seq[Double])] = qs.toSeq.map { case (qid, qv, _) =>
        (qid, adcTable(cbs, normalize(qv)).toSeq)
      }
      val probes: Seq[(Long, Long, String)] = qs.toSeq.flatMap { case (qid, qv, mv) =>
        KMeans.nearestK(cents, normalize(qv).toSeq, nProbe)
          .map(c => (qid, c.toLong, mv))
      }
      val probeCells = probes.map(_._2).distinct.sorted
      // filtered: the scan prunes to the batch's meta domain AND the
      // probe join keys on (cell, meta) — candidates are within-scope
      // before any ADC score computes. A NULL meta query matches no
      // partition value (SQL null-key join semantics) and serves empty —
      // it is dropped from the filter domain, never crashed on
      val metaFilter =
        if (filtered)
          Some(probes.map(_._3).filter(_ != null).distinct.sorted)
        else None
      val postings = servedPostings(spark, ctx, probeCells, metaFilter)
      val probeDf =
        if (filtered) probes.toDF("query_id", "cell", "meta")
        else probes.map(p => (p._1, p._2)).toDF("query_id", "cell")
      val probeKeys = if (filtered) Seq("cell", "meta") else Seq("cell")
      val adc = postings
        .join(broadcast(probeDf), probeKeys)
        .filter(col("vec_id") =!= col("query_id"))
        .join(broadcast(tables.toDF("query_id", "tbl")), Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          graft.functions.expressions.VectorExpressions
            .pqAdc(col("codes"), col("tbl")).as("adc"))
      val cand = graft.functions.Ranking
        .topPerKey(adc, "query_id", candK, "vec_id", "adc")
        .select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect() // bounded: ≤ batch × candK pairs
      if (cand.isEmpty)
        spark.emptyDataset[(Long, Int, Long)].toDF("query_id", "rank", "vec_id")
      else {
        // exact rerank over the survivors only: point reads off the cold
        // plane, hoisted norms (qnorm projected once onto the broadcast
        // query table; vnorm stored) — qs07's rerank discipline. The
        // filtered path needs no meta check here: candidates came off the
        // (cell, meta)-pruned hot plane, already within-scope.
        val qDf = broadcast(qs.toSeq.map(t => (t._1, t._2))
          .toDF("query_id", "qv")
          .withColumn("qnorm", normExpr(col("qv"))))
        val vs = vectorSlice(spark, ctx, cand.map(_._2).distinct.toSeq, vbuckets)
        val joined = vs
          .join(broadcast(cand.toSeq.toDF("query_id", "vec_id")), Seq("vec_id"))
          .join(qDf, Seq("query_id"))
        graft.functions.Ranking.rankTopK(
          joined.select(col("query_id"), col("vec_id"), cosineExpr), topK)
      }
    }
  }

  /** DISTRIBUTED serving for LARGE query batches — the offline-inference
    * shape on the COMPRESSED store ([[IvfIndexStore.queryBatch]]'s
    * discipline): nothing about the batch ever lands on the driver.
    * Centroids + codebooks broadcast; each query row normalizes, builds
    * its ADC table, and posts to its `nProbe` cells MAP-SIDE; candidates
    * come from a KEYED equi-join on cell against the pruned code slice;
    * the per-query table joins the candidates BY query_id (a second keyed
    * join — shuffling the table once per query, never once per candidate
    * or per probed cell); the rerank joins exact vectors and query norms
    * by key, no broadcasts anywhere. The only serve-time collects are
    * two BOUNDED domains that never scale with the batch: the ≤k
    * probed-cell set and the ≤vbuckets candidate-bucket set (which
    * partition-prunes the cold-plane rerank scan). Identical
    * normalization, table floats ([[adcTable]]), scoring kernel,
    * truncation and rank conventions to [[query]], so the two paths
    * return bit-identical rows on the same batch (spec-pinned). */
  def queryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int): DataFrame =
    batchServe(spark, path, queries, nProbe, topK, candK, filtered = false)

  /** DISTRIBUTED filtered serving — [[queryFiltered]]'s semantics at
    * [[queryBatch]]'s scale (the batch matrix's FILTERED axis on the
    * compressed store): same map-side tables and keyed joins, with each
    * query posting to (cell, its own meta value) and the candidate join
    * keyed on BOTH axes against the (cell, meta)-partitioned hot plane —
    * predicate selectivity shrinks the scan before any ADC score
    * computes, and nothing about the batch lands on the driver (the meta
    * PARTITION filter enumerates the batch's distinct meta domain only
    * while it stays ≤1024 values — the tenant/label/language case; a
    * high-cardinality domain falls back to cell-only directory pruning
    * while the join still keys on (cell, meta) —
    * [[IvfIndexStore.queryFilteredBatch]]'s graceful degradation).
    * `queries` rows are (query_id, qv, meta). Bit-identical rows to
    * [[queryFiltered]] on the same batch (same core, same kernels, same
    * truncation). */
  def queryFilteredBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int): DataFrame =
    batchServe(spark, path, queries, nProbe, topK, candK, filtered = true)

  /** The distributed serve core behind [[queryBatch]] /
    * [[queryFilteredBatch]] — map-side cell posting + ADC tables, keyed
    * joins everywhere, bounded-domain collects only. */
  private def batchServe(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, topK: Int, candK: Int, filtered: Boolean): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, nSub, subK, vbuckets) = manifest(ctx)
      if (filtered) {
        require(manifestMeta(ctx).nonEmpty,
          s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
            "to enable queryFilteredBatch")
        requireScopedCodes(ctx, "queryFilteredBatch")
      }
      val bcC = spark.sparkContext.broadcast(loadCentroids(spark, path))
      val bcCb = spark.sparkContext.broadcast(loadCodebooks(spark, path, nSub, subK))
      val q = (if (filtered)
          queries.select(col("query_id"), col("qv"),
            col("meta").cast("string").as("qmeta"))
        else queries.select(col("query_id"), col("qv"),
            lit(null).cast("string").as("qmeta")))
        .as[(Long, Seq[Double], String)]
        .persist() // posted + tables + rerank norms/meta
      // serving() may retry at a new epoch: a failed attempt must not
      // leak its caches (the IvfIndexStore *Batch contract)
      var candCache: DataFrame = null
      try {
        val posted = q.flatMap { case (qid, qv, mv) =>
          KMeans.nearestK(bcC.value, normalize(qv).toSeq, nProbe)
            .map(c => (qid, c.toLong, mv))
        }.toDF("query_id", "cell", "meta")
        val tables = q.map { case (qid, qv, _) =>
          (qid, adcTable(bcCb.value, normalize(qv)).toSeq)
        }.toDF("query_id", "tbl")
        val probeCells = posted.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // ≤ k values, whatever the batch
        // the batch's meta domain prunes the scoped hot plane's (cell,
        // meta) directories while it stays enumerable; past the cap the
        // join key alone carries the predicate (never a driver OOM)
        val MaxMetaFilter = ArtifactStore.maxMetaFilter(spark)
        val metaFilter = if (!filtered) None else {
          // null metas drop out of the filter domain (their queries serve
          // empty through the null-key join, never a crash) — filtered
          // BEFORE the limit: filtering the collected sample instead
          // could count a null toward the cap and shrink ms under
          // MaxMetaFilter while real labels were never sampled, silently
          // partition-pruning those labels' rows away (r13 advice)
          val ms = posted.filter(col("meta").isNotNull)
            .select(col("meta")).distinct()
            .limit(MaxMetaFilter + 1).collect().map(_.getString(0))
          if (ms.length > MaxMetaFilter) None else Some(ms.sorted.toSeq)
        }
        // NOTE (r11, measured): joining the tables into the (query,
        // probed-cell) relation BEFORE the cell join — which would spare
        // the per-candidate rows their query_id shuffle — reads ~8%
        // SLOWER at the sf0.1 corpus batch (9.35 vs 8.68 s serve-only):
        // the cell join's key cardinality is only k, so pre-attaching the
        // 2 KB tables caps the scan+ADC stage at k-way parallelism. The
        // candidate shuffle keyed by query_id keeps batch-width
        // parallelism; keep this shape. (r12: the clean-store fast path
        // — skipping the code-plane dedup shuffle — re-measured this
        // serve at 7.92 s isolated, PqBatchTimeMain; in-suite bench
        // readings run ~2-4 s higher than isolation for this row, so
        // compare like with like when trending it.)
        val postedKeyed =
          if (filtered) posted // joins on (cell, meta) — within-scope candidates
          else posted.select(col("query_id"), col("cell"))
        val joinKeys = if (filtered) Seq("cell", "meta") else Seq("cell")
        // SHUFFLE_HASH on both keyed joins (r16, guide §3.1 "pick the
        // strategy deliberately"): the planner's default sort-merge pays
        // a full sort of the candidate relation (batch × nProbe × cell
        // rows) on each join key for joins whose build sides — the
        // (query, probed-cell) posting and the per-query 2 KB tables —
        // are batch-bounded and hash comfortably per partition; the hint
        // keeps the identical keyed-join shape (same partitioning, same
        // rows) minus the two sorts
        val adc = servedPostings(spark, ctx, probeCells, metaFilter)
          .join(postedKeyed.hint("shuffle_hash"), joinKeys) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .join(tables.hint("shuffle_hash"), Seq("query_id")) // keyed: one table copy per query
          .select(col("query_id"), col("vec_id"),
            graft.functions.expressions.VectorExpressions
              .pqAdc(col("codes"), col("tbl")).as("adc"))
        val cand = graft.functions.Ranking
          .topPerKey(adc, "query_id", candK, "vec_id", "adc")
          .select(col("query_id"), col("vec_id"))
          .persist() // the vbucket-domain scan + the rerank join read it
        candCache = cand
        // rerank: exact vectors keyed by vec_id, with the cold-plane scan
        // PARTITION-PRUNED to the candidates' vbucket domain — like the
        // probed-cell domain, it is bounded (≤ vbuckets values) whatever
        // the batch size, so this collect never scales with the batch; a
        // corpus-scale batch probes every bucket and the filter passes
        // all (harmless), a mid-size batch skips unprobed bucket dirs
        val buckets = cand
          .select(pmod(col("vec_id"), lit(vbuckets.toLong)).as("b")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val vslice = spark.read
          .schema("vec_id BIGINT, v ARRAY<DOUBLE>, vnorm DOUBLE, vbucket BIGINT")
          .parquet(ctx.dir("vectors"))
          .filter(col("vbucket").isInCollection(buckets)) // partition pruning
        // clean ⇒ one vector row per id by construction (class doc)
        val vecs = (if (ArtifactStore.isClean(ctx)) vslice
          else vslice.dropDuplicates("vec_id"))
          .select(col("vec_id"), col("v"), col("vnorm"))
        val qn = q.toDF("query_id", "qv", "qmeta")
          .select(col("query_id"), col("qv"))
          .withColumn("qnorm", normExpr(col("qv")))
        // no meta check here on either path: filtered candidates came off
        // the (cell, meta)-keyed join, already within-scope
        val kept = vecs.join(cand, Seq("vec_id")) // keyed
          .join(qn, Seq("query_id")) // keyed
        // return MATERIALIZED with the input caches released
        // (GraphIndexStore.queryBatch's shape): a lazy result would
        // silently recompute the whole ADC scan if the caller
        // clearCache()s before acting on it; callers clearCache() when
        // done with the (≤ batch × topK row) result itself
        val out = graft.functions.Ranking.rankTopK(
          kept.select(col("query_id"), col("vec_id"), cosineExpr), topK)
          .persist()
        try out.count()
        catch { case e: Throwable => out.unpersist(); throw e }
        q.unpersist()
        cand.unpersist()
        out
      } catch {
        case e: Throwable =>
          q.unpersist()
          if (candCache != null) candCache.unpersist()
          throw e
      }
    }
  }

  /** DISTRIBUTED RANGE serving on the COMPRESSED store —
    * [[IvfIndexStore.rangeQueryBatch]]'s takedown/radius sweep
    * ("everything within r of ANY of these vectors") on the PQ paradigm,
    * where the 8-byte hot plane is what the sweep scans at 100 TB. The
    * plan is a LOSSLESS two-stage cut: the ADC score prefilters probed
    * candidates at `radius - adcMargin` (the codegen'd table-lookup scan
    * — no exact vector is touched), and only the survivors verify
    * against the exact cosine from cold-plane point reads, so the
    * output is EXACTLY the probed pairs with cosine ≥ radius — equality,
    * not recall, PROVIDED the margin covers the quantization error: an
    * answer is dropped iff adcMargin < radius − adc, so the binding
    * statistic is max(radius − adc) over true answers, MEASURED
    * (PqRangeProbeMain) at 0.252 / 0.250 / 0.298 across sf0.001/0.01/0.1
    * at the gate geometry — [[AdcRangeMargin]] = 0.40 carries ≥ 33%
    * headroom. On these near-random synthetic embeddings the error is
    * inherently large (8×256 codebooks over dim-64 noise — qs32's
    * probe-loss caveat transposed), so at the qs20 radius of 0.30 the
    * cut only trims the far tail and the verify stage reads most probed
    * pairs once (still exact, and never MORE than the raw-IVF range
    * path reads); on clustered corpora — and at the high radii real
    * takedown sweeps use (cut = 0.8 − 0.4 filters almost everything) —
    * the 8-byte plane absorbs the bulk of the scan. Same map-side probe
    * geometry and keyed-join discipline as [[queryBatch]]; the finish is
    * a STATELESS filter (no per-query state) with
    * [[IvfIndexStore.rangeQuery]]'s output conventions —
    * (query_id, vec_id, cosine rounded to 6) ordered by
    * (query_id, vec_id) — so the qs20-family oracle grades it verbatim.
    * Gate: qs39. */
  def rangeQueryBatch(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, radius: Double,
      adcMargin: Double = AdcRangeMargin): DataFrame =
    rangePairs(spark, path, queries, nProbe, Some(radius - adcMargin))
      .filter(col("cosine") >= radius)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("vec_id"))

  /** The measured ADC prefilter margin for [[rangeQueryBatch]] — must
    * stay ≥ max(radius − adc) over true answers or the prefilter
    * silently drops them (PqRangeProbeMain re-measures; 0.250-0.298
    * observed across SFs at the 8×256 gate geometry and radius 0.30 —
    * re-measure before shrinking, and widen for coarser codebooks). */
  val AdcRangeMargin: Double = 0.40

  /** PROBE surface behind PqRangeProbeMain: every probed (query,
    * candidate) pair's ADC score AND exact cosine, no prefilter — the
    * relation [[AdcRangeMargin]]'s evidence is measured on. */
  private[graft] def rangeScoredPairs(spark: SparkSession, path: String,
      queries: DataFrame, nProbe: Int): DataFrame =
    rangePairs(spark, path, queries, nProbe, None)

  /** The shared range-scan core: map-side probe posting + ADC tables
    * ([[queryBatch]]'s preamble), keyed ADC scoring over the pruned code
    * plane, optional ADC cut, then the exact cosine joined per surviving
    * pair from vbucket-pruned cold-plane reads. Returns
    * (query_id, vec_id, adc, cosine); both serve-time collects are the
    * bounded probed-cell / candidate-vbucket domains. */
  private def rangePairs(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int, adcCut: Option[Double]): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val (_, _, nSub, subK, vbuckets) = manifest(ctx)
      val bcC = spark.sparkContext.broadcast(loadCentroids(spark, path))
      val bcCb = spark.sparkContext.broadcast(loadCodebooks(spark, path, nSub, subK))
      val q = queries.select(col("query_id"), col("qv"))
        .as[(Long, Seq[Double])]
        .persist() // posted + tables + verify norms read it
      try {
        val posted = q.flatMap { case (qid, qv) =>
          KMeans.nearestK(bcC.value, normalize(qv).toSeq, nProbe)
            .map(c => (qid, c.toLong))
        }.toDF("query_id", "cell")
        val tables = q.map { case (qid, qv) =>
          (qid, adcTable(bcCb.value, normalize(qv)).toSeq)
        }.toDF("query_id", "tbl")
        val probeCells = posted.select(col("cell")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq // ≤ k values
        val adc = servedPostings(spark, ctx, probeCells)
          .join(posted, Seq("cell")) // keyed, NOT broadcast
          .filter(col("vec_id") =!= col("query_id"))
          .join(tables, Seq("query_id")) // keyed: one table copy per query
          .select(col("query_id"), col("vec_id"),
            graft.functions.expressions.VectorExpressions
              .pqAdc(col("codes"), col("tbl")).as("adc"))
        // the lossless cut: candidates below radius − margin cannot be
        // answers (measured margin ≥ quantization error); survivors are
        // the only pairs that pay a cold-plane read
        val cand = adcCut match {
          case Some(cut) => adc.filter(col("adc") >= cut)
          case None => adc
        }
        val cand2 = cand.persist() // bucket-domain scan + verify join read it
        try {
          val buckets = cand2
            .select(pmod(col("vec_id"), lit(vbuckets.toLong)).as("b")).distinct()
            .collect().map(_.getLong(0)).sorted.toSeq // ≤ vbuckets values
          val vslice = spark.read
            .schema("vec_id BIGINT, v ARRAY<DOUBLE>, vnorm DOUBLE, vbucket BIGINT")
            .parquet(ctx.dir("vectors"))
            .filter(col("vbucket").isInCollection(buckets)) // partition pruning
          // clean ⇒ one vector row per id by construction (class doc)
          val vecs = (if (ArtifactStore.isClean(ctx)) vslice
            else vslice.dropDuplicates("vec_id"))
            .select(col("vec_id"), col("v"), col("vnorm"))
          val qn = q.toDF("query_id", "qv")
            .withColumn("qnorm", normExpr(col("qv")))
          // return MATERIALIZED with the caches released (the batchServe
          // contract: a lazy result would recompute the ADC scan after a
          // caller's clearCache, and serving() may retry the body)
          val out = vecs.join(cand2, Seq("vec_id")) // keyed
            .join(qn, Seq("query_id")) // keyed
            .select(col("query_id"), col("vec_id"), col("adc"), cosineExpr)
            .persist()
          try out.count()
          catch { case e: Throwable => out.unpersist(); throw e }
          out
        } finally cand2.unpersist()
      } finally q.unpersist()
    }
  }

  /** Per-query probe ranking over the STORED centroids — (query_id, cell,
    * probe_rank), rank ascending by (L2², cid) over the query's unit
    * vector, exactly the order [[query]]/[[queryBatch]] probe in: the
    * rank ≤ m prefix IS the nprobe = m probe set, so one call prices
    * every operating point of the nprobe curve (qs34's tuning surface).
    * DISTRIBUTED like [[queryBatch]] (centroids broadcast, each query row
    * ranks map-side): the batch × k output never lands on the driver, so
    * the surface serves corpus-sized batches at corpus-scaled k — no
    * batch cap. */
  def probeRanking(spark: SparkSession, path: String,
      queries: DataFrame): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { _ =>
      val bcC = spark.sparkContext.broadcast(loadCentroids(spark, path))
      queries.select(col("query_id"), col("qv")).as[(Long, Seq[Double])]
        .flatMap { case (qid, qv) =>
          KMeans.nearestK(bcC.value, normalize(qv).toSeq, bcC.value.length)
            .zipWithIndex.map { case (c, i) => (qid, c.toLong, i + 1L) }
        }.toDF("query_id", "cell", "probe_rank")
    }
  }

  /** Replay-deduped, tombstone-folded code-row counts per cell — the hot
    * plane's size table. With [[probeRanking]], scanned-codes(m) =
    * Σ counts over rank ≤ m: the scan-fraction axis of the nprobe curve
    * (capacity planning reads this instead of guessing cell balance).
    * Reads the WHOLE plane with no cell filter — enumerating all k cells
    * into an isInCollection list would grow with the corpus (k = n/400)
    * for a filter that keeps everything. */
  def cellSizes(spark: SparkSession, path: String): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      servedCodes(spark, ctx, None)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_codes"))
    }

  /** Append one batch to an EXISTING index: assignment and codes use the
    * STORED geometry (centroids + codebooks are fixed at build time —
    * re-clustering is a rebuild). Replays are absorbed at serve time by
    * the (cell, vec_id) / (vec_id) dedups, [[IvfIndexStore]]'s contract. */
  def appendBatch(batch: DataFrame, path: String,
      compactFactor: Int = 8): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val (_, _, nSub, subK, vbuckets) = manifest(ctx)
    val bcC = spark.sparkContext.broadcast(loadCentroids(spark, path))
    val bcCb = spark.sparkContext.broadcast(loadCodebooks(spark, path, nSub, subK))
    val v = batch.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].persist()
    try {
      // a metadata-scoped store's appends must carry the manifest's meta
      // column through BOTH planes (the hot plane's (cell, meta)
      // partition key and the cold plane's stored column); the format
      // guard fires BEFORE any write (refusing a pre-r13 scoped store
      // must leave it untouched)
      val metaOpt = manifestMeta(ctx)
      metaOpt.foreach { m =>
        requireScopedCodes(ctx, "appendBatch")
        require(batch.columns.contains(m),
          s"store at $path is metadata-scoped on '$m'; append batches " +
            s"must carry that column")
      }
      val codedBase = v.map { case (id, x) =>
        val u = normalize(x)
        (id, KMeans.nearest(bcC.value, u.toSeq).toLong, codesOf(bcCb.value, u).toSeq)
      }.toDF("vec_id", "cell", "codes")
      val coded = (metaOpt match {
        case Some(m) => codedBase.join(
          batch.select(col("vec_id"), col(m).cast("string").as("meta")), Seq("vec_id"))
        case None => codedBase
      }).persist()
      val hotPartCols = Seq("cell") ++ metaOpt.map(_ => "meta")
      // appended rows may duplicate stored ones (at-least-once replays):
      // revoke the clean certificate BEFORE the first write so a crash
      // anywhere leaves a dirty-but-correct store (the fold runs)
      ArtifactStore.revokeClean(ctx)
      coded
        .coalesce(1) // micro-batches are small: one file per touched cell
        .write.partitionBy(hotPartCols: _*).mode("append")
        .parquet(ctx.dir("postings"))
      // PRESSURE VALVE on the hot plane's touched cells (the shared
      // file-count discipline — [[ArtifactStore.maxPartitionFiles]];
      // cell-level dirs suffice: the metric maxes per LEAF dir, so a
      // scoped store's meta subdirectories count individually); the cold
      // plane's vbucket files grow at the same rate, one compact rewrites
      // both
      val overPressure = compactFactor > 0 && {
        val touched = coded.select(col("cell")).distinct()
          .collect().map(r => s"cell=${r.getLong(0)}").toSeq
        ArtifactStore.maxPartitionFiles(ctx, "postings", touched) >
          compactFactor.toLong
      }
      coded.unpersist()
      val vdf = metaOpt match {
        case Some(m) =>
          v.toDF("vec_id", "v").join(
            batch.select(col("vec_id"), col(m).cast("string").as("meta")), Seq("vec_id"))
        case None => v.toDF("vec_id", "v")
      }
      vdf
        .withColumn("vnorm", normExpr(col("v")))
        .withColumn("vbucket", pmod(col("vec_id"), lit(vbuckets.toLong)))
        .coalesce(1)
        .write.partitionBy("vbucket").mode("append")
        .parquet(ctx.dir("vectors"))
      // valve AFTER both planes landed: a compact must fold a complete
      // append, never split one across the epoch flip
      if (overPressure) compact(spark, path)
    } finally v.unpersist()
  }

  /** Continuous maintenance: stream arriving vectors into the index.
    * SELF-HEALING on restart ([[GraphIndexStore.appendStream]]'s
    * single-maintainer argument): a valve compaction that crashed leaves
    * a live-epoch guard only this stream could have created, so each
    * micro-batch completes it via `compact()` before appending. */
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

  /** O(|ids|) tombstone delete — the shared takedown plane ([[IvfIndexStore]]
    * semantics: immediate, terminal until compact, never resurrected). */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones and replayed appends into both planes: rewrite
    * postings without tombstoned/duplicate (cell, vec_id) rows and
    * vectors without tombstoned/duplicate vec_ids, staged at epoch+1,
    * committed by the single atomic marker create. Serving is identical
    * before and after (spec-pinned). */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.beginCompact(ctx, Components)
    val tomb = ArtifactStore.readTombstones(spark, ctx)
    def dropIds(df: DataFrame): DataFrame = tomb match {
      case Some(t) => df.join(
        broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
      case None => df
    }
    val (k, _, _, _, vbuckets) = manifest(ctx)
    // a scoped store's (cell, meta) hot-plane layout survives the rewrite
    // (meta is a PARTITION key — dropping it would silently unscope every
    // later filtered serve)
    val hotPartCols = Seq("cell") ++ manifestMeta(ctx).map(_ => "meta")
    dropIds(spark.read.parquet(ctx.dir("postings"))
        .select((Seq("vec_id", "codes") ++ hotPartCols).map(col): _*)
        .dropDuplicates("cell", "vec_id"))
      .repartition(k, hotPartCols.map(col): _*) // one file per leaf — build's discipline
      .write.partitionBy(hotPartCols: _*).mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "postings"))
    // the cold plane's stored meta column survives too
    val vcols = Seq("vec_id", "v", "vnorm") ++ manifestMeta(ctx).map(_ => "meta")
    dropIds(spark.read.parquet(ctx.dir("vectors"))
        .select(vcols.map(col): _*)
        .dropDuplicates("vec_id"))
      .withColumn("vbucket", pmod(col("vec_id"), lit(vbuckets.toLong)))
      .repartition(vbuckets, col("vbucket"))
      .write.partitionBy("vbucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "vectors"))
    // the rewrite above IS the serve-view fold: stage epoch+1's clean
    // marker (inert until the commit), commit, GC the old epoch's marker
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, Components)
    ArtifactStore.retireCleanMarker(ctx)
  }
}
