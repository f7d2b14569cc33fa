package graft.sinks

import graft.pipeline.KnnGraph
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
  *   manifest.json                     {"degree":D,"dim":d,"buckets":B,"entries":E[,"meta":col]}
  *   edges/ebucket=K/<parts>.parquet   (src, dst, cosine) — ebucket = src % B
  *     (metadata-scoped store: the edge plane is LABEL-DISJOINT — one
  *      independent NSW subgraph per meta value, r13; filtered queries
  *      seed from their own label's entries and structurally never visit
  *      a cross-label node)
  *   vectors/vbucket=K/<parts>.parquet (vec_id, v, vnorm[, meta]) — vbucket = vec_id % B
  *   entries/<part>.parquet            (vec_id[, meta]) — the pinned entry
  *                                     points (per label on scoped stores)
  *   tombstones/                       parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING              ArtifactStore commit/guard markers
  *   _clean-N                          clean-store marker (see below)
  * }}}
  *
  * CLEAN-STORE MARKER: `_clean-N` certifies that epoch N's stored edge
  * and vector planes ARE their own serve view — no replayed/duplicate
  * rows, no orphan edges, every neighbourhood within `degree` — so
  * serving may read them verbatim and skip the distributed serve-view
  * fold (dedup → live-endpoint semi-join → per-src re-truncation), the
  * dominant cost of a corpus-scale [[queryBatch]] on a quiescent store
  * (the common deploy state: compact on a cadence, serve continuously).
  * Writers maintain it crash-safely by ORDER alone: [[build]] and
  * [[compact]] write the marker LAST (after every data write landed —
  * both produce exactly-folded planes by construction), and [[append]]
  * deletes it BEFORE its first data write, so a crash anywhere leaves
  * either no marker (fold runs — always correct) or a marker over fully
  * folded data. Tombstones need no marker discipline: cleanliness also
  * requires the live epoch's tombstone set to be absent, which [[delete]]
  * makes false by existence and [[compact]]'s commit makes true again.
  * A replayed append of fully-landed ids writes nothing and keeps the
  * marker — replays of no-ops stay no-ops.
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
  * RANGE SEARCH IS A NON-GOAL ON THIS PARADIGM (r15 decision — the gap
  * in the range matrix is deliberate, not an omission). The other
  * paradigms certify radius completeness from a property of their
  * CANDIDATE GENERATION: IVF at nProbe=K scans everything
  * ([[IvfIndexStore.rangeQuery]], qs20/21/25), PQ cuts on a LOSSLESS
  * ADC margin — a provable bound between compressed and exact scores
  * ([[IvfPqIndexStore.rangeQueryBatch]], qs39) — and MaxSim at
  * nProbe=K is again a full scan ([[MaxSimIndexStore.rangeQuery]],
  * qs42). A beam walk has no analogous certificate: its candidate set
  * is the VISITED FRONTIER, whose membership depends on graph
  * connectivity and entry placement, not on any score bound — a
  * qualifying node is reachable only through neighbours that may all
  * score below the radius, so no walk parameter (beam, hops) can prove
  * "every node ≥ radius was visited" short of walking the whole
  * component, which is the brute-force scan the store exists to avoid.
  * A lossy "range-ish" filter over the visited set would be strictly
  * worse than honest alternatives, and unlike
  * [[MaxSimIndexStore.rangeQuery]]'s documented nProbe knob there is
  * no exact operating point to pin a gate to. Callers needing radius
  * sweeps over graph-indexed vectors should serve them from an
  * [[IvfIndexStore]]/[[IvfPqIndexStore]] on the same corpus (stores
  * compose — the qs43 pattern); [[visitedCandidates]] exposes the raw
  * walk relation for diagnostics if a bounded-effort, explicitly
  * uncertified sweep is genuinely wanted.
  *
  * Reference behaviour mirrored: none — deisa-ray has no ANN surface;
  * this is part of the training-data-pipeline extension (SURVEY §2's
  * pipeline families), completing the persistent-store matrix on the
  * graph paradigm.
  */
object GraphIndexStore {

  /** Operational health snapshot ([[ArtifactStore.health]]): epoch,
    * clean/compacting flags, pending tombstones, and per-component
    * file/byte/leaf-partition footprints of the live epoch — the
    * when-to-compact observability table for deploys on their own
    * maintenance cadence (immutable unepoched components are excluded;
    * they never grow). */
  def health(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    ArtifactStore.health(spark, path, Components)


  private val DefaultBuckets = 64

  /** Components rewritten by [[compact]] (epoched). */
  private val Components = Seq("edges", "vectors", "entries")

  /** Serve/append paths collect per-hop frontier and candidate id sets to
    * drive partition pruning (bounded by queries × beam and
    * queries × beam × degree). Query batches of ANY size serve correctly:
    * the walk is embarrassingly chunkable per query, so [[query]] and
    * [[queryFiltered]] fold internally over ≤ this many queries at a time
    * — per-hop state stays bounded whatever the batch — and truly
    * corpus-scale jobs route through [[queryBatch]], the DISTRIBUTED
    * walk that never drives the driver-fold at all. APPEND batches stay
    * capped loudly: an append is a sequential NSW insert against the
    * existing graph, so the remediation is smaller batches, not a bigger
    * walk. */
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

  /** The meta column name a metadata-scoped store was built with (from
    * the manifest), if any — append and compact must carry the column
    * through, and [[queryFiltered]] requires it
    * ([[IvfIndexStore]]'s convention). */
  private def manifestMeta(ctx: ArtifactStore.Ctx): Option[String] =
    """"meta":"([^"]+)"""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs,
        new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
      .map(_.group(1))

  private def bucketOf(id: Long, buckets: Int): Long =
    java.lang.Math.floorMod(id, buckets.toLong)

  /** Refuse metadata-scoped stores that predate the r13 label-disjoint
    * layout (no `"labeldisjoint":1` in manifest.json — their edge plane
    * crosses labels and their entry rows carry no meta): the scoped
    * serve paths would read entry meta as null and silently serve EMPTY,
    * and a scoped append would splice per-label edges into a cross-label
    * graph — a wrong answer, not an error, without this guard (the
    * TextIndexStore `"positional"` discipline). */
  private def requireLabelDisjoint(ctx: ArtifactStore.Ctx, what: String): Unit =
    require(""""labeldisjoint":1""".r.findFirstIn(ArtifactStore.readString(
        ctx.fs, new org.apache.hadoop.fs.Path(ctx.root, "manifest.json")))
        .isDefined,
      s"metadata-scoped store at ${ctx.root} predates the label-disjoint " +
        s"layout — $what needs per-label subgraphs and (vec_id, meta) " +
        "entries; rebuild the index with build()")

  /** True when serving may read the stored edge/vector planes VERBATIM —
    * [[ArtifactStore.isClean]]'s certificate (the marker state machine and
    * writer ordering live there since r12, shared by all five stores).
    * private[graft] so the spec pins the state machine across
    * build/append/delete/compact. */
  private[graft] def isClean(ctx: ArtifactStore.Ctx): Boolean =
    ArtifactStore.isClean(ctx)

  /** Bounded top-`k` per `key` by (cosine DESC, id ASC) —
    * [[graft.functions.Ranking]]'s single truncation contract, everywhere
    * a neighbourhood or frontier truncates, identical to [[KnnGraph]]'s
    * convention so a fresh store serves bit-identically to the in-memory
    * engine. */
  private def topPerKey(scored: DataFrame, key: String, k: Int,
      idCol: String): DataFrame =
    graft.functions.Ranking.topPerKey(scored, key, k, idCol)

  /** Loud bound with CALL-SITE-SPECIFIC remediation — query-path advice
    * ("use the distributed IVF batch path") does not apply to an append,
    * which can only be split or turned into a rebuild.
    * [[ArtifactStore.collectBounded]] is the one definition. */
  private def collectBounded[T](ds: org.apache.spark.sql.Dataset[T],
      what: String, remedy: String): Array[T] =
    ArtifactStore.collectBounded(ds, MaxQueryBatch, what, remedy)

  /** Build the index over `e` (vec_id: bigint, embedding: array<float|double>):
    * run [[KnnGraph.build]] (cell-blocked candidates, one NN-descent
    * round, ≤ `degree` out-edges per node), persist bucket-partitioned
    * edges + vectors + the `nEntries` lowest-id entry points. Blocking
    * cells scale with the corpus (~400 rows/cell) and assignment is
    * [[KnnGraph]]'s two-level coarse-to-fine scan — O(n·√k·dim), so no
    * build stage is super-linear in the corpus. Callers `clearCache()`
    * after build (the graph builder persists its intermediates). */
  def build(e: DataFrame, path: String, degree: Int, assign: Int = 2,
      nEntries: Int = 4, buckets: Int = DefaultBuckets,
      metaCol: Option[String] = None): Unit = {
    require(degree > 0 && assign > 0 && nEntries > 0 && buckets > 0)
    ArtifactStore.requireValidMetaCol(metaCol)
    val spark = e.sparkSession
    import spark.implicits._
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    // a rebuild-in-place must not leave the OLD epoch's clean marker
    // certifying half-overwritten planes: drop it before the first write,
    // re-create it last (the marker ordering contract — class doc)
    ArtifactStore.revokeClean(ctx)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")).persist()
    val n = v.count()
    val dimRow = v.select(size(col("v"))).limit(1).collect()
    require(dimRow.nonEmpty, "empty corpus")
    val dim = dimRow(0).getInt(0)
    // cluster each bucket into ONE file before the partitioned write:
    // without the repartition every write task opens a file in every
    // bucket dir (tasks × buckets small files), and each per-hop pruned
    // serve scan pays that many file opens — measured as the dominant
    // serve cost at sf0.1
    def writeEdges(edges: DataFrame): Unit = edges
      .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
      .repartition(buckets, col("ebucket"))
      .write.partitionBy("ebucket").mode("overwrite")
      .parquet(ctx.dir("edges"))
    metaCol match {
      case None =>
        val k = math.max(16L, n / 400L)
        // centroids stay a RELATION — KnnGraph.build's two-level
        // assignment holds only the ⌈√k⌉ coarse seeds on the driver;
        // collecting all k = n/400 rows here would re-grow with the corpus
        writeEdges(KnnGraph.build(v, v.filter(col("vec_id") < k), assign, degree))
        v.withColumn("vnorm", normExpr(col("v")))
          .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
          .repartition(buckets, col("vbucket"))
          .write.partitionBy("vbucket").mode("overwrite")
          .parquet(ctx.dir("vectors"))
        v.select(col("vec_id")).orderBy(col("vec_id")).limit(nEntries)
          .coalesce(1).write.mode("overwrite").parquet(ctx.dir("entries"))
      case Some(m) =>
        // metadata-scoped store (tenant/label/language search), r13: the
        // edge plane is LABEL-DISJOINT — one independent NSW subgraph per
        // meta value ([[KnnGraph.buildScoped]], one distributed pass) with
        // per-label entry points, so a filtered walk seeds from its own
        // label's entries and NEVER scores a cross-label candidate.
        // MEASURED (GraphScopedProbeMain r13) vs the old rank-filter over
        // an unscoped walk: recall 1.000 avg AND min at beam 16 with ~6×
        // fewer visited candidates per query (180 vs 1091 at sf0.1,
        // beam-64 rank-filter read 0.91 avg / 0.80 min) — the subgraph
        // turns filtered retrieval into an unfiltered problem on a corpus
        // L× smaller, and serve cost stops depending on label balance.
        // The vector rows carry meta (the filtered fold's audit column);
        // unfiltered query/queryBatch on a scoped store seed from EVERY
        // label's entries and search the disjoint subgraphs in parallel
        // (beam attention shared across labels — MEASURED global recall
        // on a scoped store at sf0.1: 0.73 avg @ beam 32 / 0.89 @ 64 vs
        // 0.99 on an unscoped store, GraphScopedProbeMain §C; scoped
        // stores are for scoped queries — build an unscoped store for
        // global-first workloads).
        //
        // MIXED-WORKLOAD DECISION (r14, the dual-plane question): a
        // deploy needing BOTH scoped and global queries on one corpus
        // could (a) build two stores — today's answer — or (b) carry an
        // optional second, GLOBAL edge plane in this artifact (the walk
        // picks its plane). The arithmetic: per node, vectors cost
        // dim·8 + 8 B (520 B at dim 64) and an edge plane costs
        // degree·24 B (288 B at degree 12), so (b) saves the duplicated
        // vector plane — ~39% of the two-store footprint here, less as
        // dim grows. Against that, (b) doubles EVERY mutator's work and
        // its crash surface: append must walk and truncate two planes
        // (two valve domains, two orphan-repair folds), compact rewrites
        // both behind one marker, and the two workloads' maintenance
        // cadences become coupled. Storage is the cheap axis at 100 TB
        // (object-store bytes) and mutator complexity is the expensive
        // one (every r11-r13 hardening class would need re-proving per
        // plane), so TWO STORES stays the answer; revisit only if a
        // deploy demonstrates the duplicated vector plane is its actual
        // bottleneck.
        val vm = v.join(
          e.select(col("vec_id"), col(m).cast("string").as("meta")), Seq("vec_id"))
          .persist()
        // per-label centroid budget: k_l = max(16, n_l/400) capped at n_l
        // — L driver rows, the enumerable-meta contract
        val kOf: Map[String, Long] = vm.groupBy(col("meta")).count()
          .as[(String, Long)].collect()
          .map { case (l, nl) => l -> math.min(nl, math.max(16L, nl / 400L)) }
          .toMap
        // the scoped build requires a TOTAL label assignment: a null meta
        // would silently fall out of the centroid equi-joins below and
        // then hit [[KnnGraph.buildScoped]]'s per-label seed lookup as an
        // opaque executor-side NoSuchElementException (r13 advice) — fail
        // loudly on the driver instead, off the count we already collect
        require(!kOf.contains(null),
          s"metaCol '$m' has NULL values; a scoped graph store needs every " +
            "row labelled — filter or fill nulls before build")
        val kDf = broadcast(kOf.toSeq.toDF("meta", "klim"))
        val byLabel = org.apache.spark.sql.expressions.Window
          .partitionBy(col("meta")).orderBy(col("vec_id"))
        // rank on a SLIM (vec_id, meta) projection — the per-label sort
        // ships 16-byte rows, never the embedding payloads (ranking the
        // full vm would shuffle+sort every vector into one task per
        // label, twice); the centroid rows join their vectors back KEYED
        val ranked = vm.select(col("vec_id"), col("meta"))
          .withColumn("rnk", row_number().over(byLabel))
          .persist() // centroid filter + entries write read it
        // per-label centroids = each label's k_l lowest-id members (the
        // per-label transpose of the `vec_id < k` convention)
        val cents = ranked.join(kDf, Seq("meta"))
          .filter(col("rnk") <= col("klim"))
          .select(col("meta"), col("vec_id"))
          .join(vm.select(col("vec_id"), col("v")), Seq("vec_id"))
          .select(col("meta"), col("vec_id"), col("v"))
        writeEdges(KnnGraph.buildScoped(vm, cents, assign, degree))
        vm.withColumn("vnorm", normExpr(col("v")))
          .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
          .repartition(buckets, col("vbucket"))
          .write.partitionBy("vbucket").mode("overwrite")
          .parquet(ctx.dir("vectors"))
        // per-label entry points, stored WITH the meta value: filtered
        // serving seeds each query from its own label's entries
        ranked.filter(col("rnk") <= nEntries)
          .select(col("vec_id"), col("meta"))
          .coalesce(1).write.mode("overwrite").parquet(ctx.dir("entries"))
        ranked.unpersist()
        vm.unpersist()
    }
    // "labeldisjoint":1 records the r13 scoped FORMAT (per-label
    // subgraphs + (vec_id, meta) entries) — the scoped serve/append
    // paths require it ([[requireLabelDisjoint]])
    val metaField = metaCol
      .map(m => s""","meta":"$m","labeldisjoint":1""").getOrElse("")
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(path, "manifest.json"),
      s"""{"degree":$degree,"dim":$dim,"buckets":$buckets,"entries":$nEntries$metaField}""")
    v.unpersist()
    // rebuild replaces the corpus: stale tombstones die with it (LAST, so
    // a crashed build leaves the delete plane intact — over-suppression,
    // never resurrection)
    ArtifactStore.resetMutationPlane(ctx)
    // a fresh build IS its own serve view (≤ degree edges per src, no
    // duplicates, every endpoint's vector row landed above) — certify it
    // only now, after every write (a crashed build leaves no marker)
    ArtifactStore.certifyClean(ctx)
  }

  /** The base edge scan — constructed ONCE per walk so Spark's file
    * index lists the bucket directories a single time (a fresh
    * `spark.read.parquet` per hop re-lists every partition dir, which
    * dominated serve latency); partition pruning applies per-slice on
    * the shared index. Schema declared (partition column included, typed
    * BIGINT): no footer reads outside the probed slice — the
    * TextIndexStore rule. */
  private def edgeBase(spark: SparkSession, ctx: ArtifactStore.Ctx): DataFrame =
    spark.read
      .schema("src BIGINT, dst BIGINT, cosine DOUBLE, ebucket BIGINT")
      .parquet(ctx.dir("edges"))

  private def vectorBase(spark: SparkSession, ctx: ArtifactStore.Ctx): DataFrame =
    spark.read
      .schema("vec_id BIGINT, v ARRAY<DOUBLE>, vnorm DOUBLE, vbucket BIGINT")
      .parquet(ctx.dir("vectors"))

  private def edgeSliceOf(base: DataFrame, frontierIds: Seq[Long],
      buckets: Int): DataFrame = {
    val ebuckets = frontierIds.map(bucketOf(_, buckets)).distinct.sorted
    base
      .filter(col("ebucket").isInCollection(ebuckets)) // partition pruning
      .filter(col("src").isInCollection(frontierIds))
      .select(col("src"), col("dst"), col("cosine"))
  }

  private def vectorSliceOf(base: DataFrame, ids: Seq[Long],
      buckets: Int): DataFrame = {
    val vbuckets = ids.map(bucketOf(_, buckets)).distinct.sorted
    base
      .filter(col("vbucket").isInCollection(vbuckets)) // partition pruning
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("v"), col("vnorm"))
  }

  /** The raw pruned edge slice for a frontier id set (fresh scan — the
    * walk uses [[edgeSliceOf]] over a shared base). */
  private[graft] def edgeSlice(spark: SparkSession, ctx: ArtifactStore.Ctx,
      frontierIds: Seq[Long], buckets: Int): DataFrame =
    edgeSliceOf(edgeBase(spark, ctx), frontierIds, buckets)

  /** The raw pruned (vec_id, v, vnorm) slice for a bounded id set — the
    * walk's only vector I/O. Replayed append rows (byte-identical) and
    * tombstones fold driver-side on the callers' collected results. */
  private[graft] def vectorSlice(spark: SparkSession, ctx: ArtifactStore.Ctx,
      ids: Seq[Long], buckets: Int): DataFrame =
    vectorSliceOf(vectorBase(spark, ctx), ids, buckets)

  /** The live (non-tombstoned) entry-point ids (meta ignored on scoped
    * stores — this is the GLOBAL seed set: unfiltered queries on a scoped
    * store search every label's subgraph in parallel). */
  private def liveEntries(spark: SparkSession, ctx: ArtifactStore.Ctx,
      tombSet: Set[Long]): Seq[Long] =
    spark.read.schema("vec_id BIGINT").parquet(ctx.dir("entries"))
      .collect().map(_.getLong(0)).distinct.filterNot(tombSet).sorted.toSeq

  /** A SCOPED store's raw entry rows (vec_id, meta) — tombstones NOT yet
    * applied, because callers need raw-vs-live per label to distinguish
    * "label absent from the store" (serves empty — it holds no content)
    * from "label's entries all tombstoned" (fails loudly — content may
    * survive but is unreachable until compact re-derives entries).
    * Bounded by labels × nEntries (the enumerable-meta contract), dedup'd
    * (a crashed new-label append's retry may re-append entry rows). */
  private def entryRowsScoped(spark: SparkSession,
      ctx: ArtifactStore.Ctx): Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.schema("vec_id BIGINT, meta STRING").parquet(ctx.dir("entries"))
      .distinct().as[(Long, String)].collect().toSeq
  }

  /** Per-label LIVE entry map of a scoped store, failing loudly for any
    * label in `wanted` whose entries are all tombstoned. */
  private def entriesByMeta(spark: SparkSession, ctx: ArtifactStore.Ctx,
      tombSet: Set[Long], wanted: Iterable[String]): Map[String, Seq[Long]] = {
    val raw = entryRowsScoped(spark, ctx)
    val live: Map[String, Seq[Long]] = raw.filterNot(r => tombSet(r._1))
      .groupBy(_._2).map { case (l, rs) => l -> rs.map(_._1).sorted }
    val rawLabels = raw.map(_._2).toSet
    val dead = wanted.toSeq.distinct.filter(l => rawLabels(l) && !live.contains(l))
    require(dead.isEmpty,
      s"every entry point of label(s) ${dead.mkString(", ")} in ${ctx.root} " +
        "is tombstoned — run compact() to re-derive entries from the " +
        "surviving corpus")
    live
  }

  /** The [[graft.functions.ScoredHit]] total order — (cosine DESC,
    * id ASC), the primitive-double comparison [[topPerKey]] truncates
    * with — [[graft.functions.Ranking.beats]], so every driver-side fold
    * in the walk ranks identically to the distributed aggregator. */
  private def beats(aCos: Double, aId: Long, bCos: Double, bId: Long): Boolean =
    graft.functions.Ranking.beats(aCos, aId, bCos, bId)

  /** Beam-search the stored graph and return every visited
    * (query_id, vec_id, cosine) — the engine behind [[query]] and
    * [[append]]. Identical hop mechanics, scoring expressions and
    * truncation order to [[KnnGraph.search]], so a freshly built store
    * serves bit-identically to the in-memory engine (spec-pinned).
    *
    * The walk FOLDS DRIVER-SIDE over collected pruned slices: the
    * frontier state is bounded by construction (≤ batch × beam × degree
    * rows per hop — the [[MaxQueryBatch]] rationale), and a distributed
    * per-hop formulation pays multiple jobs plus shuffle rounds per hop
    * in pure scheduling overhead on data this small (measured ~9 s for a
    * 5-query walk at sf0.1 vs ~1 s for the peer stores' serves). Per hop
    * exactly two shuffle-free jobs run: the partition-pruned edge-slice
    * collect and the partition-pruned vector scan joined against the
    * broadcast candidate pairs + query table. Cosines always compute IN
    * SPARK through the same [[cosineExpr]]/[[normExpr]] kernels as the
    * distributed paths (driver arithmetic never re-derives a float), and
    * every dedup/truncation uses [[beats]] — so results stay
    * bit-identical to the in-memory engine. The per-hop edge I/O remains
    * partition-pruned to the frontier's buckets, which is the property
    * that scales: query cost tracks the walk, never the corpus.
    *
    * ORPHAN edges (a dst with no vector row — the footprint of an append
    * that crashed between its edge and vector writes) are folded OUT of
    * neighbourhood truncation, not just dropped at score time: scoring is
    * an inner join against the vector slice, so an orphan candidate
    * returns no row — the fold detects that (a scored candidate is the
    * proof its vector exists), marks the dst dead, RE-truncates the
    * affected neighbourhoods, and scores the edges the orphan had evicted
    * from their `degree` slots. The common (orphan-free) path pays
    * nothing: detection falls out of the score job the hop runs anyway,
    * and the repair loop runs zero extra iterations. [[compact]] applies
    * the same exclusion (dst semi-joined against live vector ids), so
    * serve identity across compact holds with or without orphans. */
  private def searchVisited(spark: SparkSession, ctx: ArtifactStore.Ctx,
      qs: Array[(Long, Seq[Double])], beam: Int, hops: Int,
      qMeta: Option[Map[Long, String]] = None): Array[(Long, Long, Double)] = {
    import spark.implicits._
    require(qs.length <= MaxQueryBatch, "internal: walk slice exceeds MaxQueryBatch")
    val (degree, _, buckets, _) = manifest(ctx)
    val tombSet: Set[Long] = ArtifactStore.readTombstones(spark, ctx) match {
      // tombstones are broadcast-small by protocol (the previous
      // formulation broadcast them into every per-hop anti-join)
      case Some(t) => t.select(col("doc_id")).as[Long].collect().toSet
      case None => Set.empty
    }
    val q = broadcast(qs.toSeq.toDF("query_id", "qv")
      .withColumn("qnorm", normExpr(col("qv"))))
    // per-query seed sets: with qMeta (the scoped filtered path) each
    // query seeds from ITS label's entries — on the label-disjoint edge
    // plane the walk then never leaves the query's subgraph; without,
    // every query seeds from the global entry list (a scoped store's
    // global list spans every label: unfiltered search runs all the
    // subgraphs in parallel under one beam)
    val entrySets: Map[Long, Seq[Long]] = qMeta match {
      case Some(m) =>
        val byLabel = entriesByMeta(spark, ctx, tombSet, m.values)
        qs.iterator.map(qr =>
          qr._1 -> byLabel.getOrElse(m(qr._1), Seq.empty)).toMap
      case None =>
        val entryIds = liveEntries(spark, ctx, tombSet)
        require(entryIds.nonEmpty,
          s"every entry point of ${ctx.root} is tombstoned — run compact() " +
            "to re-derive entries from the surviving corpus")
        qs.iterator.map(_._1 -> entryIds).toMap
    }

    // one shuffle-free job: pruned vector scan ⋈ broadcast pairs ⋈
    // broadcast queries → exact candidate cosines; replayed append rows
    // are byte-identical, so the driver dedup keeps identical values
    val eBase = edgeBase(spark, ctx)
    val vBase = vectorBase(spark, ctx)

    def score(pairs: Seq[(Long, Long)]): Array[(Long, Long, Double)] = {
      if (pairs.isEmpty) return Array.empty
      // bounded by construction: ≤ slice × beam × degree pairs per hop —
      // at the 4096-query slice cap with beam 32 / degree 12 that is
      // ~1.5 M 16-byte rows (~25 MB broadcast), chunky but fixed; gate
      // batches (5-500 queries) broadcast KBs. The slice cap in
      // queryChunked is what keeps this a constant, not a batch variable
      val ids = pairs.map(_._2).distinct
      val cand = broadcast(pairs.toDF("query_id", "vec_id"))
      vectorSliceOf(vBase, ids, buckets)
        .join(cand, Seq("vec_id"))
        .join(q, Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineExpr)
        .as[(Long, Long, Double)].collect().distinct
    }

    val visited = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashMap[Long, Double]]
    // every id a score job ever returned a row for — the proof its vector
    // row exists (visited ⊆ knownLive always)
    val knownLive = scala.collection.mutable.HashSet.empty[Long]
    // edge dsts a score job proved vector-less (orphans of crashed
    // appends); excluded from every later truncation, like tombstones
    val knownDead = scala.collection.mutable.HashSet.empty[Long]
    def addVisited(rows: Array[(Long, Long, Double)]): Unit =
      rows.foreach { case (qid, vid, c) =>
        knownLive += vid
        visited.getOrElseUpdate(qid,
          scala.collection.mutable.HashMap.empty).update(vid, c)
      }
    addVisited(score(for (qr <- qs.toSeq; e <- entrySets(qr._1)) yield (qr._1, e)))
    var frontier: Map[Long, Seq[Long]] = entrySets.filter(_._2.nonEmpty)
    var hop = 0
    while (hop < hops && frontier.nonEmpty) {
      hop += 1
      val frontierIds = frontier.valuesIterator.flatten.toSeq.distinct.sorted
      // the collected slice folds exactly as compact rewrites: exact-replay
      // dedup → tombstoned/orphan destinations dropped → per-src
      // truncation to the best `degree` by (cosine DESC, dst ASC)
      val srcRows: Map[Long, Array[(Long, Long, Double)]] =
        edgeSliceOf(eBase, frontierIds, buckets)
          .as[(Long, Long, Double)].collect().distinct
          .filter(r => !tombSet(r._2))
          .groupBy(_._1)
      val hopRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val attempted = scala.collection.mutable.HashSet.empty[(Long, Long)]
      var settled = false
      while (!settled) {
        val adj: Map[Long, Seq[Long]] = srcRows.map { case (src, arr) =>
          src -> arr.iterator.filter(r => !knownDead(r._2)).toSeq
            .sortWith((a, b) => beats(a._3, a._2, b._3, b._2))
            .take(degree).map(_._2)
        }
        val candPairs = (for {
          (qid, vids) <- frontier.toSeq
          vid <- vids
          dst <- adj.getOrElse(vid, Nil)
          if !visited.get(qid).exists(_.contains(dst)) && !attempted((qid, dst))
        } yield (qid, dst)).distinct
        if (candPairs.isEmpty) settled = true
        else {
          attempted ++= candPairs
          val scored = score(candPairs)
          addVisited(scored)
          hopRows ++= scored
          // a candidate the score job returned NO row for has no vector
          // row: orphan — kill it and rerun the truncation, which may
          // admit (and score) the edges it had evicted
          val orphans = candPairs.iterator.map(_._2)
            .filterNot(knownLive).toSet
          if (orphans.isEmpty) settled = true
          else knownDead ++= orphans
        }
      }
      frontier =
        if (hopRows.isEmpty) Map.empty
        else hopRows.toArray.groupBy(_._1).map { case (qid, arr) =>
          qid -> arr.toSeq.sortWith((a, b) => beats(a._3, a._2, b._3, b._2))
            .take(beam).map(_._2)
        }
    }
    visited.iterator.flatMap { case (qid, m) =>
      m.iterator.map { case (vid, c) => (qid, vid, c) }
    }.toArray
  }

  /** Serve a query batch from the stored graph: beam search, then the
    * bounded top-`topK` rank finish — (query_id, rank, vec_id) in the
    * shared (cosine DESC, vec_id ASC) order, self-matches excluded
    * ([[IvfIndexStore.query]]'s output conventions). Batches of ANY size
    * serve: each query's walk is independent, so the fold runs per
    * [[MaxQueryBatch]]-query slice and concatenates — per-hop driver
    * state stays bounded by the slice, never the batch (results are
    * bit-identical to slice-by-slice calls; spec-pinned). The result is a
    * local relation (≤ batch × topK rows): serving leaves zero persistent
    * RDDs behind, whatever the caller does with the returned frame. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int, topK: Int): DataFrame =
    queryChunked(spark, path, queries, beam, hops, topK, MaxQueryBatch)

  /** [[query]] with an explicit walk-slice width — the spec hook that
    * proves slice-size invariance; production callers use [[query]].
    *
    * The batch STREAMS to the driver (`toLocalIterator` — one input
    * partition resident at a time), so driver memory holds one partition,
    * one walk slice, and the accumulated (batch × topK) answer rows —
    * never the batch's vectors all at once. Truly corpus-scale batches
    * route through [[queryBatch]], whose answer set never lands on the
    * driver at all. */
  private[graft] def queryChunked(spark: SparkSession, path: String,
      queries: DataFrame, beam: Int, hops: Int, topK: Int,
      chunk: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      val qs = queries.select(col("query_id"), col("qv"))
        .as[(Long, Seq[Double])].toLocalIterator().asScala
      qs.grouped(math.max(1, chunk)).flatMap { slice =>
        val visited = searchVisited(spark, ctx, slice.toArray, beam, hops)
        visited.groupBy(_._1).toSeq.flatMap { case (qid, arr) =>
          arr.filter(_._2 != qid).toSeq
            .sortWith((a, b) => beats(a._3, a._2, b._3, b._2)).take(topK)
            .zipWithIndex.map { case ((_, vid, _), i) => (qid, i + 1, vid) }
        }
      }.toSeq.sortBy(r => (r._1, r._2)).toDF("query_id", "rank", "vec_id")
    }

  /** The walk's raw VISITED relation for a query batch — (query_id,
    * vec_id, cosine), every candidate the beam search scored (self
    * matches included): the graph paradigm's tuning surface, the analog
    * of [[IvfPqIndexStore.probeRanking]]/`cellSizes` on the beam/hops
    * axes (qs38). ONE walk prices BOTH sides of an operating point:
    * recall ([[query]]'s answer is exactly this relation's
    * (cosine DESC, vec_id ASC) top-k minus self matches — the shared
    * [[graft.functions.Ranking]] finish) and walk cost (the per-query
    * row count IS the number of scored candidates, the unit the per-hop
    * I/O and compute scale with). Because the hop loop is deterministic
    * and `hops` only bounds it, a deeper walk's visited set is a SUPERSET
    * of a shallower one's at the same beam — the provable monotonicity
    * qs38 gates. Same driver-fold engine and slice chunking as
    * [[query]]. */
  def visitedCandidates(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      val qs = queries.select(col("query_id"), col("qv"))
        .as[(Long, Seq[Double])].toLocalIterator().asScala
      qs.grouped(MaxQueryBatch).flatMap { slice =>
        searchVisited(spark, ctx, slice.toArray, beam, hops).toSeq
      }.toSeq.sortBy(r => (r._1, r._2)).toDF("query_id", "vec_id", "cosine")
    }

  /** Filtered serving from a metadata-scoped store: top-`topK` same-label
    * neighbours per query — the tenant/label-scoped retrieval shape on
    * the graph paradigm. r13: the scoped store's edge plane is
    * LABEL-DISJOINT (one NSW subgraph per meta value — build doc) with
    * per-label entry points, so each query seeds from ITS label's entries
    * and the walk structurally never scores a cross-label candidate — no
    * rank-time meta fetch, no oversampling: filtered retrieval IS
    * unfiltered retrieval on a corpus L× smaller (measured ~6× fewer
    * visited candidates per query than the pre-r13 beam-64 rank-filter,
    * at recall 1.000 — GraphScopedProbeMain). A query whose label is
    * absent from the store serves empty (it holds no same-label content);
    * a label whose entries are ALL tombstoned fails loudly (compact
    * re-derives them). Everything else is [[query]]'s machinery.
    * `queries` rows are (query_id, qv, meta). Recall is gated by the qs30
    * contract — margins MEASURED at all SFs (GraphFilteredProbeMain)
    * before any constant shrinks. */
  def queryFiltered(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int, topK: Int): DataFrame =
    queryFilteredChunked(spark, path, queries, beam, hops, topK, MaxQueryBatch)

  /** [[queryFiltered]] with an explicit walk-slice width (the
    * [[queryChunked]] spec hook on the filtered path). */
  private[graft] def queryFilteredChunked(spark: SparkSession, path: String,
      queries: DataFrame, beam: Int, hops: Int, topK: Int,
      chunk: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      import spark.implicits._
      require(manifestMeta(ctx).nonEmpty,
        s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
          "to enable queryFiltered")
      requireLabelDisjoint(ctx, "queryFiltered")
      import scala.jdk.CollectionConverters._
      // batch streams to the driver one partition at a time (the
      // queryChunked memory discipline)
      val rows = queries
        .select(col("query_id"), col("qv"), col("meta").cast("string"))
        .as[(Long, Seq[Double], String)].toLocalIterator().asScala
      rows.grouped(math.max(1, chunk)).flatMap { slice =>
        val qMeta: Map[Long, String] =
          slice.map(r => r._1 -> r._3).toMap
        // per-label seeding keeps the walk inside each query's subgraph —
        // every visited candidate is same-label by construction
        val visited = searchVisited(spark, ctx,
          slice.map(r => (r._1, r._2)).toArray, beam, hops, Some(qMeta))
        visited.groupBy(_._1).toSeq.flatMap { case (qid, arr) =>
          arr.filter(_._2 != qid).toSeq
            .sortWith((a, b) => beats(a._3, a._2, b._3, b._2)).take(topK)
            .zipWithIndex.map { case ((_, vid, _), i) => (qid, i + 1, vid) }
        }
      }.toSeq.sortBy(r => (r._1, r._2)).toDF("query_id", "rank", "vec_id")
    }

  /** DISTRIBUTED serving for LARGE query batches — the offline-inference
    * shape on the GRAPH paradigm, completing the batch-serve matrix next
    * to `IvfIndexStore.queryBatch` / `IvfPqIndexStore.queryBatch` /
    * `TextIndexStore.queryBm25Batch`: nothing about the batch ever lands
    * on the driver. The stored graph folds to its serve view DISTRIBUTED
    * (replay dedup → live-endpoint semi-join, which drops tombstoned AND
    * orphan dsts exactly like the driver fold's repair loop → per-src
    * re-truncation to `degree` through the shared [[graft.functions.Ranking]]
    * contract), and the walk is [[KnnGraph.search]]'s per-hop keyed
    * joins — the corpus-scale formulation the driver fold deliberately
    * replaced for SMALL batches (per-hop scheduling overhead dominates
    * there; with thousands of queries per hop the distributed joins
    * amortize, and the edge relation is read once, full-scan, because a
    * corpus-scale frontier touches most buckets anyway). Bit-identical
    * rows to [[query]] on the same batch (spec-pinned across appends,
    * tombstones AND injected orphans — same folds, same walk mechanics,
    * same truncation order). The result is returned MATERIALIZED
    * (persisted + counted, ≤ batch × topK rows distributed) so the walk's
    * checkpoint state can be released eagerly; callers `clearCache()`
    * when done — the standard serve contract. */
  def queryBatch(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      distributedWalkServe(spark, ctx, queries, beam, hops) { visited =>
        graft.functions.Ranking.rankTopK(
          visited.filter(col("vec_id") =!= col("query_id")), topK)
      }
    }

  /** DISTRIBUTED filtered serving — [[queryFiltered]]'s semantics at
    * [[queryBatch]]'s scale, completing the batch matrix on the FILTERED
    * axis (a tenant/label-scoped corpus-scale job previously had to chunk
    * through the driver fold). r13: the walk itself is SCOPED — each
    * query's seed rows come from a keyed join of the batch's (query_id,
    * meta) against the broadcast-small per-label entry table
    * ([[KnnGraph.searchSeeded]]), and on the label-disjoint edge plane
    * the per-hop joins then never produce a cross-label candidate, so
    * the old rank-time meta joins (and their full vector-meta scan) are
    * GONE — nothing about the batch on the driver beyond the tiny
    * dead-label check. Bit-identical rows to [[queryFiltered]] on the
    * same batch: same fold, same seeds, same walk mechanics, same
    * truncation order. `queries` rows are (query_id, qv, meta). */
  def queryFilteredBatch(spark: SparkSession, path: String, queries: DataFrame,
      beam: Int, hops: Int, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      require(manifestMeta(ctx).nonEmpty,
        s"store at $path is not metadata-scoped; build(metaCol = Some(...)) " +
          "to enable queryFilteredBatch")
      requireLabelDisjoint(ctx, "queryFilteredBatch")
      distributedWalkServe(spark, ctx, queries, beam, hops,
        filtered = true) { visited =>
        graft.functions.Ranking.rankTopK(
          visited.filter(col("vec_id") =!= col("query_id")), topK)
      }
    }

  /** The shared distributed-serve skeleton behind [[queryBatch]] and
    * [[queryFilteredBatch]]: one tombstone read feeds the entry filter
    * and the liveness anti-join, the stored graph folds to its serve view
    * DISTRIBUTED (replay dedup → live-endpoint semi-join → per-src
    * re-truncation) — or is read VERBATIM when the live epoch carries its
    * clean marker (class doc) and the fold would be an identity —
    * [[KnnGraph.search]] walks it, and `finish` turns the
    * visited rows into the ranked answer. The result is returned
    * MATERIALIZED (persisted + counted) so the walk's checkpoint state
    * releases eagerly; every cache/checkpoint is released on ANY failure
    * path (the [[ArtifactStore.serving]] retry contract); callers
    * `clearCache()` when done. */
  private def distributedWalkServe(spark: SparkSession, ctx: ArtifactStore.Ctx,
      queries: DataFrame, beam: Int, hops: Int, filtered: Boolean = false)
      (finish: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val (degree, _, _, _) = manifest(ctx)
    // CLEAN fast path: on a store whose live epoch is certified clean
    // (class doc — fresh build or nothing mutated since the last
    // compact), the serve-view fold below is an identity recomputed per
    // call over all n × degree edge rows; the marker lets serving read
    // both planes verbatim instead (measured the bulk of the
    // corpus-batch serve: the fold, not the walk, dominated
    // qs33_batch_only pre-r12). Dirty stores take the full fold — same
    // rows by the fold-identity argument, spec-pinned across
    // clean/dirty/re-cleaned states.
    val clean = isClean(ctx)
    // ONE tombstone read feeds both the entry filter and the liveness
    // anti-join (tombstones are broadcast-small by protocol; clean ⇒
    // none exist by definition)
    val tomb = if (clean) None else ArtifactStore.readTombstones(spark, ctx)
    val tombSet: Set[Long] = tomb match {
      case Some(t) => t.select(col("doc_id")).as[Long].collect().toSet
      case None => Set.empty
    }
    // seeding: the unfiltered path seeds every query from the global
    // entry list (KnnGraph.search's cross join); the filtered path joins
    // each query to ITS label's entries by key — the walk then stays
    // inside the query's subgraph on the label-disjoint edge plane
    val seeding: Either[Seq[Long], DataFrame] =
      if (!filtered) {
        val entryIds = liveEntries(spark, ctx, tombSet)
        require(entryIds.nonEmpty,
          s"every entry point of ${ctx.root} is tombstoned — run compact() " +
            "to re-derive entries from the surviving corpus")
        Left(entryIds)
      } else {
        val raw = entryRowsScoped(spark, ctx)
        val live = raw.filterNot(r => tombSet(r._1))
        // loud failure only if the BATCH actually queries a dead label
        // (raw entries exist, all tombstoned) — one tiny job, only when a
        // dead label exists at all; an absent label just serves empty
        val liveLabels = live.map(_._2).toSet
        val deadLabels = raw.map(_._2).distinct.filterNot(liveLabels)
        if (deadLabels.nonEmpty) {
          val hit = queries
            .filter(col("meta").cast("string").isInCollection(deadLabels))
            .limit(1).count()
          require(hit == 0L,
            s"every entry point of label(s) ${deadLabels.mkString(", ")} in " +
              s"${ctx.root} is tombstoned — run compact() to re-derive " +
              "entries from the surviving corpus")
        }
        Right(queries
          .select(col("query_id"), col("meta").cast("string").as("meta"))
          .join(broadcast(live.toDF("vec_id", "meta")), Seq("meta"))
          .select(col("query_id"), col("vec_id")))
      }
    // live vectors: replayed append rows dedup'd, tombstones dropped —
    // the walk's scoring side AND the liveness filter for the edge fold
    // (verbatim when clean: no duplicates or tombstones can exist)
    val liveVecs0 =
      if (clean) vectorBase(spark, ctx).select(col("vec_id"), col("v"))
      else vectorBase(spark, ctx)
        .select(col("vec_id"), col("v"))
        .dropDuplicates("vec_id")
    // r17: BOTH corpus-side relations the walk joins every hop are cached
    // PRE-PARTITIONED BY THEIR JOIN KEY at the width the walk's candidate
    // repartition pins (KnnGraph.walkFrom) — the per-hop keyed joins then
    // reuse the cached partitioning instead of re-shuffling the corpus
    // vectors (payload rows!) and the edge table once per hop (guide
    // §2.4: operations keyed the same way share one exchange). The width
    // is BATCH-ADAPTIVE, never a constant: per-hop work is bounded by
    // batch × beam × degree candidate rows, so the rows-per-task floor
    // (~8k frontier rows per task — ≥ tens of ms of cosine work against
    // ~ms of task dispatch) sizes small batches to few chunky tasks and
    // saturates the cluster (capped at defaultParallelism) as the batch
    // grows. Blanket core-count widening measurably REGRESSED this serve
    // at sf0.1 (scheduler overhead on near-empty tasks — the r16-verdict
    // c8-beats-c32 signature); the one count() job pricing the batch is
    // a scan of the slim query relation.
    val nQ = queries.count()
    val wide = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      ((nQ * beam + 8191) / 8192).toInt))
    val liveVecs = (tomb match {
      case Some(t) => liveVecs0.join(
        broadcast(t.withColumnRenamed("doc_id", "vec_id")), Seq("vec_id"), "left_anti")
      case None => liveVecs0
    }).repartition(wide, col("vec_id")).persist()
    var foldedEdges: DataFrame = null
    try {
      foldedEdges = (
        if (clean)
          // the stored plane IS the serve view: ≤ degree rows per src, no
          // duplicates, no orphan/tombstoned endpoints — read it verbatim
          edgeBase(spark, ctx).select(col("src"), col("dst"))
        else topPerKey(
          edgeBase(spark, ctx)
            .select(col("src"), col("dst"), col("cosine")).distinct()
            .join(liveVecs.select(col("vec_id").as("dst")), Seq("dst"), "left_semi"),
          "src", degree, "dst")
          .select(col("src"), col("dst"))
        ).repartition(wide, col("src")).persist()
      val scope = new graft.core.WalkScope
      try {
        // qv upcast to double like the driver path's typed encoder — a
        // float-array batch must serve bit-identically through both
        val qDf = queries.select(col("query_id"),
          transform(col("qv"), _.cast("double")).as("qv"))
        val visited = seeding match {
          case Right(seeds) =>
            KnnGraph.searchSeeded(liveVecs, foldedEdges, qDf, seeds,
              beam, hops, scope, width = wide)
          case Left(entryIds) =>
            KnnGraph.search(liveVecs, foldedEdges, qDf, entryIds,
              beam, hops, scope, width = wide)
        }
        val out = finish(visited).persist()
        try {
          out.count() // materialize BEFORE releasing the walk's checkpoints
          out
        } catch { case e: Throwable => out.unpersist(); throw e }
      } finally scope.release()
    } finally {
      liveVecs.unpersist()
      if (foldedEdges != null) foldedEdges.unpersist()
    }
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
    * compaction folds fails loudly behind the [[ArtifactStore]] guard.
    *
    * IN-EDGE PRESSURE VALVE: reverse in-edges concentrate on popular
    * nodes, so a long append-only stream grows hub neighbourhoods
    * linearly in appends — serving stays correct (the fold re-truncates
    * per src) but pays the fold on rows compact exists to reclaim. After
    * writing, append counts the stored edge rows of the srcs this batch
    * touched (one partition-pruned job over a bounded id set); when any
    * exceeds `compactFactor × degree`, it runs [[compact]] — the
    * crash-atomic rewrite — so stored neighbourhood footprints stay
    * bounded by `compactFactor × degree` under any append stream.
    * `compactFactor = 0` disables the valve for deploys that schedule
    * compaction on their own cadence. */
  def append(batch: DataFrame, path: String, beam: Int = 32,
      hops: Int = 3, compactFactor: Int = 8): Unit = {
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
      batch.select(col("vec_id")).as[Long], "append batch",
      "split the append into smaller batches (appendStream's micro-batches " +
        "do this naturally) or rebuild the index with build()")
    val present = vectorSlice(spark, ctx, batchIds.toSeq, buckets)
      .select(col("vec_id")).as[Long].collect().toSet
    val freshIds = batchIds.filterNot(present)
    // all ids replayed ⇒ nothing writes ⇒ a clean store STAYS clean
    if (freshIds.isEmpty) return
    // format guard BEFORE the clean revoke: refusing a pre-r13 scoped
    // store must leave it untouched
    manifestMeta(ctx).foreach(_ => requireLabelDisjoint(ctx, "append"))
    // about to mutate the planes: revoke the clean certificate BEFORE the
    // first data write, so a crash mid-append (orphan edges, inflated
    // neighbourhoods) can never serve verbatim (the marker ordering
    // contract — class doc)
    ArtifactStore.revokeClean(ctx)
    // a metadata-scoped store's vector rows carry the meta value — an
    // append must supply the same column ([[IvfIndexStore]]'s contract)
    val metaSel = manifestMeta(ctx).map { m =>
      require(batch.columns.contains(m),
        s"store at $path is metadata-scoped on '$m'; the append batch " +
          s"must carry that column")
      col(m).cast("string").as("meta")
    }.toSeq
    val newVecs = batch
      .filter(col("vec_id").isInCollection(freshIds))
      .select(Seq(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v")) ++ metaSel: _*)
      .persist()
    try {
      val scoped = manifestMeta(ctx).nonEmpty
      val visited: Array[(Long, Long, Double)] =
        if (!scoped)
          searchVisited(spark, ctx,
            newVecs.select(col("vec_id"), col("v"))
              .as[(Long, Seq[Double])].collect(),
            beam, hops)
        else {
          // SCOPED insert (label-disjoint edge plane): each new vector
          // walks ITS OWN label's subgraph, so its edges stay within
          // label by construction. Rows of a label the store has never
          // seen cannot walk (no entries) — they BOOTSTRAP the label's
          // subgraph instead: exact in-batch kNN among themselves (the
          // group is append-cap bounded; cosines through the shared
          // kernels) and the group's `nEntries` lowest ids become the
          // label's entry points, appended BEFORE edges and vectors (a
          // crash leaves an orphan entry the retry heals; an entry
          // without its vector row scores no rows — dead weight, not
          // corruption). A label whose entries are all tombstoned fails
          // loudly inside the walk (run compact() first).
          val rows = newVecs.select(col("vec_id"), col("v"), col("meta"))
            .as[(Long, Seq[Double], String)].collect()
          // total-label contract (build's twin): a null label would
          // "bootstrap" a null subgraph whose pair join drops every row —
          // edgeless, unreachable vectors. Fail loudly instead.
          require(rows.forall(_._3 != null),
            s"append batch has NULL '${manifestMeta(ctx).get}' values; a " +
              "scoped graph store needs every row labelled")
          // a label counts as KNOWN only when at least one of its entry
          // ids has a LANDED vector row — entry rows write first, so a
          // bootstrap that crashed before its vector write leaves
          // all-orphan entries, and classifying on entry EXISTENCE would
          // make the retry walk a vector-less subgraph (visited empty, no
          // edges written: the label would serve its nEntries ids forever).
          // The presence probe is one vbucket-pruned point read over the
          // bounded entry-id set; all-orphan labels re-bootstrap (replayed
          // entry rows dedup at read, compact sweeps the orphans)
          val entryRows = entryRowsScoped(spark, ctx)
          val landed: Set[Long] =
            if (entryRows.isEmpty) Set.empty
            else vectorSlice(spark, ctx, entryRows.map(_._1).distinct, buckets)
              .select(col("vec_id")).as[Long].collect().toSet
          val knownLabels = entryRows.filter(r => landed(r._1)).map(_._2).toSet
          val (existing, fresh) = rows.partition(r => knownLabels(r._3))
          val walked =
            if (existing.isEmpty) Array.empty[(Long, Long, Double)]
            else searchVisited(spark, ctx,
              existing.map(r => (r._1, r._2)), beam, hops,
              Some(existing.map(r => r._1 -> r._3).toMap))
          val bootstrapped =
            if (fresh.isEmpty) Array.empty[(Long, Long, Double)]
            else {
              val (_, _, _, nEntries) = manifest(ctx)
              // entries FIRST (write-order contract above)
              fresh.groupBy(_._3).toSeq.flatMap { case (l, grp) =>
                grp.map(_._1).sorted.take(nEntries).map(id => (id, l))
              }.toDF("vec_id", "meta")
                .coalesce(1).write.mode("append").parquet(ctx.dir("entries"))
              // exact in-batch kNN per new label: the |group|² pair
              // relation (≤ append-cap² rows) is scored via the shared
              // cosine kernels — a broadcast self-join, never a corpus
              // scan — and TRUNCATED to each src's best `degree` IN SPARK
              // (the shared Ranking order, identical to the driver fold
              // below) so only ≤ |group| × degree rows ever reach the
              // driver; collecting the raw pairs would be a 16M-row
              // driver load at the cap
              val freshDf = fresh.toSeq.toDF("vec_id", "v", "meta")
              val lh = freshDf
                .select(col("meta"), col("vec_id").as("query_id"),
                  col("v").as("qv"))
                .withColumn("qnorm", normExpr(col("qv")))
              val rh = freshDf
                .select(col("meta"), col("vec_id"), col("v"))
                .withColumn("vnorm", normExpr(col("v")))
              val pairs = lh.join(broadcast(rh), Seq("meta"))
                .filter(col("query_id") =!= col("vec_id"))
                .select(col("query_id"), col("vec_id"), cosineExpr)
              topPerKey(pairs, "query_id", degree, "vec_id")
                .select(col("query_id"), col("vec_id"), col("cosine"))
                .as[(Long, Long, Double)].collect()
            }
          walked ++ bootstrapped
        }
      // the new node's neighbourhood: its `degree` best visited nodes
      // (self excluded — a replayed insert of an indexed id must not
      // self-link); out-edges + the reverse in-edges (cosine is
      // symmetric) write from one bounded local relation
      val outRows = visited.groupBy(_._1).toSeq.flatMap { case (src, arr) =>
        arr.filter(_._2 != src).toSeq
          .sortWith((a, b) => beats(a._3, a._2, b._3, b._2)).take(degree)
          .map(t => (src, t._2, t._3))
      }
      // one file per touched bucket per append (the batch is bounded) —
      // the build's small-files discipline
      (outRows ++ outRows.map(t => (t._2, t._1, t._3)))
        .toDF("src", "dst", "cosine")
        .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
        .coalesce(1)
        .write.partitionBy("ebucket").mode("append")
        .parquet(ctx.dir("edges"))
      newVecs.withColumn("vnorm", normExpr(col("v")))
        .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
        .coalesce(1)
        .write.partitionBy("vbucket").mode("append")
        .parquet(ctx.dir("vectors"))
      // pressure valve (see the method doc): the touched srcs are the
      // reverse-in-edge receivers — a bounded id set, so the footprint
      // count is one partition-pruned job; the new srcs themselves hold
      // exactly ≤ degree rows and need no check
      if (compactFactor > 0 && outRows.nonEmpty) {
        val touched = outRows.map(_._2).distinct
        val maxPerSrc = edgeSlice(spark, ctx, touched, buckets)
          .groupBy(col("src")).agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).collect()(0).getLong(0)
        if (maxPerSrc > compactFactor.toLong * degree) compact(spark, path)
      }
    } finally newVecs.unpersist()
  }

  /** Streaming maintenance — the graph member of the live-index
    * family (Ivf/Band/Text/Pq appendStream): each micro-batch NSW-inserts
    * its (vec_id, embedding) rows. At-least-once foreachBatch delivery
    * folds to exactly-once indexing WITHOUT batch-id bookkeeping:
    * [[append]]'s vector-row landed marker makes any replayed id an exact
    * no-op (see the class doc), so a restarted query that re-delivers a
    * micro-batch changes nothing.
    *
    * SELF-HEALING on restart: the pressure valve means a compaction can
    * run (and crash) with zero operator involvement, and a crashed fold's
    * live-epoch guard would otherwise make every replayed append throw
    * forever. The stream IS the store's single maintainer by protocol (no
    * concurrent folder exists), so a pending crashed compact at
    * micro-batch time is provably its own — each batch completes it via
    * `compact()` (which recovers from the intact live view) before
    * appending, instead of wedging until a human intervenes. */
  def appendStream(stream: DataFrame, path: String, checkpoint: String,
      beam: Int = 32, hops: Int = 3,
      compactFactor: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (ArtifactStore.crashedCompactPending(b.sparkSession, path))
          compact(b.sparkSession, path)
        append(b, path, beam, hops, compactFactor)
      }
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
    // metadata-scoped stores carry the meta column through the rewrite
    // (dropping it would break queryFiltered after a compact)
    val vecCols = Seq("vec_id", "v", "vnorm") ++
      manifestMeta(ctx).map(_ => "meta").toSeq
    val keptVecs = dropIds(
      spark.read.parquet(ctx.dir("vectors"))
        .select(vecCols.map(col): _*)
        .dropDuplicates("vec_id"), "vec_id").persist()
    keptVecs
      .withColumn("vbucket", pmod(col("vec_id"), lit(buckets.toLong)))
      .repartition(buckets, col("vbucket")) // one file per bucket
      .write.partitionBy("vbucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "vectors"))
    val deduped = spark.read.parquet(ctx.dir("edges"))
      .select(col("src"), col("dst"), col("cosine")).distinct()
    // endpoint liveness by SEMI-JOIN against the kept vector ids (keyed,
    // corpus-sized — fine at compact cadence): keptVecs already excludes
    // tombstoned ids, and it also excludes ORPHAN endpoints (edges whose
    // dst never got its vector row — a crashed append's footprint), which
    // the serve-time fold drops from truncation too; without this an
    // orphan would permanently occupy a degree slot post-compact while
    // serving had already promoted the edge it evicted
    val live = deduped
      .join(keptVecs.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .join(keptVecs.select(col("vec_id").as("src")), Seq("src"), "left_semi")
    topPerKey(live, "src", degree, "dst")
      .withColumn("ebucket", pmod(col("src"), lit(buckets.toLong)))
      .repartition(buckets, col("ebucket")) // one file per bucket
      .write.partitionBy("ebucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "edges"))
    val entryRows = manifestMeta(ctx) match {
      case None =>
        val keptEntries = dropIds(
          spark.read.schema("vec_id BIGINT").parquet(ctx.dir("entries")), "vec_id")
        if (keptEntries.isEmpty)
          keptVecs.select(col("vec_id")).orderBy(col("vec_id")).limit(nEntries)
        else keptEntries
      case Some(_) =>
        // scoped store: entries fold PER LABEL — keep the surviving
        // (vec_id, meta) rows (dedup'd: crashed new-label appends may
        // have replayed entry rows; ORPHAN entries — ids whose bootstrap
        // crashed before the vector write — are swept by the keptVecs
        // semi-join, and the re-derivation below restores entries for
        // any label that kept vectors) and re-derive for any label that
        // still has vectors but lost EVERY entry to tombstones or
        // orphanhood (the per-label transpose of the unscoped
        // re-derivation)
        val keptEntries = dropIds(
          spark.read.schema("vec_id BIGINT, meta STRING")
            .parquet(ctx.dir("entries")).distinct(), "vec_id")
          .join(keptVecs.select(col("vec_id")), Seq("vec_id"), "left_semi")
        val byLabel = org.apache.spark.sql.expressions.Window
          .partitionBy(col("meta")).orderBy(col("vec_id"))
        // rank a SLIM (vec_id, meta) projection — build's discipline: the
        // per-label window sorts one task per dead label, and shipping
        // the v/vnorm payloads through that sort would make a single
        // all-tombstoned label sort its full embeddings in one task at
        // scale (r13 advice)
        val rederived = keptVecs.select(col("vec_id"), col("meta"))
          .join(keptEntries.select(col("meta")).distinct(), Seq("meta"), "left_anti")
          .withColumn("rnk", row_number().over(byLabel))
          .filter(col("rnk") <= nEntries)
          .select(col("vec_id"), col("meta"))
        keptEntries.union(rederived)
    }
    entryRows.coalesce(1).write.mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "entries"))
    keptVecs.unpersist()
    // the rewrite above IS the serve-view fold, so epoch+1 is clean by
    // construction: stage its marker now (inert until the commit flips
    // the live epoch — a crash before commit leaves the pre-compact view
    // with its own marker state untouched)
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, Components)
    ArtifactStore.retireCleanMarker(ctx)
  }
}
