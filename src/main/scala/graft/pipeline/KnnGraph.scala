package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbour search — the
  * navigable-small-world family (NSW; HNSW minus the level hierarchy),
  * completing the index-paradigm matrix next to IVF (qs02/qs04), PQ
  * (qs07), int8 (qs05), sign sketches (qs11) and LSH (qd02): a
  * bounded-degree kNN graph over the corpus plus a beam search that, per
  * hop, touches only `frontier × degree` candidate rows — after the
  * one-off build, query cost is independent of corpus size.
  *
  * Scale shape (the 100 TB story):
  *  - **Build is never all-pairs.** Candidate generation is cell-blocked
  *    (each vector posts to its `assign` nearest IVF cells; pairs form
  *    only within a cell — the same bounded-blocking discipline as the
  *    qd02 LSH bands and the qs02 IVF probe), then ONE neighbour-of-
  *    neighbour refinement round (NN-descent's core step) which touches
  *    ≤ n × degree² keyed-join rows. Everything is an equi-join on
  *    `cell` / `src` / `dst`; per-node truncation is the bounded
  *    [[graft.functions.TopKByScore]] aggregator — no window, no sort of
  *    a full candidate set anywhere.
  *  - **Assignment is two-level, so it stays sub-quadratic.** The cell
  *    count k scales as n/400 (a FIXED k would make the in-cell pair join
  *    Σ cell² = quadratic), which means a flat per-vector scan of all k
  *    centroids would itself be O(n·k·dim) = O(n²·dim/400). Instead the
  *    ⌈√k⌉ lowest-id centroids double as COARSE routing seeds: each
  *    vector ranks the seeds (O(√k·dim)), then scans only the nearest
  *    probed seeds' fine-centroid groups (expected O(√k·dim) more) —
  *    O(n·√k·dim) assignment overall. The broadcast still carries all k
  *    fine centroids (an IVF codebook's footprint — k·dim doubles); the
  *    per-task SCAN, the quadratic term, is what the two levels remove.
  *  - **Search moves only the frontier.** The graph (n × degree edge
  *    rows, partitioned by `src`) stays put; each hop joins the
  *    ≤ queries × beam frontier against it by key, anti-joins the
  *    visited set, and rescores ≤ queries × beam × degree rows against
  *    the broadcast query table. Visited state is bounded by
  *    queries × (entries + hops × beam × degree).
  *
  * Determinism: candidate cosines are fixed left-fold expressions (the
  * same hoisted-norm kernel as the qs ANN paths — norms projected once
  * per side, never per pair), all truncations order by (cosine DESC,
  * vec_id ASC), and entry points are pinned ids — so the graph, the
  * walk, and the final ranking are reproducible across partitionings.
  */
object KnnGraph {

  private def vdot(x: Column, y: Column): Column =
    graft.functions.expressions.VectorExpressions.vecDot(x, y)

  /** Same hoisted-norm discipline as PipelineQueries: the norm is the
    * identical sqrt-of-left-fold expression projected once per relation,
    * so cosines match the inline form bit-for-bit. */
  private def hoist(df: DataFrame, vcol: String, name: String): DataFrame =
    df.withColumn(name, sqrt(vdot(col(vcol), col(vcol))))

  private val cosineHoisted: Column =
    vdot(col("qv"), col("v")) / (col("qnorm") * col("vnorm"))

  /** One truncation contract for the whole engine —
    * [[graft.functions.Ranking]] (score DESC, id ASC). */
  private def topPerKey(scored: DataFrame, key: String, k: Int,
      idCol: String): DataFrame =
    graft.functions.Ranking.topPerKey(scored, key, k, idCol)

  /** Coarse cells probed per vector before the fine scan stops widening
    * (in (distance, seed-index) order) — covers vectors whose true
    * nearest fine cells straddle coarse boundaries. MEASURED: at 3 the
    * pinned geometries hold avg/min 1.000 at every SF on all of
    * qs27/qs29/qs30; at 2 the qs30 filtered walk (the tightest consumer
    * of graph quality) drops to avg 0.98 / min 0.90 at sf0.1. The margin
    * probes (GraphAnnProbeMain / GraphDeleteProbeMain /
    * GraphFilteredProbeMain) re-measure recall under this constant at
    * every SF; run them before shrinking it. */
  private val MinCoarseProbe = 3

  /** Build a bounded-out-degree kNN graph over `e` (`vec_id`, `v`) rows.
    *
    * `cents` is the blocking-centroid RELATION — (vec_id, v) rows,
    * deterministic `vec_id < K` corpus rows or a [[KMeans.fit]] result
    * lifted to a DataFrame; each vector posts to its `assign` nearest
    * cells (multi-assignment supplies the cross-cell edges that keep the
    * graph navigable), pairs form within cells, and one NN-descent round
    * (neighbours-of-neighbours, ≤ degree² candidates per node) repairs
    * neighbourhoods the cell blocking split. Returns (src, dst, cosine)
    * with ≤ `degree` rows per src, ordered (cosine DESC, dst ASC) within
    * each src by the aggregator contract.
    *
    * Cell assignment is TWO-LEVEL (see the class doc's scale shape): the
    * ⌈√k⌉ lowest-id centroids double as coarse routing seeds, every
    * centroid is routed under its nearest seed, and a vector scans only
    * the [[MinCoarseProbe]]-or-more nearest seeds' fine groups (widening
    * deterministically until the probed groups pool ≥ `assign` fine
    * candidates, which guards arbitrarily skewed routings). Because the
    * cell count k is FORCED to scale as n/400, nothing corpus-proportional
    * may ever sit on the driver or in a broadcast: the driver holds only
    * the ⌈√k⌉ coarse seeds plus the ⌈√k⌉ per-seed group SIZES (the
    * widening rule needs cardinalities, not centroids), the fine
    * centroids stay a seed-keyed RELATION, vectors post map-side to their
    * probed seeds against the √k-sized broadcasts, and a keyed equi-join
    * on `seed` scores only the probed fine groups — a shuffle of
    * O(n · MinCoarseProbe) slim rows replaces the old all-k broadcast
    * (which re-grew as corpus/400 — ~250 GB per executor at a 100 TB
    * corpus). The probed pool makes the `assign` cells a vector posts to
    * APPROXIMATE — the NN-descent round and the walk's measured recall
    * margins absorb that, exactly like every other bounded-blocking
    * choice here. Deterministic end to end AND bit-identical to the old
    * driver-side widening scan: routing ties break toward the lowest seed
    * index ([[KMeans.nearest]]), the probed-seed prefix is the same
    * (L2², seed-index) order under the same widening rule (group sizes
    * substitute exactly for pooled-candidate counts), fine ranking is
    * (L2² ASC, id ASC) via the shared [[graft.functions.Ranking]] order
    * on the negated distance ([[VecL2Sq]] computes the identical IEEE
    * left fold), and L2² ranks identically to L2 (sqrt is monotone). */
  def build(e: DataFrame, cents: DataFrame, assign: Int,
      degree: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val centDs = cents.select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
    val k = centDs.count()
    require(k > 0, "empty centroid relation")
    val nCoarse = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // the ONLY centroid rows the driver ever holds: O(√k · dim)
    val coarseSeeds: Array[Array[Double]] = centDs
      .orderBy(col("vec_id")).limit(nCoarse)
      .collect().sortBy(_._1).map(_._2.toArray)
    val bcSeeds = spark.sparkContext.broadcast(coarseSeeds)
    // route each fine centroid under its nearest coarse seed (ties toward
    // the lowest seed index) — a seed-keyed RELATION, never collected
    val fine = centDs
      .map { case (fid, fv) => (KMeans.nearest(bcSeeds.value, fv), fid, fv) }
      .toDF("seed", "fid", "fv")
      .persist() // sized below + the assignment equi-join
    // per-seed group sizes: √k longs — all the widening rule needs
    val groupSizes: Array[Long] = {
      val a = Array.fill(nCoarse)(0L)
      fine.groupBy(col("seed")).count().as[(Int, Long)].collect()
        .foreach { case (s, n) => a(s) = n }
      a
    }
    val bcSizes = spark.sparkContext.broadcast(groupSizes)
    // local copy: referencing the object field from inside the flatMap
    // closure would capture the (non-serializable) module instance
    val minCoarseProbe = MinCoarseProbe
    def l2sq(v: Seq[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < c.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    // the probed-seed PREFIX of the old widening scan: same
    // (L2², seed-index) order, same stop rule — the pooled-candidate
    // count after p groups IS the sum of their sizes, so the prefix is
    // bit-identical to what the driver-side pool would have scanned
    def probedSeeds(v: Seq[Double], n: Int): Seq[Int] = {
      val seeds = bcSeeds.value
      val sizes = bcSizes.value
      val order = seeds.indices.map(j => (l2sq(v, seeds(j)), j)).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var pooled = 0L
      val it = order.iterator
      while (it.hasNext && (out.length < minCoarseProbe || pooled < n)) {
        val j = it.next()._2
        out += j
        pooled += sizes(j)
      }
      out.toSeq
    }
    // map-side posting against the √k-sized broadcasts, then the keyed
    // equi-join scores ONLY the probed fine groups (the shuffle that
    // replaced the all-k broadcast); per-vector top-`assign` by
    // (L2² ASC, fid ASC) through the shared Ranking order on -L2²
    // (negation is exact for doubles, so the order is exactly reversed)
    val postedSeeds = e.select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .flatMap { case (id, v) => probedSeeds(v, assign).map(j => (id, v, j)) }
      .toDF("vec_id", "v", "seed")
    val fineScored = postedSeeds.join(fine, Seq("seed"))
      .select(col("vec_id"), col("fid"),
        negate(graft.functions.expressions.VectorExpressions
          .vecL2Sq(col("v"), col("fv"))).as("negd"))
    val cells = graft.functions.Ranking
      .topPerKey(fineScored, "vec_id", assign, "fid", "negd")
      .select(col("vec_id"), col("fid").as("cell"))
    edgesFromCells(e, cells, degree, fine)
  }

  /** Build a LABEL-DISJOINT bounded-degree kNN graph — one independent
    * subgraph per meta value, in ONE distributed pass (the r13 scoped
    * graph store's engine): `e` and `cents` rows carry a `meta` column,
    * the two-level assignment runs PER LABEL (each label's coarse seeds =
    * the ⌈√k_l⌉ lowest-id members of its own centroid set; routing,
    * sizing and the widening rule are [[build]]'s exactly, keyed by
    * (meta, seed)), and everything downstream of assignment is [[build]]'s
    * shared stage UNCHANGED — because a fine centroid's id (`fid`)
    * belongs to exactly one label, cells are label-unique BY ID, so the
    * in-cell pair join and the NN-descent round never produce a
    * cross-label edge without ever mentioning meta. Driver state: one
    * Σ_l ⌈√k_l⌉ seed map (≈ √(k·L) rows for balanced labels) + the
    * per-(label, seed) group sizes — never anything corpus-proportional.
    * Each label's subgraph is EXACTLY what [[build]] would produce on
    * that label's sub-corpus with its sub-centroids (the per-label
    * stages read only same-label rows).
    *
    * CONTRACT: every `e` row's meta must appear in `cents` (in particular
    * no NULL metas — the centroid equi-joins drop null keys, leaving the
    * row's per-label seed lookup empty). [[graft.sinks.GraphIndexStore]]
    * enforces this loudly at build/append entry. */
  def buildScoped(e: DataFrame, cents: DataFrame, assign: Int,
      degree: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val centDs = cents.select(col("meta"), col("vec_id"), col("v"))
      .as[(String, Long, Seq[Double])]
    // per-label centroid counts — L rows on the driver (the tenant/label
    // case; meta domains are enumerable by the scoped-store contract)
    val kByLabel: Map[String, Long] = centDs
      .groupByKey(_._1).count().collect().toMap
    require(kByLabel.nonEmpty, "empty centroid relation")
    val nCoarseOf: Map[String, Int] = kByLabel.map { case (l, k) =>
      l -> math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt) }
    val bcNCoarse = spark.sparkContext.broadcast(nCoarseOf)
    // per-label coarse seeds: the ⌈√k_l⌉ lowest-id centroids of each
    // label, selected DISTRIBUTED (per-label rank, no corpus collect) —
    // the driver holds Σ_l √k_l seed rows
    val seedRows = centDs
      .groupByKey(_._1)
      .flatMapGroups { (l, rows) =>
        // per-label bounded selection: keep the nCoarse lowest ids via a
        // size-capped buffer (labels are corpus/L-sized; the buffer is √k_l)
        val n = bcNCoarse.value(l)
        val best = scala.collection.mutable.PriorityQueue
          .empty[(Long, Seq[Double])](Ordering.by(_._1)) // max-heap on id
        rows.foreach { case (_, id, v) =>
          if (best.size < n) best.enqueue((id, v))
          else if (id < best.head._1) { best.dequeue(); best.enqueue((id, v)) }
        }
        best.toSeq.sortBy(_._1).map { case (id, v) => (l, id, v) }
      }.collect()
    val seedsOf: Map[String, Array[Array[Double]]] = seedRows
      .groupBy(_._1).map { case (l, arr) =>
        l -> arr.sortBy(_._2).map(_._3.toArray) }
    val bcSeeds = spark.sparkContext.broadcast(seedsOf)
    // route each fine centroid under (its label, its label's nearest seed)
    val fine = centDs
      .map { case (l, fid, fv) =>
        (l, KMeans.nearest(bcSeeds.value(l), fv), fid, fv) }
      .toDF("meta", "seed", "fid", "fv")
      .persist() // sized below + the assignment equi-join
    // per-(label, seed) group sizes — Σ_l √k_l longs
    val sizesOf: Map[String, Array[Long]] = {
      val raw = fine.groupBy(col("meta"), col("seed")).count()
        .as[(String, Int, Long)].collect()
      val m = nCoarseOf.map { case (l, n) => l -> Array.fill(n)(0L) }
      raw.foreach { case (l, s, n) => m(l)(s) = n }
      m
    }
    val bcSizes = spark.sparkContext.broadcast(sizesOf)
    val minCoarseProbe = MinCoarseProbe
    def l2sq(v: Seq[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < c.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    // [[build]]'s probed-seed prefix, per label — same (L2², seed-index)
    // order and widening rule against the label's own seeds and sizes
    def probedSeeds(l: String, v: Seq[Double], n: Int): Seq[Int] = {
      val seeds = bcSeeds.value(l)
      val sizes = bcSizes.value(l)
      val order = seeds.indices.map(j => (l2sq(v, seeds(j)), j)).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var pooled = 0L
      val it = order.iterator
      while (it.hasNext && (out.length < minCoarseProbe || pooled < n)) {
        val j = it.next()._2
        out += j
        pooled += sizes(j)
      }
      out.toSeq
    }
    val postedSeeds = e.select(col("meta"), col("vec_id"), col("v"))
      .as[(String, Long, Seq[Double])]
      .flatMap { case (l, id, v) =>
        probedSeeds(l, v, assign).map(j => (l, id, v, j)) }
      .toDF("meta", "vec_id", "v", "seed")
    val fineScored = postedSeeds.join(fine, Seq("meta", "seed"))
      .select(col("vec_id"), col("fid"),
        negate(graft.functions.expressions.VectorExpressions
          .vecL2Sq(col("v"), col("fv"))).as("negd"))
    val cells = graft.functions.Ranking
      .topPerKey(fineScored, "vec_id", assign, "fid", "negd")
      .select(col("vec_id"), col("fid").as("cell"))
    edgesFromCells(e.select(col("vec_id"), col("v")), cells, degree, fine)
  }

  /** The shared post-assignment stage of [[build]] / [[buildScoped]]:
    * in-cell pair scoring, per-src truncation, one NN-descent round.
    * `fine` is passed only to release its cache once the assignment join
    * has been materialized. */
  private def edgesFromCells(e: DataFrame, cells: DataFrame, degree: Int,
      fine: DataFrame): DataFrame = {
    val posted = hoist(
      e.select(col("vec_id"), col("v")).join(cells, Seq("vec_id"))
        .select(col("vec_id"), col("v"), col("cell")), "v", "vnorm")
      .persist() // both sides of the in-cell pair join
    posted.count() // materialize: downstream plans read the cached relation
    fine.unpersist() // consumed by the assignment join above
    val left = posted.select(col("cell"), col("vec_id").as("src"),
      col("v").as("qv"), col("vnorm").as("qnorm"))
    val right = posted.select(col("cell"), col("vec_id").as("dst"),
      col("v"), col("vnorm"))
    // in-cell candidates, scored in the join, truncated with the dedup
    // FUSED into the aggregation (topPerKeyDistinct): a pair that met in
    // both shared cells carries the identical deterministic cosine, so
    // the fused dedup is row-identical to the old distinct()-then-topK —
    // minus a full shuffle of the pair relation (the build's largest),
    // since the aggregator's map-side partial truncates each partition to
    // ≤ degree rows per src before the exchange
    val cellCand = left.join(right, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosineHoisted.as("cosine"))
    val edges0 = graft.functions.Ranking
      .topPerKeyDistinct(cellCand, "src", degree, "dst").persist()
    edges0.count() // materialize before the two self-join uses below
    // one NN-descent round: src→mid→dst two-hop candidates, rescored via
    // keyed joins against the corpus vectors (vnorm hoisted once — never
    // recomputed per pair), unioned with the round-0 scores, re-truncated.
    // The two-hop relation KEEPS its pre-join distinct: a pair reachable
    // via several mids would otherwise replicate through the rescore joins
    // — which carry the vector payload and are not broadcasts at corpus
    // scale — so deduping the 16-byte pair rows first shuffles strictly
    // fewer bytes (a union-side dup, by contrast, costs nothing extra: it
    // dies in the fused aggregation below)
    val twoHop = edges0.select(col("src"), col("dst").as("mid"))
      .join(edges0.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    // one exact row per vec_id straight off the corpus relation (e is
    // unique by vec_id by the build contract): the old posted.distinct()
    // paid a shuffle to recover exactly this, with the identical v and
    // the identical hoisted-vnorm expression
    val vecs = hoist(e.select(col("vec_id"), col("v")), "v", "vnorm")
    val rescored = twoHop
      .join(vecs.select(col("vec_id").as("src"), col("v").as("qv"),
        col("vnorm").as("qnorm")), Seq("src"))
      .join(vecs.select(col("vec_id").as("dst"), col("v"), col("vnorm")),
        Seq("dst"))
      .select(col("src"), col("dst"), cosineHoisted.as("cosine"))
    val refined = graft.functions.Ranking.topPerKeyDistinct(
      edges0.select(col("src"), col("dst"), col("cosine")).union(rescored),
      "src", degree, "dst")
    refined
  }

  /** Beam search over a built graph. `queries` rows are
    * (query_id, qv); `entries` are the pinned entry-point vec_ids. Per
    * hop: expand the frontier along graph edges (keyed join on src),
    * drop already-visited nodes (anti-join), score survivors against the
    * broadcast query table, keep the per-query best `beam` NEW nodes as
    * the next frontier. Returns every visited (query_id, vec_id, cosine)
    * — callers rank or filter it (top-k, range, recall gates).
    *
    * The per-hop checkpoints register with `scope`; callers that need
    * deterministic memory discipline (services, specs) pass their own
    * [[graft.core.WalkScope]] and `release()` it after materializing the
    * result — with the default scope the blocks are freed lazily by the
    * GC-driven ContextCleaner once the result's references drop. */
  def search(e: DataFrame, edges: DataFrame, queries: DataFrame,
      entries: Seq[Long], beam: Int, hops: Int,
      scope: graft.core.WalkScope = new graft.core.WalkScope,
      width: Int = 0): DataFrame = {
    val ev = hoist(e.select(col("vec_id"), col("v")), "v", "vnorm")
    val q = hoist(queries.select(col("query_id"), col("qv")), "qv", "qnorm")
    // entry scoring: |entries| × |queries| rows — bounded, broadcast side
    val entryScored = ev.filter(col("vec_id").isInCollection(entries))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
    walkFrom(ev, edges, q, entryScored, beam, hops, scope, width)
  }

  /** [[search]] with PER-QUERY entry points: `seeds` is a
    * (query_id, vec_id) relation naming each query's own seed set — the
    * scoped graph store's seeding shape (each query starts from its own
    * label's entries; on a label-disjoint edge plane the walk then never
    * leaves the query's subgraph without any per-hop meta check). Entry
    * scoring is a keyed join instead of [[search]]'s cross join; every
    * hop after that is the identical shared loop, so the two variants
    * return bit-identical rows whenever `seeds` equals the cross product.
    * `seeds` must be broadcast-small (labels × entries by the scoped
    * store's contract). */
  def searchSeeded(e: DataFrame, edges: DataFrame, queries: DataFrame,
      seeds: DataFrame, beam: Int, hops: Int,
      scope: graft.core.WalkScope = new graft.core.WalkScope,
      width: Int = 0): DataFrame = {
    val ev = hoist(e.select(col("vec_id"), col("v")), "v", "vnorm")
    val q = hoist(queries.select(col("query_id"), col("qv")), "qv", "qnorm")
    val entryScored = ev
      .join(broadcast(seeds.select(col("query_id"), col("vec_id"))), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
    walkFrom(ev, edges, q, entryScored, beam, hops, scope, width)
  }

  /** The shared hop loop behind [[search]] / [[searchSeeded]] — takes the
    * already-scored entry frame and walks.
    *
    * `width` > 0 pins the per-hop SCORE join to that many partitions on
    * the join key (r17): the candidate pairs are KB-scale slim rows, so
    * AQE's bytes-based coalescing folds their exchange to ONE partition —
    * and the expensive stage downstream (the cosine projection over
    * candidates × vector payloads) then runs on one task whatever the
    * cluster width (measured: ~0.9 s serial per hop on the sf0.1 corpus
    * batch). Callers size `width` to the BATCH (rows-per-task floor, the
    * r16-verdict lesson: blanket core-count widening just buys scheduler
    // overhead on small inputs) and pre-partition the vector/edge
    * relations by the same (key, width) so the per-hop joins reuse the
    * cached partitioning — see [[graft.sinks.GraphIndexStore]]'s
    * distributedWalkServe. `width` = 0 (the default — small driver-side
    * walks, specs) keeps AQE's own sizing; rows are identical either way
    * (partitioning never changes values; ranking is total-order
    * deterministic). */
  private def walkFrom(ev: DataFrame, edges: DataFrame, q0: DataFrame,
      entryScored: DataFrame, beam: Int, hops: Int,
      scope: graft.core.WalkScope, width: Int): DataFrame = {
    // the query table is BROADCAST-joined once per hop, and each hop is a
    // separate action — without a persist each hop's broadcast build
    // re-runs the query-side scan + norm projection from scratch
    // (measured: ~0.1-0.2 s × (hops+1) extra jobs on the corpus batch).
    // CacheManager-level persist: a caller's clearCache() or the scope's
    // release() frees it
    val q = scope.persist(q0)
    val edgeTab = edges.select(col("src"), col("dst"))
    var visited = scope.checkpoint(entryScored
      ) // TRUNCATE lineage, not just cache it: each
    // hop's plan embeds the previous hops' plans (and a persisted
    // relation still PRINTS its full child tree), so with plain persist
    // the composite tree — and every per-action analysis pass and plan
    // string over it — grows EXPONENTIALLY in hops (measured: a 500-row
    // walk spent tens of seconds in Catalyst re-analysis, and a long
    // call chain OOM'd the driver building a plan string). After the
    // checkpoint each hop starts from an O(1) LogicalRDD over the
    // materialized rows; `visited` stays a lazy union of those. The
    // checkpointed rows are the walk's frontier state — bounded by
    // queries × beam × degree per hop at ANY corpus size
    var frontier = visited.select(col("query_id"), col("vec_id"))
    for (_ <- 1 to hops) {
      // join strategies stay UNHINTED deliberately (measured, r17): the
      // planner/AQE broadcast the frontier / vector / visited sides when
      // their runtime sizes are small and fall back to shuffle joins past
      // the threshold — forcing SHUFFLE_HASH here regressed the sf0.1
      // corpus batch (it turned cheap broadcasts into per-hop shuffles)
      // while buying nothing at scale that the planner would not choose
      // itself.
      val cand0 = frontier
        .join(edgeTab, frontier("vec_id") === edgeTab("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
      // width-pinned: ONE user exchange per hop establishes
      // (query_id, vec_id) × width and the dedup AND the visited
      // anti-join both ride it (grouping/join keys == partitioning keys,
      // so no further exchange) — the per-hop candidate relation is
      // KB-scale slim rows, so AQE's bytes-based coalescing would
      // otherwise fold the stage to ONE task and the downstream cosine
      // projection (the hop's CPU cost) would run serially whatever the
      // cluster width (measured ~0.9 s/hop at sf0.1). `width` is
      // batch-adaptive (caller doc above), which AQE respects.
      val cand =
        (if (width > 0) cand0.repartition(width, col("query_id"), col("vec_id"))
         else cand0)
        .distinct()
        .join(visited.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
      val scoredPlan = cand
        .join(ev, Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      // plan-skeleton debug hook (probe mains only; unset in Bench/Verify)
      if (sys.env.contains("GRAFT_WALK_EXPLAIN"))
        System.err.println("[walk-hop-plan]\n" + scoredPlan.queryExecution.executedPlan)
      val scored = scope.checkpoint(scoredPlan
        ) // lineage cut per hop — see the entry note
      // visited stays a LAZY union of the checkpointed per-hop relations:
      // each child is already materialized, so downstream reads hit
      // ≤ hops+1 tiny scans and the per-hop job count stays at one
      visited = visited.union(scored)
      frontier = topPerKey(scored, "query_id", beam, "vec_id")
        .select(col("query_id"), col("vec_id"))
    }
    visited
  }
}
