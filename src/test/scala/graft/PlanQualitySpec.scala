package graft

import graft.relational.QueryCatalog
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the 100 TB discipline checks: filters reach the
  * parquet scan, projections prune the read schema, small dimensions
  * broadcast, top-k never globally sorts. These pin the *plan*, so a
  * regression in pushdown or join strategy fails CI even though results
  * stay correct. */
class PlanQualitySpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = QueryCatalog.byName(name).build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // queries may persist() intermediates (same contract as Verify/Bench:
    // caller clears the cache); the memory-discipline suites assert a
    // clean slate, so release here
    spark.catalog.clearCache()
    plan
  }

  test("q05 filter+projection push into the parquet scan") {
    val plan = planOf("q05_filter_project")
    assert(plan.contains("PushedFilters: ["), "expected pushed filters")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,48.0)"),
      s"quantity filter must reach the scan:\n$plan")
    // projection pruning: only the 4 selected + filter columns are read
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => !s.contains("l_extendedprice") && !s.contains("l_shipdate")),
      s"scan must prune unused columns, got $readSchema")
  }

  test("q02 broadcasts the small dimension tables") {
    val plan = planOf("q02_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), "nation/region joins must broadcast")
  }

  test("q03 top-k uses TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q03_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT after ORDER BY must compile to top-k:\n${plan.take(2000)}")
  }

  test("q01 aggregates with map-side partials") {
    val plan = planOf("q01_pricing_summary")
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, "expected partial + final hash aggregation")
  }

  test("q06 reads only the three columns it needs") {
    val plan = planOf("q06_selective_revenue")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(Seq("l_quantity", "l_discount", "l_extendedprice").forall(readSchema.contains))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"column pruning failed: $readSchema")
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // the 100 TB fact-fact join story: bucket both sides on the join key
    // and the shuffle disappears entirely
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previous JVM's metastore may be gone while the data dir remains
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val p = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (p.exists()) { import scala.reflect.io.Directory; new Directory(p).deleteRecursively() }
    }
    graft.relational.QueryHelpers.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    graft.relational.QueryHelpers.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    // force the shuffle-join path (broadcast would win at this toy size
    // and hide what bucketing buys on a fact-fact join)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("qs01 broadcasts the query vectors (no shuffle of the corpus)") {
    val plan = planOf("qs01_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "ANN scan side must join against broadcast queries")
  }

  test("ANN final ranking is a bounded top-k aggregation, not a per-query window sort") {
    // row_number() over (partition by query_id) sorts EVERY surviving
    // candidate of a query in one task — at 100 TB with few queries that is
    // a single-task sort of ~nprobe/K of the corpus. The TopKByScore
    // aggregator must appear as partial+final ObjectHashAggregate instead
    // (map-side partials bound memory and the shuffle to partitions × k).
    for (q <- Seq("qs01_ann_topk", "qs02_ann_ivf", "qs03_ann_ivf_recall", "qs04_ann_batch",
                  "qs05_ann_int8_rerank", "qs06_hard_negatives", "qs07_ann_pq_rerank",
                  "qs08_hybrid_rank", "qs11_sign_sketch_rerank",
                  "qs12_filtered_ann")) {
      val plan = planOf(q)
      assert(!plan.contains("Window"), s"$q must not window-sort candidates:\n${plan.take(1500)}")
      assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
        s"$q needs partial + final top-k aggregation:\n${plan.take(1500)}")
    }
  }

  test("qs03 trained-IVF probe join stays keyed by cell (no cartesian fallback)") {
    val plan = planOf("qs03_ann_ivf_recall")
    assert(plan.contains("cell"), "probe join must be keyed by the trained IVF cell")
    // the only BroadcastNestedLoopJoin allowed is qs01's truth sub-plan
    // (exact brute force against 5 broadcast queries); the probe side must
    // never go cartesian, so at most that one may appear
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
      s"IVF probe must stay an equi-join on cell:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the 100 TB fact-dim join lever beyond broadcast: when the dim side is
    // selective but too big to broadcast, Catalyst injects a runtime bloom
    // filter on the fact side's join key so the scan drops non-matching
    // rows before the shuffle. Thresholds are scaled to fixture size; the
    // pin is that the optimizer CAN inject it on our join shape (a plain
    // declarative equi-join — no hand-scheduling required).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.get(k))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = graft.relational.QueryHelpers.table(spark, dir, "lineitem")
      val o = graft.relational.QueryHelpers.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on l_orderkey:\n${plan.take(1500)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("qs04 batch ANN candidates come from a cell equi-join, never cartesian") {
    // every vector queries the index: the query set is corpus-sized, so
    // candidate generation must be a keyed join on the IVF cell (AQE may
    // still broadcast at toy SFs — the pin is the join KEY, not the
    // physical strategy, which is size-dependent by design)
    val plan = planOf("qs04_ann_batch")
    assert(plan.contains("cell"), "candidate join must be keyed by cell")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"batch ANN must never go cartesian:\n${plan.take(1500)}")
  }

  test("qs24 store batch serving keys candidates by cell — no cartesian, no per-query window") {
    // qs04's plan served from the persistent IVF artifact: the
    // corpus-sized query batch joins the pruned postings by the cell key
    // (the join KEY is the pin — AQE may broadcast at toy SFs), ranking
    // is the bounded top-k aggregator, and the probe-cell filter reaches
    // the postings scan as a PartitionFilter even at batch scale
    val plan = planOf("qs24_index_batch_serve")
    assert(plan.contains("cell"), "candidate join must be keyed by cell")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"store batch serving must never go cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      "ranking must be the bounded top-k aggregator, not a per-query window")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "the probe-cell filter must prune partitions at batch scale")
  }

  test("qt06 top-bigram statistic is hash aggregations, never a per-doc scan or window") {
    // the tempting formulations are quadratic (a per-row O(distinct × n)
    // expression over the token array) or a per-doc window sort of bigram
    // counts — both die on 10k-token web documents. The pin: bigrams
    // explode to rows and reduce through partial+final hash aggregation,
    // with no Window anywhere in the plan.
    val plan = planOf("qt06_repetition")
    assert(!plan.contains("Window"), s"qt06 must not window-sort bigrams:\n${plan.take(1500)}")
    assert("HashAggregate".r.findAllIn(plan).length >= 4,
      s"qt06 needs partial+final aggregation for count and max:\n${plan.take(1500)}")
  }

  test("qs40 MaxSim store serving prunes cell partitions — no cartesian, no per-query window") {
    // the multi-vector serve: probe table broadcast onto the pruned
    // posting scan (cell equi-join), the fully codegen'd maxsim
    // expression, and the bounded top-k aggregator as the finisher
    val plan = planOf("qs40_maxsim_index_serve")
    assert(plan.contains("cell"), "candidate join must be keyed by cell")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"MaxSim serving must never go cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      "ranking must be the bounded top-k aggregator, not a per-query window")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "the probe-cell filter must prune partitions")
  }

  test("qs41 filtered MaxSim serving prunes BOTH partition axes and joins both keys") {
    val plan = planOf("qs41_maxsim_filtered_serve")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"filtered MaxSim serving must never go cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      "ranking must be the bounded top-k aggregator, not a per-query window")
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*meta".r.findFirstIn(plan).isDefined
      || "PartitionFilters: \\[[^\\]]*meta[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"the scoped plane must prune cell AND meta partitions:\n${plan.take(1500)}")
  }

  test("qs44 distributed RRF fusion is window-free and never cartesian") {
    // the eval-set hybrid: both store legs finish through the bounded
    // top-k aggregator, the fusion is a keyed (query_id, doc_id)
    // full-outer join of batch×topK-row relations, and the final rank
    // is again the bounded aggregator — a million-query eval set must
    // never hit a per-query window or an all-pairs form
    val plan = planOf("qs44_rrf_batch_serve")
    assert(!plan.contains("Window"),
      s"fusion ranking must be the bounded top-k aggregator:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fusion must stay keyed on (query_id, doc_id):\n${plan.take(1500)}")
  }

  test("qs45 filtered hybrid fusion is window-free and never cartesian") {
    // the multi-tenant hybrid: tenant-scoped BM25 leg + lang-scoped IVF
    // leg + distributed fusion — three bounded top-k aggregations and
    // keyed joins end to end; a window or an all-pairs form anywhere
    // would break the million-query eval-set story
    val plan = planOf("qs45_rrf_filtered_serve")
    assert(!plan.contains("Window"),
      s"every ranking must be the bounded top-k aggregator:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fusion must stay keyed:\n${plan.take(1500)}")
  }

  test("qd08 span dedup keys everything by span hash — never cartesian, never a window") {
    // span-level exact dedup must stay in the qd02 row class: positions
    // become (doc_id, hash60) pairs via explode, the duplicate set is a
    // hash aggregation over h, and the join back is keyed by h (broadcast
    // when small, shuffle when not) — never an all-pairs/cartesian form
    // and never a per-doc window over positions
    val plan = planOf("qd08_dup_spans")
    assert(!plan.contains("CartesianProduct"),
      s"qd08 must never go cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"qd08 must not window positions:\n${plan.take(1500)}")
    assert(plan.contains("Generate"),
      s"spans must explode to hashed rows (Generate):\n${plan.take(1500)}")
  }

  test("qd09 block dedup stays in the hashed-row class: no cartesian, no window") {
    // C4-style block removal is the same economics as qd08: blocks become
    // (doc_id, h, blen) rows via one explode, boilerplate is a hash
    // aggregation over h, and the accounting join is keyed by h
    val plan = planOf("qd09_block_dedup")
    assert(!plan.contains("CartesianProduct"),
      s"qd09 must never go cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"qd09 must not window blocks:\n${plan.take(1500)}")
    assert(plan.contains("Generate"),
      s"blocks must explode to hashed rows (Generate):\n${plan.take(1500)}")
  }

  test("qd10 bloom contracts hold at a second SF (zero FN, bounded FP)") {
    // the plan-bearing fragments are inside the query closure (the result
    // row is built from contract aggregates), so the pin here is the
    // CONTRACT at a second scale factor: building the row executes the
    // bloom build + probe + exact verify end-to-end
    val row = QueryCatalog.byName("qd10_bloom_decontam").build(spark, dir).head()
    spark.catalog.clearCache()
    assert(row.getBoolean(row.fieldIndex("no_false_negatives")))
    assert(row.getBoolean(row.fieldIndex("fp_bounded")))
  }

  test("qp11 prefix sum is bucket-partitioned — no global single-task window") {
    // the global token offset comes from the two-phase scan: per-bucket
    // bases (bounded B-row agg, broadcast back) + a window PARTITIONED BY
    // bucket. An unpartitioned `sum over (order by doc_id)` — one task
    // sorting the whole corpus — must never reappear.
    val plan = planOf("qp11_pack_sequences")
    val winSpecs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, s"qp11 should use a window for the in-bucket scan:\n${plan.take(1500)}")
    assert(winSpecs.forall(_.startsWith("bucket#")),
      s"every window must be partitioned by bucket, got $winSpecs:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket bases must broadcast-join back:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), s"qp11 must not go cartesian:\n${plan.take(1500)}")
  }

  test("qt09 LM training and scoring both read the cached tf table — one corpus explode") {
    // the token stream is aggregated ONCE into tf; the unigram model
    // (vocab counts, total) and the scoring join all derive from tf. The
    // pin: exactly one Generate in the plan (the explode feeding tf,
    // inside the cached relation) and the cache is actually hit.
    // (each InMemoryTableScan reference re-prints the cached child plan,
    // so counting Generate occurrences in the string is meaningless — the
    // cache pin itself is what proves the stream explodes once)
    val plan = planOf("qt09_unigram_logprob")
    assert(plan.contains("InMemoryTableScan"),
      s"qt09 must score from the cached tf table:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"no window in qt09:\n${plan.take(1500)}")
  }

  test("qp07 KL joins source terms to corpus terms by token; totals broadcast") {
    // the only big shuffle joins (source, token) counts with per-token
    // corpus counts; per-source totals and the grand total ride in as
    // broadcasts (the single-row total may plan as a broadcast nested
    // loop — that is a 1-row side, not a cartesian of data)
    val plan = planOf("qp07_source_kl")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"),
      s"qp07 must never go cartesian:\n${plan.take(1500)}")
    assert(plan.contains("InMemoryTableScan"),
      s"qp07 must derive everything from the cached st table:\n${plan.take(1500)}")
  }

  test("qp06 rebalance filters the corpus against a broadcast threshold map") {
    // temperature sampling must be one stateless scan: the corpus joins a
    // #languages-row broadcast of ppm thresholds and filters in place —
    // never a per-language window, sample(), or shuffle of the documents
    val plan = planOf("qp06_lang_rebalance")
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold map must broadcast onto the corpus scan:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"no window in the sampling path:\n${plan.take(1500)}")
  }

  test("qt08 heavy-hitter sketch aggregates with bounded partials, no window") {
    val plan = planOf("qt08_heavy_hitters")
    assert(!plan.contains("Window"), s"sketch path must not sort:\n${plan.take(1500)}")
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"Misra-Gries needs partial + final object aggregation:\n${plan.take(1500)}")
  }

  test("qp02 per-source quota uses the bounded top-k aggregator, not a window") {
    // a hot domain would make a per-source row_number window sort all of
    // that domain's docs in one task; the quota must aggregate instead
    val plan = planOf("qp02_source_quota")
    assert(!plan.contains("Window"), s"no per-source window sort:\n${plan.take(1500)}")
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      "quota needs partial + final top-k aggregation")
  }

  test("qp03 top-20 vocabulary compiles to TakeOrderedAndProject") {
    val plan = planOf("qp03_doc_frequency")
    assert(plan.contains("TakeOrderedAndProject"),
      s"df top-20 must not globally sort the vocabulary:\n${plan.take(1500)}")
  }

  test("qp04 packing window is shard-partitioned, never global") {
    // the running sum must partition by the source shard: an empty window
    // partition spec would funnel the whole corpus through one task
    val plan = planOf("qp04_sequence_pack")
    assert("windowspecdefinition\\(source".r.findFirstIn(plan).isDefined,
      s"pack prefix-sum must partition by source:\n${plan.take(1500)}")
  }

  test("q19b grouped quantiles keep every aggregation buffer bounded") {
    // q19's exact percentile materializes each group's value multiset in
    // one buffer (a hot group at 100 TB OOMs); the scale path may only use
    // the bounded percentile_approx sketch plus distributive counts
    val plan = planOf("q19b_grouped_quantiles")
    assert(!plan.contains("percentile("),
      s"no exact percentile aggregate in the scale path:\n${plan.take(1500)}")
    assert(plan.contains("percentile_approx"), "the sketch must be in-plan")
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, "sketch + rank-count aggregations need map-side partials")
  }

  test("q12 as-of join is union-merge: one window pass, no join operator") {
    // the fan-out plan (equi-join + row_number) materializes
    // |events(u)| x |orders(u)| rows per user; the union-merge plan must
    // contain NO join at all — a single per-user sort + window
    val plan = planOf("q12_asof_join")
    assert(!plan.contains("Join"), s"as-of must not join:\n${plan.take(1500)}")
    assert(plan.contains("Window"), "as-of needs the prefix-frame window")
    assert(plan.contains("Union"), "as-of unions the two streams")
  }

  test("qd04 prefix join ships keys, not payloads, and never goes cartesian") {
    val plan = planOf("qd04_ngram_jaccard")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n${plan.take(1500)}")
    // candidate self-join keyed by (source, tok): the prefix token must be a
    // join key — that is what makes it sub-quadratic
    assert(plan.contains("tok"), "prefix token must appear as a join key")
    // shingle arrays must NOT be carried through the candidate shuffle: the
    // explode feeding the join projects only (source, doc_id, len, tok)
    val explodeProjects = "Generate explode.*?\\[(.*?)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(explodeProjects.nonEmpty && explodeProjects.forall(p => !p.contains("sh#")),
      s"prefix explode must not carry the shingle payload: $explodeProjects")
  }

  test("q21 range join compiles to a binned equi-join, not a cartesian band") {
    val plan = planOf("q21_range_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the band predicate must ride an equi-join on the bin:\n${plan.take(1500)}")
    assert(plan.contains("bin"), "bin must be the join key")
  }

  test("qd05 embedding near-dup blocks by IVF cell (no within-label all-pairs)") {
    val plan = planOf("qd05_embedding_neardup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"must stay an equi-join:\n${plan.take(1500)}")
    assert(plan.contains("cell"), "candidate join must be keyed by the IVF cell")
  }

  test("qt12 BM25 finish is TakeOrderedAndProject; term filter precedes the tf shuffle") {
    val plan = planOf("qt12_bm25")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-10 must compile to top-k, not a full sort:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      "scoring must never rank through a window")
    // df + corpus stats are bounded → both join back as broadcasts; the
    // corpus-sized tf table must never be the build side of anything
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "df/stats must broadcast onto the tf table")
  }

  test("qp12 DSIR ratio model broadcasts; corpus is never shuffled for scoring") {
    val plan = planOf("qp12_dsir")
    assert(plan.contains("BroadcastHashJoin"),
      s"the B-row log-ratio table must broadcast onto tf:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), "no windowed scan in the scoring path")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
  }

  test("qp13 corpus prep is one fused pass: dedup window partitioned by content hash") {
    val plan = planOf("qp13_corpus_prep")
    // the dedup window must partition by md5(text) — an empty partition
    // spec would funnel the whole corpus through one task
    assert("windowspecdefinition\\(_w0|windowspecdefinition\\(md5".r.findFirstIn(plan).isDefined
      && plan.contains("md5"),
      s"dedup min-window must partition by the content hash:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      "the composed pipeline must not introduce any join")
    // quality + split filters fuse into codegen'd Filter nodes, not
    // separate shuffles: only the window exchange and the final agg
    // exchange may appear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <= 2 shuffles (dedup window + final agg), got $exchanges:\n${plan.take(2000)}")
  }

  test("qe04 shift audit derives the global mean from the aggregated table, then broadcasts it") {
    val plan = planOf("qe04_embedding_shift")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 64-row global-mean table must broadcast onto per-label means:\n${plan.take(1500)}")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      "one aggregation pass, no window, no cartesian")
  }

  test("qd11 semdedup: one cell-keyed shuffle into per-cluster kernels, no pairwise join") {
    // SemDeDup's entire point is that the O(n²) similarity matrix never
    // materializes: assignment is a broadcast-centroid map and the greedy
    // runs inside per-cell MapGroups tasks. The pin: no join operator of
    // any kind (the within-cluster pairs exist only transiently inside
    // the kernel), no Window, and no cartesian fallback.
    val plan = planOf("qd11_semdedup")
    assert(plan.contains("MapGroups"),
      s"per-cluster greedy must run as a grouped kernel:\n${plan.take(1500)}")
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct")
      && !plan.contains("Window"),
      s"qd11 must not materialize candidate pairs in-plan:\n${plan.take(1500)}")
  }

  test("qt13 PII scrub is a single codegen'd scan pass — no shuffle, no join, no UDF") {
    val plan = planOf("qt13_pii_redact")
    assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
      s"per-row regexp work must pipeline inside the scan:\n${plan.take(1500)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"),
      "regexp ops must stay native expressions")
    // (WholeStageCodegen spans only appear in the post-AQE final plan;
    // the structural pins above are the stable assertions)
  }

  test("qe05 outlier scoring broadcasts the moment arrays; the corpus never re-shuffles") {
    // the moment model must collapse to ONE broadcast row and the score
    // must be a per-row array expression: a single Generate (the moment
    // pass's posexplode) is allowed, and no hash-partitioned exchange of
    // per-(vec, dim) rows may appear on the scoring side — the tempting
    // explode-and-regroup scoring pass shuffles n×d rows at 100 TB
    val plan = planOf("qe05_embedding_outliers")
    assert("Generate".r.findAllIn(plan).length <= 1,
      s"only the moment pass may explode; scoring must stay vectorized:\n${plan.take(1500)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded top-k, not a global sort:\n${plan.take(1500)}")
  }

  test("qs10 matryoshka rerank: both stages bounded top-k, no per-query window") {
    // truncated-dim prefilter + exact rerank must keep the qs01-qs05 pin:
    // ranking is the TopKByScore aggregator on both stages — a per-query
    // row_number window would single-task-sort every survivor
    val plan = planOf("qs10_matryoshka_rerank")
    assert(!plan.contains("Window"),
      s"no window sort in either stage:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"),
      s"rerank joins must stay keyed:\n${plan.take(1500)}")
  }

  test("q23 moving-window aggregates partition by user_id — no global range frame") {
    val plan = planOf("q23_moving_window")
    assert(plan.contains("windowspecdefinition(user_id"),
      s"RANGE frame must partition by user:\n${plan.take(1500)}")
  }

  test("qp14 curriculum rank window is bucket-partitioned, never a global sort") {
    // same discipline as qp11, on a non-uniform (score) key: the
    // row_number window must partition by the score-range bucket; an
    // unpartitioned `row_number() over (order by score)` is one task
    // sorting the corpus
    val plan = planOf("qp14_curriculum_order")
    assert(plan.contains("windowspecdefinition(bucket"),
      s"rank window must partition by the score bucket:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the B-row base-rank table must broadcast:\n${plan.take(1500)}")
  }

  test("qp15 epoch-shuffle rank partitions by (epoch, bucket) — reproducible, no global sort") {
    val plan = planOf("qp15_epoch_shuffle")
    assert(plan.contains("windowspecdefinition(epoch") && plan.contains("bucket"),
      s"permutation rank must partition by (epoch, key-range bucket):\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 2B-row base-position table must broadcast:\n${plan.take(1500)}")
  }

  test("qt15 tercile thresholds come from the sketch — no exact percentile, no window") {
    // CCNet bucketing must keep every aggregation buffer bounded: the
    // thresholds are percentile_approx (O(accuracy) sketch state) and the
    // rank check is a second plain aggregation — the exact `percentile`
    // (whole multiset in one buffer) and any Window are the pinned-out
    // scale killers (same discipline as q19b)
    val plan = planOf("qt15_ccnet_buckets")
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"),
      s"thresholds must come from the sketch:\n${plan.take(1500)}")
    assert(!"(?<!approx_)percentile\\(".r.findFirstIn(plan).isDefined,
      s"exact percentile must never appear in-plan:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"no window pass:\n${plan.take(1500)}")
  }

  test("qt14 bigram window partitions by doc_id; scoring joins the tf table by bigram") {
    val plan = planOf("qt14_bigram_logprob")
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"adjacency window must partition by doc_id (bounded by doc length):\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"),
      s"model join must stay keyed by (w, w2):\n${plan.take(1500)}")
    // tf is computed once and persisted; both the model derivation and the
    // scoring join must read the InMemoryRelation, not re-explode the corpus
    assert(plan.contains("InMemoryTableScan"),
      s"scoring must reuse the cached tf table:\n${plan.take(1500)}")
  }

  test("qd10 bloom probe is a codegen'd expression — no ScalaUDF on the train scan") {
    // the probe column sits on the full train-corpus scan; an interpreted
    // Scala UDF there boxes every hash and breaks whole-stage codegen —
    // pin the actual production stage (the helper qd10 itself calls)
    import spark.implicits._
    val spans = Seq((1L, 10, 111L), (2L, 95, 222L), (3L, 50, 333L))
      .toDF("doc_id", "bucket", "h")
    val bc = spark.sparkContext.broadcast(new Array[Long](1 << 15))
    try {
      val probe = graft.relational.PipelineQueries.bloomProbeStage(spans, bc)
      // expression-tree walk: toString elides expressions folded into an
      // aggregate's result projection, so string-matching can't see them
      val exprs = probe.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten
      assert(!exprs.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])),
        "bloom probe must be the codegen'd expression, not a UDF")
      assert(exprs.exists(_.exists(
          _.isInstanceOf[graft.functions.expressions.BloomMightContain])),
        s"probe expression missing from the plan:\n${probe.queryExecution.optimizedPlan}")
    } finally bc.unpersist()
  }

  test("array-harness ranking partitions its window by the key-range bucket") {
    // the qc* conformance arrays are built by ranking lineitem rows; that
    // rank must be the qp15 two-phase form (bucketed window + broadcast
    // base offsets), never an unpartitioned row_number that funnels the
    // whole table through one task — this was the last global window in
    // the codebase
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = graft.relational.ArrayHarness.indexed(spark, dir, col("l_quantity"))
    try {
      val globals = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(globals.isEmpty,
        s"harness rank must partition by bucket:\n${df.queryExecution.optimizedPlan.toString.take(1500)}")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("windowspecdefinition(bucket"),
        s"rank window must partition by the key-range bucket:\n${plan.take(1500)}")
    } finally spark.catalog.clearCache()
  }

  test("qe07 sample bound is pushed into the embeddings scan") {
    // the TwoNN estimator runs on a deterministic 256-vector sample; that
    // bound must reach the parquet reader (row-group pruning at 100 TB),
    // not filter post-scan
    val plan = planOf("qe07_intrinsic_dim")
    assert(plan.contains("LessThan(vec_id,256)"),
      s"sample filter must push into the scan:\n${plan.take(1500)}")
    // and its NN-ranking window is partitioned (per sample point), never
    // a global sort
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = QueryCatalog.byName("qe07_intrinsic_dim").build(spark, dir)
    val globals = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    spark.catalog.clearCache()
    assert(globals.isEmpty, "qe07 window must partition by the sample point")
  }

  test("qs12 probe join keys on cell AND label (predicate in the posting key)") {
    // filtered ANN must shrink candidates BY THE PREDICATE before any
    // distance computes — a post-rank label filter would starve selective
    // predicates; the join key carrying both columns is the proof
    val plan = planOf("qs12_filtered_ann")
    assert("BroadcastHashJoin \\[cell#\\d+L?, label#\\d+".r.findFirstIn(plan).isDefined ||
      "BroadcastHashJoin \\[label#\\d+, cell#\\d+L?".r.findFirstIn(plan).isDefined,
      s"probe join must key on (cell, label):\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("qt19 vocabulary intersection is an equi-join on token, never cartesian") {
    val plan = planOf("qt19_source_overlap")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"posting self-join must stay keyed by token:\n${plan.take(1500)}")
  }

  test("qd15 incremental probe stays keyed by band, never cartesian") {
    // arriving-vs-existing candidates must come from the band equi-join
    // (ids only); the verify joins key on the candidate ids
    val plan = planOf("qd15_incremental_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental band probe must stay keyed:\n${plan.take(1500)}")
  }

  test("qp22 eval pool compiles to TakeOrderedAndProject, not a global sort") {
    val plan = planOf("qp22_eval_pool")
    assert(plan.contains("TakeOrderedAndProject"),
      s"fixed-size pool must use distributed per-partition heads:\n${plan.take(1500)}")
  }

  test("qt25 head vocabulary is TakeOrdered + a broadcast join back") {
    val plan = planOf("qt25_oov_rate")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-1000 vocab cut must be a bounded TakeOrdered:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the vocab must broadcast back onto the token stream:\n${plan.take(1500)}")
  }

  test("qm05 image near-dup candidates come from the band equi-join, never cartesian") {
    val plan = planOf("qm05_image_neardup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"Hamming-LSH banding must stay a keyed join:\n${plan.take(1500)}")
  }

  test("qs20 range search stays keyed and stateless: no window, no top-k, no cartesian") {
    val plan = planOf("qs20_range_search")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"probe join must stay keyed by cell:\n${plan.take(1500)}")
    assert(!plan.contains("Window") && !plan.contains("TopKByScore"),
      s"the radius finish must be a stateless filter:\n${plan.take(1500)}")
  }

  test("qt27 span novelty is hash aggregation over keyed joins, never cartesian") {
    val plan = planOf("qt27_span_novelty")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"first-occurrence join must key on the span hash:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"novelty must come from hash aggs, not windows:\n${plan.take(1500)}")
  }

  test("qe15 cell-purity window partitions by cell, never global") {
    val plan = planOf("qe15_cell_label_purity")
    val winSpecs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.startsWith("cell#")),
      s"majority pick must partition by cell, got $winSpecs:\n${plan.take(1500)}")
  }

  test("qt21 trigram windows partition by doc; finish is hash aggregation") {
    val plan = planOf("qt21_dup_trigram_fraction")
    val winSpecs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.startsWith("doc_id#")),
      s"adjacency windows must partition by doc_id, got $winSpecs:\n${plan.take(1500)}")
    assert(plan.contains("HashAggregate"),
      s"per-(doc,trigram) tf must hash-aggregate:\n${plan.take(1500)}")
  }

  test("qs31 PQ store rerank: broadcast point-read joins, no cartesian, no UDF, no window") {
    // the serve path's returned plan is the exact rerank over the ADC
    // survivors: the (bounded) candidate and query tables must BROADCAST
    // against the vbucket-pruned vector point reads, ranking must be the
    // bounded aggregator — PqIndexStoreSpec pins the two scans'
    // PartitionFilters; this pins the join/rank strategy around them
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-plan").toString
    val e = graft.relational.QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx)
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("qv"))
      .filter(col("query_id") < 5)
    val served = graft.sinks.IvfPqIndexStore.query(spark, idx, q,
      nProbe = 10, topK = 10, candK = 240)
    val plan = served.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("ScalaUDF"), s"no ScalaUDF in the serve plan:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate/query tables must broadcast against the point reads:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"rank finish must be the bounded aggregator, not a window:\n${plan.take(1500)}")
  }

  test("qs36 PQ filtered serve: hot plane prunes on (cell, meta); rerank prunes vbuckets; no cartesian, no UDF, no window") {
    // the r13 scoped layout's whole point, pinned: the filtered ADC scan
    // must carry BOTH partition columns in its PartitionFilters (cell
    // from the probe set, meta from the batch's label domain) — losing
    // either silently degrades to scanning L× the directories; the
    // returned rerank plan must still prune vbuckets, keep every join
    // non-cartesian, and rank via the bounded aggregator
    val idx = java.nio.file.Files.createTempDirectory("graft-pqf-plan").toString
    val e = graft.relational.QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256, idx,
      metaCol = Some("label"))
    spark.catalog.clearCache()
    val ctx = graft.sinks.ArtifactStore.open(spark, idx)
    val scanPlan = graft.sinks.IvfPqIndexStore
      .servedPostings(spark, ctx, Seq(0L, 3L), Some(Seq("1", "2")))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(scanPlan).isDefined,
      s"scoped hot-plane scan must prune probe cells:\n${scanPlan.take(2000)}")
    assert("PartitionFilters: \\[[^\\]]*meta".r.findFirstIn(scanPlan).isDefined,
      s"scoped hot-plane scan must prune the meta domain:\n${scanPlan.take(2000)}")
    val q = e.select(col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    val served = graft.sinks.IvfPqIndexStore.queryFiltered(spark, idx, q,
      nProbe = 16, topK = 10, candK = 240)
    val plan = served.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("ScalaUDF"), s"no ScalaUDF in the serve plan:\n${plan.take(1500)}")
    assert("PartitionFilters: \\[[^\\]]*vbucket".r.findFirstIn(plan).isDefined,
      s"rerank point reads must keep pruning vbuckets:\n${plan.take(2000)}")
    assert(!plan.contains("Window"),
      s"rank finish must be the bounded aggregator, not a window:\n${plan.take(1500)}")
  }

  test("qs35 graph filtered batch: meta filter is keyed joins, never cartesian, no window") {
    // the distributed filtered walk (r13: SCOPED — per-query seeds join
    // the batch's (query_id, meta) against the broadcast per-label entry
    // table, and the label-disjoint edge plane keeps every hop within
    // the query's subgraph): the seed join must stay keyed (an
    // accidental cross product here would be batch × entries), and
    // ranking is the bounded aggregator
    val idx = java.nio.file.Files.createTempDirectory("graft-gfb-plan").toString
    val e = graft.relational.QueryHelpers.table(spark, dir, "embeddings")
    graft.sinks.GraphIndexStore.build(e, idx, degree = 8, assign = 2,
      nEntries = 4, buckets = 16, metaCol = Some("label"))
    spark.catalog.clearCache()
    val q = e.select(col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("qv"),
        col("label").cast("string").as("meta"))
      .filter(col("query_id") < 5)
    val served = graft.sinks.GraphIndexStore.queryFilteredBatch(spark, idx, q,
      beam = 16, hops = 2, topK = 5)
    val plan = served.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      s"rank finish must be the bounded aggregator, not a window:\n${plan.take(1500)}")
  }
}
