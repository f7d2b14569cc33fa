package graft.relational

import graft.functions.MisraGries
import graft.pipeline.{Bpe, KMeans, LogReg, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings` —
  * the LLM-data-curation surface (dedup, similarity search, text analysis,
  * multimodal plumbing), each with a DuckDB oracle where expressible.
  *
  * Scale notes (these run on 100 TB, the oracle only checks semantics):
  *  - exact dedup = hash-groupBy, fully map-side partial-aggregatable;
  *  - MinHash-LSH avoids all-pairs: candidates come from a band-bucket
  *    self-equi-join, verification touches candidates only;
  *  - n-gram Jaccard all-pairs is bounded to same-`source` partitions;
  *  - ANN brute-force broadcasts the (tiny) query set — one scan, no
  *    shuffle; the LSH-bucketed variant reduces scanned fraction further;
  *  - text analysis ops are pure per-row Catalyst expressions (codegen'd),
  *    so they pipeline inside the scan stage.
  */
object PipelineQueries {
  import QueryHelpers._

  /** Build/serve split of the three persistent-store headline paths —
    * ONE definition feeding both the catalog gate rows qd17/qs14/qt23
    * (which time BUILD+serve from scratch, gating the whole
    * build→persist→prune→serve pipeline) and Bench's serve-only rows
    * (build once untimed, then time the serve alone): the regression a
    * production deploy actually cares about is the serve latency, and in
    * a joint row it hides inside the one-off build's noise. */
  object Serve {
    def buildBandIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qd17-bidx").toString
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"), splitBucket.as("bucket"))
      graft.sinks.BandIndexStore.build(
        docs.filter(col("bucket") < 90).select(col("doc_id"), col("text")),
        idxDir, ShingleN, NumPerms, RowsPerBand)
      idxDir
    }
    def probeBandIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"), splitBucket.as("bucket"))
      graft.sinks.BandIndexStore.probe(s, idxDir,
        docs.filter(col("bucket") >= 90).select(col("doc_id"), col("text")),
        JaccardThreshold)
    }
    def buildIvfIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs14-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir)
      idxDir
    }
    def queryIvfIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.IvfIndexStore.query(s, idxDir, queries, nProbe = 4, topK = 10)
    }
    def buildTextIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt23-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      idxDir
    }
    def queryTextIndex(s: SparkSession, idxDir: String): DataFrame =
      graft.sinks.TextIndexStore.queryBm25(s, idxDir,
        Seq("spark", "join", "window"), AnnTopK)
    /** qt38: the tenant-scoped text store — built once on `lang`, the
      * per-language retrieval shape. */
    def buildTextIndexScoped(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt38-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir,
        metaCol = Some("lang"))
      idxDir
    }
    /** qs45: the dense leg's lang-scoped store — embeddings share the
      * documents id domain (the qs37 premise), so each vector inherits
      * its document's language and the IVF store scopes on it. */
    def buildIvfIndexLangScoped(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs45-ivf").toString
      val langs = table(s, d, "documents")
        .select(col("doc_id").as("vec_id"), col("lang"))
      graft.sinks.IvfIndexStore.build(
        table(s, d, "embeddings").join(langs, Seq("vec_id"))
          .select(col("vec_id"), col("embedding"), col("lang")),
        16, idxDir, metaCol = Some("lang"))
      idxDir
    }
    /** qs45: qs44's eval-set fusion WITHIN each query's own language —
      * both legs from lang-scoped stores ([[graft.sinks.TextIndexStore
      * .queryBm25FilteredBatch]] per-label BM25 + [[graft.sinks
      * .IvfIndexStore.queryFiltered]] at nProbe = K, exact within the
      * label), the query's language derived from ITS OWN document row
      * (regeneration-robust — no hardcoded lang constants), fusion
      * distributed exactly as qs44. */
    def queryRrfFilteredBatch(s: SparkSession, d: String,
        lexIdx: String, denseIdx: String): DataFrame = {
      import s.implicits._
      val K = 20; val RrfK = 60
      val langs = table(s, d, "documents")
        .select(col("doc_id").as("query_id"), col("lang"))
      val tq = Seq(
          (0L, Seq("spark", "join", "window")),
          (1L, Seq("merge", "column")),
          (2L, Seq("scan", "filter", "hash"))).toDF("query_id", "terms")
        .join(langs, Seq("query_id"))
        .select(col("query_id"), col("terms"), col("lang").as("meta"))
      val lex = graft.sinks.TextIndexStore
        .queryBm25FilteredBatch(s, lexIdx, tq, K)
        .select(col("query_id"), col("doc_id"), col("rank").as("lr"))
      val qd = table(s, d, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .join(langs, Seq("query_id"))
        .select(col("query_id"), col("qv"), col("lang").as("meta"))
      // the DISTRIBUTED filtered batch path (bit-identical to
      // queryFiltered, spec-pinned): qs44's nothing-about-the-batch-on-
      // the-driver contract now holds on BOTH legs, so this shape serves
      // a million-query tenant sweep unchanged (r15 review finding)
      val den = graft.sinks.IvfIndexStore
        .queryFilteredBatch(s, denseIdx, qd, nProbe = 16, topK = K)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank").as("dr"))
      def leg(r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        coalesce(lit(1.0) / (r + lit(RrfK)).cast("double"), lit(0.0))
      val fused = lex.join(den, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (leg(col("lr")) + leg(col("dr"))).as("rrf_score"))
      graft.functions.Ranking.rankTopKScored(fused, AnnTopK, "doc_id", "rrf_score")
    }
    /** qt38's eval set: three keyword queries over three language
      * scopes — three distinct per-label stat sets through one slice
      * pass. The scopes are the 3 lexicographically-first languages IN
      * THE DATA (both engines derive them the same way — no hardcoded
      * lang constants, so a testdata regeneration that changes the
      * label domain cannot make the row pass vacuously on 0 == 0 rows;
      * r15 review finding, the qs45 lang-derivation discipline). */
    def queryTextFilteredBatch(s: SparkSession, d: String,
        idxDir: String): DataFrame = {
      import s.implicits._
      val langs = table(s, d, "documents").select(col("lang")).distinct()
        .orderBy(col("lang")).limit(3).collect().map(_.getString(0))
      val terms = Seq(Seq("spark", "join", "window"), Seq("merge", "column"),
        Seq("scan", "filter", "hash"))
      val queries = langs.toSeq.zipWithIndex
        .map { case (l, i) => (i.toLong, terms(i), l) }
        .toDF("query_id", "terms", "meta")
      graft.sinks.TextIndexStore.queryBm25FilteredBatch(s, idxDir, queries, AnnTopK)
    }
    /** qs43: qs37's RRF fusion with BOTH legs served from pre-built
      * artifacts — sparse from [[graft.sinks.TextIndexStore.queryBm25]]
      * (qt23's store, 6-decimal-quantized scores in (score DESC, doc_id)
      * order), dense from [[graft.sinks.IvfIndexStore.query]] at
      * nProbe = K = 16 (every cell probed ⇒ brute force, exact by
      * construction — the qs40 argument), fused by qs37's exact
      * arithmetic. Ranks: the lexical leg re-ranks its collected top-K
      * under the SAME (score DESC, doc_id) order the store sorts by
      * (driver-side, so no dependence on collect() row-order
      * guarantees); the dense leg's ranks come straight off the store's
      * shared Ranking finish. */
    def queryRrfIndexFusion(s: SparkSession, d: String,
        lexIdx: String, denseIdx: String): DataFrame = {
      import s.implicits._
      val K = 20; val RrfK = 60
      val lr: Map[Long, Int] = graft.sinks.TextIndexStore
        .queryBm25(s, lexIdx, Seq("spark", "join", "window"), K)
        .select(col("doc_id"), col("score")).as[(Long, Double)].collect()
        .sortBy { case (id, sc) => (-sc, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val q0 = table(s, d, "embeddings").filter(col("vec_id") === 0L)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val dr: Map[Long, Int] = graft.sinks.IvfIndexStore
        .query(s, denseIdx, q0, nProbe = 16, topK = K)
        .select(col("vec_id"), col("rank")).as[(Long, Int)].collect().toMap
      val fused = (lr.keySet ++ dr.keySet).toSeq.map { id =>
        (id,
          lr.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0) +
          dr.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0))
      }.sortBy { case (id, sc) => (-sc, id) }.take(AnnTopK)
      fused.toDF("doc_id", "rrf_score")
    }
    /** qs44: the EVAL-SET sibling of [[queryRrfIndexFusion]] — many
      * hybrid queries at once, each leg served from its store's batch
      * path ([[graft.sinks.TextIndexStore.queryBm25Batch]] /
      * [[graft.sinks.IvfIndexStore.query]] at nProbe = K), and the
      * fusion itself DISTRIBUTED: a full-outer join of the two
      * (query_id, doc_id, rank) leg relations keyed on BOTH columns,
      * the reciprocal adds as codegen'd column arithmetic, and the
      * shared bounded [[graft.functions.Ranking.rankTopKScored]]
      * finish — no driver arithmetic, so the shape holds when the eval
      * set is millions of queries (each leg's output is batch × topK
      * rows, never corpus-sized). */
    def queryRrfBatchFusion(s: SparkSession, d: String,
        lexIdx: String, denseIdx: String): DataFrame = {
      import s.implicits._
      val K = 20; val RrfK = 60
      val lex = graft.sinks.TextIndexStore.queryBm25Batch(s, lexIdx, Seq(
          (0L, Seq("spark", "join", "window")),
          (1L, Seq("merge", "column")),
          (2L, Seq("scan", "filter", "hash"))).toDF("query_id", "terms"), K)
        .select(col("query_id"), col("doc_id"), col("rank").as("lr"))
      val qd = table(s, d, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      val den = graft.sinks.IvfIndexStore.query(s, denseIdx, qd, nProbe = 16, topK = K)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank").as("dr"))
      // 1/(60+rank): exact-integer denominator cast once to double — the
      // same IEEE op both engines run (oracle: (1.0::DOUBLE)/((60+r)::DOUBLE));
      // an absent leg contributes 0.0 through the null-propagating add
      def leg(r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        coalesce(lit(1.0) / (r + lit(RrfK)).cast("double"), lit(0.0))
      val fused = lex.join(den, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (leg(col("lr")) + leg(col("dr"))).as("rrf_score"))
      graft.functions.Ranking.rankTopKScored(fused, AnnTopK, "doc_id", "rrf_score")
    }
    /** qt33's exact eval set served from a pre-built store — the
      * POSITIONAL plane's bench row (qt33_batch_only): phrase serving is
      * the one store plane the serve_only list didn't time through r12,
      * so a regression in the slot joins / position-map fold was
      * invisible. */
    def queryTextPhraseBatch(s: SparkSession, idxDir: String): DataFrame = {
      import s.implicits._
      graft.sinks.TextIndexStore.queryPhraseBatch(s, idxDir, Seq(
        (0L, Seq("fast", "table")),
        (1L, Seq("stream", "table", "hash")),
        (2L, Seq("table")),
        (3L, Seq("table", "table"))).toDF("query_id", "phrase"))
    }
    /** qt35's exact eval set served from a pre-built store — the
      * proximity/NEAR folds share qt33's slice machinery but add the
      * greedy-chain fold; this row (qt35_batch_only) gives that fold its
      * own serve baseline (r13 verdict #4). */
    def queryTextProximityBatch(s: SparkSession, idxDir: String): DataFrame = {
      import s.implicits._
      graft.sinks.TextIndexStore.queryProximityBatch(s, idxDir, Seq(
        (0L, Seq("fast", "table"), 4),
        (1L, Seq("fast", "table", "scan"), 5),
        (2L, Seq("stream", "hash"), 8),
        (3L, Seq("table", "table"), 3)).toDF("query_id", "terms", "window"))
    }
    /** qt37's exact eval set served from a pre-built store — the NEAR
      * (order-free) fold's serve baseline, completing the positional
      * plane's bench coverage (phrase qt33 / ordered-chain qt35 / HERE). */
    def queryTextNearBatch(s: SparkSession, idxDir: String): DataFrame = {
      import s.implicits._
      graft.sinks.TextIndexStore.queryNearBatch(s, idxDir, Seq(
        (0L, Seq("fast", "table"), 4),
        (1L, Seq("stream", "hash"), 6),
        (2L, Seq("fast", "table", "scan"), 6)).toDF("query_id", "terms", "window"))
    }
    def buildGraphIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs28-gidx").toString
      graft.sinks.GraphIndexStore.build(table(s, d, "embeddings"), idxDir,
        degree = 12, assign = 2, nEntries = 4)
      idxDir
    }
    def buildPqIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs31-pq").toString
      graft.sinks.IvfPqIndexStore.build(table(s, d, "embeddings"),
        k = 16, nSub = 8, subK = 256, idxDir)
      idxDir
    }
    def queryPqIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.IvfPqIndexStore.query(s, idxDir, queries,
        nProbe = 10, topK = AnnTopK, candK = 24 * AnnTopK)
    }
    def queryGraphIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.GraphIndexStore.query(s, idxDir, queries,
        beam = 32, hops = 4, topK = AnnTopK)
    }
    /** The whole corpus as a query batch — the offline-inference shape the
      * distributed `queryBatch` paths exist for. Bench times these
      * separately from the 5-query driver serves so a regression in the
      * keyed-join formulations (the 100×-scale paths) is visible without
      * a build or a tiny batch masking it. */
    private def corpusBatch(s: SparkSession, d: String): DataFrame =
      table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
    /** The corpus batch carrying each query's own label as the filter
      * value — the filtered batch rows' input (qs35/qs36 geometry). */
    private def corpusBatchMeta(s: SparkSession, d: String): DataFrame =
      table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
    def buildGraphIndexScoped(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs35-gidx").toString
      graft.sinks.GraphIndexStore.build(table(s, d, "embeddings"), idxDir,
        degree = 12, assign = 2, nEntries = 4, metaCol = Some("label"))
      idxDir
    }
    def buildPqIndexScoped(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs36-pq").toString
      graft.sinks.IvfPqIndexStore.build(table(s, d, "embeddings"),
        k = 16, nSub = 8, subK = 256, idxDir, metaCol = Some("label"))
      idxDir
    }
    def queryGraphFilteredBatch(s: SparkSession, d: String,
        idxDir: String): DataFrame =
      graft.sinks.GraphIndexStore.queryFilteredBatch(s, idxDir,
        corpusBatchMeta(s, d), beam = 32, hops = 4, topK = AnnTopK)
    def queryPqFilteredBatch(s: SparkSession, d: String,
        idxDir: String): DataFrame =
      graft.sinks.IvfPqIndexStore.queryFilteredBatch(s, idxDir,
        corpusBatchMeta(s, d), nProbe = 16, topK = AnnTopK,
        candK = 24 * AnnTopK)
    def buildMaxSimIndex(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs40-msidx").toString
      graft.sinks.MaxSimIndexStore.build(table(s, d, "embeddings"),
        k = 16, subs = 4, subDim = 16, idxDir)
      idxDir
    }
    def queryMaxSimIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      // nProbe = K: EXACT serving (class doc — on this corpus no smaller
      // probe is lossless, measured by MaxSimProbeMain), so qs19's
      // brute-force oracle grades the store bit-exactly
      graft.sinks.MaxSimIndexStore.query(s, idxDir, queries,
        nProbe = 16, topK = AnnTopK)
    }
    def queryMaxSimBatch(s: SparkSession, d: String, idxDir: String): DataFrame =
      graft.sinks.MaxSimIndexStore.queryBatch(s, idxDir, corpusBatch(s, d),
        nProbe = 16, topK = AnnTopK)
    def queryMaxSimRange(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.MaxSimIndexStore.rangeQuery(s, idxDir, queries,
        nProbe = 16, radius = MaxSimRangeRadius)
    }
    def buildMaxSimIndexScoped(s: SparkSession, d: String): String = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs41-msidx").toString
      graft.sinks.MaxSimIndexStore.build(table(s, d, "embeddings"),
        k = 16, subs = 4, subDim = 16, idxDir, metaCol = Some("label"))
      idxDir
    }
    def queryMaxSimFiltered(s: SparkSession, d: String, idxDir: String): DataFrame = {
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .filter(col("query_id") < 5)
      graft.sinks.MaxSimIndexStore.queryFiltered(s, idxDir, queries,
        nProbe = 16, topK = AnnTopK)
    }
    def queryMaxSimFilteredBatch(s: SparkSession, d: String,
        idxDir: String): DataFrame =
      graft.sinks.MaxSimIndexStore.queryFilteredBatch(s, idxDir,
        corpusBatchMeta(s, d), nProbe = 16, topK = AnnTopK)
    def queryIvfBatch(s: SparkSession, d: String, idxDir: String): DataFrame =
      graft.sinks.IvfIndexStore.queryBatch(s, idxDir, corpusBatch(s, d),
        nProbe = 4, topK = 3)
    def queryPqBatch(s: SparkSession, d: String, idxDir: String): DataFrame =
      graft.sinks.IvfPqIndexStore.queryBatch(s, idxDir, corpusBatch(s, d),
        nProbe = 10, topK = AnnTopK, candK = 24 * AnnTopK)
    def queryGraphBatch(s: SparkSession, d: String, idxDir: String): DataFrame =
      graft.sinks.GraphIndexStore.queryBatch(s, idxDir, corpusBatch(s, d),
        beam = 32, hops = 4, topK = AnnTopK)
  }

  private val ShingleN = 4
  private val NumPerms = 8
  private val RowsPerBand = 4 // 2 bands of 4 rows: P(candidate | j) = 1-(1-j^4)^2
  private val JaccardThreshold = 0.80
  private val ContainmentThreshold = 0.90
  private val NgramThreshold = 0.55
  private val CosineThreshold = 0.35
  private val SimhashBits = 16

  private val AnnTopK = 10
  // qs42: MaxSim radius — measured non-trivial at every SF (163/262/933
  // answer rows at sf0.01/0.001/0.1; max score ~2.0-2.5 on 4 subspaces)
  private val MaxSimRangeRadius = 1.5
  // qt13: RE2-compatible subset (no lookaround/backrefs) so the Java and
  // DuckDB regex engines agree match-for-match
  private val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val DupSpanW = 8 // qd08: duplicated-span window, in tokens
  private val BpeMerges = 10 // qp08: BPE merge steps to train + verify
  private val ClfDim = 256 // qp09: hashed bag-of-words feature dimension
  private val ClfIters = 30
  private val ClfLr = 1.0
  private val ClfLabelThreshold = 0.06 // stopword-ratio heuristic label
  private val ClfTrainBuckets = 80 // qp09: md5 buckets < 80 train, ≥ 80 holdout
  private val BloomBits = 1 << 21 // qd10: 256 KB filter (size to the eval corpus)
  private val BloomK = 4 // qd10: probes per key
  private val HllRsd = 0.05 // qt10: approx_count_distinct relative std dev
  private val CmsDepth = 4 // qt11: Count-Min rows (min over d estimates)
  private val CmsWidth = 1 << 16 // qt11: counters per row (2 MB grid total)
  private val PackSeqLen = 64 // qp11: training-sequence length, in tokens
  private val PackBuckets = 32 // qp11: prefix-sum parallelism (≈ cluster tasks)

  /** The engine-wide dot-product kernel: a codegen'd fused loop
    * ([[graft.functions.expressions.VecDot]]) bit-identical — same
    * left-fold IEEE sequence, same null/length semantics, spec-pinned —
    * to the composed-builtin `aggregate(zip_with(x,y,_*_), 0.0, _+_)`
    * every oracle mirror contract was written against, minus the
    * builtins' interpreted per-element lambda dispatch (higher-order
    * functions are CodegenFallback). */
  private def vdot(x: Column, y: Column): Column =
    graft.functions.expressions.VectorExpressions.vecDot(x, y)

  private def cosineCol(q: Column, v: Column): Column =
    vdot(q, v) / (sqrt(vdot(q, q)) * sqrt(vdot(v, v)))

  /** Hoisted-norm cosine for the hot ANN paths (candidates >> rows): each
    * side's norm is projected ONCE onto its own relation BEFORE the join
    * (`hoistNorm`), instead of being recomputed inside every joined
    * candidate pair as `cosineCol` does. The norm column is the very same
    * sqrt-of-left-fold expression, and the final multiply/divide are the
    * same IEEE ops on the same values, so every cosine — and therefore
    * every rank, threshold decision, and oracle hash — is bit-identical
    * to the inline form (IvfIndexStore's serve kernels share this
    * discipline with a vnorm column persisted in the postings). */
  private def hoistNorm(df: DataFrame, vcol: String, name: String): DataFrame =
    df.withColumn(name, sqrt(vdot(col(vcol), col(vcol))))
  private def cosineHoisted: Column =
    vdot(col("qv"), col("v")) / (col("qnorm") * col("vnorm"))

  /** Per-vector symmetric int8 quantization: scale = max|x|/127, so values
    * land in [-127, 127]. Cosine is scale-invariant, so the quantized
    * cosine needs no de-scaling — it is the cosine of the int vectors. */
  private def int8Quantize(v: Column): Column = {
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-30)) / lit(127.0)
    transform(v, x => round(x / scale).cast("int"))
  }

  /** Integer dot product (products fit an int at ±127²; accumulated long) —
    * the codegen'd [[graft.functions.expressions.VecDotLong]] kernel,
    * spec-pinned bit-identical to the composed-builtin
    * `aggregate(zip_with(x,y,(a,b)->CAST(a*b AS BIGINT)), 0L, _+_)`. */
  private def idot(x: Column, y: Column): Column =
    graft.functions.expressions.VectorExpressions.vecDotLong(x, y)

  /** Final ANN ranking WITHOUT a per-query window sort: a bounded top-k
    * [[graft.functions.TopKByScore]] aggregation (map-side partials hold ≤k
    * rows per query per partition, the shuffle carries ≤ partitions × k
    * rows) replaces `row_number() OVER (PARTITION BY query_id)` — which
    * would sort EVERY surviving candidate of a query in one task (at 100 TB
    * with few queries, a single-task sort of ~nprobe/K of the corpus).
    * Rank order (cosine DESC, vec_id ASC) is identical to the window
    * formulation, so the oracle SQL keeps its row_number form. */
  private def topkRanked(scored: DataFrame, score: String = "cosine"): DataFrame = {
    val topk = graft.functions.TopKAggregator.topK(AnnTopK)
    scored.groupBy(col("query_id"))
      .agg(topk(col(score), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("col.vec_id").as("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-pass distributed moment gather over a vector column: each
    * partition reduces to a single (count, Σv, Σvvᵀ) partial — one d×d
    * matrix, so the driver gathers ≤ partitions × (d²+d+1) doubles no
    * matter the corpus size (the Linalg.svd tall-skinny discipline) —
    * and returns (n, mean, population covariance). Shared by qe01 (PCA)
    * and qe03 (whitening verification, over the M-dim whitened rows). */
  private def moments(vs: org.apache.spark.sql.Dataset[Seq[Double]])
      : (Long, Array[Double], Array[Array[Double]]) = {
    val partials = vs.mapPartitions { it =>
      var n = 0L; var dim = 0
      var sums: Array[Double] = null; var mom: Array[Double] = null
      it.foreach { sv =>
        val v = sv.toArray
        if (sums == null) { dim = v.length; sums = new Array[Double](dim); mom = new Array[Double](dim * dim) }
        n += 1
        var i = 0
        while (i < dim) {
          val vi = v(i); sums(i) += vi
          var j = 0
          while (j < dim) { mom(i * dim + j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, sums.toSeq, mom.toSeq))
    }(org.apache.spark.sql.Encoders.product[(Long, Seq[Double], Seq[Double])])
      .collect()
    val n = partials.map(_._1).sum
    val dim = partials.head._2.length
    val sums = new Array[Double](dim); val mom = new Array[Double](dim * dim)
    partials.foreach { case (_, sv, mv) =>
      var i = 0; while (i < dim) { sums(i) += sv(i); i += 1 }
      var k = 0; while (k < dim * dim) { mom(k) += mv(k); k += 1 }
    }
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => mom(i * dim + j) / n - mean(i) * mean(j))
    (n, mean, cov)
  }

  /** qd10's probe stage: the train split's distinct (doc_id, posting-hash)
    * pairs, each flagged by a stateless probe of the broadcast Bloom
    * filter. The probe is the codegen'd [[graft.functions.expressions
    * .BloomMightContain]] expression — this column sits on the full
    * train-corpus scan, the per-row-hot position where an interpreted
    * Scala UDF (boxing every hash, breaking whole-stage codegen) is the
    * pinned-out shape (`PlanQualitySpec` asserts no ScalaUDF here). */
  private[graft] def bloomProbeStage(spans: DataFrame,
      bits: org.apache.spark.broadcast.Broadcast[Array[Long]]): DataFrame =
    spans.filter(col("bucket") < 90)
      .select(col("doc_id"), col("h")).distinct()
      .withColumn("hit",
        graft.functions.expressions.BloomExpressions.bloomMightContain(
          col("h"), bits, BloomK))

  /** qp01/qp05's deterministic split assignment: hash-bucket of the stable
    * doc identity (shared so the audit query can never drift from the
    * split it audits). */
  private def splitBucket: Column =
    pmod(TextOps.hash60(col("doc_id").cast("string")), lit(100))
  private def splitLabel(bucket: Column): Column =
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  private val oSplitCte: String =
    """sp AS (SELECT doc_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
       FROM documents)"""

  /** Oracle list-comprehension for distinct char n-grams. */
  private def oShingles(textExpr: String): String =
    s"list_distinct([substr($textExpr, i, $ShingleN) for i in range(1, greatest(length($textExpr) - ${ShingleN - 1}, 0) + 1)])"

  /** Exact-content pre-collapse + LSH banding, shared by qd02/qd07 (and,
    * through catalog composition, qd06/qd12/qp05).
    *
    * Documents with IDENTICAL distinct-shingle sets are indistinguishable
    * to every score computed downstream — Jaccard and containment are
    * functions of the sets alone. So the corpus is first collapsed to one
    * representative per distinct `hs` (min doc_id), LSH banding and
    * verification run over representatives only, and verified
    * representative pairs are expanded back to member pairs afterwards
    * (members of one group additionally pair with each other at score
    * exactly 1.0). The collapse is COMPLETE — bit-identical to the
    * uncollapsed formulation, which the DuckDB oracle still uses — and it
    * removes the hot-band quadratic-candidate risk on duplicate-heavy
    * corpora (the norm at 100 TB pre-dedup): 10k byte-identical copies of
    * one page contribute ONE row per band to the self-join instead of 10k
    * (10^8 candidate rows before the distinct). The only quadratic left is
    * the expansion itself, whose rows ARE the answer (the oracle emits
    * every one) — inherent output volume with zero per-pair verification
    * work, not intermediate waste; AQE splits its hot group keys for task
    * balance. Near-identical-but-not-set-identical hot bands remain m²
    * candidates at the representative level; capping or dropping those
    * would be UNSOUND here (near-dup pairs are exactly what this operator
    * exists to find), so that residual is left to AQE skew-split.
    * Measured (LshSkewSpec, 600 one-edit-apart template variants,
    * J >= ~0.87): candidates = 0.877 x C(m,2) — i.e. the banding recall
    * curve 1-(1-J^4)^2, exactly as designed — and EVERY candidate
    * verifies above threshold, so the m^2 is answer volume, not waste.
    * `LshSkewSpec` pins both properties on duplicate-heavy fixtures.
    *
    * Returns (reps, memb, repCand):
    *  - reps   (doc_id, hs): one row per distinct shingle set;
    *  - memb   (rep_id, doc_id): every doc mapped to its representative;
    *  - repCand (id_a, id_b): distinct LSH candidate representative pairs.
    */
  private[graft] def collapsedLshCandidates(docs0: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.functions.expressions.ShingleExpressions._
    // one shuffle keyed by the shingle-set itself; member lists are ids
    // only, bounded by group size (ubiquitous-boilerplate groups are the
    // pathology this exists to absorb — ids, never payloads)
    val grouped = docs0.groupBy(col("hs"))
      .agg(min(col("doc_id")).as("rep_id"), collect_list(col("doc_id")).as("members"))
      .persist() // feeds reps, memb, and (via reps) the band explode
    val reps = grouped.select(col("rep_id").as("doc_id"), col("hs"))
    val memb = grouped.select(col("rep_id"), explode(col("members")).as("doc_id"))
    val banded = reps.select(col("doc_id"),
      explode(TextOps.bandKeys(minhashSig(col("hs"), NumPerms),
        NumPerms, RowsPerBand)).as("band"))
      .persist() // both sides of the self-join read it
    val a = banded.select(col("band"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("doc_id").as("id_b"))
    val repCand = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    (reps, memb, repCand)
  }

  /** Expand verified representative pairs `(rep_a, rep_b, score)` to member
    * pairs: cross pairs inherit the representatives' score verbatim (the
    * member arrays are identical, so recomputing would be bit-identical
    * work); members within one group pair at `selfScore` (exactly 1.0 for
    * Jaccard/containment on identical sets). Pair uniqueness needs no
    * distinct: each doc belongs to exactly one group, so (id_a, id_b)
    * determines the (group_a, group_b) pair that produced it. */
  private[graft] def expandRepPairs(repPairs: DataFrame, memb: DataFrame,
      scoreName: String, selfScore: Column): DataFrame = {
    val cross = repPairs
      .join(memb.select(col("rep_id").as("rep_a"), col("doc_id").as("m_a")), Seq("rep_a"))
      .join(memb.select(col("rep_id").as("rep_b"), col("doc_id").as("m_b")), Seq("rep_b"))
      .select(least(col("m_a"), col("m_b")).as("id_a"),
        greatest(col("m_a"), col("m_b")).as("id_b"), col(scoreName))
    val ia = memb.select(col("rep_id"), col("doc_id").as("id_a"))
    val ib = memb.select(col("rep_id"), col("doc_id").as("id_b"))
    val intra = ia.join(ib, Seq("rep_id")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), selfScore.as(scoreName))
    cross.unionByName(intra)
  }

  /** The deterministic-IVF top-k oracle (vec_id<16 centroids, nprobe=4,
    * queries vec_id<5, k=10) — shared by qs02 (fused in-query plan), qs14
    * (the same geometry served from the persistent IvfIndexStore
    * artifact), and qs16 (serving after tombstone deletes: `corpusPred`
    * filters the POSTING side only — centroids and queries keep the full
    * geometry, exactly the artifact's fixed-at-build semantics): all must
    * produce these exact rank rows. */
  private def oIvfTopkSqlWhere(corpusPred: String): String = s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent WHERE $corpusPred) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent WHERE e.vec_id < 5) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  private val oIvfTopkSql: String = oIvfTopkSqlWhere("TRUE")

  /** The multi-vector MaxSim oracle (qs19's brute-force late-interaction
    * scoring: 4×16 sub-vector slices, score = Σᵢ round(maxⱼ cos(qᵢ,dⱼ),
    * 12), 5 queries, top-10) — shared by qs19 (in-query plan) and qs40
    * (the same answer served from the persistent MaxSimIndexStore
    * artifact at nProbe=K, which is EXACT by construction: probing every
    * pooled cell is the brute-force scan, so the store's hoisted-norm
    * scorer must reproduce these rank rows bit-exactly at any SF). */
  private def oMaxSimScoredCte(fromClause: String): String = {
    def oSub(arr: String, i: Int): String =
      s"$arr[${i * 16 + 1}:${i * 16 + 16}]"
    def oCos(i: Int, j: Int): String = {
      val (a, b) = (oSub("q.qv", i), oSub("e.v", j))
      s"list_dot_product($a, $b) / (sqrt(greatest(list_dot_product($a, $a), 1e-30))" +
        s" * sqrt(greatest(list_dot_product($b, $b), 1e-30)))"
    }
    val terms = (0 until 4).map { i =>
      s"round(greatest(${(0 until 4).map(j => oCos(i, j)).mkString(", ")}), 12)"
    }.mkString(" + ")
    s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, label FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id, ($terms) AS cosine
        $fromClause)"""
  }

  /** The rank finisher over [[oMaxSimScoredCte]] — composed as CTE
    * prefix + finisher (never substring surgery on a rendered string,
    * which would break silently, and only at gate time, under any
    * reformatting — r14 advice). */
  private def oMaxSimSqlFrom(fromClause: String): String =
    s"""${oMaxSimScoredCte(fromClause)},
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  private val oMaxSimSql: String =
    oMaxSimSqlFrom("FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id")

  /** qs41: qs19's scoring restricted to the query's own label — the
    * label-scoped brute force the filtered store path must reproduce
    * verbatim at nProbe=K (every cell probed ⇒ the (cell, meta)-pruned
    * candidate set IS the label's sub-corpus). */
  private val oMaxSimFilteredSql: String =
    oMaxSimSqlFrom("FROM e JOIN q ON e.label = q.label WHERE e.vec_id <> q.query_id")

  /** qs42: the MaxSim RANGE sweep's brute force — same scored relation,
    * stateless `cosine >= radius` cut on the UNROUNDED score, rounded to
    * 6 for output (qs20's mirror conventions on the multi-vector axis).
    * Radius 1.5 measured non-trivial at every SF (163/262/933 answer
    * rows — driver-side duckdb sweep, r14). */
  private def oMaxSimRangeSql(radius: Double): String =
    s"""${oMaxSimScoredCte("FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id")},
      sweep AS (
        SELECT query_id, vec_id, round(cosine, 6) AS cosine
        FROM scored WHERE cosine >= $radius)
      SELECT query_id, vec_id, cosine FROM sweep
      ORDER BY query_id, vec_id"""

  /** qs37's RRF-fusion oracle — rank-domain fusion of the qt12 BM25
    * ranking and the qs01 brute-force cosine ranking, each top-20,
    * fused by Σ 1/(60+rank) with ::DOUBLE-cast reciprocal adds. Shared
    * by qs37 (in-query legs) and qs43 (both legs served from the
    * persistent TextIndexStore + IvfIndexStore artifacts, exact by
    * construction at nProbe=K) — one definition so the two rows cannot
    * drift. */
  private val oRrfSql: String = s"""
      WITH f AS (SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\\s+')) AS dl,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM f
             WHERE token IN ('spark', 'join', 'window')
             GROUP BY doc_id, dl, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS sumdl
        FROM documents),
      sc AS (SELECT tf.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tf.tf) * 2.2)
            / (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tf JOIN df USING (token), stats),
      lex AS (SELECT doc_id,
          row_number() OVER (ORDER BY score DESC, doc_id) AS lr
        FROM (SELECT doc_id, CAST(sum(sc) AS DOUBLE) AS score
              FROM sc GROUP BY doc_id)
        ORDER BY score DESC, doc_id LIMIT 20),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      dense AS (SELECT doc_id,
          row_number() OVER (ORDER BY cosine DESC, doc_id) AS dr
        FROM (SELECT vec_id AS doc_id,
            list_dot_product(qv, v) /
              (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM e CROSS JOIN q WHERE vec_id <> 0)
        ORDER BY cosine DESC, doc_id LIMIT 20),
      fused AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
          coalesce((1.0::DOUBLE) / ((60 + lr)::DOUBLE), 0.0::DOUBLE)
            + coalesce((1.0::DOUBLE) / ((60 + dr)::DOUBLE), 0.0::DOUBLE) AS rrf_score
        FROM lex FULL JOIN dense ON lex.doc_id = dense.doc_id)
      SELECT doc_id, rrf_score FROM fused
      ORDER BY rrf_score DESC, doc_id LIMIT 10"""

  /** qs44: the BATCH hybrid-fusion oracle — qs37's RRF conventions per
    * query over a 3-query hybrid eval set (per-query keyword legs from
    * a VALUES term table, per-query dense legs from vec_id < 3), each
    * leg top-20 by row_number under the engines' shared deterministic
    * orders, fused by the identical ::DOUBLE reciprocal adds, top-10
    * per query. df is GLOBAL per token (derived from the term-union
    * slice, independent of which query asked) — exactly
    * TextIndexStore.queryBm25Batch's documented df convention, so the
    * store leg is bit-identical to a standalone queryBm25 per query. */
  private val oRrfBatchSql: String = s"""
      WITH qt(query_id, token) AS (VALUES
          (0, 'spark'), (0, 'join'), (0, 'window'),
          (1, 'merge'), (1, 'column'),
          (2, 'scan'), (2, 'filter'), (2, 'hash')),
      f AS (SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\\s+')) AS dl,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents),
      tft AS (SELECT doc_id, dl, token, count(*) AS tf FROM f
             WHERE token IN (SELECT token FROM qt)
             GROUP BY doc_id, dl, token),
      df AS (SELECT token, count(*) AS df FROM tft GROUP BY token),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS sumdl
        FROM documents),
      sc AS (SELECT qt.query_id, tft.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tft.tf) * 2.2)
            / (tft.tf + 1.2 * (0.25 + (0.75 * tft.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tft JOIN df USING (token) JOIN qt USING (token) CROSS JOIN stats),
      lex AS (SELECT query_id, doc_id, lr FROM (
          SELECT query_id, doc_id,
            row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lr
          FROM (SELECT query_id, doc_id, CAST(sum(sc) AS DOUBLE) AS score
                FROM sc GROUP BY query_id, doc_id))
        WHERE lr <= 20),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
      dense AS (SELECT query_id, doc_id, dr FROM (
          SELECT query_id, doc_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS dr
          FROM (SELECT q.query_id, e.vec_id AS doc_id,
              list_dot_product(q.qv, e.v) /
                (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
            FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id))
        WHERE dr <= 20),
      fused AS (SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
          coalesce(lex.doc_id, dense.doc_id) AS doc_id,
          coalesce((1.0::DOUBLE) / ((60 + lr)::DOUBLE), 0.0::DOUBLE)
            + coalesce((1.0::DOUBLE) / ((60 + dr)::DOUBLE), 0.0::DOUBLE) AS rrf_score
        FROM lex FULL JOIN dense
          ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id),
      ranked AS (SELECT query_id, doc_id, rrf_score,
          row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused)
      SELECT query_id, rank, doc_id, rrf_score FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  /** qt38: the TENANT-SCOPED BM25 oracle — qt12's exact scoring
    * conventions evaluated per label (each label is its own corpus: df
    * per (lang, token), N and Σdl per lang), three keyword queries over
    * three language scopes from a VALUES table. The store's filtered
    * batch path must reproduce these rank rows verbatim — gating the
    * whole scoped plane: (bucket, meta) layout, per-label labelstats
    * fold, per-slice df, and the shared rank order. */
  private val oBm25FilteredSql: String = s"""
      WITH qt0(query_id, token) AS (VALUES
          (0, 'spark'), (0, 'join'), (0, 'window'),
          (1, 'merge'), (1, 'column'),
          (2, 'scan'), (2, 'filter'), (2, 'hash')),
      ql AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS query_id
             FROM (SELECT DISTINCT lang FROM documents)
             ORDER BY lang LIMIT 3),
      qt AS (SELECT qt0.query_id, qt0.token, ql.lang
             FROM qt0 JOIN ql USING (query_id)),
      d AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS a
            FROM documents),
      f AS (SELECT doc_id, lang, length(a) AS dl, unnest(a) AS token FROM d),
      tft AS (SELECT doc_id, lang, dl, token, count(*) AS tf FROM f
             WHERE token IN (SELECT token FROM qt0)
             GROUP BY doc_id, lang, dl, token),
      df AS (SELECT lang, token, count(*) AS df FROM tft GROUP BY lang, token),
      stats AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(a)) AS BIGINT) AS sumdl FROM d GROUP BY lang),
      sc AS (SELECT qt.query_id, tft.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tft.tf) * 2.2)
            / (tft.tf + 1.2 * (0.25 + (0.75 * tft.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tft
        JOIN qt ON tft.token = qt.token AND tft.lang = qt.lang
        JOIN df ON df.token = tft.token AND df.lang = tft.lang
        JOIN stats ON stats.lang = tft.lang),
      ranked AS (SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        FROM (SELECT query_id, doc_id, CAST(sum(sc) AS DOUBLE) AS score
              FROM sc GROUP BY query_id, doc_id))
      SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  /** qs45: the MULTI-TENANT hybrid-fusion oracle — qs44's RRF
    * conventions with both legs scoped to each query's own language
    * (derived from the query doc's row): the sparse leg is the
    * per-label BM25 formulation (qt38's oracle machinery — df per
    * (lang, token), N/Σdl per lang), the dense leg restricts candidates
    * to docs sharing the query's lang (the vectors inherit their doc's
    * language through the shared id domain). Both scoped store paths
    * must compose into these exact rank rows. */
  private val oRrfFilteredSql: String = s"""
      WITH qt(query_id, token) AS (VALUES
          (0, 'spark'), (0, 'join'), (0, 'window'),
          (1, 'merge'), (1, 'column'),
          (2, 'scan'), (2, 'filter'), (2, 'hash')),
      ql AS (SELECT doc_id AS query_id, lang FROM documents WHERE doc_id < 3),
      qtl AS (SELECT qt.query_id, qt.token, ql.lang FROM qt JOIN ql USING (query_id)),
      d AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS a
            FROM documents),
      f AS (SELECT doc_id, lang, length(a) AS dl, unnest(a) AS token FROM d),
      tft AS (SELECT doc_id, lang, dl, token, count(*) AS tf FROM f
             WHERE token IN (SELECT token FROM qt)
             GROUP BY doc_id, lang, dl, token),
      df AS (SELECT lang, token, count(*) AS df FROM tft GROUP BY lang, token),
      stats AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(a)) AS BIGINT) AS sumdl FROM d GROUP BY lang),
      sc AS (SELECT qtl.query_id, tft.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tft.tf) * 2.2)
            / (tft.tf + 1.2 * (0.25 + (0.75 * tft.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tft
        JOIN qtl ON tft.token = qtl.token AND tft.lang = qtl.lang
        JOIN df ON df.token = tft.token AND df.lang = tft.lang
        JOIN stats ON stats.lang = tft.lang),
      lex AS (SELECT query_id, doc_id, lr FROM (
          SELECT query_id, doc_id,
            row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lr
          FROM (SELECT query_id, doc_id, CAST(sum(sc) AS DOUBLE) AS score
                FROM sc GROUP BY query_id, doc_id))
        WHERE lr <= 20),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT e.vec_id AS query_id, e.v AS qv, d2.lang
            FROM e JOIN documents d2 ON e.vec_id = d2.doc_id WHERE e.vec_id < 3),
      dense AS (SELECT query_id, doc_id, dr FROM (
          SELECT query_id, doc_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS dr
          FROM (SELECT q.query_id, e.vec_id AS doc_id,
              list_dot_product(q.qv, e.v) /
                (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
            FROM e JOIN documents dd ON e.vec_id = dd.doc_id
            JOIN q ON dd.lang = q.lang
            WHERE e.vec_id <> q.query_id))
        WHERE dr <= 20),
      fused AS (SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
          coalesce(lex.doc_id, dense.doc_id) AS doc_id,
          coalesce((1.0::DOUBLE) / ((60 + lr)::DOUBLE), 0.0::DOUBLE)
            + coalesce((1.0::DOUBLE) / ((60 + dr)::DOUBLE), 0.0::DOUBLE) AS rrf_score
        FROM lex FULL JOIN dense
          ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id),
      ranked AS (SELECT query_id, doc_id, rrf_score,
          row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused)
      SELECT query_id, rank, doc_id, rrf_score FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  /** The many-query BATCH ANN oracle (qs02's deterministic vec_id<16 /
    * nprobe=4 geometry, EVERY vector as a query, k=3) — shared by qs04
    * (fused keyed-join plan) and qs24 (the same batch served from the
    * persistent IvfIndexStore artifact via the distributed
    * `queryBatch` path): both must produce these exact rank rows. */
  private val oBatchAnnSql: String = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 3
      ORDER BY query_id, rank"""

  /** qs25's oracle — the range sweep with EVERY vector as a query
    * (qs20's geometry and radius, query filter dropped): the
    * corpus-wide takedown sweep served distributively from the store. */
  private val oBatchRangeSql: String = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id)
      SELECT query_id, vec_id, round(cosine, 6) AS cosine
      FROM scored WHERE cosine >= 0.30
      ORDER BY query_id, vec_id"""

  /** The deterministic-IVF RANGE-search oracle (qs02's geometry, radius
    * 0.30, rounded-6 cosine output) — shared by qs20 (fused in-query
    * plan) and qs21 (the same sweep served from the persistent
    * IvfIndexStore artifact): both must produce these exact rows. */
  private val oRangeSearchSql: String = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent WHERE e.vec_id < 5) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id)
      SELECT query_id, vec_id, round(cosine, 6) AS cosine
      FROM scored WHERE cosine >= 0.30
      ORDER BY query_id, vec_id"""

  /** The incremental-dedup oracle (arriving bucket ≥ 90 probed against
    * the existing corpus's bands) — shared by qd15 (fused in-query plan)
    * and qd17 (the same probe served from the persistent BandIndexStore
    * artifact): both must produce these exact per-doc rows. */
  private def oIncrementalDedupSqlWhere(oldPred: String): String = {
    val bandExprs = (0 until NumPerms / RowsPerBand).map { bnd =>
      val parts = Seq(s"'$bnd'") ++
        (0 until RowsPerBand).map(r => s"mh[${bnd * RowsPerBand + r + 1}]::VARCHAR")
      parts.mkString(" || '|' || ")
    }.mkString(", ")
    s"""
      WITH sh AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
          list_distinct([CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                         for g in ${oShingles("text")}]) AS hs
        FROM documents WHERE length(text) >= $ShingleN),
      sig AS (
        SELECT doc_id, bucket, ${TextOps.oracleMinhashSignature("hs", NumPerms)} AS mh FROM sh),
      banded AS (SELECT doc_id, bucket, unnest([$bandExprs]) AS band FROM sig),
      cand AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
        FROM banded a JOIN banded b ON a.band = b.band
        WHERE a.bucket >= 90 AND b.bucket < 90 AND ($oldPred)),
      pairs AS (
        SELECT new_id,
          len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS jaccard
        FROM cand JOIN sh x ON cand.new_id = x.doc_id JOIN sh y ON cand.old_id = y.doc_id
        WHERE len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) >= $JaccardThreshold)
      SELECT new_id AS doc_id, count(*) AS n_dups, max(jaccard) AS max_jaccard
      FROM pairs GROUP BY 1 ORDER BY doc_id"""
  }

  private lazy val oIncrementalDedupSql: String = oIncrementalDedupSqlWhere("TRUE")

  /** qd21's tombstoned ids — chosen so at least one is a REAL
    * existing-side near-dup partner at every test SF (doc-id spaces
    * differ per generation: 50/82 hit at sf0.001, 70/387 at sf0.01,
    * 1285/3958 at sf0.1) — the delete visibly reshapes that SF's
    * output while the rest stay inert but exactly mirrored. */
  private val BandDeletedDocIds: Seq[Long] =
    Seq(50L, 70L, 82L, 387L, 1285L, 3958L)

  /** The label-scoped filtered-ANN oracle (qs02's geometry with the label
    * in the posting key) — shared by qs12 (fused in-query plan) and qs18
    * (the same scope served from a label-partitioned IvfIndexStore
    * artifact): both must produce these exact rank rows. */
  private val oFilteredTopkSql: String = """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, label, v, cid AS cell FROM (
          SELECT e.vec_id, e.label, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, label, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.label, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent WHERE e.vec_id < 5) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell, label) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""

  /** The fixed-query BM25 oracle — shared by qt12 (fused in-query plan),
    * qt23 (the same scoring served from the persistent TextIndexStore
    * artifact) and qt29 (serving after tombstone deletes: `docPred`
    * filters the corpus on BOTH the posting and the stats side — exactly
    * the store's fold semantics, since df derives from the pruned slice
    * and (N, Σdl) subtract the deleted docs' contributions): all must
    * produce these exact top-10 rows. */
  /** qt12's exact per-doc BM25 scoring over the fixed 3-term query —
    * (doc_id, n_terms_hit, score), shared by qt12 (top-10 finish) and
    * qs37 (rank fusion) so the lexical convention has ONE definition.
    * Scale shape: query terms filter the token stream INSIDE the scan
    * stage (codegen'd isin over a 3-literal set), so the tf shuffle
    * carries ≤ docs × |query| rows — never the full token stream; dl
    * rides along functionally dependent on doc_id (no second scan or
    * doc-length join); df and the corpus stats are bounded aggregates.
    * Determinism: per-term scores are 6-decimal-quantized decimals, so
    * the per-doc sum is exact decimal arithmetic and any (score DESC,
    * doc_id) cutoff can never drift across engines. k1 = 1.2, b = 0.75;
    * constants pre-folded (2.2 = k1+1, 0.25 = 1−b) and the op ORDER
    * mirrored exactly in the oracle so every intermediate is the same
    * IEEE double on both engines. */
  private def bm25DocScores(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "join", "window")
    val toksAll = TextOps.tokens(col("text"))
    // widen before the two tokenize passes (the CPU-heavy per-row stage;
    // identity at production split counts — graft.core.Parallelism)
    val docs = graft.core.Parallelism.widen(table(s, d, "documents"))
    val tf = docs
      .select(col("doc_id"), size(toksAll).as("dl"),
        explode(toksAll).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = docs
      .agg(count(lit(1)).as("n"), sum(size(toksAll)).as("sumdl"))
    val avgdl = col("sumdl").cast("double") / col("n")
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") +
      lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / avgdl)
    val scored = tf.join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(((idf * col("tf")) * lit(2.2)) / norm, 6)
          .cast(org.apache.spark.sql.types.DecimalType(20, 6)).as("sc"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("sc")).cast("double").as("score"))
  }

  private def oBm25SqlWhere(docPred: String): String = s"""
      WITH f AS (SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\\s+')) AS dl,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents WHERE $docPred),
      tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM f
             WHERE token IN ('spark', 'join', 'window')
             GROUP BY doc_id, dl, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS sumdl
        FROM documents WHERE $docPred),
      sc AS (SELECT tf.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tf.tf) * 2.2)
            / (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tf JOIN df USING (token), stats)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
        CAST(sum(sc) AS DOUBLE) AS score
      FROM sc GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 10"""

  private val oBm25Sql: String = oBm25SqlWhere("TRUE")

  /** qt29's tombstoned ids — two of qt12's served top-10 docs per test SF
    * (doc-id spaces differ per generation: 206/477 at sf0.001, 38/174 at
    * sf0.01, 166/1868 at sf0.1), so the delete visibly reshapes every
    * SF's ranking while the off-SF ids stay inert but exactly mirrored. */
  private val TextDeletedDocIds: Seq[Long] =
    Seq(38L, 166L, 174L, 206L, 477L, 1868L)

  /** qs16's tombstoned ids — chosen to include served neighbors (so the
    * delete visibly reshapes the result) and a centroid-seed id (7 < 16:
    * its POSTING vanishes, its centroid stays — geometry is fixed at
    * build time). */
  private val DeletedVecIds: Seq[Long] =
    Seq(7L, 27L, 64L, 89L, 112L, 137L, 203L, 312L, 408L, 470L)

  /** CTE chain reproducing qd02's LSH candidate pairs (pre-verification) —
    * the shared blocking stage of the minhash oracles. */
  private def oMinhashCandCtes: String = {
    val bandExprs = (0 until NumPerms / RowsPerBand).map { bnd =>
      val parts = Seq(s"'$bnd'") ++
        (0 until RowsPerBand).map(r => s"mh[${bnd * RowsPerBand + r + 1}]::VARCHAR")
      parts.mkString(" || '|' || ")
    }.mkString(", ")
    s"""sh AS (
        SELECT doc_id,
          list_distinct([CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                         for g in ${oShingles("text")}]) AS hs
        FROM documents WHERE length(text) >= $ShingleN),
      sig AS (
        SELECT doc_id, ${TextOps.oracleMinhashSignature("hs", NumPerms)} AS mh FROM sh),
      banded AS (SELECT doc_id, unnest([$bandExprs]) AS band FROM sig),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id)"""
  }

  /** CTE chain reproducing qd02's verified near-dup pairs — shared by the
    * qd02 oracle and qd06's connected-components oracle. */
  private def oMinhashPairsCtes: String =
    s"""$oMinhashCandCtes,
      pairs AS (
        SELECT id_a, id_b,
          len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS jaccard
        FROM cand JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id
        WHERE len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) >= $JaccardThreshold)"""

  val all: Seq[CatalogQuery] = Seq(

    // ---------- deduplication ----------

    CatalogQuery("qd01_exact_dedup", (s, d) => {
      table(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }, Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY keep_id"""), headline = true),

    CatalogQuery("qd02_minhash_lsh", (s, d) => {
      // shingles are 60-bit hashes from the start: one digest per shingle
      // (the affine permutations are integer ops), long arrays instead of
      // string arrays everywhere downstream. The repartition is
      // CONDITIONAL: it exists to spread the digest-dense stage across
      // cores when the scan yields fewer splits than the cluster has
      // slots (one small parquet file at test SFs); at production scale
      // the scan's own splits already parallelize and an unconditional
      // repartition would shuffle the whole corpus for nothing.
      // persisted: the band self-join and both verification joins reuse the
      // hashed-shingle table — without the cache each branch re-shingles
      // the corpus (4 scans). ~4 KB/doc, so the cache scales fine.
      // ShingleHash60/MinHashSig are custom single-pass Expressions (see
      // graft.functions.expressions) — semantically identical to the
      // higher-order-function formulation, ~5x cheaper per row.
      import graft.functions.expressions.ShingleExpressions._
      // widen before the MD5-per-gram shingle stage (the shared
      // graft.core.Parallelism rule: identity at production split counts)
      val docs0 = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), shingleHash60(col("text"), ShingleN).as("hs"))
      // scale shape: exact-content pre-collapse (identical shingle sets →
      // one representative), then the band self-join carries (band, rep)
      // keys ONLY — hash arrays are re-joined after the candidate set is
      // distinct, so the shuffle moves keys, not documents
      val (reps, memb, cand) = collapsedLshCandidates(docs0)
      val repPairs = cand
        .join(reps.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
          (col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
      expandRepPairs(repPairs, memb, "jaccard", lit(1.0))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH $oMinhashPairsCtes
      SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"""),
      headline = true),

    CatalogQuery("qd06_dedup_clusters", (s, d) => {
      // canonical-document assignment: connected components over the
      // verified near-dup pairs (pointer-jumping label propagation,
      // O(log diameter) join rounds)
      val pairs = QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
        .select(col("id_a"), col("id_b"))
      graft.pipeline.Dedup.connectedComponents(pairs)
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id)
      SELECT id AS doc_id, min(lab) AS canonical_id
      FROM reach GROUP BY id ORDER BY doc_id""")),

    CatalogQuery("qd14_dup_structure", (s, d) => {
      // Duplication-structure summary: the cluster-size histogram of the
      // near-dup graph (plus the singleton mass) — the one-table answer
      // to "how much duplication does this corpus carry and in what
      // shape", which decides between hard dedup (qd01/qd11), soft
      // reweighting (qd12), and doing nothing. A crawl with a fat tail
      // of giant clusters needs qd02's collapse machinery; a near-flat
      // histogram doesn't justify a dedup pass at all.
      //
      // Scale shape: composes qd06's connected components (pointer-
      // jumping, never all-pairs); the histogram is two bounded
      // aggregations over the (small) clustered-doc table; the singleton
      // row derives from two single-row counts broadcast together — no
      // corpus-sized structure anywhere past the dedup plane itself.
      val cc = graft.pipeline.Dedup.connectedComponents(
        QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
          .select(col("id_a"), col("id_b"))).persist()
      val h = cc.groupBy(col("canonical_id")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
        .select(col("csize").as("cluster_size"), col("n_clusters"),
          (col("csize") * col("n_clusters")).as("n_docs"))
      val singles = table(s, d, "documents").agg(count(lit(1)).as("total"))
        .crossJoin(cc.agg(count(lit(1)).as("clustered")))
        .select(lit(1L).as("cluster_size"),
          (col("total") - col("clustered")).as("n_clusters"),
          (col("total") - col("clustered")).as("n_docs"))
      h.unionByName(singles).orderBy(col("cluster_size"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      sizes AS (SELECT canonical_id, count(*) AS csize FROM cc GROUP BY 1),
      h AS (SELECT csize, count(*) AS n_clusters FROM sizes GROUP BY 1),
      singles AS (SELECT
          (SELECT count(*) FROM documents) - (SELECT count(*) FROM cc) AS n)
      SELECT CAST(csize AS BIGINT) AS cluster_size,
        CAST(n_clusters AS BIGINT) AS n_clusters,
        CAST(csize * n_clusters AS BIGINT) AS n_docs
      FROM h
      UNION ALL SELECT 1, CAST(n AS BIGINT), CAST(n AS BIGINT) FROM singles
      ORDER BY cluster_size""")),

    CatalogQuery("qd15_incremental_dedup", (s, d) => {
      // Incremental dedup — the production shape for a CONTINUOUS crawl:
      // an arriving batch is checked against the existing corpus without
      // re-deduplicating the corpus itself. Nothing existing-vs-existing
      // is recomputed (that ran when those docs arrived), and
      // batch-internal dups are qd02 run over the batch alone; what this
      // operator answers is "which arriving docs duplicate what we
      // already hold, and how hard" — per arriving doc, the number of
      // existing near-dup partners and the strongest Jaccard.
      //
      // Scale shape: the existing side's banded posting table is exactly
      // the build-once artifact an IvfIndexStore-style band index
      // persists (fixed NumPerms/RowsPerBand geometry, append-only);
      // here it derives in-query so the oracle can mirror it. Only the
      // arriving slice (a small fraction of the corpus) shingles fresh
      // and shuffles; the band join is keyed (band, id-only rows — qd02's
      // keys-not-payloads discipline), candidates go distinct before the
      // two hash-array re-joins, and the per-doc finish is a bounded
      // hash agg. The existing side is exact-collapsed first (qd02's
      // hot-band discipline: identical shingle sets ⇒ identical sigs,
      // bands, and Jaccard, so one representative bands for the whole
      // group and partner counts expand by group size afterwards — 10k
      // boilerplate copies post ONE row per band, and the expansion is
      // exact, which is why the oracle keeps the uncollapsed form). The
      // arriving/existing boundary is qp01's md5-bucket convention
      // (bucket >= 90 arrives — qd10's eval-split choice), so membership
      // is stateless and replay-safe on both engines.
      import graft.functions.expressions.ShingleExpressions._
      val docs = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), splitBucket.as("bucket"),
          shingleHash60(col("text"), ShingleN).as("hs"))
        .persist() // both sides band off it; both verify joins re-read it
      val arriving = docs.filter(col("bucket") >= 90).select(col("doc_id"), col("hs"))
      val existing = docs.filter(col("bucket") < 90)
        .groupBy(col("hs"))
        .agg(min(col("doc_id")).as("old_id"), count(lit(1)).as("grp_n"))
        .persist() // banded by rep + re-read by the verify join
      val newBanded = arriving.select(col("doc_id").as("new_id"),
        explode(TextOps.bandKeys(minhashSig(col("hs"), NumPerms),
          NumPerms, RowsPerBand)).as("band"))
      val oldBanded = existing.select(col("old_id"),
        explode(TextOps.bandKeys(minhashSig(col("hs"), NumPerms),
          NumPerms, RowsPerBand)).as("band"))
      val cand = newBanded.join(oldBanded, Seq("band"))
        .select(col("new_id"), col("old_id")).distinct()
      cand
        .join(arriving.select(col("doc_id").as("new_id"), col("hs").as("hs_a")), Seq("new_id"))
        .join(existing.select(col("old_id"), col("hs").as("hs_b"), col("grp_n")), Seq("old_id"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("new_id"), col("grp_n"),
          (col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .groupBy(col("new_id"))
        .agg(sum(col("grp_n")).as("n_dups"), max(col("jaccard")).as("max_jaccard"))
        .select(col("new_id").as("doc_id"), col("n_dups"), col("max_jaccard"))
        .orderBy(col("doc_id"))
    }, Some(oIncrementalDedupSql), headline = true),

    CatalogQuery("qd17_band_index_serve", (s, d) => {
      // Incremental dedup served from the PERSISTENT band index —
      // qd15's promise ("the existing side's banded posting table is
      // the build-once artifact") materialized via
      // `sinks/BandIndexStore`: build the collapsed band postings from
      // the existing corpus once, then probe with the arriving batch.
      // Same split convention, geometry and verification as qd15, so
      // the oracle is qd15's SQL verbatim — gating
      // shingle→collapse→band→persist→prune→probe end to end. Scale
      // shape: the probe opens only the arriving bands' bucket
      // partitions (parquet partition pruning, spec-pinned in
      // BandIndexSpec), and postings carry the rep's hash array so
      // verification needs zero side joins.
      Serve.probeBandIndex(s, d, Serve.buildBandIndex(s, d))
    }, Some(oIncrementalDedupSql), headline = true),

    CatalogQuery("qd21_band_index_delete_serve", (s, d) => {
      // Band-index deletion under the gate — the takedown path on the
      // DEDUP artifact (qs16's story for the band axis): build the
      // collapsed posting store, TOMBSTONE a fixed doc list (O(|ids|),
      // no store rewrite — the member map decrements each affected
      // group's count over the tombstoned ids' pruned hash buckets
      // only), then probe with the arriving batch. The oracle is qd15's
      // SQL with the deleted docs filtered from the EXISTING side only —
      // exactly the decrement semantics, because identical content means
      // a representative's hash array still stands for its surviving
      // members. The id list is chosen so at least one deletion visibly
      // reshapes every test SF's output (doc-id spaces differ per
      // generation); the rest are inert but exactly mirrored.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qd21-bidx").toString
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("text"), splitBucket.as("bucket"))
      graft.sinks.BandIndexStore.build(
        docs.filter(col("bucket") < 90).select(col("doc_id"), col("text")),
        idxDir, ShingleN, NumPerms, RowsPerBand)
      graft.sinks.BandIndexStore.delete(s, idxDir, BandDeletedDocIds)
      graft.sinks.BandIndexStore.probe(s, idxDir,
        docs.filter(col("bucket") >= 90).select(col("doc_id"), col("text")),
        JaccardThreshold)
    }, Some(oIncrementalDedupSqlWhere(
      s"b.doc_id NOT IN (${BandDeletedDocIds.mkString(", ")})"))),

    CatalogQuery("qd18_threshold_sweep", (s, d) => {
      // Near-dup THRESHOLD sweep — pair volume at multiple Jaccard
      // cutoffs from ONE verification pass: the tuning table behind the
      // 0.80 production threshold (qs13/qs17's operating-curve idea on
      // the dedup plane). Candidates come from the SAME fixed banding
      // qd02 ships, so each row reads "pairs the production blocking
      // surfaces at cutoff t" — exactly the comparison that matters
      // when debating a threshold change (recall of the banding itself
      // degrades below its design point; changing bands is a different
      // experiment, qd13's).
      //
      // Scale shape: qd02's collapsed machinery end to end; the sweep
      // adds NO work to candidate generation or verification — cross
      // counts are group-size PRODUCTS per verified representative pair
      // (never expanded to member rows), intra counts are C(n,2) sums,
      // and the 4-row threshold table broadcasts. The oracle counts the
      // uncollapsed pairs one by one — identical by the collapse
      // equivalence LshSkewSpec pins.
      import graft.functions.expressions.ShingleExpressions._
      import s.implicits._
      val docs0 = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), shingleHash60(col("text"), ShingleN).as("hs"))
      val (reps, memb, cand) = collapsedLshCandidates(docs0)
      val sizes = memb.groupBy(col("rep_id")).agg(count(lit(1)).as("n")).persist()
      val repPairs = cand
        .join(reps.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter"))).as("jaccard"))
      val cross = repPairs
        .join(sizes.select(col("rep_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("rep_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
        .select(col("jaccard"), (col("n_a") * col("n_b")).as("pairs"))
      val thresholds = Seq(50, 65, 80, 90).toDF("t_pct")
      val crossByT = cross.crossJoin(broadcast(thresholds))
        .filter(col("jaccard") >= col("t_pct").cast("double") / 100.0)
        .groupBy(col("t_pct")).agg(sum(col("pairs")).as("cross_pairs"))
      // intra-group pairs score exactly 1.0 — they clear every cutoff
      val intra = sizes.agg(sum(expr("n * (n - 1L) div 2")).as("intra_pairs"))
      thresholds
        .join(crossByT, Seq("t_pct"), "left")
        .crossJoin(broadcast(intra))
        .select(col("t_pct"),
          (coalesce(col("cross_pairs"), lit(0L)) + col("intra_pairs")).as("n_pairs"))
        .orderBy(col("t_pct"))
    }, Some(s"""
      WITH $oMinhashCandCtes,
      pairsAll AS (
        SELECT len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))) AS jaccard
        FROM cand JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id)
      SELECT t_pct,
        CAST(sum(CASE WHEN jaccard >= t_pct / 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
      FROM pairsAll, (SELECT unnest([50, 65, 80, 90]) AS t_pct) t
      GROUP BY t_pct ORDER BY t_pct""")),

    CatalogQuery("qd16_cross_source_dups", (s, d) => {
      // Duplication PROVENANCE matrix — qd02's verified near-dup pairs
      // bucketed by unordered source pair: the "who mirrors whom" table
      // (mirror sites, syndication, scraped re-posts). The diagonal is
      // within-source duplication (template reuse); heavy off-diagonal
      // cells mean two feeds ship the same content and one of them can
      // be dropped from the crawl entirely — a source-level decision no
      // per-doc dedup score surfaces.
      //
      // Scale shape: composes qd02 through the catalog (collapsed
      // banding, never all-pairs); the pair list joins the (doc_id,
      // source) projection twice — keyed joins, payload = one string —
      // and the finish is a hash agg bounded by S² unordered source
      // pairs.
      val pairs = QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
        .select(col("id_a"), col("id_b"))
      val src = table(s, d, "documents").select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), Seq("id_b"))
        .select(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }, Some(s"""
      WITH $oMinhashPairsCtes
      SELECT least(x.source, y.source) AS source_a,
        greatest(x.source, y.source) AS source_b,
        count(*) AS n_pairs
      FROM pairs
      JOIN documents x ON pairs.id_a = x.doc_id
      JOIN documents y ON pairs.id_b = y.doc_id
      GROUP BY 1, 2 ORDER BY source_a, source_b""")),

    CatalogQuery("qd20_ensemble_dedup", (s, d) => {
      // ENSEMBLE dedup — the production shape: no single signal catches
      // every duplicate class (MinHash misses paraphrases with low
      // lexical overlap; embedding cosine misses short boilerplate whose
      // vectors are noisy), so real pipelines union the edge sets of
      // several detectors and cluster over the COMBINED graph. Edges here
      // are qd02's verified lexical pairs ∪ qd05's verified semantic
      // pairs (vec_id == doc_id is the testdata identity, the qe12
      // convention); clusters are connected components of the union, and
      // the output is the per-cluster evidence table — size plus how many
      // verified pairs each signal contributed — which is what decides
      // whether a cluster is a mirror family (lexical-heavy), a
      // paraphrase family (semantic-only), or both.
      //
      // Scale shape: both edge generators are keyed candidate pipelines
      // composed through the catalog (LSH bands / IVF cells — never
      // all-pairs); the union is a set-union of two id-pair lists;
      // clustering is qd06's pointer-jumping connected components
      // (O(log diameter) keyed join rounds); the evidence counts are two
      // keyed joins of pair lists against the (doc → canonical) map plus
      // bounded hash aggs. Nothing anywhere is corpus-quadratic — the
      // whole operator moves id pairs, not documents.
      val textPairs = QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
        .select(col("id_a"), col("id_b")).persist() // edges + evidence count
      val embPairs = QueryCatalog.byName("qd05_embedding_neardup").build(s, d)
        .select(col("id_a"), col("id_b")).persist() // edges + evidence count
      val cc = graft.pipeline.Dedup.connectedComponents(
          textPairs.unionByName(embPairs).distinct()).persist()
      // evidence: pairs land in exactly one cluster (both endpoints share
      // a canonical by construction), so counting by id_a's canonical is
      // exact — a keyed join against the cc map, never a pair expansion
      def evidence(pairs: DataFrame, out: String): DataFrame = pairs
        .join(cc.select(col("doc_id").as("id_a"), col("canonical_id")), Seq("id_a"))
        .groupBy(col("canonical_id")).agg(count(lit(1)).as(out))
      cc.groupBy(col("canonical_id")).agg(count(lit(1)).as("n_docs"))
        .join(evidence(textPairs, "n_text_pairs"), Seq("canonical_id"), "left")
        .join(evidence(embPairs, "n_emb_pairs"), Seq("canonical_id"), "left")
        .select(col("canonical_id"), col("n_docs"),
          coalesce(col("n_text_pairs"), lit(0L)).as("n_text_pairs"),
          coalesce(col("n_emb_pairs"), lit(0L)).as("n_emb_pairs"))
        .orderBy(col("canonical_id"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      ee AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      ecent AS (SELECT vec_id AS cid, v AS cv FROM ee WHERE vec_id < 16),
      eposted AS (
        SELECT vec_id, label, cid AS cell FROM (
          SELECT ee.vec_id, ee.label, ecent.cid,
            row_number() OVER (PARTITION BY ee.vec_id
              ORDER BY list_distance(ee.v, ecent.cv) ASC, ecent.cid ASC) rn
          FROM ee CROSS JOIN ecent) t WHERE rn <= 4),
      ecand AS (
        SELECT DISTINCT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b
        FROM eposted a JOIN eposted b
          ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id),
      epairs AS (
        SELECT c.id_a, c.id_b
        FROM ecand c JOIN ee x ON c.id_a = x.vec_id JOIN ee y ON c.id_b = y.vec_id
        WHERE list_dot_product(x.v, y.v) /
            (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= $CosineThreshold),
      alledges AS (
        SELECT id_a, id_b FROM pairs
        UNION SELECT id_a, id_b FROM epairs),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM alledges
        UNION SELECT id_b, id_a FROM alledges),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      tcnt AS (SELECT cc.canonical_id, count(*) AS n
               FROM pairs JOIN cc ON pairs.id_a = cc.doc_id GROUP BY 1),
      ecnt AS (SELECT cc.canonical_id, count(*) AS n
               FROM epairs JOIN cc ON epairs.id_a = cc.doc_id GROUP BY 1)
      SELECT cc.canonical_id, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(coalesce(max(tcnt.n), 0) AS BIGINT) AS n_text_pairs,
        CAST(coalesce(max(ecnt.n), 0) AS BIGINT) AS n_emb_pairs
      FROM cc
      LEFT JOIN tcnt ON cc.canonical_id = tcnt.canonical_id
      LEFT JOIN ecnt ON cc.canonical_id = ecnt.canonical_id
      GROUP BY cc.canonical_id
      ORDER BY cc.canonical_id""")),

    CatalogQuery("qd12_soft_dedup_weights", (s, d) => {
      // Soft dedup — REWEIGHT duplicates instead of dropping them
      // (SoftDeDup: down-weight a document by its near-dup cluster size
      // so the cluster contributes one document's worth of gradient in
      // aggregate, preserving coverage that hard removal destroys).
      // weight_ppm = 1e6 // cluster_size in exact integer arithmetic
      // (no float loss surface); singletons keep full weight.
      //
      // Scale shape: composes qd06's connected components (pointer-
      // jumping over the LSH-verified pair set — never all-pairs); the
      // per-cluster size table is ≤ #clustered-docs rows and joins back
      // keyed by canonical id, then LEFT-joins onto the corpus id scan
      // (AQE broadcasts the small cluster side). The effective-size
      // audit is one more bounded aggregate.
      val cc = graft.pipeline.Dedup.connectedComponents(
        QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
          .select(col("id_a"), col("id_b"))).persist()
      val sizes = cc.groupBy(col("canonical_id")).agg(count(lit(1)).as("csize"))
      val weighted = table(s, d, "documents").select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .join(sizes, Seq("canonical_id"), "left")
        .select(col("doc_id"),
          coalesce(col("csize"), lit(1L)).as("cluster_size"),
          expr("1000000L div coalesce(csize, 1L)").as("weight_ppm"))
      weighted.orderBy(col("doc_id"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      sizes AS (SELECT canonical_id, count(*) AS csize FROM cc GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(s2.csize, 1) AS BIGINT) AS cluster_size,
        CAST(1000000 // COALESCE(s2.csize, 1) AS BIGINT) AS weight_ppm
      FROM documents d
      LEFT JOIN cc ON d.doc_id = cc.doc_id
      LEFT JOIN sizes s2 ON cc.canonical_id = s2.canonical_id
      ORDER BY d.doc_id""")),

    CatalogQuery("qp25_packing_curve", (s, d) => {
      // Packing-efficiency curve — the sizing table behind the seq-len
      // choice qp04/qp11/qp16 then execute: for each candidate training
      // sequence length, how many sequences does doc-boundary packing
      // (each doc padded to a multiple of L — the no-cross-doc-attention
      // regime) emit, and what fraction of the token grid is padding?
      // Short-L wastes little but caps context; long-L wastes more on a
      // short-doc corpus — this is the one-scan table that prices the
      // trade before committing a packing run.
      //
      // Scale shape: ONE token-count projection (the corpus collapses to
      // an int per doc at the scan); the 4-point curve explodes the
      // 4-element length array per doc-count row and finishes in a
      // 4-row hash agg — all-integer ceil/floor-division arithmetic on
      // both engines, no float surface.
      val Ls = Seq(32, 64, 128, 256)
      val tok = table(s, d, "documents")
        .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
      tok.select(col("n"),
          explode(array(Ls.map(l => lit(l.toLong)): _*)).as("seq_len"))
        .groupBy(col("seq_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("(n + seq_len - 1L) div seq_len")).as("n_seqs"),
          sum(expr("((n + seq_len - 1L) div seq_len) * seq_len - n")).as("n_pad_tokens"))
        .select(col("seq_len"), col("n_docs"), col("n_seqs"), col("n_pad_tokens"),
          expr("n_pad_tokens * 1000000L div (n_seqs * seq_len)").as("waste_ppm"))
        .orderBy(col("seq_len"))
    }, Some("""
      WITH tok AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
                   FROM documents),
      ls(l) AS (VALUES (CAST(32 AS BIGINT)), (64), (128), (256)),
      g AS (SELECT l AS seq_len, count(*) AS n_docs,
              CAST(sum((n + l - 1) // l) AS BIGINT) AS n_seqs,
              CAST(sum(((n + l - 1) // l) * l - n) AS BIGINT) AS n_pad_tokens
            FROM tok CROSS JOIN ls GROUP BY l)
      SELECT seq_len, n_docs, n_seqs, n_pad_tokens,
        n_pad_tokens * 1000000 // (n_seqs * seq_len) AS waste_ppm
      FROM g ORDER BY seq_len""")),

    CatalogQuery("qp24_shard_balance", (s, d) => {
      // Training-shard balance audit — per-shard document and token
      // mass under the hash-deterministic 64-shard membership
      // (ShardSink/TokenShardSink's convention): data-parallel training
      // reads shards in lockstep, so one token-heavy shard gates every
      // step (the straggler audit), and a skewed histogram argues for
      // more shards or size-bounded splitting. qs15's index-balance
      // table on the export axis.
      //
      // Scale shape: one projection with the stateless per-row shard
      // hash, a 64-row hash agg, and the single-row total broadcast
      // back; BIGINT ppm floor-division shares throughout.
      val Shards = 64
      val perShard = table(s, d, "documents")
        .select(pmod(TextOps.hash60(col("doc_id").cast("string")), lit(Shards.toLong))
            .as("shard"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      val total = perShard.agg(sum(col("n_tokens")).as("total"))
      perShard.crossJoin(broadcast(total))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          expr("n_tokens * 1000000L div total").as("token_share_ppm"))
        .orderBy(col("shard"))
    }, Some("""
      WITH s AS (SELECT
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS shard,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents),
      per AS (SELECT shard, count(*) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens
              FROM s GROUP BY shard),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per)
      SELECT shard, n_docs, n_tokens,
        n_tokens * 1000000 // total AS token_share_ppm
      FROM per, tot ORDER BY shard""")),

    CatalogQuery("qp23_effective_tokens", (s, d) => {
      // Dedup-ADJUSTED token supply per source — the number that mixture
      // planning should actually use: raw token counts overstate a
      // source whose mass is near-duplicate (RefinedWeb/FineWeb report
      // exactly this "tokens after dedup" figure per dump). Effective
      // tokens = Σ_doc ⌊n_tok · weight_ppm / 10⁶⌋ with qd12's soft-dedup
      // weights, so a 10-copy cluster contributes ~one document's worth
      // however its copies spread across sources. Per source: raw vs
      // effective tokens and the retained fraction, all exact integer
      // arithmetic (per-doc floor mirrors on both engines).
      //
      // Scale shape: composes qd12 through the catalog (pointer-jumping
      // CC, broadcast cluster table); one token-count projection joins
      // the weight table keyed by doc_id, and the finish is an S-row
      // hash agg.
      val weights = QueryCatalog.byName("qd12_soft_dedup_weights").build(s, d)
        .select(col("doc_id"), col("weight_ppm"))
      table(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .join(weights, Seq("doc_id"))
        .select(col("source"), col("n_tok"),
          expr("n_tok * weight_ppm div 1000000L").as("eff_tok"))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("raw_tokens"),
          sum(col("eff_tok")).as("effective_tokens"))
        .select(col("source"), col("raw_tokens"), col("effective_tokens"),
          expr("effective_tokens * 1000000L div raw_tokens").as("retained_ppm"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      sizes AS (SELECT canonical_id, count(*) AS csize FROM cc GROUP BY 1),
      w AS (SELECT d.doc_id, d.source,
              len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_tok,
              1000000 // COALESCE(s2.csize, 1) AS weight_ppm
            FROM documents d
            LEFT JOIN cc ON d.doc_id = cc.doc_id
            LEFT JOIN sizes s2 ON cc.canonical_id = s2.canonical_id),
      agg AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
                CAST(sum(n_tok * weight_ppm // 1000000) AS BIGINT) AS effective_tokens
              FROM w GROUP BY source)
      SELECT source, raw_tokens, effective_tokens,
        effective_tokens * 1000000 // raw_tokens AS retained_ppm
      FROM agg ORDER BY source""")),

    CatalogQuery("qd07_containment", (s, d) => {
      // Asymmetric containment dedup: |A∩B| / min(|A|, |B|) ≥ 0.90 over
      // the LSH candidate pairs — the signal Jaccard MISSES when one doc
      // quotes or wholly contains a much bigger one (|A| ≪ |B| caps
      // jaccard at |A|/|B| but containment at 1), which is how boilerplate
      // and quote-chains show up in web corpora. Same scale shape as
      // qd02: band-bucket candidates (keys-only shuffle), verification
      // touches candidate pairs only, one-pass codegen'd shingle/minhash
      // expressions; the oracle mirrors the banding through the shared
      // CTE chain so the blocking can never drift from qd02's.
      import graft.functions.expressions.ShingleExpressions._
      val docs0 = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), shingleHash60(col("text"), ShingleN).as("hs"))
      val (reps, memb, cand) = collapsedLshCandidates(docs0)
      val repPairs = cand
        .join(reps.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
          (col("inter").cast("double") /
            least(size(col("hs_a")), size(col("hs_b")))).as("containment"))
        .filter(col("containment") >= ContainmentThreshold)
      expandRepPairs(repPairs, memb, "containment", lit(1.0))
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH $oMinhashPairsCtes
      SELECT id_a, id_b, round(containment, 6) AS containment FROM (
        SELECT id_a, id_b,
          len(list_intersect(x.hs, y.hs))::DOUBLE /
            least(len(x.hs), len(y.hs)) AS containment
        FROM cand JOIN sh x ON cand.id_a = x.doc_id
                  JOIN sh y ON cand.id_b = y.doc_id) t
      WHERE containment >= $ContainmentThreshold ORDER BY id_a, id_b""")),

    CatalogQuery("qd03_simhash", (s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), TextOps.simhash(col("text"), SimhashBits).as("simhash"))
        .orderBy(col("doc_id"))
    }, Some {
      val bitExprs = (0 until SimhashBits).map { j =>
        s"CASE WHEN list_sum([CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH toks AS (
        SELECT doc_id,
          [CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) for t in list_distinct(regexp_split_to_array(trim(text), '\\s+'))] AS hs
        FROM documents)
      SELECT doc_id, CAST($bitExprs AS BIGINT) AS simhash FROM toks ORDER BY doc_id"""
    }),

    CatalogQuery("qd04_ngram_jaccard", (s, d) => {
      // Prefix-filtered exact threshold self-join (SSJoin / All-Pairs /
      // PPJoin family): any pair with Jaccard >= t must share a token among
      // the first |s| - ceil(t*|s|) + 1 elements of each side's
      // globally-ordered shingle set, so candidate generation explodes only
      // that prefix — the shuffle carries (source, token, id, len) keys,
      // never document payloads, and never the O(n²) per-source all-pairs
      // fan-out. Unlike LSH blocking this is COMPLETE: the exact all-pairs
      // oracle is unchanged and still holds. Global token order = ascending
      // 60-bit shingle hash (ShingleHash60's output is sorted+distinct);
      // a document-frequency (rare-first) order would shrink candidates
      // further but any fixed total order preserves completeness.
      import graft.functions.expressions.ShingleExpressions._
      val tNum = math.round(NgramThreshold * 100).toInt // t as an exact rational tNum/100
      val docs = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), col("source"),
          TextOps.charShingles(col("text"), ShingleN).as("sh"),
          shingleHash60(col("text"), ShingleN).as("hs"))
      // Exact-content pre-collapse (the qd02/qd07 discipline): Jaccard is
      // a function of the shingle SET alone, so docs with identical
      // (source, shingle sequence) collapse to a min-doc_id
      // representative before the prefix join. Length pruning can't
      // bound identical-content hot keys (equal lengths always pass), so
      // without this 10k copies of one boilerplate page put 10k rows on
      // each side of every prefix token — m² candidates. The group key
      // is md5 of the shingle CONCATENATION — injective because shingles
      // are fixed-width, so a group's members have identical sh/hs and
      // `first` is deterministic-by-value; same-set-different-order docs
      // merely land in separate groups, which costs a little collapse
      // opportunity but never correctness (their reps still meet through
      // the prefix join). Map-side partial aggregation bounds the one
      // content shuffle by distinct content. `LshSkewSpec` pins both the
      // bound and output equality on a duplicate-heavy fixture.
      val grouped = docs
        .withColumn("ck", md5(concat_ws("", col("sh"))))
        .groupBy(col("source"), col("ck"))
        .agg(min(col("doc_id")).as("rep_id"),
          first(col("sh")).as("sh"), first(col("hs")).as("hs"),
          collect_list(col("doc_id")).as("members"))
        .persist() // feeds reps (prefix explode + 2 verification joins) + memb
      val reps = grouped.select(col("source"), col("rep_id").as("doc_id"),
        col("sh"), col("hs"))
      val memb = grouped.select(col("rep_id"), col("source"),
        explode(col("members")).as("doc_id"))
      // prefix length |s| - ceil(t*|s|) + 1 in exact integer arithmetic:
      // double rounding (e.g. 20 * 0.55 = 11.000000000000002) would
      // overshoot the ceil, shorten the prefix, and silently lose pairs
      val len = size(col("hs"))
      val ceilT = floor((len * tNum + lit(99)) / lit(100)).cast("int")
      val pref = reps.select(col("source"), col("doc_id"), len.as("len"),
        explode(slice(col("hs"), lit(1), len - ceilT + lit(1))).as("tok"))
      val a = pref.select(col("source"), col("tok"),
        col("doc_id").as("id_a"), col("len").as("len_a"))
      val b = pref.select(col("source"), col("tok"),
        col("doc_id").as("id_b"), col("len").as("len_b"))
      // J >= t forces min(|a|,|b|) >= t * max(|a|,|b|) — integer-exact
      // length pruning before the distinct
      val cand = a.join(b, Seq("source", "tok"))
        .filter(col("id_a") < col("id_b") &&
          col("len_a") * 100 >= col("len_b") * tNum &&
          col("len_b") * 100 >= col("len_a") * tNum)
        .select(col("source"), col("id_a"), col("id_b")).distinct()
      val repPairs = cand
        .join(reps.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("source"), col("id_a").as("rep_a"), col("id_b").as("rep_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b"))
              - size(array_intersect(col("sh_a"), col("sh_b"))))).as("jaccard"))
        .filter(col("jaccard") >= NgramThreshold)
      // expand verified representative pairs to member pairs (identical
      // sets ⇒ scores inherit verbatim; within-group pairs sit at 1.0,
      // which always clears the threshold)
      val cross = repPairs
        .join(memb.select(col("rep_id").as("rep_a"), col("doc_id").as("m_a")), Seq("rep_a"))
        .join(memb.select(col("rep_id").as("rep_b"), col("doc_id").as("m_b")), Seq("rep_b"))
        .select(col("source"), least(col("m_a"), col("m_b")).as("id_a"),
          greatest(col("m_a"), col("m_b")).as("id_b"), col("jaccard"))
      val ia = memb.select(col("source"), col("rep_id"), col("doc_id").as("id_a"))
      val ib = memb.select(col("rep_id"), col("doc_id").as("id_b"))
      val intra = ia.join(ib, Seq("rep_id")).filter(col("id_a") < col("id_b"))
        .select(col("source"), col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
      cross.unionByName(intra)
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH sh AS (
        SELECT doc_id, source, ${oShingles("text")} AS sh
        FROM documents WHERE length(text) >= $ShingleN)
      SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $NgramThreshold
      ORDER BY id_a, id_b""")),

    CatalogQuery("qd05_embedding_neardup", (s, d) => {
      // IVF-cell blocked near-dup join — the same deterministic
      // inverted-list geometry as qs02: every vector is posted to its
      // NProbe nearest cells and only pairs sharing a (label, cell) are
      // verified, so the shuffle carries (label, cell, id) keys and the
      // verification join touches candidates only — never the O(n²)
      // within-label fan-out. Candidate fraction ~ NProbe²/K of all-pairs
      // and K grows with the corpus (graft.pipeline.KMeans-trained
      // centroids slot in unchanged). Recall is data-dependent — measured
      // 0.93-1.0 across the test SFs at K=16/NProbe=4 (raise NProbe for
      // recall, K for pruning); the oracle mirrors the blocking exactly,
      // the same contract qd02 uses for LSH banding.
      val K = 16; val NProbe = 4
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // read by centroid collect, cell posting, and verify joins
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
        .collect().sortBy(_._1) // K rows — bounded driver gather
      val bc = s.sparkContext.broadcast(cents)
      def nearestCells(v: Seq[Double], n: Int): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).take(n).map(_._2).toSeq
      val posted = e.select(col("vec_id"), col("label"), col("v"))
        .as[(Long, Int, Seq[Double])]
        .flatMap { case (id, lab, v) => nearestCells(v, NProbe).map(c => (lab, c, id)) }
        .toDF("label", "cell", "vec_id")
      val a = posted.select(col("label"), col("cell"), col("vec_id").as("id_a"))
      val b = posted.select(col("label"), col("cell"), col("vec_id").as("id_b"))
      val cand = a.join(b, Seq("label", "cell")).filter(col("id_a") < col("id_b"))
        .select(col("label"), col("id_a"), col("id_b")).distinct()
      val dot = (x: Column, y: Column) => vdot(x, y)
      cand
        .join(e.select(col("vec_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
        .join(e.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
        .select(col("label"), col("id_a"), col("id_b"),
          (dot(col("v_a"), col("v_b")) /
            (sqrt(dot(col("v_a"), col("v_a"))) * sqrt(dot(col("v_b"), col("v_b"))))).as("cosine"))
        .filter(col("cosine") >= CosineThreshold)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      posted AS (
        SELECT vec_id, label, cid AS cell FROM (
          SELECT e.vec_id, e.label, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      cand AS (
        SELECT DISTINCT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b
        FROM posted a JOIN posted b
          ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id)
      SELECT c.label AS label, c.id_a, c.id_b,
        round(list_dot_product(x.v, y.v) /
          (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cosine
      FROM cand c JOIN e x ON c.id_a = x.vec_id JOIN e y ON c.id_b = y.vec_id
      WHERE list_dot_product(x.v, y.v) /
          (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= $CosineThreshold
      ORDER BY id_a, id_b""")),

    CatalogQuery("qd11_semdedup", (s, d) => {
      // Semantic dedup, the SemDeDup shape (Abbas et al. 2023,
      // arXiv:2303.09540): cluster the embedding space, then prune
      // near-duplicates WITHIN each cluster only — the clustering turns
      // the O(n²) semantic-similarity matrix into K independent
      // O((n/K)²) blocks. Kept set = the greedy lowest-id-first maximal
      // independent set of the within-cluster cosine≥τ graph: a vector
      // is removed iff an already-KEPT lower-id clustermate is within τ
      // (pure dominance over-removes chains; greedy is the reference
      // semantics and is what the recursive-CTE oracle replicates).
      //
      // Scale shape: assignment is a broadcast-centroid map (corpus
      // never shuffles for it); the only shuffle keys by cell, and each
      // cell's greedy runs in ONE task bounded by the cluster size n/K —
      // SemDeDup's premise is K grows with the corpus (the paper uses
      // K≈100k for LAION), so per-task work stays constant at 100 TB.
      // Like qd05/qs02, centroids here are the deterministic vec_id<K
      // set so the oracle can mirror the geometry; KMeans-trained
      // centroids slot in unchanged (qs03 gates that path).
      val K = 16
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // read twice: centroid collect + assignment scan
      val cents: Array[Array[Double]] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
      val bc = s.sparkContext.broadcast(cents)
      val assigned = e.as[(Long, Seq[Double])].map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var acc = 0.0; var i = 0
          while (i < v.length) { val dd = v(i) - cs(c)(i); acc += dd * dd; i += 1 }
          val dist = math.sqrt(acc) // sqrt'd like DuckDB list_distance
          if (dist < bestD) { bestD = dist; best = c } // strict <: lowest cid wins ties
          c += 1
        }
        (best.toLong, id, v)
      }
      val out = assigned.groupByKey(_._1).mapGroups { (cell, it) =>
        val members = it.map(m => (m._2, m._3.toArray)).toArray.sortBy(_._1)
        val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
        var keptIdSum = 0L
        var j = 0
        while (j < members.length) {
          val vj = members(j)._2
          var dup = false
          var ki = 0
          while (ki < kept.length && !dup) {
            val vi = members(kept(ki))._2
            var dotIJ = 0.0; var dotII = 0.0; var dotJJ = 0.0
            var x = 0
            while (x < vj.length) {
              dotIJ += vi(x) * vj(x); dotII += vi(x) * vi(x); dotJJ += vj(x) * vj(x)
              x += 1
            }
            dup = dotIJ / (math.sqrt(dotII) * math.sqrt(dotJJ)) >= CosineThreshold
            ki += 1
          }
          if (!dup) { kept += j; keptIdSum += members(j)._1 }
          j += 1
        }
        (cell, members.length.toLong, kept.length.toLong,
          (members.length - kept.length).toLong, keptIdSum)
      }.toDF("cell", "n_members", "n_kept", "n_removed", "kept_id_sum")
      out.orderBy(col("cell"))
    }, Some(s"""
      WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      m AS (
        SELECT vec_id, v, cell FROM (
          SELECT e.vec_id, e.v, cent.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      -- within-cluster similar pairs; the greedy recursion below only needs
      -- this (tiny) edge list, never the vectors again. NOTE: no MATERIALIZED
      -- hints anywhere — DuckDB 1.x evaluates the correlated EXISTS against a
      -- materialized CTE inside recursion INCORRECTLY (verified against a
      -- numpy ground-truth greedy; the default inlined form is correct).
      pairs AS (
        SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b
        FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= $CosineThreshold),
      -- vertices touched by any pair, rank-ordered per cell; unpaired
      -- vertices are trivially kept, which keeps the recursion depth at
      -- max paired-vertices-per-cell instead of max cluster size
      pv AS (
        SELECT cell, vec_id, row_number() OVER (PARTITION BY cell ORDER BY vec_id) rk
        FROM (SELECT DISTINCT cell, id_a AS vec_id FROM pairs
              UNION SELECT DISTINCT cell, id_b FROM pairs) u),
      -- greedy lowest-id-first MIS: advance one rank per iteration carrying
      -- the accumulated kept set (the working table alone is not enough)
      g(cell, rk, kept_ids) AS (
        SELECT DISTINCT cell, 0::BIGINT, []::BIGINT[] FROM pv
        UNION ALL
        SELECT g.cell, g.rk + 1,
          CASE WHEN EXISTS (SELECT 1 FROM pairs p WHERE p.cell = g.cell
                 AND p.id_b = cur.vec_id AND list_contains(g.kept_ids, p.id_a))
          THEN g.kept_ids ELSE list_append(g.kept_ids, cur.vec_id) END
        FROM g JOIN pv cur ON cur.cell = g.cell AND cur.rk = g.rk + 1),
      fin AS (
        SELECT cell, kept_ids FROM (
          SELECT cell, kept_ids, row_number() OVER (PARTITION BY cell ORDER BY rk DESC) rn
          FROM g) t WHERE rn = 1),
      pvn AS (SELECT cell, count(*) AS n_paired, sum(vec_id) AS paired_id_sum
              FROM pv GROUP BY 1),
      mem AS (SELECT cell, count(*)::BIGINT AS n_members, sum(vec_id)::BIGINT AS id_sum
              FROM m GROUP BY 1)
      SELECT mem.cell AS cell, mem.n_members,
        (mem.n_members - COALESCE(pvn.n_paired, 0) + COALESCE(len(f.kept_ids), 0))::BIGINT AS n_kept,
        (COALESCE(pvn.n_paired, 0) - COALESCE(len(f.kept_ids), 0))::BIGINT AS n_removed,
        (mem.id_sum - COALESCE(pvn.paired_id_sum, 0)
          + COALESCE(list_sum(f.kept_ids), 0))::BIGINT AS kept_id_sum
      FROM mem LEFT JOIN pvn ON mem.cell = pvn.cell LEFT JOIN fin f ON mem.cell = f.cell
      ORDER BY cell"""), headline = true),

    CatalogQuery("qd08_dup_spans", (s, d) => {
      // Substring-level exact dedup (the ExactSubstr shape from
      // "Deduplicating Training Data Makes Language Models Better",
      // Lee et al. 2022): a span of DupSpanW consecutive tokens that
      // occurs in more than one document is boilerplate/quotation — per
      // doc we report how many of its spans (and how many distinct span
      // values) are duplicated corpus-wide. Doc-level dedup (qd01-qd07)
      // misses these partial overlaps entirely.
      //
      // Scale shape: spans never materialize as strings past the hash —
      // each position contributes one (doc_id, hash60) pair, the same
      // keys-only row class qd02 shuffles. The duplicate-set aggregation
      // and the position⋈duplicate join both key by the hash: with a
      // small duplicate set AQE broadcasts it (pos is never shuffled at
      // all); with a large one both sides shuffle by h. Either way the
      // corpus contributes only hashed pairs, never an all-pairs form.
      val W = DupSpanW
      val toks = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      // sequence(1, n) counts DOWN when n < 1 (CLAUDE.md gotcha) — guard
      // short docs to an empty span list explicitly
      val pos = toks.select(col("doc_id"),
        explode(when(size(col("w")) >= W,
          transform(sequence(lit(1), size(col("w")) - (W - 1)),
            i => TextOps.hash60(concat_ws(" ", slice(col("w"), i, lit(W))))))
          .otherwise(array().cast("array<bigint>"))).as("h"))
      val dup = pos.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("h"))
      val perDoc = pos.join(dup, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_spans"),
          countDistinct(col("h")).as("n_dup_grams"))
      val base = toks.select(col("doc_id"),
        greatest(size(col("w")) - (W - 1), lit(0)).cast("long").as("n_spans"))
      base.join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                 FROM documents),
      pos AS (SELECT t.doc_id,
          CAST(('0x' || substr(md5(array_to_string(w[u.i : u.i + ${DupSpanW - 1}], ' ')), 1, 15)) AS BIGINT) AS h
        FROM t, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(w) - ${DupSpanW - 1}, 0))) AS i) u),
      dup AS (SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) > 1),
      pd AS (SELECT doc_id, count(*) AS n_dup_spans,
               count(DISTINCT h) AS n_dup_grams
             FROM pos JOIN dup USING (h) GROUP BY doc_id),
      base AS (SELECT doc_id,
          greatest(len(regexp_split_to_array(trim(text), '\\s+')) - ${DupSpanW - 1}, 0) AS n_spans
        FROM documents)
      SELECT base.doc_id, base.n_spans,
        coalesce(pd.n_dup_spans, 0) AS n_dup_spans,
        coalesce(pd.n_dup_grams, 0) AS n_dup_grams
      FROM base LEFT JOIN pd USING (doc_id)
      ORDER BY doc_id""")),

    CatalogQuery("qd09_block_dedup", (s, d) => {
      // C4-style boilerplate REMOVAL at block granularity (Raffel et al.
      // 2020 dropped any 3-sentence span occurring more than once; this
      // corpus has no sentence marks, so the unit is the non-overlapping
      // 8-token block): a block whose hash occurs in >1 distinct document
      // is boilerplate and is dropped from every document carrying it.
      // Where qd08 REPORTS overlapping duplicated spans, this op emits the
      // cleaned-corpus accounting a filtering pipeline acts on: blocks
      // kept/removed and surviving token count per document.
      //
      // Scale shape: identical row class to qd08 — each doc contributes
      // ceil(n/W) hashed (doc_id, block#, h, len) rows, never the block
      // strings; the boilerplate set is a hash aggregation and the
      // join back is keyed by h (AQE broadcasts a small set). Removal
      // accounting is a per-doc re-aggregation of the already-hashed rows
      // — the corpus text is scanned exactly once.
      val W = DupSpanW
      val toks = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      // block index i covers tokens [i*W+1, i*W+W] (last block may be
      // short); ceil-division block count is >= 1 since docs are nonempty
      val blocks = toks.select(col("doc_id"),
          explode(transform(sequence(lit(0L), (ceil(size(col("w")) / lit(W.toDouble))).cast("long") - 1),
            i => struct(
              TextOps.hash60(concat_ws(" ", slice(col("w"), (i * W + 1).cast("int"), lit(W)))).as("h"),
              size(slice(col("w"), (i * W + 1).cast("int"), lit(W))).cast("long").as("blen")))).as("b"))
        .select(col("doc_id"), col("b.h").as("h"), col("b.blen").as("blen"))
      val boiler = blocks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select(col("h"), lit(1).as("dup"))
      blocks.join(boiler, Seq("h"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("dup").isNull, col("blen")).otherwise(0L)).as("n_tokens_kept"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                 FROM documents),
      blk AS (SELECT doc_id,
          CAST(('0x' || substr(md5(array_to_string(w[u.i * $DupSpanW + 1 : u.i * $DupSpanW + $DupSpanW], ' ')), 1, 15)) AS BIGINT) AS h,
          len(w[u.i * $DupSpanW + 1 : u.i * $DupSpanW + $DupSpanW]) AS blen
        FROM t, LATERAL (SELECT unnest(range(CAST(ceil(len(w) / $DupSpanW.0) AS BIGINT))) AS i) u),
      boiler AS (SELECT h FROM blk GROUP BY h HAVING count(DISTINCT doc_id) > 1)
      SELECT blk.doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        CAST(sum(CASE WHEN boiler.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        CAST(sum(CASE WHEN boiler.h IS NULL THEN blk.blen ELSE 0 END) AS BIGINT) AS n_tokens_kept
      FROM blk LEFT JOIN boiler ON blk.h = boiler.h
      GROUP BY blk.doc_id
      ORDER BY blk.doc_id""")),

    CatalogQuery("qd10_bloom_decontam", (s, d) => {
      // Benchmark decontamination with a Bloom prefilter — the GPT-3-style
      // n-gram overlap check (Brown et al. 2020 removed training docs
      // sharing 13-grams with benchmarks; window here is the corpus's
      // qd08 span unit): the eval split's distinct span hashes build a
      // mergeable Bloom filter (functions.Bloom — fixed m/8-byte summary,
      // independent of corpus size), which broadcasts to a single scan of
      // the train split; only bloom-positive postings reach the exact
      // verify join. Contracts proven DISTRIBUTIVELY, oracle pins exact
      // counts + TRUE (qs03 pattern):
      //  - no_false_negatives: every exactly-contaminated posting is
      //    bloom-positive (Bloom's defining one-sided-error guarantee);
      //  - fp_bounded: bloom-positive-but-clean postings stay under the
      //    analytic (1-e^(-kn/m))^k expectation plus 3 Poisson sigmas
      //    plus an absolute slack of 5 — the filter is sized (m=2^21,
      //    k=4), not accidentally degenerate. The slack term matters: at
      //    gate SFs the expected fp count is O(1), where a bare
      //    3x-expectation bound is an ~10%-tail coin flip (r6: fp=2 vs
      //    E=0.57 on regenerated data); λ+3√λ+5 is a ≥5-sigma bound at
      //    every λ while staying asymptotically 1+ε-tight at scale.
      //
      // Scale shape: the eval/benchmark side is small by nature — its
      // filter is 256 KB regardless of train-corpus size; the 100 TB side
      // is scanned once with a stateless per-row probe and only candidate
      // postings (exact hits + a bounded fp trickle) enter the join. The
      // at-gate-SF full exact join exists ONLY to prove the contracts.
      import graft.functions.Bloom
      val W = DupSpanW
      val spans = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"),
          splitBucket.as("bucket"))
        .select(col("doc_id"), col("bucket"),
          explode(when(size(col("w")) >= W,
            transform(sequence(lit(1), size(col("w")) - (W - 1)),
              i => TextOps.hash60(concat_ws(" ", slice(col("w"), i, lit(W))))))
            .otherwise(array().cast("array<bigint>"))).as("h"))
        .persist() // three derivations below; released before returning
      val evalSpans = spans.filter(col("bucket") >= 90)
        .select(col("h")).distinct().persist()
      val nEval = evalSpans.count()
      val bits = evalSpans.agg(Bloom.bloomBuild(BloomBits, BloomK)(col("h")))
        .head().getSeq[Long](0).toArray
      evalSpans.unpersist()
      val bcBits = s.sparkContext.broadcast(bits)
      val trainPos = bloomProbeStage(spans, bcBits).persist()
      val exact = trainPos.join(
        spans.filter(col("bucket") >= 90).select(col("h")).distinct(),
        Seq("h"), "left_semi").persist()
      val nTrainPos = trainPos.count()
      val nCandidates = trainPos.filter(col("hit")).count()
      val exactAgg = exact.agg(
        count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"),
        sum(when(col("hit"), 0L).otherwise(1L)).as("fn")).head()
      val (nExact, nContamDocs) = (exactAgg.getLong(0), exactAgg.getLong(1))
      val falseNegs = if (nExact == 0) 0L else exactAgg.getLong(2)
      trainPos.unpersist()
      exact.unpersist()
      spans.unpersist()
      bcBits.unpersist()
      val expFp = Bloom.expectedFpp(BloomBits, BloomK, nEval) * nTrainPos
      val fpBound = expFp + 3.0 * math.sqrt(expFp) + 5.0
      System.err.println(s"[qd10] eval_spans=$nEval train_postings=$nTrainPos " +
        s"candidates=$nCandidates exact=$nExact fp=${nCandidates - nExact} " +
        f"fp_bound=$fpBound%.2f")
      import s.implicits._
      Seq((nContamDocs, nExact, falseNegs == 0L,
        (nCandidates - nExact).toDouble <= fpBound))
        .toDF("n_contam_docs", "n_contam_postings", "no_false_negatives", "fp_bounded")
    }, Some(s"""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents),
      pos AS (SELECT DISTINCT t.doc_id, t.bucket,
          CAST(('0x' || substr(md5(array_to_string(w[u.i : u.i + ${DupSpanW - 1}], ' ')), 1, 15)) AS BIGINT) AS h
        FROM t, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(w) - ${DupSpanW - 1}, 0))) AS i) u),
      ev AS (SELECT DISTINCT h FROM pos WHERE bucket >= 90),
      contam AS (SELECT pos.doc_id, pos.h FROM pos JOIN ev USING (h)
                 WHERE pos.bucket < 90)
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contam_docs,
        CAST(count(*) AS BIGINT) AS n_contam_postings,
        TRUE AS no_false_negatives,
        TRUE AS fp_bounded
      FROM contam""")),

    // ---------- similarity search ----------

    CatalogQuery("qs01_ann_topk", (s, d) => {
      val e = hoistNorm(table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
        "v", "vnorm")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("vnorm").as("qnorm"))
      val scored = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      topkRanked(scored)
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM e CROSS JOIN q WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""), headline = true),

    CatalogQuery("qs14_index_serve", (s, d) => {
      // The PERSISTENT-index serving path under the correctness gate:
      // build the IvfIndexStore artifact (centroids + cell-partitioned
      // postings) and answer the standard query batch FROM THE ARTIFACT
      // — same deterministic geometry as qs02 (vec_id<16 centroids,
      // nprobe=4), so the oracle is qs02's SQL verbatim. This gates the
      // whole build→persist→prune→serve path (partition pruning, posting
      // layout, dedup, rank order) against DuckDB, not just against
      // specs. Scale shape: serving opens only the probed nprobe/K cell
      // partitions (PartitionFilters, pinned in IvfIndexSpec).
      Serve.queryIvfIndex(s, d, Serve.buildIvfIndex(s, d))
    }, Some(oIvfTopkSql), headline = true),

    CatalogQuery("qs16_index_delete_serve", (s, d) => {
      // Index deletion under the correctness gate — the takedown/GDPR
      // path: build the persistent index, TOMBSTONE a fixed id list
      // (O(|ids|), no store rewrite), and serve the standard batch. The
      // oracle is the shared IVF SQL with the deleted ids filtered from
      // the POSTING side only — centroids and the query batch keep the
      // full geometry, which is exactly the artifact's fixed-at-build
      // semantics (id 7 seeds a centroid that survives its own posting's
      // deletion). Gates the whole delete→anti-join→serve path, incl.
      // that the broadcast tombstone anti-join runs AFTER partition
      // pruning (pinned in IvfIndexSpec, with compact-equivalence and
      // no-resurrection contracts).
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs16-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir)
      graft.sinks.IvfIndexStore.delete(s, idxDir, DeletedVecIds)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.IvfIndexStore.query(s, idxDir, queries, nProbe = 4, topK = 10)
    }, Some(oIvfTopkSqlWhere(
      s"e.vec_id NOT IN (${DeletedVecIds.mkString(", ")})"))),

    CatalogQuery("qs02_ann_ivf", (s, d) => {
      // IVF-bucketed ANN — the 100 TB path: vectors are pre-assigned to
      // inverted lists (cells); a query probes only its nearest cells, so
      // the scan touches nprobe/K of the corpus instead of all of it.
      // Deterministic variant for the oracle: centroids = vectors with
      // vec_id < K (a k-means fit would slot in here unchanged).
      val K = 16; val NProbe = 4
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      val bc = s.sparkContext.broadcast(cents)
      def nearestCells(v: Seq[Double], n: Int): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).take(n).map(_._2).toSeq
      val assigned = hoistNorm(e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, nearestCells(v, 1).head) }
        .toDF("vec_id", "v", "cell"), "v", "vnorm")
      val queries = hoistNorm(e.filter(col("vec_id") < 5).as[(Long, Seq[Double])]
        .flatMap { case (id, v) => nearestCells(v, NProbe).map(c => (id, v, c)) }
        .toDF("query_id", "qv", "cell"), "qv", "qnorm")
      val scored = assigned.join(broadcast(queries), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      topkRanked(scored)
    }, Some(oIvfTopkSql)),

    CatalogQuery("qs20_range_search", (s, d) => {
      // RANGE (radius) search — the other half of the ANN API surface
      // next to top-k (FAISS range_search): return EVERY corpus vector
      // within a fixed cosine radius of each query, however many there
      // are. Top-k answers "the nearest k whatever their quality"; range
      // search answers "everything at least this similar" — the right
      // primitive for recall-critical jobs (takedown sweeps, contamination
      // checks, near-dup audits around a known-bad exemplar) where a k
      // cut-off silently drops qualifying neighbors.
      //
      // Scale shape: identical IVF probe pruning to qs02 (deterministic
      // vec_id<K centroids so the oracle mirrors the geometry; a trained
      // KMeans fit slots in unchanged) — corpus assigned once to its
      // nearest cell, queries posted to nprobe cells, the join is keyed
      // by cell with the tiny query side broadcast. The finish is a
      // STATELESS filter: no per-query sort, no window, no top-k state —
      // output volume IS the answer set. Radius 0.30 sits below the qd05
      // near-dup bar (0.35) so the sweep surfaces the wider neighborhood.
      val K = 16; val NProbe = 4; val Radius = 0.30
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1) // K rows — bounded
      val bc = s.sparkContext.broadcast(cents)
      def nearestCells(v: Seq[Double], n: Int): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).take(n).map(_._2).toSeq
      val assigned = hoistNorm(e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, nearestCells(v, 1).head) }
        .toDF("vec_id", "v", "cell"), "v", "vnorm")
      val queries = hoistNorm(e.filter(col("vec_id") < 5).as[(Long, Seq[Double])]
        .flatMap { case (id, v) => nearestCells(v, NProbe).map(c => (id, v, c)) }
        .toDF("query_id", "qv", "cell"), "qv", "qnorm")
      assigned.join(broadcast(queries), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
        .filter(col("cosine") >= Radius)
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("vec_id"))
    }, Some(oRangeSearchSql)),

    CatalogQuery("qs22_mips_topk", (s, d) => {
      // Max-inner-product search (MIPS) — the recommender / two-tower
      // serving primitive (FAISS IndexFlatIP): rank by the RAW dot
      // product, not cosine. Under varying corpus norms the two orders
      // genuinely differ — a longer vector outranks a better-aligned
      // short one — and that is the point: a trained two-tower scorer
      // bakes popularity/propensity into the norm, so normalizing it
      // away (cosine) changes the model's answer. Completes the scoring
      // ladder next to cosine (qs01), quantized (qs05/qs07/qs11) and
      // late-interaction MaxSim (qs19).
      //
      // Scale shape: qs01's discipline — the tiny query set broadcasts
      // onto ONE corpus scan (pinned no-corpus-shuffle class), the dot
      // is the codegen'd VecDot kernel, and the finish is the bounded
      // TopKByScore aggregator (map-side ≤k partials), never a
      // per-query window sort. IVF candidate generation slots in front
      // unchanged (with the standard MIPS-to-L2 reduction caveats).
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          vdot(col("qv"), col("v")).as("dot"))
      topkRanked(scored, "dot")
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT query_id, vec_id, list_dot_product(qv, v) AS dot
        FROM e CROSS JOIN q WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank""")),

    CatalogQuery("qs21_index_range_serve", (s, d) => {
      // Range search served FROM THE ARTIFACT — qs14's story for the
      // radius primitive: build the IvfIndexStore once, then answer the
      // takedown-sweep question from the persisted postings with the
      // same probe-cell partition pruning (only nprobe/K cell dirs
      // open), replay dedup, and tombstone semantics as top-k serving.
      // Same deterministic geometry and radius as qs20, so the oracle is
      // qs20's SQL verbatim — gating build→persist→prune→filter end to
      // end on the sweep path a recall-critical job actually runs.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs21-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < 5)
      graft.sinks.IvfIndexStore.rangeQuery(s, idxDir, queries,
        nProbe = 4, radius = 0.30)
    }, Some(oRangeSearchSql)),

    CatalogQuery("qs04_ann_batch", (s, d) => {
      // Many-query batch ANN (offline inference over the whole corpus:
      // "top-3 neighbors for EVERY vector"): with a large query set the
      // broadcast strategy of qs01/qs02 flips — queries are posted to
      // their nprobe nearest cells and joined to the cell-assigned corpus
      // by an ordinary KEYED equi-join (both sides shuffle on cell, no
      // broadcast), then the bounded top-k aggregator ranks per query.
      // Same deterministic vec_id<K blocking as qs02 so the oracle
      // mirrors the pruning exactly; candidate work is ~nprobe/K of the
      // n² all-pairs score matrix.
      val K = 16; val NProbe = 4; val TopK = 3
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // centroid collect + corpus assignment + query posting
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      val bc = s.sparkContext.broadcast(cents)
      def nearestCells(v: Seq[Double], n: Int): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).take(n).map(_._2).toSeq
      val assigned = hoistNorm(e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, nearestCells(v, 1).head) }
        .toDF("vec_id", "v", "cell"), "v", "vnorm")
      val queries = hoistNorm(e.as[(Long, Seq[Double])]
        .flatMap { case (id, v) => nearestCells(v, NProbe).map(c => (id, v, c)) }
        .toDF("query_id", "qv", "cell"), "qv", "qnorm")
      val scored = assigned.join(queries, Seq("cell")) // keyed, NOT broadcast
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(TopK)
      scored.groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), (col("pos") + 1).as("rank"), col("col.vec_id").as("vec_id"))
        .orderBy(col("query_id"), col("rank"))
    }, Some(oBatchAnnSql)),

    CatalogQuery("qs24_index_batch_serve", (s, d) => {
      // The DISTRIBUTED large-batch serve path of the persistent IVF
      // store under the correctness gate — qs14's story at qs04's scale:
      // build the IvfIndexStore artifact once, then answer "top-3 for
      // EVERY vector" from it via IvfIndexStore.queryBatch, which never
      // collects the query batch (centroids broadcast, map-side cell
      // assignment, KEYED join against the pruned postings — the fused
      // qs04 plan reading from the artifact). Same deterministic
      // vec_id<16 / nprobe=4 geometry as qs04, so the oracle is qs04's
      // SQL verbatim — gating that the store's large-batch path ranks
      // bit-identically to the fused plan a driver-side collect could
      // never survive. Scale shape: the only serve-time collect is the
      // probed CELL domain (≤ K values whatever the batch size).
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs24-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      graft.sinks.IvfIndexStore.queryBatch(s, idxDir, queries,
        nProbe = 4, topK = 3)
    }, Some(oBatchAnnSql)),

    CatalogQuery("qs25_index_batch_range_serve", (s, d) => {
      // The distributed-serve matrix completed on the RANGE axis: the
      // corpus-wide takedown sweep ("everything within r of ANY corpus
      // vector" — the self-audit that surfaces every near-dup
      // neighborhood at once) served from the persistent IVF store via
      // IvfIndexStore.rangeQueryBatch — map-side cell assignment, keyed
      // join, STATELESS filter finish, and no driver-side collect of the
      // corpus-sized query batch. qs20's geometry and radius with EVERY
      // vector as a query, so the oracle is qs20's SQL with the query
      // filter dropped — output volume IS the answer set on both engines.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs25-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      graft.sinks.IvfIndexStore.rangeQueryBatch(s, idxDir, queries,
        nProbe = 4, radius = 0.30)
    }, Some(oBatchRangeSql)),

    CatalogQuery("qs26_index_batch_filtered_serve", (s, d) => {
      // The distributed-serve matrix completed on the FILTERED axis:
      // every vector queries WITHIN ITS OWN LABEL from the
      // metadata-scoped store via IvfIndexStore.queryFilteredBatch —
      // map-side (cell, meta) posting, keyed join on BOTH axes (the
      // predicate lives in the join key, qs12's insight at batch
      // scale), no driver-side collect of the corpus-sized batch; the
      // label domain is small here, so the meta partition axis prunes
      // too. qs12's deterministic geometry with all queries and k=3,
      // so the oracle is qs12's SQL with the query filter dropped.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs26-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir,
        metaCol = Some("label"))
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      graft.sinks.IvfIndexStore.queryFilteredBatch(s, idxDir, queries,
        nProbe = 4, topK = 3)
    }, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, label, v, cid AS cell FROM (
          SELECT e.vec_id, e.label, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, label, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.label, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell, label) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 3
      ORDER BY query_id, rank""")),

    CatalogQuery("qs27_graph_ann_search", (s, d) => {
      // GRAPH-based ANN — the navigable-small-world family (NSW; HNSW
      // minus the level hierarchy), completing the index-paradigm matrix
      // next to IVF (qs02), PQ (qs07), int8 (qs05), sign sketches (qs11)
      // and LSH (qd02): a bounded-degree kNN graph built with CELL-BLOCKED
      // candidate generation (multi-assign to 2 nearest cells for
      // cross-cell edges; pairs only within a cell — never all-pairs)
      // plus one NN-descent neighbour-of-neighbour refinement round
      // (≤ n × degree² keyed-join rows), then a beam search whose per-hop
      // cost is frontier × degree — after the one-off build, query cost
      // is independent of corpus size (graft.pipeline.KnnGraph has the
      // full 100 TB shape: edges partitioned by src stay put, only the
      // ≤ queries × beam frontier moves per hop, ranking is the bounded
      // TopKByScore aggregator throughout).
      //
      // Graph navigation is float-geometry-dependent (which neighbours a
      // walk reaches depends on every truncation along the way), so like
      // qs03/qs05/qs07 the oracle can't mirror the plan; the gate is the
      // bounded recall contract vs the exact brute-force truth (qs01's
      // plan): top-10-after-search must recover ≥90% of the true top-10.
      // Degree=12 / beam=32 / hops=4 / entries={0..3}: measured avg
      // recall 1.000 (min-query 1.000) at ALL of sf0.001/sf0.01/sf0.1
      // (re-measured r10 under the two-level coarse-to-fine assignment,
      // MinCoarseProbe=3). The neighbouring configs FAIL the margin
      // discipline — deg=12 hops=3 reads avg 0.88 / min 0.40 at sf0.1,
      // degree=8 hops=4 reads 0.92 / 0.70 at sf0.1, degree=8 hops=3
      // reads avg 0.92 / min 0.70 at sf0.01 — re-measure
      // (GraphAnnProbeMain) before shrinking ANY constant.
      val Assign = 2; val Degree = 12; val Beam = 32
      val Hops = 4; val NQueries = 5
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // graph build + search + truth scan reuse it
      // Cell COUNT scales with the corpus (~400 rows/cell) so the in-cell
      // pair join stays O(n × cellWidth) = linear in n — a fixed K would
      // make build cost quadratic (Σ cell² = 4n²/K). Assignment against
      // the k = n/400 centroids is KnnGraph's two-level coarse-to-fine
      // scan (O(√k) per vector), so it is sub-quadratic too. At
      // sf0.001/sf0.01 this resolves to the measured K=16 geometry; at
      // sf0.1 to K=160.
      val K = math.max(16L, e.count() / 400L)
      // a RELATION, not a collect: the build holds only √K seeds driver-side
      val cents = e.filter(col("vec_id") < K)
      val edges = graft.pipeline.KnnGraph.build(e, cents, Assign, Degree)
        .persist() // each of the Hops beam expansions joins against it
      val queries = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      // the walk's checkpoint state is RDD-level (invisible to the
      // between-query clearCache) — materialize the tiny top-k table
      // (NQueries × k rows) and release the scope eagerly, so the gate
      // run carries zero walk blocks forward (WalkScope discipline)
      val scope = new graft.core.WalkScope
      val visited = graft.pipeline.KnnGraph
        .search(e, edges, queries, Seq(0L, 1L, 2L, 3L), Beam, Hops, scope)
      val topkRows = topkRanked(
          visited.filter(col("vec_id") =!= col("query_id")))
        .select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect()
      scope.release()
      val graphTopk = topkRows.toSeq.toDF("query_id", "vec_id")
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(graphTopk.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs28_graph_index_serve", (s, d) => {
      // The PERSISTENT graph-ANN path (sinks/GraphIndexStore): qs27's
      // engine behind the build-once/serve-many artifact protocol —
      // bucket-partitioned edges+vectors, per-hop partition-pruned
      // frontier reads, NSW insertion appends, tombstone deletes, epoched
      // compaction (the fourth store next to qd17/qs14/qt23's trio). This
      // row gates the whole build→persist→prune→walk pipeline from
      // scratch; GraphIndexStoreSpec pins the store serve bit-identical
      // to the in-memory KnnGraph.search on a fresh store, so the recall
      // contract inherits qs27's measured margins (deg=12/beam=32/hops=4:
      // avg recall 1.000 at ALL SFs — see qs27's comment before shrinking
      // anything). Oracle = the same bounded contract: top-10-from-store
      // must recover ≥90% of the exact brute-force top-10 (qs01's plan).
      val idxDir = Serve.buildGraphIndex(s, d)
      val graphTopk = Serve.queryGraphIndex(s, d, idxDir)
        .select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(graphTopk.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q"""),
      headline = true),

    CatalogQuery("qs29_graph_delete_serve", (s, d) => {
      // The TAKEDOWN path on the graph artifact — completing the
      // delete-serve gate matrix across all four stores (qs16 IVF, qd21
      // band, qt29 text): tombstone exactly the ids retrieval would most
      // want (each query's TRUE rank-1 neighbour — the hardest deletion,
      // since those nodes are both answers and routing hubs the walk
      // used to reach their neighbourhoods), then serve the standard
      // batch. Deletes are O(|ids|) tombstones; serving anti-joins them
      // AFTER partition pruning and the walk routes around them (a
      // tombstoned node stops expanding — graceful recall degradation
      // until compact rewrites the graph). Ids < 5 are exempt from the
      // takedown only to keep the pinned entry points 0..3 alive — the
      // all-entries-tombstoned case fails loudly by design
      // (GraphIndexStoreSpec pins it). Contract: (a) no tombstoned id is
      // ever served, (b) top-10 recall vs the exact brute-force truth
      // over the SURVIVING corpus stays ≥ 0.90 — measured avg 1.000 /
      // min 1.000 at sf0.001/sf0.01/sf0.1 under deg=12/beam=32/hops=4
      // (qs27's geometry; GraphDeleteProbeMain re-measures — run it
      // before shrinking anything).
      import s.implicits._
      val idxDir = Serve.buildGraphIndex(s, d)
      val truthFull = QueryCatalog.byName("qs01_ann_topk").build(s, d)
      val deleted = truthFull
        .filter(col("rank") === 1 && col("vec_id") >= 5)
        .select(col("vec_id")).distinct().as[Long].collect().sorted.toSeq
      graft.sinks.GraphIndexStore.delete(s, idxDir, deleted)
      val served = Serve.queryGraphIndex(s, d, idxDir)
        .select(col("query_id"), col("vec_id")).persist()
      val nDeletedServed = served
        .filter(col("vec_id").isInCollection(deleted)).count()
      // surviving-corpus truth: qs01's exact brute-force plan with the
      // tombstoned ids filtered from the corpus side (the store's delete
      // semantics — queries keep the full geometry)
      val e = hoistNorm(table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
        "v", "vnorm")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("vnorm").as("qnorm"))
      val scored = e.filter(!col("vec_id").isInCollection(deleted))
        .crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val truth = topkRanked(scored).select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(served.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"),
          lit(nDeletedServed == 0L).as("zero_deleted_served"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090,
        TRUE AS zero_deleted_served
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs30_graph_filtered_serve", (s, d) => {
      // FILTERED serving from the metadata-scoped graph store — qs12's
      // tenant/label-scoped retrieval shape on the graph paradigm
      // (GraphIndexStore.queryFiltered). r13: the scoped store's edge
      // plane is LABEL-DISJOINT (one NSW subgraph per label, built in one
      // distributed pass — KnnGraph.buildScoped) with per-label entry
      // points, and each query seeds from its own label's entries — the
      // walk structurally never visits a cross-label node, so filtered
      // retrieval IS unfiltered retrieval on a corpus L× smaller and the
      // old rank-time filter + beam-64 oversample are gone. Contract:
      // (a) every served neighbour carries the query's label, (b) top-10
      // AVG recall vs the exact same-label brute force ≥ 0.90.
      // Beam=32/hops=4 — the PLAIN unscoped-store geometry, no filtered
      // oversampling — MEASURED (GraphFilteredProbeMain r13) avg AND min
      // 1.000 at EVERY grid point down to beam=8/hops=3 at every SF
      // (pre-r13 rank-filter: beam=32 read 0.86 avg at sf0.1, beam=64
      // required); the pin keeps 2× margin over the smallest passing
      // beam. Re-measure before shrinking.
      val Beam = 32; val Hops = 4
      val e = table(s, d, "embeddings")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs30-gidx").toString
      graft.sinks.GraphIndexStore.build(e, idxDir, degree = 12, assign = 2,
        nEntries = 4, metaCol = Some("label"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      val served = graft.sinks.GraphIndexStore.queryFiltered(s, idxDir,
          queries, Beam, Hops, AnnTopK)
        .select(col("query_id"), col("vec_id")).persist()
      // (a) label exactness: joined against the corpus labels, every
      // served row must match its query's label
      val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      val crossLabel = served
        .join(labels, Seq("vec_id"))
        .join(labels.select(col("vec_id").as("query_id"),
          col("l").as("ql")), Seq("query_id"))
        .filter(col("l") =!= col("ql")).count()
      // (b) recall vs the exact same-label brute force (qs01's plan with
      // the label equi-predicate in the scoring join)
      val ev = hoistNorm(e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        col("label").cast("string").as("vl")), "v", "vnorm")
      val qh = hoistNorm(queries, "qv", "qnorm")
      val scored = ev.crossJoin(broadcast(qh))
        .filter(col("vec_id") =!= col("query_id") && col("vl") === col("meta"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val truth = topkRanked(scored).select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(served.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"),
          lit(crossLabel == 0L).as("zero_cross_label"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090,
        TRUE AS zero_cross_label
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs31_pq_index_serve", (s, d) => {
      // The PERSISTENT IVF-PQ path (sinks/IvfPqIndexStore): the COMPRESSED
      // store completing the artifact matrix — qs07's norm-free PQ recipe
      // (L2-normalize, 8 subspaces × 256-centroid codebooks, 64× smaller
      // code rows) fused with qs02's IVF cell pruning and served behind
      // the ArtifactStore protocol. Serve = partition-pruned code scan →
      // codegen'd PqAdc table-lookup scoring → bounded candidate
      // truncation → EXACT-cosine rerank over vbucket-pruned point reads
      // of the survivors. Memory-per-vector is the real 100 TB serving
      // constraint; this is the layout that fits the hot plane in memory.
      // Quantization + probing make the oracle non-mirrorable (qs03/qs07's
      // adjudication), so the gate is the bounded recall contract:
      // top-10-from-store must recover ≥90% AVG of qs01's brute-force
      // truth. K=16 / S=8 / SubK=256 / NProbe=10 / CandK=24·topK MEASURED
      // avg 0.980 / 0.960 / 0.980 at sf0.001 / sf0.01 / sf0.1 (min 0.900
      // at each) — CandK=16·topK FAILS the margin at sf0.1 (avg 0.94 /
      // min 0.80) and NProbe=8 reads 0.94-0.96 avg; re-measure
      // (PqIndexProbeMain) before shrinking anything.
      val idxDir = Serve.buildPqIndex(s, d)
      val got = Serve.queryPqIndex(s, d, idxDir)
        .select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(got.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q"""),
      headline = true),

    CatalogQuery("qs32_pq_batch_serve", (s, d) => {
      // DISTRIBUTED serving on the COMPRESSED store — the offline-
      // inference shape ("top-k for every vector of a corpus") through
      // IvfPqIndexStore.queryBatch: map-side ADC tables, keyed joins
      // everywhere (cell for candidates, query_id for tables, vec_id for
      // the exact rerank), nothing about the batch on the driver; the
      // only serve-time collect is the ≤K probed-cell domain. The gate is
      // the qp08-style independent-formulation contract: the WHOLE corpus
      // queries through BOTH serve paths (the driver path legitimately
      // serves it — corpus ≤ its 4096 cap at gate SFs) and the row proves,
      // IN SPARK via symmetric anti-joins, that the two return identical
      // (query_id, rank, vec_id) sets — the same shared-kernel identity
      // PqIndexStoreSpec pins, graded distributively. Retrieval QUALITY
      // is qs31's gate (sampled queries, measured margins); for the
      // record, corpus-wide avg recall at NProbe=10/CandK=240 measures
      // 0.826/0.827/0.833 across SFs (PqIndexProbeMain corpus-batch
      // section) — probe loss on these near-random synthetic embeddings,
      // NOT a serve-path defect: the 10/16-cell scan bounds how many true
      // top-10 members are even visible, and nprobe is the production
      // recall/scan-fraction knob (qs03's documented tradeoff).
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs32-pq").toString
      graft.sinks.IvfPqIndexStore.build(table(s, d, "embeddings"),
        k = 16, nSub = 8, subK = 256, idxDir)
      // the 4096 LOWEST ids (today: the whole corpus at every SF) — a
      // static bound mirrored in the oracle's LIMIT, so a future testdata
      // regeneration that outgrows the driver path's batch cap shrinks
      // the compared batch instead of hard-failing the row
      val allQ = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .orderBy(col("query_id")).limit(4096)
        .persist() // both serve paths read it
      val viaBatch = graft.sinks.IvfPqIndexStore.queryBatch(s, idxDir, allQ,
        nProbe = 10, topK = AnnTopK, candK = 24 * AnnTopK)
      val viaDriver = graft.sinks.IvfPqIndexStore.query(s, idxDir, allQ,
        nProbe = 10, topK = AnnTopK, candK = 24 * AnnTopK)
      val onlyBatch = viaBatch.join(viaDriver,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val onlyDriver = viaDriver.join(viaBatch,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val nQueries = viaBatch.select(col("query_id")).distinct().count()
      allQ.sparkSession.range(1).select(
        lit(nQueries).as("n_queries"),
        lit(onlyBatch == 0L && onlyDriver == 0L).as("paths_identical"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS paths_identical
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096) q""")),

    CatalogQuery("qs33_graph_batch_serve", (s, d) => {
      // DISTRIBUTED serving on the GRAPH store — completing the
      // batch-serve matrix (qs24 IVF / qs32 PQ / qt30 text):
      // GraphIndexStore.queryBatch folds the stored graph to its serve
      // view distributed (dedup → live-endpoint semi-join → per-src
      // re-truncation) and walks it with KnnGraph.search's per-hop keyed
      // joins — nothing about the batch on the driver, the formulation
      // that amortizes when thousands of queries walk at once (the
      // driver fold stays the low-latency path for small batches). Gate =
      // the qs32-style independent-formulation contract: the corpus (its
      // 4096 lowest ids — oracle LIMIT mirrored, regen-proof) queries
      // through BOTH paths and symmetric anti-joins prove identical
      // (query_id, rank, vec_id) sets in Spark; GraphIndexStoreSpec pins
      // the same identity through appends, tombstones and injected
      // orphans. qs28's geometry (deg=12/beam=32/hops=4).
      val idxDir = Serve.buildGraphIndex(s, d)
      val allQ = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .orderBy(col("query_id")).limit(4096)
        .persist() // both serve paths read it
      val viaBatch = graft.sinks.GraphIndexStore.queryBatch(s, idxDir, allQ,
        beam = 32, hops = 4, topK = AnnTopK)
      val viaDriver = graft.sinks.GraphIndexStore.query(s, idxDir, allQ,
        beam = 32, hops = 4, topK = AnnTopK)
      val onlyBatch = viaBatch.join(viaDriver,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val onlyDriver = viaDriver.join(viaBatch,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val nQueries = viaBatch.select(col("query_id")).distinct().count()
      allQ.sparkSession.range(1).select(
        lit(nQueries).as("n_queries"),
        lit(onlyBatch == 0L && onlyDriver == 0L).as("paths_identical"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS paths_identical
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096) q""")),

    CatalogQuery("qs34_pq_nprobe_curve", (s, d) => {
      // The COMPRESSED store's operating curve — qs17's tuning-table
      // story on the PQ paradigm (round-10 gap: a deploy sizing nprobe
      // for IvfPqIndexStore had only PqIndexProbeMain's stderr; this row
      // turns the sizing surface into gated API). From ONE build:
      // recall vs the exact truth AND the scanned-code fraction at
      // nprobe ∈ {4, 8, 10, 16}, the fraction derived from the store's
      // own tuning surfaces — IvfPqIndexStore.probeRanking (the rank ≤ m
      // prefix IS the nprobe=m probe set, qs17's one-scan discipline)
      // × cellSizes (replay-deduped hot-plane row counts).
      //
      // Contracts (provable, so the gate is strict):
      //  - scanned fraction is NONDECREASING in nprobe (probe sets are
      //    prefixes of one ranking, so they nest — unlike the ADC
      //    CANDIDATE sets, whose top-candK under a wider scan can drop
      //    members, which is why recall monotonicity is NOT gated:
      //    measured curves do dip, e.g. filtered sf0.1 240@16 < 240@10);
      //  - scanned fraction at nprobe=K is EXACTLY 1.0 (every cell
      //    probed ⇒ the sum of per-cell counts is the hot-plane total);
      //  - recall at the PINNED operating point (NProbe=10, CandK=240)
      //    ≥ 0.90 — qs31's gate re-read off the curve (measured avg
      //    0.980 / 0.960 / 0.980 across SFs; PqIndexProbeMain).
      // The oracle pins the point/query counts + TRUE.
      //
      // MEASURED curve at the gate geometry (recall avg across SFs,
      // PqIndexProbeMain): nprobe=4 ≈ 0.62-0.72, 8 ≈ 0.92-0.96,
      // 10 ≈ 0.96-0.98, 16 ≈ 0.98-1.00; scan fraction ≈ nprobe/16 on
      // these near-uniform synthetic cells — the table a deploy trades
      // against (qs03's documented tradeoff).
      val Probes = Seq(4, 8, 10, 16); val NQueries = 5
      import s.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs34-pq").toString
      graft.sinks.IvfPqIndexStore.build(table(s, d, "embeddings"),
        k = 16, nSub = 8, subK = 256, idxDir)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < NQueries).persist()
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id")).persist()
      truth.count()
      // recall per curve point: the pinned point gates; the full curve is
      // what the row prices (each serve is 5 queries — bounded)
      val recalls: Map[Int, Double] = Probes.map { m =>
        val got = graft.sinks.IvfPqIndexStore.query(s, idxDir, queries,
          nProbe = m, topK = AnnTopK, candK = 24 * AnnTopK)
          .select(col("query_id"), col("vec_id"))
        val r = truth.join(got.withColumn("hit", lit(1L)),
            Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        m -> r
      }.toMap
      // scanned-code fraction per point from the tuning surfaces: avg
      // over queries of (codes in rank ≤ m cells) / hot-plane total
      val pr = graft.sinks.IvfPqIndexStore.probeRanking(s, idxDir, queries)
      val cs = graft.sinks.IvfPqIndexStore.cellSizes(s, idxDir).persist()
      val total = cs.agg(sum(col("n_codes"))).collect()(0).getLong(0).toDouble
      val prSized = pr.join(cs, Seq("cell")).persist()
      prSized.count()
      val fracs: Map[Int, Double] = Probes.map { m =>
        val f = prSized.filter(col("probe_rank") <= m)
          .groupBy(col("query_id")).agg(sum(col("n_codes")).as("scanned"))
          .agg(avg(col("scanned").cast("double") / total))
          .collect()(0).getDouble(0)
        m -> f
      }.toMap
      val curve = Probes.map(fracs)
      val monotone = curve.zip(curve.tail).forall { case (a, b) => a <= b }
      Seq((Probes.length.toLong, NQueries.toLong, monotone,
          fracs(16) == 1.0, recalls(10) >= 0.90))
        .toDF("n_points", "n_queries", "scan_fraction_nondecreasing",
          "full_probe_scans_all_codes", "recall_ge_090_at_pinned")
    }, Some("""
      SELECT 4::BIGINT AS n_points,
        CAST(count(*) AS BIGINT) AS n_queries,
        TRUE AS scan_fraction_nondecreasing,
        TRUE AS full_probe_scans_all_codes,
        TRUE AS recall_ge_090_at_pinned
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs35_graph_filtered_batch_serve", (s, d) => {
      // DISTRIBUTED FILTERED serving on the graph store — the batch-serve
      // matrix completed on its last open axis (qs24 IVF / qs25 range /
      // qs26 IVF-filtered / qs32 PQ / qs33 graph / qt30 text):
      // GraphIndexStore.queryFilteredBatch runs qs30's tenant-scoped
      // retrieval at qs33's scale — the unscoped distributed walk, then
      // the rank-time meta filter as two KEYED joins (stored meta by
      // vec_id, query meta by query_id), nothing about the batch on the
      // driver (a tenant-scoped corpus job previously had to chunk
      // through the driver fold). r13: both paths walk the SCOPED
      // subgraphs (label-disjoint edges, per-label seeds — qs30's store
      // doc); the batch path's seeds come from one keyed join against
      // the broadcast per-label entry table (KnnGraph.searchSeeded), so
      // the old rank-time meta joins are gone. Gate = the qs32/qs33
      // independent-formulation contract: the corpus (4096 lowest ids —
      // oracle LIMIT mirrored, regen-proof) queries WITHIN ITS OWN LABEL
      // through BOTH paths and symmetric anti-joins prove identical
      // (query_id, rank, vec_id) sets in Spark. Label exactness and
      // recall are qs30's gate (the driver fold defines the semantics;
      // this row proves the distributed path IS that fold). qs30's r13
      // pinned geometry: deg=12 / beam=32 / hops=4 — the PLAIN constants,
      // no filtered oversampling.
      val e = table(s, d, "embeddings")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs35-gidx").toString
      graft.sinks.GraphIndexStore.build(e, idxDir, degree = 12, assign = 2,
        nEntries = 4, metaCol = Some("label"))
      val allQ = e
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .orderBy(col("query_id")).limit(4096)
        .persist() // both serve paths read it
      val viaBatch = graft.sinks.GraphIndexStore.queryFilteredBatch(s, idxDir,
        allQ, beam = 32, hops = 4, topK = AnnTopK)
      val viaDriver = graft.sinks.GraphIndexStore.queryFiltered(s, idxDir,
        allQ, beam = 32, hops = 4, topK = AnnTopK)
      val onlyBatch = viaBatch.join(viaDriver,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val onlyDriver = viaDriver.join(viaBatch,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val nQueries = viaBatch.select(col("query_id")).distinct().count()
      allQ.sparkSession.range(1).select(
        lit(nQueries).as("n_queries"),
        lit(onlyBatch == 0L && onlyDriver == 0L).as("paths_identical"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS paths_identical
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4096) q""")),

    CatalogQuery("qs36_pq_filtered_serve", (s, d) => {
      // FILTERED serving on the COMPRESSED store — qs30's tenant/label
      // retrieval shape on the PQ paradigm (IvfPqIndexStore.queryFiltered
      // + queryFilteredBatch). r13: the code plane is (cell, meta)-
      // PARTITIONED (IvfIndexStore's qs18 layout on the 8-byte rows), so
      // the ADC scan prunes to the query's own label and the probe join
      // keys on both axes — every candidate is within-scope before any
      // score computes, the CandK oversample collapses to the plain
      // 24·topK, and serve cost no longer depends on label balance (the
      // rank-filter design starved rare meta values at scale). Contracts:
      // (a) every served neighbour carries the query's label, (b) top-10
      // AVG recall vs the exact same-label brute force ≥ 0.90, (c) the
      // distributed batch path returns the identical (query_id, rank,
      // vec_id) set for the whole corpus (≤ the 4096 driver cap at gate
      // SFs — oracle LIMIT mirrored on the count; the identity is graded
      // on the sampled queries' labels too since they are a subset).
      // MEASURED on the scoped plane (PqFilteredProbeMain r13): recall is
      // IDENTICAL across CandK 120/240/480 at every (SF, nprobe) — the
      // within-scope candidate volume never reaches the truncation, so
      // candK stopped being a knob; probe loss is the ONE loss mechanism
      // left, and NProbe=16 (all cells) stays pinned because nprobe=10
      // reads avg 0.86 / 0.82 / 0.96 across sf0.001 / 0.01 / 0.1 —
      // within-label truth is strictly harder for nprobe<K than global
      // truth (weaker cosines spread over more cells; qs32's probe-loss
      // caveat). NProbe=16 / CandK=24·topK reads 1.000 avg AND min at
      // every SF. Re-measure before shrinking any constant.
      val NProbe = 16; val CandK = 24 * AnnTopK; val NQueries = 5
      val e = table(s, d, "embeddings")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs36-pq").toString
      graft.sinks.IvfPqIndexStore.build(e, k = 16, nSub = 8, subK = 256,
        idxDir, metaCol = Some("label"))
      val queries = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
      val served = graft.sinks.IvfPqIndexStore.queryFiltered(s, idxDir,
          queries, NProbe, AnnTopK, CandK)
        .select(col("query_id"), col("vec_id")).persist()
      // (a) label exactness against the corpus labels
      val labels = e.select(col("vec_id"), col("label").cast("string").as("l"))
      val crossLabel = served
        .join(labels, Seq("vec_id"))
        .join(labels.select(col("vec_id").as("query_id"),
          col("l").as("ql")), Seq("query_id"))
        .filter(col("l") =!= col("ql")).count()
      // (b) recall vs the exact same-label brute force (qs30's truth)
      val ev = hoistNorm(e.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"),
        col("label").cast("string").as("vl")), "v", "vnorm")
      val qh = hoistNorm(queries, "qv", "qnorm")
      val scored = ev.crossJoin(broadcast(qh))
        .filter(col("vec_id") =!= col("query_id") && col("vl") === col("meta"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val truth = topkRanked(scored).select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(served.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      // (c) driver/distributed path identity on the whole corpus
      val allQ = e
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .orderBy(col("query_id")).limit(4096)
        .persist()
      val viaBatch = graft.sinks.IvfPqIndexStore.queryFilteredBatch(s, idxDir,
        allQ, NProbe, AnnTopK, CandK)
      val viaDriver = graft.sinks.IvfPqIndexStore.queryFiltered(s, idxDir,
        allQ, NProbe, AnnTopK, CandK)
      val onlyBatch = viaBatch.join(viaDriver,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      val onlyDriver = viaDriver.join(viaBatch,
        Seq("query_id", "rank", "vec_id"), "left_anti").count()
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"),
          lit(crossLabel == 0L).as("zero_cross_label"),
          lit(onlyBatch == 0L && onlyDriver == 0L).as("batch_path_identical"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090,
        TRUE AS zero_cross_label, TRUE AS batch_path_identical
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs37_rrf_fusion", (s, d) => {
      // HYBRID RETRIEVAL FUSION — reciprocal-rank fusion (RRF, Cormack /
      // Clarke / Büttcher 2009: score = Σ_rankers 1/(60 + rank)) of the
      // engine's lexical and dense rankers. qs08 fuses SCORES
      // multiplicatively (needs calibrated scales); RRF is the
      // rank-domain fusion production hybrid stacks actually deploy
      // because ranks need no cross-ranker calibration. Scenario: qt12's
      // fixed 3-term keyword query on the sparse side, corpus vector
      // vec_id=0 as the dense query (documents and embeddings share the
      // id domain); each side ranks its top-K=20 DISTRIBUTED (the BM25
      // scoring is [[bm25DocScores]] — qt12's shared definition — and
      // the dense scan is qs01's hoisted-cosine plan; both finish as
      // TakeOrderedAndProject bounded heads), and the fusion itself is
      // arithmetic over ≤ 2K collected (id, rank) rows — qs17's
      // bounded-curve-assembly shape, never a corpus-sized collect.
      // Mirror contract: ranks are row_number over (score DESC, id) /
      // (cosine DESC, id) — the deterministic cutoffs both engines
      // share; rrf = 1/(60+lex_rank) + 1/(60+dense_rank) with an absent
      // side contributing 0.0, each division an exact-integer-denominator
      // IEEE double op (::DOUBLE in the oracle where bare arithmetic
      // would be DECIMAL), one commutative double add — hash-identical.
      val K = 20; val RrfK = 60
      import s.implicits._
      val lex = bm25DocScores(s, d)
        .orderBy(desc("score"), col("doc_id"))
        .limit(K).select(col("doc_id")).as[Long].collect()
      val e = hoistNorm(table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
        "v", "vnorm")
      val q0 = e.filter(col("vec_id") === 0L)
        .select(col("v").as("qv"), col("vnorm").as("qnorm"))
      val dense = e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q0))
        .select(col("vec_id"), cosineHoisted.as("cosine"))
        .orderBy(desc("cosine"), col("vec_id"))
        .limit(K).select(col("vec_id")).as[Long].collect()
      val lr = lex.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val dr = dense.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val fused = (lex ++ dense).distinct.toSeq.map { id =>
        (id,
          lr.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0) +
          dr.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0))
      }.sortBy { case (id, sc) => (-sc, id) }.take(AnnTopK)
      fused.toDF("doc_id", "rrf_score")
    }, Some(oRrfSql)),

    CatalogQuery("qs43_rrf_index_serve", (s, d) => {
      // qs37's RRF fusion with BOTH legs served FROM PRE-BUILT
      // ARTIFACTS — the shape hybrid deploys actually run (r14 verdict
      // #2): the sparse leg from TextIndexStore.queryBm25 (qt23's
      // store), the dense leg from IvfIndexStore.query at nProbe = K
      // (probing every cell IS the brute-force scan — the qs40
      // exact-by-construction argument on the dense axis), fused by the
      // identical Σ 1/(60+rank) arithmetic. The oracle is qs37's SQL
      // VERBATIM, which gates that the two stores' serving conventions
      // COMPOSE without drift: the text store's 6-decimal-quantized
      // per-term BM25 scores and (score DESC, doc_id) order, the IVF
      // store's hoisted-norm cosine (bit-identical to the inline
      // expression) and the shared Ranking (cosine DESC, vec_id ASC)
      // rank rows, and the fusion's exact-integer-denominator IEEE
      // double adds must all reproduce the in-query qs37 plan's hash.
      // Scale shape: each leg opens only its pruned slice (query-term
      // bucket partitions / probed-cell directories), and the fusion is
      // driver arithmetic over ≤ 2K collected (id, rank) rows.
      Serve.queryRrfIndexFusion(s, d,
        Serve.buildTextIndex(s, d), Serve.buildIvfIndex(s, d))
    }, Some(oRrfSql)),

    CatalogQuery("qs44_rrf_batch_serve", (s, d) => {
      // The EVAL-SET shape of hybrid retrieval — qs43 fuses ONE hybrid
      // query with driver arithmetic (qs37's ≤2K-row bounded-assembly
      // license); this row serves MANY hybrid queries with the fusion
      // DISTRIBUTED, the shape an offline relevance sweep or an online
      // hybrid endpoint actually runs at scale: the sparse legs from
      // TextIndexStore.queryBm25Batch (ONE pruned posting-slice pass for
      // the term union, per-query scoring through the broadcast
      // (query_id, token) join), the dense legs from IvfIndexStore.query
      // at nProbe=K (exact by construction), and the fusion as a
      // full-outer join of the two (query_id, doc_id, rank) relations
      // keyed on BOTH columns + codegen'd reciprocal adds + the shared
      // bounded rankTopKScored finish — no per-query window, nothing
      // about the eval set on the driver past the bounded keyword
      // collect, so the plan survives a million-query eval set (leg
      // volume = batch × topK, never corpus-sized).
      //
      // MIRROR CONTRACT: both legs' ranks are the engines' shared
      // deterministic orders (BM25 (score DESC, doc_id) with 6-decimal
      // per-term quantization; cosine (DESC, vec_id)); df is GLOBAL per
      // token (the batch path's documented convention — derived from
      // the term-union slice, independent of which query asked);
      // rrf = 1/(60+rank) with exact-integer denominators cast once to
      // DOUBLE and one commutative add, absent legs contributing 0.0 —
      // hash-identical to the oracle's ::DOUBLE arithmetic.
      Serve.queryRrfBatchFusion(s, d,
        Serve.buildTextIndex(s, d), Serve.buildIvfIndex(s, d))
    }, Some(oRrfBatchSql)),

    CatalogQuery("qs45_rrf_filtered_serve", (s, d) => {
      // MULTI-TENANT HYBRID retrieval — qs44's eval-set fusion WITHIN
      // each query's own language, both legs served from lang-scoped
      // stores: the enterprise-search shape (every tenant/language gets
      // its own ranking universe) and the row that gates the two NEW
      // filtered planes COMPOSING. The sparse leg is qt38's
      // tenant-scoped BM25 (per-label df/N/avgdl — scoping changes the
      // scores); the dense leg is a lang-scoped IvfIndexStore
      // (embeddings inherit their document's language through the
      // shared id domain — the qs37 premise) served at nProbe = K,
      // exact within the label by the qs41 argument; the fusion is
      // qs44's distributed full-outer join + bounded rank finish.
      // Each query's language derives from ITS OWN document row on
      // both engines — no hardcoded lang constants, robust to testdata
      // regeneration.
      Serve.queryRrfFilteredBatch(s, d,
        Serve.buildTextIndexScoped(s, d), Serve.buildIvfIndexLangScoped(s, d))
    }, Some(oRrfFilteredSql)),

    CatalogQuery("qs38_graph_beam_curve", (s, d) => {
      // The GRAPH store's operating curve — qs34's tuning-table story on
      // the graph paradigm (r11 verdict #3): recall AND walk cost at
      // beam ∈ {16, 32, 48, 64} × hops ∈ {3, 4} from ONE build+store,
      // via GraphIndexStore.visitedCandidates — the raw visited relation,
      // whose (cosine DESC, vec_id ASC) top-k minus self matches IS
      // query()'s answer (shared Ranking finish), so one walk per grid
      // point prices both axes. Walk cost = scored candidates per query
      // (the unit per-hop I/O and compute scale with).
      //
      // Contracts (the gated ones are PROVABLE, qs34's discipline):
      //  - visited(hops=4) ⊇ visited(hops=3) PER QUERY at fixed beam:
      //    the hop loop is deterministic and hops only bounds it, so the
      //    deeper walk replays the shallower one exactly, then adds —
      //    gated on per-query counts;
      //  - recall nondecreasing in hops at fixed beam: truth-top-k
      //    members can only be displaced from top-k(visited) by other
      //    truth members (they are the global cosine top-k), so a
      //    visited SUPERSET never ranks fewer of them — gated;
      //  - avg visited nondecreasing in BEAM at fixed hops: NOT provable
      //    (a wider frontier's top-b of a superset need not nest — the
      //    qs34 candidate-set argument on the beam axis) but MEASURED
      //    monotone at every SF; gated on the avg, re-measure before
      //    touching walk mechanics;
      //  - recall at the PINNED point (beam=32, hops=4 — qs27/qs28's
      //    geometry) ≥ 0.90: measured avg 1.000 at all SFs
      //    (GraphCurveProbeMain re-measures this exact grid).
      // Recall in beam is NOT gated even at fixed hops (same
      // non-nesting caveat). MEASURED curve (GraphCurveProbeMain):
      // hops=4 recall is 1.000 at EVERY beam and SF — on this corpus
      // the depth axis, not the width axis, is what recall buys with
      // (hops=3 at sf0.1 reads avg 0.86/0.88/0.92/0.92 for beams
      // 16/32/48/64, mins to 0.30); avg visited/query at hops=4 grows
      // ≈ linearly in beam — 435/719/953/1068 at sf0.1 (289/407/460/478
      // at sf0.01) for beams 16/32/48/64 — so beam is the cost knob and
      // hops the recall knob: the sizing table a deploy trades against.
      val Beams = Seq(16, 32, 48, 64); val HopsGrid = Seq(3, 4)
      val NQueries = 5; val Pinned = (32, 4)
      import s.implicits._
      val idxDir = Serve.buildGraphIndex(s, d)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .filter(col("query_id") < NQueries).persist()
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id")).persist()
      truth.count()
      // one walk per grid point; the visited relation is bounded
      // (queries × walk size), so the curve assembly is local arithmetic
      val grid: Map[(Int, Int), (Map[Long, Long], Double)] =
        (for { b <- Beams; h <- HopsGrid } yield {
          val vis = graft.sinks.GraphIndexStore
            .visitedCandidates(s, idxDir, queries, b, h).persist()
          val counts = vis.groupBy(col("query_id")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val got = topkRanked(vis.filter(col("vec_id") =!= col("query_id")))
            .select(col("query_id"), col("vec_id"))
          val r = truth.join(got.withColumn("hit", lit(1L)),
              Seq("query_id", "vec_id"), "left")
            .groupBy(col("query_id"))
            .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
              / count(lit(1))).as("recall"))
            .agg(avg(col("recall"))).collect()(0).getDouble(0)
          vis.unpersist()
          (b, h) -> (counts, r)
        }).toMap
      val visitedMonotoneHops = Beams.forall { b =>
        val shallow = grid((b, HopsGrid.head))._1
        val deep = grid((b, HopsGrid.last))._1
        shallow.forall { case (q, n) => deep.getOrElse(q, 0L) >= n }
      }
      val recallMonotoneHops = Beams.forall(b =>
        grid((b, HopsGrid.last))._2 >= grid((b, HopsGrid.head))._2)
      val visitedMonotoneBeam = HopsGrid.forall { h =>
        val avgs = Beams.map(b => grid((b, h))._1.values.sum.toDouble / NQueries)
        avgs.zip(avgs.tail).forall { case (a, b2) => a <= b2 }
      }
      Seq(((Beams.length * HopsGrid.length).toLong, NQueries.toLong,
          visitedMonotoneHops, recallMonotoneHops, visitedMonotoneBeam,
          grid(Pinned)._2 >= 0.90))
        .toDF("n_points", "n_queries", "visited_nondecreasing_in_hops",
          "recall_nondecreasing_in_hops", "visited_nondecreasing_in_beam",
          "recall_ge_090_at_pinned")
    }, Some("""
      SELECT 8::BIGINT AS n_points,
        CAST(count(*) AS BIGINT) AS n_queries,
        TRUE AS visited_nondecreasing_in_hops,
        TRUE AS recall_nondecreasing_in_hops,
        TRUE AS visited_nondecreasing_in_beam,
        TRUE AS recall_ge_090_at_pinned
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs39_pq_batch_range_serve", (s, d) => {
      // RANGE serving on the COMPRESSED store (r11 verdict #5): the
      // takedown/radius sweep (qs20/qs21/qs25's primitive) finally has
      // its PQ-paradigm twin — at 100 TB the sweep wants the 8-byte hot
      // plane, not raw postings. IvfPqIndexStore.rangeQueryBatch is a
      // LOSSLESS two-stage cut: map-side unit-space probes (the store's
      // own geometry), keyed ADC scoring over the pruned code plane, a
      // prefilter at radius − AdcRangeMargin (margin MEASURED ≥ 33% over
      // the binding max(radius − adc)-over-answers statistic across SFs
      // — PqRangeProbeMain; see the method doc for why the cut is wide
      // on these near-random synthetics and sharp on real corpora /
      // high-radius sweeps), then an EXACT-cosine verify over cold-plane
      // point reads of the survivors. Exactness comes from the verify
      // stage, so unlike the store's top-k rows (recall contracts) this
      // gate is FULL EQUALITY: the oracle mirrors the probe geometry —
      // L2-normalize (same guarded sqrt-of-dot fold), assign corpus and
      // queries to the 16 lowest-id UNIT centroids in unit space (rn = 1
      // / rn ≤ 4, ties by cid — KMeans.nearest's rule), then qs20's raw
      // cosine formula, radius 0.30, rounded-6 output ordered by
      // (query_id, vec_id). Every vector queries (qs25's corpus-sweep
      // shape); no driver-side collect of the batch anywhere — the two
      // serve-time collects are the probed-cell and candidate-vbucket
      // domains.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs39-pq").toString
      graft.sinks.IvfPqIndexStore.build(table(s, d, "embeddings"),
        k = 16, nSub = 8, subK = 256, idxDir)
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
      graft.sinks.IvfPqIndexStore.rangeQueryBatch(s, idxDir, queries,
        nProbe = 4, radius = 0.30)
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      un AS (SELECT vec_id, v,
          sqrt(greatest(list_dot_product(v, v), 1e-30)) AS nrm FROM e),
      u AS (SELECT vec_id, v, list_transform(v, x -> x / nrm) AS uv FROM un),
      cent AS (SELECT vec_id AS cid, uv AS cu FROM u WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT u.vec_id, u.v, cent.cid,
            row_number() OVER (PARTITION BY u.vec_id
              ORDER BY list_distance(u.uv, cent.cu) ASC, cent.cid ASC) rn
          FROM u CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT u.vec_id AS query_id, u.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY u.vec_id
              ORDER BY list_distance(u.uv, cent.cu) ASC, cent.cid ASC) rn
          FROM u CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id)
      SELECT query_id, vec_id, round(cosine, 6) AS cosine
      FROM scored WHERE cosine >= 0.30
      ORDER BY query_id, vec_id""")),

    CatalogQuery("qs03_ann_ivf_recall", (s, d) => {
      // The TRAINED IVF path with a gated recall contract: centroids come
      // from graft.pipeline.KMeans.fit (Lloyd's, deterministic lowest-K
      // init) instead of qs02's pinned vec_id<K cells, and the query
      // measures its own recall against the brute-force truth (qs01's
      // exact plan) IN SPARK. Trained centroids are engine-specific floats
      // (the oracle can't reproduce Lloyd iterations bit-for-bit), so the
      // checkable output is the q17/q19-style bounded contract:
      // (n_queries, recall_ge_090) — the oracle emits the exact query
      // count and literal TRUE. Scale shape: training moves only
      // partitions×K partial rows per iteration (corpus stationary,
      // centroids broadcast); probing is the same keyed-by-cell join as
      // qs02; the recall join touches 2 × n_queries × k rows.
      // NProbe=8 of K=16 cells: these synthetic embeddings are near-random
      // (little cluster structure), so half the cells must be probed for a
      // comfortable margin over the 0.90 contract (measured avg recall
      // 0.94-0.98 across SFs; nprobe=4 sits at 0.86, nprobe=6 exactly at
      // 0.90). On a real corpus with cluster structure the same query
      // shape runs at far smaller nprobe/K scan fractions.
      val K = 16; val NProbe = 8; val NQueries = 5; val Iters = 5
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // training passes + cell posting + truth scan reuse it
      val cents = KMeans.fit(e.as[(Long, Seq[Double])], K, Iters)
      val bc = s.sparkContext.broadcast(cents)
      val assigned = hoistNorm(e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, KMeans.nearest(bc.value, v).toLong) }
        .toDF("vec_id", "v", "cell"), "v", "vnorm")
      val queries = hoistNorm(e.filter(col("vec_id") < NQueries).as[(Long, Seq[Double])]
        .flatMap { case (id, v) =>
          KMeans.nearestK(bc.value, v, NProbe).map(c => (id, v, c.toLong)) }
        .toDF("query_id", "qv", "cell"), "qv", "qnorm")
      val scored = assigned.join(broadcast(queries), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val ivf = topkRanked(scored).select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(ivf.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs23_trained_index_serve", (s, d) => {
      // The TRAINED persistent index under the gate — the "a KMeans.fit
      // result slots in unchanged" claim proven end to end: Lloyd's
      // centroids feed IvfIndexStore.build, the standard batch serves
      // FROM the artifact (stored centroids drive the probes, postings
      // partition-pruned as always), and the query measures its own
      // recall against the brute-force truth in Spark. Trained
      // centroids are engine-specific floats (the oracle can't mirror
      // Lloyd iterations), so the gate is qs03's bounded contract:
      // (n_queries, recall_ge_090) vs the oracle's exact count + TRUE.
      // Same NProbe=8/K=16 geometry as qs03 (measured 0.94-0.98 margin
      // across SFs) — and identical assignment/probe/rank conventions
      // between build and serve, so the artifact path's recall is
      // exactly the fused path's.
      val K = 16; val NProbe = 8; val NQueries = 5; val Iters = 5
      import s.implicits._
      val e = table(s, d, "embeddings")
      val ev = e.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // training passes + query projection + truth reuse it
      val cents = KMeans.fit(ev.as[(Long, Seq[Double])], K, Iters)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs23-ivf").toString
      graft.sinks.IvfIndexStore.build(e, K, idxDir, centroids = Some(cents))
      val queries = ev.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val served = graft.sinks.IvfIndexStore
        .query(s, idxDir, queries, NProbe, AnnTopK)
        .select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(served.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs05_ann_int8_rerank", (s, d) => {
      // Quantized-prefilter + exact-rerank ANN — the memory path for a
      // 100 TB vector corpus: the full scan touches only int8 vectors
      // (4× smaller than fp32, integer dot products), and exact fp
      // cosine is computed ONLY for the ≤ queries × 4k candidates the
      // cheap stage survives. Cosine is scale-invariant, so per-vector
      // symmetric quantization (scale = max|x|/127) needs no scale
      // bookkeeping at score time. Like qs03, quantization error makes
      // the oracle non-mirrorable, so the gate is the bounded recall
      // contract vs the exact brute-force truth (qs01's plan):
      // top-10-after-rerank must recover ≥95% of the true top-10
      // (measured 1.0 across SFs — the 4× candidate margin absorbs the
      // int8 angle noise). Both stages rank with the bounded TopKByScore
      // aggregator (no per-query window sort — same pin as qs01-qs04).
      val NQueries = 5; val CandK = 4 * AnnTopK
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      // int norms HOISTED once per side (the same discipline as hoistNorm
      // on the double paths, and trivially exact here: the hoisted idot is
      // integer arithmetic, the sqrt/multiply/divide that follow are the
      // identical IEEE ops on identical values) — the corpus-scan stage
      // pays 1 dot per pair instead of 3
      val inorm = (qv: Column) =>
        sqrt(greatest(idot(qv, qv), lit(1L)).cast("double"))
      val qe = e.select(col("vec_id"), int8Quantize(col("v")).as("qv"))
        .withColumn("qvn", inorm(col("qv")))
      val quantQueries = qe.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("qv").as("qq"),
          col("qvn").as("qqn"))
      val qscored = qe.crossJoin(broadcast(quantQueries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (idot(col("qq"), col("qv")).cast("double") /
            (col("qqn") * col("qvn"))).as("cosine"))
      val candTopK = graft.functions.TopKAggregator.topK(CandK)
      val cand = qscored.groupBy(col("query_id"))
        .agg(candTopK(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val exactQueries = hoistNorm(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), "qv", "qnorm")
      // hoist AFTER the candidate join: vnorm once per surviving
      // candidate row (bounded CandK × queries), qnorm once per query —
      // never per pair (bit-identical expression, same IEEE ops)
      val rescored = hoistNorm(e.join(broadcast(cand), Seq("vec_id")), "v", "vnorm")
        .join(broadcast(exactQueries), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val reranked = topkRanked(rescored).select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(reranked.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.95).as("recall_ge_095"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_095
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs06_hard_negatives", (s, d) => {
      // Contrastive pair mining for representation training: for each
      // query vector, the top-5 most-similar SAME-label vectors
      // (positives) and top-5 most-similar DIFFERENT-label vectors (hard
      // negatives — the pairs that do the work in a contrastive loss).
      // One broadcast of the query set, one corpus scan; the label match
      // is a per-row expression, and ranking per (query, kind) goes
      // through the bounded TopKByScore aggregator — same no-window pin
      // as qs01–qs05, so a popular kind never becomes a one-task sort.
      val PairK = 5
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val queries = hoistNorm(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("v").as("qv")), "qv", "qnorm")
      val scored = hoistNorm(e, "v", "vnorm").crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"),
          when(col("label") === col("qlabel"), "pos").otherwise("neg").as("kind"),
          col("vec_id"), cosineHoisted.as("cosine"))
      val topk = graft.functions.TopKAggregator.topK(PairK)
      scored.groupBy(col("query_id"), col("kind"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), col("kind"), posexplode(col("top")))
        .select(col("query_id"), col("kind"), (col("pos") + 1).as("rank"),
          col("col.vec_id").as("vec_id"), round(col("col.cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("kind"), col("rank"))
    }, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
            FROM e WHERE vec_id < 5),
      scored AS (
        SELECT query_id,
          CASE WHEN label = qlabel THEN 'pos' ELSE 'neg' END AS kind,
          vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM e CROSS JOIN q WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, kind, vec_id, cosine,
          row_number() OVER (PARTITION BY query_id, kind
            ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, kind, rank, vec_id, round(cosine, 6) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, kind, rank""")),

    CatalogQuery("qs07_ann_pq_rerank", (s, d) => {
      // Product-quantization ANN — THE standard memory path for a 100 TB
      // vector corpus (beyond qs05's int8): vectors L2-NORMALIZE first
      // (cosine ≡ dot product on the unit sphere, so quantization has no
      // norm term to approximate), then d=64 splits into S=8 subspaces,
      // each with its own 256-centroid codebook — a vector stores as 8
      // one-byte codes (32× smaller than fp32) and query scoring is S
      // table lookups per vector (asymmetric distance: the query stays
      // full-precision, dot(q̂, v̂) ≈ Σ_s table_q[s][code_s]). Codebooks
      // train with the distributed KMeans on a DETERMINISTIC ~14%
      // id-sample of the corpus (stable-id discipline — production
      // trains on a sample, assigns everything in one broadcast pass);
      // both stages rank through the bounded TopKByScore aggregator.
      // Quantization error makes the oracle non-mirrorable, so the gate
      // is the qs03/qs05 recall contract: top-10 after exact rerank of
      // the 16×k PQ survivors (0.3% of the sf0.1 corpus) must recover
      // ≥90% of qs01's brute-force truth per query on average (measured
      // 1.0/1.0/0.98 across SFs; the norm-free formulation and 8-bit
      // codebooks make the margin — an un-normalized variant with
      // approximated ‖v‖ and 4-bit codebooks measured 0.48 at sf0.1 —
      // don't shrink SubK/CandK without re-measuring).
      val S = 8; val SubK = 256; val CandK = 16 * AnnTopK; val NQ = 5
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .as[(Long, Seq[Double])]
        .persist() // rerank + truth sub-plan read the exact vectors
      val unit = e.map { case (id, v) =>
        val n = math.sqrt(math.max(v.map(x => x * x).sum, 1e-30))
        (id, v.map(_ / n))
      }.persist() // codebook training passes + code assignment
      val queries: Array[(Long, Seq[Double])] =
        unit.filter(_._1 < NQ).collect().sortBy(_._1) // NQ rows
      val dim = queries.head._2.length; val subDim = dim / S
      val sample = unit.filter(r => r._1 < SubK || r._1 % 7 == 0)
      // all 8 codebooks train in ONE set of Lloyd passes (4 scans of the
      // sample total, not 8 × 4) — per-subspace math identical to
      // independent fits (KMeansSpec pins the equivalence)
      val codebooks: Array[Array[Array[Double]]] =
        KMeans.fitSubspaces(sample, S, SubK, iters = 4)
      val bcCb = s.sparkContext.broadcast(codebooks)
      // per-query ADC lookup tables: S × SubK doubles each — KBs
      val qTables = queries.map { case (qid, qv) =>
        val dots = Array.tabulate(S, SubK) { (sub, j) =>
          val c = codebooks(sub)(j)
          var acc = 0.0; var i = 0
          while (i < subDim) { acc += qv(sub * subDim + i) * c(i); i += 1 }
          acc
        }
        (qid, dots)
      }
      val bcTables = s.sparkContext.broadcast(qTables)
      // one corpus pass: assign codes, score every query from the tables
      val scored = unit.flatMap { case (id, v) =>
        val cb = bcCb.value
        val codes = Array.tabulate(S)(sub =>
          KMeans.nearest(cb(sub), v.slice(sub * subDim, (sub + 1) * subDim)))
        bcTables.value.iterator.filter(_._1 != id).map { case (qid, dots) =>
          var dot = 0.0; var t = 0
          while (t < S) { dot += dots(t)(codes(t)); t += 1 }
          (qid, id, dot)
        }
      }.toDF("query_id", "vec_id", "cosine")
      val candTopK = graft.functions.TopKAggregator.topK(CandK)
      val cand = scored.groupBy(col("query_id"))
        .agg(candTopK(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val exactQueries = hoistNorm(e.toDF("vec_id", "v").filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), "qv", "qnorm")
      // hoist AFTER the candidate join — same per-candidate/per-query
      // (never per-pair) norm discipline as qs05/qs11, bit-identical
      val rescored = hoistNorm(e.toDF("vec_id", "v")
          .join(broadcast(cand), Seq("vec_id")), "v", "vnorm")
        .join(broadcast(exactQueries), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val reranked = topkRanked(rescored).select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(reranked.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q"""), headline = true),

    CatalogQuery("qs08_hybrid_rank", (s, d) => {
      // Hybrid retrieval: rerank ANN candidates by cosine × a text-quality
      // prior (qt02's rounded punct/stopword ratios) — the retrieval-with-
      // rerank shape every RAG/data-mining pipeline runs. At scale the
      // embedding and text live in ONE table; here they are separate
      // files equi-joined on id (shuffle join keyed by id — co-partitioned
      // or bucketed in a real deployment). Ranking reuses the bounded
      // TopKByScore aggregator (no per-query window sort); the hybrid
      // score stays bit-identical cross-engine because its inputs are
      // IEEE ops over identical doubles (cosine) and the 6-decimal
      // rounded ratios qt02 already proved portable.
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val txt = col("text")
      val nTokens = size(TextOps.tokens(txt))
      val nPunct = length(txt) - length(regexp_replace(txt, "[.,!?;:]", ""))
      val nStop = TextOps.occurrences(concat(lit(" "), txt, lit(" ")), " the ") +
        TextOps.occurrences(concat(lit(" "), txt, lit(" ")), " a ")
      val prior = table(s, d, "documents")
        .select(col("doc_id").as("vec_id"),
          (lit(1.0) / (lit(1.0) +
            round(nPunct.cast("double") / length(txt), 6) +
            round(nStop.cast("double") / nTokens, 6))).as("prior"))
      val queries = hoistNorm(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), "qv", "qnorm")
      val scored = hoistNorm(e, "v", "vnorm").join(prior, Seq("vec_id"))
        .crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (cosineHoisted * col("prior")).as("cosine"))
      topkRanked(scored)
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      f AS (
        SELECT doc_id AS vec_id,
          1.0 / (1.0
            + round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                / length(text), 6)
            + round(CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                  + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3 AS DOUBLE)
                / length(regexp_split_to_array(trim(text), '\s+')), 6)) AS prior
        FROM documents),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT query_id, e.vec_id,
          (list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))))
            * f.prior AS cosine
        FROM e JOIN f USING (vec_id) CROSS JOIN q WHERE e.vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank""")),

    CatalogQuery("qe01_pca_energy", (s, d) => {
      // Distributed PCA over the embedding corpus — the compression /
      // whitening step before storing or indexing 100 TB of vectors.
      // Pass 1 streams the corpus once into per-partition (count, Σv,
      // Σvvᵀ) partials — d=64, so each partial is one 64×64 matrix and
      // the corpus never shuffles; the covariance eigenproblem is solved
      // on the driver (Jacobi, O(d³) on a 64×64 — microseconds) exactly
      // like Linalg.svd's tall-skinny path. Pass 2 broadcasts the top-M
      // components and verifies the projection DISTRIBUTEDLY via the
      // Pythagorean identity: Σ‖(v−μ) − PPᵀ(v−μ)‖² must equal
      // n·Σ_{i>M} λᵢ. The gate is the qs03-style bounded contract —
      // (n_vecs, n_components, trace_ok, recon_ok): trace_ok ties the
      // eigensolve to the data's total variance, recon_ok ties the
      // broadcast projection pass to the eigenvalues; both are real
      // numeric identities, not tautologies, checked to 1e-6 relative.
      val M = 8
      import s.implicits._
      val ds = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .as[(Long, Seq[Double])]
      val (n, mean, cov) = moments(ds.map(_._2))
      val dim = mean.length
      val trace = (0 until dim).map(i => cov(i)(i)).sum
      val (evals, evecs) = graft.linalg.Linalg.eigSym(cov)
      val order = evals.indices.sortBy(i => -evals(i))
      val sortedEvals = order.map(evals(_)).toArray
      val comps = order.take(M).map(i => evecs.map(_(i))).toArray // M×d rows
      val traceOk = math.abs(sortedEvals.sum - trace) <= 1e-6 * math.abs(trace)
      val tailEnergy = sortedEvals.drop(M).sum * n
      val bcMean = s.sparkContext.broadcast(mean)
      val bcComps = s.sparkContext.broadcast(comps)
      val residual = ds.map { case (_, sv) =>
        val mu = bcMean.value; val p = bcComps.value
        val c = new Array[Double](sv.length)
        var i = 0; while (i < sv.length) { c(i) = sv(i) - mu(i); i += 1 }
        var res = 0.0; var m = 0
        while (m < p.length) {
          var dot = 0.0; var k = 0
          while (k < c.length) { dot += p(m)(k) * c(k); k += 1 }
          res += dot * dot; m += 1
        }
        var norm2 = 0.0; var k = 0
        while (k < c.length) { norm2 += c(k) * c(k); k += 1 }
        norm2 - res // ‖c‖² − ‖Pᵀc‖² = reconstruction error of this row
      }.toDF("err").agg(sum(col("err"))).first().getDouble(0)
      val reconOk = math.abs(residual - tailEnergy) <= 1e-6 * math.max(tailEnergy, 1e-12)
      val one = s.range(1)
      one.select(lit(n).as("n_vecs"), lit(M).as("n_components"),
        lit(traceOk).as("trace_ok"), lit(reconOk).as("recon_ok"))
    }, Some("""
      SELECT count(*) AS n_vecs, 8 AS n_components,
        TRUE AS trace_ok, TRUE AS recon_ok
      FROM embeddings""")),

    CatalogQuery("qe03_whitening", (s, d) => {
      // PCA whitening APPLIED distributively — the transform qe01's
      // eigensolve exists to feed: every row maps to
      // y = Λ^{-1/2} Pᵀ (v − μ) with μ/P/Λ broadcast (KBs), one pass,
      // corpus never shuffles. The gate verifies the DEFINING property
      // on the output itself: the whitened rows' second-moment pass
      // (same bounded-partial gather, now M×M) must show a vanishing
      // mean and an identity covariance to 1e-6 — a real numeric
      // identity tying the broadcast transform, the eigensolve, and
      // both moment passes together (any sign/order/scale slip in the
      // components breaks it).
      val M = 8
      import s.implicits._
      val ds = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .as[(Long, Seq[Double])]
      val (n, mean, cov) = moments(ds.map(_._2))
      val (evals, evecs) = graft.linalg.Linalg.eigSym(cov)
      val order = evals.indices.sortBy(i => -evals(i))
      val comps = order.take(M).map(i => evecs.map(_(i))).toArray // M×d rows
      val scale = order.take(M).map(i =>
        1.0 / math.sqrt(math.max(evals(i), 1e-300))).toArray
      val bcMean = s.sparkContext.broadcast(mean)
      val bcComps = s.sparkContext.broadcast(comps)
      val bcScale = s.sparkContext.broadcast(scale)
      val whitened = ds.map { case (_, sv) =>
        val mu = bcMean.value; val p = bcComps.value; val sc = bcScale.value
        val c = new Array[Double](sv.length)
        var i = 0; while (i < sv.length) { c(i) = sv(i) - mu(i); i += 1 }
        val y = new Array[Double](p.length)
        var m = 0
        while (m < p.length) {
          var dot = 0.0; var k = 0
          while (k < c.length) { dot += p(m)(k) * c(k); k += 1 }
          y(m) = dot * sc(m); m += 1
        }
        y.toSeq
      }
      val (wn, wMean, wCov) = moments(whitened)
      val meanOk = wMean.forall(x => math.abs(x) <= 1e-6)
      val covOk = (0 until M).forall(i => (0 until M).forall { j =>
        val target = if (i == j) 1.0 else 0.0
        math.abs(wCov(i)(j) - target) <= 1e-6
      })
      s.range(1).select(lit(wn).as("n_vecs"), lit(M).as("n_components"),
        lit(meanOk).as("whitened_mean_ok"), lit(covOk).as("whitened_cov_ok"))
    }, Some("""
      SELECT count(*) AS n_vecs, 8 AS n_components,
        TRUE AS whitened_mean_ok, TRUE AS whitened_cov_ok
      FROM embeddings""")),

    CatalogQuery("qe02_label_centroids", (s, d) => {
      // Per-class embedding audit: centroid and per-dimension variance for
      // every (label, dim) — the drift/separability check run before
      // trusting labels or embeddings for curation (a collapsed class
      // shows near-zero variance; a drifted one, a shifted centroid).
      // Scale shape: the explode multiplies rows by d=64, but each output
      // row is (label, dim, x) and the groupBy aggregates with map-side
      // partials, so the shuffle carries ≤ labels × dims × partitions
      // partial rows — never the exploded corpus. Float sums follow the
      // repo's oracle-determinism rule: per-row cast to Decimal(38,6),
      // decimal partials (order-independent, engine-exact), final double
      // division; variance = E[x²] − mean² in plain double ops mirrored
      // verbatim in the oracle.
      val e = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("col").cast("double").as("x"))
      e.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          (dsum(col("x")) / count(lit(1))).as("mean"),
          (dsum(col("x") * col("x")) / count(lit(1))).as("sumsq_over_n"))
        .select(col("label"), col("dim"), col("n_vecs"), col("mean"),
          (col("sumsq_over_n") - col("mean") * col("mean")).as("variance"))
        .orderBy(col("label"), col("dim"))
    }, Some(s"""
      WITH e AS (SELECT label,
          unnest([{'dim': i, 'x': embedding[i]::DOUBLE}
                  for i in range(1, len(embedding) + 1)]) AS u
        FROM embeddings),
      g AS (SELECT label, u.dim AS dim, count(*) AS n_vecs,
              ${oSum("u.x")} / count(*) AS mean,
              ${oSum("u.x * u.x")} / count(*) AS sumsq_over_n
            FROM e GROUP BY label, u.dim)
      SELECT label, dim, n_vecs, mean,
        sumsq_over_n - mean * mean AS variance
      FROM g ORDER BY label, dim""")),

    CatalogQuery("qe04_embedding_shift", (s, d) => {
      // Distribution-shift audit over the embedding space: linear-kernel
      // MMD² between each class and the whole corpus — ‖μ_label − μ‖²,
      // the first-moment half of the drift check every curation loop runs
      // before mixing a new source/class into training data (a shifted
      // class shows a large distance; a well-mixed one sits near zero).
      // Scale shape: everything reduces to per-(label, dim) decimal sums
      // with map-side partials (qe02's discipline) — the shuffle carries
      // ≤ labels × dims × partitions partial rows and the corpus is read
      // once; the global mean derives from the SAME aggregated table
      // (labels × dims rows), never a second scan, and the final
      // per-label distance sums 64 bounded rows per label.
      // Determinism: means are dsum/count (decimal partials, one double
      // division); the squared-diff summands are 12-decimal-quantized
      // (qp07's convention) so the per-label sum is exact decimal
      // arithmetic on both engines.
      val e = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("col").cast("double").as("x"))
      val perLabel = e.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("sx"))
        .persist() // global mean derives from this table, not a re-scan
      val global = perLabel.groupBy(col("dim"))
        .agg((sum(col("sx")).cast("double") / sum(col("n_vecs"))).as("gmean"))
      val diffs = perLabel
        .select(col("label"), col("dim"), col("n_vecs"),
          (col("sx").cast("double") / col("n_vecs")).as("lmean"))
        .join(broadcast(global), Seq("dim"))
        .select(col("label"), col("n_vecs"),
          round((col("lmean") - col("gmean")) * (col("lmean") - col("gmean")), 12)
            .cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("sq"))
      diffs.groupBy(col("label"))
        .agg(max(col("n_vecs")).as("n_vecs"),
          sum(col("sq")).cast("double").as("mmd_sq"))
        .orderBy(col("label"))
    }, Some(s"""
      WITH e AS (SELECT label,
          unnest([{'dim': i, 'x': embedding[i]::DOUBLE}
                  for i in range(1, len(embedding) + 1)]) AS u
        FROM embeddings),
      pl AS (SELECT label, u.dim AS dim, count(*) AS n_vecs,
               sum(CAST(u.x AS DECIMAL(38,6))) AS sx
             FROM e GROUP BY label, u.dim),
      g AS (SELECT dim,
              CAST(sum(sx) AS DOUBLE) / sum(n_vecs) AS gmean
            FROM pl GROUP BY dim),
      df AS (SELECT pl.label, pl.n_vecs,
               CAST(round((CAST(pl.sx AS DOUBLE) / pl.n_vecs - g.gmean)
                 * (CAST(pl.sx AS DOUBLE) / pl.n_vecs - g.gmean), 12)
                 AS DECIMAL(38,12)) AS sq
             FROM pl JOIN g USING (dim))
      SELECT label, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
        CAST(sum(sq) AS DOUBLE) AS mmd_sq
      FROM df GROUP BY label ORDER BY label""")),

    CatalogQuery("qe05_embedding_outliers", (s, d) => {
      // Embedding-space outlier audit: per-vector diagonal Mahalanobis
      // score Σ_i (v_i − μ_i)² / σ_i² against the corpus moments — the
      // cheap whole-corpus anomaly screen (mislabeled/corrupted/off-
      // distribution docs surface at the top) run before any expensive
      // pairwise dedup. Diagonal covariance keeps the model a 2×d-row
      // table whatever the corpus size (the full-Σ version is qe01/qe03's
      // machinery).
      //
      // Scale shape: one posexplode feeds the d-row moment aggregation
      // (map-side decimal partials, the shuffle carries ≤ d × partitions
      // rows); the d-row model then collapses into ONE row of (μ, σ²)
      // arrays that broadcasts onto the scoring pass, where the score is
      // a pure per-row zip_with/aggregate expression — the corpus never
      // shuffles (an explode-and-regroup scoring pass would shuffle n×d
      // rows; pinned out in PlanQualitySpec) and the finish is a bounded
      // TakeOrdered(20). Determinism: x and x·x quantize into
      // Decimal(38,12) BEFORE summing (double multiply first, then one
      // cast — never decimal×decimal, whose result scale differs across
      // engines), means/vars are single double divisions, summands are
      // 12-decimal-quantized decimals so the per-row sum is exact.
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // moment pass + scoring pass
      val dims = e.select(col("vec_id"), posexplode(col("v")))
        .select((col("pos") + 1).as("i"), col("col").as("x"))
      val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val mv = dims.groupBy(col("i"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec12)).cast("double").as("s1"),
          sum((col("x") * col("x")).cast(dec12)).cast("double").as("s2"))
        .select(col("i"), (col("s1") / col("n")).as("mu"),
          (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))).as("vr"))
      val model = mv.agg(
          sort_array(collect_list(struct(col("i"), col("mu")))).as("ms"),
          sort_array(collect_list(struct(col("i"), col("vr")))).as("vs"))
        .select(transform(col("ms"), _.getField("mu")).as("mu"),
          transform(col("vs"), _.getField("vr")).as("vr"))
      // decimal-exact in-array sum: (37,12) acc + (25,12) summand adds at
      // (38,12) — no scale loss — and the cast back to (37,12) is exact
      // for any real score magnitude; a naive (38,12)+(38,12) would widen
      // to scale 11 and silently round the 12th decimal
      val dec25 = org.apache.spark.sql.types.DecimalType(25, 12)
      val dec37 = org.apache.spark.sql.types.DecimalType(37, 12)
      e.crossJoin(broadcast(model))
        .select(col("vec_id"),
          aggregate(
            zip_with(
              zip_with(col("v"), col("mu"), (x, m) => (x - m) * (x - m)),
              col("vr"), (a, sg) => round(a / sg, 12).cast(dec25)),
            lit(0).cast(dec37), (acc, r) => (acc + r).cast(dec37))
            .cast("double").as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(20)
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      dims AS (SELECT vec_id, i, v[i] AS x
               FROM e, (SELECT unnest(range(1, len(v) + 1)) AS i) ix),
      mom AS (SELECT i, count(*)::BIGINT AS n,
                CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS s1,
                CAST(sum(CAST((x * x) AS DECIMAL(38,12))) AS DOUBLE) AS s2
              FROM dims GROUP BY i),
      mv AS (SELECT i, s1 / n AS mu, s2 / n - (s1 / n) * (s1 / n) AS vr FROM mom),
      sc AS (SELECT d.vec_id,
               CAST(round(((d.x - mv.mu) * (d.x - mv.mu)) / mv.vr, 12)
                 AS DECIMAL(38,12)) AS r
             FROM dims d JOIN mv USING (i))
      SELECT vec_id, CAST(sum(r) AS DOUBLE) AS score
      FROM sc GROUP BY vec_id ORDER BY score DESC, vec_id LIMIT 20""")),

    CatalogQuery("qs09_kcenter_select", (s, d) => {
      // Diversity / coreset selection: greedy k-center (farthest-point
      // traversal) — pick the vector farthest from everything selected
      // so far, M times. The standard 2-approximation for max-coverage
      // data selection (herding/"facility location" family): the chosen
      // M representatives maximize spread, the per-step min_dist is the
      // covering radius curve auditors read to pick dataset sizes.
      //
      // Scale shape: inherently M sequential rounds (like Lloyd's in
      // KMeans.fit), each ONE distributed scan of the persisted corpus
      // with the ≤M selected vectors broadcast, reduced by a bounded
      // TakeOrdered(1) — the corpus never shuffles and driver state is
      // M rows. Determinism: distances are the same sqrt-L2 loop DuckDB's
      // list_distance computes; argmax ties break on lower vec_id.
      val M = 16
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v.toArray) }
        .persist() // M bounded-result scans over the same cached corpus
      val seed = e.filter(_._1 == 0L).head()
      val picked = scala.collection.mutable.ArrayBuffer[(Long, Array[Double], Double)](
        (seed._1, seed._2, 0.0))
      while (picked.length < M) {
        val bc = s.sparkContext.broadcast(picked.map(p => (p._1, p._2)).toArray)
        val next = e.flatMap { case (id, v) =>
          val sel = bc.value
          if (sel.exists(_._1 == id)) Iterator.empty
          else {
            var md = Double.MaxValue
            var k = 0
            while (k < sel.length) {
              var acc = 0.0; var i = 0
              val sv = sel(k)._2
              while (i < v.length) { val dd = v(i) - sv(i); acc += dd * dd; i += 1 }
              val dist = math.sqrt(acc)
              if (dist < md) md = dist
              k += 1
            }
            Iterator((id, v, md))
          }
        }.toDF("vec_id", "v", "md")
          .orderBy(col("md").desc, col("vec_id")).limit(1)
          .as[(Long, Seq[Double], Double)].head()
        picked += ((next._1, next._2.toArray, next._3))
      }
      // round through the same SQL round() the oracle uses (not driver-side
      // BigDecimal, whose double→decimal path differs at rounding edges)
      picked.zipWithIndex.map { case ((id, _, md), step) => (step.toLong, id, md) }
        .toSeq.toDF("step", "vec_id", "min_dist")
        .withColumn("min_dist", round(col("min_dist"), 6))
        .orderBy(col("step"))
    }, Some("""
      WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      g(step, sel, last_id, last_d) AS (
        SELECT 0::BIGINT, [0::BIGINT], 0::BIGINT, 0.0::DOUBLE
        UNION ALL
        SELECT g.step + 1, list_append(g.sel, pick.vec_id), pick.vec_id, pick.md
        FROM g, LATERAL (
          SELECT e2.vec_id, (SELECT min(list_distance(e2.v, e3.v)) FROM e e3
                             WHERE list_contains(g.sel, e3.vec_id)) AS md
          FROM e e2 WHERE NOT list_contains(g.sel, e2.vec_id)
          ORDER BY md DESC, e2.vec_id ASC LIMIT 1) pick
        WHERE g.step < 15)
      SELECT step, last_id AS vec_id, round(last_d, 6) AS min_dist
      FROM g ORDER BY step""")),

    CatalogQuery("qs10_matryoshka_rerank", (s, d) => {
      // Matryoshka / truncated-dimension ANN (Kusupati et al. 2022): MRL
      // embeddings front-load information into the leading dims, so the
      // cheap stage scores only the first 16 of 64 dims (4× less compute
      // and memory traffic — the same economics as qs05's int8 path, won
      // by truncation instead of quantization) and the exact full-dim
      // cosine reranks only the ≤ queries × 4k survivors. Unlike the
      // quantized path there is NO approximation noise in the cheap
      // stage's ordering definition, so the oracle mirrors BOTH stages
      // exactly instead of falling back to a recall contract. Both
      // rankings use the bounded TopKByScore aggregator (no per-query
      // window sort — the qs01–qs05 pin).
      val NQueries = 5; val PrefixD = 16; val CandK = 4 * AnnTopK
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("p", slice(col("v"), 1, PrefixD))
      val queries = hoistNorm(hoistNorm(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("p").as("qp")),
        "qp", "qpnorm"), "qv", "qnorm")
      // prefix-stage norms hoisted per SIDE (corpus pnorm once per row,
      // query qpnorm once per query — never per pair; bit-identical
      // expression, same IEEE ops as the inline form)
      val pscored = hoistNorm(e, "p", "pnorm")
        .crossJoin(broadcast(queries.select(col("query_id"), col("qp"), col("qpnorm"))))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (vdot(col("qp"), col("p")) / (col("qpnorm") * col("pnorm"))).as("cosine"))
      val candTopK = graft.functions.TopKAggregator.topK(CandK)
      val cand = pscored.groupBy(col("query_id"))
        .agg(candTopK(col("cosine"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      // rerank: vnorm once per surviving candidate row, after the join
      val rescored = hoistNorm(e.join(broadcast(cand), Seq("vec_id")), "v", "vnorm")
        .join(broadcast(queries.select(col("query_id"), col("qv"), col("qnorm"))),
          Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      topkRanked(rescored)
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                   (embedding::DOUBLE[])[1:16] AS p FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, p AS qp FROM e WHERE vec_id < 5),
      ps AS (SELECT q.query_id, e.vec_id,
               list_dot_product(q.qp, e.p) /
                 (sqrt(list_dot_product(q.qp, q.qp)) * sqrt(list_dot_product(e.p, e.p))) AS pcos
             FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      cand AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY pcos DESC, vec_id) AS rn
                 FROM ps) t WHERE rn <= ${4 * AnnTopK}),
      rs AS (SELECT c.query_id, c.vec_id,
               list_dot_product(q.qv, e.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
             FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN q ON c.query_id = q.query_id),
      ranked AS (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rank
                 FROM rs)
      SELECT query_id, rank, vec_id FROM ranked WHERE rank <= $AnnTopK
      ORDER BY query_id, rank""")),

    // ---------- text analysis ----------

    CatalogQuery("qe06_norm_audit", (s, d) => {
      // Embedding norm-health audit — the first screen before any cosine
      // machinery: near-zero vectors make cosine undefined/unstable and
      // a drifting norm distribution flags a broken encoder export.
      // Emits corpus count, 6-decimal-quantized norm mean (exact decimal
      // sum), exact min/max norms, and the count of degenerate
      // (‖v‖ < 1e-6) vectors. One pass, per-row norm expression, one
      // bounded aggregation — no shuffle beyond the agg partials.
      val dot = (x: Column) => vdot(x, x)
      val dec = org.apache.spark.sql.types.DecimalType(25, 6)
      table(s, d, "embeddings")
        .select(col("vec_id"),
          sqrt(dot(transform(col("embedding"), _.cast("double")))).as("nrm"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(round(col("nrm"), 6).cast(dec)).cast("double") / count(lit(1)))
            .as("mean_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm"),
          sum(when(col("nrm") < 1e-6, 1L).otherwise(0L)).as("n_degenerate"))
    }, Some("""
      WITH e AS (SELECT vec_id,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
             FROM embeddings)
      SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        CAST(sum(CAST(round(nrm, 6) AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mean_norm,
        round(min(nrm), 6) AS min_norm,
        round(max(nrm), 6) AS max_norm,
        CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
      FROM e""")),

    CatalogQuery("qt01_langid", (s, d) => {
      val scores = TextOps.langScores(col("text"))
      table(s, d, "documents")
        .select(Seq(col("doc_id"), col("lang").as("declared_lang"),
          TextOps.langId(col("text")).as("predicted_lang")) ++
          scores.map { case (l, c) => c.as(s"score_$l") }: _*)
        .orderBy(col("doc_id"))
    }, Some {
      val scoreExprs = TextOps.langMarkers.map { case (lang, markers) =>
        val cnt = markers.map(m =>
          s"(length(p) - length(replace(p, '$m', ''))) // ${m.length}").mkString(" + ")
        s"CAST($cnt AS BIGINT) AS score_$lang"
      }.mkString(", ")
      // argmax with tie-break by language code asc; all-zero -> 'und'
      val langsAsc = TextOps.langMarkers.map(_._1)
      val caseExpr = langsAsc.map { l =>
        val others = langsAsc.filter(_ != l)
        val strictlyBeatsEarlier = langsAsc.takeWhile(_ != l).map(o => s"score_$l > score_$o")
        val atLeastLater = langsAsc.dropWhile(_ != l).drop(1).map(o => s"score_$l >= score_$o")
        val conds = (Seq(s"score_$l > 0") ++ strictlyBeatsEarlier ++ atLeastLater).mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""
      WITH padded AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
      scored AS (SELECT doc_id, lang, $scoreExprs FROM padded)
      SELECT doc_id, lang AS declared_lang,
        CASE $caseExpr ELSE 'und' END AS predicted_lang,
        ${TextOps.langMarkers.map(m => s"score_${m._1}").mkString(", ")}
      FROM scored ORDER BY doc_id"""
    }),

    CatalogQuery("qt22_langid_margin", (s, d) => {
      // Language-ID confidence margin — top-1 minus top-2 marker score
      // from qt01's scorer. The production routing signal: a zero margin
      // means the n-gram heuristic is guessing (tie or all-zero), and
      // those docs — typically short, code-mixed, or genuinely
      // multilingual — get routed to the expensive classifier instead of
      // being mislabeled in bulk. Cheap screen first, model second is
      // the only affordable shape at 100 TB.
      //
      // Scale shape: pure per-row codegen'd expressions (the same
      // occurrence counters qt01 pipelines inside the scan) plus one
      // 5-element sort_array per row; no shuffle at all before the
      // ordered output. All-integer scores, so both engines agree
      // exactly.
      val scores = TextOps.langScores(col("text"))
      val arr = sort_array(array(scores.map(_._2.cast("long")): _*), asc = false)
      table(s, d, "documents")
        .select(col("doc_id"), element_at(arr, 1).as("top_score"),
          (element_at(arr, 1) - element_at(arr, 2)).as("margin"))
        .orderBy(col("doc_id"))
    }, Some {
      val scoreExprs = TextOps.langMarkers.map { case (lang, markers) =>
        val cnt = markers.map(m =>
          s"(length(p) - length(replace(p, '$m', ''))) // ${m.length}").mkString(" + ")
        s"CAST($cnt AS BIGINT) AS score_$lang"
      }.mkString(", ")
      val scoreList = TextOps.langMarkers.map(m => s"score_${m._1}").mkString(", ")
      s"""
      WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
      scored AS (SELECT doc_id, $scoreExprs FROM padded),
      sorted AS (SELECT doc_id, list_sort([$scoreList], 'DESC') AS l FROM scored)
      SELECT doc_id, l[1] AS top_score, l[1] - l[2] AS margin
      FROM sorted ORDER BY doc_id"""
    }),

    CatalogQuery("qt28_langid_confusion", (s, d) => {
      // Language-ID CONFUSION MATRIX — the standard langid evaluation,
      // read against the corpus's declared lang metadata: (declared,
      // predicted) doc counts. Off-diagonal mass says which language
      // pairs the n-gram heuristic conflates (qt22's margin says which
      // DOCS are uncertain; this says which CLASSES collide — the table
      // that decides where the expensive classifier is actually needed,
      // and whether a source's declared labels can be trusted at all).
      //
      // Scale shape: composes qt01 through the catalog (per-row
      // codegen'd marker counters inside the scan, no shuffle before
      // the agg); the finish is one hash agg bounded by L² language
      // pairs. All-integer.
      QueryCatalog.byName("qt01_langid").build(s, d)
        .groupBy(col("declared_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("declared_lang"), col("predicted_lang"))
    }, Some {
      val scoreExprs = TextOps.langMarkers.map { case (lang, markers) =>
        val cnt = markers.map(m =>
          s"(length(p) - length(replace(p, '$m', ''))) // ${m.length}").mkString(" + ")
        s"CAST($cnt AS BIGINT) AS score_$lang"
      }.mkString(", ")
      val langsAsc = TextOps.langMarkers.map(_._1)
      val caseExpr = langsAsc.map { l =>
        val strictlyBeatsEarlier = langsAsc.takeWhile(_ != l).map(o => s"score_$l > score_$o")
        val atLeastLater = langsAsc.dropWhile(_ != l).drop(1).map(o => s"score_$l >= score_$o")
        val conds = (Seq(s"score_$l > 0") ++ strictlyBeatsEarlier ++ atLeastLater).mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""
      WITH padded AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
      scored AS (SELECT doc_id, lang, $scoreExprs FROM padded),
      pred AS (SELECT lang AS declared_lang,
        CASE $caseExpr ELSE 'und' END AS predicted_lang FROM scored)
      SELECT declared_lang, predicted_lang, count(*) AS n_docs
      FROM pred GROUP BY 1, 2 ORDER BY declared_lang, predicted_lang"""
    }),

    CatalogQuery("qt02_quality_score", (s, d) => {
      val txt = col("text")
      val nTokens = size(TextOps.tokens(txt))
      val nPunct = length(txt) - length(regexp_replace(txt, "[.,!?;:]", ""))
      val nStop = TextOps.occurrences(concat(lit(" "), txt, lit(" ")), " the ") +
        TextOps.occurrences(concat(lit(" "), txt, lit(" ")), " a ")
      table(s, d, "documents")
        .select(col("doc_id"), nTokens.as("n_tokens"),
          round(nPunct.cast("double") / length(txt), 6).as("punct_ratio"),
          round(nStop.cast("double") / nTokens, 6).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (
        SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
          length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
          (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
            + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3 AS n_stop,
          length(text) AS len
        FROM documents)
      SELECT doc_id, n_tokens,
        round(CAST(n_punct AS DOUBLE) / len, 6) AS punct_ratio,
        round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio
      FROM f ORDER BY doc_id""")),

    CatalogQuery("qt03_token_count", (s, d) => {
      val toks = TextOps.tokens(col("text"))
      // BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
      // (ASCII classes so Java regex and RE2 agree exactly)
      val bpeish = regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))
      table(s, d, "documents")
        .select(col("doc_id"), size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct_tokens"),
          size(bpeish).as("n_subword_tokens"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        length(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct_tokens,
        length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_subword_tokens
      FROM documents ORDER BY doc_id""")),

    CatalogQuery("qt05_normalize", (s, d) => {
      // Canonical text normalization — the preprocessing step every text
      // dedup pipeline runs first: Unicode NFC (custom codegen'd
      // Expression; decomposed "e"+U+0301 and precomposed "é" must hash
      // identically or near-dup detection silently misses pairs) +
      // casefold + whitespace collapse. Pure per-row expressions that
      // pipeline inside the scan; output is the normalized hash, the
      // stable identity downstream dedup keys on. DuckDB's nfc_normalize
      // implements the same Unicode normal form, making the oracle exact.
      import graft.functions.expressions.NfcNormalize.nfc
      val norm = regexp_replace(lower(nfc(col("text"))), "\\s+", " ")
      table(s, d, "documents")
        .select(col("doc_id"), length(norm).as("norm_len"), md5(norm).as("norm_hash"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        length(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_len,
        md5(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_hash
      FROM documents ORDER BY doc_id""")),

    CatalogQuery("qt04_fingerprint", (s, d) => {
      val grams = TextOps.charShingles(col("text"), 8)
      table(s, d, "documents")
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"),
          array_min(transform(grams, g => md5(g))).as("fingerprint"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        list_min([md5(g) for g in list_distinct([substr(text, i, 8) for i in range(1, greatest(length(text) - 7, 0) + 1)])]) AS fingerprint
      FROM documents WHERE length(text) >= 8 ORDER BY doc_id""")),

    CatalogQuery("qt06_repetition", (s, d) => {
      // Gopher-style repetition quality filters: the fraction of repeated
      // tokens and the share of the document covered by its single most
      // frequent word bigram — the standard signals for dropping
      // boilerplate / degenerate generations from a training corpus.
      // The dup-token ratio is a pure per-row expression. The top-bigram
      // count deliberately does NOT use a per-row O(distinct × n)
      // expression scan (quadratic in document length — fatal on
      // 10k-token web docs): bigrams explode to (doc_id, bigram) rows and
      // reduce through two hash aggregations, both with map-side partials
      // keyed by doc_id — linear work, bounded buffers, scales to any
      // document length.
      val toks = TextOps.tokens(col("text"))
      val base = table(s, d, "documents")
        .select(col("doc_id"), toks.as("toks"),
          size(toks).as("n_tokens"), size(array_distinct(toks)).as("n_distinct"))
      val nBigrams = greatest(size(col("toks")) - 1, lit(0))
      val bigrams = base.select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), nBigrams),
          slice(col("toks"), lit(2), nBigrams),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      val topBigram = bigrams
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_count"))
      base.select(col("doc_id"), col("n_tokens"), col("n_distinct"))
        .join(topBigram, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          round((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"), 6)
            .as("dup_token_ratio"),
          coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
          round((coalesce(col("top_bigram_count"), lit(0L)) * 2).cast("double")
            / col("n_tokens"), 6).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                 FROM documents),
      b AS (SELECT doc_id,
              unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bg
            FROM t),
      c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg),
      m AS (SELECT doc_id, max(c) AS top_bigram_count FROM c GROUP BY doc_id)
      SELECT t.doc_id, len(toks) AS n_tokens,
        round((len(toks) - len(list_distinct(toks)))::DOUBLE / len(toks), 6) AS dup_token_ratio,
        coalesce(m.top_bigram_count, 0) AS top_bigram_count,
        round((coalesce(m.top_bigram_count, 0) * 2)::DOUBLE / len(toks), 6) AS top_bigram_frac
      FROM t LEFT JOIN m ON t.doc_id = m.doc_id ORDER BY t.doc_id""")),

    CatalogQuery("qt07_tfidf_topterms", (s, d) => {
      // Characteristic-term extraction: top-3 terms per document by
      // tf·idf (idf = ln(N/df)) — keyword tagging / topic hints for
      // corpus triage. One explode of the token stream feeds BOTH
      // aggregates: tf = count per (doc, token); df = row count of the
      // tf table per token (each (doc, token) appears once there — no
      // second corpus pass, no count-distinct shuffle of raw tokens).
      // The per-doc ranking window partitions by doc_id, whose partition
      // size is bounded by per-doc vocabulary — never a hot partition,
      // unlike per-source/per-query windows (qp02/qs01 notes).
      // Determinism: ties rank on the 6-decimal ROUNDED score (then
      // token) on both sides, so a last-ulp libm difference in ln —
      // e.g. 2·ln(10) vs ln(100), algebraically equal, 1 ulp apart as
      // doubles — can never reorder rows across engines.
      val toks = table(s, d, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .persist() // df derives from tf — without the cache the join's df
                   // branch re-explodes the whole corpus a second time
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = table(s, d, "documents").agg(count(lit(1)).as("n"))
      val scored = tf.join(df, Seq("token")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(desc("tfidf"), col("token"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
          col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }, Some("""
      WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      nn AS (SELECT count(*) AS n FROM documents),
      sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
               round(tf.tf * ln(n::DOUBLE / df.df), 6) AS tfidf
             FROM tf JOIN df USING (token), nn),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, token) AS rank FROM sc)
      SELECT doc_id, rank, token, tf, df, tfidf
      FROM r WHERE rank <= 3 ORDER BY doc_id, rank""")),

    CatalogQuery("qt08_heavy_hitters", (s, d) => {
      // Dominant-token detection with a FIXED-size sketch: a mergeable
      // Misra-Gries summary (k = 32 counters) over the token stream —
      // the bounded-memory answer when the consumer needs only the
      // heavy tokens (stopword mining, corpus-skew alarms) and a full
      // vocabulary aggregation would be waste. Every aggregation buffer
      // holds ≤ k entries regardless of corpus or vocabulary size, so
      // the summary costs O(k) memory per task and the shuffle carries
      // ≤ partitions × k rows — the q17/q19b sketch discipline applied
      // to frequencies. Like qs03, the sketch output itself is not
      // oracle-mirrorable, so the gate is the sketch's PROVABLE
      // guarantee, verified distributively against exact counts computed
      // in the same plan: every token with true count > n/(k+1) must be
      // in the summary, and every estimate must undercount by ≤ n/(k+1)
      // and never overcount (Misra-Gries 1982; merge per Agarwal et al.
      // 2012). Both hold for ANY partitioning — MisraGriesSpec
      // property-tests that invariance.
      val K = 32
      val toks = table(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val summ = toks.agg(MisraGries.summary(K)(col("token")).as("s"))
        .select(explode(col("s")).as("h"))
        .select(col("h.token").as("token"), col("h.count").as("est"))
        .persist()
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact"))
      val tot = toks.agg(count(lit(1)).as("n_tokens"))
      val thresh = col("n_tokens").cast("double") / (K + 1)
      val errorBounded = broadcast(summ).join(exact, Seq("token"))
        .crossJoin(broadcast(tot))
        .select(((col("est") <= col("exact")) &&
          ((col("exact") - col("est")).cast("double") <= thresh)).cast("int").as("ok"))
        .agg(coalesce(min(col("ok")), lit(1)).as("eb"))
      val containsAll = exact.crossJoin(broadcast(tot))
        .filter(col("exact").cast("double") > thresh)
        .join(broadcast(summ.select(col("token"), lit(1).as("present"))),
          Seq("token"), "left")
        .select(coalesce(col("present"), lit(0)).as("ok"))
        .agg(coalesce(min(col("ok")), lit(1)).as("ca"))
      tot.crossJoin(containsAll).crossJoin(errorBounded)
        .select(col("n_tokens"), lit(K).as("k"),
          (col("ca") === 1).as("contains_all_hh"),
          (col("eb") === 1).as("error_bounded"))
    }, Some("""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                    FROM documents)
      SELECT CAST(count(*) AS BIGINT) AS n_tokens, 32 AS k,
        TRUE AS contains_all_hh, TRUE AS error_bounded
      FROM toks""")),

    CatalogQuery("qt09_unigram_logprob", (s, d) => {
      // Model-based quality scoring, the perplexity-filter shape
      // (CCNet/KenLM style): train a unigram LM on the corpus (one
      // aggregation), then score every document by its total token
      // log-probability in the same engine — the train-then-apply loop
      // the reference's analytics feedback exists for. Outlier docs
      // (unusually improbable token mix) rank lowest.
      //
      // Scale shape: the raw token stream is aggregated ONCE into the
      // per-(doc, token) tf table; the LM (vocab counts) and the total
      // derive from tf, and scoring joins tf — not the stream — against
      // the model, so the join input is bounded by Σ per-doc vocabulary.
      // Determinism: log-probs are 6-decimal-quantized decimals (qt07's
      // rounding convention), so the per-doc sum is exact decimal
      // arithmetic on both engines — never an order-dependent float sum.
      val toks = table(s, d, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .persist() // cnt + the scoring join both derive from tf
      val cnt = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
      val tot = cnt.agg(sum(col("c")).as("n_total"))
      val lp = cnt.crossJoin(broadcast(tot))
        .select(col("token"),
          round(log(col("c").cast("double") / col("n_total")), 6)
            .cast("decimal(20,6)").as("lp"))
      tf.join(lp, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("lp")).cast("double").as("sum_logprob"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf
             FROM toks GROUP BY doc_id, token),
      cnt AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY token),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt),
      lp AS (SELECT token,
               CAST(round(ln(c::DOUBLE / n_total), 6) AS DECIMAL(20,6)) AS lp
             FROM cnt, tot)
      SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        CAST(sum(tf.tf * lp.lp) AS DOUBLE) AS sum_logprob
      FROM tf JOIN lp USING (token)
      GROUP BY tf.doc_id ORDER BY tf.doc_id""")),

    CatalogQuery("qt10_hll_distinct", (s, d) => {
      // Sketched cardinality — the vocabulary/URL/user-count shape every
      // corpus audit runs first: per-source distinct-token counts via
      // HyperLogLog++ (`approx_count_distinct`, rsd=0.05). The sketch is
      // mergeable constant-size state (map-side partials, the shuffle
      // carries one ~kB sketch per source per partition), where exact
      // count(DISTINCT) shuffles every distinct value — at 100 TB the
      // sketch is the only viable plan, and THAT plan is what must be
      // certified. Gate = contract (q19b pattern): the oracle pins the
      // exact corpus constants + TRUE; Spark runs BOTH the sketch and the
      // exact aggregation at gate SF and proves every source's sketched
      // estimate lands within 3x the configured rsd of its exact
      // cardinality (HLL++ error is ~N(0, rsd) — 3 sigma; measured
      // margin across SFs is comfortable, re-measure before tightening).
      val toks = table(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
        .persist()
      val srcRow = toks.groupBy(col("source"))
        .agg(countDistinct(col("token")).as("exact"),
          approx_count_distinct(col("token"), HllRsd).as("approx"))
        .agg(count(lit(1)).as("n_sources"),
          min(when(abs(col("approx") - col("exact")) <= col("exact") * (3 * HllRsd), 1)
            .otherwise(0)).as("all_ok"))
        .head()
      val nGlobal = toks.agg(countDistinct(col("token"))).head().getLong(0)
      toks.unpersist()
      System.err.println(s"[qt10] n_sources=${srcRow.getLong(0)} " +
        s"global_distinct=$nGlobal all_within_3rsd=${srcRow.getInt(1) == 1}")
      import s.implicits._
      Seq((srcRow.getLong(0), nGlobal, srcRow.getInt(1) == 1))
        .toDF("n_sources", "n_distinct_global", "all_within_3rsd")
    }, Some("""
      WITH toks AS (SELECT source,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents)
      SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_global,
        TRUE AS all_within_3rsd
      FROM toks""")),

    CatalogQuery("qt11_cms_counts", (s, d) => {
      // Point-frequency sketch — Count-Min (Cormode & Muthukrishnan 2005)
      // over every token occurrence: the "how often does THIS key occur"
      // complement to qt08's heavy-hitter summary (which keys dominate)
      // and qt10's HLL (how many distinct keys). The sketch is a fixed
      // d×w counter grid built by a mergeable aggregator (map-side
      // partials; the shuffle carries one 2 MB grid per partition,
      // independent of corpus and vocabulary size) — at 100 TB the exact
      // per-key table is vocabulary-sized state the consumer may not
      // want, the grid always fits. Gate = contract (qt08/qt10 pattern):
      // oracle pins the exact top-20 token counts + TRUE; Spark builds
      // the sketch AND the exact aggregation and proves, per token,
      //  - no_undercount: estimate >= exact (deterministic one-sided
      //    error — every occurrence increments every probed cell);
      //  - within_bound: overcount <= 3x the analytic e*N/w scale.
      // The 20-row finish is a bounded TakeOrdered + driver lookup over
      // the collected grid; the heavy work (token explode, exact hash
      // aggregation, grid build) is fully distributed.
      import graft.functions.CountMin
      val toks = table(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .persist()
      val n = toks.count()
      val grid = toks.select(TextOps.hash60(col("token")).as("h"))
        .agg(CountMin.cmsBuild(CmsDepth, CmsWidth)(col("h")))
        .head().getSeq[Long](0).toArray
      val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .orderBy(desc("n_exact"), asc("token")).limit(20).collect() // bounded: 20 rows
      toks.unpersist()
      val bound = 3.0 * CountMin.expectedOvercount(CmsWidth, n)
      val rows = top.toSeq.map { r =>
        val (t, c) = (r.getString(0), r.getLong(1))
        val est = CountMin.estimate(grid, CountMin.hash60(t), CmsDepth, CmsWidth)
        (t, c, est >= c, (est - c).toDouble <= bound)
      }
      System.err.println(f"[qt11] n_tokens=$n over_bound=$bound%.1f max_over=${
        rows.map { case (t, c, _, _) =>
          CountMin.estimate(grid, CountMin.hash60(t), CmsDepth, CmsWidth) - c }.max}")
      import s.implicits._
      rows.toDF("token", "n_exact", "no_undercount", "within_bound")
    }, Some("""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents)
      SELECT token, CAST(count(*) AS BIGINT) AS n_exact,
        TRUE AS no_undercount, TRUE AS within_bound
      FROM toks GROUP BY token
      ORDER BY n_exact DESC, token LIMIT 20""")),

    CatalogQuery("qt12_bm25", (s, d) => {
      // Lexical retrieval scoring — Okapi BM25 (Robertson et al. 1994,
      // the +1 idf variant Lucene uses so idf stays positive) of a fixed
      // query against the corpus: the sparse half of a hybrid retrieval
      // stack (qs08 fuses scores, qs37 fuses RANKS; this is where the
      // lexical rank COMES from) and the standard "find training docs
      // about X" triage tool. Scoring lives in [[bm25DocScores]] (shared
      // with qs37's fusion so the two rows cannot drift); the finish is
      // a global top-10 = TakeOrderedAndProject (distributed
      // per-partition heads, no full sort).
      bm25DocScores(s, d)
        .orderBy(desc("score"), col("doc_id"))
        .limit(AnnTopK)
    }, Some(oBm25Sql), headline = true),

    CatalogQuery("qt23_index_bm25", (s, d) => {
      // The PERSISTENT-inverted-index serving path under the correctness
      // gate — qs14's story on the sparse axis: build the TextIndexStore
      // artifact (bucket-partitioned posting lists + corpus stats
      // manifest) and answer qt12's fixed query FROM THE ARTIFACT. Same
      // scoring conventions as qt12 (pre-folded constants, 6-decimal
      // quantized per-term scores), so the oracle is qt12's SQL
      // verbatim — gating tokenize→post→prune→score end to end against
      // DuckDB. Scale shape: serving opens only the query terms' bucket
      // partitions (parquet partition pruning on the token axis,
      // spec-pinned in TextIndexSpec); df derives from the pruned slice
      // itself; corpus stats come from the manifest, not a scan.
      Serve.queryTextIndex(s, Serve.buildTextIndex(s, d))
    }, Some(oBm25Sql), headline = true),

    CatalogQuery("qt31_phrase_match", (s, d) => {
      // Exact PHRASE matching — the consecutive-token retrieval
      // primitive bag-of-words BM25 (qt12/qt23) cannot express and
      // qt24's single-term KWIC only approximates: per document, the
      // occurrence count and first position of each fixed multi-token
      // phrase (the quoted-query / boilerplate-detector / contamination-
      // span primitive). One pure per-row array expression per phrase —
      // a codegen'd filter over the token-position sequence, so the
      // whole query pipelines inside the corpus scan with NO shuffle
      // before the final sort: at 100 TB it is one streaming pass,
      // embarrassingly parallel over document partitions, and k-token
      // phrases cost k element probes per position (no materialized
      // n-gram blowup — contrast qt21's exploded trigrams, which exist
      // to AGGREGATE; a fixed-phrase probe never needs the explode).
      //
      // MIRROR CONTRACT: position semantics are 1-based over
      // whitespace-split tokens on BOTH sides (TextOps.tokens ==
      // regexp_split_to_array(trim(text),'\s+'); Spark sequence(1, n-L+1)
      // is inclusive == DuckDB range(1, n-L+2) exclusive); zero-hit docs
      // drop on both sides, and Spark's INT positions cast to BIGINT to
      // match DuckDB's range/len types. Phrases were chosen with hits at
      // every SF (bigram 26/19/278, trigram 3/7/11 at sf0.001/0.01/0.1).
      val base = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      def hits(phrase: Seq[String]): DataFrame = {
        val L = phrase.length
        val n = size(col("toks"))
        // sequence(1, n-L+1) counts DOWN when n < L (the charShingles
        // gotcha) — the when() guard keeps empty docs empty
        val ps = when(n >= L, filter(sequence(lit(1), n - lit(L - 1)),
            i => phrase.zipWithIndex.map { case (w, j) =>
              element_at(col("toks"), (i + lit(j)).cast("int")) === w
            }.reduce(_ && _)))
          .otherwise(array().cast("array<int>"))
        base.select(col("doc_id"), lit(phrase.mkString(" ")).as("phrase"), ps.as("ps"))
          .filter(size(col("ps")) >= 1)
          .select(col("doc_id"), col("phrase"),
            size(col("ps")).cast("long").as("n_hits"),
            element_at(col("ps"), 1).cast("long").as("first_pos"))
      }
      hits(Seq("fast", "table"))
        .unionAll(hits(Seq("stream", "table", "hash")))
        .orderBy(col("phrase"), col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      h AS (
        SELECT doc_id, 'fast table' AS phrase,
          list_filter(range(1, greatest(len(a) - 1, 0) + 1),
            i -> a[i] = 'fast' AND a[i+1] = 'table') AS ps
        FROM t
        UNION ALL
        SELECT doc_id, 'stream table hash' AS phrase,
          list_filter(range(1, greatest(len(a) - 2, 0) + 1),
            i -> a[i] = 'stream' AND a[i+1] = 'table' AND a[i+2] = 'hash') AS ps
        FROM t)
      SELECT doc_id, phrase, CAST(len(ps) AS BIGINT) AS n_hits,
        CAST(ps[1] AS BIGINT) AS first_pos
      FROM h WHERE len(ps) >= 1
      ORDER BY phrase, doc_id""")),

    CatalogQuery("qt32_index_phrase_serve", (s, d) => {
      // qt31's phrase queries served from the PERSISTENT POSITIONAL
      // INDEX instead of a corpus scan — TextIndexStore postings carry
      // each (token, doc)'s sorted 1-based positions, and queryPhrase
      // answers a quoted query by equi-joining the phrase slots'
      // PRUNED posting slices doc-at-a-time and intersecting position
      // lists with one codegen'd array filter (first-token position p
      // survives iff slot j holds p+j). Serve cost scales with the
      // phrase terms' posting lists, never the corpus — the
      // build-once/serve-many twin of qt31's full scan, which this row
      // gates against THE SAME ORACLE: the index path must reproduce
      // the scan path's rows exactly (same phrases, same 1-based
      // conventions, same zero-hit drop).
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt32-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      def served(phrase: Seq[String]) =
        graft.sinks.TextIndexStore.queryPhrase(s, idxDir, phrase)
          .select(col("doc_id"), lit(phrase.mkString(" ")).as("phrase"),
            col("n_hits"), col("first_pos"))
      served(Seq("fast", "table"))
        .unionAll(served(Seq("stream", "table", "hash")))
        .orderBy(col("phrase"), col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      h AS (
        SELECT doc_id, 'fast table' AS phrase,
          list_filter(range(1, greatest(len(a) - 1, 0) + 1),
            i -> a[i] = 'fast' AND a[i+1] = 'table') AS ps
        FROM t
        UNION ALL
        SELECT doc_id, 'stream table hash' AS phrase,
          list_filter(range(1, greatest(len(a) - 2, 0) + 1),
            i -> a[i] = 'stream' AND a[i+1] = 'table' AND a[i+2] = 'hash') AS ps
        FROM t)
      SELECT doc_id, phrase, CAST(len(ps) AS BIGINT) AS n_hits,
        CAST(ps[1] AS BIGINT) AS first_pos
      FROM h WHERE len(ps) >= 1
      ORDER BY phrase, doc_id""")),

    CatalogQuery("qt34_index_proximity_serve", (s, d) => {
      // Ordered PROXIMITY retrieval from the positional index — the
      // within-window primitive between bag-of-words BM25 and qt32's
      // exact phrase: a doc hits when the terms appear in order spanning
      // at most `window` tokens. queryProximity reuses the phrase path's
      // document-at-a-time slot joins over bucket-pruned posting slices;
      // the chain check is nested codegen'd `exists` lambdas over the
      // stored position lists, each level capturing the anchor position
      // for the span bound. The oracle is the same nested-lambda
      // formulation over a full corpus scan (DuckDB list_filter capture
      // mirrors Spark's exists capture exactly) — the index path must
      // reproduce the scan rows at every SF. window = L-1 degenerates to
      // the exact phrase (spec-pinned); the gated windows are wider.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt34-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      def served(terms: Seq[String], w: Int) =
        graft.sinks.TextIndexStore.queryProximity(s, idxDir, terms, w)
          .select(col("doc_id"),
            lit(terms.mkString(" ") + s" ~$w").as("query"),
            col("n_anchors"), col("first_pos"))
      served(Seq("fast", "table"), 4)
        .unionAll(served(Seq("fast", "table", "scan"), 5))
        .orderBy(col("query"), col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      pos AS (SELECT doc_id,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'fast') AS ps0,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'table') AS ps1,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'scan') AS ps2
        FROM t),
      h AS (
        SELECT doc_id, 'fast table ~4' AS query,
          list_filter(ps0, p ->
            len(list_filter(ps1, q -> q > p AND q - p <= 4)) > 0) AS anch
        FROM pos
        UNION ALL
        SELECT doc_id, 'fast table scan ~5' AS query,
          list_filter(ps0, p ->
            len(list_filter(ps1, q -> q > p AND q - p <= 5
              AND len(list_filter(ps2, r -> r > q AND r - p <= 5)) > 0)) > 0) AS anch
        FROM pos)
      SELECT doc_id, query, CAST(len(anch) AS BIGINT) AS n_anchors,
        CAST(anch[1] AS BIGINT) AS first_pos
      FROM h WHERE len(anch) >= 1
      ORDER BY query, doc_id""")),

    CatalogQuery("qt35_index_proximity_batch", (s, d) => {
      // MANY ordered-proximity queries served from the positional index
      // in ONE pass — qt33's eval-set shape on the proximity axis
      // (TextIndexStore.queryProximityBatch): one posting-slice open for
      // the term union, a broadcast (query_id, slot, token) table, the
      // per-(query, doc) slot-map fold, and a GREEDY chain per anchor
      // (prevⱼ = min{q ∈ posⱼ : q > prevⱼ₋₁}; exact by dominance — the
      // feasible set for slot j+1 only grows as prevⱼ shrinks, so the
      // minimal choice witnesses a chain iff any choice does). The
      // oracle is qt34's nested-exists formulation per query — a
      // genuinely INDEPENDENT decision procedure (existential search vs
      // greedy fold), so a hash match proves the dominance argument on
      // real data, not just the plumbing. The set exercises 2- and
      // 3-term chains, a fresh term pair, and a DUPLICATE-WORD query
      // (both slots over the same posting row, window wider than the
      // phrase gap).
      import s.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt35-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      val queries = Seq(
        (0L, Seq("fast", "table"), 4),
        (1L, Seq("fast", "table", "scan"), 5),
        (2L, Seq("stream", "hash"), 8),
        (3L, Seq("table", "table"), 3)).toDF("query_id", "terms", "window")
      graft.sinks.TextIndexStore.queryProximityBatch(s, idxDir, queries)
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      pos AS (SELECT doc_id,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'fast') AS f,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'table') AS tb,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'scan') AS sc,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'stream') AS st,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'hash') AS h
        FROM t),
      hh AS (
        SELECT 0 AS query_id, doc_id,
          list_filter(f, p ->
            len(list_filter(tb, q -> q > p AND q - p <= 4)) > 0) AS anch
        FROM pos
        UNION ALL
        SELECT 1, doc_id,
          list_filter(f, p ->
            len(list_filter(tb, q -> q > p AND q - p <= 5
              AND len(list_filter(sc, r -> r > q AND r - p <= 5)) > 0)) > 0)
        FROM pos
        UNION ALL
        SELECT 2, doc_id,
          list_filter(st, p ->
            len(list_filter(h, q -> q > p AND q - p <= 8)) > 0)
        FROM pos
        UNION ALL
        SELECT 3, doc_id,
          list_filter(tb, p ->
            len(list_filter(tb, q -> q > p AND q - p <= 3)) > 0)
        FROM pos)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        CAST(len(anch) AS BIGINT) AS n_anchors,
        CAST(anch[1] AS BIGINT) AS first_pos
      FROM hh WHERE len(anch) >= 1
      ORDER BY query_id, doc_id""")),

    CatalogQuery("qt36_index_near_serve", (s, d) => {
      // UNORDERED proximity (NEAR) retrieval from the positional index —
      // the classic `a NEAR/n b` operator completing the positional-serve
      // family (qt31/qt32 exact phrase, qt34 ordered chain, HERE
      // order-free): a doc hits when all terms appear in ANY order with
      // some occurrence choice spanning <= window tokens
      // (TextIndexStore.queryNear — nested exists lambdas, each level
      // within `window` of EVERY previously chosen position; pairwise ⇔
      // max-min <= window). The oracle is qt34's nested-lambda
      // formulation SYMMETRIZED (abs instead of the ordered q > p),
      // mirrored per query; anchors count on the first LISTED term (the
      // documented convention). At window 4, NEAR('fast','table') finds
      // ~1.7× the docs of the ordered chain at every SF (the reversed
      // "table .. fast" hits) — measured before pinning the constants.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt36-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      def served(terms: Seq[String], w: Int) =
        graft.sinks.TextIndexStore.queryNear(s, idxDir, terms, w)
          .select(col("doc_id"),
            lit(terms.mkString(" ") + s" N$w").as("query"),
            col("n_anchors"), col("first_pos"))
      served(Seq("fast", "table"), 4)
        .unionAll(served(Seq("stream", "hash"), 6))
        .unionAll(served(Seq("fast", "table", "scan"), 6))
        .orderBy(col("query"), col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      pos AS (SELECT doc_id,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'fast') AS f,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'table') AS tb,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'scan') AS sc,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'stream') AS st,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'hash') AS h
        FROM t),
      hh AS (
        SELECT doc_id, 'fast table N4' AS query,
          list_filter(f, p ->
            len(list_filter(tb, q -> abs(q - p) <= 4)) > 0) AS anch
        FROM pos
        UNION ALL
        SELECT doc_id, 'stream hash N6',
          list_filter(st, p ->
            len(list_filter(h, q -> abs(q - p) <= 6)) > 0)
        FROM pos
        UNION ALL
        SELECT doc_id, 'fast table scan N6',
          list_filter(f, p ->
            len(list_filter(tb, q -> abs(q - p) <= 6
              AND len(list_filter(sc, r -> abs(r - p) <= 6
                AND abs(r - q) <= 6)) > 0)) > 0)
        FROM pos)
      SELECT doc_id, query, CAST(len(anch) AS BIGINT) AS n_anchors,
        CAST(anch[1] AS BIGINT) AS first_pos
      FROM hh WHERE len(anch) >= 1
      ORDER BY query, doc_id""")),

    CatalogQuery("qt37_index_near_batch", (s, d) => {
      // MANY unordered-proximity (NEAR) queries served from the
      // positional index in ONE pass — the batch-serving matrix's last
      // positional axis (qt33 phrase batch / qt35 ordered-chain batch /
      // HERE order-free): TextIndexStore.queryNearBatch decides each
      // anchor by the CANDIDATE-WINDOW cover check (a span-≤-w choice
      // containing anchor p exists iff some window [m, m+w] with
      // m ∈ {p} ∪ occurrences∩[p−w, p] covers every slot — a valid
      // choice's minimum is such an m, and a covering window yields the
      // choice), while the oracle is qt36's SYMMETRIZED nested-lambda
      // formulation per query — two independent decision procedures, so
      // the hash match proves the window-min equivalence on data. Query
      // set = qt36's three rows batched under one slot-map fold.
      import s.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt37-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      val queries = Seq(
        (0L, Seq("fast", "table"), 4),
        (1L, Seq("stream", "hash"), 6),
        (2L, Seq("fast", "table", "scan"), 6)).toDF("query_id", "terms", "window")
      graft.sinks.TextIndexStore.queryNearBatch(s, idxDir, queries)
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      pos AS (SELECT doc_id,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'fast') AS f,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'table') AS tb,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'scan') AS sc,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'stream') AS st,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'hash') AS h
        FROM t),
      hh AS (
        SELECT 0 AS query_id, doc_id,
          list_filter(f, p ->
            len(list_filter(tb, q -> abs(q - p) <= 4)) > 0) AS anch
        FROM pos
        UNION ALL
        SELECT 1, doc_id,
          list_filter(st, p ->
            len(list_filter(h, q -> abs(q - p) <= 6)) > 0)
        FROM pos
        UNION ALL
        SELECT 2, doc_id,
          list_filter(f, p ->
            len(list_filter(tb, q -> abs(q - p) <= 6
              AND len(list_filter(sc, r -> abs(r - p) <= 6
                AND abs(r - q) <= 6)) > 0)) > 0)
        FROM pos)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        CAST(len(anch) AS BIGINT) AS n_anchors,
        CAST(anch[1] AS BIGINT) AS first_pos
      FROM hh WHERE len(anch) >= 1
      ORDER BY query_id, doc_id""")),

    CatalogQuery("qt33_index_phrase_batch", (s, d) => {
      // MANY phrase queries served from the positional index in ONE
      // pass — qt30's eval-set shape on the phrase axis, completing the
      // batch-serving matrix (dense qs24 / compressed qs32 / graph qs33
      // / sparse qt30 / phrase HERE): the posting slice opens once for
      // the union of every phrase's terms, each phrase slot joins it
      // through a broadcast (query_id, slot, token) table, and per
      // (query, doc) the slot position lists fold into one map whose
      // intersection is a single codegen'd array filter. The query set
      // deliberately exercises the edge branches: a single-token phrase
      // (slot-0 list served verbatim — the sequence(1,0) guard) and a
      // DUPLICATE-WORD phrase (two slots over the same posting row).
      // Oracle = qt31's scan formulation per query — the batch index
      // path must reproduce the full-scan rows exactly.
      import s.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt33-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      val queries = Seq(
        (0L, Seq("fast", "table")),
        (1L, Seq("stream", "table", "hash")),
        (2L, Seq("table")),
        (3L, Seq("table", "table"))).toDF("query_id", "phrase")
      graft.sinks.TextIndexStore.queryPhraseBatch(s, idxDir, queries)
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents),
      h AS (
        SELECT 0 AS query_id, doc_id,
          list_filter(range(1, greatest(len(a) - 1, 0) + 1),
            i -> a[i] = 'fast' AND a[i+1] = 'table') AS ps
        FROM t
        UNION ALL
        SELECT 1, doc_id,
          list_filter(range(1, greatest(len(a) - 2, 0) + 1),
            i -> a[i] = 'stream' AND a[i+1] = 'table' AND a[i+2] = 'hash')
        FROM t
        UNION ALL
        SELECT 2, doc_id,
          list_filter(range(1, len(a) + 1), i -> a[i] = 'table')
        FROM t
        UNION ALL
        SELECT 3, doc_id,
          list_filter(range(1, greatest(len(a) - 1, 0) + 1),
            i -> a[i] = 'table' AND a[i+1] = 'table')
        FROM t)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        CAST(len(ps) AS BIGINT) AS n_hits, CAST(ps[1] AS BIGINT) AS first_pos
      FROM h WHERE len(ps) >= 1
      ORDER BY query_id, doc_id""")),

    CatalogQuery("qt38_bm25_filtered_serve", (s, d) => {
      // TENANT-SCOPED BM25 from the persistent text index — the SPARSE
      // paradigm's cell of the (paradigm × filtered) matrix, and the one
      // where scoping changes the SCORES, not just the candidates: each
      // label is its own corpus, so df, N, and avgdl all come from the
      // label's sub-corpus (a per-language index genuinely needs this —
      // 'the' is rare in the de sub-corpus and a global idf would
      // mis-rank every non-majority language). The store's scoped
      // layout makes that structural: postings partition by
      // (bucket, meta) — the scan prunes to (query terms' buckets × the
      // batch's labels) before any score computes — per-(token, label)
      // df derives from exactly that slice, and (n, sumdl) come from
      // the labelstats plane (per-label base + batch increments behind
      // the folded watermark; build/append/delete/compact all carry it,
      // spec-pinned).
      //
      // MIRROR CONTRACT: qt12's exact scoring conventions (pre-folded
      // constants, 6-decimal DECIMAL(20,6) per-term quantization, sum
      // cast DOUBLE, (score DESC, doc_id) rank order) evaluated at each
      // label's (n, sumdl, df) — lit-vs-column stats take the same
      // type-promotion path, so the oracle is the per-label qt12
      // formulation verbatim. Three queries over three labels exercise
      // three distinct stat sets (hits at every SF — driver-side duckdb
      // sweep, r15).
      Serve.queryTextFilteredBatch(s, d, Serve.buildTextIndexScoped(s, d))
    }, Some(oBm25FilteredSql)),

    CatalogQuery("qt30_index_bm25_batch", (s, d) => {
      // MANY keyword queries served from the persistent inverted index
      // in ONE pass — the eval-set / relevance-sweep shape (qs24's
      // batch-serving story on the sparse axis): the posting slice opens
      // once for the union of the three fixed queries' terms, per-term
      // df derives from that slice (global, query-independent), each
      // query scores only its own terms via a broadcast (query_id,
      // token) join, and ranking is the bounded top-k aggregator per
      // query. Scoring is qt12's exact convention (pre-folded constants,
      // 6-decimal quantized per-term decimals), so the oracle mirrors it
      // with a VALUES query table + per-query row_number. Query 0 IS
      // qt12's fixed query — its rows double-check the batch path
      // against the single-query gate row.
      import s.implicits._
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt30-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      val queries = Seq(
        (0L, Seq("spark", "join", "window")),
        (1L, Seq("merge", "column")),
        (2L, Seq("scan", "filter", "hash"))).toDF("query_id", "terms")
      graft.sinks.TextIndexStore.queryBm25Batch(s, idxDir, queries, AnnTopK)
    }, Some(s"""
      WITH q(query_id, term) AS (
        SELECT * FROM (VALUES
          (0, 'spark'), (0, 'join'), (0, 'window'),
          (1, 'merge'), (1, 'column'),
          (2, 'scan'), (2, 'filter'), (2, 'hash')) v(query_id, term)),
      f AS (SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\\s+')) AS dl,
          unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM f
             WHERE token IN (SELECT DISTINCT term FROM q)
             GROUP BY doc_id, dl, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(length(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS sumdl
        FROM documents),
      sc AS (SELECT q.query_id, tf.doc_id,
          CAST(round(((ln(1.0 + ((n - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)) * tf.tf) * 2.2)
            / (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS DECIMAL(20,6)) AS sc
        FROM tf JOIN df USING (token) JOIN q ON q.term = tf.token, stats),
      agg AS (SELECT query_id, doc_id, CAST(sum(sc) AS DOUBLE) AS score
              FROM sc GROUP BY query_id, doc_id),
      ranked AS (SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS rank
        FROM agg)
      SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
      FROM ranked WHERE rank <= $AnnTopK
      ORDER BY query_id, rank""")),

    CatalogQuery("qt29_index_bm25_delete_serve", (s, d) => {
      // Text-index deletion under the gate — the takedown path on the
      // sparse artifact (qs16/qd21's story on the token axis): build the
      // TextIndexStore, TOMBSTONE a fixed doc list (O(|ids|), no store
      // rewrite), and serve qt12's fixed query. Deletion must reshape
      // EVERYTHING BM25 reads: the deleted docs vanish from the ranking,
      // their postings stop counting toward df (df derives from the
      // pruned slice, so the anti-join shrinks both at once), and the
      // corpus stats (N, Σdl) subtract their contributions via the
      // id-hash-pruned doc-length map — so every surviving score shifts.
      // The oracle is qt12's SQL with the corpus filtered on BOTH the
      // posting and the stats side — exactly those semantics. The id
      // list holds two served top docs per test SF (visible reshaping
      // everywhere); off-SF ids are inert but exactly mirrored.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qt29-tidx").toString
      graft.sinks.TextIndexStore.build(table(s, d, "documents"), 64, idxDir)
      graft.sinks.TextIndexStore.delete(s, idxDir, TextDeletedDocIds)
      graft.sinks.TextIndexStore.queryBm25(s, idxDir,
        Seq("spark", "join", "window"), AnnTopK)
    }, Some(oBm25SqlWhere(
      s"doc_id NOT IN (${TextDeletedDocIds.mkString(", ")})"))),

    CatalogQuery("qt26_source_lexical_diversity", (s, d) => {
      // Per-source lexical diversity — type-token ratio over each
      // source's pooled token stream: template mills and generated spam
      // reuse a tiny vocabulary over huge token mass (low TTR), organic
      // sources don't. The source-level companion to qt03's per-doc
      // counts and the cheap screen behind qp06-style source weighting.
      //
      // Scale shape: one token explode; distinct types per source is a
      // (source, token)-keyed distinct then a hash agg (the shuffle
      // carries distinct pairs, never the raw stream); totals are
      // map-side partial counts; output is S rows, all-integer ppm.
      val toks = table(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      val types = toks.select(col("source"), col("w")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_types"))
      val totals = toks.groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      val docs = table(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      docs.join(totals, Seq("source")).join(types, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
          expr("n_types * 1000000L div n_tokens").as("ttr_ppm"))
        .orderBy(col("source"))
    }, Some("""
      WITH t AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                 FROM documents),
      ty AS (SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS n_types FROM t GROUP BY source),
      tot AS (SELECT source, count(*) AS n_tokens FROM t GROUP BY source),
      dc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
      SELECT source, n_docs, n_tokens, n_types,
        n_types * 1000000 // n_tokens AS ttr_ppm
      FROM dc JOIN tot USING (source) JOIN ty USING (source)
      ORDER BY source""")),

    CatalogQuery("qt27_span_novelty", (s, d) => {
      // NEW-content yield per source — the crawl-ops number behind "is
      // this dump worth ingesting": of a source's distinct (doc, span)
      // instances, how many are the span's FIRST corpus occurrence
      // (minimum doc_id — the deterministic first-occurrence convention)?
      // Syndication mirrors and re-crawls score near zero novelty while
      // still passing per-doc quality screens; FineWeb-style dump
      // curation keys ingest decisions on exactly this yield. Span unit =
      // qd08's 8-token hash60, so "novel" here is the complement of the
      // content qd08/qd09 would flag as duplicated — same row class, the
      // source-level admission view instead of the per-doc removal view.
      //
      // Scale shape: qd08's keys-only discipline — each position ships
      // one (doc_id, hash60) pair, never span strings; first-occurrence
      // is a hash agg (min doc_id per span) joined back KEYED by the
      // span hash; the finish is an S-row all-integer ppm table.
      val W = DupSpanW
      val toks = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val pos = toks.select(col("doc_id"),
        explode(when(size(col("w")) >= W,
          transform(sequence(lit(1), size(col("w")) - (W - 1)),
            i => TextOps.hash60(concat_ws(" ", slice(col("w"), i, lit(W))))))
          .otherwise(array().cast("array<bigint>"))).as("h"))
      val inst = pos.select(col("doc_id"), col("h")).distinct()
      val firsts = inst.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      val src = table(s, d, "documents").select(col("doc_id"), col("source"))
      inst.join(firsts, Seq("h")).join(src, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_span_values"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("source"), col("n_span_values"), col("n_novel"),
          expr("n_novel * 1000000L div n_span_values").as("novelty_ppm"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
                 FROM documents),
      pos AS (SELECT t.doc_id,
          CAST(('0x' || substr(md5(array_to_string(w[u.i : u.i + ${DupSpanW - 1}], ' ')), 1, 15)) AS BIGINT) AS h
        FROM t, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(w) - ${DupSpanW - 1}, 0))) AS i) u),
      inst AS (SELECT DISTINCT doc_id, h FROM pos),
      firsts AS (SELECT h, min(doc_id) AS first_doc FROM inst GROUP BY h),
      j AS (SELECT d.source, inst.doc_id, firsts.first_doc
            FROM inst JOIN firsts USING (h)
            JOIN documents d ON inst.doc_id = d.doc_id)
      SELECT source, CAST(count(*) AS BIGINT) AS n_span_values,
        CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) * 1000000
          // CAST(count(*) AS BIGINT) AS novelty_ppm
      FROM j GROUP BY source ORDER BY source""")),

    CatalogQuery("qp22_eval_pool", (s, d) => {
      // Fixed-SIZE held-out evaluation pool — the N documents with the
      // smallest identity hashes (N=100 here): where qp01's bucket split
      // fixes a PROPORTION, an eval pool must fix a COUNT (benchmarks
      // want "the same 100k docs", not "5% of whatever the corpus is
      // today"). The hash order makes the pool engine- and partitioning-
      // invariant, and appends perturb it minimally (a new doc enters
      // only by displacing the current maximum).
      //
      // Scale shape: TakeOrderedAndProject on the stateless per-row
      // hash — distributed per-partition heads of size N, no global
      // sort, no sampling state; the pool itself is the only output.
      val N = 100
      table(s, d, "documents")
        .select(col("doc_id"), TextOps.hash60(col("doc_id").cast("string")).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(N)
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("h").as("pool_rank_key"))
    }, Some("""
      SELECT doc_id, h AS pool_rank_key FROM (
        SELECT doc_id,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents ORDER BY h, doc_id LIMIT 100)
      ORDER BY doc_id""")),

    CatalogQuery("qt25_oov_rate", (s, d) => {
      // Out-of-vocabulary rate per document against the corpus's
      // top-1000 token vocabulary — the coverage audit behind vocab
      // sizing: a doc whose tokens mostly fall outside the head
      // vocabulary will fragment into long subword sequences (high
      // fertility) or <unk> mass, and a SOURCE with systematically high
      // OOV argues for a bigger vocab or a dedicated tokenizer. The
      // head-vocab cut is deterministic: (count DESC, token ASC), the
      // same rounded-rank discipline qt16's Zipf audit uses.
      //
      // Scale shape: one token explode feeds both the global counts
      // (hash agg, map-side partials) and the per-doc accounting; the
      // vocabulary is a bounded TakeOrdered(1000) set broadcast back as
      // a semi-join; per-doc OOV is one more hash agg, all integer
      // (ppm floor division).
      val toks = table(s, d, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .persist() // global counts + per-doc accounting both read it
      val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("w")).limit(1000)
        .select(col("w"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"),
          expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                 FROM documents),
      vocab AS (SELECT w FROM (
          SELECT w, count(*) AS c FROM t GROUP BY w
          ORDER BY c DESC, w LIMIT 1000)),
      pd AS (SELECT t.doc_id, count(*) AS n_tokens,
               CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
             FROM t LEFT JOIN vocab ON t.w = vocab.w
             GROUP BY t.doc_id)
      SELECT doc_id, n_tokens, n_oov * 1000000 // n_tokens AS oov_ppm
      FROM pd ORDER BY doc_id""")),

    CatalogQuery("qt24_kwic_snippets", (s, d) => {
      // Keyword-in-context snippets for the retrieval results — the
      // presentation half of the BM25 stack: for each of qt12's top-10
      // docs, the earliest matching query term, its token position, and
      // the 5-token window around it (what a search UI or a labeling
      // tool shows next to the hit). Composes qt12 through the catalog
      // so the doc set can never drift from the ranking it annotates.
      //
      // Scale shape: the expensive part IS qt12 (already scale-shaped);
      // this adds one broadcast-able 10-row join back to the corpus and
      // pure per-row array expressions (array_position / slice /
      // concat_ws — codegen'd, no shuffle). Every top doc hits ≥ 1 term
      // by construction (n_terms_hit ≥ 1), so the absent-term sentinel
      // can never win the least().
      val terms = Seq("spark", "join", "window")
      val top = QueryCatalog.byName("qt12_bm25").build(s, d)
        .select(col("doc_id"), col("score"))
      val toks = TextOps.tokens(col("text"))
      val absent = lit(Long.MaxValue)
      val ps = terms.map(t =>
        when(array_position(toks, t) === 0L, absent)
          .otherwise(array_position(toks, t)))
      val pmin = least(ps: _*)
      val firstTerm = when(ps(0) === pmin, terms(0))
        .when(ps(1) === pmin, terms(1)).otherwise(terms(2))
      val start = greatest(pmin - 2, lit(1L))
      top.join(table(s, d, "documents").select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), firstTerm.as("first_term"), pmin.as("first_pos"),
          concat_ws(" ", slice(toks, start.cast("int"), lit(5))).as("snippet"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT q.doc_id,
        CASE WHEN ps = pmin THEN 'spark'
             WHEN pj = pmin THEN 'join' ELSE 'window' END AS first_term,
        pmin AS first_pos,
        array_to_string(arr[greatest(pmin - 2, 1) : greatest(pmin - 2, 1) + 4], ' ') AS snippet
      FROM (
        SELECT q.doc_id, arr,
          CASE WHEN list_position(arr, 'spark') = 0 THEN 9223372036854775807
               ELSE list_position(arr, 'spark') END AS ps,
          CASE WHEN list_position(arr, 'join') = 0 THEN 9223372036854775807
               ELSE list_position(arr, 'join') END AS pj,
          CASE WHEN list_position(arr, 'window') = 0 THEN 9223372036854775807
               ELSE list_position(arr, 'window') END AS pw,
          least(
            CASE WHEN list_position(arr, 'spark') = 0 THEN 9223372036854775807
                 ELSE list_position(arr, 'spark') END,
            CASE WHEN list_position(arr, 'join') = 0 THEN 9223372036854775807
                 ELSE list_position(arr, 'join') END,
            CASE WHEN list_position(arr, 'window') = 0 THEN 9223372036854775807
                 ELSE list_position(arr, 'window') END) AS pmin
        FROM ($oBm25Sql) q
        JOIN (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
              FROM documents) t USING (doc_id)) q
      ORDER BY doc_id""")),

    CatalogQuery("qt13_pii_redact", (s, d) => {
      // PII detection + redaction — the scrubbing pass every released
      // corpus runs (C4 strips lines by blocklist; Dolma/FineWeb mask
      // emails/IPs/phones with regex exactly like this). The synthetic
      // corpus carries no organic PII, so the query first grafts a
      // deterministic contact surface onto each doc (mirrored verbatim
      // in the oracle — the detection/redaction machinery is what's
      // certified, not the generator), then counts and masks matches.
      //
      // Scale shape: pure per-row regexp expressions (codegen'd,
      // pipelined inside the scan — no shuffle, no UDF); patterns are
      // written in the RE2-compatible subset so the Java regex engine
      // and DuckDB's RE2 agree (\b, \d, and character classes only —
      // no backreferences or lookarounds, which RE2 lacks).
      val aug = concat(col("text"),
        lit(" Contact user"), (col("doc_id") % 1000).cast("string"),
        lit("@"), col("source"), lit(".example.com from "),
        ((col("doc_id") % 223) + 1).cast("string"), lit("."),
        (col("doc_id") * 7 % 256).cast("string"), lit("."),
        (col("doc_id") * 13 % 256).cast("string"), lit("."),
        ((col("doc_id") % 200) + 1).cast("string"))
      table(s, d, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(PiiEmailRe)).cast("long").as("n_emails"),
          regexp_count(col("aug"), lit(PiiIpRe)).cast("long").as("n_ips"),
          md5(regexp_replace(regexp_replace(col("aug"), lit(PiiEmailRe), lit("[EMAIL]")),
            lit(PiiIpRe), lit("[IP]"))).as("red_hash"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH a AS (SELECT doc_id,
          text || ' Contact user' || (doc_id % 1000)::VARCHAR || '@' || source
            || '.example.com from ' || ((doc_id % 223) + 1)::VARCHAR || '.'
            || (doc_id * 7 % 256)::VARCHAR || '.'
            || (doc_id * 13 % 256)::VARCHAR || '.'
            || ((doc_id % 200) + 1)::VARCHAR AS aug
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '$PiiEmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '$PiiIpRe')) AS BIGINT) AS n_ips,
        md5(regexp_replace(regexp_replace(aug, '$PiiEmailRe', '[EMAIL]', 'g'),
          '$PiiIpRe', '[IP]', 'g')) AS red_hash
      FROM a ORDER BY doc_id""")),

    CatalogQuery("qt14_bigram_logprob", (s, d) => {
      // Bigram-LM scoring with add-1 smoothing — the step up from qt09's
      // unigram perplexity filter: score(doc) = Σ log P(w2|w1) with
      // P(w2|w1) = (C(w1,w2)+1) / (C(w1·)+V), where C(w1·) is w1's
      // context count (Σ_w2 C(w1,w2), so the smoothed conditionals sum
      // to 1) and V the corpus vocabulary. Word-salad docs score low
      // even when their unigram mix looks normal — exactly what the
      // bigram upgrade buys.
      //
      // Scale shape (qt09's discipline, one level up): the token stream
      // collapses ONCE into the per-(doc, bigram) tf table; the model
      // (bigram counts, context counts, V) derives from that table, and
      // scoring joins tf — never the raw stream — keyed by the bigram.
      // The adjacency window partitions by doc_id (bounded by doc
      // length; never an unpartitioned global sort). Log-probs are
      // 6-decimal-quantized decimals so per-doc sums are exact decimal
      // arithmetic on both engines.
      val toks = table(s, d, "documents")
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .toDF("doc_id", "pos", "w")
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val tf = toks
        .withColumn("w2", lead(col("w"), 1).over(byDoc))
        .filter(col("w2").isNotNull)
        .groupBy(col("doc_id"), col("w"), col("w2"))
        .agg(count(lit(1)).as("tf"))
        .persist() // model counts + the scoring join both derive from it
      val c12 = tf.groupBy(col("w"), col("w2")).agg(sum(col("tf")).as("c12"))
      val c1 = c12.groupBy(col("w")).agg(sum(col("c12")).as("c1"))
      val vocab = toks.agg(countDistinct(col("w")).as("v"))
      val lp = c12.join(c1, Seq("w")).crossJoin(broadcast(vocab))
        .select(col("w"), col("w2"),
          round(log((col("c12") + 1).cast("double") / (col("c1") + col("v"))), 6)
            .cast("decimal(20,6)").as("lp"))
      tf.join(lp, Seq("w", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          sum(col("tf") * col("lp")).cast("double").as("sum_logprob"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
                    FROM documents),
      big AS (SELECT doc_id, arr[i] AS w, arr[i + 1] AS w2
              FROM docs, (SELECT unnest(range(1, len(arr))) AS i) ix),
      tf AS (SELECT doc_id, w, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
      c12 AS (SELECT w, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2),
      c1 AS (SELECT w, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
      vocab AS (SELECT count(DISTINCT u) AS v
                FROM (SELECT unnest(arr) AS u FROM docs)),
      lp AS (SELECT c12.w, c12.w2,
               CAST(round(ln((c12 + 1)::DOUBLE / (c1 + v)), 6) AS DECIMAL(20,6)) AS lp
             FROM c12 JOIN c1 USING (w), vocab)
      SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
        CAST(sum(tf.tf * lp.lp) AS DOUBLE) AS sum_logprob
      FROM tf JOIN lp USING (w, w2)
      GROUP BY tf.doc_id ORDER BY tf.doc_id""")),

    CatalogQuery("qt15_ccnet_buckets", (s, d) => {
      // CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
      // corpus into head/middle/tail terciles of length-normalized LM
      // log-prob — the canonical "keep the head, sample the middle, drop
      // the tail" curation gate. Thresholds come from percentile_approx
      // (the mergeable bounded-memory sketch; an exact tercile holds the
      // whole score multiset in one buffer — q19's pinned-out 100 TB
      // failure), and like q19b the contract is proven WITHOUT the exact
      // quantile: a second distributive pass counts scores below /
      // at-or-below each sketched threshold and asserts the target rank
      // sits inside that window (±0.5% ≫ the 0.01% sketch guarantee),
      // plus head+middle+tail must partition the corpus exactly.
      val Eps = 0.005
      val toks = table(s, d, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .persist() // LM + scoring both derive from tf (qt09's discipline)
      val cnt = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
      val tot = cnt.agg(sum(col("c")).as("n_total"))
      val lp = cnt.crossJoin(broadcast(tot))
        .select(col("token"),
          round(log(col("c").cast("double") / col("n_total")), 6)
            .cast(org.apache.spark.sql.types.DecimalType(20, 6)).as("lp"))
      val scores = tf.join(lp, Seq("token"))
        .groupBy(col("doc_id"))
        .agg((sum(col("tf") * col("lp")).cast("double") / sum(col("tf"))).as("avg_lp"))
      val sketch = scores.agg(
        percentile_approx(col("avg_lp"), lit(1.0 / 3), lit(10000)).as("t33"),
        percentile_approx(col("avg_lp"), lit(2.0 / 3), lit(10000)).as("t67"),
        count(lit(1)).as("n"))
      scores.crossJoin(broadcast(sketch))
        .agg(first(col("n")).as("n_docs"),
          sum(when(col("avg_lp") > col("t67"), 1L).otherwise(0L)).as("head_n"),
          sum(when(col("avg_lp") > col("t33") && col("avg_lp") <= col("t67"), 1L)
            .otherwise(0L)).as("mid_n"),
          sum(when(col("avg_lp") <= col("t33"), 1L).otherwise(0L)).as("tail_n"),
          sum(when(col("avg_lp") < col("t33"), 1L).otherwise(0L)).as("lt33"),
          sum(when(col("avg_lp") <= col("t33"), 1L).otherwise(0L)).as("le33"),
          sum(when(col("avg_lp") < col("t67"), 1L).otherwise(0L)).as("lt67"),
          sum(when(col("avg_lp") <= col("t67"), 1L).otherwise(0L)).as("le67"))
        .select(col("n_docs"),
          (col("head_n") + col("mid_n") + col("tail_n") === col("n_docs"))
            .as("buckets_partition"),
          (col("lt33") <= (lit(1.0 / 3) + Eps) * col("n_docs") &&
            col("le33") >= (lit(1.0 / 3) - Eps) * col("n_docs"))
            .as("t33_rank_within_eps"),
          (col("lt67") <= (lit(2.0 / 3) + Eps) * col("n_docs") &&
            col("le67") >= (lit(2.0 / 3) - Eps) * col("n_docs"))
            .as("t67_rank_within_eps"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS buckets_partition,
        TRUE AS t33_rank_within_eps, TRUE AS t67_rank_within_eps
      FROM documents""")),

    // ---------- corpus curation / training prep ----------

    CatalogQuery("qt16_zipf_slope", (s, d) => {
      // Corpus-health audit: the Zipf exponent — the least-squares slope
      // of ln(freq) vs ln(rank) over the top-1000 tokens. Natural text
      // sits near −1; synthetic/templated/degenerate corpora drift far
      // from it, which makes the slope the one-number sanity check run
      // before any token-level curation decisions.
      //
      // Scale shape: one explode→hash-agg produces the token counts;
      // top-1000 is TakeOrderedAndProject (bounded); ranks come from a
      // bounded ≤1000-row driver gather (no window — the corpus never
      // enters one). The regression reduces to five sums of
      // 12-decimal-quantized decimals (qe05's discipline: multiply in
      // double, cast once), so Σ's are exact and the final slope /
      // intercept are single identical double expressions on both
      // engines.
      val TopN = 1000
      val toks = table(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val top = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token")).limit(TopN)
      val dec12 = org.apache.spark.sql.types.DecimalType(25, 12)
      // rank via a bounded ≤TopN-row driver gather (TakeOrderedAndProject
      // returns the sorted rows, so zipWithIndex IS the rank) — the qp15/
      // qd05 "bounded collect, re-parallelize" discipline, replacing the
      // last unpartitioned row_number window in the catalog; log/round
      // arithmetic stays in Spark so both engines' expressions are
      // unchanged
      import s.implicits._
      val ranked = top.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
        .zipWithIndex.map { case ((_, c), i) => (c, i + 1L) }
        .toDF("c", "rank")
        .select(round(log(col("rank")), 12).cast(dec12).as("x"),
          round(log(col("c")), 12).cast(dec12).as("y"))
      val sums = ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(round(col("x").cast("double") * col("y").cast("double"), 12).cast(dec12))
          .cast("double").as("sxy"),
        sum(round(col("x").cast("double") * col("x").cast("double"), 12).cast(dec12))
          .cast("double").as("sxx"))
      sums.select(col("n").as("n_points"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 6)
          .as("intercept"))
    }, Some("""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                    FROM documents),
      cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token
              ORDER BY c DESC, token LIMIT 1000),
      ranked AS (SELECT
          CAST(round(ln(row_number() OVER (ORDER BY c DESC, token)), 12)
            AS DECIMAL(25,12)) AS x,
          CAST(round(ln(c), 12) AS DECIMAL(25,12)) AS y
        FROM cnt),
      sums AS (SELECT count(*)::BIGINT AS n,
          CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
          CAST(sum(CAST(round(x::DOUBLE * y::DOUBLE, 12) AS DECIMAL(25,12))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(round(x::DOUBLE * x::DOUBLE, 12) AS DECIMAL(25,12))) AS DOUBLE) AS sxx
        FROM ranked)
      SELECT n AS n_points,
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
      FROM sums""")),

    CatalogQuery("qp01_split_sample", (s, d) => {
      // Reproducible train/val/test splitting: the split is a pure
      // function of the stable document identity (60-bit md5-prefix hash
      // of doc_id, mod 100) — identical across runs, engines,
      // partitionings, and corpus appends, with no sampling state or RNG
      // seed to ship. That determinism is the property a 100 TB split
      // must have: any pipeline stage re-derives membership locally, so
      // the "split" is never materialized or joined. 90/5/5; pure
      // per-row codegen'd expressions, pipelines inside the scan.
      table(s, d, "documents")
        .select(col("doc_id"), splitBucket.as("bucket"),
          splitLabel(splitBucket).as("split"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH b AS (SELECT doc_id,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        FROM documents)
      SELECT doc_id, bucket,
        CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM b ORDER BY doc_id""")),

    CatalogQuery("qp05_split_leakage", (s, d) => {
      // Decontamination audit: verified near-duplicate pairs (qd02's LSH
      // output) that CROSS the qp01 split boundary — a test/val doc with
      // a train near-duplicate leaks evaluation signal into training.
      // Composes two gated operators through their public catalog entries,
      // so the audit can never drift from the dedup or split definitions
      // it audits. Scale shape: the pair set is the (small) dedup output;
      // split labels are re-derived per row (stateless hash — no
      // membership table to join at corpus scale), so the only joins here
      // touch pairs × 2.
      val pairs = QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
        .select(col("id_a"), col("id_b"))
      val split = table(s, d, "documents")
        .select(col("doc_id"), splitLabel(splitBucket).as("split"))
      pairs
        .join(split.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
        .join(split.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH $oMinhashPairsCtes,
      $oSplitCte
      SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
      FROM pairs p
      JOIN sp sa ON p.id_a = sa.doc_id
      JOIN sp sb ON p.id_b = sb.doc_id
      WHERE sa.split <> sb.split ORDER BY p.id_a, p.id_b""")),

    CatalogQuery("qp02_source_quota", (s, d) => {
      // Per-domain quota capping: keep the top-5 docs per source by token
      // count (doc_id tie-break) — the "no domain dominates the corpus"
      // curation step. Reuses the bounded TopKByScore aggregator
      // generically as (score, id): a hot domain at 100 TB would make a
      // per-source row_number window sort all of that domain's docs in
      // one task, where the aggregator's map-side partials keep every
      // buffer at ≤5 rows and the shuffle at partitions × 5 per source.
      val topk = graft.functions.TopKAggregator.topK(5)
      table(s, d, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("double").as("score"),
          col("doc_id"))
        .groupBy(col("source"))
        .agg(topk(col("score"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).as("rank"),
          col("col.vec_id").as("doc_id"),
          col("col.cosine").cast("long").as("n_tokens"))
        .orderBy(col("source"), col("rank"))
    }, Some("""
      SELECT source, rank, doc_id, n_tokens FROM (
        SELECT source, doc_id, n_tokens,
          row_number() OVER (PARTITION BY source
            ORDER BY n_tokens DESC, doc_id) AS rank
        FROM (SELECT source, doc_id,
          length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
          FROM documents) t) r
      WHERE rank <= 5 ORDER BY source, rank""")),

    CatalogQuery("qp03_doc_frequency", (s, d) => {
      // Corpus vocabulary statistics (stopword mining / tokenizer vocab
      // seeding): document frequency per token, top-20. Each doc emits
      // its DISTINCT token set (array_distinct before the explode), so
      // the aggregation input is bounded by per-doc vocabulary, not the
      // token stream; df counting is a plain hash-groupBy with map-side
      // partials and the top-20 compiles to TakeOrderedAndProject (no
      // global sort of the vocabulary).
      table(s, d, "documents")
        .select(explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), col("token"))
        .limit(20)
    }, Some("""
      SELECT token, count(*) AS df FROM (
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
        FROM documents) t
      GROUP BY token ORDER BY df DESC, token LIMIT 20""")),

    CatalogQuery("qp04_sequence_pack", (s, d) => {
      // Context-window packing (concat-and-split, the standard streaming
      // pack for pretraining shards): per source shard, docs concatenate
      // in doc_id order and split into 256-token windows; each doc
      // records the pack it starts in and its offset there. Pure integer
      // math over a per-shard exclusive running sum — one window pass
      // PARTITIONED BY the shard key, so no global sort and each task
      // sorts one shard (the packing order is inherently sequential per
      // shard; shards are the unit of parallelism, exactly like
      // production webdataset/arrow shard writers).
      val C = 256
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, d, "documents")
        .select(col("source"), col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("prev_tokens", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          floor(col("prev_tokens") / C).cast("long").as("pack_id"),
          pmod(col("prev_tokens"), lit(C.toLong)).as("pack_offset"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT source, doc_id,
        CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      p AS (SELECT source, doc_id, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_tokens
        FROM t)
      SELECT source, doc_id, n_tokens,
        prev_tokens // 256 AS pack_id, prev_tokens % 256 AS pack_offset
      FROM p ORDER BY doc_id""")),

    CatalogQuery("qp06_lang_rebalance", (s, d) => {
      // Temperature-based language rebalancing (the mT5/XLM-R corpus-
      // mixing step, α = 0.5): sampling weight w_s ∝ n_s^α damps the
      // dominant language and keeps rare ones (here en ≈ 44% of docs is
      // downsampled to its temperature share; the rest cap at keep-all —
      // downsampling only, no row duplication). Weights are INTEGER-quantized
      // (floor of the IEEE-correctly-rounded sqrt), so every derived
      // quantity — total weight, per-source target, ppm keep threshold —
      // is exact integer/dyadic arithmetic identical here and in the
      // oracle: no decimal-summation order or libm last-ulp drift can
      // flip a row. Selection is the stateless hash-Bernoulli (shared
      // 60-bit md5-prefix convention, mod 1e6 vs the per-language ppm
      // threshold): at 100 TB this is ONE corpus scan filtered against a
      // broadcast #languages-row threshold map — the corpus itself never
      // shuffles, there is no sampling state or RNG seed to ship, and
      // membership is append/partition/engine invariant (same property
      // as qp01's splits).
      val docs = table(s, d, "documents").select(col("doc_id"), col("lang"))
      val counts = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_s"),
          floor(sqrt(count(lit(1)))).cast("long").as("w_s"))
      val tot = counts.agg(sum(col("n_s")).cast("long").as("n_total"),
        sum(col("w_s")).cast("long").as("w_total"))
      val thr = counts.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(1000000L),
            round(lit(1e6) *
              round(col("n_total") * col("w_s") / col("w_total")) / col("n_s"))
              .cast("long")).as("thr_ppm"))
      docs.join(broadcast(thr), Seq("lang"))
        .filter(pmod(TextOps.hash60(col("doc_id").cast("string")), lit(1000000L))
          < col("thr_ppm"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH n AS (SELECT lang, count(*) AS n_s,
                   CAST(floor(sqrt(count(*))) AS BIGINT) AS w_s
                 FROM documents GROUP BY lang),
      tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
                     CAST(sum(w_s) AS BIGINT) AS w_total FROM n),
      thr AS (SELECT lang,
                least(1000000, CAST(round(1e6 *
                  round((n_total * w_s) / w_total) / n_s) AS BIGINT)) AS thr_ppm
              FROM n, tot)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN thr USING (lang)
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 < thr_ppm
      ORDER BY d.doc_id""")),

    CatalogQuery("qp07_source_kl", (s, d) => {
      // Domain-shift audit for source mixing: KL(p_source ‖ p_corpus)
      // over unigram distributions, per source — the quantity behind
      // domain-weight tuning (how far each source's token mix sits from
      // the blend it feeds). Complements qp06's rebalance: qp06 moves
      // the weights, this measures the divergence the weights act on.
      //
      // Scale shape: everything derives from the (source, token) count
      // table — corpus tokens are aggregated once; per-source totals are
      // a tiny broadcast; the only real shuffle joins source-term counts
      // with corpus-term counts keyed by token. Determinism: the ln
      // factor is 6-decimal-quantized, each KL summand is then 12-decimal
      // quantized, and the per-source sum is exact decimal arithmetic
      // (qt07/qt09 convention) — never an order-dependent float sum.
      val toks = table(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      val st = toks.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c_st"))
        .persist() // ct, ns and the term join all derive from st
      val ct = st.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
      val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
      val n = ct.agg(sum(col("c_t")).as("n"))
      val term = st.join(ct, Seq("token"))
        .join(broadcast(ns), Seq("source")).crossJoin(broadcast(n))
        .select(col("source"),
          round((col("c_st").cast("double") / col("n_s")) *
            round(log((col("c_st").cast("double") / col("n_s")) /
              (col("c_t").cast("double") / col("n"))), 6), 12)
            .cast("decimal(38,12)").as("term"))
      term.groupBy(col("source"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("term")).cast("double").as("kl"))
        .orderBy(col("source"))
    }, Some("""
      WITH toks AS (SELECT source,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      st AS (SELECT source, token, count(*) AS c_st
             FROM toks GROUP BY source, token),
      ct AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY token),
      ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
      n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ct),
      term AS (SELECT st.source,
          CAST(round((st.c_st::DOUBLE / ns.n_s) *
            round(ln((st.c_st::DOUBLE / ns.n_s) / (ct.c_t::DOUBLE / n.n)), 6), 12)
            AS DECIMAL(38,12)) AS term
        FROM st JOIN ct USING (token) JOIN ns USING (source), n)
      SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        CAST(sum(term) AS DOUBLE) AS kl
      FROM term GROUP BY source ORDER BY source""")),

    CatalogQuery("qp08_bpe_merges", (s, d) => {
      // Tokenizer training: distributed BPE vocabulary induction
      // (Sennrich et al. 2016) over the corpus's distinct-word frequency
      // table, gated by the contract pattern (qs03/qe01/qt08): DuckDB
      // cannot replay an iterative trainer, so the oracle pins the
      // corpus-derived constants + TRUE and the Spark side PROVES the
      // training invariant distributively — at every step the chosen
      // merge is the exact argmax of adjacent-pair counts under the
      // prefix merges, in the deterministic total order (count DESC,
      // left ASC, right ASC). The recount deliberately uses a different
      // formulation than the trainer (declarative slice-zip adjacency
      // over the segment arrays — pure codegen'd SQL expressions — vs
      // the trainer's typed flatMap over iterator windows), so a
      // counting bug in one path cannot vouch for itself.
      //
      // Scale shape: the corpus explodes ONCE into the (word, freq)
      // table (persisted); training and verification iterate over that
      // table with ONE job per step (the recount job materializes the
      // step's cache; the previous level releases after it returns —
      // Bpe.train's discipline); argmaxes are TakeOrdered(1), never a
      // global sort collect; adjacency needs no join at all.
      import s.implicits._
      val words = graft.core.Parallelism.widen(table(s, d, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .as[(String, Long)]
        .persist()
      val merges = Bpe.train(words, BpeMerges)
      // per-step lineage truncation (Bpe.train's lazy-localCheckpoint
      // discipline; the step's argmax job materializes the blocks): a
      // chained persist left every step's plan embedding the whole
      // map-history, and the verify loop's driver-side re-analysis cost
      // grew with the step index — measured as the dominant qp08 cost.
      // RDD-level checkpoint blocks are invisible to clearCache(), so the
      // scope releases them even when a step throws.
      val scope = new graft.core.WalkScope
      try {
        var segDf = scope.checkpointLazy(
          words.map { case (w, f) => (w, Bpe.charSeg(w), f) }
            .toDF("word", "seg", "freq"))
        var prevSeg: DataFrame = null
        var allArgmax = true
        for ((m, idx) <- merges.zipWithIndex) {
          val top = segDf.select(col("freq"),
              explode(arrays_zip(
                slice(col("seg"), lit(1), size(col("seg")) - 1),
                slice(col("seg"), lit(2), size(col("seg")) - 1))).as("p"))
            .groupBy(col("p").getField("0").as("l"), col("p").getField("1").as("r"))
            .agg(sum(col("freq")).as("c"))
            .orderBy(desc("c"), col("l"), col("r"))
            .head(1)
          // the argmax job just materialized segDf's blocks — the level
          // below is now safe to free (rolling release, the train shape)
          if (prevSeg != null) { scope.releaseEarly(prevSeg); prevSeg = null }
          allArgmax &&= top.headOption.exists(row =>
            row.getString(0) == m.left && row.getString(1) == m.right &&
              row.getLong(2) == m.count)
          if (idx < merges.length - 1) {
            val next = scope.checkpointLazy(segDf.as[(String, Seq[String], Long)]
              .map { case (w, seg, f) =>
                (w, Bpe.applyMerge(seg.toIndexedSeq, m.left, m.right), f)
              }
              .toDF("word", "seg", "freq"))
            prevSeg = segDf
            segDf = next
          }
        }
        val nWords = words.count()
        words.unpersist()
        Seq((BpeMerges, nWords, allArgmax))
          .toDF("n_merges", "n_words", "argmax_verified")
      } finally scope.release()
    }, Some(s"""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                    FROM documents)
      SELECT $BpeMerges AS n_merges,
        CAST(count(DISTINCT word) AS BIGINT) AS n_words,
        TRUE AS argmax_verified
      FROM toks"""), headline = true),

    CatalogQuery("qp09_quality_classifier", (s, d) => {
      // Trained quality classifier, the fasttext shape every curation
      // pipeline runs: bootstrap labels from a heuristic (token ratio of
      // the corpus's stopwords, qt02's signal), then distill them into a
      // hashed-bag-of-words linear model that scores text directly.
      // Training is distributed full-batch logistic regression (weights
      // broadcast, gradient partials per partition, the corpus never
      // moves — pipeline/LogReg), after a one-pass feature
      // standardization so few well-conditioned steps converge (every
      // iteration is a cluster round trip; 30 conditioned steps beat 300
      // raw ones). Gate = contract (qs03 pattern): the oracle pins
      // corpus-derived counts + TRUE; Spark proves distributively that
      // the trained model beats the best CONSTANT predictor (majority
      // class of the eval set) by ≥ 15 accuracy points — measured on a
      // deterministic hash-bucket HOLDOUT (qp01's stateless md5 bucket,
      // buckets ≥ 80 = 20% the trainer never sees), so the margin
      // certifies generalization, not memorization of the hashed
      // features. Standardization moments come from the train split only
      // (the holdout must not leak into preprocessing either). The label
      // threshold sits at the density peak of a smooth ratio, so holdout
      // accuracy plateaus ~0.83 while the majority baseline is
      // ~0.51-0.58 — the margin contract keeps ~2x headroom and is
      // layout-drift immune.
      import s.implicits._
      val D = ClfDim
      val toks = TextOps.tokens(col("text"))
      val nStop = size(filter(toks, t => t === "the" || t === "a"))
      val ratio = round(nStop.cast("double") / size(toks), 6)
      val raw = table(s, d, "documents")
        .select(col("text"),
          when(ratio >= ClfLabelThreshold, 1.0).otherwise(0.0).as("y"),
          (splitBucket < ClfTrainBuckets).as("is_train"))
        .as[(String, Double, Boolean)]
        .map { case (t, y, tr) => (LogReg.featurize(t, D).toSeq, y, tr) }
        .persist()
      val trainRaw = raw.filter(_._3).map { case (x, y, _) => (x, y) }
      val (mu, sd) = LogReg.standardize(trainRaw, D)
      val bcStat = s.sparkContext.broadcast((mu, sd))
      def standardized(part: org.apache.spark.sql.Dataset[(Seq[Double], Double, Boolean)]) =
        part.map { case (x, y, _) =>
          val (m, sdv) = bcStat.value
          (x.indices.map(i => (x(i) - m(i)) / sdv(i)): Seq[Double], y)
        }
      val train = standardized(raw.filter(_._3)).persist()
      val nTrain = train.count()
      val (wgt, bias) = LogReg.fit(train, D, ClfIters, ClfLr)
      val bcW = s.sparkContext.broadcast((wgt, bias))
      def score(ds: org.apache.spark.sql.Dataset[(Seq[Double], Double)]): (Long, Long, Long) =
        ds.mapPartitions { it =>
          val (cw, cb) = bcW.value
          var ok = 0L
          var np = 0L
          var n = 0L
          it.foreach { case (x, y) =>
            var z = cb
            var i = 0
            while (i < cw.length) { z += cw(i) * x(i); i += 1 }
            if ((if (z > 0) 1.0 else 0.0) == y) ok += 1
            if (y == 1.0) np += 1
            n += 1
          }
          Iterator.single((ok, np, n))
        }.collect().foldLeft((0L, 0L, 0L)) {
          case ((a, b, c), (x, y, z)) => (a + x, b + y, c + z)
        }
      val (correct, pos, total) = score(standardized(raw.filter(r => !r._3)))
      raw.unpersist()
      train.unpersist()
      bcW.unpersist()
      bcStat.unpersist()
      val acc = correct.toDouble / total
      val majority = math.max(pos, total - pos).toDouble / total
      System.err.println(f"[qp09] holdout acc=$acc%.4f majority=$majority%.4f " +
        f"margin=${acc - majority}%.4f (gate 0.15) n_train=$nTrain n_holdout=$total")
      Seq((nTrain, total, pos, acc >= majority + 0.15))
        .toDF("n_train", "n_holdout", "n_pos_holdout", "beats_majority_by_15pts")
    }, Some(s"""
      WITH f AS (SELECT
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
          CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
            t -> t IN ('the', 'a'))) AS DOUBLE)
          / len(regexp_split_to_array(trim(text), '\\s+')) AS r
        FROM documents)
      SELECT CAST(sum(CASE WHEN bucket < $ClfTrainBuckets THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN bucket >= $ClfTrainBuckets THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
        CAST(sum(CASE WHEN bucket >= $ClfTrainBuckets AND round(r, 6) >= $ClfLabelThreshold
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_holdout,
        TRUE AS beats_majority_by_15pts
      FROM f""")),

    CatalogQuery("qp10_bpe_encode", (s, d) => {
      // Tokenizer APPLY — the other half of qp08's training story: encode
      // the corpus with the trained merge table, the per-shard step every
      // training pipeline runs after tokenizer induction. The merge table
      // (10 pairs) broadcasts in the task closure; encoding is one narrow
      // map over the distinct-word frequency table (the corpus's words
      // re-derive their token count by lookup, so the full text is never
      // re-segmented — same word-table economics as training).
      //
      // Gate = contract (qp08 pattern; DuckDB cannot replay the trained
      // merges, so the oracle pins corpus constants + TRUE while Spark
      // proves the defining identities of a correct encoder
      // DISTRIBUTIVELY, over EVERY distinct word):
      //  - round_trip_ok: concat(encode(w)) == w (lossless);
      //  - canonical_ok: no adjacent token pair in the output is itself a
      //    learned merge (the encoder reached its fixpoint — the property
      //    greedy-but-stale encoders violate);
      //  - vocab_ok: every emitted token is a base character or a learned
      //    merge product (nothing outside the trained vocabulary).
      import s.implicits._
      val words = graft.core.Parallelism.widen(table(s, d, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .as[(String, Long)]
        .persist()
      val merges = Bpe.train(words, BpeMerges)
      val ranks = merges.map(m => (m.left, m.right) -> m.step).toMap
      val vocabProducts = merges.map(m => m.left + m.right).toSet
      val bc = s.sparkContext.broadcast((ranks, vocabProducts))
      val checked = words.map { case (w, f) =>
        val (rk, vp) = bc.value
        val enc = Bpe.encode(w, rk)
        val roundTrip = enc.mkString == w
        val canonical = enc.indices.dropRight(1)
          .forall(i => !rk.contains((enc(i), enc(i + 1))))
        val inVocab = enc.forall(t => t.length == 1 || vp.contains(t))
        (f, roundTrip, canonical, inVocab)
      }.persist()
      checked.count()
      words.unpersist()
      val agg = checked.toDF("freq", "rt", "cn", "vc")
        .agg(count(lit(1)).as("n_words"),
          min(when(col("rt"), 1).otherwise(0)).as("rt"),
          min(when(col("cn"), 1).otherwise(0)).as("cn"),
          min(when(col("vc"), 1).otherwise(0)).as("vc"))
        .head()
      checked.unpersist()
      bc.unpersist()
      Seq((BpeMerges, agg.getLong(0),
        agg.getInt(1) == 1, agg.getInt(2) == 1, agg.getInt(3) == 1))
        .toDF("n_merges", "n_words", "round_trip_ok", "canonical_ok", "vocab_ok")
    }, Some(s"""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                    FROM documents)
      SELECT $BpeMerges AS n_merges,
        CAST(count(DISTINCT word) AS BIGINT) AS n_words,
        TRUE AS round_trip_ok, TRUE AS canonical_ok, TRUE AS vocab_ok
      FROM toks""")),

    CatalogQuery("qp11_pack_sequences", (s, d) => {
      // Sequence PACKING — the last step before tensors: concatenate every
      // document's token stream in doc_id order and chunk the stream into
      // fixed-length training sequences (GPT-style concat-and-chunk; L =
      // 64 here). Each doc's placement needs its GLOBAL token offset — a
      // prefix sum over the corpus order. The naive formulation is
      // `sum(n) OVER (ORDER BY doc_id)`: an unpartitioned window, i.e. one
      // task sorting and scanning every row — the canonical 100 TB
      // scale-killer. Instead, the classic two-phase distributed scan:
      //   1. rows land in B deterministic doc_id range buckets (width from
      //      one bounded min/max agg — two longs to the driver);
      //   2. per-bucket token totals (B-row hash agg) cumulate into
      //      per-bucket BASE offsets, rejoined via a broadcast of B rows;
      //   3. the within-bucket running sum is a window PARTITIONED BY
      //      bucket — B parallel bounded tasks, never a global sort.
      // global_offset = base(bucket) + within_offset; seq_first/seq_last
      // are integer divisions. B scales with the cluster (here 32); the
      // plan pin asserts the window stays bucket-partitioned.
      val L = PackSeqLen
      val counts = table(s, d, "documents")
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val mm = counts.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = math.max(1L, (hi - lo) / PackBuckets + 1) // ceil-ish; buckets ∈ [0, B)
      // integer div, NOT `/` (Spark's / on longs is double division)
      val bucketed = counts.withColumn("bucket", expr(s"(doc_id - ${lo}L) div ${width}L"))
      import s.implicits._
      val bases = bucketed.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("bt"))
        .orderBy(col("bucket")).collect().toSeq // ≤ B rows
        .scanLeft((-1L, 0L)) { case ((_, acc), r) => (r.getLong(0), acc + r.getLong(1)) }
        .sliding(2).map { case Seq((_, prev), (b, _)) => (b, prev) }.toSeq
      val baseDf = bases.toDF("bucket", "base")
      val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed
        .join(broadcast(baseDf), Seq("bucket"))
        .withColumn("start_off", col("base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("n_tokens"), col("start_off"),
          expr(s"start_off div $L").as("seq_first"),
          expr(s"(start_off + n_tokens - 1) div $L").as("seq_last"),
          expr(s"(start_off + n_tokens - 1) div $L - start_off div $L + 1").as("n_seqs"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (SELECT doc_id, n_tokens,
          COALESCE(CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_off
        FROM t)
      SELECT doc_id, n_tokens, start_off,
        start_off // $PackSeqLen AS seq_first,
        (start_off + n_tokens - 1) // $PackSeqLen AS seq_last,
        (start_off + n_tokens - 1) // $PackSeqLen - start_off // $PackSeqLen + 1 AS n_seqs
      FROM o ORDER BY doc_id""")),

    CatalogQuery("qp14_curriculum_order", (s, d) => {
      // Curriculum ordering — assign every document its GLOBAL training
      // position by a quality key (cleanest/most-diverse first, the
      // curriculum-learning schedule): rank = row_number over
      // (score DESC, doc_id). The naive plan is one unpartitioned window
      // (single-task global sort — qp11's pinned-out scale killer); this
      // is the two-phase form on a NON-uniform key: score-range buckets
      // (fixed width over the score's closed [0, 1e6] domain), per-bucket
      // counts cumulate into base ranks (bounded B-row collect, broadcast
      // back), in-bucket row_number partitions by bucket. Skewed score
      // distributions make buckets uneven, but each bucket is still a
      // bounded independent task (AQE splits stragglers; B scales with
      // the cluster). The score is INTEGER arithmetic end to end
      // (1e6·distinct/total, floor division) — no float parity surface.
      val B = PackBuckets
      val scored = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
        .select(col("doc_id"),
          expr("(1000000L * size(array_distinct(w))) div size(w)").as("score"))
      // ascending sort key = curriculum position; domain [0, 1e6] closed
      val width = 1000001L / B + 1
      val bucketed = scored
        .withColumn("k", lit(1000000L) - col("score"))
        .withColumn("bucket", expr(s"k div ${width}L"))
      import s.implicits._
      val bases = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .orderBy(col("bucket")).collect().toSeq // ≤ B rows
        .scanLeft((-1L, 0L)) { case ((_, acc), r) => (r.getLong(0), acc + r.getLong(1)) }
        .sliding(2).map { case Seq((_, prev), (b, _)) => (b, prev) }.toSeq
      val baseDf = bases.toDF("bucket", "base")
      val w = Window.partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
      bucketed.join(broadcast(baseDf), Seq("bucket"))
        .withColumn("rank", col("base") + row_number().over(w))
        .select(col("doc_id"), col("score"), col("rank"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM documents),
      sc AS (SELECT doc_id,
               (1000000 * len(list_distinct(w))) // len(w) AS score FROM t)
      SELECT doc_id, CAST(score AS BIGINT) AS score,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      FROM sc ORDER BY doc_id""")),

    CatalogQuery("qp15_epoch_shuffle", (s, d) => {
      // Deterministic epoch shuffling — every trainer epoch needs a
      // DIFFERENT but REPRODUCIBLE permutation of the corpus (resume
      // from step k must see the same order on any cluster). Stateless
      // construction: shuffle key = hash60(epoch ':' doc_id), position =
      // global rank of the key. Ranking is the qp11/qp14 two-phase form —
      // here the key is uniform over [0, 2^60) BY CONSTRUCTION, so the
      // fixed-width key-range buckets are balanced without any
      // distribution knowledge: per-(epoch, bucket) counts → base
      // positions (bounded 2B-row collect, broadcast back), in-bucket
      // row_number partitioned by (epoch, bucket). Never a global sort;
      // integer/hash arithmetic end to end.
      val B = PackBuckets
      val width = (1L << 60) / B
      val keyed = table(s, d, "documents").select(col("doc_id"))
        .withColumn("epoch", explode(array(lit(0L), lit(1L))))
        .withColumn("k", TextOps.hash60(
          concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
        .withColumn("bucket", expr(s"k div ${width}L"))
      import s.implicits._
      val bases = keyed.groupBy(col("epoch"), col("bucket")).agg(count(lit(1)).as("c"))
        .orderBy(col("epoch"), col("bucket")).collect().toSeq // ≤ 2B rows
        .groupBy(_.getLong(0)).toSeq.flatMap { case (ep, rows) =>
          rows.sortBy(_.getLong(1))
            .scanLeft((-1L, 0L)) { case ((_, acc), r) => (r.getLong(1), acc + r.getLong(2)) }
            .sliding(2).map { case Seq((_, prev), (b, _)) => (ep, b, prev) }
        }
      val baseDf = bases.toDF("epoch", "bucket", "base")
      val w = Window.partitionBy(col("epoch"), col("bucket"))
        .orderBy(col("k"), col("doc_id"))
      keyed.join(broadcast(baseDf), Seq("epoch", "bucket"))
        .withColumn("position", col("base") + row_number().over(w))
        .select(col("epoch"), col("doc_id"), col("position"))
        .orderBy(col("epoch"), col("doc_id"))
    }, Some("""
      WITH k AS (SELECT e.epoch, d.doc_id,
               CAST(('0x' || substr(md5(e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR),
                 1, 15)) AS BIGINT) AS k
             FROM documents d, (SELECT unnest([0, 1]) AS epoch) e)
      SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS BIGINT)
          AS position
      FROM k ORDER BY epoch, doc_id""")),

    CatalogQuery("qp16_pack_boundaries", (s, d) => {
      // Packing diagnostics — the attention-boundary audit run after
      // qp11: for every fixed-length training sequence, how many
      // documents it spans (cross-document attention leaks unless the
      // trainer masks at boundaries), how many tokens it actually holds
      // (the final sequence is usually partial), and whether it starts
      // mid-document. Derived ENTIRELY from qp11's global offsets: each
      // doc explodes to its (seq_first..seq_last) range — bounded by the
      // doc's own sequence span, never the corpus — and a hash
      // aggregation per sequence id does the rest. Pure integer
      // arithmetic; the oracle recomputes qp11's offsets with the plain
      // window form and mirrors the interval math.
      val L = PackSeqLen
      val offs = QueryCatalog.byName("qp11_pack_sequences").build(s, d)
        .select(col("doc_id"), col("n_tokens"), col("start_off"),
          col("seq_first"), col("seq_last"))
      offs
        .select(col("doc_id"), col("start_off"),
          (col("start_off") + col("n_tokens")).as("end_off"),
          explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("end_off"), (col("seq_id") + 1) * L) -
            greatest(col("start_off"), col("seq_id") * L)).as("n_tokens_filled"),
          max(when(col("start_off") < col("seq_id") * L, 1L).otherwise(0L))
            .as("starts_mid_doc"))
        .select(col("seq_id"), col("n_docs"), col("n_tokens_filled"),
          (col("n_docs") - 1).as("n_boundaries"), col("starts_mid_doc"))
        .orderBy(col("seq_id"))
    }, Some(s"""
      WITH t AS (SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (SELECT doc_id, n_tokens,
          COALESCE(CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_off
        FROM t),
      spans AS (SELECT doc_id, start_off, start_off + n_tokens AS end_off,
          unnest(generate_series(start_off // $PackSeqLen,
            (start_off + n_tokens - 1) // $PackSeqLen)) AS seq_id
        FROM o)
      SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(least(end_off, (seq_id + 1) * $PackSeqLen)
          - greatest(start_off, seq_id * $PackSeqLen)) AS BIGINT) AS n_tokens_filled,
        CAST(count(*) - 1 AS BIGINT) AS n_boundaries,
        CAST(max(CASE WHEN start_off < seq_id * $PackSeqLen THEN 1 ELSE 0 END) AS BIGINT)
          AS starts_mid_doc
      FROM spans GROUP BY seq_id ORDER BY seq_id""")),

    CatalogQuery("qp12_dsir", (s, d) => {
      // Data selection via importance resampling (DSIR, Xie et al. 2023):
      // score every document by how much more likely its tokens are under
      // the TARGET distribution (here: the English subcorpus) than under
      // the raw corpus — the principled "pick pretraining data that looks
      // like the target domain" weight, log w(d) = Σ_tokens
      // ln(p̂_target[feat] / p̂_raw[feat]) over HASHED unigram features
      // with add-1 smoothing. Hashing is the point at 100 TB: both
      // distributions live in a FIXED B-bucket table (B = 4096) whatever
      // the vocabulary, so the model is one bounded aggregate, broadcast
      // back — the corpus never moves. Scale shape: one explode feeds the
      // per-(doc, bucket) tf table (qt09's discipline — scoring joins tf,
      // not the token stream, so join input is bounded by Σ per-doc
      // distinct buckets); bucket stats + totals derive from tf; the
      // B-row ratio table broadcasts. Determinism: log-ratios are
      // 6-decimal-quantized decimals (exact per-doc decimal sums); both
      // smoothed probabilities are formed with the same explicit
      // double casts so every intermediate matches bit-for-bit.
      val B = 4096
      val tf = table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("lang"),
          pmod(TextOps.hash60(col("token")), lit(B)).as("bucket"))
        .agg(count(lit(1)).as("tf"))
        .persist() // bucket stats AND the scoring join derive from tf
      val bs = tf.groupBy(col("bucket"))
        .agg(sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("ct"),
          sum(col("tf")).as("cr"))
      val tot = bs.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
      val lr = bs.crossJoin(broadcast(tot))
        .select(col("bucket"),
          round(log(((col("ct") + 1).cast("double") / (col("nt") + B)) /
            ((col("cr") + 1).cast("double") / (col("nr") + B))), 6)
            .cast(org.apache.spark.sql.types.DecimalType(20, 6)).as("lr"))
      tf.join(broadcast(lr), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          sum(col("tf") * col("lr")).cast("double").as("logw"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH toks AS (SELECT doc_id, lang,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, lang,
          CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % 4096 AS bucket,
          count(*) AS tf
        FROM toks GROUP BY doc_id, lang, bucket),
      bs AS (SELECT bucket,
          CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS ct,
          CAST(sum(tf) AS BIGINT) AS cr
        FROM tf GROUP BY bucket),
      tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                     CAST(sum(cr) AS BIGINT) AS nr FROM bs),
      lr AS (SELECT bucket,
          CAST(round(ln(((ct + 1)::DOUBLE / (nt + 4096)) /
            ((cr + 1)::DOUBLE / (nr + 4096))), 6) AS DECIMAL(20,6)) AS lr
        FROM bs, tot)
      SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        CAST(sum(tf.tf * lr.lr) AS DOUBLE) AS logw
      FROM tf JOIN lr USING (bucket)
      GROUP BY tf.doc_id ORDER BY tf.doc_id""")),

    CatalogQuery("qp13_corpus_prep", (s, d) => {
      // The end-to-end curation pipeline in ONE declarative plan — what a
      // reference user actually runs nightly: exact dedup → quality
      // filter → train-split selection → per-(source, lang) token
      // accounting for the mixing step. Composition is the point: every
      // stage is a transformation on the same DataFrame, so Catalyst
      // fuses the three filters into one codegen'd pass and the whole
      // prep is one corpus scan + ONE hash shuffle (the dedup window
      // partitions by content hash; partition size = duplicate-group
      // size, bounded) + the final bounded aggregation.
      // Stages (all conventions shared with their standalone queries):
      //  - dedup: keep min(doc_id) per md5(text) group (qd01);
      //  - quality: ≥ 8 tokens and distinct/total ≥ 0.3 in EXACT integer
      //    arithmetic (10·distinct ≥ 3·total — qp06's quantization rule:
      //    never a float ratio in a cross-engine predicate);
      //  - split: md5-bucket < 90 = train (qp01).
      val toks = TextOps.tokens(col("text"))
      val w = Window.partitionBy(md5(col("text")))
      table(s, d, "documents")
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("keep_id"))
        .filter(size(toks) >= 8 &&
          size(array_distinct(toks)) * 10 >= size(toks) * 3)
        .filter(splitBucket < 90)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"), col("lang"))
    }, Some("""
      WITH k AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
                 FROM documents),
      f AS (SELECT * FROM k
            WHERE doc_id = keep_id
              AND length(regexp_split_to_array(trim(text), '\s+')) >= 8
              AND length(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 10
                    >= length(regexp_split_to_array(trim(text), '\s+')) * 3
              AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90)
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(length(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM f GROUP BY source, lang ORDER BY source, lang"""), headline = true),

    // ---------- multimodal plumbing ----------

    CatalogQuery("qm01_multimodal_meta", (s, d) => {
      // documents stand in for opaque binary payloads: byte length, declared
      // char count, and a derived frame count — the metadata column pattern
      // for image/audio/video blobs (the decode itself is stubbed; see
      // graft.pipeline.Multimodal)
      table(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          col("n_chars"),
          floor(col("n_chars") / 100).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, octet_length(encode(text)) AS n_bytes, n_chars,
        CAST(floor(n_chars / 100) AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""")),

    CatalogQuery("qm02_image_phash", (s, d) => {
      // Perceptual image hashing THROUGH THE REAL DECODE PATH: each doc's
      // first 64 codepoints (saturated to bytes) become the raster of a
      // genuine 8×8 PGM (P5)
      // payload, which round-trips through `MediaCodecs.decodeNetpbm` —
      // the same codec the multimodal plumbing uses — before the 64-bit
      // average-hash (aHash: bit i = pixel i brighter than the image
      // mean) is computed from the DECODED pixels. The oracle computes
      // the hash directly from the text bytes, so any corruption in
      // header parsing, raster extraction, or byte widening inside the
      // codec breaks the gate — an end-to-end decode certification, not
      // a synthetic stub. Exact-duplicate classes then group by hash
      // (the image-dedup first stage; banding the 4 sub-words is the
      // Hamming-LSH scale path, same geometry as qd02).
      //
      // Scale shape: one mapPartitions kernel pass (batched, no UDF
      // registry), one hash-groupBy for class sizes, join back keyed by
      // the hash words. All integer arithmetic — no float surface. The
      // hash is split into two 32-bit words so neither engine touches
      // the BIGINT sign bit.
      import s.implicits._
      val hashed = table(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val header = "P5\n8 8\n255\n".getBytes("US-ASCII")
          it.map { case (id, text) =>
            // pixel i = the i-th CODEPOINT saturated to a byte — mirrors
            // the oracle's character-indexed least(ascii(...), 255)
            // exactly. (Byte-indexed getBytes("US-ASCII") would collapse
            // every non-ASCII char to '?'=63 while the oracle sees the
            // real codepoint — a latent gate breaker on any regenerated
            // corpus with non-ASCII text.)
            val px = new Array[Byte](64)
            var i = 0
            var off = 0
            while (i < 64 && off < text.length) {
              val cp = text.codePointAt(off)
              px(i) = math.min(cp, 255).toByte
              off += Character.charCount(cp)
              i += 1
            }
            while (i < 64) { px(i) = ' '.toByte; i += 1 }
            val (img, _) = graft.pipeline.MediaCodecs.decodeNetpbm(header ++ px)
            var tot = 0L
            var j = 0
            while (j < 64) { tot += img.lumAt(j); j += 1 }
            var lo = 0L; var hi = 0L
            j = 0
            while (j < 64) {
              if (img.lumAt(j) * 64L > tot) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
              }
              j += 1
            }
            (id, hi, lo)
          }
        }.toDF("doc_id", "ahash_hi", "ahash_lo")
      val classes = hashed.groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(count(lit(1)).as("n_same_hash"))
      hashed.join(classes, Seq("ahash_hi", "ahash_lo"))
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"), col("n_same_hash"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH px AS (SELECT doc_id, i,
               CASE WHEN i <= length(text) THEN least(ascii(substr(text, i, 1)), 255)
                    ELSE 32 END AS p
             FROM documents, (SELECT unnest(range(1, 65)) AS i) ix),
      tot AS (SELECT doc_id, sum(p) AS tot FROM px GROUP BY 1),
      h AS (SELECT px.doc_id,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.i > 32
                THEN 1::BIGINT << (px.i - 33) ELSE 0 END) AS BIGINT) AS ahash_hi,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.i <= 32
                THEN 1::BIGINT << (px.i - 1) ELSE 0 END) AS BIGINT) AS ahash_lo
            FROM px JOIN tot USING (doc_id) GROUP BY px.doc_id),
      cls AS (SELECT ahash_hi, ahash_lo, count(*) AS n_same_hash
              FROM h GROUP BY 1, 2)
      SELECT h.doc_id, h.ahash_hi, h.ahash_lo,
        CAST(cls.n_same_hash AS BIGINT) AS n_same_hash
      FROM h JOIN cls USING (ahash_hi, ahash_lo)
      ORDER BY h.doc_id""")),

    CatalogQuery("qm05_image_neardup", (s, d) => {
      // Perceptual image NEAR-dup — the Hamming-LSH scale path qm02's
      // doc promises, materialized: 64-bit aHashes (through the real
      // decode path, via the qm02 catalog entry) band into 4×16-bit
      // sub-words, docs sharing a band verify by exact Hamming distance,
      // and each doc reports its near-dup partner count and closest
      // distance (1 ≤ hamming ≤ 6 — hamming 0 is qm02's exact-class
      // business). By pigeonhole the banding catches EVERY pair within
      // 3 bits; beyond that recall is the banding's, and the oracle
      // mirrors the blocking exactly (qd02's contract form).
      //
      // Scale shape: identical-hash classes collapse first (qd02's
      // discipline — space-padded short docs make hot hash classes the
      // NORM here), one representative bands per class, candidates are
      // (band, rep) keys only, and per-doc results expand from per-class
      // results (identical hash ⇒ identical partners and distances).
      // Verification is two bit_count(xor) ops per candidate — the qs11
      // comparison kernel on the image plane.
      val HamMax = 6
      val hashes = QueryCatalog.byName("qm02_image_phash").build(s, d)
        .select(col("doc_id"), col("ahash_hi").as("hi"), col("ahash_lo").as("lo"))
      val grouped = hashes.groupBy(col("hi"), col("lo"))
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("grp_n"),
          collect_list(col("doc_id")).as("members"))
        .persist() // reps band + verify joins + member expansion
      val reps = grouped.select(col("rep"), col("hi"), col("lo"), col("grp_n"))
      val banded = reps.select(col("rep"), explode(array(
        expr("0 * 65536 + (shiftright(lo, 0) & 65535)"),
        expr("1 * 65536 + (shiftright(lo, 16) & 65535)"),
        expr("2 * 65536 + (shiftright(hi, 0) & 65535)"),
        expr("3 * 65536 + (shiftright(hi, 16) & 65535)"))).as("band"))
      val cand = banded.select(col("band"), col("rep").as("rep_a"))
        .join(banded.select(col("band"), col("rep").as("rep_b")), Seq("band"))
        .filter(col("rep_a") =!= col("rep_b"))
        .select(col("rep_a"), col("rep_b")).distinct()
      val verified = cand
        .join(reps.select(col("rep").as("rep_a"), col("hi").as("hi_a"),
          col("lo").as("lo_a")), Seq("rep_a"))
        .join(reps.select(col("rep").as("rep_b"), col("hi").as("hi_b"),
          col("lo").as("lo_b"), col("grp_n").as("n_b")), Seq("rep_b"))
        .withColumn("hd",
          bit_count(col("hi_a").bitwiseXOR(col("hi_b"))).cast("long") +
            bit_count(col("lo_a").bitwiseXOR(col("lo_b"))).cast("long"))
        .filter(col("hd") <= HamMax) // distinct classes ⇒ hd >= 1 already
      val perClass = verified.groupBy(col("rep_a"))
        .agg(sum(col("n_b")).as("n_near"), min(col("hd")).as("min_hamming"))
        .withColumnRenamed("rep_a", "rep")
      grouped.select(col("rep"), explode(col("members")).as("doc_id"))
        .join(perClass, Seq("rep"))
        .select(col("doc_id"), col("n_near"), col("min_hamming"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH px AS (SELECT doc_id, i,
               CASE WHEN i <= length(text) THEN least(ascii(substr(text, i, 1)), 255)
                    ELSE 32 END AS p
             FROM documents, (SELECT unnest(range(1, 65)) AS i) ix),
      tot AS (SELECT doc_id, sum(p) AS tot FROM px GROUP BY 1),
      h AS (SELECT px.doc_id,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.i > 32
                THEN 1::BIGINT << (px.i - 33) ELSE 0 END) AS BIGINT) AS hi,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.i <= 32
                THEN 1::BIGINT << (px.i - 1) ELSE 0 END) AS BIGINT) AS lo
            FROM px JOIN tot USING (doc_id) GROUP BY px.doc_id),
      banded AS (SELECT doc_id, unnest([
          0 * 65536 + ((lo >> 0) & 65535),
          1 * 65536 + ((lo >> 16) & 65535),
          2 * 65536 + ((hi >> 0) & 65535),
          3 * 65536 + ((hi >> 16) & 65535)]) AS band FROM h),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM banded a JOIN banded b
                 ON a.band = b.band AND a.doc_id <> b.doc_id),
      ham AS (SELECT id_a, id_b,
                CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) AS BIGINT) AS hd
              FROM cand JOIN h x ON cand.id_a = x.doc_id
                        JOIN h y ON cand.id_b = y.doc_id)
      SELECT id_a AS doc_id, count(*) AS n_near, min(hd) AS min_hamming
      FROM ham WHERE hd BETWEEN 1 AND 6
      GROUP BY 1 ORDER BY doc_id"""), headline = true),

    CatalogQuery("qt17_pmi_collocations", (s, d) => {
      // Collocation mining: the top-20 adjacent bigrams by pointwise
      // mutual information, PMI(x,y) = ln(p(x,y) / (p(x)·p(y))) with
      // p(x,y) = c12/Nb and p(w) = c/Nu — the standard multi-word-
      // expression detector (Church & Hanks 1990) a tokenizer-training
      // pipeline runs to decide which word pairs deserve merged tokens.
      // A min-count floor (c12 ≥ 5) drops the hapax pairs whose PMI is
      // pure noise.
      //
      // Scale shape (qt14's discipline): the token stream collapses once
      // into bigram counts via hash aggregation (adjacency window
      // partitioned by doc_id — bounded by doc length); unigram counts
      // are a second hash agg; the two corpus totals are single-row
      // aggregates broadcast into the scoring join; top-20 is
      // TakeOrderedAndProject on the ROUNDED score (both engines rank
      // the identical 6-decimal double, ties broken lexicographically).
      val MinPairCount = 5
      val toks = table(s, d, "documents")
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .toDF("doc_id", "pos", "w")
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val big = toks
        .withColumn("w2", lead(col("w"), 1).over(byDoc))
        .filter(col("w2").isNotNull)
      val c12 = big.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = toks.agg(count(lit(1)).as("nu"))
        .crossJoin(big.agg(count(lit(1)).as("nb")))
      c12.filter(col("c12") >= MinPairCount)
        .join(c1.select(col("w"), col("c").as("ca")), Seq("w"))
        .join(c1.select(col("w").as("w2"), col("c").as("cb")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w").as("w1"), col("w2"), col("c12").as("n_pair"),
          round(log((col("c12").cast("double") / col("nb").cast("double")) /
            ((col("ca").cast("double") / col("nu").cast("double")) *
              (col("cb").cast("double") / col("nu").cast("double")))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }, Some("""
      WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
                    FROM documents),
      big AS (SELECT arr[i] AS w, arr[i + 1] AS w2
              FROM docs, (SELECT unnest(range(1, len(arr))) AS i) ix),
      uni AS (SELECT unnest(arr) AS w FROM docs),
      c12 AS (SELECT w, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      c1 AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
      tot AS (SELECT (SELECT count(*) FROM uni) AS nu,
                     (SELECT count(*) FROM big) AS nb)
      SELECT c12.w AS w1, c12.w2 AS w2, CAST(c12.c12 AS BIGINT) AS n_pair,
        round(ln((c12.c12::DOUBLE / nb::DOUBLE) /
          ((a.c::DOUBLE / nu::DOUBLE) * (b.c::DOUBLE / nu::DOUBLE))), 6) AS pmi
      FROM c12 JOIN c1 a ON c12.w = a.w JOIN c1 b ON c12.w2 = b.w, tot
      WHERE c12.c12 >= 5
      ORDER BY pmi DESC, w1, w2 LIMIT 20""")),

    CatalogQuery("qt18_readability", (s, d) => {
      // Readability scoring — the Flesch-Kincaid grade with a
      // deterministic syllable proxy (maximal [aeiouy]+ runs in the
      // lowercased text), the standard cheap complexity feature in
      // quality-filter stacks (alongside qt02's ratios). Sentence count =
      // maximal [.!?]+ runs, clamped to ≥1 so fragments still score.
      //
      // Scale shape: pure per-row codegen'd regex/length expressions that
      // pipeline inside the scan — no shuffle at any corpus size. Run
      // counting uses the replace-collapse trick (len after collapsing
      // each run to one '#' minus len after deleting runs = number of
      // runs), which both regex engines evaluate identically on these
      // RE2-safe ASCII classes (qt13's compatibility discipline). The
      // grade is one fixed double expression; constants appear literally
      // on both sides (qt12's pre-folding discipline).
      val lc = lower(col("text"))
      val syl = length(regexp_replace(lc, "[aeiouy]+", "#")) -
        length(regexp_replace(lc, "[aeiouy]+", ""))
      val sentRuns = length(regexp_replace(col("text"), "[.!?]+", "#")) -
        length(regexp_replace(col("text"), "[.!?]+", ""))
      val words = size(TextOps.tokens(col("text")))
      val sent = greatest(sentRuns, lit(1))
      table(s, d, "documents")
        .select(col("doc_id"), words.as("n_words"), sent.as("n_sentences"),
          syl.as("n_syllables"),
          round(lit(0.39) * (words.cast("double") / sent.cast("double")) +
            lit(11.8) * (syl.cast("double") / words.cast("double")) -
            lit(15.59), 6).as("fk_grade"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH r AS (SELECT doc_id,
          length(regexp_split_to_array(trim(text), '\s+')) AS n_words,
          greatest(length(regexp_replace(text, '[.!?]+', '#', 'g')) -
                   length(regexp_replace(text, '[.!?]+', '', 'g')), 1) AS n_sentences,
          length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g')) -
            length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        round(0.39::DOUBLE * (n_words::DOUBLE / n_sentences::DOUBLE) +
          11.8::DOUBLE * (n_syllables::DOUBLE / n_words::DOUBLE) -
          15.59::DOUBLE, 6) AS fk_grade
      FROM r ORDER BY doc_id""")),

    CatalogQuery("qt19_source_overlap", (s, d) => {
      // Corpus-composition audit: pairwise vocabulary Jaccard between
      // sources — the dataset-mixing diagnostic that flags near-identical
      // crawls (two snapshots of the same site) before they double-count
      // in the mixture, and quantifies domain distance for qp06/qp07-style
      // rebalancing decisions.
      //
      // Scale shape: the corpus collapses once into the DISTINCT
      // (source, token) posting table (hash aggregation); intersections
      // come from a self-equi-join keyed by token — the shuffle carries
      // vocabulary postings, never documents — and the output is bounded
      // by S² pairs (S = #sources, trivially small even when the corpus
      // is 100 TB). Per-source vocabulary sizes are an S-row aggregate
      // broadcast into the final scoring join.
      val st = table(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .distinct()
      val ns = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      st.select(col("source").as("s1"), col("w"))
        .join(st.select(col("source").as("s2"), col("w")), Seq("w"))
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_inter"))
        .join(broadcast(ns.select(col("source").as("s1"), col("nv").as("na"))), Seq("s1"))
        .join(broadcast(ns.select(col("source").as("s2"), col("nv").as("nb"))), Seq("s2"))
        .select(col("s1"), col("s2"), col("n_inter"),
          round(col("n_inter").cast("double") /
            (col("na") + col("nb") - col("n_inter")).cast("double"), 6).as("jaccard"))
        .orderBy(col("s1"), col("s2"))
    }, Some("""
      WITH st AS (SELECT DISTINCT source, w FROM
          (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
           FROM documents) t),
      ns AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
      iv AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
             FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
             GROUP BY 1, 2)
      SELECT s1, s2, CAST(n_inter AS BIGINT) AS n_inter,
        round(n_inter::DOUBLE / (x.nv + y.nv - n_inter)::DOUBLE, 6) AS jaccard
      FROM iv JOIN ns x ON iv.s1 = x.source JOIN ns y ON iv.s2 = y.source
      ORDER BY s1, s2""")),

    CatalogQuery("qp17_seqlen_histogram", (s, d) => {
      // Sequence-length planning: the log2 token-length histogram plus
      // each bucket's share of total tokens — the curve that decides the
      // packing sequence length (qp11's PackSeqLen) and how much padding/
      // truncation a candidate length costs. Buckets are integer-exact:
      // bucket = len(bin(n)) = ⌊log2 n⌋ + 1, so no float log can
      // misbucket a power of two on either engine.
      //
      // Scale shape: one per-row expression inside the scan, one hash
      // aggregation to ≤64 bucket rows, and a single-row total broadcast
      // back for the share — nothing else moves at any corpus size.
      val n = size(TextOps.tokens(col("text")))
      val h = table(s, d, "documents")
        .select(length(bin(n.cast("long"))).as("bucket"), n.as("n_tokens"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bucket_tokens"))
      h.crossJoin(broadcast(h.agg(sum(col("bucket_tokens")).as("t"))))
        .select(col("bucket"), col("n_docs"), col("bucket_tokens"),
          round(col("bucket_tokens").cast("double") / col("t").cast("double"), 6)
            .as("token_share"))
        .orderBy(col("bucket"))
    }, Some("""
      WITH lens AS (SELECT length(bin(
            length(regexp_split_to_array(trim(text), '\s+')))) AS bucket,
          length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents),
      h AS (SELECT bucket, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
            FROM lens GROUP BY 1),
      tot AS (SELECT CAST(sum(bucket_tokens) AS BIGINT) AS t FROM h)
      SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs, bucket_tokens,
        round(bucket_tokens::DOUBLE / t::DOUBLE, 6) AS token_share
      FROM h, tot ORDER BY bucket""")),

    CatalogQuery("qs11_sign_sketch_rerank", (s, d) => {
      // Binary-sketch ANN: each vector collapses to a 64-bit sign sketch
      // (bit i = dim i > 0 — the 1-bit-per-dim extreme of the qs05→qs07
      // quantization ladder, 32× smaller than fp32), candidates come from
      // Hamming distance over the sketches (two bit_count(xor) ops per
      // comparison — the cheapest possible scan), and exact fp cosine is
      // computed only for the ≤ queries × CandK survivors. Like
      // qs03/qs05/qs07 the quantization makes the oracle non-mirrorable,
      // so the gate is the bounded recall contract vs the brute-force
      // truth (qs01's plan), at ≥ 0.90. One bit per dim is the noisiest
      // quantizer in the qs05→qs07 family, so it needs the widest
      // candidate margin: CandK=48k measures avg recall 0.96–1.0 across
      // SFs (worst per-query 0.9 at sf0.1); 16k/32k measure 0.70/0.86 at
      // sf0.1 — do NOT shrink CandK without re-measuring. On real
      // embeddings (clustered, not near-random like this synthetic set)
      // the same sketch supports far smaller margins.
      //
      // Scale shape: the sketch table is two ints per vector; the
      // Hamming scan broadcasts 5 query sketches over one pass; both
      // ranking stages use the bounded TopKByScore aggregator (no
      // per-query window sort); rerank touches CandK rows per query.
      // The sketch packs via the codegen'd SignSketch expression into
      // two 32-bit halves (the equivalent aggregate/slice builtin fold
      // is CodegenFallback — interpreted lambda dispatch per element on
      // the corpus-wide hot path; ShingleExpressionsSpec pins the two
      // formulations bit-identical); Hamming = bit_count(hi⊕hi') +
      // bit_count(lo⊕lo').
      import graft.functions.expressions.ShingleExpressions.signSketch
      val NQueries = 5; val CandK = 48 * AnnTopK
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // sketch scan + rerank + truth scan reuse it
      val dim = 64
      val sk = e.select(col("vec_id"),
        signSketch(col("v"), 0, dim / 2).as("shi"),
        signSketch(col("v"), dim / 2, dim / 2).as("slo"))
      val qsk = sk.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("shi").as("qhi"), col("slo").as("qlo"))
      val hammed = sk.crossJoin(broadcast(qsk))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          negate((bit_count(col("shi").bitwiseXOR(col("qhi"))) +
            bit_count(col("slo").bitwiseXOR(col("qlo")))).cast("double")).as("score"))
      val candTopK = graft.functions.TopKAggregator.topK(CandK)
      val cand = hammed.groupBy(col("query_id"))
        .agg(candTopK(col("score"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val exactQueries = hoistNorm(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), "qv", "qnorm")
      // hoist AFTER the candidate join: vnorm once per surviving
      // candidate row (bounded CandK × queries), qnorm once per query —
      // never per pair (bit-identical expression, same IEEE ops)
      val rescored = hoistNorm(e.join(broadcast(cand), Seq("vec_id")), "v", "vnorm")
        .join(broadcast(exactQueries), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      val reranked = topkRanked(rescored).select(col("query_id"), col("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val perQuery = truth
        .join(reranked.withColumn("hit", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
      perQuery.agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
        .select(col("n_queries"), (col("r") >= 0.90).as("recall_ge_090"))
    }, Some("""
      SELECT count(*) AS n_queries, TRUE AS recall_ge_090
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qe07_intrinsic_dim", (s, d) => {
      // Intrinsic-dimension estimate via TwoNN (Facco et al. 2017): for
      // each point, μ = r2/r1 (ratio of 2nd- to 1st-nearest-neighbor
      // distance); the MLE d̂ = n / Σ ln μ. Embeddings whose intrinsic
      // dimension is far below the ambient one tolerate aggressive
      // truncation (qs10's Matryoshka path) — this is the audit that
      // licenses it.
      //
      // Scale shape: the estimator is statistical, so it runs on a
      // DETERMINISTIC bounded sample (vec_id < 256 — the qd05/qs02
      // mirror-able convention), never the full corpus: all-pairs within
      // the sample is 256² rows whatever the corpus size, and the sample
      // ships as one broadcast. ln μ = ½·ln(d2²/d1²) so no sqrt enters
      // the arithmetic. Exactness discipline: squared distances are sums
      // of 12-decimal-quantized per-dim squares (qe05's (37,12)+(25,12)
      // accumulator — bit-identical across engines AND partitionings),
      // so the per-point NN ranking is exact decimal comparison, and the
      // final Σ ln μ is a decimal sum of identically-rounded doubles.
      // Zero-distance twins (exact duplicate vectors) are excluded on
      // both sides — μ is undefined there.
      val SampleN = 256
      val dec25 = org.apache.spark.sql.types.DecimalType(25, 12)
      val dec37 = org.apache.spark.sql.types.DecimalType(37, 12)
      val e = table(s, d, "embeddings")
        .filter(col("vec_id") < SampleN)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val pairs = e.select(col("vec_id").as("ia"), col("v").as("va"))
        .crossJoin(broadcast(e.select(col("vec_id").as("ib"), col("v").as("vb"))))
        .filter(col("ia") =!= col("ib"))
        .select(col("ia"), col("ib"),
          aggregate(
            zip_with(col("va"), col("vb"), (x, y) => round((x - y) * (x - y), 12).cast(dec25)),
            lit(0).cast(dec37), (acc, r) => (acc + r).cast(dec37)).as("dsq"))
      val byPoint = Window.partitionBy(col("ia")).orderBy(col("dsq"), col("ib"))
      val nn = pairs.withColumn("rn", row_number().over(byPoint))
        .filter(col("rn") <= 2)
        .groupBy(col("ia"))
        .agg(min(when(col("rn") === 1, col("dsq"))).as("d1"),
          min(when(col("rn") === 2, col("dsq"))).as("d2"))
        .filter(col("d1") > 0)
        .select(round(lit(0.5) * log(col("d2").cast("double") / col("d1").cast("double")), 12)
          .cast(dec25).as("lnmu"))
      nn.agg(count(lit(1)).as("n_points"), sum(col("lnmu")).as("slm"))
        .select(col("n_points"),
          round(col("n_points").cast("double") / col("slm").cast("double"), 6).as("id_hat"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                 WHERE vec_id < 256),
      el AS (SELECT vec_id, i, v[i] AS x
             FROM e, (SELECT unnest(range(1, len(v) + 1)) AS i) ix),
      dsq AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                sum(CAST(round((a.x - b.x) * (a.x - b.x), 12) AS DECIMAL(25,12))) AS dsq
              FROM el a JOIN el b ON a.i = b.i AND a.vec_id <> b.vec_id
              GROUP BY 1, 2),
      rk AS (SELECT ia, ib, dsq,
               row_number() OVER (PARTITION BY ia ORDER BY dsq, ib) AS rn
             FROM dsq),
      mu AS (SELECT ia,
               max(CASE WHEN rn = 1 THEN dsq END) AS d1,
               CAST(round(0.5::DOUBLE *
                 ln(max(CASE WHEN rn = 2 THEN dsq END)::DOUBLE /
                    max(CASE WHEN rn = 1 THEN dsq END)::DOUBLE), 12)
                 AS DECIMAL(25,12)) AS lnmu
             FROM rk WHERE rn <= 2 GROUP BY ia)
      SELECT count(*) AS n_points,
        round(count(*)::DOUBLE / CAST(sum(lnmu) AS DOUBLE), 6) AS id_hat
      FROM mu WHERE d1 > 0""")),

    CatalogQuery("qd13_minhash_calibration", (s, d) => {
      // LSH estimator calibration: for EVERY candidate pair the bands
      // surface (including sub-threshold ones qd02 discards), the
      // minhash Jaccard estimate (matching signature components / perms)
      // against the exact Jaccard — the audit that justifies the banding
      // parameters: if |est − exact| drifts, the P(candidate | j) curve
      // the (bands, rows) choice was derived from no longer holds for
      // this corpus.
      //
      // Scale shape: exactly qd02's blocking (exact-dup pre-collapse,
      // keys-only band shuffle); the only additions are one zip_with
      // equality fold over the 8-component signatures and the same
      // sorted-merge intersect — both per-candidate, never per-corpus.
      // Estimate and exact score compute on representatives and expand
      // to member pairs (identical shingle sets ⇒ identical signatures ⇒
      // scores inherit verbatim; intra-group pairs sit at exactly 1.0).
      import graft.functions.expressions.ShingleExpressions._
      // widen before the MD5-per-gram shingle stage (the shared
      // graft.core.Parallelism rule: identity at production split counts)
      val docs0 = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), shingleHash60(col("text"), ShingleN).as("hs"))
      val (reps, memb, cand) = collapsedLshCandidates(docs0)
      val repScored = cand
        .join(reps.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("id_a").as("rep_a"), col("id_b").as("rep_b"),
          round(aggregate(
            zip_with(minhashSig(col("hs_a"), NumPerms), minhashSig(col("hs_b"), NumPerms),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), _ + _).cast("double") / lit(NumPerms), 6).as("est"),
          round(col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter")), 6).as("exact"))
      val cross = repScored
        .join(memb.select(col("rep_id").as("rep_a"), col("doc_id").as("m_a")), Seq("rep_a"))
        .join(memb.select(col("rep_id").as("rep_b"), col("doc_id").as("m_b")), Seq("rep_b"))
        .select(least(col("m_a"), col("m_b")).as("id_a"),
          greatest(col("m_a"), col("m_b")).as("id_b"), col("est"), col("exact"))
      val ia = memb.select(col("rep_id"), col("doc_id").as("id_a"))
      val ib = memb.select(col("rep_id"), col("doc_id").as("id_b"))
      val intra = ia.join(ib, Seq("rep_id")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          lit(1.0).as("est"), lit(1.0).as("exact"))
      cross.unionByName(intra)
        .select(col("id_a"), col("id_b"), col("est"), col("exact"),
          round(abs(col("est") - col("exact")), 6).as("abs_err"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some(s"""
      WITH $oMinhashCandCtes,
      scored AS (
        SELECT id_a, id_b,
          round(len([i for i in range(1, ${NumPerms + 1})
                     if sx.mh[i] = sy.mh[i]])::DOUBLE / $NumPerms, 6) AS est,
          round(len(list_intersect(x.hs, y.hs))::DOUBLE /
            (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6) AS exact
        FROM cand
          JOIN sig sx ON cand.id_a = sx.doc_id JOIN sig sy ON cand.id_b = sy.doc_id
          JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id)
      SELECT id_a, id_b, est, exact, round(abs(est - exact), 6) AS abs_err
      FROM scored ORDER BY id_a, id_b""")),

    CatalogQuery("qd19_perm_curve", (s, d) => {
      // MinHash signature-SIZE calibration curve — estimator error at
      // 2/4/8 permutations from ONE signature computation (prefixes of
      // one signature are valid smaller signatures, so the sweep costs
      // nothing extra): the sizing table behind NumPerms=8, read next
      // to qd13's per-candidate calibration and qd18's threshold sweep.
      // Mean |est_k − exact| over every banding-surfaced pair, per k.
      //
      // Scale shape: qd02's collapsed blocking; per-rep-pair work is
      // one component-match fold + prefix sums; cross-pair means weight
      // by group-size PRODUCTS (never member expansion), intra pairs
      // contribute exact zeros. Determinism: est_k and exact are single
      // divisions (bit-identical both engines), |diff| quantizes at 12
      // decimals into exact decimal weighted sums, one final double
      // division rounded to 6.
      import graft.functions.expressions.ShingleExpressions._
      import s.implicits._
      val Ks = Seq(2, 4, 8)
      val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val docs0 = graft.core.Parallelism.widen(table(s, d, "documents"))
        .filter(length(col("text")) >= ShingleN)
        .select(col("doc_id"), shingleHash60(col("text"), ShingleN).as("hs"))
      val (reps, memb, cand) = collapsedLshCandidates(docs0)
      val sizes = memb.groupBy(col("rep_id")).agg(count(lit(1)).as("n")).persist()
      val repScored = cand
        .join(reps.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(reps.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
        .select(col("id_a"), col("id_b"),
          zip_with(minhashSig(col("hs_a"), NumPerms), minhashSig(col("hs_b"), NumPerms),
            (x, y) => when(x === y, 1L).otherwise(0L)).as("m"),
          (col("inter").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("inter"))).as("exact"))
      val errRows = repScored
        .join(sizes.select(col("rep_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("rep_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
        .select((col("n_a") * col("n_b")).as("w"),
          explode(array(Ks.map { k =>
            struct(lit(k).as("n_perms"),
              round(abs(aggregate(slice(col("m"), 1, k), lit(0L), _ + _)
                .cast("double") / k - col("exact")), 12).cast(dec12).as("err"))
          }: _*)).as("kk"))
        .select(col("w"), col("kk.n_perms").as("n_perms"), col("kk.err").as("err"))
      val errAgg = errRows.groupBy(col("n_perms"))
        .agg(sum(col("err") * col("w")).as("sum_err"))
      val crossTotal = errRows.filter(col("n_perms") === Ks.head)
        .agg(coalesce(sum(col("w")), lit(0L)).as("cross_pairs"))
      val intraTotal = sizes.agg(
        coalesce(sum(expr("n * (n - 1L) div 2")), lit(0L)).as("intra_pairs"))
      Ks.toDF("n_perms")
        .join(errAgg, Seq("n_perms"), "left")
        .crossJoin(broadcast(crossTotal)).crossJoin(broadcast(intraTotal))
        .select(col("n_perms"),
          (col("cross_pairs") + col("intra_pairs")).as("n_pairs"),
          round(coalesce(col("sum_err"), lit(0).cast(dec12)).cast("double") /
            (col("cross_pairs") + col("intra_pairs")), 6).as("mean_abs_err"))
        .orderBy(col("n_perms"))
    }, Some(s"""
      WITH $oMinhashCandCtes,
      errs AS (
        SELECT kk.k,
          CAST(round(abs(
            len([i for i in range(1, kk.k + 1) if sx.mh[i] = sy.mh[i]])::DOUBLE / kk.k
            - len(list_intersect(x.hs, y.hs))::DOUBLE /
              (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))), 12)
            AS DECIMAL(38,12)) AS err
        FROM cand
          JOIN sig sx ON cand.id_a = sx.doc_id JOIN sig sy ON cand.id_b = sy.doc_id
          JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id,
          (SELECT unnest([2, 4, 8]) AS k) kk)
      SELECT k AS n_perms, CAST(count(*) AS BIGINT) AS n_pairs,
        round(CAST(sum(err) AS DOUBLE) / count(*), 6) AS mean_abs_err
      FROM errs GROUP BY k ORDER BY n_perms""")),

    CatalogQuery("qe08_quantization_error", (s, d) => {
      // The audit that licenses qs05's int8 memory path: corpus-level
      // reconstruction error of per-vector symmetric int8 quantization
      // (scale = max|x|/127, the exact scheme qs05 scans with). Output =
      // total squared error + worst per-element absolute error; a corpus
      // whose max_abs_err rivals its typical element magnitude should not
      // run the quantized path without a wider candidate margin.
      //
      // Scale shape: one pass, three per-row array expressions, one
      // bounded aggregate — the corpus never shuffles. Exactness: the
      // quantize→dequantize arithmetic (round-half-up, IEEE double ops in
      // a fixed order) is identical on both engines, per-element squared
      // errors are 12-decimal-quantized decimals (qe05's accumulator
      // discipline), and max is order-free.
      val dec25 = org.apache.spark.sql.types.DecimalType(25, 12)
      val dec37 = org.apache.spark.sql.types.DecimalType(37, 12)
      table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .select(col("vec_id"), col("v"),
          (greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30)) /
            lit(127.0)).as("s"))
        .select(col("vec_id"),
          transform(col("v"), x => x - round(x / col("s")) * col("s")).as("err"))
        .select(col("vec_id"),
          aggregate(col("err"), lit(0).cast(dec37),
            (acc, x) => (acc + round(x * x, 12).cast(dec25)).cast(dec37)).as("sq"),
          array_max(transform(col("err"), x => round(abs(x), 12).cast(dec25))).as("mx"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("sq")).cast("double").as("total_sq_err"),
          max(col("mx")).cast("double").as("max_abs_err"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      s AS (SELECT vec_id,
              greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) /
                127::DOUBLE AS s
            FROM e),
      el AS (SELECT e.vec_id, v[i] AS x, s.s
             FROM e JOIN s USING (vec_id),
               (SELECT unnest(range(1, len(v) + 1)) AS i) ix),
      err AS (SELECT vec_id,
               sum(CAST(round((x - round(x / s) * s) * (x - round(x / s) * s), 12)
                 AS DECIMAL(25,12))) AS sq,
               max(CAST(round(abs(x - round(x / s) * s), 12)
                 AS DECIMAL(25,12))) AS mx
              FROM el GROUP BY 1)
      SELECT count(*) AS n_vectors,
        CAST(sum(sq) AS DOUBLE) AS total_sq_err,
        CAST(max(mx) AS DOUBLE) AS max_abs_err
      FROM err""")),

    CatalogQuery("qs12_filtered_ann", (s, d) => {
      // Filtered vector search — THE production retrieval feature: top-k
      // under a metadata predicate (here: same label as the query, the
      // tenant/language/source-scoped search shape). The scale insight is
      // that the predicate belongs IN THE POSTING-LIST KEY, not in a
      // post-rank filter: the corpus posts to (cell, label) and the probe
      // join keys on BOTH, so candidates shrink by predicate selectivity
      // before any distance is computed — post-filtering top-k instead
      // would starve selective predicates (the classic filtered-ANN
      // failure). Plan pinned: the probe join must key on cell AND label.
      // Geometry is qs02's deterministic IVF (vec_id<K centroids,
      // nprobe=4) so the oracle mirrors both stages exactly; a trained
      // KMeans fit slots in unchanged (qs03 gates that path).
      val K = 16; val NProbe = 4
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
        .collect().sortBy(_._1)
      val bc = s.sparkContext.broadcast(cents)
      def nearestCells(v: Seq[Double], n: Int): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).take(n).map(_._2).toSeq
      val assigned = hoistNorm(e.as[(Long, Int, Seq[Double])]
        .map { case (id, lb, v) => (id, lb, v, nearestCells(v, 1).head) }
        .toDF("vec_id", "label", "v", "cell"), "v", "vnorm")
      val queries = hoistNorm(e.filter(col("vec_id") < 5).as[(Long, Int, Seq[Double])]
        .flatMap { case (id, lb, v) => nearestCells(v, NProbe).map(c => (id, lb, v, c)) }
        .toDF("query_id", "label", "qv", "cell"), "qv", "qnorm")
      val scored = assigned.join(broadcast(queries), Seq("cell", "label"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosineHoisted.as("cosine"))
      topkRanked(scored)
    }, Some(oFilteredTopkSql)),

    CatalogQuery("qs18_filtered_index_serve", (s, d) => {
      // Filtered serving from the PERSISTENT index — qs12's posting-key
      // insight materialized in the artifact: the index is built with
      // the label IN THE PARTITION KEY ((cell, meta) directories), so a
      // label-scoped query prunes the scan by BOTH probe cells and
      // predicate value at the parquet-partition level — the multi-
      // tenant vector-search layout where a tenant's query never opens
      // another tenant's files. Same deterministic geometry as
      // qs02/qs12, so the oracle is qs12's SQL verbatim; gates
      // build→partition→prune→filtered-serve end to end.
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-qs18-ivf").toString
      graft.sinks.IvfIndexStore.build(table(s, d, "embeddings"), 16, idxDir,
        metaCol = Some("label"))
      val queries = table(s, d, "embeddings")
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), _.cast("double")).as("qv"),
          col("label").cast("string").as("meta"))
        .filter(col("query_id") < 5)
      graft.sinks.IvfIndexStore.queryFiltered(s, idxDir, queries,
        nProbe = 4, topK = 10)
    }, Some(oFilteredTopkSql)),

    CatalogQuery("qt20_char_entropy", (s, d) => {
      // Character-distribution Shannon entropy per document — the cheap
      // junk detector orthogonal to qt02's ratios: base64/hex/binary
      // spill scores near-uniform (high H), keyboard-mash and template
      // boilerplate score low, natural language sits in a stable band.
      //
      // Scale shape: one explode into (doc, char) counts (hash agg with
      // map-side partials, bounded by doc alphabet), per-doc totals from
      // the same table, summands 12-decimal-quantized decimals so the
      // per-doc sum is exact on both engines. Characters come from
      // regexp_extract_all over [\s\S] — CODEPOINT-wise in both regex
      // engines (Java '.'-family patterns match code points, as does
      // RE2), sidestepping the UTF-16-unit-vs-codepoint split trap.
      val dec25 = org.apache.spark.sql.types.DecimalType(25, 12)
      val chars = table(s, d, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("[\\s\\S]"), lit(0))).as("ch"))
      val counts = chars.groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
        .persist() // totals + summands both derive from it
      val totals = counts.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      counts.join(totals, Seq("doc_id"))
        .select(col("doc_id"), col("n"),
          round((col("c").cast("double") / col("n").cast("double")) *
            log(col("c").cast("double") / col("n").cast("double")), 12)
            .cast(dec25).as("plp"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_chars"),
          count(lit(1)).as("n_distinct_chars"),
          round(-sum(col("plp")).cast("double"), 6).as("entropy"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
                  FROM documents WHERE length(text) > 0),
      counts AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
      summed AS (SELECT counts.doc_id, totals.n,
          CAST(round((c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE), 12)
            AS DECIMAL(25,12)) AS plp
        FROM counts JOIN totals USING (doc_id))
      SELECT doc_id, max(n) AS n_chars,
        count(*) AS n_distinct_chars,
        round(-CAST(sum(plp) AS DOUBLE), 6) AS entropy
      FROM summed GROUP BY doc_id ORDER BY doc_id""")),

    CatalogQuery("qt21_dup_trigram_fraction", (s, d) => {
      // Duplicate-trigram occurrence fraction — the Gopher repetition
      // family's n-gram member (Rae et al. 2021 filter on duplicate
      // n-gram fractions, n=3 here): the share of a document's trigram
      // occurrences whose trigram occurs at least twice IN THAT document.
      // qt06's dup-token ratio catches word-level stutter and its
      // top-bigram coverage catches one dominant pattern; the trigram
      // fraction catches longer-loop template spam (navigation blocks,
      // generated boilerplate) that unigram/bigram screens miss.
      //
      // Scale shape: the token stream collapses ONCE into the per-(doc,
      // trigram) tf table via hash aggregation (map-side partials — never
      // a per-row quadratic scan); adjacency comes from doc-partitioned
      // lead windows (bounded by doc length, qt14's discipline); the
      // per-doc finish is a second hash agg. All counts are integers and
      // the fraction is a BIGINT ppm floor division — exact on both
      // engines, no float in sight.
      val toks = table(s, d, "documents")
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .toDF("doc_id", "pos", "w")
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val tf = toks
        .withColumn("w2", lead(col("w"), 1).over(byDoc))
        .withColumn("w3", lead(col("w"), 2).over(byDoc))
        .filter(col("w3").isNotNull)
        .groupBy(col("doc_id"), col("w"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("tf"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_trigrams"),
          sum(when(col("tf") >= 2, col("tf")).otherwise(lit(0L))).as("dup_occ"))
        .select(col("doc_id"), col("n_trigrams"),
          expr("dup_occ * 1000000L div n_trigrams").as("dup_ppm"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
                    FROM documents),
      tri AS (SELECT doc_id, arr[i] AS w, arr[i + 1] AS w2, arr[i + 2] AS w3
              FROM docs, (SELECT unnest(range(1, len(arr) - 1)) AS i) ix),
      tf AS (SELECT doc_id, w, w2, w3, count(*) AS tf FROM tri GROUP BY 1, 2, 3, 4),
      agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
                CAST(sum(CASE WHEN tf >= 2 THEN tf ELSE 0 END) AS BIGINT) AS dup_occ
              FROM tf GROUP BY doc_id)
      SELECT doc_id, n_trigrams, dup_occ * 1000000 // n_trigrams AS dup_ppm
      FROM agg ORDER BY doc_id""")),

    CatalogQuery("qp19_decontam_repair", (s, d) => {
      // Decontamination REPAIR — the action on qp05's audit (the GPT-3
      // recipe: when a train document near-duplicates an eval document,
      // the TRAIN side is quarantined; eval stays fixed so benchmarks
      // remain comparable). Output = the quarantine list with per-doc
      // leak counts. Composes qd02's verified pairs and qp01's stateless
      // split through their public catalog entries, so the repair can
      // never drift from the audit's definitions. val↔test cross-pairs
      // carry no train contamination and are deliberately untouched.
      //
      // Scale shape: qp05's — the pair set is the (small) dedup output,
      // split labels re-derive statelessly per row, joins touch pairs×2.
      val pairs = QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
        .select(col("id_a"), col("id_b"))
      val split = table(s, d, "documents")
        .select(col("doc_id"), splitLabel(splitBucket).as("split"))
      val lab = pairs
        .join(split.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
        .join(split.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      val trainSide = lab
        .filter(col("split_a") === "train" && col("split_b") =!= "train")
        .select(col("id_a").as("doc_id"), col("id_b").as("partner"))
        .unionByName(lab
          .filter(col("split_b") === "train" && col("split_a") =!= "train")
          .select(col("id_b").as("doc_id"), col("id_a").as("partner")))
      trainSide.groupBy(col("doc_id"))
        .agg(countDistinct(col("partner")).as("n_eval_dups"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH $oMinhashPairsCtes,
      $oSplitCte,
      lab AS (SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
              FROM pairs p
              JOIN sp sa ON p.id_a = sa.doc_id
              JOIN sp sb ON p.id_b = sb.doc_id),
      ts AS (SELECT id_a AS doc_id, id_b AS partner FROM lab
             WHERE split_a = 'train' AND split_b <> 'train'
             UNION ALL
             SELECT id_b, id_a FROM lab
             WHERE split_b = 'train' AND split_a <> 'train')
      SELECT doc_id, CAST(count(DISTINCT partner) AS BIGINT) AS n_eval_dups
      FROM ts GROUP BY doc_id ORDER BY doc_id""")),

    CatalogQuery("qs13_recall_curve", (s, d) => {
      // The ANN operating curve: recall at MULTIPLE candidate margins
      // from ONE cheap-stage scan — the tuning run that justifies a
      // production CandK choice (qs05/qs07/qs11 each pin one; this
      // measures the curve they sit on). Margins are PREFIXES of one
      // Hamming-ranked candidate list (top-4k ⊂ top-16k ⊂ top-48k), so
      // the sketch scan and the exact rerank cosines compute once and
      // every margin's top-k derives by prefix filter.
      //
      // Contract (provable, so the gate is strict): reranked top-k
      // recall is NONDECREASING in the candidate prefix — a vector
      // displacing a truth member from a superset's cosine top-k would
      // itself beat that member's cosine and hence be in the truth set
      // under the same deterministic tie order — and the widest margin
      // must clear qs11's 0.90 bound. The oracle pins the margin/query
      // counts + TRUE.
      import graft.functions.expressions.ShingleExpressions.signSketch
      val NQueries = 5; val Margins = Seq(4, 16, 48)
      val MaxCand = Margins.max * AnnTopK
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // sketch scan + rerank + truth scan
      val dim = 64
      val sk = e.select(col("vec_id"),
        signSketch(col("v"), 0, dim / 2).as("shi"),
        signSketch(col("v"), dim / 2, dim / 2).as("slo"))
      val qsk = sk.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("shi").as("qhi"), col("slo").as("qlo"))
      val hammed = sk.crossJoin(broadcast(qsk))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          negate((bit_count(col("shi").bitwiseXOR(col("qhi"))) +
            bit_count(col("slo").bitwiseXOR(col("qlo")))).cast("double")).as("score"))
      val candTopK = graft.functions.TopKAggregator.topK(MaxCand)
      val cand = hammed.groupBy(col("query_id"))
        .agg(candTopK(col("score"), col("vec_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), col("pos").as("r"), col("col.vec_id").as("vec_id"))
      val exactQueries = hoistNorm(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), "qv", "qnorm")
      // hoist AFTER the candidate join — vnorm once per surviving
      // candidate row, qnorm once per query, never per pair
      val cosined = hoistNorm(e.join(broadcast(cand), Seq("vec_id")), "v", "vnorm")
        .join(broadcast(exactQueries), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), col("r"),
          cosineHoisted.as("cosine"))
        .persist() // every margin's rerank reads it
      import s.implicits._
      val marginDf = Margins.toDF("m")
      val topk = graft.functions.TopKAggregator.topK(AnnTopK)
      val rr = cosined.crossJoin(broadcast(marginDf))
        .filter(col("r") < col("m") * AnnTopK)
        .groupBy(col("m"), col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("m"), col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val recalls = truth.crossJoin(broadcast(marginDf))
        .join(rr.withColumn("hit", lit(1L)), Seq("m", "query_id", "vec_id"), "left")
        .groupBy(col("m"), col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
        .groupBy(col("m")).agg(avg(col("recall")).as("r"))
        .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap // ≤ |Margins| rows
      val curve = Margins.map(recalls)
      val monotone = curve.zip(curve.tail).forall { case (a, b) => a <= b }
      Seq((Margins.length.toLong, NQueries.toLong, monotone,
        curve.last >= 0.90))
        .toDF("n_margins", "n_queries", "recall_nondecreasing", "recall_ge_090_at_max")
    }, Some("""
      SELECT 3::BIGINT AS n_margins,
        CAST(count(*) AS BIGINT) AS n_queries,
        TRUE AS recall_nondecreasing, TRUE AS recall_ge_090_at_max
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qs19_multivector_maxsim", (s, d) => {
      // Multi-vector LATE-INTERACTION retrieval — the ColBERT/MaxSim
      // scoring shape (Khattab & Zaharia 2020): documents and queries
      // are SETS of sub-vectors (here the 64-dim embedding sliced into
      // 4×16-dim views — deterministic on both engines), and
      // score(q, d) = Σ_i max_j cos(q_i, d_j): each query sub-vector
      // matches its best document sub-vector independently, which
      // single-vector cosine structurally cannot express. The missing
      // member of the retrieval ladder next to dense (qs01..), sparse
      // (qt12) and hybrid (qs08).
      //
      // Scale shape: qs01's brute-force discipline — 5 queries
      // broadcast over ONE corpus scan (the scoring is a pure per-row
      // expression tree, 16 sub-cosines deep, fully codegen'd), bounded
      // TopKByScore finisher. The IVF/banded candidate generation
      // (qs02/qs04) slots in front unchanged for the 100 TB path — the
      // scorer is agnostic to where candidates come from.
      // Determinism: per-sub-pair cosines are bit-identical across
      // engines (list_dot_product ≡ the zip_with fold — the qs02
      // contract), the 4-way max is exact, each max quantizes at 12
      // decimals, and the 4 terms add in fixed left-assoc order.
      val Subs = 4; val SubDim = 16
      def sub(v: Column, i: Int): Column = slice(v, i * SubDim + 1, SubDim)
      def scos(a: Column, b: Column): Column =
        vdot(a, b) / (sqrt(greatest(vdot(a, a), lit(1e-30))) *
          sqrt(greatest(vdot(b, b), lit(1e-30))))
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val maxsim = (0 until Subs).map { i =>
        round(greatest((0 until Subs).map(j =>
          scos(sub(col("qv"), i), sub(col("v"), j))): _*), 12)
      }.reduce(_ + _)
      val scored = e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), maxsim.as("cosine"))
      topkRanked(scored)
    }, Some(oMaxSimSql)),

    CatalogQuery("qs40_maxsim_index_serve", (s, d) => {
      // The persistent MULTI-VECTOR serving path under the correctness
      // gate — the last retrieval paradigm (dense/compressed/graph/
      // sparse+positional/multi-vector) to get a build-once/serve-many
      // store: build the MaxSimIndexStore artifact (pooled-space
      // centroids + cell-partitioned postings carrying HOISTED per-sub
      // norms) and answer qs19's standard batch FROM THE ARTIFACT. The
      // oracle is qs19's brute-force SQL verbatim: nProbe = K probes
      // every pooled cell, which IS the brute-force scan, so serving is
      // exact BY CONSTRUCTION — the gate grades the whole
      // build→persist→prune→serve path (posting layout, stored-norm
      // bit-identity, replay dedup, rank order) at any SF, robust to
      // testdata regeneration. nProbe < K is the measured approximate
      // knob (MaxSimProbeMain: on these near-random synthetics recall
      // needs a 60-90% scan under ANY proxy — the qs32 story on the
      // multi-vector axis; real clustered corpora prune) and the store's
      // standing FLOP win is norm hoisting: 16 dots per candidate vs the
      // in-query plan's 48. Partition pruning is spec-pinned
      // (PlanQualitySpec: PartitionFilters on cell at nProbe < K).
      Serve.queryMaxSimIndex(s, d, Serve.buildMaxSimIndex(s, d))
    }, Some(oMaxSimSql), headline = true),

    CatalogQuery("qs41_maxsim_filtered_serve", (s, d) => {
      // FILTERED multi-vector serving under the correctness gate — the
      // last cell of the (paradigm × filtered) matrix: build the
      // MaxSimIndexStore metadata-scoped on label ((cell, meta)
      // partition key — the IvfIndexStore posting-key recipe), serve the
      // standard batch restricted to each query's own label. The oracle
      // is the label-scoped brute force: at nProbe=K every cell is
      // probed, so the (cell, meta)-pruned candidate set IS the label's
      // sub-corpus and serving is exact BY CONSTRUCTION (qs40's argument
      // on the filtered axis — no recall pin to maintain, robust at any
      // SF). Scale shape: scan bytes track the tenant, not the corpus
      // (meta partition dirs prune before any sub-cosine computes), the
      // candidate join keys on (cell, meta), and the batch's meta domain
      // enumerates with nulls excluded BEFORE the cap (the r13 advice
      // class, applied from birth).
      Serve.queryMaxSimFiltered(s, d, Serve.buildMaxSimIndexScoped(s, d))
    }, Some(oMaxSimFilteredSql)),

    CatalogQuery("qs42_maxsim_range_serve", (s, d) => {
      // RANGE search on the multi-vector axis — the radius primitive
      // next to top-k (qs20/qs21/qs25 on IVF, qs39 on PQ, HERE on
      // MaxSim): every posting whose late-interaction score reaches the
      // radius, however many there are — the recall-critical sweep shape
      // (takedown, contamination audit around a known-bad exemplar)
      // where a k cut-off silently drops qualifying neighbors. Serving
      // is [[MaxSimIndexStore.rangeQuery]]'s stateless filter finish at
      // nProbe=K (exact by construction — qs40's argument), so the
      // oracle is the brute-force sweep verbatim: filter on the
      // UNROUNDED score, round 6 for output, (query_id, vec_id) order —
      // qs20's mirror conventions.
      Serve.queryMaxSimRange(s, d, Serve.buildMaxSimIndex(s, d))
    }, Some(oMaxSimRangeSql(MaxSimRangeRadius))),

    CatalogQuery("qs17_nprobe_curve", (s, d) => {
      // The IVF operating curve: recall vs nprobe from ONE assignment
      // pass — the tuning run behind every nprobe pin in the IVF plane
      // (qs02/qd05 probe 4, qs03 probes 8; this measures the curve those
      // choices sit on). Every query ranks ALL K cells once; the
      // candidate set at nprobe=m is the prefix of that ranking, so the
      // corpus assignment, the probe ranking, and the candidate cosines
      // compute once and every point derives by prefix filter
      // (qs13's one-scan discipline on the IVF axis).
      //
      // Contracts (both provable, so the gate is strict):
      //  - recall is NONDECREASING in nprobe: candidate sets nest, and a
      //    truth member has ≤ k−1 globally-better vectors, so it enters
      //    the candidate top-k the moment its cell is probed;
      //  - recall at nprobe=K is EXACTLY 1.0: probing every cell IS the
      //    brute-force scan, so the top-k equals the qs01 truth under
      //    the same deterministic (cosine DESC, vec_id ASC) order.
      // The oracle pins the point/query counts + TRUE.
      val NQueries = 5; val K = 16; val Probes = Seq(1, 2, 4, 8, 16)
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // centroid collect + assignment + candidate cosines
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      val bc = s.sparkContext.broadcast(cents)
      def rankedCells(v: Seq[Double]): Seq[Long] =
        bc.value.map { case (cid, cv) =>
          var acc = 0.0; var i = 0
          while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
          (math.sqrt(acc), cid)
        }.sortBy(identity).map(_._2).toSeq
      val assigned = e.as[(Long, Seq[Double])]
        .map { case (id, v) => (id, v, rankedCells(v).head) }
        .toDF("vec_id", "v", "cell")
      // 5 query vectors (bounded collect) rank all K cells driver-side;
      // the K·NQueries probe table broadcasts
      val qvecs = e.filter(col("vec_id") < NQueries)
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      val probeRows = qvecs.toSeq.flatMap { case (qid, qv) =>
        rankedCells(qv).zipWithIndex.map { case (c, i) => (qid, qv, c, i + 1L) }
      }
      val probeDf = hoistNorm(
        probeRows.toDF("query_id", "qv", "cell", "probe_rank"), "qv", "qnorm")
      val scored = hoistNorm(assigned, "v", "vnorm")
        .join(broadcast(probeDf), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("probe_rank"),
          cosineHoisted.as("cosine"))
        .persist() // every curve point filters it by probe_rank prefix
      val pointsDf = Probes.map(_.toLong).toDF("m")
      val topk = graft.functions.TopKAggregator.topK(AnnTopK)
      val perPoint = scored.crossJoin(broadcast(pointsDf))
        .filter(col("probe_rank") <= col("m"))
        .groupBy(col("m"), col("query_id"))
        .agg(topk(col("cosine"), col("vec_id")).as("top"))
        .select(col("m"), col("query_id"), explode(col("top.vec_id")).as("vec_id"))
      val truth = QueryCatalog.byName("qs01_ann_topk").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val recalls = truth.crossJoin(broadcast(pointsDf))
        .join(perPoint.withColumn("hit", lit(1L)), Seq("m", "query_id", "vec_id"), "left")
        .groupBy(col("m"), col("query_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1))).as("recall"))
        .groupBy(col("m")).agg(avg(col("recall")).as("r"))
        .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap // ≤ |Probes| rows
      val curve = Probes.map(p => recalls(p.toLong))
      val monotone = curve.zip(curve.tail).forall { case (a, b) => a <= b }
      Seq((Probes.length.toLong, NQueries.toLong, monotone, curve.last == 1.0))
        .toDF("n_points", "n_queries", "recall_nondecreasing",
          "recall_exact_one_at_full_probe")
    }, Some("""
      SELECT 5::BIGINT AS n_points,
        CAST(count(*) AS BIGINT) AS n_queries,
        TRUE AS recall_nondecreasing, TRUE AS recall_exact_one_at_full_probe
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 5) q""")),

    CatalogQuery("qp20_cluster_split", (s, d) => {
      // Leakage-free split assignment — the unit of splitting is the
      // NEAR-DUP CLUSTER, not the document: every doc inherits the
      // hash-bucket split of its qd06 canonical representative, so a
      // near-dup pair can never straddle train/eval BY CONSTRUCTION
      // (both members share a representative, hence a bucket, hence a
      // split). This is the preventive counterpart to qp05 (audit) and
      // qp19 (after-the-fact repair): run the split this way and the
      // leakage those two exist to catch is structurally impossible —
      // at the cost of splitting only after the dedup plane has run.
      //
      // Scale shape: composes qd06's pointer-jumping connected
      // components through the catalog (never all-pairs); the rep
      // attach is one left join of the corpus against the (small)
      // clustered-doc table; bucket/split derivation is qp01's
      // stateless per-row hash arithmetic on the rep id — still
      // engine/partitioning/append-invariant, just keyed one level up.
      val cc = graft.pipeline.Dedup.connectedComponents(
        QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
          .select(col("id_a"), col("id_b")))
      val repBucket =
        pmod(TextOps.hash60(col("rep_id").cast("string")), lit(100))
      table(s, d, "documents").select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canonical_id"), col("doc_id")).as("rep_id"))
        .select(col("doc_id"), col("rep_id"), repBucket.as("bucket"),
          splitLabel(repBucket).as("split"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      rep AS (SELECT d.doc_id, COALESCE(cc.canonical_id, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN cc USING (doc_id)),
      b AS (SELECT doc_id, rep_id,
          CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
        FROM rep)
      SELECT doc_id, rep_id, bucket,
        CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM b ORDER BY doc_id""")),

    CatalogQuery("qp21_dedup_funnel", (s, d) => {
      // Dedup FUNNEL accounting — what each dedup plane would save,
      // in documents and tokens, side by side: 'exact' (qd01's rule:
      // non-keeper byte-identical copies), 'near' (qd06's clusters:
      // members other than the canonical representative), 'block'
      // (qd09's C4 rule: boilerplate blocks removed inside surviving
      // docs). The capacity-planning table a curation run starts from —
      // each stage measured independently on the full corpus (this is a
      // savings REPORT, not a sequential execution; qp13 is the fused
      // sequential pipeline).
      //
      // Scale shape: one token-count projection of the corpus feeds all
      // three stages; exact is a single hash agg over content digests
      // (min_by picks the keeper's token count in the same pass); near
      // composes qd06's pointer-jumping components and joins the
      // (small) cluster table; block composes qd09's hashed-block
      // accounting. Output is exactly 3 rows.
      val toks = table(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .persist() // all three stages read it
      val exact = toks.groupBy(col("h"))
        .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("tot"),
          min_by(col("n_tok"), col("doc_id")).as("keep_tok"))
        .agg(sum(col("n") - 1).as("docs"),
          sum(col("tot") - col("keep_tok")).as("toks"))
        .select(lit("exact").as("stage"),
          coalesce(col("docs"), lit(0L)).as("docs_removed"),
          coalesce(col("toks"), lit(0L)).as("tokens_removed"))
      val cc = graft.pipeline.Dedup.connectedComponents(
        QueryCatalog.byName("qd02_minhash_lsh").build(s, d)
          .select(col("id_a"), col("id_b")))
      val near = cc.filter(col("doc_id") =!= col("canonical_id"))
        .join(toks, Seq("doc_id"))
        .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("toks"))
        .select(lit("near").as("stage"),
          coalesce(col("docs"), lit(0L)).as("docs_removed"),
          coalesce(col("toks"), lit(0L)).as("tokens_removed"))
      val block = QueryCatalog.byName("qd09_block_dedup").build(s, d)
        .join(toks, Seq("doc_id"))
        .agg(sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("docs"),
          sum(col("n_tok") - col("n_tokens_kept")).as("toks"))
        .select(lit("block").as("stage"),
          coalesce(col("docs"), lit(0L)).as("docs_removed"),
          coalesce(col("toks"), lit(0L)).as("tokens_removed"))
      exact.unionByName(near).unionByName(block).orderBy(col("stage"))
    }, Some(s"""
      WITH RECURSIVE $oMinhashPairsCtes,
      edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach(id, lab) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.id),
      cc AS (SELECT id AS doc_id, min(lab) AS canonical_id
             FROM reach GROUP BY id),
      tok AS (SELECT doc_id, md5(text) AS ch,
                len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
              FROM documents),
      exg AS (SELECT ch, count(*) AS n, sum(n_tok) AS tot,
                min_by(n_tok, doc_id) AS keep_tok
              FROM tok GROUP BY ch),
      exact AS (SELECT 'exact' AS stage,
          CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS docs_removed,
          CAST(coalesce(sum(tot - keep_tok), 0) AS BIGINT) AS tokens_removed
        FROM exg),
      near AS (SELECT 'near' AS stage,
          CAST(coalesce(count(*), 0) AS BIGINT) AS docs_removed,
          CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tokens_removed
        FROM cc JOIN tok USING (doc_id) WHERE doc_id <> canonical_id),
      t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents),
      blk AS (SELECT doc_id,
          CAST(('0x' || substr(md5(array_to_string(w[u.i * $DupSpanW + 1 : u.i * $DupSpanW + $DupSpanW], ' ')), 1, 15)) AS BIGINT) AS h,
          len(w[u.i * $DupSpanW + 1 : u.i * $DupSpanW + $DupSpanW]) AS blen
        FROM t, LATERAL (SELECT unnest(range(CAST(ceil(len(w) / $DupSpanW.0) AS BIGINT))) AS i) u),
      boiler AS (SELECT h FROM blk GROUP BY h HAVING count(DISTINCT doc_id) > 1),
      perdoc AS (SELECT blk.doc_id,
          sum(CASE WHEN boiler.h IS NOT NULL THEN 1 ELSE 0 END) AS n_removed,
          sum(CASE WHEN boiler.h IS NULL THEN blk.blen ELSE 0 END) AS kept
        FROM blk LEFT JOIN boiler ON blk.h = boiler.h
        GROUP BY blk.doc_id),
      block AS (SELECT 'block' AS stage,
          CAST(coalesce(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_removed,
          CAST(coalesce(sum(n_tok - kept), 0) AS BIGINT) AS tokens_removed
        FROM perdoc JOIN tok USING (doc_id))
      SELECT * FROM exact UNION ALL SELECT * FROM near UNION ALL
      SELECT * FROM block ORDER BY stage""")),

    CatalogQuery("qe10_knn_hubness", (s, d) => {
      // kNN-graph hubness audit — the in-degree distribution of the
      // batch top-k neighbor graph (qs04's "top-3 for EVERY vector"
      // edges). High-dimensional embedding spaces concentrate: a few
      // hub vectors appear in a large fraction of neighbor lists
      // (Radovanović et al. 2010), which skews retrieval, poisons
      // qs06-style hard-negative mining (the same hubs get mined for
      // every anchor), and inflates near-dup candidate sets. The
      // histogram — including the explicit in_degree=0 anti-hub mass —
      // is the one-table screen for that pathology.
      //
      // Scale shape: composes qs04 through the catalog (keyed cell
      // equi-join, bounded top-k — never the n² score matrix); the edge
      // list is ≤ k·n rows of (query_id, vec_id) keys; in-degree is one
      // hash agg on vec_id, the anti-hub zero row comes from a left
      // join against the corpus ids, and the final histogram is a
      // second bounded agg (≤ k·n distinct degrees, in practice tens).
      val edges = QueryCatalog.byName("qs04_ann_batch").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val indeg = edges.groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      table(s, d, "embeddings").select(col("vec_id"))
        .join(indeg, Seq("vec_id"), "left")
        .select(coalesce(col("n"), lit(0L)).as("in_degree"))
        .groupBy(col("in_degree")).agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("in_degree"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored),
      indeg AS (SELECT vec_id, count(*) AS n FROM ranked WHERE rank <= 3 GROUP BY 1),
      alldeg AS (SELECT COALESCE(i.n, 0) AS in_degree
                 FROM e LEFT JOIN indeg i USING (vec_id))
      SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
      FROM alldeg GROUP BY in_degree ORDER BY in_degree""")),

    CatalogQuery("qe13_knn_label_agreement", (s, d) => {
      // kNN label-agreement — THE standard embedding-quality metric
      // (kNN classification accuracy in the embedding space): for every
      // vector's top-3 neighbors, how often does the neighbor share the
      // query's label, per label. Low agreement for one class = that
      // class is scattered (bad labels or bad space); low agreement
      // everywhere = the space doesn't encode the taxonomy at all.
      // Complements qe09 (linear separability) and qe11 (centroid
      // collisions) with the LOCAL-structure view retrieval actually
      // experiences.
      //
      // Scale shape: composes qs04's batch neighbor graph through the
      // catalog (keyed cell equi-join, bounded top-k — never n²); two
      // label attaches are keyed joins against the (vec_id, label)
      // projection; the finish is an L-row hash agg, all-integer ppm.
      val edges = QueryCatalog.byName("qs04_ann_batch").build(s, d)
        .select(col("query_id"), col("vec_id"))
      val lab = table(s, d, "embeddings").select(col("vec_id"), col("label"))
      edges
        .join(lab.select(col("vec_id").as("query_id"), col("label").as("q_label")),
          Seq("query_id"))
        .join(lab.select(col("vec_id"), col("label").as("n_label")), Seq("vec_id"))
        .groupBy(col("q_label"))
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L)).as("n_agree"))
        .select(col("q_label").as("label"), col("n_edges"),
          expr("n_agree * 1000000L div n_edges").as("agree_ppm"))
        .orderBy(col("label"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, cid AS cell FROM (
          SELECT e.vec_id, e.v, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      q AS (
        SELECT query_id, qv, cid AS cell FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn <= 4),
      scored AS (
        SELECT query_id, vec_id,
          list_dot_product(qv, v) /
            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM assigned JOIN q USING (cell) WHERE vec_id <> query_id),
      ranked AS (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored),
      edges AS (SELECT query_id, vec_id FROM ranked WHERE rank <= 3),
      lab AS (SELECT vec_id, label FROM embeddings),
      agree AS (
        SELECT ql.label AS q_label, count(*) AS n_edges,
          CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        FROM edges
        JOIN lab ql ON edges.query_id = ql.vec_id
        JOIN lab nl ON edges.vec_id = nl.vec_id
        GROUP BY ql.label)
      SELECT q_label AS label, n_edges,
        n_agree * 1000000 // n_edges AS agree_ppm
      FROM agree ORDER BY label""")),

    CatalogQuery("qe15_cell_label_purity", (s, d) => {
      // IVF-cell LABEL PURITY — does the index geometry correlate with
      // the metadata it will be filtered by? Per cell (qs02's exact
      // assignment: vec_id<16 centroids, nearest by L2, tie→lower cid):
      // occupancy, the majority label, and its ppm share. High purity
      // means label-filtered ANN (qs12) prunes almost as hard as the
      // label-partitioned artifact (qs18) and a shared index suffices;
      // low purity is the planning signal that multi-tenant serving
      // needs the (cell, label) partition layout. qs15 audits cell SIZE
      // balance; this audits cell/metadata ALIGNMENT.
      //
      // Scale shape: assignment is the broadcast-centroid map (corpus
      // never shuffles for it); the histogram is a (cell, label) hash
      // agg bounded by K·L rows, and the majority pick is a window over
      // that K·L-row table (partitioned by cell — never a global
      // window). All-integer output.
      val K = 16
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val cents: Array[(Long, Seq[Double])] = e.filter(col("vec_id") < K)
        .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
        .collect().sortBy(_._1) // K rows — bounded driver gather
      val bc = s.sparkContext.broadcast(cents)
      val assigned = e.select(col("vec_id"), col("label"), col("v"))
        .as[(Long, Int, Seq[Double])]
        .map { case (id, lab, v) =>
          var bestD = Double.MaxValue; var bestC = -1L
          bc.value.foreach { case (cid, cv) =>
            var acc = 0.0
            var i = 0
            while (i < v.length) { val dd = v(i) - cv(i); acc += dd * dd; i += 1 }
            val dist = math.sqrt(acc)
            if (dist < bestD) { bestD = dist; bestC = cid }
          }
          (id, lab, bestC)
        }.toDF("vec_id", "label", "cell")
      val hist = assigned.groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val totals = hist.groupBy(col("cell")).agg(sum(col("cnt")).as("n_vecs"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell")).orderBy(col("cnt").desc, col("label").asc)
      hist.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
        .join(totals, Seq("cell"))
        .select(col("cell"), col("n_vecs").cast("long").as("n_vecs"),
          col("label").cast("long").as("top_label"),
          expr("cnt * 1000000L div n_vecs").as("purity_ppm"))
        .orderBy(col("cell"))
    }, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, label, cid AS cell FROM (
          SELECT e.vec_id, e.label, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      hist AS (SELECT cell, label, count(*) AS cnt
               FROM assigned GROUP BY 1, 2),
      tot AS (SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_vecs
              FROM hist GROUP BY 1),
      top AS (SELECT cell, label, cnt FROM (
          SELECT cell, label, cnt,
            row_number() OVER (PARTITION BY cell
              ORDER BY cnt DESC, label ASC) rn
          FROM hist) t WHERE rn = 1)
      SELECT top.cell, tot.n_vecs,
        CAST(top.label AS BIGINT) AS top_label,
        CAST(top.cnt AS BIGINT) * 1000000 // tot.n_vecs AS purity_ppm
      FROM top JOIN tot USING (cell)
      ORDER BY top.cell""")),

    CatalogQuery("qe14_centroid_silhouette", (s, d) => {
      // Per-label centroid SILHOUETTE — the compactness/separation
      // ratio: for every vector, a = distance to its own label
      // centroid, b = distance to the nearest OTHER centroid,
      // s = (b − a) / max(a, b); the per-label mean is the classic
      // clustering-quality score read on the label structure. qe11 says
      // which centroid PAIRS collide; this says whether the vectors of
      // a label actually live nearer their own centroid than anyone
      // else's — the dispersion view centroid positions alone miss.
      //
      // Scale shape: centroids derive from per-(label, dim) decimal
      // sums (qe04's one-pass discipline) and collapse to an L-row
      // array table that BROADCASTS onto a single scoring scan — the
      // corpus never shuffles; the finish is an L-row agg. Determinism:
      // centroid means are decimal-sum/count; distances are the same
      // ordered zip_with fold both engines (the qs02 list_distance
      // contract); silhouettes quantize at 12 decimals into exact
      // decimal sums, one final double division rounded to 6.
      val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // moment pass + scoring pass
      val cent = e.select(col("label"), posexplode(col("v")))
        .select(col("label"), (col("pos") + 1).as("dim"), col("col").as("x"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("sx"))
        .select(col("label").as("c_label"), col("dim"),
          (col("sx").cast("double") / col("n")).as("m"))
        .groupBy(col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          p => p.getField("m")).as("cv"))
      val dist = sqrt(aggregate(zip_with(col("v"), col("cv"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      val scoredPerLabel = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("c_label"), dist.as("dd"))
      val perVec = scoredPerLabel.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("label") === col("c_label"), col("dd"))).as("a"),
          min(when(col("label") =!= col("c_label"), col("dd"))).as("b"))
        .select(col("label"),
          round((col("b") - col("a")) / greatest(col("a"), col("b")), 12)
            .cast(dec12).as("sil"))
      perVec.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("sil")).cast("double") / count(lit(1)), 6)
            .as("mean_silhouette"))
        .orderBy(col("label"))
    }, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT label,
          unnest([{'dim': i, 'x': v[i]} for i in range(1, len(v) + 1)]) AS u
        FROM e),
      pl AS (SELECT label, u.dim AS dim, count(*) AS n,
               sum(CAST(u.x AS DECIMAL(38,6))) AS sx
             FROM ex GROUP BY label, u.dim),
      cent AS (SELECT label AS c_label,
                 list(CAST(sx AS DOUBLE) / n ORDER BY dim) AS cv
               FROM pl GROUP BY label),
      dd AS (SELECT e.vec_id, e.label, cent.c_label,
               list_distance(e.v, cent.cv) AS dd
             FROM e CROSS JOIN cent),
      pv AS (SELECT vec_id, label,
               max(CASE WHEN label = c_label THEN dd END) AS a,
               min(CASE WHEN label <> c_label THEN dd END) AS b
             FROM dd GROUP BY vec_id, label),
      sil AS (SELECT label,
                CAST(round((b - a) / greatest(a, b), 12) AS DECIMAL(38,12)) AS sil
              FROM pv)
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        round(CAST(sum(sil) AS DOUBLE) / count(*), 6) AS mean_silhouette
      FROM sil GROUP BY label ORDER BY label""")),

    CatalogQuery("qe11_centroid_confusion", (s, d) => {
      // Label-centroid CONFUSION structure — pairwise cosine and squared
      // L2 distance between class centroids: the screen for label
      // near-collisions (two labels whose centroids nearly coincide are
      // merge candidates or label noise; qe09's Fisher ratios say
      // whether dims separate classes AT ALL, this says WHICH pairs
      // collide). The pair table is what a taxonomy cleanup acts on.
      //
      // Scale shape: qe04's discipline end to end — one corpus explode
      // into per-(label, dim) decimal sums (map-side partials), the
      // centroid table is labels × dims rows, and everything pairwise
      // happens on THAT bounded table (the dim-keyed self-join carries
      // d·L² rows, corpus-independent). Determinism: centroid means are
      // decimal-sum/count; the dot/norm summands are 12-decimal-
      // quantized so pair sums are exact decimal arithmetic; the final
      // cosine/distance are the same IEEE double ops on both engines,
      // rounded to 6.
      val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val e = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("col").cast("double").as("x"))
      val cent = e.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("sx"))
        .select(col("label"), col("dim"),
          (col("sx").cast("double") / col("n")).as("m"))
        .persist() // dot self-join + norm agg both read it
      val dots = cent.select(col("label").as("label_a"), col("dim"), col("m").as("m_a"))
        .join(cent.select(col("label").as("label_b"), col("dim"), col("m").as("m_b")),
          Seq("dim"))
        .filter(col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(col("m_a") * col("m_b"), 12).cast(dec12).as("sd"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(sum(col("sd")).cast("double").as("dot"))
      val norms = cent
        .select(col("label"), round(col("m") * col("m"), 12).cast(dec12).as("sq"))
        .groupBy(col("label")).agg(sum(col("sq")).cast("double").as("nn"))
      dots
        .join(norms.select(col("label").as("label_a"), col("nn").as("na")), Seq("label_a"))
        .join(norms.select(col("label").as("label_b"), col("nn").as("nb")), Seq("label_b"))
        .select(col("label_a"), col("label_b"),
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cosine"),
          round(col("na") + col("nb") - lit(2.0) * col("dot"), 6).as("l2_sq"))
        .orderBy(col("label_a"), col("label_b"))
    }, Some("""
      WITH e AS (SELECT label,
          unnest([{'dim': i, 'x': embedding[i]::DOUBLE}
                  for i in range(1, len(embedding) + 1)]) AS u
        FROM embeddings),
      pl AS (SELECT label, u.dim AS dim, count(*) AS n,
               sum(CAST(u.x AS DECIMAL(38,6))) AS sx
             FROM e GROUP BY label, u.dim),
      cent AS (SELECT label, dim, CAST(sx AS DOUBLE) / n AS m FROM pl),
      dots AS (SELECT a.label AS label_a, b.label AS label_b,
          CAST(sum(CAST(round(a.m * b.m, 12) AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2),
      norms AS (SELECT label,
          CAST(sum(CAST(round(m * m, 12) AS DECIMAL(38,12))) AS DOUBLE) AS nn
        FROM cent GROUP BY label)
      SELECT label_a, label_b,
        round(dot / (sqrt(x.nn) * sqrt(y.nn)), 6) AS cosine,
        round(x.nn + y.nn - 2.0 * dot, 6) AS l2_sq
      FROM dots JOIN norms x ON dots.label_a = x.label
                JOIN norms y ON dots.label_b = y.label
      ORDER BY label_a, label_b""")),

    CatalogQuery("qe12_source_shift", (s, d) => {
      // Per-SOURCE embedding drift — qe04's MMD² audit keyed by the
      // corpus metadata instead of the label: ‖μ_source − μ‖² for every
      // source, via the embeddings⋈documents identity join (vec_id ==
      // doc_id — the same id domain qs08's hybrid rank rides). This is
      // the actual pre-mix question a curation loop asks ("is this FEED
      // embedded off-distribution?") — labels are training targets,
      // sources are the operational unit you admit or drop.
      //
      // Scale shape: the metadata join is an equi-join on the id (the
      // document side projects two columns); everything after is qe04
      // verbatim — per-(source, dim) decimal sums with map-side
      // partials, the global mean derived from the SAME aggregated
      // table and broadcast back, 12-decimal-quantized squared diffs
      // into exact decimal sums.
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"),
          col("col").cast("double").as("x"))
        .join(table(s, d, "documents")
          .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
      val perSrc = e.groupBy(col("source"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("sx"))
        .persist() // global mean derives from this table, not a re-scan
      val global = perSrc.groupBy(col("dim"))
        .agg((sum(col("sx")).cast("double") / sum(col("n_vecs"))).as("gmean"))
      val diffs = perSrc
        .select(col("source"), col("dim"), col("n_vecs"),
          (col("sx").cast("double") / col("n_vecs")).as("smean"))
        .join(broadcast(global), Seq("dim"))
        .select(col("source"), col("n_vecs"),
          round((col("smean") - col("gmean")) * (col("smean") - col("gmean")), 12)
            .cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("sq"))
      diffs.groupBy(col("source"))
        .agg(max(col("n_vecs")).as("n_vecs"),
          sum(col("sq")).cast("double").as("mmd_sq"))
        .orderBy(col("source"))
    }, Some("""
      WITH j AS (SELECT d.source, e.embedding
                 FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
      ex AS (SELECT source,
          unnest([{'dim': i, 'x': embedding[i]::DOUBLE}
                  for i in range(1, len(embedding) + 1)]) AS u
        FROM j),
      ps AS (SELECT source, u.dim AS dim, count(*) AS n_vecs,
               sum(CAST(u.x AS DECIMAL(38,6))) AS sx
             FROM ex GROUP BY source, u.dim),
      g AS (SELECT dim,
              CAST(sum(sx) AS DOUBLE) / sum(n_vecs) AS gmean
            FROM ps GROUP BY dim),
      df AS (SELECT ps.source, ps.n_vecs,
               CAST(round((CAST(ps.sx AS DOUBLE) / ps.n_vecs - g.gmean)
                 * (CAST(ps.sx AS DOUBLE) / ps.n_vecs - g.gmean), 12)
                 AS DECIMAL(38,12)) AS sq
             FROM ps JOIN g USING (dim))
      SELECT source, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
        CAST(sum(sq) AS DOUBLE) AS mmd_sq
      FROM df GROUP BY source ORDER BY source""")),

    CatalogQuery("qe09_fisher_separation", (s, d) => {
      // Per-dimension Fisher class-separation audit: between-class over
      // within-class variance, F_d = Σ_l n_l(μ_ld − μ_d)² / Σ_l n_l σ²_ld
      // — the "is this embedding space linearly separable by label, and
      // along which dimensions" screen that decides whether qs06-style
      // contrastive mining or qe03 whitening is worth running, and which
      // dims qs10's Matryoshka truncation can afford to drop.
      //
      // Scale shape (qe02/qe04's discipline): ONE corpus pass collapses
      // to per-(label, dim) decimal sums with map-side partials; global
      // per-dim moments derive from that same table (no second scan);
      // per-label summands are 12-decimal-quantized so each dim's two
      // sums are exact decimal arithmetic on both engines; every mean is
      // a single double division mirrored verbatim.
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 6)
      val dec25 = org.apache.spark.sql.types.DecimalType(25, 12)
      val g = table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          col("col").cast("double").as("x"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_l"),
          sum(col("x").cast(dec38)).as("s_l"),
          sum((col("x") * col("x")).cast(dec38)).as("q_l"))
        .persist() // global moments + per-label summands both derive from it
      val glob = g.groupBy(col("dim"))
        .agg(sum(col("n_l")).as("n"), sum(col("s_l")).as("s"))
      val muL = col("s_l").cast("double") / col("n_l").cast("double")
      val mu = col("s").cast("double") / col("n").cast("double")
      g.join(glob, Seq("dim"))
        .select(col("dim"),
          round(col("n_l").cast("double") * ((muL - mu) * (muL - mu)), 12)
            .cast(dec25).as("bt"),
          round(col("n_l").cast("double") *
            (col("q_l").cast("double") / col("n_l").cast("double") - muL * muL), 12)
            .cast(dec25).as("wt"))
        .groupBy(col("dim"))
        .agg(round(sum(col("bt")).cast("double") / sum(col("wt")).cast("double"), 6)
          .as("fisher_ratio"))
        .orderBy(col("dim"))
    }, Some("""
      WITH e AS (SELECT label,
          unnest([{'dim': i, 'x': embedding[i]::DOUBLE}
                  for i in range(1, len(embedding) + 1)]) AS u
        FROM embeddings),
      g AS (SELECT label, u.dim AS dim, count(*) AS n_l,
              sum(CAST(u.x AS DECIMAL(38,6))) AS s_l,
              sum(CAST(u.x * u.x AS DECIMAL(38,6))) AS q_l
            FROM e GROUP BY label, u.dim),
      tot AS (SELECT dim, CAST(sum(n_l) AS BIGINT) AS n, sum(s_l) AS s
              FROM g GROUP BY dim),
      terms AS (SELECT g.dim,
          CAST(round(g.n_l::DOUBLE *
            ((g.s_l::DOUBLE / g.n_l::DOUBLE - tot.s::DOUBLE / tot.n::DOUBLE) *
             (g.s_l::DOUBLE / g.n_l::DOUBLE - tot.s::DOUBLE / tot.n::DOUBLE)), 12)
            AS DECIMAL(25,12)) AS bt,
          CAST(round(g.n_l::DOUBLE *
            (g.q_l::DOUBLE / g.n_l::DOUBLE -
             (g.s_l::DOUBLE / g.n_l::DOUBLE) * (g.s_l::DOUBLE / g.n_l::DOUBLE)), 12)
            AS DECIMAL(25,12)) AS wt
        FROM g JOIN tot USING (dim))
      SELECT dim, round(CAST(sum(bt) AS DOUBLE) / CAST(sum(wt) AS DOUBLE), 6)
        AS fisher_ratio
      FROM terms GROUP BY dim ORDER BY dim""")),

    CatalogQuery("qm04_audio_features", (s, d) => {
      // Audio feature extraction THROUGH THE REAL WAV CODEC — the third
      // leg of the multimodal certification trio (qm02 image, qm03
      // video): each doc's first 64 codepoints become centered 16-bit PCM
      // samples ((cp − 128) · 256), round-tripped through
      // `MediaCodecs.encodeWav` + `decodeWav` (RIFF header, fmt/data
      // chunk walking, little-endian sample parsing) before the features
      // — zero-crossing count, total and peak absolute amplitude — are
      // computed from the DECODED samples. The oracle re-derives every
      // feature from the codepoints, so any corruption in chunk layout,
      // byte order, or sign handling breaks the gate. All-integer
      // features: no float surface at all.
      //
      // Scale shape: one batched mapPartitions kernel pass, five ints
      // per doc out. Codepoint indexing follows qm02's discipline
      // (character-indexed, never UTF-16 units).
      import s.implicits._
      table(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val samples = new Array[Short](64)
            var i = 0; var off = 0
            while (i < 64 && off < text.length) {
              val cp = text.codePointAt(off)
              samples(i) = ((math.min(cp, 255) - 128) * 256).toShort
              off += Character.charCount(cp)
              i += 1
            }
            while (i < 64) { samples(i) = ((' ' - 128) * 256).toShort; i += 1 }
            val audio = graft.pipeline.MediaCodecs.decodeWav(
              graft.pipeline.MediaCodecs.encodeWav(
                graft.pipeline.MediaCodecs.RawAudio(8000, 1, samples)))
            require(audio.sampleRate == 8000 && audio.channels == 1,
              "WAV round-trip corrupted the format header")
            val ss = audio.samples
            var zc = 0L; var sumAbs = 0L; var maxAbs = 0L
            var j = 0
            while (j < ss.length) {
              val v = ss(j).toLong
              val a = math.abs(v)
              sumAbs += a
              if (a > maxAbs) maxAbs = a
              if (j > 0 && ((ss(j - 1) >= 0) != (v >= 0))) zc += 1
              j += 1
            }
            (id, ss.length.toLong, zc, sumAbs, maxAbs)
          }
        }.toDF("doc_id", "n_samples", "zero_crossings", "sum_abs", "max_abs")
        .orderBy(col("doc_id"))
    }, Some("""
      WITH px AS (SELECT doc_id, i,
               CASE WHEN i <= length(text) THEN least(ascii(substr(text, i, 1)), 255)
                    ELSE 32 END AS p
             FROM documents, (SELECT unnest(range(1, 65)) AS i) ix),
      smp AS (SELECT doc_id, i, (p - 128) * 256 AS s FROM px),
      agg AS (SELECT doc_id, count(*) AS n_samples,
                CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
                CAST(max(abs(s)) AS BIGINT) AS max_abs
              FROM smp GROUP BY 1),
      zc AS (SELECT a.doc_id, count(*) AS zc
             FROM smp a JOIN smp b ON a.doc_id = b.doc_id AND b.i = a.i + 1
             WHERE (a.s >= 0) <> (b.s >= 0) GROUP BY 1)
      SELECT agg.doc_id, agg.n_samples,
        CAST(coalesce(zc.zc, 0) AS BIGINT) AS zero_crossings,
        agg.sum_abs, agg.max_abs
      FROM agg LEFT JOIN zc USING (doc_id) ORDER BY agg.doc_id""")),

    CatalogQuery("qm07_audio_dup", (s, d) => {
      // Audio-plane dedup through the REAL WAV codec — the missing leg of
      // the multimodal dedup triad (qm05 image, qm06 video): qm04's
      // synthesis (64 centered 16-bit PCM samples from the first 64
      // codepoints, encodeWav→decodeWav round trip) feeds a 31-bit
      // energy-CONTOUR fingerprint — frame f = 2 samples, bit f−1 set iff
      // E_f > E_{f−1} — the gain-robust compact id an audio pipeline
      // groups re-uploads by (chromaprint's contour shape, minus the FFT
      // an integer-exact oracle can't mirror; comparing energy ORDER not
      // magnitude means re-encoded/rescaled copies of the same clip still
      // collide). Output: each doc's fingerprint and how many other docs
      // share it. All-integer end to end.
      //
      // Scale shape: one batched mapPartitions kernel pass emits one
      // (doc_id, fingerprint) row per doc — qd01's exact-dedup row class
      // on the audio axis; partner counts are a hash agg on the
      // fingerprint plus one keyed join back (AQE broadcasts the small
      // class table). Never any pair expansion — hot fingerprint classes
      // cost their class size, not size².
      import s.implicits._
      val fps = table(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val samples = new Array[Short](64)
            var i = 0; var off = 0
            while (i < 64 && off < text.length) {
              val cp = text.codePointAt(off)
              samples(i) = ((math.min(cp, 255) - 128) * 256).toShort
              off += Character.charCount(cp)
              i += 1
            }
            while (i < 64) { samples(i) = ((' ' - 128) * 256).toShort; i += 1 }
            val audio = graft.pipeline.MediaCodecs.decodeWav(
              graft.pipeline.MediaCodecs.encodeWav(
                graft.pipeline.MediaCodecs.RawAudio(8000, 1, samples)))
            require(audio.sampleRate == 8000 && audio.channels == 1,
              "WAV round-trip corrupted the format header")
            val ss = audio.samples
            val e = new Array[Long](32)
            var f = 0
            while (f < 32) {
              val a = ss(2 * f).toLong; val b = ss(2 * f + 1).toLong
              e(f) = a * a + b * b
              f += 1
            }
            var fp = 0L
            f = 1
            while (f < 32) {
              if (e(f) > e(f - 1)) fp |= 1L << (f - 1)
              f += 1
            }
            (id, fp)
          }
        }.toDF("doc_id", "fingerprint")
      val classes = fps.groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n"))
      fps.join(classes, Seq("fingerprint"))
        .select(col("doc_id"), col("fingerprint"),
          (col("n") - 1L).as("n_partners"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH px AS (SELECT doc_id, i,
               CASE WHEN i <= length(text) THEN least(ascii(substr(text, i, 1)), 255)
                    ELSE 32 END AS p
             FROM documents, (SELECT unnest(range(1, 65)) AS i) ix),
      smp AS (SELECT doc_id, i, (p - 128) * 256 AS s FROM px),
      en AS (SELECT doc_id, CAST((i - 1) // 2 AS INTEGER) AS f,
               CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS e
             FROM smp GROUP BY 1, 2),
      bits AS (SELECT a.doc_id,
          CAST(coalesce(sum(CASE WHEN a.e > b.e
            THEN CAST(1 AS BIGINT) << (a.f - 1) ELSE 0 END), 0) AS BIGINT) AS fingerprint
        FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f - 1
        GROUP BY 1),
      cls AS (SELECT fingerprint, count(*) AS n FROM bits GROUP BY 1)
      SELECT b.doc_id, b.fingerprint,
        CAST(cls.n - 1 AS BIGINT) AS n_partners
      FROM bits b JOIN cls USING (fingerprint)
      ORDER BY b.doc_id""")),

    CatalogQuery("qp18_mixture_plan", (s, d) => {
      // Token-budget mixture planning: qp06 decides per-language KEEP
      // probabilities; this produces the complementary per-source
      // TRAINING plan for a fixed token budget — temperature-weighted
      // share (α = 0.5, qp06's integer-quantized floor∘sqrt weights),
      // planned token draw, repeat factor, and epoch count (how many
      // passes over a small source the sampler makes — the "rare source
      // seen 4×" number in every LLM data recipe).
      //
      // Scale shape: one corpus scan collapses to an S-row (source,
      // token-count) table; everything downstream is integer arithmetic
      // on S rows with the weight total broadcast back. Exactness: all
      // quantities are BIGINT floor-division chains (no float surface
      // except the IEEE sqrt both engines round identically, qp06's
      // convention).
      val B = 10000000L // planned token budget
      val tok = table(s, d, "documents")
        .select(col("source"), size(TextOps.tokens(col("text"))).as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("n_tok"))
      val w = tok.select(col("source"), col("n_tok"),
        floor(sqrt(col("n_tok"))).cast("long").as("w"))
      val tw = w.agg(sum(col("w")).cast("long").as("tw"))
      w.crossJoin(broadcast(tw))
        .withColumn("share_ppm", expr("(w * 1000000L) div tw"))
        .withColumn("planned_tokens", expr(s"(share_ppm * ${B}L) div 1000000L"))
        .withColumn("repeat_ppm", expr("(planned_tokens * 1000000L) div n_tok"))
        .withColumn("n_epochs", expr("(planned_tokens + n_tok - 1L) div n_tok"))
        .select(col("source"), col("n_tok"), col("w"), col("share_ppm"),
          col("planned_tokens"), col("repeat_ppm"), col("n_epochs"))
        .orderBy(col("source"))
    }, Some("""
      WITH tok AS (SELECT source,
          CAST(sum(length(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tok
        FROM documents GROUP BY 1),
      w AS (SELECT source, n_tok,
              CAST(floor(sqrt(n_tok::DOUBLE)) AS BIGINT) AS w FROM tok),
      tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
      SELECT source, n_tok, w.w AS w,
        (w.w * 1000000) // tw.tw AS share_ppm,
        ((w.w * 1000000) // tw.tw * 10000000) // 1000000 AS planned_tokens,
        (((w.w * 1000000) // tw.tw * 10000000) // 1000000 * 1000000) // n_tok AS repeat_ppm,
        ((((w.w * 1000000) // tw.tw * 10000000) // 1000000) + n_tok - 1) // n_tok AS n_epochs
      FROM w, tw ORDER BY source""")),

    CatalogQuery("qm03_video_framehash", (s, d) => {
      // Video fingerprinting THROUGH THE REAL image2pipe DECODE PATH:
      // each doc's codepoints become 1–4 genuine 8×8 PGM frames,
      // concatenated exactly as `ffmpeg -f image2pipe` emits them, then
      // round-tripped through `MediaCodecs.encodeNetpbm` +
      // `decodeNetpbmStream` — the multimodal plumbing's actual video
      // framing — before per-frame aHashes are computed from the DECODED
      // pixels. The oracle computes the same hashes directly from the
      // text codepoints, so any corruption in multi-frame framing, header
      // emission, or stream offset bookkeeping breaks the gate (qm02's
      // end-to-end certification, one container level up). The distinct-
      // frame-hash count is the static-video detector (slideshow/still
      // content has n_distinct ≪ n_frames); banding the per-frame hash
      // words Hamming-LSH-style (qd02's geometry) is the near-dup scale
      // path.
      //
      // Scale shape: one batched mapPartitions kernel pass (no UDF
      // registry), all integer arithmetic, output is five ints per doc.
      // Frame count derives from the CODEPOINT count (Java string length
      // is UTF-16 units; the oracle's length(text) is codepoints — qm02's
      // indexing discipline).
      import s.implicits._
      val MaxFrames = 4
      table(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val cp = text.codePointCount(0, text.length)
            val nf = math.min(MaxFrames, math.max(1, (cp + 63) / 64))
            // saturate codepoints to bytes, space-pad to nf full frames
            val px = new Array[Byte](nf * 64)
            java.util.Arrays.fill(px, ' '.toByte)
            var i = 0; var off = 0
            while (i < nf * 64 && off < text.length) {
              val c = text.codePointAt(off)
              px(i) = math.min(c, 255).toByte
              off += Character.charCount(c)
              i += 1
            }
            val stream = (0 until nf).flatMap { f =>
              graft.pipeline.MediaCodecs.encodeNetpbm(
                graft.pipeline.MediaCodecs.RawImage(8, 8, 1,
                  java.util.Arrays.copyOfRange(px, f * 64, (f + 1) * 64)))
            }.toArray
            val frames = graft.pipeline.MediaCodecs.decodeNetpbmStream(stream)
            require(frames.length == nf, s"frame loss: ${frames.length} != $nf")
            val hashes = frames.map { img =>
              var tot = 0L; var j = 0
              while (j < 64) { tot += img.lumAt(j); j += 1 }
              var lo = 0L; var hi = 0L
              j = 0
              while (j < 64) {
                if (img.lumAt(j) * 64L > tot) {
                  if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
                }
                j += 1
              }
              (hi, lo)
            }
            (id, nf.toLong, hashes.distinct.length.toLong, hashes.head._1, hashes.head._2)
          }
        }.toDF("doc_id", "n_frames", "n_distinct_frames", "f0_hi", "f0_lo")
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (SELECT doc_id,
               least(greatest((length(text) + 63) // 64, 1), 4) AS nf
             FROM documents),
      px AS (SELECT d.doc_id, (i - 1) // 64 AS frame, (i - 1) % 64 AS j,
               CASE WHEN i <= length(d.text)
                    THEN least(ascii(substr(d.text, i, 1)), 255) ELSE 32 END AS p
             FROM documents d JOIN f USING (doc_id),
               (SELECT unnest(range(1, 257)) AS i) ix
             WHERE i <= f.nf * 64),
      tot AS (SELECT doc_id, frame, sum(p) AS tot FROM px GROUP BY 1, 2),
      h AS (SELECT px.doc_id, px.frame,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.j >= 32
                THEN 1::BIGINT << (px.j - 32) ELSE 0 END) AS BIGINT) AS hi,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.j < 32
                THEN 1::BIGINT << px.j ELSE 0 END) AS BIGINT) AS lo
            FROM px JOIN tot USING (doc_id, frame) GROUP BY 1, 2)
      SELECT f.doc_id, CAST(f.nf AS BIGINT) AS n_frames,
        CAST(count(DISTINCT (h.hi, h.lo)) AS BIGINT) AS n_distinct_frames,
        CAST(max(CASE WHEN h.frame = 0 THEN h.hi END) AS BIGINT) AS f0_hi,
        CAST(max(CASE WHEN h.frame = 0 THEN h.lo END) AS BIGINT) AS f0_lo
      FROM f JOIN h USING (doc_id) GROUP BY f.doc_id, f.nf
      ORDER BY f.doc_id""")),

    CatalogQuery("qm06_video_shared_frames", (s, d) => {
      // Shot-level video dedup — per doc, how many of its DISTINCT frame
      // hashes also occur in some other document (shared scenes:
      // re-uploads with new intros, clip compilations, mirrored footage
      // — the standard frame-fingerprint dedup unit). Frames come
      // through qm03's REAL image2pipe decode path (encode → stream
      // decode → aHash of decoded pixels), so this also extends the
      // codec certification to a second consumer.
      //
      // Scale shape: qd08's hashed-row class on the video plane — each
      // doc contributes ≤ 4 (doc_id, hi, lo) rows, the shared-hash set
      // is a hash aggregation, and the count-back join keys by the
      // frame hash; per-DOC output (not pairs), so hot blank-frame
      // classes cost their posting count, never m² pair rows.
      import s.implicits._
      val MaxFrames = 4
      val frames = table(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, text) =>
            val cp = text.codePointCount(0, text.length)
            val nf = math.min(MaxFrames, math.max(1, (cp + 63) / 64))
            val px = new Array[Byte](nf * 64)
            java.util.Arrays.fill(px, ' '.toByte)
            var i = 0; var off = 0
            while (i < nf * 64 && off < text.length) {
              val c = text.codePointAt(off)
              px(i) = math.min(c, 255).toByte
              off += Character.charCount(c)
              i += 1
            }
            val stream = (0 until nf).flatMap { f =>
              graft.pipeline.MediaCodecs.encodeNetpbm(
                graft.pipeline.MediaCodecs.RawImage(8, 8, 1,
                  java.util.Arrays.copyOfRange(px, f * 64, (f + 1) * 64)))
            }.toArray
            val decoded = graft.pipeline.MediaCodecs.decodeNetpbmStream(stream)
            require(decoded.length == nf, s"frame loss: ${decoded.length} != $nf")
            decoded.map { img =>
              var tot = 0L; var j = 0
              while (j < 64) { tot += img.lumAt(j); j += 1 }
              var lo = 0L; var hi = 0L
              j = 0
              while (j < 64) {
                if (img.lumAt(j) * 64L > tot) {
                  if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
                }
                j += 1
              }
              (id, hi, lo)
            }
          }
        }.toDF("doc_id", "hi", "lo")
        .distinct() // DISTINCT frame hashes per doc — the dedup unit
        .persist() // shared-set agg + count-back join + per-doc base
      val dup = frames.groupBy(col("hi"), col("lo"))
        .agg(count(lit(1)).as("nd")).filter(col("nd") > 1)
        .select(col("hi"), col("lo"))
      val base = frames.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frame_hashes"))
      frames.join(dup, Seq("hi", "lo"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_frames"))
        .join(base, Seq("doc_id"))
        .select(col("doc_id"), col("n_frame_hashes"), col("n_shared_frames"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (SELECT doc_id,
               least(greatest((length(text) + 63) // 64, 1), 4) AS nf
             FROM documents),
      px AS (SELECT d.doc_id, (i - 1) // 64 AS frame, (i - 1) % 64 AS j,
               CASE WHEN i <= length(d.text)
                    THEN least(ascii(substr(d.text, i, 1)), 255) ELSE 32 END AS p
             FROM documents d JOIN f USING (doc_id),
               (SELECT unnest(range(1, 257)) AS i) ix
             WHERE i <= f.nf * 64),
      tot AS (SELECT doc_id, frame, sum(p) AS tot FROM px GROUP BY 1, 2),
      h AS (SELECT px.doc_id, px.frame,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.j >= 32
                THEN 1::BIGINT << (px.j - 32) ELSE 0 END) AS BIGINT) AS hi,
              CAST(sum(CASE WHEN px.p * 64 > tot.tot AND px.j < 32
                THEN 1::BIGINT << px.j ELSE 0 END) AS BIGINT) AS lo
            FROM px JOIN tot USING (doc_id, frame) GROUP BY 1, 2),
      hd AS (SELECT DISTINCT doc_id, hi, lo FROM h),
      dup AS (SELECT hi, lo FROM hd GROUP BY hi, lo HAVING count(*) > 1),
      base AS (SELECT doc_id, count(*) AS n_frame_hashes FROM hd GROUP BY doc_id)
      SELECT hd.doc_id, CAST(max(base.n_frame_hashes) AS BIGINT) AS n_frame_hashes,
        CAST(count(*) AS BIGINT) AS n_shared_frames
      FROM hd JOIN dup USING (hi, lo) JOIN base ON hd.doc_id = base.doc_id
      GROUP BY hd.doc_id ORDER BY hd.doc_id""")),

    CatalogQuery("qs15_index_balance", (s, d) => {
      // IVF posting-list balance audit — the operational health check on
      // every inverted-file index this engine builds (qs02/qs04/qs12/qs14,
      // IvfIndexStore): per-cell posting count and corpus share. A skewed
      // histogram means hot cells (probe latency ∝ largest visited cell)
      // and starved ones (wasted centroids); empty cells surface here as
      // explicit zero rows. This table is what decides K/centroid retrain
      // cadence in production — the index-plane twin of qd14's "how bad is
      // it, in what shape" summary.
      //
      // Scale shape: assignment is the broadcast-centroid map (corpus
      // never shuffles for it), the histogram is one K-row hash agg, and
      // the total is a single-row aggregate broadcast back — nothing
      // corpus-sized moves. Shares qs02's deterministic geometry
      // (vec_id<K centroids, nearest by sqrt'd L2, tie→lower cid) so the
      // oracle mirrors the assignment exactly; KMeans-trained centroids
      // slot in unchanged. share_ppm is a BIGINT floor-division chain
      // (qp18's convention — exact on both engines).
      val K = 16
      import s.implicits._
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .persist() // centroid collect + assignment scan + total count
      val cents: Array[Array[Double]] = e.filter(col("vec_id") < K)
        .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
      val bc = s.sparkContext.broadcast(cents)
      val assigned = e.as[(Long, Seq[Double])].map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var acc = 0.0; var i = 0
          while (i < v.length) { val dd = v(i) - cs(c)(i); acc += dd * dd; i += 1 }
          val dist = math.sqrt(acc) // sqrt'd like DuckDB list_distance
          if (dist < bestD) { bestD = dist; best = c } // strict <: lowest cid wins ties
          c += 1
        }
        (id, best.toLong)
      }.toDF("vec_id", "cell")
      val counts = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val total = e.agg(count(lit(1)).as("total"))
      s.range(K).toDF("cell")
        .join(counts, Seq("cell"), "left")
        .crossJoin(broadcast(total))
        .select(col("cell"), coalesce(col("n"), lit(0L)).as("n_vecs"),
          expr("coalesce(n, 0L) * 1000000L div total").as("share_ppm"))
        .orderBy(col("cell"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT e.vec_id, cent.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_distance(e.v, cent.cv) ASC, cent.cid ASC) rn
          FROM e CROSS JOIN cent) t WHERE rn = 1),
      counts AS (SELECT cell, count(*) AS n FROM assigned GROUP BY 1),
      total AS (SELECT count(*) AS total FROM e)
      SELECT r.cell, COALESCE(c.n, 0) AS n_vecs,
        COALESCE(c.n, 0) * 1000000 // total AS share_ppm
      FROM (SELECT unnest(range(0, 16)) AS cell) r
      LEFT JOIN counts c USING (cell), total
      ORDER BY cell"""))
  )
}
