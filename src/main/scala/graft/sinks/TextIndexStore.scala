package graft.sinks

import org.apache.hadoop.fs.Path

import graft.pipeline.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted TEXT index — the sparse-retrieval twin of
  * [[IvfIndexStore]]: build the posting lists once, serve keyword (BM25)
  * queries and exact phrase queries ([[queryPhrase]] — postings are
  * positional) many times without ever re-tokenizing or re-scanning the
  * corpus text.
  *
  * Layout under `path` (epoched components via [[ArtifactStore]] — all
  * metadata I/O through the Hadoop `FileSystem` API):
  * {{{
  *   manifest.json                      {"buckets":B}
  *   postings/bucket=K/<parts>.parquet  (token, doc_id, tf, dl, pos) per bucket
  *   doclens/dbucket=K/<parts>.parquet  (doc_id, dl, batch_id) per id-hash bucket
  *   stats/base.json + batch-N.json     corpus stats, one file per contribution
  *   tombstones/                        parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING               ArtifactStore commit/guard markers
  *   _clean-N                           clean-store marker ([[ArtifactStore.isClean]])
  * }}}
  *
  * Postings are partitioned by `bucket = hash60(token) mod B`, and
  * [[queryBm25]] filters on the query terms' bucket set, so the parquet
  * reader opens only ≤ |terms| of the B bucket directories — PARTITION
  * PRUNING on the token axis, the same serve-time property IvfIndexStore
  * pins on the cell axis (spec-asserted via the scan's PartitionFilters).
  * Document frequencies need no side table: a term's df is the row count
  * of its own (pruned) posting list, so serving derives df from exactly
  * the slice it already reads.
  *
  * Corpus stats (N, Σdl) are BASE + PER-BATCH increments: build writes
  * `stats/base.json`, every append writes (OVERWRITES, so a replayed
  * batch can never double-count) `stats/batch-<id>.json`, and serving
  * sums the directory. Compaction folds the batch files into an adjusted
  * base and RECORDS THE FOLDED-BATCH WATERMARK (max absorbed id; ids are
  * monotone per checkpoint) in it: a batch replayed AFTER a compact that
  * absorbed it (crash before the stream's checkpoint commit) re-creates
  * its batch file, but [[readMeta]] ignores stats files at or below the
  * watermark — the idempotent-replay invariant survives compaction at
  * O(1) manifest size however long the index streams. Replayed
  * posting/doclen rows are absorbed by serve-time dedup/distinct as
  * always.
  *
  * Scoring follows qt12's conventions exactly (Okapi BM25, Lucene's +1
  * idf, constants pre-folded, per-term scores 6-decimal-quantized so the
  * per-doc sum is exact decimal arithmetic): the served ranking is
  * gate-checked against qt12's DuckDB oracle verbatim.
  */
object TextIndexStore {

  /** Operational health snapshot ([[ArtifactStore.health]]): epoch,
    * clean/compacting flags, pending tombstones, and per-component
    * file/byte/leaf-partition footprints of the live epoch — the
    * when-to-compact observability table for deploys on their own
    * maintenance cadence (immutable unepoched components are excluded;
    * they never grow). */
  def health(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    // a scoped store's labelstats plane is a fourth epoched component —
    // its footprint belongs in the when-to-compact table too. A missing
    // or unreadable manifest (a build that crashed before the manifest
    // write) degrades to the unscoped component list instead of throwing:
    // observability is most wanted exactly on damaged stores
    val scoped =
      try manifestMetaText(ArtifactStore.open(spark, path)).nonEmpty
      catch { case scala.util.control.NonFatal(_) => false }
    ArtifactStore.health(spark, path,
      if (scoped) Components :+ "labelstats" else Components)
  }


  private val Components = Seq("postings", "doclens", "stats")

  /** Build the index: ONE tokenize pass over the corpus feeds postings,
    * the doc-length map, and the corpus stats (tokenization dominates the
    * build at scale — the per-doc token arrays persist across the three
    * writes instead of being recomputed per component; MEMORY_AND_DISK,
    * so an over-memory corpus spills rather than re-tokenizes).
    * `docs` must have (doc_id: bigint, text: string). */
  def build(docs: DataFrame, buckets: Int, path: String,
      metaCol: Option[String] = None): Unit = {
    require(buckets > 0)
    ArtifactStore.requireValidMetaCol(metaCol)
    val ctx = ArtifactStore.open(docs.sparkSession, path)
    ArtifactStore.assertNotCompacting(ctx)
    // widen the scan before the tokenize pass (the CPU-heavy per-row
    // stage every downstream plane reads): an under-split corpus
    // otherwise tokenizes near-serially — identity at production splits
    val toks = tokenized(graft.core.Parallelism.widen(docs), metaCol).persist()
    try {
      // a scoped build requires a TOTAL label assignment (the graph
      // store's discipline): a null label would land in a null partition
      // directory and fall out of every per-label stat key — fail loudly
      // on the driver before any write, and BEFORE revoking the clean
      // certificate (the validation is write-free; a rejected rebuild
      // must not downgrade an intact certified-clean store to dirty-fold
      // serving — r15 review finding)
      metaCol.foreach { m =>
        require(toks.filter(col("meta").isNull).isEmpty,
          s"metaCol '$m' has NULL values; a scoped text index needs every " +
            "row labelled — filter or fill nulls before build")
      }
      // a rebuild-in-place must not leave the OLD epoch's clean marker
      // certifying half-overwritten planes ([[ArtifactStore]]'s marker
      // ordering): drop it before the first write, re-create it last
      ArtifactStore.revokeClean(ctx)
      writePostings(toks, buckets, ctx.dir("postings"), "overwrite",
        scoped = metaCol.nonEmpty)
      writeDoclens(toks, buckets, ctx.dir("doclens"), "overwrite",
        batchId = -1L, scoped = metaCol.nonEmpty)
      metaCol.foreach { _ =>
        writeLabelStats(toks, ctx.dir("labelstats"), "overwrite", batchId = -1L)
      }
      // "positional":1 records the posting FORMAT (r12+: rows carry the
      // pos array): the phrase/proximity serve paths require it loudly
      // (a pre-positional store's declared-schema read yields pos = null,
      // which would silently serve zero matches), and appends into a
      // pre-positional store are refused before they mix schemas.
      // "scopedtext":1 records the SCOPED layout ((bucket, meta)
      // postings + labelstats plane) the same way — the filtered serve
      // paths require it loudly, and appends must carry the meta column
      val metaJson = metaCol
        .map(m => s""","meta":"$m","scopedtext":1""").getOrElse("")
      ArtifactStore.writeString(ctx.fs, new Path(path, "manifest.json"),
        s"""{"buckets":$buckets,"positional":1$metaJson}""")
      // the mutation plane resets LAST, after every data write has
      // succeeded: old tombstones must not delete fresh docs reusing an
      // id, and stale per-batch stats files must not double-count on top
      // of the fresh base — but a build that fails validation (or
      // crashes mid-write) must leave the delete plane and the old stats
      // intact. The stale batch files are swept file-by-file (never the
      // whole stats dir), so no crash point leaves the store with ZERO
      // stats; the worst crash outcome is the pre-r9 one — stale stats
      // until the rebuild is re-run.
      ArtifactStore.resetMutationPlane(ctx)
      batchIds(ctx).foreach { id =>
        ctx.fs.delete(new Path(ctx.dir("stats"), s"batch-$id.json"), false)
      }
      writeStats(toks, ctx, "base.json", foldedUpto = Some(-1L))
      // a fresh build IS its own serve view — one (token, doc_id) posting
      // row, one doclen row per doc, base-only stats, no tombstones —
      // certified only now, after every write (a crashed build leaves no
      // marker and the serve-time fold runs)
      ArtifactStore.certifyClean(ctx)
    } finally toks.unpersist()
  }

  /** Append one batch of new documents to an EXISTING index: postings
    * append into the same bucket layout (bucket geometry is fixed at
    * build time), and the batch's corpus-stat increments land in a
    * batch-keyed stats file. `batchId`s MUST be monotone increasing per
    * store (Structured Streaming's epoch ids satisfy this; manual
    * callers must too): compaction records the max absorbed id as a
    * watermark, and any batch file at or below it is treated as a
    * replay of an absorbed batch and ignored — a genuinely NEW batch
    * reusing a low id would have its stats silently discarded. Under
    * `foreachBatch` retries a batch may run twice (at-least-once): the
    * stats file is OVERWRITTEN by batch id (idempotent — the increment
    * can never double-count, even when the replay lands after a compact
    * folded the batch: the watermark keeps the re-created file inert),
    * and [[queryBm25]] absorbs replayed posting rows by deduplicating
    * the probed slice on (token, doc_id) — replays are byte-identical,
    * so serving stays exactly-once (spec-pinned). Refused loudly while
    * a compaction folds. */
  def appendBatch(batch: DataFrame, path: String, batchId: Long,
      compactFactor: Int = 8): Unit = {
    val spark = batch.sparkSession
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val (buckets, _, _) = readMeta(ctx)
    // appended rows are positional: writing them into a store whose
    // existing postings lack the pos column would mix schemas (compact's
    // declared-pos read then throws far from the cause) — refuse here
    requirePositional(ctx, "appendBatch")
    // a metadata-scoped store's postings live under (bucket, meta) and
    // its labelstats plane keys on the label — the append must carry the
    // same column (loudly) and keep the total-labelling invariant
    val metaName = manifestMetaText(ctx)
    metaName.foreach { m =>
      require(batch.columns.contains(m),
        s"store at $path is metadata-scoped on '$m'; the append batch " +
          "must carry that column (appending without it would corrupt " +
          "the (bucket, meta) partition layout)")
    }
    val toks = tokenized(batch, metaName).persist() // one tokenize pass per batch
    try {
      metaName.foreach { m =>
        require(toks.filter(col("meta").isNull).isEmpty,
          s"metaCol '$m' has NULL values in the append batch; a scoped " +
            "text index needs every row labelled")
      }
      // appended rows may duplicate stored ones (at-least-once replays):
      // revoke the clean certificate BEFORE the first write
      // ([[ArtifactStore]]'s marker ordering) — even an inert post-compact
      // replay (batch id at or below the watermark) revokes, conservative
      ArtifactStore.revokeClean(ctx)
      writePostings(toks, buckets, ctx.dir("postings"), "append",
        scoped = metaName.nonEmpty)
      writeDoclens(toks, buckets, ctx.dir("doclens"), "append", batchId,
        scoped = metaName.nonEmpty)
      metaName.foreach { _ =>
        // replays re-append byte-identical rows; the serve-time
        // distinct() absorbs them, and the watermark keeps post-compact
        // replays inert — the labelstats twin of the stats-file rules
        writeLabelStats(toks, ctx.dir("labelstats"), "append", batchId)
      }
      writeStats(toks, ctx, s"batch-$batchId.json", foldedUpto = None)
    } finally toks.unpersist()
    // PRESSURE VALVE (the shared appendStream discipline): this store's
    // unbounded append footprint is the UNFOLDED per-batch stats files —
    // every serve re-reads and re-sums each one (and the posting/doclen
    // buckets gain a file per touching batch at the same rate), until
    // compact folds them into base.json behind the watermark. The count
    // is one O(#files) listing of the stats dir the serve path already
    // pays; compactFactor = 0 disables.
    if (compactFactor > 0) {
      val upto = foldedUpto(ctx)
      if (batchIds(ctx).count(_ > upto) > compactFactor) compact(spark, path)
    }
  }

  /** Delete documents from the index by TOMBSTONE — O(|ids|) whatever the
    * index size ([[IvfIndexStore.delete]]'s contract on the token axis):
    * tombstones append; [[queryBm25]] folds them in by anti-joining the
    * probed posting slice (df shrinks with it, since df derives from the
    * pruned slice) and subtracting the deleted docs' (count, Σdl) from
    * the corpus stats via the doc-length map, pruned to the tombstoned
    * ids' hash buckets — serving cost scales with the takedown list, not
    * the corpus. Doc-length rows are keyed by batch id, so a replayed
    * append (same batch id, idempotent in stats) subtracts once while a
    * genuine re-append (new batch id, stats counted again) subtracts per
    * contribution — the adjustment always mirrors what the stats files
    * actually accumulated. Repeated deletes are absorbed; a re-appended
    * tombstoned doc stays deleted. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones and replayed appends into the store
    * ([[IvfIndexStore.compact]]'s contract on the token axis): rewrite
    * postings without the deleted docs (duplicate (token, doc_id) rows
    * collapsed), rewrite the doc-length map without them (batch-id rows
    * kept distinct — a doc appended twice still counts twice, matching
    * the stats), fold the stats directory into a single adjusted base
    * file that remembers which batch ids it absorbed, and retire the
    * tombstone set. Serving is identical before and after (spec-pinned).
    * All three components stage at epoch+1 and commit via ONE atomic
    * marker create, so a crash at any point leaves the live view fully
    * pre- or fully post-compact — no window where doclens are swapped
    * but stats aren't (which would serve every score wrong), and no
    * window with zero stats files. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    val metaName = manifestMetaText(ctx)
    // a scoped store's labelstats plane is a fourth epoched component —
    // staged and committed behind the SAME atomic marker, so no crash
    // point leaves per-label stats from one epoch serving another's
    // postings
    val names =
      if (metaName.nonEmpty) Components :+ "labelstats" else Components
    ArtifactStore.beginCompact(ctx, names)
    val (_, n0, sumdl0) = readMeta(ctx)
    // replayed appends fold even when NO tombstones exist — the posting
    // and doclen dedups below are exactly what serving pays per query
    // until compact buys them back, and the stats fold collapses the
    // batch-file directory either way
    val tombOpt = ArtifactStore.readTombstones(spark, ctx)
    val scopedCols = if (metaName.nonEmpty) Seq(col("meta")) else Nil
    val liveLens = spark.read.parquet(ctx.dir("doclens"))
      .select(Seq(col("doc_id"), col("dl"), col("batch_id"),
        col("dbucket")) ++ scopedCols: _*)
      .distinct() // absorbs replayed appends (stats counted those once)
    val livePostings = spark.read.parquet(ctx.dir("postings"))
      .dropDuplicates("token", "doc_id")
      .select(Seq(col("token"), col("doc_id"), col("tf"), col("dl"), col("pos"),
        col("bucket")) ++ scopedCols: _*)
    val (keptPostings, keptLens, deadC, deadS) = tombOpt match {
      case None => (livePostings, liveLens, 0L, 0L)
      case Some(tomb) =>
        val deadRow = liveLens.join(broadcast(tomb), Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("c"), sum(col("dl")).as("s")).head()
        (livePostings.join(broadcast(tomb), Seq("doc_id"), "left_anti"),
          liveLens.join(broadcast(tomb), Seq("doc_id"), "left_anti"),
          deadRow.getLong(0),
          if (deadRow.isNullAt(1)) 0L else deadRow.getLong(1))
    }
    val postingParts =
      if (metaName.nonEmpty) Seq("bucket", "meta") else Seq("bucket")
    // repartition by the partition key first (writePostings' measured
    // rule): a scoped store has buckets × labels leaf dirs, and the
    // dedup shuffle above spreads keptPostings across every task —
    // without this the COMPACTED store gains tasks × dirs small files,
    // inverting compact's purpose (r15 review finding)
    val placedPostings =
      if (metaName.nonEmpty) keptPostings.repartition(postingParts.map(col): _*)
      else keptPostings
    placedPostings.write.partitionBy(postingParts: _*).mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "postings"))
    keptLens.write.partitionBy("dbucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "doclens"))
    // the new folded-batch WATERMARK — computed from the STATS FILES
    // (the global plane's absorbed set), shared by both stat planes so
    // they advance in lockstep (ids are monotone per checkpoint;
    // recording the max keeps the manifest O(1))
    val upto = (foldedUpto(ctx) +: batchIds(ctx)).max
    // fold the labelstats plane: absorb into fresh base rows ONLY the
    // increments the global watermark also absorbs (batch_id ≤ upto —
    // their stats files landed, so a post-compact replay stays inert on
    // BOTH planes), minus each label's tombstoned (count, Σdl) —
    // derived from the SAME distinct liveLens relation the global
    // adjustment uses. An increment whose stats file never landed
    // (crashed append: labelstats written, batch-N.json not) has
    // batch_id > upto: folding it into base would DOUBLE-COUNT when
    // the at-least-once replay re-appends it, so it is CARRIED FORWARD
    // verbatim instead — the replay's byte-identical rows dedup
    // against it at serve time exactly as they would have pre-compact,
    // and the NEXT compact (after the replay lands the stats file)
    // absorbs it normally (r15 review finding; spec-pinned through the
    // full crash+replay sequence).
    metaName.foreach { _ =>
      val upto0 = foldedUpto(ctx)
      val liveRows = spark.read.parquet(ctx.dir("labelstats"))
        .filter(col("batch_id") === -1L || col("batch_id") > upto0)
        .distinct()
      val liveStats = liveRows
        .filter(col("batch_id") === -1L || col("batch_id") <= upto)
        .groupBy(col("meta"))
        .agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl"))
      // the tombstone adjustment subtracts ALL dead contributions from
      // the base — correct even when a dead doc's increment is in a
      // carried row: total = (base − dead) + carried counts the doc
      // zero times, matching its removal from postings/doclens
      val folded = tombOpt match {
        case None => liveStats
        case Some(tomb) =>
          val dead = liveLens.join(broadcast(tomb), Seq("doc_id"), "left_semi")
            .groupBy(col("meta"))
            .agg(count(lit(1)).as("dc"), sum(col("dl")).as("ds"))
          liveStats.join(dead, Seq("meta"), "left_outer")
            .select(col("meta"),
              (col("n") - coalesce(col("dc"), lit(0L))).as("n"),
              (col("sumdl") - coalesce(col("ds"), lit(0L))).as("sumdl"))
      }
      val carried = liveRows.filter(col("batch_id") > upto)
        .select(col("meta"), col("n"), col("sumdl"), col("batch_id"))
      folded.select(col("meta"), col("n"), col("sumdl"),
          lit(-1L).as("batch_id"))
        .unionByName(carried)
        .write.mode("overwrite")
        .parquet(ArtifactStore.stagingDir(ctx, "labelstats"))
    }
    // fold every live stats file into the next epoch's base behind the
    // watermark computed above — a post-compact replay of any absorbed
    // batch stays inert
    ArtifactStore.writeString(ctx.fs,
      new Path(ArtifactStore.stagingDir(ctx, "stats"), "base.json"),
      statsJson(n0 - deadC, sumdl0 - deadS, Some(upto)))
    // the rewrite above IS the serve-view fold: stage epoch+1's clean
    // marker (inert until the commit), commit, GC the old epoch's marker
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, names)
    ArtifactStore.retireCleanMarker(ctx)
  }

  /** Continuous index maintenance: stream arriving documents into the
    * postings via [[appendBatch]] per micro-batch. SELF-HEALING on
    * restart ([[GraphIndexStore.appendStream]]'s single-maintainer
    * argument): a crashed valve compaction's live-epoch guard is provably
    * this stream's own, so each micro-batch completes it via `compact()`
    * before appending. */
  def appendStream(stream: DataFrame, path: String, checkpoint: String,
      compactFactor: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (ArtifactStore.crashedCompactPending(b.sparkSession, path))
          compact(b.sparkSession, path)
        appendBatch(b, path, id, compactFactor)
      }
      .start()

  /** The single tokenize pass every build/append component derives from:
    * (doc_id, toks array, dl). `dl` is the same `size(tokens(text))`
    * value the per-component tokenizations produced, so postings,
    * doclens, and stats stay bit-identical to the old three-pass form —
    * including zero-token docs, which keep their (doc_id, dl=0) doclen
    * row and stats contribution while contributing no postings. */
  private def tokenized(docs: DataFrame,
      metaCol: Option[String] = None): DataFrame = {
    val base = metaCol match {
      case None => docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      case Some(m) => docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"), col(m).cast("string").as("meta"))
    }
    base.withColumn("dl", size(col("toks")).cast("long"))
  }

  /** Postings are POSITIONAL (r12): each (token, doc) row carries the
    * token's sorted 1-based occurrence positions, the plane
    * [[queryPhrase]] intersects. tf stays the stored count (== the
    * position-array length — one aggregation produces both);
    * sort_array makes the stored bytes deterministic under any shuffle
    * (replayed appends must stay byte-identical for the serve-time
    * dedup to absorb them). BM25 serving never reads `pos`, so the
    * column costs it nothing beyond storage (~one int per token
    * occurrence — the standard positional-index trade). */
  private def writePostings(toks: DataFrame, buckets: Int, dir: String,
      mode: String, scoped: Boolean = false): Unit = {
    // a scoped store's postings carry the label as a SECOND partition
    // axis — (bucket, meta) — so filtered serving prunes the scan to the
    // batch's labels before any score computes (IvfIndexStore's
    // posting-key recipe on the token axis); meta is functionally
    // dependent on doc_id, so adding it to the grouping changes nothing
    val keyed =
      if (scoped) toks.select(col("doc_id"), col("dl"), col("meta"),
          posexplode(col("toks")).as(Seq("p0", "token")))
        .groupBy(col("doc_id"), col("dl"), col("meta"), col("token"))
      else toks.select(col("doc_id"), col("dl"),
          posexplode(col("toks")).as(Seq("p0", "token")))
        .groupBy(col("doc_id"), col("dl"), col("token"))
    val rows = keyed
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p0") + 1)).as("pos"))
      .withColumn("bucket", pmod(TextOps.hash60(col("token")), lit(buckets.toLong)))
    val (cols, parts) =
      if (scoped) (Seq("token", "doc_id", "tf", "dl", "pos", "bucket", "meta"),
        Seq("bucket", "meta"))
      else (Seq("token", "doc_id", "tf", "dl", "pos", "bucket"), Seq("bucket"))
    // repartition by the partition key before the partitioned write (the
    // graph store's measured rule): the scoped layout has buckets ×
    // labels leaf directories, and without this every task writes a
    // sliver into every directory it touches — tasks × dirs small files
    // that every later serve pays to open (measured 42 → 9 s on the
    // qt38 build+serve gate row at sf0.001). The unscoped write follows
    // the same rule (r16): one balanced task per bucket instead of every
    // task writing into all 64 directories
    val placed = rows.repartition(parts.map(col): _*)
    placed.select(cols.map(col): _*)
      .write.partitionBy(parts: _*).mode(mode)
      .parquet(dir)
  }

  /** Per-doc length map (the takedown side table): one (doc_id, dl,
    * batch_id) row per stats contribution, partitioned by the doc-id
    * hash so a tombstone fold opens only the deleted ids' buckets. */
  private def writeDoclens(toks: DataFrame, buckets: Int, dir: String,
      mode: String, batchId: Long, scoped: Boolean = false): Unit = {
    // scoped stores carry the label on the doclen row too (NOT a
    // partition axis — pruning stays by id-hash): the tombstone fold
    // needs per-label dead (count, Σdl) to adjust the labelstats plane
    val base = toks.select(
      (Seq(col("doc_id"), col("dl"), lit(batchId).as("batch_id"),
        pmod(TextOps.hash60(col("doc_id").cast("string")), lit(buckets.toLong))
          .as("dbucket")) ++ (if (scoped) Seq(col("meta")) else Nil)): _*)
    // one file per bucket dir (the store-wide rule): without this every
    // input task writes a sliver into every dbucket dir it touches —
    // tasks × buckets small files (measured: the widened tokenize's 30
    // partitions turned this into 1920 files and DOUBLED the build)
    base.repartition(buckets, col("dbucket"))
      .write.partitionBy("dbucket").mode(mode).parquet(dir)
  }

  /** The PER-LABEL stats plane of a metadata-scoped store — (meta, n,
    * sumdl, batch_id) rows, the per-tenant twin of the global stats
    * directory: build writes the base rows (batch_id = −1), every append
    * appends its per-label increments keyed by the batch id, and serving
    * folds base + not-yet-absorbed increments (batch_id > the
    * folded-batch watermark) with replayed rows absorbed by `distinct()`
    * — a replayed batch writes byte-identical rows, the doclens
    * discipline. Compact folds everything back to base rows at epoch+1.
    * Small by construction: labels × live batches rows, bounded by the
    * same pressure valve that folds the global stats files. */
  private def writeLabelStats(toks: DataFrame, dir: String, mode: String,
      batchId: Long): Unit =
    toks.groupBy(col("meta"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("meta"), col("n"), col("sumdl"), lit(batchId).as("batch_id"))
      // labels-count rows by construction: one file per write (the other
      // small planes' discipline) instead of up to shuffle-partitions
      // slivers that every scoped serve's labelstats fold pays to open
      .coalesce(1)
      .write.mode(mode).parquet(dir)

  private def statsJson(n: Long, sumdl: Long, foldedUpto: Option[Long]): String = {
    val f = foldedUpto.map(u => s""","folded_upto":$u""").getOrElse("")
    s"""{"n":$n,"sumdl":$sumdl$f}"""
  }

  private def writeStats(toks: DataFrame, ctx: ArtifactStore.Ctx,
      fname: String, foldedUpto: Option[Long]): Unit = {
    val st = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    val sumdl = if (st.isNullAt(1)) 0L else st.getLong(1) // empty batch
    ArtifactStore.writeString(ctx.fs, new Path(ctx.dir("stats"), fname),
      statsJson(st.getLong(0), sumdl, foldedUpto))
  }

  /** The folded-batch WATERMARK: every batch id ≤ this has been absorbed
    * into the live base.json (−1 until a compact absorbs one). Batch ids
    * are monotone per checkpoint (Structured Streaming's contract, and
    * the documented requirement for manual [[appendBatch]] callers), so
    * one long identifies the absorbed set — O(1) manifest size however
    * long the index streams, where a recorded id LIST would grow and be
    * re-parsed per serve forever. */
  private def foldedUpto(ctx: ArtifactStore.Ctx): Long = {
    val base = new Path(ctx.dir("stats"), "base.json")
    if (!ctx.fs.exists(base)) -1L
    else """"folded_upto":(-?\d+)""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs, base))
      .map(_.group(1).toLong).getOrElse(-1L)
  }

  /** Refuse loudly when the store predates positional postings (no
    * `"positional":1` in manifest.json): the declared-schema serve read
    * would see `pos = null` on every row and the phrase/proximity paths
    * would silently return ZERO matches — a wrong answer, not an error.
    * BM25 serving never reads `pos` and stays available on such stores. */
  private def requirePositional(ctx: ArtifactStore.Ctx, what: String): Unit = {
    val m = ArtifactStore.readString(ctx.fs, new Path(ctx.root, "manifest.json"))
    require(""""positional":1""".r.findFirstIn(m).isDefined,
      s"store at ${ctx.root} predates positional postings — $what needs " +
        "per-occurrence position arrays; rebuild the index with build() " +
        "(BM25 serving remains available on the old store)")
  }

  /** The metadata column a scoped store was built on (None = unscoped) —
    * parsed from manifest.json, the [[IvfIndexStore]] convention. */
  private def manifestMetaText(ctx: ArtifactStore.Ctx): Option[String] =
    """"meta":"([^"]+)"""".r
      .findFirstMatchIn(ArtifactStore.readString(ctx.fs,
        new Path(ctx.root, "manifest.json")))
      .map(_.group(1))

  /** Refuse loudly when the store lacks the scoped layout (no
    * `"scopedtext":1` format marker): a declared-schema read of a
    * missing meta column would yield nulls and filtered serving would
    * silently return EMPTY — a wrong answer, not an error (the r13
    * format-marker discipline). */
  private def requireScopedText(ctx: ArtifactStore.Ctx, what: String): Unit = {
    val m = ArtifactStore.readString(ctx.fs, new Path(ctx.root, "manifest.json"))
    require(""""scopedtext":1""".r.findFirstIn(m).isDefined,
      s"store at ${ctx.root} is not metadata-scoped; build(metaCol = " +
        s"Some(...)) to enable $what")
  }

  /** Ids of the live per-batch stats files. */
  private def batchIds(ctx: ArtifactStore.Ctx): Seq[Long] =
    ArtifactStore.listNames(ctx.fs, ctx.path("stats")).collect {
      case s if s.startsWith("batch-") && s.endsWith(".json") =>
        s.stripPrefix("batch-").stripSuffix(".json").toLong
    }

  /** Corpus stats = base + every NOT-YET-FOLDED batch increment (batch
    * id > the folded watermark), summed over the (small,
    * driver-local-size) stats directory. */
  private def readMeta(ctx: ArtifactStore.Ctx): (Int, Long, Long) = {
    def field(txt: String, k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"manifest missing $k")).group(1).toLong
    val buckets = field(ArtifactStore.readString(ctx.fs,
      new Path(ctx.root, "manifest.json")), "buckets").toInt
    val upto = foldedUpto(ctx)
    val stats = ArtifactStore.listNames(ctx.fs, ctx.path("stats"))
      .filter(_.endsWith(".json"))
      .filter(s => s == "base.json" ||
        s.stripPrefix("batch-").stripSuffix(".json").toLong > upto)
      .map(s => ArtifactStore.readString(ctx.fs, new Path(ctx.dir("stats"), s)))
    (buckets, stats.map(field(_, "n")).sum, stats.map(field(_, "sumdl")).sum)
  }

  /** The tombstone-folded pruned posting slice + corpus stats every BM25
    * serve starts from, for a given term set: opens only the terms'
    * bucket partitions (declared schema — no footer reads outside the
    * slice), dedups replayed appends, anti-joins tombstoned docs with
    * their stats contributions subtracted via the id-hash-pruned
    * doc-length map. Shared by [[queryBm25]] and [[queryBm25Batch]] so
    * the two paths can never drift. */
  private def servedTermSlice(spark: SparkSession, ctx: ArtifactStore.Ctx,
      terms: Seq[String]): (DataFrame, Long, Long) = {
    val (buckets, n0, sumdl0) = readMeta(ctx)
    // CLEAN fast path ([[ArtifactStore.isClean]]): a certified-clean
    // store's postings ARE the serve view — no replayed duplicates, no
    // tombstones — so the (token, doc_id) dedup shuffle and the whole
    // tombstone stats fold are identities
    val clean = ArtifactStore.isClean(ctx)
    // tombstone fold: subtract the deleted docs' stats contributions
    // (pruned to their id-hash buckets; one row per batch contribution,
    // distinct-by-(doc, batch) so append replays subtract once) and
    // remember the id set for the posting anti-join below
    val tomb: Option[DataFrame] =
      if (clean) None else ArtifactStore.readTombstones(spark, ctx)
    val (n, sumdl) = tomb match {
      case None => (n0, sumdl0)
      case Some(t) =>
        val tombBuckets = t
          .select(pmod(TextOps.hash60(col("doc_id").cast("string")),
            lit(buckets.toLong)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).sorted
        val doclenSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dl",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dbucket",
            org.apache.spark.sql.types.LongType)))
        val dead = spark.read.schema(doclenSchema).parquet(ctx.dir("doclens"))
          .filter(col("dbucket").isInCollection(tombBuckets))
          .join(broadcast(t), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("dl"), col("batch_id")).distinct()
          .agg(count(lit(1)).as("c"), sum(col("dl")).as("s")).head()
        val c = dead.getLong(0)
        val s = if (dead.isNullAt(1)) 0L else dead.getLong(1)
        (n0 - c, sumdl0 - s)
    }
    // JVM-side mirror of the build's bucket arithmetic (hash60 is
    // nonnegative, so pmod == %); pinned equal by CmsSpec's parity test
    val termBuckets = terms
      .map(t => graft.functions.CountMin.hash60(t) % buckets)
      .distinct.sorted
    // the posting schema is fixed by the layout, so serving declares it
    // instead of inferring: no footer reads outside the probed slice (on
    // a million-file index, schema inference alone would touch unprobed
    // buckets — TextIndexSpec pins that corrupting them cannot matter)
    // a scoped store's layout adds the meta partition column — declare
    // it too (the slice carries it harmlessly for unfiltered callers;
    // the filtered paths prune and score on it)
    val postingSchema = postingSchemaOf(manifestMetaText(ctx).nonEmpty)
    // dedup AFTER pruning absorbs at-least-once appends (replayed
    // posting rows are byte-identical) over the probed slice only —
    // IvfIndexStore's serve-time discipline on the token axis
    val slice = spark.read.schema(postingSchema).parquet(ctx.dir("postings"))
      .filter(col("bucket").isInCollection(termBuckets))
      .filter(col("token").isin(terms: _*))
    val live = if (clean) slice else slice.dropDuplicates("token", "doc_id")
    // tombstoned docs never serve and never count toward df (df derives
    // from the pruned slice, so the anti-join shrinks both at once); it
    // runs AFTER partition pruning — only the probed slice pays for it
    val pruned = tomb match {
      case Some(t) => live.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => live
    }
    (pruned, n, sumdl)
  }

  /** The declared posting-read schema (no footer inference — on a
    * million-file index, schema inference alone would touch unprobed
    * buckets); scoped stores append the meta partition column. */
  private def postingSchemaOf(scoped: Boolean): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("token", StringType),
      StructField("doc_id", LongType),
      StructField("tf", LongType),
      StructField("dl", LongType),
      StructField("pos", ArrayType(IntegerType)),
      StructField("bucket", LongType)) ++
      (if (scoped) Seq(StructField("meta", StringType)) else Nil))
  }

  /** The (bucket, meta)-pruned posting slice + PER-LABEL corpus stats
    * every FILTERED BM25 serve starts from — [[servedTermSlice]]'s twin
    * on the scoped layout. `labels = Some(ls)` prunes the meta partition
    * axis to the batch's label domain (the filtered caller caps it at
    * [[ArtifactStore.maxMetaFilter]] and passes None past the cap —
    * bucket-only pruning, the peers' graceful degradation, while scoring
    * still keys on meta). The stats side folds the labelstats plane
    * (base rows + not-yet-absorbed increments, replays absorbed by
    * distinct) and subtracts tombstoned docs per label via the
    * meta-carrying doc-length map — so every (n, sumdl) pair is exactly
    * what a from-scratch build of the surviving label corpus would
    * record (spec-pinned). */
  private def servedScopedSlice(spark: SparkSession, ctx: ArtifactStore.Ctx,
      terms: Seq[String], labels: Option[Seq[String]]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val (buckets, _, _) = readMeta(ctx)
    val clean = ArtifactStore.isClean(ctx)
    val tomb: Option[DataFrame] =
      if (clean) None else ArtifactStore.readTombstones(spark, ctx)
    val termBuckets = terms
      .map(t => graft.functions.CountMin.hash60(t) % buckets)
      .distinct.sorted
    val slice0 = spark.read.schema(postingSchemaOf(scoped = true))
      .parquet(ctx.dir("postings"))
      .filter(col("bucket").isInCollection(termBuckets))
      .filter(col("token").isin(terms: _*))
    val slice1 = labels match {
      case Some(ls) => slice0.filter(col("meta").isInCollection(ls))
      case None => slice0
    }
    val live = if (clean) slice1 else slice1.dropDuplicates("token", "doc_id")
    val pruned = tomb match {
      case Some(t) => live.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => live
    }
    // per-label stats: labelstats fold (watermark keeps post-compact
    // replays inert; base rows are batch_id = −1 and always count)
    val lsSchema = StructType(Seq(
      StructField("meta", StringType), StructField("n", LongType),
      StructField("sumdl", LongType), StructField("batch_id", LongType)))
    val upto = foldedUpto(ctx)
    val raw = spark.read.schema(lsSchema).parquet(ctx.dir("labelstats"))
      .filter(col("batch_id") === -1L || col("batch_id") > upto)
    val rawAbsorbed = if (clean) raw else raw.distinct()
    val base = rawAbsorbed.groupBy(col("meta"))
      .agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl"))
    val stats = tomb match {
      case None => base
      case Some(t) =>
        val tombBuckets = t
          .select(pmod(TextOps.hash60(col("doc_id").cast("string")),
            lit(buckets.toLong)).as("dbucket"))
          .distinct().collect().map(_.getLong(0)).sorted
        val dead = spark.read.schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("dl", LongType),
            StructField("batch_id", LongType), StructField("dbucket", LongType),
            StructField("meta", StringType))))
          .parquet(ctx.dir("doclens"))
          .filter(col("dbucket").isInCollection(tombBuckets))
          .join(broadcast(t), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("dl"), col("batch_id"), col("meta"))
          .distinct()
          .groupBy(col("meta"))
          .agg(count(lit(1)).as("dc"), sum(col("dl")).as("ds"))
        base.join(dead, Seq("meta"), "left_outer")
          .select(col("meta"),
            (col("n") - coalesce(col("dc"), lit(0L))).as("n"),
            (col("sumdl") - coalesce(col("ds"), lit(0L))).as("sumdl"))
    }
    (pruned, stats)
  }

  /** qt12's pre-folded Okapi BM25 per-(posting) score expression — 6-
    * decimal quantized so the per-doc sum is exact decimal arithmetic
    * (the one definition both serve paths score with). */
  private def bm25Sc(n: Long, sumdl: Long): org.apache.spark.sql.Column =
    bm25ScFrom(lit(n), lit(sumdl))

  /** The SAME expression with (n, sumdl) as COLUMNS — the filtered
    * paths score each posting against ITS label's stats through a
    * broadcast join. lit(n: Long) and a LongType column take the same
    * type-promotion path through every op (long subtraction, one cast
    * to double per term), so the per-posting score is bit-identical to
    * the global form evaluated at the label's values — the one-scoring-
    * definition discipline. */
  private def bm25ScFrom(n: org.apache.spark.sql.Column,
      sumdl: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val avgdl = sumdl.cast("double") / n
    val idf = log(lit(1.0) +
      (n - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") +
      lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl")) / avgdl)
    round(((idf * col("tf")) * lit(2.2)) / norm, 6)
      .cast(org.apache.spark.sql.types.DecimalType(20, 6))
  }

  /** Serve a BM25 query from the prebuilt index: top-`topK` docs by
    * summed per-term score, opening only the query terms' bucket
    * partitions. Output is (doc_id, n_terms_hit, score) in qt12's exact
    * (score DESC, doc_id) order. */
  def queryBm25(spark: SparkSession, path: String, terms: Seq[String],
      topK: Int): DataFrame = {
    ArtifactStore.serving(spark, path) { ctx =>
      val (pruned, n, sumdl) = servedTermSlice(spark, ctx, terms)
      val df = pruned.groupBy(col("token")).agg(count(lit(1)).as("df"))
      pruned.join(broadcast(df), Seq("token"))
        .select(col("doc_id"), bm25Sc(n, sumdl).as("sc"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms_hit"),
          sum(col("sc")).cast("double").as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(topK)
    }
  }

  /** Serve MANY keyword queries from the index in ONE pass — the
    * eval-set / offline relevance-sweep shape next to
    * [[graft.sinks.IvfIndexStore.queryBatch]] on the dense axis.
    * `queries` must have (query_id: bigint, terms: array<string>). The
    * posting slice is opened ONCE for the union of all queries' terms
    * (still only those terms' bucket partitions); per-term df derives
    * from that slice and is global — independent of which query asked —
    * so every per-posting score is bit-identical to a standalone
    * [[queryBm25]] of the same query; each query then scores only its
    * own terms through a broadcast (query_id, token) join, and ranking
    * is the bounded top-k aggregator per query (no per-query window).
    * Keyword query sets are eval-sized by nature — the batch is
    * collected (bounded, loud) to build the term union and the
    * broadcast join table. Output: (query_id, rank, doc_id, score) in
    * qt12's (score DESC, doc_id) order per query. */
  def queryBm25Batch(spark: SparkSession, path: String, queries: DataFrame,
      topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      val qterms: Array[(Long, Seq[String])] =
        ArtifactStore.collectBounded(
          queries.select(col("query_id"), col("terms"))
            .as[(Long, Seq[String])],
          65536, "keyword query batch", "split the eval set")
      val termUnion = qterms.flatMap(_._2).distinct.toSeq.sorted
      val (pruned, n, sumdl) = servedTermSlice(spark, ctx, termUnion)
      val df = pruned.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val qx = qterms.toSeq
        .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
        .toDF("query_id", "token")
      val scored = pruned.join(broadcast(df), Seq("token"))
        .join(broadcast(qx), Seq("token"))
        .select(col("query_id"), col("doc_id"), bm25Sc(n, sumdl).as("sc"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("sc")).cast("double").as("score"))
      // the single (score DESC, id ASC) truncation contract
      graft.functions.Ranking.rankTopKScored(scored, topK, "doc_id", "score")
    }
  }

  /** TENANT-SCOPED BM25 from a metadata-scoped index — each label is its
    * OWN corpus: df, N, and avgdl all come from the label's sub-corpus
    * (a per-language index genuinely needs this — document frequencies
    * differ wildly across languages, and a global idf would mis-rank
    * every non-majority label), which is what makes the scoped layout
    * pay: the scan prunes to (query terms' buckets × the query's label),
    * df derives from exactly that slice, and (n, sumdl) come from the
    * labelstats plane — serve cost tracks the tenant, not the corpus.
    * Contrast the ANN stores' filtered serving, where scoring is
    * pairwise and scoping only restricts candidates. Output: (doc_id,
    * n_terms_hit, score) in qt12's (score DESC, doc_id) order. A null
    * `meta` matches no label and serves empty (the peers' contract). */
  def queryBm25Filtered(spark: SparkSession, path: String, terms: Seq[String],
      meta: String, topK: Int): DataFrame =
    ArtifactStore.serving(spark, path) { ctx =>
      requireScopedText(ctx, "queryBm25Filtered")
      val (pruned, stats) = servedScopedSlice(spark, ctx, terms.distinct,
        Some(Option(meta).toSeq))
      val df = pruned.groupBy(col("token"), col("meta"))
        .agg(count(lit(1)).as("df"))
      pruned.join(broadcast(df), Seq("token", "meta"))
        .join(broadcast(stats), Seq("meta"))
        .select(col("doc_id"),
          bm25ScFrom(col("n"), col("sumdl")).as("sc"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms_hit"),
          sum(col("sc")).cast("double").as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(topK)
    }

  /** Serve MANY tenant-scoped keyword queries in ONE pass —
    * [[queryBm25Batch]]'s shape on the scoped layout: the posting slice
    * opens once for (term union × the batch's label domain), per-(token,
    * label) df derives from that slice (independent of which query
    * asked, so every per-posting score is bit-identical to a standalone
    * [[queryBm25Filtered]] of the same query — spec-pinned), each query
    * scores only its own (term, label) pairs through a broadcast join,
    * and ranking is the bounded top-k aggregator. Label domains past
    * [[ArtifactStore.maxMetaFilter]] fall back to bucket-only partition
    * pruning with the label still in the join key; null-meta query rows
    * serve empty. `queries` must have (query_id: bigint, terms:
    * array<string>, meta: string). Output: (query_id, rank, doc_id,
    * score). */
  def queryBm25FilteredBatch(spark: SparkSession, path: String,
      queries: DataFrame, topK: Int): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      requireScopedText(ctx, "queryBm25FilteredBatch")
      val q: Array[(Long, Seq[String], String)] =
        ArtifactStore.collectBounded(
          queries.select(col("query_id"), col("terms"), col("meta"))
            .as[(Long, Seq[String], String)],
          65536, "keyword query batch", "split the eval set")
      val termUnion = q.flatMap(_._2).distinct.toSeq.sorted
      // nulls excluded BEFORE the cap (the r13 advice class — a null
      // must never shrink the domain under the cap while real labels go
      // unpruned... unsampled); null-meta rows serve empty via the join
      val labels = q.map(_._3).filter(_ != null).distinct.toSeq.sorted
      val labelFilter =
        if (labels.length > ArtifactStore.maxMetaFilter(spark)) None
        else Some(labels)
      val (pruned, stats) = servedScopedSlice(spark, ctx, termUnion, labelFilter)
      val df = pruned.groupBy(col("token"), col("meta"))
        .agg(count(lit(1)).as("df"))
      val qx = q.toSeq
        .flatMap { case (qid, ts, mv) => ts.distinct.map(t => (qid, t, mv)) }
        .toDF("query_id", "token", "meta")
      val scored = pruned.join(broadcast(df), Seq("token", "meta"))
        .join(broadcast(qx), Seq("token", "meta"))
        .join(broadcast(stats), Seq("meta"))
        .select(col("query_id"), col("doc_id"),
          bm25ScFrom(col("n"), col("sumdl")).as("sc"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("sc")).cast("double").as("score"))
      graft.functions.Ranking.rankTopKScored(scored, topK, "doc_id", "score")
    }
  }

  /** Serve an exact PHRASE query from the POSITIONAL postings — the
    * quoted-query primitive bag-of-words BM25 cannot express, answered
    * without touching any document text: each phrase slot reads its
    * term's pruned posting slice (partition pruning on the token-hash
    * bucket axis, [[queryBm25]]'s property), the slots equi-join
    * document-at-a-time on doc_id (keyed joins — candidate docs shrink
    * to the rarest term's df before any position is compared), and one
    * codegen'd array filter intersects the stored position lists
    * (first-token position p survives iff slot j holds p+j for every j).
    * This is the classic inverted-index phrase plan: serve cost scales
    * with the PHRASE TERMS' posting lists, never the corpus — the
    * index-served twin of the full-scan phrase query (qt31), which pays
    * one pass over every document per call. Output: (doc_id, n_hits,
    * first_pos) for matching docs, 1-based positions, ordered by doc_id
    * — qt31's exact per-phrase conventions, so the two paths share one
    * oracle. Tombstones, replays, and the clean-store fast path are
    * absorbed by [[servedTermSlice]] exactly as in BM25 serving. */
  def queryPhrase(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryPhrase")
      val (pruned, _, _) = servedTermSlice(spark, ctx, phrase.distinct)
      // one relation per phrase SLOT (duplicate words reuse the same
      // slice rows under a different shift)
      val slots = phrase.zipWithIndex.map { case (w, j) =>
        pruned.filter(col("token") === w)
          .select(col("doc_id"), col("pos").as(s"pos_$j"))
      }
      val joined = slots.reduce((a, b) => a.join(b, Seq("doc_id")))
      val hits =
        if (phrase.length == 1) col("pos_0")
        else filter(col("pos_0"), p =>
          (1 until phrase.length).map(j => array_contains(col(s"pos_$j"), p + j))
            .reduce(_ && _))
      joined.select(col("doc_id"), hits.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_hits"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("doc_id"))
    }
  }

  /** Serve an ordered PROXIMITY query from the positional postings — the
    * within-window retrieval primitive between bag-of-words BM25 and
    * exact phrase match: a document hits when the terms appear IN ORDER
    * with the whole chain spanning at most `window` tokens (an anchor is
    * a first-term position that starts such a chain; `window = L-1` is
    * exactly [[queryPhrase]], spec-pinned). Same document-at-a-time slot
    * joins over the bucket-pruned posting slices as the phrase path; the
    * chain check is one codegen'd expression of nested `exists` lambdas
    * over the stored position lists (each level captures the anchor for
    * the span bound — no position ever leaves its array). Output:
    * (doc_id, n_anchors, first_pos), 1-based, ordered by doc_id. */
  def queryProximity(spark: SparkSession, path: String, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.length >= 2, "proximity needs at least two terms")
    require(window >= terms.length - 1,
      s"window $window cannot fit ${terms.length} ordered terms")
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryProximity")
      val (pruned, _, _) = servedTermSlice(spark, ctx, terms.distinct)
      val slots = terms.zipWithIndex.map { case (w, j) =>
        pruned.filter(col("token") === w)
          .select(col("doc_id"), col("pos").as(s"pos_$j"))
      }
      val joined = slots.reduce((a, b) => a.join(b, Seq("doc_id")))
      def chain(j: Int, p0: org.apache.spark.sql.Column,
          prev: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (j == terms.length) lit(true)
        else exists(col(s"pos_$j"), q =>
          q > prev && (q - p0) <= window && chain(j + 1, p0, q))
      val anchors = filter(col("pos_0"), p => chain(1, p, p))
      joined.select(col("doc_id"), anchors.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_anchors"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("doc_id"))
    }
  }

  /** Serve an UNORDERED proximity (NEAR) query from the positional
    * postings — the classic retrieval `a NEAR/n b` operator: a document
    * hits when ALL terms appear, in ANY order, with some occurrence
    * choice spanning at most `window` tokens (max − min ≤ window ⇔ every
    * pair within `window`, which is how the check nests). Same
    * document-at-a-time slot joins over bucket-pruned posting slices as
    * [[queryProximity]]; the chain is nested codegen'd `exists` lambdas
    * where level j's candidate must sit within `window` of EVERY
    * previously chosen position (each level captures the whole chosen
    * prefix). The matched DOC SET is symmetric in the terms
    * (spec-pinned); anchors — and therefore `n_anchors`/`first_pos` —
    * are counted on the FIRST LISTED term's occurrences, the documented
    * convention. Duplicate terms are refused (one occurrence would
    * satisfy two slots — use [[queryPhrase]]/[[queryProximity]], whose
    * ordered `q > prev` makes duplicates well-defined). Output:
    * (doc_id, n_anchors, first_pos), 1-based, ordered by doc_id. */
  def queryNear(spark: SparkSession, path: String, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.length >= 2, "NEAR needs at least two terms")
    require(terms.distinct.length == terms.length,
      "NEAR terms must be distinct (a duplicate would match one " +
        "occurrence twice — use queryPhrase/queryProximity for ordered " +
        "duplicate-word queries)")
    require(window >= terms.length - 1,
      s"window $window cannot fit ${terms.length} distinct positions")
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryNear")
      val (pruned, _, _) = servedTermSlice(spark, ctx, terms.distinct)
      val slots = terms.zipWithIndex.map { case (w, j) =>
        pruned.filter(col("token") === w)
          .select(col("doc_id"), col("pos").as(s"pos_$j"))
      }
      val joined = slots.reduce((a, b) => a.join(b, Seq("doc_id")))
      def chain(j: Int,
          chosen: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
        if (j == terms.length) lit(true)
        else exists(col(s"pos_$j"), q =>
          chosen.map(c => abs(q - c) <= window).reduce(_ && _) &&
            chain(j + 1, chosen :+ q))
      val anchors = filter(col("pos_0"), p => chain(1, Seq(p)))
      joined.select(col("doc_id"), anchors.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_anchors"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("doc_id"))
    }
  }

  /** Serve MANY phrase queries from the positional postings in ONE pass —
    * [[queryBm25Batch]]'s eval-set shape on the phrase axis, completing
    * the batch-serving matrix ([[IvfIndexStore.queryBatch]] dense,
    * qs32/qs33 compressed/graph, qt30 sparse): the posting slice opens
    * once for the union of every phrase's terms (only those bucket
    * partitions), each phrase SLOT joins it through a broadcast
    * (query_id, slot, token) table, and per (query, doc) the slot
    * position lists fold into one map whose intersection is a single
    * codegen'd array filter — identical position semantics to a
    * standalone [[queryPhrase]] per query (spec-pinned), no per-query
    * rescans. Phrase query sets are eval-sized by nature — the batch is
    * collected (bounded, loud) to build the term union and the broadcast
    * slot table; everything per-document stays distributed. `queries`
    * must have (query_id: bigint, phrase: array<string>). Output:
    * (query_id, doc_id, n_hits, first_pos) for matching (query, doc)
    * pairs, ordered by (query_id, doc_id). */
  def queryPhraseBatch(spark: SparkSession, path: String,
      queries: DataFrame): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryPhraseBatch")
      val qs: Array[(Long, Seq[String])] = ArtifactStore.collectBounded(
        queries.select(col("query_id"), col("phrase")).as[(Long, Seq[String])],
        65536, "phrase query batch", "split the eval set")
      qs.foreach { case (qid, ph) =>
        require(ph.nonEmpty, s"query $qid: phrase must have at least one token") }
      // duplicate ids would collide in the per-(query, doc) slot-map fold
      // below ("duplicate map key" deep in the job) — an input-contract
      // error, surfaced as one before any work runs
      require(qs.map(_._1).distinct.length == qs.length,
        "phrase query batch: query_id values must be unique")
      val termUnion = qs.flatMap(_._2).distinct.toSeq.sorted
      val (pruned, _, _) = servedTermSlice(spark, ctx, termUnion)
      val slots = qs.toSeq.flatMap { case (qid, ph) =>
        ph.zipWithIndex.map { case (w, j) => (qid, j, w, ph.length) } }
        .toDF("query_id", "slot", "token", "plen")
      // every (query, doc) folds its slots' position lists into ONE map;
      // a doc qualifies only when ALL slots found a posting (duplicate
      // phrase words occupy distinct slots over the same posting row)
      val pm = pruned.select(col("token"), col("doc_id"), col("pos"))
        .join(broadcast(slots), Seq("token"))
        .groupBy(col("query_id"), col("doc_id"), col("plen"))
        .agg(map_from_entries(collect_list(
          struct(col("slot"), col("pos")))).as("pm"))
        .filter(size(col("pm")) === col("plen"))
      // first-token position p survives iff slot j holds p+j for every j;
      // sequence(1, plen-1) counts DOWN when plen = 1 (the charShingles
      // gotcha), so single-token phrases take slot 0's list verbatim
      val hits = when(col("plen") === 1, element_at(col("pm"), lit(0)))
        .otherwise(filter(element_at(col("pm"), lit(0)), p =>
          aggregate(sequence(lit(1), col("plen") - 1), lit(true),
            (acc, j) => acc &&
              array_contains(element_at(col("pm"), j.cast("int")),
                p + j.cast("int")))))
      pm.select(col("query_id"), col("doc_id"), hits.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("query_id"), col("doc_id"),
          size(col("ps")).cast("long").as("n_hits"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("query_id"), col("doc_id"))
    }
  }

  /** Serve MANY unordered-proximity (NEAR) queries from the positional
    * postings in ONE pass — [[queryPhraseBatch]]'s eval-set shape on the
    * NEAR axis. Per-query term counts vary, so the standalone path's
    * compile-time-nested pairwise lambdas cannot apply; instead each
    * anchor checks a CANDIDATE-WINDOW set: a choice with span ≤ window
    * containing anchor p exists iff some window [m, m+window] with
    * m ∈ {p} ∪ (any slot's occurrences ∩ [p−window, p]) holds ≥ 1
    * occurrence of EVERY other slot. Equivalence is exact: a valid
    * choice's minimum μ satisfies μ ≤ p ≤ μ+window, and μ is either p or
    * an occurrence in [p−window, p] — so μ is in the candidate set and
    * its window covers every slot; conversely a covering window yields
    * the choice directly. Cost per anchor is |candidates| × L × |posⱼ|
    * lambda steps — eval-set-sized by construction. Same slot-map fold,
    * input contract (distinct terms per query, ≥ 2 terms, window ≥ L−1,
    * unique query_id) and output conventions as the standalone
    * [[queryNear]] (anchors on the first LISTED term; TextIndexSpec pins
    * batch == standalone per query). `queries` must have
    * (query_id: bigint, terms: array<string>, window: int). Output:
    * (query_id, doc_id, n_anchors, first_pos) ordered by
    * (query_id, doc_id). */
  def queryNearBatch(spark: SparkSession, path: String,
      queries: DataFrame): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryNearBatch")
      val qs: Array[(Long, Seq[String], Int)] = ArtifactStore.collectBounded(
        queries.select(col("query_id"), col("terms"),
          col("window").cast("int")).as[(Long, Seq[String], Int)],
        65536, "NEAR query batch", "split the eval set")
      require(qs.map(_._1).distinct.length == qs.length,
        "NEAR query batch: query_id values must be unique")
      qs.foreach { case (qid, ts, w) =>
        require(ts.length >= 2, s"query $qid: NEAR needs at least two terms")
        require(ts.distinct.length == ts.length,
          s"query $qid: NEAR terms must be distinct")
        require(w >= ts.length - 1,
          s"query $qid: window $w cannot fit ${ts.length} distinct positions")
      }
      val termUnion = qs.flatMap(_._2).distinct.toSeq.sorted
      val (pruned, _, _) = servedTermSlice(spark, ctx, termUnion)
      val slots = qs.toSeq.flatMap { case (qid, ts, w) =>
        ts.zipWithIndex.map { case (t, j) => (qid, j, t, ts.length, w) } }
        .toDF("query_id", "slot", "token", "plen", "w")
      val pm = pruned.select(col("token"), col("doc_id"), col("pos"))
        .join(broadcast(slots), Seq("token"))
        .groupBy(col("query_id"), col("doc_id"), col("plen"), col("w"))
        .agg(map_from_entries(collect_list(
          struct(col("slot"), col("pos")))).as("pm"))
        .filter(size(col("pm")) === col("plen"))
      // candidate window minimums per anchor: p itself plus every stored
      // occurrence (any slot) in [p−w, p]; a slot j is covered by window
      // [m, m+w] when it holds an occurrence in that range
      def covered(j: org.apache.spark.sql.Column,
          m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        exists(element_at(col("pm"), j.cast("int")),
          q => q >= m && q <= m + col("w"))
      val anchors = filter(element_at(col("pm"), lit(0)), p => {
        val cands = concat(array(p),
          filter(flatten(map_values(col("pm"))),
            q => q >= p - col("w") && q <= p))
        exists(cands, m =>
          aggregate(sequence(lit(1), col("plen") - 1), lit(true),
            (acc, j) => acc && covered(j, m)))
      })
      pm.select(col("query_id"), col("doc_id"), anchors.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("query_id"), col("doc_id"),
          size(col("ps")).cast("long").as("n_anchors"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("query_id"), col("doc_id"))
    }
  }

  /** Serve MANY ordered-proximity queries from the positional postings in
    * ONE pass — [[queryPhraseBatch]]'s eval-set shape on the proximity
    * axis: one posting-slice open for the union of every query's terms,
    * a broadcast (query_id, slot, token) table, and the per-(query, doc)
    * slot-map fold. The chain check differs from the phrase
    * intersection because term counts VARY per query, so the standalone
    * path's compile-time-nested `exists` lambdas (depth = L, known at
    * plan time) cannot apply; instead each anchor folds a GREEDY chain
    * over `sequence(1, L-1)`: prev₀ = anchor, prevⱼ = min{q ∈ posⱼ :
    * q > prevⱼ₋₁}, and a chain exists iff prev_{L-1} lands within
    * `window` of the anchor. Greedy-minimal is exact, not a heuristic:
    * the feasible set for slot j+1 ({q > prevⱼ}) only GROWS as prevⱼ
    * shrinks, so the minimal choice dominates every alternative — the
    * greedy chain exists iff ANY chain does (the dominance argument is
    * the whole correctness proof; TextIndexSpec pins batch ==
    * standalone per query, which carries the nested-exists oracle
    * formulation over). `queries` must have (query_id: bigint,
    * terms: array<string>, window: int), window ≥ |terms|−1, each query
    * ≥ 2 terms. Output: (query_id, doc_id, n_anchors, first_pos),
    * 1-based, ordered by (query_id, doc_id) — [[queryProximity]]'s
    * per-query conventions. */
  def queryProximityBatch(spark: SparkSession, path: String,
      queries: DataFrame): DataFrame = {
    import spark.implicits._
    ArtifactStore.serving(spark, path) { ctx =>
      requirePositional(ctx, "queryProximityBatch")
      val qs: Array[(Long, Seq[String], Int)] = ArtifactStore.collectBounded(
        queries.select(col("query_id"), col("terms"),
          col("window").cast("int")).as[(Long, Seq[String], Int)],
        65536, "proximity query batch", "split the eval set")
      require(qs.map(_._1).distinct.length == qs.length,
        "proximity query batch: query_id values must be unique")
      qs.foreach { case (qid, ts, w) =>
        require(ts.length >= 2, s"query $qid: proximity needs at least two terms")
        require(w >= ts.length - 1,
          s"query $qid: window $w cannot fit ${ts.length} ordered terms")
      }
      val termUnion = qs.flatMap(_._2).distinct.toSeq.sorted
      val (pruned, _, _) = servedTermSlice(spark, ctx, termUnion)
      val slots = qs.toSeq.flatMap { case (qid, ts, w) =>
        ts.zipWithIndex.map { case (t, j) => (qid, j, t, ts.length, w) } }
        .toDF("query_id", "slot", "token", "plen", "w")
      val pm = pruned.select(col("token"), col("doc_id"), col("pos"))
        .join(broadcast(slots), Seq("token"))
        .groupBy(col("query_id"), col("doc_id"), col("plen"), col("w"))
        .agg(map_from_entries(collect_list(
          struct(col("slot"), col("pos")))).as("pm"))
        .filter(size(col("pm")) === col("plen"))
      // the greedy fold per anchor: a dead chain parks at the Int.MaxValue
      // sentinel (filter(q > MAX) is empty forever after, and the span
      // check can never pass it — positions are ≥ 1, windows are sane)
      val Dead = Int.MaxValue
      val anchors = filter(element_at(col("pm"), lit(0)), p =>
        aggregate(sequence(lit(1), col("plen") - 1), p,
          (prev, j) => coalesce(
            array_min(filter(element_at(col("pm"), j.cast("int")),
              q => q > prev)),
            lit(Dead)),
          prev => prev =!= lit(Dead) && (prev - p) <= col("w")))
      pm.select(col("query_id"), col("doc_id"), anchors.as("ps"))
        .filter(size(col("ps")) >= 1)
        .select(col("query_id"), col("doc_id"),
          size(col("ps")).cast("long").as("n_anchors"),
          element_at(col("ps"), 1).cast("long").as("first_pos"))
        .orderBy(col("query_id"), col("doc_id"))
    }
  }
}
