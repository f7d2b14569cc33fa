package graft.sinks

import graft.pipeline.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash-LSH BAND index — the third build-once/serve-many
  * artifact next to [[IvfIndexStore]] (dense vectors) and
  * [[TextIndexStore]] (sparse terms): the banded posting table behind
  * incremental near-duplicate detection (qd15's continuous-crawl shape),
  * persisted so an arriving batch probes the corpus WITHOUT recomputing
  * its signatures.
  *
  * Layout under `path` (epoched components via [[ArtifactStore]] — all
  * metadata I/O through the Hadoop `FileSystem` API):
  * {{{
  *   manifest.json                      {"buckets":B,"shingleN":..,"numPerms":..,"rowsPerBand":..}
  *   postings/bucket=K/<parts>.parquet  (band, rep_id, hs, grp_n) per bucket
  *   members/mbucket=K/<parts>.parquet  (rep_id, doc_id) per id-hash bucket
  *   tombstones/                        parquet (doc_id) — folded by compact
  *   epoch-N, _COMPACTING               ArtifactStore commit/guard markers
  *   _clean-N                           clean-store marker ([[ArtifactStore.isClean]])
  * }}}
  *
  * Postings carry the representative's full shingle-hash array `hs` IN
  * the posting row (each rep posts to numPerms/rowsPerBand bands, so the
  * duplication factor is the band count — a deliberate denormalization
  * that makes probing a single pruned scan with ZERO side joins: the
  * pruned slice already holds everything verification needs). Build
  * exact-collapses identical shingle sets (qd02's hot-band discipline):
  * one representative per distinct set posts per band, with the group
  * size `grp_n` riding along so partner counts expand without a member
  * table.
  *
  * [[probe]] filters on the probe bands' bucket set — parquet PARTITION
  * PRUNING on the band axis (spec-pinned) — verifies candidates by exact
  * Jaccard over the hash arrays, and returns per-arriving-doc partner
  * counts in qd15's exact output shape.
  *
  * Replay/duplicate-posting folding is a DETERMINISTIC reduction, never a
  * row pick: duplicate (band, rep_id) posting rows collapse via
  * `max(grp_n)` over the (band, rep_id, hs) group. Identical content ⇒
  * identical `hs`, so the group key is total, and `max` makes the
  * re-append-of-a-representative case safe: a rep of an n-member group
  * re-appended as a fresh grp_n=1 posting folds back to n (a
  * nondeterministic dropDuplicates could keep the 1 and, with the rep
  * tombstoned, decrement the whole surviving group to zero). An append
  * of an id already indexed as a REPRESENTATIVE is therefore absorbed
  * (idempotent); an append of an id indexed as a non-rep member posts as
  * its own new group and counts per contribution — the same
  * per-contribution semantic TextIndexStore documents for genuine
  * re-appends.
  *
  * DELETES (the takedown path, [[IvfIndexStore]]'s tombstone semantics on
  * the band axis): because build collapses identical-content groups into
  * one posting with a member count, doc-level deletion needs the member
  * map — build and append therefore persist `members/` (rep_id, doc_id,
  * id-hash bucket) alongside the postings. [[delete]] is O(|ids|)
  * (tombstones append; nothing rewrites), and [[probe]] folds them in by
  * DECREMENTING each affected representative's group count (identical
  * content ⇒ the rep's hash array still represents the survivors) and
  * dropping fully-deleted groups — byte-exactly "as if the corpus never
  * held those docs". The member scan is pruned to the tombstoned ids'
  * hash buckets, so serving cost scales with the takedown list, not the
  * corpus. Re-appending a tombstoned id does not resurrect it (its fresh
  * posting arrives with group count 1 and is decremented straight to 0 —
  * the IvfIndexStore no-resurrection contract, for free).
  */
object BandIndexStore {

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

  private val Components = Seq("postings", "members")

  /** Deterministic fold of duplicate (band, rep_id) posting rows — see
    * the class doc's replay-folding contract. */
  private def foldPostings(p: DataFrame): DataFrame =
    p.groupBy(col("band"), col("rep_id"), col("hs"), col("bucket"))
      .agg(max(col("grp_n")).as("grp_n"))
      .select(col("band"), col("rep_id"), col("hs"), col("grp_n"), col("bucket"))

  /** Build the index from the existing corpus: shingle, exact-collapse,
    * band the representatives, persist bucket-partitioned postings.
    * `docs` must have (doc_id: bigint, text: string). */
  def build(docs: DataFrame, path: String, shingleN: Int, numPerms: Int,
      rowsPerBand: Int, buckets: Int = DefaultBuckets): Unit = {
    import graft.functions.expressions.ShingleExpressions._
    val spark = docs.sparkSession
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    // a rebuild-in-place must not leave the OLD epoch's clean marker
    // certifying half-overwritten planes ([[ArtifactStore]]'s marker
    // ordering): drop it before the first write, re-create it last
    ArtifactStore.revokeClean(ctx)
    // widen the scan before the MD5-per-gram shingle stage (the CPU-heavy
    // per-row kernel of this build): an under-split input otherwise runs
    // it near-serially — identity at production split counts
    val shingled = graft.core.Parallelism.widen(
        docs.filter(length(col("text")) >= shingleN))
      .select(col("doc_id"), shingleHash60(col("text"), shingleN).as("hs"))
      .persist() // grouping + the member map both read it
    // NOT persisted (measured, r9): both the posting write and the
    // member-map join re-run this groupBy from the persisted `shingled`,
    // which is ~3x cheaper end-to-end than materializing the grouped
    // rows' nested arrays (hs + member lists) into the block cache —
    // columnar-encoding corpus-wide nested arrays dominates the saved
    // shuffle at every measured SF
    val grouped = shingled
      .groupBy(col("hs"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("grp_n"))
    // cluster each bucket into ONE file before the partitioned write (the
    // graph/text stores' measured rule): without the repartition every
    // write task opens a file in every bucket dir it touches — tasks ×
    // buckets small files that every probe's pruned scan pays to open
    grouped
      .select(col("rep_id"), col("hs"), col("grp_n"),
        explode(TextOps.bandKeys(minhashSig(col("hs"), numPerms),
          numPerms, rowsPerBand)).as("band"))
      .withColumn("bucket", pmod(TextOps.hash60(col("band")), lit(buckets.toLong)))
      .select(col("band"), col("rep_id"), col("hs"), col("grp_n"), col("bucket"))
      .repartition(buckets, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(ctx.dir("postings"))
    // member map (doc → its group's representative), partitioned by the
    // doc-id hash so a tombstone fold opens only the deleted ids' buckets
    shingled
      .join(grouped.select(col("hs"), col("rep_id")), Seq("hs"))
      .select(col("rep_id"), col("doc_id"),
        pmod(TextOps.hash60(col("doc_id").cast("string")), lit(buckets.toLong))
          .as("mbucket"))
      .repartition(buckets, col("mbucket"))
      .write.partitionBy("mbucket").mode("overwrite")
      .parquet(ctx.dir("members"))
    shingled.unpersist()
    ArtifactStore.writeString(ctx.fs,
      new org.apache.hadoop.fs.Path(path, "manifest.json"),
      s"""{"buckets":$buckets,"shingleN":$shingleN,"numPerms":$numPerms,"rowsPerBand":$rowsPerBand}""")
    // a rebuild replaces the corpus, so tombstones recorded against the
    // OLD corpus must not survive to delete fresh docs reusing an id —
    // cleared LAST, after every write has succeeded: a failed or crashed
    // rebuild leaves the delete plane intact (over-suppression, the
    // conservative failure for a takedown plane — never resurrection)
    ArtifactStore.resetMutationPlane(ctx)
    // a fresh build IS its own serve view — exactly one posting row per
    // (band, rep_id) group (each doc belongs to one hs group; reps are
    // the group minima) and a distinct member map — certified only now,
    // after every write (a crashed build leaves no marker)
    ArtifactStore.certifyClean(ctx)
  }

  /** Append one batch of new corpus documents to an EXISTING index: each
    * arriving doc posts as its own representative (grp_n = 1 — no
    * cross-batch collapse; collapse is an optimization, not a semantic,
    * so probing stays exact either way). Replayed batches append
    * byte-identical rows, absorbed by the deterministic max-fold over the
    * pruned slice. Refused loudly while a compaction folds. */
  def appendBatch(batch: DataFrame, path: String,
      compactFactor: Int = 8): Unit = {
    import graft.functions.expressions.ShingleExpressions._
    val spark = batch.sparkSession
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.assertNotCompacting(ctx)
    val (buckets, shingleN, numPerms, rowsPerBand) = manifest(ctx)
    val posting = batch
      .filter(length(col("text")) >= shingleN)
      .select(col("doc_id").as("rep_id"),
        shingleHash60(col("text"), shingleN).as("hs"), lit(1L).as("grp_n"))
      .select(col("rep_id"), col("hs"), col("grp_n"),
        explode(TextOps.bandKeys(minhashSig(col("hs"), numPerms),
          numPerms, rowsPerBand)).as("band"))
      .withColumn("bucket", pmod(TextOps.hash60(col("band")), lit(buckets.toLong)))
      .select(col("band"), col("rep_id"), col("hs"), col("grp_n"), col("bucket"))
      .persist() // written once, then the valve reads the touched buckets
    try {
      // appended rows may duplicate stored ones (at-least-once replays,
      // re-appended representatives): revoke the clean certificate BEFORE
      // the first write ([[ArtifactStore]]'s marker ordering)
      ArtifactStore.revokeClean(ctx)
      posting
        .write.partitionBy("bucket").mode("append")
        .parquet(ctx.dir("postings"))
      // member map rows for the arrivals (each its own representative);
      // replays append duplicates, absorbed by the tombstone fold's distinct
      batch
        .filter(length(col("text")) >= shingleN)
        .select(col("doc_id").as("rep_id"), col("doc_id"),
          pmod(TextOps.hash60(col("doc_id").cast("string")), lit(buckets.toLong))
            .as("mbucket"))
        .write.partitionBy("mbucket").mode("append")
        .parquet(ctx.dir("members"))
      // PRESSURE VALVE on the touched posting buckets (the shared
      // file-count discipline — [[ArtifactStore.maxPartitionFiles]]);
      // the member buckets grow at the same per-batch rate and one
      // compact rewrites both planes
      if (compactFactor > 0) {
        val touched = posting.select(col("bucket")).distinct()
          .collect().map(r => s"bucket=${r.getLong(0)}").toSeq
        if (ArtifactStore.maxPartitionFiles(ctx, "postings", touched)
            > compactFactor.toLong) compact(spark, path)
      }
    } finally posting.unpersist()
  }

  /** Delete documents from the index by TOMBSTONE — O(|ids|) whatever the
    * index size ([[IvfIndexStore.delete]]'s contract on the band axis):
    * tombstones append; [[probe]] folds them in by decrementing the
    * affected groups' member counts over the pruned member slice only.
    * Repeated deletes and delete-then-re-append are both absorbed. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    ArtifactStore.appendTombstones(spark, path, ids)

  /** Fold tombstones and replayed appends into the store
    * ([[IvfIndexStore.compact]]'s contract on the band axis): rewrite
    * postings with group counts decremented by their deleted members
    * (fully-deleted groups dropped) and duplicate (band, rep_id) rows
    * max-folded, rewrite the member map without the deleted docs, then
    * retire the tombstone set. Probing is identical before and after
    * (spec-pinned); both rewrites stage at epoch+1 and commit via ONE
    * atomic marker create, so a crash at any point leaves the live view
    * fully pre- or fully post-compact — no partial-swap window where
    * postings are decremented but tombstones still apply. */
  def compact(spark: SparkSession, path: String): Unit = {
    val ctx = ArtifactStore.open(spark, path)
    ArtifactStore.beginCompact(ctx, Components)
    // replayed appends fold even when NO tombstones exist — the max-fold
    // and member distinct below are exactly what serving pays per probe
    // until compact buys them back, so a store that saw at-least-once
    // replays but no deletes still reclaims its duplicate rows here
    val tombOpt = ArtifactStore.readTombstones(spark, ctx)
    val liveMembers = spark.read.parquet(ctx.dir("members"))
      .select(col("rep_id"), col("doc_id"), col("mbucket")).distinct()
    val folded = foldPostings(spark.read.parquet(ctx.dir("postings")))
    val (keptPostings, keptMembers) = tombOpt match {
      case None => (folded, liveMembers)
      case Some(tomb) =>
        val dec = liveMembers.join(broadcast(tomb), Seq("doc_id"), "left_semi")
          .groupBy(col("rep_id")).agg(count(lit(1)).as("dead_n"))
        val p = folded
          .join(broadcast(dec), Seq("rep_id"), "left")
          .withColumn("grp_n", col("grp_n") - coalesce(col("dead_n"), lit(0L)))
          .filter(col("grp_n") > 0)
          .select(col("band"), col("rep_id"), col("hs"), col("grp_n"), col("bucket"))
        (p, liveMembers.join(broadcast(tomb), Seq("doc_id"), "left_anti"))
    }
    keptPostings.write.partitionBy("bucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "postings"))
    keptMembers.write.partitionBy("mbucket").mode("overwrite")
      .parquet(ArtifactStore.stagingDir(ctx, "members"))
    // the rewrite above IS the serve-view fold: stage epoch+1's clean
    // marker (inert until the commit), commit, GC the old epoch's marker
    ArtifactStore.stageCleanMarker(ctx)
    ArtifactStore.commitCompact(ctx, Components)
    ArtifactStore.retireCleanMarker(ctx)
  }

  /** Continuous index maintenance: stream arriving corpus documents into
    * the postings via [[appendBatch]] per micro-batch (the
    * IvfIndexStore/TextIndexStore discipline on the band axis).
    * SELF-HEALING on restart ([[GraphIndexStore.appendStream]]'s
    * single-maintainer argument): a crashed valve compaction's live-epoch
    * guard is provably this stream's own, so each micro-batch completes
    * it via `compact()` before appending. */
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

  private def manifest(ctx: ArtifactStore.Ctx): (Int, Int, Int, Int) = {
    val txt = ArtifactStore.readString(ctx.fs,
      new org.apache.hadoop.fs.Path(ctx.root, "manifest.json"))
    def field(k: String): Int =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"manifest missing $k")).group(1).toInt
    (field("buckets"), field("shingleN"), field("numPerms"), field("rowsPerBand"))
  }

  /** Probe the index with an arriving batch: per arriving doc, the
    * number of indexed near-dup partners at `threshold` Jaccard and the
    * strongest score — qd15's exact output shape, (doc_id, n_dups,
    * max_jaccard) ordered by doc_id. The scan opens only the probe
    * bands' bucket partitions; candidates go distinct at (new, rep)
    * before one verification pass over the posting rows' own hash
    * arrays. `newDocs` must have (doc_id, text). */
  def probe(spark: SparkSession, path: String, newDocs: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.expressions.ShingleExpressions._
    ArtifactStore.serving(spark, path) { ctx =>
    val (buckets, shingleN, numPerms, rowsPerBand) = manifest(ctx)
    val arriving = newDocs
      .filter(length(col("text")) >= shingleN)
      .select(col("doc_id").as("new_id"),
        shingleHash60(col("text"), shingleN).as("hs_a"))
      .persist() // banding + the verify join both read it
    val newBanded = arriving.select(col("new_id"), col("hs_a"),
      explode(TextOps.bandKeys(minhashSig(col("hs_a"), numPerms),
        numPerms, rowsPerBand)).as("band"))
    // bounded collect: the bucket domain is ≤ B values whatever the
    // batch size — this drives the partition-pruning filter
    val probeBuckets = newBanded
      .select(pmod(TextOps.hash60(col("band")), lit(buckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0)).sorted
    val postingSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("rep_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hs",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("grp_n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    val rawSlice = spark.read.schema(postingSchema).parquet(ctx.dir("postings"))
      .filter(col("bucket").isInCollection(probeBuckets))
    // CLEAN fast path ([[ArtifactStore.isClean]]): a certified-clean
    // store holds exactly one posting row per (band, rep_id) group and no
    // tombstones, so the max-fold (a corpus-wide shuffle when the probe
    // touches most buckets) and the decrement below are identities
    val clean = ArtifactStore.isClean(ctx)
    val pruned = if (clean) rawSlice
      else foldPostings(rawSlice) // deterministic replay/duplicate fold
    // tombstone fold: decrement each affected representative's group
    // count (identical content ⇒ the rep's hash array still stands for
    // the survivors); fully-deleted groups drop out. The member scan
    // opens only the tombstoned ids' hash-bucket partitions, so the cost
    // scales with the takedown list, not the corpus.
    val postings = (if (clean) None
      else ArtifactStore.readTombstones(spark, ctx)) match {
      case None => pruned
      case Some(tomb) =>
        // bounded collect: takedown lists are small by nature; the same
        // hash60 expression as the write side drives the pruning filter
        val tombBuckets = tomb
          .select(pmod(TextOps.hash60(col("doc_id").cast("string")),
            lit(buckets.toLong)).as("mbucket"))
          .distinct().collect().map(_.getLong(0)).sorted
        val memberSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rep_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("mbucket",
            org.apache.spark.sql.types.LongType)))
        val dead = spark.read.schema(memberSchema).parquet(ctx.dir("members"))
          .filter(col("mbucket").isInCollection(tombBuckets))
          .join(broadcast(tomb), Seq("doc_id"), "left_semi")
          .select(col("rep_id"), col("doc_id")).distinct() // absorbs replays
        val dec = dead.groupBy(col("rep_id"))
          .agg(count(lit(1)).as("dead_n"))
        pruned.join(broadcast(dec), Seq("rep_id"), "left")
          .withColumn("grp_n", col("grp_n") - coalesce(col("dead_n"), lit(0L)))
          .filter(col("grp_n") > 0)
          .select(col("band"), col("rep_id"), col("hs"), col("grp_n"), col("bucket"))
    }
    val cand = newBanded.select(col("new_id"), col("band"))
      .join(postings, Seq("band"))
      .select(col("new_id"), col("rep_id"), col("hs").as("hs_b"), col("grp_n"))
      .dropDuplicates("new_id", "rep_id")
    cand
      .join(arriving.select(col("new_id"), col("hs_a")), Seq("new_id"))
      .withColumn("inter", sortedIntersectCount(col("hs_a"), col("hs_b")))
      .select(col("new_id"), col("grp_n"),
        (col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("new_id"))
      .agg(sum(col("grp_n")).as("n_dups"), max(col("jaccard")).as("max_jaccard"))
      .select(col("new_id").as("doc_id"), col("n_dups"), col("max_jaccard"))
      .orderBy(col("doc_id"))
    }
  }
}
