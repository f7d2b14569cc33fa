package graft.sinks

import scala.util.matching.Regex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance core for the persistent artifact stores
  * ([[IvfIndexStore]], [[BandIndexStore]], [[TextIndexStore]]) and the
  * binary sinks: ALL filesystem metadata I/O goes through the Hadoop
  * `FileSystem` API resolved from the path's own scheme, so the stores
  * run unchanged on `file://`, HDFS, or any object-store connector on the
  * cluster classpath — nothing in the build/serve/compact path touches
  * `java.nio.Files` (which would pin the whole plane to a driver-local
  * POSIX filesystem).
  *
  * EPOCHED LAYOUT + ATOMIC COMMIT. Every rewritable component of a store
  * lives in an epoch-suffixed directory (`postings` at epoch 0,
  * `postings@3` at epoch 3); the live epoch is the max `epoch-N` marker
  * file in the store root (no marker = epoch 0). Compaction stages EVERY
  * folded component at epoch e+1 and then commits by creating the single
  * `epoch-(e+1)` marker — one atomic file create. A crash at ANY point
  * leaves the store readable and correct:
  *   - before the marker: the live view is fully pre-compact (old dirs +
  *     tombstones untouched; stale staging at e+1 is swept by the next
  *     [[beginCompact]]);
  *   - after the marker: the live view is fully post-compact (tombstones
  *     and old dirs are invisible the instant the marker exists — cleanup
  *     of their bytes is garbage collection, not correctness).
  * This closes the partial-swap crash windows a multi-directory
  * move-based swap cannot avoid (decrement-twice after a postings swap
  * that dies before tombstone removal; a live-dir-missing window between
  * two moves; served-stats drift between a doclens swap and the stats
  * rewrite).
  *
  * SINGLE-MAINTAINER CONTRACT, ENFORCED. Appends and deletes that land
  * while a compaction is folding would be silently discarded with the old
  * epoch, so the protocol makes the race loud instead: [[beginCompact]]
  * writes a `_COMPACTING` guard carrying the epoch being folded, and
  * every mutating entry point calls [[assertNotCompacting]], which throws
  * while the guard names the live epoch. A guard naming an OLDER epoch is
  * the footprint of a compact that committed its marker but crashed
  * before cleanup — provably harmless (the flip already happened), so it
  * is swept, not thrown. A compact that crashed BEFORE its commit leaves
  * the guard at the live epoch: mutations keep failing loudly until
  * `compact()` is re-run, which recovers (re-stages from the intact live
  * view) and completes. Serving against a store UNDER ACTIVE COMPACTION
  * remains a documented single-maintainer exclusion (an in-flight read of
  * epoch-e files can race their post-commit garbage collection); crashed
  * compactions, by contrast, never block or corrupt serving.
  */
object ArtifactStore {

  private val EpochMarker: Regex = """epoch-(\d+)""".r

  /** Hadoop `Configuration` is not `Serializable`; executor-side raw-byte
    * writers (TokenShardSink/WebDatasetSink tasks) ship the driver's conf
    * through this wrapper so `Path.getFileSystem` resolves the same
    * filesystem on every node. */
  final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** The Hadoop filesystem owning `root` (scheme-resolved: `file:`,
    * `hdfs:`, `s3a:`, ... — bare paths follow `fs.defaultFS`). */
  def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Scheme-resolved filesystem for driver-side utility readers that have
    * no session at hand (round-trip test readers); a default
    * `Configuration` resolves explicit URIs identically and bare paths to
    * the local FS. */
  def fileSystem(root: String): FileSystem =
    new Path(root).getFileSystem(new Configuration())

  /** A store handle pinned to the live epoch AT OPEN. Each public store
    * operation opens one context and resolves every component through it,
    * so one operation never mixes epochs. */
  final case class Ctx(fs: FileSystem, root: String, epoch: Long) {
    /** Live directory (or file) path of an epoched component. Epoch 0 is
      * unsuffixed — a store that has never compacted keeps the plain
      * `postings/` layout. */
    def dir(name: String): String =
      if (epoch == 0L) s"$root/$name" else s"$root/$name@$epoch"
    def path(name: String): Path = new Path(dir(name))
    def rootPath: Path = new Path(root)
    def exists(name: String): Boolean = fs.exists(path(name))
  }

  def open(spark: SparkSession, root: String): Ctx = {
    val fs = fileSystem(spark, root)
    Ctx(fs, root, currentEpoch(fs, new Path(root)))
  }

  private def currentEpoch(fs: FileSystem, root: Path): Long =
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).iterator.map(_.getPath.getName).collect {
      case EpochMarker(n) => n.toLong
    }.foldLeft(0L)(math.max)

  // ---- small string-file helpers (manifests, stats, markers) ----

  def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** File names directly under `dir` (empty when the dir is absent). */
  def listNames(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).iterator.map(_.getPath.getName).toSeq

  // ---- tombstones (shared delete plane) ----

  /** O(|ids|) tombstone append into the live epoch's tombstone set.
    * Mutating, so it respects the compaction guard. */
  def appendTombstones(spark: SparkSession, root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    val ctx = open(spark, root)
    assertNotCompacting(ctx)
    ids.toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(ctx.dir("tombstones"))
  }

  /** The live epoch's distinct tombstoned ids, if any (column `doc_id`). */
  def readTombstones(spark: SparkSession, ctx: Ctx): Option[DataFrame] =
    if (!ctx.exists("tombstones"))
      None
    else
      Some(spark.read.parquet(ctx.dir("tombstones"))
        .select(col("doc_id")).distinct())

  // ---- compaction protocol ----

  private def guardPath(ctx: Ctx): Path = new Path(ctx.root, "_COMPACTING")

  /** The epoch named by an existing `_COMPACTING` guard, parsed
    * DEFENSIVELY: a crash mid-write of the guard file on a non-atomic
    * filesystem can leave it empty or truncated, and an unparsable guard
    * must degrade to "assume the live epoch is compacting" (mutations
    * fail loudly; [[beginCompact]] overwrites it so compact() still
    * recovers) — never to a NumberFormatException that wedges both the
    * mutation AND the recovery path until someone hand-deletes the file. */
  private def guardEpoch(ctx: Ctx): Option[Long] =
    scala.util.Try(readString(ctx.fs, guardPath(ctx)).trim.toLong).toOption

  /** Throw if a compaction of the LIVE epoch is (or crashed while)
    * in-flight; sweep a stale guard left by a compact that committed but
    * died before cleanup. Every mutating store entry point calls this. */
  def assertNotCompacting(ctx: Ctx): Unit = {
    val g = guardPath(ctx)
    if (ctx.fs.exists(g)) {
      guardEpoch(ctx) match {
        case Some(folded) if folded < ctx.epoch =>
          ctx.fs.delete(g, false) // post-commit crash footprint: flip already happened
        case folded => // live-epoch guard, or unparsable (treated as live)
          throw new IllegalStateException(
            s"store ${ctx.root} is compacting epoch ${folded.getOrElse(ctx.epoch)} " +
              "(or a compaction of it crashed before commit); mutations would " +
              "be silently discarded by the fold — re-run compact() to " +
              "complete it, then retry")
      }
    }
  }

  /** THE bounded driver-side collect every store serve path uses: take
    * cap+1 and fail LOUDLY past the cap, with call-site-specific
    * remediation (query paths point at their distributed twin; append
    * paths at batch splitting). One definition — the cap-check shape must
    * not drift per store, the [[graft.functions.Ranking]] rationale. */
  def collectBounded[T](ds: org.apache.spark.sql.Dataset[T], cap: Int,
      what: String, remedy: String): Array[T] = {
    val rows = ds.take(cap + 1)
    require(rows.length <= cap, s"$what exceeds $cap rows — $remedy")
    rows
  }

  /** Cap on the ENUMERABLE query-batch meta domain for filtered batch
    * serving — while the batch's distinct (non-null) meta values fit,
    * they drive a partition filter on the meta axis; past the cap the
    * serve falls back to cell-only directory pruning with the predicate
    * still carried by the (cell, meta) join key (graceful degradation,
    * never a driver OOM, never an incomplete prune). ONE definition
    * across the three meta-scoped stores (IVF / IVF-PQ / MaxSim) so the
    * threshold and its fallback semantics cannot drift per store — the
    * [[collectBounded]] rationale on the meta axis. Conf-overridable so
    * specs can pin the >cap fallback with a handful of labels instead
    * of materializing 1025 partition directories. */
  def maxMetaFilter(spark: SparkSession): Int =
    spark.conf.get("graft.store.maxMetaFilter", "1024").toInt

  /** PRESSURE-VALVE metric shared by the appendStream family — the
    * file-count sibling of [[graft.sinks.GraphIndexStore]]'s per-src
    * row-count valve: every appendBatch adds files under its touched
    * partition directories (one per writing task — micro-batches are
    * single-task or coalesced, so typically one per batch), and serving
    * a partition opens ALL its files, so a long append-only stream grows
    * per-partition file counts (plus replayed/duplicate rows) linearly
    * in micro-batches — exactly the footprint `compact()` reclaims (it
    * rewrites each partition to one file and folds the duplicates).
    * Whatever the per-batch file rate, the valve invariant holds: a
    * partition observed past the factor compacts back to one file, so
    * footprints stay bounded by factor + one batch's width. Lists ONLY the
    * touched directories (a bounded set the append itself knows) through
    * the Hadoop FS and returns the max PER-LEAF-DIRECTORY data-file count
    * — the unit a pruned serve actually opens: a flat `cell=N` layout
    * counts its own files, while a nested `(cell, meta)` layout counts
    * per `meta=V` subdirectory (summing ACROSS meta subdirs would measure
    * files-per-cell and make a many-label store cross the factor — and
    * compact — on nearly every append). A missing directory counts 0.
    * Callers compact when the max exceeds their compactFactor, which
    * bounds every served partition's footprint at compactFactor files
    * under any append stream. */
  def maxPartitionFiles(ctx: Ctx, component: String,
      partDirs: Seq[String]): Long =
    partDirs.map { d =>
      val p = new Path(ctx.dir(component), d)
      if (!ctx.fs.exists(p)) 0L
      else {
        val perDir = scala.collection.mutable.HashMap.empty[String, Long]
        val it = ctx.fs.listFiles(p, true)
        while (it.hasNext) {
          val s = it.next()
          val name = s.getPath.getName
          if (s.isFile && !name.startsWith("_") && !name.startsWith(".")) {
            val parent = s.getPath.getParent.toString
            perDir.update(parent, perDir.getOrElse(parent, 0L) + 1L)
          }
        }
        perDir.valuesIterator.foldLeft(0L)(math.max)
      }
    }.foldLeft(0L)(math.max)

  /** True when a `_COMPACTING` guard names the LIVE epoch (or is
    * unparsable) — the footprint of a compaction that crashed before its
    * commit, which blocks every mutation until `compact()` re-runs. A
    * store's SINGLE MAINTAINER (e.g. the one appendStream feeding it —
    * the protocol guarantees no concurrent folder) may use this to
    * self-heal on restart: pending ⇒ complete the crashed fold, then
    * proceed. Multi-party callers must NOT auto-complete on this signal —
    * for them a live-epoch guard may be an ACTIVE compaction. */
  def crashedCompactPending(spark: SparkSession, root: String): Boolean = {
    val ctx = open(spark, root)
    ctx.fs.exists(guardPath(ctx)) && !guardEpoch(ctx).exists(_ < ctx.epoch)
  }

  // ---- clean-store certificate (serve-fold fast path) ----
  //
  // Every store's serve path starts by FOLDING the stored planes into the
  // serve view: dedup replayed at-least-once appends, anti-join tombstones,
  // decrement group counts, sum stat increments. On a store with no
  // mutations since its last build/compact that fold is an IDENTITY
  // recomputed per serve — on the corpus-batch paths it is a corpus-wide
  // shuffle per call. The `_clean-<epoch>` marker certifies "the stored
  // planes ARE their own serve view", letting serving read them VERBATIM.
  //
  // State machine (every store follows it; GraphIndexStoreSpec +
  // StoreHardeningSpec pin it per store):
  //   - build()  revokes the live marker BEFORE its first write (a rebuild
  //     in place must not leave the old marker certifying half-overwritten
  //     planes) and certifies LAST, after every write + resetMutationPlane
  //     (a crashed build leaves no marker — the fold runs, always safe);
  //   - append*() revokes BEFORE its first write (duplicates/replays may
  //     now exist; a crash after the revoke leaves a dirty-but-correct
  //     store);
  //   - delete() needs nothing: [[isClean]] also requires an EMPTY
  //     tombstone set, so tombstone presence revokes independently of the
  //     marker file;
  //   - compact() STAGES the next epoch's marker before the atomic commit
  //     (inert until the epoch flips — the rewrite IS the fold, so the
  //     post-compact view is clean by construction) and garbage-collects
  //     the superseded epoch's marker after.
  // The marker is EPOCH-NAMED so it can never certify planes it did not
  // describe: a crashed compact's staged marker names a dead epoch until
  // the commit makes it true. False is always safe (the full fold runs);
  // true is proven by the writers' ordering above.

  /** The clean-store marker path of `epoch` under `ctx`'s root. */
  def cleanMarker(ctx: Ctx, epoch: Long): Path =
    new Path(ctx.root, s"_clean-$epoch")

  /** True when serving may read the stored planes VERBATIM: the live
    * epoch carries its clean marker AND no tombstones landed since. */
  def isClean(ctx: Ctx): Boolean =
    ctx.fs.exists(cleanMarker(ctx, ctx.epoch)) && !ctx.exists("tombstones")

  /** Mutators call this BEFORE their first data write (state machine
    * above); idempotent when no marker exists. */
  def revokeClean(ctx: Ctx): Unit =
    ctx.fs.delete(cleanMarker(ctx, ctx.epoch), false)

  /** build() calls this LAST, after every data write has succeeded (and
    * after [[resetMutationPlane]] — cleanliness requires an empty
    * tombstone set). */
  def certifyClean(ctx: Ctx): Unit =
    writeString(ctx.fs, cleanMarker(ctx, ctx.epoch), "")

  /** compact() calls this after staging every component and BEFORE
    * [[commitCompact]]: the staged marker names epoch+1, so it is inert
    * until the commit flips the live epoch to match — a crash before the
    * commit leaves the pre-compact view with its own marker state
    * untouched. */
  def stageCleanMarker(ctx: Ctx): Unit =
    writeString(ctx.fs, cleanMarker(ctx, ctx.epoch + 1), "")

  /** compact() calls this after [[commitCompact]]: garbage-collect the
    * superseded epoch's marker (correctness never depends on it — a stale
    * marker names a dead epoch). */
  def retireCleanMarker(ctx: Ctx): Unit =
    ctx.fs.delete(cleanMarker(ctx, ctx.epoch), false)

  /** Operational HEALTH snapshot of a store's persistence plane — the
    * observability surface behind compaction-cadence decisions (when the
    * valve is disabled and a deploy schedules its own maintenance): one
    * (metric, value) row per signal, all driver-side FS listings plus one
    * bounded tombstone count, nothing corpus-proportional.
    *
    *   - `epoch`            live epoch (compactions completed)
    *   - `clean`            1 when [[isClean]] (serve-fold fast path active)
    *   - `compacting`       1 when a `_COMPACTING` guard names the LIVE
    *                        epoch or is unparsable (an active or crashed
    *                        fold — mutations are blocked). A stale
    *                        post-commit guard (naming an older epoch —
    *                        provably harmless, swept by the next mutation)
    *                        reports 0: automation keyed on this flag must
    *                        not re-run compact() for a flip that already
    *                        happened ([[crashedCompactPending]]'s check).
    *   - `tombstones`       distinct tombstoned ids awaiting the next fold
    *   - `<comp>_files`     data files in the component's live epoch
    *   - `<comp>_bytes`     their total size
    *   - `<comp>_max_leaf_files`  max files in one served leaf partition
    *                        (the valve metric — serving opens all of them)
    *
    * Every store exposes this through its own `health()` wrapper naming
    * its components. Spec-pinned through the mutation state machine. */
  def health(spark: SparkSession, root: String,
      components: Seq[String]): DataFrame = {
    import spark.implicits._
    val ctx = open(spark, root)
    val tombs = readTombstones(spark, ctx).map(_.count()).getOrElse(0L)
    val perComp = components.flatMap { c =>
      val p = ctx.path(c)
      var files = 0L; var bytes = 0L
      val perDir = scala.collection.mutable.HashMap.empty[String, Long]
      if (ctx.fs.exists(p)) {
        val it = ctx.fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          val name = st.getPath.getName
          if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
            files += 1L; bytes += st.getLen
            val parent = st.getPath.getParent.toString
            perDir.update(parent, perDir.getOrElse(parent, 0L) + 1L)
          }
        }
      }
      Seq((s"${c}_files", files), (s"${c}_bytes", bytes),
        (s"${c}_max_leaf_files", perDir.valuesIterator.foldLeft(0L)(math.max)))
    }
    (Seq(
      ("epoch", ctx.epoch),
      ("clean", if (isClean(ctx)) 1L else 0L),
      ("compacting", if (ctx.fs.exists(guardPath(ctx)) &&
        !guardEpoch(ctx).exists(_ < ctx.epoch)) 1L else 0L),
      ("tombstones", tombs)) ++ perComp)
      .toDF("metric", "value")
  }

  /** Validate a metadata-scope column name BEFORE it is interpolated into
    * a store's manifest.json (IvfIndexStore / IvfPqIndexStore /
    * GraphIndexStore all embed it verbatim and parse it back with a
    * `"meta":"([^"]+)"` regex): a name containing a quote or backslash
    * would write a manifest that parses wrong — or not at all — and
    * silently break every later scoped serve/append/compact on the
    * store. Identifier-safe names only, refused loudly at build time. */
  def requireValidMetaCol(metaCol: Option[String]): Unit =
    metaCol.foreach(m => require(m.matches("[A-Za-z0-9_]+"),
      s"metaCol '$m' must match [A-Za-z0-9_]+ — the name is embedded " +
        "verbatim in the store's manifest.json"))

  /** Reset the MUTATION PLANE when a store is REBUILT in place: build()
    * overwrites the data components, so tombstones recorded against the
    * previous corpus must not survive to silently delete fresh docs that
    * happen to reuse an id. Every store's build() calls this LAST, after
    * all data writes have succeeded — a failed or crashed rebuild leaves
    * the delete plane intact, so the worst partial state over-suppresses
    * (conservative for a takedown plane) instead of resurrecting deleted
    * documents. */
  def resetMutationPlane(ctx: Ctx): Unit =
    ctx.fs.delete(ctx.path("tombstones"), true)

  /** Run a serve-path DataFrame construction with RETRY-ONCE-AT-NEW-EPOCH:
    * a serve racing a compaction commit can open ctx at epoch e and then
    * lose e's files to the post-commit garbage collection before (or
    * while) `spark.read.parquet` lists them. If construction fails AND
    * the live epoch has advanced past the one we opened, the race is
    * proven — reopen at the new epoch and retry once (the post-compact
    * view serves identically by the compact contract). Any other failure
    * rethrows untouched. Failures of already-constructed plans at ACTION
    * time remain the documented single-maintainer exclusion — this
    * converts the common planning-time window into a liveness guarantee.
    *
    * CONTRACT for `f`: it may run twice, so it must clean up any side
    * effects (persisted intermediates, temp files) of a FAILED attempt
    * before rethrowing — otherwise the retry leaks attempt 1's state into
    * the block cache until some caller happens to clearCache (the
    * `IvfIndexStore.*Batch` paths unpersist their posted-query cache on
    * failure for exactly this reason). */
  def serving[T](spark: SparkSession, root: String)(f: Ctx => T): T = {
    val ctx = open(spark, root)
    try f(ctx)
    catch {
      case scala.util.control.NonFatal(e) =>
        val nowLive = currentEpoch(ctx.fs, ctx.rootPath)
        if (nowLive > ctx.epoch) f(Ctx(ctx.fs, root, nowLive))
        else throw e
    }
  }

  /** Start a compaction of `ctx.epoch`: sweep any non-live versions of
    * the named components (staging left by a crashed attempt, or old-epoch
    * garbage a crashed cleanup missed), then raise the guard. Idempotent —
    * re-running after a pre-commit crash recovers and proceeds (an
    * unparsable crashed guard is simply overwritten). */
  def beginCompact(ctx: Ctx, names: Seq[String]): Unit = {
    val g = guardPath(ctx)
    if (ctx.fs.exists(g) && guardEpoch(ctx).exists(_ < ctx.epoch))
      ctx.fs.delete(g, false)
    sweepStale(ctx, names)
    writeString(ctx.fs, g, ctx.epoch.toString)
  }

  /** Staging path of a component for the NEXT epoch (compact writes
    * here; [[commitCompact]] makes it live). */
  def stagingDir(ctx: Ctx, name: String): String = s"${ctx.root}/$name@${ctx.epoch + 1}"

  /** THE commit point: one atomic marker create flips the live view to
    * epoch+1 (tombstones and every old component version become invisible
    * together). Everything after the marker is garbage collection. */
  def commitCompact(ctx: Ctx, names: Seq[String]): Unit = {
    val fs = ctx.fs
    writeString(fs, new Path(ctx.root, s"epoch-${ctx.epoch + 1}"), "")
    // -- live view is now fully post-compact; best-effort cleanup below --
    fs.delete(guardPath(ctx), false)
    names.foreach { n => fs.delete(ctx.path(n), true) }
    fs.delete(ctx.path("tombstones"), true)
    if (ctx.epoch > 0L) fs.delete(new Path(ctx.root, s"epoch-${ctx.epoch}"), false)
  }

  /** Delete every version of `names` that is not the live epoch's. */
  private def sweepStale(ctx: Ctx, names: Seq[String]): Unit = {
    val versioned = names.toSet + "tombstones"
    listNames(ctx.fs, ctx.rootPath).foreach { entry =>
      val (base, ep) = entry.split('@') match {
        case Array(b, e) if e.forall(_.isDigit) => (b, e.toLong)
        case _ => (entry, 0L)
      }
      if (versioned.contains(base) && ep != ctx.epoch)
        ctx.fs.delete(new Path(ctx.root, entry), true)
    }
  }
}
