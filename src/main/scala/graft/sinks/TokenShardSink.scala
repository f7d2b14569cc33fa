package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Packed-token binary shard exporter — the format a trainer's data loader
  * actually memory-maps (Megatron-style `.bin` + sidecar manifest): every
  * sequence is exactly `seqLen` tokens, so sequence `i` of a shard lives at
  * byte offset `i * seqLen * tokenBytes` and random access needs no index
  * lookup at all. This is the step after qp11/qp04 packing: parquet is the
  * curation format, packed little-endian integers are the training format.
  *
  * Layout under `path`:
  * {{{
  *   manifest.json            {"seq_len":L,"token_bytes":w,"shards":{"0":n0,...}}
  *   shard=K/tokens.bin       nK * L tokens, little-endian uint16/uint32
  * }}}
  *
  * Scale shape (ShardSink's discipline): membership is the deterministic
  * modulo of the dense sequence index — round-robin striping, the loader
  * convention for packed shards; layout/append invariant given stable
  * sequence ids (qp11's two-phase offsets provide exactly that) — one
  * `repartition(n, shard)` co-locates each shard, rows sort within the
  * partition only, and each executor task streams its shard's bytes
  * straight to the store — the driver sees ONE bounded n-row count table
  * for the manifest, never token data.
  *
  * All byte I/O goes through the Hadoop `FileSystem` resolved from the
  * path's own scheme (the driver's configuration ships to the write tasks
  * via [[ArtifactStore.SerializableConf]]), so the sink targets `file://`,
  * HDFS, or any object-store connector on the classpath — no shared-POSIX
  * assumption.
  *
  * Commit protocol: this sink writes raw bytes outside Spark's file
  * committer, so it implements the same task-commit discipline itself —
  * each task writes to an attempt-unique temp file and renames it into
  * place when the shard's rows are exhausted. A retried task racing a
  * still-running zombie attempt therefore can never interleave two
  * writers into one stream: both produce byte-identical content (the rows
  * are a deterministic sort of a deterministic partition), so whichever
  * attempt commits installs a complete, correct file; a rename refused
  * because the other attempt already committed just drops its own temp.
  */
object TokenShardSink {

  /** Rename `tmp` into `dst`, tolerating a racing attempt that committed
    * identical bytes first (filesystems differ on rename-over-existing:
    * POSIX overwrites, HDFS refuses — both outcomes leave one complete
    * committed file, which is all the protocol needs). */
  private[sinks] def commitRename(fs: FileSystem, tmp: Path, dst: Path): Unit =
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      require(fs.exists(dst), s"rename $tmp -> $dst failed with no committed file")
    }

  /** Write `df(seqCol: bigint, tokensCol: array<int>)` as `n` binary
    * shards. `tokenBytes` ∈ {2, 4}; out-of-range tokens fail the write
    * task loudly (a trainer reading silently-wrapped uint16 is the worst
    * failure mode a data pipeline can ship). */
  def write(df: DataFrame, seqCol: String, tokensCol: String, seqLen: Int,
      n: Int, path: String, tokenBytes: Int = 2): Unit = {
    require(n > 0, s"shard count must be positive, got $n")
    require(tokenBytes == 2 || tokenBytes == 4, s"tokenBytes must be 2 or 4")
    val spark = df.sparkSession
    val sharded = df
      .select(col(seqCol).cast("long").as("seq_id"),
        col(tokensCol).cast("array<int>").as("toks"))
      .withColumn("shard", pmod(col("seq_id"), lit(n.toLong)))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"))
      .persist() // bin write + manifest counts
    val fs = ArtifactStore.fileSystem(spark, path)
    val root = new Path(path)
    fs.mkdirs(root)
    (0 until n).foreach(k => fs.mkdirs(new Path(root, s"shard=$k")))
    val conf = new ArtifactStore.SerializableConf(
      spark.sparkContext.hadoopConfiguration)

    val (pathStr, w, len) = (path, tokenBytes, seqLen)
    import org.apache.spark.sql.Row
    try {
    sharded.foreachPartition { (it: Iterator[Row]) =>
      // rows arrive sorted by (shard, seq_id); hash partitioning may route
      // SEVERAL shards to one task (hash(shard) mod n is not identity), so
      // roll the output stream on shard boundaries. Task-commit discipline:
      // bytes stream into an attempt-unique temp file; the rename into
      // place happens only when the shard's rows are exhausted, so a
      // zombie attempt and its retry can never interleave in tokens.bin.
      val tfs = new Path(pathStr).getFileSystem(conf.value)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var out: java.io.DataOutputStream = null
      var tmp: Path = null
      var dst: Path = null
      val limit = if (w == 2) 1 << 16 else Int.MaxValue
      def commit(): Unit = if (out != null) {
        out.close(); out = null
        commitRename(tfs, tmp, dst)
        tmp = null
      }
      try {
        var shard = Long.MinValue
        it.foreach { r =>
          val s = r.getAs[Long]("shard")
          if (s != shard) {
            commit()
            shard = s
            val dir = new Path(pathStr, s"shard=$s")
            dst = new Path(dir, "tokens.bin")
            tmp = new Path(dir, s".tokens.bin.attempt-$attempt.tmp")
            out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
              tfs.create(tmp, true)))
          }
          val toks = r.getAs[scala.collection.Seq[Int]]("toks")
          require(toks.length == len,
            s"sequence ${r.getAs[Long]("seq_id")} has ${toks.length} tokens, expected $len")
          val buf = ByteBuffer.allocate(len * w).order(ByteOrder.LITTLE_ENDIAN)
          toks.foreach { t =>
            require(t >= 0 && t < limit, s"token $t out of range for $w-byte storage")
            if (w == 2) buf.putShort(t.toShort) else buf.putInt(t)
          }
          out.write(buf.array())
        }
        commit()
      } finally {
        // abort path: never leave a half-written temp behind
        if (out != null) out.close()
        if (tmp != null) tfs.delete(tmp, false)
      }
    }

    // manifest from a bounded n-row aggregate — the only driver-side data
    val counts = sharded.groupBy(col("shard")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shardsJson = (0 until n)
      .map(k => s""""$k":${counts.getOrElse(k.toLong, 0L)}""").mkString(",")
    ArtifactStore.writeString(fs, new Path(root, "manifest.json"),
      s"""{"seq_len":$seqLen,"token_bytes":$tokenBytes,"shards":{$shardsJson}}""")
    // deterministic cache release even when a write task fails (the
    // memory-discipline suites assert a clean slate after ANY sink call)
    } finally sharded.unpersist()
  }

  /** Read one shard back as (seq_index_within_shard, tokens) rows — the
    * trainer-loader view, used by the round-trip spec. */
  def readShard(spark: SparkSession, path: String, shard: Int): Seq[Array[Int]] = {
    val fs = ArtifactStore.fileSystem(spark, path)
    val manifest = ArtifactStore.readString(fs, new Path(path, "manifest.json"))
    val L = """"seq_len":(\d+)""".r.findFirstMatchIn(manifest).get.group(1).toInt
    val w = """"token_bytes":(\d+)""".r.findFirstMatchIn(manifest).get.group(1).toInt
    // an empty shard has a 0-count manifest entry and no tokens.bin (tasks
    // only open files for shards that received rows) — that's a valid
    // empty shard, not a missing file
    val cnt = ("\"" + shard + "\":(\\d+)").r.findFirstMatchIn(manifest)
    if (cnt.exists(_.group(1).toLong == 0L)) return Seq.empty
    val file = new Path(path, s"shard=$shard/tokens.bin")
    val in = fs.open(file)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var r = in.read(chunk)
      while (r >= 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
    require(bytes.length % (L * w) == 0, "shard byte length must be a multiple of one sequence")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / (L * w)).map { _ =>
      val arr = new Array[Int](L)
      var i = 0
      while (i < L) {
        arr(i) = if (w == 2) buf.getShort() & 0xffff else buf.getInt()
        i += 1
      }
      arr
    }
  }
}
