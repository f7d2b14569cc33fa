package graft.sinks

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard exporter — the interchange format multimodal
  * training loaders stream (a plain POSIX-ustar tar per shard; each sample
  * is a group of adjacently-stored members sharing one basename:
  * `000042.txt`, `000042.json`, `000042.bin`, ...). Any `tar` and any
  * webdataset-convention reader can consume the output.
  *
  * Scale shape (ShardSink's discipline): membership is the deterministic
  * 60-bit-hash-mod-n of the sample key (layout/append/cluster-size
  * invariant), one `repartition(n, shard)` co-locates each shard, samples
  * sort by key within the partition only, and each executor task streams
  * its tar straight to the store — the driver never sees sample data.
  *
  * Determinism: headers carry fixed mode/uid/gid/mtime, so two exports of
  * the same data are byte-identical archives (spec-pinned) — trainer-side
  * caches keyed by shard content stay valid across re-exports.
  *
  * All byte I/O goes through the Hadoop `FileSystem` resolved from the
  * path's own scheme ([[TokenShardSink]]'s discipline — the driver conf
  * ships to write tasks via [[ArtifactStore.SerializableConf]]), and the
  * commit protocol is TokenShardSink's: raw bytes stream to an
  * attempt-unique temp file, renamed into place when the shard's rows are
  * exhausted, so a retried task racing a zombie attempt can never
  * interleave two writers — both attempts produce byte-identical content
  * and exactly one complete file ends up committed.
  */
object WebDatasetSink {

  /** Write one tar shard member set per row of `df`: for each `(ext,
    * column)` in `fields`, a member `<key>.<ext>` whose payload is the
    * column's bytes (binary columns verbatim; anything else is cast to
    * string and UTF-8 encoded; null columns emit no member). `key` must
    * render to a tar-safe basename (≤ 90 chars; callers zero-pad numeric
    * ids so lexicographic member order equals numeric sample order). */
  def write(df: DataFrame, key: Column, fields: Seq[(String, Column)],
      n: Int, path: String): Unit = {
    require(fields.nonEmpty, "at least one (extension, column) field required")
    val spark = df.sparkSession
    // resolve the field types via analysis (no execution) — binary columns
    // pass through verbatim, everything else round-trips text as UTF-8
    val resolved = df.select(fields.map(_._2): _*).schema.fields
    val payloadCols = fields.zip(resolved).map { case ((ext, c), f) =>
      val bin =
        if (f.dataType == org.apache.spark.sql.types.BinaryType) c
        else c.cast("string").cast("binary")
      bin.as(s"f_$ext")
    }
    val sharded = ShardSink.assignShards(
        df.select((key.cast("string").as("k") +: payloadCols): _*), col("k"), n)
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("k"))
    val fs = ArtifactStore.fileSystem(spark, path)
    fs.mkdirs(new Path(path))
    val conf = new ArtifactStore.SerializableConf(
      spark.sparkContext.hadoopConfiguration)
    val (pathStr, exts) = (path, fields.map(_._1))
    sharded.foreachPartition { (it: Iterator[Row]) =>
      // hash partitioning may route several shards to one task — roll the
      // stream on shard boundaries (TokenShardSink's loop shape)
      val tfs = new Path(pathStr).getFileSystem(conf.value)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var out: java.io.BufferedOutputStream = null
      var tmp: Path = null
      var dst: Path = null
      def commit(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // archive trailer: two zero blocks
        out.close(); out = null
        TokenShardSink.commitRename(tfs, tmp, dst)
        tmp = null
      }
      try {
        var shard = Long.MinValue
        it.foreach { r =>
          val s = r.getAs[Long]("shard")
          if (s != shard) {
            commit()
            shard = s
            dst = new Path(pathStr, f"shard-$s%05d.tar")
            tmp = new Path(pathStr, f".shard-$s%05d.attempt-$attempt.tmp")
            out = new java.io.BufferedOutputStream(tfs.create(tmp, true))
          }
          val k = r.getAs[String]("k")
          exts.foreach { ext =>
            val payload = r.getAs[Array[Byte]](s"f_$ext")
            if (payload != null) writeMember(out, s"$k.$ext", payload)
          }
        }
        commit()
      } finally {
        if (out != null) out.close()
        if (tmp != null) tfs.delete(tmp, false)
      }
    }
  }

  /** One POSIX-ustar member: 512-byte header, payload, zero padding to a
    * 512 boundary. Fixed mode 0644, uid/gid 0, mtime 0 (determinism). */
  private def writeMember(out: java.io.OutputStream, name: String,
      payload: Array[Byte]): Unit = {
    require(name.getBytes(US_ASCII).length <= 100, s"tar member name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(US_ASCII); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644")  // mode
    put(108, "0000000")  // uid
    put(116, "0000000")  // gid
    put(124, f"${payload.length}%011o") // size
    put(136, "00000000000") // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
    h(156) = '0' // typeflag: regular file
    put(257, "ustar")    // magic, NUL-terminated at 262
    put(263, "00")       // version
    var sum = 0
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(payload)
    val pad = (512 - payload.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Read one shard back as (memberName, payload) rows in archive order —
    * the loader view, used by the round-trip spec. */
  def readShard(spark: SparkSession, path: String, shard: Long): Seq[(String, Array[Byte])] = {
    val fs = ArtifactStore.fileSystem(spark, path)
    val file = new Path(path, f"shard-$shard%05d.tar")
    // a shard no sample hashed into writes no tar — a valid empty shard
    if (!fs.exists(file)) return Seq.empty
    val in = fs.open(file)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var r = in.read(chunk)
      while (r >= 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
    val members = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val name = new String(bytes, off, 100, US_ASCII).takeWhile(_ != '\u0000')
      val size = java.lang.Long.parseLong(
        new String(bytes, off + 124, 11, US_ASCII).trim, 8).toInt
      require(new String(bytes, off + 257, 5, US_ASCII) == "ustar", "not a ustar header")
      members += ((name,
        java.util.Arrays.copyOfRange(bytes, off + 512, off + 512 + size)))
      off += 512 + size + (512 - size % 512) % 512
    }
    members.result()
  }
}
