package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path

import graft.core.{Block, BlockIndex, DeisaArray, NDArray}

/** Chunk-manifest sink — the JVM counterpart of the reference's HDF5
  * Virtual Dataset layout (SURVEY §2.E row E1: per-chunk files linked by a
  * lightweight index, `types.py:397-448`): each block is one raw file
  * written by the executor that holds it; a JSON manifest maps grid
  * offsets to files and records shape/fill semantics. Multiple datasets
  * (E1 dict form) and per-timestep datasets (E4) are directories in one
  * store. Missing chunks read back as the fill value, exactly like the
  * VDS `fillvalue=-1` contract. All I/O goes through the Hadoop
  * `FileSystem` API ([[ArtifactStore]]'s discipline — the driver conf
  * ships to write tasks via [[ArtifactStore.SerializableConf]]), so the
  * store targets `file://`, HDFS, or an object-store connector.
  */
object ManifestSink {

  def write(arr: DeisaArray, store: String, dataset: String,
      fillValue: Double = -1.0): Unit = {
    val spark = arr.df.sparkSession
    val dirStr = s"$store/$dataset"
    val fs = ArtifactStore.fileSystem(spark, dirStr)
    fs.mkdirs(new Path(dirStr))
    val conf = new ArtifactStore.SerializableConf(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    // executor-side: one raw little-endian file per block
    val entries = arr.df.as[Block].map { b =>
      val fname = s"chunk-${b.pos.mkString("_")}.bin"
      val buf = ByteBuffer.allocate(b.data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.data.foreach(buf.putDouble)
      val p = new Path(dirStr, fname)
      val out = p.getFileSystem(conf.value).create(p, true)
      try out.write(buf.array()) finally out.close()
      (b.pos.mkString(","), b.shape.mkString(","), fname)
    }.collect() // tiny: one entry per block
    val dimsField =
      if (arr.dims.isEmpty) ""
      else arr.dims.map(d => "\"" + d + "\"").mkString(",\"dims\":[", ",", "]")
    val manifest = new StringBuilder()
      .append("{\"global_shape\":[").append(arr.globalShape.mkString(","))
      .append("],\"fill_value\":").append(fillValue)
      .append(",\"t\":").append(arr.t)
      .append(dimsField)
      .append(",\"chunks\":[")
    manifest.append(entries.map { case (pos, shape, f) =>
      s"""{"pos":[$pos],"shape":[$shape],"file":"$f"}"""
    }.mkString(","))
    manifest.append("]}")
    ArtifactStore.writeString(fs, new Path(dirStr, "manifest.json"),
      manifest.toString)
  }

  /** Write several arrays as datasets of one store (the reference's
    * `to_hdf5(fname, {name: array})` dict form, `types.py:318-336`). */
  def writeAll(arrays: Map[String, DeisaArray], store: String): Unit =
    arrays.foreach { case (name, arr) => write(arr, store, name) }

  /** Axis names recorded in the manifest (empty when unnamed). */
  def readDims(store: String, dataset: String): Seq[String] = {
    val fs = ArtifactStore.fileSystem(store)
    val m = ArtifactStore.readString(fs, new Path(s"$store/$dataset", "manifest.json"))
    "\"dims\":\\[([^\\]]*)\\]".r.findFirstMatchIn(m) match {
      case Some(g) =>
        "\"([^\"]*)\"".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq
      case None => Seq.empty
    }
  }

  /** Driver-side reader for round-trip tests. */
  def read(store: String, dataset: String): NDArray = {
    val dir = s"$store/$dataset"
    val fs = ArtifactStore.fileSystem(store)
    val m = ArtifactStore.readString(fs, new Path(dir, "manifest.json"))
    def ints(s: String): Seq[Int] =
      if (s.trim.isEmpty) Seq.empty else s.split(",").map(_.trim.toInt).toSeq
    val gs = ints("\"global_shape\":\\[([0-9,]*)\\]".r.findFirstMatchIn(m).get.group(1))
    val fill = "\"fill_value\":([-0-9.eE]+)".r.findFirstMatchIn(m).get.group(1).toDouble
    val out = Array.fill(gs.product)(fill)
    val chunkRe = "\\{\"pos\":\\[([0-9,]*)\\],\"shape\":\\[([0-9,]*)\\],\"file\":\"([^\"]+)\"\\}".r
    chunkRe.findAllMatchIn(m).foreach { cm =>
      val pos = ints(cm.group(1)); val shape = ints(cm.group(2))
      val bytes = readAllBytes(fs, new Path(dir, cm.group(3)))
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val n = shape.product
      var i = 0
      while (i < n) {
        val li = BlockIndex.delinearize(i, shape)
        val gi = li.indices.map(d => li(d) + pos(d)).toArray
        out(BlockIndex.linearize(gi, gs)) = buf.getDouble
        i += 1
      }
    }
    NDArray(gs, out)
  }

  private[sinks] def readAllBytes(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      var r = in.read(chunk)
      while (r >= 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }
}
