package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.core.{Block, BlockIndex, DeisaArray, NDArray}

/** Chunk-manifest sink — the JVM counterpart of the reference's HDF5
  * Virtual Dataset layout (SURVEY §2.E row E1: per-chunk files linked by a
  * lightweight index, `types.py:397-448`): each block is one raw file
  * written by the executor that holds it; a JSON manifest maps grid
  * offsets to files and records shape/fill semantics. Multiple datasets
  * (E1 dict form) and per-timestep datasets (E4) are directories in one
  * store. Missing chunks read back as the fill value, exactly like the
  * VDS `fillvalue=-1` contract.
  */
object ManifestSink {

  def write(arr: DeisaArray, store: String, dataset: String,
      fillValue: Double = -1.0): Unit = {
    val dir = Paths.get(store, dataset)
    Files.createDirectories(dir)
    val dirStr = dir.toString
    import arr.df.sparkSession.implicits._
    // executor-side: one raw little-endian file per block
    val entries = arr.df.as[Block].map { b =>
      val fname = s"chunk-${b.pos.mkString("_")}.bin"
      val buf = ByteBuffer.allocate(b.data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      b.data.foreach(buf.putDouble)
      Files.write(Paths.get(dirStr, fname), buf.array())
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
    Files.writeString(dir.resolve("manifest.json"), manifest.toString)
  }

  /** Write several arrays as datasets of one store (the reference's
    * `to_hdf5(fname, {name: array})` dict form, `types.py:318-336`). */
  def writeAll(arrays: Map[String, DeisaArray], store: String): Unit =
    arrays.foreach { case (name, arr) => write(arr, store, name) }

  /** Axis names recorded in the manifest (empty when unnamed). */
  def readDims(store: String, dataset: String): Seq[String] = {
    val m = Files.readString(Paths.get(store, dataset).resolve("manifest.json"))
    "\"dims\":\\[([^\\]]*)\\]".r.findFirstMatchIn(m) match {
      case Some(g) =>
        "\"([^\"]*)\"".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq
      case None => Seq.empty
    }
  }

  /** Driver-side reader for round-trip tests. */
  def read(store: String, dataset: String): NDArray = {
    val dir = Paths.get(store, dataset)
    val m = Files.readString(dir.resolve("manifest.json"))
    def ints(s: String): Seq[Int] =
      if (s.trim.isEmpty) Seq.empty else s.split(",").map(_.trim.toInt).toSeq
    val gs = ints("\"global_shape\":\\[([0-9,]*)\\]".r.findFirstMatchIn(m).get.group(1))
    val fill = "\"fill_value\":([-0-9.eE]+)".r.findFirstMatchIn(m).get.group(1).toDouble
    val out = Array.fill(gs.product)(fill)
    val chunkRe = "\\{\"pos\":\\[([0-9,]*)\\],\"shape\":\\[([0-9,]*)\\],\"file\":\"([^\"]+)\"\\}".r
    chunkRe.findAllMatchIn(m).foreach { cm =>
      val pos = ints(cm.group(1)); val shape = ints(cm.group(2))
      val bytes = Files.readAllBytes(dir.resolve(cm.group(3)))
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
}
