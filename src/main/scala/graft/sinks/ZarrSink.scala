package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path

import graft.core.{Block, BlockIndex, DeisaArray, NDArray}
import org.apache.spark.sql.functions.col

/** Zarr v2 sink (SURVEY §2.E row E2; format spec is public:
  * zarr-specs v2, mirrored from the reference's `DeisaArray.to_zarr`,
  * deisa-ray `types.py:271-316`).
  *
  * Layout: `<store>/<component>/.zarray` JSON metadata + one raw C-order
  * little-endian chunk file per block, named `i.j.k`. Chunk writes happen
  * ON THE EXECUTORS (each task writes the blocks it holds — the same
  * write-where-the-data-lives pattern dask uses); only the tiny metadata
  * file is written from the driver. Append mode: multiple components share
  * one store, like the reference's `mode="a"`. All I/O goes through the
  * Hadoop `FileSystem` API ([[ArtifactStore]]'s discipline), so the store
  * targets `file://`, HDFS, or an object-store connector.
  *
  * Edge chunks are padded to the full chunk shape with `fillValue`,
  * as zarr v2 requires; uncompressed (`compressor: null`).
  */
/** Zarr v2 dtype codecs shared by sink and source: the engine stores block
  * payloads as doubles (value semantics — `astype` constrains the values,
  * the `dtype` tag records the logical type); the codec maps them to the
  * on-disk element type, so a store written from an `astype(int32)` array
  * is a real `<i4` zarr any consumer (xarray, zarr-python) reads natively. */
private[sinks] object ZarrDtype {
  final case class Codec(name: String, zname: String, width: Int, integral: Boolean,
      put: (ByteBuffer, Double) => Unit, get: ByteBuffer => Double)

  private val codecs: Seq[Codec] = Seq(
    Codec("float64", "<f8", 8, integral = false, (b, v) => b.putDouble(v), _.getDouble),
    Codec("float32", "<f4", 4, integral = false,
      (b, v) => b.putFloat(v.toFloat), _.getFloat.toDouble),
    Codec("int64", "<i8", 8, integral = true,
      (b, v) => b.putLong(v.toLong), _.getLong.toDouble),
    Codec("int32", "<i4", 4, integral = true,
      (b, v) => b.putInt(v.toInt), _.getInt.toDouble),
    Codec("int16", "<i2", 2, integral = true,
      (b, v) => b.putShort(v.toShort), _.getShort.toDouble),
    Codec("int8", "|i1", 1, integral = true,
      (b, v) => b.put(v.toByte), _.get.toDouble))

  private val aliases = Map(
    "f8" -> "float64", "double" -> "float64", "f4" -> "float32", "float" -> "float32",
    "i8" -> "int64", "long" -> "int64", "i4" -> "int32", "int" -> "int32",
    "i2" -> "int16", "short" -> "int16", "i1" -> "int8", "byte" -> "int8")

  def forDtype(dt: String): Codec = {
    val canonical = aliases.getOrElse(dt, dt)
    codecs.find(_.name == canonical).getOrElse(
      throw new IllegalArgumentException(s"zarr: unsupported dtype '$dt'"))
  }

  def forZarr(zname: String): Codec =
    codecs.find(_.zname == zname).getOrElse(
      throw new IllegalArgumentException(s"zarr: unsupported on-disk dtype '$zname'"))
}

object ZarrSink {

  def write(arr: DeisaArray, store: String, component: String = "",
      fillValue: Double = -1.0): Unit = {
    val gs = arr.globalShape
    val nd = gs.length
    val codec = ZarrDtype.forDtype(arr.dtype)
    // chunk-shape inference runs DISTRIBUTED: the driver receives ONE row
    // of per-dim aggregates, never the block catalog (a 100 TB array is
    // ~25M blocks — this was the sinks' last O(#chunks) driver-side path).
    // Regular decomposition means every block with offset 0 in dim d
    // carries the canonical chunk extent for d (possibly partial when the
    // grid has a single chunk in d); irregular blocks fail loudly in the
    // write tasks below.
    import org.apache.spark.sql.functions.{count => fcount, element_at, lit, max, min, when}
    val aggCols = (0 until nd).flatMap { d =>
      Seq(max(when(element_at(col("pos"), d + 1) === 0,
            element_at(col("shape"), d + 1))).as(s"c$d"),
        min(element_at(col("shape"), d + 1)).as(s"m$d"))
    } :+ fcount(lit(1)).as("n")
    val row = arr.df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    require(row.getAs[Long]("n") > 0L, "cannot write an empty array")
    val chunkShape: Seq[Int] = (0 until nd).map { d =>
      Option(row.getAs[Any](s"c$d")).fold(row.getAs[Int](s"m$d"))(_.asInstanceOf[Int])
    }

    val spark = arr.df.sparkSession
    val dirStr = if (component.isEmpty) store else s"$store/$component"
    val fs = ArtifactStore.fileSystem(spark, dirStr)
    fs.mkdirs(new Path(dirStr))
    if (component.nonEmpty) {
      val zgroup = new Path(store, ".zgroup")
      if (!fs.exists(zgroup))
        ArtifactStore.writeString(fs, zgroup, """{"zarr_format":2}""")
    }
    // integral dtypes get an integral fill_value literal, per zarr v2
    val fillJson = if (codec.integral) fillValue.toLong.toString else fillValue.toString
    val meta =
      s"""{"chunks":[${chunkShape.mkString(",")}],"compressor":null,"dtype":"${codec.zname}",""" +
      s""""fill_value":$fillJson,"filters":null,"order":"C",""" +
      s""""shape":[${gs.mkString(",")}],"zarr_format":2}"""
    ArtifactStore.writeString(fs, new Path(dirStr, ".zarray"), meta)
    // named dims via the public xarray convention: .zattrs _ARRAY_DIMENSIONS
    if (arr.dims.nonEmpty)
      ArtifactStore.writeString(fs, new Path(dirStr, ".zattrs"),
        s"""{"_ARRAY_DIMENSIONS":[${arr.dims.map(d => "\"" + d + "\"").mkString(",")}]}""")

    val conf = new ArtifactStore.SerializableConf(
      spark.sparkContext.hadoopConfiguration)
    val cs = chunkShape.toArray
    val gsArr = gs.toArray
    import arr.df.sparkSession.implicits._
    // executor-side chunk writes; grid-alignment validation happens here
    // too, per block on the executors (an invalid block fails the job with
    // the same "rechunk first" contract message — the driver still never
    // enumerates the grid)
    arr.df.as[Block].foreachPartition { (it: Iterator[Block]) =>
      it.foreach { b =>
        b.pos.lazyZip(cs).foreach { (off, c) =>
          require(off % c == 0,
            s"block at offset ${b.pos} is not aligned to chunk grid ${cs.toSeq} — rechunk first")
        }
        // extent check: interior blocks must fill the chunk; only trailing
        // blocks may be smaller (they get padded) — an oversized block
        // would otherwise index out of the padded buffer or misplace values
        var d = 0
        while (d < gsArr.length) {
          require(b.shape(d) == cs(d) ||
            (b.shape(d) < cs(d) && b.pos(d) + b.shape(d) == gsArr(d)),
            s"block at ${b.pos} extent ${b.shape(d)} (dim $d) does not fit chunk ${cs(d)} — rechunk first")
          d += 1
        }
        val gridIdx = b.pos.toArray.lazyZip(cs).map(_ / _)
        val padded =
          if (b.shape.sameElements(cs)) b.data
          else {
            val out = Array.fill(cs.product)(fillValue)
            var i = 0
            while (i < b.data.length) {
              val li = BlockIndex.delinearize(i, b.shape)
              out(BlockIndex.linearize(li, cs.toIndexedSeq)) = b.data(i)
              i += 1
            }
            out
          }
        val buf = ByteBuffer.allocate(padded.length * codec.width)
          .order(ByteOrder.LITTLE_ENDIAN)
        padded.foreach(v => codec.put(buf, v))
        val p = new Path(dirStr, gridIdx.mkString("."))
        val out = p.getFileSystem(conf.value).create(p, true)
        try out.write(buf.array()) finally out.close()
      }
    }
  }

  /** Axis names from .zattrs `_ARRAY_DIMENSIONS` (empty when unnamed). */
  def readDims(store: String, component: String = ""): Seq[String] = {
    val dirStr = if (component.isEmpty) store else s"$store/$component"
    val fs = ArtifactStore.fileSystem(dirStr)
    val f = new Path(dirStr, ".zattrs")
    if (!fs.exists(f)) Seq.empty
    else "\"_ARRAY_DIMENSIONS\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(ArtifactStore.readString(fs, f)) match {
        case Some(g) =>
          "\"([^\"]*)\"".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq
        case None => Seq.empty
      }
  }

  /** Driver-side reader for round-trip tests. */
  def read(store: String, component: String = ""): NDArray = {
    val dirStr = if (component.isEmpty) store else s"$store/$component"
    val fs = ArtifactStore.fileSystem(dirStr)
    val metaStr = ArtifactStore.readString(fs, new Path(dirStr, ".zarray"))
    def intList(key: String): Seq[Int] = {
      val m = (s""""$key":\\[([0-9, ]*)\\]""").r.findFirstMatchIn(metaStr).get
      m.group(1).split(",").map(_.trim.toInt).toSeq
    }
    val shape = intList("shape")
    val chunks = intList("chunks")
    val codec = ZarrDtype.forZarr(
      "\"dtype\":\"([^\"]+)\"".r.findFirstMatchIn(metaStr).get.group(1))
    val out = new Array[Double](shape.product)
    val grid = shape.lazyZip(chunks).map((g, c) => (g + c - 1) / c)
    def walk(idx: List[Int], dims: List[Int]): Seq[List[Int]] = dims match {
      case Nil => Seq(idx.reverse)
      case h :: t => (0 until h).flatMap(i => walk(i :: idx, t))
    }
    walk(Nil, grid.toList).foreach { gi =>
      val f = new Path(dirStr, gi.mkString("."))
      if (fs.exists(f)) {
        val bytes = ManifestSink.readAllBytes(fs, f)
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val data = Array.fill(chunks.product)(codec.get(buf))
        var i = 0
        while (i < data.length) {
          val li = BlockIndex.delinearize(i, chunks)
          val gidx = li.indices.map(d => gi(d) * chunks(d) + li(d))
          if (gidx.lazyZip(shape).forall(_ < _))
            out(BlockIndex.linearize(gidx.toArray, shape)) = data(i)
          i += 1
        }
      }
    }
    NDArray(shape, out)
  }
}
