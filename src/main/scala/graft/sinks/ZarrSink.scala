package graft.sinks

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

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
  * one store, like the reference's `mode="a"`.
  *
  * Edge chunks are padded to the full chunk shape with `fillValue`,
  * as zarr v2 requires; uncompressed (`compressor: null`).
  */
object ZarrSink {

  def write(arr: DeisaArray, store: String, component: String = "",
      fillValue: Double = -1.0): Unit = {
    val gs = arr.globalShape
    // chunk shape: the extent of the block at offset 0 per dim (regular
    // decomposition; trailing blocks may be partial and get padded)
    val firstShapes = arr.df
      .select(col("pos"), col("shape")).collect()
      .map(r => (r.getSeq[Int](0), r.getSeq[Int](1)))
    require(firstShapes.nonEmpty, "cannot write an empty array")
    val chunkShape: Seq[Int] = gs.indices.map { d =>
      firstShapes.collectFirst { case (p, s) if p(d) == 0 => s(d) }
        .getOrElse(firstShapes.head._2(d))
    }
    firstShapes.foreach { case (p, sh) =>
      require(p.lazyZip(chunkShape).forall((off, c) => off % c == 0),
        s"block at offset $p is not aligned to chunk grid $chunkShape — rechunk first")
      // extent check: interior blocks must fill the chunk; only trailing
      // blocks may be smaller (they get padded) — an oversized block would
      // otherwise index out of the padded buffer or misplace values
      gs.indices.foreach { d =>
        require(sh(d) == chunkShape(d) ||
          (sh(d) < chunkShape(d) && p(d) + sh(d) == gs(d)),
          s"block at $p extent ${sh(d)} (dim $d) does not fit chunk ${chunkShape(d)} — rechunk first")
      }
    }

    val dir = if (component.isEmpty) Paths.get(store) else Paths.get(store, component)
    Files.createDirectories(dir)
    if (component.nonEmpty) {
      val zgroup = Paths.get(store, ".zgroup")
      if (!Files.exists(zgroup)) Files.writeString(zgroup, """{"zarr_format":2}""")
    }
    val meta =
      s"""{"chunks":[${chunkShape.mkString(",")}],"compressor":null,"dtype":"<f8",""" +
      s""""fill_value":$fillValue,"filters":null,"order":"C",""" +
      s""""shape":[${gs.mkString(",")}],"zarr_format":2}"""
    Files.writeString(dir.resolve(".zarray"), meta)
    // named dims via the public xarray convention: .zattrs _ARRAY_DIMENSIONS
    if (arr.dims.nonEmpty)
      Files.writeString(dir.resolve(".zattrs"),
        s"""{"_ARRAY_DIMENSIONS":[${arr.dims.map(d => "\"" + d + "\"").mkString(",")}]}""")

    val dirStr = dir.toString
    val cs = chunkShape.toArray
    import arr.df.sparkSession.implicits._
    // executor-side chunk writes
    arr.df.as[Block].foreachPartition { (it: Iterator[Block]) =>
      it.foreach { b =>
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
        val buf = ByteBuffer.allocate(padded.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        padded.foreach(buf.putDouble)
        Files.write(Paths.get(dirStr, gridIdx.mkString(".")), buf.array())
      }
    }
  }

  /** Axis names from .zattrs `_ARRAY_DIMENSIONS` (empty when unnamed). */
  def readDims(store: String, component: String = ""): Seq[String] = {
    val dir = if (component.isEmpty) Paths.get(store) else Paths.get(store, component)
    val f = dir.resolve(".zattrs")
    if (!Files.exists(f)) Seq.empty
    else "\"_ARRAY_DIMENSIONS\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(Files.readString(f)) match {
        case Some(g) =>
          "\"([^\"]*)\"".r.findAllMatchIn(g.group(1)).map(_.group(1)).toSeq
        case None => Seq.empty
      }
  }

  /** Driver-side reader for round-trip tests. */
  def read(store: String, component: String = ""): NDArray = {
    val dir = if (component.isEmpty) Paths.get(store) else Paths.get(store, component)
    val metaStr = Files.readString(dir.resolve(".zarray"))
    def intList(key: String): Seq[Int] = {
      val m = (s""""$key":\\[([0-9, ]*)\\]""").r.findFirstMatchIn(metaStr).get
      m.group(1).split(",").map(_.trim.toInt).toSeq
    }
    val shape = intList("shape")
    val chunks = intList("chunks")
    val out = new Array[Double](shape.product)
    val grid = shape.lazyZip(chunks).map((g, c) => (g + c - 1) / c)
    def walk(idx: List[Int], dims: List[Int]): Seq[List[Int]] = dims match {
      case Nil => Seq(idx.reverse)
      case h :: t => (0 until h).flatMap(i => walk(i :: idx, t))
    }
    walk(Nil, grid.toList).foreach { gi =>
      val f = new File(dir.toFile, gi.mkString("."))
      if (f.exists()) {
        val bytes = Files.readAllBytes(f.toPath)
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val data = Array.fill(chunks.product)(buf.getDouble)
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
