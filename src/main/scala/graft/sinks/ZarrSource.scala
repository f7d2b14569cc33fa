package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.core.{Block, BlockIndex, DeisaArray}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Distributed Zarr v2 reader — the source side of [[ZarrSink]], closing
  * the persistence loop: a store written by one run is a first-class input
  * to the next (the reference's arrays are similarly round-tripped through
  * zarr, deisa-ray `types.py:271-316`).
  *
  * Scale shape: chunk PAYLOADS are read on the executors via Spark's
  * `binaryFile` source (one task per group of chunk files, data never
  * visits the driver); the driver reads only the tiny `.zarray` metadata
  * and the file-name listing needed to synthesize fill-value blocks for
  * missing chunks (zarr's sparse-store contract — same fill semantics the
  * VDS/manifest layout pins).
  */
object ZarrSource {

  def read(spark: SparkSession, store: String, component: String = "",
      t: Long = 0, name: String = "array"): DeisaArray = {
    val dir = if (component.isEmpty) Paths.get(store) else Paths.get(store, component)
    val metaStr = Files.readString(dir.resolve(".zarray"))
    def intList(key: String): Seq[Int] = {
      val m = (s""""$key":\\[([0-9, ]*)\\]""").r.findFirstMatchIn(metaStr).get
      m.group(1).split(",").map(_.trim.toInt).toSeq
    }
    val shape = intList("shape")
    val chunks = intList("chunks")
    val fill = "\"fill_value\":([-0-9.eE]+)".r.findFirstMatchIn(metaStr)
      .map(_.group(1).toDouble).getOrElse(0.0)
    val dims = ZarrSink.readDims(store, component)
    val grid = shape.lazyZip(chunks).map((g, c) => (g + c - 1) / c)
    val gridArr = grid.toIndexedSeq
    val chunkArr = chunks.toIndexedSeq
    val shapeArr = shape.toIndexedSeq

    // executor-side payload read: every non-dot file in the store dir is a
    // chunk named i.j.k; binaryFile hands each task its files' bytes
    import spark.implicits._
    val present = spark.read.format("binaryFile")
      .load(dir.toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val fname = path.substring(path.lastIndexOf('/') + 1)
        if (!fname.matches("[0-9]+(\\.[0-9]+)*")) None
        else {
          val gi = fname.split('.').map(_.toInt)
          require(gi.length == chunkArr.length, s"bad chunk name $fname")
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val full = new Array[Double](chunkArr.product)
          var i = 0
          while (i < full.length) { full(i) = buf.getDouble; i += 1 }
          // trim the zarr padding on trailing chunks back off
          val pos = gi.indices.map(d => gi(d) * chunkArr(d))
          val extent = gi.indices.map(d => math.min(chunkArr(d), shapeArr(d) - pos(d)))
          val data =
            if (extent == chunkArr) full
            else {
              val ranges = extent.map(e => (0, e)).toArray
              BlockIndex.extract(full, chunkArr.toArray, ranges)._1
            }
          Some(Block(pos, extent, data))
        }
      }

    // fill-value blocks for chunks missing from the store (driver sees
    // names only; at scale this is the same listing any reader performs)
    val existing: Set[Seq[Int]] = {
      val s = Files.list(dir)
      try s.iterator().asScala // scalastyle:ignore
        .map(_.getFileName.toString)
        .filter(_.matches("[0-9]+(\\.[0-9]+)*"))
        .map(_.split('.').map(_.toInt).toSeq)
        .toSet
      finally s.close()
    }
    def walk(idx: List[Int], ds: List[Int]): Seq[List[Int]] = ds match {
      case Nil => Seq(idx.reverse)
      case h :: tl => (0 until h).flatMap(i => walk(i :: idx, tl))
    }
    val missing = walk(Nil, gridArr.toList).filterNot(existing.contains)
    val blocks =
      if (missing.isEmpty) present
      else {
        val fillBlocks = spark.createDataset(missing.map { gi =>
          val pos = gi.indices.map(d => gi(d) * chunkArr(d))
          val extent = gi.indices.map(d => math.min(chunkArr(d), shapeArr(d) - pos(d)))
          (pos, extent)
        }).map { case (pos, extent) =>
          Block(pos, extent, Array.fill(extent.product)(fill))
        }
        present.union(fillBlocks)
      }
    DeisaArray(blocks.toDF(), shapeArr, t, name, "float64", dims)
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
