package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path

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
  * visits the driver); the driver reads only the tiny `.zarray` metadata.
  * Fill-value blocks for chunks missing from the store (zarr's
  * sparse-store contract — same fill semantics the VDS/manifest layout
  * pins) are synthesized DISTRIBUTED: the expected chunk grid is a
  * DataFrame (cross product of per-dim ranges), anti-joined against the
  * present file names, and the fill payloads are allocated in executor
  * tasks — the driver never materializes the grid (a 100 TB array at
  * 4 MiB chunks is ~25M grid entries).
  */
object ZarrSource {

  def read(spark: SparkSession, store: String, component: String = "",
      t: Long = 0, name: String = "array"): DeisaArray = {
    val dirStr = if (component.isEmpty) store else s"$store/$component"
    val metaStr = ArtifactStore.readString(
      ArtifactStore.fileSystem(spark, dirStr), new Path(dirStr, ".zarray"))
    def intList(key: String): Seq[Int] = {
      val m = (s""""$key":\\[([0-9, ]*)\\]""").r.findFirstMatchIn(metaStr).get
      m.group(1).split(",").map(_.trim.toInt).toSeq
    }
    val shape = intList("shape")
    val chunks = intList("chunks")
    // on-disk element type: decoded per the .zarray dtype (the codec is a
    // tiny serializable struct broadcast inside the task closures), and
    // the logical dtype rides back onto the DeisaArray
    val codec = ZarrDtype.forZarr(
      "\"dtype\":\"([^\"]+)\"".r.findFirstMatchIn(metaStr).get.group(1))
    val fill = "\"fill_value\":([-0-9.eE]+)".r.findFirstMatchIn(metaStr)
      .map(_.group(1).toDouble).getOrElse(0.0)
    val dims = ZarrSink.readDims(store, component)
    val grid = shape.lazyZip(chunks).map((g, c) => (g + c - 1) / c)
    val gridArr = grid.toIndexedSeq
    val chunkArr = chunks.toIndexedSeq
    val shapeArr = shape.toIndexedSeq

    // ONE binaryFile DataFrame backs both passes below (payload decode +
    // names-only anti-join side): sharing the relation means a single
    // directory listing — on an object store, one LIST instead of two —
    // while the names-only projection still prunes the content column at
    // its scan, so payload bytes are read exactly once. One predicate
    // classifies chunk files for both passes: a numeric name with EXACTLY
    // the array's arity (i.j.k for 3-d) — the two passes can never
    // disagree on what counts as a chunk.
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, concat_ws, substring_index}
    val chunkNamePattern = "^[0-9]+(\\.[0-9]+){" + (chunkArr.length - 1) + "}$"
    val files = spark.read.format("binaryFile").load(dirStr)
      .withColumn("fname", substring_index(col("path"), "/", -1))
      .where(col("fname").rlike(chunkNamePattern))
    val present = files
      .select(col("fname"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (fname, bytes) =>
        val gi = fname.split('.').map(_.toInt)
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val full = new Array[Double](chunkArr.product)
        var i = 0
        while (i < full.length) { full(i) = codec.get(buf); i += 1 }
        // trim the zarr padding on trailing chunks back off
        val pos = gi.indices.map(d => gi(d) * chunkArr(d))
        val extent = gi.indices.map(d => math.min(chunkArr(d), shapeArr(d) - pos(d)))
        val data =
          if (extent == chunkArr) full
          else {
            val ranges = extent.map(e => (0, e)).toArray
            BlockIndex.extract(full, chunkArr.toArray, ranges)._1
          }
        Block(pos, extent, data)
      }

    // missing-chunk synthesis, fully distributed: expected grid = cross
    // product of per-dim ranges (driver holds only the per-dim COUNTS),
    // anti-joined against the present chunk file names (same `files`
    // relation, content pruned at the scan); fill payloads allocate on
    // executors
    val expected = gridArr.indices.foldLeft(
      spark.range(gridArr(0).toLong).select(col("id").cast("int").as("g0"))) {
      case (df, 0) => df
      case (df, d) =>
        df.crossJoin(spark.range(gridArr(d).toLong).select(col("id").cast("int").as(s"g$d")))
    }
    val giCols = gridArr.indices.map(d => col(s"g$d"))
    val presentNames = files.select(col("fname"))
    val fillBlocks = expected
      .withColumn("fname", concat_ws(".", giCols.map(_.cast("string")): _*))
      .join(presentNames, Seq("fname"), "left_anti")
      .select(array(giCols: _*).as("gi"))
      .as[Seq[Int]]
      .map { gi =>
        val pos = gi.indices.map(d => gi(d) * chunkArr(d))
        val extent = gi.indices.map(d => math.min(chunkArr(d), shapeArr(d) - pos(d)))
        Block(pos, extent, Array.fill(extent.product)(fill))
      }
    DeisaArray(present.union(fillBlocks).toDF(), shapeArr, t, name, codec.name, dims)
  }
}
