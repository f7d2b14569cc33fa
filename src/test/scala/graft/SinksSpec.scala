package graft

import java.nio.file.Files

import graft.core._
import graft.sinks.{ManifestSink, ZarrSink}
import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the persistence round trips (reference
  * tests/test_saving_dask_arrays.py): write arrays from inside a callback
  * at the final timestep — single dataset, multi-dataset store, zarr
  * component, per-timestep datasets — reopen and compare. */
class SinksSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark

  private def mkArr(t: Long, scale: Double = 1.0): DeisaArray = {
    val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()
    DeisaArray.fromChunks(spark,
      (0 to 1).map(r => ChunkRow("array", t, Seq(0, r), Seq(1, 1),
        Array(scale * t * (r + 1)), "float64")), meta, t)
  }

  test("zarr round trip, incl. append mode with components") {
    val store = Files.createTempDirectory("graft-zarr").toString
    val a = mkArr(5)
    ZarrSink.write(a, store, "data")
    ZarrSink.write(a * 2.0, store, "data2") // append second component
    val back = ZarrSink.read(store, "data")
    assert(back.shape == Seq(1, 2) && back.data.toSeq == Seq(5.0, 10.0))
    val back2 = ZarrSink.read(store, "data2")
    assert(back2.data.toSeq == Seq(10.0, 20.0))
  }

  test("zarr pads partial edge chunks with the fill value") {
    val meta = ArrayMeta("a", Seq(3), Seq(3)).validate()
    val arr = DeisaArray.fromChunks(spark,
      Seq(ChunkRow("a", 0, Seq(0), Seq(3), Array(1.0, 2.0, 3.0), "float64")), meta, 0)
    // slice to length 2 -> single unaligned-extent block, still offset 0
    val sliced = arr.slice(Seq((0, 2)))
    val store = Files.createTempDirectory("graft-zarr-pad").toString
    ZarrSink.write(sliced, store)
    val back = ZarrSink.read(store)
    assert(back.shape == Seq(2) && back.data.toSeq == Seq(1.0, 2.0))
  }

  test("3-D zarr round trip over a multi-block grid") {
    val meta = ArrayMeta("vol", Seq(4, 4, 2), Seq(2, 2, 2)).validate()
    val rng = new scala.util.Random(3)
    val chunks = for (i <- 0 until 2; j <- 0 until 2; k <- 0 until 1) yield
      ChunkRow("vol", 0, Seq(i, j, k), Seq(2, 2, 2),
        Array.fill(8)(rng.nextInt(100).toDouble), "float64")
    val arr = DeisaArray.fromChunks(spark, chunks, meta, 0)
    val dense = arr.compute()
    val store = java.nio.file.Files.createTempDirectory("graft-zarr3d").toString
    ZarrSink.write(arr, store)
    val back = ZarrSink.read(store)
    assert(back.shape == Seq(4, 4, 2))
    assert(back.data.toSeq == dense.data.toSeq)
  }

  test("manifest (VDS-equivalent) round trip: single + multi dataset") {
    val store = Files.createTempDirectory("graft-manifest").toString
    val a = mkArr(5)
    val b = mkArr(5, scale = 3.0)
    ManifestSink.writeAll(Map("a" -> a, "b" -> b), store)
    assert(ManifestSink.read(store, "a").data.toSeq == Seq(5.0, 10.0))
    assert(ManifestSink.read(store, "b").data.toSeq == Seq(15.0, 30.0))
  }

  test("per-timestep datasets written from the windowed loop (E4)") {
    val store = Files.createTempDirectory("graft-ts").toString
    val meta = ArrayMeta("array", Seq(1, 2), Seq(1, 1)).validate()
    val ex = new WindowedExecutor(spark, Seq(meta))
    val asm = new LocalAssembler(ex, Seq(meta))
    ex.registerCallback(Seq(ArrayWindow("array"))) { args =>
      val arr = args("array").last
      ManifestSink.write(arr, store, arr.t.toString)
    }
    for (t <- 0L until 6L)
      for (r <- 0 to 1)
        asm.push(ChunkRow("array", t, Seq(0, r), Seq(1, 1),
          Array((t * (r + 1)).toDouble), "float64"))
    asm.close(6)
    for (t <- 0L until 6L)
      assert(ManifestSink.read(store, t.toString).data.toSeq == Seq(t.toDouble, 2.0 * t))
    ex.shutdown()
  }

  test("named dims round-trip through both sinks and track ops (C20)") {
    val named = mkArr(2).withDims(Seq("y", "x"))
    // propagation: transpose permutes, reduceAxis drops, slice keeps
    assert(named.T.dims == Seq("x", "y"))
    assert(named.reduceAxis(0, "sum").dims == Seq("x"))
    assert(named.slice(Seq((0, 1), (0, 2))).dims == Seq("y", "x"))
    assert((named * 2.0).dims == Seq("y", "x"))
    assert(named.axisOf("x") == 1)
    intercept[IllegalArgumentException] { named.axisOf("z") }
    intercept[IllegalArgumentException] { mkArr(2).withDims(Seq("only-one")) }
    // sinks persist the names (zarr: xarray _ARRAY_DIMENSIONS convention)
    val zs = Files.createTempDirectory("graft-zarr-dims").toString
    ZarrSink.write(named, zs, "data")
    assert(ZarrSink.readDims(zs, "data") == Seq("y", "x"))
    val ms = Files.createTempDirectory("graft-mani-dims").toString
    ManifestSink.write(named, ms, "data")
    assert(ManifestSink.readDims(ms, "data") == Seq("y", "x"))
    // unnamed arrays stay unnamed end to end
    val zs2 = Files.createTempDirectory("graft-zarr-nodims").toString
    ZarrSink.write(mkArr(2), zs2, "data")
    assert(ZarrSink.readDims(zs2, "data").isEmpty)
  }

  test("distributed zarr read round-trips arrays, edge padding, fill, dims") {
    import graft.sinks.ZarrSource
    // 2-D multi-block with a trailing partial chunk on dim 1
    val meta = ArrayMeta("z", Seq(4, 5), Seq(2, 5)).validate()
    val src = DeisaArray.fromChunks(spark,
      (0 to 1).map(r => ChunkRow("z", 3, Seq(r, 0), Seq(2, 5),
        Array.tabulate(10)(i => (r * 10 + i).toDouble), "float64")), meta, 3)
      .withDims(Seq("row", "col"))
    val store = Files.createTempDirectory("graft-zarr-rt").toString
    ZarrSink.write(src.slice(Seq((0, 4), (0, 3))), store, "data") // 4x3: edge chunks padded
    val back = ZarrSource.read(spark, store, "data", t = 7, name = "z2")
    assert(back.globalShape == Seq(4, 3) && back.t == 7 && back.dims == Seq("row", "col"))
    val nd = back.compute()
    val expect = src.slice(Seq((0, 4), (0, 3))).compute()
    assert(nd.shape == expect.shape && nd.data.toSeq == expect.data.toSeq)
    // distributed ops run directly over the re-read array
    assert(back.sumScalar().compute() == expect.data.sum)
    // missing chunk -> fill value (delete one chunk file)
    val store2 = Files.createTempDirectory("graft-zarr-miss").toString
    ZarrSink.write(src, store2, "data", fillValue = -7.0)
    Files.delete(java.nio.file.Paths.get(store2, "data", "1.0"))
    val sparse = ZarrSource.read(spark, store2, "data").compute()
    assert((0 until 10).forall(i => sparse.data(i) == i.toDouble))
    assert((10 until 20).forall(i => sparse.data(i) == -7.0))
  }

  test("zarr persists logical dtypes: int32/float32 stores round-trip") {
    import graft.sinks.ZarrSource
    val meta = ArrayMeta("d", Seq(2, 2), Seq(1, 2)).validate()
    val src = DeisaArray.fromChunks(spark,
      (0 to 1).map(r => ChunkRow("d", 0, Seq(r, 0), Seq(1, 2),
        Array(r * 10 + 1.75, -(r * 10 + 2.5)), "float64")), meta, 0)
    // int32: astype truncates values toward zero; the store must be a real
    // <i4 zarr (4-byte elements, integral fill), read back with the dtype
    val i32 = src.astype("int32")
    val store = Files.createTempDirectory("graft-zarr-i4").toString
    ZarrSink.write(i32, store, "data", fillValue = -1.0)
    val zarray = Files.readString(java.nio.file.Paths.get(store, "data", ".zarray"))
    assert(zarray.contains("\"dtype\":\"<i4\"") && zarray.contains("\"fill_value\":-1"))
    assert(Files.size(java.nio.file.Paths.get(store, "data", "0.0")) == 2 * 4) // 4B/elem
    assert(ZarrSink.read(store, "data").data.toSeq == Seq(1.0, -2.0, 11.0, -12.0))
    val back = ZarrSource.read(spark, store, "data")
    assert(back.dtype == "int32")
    assert(back.compute().data.toSeq == Seq(1.0, -2.0, 11.0, -12.0))
    // float32: values round through single precision on disk
    val f32 = src.astype("float32")
    val store2 = Files.createTempDirectory("graft-zarr-f4").toString
    ZarrSink.write(f32, store2, "data")
    val back2 = ZarrSource.read(spark, store2, "data")
    assert(back2.dtype == "float32")
    assert(back2.compute().data.toSeq ==
      Seq(1.75f, -2.5f, 11.75f, -12.5f).map(_.toDouble))
  }

  test("shard export: deterministic membership, bounded files, exact round trip") {
    import graft.sinks.ShardSink
    import org.apache.spark.sql.functions._
    val spark = GraftTestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 8
    ShardSink.write(docs, col("doc_id"), n, dir, col("doc_id"),
      maxRecordsPerFile = 40)

    // layout: shard=K directories, every parquet file within bounds
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.nonEmpty && shardDirs.forall(_.matches("shard=\\d+")))
    val back = spark.read.parquet(dir)
    val fileRows = back.groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(fileRows.forall(_ <= 40), s"file over maxRecordsPerFile: ${fileRows.max}")

    // exact round trip (shard column added, everything else preserved)
    assert(back.count() == docs.count())
    val origIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet == origIds)

    // membership is the stateless hash convention, independent of layout:
    // recompute from doc_id alone and compare; re-export under a different
    // partitioning must give identical membership
    val expected = ShardSink.assignShards(docs.select("doc_id"), col("doc_id"), n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    ShardSink.write(docs.repartition(13), col("doc_id"), n, dir2, col("doc_id"))
    val again = spark.read.parquet(dir2)
      .select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == expected, "membership must be layout-invariant")
  }

  test("jsonl shard export: gzipped lines, same membership convention, exact round trip") {
    import graft.sinks.ShardSink
    import org.apache.spark.sql.functions._
    val spark = GraftTestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 4
    ShardSink.writeJsonl(docs, col("doc_id"), n, dir, col("doc_id"))
    // gzipped JSONL files under shard=K/
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".json.gz"))
    assert(files.nonEmpty, "expected gzip-compressed jsonl part files")
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    // content survives the text round trip exactly (json widens ints to
    // long already-long here; strings compared verbatim)
    val orig = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val got = back.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == orig)
    // membership matches the parquet exporter's stateless convention
    val expected = ShardSink.assignShards(docs.select("doc_id"), col("doc_id"), n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shards = back.select(col("doc_id"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shards == expected)
  }

  test("packed-token binary shards: byte-exact round trip, striped membership, loud overflow") {
    import graft.sinks.TokenShardSink
    import org.apache.spark.sql.functions._
    val spark = GraftTestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tokbin").toString
    val L = 32
    // deterministic fake packed sequences: seq i token j = (i*L + j) % 50000
    val seqs = (0L until 40L).map(i =>
      (i, (0 until L).map(j => ((i * L + j) % 50000).toInt).toArray)).toDF("seq_id", "toks")
    val n = 4
    TokenShardSink.write(seqs, "seq_id", "toks", L, n, dir, tokenBytes = 2)

    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "manifest.json"))
    assert(manifest.contains("\"seq_len\":32") && manifest.contains("\"token_bytes\":2"))
    // striping: shard k holds seq ids ≡ k (mod n), in order — a loader can
    // compute any sequence's (shard, offset) from its id alone
    (0 until n).foreach { k =>
      val got = TokenShardSink.readShard(spark, dir, k)
      val want = (0L until 40L).filter(_ % n == k).sorted
        .map(i => (0 until L).map(j => ((i * L + j) % 50000).toInt).toArray)
      assert(got.length == want.length, s"shard $k count")
      got.zip(want).foreach { case (g, w) => assert(g.sameElements(w), s"shard $k bytes") }
    }
    // uint16 overflow must fail the job, never wrap silently
    val bad = Seq((0L, Array.fill(L)(70000))).toDF("seq_id", "toks")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-tokbad").toString
    val ex = intercept[org.apache.spark.SparkException] {
      TokenShardSink.write(bad, "seq_id", "toks", L, 1, dir2, tokenBytes = 2)
    }
    assert(ex.getMessage.contains("out of range")
      || Option(ex.getCause).exists(_.getMessage.contains("out of range")))
    // an empty shard (0-count manifest entry, no tokens.bin on disk —
    // tasks only open files for shards that received rows) reads back as
    // empty, not as a NoSuchFileException
    val sparse = Seq((0L, (0 until L).toArray)).toDF("seq_id", "toks")
    val dir3 = java.nio.file.Files.createTempDirectory("graft-tokempty").toString
    TokenShardSink.write(sparse, "seq_id", "toks", L, 3, dir3, tokenBytes = 2)
    assert(TokenShardSink.readShard(spark, dir3, 1).isEmpty)
    assert(TokenShardSink.readShard(spark, dir3, 0).length == 1)
    // no committer temp files may survive a successful write
    val leftovers = java.nio.file.Files.walk(java.nio.file.Paths.get(dir3))
      .filter(p => p.getFileName.toString.contains(".tmp")).count()
    assert(leftovers == 0, "attempt temp files must be renamed or deleted")
  }

  test("zarr write rejects misaligned blocks from the write tasks") {
    // element offset 1 is not a multiple of the inferred chunk extent 2 on
    // dim 1 (raw Block DF — ingest paths can't produce this, a buggy
    // transform could): the executor-side validation must fail the job
    // with the contract message (the driver never enumerates the grid)
    import spark.implicits._
    val blocks = Seq(Block(Seq(0, 0), Seq(1, 2), Array(1.0, 2.0)),
      Block(Seq(0, 1), Seq(1, 2), Array(9.0, 9.0)))
    val arr = DeisaArray(spark.createDataset(blocks).toDF(), Seq(1, 3), 0, "m")
    val store = Files.createTempDirectory("graft-zarr-bad").toString
    val e = intercept[Exception] { ZarrSink.write(arr, store) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("rechunk first")), messages(e).mkString("; "))
  }

  test("missing chunks read back as fill value (VDS fillvalue contract)") {
    val store = Files.createTempDirectory("graft-fill").toString
    val meta = ArrayMeta("a", Seq(1, 4), Seq(1, 2)).validate()
    // only chunk (0,0) present; (0,1) missing
    val arr = DeisaArray.fromChunks(spark,
      Seq(ChunkRow("a", 0, Seq(0, 0), Seq(1, 2), Array(7.0, 8.0), "float64")), meta, 0)
    ManifestSink.write(arr, store, "partial")
    val back = ManifestSink.read(store, "partial")
    assert(back.data.toSeq == Seq(7.0, 8.0, -1.0, -1.0))
  }
}
