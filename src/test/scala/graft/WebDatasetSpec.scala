package graft

import graft.pipeline.TextOps
import graft.sinks.WebDatasetSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset tar-shard sink: round trip, byte determinism, hash
  * membership, and interop with the system `tar` (the format's whole
  * point is that any loader can stream it). */
class WebDatasetSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-wds").toString

  private def sampleDf() = Seq(
    (0L, "alpha doc", Array[Byte](0, 1, 2, -1, -128)),
    (1L, "beta doc", Array[Byte](127)),
    (2L, "gamma doc", Array[Byte]()),
    (3L, "delta doc", Array[Byte](9, 9)),
    (4L, "epsilon doc", Array[Byte](42))
  ).toDF("doc_id", "text", "blob")

  private val N = 3

  private def expectedShard(id: Long): Long = {
    // replicate ShardSink.assignShards: pmod(hash60(key string), n)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(f"$id%09d".getBytes("UTF-8"))
    val hex = md5.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % N
  }

  test("round trip: members grouped per sample, sorted, payload-exact; binary verbatim") {
    val dir = tmpDir()
    val df = sampleDf()
    WebDatasetSink.write(df, format_string("%09d", col("doc_id")),
      Seq("txt" -> col("text"), "bin" -> col("blob")), N, dir)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))).toSeq
    val byShard = rows.groupBy(r => expectedShard(r._1))
    (0L until N).foreach { k =>
      val got = WebDatasetSink.readShard(spark, dir, k)
      val want = byShard.getOrElse(k, Seq.empty).sortBy(_._1).flatMap {
        case (id, txt, blob) => Seq(
          (f"$id%09d.txt", txt.getBytes("UTF-8").toSeq),
          (f"$id%09d.bin", blob.toSeq))
      }
      assert(got.map { case (n, p) => (n, p.toSeq) } == want,
        s"shard $k member mismatch")
    }
  }

  test("re-export is byte-identical (deterministic headers)") {
    val dir1 = tmpDir(); val dir2 = tmpDir()
    val fields = Seq("txt" -> col("text"), "bin" -> col("blob"))
    WebDatasetSink.write(sampleDf(), format_string("%09d", col("doc_id")), fields, N, dir1)
    WebDatasetSink.write(sampleDf().repartition(7), // layout must not matter
      format_string("%09d", col("doc_id")), fields, N, dir2)
    (0L until N).foreach { k =>
      val f1 = java.nio.file.Paths.get(dir1, f"shard-$k%05d.tar")
      val f2 = java.nio.file.Paths.get(dir2, f"shard-$k%05d.tar")
      assert(java.nio.file.Files.exists(f1) == java.nio.file.Files.exists(f2))
      if (java.nio.file.Files.exists(f1))
        assert(java.util.Arrays.equals(
          java.nio.file.Files.readAllBytes(f1),
          java.nio.file.Files.readAllBytes(f2)), s"shard $k bytes differ")
    }
  }

  test("system tar lists and extracts the archive (ustar interop)") {
    assume(new java.io.File("/usr/bin/tar").exists() ||
      new java.io.File("/bin/tar").exists())
    val dir = tmpDir()
    WebDatasetSink.write(sampleDf(), format_string("%09d", col("doc_id")),
      Seq("txt" -> col("text")), 1, dir)
    val tarFile = s"$dir/shard-00000.tar"
    def run(cmd: String*): (Int, Array[Byte]) = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
      val outBytes = p.getInputStream.readAllBytes()
      (p.waitFor(), outBytes)
    }
    val (lc, listing) = run("tar", "-tf", tarFile)
    assert(lc == 0, "tar -tf must accept the archive")
    val names = new String(listing, "UTF-8").split("\n").filter(_.nonEmpty).toSeq
    assert(names == (0L to 4L).map(i => f"$i%09d.txt"),
      s"tar listing mismatch: $names")
    val (xc, payload) = run("tar", "-xOf", tarFile, "000000002.txt")
    assert(xc == 0 && new String(payload, "UTF-8") == "gamma doc")
  }

  test("null field emits no member; empty shard reads back empty") {
    val dir = tmpDir()
    val df = Seq((0L, Some("has text")), (1L, None: Option[String]))
      .toDF("doc_id", "text")
    // 97 shards: most receive no sample — readShard must return empty,
    // not throw
    WebDatasetSink.write(df, format_string("%09d", col("doc_id")),
      Seq("txt" -> col("text")), 97, dir)
    val all = (0L until 97L).flatMap(k => WebDatasetSink.readShard(spark, dir, k))
    assert(all.map(_._1) == Seq("000000000.txt"),
      "null payload must emit no member")
    assert(new String(all.head._2, "UTF-8") == "has text")
  }
}
