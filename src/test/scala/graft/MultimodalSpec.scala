package graft

import graft.pipeline.{MediaBlob, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing must be real even though decode is stubbed:
  * schema, batching shape, partitioning, determinism. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  test("batched feature extraction: schema, determinism, batch independence") {
    val blobs = (0L until 200L).map { i =>
      MediaBlob(i, Seq("image", "audio", "video")(i.toInt % 3),
        Array.fill((i % 97 + 3).toInt)((i * 31 % 251).toByte), s"src${i % 4}")
    }
    val ds = spark.createDataset(blobs).repartition(7)
    val f1 = Multimodal.extractFeatures(ds, batchSize = 64).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(ds.repartition(3), batchSize = 8)
      .collect().sortBy(_.media_id)
    assert(f1.length == 200)
    // results must not depend on partitioning or batch size
    f1.lazyZip(f2).foreach { (a, b) =>
      assert(a.media_id == b.media_id && a.width == b.width &&
        a.height == b.height && a.n_frames == b.n_frames)
      assert(a.embedding.toSeq == b.embedding.toSeq)
    }
    assert(f1.forall(f => f.embedding.length == Multimodal.EmbeddingDim))
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("frame sampling covers every stride-th frame of videos only") {
    val blobs = Seq(
      MediaBlob(1, "video", Array.fill(4096)(1.toByte), "s"),
      MediaBlob(2, "image", Array.fill(4096)(1.toByte), "s"))
    val feats = Multimodal.extractFeatures(spark.createDataset(blobs))
    val frames = Multimodal.sampleFrames(feats, stride = 2).collect().toSet
    assert(frames.nonEmpty && frames.forall(_._1 == 1L))
    assert(frames == (0 until 5 by 2).map(i => (1L, i)).toSet) // 1+4096/1024 = 5 frames
  }

  test("documents table rides as blobs through the pipeline") {
    val ds = Multimodal.blobsFromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length == 500)
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
  }
}
