package graft

import graft.pipeline.{MediaBlob, MediaCodecs, Multimodal}
import graft.pipeline.MediaCodecs.{RawAudio, RawImage}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal pipeline: real pure-JVM codecs (netpbm images, concatenated-
  * PPM video, PCM WAV) + the batching/partitioning plumbing; the stub path
  * remains only for formats that need external decoders. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private def grayImg(w: Int, h: Int)(f: (Int, Int) => Int): RawImage =
    RawImage(w, h, 1, Array.tabulate(w * h)(i => f(i % w, i / w).toByte))

  test("netpbm round trip, comments, resize, and histogram") {
    val img = grayImg(4, 2)((x, y) => 16 * (y * 4 + x))
    val (back, _) = MediaCodecs.decodeNetpbm(MediaCodecs.encodeNetpbm(img))
    assert(back.width == 4 && back.height == 2 && back.channels == 1)
    assert(back.pixels.toSeq == img.pixels.toSeq)
    // header comments are legal netpbm
    val withComment = "P5\n# a comment\n2 1\n255\n".getBytes ++ Array[Byte](7, 9)
    val (c, _) = MediaCodecs.decodeNetpbm(withComment)
    assert(c.width == 2 && c.pixels.toSeq == Seq[Byte](7, 9))
    // nearest-neighbour resize doubles each pixel
    val up = MediaCodecs.resizeNearest(grayImg(2, 1)((x, _) => 100 * (x + 1)), 4, 2)
    assert(up.pixels.map(_ & 0xff).toSeq == Seq(100, 100, 200, 200, 100, 100, 200, 200))
    // histogram: half the pixels at 0, half at 255 -> mass in first+last bins
    val hist = MediaCodecs.lumHistogram(
      grayImg(2, 1)((x, _) => if (x == 0) 0 else 255), 16)
    assert(hist(0) == 0.5f && hist(15) == 0.5f && hist.sum == 1.0f)
  }

  test("ImageIO path: PNG/BMP exact, JPEG lossy, animated GIF as video") {
    val gray = grayImg(16, 8)((x, y) => 16 * x + y)
    val rgb = RawImage(4, 3, 3, Array.tabulate(4 * 3 * 3)(i => (i * 17 % 256).toByte))
    // PNG and BMP are lossless -> bit-exact raster round trip
    for (fmt <- Seq("png", "bmp")) {
      val enc = MediaCodecs.encodeImageIo(rgb, fmt)
      assert(MediaCodecs.isImageIo(enc) && !MediaCodecs.isNetpbm(enc))
      val Seq(back) = MediaCodecs.decodeImageIo(enc)
      assert(back.width == 4 && back.height == 3 && back.channels == 3)
      assert(back.pixels.toSeq == rgb.pixels.toSeq, fmt)
    }
    val png = MediaCodecs.encodeImageIo(gray, "png")
    val Seq(backGray) = MediaCodecs.decodeImageIo(png)
    assert(backGray.channels == 1 && backGray.pixels.toSeq == gray.pixels.toSeq)
    // JPEG is lossy: dims exact, luminance close
    val jpg = MediaCodecs.encodeImageIo(gray, "jpg")
    assert(jpg(0) == 0xFF.toByte && jpg(1) == 0xD8.toByte) // real JFIF bytes
    val Seq(backJpg) = MediaCodecs.decodeImageIo(jpg)
    assert(backJpg.width == 16 && backJpg.height == 8)
    val lumDiff = (0 until 16 * 8).map(i => math.abs(backJpg.lumAt(i) - gray.lumAt(i)))
    assert(lumDiff.max <= 16, s"jpeg luminance drift ${lumDiff.max}")
    // animated GIF: all frames decode -> video features
    val frames = Seq(grayImg(8, 4)((x, y) => x + y), grayImg(8, 4)((x, _) => 255 - 8 * x))
    val gif = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach(f => w.writeToSequence(
        new javax.imageio.IIOImage(MediaCodecs.toBuffered(f), null, null),
        w.getDefaultWriteParam))
      w.endWriteSequence(); w.dispose(); ios.close()
      baos.toByteArray
    }
    assert(MediaCodecs.decodeImageIo(gif).length == 2)
    val (vw, vh, nf, _) = Multimodal.decode("video", gif)
    assert(vw == 8 && vh == 4 && nf == 2)
  }

  test("corrupt image payloads degrade to the stub instead of failing the job") {
    // valid PNG magic, truncated body — real corpora contain these; the
    // batch kernel must emit the deterministic stub features, not throw
    // from inside an executor task
    val img = grayImg(8, 8)((x, y) => x ^ y)
    val truncated = MediaCodecs.encodeImageIo(img, "png").take(24)
    assert(MediaCodecs.isImageIo(truncated), "fixture must still look like a PNG")
    val (w, h, nf, emb) = Multimodal.decode("image", truncated)
    val (sw, sh, snf, semb) = Multimodal.decodeStub("image", truncated)
    assert((w, h, nf, emb.toSeq) == (sw, sh, snf, semb.toSeq))
    // and through the batched kernel end to end
    val blobs = Seq(MediaBlob(1, "image", truncated, "s"))
    val Array(f) = Multimodal.extractFeatures(spark.createDataset(blobs)).collect()
    assert(f.embedding.toSeq == Multimodal.decodeStub("image", truncated)._4.toSeq)
  }

  test("extractFeatures routes ImageIO payloads through the real decoder") {
    val img = grayImg(32, 16)((x, y) => (x * y) % 256)
    val blobs = Seq(MediaBlob(1, "image", MediaCodecs.encodeImageIo(img, "png"), "s"))
    val Array(f) = Multimodal.extractFeatures(spark.createDataset(blobs)).collect()
    assert(f.width == 32 && f.height == 16 && f.n_frames == 1)
    // embedding is the exact decoded-luminance histogram, not the stub hash
    assert(f.embedding.toSeq == MediaCodecs.lumHistogram(img, 16).toSeq)
  }

  test("wav round trip and energy profile") {
    val samples = Array.tabulate(2048)(i =>
      (math.sin(i * 0.1) * (if (i < 1024) 0 else 16384)).toShort)
    val a = RawAudio(8000, 1, samples)
    val back = MediaCodecs.decodeWav(MediaCodecs.encodeWav(a))
    assert(back.sampleRate == 8000 && back.channels == 1)
    assert(back.samples.toSeq == samples.toSeq)
    val prof = MediaCodecs.energyProfile(back, 16)
    // first half silent, second half loud
    assert(prof.take(8).forall(_ < 0.01f) && prof.drop(8).forall(_ > 0.1f))
  }

  test("extractFeatures uses the REAL codecs for recognised payloads") {
    val frame1 = grayImg(8, 4)((x, y) => x + y)
    val frame2 = grayImg(8, 4)((x, y) => 255 - x)
    val video = MediaCodecs.encodeNetpbm(frame1) ++ MediaCodecs.encodeNetpbm(frame2) ++
      MediaCodecs.encodeNetpbm(frame1)
    val wav = MediaCodecs.encodeWav(RawAudio(16000, 2,
      Array.tabulate(6000)(i => (i % 100).toShort))) // 3000 per channel
    val blobs = Seq(
      MediaBlob(1, "image", MediaCodecs.encodeNetpbm(frame1), "s"),
      MediaBlob(2, "video", video, "s"),
      MediaBlob(3, "audio", wav, "s"))
    val feats = Multimodal.extractFeatures(spark.createDataset(blobs))
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 8 && feats(0).height == 4 && feats(0).n_frames == 1)
    assert(feats(1).width == 8 && feats(1).height == 4 && feats(1).n_frames == 3)
    assert(feats(2).width == 16000 && feats(2).height == 2) // (sampleRate, channels)
    assert(feats(2).n_frames == 3) // ceil(3000 / 1024)
    // image embedding is the exact luminance histogram
    assert(feats(0).embedding.toSeq == MediaCodecs.lumHistogram(frame1, 16).toSeq)
  }

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

  test("qm02 aHash is codepoint-indexed (non-ASCII text matches the oracle convention)") {
    // the oracle addresses the i-th CHARACTER (ascii(substr(text,i,1)),
    // saturated to a byte); a byte-indexed Spark side would collapse every
    // non-ASCII char to '?'=63 and silently diverge — pin the real decode
    // path against a locally computed codepoint reference, including a
    // supplementary-plane char (two UTF-16 units, one codepoint)
    val docs = Seq(
      (1L, "déjà vu — naïve façade résumé, 中文 and 😀 emoji padding text!"),
      (2L, "plain ascii text, comfortably longer than sixty-four characters in total....."),
      (3L, "short"))
    val dir = java.nio.file.Files.createTempDirectory("graft-qm02").toString
    try {
      docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      def ref(text: String): (Long, Long) = {
        val cps = text.codePoints().toArray.take(64).map(cp => math.min(cp, 255))
        val px = cps ++ Array.fill(64 - cps.length)(32)
        val tot = px.map(_.toLong).sum
        var lo = 0L; var hi = 0L
        for (j <- 0 until 64; if px(j) * 64L > tot)
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        (hi, lo)
      }
      val got = graft.relational.QueryCatalog.byName("qm02_image_phash")
        .build(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, t) =>
        assert(got(id) == ref(t), s"doc $id hash must match codepoint reference")
      }
    } finally {
      import java.nio.file.{Files, Path, Paths}
      Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
  }
}
