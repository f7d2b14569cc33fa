package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** One opaque media payload: the multimodal column pattern — binary blob +
  * typed metadata travelling through the relational plane untouched. */
final case class MediaBlob(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    source: String)

/** Decoded/extracted features for one blob. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    embedding: Array[Float])

/** Multimodal column plumbing (builder-prompt requirement): images/audio/
  * video ride as opaque `binary` columns; decode / feature-extraction /
  * resize / frame-sampling run as BATCHED per-partition kernels — the
  * Scala counterpart of `mapInPandas` (same batch shape, schema contract,
  * and partitioning story; at 100 TB each partition holds a few thousand
  * blobs and the kernel amortizes model/codec setup per batch).
  *
  * The decode path is REAL for every format a JVM can parse without
  * external libraries (see [[MediaCodecs]]): JPEG/PNG/BMP/GIF via the
  * JDK-builtin `javax.imageio` (multi-frame GIF decodes as video), PGM/PPM
  * images, concatenated-PPM video streams (ffmpeg `image2pipe` framing),
  * and 16-bit PCM WAV. Only compressed AUDIO/VIDEO codecs (MP3/FLAC/
  * H.264/...) need external decoders; those payloads fall back to
  * [[decodeStub]], a clearly-marked DETERMINISTIC FAKE with the same
  * `(bytes) => (w, h, frames, embedding)` contract — swap in JavaCV/ffmpeg
  * there without touching any of the Spark plumbing.
  */
object Multimodal {

  val DefaultBatchSize = 64
  val EmbeddingDim = 16

  /** Decode one payload: real codec when the format is recognised
    * (JPEG/PNG/BMP/GIF via ImageIO, netpbm image, netpbm stream video,
    * PCM WAV), stub otherwise. Returns (width, height, n_frames,
    * embedding); for audio the "raster" slots carry (sampleRate,
    * channels). */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    if (MediaCodecs.isNetpbm(payload)) {
      if (kind == "video") frameFeatures(MediaCodecs.decodeNetpbmStream(payload))
      else {
        val (img, _) = MediaCodecs.decodeNetpbm(payload)
        (img.width, img.height, 1, MediaCodecs.lumHistogram(img, EmbeddingDim))
      }
    } else if (MediaCodecs.isImageIo(payload)) {
      // real corpora contain truncated/corrupt images: a payload whose
      // magic bytes promise JPEG/PNG/BMP/GIF but whose body ImageIO cannot
      // decode must not fail the whole job from inside an executor — it
      // degrades to the deterministic stub, like any other undecodable blob
      scala.util.Try(MediaCodecs.decodeImageIo(payload)).toOption match {
        case Some(Seq(img)) =>
          (img.width, img.height, 1, MediaCodecs.lumHistogram(img, EmbeddingDim))
        case Some(frames) if frames.nonEmpty => frameFeatures(frames) // animated GIF = video
        case _ => decodeStub(kind, payload)
      }
    } else if (MediaCodecs.isWav(payload)) {
      val a = MediaCodecs.decodeWav(payload)
      val perChannel = a.samples.length / math.max(1, a.channels)
      val frames = math.max(1, (perChannel + 1023) / 1024) // 1024-sample windows
      (a.sampleRate, a.channels, frames, MediaCodecs.energyProfile(a, EmbeddingDim))
    } else decodeStub(kind, payload)

  /** Video features: first frame's raster dims, frame count, and the mean
    * luminance histogram over ≤4 evenly-sampled frames. */
  private def frameFeatures(
      frames: Seq[MediaCodecs.RawImage]): (Int, Int, Int, Array[Float]) = {
    val first = frames.head
    val sampled =
      if (frames.length <= 4) frames
      else (0 until 4).map(i => frames(i * frames.length / 4))
    val emb = new Array[Float](EmbeddingDim)
    sampled.foreach { f =>
      val h = MediaCodecs.lumHistogram(f, EmbeddingDim)
      var j = 0
      while (j < EmbeddingDim) { emb(j) += h(j); j += 1 }
    }
    (first.width, first.height, frames.length, emb.map(_ / sampled.length))
  }

  /** DETERMINISTIC FAKE decode for formats that DO need an external
    * decoder (compressed audio/video: MP3/FLAC/H.264/...): pseudo
    * width/height/frame-count and a 16-dim "embedding" from a rolling
    * hash over the payload. Stands in for codec + model inference. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var h = 1125899906842597L
    val emb = new Array[Float](EmbeddingDim)
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      emb(i % EmbeddingDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val w = 64 + math.floorMod(h, 512).toInt
    val ht = 64 + math.floorMod(h >> 9, 512).toInt
    val frames = kind match {
      case "video" => 1 + payload.length / 1024
      case "audio" => 1 + payload.length / 256
      case _ => 1
    }
    val norm = math.max(1, payload.length / EmbeddingDim)
    (w, ht, frames, emb.map(_ / norm))
  }

  /** Batched feature extraction: partitions stream through the kernel in
    * `batchSize` groups (mirroring mapInPandas' Arrow batch shape) so a
    * real decoder can amortize setup per batch, not per row. */
  def extractFeatures(blobs: Dataset[MediaBlob],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec contexts, model session)
        batch.iterator.map { b =>
          val (w, h, frames, emb) = decode(b.kind, b.payload)
          MediaFeatures(b.media_id, b.kind, w, h, frames, emb)
        }
      }
    }
  }

  /** Frame sampling for video blobs: every `stride`-th frame index up to
    * the decoded frame count — (media_id, frame_no) pairs ready for a
    * per-frame decode pass. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): Dataset[(Long, Int)] = {
    import features.sparkSession.implicits._
    features.filter(_.kind == "video").flatMap { f =>
      (0 until f.n_frames by stride).map(i => (f.media_id, i))
    }
  }

  /** Build a MediaBlob dataset out of the documents table (texts standing
    * in for payload bytes — the plumbing fixture used by specs). */
  def blobsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text", "source")
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaBlob(id, kind, text.getBytes(java.nio.charset.StandardCharsets.UTF_8), src)
      }
  }
}
