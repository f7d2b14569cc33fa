package graft.pipeline

/** Pure-JVM media codecs for the multimodal column pipeline — REAL decoders
  * for the formats expressible without external libraries:
  *
  *  - PGM (P5) / PPM (P6): binary netpbm images — the interchange format
  *    `ffmpeg -f image2pipe -c:v ppm` emits;
  *  - concatenated PPM stream: the `image2pipe` video framing (one P6
  *    image per frame, back to back);
  *  - WAV: RIFF/WAVE container with 16-bit PCM samples;
  *  - JPEG / PNG / BMP / GIF (incl. multi-frame GIF): decoded by the JDK's
  *    built-in `javax.imageio` readers — no external dependency, so the
  *    dominant real-corpus image formats take the REAL path too.
  *
  * Only compressed AUDIO/VIDEO codecs (MP3/FLAC/H.264/...) need external
  * decoders and stay behind [[Multimodal.decodeStub]] — everything here
  * parses actual bytes, so the pipeline's decode path is exercised for
  * real, not just its plumbing.
  */
object MediaCodecs {

  /** Decoded raster: `channels` ∈ {1 (gray), 3 (RGB)}, row-major,
    * interleaved, one byte per sample (maxval ≤ 255). */
  final case class RawImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    def lumAt(i: Int): Int =
      if (channels == 1) pixels(i) & 0xff
      else ((pixels(3 * i) & 0xff) + (pixels(3 * i + 1) & 0xff) +
        (pixels(3 * i + 2) & 0xff)) / 3
  }

  /** Decoded PCM audio: 16-bit signed samples, channel-interleaved. */
  final case class RawAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  // ---------- netpbm (PGM P5 / PPM P6) ----------

  def isNetpbm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')

  /** Parse one P5/P6 image starting at `off`; returns (image, nextOffset).
    * Header = magic, width, height, maxval as whitespace-separated tokens
    * with `#` comments, then ONE whitespace byte, then raw samples. */
  def decodeNetpbm(b: Array[Byte], off: Int = 0): (RawImage, Int) = {
    require(off + 2 <= b.length && b(off) == 'P', "not a netpbm payload")
    val channels = b(off + 1) match {
      case '5' => 1
      case '6' => 3
      case m => throw new IllegalArgumentException(s"unsupported netpbm magic P${m.toChar}")
    }
    var i = off + 2
    def nextToken(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (i < b.length && {
        val c = b(i)
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }) i += 1
      var v = 0
      require(i < b.length && b(i) >= '0' && b(i) <= '9', "malformed netpbm header")
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = nextToken(); val h = nextToken(); val maxval = nextToken()
    require(maxval > 0 && maxval <= 255, s"only 1-byte samples supported (maxval=$maxval)")
    i += 1 // the single whitespace byte after maxval
    val n = w * h * channels
    require(i + n <= b.length, s"truncated netpbm payload: need $n bytes at $i, have ${b.length}")
    val px = java.util.Arrays.copyOfRange(b, i, i + n)
    (RawImage(w, h, channels, px), i + n)
  }

  def encodeNetpbm(img: RawImage): Array[Byte] = {
    val magic = if (img.channels == 1) "P5" else "P6"
    val header = s"$magic\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Concatenated-PPM video stream (`image2pipe`): decode every frame. */
  def decodeNetpbmStream(b: Array[Byte]): Seq[RawImage] = {
    val frames = Seq.newBuilder[RawImage]
    var off = 0
    while (off < b.length) {
      val (img, next) = decodeNetpbm(b, off)
      frames += img
      off = next
    }
    frames.result()
  }

  /** Nearest-neighbour resize — a real raster kernel (the per-blob
    * transform a training pipeline runs before feature extraction). */
  def resizeNearest(img: RawImage, w2: Int, h2: Int): RawImage = {
    require(w2 > 0 && h2 > 0)
    val out = new Array[Byte](w2 * h2 * img.channels)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        var c = 0
        while (c < img.channels) {
          out((y * w2 + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    RawImage(w2, h2, img.channels, out)
  }

  /** 16-bin luminance histogram, normalised by pixel count — the
    * deterministic stand-in for model-based image embeddings. */
  def lumHistogram(img: RawImage, bins: Int): Array[Float] = {
    val hist = new Array[Float](bins)
    val n = img.width * img.height
    var i = 0
    while (i < n) { hist(math.min(bins - 1, img.lumAt(i) * bins / 256)) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < bins) { hist(j) /= n; j += 1 } }
    hist
  }

  // ---------- JPEG / PNG / BMP / GIF (JDK-builtin javax.imageio) ----------

  /** Magic bytes of the formats the JDK's bundled ImageIO readers handle. */
  def isImageIo(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) || // JPEG
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // PNG
      (b(0) == 'B' && b(1) == 'M') ||                                        // BMP
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))            // GIF

  /** Decode every frame (GIF may carry several; JPEG/PNG/BMP carry one)
    * into the same [[RawImage]] raster the netpbm path produces. */
  def decodeImageIo(b: Array[Byte]): Seq[RawImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader recognises this payload")
      val reader = readers.next()
      reader.setInput(iis)
      try {
        val n = math.max(1, reader.getNumImages(true))
        (0 until n).map(k => fromBuffered(reader.read(k)))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Encode through ImageIO (`format` ∈ png/jpg/bmp/gif) — the test-side
    * inverse of [[decodeImageIo]]. */
  def encodeImageIo(img: RawImage, format: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(toBuffered(img), format, baos),
      s"no ImageIO writer for format $format")
    baos.toByteArray
  }

  def toBuffered(img: RawImage): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    val bi = new BufferedImage(img.width, img.height,
      if (img.channels == 1) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = y * img.width + x
        if (img.channels == 1) bi.getRaster.setSample(x, y, 0, img.pixels(i) & 0xff)
        else bi.setRGB(x, y,
          ((img.pixels(3 * i) & 0xff) << 16) | ((img.pixels(3 * i + 1) & 0xff) << 8) |
            (img.pixels(3 * i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    bi
  }

  private def fromBuffered(bi: java.awt.image.BufferedImage): RawImage = {
    val w = bi.getWidth; val h = bi.getHeight
    if (bi.getColorModel.getNumComponents == 1) {
      val out = new Array[Byte](w * h)
      val raster = bi.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
        y += 1
      }
      RawImage(w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = bi.getRGB(x, y)
          val o = (y * w + x) * 3
          out(o) = ((rgb >> 16) & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      RawImage(w, h, 3, out)
    }
  }

  // ---------- WAV (RIFF, 16-bit PCM) ----------

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def decodeWav(b: Array[Byte]): RawAudio = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var i = 12
    var channels = -1; var rate = -1; var bits = -1
    var samples: Array[Short] = null
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, i + 4)
      val body = i + 8
      id match {
        case "fmt " =>
          require(le16(b, body) == 1, "only PCM (format 1) supported")
          channels = le16(b, body + 2)
          rate = le32(b, body + 4)
          bits = le16(b, body + 14)
          require(bits == 16, s"only 16-bit PCM supported (got $bits)")
        case "data" =>
          require(bits == 16, "data chunk before fmt chunk")
          val n = size / 2
          samples = new Array[Short](n)
          var k = 0
          while (k < n) { samples(k) = le16(b, body + 2 * k).toShort; k += 1 }
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      i = body + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    RawAudio(rate, channels, samples)
  }

  def encodeWav(a: RawAudio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(a.channels.toShort)
      .putInt(a.sampleRate).putInt(a.sampleRate * a.channels * 2)
      .putShort((a.channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(dataBytes)
    a.samples.foreach(out.putShort)
    out.array()
  }

  /** RMS energy of `bins` equal time slices, normalised to [0, 1] — the
    * deterministic stand-in for learned audio embeddings. */
  def energyProfile(a: RawAudio, bins: Int): Array[Float] = {
    val prof = new Array[Float](bins)
    val n = a.samples.length
    if (n == 0) return prof
    var j = 0
    while (j < bins) {
      val lo = (j.toLong * n / bins).toInt
      val hi = ((j + 1).toLong * n / bins).toInt
      var acc = 0.0
      var k = lo
      while (k < hi) { val s = a.samples(k) / 32768.0; acc += s * s; k += 1 }
      prof(j) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0f
      j += 1
    }
    prof
  }
}
