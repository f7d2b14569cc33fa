package graft.functions

import graft.core.{Block, DeisaArray}

/** Complex FFT kernel (SURVEY §2.C row C16 — no Spark built-in exists).
  *
  * Radix-2 Cooley-Tukey for power-of-two lengths, Bluestein's chirp-z
  * transform otherwise, both pure Scala on primitive arrays so the per-block
  * kernel stays allocation-light. Applied per block along an axis the array
  * is NOT chunked on (the same precondition dask imposes — the reference's
  * own test rechunks to make the FFT axis contiguous,
  * deisa-ray `tests/test_analytics.py:99-100`).
  */
object FFT {

  /** In-place complex FFT of (re, im); length must be a power of two. */
  private def fftRadix2(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    // bit-reversal permutation
    var j = 0
    for (i <- 0 until n - 1) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var i = 0
      while (i < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(i + k); val ui = im(i + k)
          val vr = re(i + k + len / 2) * cr - im(i + k + len / 2) * ci
          val vi = re(i + k + len / 2) * ci + im(i + k + len / 2) * cr
          re(i + k) = ur + vr; im(i + k) = ui + vi
          re(i + k + len / 2) = ur - vr; im(i + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        i += len
      }
      len <<= 1
    }
  }

  private def isPow2(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0

  /** Complex DFT of arbitrary length via Bluestein (chirp-z). */
  def dft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    if (isPow2(n)) {
      val r = re.clone(); val i = im.clone()
      fftRadix2(r, i)
      (r, i)
    } else {
      // Bluestein: x_k * exp(-i pi k^2 / n), convolved with chirp
      var m = 1
      while (m < 2 * n + 1) m <<= 1
      val ar = new Array[Double](m); val ai = new Array[Double](m)
      val br = new Array[Double](m); val bi = new Array[Double](m)
      val cosT = new Array[Double](n); val sinT = new Array[Double](n)
      for (k <- 0 until n) {
        val ang = math.Pi * ((k.toLong * k) % (2L * n)) / n
        cosT(k) = math.cos(ang); sinT(k) = math.sin(ang)
        ar(k) = re(k) * cosT(k) + im(k) * sinT(k)
        ai(k) = -re(k) * sinT(k) + im(k) * cosT(k)
        br(k) = cosT(k); bi(k) = sinT(k)
        if (k > 0) { br(m - k) = cosT(k); bi(m - k) = sinT(k) }
      }
      fftRadix2(ar, ai); fftRadix2(br, bi)
      // pointwise multiply
      for (k <- 0 until m) {
        val tr = ar(k) * br(k) - ai(k) * bi(k)
        ai(k) = ar(k) * bi(k) + ai(k) * br(k); ar(k) = tr
      }
      // inverse FFT: conjugate, forward, conjugate, scale
      for (k <- 0 until m) ai(k) = -ai(k)
      fftRadix2(ar, ai)
      val outR = new Array[Double](n); val outI = new Array[Double](n)
      for (k <- 0 until n) {
        val rr = ar(k) / m; val ri = -ai(k) / m
        outR(k) = rr * cosT(k) + ri * sinT(k)
        outI(k) = -rr * sinT(k) + ri * cosT(k)
      }
      (outR, outI)
    }
  }

  /** FFT of a DeisaArray along `axis` (axis must be unchunked). Returns
    * (real part, imaginary part) as two lazy views over the same mapped
    * plan; acting on BOTH runs the kernel twice unless the caller persists
    * one of them (`re.persist()`) — left to the caller so cache lifetime
    * stays explicit. */
  def fft(arr: DeisaArray, axis: Int): (DeisaArray, DeisaArray) = {
    val gs = arr.globalShape
    require(axis >= 0 && axis < gs.length)
    val spark = arr.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val axLen = gs(axis)
    val ax = axis
    val both = arr.df.as[Block].map { b =>
      require(b.shape(ax) == axLen,
        s"fft axis $ax must be unchunked (block extent ${b.shape(ax)} != $axLen); rechunk first")
      val shape = b.shape.toArray
      val n = b.data.length
      val outR = new Array[Double](n); val outI = new Array[Double](n)
      val allStrides = graft.core.BlockIndex.strides(b.shape)
      val stride = allStrides(ax)
      val lineCount = n / axLen
      val lineRe = new Array[Double](axLen); val lineIm = new Array[Double](axLen)
      var line = 0
      while (line < lineCount) {
        // base index of this line: iterate all positions with axis coord 0
        var rem = line; var base = 0; var d = shape.length - 1
        while (d >= 0) {
          if (d != ax) { val sz = shape(d); base += (rem % sz) * allStrides(d); rem /= sz }
          d -= 1
        }
        var k = 0
        while (k < axLen) { lineRe(k) = b.data(base + k * stride); lineIm(k) = 0.0; k += 1 }
        val (fr, fi) = dft(lineRe, lineIm)
        k = 0
        while (k < axLen) { outR(base + k * stride) = fr(k); outI(base + k * stride) = fi(k); k += 1 }
        line += 1
      }
      (b.pos, b.shape, outR, outI)
    }.toDF("pos", "shape", "re", "im")
    val re = DeisaArray(both.select(col("pos"), col("shape"), col("re").as("data")),
      gs, arr.t, s"fft_re(${arr.name})", "float64")
    val im = DeisaArray(both.select(col("pos"), col("shape"), col("im").as("data")),
      gs, arr.t, s"fft_im(${arr.name})", "float64")
    (re, im)
  }
}
