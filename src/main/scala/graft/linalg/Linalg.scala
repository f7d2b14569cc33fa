package graft.linalg

import graft.core.{Block, BlockIndex, DeisaArray}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the blocked-array model (SURVEY §2.C:
  * C9 matmul, C15 SVD).
  *
  * Matmul is the classic blocked scheme: partial products from a position
  * equi-join on the contraction dimension, then an elementwise block sum
  * keyed by output position — two shuffles, both on block keys, which is
  * the minimum for a general distributed GEMM. SVD takes the tall-skinny
  * path (the same algorithm class dask and MLlib's RowMatrix use): an
  * n×n Gram matrix accumulated map-side, eigendecomposed on the driver.
  */
object Linalg {

  /** C @ D for 2-D arrays. Contraction-dim chunk boundaries must align
    * (rechunk first otherwise — same contract as dask's blocked matmul). */
  def matmul(a: DeisaArray, b: DeisaArray): DeisaArray = {
    require(a.globalShape.length == 2 && b.globalShape.length == 2)
    require(a.globalShape(1) == b.globalShape(0),
      s"matmul shape mismatch ${a.globalShape} @ ${b.globalShape}")
    val spark = a.df.sparkSession
    import spark.implicits._
    val left = a.df.select(col("pos")(0).as("r0"), col("pos")(1).as("k0"),
      col("shape")(0).as("br"), col("shape")(1).as("bk"), col("data").as("ldata"))
    val right = b.df.select(col("pos")(0).as("k1"), col("pos")(1).as("c0"),
      col("shape")(0).as("bk2"), col("shape")(1).as("bc"), col("data").as("rdata"))
    val partial = left.join(right, col("k0") === col("k1"))
      .as[(Int, Int, Int, Int, Array[Double], Int, Int, Int, Int, Array[Double])]
      .map { case (r0, _, br, bk, l, _, c0, bk2, bc, r) =>
        require(bk == bk2, s"contraction chunking misaligned: $bk vs $bk2")
        val out = new Array[Double](br * bc)
        var i = 0
        while (i < br) {
          var k = 0
          while (k < bk) {
            val lv = l(i * bk + k)
            if (lv != 0.0) {
              var j = 0
              while (j < bc) { out(i * bc + j) += lv * r(k * bc + j); j += 1 }
            }
            k += 1
          }
          i += 1
        }
        (Seq(r0, c0), Seq(br, bc), out)
      }.toDF("pos", "shape", "data")
    // elementwise sum of partial blocks sharing an output position: one
    // shuffle of whole partial vectors, folded with zip_with (no
    // element-level explode — that would be a row per output cell)
    val summed = graft.core.DeisaArray.foldBlocks(partial, _ + _)
    DeisaArray(summed, Seq(a.globalShape(0), b.globalShape(1)), a.t,
      s"${a.name}@${b.name}", a.dtype)
  }

  /** AᵀA for a tall-skinny 2-D array with an unchunked column dimension
    * (n = globalShape(1) small). One map-side n×n partial per block, one
    * tiny final reduce — no shuffle of the data itself. */
  def gram(a: DeisaArray): Array[Array[Double]] = {
    require(a.globalShape.length == 2)
    val n = a.globalShape(1)
    val spark = a.df.sparkSession
    import spark.implicits._
    val partials = a.df.as[Block].map { b =>
      require(b.shape(1) == n, "gram: column dimension must be unchunked")
      val rows = b.shape(0)
      val g = new Array[Double](n * n)
      var r = 0
      while (r < rows) {
        var i = 0
        while (i < n) {
          val xi = b.data(r * n + i)
          var j = 0
          while (j < n) { g(i * n + j) += xi * b.data(r * n + j); j += 1 }
          i += 1
        }
        r += 1
      }
      g
    }
    val flat = partials.toDF("g")
      .select(posexplode(col("g")).as(Seq("idx", "v")))
      .groupBy(col("idx")).agg(sum(col("v")).as("v"))
      .orderBy(col("idx")).collect().map(_.getDouble(1))
    Array.tabulate(n, n)((i, j) => flat(i * n + j))
  }

  /** Singular values of a tall-skinny 2-D array, descending — via the Gram
    * matrix's eigenvalues (Jacobi rotations on the driver; n is small). */
  def singularValues(a: DeisaArray): Array[Double] = svd(a)._1

  /** (singular values desc, right singular vectors as rows — i.e. Vᵀ, the
    * "principal components" of the tall-skinny SVD). */
  def svd(a: DeisaArray): (Array[Double], Array[Array[Double]]) = {
    val (evals, evecs) = eigSym(gram(a))
    val order = evals.indices.sortBy(i => -evals(i))
    val sv = order.map(i => math.sqrt(math.max(0.0, evals(i)))).toArray
    val vt = order.map(i => evecs.map(_(i))).toArray // i-th eigenvector row
    (sv, vt)
  }

  /** Classic cyclic Jacobi eigensolver for a symmetric matrix:
    * returns (eigenvalues, eigenvectors as COLUMNS of the returned matrix). */
  def eigSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100) {
      var off = 0.0
      for (i <- 0 until n; j <- i + 1 until n) off += a(i)(j) * a(i)(j)
      if (off < 1e-30) sweep = 100
      else {
        for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val tt = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(tt * tt + 1.0)
          val s = tt * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
        sweep += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  def jacobiEigenvalues(m: Array[Array[Double]]): Array[Double] = eigSym(m)._1
}
