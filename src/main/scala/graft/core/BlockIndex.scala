package graft.core

/** Index arithmetic for row-major flattened N-D blocks.
  *
  * All structural array ops (slice C7, transpose C8, concatenate/rechunk C13,
  * axis reductions C14 — numbering per SURVEY §2.C) reduce to this module's
  * pure functions, which run inside per-block kernels on the executors.
  * Kept small and exhaustively unit-tested rather than spread ad-hoc through
  * expressions (SURVEY §7.3).
  */
object BlockIndex {

  /** Row-major strides for a shape. */
  def strides(shape: Seq[Int]): Array[Int] = {
    val n = shape.length
    val s = new Array[Int](n)
    var acc = 1
    var i = n - 1
    while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
    s
  }

  def linearize(idx: Array[Int], shape: Seq[Int]): Int = {
    val st = strides(shape)
    var lin = 0
    var i = 0
    while (i < idx.length) { lin += idx(i) * st(i); i += 1 }
    lin
  }

  def delinearize(lin: Int, shape: Seq[Int]): Array[Int] = {
    val n = shape.length
    val out = new Array[Int](n)
    var rem = lin
    var i = n - 1
    while (i >= 0) { out(i) = rem % shape(i); rem /= shape(i); i -= 1 }
    out
  }

  def size(shape: Seq[Int]): Int = shape.product

  /** Intersect a block (at element offset `elemOff`, shape `blockShape`)
    * with a global slice given as per-dim [start, stop) ranges.
    * Returns None if the block doesn't overlap; otherwise
    * (localRanges, outOffsetElems) where localRanges are per-dim
    * [start, stop) within the block and outOffsetElems is the block's
    * element offset inside the sliced result, per dim.
    */
  def sliceChunk(
      elemOff: Array[Int],
      blockShape: Array[Int],
      ranges: Array[(Int, Int)]
  ): Option[(Array[(Int, Int)], Array[Int])] = {
    val n = elemOff.length
    val local = new Array[(Int, Int)](n)
    val outOff = new Array[Int](n)
    var d = 0
    while (d < n) {
      val chunkStart = elemOff(d)
      val chunkStop = chunkStart + blockShape(d)
      val lo = math.max(ranges(d)._1, chunkStart)
      val hi = math.min(ranges(d)._2, chunkStop)
      if (lo >= hi) return None
      local(d) = (lo - chunkStart, hi - chunkStart)
      outOff(d) = lo - ranges(d)._1
      d += 1
    }
    Some((local, outOff))
  }

  /** Extract a sub-block given per-dim local [start, stop) ranges. */
  def extract(data: Array[Double], shape: Array[Int],
      local: Array[(Int, Int)]): (Array[Double], Array[Int]) = {
    val outShape = local.map { case (a, b) => b - a }
    val outSize = outShape.product
    val out = new Array[Double](outSize)
    val inStrides = strides(shape.toIndexedSeq)
    var o = 0
    while (o < outSize) {
      val outIdx = delinearize(o, outShape.toIndexedSeq)
      var lin = 0
      var d = 0
      while (d < shape.length) { lin += (outIdx(d) + local(d)._1) * inStrides(d); d += 1 }
      out(o) = data(lin)
      o += 1
    }
    (out, outShape)
  }

  /** Transpose (axis permutation) of one block: out[idx] = in[perm(idx)]. */
  def transposeBlock(data: Array[Double], shape: Array[Int],
      axes: Array[Int]): (Array[Double], Array[Int]) = {
    val outShape = axes.map(shape)
    val out = new Array[Double](data.length)
    val inStrides = strides(shape.toIndexedSeq)
    val n = data.length
    var o = 0
    while (o < n) {
      val outIdx = delinearize(o, outShape.toIndexedSeq)
      var lin = 0
      var d = 0
      while (d < axes.length) { lin += outIdx(d) * inStrides(axes(d)); d += 1 }
      out(o) = data(lin)
      o += 1
    }
    (out, outShape)
  }

  /** Reduce one block along `axis` with a (sum|min|max) combiner; used for
    * partial axis reductions (C14) before the cross-chunk merge. */
  def reduceAxis(data: Array[Double], shape: Array[Int], axis: Int,
      op: (Double, Double) => Double, init: Double): (Array[Double], Array[Int]) = {
    val outShape = shape.indices.filter(_ != axis).map(shape).toArray
    val outSize = math.max(1, outShape.product)
    val out = Array.fill(outSize)(init)
    val n = data.length
    var i = 0
    while (i < n) {
      val idx = delinearize(i, shape.toIndexedSeq)
      val outIdx = idx.indices.filter(_ != axis).map(idx).toArray
      val o = if (outShape.isEmpty) 0 else linearize(outIdx, outShape.toIndexedSeq)
      out(o) = op(out(o), data(i))
      i += 1
    }
    (out, outShape)
  }
}
