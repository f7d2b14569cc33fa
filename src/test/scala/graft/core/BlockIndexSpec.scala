package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BlockIndexSpec extends AnyFunSuite {

  test("strides / linearize / delinearize round-trip (row-major)") {
    val shape = Seq(2, 3, 4)
    assert(BlockIndex.strides(shape).toSeq == Seq(12, 4, 1))
    for (lin <- 0 until 24) {
      val idx = BlockIndex.delinearize(lin, shape)
      assert(BlockIndex.linearize(idx, shape) == lin)
    }
    assert(BlockIndex.linearize(Array(1, 2, 3), shape) == 23)
  }

  test("sliceChunk overlap math") {
    // block at element offset (2, 0), shape (2, 4); slice rows 0..3, cols 1..3
    val res = BlockIndex.sliceChunk(Array(2, 0), Array(2, 4),
      Array((0, 3), (1, 3)))
    assert(res.isDefined)
    val (local, outOff) = res.get
    assert(local.toSeq == Seq((0, 1), (1, 3))) // row 2 only, cols 1-2
    assert(outOff.toSeq == Seq(2, 0))
    // disjoint
    assert(BlockIndex.sliceChunk(Array(4, 0), Array(2, 4),
      Array((0, 3), (0, 4))).isEmpty)
  }

  test("extract sub-block") {
    // 2x4 block values 0..7; extract rows [0,2) cols [1,3)
    val data = Array.tabulate(8)(_.toDouble)
    val (out, shape) = BlockIndex.extract(data, Array(2, 4), Array((0, 2), (1, 3)))
    assert(shape.toSeq == Seq(2, 2))
    assert(out.toSeq == Seq(1.0, 2.0, 5.0, 6.0))
  }

  test("transposeBlock") {
    // [[1,2],[3,4]] -> [[1,3],[2,4]]
    val (out, shape) = BlockIndex.transposeBlock(
      Array(1, 2, 3, 4), Array(2, 2), Array(1, 0))
    assert(shape.toSeq == Seq(2, 2))
    assert(out.toSeq == Seq(1.0, 3.0, 2.0, 4.0))
    // 2x3 -> 3x2
    val (o2, s2) = BlockIndex.transposeBlock(
      Array(1, 2, 3, 4, 5, 6), Array(2, 3), Array(1, 0))
    assert(s2.toSeq == Seq(3, 2))
    assert(o2.toSeq == Seq(1.0, 4.0, 2.0, 5.0, 3.0, 6.0))
  }

  test("reduceAxis sum/min/max") {
    // [[1,2,3],[4,5,6]]
    val d = Array(1.0, 2, 3, 4, 5, 6)
    val (s0, sh0) = BlockIndex.reduceAxis(d, Array(2, 3), 0, _ + _, 0.0)
    assert(sh0.toSeq == Seq(3) && s0.toSeq == Seq(5.0, 7.0, 9.0))
    val (s1, sh1) = BlockIndex.reduceAxis(d, Array(2, 3), 1, _ + _, 0.0)
    assert(sh1.toSeq == Seq(2) && s1.toSeq == Seq(6.0, 15.0))
    val (mx, _) = BlockIndex.reduceAxis(d, Array(2, 3), 0, math.max, Double.NegativeInfinity)
    assert(mx.toSeq == Seq(4.0, 5.0, 6.0))
  }
}

class ArrayMetaSpec extends AnyFunSuite {
  // validation contract ported from deisa-ray validate.py:72-167
  test("valid metadata passes") {
    ArrayMeta("a", Seq(4, 6), Seq(2, 3)).validate()
    assert(ArrayMeta("a", Seq(4, 6), Seq(2, 3)).chunkGrid == Seq(2, 2))
    assert(ArrayMeta("a", Seq(4, 6), Seq(2, 3)).numChunks == 4)
  }
  test("non-positive dims rejected") {
    intercept[IllegalArgumentException](ArrayMeta("a", Seq(0, 2), Seq(1, 1)).validate())
    intercept[IllegalArgumentException](ArrayMeta("a", Seq(2, 2), Seq(1, -1)).validate())
  }
  test("rank mismatch rejected") {
    intercept[IllegalArgumentException](ArrayMeta("a", Seq(2, 2), Seq(1)).validate())
  }
  test("irregular decomposition rejected") {
    intercept[IllegalArgumentException](ArrayMeta("a", Seq(5, 2), Seq(2, 1)).validate())
  }
  test("chunk position bounds") {
    val m = ArrayMeta("a", Seq(4, 4), Seq(2, 2)).validate()
    m.validatePosition(Seq(1, 1))
    intercept[IllegalArgumentException](m.validatePosition(Seq(2, 0)))
    intercept[IllegalArgumentException](m.validatePosition(Seq(0)))
  }
}
