package graft.core

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Generative checks over the index math every structural operator rests
  * on: arbitrary ranks, shapes, permutations, and slice windows (seeded,
  * 200 cases per property). */
class BlockIndexPropertySpec extends AnyFunSuite {
  private def cases: Seq[List[Int]] = {
    val rng = new Random(7)
    (0 until 200).map { _ =>
      List.fill(1 + rng.nextInt(4))(1 + rng.nextInt(5))
    }
  }

  test("linearize/delinearize are inverse for any shape") {
    cases.foreach { shape =>
      val n = shape.product
      (0 until n).foreach { lin =>
        val idx = BlockIndex.delinearize(lin, shape)
        assert(BlockIndex.linearize(idx, shape) == lin)
        assert(idx.indices.forall(d => idx(d) >= 0 && idx(d) < shape(d)))
      }
    }
  }

  test("transposeBlock twice with the inverse permutation is identity") {
    val rng = new Random(11)
    cases.foreach { shape =>
      val data = Array.tabulate(shape.product)(_.toDouble)
      val perm = rng.shuffle(shape.indices.toList).toArray
      val (t1, s1) = BlockIndex.transposeBlock(data, shape.toArray, perm)
      val inv = new Array[Int](perm.length)
      perm.indices.foreach(i => inv(perm(i)) = i)
      val (t2, s2) = BlockIndex.transposeBlock(t1, s1, inv)
      assert(s2.toSeq == shape)
      assert(t2.toSeq == data.toSeq)
    }
  }

  test("extract returns exactly the requested window") {
    cases.foreach { shape =>
      val data = Array.tabulate(shape.product)(_.toDouble)
      val ranges = shape.map(s => { val a = s / 3; (a, math.max(a + 1, s - s / 3)) }).toArray
      val (out, outShape) = BlockIndex.extract(data, shape.toArray, ranges)
      assert(outShape.toSeq == ranges.map { case (a, b) => b - a }.toSeq)
      var i = 0
      while (i < out.length) {
        val li = BlockIndex.delinearize(i, outShape.toIndexedSeq)
        val src = li.indices.map(d => li(d) + ranges(d)._1).toArray
        assert(out(i) == data(BlockIndex.linearize(src, shape)))
        i += 1
      }
    }
  }

  test("reduceAxis(sum) preserves the total for every axis") {
    cases.foreach { shape =>
      val data = Array.tabulate(shape.product)(i => (i % 7).toDouble)
      shape.indices.foreach { ax =>
        val (red, redShape) = BlockIndex.reduceAxis(data, shape.toArray, ax, _ + _, 0.0)
        assert(redShape.toSeq == shape.indices.filter(_ != ax).map(shape))
        assert(red.sum == data.sum)
      }
    }
  }
}
