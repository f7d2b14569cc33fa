package graft

import graft.pipeline.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE vocabulary induction: matches an independent
  * single-machine reference trainer on a classic fixture, is
  * partition-layout invariant, and applies merges with standard greedy
  * non-overlapping semantics. */
class BpeSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Independent in-memory reference implementation (the textbook
    * formulation — no Spark, no shared code paths with [[Bpe.train]]
    * beyond the published algorithm). */
  private def referenceTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var segs: Map[String, (IndexedSeq[String], Long)] =
      words.map { case (w, f) => w -> (w.map(_.toString): IndexedSeq[String], f) }
    (1 to n).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.values.foreach { case (seg, f) =>
        seg.indices.dropRight(1).foreach { i =>
          counts((seg(i), seg(i + 1))) = counts.getOrElse((seg(i), seg(i + 1)), 0L) + f
        }
      }
      val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      segs = segs.map { case (w, (seg, f)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < seg.length) {
          if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) { out += l + r; i += 2 }
          else { out += seg(i); i += 1 }
        }
        w -> (out.toIndexedSeq, f)
      }
      (l, r, c)
    }
  }

  private val classic = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("matches the independent reference trainer on the classic fixture") {
    val expected = referenceTrain(classic, 8)
    val got = Bpe.train(classic.toSeq.toDS(), 8)
    assert(got.map(m => (m.left, m.right, m.count)) == expected)
    // sanity anchor for the fixture itself: first merge is (e,s) with
    // count 9 (newest 6 + widest 3), second merges es+t
    assert(got.head.left == "e" && got.head.right == "s" && got.head.count == 9L)
    assert(got(1).left == "es" && got(1).right == "t" && got(1).count == 9L)
  }

  test("training is partition-layout invariant") {
    val one = Bpe.train(classic.toSeq.toDS().repartition(1), 6)
    val many = Bpe.train(classic.toSeq.toDS().repartition(8), 6)
    assert(one == many)
  }

  test("argmax ties break deterministically on (left, right)") {
    // "ab" and "ba" both have count 2; (a,b) < (b,a) lexicographically
    val words = Map("ab" -> 2L, "ba" -> 2L)
    val got = Bpe.train(words.toSeq.toDS(), 1)
    assert(got.head.left == "a" && got.head.right == "b" && got.head.count == 2L)
  }

  test("merge application is greedy left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.applyMerge(Vector("x"), "a", "a") == Vector("x"))
    assert(Bpe.applyMerge(Vector.empty[String], "a", "a") == Vector.empty[String])
  }

  test("training leaves no persisted RDDs behind") {
    Bpe.train(classic.toSeq.toDS(), 3)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
