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
  /** Code-point comparison (== UTF-8 binary order, Spark's UTF8String
    * ordering). Java's natural String order compares UTF-16 code units,
    * which sorts U+FFFF above every supplementary-plane symbol — the two
    * orders agree on the BMP but diverge beyond it, so the reference must
    * tie-break the same way the engine does. */
  private def cpCompare(a: String, b: String): Int = {
    val ai = a.codePoints().toArray
    val bi = b.codePoints().toArray
    var i = 0
    while (i < ai.length && i < bi.length) {
      if (ai(i) != bi(i)) return Integer.compare(ai(i), bi(i))
      i += 1
    }
    Integer.compare(ai.length, bi.length)
  }

  private val argmaxOrder: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2) // count DESC
        if (c != 0) c
        else {
          val cl = cpCompare(x._1._1, y._1._1)
          if (cl != 0) cl else cpCompare(x._1._2, y._1._2)
        }
      }
    }

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
      val ((l, r), c) = counts.toSeq.min(argmaxOrder)
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
    // guard: charSeg splits words into UTF-16 units, so supplementary-plane
    // fixtures would put lone surrogates through UTF8String encoding
    // (implementation-defined); the reference's code-point tie-break and
    // Spark's binary order are provably identical only for well-formed
    // segments, which ASCII guarantees
    assert(classic.keys.forall(_.forall(_ < 128)))
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

  test("encode reaches the merge fixpoint and round-trips") {
    val merges = Bpe.train(classic.toSeq.toDS(), 8)
    val ranks = merges.map(m => (m.left, m.right) -> m.step).toMap
    val products = merges.map(m => m.left + m.right).toSet
    (classic.keys ++ Seq("lowest", "newer", "wide", "zzz", "x")).foreach { w =>
      val enc = Bpe.encode(w, ranks)
      assert(enc.mkString == w, s"round trip failed for $w: $enc")
      assert(enc.indices.dropRight(1).forall(i => !ranks.contains((enc(i), enc(i + 1)))),
        s"non-canonical encoding for $w: $enc")
      assert(enc.forall(t => t.length == 1 || products.contains(t)),
        s"token outside vocabulary for $w: $enc")
    }
  }

  test("encode prefers the lowest-rank merge, not the leftmost pair") {
    // ranks: (b,c) trained before (a,b) — encoding "abc" must apply (b,c)
    // first even though (a,b) appears earlier in the word
    val ranks = Map(("b", "c") -> 1, ("a", "b") -> 2)
    assert(Bpe.encode("abc", ranks) == Vector("a", "bc"))
  }

  test("training leaves no persisted RDDs behind") {
    Bpe.train(classic.toSeq.toDS(), 3)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
