package graft

import graft.functions.{MisraGries, MisraGriesAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Mergeable Misra-Gries heavy-hitters: the two textbook guarantees —
  * every token with true count > n/(k+1) is in the summary, and every
  * estimate undercounts by at most n/(k+1), never overcounts — must hold
  * under ANY partition layout (the merge tree is arbitrary in Spark), and
  * the buffer must never exceed k entries. qt08 gates the same contract
  * on the documents corpus; this spec stresses it on adversarial
  * Zipf-ish streams across partition splits. */
class MisraGriesSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: token i (of v) drawn ∝ 1/(i+1), shuffled. */
  private def stream(n: Int, v: Int, seed: Int): Seq[String] = {
    val rng = new Random(seed)
    val weights = (0 until v).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    rng.shuffle((0 until n).map { _ =>
      val u = rng.nextDouble()
      s"tok${cdf.indexWhere(u <= _)}"
    }.toVector)
  }

  private def guaranteesHold(toks: Seq[String], k: Int, parts: Int): Unit = {
    val ds = spark.createDataset(toks).repartition(parts)
    val summ = ds.toDF("token")
      .agg(MisraGries.summary(k)(col("token")).as("s"))
      .select(explode(col("s")).as("h"))
      .select(col("h.token").as("token"), col("h.count").as("est"))
      .as[(String, Long)].collect().toMap
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toDouble
    val bound = n / (k + 1)
    assert(summ.size <= k, s"summary holds ${summ.size} > k=$k entries")
    exact.foreach { case (t, c) =>
      if (c > bound)
        assert(summ.contains(t), s"heavy token $t (count $c > $bound) missing")
    }
    summ.foreach { case (t, est) =>
      val c = exact(t)
      assert(est <= c, s"$t overcounted: est $est > true $c")
      assert(c - est <= bound, s"$t undercount ${c - est} exceeds $bound")
    }
  }

  test("guarantees hold on a skewed stream across partition layouts") {
    val toks = stream(n = 20000, v = 500, seed = 11)
    for (parts <- Seq(1, 3, 7, 32)) guaranteesHold(toks, k = 16, parts = parts)
  }

  test("guarantees hold when k is tiny relative to the vocabulary") {
    val toks = stream(n = 5000, v = 1000, seed = 23)
    for (parts <- Seq(1, 5, 32)) guaranteesHold(toks, k = 4, parts = parts)
  }

  test("uniform stream (no heavy hitters) never violates the bound") {
    val toks = (0 until 4096).map(i => s"u${i % 512}")
    guaranteesHold(toks, k = 8, parts = 16)
  }

  test("local reduce matches the classic sequential algorithm") {
    val agg = new MisraGriesAgg(3)
    // a a a b c d: 'a' survives with the canonical MG trace
    val buf = "aaabcd".map(_.toString).foldLeft(agg.zero)(agg.reduce)
    assert(buf.keySet.contains("a"))
    assert(buf.size <= 3)
    assert(buf("a") >= 1 && buf("a") <= 3)
  }

  test("merge is bounded and order-insensitive in its guarantees") {
    val agg = new MisraGriesAgg(5)
    val s1 = stream(300, 40, 31).foldLeft(agg.zero)(agg.reduce)
    val s2 = stream(300, 40, 37).foldLeft(agg.zero)(agg.reduce)
    val m12 = agg.merge(s1, s2)
    val m21 = agg.merge(s2, s1)
    assert(m12.size <= 5 && m21.size <= 5)
    // both merge orders keep the k-counter bound; the guarantee itself is
    // checked distributively above
    assert(m12.keySet == m21.keySet)
  }
}
