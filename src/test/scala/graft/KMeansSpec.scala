package graft

import graft.pipeline.KMeans
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Distributed Lloyd's k-means: converges to the true cluster means on
  * well-separated synthetic data, is partition-layout independent (up to
  * float reassociation), and its per-iteration data movement is bounded
  * (centroids broadcast, corpus stationary). */
class KMeansSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val rng = new Random(7)
  private val trueMeans = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
  private val points: Seq[(Long, Seq[Double])] = (0L until 90L).map { i =>
    val m = trueMeans((i % 3).toInt)
    (i, m.map(_ + rng.nextGaussian() * 0.3))
  }

  test("converges to the true means on separated clusters") {
    val ds = spark.createDataset(points).repartition(8)
    val cents = KMeans.fit(ds, k = 3, iters = 6)
    // every true mean is matched by exactly one centroid within 0.3
    val matched = trueMeans.map { m =>
      cents.count(c => math.sqrt(c.lazyZip(m).map((a, b) => (a - b) * (a - b)).sum) < 0.3)
    }
    assert(matched == Seq(1, 1, 1), s"centroids ${cents.map(_.toSeq).toSeq}")
  }

  test("result is independent of partition layout (up to float reassociation)") {
    val a = KMeans.fit(spark.createDataset(points).repartition(2), 3, 4)
    val b = KMeans.fit(spark.createDataset(points).repartition(16), 3, 4)
    a.lazyZip(b).foreach { (ca, cb) =>
      ca.lazyZip(cb).foreach((x, y) => assert(math.abs(x - y) < 1e-9))
    }
  }

  test("fitSubspaces equals independent per-slice fits (up to float reassociation)") {
    // 4-dim points, 2 subspaces of 2 dims: the fused single-pass trainer
    // must reproduce what separate fits on each slice produce
    val pts4: Seq[(Long, Seq[Double])] = (0L until 90L).map { i =>
      val a = trueMeans((i % 3).toInt)
      val b = trueMeans(((i + 1) % 3).toInt)
      (i, Seq(a(0) + rng.nextGaussian(), a(1) + rng.nextGaussian(),
        b(0) + rng.nextGaussian(), b(1) + rng.nextGaussian()))
    }
    val ds = spark.createDataset(pts4).repartition(8).persist()
    try {
      val fused = KMeans.fitSubspaces(ds, nSub = 2, k = 3, iters = 4)
      val solo = (0 until 2).map { sub =>
        KMeans.fit(ds.map { case (id, v) => (id, v.slice(sub * 2, sub * 2 + 2)) }, 3, 4)
      }
      for (sub <- 0 until 2; j <- 0 until 3; i <- 0 until 2)
        assert(math.abs(fused(sub)(j)(i) - solo(sub)(j)(i)) < 1e-9,
          s"sub=$sub centroid=$j dim=$i: ${fused(sub)(j)(i)} vs ${solo(sub)(j)(i)}")
    } finally ds.unpersist()
  }

  test("empty clusters keep their centroid; nearest breaks ties low") {
    // all points identical -> clusters 1, 2 never win after init
    val same = (0L until 10L).map(i => (i, Seq(5.0, 5.0)))
    val cents = KMeans.fit(spark.createDataset(same), 3, 3)
    assert(cents(0).toSeq == Seq(5.0, 5.0))
    // untouched clusters retain their (identical) init centroid
    assert(cents(1).toSeq == Seq(5.0, 5.0) && cents(2).toSeq == Seq(5.0, 5.0))
    assert(KMeans.nearest(cents, Seq(5.0, 5.0)) == 0)
  }
}
