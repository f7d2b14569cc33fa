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
