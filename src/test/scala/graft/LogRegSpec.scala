package graft

import graft.pipeline.LogReg
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Distributed logistic regression: separates separable data, standardizes
  * exactly, featurizes deterministically, and is partition-layout
  * invariant up to float-sum reassociation (the KMeansSpec contract). */
class LogRegSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private val rng = new Random(11)
  // two well-separated gaussian blobs in 4d; y = which blob
  private val points: Seq[(Seq[Double], Double)] = (0 until 200).map { i =>
    val y = i % 2
    val c = if (y == 1) 2.0 else -2.0
    (Seq.fill(4)(c + rng.nextGaussian() * 0.5), y.toDouble)
  }

  test("reaches 100% training accuracy on separable blobs") {
    val ds = points.toDS()
    val (w, b) = LogReg.fit(ds, 4, iters = 100, lr = 1.0)
    val acc = points.count { case (x, y) =>
      val z = b + x.indices.map(i => w(i) * x(i)).sum
      (if (z > 0) 1.0 else 0.0) == y
    }.toDouble / points.size
    assert(acc == 1.0, s"expected separation, got $acc")
  }

  test("standardize computes exact per-dimension moments") {
    val ds = Seq((Seq(1.0, 10.0), 0.0), (Seq(3.0, 10.0), 1.0)).toDS()
    val (mu, sd) = LogReg.standardize(ds, 2)
    assert(mu.toSeq == Seq(2.0, 10.0))
    assert(sd(0) == 1.0)
    assert(sd(1) == 1.0) // zero variance guards to 1.0, never divides by 0
  }

  test("featurize is deterministic, normalized, and length-invariant") {
    val a = LogReg.featurize("the quick fox", 64)
    val b = LogReg.featurize("the quick fox", 64)
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.sum - 1.0) < 1e-12)
    // doubling the document scales nothing: counts normalize out
    val twice = LogReg.featurize("the quick fox the quick fox", 64)
    assert(a.indices.forall(i => math.abs(a(i) - twice(i)) < 1e-12))
  }

  test("training is partition-layout invariant up to float reassociation") {
    val one = LogReg.fit(points.toDS().repartition(1), 4, 50, 1.0)
    val many = LogReg.fit(points.toDS().repartition(8), 4, 50, 1.0)
    one._1.indices.foreach { i =>
      assert(math.abs(one._1(i) - many._1(i)) < 1e-9,
        s"w($i): ${one._1(i)} vs ${many._1(i)}")
    }
    assert(math.abs(one._2 - many._2) < 1e-9)
  }

  test("training leaves no persisted RDDs behind") {
    LogReg.fit(points.toDS(), 4, 3, 1.0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
