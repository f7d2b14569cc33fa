package graft

import graft.pipeline.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  // the result is localCheckpoint-backed; unpersist after asserting so the
  // shared test session stays clean for the memory-discipline suites
  private def withResult(pairs: org.apache.spark.sql.DataFrame)(
      f: Array[org.apache.spark.sql.Row] => Unit): Unit = {
    val df = Dedup.connectedComponents(pairs)
    try f(df.collect()) finally df.unpersist()
  }

  test("connected components assigns the smallest reachable id as canonical") {
    // components: {1,2,3,9}, {4,5}, {7,8} — chain 1-2, 2-3, 3-9 needs
    // multiple propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (4L, 5L), (7L, 8L))
      .toDF("id_a", "id_b")
    withResult(pairs) { rows =>
      val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
        4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L))
    }
  }

  test("long chain converges (diameter > a couple of iterations)") {
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    withResult(pairs) { rows =>
      assert(rows.length == 31 && rows.forall(_.getLong(1) == 0L))
    }
  }

  test("no pairs -> empty assignment") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    withResult(pairs)(rows => assert(rows.isEmpty))
  }

  test("hitting maxIter without convergence throws instead of returning partial labels") {
    // a 30-link chain cannot settle in one round; silently returning the
    // half-propagated labels would be a wrong answer that LOOKS complete
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // and the failed call must not leak cached state
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "non-convergence path must release its caches")
  }
}
