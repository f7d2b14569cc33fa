package graft

import graft.relational.QueryCatalog
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the 100 TB discipline checks: filters reach the
  * parquet scan, projections prune the read schema, small dimensions
  * broadcast, top-k never globally sorts. These pin the *plan*, so a
  * regression in pushdown or join strategy fails CI even though results
  * stay correct. */
class PlanQualitySpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = QueryCatalog.byName(name).build(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q05 filter+projection push into the parquet scan") {
    val plan = planOf("q05_filter_project")
    assert(plan.contains("PushedFilters: ["), "expected pushed filters")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,48.0)"),
      s"quantity filter must reach the scan:\n$plan")
    // projection pruning: only the 4 selected + filter columns are read
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => !s.contains("l_extendedprice") && !s.contains("l_shipdate")),
      s"scan must prune unused columns, got $readSchema")
  }

  test("q02 broadcasts the small dimension tables") {
    val plan = planOf("q02_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), "nation/region joins must broadcast")
  }

  test("q03 top-k uses TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q03_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT after ORDER BY must compile to top-k:\n${plan.take(2000)}")
  }

  test("q01 aggregates with map-side partials") {
    val plan = planOf("q01_pricing_summary")
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, "expected partial + final hash aggregation")
  }

  test("q06 reads only the three columns it needs") {
    val plan = planOf("q06_selective_revenue")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(Seq("l_quantity", "l_discount", "l_extendedprice").forall(readSchema.contains))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"column pruning failed: $readSchema")
  }

  test("qs01 broadcasts the query vectors (no shuffle of the corpus)") {
    val plan = planOf("qs01_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "ANN scan side must join against broadcast queries")
  }
}
