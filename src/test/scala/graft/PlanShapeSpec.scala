package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these queries
  * scale are physical-plan facts, not just results — pin them so a
  * refactor that silently loses pushdown/broadcast/top-k shape fails CI.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = Engine.session("test")

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02: predicates and pruned schema reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    // only the needed columns are read
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"), p.take(800))
  }

  test("q04: small dimension is broadcast, aggregation is partial+final") {
    val p = plan("q04_brand_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("partial_count"), p.take(800))
  }

  test("q11: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q11_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q60: per-query top-k uses WindowGroupLimit partial pushdown") {
    val p = plan("q60_knn_bruteforce")
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(p.contains("graft_dot"), p.take(1500))
  }

  test("q01: aggregation combines map-side (partial_sum before exchange)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), p.take(800))
  }
}
