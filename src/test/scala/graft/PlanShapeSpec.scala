package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100 TB design contract (SURVEY.md
  * §4): pushdown, pruning, broadcast choice, and top-k planning must appear
  * in the plan, not just produce correct rows.
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("scan_projection prunes the parquet ReadSchema to selected columns") {
    val p = plan("scan_projection")
    assert(p.contains("l_orderkey"))
    assert(!p.contains("l_extendedprice"),
      "pruned column must not reach the scan")
  }

  test("scan_filter_pushdown pushes predicates into the parquet scan") {
    val p = plan("scan_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("LessThan(l_quantity"), p)
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("limit_topk plans TakeOrderedAndProject (no full global sort)") {
    assert(plan("limit_topk").contains("TakeOrderedAndProject"))
  }

  test("agg_group partial-aggregates before the shuffle") {
    val p = plan("agg_group")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"))
    assert(p.contains("Exchange hashpartitioning"))
  }

  test("sim_cosine_topk broadcasts the query side (no shuffle of candidates)") {
    val p = plan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("expr_custom stays inside whole-stage codegen") {
    // AQE only materializes WholeStageCodegen spans in the final plan.
    val df = SparkEntry.queries("expr_custom")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // The `*(N)` prefix marks operators fused into WholeStageCodegen stage
    // N; the Project evaluating graft_cosine must carry it.
    assert("""\*\(\d+\) Project \[[^\n]*graft_cosine""".r
      .findFirstIn(p).isDefined, p)
  }
}
