package graft

import graft.queries.Registry

/** Physical-plan discipline: the properties that decide whether a plan
  * survives a 100× scale-up — predicate pushdown into the parquet scan,
  * column pruning, broadcast joins for dims, whole-stage codegen. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = Registry.all(name).run(spark, sf0001)
    df.queryExecution.executedPlan.toString()
  }

  test("scan+filter pushes predicates into the parquet scan") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), "quantity filter not pushed")
  }

  test("scan+filter prunes columns (no full-width read)") {
    val p = plan("q_scan_filter_project")
    // ReadSchema should not include uninvolved columns like l_comment-ish
    assert(!p.contains("l_returnflag"), "unpruned column in scan")
  }

  test("star join broadcasts dimension tables") {
    val p = plan("q_join_star_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("scalar queries stay in whole-stage codegen") {
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    val p = plan("q_scalar_arith")
    assert(p.contains("*(1)"), p)
  }

  test("partition_by produces a single exchange, not more") {
    val p = plan("q_partition_by")
    assert("Exchange".r.findAllIn(p).length <= 1, p)
  }
}
