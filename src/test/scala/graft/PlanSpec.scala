package graft

import graft.SparkEntry.queries

/** Physical-plan assertions: the properties that decide whether these
  * operators survive a 100× scale-up — filter pushdown into the parquet
  * scan, column pruning, broadcast joins for small dims, TakeOrdered for
  * top-k (no global sort), and whole-stage codegen on the hot paths.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1_agg prunes columns at the scan and runs inside codegen") {
    val df = queries("q1_agg")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"))
    // only the 4 needed columns are read, not all 11
    assert(!p.contains("l_shipdate") && !p.contains("l_partkey"))
    df.collect() // AQE: codegen stages appear in the finalized plan
    // "*(n)" prefixes mark whole-stage-codegen spans in simpleString
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("point lookup pushes the key predicate into the parquet scan") {
    val p = plan("q_p4_point_lookup")
    assert(p.contains("PushedFilters") && p.contains("IsNotNull(l_orderkey)"))
    assert(p.contains("EqualTo(l_orderkey"))
  }

  test("search pushes only the residual filter; projection is pruned") {
    val p = plan("q_p6_search")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("p_retailprice")) // unused column never read
  }

  test("3-way join broadcasts the small dimension") {
    val p = plan("q_j1_3way_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("OR-join rewrite stays hash-joinable (no nested-loop join)") {
    val p = plan("q_j2_or_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("anti-join plans as a real anti hash join") {
    val p = plan("q_j4_anti_join")
    assert(p.contains("LeftAnti"))
  }

  test("top-k plans as TakeOrdered, not a global sort") {
    val p = plan("q_o2_top1")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("frequency table does partial (map-side) aggregation before the shuffle") {
    val p = plan("q_a3_value_counts")
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
    assert(p.contains("Exchange hashpartitioning"))
  }

  test("window queries shuffle once on the partition key") {
    val p = plan("q_w2_rank_in_partition")
    assert(p.split("Exchange hashpartitioning").length - 1 <= 1)
  }
}
