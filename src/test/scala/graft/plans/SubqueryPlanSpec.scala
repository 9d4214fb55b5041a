package graft.plans

import graft.{Queries, SparkSpec}

/** Catalyst must DECORRELATE the round-9 subquery rows: one join +
  * aggregate shapes, never a per-row re-scan (no nested-loop or
  * cartesian execution of the subquery side). */
class SubqueryPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Queries.all(name)(spark, sf()).queryExecution.executedPlan.toString

  test("scalar_subquery: per-part average becomes one aggregate + join") {
    val p = plan("scalar_subquery")
    assert(!p.contains("CartesianProduct"), p)
    // the correlated avg decorrelates to an Aggregate joined on
    // l_partkey — visible as >= 2 aggregates (avg + outer) and a join
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("exists_subquery: EXISTS becomes a semi join, not a re-scan") {
    val p = plan("exists_subquery")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("not_in_subquery: NOT IN becomes a (null-aware) anti join") {
    val p = plan("not_in_subquery")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rolling_sum_range: one partitioned window, no global sort") {
    val df = Queries.all("rolling_sum_range")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    // partitionBy(user_id) keys every exchange: no 1-partition global
    // exchange anywhere (SinglePartition only appears for global sorts)
    assert(!p.contains("SinglePartition"), p)
  }
}
