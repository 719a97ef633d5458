package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression gates: the performance-relevant physical plan
  * properties the engine promises (README "design rules") are asserted
  * here so a future refactor can't silently lose them — a query that
  * stops pushing filters or broadcasting dims would still be CORRECT,
  * which is exactly why correctness tests can't catch it.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String = {
    val df: DataFrame = SparkEntry.queries(q)(spark, sf("sf0.01"))
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    // (toString elides the tail of the filter list; the shipdate range
    // filter is the load-bearing pushdown)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(2000))
    // column pruning: the scan reads 5 columns, not the full table
    // (plan toString truncates long fields — assert the visible prefix)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string,l_shipdate"), p.take(2000))
  }

  test("q04: star join broadcasts all dimension sides, aggregates partially") {
    val p = plan("q04_multijoin_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(3000))
    assert(p.contains("partial_sum"), "partial aggregation must precede the exchange")
    assert(!p.contains("SortMergeJoin"), "no fact-fact sort-merge at this scale")
  }

  test("q05: top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q05_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Exchange rangepartitioning"),
      "a range-partitioned global sort would defeat the top-k heap")
  }

  test("q21: custom top-k aggregate runs with partial aggregation") {
    val p = plan("q21_topk_agg")
    assert(p.contains("partial_topkdouble"),
      s"TypedImperativeAggregate must combine map-side:\n${p.take(3000)}")
  }

  test("q36: range join plans the custom physical operator, no exchange") {
    val p = plan("q36_range_join")
    assert(p.contains("BroadcastRangeJoin"), p.take(2000))
  }

  test("q01: decimal-cast sums survive into the physical aggregate") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("sum(cast(l_quantity"), p.take(2000))
  }
}
