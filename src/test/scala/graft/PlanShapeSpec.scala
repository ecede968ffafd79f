package graft

/** Physical-plan shape gates for the relational core: the claims in
  * README "Scale design rules (enforced, not aspirational)" as
  * assertions. These inspect the pre-execution physical plan — the
  * shapes (scan pushdown/pruning, partial aggregation, top-k
  * operators, broadcast dims, shuffle-free map plans) are decided at
  * planning time, so nothing needs to run. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q01: shipdate predicate reaches the parquet scan; partial aggs") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
    // map-side combine: partial aggregate below the exchange
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
  }

  test("q02: lineitem scan pruned to the 3 needed columns") {
    val p = plan("q02_revenue_by_brand")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .getOrElse(fail(s"no lineitem scan:\n$p"))
    assert(scanLine.contains("l_partkey") &&
      scanLine.contains("l_extendedprice") &&
      scanLine.contains("l_discount"))
    assert(!scanLine.contains("l_comment") &&
      !scanLine.contains("l_shipdate"),
      s"lineitem scan reads unneeded columns:\n$scanLine")
  }

  test("q03: constant-size dims (nation, region) are broadcast") {
    val p = plan("q03_local_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q06: sort+limit plans as TakeOrdered, not a global sort") {
    val p = plan("q06_top100_orders")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
  }

  test("q07: per-group top-k prunes per-partition before the exchange") {
    val p = plan("q07_top3_orders_per_customer")
    // WindowGroupLimit appears twice: Partial (before the shuffle,
    // bounding what ships) and Final. The Partial one is the scale win.
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial"), s"no partial group-limit:\n$p")
  }

  test("q08 lateral flatten and ns08 text stats are shuffle-free") {
    for (name <- Seq("q08_lateral_flatten", "ns08_text_stats")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }
}
