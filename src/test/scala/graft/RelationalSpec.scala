package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("all registered queries run and agree with local recompute basics") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // count() exercises the whole plan
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("q01 pricing summary: 6 flag/status groups, exact sums") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6)
    val li = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == li.count())
  }

  test("q08 lateral flatten emits one row per word with 1-based index") {
    val got = SparkEntry.queries("q08_lateral_flatten")(spark, sf)
    val words = Tables(spark, sf, "part")
      .select(size(split(col("p_name"), " ")).cast("long").as("nw"))
      .agg(sum("nw")).collect()(0).getLong(0)
    assert(got.count() == words)
    val idx = got.groupBy("p_partkey")
      .agg(min("word_idx").as("lo"), max("word_idx").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(idx.isEmpty, "word_idx must be dense 1..n per part")
  }

  // The J1/J2 inverse law the old q08 gated. collect_list is BOUNDED
  // here (one customer's orders on a small sample) — the unbounded
  // per-group list is exactly what got q08 retired from the registered
  // set; as a law test the sample suffices.
  test("collect_list then explode is identity (bounded sample)") {
    val sample = Tables(spark, sf, "orders")
      .filter(col("o_custkey") < 100)
    val got = sample.groupBy(col("o_custkey"))
      .agg(collect_list(col("o_orderkey")).as("keys"))
      .select(col("o_custkey"), explode(col("keys")).as("o_orderkey"))
      .orderBy("o_custkey", "o_orderkey").collect()
    val exp = sample.select(col("o_custkey"), col("o_orderkey"))
      .orderBy("o_custkey", "o_orderkey").collect()
    assert(got.sameElements(exp))
  }

  test("q06 top100 is sorted desc by totalprice") {
    val prices = SparkEntry.queries("q06_top100_orders")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 100)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q07 per-group top-k: no group exceeds k") {
    val df = SparkEntry.queries("q07_top3_orders_per_customer")(spark, sf)
    val maxPerGroup = df.groupBy("o_custkey").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerGroup <= 3)
  }

  test("semi + anti partition customers") {
    val c = Tables(spark, sf, "customer")
    val o = Tables(spark, sf, "orders").filter(col("o_orderstatus") === "P")
    val semi = graft.ops.Relational
      .semiJoin(c, o, col("c_custkey") === col("o_custkey")).count()
    val anti = graft.ops.Relational
      .antiJoin(c, o, col("c_custkey") === col("o_custkey")).count()
    assert(semi + anti == c.count())
  }
}
