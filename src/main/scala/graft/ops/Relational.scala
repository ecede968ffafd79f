package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators, expressed as declarative DataFrame
  * transforms so Catalyst provides predicate pushdown, column pruning,
  * partial aggregation and join-strategy selection for free.
  *
  * Oracle-parity note: double-typed SUMs are order-dependent in IEEE
  * arithmetic, so any engine-vs-oracle hash compare over a shuffled
  * aggregation would be flaky. We sum in exact DECIMAL and cast the
  * final result back to double — bit-identical across Spark and DuckDB
  * regardless of execution order, and still a single map-side-combinable
  * hash aggregate in Spark.
  */
object Relational {

  /** Exact (order-independent) sum of a double column: decimal-sum then
    * cast back. `scale` must cover the true decimal scale of the data. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average, computed as exact-sum / count in double space. */
  def exactAvg(c: Column, scale: Int = 2): Column =
    exactSum(c, scale) / count(c)

  /** TPC-H Q1-style pricing summary: filter → hash-aggregate with
    * map-side partial aggregation; the shipdate predicate is pushed to
    * the parquet scan. Scales as a single shuffle on a low-cardinality
    * grouping key (6 groups) — at 100 TB the partial aggregates reduce
    * each task's output to a handful of rows before the exchange. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("sum_disc_price"),
        exactSum(
          col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")), 8).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("count_order"))

  /** Fact⋈dimension revenue rollup. `part` is 30× smaller than
    * `lineitem` but GROWS with it (3 TB at a 100 TB fact table), so no
    * explicit broadcast hint — a hint is honored regardless of size
    * and would OOM at scale. Catalyst/AQE broadcasts it at fixture
    * scale (verified in the plan) and falls back to a shuffled join
    * beyond the threshold, which is the correct behavior at both ends. */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q5-style star join: local-supplier revenue per nation within
    * one region. Only the true constant-size dimensions (nation: 25
    * rows, region: 5 rows) carry an explicit broadcast hint. customer
    * and supplier GROW with the fact tables — an explicit broadcast
    * hint is honored regardless of size and would OOM at 100 TB, so
    * strategy selection for them is left to Catalyst/AQE (broadcast at
    * fixture scale, sort-merge at cluster scale; bucketing
    * orders+lineitem by orderkey would remove the big shuffle).
    */
  def localSupplierRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === lit(regionName))
      .groupBy(col("n_name"))
      .agg(exactSum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))

  /** Multi-level grouped aggregation (§2.4 extension): ROLLUP emits
    * per-(a,b), per-a, and grand-total rows in ONE pass — Spark plans
    * it as a single Expand + hash aggregate, so the table is scanned
    * once for every level instead of once per level. `grouping_id`
    * (bit-vector of rolled-up keys) disambiguates levels exactly as
    * SQL GROUPING() does. */
  def rollupAgg(df: DataFrame, k1: String, k2: String,
      valueCol: String): DataFrame =
    df.rollup(col(k1), col(k2))
      .agg(grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n"), exactSum(col(valueCol)).as("total"))

  /** CUBE variant: all 2^k grouping-set combinations in one pass. */
  def cubeAgg(df: DataFrame, k1: String, k2: String,
      valueCol: String): DataFrame =
    df.cube(col(k1), col(k2))
      .agg(grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n"), exactSum(col(valueCol)).as("total"))

  /** Left-semi join: rows of `left` having a match in `right` (EXISTS).
    * Semi joins ship only the join key of the right side and never
    * duplicate left rows — the cheapest existence test at scale. */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Left-anti join (NOT EXISTS). */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Global top-k with a total-order tiebreak so results are
    * deterministic. Spark executes order+limit as TakeOrderedAndProject:
    * each partition keeps only its local top-k, then the driver merges
    * k·numPartitions rows — no full sort, no full shuffle, safe at 100 TB
    * for small k. */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Per-group top-k via row_number window; `order` must include a
    * unique tiebreak column for determinism. One shuffle on the
    * partition keys; skewed groups are handled by AQE. */
  def topKPerGroup(df: DataFrame, k: Int, partitionBy: Seq[Column],
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
