package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here,
  * plus (where ANSI-SQL-expressible) a DuckDB oracle in [[oracleSql]].
  * Column names and types are aligned between the Spark plan and the
  * oracle SQL because the driver's compare hashes values under sorted
  * column names.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(
      t(spark, "/root/testdata/sf0.001", "lineitem"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregation (hash agg, partial+final) ----
    "q01_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(t(s, d, "lineitem"))),

    // ---- §2.3 joins: broadcast fact⋈dim ----
    "q02_revenue_by_brand" -> ((s, d) =>
      Relational.revenueByBrand(t(s, d, "lineitem"), t(s, d, "part"))),

    // ---- §2.3 joins: multi-table star join ----
    "q03_local_supplier_revenue" -> ((s, d) =>
      Relational.localSupplierRevenue(
        t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem"),
        t(s, d, "supplier"), t(s, d, "nation"), t(s, d, "region"), "ASIA")),

    // ---- §2.3 semi/anti joins (EXISTS / NOT EXISTS) ----
    "q04_customers_with_open_orders" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      Relational.semiJoin(c, o, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"))
    }),
    "q05_customers_without_partial_orders" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "P")
      Relational.antiJoin(c, o, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // ---- §2.4 sort + limit (TakeOrderedAndProject, no global sort) ----
    "q06_top100_orders" -> ((s, d) =>
      Relational.topK(
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        100, col("o_totalprice").desc, col("o_orderkey").asc)),

    // ---- §2.4 window: per-group top-k ----
    "q07_top3_orders_per_customer" -> ((s, d) =>
      Relational.topKPerGroup(
        t(s, d, "orders"), 3,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))),

    // ---- §2.3 J1/J2: collect_list ∘ explode ≡ id (lateral flatten) ----
    "q08_explode_roundtrip" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(collect_list(col("o_orderkey")).as("keys"))
        .select(col("o_custkey"),
          explode(col("keys")).as("o_orderkey"))),

    // ---- §2.3 U1: UNION ALL ----
    "q09_union_all_counts" -> ((s, d) => {
      val a = t(s, d, "orders").groupBy(col("o_orderstatus").as("category"))
        .agg(count(lit(1)).as("n"))
      val b = t(s, d, "events").groupBy(col("event_type").as("category"))
        .agg(count(lit(1)).as("n"))
      a.unionAll(b)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | MIN(l_quantity) AS min_qty,
        | MAX(l_extendedprice) AS max_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_brand" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q03_local_supplier_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey  = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation   ON s_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q04_customers_with_open_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin,
    "q05_customers_without_partial_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin,
    "q06_top100_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q07_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q08_explode_roundtrip" ->
      "SELECT o_custkey, o_orderkey FROM orders",
    "q09_union_all_counts" ->
      """SELECT o_orderstatus AS category, COUNT(*) AS n FROM orders GROUP BY 1
        |UNION ALL
        |SELECT event_type AS category, COUNT(*) AS n FROM events GROUP BY 1""".stripMargin,
  )
}
