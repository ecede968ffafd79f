package graft.oracles

/** DuckDB oracle SQL for relational/SQL-surface queries (q01-q16) — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object RelationalOracles {
  val sql: Map[String, String] = Map(
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
    // Parameterized-SQL entry point ≡ the DataFrame entry point:
    // q01's oracle verbatim.
    "q15_parameterized_sql" ->
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
    "q08_lateral_flatten" ->
      """SELECT p_partkey, CAST(i AS BIGINT) AS word_idx, w[i] AS word
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part),
        |  UNNEST(range(1, len(w)+1)) AS t(i)""".stripMargin,
    "q09_union_all_counts" ->
      """SELECT o_orderstatus AS category, COUNT(*) AS n FROM orders GROUP BY 1
        |UNION ALL
        |SELECT event_type AS category, COUNT(*) AS n FROM events GROUP BY 1""".stripMargin,
    "q13_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""".stripMargin,
    "q14_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q12_topk_aggregator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q10_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q11_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    // ns70's n=2 slice through the SQL surface + the known repair of
    // the python literal (json.dumps spacing).
    "q16_sql_function_surface" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks,
        |    length(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g')) AS n_chars
        |  FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks)), i ->
        |    array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 2),
        |t2 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram)
        |SELECT b.doc_id,
        |  t2.gram AS top2_gram,
        |  coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top2_frac,
        |  '{"cnt": 1, "ok": true}' AS repaired
        |FROM base b
        |LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |  USING (doc_id)""".stripMargin,
  )
}
