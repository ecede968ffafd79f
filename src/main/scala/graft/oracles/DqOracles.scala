package graft.oracles

/** DuckDB oracle SQL for data-quality checks and lineage (dq*) — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object DqOracles {
  val sql: Map[String, String] = Map(
    // Closed-form: the drift is exactly what the fixture constructed
    // (n_words removed, n_chars bigint->int, lang added).
    "dq06_schema_drift" ->
      """SELECT * FROM (VALUES
        |  ('doc_id',  'unchanged',    'bigint', 'bigint'),
        |  ('lang',    'added',        CAST(NULL AS VARCHAR), 'string'),
        |  ('n_chars', 'type_changed', 'bigint', 'int'),
        |  ('n_words', 'removed',      'bigint', CAST(NULL AS VARCHAR)),
        |  ('source',  'unchanged',    'string', 'string'))
        |  t(column_name, status, old_type, new_type)""".stripMargin,
    "dq01_assertion_events" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
        |    COUNT(DISTINCT o_orderkey) AS d
        |  FROM orders),
        |checks AS (
        |  SELECT 'row_count' AS native_type, n >= 1 AS ok,
        |    'rows=' || n || ' min=1' AS native_results FROM m
        |  UNION ALL
        |  SELECT 'null_rate_o_custkey', CAST(nulls AS DOUBLE)/n <= 0.0,
        |    printf('null_rate=%.4f max=%.4f', CAST(nulls AS DOUBLE)/n, 0.0)
        |  FROM m
        |  UNION ALL
        |  SELECT 'unique_key_o_orderkey', d = n,
        |    'distinct=' || d || ' rows=' || n FROM m)
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,orders,PROD)' AS assertee_urn,
        |  'urn:li:assertion:' || md5('graft:' || native_type ||
        |    ':urn:li:dataset:(urn:li:dataPlatform:graft,orders,PROD)') AS assertion_urn,
        |  native_type, native_results,
        |  CASE WHEN ok THEN 'SUCCESS' ELSE 'FAILURE' END AS result_type,
        |  CAST(202608121100 AS BIGINT) AS run_hr,
        |  'COMPLETE' AS run_status
        |FROM checks""".stripMargin,
    "dq02_datahub_aspects" ->
      """WITH m AS (SELECT DISTINCT source AS table_name FROM documents)
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,' || table_name ||
        |    ',PROD)' AS dataset_urn,
        |  'dataset' AS entity_type, 'UPSERT' AS change_type,
        |  'institutionalMemory' AS aspect_name,
        |  'https://dq.example/runbook/' || table_name AS url,
        |  'DQ runbook for ' || table_name AS description,
        |  CAST(NULL AS VARCHAR) AS tag_urn
        |FROM m
        |UNION ALL
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,' || table_name ||
        |    ',PROD)',
        |  'dataset', 'UPSERT', 'globalTags',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  'urn:li:tag:Monitored_By_Anomalo'
        |FROM m""".stripMargin,
    // LEFT JOIN against distinct parent keys; orphans = unmatched.
    "dq04_fk_orphans" ->
      """WITH ck AS (SELECT DISTINCT c_custkey FROM customer),
        |ok AS (SELECT DISTINCT o_orderkey FROM orders)
        |SELECT 'orders' AS child_table,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(ck.c_custkey) AS BIGINT) AS n_orphans
        |FROM orders LEFT JOIN ck ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(ok.o_orderkey) AS BIGINT)
        |FROM lineitem LEFT JOIN ok ON l_orderkey = o_orderkey""".stripMargin,
    // lead() over distinct (group, hour); a >1h step is a gap.
    "dq05_series_gaps" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hr
        |  FROM events),
        |l AS (
        |  SELECT event_type, hr,
        |    lead(hr) OVER (PARTITION BY event_type ORDER BY hr) AS nxt
        |  FROM h)
        |SELECT event_type,
        |  CAST(strftime(hr, '%Y%m%d%H') || '00' AS BIGINT)
        |    AS gap_after_hr,
        |  CAST((epoch(nxt) - epoch(hr)) / 3600 - 1 AS BIGINT)
        |    AS missing_hours
        |FROM l
        |WHERE nxt IS NOT NULL AND epoch(nxt) - epoch(hr) > 3600""".stripMargin,
    // ns91's derivation operand-for-operand: exact cent sums, then
    // mean/var/z as the same IEEE double expression tree.
    "dq03_metric_anomaly" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS x_cents
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(x_cents) AS s1, SUM(x_cents * x_cents) AS s2
        |  FROM h GROUP BY 1),
        |d AS (
        |  SELECT event_type,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
        |      AS var FROM st),
        |zc AS (
        |  SELECT h.event_type, run_hr, x_cents,
        |    CASE WHEN var <= 0 THEN 0.0
        |      ELSE (CAST(x_cents AS DOUBLE) - mean) / sqrt(var)
        |    END AS z
        |  FROM h JOIN d ON h.event_type = d.event_type)
        |SELECT event_type, run_hr, x_cents, z,
        |  abs(z) > 3.0 AS is_anomaly
        |FROM zc""".stripMargin,
    // Level-1 classes are counted over ESCALATED rows only (rows
    // released at level 0 publish finer QI values, so they cannot
    // hide a generalized row); class sizes via grouped counts, the
    // same shape the Spark plan broadcasts back.
    "ns143_k_anonymity" ->
      """WITH base AS (
        |  SELECT event_id, event_type,
        |    date_trunc('day', ts) AS qi_day,
        |    CAST(floor(value / 10) AS BIGINT) AS band10,
        |    event_type AS qi1_type,
        |    CAST(floor(value / 50) AS BIGINT) AS band50
        |  FROM events),
        |c0 AS (
        |  SELECT event_type, qi_day, band10,
        |    CAST(COUNT(*) AS BIGINT) AS n0
        |  FROM base GROUP BY 1, 2, 3),
        |b0 AS (
        |  SELECT base.*, c0.n0 FROM base
        |  JOIN c0 USING (event_type, qi_day, band10)),
        |c1 AS (
        |  SELECT qi1_type, band50, CAST(COUNT(*) AS BIGINT) AS n1
        |  FROM b0 WHERE n0 < 4 GROUP BY 1, 2)
        |SELECT event_id, event_type, qi_day, band10, qi1_type, band50,
        |  n0,
        |  CASE WHEN n0 < 4 THEN n1 ELSE NULL END AS n1,
        |  CAST(CASE WHEN n0 >= 4 THEN 0
        |            WHEN n1 >= 4 THEN 1 ELSE -1 END AS BIGINT) AS level,
        |  (CASE WHEN n0 >= 4 THEN 0
        |        WHEN n1 >= 4 THEN 1 ELSE -1 END) >= 0 AS kept
        |FROM b0 LEFT JOIN c1 USING (qi1_type, band50)""".stripMargin,
  )
}
