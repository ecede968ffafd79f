package graft.oracles

/** DuckDB oracle SQL for sketch, quantile, and profile queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsSketchOracles {
  val sql: Map[String, String] = Map(
    // DuckDB SUM over integers yields HUGEINT, which pandas widens to
    // float64 and the value-hash then sees 0.0 vs Spark's int64 0 —
    // every oracle SUM whose result is a PROJECTED integer column must
    // be CAST(... AS BIGINT). (COUNT(*) is already BIGINT; SUMs that
    // only feed arithmetic are fine.)
    "ns15_column_profile" ->
      """SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(MIN(c_custkey) AS VARCHAR) AS min_str,
        |  CAST(MAX(c_custkey) AS VARCHAR) AS max_str
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', COUNT(*),
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR)
        |FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(*),
        |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
        |FROM customer""".stripMargin,
    // ns79's smoothing and fixed-point quantization over unit value
    // bins; the long sum per group is then exact.
    "ns97_psi_drift" ->
      """WITH ha AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
        |    count(*) AS n_old
        |  FROM events WHERE event_id % 10 != 3 GROUP BY 1, 2),
        |hb AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
        |    count(*) AS n_new
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(ha.event_type, hb.event_type) AS event_type,
        |    coalesce(ha.bin, hb.bin) AS bin,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM ha FULL OUTER JOIN hb
        |    ON ha.event_type = hb.event_type AND ha.bin = hb.bin),
        |tot AS (
        |  SELECT event_type, SUM(n_old) AS ta, SUM(n_new) AS tb,
        |    COUNT(*) AS v
        |  FROM j GROUP BY 1),
        |c AS (
        |  SELECT j.event_type,
        |    CAST(round(
        |      ((CAST(n_new AS DOUBLE) + 0.5) /
        |         (CAST(tb AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0))
        |       - (CAST(n_old AS DOUBLE) + 0.5) /
        |         (CAST(ta AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0)))
        |      * ln(((CAST(n_new AS DOUBLE) + 0.5) /
        |         (CAST(tb AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0)))
        |        / ((CAST(n_old AS DOUBLE) + 0.5) /
        |         (CAST(ta AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0))))
        |      * 16777216.0) AS BIGINT) AS cfx
        |  FROM j JOIN tot ON j.event_type = tot.event_type)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(cfx) AS BIGINT) AS psi_fx
        |FROM c GROUP BY event_type""".stripMargin,
    // Exact heavy-hitter counts + table totals; deterministic
    // (cnt desc, key) tie-break mirrors the TakeOrdered.
    "ns113_key_skew" ->
      """WITH c AS (
        |  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |             CAST(COUNT(*) AS BIGINT) AS nk FROM c),
        |r AS (
        |  SELECT key, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, key NULLS FIRST)
        |      AS rk
        |  FROM c)
        |SELECT key, cnt, t.total AS total_rows, t.nk AS n_keys,
        |  CAST(rk AS BIGINT) AS "rank"
        |FROM r, t WHERE rk <= 20""".stripMargin,
    "ns13_quantiles" ->
      """SELECT event_type,
        | quantile_disc(value, 0.5) AS p50,
        | quantile_disc(value, 0.9) AS p90,
        | quantile_disc(value, 0.99) AS p99
        |FROM events GROUP BY 1""".stripMargin,
    // Integer power sums are exact at any order/partitioning; the
    // derived doubles use sub-2^53 operands in a fixed order.
    "ns91_moment_columns" ->
      """WITH b AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(v) AS BIGINT) AS s1,
        |  CAST(SUM(v * v) AS BIGINT) AS s2,
        |  CAST(SUM(v * v * v) AS BIGINT) AS s3,
        |  CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_cents,
        |  (CAST(SUM(v * v) AS DOUBLE)
        |    - CAST(SUM(v) AS DOUBLE) * SUM(v) / COUNT(*)) / COUNT(*)
        |    AS var_cents
        |FROM b GROUP BY event_type""".stripMargin,
    // Same histogram-cut rule as ns82, per group and per quantile.
    "ns92_exact_quantiles" ->
      """WITH b AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, count(*) AS c
        |  FROM b GROUP BY 1, 2),
        |cum AS (SELECT event_type, v,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cm,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.25 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p25,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.5 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p50,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.75 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p75
        |FROM cum GROUP BY event_type""".stripMargin,
    // The whole CMS is exact: ns21's word split, the ns17 md5-prefix
    // hash per (token, seed), integer counts per (source, seed, cell).
    "ns93_cms_sketch" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |cells AS (
        |  SELECT source, seed,
        |    CAST(('0x' || substr(md5(tok || ':cms' || CAST(seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell
        |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS seed))
        |SELECT source, CAST(seed AS INT) AS seed, cell,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(256 AS INTEGER) AS width
        |FROM cells GROUP BY 1, 2, 3""".stripMargin,
    // PERCENTILE_DISC cuts from the exact cent-grid histogram; the
    // ceil boundaries use the identical doubles.
    "ns82_winsorize" ->
      """WITH b AS (SELECT event_id, value,
        |    CAST(round(value * 100) AS BIGINT) AS bin FROM events),
        |h AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
        |cum AS (SELECT bin,
        |    SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cm
        |  FROM h),
        |tot AS (SELECT count(*) AS n FROM b),
        |lo AS (SELECT min(bin) AS lo FROM cum, tot
        |       WHERE cm >= ceil(0.01 * n)),
        |hi AS (SELECT min(bin) AS hi FROM cum, tot
        |       WHERE cm >= ceil(0.99 * n))
        |SELECT event_id, value,
        |  CAST(greatest(least(bin, hi), lo) AS DOUBLE) / 100
        |    AS value_wins
        |FROM b, lo, hi""".stripMargin,
  )
}
