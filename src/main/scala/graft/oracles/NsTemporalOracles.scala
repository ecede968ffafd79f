package graft.oracles

/** DuckDB oracle SQL for temporal-join, session, and linkage queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsTemporalOracles {
  val sql: Map[String, String] = Map(
    // Same synthetic entities + typo variants; join within 4-char
    // blocks; levenshtein values and the <= 2 cut are integer-exact.
    "ns90_record_linkage" ->
      """WITH base AS (
        |  SELECT doc_id AS ent_id,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS name
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    substr(substr(md5(CAST(doc_id AS VARCHAR)), 1, 10),
        |      1, CAST(doc_id % 6 + 4 AS INT))
        |    || substr(substr(md5(CAST(doc_id AS VARCHAR)), 1, 10),
        |      CAST(doc_id % 6 + 6 AS INT), 10)
        |  FROM documents WHERE doc_id % 5 = 0),
        |blocked AS (
        |  SELECT ent_id, name, substr(name, 1, 4) AS blk FROM base)
        |SELECT a.ent_id AS id_a, b.ent_id AS id_b,
        |  a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM blocked a JOIN blocked b
        |  ON a.blk = b.blk AND a.ent_id < b.ent_id
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN is the as-of oracle; tolerance
    // is applied as a post-hoc CASE exactly like the engine nulls
    // out-of-tolerance matches. epoch_us(ts) == Spark unix_micros
    // (both truncate the fixture's nanos to micros). The fixture has
    // no (user_id, ts) ties among views (verified), so DuckDB's
    // unspecified tie pick can't diverge from the engine's
    // view_event_id tiebreak.
    "ns30_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS vts_us,
        |             event_id AS view_event_id, value AS view_value
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_event_id END AS view_event_id,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_value END AS view_value,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.vts_us END AS view_ts_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.vts_us""".stripMargin,
    // The chunked variant must reproduce the IDENTICAL as-of result —
    // same oracle SQL as ns30 (the whole point of the gate: the
    // skew-spreading rewrite is semantics-preserving).
    "ns53_asof_join_chunked" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS vts_us,
        |             event_id AS view_event_id, value AS view_value
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_event_id END AS view_event_id,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_value END AS view_value,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.vts_us END AS view_ts_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.vts_us""".stripMargin,
    // The range oracle is the plain inequality join the engine's
    // binned equi-join must exactly reproduce.
    "ns31_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(p.ts) AS p_ts_us,
        |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND epoch_us(c.ts)
        |     BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    // Overlap oracle = the plain inequality join the reporting-bin
    // plan must reproduce exactly once per pair.
    "ns32_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  e.event_id AS error_id,
        |  epoch_us(e.ts) - 900000000 AS e_start_us,
        |  epoch_us(e.ts) + 900000000 AS e_end_us
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND epoch_us(p.ts) - 3600000000 <= epoch_us(e.ts) + 900000000
        | AND epoch_us(e.ts) - 900000000 <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND e.event_type = 'error'""".stripMargin,
    // ns34's gaps-and-islands CTEs + an ORDER BY string_agg — the
    // transcript must reproduce the exact total event order.
    "ns81_session_transcripts" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             event_type FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us,
        |  COUNT(*) AS n_events,
        |  string_agg(event_type, '>' ORDER BY ts_us, event_id)
        |    AS transcript
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    // ns81's sessionization CTE, then exact transcript dedup.
    "ns100_bot_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             event_type FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked),
        |tr AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id)
        |      AS transcript
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT transcript, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM tr WHERE n_events >= 2
        |GROUP BY transcript HAVING COUNT(*) >= 2""".stripMargin,
    // Sessionize oracle: same lag/cumsum construction; the DECIMAL
    // path keeps the double sum order-independent across engines.
    "ns34_batch_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             value FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
  )
}
