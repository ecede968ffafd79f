package graft.oracles

/** DuckDB oracle SQL for streaming restatements (s01-s12) — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object StreamingOracles {
  val sql: Map[String, String] = Map(
    // chr(10)-joined pipe table: byte-identical to Notify.renderMessage
    "s12_notification_render" ->
      """SELECT 'Regions loaded:' || chr(10) || 'r_name' || chr(10) ||
        |  string_agg(r_name, chr(10) ORDER BY r_name) AS message
        |FROM region""".stripMargin,
    // Drained stream-static broadcast join ≡ the batch join + s01's
    // window-close rule (append emits a window once the final
    // watermark passes its end).
    "s06_stream_static_join" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT)
        |  AS run_hr,
        | c.c_mktsegment, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |CROSS JOIN mx
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        | AND date_trunc('hour', ts) + INTERVAL 1 HOUR
        |     <= m - INTERVAL 30 MINUTE
        |GROUP BY 1, 2""".stripMargin,
    // Drained sketch store ≡ the whole-corpus CMS: merge-by-addition
    // is exact, so this is ns93's oracle VERBATIM.
    "s08_stream_sketch" ->
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
    // Drained streaming upsert ≡ latest-per-key over ALL events: the
    // within-batch window keeps the batch's max (ts, event_id) per
    // user and time-ordered batches make the last writer the global
    // argmax, so one window over the whole table is the exact oracle.
    // Drained takedown stream = ONE global anti-join over every
    // request batch; nation 3's customers vanish wholesale.
    // Drained streaming extraction ≡ the batch extractor over all ok
    // pages: ns105's fixture CTEs, ok subset, same predicted text.
    "s10_stream_html_extract" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, ws,
        |    unnest(range(CAST(ceil(len(ws) / 12.0) AS BIGINT))) AS k
        |  FROM words),
        |ct AS (
        |  SELECT doc_id, k,
        |    array_to_string(list_slice(ws, k*12+1, k*12+12), ' ') AS ctext
        |  FROM chunks),
        |agg AS (
        |  SELECT doc_id,
        |    COUNT(*) FILTER (WHERE length(ctext) > 0) AS nc,
        |    COUNT(*) FILTER (WHERE length(ctext) >= 30) AS nk,
        |    string_agg(ctext, chr(10) ORDER BY k)
        |      FILTER (WHERE length(ctext) >= 30) AS kept
        |  FROM ct GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(a.nc + 5 AS BIGINT) AS n_blocks,
        |  CAST(a.nk + 1 AS BIGINT) AS n_kept,
        |  CASE WHEN a.kept IS NULL THEN ''
        |       ELSE a.kept || chr(10) END
        |    || 'Q&A <tags> and entities stay readable after ' ||
        |    'decoding in doc ' || CAST(d.doc_id AS VARCHAR)
        |    AS main_text
        |FROM documents d JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 17 <> 3""".stripMargin,
    // s10's prediction further restricted to docs whose WARC record
    // parses (the bad-http plant): raw crawl stream → clean text.
    // Every defect class (single/double mojibake, NFD, clean)
    // normalizes back to text||tailPre, so the drained streaming
    // sink's oracle is one closed-form projection — the chr() chain
    // rebuilds the SAME clean tail the Spark side targets.
    // ns154's closed-form prediction verbatim — the drained stream
    // sink must equal the batch scrub on the same planted corpus.
    "s14_stream_token_scrub" ->
      """WITH att AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0
        |      THEN text || ' <|im_start|>user<|im_end|><|endoftext|>ok'
        |      WHEN doc_id % 9 = 1
        |      THEN text || ' <|endof<|im_start|>text|>'
        |      ELSE text END AS attacked,
        |    CASE WHEN doc_id % 9 = 0 THEN text || ' userok'
        |      WHEN doc_id % 9 = 1 THEN text || ' '
        |      ELSE text END AS clean
        |  FROM documents)
        |SELECT doc_id, clean AS clean_text,
        |  CAST(length(attacked) - length(clean) AS BIGINT) AS n_stripped
        |FROM att""".stripMargin,
    "s13_stream_normalize" ->
      s"""SELECT doc_id, text || ${NsTextOracles.mojiCleanChr}
         |  AS norm_text
         |FROM documents""".stripMargin,
    "s11_stream_warc_extract" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, ws,
        |    unnest(range(CAST(ceil(len(ws) / 12.0) AS BIGINT))) AS k
        |  FROM words),
        |ct AS (
        |  SELECT doc_id, k,
        |    array_to_string(list_slice(ws, k*12+1, k*12+12), ' ') AS ctext
        |  FROM chunks),
        |agg AS (
        |  SELECT doc_id,
        |    COUNT(*) FILTER (WHERE length(ctext) > 0) AS nc,
        |    COUNT(*) FILTER (WHERE length(ctext) >= 30) AS nk,
        |    string_agg(ctext, chr(10) ORDER BY k)
        |      FILTER (WHERE length(ctext) >= 30) AS kept
        |  FROM ct GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(a.nc + 5 AS BIGINT) AS n_blocks,
        |  CAST(a.nk + 1 AS BIGINT) AS n_kept,
        |  CASE WHEN a.kept IS NULL THEN ''
        |       ELSE a.kept || chr(10) END
        |    || 'Q&A <tags> and entities stay readable after ' ||
        |    'decoding in doc ' || CAST(d.doc_id AS VARCHAR)
        |    AS main_text
        |FROM documents d JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 17 <> 3 AND d.doc_id % 19 <> 7""".stripMargin,
    "s09_stream_takedown" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer
        |WHERE NOT (c_nationkey = 1 AND c_custkey < 40)
        |  AND c_nationkey <> 3""".stripMargin,
    "s07_stream_upsert" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    value, user_id % 8 AS part,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts_us, event_type, value, part
        |FROM ranked WHERE rn = 1""".stripMargin,
    // Drained stream-stream inner join ≡ the batch range join (ns31's
    // SQL) on the same bounded window — see the s05 registration note.
    "s05_stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(p.ts) AS p_ts_us,
        |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND epoch_us(c.ts)
        |     BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND p.ts >= TIMESTAMP '2024-01-20 00:00:00'
        |  AND c.ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "s04_stream_curation" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars, len(toks) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS sw,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |keep AS (
        |  SELECT doc_id FROM stats
        |  WHERE n_chars BETWEEN 50 AND 100000
        |    AND n_words BETWEEN 10 AND 50000
        |    AND awl BETWEEN 2.0 AND 12.0 AND punct <= 0.2 AND sw >= 0.01
        |    AND en >= de AND en >= fr AND en >= es AND en > 0),
        |pii AS (
        |  SELECT b.doc_id,
        |    b.text || ' contact user' || CAST(b.doc_id AS VARCHAR)
        |      || '@mail.example.com call +1-555-'
        |      || lpad(CAST(b.doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST((b.doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(b.doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((b.doc_id * 3) % 256 AS VARCHAR)
        |      || ' card 4111-1111-1111-'
        |      || lpad(CAST(b.doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ssn ' || lpad(CAST(b.doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((b.doc_id * 3) % 100 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST((b.doc_id * 9) % 10000 AS VARCHAR), 4, '0') AS t0
        |  FROM base b JOIN keep k ON b.doc_id = k.doc_id),
        |s1 AS (SELECT doc_id,
        |  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM pii),
        |s2 AS (SELECT doc_id, n_email,
        |  len(regexp_extract_all(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |  regexp_replace(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_phone,
        |  len(regexp_extract_all(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}')) AS n_cc,
        |  regexp_replace(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CC>', 'g') AS t3
        |  FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_phone, n_cc,
        |  len(regexp_extract_all(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn,
        |  regexp_replace(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t4
        |  FROM s3)
        |SELECT doc_id,
        |  CAST(n_email AS BIGINT) AS n_email,
        |  CAST(n_phone AS BIGINT) AS n_phone,
        |  CAST(n_cc AS BIGINT) AS n_cc,
        |  CAST(n_ssn AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |  regexp_replace(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g') AS redacted_text
        |FROM s4""".stripMargin,
    // Window close rule: append mode emits a 1-hour window once the
    // final watermark (max event time − 30 min) passes window end =
    // date_trunc(hour) + 1 hour. The fixture's max ts never lands on
    // a half-hour boundary, so <= vs < is immaterial.
    "s01_streaming_rollup" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events, mx
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        | AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 30 MINUTE
        |GROUP BY 1, 2""".stripMargin,
    // Emission rules (see the s02 query comment): a session is visible
    // iff it is not its user's last session (closed in-batch by the
    // next event) OR its timeout (end + gap) is strictly before the
    // final watermark (max ts − 1 h). Fixture timestamps are
    // micro-exact (ns remainder 0), so no precision slack is needed.
    // DISTINCT states the dedup semantics explicitly: the fixture's
    // event_ids are unique within one file copy, but the oracle must
    // not silently rely on that.
    "s03_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "s02_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
        |mx AS (SELECT max(ts) AS m FROM ev),
        |marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, min(ts) AS session_start,
        |    max(ts) AS session_end, COUNT(*) AS n_events,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS total_value
        |  FROM sess GROUP BY user_id, sid),
        |flagged AS (
        |  SELECT *, sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        |  FROM agg)
        |SELECT user_id, session_start, session_end, n_events, total_value
        |FROM flagged, mx
        |WHERE NOT is_last OR session_end + INTERVAL 12 HOUR < m - INTERVAL 1 HOUR""".stripMargin,
    // s23 (r15): the streaming audio near-dup bank's matches,
    // re-derived end to end — fingerprint words from the planting
    // md5-activity formula (amplitude-invariant by construction),
    // 8×8-bit band chunks, and the batch-1-vs-batch-0 candidate
    // equi-join. Signature bits stop at index 62, so the word is
    // non-negative and DuckDB's arithmetic >> equals the unsigned
    // banding shift.
    // s24 (r15): the drained manifest-sink snapshot — the plain
    // projection with the even/odd batch split as a column.
    "s24_stream_manifest_sink" ->
      """SELECT doc_id, source,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
        |    AS batch_id
        |FROM documents""".stripMargin,
    // s25 (r16): table maintenance must be CONTENT-INVISIBLE — the
    // checkpointed + compacted + vacuumed table reads exactly like
    // the never-maintained s24 table.
    "s25_stream_table_maintenance" ->
      """SELECT doc_id, source,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
        |    AS batch_id
        |FROM documents""".stripMargin,
    "s23_stream_audio_bank" ->
      """WITH ids AS (SELECT unnest(range(0, 40)) AS k),
        |bits AS (
        |  SELECT i.k, t.f, u.j,
        |    substr(md5(CAST(i.k AS VARCHAR) || ':' ||
        |      CAST(t.f AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)),
        |      1, 1) IN ('0','1','2','3','4','5') AS active
        |  FROM ids i,
        |    (SELECT unnest(range(0, 8)) AS f) t,
        |    (SELECT unnest(range(1, 8)) AS j) u),
        |sig AS (
        |  SELECT k,
        |    CAST(coalesce(SUM(CASE WHEN active
        |      THEN CAST(1 AS BIGINT) << (f * 8 + j - 1)
        |      ELSE 0 END), 0) AS BIGINT) AS s
        |  FROM bits GROUP BY k),
        |bands AS (
        |  SELECT k, b, (s >> (b * 8)) & 255 AS chunk
        |  FROM sig, (SELECT unnest(range(0, 8)) AS b) tb)
        |SELECT DISTINCT CAST(n.k + 1000 AS BIGINT) AS new_id,
        |  CAST(o.k AS BIGINT) AS stored_id
        |FROM bands n JOIN bands o
        |  ON n.b = o.b AND n.chunk = o.chunk""".stripMargin,
  )
}
