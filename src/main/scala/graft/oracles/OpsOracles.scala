package graft.oracles

/** DuckDB oracle SQL for ingest, format, and table-maintenance ops (o- and j-prefixed keys, plus ns94 salted agg / ns96 z-order) — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object OpsOracles {
  val sql: Map[String, String] = Map(
    // CSV quarantine: PERMISSIVE nulls the unparsable FIELD and keeps
    // the rest, with the raw line in the corrupt column → quarantined
    // flag; both planted rows reproduced literally.
    "j04_csv_ingest" ->
      """SELECT doc_id, source, CAST(length(text) AS INTEGER) AS n_chars,
        |  FALSE AS quarantined
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), 'srcX', 12, TRUE
        |UNION ALL
        |SELECT 13, 'srcY', CAST(NULL AS INTEGER), TRUE""".stripMargin,
    "o01_nested_struct_projection" ->
      """SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status,
        | CAST(year(o_orderdate) AS BIGINT) AS order_year FROM orders""".stripMargin,
    "o03_json_path_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events",
    "o04_cast_chain" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_linenumber % 2 AS INT) AS BOOLEAN) AS is_even,
        | CAST(l_shipdate AS DATE) AS ship_date,
        | CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str
        |FROM lineitem""".stripMargin,
    "o06_timestamp_munging" ->
      """SELECT event_id,
        | strptime(strftime(ts, '%Y-%m-%d %H:%M') || ':00', '%Y-%m-%d %H:%M:%S') AS parsed_ts,
        | date_trunc('hour', ts) AS hour_ts
        |FROM events""".stripMargin,
    "o07_run_hr_rollup" ->
      """SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,
    "o08_key_normalization" ->
      """SELECT DISTINCT o_orderpriority,
        | lower(replace(o_orderpriority, ' ', '_')) AS norm_key
        |FROM orders""".stripMargin,
    "o09_json_repair_roundtrip" ->
      """SELECT doc_id, lang AS lang2, n_chars AS n2, TRUE AS flag,
        | source AS src2 FROM documents""".stripMargin,
    "o10_idempotent_partition_overwrite" ->
      """SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "o12_audit_columns" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(202608121100 AS BIGINT) AS run_hr,
        | TIMESTAMP '2026-08-12 11:00:00' AS created_at_ts
        |FROM nation""".stripMargin,
    "o13_literal_injection" ->
      """SELECT o_orderkey, o_totalprice,
        | CAST(202608121100 AS BIGINT) AS run_hr FROM orders""".stripMargin,
    // MERGE semantics as anti-join + union: delta wins on key match,
    // target rows survive otherwise, inserts are new keys.
    // Anti-join semantics of the takedown: survivors are rows NOT
    // matching any delete request; region 3 vanishes wholesale.
    "o16_targeted_delete" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation
        |WHERE NOT (n_regionkey = 1 AND n_nationkey < 10)
        |  AND n_regionkey <> 3""".stripMargin,
    "o15_keyed_merge" ->
      """WITH target AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation),
        |delta AS (
        |  SELECT n_nationkey, n_name || '_v2' AS n_name, n_regionkey
        |  FROM target WHERE n_regionkey = 1 AND n_nationkey < 10
        |  UNION ALL
        |  SELECT CAST(990 AS BIGINT), 'NEWLAND', CAST(1 AS BIGINT))
        |SELECT * FROM delta
        |UNION ALL
        |SELECT t.* FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM delta d
        |  WHERE d.n_nationkey = t.n_nationkey
        |    AND d.n_regionkey = t.n_regionkey)""".stripMargin,
    "o14_rename_map" ->
      """SELECT p_partkey AS part_key, p_name AS part_name, p_brand AS brand,
        | p_type AS part_type, p_size AS part_size,
        | p_retailprice AS retail_price FROM part""".stripMargin,
    // Snapshot commit layer (r15): the latest snapshot after
    // init → replace(region 1, names suffixed) → takedown(region 3),
    // re-derived from nation alone.
    "o17_snapshot_commit_read" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_v2'
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey <> 3""".stripMargin,
    // Time travel to version 2: replacement applied, takedown not.
    "o18_snapshot_time_travel" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_v2'
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,
    // Schema evolution at the snapshot layer: region 1 added the
    // column as INT, region 2 widened it to LONG (+10 values),
    // everyone else null-filled — the snapshot read must resolve
    // BIGINT (the Spark side leaves n_flag UNCAST, so a narrow or
    // thrown union fails this gate).
    "o21_snapshot_schema_evolution" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CASE WHEN n_regionkey = 1
        |    THEN CAST(n_nationkey % 2 AS BIGINT)
        |       WHEN n_regionkey = 2
        |    THEN CAST(n_nationkey % 2 + 10 AS BIGINT) END AS n_flag,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,
    // o22: o15's MERGE oracle through the commit layer (same
    // anti-join + union semantics, snapshot-isolated publish).
    "o22_commit_merge" ->
      """WITH target AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation),
        |delta AS (
        |  SELECT n_nationkey, n_name || '_v2' AS n_name, n_regionkey
        |  FROM target WHERE n_regionkey = 1 AND n_nationkey < 10
        |  UNION ALL
        |  SELECT CAST(990 AS BIGINT), 'NEWLAND', CAST(1 AS BIGINT))
        |SELECT * FROM delta
        |UNION ALL
        |SELECT t.* FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM delta d
        |  WHERE d.n_nationkey = t.n_nationkey
        |    AND d.n_regionkey = t.n_regionkey)""".stripMargin,
    // o24: rows of partitions rewritten AFTER version 1 in the
    // o17–o19 history — only region 1 (replaced at v2, names
    // suffixed); the removed region 3 has no rows (it rides the o25
    // feed), untouched regions never rescan.
    "o24_incremental_read" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  n_name || '_v2' AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey = 1""".stripMargin,
    // o25: the partition-grain change feed since version 1 —
    // region 1 replaced at v2, region 3 removed (no live version).
    "o25_change_feed" ->
      """SELECT * FROM (VALUES
        |  ('1', 'replaced', CAST(2 AS BIGINT)),
        |  ('3', 'removed', CAST(NULL AS BIGINT)))
        |AS m("partition", change, since_version)""".stripMargin,
    // o26: the ROW-grain feed since version 1 — every region-1 row
    // updated (postimage: suffixed name), every region-3 row deleted
    // (preimage: original name).
    "o26_row_change_feed" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  n_name || '_v2' AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  'update' AS change
        |FROM nation WHERE n_regionkey = 1
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT), n_name,
        |  CAST(n_regionkey AS BIGINT), 'delete'
        |FROM nation WHERE n_regionkey = 3""".stripMargin,
    // o27: stats-pruned snapshot read ≡ plain filtered content (the
    // files-touched pruning law is in ManifestSpec).
    "o27_stats_pruned_read" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer
        |WHERE c_nationkey IN (1, 2, 3)
        |  AND CAST(c_acctbal AS DOUBLE) > 9000.0""".stripMargin,
    // o28: manifest row/null counts — the log-derived snapshot
    // count(*) rides every row of the IS-NULL pruned read; both are
    // plain SQL over the same content.
    "o28_manifest_rowcount" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  (SELECT count(*) FROM customer) AS manifest_rows
        |FROM customer
        |WHERE CAST(c_acctbal AS DOUBLE) < 0""".stripMargin,
    // q17: SQL over snapshots — v2 (post-replacement, pre-takedown)
    // left-joined to the CURRENT snapshot: region 3 rows are no
    // longer live, everyone else is.
    "q17_snapshot_sql" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_v2'
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  n_regionkey <> 3 AS still_live
        |FROM nation""".stripMargin,
    // o23: the post-checkpoint snapshot — init, region-1 names
    // suffixed, region 3 taken down, region-0 names re-suffixed by
    // the commit published OVER the checkpointed log.
    "o23_manifest_checkpoint" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_v2'
        |       WHEN n_regionkey = 0 THEN n_name || '_v4'
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey <> 3""".stripMargin,
    // Vacuum removes exactly the planted crash-garbage key; the
    // ride-along count proves the referenced snapshot survived.
    "o20_manifest_vacuum" ->
      """SELECT 'crashed_run' AS removed_key,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation)
        |    AS n_rows_after""".stripMargin,
    // The final manifest's live entries: partition 1 owned by the
    // replacement commit since v2, partition 3 deleted, the rest
    // from init since v1 — the commit history as table literals.
    "o19_manifest_table" ->
      """SELECT * FROM (VALUES
        |  ('0', 'init', CAST(1 AS BIGINT)),
        |  ('1', 'fix_r1', CAST(2 AS BIGINT)),
        |  ('2', 'init', CAST(1 AS BIGINT)),
        |  ('4', 'init', CAST(1 AS BIGINT)))
        |AS m("partition", data_key, since_version)""".stripMargin,
    // Union schema with null-filled history + the partition column.
    "j05_schema_evolution" ->
      """SELECT doc_id, source, CAST(NULL AS INTEGER) AS n_chars,
        |  0 AS batch
        |FROM documents WHERE doc_id < 50
        |UNION ALL
        |SELECT doc_id, source, CAST(length(text) AS INTEGER), 1
        |FROM documents WHERE doc_id >= 50 AND doc_id < 100""".stripMargin,
    "j06_orc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate
        |FROM orders WHERE o_orderkey < 2000""".stripMargin,
    "j07_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "j08_compaction" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents""".stripMargin,
    "j02_variant_single_parse" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,
    "j03_variant_native" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,
    // The same 32 shift/mask terms, summed (bit positions disjoint,
    // so + ≡ OR); generated to match zValue(bits = 16) exactly.
    "ns96_zorder_key" -> {
      val terms = (0 until 16).flatMap(b => Seq(
        s"(((o_custkey >> $b) & 1) << ${2 * b})",
        s"(((o_orderkey >> $b) & 1) << ${2 * b + 1})"))
      s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         | CAST(o_custkey AS BIGINT) AS o_custkey,
         | CAST(${terms.mkString(" + ")} AS BIGINT) AS z
         |FROM orders""".stripMargin
    },
    // The salted rewrite must equal the aggregation it replaces.
    "ns94_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type""".stripMargin,
  )
}
