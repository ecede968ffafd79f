package graft.oracles

/** DuckDB oracle SQL for snapshot-diff and corpus-versioning queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsSnapshotOracles {
  val sql: Map[String, String] = Map(
    // Snapshot-diff oracle: same synthetic snapshots, FULL OUTER
    // JOIN on id; the fp equality is null-unsafe in both engines
    // (NULL = NULL falls through to 'changed' in the CASE).
    "ns44_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp
        |           FROM documents WHERE doc_id % 10 <> 3),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |            ELSE text END) AS fp
        |      FROM documents WHERE doc_id % 10 <> 7)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.fp AS old_fp, n.fp AS new_fp
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // Order-independent md5-word sums per table, chr(1)-joined
    // fields; each field null-coalesced to the chr(0)||'null'
    // sentinel, mirroring corpusFingerprint (concat_ws skips nulls).
    "ns83_corpus_fingerprint" ->
      """SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(text, chr(0) || 'null')
        |    ), 1, 8)) AS BIGINT)) AS BIGINT)
        |    AS content_checksum
        |FROM documents
        |UNION ALL
        |SELECT 'events', COUNT(*),
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(event_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(event_type, chr(0) || 'null')
        |    ), 1, 8)) AS BIGINT)) AS BIGINT)
        |FROM events
        |UNION ALL
        |SELECT 'embeddings', COUNT(*),
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(vec_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(CAST(label AS VARCHAR),
        |      chr(0) || 'null')), 1, 8)) AS BIGINT))
        |    AS BIGINT)
        |FROM embeddings""".stripMargin,
  )
}
