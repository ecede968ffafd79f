package graft.oracles

/** DuckDB oracle SQL for the WARC container-ingest family (ns120,
  * [[graft.ns.Warc]]). Pure data, same conventions as the other
  * oracle objects: the fixture is closed-form, so the oracle
  * re-derives the ENTIRE parse output — record indexes, declared
  * lengths, quarantine statuses, and response bodies byte-for-byte —
  * from the documents table, without parsing WARC or HTML. The page
  * formula CTEs mirror [[graft.ns.Html.buildHtmlFixture]] exactly
  * (fixture text is ASCII, so SQL char lengths equal the parser's
  * byte lengths).
  */
object NsWarcOracles {
  /** ns120's prediction, shared verbatim by ns125: gzip is a
    * transparent layer, so the gzip fixture must parse to the
    * IDENTICAL record stream. */
  private val warcParseSql: String =
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
        |    replace(replace(replace(
        |      array_to_string(list_slice(ws, k*12+1, k*12+12), ' '),
        |      '&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS ctext
        |  FROM chunks),
        |paras AS (
        |  SELECT doc_id,
        |    string_agg('<p>' || ctext || '</p>', chr(10) ORDER BY k)
        |      AS paras
        |  FROM ct GROUP BY doc_id),
        |pages AS (
        |  SELECT d.doc_id,
        |    '<html><head><title>Doc ' || CAST(d.doc_id AS VARCHAR)
        |    || '</title>' || chr(10)
        |    || '<style>body { font: 14px serif; }</style>' || chr(10)
        |    || CASE WHEN d.doc_id % 17 = 3
        |         THEN '<script>var broken = 1;' || chr(10)
        |         ELSE '<script>var t = "<p>this paragraph lives inside a script tag and must never survive extraction</p>";</script>' || chr(10) END
        |    || '</head>' || chr(10) || '<body>' || chr(10)
        |    || '<nav><a href="/">Home</a> | <a href="/d/'
        |    || CAST(d.doc_id AS VARCHAR) || '">Self</a></nav>' || chr(10)
        |    || '<div id="main">' || chr(10)
        |    || p.paras || chr(10)
        |    || '<p>Q&amp;A &lt;tags&gt; and entities stay readable after decoding in doc '
        |    || CAST(d.doc_id AS VARCHAR) || '</p>' || chr(10)
        |    || '</div>' || chr(10)
        |    || '<p class="related"><a href="/r/1">one</a> <a href="/r/2">two</a> <a href="/r/3">three</a> <a href="/r/4">four</a> related reading from around the network</p>' || chr(10)
        |    || '<footer>Copyright 2026 Example Corp</footer>' || chr(10)
        |    || '</body></html>' AS html
        |  FROM documents d JOIN paras p USING (doc_id)),
        |recs AS (
        |  SELECT doc_id, CAST(doc_id // 8 AS BIGINT) AS container_id,
        |    CAST(doc_id % 8 AS BIGINT) AS pos,
        |    CAST(doc_id AS VARCHAR) AS ids, html
        |  FROM pages)
        |SELECT DISTINCT container_id, CAST(0 AS BIGINT) AS rec_index,
        |  'warcinfo' AS warc_type, CAST(NULL AS VARCHAR) AS target_uri,
        |  CAST(30 AS BIGINT) AS content_length, 'ok' AS status,
        |  CAST(NULL AS BIGINT) AS http_status,
        |  CAST(NULL AS VARCHAR) AS http_content_type,
        |  CAST(NULL AS VARCHAR) AS body
        |FROM recs
        |UNION ALL
        |-- request payload: 'GET /d/<id> HTTP/1.1'(16+len) CRLF
        |-- 'Host: crawl.example.com'(23) CRLF CRLF = 45 + len(id)
        |SELECT container_id, 1 + 2*pos, 'request',
        |  'http://crawl.example.com/d/' || ids,
        |  CAST(45 + length(ids) AS BIGINT), 'ok',
        |  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS VARCHAR)
        |FROM recs
        |UNION ALL
        |-- response payload head: 'HTTP/1.1 200 OK' CRLF
        |-- 'Content-Type: text/html' CRLF [CRLF] = 44 ok / 42 bad
        |SELECT container_id, 2 + 2*pos, 'response',
        |  'http://crawl.example.com/d/' || ids,
        |  CAST(CASE WHEN doc_id % 19 = 7 THEN 42 ELSE 44 END
        |    + length(html) AS BIGINT),
        |  CASE WHEN doc_id % 19 = 7 THEN 'bad_http' ELSE 'ok' END,
        |  CASE WHEN doc_id % 19 = 7 THEN CAST(NULL AS BIGINT)
        |    ELSE CAST(200 AS BIGINT) END,
        |  CASE WHEN doc_id % 19 = 7 THEN CAST(NULL AS VARCHAR)
        |    ELSE 'text/html' END,
        |  CASE WHEN doc_id % 19 = 7 THEN CAST(NULL AS VARCHAR)
        |    ELSE html END
        |FROM recs""".stripMargin

  val sql: Map[String, String] = Map(
    "ns120_warc_parse" -> warcParseSql,
    "ns125_warc_gzip" -> warcParseSql)
}
