package graft.oracles

/** DuckDB oracle SQL for dedup, contamination, and cluster queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsDedupOracles {
  /** ns108/ns193 shared edge derivation: p03's replay corpus, md5
    * fingerprint groups, min-id survivors, both sides' sources. */
  private val provenanceEdgeSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, source, text FROM documents
      |  WHERE doc_id % 10 = 0),
      |base AS (
      |  SELECT doc_id, source,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM corpus),
      |grp AS (
      |  SELECT fp, min(doc_id) AS kept_id FROM base GROUP BY fp),
      |k AS (
      |  SELECT g.fp, g.kept_id, b.source AS kept_source
      |  FROM grp g JOIN base b ON b.doc_id = g.kept_id)
      |SELECT b.doc_id AS dropped_id, k.kept_id, b.fp AS fingerprint,
      |  b.source AS dropped_source, k.kept_source
      |FROM base b JOIN k ON b.fp = k.fp
      |WHERE b.doc_id <> k.kept_id""".stripMargin

  val sql: Map[String, String] = Map(
    "ns87_phrase_blocklist" ->
      """WITH built AS (
        |  SELECT doc_id, text ||
        |    CASE doc_id % 4 WHEN 0 THEN ' blk:alphabet'
        |      WHEN 1 THEN ' blk:beta'
        |      WHEN 2 THEN ' say beta twice beta'
        |      ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, p AS pattern
        |FROM built, unnest(['blk:alpha','blk:alphabet','lphabet',
        |  'blk:beta','beta']) t2(p)
        |WHERE contains(t, p)""".stripMargin,
    // Funnel over the planted blocklist tails — pattern-agnostic
    // contains per phrase (the ns87 convention), aggregated per
    // source; the never-present phrase must contribute nothing.
    "ns161_blocklist_funnel" ->
      """WITH built AS (
        |  SELECT doc_id, source, text
        |    || CASE WHEN doc_id % 13 = 0
        |      THEN ' blk:spam prize claim' ELSE '' END
        |    || CASE WHEN doc_id % 26 = 0
        |      THEN ' blk:scam wire the fee' ELSE '' END AS t
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    (CASE WHEN contains(t, 'blk:spam') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(t, 'blk:scam') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(t, 'blk:never-present')
        |       THEN 1 ELSE 0 END) AS np
        |  FROM built)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_blocked,
        |  CAST(sum(np) AS BIGINT) AS n_phrase_hits,
        |  CAST(count(*) - sum(CASE WHEN np > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept
        |FROM built JOIN hits USING (doc_id)
        |GROUP BY source""".stripMargin,
    // Header-bounded license mix: pattern-agnostic contains over the
    // SAME 64-char substring, left-joined so no-hit docs count under
    // 'none'; the %6==3 tail plant only counts when the doc is short
    // enough that the tail falls inside the header.
    "ns170_license_scan" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CASE doc_id % 6
        |      WHEN 0 THEN '// licensed under the mit license' || chr(10)
        |      WHEN 1 THEN '# apache license 2.0' || chr(10)
        |      WHEN 2 THEN '/* gnu general public license v3 */' || chr(10)
        |      ELSE '' END
        |    || text
        |    || CASE WHEN doc_id % 6 = 3 THEN ' mit license'
        |       ELSE '' END AS t
        |  FROM documents),
        |h AS (SELECT doc_id, source, substr(t, 1, 64) AS head FROM b),
        |hits AS (
        |  SELECT doc_id, m AS license
        |  FROM h, unnest(['mit license', 'apache license',
        |    'general public license']) u(m)
        |  WHERE contains(head, m))
        |SELECT h.source, coalesce(hits.license, 'none') AS license,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM h LEFT JOIN hits ON h.doc_id = hits.doc_id
        |GROUP BY 1, 2""".stripMargin,
    // Same planted markers; hit rows only.
    "ns86_canary_scan" ->
      """WITH built AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' canary:' ||
        |      CASE WHEN doc_id % 3 = 0 THEN 'aa11'
        |           WHEN doc_id % 3 = 1 THEN 'bb22'
        |           ELSE 'cc33' END
        |    ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, c AS canary
        |FROM built, unnest(['canary:aa11','canary:bb22',
        |  'canary:cc33']) t2(c)
        |WHERE contains(t, c)""".stripMargin,
    // The duplicate->survivor mapping: min-id survivor per md5
    // fingerprint group; both sides' sources attached.
    "ns108_dedup_provenance" -> provenanceEdgeSql,
    // Cross-source duplication matrix (r14): the same edge CTEs,
    // one GROUP BY source pair — duplicate volume plus distinct
    // survivor groups per (kept_source, dropped_source).
    "ns193_source_dup_matrix" ->
      s"""WITH e AS ($provenanceEdgeSql)
        |SELECT kept_source, dropped_source,
        |  CAST(count(*) AS BIGINT) AS n_dups,
        |  CAST(count(DISTINCT kept_id) AS BIGINT) AS n_groups
        |FROM e GROUP BY 1, 2""".stripMargin,
    // Independent closure: tombstones = every member of a fingerprint
    // GROUP containing a requested id (the engine computes the same
    // set through the edge table — a broken edge table fails here).
    // ns22's gram CTEs keyed by source; the contamination decision is
    // the same integer cross-multiply.
    "ns115_contamination_matrix" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |eg AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
        |  WHERE doc_id < 50),
        |egn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |        FROM eg GROUP BY 1),
        |ne AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
        |       FROM documents WHERE doc_id < 50),
        |tg AS (
        |  SELECT DISTINCT source,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
        |  WHERE doc_id >= 50),
        |hits AS (
        |  SELECT tg.source, eg.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_hit
        |  FROM eg JOIN tg USING (gram) GROUP BY 1, 2)
        |SELECT h.source, ne.n AS n_eval_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_contaminated
        |FROM hits h JOIN egn USING (doc_id), ne
        |WHERE h.n_hit * 10 >= egn.n_grams * 3
        |GROUP BY 1, 2""".stripMargin,
    "ns111_takedown_propagation" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |base AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM corpus),
        |req AS (
        |  SELECT doc_id FROM base
        |  WHERE doc_id < 100000 AND doc_id % 25 = 0),
        |gf AS (
        |  SELECT DISTINCT b.fp FROM base b
        |  JOIN req r ON b.doc_id = r.doc_id)
        |SELECT b.doc_id,
        |  CASE WHEN r.doc_id IS NOT NULL THEN 'requested'
        |       ELSE 'propagated' END AS reason
        |FROM base b
        |JOIN gf ON b.fp = gf.fp
        |LEFT JOIN req r ON r.doc_id = b.doc_id""".stripMargin,
    // ns126: the ns37 recursive-closure CTEs (independent clustering)
    // + the ns111 fingerprint closure, unioned with reason ranking —
    // the gated composition law for the near-dup takedown sweep.
    "ns126_takedown_near_dup" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
        |assign AS (
        |  SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        |base AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |req AS (SELECT doc_id FROM documents WHERE doc_id % 25 = 0),
        |gf AS (SELECT DISTINCT b.fp FROM base b
        |  JOIN req r ON b.doc_id = r.doc_id),
        |ex AS (SELECT b.doc_id FROM base b JOIN gf USING (fp)),
        |rc AS (SELECT DISTINCT a.cluster_id FROM assign a
        |  JOIN req r ON a.doc_id = r.doc_id),
        |nr AS (SELECT a.doc_id FROM assign a JOIN rc USING (cluster_id)),
        |agg AS (
        |  SELECT doc_id, min(src) AS src FROM (
        |    SELECT doc_id, 1 AS src FROM ex
        |    UNION ALL SELECT doc_id, 2 FROM nr)
        |  GROUP BY doc_id)
        |SELECT a.doc_id,
        |  CASE WHEN r.doc_id IS NOT NULL THEN 'requested'
        |       WHEN a.src = 1 THEN 'exact_dup'
        |       ELSE 'near_dup' END AS reason
        |FROM agg a LEFT JOIN req r ON r.doc_id = a.doc_id""".stripMargin,
    "ns01_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        | min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "ns02_ngram_jaccard_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) AS jaccard
        |FROM pairs p
        | JOIN sizes sa ON p.id_a = sa.doc_id
        | JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5""".stripMargin,
    // The full SimHash pipeline in SQL: TF-weighted per-bit votes
    // from md5 token hashes (bits CTE, not 60 columns), packed
    // 60-bit signature, 10×6-bit band collisions, bit_count(xor)
    // Hamming verify.
    "ns04b_simhash_exact" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
        |  FROM toks),
        |votes AS (
        |  SELECT doc_id, b.bit,
        |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hashed, UNNEST(range(60)) AS b(bit)
        |  GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
        |      ELSE 0 END) AS simhash
        |  FROM votes GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |    (simhash >> (b.band * 6)) & 63 AS chunk
        |  FROM sig, UNNEST(range(10)) AS b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |    AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
        |FROM cand WHERE hamming <= 7""".stripMargin,
    // The full LSH pipeline in SQL: 16 md5 min-hashes, 8 two-row
    // bands (chunk = decimal-concat of the pair, injective), band
    // collisions as candidates, exact distinct-gram Jaccard verify.
    // The drained streaming signature bank must equal the ns03b
    // banding CTEs run ONCE over the whole corpus — a signature
    // depends only on its document, so the store is batching-
    // invariant; chunk is the canonical "h0:h1" decimal string the
    // bank persists.
    "s18_stream_minhash_bank" -> {
      val minCols = (0 until 16).map(j =>
        s"    min(CAST(('0x' || substr(md5(g || ':mh$j'), 1, 15)) " +
          s"AS BIGINT)) AS mh$j").mkString(",\n")
      val branches = (0 until 8).map(b =>
        s"WHEN $b THEN CAST(mh${2 * b} AS VARCHAR) || ':' || " +
          s"CAST(mh${2 * b + 1} AS VARCHAR)").mkString(" ")
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
         |sig AS (
         |  SELECT doc_id,
         |$minCols
         |  FROM grams GROUP BY 1)
         |SELECT doc_id, CAST(b.band AS BIGINT) AS band,
         |  CASE b.band $branches END AS chunk
         |FROM sig, UNNEST(range(8)) AS b(band)""".stripMargin
    },
    "ns03b_minhash_exact" -> {
      val minCols = (0 until 16).map(j =>
        s"    min(CAST(('0x' || substr(md5(g || ':mh$j'), 1, 15)) " +
          s"AS BIGINT)) AS mh$j").mkString(",\n")
      val branches = (0 until 8).map(b =>
        s"WHEN $b THEN CAST(mh${2 * b} AS VARCHAR) || ':' || " +
          s"CAST(mh${2 * b + 1} AS VARCHAR)").mkString(" ")
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
         |sig AS (
         |  SELECT doc_id,
         |$minCols
         |  FROM grams GROUP BY 1),
         |banded AS (
         |  SELECT doc_id, b.band,
         |    CASE b.band $branches END AS chunk
         |  FROM sig, UNNEST(range(8)) AS b(band)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk
         |    AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |common AS (
         |  SELECT c.id_a, c.id_b, count(*) AS cm
         |  FROM cand c
         |    JOIN grams ga ON ga.doc_id = c.id_a
         |    JOIN grams gb ON gb.doc_id = c.id_b AND ga.g = gb.g
         |  GROUP BY 1, 2)
         |SELECT c.id_a, c.id_b,
         |  1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) AS jaccard_dist
         |FROM common c
         |  JOIN sizes sa ON c.id_a = sa.doc_id
         |  JOIN sizes sb ON c.id_b = sb.doc_id
         |WHERE 1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) <= 0.5""".stripMargin
    },
    // Conversation near-dup md5 twin (r14): the ns03b banding +
    // exact-Jaccard CTEs over RENDERED TRANSCRIPTS rebuilt from the
    // chat fixture's closed forms (never parsing JSON — the ns186
    // convention), with the edited re-upload twins planted
    // (id+3000000, 'hi ' prepended to the user turn).
    "ns194b_conversation_near_dup_exact" -> {
      val minCols = (0 until 16).map(j =>
        s"    min(CAST(('0x' || substr(md5(g || ':mh$j'), 1, 15)) " +
          s"AS BIGINT)) AS mh$j").mkString(",\n")
      val branches = (0 until 8).map(b =>
        s"WHEN $b THEN CAST(mh${2 * b} AS VARCHAR) || ':' || " +
          s"CAST(mh${2 * b + 1} AS VARCHAR)").mkString(" ")
      s"""WITH c AS (
         |  SELECT doc_id,
         |    regexp_replace(array_to_string(
         |      string_split(regexp_replace(lower(trim(text)),
         |        '\\s+', ' ', 'g'), ' ')[1:3], ' '),
         |      '[^a-z0-9 ]', '', 'g') AS content
         |  FROM documents WHERE doc_id % 17 <> 0),
         |tr AS (
         |  SELECT doc_id AS conversation_id,
         |    '<|user|> ' || content || ' <|end|> <|assistant|> ok '
         |      || doc_id || ' <|end|>' AS tx
         |  FROM c
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |    '<|user|> hi ' || content || ' <|end|> <|assistant|> ok '
         |      || doc_id || ' <|end|>'
         |  FROM c),
         |docs AS (
         |  SELECT conversation_id AS doc_id,
         |    string_split(regexp_replace(lower(trim(tx)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM tr),
         |grams AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
         |sig AS (
         |  SELECT doc_id,
         |$minCols
         |  FROM grams GROUP BY 1),
         |banded AS (
         |  SELECT doc_id, b.band,
         |    CASE b.band $branches END AS chunk
         |  FROM sig, UNNEST(range(8)) AS b(band)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk
         |    AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |common AS (
         |  SELECT c2.id_a, c2.id_b, count(*) AS cm
         |  FROM cand c2
         |    JOIN grams ga ON ga.doc_id = c2.id_a
         |    JOIN grams gb ON gb.doc_id = c2.id_b AND ga.g = gb.g
         |  GROUP BY 1, 2)
         |SELECT c3.id_a, c3.id_b,
         |  1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) AS jaccard_dist
         |FROM common c3
         |  JOIN sizes sa ON c3.id_a = sa.doc_id
         |  JOIN sizes sb ON c3.id_b = sb.doc_id
         |WHERE 1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) <= 0.5""".stripMargin
    },
    "ns02b_ngram_jaccard_capped" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) AS jaccard
        |FROM pairs p
        | JOIN sizes sa ON p.id_a = sa.doc_id
        | JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5""".stripMargin,
    // ns02b's capped gram machinery, intersection counted once per
    // unordered pair, then BOTH directed containments emitted —
    // C(A→B) = common/|A| — and filtered at 0.6.
    // ns150's CTEs over eval ∪ planted whole-quote train docs, kept
    // where the eval side is contained in the train side.
    "ns178_contamination_attribution" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    'commentary begins here. ' || text
        |      || ' attribution footer ' || doc_id
        |  FROM documents WHERE doc_id < 50 AND doc_id % 3 = 1),
        |docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM corpus),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 8),
        |grams AS (SELECT grams0.doc_id, grams0.g
        |  FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |joined AS (
        |  SELECT p.id_a, p.id_b, p.common, sa.sz AS sz_a, sb.sz AS sz_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id),
        |directed AS (
        |  SELECT id_a AS contained_id, id_b AS container_id, common,
        |    sz_a AS sz_contained FROM joined
        |  UNION ALL
        |  SELECT id_b AS contained_id, id_a AS container_id, common,
        |    sz_b AS sz_contained FROM joined)
        |SELECT contained_id, container_id, common, sz_contained,
        |  CAST(common AS DOUBLE) / CAST(sz_contained AS DOUBLE)
        |    AS containment
        |FROM directed
        |WHERE CAST(common AS DOUBLE) / CAST(sz_contained AS DOUBLE)
        |    >= 0.5
        |  AND contained_id < 50 AND container_id >= 50""".stripMargin,
    "ns150_containment_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |joined AS (
        |  SELECT p.id_a, p.id_b, p.common, sa.sz AS sz_a, sb.sz AS sz_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id),
        |directed AS (
        |  SELECT id_a AS contained_id, id_b AS container_id, common,
        |    sz_a AS sz_contained FROM joined
        |  UNION ALL
        |  SELECT id_b AS contained_id, id_a AS container_id, common,
        |    sz_b AS sz_contained FROM joined)
        |SELECT contained_id, container_id, common, sz_contained,
        |  CAST(common AS DOUBLE) / CAST(sz_contained AS DOUBLE)
        |    AS containment
        |FROM directed
        |WHERE CAST(common AS DOUBLE) / CAST(sz_contained AS DOUBLE)
        |  >= 0.6""".stripMargin,
    "ns25_incremental_dedup" ->
      """WITH fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |known AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id < 250),
        |fresh AS (
        |  SELECT f.fingerprint, f.doc_id FROM fps f
        |  WHERE f.doc_id >= 200
        |    -- NOT EXISTS, not NOT IN: a NULL fingerprint in the known
        |    -- store would make NOT IN return zero rows while Spark's
        |    -- left_anti keeps null-keyed rows
        |    AND NOT EXISTS (SELECT 1 FROM known k
        |                    WHERE k.fingerprint = f.fingerprint))
        |SELECT fingerprint, min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS dup_count
        |FROM fresh GROUP BY 1""".stripMargin,
    // Bloom prefilter preserves exactness — IDENTICAL oracle to ns25.
    "ns55_bloom_incremental_dedup" ->
      """WITH fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |known AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id < 250),
        |fresh AS (
        |  SELECT f.fingerprint, f.doc_id FROM fps f
        |  WHERE f.doc_id >= 200
        |    AND NOT EXISTS (SELECT 1 FROM known k
        |                    WHERE k.fingerprint = f.fingerprint))
        |SELECT fingerprint, min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS dup_count
        |FROM fresh GROUP BY 1""".stripMargin,
    // Replay-salted fingerprint groups, then the degree histogram —
    // two plain aggregations.
    "ns176_dup_degree_histogram" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |g AS (
        |  SELECT md5(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g')) AS fp, count(*) AS deg
        |  FROM corpus GROUP BY fp)
        |SELECT CAST(deg AS BIGINT) AS degree,
        |  CAST(count(*) AS BIGINT) AS n_groups
        |FROM g GROUP BY deg""".stripMargin,
    // Both detector legs re-derived independently and union'd: the
    // trigram containment flag from ns22's CTEs, the BM25 top-1 from
    // ns164's recipe restricted to the train corpus (df/dl/stats over
    // doc_id >= 50 only, 8-token eval-prefix queries, posting cap,
    // k = 1, absolute nano threshold).
    "ns173_contamination_report" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |traing AS (
        |  SELECT DISTINCT g FROM grams WHERE doc_id >= 50),
        |nghits AS (
        |  SELECT e.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END) AS n_hit
        |  FROM grams e LEFT JOIN traing tr ON e.g = tr.g
        |  WHERE e.doc_id < 50
        |  GROUP BY e.doc_id),
        |tok AS (
        |  SELECT doc_id, unnest(list_filter(w, x -> len(x) > 0)) AS term
        |  FROM docs WHERE doc_id >= 50),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT count(DISTINCT doc_id) AS n, count(*) AS t
        |  FROM tok),
        |qt AS (SELECT DISTINCT doc_id AS q_id, unnest(
        |    list_filter(w[1:8], x -> len(x) > 0)) AS term
        |  FROM docs WHERE doc_id < 50),
        |dfq AS (SELECT term, count(*) AS dfreq FROM tf
        |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
        |idf AS (SELECT term,
        |    CAST(floor(ln((CAST(n AS DOUBLE) - dfreq + 0.5)
        |      / (CAST(dfreq AS DOUBLE) + 0.5) + 1.0) * 1e9) AS BIGINT)
        |      AS idf_nano
        |  FROM dfq, st),
        |pp AS (SELECT term, doc_id, tf, dl, idf_nano,
        |    ROW_NUMBER() OVER (PARTITION BY term
        |      ORDER BY tf DESC, dl ASC, doc_id) AS prn
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)),
        |sc AS (SELECT qt.q_id, pp.doc_id,
        |    CAST(floor(CAST(idf_nano AS DOUBLE)
        |      * (CAST(tf AS DOUBLE) * 2.2)
        |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |        * (CAST(dl AS DOUBLE)
        |          / (CAST(t AS DOUBLE) / CAST(n AS DOUBLE))))))
        |      AS BIGINT) AS s
        |  FROM pp JOIN qt USING (term), st
        |  WHERE prn <= 200),
        |agg AS (SELECT q_id, doc_id,
        |    CAST(sum(s) AS BIGINT) AS score_nano
        |  FROM sc GROUP BY 1, 2),
        |top1 AS (SELECT q_id, score_nano
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |          ORDER BY score_nano DESC, doc_id) AS rn FROM agg)
        |  WHERE rn = 1)
        |SELECT doc_id AS eval_id, 'ngram' AS method,
        |  CAST(n_hit AS BIGINT) AS signal
        |FROM nghits WHERE n_grams > 0 AND n_hit * 2 >= n_grams
        |UNION ALL
        |SELECT q_id, 'bm25', score_nano FROM top1
        |WHERE score_nano >= 2800000000""".stripMargin,
    "ns22_contamination" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |train AS (
        |  SELECT DISTINCT g FROM grams WHERE doc_id >= 50),
        |hits AS (
        |  SELECT e.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END) AS n_hit
        |  FROM grams e LEFT JOIN train tr ON e.g = tr.g
        |  WHERE e.doc_id < 50
        |  GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CASE WHEN coalesce(h.n_grams, 0) = 0 THEN 0.0
        |    ELSE CAST(h.n_hit AS DOUBLE) / CAST(h.n_grams AS DOUBLE)
        |  END AS contamination
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 50) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    // Segment dedup oracle: identical split → keep-first → ordered
    // reassembly. DuckDB list slices are 1-based inclusive and clamp
    // exactly like Spark's slice(arr, start, length).
    "ns33_segment_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(len(words) / 10.0) AS BIGINT))) AS i
        |  FROM w),
        |segs AS (SELECT doc_id, i AS seg_idx,
        |  array_to_string(words[(i*10+1):(i*10+10)], ' ') AS segment
        |  FROM idx),
        |kept AS (SELECT *,
        |  ROW_NUMBER() OVER (PARTITION BY segment
        |    ORDER BY doc_id, seg_idx) = 1 AS keep
        |  FROM segs)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN segment END, ' '
        |    ORDER BY seg_idx), '') AS dedup_text
        |FROM kept GROUP BY doc_id""".stripMargin,
    // Boilerplate oracle: identical split; df per segment over
    // distinct docs; segments with df > 1 stripped everywhere.
    "ns42_boilerplate_removal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(len(words) / 10.0) AS BIGINT))) AS i
        |  FROM w),
        |segs AS (SELECT doc_id, i AS seg_idx,
        |  array_to_string(words[(i*10+1):(i*10+10)], ' ') AS segment
        |  FROM idx),
        |sdf AS (SELECT segment, COUNT(DISTINCT doc_id) AS seg_df
        |        FROM segs GROUP BY segment),
        |m AS (SELECT s.doc_id, s.seg_idx, s.segment,
        |        d.seg_df <= 1 AS keep
        |      FROM segs s JOIN sdf d ON s.segment = d.segment)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN segment END, ' '
        |    ORDER BY seg_idx), '') AS clean_text
        |FROM m GROUP BY doc_id""".stripMargin,
    // Duplicated-span removal oracle: same trigram stream (ns46's gram
    // arithmetic), corpus counts, gaps-and-islands runs >= 3, covered
    // token interval [start, end+2], anti-join + ordered string_agg.
    "ns65_dup_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, i - 1 AS pos, w[i] AS token
        |  FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
        |grams AS (
        |  SELECT doc_id, i - 1 AS gpos,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(i)
        |  WHERE len(w) >= 3),
        |dupg AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |dup AS (SELECT g.doc_id, g.gpos FROM grams g JOIN dupg USING (gram)),
        |isl AS (
        |  SELECT doc_id, gpos,
        |    gpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY gpos) AS k
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, min(gpos) AS s, max(gpos) + 2 AS e
        |  FROM isl GROUP BY doc_id, k HAVING count(*) >= 3),
        |cov AS (
        |  SELECT DISTINCT doc_id, s + j AS pos
        |  FROM spans, UNNEST(range(0, e - s + 1)) AS t(j)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.token
        |  FROM tok t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(token, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(clean_text, '') AS clean_text
        |FROM toks d LEFT JOIN agg USING (doc_id)""".stripMargin,
    // Dup-span oracle: same gram stream WITH positions; corpus-wide
    // occurrence counts; the longest consecutive duplicated run via
    // the pos − row_number island trick.
    "ns47_dup_span_profile" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        |j AS (SELECT doc_id, pos, c FROM grams JOIN cnt USING (g)),
        |d AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY pos) AS isl
        |      FROM j WHERE c > 1),
        |runs AS (SELECT doc_id, count(*) AS run
        |         FROM d GROUP BY doc_id, isl),
        |mx AS (SELECT doc_id, max(run) AS mr FROM runs GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |          CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_dup
        |        FROM j GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams, t.n_dup,
        |  CAST(coalesce(m.mr, 0) AS BIGINT) AS max_dup_run,
        |  CAST(t.n_dup AS DOUBLE) / t.n_grams AS dup_frac
        |FROM tot t LEFT JOIN mx m ON t.doc_id = m.doc_id""".stripMargin,
    // Survivor oracle: ns37's recursive closure (SQL verbatim) joined
    // to ns09's quality score (exact fifths), keep = top of each
    // cluster under (score DESC, doc_id).
    "ns49_cluster_survivors" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
        |assign AS (
        |  SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        |base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |qual AS (
        |  SELECT doc_id, CAST(
        |      CAST(length(text) BETWEEN 50 AND 100000 AS INT)
        |    + CAST(len(toks) BETWEEN 10 AND 50000 AS INT)
        |    + CAST(CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks)
        |        BETWEEN 2.0 AND 12.0 AS INT)
        |    + CAST(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |        /length(text) <= 0.2 AS INT)
        |    + CAST(CAST(len(list_filter(toks, t -> list_contains(
        |        ['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
        |        /len(toks) >= 0.01 AS INT)
        |    AS DOUBLE)/5 AS score
        |  FROM base)
        |SELECT a.doc_id, a.cluster_id, q.score,
        |  (ROW_NUMBER() OVER (PARTITION BY a.cluster_id
        |     ORDER BY q.score DESC, a.doc_id) = 1) AS keep
        |FROM assign a JOIN qual q ON a.doc_id = q.doc_id""".stripMargin,
    // Cluster-split oracle: ns37's recursive closure (SQL verbatim)
    // with ns17's bucket CASE applied to cluster_id.
    "ns52_cluster_split" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
        |assign AS (
        |  SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':cl1'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':cl1'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM assign""".stripMargin,
    // Contamination oracle: per-pair cosine exactly as ns05 (same
    // fold, same division grouping), max per corpus vector; the
    // driver-side eval norms are the same sequential fold, so the
    // doubles are bit-identical.
    "ns50_semantic_contamination" ->
      """WITH e AS (
        |  SELECT embedding AS ee,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS en
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS cn
        |  FROM embeddings WHERE vec_id >= 20),
        |s AS (
        |  SELECT c.vec_id,
        |    max(list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(e.ee[i] AS DOUBLE)))
        |      / (c.cn * e.en)) AS max_eval_cosine
        |  FROM c, e WHERE c.cn > 0 AND e.en > 0 GROUP BY 1)
        |SELECT vec_id, max_eval_cosine,
        |  max_eval_cosine >= 0.3 AS contaminated FROM s""".stripMargin,
    // Clustering oracle: recursive closure over the SAME pair set as
    // ns02 (SQL repeated verbatim), min reachable id per vertex ==
    // hash-to-min's fixpoint; docs off the pair graph are singleton
    // clusters via the left join.
    "ns37_dedup_clusters" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(cc.comp, d.doc_id) AS cluster_id,
        |  (COALESCE(cc.comp, d.doc_id) = d.doc_id) AS is_representative
        |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id""".stripMargin,
    // Funnel oracle: p03's gate CTEs without the replay union, rolled
    // to per-source counts; survivor source = the min-doc_id member's
    // source (exactDedup's min_by carry).
    "ns60_curation_funnel" ->
      """WITH base AS (
        |  SELECT doc_id, source, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, source, norm,
        |    length(text) AS n_chars, len(toks) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS sw,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |flags AS (
        |  SELECT doc_id, source, norm,
        |    (n_chars BETWEEN 50 AND 100000
        |      AND n_words BETWEEN 10 AND 50000
        |      AND awl BETWEEN 2.0 AND 12.0
        |      AND punct <= 0.2 AND sw >= 0.01) AS q,
        |    (en >= de AND en >= fr AND en >= es AND en > 0) AS l
        |  FROM stats),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id FROM flags
        |  WHERE q AND l GROUP BY md5(norm)),
        |survsrc AS (
        |  SELECT f.source, CAST(count(*) AS BIGINT) AS n_unique
        |  FROM surv s JOIN flags f ON f.doc_id = s.doc_id
        |  GROUP BY 1),
        |funnel AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |    CAST(sum(CASE WHEN q AND l THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
        |  FROM flags GROUP BY 1)
        |SELECT fu.source, fu.n_total, fu.n_quality, fu.n_lang,
        |  COALESCE(ss.n_unique, 0) AS n_unique
        |FROM funnel fu LEFT JOIN survsrc ss ON fu.source = ss.source""".stripMargin,
  )
}
