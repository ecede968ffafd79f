package graft.oracles

/** DuckDB oracle SQL for text quality, language, and token-statistics queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsTextOracles {

  /** The char-bigram language-profile CTE chain, interpolated from
    * the CHECKED-IN weight table ([[graft.ns.TextOps.langProfileGrams]])
    * and script ranges so the oracle's CASE arms cannot drift from
    * the Spark literal map — the computation (DuckDB list folds vs
    * Spark codegen folds) stays fully independent. Exposes `langp`
    * with (doc_id, n_chars, script, best, second, pred). */
  private val langNames = Seq("en", "de", "fr", "es")
  private def langArm(i: Int): String =
    graft.ns.TextOps.langProfileGrams.filter(_._2(i) != 0L)
      .map { case (g, ws) => s"WHEN '$g' THEN ${ws(i)}" }.mkString(" ")
  private val scriptCase: String = {
    val rs = graft.ns.TextOps.scriptRanges
    val counts = rs.indices.map(i => s"sc$i").mkString(", ")
    val whens = rs.zipWithIndex.map { case ((name, _), i) =>
      s"WHEN sc$i = greatest($counts) THEN '$name'" }.mkString(" ")
    s"CASE WHEN greatest($counts) <= 0 THEN 'other' $whens END"
  }
  private val langCte: String = {
    val scoreCols = langNames.indices.map(i =>
      s"""CAST(coalesce(list_sum(list_transform(gs,
         |      x -> CASE x ${langArm(i)} ELSE 0 END)), 0) AS BIGINT) AS s$i""".stripMargin)
      .mkString(",\n    ")
    val scriptCounts = graft.ns.TextOps.scriptRanges.zipWithIndex
      .map { case ((_, re), i) =>
        s"len(regexp_extract_all(text, '$re')) AS sc$i" }
      .mkString(",\n    ")
    val g = s"greatest(${langNames.indices.map(i => s"s$i").mkString(", ")})"
    val predCase = langNames.indices.init.map(i =>
      s"WHEN s$i = $g THEN '${langNames(i)}'").mkString(" ") +
      s" ELSE '${langNames.last}'"
    val secondCase = langNames.indices.init.map { i =>
      val others = langNames.indices.filter(_ != i)
        .map(j => s"s$j").mkString(", ")
      s"WHEN s$i = $g THEN greatest($others)"
    }.mkString(" ") + s" ELSE greatest(${langNames.indices.init
      .map(j => s"s$j").mkString(", ")})"
    s"""pdoc AS (
       |  SELECT doc_id, n_chars, text,
       |    concat(' ', regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS pd
       |  FROM documents),
       |gramsl AS (
       |  SELECT doc_id, n_chars, text,
       |    list_concat(
       |      list_transform(range(1, length(pd) + 1),
       |        i -> substr(pd, CAST(i AS INT), 1)),
       |      list_transform(range(1, length(pd)),
       |        i -> substr(pd, CAST(i AS INT), 2))) AS gs
       |  FROM pdoc),
       |scoresl AS (
       |  SELECT doc_id, n_chars, text,
       |    $scoreCols
       |  FROM gramsl),
       |scriptsl AS (
       |  SELECT doc_id,
       |    $scriptCounts
       |  FROM pdoc),
       |langp AS (
       |  SELECT s.doc_id, s.n_chars,
       |    $scriptCase AS script,
       |    $g AS best,
       |    CASE $secondCase END AS second,
       |    CASE $predCase END AS pred
       |  FROM scoresl s JOIN scriptsl USING (doc_id))""".stripMargin
  }
  private val langPredExpr: String =
    "CASE WHEN script <> 'latin' OR best <= 0 OR best - second < 100000" +
      " THEN 'und' ELSE pred END"

  /** ns122 closed-form pieces, generated from the checked-in fixture
    * tail: the repaired output is predictable WITHOUT running any
    * replace chain (repair of a k-encoded tail is the clean tail),
    * so the oracle only needs the clean tail as a chr()-chain
    * literal plus the per-class length deltas. */
  private[oracles] def chrChain(s: String): String =
    s.map { c =>
      if (c >= ' ' && c <= '~' && c != '\'') s"'$c'"
      else s"chr(${c.toInt})"
    }.foldRight(List.empty[String]) {
      // merge adjacent plain-literal chars into one quoted run
      case (piece, acc) =>
        (piece, acc) match {
          case (p, h :: t) if p.startsWith("'") && h.startsWith("'") =>
            (p.dropRight(1) + h.drop(1)) :: t
          case _ => piece :: acc
        }
    }.mkString(" || ")
  private[oracles] val mojiCleanChr =
    chrChain(graft.ns.TextOps.mojibakeFixtureTail)
  private val mojiLen1 = {
    val c = graft.ns.TextOps.mojibakeFixtureTail
    graft.ns.TextOps.sloppyCp1252(c).length - c.length
  }
  private val mojiLen2 = {
    val c = graft.ns.TextOps.mojibakeFixtureTail
    graft.ns.TextOps.sloppyCp1252(
      graft.ns.TextOps.sloppyCp1252(c)).length - c.length
  }

  /** ns127 fixture tail as a doc_id%4 CASE of chr() chains — the
    * SAME code points the Spark side appends (all BMP, so UTF-16
    * units == code points and chr() reads them verbatim). */
  private val nfcTailCase: String = {
    val ts = graft.ns.TextOps.nfcFixtureTails.map(chrChain)
    s"CASE doc_id % 4 WHEN 0 THEN ${ts(0)} WHEN 1 THEN ${ts(1)}" +
      s" WHEN 2 THEN ${ts(2)} ELSE ${ts(3)} END"
  }

  /** ns159 fixture tails as doc_id%4 CASEs of chr() chains — both
    * the INPUT side (what Spark appends) and the EXPECTED side (the
    * closed-form NFKC_Casefold prediction; DuckDB has no NFKC, so
    * this is the ns122/ns154 predict-don't-recompute convention). */
  private val nfkcInCase: String = {
    val ts = graft.ns.TextOps.nfkcCfFixtureTails.map(t => chrChain(t._1))
    s"CASE doc_id % 4 WHEN 0 THEN ${ts(0)} WHEN 1 THEN ${ts(1)}" +
      s" WHEN 2 THEN ${ts(2)} ELSE ${ts(3)} END"
  }
  private val nfkcExpCase: String = {
    val ts = graft.ns.TextOps.nfkcCfFixtureTails.map(t => chrChain(t._2))
    s"CASE doc_id % 4 WHEN 0 THEN ${ts(0)} WHEN 1 THEN ${ts(1)}" +
      s" WHEN 2 THEN ${ts(2)} ELSE ${ts(3)} END"
  }

  /** ns162/ns163 link-graph fixture + the UNROLLED integer PageRank
    * recurrence as CTE stages — DuckDB's own `//` floors reproduce
    * the engine's fixed division dag, one (dangling, contrib, rank)
    * stage triple per iteration, so every intermediate rank must
    * match bit for bit. */
  /** The ns181/ns185 shared hybrid-retrieval CTE chain: the ns164
    * BM25 dag and the ns166 quantization+MIPS dag, each cut to
    * rn <= 10 over the doc_id%59==3 query set, fused by
    * floor(1e9/(60+rn)) exact integer sums into `fused`
    * (q_id, doc_id, rrf_nano, n_legs, rn). */
  private val hybridRrfCtes: String =
    """base AS (
      |  SELECT doc_id, list_filter(string_split(regexp_replace(
      |    lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |    w -> len(w) > 0) AS toks
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(toks) AS term FROM base),
      |tf AS (SELECT doc_id, term, count(*) AS tf
      |  FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      |st AS (SELECT count(DISTINCT doc_id) AS n, count(*) AS t
      |  FROM tok),
      |qt AS (SELECT DISTINCT doc_id AS q_id, unnest(toks[1:4]) AS term
      |  FROM base WHERE doc_id % 59 = 3 AND doc_id < 3000),
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
      |lex AS (SELECT q_id, doc_id, rn
      |  FROM (SELECT q_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id
      |        ORDER BY score_nano DESC, doc_id) AS rn FROM agg)
      |  WHERE rn <= 10),
      |es AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_max(list_transform(embedding, x -> abs(x)))
      |      AS DOUBLE) AS q_scale
      |  FROM embeddings),
      |eq AS (
      |  SELECT vec_id,
      |    CASE WHEN q_scale = 0
      |      THEN list_transform(embedding, x -> 0)
      |      ELSE list_transform(embedding,
      |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
      |          AS INTEGER))
      |    END AS q
      |  FROM es),
      |qs AS (SELECT vec_id AS q_id, q AS qv FROM eq
      |  WHERE vec_id % 59 = 3 AND vec_id < 3000),
      |dsc AS (SELECT qs.q_id, d.vec_id AS doc_id,
      |    CAST(list_sum(list_transform(range(1, len(qs.qv) + 1),
      |      i -> CAST(qs.qv[i] AS BIGINT) * d.q[i])) AS BIGINT)
      |      AS score
      |  FROM eq d, qs),
      |dense AS (SELECT q_id, doc_id, rn
      |  FROM (SELECT q_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id
      |        ORDER BY score DESC, doc_id) AS rn FROM dsc)
      |  WHERE rn <= 10),
      |u AS (
      |  SELECT q_id, doc_id,
      |    CAST(floor(1e9 / (60 + rn)) AS BIGINT) AS c FROM lex
      |  UNION ALL
      |  SELECT q_id, doc_id,
      |    CAST(floor(1e9 / (60 + rn)) AS BIGINT) AS c FROM dense),
      |f AS (SELECT q_id, doc_id,
      |    CAST(sum(c) AS BIGINT) AS rrf_nano,
      |    CAST(count(*) AS BIGINT) AS n_legs
      |  FROM u GROUP BY 1, 2),
      |fused AS (SELECT q_id, doc_id, rrf_nano, n_legs,
      |    ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY rrf_nano DESC, doc_id) AS rn FROM f)""".stripMargin

  private val authorityCtes: String = {
    val scale = "1000000000000"
    val head = s"""e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT source || '.com' AS src,
      |      'src' || (doc_id % 16) || '.com' AS dst FROM documents
      |    UNION ALL
      |    SELECT source || '.com', 'sink.example' FROM documents
      |    WHERE doc_id % 17 = 0)
      |  WHERE src <> dst),
      |nodes AS (SELECT DISTINCT domain FROM (
      |  SELECT src AS domain FROM e
      |  UNION ALL SELECT dst FROM e)),
      |meta AS (SELECT count(*) AS n FROM nodes),
      |outdeg AS (SELECT src AS domain, count(*) AS outdeg
      |  FROM e GROUP BY src),
      |r0 AS (SELECT domain, (SELECT $scale // n FROM meta) AS r
      |  FROM nodes)""".stripMargin
    // rank stages are MATERIALIZED: DuckDB inlines plain CTEs per
    // reference, and each round references the previous one three
    // times — unrolled chains otherwise grow exponentially (the r15
    // 5+3-round incremental chain regressed from seconds to minutes
    // before this hint; ns162's own 5 rounds drop ~5 s → ms)
    val iters = (1 to 5).map { k =>
      s"""d$k AS (SELECT coalesce(sum(r), 0) AS dang
         |  FROM r${k - 1} LEFT JOIN outdeg USING (domain)
         |  WHERE outdeg IS NULL),
         |c$k AS (SELECT e.dst AS domain, sum(rr.r // o.outdeg) AS ins
         |  FROM r${k - 1} rr JOIN outdeg o USING (domain)
         |  JOIN e ON e.src = rr.domain
         |  GROUP BY e.dst),
         |r$k AS MATERIALIZED (SELECT nd.domain,
         |  (SELECT 15 * ($scale // n) // 100 FROM meta)
         |  + 85 * (coalesce(c.ins, 0)
         |    + ((SELECT dang FROM d$k) // (SELECT n FROM meta)))
         |    // 100 AS r
         |  FROM nodes nd LEFT JOIN c$k c USING (domain))""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  /** r15: the incremental-authority chain (ns199/ns177) — 5 unrolled
    * rounds on the BASE graph (doc_id%10 <> 7), the warm-start
    * vector spread over the FULL graph's nodes (new domains at the
    * uniform base), then 3 more unrolled rounds over base∪delta.
    * Same integer dag as [[authorityCtes]], different r0. */
  private val incrementalAuthorityCtes: String = {
    val scale = "1000000000000"
    def graph(p: String, filt: String): String =
      s"""${p}e AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT source || '.com' AS src,
         |      'src' || (doc_id % 16) || '.com' AS dst
         |    FROM documents$filt
         |    UNION ALL
         |    SELECT source || '.com', 'sink.example' FROM documents
         |    WHERE doc_id % 17 = 0${
           if (filt.isEmpty) "" else " AND doc_id % 10 <> 7"})
         |  WHERE src <> dst),
         |${p}nodes AS (SELECT DISTINCT domain FROM (
         |  SELECT src AS domain FROM ${p}e
         |  UNION ALL SELECT dst FROM ${p}e)),
         |${p}meta AS (SELECT count(*) AS n FROM ${p}nodes),
         |${p}outdeg AS (SELECT src AS domain, count(*) AS outdeg
         |  FROM ${p}e GROUP BY src)""".stripMargin
    // every rank stage MATERIALIZED — see the authorityCtes note:
    // plain CTEs inline per reference and this chain unrolls 5+3
    // rounds, which is exponential without the hint
    def iter(p: String, r: Int => String, k: Int): String =
      s"""${p}d$k AS (SELECT coalesce(sum(r), 0) AS dang
         |  FROM ${r(k - 1)} LEFT JOIN ${p}outdeg USING (domain)
         |  WHERE outdeg IS NULL),
         |${p}c$k AS (SELECT ${p}e.dst AS domain,
         |    sum(rr.r // o.outdeg) AS ins
         |  FROM ${r(k - 1)} rr JOIN ${p}outdeg o USING (domain)
         |  JOIN ${p}e ON ${p}e.src = rr.domain
         |  GROUP BY ${p}e.dst),
         |${r(k)} AS MATERIALIZED (SELECT nd.domain,
         |  (SELECT 15 * ($scale // n) // 100 FROM ${p}meta)
         |  + 85 * (coalesce(c.ins, 0)
         |    + ((SELECT dang FROM ${p}d$k) // (SELECT n FROM ${p}meta)))
         |    // 100 AS r
         |  FROM ${p}nodes nd LEFT JOIN ${p}c$k c USING (domain))"""
        .stripMargin
    val baseR0 =
      s"""br0 AS MATERIALIZED (
         |  SELECT domain, (SELECT $scale // n FROM bmeta) AS r
         |  FROM bnodes)""".stripMargin
    val warmR0 =
      s"""ir0 AS MATERIALIZED (SELECT nd.domain, coalesce(b.r, 0) AS r
         |  FROM inodes nd LEFT JOIN br5 b USING (domain))""".stripMargin
    (Seq(graph("b", " WHERE doc_id % 10 <> 7"), baseR0) ++
      (1 to 5).map(k => iter("b", i => s"br$i", k)) ++
      Seq(graph("i", ""), warmR0) ++
      (1 to 3).map(k => iter("i", i => s"ir$i", k))).mkString(",\n")
  }

  /** ns134's full funnel SQL, shared verbatim by the ns163
    * authority-ordered composition. */
  private val crawlFrontierSql: String =
    """WITH u0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'https://' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
        |    source ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END ||
        |    '/p/' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&q=' || doc_id || '&fbclid=xyz'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, url FROM u0
        |  UNION ALL
        |  SELECT doc_id + 3000000, url || '#dup' FROM u0
        |  WHERE doc_id % 6 = 2),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN (scheme = 'http' AND auth LIKE '%:80')
        |            OR (scheme = 'https' AND auth LIKE '%:443')
        |          THEN regexp_replace(auth, ':[0-9]+$', '')
        |          ELSE auth END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN query = '' OR len(kept) = 0 THEN ''
        |          ELSE '?' || array_to_string(kept, '&') END) AS url_canon
        |  FROM (SELECT *,
        |          list_filter(string_split(query, '&'), p ->
        |            NOT (starts_with(p, 'utm_') OR
        |                 starts_with(p, 'fbclid=') OR
        |                 starts_with(p, 'gclid=') OR
        |                 starts_with(p, 'ref=') OR p = '')) AS kept
        |        FROM parts)),
        |ded AS (
        |  SELECT url_canon, min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS n_variants
        |  FROM canon GROUP BY url_canon),
        |dom AS (
        |  SELECT doc_id, url_canon, n_variants,
        |    CASE WHEN len(hp) >= 3 AND (hp[-2] || '.' || hp[-1])
        |           IN ('co.uk', 'com.au', 'co.jp')
        |         THEN hp[-3] || '.' || hp[-2] || '.' || hp[-1]
        |         WHEN len(hp) >= 2 THEN hp[-2] || '.' || hp[-1]
        |         ELSE host END AS domain
        |  FROM (SELECT doc_id, url_canon, n_variants,
        |          regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) AS host,
        |          string_split(regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1), '.') AS hp
        |        FROM ded)),
        |keep AS (
        |  SELECT * FROM dom
        |  WHERE domain NOT IN ('src3.com', 'src7.co.uk', 'src15.com'))
        |SELECT doc_id, url_canon, domain, n_variants,
        |  CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
        |        ORDER BY doc_id) AS rn FROM keep)
        |WHERE rn <= 8""".stripMargin

  /** ns169/s16 shared closed-form chat-JSONL prediction. */
  private val chatJsonlSql: String =
      """WITH c AS (
        |  SELECT doc_id,
        |    regexp_replace(array_to_string(
        |      string_split(regexp_replace(lower(trim(text)),
        |        '\s+', ' ', 'g'), ' ')[1:3], ' '),
        |      '[^a-z0-9 ]', '', 'g') AS content
        |  FROM documents)
        |SELECT doc_id AS conversation_id, CAST(0 AS BIGINT) AS turn_idx,
        |  'user' AS role, content, CAST(NULL AS VARCHAR) AS raw_line,
        |  false AS quarantined
        |FROM c WHERE doc_id % 17 <> 0
        |UNION ALL
        |SELECT doc_id, 1, 'assistant', 'ok ' || doc_id, NULL, false
        |FROM c WHERE doc_id % 17 <> 0
        |UNION ALL
        |SELECT NULL, NULL, NULL, NULL,
        |  '{"conversation_id": ' || doc_id || ', "messages": [{', true
        |FROM documents WHERE doc_id % 17 = 0""".stripMargin

  /** ns172: the ns73 logit per (doc, source), the per-source exact
    * PERCENTILE_DISC p70 over the integer-logit histogram (the ns92
    * rule), and the keep filter — all re-derived independently. */
  private val qualityFloorSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    string_split(regexp_replace(lower(trim(text)),
      |      '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |lg AS (
      |  SELECT doc_id, source,
      |    CAST(-50000 + coalesce(list_sum(list_transform(toks,
      |      t -> CASE t
      |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
      |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
      |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
      |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
      |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
      |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
      |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
      |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
      |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
      |    WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS BIGINT)
      |      AS logit_micro
      |  FROM base),
      |h AS (SELECT source, logit_micro AS b, count(*) AS c
      |  FROM lg GROUP BY 1, 2),
      |cum AS (SELECT source, b,
      |    sum(c) OVER (PARTITION BY source ORDER BY b) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM h),
      |cut AS (SELECT source,
      |    CAST(min(CASE WHEN cum >= ceil(0.7 * n) THEN b END)
      |      AS BIGINT) AS floor_micro
      |  FROM cum GROUP BY source)
      |SELECT lg.doc_id, lg.source, lg.logit_micro, cut.floor_micro
      |FROM lg JOIN cut USING (source)
      |WHERE lg.logit_micro >= cut.floor_micro""".stripMargin

  /** ns168/s17 shared single-pass whole-corpus term stats. */
  private val bm25IndexSql: String =
    """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    w -> len(w) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM tok GROUP BY 1, 2)
        |SELECT term, CAST(count(*) AS BIGINT) AS dfreq,
        |  CAST(sum(tf) AS BIGINT) AS tf_total
        |FROM tf GROUP BY term""".stripMargin

  val sql: Map[String, String] = Map(
    // The ns137 urlset-entry-0 lastmod formula + the unrolled
    // authority recurrence + the clamped age×authority arithmetic.
    "ns177_recrawl_priority" ->
      s"""WITH $incrementalAuthorityCtes,
         |sm AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS ord,
         |    'https://maps.example.com/p/' || doc_id || '-0?a='
         |      || doc_id || '&b=2' AS loc,
         |    CAST(('2026-0' || (doc_id % 9 + 1) || '-11') AS DATE)
         |      AS lm
         |  FROM documents WHERE doc_id % 8 <> 6)
         |SELECT sm.doc_id, sm.ord, sm.loc,
         |  d.source || '.com' AS domain,
         |  CAST(greatest(date_diff('day', lm, DATE '2026-06-30'), 0)
         |    AS BIGINT) AS age_days,
         |  CAST(coalesce(ir3.r, 0) AS BIGINT) AS auth_micro,
         |  CAST(greatest(date_diff('day', lm, DATE '2026-06-30'), 0)
         |    * coalesce(ir3.r, 0) AS BIGINT) AS priority
         |FROM sm JOIN documents d ON d.doc_id = sm.doc_id
         |LEFT JOIN ir3 ON ir3.domain = d.source || '.com'""".stripMargin,
    // r15: the warm-started refresh — base refit and warm rounds
    // both unrolled; every intermediate rank bit-exact.
    "ns199_incremental_authority" ->
      s"""WITH $incrementalAuthorityCtes
         |SELECT domain, CAST(r AS BIGINT) AS auth_micro
         |FROM ir3""".stripMargin,
    // Closed-form prediction of every parsed chat row — the oracle
    // never parses JSON: good docs emit exactly the (user, assistant)
    // turn pair from the same word-slice formula the fixture encodes,
    // truncated docs emit exactly one quarantine row with the raw
    // line rebuilt. s16 is the streaming restatement over the same
    // fixture lines — the drained sink must equal the same rows.
    // Conversation quality: every battery column re-derived from the
    // planting formulas INCLUDING their overlaps (%55 swaps-and-
    // appends: the extra assistant turn follows a USER turn — no
    // violation — but the conversation still opens with the
    // assistant) and the natural-empty case (a content formula that
    // strips to whitespace counts as empty with or without %7).
    "ns189_conversation_quality" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    regexp_replace(array_to_string(
        |      string_split(regexp_replace(lower(trim(text)),
        |        '\s+', ' ', 'g'), ' ')[1:3], ' '),
        |      '[^a-z0-9 ]', '', 'g') AS content
        |  FROM documents),
        |q AS (SELECT doc_id,
        |    CAST(2 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
        |      AS BIGINT) AS n_turns,
        |    CAST(CASE WHEN doc_id % 5 = 0 AND doc_id % 11 <> 0
        |      THEN 1 ELSE 0 END AS BIGINT) AS n_violations,
        |    CAST(CASE WHEN trim(CASE WHEN doc_id % 7 = 0 THEN ''
        |      ELSE content END) = '' THEN 1 ELSE 0 END AS BIGINT)
        |      AS n_empty,
        |    doc_id % 11 <> 0 AS starts_with_user,
        |    (doc_id % 5 = 0 OR doc_id % 11 <> 0) AS ends_with_assistant
        |  FROM c)
        |SELECT doc_id AS conversation_id, n_turns, n_violations,
        |  n_empty, starts_with_user, ends_with_assistant,
        |  n_turns >= 2 AND n_violations = 0 AND n_empty = 0
        |    AND starts_with_user AND ends_with_assistant AS keep
        |FROM q""".stripMargin,
    // Tool-call validation: one row per good conversation, the tool
    // name and validity predicted per planted class — repairable
    // classes surface their name, the truncated class must be
    // invalid with a null name.
    "ns188_toolcall_validation" ->
      """SELECT doc_id AS conversation_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'calc'
        |    ELSE NULL END AS tool_name,
        |  doc_id % 3 <> 2 AS valid
        |FROM documents WHERE doc_id % 17 <> 0""".stripMargin,
    // Conversation dedup: every fingerprint re-derived from the
    // fixture's closed-form rendered turn sequence (no JSON parse);
    // each group is exactly {id, id+3000000} → survivor id, count 2.
    "ns186_conversation_dedup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    regexp_replace(array_to_string(
        |      string_split(regexp_replace(lower(trim(text)),
        |        '\s+', ' ', 'g'), ' ')[1:3], ' '),
        |      '[^a-z0-9 ]', '', 'g') AS content
        |  FROM documents WHERE doc_id % 17 <> 0)
        |SELECT md5('<|user|>' || content || '<|end|>'
        |    || '<|assistant|>ok ' || doc_id || '<|end|>')
        |    AS fingerprint,
        |  doc_id AS conversation_id, CAST(2 AS BIGINT) AS dup_count
        |FROM c""".stripMargin,
    "s16_stream_chat_ingest" -> chatJsonlSql,
    "ns169_chat_jsonl" -> chatJsonlSql,
    // One single-pass recomputation over the WHOLE corpus — the
    // merged (store + batch) stats must equal it exactly.
    "ns168_bm25_index_delta" -> bm25IndexSql,
    "s17_stream_bm25_index" -> bm25IndexSql,
    "ns172_quality_floor" -> qualityFloorSql,
    // Full independent BM25: DuckDB's own tokenization/df/idf/
    // saturation/top-k. The idf is floor(ln·1e9) per distinct term
    // (libm ln bit-stability, the ns58 precedent), the per-(term,
    // doc) factor the identical IEEE dag with the same double
    // literals, floored to a nano long before the per-query sum.
    "ns164_bm25_topk" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(
        |    lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    w -> len(w) > 0) AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM base),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT count(DISTINCT doc_id) AS n, count(*) AS t
        |  FROM tok),
        |qt AS (SELECT DISTINCT doc_id AS q_id, unnest(toks[1:4]) AS term
        |  FROM base WHERE doc_id % 59 = 3),
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
        |  FROM sc GROUP BY 1, 2)
        |SELECT q_id, doc_id, score_nano, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY score_nano DESC, doc_id) AS rn FROM agg)
        |WHERE rn <= 5""".stripMargin,
    // Hybrid RRF: the ns164 BM25 dag (rn <= 10) and the ns166
    // quantization+MIPS dag (rn <= 10, query set %59==3) re-derived
    // independently, then the fusion: each leg contributes
    // floor(1e9/(60+rn)) — the identical single IEEE division — and
    // the fused rank is over the exact integer sums.
    "ns181_hybrid_rrf" ->
      s"""WITH $hybridRrfCtes
        |SELECT q_id, doc_id, rrf_nano, n_legs,
        |  CAST(rn AS BIGINT) AS rn
        |FROM fused
        |WHERE rn <= 10""".stripMargin,
    // Retrieval-quality datasheet (r14): the same fused chain scored
    // against the planted gold set {q, q+59, q+118} ∩ corpus. The
    // per-rank discounts and ideal prefixes are the SAME integer
    // literals the engine checks in (Retrieval.ndcgDiscNano) — rank
    // domain ≤ 10, so no libm rounding is trusted anywhere; every
    // metric is integer floor arithmetic.
    "ns192_retrieval_quality" ->
      s"""WITH $hybridRrfCtes,
        |mx AS (SELECT max(doc_id) AS m FROM documents),
        |qs2 AS (SELECT DISTINCT doc_id AS q_id FROM documents
        |  WHERE doc_id % 59 = 3 AND doc_id < 3000),
        |gold AS (
        |  SELECT q_id, q_id + 59 * t.k AS doc_id
        |  FROM qs2, UNNEST([0, 1, 2]) AS t(k), mx
        |  WHERE q_id + 59 * t.k <= mx.m),
        |ng AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_gold
        |  FROM gold GROUP BY 1),
        |hits AS (SELECT f.q_id, f.rn
        |  FROM fused f JOIN gold g
        |    ON f.q_id = g.q_id AND f.doc_id = g.doc_id
        |  WHERE f.rn <= 10),
        |ha AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    CAST(min(rn) AS BIGINT) AS fr,
        |    CAST(sum(CASE rn
        |      WHEN 1 THEN 1000000000 WHEN 2 THEN 630929753
        |      WHEN 3 THEN 500000000 WHEN 4 THEN 430676558
        |      WHEN 5 THEN 386852807 WHEN 6 THEN 356207187
        |      WHEN 7 THEN 333333333 WHEN 8 THEN 315464876
        |      WHEN 9 THEN 301029995 ELSE 289064826 END) AS BIGINT)
        |      AS dcg
        |  FROM hits GROUP BY 1)
        |SELECT ng.q_id, ng.n_gold,
        |  coalesce(ha.n_hits, 0) AS n_hits,
        |  CAST(coalesce(ha.n_hits, 0) * 1000000000 // ng.n_gold
        |    AS BIGINT) AS recall_nano,
        |  CAST(CASE WHEN ha.fr IS NULL THEN 0
        |    ELSE 1000000000 // ha.fr END AS BIGINT) AS mrr_nano,
        |  CAST(coalesce(ha.dcg, 0) AS BIGINT) AS dcg_nano,
        |  CAST(CASE least(ng.n_gold, 10)
        |    WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929753
        |    ELSE 2130929753 END AS BIGINT) AS idcg_nano,
        |  CAST(coalesce(ha.dcg, 0) * 1000000000
        |    // (CASE least(ng.n_gold, 10)
        |      WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929753
        |      ELSE 2130929753 END) AS BIGINT) AS ndcg_nano
        |FROM ng LEFT JOIN ha USING (q_id)""".stripMargin,
    // Context assembly: the same fused chain, joined back to the doc
    // text for the BPE-proxy token count, one running-sum window per
    // query in rank order, prefix-kept under the 384 budget.
    "ns185_context_assembly" ->
      s"""WITH $hybridRrfCtes,
        |tokc AS (SELECT fused.q_id, fused.doc_id,
        |    CAST(fused.rn AS BIGINT) AS rn,
        |    CAST(len(regexp_extract_all(d.text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM fused JOIN documents d ON d.doc_id = fused.doc_id
        |  WHERE fused.rn <= 10)
        |SELECT q_id, doc_id, rn, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY q_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY q_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    <= 384 AS kept
        |FROM tokc""".stripMargin,
    "ns162_domain_authority" ->
      s"""WITH $authorityCtes
         |SELECT domain, CAST(r AS BIGINT) AS auth_micro
         |FROM r5""".stripMargin,
    // ns134's funnel verbatim as a CTE, the unrolled authority
    // recurrence alongside, one broadcast-shaped left join to attach
    // the fetch-priority score (0 for domains outside the link graph).
    "ns163_authority_frontier" ->
      s"""WITH f AS ($crawlFrontierSql),
         |$authorityCtes
         |SELECT f.doc_id, f.url_canon, f.domain, f.n_variants, f.rn,
         |  CAST(coalesce(r5.r, 0) AS BIGINT) AS auth_micro
         |FROM f LEFT JOIN r5 ON r5.domain = f.domain""".stripMargin,
    // The base text is ASCII (fold ≡ lower() in both engines) and
    // the tail prediction is closed-form; all planted code points
    // are BMP, so DuckDB's code-point length == Spark's UTF-16
    // length and the signed n_delta matches exactly.
    "ns159_nfkc_casefold" ->
      s"""SELECT doc_id,
         |  lower(text) || $nfkcExpCase AS folded_text,
         |  CAST(length(text || $nfkcInCase)
         |    - length(lower(text) || $nfkcExpCase) AS BIGINT) AS n_delta
         |FROM documents""".stripMargin,
    // Every salted variant (uppercase twin, full-width twin) folds
    // back to the original's lower(text) exactly, so the oracle
    // fingerprints lower(text) once per doc with the variant
    // multiplicity — no normalizer in SQL (the ns132 shape).
    "ns160_casefold_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
        |      + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS mult,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS fingerprint
        |  FROM documents)
        |SELECT fingerprint, min(doc_id) AS doc_id,
        |  CAST(sum(mult) AS BIGINT) AS dup_count
        |FROM m GROUP BY fingerprint""".stripMargin,
    // Trained weights from the INDEPENDENT Python trainer
    // (tools/gen_linear.py, the ns88 two-implementation convention):
    // same labels, same integer batch-perceptron loop, written by a
    // from-scratch implementation; the SQL just reads the checked-in
    // artifact. Valid at sf0.01 (where the driver gates); rerun the
    // tool if the driver regenerates documents.
    "ns123_linear_train" ->
      """SELECT feature, weight FROM read_parquet(
        |'/root/repo/src/test/resources/graft/linear_weights_sf001.parquet')
        |""".stripMargin,
    // Same convention for the calibration table: the checked-in
    // artifact is written by the from-scratch Python PAV
    // (tools/gen_isotonic.py) over the same corpus; integer-exact,
    // so the tables must be identical row for row.
    "ns130_isotonic_calibration" ->
      """SELECT bucket, n, n_pos, cal_micro FROM read_parquet(
        |'/root/repo/src/test/resources/graft/isotonic_cal_sf001.parquet')
        |""".stripMargin,
    "ns122_mojibake_repair" ->
      s"""SELECT doc_id,
         |  text || CASE WHEN doc_id % 3 IN (0, 1)
         |    THEN $mojiCleanChr ELSE '' END AS repaired_text,
         |  CAST(CASE doc_id % 3 WHEN 0 THEN $mojiLen1
         |    WHEN 1 THEN $mojiLen2 ELSE 0 END AS BIGINT) AS n_removed
         |FROM documents""".stripMargin,
    // Every planted variant (NFD re-encoding, mojibake mangle)
    // normalizes back to text||tailPre exactly, so the oracle needs
    // no repair chain or normalizer on the variants: it fingerprints
    // the ORIGINAL text||tailPre once per doc with the variant
    // multiplicity, then groups by fingerprint (robust to natural
    // duplicate texts at any sf).
    "ns132_normalized_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
         |      + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS mult,
         |    md5(regexp_replace(lower(trim(text || $mojiCleanChr)),
         |      '\\s+', ' ', 'g')) AS fingerprint
         |  FROM documents)
         |SELECT fingerprint, min(doc_id) AS doc_id,
         |  CAST(sum(mult) AS BIGINT) AS dup_count
         |FROM m GROUP BY fingerprint""".stripMargin,
    // DuckDB runs its OWN nfc_normalize (utf8proc) against the
    // JDK-normalized Spark output: a genuine two-implementation gate,
    // sound because Unicode normalization is stabilized. The input
    // tail is rebuilt from the same checked-in code points.
    "ns127_nfc_normalize" ->
      s"""WITH src AS (
         |  SELECT doc_id, text || $nfcTailCase AS text FROM documents)
         |SELECT doc_id, nfc_normalize(text) AS nfc_text,
         |  CAST(length(text) - length(nfc_normalize(text))
         |    AS BIGINT) AS n_composed
         |FROM src""".stripMargin,
    "ns121_lang_profile" ->
      s"""WITH $langCte
         |SELECT doc_id, script, $langPredExpr AS lang_pred,
         |  best AS score_micro, best - second AS margin_micro
         |FROM langp""".stripMargin,
    "ns08_text_stats" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |FROM base""".stripMargin,
    "ns09_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base)
        |SELECT *,
        |  CAST(CAST(chk_chars AS INT) + CAST(chk_words AS INT)
        |     + CAST(chk_avg_word_len AS INT) + CAST(chk_punct AS INT)
        |     + CAST(chk_stopwords AS INT) AS DOUBLE) / 5 AS quality_score
        |FROM (
        |  SELECT *,
        |    n_chars BETWEEN 50 AND 100000 AS chk_chars,
        |    n_words BETWEEN 10 AND 50000 AS chk_words,
        |    avg_word_len BETWEEN 2.0 AND 12.0 AS chk_avg_word_len,
        |    punct_ratio <= 0.2 AS chk_punct,
        |    stopword_ratio >= 0.01 AS chk_stopwords
        |  FROM stats)""".stripMargin,
    "ns10_lang_id" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
        |       WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
        |       WHEN fr >= es AND fr > 0 THEN 'fr'
        |       WHEN es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM hits""".stripMargin,
    "ns19_pii_redaction" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com call +1-555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 3) % 256 AS VARCHAR)
        |      || ' card 4111-1111-1111-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0') AS t0
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM base),
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
    "ns20_repetition_stats" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_replace(text, ' table ', chr(10), 'g') AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(t, chr(10)),
        |      x -> length(x) > 0)) AS line
        |  FROM base),
        |grp AS (
        |  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
        |  FROM lines GROUP BY doc_id, line),
        |agg AS (
        |  SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS n_uniq,
        |    SUM(c * len) AS tot_chars, SUM((c - 1) * len) AS dup_chars
        |  FROM grp GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(n_uniq AS BIGINT) AS n_unique_lines,
        |  CAST(n_lines - n_uniq AS DOUBLE) / CAST(n_lines AS DOUBLE)
        |    AS dup_line_frac,
        |  CAST(dup_chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)
        |    AS dup_char_frac
        |FROM agg""".stripMargin,
    "ns21_vocab_topk" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS word
        |  FROM documents)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM toks GROUP BY word
        |ORDER BY n DESC, word ASC LIMIT 20""".stripMargin,
    "ns27_token_accounting" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS total_words,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source""".stripMargin,
    "ns26_tfidf_terms" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |words AS (
        |  SELECT doc_id,
        |    unnest(list_filter(toks, x -> length(x) > 0)) AS word
        |  FROM base),
        |tf AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |  FROM words GROUP BY 1, 2),
        |dfreq AS (SELECT word, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.word, t.tf,
        |    CAST(t.tf AS DOUBLE) * n.n / d.dfreq AS score
        |  FROM tf t JOIN dfreq d ON t.word = d.word, n)
        |SELECT doc_id, word, tf, score, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 5""".stripMargin,
    // Chunking oracle: same start grid (0, 8, 16, …, first multiple
    // of 8 reaching len−32); DuckDB's 1-based inclusive list slice
    // clamps at the tail exactly like Spark's slice(arr, start, len).
    "ns43_chunk_windows" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(greatest(len(words) - 32, 0) / 8.0)
        |    AS BIGINT) + 1)) AS i
        |  FROM w)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  array_to_string(words[(i*8+1):(i*8+32)], ' ') AS chunk_text,
        |  CAST(len(words[(i*8+1):(i*8+32)]) AS BIGINT) AS n_words
        |FROM idx""".stripMargin,
    // Rare-token oracle: normalized tokens (the ns08 CTE), df over
    // distinct docs, rare = df < 3; the one division is double/int
    // in both engines (bit-exact IEEE divide).
    "ns45_rare_token_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS word
        |  FROM documents),
        |t2 AS (SELECT doc_id, word FROM toks WHERE length(word) > 0),
        |dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS dfreq
        |          FROM t2 GROUP BY word),
        |common AS (SELECT word FROM dfreq WHERE dfreq >= 3)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT t2.word) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c.word IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rare,
        |  CAST(SUM(CASE WHEN c.word IS NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS rare_frac
        |FROM t2 LEFT JOIN common c ON t2.word = c.word
        |GROUP BY doc_id""".stripMargin,
    // Self-scored unigram NLL: every token is in-vocab so no OOV arm.
    // Bit equality holds because the nll is fixed-point-quantized per
    // DISTINCT token (see the ns58 registry comment); the mean is then
    // exact long arithmetic divided once.
    // ns58's fixed-point-ln idiom at bigram granularity: the model
    // tables quantize each distinct bigram's (and each w1 backoff's)
    // -ln once, scores are exact long sums. Train = doc_id % 3 != 0;
    // the held-out third hits both backoff tiers.
    // Same stream CTEs; PMI per surviving pair quantized once, the
    // identical division/multiplication order, (pmi desc, w1, w2)
    // rank <= 50.
    "ns114_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |uni AS (
        |  SELECT t.tok AS w, CAST(COUNT(*) AS BIGINT) AS u
        |  FROM (SELECT unnest(w) AS tok FROM toks) t
        |  WHERE length(t.tok) > 0 GROUP BY 1),
        |nt AS (SELECT CAST(SUM(u) AS BIGINT) AS nt FROM uni),
        |big AS (
        |  SELECT w[i] AS w1, w[i+1] AS w2
        |  FROM toks, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE length(w[i]) > 0 AND length(w[i+1]) > 0),
        |cnt AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM big GROUP BY 1, 2),
        |nb AS (SELECT CAST(SUM(c) AS BIGINT) AS nb FROM cnt),
        |scored AS (
        |  SELECT cnt.w1, cnt.w2, cnt.c,
        |    CAST(round(ln((c / CAST(nb AS DOUBLE)) /
        |      ((u1.u / CAST(nt AS DOUBLE))
        |        * (u2.u / CAST(nt AS DOUBLE))))
        |      * 16777216.0) AS BIGINT) AS pmi_fx
        |  FROM cnt
        |  JOIN uni u1 ON u1.w = cnt.w1
        |  JOIN uni u2 ON u2.w = cnt.w2, nt, nb
        |  WHERE cnt.c >= 5)
        |SELECT w1, w2, c, pmi_fx,
        |  CAST(ROW_NUMBER() OVER (ORDER BY pmi_fx DESC, w1, w2)
        |    AS BIGINT) AS "rank"
        |FROM scored
        |QUALIFY "rank" <= 50""".stripMargin,
    // Selection bucket and marker text are the same md5 formulas.
    "ns117_plant_canaries" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':canary'), 1, 8)) AS BIGINT) % 20 = 0 AS planted,
        |    'CANARY-' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':canary:tok'), 1, 16) AS c
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN planted THEN text || ' ' || c ELSE text END
        |    AS text_out,
        |  planted,
        |  CASE WHEN planted THEN c END AS canary
        |FROM b""".stripMargin,
    // ns19's tail formula; the one injected address maps to its md5
    // pseudonym, raw text carries no addresses (verified fixture
    // fact), so the rewritten text is closed-form.
    "ns118_pseudonymize" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com call +1-555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 3) % 256 AS VARCHAR)
        |      || ' card 4111-1111-1111-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0')
        |      AS t0,
        |    'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |      AS em
        |  FROM documents)
        |SELECT doc_id,
        |  replace(t0, em, 'user-' || substr(md5(em), 1, 12)
        |    || '@anon.invalid') AS text_out,
        |  CAST(1 AS BIGINT) AS n_emails
        |FROM base""".stripMargin,
    "ns112_bigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |  FROM toks, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE length(w[i]) > 0 AND length(w[i+1]) > 0),
        |tbig AS (SELECT * FROM big WHERE doc_id % 3 <> 0),
        |cnt AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tbig GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1
        |       FROM cnt GROUP BY 1),
        |vv AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v
        |       FROM tbig),
        |lp AS (
        |  SELECT cnt.w1, cnt.w2,
        |    CAST(round(-ln((c + 0.5) / (c1 + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM cnt JOIN c1 USING (w1), vv),
        |bo AS (
        |  SELECT w1,
        |    CAST(round(-ln(0.5 / (c1 + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS bfx
        |  FROM c1, vv),
        |oo AS (
        |  SELECT CAST(round(-ln(0.5 / (0.5*(v+1)))
        |    * 16777216.0) AS BIGINT) AS ofx FROM vv)
        |SELECT b.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(coalesce(lp.fx, bo.bfx, oo.ofx)) AS DOUBLE)
        |    / (COUNT(*) * 16777216.0) AS mean_nll
        |FROM big b
        |LEFT JOIN lp ON lp.w1 = b.w1 AND lp.w2 = b.w2
        |LEFT JOIN bo ON bo.w1 = b.w1
        |CROSS JOIN oo
        |GROUP BY b.doc_id""".stripMargin,
    "ns58_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n_token
        |           FROM t2 GROUP BY token),
        |tot AS (SELECT CAST(SUM(n_token) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
        |lp AS (
        |  SELECT token,
        |    CAST(round(-ln((n_token + 0.5) / (total + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM counts, tot)
        |SELECT t2.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 16777216.0) AS mean_nll
        |FROM t2 JOIN lp USING (token)
        |GROUP BY t2.doc_id""".stripMargin,
    // ns58's fixed-point NLL CTE aggregated per source; the weight
    // is a FIXED dag of integer-fed IEEE divisions (no exp — not
    // cross-engine bit-stable), so the gate is exact.
    "ns145_domain_reweight" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT source, token FROM toks WHERE length(token) > 0),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n_token
        |           FROM t2 GROUP BY token),
        |tot AS (SELECT CAST(SUM(n_token) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
        |lp AS (
        |  SELECT token,
        |    CAST(round(-ln((n_token + 0.5) / (total + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM counts, tot),
        |dom AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(fx) AS BIGINT) AS sum_fx
        |  FROM t2 JOIN lp USING (token) GROUP BY source),
        |alltot AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_all,
        |    CAST(SUM(sum_fx) AS BIGINT) AS fx_all FROM dom)
        |SELECT source, n_tokens, sum_fx,
        |  CAST(sum_fx AS DOUBLE)
        |    / (CAST(n_tokens AS DOUBLE) * 16777216.0) AS mean_nll,
        |  (CAST(sum_fx AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |    / (CAST(fx_all AS DOUBLE) / CAST(n_all AS DOUBLE)) AS excess,
        |  CAST(round((CAST(sum_fx AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |    / (CAST(fx_all AS DOUBLE) / CAST(n_all AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS weight_micro
        |FROM dom, alltot""".stripMargin,
    // Sliding-window chunking over the canonical token stream:
    // chunk count 1 + ceil(max(n−64, 0)/48) via the same
    // floor((x+47)/48) double arithmetic, list_slice clamps the tail
    // exactly like Spark's slice.
    "ns148_doc_chunks" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' '), x -> length(x) > 0) AS words
        |  FROM documents),
        |n AS (SELECT doc_id, words, len(words) AS nw FROM w
        |      WHERE len(words) > 0),
        |c AS (
        |  SELECT doc_id, words, nw,
        |    unnest(range(0,
        |      CAST(floor((CAST(greatest(nw - 64, 0) AS DOUBLE) + 47)
        |        / 48) AS BIGINT) + 1)) AS chunk_id
        |  FROM n)
        |SELECT doc_id, chunk_id, chunk_id * 48 AS start_word,
        |  CAST(len(list_slice(words, CAST(chunk_id * 48 + 1 AS INT),
        |    CAST(chunk_id * 48 + 64 AS INT))) AS BIGINT) AS n_words,
        |  array_to_string(list_slice(words,
        |    CAST(chunk_id * 48 + 1 AS INT),
        |    CAST(chunk_id * 48 + 64 AS INT)), ' ') AS chunk_text
        |FROM c""".stripMargin,
    // Fixed-point ln regression over the top-100 vocabulary head:
    // each ln quantized once (libm-stable), exact integer sums, the
    // closed-form slope one IEEE division of two exact BIGINTs.
    "ns157_zipf_fit" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks WHERE length(token) > 0 GROUP BY token),
        |head AS (
        |  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1048576.0)
        |      AS BIGINT) AS x,
        |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1048576.0)
        |      AS BIGINT) AS y
        |  FROM (
        |    SELECT cnt, ROW_NUMBER() OVER
        |      (ORDER BY cnt DESC, token) AS rnk
        |    FROM counts)
        |  WHERE rnk <= 100),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ranks,
        |    CAST(coalesce(SUM(x), 0) AS BIGINT) AS sum_x,
        |    CAST(coalesce(SUM(y), 0) AS BIGINT) AS sum_y,
        |    CAST(coalesce(SUM(x * y), 0) AS BIGINT) AS sum_xy,
        |    CAST(coalesce(SUM(x * x), 0) AS BIGINT) AS sum_xx
        |  FROM head)
        |SELECT n_ranks, sum_x, sum_y, sum_xy, sum_xx,
        |  CASE WHEN n_ranks * sum_xx - sum_x * sum_x > 0
        |    THEN CAST(n_ranks * sum_xy - sum_x * sum_y AS DOUBLE)
        |      / CAST(n_ranks * sum_xx - sum_x * sum_x AS DOUBLE)
        |    ELSE 0.0 END AS slope,
        |  -(CASE WHEN n_ranks * sum_xx - sum_x * sum_x > 0
        |    THEN CAST(n_ranks * sum_xy - sum_x * sum_y AS DOUBLE)
        |      / CAST(n_ranks * sum_xx - sum_x * sum_x AS DOUBLE)
        |    ELSE 0.0 END) AS zipf_exponent
        |FROM s""".stripMargin,
    // Closed-form prediction of the scrub output (the ns122
    // convention): class 0's tail collapses to ' userok' in one
    // pass, class 1's nested token re-forms after one removal and
    // needs the second pass, leaving ' '. The oracle never runs the
    // replace chain.
    "ns154_special_token_scrub" ->
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
    // One gram stream per n (the ns02 construction), multiplicity
    // kept (no DISTINCT in the stream), exact distinct counts, one
    // integer division per row.
    "ns156_ngram_diversity" ->
      """WITH docs AS (
        |  SELECT source,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |g1 AS (SELECT source, unnest(w) AS gram FROM docs),
        |a1 AS (SELECT source, CAST(1 AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS total_grams,
        |         CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams
        |       FROM g1 GROUP BY source),
        |g2 AS (SELECT source, w[i] || ' ' || w[i+1] AS gram
        |       FROM docs, UNNEST(range(1, greatest(len(w), 1))) AS t(i)),
        |a2 AS (SELECT source, CAST(2 AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS total_grams,
        |         CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams
        |       FROM g2 GROUP BY source),
        |g3 AS (SELECT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |       FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |a3 AS (SELECT source, CAST(3 AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS total_grams,
        |         CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams
        |       FROM g3 GROUP BY source),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |      UNION ALL SELECT * FROM a3)
        |SELECT source, n, total_grams, distinct_grams,
        |  CAST(distinct_grams AS DOUBLE) / CAST(total_grams AS DOUBLE)
        |    AS diversity
        |FROM u""".stripMargin,
    // The attack (latin→Cyrillic on doc_id%7==0) and the repair
    // (full confusable table → Latin) both re-derived in SQL from
    // the same public mapping; translate is per-codepoint in both
    // engines.
    "ns151_homoglyph_scrub" ->
      """WITH att AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN translate(text, 'aceopxy', 'асеорху')
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  translate(text,
        |    'аеорсхуіѕјАВЕКМНОРСТХІЅЈΑΒΕΖΗΙΚΜΝΟΡΤΥΧον',
        |    'aeopcxyisjABEKMHOPCTXISJABEZHIKMNOPTYXov') AS clean_text,
        |  translate(text,
        |    'аеорсхуіѕјАВЕКМНОРСТХІЅЈΑΒΕΖΗΙΚΜΝΟΡΤΥΧον',
        |    'aeopcxyisjABEKMHOPCTXISJABEZHIKMNOPTYXov') != text
        |    AS changed
        |FROM att""".stripMargin,
    // ns73's logit CASE table, a surface-statistics weak label, then
    // the cumulative sweep over distinct logits: every count exact,
    // each ratio one IEEE division of two exact integers.
    "ns149_pr_curve" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(-50000 + coalesce(list_sum(list_transform(toks,
        |      t -> CASE t
        |        WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |        WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |        WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |        WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |        WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |        WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |        WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |        WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |        WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |        WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS BIGINT)
        |      AS logit_micro,
        |    len(toks) AS nw,
        |    CAST(list_sum(list_transform(toks,
        |      x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS mwl
        |  FROM docs),
        |lab AS (
        |  SELECT logit_micro,
        |    (nw >= 30 AND nw <= 10000 AND mwl >= 3.0 AND mwl <= 10.0)
        |      AS label
        |  FROM scored),
        |per AS (
        |  SELECT logit_micro, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos
        |  FROM lab GROUP BY 1),
        |tot AS (SELECT CAST(coalesce(SUM(pos), 0) AS BIGINT) AS p_all
        |        FROM per),
        |cum AS (
        |  SELECT logit_micro,
        |    SUM(n) OVER (ORDER BY logit_micro DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS n_pred,
        |    SUM(pos) OVER (ORDER BY logit_micro DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
        |  FROM per)
        |SELECT logit_micro, CAST(n_pred AS BIGINT) AS n_pred,
        |  CAST(tp AS BIGINT) AS tp,
        |  CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) AS precision,
        |  CASE WHEN t.p_all > 0
        |    THEN CAST(tp AS DOUBLE) / CAST(t.p_all AS DOUBLE)
        |    ELSE 0.0 END AS recall
        |FROM cum, tot t""".stripMargin,
    // Per-domain quota oracle: same closed-form URL construction, same
    // public-suffix decision (two labels, three under a two-level
    // suffix), ns18's quota window keyed on the derived domain.
    "ns66_domain_quota" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'www.'
        |      WHEN 1 THEN 'cdn.media.' ELSE '' END ||
        |    source ||
        |    CASE doc_id % 3 WHEN 0 THEN '.co.uk'
        |      WHEN 1 THEN '.org' ELSE '.com' END ||
        |    '/p/' || doc_id AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url, '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) AS host
        |  FROM u),
        |p AS (SELECT doc_id, n_chars, host,
        |        string_split(host, '.') AS parts FROM h),
        |d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN len(parts) >= 3 AND (parts[-2] || '.' || parts[-1])
        |           IN ('co.uk', 'com.au', 'co.jp')
        |         THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
        |         WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
        |         ELSE host END AS domain
        |  FROM p)
        |SELECT domain, doc_id, n_chars, rn FROM (
        |  SELECT domain, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM d) WHERE rn <= 20""".stripMargin,
    // Perplexity-band oracle: ns58's NLL CTE verbatim, then the same
    // histogram-grid quantile cut in pure integer arithmetic —
    // bin = floor(mean_nll·2048) (2^16 bins over [0,32)), loBin/hiBin
    // the cells holding positions floor(0.1·n)+1 and ceil(0.9·n).
    "ns67_perplexity_band" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n_token
        |           FROM t2 GROUP BY token),
        |tot AS (SELECT CAST(SUM(n_token) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
        |lp AS (
        |  SELECT token,
        |    CAST(round(-ln((n_token + 0.5) / (total + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM counts, tot),
        |nll AS (
        |  SELECT t2.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 16777216.0) AS mean_nll
        |  FROM t2 JOIN lp USING (token)
        |  GROUP BY t2.doc_id),
        |binned AS (
        |  SELECT *, least(CAST(floor(mean_nll * 2048.0) AS BIGINT),
        |                  65535) AS nll_bin
        |  FROM nll),
        |cum AS (
        |  SELECT nll_bin, SUM(c) OVER (ORDER BY nll_bin) AS cum
        |  FROM (SELECT nll_bin, CAST(count(*) AS BIGINT) AS c
        |        FROM binned GROUP BY nll_bin)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM binned),
        |cuts AS (
        |  SELECT
        |    (SELECT min(nll_bin) FROM cum, n
        |      WHERE cum > CAST(floor(0.1 * n) AS BIGINT)) AS lo_bin,
        |    (SELECT min(nll_bin) FROM cum, n
        |      WHERE cum >= CAST(ceil(0.9 * n) AS BIGINT)) AS hi_bin)
        |SELECT doc_id, n_tokens, mean_nll, nll_bin
        |FROM binned, cuts
        |WHERE nll_bin BETWEEN lo_bin AND hi_bin""".stripMargin,
    // URL canonicalization oracle: rebuild the same messy URLs and
    // apply the same rules — lowercase scheme/host, strip default
    // port / fragment / tracking params, '/' for the empty path —
    // then the ns66 registrable-domain decision and the blocklist
    // anti-join, all in SQL.
    "ns68_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'https://' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
        |    source ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END ||
        |    '/p/' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&q=' || doc_id || '&fbclid=xyz'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN (scheme = 'http' AND auth LIKE '%:80')
        |            OR (scheme = 'https' AND auth LIKE '%:443')
        |          THEN regexp_replace(auth, ':[0-9]+$', '')
        |          ELSE auth END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN query = '' OR len(kept) = 0 THEN ''
        |          ELSE '?' || array_to_string(kept, '&') END) AS url_canon
        |  FROM (SELECT *,
        |          list_filter(string_split(query, '&'), p ->
        |            NOT (starts_with(p, 'utm_') OR
        |                 starts_with(p, 'fbclid=') OR
        |                 starts_with(p, 'gclid=') OR
        |                 starts_with(p, 'ref=') OR p = '')) AS kept
        |        FROM parts)),
        |dom AS (
        |  SELECT doc_id, url_canon,
        |    CASE WHEN len(hp) >= 3 AND (hp[-2] || '.' || hp[-1])
        |           IN ('co.uk', 'com.au', 'co.jp')
        |         THEN hp[-3] || '.' || hp[-2] || '.' || hp[-1]
        |         WHEN len(hp) >= 2 THEN hp[-2] || '.' || hp[-1]
        |         ELSE host END AS domain
        |  FROM (SELECT doc_id, url_canon,
        |          regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) AS host,
        |          string_split(regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1), '.') AS hp
        |        FROM canon))
        |SELECT doc_id, url_canon, domain FROM dom
        |WHERE domain NOT IN ('src3.com', 'src7.co.uk', 'src15.com')""".stripMargin,
    // Closed-form per-class formula rows: urlset entry 0 (decoded
    // query string + lastmod), later entries gated by doc_id%3 with
    // priorities, index docs' two child-sitemap rows.
    "ns137_sitemap_parse" ->
      """SELECT doc_id, 'urlset' AS kind, CAST(0 AS BIGINT) AS ord,
        |  'https://maps.example.com/p/' || doc_id ||
        |    '-0?a=' || doc_id || '&b=2' AS loc,
        |  '2026-0' || (doc_id % 9 + 1) || '-11' AS lastmod,
        |  CAST(NULL AS VARCHAR) AS priority
        |FROM documents WHERE doc_id % 8 <> 6
        |UNION ALL
        |SELECT doc_id, 'urlset', CAST(k AS BIGINT),
        |  'https://maps.example.com/p/' || doc_id || '-' || k,
        |  CAST(NULL AS VARCHAR), '0.' || ((doc_id + k) % 9 + 1)
        |FROM documents, (SELECT unnest([1, 2]) AS k)
        |WHERE doc_id % 8 <> 6 AND doc_id % 3 >= k
        |UNION ALL
        |SELECT doc_id, 'index', CAST(0 AS BIGINT),
        |  'https://maps.example.com/d/' || doc_id || '/sitemap-a.xml',
        |  '2026-01-05', CAST(NULL AS VARCHAR)
        |FROM documents WHERE doc_id % 8 = 6
        |UNION ALL
        |SELECT doc_id, 'index', CAST(1 AS BIGINT),
        |  'https://maps.example.com/d/' || doc_id || '/sitemap-b.xml',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM documents WHERE doc_id % 8 = 6""".stripMargin,
    // Fixed fixture layout → every parsed row is a formula select;
    // the orphan class (doc_id%9=4) contributes NOTHING (dropped
    // rules have no effect per RFC 9309).
    "ns135_robots_parse" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS grp, '' AS agent,
        |  'sitemap' AS directive,
        |  'https://maps.example.com/d/' || doc_id || '.xml' AS value,
        |  CAST(2 AS BIGINT) AS ord
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 1, '*', 'disallow',
        |  '/private' || doc_id || '/', 4 FROM documents
        |UNION ALL
        |SELECT doc_id, 1, '*', 'allow',
        |  '/private' || doc_id || '/ok/', 5 FROM documents
        |UNION ALL
        |SELECT doc_id, 1, '*', 'crawl-delay',
        |  CAST(doc_id % 5 + 1 AS VARCHAR), 6 FROM documents
        |UNION ALL
        |SELECT doc_id, 2, 'graftbot', 'disallow', '', 9
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 3, 'alphabot', 'disallow',
        |  '/shared' || doc_id || '/', 12 FROM documents
        |UNION ALL
        |SELECT doc_id, 3, 'betabot', 'disallow',
        |  '/shared' || doc_id || '/', 12 FROM documents""".stripMargin,
    // Longest-match verdicts in closed form: `*` (and the unknown
    // agent falling back to it) blocks /private<id>/x, allows the
    // /ok/ subtree (longer Allow wins) and /other (no match);
    // graftbot's empty Disallow matches nothing, so it may fetch
    // everything. AlphaBot probes case-insensitively into the SHARED
    // alphabot/betabot group: its own group decides (so /private is
    // ALLOWED — no `*` fallback) and /shared is blocked for it alone.
    "ns171_robots_wildcards" ->
      """SELECT doc_id, 'wildbot' AS probe_agent,
        |  p AS path,
        |  p IN ('/data/a.jsonx', '/tmp/keep', '/exactly') AS allowed
        |FROM documents,
        |  (SELECT unnest(['/data/a.json', '/data/a.jsonx', '/tmp/x',
        |    '/tmp/keep', '/exact', '/exactly']) AS p)""".stripMargin,
    "ns136_robots_decisions" ->
      """SELECT doc_id, probe_agent,
        |  CASE k WHEN 1 THEN '/private' || doc_id || '/x'
        |         WHEN 2 THEN '/private' || doc_id || '/ok/y'
        |         WHEN 3 THEN '/other'
        |         ELSE '/shared' || doc_id || '/q' END AS path,
        |  NOT ((k = 1 AND probe_agent IN ('*', 'unknownbot'))
        |    OR (k = 4 AND probe_agent = 'AlphaBot')) AS allowed
        |FROM documents,
        |  (SELECT unnest(['*', 'graftbot', 'unknownbot', 'AlphaBot'])
        |     AS probe_agent),
        |  (SELECT unnest([1, 2, 3, 4]) AS k)""".stripMargin,
    // Same md5-bucket arithmetic as the hashSplit oracles; cuts and
    // the PSM reassembly re-derived with integer // and substr.
    "ns140_fim_transform" ->
      """WITH h AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':fim1'), 1, 8)) AS BIGINT) % 1000 AS b1,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':fim2'), 1, 8)) AS BIGINT) % 1000 AS b2,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':fimr'), 1, 8)) AS BIGINT) % 1000 AS br
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n, br < 600 AND n > 0 AS applied,
        |    (least(b1, b2) * (n - 1)) // 1000 AS plen,
        |    (greatest(b1, b2) * (n - 1)) // 1000 AS tot
        |  FROM h)
        |SELECT doc_id, applied AS fim_applied,
        |  CAST(CASE WHEN applied THEN plen ELSE 0 END AS BIGINT)
        |    AS prefix_len,
        |  CAST(CASE WHEN applied THEN tot - plen ELSE 0 END AS BIGINT)
        |    AS middle_len,
        |  CASE WHEN applied THEN
        |    '<|fim_pre|>' || substr(text, 1, plen) ||
        |    '<|fim_suf|>' || substr(text, tot + 1, n - tot) ||
        |    '<|fim_mid|>' || substr(text, plen + 1, tot - plen)
        |  ELSE text END AS text_out
        |FROM c""".stripMargin,
    // One ROW_NUMBER + one running-sum window restated; the span
    // arithmetic (end - len = start) and the alternating-role
    // template must match character for character.
    "ns141_chat_loss_mask" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn,
        |    CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END
        |      AS role,
        |    '<|' ||
        |    CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END ||
        |    '|>' || event_type || ':' || event_id || '<|end|>'
        |      AS turn_text
        |  FROM t)
        |SELECT user_id, CAST(rn AS BIGINT) AS turn_rn, role, turn_text,
        |  CAST(SUM(length(turn_text)) OVER (PARTITION BY user_id
        |    ORDER BY rn) - length(turn_text) AS BIGINT) AS start_char,
        |  CAST(SUM(length(turn_text)) OVER (PARTITION BY user_id
        |    ORDER BY rn) AS BIGINT) AS end_char,
        |  role = 'assistant' AS loss
        |FROM r""".stripMargin,
    // Every arm is an existing oracle's aggregate re-shaped into
    // (metric, dim, value): ns27's volume sums, the generated
    // lang-profile CTE, ns09's five checks, ns01's fingerprint
    // groups.
    "ns139_corpus_datasheet" ->
      s"""WITH $langCte,
         |ds AS (
         |  SELECT doc_id, text, source, length(text) AS n_chars,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         |    string_split(regexp_replace(lower(trim(text)),
         |      '\\s+', ' ', 'g'), ' ') AS toks
         |  FROM documents)
         |SELECT 'docs' AS metric, source AS dim,
         |  CAST(count(*) AS BIGINT) AS value FROM ds GROUP BY source
         |UNION ALL
         |SELECT 'tokens', source, CAST(SUM(len(regexp_extract_all(
         |  text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
         |FROM ds GROUP BY source
         |UNION ALL
         |SELECT 'words', source, CAST(SUM(len(toks)) AS BIGINT)
         |FROM ds GROUP BY source
         |UNION ALL
         |SELECT 'chars', source, CAST(SUM(n_chars) AS BIGINT)
         |FROM ds GROUP BY source
         |UNION ALL
         |SELECT 'lang_docs', lang_pred, CAST(count(*) AS BIGINT)
         |FROM (SELECT $langPredExpr AS lang_pred FROM langp)
         |GROUP BY lang_pred
         |UNION ALL
         |SELECT 'gopher_pass', 'corpus', CAST(count(*) AS BIGINT)
         |FROM (
         |  SELECT n_chars, len(toks) AS n_words,
         |    CAST(length(replace(norm, ' ', '')) AS DOUBLE)
         |      / len(toks) AS awl,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
         |      AS DOUBLE) / n_chars AS punct,
         |    CAST(len(list_filter(toks, t -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'],
         |      t))) AS DOUBLE) / len(toks) AS sw
         |  FROM ds)
         |WHERE n_chars BETWEEN 50 AND 100000
         |  AND n_words BETWEEN 10 AND 50000
         |  AND awl BETWEEN 2.0 AND 12.0 AND punct <= 0.2
         |  AND sw >= 0.01
         |UNION ALL
         |SELECT 'dup_groups', 'corpus',
         |  CAST(count(DISTINCT md5(norm)) AS BIGINT) FROM ds""".stripMargin,
    // s15: ns138's funnel reduced to the DISTINCT unseen canonical
    // set — the drained streaming sink (stream-static anti join +
    // cross-batch stateful dedup) must equal it exactly.
    "s15_stream_frontier" ->
      """WITH u0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'https://' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
        |    source ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END ||
        |    '/p/' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&q=' || doc_id || '&fbclid=xyz'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, url FROM u0
        |  UNION ALL
        |  SELECT doc_id + 3000000, url || '#dup' FROM u0
        |  WHERE doc_id % 6 = 3),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN (scheme = 'http' AND auth LIKE '%:80')
        |            OR (scheme = 'https' AND auth LIKE '%:443')
        |          THEN regexp_replace(auth, ':[0-9]+$', '')
        |          ELSE auth END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN query = '' OR len(kept) = 0 THEN ''
        |          ELSE '?' || array_to_string(kept, '&') END) AS url_canon
        |  FROM (SELECT *,
        |          list_filter(string_split(query, '&'), p ->
        |            NOT (starts_with(p, 'utm_') OR
        |                 starts_with(p, 'fbclid=') OR
        |                 starts_with(p, 'gclid=') OR
        |                 starts_with(p, 'ref=') OR p = '')) AS kept
        |        FROM parts))
        |SELECT DISTINCT url_canon FROM canon
        |WHERE url_canon NOT IN (
        |  SELECT url_canon FROM canon
        |  WHERE doc_id % 2 = 0 AND doc_id < 3000000)""".stripMargin,
    // Batch-vs-store re-derived: one canon CTE over base ∪ twins;
    // the stored seen-set is its even-base-id slice, the delta the
    // deduped batch anti-joined against it.
    "ns138_frontier_delta" ->
      """WITH u0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'https://' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
        |    source ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END ||
        |    '/p/' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&q=' || doc_id || '&fbclid=xyz'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, url FROM u0
        |  UNION ALL
        |  SELECT doc_id + 3000000, url || '#dup' FROM u0
        |  WHERE doc_id % 6 = 3),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN (scheme = 'http' AND auth LIKE '%:80')
        |            OR (scheme = 'https' AND auth LIKE '%:443')
        |          THEN regexp_replace(auth, ':[0-9]+$', '')
        |          ELSE auth END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN query = '' OR len(kept) = 0 THEN ''
        |          ELSE '?' || array_to_string(kept, '&') END) AS url_canon
        |  FROM (SELECT *,
        |          list_filter(string_split(query, '&'), p ->
        |            NOT (starts_with(p, 'utm_') OR
        |                 starts_with(p, 'fbclid=') OR
        |                 starts_with(p, 'gclid=') OR
        |                 starts_with(p, 'ref=') OR p = '')) AS kept
        |        FROM parts)),
        |ded AS (
        |  SELECT url_canon, min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS n_variants
        |  FROM canon GROUP BY url_canon)
        |SELECT doc_id, url_canon, n_variants FROM ded
        |WHERE url_canon NOT IN (
        |  SELECT url_canon FROM canon
        |  WHERE doc_id % 2 = 0 AND doc_id < 3000000)""".stripMargin,
    // The full frontier funnel re-derived: ns68's url/parts/canon
    // CTEs over the base ∪ fragment-twin union, dedup on the
    // canonical form, domain extraction, blocklist, and the
    // politeness window — independent SQL end to end.
    "ns134_crawl_frontier" -> crawlFrontierSql,
    // The frontier funnel verbatim plus the closed-form prediction
    // of the parsed per-domain Crawl-delay and the slot arithmetic.
    "ns167_fetch_schedule" ->
      s"""WITH f AS ($crawlFrontierSql)
         |SELECT doc_id, url_canon, domain, rn,
         |  CAST(length(domain) % 5 + 1 AS BIGINT) AS delay_s,
         |  CAST((rn - 1) * (length(domain) % 5 + 1) AS BIGINT)
         |    AS fetch_offset_s
         |FROM f""".stripMargin,
    // Per-doc argmax restated relationally: unnest each n-gram table,
    // count, rank (count desc, gram asc). The double is one division
    // of two exact integers — deterministic across engines (ns20's
    // proven trick).
    "ns70_topgram_repetition" ->
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
        |  FROM g2 GROUP BY doc_id, gram),
        |g3 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks) - 1), i ->
        |    array_to_string(toks[i:i+2], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 3),
        |t3 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g3 GROUP BY doc_id, gram),
        |g4 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks) - 2), i ->
        |    array_to_string(toks[i:i+3], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 4),
        |t4 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g4 GROUP BY doc_id, gram)
        |SELECT b.doc_id,
        |  t2.gram AS top2_gram,
        |  coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top2_frac,
        |  t3.gram AS top3_gram,
        |  coalesce(CAST(t3.c * length(t3.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top3_frac,
        |  t4.gram AS top4_gram,
        |  coalesce(CAST(t4.c * length(t4.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top4_frac
        |FROM base b
        |LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |  USING (doc_id)
        |LEFT JOIN (SELECT doc_id, gram, c FROM t3 WHERE rn = 1) t3
        |  USING (doc_id)
        |LEFT JOIN (SELECT doc_id, gram, c FROM t4 WHERE rn = 1) t4
        |  USING (doc_id)""".stripMargin,
    // Replays the registered fixture construction (sentence breaks +
    // injected rule-exercising tails), then the identical regex-free
    // line predicates via list_filter.
    "ns71_c4_line_filter" ->
      """WITH built AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' table ', '.' || chr(10), 'g')
        |    || CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet placeholder text here.'
        |      ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |      'function f() { return 1; }' ELSE '' END
        |    || chr(10) || 'too short.'
        |    || chr(10) ||
        |    'this is a good closing sentence for the document.' AS t
        |  FROM documents),
        |ls AS (SELECT doc_id,
        |    list_transform(string_split(t, chr(10)),
        |      l -> trim(l)) AS lines
        |  FROM built),
        |k AS (SELECT doc_id, len(lines) AS n_lines,
        |    list_filter(lines, l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
        |        OR l LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '),
        |        w -> length(w) > 0)) >= 5
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS keep
        |  FROM ls)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS clean_text,
        |  CAST(len(keep) AS BIGINT) AS n_kept,
        |  CAST(n_lines - len(keep) AS BIGINT) AS n_dropped
        |FROM k WHERE len(keep) >= 3""".stripMargin,
    // The generated lang-profile CTE + ns18's quota window, composed
    // (re-gated on the ns121 predictions since round 11).
    "ns72_lang_balanced_quota" ->
      s"""WITH $langCte,
         |final AS (
         |  SELECT doc_id, n_chars, $langPredExpr AS lang_pred
         |  FROM langp)
         |SELECT doc_id, n_chars, lang_pred, rn FROM (
         |  SELECT doc_id, n_chars, lang_pred,
         |    ROW_NUMBER() OVER (PARTITION BY lang_pred
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM final)
         |WHERE rn <= 40""".stripMargin,
    // Closed-form HTML fixture: every page byte is a formula of
    // (doc_id, text), so the oracle predicts extraction WITHOUT
    // parsing HTML — kept blocks are exactly the >=30-char 12-word
    // chunks plus the entity paragraph; pages with doc_id % 17 = 3
    // are the unterminated-script quarantine subset. If the Spark
    // extractor mis-orders script stripping, leaks entities, or
    // mis-splits blocks, the predicted text/counts diverge.
    "ns105_html_extract" ->
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
        |  CASE WHEN d.doc_id % 17 = 3 THEN 'malformed' ELSE 'ok' END
        |    AS status,
        |  CASE WHEN d.doc_id % 17 = 3 THEN NULL
        |       ELSE CAST(a.nc + 5 AS BIGINT) END AS n_blocks,
        |  CASE WHEN d.doc_id % 17 = 3 THEN NULL
        |       ELSE CAST(a.nk + 1 AS BIGINT) END AS n_kept,
        |  CASE WHEN d.doc_id % 17 = 3 THEN NULL
        |       ELSE CASE WHEN a.kept IS NULL THEN ''
        |            ELSE a.kept || chr(10) END
        |         || 'Q&A <tags> and entities stay readable after ' ||
        |         'decoding in doc ' || CAST(d.doc_id AS VARCHAR)
        |  END AS main_text
        |FROM documents d JOIN agg a USING (doc_id)""".stripMargin,
    // Full independent recomputation: DuckDB rebuilds the planted
    // input and reruns the entire stat battery with its own
    // list/regex ops (not a closed-form prediction); the keep
    // verdict applies the same published thresholds.
    "ns129_code_quality" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN text
        |      WHEN 1 THEN replace(text, ' ', chr(10)) || chr(10) ||
        |        '# note ' || doc_id || chr(10) || '// todo ' || doc_id
        |      WHEN 2 THEN text || chr(10) || repeat('=', 3000)
        |      ELSE text || chr(10) || '// auto-generated do not edit'
        |        || chr(10) || '-- generated by tool ' || doc_id
        |    END AS t
        |  FROM documents),
        |ls AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines
        |  FROM src),
        |st AS (SELECT doc_id, t, len(lines) AS n,
        |    list_max(list_transform(lines, l -> length(l))) AS maxl,
        |    len(list_filter(lines, l ->
        |      starts_with(trim(l), '#') OR starts_with(trim(l), '//')
        |      OR starts_with(trim(l), '--') OR starts_with(trim(l), ';')
        |      OR starts_with(trim(l), '/*')
        |      OR starts_with(trim(l), '*'))) AS nc,
        |    length(t) AS chars,
        |    length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g')) AS alnum,
        |    (contains(lower(t), 'auto-generated')
        |      OR contains(lower(t), 'autogenerated')
        |      OR contains(lower(t), 'do not edit')
        |      OR contains(lower(t), 'generated by')) AS autogen
        |  FROM ls)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_lines,
        |  CAST(maxl AS BIGINT) AS max_line_len,
        |  (chars - (n - 1)) / n AS avg_line_len,
        |  nc / n AS comment_line_frac,
        |  alnum / chars AS alnum_frac,
        |  autogen,
        |  (maxl <= 1000 AND (chars - (n - 1)) / n <= 100.0
        |    AND alnum / chars >= 0.25 AND NOT autogen) AS keep
        |FROM st""".stripMargin,
    // Union of the three arms' existing closed-form predictions:
    // the html arm is ns105's formula (quarantine nulls included)
    // restricted to doc_id%3=0, the markdown arm ns128's formula on
    // %3=1, the plain arm whitespace normalization on %3=2. A
    // misrouted document lands in the wrong arm and breaks the hash.
    "ns131_format_router" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(trim(text), '\s+', ' ', 'g'),
        |      ' ') AS ws,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS nt
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, ws,
        |    unnest(range(CAST(ceil(len(ws) / 12.0) AS BIGINT))) AS k
        |  FROM words WHERE doc_id % 3 = 0),
        |ct AS (
        |  SELECT doc_id, k,
        |    array_to_string(list_slice(ws, k*12+1, k*12+12), ' ') AS ctext
        |  FROM chunks),
        |agg AS (
        |  SELECT doc_id,
        |    string_agg(ctext, chr(10) ORDER BY k)
        |      FILTER (WHERE length(ctext) >= 30) AS kept
        |  FROM ct GROUP BY doc_id),
        |html_arm AS (
        |  SELECT w.doc_id, 'html' AS fmt,
        |    CASE WHEN w.doc_id % 17 = 3 THEN NULL
        |      ELSE CASE WHEN a.kept IS NULL THEN ''
        |           ELSE a.kept || chr(10) END
        |        || 'Q&A <tags> and entities stay readable after ' ||
        |        'decoding in doc ' || CAST(w.doc_id AS VARCHAR)
        |    END AS text_out
        |  FROM words w JOIN agg a USING (doc_id)
        |  WHERE w.doc_id % 3 = 0),
        |md_arm AS (
        |  SELECT doc_id, 'markdown' AS fmt,
        |    'Doc ' || doc_id || ' ' || nt ||
        |    ' notes with bold' || doc_id || ' and code' || doc_id ||
        |    ' inline first item ' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN ' second fig ' || doc_id || ' shown'
        |      ELSE ' second shown' END ||
        |    ' col val' || doc_id || ' a' || doc_id || ' b' AS text_out
        |  FROM words WHERE doc_id % 3 = 1),
        |plain_arm AS (
        |  SELECT doc_id, 'plain' AS fmt, nt AS text_out
        |  FROM words WHERE doc_id % 3 = 2)
        |SELECT * FROM html_arm
        |UNION ALL SELECT * FROM md_arm
        |UNION ALL SELECT * FROM plain_arm""".stripMargin,
    // Closed-form markdown fixture: the oracle rebuilds the
    // extractor's exact output by string formula — header text, the
    // document prose, dequoted/de-emphasized notes, link/image texts,
    // table cells — with the fenced blocks (and the id%13==5
    // unterminated tail) contributing NOTHING. A late fence strip, a
    // reversed image/link order, or a leaked marker all break the
    // hash.
    "ns128_markdown_extract" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS nt
        |  FROM documents)
        |SELECT doc_id,
        |  'Doc ' || doc_id || ' ' || nt ||
        |  ' notes with bold' || doc_id || ' and code' || doc_id ||
        |  ' inline first item ' || doc_id ||
        |  CASE WHEN doc_id % 2 = 0
        |    THEN ' second fig ' || doc_id || ' shown'
        |    ELSE ' second shown' END ||
        |  ' col val' || doc_id || ' a' || doc_id || ' b' AS md_text,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_links,
        |  CAST(CASE WHEN doc_id % 13 = 5 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_code_spans
        |FROM norm""".stripMargin,
    // The same fixed micro-weight table inlined as a CASE lambda;
    // integer sums are order-independent, so logit_micro hash-gates.
    "ns73_linear_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_transform(toks, t -> CASE t
        |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |    WHEN 'http' THEN -60000 ELSE NULL END) AS ws
        |  FROM base)
        |SELECT doc_id,
        |  CAST(len(list_filter(ws, x -> x IS NOT NULL)) AS BIGINT)
        |    AS n_hits,
        |  CAST(-50000 + coalesce(list_sum(list_transform(ws,
        |    x -> coalesce(x, 0))), 0) AS BIGINT) AS logit_micro,
        |  (-50000 + coalesce(list_sum(list_transform(ws,
        |    x -> coalesce(x, 0))), 0)) > 0 AS keep
        |FROM w""".stripMargin,
    // ns09's score CTE + ns73's weight CASE + ns70's 2-gram argmax,
    // composed; every vote is an integer/exact-division comparison.
    "ns78_quality_ensemble" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(CAST(n_chars BETWEEN 50 AND 100000 AS INT)
        |       + CAST(n_words BETWEEN 10 AND 50000 AS INT)
        |       + CAST(avg_word_len BETWEEN 2.0 AND 12.0 AS INT)
        |       + CAST(punct_ratio <= 0.2 AS INT)
        |       + CAST(stopword_ratio >= 0.01 AS INT) AS DOUBLE) / 5
        |      AS quality_score
        |  FROM stats),
        |lg AS (
        |  SELECT doc_id, -50000 + coalesce(list_sum(
        |    list_transform(toks, t -> CASE t
        |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |    WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS logit
        |  FROM base),
        |g2 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks)), i ->
        |    array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 2),
        |t2 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram),
        |rep AS (
        |  SELECT b.doc_id,
        |    coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |      / length(b.norm), 0.0) AS top2_frac
        |  FROM base b
        |  LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |    USING (doc_id))
        |SELECT s.doc_id,
        |  s.quality_score >= 0.6 AS q_ok,
        |  l.logit > 0 AS logit_ok,
        |  r.top2_frac <= 0.2 AS rep_ok,
        |  CAST(CAST(s.quality_score >= 0.6 AS INT)
        |     + CAST(l.logit > 0 AS INT)
        |     + CAST(r.top2_frac <= 0.2 AS INT) AS BIGINT) AS votes,
        |  CAST(s.quality_score >= 0.6 AS INT)
        |     + CAST(l.logit > 0 AS INT)
        |     + CAST(r.top2_frac <= 0.2 AS INT) >= 2 AS keep
        |FROM scored s
        |JOIN lg l USING (doc_id)
        |JOIN rep r USING (doc_id)""".stripMargin,
    // Smoothed symmetric-KL contributions with the identical operand
    // order; every libm input is a ratio of exact integers.
    "ns79_vocab_drift" ->
      """WITH oldtok AS (
        |  SELECT t AS token FROM (
        |    SELECT unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS t
        |    FROM documents WHERE doc_id % 10 != 3)
        |  WHERE length(t) > 0),
        |newtok AS (
        |  SELECT t AS token FROM (
        |    SELECT unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0),
        |ca AS (SELECT token, count(*) AS n_old FROM oldtok GROUP BY 1),
        |cb AS (SELECT token, count(*) AS n_new FROM newtok GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ca.token, cb.token) AS token,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        |tot AS (
        |  SELECT CAST(sum(n_old) AS BIGINT) AS ta,
        |    CAST(sum(n_new) AS BIGINT) AS tb, count(*) AS v FROM j)
        |SELECT token, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CAST(round((
        |    (n_old + 0.5) / (ta + 0.5 * (v + 1.0))
        |      * ln(((n_old + 0.5) / (ta + 0.5 * (v + 1.0)))
        |         / ((n_new + 0.5) / (tb + 0.5 * (v + 1.0))))
        |    + (n_new + 0.5) / (tb + 0.5 * (v + 1.0))
        |      * ln(((n_new + 0.5) / (tb + 0.5 * (v + 1.0)))
        |         / ((n_old + 0.5) / (ta + 0.5 * (v + 1.0))))
        |  ) * 16777216.0) AS BIGINT) AS skl_fx
        |FROM j CROSS JOIN tot
        |ORDER BY skl_fx DESC, token LIMIT 50""".stripMargin,
    // ns21's word split, the ns17 md5-prefix cell, exact counts.
    // DSIR resampling: ns98's feature-grid CTE, per-cell smoothed
    // nano log ratios (each ln floored ONCE — the ns58 idiom), the
    // exact integer per-doc fold, the md5-derived Gumbel key on the
    // same nano scale, and the PERCENTILE_DISC(0.7) keep cut.
    "ns182_dsir_resample" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok || ':fh'), 1, 8)) AS BIGINT)
        |      % 1024 AS cell,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2),
        |tfeat AS (
        |  SELECT f.cell, CAST(sum(f.cnt) AS BIGINT) AS t
        |  FROM feat f JOIN documents d USING (doc_id)
        |  WHERE d.source IN ('src1', 'src3') GROUP BY 1),
        |bcells AS (SELECT cell, CAST(sum(cnt) AS BIGINT) AS b
        |  FROM feat GROUP BY 1),
        |tot AS (SELECT (SELECT sum(b) FROM bcells) AS bt,
        |  (SELECT sum(t) FROM tfeat) AS tt),
        |lr AS (SELECT bc.cell,
        |    CAST(floor(ln((coalesce(tf.t, 0) + 1.0) / (tt + 1024.0))
        |      * 1e9) AS BIGINT)
        |    - CAST(floor(ln((bc.b + 1.0) / (bt + 1024.0)) * 1e9)
        |      AS BIGINT) AS lr
        |  FROM bcells bc LEFT JOIN tfeat tf USING (cell), tot),
        |lw AS (SELECT f.doc_id,
        |    CAST(sum(f.cnt * lr.lr) AS BIGINT) AS logw_nano
        |  FROM feat f JOIN lr USING (cell) GROUP BY 1),
        |k AS (SELECT doc_id, logw_nano,
        |    CAST(floor(-ln(-ln(
        |      (CAST(('0x' || substr(md5(doc_id || ':dsir'), 1, 8))
        |        AS BIGINT) + 0.5) / 4294967296.0)) * 1e9) AS BIGINT)
        |      AS gumbel_nano
        |  FROM lw),
        |kb AS (SELECT doc_id, logw_nano, gumbel_nano,
        |    logw_nano + gumbel_nano AS key_nano,
        |    CAST(floor(CAST(logw_nano + gumbel_nano AS DOUBLE)
        |      / 16777216.0) AS BIGINT) AS bucket
        |  FROM k),
        |c AS (SELECT PERCENTILE_DISC(0.7) WITHIN GROUP
        |    (ORDER BY bucket) AS cut FROM kb)
        |SELECT doc_id, logw_nano, gumbel_nano, key_nano,
        |  bucket >= cut AS selected
        |FROM kb, c""".stripMargin,
    "ns98_feature_hashing" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(('0x' || substr(md5(tok || ':fh'), 1, 8)) AS BIGINT)
        |    % 1024 AS cell,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM toks GROUP BY 1, 2""".stripMargin,
    // n-gram table oracle: the ns02 gram CTE without DISTINCT
    // (occurrence counts, not document frequency); the (n desc, gram
    // asc) tiebreak makes the top-100 cut deterministic.
    "ns46_ngram_topk" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i))
        |SELECT gram, CAST(count(*) AS BIGINT) AS n
        |FROM grams GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 100""".stripMargin,
  )
}
