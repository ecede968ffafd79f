package graft.oracles

/** DuckDB oracle SQL for end-to-end pipeline restatements (p01-p05) — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object PipelineOracles {

  /** The p10/p14 shared survivor token lens: the checked-in
    * independent (Python twin) token table restricted to survivors —
    * the conv%13==0 broken-export class and the natural-empty gate
    * (round-13 ADVICE: a conversation whose first-3-words canonical
    * content strips to empty drops at the engine's n_empty battery
    * column — modeled so the oracle stays closed-form under fixture
    * regeneration, not just under the current corpus where no
    * doc_id < 100 hits it). */
  private val sftLensCte: String =
    """lens AS (
      |  SELECT conversation_id,
      |    CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_loss_tokens
      |  FROM read_parquet(
      |'/root/repo/src/test/resources/graft/sft_oracle_sf001.parquet')
      |  WHERE conversation_id % 13 <> 0
      |    AND conversation_id NOT IN (
      |      SELECT doc_id FROM documents
      |      WHERE trim(regexp_replace(array_to_string(
      |          string_split(regexp_replace(lower(trim(text)),
      |            '\s+', ' ', 'g'), ' ')[1:3], ' '),
      |          '[^a-z0-9 ]', '', 'g')) = '')
      |  GROUP BY 1)""".stripMargin

  val sql: Map[String, String] = Map(
    // Incremental-curation oracle: same snapshot pair, raw-md5 delta
    // (snapshotDiff semantics), p03's gate SQL over delta and store,
    // ns25's NOT EXISTS anti-join, ns17's split buckets.
    "p04_incremental_curation" ->
      """WITH oldsnap AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3),
        |newsnap AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 != 7),
        |delta AS (
        |  SELECT n.doc_id, n.text FROM newsnap n
        |  LEFT JOIN oldsnap o ON n.doc_id = o.doc_id
        |  WHERE o.doc_id IS NULL OR md5(o.text) != md5(n.text)),
        |obase AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM oldsnap),
        |okeep AS (
        |  SELECT doc_id, md5(norm) AS fingerprint FROM obase
        |  WHERE length(text) BETWEEN 50 AND 100000
        |    AND len(toks) BETWEEN 10 AND 50000
        |    AND CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)/length(text) <= 0.2
        |    AND CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)/len(toks) >= 0.01
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) > 0),
        |store AS (SELECT DISTINCT fingerprint FROM okeep),
        |dbase AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM delta),
        |dkeep AS (
        |  SELECT doc_id, md5(norm) AS fingerprint FROM dbase
        |  WHERE length(text) BETWEEN 50 AND 100000
        |    AND len(toks) BETWEEN 10 AND 50000
        |    AND CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)/length(text) <= 0.2
        |    AND CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)/len(toks) >= 0.01
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) > 0),
        |fresh AS (
        |  SELECT k.fingerprint, k.doc_id FROM dkeep k
        |  WHERE NOT EXISTS (SELECT 1 FROM store s
        |                    WHERE s.fingerprint = k.fingerprint)),
        |adm AS (
        |  SELECT min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM fresh GROUP BY fingerprint)
        |SELECT doc_id, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p04split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p04split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM adm""".stripMargin,
    // Blocklist gate (pattern-agnostic contains, the ns87
    // convention) + ns71's line filter + exact dedup on the cleaned
    // text + ns73's weight CASE + ns18's quota window, chained.
    "p05_curation_v2" ->
      """WITH built AS (
        |  SELECT d.doc_id, d.source,
        |    regexp_replace(d.text, ' table ', '.' || chr(10), 'g')
        |    || CASE WHEN d.doc_id % 7 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet placeholder text here.'
        |      ELSE '' END
        |    || CASE WHEN d.doc_id % 11 = 0 THEN chr(10) ||
        |      'function f() { return 1; }' ELSE '' END
        |    || CASE WHEN d.doc_id % 13 = 0 THEN chr(10) ||
        |      'click here blk:spam to claim your prize now.'
        |      ELSE '' END
        |    || chr(10) || 'too short.'
        |    || chr(10) ||
        |    'this is a good closing sentence for the document.' AS t
        |  FROM documents d),
        |bgate AS (SELECT * FROM built
        |  WHERE NOT contains(t, 'blk:spam')
        |    AND NOT contains(t, 'blk:scam')),
        |ls AS (SELECT doc_id, source,
        |    list_transform(string_split(t, chr(10)),
        |      l -> trim(l)) AS lines
        |  FROM bgate),
        |k AS (SELECT doc_id, source,
        |    list_filter(lines, l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
        |        OR l LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '),
        |        w -> len(w) > 0)) >= 5
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS keep
        |  FROM ls),
        |clean AS (SELECT doc_id, source,
        |    array_to_string(keep, chr(10)) AS clean_text,
        |    CAST(len(keep) AS BIGINT) AS n_kept
        |  FROM k WHERE len(keep) >= 3),
        |fp AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(clean_text)),
        |      '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rnfp
        |  FROM clean),
        |surv AS (SELECT doc_id, source, clean_text, n_kept
        |  FROM fp WHERE rnfp = 1),
        |lg AS (SELECT doc_id, -50000 + coalesce(list_sum(
        |    list_transform(string_split(regexp_replace(
        |      lower(trim(clean_text)), '\s+', ' ', 'g'), ' '),
        |    t -> CASE t
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
        |  FROM surv),
        |keepq AS (SELECT s.doc_id, s.source, s.n_kept,
        |    CAST(l.logit AS BIGINT) AS logit_micro
        |  FROM surv s JOIN lg l USING (doc_id) WHERE l.logit > 0)
        |SELECT doc_id, source, n_kept, logit_micro, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_kept DESC, doc_id) AS rn
        |  FROM keepq)
        |WHERE rn <= 20""".stripMargin,
    // The polite-crawl funnel re-derived end to end: ns134's
    // url/parts/canon CTEs, then the RFC 9309 longest-match verdict
    // in closed form (.co.uk domains disallow /p/ for graftbot with
    // an Allow /p/1 carve-out, so the path's leading digit decides),
    // dedup with variant multiplicity, the domain blocklist, the
    // politeness window, and the seen-set anti-join last (slots are
    // reserved before the seen filter, matching the engine).
    // p10: the SFT chain's closed forms composed — survivors are the
    // good (%17<>0) conversations under 100 minus the planted
    // broken-export class (%13==0, dropped by the quality gate; its
    // re-upload twin drops with it, and every surviving group's
    // min-id survivor is the base id), with lens from the
    // independent encoder's table and ns180's pack window.
    "p10_sft_assembly" ->
      s"""WITH $sftLensCte
        |SELECT conversation_id, n_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY conversation_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(coalesce(SUM(n_tokens) OVER (
        |    ORDER BY conversation_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS DOUBLE) / 256) AS BIGINT) AS pack_id,
        |  n_loss_tokens
        |FROM lens""".stripMargin,
    // p14 (r15): every layout stage's closed form composed over the
    // same independent token lens — interleave keys from the
    // smooth-WRR midpoint formula, the ∥-packed order scalar,
    // offsets as a running sum in that order, segments as interval
    // arithmetic over pack boundaries, and the (length desc, id)
    // rectangular-batch assignment.
    "p14_dataloader_manifest" ->
      s"""WITH $sftLensCte,
        |src AS (
        |  SELECT l.conversation_id, l.n_tokens, l.n_loss_tokens,
        |    d.source
        |  FROM lens l JOIN documents d
        |    ON d.doc_id = l.conversation_id),
        |sched AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY conversation_id) AS rin,
        |    count(*) OVER (PARTITION BY source) AS nsrc
        |  FROM src),
        |keyed AS (
        |  SELECT *, ((2 * rin - 1) * 1000000) // nsrc
        |      AS interleave_key,
        |    CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT)
        |      AS srcnum
        |  FROM sched),
        |ordd AS (
        |  SELECT *, interleave_key * 1099511627776
        |    + srcnum * 4294967296 + conversation_id AS o
        |  FROM keyed),
        |off AS (
        |  SELECT *, CAST(coalesce(SUM(n_tokens) OVER (ORDER BY o
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset
        |  FROM ordd),
        |seg0 AS (
        |  SELECT *, unnest(range(start_offset // 256,
        |    (start_offset + n_tokens - 1) // 256 + 1)) AS pack_id
        |  FROM off WHERE n_tokens > 0),
        |lb AS (
        |  SELECT conversation_id,
        |    (row_number() OVER (ORDER BY n_tokens DESC,
        |      conversation_id) - 1) // 8 AS length_batch_id
        |  FROM src)
        |SELECT s.pack_id, s.conversation_id,
        |  greatest(s.start_offset, s.pack_id * 256) - s.pack_id * 256
        |    AS seg_start,
        |  least(s.start_offset + s.n_tokens, (s.pack_id + 1) * 256)
        |    - greatest(s.start_offset, s.pack_id * 256) AS seg_len,
        |  s.source, s.interleave_key, s.n_tokens, s.n_loss_tokens,
        |  lb.length_batch_id
        |FROM seg0 s JOIN lb USING (conversation_id)""".stripMargin,
    // p11: the pair round re-derived stage by stage — caption/image
    // universes with the broken-link and re-upload plantings, the
    // ns73 logit + p03 lang gates on the caption, ns63's grid CTEs
    // recomputing every surviving pair's dHash VALUE from the seed
    // formula (no injectivity assumed anywhere), then both dedup
    // group-bys and the min-of-both-groups survivor join.
    "p11_pair_curation" ->
      """WITH caps0 AS (
        |  SELECT doc_id AS pair_id, text AS caption
        |  FROM documents WHERE doc_id < 120),
        |caps AS (
        |  SELECT pair_id, caption FROM caps0
        |  UNION ALL
        |  SELECT pair_id + 100000, caption FROM caps0
        |  WHERE pair_id % 10 = 0),
        |imgs AS (
        |  SELECT pair_id, CAST((pair_id // 2) * 1000 AS BIGINT) AS seed
        |  FROM caps0 WHERE pair_id % 23 <> 1
        |  UNION ALL
        |  SELECT pair_id + 100000,
        |    CAST(pair_id * 7919 + 123456 AS BIGINT)
        |  FROM caps0 WHERE pair_id % 10 = 0),
        |n0 AS (
        |  SELECT c.pair_id, i.seed,
        |    regexp_replace(lower(trim(c.caption)), '\s+', ' ', 'g')
        |      AS normc,
        |    string_split(regexp_replace(lower(trim(c.caption)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM caps c JOIN imgs i USING (pair_id)),
        |sc AS (
        |  SELECT pair_id, seed, normc,
        |    -50000 + coalesce(list_sum(list_transform(toks,
        |      t -> CASE t
        |      WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |      WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |      WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |      WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |      WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |      WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |      WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |      WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |      WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |      WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS logit,
        |    len(list_filter(toks, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it'],
        |      t))) AS en,
        |    len(list_filter(toks, t -> list_contains(
        |      ['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(
        |      ['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(
        |      ['el','los','las','y','es','una','por'], t))) AS es
        |  FROM n0),
        |gate AS (
        |  -- v2 (r15) cross-modal mismatch gate, closed form: matched
        |  -- pairs score nnz*127^2 with nnz = 8 - #{j: (7*pid+j) mod 3
        |  -- = 1} in {5,6} (>= 80645 >= threshold 40000); the planted
        |  -- wrong-image class (pid % 17 = 3, image embedding of key
        |  -- pid+1) scores -#{j: (7*pid+j) mod 3 = 2}*127^2 < 0 — so
        |  -- the int8-cosine gate keeps exactly pid % 17 <> 3
        |  SELECT pair_id, seed, normc FROM sc
        |  WHERE logit > 0 AND en >= de AND en >= fr AND en >= es
        |    AND en > 0 AND pair_id % 17 <> 3),
        |cells AS (
        |  SELECT pair_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM gate, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.pair_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.pair_id = r.pair_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT g2.pair_id, g2.normc,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM gate g2 LEFT JOIN bits USING (pair_id) GROUP BY 1, 2),
        |dh AS (
        |  SELECT pair_id, normc,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT)
        |      AS dhash
        |  FROM hv),
        |ig AS (SELECT dhash, min(pair_id) AS pair_id,
        |    CAST(count(*) AS BIGINT) AS n_image_dups
        |  FROM dh GROUP BY 1),
        |fg AS (SELECT md5(normc) AS fp, min(pair_id) AS pair_id,
        |    CAST(count(*) AS BIGINT) AS n_caption_dups
        |  FROM dh GROUP BY 1)
        |SELECT ig.pair_id, ig.dhash, ig.n_image_dups,
        |  fg.n_caption_dups
        |FROM ig JOIN fg USING (pair_id)""".stripMargin,
    // p13: the audio round re-derived from the planting formulas
    // alone — corrupt-magic class absent, windows and islands
    // replayed (the ns197 idiom), both gates applied, and exact
    // dedup grouped by the parameter tuple (writeWav is pure, so
    // byte-identity ⇔ parameter-group identity).
    // p13 v2 (r15): the 8 kHz saw lane replays exactly as before
    // (exact-only dedup, n_variants 1); the 16 kHz sine lane's
    // fingerprint words are recomputed from the md5-activity
    // formula (amplitude-invariant), and the near-dup collapse —
    // amplitude re-encodes merging onto their originals — replays
    // as a GROUP BY on the recomputed word.
    "p13_audio_curation" ->
      """WITH ids AS (
        |  SELECT i AS clip_id, i // 2 AS g FROM range(0, 150) t(i)
        |  WHERE i % 9 <> 4),
        |par AS (
        |  SELECT clip_id, g, 10 + 2 * (g % 6) AS nw,
        |    CAST((1600 + (g % 6) * 320) // 8 AS BIGINT)
        |      AS duration_ms
        |  FROM ids),
        |w AS (
        |  SELECT clip_id, g, nw, duration_ms, wi
        |  FROM par, range(0, 20) tw(wi)
        |  WHERE wi < nw AND g % 5 <> 0 AND wi % 4 <> g % 4),
        |agg AS (
        |  SELECT clip_id, g, min(nw) AS nw,
        |    min(duration_ms) AS duration_ms,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM w GROUP BY 1, 2),
        |isl AS (
        |  SELECT clip_id,
        |    wi - row_number() OVER (PARTITION BY clip_id ORDER BY wi)
        |      AS grp
        |  FROM w),
        |nseg AS (
        |  SELECT clip_id, CAST(count(DISTINCT grp) AS BIGINT)
        |    AS n_segments
        |  FROM isl GROUP BY 1),
        |gated AS (
        |  SELECT a.clip_id, a.g, a.duration_ms,
        |    CAST(a.nw AS BIGINT) AS n_windows, a.n_active,
        |    s.n_segments
        |  FROM agg a JOIN nseg s USING (clip_id)
        |  WHERE a.duration_ms >= 300 AND a.n_active * 2 >= a.nw),
        |lane8 AS (
        |  SELECT min(clip_id) AS clip_id,
        |    CAST(8000 AS INTEGER) AS sample_rate,
        |    min(duration_ms) AS duration_ms,
        |    min(n_windows) AS n_windows, min(n_active) AS n_active,
        |    min(n_segments) AS n_segments,
        |    CAST(count(*) AS BIGINT) AS n_dups,
        |    CAST(1 AS BIGINT) AS n_variants
        |  FROM gated GROUP BY g),
        |fb AS (
        |  SELECT q.q, t.f, u.j,
        |    substr(md5(CAST(q.q AS VARCHAR) || ':' ||
        |      CAST(t.f AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)),
        |      1, 1) IN ('0','1','2','3','4','5') AS active
        |  FROM (SELECT unnest(range(0, 25)) AS q) q,
        |    (SELECT unnest(range(0, 8)) AS f) t,
        |    (SELECT unnest(range(1, 8)) AS j) u),
        |fact AS (
        |  SELECT q, f, bool_or(active) AS fa FROM fb GROUP BY 1, 2),
        |aagg AS (
        |  SELECT q, CAST(7 * SUM(CASE WHEN fa THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_active
        |  FROM fact GROUP BY q),
        |fisl AS (
        |  SELECT q, f - row_number() OVER (PARTITION BY q ORDER BY f)
        |    AS grp
        |  FROM fact WHERE fa),
        |nseg16 AS (
        |  SELECT q, CAST(count(DISTINCT grp) AS BIGINT) AS n_segments
        |  FROM fisl GROUP BY q),
        |sig16 AS (
        |  SELECT q, CAST(coalesce(SUM(CASE WHEN active
        |    THEN CAST(1 AS BIGINT) << (f * 8 + j - 1) ELSE 0 END), 0)
        |    AS BIGINT) AS s
        |  FROM fb GROUP BY q),
        |surv16 AS (
        |  SELECT a.q, a.n_active, n.n_segments, s.s
        |  FROM aagg a JOIN nseg16 n USING (q) JOIN sig16 s USING (q)
        |  WHERE a.n_active * 2 >= 56),
        |lane16 AS (
        |  SELECT CAST(min(200 + 4 * q) AS BIGINT) AS clip_id,
        |    CAST(16000 AS INTEGER) AS sample_rate,
        |    CAST(560 AS BIGINT) AS duration_ms,
        |    CAST(56 AS BIGINT) AS n_windows,
        |    min(n_active) AS n_active, min(n_segments) AS n_segments,
        |    CAST(3 * count(*) AS BIGINT) AS n_dups,
        |    CAST(2 * count(*) AS BIGINT) AS n_variants
        |  FROM surv16 GROUP BY s)
        |SELECT * FROM lane8 UNION ALL SELECT * FROM lane16""".stripMargin,
    // p12: the video round re-derived from the fixture index formula
    // alone — the i%5==4 truncation class quarantines (moov runs past
    // the buffer), duration_ms is exact integer floor division, both
    // gates replay, and exact container dedup groups by the parameter
    // tuple (writeMp4 is pure, so byte-identity ⇔ parameter identity;
    // duration = (g+1)*900 alone already separates groups).
    // p12 v2 (r15): gates and dedup from the parameter formulas as
    // before, then frame bytes, dHashes, and shot ids re-derived for
    // the 4-sample schedule {0,3,6,9} from the container formula —
    // seed(g, fr) = g·1e6 + (fr // (2 + g%3))·1000 over 72×64 BMPs.
    "p12_video_curation" ->
      """WITH ids AS (
        |  SELECT i AS video_id, i // 2 AS g
        |  FROM range(0, 150) t(i) WHERE i % 5 <> 4),
        |par AS (
        |  SELECT video_id, g,
        |    CASE WHEN g % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |    ((g + 1) * 900 * 1000) // (600 + (g % 5) * 200)
        |      AS duration_ms,
        |    CAST(320 + (g % 12) * 16 AS BIGINT) AS width,
        |    CAST(180 + (g % 8) * 30 AS BIGINT) AS height,
        |    2 + g % 3 AS shot_len
        |  FROM ids),
        |gated AS (
        |  SELECT * FROM par
        |  WHERE duration_ms >= 3000 AND height >= 240),
        |surv AS (
        |  SELECT min(video_id) AS video_id, g, min(brand) AS brand,
        |    min(duration_ms) AS duration_ms, min(width) AS width,
        |    min(height) AS height, CAST(count(*) AS BIGINT) AS n_dups,
        |    min(shot_len) AS shot_len
        |  FROM gated GROUP BY g),
        |f AS (
        |  SELECT s.video_id, fr,
        |    CAST(s.g * 1000000 + (fr // s.shot_len) * 1000 AS BIGINT)
        |      AS seed
        |  FROM surv s, (VALUES (0), (3), (6), (9)) tf(fr)),
        |cells AS (
        |  SELECT video_id, fr, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM f, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT l.video_id, l.fr, CAST(l.cy * 8 + l.cx AS INTEGER)
        |    AS idx
        |  FROM cells l JOIN cells r
        |    ON l.video_id = r.video_id AND l.fr = r.fr
        |    AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT f.video_id, f.fr,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM f LEFT JOIN bits
        |    ON bits.video_id = f.video_id AND bits.fr = f.fr
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT video_id, fr,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT)
        |      AS dh
        |  FROM hv),
        |lagd AS (
        |  SELECT video_id, fr, dh,
        |    lag(dh) OVER (PARTITION BY video_id ORDER BY fr) AS pdh
        |  FROM h),
        |shots AS (
        |  SELECT video_id, CAST(count(*) AS BIGINT)
        |      AS n_frames_sampled,
        |    CAST(SUM(CASE WHEN pdh IS NULL
        |        OR bit_count(xor(dh, pdh)) > 7
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_shots
        |  FROM lagd GROUP BY video_id)
        |SELECT s.video_id, s.brand, s.duration_ms, s.width, s.height,
        |  s.n_dups, sh.n_frames_sampled, sh.n_shots
        |FROM surv s JOIN shots sh ON sh.video_id = s.video_id""".stripMargin,
    "p09_polite_crawl" ->
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
        |allowed AS (
        |  SELECT doc_id, url_canon FROM canon
        |  WHERE NOT (regexp_extract(url_canon,
        |        '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) LIKE '%.co.uk')
        |     OR starts_with(regexp_extract(url_canon,
        |        '^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)', 1), '/p/1')),
        |ded AS (
        |  SELECT url_canon, min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS n_variants
        |  FROM allowed GROUP BY url_canon),
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
        |  WHERE domain NOT IN ('src3.com', 'src7.co.uk', 'src15.com')),
        |quota AS (
        |  SELECT doc_id, url_canon, domain, n_variants,
        |    CAST(rn AS BIGINT) AS rn
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
        |          ORDER BY doc_id) AS rn FROM keep)
        |  WHERE rn <= 8)
        |SELECT doc_id, url_canon, domain, n_variants, rn FROM quota
        |WHERE url_canon NOT IN (
        |  SELECT url_canon FROM canon
        |  WHERE doc_id % 2 = 0 AND doc_id < 3000000)""".stripMargin,
    // ns105's fixture CTEs -> ns73's weight CASE on the EXTRACTED
    // text -> p03's md5-fingerprint dedup -> the hashSplit idiom:
    // the whole HTML-in curation chain re-derived from the page
    // formula, never parsing HTML.
    "p06_html_curation" ->
      """WITH words AS (
        |  SELECT doc_id, source,
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
        |    COUNT(*) FILTER (WHERE length(ctext) >= 30) AS nk,
        |    string_agg(ctext, chr(10) ORDER BY k)
        |      FILTER (WHERE length(ctext) >= 30) AS kept
        |  FROM ct GROUP BY doc_id),
        |ext AS (
        |  SELECT w.doc_id, w.source,
        |    CAST(a.nk + 1 AS BIGINT) AS n_kept,
        |    CASE WHEN a.kept IS NULL THEN '' ELSE a.kept || chr(10) END
        |      || 'Q&A <tags> and entities stay readable after ' ||
        |      'decoding in doc ' || CAST(w.doc_id AS VARCHAR)
        |      AS main_text
        |  FROM words w JOIN agg a USING (doc_id)
        |  WHERE w.doc_id % 17 <> 3),
        |logit AS (
        |  SELECT doc_id,
        |    CAST(-50000 + coalesce(list_sum(list_transform(
        |      string_split(regexp_replace(lower(trim(main_text)),
        |        '\s+', ' ', 'g'), ' '),
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
        |      AS logit_micro
        |  FROM ext),
        |pass AS (
        |  SELECT e.doc_id, e.source, e.n_kept, l.logit_micro,
        |    e.main_text
        |  FROM ext e JOIN logit l USING (doc_id)
        |  WHERE l.logit_micro > 0),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM pass
        |  GROUP BY md5(regexp_replace(lower(trim(main_text)),
        |    '\s+', ' ', 'g'))),
        |enr AS (
        |  SELECT s.doc_id, p.source, p.n_kept, p.logit_micro,
        |    s.dup_count
        |  FROM surv s JOIN pass p ON s.doc_id = p.doc_id)
        |SELECT doc_id, source, n_kept, logit_micro, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p06split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p06split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM enr""".stripMargin,
    // p06's chain with ns128's extractor as stage 0: md_text comes
    // straight from the markdown fixture formula (no parsing), then
    // the same logit gate / dedup / split CTEs.
    "p08_markdown_curation" ->
      """WITH norm AS (
        |  SELECT doc_id, source,
        |    regexp_replace(trim(text), '\s+', ' ', 'g') AS nt
        |  FROM documents),
        |ext AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |      AS n_links,
        |    'Doc ' || doc_id || ' ' || nt ||
        |    ' notes with bold' || doc_id || ' and code' || doc_id ||
        |    ' inline first item ' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN ' second fig ' || doc_id || ' shown'
        |      ELSE ' second shown' END ||
        |    ' col val' || doc_id || ' a' || doc_id || ' b' AS md_text
        |  FROM norm),
        |logit AS (
        |  SELECT doc_id,
        |    CAST(-50000 + coalesce(list_sum(list_transform(
        |      string_split(regexp_replace(lower(trim(md_text)),
        |        '\s+', ' ', 'g'), ' '),
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
        |      AS logit_micro
        |  FROM ext),
        |pass AS (
        |  SELECT e.doc_id, e.source, e.n_links, l.logit_micro,
        |    e.md_text
        |  FROM ext e JOIN logit l USING (doc_id)
        |  WHERE l.logit_micro > 0),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM pass
        |  GROUP BY md5(regexp_replace(lower(trim(md_text)),
        |    '\s+', ' ', 'g'))),
        |enr AS (
        |  SELECT s.doc_id, p.source, p.n_links, p.logit_micro,
        |    s.dup_count
        |  FROM surv s JOIN pass p ON s.doc_id = p.doc_id)
        |SELECT doc_id, source, n_links, logit_micro, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p08split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p08split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM enr""".stripMargin,
    // p06's chain restricted to docs whose WARC response record
    // parses (id % 19 != 7 — the planted bad-HTTP quarantine): the
    // whole raw-crawl-to-corpus pipeline re-derived from the page
    // formula, never parsing WARC or HTML.
    "p07_warc_curation" ->
      """WITH words AS (
        |  SELECT doc_id, source,
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
        |    COUNT(*) FILTER (WHERE length(ctext) >= 30) AS nk,
        |    string_agg(ctext, chr(10) ORDER BY k)
        |      FILTER (WHERE length(ctext) >= 30) AS kept
        |  FROM ct GROUP BY doc_id),
        |ext AS (
        |  SELECT w.doc_id, w.source,
        |    CAST(a.nk + 1 AS BIGINT) AS n_kept,
        |    CASE WHEN a.kept IS NULL THEN '' ELSE a.kept || chr(10) END
        |      || 'Q&A <tags> and entities stay readable after ' ||
        |      'decoding in doc ' || CAST(w.doc_id AS VARCHAR)
        |      AS main_text
        |  FROM words w JOIN agg a USING (doc_id)
        |  WHERE w.doc_id % 17 <> 3 AND w.doc_id % 19 <> 7),
        |logit AS (
        |  SELECT doc_id,
        |    CAST(-50000 + coalesce(list_sum(list_transform(
        |      string_split(regexp_replace(lower(trim(main_text)),
        |        '\s+', ' ', 'g'), ' '),
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
        |      AS logit_micro
        |  FROM ext),
        |pass AS (
        |  SELECT e.doc_id, e.source, e.n_kept, l.logit_micro,
        |    e.main_text
        |  FROM ext e JOIN logit l USING (doc_id)
        |  WHERE l.logit_micro > 0),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM pass
        |  GROUP BY md5(regexp_replace(lower(trim(main_text)),
        |    '\s+', ' ', 'g'))),
        |enr AS (
        |  SELECT s.doc_id, p.source, p.n_kept, p.logit_micro,
        |    s.dup_count
        |  FROM surv s JOIN pass p ON s.doc_id = p.doc_id)
        |SELECT doc_id, source, n_kept, logit_micro, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p07split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p07split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM enr""".stripMargin,
    "p03_curation_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, source, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |base AS (
        |  SELECT doc_id, source, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM corpus),
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
        |surv AS (
        |  SELECT min(b.doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
        |  FROM base b JOIN keep k ON b.doc_id = k.doc_id
        |  GROUP BY md5(b.norm)),
        |enr AS (
        |  SELECT s.doc_id, c.source, s.dup_count
        |  FROM surv s JOIN corpus c ON s.doc_id = c.doc_id),
        |mixed AS (
        |  SELECT * FROM enr
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03mix'), 1, 8)) AS BIGINT) % 10000
        |    < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |        ELSE 0.25 END) * 10000)
        |SELECT doc_id, source, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM mixed""".stripMargin,
    "p01_weather_pipeline" ->
      """SELECT lower(replace(n_name, ' ', '_')) AS city_key,
        | n_name AS city, 'US' AS country,
        | strptime('2026-08-12 10:' ||
        |   lpad(CAST(n_nationkey AS VARCHAR), 2, '0') || ':00',
        |   '%Y-%m-%d %H:%M:%S') AS localtime_ts,
        | CAST(n_nationkey + 0.5 AS DOUBLE) AS temp_c,
        | CAST((n_nationkey + 0.5) * 2 AS DOUBLE) AS temp_f,
        | n_nationkey % 2 = 1 AS is_day,
        | 'Cond ' || n_regionkey AS condition_text,
        | CAST(1000 + n_regionkey AS BIGINT) AS condition_code,
        | CAST(40 + n_nationkey AS BIGINT) AS humidity,
        | CAST(n_nationkey AS BIGINT) AS cloud,
        | CAST(202608121000 AS BIGINT) AS run_hr
        |FROM nation""".stripMargin,
    "p02_cocktails_pipeline" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id_drink,
        | p_name AS drink, p_type AS category, p_brand AS glass,
        | p_brand AS ingredient1, '2 oz' AS measure1,
        | 'Alcoholic' AS alcoholic,
        | CAST(202608121000 AS BIGINT) AS run_hr
        |FROM part WHERE p_partkey < 20""".stripMargin,
  )
}
