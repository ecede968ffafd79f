package graft.oracles

/** DuckDB oracle SQL for embedding, similarity, and kNN queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsSimilarityOracles {
  val sql: Map[String, String] = Map(
    // cosine arithmetic mirrors Similarity.dot exactly: element-wise
    // CAST to DOUBLE, multiply, sequential-fold sum — bit-identical to
    // Spark's aggregate(zip_with(...)), so scores hash-match.
    "ns05_topk_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM embeddings e, q WHERE e.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS "rank"
        |  FROM scored)
        |SELECT query_id, vec_id, cosine, "rank" FROM ranked
        |WHERE "rank" <= 5""".stripMargin,
    // The ENTIRE ANN pipeline re-derived: md5-parity +-1 planes
    // (ns95's sign formula), the ns05 sequential-fold arithmetic for
    // norms / projections / cosines, equal-width buckets, the OR-ed
    // (table, bucket) candidate equi-join, exact-cosine verify, and
    // per-query top-k. Hash-gates buckets -> candidates -> ranks
    // end-to-end; ns06's seeded-gaussian path stays the registered
    // scale default.
    "ns06b_ann_topk_exact" ->
      """WITH sgn AS (
        |  SELECT jj.j AS j,
        |    list(CASE WHEN CAST(('0x' || substr(md5(CAST(t.i AS VARCHAR)
        |        || ':' || CAST(jj.j AS VARCHAR) || ':annb'), 1, 1))
        |        AS INT) % 2 = 0
        |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
        |      ORDER BY t.i) AS sv
        |  FROM UNNEST(range(0, 8)) AS jj(j), UNNEST(range(0, 64)) AS t(i)
        |  GROUP BY jj.j),
        |u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS uv
        |  FROM (
        |    SELECT vec_id, embedding,
        |      sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |        i -> CAST(embedding[i] AS DOUBLE)
        |          * CAST(embedding[i] AS DOUBLE)))) AS n
        |    FROM embeddings)
        |  WHERE n > 0),
        |b AS (
        |  SELECT u.vec_id, s.j AS tbl,
        |    CAST(floor(list_sum(list_transform(range(1, 65),
        |      i -> uv[i] * sv[i])) / 1.0) AS BIGINT) AS bucket
        |  FROM u, sgn s),
        |qb AS (
        |  SELECT vec_id AS query_id, tbl, bucket FROM b
        |  WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT qb.query_id, b.vec_id
        |  FROM b JOIN qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket
        |  WHERE b.vec_id != qb.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> cu.uv[i] * qu.uv[i])) AS cosine
        |  FROM cand c
        |  JOIN u cu ON cu.vec_id = c.vec_id
        |  JOIN u qu ON qu.vec_id = c.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS "rank"
        |  FROM scored WHERE cosine >= 0.15)
        |SELECT query_id, vec_id, cosine, "rank" FROM ranked
        |WHERE "rank" <= 5""".stripMargin,
    // ns05's exact-cosine machinery at k=10, then the positive/
    // negative split re-derived with a plain rank-1 join; the
    // margin arithmetic (pos − 0.05 as DOUBLE) mirrors the Spark
    // side exactly.
    "ns155_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM embeddings e, q WHERE e.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rnk
        |  FROM scored),
        |top AS (SELECT * FROM ranked WHERE rnk <= 10),
        |pos AS (SELECT query_id, vec_id AS positive_id,
        |          cosine AS pos_cosine
        |        FROM top WHERE rnk = 1)
        |SELECT t.query_id, p.positive_id, t.vec_id AS negative_id,
        |  p.pos_cosine, t.cosine AS neg_cosine,
        |  CAST(t.rnk - 1 AS BIGINT) AS neg_rank
        |FROM top t JOIN pos p USING (query_id)
        |WHERE t.rnk > 1
        |  AND t.cosine <= p.pos_cosine - CAST(0.05 AS DOUBLE)""".stripMargin,
    // PQ encode against md5-parity ±1 codebooks: the oracle
    // re-derives every sub-centroid entry from the public sign
    // formula (global dim index s·8+i, code j, salt 'pqb' — the
    // ns06b idiom), unit-normalizes exactly as the kernel does
    // (x/n per element), scores each code by 2·dot − ‖c‖² with
    // list_sum's sequential fold mirroring the kernel's ascending
    // loop (±1 entries make ‖c‖² exactly 8.0), and keeps the
    // smallest code among score ties — the strict-> convention.
    "ns146b_pq_encode_exact" ->
      """WITH cb AS (
        |  SELECT s.s AS s, j.j AS j,
        |    list(CASE WHEN CAST(('0x' || substr(md5(
        |        CAST(s.s * 8 + t.i AS VARCHAR) || ':'
        |        || CAST(j.j AS VARCHAR) || ':pqb'), 1, 1))
        |        AS INT) % 2 = 0
        |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
        |      ORDER BY t.i) AS cv
        |  FROM UNNEST(range(0, 8)) AS s(s), UNNEST(range(0, 16)) AS j(j),
        |       UNNEST(range(0, 8)) AS t(i)
        |  GROUP BY s.s, j.j),
        |u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) / n) AS uv
        |  FROM (
        |    SELECT vec_id, embedding,
        |      sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |        i -> CAST(embedding[i] AS DOUBLE)
        |          * CAST(embedding[i] AS DOUBLE)))) AS n
        |    FROM embeddings)
        |  WHERE n > 0),
        |scored AS (
        |  SELECT u.vec_id, cb.s, cb.j,
        |    2 * list_sum(list_transform(range(1, 9),
        |      i -> uv[CAST(cb.s * 8 AS INT) + i] * cv[i])) - 8.0 AS score
        |  FROM u, cb),
        |ranked AS (
        |  SELECT vec_id, s, j,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |      ORDER BY score DESC, j) AS rnk
        |  FROM scored)
        |SELECT vec_id, CAST(s AS BIGINT) AS subspace,
        |  CAST(j AS BIGINT) AS code
        |FROM ranked WHERE rnk = 1""".stripMargin,
    // Addition-merged summary store ≡ the whole-corpus Gram: merge
    // is exact integer addition, so this is ns101's oracle VERBATIM
    // (the s08-vs-ns93 convention).
    "ns107_gram_store_merge" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS e
        |  FROM embeddings),
        |cells AS (
        |  SELECT t1.i AS i, t2.j AS j, e[t1.i + 1] * e[t2.j + 1] AS p
        |  FROM q, UNNEST(range(0, 64)) AS t1(i),
        |       UNNEST(range(0, 64)) AS t2(j)
        |  WHERE t2.j >= t1.i)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(SUM(p) AS BIGINT) AS s_fx
        |FROM cells GROUP BY 1, 2""".stripMargin,
    // Same Spark-round quantization as the fixed-point family, then
    // the exact integer triangle sum per (i, j).
    "ns101_embedding_gram" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS e
        |  FROM embeddings),
        |cells AS (
        |  SELECT t1.i AS i, t2.j AS j, e[t1.i + 1] * e[t2.j + 1] AS p
        |  FROM q, UNNEST(range(0, 64)) AS t1(i),
        |       UNNEST(range(0, 64)) AS t2(j)
        |  WHERE t2.j >= t1.i)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(SUM(p) AS BIGINT) AS s_fx
        |FROM cells GROUP BY 1, 2""".stripMargin,
    // ns35's quantization CTE, then an exact integer projection whose
    // ±1 signs come from the same md5-nibble parity per (i, j).
    "ns95_signed_projection" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) AS q_scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
        |          AS INTEGER))
        |    END AS q
        |  FROM s),
        |e AS (
        |  SELECT vec_id, i - 1 AS i, CAST(q[i] AS BIGINT) AS qi
        |  FROM q, UNNEST(range(1, len(q) + 1)) AS t(i)),
        |cells AS (
        |  SELECT e.vec_id, jj.j AS j, e.qi * (CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(e.i AS VARCHAR) || ':' ||
        |        CAST(jj.j AS VARCHAR) || ':rp'), 1, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END) AS term
        |  FROM e, UNNEST(range(0, 16)) AS jj(j))
        |SELECT vec_id, CAST(j AS INTEGER) AS j,
        |  CAST(SUM(term) AS BIGINT) AS comp
        |FROM cells GROUP BY 1, 2""".stripMargin,
    // ns48's leave-one-out kNN SQL over the audited slice, plus the
    // own-label join and the disagreement flag.
    "ns99_label_noise" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS own_label
        |  FROM embeddings WHERE vec_id < 100),
        |c AS (
        |  SELECT vec_id, embedding, label FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
        |          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM c, q WHERE c.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, label AS pred_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT query_id, pred_label, votes,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, pred_label) AS vr
        |  FROM votes)
        |SELECT b.query_id, q.own_label, b.pred_label, b.votes,
        |  b.pred_label != q.own_label AS suspect
        |FROM best b JOIN q ON b.query_id = q.query_id
        |WHERE vr = 1""".stripMargin,
    // ns93's sketch CTE + ns21's top-8 vocab as the probe set; the
    // estimate is min over seeds of coalesce(cell count, 0).
    "ns103_cms_estimates" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |sk AS (
        |  SELECT source, seed,
        |    CAST(('0x' || substr(md5(tok || ':cms' || CAST(seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS seed)
        |  GROUP BY 1, 2, 3),
        |v AS (
        |  SELECT word FROM (
        |    SELECT unnest(list_filter(
        |      string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |      x -> length(x) > 0)) AS word
        |    FROM documents) t
        |  GROUP BY word ORDER BY count(*) DESC, word ASC LIMIT 8),
        |probes AS (
        |  SELECT word, s.seed,
        |    CAST(('0x' || substr(md5(word || ':cms' || CAST(s.seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell
        |  FROM v CROSS JOIN (SELECT unnest(range(4)) AS seed) AS s),
        |exp AS (
        |  SELECT g.source, p.word, p.seed, p.cell
        |  FROM (SELECT DISTINCT source FROM documents) g
        |  CROSS JOIN probes p),
        |j AS (
        |  SELECT e.source, e.word, e.seed,
        |    coalesce(sk.cnt, 0) AS c
        |  FROM exp e LEFT JOIN sk
        |    ON e.source = sk.source AND e.seed = sk.seed
        |    AND e.cell = sk.cell)
        |SELECT source, word AS token, CAST(MIN(c) AS BIGINT) AS est
        |FROM j GROUP BY 1, 2""".stripMargin,
    // kNN-vote oracle: ns05's exact-cosine ranking (identical fold ⇒
    // identical doubles ⇒ identical row_number cut), then integer
    // votes with the same (votes DESC, label) break.
    "ns48_knn_labels" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 50),
        |c AS (
        |  SELECT vec_id, embedding, label
        |  FROM embeddings WHERE vec_id >= 50),
        |scored AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
        |          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM c, q WHERE c.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, label AS pred_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT query_id, pred_label, votes,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, pred_label) AS vr
        |  FROM votes)
        |SELECT query_id, pred_label, votes FROM best WHERE vr = 1""".stripMargin,
    // Quantization oracle: float→double promotion is exact and both
    // engines round doubles half-away-from-zero, so the int arrays
    // and the order-independent max error hash-match bit-exactly.
    // Exact-integer MIPS re-run end to end: the ns35 quantization
    // CTEs on both sides, every dot product as integer list math
    // (|products| ≤ 127² and 64-dim sums stay far below 2^53, so
    // DuckDB's list arithmetic is exact), then the (score desc, id)
    // rank.
    "ns166_int8_mips" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) AS q_scale
        |  FROM embeddings),
        |qt AS (
        |  SELECT vec_id, embedding, q_scale,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
        |          AS INTEGER))
        |    END AS q
        |  FROM s),
        |qs AS (SELECT vec_id AS q_id, q AS qv FROM qt
        |  WHERE vec_id % 13 = 2 AND vec_id < 400),
        |sc AS (SELECT qs.q_id, d.vec_id,
        |    CAST(list_sum(list_transform(range(1, len(qs.qv) + 1),
        |      i -> CAST(qs.qv[i] AS BIGINT) * d.q[i])) AS BIGINT)
        |      AS score
        |  FROM qt d, qs)
        |SELECT q_id, vec_id, score, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY score DESC, vec_id) AS rn FROM sc)
        |WHERE rn <= 5""".stripMargin,
    "ns35_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) AS q_scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding, q_scale,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
        |          AS INTEGER))
        |    END AS q
        |  FROM s),
        |o AS (
        |  SELECT vec_id, q_scale, q,
        |    list_max(list_transform(list_zip(embedding, q),
        |      p -> abs(CAST(p[1] AS DOUBLE)
        |        - CAST(p[2] AS DOUBLE) * q_scale / 127.0)))
        |      AS max_abs_err
        |  FROM q)
        |SELECT vec_id, q_scale, max_abs_err,
        |  CAST(i - 1 AS INTEGER) AS idx, q[i] AS q_val
        |FROM o, UNNEST(range(1, len(q) + 1)) AS t(i)""".stripMargin,
    // L2-normalize oracle: both engines fold the squared norm left-
    // to-right in doubles (Spark `aggregate` with 0.0 seed, DuckDB
    // `list_reduce` seeded by the first element — IEEE 0.0 + x²
    // is bitwise x²), so norm and elements hash-match bit-exactly.
    "ns36_l2_normalize" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS norm
        |  FROM embeddings),
        |o AS (
        |  SELECT vec_id, norm,
        |    CASE WHEN norm = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(embedding, x -> CAST(x AS DOUBLE) / norm)
        |    END AS unit
        |  FROM n)
        |SELECT vec_id, norm,
        |  CAST(i - 1 AS INTEGER) AS idx, unit[i] AS unit_val
        |FROM o, UNNEST(range(1, len(unit) + 1)) AS t(i)""".stripMargin,
    // Matryoshka oracle: same left-fold bit-exactness argument as
    // ns36, applied to the 16-prefix and the full vector.
    "ns57_matryoshka_truncate" ->
      """WITH p AS (
        |  SELECT vec_id, embedding, embedding[1:16] AS pe
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, pe,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS full_norm,
        |    sqrt(list_reduce(list_transform(pe,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS kept_norm
        |  FROM p),
        |o AS (
        |  SELECT vec_id, full_norm, kept_norm,
        |    CASE WHEN full_norm = 0 THEN 0.0
        |      ELSE kept_norm / full_norm END AS energy_ratio,
        |    CASE WHEN kept_norm = 0
        |      THEN list_transform(pe, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(pe, x -> CAST(x AS DOUBLE) / kept_norm)
        |    END AS unit
        |  FROM n)
        |SELECT vec_id, full_norm, kept_norm, energy_ratio,
        |  CAST(i - 1 AS INTEGER) AS idx, unit[i] AS unit_val
        |FROM o, UNNEST(range(1, len(unit) + 1)) AS t(i)""".stripMargin,
    // Centroid oracle: identical fixed-point pipeline — one round to
    // 2^-24 quanta (power-of-two scaling is exact; both engines round
    // half away from zero), exact BIGINT sums, one double division.
    "ns38_label_centroids" ->
      """WITH e AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 16777216.0)
        |      AS BIGINT) AS fx
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        |s AS (
        |  SELECT label, pos, SUM(fx) AS sfx, COUNT(*) AS n
        |  FROM e GROUP BY 1, 2),
        |nv AS (
        |  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors
        |  FROM s GROUP BY label)
        |SELECT s.label, nv.n_vectors, CAST(s.pos AS INTEGER) AS idx,
        |  CAST(s.sfx AS DOUBLE) / (s.n * 16777216.0) AS centroid_val
        |FROM s JOIN nv ON s.label = nv.label""".stripMargin,
  )
}
