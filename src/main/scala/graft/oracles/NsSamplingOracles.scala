package graft.oracles

/** DuckDB oracle SQL for sampling, splitting, and mixture queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsSamplingOracles {
  val sql: Map[String, String] = Map(
    // ONE global (len desc, id) window — the two-phase rewrite must
    // reproduce it exactly; batch stats are exact integer arithmetic.
    "ns116_length_batches" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS BIGINT) AS l
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, l,
        |    ROW_NUMBER() OVER (ORDER BY l DESC, doc_id) - 1 AS rk
        |  FROM d)
        |SELECT CAST(rk // 32 AS BIGINT) AS batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MAX(l) AS BIGINT) AS max_len,
        |  CAST(SUM(l) AS BIGINT) AS sum_len,
        |  CAST(COUNT(*) * MAX(l) - SUM(l) AS BIGINT) AS padding_waste
        |FROM r GROUP BY 1""".stripMargin,
    // Token-budget oracle: ns09's score CTE, then ONE window in the
    // (score desc, id) total order — the two-phase prefix-sum must
    // equal exactly this global cumulative sum.
    "ns69_token_budget_select" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE)
        |      / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
        |      AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it'], t)))
        |      AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(n_chars BETWEEN 50 AND 100000 AS INT)
        |       + CAST(n_words BETWEEN 10 AND 50000 AS INT)
        |       + CAST(avg_word_len BETWEEN 2.0 AND 12.0 AS INT)
        |       + CAST(punct_ratio <= 0.2 AS INT)
        |       + CAST(stopword_ratio >= 0.01 AS INT) AS DOUBLE) / 5
        |      AS quality_score
        |  FROM stats)
        |SELECT doc_id, quality_score, n_chars AS weight, cum_before,
        |  cum_before + n_chars <= 60000 AS kept
        |FROM (
        |  SELECT *, CAST(coalesce(SUM(n_chars) OVER (
        |    ORDER BY quality_score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum_before
        |  FROM scored)""".stripMargin,
    // The two-phase shard cut must equal ONE global running sum in id
    // order; checksum is an order-independent integer sum of md5
    // words, so the whole manifest is exact arithmetic.
    "ns80_shard_manifest" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |    CAST(coalesce(SUM(CAST(n_chars AS BIGINT)) OVER (
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS s
        |  FROM documents)
        |SELECT s // 25000 AS shard_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |  CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |    1, 8)) AS BIGINT)) AS BIGINT) AS id_checksum
        |FROM a GROUP BY 1""".stripMargin,
    // Same hash→uniform→ln(u)/w priority, quantized once to nano
    // fixed-point (ns58 proved libm ln bit-stable across engines on
    // this host); operand order matches the Spark expression exactly.
    "ns75_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |    CAST(round(ln((CAST(('0x' || substr(md5(
        |      CAST(doc_id AS VARCHAR) || ':es1'), 1, 8)) AS BIGINT)
        |      + 0.5) / 4294967296.0) / n_chars * 1000000000)
        |      AS BIGINT) AS key_fp
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, weight, key_fp FROM s
        |ORDER BY key_fp DESC, doc_id LIMIT 100""".stripMargin,
    // Boundary literals are the EXACT doubles the Scala scanLeft
    // accumulates (0.8 + 0.1 = 0.9000000000000001 in IEEE), CAST to
    // DOUBLE so DuckDB's decimal literals don't change the floor.
    "ns76_stratified_split" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY CAST(('0x' || substr(md5(
        |        CAST(doc_id AS VARCHAR) || ':strat1'), 1, 8))
        |        AS BIGINT) % 1000000, doc_id) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, rn,
        |  CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
        |       WHEN rn <= floor(CAST(0.9000000000000001 AS DOUBLE)
        |         * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM ranked""".stripMargin,
    // Upsample oracle: same md5 bucket as ns23, same floor/frac
    // split on literal weights (identical double arithmetic), epochs
    // via range(1, reps+1) — empty when reps = 0, matching the
    // pre-explode filter.
    "ns51_epoch_upsample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
        |      WHEN 'src2' THEN 0.4 ELSE 1.2 END AS wt,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep1'), 1, 8)) AS BIGINT) % 10000 AS b
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(floor(wt) AS BIGINT)
        |      + CASE WHEN b < (wt - floor(wt)) * 10000
        |          THEN 1 ELSE 0 END AS reps
        |  FROM w)
        |SELECT doc_id, source, CAST(t.e AS BIGINT) AS epoch
        |FROM r, UNNEST(range(1, reps + 1)) AS t(e)""".stripMargin,
    // Rates oracle: sqrt is IEEE-exact on both engines; the Σ √n fold
    // is ordered by source on both sides (list(... ORDER BY) here,
    // array_sort'd collect there), so the total is bit-identical.
    "ns39_temperature_mixture" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (
        |  SELECT list_reduce(
        |    list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
        |    (a, b) -> a + b) AS total_w FROM c)
        |SELECT source, n_docs,
        |  sqrt(CAST(n_docs AS DOUBLE)) / t.total_w AS rate
        |FROM c, t""".stripMargin,
    // Spark conv(hex,16,10) and DuckDB CAST('0x'||hex AS BIGINT) agree
    // on the first-8-hex-chars bucket (verified value-identical).
    "ns17_hash_split" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 AS bucket,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 < 800 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM documents""".stripMargin,
    "ns23_mixture_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 8)) AS BIGINT) % 10000
        |  < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |      WHEN 'src2' THEN 0.25 ELSE 0.1 END) * 10000""".stripMargin,
    "ns28_pseudo_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':shuf1') AS h,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf1'), 1, 8)) AS BIGINT) % 1000 AS b
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY b, h, doc_id) AS BIGINT) AS shuffle_rank
        |FROM h""".stripMargin,
    "ns24_pack_offsets" ->
      """SELECT doc_id, n_chars,
        |  CAST(coalesce(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(coalesce(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS DOUBLE) / 2048) AS BIGINT) AS pack_id
        |FROM documents""".stripMargin,
    "ns18_source_quota" ->
      """SELECT source, doc_id, n_chars, rn FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 50""".stripMargin,
    // ONE window per prompt; first_value rides the same (reward
    // desc, id) sort as the rank; strict margin — ties never pair.
    "ns142_preference_pairs" ->
      """WITH r AS (
        |  SELECT user_id AS prompt_id, event_id, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS BIGINT) AS rn,
        |    FIRST_VALUE(event_id) OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS chosen_id,
        |    FIRST_VALUE(value) OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS chosen_reward
        |  FROM events)
        |SELECT prompt_id, chosen_id, event_id AS rejected_id,
        |  chosen_reward, value AS rejected_reward,
        |  rn - 1 AS pair_rank
        |FROM r
        |WHERE rn BETWEEN 2 AND 4 AND chosen_reward - value > 0.0""".stripMargin,
    // The same two windows + the same integer floor arithmetic.
    "ns175_interleave_schedule" ->
      """SELECT doc_id, source,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY doc_id) AS BIGINT) AS rank_in_source,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
        |    AS n_source,
        |  CAST(((2 * (ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY doc_id)) - 1) * 1000000)
        |    // (count(*) OVER (PARTITION BY source)) AS BIGINT)
        |    AS interleave_key
        |FROM documents""".stripMargin,
    // ns142's pair window ⋈ ns165's advantage dag, composed in SQL —
    // both sides' advantages attached by (prompt, candidate).
    "ns174_dpo_episodes" ->
      """WITH b AS (
        |  SELECT user_id AS prompt_id, event_id AS cand_id, value,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |w AS (
        |  SELECT prompt_id, cand_id, value, c,
        |    count(*) OVER (PARTITION BY prompt_id) AS n,
        |    sum(c) OVER (PARTITION BY prompt_id) AS s1,
        |    sum(c * c) OVER (PARTITION BY prompt_id) AS s2,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY value DESC, cand_id) AS BIGINT) AS rn,
        |    FIRST_VALUE(cand_id) OVER (PARTITION BY prompt_id
        |      ORDER BY value DESC, cand_id) AS chosen_id,
        |    FIRST_VALUE(value) OVER (PARTITION BY prompt_id
        |      ORDER BY value DESC, cand_id) AS chosen_reward
        |  FROM b),
        |adv AS (
        |  SELECT prompt_id, cand_id,
        |    CASE WHEN (CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * s1 / n) / n <= 0.0 THEN 0.0
        |      ELSE (CAST(c AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        / sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * s1 / n) / n) END AS advantage,
        |    CAST(n AS BIGINT) AS n_group
        |  FROM w),
        |pairs AS (
        |  SELECT prompt_id, chosen_id, cand_id AS rejected_id,
        |    chosen_reward, value AS rejected_reward,
        |    rn - 1 AS pair_rank
        |  FROM w
        |  WHERE rn BETWEEN 2 AND 4 AND chosen_reward - value > 0.0)
        |SELECT p.prompt_id, p.chosen_id, p.rejected_id,
        |  p.chosen_reward, p.rejected_reward, p.pair_rank,
        |  ca.advantage AS chosen_advantage,
        |  ra.advantage AS rejected_advantage, ca.n_group
        |FROM pairs p
        |JOIN adv ca ON ca.prompt_id = p.prompt_id
        |  AND ca.cand_id = p.chosen_id
        |JOIN adv ra ON ra.prompt_id = p.prompt_id
        |  AND ra.cand_id = p.rejected_id""".stripMargin,
    // GRPO advantages re-derived with the identical fixed dag:
    // cent-quantized rewards, exact window sums, one mean division,
    // the dq03 variance form, IEEE sqrt; var <= 0 guards to 0.
    "ns165_group_advantage" ->
      """WITH b AS (
        |  SELECT user_id AS prompt_id, event_id AS cand_id,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |w AS (
        |  SELECT prompt_id, cand_id, c,
        |    count(*) OVER (PARTITION BY prompt_id) AS n,
        |    sum(c) OVER (PARTITION BY prompt_id) AS s1,
        |    sum(c * c) OVER (PARTITION BY prompt_id) AS s2,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY c DESC, cand_id) AS BIGINT) AS best_rank
        |  FROM b),
        |v AS (
        |  SELECT *,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
        |      AS var,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean
        |  FROM w)
        |SELECT prompt_id, cand_id, c AS reward_cents,
        |  CAST(n AS BIGINT) AS n_group,
        |  CASE WHEN var <= 0.0 THEN 0.0
        |    ELSE (CAST(c AS DOUBLE) - mean) / sqrt(var) END AS advantage,
        |  best_rank
        |FROM v""".stripMargin,
    // Cohen's kappa re-derived independently: ns73's keep decision,
    // the same md5 flip noise, then po/pe/kappa from the pair's own
    // contingency — integer chance sums, each ratio one IEEE
    // division, the same fixed dag as the Spark side.
    "ns152_annotator_kappa" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |keepv AS (
        |  SELECT doc_id,
        |    (-50000 + coalesce(list_sum(list_transform(toks,
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
        |        WHEN 'http' THEN -60000 ELSE 0 END)), 0)) > 0 AS keep
        |  FROM docs),
        |lab AS (
        |  SELECT doc_id, r.rater,
        |    (keep != (CAST(('0x' || substr(md5(
        |        CAST(doc_id AS VARCHAR) || ':' || r.rater), 1, 2))
        |      AS INT) < CASE r.rater WHEN 'r1' THEN 16
        |        WHEN 'r2' THEN 48 ELSE 96 END)) AS label
        |  FROM keepv, UNNEST(['r1', 'r2', 'r3']) AS r(rater)),
        |p AS (
        |  SELECT a.doc_id, a.rater AS rater_a, b.rater AS rater_b,
        |    a.label AS la, b.label AS lb
        |  FROM lab a JOIN lab b
        |    ON a.doc_id = b.doc_id AND a.rater < b.rater),
        |base AS (
        |  SELECT rater_a, rater_b, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS agree
        |  FROM p GROUP BY 1, 2),
        |ca AS (SELECT rater_a, rater_b, la AS k,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM p GROUP BY 1, 2, 3),
        |cb AS (SELECT rater_a, rater_b, lb AS k,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM p GROUP BY 1, 2, 3),
        |ch AS (
        |  SELECT ca.rater_a, ca.rater_b,
        |    CAST(SUM(ca.c * cb.c) AS BIGINT) AS chance
        |  FROM ca JOIN cb ON ca.rater_a = cb.rater_a
        |    AND ca.rater_b = cb.rater_b AND ca.k = cb.k
        |  GROUP BY 1, 2),
        |rates AS (
        |  SELECT b.rater_a, b.rater_b, b.n_items, b.agree,
        |    CAST(b.agree AS DOUBLE) / CAST(b.n_items AS DOUBLE) AS po,
        |    CAST(ch.chance AS DOUBLE) / (CAST(b.n_items AS DOUBLE)
        |      * CAST(b.n_items AS DOUBLE)) AS pe
        |  FROM base b JOIN ch
        |    ON b.rater_a = ch.rater_a AND b.rater_b = ch.rater_b)
        |SELECT rater_a, rater_b, n_items, agree, po, pe,
        |  CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe)
        |    ELSE 0.0 END AS kappa
        |FROM rates""".stripMargin,
    // ns73's logit CTE + ONE global (logit desc, id) window — the
    // two-phase prefix-sum rewrite must reproduce it row-for-row;
    // the phase cut is exact integer arithmetic.
    "ns144_curriculum_phases" ->
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
        |  FROM base),
        |s AS (
        |  SELECT doc_id,
        |    CAST(-50000 + coalesce(list_sum(list_transform(ws,
        |      x -> coalesce(x, 0))), 0) AS BIGINT) AS logit_micro
        |  FROM w),
        |r AS (
        |  SELECT doc_id, logit_micro,
        |    CAST(ROW_NUMBER() OVER (ORDER BY logit_micro DESC, doc_id)
        |      AS BIGINT) AS rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM s)
        |SELECT doc_id, logit_micro, rank,
        |  CAST(((rank - 1) * 4) // n AS BIGINT) AS phase
        |FROM r""".stripMargin,
  )
}
