package graft.oracles

/** DuckDB oracle SQL for BPE tokenizer queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsBpeOracles {
  /** ns179/s19 shared SQL: ids AND mask from the independent Python
    * encoder's table; the offset prefix sum replayed per
    * conversation, loss derived from the stored role. */
  private val sftTokenSql: String =
    """WITH t AS (SELECT * FROM read_parquet(
      |'/root/repo/src/test/resources/graft/sft_oracle_sf001.parquet')),
      |cnt AS (SELECT conversation_id, turn_idx, count(*) AS c
      |  FROM t GROUP BY 1, 2),
      |off AS (SELECT conversation_id, turn_idx,
      |    CAST(coalesce(SUM(c) OVER (PARTITION BY conversation_id
      |      ORDER BY turn_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS o
      |  FROM cnt)
      |SELECT t.conversation_id, t.turn_idx,
      |  CAST(t.pos + off.o AS BIGINT) AS tok_pos, t.token_id,
      |  t.role = 'assistant' AS loss
      |FROM t JOIN off USING (conversation_id, turn_idx)""".stripMargin

  val sql: Map[String, String] = Map(
    // Token counts from the independent encoder's table; chars from
    // the canonical text; one division of exact integer sums.
    "ns89_tokenizer_fertility" ->
      """WITH tok AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')
        |  GROUP BY doc_id),
        |base AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(length(regexp_replace(lower(trim(d.text)),
        |      '\s+', ' ', 'g')) AS BIGINT) AS n_chars,
        |    coalesce(t.n_tokens, 0) AS n_tokens
        |  FROM documents d LEFT JOIN tok t USING (doc_id)
        |  WHERE d.doc_id < 100)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_tokens) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
        |    AS tokens_per_char
        |FROM base GROUP BY source""".stripMargin,
    "ns88_bpe_learn" ->
      """SELECT "rank", "left", "right" FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_merges_sf001.parquet')
        |""".stripMargin,
    // BPE oracle: the expected id stream was produced by the
    // INDEPENDENT Python encoder in tools/gen_bpe.py from the same
    // fixture text + checked-in merges; the SQL just reads it. If the
    // driver regenerates documents with different text, rerun
    // gen_bpe.py and recommit (BpeFixturePinSpec fails loudly first).
    "ns61_bpe_encode" ->
      """SELECT doc_id, pos, token_id
        |FROM read_parquet('/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')""".stripMargin,
    // True-length packing oracle: ns24's window arithmetic over the
    // per-doc token counts of the same independent oracle table.
    "ns62_pack_bpe" ->
      """WITH lens AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM read_parquet('/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS DOUBLE) / 512) AS BIGINT) AS pack_id
        |FROM lens""".stripMargin,
    // Token-aligned SFT mask: ids AND mask from the independent
    // Python encoder's table (gen_bpe.py re-renders each turn from
    // documents.parquet and encodes with its own BPE); the SQL
    // replays the engine's cross-turn offset prefix sum — within-turn
    // pos plus the total token count of all preceding turns — and
    // derives the loss flag from the stored role.
    // s19 is the streaming restatement over the same fixture lines —
    // the drained token store must equal the same rows.
    "s19_stream_sft_tokens" -> sftTokenSql,
    "ns179_sft_token_mask" -> sftTokenSql,
    // Conversation-grain packing: per-conv token totals and
    // assistant-token counts from the same independent table, then
    // ns62's window arithmetic at chunk 256.
    "ns180_sft_pack" ->
      """WITH lens AS (
        |  SELECT conversation_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_loss_tokens
        |  FROM read_parquet(
        |'/root/repo/src/test/resources/graft/sft_oracle_sf001.parquet')
        |  GROUP BY 1)
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
    // Tokenizer coverage over the byte-fallback codec (r14): the
    // independent bf table carries the planted tails' byte tokens
    // id-for-id, so the oracle just aggregates it per source.
    // byte_base = 95 + |merges|, derived from the checked-in ranked
    // merges parquet — a pure function of the merge table, matching
    // Bpe.byteBase on the engine side. unk is structurally zero (the
    // gen_bpe.py assert), and the gate pins that.
    "ns187_tokenizer_coverage" ->
      """WITH base AS (
        |  SELECT doc_id, source FROM documents WHERE doc_id < 100),
        |bb AS (SELECT 95 + count(*) AS byte_base FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_merges_sf001.parquet')),
        |tok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN token_id = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS u,
        |    CAST(sum(CASE WHEN token_id >= (SELECT byte_base FROM bb)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_bf_oracle_sf001.parquet')
        |  GROUP BY 1)
        |SELECT b.source,
        |  CAST(SUM(tok.n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tok.u) AS BIGINT) AS n_unk,
        |  CAST(SUM(tok.nb) AS BIGINT) AS n_byte,
        |  CAST((SUM(tok.u) * 1000000) // SUM(tok.n) AS BIGINT)
        |    AS unk_micro
        |FROM base b JOIN tok USING (doc_id)
        |GROUP BY b.source""".stripMargin,
    // Byte-fallback encode: the independent Python byte-fallback
    // encoder's id stream (whitespace pre-tokens + UTF-8 byte
    // decomposition, planted non-ASCII tails included), compared
    // rank-for-rank like ns61.
    "ns190_bpe_byte_fallback" ->
      """SELECT doc_id, pos, token_id
        |FROM read_parquet('/root/repo/src/test/resources/graft/bpe_bf_oracle_sf001.parquet')""".stripMargin,
    // Pack segments: the ns180 offset window plus exact interval
    // intersection with the chunk grid, replayed from the same
    // independent lens — a conversation spanning packs emits one
    // row per pack it touches.
    "ns184_sft_pack_segments" ->
      """WITH lens AS (
        |  SELECT conversation_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM read_parquet(
        |'/root/repo/src/test/resources/graft/sft_oracle_sf001.parquet')
        |  GROUP BY 1),
        |off AS (SELECT conversation_id, n_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY conversation_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS s
        |  FROM lens),
        |seg AS (SELECT conversation_id, n_tokens, s,
        |    CAST(floor(s / 256.0) AS BIGINT) AS p0,
        |    CAST(floor((s + n_tokens - 1) / 256.0) AS BIGINT) AS p1
        |  FROM off WHERE n_tokens > 0)
        |SELECT CAST(t.p AS BIGINT) AS pack_id, conversation_id,
        |  CAST(greatest(s, t.p * 256) - t.p * 256 AS BIGINT)
        |    AS seg_start,
        |  CAST(least(s + n_tokens, (t.p + 1) * 256)
        |    - greatest(s, t.p * 256) AS BIGINT) AS seg_len
        |FROM seg, UNNEST(range(p0, p1 + 1)) AS t(p)""".stripMargin,
    // decode∘encode over the byte-fallback codec = the canonical
    // text EXACTLY (r14 — no whitespace caveat, no unk loss; the
    // planted non-ASCII tails roundtrip through UTF-8 byte tokens) —
    // a pure string prediction; any id that dropped its surface form
    // breaks the hash.
    "ns77_bpe_decode_roundtrip" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text ||
        |      CASE WHEN doc_id % 9 = 0 THEN ' é μ' ELSE '' END)),
        |      '\s+', ' ', 'g') AS canon
        |  FROM documents)
        |SELECT doc_id, canon AS decoded,
        |  CAST(length(canon) AS BIGINT) AS n_chars_decoded
        |FROM c""".stripMargin,
  )
}
