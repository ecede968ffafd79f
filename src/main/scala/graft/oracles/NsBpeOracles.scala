package graft.oracles

/** DuckDB oracle SQL for BPE tokenizer queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsBpeOracles {
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
    // decode∘encode = canonical text minus the whitespace the
    // pre-tokenizer discards — a pure string prediction; any id that
    // dropped its surface form breaks the hash.
    "ns77_bpe_decode_roundtrip" ->
      """SELECT doc_id,
        |  replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |    ' ', '') AS decoded,
        |  CAST(length(replace(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ', '')) AS BIGINT) AS n_chars_decoded
        |FROM documents""".stripMargin,
  )
}
