package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation.
  *
  * A curated training corpus is rebuilt on a cadence (re-crawl,
  * re-filter, re-dedup), and the first question about any rebuild is
  * the delta: which documents appeared, vanished, or changed content
  * since the last snapshot. The diff drives incremental downstream
  * work (re-embed only `changed`+`added`), audit ("why did 3% of the
  * corpus vanish?"), and retention rules.
  *
  * Reference behavior analogue: the skip-if-exists / idempotent
  * restatement family (sandbox-data-pipeline's S2/O10 guards decide
  * per-partition freshness; this is the same decision at per-document
  * granularity across two full snapshots).
  */
object Snapshot {

  /** Full-snapshot diff by content fingerprint: one output row per
    * document id present in EITHER snapshot, labeled
    * `added` (new only), `removed` (old only), `changed` (both, md5
    * differs), or `unchanged`. Comparison is on md5 of the raw
    * content column — byte-identity, not canonical-text identity;
    * compose with [[Dedup.normText]] upstream when whitespace churn
    * should not count as change.
    *
    * Plan shape: ONE full outer sort-merge join keyed on the id —
    * the floor for reconciling two unordered snapshots. Each side
    * projects to (id, 16-byte fingerprint) before the exchange, so
    * the shuffle carries fingerprints, never document payloads. At
    * 100 TB, store both snapshots bucketed by id and the exchange
    * disappears entirely (the o10-family bucketed-write path);
    * either way the work is linear in ids, and the common
    * `unchanged` mass never leaves its partition.
    *
    * Output: (idCol, status, old_fp, new_fp). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("__old_id"),
      md5(col(contentCol)).as("old_fp"))
    val n = newSnap.select(col(idCol).as("__new_id"),
      md5(col(contentCol)).as("new_fp"))
    o.join(n, col("__old_id") === col("__new_id"), "full_outer")
      .select(
        coalesce(col("__old_id"), col("__new_id")).as(idCol),
        when(col("__old_id").isNull, "added")
          .when(col("__new_id").isNull, "removed")
          // null-unsafe equality on purpose: a null fingerprint (null
          // content) on either side is never "unchanged"
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Roll the per-document diff up to audit counts — one
    * map-combinable aggregation over [[snapshotDiff]]'s output.
    * Output: (status, n). */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Content-addressed corpus fingerprint: one audit row per table
    * slice — row count plus an ORDER-INDEPENDENT content checksum
    * (the exact-integer sum of each row's md5-derived 32-bit word
    * over the named columns, \u0001-joined so adjacent fields can't
    * alias). Two corpus versions are
    * byte-identical on those columns iff their fingerprint rows
    * match, and the checksum is re-derivable by any engine — the
    * dataset-versioning primitive that pairs with the per-shard
    * manifest (ns80): manifest says which docs are in which file,
    * fingerprint says which CORPUS this is. One map-side projection
    * + one map-combinable agg; nothing but a single row crosses the
    * wire per table. Output: (table_name, n_rows, content_checksum).
    *
    * Null handling: each column is coalesced to the explicit
    * sentinel `\u0000null` BEFORE joining — `concat_ws` silently
    * skips nulls, which would make (x, NULL) and (NULL, x) hash
    * identically and break the "byte-identical iff fingerprints
    * match" claim on nullable columns. The sentinel starts with a
    * NUL byte no cast-to-string value can produce, so it cannot
    * collide with a real value. The oracle mirrors it as
    * `coalesce(CAST(c AS VARCHAR), chr(0) || 'null')`. */
  def corpusFingerprint(df: DataFrame, name: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one content column")
    val h = conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"),
        lit("\u0000null"))): _*)), 1, 8), 16, 10)
      .cast("long")
    df.select(h.as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__h")), lit(0L)).as("content_checksum"))
      .select(lit(name).as("table_name"), col("n_rows"),
        col("content_checksum"))
  }
}
