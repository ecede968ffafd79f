package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Format detection + routing — the single front door over a MIXED
  * corpus. Real crawl/document dumps interleave HTML pages, markdown
  * files, and plain text in one table; upstream of any extractor the
  * pipeline must decide per document which stage-0 applies
  * ([[Html.mainContent]], [[Markdown.markdownToText]], or plain
  * whitespace normalization).
  *
  * Spark-first shape: detection is one codegen'd CASE projection;
  * routing is three filtered branches over the (cached) payload
  * frame unioned back together — each branch is the already-gated
  * extractor unchanged, so the router adds no new extraction logic,
  * only the dispatch. All three branches stay map-side; the union is
  * a plan-level concatenation (no shuffle), so at 100 TB the router
  * costs the same scans the extractors would cost anyway.
  *
  * Detection rules (ordered, deterministic, declared):
  *  1. payload whose first non-space char is `<` → html;
  *  2. else a fence token anywhere, or a leading `# ` → markdown;
  *  3. else plain.
  */
object Router {

  /** Ordered-rule format tag as a Column (see object doc). */
  def detectFormat(payload: Column): Column =
    when(ltrim(payload).startsWith("<"), lit("html"))
      .when(payload.contains("```") ||
        ltrim(payload).startsWith("# "), lit("markdown"))
      .otherwise(lit("plain"))

  /** Route each document through its format's extractor; output one
    * row per input doc: (idCol, fmt, text_out). Malformed HTML keeps
    * its quarantine semantics (null text_out — the j04 contract
    * surfaces through the router untouched). */
  def routeAndExtract(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val tagged = df.select(col(idCol), col(payloadCol),
      detectFormat(col(payloadCol)).as("fmt"))
    val html = Html.mainContent(
      tagged.filter(col("fmt") === "html"), idCol, payloadCol)
      .select(col(idCol), lit("html").as("fmt"),
        col("main_text").as("text_out"))
    val md = Markdown.markdownToText(
      tagged.filter(col("fmt") === "markdown"), idCol, payloadCol)
      .select(col(idCol), lit("markdown").as("fmt"),
        col("md_text").as("text_out"))
    val plain = tagged.filter(col("fmt") === "plain")
      .select(col(idCol), col("fmt"),
        trim(regexp_replace(col(payloadCol), "\\s+", " "))
          .as("text_out"))
    html.unionByName(md).unionByName(plain)
  }
}
