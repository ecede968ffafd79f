package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown → text extraction — the stage-0 sibling of [[Html]] for
  * markdown-native corpora (READMEs, documentation sites, forum and
  * issue-tracker exports all arrive as markdown, not HTML; a text
  * curation chain needs both front doors).
  *
  * Spark-first design, the [[Html.mainContent]] recipe: ONE codegen'd
  * projection per document — a split on the fence token carves the
  * document into outside/inside-code segments (the WARC/WAV
  * chunk-walk shape applied to text), the inside segments are
  * dropped whole, and the surviving text runs through an ORDERED
  * regexp/literal rule chain. No external parser, no UDF, zero
  * shuffles; linear in bytes.
  *
  * Rule order is semantic, not cosmetic, and the fixture traps it:
  *  1. fenced code is removed FIRST (a `# heading` or `[link](u)`
  *     inside a fence must never surface as text — the ns105
  *     script-strip trap restated for markdown); CommonMark's
  *     unterminated-fence rule applies — a dangling fence swallows
  *     the rest of the document;
  *  2. images before links (`![alt](url)` contains a link lookalike;
  *     reversed order would leave a stray `!`);
  *  3. structural line rules (ATX headers, blockquote markers, hr
  *     lines, table delimiter rows, list markers) while line
  *     structure still exists;
  *  4. table pipes → spaces, THEN emphasis/inline-code literal
  *     strips (`**`, `__`, `*`, backtick). Single `_` is left alone
  *     deliberately: stripping it would corrupt snake_case
  *     identifiers, the dominant use of `_` in technical corpora;
  *  5. whitespace collapse last.
  *
  * Output: (idCol, md_text, n_links, n_code_spans) — n_links counts
  * link/image constructs OUTSIDE code (the read side of a link-
  * density gate), n_code_spans the dropped fence segments.
  */
object Markdown {

  private val fence = "```"

  /** The ordered rule chain over outside-of-code text (see object
    * doc for why this order). Exposed for the spec's law tests. */
  def stripMarkdown(c: Column): Column = {
    val img = regexp_replace(c, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val lnk = regexp_replace(img, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val hdr = regexp_replace(lnk, "(?m)^#{1,6} ", "")
    val bq = regexp_replace(hdr, "(?m)^(> )+", "")
    val hr = regexp_replace(bq, "(?m)^(-{3,}|\\*{3,}|_{3,})$", "")
    val tdelim = regexp_replace(hr, "(?m)^\\|[-:| ]+\\|$", "")
    val pipes = replace(tdelim, lit("|"), lit(" "))
    val lists = regexp_replace(pipes, "(?m)^([-+*]|\\d{1,9}\\.) ", "")
    val emph = replace(replace(replace(lists,
      lit("**"), lit("")), lit("__"), lit("")), lit("*"), lit(""))
    val code = replace(emph, lit("`"), lit(""))
    trim(regexp_replace(code, "\\s+", " "))
  }

  /** Extraction (see object doc). The fence split produces segments
    * that alternate outside/inside code by position — even indices
    * are prose, odd are code — so an unterminated trailing fence
    * leaves its remainder at an odd index and it drops naturally
    * (CommonMark's run-to-EOF rule for free). The segment array is
    * materialized behind its own projection so the per-segment
    * lambda work stays O(segments) (the TextOps.topGramCol idiom).
    */
  def markdownToText(df: DataFrame, idCol: String,
      mdCol: String): DataFrame = {
    val s1 = df.select(col(idCol),
      split(col(mdCol), java.util.regex.Pattern.quote(fence))
        .as("__segs"))
    val s2 = s1.select(col(idCol),
      array_join(filter(col("__segs"), (_, i) => i % 2 === 0), "\n")
        .as("__prose"),
      (floor(size(col("__segs")) / 2)).cast("long").as("n_code_spans"))
    s2.select(col(idCol),
      stripMarkdown(col("__prose")).as("md_text"),
      regexp_count(col("__prose"), lit("\\[[^\\]]*\\]\\([^)]*\\)"))
        .cast("long").as("n_links"),
      col("n_code_spans"))
  }

  /** Closed-form markdown fixture: every byte a formula of
    * (doc_id, text) so a DuckDB oracle predicts the extractor's
    * exact output without a markdown parser (the ns105 trick).
    * Anatomy and what each part exercises:
    *  - ATX header `# Doc {id}` — header strip keeps the title text;
    *  - the document text as plain paragraph prose — must survive
    *    verbatim (modulo whitespace collapse);
    *  - a blockquote with `**bold**` and backtick spans — marker and
    *    emphasis strips;
    *  - a list whose items hold a link (and, for even ids, an
    *    image) — marker strip + link/image text extraction, and the
    *    n_links read-out varies by class;
    *  - a fenced block containing a FAKE header and a FAKE link —
    *    the strip-order trap: surfacing either means fence removal
    *    ran too late;
    *  - a two-row table with delimiter row, then a `***` hr — both
    *    structural rules;
    *  - docs with id % 13 == 5 get an UNTERMINATED trailing fence
    *    plus a secret tail that must vanish (run-to-EOF rule). */
  def buildMarkdownFixture(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol).cast("string")
    docs.select(col(idCol), concat(
      lit("# Doc "), id, lit("\n\n"),
      col(textCol), lit("\n\n"),
      lit("> notes with **bold"), id, lit("** and `code"), id,
      lit("` inline\n\n"),
      lit("- first [item "), id,
      lit("](http://www.example.com/d/"), id, lit(")\n"),
      when(col(idCol) % 2 === 0,
        concat(lit("- second ![fig "), id,
          lit("](http://img.example.com/"), id, lit(".png) shown\n")))
        .otherwise(lit("- second shown\n")),
      lit("\n```\n# not a header "), id,
      lit("\n[not a link](http://no.example.com/x)\n```\n\n"),
      lit("| col | val"), id, lit(" |\n| --- | --- |\n| a"), id,
      lit(" | b |\n\n***\n"),
      when(col(idCol) % 13 === 5,
        concat(lit("```\nsecret tail "), id)).otherwise(lit("")))
      .as("md"))
  }
}
