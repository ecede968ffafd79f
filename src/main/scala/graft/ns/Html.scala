package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text main-content extraction — stage 0 of the public
  * web-corpus curation recipe (C4, CCNet, Dolma all start from raw
  * HTML; the engine's curation chain previously started from
  * already-extracted text, cf. p05).
  *
  * Reference behavior analogue: the declared-schema ingest +
  * malformed-row quarantine family (S6 — /root/reference/dags/
  * sandbox_data_pipeline.py:64 loads declared JSON payloads, and
  * this repo's CSV path j04 quarantines rows that do not parse) —
  * here the "schema" is well-formed markup and the quarantine is
  * structural.
  *
  * Spark-first design: the whole extractor is ONE codegen'd
  * projection per page — regexp strips, an array split on block-close
  * tags, and per-block string ops. No external parser, no UDF, zero
  * shuffles; linear in page bytes, so at 100 TB it scales exactly
  * like the scan. The per-block lambda work is kept O(blocks) by
  * materializing the block array behind a projection boundary first
  * (the TextOps.topGramCol idiom — Spark HOF lambdas are interpreted
  * and re-evaluate captured expressions per element).
  *
  * The extraction heuristic is the standard text-density rule
  * (boilerpipe/jusText shape, shrunk to two checked-in constants so
  * the gate is exact):
  *
  *  1. `<script>`/`<style>` blocks are removed WHOLE (their bodies
  *     are code, and may contain tag-lookalikes that must never
  *     surface as text);
  *  2. the page splits into blocks at block-level closing tags
  *     (`</p>`, `</div>`, `</li>`, headings, `<br>`, ...);
  *  3. each block's visible text = tags stripped, the five standard
  *     entities decoded (`&amp;` LAST, so double-escapes round-trip),
  *     whitespace collapsed;
  *  4. a block is main content iff its text is at least `minLen`
  *     chars AND not link-dominated (`links * linkWeight <
  *     text_len` — navigation and "related articles" rows are short
  *     or link-heavy, body prose is neither).
  *
  * Malformed-markup quarantine: a page whose `<script>`/`<style>`
  * opens and closes do not balance cannot be block-split safely (an
  * unterminated script swallows the rest of the page); it is flagged
  * `malformed` with null extraction columns instead of contributing
  * garbage text — the j04 CsvIngest quarantine contract at page
  * granularity.
  */
object Html {

  /** Escape text for embedding in HTML (fixture builder side):
    * `&` first, then `<` and `>`, so decoding (`&amp;` last) is an
    * exact inverse even when the raw text already contains entity
    * lookalikes. */
  def escapeHtml(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** Decode the five standard entities; `&amp;` LAST (exact inverse
    * of [[escapeHtml]] — see its note on double-escapes). */
  def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))

  private val blockCloseRe =
    "(?i)</(p|div|h[1-6]|li|tr|title|nav|footer|header|ul|ol|table|blockquote)\\s*>|<br\\s*/?>"
  private val scriptStyleRe =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>"

  /** Closed-form HTML fixture: wraps each document's text in a full
    * page whose EVERY byte is a deterministic formula of (id, text),
    * so a DuckDB oracle can predict the extractor's exact output
    * without parsing HTML (the ns63/ns85 closed-form-fixture trick).
    *
    * Page anatomy, and what each part exercises:
    *  - `<title>`/`<nav>`: short / link-heavy boilerplate — dropped;
    *  - a `<style>` block and a `<script>` block whose body contains
    *    a long `<p>...</p>` lookalike — a strip-ORDER trap: if
    *    script removal ran after block-splitting, a fake paragraph
    *    long enough to pass the density rule would surface;
    *  - the text, HTML-escaped and chunked into `chunkWords`-word
    *    `<p>` paragraphs — kept iff >= `minLen` chars (mirrored by
    *    the oracle on the same chunk formula);
    *  - one entity paragraph (`&amp;`, `&lt;`, `&gt;`) — exercises
    *    decode, always long enough to keep;
    *  - a "related" paragraph: 4 links around 58 chars of text —
    *    long enough to pass the length rule, dropped ONLY by link
    *    density;
    *  - a short `<footer>` — dropped by length.
    *
    * Docs with `id % 17 == 3` get an UNTERMINATED script tag — the
    * malformed-quarantine subset, predictable by the oracle.
    *
    * Output: (idCol, carry..., html). */
  def buildHtmlFixture(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carry: Seq[String] = Seq("source"),
      chunkWords: Int = 12): DataFrame = {
    require(chunkWords >= 1, "chunkWords must be positive")
    val id = col(idCol).cast("string")
    val s1 = docs.select(col(idCol) +: carry.map(col) :+
      split(regexp_replace(trim(col(textCol)), "\\s+", " "), " ")
        .as("__words"): _*)
    val nc = floor((size(col("__words")) + (chunkWords - 1))
      / chunkWords).cast("int")
    val paras = transform(sequence(lit(0), nc - 1), k =>
      concat(lit("<p>"),
        escapeHtml(array_join(
          slice(col("__words"), k * chunkWords + 1, lit(chunkWords)), " ")),
        lit("</p>")))
    s1.select(col(idCol) +: carry.map(col) :+
      concat(
        lit("<html><head><title>Doc "), id, lit("</title>\n"),
        lit("<style>body { font: 14px serif; }</style>\n"),
        when(col(idCol) % 17 === 3,
          // quarantine subset: script never closes
          lit("<script>var broken = 1;\n"))
          .otherwise(lit("<script>var t = \"<p>this paragraph lives " +
            "inside a script tag and must never survive extraction" +
            "</p>\";</script>\n")),
        lit("</head>\n<body>\n<nav><a href=\"/\">Home</a> | <a href=\"/d/"),
        id, lit("\">Self</a></nav>\n<div id=\"main\">\n"),
        array_join(paras, "\n"),
        lit("\n<p>Q&amp;A &lt;tags&gt; and entities stay readable " +
          "after decoding in doc "), id, lit("</p>\n</div>\n"),
        lit("<p class=\"related\"><a href=\"/r/1\">one</a> " +
          "<a href=\"/r/2\">two</a> <a href=\"/r/3\">three</a> " +
          "<a href=\"/r/4\">four</a> related reading from around " +
          "the network</p>\n"),
        lit("<footer>Copyright 2026 Example Corp</footer>\n" +
          "</body></html>")).as("html"): _*)
  }

  /** Main-content extraction (see object doc for the algorithm).
    * Output: (idCol, status, n_blocks, n_kept, main_text) — one row
    * per page; `malformed` pages carry null extraction columns.
    * n_blocks counts blocks with ANY visible text; n_kept those that
    * passed the density rule; main_text re-joins kept blocks in
    * original order with newlines (order is positional in the block
    * array — no sort). */
  def mainContent(pages: DataFrame, idCol: String, htmlCol: String,
      minLen: Int = 30, linkWeight: Int = 40): DataFrame = {
    require(minLen >= 1 && linkWeight >= 1, "thresholds must be positive")
    def opens(tag: String) =
      size(split(col(htmlCol), s"(?i)<$tag\\b")) - 1
    def closes(tag: String) =
      size(split(col(htmlCol), s"(?i)</$tag\\b")) - 1
    val s1 = pages.select(col(idCol),
      (opens("script") =!= closes("script") ||
        opens("style") =!= closes("style")).as("__malformed"),
      split(regexp_replace(col(htmlCol), scriptStyleRe, " "),
        blockCloseRe).as("__blocks"))
    // One struct per block behind its own projection so the text /
    // link-count pair evaluates once per block (multi-referenced
    // non-cheap aliases stay pinned in their own Project).
    val s2 = s1.select(col(idCol), col("__malformed"),
      transform(col("__blocks"), b => struct(
        trim(regexp_replace(decodeEntities(
          regexp_replace(b, "<[^>]*>", " ")), "\\s+", " ")).as("txt"),
        (size(split(b, "(?i)<a[\\s>]")) - 1).as("links"))).as("__feats"))
    val s3 = s2.select(col(idCol), col("__malformed"),
      filter(col("__feats"), f => length(f("txt")) > 0).as("__seen"),
      filter(col("__feats"), f => length(f("txt")) >= minLen &&
        f("links") * linkWeight < length(f("txt"))).as("__kept"))
    s3.select(col(idCol),
      when(col("__malformed"), lit("malformed")).otherwise(lit("ok"))
        .as("status"),
      when(col("__malformed"), lit(null).cast("long"))
        .otherwise(size(col("__seen")).cast("long")).as("n_blocks"),
      when(col("__malformed"), lit(null).cast("long"))
        .otherwise(size(col("__kept")).cast("long")).as("n_kept"),
      when(col("__malformed"), lit(null).cast("string"))
        .otherwise(array_join(
          transform(col("__kept"), f => f("txt")), "\n"))
        .as("main_text"))
  }
}
