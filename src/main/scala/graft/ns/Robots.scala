package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + fetch decisions — the crawl-politeness
  * semantics every web pipeline's stage −2 must honor (the Robots
  * Exclusion Protocol, RFC 9309). [[TextOps.crawlFrontier]] builds
  * WHAT to fetch; this module decides what a polite crawler MAY
  * fetch.
  *
  * Parse model (RFC 9309 shapes, declared precisely so the gate is
  * exact):
  *  - comments (`#` to end of line) strip first; blank lines are
  *    group-internal separators only;
  *  - a `User-agent:` line opens a group; CONSECUTIVE user-agent
  *    lines share one group (a group id increments only on a ua
  *    line whose previous parsed line is not ua);
  *  - `Allow:` / `Disallow:` / `Crawl-delay:` lines belong to the
  *    current group; before any group they are orphans and are
  *    DROPPED (per the RFC, rules outside a group have no effect);
  *  - `Sitemap:` is a global directive (group 0, empty agent)
  *    wherever it appears;
  *  - unknown keys are ignored.
  *
  * Decision model ([[robotsAllowed]]): the probe's agent group is
  * used when that agent has ANY group, else the `*` group; a rule
  * matches iff its value is a non-empty prefix of the path (an empty
  * `Disallow:` matches nothing — "allow all"); the LONGEST matching
  * value wins, Allow winning length ties; no matching rule means
  * allowed. This is the published longest-match rule (RFC 9309
  * §2.2.2).
  *
  * Plan shape: parsing fans lines out with posexplode and assigns
  * groups with two windows keyed on the doc — one exchange on the
  * robots-file id. robots.txt is per-DOMAIN metadata: at 100 TB of
  * corpus the robots table is millions of tiny files, orders of
  * magnitude below content volume, so a keyed window here is noise
  * next to the content scans it protects. Decisions are two keyed
  * equi-joins plus a bounded per-probe argmax.
  */
object Robots {

  /** Parse robots payloads. Output: (idCol, grp, agent, directive,
    * value, ord) — grp 0 + empty agent for global `sitemap` rows,
    * 1-based groups otherwise; ord is the source line index.
    *
    * Consumer contract (round-12 advice): RFC 9309 group sharing
    * fans EVERY directive — crawl-delay included — out once per
    * agent of a multi-User-agent group. A consumer that joins
    * crawl-delay rows by (id, domain) without first narrowing to one
    * agent (or selecting distinct values) would duplicate its join
    * rows on such files; the ns167 schedule consumer therefore
    * selects DISTINCT (domain, delay) before joining the frontier. */
  def parseRobots(df: DataFrame, idCol: String,
      robotsCol: String): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(robotsCol), "\n")).as(Seq("ord", "raw")))
    val parsed = lines
      .select(col(idCol), col("ord"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .filter(col("line").contains(":"))
      .select(col(idCol), col("ord"),
        lower(trim(substring_index(col("line"), ":", 1))).as("key"),
        trim(expr("substring(line, instr(line, ':') + 1)")).as("value"))
      .filter(col("key").isin(
        "user-agent", "allow", "disallow", "crawl-delay", "sitemap"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("ord"))
    val isUa = col("key") === "user-agent"
    val grouped = parsed
      .withColumn("__ua_start",
        (isUa && coalesce(
          lag(col("key"), 1).over(w) =!= "user-agent", lit(true)))
          .cast("long"))
      .withColumn("__grp",
        sum(col("__ua_start")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // RFC 9309 group sharing: a group opened by K consecutive
      // User-agent lines applies its rules to ALL K agents, so each
      // rule row fans out over the run's agent SET (round-11 ADVICE:
      // keeping only the last agent silently decided the earlier
      // agents by the `*` group — an over-crawl). Product tokens are
      // case-insensitive (RFC 9309 §2.2.1) — lowercase at parse.
      .withColumn("__agents",
        collect_set(when(isUa, lower(col("value"))))
          .over(Window.partitionBy(col(idCol), col("__grp"))))
    val ruleRows = grouped.filter(!isUa)
    val sitemapRows = ruleRows.filter(col("key") === "sitemap")
      .select(col(idCol), lit(0L).as("grp"), lit("").as("agent"),
        col("key").as("directive"), col("value"),
        col("ord").cast("long").as("ord"))
    // explode of an empty agent set drops orphan rules (no group open
    // yet) — per the RFC they have no effect.
    val groupRows = ruleRows.filter(col("key") =!= "sitemap")
      .select(col(idCol), col("__grp").as("grp"),
        explode(col("__agents")).as("agent"),
        col("key").as("directive"), col("value"),
        col("ord").cast("long").as("ord"))
    sitemapRows.unionByName(groupRows)
  }

  /** Closed-form robots fixture, one file per doc (standing in for
    * one per domain): fixed 13-line layout so every parsed row's
    * source position is a constant. Exercises: comment-only line 0,
    * an ORPHAN disallow before any group (id%9==4; must drop), a
    * global Sitemap before the first group, an inline comment on the
    * User-agent line, a disallow/allow longest-match pair, a
    * crawl-delay, a second group whose empty Disallow means
    * allow-all, and a third group SHARED by two consecutive
    * User-agent lines (one of them mixed-case) whose single rule must
    * fan out to both agents. Output: (idCol, robots). */
  def buildRobotsFixture(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast("string")
    docs.select(col(idCol), concat(
      lit("# robots for doc "), id, lit("\n"),
      when(col(idCol) % 9 === 4,
        concat(lit("Disallow: /orphan"), id, lit("/")))
        .otherwise(lit("")), lit("\n"),
      lit("Sitemap: https://maps.example.com/d/"), id, lit(".xml\n"),
      lit("User-agent: * # all agents\n"),
      lit("Disallow: /private"), id, lit("/\n"),
      lit("Allow: /private"), id, lit("/ok/\n"),
      lit("Crawl-delay: "), (col(idCol) % 5 + 1).cast("string"),
      lit("\n\nUser-agent: graftbot\nDisallow:\n"),
      lit("User-agent: AlphaBot\nUser-agent: betabot\n"),
      lit("Disallow: /shared"), id, lit("/")).as("robots"))
  }

  /** Sitemap XML parsing (sitemaps.org protocol) — the discovery
    * side robots' `Sitemap:` rows point at: `<urlset>` files list
    * page URLs (loc/lastmod/priority), `<sitemapindex>` files list
    * child sitemaps. One map-side projection: block extraction with
    * a non-greedy regexp over the entry tags, field extraction per
    * block, the five standard XML entities decoded in loc (an
    * escaped `&amp;` in a query string must surface as `&` — the
    * ns105 decode contract). Empty fields → null. Output: (idCol,
    * kind 'urlset'|'index', ord, loc, lastmod, priority). */
  def parseSitemap(df: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    val kind = when(col(xmlCol).contains("<sitemapindex"),
      lit("index")).otherwise(lit("urlset"))
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))
    df.select(col(idCol), kind.as("kind"),
      posexplode(blocks).as(Seq("ord", "b")))
      .select(col(idCol), col("kind"), col("ord").cast("long").as("ord"),
        Html.decodeEntities(
          regexp_extract(col("b"), "(?s)<loc>(.*?)</loc>", 1)).as("loc"),
        nullif(regexp_extract(col("b"),
          "(?s)<lastmod>(.*?)</lastmod>", 1), lit("")).as("lastmod"),
        nullif(regexp_extract(col("b"),
          "(?s)<priority>(.*?)</priority>", 1), lit("")).as("priority"))
  }

  /** Closed-form sitemap fixture: docs with id%8==6 are sitemap
    * INDEX files pointing at two child sitemaps; the rest are
    * urlsets with 1 + id%3 entries — entry 0 carries an
    * entity-escaped query string (the decode trap) and a lastmod;
    * later entries carry a priority instead. Output: (idCol, xml). */
  def buildSitemapFixture(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast("string")
    val urlEntry0 = concat(
      lit("<url><loc>https://maps.example.com/p/"), id,
      lit("-0?a="), id, lit("&amp;b=2</loc><lastmod>2026-0"),
      (col(idCol) % 9 + 1).cast("string"),
      lit("-11</lastmod></url>\n"))
    def laterEntry(k: Int) = when(col(idCol) % 3 >= k,
      concat(lit("<url><loc>https://maps.example.com/p/"),
        id, lit(s"-$k</loc><priority>0."),
        ((col(idCol) + k) % 9 + 1).cast("string"),
        lit("</priority></url>\n"))).otherwise(lit(""))
    val urlset = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
      urlEntry0, laterEntry(1), laterEntry(2), lit("</urlset>"))
    val index = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<sitemapindex>\n" +
        "<sitemap><loc>https://maps.example.com/d/"), id,
      lit("/sitemap-a.xml</loc>" +
        "<lastmod>2026-01-05</lastmod></sitemap>\n" +
        "<sitemap><loc>https://maps.example.com/d/"), id,
      lit("/sitemap-b.xml</loc></sitemap>\n</sitemapindex>"))
    docs.select(col(idCol),
      when(col(idCol) % 8 === 6, index).otherwise(urlset).as("xml"))
  }

  /** Fetch decisions for (idCol, probe_agent, path) probes against
    * [[parseRobots]] output (see object doc for the rule). Output:
    * (idCol, probe_agent, path, allowed). */
  def robotsAllowed(rules: DataFrame, probes: DataFrame,
      idCol: String): DataFrame = {
    val ad = rules.filter(col("directive").isin("allow", "disallow"))
      .select(col(idCol), col("agent"), col("directive"), col("value"))
    // Product-token matching is case-insensitive (RFC 9309 §2.2.1):
    // stored agents are lowercased at parse; probes lowercase here
    // for the joins while the output keeps the caller's casing.
    val hasAgent = ad.select(col(idCol), col("agent")).distinct()
      .withColumnRenamed("agent", "__pa")
      .withColumn("__has", lit(true))
    val eff = probes
      .withColumn("__pa", lower(col("probe_agent")))
      .join(hasAgent, Seq(idCol, "__pa"), "left")
      .withColumn("agent",
        when(col("__has"), col("__pa")).otherwise(lit("*")))
      .select(col(idCol), col("probe_agent"), col("path"), col("agent"))
    // RFC 9309 §2.2.3 special characters (r12): `*` matches any
    // character sequence, a trailing `$` anchors the pattern at the
    // path's end. Wildcard-free values keep the plain prefix fast
    // path (bit-identical to the pre-wildcard behavior); values
    // carrying a wildcard translate to an anchored regex — every
    // regex metachar escaped, then `\*` → `.*` and a trailing `\$`
    // restored to the anchor. Precedence stays "longest VALUE wins"
    // (wildcards count as one octet each, the published rule).
    val hasWild = col("value").contains("*") ||
      col("value").endsWith("$")
    val escaped = regexp_replace(col("value"),
      "([\\\\.^$|?*+\\[\\]{}()])", "\\\\$1")
    val rx = concat(lit("^"),
      regexp_replace(regexp_replace(escaped, "\\\\\\*", ".*"),
        "\\\\\\$$", "\\$"))
    val matched = eff
      .join(ad, Seq(idCol, "agent"))
      .withColumn("__rx", rx)
      .filter(col("value") =!= "" &&
        when(hasWild, expr("path rlike __rx"))
          .otherwise(col("path").startsWith(col("value"))))
      .groupBy(col(idCol), col("probe_agent"), col("path"))
      .agg(max(struct(length(col("value")).as("len"),
        (col("directive") === "allow").as("is_allow"))).as("best"))
    eff.join(matched, Seq(idCol, "probe_agent", "path"), "left")
      .select(col(idCol), col("probe_agent"), col("path"),
        coalesce(col("best.is_allow"), lit(true)).as("allowed"))
  }
}
