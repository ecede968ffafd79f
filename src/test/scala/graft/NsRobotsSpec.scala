package graft

import org.apache.spark.sql.functions._

import graft.ns.Robots

class NsRobotsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(robots: String) =
    Robots.parseRobots(Seq((1L, robots)).toDF("doc_id", "robots"),
      "doc_id", "robots")
      .select(col("grp"), col("agent"), col("directive"), col("value"))
      .as[(Long, String, String, String)].collect().toSet

  test("consecutive user-agent lines share ONE group; a later ua " +
      "line opens a new one") {
    val out = parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: c\nDisallow: /y")
    // RFC 9309 group sharing: the shared group's rule fans out to
    // EVERY agent of the run (round-11 ADVICE: attributing it only
    // to the last agent let agent `a` over-crawl via the * group)
    assert(out == Set((1L, "a", "disallow", "/x"),
      (1L, "b", "disallow", "/x"),
      (2L, "c", "disallow", "/y")))
  }

  test("decision for a NON-LAST agent of a multi-ua group uses its " +
      "own group, not *; agent match is case-insensitive") {
    val rules = Robots.parseRobots(Seq((1L,
      "User-agent: *\nDisallow: /p/\n" +
        "User-agent: a\nUser-agent: GoodBot\nDisallow: /s/"))
      .toDF("doc_id", "robots"), "doc_id", "robots")
    val probes = Seq(
      (1L, "a", "/p/x"),        // own group has no /p rule: allowed
      (1L, "a", "/s/x"),        // own group blocks /s
      (1L, "goodbot", "/s/x"),  // lowercase probe vs mixed-case ua
      (1L, "GOODBOT", "/p/x"),  // uppercase probe, own group decides
      (1L, "ghost", "/p/x"))    // no group: * blocks
      .toDF("doc_id", "probe_agent", "path")
    val out = Robots.robotsAllowed(rules, probes, "doc_id")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(out == Map(
      ("a", "/p/x") -> true, ("a", "/s/x") -> false,
      ("goodbot", "/s/x") -> false, ("GOODBOT", "/p/x") -> true,
      ("ghost", "/p/x") -> false))
  }

  test("orphan rules drop, unknown keys ignored, comments strip, " +
      "sitemap is global wherever it appears") {
    val out = parse(
      "Disallow: /orphan\nNoindex: /x\n# full comment\n" +
        "User-agent: * # trailing comment\nAllow: /a\n" +
        "Sitemap: https://s.example/map.xml")
    assert(out == Set((1L, "*", "allow", "/a"),
      (0L, "", "sitemap", "https://s.example/map.xml")))
  }

  test("sitemap parse: urlset vs index, entity decode in loc, " +
      "missing fields null, map-side plan") {
    val xml =
      "<?xml version=\"1.0\"?>\n<urlset>\n" +
        "<url><loc>https://s.example/p?a=1&amp;b=2</loc>" +
        "<lastmod>2026-02-03</lastmod></url>\n" +
        "<url><loc>https://s.example/q</loc>" +
        "<priority>0.5</priority></url>\n</urlset>"
    val df = Robots.parseSitemap(
      Seq((1L, xml)).toDF("doc_id", "xml"), "doc_id", "xml")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val out = df.as[(Long, String, Long, String, Option[String],
      Option[String])].collect().sortBy(_._3).toSeq
    assert(out == Seq(
      (1L, "urlset", 0L, "https://s.example/p?a=1&b=2",
        Some("2026-02-03"), None),
      (1L, "urlset", 1L, "https://s.example/q", None, Some("0.5"))))
    val ix = Robots.parseSitemap(Seq((2L,
      "<sitemapindex><sitemap><loc>https://s.example/a.xml</loc>" +
        "</sitemap></sitemapindex>")).toDF("doc_id", "xml"),
      "doc_id", "xml")
      .as[(Long, String, Long, String, Option[String], Option[String])]
      .collect().toSeq
    assert(ix == Seq((2L, "index", 0L, "https://s.example/a.xml",
      None, None)))
  }

  test("wildcard rules (RFC 9309 §2.2.3): * spans, trailing $ " +
      "anchors, dots stay literal, longest value wins") {
    val rules = Robots.parseRobots(Seq((1L,
      "User-agent: *\nDisallow: /*.json$\nDisallow: /tmp*\n" +
        "Allow: /tmp/keep$\nDisallow: /exact$"))
      .toDF("doc_id", "robots"), "doc_id", "robots")
    val probes = Seq(
      (1L, "w", "/data/a.json"),   // *.json$ hits
      (1L, "w", "/data/a.jsonx"),  // $ anchor rejects
      (1L, "w", "/data/aXjson"),   // '.' is literal, not regex-any
      (1L, "w", "/tmp/x"),         // star prefix
      (1L, "w", "/tmp/keep"),      // longer Allow carve-out wins
      (1L, "w", "/exact"),         // exact anchor hits
      (1L, "w", "/exactly"))       // and rejects the extension
      .toDF("doc_id", "probe_agent", "path")
    val out = Robots.robotsAllowed(rules, probes, "doc_id")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._3 -> r._4).toMap
    assert(out == Map(
      "/data/a.json" -> false, "/data/a.jsonx" -> true,
      "/data/aXjson" -> true, "/tmp/x" -> false,
      "/tmp/keep" -> true, "/exact" -> false, "/exactly" -> true))
  }

  test("decisions: longest match wins, Allow wins length ties, " +
      "empty disallow allows all, unknown agent falls back to *") {
    val rules = Robots.parseRobots(Seq((1L,
      "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n" +
        "Disallow: /tie/\nAllow: /tie/\n" +
        "User-agent: bot\nDisallow:")).toDF("doc_id", "robots"),
      "doc_id", "robots")
    val probes = Seq(
      (1L, "*", "/p/x"), (1L, "*", "/p/ok/x"), (1L, "*", "/tie/x"),
      (1L, "*", "/free"), (1L, "bot", "/p/x"), (1L, "ghost", "/p/x"))
      .toDF("doc_id", "probe_agent", "path")
    val out = Robots.robotsAllowed(rules, probes, "doc_id")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(out == Map(
      ("*", "/p/x") -> false,       // disallow prefix
      ("*", "/p/ok/x") -> true,     // longer allow wins
      ("*", "/tie/x") -> true,      // equal length: allow wins
      ("*", "/free") -> true,       // no match
      ("bot", "/p/x") -> true,      // empty disallow = allow all
      ("ghost", "/p/x") -> false))  // falls back to * group
  }
}
