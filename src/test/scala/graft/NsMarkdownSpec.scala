package graft

import org.apache.spark.sql.functions._

import graft.ns.Markdown

class NsMarkdownSpec extends SparkSpec {
  import spark.implicits._

  private def extract(md: String): (String, Long, Long) =
    Markdown.markdownToText(Seq((1L, md)).toDF("doc_id", "md"),
      "doc_id", "md")
      .as[(Long, String, Long, Long)].collect().map(r =>
        (r._2, r._3, r._4)).head

  test("fenced code drops whole; fake header/link inside never surface") {
    val (txt, links, spans) = extract(
      "before\n```\n# fake header\n[fake](http://x.example.com)\n```\nafter")
    assert(txt == "before after")
    assert(links == 0L, "a link inside a fence must not count")
    assert(spans == 1L)
  }

  test("unterminated fence swallows the rest of the document") {
    val (txt, _, spans) = extract("keep this\n```\nsecret tail")
    assert(txt == "keep this")
    assert(spans == 1L)
  }

  test("image strips before link (no stray '!'), texts survive") {
    val (txt, links, _) = extract(
      "see ![alt text](http://i.example.com/p.png) and " +
        "[click here](http://e.example.com)")
    assert(txt == "see alt text and click here")
    assert(links == 2L)
  }

  test("structural rules: header, blockquote, hr, table, list markers") {
    val (txt, _, _) = extract(
      "## Title\n> > nested quote\n---\n| a | b |\n| --- | --- |\n" +
        "| c | d |\n- item\n1. numbered\n***")
    assert(txt == "Title nested quote a b c d item numbered")
  }

  test("emphasis strips but single underscore (snake_case) survives") {
    val (txt, _, _) = extract(
      "**bold** __also__ *em* and a snake_case_name stays")
    assert(txt == "bold also em and a snake_case_name stays")
  }

  test("fixture → extractor closed form matches the oracle prediction") {
    val docs = Seq(
      (4L, "alpha  beta gamma"), // even: image present; %13 != 5
      (5L, "delta epsilon"),     // odd and %13 == 5: unterminated tail
      (7L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = Markdown.markdownToText(
      Markdown.buildMarkdownFixture(docs), "doc_id", "md")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def expected(id: Long, nt: String): String =
      s"Doc $id $nt notes with bold$id and code$id inline first item $id" +
        (if (id % 2 == 0) s" second fig $id shown" else " second shown") +
        s" col val$id a$id b"
    assert(out(4L) == ((expected(4L, "alpha beta gamma"), 2L, 1L)))
    assert(out(5L) == ((expected(5L, "delta epsilon"), 1L, 2L)))
    assert(out(7L) == ((expected(7L, "zeta eta theta iota"), 1L, 1L)))
  }

  test("router: ordered detection rules, one row per doc, quarantine " +
      "and plain normalization survive the dispatch") {
    import graft.ns.Router
    val mixed = Seq(
      (1L, "<html><body><p>a page</p></body></html>"),
      (2L, "# Title\n\nsome markdown"),
      (3L, "fenced\n```\ncode\n```\nonly"),
      (4L, "  just   plain  text  "),
      // leading '<' wins over a fence further in (ordered rules)
      (5L, "<div>page with ``` inside</div>")).toDF("doc_id", "payload")
    val out = Router.routeAndExtract(mixed, "doc_id", "payload")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L),
      "router must emit exactly one row per doc")
    assert(out(1L)._1 == "html" && out(2L)._1 == "markdown")
    assert(out(3L)._1 == "markdown" && out(3L)._2 == "fenced only")
    assert(out(4L) == (("plain", "just plain text")))
    assert(out(5L)._1 == "html")
  }

  test("router: malformed HTML keeps its null-text quarantine") {
    import graft.ns.Router
    val mixed = Seq(
      (1L, "<html><script>never closes</html>")).toDF("doc_id", "payload")
    val out = Router.routeAndExtract(mixed, "doc_id", "payload")
      .select(col("fmt"), col("text_out").isNull).as[(String, Boolean)]
      .collect().toSeq
    assert(out == Seq(("html", true)))
  }

  test("plan law: extraction is one map-side projection, no shuffle") {
    val docs = Tables(spark, sf, "documents").limit(50)
    val plan = Markdown.markdownToText(
      Markdown.buildMarkdownFixture(docs), "doc_id", "md")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "markdown extraction must not shuffle")
  }
}
