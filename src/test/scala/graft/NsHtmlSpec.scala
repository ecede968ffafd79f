package graft

import org.apache.spark.sql.functions._

import graft.ns.Html

class NsHtmlSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Html.buildHtmlFixture(Tables(spark, sf, "documents"))
  private def extracted = Html.mainContent(fixture, "doc_id", "html")

  test("escape/decode are exact inverses, including entity lookalikes") {
    val tricky = Seq("a & b", "x < y > z", "already &amp; escaped",
      "quote \" and 'tick'", "&lt;not a tag&gt;", "plain text")
      .toDF("raw")
    val rt = tricky.select(col("raw"),
      Html.decodeEntities(Html.escapeHtml(col("raw"))).as("rt"))
      .as[(String, String)].collect()
    rt.foreach { case (raw, round) =>
      assert(raw == round, s"round trip mangled: '$raw' -> '$round'")
    }
  }

  test("quarantine = exactly the structurally-broken pages") {
    val statuses = extracted.select(col("doc_id"), col("status"))
      .as[(Long, String)].collect()
    assert(statuses.nonEmpty)
    statuses.foreach { case (id, st) =>
      val expected = if (id % 17 == 3) "malformed" else "ok"
      assert(st == expected, s"doc $id: status $st, expected $expected")
    }
    // malformed rows carry null extraction columns (the j04 contract:
    // quarantined input never contributes output values)
    val bad = extracted.filter(col("status") === "malformed")
    assert(bad.filter(col("n_blocks").isNotNull ||
      col("n_kept").isNotNull || col("main_text").isNotNull).isEmpty)
  }

  test("script bodies, nav, related links, and footer never leak; " +
      "entities decode in kept text") {
    val texts = extracted.filter(col("status") === "ok")
      .select(col("doc_id"), col("main_text"))
      .as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      // strip-order trap: the script body's long <p> lookalike
      assert(!t.contains("never survive extraction"),
        s"doc $id: script body leaked into main text")
      assert(!t.contains("related reading from around the network"),
        s"doc $id: link-dominated block kept")
      assert(!t.contains("Copyright 2026"), s"doc $id: footer kept")
      assert(!t.contains("Home | Self"), s"doc $id: nav kept")
      // entity paragraph is always kept, decoded, and LAST
      assert(t.split('\n').last ==
        s"Q&A <tags> and entities stay readable after decoding in doc $id",
        s"doc $id: entity paragraph missing or not decoded: ${t.takeRight(80)}")
      assert(!t.contains("&amp;") && !t.contains("&lt;"),
        s"doc $id: undecoded entity in main text")
    }
  }

  test("density rule: every kept block is >= 30 chars of low-link text") {
    val rows = extracted.filter(col("status") === "ok")
      .select(explode(split(col("main_text"), "\n")).as("block"))
      .as[String].collect()
    assert(rows.nonEmpty)
    rows.foreach { b =>
      assert(b.length >= 30, s"kept block under minLen: '$b'")
      assert(!b.contains("<a "), s"tag survived stripping: '$b'")
    }
  }

  test("extraction is map-only: no exchange in the plan") {
    val plan = extracted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"HTML extraction must not shuffle:\n$plan")
  }
}
