package graft

import org.apache.spark.sql.functions._

import graft.ns.{Html, Warc}

/** Laws for the WARC record walk ([[graft.ns.Warc]]) — the parser
  * hygiene rules a naive reader gets wrong, each pinned with
  * hand-assembled container bytes, plus the fixture round-trip the
  * ns120 gate relies on. */
class NsWarcSpec extends SparkSpec {
  import spark.implicits._

  private val crlf = "\r\n"

  private def rec(wtype: String, uri: String, payload: String,
      declaredLen: Option[Int] = None, sep: String = crlf + crlf): String =
    "WARC/1.0" + crlf + "WARC-Type: " + wtype + crlf +
      (if (uri != null) "WARC-Target-URI: " + uri + crlf else "") +
      "Content-Length: " + declaredLen.getOrElse(payload.length) +
      crlf + crlf + payload + sep

  private def httpOk(body: String): String =
    "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf + crlf + body

  test("round-trip: fixture containers parse to the expected records") {
    val docs = Seq((0L, "alpha beta gamma delta", "src0"),
      (1L, "one two three four five six seven eight nine ten", "src0"),
      (7L, "this record gets a broken http payload", "src1"),
      (20L, "second container resident", "src1"))
      .toDF("doc_id", "text", "source")
    val pages = Html.buildHtmlFixture(docs)
    val recs = Warc.parseContainers(Warc.buildWarcFixture(pages))
      .collect().sortBy(r => (r.container_id, r.rec_index))
    // containers 0 (docs 0,1,7) and 2 (doc 20)
    assert(recs.map(_.container_id).distinct.toSeq == Seq(0L, 2L))
    val c0 = recs.filter(_.container_id == 0L)
    assert(c0.map(_.warc_type).toSeq == Seq("warcinfo", "request",
      "response", "request", "response", "request", "response"))
    assert(c0.map(_.rec_index).toSeq == (0L to 6L))
    // doc 7 (% 19 == 7) is the bad-http plant; the walk continues
    val resp = c0.filter(_.warc_type == "response")
    assert(resp.map(_.status).toSeq == Seq("ok", "ok", "bad_http"))
    assert(resp.filter(_.status == "ok").forall(r =>
      r.http_status.contains(200L) && r.http_content_type == "text/html"))
    // ok bodies are the page bytes, exactly
    val htmlById = pages.select(col("doc_id"), col("html"))
      .as[(Long, String)].collect().toMap
    resp.filter(_.status == "ok").foreach { r =>
      val id = r.target_uri.split("/d/").last.toLong
      assert(r.body == htmlById(id), s"body mismatch for doc $id")
      assert(r.content_length == 44L + htmlById(id).length)
    }
    assert(resp.filter(_.status == "bad_http")
      .forall(r => r.body == null && r.http_status.isEmpty))
  }

  test("fixture declares OCTET lengths: non-ASCII pages round-trip " +
      "without desync (round-11 ADVICE)") {
    val docs = Seq((0L, "héllo wörld — ünïcode § page", "src0"),
      (1L, "日本語のテキストと emoji éè", "src0"),
      (2L, "plain ascii tail after multibyte neighbors", "src0"))
      .toDF("doc_id", "text", "source")
    val pages = Html.buildHtmlFixture(docs)
    val recs = Warc.parseContainers(Warc.buildWarcFixture(pages))
      .collect().sortBy(_.rec_index)
    // a char-count Content-Length would understate doc 0's payload
    // and desync every record after it; octet lengths keep the whole
    // container green
    assert(recs.forall(r => r.status == "ok"), recs.map(r =>
      (r.rec_index, r.status)).mkString(","))
    val htmlById = pages.select(col("doc_id"), col("html"))
      .as[(Long, String)].collect().toMap
    val resp = recs.filter(_.warc_type == "response")
    assert(resp.length == 3)
    resp.foreach { r =>
      val id = r.target_uri.split("/d/").last.toLong
      assert(r.body == htmlById(id), s"body mismatch for doc $id")
    }
  }

  test("desync: garbage at a record boundary ends the walk") {
    val bytes = ("not a warc at all" + crlf).getBytes("UTF-8")
    val out = Warc.parseWarc(9L, bytes)
    assert(out.map(_.status) == Seq("desync"))
    // ... and a valid record FOLLOWED by garbage keeps the record
    val mixed = (rec("request", "http://x.example.com/1",
      "GET / HTTP/1.1" + crlf + crlf) + "garbage tail")
      .getBytes("UTF-8")
    val out2 = Warc.parseWarc(9L, mixed)
    assert(out2.map(_.status) == Seq("ok", "desync"))
  }

  test("truncated: overstated Content-Length never reads out of bounds") {
    val body = httpOk("<p>hi</p>")
    val bytes = rec("response", "http://x.example.com/1", body,
      declaredLen = Some(body.length + 50)).getBytes("UTF-8")
    val out = Warc.parseWarc(1L, bytes)
    assert(out.map(_.status) == Seq("truncated"))
    // Int-overflow-sized declared length must land in the same branch
    val huge = ("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
      "Content-Length: 4294967290" + crlf + crlf).getBytes("UTF-8")
    assert(Warc.parseWarc(1L, huge).map(_.status) == Seq("truncated"))
  }

  test("header names are case-insensitive; unknown headers skip") {
    val body = httpOk("<p>case</p>")
    val raw = "WARC/1.0" + crlf +
      "warc-type: response" + crlf +
      "X-Unknown-Header: whatever: colons: fine" + crlf +
      "WARC-TARGET-URI: http://x.example.com/c" + crlf +
      "content-LENGTH: " + body.length + crlf + crlf +
      body + crlf + crlf
    val out = Warc.parseWarc(2L, raw.getBytes("UTF-8"))
    assert(out.map(_.status) == Seq("ok"))
    assert(out.head.warc_type == "response" &&
      out.head.target_uri == "http://x.example.com/c" &&
      out.head.body == "<p>case</p>")
  }

  test("missing required header is a desync, not a guess") {
    val noLen = ("WARC/1.0" + crlf + "WARC-Type: request" + crlf + crlf)
      .getBytes("UTF-8")
    assert(Warc.parseWarc(3L, noLen).map(_.status) == Seq("desync"))
    val noType = ("WARC/1.0" + crlf + "Content-Length: 0" + crlf + crlf)
      .getBytes("UTF-8")
    assert(Warc.parseWarc(3L, noType).map(_.status) == Seq("desync"))
  }

  test("missing record separator: lenient resync on a version line, desync otherwise") {
    val first = rec("request", "http://x.example.com/1",
      "GET / HTTP/1.1" + crlf + crlf, sep = "") // no CRLFCRLF
    val second = rec("request", "http://x.example.com/2",
      "GET / HTTP/1.1" + crlf + crlf)
    // payloads are length-framed, so when the very next bytes are a
    // valid version line the walk continues (lenient framing) ...
    val out = Warc.parseWarc(4L, (first + second).getBytes("UTF-8"))
    assert(out.map(_.status) == Seq("ok", "ok"))
    // ... when they are not, it reports desync instead of misparsing
    val out3 = Warc.parseWarc(4L, (first + "junk after").getBytes("UTF-8"))
    assert(out3.map(_.status) == Seq("ok", "desync"))
    // at END of container a missing separator is tolerated
    val out2 = Warc.parseWarc(4L, first.getBytes("UTF-8"))
    assert(out2.map(_.status) == Seq("ok"))
  }

  test("response without an HTTP blank line quarantines alone") {
    val bad = "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" +
      crlf + "<p>no separator</p>"
    val good = httpOk("<p>fine</p>")
    val bytes = (rec("response", "http://x.example.com/a", bad) +
      rec("response", "http://x.example.com/b", good)).getBytes("UTF-8")
    val out = Warc.parseWarc(5L, bytes)
    assert(out.map(_.status) == Seq("bad_http", "ok"))
    assert(out(1).body == "<p>fine</p>")
  }

  test("gzip: multi-member .warc.gz decodes FULLY (not just member 1); " +
      "plain passthrough identical; corrupt stream quarantined") {
    val r1 = rec("request", "http://x.example.com/1",
      "GET /1 HTTP/1.1" + crlf + crlf)
    val r2 = rec("response", "http://x.example.com/2",
      httpOk("<p>two</p>"))
    val plain = (r1 + r2).getBytes("UTF-8")
    // one gzip member PER RECORD, concatenated — the ISO 28500 form
    val multi = Warc.gzipBytes(r1.getBytes("UTF-8")) ++
      Warc.gzipBytes(r2.getBytes("UTF-8"))
    val whole = Warc.gzipBytes(plain)
    val p = Warc.parseWarcAuto(1L, plain)
    val m = Warc.parseWarcAuto(1L, multi)
    val w = Warc.parseWarcAuto(1L, whole)
    assert(p.map(_.status) == Seq("ok", "ok"))
    // gzip is a transparent layer: identical record stream both ways
    assert(m.map(r => (r.warc_type, r.target_uri, r.status, r.body)) ==
      p.map(r => (r.warc_type, r.target_uri, r.status, r.body)))
    assert(w.map(_.status) == Seq("ok", "ok"))
    // corrupt gzip (magic intact, body mangled) → container quarantine
    val corrupt = whole.clone()
    corrupt(10) = (corrupt(10) ^ 0x5a).toByte
    corrupt(corrupt.length - 3) = 0x7f
    val c = Warc.parseWarcAuto(9L, corrupt)
    assert(c.map(_.status).forall(s => s == "bad_gzip" || s == "desync"),
      s"corrupt gzip must never yield ok records, got ${c.map(_.status)}")
  }

  test("binary face: image payloads round-trip BYTE-EXACT through " +
      "the walk, the string face on the same container is lossy or " +
      "equal-length-only, and framing quarantine rules are shared " +
      "(r14)") {
    import graft.ns.Multimodal
    // payload bytes deliberately include values invalid as UTF-8
    val imgs = (0L until 5L).map(i =>
      i -> Multimodal.writeBmp(16, 12, i * 7L)).toMap
    val containers = Warc.buildImageWarcContainers(0L until 5L, 3,
      imgs(_))
    assert(containers.length == 2)
    val recs = containers.flatMap { case (cid, bytes) =>
      Warc.parseWarcBinary(cid, bytes)
    }
    // only ok responses surface, with content-type routed and the
    // payload byte-identical to what was written
    assert(recs.length == 5)
    recs.foreach { r =>
      assert(r.http_content_type == "image/bmp")
      assert(r.http_status == 200L)
      val id = r.target_uri.split("/").last.toLong
      assert(java.util.Arrays.equals(r.body, imgs(id)),
        s"payload for $id not byte-exact")
    }
    // the string face walks the SAME frames (indexes and statuses
    // agree) — it just cannot carry the bytes
    val strRecs = containers.flatMap { case (cid, bytes) =>
      Warc.parseWarc(cid, bytes)
    }
    assert(strRecs.count(_.warc_type == "response") == 5)
    assert(strRecs.forall(_.status == "ok"))
    // shared framing quarantine: truncating the container mid-record
    // stops BOTH faces at the same boundary
    val (cid0, c0) = containers.head
    val cut = c0.take(c0.length - 30)
    val binCut = Warc.parseWarcBinary(cid0, cut)
    val strCut = Warc.parseWarc(cid0, cut)
    assert(strCut.last.status == "truncated" ||
      strCut.last.status == "desync")
    assert(binCut.length ==
      strCut.count(r => r.status == "ok" && r.warc_type == "response"))
  }

  test("binary face through gzip: a .warc.gz image container " +
      "(multi-member or single) still yields byte-exact payloads " +
      "via parseContainersBinary (r14)") {
    import graft.ns.Multimodal
    val imgs = (0L until 3L).map(i =>
      i -> Multimodal.writeBmp(12, 8, i * 13L)).toMap
    val containers = Warc.buildImageWarcContainers(0L until 3L, 3,
      imgs(_))
    val gz = containers.map { case (cid, bytes) =>
      (cid, Warc.gzipBytes(bytes))
    }
    val recs = Warc.parseContainersBinary(
      gz.toDF("container_id", "content")).collect()
    assert(recs.length == 3)
    recs.foreach { r =>
      val id = r.target_uri.split("/").last.toLong
      assert(java.util.Arrays.equals(r.body, imgs(id)))
    }
  }

  test("non-HTTP response payload is bad_http, not a crash") {
    val notHttp = "BINARYJUNK" + crlf + crlf + "tail"
    val bytes = rec("response", "http://x.example.com/z", notHttp)
      .getBytes("UTF-8")
    assert(Warc.parseWarc(6L, bytes).map(_.status) == Seq("bad_http"))
  }

  test("null content rows quarantine instead of NPE-killing the task " +
      "(r14 ADVICE — both container faces)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]]),
      (2L, Some("not a warc at all".getBytes("UTF-8"))))
      .toDF("container_id", "content")
    // both walks complete; the null container contributes no record
    // (or only quarantine records) — never a task failure
    val text = Warc.parseContainers(df).collect()
    assert(!text.exists(r => r.container_id == 1L && r.status == "ok"))
    // the binary face only emits ok responses: none for container 1
    val bin = Warc.parseContainersBinary(df).collect()
    assert(!bin.exists(_.container_id == 1L))
  }
}
