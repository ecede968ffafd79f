package graft.ns

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) container ingest — curation stage
  * −1. Public web pipelines (C4, CCNet, Dolma) do not start from
  * loose HTML strings: they read Common Crawl WARC files, each a
  * concatenation of length-framed records (version line, named
  * headers, `Content-Length` payload, blank-line separators), where
  * `response` records wrap an HTTP response whose body is the HTML
  * that [[Html.mainContent]] then extracts.
  *
  * Reference behavior analogue: the declared-schema ingest +
  * malformed-row quarantine family (S6 — /root/reference/dags/
  * sandbox_data_pipeline.py:64 loads declared JSON payloads; the
  * j04 CSV path quarantines rows that do not parse). Here the
  * "schema" is WARC record framing and the quarantine has two
  * granularities: a record whose inner HTTP payload is broken is
  * quarantined ALONE (framing intact — the walk continues), while
  * broken framing (desync, truncated payload) ends the walk for the
  * container, because past a framing error every subsequent byte
  * offset is untrusted.
  *
  * Spark-first design: containers are opaque `binary` rows; the
  * record walk is per-payload imperative byte work (the
  * [[Multimodal.parseWav]] chunk-walk shape), so it runs as a
  * batched `mapPartitions` flatMap — SURVEY §2.7's carve-out for
  * JVM codecs — and everything downstream is ordinary DataFrame
  * code. One container fans out to its records map-side with no
  * shuffle; at 100 TB each executor walks its own container split
  * exactly once, which is how the real crawl readers behave.
  *
  * Parser hygiene (the parts naive readers get wrong, each pinned
  * by a spec law): header names are case-insensitive; unknown
  * headers are skipped, not fatal; `Content-Length` is trusted only
  * within the container's bounds (an overstated length yields
  * `truncated`, never an out-of-bounds read); progress is strictly
  * monotonic, so a malformed size can neither stall nor reverse the
  * walk.
  */
object Warc {

  /** One parsed record. `status`:
    *  - `ok`         — record framing parsed; for `response` records
    *                   the inner HTTP payload parsed too;
    *  - `bad_http`   — a `response` record whose payload has no
    *                   header/body split (no CRLFCRLF): quarantined
    *                   alone, the walk continues;
    *  - `truncated`  — declared Content-Length runs past the
    *                   container: walk ends;
    *  - `desync`     — bytes at the record boundary are not a WARC
    *                   version line (or a required header is
    *                   missing/unparseable): walk ends.
    * `http_status`/`http_content_type`/`body` are null except on
    * `ok` responses. */
  final case class WarcRec(container_id: Long, rec_index: Long,
      warc_type: String, target_uri: String, content_length: Long,
      status: String, http_status: Option[Long],
      http_content_type: String, body: String)

  /** The framing walk shared by the string and binary faces: emits
    * one callback per record — (rec_index, warc_type, target_uri,
    * content_length, status, http_status, http_content_type,
    * bodyFrom, bodyTo) with bodyFrom = −1 when the record carries no
    * parsed HTTP body (non-response, bad_http, framing stop). The
    * HTTP header/body split is located in BYTES (the CRLFCRLF
    * sequence cannot occur inside a UTF-8 multibyte character, so
    * this finds exactly the split the old string scan found), which
    * is what lets [[parseWarcBinary]] hand back byte-exact payloads
    * for non-text records. */
  private def walkRecords(bytes: Array[Byte])(
      emit: (Long, String, String, Long, String, Option[Long],
        String, Int, Int) => Unit): Unit = {
    var off = 0
    var idx = 0L
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    def str(from: Int, until: Int): String =
      new String(bytes, from, until - from, "UTF-8")
    def crlf2At(i: Int): Boolean =
      i + 4 <= bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n'
    def stop(wtype: String, uri: String, clen: Long, why: String): Unit =
      emit(idx, wtype, uri, clen, why, None, null, -1, -1)
    while (off < bytes.length) {
      val ve = lineEnd(off)
      if (ve < 0 || ve - off < 5 || str(off, off + 5) != "WARC/") {
        stop(null, null, -1L, "desync"); return
      }
      var h = ve + 2
      var wtype: String = null
      var uri: String = null
      var clen = -1L
      var headersOk = true
      var headersDone = false
      while (!headersDone && headersOk) {
        val he = lineEnd(h)
        if (he < 0) headersOk = false
        else if (he == h) { headersDone = true; h += 2 }
        else {
          val line = str(h, he)
          val ci = line.indexOf(':')
          if (ci > 0) {
            val v = line.substring(ci + 1).trim
            line.substring(0, ci).trim.toLowerCase match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "content-length" =>
                clen = try v.toLong
                  catch { case _: NumberFormatException => -1L }
              case _ => () // unknown headers are fine
            }
          }
          h = he + 2
        }
      }
      if (!headersOk || wtype == null || clen < 0) {
        stop(wtype, uri, clen, "desync"); return
      }
      // Long bound check BEFORE narrowing: a huge declared length
      // must not overflow Int and sneak past the range test.
      if (h.toLong + clen > bytes.length.toLong) {
        stop(wtype, uri, clen, "truncated"); return
      }
      val bodyEnd = h + clen.toInt
      if (wtype == "response") {
        // locate the header/body split in bytes
        var sep = -1
        var i = h
        while (sep < 0 && i + 4 <= bodyEnd) {
          if (crlf2At(i)) sep = i else i += 1
        }
        if (sep < 0)
          emit(idx, wtype, uri, clen, "bad_http", None, null, -1, -1)
        else {
          val head = str(h, sep)
          val lines = head.split("\r\n")
          val statusCode = lines.headOption
            .filter(_.toUpperCase.startsWith("HTTP/"))
            .map(_.split(" ", 3))
            .filter(_.length >= 2)
            .flatMap(p => try Some(p(1).toLong)
              catch { case _: NumberFormatException => None })
          val ctype = lines.drop(1)
            .find(_.toLowerCase.startsWith("content-type:"))
            .map(_.substring("content-type:".length).trim)
            .orNull
          statusCode match {
            case Some(code) =>
              emit(idx, wtype, uri, clen, "ok", Some(code), ctype,
                sep + 4, bodyEnd)
            case None =>
              emit(idx, wtype, uri, clen, "bad_http", None, null, -1, -1)
          }
        }
      } else {
        emit(idx, wtype, uri, clen, "ok", None, null, -1, -1)
      }
      idx += 1
      // Record separator (two CRLFs). Payloads are length-framed, so
      // a missing separator is tolerated where recovery is safe: at
      // the container's end, or when the very next bytes are a valid
      // version line (lenient resync). Anything else is a desync on
      // the next iteration's version-line check.
      var next = bodyEnd
      if (crlf2At(next)) next += 4
      if (next <= off) { stop(null, null, -1L, "desync"); return }
      off = next
    }
  }

  /** Walk one container's records (see object doc for the rules). */
  def parseWarc(containerId: Long, bytes: Array[Byte]): Seq[WarcRec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    walkRecords(bytes) { (idx, wtype, uri, clen, status, hs, ctype,
        bodyFrom, bodyTo) =>
      out += WarcRec(containerId, idx, wtype, uri, clen, status, hs,
        ctype,
        if (bodyFrom >= 0)
          new String(bytes, bodyFrom, bodyTo - bodyFrom, "UTF-8")
        else null)
    }
    out.toSeq
  }

  /** One ok `response` record with its payload BYTES preserved —
    * what the string face cannot do (a UTF-8 decode of a binary
    * body is lossy). The image-acquisition front door: filter on
    * `http_content_type`, decode the bytes downstream. */
  final case class WarcBinRec(container_id: Long, rec_index: Long,
      target_uri: String, http_status: Long,
      http_content_type: String, body: Array[Byte])

  /** Binary face of [[parseWarc]]: SAME framing walk (every
    * quarantine rule identical — a framing stop simply ends the
    * record stream), but only ok responses are returned and their
    * bodies are byte-exact slices. */
  def parseWarcBinary(containerId: Long,
      bytes: Array[Byte]): Seq[WarcBinRec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcBinRec]
    walkRecords(bytes) { (idx, wtype, uri, _, status, hs, ctype,
        bodyFrom, bodyTo) =>
      if (status == "ok" && wtype == "response" && bodyFrom >= 0)
        out += WarcBinRec(containerId, idx, uri, hs.getOrElse(-1L),
          ctype, java.util.Arrays.copyOfRange(bytes, bodyFrom, bodyTo))
    }
    out.toSeq
  }

  /** Inflate a gzip payload, INCLUDING multi-member concatenations —
    * real `.warc.gz` files are one gzip member per record per the
    * ISO 28500 recommendation, which a naive single-member read
    * truncates to the first record. `GZIPInputStream` handles member
    * concatenation natively; a corrupt stream yields None (the
    * container-level quarantine, `bad_gzip`). */
  def gunzipAll(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Gzip-compress (fixture util — the operator only ever inflates;
    * the gate never hashes compressed bytes, only the parse). */
  def gzipBytes(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /** [[parseWarc]] with transparent gzip auto-detect (0x1f 0x8b
    * magic): inflate all members then walk; undecodable gzip yields
    * one `bad_gzip` record for the container. */
  def parseWarcAuto(containerId: Long, bytes: Array[Byte]): Seq[WarcRec] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b)
      gunzipAll(bytes) match {
        case Some(raw) => parseWarc(containerId, raw)
        case None => Seq(WarcRec(containerId, 0L, null, null, -1L,
          "bad_gzip", None, null, null))
      }
    else parseWarc(containerId, bytes)

  /** Batched record walk over a (container_id, binary) frame — the
    * [[Multimodal.decodeWavFeatures]] execution shape. Containers
    * may be plain or gzip (auto-detected per payload). */
  def parseContainers(df: DataFrame, idCol: String = "container_id",
      binCol: String = "content", batchSize: Int = 16): Dataset[WarcRec] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(_.flatMap {
        // null-payload guard (r14 ADVICE): the gzip sniff reads
        // bytes.length, which NPEs on a null row — and an NPE kills
        // the task instead of quarantining. Empty bytes walk to the
        // established zero-record container quarantine.
        case (cid, bytes) => parseWarcAuto(cid,
          if (bytes == null) Array.emptyByteArray else bytes)
      }))
  }

  /** Binary twin of [[parseContainers]] — the image/audio
    * acquisition front door: same batched mapPartitions walk, ok
    * responses only, payload bytes preserved. Filter on
    * `http_content_type` downstream and feed the bytes to the
    * decoders ([[Multimodal.dhashImages]] et al.). */
  def parseContainersBinary(df: DataFrame,
      idCol: String = "container_id", binCol: String = "content",
      batchSize: Int = 16): Dataset[WarcBinRec] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(_.flatMap {
        case (cid, bytes) =>
          // null-payload guard (r14 ADVICE): gunzipAll's
          // ByteArrayInputStream constructor NPEs on null, and NPE
          // is not the IOException the quarantine catches — a null
          // content row would fail the task. Mirror the Multimodal
          // readers' guard.
          val b = if (bytes == null) Array.emptyByteArray else bytes
          parseWarcBinary(cid, gunzipAll(b).getOrElse(b))
      }))
  }

  /** Closed-form BINARY WARC fixture: `ids` grouped `perContainer`
    * to a container each opening with `warcinfo`, then per image a
    * `request` record and a `response` record whose HTTP payload is
    * `Content-Type: image/bmp` + the RAW image bytes from
    * `imgBytes(id)` — the Common-Crawl-images acquisition shape
    * ([[buildWarcFixture]]'s text twin carries HTML instead).
    * Driver-side fixture tool: Content-Length is the true octet
    * count (ASCII head + binary body), so the framing walk is
    * exercised over genuinely binary payloads. */
  def buildImageWarcContainers(ids: Seq[Long], perContainer: Int,
      imgBytes: Long => Array[Byte]): Seq[(Long, Array[Byte])] = {
    def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
    ids.grouped(perContainer).zipWithIndex.map { case (group, ci) =>
      val out = new java.io.ByteArrayOutputStream()
      val info = "software: graft-warc-fixture" + Crlf
      out.write(ascii("WARC/1.0" + Crlf + "WARC-Type: warcinfo" +
        Crlf + "Content-Length: " + info.length + Crlf + Crlf +
        info + Crlf + Crlf))
      group.foreach { i =>
        val uri = s"http://crawl.example.com/img/$i"
        val req = s"GET /img/$i HTTP/1.1" + Crlf +
          "Host: crawl.example.com" + Crlf + Crlf
        out.write(ascii("WARC/1.0" + Crlf + "WARC-Type: request" +
          Crlf + s"WARC-Target-URI: $uri" + Crlf +
          s"Content-Length: ${req.length}" + Crlf + Crlf + req +
          Crlf + Crlf))
        val body = imgBytes(i)
        val head = "HTTP/1.1 200 OK" + Crlf +
          "Content-Type: image/bmp" + Crlf + Crlf
        out.write(ascii("WARC/1.0" + Crlf + "WARC-Type: response" +
          Crlf + s"WARC-Target-URI: $uri" + Crlf +
          s"Content-Length: ${head.length + body.length}" + Crlf +
          Crlf + head))
        out.write(body)
        out.write(ascii(Crlf + Crlf))
      }
      (ci.toLong, out.toByteArray)
    }.toSeq
  }

  private val Crlf = "\r\n"

  /** Closed-form WARC fixture over an (id, html) page table: docs
    * group into containers of `docsPerContainer` by id; each
    * container opens with a `warcinfo` record, then per doc a
    * `request` record (exercises type-walking) and a `response`
    * record wrapping `HTTP/1.1 200 OK` + the page. Docs with
    * `id % 19 == 7` get a response whose HTTP header block never
    * ends (no blank line) — the record-level quarantine subset,
    * predictable by the oracle. Every byte is a formula of
    * (id, html), so a SQL oracle predicts the full parse output —
    * record indexes, declared lengths, statuses, bodies.
    *
    * Output: (container_id, content binary). Pure DataFrame string
    * building + one grouped sort-collect per container; fixture
    * text is ASCII, so SQL `length` (chars) equals the parser's
    * byte lengths. */
  def buildWarcFixture(pages: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html", docsPerContainer: Int = 8): DataFrame = {
    require(docsPerContainer >= 1, "docsPerContainer must be positive")
    val id = col(idCol)
    val ids = id.cast("string")
    val uri = concat(lit("http://crawl.example.com/d/"), ids)
    val reqPayload = concat(lit("GET /d/"), ids,
      lit(" HTTP/1.1" + Crlf + "Host: crawl.example.com" + Crlf + Crlf))
    val respPayload = concat(
      lit("HTTP/1.1 200 OK" + Crlf + "Content-Type: text/html"),
      when(pmod(id, lit(19)) === 7, lit(Crlf))
        .otherwise(lit(Crlf + Crlf)),
      col(htmlCol))
    // Content-Length is an OCTET count (ISO 28500): declare the
    // UTF-8 byte length, not the UTF-16 char count, so a non-ASCII
    // page cannot desync every subsequent record in the container
    // (round-11 ADVICE). On the ASCII fixtures the two coincide,
    // which is what keeps the SQL oracle's `length()` predictions
    // valid.
    def record(wtype: String, payload: Column): Column =
      concat(lit("WARC/1.0" + Crlf + "WARC-Type: " + wtype + Crlf +
          "WARC-Target-URI: "), uri, lit(Crlf + "Content-Length: "),
        length(encode(payload, "UTF-8")).cast("string"), lit(Crlf + Crlf),
        payload, lit(Crlf + Crlf))
    val infoPayload = "software: graft-warc-fixture" + Crlf
    val infoRec = "WARC/1.0" + Crlf + "WARC-Type: warcinfo" + Crlf +
      "Content-Length: " + infoPayload.getBytes("UTF-8").length +
      Crlf + Crlf + infoPayload + Crlf + Crlf
    pages.select(
        floor(id / docsPerContainer).cast("long").as("container_id"),
        id.as("__id"),
        concat(record("request", reqPayload),
          record("response", respPayload)).as("__rec"))
      .groupBy(col("container_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__id"), col("__rec")))),
        s => s.getField("__rec")), "").as("__docs"))
      .select(col("container_id"),
        encode(concat(lit(infoRec), col("__docs")), "UTF-8").as("content"))
  }
}
