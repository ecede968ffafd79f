package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ns.{Multimodal, Sketches}

class NsSketchesMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact per group") {
    val ev = Tables(spark, sf, "events")
    val errs = Sketches.distinctWithError(
      ev, Seq(col("event_type")), col("user_id"))
      .select(col("rel_err")).as[Double].collect()
    assert(errs.nonEmpty && errs.forall(_ <= 0.05), errs.mkString(","))
  }

  test("quantiles returns ordered, element-valued discrete quantiles") {
    val ev = Tables(spark, sf, "events")
    val q = Sketches.quantiles(ev, Seq(col("event_type")), col("value"),
      Seq(0.5, 0.9, 0.99))
    val rows = q.select(col("event_type"), col("p50"), col("p90"),
      col("p99")).as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val values = ev.select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (et, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
      assert(values(et).contains(p50) && values(et).contains(p99),
        s"quantiles of $et must be actual data elements")
    }
  }

  private def sha256hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  test("momentColumns: power sums merge by addition; derived stats " +
      "match direct computation") {
    import graft.ns.Sketches
    val d = Seq(("a", 1.00), ("a", 2.00), ("a", 3.00), ("b", 5.50))
      .toDF("g", "v")
    val m = Sketches.momentColumns(d, Seq(col("g")), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // a: cents 100,200,300 → s1=600, s2=140000, s3=36000000
    assert(m("a") == ((3L, 600L, 140000L, 36000000L, 200.0,
      (140000.0 - 600.0 * 600 / 3) / 3)))
    assert(m("b") == ((1L, 550L, 302500L, 166375000L, 550.0, 0.0)))
    // MERGE law: sums of two halves add to the whole, bit-exactly
    val h1 = Sketches.momentColumns(d.limit(2), Seq(col("g")), "v")
    val h2 = Sketches.momentColumns(d.exceptAll(d.limit(2)),
      Seq(col("g")), "v")
    val merged = h1.select(col("g"), col("n"), col("s1"), col("s2"),
        col("s3"))
      .unionAll(h2.select(col("g"), col("n"), col("s1"), col("s2"),
        col("s3")))
      .groupBy("g").agg(sum("n").as("n"), sum("s1").as("s1"),
        sum("s2").as("s2"), sum("s3").as("s3"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(merged == m.view.mapValues(t =>
      (t._1, t._2, t._3, t._4)).toMap)
  }

  test("exactGridQuantiles: PERCENTILE_DISC cuts match a brute-force " +
      "sort; no global exchange beyond the group key") {
    import graft.ns.Sketches
    val vals = Seq(0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08,
      0.09, 0.10)
    val d = vals.map(("g", _)).toDF("g", "v")
    val q = Sketches.exactGridQuantiles(d, Seq(col("g")), "v",
      Seq(0.25, 0.5, 0.75)).head()
    // disc cut = smallest value at cum >= ceil(q*10): 3rd, 5th, 8th
    assert(q.getDouble(1) == 0.03 && q.getDouble(2) == 0.05 &&
      q.getDouble(3) == 0.08)
    // repartition stability
    val again = Sketches.exactGridQuantiles(d.repartition(7),
      Seq(col("g")), "v", Seq(0.25, 0.5, 0.75)).head()
    assert(again.getDouble(1) == 0.03 && again.getDouble(2) == 0.05 &&
      again.getDouble(3) == 0.08)
  }

  test("binaryFile source + batched decode produce real payload facts") {
    val dir = Files.createTempDirectory("graft_mm").toFile
    dir.deleteOnExit()
    val payloads = Map(
      "a.img" -> "payload-one".getBytes("UTF-8"),
      "b.img" -> "second-payload-bytes".getBytes("UTF-8"),
      "skip.txt" -> "not-matched".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(Paths.get(dir.getPath, name), bytes) }
    val df = Multimodal.readBinaryDir(spark, dir.getPath, "*.img")
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content", "file_name"))
    val feats = Multimodal.decodeFeatures(df).collect()
      .map(f => f.file_name -> f).toMap
    assert(feats.keySet == Set("a.img", "b.img")) // glob filtered
    payloads.filterKeys(_.endsWith(".img")).foreach { case (name, bytes) =>
      val f = feats(name)
      assert(f.byte_len == bytes.length)
      assert(f.sha256 == sha256hex(bytes))
      // stub decoder contract: dims are a pure function of size
      assert(f.width == bytes.length % 640 + 1)
      assert(f.height == (bytes.length * 7) % 480 + 1)
    }
  }

  test("writeBmp → parseDims round-trips, including row-padding widths") {
    // widths 1..5 cover every row-padding residue (w*3 mod 4)
    for (w <- 1 to 5; h <- Seq(1, 3, 17)) {
      val bytes = Multimodal.writeBmp(w, h, seed = 42L)
      assert(bytes.length == 54 + (w * 3 + 3) / 4 * 4 * h,
        s"file size formula for ${w}x$h")
      assert(Multimodal.parseDims(bytes).contains((w, h)))
    }
    // deterministic payload: same args → identical bytes
    assert(Multimodal.writeBmp(4, 2, 7L).sameElements(
      Multimodal.writeBmp(4, 2, 7L)))
    assert(!Multimodal.writeBmp(4, 2, 7L).sameElements(
      Multimodal.writeBmp(4, 2, 8L)))
  }

  test("parseDims handles core-header, top-down, PNM, and rejects junk") {
    // hand-built BITMAPCOREHEADER (DIB size 12, u16 dims at 18/20)
    val core = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    core.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
    core.putInt(12).putShort(640.toShort).putShort(480.toShort)
      .putShort(1).putShort(24)
    assert(Multimodal.parseDims(core.array()).contains((640, 480)))
    // top-down BMP: negative i32 height → |height|
    val topDown = Multimodal.writeBmp(5, 3)
    val bb = java.nio.ByteBuffer.wrap(topDown)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -3)
    assert(Multimodal.parseDims(topDown).contains((5, 3)))
    // PNM: whitespace variants + '#' comments before/between fields
    assert(Multimodal.parseDims("P6 12 8 255 ".getBytes("UTF-8"))
      .contains((12, 8)))
    assert(Multimodal.parseDims(
      "P5\n# a comment\n 640\n# another\n480\n255\n".getBytes("UTF-8"))
      .contains((640, 480)))
    assert(Multimodal.parseDims("P1\n3 2\n".getBytes("UTF-8"))
      .contains((3, 2)))
    // rejections: junk, truncated BM, zero dims, non-numeric PNM text
    assert(Multimodal.parseDims("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseDims(Array[Byte]('B', 'M', 0, 0)).isEmpty)
    assert(Multimodal.parseDims("P6 0 8 255 ".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseDims(
      "P2 was a fine year for text".getBytes("UTF-8")).isEmpty)
    val zeroW = Multimodal.writeBmp(5, 3)
    java.nio.ByteBuffer.wrap(zeroW)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(18, 0)
    assert(Multimodal.parseDims(zeroW).isEmpty)
  }

  test("default decode parses real headers and falls back to the stub") {
    val dir = Files.createTempDirectory("graft_mm_bmp").toFile
    dir.deleteOnExit()
    val bmp = Multimodal.writeBmp(31, 17, seed = 1L)
    val opaque = "jpeg-shaped opaque payload".getBytes("UTF-8")
    Files.write(Paths.get(dir.getPath, "real.bmp"), bmp)
    Files.write(Paths.get(dir.getPath, "opaque.bin"), opaque)
    val feats = Multimodal.decodeFeatures(
      Multimodal.readBinaryDir(spark, dir.getPath, "*")).collect()
      .map(f => f.file_name -> f).toMap
    assert(feats("real.bmp").width == 31 && feats("real.bmp").height == 17)
    assert(feats("real.bmp").byte_len == bmp.length)
    assert(feats("real.bmp").sha256 == sha256hex(bmp))
    val (sw, sh) = Multimodal.stubDims(opaque)
    assert(feats("opaque.bin").width == sw &&
      feats("opaque.bin").height == sh)
  }

  test("frameSample fans each payload into n deterministic slices") {
    val dir = Files.createTempDirectory("graft_mm2").toFile
    dir.deleteOnExit()
    Files.write(Paths.get(dir.getPath, "v1.bin"),
      ("frameAAAA" * 8).getBytes("UTF-8"))
    Files.write(Paths.get(dir.getPath, "v2.bin"),
      ("frameBBBB" * 8).getBytes("UTF-8"))
    val df = Multimodal.readBinaryDir(spark, dir.getPath, "*.bin")
    val frames = Multimodal.frameSample(df, nFrames = 4)
      .as[(String, Long, Long, String)].collect()
    assert(frames.length == 8) // 2 files × 4 frames
    assert(frames.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L)))
    // 72 bytes / 4 frames → every frame exactly 18 bytes
    assert(frames.forall(_._3 == 18L))
    // deterministic: same content → same frame hashes across files? No —
    // different content → different hashes; same call twice → identical.
    val again = Multimodal.frameSample(df, nFrames = 4)
      .as[(String, Long, Long, String)].collect()
    assert(frames.sortBy(f => (f._1, f._2)).toSeq ==
      again.sortBy(f => (f._1, f._2)).toSeq)
  }

  test("HLL sketch columns: merged estimates within bound, partition-stable") {
    import graft.ns.{Dedup, Sketches}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fp = Dedup.fingerprint(col("text"))
    // merged-part estimate and whole-corpus estimate must BOTH land
    // within the sketch's error bound of exact (they are not
    // register-identical: small parts stay in exact list/set mode
    // and union promotes them to estimating HLL mode)
    val parts = Sketches.hllSketches(docs, Seq(col("source")), fp)
    val merged = Sketches.hllMergeEstimate(parts)
      .head().getLong(0)
    val whole = docs.agg(
      hll_sketch_estimate(hll_sketch_agg(fp, lit(12))))
      .head().getLong(0)
    val exact = docs.select(fp.as("f")).distinct().count()
    // any grouping of parts must land within the error bound too
    // (estimates are NOT identical across groupings: mode-promotion
    // points differ — only the bound is guaranteed)
    val byLang = Sketches.hllMergeEstimate(
      Sketches.hllSketches(docs, Seq(col("lang")), fp))
      .head().getLong(0)
    for ((name, est) <- Seq("merged" -> merged, "whole" -> whole,
        "byLang" -> byLang))
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$name estimate $est vs exact $exact")
    // per-source estimates are deterministic across partitioning
    val a = Sketches.hllSketches(docs, Seq(col("source")), fp)
      .select(col("source"), hll_sketch_estimate(col("sketch")))
      .as[(String, Long)].collect().toSet
    val b = Sketches.hllSketches(docs.repartition(13),
        Seq(col("source")), fp)
      .select(col("source"), hll_sketch_estimate(col("sketch")))
      .as[(String, Long)].collect().toSet
    assert(a == b)
  }

  test("CMS sketch: merge-by-addition is bit-exact; estimates " +
      "overestimate and hit exact counts for unique cells") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // Partition-split sketches summed per (source, seed, cell) must
    // EQUAL the whole-corpus sketch — integer counts, any grouping.
    val whole = Sketches.cmsSketch(docs, Seq(col("source")), "text")
      .as[(String, Int, Long, Long, Int)].collect().toSet
    val h = abs(hash(col("doc_id"))) % 2
    val partA = Sketches.cmsSketch(docs.filter(h === 0),
      Seq(col("source")), "text")
    val partB = Sketches.cmsSketch(docs.filter(h === 1),
      Seq(col("source")), "text")
    val summed = partA.unionByName(partB)
      .groupBy(col("source"), col("seed"), col("cell"), col("width"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("source"), col("seed"), col("cell"), col("cnt"),
        col("width"))
      .as[(String, Int, Long, Long, Int)].collect().toSet
    assert(summed == whole, "CMS merge-by-addition must be bit-exact")
    // Overestimate law: est(token) >= true frequency, for every
    // source; and an absent token estimates from real cell collisions
    // only (never negative, possibly > 0).
    val sk = Sketches.cmsSketch(docs, Seq(col("source")), "text")
    val truth = docs.select(col("source"),
      explode(graft.ns.TextOps.wordTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (s, t, n) => (s, t) -> n }.toMap
    val probeToks = truth.keys.map(_._2).toSeq.distinct.sorted.take(8) :+
      "zz_token_never_in_corpus"
    val ests = Sketches.cmsEstimate(sk, Seq("source"), probeToks)
      .as[(String, String, Long)].collect()
    assert(ests.nonEmpty)
    ests.foreach { case (s, t, est) =>
      val n = truth.getOrElse((s, t), 0L)
      assert(est >= n, s"CMS must overestimate: ($s,$t) est=$est true=$n")
    }
  }

  test("cmsSketch and featureHash aggregate map-side: partial agg " +
      "below the exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((name, df) <- Seq(
        "cmsSketch" -> Sketches.cmsSketch(docs, Seq(col("source")), "text"),
        "featureHash" -> graft.ns.TextOps.featureHash(docs, "doc_id", "text"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_count") || plan.contains("Partial"),
        s"$name: expected map-side partial aggregation in:\n$plan")
      assert(plan.contains("Exchange hashpartitioning"),
        s"$name: expected one hash exchange in:\n$plan")
    }
  }

  test("blur gate: linear gradients have zero Laplacian and fail; " +
      "noisy formula images pass; no-interior images drop") {
    import graft.ns.Multimodal
    val grad = Multimodal.parseBmpGray(
      Multimodal.writeBmpGradient(72, 64, offset = 9)).get
    assert(Multimodal.laplacianMoments(grad._1, grad._2, grad._3)
      .contains((70L * 62L, 0L, 0L)),
      "linear gradient must have identically-zero Laplacian")
    val noisy = Multimodal.parseBmpGray(
      Multimodal.writeBmp(72, 64, seed = 77L)).get
    val (n, sl, sl2) = Multimodal
      .laplacianMoments(noisy._1, noisy._2, noisy._3).get
    assert(n * sl2 - sl * sl >= 100L * n * n,
      "noisy formula image must pass the variance gate")
    // 2-pixel-wide image has no interior: dropped, not crashed
    assert(Multimodal.laplacianMoments(2, 5, Array.fill(10)(1)).isEmpty)
  }

  test("audio quality: clipping only on overdrive, leading silence " +
      "matches the prefix, malformed payloads drop") {
    import graft.ns.Multimodal
    def base(j: Int): Int = (((j.toLong * 8192) % 32768) - 16384).toInt
    val plainB = Multimodal.writeWav(8000, 101)
    val overB = Multimodal.writeWav(8000, 101, j => {
      val g = base(j).toLong * 4
      (if (g > 32767L) 32767L else if (g < -32768L) -32768L
       else g).toShort
    })
    val prefB = Multimodal.writeWav(8000, 101,
      j => if (j < 30) 0.toShort else base(j).toShort)
    val rows = Seq(("plain.wav", plainB), ("over.wav", overB),
      ("pref.wav", prefB), ("bad.wav", Array[Byte](1, 2, 3)))
      .toDF("file_name", "content")
    val got = Multimodal.audioQuality(rows).collect()
      .map(a => a.file_name -> a).toMap
    assert(got.size == 3 && !got.contains("bad.wav"))
    assert(!got("plain.wav").clipped &&
      got("plain.wav").leading_silence == 0)
    assert(got("over.wav").clipped &&
      // all but the j%4==2 zeros; 25 of those in [0, 101)
      got("over.wav").n_clipped == 101L - 25L)
    // prefix 30 (30 % 4 == 2 → sample 30 is a sawtooth zero too)
    assert(got("pref.wav").leading_silence == 31L)
    assert(!got("pref.wav").clipped)
  }

  test("writeWav → parseWav round-trips with exact integer sample facts") {
    val w = Multimodal.parseWav(Multimodal.writeWav(8000, 9)).get
    assert(w.sample_rate == 8000 && w.channels == 1 &&
      w.bits_per_sample == 16 && w.n_samples == 9 && w.byte_len == 44 + 18)
    assert(w.duration_ms == 9 * 1000L / 8000)
    // sawtooth cycle {-16384,-8192,0,8192}: 9 samples = 2 cycles + 1
    assert(w.peak_abs == 16384)
    val cyc = 16384L * 16384 + 8192L * 8192 + 8192L * 8192
    assert(w.energy == 2 * cyc + 16384L * 16384)
    // zero-length data chunk
    val z = Multimodal.parseWav(Multimodal.writeWav(44100, 0)).get
    assert(z.n_samples == 0 && z.peak_abs == 0 && z.energy == 0L)
  }

  test("parseWav walks chunk lists and rejects non-PCM16 payloads") {
    // splice an odd-sized junk chunk between fmt and data: the parser
    // must skip it (with the pad byte) and still find the samples
    val base = Multimodal.writeWav(16000, 4)
    val junk = java.nio.ByteBuffer.allocate(8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))
    val spliced = base.slice(0, 36) ++ junk.array() ++ base.slice(36, base.length)
    // fix RIFF size (not checked by the parser, but keep it honest)
    val w = Multimodal.parseWav(spliced).get
    assert(w.sample_rate == 16000 && w.n_samples == 4)
    // truncated header / wrong magic / 8-bit PCM are rejected
    assert(Multimodal.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseWav("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    val eightBit = base.clone()
    eightBit(34) = 8 // bits_per_sample LE16 at offset 34
    assert(Multimodal.parseWav(eightBit).isEmpty)
  }

  test("parseWav drops payloads with Int-overflowing chunk sizes " +
    "(no infinite walk)") {
    // a LIST chunk claiming size 0xFFFFFFF8: sz.toInt is -8, so the
    // pre-fix walk stalled (off never advanced) — must return None,
    // and promptly
    val base = Multimodal.writeWav(16000, 4)
    val evil = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("LIST".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    val spliced = base.slice(0, 36) ++ evil.array() ++
      base.slice(36, base.length)
    val done = new java.util.concurrent.CompletableFuture[Boolean]()
    val t = new Thread(() =>
      done.complete(Multimodal.parseWav(spliced).isEmpty))
    t.setDaemon(true); t.start()
    assert(done.get(10, java.util.concurrent.TimeUnit.SECONDS),
      "malformed chunk size must be dropped, not parsed")
    // a data size merely overrunning the payload stays tolerated
    // (truncated tail: parse what is there) — only the walk is strict
    val over = base.clone()
    over(40) = 0x7f // data chunk size (8) -> 127 >> remaining bytes
    assert(Multimodal.parseWav(over).exists(_.n_samples == 4))
  }

  test("parseBmpGray returns file-order channel sums matching writeBmp") {
    val w = 13; val h = 5; val seed = 77L
    val (pw, ph, gray) = Multimodal.parseBmpGray(
      Multimodal.writeBmp(w, h, seed)).get
    assert(pw == w && ph == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = seed + y.toLong * w + x
      assert(gray(y * w + x) ==
        (v % 251 + v % 241 + v % 239).toInt, s"pixel ($x,$y)")
    }
    // junk and non-24bpp rejected
    assert(Multimodal.parseBmpGray(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseBmpGray(
      "P5 3 3 255 aaaaaaaaa".getBytes("US-ASCII")).isEmpty)
  }

  test("parsePngGray: lossless round-trip of the closed-form pixel " +
      "grid; corrupt and magic-less payloads quarantine") {
    val w = 13; val h = 5; val seed = 77L
    val png = Multimodal.writePng(w, h, seed)
    val (pw, ph, gray) = Multimodal.parsePngGray(png).get
    assert(pw == w && ph == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = seed + y.toLong * w + x
      assert(gray(y * w + x) ==
        (v % 251 + v % 241 + v % 239).toInt, s"pixel ($x,$y)")
    }
    // PNG header dims decode without touching the pixel codec
    assert(Multimodal.parseDims(png).contains((w, h)))
    // truncated stream: magic present, body gone — None, no crash
    assert(Multimodal.parsePngGray(png.take(20)).isEmpty)
    // BMP bytes through the PNG path → None (magic gate)
    assert(Multimodal.parsePngGray(Multimodal.writeBmp(4, 4)).isEmpty)
  }

  test("parseImageGray auto-detects: BMP and PNG twins of one pixel " +
      "grid decode to identical arrays, so dHashes collide; junk and " +
      "lossy-codec magics fall through (stub retained)") {
    val (w, h, seed) = (72, 64, 4242L)
    val viaBmp = Multimodal.parseImageGray(
      Multimodal.writeBmp(w, h, seed)).get
    val viaPng = Multimodal.parseImageGray(
      Multimodal.writePng(w, h, seed)).get
    assert(viaBmp._1 == w && viaPng._1 == w)
    assert(java.util.Arrays.equals(viaBmp._3, viaPng._3),
      "both containers must decode the formula grid to the same array")
    assert(Multimodal.dhash64(w, h, viaBmp._3) ==
      Multimodal.dhash64(w, h, viaPng._3))
    // a JPEG magic (lossy — no codec here) is NOT gray-decodable and
    // keeps the documented stub fallback for dims
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](64)(7)
    assert(Multimodal.parseImageGray(fakeJpeg).isEmpty)
    assert(Multimodal.parseDims(fakeJpeg).isEmpty)
    assert(Multimodal.defaultDecode(Seq(fakeJpeg)) ==
      Seq(Multimodal.stubDims(fakeJpeg)))
  }

  test("dhash64: deterministic, identical inputs agree, single-cell " +
    "edits stay near") {
    val w = 72; val h = 64
    def grayFor(seed: Long): Array[Int] = {
      val (_, _, g) = Multimodal.parseBmpGray(
        Multimodal.writeBmp(w, h, seed)).get
      g
    }
    val a = Multimodal.dhash64(w, h, grayFor(42L)).get
    val b = Multimodal.dhash64(w, h, grayFor(42L)).get
    assert(a == b)
    // brighten ONE interior 8x8 cell far above its neighbors: at most
    // the two comparisons that touch the cell can flip
    val g2 = grayFor(42L).clone()
    for (y <- 24 until 32; x <- 24 until 32) g2(y * w + x) += 100000
    val c = Multimodal.dhash64(w, h, g2).get
    val hamming = java.lang.Long.bitCount(a ^ c)
    assert(hamming >= 1 && hamming <= 2, s"hamming $hamming")
    // too small for the 9x8 grid → None
    assert(Multimodal.dhash64(5, 5, Array.fill(25)(0)).isEmpty)
  }

  test("dhashImages finds planted identical pairs through real payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dhash_spec")
    (0 until 6).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"img_$i.bmp"),
        Multimodal.writeBmp(72, 64, seed = (i / 2).toLong * 500L))
    }
    // plus one malformed payload — dropped, not crashed on
    java.nio.file.Files.write(dir.resolve("img_bad.bmp"),
      Array[Byte]('B', 'M', 1, 2))
    val hashes = Multimodal.dhashImages(
      Multimodal.readBinaryDir(spark, dir.toString, "*.bmp"))
      .toDF()
      .select(regexp_extract(col("file_name"), "img_(\\d+)\\.bmp", 1)
        .cast("long").as("img_id"), col("dhash").as("simhash"))
    val pairs = graft.ns.Dedup
      .simhashNearDupPairs(hashes, "img_id", maxHamming = 0, bands = 8)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((0L, 1L), (2L, 3L), (4L, 5L)))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("boxDownsample2: exact floor means, odd-edge crop, resize→hash " +
      "pipeline composes") {
    // 4×4 gradient: block means are exact integers here
    val g = Array(
      0, 2, 10, 12,
      4, 6, 14, 16,
      40, 42, 50, 52,
      44, 46, 54, 56)
    val (ow, oh, out) = Multimodal.boxDownsample2(4, 4, g)
    assert((ow, oh) == ((2, 2)))
    assert(out.toSeq == Seq(3, 13, 43, 53))
    // floor-mean: 2×2 of (0,1,1,1) → 0 (not 1)
    assert(Multimodal.boxDownsample2(2, 2, Array(0, 1, 1, 1))
      ._3.toSeq == Seq(0))
    // odd trailing row/col cropped; degenerate 1×N → empty grid
    assert(Multimodal.boxDownsample2(5, 3, Array.fill(15)(9))._3
      .toSeq == Seq(9, 9))
    assert(Multimodal.boxDownsample2(1, 4, Array.fill(4)(7))._3.isEmpty)
    // full-payload path: writeBmp → parseBmpGray → downsample matches
    // the formula-derived expectation for every pixel
    val bytes = Multimodal.writeBmp(8, 6, seed = 5L)
    val Some((w, h, gray)) = Multimodal.parseBmpGray(bytes)
    val (ow2, oh2, small) = Multimodal.boxDownsample2(w, h, gray)
    def px(x: Int, y: Int): Int = {
      val v = 5L + y.toLong * w + x
      ((v % 251) + (v % 241) + (v % 239)).toInt
    }
    for (y <- 0 until oh2; x <- 0 until ow2) {
      val expect = (px(2 * x, 2 * y) + px(2 * x + 1, 2 * y) +
        px(2 * x, 2 * y + 1) + px(2 * x + 1, 2 * y + 1)) / 4
      assert(small(y * ow2 + x) == expect, s"pixel ($x,$y)")
    }
    // resized grid still feeds dhash64 (the perceptual pipeline) on
    // grids at least 9×8
    val big = Multimodal.writeBmp(36, 32, seed = 1L)
    val Some((bw, bh, bg)) = Multimodal.parseBmpGray(big)
    val (rw, rh, rg) = Multimodal.boxDownsample2(bw, bh, bg)
    assert(Multimodal.dhash64(rw, rh, rg).isDefined)
  }

  test("dominantFrequency: sawtooth → rate/4, Nyquist tone → rate/2, " +
      "pure grid tone → its own bin; malformed dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_goertzel")
    // period-4 sawtooth (fixture default): fundamental at bin 16/64
    java.nio.file.Files.write(dir.resolve("saw.wav"),
      Multimodal.writeWav(8000, 640))
    // alternating ±A = pure Nyquist tone: bin 32/64
    java.nio.file.Files.write(dir.resolve("nyq.wav"),
      Multimodal.writeWav(8000, 640,
        i => (if (i % 2 == 0) 12000 else -12000).toShort))
    // pure cosine at 3/64 cycles/sample: bin 3
    java.nio.file.Files.write(dir.resolve("tone3.wav"),
      Multimodal.writeWav(8000, 640, i =>
        math.round(10000.0 *
          math.cos(2 * math.Pi * 3 * i / 64.0)).toShort))
    java.nio.file.Files.write(dir.resolve("bad.wav"),
      Array[Byte]('R', 'I', 'F', 'F', 0, 0))
    val out = Multimodal.dominantFrequency(
      Multimodal.readBinaryDir(spark, dir.toString, "*.wav"))
      .collect().map(w => w.file_name -> ((w.dom_idx, w.dominant_hz)))
      .toMap
    assert(out.size == 3, "malformed payload must be dropped")
    assert(out("saw.wav") == ((16, 2000.0)))
    assert(out("nyq.wav") == ((32, 4000.0)))
    assert(out("tone3.wav") == ((3, 375.0)))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  private def toneClip(activeBits: Set[(Int, Int)], amp: Double = 3000.0,
      frames: Int = 8, frameLen: Int = 128, grid: Int = 16): Array[Byte] =
    Multimodal.writeWav(16000, frames * frameLen, { i =>
      val f = i / frameLen; val t0 = i % frameLen
      val v = (1 to 7).collect { case j if activeBits((f, j)) =>
        amp * math.sin(2.0 * math.Pi * j * t0 / grid) }.sum
      math.round(v).toShort
    })

  test("audioFingerprint: bits = planted active bands; quiet clips " +
      "are all-zero; malformed dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_afp")
    val planted = Set((0, 1), (0, 3), (3, 7), (7, 2))
    java.nio.file.Files.write(dir.resolve("a.wav"), toneClip(planted))
    // same bands at amplitude 100 — below the 500 threshold
    java.nio.file.Files.write(dir.resolve("quiet.wav"),
      toneClip(planted, amp = 100.0))
    java.nio.file.Files.write(dir.resolve("bad.wav"),
      Array[Byte]('R', 'I', 'F', 'F', 1, 2))
    val out = Multimodal.audioFingerprint(
      Multimodal.readBinaryDir(spark, dir.toString, "*.wav"))
      .collect().map(a => a.file_name -> a.sig).toMap
    assert(out.size == 2, "malformed payload must be dropped")
    val expect = planted.map { case (f, j) => 1L << (f * 8 + j - 1) }.sum
    assert(out("a.wav") == expect)
    assert(out("quiet.wav") == 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("audioFingerprint: planted twin found by pair AND bank forms") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_afp2")
    val base = Set((0, 1), (1, 2), (2, 3), (4, 5), (6, 6), (7, 7))
    java.nio.file.Files.write(dir.resolve("aud_1.wav"), toneClip(base))
    java.nio.file.Files.write(dir.resolve("aud_2.wav"),
      toneClip(base - ((0, 1)) + ((0, 2)))) // two bits moved: hamming 2
    java.nio.file.Files.write(dir.resolve("aud_3.wav"),
      toneClip(Set((0, 4), (3, 1), (5, 2), (7, 3), (2, 6), (4, 7),
        (1, 5), (6, 1)))) // unrelated pattern
    val sigs = Multimodal.audioFingerprint(
      Multimodal.readBinaryDir(spark, dir.toString, "*.wav")).toDF()
      .select(regexp_extract(col("file_name"), "aud_(\\d+)\\.wav", 1)
        .cast("long").as("audio_id"), col("sig").as("simhash"))
    val pairs = graft.ns.Dedup.simhashNearDupPairs(sigs, "audio_id",
      maxHamming = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 2)))
    // batch-vs-bank: clip 2 arriving against a stored bank {1, 3}
    val bank = graft.ns.Dedup.simhashNearDupNewVsStore(
      sigs.filter(col("audio_id") === 2L),
      sigs.filter(col("audio_id") =!= 2L), "audio_id", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bank == Set((2L, 1L, 2)))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("imageMetadata: exact dims for all three formats, corrupt and " +
      "unknown payloads quarantine, and JPEG stays out of the pixel " +
      "path (the tier boundary)") {
    val dir = Files.createTempDirectory("graft_img_meta")
    Files.write(Paths.get(dir.toString, "a.bin"),
      Multimodal.writeJpeg(20, 14, seed = 5L))
    Files.write(Paths.get(dir.toString, "b.bin"),
      Multimodal.writePng(18, 13, seed = 6L))
    Files.write(Paths.get(dir.toString, "c.bin"),
      Multimodal.writeBmp(22, 15, seed = 7L))
    // valid JPEG SOI magic, garbage body — detects as jpeg, must
    // quarantine (decode_ok false), never crash
    Files.write(Paths.get(dir.toString, "d.bin"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++
        Array.tabulate(16)(_.toByte))
    Files.write(Paths.get(dir.toString, "e.bin"),
      "not an image at all".getBytes("UTF-8"))
    val out = Multimodal.imageMetadata(
        Multimodal.readBinaryDir(spark, dir.toString, "*.bin"))
      .collect().map(m => m.file_name -> m).toMap
    assert(out("a.bin") == Multimodal.ImageMeta("a.bin", "jpeg", true,
      Some(20L), Some(14L)))
    assert(out("b.bin") == Multimodal.ImageMeta("b.bin", "png", true,
      Some(18L), Some(13L)))
    assert(out("c.bin") == Multimodal.ImageMeta("c.bin", "bmp", true,
      Some(22L), Some(15L)))
    assert(out("d.bin") == Multimodal.ImageMeta("d.bin", "jpeg", false,
      None, None))
    assert(out("e.bin") == Multimodal.ImageMeta("e.bin", "unknown",
      false, None, None))
    // pixel-path boundary: a JPEG payload never enters the gray-grid
    // operators — lossy pixels are not bit-reproducible cross-decoder
    assert(Multimodal.parseImageGray(
      Multimodal.writeJpeg(20, 14, seed = 5L)).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("audioWindows: a trailing PARTIAL window is dropped by " +
      "contract, full windows report exact integer peaks (r14)") {
    import java.nio.file.{Files => JFiles, Paths}
    val dir = JFiles.createTempDirectory("graft_aw_law")
    // 2450 samples at window 160 = 15 full windows + 50 leftover
    JFiles.write(Paths.get(dir.toString, "a.wav"),
      Multimodal.writeWav(8000, 2450,
        j => (if (j < 160) 1000 else 7).toShort))
    val out = Multimodal.audioWindows(
      Multimodal.readBinaryDir(spark, dir.toString, "*.wav"), 160)
      .collect()
    assert(out.length == 15, s"got ${out.length} windows")
    assert(out.find(_.window_idx == 0).get.peak == 1000)
    assert(out.filter(_.window_idx > 0).forall(_.peak == 7))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("activitySegments: silent-window pattern yields the closed-" +
      "form island structure; all-silent and corrupt-magic clips " +
      "are absent; ms arithmetic is exact (r14)") {
    val out = SparkEntry.queries("ns197_audio_segments")(spark, sf)
      .select("doc_id", "seg_idx", "start_ms", "end_ms", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect()
    val ids = out.map(_._1).toSet
    // quarantine classes absent
    assert(ids.forall(id => id % 13 != 3 && id % 7 != 2))
    // every eligible clip has segments
    assert(ids == (0L until 48L)
      .filter(id => id % 13 != 3 && id % 7 != 2).toSet)
    out.groupBy(_._1).foreach { case (id, segs) =>
      val sorted = segs.sortBy(_._2)
      // silencing w ≡ id (mod 3) over 15 windows: 6 runs when the
      // silent slot is w%3==1, 5 otherwise
      val expected = if (id % 3 == 1) 6 else 5
      assert(sorted.length == expected, s"clip $id: ${sorted.length}")
      // segments are disjoint, in order, and exactly span their
      // windows at 20 ms each
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3)
        case _ => ()
      }
      sorted.foreach { case (_, _, sms, ems, nw) =>
        assert(ems - sms == nw * 20L)
        assert(sms >= 0L && ems <= 300L)
      }
    }
  }

  test("shotBoundaries: first frame always opens shot 0; identical " +
      "frames never split a shot; shot ids are the running boundary " +
      "count; window is per-video (r14)") {
    val out = SparkEntry.queries("ns195_shot_boundaries")(spark, sf)
      .select("video_id", "frame_idx", "shot_id", "is_boundary")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length == 12 * 16)
    val byVid = out.groupBy(_._1)
    byVid.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // frame 0 opens shot 0, always
      assert(sorted.head._4 && sorted.head._3 == 0L)
      // identical frames (f%4 != 0 shares f/4's seed) never split:
      // no boundary inside a 4-frame block, so the block shares one
      // shot id
      sorted.filter(_._2 % 4 != 0).foreach { case (_, f, sid, b) =>
        assert(!b, s"boundary inside an identical block at frame $f")
        val blockHead = sorted.find(_._2 == (f / 4) * 4).get
        assert(sid == blockHead._3)
      }
      // shot_id is exactly the running boundary count - 1
      var run = 0L
      sorted.foreach { case (_, _, sid, b) =>
        if (b) run += 1
        assert(sid == run - 1)
      }
    }
  }

  test("parseMp4: writeMp4 round-trips every header field; truncated, " +
      "desynced, undersized, and headerless buffers all quarantine " +
      "with a named reason (the ns120 framing discipline)") {
    val full = Multimodal.writeMp4("isom", 600, 7404L, 320, 240)
    assert(Multimodal.parseMp4(full) ==
      Right(("isom", 600L, 7404L, 7404L * 1000L / 600L, 320L, 240L)))
    // duration_ms floors: 7404*1000/600 = 12340 exactly; odd case too
    val odd = Multimodal.writeMp4("mp42", 700, 999L, 8, 16)
    assert(Multimodal.parseMp4(odd) ==
      Right(("mp42", 700L, 999L, 999L * 1000L / 700L, 8L, 16L)))
    // truncation: moov's declared size overruns the cut buffer
    assert(Multimodal.parseMp4(full.take(full.length - 20)) ==
      Left("desynced_box"))
    // a box size below the 8-byte header minimum desyncs the walk;
    // ftyp is 20 bytes (8-byte header + brand + minor + one compat
    // brand), so moov's u32 size starts right there
    val moovOff = 20
    assert(new String(full, moovOff + 4, 4, "US-ASCII") == "moov")
    val bad = full.clone()
    bad(moovOff) = 0; bad(moovOff + 1) = 0
    bad(moovOff + 2) = 0; bad(moovOff + 3) = 4 // moov size := 4
    assert(Multimodal.parseMp4(bad) == Left("desynced_box"))
    // fewer than 8 bytes left mid-walk: truncated header
    assert(Multimodal.parseMp4(full ++ Array[Byte](0, 0, 0)) ==
      Left("truncated_header"))
    // no ftyp/moov at all
    assert(Multimodal.parseMp4("free".getBytes("US-ASCII")).isLeft)
    assert(Multimodal.parseMp4(Array.emptyByteArray) ==
      Left("missing_ftyp"))
    // 64-bit largesize framing parses: rewrap moov with size=1 +
    // largesize
    val ftyp = full.take(moovOff)
    val moov = full.drop(moovOff)
    def u32be(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    val large = u32be(1L) ++ "moov".getBytes("US-ASCII") ++
      u32be(0L) ++ u32be(moov.length.toLong + 8L) ++ moov.drop(8)
    assert(Multimodal.parseMp4(ftyp ++ large) ==
      Right(("isom", 600L, 7404L, 12340L, 320L, 240L)))
    // zero timescale quarantines instead of dividing by zero
    assert(Multimodal.parseMp4(
      Multimodal.writeMp4("isom", 0, 10L, 4, 4)) ==
      Left("zero_timescale"))
    // a size-8 mvhd (EMPTY body — legal framing, size == header) at
    // end-of-buffer quarantines instead of reading out of bounds
    // (r14 review: fullBoxAt read bytes(from) unguarded)
    val emptyMvhd = u32be(8L) ++ "mvhd".getBytes("US-ASCII")
    val moovEmpty = u32be(emptyMvhd.length.toLong + 8L) ++
      "moov".getBytes("US-ASCII") ++ emptyMvhd
    assert(Multimodal.parseMp4(ftyp ++ moovEmpty) ==
      Left("truncated_mvhd"))
  }

  test("frames-in-mdat (r15): writeMp4Frames round-trips the sample " +
      "table; extracted frames are BYTE-EXACT payload slices; the " +
      "metadata walk still reads the header tree") {
    val frames = (0 until 6).map(f =>
      Multimodal.writeBmp(72, 64, 5000L + (f / 2) * 1000L))
    val full = Multimodal.writeMp4Frames("isom", 600, 3600L, 72, 64,
      frames)
    // metadata tier unchanged on the richer container
    assert(Multimodal.parseMp4(full) ==
      Right(("isom", 600L, 3600L, 6000L, 72L, 64L)))
    val s = Multimodal.parseMp4Samples(full).toOption.get
    assert(s.sampleSizes.length == 6)
    assert(s.sampleSizes.forall(_ == frames.head.length.toLong))
    // every sample range slices back the exact frame bytes
    (0 until 6).foreach { i =>
      val got = java.util.Arrays.copyOfRange(full,
        s.sampleOffsets(i).toInt,
        (s.sampleOffsets(i) + s.sampleSizes(i)).toInt)
      assert(java.util.Arrays.equals(got, frames(i)), s"frame $i")
    }
  }

  test("frames-in-mdat: scheduled extraction touches ONLY scheduled " +
      "samples (corrupting an unscheduled one changes nothing), " +
      "truncated mdat quarantines, out-of-range sample table " +
      "quarantines as its own class") {
    val spark2 = spark
    import spark2.implicits._
    val frames = (0 until 8).map(f =>
      Multimodal.writeBmp(72, 64, 9000L + f * 1000L))
    val full = Multimodal.writeMp4Frames("mp42", 600, 4800L, 72, 64,
      frames)
    val s = Multimodal.parseMp4Samples(full).toOption.get
    // schedule 4 of 8 → samples 0,2,4,6; corrupt sample 3 (UNscheduled)
    val corrupted = full.clone()
    val c3 = s.sampleOffsets(3).toInt + 100
    corrupted(c3) = (corrupted(c3) ^ 0x55).toByte
    def extract(bytes: Array[Byte]) =
      Multimodal.extractMp4Frames(
        Seq(("v.mp4", bytes)).toDF("file_name", "content"), 4)
        .collect().sortBy(_.frame_idx)
        .map(f => (f.frame_idx, f.content.toSeq))
    assert(extract(full).map(_._1).toSeq == Seq(0L, 2L, 4L, 6L))
    // a container SHORTER than the schedule yields ALL its samples
    // (r15 review: floor-spaced indices collided on short containers
    // and silently dropped tail frames)
    val short3 = Multimodal.writeMp4Frames("mp42", 600, 1800L, 72, 64,
      frames.take(3))
    val gotShort = Multimodal.extractMp4Frames(
        Seq(("s.mp4", short3)).toDF("file_name", "content"), 4)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(gotShort == Seq(0L, 1L, 2L))
    assert(extract(corrupted).toSeq == extract(full).toSeq,
      "an unscheduled sample's bytes leaked into scheduled extraction")
    // extracted payloads decode as the planted BMPs
    assert(extract(full).forall { case (i, bytes) =>
      bytes == Multimodal.writeBmp(72, 64, 9000L + i * 1000L).toSeq })
    // truncated mdat: framing breaks before any slice is addressed
    assert(Multimodal.parseMp4Samples(full.take(full.length - 20)) ==
      Left("desynced_box"))
    // out-of-range sample table: patch stco's offset field to point
    // past EOF — the range validation quarantines with its own class
    val patched = full.clone()
    val stcoAt = (0 until full.length - 4).find(i =>
      full(i) == 's' && full(i + 1) == 't' && full(i + 2) == 'c' &&
        full(i + 3) == 'o').get
    // body = [ver+flags 4][entry_count 4][offset 4]
    patched(stcoAt + 12) = 0x7f.toByte
    assert(Multimodal.parseMp4Samples(patched) ==
      Left("sample_out_of_range"))
    // adversarial fixed-size stsz: patch sample_count to ~2^31-ish —
    // must quarantine as bad_stsz BEFORE allocating (r15 ADVICE: the
    // fixed-size branch allocated Array.fill(n) from the untrusted
    // header and OOM-killed the task instead of quarantining)
    val stszAt = (0 until full.length - 4).find(i =>
      full(i) == 's' && full(i + 1) == 't' && full(i + 2) == 's' &&
        full(i + 3) == 'z').get
    val bomb = full.clone()
    // body = [ver+flags 4][sample_size 4][sample_count 4]: set a
    // fixed sample_size so the count drives the allocation, then a
    // count far past the buffer length
    bomb(stszAt + 8) = 0; bomb(stszAt + 9) = 0
    bomb(stszAt + 10) = 0; bomb(stszAt + 11) = 1
    bomb(stszAt + 12) = 0x7f.toByte; bomb(stszAt + 13) = 0xff.toByte
    bomb(stszAt + 14) = 0xff.toByte; bomb(stszAt + 15) = 0xff.toByte
    assert(Multimodal.parseMp4Samples(bomb) == Left("bad_stsz"))
  }
}
