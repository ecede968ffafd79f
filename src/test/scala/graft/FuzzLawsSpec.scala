package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ns.{Multimodal, Warc}

/** Property-based robustness laws for the pure-JVM kernels and
  * parsers — the surfaces that meet ADVERSARIAL bytes at 100 TB
  * (crawl payloads, media blobs, web text). No Spark session: these
  * laws hold for the kernel functions themselves, which is exactly
  * what the codegen'd expressions call per row. Each parser law is
  * "never throws, and malformed input quarantines (None/empty)
  * rather than crashing a 1000-executor stage". */
class FuzzLawsSpec extends AnyFunSuite {

  /** Deterministic property driver: scalacheck generators sampled
    * under FIXED seeds, so a failure reproduces exactly (no flaky
    * fuzz) while still covering a few hundred adversarial shapes
    * per law. */
  private def forAll[T](g: Gen[T], n: Int = 300)(law: T => Unit): Unit = {
    val p = Gen.Parameters.default
    var i = 0L
    var hits = 0
    while (hits < n && i < n * 4L) {
      g(p, org.scalacheck.rng.Seed(i)) match {
        case Some(v) =>
          hits += 1
          try law(v) catch {
            case e: Throwable =>
              throw new AssertionError(s"law failed for seed $i: $v", e)
          }
        case None => ()
      }
      i += 1
    }
    assert(hits >= n / 2, s"generator too sparse: $hits of $n")
  }

  private val anyBytes: Gen[Array[Byte]] =
    Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  // strings over the full BMP incl. surrogate-adjacent ranges, plus
  // plain ASCII to keep the fast paths exercised
  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(0x20.toChar, 0x2fff.toChar)).map(_.mkString),
    Gen.listOf(Gen.oneOf('a', 'Z', 'é', '́', 'Ａ',
      'ﬁ', 'ガ', 'ｶ', 'ﾞ', ' ')).map(_.mkString))

  test("NfcKernel / NfkcCfKernel: never throw, idempotent, and " +
      "nfkcCf subsumes nfc on any string") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(anyText) { s: String =>
      val u = UTF8String.fromString(s)
      val nfc = graft.functions.NfcKernel.nfc(u).toString
      val cf = graft.functions.NfkcCfKernel.nfkcCf(u).toString
      assert(graft.functions.NfcKernel.nfc(
        UTF8String.fromString(nfc)).toString == nfc)
      assert(graft.functions.NfkcCfKernel.nfkcCf(
        UTF8String.fromString(cf)).toString == cf)
      // folding after canonical composition changes nothing
      assert(graft.functions.NfkcCfKernel.nfkcCf(
        UTF8String.fromString(nfc)).toString == cf)
    }
  }

  test("image parsers: arbitrary bytes never throw; decode agrees " +
      "with parseDims on dimensions when both succeed") {
    forAll(anyBytes) { bytes: Array[Byte] =>
      val dims = Multimodal.parseDims(bytes)
      val gray = Multimodal.parseImageGray(bytes)
      gray.foreach { case (w, h, g) =>
        assert(g.length == w * h)
        // parseDims is header-only, parseImageGray validates pixels
        // too — when both succeed the dims must agree
        dims.foreach(d => assert(d == ((w, h))))
      }
    }
  }

  test("WAV parser: arbitrary bytes never throw; sample count " +
      "matches features when both parse") {
    forAll(anyBytes) { bytes: Array[Byte] =>
      val f = Multimodal.parseWav(bytes)
      val s = Multimodal.parseWavSamples(bytes)
      (f, s) match {
        case (Some(wf), Some((_, samples))) =>
          assert(wf.n_samples == samples.length.toLong)
        case _ => () // quarantine paths — fine
      }
    }
  }

  test("WARC walk: arbitrary bytes never throw, record indexes " +
      "strictly increase, and at most one terminal desync/trunc row") {
    forAll(anyBytes) { bytes: Array[Byte] =>
      val recs = Warc.parseWarcAuto(7L, bytes)
      val idx = recs.map(_.rec_index)
      assert(idx == idx.sorted && idx.distinct.length == idx.length)
      val bad = recs.count(r =>
        r.status == "desync" || r.status == "truncated" ||
          r.status == "bad_gzip")
      assert(bad <= 1, s"multiple terminal rows: $recs")
    }
  }

  test("gzip round-trip: gunzipAll inverts single- and multi-member " +
      "gzip of arbitrary payload splits") {
    val payloadAndCut = for {
      bytes <- anyBytes
      cut <- Gen.choose(0, bytes.length)
    } yield (bytes, cut)
    forAll(payloadAndCut) { pc: (Array[Byte], Int) =>
      val (bytes, cut) = pc
      def gz(b: Array[Byte]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(b); g.close(); bos.toByteArray
      }
      val members = gz(bytes.take(cut)) ++ gz(bytes.drop(cut))
      val out = Warc.gunzipAll(members)
      assert(out.exists(_.sameElements(bytes)))
    }
  }

  test("int8 quantization kernel arithmetic: |q| <= 127 and " +
      "reconstruction error bounded by scale/254 per coordinate") {
    val vecGen = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1e3f, 1e3f)).map(_.toArray))
    forAll(vecGen) { v: Array[Float] =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      if (scale > 0) {
        val q = v.map(x => math.round(x.toDouble * 127.0 / scale).toInt)
        assert(q.forall(c => math.abs(c) <= 127))
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale / 127.0) <=
            scale / 254.0 + 1e-9)
        }
      }
    }
  }
}
