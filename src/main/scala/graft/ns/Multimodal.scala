package graft.ns

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for LLM-data
  * pipelines (SURVEY.md §2.8 [NS]). Media payloads are opaque `binary`
  * columns with typed metadata alongside — pointer-not-payload beyond
  * ~1 MB per object is the 100 TB rule (store a path, not the bytes).
  *
  * The DECODE step is real for the dependency-free formats — BMP and
  * PNM (PBM/PGM/PPM) dimensions are parsed from the payload header in
  * pure JVM code ([[parseDims]]), and PNG decodes fully (header dims
  * AND lossless pixels via `javax.imageio`, r12) — and falls back to
  * a clearly-marked deterministic fake ([[stubDims]]) for formats
  * that need a codec this container does not have (JPEG/MP4/...).
  * Everything AROUND the
  * decode is real and tested — the binaryFile source schema, the
  * metadata projection, the batched `mapPartitions` execution shape
  * (the Scala analogue of a vectorized/batched decode UDF: payload
  * bytes reach the decoder in per-partition batches, never
  * row-at-a-time through the driver), and the frame-sampling fan-out.
  */
object Multimodal {

  /** One decoded media row: real payload facts (name, bytes, sha256)
    * plus decoder output. Dims come from the REAL header decoders
    * below for the codec-free formats (BMP/PNG/PNM/JPEG markers, WAV
    * and MP4 via their own parsers); [[stubDims]] is only the
    * declared fallback for lossy-codec payloads no header walk can
    * size. */
  final case class MediaFeatures(file_name: String, byte_len: Long,
      sha256: String, width: Int, height: Int)

  /** Batched decode hook signature: a partition's payloads arrive in
    * batches of `batchSize`; returns (width, height) per payload. A
    * real deployment plugs a codec (JNI/javacv) here — the engine-side
    * contract does not change. */
  type DecodeBatch = Seq[Array[Byte]] => Seq[(Int, Int)]

  /** STUB fallback for codec-requiring formats: deterministic fake
    * dimensions from the payload size. A pure function of the bytes,
    * so re-runs stay idempotent; a real deployment plugs a codec into
    * [[decodeFeatures]] for those formats. */
  def stubDims(bytes: Array[Byte]): (Int, Int) =
    ((bytes.length % 640 + 1), ((bytes.length * 7) % 480 + 1))

  /** Real header decode for the codec-free image formats:
    *  - BMP (`BM` magic): BITMAPCOREHEADER (DIB size 12, u16 dims at
    *    18/20) and BITMAPINFOHEADER+ (DIB size >= 40, i32 dims at
    *    18/22; negative height = top-down rows, dims are |height|).
    *    Little-endian throughout, per the public format spec.
    *  - PNG (8-byte magic): IHDR is mandated first, so width/height
    *    are the big-endian u32s at offsets 16/20.
    *  - PNM `P1`..`P6`: ASCII header `magic [#comment]* width height`,
    *    tokens separated by whitespace, `#` comments run to newline.
    * Returns None for anything else (malformed or codec-requiring —
    * lossy formats like JPEG stay on the [[stubDims]] fallback). */
  def parseDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    if (bytes.length >= 22 && bytes(0) == 'B' && bytes(1) == 'M') {
      val dib = le32(14)
      if (dib == 12) {
        val (w, h) = (le16(18), le16(20))
        if (w > 0 && h > 0) Some((w, h)) else None
      } else if (dib >= 40 && bytes.length >= 26) {
        val (w, h) = (le32(18), le32(22))
        if (w > 0 && h != 0) Some((w, math.abs(h))) else None
      } else None
    } else if (hasPngMagic(bytes) && bytes.length >= 24) {
      // PNG IHDR: big-endian u32 width/height at offsets 16/20
      def be32(off: Int): Long =
        ((u8(off).toLong << 24) | (u8(off + 1) << 16) |
          (u8(off + 2) << 8) | u8(off + 3)) & 0xffffffffL
      val (w, h) = (be32(16), be32(20))
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some((w.toInt, h.toInt))
      else None
    } else if (bytes.length >= 2 && bytes(0) == 'P' &&
      bytes(1) >= '1' && bytes(1) <= '6') {
      // Tokenize just far enough for two decimal fields.
      var i = 2
      def nextInt(): Option[Int] = {
        while (i < bytes.length &&
          (Character.isWhitespace(bytes(i)) || bytes(i) == '#')) {
          if (bytes(i) == '#')
            while (i < bytes.length && bytes(i) != '\n') i += 1
          else i += 1
        }
        var v = 0L; var any = false
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); any = true
          if (v > Int.MaxValue) return None
          i += 1
        }
        if (any) Some(v.toInt) else None
      }
      for { w <- nextInt(); h <- nextInt() if w > 0 && h > 0 }
        yield (w, h)
    } else None
  }

  /** Default decoder: real header parse where the format allows it,
    * size-keyed stub otherwise. */
  val defaultDecode: DecodeBatch =
    batch => batch.map(bytes => parseDims(bytes).getOrElse(stubDims(bytes)))

  /** Minimal 24-bit BMP encoder (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding) — fixture/round-trip counterpart of
    * [[parseDims]]. Pixels are a deterministic function of `seed` and
    * position, so payload bytes (hence sha256) are reproducible.
    * File size is exactly `54 + ((w*3 + 3)/4*4) * h`. */
  def writeBmp(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    require(width > 0 && height > 0, "BMP dims must be positive")
    val rowSize = (width * 3 + 3) / 4 * 4
    val fileSize = 54 + rowSize * height
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54)                       // reserved, data offset
    b.putInt(40).putInt(width).putInt(height)     // BITMAPINFOHEADER
      .putShort(1).putShort(24)                   // planes, bpp
      .putInt(0).putInt(rowSize * height)         // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed + y.toLong * width + x
        b.put((v % 251).toByte).put((v % 241).toByte).put((v % 239).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      y += 1
    }
    b.array()
  }

  /** Linear-gradient 24-bit BMP (same container as [[writeBmp]]):
    * channels (blue, green, red) = (x + y + offset, x, y), so the
    * decoded gray value 2x + 2y + offset is LINEAR in position and
    * its 4-neighbor Laplacian is identically zero — the closed-form
    * "maximally blurred" fixture for [[blurScores]] (a blur kernel
    * maps any image toward exactly this low-second-derivative
    * shape). */
  def writeBmpGradient(width: Int, height: Int,
      offset: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && offset >= 0 &&
      width - 1 + height - 1 + offset <= 255 &&
      width <= 256 && height <= 256,
      "gradient channels must stay within one byte")
    val rowSize = (width * 3 + 3) / 4 * 4
    val fileSize = 54 + rowSize * height
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        b.put((x + y + offset).toByte).put(x.toByte).put(y.toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      y += 1
    }
    b.array()
  }

  /** One decoded audio row: payload facts + real RIFF/WAVE header and
    * PCM16 sample-stream facts. `energy` is the exact integer sum of
    * squared samples (order-independent long arithmetic — the
    * hash-gateable stand-in for RMS, which a consumer derives as
    * sqrt(energy/n)). */
  final case class WavFeatures(file_name: String, byte_len: Long,
      sample_rate: Int, channels: Int, bits_per_sample: Int,
      n_samples: Long, duration_ms: Long, peak_abs: Int, energy: Long)

  /** Real RIFF/WAVE parse (PCM16): walks the chunk list (`fmt ` may be
    * followed by `LIST`/`fact`/... before `data` — chunk-skipping is
    * the part naive parsers get wrong), reads the format block, then
    * folds the data chunk's little-endian s16 samples for peak and
    * exact energy. Returns None for malformed/non-PCM16 payloads. */
  def parseWav(bytes: Array[Byte]): Option[WavFeatures] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    def s16(o: Int): Int = le16(o).toShort.toInt
    def le32(o: Int): Long =
      (u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16) |
        (u8(o + 3).toLong << 24)) & 0xffffffffL
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      val body = off + 8
      if (id == "fmt " && sz >= 16 && body + 16 <= bytes.length) {
        val audioFormat = le16(body)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le32(body + 4).toInt, le16(body + 2), le16(body + 14)))
      } else if (id == "data") {
        val (rate, ch, bits) = fmt.getOrElse(return None)
        if (bits != 16 || ch < 1 || rate <= 0) return None
        val dataLen = math.min(sz, (bytes.length - body).toLong).toInt
        val n = dataLen / 2
        var i = 0; var peak = 0; var energy = 0L
        while (i < n) {
          val v = s16(body + 2 * i)
          val a = math.abs(v)
          if (a > peak) peak = a
          energy += v.toLong * v
          i += 1
        }
        val frames = n / ch
        return Some(WavFeatures("", bytes.length.toLong, rate, ch, bits,
          frames, frames * 1000L / rate, peak, energy))
      }
      // chunks are word-aligned: odd sizes carry a pad byte. Advance
      // in Long: a malformed 32-bit size (e.g. 0xFFFFFFF8) overflows
      // Int negative and would stall or reverse the walk — drop the
      // payload instead, and require strict progress.
      val next = body.toLong + sz + (sz & 1L)
      if (next <= off.toLong || next > bytes.length.toLong) return None
      off = next.toInt
    }
    None
  }

  /** Minimal PCM16 mono WAV encoder — fixture/round-trip counterpart
    * of [[parseWav]]. Default samples are a pure function of position
    * (sawtooth `(i * 8192) mod 32768 − 16384`), so peak and energy
    * are closed forms an SQL oracle can reproduce exactly; tests may
    * pass a custom `sample` waveform. */
  def writeWav(sampleRate: Int, nSamples: Int,
      sample: Int => Short =
        i => (((i.toLong * 8192) % 32768) - 16384).toShort
      ): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0, "bad WAV parameters")
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                 // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)                // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      b.putShort(sample(i))
      i += 1
    }
    b.array()
  }

  /** PCM16 sample extraction: the [[parseWav]] chunk walk, but
    * returning (sample_rate, channel-0 samples) instead of folded
    * features. Multi-channel payloads keep channel 0 (dominant-
    * frequency analysis is per-channel; fixtures are mono). Returns
    * None for malformed/non-PCM16 payloads, same contract as
    * [[parseWav]]. */
  def parseWavSamples(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    def s16(o: Int): Int = le16(o).toShort.toInt
    def le32(o: Int): Long =
      (u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16) |
        (u8(o + 3).toLong << 24)) & 0xffffffffL
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      val body = off + 8
      if (id == "fmt " && sz >= 16 && body + 16 <= bytes.length) {
        if (le16(body) != 1) return None
        fmt = Some((le32(body + 4).toInt, le16(body + 2), le16(body + 14)))
      } else if (id == "data") {
        val (rate, ch, bits) = fmt.getOrElse(return None)
        if (bits != 16 || ch < 1 || rate <= 0) return None
        val dataLen = math.min(sz, (bytes.length - body).toLong).toInt
        val frames = dataLen / 2 / ch
        val out = new Array[Int](frames)
        var f = 0
        while (f < frames) { out(f) = s16(body + 2 * f * ch); f += 1 }
        return Some((rate, out))
      }
      val next = body.toLong + sz + (sz & 1L)
      if (next <= off.toLong || next > bytes.length.toLong) return None
      off = next.toInt
    }
    None
  }

  final case class AudioWindow(file_name: String, sample_rate: Int,
      window_idx: Int, peak: Int)

  /** Fixed-width activity windows over PCM16 clips (r14) — the
    * audio face of the per-frame video analysis: each FULL window of
    * `windowSamples` channel-0 samples reports its peak |amplitude|
    * (exact integer; a trailing partial window is dropped by
    * contract). Decode is the [[parseWav]] chunk walk — batched
    * mapPartitions, malformed payloads quarantined by returning no
    * windows — and everything downstream is ordinary DataFrame code. */
  def audioWindows(df: DataFrame, windowSamples: Int,
      batchSize: Int = 64): Dataset[AudioWindow] = {
    require(windowSamples > 0, "windowSamples must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (name, bytes) =>
          parseWavSamples(
            if (bytes == null) Array.emptyByteArray else bytes) match {
            case None => Seq.empty
            case Some((rate, samples)) =>
              (0 until samples.length / windowSamples).map { w =>
                var peak = 0
                var i = w * windowSamples
                val end = i + windowSamples
                while (i < end) {
                  val a = math.abs(samples(i))
                  if (a > peak) peak = a
                  i += 1
                }
                AudioWindow(name, rate, w, peak)
              }
          }
        })
      }
  }

  /** Voice-activity segmentation over [[audioWindows]] output: a
    * window is ACTIVE when its peak reaches `threshold`, and a
    * segment is a maximal run of active windows — the classic
    * gaps-and-islands (window_idx − row_number over the clip's
    * active windows is constant exactly on a run). Output per
    * segment: (idCol, seg_idx from 0 in time order, start_ms,
    * end_ms exclusive, n_windows), all exact integer arithmetic at
    * `msPerWindow` per window. One shuffle on the clip id; no clip
    * ever compares against another. */
  def activitySegments(windows: DataFrame, idCol: String,
      threshold: Int, msPerWindow: Long): DataFrame = {
    val byClip = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("window_idx"))
    windows.filter(col("peak") >= threshold)
      .withColumn("__isl",
        col("window_idx") - row_number().over(byClip))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("window_idx")).as("__sw"),
        max(col("window_idx")).as("__ew"),
        count(lit(1)).as("n_windows"))
      .withColumn("seg_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("__sw")))
          .cast("long") - 1L)
      .select(col(idCol), col("seg_idx"),
        (col("__sw") * lit(msPerWindow)).as("start_ms"),
        ((col("__ew") + 1) * lit(msPerWindow)).as("end_ms"),
        col("n_windows"))
  }

  final case class WavDominant(file_name: String, sample_rate: Int,
      n_samples: Long, dom_idx: Int, dominant_hz: Double)

  /** Goertzel power |X(k)|² at normalized frequency `k` cycles/sample
    * — the O(N) single-bin DFT, exact for integer bins. */
  def goertzelPower(samples: Array[Int], k: Double): Double = {
    val coeff = 2.0 * math.cos(2.0 * math.Pi * k)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < samples.length) {
      val s0 = samples(i) + coeff * s1 - s2
      s2 = s1; s1 = s0; i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Dominant-frequency extraction over decoded WAV payloads: probe a
    * FIXED grid of `gridSize/2` candidate frequencies (j/gridSize
    * cycles/sample for j = 1..gridSize/2, DC excluded, Nyquist
    * included) with Goertzel, and keep the argmax — ties to the
    * lowest j. Cost is O(gridSize·N) per clip and wholly map-side
    * (the [[decodeFeatures]] batch shape), so at 100 TB each
    * executor scans its own audio partition once; the grid bound is
    * what keeps per-clip cost linear instead of an N·log N FFT whose
    * output would then need a full-spectrum argmax anyway.
    *
    * When the clip length is a multiple of gridSize the grid
    * frequencies are exact DFT bins (zero spectral leakage), so on
    * closed-form fixtures the winning bin is an integer-arithmetic
    * prediction — which is what lets an SQL oracle gate a DSP
    * operator bit-for-bit: dom_idx is exact, and dominant_hz =
    * rate·j/gridSize divides a power of two (exact double).
    * Malformed or empty payloads are dropped, never thrown. */
  def dominantFrequency(df: DataFrame, gridSize: Int = 64,
      batchSize: Int = 64): Dataset[WavDominant] = {
    require(gridSize >= 2 && gridSize % 2 == 0,
      "gridSize must be even and >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (name, bytes) =>
            parseWavSamples(bytes).collect {
              case (rate, samples) if samples.nonEmpty =>
                var bestJ = 1
                var bestP = Double.NegativeInfinity
                var j = 1
                while (j <= gridSize / 2) {
                  val p = goertzelPower(samples, j.toDouble / gridSize)
                  if (p > bestP) { bestP = p; bestJ = j }
                  j += 1
                }
                WavDominant(name, rate, samples.length.toLong, bestJ,
                  rate.toDouble * bestJ / gridSize)
            }
          }
        }
      }
  }

  /** One audio fingerprint row: real payload facts + the packed
    * binary-spectrogram signature. */
  final case class AudioFingerprint(file_name: String, n_samples: Long,
      sig: Long)

  /** Audio fingerprint for near-dup detection — the binary
    * spectrogram (Haitsma–Kalker shape, shrunk to one 64-bit word):
    * the clip splits into `frames` time frames; per frame each
    * Goertzel grid band j = 1..gridSize/2 contributes one bit, set
    * iff the band's power clears a FIXED absolute threshold
    * ((ampThresh·frameLen/2)² — the power a sinusoid of amplitude
    * `ampThresh` would score). An absolute threshold rather than a
    * band-vs-band sign keeps every bit decision orders of magnitude
    * away from float noise on real signals, which is what lets the
    * ns124 gate hash the signature exactly (the ns74 exact-bin
    * trick); perceptually it reads "which bands are active when",
    * the fingerprint radio-style audio dedup uses.
    *
    * Hamming distance between signatures is then the near-dup
    * metric, and the packed long drops straight into the SimHash
    * Hamming-band machinery ([[Dedup.simhashNearDupPairs]] /
    * [[Dedup.simhashNearDupNewVsStore]]) — banded equi-joins, never
    * all-pairs, the ns119 batch-vs-bank shape included. Map-side
    * batched decode ([[decodeWavFeatures]]'s shape); malformed or
    * too-short payloads are dropped, never thrown. */
  def audioFingerprint(df: DataFrame, gridSize: Int = 16,
      frames: Int = 8, ampThresh: Double = 500.0,
      batchSize: Int = 64): Dataset[AudioFingerprint] = {
    require(gridSize >= 2 && gridSize % 2 == 0,
      "gridSize must be even and >= 2")
    require(frames >= 1 && frames * (gridSize / 2) <= 64,
      "frames * gridSize/2 must fit 64 signature bits")
    val spark = df.sparkSession
    import spark.implicits._
    val bins = gridSize / 2
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(it => it.grouped(batchSize).flatMap(_.flatMap {
        case (name, bytes) =>
          parseWavSamples(bytes).collect {
            case (_, samples) if samples.length >= frames * gridSize =>
              val frameLen = samples.length / frames
              val thr = {
                val a = ampThresh * frameLen / 2.0; a * a
              }
              var sig = 0L
              var f = 0
              while (f < frames) {
                val fr = java.util.Arrays.copyOfRange(
                  samples, f * frameLen, (f + 1) * frameLen)
                var j = 1
                while (j <= bins) {
                  if (goertzelPower(fr, j.toDouble / gridSize) > thr)
                    sig |= 1L << (f * bins + (j - 1))
                  j += 1
                }
                f += 1
              }
              AudioFingerprint(name, samples.length.toLong, sig)
          }
      }))
  }

  /** Batched WAV decode over a binaryFile frame — same per-partition
    * batch shape as [[decodeFeatures]]; malformed payloads are dropped
    * (a curation pass quarantines, it does not crash). */
  def decodeWavFeatures(df: DataFrame,
      batchSize: Int = 64): Dataset[WavFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (name, bytes) =>
            parseWav(bytes).map(_.copy(file_name = name))
          }
        }
      }
  }

  /** Binary-file source: one row per file under `dir` matching `glob`,
    * with Spark's binaryFile schema (path, modificationTime, length,
    * content) plus a projected file_name. Filters on `length`/path
    * push down to the file listing, so "skip payloads > 1 MB" costs
    * no reads. */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .withColumn("file_name",
        element_at(split(col("path"), "/"), -1))

  /** Decode features over binary payloads in per-partition batches.
    * The sha256/byte_len columns are computed by (codegen'd) native
    * expressions before the typed mapPartitions, so the decoder hook
    * receives exactly (name, bytes) pairs — the minimal surface a
    * codec needs. */
  def decodeFeatures(df: DataFrame, decode: DecodeBatch = defaultDecode,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"),
      sha2(col("content"), 256).as("sha256"),
      length(col("content")).cast("long").as("byte_len"))
      .as[(String, Array[Byte], String, Long)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val dims = decode(batch.map(_._2))
          batch.lazyZip(dims).map { case ((name, _, sha, len), (w, h)) =>
            MediaFeatures(name, len, sha, w, h)
          }
        }
      }
  }

  /** 24-bit BITMAPINFOHEADER BMP pixel decode to a per-pixel gray sum
    * grid in FILE row order (no bottom-up flip — a perceptual hash
    * only needs a deterministic orientation, and the generation
    * formula in [[writeBmp]] is expressed in file order). Gray is the
    * plain channel sum b0+b1+b2 (0..765): divisions would only rescale
    * every later comparison identically, so they are omitted and all
    * downstream arithmetic stays exact-integer. Returns
    * (width, height, gray rows in file order); None for anything that
    * is not a well-formed bottom-row-first 24bpp BMP. */
  def parseBmpGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(o: Int): Int =
      u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16) | (u8(o + 3) << 24)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = le32(10)
    if (le32(14) < 40) return None
    val w = le32(18); val h = le32(22)
    val bpp = (u8(28) | (u8(29) << 8))
    if (w <= 0 || h <= 0 || bpp != 24) return None
    val rowSize = (w * 3 + 3) / 4 * 4
    if (dataOff.toLong + rowSize.toLong * h > bytes.length) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      val base = dataOff + y * rowSize
      while (x < w) {
        val o = base + 3 * x
        gray(y * w + x) = u8(o) + u8(o + 1) + u8(o + 2)
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def hasPngMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), PngMagic)

  /** Minimal RGB PNG encoder via `javax.imageio` (JDK-only — PNG is
    * the one common web-image format decodable without an external
    * codec): pixel at IMAGE position (x, y) carries
    * (r, g, b) = (v%251, v%241, v%239) for v = seed + y·w + x — the
    * SAME channel formula as [[writeBmp]], expressed in top-down
    * image order where BMP's is bottom-up file order. Because each
    * decoder reads its own container's natural order, the two decoded
    * gray grids are IDENTICAL arrays, so a fixture grid hashed
    * through either container must produce the same dHash — the
    * cross-format law NsSketchesMultimodalSpec pins. */
  def writePng(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed + y.toLong * width + x
        img.setRGB(x, y,
          (((v % 251).toInt << 16) | ((v % 241).toInt << 8) |
            (v % 239).toInt))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** PNG pixel decode to the [[parseBmpGray]] gray-sum convention
    * (r+g+b per pixel, 0..765), rows in top-down image order. PNG is
    * LOSSLESS, so decoded channel values are exact — which is what
    * makes a PNG-fed dHash/resize/blur gate hash-stable; lossy
    * codecs (JPEG) stay behind the documented [[stubDims]] fallback.
    * Returns None (quarantine, not crash) on a missing magic, a
    * truncated/corrupt stream, or anything ImageIO cannot decode. */
  def parsePngGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!hasPngMagic(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        gray(y * w + x) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  /** Format auto-detect over the magic bytes: BMP → [[parseBmpGray]],
    * PNG → [[parsePngGray]], anything else None — the single decode
    * entry the gray-grid operators (dHash, resize, blur) call, so a
    * mixed-format corpus needs no per-format branches upstream.
    * JPEG deliberately stays OUT of this pixel path: lossy decode is
    * not bit-reproducible across decoder implementations, so a JPEG
    * payload can never feed a pixel-exact hash gate — it goes
    * through the METADATA tier ([[imageMetadata]]) instead. */
  def parseImageGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      parseBmpGray(bytes)
    else if (hasPngMagic(bytes)) parsePngGray(bytes)
    else None

  /** JPEG SOI magic: FF D8 FF. */
  def hasJpegMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte

  /** Noisy-formula JPEG ([[writeBmp]]'s pixel formula in a lossy
    * container) — fixture-side only: dims are exact through any
    * conformant decoder, pixel values are NOT (lossy), which is
    * precisely the boundary [[imageMetadata]] exists to respect. */
  def writeJpeg(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed + y.toLong * width + x
        img.setRGB(x, y,
          (((v % 251).toInt << 16) | ((v % 241).toInt << 8) |
            (v % 239).toInt))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  final case class ImageMeta(file_name: String, format: String,
      decode_ok: Boolean, width: Option[Long], height: Option[Long])

  /** Image METADATA tier — what a multimodal corpus needs first for
    * the formats the pixel gates cannot cover (r12 verdict gap #5):
    * format by magic bytes (bmp/png/jpeg/unknown), decode
    * verification, and dimensions; corrupt or undecodable payloads
    * QUARANTINE (decode_ok false, null dims) instead of crashing the
    * pass — the j04 malformed-row contract at the byte layer.
    *
    * The tier boundary, stated precisely: DIMENSIONS of a decoded
    * image are exact in any conformant decoder (they live in the
    * stream headers), so they hash-gate; JPEG PIXELS are lossy-
    * decoder-dependent and are deliberately NOT surfaced — the
    * pixel operators (dHash/resize/blur) accept only the lossless
    * formats via [[parseImageGray]], and JPEG pixel work stays
    * behind the documented [[stubDims]]-era stub until a
    * bit-reproducible decode path exists.
    *
    * Same mapPartitions batch shape as [[decodeFeatures]]:
    * embarrassingly parallel, decoder-bound, no shuffle. */
  def imageMetadata(df: DataFrame,
      batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (name, bytes) =>
          val fmt =
            if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
              "bmp"
            else if (hasPngMagic(bytes)) "png"
            else if (hasJpegMagic(bytes)) "jpeg"
            else "unknown"
          val dims: Option[(Int, Int)] = fmt match {
            case "bmp" => parseBmpGray(bytes).map(g => (g._1, g._2))
            case "png" | "jpeg" =>
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
                catch { case _: Throwable => null }
              if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
                None
              else Some((img.getWidth, img.getHeight))
            case _ => None
          }
          ImageMeta(name, fmt, dims.isDefined,
            dims.map(_._1.toLong), dims.map(_._2.toLong))
        })
      }
  }

  /** 2×2 box-filter downsample of a gray grid — the pixel half of
    * the multimodal resize step. Output pixel (x,y) is the FLOOR
    * mean of its 2×2 source block: exact integer arithmetic, so the
    * result is bit-reproducible (no float filter kernels). Odd
    * trailing rows/columns are cropped (floor dims), the standard
    * pyramid-downsample convention. */
  def boxDownsample2(w: Int, h: Int,
      gray: Array[Int]): (Int, Int, Array[Int]) = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      val r0 = (2 * y) * w; val r1 = r0 + w
      while (x < ow) {
        val c = 2 * x
        out(y * ow + x) =
          (gray(r0 + c) + gray(r0 + c + 1) +
            gray(r1 + c) + gray(r1 + c + 1)) / 4
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  final case class ResizedImage(file_name: String, in_w: Int,
      in_h: Int, out_w: Int, out_h: Int, gray_checksum: Long)

  /** Corpus image resize: decode each 24bpp BMP payload, 2×2
    * box-downsample the gray grid ([[boxDownsample2]]), and emit the
    * dims plus the exact integer sum of the resized pixels — the
    * scalar the SQL oracle can predict pixel-for-pixel from the
    * fixture generation formula. Same mapPartitions batch shape as
    * [[decodeFeatures]]; malformed payloads are dropped, and images
    * thinner than 2px in either dimension resize to an empty grid
    * (checksum 0) rather than erroring — a curation pass quarantines
    * degenerate payloads downstream, it does not crash. At scale the
    * pass is embarrassingly parallel and CPU-bound in the decoder,
    * exactly like the dHash pass it feeds (resize-then-hash is the
    * standard perceptual pipeline). */
  def resizeImages(df: DataFrame,
      batchSize: Int = 64): Dataset[ResizedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (name, bytes) =>
            parseImageGray(bytes).map { case (w, h, gray) =>
              val (ow, oh, out) = boxDownsample2(w, h, gray)
              var s = 0L
              var i = 0
              while (i < out.length) { s += out(i); i += 1 }
              ResizedImage(name, w, h, ow, oh, s)
            }
          }
        }
      }
  }

  /** Difference hash (dHash, public perceptual-hash folklore) over a
    * gray grid: partition the top-left (9·cw)×(8·ch) region into a
    * 9×8 cell grid (cw = w/9, ch = h/8), take each cell's exact
    * integer gray SUM (equal-size cells ⇒ comparing sums ≡ comparing
    * means, with no rounding to argue about), and emit bit
    * (cy·8 + cx) = 1 iff sum(cx,cy) > sum(cx+1,cy). 64 bits packed
    * into a long, directly reusable by [[Dedup.simhashNearDupPairs]]'s
    * Hamming-banded join. Returns None when the image is smaller than
    * the 9×8 grid. */
  def dhash64(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    val cw = w / 9; val ch = h / 8
    if (cw == 0 || ch == 0) return None
    val sums = Array.ofDim[Long](9, 8)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        var s = 0L
        var y = cy * ch
        while (y < (cy + 1) * ch) {
          var x = cx * cw
          while (x < (cx + 1) * cw) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        sums(cx)(cy) = s
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (sums(cx)(cy) > sums(cx + 1)(cy))
          bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    Some(bits)
  }

  /** One perceptually-hashed image row. */
  final case class ImageHash(file_name: String, width: Int, height: Int,
      dhash: Long)

  /** Shot-boundary detection over per-frame dHashes (r14) — the
    * video-ANALYSIS face the metadata tier (ns191/p12) deliberately
    * does not cover: a frame starts a new shot when its dHash is
    * more than `maxHamming` bits from the PREVIOUS frame's (or it is
    * the video's first frame), and `shot_id` is the running boundary
    * count minus one — so ids are contiguous from 0 and a shot's
    * first frame is its keyframe. One lag + one running sum, both
    * over the SAME video-partitioned frame-ordered window: per-video
    * state only, no video ever compares against another, and at
    * 100 TB the pass shuffles once on video_id (frames of one video
    * co-locate) with every comparison map-side thereafter. */
  def shotBoundaries(frames: DataFrame, videoCol: String,
      frameCol: String, dhashCol: String,
      maxHamming: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(videoCol)).orderBy(col(frameCol))
    frames
      .withColumn("__prev", lag(col(dhashCol), 1).over(w))
      .withColumn("is_boundary", col("__prev").isNull ||
        bit_count(col(dhashCol).bitwiseXOR(col("__prev"))) >
          maxHamming)
      .withColumn("shot_id",
        sum(col("is_boundary").cast("long")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)) - 1L)
      .drop("__prev")
  }

  /** Batched BMP→dHash over a binaryFile frame (the
    * [[decodeFeatures]] execution shape); malformed/undersized
    * payloads are dropped, not crashed on. */
  def dhashImages(df: DataFrame, batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (name, bytes) =>
          for {
            (w, h, gray) <- parseImageGray(bytes)
            bits <- dhash64(w, h, gray)
          } yield ImageHash(name, w, h, bits)
        })
      }
  }

  /** Frame sampling fan-out for "video" payloads: emit `nFrames`
    * evenly-spaced byte-range slices per file as (file_name, frame_idx,
    * frame_sha256). The slicing is real (substring over binary); a
    * codec would replace byte ranges with decoded frames, keeping the
    * same explode shape — one narrow generator, no shuffle. */
  def frameSample(df: DataFrame, nFrames: Int): DataFrame =
    df.select(col("file_name"), col("content"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("__step",
        greatest(floor(length(col("content")) / nFrames), lit(1))
          .cast("int"))
      .withColumn("__frame",
        expr("substring(content, frame_idx * __step + 1, __step)"))
      .select(col("file_name"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("__frame")).cast("long").as("frame_len"),
        sha2(col("__frame"), 256).as("frame_sha256"))

  final case class BlurScore(file_name: String, width: Int,
      height: Int, n_lap: Long, sum_lap: Long, sum_lap2: Long,
      sharp: Boolean)

  /** Interior 4-neighbor Laplacian moments of a gray grid:
    * (n, ΣL, ΣL²) with L(x,y) = 4g(x,y) − g(x−1,y) − g(x+1,y) −
    * g(x,y−1) − g(x,y+1) over 1 ≤ x ≤ w−2, 1 ≤ y ≤ h−2 — all exact
    * long arithmetic. None when the image has no interior. */
  def laplacianMoments(w: Int, h: Int,
      gray: Array[Int]): Option[(Long, Long, Long)] = {
    if (w < 3 || h < 3) return None
    var s = 0L; var s2 = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      val r = y * w
      while (x < w - 1) {
        val l = 4L * gray(r + x) - gray(r + x - 1) - gray(r + x + 1) -
          gray(r - w + x) - gray(r + w + x)
        s += l; s2 += l * l
        x += 1
      }
      y += 1
    }
    Some(((w - 2).toLong * (h - 2), s, s2))
  }

  /** Variance-of-Laplacian blur scoring — the standard image-quality
    * gate in front of multimodal training sets (blurry/flat images
    * carry little signal; OpenCV folklore, Pech-Pacheco et al. 2000):
    * a sharp image has high-variance second derivatives, a blurred or
    * flat one near-zero. Kept EXACT: the score is the integer pair
    * (ΣL, ΣL²) over interior pixels, and the keep decision compares
    * cross-multiplied integers — `sharp` ⇔ population variance ≥
    * `minVariance` ⇔ n·ΣL² − (ΣL)² ≥ minVariance·n² — so the gate is
    * engine-reproducible with no float division anywhere. Same batch
    * decode shape (and malformed-payload drop contract) as
    * [[dhashImages]]; map-side, no shuffle. */
  def blurScores(df: DataFrame, minVariance: Long = 100L,
      batchSize: Int = 64): Dataset[BlurScore] = {
    require(minVariance >= 0, "minVariance must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (name, bytes) =>
          for {
            (w, h, gray) <- parseImageGray(bytes)
            (n, s, s2) <- laplacianMoments(w, h, gray)
          } yield BlurScore(name, w, h, n, s, s2,
            // var = (n·ΣL² − ΣL²̄)/n² compared in exact integers
            n * s2 - s * s >= minVariance * n * n)
        })
      }
  }

  final case class AudioQuality(file_name: String, n_samples: Long,
      n_clipped: Long, n_silent: Long, leading_silence: Long,
      clipped: Boolean, mostly_silent: Boolean)

  /** Clipping / silence audit over PCM16 payloads — the two cheap
    * audio-quality gates a speech corpus runs before any model sees a
    * clip: `n_clipped` counts full-scale samples (32767 / −32768, the
    * digital-clipping signature), `n_silent` counts |s| ≤ `silenceThr`,
    * `leading_silence` is the length of the silent prefix, and the
    * flags are exact integer decisions (`clipped` ⇔ any clipped
    * sample; `mostly_silent` ⇔ 2·n_silent > n_samples). All counts are
    * exact longs over the real sample stream ([[parseWavSamples]]'s
    * chunk walk), so the whole audit hash-gates; malformed payloads
    * are dropped, not crashed on. Map-side, no shuffle. */
  def audioQuality(df: DataFrame, silenceThr: Int = 0,
      batchSize: Int = 64): Dataset[AudioQuality] = {
    require(silenceThr >= 0, "silenceThr must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (name, bytes) =>
          parseWavSamples(bytes).map { case (_, samples) =>
            var clip = 0L; var silent = 0L; var lead = 0L
            var leading = true
            var i = 0
            while (i < samples.length) {
              val s = samples(i)
              if (s == 32767 || s == -32768) clip += 1
              val isSilent = math.abs(s) <= silenceThr
              if (isSilent) silent += 1
              if (leading && isSilent) lead += 1 else leading = false
              i += 1
            }
            AudioQuality(name, samples.length.toLong, clip, silent,
              lead, clip > 0, 2L * silent > samples.length)
          }
        })
      }
  }

  // --------------------------------------------------------------
  // MP4 / ISO-BMFF metadata tier (r14) — the video face of the
  // ns183 header-exact/pixel-never split. An ISO base-media file is
  // a tree of length-prefixed boxes (u32 big-endian size + 4CC
  // type; size 1 = 64-bit largesize follows; size 0 = to EOF — the
  // public ISO/IEC 14496-12 layout), and every metadata field a
  // corpus pass needs (brand, movie timescale/duration, track
  // dimensions) is EXACT INTEGER HEADER ARITHMETIC — no codec, no
  // lossy boundary. Truncated or desynchronized boxes quarantine
  // the whole container (the ns120 WARC walk discipline applied to
  // ISO boxes): a size that runs past the buffer or below the
  // 8-byte header minimum means the walk has lost framing and
  // nothing after it can be trusted.
  // --------------------------------------------------------------

  /** Closed-form minimal MP4: ftyp(brand) + moov(mvhd(timescale,
    * duration) + trak(tkhd(width, height))). Version-0 full boxes,
    * dims as 16.16 fixed point — enough structure for the metadata
    * walk to be real; media data is absent by design (a metadata
    * pass never reads mdat). */
  def writeMp4(brand: String, timescale: Int, duration: Long,
      width: Int, height: Int): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4CC")
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ u32(0L) ++
        "isom".getBytes("US-ASCII"))
    // mvhd v0: version+flags, creation, modification, timescale,
    // duration, rate(16.16), volume(8.8)+reserved, reserved(8),
    // matrix(36), predefined(24), next_track_id
    val mvhd = box("mvhd",
      u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(timescale.toLong) ++
        u32(duration) ++ u32(0x00010000L) ++ u32(0x01000000L) ++
        Array.fill[Byte](8)(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
          0x40000000L).flatMap(u32).toArray) ++
        Array.fill[Byte](24)(0) ++ u32(2L))
    // tkhd v0: version+flags(track enabled), creation, modification,
    // track_id, reserved, duration, reserved(8), layer+altgroup,
    // volume+reserved, matrix(36), width(16.16), height(16.16)
    val tkhd = box("tkhd",
      u32(1L) ++ u32(0L) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++
        u32(duration) ++ Array.fill[Byte](8)(0) ++ u32(0L) ++ u32(0L) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
          0x40000000L).flatMap(u32).toArray) ++
        u32(width.toLong << 16) ++ u32(height.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    out.write(ftyp); out.write(moov)
    out.toByteArray
  }

  /** One parsed container: framing status plus the header fields.
    * Quarantined rows (status != "ok") carry nulls. */
  final case class Mp4Meta(file_name: String, status: String,
      brand: Option[String], timescale: Option[Long],
      duration: Option[Long], duration_ms: Option[Long],
      width: Option[Long], height: Option[Long])

  /** Walk one ISO-BMFF buffer. Returns Left(reason) when framing
    * breaks (truncated/desynced/undersized box, missing moov or
    * required child), Right((brand, timescale, duration,
    * duration_ms, width, height)) otherwise. */
  def parseMp4(bytes: Array[Byte]): Either[String,
      (String, Long, Long, Long, Long, Long)] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    // walk [from, until): invoke f(type, bodyFrom, bodyUntil) per box
    def walk(from: Int, until: Int)
        (f: (String, Int, Int) => Unit): Option[String] = {
      var off = from
      while (off < until) {
        if (until - off < 8) return Some("truncated_header")
        var size = u32(off)
        var hdr = 8
        if (size == 1L) {
          if (until - off < 16) return Some("truncated_largesize")
          size = u64(off + 8); hdr = 16
        } else if (size == 0L) size = (until - off).toLong
        if (size < hdr || off + size > until)
          return Some("desynced_box")
        f(fourcc(off + 4), off + hdr, off + size.toInt)
        off += size.toInt
      }
      None
    }
    var brand: Option[String] = None
    var timescale: Option[Long] = None
    var duration: Option[Long] = None
    var dims: Option[(Long, Long)] = None
    var err: Option[String] = None
    def fullBoxAt(from: Int, until: Int): (Int, Int) =
      ((bytes(from) & 0xff, from + 4)) // (version, body offset)
    val topErr = walk(0, bytes.length) { (typ, b, e) =>
      if (err.isEmpty) typ match {
        case "ftyp" =>
          if (e - b < 8) err = Some("truncated_ftyp")
          else brand = Some(fourcc(b))
        case "moov" =>
          val inner = walk(b, e) { (t2, b2, e2) =>
            if (err.isEmpty) t2 match {
              case "mvhd" =>
                // guard the full-box header read itself: a size-8
                // mvhd (empty body, size == hdr is legal framing) at
                // end-of-buffer would otherwise read bytes(b2) out of
                // bounds — quarantine, never crash (r14 review)
                if (e2 - b2 < 4) err = Some("truncated_mvhd")
                else {
                  val (v, p) = fullBoxAt(b2, e2)
                  // v0: creation/modification u32 ×2 then timescale
                  // u32, duration u32; v1: u64 ×2 then u32, u64
                  if (v == 0 && e2 - p >= 16) {
                    timescale = Some(u32(p + 8))
                    duration = Some(u32(p + 12))
                  } else if (v == 1 && e2 - p >= 28) {
                    timescale = Some(u32(p + 16))
                    duration = Some(u64(p + 20))
                  } else err = Some("truncated_mvhd")
                }
              case "trak" =>
                val inner2 = walk(b2, e2) { (t3, b3, e3) =>
                  if (err.isEmpty && t3 == "tkhd" && dims.isEmpty) {
                    // width/height are the LAST 8 bytes, 16.16 fixed
                    if (e3 - b3 < 8) err = Some("truncated_tkhd")
                    else dims = Some((u32(e3 - 8) >> 16, u32(e3 - 4) >> 16))
                  }
                }
                if (err.isEmpty) err = inner2
              case _ => ()
            }
          }
          if (err.isEmpty) err = inner
        case _ => () // free/mdat/unknown top-level boxes skip cleanly
      }
    }
    val fail = err.orElse(topErr)
      .orElse(if (brand.isEmpty) Some("missing_ftyp") else None)
      .orElse(if (timescale.isEmpty) Some("missing_mvhd") else None)
      .orElse(if (dims.isEmpty) Some("missing_tkhd") else None)
      .orElse(if (timescale.contains(0L)) Some("zero_timescale") else None)
    fail match {
      case Some(r) => Left(r)
      case None =>
        val ts = timescale.get; val du = duration.get
        Right((brand.get, ts, du, du * 1000L / ts,
          dims.get._1, dims.get._2))
    }
  }

  /** Corpus MP4 metadata pass — the [[imageMetadata]] shape for
    * video containers: batched mapPartitions walk, quarantine on
    * broken framing, exact integer duration_ms = duration · 1000 /
    * timescale (floor). Map-side, no shuffle; at 100 TB the pass is
    * header-bound (a metadata walk reads box headers, never mdat). */
  def mp4Metadata(df: DataFrame,
      batchSize: Int = 64): Dataset[Mp4Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (name, bytes) =>
          parseMp4(if (bytes == null) Array.emptyByteArray else bytes) match {
            case Left(reason) =>
              Mp4Meta(name, reason, None, None, None, None, None, None)
            case Right((brand, ts, du, ms, w, h)) =>
              Mp4Meta(name, "ok", Some(brand), Some(ts), Some(du),
                Some(ms), Some(w), Some(h))
          }
        })
      }
  }

  // --------------------------------------------------------------
  // Video tier 2 (r15): frames FROM containers. The metadata tier
  // above never reads mdat; this tier adds a real ISO-BMFF sample
  // table (stbl{stsz,stco}) so sampled frames can be EXTRACTED as
  // byte-exact mdat slices and fed to the image analysis stack
  // (dHash → shot boundaries). The lossy-pixel boundary stays where
  // r13 drew it: payloads are lossless BMP frames (closed-form
  // pixels), because a real video codec is out of container scope —
  // what is REAL here is the container walk, the sample addressing,
  // the scheduled-read discipline, and the Spark plumbing.
  // --------------------------------------------------------------

  /** [[writeMp4]] plus a real sample table and media data: the moov
    * gains trak/mdia/minf/stbl{stsz (per-sample sizes), stco (one
    * chunk)} and an mdat carries `frames` head-to-tail. The stco
    * offset is the absolute file offset of the first sample, so an
    * extractor addresses sample i at chunkOffset + Σ sizes[<i] —
    * the single-chunk layout every sample walk must handle first. */
  def writeMp4Frames(brand: String, timescale: Int, duration: Long,
      width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4CC")
    require(frames.nonEmpty, "frames-in-mdat fixture needs frames")
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ u32(0L) ++
        "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(timescale.toLong) ++
        u32(duration) ++ u32(0x00010000L) ++ u32(0x01000000L) ++
        Array.fill[Byte](8)(0) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
          0x40000000L).flatMap(u32).toArray) ++
        Array.fill[Byte](24)(0) ++ u32(2L))
    val tkhd = box("tkhd",
      u32(1L) ++ u32(0L) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++
        u32(duration) ++ Array.fill[Byte](8)(0) ++ u32(0L) ++ u32(0L) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
          0x40000000L).flatMap(u32).toArray) ++
        u32(width.toLong << 16) ++ u32(height.toLong << 16))
    val stsz = box("stsz",
      u32(0L) ++ u32(0L) ++ u32(frames.length.toLong) ++
        frames.flatMap(f => u32(f.length.toLong)).toArray)
    def moovWith(chunkOffset: Long): Array[Byte] = {
      val stco = box("stco", u32(0L) ++ u32(1L) ++ u32(chunkOffset))
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia",
        box("minf", box("stbl", stsz ++ stco)))))
    }
    // the chunk offset depends on moov's length, which does not
    // depend on the offset VALUE (u32 is fixed-width): size with a
    // placeholder, then emit with the real offset
    val moovLen = moovWith(0L).length
    val chunkOffset = ftyp.length.toLong + moovLen + 8L
    val mdat = box("mdat", frames.toArray.flatten)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moovWith(chunkOffset)); out.write(mdat)
    out.toByteArray
  }

  /** Parsed sample addressing of one container: header fields plus
    * per-sample absolute (offset, size) ranges, every range
    * validated inside the buffer — so a truncated mdat (or a
    * desynced stbl) quarantines HERE, before any slice is read. */
  final case class Mp4Samples(brand: String, timescale: Long,
      duration: Long, width: Long, height: Long,
      sampleOffsets: Array[Long], sampleSizes: Array[Long])

  /** Walk the box tree down to stbl{stsz, stco} and resolve every
    * sample's byte range. Left(reason) reuses [[parseMp4]]'s framing
    * vocabulary plus the sample-table classes (missing_stbl,
    * bad_stsz/bad_stco, sample_out_of_range). */
  def parseMp4Samples(bytes: Array[Byte]): Either[String, Mp4Samples] =
    parseMp4(bytes).flatMap { case (brand, ts, du, _, w, h) =>
      def u32(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
      def fourcc(off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      def walk(from: Int, until: Int)
          (f: (String, Int, Int) => Unit): Option[String] = {
        var off = from
        while (off < until) {
          if (until - off < 8) return Some("truncated_header")
          var size = u32(off)
          var hdr = 8
          if (size == 1L) {
            if (until - off < 16) return Some("truncated_largesize")
            size = u64(off + 8); hdr = 16
          } else if (size == 0L) size = (until - off).toLong
          if (size < hdr || off + size > until)
            return Some("desynced_box")
          f(fourcc(off + 4), off + hdr, off + size.toInt)
          off += size.toInt
        }
        None
      }
      var sizes: Option[Array[Long]] = None
      var chunkOffset: Option[Long] = None
      var err: Option[String] = None
      def descend(typ: String, b: Int, e: Int): Unit =
        if (err.isEmpty) typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            val inner = walk(b, e)(descend)
            if (err.isEmpty) err = inner
          case "stsz" =>
            // v0 full box: version+flags, sample_size (0 = table),
            // sample_count, then count × u32
            if (e - b < 12) err = Some("bad_stsz")
            else {
              val fixed = u32(b + 4)
              val n = u32(b + 8)
              // Plausibility bound BEFORE allocating (r15 ADVICE): the
              // header's sample_count is untrusted, and the fixed-size
              // branch otherwise allocates Array.fill(n) straight from
              // it — an adversarial count OOM-kills the task instead
              // of quarantining. Every sample's bytes must lie inside
              // this buffer, so any count > bytes.length is corrupt.
              if (n > Int.MaxValue || n < 0 || n > bytes.length)
                err = Some("bad_stsz")
              else if (fixed != 0L)
                sizes = Some(Array.fill(n.toInt)(fixed))
              else if (e - b < 12 + 4 * n) err = Some("bad_stsz")
              else sizes = Some(Array.tabulate(n.toInt)(i =>
                u32(b + 12 + 4 * i)))
            }
          case "stco" =>
            // v0 full box: version+flags, entry_count, offsets —
            // single-chunk layout (entry_count == 1) by contract
            if (e - b < 12 || u32(b + 4) != 1L) err = Some("bad_stco")
            else chunkOffset = Some(u32(b + 8))
          case _ => ()
        }
      val topErr = walk(0, bytes.length)(descend)
      err.orElse(topErr)
        .orElse(if (sizes.isEmpty || chunkOffset.isEmpty)
          Some("missing_stbl") else None) match {
        case Some(r) => Left(r)
        case None =>
          val sz = sizes.get
          val offs = sz.scanLeft(chunkOffset.get)(_ + _).init
          val bad = offs.indices.exists(i =>
            offs(i) < 0 || sz(i) < 0 ||
              offs(i) + sz(i) > bytes.length)
          if (bad) Left("sample_out_of_range")
          else Right(Mp4Samples(brand, ts, du, w, h, offs, sz))
      }
    }

  /** One extracted frame: byte-exact mdat slice. */
  final case class Mp4Frame(file_name: String, frame_idx: Long,
      n_samples: Long, content: Array[Byte])

  /** Extract `nSamples` evenly-spaced frames per container —
    * schedule index j ↦ sample floor(j·count/nSamples), the ns85/
    * frameSample spacing over REAL sample addressing. ONLY the
    * scheduled samples' byte ranges are materialized (the plan law:
    * bytes outside scheduled ranges are never touched, proven in
    * spec by corrupting an unscheduled sample); containers whose
    * framing or sample table fails to validate are dropped — the
    * dhashImages quarantine convention, counted upstream by the
    * metadata pass when a pipeline needs the ledger. At 100 TB this
    * is the ranged-read discipline: header walk + k scheduled
    * slices per container, never the mdat body. */
  def extractMp4Frames(df: DataFrame, nSamples: Int,
      batchSize: Int = 16): Dataset[Mp4Frame] = {
    require(nSamples > 0, "nSamples must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (name, bytes) =>
          parseMp4Samples(
            if (bytes == null) Array.emptyByteArray else bytes) match {
            case Left(_) => Seq.empty[Mp4Frame]
            case Right(s) =>
              val count = s.sampleSizes.length
              // a container with count <= nSamples yields ALL its
              // samples (the floor-spacing indices collide on short
              // containers and silently dropped tail frames — r15
              // review); evenly-spaced only when sampling down
              val sched =
                if (count <= nSamples) 0 until count
                else (0 until nSamples)
                  .map(j => (j.toLong * count / nSamples).toInt)
                  .distinct
              sched.map { i =>
                Mp4Frame(name, i.toLong, count.toLong,
                  java.util.Arrays.copyOfRange(bytes,
                    s.sampleOffsets(i).toInt,
                    (s.sampleOffsets(i) + s.sampleSizes(i)).toInt))
              }
          }
        })
      }
  }
}
