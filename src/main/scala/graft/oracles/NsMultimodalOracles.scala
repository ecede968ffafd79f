package graft.oracles

/** DuckDB oracle SQL for image/audio decode and feature queries — split from
  * SparkEntry.oracleSql so the registry stays reviewable; the
  * driver contract surface is still [[graft.SparkEntry.oracleSql]],
  * which concatenates these per-domain maps (keys asserted
  * disjoint). Pure data: every value is a DuckDB SQL literal
  * aligned column-for-column with its Spark query. */
private[graft] object NsMultimodalOracles {
  // WARC image acquisition: the i%11==5 truncated-BMP class is
  // framing-intact but decoder-quarantined, so it is absent; every
  // surviving image's dHash re-derived from the pixel formula.
  // Shared verbatim by ns196 (batch) and s22 (the streaming face
  // over the same fixture — the drained store must equal the batch
  // answer, so the oracle is identical by construction).
  private val warcImagesSql: String =
    """WITH ids AS (
      |  SELECT i AS img_id, CAST(i * 31 + 7 AS BIGINT) AS seed
      |  FROM range(0, 120) t(i) WHERE i % 11 <> 5),
      |cells AS (
      |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
      |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
      |        + (seed + y*72 + x) % 239) AS s
      |  FROM ids, range(0, 64) ty(y), range(0, 72) tx(x)
      |  GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
      |  FROM cells l JOIN cells r
      |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8 AND l.s > r.s),
      |hv AS (
      |  SELECT ids.img_id,
      |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
      |  FROM ids LEFT JOIN bits USING (img_id) GROUP BY 1)
      |SELECT img_id, CAST(72 AS INTEGER) AS width,
      |  CAST(64 AS INTEGER) AS height,
      |  CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
      |    THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT)
      |    AS dhash
      |FROM hv""".stripMargin

  val sql: Map[String, String] = Map(
    "s22_stream_warc_images" -> warcImagesSql,
    // Metadata tier: every field is closed-form from the fixture
    // index — dims live in stream headers (exact through ANY
    // conformant decoder, JPEG included), corrupt class i%4==3
    // carries a valid JPEG SOI magic with a garbage body so it
    // detects as jpeg but must quarantine with null dims.
    "ns183_image_metadata" ->
      """SELECT i AS img_id,
        |  CASE i % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |    WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
        |  i % 4 <> 3 AS decode_ok,
        |  CASE WHEN i % 4 = 3 THEN NULL
        |    ELSE CAST(16 + i % 8 AS BIGINT) END AS width,
        |  CASE WHEN i % 4 = 3 THEN NULL
        |    ELSE CAST(12 + i % 5 AS BIGINT) END AS height
        |FROM range(64) t(i)""".stripMargin,
    // MP4 metadata tier: every field closed-form from the fixture
    // index; the i%5==4 class is cut 20 bytes short so moov's
    // declared size overruns the buffer — the walk must quarantine
    // with the desync reason and all-null fields. duration_ms is the
    // exact integer floor division.
    "ns191_video_metadata" ->
      """SELECT i AS video_id,
        |  CASE WHEN i % 5 = 4 THEN 'desynced_box' ELSE 'ok' END
        |    AS status,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    WHEN i % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    ELSE CAST(600 + (i % 7) * 100 AS BIGINT) END AS timescale,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    ELSE CAST((i + 1) * 1234 AS BIGINT) END AS duration,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    ELSE CAST(((i + 1) * 1234 * 1000)
        |      // (600 + (i % 7) * 100) AS BIGINT) END AS duration_ms,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    ELSE CAST(320 + (i % 16) * 8 AS BIGINT) END AS width,
        |  CASE WHEN i % 5 = 4 THEN NULL
        |    ELSE CAST(240 + (i % 9) * 16 AS BIGINT) END AS height
        |FROM range(60) t(i)""".stripMargin,
    // Audio activity segments: active windows from the planting
    // formula (w % 3 <> id % 3 — the sawtooth's window peak is
    // always 16384 >= threshold, a silenced window's is 0), the
    // all-silent and corrupt-magic classes absent, islands replayed
    // with the same window_idx - row_number arithmetic.
    "ns197_audio_segments" ->
      """WITH ids AS (
        |  SELECT i AS doc_id FROM range(0, 48) t(i)
        |  WHERE i % 13 <> 3 AND i % 7 <> 2),
        |w AS (
        |  SELECT doc_id, wi FROM ids, range(0, 15) tw(wi)
        |  WHERE wi % 3 <> doc_id % 3),
        |isl AS (
        |  SELECT doc_id, wi,
        |    wi - row_number() OVER (PARTITION BY doc_id ORDER BY wi)
        |      AS g
        |  FROM w),
        |seg AS (
        |  SELECT doc_id, g, min(wi) AS sw, max(wi) AS ew,
        |    CAST(count(*) AS BIGINT) AS n_windows
        |  FROM isl GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sw)
        |    - 1 AS BIGINT) AS seg_idx,
        |  CAST(sw * 20 AS BIGINT) AS start_ms,
        |  CAST((ew + 1) * 20 AS BIGINT) AS end_ms, n_windows
        |FROM seg""".stripMargin,
    "ns196_warc_images" -> warcImagesSql,
    // Shot boundaries: every frame's dHash re-derived from the pixel
    // formula (the ns63 grid CTEs at (video, frame) grain — seed
    // advances every 4 frames), then the SAME lag/hamming-threshold/
    // running-sum arithmetic the engine runs.
    // ns198 (r15): same corpus and same re-derivation as ns195 — the
    // Spark side extracts the frames from frames-in-mdat containers,
    // and byte-exact extraction means the oracle is UNCHANGED: any
    // container-walk defect moves every downstream hash.
    "ns198_container_frame_shots" ->
      """WITH f AS (
        |  SELECT v, fr,
        |    CAST(v * 1000000 + (fr // 4) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 12) tv(v), range(0, 16) tf(fr)),
        |cells AS (
        |  SELECT v, fr, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM f, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT l.v, l.fr, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.v = r.v AND l.fr = r.fr AND r.cy = l.cy
        |    AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT f.v, f.fr,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM f LEFT JOIN bits ON bits.v = f.v AND bits.fr = f.fr
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT v, fr,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT)
        |      AS dh
        |  FROM hv),
        |lagd AS (
        |  SELECT v, fr, dh,
        |    lag(dh) OVER (PARTITION BY v ORDER BY fr) AS pdh
        |  FROM h),
        |b AS (
        |  SELECT v, fr,
        |    (pdh IS NULL OR bit_count(xor(dh, pdh)) > 7)
        |      AS is_boundary
        |  FROM lagd)
        |SELECT CAST(v AS BIGINT) AS video_id,
        |  CAST(fr AS BIGINT) AS frame_idx,
        |  CAST(SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY v ORDER BY fr) - 1 AS BIGINT)
        |    AS shot_id,
        |  is_boundary
        |FROM b""".stripMargin,
    "ns195_shot_boundaries" ->
      """WITH f AS (
        |  SELECT v, fr,
        |    CAST(v * 1000000 + (fr // 4) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 12) tv(v), range(0, 16) tf(fr)),
        |cells AS (
        |  SELECT v, fr, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM f, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT l.v, l.fr, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.v = r.v AND l.fr = r.fr AND r.cy = l.cy
        |    AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT f.v, f.fr,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM f LEFT JOIN bits ON bits.v = f.v AND bits.fr = f.fr
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT v, fr,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT)
        |      AS dh
        |  FROM hv),
        |lagd AS (
        |  SELECT v, fr, dh,
        |    lag(dh) OVER (PARTITION BY v ORDER BY fr) AS pdh
        |  FROM h),
        |b AS (
        |  SELECT v, fr,
        |    (pdh IS NULL OR bit_count(xor(dh, pdh)) > 7)
        |      AS is_boundary
        |  FROM lagd)
        |SELECT CAST(v AS BIGINT) AS video_id,
        |  CAST(fr AS BIGINT) AS frame_idx,
        |  CAST(SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY v ORDER BY fr) - 1 AS BIGINT)
        |    AS shot_id,
        |  is_boundary
        |FROM b""".stripMargin,
    // WAV oracle: every decoded field predicted from the generation
    // formulas. The sawtooth (i*8192 mod 32768) - 16384 cycles through
    // {-16384,-8192,0,8192}, so peak is 16384 and energy per full
    // cycle is 16384^2 + 8192^2 + 0 + 8192^2 = 402653184, plus the
    // partial-cycle prefix.
    "ns56_wav_decode" ->
      """SELECT 'doc_' || doc_id || '.wav' AS file_name,
        |  CAST(44 + 2 * n AS BIGINT) AS byte_len,
        |  CAST(r AS INTEGER) AS sample_rate,
        |  1 AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST((n * 1000) // r AS BIGINT) AS duration_ms,
        |  CASE WHEN n > 0 THEN 16384 ELSE 0 END AS peak_abs,
        |  CAST((n // 4) * 402653184
        |    + CASE n % 4 WHEN 0 THEN 0 WHEN 1 THEN 268435456
        |      ELSE 335544320 END AS BIGINT) AS energy
        |FROM (SELECT doc_id, length(text) % 8000 + 8000 AS r,
        |        (length(text) * 13) % 2000 + 100 AS n
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
    "ns14_multimodal_features" ->
      """SELECT 'doc_' || doc_id || '.txt' AS file_name,
        | CAST(length(text) AS BIGINT) AS byte_len,
        | sha256(text) AS sha256,
        | CAST(length(text) % 640 + 1 AS INT) AS width,
        | CAST((length(text) * 7) % 480 + 1 AS INT) AS height
        |FROM documents WHERE doc_id < 50""".stripMargin,
    // Recomputes the BMP construction arithmetic: the engine parsed
    // these numbers out of real payload headers; the oracle re-derives
    // them from the text length the payloads were built from.
    "ns29_bmp_decode" ->
      """SELECT 'doc_' || doc_id || '.bmp' AS file_name,
        | CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS byte_len,
        | CAST(w AS INT) AS width,
        | CAST(h AS INT) AS height
        |FROM (SELECT doc_id, length(text) % 31 + 1 AS w,
        |        (length(text) * 7) % 17 + 1 AS h
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
    // dHash oracle: every hash bit re-derived from the BMP generation
    // formula (pixel v = seed + y*72 + x, gray = v%251+v%241+v%239),
    // cell sums over exact 8×8 blocks, bit = left sum > right sum.
    // The 64-bit pack runs in HUGEINT and converts to signed BIGINT
    // (bit 63 is the sign bit on the Spark side).
    // 5-point-stencil Laplacian moments over the ns63 pixel-formula
    // grid for the noisy (even) images; linear-gradient (odd) images
    // have Laplacian identically zero, in closed form. The sharp
    // flag is the same integer cross-multiply as the engine's.
    "ns109_image_blur" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST(i * 77 AS BIGINT) AS seed
        |  FROM range(0, 50) t(i) WHERE i % 2 = 0),
        |grid AS (
        |  SELECT img_id, x, y,
        |    (seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |      + (seed + y*72 + x) % 239 AS g
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)),
        |lap AS (
        |  SELECT c.img_id, 4*c.g - lx.g - rx.g - uy.g - dy.g AS l
        |  FROM grid c
        |  JOIN grid lx ON lx.img_id = c.img_id AND lx.y = c.y
        |    AND lx.x = c.x - 1
        |  JOIN grid rx ON rx.img_id = c.img_id AND rx.y = c.y
        |    AND rx.x = c.x + 1
        |  JOIN grid uy ON uy.img_id = c.img_id AND uy.x = c.x
        |    AND uy.y = c.y - 1
        |  JOIN grid dy ON dy.img_id = c.img_id AND dy.x = c.x
        |    AND dy.y = c.y + 1
        |  WHERE c.x BETWEEN 1 AND 70 AND c.y BETWEEN 1 AND 62),
        |na AS (
        |  SELECT img_id, COUNT(*) AS n, SUM(l) AS s, SUM(l*l) AS s2
        |  FROM lap GROUP BY 1)
        |SELECT 'img_' || img_id || '.bmp' AS file_name,
        |  CAST(72 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
        |  CAST(n AS BIGINT) AS n_lap, CAST(s AS BIGINT) AS sum_lap,
        |  CAST(s2 AS BIGINT) AS sum_lap2,
        |  n*s2 - s*s >= 100*n*n AS sharp
        |FROM na
        |UNION ALL
        |SELECT 'img_' || i || '.bmp', CAST(72 AS INTEGER),
        |  CAST(64 AS INTEGER), CAST(70*62 AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), false
        |FROM range(0, 50) t(i) WHERE i % 2 = 1""".stripMargin,
    // Residue-class arithmetic over the sawtooth: counts of j%4
    // classes in [0, N) and [p, N) predict clipping/silence exactly,
    // no per-sample rows anywhere.
    "ns110_audio_quality" ->
      """WITH f AS (
        |  SELECT CAST(i AS BIGINT) AS i,
        |    CAST(400 + i*7 AS BIGINT) AS n,
        |    CAST(200 + i*5 AS BIGINT) AS p, i % 3 AS kind
        |  FROM range(0, 48) t(i)),
        |q AS (
        |  SELECT i, n,
        |    CASE kind WHEN 1 THEN n - (n+1)//4
        |      ELSE 0 END AS n_clipped,
        |    CASE kind
        |      WHEN 2 THEN p + (n+1)//4 - (p+1)//4
        |      ELSE (n+1)//4 END AS n_silent,
        |    CASE kind WHEN 2 THEN
        |      p + CASE WHEN p % 4 = 2 THEN 1 ELSE 0 END
        |      ELSE 0 END AS leading_silence
        |  FROM f)
        |SELECT 'wav_' || i || '.wav' AS file_name,
        |  n AS n_samples, CAST(n_clipped AS BIGINT) AS n_clipped,
        |  CAST(n_silent AS BIGINT) AS n_silent,
        |  CAST(leading_silence AS BIGINT) AS leading_silence,
        |  n_clipped > 0 AS clipped,
        |  2*n_silent > n AS mostly_silent
        |FROM q""".stripMargin,
    "ns63_image_dhash" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 60) t(i)),
        |cells AS (
        |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits USING (img_id) GROUP BY img_id)
        |SELECT 'img_' || img_id || '.bmp' AS file_name,
        |  CAST(72 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
        |  CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |    THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dhash
        |FROM hv""".stripMargin,
    // ns63's cell arithmetic verbatim — both containers carry the
    // identical pixel formula in their own natural row order, so
    // only the file extension differs; a misdetected format (PNG
    // bytes through the BMP path or vice versa) produces no row or a
    // wrong hash and breaks the gate.
    "ns158_png_dhash" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed,
        |         CASE WHEN i % 2 = 0 THEN '.bmp' ELSE '.png' END AS ext
        |  FROM range(0, 60) t(i)),
        |cells AS (
        |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits USING (img_id) GROUP BY img_id)
        |SELECT 'img_' || hv.img_id || imgs.ext AS file_name,
        |  CAST(72 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
        |  CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |    THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dhash
        |FROM hv JOIN imgs USING (img_id)""".stripMargin,
    // Near-dup oracle: brute-force all-pairs Hamming over the same
    // closed-form hashes — the banded join is complete at
    // maxHamming 7 < bands 8, so it must match this exactly.
    // Brute-force new x store all-pairs over the closed-form hashes
    // of BOTH image sets — the banded cross join is complete at
    // maxHamming 7 < bands 8, so it must match this exactly.
    "ns119_image_near_dup_incremental" ->
      """WITH imgs AS (
        |  SELECT 's' AS st, CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 40) t(i)
        |  UNION ALL
        |  SELECT 'n', CAST(i AS BIGINT),
        |         CAST(CASE WHEN i % 2 = 0 THEN (i // 2) * 1000
        |              ELSE 999000 + i * 37 END AS BIGINT)
        |  FROM range(0, 20) t(i)),
        |cells AS (
        |  SELECT st, img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3, 4),
        |bits AS (
        |  SELECT l.st, l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.st = r.st AND l.img_id = r.img_id AND r.cy = l.cy
        |    AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT imgs.st, imgs.img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits
        |    ON bits.st = imgs.st AND bits.img_id = imgs.img_id
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT st, img_id,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dh
        |  FROM hv)
        |SELECT n.img_id AS new_id, s.img_id AS store_id,
        |  CAST(bit_count(xor(n.dh, s.dh)) AS BIGINT) AS hamming
        |FROM h n JOIN h s ON n.st = 'n' AND s.st = 's'
        |WHERE bit_count(xor(n.dh, s.dh)) <= 7""".stripMargin,
    "ns64_image_near_dup" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 60) t(i)),
        |cells AS (
        |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits USING (img_id) GROUP BY img_id),
        |h AS (
        |  SELECT img_id,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dh
        |  FROM hv)
        |SELECT a.img_id AS id_a, b.img_id AS id_b,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.img_id < b.img_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 7""".stripMargin,
    // Every resized pixel re-derived from the generation formula
    // (gray(v) = v%251 + v%241 + v%239, v = seed + y·w + x, seed =
    // doc_id), floor-mean over each 2×2 block, summed.
    "ns84_image_resize" ->
      """WITH imgs AS (
        |  SELECT doc_id, length(text) % 31 + 1 AS w,
        |    (length(text) * 7) % 17 + 1 AS h
        |  FROM documents WHERE doc_id < 50),
        |cells AS (
        |  SELECT doc_id,
        |    doc_id + (2*y) * w + 2*x AS a,
        |    doc_id + (2*y) * w + 2*x + 1 AS b,
        |    doc_id + (2*y + 1) * w + 2*x AS c,
        |    doc_id + (2*y + 1) * w + 2*x + 1 AS d
        |  FROM imgs, range(0, 16) tx(x), range(0, 9) ty(y)
        |  WHERE x < w // 2 AND y < h // 2),
        |sums AS (
        |  SELECT doc_id,
        |    SUM((a % 251 + a % 241 + a % 239
        |       + b % 251 + b % 241 + b % 239
        |       + c % 251 + c % 241 + c % 239
        |       + d % 251 + d % 241 + d % 239) // 4) AS chk
        |  FROM cells GROUP BY doc_id)
        |SELECT 'doc_' || i.doc_id || '.bmp' AS file_name,
        |  CAST(i.w AS INT) AS in_w, CAST(i.h AS INT) AS in_h,
        |  CAST(i.w // 2 AS INT) AS out_w,
        |  CAST(i.h // 2 AS INT) AS out_h,
        |  CAST(coalesce(s.chk, 0) AS BIGINT) AS gray_checksum
        |FROM imgs i LEFT JOIN sums s USING (doc_id)""".stripMargin,
    // Frames reconstructed as ASCII strings from the byte formula,
    // sha256'd — identical bytes ⇒ identical hex. All frames are
    // exactly step = sz // 4 bytes (the floor-step slicing drops the
    // sz % 4 tail by construction).
    "ns85_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, length(text) % 977 + 64 AS sz
        |  FROM documents WHERE doc_id < 50),
        |params AS (
        |  SELECT doc_id, sz, greatest(sz // 4, 1) AS step FROM f),
        |frames AS (
        |  SELECT doc_id, step, fi FROM params, range(0, 4) t(fi)),
        |bytes AS (
        |  SELECT doc_id, fi,
        |    string_agg(chr(CAST(33 + (doc_id + i) % 94 AS INTEGER)),
        |      '' ORDER BY i) AS s
        |  FROM frames, range(0, 1100) t2(i)
        |  WHERE i >= fi * step AND i < fi * step + step
        |  GROUP BY doc_id, fi)
        |SELECT 'doc_' || doc_id || '.bin' AS file_name,
        |  CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(length(s) AS BIGINT) AS frame_len,
        |  sha256(s) AS frame_sha256
        |FROM bytes""".stripMargin,
    // Closed-form DSP oracle: period-4 sawtooth → fundamental at
    // rate/4 = grid bin 16 of 64, |X(N/4)| = √2·|X(N/2)|, so the
    // argmax is an exact integer prediction (see the ns74
    // registration note).
    // ns124: every signature word re-derived from the fixture's md5
    // band-activity formula (twin flip at bit 0 for id % 10 = 1),
    // then brute-force Hamming over all id pairs — the banded Spark
    // plan must reproduce exactly the pairs the exhaustive join
    // finds (pigeonhole completeness at maxHamming 8 / 8 bands).
    "ns124_audio_near_dup" ->
      """WITH ids AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 10 <= 1 THEN doc_id - doc_id % 10
        |      ELSE doc_id END AS k
        |  FROM documents WHERE doc_id < 200),
        |bits AS (
        |  SELECT i.id, t.f, u.j,
        |    (substr(md5(CAST(i.k AS VARCHAR) || ':' ||
        |       CAST(t.f AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)),
        |       1, 1) IN ('0','1','2','3','4','5'))
        |      <> (i.id % 10 = 1 AND t.f = 0 AND u.j = 1) AS active
        |  FROM ids i,
        |    (SELECT unnest(range(0, 8)) AS f) t,
        |    (SELECT unnest(range(1, 8)) AS j) u),
        |sig AS (
        |  SELECT id,
        |    CAST(coalesce(SUM(CASE WHEN active
        |      THEN CAST(1 AS BIGINT) << (f * 8 + j - 1)
        |      ELSE 0 END), 0) AS BIGINT) AS s
        |  FROM bits GROUP BY id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.id < b.id
        |WHERE bit_count(xor(a.s, b.s)) <= 8""".stripMargin,
    "ns74_wav_dominant_freq" ->
      """SELECT 'doc_' || doc_id || '.wav' AS file_name,
        |  CAST(r AS INTEGER) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  16 AS dom_idx,
        |  CAST(r AS DOUBLE) / 4 AS dominant_hz
        |FROM (SELECT doc_id, length(text) % 8000 + 8000 AS r,
        |        ((length(text) * 7) % 30 + 2) * 64 AS n
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
  )
}
