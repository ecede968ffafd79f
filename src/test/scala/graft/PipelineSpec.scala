package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dq.Checks
import graft.ops.Manifest
import graft.pipeline.Run
import graft.pipeline.Run.PipelineConfig

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val runHr = 202608121000L

  /** One weather doc; python-repr (single quotes) for odd cities,
    * strict JSON for even — the reference leaks unrepaired python-repr
    * on the weather path, our ingest normalizes both (FIXTURES.md A1). */
  private def weatherDoc(city: String, tempC: Double, isDay: Int,
      pyRepr: Boolean): String = {
    val q = if (pyRepr) "'" else "\""
    def s(v: String) = q + v + q
    val doc = s"{${s("location")}: {${s("name")}: ${s(city)}, " +
      s"${s("region")}: ${s("R")}, ${s("country")}: ${s("US")}, " +
      s"${s("lat")}: 40.5, ${s("lon")}: -73.9, " +
      s"${s("tz_id")}: ${s("America/New_York")}, " +
      s"${s("localtime_epoch")}: 1754989200, " +
      s"${s("localtime")}: ${s("2026-08-12 10:30")}}, " +
      s"${s("current")}: {${s("last_updated_epoch")}: 1754989100, " +
      s"${s("last_updated")}: ${s("2026-08-12 10:25")}, " +
      s"${s("temp_c")}: $tempC, ${s("temp_f")}: ${tempC * 1.8 + 32}, " +
      s"${s("is_day")}: $isDay, " +
      s"${s("condition")}: {${s("text")}: ${s("Sunny")}, " +
      s"${s("icon")}: ${s("//cdn/sun.png")}, ${s("code")}: 1000}, " +
      s"${s("humidity")}: 60, ${s("cloud")}: 10, ${s("uv")}: 7.0}}"
    doc
  }

  private def cocktailsDoc(ids: Seq[Int]): String = {
    val drinks = ids.map { id =>
      s"{'idDrink': '$id', 'strDrink': 'Drink $id', " +
        "'strAlcoholic': 'Alcoho\rli\n\rc', " +   // dirty CR/LF, repaired
        "'strCategory': 'Cocktail', 'strGlass': 'Coupe', " +
        "'strInstructions': 'Shake well.', " +
        "'strIngredient1': 'Tequila', 'strMeasure1': '2 oz',}"
    }.mkString(", ")
    s"{'drinks': [$drinks],}"
  }

  private def freshDirs(): PipelineConfig = {
    val base = Files.createTempDirectory("graft_pipe").toFile
    base.deleteOnExit()
    PipelineConfig(
      bronzeDir = s"${base.getPath}/bronze",
      goldDir = s"${base.getPath}/gold",
      dqDir = s"${base.getPath}/dq")
  }

  /** Gold tables publish through the Manifest commit layer (r16):
    * read them through it. */
  private def gold(cfg: PipelineConfig, entity: String) =
    Manifest.read(spark, s"${cfg.goldDir}/$entity", "run_hr")

  private def landBronze(cfg: PipelineConfig, hr: Long,
      cocktailIds: Seq[Int] = Seq(11470, 11471, 11472)): Unit = {
    val cities = Run.topCities(spark).as[String].collect().toSeq
    Run.writeRawText(spark, s"${cfg.bronzeDir}/weather/run_hr=$hr",
      cities.zipWithIndex.map { case (c, i) =>
        (c.toLowerCase.replace(" ", "_") + ".json",
          weatherDoc(c, 20.0 + i, i % 2, pyRepr = i % 2 == 1))
      })
    Run.writeRawText(spark, s"${cfg.bronzeDir}/cocktails/run_hr=$hr",
      Seq(("cocktails.json", cocktailsDoc(cocktailIds))))
  }

  test("e2e run: bronze→silver→gold→DQ, both entities, dq_results green") {
    val cfg = freshDirs()
    landBronze(cfg, runHr)
    val report = Run.run(spark, cfg, runHr)
    assert(report.weatherRows == 5L)
    assert(report.cocktailsRows == 3L)
    assert(report.secondSinkWritten)

    val gold0 = gold(cfg, "weather")
      .filter(col("run_hr") === runHr)
    // nested structs with parsed timestamps + repaired python-repr docs
    val ny = gold0.filter(col("location.name") === "Los Angeles")
      .select(col("current.temp_c").cast("double"),
        col("location.localtime_ts").cast("string"))
      .as[(Double, String)].collect().head
    assert(ny._1 == 21.0)
    assert(ny._2 == "2026-08-12 10:30:00")

    val flat = gold(cfg, "weather_flat")
      .filter(col("run_hr") === runHr)
    assert(flat.count() == 5L)
    assert(flat.filter(col("is_day")).count() == 2L) // 0/1 → boolean

    val cock = gold(cfg, "cocktails")
      .filter(col("run_hr") === runHr)
    val drinks = cock.select(col("id_drink").cast("long"), col("drink"),
      col("alcoholic")).as[(Long, String, String)].collect().sortBy(_._1)
    assert(drinks.map(_._1).toSeq == Seq(11470L, 11471L, 11472L))
    assert(drinks.head._3 == "Alcoholic") // CR/LF stripped by O9 repair

    val dq = spark.read.parquet(cfg.dqDir)
    assert(dq.filter(!col("success")).isEmpty)
    assert(dq.select(col("table_name")).distinct().as[String]
      .collect().toSet == Set("weather_gold", "cocktails_gold"))
  }

  test("idempotency: rerunning a run_hr replaces, never duplicates") {
    val cfg = freshDirs()
    landBronze(cfg, runHr)
    Run.run(spark, cfg, runHr)
    val first = gold(cfg, "weather")
      .drop("created_at_ts").collect().toSet
    Run.run(spark, cfg, runHr) // replay, same bronze
    val second = gold(cfg, "weather")
      .drop("created_at_ts").collect().toSet
    assert(first == second)
    // a different hour lands alongside, untouched by later replays
    val otherHr = runHr + 100
    landBronze(cfg, otherHr)
    Run.run(spark, cfg, otherHr)
    Run.run(spark, cfg, runHr)
    val g = gold(cfg, "weather")
    assert(g.filter(col("run_hr") === otherHr).count() == 5L)
    assert(g.count() == 10L)
  }

  test("backfill semantics at the transaction layer (p01 v2): a " +
      "retry of the SAME attempt replays (revised bronze ignored — " +
      "the S2 guard), a NEW attempt atomically replaces the hour") {
    val cfg = freshDirs()
    landBronze(cfg, runHr)
    Run.run(spark, cfg, runHr)
    // bronze revised in place (say, a corrected upstream drop)
    Run.writeRawText(spark, s"${cfg.bronzeDir}/weather/run_hr=$runHr",
      Run.topCities(spark).as[String].collect().toSeq.zipWithIndex.map {
        case (c, i) => (c.toLowerCase.replace(" ", "_") + ".json",
          weatherDoc(c, 90.0 + i, i % 2, pyRepr = false))
      })
    // same attempt → replay: the ORIGINAL temperatures stay
    Run.run(spark, cfg, runHr)
    val tempsAfterRetry = gold(cfg, "weather")
      .select(col("current.temp_c").cast("double")).as[Double]
      .collect().toSet
    assert(tempsAfterRetry == Set(20.0, 21.0, 22.0, 23.0, 24.0))
    // new attempt → the backfill lands, wholesale
    Run.run(spark, cfg.copy(attempt = "a2"), runHr)
    val tempsAfterBackfill = gold(cfg, "weather")
      .select(col("current.temp_c").cast("double")).as[Double]
      .collect().toSet
    assert(tempsAfterBackfill == Set(90.0, 91.0, 92.0, 93.0, 94.0))
  }

  test("racing reader (p01 v2 law): during a MULTI-partition gold " +
      "backfill publish, a reader sees the old snapshot whole or " +
      "the new one — never one hour new and the other old") {
    val cfg = freshDirs()
    val hr2 = runHr + 100
    landBronze(cfg, runHr)
    landBronze(cfg, hr2)
    Run.run(spark, cfg, runHr)
    Run.run(spark, cfg, hr2)
    val before = gold(cfg, "weather").drop("created_at_ts")
      .collect().toSet
    // a two-hour backfill in ONE commit (both partitions revised)
    val revised = gold(cfg, "weather")
      .withColumn("current", col("current")
        .withField("temp_c", col("current.temp_c") + 100))
    var seen: Option[Set[org.apache.spark.sql.Row]] = None
    Manifest.onPublishAttempt = () =>
      if (seen.isEmpty)
        seen = Some(gold(cfg, "weather").drop("created_at_ts")
          .collect().toSet)
    try Manifest.commitReplacePartitions(revised,
      s"${cfg.goldDir}/weather", "run_hr", "backfill_both"): Unit
    finally Manifest.onPublishAttempt = () => ()
    assert(seen.contains(before),
      "the mid-publish reader must see the OLD snapshot, whole")
    val after = gold(cfg, "weather")
    assert(after.count() == 10L)
    assert(after.select(col("current.temp_c").cast("double"))
      .as[Double].collect().forall(_ >= 120.0),
      "both hours must flip together")
  }

  test("cross-table atomic publish (p01 v3, r17): a PIN-ROUTED " +
      "reader during a backfill run sees weather and cocktails gold " +
      "both-old or both-new, never a mixed run") {
    val cfg = freshDirs()
    landBronze(cfg, runHr)
    Run.run(spark, cfg, runHr)
    // one run-level cut: both entities through the pin root
    def cut(): (Set[Double], Set[Long]) = (
      Run.readGold(spark, cfg, "weather")
        .select(col("current.temp_c").cast("double"))
        .as[Double].collect().toSet,
      Run.readGold(spark, cfg, "cocktails")
        .select(col("id_drink").cast("long"))
        .as[Long].collect().toSet)
    val before = cut()
    assert(before._1 == Set(20.0, 21.0, 22.0, 23.0, 24.0))
    assert(before._2 == Set(11470L, 11471L, 11472L))
    // bronze revised for BOTH entities; a NEW attempt backfills the
    // hour. The per-table commits land one after another — the
    // window the pin layer exists to close.
    Run.writeRawText(spark, s"${cfg.bronzeDir}/weather/run_hr=$runHr",
      Run.topCities(spark).as[String].collect().toSeq.zipWithIndex.map {
        case (c, i) => (c.toLowerCase.replace(" ", "_") + ".json",
          weatherDoc(c, 90.0 + i, i % 2, pyRepr = false))
      })
    Run.writeRawText(spark, s"${cfg.bronzeDir}/cocktails/run_hr=$runHr",
      Seq(("cocktails.json", cocktailsDoc(Seq(20001, 20002)))))
    val observed =
      scala.collection.mutable.ArrayBuffer.empty[(Set[Double], Set[Long])]
    // the seam fires inside EVERY publish attempt of the run — after
    // the weather table commit but before cocktails is exactly the
    // torn window a non-pinned reader would see mixed
    Manifest.onPublishAttempt = () => observed += cut()
    try Run.run(spark, cfg.copy(attempt = "a2"), runHr)
    finally Manifest.onPublishAttempt = () => ()
    val after = cut()
    assert(after._1 == Set(90.0, 91.0, 92.0, 93.0, 94.0))
    assert(after._2 == Set(20001L, 20002L))
    assert(observed.nonEmpty && observed.forall(o =>
      o == before || o == after),
      s"a pin-routed reader saw a MIXED run cut: " +
        observed.filterNot(o => o == before || o == after).headOption)
    // and the mid-run observations (pre-pin-commit) saw the old run
    assert(observed.contains(before))
  }

  test("C3: skipSecondSink suppresses exactly the flat sink") {
    val cfg = freshDirs().copy(skipSecondSink = true)
    landBronze(cfg, runHr)
    val report = Run.run(spark, cfg, runHr)
    assert(!report.secondSinkWritten)
    assert(gold(cfg, "weather").count() == 5L)
    assert(!new java.io.File(
      s"${cfg.goldDir}/weather_flat".replace("file:", "")).exists())
  }

  test("Q2: DQ gate failure blocks the gold write") {
    val cfg = freshDirs()
    // duplicate idDrink violates the unique_key check
    landBronze(cfg, runHr, cocktailIds = Seq(11470, 11470))
    val e = intercept[Checks.DqGateException] {
      Run.run(spark, cfg, runHr)
    }
    assert(e.getMessage.contains("unique_key_id_drink"))
    // weather (gated first, green) was written; cocktails was not
    assert(gold(cfg, "weather").count() == 5L)
    assert(!new java.io.File(s"${cfg.goldDir}/cocktails").exists())
    // and the red check run is on record
    val dq = spark.read.parquet(cfg.dqDir)
    assert(dq.filter(!col("success") &&
      col("table_name") === "cocktails_gold").count() == 1L)
  }

  test("Q1: approx uniqueness passes unique keys, fails bulk duplication") {
    import graft.dq.Checks
    val unique = (1L to 2000L).toDF("k")
    val okRun = Checks.runChecks(unique, "t", 1L,
      Checks.CheckConfig(uniqueKey = Some(Seq("k")),
        approxUniqueRsd = Some(0.01)))
    val ok = okRun.filter(col("check_name") === "unique_key_approx_k")
      .select("success").as[Boolean].collect()
    assert(ok.sameElements(Array(true)))
    // every key duplicated: distinct ≈ n/2, far below the 3·rsd floor
    val dup = ((1L to 2000L) ++ (1L to 2000L)).toDF("k")
    val badRun = Checks.runChecks(dup, "t", 1L,
      Checks.CheckConfig(uniqueKey = Some(Seq("k")),
        approxUniqueRsd = Some(0.01)))
    val bad = badRun.filter(col("check_name") === "unique_key_approx_k")
      .select("success").as[Boolean].collect()
    assert(bad.sameElements(Array(false)))
  }

  test("Q1: vacuous approx-uniqueness rsd (>= 1/3) is rejected") {
    import graft.dq.Checks
    intercept[IllegalArgumentException] {
      Checks.runChecks(Seq(1L).toDF("k"), "t", 1L,
        Checks.CheckConfig(uniqueKey = Some(Seq("k")),
          approxUniqueRsd = Some(0.34)))
    }
  }

  test("p03 curation: originals survive replays, dup_count marks them") {
    val out = SparkEntry.queries("p03_curation_pipeline")(spark, sf)
      .select("doc_id", "dup_count", "split")
      .as[(Long, Long, String)].collect()
    assert(out.nonEmpty)
    // dedup keeps the ORIGINAL id: replayed ids (+100000) never survive
    assert(out.forall(_._1 < 100000L))
    // a replayed doc passes/fails the text gates with its twin, so
    // every 10th doc carries at least its replay (>= 2; == 2 would
    // additionally assume no two DISTINCT fixture docs share identical
    // normalized text — true today, but not a property this test owns)
    assert(out.forall { case (id, c, _) =>
      if (id % 10 == 0) c >= 2L else c >= 1L })
    assert(out.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("p11 pair curation v2: broken links never surface, re-upload " +
      "twins collapse to the original with multiplicity, shared-image " +
      "pairs collapse by dHash, and the planted wrong-image class " +
      "drops at the cross-modal int8-cosine gate (r15)") {
    val out = SparkEntry.queries("p11_pair_curation")(spark, sf)
      .select("pair_id", "dhash", "n_image_dups", "n_caption_dups")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ids = out.map(_._1).toSet
    // join integrity: the %23==1 base pairs have no image payload and
    // must never surface
    assert(ids.forall(id => id >= 100000L || id % 23 != 1))
    // the planted wrong-image class survives every text/image gate
    // but MUST drop at the cross-modal gate
    assert(ids.forall(_ % 17 != 3), "a wrong-image pair survived")
    // caption dedup keeps the ORIGINAL id — a re-uploaded +100000
    // twin survives ONLY when its base pair was a broken link
    // (%23==1 ∩ %10==0, e.g. 70) or itself dropped at the
    // cross-modal gate (%17==3, e.g. base 20): the re-upload is then
    // the corpus's only intact copy, which is exactly what a
    // curation pass should keep
    assert(ids.forall(id => id < 100000L ||
      (id - 100000L) % 23 == 1 || (id - 100000L) % 17 == 3))
    // and at least one such rescue exists in the fixture (base 20)
    assert(ids.contains(100020L))
    // a surviving %10==0 BASE pair carries its re-upload in
    // n_caption_dups (>= 2); a twin that survived alone carries 1
    assert(out.forall { case (id, _, _, cd) =>
      if (id < 100000L && id % 10 == 0) cd >= 2L else cd >= 1L })
    // image dedup: even/odd base pairs share pixel-identical images,
    // so a surviving base pair is the min of its dHash group — an odd
    // id survives only when its even twin is gone (broken link or
    // gated), and group multiplicities are consistent
    assert(out.forall(_._3 >= 1L))
    val dhashes = out.map(_._2)
    assert(dhashes.distinct.length == dhashes.length,
      "two survivors share a dHash — image dedup leaked a duplicate")
  }

  test("p12 video curation v2: truncated containers quarantine, gates " +
      "enforce duration/resolution floors, byte-identical containers " +
      "collapse to the min id with multiplicity, and shot structure " +
      "over container-EXTRACTED frames matches the planting formula " +
      "(r15)") {
    val out = SparkEntry.queries("p12_video_curation")(spark, sf)
      .select("video_id", "duration_ms", "height", "n_dups",
        "n_frames_sampled", "n_shots")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ids = out.map(_._1).toSet
    // framing: the i%5==4 truncation class cuts mdat and must drop
    assert(ids.forall(_ % 5 != 4))
    // gates are floors, exactly
    assert(out.forall { case (_, ms, h, _, _, _) =>
      ms >= 3000L && h >= 240L })
    // the parameter group g=i/2 has members {2g, 2g+1}; the survivor
    // is the min NON-truncated member and n_dups counts exactly the
    // non-truncated members (1 when the twin was cut short, 2 else)
    assert(out.forall { case (id, _, _, nd, _, _) =>
      val g = id / 2
      val members = Seq(2L * g, 2L * g + 1).filter(_ % 5 != 4)
      id == members.min && nd == members.size.toLong
    })
    // the 4-sample schedule {0,3,6,9} over shot length L = 2 + g%3:
    // sampled shot groups are fr/L, distinct counts 4/4/3 — shots
    // detected over EXTRACTED frame bytes must equal the formula
    assert(out.forall { case (id, _, _, _, nfs, ns) =>
      val g = id / 2
      val expect = Seq(0L, 3L, 6L, 9L).map(_ / (2 + g % 3)).distinct.size
      nfs == 4L && ns == expect.toLong
    })
    // one survivor per parameter group
    val gs = out.map(_._1 / 2)
    assert(gs.distinct.length == gs.length)
  }

  test("p13 audio curation v2: corrupt clips quarantine, all-silent " +
      "and short clips gate out, byte-identical clips collapse to " +
      "the min id, and AMPLITUDE RE-ENCODES collapse through the " +
      "fingerprint near-dup stage on the 16 kHz lane (r15)") {
    val rows = SparkEntry.queries("p13_audio_curation")(spark, sf)
      .select("clip_id", "sample_rate", "duration_ms", "n_windows",
        "n_active", "n_segments", "n_dups", "n_variants")
      .as[(Long, Int, Long, Long, Long, Long, Long, Long)].collect()
    val out = rows.filter(_._2 == 8000)
    assert(out.nonEmpty)
    out.foreach { case (id, _, ms, nw, na, nseg, nd, nv) =>
      val g = id / 2
      // quarantine + gates
      assert(id % 9 != 4 && g % 5 != 0)
      assert(ms >= 300L && na * 2 >= nw)
      // exact closed-form structure
      assert(nw == 10 + 2 * (g % 6))
      assert(ms == (1600 + (g % 6) * 320) / 8)
      // survivor is the min NON-corrupt member of its pair; dups
      // count exactly the non-corrupt members
      val members = Seq(2 * g, 2 * g + 1).filter(_ % 9 != 4)
      assert(id == members.min && nd == members.size.toLong)
      // islands are bounded by the active count and non-empty
      assert(nseg >= 1L && nseg <= na)
      // the saw lane never near-dup-merges
      assert(nv == 1L)
    }
    val gs = out.map(_._1 / 2)
    assert(gs.distinct.length == gs.length)
    // 16 kHz lane: quad q = {2 byte-identical originals, 1 amplitude
    // re-encode, 1 corrupt}; the near-dup stage must merge the
    // re-encode's exact-group onto the originals': survivor 200+4q,
    // n_dups 3 (all playable members), n_variants 2 (exact groups)
    val lane16 = rows.filter(_._2 == 16000)
    assert(lane16.nonEmpty, "16 kHz lane produced no survivors")
    lane16.foreach { case (id, _, ms, nw, _, _, nd, nv) =>
      assert((id - 200L) % 4 == 0, s"survivor $id is not a quad min")
      assert(ms == 560L && nw == 56L)
      // collapsed word groups carry whole quads (3 dups, 2 variants
      // per merged q — multiples when two q's share a word)
      assert(nd == 3L * nv / 2 && nv % 2 == 0L)
    }
  }

  test("p14 dataloader manifest: segments conserve every survivor's " +
      "token count, packs tile exactly, and the interleave " +
      "proportionality law CARRIES THROUGH the packed stream (r15)") {
    val out = SparkEntry.queries("p14_dataloader_manifest")(spark, sf)
      .select("pack_id", "conversation_id", "seg_start", "seg_len",
        "source", "n_tokens")
      .as[(Long, Long, Long, Long, String, Long)].collect()
    assert(out.nonEmpty)
    // conservation: per conversation, segment lengths sum to n_tokens
    out.groupBy(_._2).foreach { case (c, segs) =>
      assert(segs.map(_._4).sum == segs.head._6, s"conv $c leaks")
    }
    // packs tile [0, 256) exactly (final pack tiles a prefix)
    val maxPack = out.map(_._1).max
    out.groupBy(_._1).foreach { case (p, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3)
        case _ =>
      }
      if (p != maxPack)
        assert(sorted.map(_._4).sum == 256L, s"pack $p not full")
    }
    // the carried proportionality law: conversations in PACKED
    // STREAM order (first-segment position) hold each source within
    // ~1.5 of its proportional share at every prefix — the ns175
    // interleave guarantee survives the packing stage because
    // packing preserves the order
    val stream = out.groupBy(_._2).map { case (c, segs) =>
      val first = segs.minBy(s => (s._1, s._3))
      (first._1 * 256 + first._3, c, segs.head._5)
    }.toSeq.sortBy(_._1)
    val n = stream.size.toDouble
    val sizes = stream.groupBy(_._3).view.mapValues(_.size).toMap
    stream.indices.foreach { k =>
      val prefix = stream.take(k + 1)
      sizes.foreach { case (s, ns) =>
        val got = prefix.count(_._3 == s)
        val want = (k + 1) * ns / n
        assert(math.abs(got - want) <= 1.5,
          s"prefix ${k + 1}: source $s has $got, expected ~$want")
      }
    }
  }

  test("p04 incremental curation: only delta docs admitted, store honored") {
    val out = SparkEntry.queries("p04_incremental_curation")(spark, sf)
      .select("doc_id", "dup_count", "split")
      .as[(Long, Long, String)].collect()
    assert(out.nonEmpty)
    // the delta by construction: added ids ≡3 (mod 10), rewritten
    // ids ≡0 (mod 5) i.e. ≡{0,5} (mod 10) — nothing else may appear
    assert(out.forall { case (id, _, _) =>
      Set(0L, 3L, 5L).contains(id % 10) },
      s"non-delta doc admitted: ${out.filter(r =>
        !Set(0L, 3L, 5L).contains(r._1 % 10)).take(5).mkString(",")}")
    assert(out.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // rerun is deterministic row-for-row
    val again = SparkEntry.queries("p04_incremental_curation")(spark, sf)
      .select("doc_id", "dup_count", "split")
      .as[(Long, Long, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("S11: sensor waits for normalized names and times out honestly") {
    val cfg = freshDirs()
    val dir = s"${cfg.bronzeDir}/weather/run_hr=$runHr"
    assert(!Run.awaitFiles(spark, dir, Seq("New York.json"),
      timeoutMs = 200, pollMs = 20))
    Run.writeRawText(spark, dir, Seq(("new_york.json", "{}")))
    assert(Run.awaitFiles(spark, dir, Seq("New York.json"),
      timeoutMs = 200, pollMs = 20))
  }

  test("S12: query result renders into a notification template") {
    val df = Seq(("now", 1L), ("tomorrow", 2L)).toDF("label", "n")
    val msg = graft.pipeline.Notify.renderMessage(df,
      "Results:\n{{ results_df }}\ndone")
    assert(msg ==
      "Results:\nlabel | n\nnow | 1\ntomorrow | 2\ndone")
  }

  test("Q4: dq_results map to deterministic assertion-run records") {
    import java.sql.Timestamp
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row("gold_t", "row_count", true, false, "rows=5 min=1",
        runHr, new Timestamp(1L)),
      Row("gold_t", "freshness", false, false, "max_run_hr=-1 expected=1",
        runHr, new Timestamp(2L)),
      Row("gold_t", "async_check", false, true, "still running",
        runHr, new Timestamp(3L)))
    val dq = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      graft.model.Schemas.dqResult)
    val ev = graft.dq.Metadata.assertionRunEvents(dq, "graft")
      .select("native_type", "result_type", "run_status", "assertion_urn")
      .as[(String, String, String, String)].collect()
    assert(ev.map(e => (e._1, e._2, e._3)).toSet == Set(
      ("row_count", "SUCCESS", "COMPLETE"),
      ("freshness", "FAILURE", "COMPLETE"),
      ("async_check", "FAILURE", "PENDING")))
    // URNs are deterministic (content-addressed), distinct per check,
    // and independent of wall-clock checked_at.
    assert(ev.map(_._4).distinct.length == 3)
    val again = graft.dq.Metadata.assertionRunEvents(dq, "graft")
      .select("assertion_urn").as[String].collect()
    assert(ev.map(_._4).sorted.sameElements(again.sorted))
  }

  test("Q4: monitoringAspects emits one link + one tag record per dataset") {
    import org.apache.spark.sql.functions._
    // duplicate monitored rows collapse (the reference's add-if-absent)
    val datasets = Seq("t_a", "t_b", "t_a").toDF("table_name")
    val out = graft.dq.Metadata.monitoringAspects(datasets, "graft",
      concat(lit("https://dq.example/runbook/"), col("table_name")),
      concat(lit("DQ runbook for "), col("table_name")))
      .select("dataset_urn", "aspect_name", "url", "tag_urn")
      .as[(String, String, Option[String], Option[String])].collect().toSet
    def urn(t: String) = s"urn:li:dataset:(urn:li:dataPlatform:graft,$t,PROD)"
    assert(out == Set(
      (urn("t_a"), "institutionalMemory",
        Some("https://dq.example/runbook/t_a"), None),
      (urn("t_b"), "institutionalMemory",
        Some("https://dq.example/runbook/t_b"), None),
      (urn("t_a"), "globalTags", None, Some("urn:li:tag:Monitored_By_Anomalo")),
      (urn("t_b"), "globalTags", None, Some("urn:li:tag:Monitored_By_Anomalo"))))
  }

  test("Q3: check-status classification") {
    import Checks.CheckStatus._
    assert(Checks.CheckStatus.parse("PENDING") == Pending)
    assert(Checks.CheckStatus.parse("complete") == Complete)
    assert(Checks.CheckStatus.parse("Skipped") == Skipped)
    assert(Checks.CheckStatus.parse("???") == Unknown)
    assert(!Pending.done && Complete.done && Skipped.done && !Unknown.done)
  }

  test("dq03: a planted volume spike is flagged; constant series " +
      "z-scores to 0, never NaN") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 steady hours at ~100.00 plus one 100x spike hour
    val steady = (0 until 24).flatMap(h => Seq(
      ("clicks", f"2024-01-01 $h%02d:15:00", 60.0),
      ("clicks", f"2024-01-01 $h%02d:45:00", 40.0)))
    val spike = Seq(("clicks", "2024-01-02 06:30:00", 10000.0))
    val const = (0 until 10).map(h =>
      ("flat", f"2024-01-03 $h%02d:00:00", 5.0))
    val ev = (steady ++ spike ++ const)
      .toDF("event_type", "tss", "value")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"),
        col("value"))
    val got = Checks.metricAnomalies(ev, "event_type", "ts", "value")
      .as[(String, Long, Long, Double, Boolean)].collect()
    val anomalies = got.filter(_._5)
    assert(anomalies.map(r => (r._1, r._2)).toSet ==
      Set(("clicks", 202401020600L)))
    val flat = got.filter(_._1 == "flat")
    assert(flat.nonEmpty && flat.forall(r => r._4 == 0.0 && !r._5))
    assert(got.forall(r => !r._4.isNaN))
  }

  test("dq04: planted orphans counted exactly; null keys are orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(3L))
      .toDF("fk")
    val got = Checks.fkOrphans(child, "fk", parent, "pk", "kids")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("kids", 5L, 2L)))
    // duplicate parent keys must not multiply child rows
    val dupParent = Seq(1L, 1L, 2L, 3L, 3L).toDF("pk")
    val again = Checks.fkOrphans(child, "fk", dupParent, "pk", "kids")
      .as[(String, Long, Long)].collect().toSeq
    assert(again == Seq(("kids", 5L, 2L)))
  }

  test("dq05: planted hour gaps reported with exact missing counts, " +
      "dense series reports none") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hours 00,01,02 then 05 (gap of 2), then 06; 'dense' has no gap
    val rows = Seq(
      ("a", "2024-02-01 00:10:00"), ("a", "2024-02-01 01:20:00"),
      ("a", "2024-02-01 02:59:00"), ("a", "2024-02-01 05:00:00"),
      ("a", "2024-02-01 06:30:00"),
      ("dense", "2024-02-01 00:00:00"), ("dense", "2024-02-01 01:00:00"))
    val ev = rows.toDF("event_type", "tss")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"))
    val got = Checks.seriesGaps(ev, "event_type", "ts")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 202402010200L, 2L)))
  }

  test("dq06: schema drift labels add/remove/type-change; identical " +
      "schemas report all-unchanged") {
    import spark.implicits._
    val oldDf = Seq((1L, "a", 2L)).toDF("id", "name", "n")
    val newDf = Seq((1L, 2, true)).toDF("id", "n", "flag")
    val got = Checks.schemaDrift(oldDf, newDf)
      .as[(String, String, Option[String], Option[String])]
      .collect().toSet
    assert(got == Set(
      ("id", "unchanged", Some("bigint"), Some("bigint")),
      ("name", "removed", Some("string"), None),
      ("n", "type_changed", Some("bigint"), Some("int")),
      ("flag", "added", None, Some("boolean"))))
    val same = Checks.schemaDrift(oldDf, oldDf)
    assert(same.filter(col("status") =!= "unchanged").isEmpty)
  }

  test("ns113: planted hot key ranks first with exact counts; null " +
      "keys are profiled like any value") {
    import spark.implicits._
    val rows = (1 to 50).map(_ => Option(7L)) ++
      (1 to 5).map(i => Option(i.toLong)) ++ Seq(None, None, None)
    val df = rows.toDF("k")
    val got = Checks.keySkewProfile(df, "k", k = 3)
      .as[(Option[Long], Long, Long, Long, Long)].collect().toList
    assert(got.head == (Some(7L), 50L, 58L, 7L, 1L),
      s"hot key must rank first: ${got.head}")
    assert(got.map(_._1).contains(None),
      "null keys must be profiled (the null-skew trap)")
    assert(got.forall(r => r._3 == 58L && r._4 == 7L))
  }

  test("ns97 PSI: ~0 on identical snapshots, positive under a planted " +
      "shift, non-negative per the (q-p)ln(q/p) identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ns.Sketches
    val a = (1 to 500).map(i => ("m", 1L + i % 10, i.toLong))
      .toDF("event_type", "value", "event_id")
      .select(col("event_type"), col("value").cast("double").as("value"),
        col("event_id"))
    // identical snapshots: every bin's p == q, psi exactly 0
    val same = Sketches.psiDrift(a, a, "event_type", "value")
      .as[(String, Long, Long)].collect()
    assert(same.nonEmpty && same.forall(_._3 == 0L))
    // planted shift: second snapshot's values moved up by 5 units
    val b = a.withColumn("value", col("value") + lit(5.0))
    val shifted = Sketches.psiDrift(a, b, "event_type", "value")
      .as[(String, Long, Long)].collect()
    assert(shifted.forall(_._3 > 0L), s"PSI must be positive: ${shifted.toSeq}")
    // partition independence: exact same psi_fx at another layout
    val shifted2 = Sketches.psiDrift(a.repartition(13), b.repartition(7),
      "event_type", "value").as[(String, Long, Long)].collect()
    assert(shifted.toSet == shifted2.toSet)
  }
}
