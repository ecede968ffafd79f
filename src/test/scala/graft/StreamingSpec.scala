package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, ts: String, user: Long, typ: String,
      value: Double): Event =
    Event(id, Timestamp.valueOf(ts), user, typ, value)

  test("hourlyRollup finalizes tumbling windows once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourlyRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode("append").start()
    try {
      mem.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.5),
        ev(2, "2024-01-01 10:40:00", 2, "click", 2.5),
        ev(3, "2024-01-01 10:59:00", 1, "view", 4.0),
        ev(4, "2024-01-01 11:10:00", 3, "click", 8.0))
      q.processAllAvailable()
      // nothing final yet: watermark is 30 min behind 11:10
      assert(spark.table("rollup_sink").count() == 0)
      // an event at 13:00 pushes the watermark to 12:30 → both the
      // 10:00 and 11:00 windows finalize
      mem.addData(ev(5, "2024-01-01 13:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("rollup_sink")
        .select(col("run_hr"), col("event_type"), col("n"), col("total"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (202401011000L, "click", 2L, 4.0),
        (202401011000L, "view", 1L, 4.0),
        (202401011100L, "click", 1L, 8.0)))
    } finally q.stop()
  }

  test("startGoldStream lands idempotent run_hr-partitioned gold") {
    val base = Files.createTempDirectory("graft_stream").toFile
    base.deleteOnExit()
    val src = s"${base.getPath}/events"
    val gold = s"${base.getPath}/gold"
    val ckpt = s"${base.getPath}/ckpt"
    val events = Seq(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:45:00", 2, "click", 3.0),
      ev(3, "2024-01-01 12:30:00", 1, "view", 5.0)) // closes hour 10
    events.toDF().write.mode("overwrite").parquet(src)
    val stream = EventStream.fileSource(spark, src,
      events.toDF().schema)
    val q = EventStream.startGoldStream(
      EventStream.hourlyRollup(stream), gold, ckpt)
    q.awaitTermination()
    import graft.ops.Manifest
    val out = Manifest.read(spark, gold, "run_hr")
      .select(col("run_hr").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((202401011000L, "click", 2L)))
    // one file per partition (stage repartitions by run_hr)
    assert(Manifest.read(spark, gold, "run_hr").inputFiles.length == 1)
    val v1 = Manifest.currentVersion(spark, gold)
    // same-checkpoint restart: every batch already consumed →
    // publishes NO versions (the replay-publishes-nothing law)
    val qr = EventStream.startGoldStream(
      EventStream.hourlyRollup(EventStream.fileSource(spark, src,
        events.toDF().schema)), gold, ckpt)
    qr.awaitTermination()
    assert(Manifest.currentVersion(spark, gold) == v1,
      "a same-checkpoint replay must not burn versions")
    // replaying the whole stream from a FRESH checkpoint re-commits,
    // REPLACING the partition rather than duplicating it — and the
    // pre-replay snapshot survives for a pinned reader (racing-reader
    // law: a reader resolves a whole version, never a half-written
    // batch directory)
    val q2 = EventStream.startGoldStream(
      EventStream.hourlyRollup(EventStream.fileSource(spark, src,
        events.toDF().schema)), gold, s"${base.getPath}/ckpt2")
    q2.awaitTermination()
    assert(Manifest.read(spark, gold, "run_hr")
      .filter(col("run_hr") === 202401011000L).count() == 1)
    assert(Manifest.readAt(spark, gold, "run_hr", v1)
      .filter(col("run_hr") === 202401011000L).count() == 1)
  }

  test("startGoldStream runs under a ProcessingTime trigger (C1 cadence)") {
    val base = Files.createTempDirectory("graft_pt").toFile
    base.deleteOnExit()
    val src = s"${base.getPath}/events"
    val events = Seq(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 12:30:00", 1, "view", 5.0)) // closes hour 10
    events.toDF().write.mode("overwrite").parquet(src)
    // continuous-operation mode: fires on a clock instead of draining;
    // processAllAvailable makes the test deterministic, then stop()
    val q = EventStream.startGoldStream(
      EventStream.hourlyRollup(EventStream.fileSource(spark, src,
        events.toDF().schema)),
      s"${base.getPath}/gold", s"${base.getPath}/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      val out = graft.ops.Manifest
        .read(spark, s"${base.getPath}/gold", "run_hr")
        .select(col("run_hr").cast("long"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(out == Set((202401011000L, "click", 1L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark emits each re-delivered event exactly once") {
    val base = Files.createTempDirectory("graft_dedup").toFile
    base.deleteOnExit()
    val src = s"${base.getPath}/events"
    // at-least-once delivery: event 2 arrives in both files
    Seq(ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:06:00", 2, "view", 2.0))
      .toDF().write.parquet(s"$src/a")
    Seq(ev(2, "2024-01-01 10:06:00", 2, "view", 2.0),
        ev(3, "2024-01-01 10:07:00", 1, "click", 3.0))
      .toDF().write.parquet(s"$src/b")
    val schema = spark.read.parquet(s"$src/a").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
      .parquet(src)
    val out = s"${base.getPath}/out"
    val q = EventStream.dedupWithinWatermark(stream, Seq("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"${base.getPath}/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "click", 1.0), (2L, "view", 2.0),
      (3L, "click", 3.0)))
  }

  test("streaming rollup equals the batch rollup on all closed windows") {
    val base = Files.createTempDirectory("graft_sb").toFile
    base.deleteOnExit()
    val src = s"${base.getPath}/events"
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    ev.write.mode("overwrite").parquet(src)

    // batch truth, same window boundaries + decimal-free double sums
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(graft.ingest.JsonIngest.runHr(col("window.start"))
        .as("run_hr"), col("event_type"), col("n"), col("total"),
        col("window.end").as("wend"))
    val maxTs = ev.select(max(col("ts"))).as[Timestamp].collect().head
    val watermark = new Timestamp(maxTs.getTime - 30 * 60000L)
    val closed = batch.filter(col("wend") <= lit(watermark))
      .select(col("run_hr"), col("event_type"), col("n"), col("total"))
      .as[(Long, String, Long, Double)].collect()
      .map { case (hr, et, n, tot) => (hr, et) -> ((n, tot)) }.toMap
    assert(closed.nonEmpty)

    val rollup = EventStream.hourlyRollup(
      EventStream.fileSource(spark, src, ev.schema))
    val q = rollup
      .writeStream.format("memory").queryName("sb_rollup")
      .option("checkpointLocation", s"${base.getPath}/ckpt")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the memory sink registers its view in the stream's own tuned
    // session (fileSource plans in a child session since r19)
    val streamed = rollup.sparkSession.table("sb_rollup")
      .as[(Long, String, Long, Double)].collect()
      .map { case (hr, et, n, tot) => (hr, et) -> ((n, tot)) }.toMap
    // every window the watermark closed must match the batch answer
    // exactly on counts and within float-reassociation noise on sums
    assert(streamed.keySet == closed.keySet,
      s"missing=${closed.keySet -- streamed.keySet} " +
        s"extra=${streamed.keySet -- closed.keySet}")
    closed.foreach { case (k, (n, tot)) =>
      val (sn, stot) = streamed(k)
      assert(sn == n, s"$k count $sn != $n")
      assert(math.abs(stot - tot) < 1e-6, s"$k total $stot != $tot")
    }
  }

  test("s01 path under ProcessingTime matches its AvailableNow answer") {
    // The reference-cadence mode (C1 hourly → Trigger.ProcessingTime)
    // EXECUTED on the real s01 path — fixture events, watermarked
    // hourly rollup, gold sink — not just type-checked: fire on a
    // clock, drain with processAllAvailable, stop, and the landed gold
    // must be exactly what the drain-and-stop trigger lands.
    val base = Files.createTempDirectory("graft_s01pt").toFile
    base.deleteOnExit()
    val src = s"${base.getPath}/events"
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    ev.write.mode("overwrite").parquet(src)
    def run(trigger: org.apache.spark.sql.streaming.Trigger,
        tag: String): Set[(Long, String, Long, Double)] = {
      val q = EventStream.startGoldStream(
        EventStream.hourlyRollup(
          EventStream.fileSource(spark, src, ev.schema)),
        s"${base.getPath}/gold_$tag", s"${base.getPath}/ckpt_$tag",
        trigger)
      try {
        q.processAllAvailable()
      } finally q.stop()
      graft.ops.Manifest.read(spark, s"${base.getPath}/gold_$tag",
          "run_hr")
        .select(col("run_hr").cast("long"), col("event_type"),
          col("n"), col("total"))
        .as[(Long, String, Long, Double)].collect().toSet
    }
    val clocked = run(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      "pt")
    val drained = run(
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), "an")
    assert(clocked.nonEmpty)
    // both sums ride the same decimal-exact path before the final
    // double cast → bit-equal, no float tolerance needed
    assert(clocked == drained)
  }

  test("sessionize: gap closes sessions in-batch, watermark via timeout") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then an event
      // 110 min later — the gap closes session 1 inside the batch
      mem.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
        ev(3, "2024-01-01 12:00:00", 1, "click", 4.0))
      q.processAllAvailable()
      val first = spark.table("session_sink")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      assert(first.toSeq == Seq((1L,
        Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:10:00"), 2L, 3.0)))
      // another user far in the future pushes the watermark past the
      // 12:00 session's timeout → it closes via EventTimeTimeout
      mem.addData(ev(4, "2024-01-01 15:00:00", 2, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("session_sink")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(sessions.contains((1L,
        Timestamp.valueOf("2024-01-01 12:00:00"),
        Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 4.0)))
    } finally q.stop()
  }

  // Stream ≡ batch for the stream-stream range join (the s05 gate's
  // operator-level twin): the drained watermarked inner join must
  // equal graft.ops.TemporalJoin.rangeJoin over the same fixture.
  test("startUpsertStream: within-batch disorder resolved by version, " +
      "cross-batch last-writer wins; same-checkpoint replays " +
      "short-circuit, fresh-checkpoint re-delivery re-applies " +
      "content-idempotently (commit-layer laws, r17)") {
    import graft.ops.Manifest
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toString
    val root = s"$base/t"
    // part is a pure function of the key (stable-partition contract);
    // the target is seeded as an init COMMIT (v1)
    Manifest.commitReplacePartitions(
      Seq((1L, 10L, "a", 10L), (2L, 10L, "b", 10L), (3L, 20L, "c", 1L))
        .toDF("uid", "ver", "payload", "part"), root, "part", "init")
    // Batch file with WITHIN-batch disorder: uid=1 arrives ver 30
    // then ver 20 — the sink must keep ver 30. uid=4 is an insert.
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    def writeBatch(n: Int, rows: Seq[(Long, Long, String, Long)]): Unit = {
      val tmp = new java.io.File(base, s"tmp$n")
      rows.toDF("uid", "ver", "payload", "part")
        .coalesce(1).write.parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$n.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + n * 60000L)
    }
    writeBatch(0, Seq((1L, 30L, "a3", 10L), (1L, 20L, "a2", 10L),
      (4L, 5L, "d", 20L)))
    writeBatch(1, Seq((2L, 40L, "b4", 10L)))
    def drain(ckpt: String): Unit = {
      val stream = EventStream.fileSource(spark, srcDir.getPath,
        spark.read.parquet(srcDir.getPath).schema, maxFilesPerTrigger = 1)
      val q = EventStream.startUpsertStream(stream, root, ckpt,
        keyCols = Seq("uid"), versionCols = Seq("ver"),
        partitionCol = "part")
      q.awaitTermination()
    }
    drain(s"$base/ckpt")
    def table(): Set[(Long, Long, String, Long)] =
      Manifest.read(spark, root, "part")
        .select($"uid", $"ver", $"payload", $"part".cast("long"))
        .as[(Long, Long, String, Long)].collect().toSet
    val want = Set((1L, 30L, "a3", 10L), (2L, 40L, "b4", 10L),
      (3L, 20L, "c", 1L), (4L, 5L, "d", 20L))
    assert(table() == want)
    // init + two batch merges; commit keys are CHECKPOINT-scoped
    // (r17 review: a bare 'upsert_b0' key made a second stream on
    // the same root — or a rebuilt checkpoint with different
    // batching — silently short-circuit against the first's log)
    val versionAfter = Manifest.currentVersion(spark, root)
    assert(versionAfter == 3L)
    val keys = Manifest.listCommits(spark, root).map(_._2)
    assert(keys.head == "init" &&
      keys.tail.forall(_.matches("upsert_[A-Za-z0-9_\\-]+_[0-9a-f]+_b[01]")), keys)
    // SAME-checkpoint crash-replay (the at-least-once window): the
    // batch's commit key is already logged → short-circuit, no
    // version burned. Simulated by re-issuing batch 1's commit.
    Manifest.commitMerge(
      Seq((2L, 40L, "b4", 10L)).toDF("uid", "ver", "payload", "part"),
      root, Seq("uid"), "part", keys.last)
    assert(Manifest.currentVersion(spark, root) == versionAfter,
      "a same-checkpoint replayed batch must not burn a version")
    // Re-delivery under a FRESH checkpoint gets a new prefix and
    // RE-APPLIES its batches — content-idempotent (the table is
    // unchanged), versions advance; never the silent short-circuit
    // that would drop a different stream's data.
    drain(s"$base/ckpt2")
    assert(table() == want)
    assert(Manifest.currentVersion(spark, root) == versionAfter + 2,
      "a fresh checkpoint's batches must re-apply, not short-circuit")
  }

  test("startUpsertStream racing-reader law (r17): a reader pinned " +
      "mid-merge sees the pre-batch snapshot whole; time travel " +
      "keeps every batch boundary") {
    import graft.ops.Manifest
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_race").toString
    val root = s"$base/t"
    Manifest.commitReplacePartitions(
      Seq((1L, 10L, "a", 10L), (2L, 10L, "b", 20L))
        .toDF("uid", "ver", "payload", "part"), root, "part", "init")
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val tmp = new java.io.File(base, "tmp0")
    // one batch touching BOTH partitions — the torn-read shape
    Seq((1L, 30L, "a3", 10L), (2L, 40L, "b4", 20L))
      .toDF("uid", "ver", "payload", "part")
      .coalesce(1).write.parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(srcDir, "b0.parquet").toPath)
    def snap(): Set[(Long, Long)] =
      Manifest.read(spark, root, "part")
        .select($"uid", $"ver").as[(Long, Long)].collect().toSet
    val before = snap()
    var seen: Option[Set[(Long, Long)]] = None
    Manifest.onPublishAttempt = () =>
      if (seen.isEmpty) seen = Some(snap())
    try {
      val stream = EventStream.fileSource(spark, srcDir.getPath,
        spark.read.parquet(srcDir.getPath).schema)
      EventStream.startUpsertStream(stream, root, s"$base/ckpt",
        keyCols = Seq("uid"), versionCols = Seq("ver"),
        partitionCol = "part").awaitTermination()
    } finally Manifest.onPublishAttempt = () => ()
    assert(seen.contains(before),
      "the mid-merge reader must see the OLD snapshot, whole — " +
        "never one partition merged and the other not")
    assert(snap() == Set((1L, 30L), (2L, 40L)))
    // the pre-batch snapshot stays readable at its version
    assert(Manifest.readAt(spark, root, "part", 1L)
      .select($"uid", $"ver").as[(Long, Long)].collect().toSet == before)
  }

  test("startTakedownStream on a commit table: emptied partition " +
      "leaves the snapshot, same-checkpoint replays publish no " +
      "versions, the pre-delete snapshot survives for audit until " +
      "vacuum") {
    import graft.ops.Manifest
    val base = java.nio.file.Files
      .createTempDirectory("graft_takedown_spec").toString
    val root = s"$base/t"
    Manifest.commitReplacePartitions(
      Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 20L))
        .toDF("uid", "payload", "part"), root, "part", "init")
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val tmp = new java.io.File(base, "tmp0")
    // delete uid=1 from part 10 and BOTH of... uid=3 empties part 20
    Seq((1L, 10L), (3L, 20L)).toDF("uid", "part")
      .coalesce(1).write.parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(srcDir, "b0.parquet").toPath)
    def drain(ckpt: String): Unit = {
      val stream = EventStream.fileSource(spark, srcDir.getPath,
        spark.read.parquet(srcDir.getPath).schema)
      EventStream.startTakedownStream(stream, root, ckpt,
        keyCols = Seq("uid"), partitionCol = "part").awaitTermination()
    }
    drain(s"$base/ckpt")
    assert(Manifest.read(spark, root, "part")
      .select($"uid").as[Long].collect().toSet == Set(2L))
    val v = Manifest.currentVersion(spark, root)
    val keys = Manifest.listCommits(spark, root).map(_._2)
    assert(keys.head == "init" &&
      keys.tail.forall(_.matches("takedown_[A-Za-z0-9_\\-]+_[0-9a-f]+_b0")), keys)
    // same-checkpoint crash-replay short-circuits on the logged key
    Manifest.commitDelete(Seq((1L, 10L)).toDF("uid", "part"),
      root, Seq("uid"), "part", keys.last)
    assert(Manifest.currentVersion(spark, root) == v)
    // fresh checkpoint: re-applies (content-idempotent — re-deleting
    // absent keys anti-joins to the same survivors), versions advance
    drain(s"$base/ckpt2")
    assert(Manifest.currentVersion(spark, root) == v + 1)
    // compliance note pinned by the law: the deleted rows remain
    // readable at the PRE-delete version until manifest vacuum +
    // data vacuum retire them (the s25 maintenance step)
    assert(Manifest.readAt(spark, root, "part", 1L)
      .select($"uid").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("streaming CDC sinks on an EMPTY table: first upsert batch " +
      "is a pure insert; a takedown batch is a no-op") {
    import graft.ops.Manifest
    val base = java.nio.file.Files
      .createTempDirectory("graft_cdc_empty").toString
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val tmp = new java.io.File(base, "tmp0")
    Seq((1L, 10L, "a", 10L), (2L, 10L, "b", 20L))
      .toDF("uid", "ver", "payload", "part")
      .coalesce(1).write.parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(srcDir, "b0.parquet").toPath)
    val stream = EventStream.fileSource(spark, srcDir.getPath,
      spark.read.parquet(srcDir.getPath).schema)
    val root = s"$base/t"
    EventStream.startUpsertStream(stream, root, s"$base/ckpt",
      keyCols = Seq("uid"), versionCols = Seq("ver"),
      partitionCol = "part").awaitTermination()
    assert(Manifest.read(spark, root, "part")
      .select($"uid").as[Long].collect().toSet == Set(1L, 2L))
    // takedown against a table that does not exist yet: no-op, no
    // version — commitDelete's empty-table degradation
    val root2 = s"$base/t2"
    val delSrc = new java.io.File(base, "dsrc"); delSrc.mkdirs()
    val tmp2 = new java.io.File(base, "tmp1")
    Seq((1L, 10L)).toDF("uid", "part")
      .coalesce(1).write.parquet(tmp2.getPath)
    val p2 = tmp2.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(p2.toPath,
      new java.io.File(delSrc, "b0.parquet").toPath)
    val dstream = EventStream.fileSource(spark, delSrc.getPath,
      spark.read.parquet(delSrc.getPath).schema)
    EventStream.startTakedownStream(dstream, root2, s"$base/ckpt2",
      keyCols = Seq("uid"), partitionCol = "part").awaitTermination()
    assert(Manifest.currentVersion(spark, root2) == 0L)
  }

  test("startSketchStream: drained store reads bit-equal to the " +
      "whole-corpus CMS; replaying a batch never double-adds") {
    import graft.ns.Sketches
    val base = java.nio.file.Files
      .createTempDirectory("graft_sketch_stream").toString
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val docs = Seq((1L, "s1", "alpha beta"), (2L, "s1", "beta gamma"),
      (3L, "s2", "alpha alpha"), (4L, "s2", "delta"))
      .toDF("doc_id", "source", "text")
    Seq(0, 1).foreach { i =>
      val tmp = new java.io.File(base, s"tmp$i")
      docs.filter(col("doc_id") % 2 === i).coalesce(1)
        .write.parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    val store = s"$base/sketch"
    def drain(ckpt: String): Unit = {
      val stream = EventStream.fileSource(spark, srcDir.getPath,
        spark.read.parquet(srcDir.getPath).schema, maxFilesPerTrigger = 1)
      EventStream.startSketchStream(stream, store, ckpt,
        "source", "text").awaitTermination()
    }
    drain(s"$base/ckpt")
    def merged(): Set[(String, Int, Long, Long, Int)] =
      EventStream.readSketchStore(spark, store, "source")
        .as[(String, Int, Long, Long, Int)].collect().toSet
    val whole = Sketches.cmsSketch(docs, Seq(col("source")), "text")
      .as[(String, Int, Long, Long, Int)].collect().toSet
    assert(merged() == whole,
      "drained store must bit-equal the batch sketch")
    // v2 laws (r18): same-checkpoint replay publishes NO versions
    // (every batch key already in the manifest log)...
    val v1 = graft.ops.Manifest.currentVersion(spark, store)
    drain(s"$base/ckpt")
    assert(graft.ops.Manifest.currentVersion(spark, store) == v1,
      "a same-checkpoint replay must not burn versions")
    // ...and a fresh-checkpoint replay re-COMMITS both batch_id
    // partitions (replacement, not duplication): store unchanged,
    // pre-replay snapshot still whole for a pinned reader
    drain(s"$base/ckpt2")
    assert(merged() == whole)
    assert(graft.ops.Manifest
      .readAt(spark, store, "batch_id", v1).count() ==
      graft.ops.Manifest.read(spark, store, "batch_id").count())
  }

  test("startMinhashBankStream: drained bank equals the batch " +
      "banding; matches are the cross-batch collisions; replay " +
      "changes nothing — for BOTH signature idioms (xxhash64 " +
      "production default and the md5 algorithm gate)") {
    import graft.ns.Dedup
    val builders: Seq[(String,
        (DataFrame, String, String, Int, Int) => DataFrame)] = Seq(
      "xxhash64" -> (Dedup.minhashBandRows(_, _, _, _, _)),
      "md5" -> (Dedup.minhashBandRowsExact(_, _, _, _, _)))
    builders.foreach { case (idiom, build) =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_minhash_bank_$idiom").toString
      val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
      val shared = "the quick brown fox jumps over the lazy dog"
      val docs = Seq(
        (2L, shared), (4L, "completely different words entirely here"),
        (1L, shared), (3L, "another unrelated document body text"))
        .toDF("doc_id", "text")
      // batch 0 = even ids, batch 1 = odd ids (arrival order pinned)
      Seq(0, 1).foreach { i =>
        val tmp = new java.io.File(base, s"tmp$i")
        docs.filter(col("doc_id") % 2 === i).coalesce(1)
          .write.parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(srcDir, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
      }
      val bank = s"$base/bank"; val matches = s"$base/matches"
      def drain(ckpt: String): Unit = {
        val stream = EventStream.fileSource(spark, srcDir.getPath,
          spark.read.parquet(srcDir.getPath).schema,
          maxFilesPerTrigger = 1)
        EventStream.startMinhashBankStream(stream, bank, matches,
          ckpt, "doc_id", "text", n = 3, bandRows = build)
          .awaitTermination()
      }
      drain(s"$base/ckpt")
      def bankRows(): Set[(Long, Long, String)] =
        EventStream.readMinhashBank(spark, bank, "doc_id")
          .as[(Long, Long, String)].collect().toSet
      def matchRows(): Set[(Long, Long)] =
        graft.ops.Manifest.read(spark, matches, "batch_id")
        .select(col("new_id"),
          col("stored_id")).as[(Long, Long)].collect().toSet
      // 1. drained bank ≡ one batch banding pass over all docs
      val whole = build(docs, "doc_id", "text", 3, 8)
        .as[(Long, Long, String)].collect().toSet
      assert(bankRows() == whole, s"bank≡batch failed for $idiom")
      // 2. matches = batch-1 docs colliding with batch-0 docs: doc 1
      // shares doc 2's text (identical signature); the unrelated docs
      // collide with nothing
      assert(matchRows() == Set((1L, 2L)), s"matches wrong for $idiom")
      // 3. fresh-checkpoint replay re-delivers both batches; partition
      // replacement + the strictly-earlier match prefix keep both
      // stores unchanged
      drain(s"$base/ckpt2")
      assert(bankRows() == whole)
      assert(matchRows() == Set((1L, 2L)))
    }
  }

  test("conversation bank stream: drained bank equals the batch " +
      "banding over rendered transcripts; matches equal the batch " +
      "cross-batch collision set; an identical re-upload always " +
      "collides; replay changes nothing (r14)") {
    import graft.ns.Dedup
    val base = Files.createTempDirectory("graft_s21_law").toString
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val turns = Seq(
      // conv 1 original; conv 3000001 byte-identical re-upload
      (1L, 0L, "user", "please summarize the quarterly report"),
      (1L, 1L, "assistant", "the report shows steady growth overall"),
      (3000001L, 0L, "user", "please summarize the quarterly report"),
      (3000001L, 1L, "assistant",
        "the report shows steady growth overall"),
      // conv 2 unrelated original; conv 3000002 edited twin of 1
      (2L, 0L, "user", "what is the capital of france"),
      (2L, 1L, "assistant", "paris is the capital of france"),
      (3000002L, 0L, "user",
        "hi please summarize the quarterly report"),
      (3000002L, 1L, "assistant",
        "the report shows steady growth overall"))
      .toDF("conversation_id", "turn_idx", "role", "content")
    Seq(0, 1).foreach { i =>
      val tmp = new java.io.File(base, s"tmp$i")
      val p = if (i == 0) col("conversation_id") < 3000000L
              else col("conversation_id") >= 3000000L
      turns.filter(p).coalesce(1).write.parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    val build: (DataFrame, String, String, Int, Int) => DataFrame =
      (batch, id, text, n, k) => Dedup.minhashBandRows(
        Dedup.conversationTranscripts(batch, id, "turn_idx", "role",
          "content"), id, text, n, k)
    val bank = s"$base/bank"; val matches = s"$base/matches"
    def drain(ckpt: String): Unit = {
      val stream = EventStream.fileSource(spark, srcDir.getPath,
        spark.read.parquet(srcDir.getPath).schema,
        maxFilesPerTrigger = 1)
      // same cap as the registered s21: buckets here hold at most 2
      // ids, so capped ≡ uncapped and the expected set below (raw
      // cross-batch collisions) is exact
      EventStream.startMinhashBankStream(stream, bank, matches,
        ckpt, "conversation_id", "transcript", n = 3,
        bandRows = build,
        matchBucketCap = Some(8)).awaitTermination()
    }
    drain(s"$base/ckpt")
    // 1. drained bank ≡ one batch banding pass over ALL conversations
    val whole = build(turns, "conversation_id", "transcript", 3, 8)
      .as[(Long, Long, String)].collect().toSet
    def bankRows(): Set[(Long, Long, String)] =
      EventStream.readMinhashBank(spark, bank, "conversation_id")
        .as[(Long, Long, String)].collect().toSet
    assert(bankRows() == whole)
    // 2. matches ≡ the batch-computed cross-batch collision set
    val b0 = build(turns.filter(col("conversation_id") < 3000000L),
      "conversation_id", "transcript", 3, 8)
    val b1 = build(turns.filter(col("conversation_id") >= 3000000L),
      "conversation_id", "transcript", 3, 8)
    val expected = b1.select(col("conversation_id").as("new_id"),
        col("band"), col("chunk"))
      .join(b0.select(col("conversation_id").as("stored_id"),
        col("band"), col("chunk")), Seq("band", "chunk"))
      .select(col("new_id"), col("stored_id")).distinct()
      .as[(Long, Long)].collect().toSet
    def matchRows(): Set[(Long, Long)] =
      graft.ops.Manifest.read(spark, matches, "batch_id")
        .select(col("new_id"),
        col("stored_id")).as[(Long, Long)].collect().toSet
    assert(matchRows() == expected)
    // an identical re-upload shares every signature chunk — it MUST
    // surface regardless of LSH banding luck
    assert(expected.contains((3000001L, 1L)))
    // 3. fresh-checkpoint replay changes neither store
    drain(s"$base/ckpt2")
    assert(bankRows() == whole)
    assert(matchRows() == expected)
  }

  test("audio near-dup bank (s23): every amplitude re-encode matches " +
      "its original (bit-identical fingerprint word), and unrelated " +
      "clips never exceed chance band collisions (r15)") {
    val out = SparkEntry.queries("s23_stream_audio_bank")(spark, sf)
      .as[(Long, Long)].collect().toSet
    // the planted re-encode law: clip i re-encoded at half level is
    // (1000+i) and MUST collapse onto i — all 40 of them
    (0L until 40L).foreach { i =>
      assert(out.contains((1000L + i, i)), s"re-encode $i lost")
    }
    // matches only flow new(batch 1) -> stored(batch 0): ids obey
    // the strictly-earlier-batch direction
    assert(out.forall { case (n, o) => n >= 1000L && o < 1000L })
  }

  test("manifest sink (s24) + table maintenance (s25): each " +
      "micro-batch is one atomic commit, fresh-checkpoint replay " +
      "publishes NO new versions, per-batch snapshots time-travel, " +
      "and maintenance (compact + checkpoint + vacuum) is " +
      "content-invisible while dropping superseded files (r15/r16)") {
    val out = Files.createTempDirectory("graft_s24_law").toFile
    val srcDir = new java.io.File(out, "src")
    srcDir.mkdirs()
    val rows = (0L until 20L).map(i => (i, s"src${i % 3}"))
    rows.toDF("doc_id", "source").filter(col("doc_id") < 10)
      .coalesce(1).write.parquet(s"${out.getPath}/tmp0")
    rows.toDF("doc_id", "source").filter(col("doc_id") >= 10)
      .coalesce(1).write.parquet(s"${out.getPath}/tmp1")
    Seq(0, 1).foreach { i =>
      val part = new java.io.File(out, s"tmp$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L): Unit
    }
    val root = s"${out.getPath}/table"
    def drain(ckpt: String): Unit =
      EventStream.startManifestSink(
        EventStream.fileSource(spark, srcDir.getPath,
          spark.read.parquet(srcDir.getPath).schema,
          maxFilesPerTrigger = 1),
        root, s"${out.getPath}/$ckpt").awaitTermination()
    drain("ckpt")
    assert(graft.ops.Manifest.currentVersion(spark, root) == 2L)
    def snapAll(v: Long): Set[Long] =
      graft.ops.Manifest.readAt(spark, root, "batch_id", v)
        .select("doc_id").as[Long].collect().toSet
    // per-batch time travel: v1 = batch 0 only, v2 = both
    assert(snapAll(1L) == (0L until 10L).toSet)
    assert(snapAll(2L) == (0L until 20L).toSet)
    // SAME-checkpoint replay: every batch key already committed →
    // NO new versions
    drain("ckpt")
    assert(graft.ops.Manifest.currentVersion(spark, root) == 2L)
    // keys carry the checkpoint identity (r18 — the Delta txnAppId
    // model; a second stream's batch numbers can never silently
    // short-circuit against this stream's)
    val keys = graft.ops.Manifest.listCommits(spark, root).map(_._2)
    assert(keys.forall(
      _.matches("batch_[A-Za-z0-9_\\-]+_[0-9a-f]+_b[01]")), keys)
    // a FRESH checkpoint re-commits (its own keys), REPLACING the
    // same-numbered batch_id partitions: content unchanged, old
    // versions untouched for pinned readers
    drain("ckpt2")
    assert(graft.ops.Manifest.currentVersion(spark, root) == 4L)
    assert(snapAll(2L) == (0L until 20L).toSet)
    assert(snapAll(4L) == (0L until 20L).toSet)

    // ---- s25 maintenance over the drained table (r16) ----
    val m = graft.ops.Manifest
    val before = m.read(spark, root, "batch_id")
      .select("doc_id").as[Long].collect().toSet
    m.commitCompact(spark, root, "batch_id", Seq("0", "1"),
      "maint"): Unit
    m.checkpoint(spark, root): Unit
    assert(m.vacuumManifests(spark, root, keepLast = 1) ==
      Seq(1L, 2L, 3L, 4L))
    val droppedKeys = m.vacuum(spark, root)
    // the superseded per-batch small-file dirs (BOTH checkpoints'
    // commits) are gone...
    assert(droppedKeys.size == 4 && droppedKeys.map(
      _.replaceAll(graft.ops.Manifest.NonceSuffixRe, ""))
      .forall(_.matches("batch_[A-Za-z0-9_\\-]+_[0-9a-f]+_b[01]")))
    // ...content is invisible to maintenance, replay keys survive
    // through the checkpointed log: a SAME-checkpoint re-drain
    // still publishes nothing
    assert(m.read(spark, root, "batch_id")
      .select("doc_id").as[Long].collect().toSet == before)
    assert(m.currentVersion(spark, root) == 5L)
    drain("ckpt2")
    assert(m.currentVersion(spark, root) == 5L)
    // old versions are past the retention floor now
    intercept[RuntimeException] { snapAll(1L) }
  }

  test("clickAttribution drained equals the batch range join") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val batchEv = Tables.normalizeTs(raw)
    val out = Files.createTempDirectory("graft_s05_law").toFile
    val srcDir = new java.io.File(out, "src")
    srcDir.mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
    val stream = Tables.normalizeTs(
      EventStream.fileSource(spark, srcDir.getPath, raw.schema))
    val q = EventStream.clickAttribution(stream)
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        col("click_id"), unix_micros(col("c_ts")).as("click_ts_us"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"${out.getPath}/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"${out.getPath}/j")
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"${out.getPath}/j")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val hourUs = 3600L * 1000000L
    val p = batchEv.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"))
      .withColumn("w_start_us", col("p_ts_us") - hourUs)
    val c = batchEv.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("click_ts_us"))
    val batch = graft.ops.TemporalJoin.rangeJoin(p, c,
      keys = Seq("user_id" -> "c_user_id"),
      startCol = "w_start_us", endCol = "p_ts_us",
      pointCol = "click_ts_us", binSize = hourUs)
      .select(col("purchase_id"), col("user_id"), col("p_ts_us"),
        col("click_id"), col("click_ts_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size} pairs")
    org.apache.commons.io.FileUtils.deleteQuietly(out)
  }

  test("adaptiveStatePartitions: input-derived with a parallelism " +
    "floor and cap; tuned session isolates the choice") {
    val base = Files.createTempDirectory("graft_asp").toFile
    base.deleteOnExit()
    val f = new java.io.File(base, "data.bin")
    val bytes = Array.fill[Byte](1 << 20)(7) // 1 MiB
    java.nio.file.Files.write(f.toPath, bytes)
    val par = spark.sparkContext.defaultParallelism
    // tiny source vs a large target: the floor holds
    assert(EventStream.adaptiveStatePartitions(spark, base.getPath,
      targetBytesPerPartition = 1L << 30) == math.min(4, par))
    // input-derived growth: 1 MiB at a 64 KiB target = 16 partitions
    assert(EventStream.adaptiveStatePartitions(spark, base.getPath,
      targetBytesPerPartition = 64L << 10) == math.min(16, par * 16))
    // cap: a 1-byte target cannot exceed 16x the parallelism
    assert(EventStream.adaptiveStatePartitions(spark, base.getPath,
      targetBytesPerPartition = 1L) == par * 16)
    // the choice lands in a CHILD session; the parent conf is untouched
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = EventStream.tunedStreamSession(spark, base.getPath)
    assert(ss ne spark)
    assert(ss.conf.get("spark.sql.shuffle.partitions") ==
      math.min(4, par).toString)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
