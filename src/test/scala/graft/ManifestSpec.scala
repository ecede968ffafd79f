package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Manifest

/** Snapshot-commit-layer laws (r14 verdict missing #1): atomic
  * multi-partition publish (a reader NEVER sees a partial commit),
  * snapshot-isolated reads + time travel, replay idempotence, and
  * partition-grain optimistic concurrency (blind replaces rebase;
  * read-modify-write commits conflict-detect). */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alpha", 10L), (2L, "beta", 10L), (3L, "gamma", 20L),
    (4L, "delta", 20L), (5L, "epsilon", 30L))
    .toDF("id", "name", "part")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_manifest_spec").toString + "/t"

  private def snap(root: String, v: Long = -1L): Set[(Long, String, Long)] = {
    val version = if (v < 0) Manifest.currentVersion(spark, root) else v
    Manifest.readAt(spark, root, "part", version)
      .select(col("id"), col("name"), col("part").cast("long"))
      .as[(Long, String, Long)].collect().toSet
  }

  /** Data keys are `<commitKey>__<8-hex attempt nonce>` (r16); laws
    * about commit OWNERSHIP compare the stripped key. */
  private def stripNonce(k: String): String =
    k.replaceAll(Manifest.NonceSuffixRe, "")

  test("init commit + readback; version increments per commit") {
    val root = freshRoot()
    assert(Manifest.currentVersion(spark, root) == 0L)
    assert(Manifest.commitReplacePartitions(base, root, "part",
      "init") == 1L)
    assert(Manifest.currentVersion(spark, root) == 1L)
    assert(snap(root) == base.as[(Long, String, Long)].collect().toSet)
  }

  test("atomic multi-partition publish: staged-but-unpublished data " +
      "is invisible — a reader never sees a partial commit") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // simulate a writer that died mid-commit: data staged under a
    // new key, no manifest published (stage is private; writing the
    // directory directly reproduces its on-disk effect)
    Seq((9L, "ghost", 10L), (10L, "ghost2", 40L))
      .toDF("id", "name", "part")
      .write.partitionBy("part").parquet(s"$root/data/crashed")
    assert(Manifest.currentVersion(spark, root) == 1L)
    assert(snap(root) == base.as[(Long, String, Long)].collect().toSet,
      "reader resolved data not referenced by any manifest")
  }

  test("replace-partitions commit: only the partitions present are " +
      "replaced; others untouched; time travel sees the old rows") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    val v2 = Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L), (6L, "zeta", 10L))
        .toDF("id", "name", "part"),
      root, "part", "fix_p10")
    assert(v2 == 2L)
    assert(snap(root) == Set(
      (1L, "alpha_v2", 10L), (6L, "zeta", 10L),
      (3L, "gamma", 20L), (4L, "delta", 20L), (5L, "epsilon", 30L)))
    // snapshot isolation: version 1 still reads the ORIGINAL rows
    assert(snap(root, 1L) ==
      base.as[(Long, String, Long)].collect().toSet)
  }

  test("replay idempotence: re-committing an already-committed key " +
      "returns its version, publishes nothing, rewrites nothing") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L)).toDF("id", "name", "part"),
      root, "part", "fix_p10")
    val before = snap(root)
    // replay with DIFFERENT data under the same key: must be a no-op
    // (the key says "this logical commit already ran")
    val v = Manifest.commitReplacePartitions(
      Seq((99L, "evil", 10L)).toDF("id", "name", "part"),
      root, "part", "fix_p10")
    assert(v == 2L)
    assert(Manifest.currentVersion(spark, root) == 2L)
    assert(snap(root) == before)
  }

  test("commitMerge: update/insert/keep semantics under snapshot " +
      "isolation; emptied-by-delete partitions leave the manifest " +
      "but remain time-travelable") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    Manifest.commitMerge(
      Seq((1L, "alpha_v2", 10L), (6L, "zeta", 10L))
        .toDF("id", "name", "part"),
      root, Seq("id"), "part", "merge1")
    assert(snap(root) == Set(
      (1L, "alpha_v2", 10L), (2L, "beta", 10L), (6L, "zeta", 10L),
      (3L, "gamma", 20L), (4L, "delta", 20L), (5L, "epsilon", 30L)))
    // takedown: delete BOTH rows of part=20 (partition empties) and
    // one row of part=10
    Manifest.commitDelete(
      Seq((3L, 20L), (4L, 20L), (2L, 10L)).toDF("id", "part"),
      root, Seq("id"), "part", "takedown1")
    assert(snap(root) == Set(
      (1L, "alpha_v2", 10L), (6L, "zeta", 10L), (5L, "epsilon", 30L)))
    // the emptied partition is GONE from the live manifest...
    val live = Manifest.readManifest(spark, root,
      Manifest.currentVersion(spark, root))
      .select("partition").as[String].collect().toSet
    assert(live == Set("10", "30"))
    // ...but history is intact: version 2 (pre-takedown) still
    // shows part=20
    assert(snap(root, 2L).exists(_._3 == 20L))
    assert(snap(root, 1L) == base.as[(Long, String, Long)].collect().toSet)
  }

  test("optimistic concurrency: a read-modify-write commit raises " +
      "when a partition it read was replaced DURING its commit " +
      "window; a blind replace in the same window rebases instead; " +
      "a disjoint-partition race is not a conflict") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // interleave via the publish seam: a competing writer lands a
    // replace of part=10 inside writer A's commit window (after A
    // read part=10 from v1, before A's manifest CAS). One-shot so
    // the competing commit's own publish doesn't recurse.
    def interleave(body: => Unit): Unit = {
      var fired = false
      Manifest.onPublishAttempt = () => {
        if (!fired) { fired = true; body }
      }
    }
    try {
      // conflict case: A merges part=10 while B replaces part=10
      interleave {
        Manifest.commitReplacePartitions(
          Seq((1L, "alpha_B", 10L)).toDF("id", "name", "part"),
          root, "part", "writer_b")
      }
      val ex = intercept[Manifest.ConcurrentCommitException] {
        Manifest.commitMerge(
          Seq((1L, "alpha_A", 10L)).toDF("id", "name", "part"),
          root, Seq("id"), "part", "writer_a")
      }
      assert(ex.getMessage.contains("partition 10"))
      assert(snap(root).contains((1L, "alpha_B", 10L)),
        "the winner's replace must be live")
      // the caller's documented recovery: replay against the
      // current snapshot under a NEW key — now clean
      Manifest.onPublishAttempt = () => ()
      Manifest.commitMerge(
        Seq((1L, "alpha_A", 10L)).toDF("id", "name", "part"),
        root, Seq("id"), "part", "writer_a_retry")
      assert(snap(root).contains((1L, "alpha_A", 10L)))

      // blind-replace race: C replaces part=30 while D replaces
      // part=10 in C's window — C REBASES over D, both land
      interleave {
        Manifest.commitReplacePartitions(
          Seq((1L, "alpha_D", 10L)).toDF("id", "name", "part"),
          root, "part", "writer_d")
      }
      Manifest.commitReplacePartitions(
        Seq((5L, "epsilon_v2", 30L)).toDF("id", "name", "part"),
        root, "part", "writer_c")
      assert(snap(root).contains((5L, "epsilon_v2", 30L)))
      assert(snap(root).contains((1L, "alpha_D", 10L)),
        "rebase must preserve the interleaved writer's partitions")

      // disjoint-partition RMW race: merge to part=30 while part=10
      // is replaced — the validated read set is per-partition, so no
      // conflict and both survive
      interleave {
        Manifest.commitReplacePartitions(
          Seq((1L, "alpha_E", 10L)).toDF("id", "name", "part"),
          root, "part", "writer_e")
      }
      Manifest.commitMerge(
        Seq((5L, "epsilon_v3", 30L)).toDF("id", "name", "part"),
        root, Seq("id"), "part", "writer_f")
      assert(snap(root).contains((5L, "epsilon_v3", 30L)))
      assert(snap(root).contains((1L, "alpha_E", 10L)))
    } finally Manifest.onPublishAttempt = () => ()
  }

  test("manifest is data: the live-entry DataFrame matches the " +
      "commit history, and every live dir belongs to the key that " +
      "last replaced its partition") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L)).toDF("id", "name", "part"),
      root, "part", "fix_p10")
    val m = Manifest.readManifest(spark, root, 2L)
      .as[(String, String, Long)].collect()
      .map(e => (e._1, stripNonce(e._2), e._3)).toSet
    assert(m == Set(("10", "fix_p10", 2L), ("20", "init", 1L),
      ("30", "init", 1L)))
    assert(Manifest.listCommits(spark, root) ==
      Seq((1L, "init"), (2L, "fix_p10")))
  }

  test("the manifest CAS: the SECOND writer of one version FAILS and " +
      "the first writer's manifest is untouched (r15 self-review — " +
      "RawLocalFileSystem.rename silently REPLACES an existing " +
      "destination, so the local scheme must publish via link(2))") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // two writers race to publish version 2 directly at the CAS
    assert(Manifest.writeEntriesAtomic(spark, root, 2L, "winner",
      Seq(Manifest.Entry("10", "winner", 2L))))
    assert(!Manifest.writeEntriesAtomic(spark, root, 2L, "loser",
      Seq(Manifest.Entry("10", "loser", 2L))),
      "second publish of v2 must fail the CAS")
    // exactly one v2 manifest, the winner's, content intact
    assert(Manifest.listCommits(spark, root) ==
      Seq((1L, "init"), (2L, "winner")))
    val m = Manifest.readManifest(spark, root, 2L)
      .select("data_key").as[String].collect().toSet
    assert(m == Set("winner"))
  }

  test("commitMerge into ONLY-new partitions is a pure insert, not a " +
      "silent drop; a partition CREATED concurrently with a merge " +
      "that touches it conflicts instead of double-listing (r15 " +
      "review findings #1/#2)") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // all-new-partition merge: every row lands
    Manifest.commitMerge(
      Seq((7L, "eta", 40L), (8L, "theta", 50L))
        .toDF("id", "name", "part"),
      root, Seq("id"), "part", "insert_new")
    assert(snap(root).contains((7L, "eta", 40L)))
    assert(snap(root).contains((8L, "theta", 50L)))
    // concurrent creation of a touched-but-absent partition: writer
    // A merges into (live 10, NEW 60); B creates 60 inside A's
    // commit window — A must conflict, never publish two live
    // entries for partition 60
    var fired = false
    Manifest.onPublishAttempt = () => {
      if (!fired) {
        fired = true
        Manifest.commitReplacePartitions(
          Seq((90L, "interloper", 60L)).toDF("id", "name", "part"),
          root, "part", "writer_b60")
      }
    }
    try {
      val ex = intercept[Manifest.ConcurrentCommitException] {
        Manifest.commitMerge(
          Seq((1L, "alpha_m", 10L), (91L, "mine", 60L))
            .toDF("id", "name", "part"),
          root, Seq("id"), "part", "writer_a60")
      }
      assert(ex.getMessage.contains("partition 60"))
      // exactly ONE live entry for partition 60 (the interloper's)
      val live60 = Manifest.readManifest(spark, root,
          Manifest.currentVersion(spark, root))
        .filter(col("partition") === "60")
        .select("data_key").as[String].collect().toSeq.map(stripNonce)
      assert(live60 == Seq("writer_b60"))
      assert(snap(root).contains((90L, "interloper", 60L)))
    } finally Manifest.onPublishAttempt = () => ()
  }

  test("schema evolution through commits (r15): a later commit's new " +
      "column null-fills history in the snapshot read; time travel " +
      "still reads the original shape") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L, "x")).toDF("id", "name", "part", "tag"),
      root, "part", "add_tag_p10")
    val latest = Manifest.read(spark, root, "part")
    assert(latest.columns.toSet == Set("id", "name", "part", "tag"))
    val rows = latest
      .select(col("id"), col("tag"), col("part").cast("long"))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(rows.contains((1L, Some("x"), 10L)))
    assert(rows.contains((3L, None, 20L)), "history not null-filled")
    // time travel: v1 keeps the ORIGINAL 3-column shape
    assert(Manifest.readAt(spark, root, "part", 1L).columns.toSet ==
      Set("id", "name", "part"))
  }

  test("vacuum removes crash garbage (staged-never-published dirs, " +
      "tmp manifests) and NOTHING referenced — every historical " +
      "snapshot still reads after; idempotent (r15)") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L)).toDF("id", "name", "part"),
      root, "part", "fix_p10")
    // simulate a crashed writer: staged data, no manifest
    Seq((9L, "ghost", 10L)).toDF("id", "name", "part")
      .write.partitionBy("part").parquet(s"$root/data/crashed_run")
    val removed = Manifest.vacuum(spark, root)
    assert(removed == Seq("crashed_run"))
    // every version still reads, bit-identically
    assert(snap(root, 1L) == base.as[(Long, String, Long)].collect().toSet)
    assert(snap(root, 2L).contains((1L, "alpha_v2", 10L)))
    // idempotent: nothing left to remove
    assert(Manifest.vacuum(spark, root).isEmpty)
  }

  test("commit keys and partition values are validated path-safe") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      Manifest.commitReplacePartitions(base, root, "part", "bad key!")
    }
    intercept[IllegalArgumentException] {
      Manifest.commitReplacePartitions(
        Seq((1L, "x", "we ird")).toDF("id", "name", "part"),
        root, "part", "ok_key")
    }
  }

  test("same-key concurrent race (r15 ADVICE): a run of commitKey K " +
      "that stages while ANOTHER run of K publishes never mutates " +
      "the winner's published files — it replays to the winner's " +
      "version and its own staging is vacuumable garbage") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // writer B (same key, DIFFERENT data — a speculative retry with
    // a revised upstream) runs a FULL stage+publish inside writer
    // A's pre-stage window
    var fired = false
    Manifest.onStageStart = () => {
      if (!fired) {
        fired = true
        Manifest.commitReplacePartitions(
          Seq((1L, "winner", 10L)).toDF("id", "name", "part"),
          root, "part", "retry_k")
      }
    }
    try {
      val v = Manifest.commitReplacePartitions(
        Seq((1L, "loser", 10L)).toDF("id", "name", "part"),
        root, "part", "retry_k")
      assert(v == 2L, "the second run must replay to the winner's version")
      // the winner's published data is untouched by the loser's stage
      assert(snap(root).contains((1L, "winner", 10L)))
      assert(!snap(root).exists(_._2 == "loser"))
      // the loser's staged directory is unreferenced → vacuumable;
      // after vacuum the snapshot still reads bit-identically
      val removed = Manifest.vacuum(spark, root)
      assert(removed.size == 1 && stripNonce(removed.head) == "retry_k")
      assert(snap(root).contains((1L, "winner", 10L)))
    } finally Manifest.onStageStart = () => ()
  }

  test("checkpoint rolls the log: resolve cost is O(1 + commits " +
      "since checkpoint) file reads; vacuumed manifests keep a " +
      "retention floor; time travel works at checkpoint versions " +
      "and raises PAST the floor (r15 verdict #3)") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "c1")
    (2 to 6).foreach { i =>
      Manifest.commitReplacePartitions(
        Seq((i.toLong, s"row$i", 10L)).toDF("id", "name", "part"),
        root, "part", s"c$i")
    }
    assert(Manifest.checkpoint(spark, root) == 6L)
    // two more commits after the checkpoint
    (7 to 8).foreach { i =>
      Manifest.commitReplacePartitions(
        Seq((i.toLong, s"row$i", 20L)).toDF("id", "name", "part"),
        root, "part", s"c$i")
    }
    val fullLog = (1 to 8).map(i => i.toLong -> s"c$i")
    assert(Manifest.listCommits(spark, root) == fullLog)
    // O(1)-reads law: after the checkpoint, a listCommits resolve
    // reads 1 checkpoint + the 2 post-checkpoint manifests — never
    // one file per historical commit
    Manifest.metaReads.set(0L)
    Manifest.listCommits(spark, root)
    assert(Manifest.metaReads.get() == 3L,
      s"resolve paid ${Manifest.metaReads.get()} file reads, want 3")
    // vacuum manifests to the floor: keepLast=2 keeps v7, v8 files
    assert(Manifest.vacuumManifests(spark, root, keepLast = 2) ==
      (1L to 6L))
    // everything still resolves: history via the checkpoint, latest
    // via the kept manifests
    assert(Manifest.listCommits(spark, root) == fullLog)
    assert(snap(root).contains((8L, "row8", 20L)))
    // time travel at the CHECKPOINT version still reads (its live
    // entries are in the checkpoint file): partition 10 from c6's
    // wholesale replace, partitions 20/30 still from c1
    assert(snap(root, 6L) == Set((6L, "row6", 10L),
      (3L, "gamma", 20L), (4L, "delta", 20L), (5L, "epsilon", 30L)))
    // ...and a version past the floor raises the documented error
    val ex = intercept[RuntimeException] { snap(root, 3L) }
    assert(ex.getMessage.contains("vacuumed"))
    // data vacuum after manifest vacuum drops exactly the data keys
    // no remaining manifest/checkpoint references: c2..c5's
    // partition-10 rewrites are unreachable once v1..v6 resolve only
    // through the checkpoint; c1 stays (partitions 20/30 at v6 and
    // partition 30 at v7/v8 still live from it), c6..c8 stay
    val dropped = Manifest.vacuum(spark, root).map(stripNonce)
    assert(dropped.toSet == Set("c2", "c3", "c4", "c5"))
    assert(snap(root, 6L).contains((6L, "row6", 10L)))
    assert(snap(root).contains((8L, "row8", 20L)))
  }

  test("auto-checkpoint cadence: every checkpointEvery-th publish " +
      "rolls a checkpoint without being asked") {
    val root = freshRoot()
    val old = Manifest.checkpointEvery
    Manifest.checkpointEvery = 2L
    try {
      (1 to 5).foreach { i =>
        Manifest.commitReplacePartitions(
          Seq((i.toLong, s"r$i", 10L)).toDF("id", "name", "part"),
          root, "part", s"a$i")
      }
      val ckpts = new java.io.File(s"$root/manifests").listFiles()
        .map(_.getName).filter(_.startsWith("ckpt_")).sorted.toSeq
      assert(ckpts == Seq("ckpt_v00000002.json", "ckpt_v00000004.json"))
      Manifest.metaReads.set(0L)
      assert(Manifest.listCommits(spark, root).size == 5)
      assert(Manifest.metaReads.get() == 2L) // ckpt_v4 + v5's manifest
    } finally Manifest.checkpointEvery = old
  }

  test("commitCompact (r15 verdict #4): fragmented partitions " +
      "rewrite to ONE file each, content-identical; a reader racing " +
      "the compaction resolves the old snapshot whole; time travel " +
      "still reads the fragmented version") {
    val root = freshRoot()
    // plant fragmentation: 8 files across 2 partitions, published v1
    base.repartition(8)
      .write.partitionBy("part").parquet(s"$root/data/frag")
    assert(Manifest.writeEntriesAtomic(spark, root, 1L, "frag",
      Seq("10", "20", "30").map(Manifest.Entry(_, "frag", 1L))))
    def files(dataKey: String, part: String): Int =
      Option(new java.io.File(s"$root/data/$dataKey/part=$part")
        .listFiles()).map(_.count(_.getName.endsWith(".parquet")))
        .getOrElse(0)
    assert(Seq("10", "20", "30").map(files("frag", _)).sum > 3,
      "fixture must actually be fragmented")
    val before = snap(root)
    // racing reader: mid-publish, the table still reads v1 whole
    var seen: Option[Set[(Long, String, Long)]] = None
    Manifest.onPublishAttempt = () =>
      if (seen.isEmpty) seen = Some(snap(root))
    try {
      val v = Manifest.commitCompact(spark, root, "part",
        Seq("10", "20", "30"), "compact_1")
      assert(v == 2L)
    } finally Manifest.onPublishAttempt = () => ()
    assert(seen.contains(before),
      "a reader during the compaction window must see the OLD snapshot")
    assert(snap(root) == before, "compaction must not change content")
    // one file per partition after the rewrite
    val m = Manifest.readManifest(spark, root, 2L)
      .as[(String, String, Long)].collect()
    assert(m.forall(e => stripNonce(e._2) == "compact_1"))
    m.foreach { case (p, dataKey, _) =>
      assert(files(dataKey, p) == 1, s"partition $p not compacted") }
    // time travel: v1 still reads the fragmented files
    assert(snap(root, 1L) == before)
    // compacting absent partitions is a no-op
    assert(Manifest.commitCompact(spark, root, "part", Seq("99"),
      "compact_nothing") == 2L)
  }

  test("commitMerge on an EVOLVED table (r15 ADVICE): touched " +
      "partitions spanning pre- and post-evolution data keys merge " +
      "with union-schema null-fill instead of throwing; delta-only " +
      "columns grow the schema") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init")
    // evolve partition 10 only: new column `tag`
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L, "x")).toDF("id", "name", "part", "tag"),
      root, "part", "evolve_p10")
    // merge a delta WITHOUT `tag` spanning evolved p10 and legacy p20
    Manifest.commitMerge(
      Seq((1L, "alpha_m", 10L), (7L, "eta", 20L))
        .toDF("id", "name", "part"),
      root, Seq("id"), "part", "merge_legacy_delta")
    val rows = Manifest.read(spark, root, "part")
      .select(col("id"), col("name"), col("tag"),
        col("part").cast("long"))
      .as[(Long, String, Option[String], Long)].collect().toSet
    assert(rows.contains((1L, "alpha_m", None, 10L)), // delta won, tag nulled
      rows.toString)
    assert(rows.contains((7L, "eta", None, 20L)))   // insert into legacy
    assert(rows.contains((3L, "gamma", None, 20L))) // kept legacy row
    // a delta carrying a NEW column grows the schema ONLY with the
    // explicit opt-in (r16 review: the silent default turned a
    // misspelled delta column into a junk table column plus a real
    // column nulled on every merged row)
    val typo = intercept[IllegalArgumentException] {
      Manifest.commitMerge(
        Seq((5L, "epsilon_v2", 30L, 7L))
          .toDF("id", "name", "part", "score"),
        root, Seq("id"), "part", "merge_new_col")
    }
    assert(typo.getMessage.contains("evolveSchema"))
    Manifest.commitMerge(
      Seq((5L, "epsilon_v2", 30L, 7L)).toDF("id", "name", "part", "score"),
      root, Seq("id"), "part", "merge_new_col", evolveSchema = true)
    val withScore = Manifest.read(spark, root, "part")
      .select(col("id"), col("score"), col("part").cast("long"))
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(withScore.contains((5L, Some(7L), 30L)))
    assert(withScore.contains((1L, None, 10L)))
  }

  test("commitMerge preserveTargetColumns (r16 ADVICE #1): an old " +
      "producer's delta without the evolved column keeps matched " +
      "rows' values (updateAll semantics) instead of nulling them") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha", 10L, "keep_me"), (2L, "beta", 10L, "mine"),
        (3L, "gamma", 20L, "hers"))
        .toDF("id", "name", "part", "tag"), root, "part", "init")
    // delta WITHOUT `tag`: update id=1, insert id=7
    Manifest.commitMerge(
      Seq((1L, "alpha_m", 10L), (7L, "eta", 20L))
        .toDF("id", "name", "part"),
      root, Seq("id"), "part", "old_producer",
      preserveTargetColumns = true)
    val rows = Manifest.read(spark, root, "part")
      .select(col("id"), col("name"), col("tag"),
        col("part").cast("long"))
      .as[(Long, String, Option[String], Long)].collect().toSet
    assert(rows == Set(
      (1L, "alpha_m", Some("keep_me"), 10L), // updated, tag PRESERVED
      (2L, "beta", Some("mine"), 10L),       // untouched
      (3L, "gamma", Some("hers"), 20L),      // untouched
      (7L, "eta", None, 20L)),               // true insert: no value
      rows.toString)
  }

  test("commitMerge never NARROWS a widened table (r16 review): an " +
      "int-typed delta over a long-widened column keeps kept rows' " +
      "long values intact and the result stays long") {
    val root = freshRoot()
    import org.apache.spark.sql.types._
    // table widened to long ids, with a value only a long can hold
    Manifest.commitReplacePartitions(
      Seq((5_000_000_000L, "big", 10), (7L, "small", 10))
        .toDF("id", "name", "part"),
      root, "part", "init_long")
    // a lagging producer still emits int ids
    val delta = Seq((7, "small_v2", 10)).toDF("id", "name", "part")
    assert(delta.schema("id").dataType == IntegerType)
    Manifest.commitMerge(delta, root, Seq("id"), "part", "narrow_delta")
    val out = Manifest.read(spark, root, "part")
    assert(out.schema("id").dataType == LongType, out.schema.simpleString)
    val rows = out.select(col("id"), col("name"))
      .as[(Long, String)].collect().toSet
    assert(rows == Set((5_000_000_000L, "big"), (7L, "small_v2")),
      "the kept long row must survive unwrapped and the int delta " +
        "row must match its long target key")
  }

  test("type WIDENING through snapshots (r15 verdict #7): int → " +
      "long and decimal precision resolve to the widest type in the " +
      "snapshot read; time travel keeps each version's own shape") {
    val root = freshRoot()
    import org.apache.spark.sql.types._
    Manifest.commitReplacePartitions(
      Seq((1, 10)).toDF("id", "part")
        .select(col("id").cast("int").as("id"), col("part")),
      root, "part", "narrow")
    Manifest.commitReplacePartitions(
      Seq((2L, 20)).toDF("id", "part"),
      root, "part", "wide")
    val latest = Manifest.read(spark, root, "part")
    assert(latest.schema("id").dataType == LongType,
      latest.schema.simpleString)
    assert(latest.select(col("id")).as[Long].collect().toSet ==
      Set(1L, 2L))
    // time travel: v1 keeps its own narrow shape
    assert(Manifest.readAt(spark, root, "part", 1L)
      .schema("id").dataType == IntegerType)
    // decimal precision carry: (10,2) ∪ (38,9) reads as (38,9)
    val root2 = freshRoot()
    Manifest.commitReplacePartitions(
      Seq(("1.50", 10)).toDF("v", "part")
        .select(col("v").cast("decimal(10,2)").as("v"), col("part")),
      root2, "part", "d1")
    Manifest.commitReplacePartitions(
      Seq(("2.123456789", 20)).toDF("v", "part")
        .select(col("v").cast("decimal(38,9)").as("v"), col("part")),
      root2, "part", "d2")
    val dec = Manifest.read(spark, root2, "part")
    assert(dec.schema("v").dataType == DecimalType(38, 9),
      dec.schema.simpleString)
    assert(dec.select(col("v").cast("string")).as[String].collect()
      .toSet == Set("1.500000000", "2.123456789"))
  }

  test("change feed + incremental read (r16): changesSince reports " +
      "exactly the replaced/added/removed partitions; " +
      "readChangedSince reads ONLY rewritten partitions' rows and " +
      "returns an empty frame when nothing changed") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init") // v1
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L), (7L, "eta", 40L))
        .toDF("id", "name", "part"), root, "part", "fix") // v2: 10 repl, 40 added
    Manifest.commitDelete(Seq((5L, 30L)).toDF("id", "part"),
      root, Seq("id"), "part", "drop30") // v3: 30 emptied
    val feed = Manifest.changesSince(spark, root, 1L)
      .as[(String, String, Option[Long])].collect().toSet
    assert(feed == Set(("10", "replaced", Some(2L)),
      ("40", "added", Some(2L)), ("30", "removed", None)))
    // data half: rows of rewritten live partitions only (10 and 40)
    val rows = Manifest.readChangedSince(spark, root, "part", 1L)
      .select(col("id"), col("part").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L), (7L, 40L)))
    // sync point = current: empty feed, empty frame, schema intact
    assert(Manifest.changesSince(spark, root, 3L).isEmpty)
    val none = Manifest.readChangedSince(spark, root, "part", 3L)
    assert(none.isEmpty && none.columns.contains("name"))
  }

  test("layout-only rewrites are change-feed-invisible (r16 ADVICE " +
      "#3): after whole-table compaction, changesSince reports " +
      "'rewritten' (not 'replaced') and readChangedSince reads " +
      "NOTHING — an incremental consumer pays zero for maintenance") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init") // v1
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L)).toDF("id", "name", "part"),
      root, "part", "fix10") // v2
    // consumer syncs at v2, then whole-table maintenance runs
    Manifest.commitCompact(spark, root, "part",
      Seq("10", "20", "30"), "maint") // v3: identity rewrite
    val feed = Manifest.changesSince(spark, root, 2L)
      .as[(String, String, Option[Long])].collect().toSet
    assert(feed == Set(("10", "rewritten", Some(2L)),
      ("20", "rewritten", Some(1L)), ("30", "rewritten", Some(1L))),
      s"got $feed")
    assert(Manifest.readChangedSince(spark, root, "part", 2L).isEmpty,
      "layout-only rewrites must not be re-read")
    // but a consumer synced BEFORE the last logical change still
    // sees partition 10 as replaced (content DID change at v2)
    val old = Manifest.changesSince(spark, root, 1L)
      .as[(String, String, Option[Long])].collect().toSet
    assert(old == Set(("10", "replaced", Some(2L)),
      ("20", "rewritten", Some(1L)), ("30", "rewritten", Some(1L))))
    assert(Manifest.readChangedSince(spark, root, "part", 1L)
      .select(col("part").cast("long")).as[Long].collect().toSet ==
      Set(10L))
    // content identical through it all (fix10 replaced partition 10
    // wholesale: alpha and beta gave way to alpha_v2)
    assert(Manifest.read(spark, root, "part")
      .select(col("name")).as[String].collect().toSet ==
      Set("alpha_v2", "gamma", "delta", "epsilon"))
  }

  test("compaction with a Z-order layout (r16): rows inside each " +
      "rewritten file are sorted by the interleaved key; content " +
      "identical") {
    val root = freshRoot()
    val rows = (0L until 64L).map(i => (i, (i * 37) % 64, 10L))
    rows.toDF("x", "y", "part").repartition(8)
      .write.partitionBy("part").parquet(s"$root/data/frag")
    assert(Manifest.writeEntriesAtomic(spark, root, 1L, "frag",
      Seq(Manifest.Entry("10", "frag", 1L))))
    Manifest.commitCompact(spark, root, "part", Seq("10"), "zrw",
      sortWithin = Seq(graft.ops.ZOrder.zValue(col("x"), col("y"))))
    val snap2 = Manifest.read(spark, root, "part")
      .select(col("x"), col("y")).as[(Long, Long)].collect().toSet
    assert(snap2 == rows.map(r => (r._1, r._2)).toSet)
    // the single rewritten file holds rows in z order
    val dataKey = Manifest.readManifest(spark, root, 2L)
      .select("data_key").as[String].collect().head
    val files = new java.io.File(s"$root/data/$dataKey/part=10")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val inFile = spark.read.parquet(files.head.getPath)
      .select(graft.ops.ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(inFile.sameElements(inFile.sorted),
      "rows in the rewritten file must be in z order")
  }

  test("row-grain change feed (o26, r17): keyed diff within changed " +
      "partitions only — unchanged rider rows absent, inserts carry " +
      "postimages, deletes preimages, layout rewrites invisible, " +
      "full-outer oracle equality") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(base, root, "part", "init") // v1
    // v2 replaces partition 10 WHOLESALE: alpha updated, beta kept
    // IDENTICAL (the rider), zeta inserted
    Manifest.commitReplacePartitions(
      Seq((1L, "alpha_v2", 10L), (2L, "beta", 10L), (9L, "zeta", 10L))
        .toDF("id", "name", "part"), root, "part", "fix10")
    // v3 deletes id=5, emptying partition 30
    Manifest.commitDelete(Seq((5L, 30L)).toDF("id", "part"),
      root, Seq("id"), "part", "drop30")
    // v4: layout-only maintenance — must not appear in the feed
    Manifest.commitCompact(spark, root, "part", Seq("10", "20"),
      "maint")
    val feed = Manifest.changedRowsSince(spark, root, "part",
      Seq("id"), 1L)
      .select(col("id"), col("name"), col("part").cast("long"),
        col("_change"))
      .as[(Long, String, Long, String)].collect().toSet
    assert(feed == Set(
      (1L, "alpha_v2", 10L, "update"), // postimage
      (9L, "zeta", 10L, "insert"),     // postimage
      (5L, "epsilon", 30L, "delete")), // preimage
      feed.toString)
    // oracle shape: the full-outer diff of the two whole snapshots
    // must agree (the partition restriction is an optimization)
    val oldS = Manifest.readAt(spark, root, "part", 1L)
      .select(col("id"), col("name").as("old_name"))
    val newS = Manifest.read(spark, root, "part")
      .select(col("id"), col("name").as("new_name"))
    val oracle = newS.join(oldS, Seq("id"), "full_outer")
      .withColumn("_change",
        when(col("old_name").isNull, "insert")
          .when(col("new_name").isNull, "delete")
          .when(!(col("new_name") <=> col("old_name")), "update"))
      .filter(col("_change").isNotNull)
      .select(col("id"), col("_change"))
      .as[(Long, String)].collect().toSet
    assert(feed.map(r => (r._1, r._4)) == oracle)
    // schema evolution across the diff: a column added after the
    // sync point null-fills the old side and still diffs correctly
    Manifest.commitReplacePartitions(
      Seq((3L, "gamma", 20L, "x")).toDF("id", "name", "part", "tag"),
      root, "part", "evolve20") // v5
    val evolved = Manifest.changedRowsSince(spark, root, "part",
      Seq("id"), 4L)
      .select(col("id"), col("tag"), col("_change"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(evolved == Set((3L, Some("x"), "update"),
      (4L, None, "delete")), // delta replaced p20 wholesale: delta out
      evolved.toString)
  }

  test("manifest column stats prune the SCAN, not just row groups " +
      "(r16 verdict missing #3): readWhere with a selective predicate " +
      "touches files only in may-match partitions, returns exactly " +
      "filter()'s rows, and stats survive checkpoint round-trips") {
    val root = freshRoot()
    // id ranges are disjoint per partition: p10 → ids 0-9,
    // p20 → 100-109, p30 → 200-209
    val rows = Seq(10L, 20L, 30L).flatMap(p =>
      (0L until 10L).map(i => (p * 10 - 100 + i, s"n${p * 10 + i}", p)))
    Manifest.commitReplacePartitions(
      rows.toDF("id", "name", "part"), root, "part", "init",
      statsCols = Seq("id", "name"))
    def filesOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.toSet
    // selective numeric predicate: only partition 20 may match
    val pruned = Manifest.readWhere(spark, root, "part",
      col("id") >= 100L && col("id") < 110L)
    assert(filesOf(pruned).forall(_.contains("part=20")),
      s"pruned scan touched ${filesOf(pruned)}")
    val want = Manifest.read(spark, root, "part")
      .filter(col("id") >= 100L && col("id") < 110L)
      .select(col("id"), col("name"), col("part").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(pruned.select(col("id"), col("name"),
      col("part").cast("long"))
      .as[(Long, String, Long)].collect().toSet == want && want.size == 10)
    // the partition VALUE prunes even without recorded stats
    val byPart = Manifest.readWhere(spark, root, "part",
      col("part") === 30L)
    assert(filesOf(byPart).forall(_.contains("part=30")))
    assert(byPart.count() == 10L)
    // provably-empty predicate: no partition read at all
    val none = Manifest.readWhere(spark, root, "part",
      col("id") > 100000L)
    assert(none.isEmpty && none.columns.contains("name"))
    // string bounds prune too (ASCII names sort with the parquet scan)
    val s = Manifest.readWhere(spark, root, "part",
      col("name") === "n205")
    assert(filesOf(s).forall(_.contains("part=20")), filesOf(s).toString)
    // beyond-interval shapes fall back to a full scan, same rows
    val full = Manifest.readWhere(spark, root, "part",
      upper(col("name")) === "N205")
    assert(full.count() == 1L && filesOf(full).size == 3)
    // a comparison THROUGH A CAST stays opaque (r17 self-review: a
    // narrowing cast wraps, so pruning it against the original
    // bounds could drop matching partitions) — full scan, same rows
    val viaCast = Manifest.readWhere(spark, root, "part",
      col("id").cast("int") >= 200)
    assert(filesOf(viaCast).size == 3 && viaCast.count() == 10L)
    // stats survive the checkpoint round-trip: roll the log, drop the
    // manifest FILE so the read resolves through the checkpoint's own
    // entry lines, and prune from those
    Manifest.checkpoint(spark, root)
    assert(new java.io.File(s"$root/manifests/v00000001.json").delete())
    val viaCkpt = Manifest.readWhere(spark, root, "part",
      col("id") >= 200L)
    assert(filesOf(viaCkpt).forall(_.contains("part=30")))
    assert(viaCkpt.count() == 10L)
  }

  test("table pins are monotonic (r17 review): a delayed crash-retry " +
      "of an OLDER run cannot re-pin a newer completed run away; " +
      "allowRollback is the deliberate override") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_pins").toString
    val t1 = s"$base/weather"
    // run 1's table commit (v1), crash BEFORE its pin commit
    Manifest.commitReplacePartitions(
      Seq((1L, "a", 10L)).toDF("id", "name", "part"), t1, "part",
      "run1_weather")
    // run 2 completes fully: table v2, pins weather -> 2
    Manifest.commitReplacePartitions(
      Seq((2L, "b", 20L)).toDF("id", "name", "part"), t1, "part",
      "run2_weather")
    Manifest.commitTablePins(spark, base, Map("weather" -> 2L), "run2")
    assert(Manifest.tablePins(spark, base) == Map("weather" -> 2L))
    // run 1's delayed retry: its table commit short-circuits to v1,
    // and its pin request for v1 must NOT hide run 2's data
    val v = Manifest.commitReplacePartitions(
      Seq((1L, "a", 10L)).toDF("id", "name", "part"), t1, "part",
      "run1_weather")
    assert(v == 1L)
    Manifest.commitTablePins(spark, base, Map("weather" -> v), "run1")
    assert(Manifest.tablePins(spark, base) == Map("weather" -> 2L),
      "a stale retry must not roll the pin back")
    assert(Manifest.readPinned(spark, base, "weather", "part")
      .select(col("id")).as[Long].collect().toSet == Set(1L, 2L))
    // deliberate operator rollback is still possible, explicitly
    Manifest.commitTablePins(spark, base, Map("weather" -> 1L),
      "rollback_to_v1", allowRollback = true)
    assert(Manifest.tablePins(spark, base) == Map("weather" -> 1L))
    assert(Manifest.readPinned(spark, base, "weather", "part")
      .select(col("id")).as[Long].collect().toSet == Set(1L))
  }

  test("readWhere keeps readAt().filter()'s schema on EVOLVED tables " +
      "(r17 review): pruning away every partition of the only commit " +
      "carrying a column must not narrow the schema or break the " +
      "re-applied filter") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(
      Seq((1L, "a", 10L)).toDF("id", "name", "part"), root, "part",
      "init")
    // evolution commit adds `score` with recorded stats; its only
    // partition is provably outside the predicate below
    Manifest.commitReplacePartitions(
      Seq((2L, "b", 5L, 20L)).toDF("id", "name", "score", "part"),
      root, "part", "evolve", statsCols = Seq("score"))
    val out = Manifest.readWhere(spark, root, "part",
      col("score") > 100L)
    // schema parity: the evolved column survives the prune
    assert(out.columns.toSet == Set("id", "name", "score", "part"))
    assert(out.isEmpty) // no row has score > 100
    val want = Manifest.read(spark, root, "part")
      .filter(col("score") > 100L)
    assert(want.columns.toSet == out.columns.toSet && want.isEmpty)
    // and a predicate matching ONLY the old commit still answers
    // with the full union schema, score null-filled
    val old = Manifest.readWhere(spark, root, "part",
      col("part") === 10L)
    assert(old.columns.toSet == Set("id", "name", "score", "part"))
    assert(old.select(col("id"), col("score"))
      .as[(Long, Option[Long])].collect().toSet == Set((1L, None)))
  }

  test("the manifest CAS refuses schemes without an atomic " +
      "no-overwrite primitive (r15 ADVICE): object stores fail fast " +
      "instead of running with a broken CAS") {
    Manifest.requireCasCapable("file")
    Manifest.requireCasCapable("hdfs")
    val ex = intercept[IllegalArgumentException] {
      Manifest.requireCasCapable("s3a")
    }
    assert(ex.getMessage.contains("committer"))
  }

  test("pluggable CommitProtocol (r17 verdict missing #1): an object " +
      "store scheme is default-DENIED, and a registered conditional-" +
      "put protocol restores the CAS-loser-must-fail law on a store " +
      "whose native rename silently replaces") {
    import graft.ops.CommitProtocol
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockobj.impl", classOf[MockObjFileSystem].getName)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mockobj").toString
    val root = s"mockobj:$dir/t"
    // default deny: no protocol registered for mockobj → fail FAST
    val ex = intercept[IllegalArgumentException] {
      Manifest.commitReplacePartitions(base, root, "part", "init")
    }
    assert(ex.getMessage.contains("CommitProtocol"))
    // a conforming conditional-put committer (exists-check + publish
    // under one mutual exclusion — the JVM-wide stand-in for S3
    // If-None-Match / GCS ifGenerationMatch=0)
    object ConditionalPut extends CommitProtocol {
      private val mutex = new Object
      def publishAtomic(fs: org.apache.hadoop.fs.FileSystem,
          tmp: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean = mutex.synchronized {
        if (fs.exists(dst)) false else fs.rename(tmp, dst)
      }
    }
    CommitProtocol.register("mockobj", ConditionalPut)
    try {
      // the o17 gate shape, end-to-end through the plug
      assert(Manifest.commitReplacePartitions(base, root, "part",
        "init") == 1L)
      assert(snap(root) == base.as[(Long, String, Long)].collect().toSet)
      // CAS-loser-must-fail THROUGH the plug, on a store whose own
      // rename would have let both writers "win"
      assert(Manifest.writeEntriesAtomic(spark, root, 2L, "winner",
        Seq(Manifest.Entry("10", "winner", 2L))))
      assert(!Manifest.writeEntriesAtomic(spark, root, 2L, "loser",
        Seq(Manifest.Entry("10", "loser", 2L))),
        "second publish of v2 must fail the CAS through the protocol")
      assert(Manifest.readManifest(spark, root, 2L)
        .select("data_key").as[String].collect().toSet == Set("winner"))
      // the native rename really is broken (the protocol, not the
      // store, is what held the law above)
      val (fs0, _) = {
        val p = new org.apache.hadoop.fs.Path(root)
        (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      }
      val a = new org.apache.hadoop.fs.Path(s"$root/_probe_a")
      val b = new org.apache.hadoop.fs.Path(s"$root/_probe_b")
      fs0.create(a).close(); fs0.create(b).close()
      assert(fs0.rename(a, b), "mock object store must replace on rename")
    } finally CommitProtocol.unregister("mockobj")
  }

  test("date-partition pruning is typed (r17 ADVICE high + r18): a " +
      "canonically date-partitioned table prunes by value, the " +
      "non-canonical-literal trap reads instead of false-pruning, " +
      "and recorded pCol stats can never lexicographically prune") {
    val root = freshRoot()
    val rows = Seq(
      (1L, "a", "2024-01-05"), (2L, "b", "2024-01-05"),
      (3L, "c", "2024-01-06"), (4L, "d", "2024-02-01"))
      .toDF("id", "name", "dt")
    // statsCols DELIBERATELY includes the partition column — the r17
    // ADVICE trap: compute() records it as 'str' while the reader
    // compares under the partition-inferred DATE type
    Manifest.commitReplacePartitions(rows, root, "dt", "init",
      statsCols = Seq("id", "dt"))
    def filesOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("id")).as[Long].collect().toSet
    // canonical literal: prunes to one partition
    val canon = Manifest.readWhere(spark, root, "dt",
      col("dt") === "2024-01-06")
    assert(filesOf(canon).forall(_.contains("dt=2024-01-06")))
    assert(ids(canon) == Set(3L))
    // THE trap: non-canonical literal — Spark casts it to the same
    // date; lexicographic pruning would have dropped the partition
    val trap = Manifest.readWhere(spark, root, "dt",
      col("dt") === "2024-1-5")
    assert(ids(trap) == ids(Manifest.read(spark, root, "dt")
      .filter(col("dt") === "2024-1-5")))
    assert(ids(trap) == Set(1L, 2L), "non-canonical date literal lost rows")
    assert(filesOf(trap).forall(_.contains("dt=2024-01-05")),
      "the typed compare should still PRUNE, not just stay correct")
    // typed date literal prunes
    val lit = Manifest.readWhere(spark, root, "dt",
      col("dt") === org.apache.spark.sql.functions.lit(
        java.sql.Date.valueOf("2024-02-01")))
    assert(filesOf(lit).forall(_.contains("dt=2024-02-01")))
    assert(ids(lit) == Set(4L))
    // range predicates prune through the typed compare too
    val range = Manifest.readWhere(spark, root, "dt",
      col("dt") >= "2024-01-06")
    assert(ids(range) == Set(3L, 4L))
    assert(filesOf(range).forall(f =>
      f.contains("dt=2024-01-06") || f.contains("dt=2024-02-01")))
    // a MIXED table (one non-date value → string column at read time)
    // must disable date semantics entirely: equality on a
    // non-canonical literal matches nothing, and nothing is lost
    val root2 = freshRoot()
    Manifest.commitReplacePartitions(
      Seq((1L, "2024-01-05"), (2L, "foo")).toDF("id", "dt"),
      root2, "dt", "init")
    val mixed = Manifest.readWhere(spark, root2, "dt",
      col("dt") === "2024-1-5")
    assert(ids(mixed) == ids(Manifest.read(spark, root2, "dt")
      .filter(col("dt") === "2024-1-5")))
    assert(ids(Manifest.readWhere(spark, root2, "dt",
      col("dt") === "foo")) == Set(2L))
  }

  test("null-count + row-count stats (r17 verdict missing #4): IS " +
      "NULL / IS NOT NULL prune from recorded counts, and snapshot " +
      "count(*) answers from the manifest without touching data") {
    val root = freshRoot()
    val rows = Seq[(Long, Option[String], Long)](
      (1L, Some("a"), 10L), (2L, Some("b"), 10L), // no nulls
      (3L, Some("c"), 20L), (4L, None, 20L),      // some nulls
      (5L, None, 30L), (6L, None, 30L))           // ALL null
      .toDF("id", "name", "part")
    Manifest.commitReplacePartitions(rows, root, "part", "init",
      statsCols = Seq("name"))
    def filesOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.toSet
    // IS NULL: partition 10 recorded zero nulls → provably empty
    val isNull = Manifest.readWhere(spark, root, "part",
      col("name").isNull)
    assert(!filesOf(isNull).exists(_.contains("part=10")),
      s"IS NULL read a null-free partition: ${filesOf(isNull)}")
    assert(isNull.select(col("id")).as[Long].collect().toSet ==
      Set(4L, 5L, 6L))
    // IS NOT NULL: partition 30 is all-null (nulls == rows) → pruned
    val notNull = Manifest.readWhere(spark, root, "part",
      col("name").isNotNull)
    assert(!filesOf(notNull).exists(_.contains("part=30")),
      s"IS NOT NULL read an all-null partition: ${filesOf(notNull)}")
    assert(notNull.select(col("id")).as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    // comparisons on the all-null partition prune via its empty
    // interval (min > max sentinel), never crash
    val eq = Manifest.readWhere(spark, root, "part",
      col("name") === "zzz")
    assert(!filesOf(eq).exists(_.contains("part=30")))
    assert(eq.isEmpty)
    // count(*) from the manifest alone, matching the scan
    assert(Manifest.rowCountAt(spark, root) == Some(6L))
    assert(Manifest.read(spark, root, "part").count() == 6L)
    // still exact after a merge rewrites one partition
    Manifest.commitMerge(
      Seq((7L, Some("g"), 10L)).toDF("id", "name", "part"),
      root, Seq("id"), "part", "merge1")
    assert(Manifest.rowCountAt(spark, root) == Some(7L))
    assert(Manifest.read(spark, root, "part").count() == 7L)
    // and row counts survive the checkpoint round-trip
    Manifest.checkpoint(spark, root)
    val cv = Manifest.currentVersion(spark, root)
    (1L to cv).foreach(v =>
      new java.io.File(f"$root/manifests/v$v%08d.json").delete(): Unit)
    assert(Manifest.rowCountAt(spark, root) == Some(7L))
  }

  test("stats-pruning soundness edges (r18 review): unrenderable " +
      "min/max with nulls present must NOT read as all-null, and a " +
      "DATE literal must never compare against timestamp-micros " +
      "bounds") {
    val root = freshRoot()
    val long170 = "x" * 70 // > 64-char SafeValue cap: unrenderable
    val rows = Seq(
      (1L, Some(long170), Some(java.sql.Timestamp.valueOf(
        "2024-06-15 10:00:00")), 10L),
      (2L, Some("short"), Some(java.sql.Timestamp.valueOf(
        "2024-06-16 10:00:00")), 10L),
      (3L, None, None, 10L),
      (4L, Some("zz"), Some(java.sql.Timestamp.valueOf(
        "2024-07-01 00:00:00")), 20L))
      .toDF("id", "comment", "ts", "part")
    Manifest.commitReplacePartitions(rows, root, "part", "init",
      statsCols = Seq("comment", "ts"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("id")).as[Long].collect().toSet
    // partition 10's comment stats are UNRENDERABLE (70-char min or
    // max) AND it has a null — the all-null 'none' tag must not fire:
    // the matching 'short' row must survive
    assert(ids(Manifest.readWhere(spark, root, "part",
      col("comment") === "short")) == Set(2L),
      "unrenderable-bounds partition was falsely pruned")
    // null-count pruning still works from the opaque stat
    assert(ids(Manifest.readWhere(spark, root, "part",
      col("comment").isNull)) == Set(3L))
    // a DATE literal against the TIMESTAMP statsCol: Spark casts the
    // date up to a timestamp; comparing epoch DAYS against the
    // recorded epoch MICROS would prune everything
    val d = org.apache.spark.sql.functions.lit(
      java.sql.Date.valueOf("2024-06-16"))
    val got = Manifest.readWhere(spark, root, "part", col("ts") >= d)
    val want = Manifest.read(spark, root, "part").filter(col("ts") >= d)
    assert(ids(got) == ids(want) && ids(got).nonEmpty,
      "date-vs-timestamp compare lost rows")
  }

  test("changedRowsSince on a FULLY-EMPTIED table (r18 ADVICE): a " +
      "complete takedown's feed returns the delete preimages instead " +
      "of raising on the empty current snapshot") {
    val root = freshRoot()
    Manifest.commitReplacePartitions(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "part"),
      root, "part", "init")
    // delete EVERY row → zero live entries at the current version
    Manifest.commitDelete(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "part"),
      root, Seq("id"), "part", "takedown_all")
    val feed = Manifest.changedRowsSince(spark, root, "part",
      Seq("id"), sinceVersion = 1L)
    assert(feed.select(col("_change")).as[String].collect().toSet ==
      Set("delete"))
    assert(feed.select(col("id"), col("name"))
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")),
      "delete preimages must carry the old values")
  }

  test("crossing table pins raise (r18 ADVICE): two runs whose pin " +
      "requests cross the current cut cannot max-converge to a cut " +
      "neither produced") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_pins_x").toString
    Manifest.commitTablePins(spark, base,
      Map("weather" -> 2L, "cocktails" -> 1L), "run_a")
    // crossing request: behind on weather, ahead on cocktails
    intercept[Manifest.ConcurrentCommitException] {
      Manifest.commitTablePins(spark, base,
        Map("weather" -> 1L, "cocktails" -> 2L), "run_b")
    }
    assert(Manifest.tablePins(spark, base) ==
      Map("weather" -> 2L, "cocktails" -> 1L))
    // uniformly-stale retry still no-ops monotonic
    Manifest.commitTablePins(spark, base,
      Map("weather" -> 1L, "cocktails" -> 1L), "stale_retry")
    assert(Manifest.tablePins(spark, base) ==
      Map("weather" -> 2L, "cocktails" -> 1L))
    // uniformly-ahead publishes; deliberate rollback bypasses the check
    Manifest.commitTablePins(spark, base,
      Map("weather" -> 3L, "cocktails" -> 2L), "run_c")
    assert(Manifest.tablePins(spark, base) ==
      Map("weather" -> 3L, "cocktails" -> 2L))
    Manifest.commitTablePins(spark, base,
      Map("weather" -> 1L, "cocktails" -> 2L), "rollback",
      allowRollback = true)
    assert(Manifest.tablePins(spark, base) ==
      Map("weather" -> 1L, "cocktails" -> 2L))
  }
}
