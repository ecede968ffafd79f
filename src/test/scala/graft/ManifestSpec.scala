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
      .as[(String, String, Long)].collect().toSet
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
        .select("data_key").as[String].collect().toSeq
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
}
