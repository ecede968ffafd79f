package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ns.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("snapshotDiff labels added/removed/changed/unchanged") {
    val old = snap(1L -> "same", 2L -> "before", 3L -> "gone")
    val neu = snap(1L -> "same", 2L -> "after", 4L -> "fresh")
    val out = Snapshot.snapshotDiff(old, neu, "doc_id", "text")
      .select(col("doc_id"), col("status"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff: null content is never 'unchanged'; fps carried") {
    val old = snap(1L -> null, 2L -> "x")
    val neu = snap(1L -> null, 2L -> "x")
    val rows = Snapshot.snapshotDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.isNullAt(2), r.isNullAt(3))).toMap
    // null md5 on both sides: the null-unsafe equality falls through
    assert(rows(1L) == (("changed", true, true)))
    assert(rows(2L)._1 == "unchanged")
    assert(!rows(2L)._2 && !rows(2L)._3)
  }

  test("diffSummary counts per status; one join, no cartesian") {
    val old = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val neu = snap(2L -> "B", 3L -> "c", 4L -> "d")
    val diff = Snapshot.snapshotDiff(old, neu, "doc_id", "text")
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in plan:\n$plan")
    val sums = Snapshot.diffSummary(diff)
      .as[(String, Long)].collect().toMap
    assert(sums == Map(
      "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 1L, "added" -> 1L))
  }

  test("corpusFingerprint: order/partition-invariant, content-" +
      "sensitive, empty-safe") {
    import graft.ns.Snapshot
    val d = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "txt")
    val fp = Snapshot.corpusFingerprint(d, "t", Seq("id", "txt"))
      .as[(String, Long, Long)].head()
    assert(fp._1 == "t" && fp._2 == 3L)
    // row order and partitioning wash out (the checksum is a sum)
    val fp2 = Snapshot.corpusFingerprint(
      d.repartition(5).orderBy(col("id").desc), "t", Seq("id", "txt"))
      .as[(String, Long, Long)].head()
    assert(fp2 == fp)
    // any single-row content change moves the checksum
    val fp3 = Snapshot.corpusFingerprint(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma!"))
        .toDF("id", "txt"), "t", Seq("id", "txt"))
      .as[(String, Long, Long)].head()
    assert(fp3._3 != fp._3)
    // field boundaries can't alias: ("ab","c") vs ("a","bc")
    val a = Snapshot.corpusFingerprint(
      Seq(("ab", "c")).toDF("x", "y"), "t", Seq("x", "y"))
      .as[(String, Long, Long)].head()
    val b = Snapshot.corpusFingerprint(
      Seq(("a", "bc")).toDF("x", "y"), "t", Seq("x", "y"))
      .as[(String, Long, Long)].head()
    assert(a._3 != b._3)
    // empty slice → (0, 0), not null
    val e = Snapshot.corpusFingerprint(d.limit(0), "t", Seq("id"))
      .as[(String, Long, Long)].head()
    assert(e == (("t", 0L, 0L)))
  }

  test("winsorize: exact PERCENTILE_DISC cuts, clip-only semantics, " +
      "idempotent") {
    import graft.ns.Sketches
    // 100 values 0.01..1.00 → p10 cut = 10th value (0.10), p90 = 0.90
    val d = (1 to 100).map(i => (i.toLong, i / 100.0))
      .toDF("id", "v")
    val w = Sketches.winsorize(d, "id", "v", 0.10, 0.90)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(w.length == 100)
    w.foreach { case (id, v, vw) =>
      val expect = math.min(math.max(v, 0.10), 0.90)
      assert(math.abs(vw - expect) < 1e-12, s"id $id: $vw vs $expect")
    }
    // in-band rows pass through; winsorizing the result is a no-op
    val again = Sketches.winsorize(
      w.toSeq.map(r => (r._1, r._3)).toDF("id", "v"),
      "id", "v", 0.10, 0.90)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(again.map(_._3).toSeq == w.map(_._3).toSeq)
    // empty input → empty output, no NPE
    assert(Sketches.winsorize(d.limit(0), "id", "v", 0.1, 0.9)
      .count() == 0)
  }
}
