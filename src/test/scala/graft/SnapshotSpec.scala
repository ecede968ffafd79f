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
}
