package graft

import org.apache.spark.sql.functions._

import graft.ns.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("blockedFuzzyPairs: planted typos found, distances exact, " +
      "block-prefix escape documented, equi-join plan") {
    val recs = Seq(
      (1L, "jonathan"), (2L, "jonathnn"),  // sub typo, same block
      (3L, "jonatha"),                     // deletion, same block
      (4L, "elizabeth"), (5L, "elizabeht"),// transposed tail = dist 2
      (6L, "xlizabeth"),                   // first-char typo → other block
      (7L, "margaret")                     // no partner
    ).toDF("id", "name")
    val pairs = Linkage.blockedFuzzyPairs(recs, "id", "name",
      substring(col("name"), 1, 4), maxDist = 2)
    val got = pairs.select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect().toSet
    // jonathan↔jonathnn (1 sub), jonathan↔jonatha (1 del),
    // jonathnn↔jonatha (2), elizabeth↔elizabeht (2)
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L),
      (4L, 5L, 2L)))
    // the recall trade-off, pinned: a first-char edit escapes the
    // block even though its true distance is 1
    assert(!got.exists(p => p._1 == 4L && p._2 == 6L))
    assert(spark.range(1).select(
      levenshtein(lit("elizabeth"), lit("xlizabeth"))).head.getInt(0) == 1)
    // one hash equi-join on the block key — never a cartesian
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
