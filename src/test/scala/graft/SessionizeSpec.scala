package graft

import org.apache.spark.sql.functions._
import graft.ops.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts_us, event_id, value); gap = 100 µs.
  private val events = Seq(
    (1L, 0L, 10L, 1.0), (1L, 50L, 11L, 2.0), (1L, 120L, 12L, 3.0),
    (1L, 500L, 13L, 4.0), // gap 380 > 100 → new session
    (2L, 0L, 20L, 5.0), // lone event, own session
    (2L, 101L, 21L, 6.0), // exactly gap+1 → new session
    (2L, 201L, 22L, 7.0) // exactly gap → same session
  ).toDF("user_id", "ts_us", "event_id", "value")

  test("sessionize: gap splits, inclusive boundary, 0-based per key") {
    val got = Sessionize.sessionize(events, Seq("user_id"), "ts_us",
        gapUs = 100L, tieBreak = "event_id")
      .select("event_id", "session_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 1L,
      20L -> 0L, 21L -> 1L, 22L -> 1L))
  }

  test("sessionize: equal timestamps order by tieBreak, not arbitrarily") {
    // Two events at the same instant must land in the same session
    // deterministically, whatever their input order.
    val df = Seq((1L, 0L, 2L, 0.0), (1L, 0L, 1L, 0.0),
      (1L, 200L, 3L, 0.0)).toDF("user_id", "ts_us", "event_id", "value")
    val got = Sessionize.sessionize(df, Seq("user_id"), "ts_us",
        gapUs = 100L, tieBreak = "event_id")
      .select("event_id", "session_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("sessionSummary: bounds, counts, exact totals per session") {
    val got = Sessionize.sessionSummary(events, Seq("user_id"), "ts_us",
        gapUs = 100L, tieBreak = "event_id", valueCol = "value")
      .select("user_id", "session_id", "session_start_us",
        "session_end_us", "n_events", "total_value")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 0L, 0L, 120L, 3L, 6.0),
      (1L, 1L, 500L, 500L, 1L, 4.0),
      (2L, 0L, 0L, 0L, 1L, 5.0),
      (2L, 1L, 101L, 201L, 2L, 13.0)))
  }

  test("sessionize plans ONE exchange and ONE sort for both windows") {
    val plan = Sessionize.sessionize(events, Seq("user_id"), "ts_us",
      gapUs = 100L, tieBreak = "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r
      .findAllMatchIn(plan).size == 1, s"want one exchange:\n$plan")
    assert("(?i)\\bsort\\b".r.findAllMatchIn(plan).size <= 2,
      s"lag + running sum should share one window sort:\n$plan")
  }

  test("sessionTranscripts: total event order, counts align with " +
      "sessionSummary, partition-stable") {
    val ev = events.withColumn("event_type",
      concat(lit("e"), col("event_id")))
    val t = Sessionize.sessionTranscripts(ev, Seq("user_id"), "ts_us",
      gapUs = 100L, tieBreak = "event_id", typeCol = "event_type")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(t(1L -> 0L) == ((0L, 3L, "e10>e11>e12")))
    assert(t(1L -> 1L) == ((500L, 1L, "e13")))
    assert(t(2L -> 1L) == ((101L, 2L, "e21>e22")))
    // n_events agrees with sessionSummary on every session
    val s = Sessionize.sessionSummary(events, Seq("user_id"), "ts_us",
      100L, "event_id", "value")
      .select(col("user_id"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(t.view.mapValues(_._2).toMap == s)
    // transcript order survives an adversarial repartition/reorder
    val again = Sessionize.sessionTranscripts(
      ev.repartition(7).orderBy(col("event_id").desc), Seq("user_id"),
      "ts_us", 100L, "event_id", "event_type")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(again == t)
  }

  test("bot-session composition: identical transcripts across users " +
      "surface; organic and short sessions do not") {
    import org.apache.spark.sql.functions._
    // users 1 and 2 run the same 3-step script twice; user 3 browses
    // organically; user 4's 2-event session is below the length gate
    def run(uid: Long, base: Long, types: Seq[String],
        idBase: Long): Seq[(Long, Long, Long, String)] =
      types.zipWithIndex.map { case (t, i) =>
        (uid, base + i * 10L, idBase + i, t) }
    val script = Seq("view", "click", "purchase")
    val rows =
      run(1L, 1000L, script, 100L) ++ run(1L, 9000L, script, 200L) ++
      run(2L, 1000L, script, 300L) ++
      run(3L, 1000L, Seq("view", "view", "click", "search"), 400L) ++
      run(4L, 1000L, Seq("view", "click"), 500L)
    val ev = rows.toDF("user_id", "ts_us", "event_id", "event_type")
    val found = Sessionize.sessionTranscripts(ev, Seq("user_id"),
        "ts_us", gapUs = 1000L, tieBreak = "event_id",
        typeCol = "event_type")
      .filter(col("n_events") >= 3)
      .groupBy(col("transcript"))
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col("user_id")).as("n_users"))
      .filter(col("n_sessions") >= 2)
      .as[(String, Long, Long)].collect()
    assert(found.toSeq == Seq(("view>click>purchase", 3L, 2L)))
  }
}
