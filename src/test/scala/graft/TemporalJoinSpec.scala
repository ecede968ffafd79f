package graft

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // left: (key, ts, label) — right: (key, ts, rid, price)
  private val trades = Seq(
    (1L, 100L, "a"),   // matches rid 11 (ts 90, newest <= 100)
    (1L, 95L, "b"),    // ts tie with rid 12? no: matches rid 11 too
    (1L, 90L, "c"),    // INCLUSIVE: right at exactly 90 matches
    (1L, 10L, "d"),    // before any right row -> unmatched
    (2L, 500L, "e"),   // key 2: matches rid 21 (ts 100) but tolerance cuts it
    (3L, 50L, "f"))    // key with no right rows at all
    .toDF("k", "ts", "label")
  private val quotes = Seq(
    (1L, 80L, 10L, 1.5),
    (1L, 90L, 11L, 2.5),
    (2L, 100L, 21L, 9.0))
    .toDF("k", "qts", "rid", "price")

  test("asofJoin: backward nearest, inclusive tie, tolerance, unmatched") {
    val out = TemporalJoin.asofJoin(trades, quotes, Seq("k"),
      "ts", "qts", payload = Seq("rid", "price"),
      tolerance = Some(300L), rightTieBreak = Some("rid"),
      matchedTimeAs = "qts")
      .as[(Long, Long, String, Option[Long], Option[Double], Option[Long])]
      .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
    assert(out("a") == ((Some(11L), Some(2.5), Some(90L))))
    assert(out("b") == ((Some(11L), Some(2.5), Some(90L))))
    assert(out("c") == ((Some(11L), Some(2.5), Some(90L)))) // inclusive
    assert(out("d") == ((None, None, None)))                // nothing before
    assert(out("e") == ((None, None, None)))                // 400 > tol 300
    assert(out("f") == ((None, None, None)))                // key absent
  }

  test("asofJoin: equal right timestamps break by largest tiebreak") {
    val r = Seq((1L, 90L, 11L, 2.5), (1L, 90L, 12L, 3.5))
      .toDF("k", "qts", "rid", "price")
    val out = TemporalJoin.asofJoin(
      Seq((1L, 100L)).toDF("k", "ts"), r, Seq("k"), "ts", "qts",
      payload = Seq("rid", "price"), rightTieBreak = Some("rid"))
      .select("rid", "price").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((12L, 3.5)))
  }

  test("asofJoin: payload struct is atomic — a null column does not tear") {
    // newest quote has null price; a per-column last() would leak the
    // OLDER quote's price into the newer rid. The struct must not.
    val r = Seq((1L, 80L, Some(10L), Some(1.5)), (1L, 90L, Some(11L), None))
      .toDF("k", "qts", "rid", "price")
    val out = TemporalJoin.asofJoin(
      Seq((1L, 100L)).toDF("k", "ts"), r, Seq("k"), "ts", "qts",
      payload = Seq("rid", "price"))
      .select("rid", "price").as[(Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq((Some(11L), None)))
  }

  test("asofJoin plans one keyed window — no nested-loop, no cartesian") {
    val p = plan(TemporalJoin.asofJoin(trades, quotes, Seq("k"),
      "ts", "qts", payload = Seq("rid", "price")))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"asofJoin must not plan a nested loop:\n$p")
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 2,
      s"asofJoin should cost at most the union's exchanges:\n$p")
  }

  test("rangeJoin ≡ naive inequality join, dup-free, across bin sizes") {
    // content-addressed synthetic intervals/points (no RNG state)
    val iv = spark.range(200).select(
      col("id").as("iv_id"), pmod(col("id"), lit(7L)).as("ik"),
      pmod(xxhash64(col("id")), lit(1000L)).as("s"),
      (pmod(xxhash64(col("id")), lit(1000L)) +
        pmod(xxhash64(col("id"), lit(3)), lit(50L))).as("e"))
    val pt = spark.range(500).select(
      (col("id") + 10000L).as("pt_id"), pmod(col("id"), lit(7L)).as("pk"),
      pmod(xxhash64(col("id"), lit(7)), lit(1050L)).as("p"))
    val naive = iv.join(pt, iv("ik") === pt("pk") &&
        pt("p").between(iv("s"), iv("e")))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    for (bin <- Seq(10L, 50L, 400L)) {
      val got = TemporalJoin.rangeJoin(iv, pt, Seq("ik" -> "pk"),
        "s", "e", "p", binSize = bin)
        .select("iv_id", "pt_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin produced duplicates")
      assert(got.toSet == naive, s"bin=$bin diverged from inequality join")
    }
  }

  test("asofJoinChunked ≡ asofJoin across chunk sizes (hot single key)") {
    // ONE key (the worst skew case the chunked variant exists for),
    // content-addressed times with cross-chunk gaps and exact ties
    val l = spark.range(300).select(lit(1L).as("k"),
      pmod(xxhash64(col("id")), lit(5000L)).as("ts"),
      col("id").as("lid"))
    val r = spark.range(120).select(lit(1L).as("k"),
      // times cluster mod 4000 so some chunks are empty (seed gaps)
      pmod(xxhash64(col("id"), lit(9)), lit(4000L)).as("qts"),
      col("id").as("rid"),
      (pmod(xxhash64(col("id"), lit(11)), lit(100L)).cast("double") / 10)
        .as("price"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid", "price", "qts")
        .as[(Long, Option[Long], Option[Double], Option[Long])]
        .collect().toSet
    val base = rows(TemporalJoin.asofJoin(l, r, Seq("k"), "ts", "qts",
      payload = Seq("rid", "price"), tolerance = Some(700L),
      rightTieBreak = Some("rid"), matchedTimeAs = "qts"))
    for (chunk <- Seq(10L, 97L, 1000L, 100000L)) {
      val got = rows(TemporalJoin.asofJoinChunked(l, r, Seq("k"),
        "ts", "qts", payload = Seq("rid", "price"), chunk = chunk,
        tolerance = Some(700L), rightTieBreak = Some("rid"),
        matchedTimeAs = "qts"))
      assert(got == base, s"chunk=$chunk diverged from asofJoin")
    }
  }

  test("asofJoinChunked partitions the big window by time chunk") {
    val p = plan(TemporalJoin.asofJoinChunked(trades, quotes, Seq("k"),
      "ts", "qts", payload = Seq("rid", "price"), chunk = 100L))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    // the data-sized window must include __c in its partition spec
    assert(p.contains("windowspecdefinition(k#") ||
      p.contains("specifiedwindowframe"), s"no window in plan:\n$p")
    assert("partitionBy.*__c|windowspecdefinition\\([^)]*__c".r
      .findFirstIn(p).isDefined,
      s"big window should partition on (keys, __c):\n$p")
  }

  test("intervalJoin ≡ naive overlap join, dup-free, across bin sizes") {
    val a = spark.range(150).select(
      col("id").as("a_id"), pmod(col("id"), lit(5L)).as("ak"),
      pmod(xxhash64(col("id")), lit(800L)).as("as_"),
      (pmod(xxhash64(col("id")), lit(800L)) +
        pmod(xxhash64(col("id"), lit(3)), lit(120L))).as("ae"))
    val b = spark.range(200).select(
      (col("id") + 5000L).as("b_id"), pmod(col("id"), lit(5L)).as("bk"),
      pmod(xxhash64(col("id"), lit(7)), lit(900L)).as("bs"),
      (pmod(xxhash64(col("id"), lit(7)), lit(900L)) +
        pmod(xxhash64(col("id"), lit(13)), lit(80L))).as("be"))
    val naive = a.join(b, a("ak") === b("bk") &&
        a("as_") <= b("be") && b("bs") <= a("ae"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (bin <- Seq(7L, 100L, 2000L)) {
      val got = TemporalJoin.intervalJoin(a, b, Seq("ak" -> "bk"),
        "as_", "ae", "bs", "be", binSize = bin)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"bin=$bin produced duplicate pairs")
      assert(got.toSet == naive, s"bin=$bin diverged from overlap join")
    }
  }

  test("rangeJoin plans an equi-join, not a nested loop") {
    val iv = Seq((1L, 1L, 0L, 10L)).toDF("iv_id", "ik", "s", "e")
    val pt = Seq((2L, 1L, 5L)).toDF("pt_id", "pk", "p")
    val p = plan(TemporalJoin.rangeJoin(iv, pt, Seq("ik" -> "pk"),
      "s", "e", "p", binSize = 10L))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"rangeJoin must plan an equi-join:\n$p")
  }
}
