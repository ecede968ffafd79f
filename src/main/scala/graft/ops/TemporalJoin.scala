package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: as-of (nearest preceding
  * match per key) and range (point-in-interval). Both are declared as
  * single-shuffle plans — no inequality-join nested loop, no
  * cartesian — so they hold at cluster scale.
  *
  * The reference engine has no temporal operators; these extend the
  * surface the way the `[NS]` suite does, because event-time
  * enrichment ("join each event to the latest state at-or-before
  * it") is a workhorse of both analytics and training-data pipelines
  * (e.g. joining model outputs to the latest checkpoint metadata, or
  * clicks to the impression that caused them).
  */
object TemporalJoin {

  /** As-of join: for each left row, the LATEST right row with the
    * same keys and right time ≤ left time (backward direction, the
    * common "state at event time" case), within `tolerance` (same
    * units as the time columns) if given. Left rows with no match keep nulls (left-join
    * semantics).
    *
    * Spark-first plan: instead of an inequality join (which Spark
    * executes as a broadcast-nested-loop — O(L·R) and
    * driver-memory-bound), union both sides tagged by origin and run
    * ONE window over (keys, time): `last(right_struct, ignoreNulls)`
    * carries the newest right row forward into every subsequent left
    * row. One exchange on `keys`, linear scan per partition — at
    * 100 TB the cost is the same as any keyed window (sessionization,
    * top-k), and AQE handles key-count skew. A key whose single
    * partition is too hot for one reducer needs `asofJoinChunked`
    * below, which time-chunks the window.
    *
    * The right payload rides in ONE struct so `last(..., ignoreNulls)`
    * picks the newest right ROW atomically — per-column `last` would
    * tear rows when a payload column is legitimately null.
    *
    * Determinism: ties on (keys, time) between left and right match
    * inclusively (right sorts first); ties BETWEEN right rows are
    * broken by `rightTieBreak` — pass a unique right column (an id)
    * whenever right times can repeat per key, or the match is
    * arbitrary.
    *
    * Times are numeric (epoch seconds/micros as long) — callers
    * convert timestamps; keeps ordering and tolerance arithmetic
    * exact and engine-portable. `payload` names must not collide
    * with left column names. Output: all left columns, then payload
    * columns (null when unmatched or out of tolerance), then
    * `matchedTimeAs` (the matched right time, same null rule). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String, payload: Seq[String],
      tolerance: Option[Long] = None,
      rightTieBreak: Option[String] = None,
      matchedTimeAs: String = "matched_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.forall(right.columns.contains),
      s"payload not in right: ${payload.filterNot(right.columns.contains)}")
    require(!payload.exists(leftCols.contains) &&
      !leftCols.contains(matchedTimeAs),
      "right payload / matchedTimeAs names must not collide with left columns")

    val tie = rightTieBreak.map(col).getOrElse(lit(0L)).cast("long")
    // right rows: keys, time, tie, packed payload struct, no left cols
    val rightU = right.select(
      keys.map(col) ++ Seq(
        col(rightTimeCol).cast("long").as("__t"),
        lit(0).as("__side"), tie.as("__tie"),
        struct(col(rightTimeCol).cast("long").as("__rt") +:
          payload.map(col): _*).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // left rows: keys, time, all left cols, null payload struct
    val leftU = left.select(
      keys.map(col) ++ Seq(
        col(leftTimeCol).cast("long").as("__t"),
        lit(1).as("__side"), lit(0L).as("__tie"),
        lit(null).cast(rightU.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightU.unionByName(leftU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case Some(t) => col("__m").isNotNull &&
        col("__t") - col("__m.__rt") <= t
      case None => col("__m").isNotNull
    }
    matched.select(
      leftCols.map(col) ++
        payload.map(p => when(inTol, col(s"__m.$p")).as(p)) :+
        when(inTol, col("__m.__rt")).as(matchedTimeAs): _*)
  }

  /** `asofJoin` for HOT keys: identical semantics, but the window
    * partitions on (keys, time-chunk) instead of keys alone, so one
    * key's timeline spreads over `timeline span / chunk` parallel
    * tasks instead of serializing on a single reducer — the window
    * analogue of salting a skewed join (`Skew.saltedJoin`), except
    * the "salt" must follow time to preserve ordering semantics.
    *
    * The cross-chunk dependency (a left row early in a chunk matching
    * a right row from an older chunk) is restored with CARRY-IN
    * seeds: the per-(key, chunk) newest right row is first reduced
    * with one map-combinable `max_by` aggregation (tiny output —
    * one row per key per active chunk), a prefix-max window over
    * THAT summary computes "newest right row strictly before each
    * chunk", and the seeds are unioned into their chunk sorting
    * before every real row (side −1 < right 0 < left 1; a seed's
    * true time is always < the chunk start, so a real in-chunk right
    * row correctly shadows it). The expensive data-sized window then
    * never crosses a chunk boundary. Cost: one extra small shuffle
    * (the summary agg) versus `asofJoin`; same output, proven as an
    * equality law in TemporalJoinSpec.
    *
    * Pick `chunk` so a hot key's densest chunk fits a reducer —
    * the same sizing call as a salt factor. Times are non-negative
    * longs (epoch), like `rangeJoin`. */
  def asofJoinChunked(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTimeCol: String, rightTimeCol: String,
      payload: Seq[String], chunk: Long,
      tolerance: Option[Long] = None,
      rightTieBreak: Option[String] = None,
      matchedTimeAs: String = "matched_ts"): DataFrame = {
    require(chunk > 0, "chunk must be > 0")
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "asofJoinChunked needs payload columns")
    require(payload.forall(right.columns.contains),
      s"payload not in right: ${payload.filterNot(right.columns.contains)}")
    require(!payload.exists(leftCols.contains) &&
      !leftCols.contains(matchedTimeAs),
      "right payload / matchedTimeAs names must not collide with left columns")

    val tie = rightTieBreak.map(col).getOrElse(lit(0L)).cast("long")
    // `div` = exact long division (`/` on longs is double division in
    // Spark); trunc == floor for the documented non-negative times.
    // Always applied to the already-long __t column.
    val chunkCol = expr(s"__t div ${chunk}L")
    val rStruct = struct(col(rightTimeCol).cast("long").as("__rt") +:
      tie.as("__rtie") +: payload.map(col): _*)

    val rightU = right.select(
      keys.map(col) ++ Seq(
        col(rightTimeCol).cast("long").as("__t"),
        lit(0).as("__side"), tie.as("__tie"), rStruct.as("__r")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .withColumn("__c", chunkCol)

    val leftU = left.select(
      keys.map(col) ++ Seq(
        col(leftTimeCol).cast("long").as("__t"),
        lit(1).as("__side"), lit(0L).as("__tie"),
        lit(null).cast(rightU.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .withColumn("__c", chunkCol)

    // newest right row per (keys, chunk): one map-combinable agg
    val perChunk = rightU.groupBy((keys.map(col) :+ col("__c")): _*)
      .agg(max_by(col("__r"),
        struct(col("__t"), col("__tie"))).as("__r"))
    // EVERY chunk that holds any row needs a seed row in the summary
    // — a chunk with only left rows still needs the carry-in from
    // older chunks (otherwise its left rows would match nothing).
    // distinct is map-side-combined to summary size before exchange.
    val allChunks = rightU.select((keys.map(col) :+ col("__c")): _*)
      .unionByName(leftU.select((keys.map(col) :+ col("__c")): _*))
      .distinct()
    // newest right row STRICTLY BEFORE each chunk — a prefix window
    // over the summary (rows = keys × active chunks, not data-sized).
    // max of the (__rt, __rtie, ...) struct IS the newest row because
    // struct comparison is lexicographic on (time, tiebreak) first.
    val seedW = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = allChunks
      .join(perChunk, (keys :+ "__c").toSeq, "left")
      .withColumn("__seed", max(col("__r")).over(seedW))
      .filter(col("__seed").isNotNull)
      .select(
        keys.map(col) ++ Seq(
          (col("__c") * chunk).as("__t"), lit(-1).as("__side"),
          col("__seed.__rtie").as("__tie"), col("__seed").as("__r")) ++
          leftCols.filterNot(keys.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .withColumn("__c", chunkCol)

    val w = Window.partitionBy((keys.map(col) :+ col("__c")): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightU.unionByName(seeds).unionByName(leftU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case Some(t) => col("__m").isNotNull &&
        col("__t") - col("__m.__rt") <= t
      case None => col("__m").isNotNull
    }
    matched.select(
      leftCols.map(col) ++
        payload.map(p => when(inTol, col(s"__m.$p")).as(p)) :+
        when(inTol, col("__m.__rt")).as(matchedTimeAs): _*)
  }

  /** Range join: all (interval, point) pairs with equal keys and
    * startCol ≤ point ≤ endCol. Spark plans a raw inequality join as
    * a nested loop; this instead BINS time: each interval explodes to
    * the bins it covers, each point maps to its one bin, and the pair
    * space collapses to an equi-join on (keys, bin) + an exact
    * containment filter. No duplicates by construction (a point is in
    * exactly one bin).
    *
    * Scale: work per (key, bin) is intervals-overlapping-bin ×
    * points-in-bin — bounded when `binSize` is chosen near the
    * typical interval length (each interval then covers ≤ 2-3 bins
    * and candidate fan-out tracks the true output size). Degenerate
    * binSize (≪ interval length) multiplies interval replication;
    * (≫) multiplies per-bin candidates — same tuning story as any
    * spatial grid index. Times are non-negative longs (epoch).
    * Output: all interval columns, then all point columns (names
    * must be disjoint). */
  def rangeJoin(intervals: DataFrame, points: DataFrame,
      keys: Seq[(String, String)], startCol: String, endCol: String,
      pointCol: String, binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be > 0")
    require(intervals.columns.toSet.intersect(points.columns.toSet).isEmpty,
      "interval / point column names must be disjoint")
    // `div` is exact long division — `/` on longs is DOUBLE division
    // in Spark and silently loses exactness at epoch-nanos magnitudes
    def bin(c: String) =
      expr(s"CAST(`$c` AS BIGINT) div ${binSize}L")
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(startCol), bin(endCol))))
    val pt = points.withColumn("__bin", bin(pointCol))
    val joinCond = keys.map { case (ik, pk) => iv(ik) === pt(pk) }
      .foldLeft(iv("__bin") === pt("__bin"))(_ && _)
    iv.join(pt, joinCond)
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval-overlap join: all (a, b) pairs with equal keys whose
    * closed intervals overlap (aStart ≤ bEnd AND bStart ≤ aEnd). Same
    * binning scheme as `rangeJoin`, with one extra subtlety: an
    * overlapping pair can share MANY bins, which would duplicate the
    * pair once per shared bin. Instead of a distinct (a full extra
    * shuffle of the output), each pair is claimed by exactly ONE
    * REPORTING BIN — the bin containing the overlap's start,
    * max(aStart, bStart). That bin is always covered by both
    * intervals (the overlap start lies inside each), so the pair
    * survives exactly once, dup-free by construction with zero extra
    * exchanges.
    *
    * Scale: identical tuning story to `rangeJoin` — `binSize` near
    * the typical interval length keeps per-interval replication ≤2-3
    * bins and per-bin candidates tracking true output. Times are
    * non-negative longs. Output: all a columns, then all b columns
    * (names must be disjoint). */
  def intervalJoin(a: DataFrame, b: DataFrame,
      keys: Seq[(String, String)], aStart: String, aEnd: String,
      bStart: String, bEnd: String, binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be > 0")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "a / b column names must be disjoint")
    def bin(c: String) =
      expr(s"CAST(`$c` AS BIGINT) div ${binSize}L")
    val av = a.withColumn("__bin",
      explode(sequence(bin(aStart), bin(aEnd))))
    val bv = b.withColumn("__bin",
      explode(sequence(bin(bStart), bin(bEnd))))
    val joinCond = keys.map { case (ak, bk) => av(ak) === bv(bk) }
      .foldLeft(av("__bin") === bv("__bin"))(_ && _)
    av.join(bv, joinCond)
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // reporting bin: only the bin holding max(aStart, bStart) keeps
      // the pair — both sides cover it, so exactly one copy survives
      .filter(av("__bin") ===
        expr(s"greatest(CAST(`$aStart` AS BIGINT)," +
          s" CAST(`$bStart` AS BIGINT)) div ${binSize}L"))
      .drop("__bin")
  }
}
