package graft.dq

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Engine-native data-quality checks (SURVEY.md §2.6 Q1–Q3).
  *
  * The reference delegates DQ to a SaaS: trigger a check suite, poll
  * until no results are pending, persist the result JSON, and gate the
  * gold write on success (/root/reference/dags/sandbox_data_pipeline.py
  * :152-205,381-395; status classification
  * /root/reference/dags/anomalo_datahub_integration.py:62-79). Here the
  * checks ARE aggregations run by the engine, so polling disappears and
  * the "check suite" is ONE job: every configured metric (row count,
  * per-column null counts, freshness, key uniqueness) is computed in a
  * single multi-aggregate pass over the table — at 100 TB that is one
  * scan, map-side combined, instead of N separate check queries.
  */
object Checks {

  /** Q3: check-run status classification (pending/skipped/complete →
    * done flag). Synchronous checks are Complete on arrival; the enum
    * preserves the reference's contract for any async integration. */
  sealed abstract class CheckStatus(val done: Boolean)
  object CheckStatus {
    case object Pending extends CheckStatus(false)
    case object Skipped extends CheckStatus(true)
    case object Complete extends CheckStatus(true)
    case object Unknown extends CheckStatus(false)
    def parse(s: String): CheckStatus = s.toLowerCase match {
      case "pending" => Pending
      case "skipped" => Skipped
      case "complete" => Complete
      case _ => Unknown
    }
  }

  /** Declarative check suite for one table.
    *
    * `approxUniqueRsd`: when set (e.g. 0.01), the uniqueness check
    * uses HLL++ `approx_count_distinct` at that relative standard
    * deviation instead of exact `count_distinct`. The exact check is
    * one full shuffle of the key at 100 TB; the sketch is a few KB per
    * partition, map-side merged. The trade is semantics: the approx
    * check can only assert "duplicate fraction ≤ 3·rsd" (it passes iff
    * distinct ≥ rows·(1 − 3·rsd)), so it catches bulk duplication —
    * the replay/fan-out bugs DQ gates exist for — but not a handful of
    * dup keys. Leave None (exact) when the table is dimension-sized or
    * the gate must prove strict uniqueness. */
  final case class CheckConfig(
      minRows: Long = 1L,
      maxNullRate: Map[String, Double] = Map.empty,
      expectedRunHr: Option[Long] = None,
      uniqueKey: Option[Seq[String]] = None,
      approxUniqueRsd: Option[Double] = None)

  /** Thrown by [[gate]] when a check fails (Q2). */
  final class DqGateException(msg: String) extends RuntimeException(msg)

  /** Q1: run the configured checks in one aggregation pass; returns a
    * dq_results DataFrame (FIXTURES.md A5 schema). */
  def runChecks(df: DataFrame, tableName: String, runHr: Long,
      cfg: CheckConfig): DataFrame = {
    // rsd >= 1/3 would drive the pass floor n·(1−3·rsd) to zero or
    // below — the check would pass on ANY data, a vacuous gate worse
    // than no gate (it reports success). Reject it up front — but only
    // when a uniqueKey actually uses it; inert config must stay inert.
    if (cfg.uniqueKey.isDefined)
      cfg.approxUniqueRsd.foreach(rsd => require(rsd > 0.0 && rsd < 1.0 / 3,
        s"approxUniqueRsd must be in (0, 1/3), got $rsd — at 1/3 the " +
          "uniqueness floor reaches zero and the check passes vacuously"))
    val spark = df.sparkSession
    val nullCols = cfg.maxNullRate.keys.toSeq
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        nullCols.map(c =>
          sum(col(c).isNull.cast("long")).as(s"__nulls_$c")) ++
        cfg.expectedRunHr.map(_ =>
          max(col("run_hr")).as("__max_run_hr")).toSeq ++
        cfg.uniqueKey.map { k =>
          val keys = struct(k.map(col): _*)
          cfg.approxUniqueRsd match {
            case Some(rsd) =>
              approx_count_distinct(keys, rsd).as("__distinct_keys")
            case None => count_distinct(keys).as("__distinct_keys")
          }
        }.toSeq
    val m = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = m.getAs[Long]("__n")
    val now = new Timestamp(System.currentTimeMillis())

    def result(check: String, ok: Boolean, msg: String): Row =
      Row(tableName, check, ok, false, msg, runHr, now)

    val rows = Seq.newBuilder[Row]
    rows += result("row_count",
      n >= cfg.minRows, s"rows=$n min=${cfg.minRows}")
    nullCols.foreach { c =>
      val nulls = m.getAs[Long](s"__nulls_$c")
      val rate = if (n == 0) 0.0 else nulls.toDouble / n
      rows += result(s"null_rate_$c",
        rate <= cfg.maxNullRate(c),
        f"null_rate=$rate%.4f max=${cfg.maxNullRate(c)}%.4f")
    }
    cfg.expectedRunHr.foreach { hr =>
      val maxHr = if (m.isNullAt(m.fieldIndex("__max_run_hr"))) -1L
        else m.getAs[Long]("__max_run_hr")
      rows += result("freshness",
        maxHr == hr, s"max_run_hr=$maxHr expected=$hr")
    }
    cfg.uniqueKey.foreach { k =>
      val d = m.getAs[Long]("__distinct_keys")
      cfg.approxUniqueRsd match {
        case Some(rsd) =>
          val floor = math.ceil(n * (1.0 - 3.0 * rsd)).toLong
          rows += result(s"unique_key_approx_${k.mkString("_")}",
            d >= floor,
            s"approx_distinct=$d rows=$n floor=$floor rsd=$rsd")
        case None =>
          rows += result(s"unique_key_${k.mkString("_")}",
            d == n, s"distinct=$d rows=$n")
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 1), Schemas.dqResult)
  }

  /** True iff every non-pending check in `dqResults` succeeded. */
  def allPassed(dqResults: DataFrame): Boolean =
    dqResults.filter(!col("pending") && !col("success")).isEmpty

  /** Q2: gate — run checks, persist them via `sink`, and either
    * return them (all green) or throw so the caller's gold write never
    * happens. Mirrors the reference's check-between-stage-and-write
    * placement. */
  def gate(df: DataFrame, tableName: String, runHr: Long,
      cfg: CheckConfig)(sink: DataFrame => Unit): DataFrame = {
    val results = runChecks(df, tableName, runHr, cfg)
    sink(results)
    if (!allPassed(results)) {
      val failed = results.filter(!col("success"))
        .select(col("check_name"), col("message"))
        .collect().map(r => s"${r.getString(0)}: ${r.getString(1)}")
      throw new DqGateException(
        s"DQ gate failed for $tableName@$runHr: ${failed.mkString("; ")}")
    }
    results
  }

  /** Metric anomaly detection over a per-(group, hour) series: z-score
    * each hour's metric against its group's own history, flag
    * |z| > threshold. The volume-drop / volume-spike check a SaaS DQ
    * suite runs on every table, as one engine pass: hourly totals on
    * the exact cent grid (long sums — ns91's trick), then per-group
    * count/Σx/Σx² in a second tiny agg, so mean, variance, and z are
    * fixed-operand-order doubles over exact integers — deterministic
    * at any partitioning, hash-gatable (dq03). Constant series
    * (var ≤ 0, fp-guard included) z-score to 0, not NaN.
    *
    * Scale shape: pass 1 reduces rows → one row per (group, hour)
    * with map-side combine; pass 2 aggregates that histogram-sized
    * frame; the stats broadcast back. Output: (groupCol, run_hr,
    * x_cents, z, is_anomaly). */
  def metricAnomalies(events: DataFrame, groupCol: String,
      tsCol: String, valCol: String,
      threshold: Double = 3.0): DataFrame = {
    val hourly = events
      .select(col(groupCol),
        graft.ingest.JsonIngest.runHr(col(tsCol)).as("run_hr"),
        round(col(valCol) * 100).cast("long").as("__c"))
      .groupBy(col(groupCol), col("run_hr"))
      .agg(sum(col("__c")).as("x_cents"))
    val stats = hourly.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x_cents")).as("s1"),
        sum(col("x_cents") * col("x_cents")).as("s2"))
      .select(col(groupCol), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("__mean"),
        ((col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n")) / col("n"))
          .as("__var"))
    val z = when(col("__var") <= 0d, lit(0.0))
      .otherwise((col("x_cents").cast("double") - col("__mean")) /
        sqrt(col("__var")))
    hourly.join(broadcast(stats), Seq(groupCol))
      .select(col(groupCol), col("run_hr"), col("x_cents"),
        z.as("z"), (abs(z) > threshold).as("is_anomaly"))
  }

  /** Referential-integrity check: rows in `child` whose `childKey`
    * has no match in `parent` (FK orphans — silent join loss waiting
    * to happen downstream). One row out per child table: total rows,
    * orphan rows. Parent keys are reduced to DISTINCT before the
    * join, so the probe side of the hash join carries one row per
    * key — broadcastable for dimensions, AQE-planned otherwise; a
    * null child key counts as an orphan (it matches nothing).
    * Output: (child_table, n_rows, n_orphans). */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, childTable: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(keys, col(childKey) === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("__pk"))).as("n_orphans"))
      .select(lit(childTable).as("child_table"), col("n_rows"),
        col("n_orphans"))
  }

  /** Completeness check on an hourly series: per group, report every
    * gap — an observed hour whose NEXT observed hour is more than one
    * hour later — with the count of missing hours. The exchange
    * carries one row per DISTINCT (group, hour); the lead() window
    * runs over that reduced frame, so a year of 100 TB events costs
    * ~8 760 rows per group after the map-side combine. Output:
    * (groupCol, gap_after_hr, missing_hours) — empty result means a
    * dense series, which is itself the assertion. */
  def seriesGaps(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val hours = events
      .select(col(groupCol), date_trunc("hour", col(tsCol)).as("__hr"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__hr"))
    hours.withColumn("__next", lead(col("__hr"), 1).over(w))
      .filter(col("__next").isNotNull &&
        unix_timestamp(col("__next")) - unix_timestamp(col("__hr")) > 3600L)
      .select(col(groupCol),
        graft.ingest.JsonIngest.runHr(col("__hr")).as("gap_after_hr"),
        ((unix_timestamp(col("__next")) - unix_timestamp(col("__hr"))) /
          lit(3600L) - lit(1L)).cast("long").as("missing_hours"))
  }

  /** Cross-snapshot schema drift — the contract check in front of
    * every mergeSchema read (j05) and MERGE (o15 fails fast on drift;
    * this names the drift instead): one row per column present in
    * EITHER snapshot's schema, labeled added / removed /
    * type_changed / unchanged, with both type names. Catalog-sized
    * metadata, not data — no job runs; the DataFrame form exists so
    * the report lands in the same DQ sink as every other check.
    * Output: (column_name, status, old_type, new_type), nulls where
    * a side lacks the column. */
  def schemaDrift(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.fields
      .map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.fields
      .map(f => f.name -> f.dataType.simpleString).toMap
    (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      val status = (o.get(c), n.get(c)) match {
        case (None, Some(_))          => "added"
        case (Some(_), None)          => "removed"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _                        => "unchanged"
      }
      (c, status, o.get(c), n.get(c))
    }.toDF("column_name", "status", "old_type", "new_type")
  }

  /** Join-key skew profile — the pre-join planning readout for §4.3's
    * salting/AQE decisions at 100 TB: the top-`k` heaviest key values
    * with exact counts, plus the table-wide totals needed to derive
    * any skew ratio (heavy-hitter share = cnt/total_rows, skew factor
    * = cnt·n_keys/total_rows) WITHOUT a second scan. One
    * map-combinable count per distinct key + a TakeOrdered top-k;
    * the totals broadcast back as literals (2-scalar driver agg).
    * All exact longs ⇒ hash-gates. Null keys count as a key (they
    * hot-spot a join like any other value — the classic null-skew
    * trap). Output: (key, cnt, total_rows, n_keys, rank). */
  def keySkewProfile(df: DataFrame, keyCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val t = counts
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("total"),
        count(lit(1)).as("nk")).head()
    // TakeOrderedAndProject (distributed per-partition top-k, never a
    // global sort over all distinct keys); the rank window then runs
    // over k rows only.
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("key"), col("cnt"),
        lit(t.getLong(0)).as("total_rows"),
        lit(t.getLong(1)).as("n_keys"), col("rank"))
  }
}
