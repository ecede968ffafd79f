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
}
