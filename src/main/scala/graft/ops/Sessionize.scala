package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch (gap-based) sessionization: assign every event a per-key
  * session id such that consecutive events more than `gapUs` apart
  * start a new session. The batch twin of the Structured Streaming
  * `EventStream.sessionize` (flatMapGroupsWithState) — same semantics
  * over a closed input, expressed as ONE keyed window instead of
  * per-key state, so Catalyst plans a single exchange on the key and
  * one per-partition sort shared by both window functions (the
  * new-session lag flag and its running sum).
  *
  * Scale: one shuffle on `keys`, one sort; per-key data is processed
  * serially inside its reducer task, which is the correct shape when
  * key cardinality (users) ≫ cores and no single key dominates. A
  * pathological hot key serializes — the window analogue of join
  * skew — but unlike as-of (see `TemporalJoin.asofJoinChunked`) a
  * session may span any time chunk boundary, so chunking needs a
  * cross-chunk merge pass; at that point the streaming sessionizer
  * with state is the better engine and is already available.
  *
  * `tsCol` is a non-null long (epoch micros); `tieBreak` makes the
  * event order — and therefore the session split — deterministic when
  * two events share a timestamp. Output: input columns plus
  * `session_id` (0-based, per key, in time order).
  */
object Sessionize {
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
      gapUs: Long, tieBreak: String): DataFrame = {
    require(gapUs > 0, "gapUs must be > 0")
    require(!df.columns.contains("session_id"),
      "input already has a session_id column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull || col(tsCol) - prev > gapUs, 1L).otherwise(0L)
    // Running sum over the SAME (partition, order) spec — Spark plans
    // one Window operator with one sort for both functions.
    df.withColumn("session_id",
      sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** One row per session: bounds, event count, exact total of
    * `valueCol` (DECIMAL-pathed so the double sum is order-independent
    * — see Relational.exactSum). Map-side combinable aggregation after
    * the sessionize window; AQE reuses the exchange because the
    * groupBy keys extend the window's partition keys. */
  /** One row per session with the ORDERED event transcript: types
    * concatenated in (tsCol, tieBreak) order — the interaction-log →
    * training-example assembly step (chat threads, clickstreams).
    * collect_list is bounded by session length (the gap bounds it in
    * wall time), and array_sort on the (ts, tieBreak, type) struct
    * makes the order a total one, so the transcript string is
    * deterministic under any partitioning. Same single-exchange plan
    * as [[sessionSummary]]. Output: keys + (session_id,
    * session_start_us, n_events, transcript). */
  def sessionTranscripts(df: DataFrame, keys: Seq[String],
      tsCol: String, gapUs: Long, tieBreak: String, typeCol: String,
      sep: String = ">"): DataFrame =
    sessionize(df, keys, tsCol, gapUs, tieBreak)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start_us"),
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col(tsCol), col(tieBreak), col(typeCol)))),
            e => e.getField(typeCol)), sep).as("transcript"))

  /** Chat-template rendering with LOSS-MASK offsets — the SFT
    * dataloader's missing piece: turns render into one deterministic
    * template (`<|role|>text<|end|>`) and each turn reports the
    * [start_char, end_char) span it occupies in the conversation's
    * rendered concatenation, with `loss` marking assistant turns —
    * exactly the spans a trainer masks the loss to. Roles alternate
    * user-first in (tsCol, tieBreak) total order; offsets are one
    * running-sum window per conversation (prefix sums, no
    * re-rendering and no driver-side string assembly — the rendered
    * conversation never materializes whole unless a consumer
    * array_joins it). Output: (convCol, turn_rn, role, turn_text,
    * start_char, end_char, loss). */
  def chatTurnOffsets(df: DataFrame, convCol: String, tsCol: String,
      tieBreak: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol), col(tieBreak))
    val rn = row_number().over(w)
    val role = when(pmod(rn, lit(2)) === 1, lit("user"))
      .otherwise(lit("assistant"))
    val turn = concat(lit("<|"), role, lit("|>"), col(typeCol),
      lit(":"), col(tieBreak).cast("string"), lit("<|end|>"))
    val endChar = sum(length(turn)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.select(col(convCol), rn.cast("long").as("turn_rn"),
      role.as("role"), turn.as("turn_text"),
      (endChar - length(turn)).cast("long").as("start_char"),
      endChar.cast("long").as("end_char"),
      (pmod(rn, lit(2)) === 0).as("loss"))
  }

  def sessionSummary(df: DataFrame, keys: Seq[String], tsCol: String,
      gapUs: Long, tieBreak: String, valueCol: String): DataFrame =
    sessionize(df, keys, tsCol, gapUs, tieBreak)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start_us"),
        max(col(tsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        Relational.exactSum(col(valueCol)).as("total_value"))
}
