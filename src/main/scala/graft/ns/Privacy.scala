package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (SURVEY.md §2.8 [NS]).
  *
  * [[TextOps]] handles content-level privacy (PII redaction and
  * pseudonymization INSIDE documents); this handles the RECORD-level
  * side: before an event/metadata table ships next to a corpus
  * release, its quasi-identifier combinations must not isolate
  * individuals. k-anonymity (Sweeney 2002) is the standard gate:
  * every released row must share its quasi-identifier tuple with at
  * least k−1 others.
  */
object Privacy {

  /** k-anonymity release audit with one generalization step (local
    * recoding): every row is annotated with the release level its
    * quasi-identifier equivalence class supports —
    *
    *  - level 0: the row's fine QI class (`qi0`) already has ≥ k
    *    members — releasable as-is;
    *  - level 1: the fine class is small, but among ONLY the
    *    escalated rows (level-0 failures) the coarse class (`qi1`)
    *    reaches k. Counting level-1 classes over escalated rows
    *    only — not the whole table — matters: rows already released
    *    at level 0 are published with finer QI values, so they
    *    cannot hide a level-1 row (its anonymity set is the rows
    *    published at ITS granularity);
    *  - level −1 (kept = false): even generalized, the class stays
    *    below k — suppress before release.
    *
    * Plan shape: QI-class sizes come from two map-combinable
    * groupBy-COUNTs (partial aggregation — the class table is small
    * by k-anonymity's own premise), joined back onto the rows; AQE
    * broadcasts the class tables, so the data rows are never
    * shuffled at all — a 100 TB event table is audited in one scan
    * plus two broadcast hash joins. (A per-row window COUNT would
    * exchange every row by QI key instead.)
    *
    * Output: input id + the qi0/qi1 columns + (n0, n1, level, kept);
    * n1 is null for rows that never escalated. */
  def kAnonymityLevels(df: DataFrame, idCol: String,
      qi0: Seq[(String, Column)], qi1: Seq[(String, Column)],
      k: Long): DataFrame = {
    require(k >= 1, "k must be positive")
    require(qi0.nonEmpty && qi1.nonEmpty, "QI column lists must be non-empty")
    val qi0Names = qi0.map(_._1)
    val qi1Names = qi1.map(_._1)
    val allNames = idCol +: (qi0Names ++ qi1Names)
    require(allNames.distinct.size == allNames.size,
      "id and QI output names must be pairwise distinct (alias a shared " +
        "input column under a second name for the coarse level)")
    val base = df.select(
      col(idCol) +:
        (qi0.map { case (n, c) => c.as(n) } ++
          qi1.map { case (n, c) => c.as(n) }): _*)
    val counts0 = base.groupBy(qi0Names.map(col): _*)
      .agg(count(lit(1)).as("n0"))
    val withN0 = base.join(counts0, qi0Names)
    val counts1 = withN0.filter(col("n0") < k)
      .groupBy(qi1Names.map(col): _*)
      .agg(count(lit(1)).as("n1"))
    withN0.join(counts1, qi1Names, "left")
      .withColumn("level",
        when(col("n0") >= k, 0L)
          .when(col("n1") >= k, 1L)
          .otherwise(-1L))
      .withColumn("kept", col("level") >= 0L)
      .select((Seq(col(idCol)) ++ qi0Names.map(col) ++ qi1Names.map(col) ++
        Seq(col("n0"),
          when(col("n0") < k, col("n1")).otherwise(lit(null).cast("long"))
            .as("n1"),
          col("level"), col("kept"))): _*)
  }
}
