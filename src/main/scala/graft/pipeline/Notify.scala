package graft.pipeline

import org.apache.spark.sql.DataFrame

/** S12: query-result → notification message (SURVEY.md §2.1). The
  * reference's SqlToSlackOperator runs a SQL query and templates the
  * result DataFrame into a Slack message
  * (/root/reference/dags/test.py:128-137, template `{{ results_df }}`).
  * Engine-side that is: evaluate, render, hand the string to any
  * transport. Collect is bounded by `maxRows` — notification queries
  * are small by contract (the reference's is 2 rows); this is NOT a
  * data-movement path.
  */
object Notify {

  /** Render `df` into `template`, replacing `{{ results_df }}` with a
    * fixed-width table of the first `maxRows` rows. */
  def renderMessage(df: DataFrame, template: String,
      maxRows: Int = 20): String = {
    val names = df.columns
    val rows = df.limit(maxRows).collect()
      .map(_.toSeq.map(v => if (v == null) "null" else v.toString))
    val table = (names.toSeq +: rows.toSeq)
      .map(_.mkString(" | ")).mkString("\n")
    template.replace("{{ results_df }}", table)
  }
}
