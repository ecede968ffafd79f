package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExtendedMode, FormattedMode}

/** Dev tool: print the formatted physical plan of named registry
  * queries (the `.explain("formatted")` audit the scale rules demand).
  *
  * Caveat: "print the plan" is only evaluation-free for the purely
  * declarative entries. Driver-gated registry entries that MATERIALIZE
  * as part of constructing their DataFrame — the scratch-dir writers
  * (o10, j04, j05, p0*), index-building ANN entries, and every s0*
  * streaming query (which runs its stream to completion and returns
  * the drained sink) — execute those jobs fully before the plan of
  * the final read is printed. PlanDump on those names is a run, not
  * a peek.
  *
  * Usage: runMain graft.PlanDump SF_DIR name1,name2,... [extended]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump SF_DIR name1,name2,...")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val mode =
      if (args.length > 2 && args(2) == "extended") ExtendedMode
      else FormattedMode
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
