package graft

import org.apache.spark.sql.SparkSession

/** One-off scaling probe for NAMED registry queries: runs each query
  * from `SparkEntry.queries` against a fixture dir with the same
  * noop-write forcing as `graft.Bench`, one warm-up evaluation plus
  * `SPARK_GRAFT_BENCH_ROUNDS` timed evaluations (minimum kept), and
  * prints one JSON line. Exists so new operators can get sf0.1→sf1
  * evidence (SCALE.md) without paying a full 70-query bench at sf1.
  *
  * Usage: runMain graft.QueryProbe SF_DIR name1,name2,...
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe SF_DIR name1,name2,...")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val timings = names.map { n =>
      val cold = once(n) // warm-up: JIT + codegen + file listing
      (n, cold, (1 to rounds).map(_ => once(n)).min)
    }
    spark.stop()
    val qs = timings
      .map { case (n, _, s) => f""""$n":$s%.3f""" }.mkString(",")
    // cold = the first-ever evaluation, the number the bench warm-up
    // watchdog judges against capMin (poisoned-warm-up trap)
    val cs = timings
      .map { case (n, c, _) => f""""$n":$c%.3f""" }.mkString(",")
    println(s"""{"metric":"query_probe","sf":"$sfDir","rounds":$rounds,"queries":{$qs},"cold":{$cs}}""")
  }
}
