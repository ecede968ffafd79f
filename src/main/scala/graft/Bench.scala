package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * The timed action is a `noop`-format write — it fully evaluates every
  * output column on the executors (unlike `.count()`, which lets
  * Catalyst prune unevaluated projections down to a parquet row count)
  * so the bench measures exactly what Verify verifies.
  *
  * Timing design, sized to ALWAYS finish inside the driver's wall
  * budget (round 3's warm-up + 3 full rounds × 43 queries did not:
  * the driver killed it at rc=124 and the round got NO number):
  *  - one untimed-in-spirit warm-up evaluation of every query (its
  *    time is recorded as a fallback),
  *  - then TWO timed rounds run ROUND-ROBIN over the re-timable
  *    subset, reporting the per-query minimum. Round-robin matters on
  *    this host: CPU-steal windows of ~30 s would inflate back-to-back
  *    repeats of one query together, but cannot hit the same query in
  *    all spaced-out rounds.
  *  - Re-timable = warm-up succeeded, warm-up time <= RETIME_CAP
  *    (slow queries keep their warm-up time — a 20 s query does not
  *    need steady-state precision, it needs to not eat the budget
  *    3 more times), and not an end-to-end pipeline (p01/p02 are
  *    ~10-job correctness gates; they run exactly once).
  *  - A global soft DEADLINE stops launching further evaluations once
  *    elapsed time crosses it, so even a steal-storm degrades to
  *    warm-up-only numbers instead of an external kill.
  * Failures are not swallowed: a failed query reports -1 and forces
  * total = -1 so a regression can never read as a speedup.
  *
  * Output: `value` = sum over ALL queries; `core_total` = sum over the
  * relational/operator core (names starting q, o, or j — not the ns
  * LLM-data suite, the p0 pipelines, or the s0 streaming queries) —
  * comparable against round 1's 20-query total after subtracting its
  * since-fixed o10 file storm.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    // 30 s: above any query's steal-inflated warm-up (s01 reads ~23 s
    // when a steal window lands on it, ~4 s calm) so one bad first run
    // can still be retimed; the global deadline bounds the worst case.
    val retimeCap =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETIME_CAP_SEC", "30").toDouble
    val deadline =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "360").toDouble
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    def run(name: String): Double = {
      val s0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, Double]
    def attempt(name: String): Unit =
      try {
        val sec = run(name)
        if (times.getOrElse(name, Double.MaxValue) > sec &&
          times.getOrElse(name, 0.0) >= 0) times(name) = sec
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          times(name) = -1.0
      }
    names.foreach(attempt) // warm-up round (also records a first time)
    val warmupWall = elapsed
    val warmupTimes = times.toMap
    def retimable(name: String): Boolean =
      times(name) >= 0 && times(name) <= retimeCap &&
        !name.startsWith("p0")
    for (_ <- 1 to rounds; name <- names if retimable(name))
      if (elapsed < deadline) attempt(name)
    // Phase decomposition to stderr: which queries' FIRST runs carry
    // the cold-start cost (codegen compile, ml fits, shuffle-file
    // creation) that the steady-state minima no longer show.
    System.err.println(f"[bench] warmup_wall=$warmupWall%.1f " +
      f"rounds_wall=${elapsed - warmupWall}%.1f")
    warmupTimes.toSeq.sortBy(-_._2).take(12).foreach { case (n, s) =>
      System.err.println(f"[bench] warmup $n%-36s $s%8.2f s " +
        f"(steady ${times(n)}%.2f)")
    }
    val results = names.map(n => n -> times(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def sumOr(rs: Seq[(String, Double)]): Double =
      if (rs.exists(_._2 < 0)) -1.0 else rs.map(_._2).sum
    val total = sumOr(results)
    // core = the r01-comparable relational/operator families (q/o/j);
    // the ns suite, pipelines, and streaming queries are extensions
    val core = sumOr(results.filter { case (n, _) =>
      n.startsWith("q") || n.startsWith("o") || n.startsWith("j") })
    println(s"""{"metric":"total","value":$total,"unit":"sec","core_total":$core,"bench_wall_sec":$elapsed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
