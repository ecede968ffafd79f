package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for §4.3 skew salting: measures what saltedJoin
  * actually buys on a planted power-law key, as task-time evidence —
  * not just the equality law BucketingSkewSpec proves.
  *
  * Setup: a fact table with half its rows on ONE hot key (the classic
  * power-law user) shuffle-joined against a 10k-key dim. AQE and
  * broadcast are disabled for the measurement: AQE's skew split would
  * partially mask the effect being measured (and salting exists
  * precisely for the paths where AQE can't act, e.g. streaming
  * micro-batches), and a broadcast join has no shuffle to skew —
  * salting targets big-big shuffle joins.
  *
  * Metric: per-task durations from a SparkListener. Unsalted, the hot
  * key lands on one reducer → max task ≈ wall time, max/p50 is huge.
  * Salted over `saltFactor` buckets the same rows spread over
  * saltFactor tasks → max/p50 flattens toward 1 and wall time drops
  * by ~(cores-fraction the hot reducer serialized).
  *
  * Output: one JSON line {"metric":"skew_salt", variants:{...}}.
  * Results recorded in SCALE.md. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 4000000L
    val saltFactor = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    Tables.sessionConfs.filterNot(_._1 == "spark.sql.adaptive.enabled")
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 50% of fact rows on key 0, the rest uniform over 10k dim keys —
    // all content-addressed (no RNG state, reruns identical)
    val nKeys = 10000L
    val fact = spark.range(rows).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1L)
        .as("k"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double") / 1000.0)
        .as("v"))
    val dim = spark.range(nKeys).select(col("id").as("dk"),
      (pmod(xxhash64(col("id"), lit(13)), lit(100L)).cast("double") / 100.0)
        .as("w"))

    val taskMs = ArrayBuffer.empty[Long]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += te.taskInfo.duration }
    }

    def measure(name: String, df: org.apache.spark.sql.DataFrame)
        : (String, Double, Long, Long, Int) = {
      // force everything: join + a cheap agg so no column is pruned
      val plan = df.agg(sum(col("v") * col("w")).as("s"))
      taskMs.synchronized(taskMs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      plan.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val ds = taskMs.synchronized(taskMs.sorted.toArray)
      val p50 = if (ds.isEmpty) 0L else ds(ds.length / 2)
      val mx = if (ds.isEmpty) 0L else ds.last
      (name, wall, mx, p50, ds.length)
    }

    def unsalted = fact.join(dim, col("k") === col("dk"))
    def salted = graft.ops.Skew.saltedJoin(fact, dim, "k", "dk", saltFactor)

    // warm-up (codegen compile, shuffle-file creation), then measure
    measure("warmup_unsalted", unsalted)
    measure("warmup_salted", salted)
    val results = Seq(measure("unsalted", unsalted),
      measure("salted", salted))

    // ---- window-skew twin: as-of join on ONE key ----
    // The window analogue of the join skew above: every left row has
    // the same key, so asofJoin's keyed window serializes on one
    // reducer while asofJoinChunked spreads the timeline over
    // rows/(chunk-span) parallel tasks. Right side = 1/16 of left.
    val asofRows = rows / 4
    val lft = spark.range(asofRows).select(lit(0L).as("k"),
      pmod(xxhash64(col("id")), lit(asofRows * 4)).as("ts"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double") / 1000.0)
        .as("v"))
    val rgt = spark.range(asofRows / 16).select(lit(0L).as("k"),
      pmod(xxhash64(col("id"), lit(9)), lit(asofRows * 4)).as("qts"),
      (pmod(xxhash64(col("id"), lit(13)), lit(100L)).cast("double") / 100.0)
        .as("w"))
    def asofAgg(df: org.apache.spark.sql.DataFrame) =
      df.select(col("v"), coalesce(col("w"), lit(0.0)).as("w"))
    def plainAsof = asofAgg(graft.ops.TemporalJoin.asofJoin(
      lft, rgt, Seq("k"), "ts", "qts", payload = Seq("w")))
    def chunkedAsof = asofAgg(graft.ops.TemporalJoin.asofJoinChunked(
      lft, rgt, Seq("k"), "ts", "qts", payload = Seq("w"),
      chunk = math.max(1L, asofRows * 4 / (saltFactor * 4))))
    measure("warmup_asof_plain", plainAsof)
    measure("warmup_asof_chunked", chunkedAsof)
    val asofResults = Seq(measure("asof_plain", plainAsof),
      measure("asof_chunked", chunkedAsof))

    def js(rs: Seq[(String, Double, Long, Long, Int)]) =
      rs.map { case (n, wall, mx, p50, nt) =>
        f"""\"$n\":{\"wall_sec\":$wall%.2f,\"max_task_ms\":$mx,\"p50_task_ms\":$p50,\"max_over_p50\":${if (p50 > 0) mx.toDouble / p50 else -1}%.1f,\"tasks\":$nt}"""
      }.mkString(",")
    val line = s"""{"metric":"skew_salt","rows":$rows,"salt_factor":$saltFactor,"hot_key_share":0.5,"asof_rows":$asofRows,${js(results)},${js(asofResults)}}"""
    spark.stop()
    println(line)
  }
}
