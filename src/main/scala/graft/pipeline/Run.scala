package graft.pipeline

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dq.Checks
import graft.dq.Checks.CheckConfig
import graft.ingest.JsonIngest
import graft.model.Schemas
import graft.ops.Manifest

/** §3.1 pipeline composition: the reference's hourly
  * bronze→silver→gold→DQ flow restated as one Spark application
  * (/root/reference/dags/sandbox_data_pipeline.py:230-245,376-395).
  * The Airflow DAG's task graph collapses into function composition;
  * Spark supplies the intra-stage parallelism Airflow's task mapping
  * provided.
  *
  * Two sinks per entity mirror the reference's two warehouses: the
  * primary "nested" gold (BigQuery-analogue typed structs) and a
  * secondary "flat" gold (Snowflake-analogue flat projection), the
  * latter skippable via config exactly like the reference's
  * skip_snowflake_write variable (C3,
  * /root/reference/include/utils/operators.py:11-25).
  */
object Run {

  /** Pipeline wiring for one run. `sensorPollMs` is short because the
    * offline filesystem is local; the reference polls GCS at 60 s with
    * a 600 s budget.
    *
    * `attempt` names the logical attempt of a (run_hr, attempt) gold
    * commit: an orchestrator RETRY of the same attempt replays
    * idempotently at the transaction layer (the S2 skip-if-exists
    * guard — nothing republishes, nothing a reader references is
    * touched), while a deliberate BACKFILL with revised bronze passes
    * a new attempt id and atomically replaces the hour. */
  final case class PipelineConfig(
      bronzeDir: String,
      goldDir: String,
      dqDir: String,
      skipSecondSink: Boolean = false,
      sensorTimeoutMs: Long = 5000L,
      sensorPollMs: Long = 50L,
      attempt: String = "a1")

  /** What a run did — counts for orchestration/alerting, not data. */
  final case class RunReport(
      runHr: Long,
      weatherRows: Long,
      cocktailsRows: Long,
      dqAllPassed: Boolean,
      secondSinkWritten: Boolean)

  /** S4: the city dimension. The reference fetches these five from an
    * API-Gateway Lambda (/root/reference/dags/sandbox_data_pipeline.py
    * :84-91); offline they are a literal dimension source. */
  def topCities(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("New York", "Los Angeles", "Chicago", "Houston", "Phoenix")
      .toDF("city")
  }

  /** S9: raw text object sink — one object per (name, payload), the
    * bronze landing write (`s3.put_object` analogue,
    * /root/reference/dags/sandbox_data_pipeline.py:69). Driver-side by
    * design: bronze ingest lands a handful of API payloads per run,
    * not distributed data. */
  def writeRawText(spark: SparkSession, dir: String,
      payloads: Seq[(String, String)]): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    payloads.foreach { case (name, body) =>
      val out = fs.create(new Path(dir, name), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
  }

  /** S11: file-arrival sensor — poll until every named object exists
    * under `dir` (name normalization mirrors the reference's
    * `lower().replace(" ","_") + ".json"`,
    * /root/reference/include/utils/operators.py:59-70). Returns false
    * on timeout instead of raising: the caller decides (C4
    * none_failed semantics). */
  def awaitFiles(spark: SparkSession, dir: String, names: Seq[String],
      timeoutMs: Long, pollMs: Long): Boolean = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val targets = names.map(n =>
      new Path(dir, n.toLowerCase.replace(" ", "_")))
    val deadline = System.currentTimeMillis() + timeoutMs
    var missing = targets
    while (missing.nonEmpty && System.currentTimeMillis() < deadline) {
      missing = missing.filterNot(fs.exists)
      if (missing.nonEmpty) Thread.sleep(pollMs)
    }
    missing.isEmpty
  }

  /** O12/O13: audit + partition-key columns every gold row carries
    * (created_at_ts DEFAULT CURRENT_TIMESTAMP and the Jinja-injected
    * run_hr literal of the reference's gold DDL). `at` injects the
    * batch clock: CURRENT_TIMESTAMP is statement-constant in the
    * reference warehouses, so the audit value is one instant per
    * batch — passing it explicitly makes replays/backfills stamp the
    * ORIGINAL batch time (and makes the o12 gate deterministic);
    * None keeps the wall-clock default. The injected clock is an
    * [[java.time.Instant]], not a java.sql.Timestamp: Timestamp.valueOf
    * parses in the JVM default timezone, which would make the stamped
    * instant (and any hash gate over it) environment-sensitive. */
  def withAuditCols(df: DataFrame, runHr: Long,
      at: Option[java.time.Instant] = None): DataFrame =
    df.withColumn("run_hr", lit(runHr))
      .withColumn("created_at_ts",
        at.map(lit(_)).getOrElse(current_timestamp()))

  /** BigQuery-analogue nested gold: structs rebuilt with parsed
    * timestamps (O1/O2/O6 — nested projection, struct construction,
    * `timestamp(localtime || ':00')` munging,
    * /root/reference/dags/sql/write_weather_to_bigquery.sql:58-96). */
  def weatherGoldNested(stage: DataFrame): DataFrame =
    stage.select(
      struct(
        col("location.name").as("name"),
        col("location.region").as("region"),
        col("location.country").as("country"),
        col("location.lat").as("lat"),
        col("location.lon").as("lon"),
        col("location.tz_id").as("tz_id"),
        col("location.localtime_epoch").as("localtime_epoch"),
        to_timestamp(concat(col("location.localtime"), lit(":00")),
          "yyyy-MM-dd HH:mm:ss").as("localtime_ts")).as("location"),
      struct(
        to_timestamp(concat(col("current.last_updated"), lit(":00")),
          "yyyy-MM-dd HH:mm:ss").as("last_updated_ts"),
        col("current.temp_c").as("temp_c"),
        col("current.temp_f").as("temp_f"),
        col("current.is_day").as("is_day"),
        struct(
          col("current.condition.text").as("text"),
          col("current.condition.code").as("code")).as("condition"),
        col("current.humidity").as("humidity"),
        col("current.cloud").as("cloud"),
        col("current.uv").as("uv")).as("current"))

  /** Snowflake-analogue flat gold: typed flat projection with the
    * cast chains of the reference (O3/O4/O5/O6 — `::timestamp`,
    * `is_day::int::boolean`,
    * /root/reference/dags/sql/write_weather_to_snowflake.sql:31-52). */
  def weatherGoldFlat(stage: DataFrame): DataFrame =
    stage.select(
      JsonIngest.normKey(col("location.name")).as("city_key"),
      col("location.name").as("city"),
      col("location.country").as("country"),
      to_timestamp(concat(col("location.localtime"), lit(":00")),
        "yyyy-MM-dd HH:mm:ss").as("localtime_ts"),
      col("current.temp_c").cast("double").as("temp_c"),
      col("current.temp_f").cast("double").as("temp_f"),
      col("current.is_day").cast("int").cast("boolean").as("is_day"),
      col("current.condition.text").as("condition_text"),
      col("current.condition.code").as("condition_code"),
      col("current.humidity").as("humidity"),
      col("current.cloud").as("cloud"))

  /** Cocktails gold: lateral flatten of the drinks array then the
    * data-driven rename map (J1 + O14,
    * /root/reference/dags/sql/write_cocktails_to_bigquery.sql:122-176). */
  def cocktailsGold(stage: DataFrame): DataFrame =
    stage.select(explode(col("drinks")).as("drink"))
      .select(Schemas.cocktailsRenames.map { case (from, to) =>
        col(s"drink.`$from`").as(to)
      }: _*)
      .withColumn("id_drink",
        col("id_drink").cast(org.apache.spark.sql.types.DecimalType(38, 9)))

  /** The flagship entry point: one batch run for one run_hr. Bronze
    * is expected under `bronzeDir/<entity>/run_hr=<hr>/` (the
    * reference's S3 key layout). Executes: sensor → staged reads →
    * DQ-gated nested gold writes → optional flat second sink →
    * dq_results append.
    *
    * Gold lands through the TRANSACTIONAL commit layer (r15 verdict
    * #1 — [[graft.ops.Manifest]] is the engine's default write path,
    * not a sidecar): each entity's run_hr partition publishes as one
    * atomic commit keyed `<entity>_<runHr>_<attempt>`, so a reader
    * racing the publish sees the previous snapshot or the new one,
    * never a half-written directory; an orchestrator retry of the
    * same attempt replays idempotently (O10's replace-exactly-this-
    * partition semantics live at `(run_hr, attempt)` grain — replace
    * by committing a NEW attempt, replay by re-running the same one).
    * Gold tables are read through [[graft.ops.Manifest.read]]. The
    * path-based [[graft.ops.IdempotentWriter]] remains the legacy
    * single-writer path (gated by o10). */
  def run(spark: SparkSession, cfg: PipelineConfig,
      runHr: Long): RunReport = {
    import spark.implicits._
    val weatherBronze = s"${cfg.bronzeDir}/weather/run_hr=$runHr"
    val cocktailsBronze = s"${cfg.bronzeDir}/cocktails/run_hr=$runHr"

    // S11: wait for this run's objects (replication is asynchronous in
    // the reference; locally the sensor just verifies layout).
    val cities = topCities(spark).as[String].collect().toSeq
    val weatherReady = awaitFiles(spark, weatherBronze,
      cities.map(_ + ".json"), cfg.sensorTimeoutMs, cfg.sensorPollMs)
    val cocktailsReady = awaitFiles(spark, cocktailsBronze,
      Seq("cocktails.json"), cfg.sensorTimeoutMs, cfg.sensorPollMs)
    require(weatherReady && cocktailsReady,
      s"bronze objects missing for run_hr=$runHr after " +
        s"${cfg.sensorTimeoutMs}ms")

    val dqSink: DataFrame => Unit =
      _.write.mode("append").parquet(cfg.dqDir)

    // Weather: staged read (S6) → nested gold → DQ gate (Q2) → O10.
    val wStage = JsonIngest.readStaged(spark, s"$weatherBronze/*.json",
      Schemas.weatherStage)
    val wGold = withAuditCols(weatherGoldNested(wStage), runHr)
      .localCheckpoint(eager = false) // plan reuse across gate + 2 sinks
    Checks.gate(wGold, "weather_gold", runHr, CheckConfig(
      minRows = 1,
      maxNullRate = Map("location" -> 0.0, "current" -> 0.0),
      expectedRunHr = Some(runHr),
      uniqueKey = Some(Seq("location.name"))))(dqSink)
    val wVersion = Manifest.commitReplacePartitions(wGold,
      s"${cfg.goldDir}/weather", "run_hr",
      s"weather_${runHr}_${cfg.attempt}")

    // C3: the second (flat/Snowflake-analogue) sink is skippable.
    val wfVersion =
      if (cfg.skipSecondSink) None
      else Some(Manifest.commitReplacePartitions(
        withAuditCols(weatherGoldFlat(wStage), runHr),
        s"${cfg.goldDir}/weather_flat", "run_hr",
        s"weather_flat_${runHr}_${cfg.attempt}"))

    // Cocktails: staged read → explode+rename gold → gate → O10.
    val cStage = JsonIngest.readStaged(spark, s"$cocktailsBronze/*.json",
      Schemas.cocktailsStage)
    val cGold = withAuditCols(cocktailsGold(cStage), runHr)
      .localCheckpoint(eager = false)
    Checks.gate(cGold, "cocktails_gold", runHr, CheckConfig(
      minRows = 1,
      maxNullRate = Map("id_drink" -> 0.0, "drink" -> 0.0),
      expectedRunHr = Some(runHr),
      uniqueKey = Some(Seq("id_drink"))))(dqSink)
    val cVersion = Manifest.commitReplacePartitions(cGold,
      s"${cfg.goldDir}/cocktails", "run_hr",
      s"cocktails_${runHr}_${cfg.attempt}"): Long

    // Run-level atomicity (p01 v3, r16 verdict missing #2): the
    // per-table commits above are invisible to PIN-ROUTED readers
    // until this ONE pin commit flips every gold table of the run
    // together — a reader between the weather and cocktails commits
    // can no longer see a mixed run_hr. Same-attempt replays
    // short-circuit at both layers (table commits return their
    // existing versions; the pin commit's key is already logged).
    Manifest.commitTablePins(spark, cfg.goldDir,
      Map("weather" -> wVersion, "cocktails" -> cVersion) ++
        wfVersion.map("weather_flat" -> _),
      s"run_${runHr}_${cfg.attempt}"): Unit

    val wRows = readGold(spark, cfg, "weather")
      .filter(col("run_hr") === runHr).count()
    val cRows = readGold(spark, cfg, "cocktails")
      .filter(col("run_hr") === runHr).count()
    RunReport(runHr, wRows, cRows, dqAllPassed = true,
      secondSinkWritten = !cfg.skipSecondSink)
  }

  /** The run-consistent gold reader: resolves `entity` through the
    * run-level pins, so two entities read in one job come from the
    * same run cut — both-old or both-new during a publish, never
    * mixed (the racing-reader law in PipelineSpec). */
  def readGold(spark: SparkSession, cfg: PipelineConfig,
      entity: String): DataFrame =
    Manifest.readPinned(spark, cfg.goldDir, entity, "run_hr")
}
