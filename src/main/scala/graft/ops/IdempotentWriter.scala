package graft.ops

import org.apache.spark.sql.DataFrame

/** O10: idempotent partition replacement (SURVEY.md §2.2).
  *
  * The reference implements "rerun an hour safely" as DELETE WHERE
  * run_hr = X then INSERT (/root/reference/dags/sql/
  * write_weather_to_bigquery.sql:51-98). Spark-native equivalent:
  * partitioned parquet + dynamic partition overwrite — `mode(overwrite)`
  * replaces exactly the partitions present in the incoming DataFrame and
  * leaves every other run_hr untouched. Rerun-equivalence
  * (write ∘ write ≡ write) holds by construction.
  *
  * At 100 TB this is also the read-side pruning story: every gold table
  * is directory-partitioned on its run key, so `WHERE run_hr = X`
  * touches one directory, not the table.
  */
object IdempotentWriter {

  val OverwriteModeKey = "spark.sql.sources.partitionOverwriteMode"

  /** Guards the set-conf → write → restore-conf window: the overwrite
    * mode is SESSION-wide, so a concurrent caller restoring its own
    * prior value mid-write would flip an in-flight dynamic overwrite
    * to static — which deletes every sibling partition of the target.
    * Callers in one session (concurrent bench warm-up, parallel
    * foreachBatch sinks) serialize here; the lock spans the write
    * because DataFrameWriter reads the conf at execution, not plan,
    * time. */
  private val confLock = new Object

  /** Write `df` partitioned by `partitionCols`, replacing only the
    * partitions present in `df`. */
  def replacePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = confLock.synchronized {
    val spark = df.sparkSession
    val prev = spark.conf.getOption(OverwriteModeKey)
    spark.conf.set(OverwriteModeKey, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(OverwriteModeKey, v)
      case None    => spark.conf.unset(OverwriteModeKey)
    }
  }
}
