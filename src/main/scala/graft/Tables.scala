package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access for the driver's TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `sfDir`; reads are plain parquet scans so Catalyst's column
  * pruning / predicate pushdown reach the file source directly.
  *
  * At 100 TB these would be directory-partitioned tables; the access
  * path (`spark.read.parquet`) is identical — only the path changes,
  * and partition-pruning filters compose on top transparently.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    // reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so it arrives as nanos-since-epoch LongType. Normalize to Spark's
    // native micros TimestampType here so every downstream operator sees
    // a plain timestamp column. Branch on the arriving type so an
    // events table that already carries native micros timestamps
    // (a non-driver fixture) passes through untouched.
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Session configs every graft session needs (Verify/Bench/tests). */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")
}
