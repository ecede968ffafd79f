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
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize an event-time column to Spark's native micros
    * TimestampType, whatever physical shape the fixture shipped it in.
    * The driver has regenerated `events.parquet` across rounds with
    * different encodings, so branch on the ARRIVING type:
    *  - TIMESTAMP(NANOS) parquet + `nanosAsLong` session conf →
    *    nanos-since-epoch LongType → truncate to micros;
    *  - plain `timestamp[us]` with no UTC-adjustment flag → Spark reads
    *    TIMESTAMP_NTZ → cast to TimestampType (exact: the session time
    *    zone is pinned UTC, so wall-clock == instant);
    *  - already TimestampType → untouched.
    * Batch reads (above) and the streaming file sources share THIS one
    * helper — round 7 broke precisely because the streaming entries
    * hand-rolled the Long-nanos branch only. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
  }

  /** Session configs every graft session needs (Verify/Bench/tests).
    * The extensions entry makes graft's custom expressions SQL-
    * callable in every session ([[graft.GraftExtensions]]). */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // Whole-stage-codegen class cache sized to the workload: the
    // default (100 entries) thrashes in any long-lived session that
    // executes hundreds of DISTINCT queries — every re-execution then
    // re-runs janino compilation AND restarts HotSpot JIT profiling
    // from scratch on the freshly-loaded class, which taxes the
    // re-run of every query (measured on the 301-query bench; see
    // OPTIMIZATION_r18.md). Scale-independent: the cache is keyed on
    // generated source, costs only driver metaspace (~KBs/class), and
    // a production multi-tenant SQL service sizes it the same way.
    "spark.sql.codegen.cache.maxEntries" -> "4096",
    // Streaming checkpoint file checksums (new default-on in Spark
    // 4.1) write a companion .crc-style checksum FILE for every
    // checkpoint file through an async pool the writer then blocks
    // on. On file:// the Hadoop LocalFileSystem ALREADY writes CRC
    // companions for every file (ChecksumFileSystem), and HDFS
    // checksums at the block layer — so locally and on HDFS the
    // layer duplicates existing integrity work, and each extra file
    // create costs two forked processes (chmod/readlink) on a
    // no-native-lib Hadoop. Measured at sf0.1: state-store commit
    // time dropped ~4x per stream with it off (OPTIMIZATION_r19.md).
    // Parameterized: an object-store deployment (no FS-level
    // read-back checksums) turns it back on via the env override.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" ->
      sys.env.getOrElse("SPARK_GRAFT_STREAM_CKPT_CHECKSUM", "false"),
    "spark.sql.extensions" -> "graft.GraftExtensions")
}
