package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** O11: catalog table lifecycle (SURVEY.md §2.2). The reference wraps
  * every load in explicit DDL — `create table if not exists` around the
  * BigQuery prod write (/root/reference/dags/sql/write_weather_to_bigquery.sql:3),
  * `create or replace table` + `truncate` around each Snowflake stage
  * load (/root/reference/dags/sql/write_weather_to_snowflake_stage.sql:3-8)
  * — so a run never depends on the table already existing.
  *
  * Spark-side the same lifecycle is the catalog API plus save modes;
  * these helpers name the four verbs the reference uses. All of them
  * are metadata operations plus (at most) one distributed write — no
  * driver-side data movement, so they scale with the write itself.
  */
object Catalog {

  /** Backtick-quote a (possibly dotted) table name so identifiers with
    * reserved words, hyphens, or other specials survive SQL
    * interpolation; each dot-separated part is quoted on its own. */
  private def quoted(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")

  /** `create table if not exists` with a declared schema and no data —
    * the BigQuery-prod-side guard. No-op when the table exists. */
  def ensureTable(spark: SparkSession, name: String,
      schema: StructType): Unit = {
    if (!spark.catalog.tableExists(name)) {
      spark.catalog.createTable(name, "parquet", schema,
        Map.empty[String, String])
      ()
    }
  }

  /** `create or replace table ... as select`: the table ends up with
    * exactly `df`'s rows and schema, whether or not it existed —
    * parquet `saveAsTable` overwrite drops and recreates the table, so
    * the schema is replaced along with the rows. */
  def createOrReplaceTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** `truncate` then load: keeps the declared schema, replaces the
    * rows — the Snowflake-stage pattern (schema fixed by DDL, data
    * replaced every run). The table must already exist (the reference
    * always runs the DDL first); use [[ensureTable]] to guarantee it. */
  def truncateAndLoad(df: DataFrame, name: String): Unit = {
    val spark = df.sparkSession
    require(spark.catalog.tableExists(name),
      s"truncateAndLoad: table $name does not exist — run ensureTable first")
    spark.sql(s"TRUNCATE TABLE ${quoted(name)}")
    df.write.mode("append").saveAsTable(name)
  }

  /** `drop table if exists`. */
  def dropIfExists(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(name)}")
    ()
  }
}
