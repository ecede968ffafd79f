package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.functions.py_to_json

/** Bronze→silver ingest operators (SURVEY.md §2.1 S1/S6/S7/S9, §2.2
  * O3/O8/O9).
  *
  * Two read regimes, mirroring the reference's two warehouses:
  *  - declared-schema (BigQuery `LOAD DATA ... (schema)` analogue,
  *    /root/reference/dags/sql/write_weather_to_bigquery_stage.sql:5-51):
  *    `spark.read.schema(s).json(path)` — typed struct columns.
  *  - schema-on-read (Snowflake VARIANT analogue,
  *    /root/reference/dags/sql/write_weather_to_snowflake_stage.sql:1-12):
  *    raw text kept as one `json_data` string column, parsed lazily with
  *    ONE `from_json` per query (never N× `get_json_object` re-parses).
  *
  * Both paths repair python-repr payloads first (the reference only
  * repairs the cocktails path and leaks dirty weather JSON —
  * /root/reference/dags/sandbox_data_pipeline.py:64 vs :123-126; we
  * normalize both).
  */
object JsonIngest {

  /** S7: raw text load — the VARIANT analogue. `wholeFile=false`: one
    * row per LINE (newline-delimited JSON fixtures). `wholeFile=true`:
    * one row per FILE — the faithful analogue of the reference's
    * one-S3-object-per-API-response bronze layout, and required when
    * payload strings legally contain raw CR/LF (the dirty-JSON quirk
    * O9 exists to repair). Parallelism note: wholeFile reads each
    * object as one task input; bronze is many small objects read in
    * parallel, never one giant file. */
  def readVariant(spark: SparkSession, path: String,
      wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)
      .toDF("json_data")

  /** O9 applied at ingest: repaired strict-JSON column. */
  def repaired(df: DataFrame, in: String = "json_data"): DataFrame =
    df.withColumn(in, py_to_json(col(in)))

  /** S6: declared-schema load after repair — one document per bronze
    * object, schema applied on read (nothing inferred). */
  def readStaged(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val raw = repaired(readVariant(spark, path, wholeFile = true))
    raw.select(from_json(col("json_data"), schema).as("doc"))
      .select(col("doc.*"))
  }

  /** O3: single-parse VARIANT path access — parse once into a struct
    * column, then project paths from it. */
  def variantParsed(df: DataFrame, schema: StructType,
      in: String = "json_data"): DataFrame =
    df.withColumn("parsed", from_json(col(in), schema))

  /** O3/S7, Spark-4-native: parse once into a true `VariantType`
    * column — the engine-level Snowflake-VARIANT analogue
    * (schema-on-read, binary-encoded, typed path access via
    * `variant_get` with no re-parse and no declared schema). Prefer
    * this over the string+from_json route when downstream paths are
    * not known up front; the binary encoding also columnar-shreds in
    * parquet. */
  def variantNative(df: DataFrame, in: String = "json_data"): DataFrame =
    df.withColumn("variant", parse_json(col(in)))

  /** O8: key normalization `lower().replace(" ", "_")`
    * (/root/reference/dags/sandbox_data_pipeline.py:113). */
  def normKey(c: Column): Column = lower(regexp_replace(c, " ", "_"))

  /** O7: run-hour derivation ts → YYYYMMDDHH00 as long
    * (/root/reference/dags/sandbox_data_pipeline.py:76-81). */
  def runHr(ts: Column): Column =
    concat(date_format(ts, "yyyyMMddHH"), lit("00")).cast("long")
}
