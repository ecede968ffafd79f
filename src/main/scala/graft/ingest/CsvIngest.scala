package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Declared-schema CSV ingest with malformed-row quarantine — the CSV
  * face of the bronze→silver load (SURVEY.md §2.1: the reference's
  * loads declare schemas and never infer on production data; same
  * rule here). PERMISSIVE mode parses what it can and lands the raw
  * line of every malformed row in the corrupt-record column, so a
  * curation pass quarantines bad rows as DATA instead of failing the
  * load or silently dropping them (DROPMALFORMED's failure mode).
  *
  * Scale: schema-declared CSV parse is a streaming-friendly map-side
  * scan (no inference pass over 100 TB); the quarantine flag is a
  * plain projection, so the split into clean/quarantined frames costs
  * no extra read.
  */
object CsvIngest {

  val corruptCol = "_corrupt_record"

  /** Read `path` as CSV under `schema`, appending `quarantined`
    * (true = the row failed to parse; its raw line is in
    * `_corrupt_record`). */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already declare $corruptCol")
    val withCorrupt = schema.add(corruptCol, StringType)
    spark.read.schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }
}
