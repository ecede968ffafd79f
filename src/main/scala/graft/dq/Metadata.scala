package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q4 (SURVEY.md §2.6): metadata/lineage emission. The reference pushes
  * every DQ run into DataHub as assertion run-events: one
  * AssertionRunEvent per check, addressed by deterministic URNs derived
  * from (platform, nativeType, dataset)
  * (/root/reference/include/utils/anomalo_datahub.py:50-80,138-198,
  * 202-279 — make_dataset_urn / make_assertion_urn over a guid of the
  * platform+nativeType+dataset dict).
  *
  * Engine-side the emission is a PROJECTION: dq_results → one
  * assertion-run record per check row, same deterministic addressing
  * (md5 guid over platform:check:dataset). The records are a DataFrame,
  * so the "emitter" is any Spark sink and the mapping runs distributed
  * and codegen'd — no per-record REST round-trips; at 100 TB the DQ
  * metadata fan-out is a map-side transform like any other.
  */
object Metadata {

  /** DataHub-style dataset URN for `table` on `platform`. */
  def datasetUrn(platform: String, table: Column): Column =
    concat(lit(s"urn:li:dataset:(urn:li:dataPlatform:$platform,"),
      table, lit(",PROD)"))

  /** One assertion-run record per dq_results row (FIXTURES.md A5
    * schema in, run-event records out). Deterministic: the wall-clock
    * `checked_at` is deliberately NOT carried — run identity is the
    * (assertion_urn, run_hr) pair, mirroring the reference's
    * timeseries aspect keyed by assertion URN + run id. */
  def assertionRunEvents(dqResults: DataFrame,
      platform: String): DataFrame = {
    val assertee = datasetUrn(platform, col("table_name"))
    dqResults.select(
      assertee.as("assertee_urn"),
      concat(lit("urn:li:assertion:"),
        md5(concat(lit(platform + ":"), col("check_name"), lit(":"),
          assertee))).as("assertion_urn"),
      col("check_name").as("native_type"),
      col("message").as("native_results"),
      when(col("success"), "SUCCESS").otherwise("FAILURE")
        .as("result_type"),
      col("run_hr"),
      when(col("pending"), "PENDING").otherwise("COMPLETE")
        .as("run_status"))
  }
}
