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

  /** Institutional-memory link + monitoring-tag aspect records — the
    * two DataHub aspects the reference emits per monitored dataset
    * besides assertion runs
    * (/root/reference/include/utils/anomalo_datahub.py:82-136:
    * add_link upserts an institutionalMemory element with the runbook
    * URL, then a globalTags aspect carrying the Monitored_By_Anomalo
    * tag, each only if absent — i.e. an idempotent per-dataset upsert).
    *
    * Engine-side both aspects are one distributed projection over a
    * `datasets` frame (one row per monitored dataset, `table_name`
    * column): two records per dataset, discriminated by `aspect_name`
    * ('institutionalMemory' rows carry url/description, 'globalTags'
    * rows carry tag_urn; the other columns are null). The reference's
    * "only add if absent" read-modify-write collapses to `.distinct()`
    * here: the emitted set is deterministic and replay-idempotent, so
    * any downstream UPSERT sink converges — no per-dataset REST
    * round-trips, scale-free at any dataset count. */
  def monitoringAspects(datasets: DataFrame, platform: String,
      url: Column, description: Column,
      tag: String = "Monitored_By_Anomalo"): DataFrame = {
    val urn = datasetUrn(platform, col("table_name"))
    val base = datasets.select(col("table_name"), url.as("__url"),
      description.as("__desc")).distinct()
    val links = base.select(
      urn.as("dataset_urn"),
      lit("dataset").as("entity_type"),
      lit("UPSERT").as("change_type"),
      lit("institutionalMemory").as("aspect_name"),
      col("__url").as("url"),
      col("__desc").as("description"),
      lit(null).cast("string").as("tag_urn"))
    val tags = base.select(
      urn.as("dataset_urn"),
      lit("dataset").as("entity_type"),
      lit("UPSERT").as("change_type"),
      lit("globalTags").as("aspect_name"),
      lit(null).cast("string").as("url"),
      lit(null).cast("string").as("description"),
      lit(s"urn:li:tag:$tag").as("tag_urn"))
    links.unionAll(tags)
  }
}
