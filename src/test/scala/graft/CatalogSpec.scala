package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Catalog

/** O11 catalog DDL lifecycle: the reference's create-if-not-exists /
  * create-or-replace / truncate-and-load / drop verbs over managed
  * tables (see ops/Catalog.scala scaladoc for the reference lines). */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("ensureTable creates once, then is a no-op (create if not exists)") {
    val t = "graft_o11_ensure"
    Catalog.dropIfExists(spark, t)
    assert(!spark.catalog.tableExists(t))
    Catalog.ensureTable(spark, t, schema)
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).count() == 0)
    assert(spark.table(t).schema.fieldNames.sameElements(
      Seq("id", "name")))
    // second call must not fail or reset anything
    spark.createDataset(Seq((1L, "a"))).toDF("id", "name")
      .write.mode("append").saveAsTable(t)
    Catalog.ensureTable(spark, t, schema)
    assert(spark.table(t).count() == 1)
    Catalog.dropIfExists(spark, t)
  }

  test("createOrReplaceTable replaces rows AND schema (create or replace)") {
    val t = "graft_o11_cor"
    Catalog.dropIfExists(spark, t)
    Catalog.createOrReplaceTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    assert(spark.table(t).count() == 2)
    // replace with a DIFFERENT schema — create-or-replace semantics
    Catalog.createOrReplaceTable(
      Seq((7L, 0.5)).toDF("id", "score"), t)
    assert(spark.table(t).schema.fieldNames.sameElements(
      Seq("id", "score")))
    assert(spark.table(t).count() == 1)
    Catalog.dropIfExists(spark, t)
  }

  test("truncateAndLoad keeps schema, replaces rows; run-twice idempotent") {
    val t = "graft_o11_trunc"
    Catalog.dropIfExists(spark, t)
    Catalog.ensureTable(spark, t, schema)
    spark.createDataset(Seq((99L, "stale"))).toDF("id", "name")
      .write.mode("append").saveAsTable(t)
    val fresh = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Catalog.truncateAndLoad(fresh, t)
    Catalog.truncateAndLoad(fresh, t) // replay: same table state
    assert(spark.table(t).orderBy("id").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b")))
    Catalog.dropIfExists(spark, t)
    assert(!spark.catalog.tableExists(t))
  }
}
