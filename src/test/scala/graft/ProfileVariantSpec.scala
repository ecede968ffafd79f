package graft

import org.apache.spark.sql.functions._

import graft.dq.Profile
import graft.ingest.JsonIngest

class ProfileVariantSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes all column metrics in one pass") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(5L), None),
      (Some(3L), Some("a")), (None, Some("a")))
      .toDF("num", "str")
    val p = Profile.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = p("num")
    assert(num.getLong(1) == 4L)      // n_rows
    assert(num.getLong(2) == 1L)      // n_nulls
    assert(num.getLong(3) == 3L)      // approx_distinct (exact at n=3)
    assert(num.getString(4) == "1" && num.getString(5) == "5")
    val str = p("str")
    assert(str.getLong(2) == 1L)
    assert(str.getString(4) == "a" && str.getString(5) == "b")
  }

  test("variantNative: true VariantType column with typed path access") {
    val df = Seq(
      (1L, """{"k": 7, "tags": ["x", "y"], "meta": {"deep": true}}"""),
      (2L, """{"k": 9}"""))
      .toDF("id", "json_data")
    val v = JsonIngest.variantNative(df)
    assert(v.schema("variant").dataType.typeName == "variant")
    val rows = v.select(col("id"),
      variant_get(col("variant"), "$.k", "int").as("k"),
      variant_get(col("variant"), "$.tags[1]", "string").as("tag"),
      variant_get(col("variant"), "$.meta.deep", "boolean").as("deep"))
      .as[(Long, Int, Option[String], Option[Boolean])]
      .collect().sortBy(_._1)
    assert(rows(0) == ((1L, 7, Some("y"), Some(true))))
    assert(rows(1) == ((2L, 9, None, None)))
  }
}
