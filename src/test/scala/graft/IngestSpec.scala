package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

import graft.ingest.JsonIngest
import graft.model.Schemas
import graft.ops.IdempotentWriter

class IngestSpec extends SparkSpec {

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  // python-repr weather doc, as the reference's unrepaired path writes it
  // (str(response.json()) — /root/reference/dags/sandbox_data_pipeline.py:64)
  private val weatherPyRepr =
    "{'location': {'name': 'New York', 'region': 'NY', 'country': 'USA', " +
      "'lat': 40.71, 'lon': -74.01, 'tz_id': 'America/New_York', " +
      "'localtime_epoch': 1723450000, 'localtime': '2026-08-12 07:00'}, " +
      "'current': {'last_updated_epoch': 1723449900, " +
      "'last_updated': '2026-08-12 06:55', 'temp_c': 24.5, 'temp_f': 76.1, " +
      "'is_day': 1, 'condition': {'text': 'Sunny', 'icon': 'sun.png', " +
      "'code': 1000}, 'wind_mph': 5.6, 'wind_kph': 9.0, 'wind_degree': 210, " +
      "'wind_dir': 'SW', 'pressure_mb': 1015.0, 'pressure_in': 29.97, " +
      "'precip_mm': 0.0, 'precip_in': 0.0, 'humidity': 60, 'cloud': 10, " +
      "'feelslike_c': 25.0, 'feelslike_f': 77.0, 'vis_km': 16.0, " +
      "'vis_miles': 9.9, 'uv': 5.0, 'gust_mph': 8.1, 'gust_kph': 13.0}}"

  test("S6/S7/O9: variant read + repair + declared-schema parse") {
    val dir = tmpDir("graft_weather")
    Files.writeString(dir.resolve("new_york.json"), weatherPyRepr + "\n")
    val staged = JsonIngest.readStaged(spark, dir.toString, Schemas.weatherStage)
    val row = staged.select(
      col("location.name"), col("current.condition.code"),
      col("current.is_day"), col("current.temp_c")).collect()(0)
    assert(row.getString(0) == "New York")
    assert(row.getLong(1) == 1000L)
    assert(row.getLong(2) == 1L)
    assert(row.getDecimal(3).doubleValue() == 24.5)
  }

  test("cocktails: 57-field array schema, explode, data-driven rename") {
    val doc = "{'drinks': [{'idDrink': '11470', 'strDrink': 'Margarita', " +
      "'strInstructionsZH-HANS': 'zh', 'strIngredient1': 'Tequila',}, " +
      "{'idDrink': '11471', 'strDrink': 'Mojito',}]}"
    val dir = tmpDir("graft_cocktails")
    Files.writeString(dir.resolve("cocktails.json"), doc + "\n")
    val staged = JsonIngest.readStaged(spark, dir.toString, Schemas.cocktailsStage)
    val drinks = staged.select(explode(col("drinks")).as("drink"))
      .select(col("drink.*"))
    assert(drinks.count() == 2)
    assert(drinks.columns.length == 51)
    val renamed = drinks.select(Schemas.cocktailsRenames.map {
      case (o, n) => col(s"`$o`").as(n)
    }: _*)
    // Full gold-name parity with the reference insert list
    // (/root/reference/dags/sql/write_cocktails_to_bigquery.sql:66-115).
    val expectedGold = Set(
      "date_modified", "id_drink", "alcoholic", "category",
      "creative_commons_confirmed", "drink", "drink_alternate",
      "drink_thumb", "glass", "iba", "image_attribution", "image_source",
      "instructions", "instructions_de", "instructions_es",
      "instructions_fr", "instructions_it", "instructions_zh_hans",
      "instructions_zh_hant", "tags", "video") ++
      (1 to 15).flatMap(i => Seq(s"ingredient$i", s"measure$i"))
    assert(renamed.columns.toSet == expectedGold)
    val m = renamed.filter(col("id_drink") === "11470").collect()(0)
    assert(m.getAs[String]("drink") == "Margarita")
  }

  test("O10: dynamic partition overwrite is idempotent and partial") {
    val out = tmpDir("graft_o10").toString + "/gold"
    import spark.implicits._
    val df1 = Seq((202601010100L, "a", 1L), (202601010200L, "b", 2L))
      .toDF("run_hr", "k", "v")
    IdempotentWriter.replacePartitions(df1, out, Seq("run_hr"))
    // rewrite only hour 01 with new data; hour 02 must survive
    val df2 = Seq((202601010100L, "a2", 10L)).toDF("run_hr", "k", "v")
    IdempotentWriter.replacePartitions(df2, out, Seq("run_hr"))
    IdempotentWriter.replacePartitions(df2, out, Seq("run_hr")) // idempotent
    val back = spark.read.parquet(out)
      .select(col("run_hr").cast("long"), col("k"), col("v"))
      .orderBy("run_hr").collect()
    assert(back.length == 2)
    assert(back(0).getString(1) == "a2" && back(0).getLong(2) == 10L)
    assert(back(1).getString(1) == "b")
  }

  test("O7/O8 helpers") {
    import spark.implicits._
    val df = Seq("2026-08-12 07:30:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    assert(df.select(JsonIngest.runHr(col("ts"))).collect()(0).getLong(0)
      == 202608120700L)
    assert(Seq("New York City").toDF("c")
      .select(JsonIngest.normKey(col("c"))).collect()(0).getString(0)
      == "new_york_city")
  }

  test("compaction (j08 shape): file count drops to the coalesce " +
      "target, content identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val d = (0L until 200L).map(i => (i, s"doc $i")).toDF("id", "txt")
    d.repartition(64).write.parquet(s"$dir/frag")
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/frag") == 64)
    spark.read.parquet(s"$dir/frag").coalesce(2)
      .write.parquet(s"$dir/compact")
    assert(parquetFiles(s"$dir/compact") <= 2)
    val back = spark.read.parquet(s"$dir/compact")
      .as[(Long, String)].collect().toSet
    assert(back == d.as[(Long, String)].collect().toSet)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("SQL function surface: top_gram/py_to_json resolve via " +
      "GraftExtensions and match the Column API") {
    import spark.implicits._
    Seq((1L, "a b a b c")).toDF("doc_id", "text")
      .createOrReplaceTempView("ext_docs_v")
    val viaSql = spark.sql(
      "SELECT top_gram(text, 2).gram AS g, top_gram(text, 2).cnt AS c, " +
        "py_to_json('{''ok'': True}') AS r FROM ext_docs_v")
      .as[(String, Long, String)].head()
    assert(viaSql == (("a b", 2L, """{"ok": true}""")))
    val viaCol = Seq((1L, "a b a b c")).toDF("doc_id", "text")
      .select(graft.functions.functions.top_gram(col("text"), 2)
        .getField("gram")).as[String].head()
    assert(viaCol == viaSql._1)
  }

  test("SQL function surface: nfc_normalize resolves via " +
      "GraftExtensions and matches the Column API") {
    import spark.implicits._
    val nfd = "cafe\u0301"
    Seq((1L, nfd)).toDF("doc_id", "text")
      .createOrReplaceTempView("ext_nfc_v")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(text) AS t FROM ext_nfc_v")
      .as[String].head()
    assert(viaSql == "caf\u00E9")
    val viaCol = Seq((1L, nfd)).toDF("doc_id", "text")
      .select(graft.functions.functions.nfc_normalize(col("text")))
      .as[String].head()
    assert(viaCol == viaSql)
  }
}
