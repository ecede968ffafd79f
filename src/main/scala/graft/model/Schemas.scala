package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the reference's entities (SURVEY.md §1.2).
  * Nothing is inferred: production paths always read with one of these
  * (deterministic at 100 TB, where inferSchema would sample-scan).
  *
  * Weather stage shape per
  * /root/reference/dags/sql/write_weather_to_bigquery_stage.sql:5-48;
  * cocktails stage per
  * /root/reference/dags/sql/write_cocktails_to_bigquery_stage.sql:5-65.
  */
object Schemas {

  private val dec = DecimalType(38, 9) // BigQuery NUMERIC

  val weatherCondition: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("icon", StringType),
    StructField("code", LongType)))

  val weatherLocation: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("region", StringType),
    StructField("country", StringType),
    StructField("lat", dec),
    StructField("lon", dec),
    StructField("tz_id", StringType),
    StructField("localtime_epoch", LongType),
    StructField("localtime", StringType)))

  val weatherCurrent: StructType = StructType(Seq(
    StructField("last_updated_epoch", LongType),
    StructField("last_updated", StringType),
    StructField("temp_c", dec),
    StructField("temp_f", dec),
    StructField("is_day", LongType),
    StructField("condition", weatherCondition),
    StructField("wind_mph", dec),
    StructField("wind_kph", dec),
    StructField("wind_degree", LongType),
    StructField("wind_dir", StringType),
    StructField("pressure_mb", dec),
    StructField("pressure_in", dec),
    StructField("precip_mm", dec),
    StructField("precip_in", dec),
    StructField("humidity", LongType),
    StructField("cloud", LongType),
    StructField("feelslike_c", dec),
    StructField("feelslike_f", dec),
    StructField("vis_km", dec),
    StructField("vis_miles", dec),
    StructField("uv", dec),
    StructField("gust_mph", dec),
    StructField("gust_kph", dec)))

  /** Silver/stage schema: one weather API doc. */
  val weatherStage: StructType = StructType(Seq(
    StructField("location", weatherLocation),
    StructField("current", weatherCurrent)))

  /** 57-field drink struct (15 ingredients + 15 measures + metadata).
    * Hyphenated source fields (strInstructionsZH-HANS/-HANT) keep their
    * raw names at stage; the gold rename map normalizes them. */
  val cocktailsDrink: StructType = {
    val meta = Seq(
      "idDrink", "strDrink", "strDrinkAlternate", "strTags", "strVideo",
      "strCategory", "strIBA", "strAlcoholic", "strGlass",
      "strInstructions", "strInstructionsES", "strInstructionsDE",
      "strInstructionsFR", "strInstructionsIT", "strInstructionsZH-HANS",
      "strInstructionsZH-HANT", "strDrinkThumb", "strImageSource",
      "strImageAttribution", "strCreativeCommonsConfirmed", "dateModified")
    val ingredients = (1 to 15).map(i => s"strIngredient$i")
    val measures = (1 to 15).map(i => s"strMeasure$i")
    StructType((meta ++ ingredients ++ measures)
      .map(n => StructField(n, StringType)))
  }

  /** Silver/stage schema: one cocktails API doc. */
  val cocktailsStage: StructType = StructType(Seq(
    StructField("drinks", ArrayType(cocktailsDrink))))

  /** Gold renames, data-driven instead of the reference's 110
    * hand-written select lines. The reference strips the Hungarian
    * `str` prefix and snake_cases the rest (`strDrink`→`drink`,
    * `strInstructionsZH-HANS`→`instructions_zh_hans`, `idDrink`→
    * `id_drink`) — gold name list at
    * /root/reference/dags/sql/write_cocktails_to_bigquery.sql:66-115. */
  val cocktailsRenames: Seq[(String, String)] =
    cocktailsDrink.fieldNames.toSeq.map { n =>
      val base =
        if (n.startsWith("str") && n.length > 3 && n.charAt(3).isUpper)
          n.substring(3)
        else n
      val snake = base
        .replace("ZH-HANS", "ZhHans").replace("ZH-HANT", "ZhHant")
        .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
      n -> snake
    }

  /** DQ results table schema (SURVEY.md §2.6, FIXTURES.md A5). */
  val dqResult: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("check_name", StringType),
    StructField("success", BooleanType),
    StructField("pending", BooleanType),
    StructField("message", StringType),
    StructField("run_hr", LongType),
    StructField("checked_at", TimestampType)))
}
