package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift guard (round-7 postmortem): the driver
  * regenerates `/root/testdata` between rounds and has already shipped
  * `events.ts` in two different physical encodings (TIMESTAMP(NANOS)
  * read as Long under `nanosAsLong`, then plain `timestamp[us]` read
  * as TIMESTAMP_NTZ). Specs largely run on in-memory frames, so a
  * drifted fixture type previously broke ONLY the driver gate —
  * silently. This suite fails loudly, printing the observed type, the
  * moment a fixture column stops normalizing to what every registered
  * query assumes.
  */
class FixtureDriftSpec extends SparkSpec {

  private def schemaOf(table: String) = Tables(spark, sf, table).schema

  test("events.ts normalizes to TimestampType whatever the fixture ships") {
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val norm = schemaOf("events")("ts").dataType
    assert(norm == TimestampType,
      s"events.ts arrived as $raw and normalized to $norm — " +
        "extend Tables.normalizeTs for this encoding")
  }

  test("normalizeTs handles all three known event-time encodings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Long nanos (rounds 1-6 fixture under nanosAsLong)
    val asLong = Seq(1706572800000000000L).toDF("ts")
    assert(Tables.normalizeTs(asLong).schema("ts").dataType == TimestampType)
    // TIMESTAMP_NTZ (round-7 fixture)
    val asNtz = Seq("2024-01-30 00:00:00").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(Tables.normalizeTs(asNtz).schema("ts").dataType == TimestampType)
    // already TimestampType — untouched
    val asTs = Seq("2024-01-30 00:00:00").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    assert(Tables.normalizeTs(asTs).schema("ts").dataType == TimestampType)
    // all three encodings of the same instant agree (UTC session)
    val instants = Seq(asLong, asNtz, asTs)
      .map(df => Tables.normalizeTs(df)
        .select(unix_micros(col("ts"))).head().getLong(0))
    assert(instants.distinct.size == 1,
      s"same instant decoded differently across encodings: $instants")
  }

  test("key fixture columns keep the types the registry assumes") {
    val expect: Seq[(String, String, DataType => Boolean, String)] = Seq(
      ("documents", "doc_id", _.isInstanceOf[LongType], "integral id"),
      ("documents", "text", _ == StringType, "string text"),
      ("documents", "source", _ == StringType, "string source"),
      ("embeddings", "vec_id", _.isInstanceOf[LongType], "integral id"),
      ("embeddings", "embedding",
        { case ArrayType(FloatType | DoubleType, _) => true; case _ => false },
        "array<float|double>"),
      ("embeddings", "label",
        t => Set[DataType](StringType, LongType, IntegerType,
          ShortType, ByteType).contains(t),
        "groupable scalar label"),
      ("events", "event_id", _.isInstanceOf[LongType], "integral id"),
      ("events", "user_id", _.isInstanceOf[LongType], "integral id"),
      ("events", "event_type", _ == StringType, "string type"),
      ("events", "value", _ == DoubleType, "double value"),
      ("lineitem", "l_quantity", _.isInstanceOf[NumericType], "numeric"),
      ("orders", "o_orderdate",
        t => t == DateType || t == StringType || t == TimestampType ||
          t == TimestampNTZType,
        "date-like"))
    val drifted = expect.flatMap { case (tbl, c, ok, want) =>
      val dt = schemaOf(tbl)(c).dataType
      if (ok(dt)) None else Some(s"$tbl.$c: observed $dt, expected $want")
    }
    assert(drifted.isEmpty,
      "fixture drift detected:\n  " + drifted.mkString("\n  "))
  }
}
