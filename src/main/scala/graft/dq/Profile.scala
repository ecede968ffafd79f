package graft.dq

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass multi-column profiling (SURVEY.md §4.2's "DQ profile
  * sketch"): for N columns, ONE aggregation job computes row count,
  * per-column null counts, min/max, and an HLL++ distinct sketch —
  * instead of N profile queries scanning the table N times. At 100 TB
  * the difference is N−1 table scans; all metrics here are
  * map-side-combinable so the single pass stays one shuffle of one
  * row per partition.
  */
object Profile {

  private val schema = StructType(Seq(
    StructField("column_name", StringType),
    StructField("n_rows", LongType),
    StructField("n_nulls", LongType),
    StructField("approx_distinct", LongType),
    StructField("min_str", StringType),
    StructField("max_str", StringType)))

  /** Profile `cols` of `df` in one aggregation pass. Output: one row
    * per column (column_name, n_rows, n_nulls, approx_distinct,
    * min_str, max_str); min/max are rendered as strings so columns of
    * different types share one result schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        approx_count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = m.getAs[Long]("__n")
    val rows = cols.map { c =>
      Row(c, n, m.getAs[Long](s"__nulls_$c"), m.getAs[Long](s"__dist_$c"),
        m.getAs[String](s"__min_$c"), m.getAs[String](s"__max_$c"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
