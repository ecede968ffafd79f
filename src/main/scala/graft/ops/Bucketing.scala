package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed, co-located joins (SURVEY.md §4.3). At 100 TB the
  * dominant cost of a fact⋈fact equi-join is shuffling both sides on
  * the key. Bucketing pays that shuffle ONCE at write time: both
  * tables are hash-distributed into the same number of buckets on the
  * join key (and sorted within buckets), so every later join on that
  * key is exchange-free — each task sort-merges bucket i of the left
  * table against bucket i of the right. This is the standard answer
  * for repeatedly-joined table pairs (orders⋈lineitem on orderkey);
  * BucketingSpec proves the no-Exchange plan shape.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted on
    * `bucketCol`. Sorting within buckets lets sort-merge join skip its
    * sort entirely. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite").saveAsTable(table)

  /** Equi-join two tables previously written with [[writeBucketed]]
    * on their bucket keys (same bucket count required for the
    * exchange-free plan). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey), joinType)
}
