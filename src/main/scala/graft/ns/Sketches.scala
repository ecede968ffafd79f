package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches (SURVEY.md §2.4/§2.8 [NS]):
  * HyperLogLog++ distinct counts and mergeable quantile summaries.
  * Both are one-pass, map-side-combinable aggregates whose sketch
  * buffers merge associatively — the only kind of "distinct/quantile"
  * that survives 100 TB (an exact global COUNT(DISTINCT) re-shuffles
  * every key; a sketch ships kilobytes per partition).
  */
object Sketches {

  /** Approximate distinct count of `valueCol` per group (HLL++,
    * default rsd 5%). */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))

  /** Approx + exact distinct side by side with the relative error —
    * the test/measurement harness for [[approxDistinct]]. */
  def distinctWithError(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"),
        count_distinct(valueCol).as("exact_distinct"))
      .withColumn("rel_err",
        abs(col("approx_distinct") - col("exact_distinct"))
          .cast("double") / col("exact_distinct"))

  /** Mergeable HLL sketch COLUMNS (Apache DataSketches HllSketch,
    * `hll_sketch_agg`): unlike [[approxDistinct]]'s scalar answer,
    * this keeps the sketch BINARY per group — the storable form. The
    * 100-TB pattern: sketch each partition/day/source once, store
    * kilobytes, and answer any later union (all sources, a month of
    * days) by merging registers instead of rescanning raw data.
    * Merging is associative (HLL-mode registers combine by max), so
    * any grouping of parts converges to one answer; note the union of
    * SMALL parts is not bit-identical to the whole-data sketch —
    * DataSketches keeps low-cardinality sketches in exact list/set
    * mode and a union can promote them to estimating HLL mode — so
    * the law tested in NsSketchesMultimodalSpec is accuracy (merged
    * estimate within the sketch's error bound of exact) plus
    * partition-independence, not register identity. */
  def hllSketches(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Merge stored sketches to one distinct-count estimate (long).
    * Strict merge: all sketches must share lgK (the flag allows
    * heterogeneous configs; keeping it false preserves the
    * union-equals-whole register identity). */
  def hllMergeEstimate(sketches: DataFrame,
      sketchCol: String = "sketch"): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col(sketchCol), lit(false)))
      .as("distinct_estimate"))

  /** Per-group quantiles via the Greenwald-Khanna summary
    * (`percentile_approx`). With `accuracy` >= the group row count the
    * summary degrades gracefully to EXACT discrete quantiles (the
    * returned value is always an actual element), which is what makes
    * the DuckDB `quantile_disc` oracle hash-match at fixture scale
    * while the same plan stays a bounded-memory sketch at 100 TB.
    * Output: one `p<NN>` column per requested probability. */
  def quantiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      probs: Seq[Double], accuracy: Int = 1000000): DataFrame = {
    val arr = percentile_approx(valueCol,
      array(probs.map(lit): _*), lit(accuracy))
    val qs = df.groupBy(groupCols: _*).agg(arr.as("__q"))
    probs.zipWithIndex.foldLeft(qs) { case (acc, (p, i)) =>
      acc.withColumn(s"p${(p * 100).round}", element_at(col("__q"), i + 1))
    }.drop("__q")
  }

  /** Winsorization (outlier clipping) at EXACT discrete quantiles
    * with no global sort: values live on a fixed decimal grid
    * (`scale` = 100 → cents), so binning by `round(value·scale)` is
    * lossless and the loQ/hiQ cuts come from a cumulative histogram
    * whose row count is the number of DISTINCT grid points — the
    * ns67 histogram-quantile trick, exact here because the grid is.
    * Cut rule is PERCENTILE_DISC: the smallest grid value whose
    * cumulative count reaches ceil(q·n). The corpus pass is one
    * map-side bin projection + a map-combinable histogram agg;
    * clipping is a second stateless projection. Feature-prep for
    * metric columns that long-tail (session values, doc lengths)
    * where a single extreme row would dominate a mean or a norm.
    * Output: (idCol, valCol, value_wins). */
  def winsorize(df: DataFrame, idCol: String, valCol: String,
      loQ: Double, hiQ: Double, scale: Long = 100L): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "need 0 <= loQ < hiQ <= 1")
    require(scale > 0, "scale must be positive")
    val binned = df.withColumn("__bin",
      round(col(valCol) * scale).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = binned.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
    val n = cum.agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
    if (n == 0L)
      return df.select(col(idCol), col(valCol))
        .limit(0).withColumn("value_wins", lit(0.0))
    val loCut = cum.filter(col("__cum") >= math.ceil(loQ * n).toLong)
      .agg(min(col("__bin"))).head().getLong(0)
    val hiCut = cum.filter(col("__cum") >= math.ceil(hiQ * n).toLong)
      .agg(min(col("__bin"))).head().getLong(0)
    binned.select(col(idCol), col(valCol),
      (greatest(least(col("__bin"), lit(hiCut)), lit(loCut))
        .cast("double") / scale.toDouble).as("value_wins"))
  }
}
