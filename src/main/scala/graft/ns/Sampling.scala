package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Deterministic sampling and splitting for training-data pipelines
  * (SURVEY.md §2.8 [NS]).
  *
  * Training corpora need CONTENT-ADDRESSED splits, not random ones: a
  * row's train/val/test assignment must survive reruns, repartitioning,
  * corpus growth, and engine changes, or evaluation sets silently leak
  * into training. Hashing the row's identity gives exactly that — a
  * pure projection (no shuffle, no state, no RNG), reproducible by any
  * engine that can compute md5, which also makes it one of the few
  * sampling operators that can sit behind a cross-engine SQL oracle.
  *
  * Per-group quotas bound any one source's contribution to the corpus
  * (a handful of crawler domains would otherwise dominate): top-k rows
  * per group by a preference order, planned as a window group limit so
  * each partition prunes to k BEFORE the exchange.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from md5(id ":" salt), taking the
    * first 8 hex chars as an integer. Changing `salt` re-deals every
    * assignment; everything else (order, partitioning, corpus size)
    * is irrelevant by construction. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("long") % buckets

  /** Label every row with a split name by cumulative fraction over
    * [[hashBucket]] (1000 buckets → 0.1% granularity). `fractions`
    * must sum to 1, e.g. Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1). Output: input row + (bucket, split). */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val buckets = 1000
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "hashSplit writes `bucket` and `split`; input already has one of them")
    val bucket = hashBucket(col(idCol), salt, buckets)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(f => math.round(f * buckets))
    val split = fractions.map(_._1).zip(bounds)
      .foldRight(lit(null).cast("string")) { case ((name, hi), els) =>
        when(bucket < hi, lit(name)).otherwise(els)
      }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** At most `quota` rows per group, preferring by `order`: the
    * bounded per-group cap (window group limit prunes per partition
    * before the shuffle — no group ever materializes whole). Output:
    * input row + rn (1-based rank within its group). */
  def groupQuota(df: DataFrame, groupCols: Seq[Column], quota: Int,
      order: Seq[Column]): DataFrame =
    Relational.topKPerGroup(df, quota, groupCols, order)
}
