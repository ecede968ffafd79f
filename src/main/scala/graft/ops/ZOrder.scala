package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout for multi-column file skipping.
  *
  * A table laid out by ONE sort key prunes scans on that key only;
  * interleaving the bits of two keys gives files whose min/max ranges
  * are narrow on BOTH columns, so parquet footer stats (and any
  * engine's file-level pruning) cut scans filtered on either column
  * or both. This is the layout move behind Delta/Iceberg's OPTIMIZE
  * ZORDER; here it is plain Spark: compute the z-value, range-
  * partition on it, sort within partitions, write.
  *
  * At 100 TB the layout pass is one wide shuffle, paid once per
  * compaction window, and every later selective scan collects the
  * dividend — the same economics as j08's small-file compaction, with
  * which this composes (compact AND co-locate in one rewrite).
  *
  * zValue is pure codegen'd integer arithmetic (32 shift/mask terms,
  * no UDF) and the registered gate (ns96) pins it against the same
  * bit expression in SQL.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: x's bit b lands at 2b, y's at 2b+1. Keys wider than
    * `bits` alias by their low bits — use [[normalized]] to spread a
    * wide or skewed domain over the full bit budget first. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)),
          2 * b + 1))
    }
  }

  /** Affine-map `c` from [lo, hi] onto the `bits`-bit grid — the
    * standard prep so both interleaved columns spend the whole bit
    * budget regardless of their native ranges. */
  def normalized(c: Column, lo: Long, hi: Long, bits: Int = 16): Column = {
    val cells = (1L << bits) - 1
    // Spark's `/` is double division; (c-lo)·cells stays exact in a
    // double while the column range < 2^37 (65535·2^37 < 2^53) —
    // far past any key domain here; floor recovers the integer cell.
    if (hi == lo) lit(0L)
    else least(lit(cells),
      floor(((c - lit(lo)) * lit(cells)) / lit(hi - lo))).cast("long")
  }

  /** Write `df` z-ordered on (xCol, yCol) into `numFiles` files:
    * min/max of each column from one cheap agg, z on the normalized
    * grid, range-partition + in-partition sort on z. File boundaries
    * follow the curve, so each file covers a compact rectangle-ish
    * region of (x, y) — the per-file bounding-box law ZOrderSpec
    * measures against a single-column sort. */
  def zorderWrite(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    val z = zValue(
      normalized(col(xCol).cast("long"), r.getLong(0), r.getLong(1), bits),
      normalized(col(yCol).cast("long"), r.getLong(2), r.getLong(3), bits),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
