package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4.3). AQE's skew-join
  * split handles most cases at runtime; explicit salting remains the
  * tool when one join key is so hot that even a split partition
  * overwhelms a task (the classic power-law user_id), or when AQE is
  * unavailable (e.g. inside a streaming micro-batch).
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a smaller side:
    * fact rows get a uniform salt in [0, saltFactor); the other side
    * is replicated once per salt value; the join key becomes
    * (key, salt), spreading each hot key over `saltFactor` tasks.
    * Result equals the unsalted join (SkewSpec proves it); cost is
    * replicating the small side saltFactor×, so size the factor to
    * the skew, not higher.
    *
    * The salt is xxhash64 of the row id rather than the id itself:
    * monotonically_increasing_id packs the partition index into the
    * high bits and a dense per-partition counter into the low bits, so
    * `mid % saltFactor` would walk 0,1,2,… within each partition —
    * small trailing partitions would concentrate their hot-key rows on
    * the low salts. Hashing decorrelates the salt from partition
    * layout, spreading each hot key uniformly over the factor. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, skewedKey: String,
      otherKey: String, saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = skewed.withColumn("__salt_l",
      pmod(xxhash64(monotonically_increasing_id()),
        lit(saltFactor.toLong)))
    val replicated = other.withColumn("__salt_r",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
      salted(skewedKey) === replicated(otherKey) &&
        salted("__salt_l") === replicated("__salt_r"), joinType)
      .drop("__salt_l").drop("__salt_r")
  }

  /** Two-stage skew-salted aggregation: count + exact decimal sum per
    * key, computed as groupBy(key, salt) partials then a combine on
    * the key alone. The first exchange spreads each hot key over
    * `saltFactor` reducers (the stage that dies on power-law keys when
    * unsalted); the second moves only `keys × saltFactor` partial
    * rows. Count and decimal sum are associative, so the result is
    * BIT-EQUAL to the plain groupBy at any salt — ns94's oracle IS
    * the plain-groupBy SQL, the ns53 semantics-preserving-rewrite
    * gate. Spark's own map-side partial aggregation already halves
    * this problem for pure aggs; the explicit salt is the form that
    * also carries high-cardinality per-key state (collect_set-like
    * buffers) where map-side combine stops helping, and it works
    * inside streaming micro-batches where AQE skew handling is
    * unavailable.
    *
    * The salt must spread ROWS of one key, not depend on the key:
    * xxhash64 of the whole row's value column + a row nonce would be
    * content-dependent; simplest deterministic spreader is a hash of
    * the value itself (equal values co-salt, still uniform for
    * continuous values). Output: (keys, n, total). */
  def saltedCountSum(df: DataFrame, keys: Seq[Column], valCol: Column,
      saltFactor: Int, scale: Int = 2): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val names = keys.map(_.toString)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(valCol), lit(saltFactor.toLong)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(valCol.cast(org.apache.spark.sql.types.DecimalType(18, scale)))
          .as("__s"))
    partial.groupBy(names.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }
}
