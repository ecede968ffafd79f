package graft.ops

import org.apache.spark.sql.DataFrame
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
}
