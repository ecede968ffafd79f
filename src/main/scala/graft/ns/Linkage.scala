package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find records that refer to the
  * same real-world entity despite surface noise (typos, truncation).
  *
  * The scalable shape is the same as every near-dup operator in this
  * repo: NEVER all-pairs. A cheap deterministic blocking key routes
  * candidate records into the same reducer (one equi-join exchange,
  * bounded by block sizes), and an exact edit-distance verify runs
  * only within blocks. Levenshtein is a codegen'd Spark builtin with
  * the identical classic definition in DuckDB, so the whole operator
  * hash-gates — blocking, pairing, and the distance values are all
  * integer-exact.
  *
  * Recall is governed by the blocking key (a deletion inside the
  * block prefix escapes the block — the standard linkage trade-off);
  * production systems union several complementary keys, which is
  * just a union of these joins. */
object Linkage {

  /** Candidate pairs within `blockKey` blocks at edit distance ≤
    * `maxDist`. Output: (id_a, id_b, name_a, name_b, dist) with
    * id_a < id_b. Both join sides are explicitly aliased
    * projections, so the self-join is unambiguous and plans as ONE
    * exchange per side on the block key. */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = df.select(col(idCol).as("id_a"),
      col(nameCol).as("name_a"), blockKey.as("__blk"))
    val b = df.select(col(idCol).as("id_b"),
      col(nameCol).as("name_b"), blockKey.as("__blk"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }
}
