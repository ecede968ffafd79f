package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) for
  * LLM-data pipelines (SURVEY.md §2.8 [NS]): brute-force cosine top-k
  * as the exact baseline, a bucketed LSH approximate-nearest-neighbor
  * join as the scale path, and an embedding-cosine near-dup pair
  * generator.
  *
  * Numerics: all arithmetic is element-cast-to-double then a
  * sequential left fold (`functions.aggregate`), which is bit-identical
  * to the DuckDB oracle's `list_sum(list_transform(...))` — cosine
  * scores hash-match exactly, no tolerance needed.
  *
  * Scale design:
  *  - Brute force scores stream each corpus partition against a
  *    BROADCAST query set — no shuffle to score; Spark's
  *    WindowGroupLimit then keeps only the per-partition top-k BEFORE
  *    the exchange (verified in the physical plan), so the shuffle
  *    ships at most k rows per (query, partition), not N·|Q|. Right
  *    for small |Q|; the full scan is O(N·|Q|) by construction, so for
  *    large query sets use the LSH path.
  *  - The LSH path normalizes vectors and uses random-projection
  *    bucketing (spark.ml BucketedRandomProjectionLSH): candidates
  *    come from equi-joins on bucket ids, never an all-pairs product;
  *    on unit vectors euclidean distance is a monotone function of
  *    cosine (d² = 2 − 2·cos), so the distance threshold translates
  *    exactly.
  */
object Similarity {

  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Double-precision dot product, sequential fold over elements. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Exact cosine similarity (double): dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force top-k cosine neighbors of each query vector.
    * `queries` must be small enough to broadcast (it is sent to every
    * task). Output: (query_id, idCol, cosine, rank), rank 1..k per
    * query, self-pairs excluded, ties broken by ascending id. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(
      broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col(vecCol), col("__qvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Unit-normalized double vector as an ml.linalg Vector column;
    * zero-norm vectors are dropped (they have no direction). */
  private def unitVecs(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val n = sqrt(dot(col(vecCol), col(vecCol)))
    df.filter(n > 0)
      .select(col(idCol),
        array_to_vector(transform(toD(col(vecCol)), x => x / n))
          .as("features"))
  }

  /** Approximate top-k cosine neighbors via random-projection LSH
    * bucketing. Only pairs with cosine >= minCosine are candidates;
    * per-query ranking then keeps the best k found. Deterministic for
    * a fixed seed. Output: (query_id, idCol, cosine, rank). */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    val c = unitVecs(corpus, idCol, vecCol)
    val q = unitVecs(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as(queryVecCol)), "query_id", queryVecCol)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(c)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))
    val joined = model.approxSimilarityJoin(c, q, maxDist, "eucdist")
      .select(col("datasetB.query_id").as("query_id"),
        col(s"datasetA.$idCol").as(idCol),
        (lit(1.0) - col("eucdist") * col("eucdist") / 2).as("cosine"))
      .filter(col(idCol) =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate top-k cosine neighbors: a k-means
    * coarse quantizer splits the corpus into `nlist` cells; each query
    * probes its `nprobe` closest centroids and scores ONLY those
    * cells' vectors through an equi-join on the cell id. Complements
    * the LSH path (annTopK): LSH buys recall with OR-ed hash tables,
    * IVF buys it with nprobe, and the cell assignment is a one-time
    * batch job — per-query work is ~ nprobe·(corpus/nlist) instead of
    * the full scan.
    *
    * Plan shape: the centroids are embedded as a LITERAL array (nlist
    * vectors — driver-size metadata, like a broadcast dim), so probe
    * selection is a pure projection on the query side; the only join
    * in the plan is the corpus equi-join on `cell`. No cartesian, no
    * nested loop. Deterministic for a fixed seed.
    * Output: (query_id, idCol, cosine, rank). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(nprobe <= nlist, "nprobe must be <= nlist")
    def unit(c: Column): Column = {
      val n = sqrt(dot(c, c))
      transform(toD(c), x => x / n)
    }
    val corpusF = corpus
      .filter(dot(col(vecCol), col(vecCol)) > 0)
      .select(col(idCol), col(vecCol),
        array_to_vector(unit(col(vecCol))).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(corpusF)
    val assigned = model.transform(corpusF)
      .select(col(idCol), col(vecCol), col("cell"))
    // centroids as literals: probe selection never touches a join.
    // Probe ranking MUST use the quantizer's own metric — k-means
    // assigns by euclidean distance, and centroid norms differ, so a
    // raw dot-product ranking disagrees with the assignment and
    // silently costs recall (measured on the fixture at nlist=16,
    // nprobe=4: dot 0.47 vs euclidean 0.64 recall@5).
    // argmin ‖u−c‖² = argmax (2·u·c − ‖c‖²) for fixed ‖u‖.
    val centers = model.clusterCenters.map(_.toArray)
    val centerLit = array(centers.map(c =>
      array(c.map(lit): _*)): _*)
    val normSqLit = array(centers.map(c =>
      lit(c.map(x => x * x).sum)): _*)
    val q = queries
      .filter(dot(col(queryVecCol), col(queryVecCol)) > 0)
      .select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
      .withColumn("__scored",
        transform(sequence(lit(0), lit(nlist - 1)), i => struct(
          (lit(2.0) * aggregate(
            zip_with(unit(col("__qvec")), element_at(centerLit, i + 1),
              (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
            - element_at(normSqLit, i + 1)).as("score"),
          i.as("cell"))))
      .withColumn("__ranked",
        // (score, cell) structs sorted desc → first nprobe cells
        slice(sort_array(col("__scored"), asc = false), 1, nprobe))
      .select(col("query_id"), col("__qvec"),
        explode(col("__ranked.cell")).as("cell"))
    val scored = assigned.join(q, "cell")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col(vecCol), col("__qvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-dup candidate pairs: all (id_a < id_b) with
    * cosine >= minCosine, found through LSH bucketing (equi-joins on
    * bucket ids — linear-ish, never N²) and verified by the exact
    * distance. Output: (id_a, id_b, cosine). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    val v = unitVecs(df, idCol, vecCol)
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(v)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))
    model.approxSimilarityJoin(v, v, maxDist, "eucdist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        (lit(1.0) - col("eucdist") * col("eucdist") / 2).as("cosine"))
      .filter(col("id_a") < col("id_b"))
  }
}
