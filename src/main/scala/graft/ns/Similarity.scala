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
  *  - The LSH path normalizes vectors and buckets them by random
  *    unit-direction projections (bucket = floor(unit·plane / L),
  *    planes seeded and embedded as literals): candidates come from
  *    equi-joins on (table, bucket), never an all-pairs product, and
  *    the whole bucketing is codegen'd map-side projection — no ML
  *    fit pass, no UDFs, no per-row vector-object churn. Candidates
  *    are verified by the exact cosine.
  *  - The IVF path (k-means coarse quantizer) builds its index ONCE
  *    per corpus (cached when the caller supplies a key) — the
  *    offline-index/online-query split every real ANN system has.
  */
object Similarity {

  /** Fitted IVF indices (cell assignments + centroids), keyed by
    * (applicationId, caller key, nlist, seed) — see [[ivfTopK]].
    * Bounded LRU: the cached assignments are `.persist()`ed DataFrames
    * (pinned executor blocks), so an unbounded cache in a long-lived
    * application indexing many corpora would accumulate pinned memory
    * forever. Eviction (LRU overflow or [[dropIndex]]) unpersists the
    * assignments before dropping the entry. */
  private val maxCachedIndices = 8
  private type IvfKey = (String, String, Int, Long)
  private type IvfIndex = (DataFrame, Array[Array[Double]])
  private val ivfIndexCache =
    new java.util.LinkedHashMap[IvfKey, IvfIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[IvfKey, IvfIndex]): Boolean =
        if (size > maxCachedIndices) {
          try e.getValue._1.unpersist(false) catch { case _: Throwable => }
          true
        } else false
    }

  /** Release the cached IVF index for `key` (every nlist/seed variant,
    * current application): unpersists the pinned cell assignments and
    * drops the entries. No-op if nothing is cached under the key. */
  def dropIndex(spark: org.apache.spark.sql.SparkSession,
      key: String): Unit = ivfIndexCache.synchronized {
    val appId = spark.sparkContext.applicationId
    val it = ivfIndexCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == appId && e.getKey._2 == key) {
        try e.getValue._1.unpersist(false) catch { case _: Throwable => }
        it.remove()
      }
    }
  }

  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Double-precision dot product — one codegen'd kernel call per
    * pair ([[graft.functions.functions.vec_dot]]), bit-identical to
    * the sequential `aggregate(zip_with(toD(a), toD(b), x·y))` fold
    * it replaced (same ascending-index IEEE sequence, same
    * null-on-mismatch/null-element semantics; kernel≡HOF law in
    * NsSimilaritySpec). The HOF form evaluated an interpreted
    * per-element lambda per candidate pair — ~40 s of ns07b's sf1
    * wall before the swap (r16). */
  def dot(a: Column, b: Column): Column =
    graft.functions.functions.vec_dot(a, b)

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

  /** `count` random unit directions in `dim` dimensions, deterministic
    * for a fixed seed (driver-side metadata — a few KB of literals,
    * like a broadcast dim table). */
  private def randUnitPlanes(dim: Int, count: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(count) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }

  /** Vector dimension, read from the first row (one tiny driver job —
    * the projection planes are sized from it). */
  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol)).as("d")).head().getInt(0)

  /** (idCol, __u): unit-normalized double vectors; zero-norm vectors
    * are dropped (they have no direction). */
  private def unitized(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    // norm materialized as a column FIRST (the l2Normalize pattern):
    // dividing by the inline sqrt(dot) expression inside the
    // transform lambda re-runs the d-element fold once PER ELEMENT —
    // O(d²) per vector, because common-subexpression elimination does
    // not reach inside higher-order-function lambda bodies
    df.select(col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol),
        transform(toD(col(vecCol)), x => x / col("__n")).as("__u"))
  }

  /** (idCol, table, bucket) — one row per (vector, hash table),
    * bucket = floor(unit·plane / bucketLength). This is
    * random-projection LSH computed as pure codegen'd expressions: the
    * planes are literal arrays, so bucketing is a map-side projection
    * with NO fit pass, no UDFs, and no per-row object churn; the only
    * shuffle anywhere downstream is the equi-join on (table, bucket).
    * Deliberately id-only: the candidate join and pair-dedup move
    * 16-byte id pairs, never the vectors — the vectors are attached
    * ONCE per surviving pair afterwards (carrying them through the
    * bucket join multiplies the shuffle by the vector width times the
    * bucket fan-out; measured 6× slower at sf0.1). */
  private def lshBuckets(unit: DataFrame, idCol: String,
      planes: Array[Array[Double]], bucketLength: Double): DataFrame = {
    val buckets = array(planes.map { p =>
      // kernel dot (r16): same sequential fold, fused — the
      // bucketing pays corpus × numHashTables dots
      floor(dot(col("__u"), array(p.map(lit): _*)) / bucketLength)
        .cast("long")
    }: _*)
    unit.select(col(idCol),
      posexplode(buckets).as(Seq("table", "bucket")))
  }

  /** Density-adaptive variant of [[lshBuckets]]: buckets whose
    * occupancy exceeds `maxBucketSize` are SUBDIVIDED by appending
    * extra projection bits — depth chosen per bucket from its measured
    * occupancy — so the candidate join's Σ occupancy² term stays
    * bounded as corpus density grows instead of growing quadratically
    * (the fixed-parameter LSH density trap SCALE.md decomposes). The
    * refinement is the same equal-width quantized projection as the
    * base hash, applied only where the data is dense, so recall cost
    * is localized to dense regions and sparse buckets are untouched.
    *
    * Plan shape: refinement projections are precomputed as a small
    * `array<long>` column BEFORE the bucket explode (carrying the
    * vector itself through the bucket stream measured 6× slower — see
    * [[lshBuckets]]); the adaptive pass adds exactly one occupancy
    * groupBy + one equi-join back over (table, bucket) id-rows. All
    * members of a bucket share its depth, so refined buckets are a
    * true partition of the original bucket. Deterministic: planes are
    * seeded, occupancy is a count. */
  private def lshBucketsCapped(unit: DataFrame, idCol: String,
      planes: Array[Array[Double]], bucketLength: Double,
      maxBucketSize: Int,
      refinePlanes: Array[Array[Double]]): DataFrame = {
    val maxRefine = refinePlanes.length
    // measured effective split factor per appended projection on
    // dense (central) buckets; only steers DEPTH selection
    val branching = 3.0
    def proj(p: Array[Double]): Column =
      // kernel dot (r16): identical fold, fused
      floor(dot(col("__u"), array(p.map(lit): _*)) / bucketLength)
        .cast("long")
    val buckets = array(planes.map(proj): _*)
    val rb = array(refinePlanes.map(proj): _*)
    val base = unit.select(col(idCol), rb.as("__rb"),
      posexplode(buckets).as(Seq("table", "bucket")))
    val occ = base.groupBy(col("table"), col("bucket"))
      .agg(count(lit(1)).as("__occ"))
    base.join(occ, Seq("table", "bucket"))
      .withColumn("__depth",
        when(col("__occ") <= maxBucketSize, lit(0))
          .otherwise(least(lit(maxRefine),
            ceil(log(col("__occ").cast("double") / maxBucketSize) /
              math.log(branching)).cast("int"))))
      .select(col(idCol), col("table"),
        xxhash64(col("bucket"),
          slice(col("__rb"), lit(1), col("__depth"))).as("bucket"))
  }

  /** Approximate top-k cosine neighbors via random-projection LSH
    * bucketing: candidates are corpus/query pairs that share a bucket
    * in at least one of `numHashTables` OR-ed projections (equi-join
    * on (table, bucket) — never an all-pairs product), verified by the
    * exact cosine against `minCosine`; per-query ranking then keeps
    * the best k found. Deterministic for a fixed seed.
    * Output: (query_id, idCol, cosine, rank). */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L): DataFrame =
    annTopKCore(corpus, idCol, vecCol, queries, queryIdCol,
      queryVecCol, k, minCosine,
      randUnitPlanes(vecDim(corpus, vecCol), numHashTables, seed),
      bucketLength)

  /** md5-parity ±1 projection planes (the ns95/[[Embeddings
    * .projectionSign]] idiom, as doubles): every cell is re-derivable
    * by any engine, so a pipeline built on them can hash-gate
    * end-to-end. ±1 rows are not unit-normalized — a plane's scale
    * only rescales its projections, which `bucketLength` absorbs
    * (projections of a unit vector onto a ±1 row have unit variance,
    * vs 1/dim for a unit-gaussian row — hence the twin's wider
    * default bucket). */
  private def parityPlanes(dim: Int, count: Int,
      salt: String): Array[Array[Double]] =
    Array.tabulate(count)(j => Array.tabulate(dim)(i =>
      Embeddings.projectionSign(i, j, salt).toDouble))

  /** Oracle-exact twin of [[annTopK]] (the ns03b/ns04b convention for
    * ANN): the IDENTICAL pipeline — unitize, bucket, OR-ed equi-join,
    * exact-cosine verify, per-query top-k — with the ONE engine-
    * specific input (seeded gaussian planes) replaced by md5-parity
    * ±1 planes, so a DuckDB oracle re-derives every intermediate and
    * the whole algorithm hash-gates. `annTopK` stays the registered
    * scale default; path equivalence (same core, only the plane
    * matrix differs) is law-tested in NsSimilaritySpec.
    * Output: (query_id, idCol, cosine, rank). */
  def annTopKExact(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 1.0, salt: String = "annb"): DataFrame =
    annTopKCore(corpus, idCol, vecCol, queries, queryIdCol,
      queryVecCol, k, minCosine,
      parityPlanes(vecDim(corpus, vecCol), numHashTables, salt),
      bucketLength)

  private[graft] def annTopKCore(corpus: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int, minCosine: Double,
      planes: Array[Array[Double]], bucketLength: Double): DataFrame = {
    val cu = unitized(corpus, idCol, vecCol)
    val qu = unitized(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as(queryVecCol)), "query_id", queryVecCol)
      .select(col("query_id"), col("__u").as("__qu"))
    val cand = lshBuckets(cu, idCol, planes, bucketLength)
      .join(lshBuckets(qu.select(col("query_id"),
        col("__qu").as("__u")), "query_id", planes, bucketLength),
        Seq("table", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol))
      .distinct()
    val joined = cand.join(cu, idCol).join(qu, "query_id")
      .select(col("query_id"), col(idCol),
        dot(col("__u"), col("__qu")).as("cosine"))
      .filter(col("cosine") >= minCosine)
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
    *
    * `indexKey`: a real ANN system builds its index OFFLINE and serves
    * many queries against it — rebuilding the quantizer per query
    * would be wrong at any scale. Passing a stable key for the corpus
    * (e.g. its path) caches the fitted index (cell assignments +
    * centroids) per (application, key, nlist, seed): the first call
    * pays the k-means fit, later calls only pay the probe join. The
    * caller asserts the corpus content is unchanged for a given key.
    * Output: (query_id, idCol, cosine, rank). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L, indexKey: Option[String] = None,
      fitSampleCap: Int = 100000): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val (assigned, centers) = coarseIndex(corpus, idCol, vecCol,
      nlist, seed, fitSampleCap, indexKey)
    ivfTopKWithIndex(assigned, centers, idCol, vecCol,
      queries, queryIdCol, queryVecCol, k, nprobe)
  }

  /** Fit-or-cache the coarse (IVF) index — the [[ivfTopK]] cache
    * contract, shared with [[ivfPqTopK]] so both search paths reuse
    * ONE fitted quantizer per (application, key, nlist, seed). */
  private def coarseIndex(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, seed: Long, fitSampleCap: Int,
      indexKey: Option[String]): (DataFrame, Array[Array[Double]]) =
    indexKey match {
      case Some(key) =>
        val cacheKey = (corpus.sparkSession.sparkContext.applicationId,
          key, nlist, seed)
        // Lock held across the fit: contending callers for the SAME
        // key would otherwise fit twice and leak a persisted copy.
        ivfIndexCache.synchronized {
          Option(ivfIndexCache.get(cacheKey)) match {
            case Some(idx) =>
              graft.CacheStats.hit("ivf_index"); idx
            case None =>
              graft.CacheStats.miss("ivf_index")
              val (a, c) = buildIvfIndex(corpus, idCol, vecCol, nlist,
                seed, fitSampleCap)
              val idx = (a.persist(), c)
              ivfIndexCache.put(cacheKey, idx)
              idx
          }
        }
      case None =>
        buildIvfIndex(corpus, idCol, vecCol, nlist, seed, fitSampleCap)
    }

  /** Fit an IVF index without querying it: returns (cell assignments
    * `(idCol, vecCol, cell)`, centroids). This is the OFFLINE half of
    * the index/query split; pair with [[saveIvfIndex]] /
    * [[loadIvfIndex]] to survive application restarts, or let
    * [[ivfTopK]]'s `indexKey` cache it in-process. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L,
      fitSampleCap: Int = 100000): (DataFrame, Array[Array[Double]]) = {
    require(fitSampleCap >= nlist, "fitSampleCap must be >= nlist")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // norm as a materialized column — see unitized: an inline norm
    // inside the transform lambda is O(d²) per vector
    val corpusF = corpus
      .select(col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col(vecCol),
        array_to_vector(transform(toD(col(vecCol)),
          x => x / col("__n"))).as("features"))
    // The quantizer fit is iterative (k passes over its input), so it
    // is the one step that must NOT see the full corpus at 100 TB:
    // fit on a deterministic sample capped at `fitSampleCap` rows —
    // nlist centroids need ~1000·nlist points, not billions — then
    // assign the FULL corpus in the single transform pass below.
    val n = corpusF.count()
    // PERSIST the fit set: MLlib's k-means makes one pass per
    // iteration (plus the kmeans|| init passes) over its input, and
    // an unpersisted fit set re-runs the parquet scan + HOF
    // normalization + array_to_vector lineage on EVERY pass — at
    // sf1 that lineage replay was 24-28 s of ns106's 51.6 s (r16
    // probe: fit on persisted input 3.2 s, unpersisted 23-28 s).
    // The fit set is capped (≤ fitSampleCap rows of d doubles), so
    // the pin is bounded memory by construction; unpersisted after
    // the fit.
    val fitSet =
      (if (n <= fitSampleCap) corpusF
       else corpusF.sample(withReplacement = false,
        fitSampleCap.toDouble / n, seed)).persist()
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = try km.fit(fitSet) finally { fitSet.unpersist(): Unit }
    // The fit produces CENTROIDS ONLY; the corpus assignment runs
    // through [[assignWithIndex]] — the same deterministic literal
    // expression the incremental path uses — so "assign a new batch
    // against a stored index" and "assign the whole corpus at fit
    // time" are THE SAME function and incremental maintenance equals
    // full assignment by construction (law in NsSimilaritySpec),
    // rather than depending on MLlib transform internals (whose
    // distance path has an approximate fast branch).
    val centers = model.clusterCenters.map(_.toArray)
    (assignWithIndex(corpus, centers, idCol, vecCol), centers)
  }

  /** Assign vectors to a FITTED index's cells without refitting —
    * the delta-cost path for IVF maintenance (the ns41/ns55 shape:
    * a daily batch is assigned against the stored centroids from
    * [[loadIvfIndex]] and appended to the assignment table; the
    * quantizer refit stays a scheduled offline job). One map-side
    * projection: centroids ride as literals, cell = argmin
    * ‖unit(v) − c‖² computed as argmax (2·u·c − ‖c‖²), ties to the
    * smallest cell — fully deterministic, no join, no shuffle.
    * Zero-norm vectors are dropped (they have no direction — same
    * contract as the fit path). Output: (idCol, vecCol, cell), the
    * [[buildIvfIndex]] assignment schema. */
  def assignWithIndex(batch: DataFrame, centers: Array[Array[Double]],
      idCol: String, vecCol: String): DataFrame = {
    require(centers.nonEmpty, "need at least one centroid")
    // One codegen'd kernel call per row (IvfAssignExpr — the
    // TopGramExpr pattern): the HOF formulation (transform over
    // nlist cells of aggregate folds) is interpreted and measured
    // 11 s for 40k vectors at sf0.1 vs ~0.3 s through the kernel.
    // Cast, not a per-element transform, widens float→double.
    batch
      .select(col(idCol), col(vecCol),
        graft.functions.functions.ivf_assign(
          col(vecCol).cast("array<double>"), centers).as("cell"))
      .filter(col("cell").isNotNull)
  }

  /** Persist a fitted IVF index under `dir`: cell assignments as
    * parquet at `dir/assignments`, centroids as JSON lines
    * `(cell, centroid)` at `dir/centroids`. Both go through Spark
    * writers, so `dir` can be any filesystem the session reaches
    * (object store included) — nothing is driver-local. Doubles
    * round-trip exactly (shortest-representation JSON). */
  def saveIvfIndex(index: (DataFrame, Array[Array[Double]]),
      dir: String): Unit = {
    val (assigned, centers) = index
    assigned.write.mode("overwrite").parquet(s"$dir/assignments")
    val spark = assigned.sparkSession
    import spark.implicits._
    centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1) // nlist rows — one tiny file, not 32 splinters
      .write.mode("overwrite").json(s"$dir/centroids")
  }

  /** Load an index written by [[saveIvfIndex]]. The assignments come
    * back as a lazy parquet scan (NOT collected — at 100 TB the
    * assignment table is corpus-sized); only the nlist centroid rows
    * are collected. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Array[Array[Double]]) = {
    val assigned = spark.read.parquet(s"$dir/assignments")
    val centers = spark.read.json(s"$dir/centroids")
      .select(col("cell").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    require(centers.nonEmpty, s"no centroids found under $dir/centroids")
    (assigned, centers)
  }

  /** Per-query probe cells: the `nprobe` coarse cells nearest each
    * query, (query_id, __qvec, cell) — one row per probe. Centroids
    * as literals: probe selection never touches a join. Probe
    * ranking MUST use the quantizer's own metric — k-means assigns
    * by euclidean distance, and centroid norms differ, so a raw
    * dot-product ranking disagrees with the assignment and silently
    * costs recall (measured on the fixture at nlist=16, nprobe=4:
    * dot 0.47 vs euclidean 0.64 recall@5).
    * argmin ‖u−c‖² = argmax (2·u·c − ‖c‖²) for fixed ‖u‖. */
  private def probeCells(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, centers: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    val nlist = centers.length
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val centerLit = array(centers.map(c =>
      array(c.map(lit): _*)): _*)
    val normSqLit = array(centers.map(c =>
      lit(c.map(x => x * x).sum)): _*)
    // the query's unit vector is materialized ONCE as __qunit — the
    // old inline unit(__qvec) inside the per-cell zip_with re-ran the
    // norm fold per (cell × element): O(nlist·d²) per query
    queries
      .select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"),
        sqrt(dot(col(queryVecCol), col(queryVecCol))).as("__qn"))
      .filter(col("__qn") > 0)
      .select(col("query_id"), col("__qvec"),
        transform(toD(col("__qvec")), x => x / col("__qn"))
          .as("__qunit"))
      .withColumn("__scored",
        transform(sequence(lit(0), lit(nlist - 1)), i => struct(
          (lit(2.0) * aggregate(
            zip_with(col("__qunit"), element_at(centerLit, i + 1),
              (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
            - element_at(normSqLit, i + 1)).as("score"),
          i.as("cell"))))
      .withColumn("__ranked",
        // (score, cell) structs sorted desc → first nprobe cells
        slice(sort_array(col("__scored"), asc = false), 1, nprobe))
      .select(col("query_id"), col("__qvec"),
        explode(col("__ranked.cell")).as("cell"))
  }

  /** The ONLINE half of [[ivfTopK]]: probe a prefit index (from
    * [[buildIvfIndex]] or [[loadIvfIndex]]) with `queries`.
    * Output: (query_id, idCol, cosine, rank). */
  def ivfTopKWithIndex(assigned: DataFrame,
      centers: Array[Array[Double]], idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val q = probeCells(queries, queryIdCol, queryVecCol, centers,
      nprobe)
    val scored = assigned.join(q, "cell")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col(vecCol), col("__qvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-dup candidate pairs: all (id_a < id_b) that
    * share a bucket in at least one of the OR-ed random projections
    * (equi-join on (table, bucket) — never an N² product), verified
    * by the exact cosine against `minCosine`. Deterministic for a
    * fixed seed. Output: (id_a, id_b, cosine).
    *
    * Scale: candidate volume is Σ bucket-occupancy² per table, and
    * occupancy grows LINEARLY with corpus density at fixed
    * `bucketLength` — so a 10× corpus costs ~100× candidate work
    * unless the bucketing is re-tuned (the classic LSH density trap;
    * measured sf0.1 → sf1 in SCALE.md). Operate it like any
    * production LSH: narrow `bucketLength` (or raise `minCosine`) as
    * density grows, and buy recall back with more OR-ed
    * `numHashTables` — candidates are exact-verified, so precision
    * is 1.0 at every setting and the verified pair count measures
    * recall directly. */
  /** Majority-vote label assignment from a neighbor list: join each
    * query's neighbors to the corpus's labels, count votes, keep the
    * winning label (ties → most votes, then smallest label — fully
    * deterministic). `neighbors` is (query_id, idCol, ...) as produced
    * by [[bruteForceTopK]] / [[annTopK]] / [[ivfTopK]], so the same
    * vote runs over the exact or either approximate neighbor
    * generator.
    *
    * Scale: the neighbor list is |Q|·k rows — broadcast it, so the
    * corpus-sized label frame is joined map-side and never shuffles;
    * the vote itself runs on |Q|·k rows. Output:
    * (query_id, pred_label, votes). */
  def voteLabels(neighbors: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String): DataFrame = {
    val lab = labels.select(col(idCol).as("__nid"),
      col(labelCol).as("pred_label"))
    val voted = lab
      .join(broadcast(neighbors.select(col("query_id"),
        col(idCol).as("__vid"))), col("__nid") === col("__vid"))
      .groupBy(col("query_id"), col("pred_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("pred_label").asc)
    voted.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("query_id"), col("pred_label"), col("votes"))
  }

  /** k-nearest-neighbor label propagation: classify each query vector
    * by the majority label of its k nearest labeled corpus vectors
    * (exact cosine). The standard semi-supervised labeling pass a
    * training pipeline runs to extend a small hand-labeled set over a
    * large corpus (quality tiers, topic tags, safety labels).
    *
    * This is the EXACT variant (inherits [[bruteForceTopK]]'s
    * small-|Q| scan shape); at a large query set, generate neighbors
    * with [[annTopK]] or [[ivfTopK]] and feed [[voteLabels]]
    * directly — the vote is generator-agnostic by construction. */
  def knnClassify(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int): DataFrame =
    voteLabels(
      bruteForceTopK(corpus, idCol, vecCol, queries, queryIdCol,
        queryVecCol, k),
      corpus, idCol, labelCol)

  /** Semantic decontamination: flag every corpus vector whose cosine
    * to ANY held-out evaluation vector reaches `minCosine` — the
    * embedding-space analogue of n-gram benchmark decontamination
    * (`Dedup.contaminationScores`), catching paraphrased eval leakage
    * that exact grams miss.
    *
    * Scale: eval sets are small by nature (same rationale as the
    * n-gram variant's broadcast), so the eval vectors are embedded as
    * LITERALS — the whole operator is a zero-shuffle, zero-join
    * codegen'd projection over the corpus, and the max-cosine fold is
    * O(|eval|·d) per row. `evalCap` guards the plan size; beyond it,
    * score against a broadcast eval frame + map-combinable max
    * instead. Zero-norm vectors are excluded on both sides (no
    * direction ⇒ no cosine).
    *
    * Numerics: per-pair cosine is dot/(‖c‖·‖e‖) with ‖e‖ computed
    * driver-side by the same sequential left fold — bit-identical to
    * the SQL oracle. Output: (idCol, max_eval_cosine, contaminated). */
  def semanticContamination(corpus: DataFrame, idCol: String,
      vecCol: String, evalSet: DataFrame, evalVecCol: String,
      minCosine: Double, evalCap: Int = 10000): DataFrame = {
    val rows = evalSet.select(col(evalVecCol).cast("array<double>"))
      .limit(evalCap + 1).collect()
    require(rows.length <= evalCap,
      s"eval set exceeds evalCap=$evalCap: use the broadcast-join path")
    val vecs = rows.map(_.getSeq[Double](0).toArray)
      .filter(v => v.exists(_ != 0.0))
    require(vecs.nonEmpty, "eval set has no non-zero vectors")
    val norms = vecs.map(v =>
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
    val evalLit = array(vecs.map(v => array(v.map(lit): _*)): _*)
    val normLit = array(norms.map(lit): _*)
    corpus
      // corpus norm materialized as a column (see unitized: an inline
      // norm inside the lambda would re-fold per eval vector)
      .select(col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol),
        array_max(zip_with(evalLit, normLit, (e, en) =>
          dot(col(vecCol), e) / (col("__n") * en)))
          .as("max_eval_cosine"))
      .withColumn("contaminated", col("max_eval_cosine") >= minCosine)
  }

  /** All vector pairs with cosine ≥ `minCosine`, candidates from
    * OR-ed random-projection buckets, each candidate verified exactly
    * (precision 1.0 always; recall = bucket collision coverage).
    *
    * `maxBucketSize`: the 100-TB knob. With it set, over-occupied
    * buckets are subdivided adaptively ([[lshBucketsCapped]]) so
    * candidate volume stays ~linear in corpus size at fixed settings;
    * without it, fixed-parameter bucketing pays Σ occupancy² which
    * grows ~quadratically with density (measured 62× at 10× corpus —
    * SCALE.md). Fixture-scale gates leave it engaged: subdividing only
    * fires where occupancy > cap, and recall on the measured sweep
    * stays ≥ 0.9 while wall returns to ~linear. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L,
      maxBucketSize: Option[Int] = None,
      maxRefine: Int = 4): DataFrame = {
    val dim = vecDim(df, vecCol)
    val planes = randUnitPlanes(dim, numHashTables, seed)
    // Materialize the unitized corpus ONCE (r19): it feeds the
    // bucketing pass AND both sides of the verify join — three
    // evaluations of whatever lineage produced `df` (ns104 feeds the
    // whole PCA projection in). Lazy cut: rows are (id, unit vec),
    // the same working set any production LSH keeps resident; spills
    // to executor disk past memory (the r18 §2 class).
    val u = unitized(df, idCol, vecCol).localCheckpoint(false)
    val v = maxBucketSize match {
      case Some(cap) =>
        lshBucketsCapped(u, idCol, planes, bucketLength, cap,
          randUnitPlanes(dim, maxRefine, seed ^ 0x5DEECE66DL))
      case None => lshBuckets(u, idCol, planes, bucketLength)
    }
    val cand = v.select(col(idCol).as("id_a"), col("table"), col("bucket"))
      .join(v.select(col(idCol).as("id_b"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(u.select(col(idCol).as("id_a"), col("__u").as("__ua")), "id_a")
      .join(u.select(col(idCol).as("id_b"), col("__u").as("__ub")), "id_b")
      .select(col("id_a"), col("id_b"),
        dot(col("__ua"), col("__ub")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // ---------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, TPAMI 2011)
  // ---------------------------------------------------------------

  /** Fitted PQ codebooks keyed by (applicationId, caller key, m,
    * ksub) — plain driver arrays (m·ksub·dsub doubles, kilobytes),
    * nothing persisted, so a simple concurrent map suffices (compare
    * `ivfIndexCache`, whose entries pin executor blocks). */
  private val pqCodebookCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, Int, Int), Array[Array[Array[Double]]]]

  /** Closed-form md5-parity PQ codebooks (±1 entries via
    * [[Embeddings.projectionSign]] on the GLOBAL dimension index) —
    * the oracle-exact twin input, the [[annTopKExact]] parity-plane
    * convention: a DuckDB oracle re-derives every entry from the
    * public sign formula, so encoding against these codebooks
    * hash-gates end to end. */
  def parityCodebooks(dim: Int, m: Int, ksub: Int,
      salt: String = "pqb"): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    Array.tabulate(m)(s => Array.tabulate(ksub)(j =>
      Array.tabulate(dsub)(i =>
        Embeddings.projectionSign(s * dsub + i, j, salt).toDouble)))
  }

  /** Fit PQ codebooks: per-subspace k-means (Lloyd) over a
    * deterministic content-addressed sample of the UNIT-normalized
    * corpus. Returns the m×ksub×(d/m) codebook tensor — driver-size
    * metadata, the [[buildIvfIndex]] centroid contract.
    *
    * The quantizer fit is the one step that must not see the full
    * corpus at 100 TB: the fit consumes a `fitSampleCap`-bounded
    * sample (ksub centroids per subspace need ~1000·ksub points, not
    * billions), selected as the top-`fitSampleCap` rows by
    * `xxhash64(id)` — a content-addressed top-k, deterministic under
    * any partitioning, no RNG — and collected once (a bounded
    * few-MB array, the ns102 driver-fit convention). Everything
    * downstream (corpus encode, ADC scan) is distributed.
    *
    * The Lloyd loop itself is deterministic end to end: seeds are
    * the first ksub DISTINCT subvectors in sample order, assignment
    * uses the exact [[graft.functions.PqKernels]] scoring fold
    * (2·dot − ‖c‖², strict >, smallest code on ties), means
    * accumulate in sample order, and empty cells keep their previous
    * center — so refitting the same corpus bit-reproduces the
    * codebooks (law in NsSimilaritySpec), unlike an MLlib fit whose
    * reduction order floats with partitioning.
    *
    * `indexKey`: the [[ivfTopK]] offline-index convention — a stable
    * corpus key caches the fitted codebooks per (application, key,
    * m, ksub); `refresh = true` refits and replaces (the
    * FixtureCache producer/consumer split: the producer query
    * reports the true fit cost, consumers pay the lookup). */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, fitSampleCap: Int = 16384,
      maxIter: Int = 25, indexKey: Option[String] = None,
      refresh: Boolean = false): Array[Array[Array[Double]]] = {
    require(ksub >= 1 && fitSampleCap >= ksub,
      "fitSampleCap must be >= ksub")
    def fit(): Array[Array[Array[Double]]] = {
      val dim = vecDim(corpus, vecCol)
      require(dim % m == 0, s"dim $dim not divisible by m $m")
      val dsub = dim / m
      // top-K by content hash over the RAW columns, unit-normalize
      // only the K survivors driver-side: unitizing before the limit
      // would run the interpreted per-element transform over the
      // whole corpus just to pick 16k rows (measured ~4 s of pure
      // overhead at 400k × 64-d)
      val sample = corpus
        .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(fitSampleCap)
        .select(col("__v")).collect()
        .iterator.map(_.getSeq[Double](0).toArray)
        .flatMap { v =>
          var ss = 0.0
          var i = 0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          if (ss > 0) { val n = math.sqrt(ss); Some(v.map(_ / n)) }
          else None
        }.toArray
      require(sample.nonEmpty, "empty corpus (all zero-norm?)")
      Array.tabulate(m) { s =>
        val base = s * dsub
        val pts = sample.map(u => java.util.Arrays.copyOfRange(
          u, base, base + dsub))
        // seeds: first ksub distinct subvectors in sample order
        val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
        val it = pts.iterator
        while (seen.size < ksub && it.hasNext) seen += it.next().toSeq
        var centers = seen.toArray.map(_.toArray)
        var assign = Array.fill(pts.length)(-1)
        var changed = true
        var iter = 0
        while (changed && iter < maxIter) {
          changed = false
          val normSq = centers.map(c => c.map(x => x * x).sum)
          var p = 0
          while (p < pts.length) {
            val v = pts(p)
            var best = -1
            var bestScore = Double.NegativeInfinity
            var j = 0
            while (j < centers.length) {
              val c = centers(j)
              var dot = 0.0
              var t = 0
              while (t < dsub) { dot += v(t) * c(t); t += 1 }
              val score = 2.0 * dot - normSq(j)
              if (score > bestScore) { bestScore = score; best = j }
              j += 1
            }
            if (assign(p) != best) { assign(p) = best; changed = true }
            p += 1
          }
          if (changed) {
            val sums = Array.fill(centers.length)(new Array[Double](dsub))
            val counts = new Array[Long](centers.length)
            p = 0
            while (p < pts.length) {
              val j = assign(p)
              val v = pts(p)
              var t = 0
              while (t < dsub) { sums(j)(t) += v(t); t += 1 }
              counts(j) += 1
              p += 1
            }
            centers = Array.tabulate(centers.length)(j =>
              if (counts(j) == 0) centers(j)
              else sums(j).map(_ / counts(j)))
          }
          iter += 1
        }
        centers
      }
    }
    indexKey match {
      case Some(key) =>
        val ck = (corpus.sparkSession.sparkContext.applicationId,
          key, m, ksub)
        if (refresh) {
          val cb = fit()
          pqCodebookCache.put(ck, cb)
          cb
        } else {
          if (pqCodebookCache.containsKey(ck))
            graft.CacheStats.hit("pq_codebook")
          else graft.CacheStats.miss("pq_codebook")
          pqCodebookCache.computeIfAbsent(ck, _ => fit())
        }
      case None => fit()
    }
  }

  /** Persist fitted PQ codebooks under `dir` as JSON lines
    * (subspace, code, centroid) — the [[saveIvfIndex]] convention:
    * written through a Spark writer so `dir` can be any filesystem
    * the session reaches, and doubles round-trip exactly
    * (shortest-representation JSON). The code table itself is a
    * corpus-sized frame the caller writes like any other dataset —
    * re-encoding a new batch against loaded codebooks is the same
    * [[pqEncode]] call as fit-time encoding. */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]], dir: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (codes, s) =>
      codes.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1) // m·ksub rows — one tiny file
      .write.mode("overwrite").json(s"$dir/pq_codebooks")
  }

  /** Load codebooks written by [[savePqCodebooks]] — bit-identical
    * to the saved tensor (round-trip law in NsSimilaritySpec). */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.json(s"$dir/pq_codebooks")
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, s"no codebooks found under $dir/pq_codebooks")
    rows.groupBy(_.getInt(0)).toArray.sortBy(_._1).map(_._2
      .sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))
  }

  /** Encode a corpus (or an incremental batch — same function, the
    * [[assignWithIndex]] contract) against fitted codebooks: one
    * map-side codegen'd kernel call per row, no join, no shuffle.
    * Zero-norm vectors are dropped. Output: (idCol, codes), codes an
    * m-element array<int> — m·log2(ksub) bits of payload per vector
    * in place of d floats, which is what makes the 100 TB code table
    * scannable. */
  def pqEncode(df: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.functions.pq_encode(
          col(vecCol).cast("array<double>"), codebooks).as("codes"))
      .filter(col("codes").isNotNull)

  /** [[pqEncode]] scalarized to (idCol, subspace, code) rows — the
    * ns35 posexplode idiom, the hash-gate-friendly long format. */
  def pqCodesScalar(df: DataFrame,
      codebooks: Array[Array[Array[Double]]], idCol: String,
      vecCol: String): DataFrame =
    pqEncode(df, codebooks, idCol, vecCol)
      .select(col(idCol), posexplode(col("codes")))
      .select(col(idCol), col("pos").cast("long").as("subspace"),
        col("col").cast("long").as("code"))

  /** Approximate top-k cosine neighbors over PQ codes with exact
    * rerank — the two-stage ADC search (IVFADC's scan half): each
    * query precomputes its m·ksub lookup table ONCE (one kernel call
    * per query row, behind its own projection), the code table is
    * scanned at m table-lookups per (query, candidate) pair — the
    * per-pair cost a raw-vector scan pays d multiplies for — the
    * top-`rerank` ADC candidates per query are then re-scored with
    * EXACT cosines against the raw vectors and the top-k kept, so
    * reported scores carry no quantization error (only recall does,
    * and rerank>>k buys it back; recall law in NsSimilaritySpec).
    *
    * Plan shape: the query tables are a BROADCAST (|Q| rows); the
    * only exchanges are the two per-query top-k windows and the
    * candidate joins back to the raw vectors — candidates are
    * id-only (the lshBuckets convention), at most `rerank` rows per
    * query. For corpora where even the m-add scan is too much, feed
    * `encoded` a cell-pruned slice (filter by [[assignWithIndex]]
    * cells — IVF-PQ) before calling; the fixture-scale registry
    * entry scans the full code table. Output: (query_id, idCol,
    * cosine, rank). */
  def pqTopKAdc(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int,
      rerank: Int = 50): DataFrame = {
    require(k >= 1 && rerank >= k, "need rerank >= k >= 1")
    val enc = pqEncode(corpus, codebooks, idCol, vecCol)
    val qt = queries
      .select(col(queryIdCol).as("query_id"),
        graft.functions.functions.pq_table(
          col(queryVecCol).cast("array<double>"), codebooks).as("__tab"))
      .filter(col("__tab").isNotNull)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col(idCol).asc)
    val cand = enc.crossJoin(broadcast(qt))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        graft.functions.functions.pq_adc(col("__tab"), col("codes"))
          .as("__adc"))
      .withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= rerank)
      .select(col("query_id"), col(idCol))
    exactRerank(corpus, idCol, vecCol, queries, queryIdCol,
      queryVecCol, cand, k)
  }

  /** Exact-cosine rerank of an id-only (query_id, idCol) candidate
    * list: attach raw vectors by BROADCASTING the ≤ rerank·|Q|
    * candidate ids and unit-normalize only the survivors —
    * unitizing the whole corpus before the join would pay the
    * interpreted per-element transform N times to rerank a few
    * hundred rows. Output: (query_id, idCol, cosine, rank ≤ k). */
  private def exactRerank(corpus: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, cand: DataFrame, k: Int): DataFrame = {
    val qu = unitized(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qv")), "query_id", "__qv")
      .select(col("query_id"), col("__u").as("__qu"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cand), idCol)
      .select(col("query_id"), col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__n"))
      .filter(col("__n") > 0)
      .select(col("query_id"), col(idCol),
        transform(toD(col(vecCol)), x => x / col("__n")).as("__u"))
      .join(qu, "query_id")
      .select(col("query_id"), col(idCol),
        dot(col("__u"), col("__qu")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive/retrieval training: from
    * a neighbor list, each query's nearest neighbor is its POSITIVE
    * and every later neighbor whose cosine trails the positive by
    * MORE than `margin` becomes one (positive, negative) row — the
    * margin excludes near-ties, which are as likely unlabeled
    * positives as negatives (the false-negative trap in contrastive
    * mining). Generator-agnostic, the [[voteLabels]] contract:
    * `neighbors` is (query_id, idCol, cosine, rank) from
    * [[bruteForceTopK]] / [[annTopK]] / [[ivfTopK]] / [[ivfPqTopK]],
    * so the same mining runs over exact or any approximate neighbor
    * generator. One window over the |Q|·k neighbor rows — no corpus
    * access at all.
    * Output: (query_id, positive_id, negative_id, pos_cosine,
    * neg_cosine, neg_rank). */
  def hardNegatives(neighbors: DataFrame, idCol: String,
      margin: Double): DataFrame = {
    require(margin >= 0, s"margin must be >= 0, got $margin")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rank").asc)
    neighbors
      .withColumn("positive_id", first(col(idCol)).over(w))
      .withColumn("pos_cosine", first(col("cosine")).over(w))
      .filter(col("rank") > 1 &&
        col("cosine") <= col("pos_cosine") - margin)
      .select(col("query_id"), col("positive_id"),
        col(idCol).as("negative_id"), col("pos_cosine"),
        col("cosine").as("neg_cosine"),
        (col("rank") - 1).cast("long").as("neg_rank"))
  }

  /** IVF-PQ search — FAISS's IVFADC composition, built from the two
    * registered halves: the coarse quantizer prunes each query to
    * its `nprobe` cells (an equi-join on `cell`, the [[ivfTopK]]
    * story), the surviving candidates are scored from PQ CODES at m
    * table-lookups per pair (the [[pqTopKAdc]] story), and the
    * ADC top-`rerank` are exact-cosine reranked. Per-query work is
    * ~ nprobe/nlist of the code-table scan — and the scan itself
    * reads m-byte codes, not d-float vectors — which is the
    * composition that keeps 100 TB of embeddings searchable.
    *
    * The coarse index is the SAME cached fit [[ivfTopK]] uses (one
    * quantizer per corpus key); the codebooks come from [[pqFit]].
    * Output: (query_id, idCol, cosine, rank). */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int,
      nlist: Int = 16, nprobe: Int = 4, rerank: Int = 50,
      seed: Long = 42L, indexKey: Option[String] = None,
      fitSampleCap: Int = 100000): DataFrame = {
    require(k >= 1 && rerank >= k, "need rerank >= k >= 1")
    val (assigned, centers) = coarseIndex(corpus, idCol, vecCol,
      nlist, seed, fitSampleCap, indexKey)
    // cell + codes in ONE projection over the assignment frame (two
    // kernel calls per row, no join between the two index halves)
    val enc = assigned.select(col(idCol), col("cell"),
        graft.functions.functions.pq_encode(
          col(vecCol).cast("array<double>"), codebooks).as("codes"))
      .filter(col("codes").isNotNull)
    val qp = probeCells(queries, queryIdCol, queryVecCol, centers,
      nprobe)
      .select(col("query_id"), col("cell"),
        graft.functions.functions.pq_table(
          col("__qvec").cast("array<double>"), codebooks).as("__tab"))
      .filter(col("__tab").isNotNull)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col(idCol).asc)
    val cand = enc.join(broadcast(qp), "cell")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        graft.functions.functions.pq_adc(col("__tab"), col("codes"))
          .as("__adc"))
      .withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= rerank)
      .select(col("query_id"), col(idCol))
    exactRerank(corpus, idCol, vecCol, queries, queryIdCol,
      queryVecCol, cand, k)
  }

  /** Exact-integer MIPS top-k over int8-quantized embeddings — the
    * one similarity search in the registry whose WHOLE ranking
    * hash-gates (the float-cosine paths are rows-only by their
    * sequential-fold arithmetic): both sides quantize through the
    * ns35-gated [[Embeddings.quantizeInt8]] transform, scores are
    * exact long sums of int products (|q_i·d_i| ≤ 127² = 16 129, 64
    * dims ⇒ ≤ 2^20 — no rounding anywhere), and ties break on id.
    * Maximum-inner-product over per-vector-scaled int8 codes is the
    * cheap-retrieval face of the quantized store (what a scalar-
    * quantized vector index serves between the PQ scan and the
    * exact rerank).
    *
    * Exactness scope: the ranking is exact IN CODE SPACE — the true
    * argmax of q·d over the stored int8 codes, which is what this
    * operator is a baseline FOR (the PQ/IVF kernels approximate the
    * same code-space score). It is NOT the MIPS order of the
    * dequantized float vectors when corpus norms vary: each vector
    * carries its own q_scale, and the raw code dot product ignores
    * both scales (multiplying them back in would leave double
    * arithmetic and the hash gate behind). Callers wanting
    * dequantized-space order should rerank the top candidates
    * through [[exactRerank]].
    *
    * Contract: the QUERY side must be small (it broadcasts; the
    * registered query pins ~32 ids) — the scan is |Q|·N·d work,
    * linear in the corpus for fixed |Q|. Scoring runs through the
    * codegen'd [[graft.functions.Int8DotKernel]] (one static call
    * per pair, the IvfAssignExpr tier), so the |Q|·N scan stays
    * inside WholeStageCodegen; NsSimilaritySpec pins kernel ≡
    * zip-fold. Output: (qIdCol, idCol, score, rn). */
  def int8MipsTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val dq = Embeddings.quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol), col("q").as("__dq"))
    val qq = Embeddings.quantizeInt8(queries, qIdCol, qVecCol)
      .select(col(qIdCol), col("q").as("__qq"))
    val scored = dq.crossJoin(broadcast(qq))
      .select(col(qIdCol), col(idCol),
        graft.functions.functions.int8_dot(col("__qq"), col("__dq"))
          .as("score"))
    graft.ops.Relational.topKPerGroup(scored, k, Seq(col(qIdCol)),
      Seq(col("score").desc, col(idCol).asc))
  }
}
