package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup CLUSTERING: the step after pair generation that the
  * dedup operators (ns02/ns03/ns04/ns07) feed. Pairwise near-dup
  * relations are not transitive, but dedup policy must be — "keep
  * one per group" needs the transitive closure, i.e. connected
  * components of the pair graph (what C4/Dolma/RefinedWeb-style
  * curation does between MinHash and the final keep-filter).
  *
  * Scale shape (the part that matters at 100 TB): the iterative work
  * runs ONLY on vertices that appear in a pair — a set bounded by
  * the near-dup graph, typically orders of magnitude smaller than
  * the corpus — and the corpus itself contributes exactly one
  * left join at the end. Each round combines hash-to-min label
  * propagation (label(v) ← min over v and its neighbours) with
  * pointer-halving (label(v) ← label(label(v))), so even a
  * path-shaped component converges in O(log n) rounds, not
  * O(diameter). Each round is two equi-joins + one map-combinable
  * min-aggregate on the (vertex, label) frame, and the round's
  * result is `localCheckpoint`ed: iterative DataFrame lineage
  * otherwise DOUBLES per round and the plan itself (not the data)
  * OOMs the driver — the classic Spark iterative-algorithm trap.
  * On a cluster, a reliable `checkpoint` dir replaces
  * localCheckpoint for executor-loss tolerance.
  */
object Clusters {

  /** Connected components over an undirected edge list via
    * hash-to-min label propagation. Input edges may be directed /
    * contain duplicates; they are symmetrized and deduped here.
    * Returns one row per DISTINCT endpoint: (id, component) with
    * component = min vertex id reachable — deterministic, engine-
    * independent, so a SQL engine's recursive closure produces the
    * identical assignment (ns37 hash-gates exactly that).
    *
    * The convergence check (`changed == 0`) counts label changes per
    * round — an action on the graph-bounded frame, not the corpus.
    * Labels only ever decrease, so fixpoint == no change. Throws if
    * `maxIter` rounds don't converge (with pointer-halving that
    * needs a component of diameter ≳ 2^maxIter — not a real graph). */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(true) // reused every round; flat lineage

    var labels = sym.select(col("a").as("id"), col("a").as("lab"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // hash-to-min: min over self + neighbour labels.
      val msgs = sym.join(labels, sym("a") === labels("id"))
        .select(sym("b").as("id"), labels("lab"))
      val hmin = labels.select(col("id"), col("lab")).union(msgs)
        .groupBy("id").agg(min("lab").as("lab"))
      // pointer-halving: lab(v) <- lab(lab(v)). A label is always a
      // vertex id, and hmin has a row per vertex, so the inner join
      // is total; min labels leap 2^k hops instead of 1.
      val ptr = hmin.select(col("id").as("pid"), col("lab").as("plab"))
      val next = hmin.join(ptr, hmin("lab") === ptr("pid"))
        .select(hmin("id"), col("plab").as("lab"))
        .localCheckpoint(true) // truncate the doubling lineage
      val changed = next
        .join(labels.withColumnRenamed("lab", "old"), "id")
        .filter(col("lab") < col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds")
    labels.withColumnRenamed("lab", "component")
  }

  /** Dedup clustering over a full corpus: assign every document a
    * cluster id (min doc id of its near-dup component; docs in no
    * pair are their own singleton cluster) and flag the one
    * representative to keep. Composes a pair generator with
    * [[connectedComponents]]; the corpus-sized work is the single
    * final left join.
    *
    * Output: (idCol, cluster_id, is_representative). The keep-one
    * dedup filter is `is_representative`. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol, maxIter)
    docs.select(col(idCol))
      .join(cc, docs(idCol) === cc("id"), "left")
      .select(docs(idCol),
        coalesce(col("component"), docs(idCol)).as("cluster_id"))
      .withColumn("is_representative",
        col(idCol) === col("cluster_id"))
  }

  /** Quality-aware survivor selection: within each near-dup cluster
    * keep the HIGHEST-SCORING member (ties → smallest id), not the
    * smallest-id one. [[dedupClusters]]'s `is_representative` is the
    * right keep-one for exact dups; for near-dups the members differ,
    * and curation pipelines keep the best copy (highest quality
    * score, longest, most recent — any score column works).
    *
    * `assign` is (idCol, clusterCol, ...) as produced by
    * [[dedupClusters]] / [[semanticDedup]]; `scores` maps id → score.
    * Output: (idCol, clusterCol, score, keep) — `filter(col("keep"))`
    * is the deduplicated corpus.
    *
    * Scale: one equi-join plus one window partitioned by cluster id.
    * Cluster sizes are bounded by the near-dup graph (singletons
    * dominate a real corpus), so the window key is high-cardinality
    * and skew-free; the sort within each tiny partition group is
    * negligible. */
  def survivorSelection(assign: DataFrame, idCol: String,
      clusterCol: String, scores: DataFrame, scoreIdCol: String,
      scoreCol: String): DataFrame = {
    val sc = scores.select(col(scoreIdCol).as("__sid"),
      col(scoreCol).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
      .orderBy(col("score").desc, col(idCol).asc)
    assign.join(sc, assign(idCol) === col("__sid"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(assign(idCol), col(clusterCol), col("score"), col("keep"))
  }

  /** Semantic dedup (SemDeDup-style): embedding-cosine near-dup
    * pairs → transitive closure → keep one representative per
    * semantic cluster. The full composition a curation pipeline
    * runs between embedding and training: LSH-bucketed candidate
    * generation (never all-pairs — [[graft.ns.Similarity
    * .cosineNearDupPairs]], exact-cosine-verified), then
    * [[dedupClusters]], whose iterative cost is bounded by the
    * near-dup graph. `filter(col("is_representative"))` is the
    * deduplicated corpus. Deterministic for a fixed seed.
    * Output: (idCol, cluster_id, is_representative). */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, numHashTables: Int = 8,
      bucketLength: Double = 0.5, seed: Long = 42L,
      maxIter: Int = 25,
      maxBucketSize: Option[Int] = None): DataFrame =
    dedupClusters(emb, idCol,
      graft.ns.Similarity.cosineNearDupPairs(emb, idCol, vecCol,
        minCosine, numHashTables, bucketLength, seed,
        maxBucketSize = maxBucketSize),
      "id_a", "id_b", maxIter)

  /** Domain-authority scoring over a (src_domain, dst_domain) link
    * graph — bounded-iteration PageRank (Brin & Page 1998) in EXACT
    * integer arithmetic, for frontier prioritization: a crawler
    * fetches high-authority domains first, and the score composes
    * with [[TextOps.crawlFrontier]]'s quota as the ordering key.
    *
    * Determinism (the hash-gate requirement): ranks are integer
    * micro-units of `scale`, every division is an explicit floor in
    * a FIXED dag — contrib(u) = rank(u) div outdeg(u), dangling
    * share = (Σ dangling ranks) div N, and
    * rank'(v) = ((den−num)·base) div den
    *          + (num·(inSum(v) + dShare)) div den
    * with base = scale div N — so long sums are order-independent
    * and an iteratively-UNROLLED SQL oracle reproduces every score
    * bit for bit. No float ever appears; `iterations` is a fixed
    * bound, not a convergence loop (the unrolled oracle must match
    * round counts exactly).
    *
    * Scale shape: edges symmetrize nothing and dedupe once; each
    * round is one (rank ⋈ outdeg) broadcast-or-shuffle join on the
    * DOMAIN-sized node frame, one edge join, one map-combinable sum
    * — all orders of magnitude below content volume (domains, not
    * pages). The dangling total is a one-long driver summary per
    * round (the ns102 driver-summary rule); lineage is
    * localCheckpoint'd per round like [[connectedComponents]].
    * Dangling mass (nodes with no out-links) redistributes uniformly
    * — the standard correction, and the dangling-node law in
    * ClustersSpec pins it.
    *
    * Output: (domain, auth_micro) — one row per distinct node,
    * auth_micro the integer rank in `scale` units. */
  def domainAuthority(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    domainAuthorityFrom(edges, srcCol, dstCol, initRanks = None,
      iterations, scale, dampNum, dampDen)

  /** [[domainAuthority]] WARM-STARTED from stored ranks (r15 — the
    * incremental maintenance shape): when a delta edge batch lands,
    * re-running the recurrence from the uniform vector pays the full
    * refit; starting from the PREVIOUS run's stored (domain,
    * auth_micro) table — new domains seeded at the uniform base —
    * reaches the same integer fixed point in fewer rounds
    * (ClustersSpec proves bit-equality at convergence and the round
    * saving on the fixture graph). The recurrence and its exact
    * integer dag are IDENTICAL to the cold path, so an unrolled SQL
    * oracle still reproduces every intermediate rank bit for bit —
    * it just unrolls from the stored vector instead of r0. */
  def domainAuthorityFrom(edges: DataFrame, srcCol: String,
      dstCol: String, initRanks: Option[DataFrame],
      iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, "iterations must be positive")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      "damping must be a fraction")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("domain"))
      .union(e.select(col("dst").as("domain")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty link graph")
    val base = scale / n
    val outdeg = e.groupBy(col("src").as("domain"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var rank = initRanks match {
      case None => nodes.withColumn("auth_micro", lit(base))
      // new domains seed at ZERO, not the uniform base: the stored
      // vector already carries ~`scale` of total mass, and excess
      // mass drains at only (dampNum/dampDen) per round — seeding
      // new nodes at base measurably SLOWED convergence past the
      // cold refit (ClustersSpec's round-count law caught it). A
      // zero-seeded node reaches (1−d)·base after one round anyway.
      case Some(stored) => nodes
        .join(stored.select(col("domain"),
          col("auth_micro").as("__init")), Seq("domain"), "left")
        .select(col("domain"),
          coalesce(col("__init"), lit(0L)).as("auth_micro"))
        .localCheckpoint(true)
    }
    var i = 0
    while (i < iterations) {
      val withDeg = rank.join(outdeg, Seq("domain"), "left")
      // one-long driver summary: total rank sitting on sink domains
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("auth_micro")), lit(0L)))
        .head().getLong(0)
      val dShare = dangling / n
      val inSum = withDeg.filter(col("outdeg").isNotNull)
        .select(col("domain").as("src"),
          expr("auth_micro div outdeg").as("__c"))
        .join(e, Seq("src"))
        .groupBy(col("dst").as("domain"))
        .agg(sum(col("__c")).as("__in"))
      rank = nodes.join(inSum, Seq("domain"), "left")
        .select(col("domain"),
          (lit((dampDen - dampNum) * base / dampDen) +
            expr(s"($dampNum * (coalesce(__in, 0L) + ${dShare}L))" +
              s" div ${dampDen}L")).as("auth_micro"))
        .localCheckpoint(true)
      i += 1
    }
    rank
  }
}
