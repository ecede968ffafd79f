package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus (SURVEY.md §2.8 [NS]) — the
  * index-and-score side of a RAG / data-curation loop: BM25
  * (Robertson & Zaragoza 2009, the Okapi form), the ranking function
  * behind Lucene/Elasticsearch and the lexical half of every hybrid
  * retriever. A training-data pipeline runs it for benchmark
  * decontamination by retrieval (find near matches the n-gram gates
  * miss), for hard-negative mining against a lexical baseline, and
  * for dataset search.
  *
  * Determinism (the hash-gate requirement, the dq03/ns58 recipe):
  * the per-term idf = ln((N − df + ½)/(df + ½) + 1) is fixed-point
  * nano-quantized ONCE per distinct vocabulary term (libm ln is
  * bit-stable across this repo's engines — the proven ns58 idiom);
  * the per-(term, doc) saturation factor is a FIXED dag of IEEE
  * double ops — one division for avgdl, one per score term — with
  * constants that parse to identical doubles in both engines; and
  * each term's contribution floors to a nano-unit long BEFORE the
  * per-query sum, so the summed score is exact integer arithmetic
  * (order/partition-independent) and the (score desc, id) rank is
  * engine-independent.
  *
  * Plan shape (what survives 100 TB): the QUERY side is tiny by
  * construction and broadcasts twice — once as a distinct-term
  * semi-join that prunes the raw TOKEN stream to query terms BEFORE
  * the tf groupBy (the inverted-index probe: the per-(doc, term)
  * exchange carries query-term postings only, never the corpus
  * vocabulary), once to fan pruned postings out per query id. The
  * document-frequency table collapses to one row per surviving term
  * (Zipf-bounded, the ns26 broadcast argument). The only corpus-
  * sized exchange left is the docLen groupBy — irreducible, BM25's
  * length normalization needs every doc's FULL token count; the
  * final per-query top-k is a window group limit over candidate
  * rows only.
  */
object Retrieval {

  /** BM25 top-k: for each query row, the `k` highest-scoring
    * documents. `docs` (idCol, textCol) is the corpus; `queries`
    * (qIdCol, qTextCol) is small (hundreds–thousands — it
    * broadcasts). Repeated query terms score once per distinct term
    * (the standard bag-of-TERMS simplification; repeating a term in
    * a query is rare and pathological). Documents share the corpus
    * tokenization ([[TextOps.wordTokens]]).
    *
    * `knownStats` short-circuits the corpus-size aggregate like
    * [[TextOps.tfidfTopTerms]]'s knownN. CONTRACT: the pair is
    * (N = TOKEN-BEARING docs — docs with ≥1 word token after the
    * corpus tokenization, NOT the catalog row count — and T = total
    * word tokens). For a corpus containing empty/whitespace-only
    * docs the two doc counts differ, and idf/avgdl would silently
    * shift if a caller passed the raw row count; pass the stored
    * index's own (N, T) (what [[termStats]] maintenance carries) and
    * the short-circuit is bit-identical to the computed branch.
    *
    * `maxPostingsPerTerm` is the SCALE knob (the WAND/impact-ordered
    * pruning direction): candidate work is Σ_q Σ_{t∈q} df(t), and a
    * stopword's posting list grows with the corpus while its idf —
    * hence its score contribution — shrinks toward zero, so at 10×
    * data AND 10× queries the uncapped join does 100× work for
    * near-zero ranking change (measured 13× wall at 10× on this
    * host). The cap keeps each term's `m` highest-impact postings by
    * the deterministic (tf desc, dl asc, id) order — a window group
    * limit that prunes partition-locally before the exchange — and
    * the ORACLE replicates the same window, so the capped ranking
    * hash-gates exactly; it is an approximation of uncapped BM25
    * only in the sense every production impact-pruned engine is.
    *
    * Output: (qIdCol, idCol, score_nano, rn) — rn 1-based per query
    * in (score_nano desc, idCol) order. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      knownStats: Option[(Long, Long)] = None,
      maxPostingsPerTerm: Option[Int] = None): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxPostingsPerTerm.forall(_ >= 1),
      "maxPostingsPerTerm must be positive when given")
    val toks = docs.select(col(idCol),
      explode(TextOps.wordTokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val qTerms = queries.select(col(qIdCol),
      explode(TextOps.wordTokens(col(qTextCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    // THE prune: semi-join the token stream against the broadcast
    // distinct query-term set BEFORE the tf groupBy, so the one
    // corpus-sized exchange this operator pays carries query-term
    // postings only, not the whole corpus vocabulary. Semantics-
    // preserving: per-(doc, term) counts for surviving terms are
    // unchanged, and non-query terms could never reach a score
    // anyway. docLen and the (N, T) stats stay corpus-wide below,
    // as BM25's length normalization requires.
    val toksQ = toks.join(
      broadcast(qTerms.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val tf = toksQ.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docLen = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"))
    val stats = knownStats match {
      case Some((n, t)) => docs.sparkSession.range(1)
        .select(lit(n).as("__n"), lit(t).as("__t"))
      case None => toks.agg(
        countDistinct(col(idCol)).as("__n"),
        count(lit(1)).as("__t"))
    }
    // vocabulary side: df per term over the already-pruned postings
    // (identical counts — the prune is term-keyed)
    val dfreq = tf
      .groupBy(col("term"))
      .agg(count(lit(1)).as("dfreq"))
    val idf = dfreq.crossJoin(broadcast(stats))
      .select(col("term"), col("dfreq"), col("__n"), col("__t"),
        // fixed-point ONCE per distinct term (ns58): floor(ln(x)·1e9)
        floor(log((col("__n").cast("double") - col("dfreq") + 0.5) /
          (col("dfreq").cast("double") + 0.5) + 1.0) * 1e9)
          .cast("long").as("idf_nano"))
    val postingsAll = tf
      .join(broadcast(idf), Seq("term"))
      .join(docLen, Seq(idCol))
    val postings = maxPostingsPerTerm match {
      case Some(m) => graft.ops.Relational.topKPerGroup(
        postingsAll, m, Seq(col("term")),
        Seq(col("tf").desc, col("dl").asc, col(idCol).asc))
        .drop("rn")
      case None => postingsAll
    }
    // FIXED dag of IEEE ops — identical tree in the SQL oracle —
    // then floored to a nano long PER (term, doc) so the per-query
    // sum is exact integer arithmetic, order- and partition-
    // independent (a double sum in shuffle order would not be)
    val tfD = col("tf").cast("double")
    val dlNorm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") /
      (col("__t").cast("double") / col("__n").cast("double")))
    val termScore = col("idf_nano").cast("double") *
      (tfD * lit(k1 + 1.0)) / (tfD + lit(k1) * dlNorm)
    val scored = postings
      .join(broadcast(qTerms), Seq("term"))
      .select(col(qIdCol), col(idCol),
        floor(termScore).cast("long").as("__s"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("__s")).as("score_nano"))
    graft.ops.Relational.topKPerGroup(
      scored, k, Seq(col(qIdCol)),
      Seq(col("score_nano").desc, col(idCol).asc))
  }

  /** Per-term index statistics — the MERGEABLE state a BM25 index
    * maintains (the ns93/s08 store-once/merge-forever convention):
    * document frequency and total term frequency are exact integer
    * sums, so a new ingest batch's stats ADD onto the stored table
    * (one batch-sized pass, never a corpus rescan), and the posting
    * rows themselves are append-only. With (N, T) carried the same
    * way, scoring against the merged stats is bit-identical to a
    * full rebuild — the RetrievalSpec merge law. Output:
    * (term, dfreq, tf_total). */
  def termStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(TextOps.wordTokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("dfreq"), sum(col("__tf")).as("tf_total"))

  /** Merge term-stat tables by addition (disjoint doc sets — the
    * caller's contract, same as every incremental-store operator:
    * dedup happens UPSTREAM via ns25/ns55). */
  def mergeTermStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("term"))
      .agg(sum(col("dfreq")).as("dfreq"),
        sum(col("tf_total")).as("tf_total"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * — the standard hybrid-retrieval combiner: every production
    * retriever fuses a lexical leg (BM25) with a dense leg (ANN)
    * because each catches matches the other misses, and RRF needs no
    * score calibration between legs — only their RANKS. Each leg
    * contributes floor(1e9 / (k + rank)) nano-units per (query, doc)
    * and the fused score is the exact integer sum (the determinism
    * recipe: ONE IEEE division per contribution — the identical dag
    * in DuckDB — floored to a long BEFORE the sum, so the total is
    * order/partition-independent and the (score desc, id) rank
    * hash-gates). k = 60 is the published default.
    *
    * Plan shape: each leg is already a per-query top-k (tiny — |Q|
    * × leg-k rows), so the union + groupBy + window all run on
    * candidate-sized frames; the corpus-scale work happened inside
    * the legs. Output: (qCol, idCol, rrf_nano, n_legs, rn). */
  def rrfFuse(legs: Seq[DataFrame], qCol: String, idCol: String,
      rnCol: String, k: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(k >= 0 && topK >= 1, "need k >= 0 and topK >= 1")
    val scored = legs.map(df => df.select(col(qCol), col(idCol),
        floor(lit(1e9) /
          (lit(k.toDouble) + col(rnCol).cast("double")))
          .cast("long").as("__rrf")))
      .reduce(_ unionByName _)
      .groupBy(col(qCol), col(idCol))
      .agg(sum(col("__rrf")).as("rrf_nano"),
        count(lit(1)).as("n_legs"))
    graft.ops.Relational.topKPerGroup(scored, topK,
      Seq(col(qCol)), Seq(col("rrf_nano").desc, col(idCol).asc))
  }

  /** RAG context assembly under a token budget — the step between
    * "ranked candidates" and "what goes in the prompt": walk each
    * query's ranking in order, keep documents while the RUNNING
    * token total still fits `tokenBudget`, stop at the first
    * overflow (prompt order is rank order, so the kept set is a
    * PREFIX — a later small doc must not leapfrog an earlier big
    * one). Token counts use the BPE-ish subword proxy
    * ([[TextOps.bpeTokenCount]] — letter runs, digit runs, single
    * marks), the repo's SQL-replicable stand-in for a real
    * tokenizer's count; exact-id counting at candidate scale goes
    * through [[graft.ns.Bpe.encodeDocs]] when a caller needs it.
    *
    * Plan shape: candidates are |Q| × k rows, so the doc-text join
    * is candidate-sized (the ranked side broadcasts), and the
    * running sum is one window per query over ≤ k rows. Output:
    * (qCol, idCol, rn, n_tokens, cum_tokens, kept). */
  def contextAssembly(ranked: DataFrame, qCol: String, idCol: String,
      rnCol: String, docs: DataFrame, docIdCol: String,
      textCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    // Loud failure on unresolved ids (round-13 ADVICE) WITHOUT
    // giving up the broadcast plan (r14 review): a left join would
    // catch missing ids via nulls, but Spark cannot broadcast the
    // PRESERVED side of a left-outer join, so the candidate-sized
    // hint degrades to a corpus-wide shuffle of the docs projection.
    // Instead the join stays INNER (broadcast-able: build side =
    // the tiny ranked set), and the missing-id detection rides the
    // window pass that runs anyway: `rn` is the documented
    // contiguous 1-based rank per query, so a dropped candidate
    // leaves a gap where rn != row_number over the same order and
    // every later row raises. A candidate set pointing at absent
    // doc text is a pipeline bug (stale index vs store), so it
    // raises, not shifts. A missing LAST rank has no later rows to
    // misalign, so (r14 ADVICE) a second completeness check closes
    // that hole: the expected per-query candidate count (= max rn,
    // ranks are contiguous 1-based by contract) is stamped on the
    // TINY ranked side before the join, and after the join the
    // full-partition survivor count must equal it — same qCol
    // partitioning as the running sum, so no extra exchange on the
    // corpus-sized side and the broadcast plan is preserved.
    // Candidate-sized (≤ |Q|·k rows) and consumed THREE times below
    // (broadcast build, sentinels, semi-join ids): materialize once so
    // an expensive upstream ranking (ns185 feeds the whole hybrid-RRF
    // pipeline in) is evaluated once, not per consumer (r19; the r18
    // §2 double-evaluation class).
    val rankedX = ranked
      .select(col(qCol), col(idCol), col(rnCol).cast("long").as("rn"))
      .withColumn("__expect", max(col("rn")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qCol))))
      .localCheckpoint(true)
    // Candidate-prune BEFORE the token count (r19, guide §2.3/§3.2):
    // the broadcast inner join only FILTERS at the probe, so a token
    // count projected on the corpus side would be evaluated for every
    // document and discarded for all but the ~k·|Q| candidates — the
    // exact duplicated-expensive-work shape at 100 TB. A broadcast
    // LEFT SEMI join on the candidate ids drops non-candidates first;
    // the BPE count then runs on candidate rows only. Result-identical
    // (the inner join keeps exactly the semi-join's survivors).
    val candDocs = docs
      .select(col(docIdCol).as(idCol), col(textCol))
      .join(broadcast(rankedX.select(col(idCol)).distinct()),
        Seq(idCol), "left_semi")
    val joined = broadcast(rankedX)
      .join(candDocs.select(col(idCol),
        TextOps.bpeTokenCount(col(textCol)).cast("long")
          .as("__tok")), Seq(idCol))
    // One SENTINEL row per query (rn = 0), unioned into the
    // candidate-sized joined frame (r15 ADVICE): a query whose ranked
    // candidates are ALL missing from docs survives the inner join
    // with ZERO rows, so no per-row raise could fire — the sentinel
    // guarantees every query at least one row in the window pass, and
    // the completeness check below (survivor count vs __expect, now
    // counted EXCLUDING the sentinel) raises for it like any other
    // trailing gap. Built from the tiny ranked side: no second corpus
    // pass, and the broadcast inner-join plan is untouched.
    val idType = rankedX.schema(idCol).dataType
    val sentinels = rankedX.groupBy(col(qCol))
      .agg(max(col("rn")).as("__expect"))
      .select(lit(null).cast(idType).as(idCol), col(qCol),
        lit(0L).as("rn"), col("__expect"),
        lit(null).cast("long").as("__tok"))
    val withTok = joined.unionByName(sentinels)
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qCol)).orderBy(col("rn"))
    val w = ordered.rowsBetween(org.apache.spark.sql.expressions
      .Window.unboundedPreceding, 0)
    val full = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qCol)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    withTok
      // the sentinel is always row 1 (rn = 0 sorts first), so real
      // rows sit at row_number − 1; both raises evaluate on the
      // sentinel row too, which is what catches a zero-survivor query
      .withColumn("n_tokens", when(
          col("rn") =!= row_number().over(ordered).cast("long") - 1L,
          raise_error(concat(
            lit("contextAssembly: rank gap at rn="),
            col("rn").cast("string"), lit(" for query "),
            col(qCol).cast("string"),
            lit(" — a ranked id is missing from docs")))
            .cast("long"))
        .when(count(lit(1)).over(full) - 1L =!= col("__expect"),
          raise_error(concat(
            lit("contextAssembly: query "), col(qCol).cast("string"),
            lit(" resolved "),
            (count(lit(1)).over(full) - 1L).cast("string"),
            lit(" of "), col("__expect").cast("string"),
            lit(" ranked candidates — a trailing ranked id is missing"
              + " from docs"))).cast("long"))
        // ONLY the sentinel (rn = 0) takes the 0-token fill; a real
        // row's null __tok (null doc text) keeps propagating as null
        // instead of silently costing nothing and reading as kept
        // (r16 review)
        .otherwise(when(col("rn") === 0L, lit(0L))
          .otherwise(col("__tok"))))
      .drop("__tok", "__expect")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // the sentinel (rn = 0, 0 tokens) exits AFTER the window pass,
      // so its raises evaluated; the filter cannot push below the
      // window (rn is not a partition column)
      .filter(col("rn") >= 1L)
      .select(col(qCol), col(idCol), col("rn"), col("n_tokens"),
        col("cum_tokens"),
        (col("cum_tokens") <= tokenBudget).as("kept"))
  }

  /** Per-rank nDCG discount, nano fixed point: floor(1e9 / log2(r+1))
    * for rank r = 1..10, checked in as EXACT INTEGER LITERALS shared
    * with the DuckDB oracle — the rank domain is tiny (k ≤ 10), so
    * instead of trusting two libms to round log2 identically (the
    * ns58 tightrope), both sides read the same ten constants. */
  val ndcgDiscNano: Seq[Long] = Seq(1000000000L, 630929753L,
    500000000L, 430676558L, 386852807L, 356207187L, 333333333L,
    315464876L, 301029995L, 289064826L)

  /** Prefix sums of [[ndcgDiscNano]] — IDCG@k for a gold set of size
    * ≥ k under binary relevance. */
  val ndcgIdealNano: Seq[Long] = ndcgDiscNano.scanLeft(0L)(_ + _).tail

  /** Ranking-quality metrics against a gold relevance set — the
    * release-datasheet row a retrieval stack ships with (recall@k,
    * MRR, nDCG@k), all EXACT fixed-point arithmetic over rank
    * columns (the ns149 PR-curve convention one level up): binary
    * relevance, mrr_nano = 1e9/first-hit-rank (0 when no hit),
    * dcg from the literal discount table, ndcg_nano =
    * dcg·1e9/idcg floored. Queries with no top-k hit still emit
    * their row (zeros) — a datasheet that silently drops failing
    * queries overstates quality.
    *
    * Plan shape: `ranked` is |Q|·k rows and `gold` |Q|·|gold| — both
    * candidate-sized; the joins broadcast and the aggregation is one
    * |Q|-keyed exchange. The corpus-scale work happened inside the
    * retrieval legs. Output: (qCol, n_gold, n_hits, recall_nano,
    * mrr_nano, dcg_nano, idcg_nano, ndcg_nano). */
  def rankingQuality(ranked: DataFrame, qCol: String, idCol: String,
      rnCol: String, gold: DataFrame, gQCol: String, gIdCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= ndcgDiscNano.length,
      s"k must be in [1, ${ndcgDiscNano.length}]")
    // distinct: a duplicated (query, doc) gold row would otherwise
    // inflate n_gold AND double-count its hit's dcg through the join
    // fan-out — nDCG could exceed 1e9 with no error (r14 review).
    val g = gold.select(col(gQCol).as(qCol), col(gIdCol).as(idCol))
      .distinct()
    val nGold = g.groupBy(col(qCol))
      .agg(count(lit(1)).as("n_gold"))
    val disc = (1 to k).foldLeft(lit(0L)) { (acc, r) =>
      when(col("rn") === r, lit(ndcgDiscNano(r - 1))).otherwise(acc)
    }
    val hits = ranked
      .select(col(qCol), col(idCol), col(rnCol).cast("long").as("rn"))
      .filter(col("rn") <= k)
      .join(broadcast(g), Seq(qCol, idCol))
      .groupBy(col(qCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("rn")).as("__first"),
        sum(disc).as("__dcg"))
    val ideal = (1 to k).foldLeft(lit(0L)) { (acc, n) =>
      when(least(col("n_gold"), lit(k.toLong)) === n,
        lit(ndcgIdealNano(n - 1))).otherwise(acc)
    }
    nGold.join(hits, Seq(qCol), "left")
      .select(col(qCol), col("n_gold"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("__first"), coalesce(col("__dcg"), lit(0L)).as("dcg_nano"),
        ideal.as("idcg_nano"))
      .select(col(qCol), col("n_gold"), col("n_hits"),
        expr("(n_hits * 1000000000L) div n_gold").as("recall_nano"),
        when(col("__first").isNull, 0L)
          .otherwise(expr("1000000000L div __first")).as("mrr_nano"),
        col("dcg_nano"), col("idcg_nano"),
        expr("(dcg_nano * 1000000000L) div idcg_nano").as("ndcg_nano"))
  }
}
