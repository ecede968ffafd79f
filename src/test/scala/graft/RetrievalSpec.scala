package graft

import org.apache.spark.sql.functions._

import graft.ns.Retrieval

/** Laws for BM25 retrieval ([[graft.ns.Retrieval]]). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick fox"),
    (2L, "a slow green turtle walks under the log"),
    (3L, "zebra zebra zebra stripes"),
    (4L, "the the the the the filler filler filler document here"),
    (5L, "quick quick quick brown brown dog")).toDF("doc_id", "text")

  test("unique query term retrieves exactly the docs containing it; " +
      "rarer terms outrank stopword-heavy matches") {
    val q = Seq((100L, "zebra")).toDF("q_id", "q_text")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q, "q_id", "q_text", k = 5)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.map(_._2).toSet == Set(3L), "only doc 3 contains zebra")
    // a two-term query: the doc matching the RARE term beats a doc
    // matching only the ubiquitous one
    val q2 = Seq((101L, "zebra the")).toDF("q_id", "q_text")
    val ranked = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q2, "q_id", "q_text", k = 6)
      .orderBy(col("rn")).as[(Long, Long, Long, Int)].collect()
    assert(ranked.head._2 == 3L, "zebra doc must rank first")
  }

  test("posting cap: inactive cap (m >= max df) reproduces the " +
      "uncapped ranking bit for bit; active cap keeps highest-impact " +
      "postings") {
    val q = Seq((1L, "the quick dog")).toDF("q_id", "q_text")
    val un = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q, "q_id", "q_text", k = 6)
      .as[(Long, Long, Long, Int)].collect().toSet
    val wide = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q, "q_id", "q_text", k = 6, maxPostingsPerTerm = Some(100))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(un == wide)
    // cap 1: each term keeps only its single highest-tf posting, so
    // candidates shrink to the union of per-term argmax docs
    val tight = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q, "q_id", "q_text", k = 6, maxPostingsPerTerm = Some(1))
      .as[(Long, Long, Long, Int)].collect()
    // 'the' argmax = doc 4 (tf 5); 'quick' argmax = doc 5 (tf 3);
    // 'dog' argmax = doc 5 (tf 1, shortest dl tiebreak... doc 5 and
    // doc 0 both tf 1 — dl: doc 5 has 6 words, doc 0 has 9 -> doc 5)
    assert(tight.map(_._2).toSet == Set(4L, 5L))
  }

  test("plan law: the (doc, term) tf exchange carries only query-term " +
      "postings — the broadcast semi-join prunes BELOW the partial " +
      "aggregate") {
    val q = Seq((1L, "zebra quick")).toDF("q_id", "q_text")
    val p = Retrieval.bm25TopK(corpus, "doc_id", "text",
      q, "q_id", "q_text", k = 3)
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toIndexedSeq
    // the tf partial aggregate: keyed on BOTH doc id and term
    val tfAgg = lines.indexWhere(l => l.contains("HashAggregate") &&
      l.contains("partial_count") && l.contains("doc_id") &&
      l.contains("term"))
    assert(tfAgg >= 0, s"no (doc, term) partial aggregate:\n$p")
    // the query-term prune: a broadcast LEFT SEMI join, printed
    // deeper in the tree (after) the aggregate it feeds — i.e. the
    // prune happens before the exchange, not after
    val semi = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semi >= 0, s"no broadcast semi-join prune:\n$p")
    assert(semi > tfAgg,
      s"semi-join prune is not below the tf partial aggregate:\n$p")
  }

  test("termStats merge by addition equals the full rebuild, at any " +
      "split of the corpus") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val full = Retrieval.termStats(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    Seq(2L, 3L, 7L).foreach { m =>
      val merged = (1L until m).foldLeft(
        Retrieval.termStats(docs.filter(col("doc_id") % m === 0),
          "doc_id", "text")) { (acc, r) =>
        Retrieval.mergeTermStats(acc,
          Retrieval.termStats(docs.filter(col("doc_id") % m === r),
            "doc_id", "text"))
      }.as[(String, Long, Long)].collect().toSet
      assert(merged == full, s"split mod $m")
    }
  }

  test("rrfFuse: exact contribution arithmetic, leg-order and " +
      "generator invariance, two-leg consensus outranks one-leg hits") {
    val legA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q", "id", "rn")
    val legB = Seq((1L, 10L, 1), (1L, 13L, 2)).toDF("q", "id", "rn")
    val out = Retrieval.rrfFuse(Seq(legA, legB), "q", "id", "rn")
      .select(col("q"), col("id"), col("rrf_nano"), col("n_legs"),
        col("rn"))
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._5)
    // doc 10 appears rank 1 in BOTH legs: 2·floor(1e9/61) exactly
    assert(out.head._2 == 10L)
    assert(out.head._3 == 2L * (1e9 / 61).toLong && out.head._4 == 2L)
    // a rank-2 single-leg doc scores exactly floor(1e9/62)
    val d13 = out.find(_._2 == 13L).get
    assert(d13._3 == (1e9 / 62).toLong && d13._4 == 1L)
    // leg order is irrelevant — fusion is a sum
    val swapped = Retrieval.rrfFuse(Seq(legB, legA), "q", "id", "rn")
      .select(col("q"), col("id"), col("rrf_nano"), col("n_legs"),
        col("rn"))
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(swapped == out.toSet)
    // generator invariance (the ns155 convention): fusion consumes
    // only (q, id, rn) — ANY retriever producing the same ranks
    // (here: the same lists re-derived through a different plan)
    // fuses identically
    val legA2 = legA.repartition(5).orderBy(col("rn").desc)
    val again = Retrieval.rrfFuse(Seq(legA2, legB), "q", "id", "rn")
      .select(col("q"), col("id"), col("rrf_nano"), col("n_legs"),
        col("rn"))
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(again == out.toSet)
  }

  test("contextAssembly: kept set is a strict rank prefix — a later " +
      "small doc never leapfrogs an earlier overflow") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q", "id", "rn")
    val docs = Seq((10L, "one two three"),
      (11L, "a b c d e f g h i j k l"), (12L, "x"))
      .toDF("doc_id", "text")
    // token counts 3, 12, 1; budget 5: cum = 3, 15, 16 → only rank 1
    // kept; rank 3 (1 token, would fit alone) must NOT be kept —
    // prompt order is rank order
    val out = Retrieval.contextAssembly(ranked, "q", "id", "rn",
      docs, "doc_id", "text", tokenBudget = 5)
      .select(col("q"), col("id"), col("rn"), col("n_tokens"),
        col("cum_tokens"), col("kept"))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._3)
    assert(out.map(t => (t._2, t._4, t._5, t._6)).toSeq == Seq(
      (10L, 3L, 3L, true), (11L, 12L, 15L, false),
      (12L, 1L, 16L, false)))
    // monotone: once false, always false (prefix property)
    assert(!out.dropWhile(_._6).exists(_._6))
  }

  test("contextAssembly: a ranked id missing from docs fails loudly " +
      "instead of silently shifting the kept prefix (round-13 ADVICE)") {
    val ranked = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3))
      .toDF("q", "id", "rn")
    val docs = Seq((10L, "one two three"), (12L, "x"))
      .toDF("doc_id", "text") // 99 absent: stale index vs store
    val ex = intercept[Exception] {
      Retrieval.contextAssembly(ranked, "q", "id", "rn",
        docs, "doc_id", "text", tokenBudget = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("missing from docs")), ex.toString)
  }

  test("contextAssembly: a missing LAST-ranked candidate also fails " +
      "loudly (r14 ADVICE — the trailing gap the rank-gap check " +
      "cannot see)") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3))
      .toDF("q", "id", "rn")
    val docs = Seq((10L, "one two three"), (11L, "a b"))
      .toDF("doc_id", "text") // 99 (the LAST rank) absent
    val ex = intercept[Exception] {
      Retrieval.contextAssembly(ranked, "q", "id", "rn",
        docs, "doc_id", "text", tokenBudget = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("trailing ranked id is missing")),
      ex.toString)
  }

  test("contextAssembly: a query whose ranked candidates are ALL " +
      "missing from docs also fails loudly instead of vanishing " +
      "(r15 ADVICE — zero survivors leave no row for a raise), and " +
      "intact sibling queries still assemble correctly") {
    val ranked = Seq((1L, 10L, 1), (1L, 12L, 2),
      (7L, 98L, 1), (7L, 99L, 2)) // q=7: BOTH ids absent from docs
      .toDF("q", "id", "rn")
    val docs = Seq((10L, "one two three"), (12L, "x"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Retrieval.contextAssembly(ranked, "q", "id", "rn",
        docs, "doc_id", "text", tokenBudget = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("query 7") &&
      m.contains("resolved 0 of 2")), ex.toString)
    // and with the vanished query removed, assembly is unchanged by
    // the sentinel machinery: rn, tokens, prefix all as before
    val ok = Retrieval.contextAssembly(
      ranked.filter(col("q") === 1), "q", "id", "rn",
      docs, "doc_id", "text", tokenBudget = 5)
      .select(col("id"), col("rn"), col("n_tokens"), col("kept"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._2)
    assert(ok.toSeq == Seq((10L, 1L, 3L, true), (12L, 2L, 1L, true)))
  }

  test("rankingQuality: hand-computed metrics, zero-hit queries keep " +
      "their row, perfect ranking scores exactly 1e9") {
    // q=1: gold {10, 11, 12}, hits at ranks 1 and 3 → recall 2/3,
    // mrr 1e9, dcg = disc(1)+disc(3); q=2: gold {20}, hit rank 2 →
    // ndcg = disc(2)/disc(1); q=3: gold {30}, no hit → zeros
    val ranked = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3),
      (2L, 98L, 1), (2L, 20L, 2), (3L, 97L, 1))
      .toDF("q", "id", "rn")
    val gold = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (3L, 30L)).toDF("gq", "gid")
    val out = Retrieval.rankingQuality(ranked, "q", "id", "rn",
      gold, "gq", "gid", k = 10)
      .select(col("q"), col("n_gold"), col("n_hits"),
        col("recall_nano"), col("mrr_nano"), col("dcg_nano"),
        col("idcg_nano"), col("ndcg_nano"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val d = Retrieval.ndcgDiscNano
    assert(out(1L) == ((1L, 3L, 2L, 666666666L, 1000000000L,
      d(0) + d(2), d(0) + d(1) + d(2),
      (d(0) + d(2)) * 1000000000L / (d(0) + d(1) + d(2)))))
    assert(out(2L) == ((2L, 1L, 1L, 1000000000L, 500000000L,
      d(1), d(0), d(1) * 1000000000L / d(0))))
    assert(out(3L) == ((3L, 1L, 0L, 0L, 0L, 0L, d(0), 0L)))
    // a perfect ranking of the whole gold set scores exactly 1e9
    val perfect = Retrieval.rankingQuality(
      Seq((7L, 1L, 1), (7L, 2L, 2)).toDF("q", "id", "rn"),
      "q", "id", "rn",
      Seq((7L, 1L), (7L, 2L)).toDF("gq", "gid"), "gq", "gid")
      .select(col("recall_nano"), col("ndcg_nano"), col("mrr_nano"))
      .as[(Long, Long, Long)].head()
    assert(perfect == ((1000000000L, 1000000000L, 1000000000L)))
  }

  test("rankingQuality on the fixture: RRF fusion never loses a gold " +
      "hit both legs agree on, and fused quality >= the weaker leg " +
      "(the planted-set pin)") {
    val docs = Tables(spark, sf, "documents")
    val emb = Tables(spark, sf, "embeddings")
    val qText = docs
      .filter(col("doc_id") % 59 === 3 && col("doc_id") < 3000)
      .select(col("doc_id").as("q_id"),
        array_join(slice(graft.ns.TextOps.wordTokens(col("text")), 1, 4),
          " ").as("q_text"))
    val lex = Retrieval.bm25TopK(docs, "doc_id", "text", qText,
        "q_id", "q_text", k = 10, maxPostingsPerTerm = Some(200))
      .select(col("q_id"), col("doc_id"), col("rn"))
    val qEmb = emb.filter(col("vec_id") % 59 === 3 && col("vec_id") < 3000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dense = graft.ns.Similarity.int8MipsTopK(emb, "vec_id",
        "embedding", qEmb, "q_id", "q_emb", k = 10)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("rn"))
    val fused = Retrieval.rrfFuse(Seq(lex, dense), "q_id", "doc_id",
      "rn", k = 60, topK = 10)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val gold = docs
      .filter(col("doc_id") % 59 === 3 && col("doc_id") < 3000)
      .select(col("doc_id").as("gq"))
      .select(col("gq"), explode(array(col("gq"), col("gq") + 59L,
        col("gq") + 118L)).as("gid"))
      .filter(col("gid") <= maxId)
    def total(ranked: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Retrieval.rankingQuality(ranked, "q_id", "doc_id", "rn",
        gold, "gq", "gid", k = 10)
        .agg(sum(col("mrr_nano")), sum(col("ndcg_nano")))
        .as[(Long, Long)].head()
      r
    }
    val (fMrr, fNdcg) = total(fused)
    val (lMrr, lNdcg) = total(lex)
    val (dMrr, dNdcg) = total(dense)
    // fusion beats (or ties) the WEAKER leg on the planted set — the
    // reason to fuse at all; a fixture pin, not a theorem
    assert(fMrr >= math.min(lMrr, dMrr), s"$fMrr < min($lMrr, $dMrr)")
    assert(fNdcg >= math.min(lNdcg, dNdcg),
      s"$fNdcg < min($lNdcg, $dNdcg)")
    // agreement preservation IS a theorem at these sizes: a gold doc
    // in BOTH legs' top-10 carries rrf >= 2/70ths while a doc in one
    // leg's top-1 carries at most 1/61st — with 20 candidate slots
    // and 10 output slots, both-leg hits always survive fusion
    val both = lex.join(dense, Seq("q_id", "doc_id"))
      .join(gold.select(col("gq").as("q_id"), col("gid").as("doc_id")),
        Seq("q_id", "doc_id"))
      .select(col("q_id"), col("doc_id"))
    val lost = both.join(fused.select(col("q_id"), col("doc_id")),
      Seq("q_id", "doc_id"), "left_anti").count()
    assert(lost == 0L, s"$lost agreed-on gold hits lost by fusion")
  }

  test("deterministic under repartitioning; knownStats reproduces " +
      "the computed-stats output") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(300)
    val q = docs.filter(col("doc_id") % 59 === 3)
      .select(col("doc_id").as("q_id"),
        array_join(slice(graft.ns.TextOps.wordTokens(col("text")),
          1, 4), " ").as("q_text"))
    val a = Retrieval.bm25TopK(docs, "doc_id", "text",
      q, "q_id", "q_text", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text",
      q, "q_id", "q_text", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(a == b)
    // knownStats short-circuit: same (N, T) => bit-identical scores.
    // The documented contract: N is TOKEN-BEARING docs (docs with >=1
    // word token), T total word tokens — exactly what the computed
    // branch derives, so the two paths agree for ANY corpus,
    // empty/whitespace-only docs included.
    val toks = docs.select(col("doc_id"),
      explode(graft.ns.TextOps.wordTokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val n = toks.select(col("doc_id")).distinct().count()
    val t = toks.count()
    val c = Retrieval.bm25TopK(docs, "doc_id", "text",
      q, "q_id", "q_text", k = 5, knownStats = Some((n, t)))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(a == c)
  }
}
