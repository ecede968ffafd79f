package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ns.TextOps

class NsTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("plantCanaries -> canaryScan closes the loop: the scan finds " +
      "exactly the planted set") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = TextOps.plantCanaries(docs, "doc_id", "text")
    val expected = planted.filter(col("planted"))
      .select(col("doc_id"), col("canary"))
      .as[(Long, String)].collect().toSet
    assert(expected.nonEmpty, "fixture must plant at least one canary")
    assert(expected.map(_._2).size == expected.size,
      "markers must be unique per doc")
    val found = TextOps.canaryScan(
      planted.select(col("doc_id"), col("text_out").as("text")),
      "doc_id", "text", expected.map(_._2).toSeq.sorted)
      .as[(Long, String)].collect().toSet
    assert(found == expected,
      "scan must recover exactly the planted (doc, marker) set")
  }

  test("pseudonymizeEmails: stable cross-document pseudonyms, no raw " +
      "address survives, email-free text unchanged") {
    val docs = Seq(
      (1L, "write a@x.com and b@y.org today"),
      (2L, "reply to a@x.com please"),
      (3L, "no addresses here")).toDF("doc_id", "text")
    val out = TextOps.pseudonymizeEmails(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 == 2L && out(2L)._2 == 1L && out(3L)._2 == 0L)
    assert(out(3L)._1 == "no addresses here")
    assert(!out(1L)._1.contains("a@x.com") &&
      !out(1L)._1.contains("b@y.org") && !out(2L)._1.contains("a@x.com"))
    // the SAME address must yield the SAME pseudonym in both docs
    val p1 = out(1L)._1.split(" ").find(_.endsWith("@anon.invalid")).get
    assert(out(2L)._1.contains(p1),
      s"cross-document identity must survive: $p1 not in ${out(2L)._1}")
  }

  test("bigramNll penalizes destroyed word order that unigramNll " +
      "cannot see; backoff makes unseen pairs costlier than seen") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    // same token multiset, order destroyed
    val shuffled = "mat the on rug sat dog the and cat the on sat the"
    val docs = Seq((1L, fluent), (2L, shuffled)).toDF("doc_id", "text")
    val uni = TextOps.unigramNll(docs, "doc_id", "text")
      .select(col("doc_id"), col("mean_nll"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(uni(1L) - uni(2L)) < 1e-12,
      "a unigram LM is order-blind: identical multisets score equal")
    val train = Seq((10L, fluent), (11L, fluent)).toDF("doc_id", "text")
    val big = TextOps.bigramNll(docs, "doc_id", "text",
      train = Some(train))
      .select(col("doc_id"), col("mean_nll"))
      .as[(Long, Double)].collect().toMap
    assert(big(2L) > big(1L) + 0.5,
      s"bigram LM must penalize the shuffle: ${big(1L)} vs ${big(2L)}")
    // determinism under repartitioning
    val re = TextOps.bigramNll(docs.repartition(7), "doc_id", "text",
      train = Some(train.repartition(5)))
      .select(col("doc_id"), col("mean_nll"))
      .as[(Long, Double)].collect().toMap
    assert(re == big, "score must be partition-independent")
  }

  test("redactPii replaces and counts sequentially, no shuffle") {
    val df = TextOps.redactPii(docs(
      // the dotted quad inside the email domain must count as email,
      // not ipv4 (sequential semantics)
      1L -> "mail bob@10.0.0.5.example.com or bob@corp.example.org, dial +1-555-010-2030, host 192.168.0.1",
      2L -> "no pii here",
      // card (dash AND space groupings) + ssn; the ssn pattern must
      // never fire inside a card number (cc is redacted first)
      3L -> "pay 4111-1111-1111-1234 or 5500 0000 0000 0004, ssn 123-45-6789"),
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "redactPii must stay map-side")
    val out = df.as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(1L) == ((2L, 1L, 0L, 0L, 1L,
      "mail <EMAIL> or <EMAIL>, dial <PHONE>, host <IPV4>")))
    assert(out(2L) == ((0L, 0L, 0L, 0L, 0L, "no pii here")))
    assert(out(3L) == ((0L, 0L, 2L, 1L, 0L,
      "pay <CC> or <CC>, ssn <SSN>")))
  }

  test("redactPii kernel ≡ regexp fold bit-exactly (r17 promotion " +
      "law), kernel evaluates ONCE per row, null text stays null") {
    val fixture = docs(
      1L -> "mail bob@10.0.0.5.example.com or bob@corp.example.org, dial +1-555-010-2030, host 192.168.0.1",
      2L -> "no pii here at all just words",
      3L -> "pay 4111-1111-1111-1234 or 5500 0000 0000 0004, ssn 123-45-6789",
      4L -> "edge@case.ab ip 999.999.999.999 plus 12.3.4.5 and 1-2",
      5L -> "")
      // adversarial: replacement-adjacent digits, $-chars near matches
      .union(docs(6L -> "cost $5 email a@b.co 1.2.3.4\\$1 end"))
      .union(Seq((7L, null: String)).toDF("doc_id", "text"))
    val kernel = TextOps.redactPii(fixture, "doc_id", "text")
    val fold = TextOps.redactPiiFold(fixture, "doc_id", "text")
    val k = kernel.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val f = fold.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(k == f, s"kernel/fold diverge:\n$k\n$f")
    assert(k(7L).forall(_ == null), "null text must stay null")
    // the expensive kernel must appear exactly once in the plan (the
    // two-step select relies on CollapseProject's non-cheap rule);
    // repartition first or ConvertToLocalRelation pre-evaluates the
    // whole fixture into a LocalTableScan and hides the expression
    val plan = TextOps.redactPii(fixture.repartition(2), "doc_id",
      "text").queryExecution.executedPlan.toString
    assert("pii_scrub".r.findAllIn(plan).size == 1,
      s"pii_scrub must evaluate once, plan:\n$plan")
  }

  test("tfidf minDf cuts the broadcast side; output is a subset") {
    val d = docs(
      1L -> "rare rare base base",
      2L -> "base other",
      3L -> "base other")
    def rows(minDf: Int) =
      TextOps.tfidfTopTerms(d, "doc_id", "text", 2, minDf = minDf)
        .as[(Long, String, Long, Double, Int)].collect().toSet
    val full = rows(1)
    val cut = rows(2)
    // every minDf=2 row is a minDf=1 row modulo rank renumbering
    assert(cut.map(r => (r._1, r._2, r._3, r._4))
      .subsetOf(full.map(r => (r._1, r._2, r._3, r._4))))
    // "rare" (df=1) is gone from doc 1 at minDf=2, "base" (df=3) stays
    assert(!cut.exists(_._2 == "rare") && full.exists(_._2 == "rare"))
    assert(cut.exists(r => r._1 == 1L && r._2 == "base"))
  }

  test("tfidf knownN skips the corpus-count scan, same output") {
    val d = docs(
      1L -> "rare rare base base",
      2L -> "base other",
      3L -> "base other")
    val dflt = TextOps.tfidfTopTerms(d, "doc_id", "text", 2)
    val known = TextOps.tfidfTopTerms(d, "doc_id", "text", 2,
      knownN = Some(3L))
    assert(known.as[(Long, String, Long, Double, Int)].collect().toSet ==
      dflt.as[(Long, String, Long, Double, Int)].collect().toSet)
    // the knownN plan must not contain the 1-row corpus-count subtree
    val aggs = known.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("HashAggregate"))
    val dfltAggs = dflt.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("HashAggregate"))
    assert(aggs < dfltAggs,
      s"knownN should drop the corpus-count aggregate ($aggs vs $dfltAggs)")
  }

  test("repetitionStats measures excess-copy line/char fractions, no shuffle") {
    val df = TextOps.repetitionStats(docs(
      1L -> "aaaa\nbb\naaaa\n\ncc",   // 4 non-empty lines, aaaa twice
      2L -> "xx\nyy",                  // no duplicates
      3L -> ""),                       // no lines at all
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "repetitionStats must stay map-side")
    val out = df.as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: 4 lines, 3 unique; dup chars = 4 ("aaaa") of 12 total
    assert(out(1L) == ((4L, 3L, 0.25, 4.0 / 12)))
    assert(out(2L) == ((2L, 2L, 0.0, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0, 0.0)))
  }

  test("vocab returns deterministic top-k with (count, word) tiebreak") {
    val out = TextOps.vocab(docs(
      1L -> "red red blue green",
      2L -> "blue red green"), "text", 3)
      .as[(String, Long)].collect().toSeq
    // red×3; blue and green tie at 2 → word asc breaks the tie
    assert(out == Seq(("red", 3L), ("blue", 2L), ("green", 2L)))
  }

  test("tokenAccounting sums per group, hand-checked") {
    val out = TextOps.tokenAccounting(
      docs(1L -> "one two", 2L -> "three four five!")
        .withColumn("src", when(col("doc_id") === 1L, "a").otherwise("b")),
      Seq(col("src")), "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (s, a, b, c, d) => s -> ((a, b, c, d)) }.toMap
    assert(out("a") == ((1L, 2L, 2L, 7L)))
    // "three four five!" → bpe: three,four,five,"!" = 4 tokens
    assert(out("b") == ((1L, 4L, 3L, 16L)))
  }

  test("tfidfTopTerms ranks rare terms above common ones") {
    // "rare" appears in 1 of 3 docs, "base" in all 3: for doc 1,
    // score(rare) = 2*3/1 = 6 > score(base) = 2*3/3 = 2
    val out = TextOps.tfidfTopTerms(docs(
      1L -> "rare rare base base",
      2L -> "base other",
      3L -> "base other"), "doc_id", "text", 2)
      .filter(col("doc_id") === 1L)
      .orderBy("rn")
      .as[(Long, String, Long, Double, Int)].collect().toSeq
    assert(out == Seq((1L, "rare", 2L, 6.0, 1), (1L, "base", 2L, 2.0, 2)))
  }

  test("vocab plans TakeOrdered; tfidf broadcasts the df side") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // top-k must NOT be a global sort — k rows per partition only
    val vplan = TextOps.vocab(d, "text", 10)
      .queryExecution.executedPlan.toString
    assert(vplan.contains("TakeOrdered"),
      s"vocab should plan TakeOrderedAndProject:\n$vplan")
    // the vocabulary-sized df table must broadcast, not sort-merge
    val tplan = TextOps.tfidfTopTerms(d, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(tplan.contains("BroadcastHashJoin"),
      s"tfidf should broadcast the document-frequency side:\n$tplan")
  }

  test("qualityScoreCol/langIdCol agree with the DataFrame forms") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fromDf = TextOps.qualityScore(d, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
      .join(TextOps.langId(d, "doc_id", "text"), "doc_id")
    val fromCols = d.select(col("doc_id"),
      TextOps.qualityScoreCol(col("text")).as("quality_score"),
      TextOps.langIdCol(col("text")).as("lang_pred"))
    assert(fromDf.exceptAll(fromCols).isEmpty &&
      fromCols.exceptAll(fromDf).isEmpty)
  }

  test("textStats computes hand-checked surface statistics, no shuffle") {
    val df = TextOps.textStats(
      docs(1L -> "The quick, quick fox!"), "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "textStats must stay map-side")
    val r = df.collect().head
    assert(r.getAs[Long]("n_chars") == 21L)
    assert(r.getAs[Long]("n_words") == 4L)   // the quick, quick fox!
    // bpe-ish: The, quick, ",", quick, fox, "!" → 6
    assert(r.getAs[Long]("n_bpe_tokens") == 6L)
    // norm "the quick, quick fox!" sans spaces = 18 chars / 4 words
    assert(r.getAs[Double]("avg_word_len") == 4.5)
    assert(r.getAs[Double]("punct_ratio") == 2.0 / 21)
    assert(r.getAs[Double]("stopword_ratio") == 0.25) // "the"
  }

  test("qualityScore applies the five gates with fraction score") {
    val good = "The engine reads a table of rows and values " +
      "from the fast disk in order to scan it."  // all five pass
    val short = "tiny text"                       // fails chars+words
    val out = TextOps.qualityScore(
      docs(1L -> good, 2L -> short), "doc_id", "text")
      .select(col("doc_id"), col("quality_score"),
        col("chk_chars"), col("chk_words"))
      .as[(Long, Double, Boolean, Boolean)].collect()
      .map { case (k, b, c, d) => k -> ((b, c, d)) }.toMap
    assert(out(1L) == ((1.0, true, true)))
    assert(out(2L)._2 == false && out(2L)._3 == false)
    assert(out(2L)._1 <= 0.6)
  }

  test("langId picks the dominant marker language deterministically") {
    val out = TextOps.langId(docs(
      1L -> "the cat and the dog sat in the garden",
      2L -> "der hund und die katze ist nicht hier",
      3L -> "le chat est dans les jardins pour une heure",
      4L -> "el perro y los gatos es una cosa por ahora",
      5L -> "zzz qqq xxx"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr",
      4L -> "es", 5L -> "und"))
  }

  test("langId on fixture documents: english-ish vocabulary → en/und only") {
    // the fixture's `lang` column is random metadata; its TEXT is all
    // drawn from an english-ish vocabulary, so the detector should
    // only ever answer en (marker hit) or und (no markers present).
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val counts = TextOps.langId(d, "doc_id", "text")
      .groupBy(col("lang_pred")).count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("en", "und")), counts.toString)
    assert(counts.getOrElse("en", 0L) > counts.getOrElse("und", 0L))
  }

  test("shingleFingerprints: shared content shares fingerprints") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      3L -> "one two three four five six seven eight nine ten")
    val fp = TextOps.shingleFingerprints(d, "doc_id", "text", n = 3, p = 1)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).intersect(fp(3L)).isEmpty)
    // p=2 keeps a strict deterministic subset
    val sampled = TextOps
      .shingleFingerprints(d, "doc_id", "text", n = 3, p = 2)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(sampled.getOrElse(1L, Set.empty).subsetOf(fp(1L)))
    assert(sampled.getOrElse(1L, Set.empty).size < fp(1L).size)
  }

  test("chunkWindows: stride grid, tail clamp, full coverage, no shuffle") {
    val ws = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = TextOps.chunkWindows(
      docs(1L -> ws, 2L -> "a b c"), "doc_id", "text",
      windowWords = 4, strideWords = 2)
    // pure projection: nothing in the plan exchanges
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunkWindows shuffles:\n$p")
    val rows = out.as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 10 words, W=4, S=2 → last start = 6, chunks at 0,2,4,6
    assert(rows(1L).map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(rows(1L).forall(_._4 == 4L))
    // short doc: exactly one clamped chunk
    assert(rows(2L).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, "a b c", 3L)))
    // coverage law: the union of chunk words is the document
    val covered = rows(1L).flatMap(_._3.split(" ")).toSet
    assert(covered == ws.split(" ").toSet)
  }

  test("chunkWindows: W=S degenerates to disjoint segments") {
    val ws = (1 to 7).map(i => s"w$i").mkString(" ")
    val out = TextOps.chunkWindows(docs(1L -> ws), "doc_id", "text",
      windowWords = 3, strideWords = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq("w1 w2 w3", "w4 w5 w6", "w7"))
  }

  test("ngramTopK counts occurrences with deterministic tiebreak") {
    val d = docs(1L -> "a b c a b c", 2L -> "a b c")
    // doc1 grams: [a b c][b c a][c a b][a b c]; doc2: [a b c]
    // counts: "a b c" → 3; "b c a", "c a b" → 1 (tie broken asc)
    val out = TextOps.ngramTopK(d, "doc_id", "text", n = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b c", 3L), ("b c a", 1L)))
    // TakeOrdered, not a global sort exchange
    val p = TextOps.ngramTopK(d, "doc_id", "text", n = 3, k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), s"no TakeOrdered in plan:\n$p")
  }

  test("rareTokenStats: df threshold marks singletons rare") {
    // "shared" appears in all 3 docs; every other word is unique
    val d = docs(
      1L -> "shared only1a only1b",
      2L -> "shared only2a",
      3L -> "shared only3a only3b only3c")
    val out = TextOps.rareTokenStats(d, "doc_id", "text", minDf = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 3L, 2L, 2.0 / 3)))
    assert(out(2L) == ((2L, 2L, 2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 4L, 4L, 3L, 0.75)))
    // plan law: the common vocabulary joins as a broadcast, never an
    // exchange of the token stream on word
    val p = TextOps.rareTokenStats(d, "doc_id", "text", minDf = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("rareTokenStats: minDf=1 means nothing is rare; vocabDf reuse") {
    val d = docs(1L -> "x y z", 2L -> "x q")
    val base = TextOps.rareTokenStats(d, "doc_id", "text", minDf = 1)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(base.forall(r => r._4 == 0L && r._5 == 0.0))
    // a precomputed vocabulary (one-pass mode) is bit-identical
    val vocab = d.select(col("doc_id"),
        explode(TextOps.wordTokens(col("text"))).as("word"))
      .distinct().groupBy("word").agg(count(lit(1)).as("dfreq"))
    val a = TextOps.rareTokenStats(d, "doc_id", "text", minDf = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val b = TextOps.rareTokenStats(d, "doc_id", "text", minDf = 2,
      vocabDf = Some(vocab))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("unigramNll: typical docs score lower than rare-token docs; laws") {
    // doc 1 = corpus-typical tokens, doc 2 = hapaxes, doc 3 = empty
    val d = docs(
      1L -> "the cat sat on the mat the cat sat again",
      2L -> "zyx qwv plk mnb",
      3L -> "   ",
      4L -> "the cat sat on the mat")
    val out = TextOps.unigramNll(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(3L), "zero-token doc must be absent")
    assert(out(1L)._2 < out(2L)._2,
      s"typical ${out(1L)._2} !< rare ${out(2L)._2}")
    assert(out.values.forall(v => v._2 > 0), "NLL must be positive")
    // determinism across partitioning (fixed-point accumulation)
    val re = TextOps.unigramNll(d.repartition(7), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(re == out)
    // external-vocabulary mode: unseen tokens take the OOV mass, and
    // a doc of OOV-only tokens scores the worst possible NLL
    val vocab = Seq(("the", 100L), ("cat", 50L), ("sat", 50L),
      ("on", 30L), ("mat", 30L), ("again", 5L))
      .toDF("token", "n_token")
    val ext = TextOps.unigramNll(d, "doc_id", "text",
      vocabCounts = Some(vocab))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(ext(2L) > ext(1L) && ext(2L) > ext(4L))
    // doc 2 is all-OOV: its mean equals the single OOV token NLL
    val oovOnly = ext(2L)
    val single = TextOps.unigramNll(docs(9L -> "zzzz"), "doc_id",
      "text", vocabCounts = Some(vocab))
      .as[(Long, Long, Double)].collect().head._3
    assert(math.abs(oovOnly - single) < 1e-9)
  }

  test("unigramNll: an empty corpus/vocab yields an empty frame, not " +
    "an NPE") {
    val empty = docs()
    val out = TextOps.unigramNll(empty, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "mean_nll"))
    assert(out.count() == 0)
    // whitespace-only corpus: tokens exist as rows but none survive
    // the length filter → same short-circuit
    val blank = docs(1L -> "   ")
    assert(TextOps.unigramNll(blank, "doc_id", "text").count() == 0)
  }

  test("registrableDomain: suffix decision, subdomains, degenerate hosts") {
    val sfx = Seq("co.uk", "com.au", "co.jp")
    val cases = Seq(
      ("https://www.example.com/page?q=1", "example.com"),
      ("https://example.com/", "example.com"),
      ("https://a.b.site.co.uk/x", "site.co.uk"),
      ("https://site.co.uk", "site.co.uk"),
      ("https://co.uk", "co.uk"),            // bare suffix: 2 labels
      ("https://cdn.media.news.com.au/img", "news.com.au"),
      ("https://localhost/admin", "localhost"),
      ("ftp://deep.sub.host.org:8080/f", "host.org"),
      ("not a url", ""))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"),
        TextOps.registrableDomain(col("url"), sfx).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(out(u) == want, s"$u -> ${out(u)} (want $want)")
    }
  }

  test("canonicalizeUrl: rules and idempotence") {
    val cases = Seq(
      // lowercase scheme+host, default port off, tracking params off,
      // fragment off, surviving params keep order
      ("HTTP://Example.COM:80/a?utm_source=x&q=1&fbclid=z#frag",
        "http://example.com/a?q=1"),
      ("https://Example.com:443/b", "https://example.com/b"),
      // NON-default port survives
      ("https://example.com:8443/b", "https://example.com:8443/b"),
      // :80 is only default for http, not https
      ("https://example.com:80/b", "https://example.com:80/b"),
      // empty path becomes '/', all-tracking query drops the '?'
      ("https://EXAMPLE.com?utm_a=1&utm_b=2", "https://example.com/"),
      ("https://example.com#only-frag", "https://example.com/"),
      // ref= is tracking; q= containing 'ref' inside value is not
      ("https://e.com/p?ref=abc&query=ref", "https://e.com/p?query=ref"),
      // non-URL strings pass through
      ("not a url", "not a url"))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), TextOps.canonicalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(out(u) == want, s"$u -> ${out(u)} (want $want)")
    }
    // idempotence: canonical output is a fixed point
    val once = cases.map(_._2).toDF("url")
      .select(col("url"), TextOps.canonicalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect()
    once.foreach { case (u, c) => assert(c == u, s"not fixed: $u -> $c") }
  }

  test("perplexityBandKeep: band bounds, full-range no-op, stability") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val all = TextOps.unigramNll(d, "doc_id", "text")
    val n = all.count()
    // full band keeps every scored document
    assert(TextOps.perplexityBandKeep(d, "doc_id", "text", 0.0, 1.0)
      .count() == n)
    val kept = TextOps.perplexityBandKeep(d, "doc_id", "text", 0.2, 0.8)
    val kc = kept.count()
    // bin snapping keeps AT LEAST the middle 60% and strictly drops
    // both tails on this fixture
    assert(kc >= (0.6 * n).toLong && kc < n, s"kept $kc of $n")
    // every kept nll lies within [min kept, max kept] band and the
    // dropped docs are exactly the outside-band ones
    val (lo, hi) = kept.agg(min("nll_bin"), max("nll_bin"))
      .as[(Long, Long)].head()
    val binned = all.withColumn("b",
      least(floor(col("mean_nll") * 2048).cast("long"), lit(65535L)))
    val outside = binned.filter(col("b") >= lo && col("b") <= hi)
    assert(outside.count() == kc, "kept set == in-band set")
    // partition-independence: same kept ids under a repartition
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = TextOps.perplexityBandKeep(d.repartition(7), "doc_id",
      "text", 0.2, 0.8).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("topGramRepetition: exact argmax, lexicographic ties, no shuffle") {
    // "a b a b a b c": 2-grams [a b]x3 [b a]x2 [b c]x1 → "a b", 9/13
    // 3-grams: [a b a]x2 [b a b]x2 [a b c]x1 → tie → "a b a", 10/13
    // 4-grams: [a b a b]x2 others x1 → "a b a b", 14/13... no: 2*7/13
    val df = TextOps.topGramRepetition(docs(
      1L -> "a b a b a b c",
      2L -> "x",           // too short for any n → nulls, 0.0
      3L -> "  "),         // empty after trim → nulls, 0.0
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "topGramRepetition must stay map-side")
    val out = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "a b" &&
      out(1L).getDouble(2) == 9.0 / 13.0)
    assert(out(1L).getString(3) == "a b a" &&
      out(1L).getDouble(4) == 10.0 / 13.0)
    assert(out(1L).getString(5) == "a b a b" &&
      out(1L).getDouble(6) == 14.0 / 13.0)
    Seq(2L, 3L).foreach { id =>
      assert(out(id).isNullAt(3) && out(id).getDouble(4) == 0.0)
    }
  }

  test("c4LineFilter: per-line rules, doc threshold, order kept") {
    val good = "this sentence has enough words to pass."
    val doc1 = Seq(good, "short one.", // < 5 words
      "no terminal punctuation at all here",
      "lorem ipsum should be dropped even when long enough.",
      "code marker { braces are rejected outright.",
      "ends with a question mark so it survives?",
      good).mkString("\n")
    val df = TextOps.c4LineFilter(
      docs(1L -> doc1, 2L -> (good + "\n" + good)), // only 2 kept → out
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    assert(rows.head.getString(1) == Seq(good,
      "ends with a question mark so it survives?", good).mkString("\n"),
      "kept lines keep their original order")
    assert(rows.head.getLong(2) == 3L && rows.head.getLong(3) == 4L)
  }

  test("qualityEnsemble: one map-side projection; votes match the " +
      "individual signals") {
    val d = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val ens = TextOps.qualityEnsemble(d, "doc_id", "text")
    assert(!ens.queryExecution.executedPlan.toString.contains("Exchange"),
      "the ensemble must not join or shuffle")
    val got = ens.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    // reference votes from the three standalone operators
    val q = TextOps.qualityScore(d, "doc_id", "text")
      .select("doc_id", "quality_score").as[(Long, Double)]
      .collect().toMap
    val l = TextOps.linearQualityScore(d, "doc_id", "text")
      .select("doc_id", "logit_micro").as[(Long, Long)]
      .collect().toMap
    val r2 = TextOps.topGramRepetition(d, "doc_id", "text", Seq(2))
      .select("doc_id", "top2_frac").as[(Long, Double)]
      .collect().toMap
    got.foreach { case (id, (qOk, lOk, rOk, votes, keep)) =>
      assert(qOk == (q(id) >= 0.6) && lOk == (l(id) > 0L) &&
        rOk == (r2(id) <= 0.2), s"doc $id signal mismatch")
      assert(votes ==
        Seq(qOk, lOk, rOk).count(identity).toLong &&
        keep == (votes >= 2L), s"doc $id vote arithmetic")
    }
    assert(got.nonEmpty)
  }

  test("vocabDrift: zero on identical snapshots, planted shift tops " +
      "the report, non-negative contributions") {
    val a = docs(1L -> "alpha beta gamma delta",
      2L -> "alpha beta epsilon zeta", 3L -> "alpha beta beta eta")
    // identical corpora → p == q for every token → contribution 0
    val same = TextOps.vocabDrift(a, a, "text", k = 100)
    assert(same.count() > 0)
    assert(same.filter(col("skl_fx") =!= 0L).count() == 0,
      "identical snapshots must show zero drift")
    // plant a shift: 'omega' floods the new snapshot
    val b = a.union(docs(4L -> ("omega " * 20).trim,
      5L -> ("omega " * 20).trim))
    val drift = TextOps.vocabDrift(a, b, "text", k = 100).collect()
    assert(drift.head.getString(0) == "omega",
      s"planted token must top the report, got ${drift.head}")
    assert(drift.forall(_.getLong(3) >= 0L),
      "symmetric KL contributions are non-negative")
    // empty old snapshot short-circuits to an empty frame
    assert(TextOps.vocabDrift(a.limit(0), b, "text").count() == 0)
  }

  test("TopGramExpr kernel ≡ HOF topGramCol: fixture corpus + " +
      "randomized ASCII sweep, all n") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(1, 2, 3, 4).foreach { n =>
      val both = d.select(col("doc_id"),
        graft.functions.functions.top_gram(col("text"), n).as("k"),
        TextOps.topGramCol(col("text"), n).as("h"))
      assert(both.filter(
        !(col("k.gram") <=> col("h.gram")) ||
        col("k.cnt") =!= col("h.cnt") ||
        !(col("k.frac") <=> col("h.frac"))).count() == 0,
        s"kernel diverged from HOF at n=$n")
    }
    // randomized: whitespace runs, repeats, punctuation, empties
    val word = Gen.oneOf("a", "bb", "ab", "a.b", "7", "!", "", " ")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val prop = Prop.forAll(text, Gen.choose(1, 4)) {
      (t: String, n: Int) =>
        val r = spark.sql("select 1").sparkSession.range(1).toDF()
          .select(
            graft.functions.functions.top_gram(lit(t), n).as("k"),
            TextOps.topGramCol(lit(t), n).as("h"))
          .head()
        r.getStruct(0) == r.getStruct(1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("canaryScan: multi-hit docs fan out, clean docs emit nothing") {
    val df = TextOps.canaryScan(docs(
      1L -> "clean document with no markers",
      2L -> "has GUID-A embedded",
      3L -> "both GUID-A and GUID-B present",
      4L -> "GUID-A GUID-A twice reports once"),
      "doc_id", "text", Seq("GUID-A", "GUID-B"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = df.as[(Long, String)].collect().toSet
    assert(got == Set(2L -> "GUID-A", 3L -> "GUID-A", 3L -> "GUID-B",
      4L -> "GUID-A"))
  }

  test("linearQualityScore: exact integer logit, keep threshold") {
    val df = TextOps.linearQualityScore(docs(
      1L -> "the cat and the dog click here", // 40k+30k+40k-120k-50k
      2L -> "the the the",                    // 120k-50k = 70k > 0
      3L -> ""),                              // bias only
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    val out = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((4L, -60000L, false)))
    assert(out(2L) == ((3L, 70000L, true)))
    assert(out(3L) == ((0L, -50000L, false)))
  }

  test("featureHash: counts preserved under folding, repeated tokens " +
      "share a cell, nnz bounded, partition-independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, ""),
      (3L, "Alpha  ALPHA alpha")) // normText folds case/whitespace
      .toDF("doc_id", "text")
    val got = TextOps.featureHash(docs, "doc_id", "text", dim = 64)
      .as[(Long, Long, Long)].collect()
    val byDoc = got.groupBy(_._1)
    // total counts preserved: folding moves tokens, never drops them
    assert(byDoc(1L).map(_._3).sum == 4L)
    assert(byDoc(3L).map(_._3).sum == 3L)
    assert(!byDoc.contains(2L)) // empty text -> no rows
    // identical tokens land in one cell: doc 3 is one cell of count 3
    assert(byDoc(3L).length == 1 && byDoc(3L).head._3 == 3L)
    // nnz <= distinct tokens; cells within [0, dim)
    assert(byDoc(1L).length <= 3)
    assert(got.forall(r => r._2 >= 0 && r._2 < 64))
    // partition independence
    val again = TextOps.featureHash(docs.repartition(7), "doc_id",
      "text", dim = 64).as[(Long, Long, Long)].collect()
    assert(again.toSet == got.toSet)
  }

  private val langSamples = Seq(
    1L -> ("en", "the quick brown fox jumps over the lazy dog and " +
      "then things which might have worked are the thought of night"),
    2L -> ("de", "ich bin mit dem zug nach münchen gefahren und der " +
      "schnelle zug war pünktlich während die schönen mädchen zuschauten"),
    3L -> ("fr", "le chemin était très beau et nous avons vu quelques " +
      "oiseaux près de l'eau qui coulait doucement vers les vieux moulins"),
    4L -> ("es", "el señor compró unos libros muy buenos y los llevó " +
      "a la escuela para que los niños pequeños pudieran leerlos"))

  test("langProfile: classifies sample sentences with positive margin") {
    val df = langSamples.map { case (id, (_, t)) => (id, t) }
      .toDF("doc_id", "text")
    val got = TextOps.langProfile(df, "doc_id", "text")
      .select("doc_id", "script", "lang_pred", "margin_micro")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    langSamples.foreach { case (id, (lang, _)) =>
      val (_, script, pred, margin) = got(id)
      assert(script == "latin", s"doc $id script")
      assert(pred == lang, s"doc $id predicted $pred, wanted $lang")
      assert(margin >= 100000L, s"doc $id margin $margin")
    }
  }

  test("langProfile: junk and non-latin scripts demote to und") {
    val df = Seq(
      (1L, "12345 67890 ???"),                 // no profile evidence
      (2L, "привет как дела сегодня вечером"), // cyrillic script
      (3L, "それはとても良い考えだと思います"),      // cjk script
      (4L, "ochen korotko"))                   // latin but thin evidence
      .toDF("doc_id", "text")
    val got = TextOps.langProfile(df, "doc_id", "text")
      .select("doc_id", "script", "lang_pred")
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 == "und")
    assert(got(2L)._2 == "cyrillic" && got(2L)._3 == "und")
    assert(got(3L)._2 == "cjk" && got(3L)._3 == "und")
  }

  test("langProfile: confidence margin is monotone in repetition") {
    // scores are additive over grams, so repeating a document's text
    // can only strengthen the winner's margin — the law that makes
    // the margin a usable confidence: more same-language evidence
    // never flips a confident prediction toward und
    val reps = for {
      (id, (_, t)) <- langSamples
      k <- Seq(1, 2, 4)
    } yield (id * 10 + k, id, t * k)
    val df = reps.map { case (rid, _, t) => (rid, t) }.toDF("doc_id", "text")
    val got = TextOps.langProfile(df, "doc_id", "text")
      .select("doc_id", "margin_micro")
      .as[(Long, Long)].collect().toMap
    langSamples.foreach { case (id, (_, _)) =>
      assert(got(id * 10 + 2) >= got(id * 10 + 1), s"doc $id k=2")
      assert(got(id * 10 + 4) >= got(id * 10 + 2), s"doc $id k=4")
    }
  }

  test("trainLinearQuality: fit∘apply — fitted weights reproduce the " +
    "trainer's margins through ns73's apply path") {
    val docs = Tables(spark, sf, "documents").limit(120)
    val fitted = TextOps.trainLinearQuality(docs, "doc_id", "text",
      epochs = 4).as[(String, Long)].collect()
    val bias = fitted.find(_._1 == "__bias").get._2
    val pairs = fitted.filter(_._1 != "__bias").toSeq
    // apply path: linearLogitCol with the fitted table
    val applied = docs.select(col("doc_id"),
      TextOps.linearLogitCol(col("text"), pairs, bias).as("logit"))
      .as[(Long, Long)].collect().toMap
    // direct path: explicit count dot product, computed driver-side
    val texts = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val dot = pairs.map { case (wd, w) =>
        w * toks.count(_ == wd) }.sum + bias
      assert(applied(id) == dot, s"doc $id")
    }
  }

  test("trainLinearQuality: partition-independent and duplicate-vocab-rejected") {
    val docs = Tables(spark, sf, "documents").limit(120)
    val a = TextOps.trainLinearQuality(docs, "doc_id", "text", epochs = 3)
      .as[(String, Long)].collect().toSeq
    val b = TextOps.trainLinearQuality(docs.repartition(7), "doc_id",
      "text", epochs = 3).as[(String, Long)].collect().toSeq
    assert(a == b) // integer gradients: partitioning can't move the fit
    intercept[IllegalArgumentException] {
      TextOps.trainLinearQuality(docs, "doc_id", "text",
        vocab = Seq("the", "the"))
    }
  }

  test("trainLinearQuality ≡ independent Python trainer (staleness pin)") {
    val res = getClass.getResource("/graft/linear_weights_sf001.parquet")
    assert(res != null, "checked-in trainer artifact missing")
    val oracle = spark.read.parquet(res.getPath)
    val docsPath = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(docsPath).exists(), s"fixture absent: $docsPath")
    val mine = TextOps.trainLinearQuality(
      spark.read.parquet(docsPath), "doc_id", "text")
    val diff = mine.exceptAll(oracle).count() +
      oracle.exceptAll(mine).count()
    assert(diff == 0,
      "Spark trainer diverged from the checked-in Python trainer — " +
        "if the driver regenerated documents, rerun " +
        "tools/gen_linear.py and recommit the artifact")
  }

  test("mojibake repair: inverts k-times encoding, one layer per pass") {
    val clean = "café naïve zürich – “quoted”… ©2026 señor° façade"
    val once = TextOps.sloppyCp1252(clean)
    val twice = TextOps.sloppyCp1252(once)
    assert(once != clean && twice != once) // fixture really mangles
    val df = Seq((0L, clean), (1L, once), (2L, twice))
      .toDF("doc_id", "text")
    def repaired(passes: Int): Map[Long, String] =
      df.select(col("doc_id"),
        TextOps.repairMojibakeCol(col("text"), passes).as("r"))
        .as[(Long, String)].collect().toMap
    val p1 = repaired(1)
    val p2 = repaired(2)
    // clean text is a fixed point at any depth
    assert(p1(0L) == clean && p2(0L) == clean)
    // single-encode heals in 1 pass; double-encode needs a second
    // (one pass peels AT LEAST one layer — rule order lets some
    // sequences cascade further within a pass, which only ever moves
    // text closer to clean, never to a wrong form)
    assert(p1(1L) == clean)
    assert(p1(2L) != twice && p2(2L) == clean)
    // n_removed audit: positive on mangled docs, zero on clean
    val n = TextOps.repairMojibake(df, "doc_id", "text")
      .select(col("doc_id"), col("n_removed"))
      .as[(Long, Long)].collect().toMap
    assert(n(0L) == 0L && n(1L) > 0L && n(2L) > n(1L))
  }

  test("mojibake repair: idempotence — repair∘repair ≡ repair") {
    val texts = Seq("plain ascii only",
      TextOps.sloppyCp1252("déjà vu – l'œuvre…"),
      TextOps.sloppyCp1252(TextOps.sloppyCp1252("Müller—ça va”")),
      "already clean é ü ñ “fine”")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val oncely = df.select(col("doc_id"),
      TextOps.repairMojibakeCol(col("text")).as("r"))
    val twicely = oncely.select(col("doc_id"),
      TextOps.repairMojibakeCol(col("r")).as("r"))
    assert(oncely.as[(Long, String)].collect().toMap ==
      twicely.as[(Long, String)].collect().toMap)
  }

  test("crawlFrontier: variants collapse, blocklist drops, quota caps " +
      "per domain in id order") {
    val urls = Seq(
      (1L, "https://www.shared.example/x?utm_source=f&q=1"),
      (2L, "HTTPS://WWW.SHARED.example/x?q=1#frag"),  // variant of 1
      (3L, "https://www.shared.example/y"),
      (4L, "https://www.shared.example/z"),
      (5L, "https://www.blocked.example/p"),          // blocklisted
      (6L, "https://www.other.example/only")).toDF("doc_id", "url")
    val out = TextOps.crawlFrontier(urls, "doc_id", "url",
      blockDomains = Seq("blocked.example"), perDomainQuota = 2,
      multiLabelTlds = Nil)
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    // url 2 canonicalizes onto url 1 (scheme/host case, utm, frag):
    // survivor id 1 with 2 variants; quota 2 keeps ids 1 and 3 for
    // shared.example, drops 4; blocked domain gone; other keeps its 1
    assert(out.keySet == Set(1L, 3L, 6L))
    assert(out(1L) == (("shared.example", 2L, 1L)))
    assert(out(3L) == (("shared.example", 1L, 2L)))
    assert(out(6L) == (("other.example", 1L, 1L)))
  }

  test("fimTransform: PSM reassembly inverts to the original text, " +
      "rate is content-addressed, plan is shuffle-free") {
    val df = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(300)
    val out = TextOps.fimTransform(df, "doc_id", "text")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val joined = out.join(df, "doc_id")
      .select(col("doc_id"), col("fim_applied"), col("prefix_len"),
        col("middle_len"), col("text_out"), col("text"))
      .as[(Long, Boolean, Long, Long, String, String)].collect()
    assert(joined.exists(_._2) && joined.exists(!_._2),
      "the 60% rate must split the fixture both ways")
    joined.foreach { case (id, applied, plen, mlen, outT, t) =>
      if (!applied) {
        assert(outT == t && plen == 0L && mlen == 0L)
      } else {
        // parse the PSM envelope and reassemble the original
        val body = outT.stripPrefix("<|fim_pre|>")
        val Array(pre, rest) = body.split(
          java.util.regex.Pattern.quote("<|fim_suf|>"), 2)
        val Array(sufP, midP) = rest.split(
          java.util.regex.Pattern.quote("<|fim_mid|>"), 2)
        assert(pre.length == plen && midP.length == mlen, s"doc $id")
        assert(pre + midP + sufP == t, s"doc $id reassembly")
      }
    }
    // determinism under repartitioning
    val re = TextOps.fimTransform(df.repartition(7), "doc_id", "text")
      .as[(Long, Boolean, Long, Long, String)].collect().toSet
    assert(re == out.as[(Long, Boolean, Long, Long, String)]
      .collect().toSet)
  }

  test("fimTransform: empty docs pass through — never negative " +
      "lengths or sentinel-only output (round-11 ADVICE)") {
    // ids chosen so some land in the applied buckets at rate 1000
    val df = (0L to 19L).map(i => (i, "")).toDF("doc_id", "text")
    val out = TextOps.fimTransform(df, "doc_id", "text",
      rateBuckets = 1000)
      .as[(Long, Boolean, Long, Long, String)].collect()
    out.foreach { case (id, applied, plen, mlen, t) =>
      assert(!applied && plen == 0L && mlen == 0L && t == "",
        s"doc $id must pass through")
    }
  }

  test("chatTurnOffsets: contiguous spans, alternating roles, loss " +
      "on assistant turns, hand-checked template") {
    import graft.ops.Sessionize
    val ev = Seq(
      (7L, 1000L, 1L, "ask"), (7L, 2000L, 2L, "answer"),
      (7L, 3000L, 3L, "ask2"), (9L, 500L, 4L, "hi"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sessionize.chatTurnOffsets(ev, "user_id", "ts",
      "event_id", "event_type")
      .as[(Long, Long, String, String, Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._7)) == Seq(
      (7L, 1L, "user", false), (7L, 2L, "assistant", true),
      (7L, 3L, "user", false), (9L, 1L, "user", false)))
    assert(out.head._4 == "<|user|>ask:1<|end|>")
    assert(out(1)._4 == "<|assistant|>answer:2<|end|>")
    // spans tile the rendered conversation exactly
    out.groupBy(_._1).values.foreach { turns =>
      val s = turns.sortBy(_._2)
      assert(s.head._5 == 0L)
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 == b._5, "span gap")
        case _ =>
      }
      s.foreach(t => assert(t._6 - t._5 == t._4.length.toLong))
    }
  }

  test("frontierDelta: seen URLs drop (variants included), unseen " +
      "survive with batch multiplicity; empty store is identity") {
    val batch = Seq(
      (1L, "https://a.example/seen?utm_source=x"), // variant of stored
      (2L, "https://a.example/new"),
      (3L, "https://a.example/new#frag"),          // variant of 2
      (4L, "https://b.example/fresh")).toDF("doc_id", "url")
    val store = Seq(Tuple1("https://a.example/seen"))
      .toDF("url_canon")
    val out = TextOps.frontierDelta(batch, store, "doc_id", "url")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      2L -> (("https://a.example/new", 2L)),
      4L -> (("https://b.example/fresh", 1L))))
    // empty store: the delta is just the deduped batch
    val empty = Seq.empty[Tuple1[String]].toDF("url_canon")
    assert(TextOps.frontierDelta(batch, empty, "doc_id", "url")
      .count() == 3L)
  }

  test("normalization-robust dedup: NFD and mojibake twins collapse " +
      "after repair∘nfc, raw fingerprints see nothing") {
    import graft.ns.Dedup
    val tailPre = TextOps.mojibakeFixtureTail
    val tailNfd = java.text.Normalizer.normalize(tailPre,
      java.text.Normalizer.Form.NFD)
    val tailMoji = TextOps.sloppyCp1252(tailPre)
    assert(tailNfd != tailPre && tailMoji != tailPre)
    val corpus = Seq(
      (1L, "body one" + tailPre),
      (1000001L, "body one" + tailNfd),
      (2000001L, "body one" + tailMoji),
      (2L, "body two" + tailPre)).toDF("doc_id", "text")
    // raw fingerprints: every byte-variant is its own group
    val raw = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(raw.count() == 4L)
    // normalized fingerprints: variants collapse onto the original
    val normed = corpus.select(col("doc_id"),
      graft.functions.functions.nfc_normalize(
        TextOps.repairMojibakeCol(col("text"))).as("text"))
    val out = Dedup.exactDedup(normed, "doc_id", "text")
      .select(col("doc_id"), col("dup_count"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("pavPools: violation merges exactly; monotone input is identity") {
    // buckets (bucket, n, n_pos): means 0.5, 0.0 → violation pools
    // to 2/8 = 0.25 across both; third bucket 0.75 stays its own
    val pooled = TextOps.pavPools(Seq((0L, 4L, 2L), (1L, 4L, 0L),
      (2L, 4L, 3L)))
    assert(pooled == Seq((0L, 2L, 8L), (1L, 2L, 8L), (2L, 3L, 4L)))
    // already-isotone means: PAV must not touch them
    val mono = Seq((0L, 5L, 1L), (1L, 5L, 3L), (2L, 5L, 5L))
    assert(TextOps.pavPools(mono) ==
      mono.map { case (b, n, p) => (b, p, n) })
    // cascade: a late low pool can swallow several predecessors
    val casc = TextOps.pavPools(Seq((0L, 2L, 2L), (1L, 2L, 2L),
      (2L, 2L, 0L)))
    assert(casc == Seq((0L, 4L, 6L), (1L, 4L, 6L), (2L, 4L, 6L)))
  }

  test("isotonicCalibrate: hand-checked buckets, monotone law, totals") {
    // scores 0..7 with width 8 over 4 buckets → bucket = score/2;
    // labels force one violation between buckets 0 and 1
    val scored = Seq(
      (0L, 1L), (1L, 1L),   // bucket 0: 2/2
      (2L, 0L), (3L, 0L),   // bucket 1: 0/2  ← violates
      (4L, 1L), (5L, 0L),   // bucket 2: 1/2
      (6L, 1L), (7L, 1L))   // bucket 3: 2/2
      .toDF("score", "label")
    val out = TextOps.isotonicCalibrate(scored, "score", "label", 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // buckets 0+1 pool to 2/4; bucket 2 stays 1/2; bucket 3 2/2
    assert(out == Seq((0L, 2L, 2L, 500000L), (1L, 2L, 0L, 500000L),
      (2L, 2L, 1L, 500000L), (3L, 2L, 2L, 1000000L)))
    assert(out.map(_._2).sum == 8L)
  }

  test("isotonic calibration matches the independent Python twin") {
    val res = getClass.getResource("/graft/isotonic_cal_sf001.parquet")
    assert(res != null, "checked-in twin artifact missing")
    val oracle = spark.read.parquet(res.getPath)
    val docsPath = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(docsPath).exists(), s"fixture absent: $docsPath")
    val mine = TextOps.isotonicQualityCalibration(
      spark.read.parquet(docsPath), "doc_id", "text")
    val diff = mine.exceptAll(oracle).count() +
      oracle.exceptAll(mine).count()
    assert(diff == 0,
      "Spark PAV diverged from the checked-in Python twin — if the " +
        "driver regenerated documents, rerun tools/gen_isotonic.py " +
        "and recommit the artifact")
    // the calibrated read-out must be non-decreasing in bucket
    val cal = mine.orderBy(col("bucket"))
      .select(col("cal_micro")).as[Long].collect().toSeq
    assert(cal == cal.sorted, s"calibration must be monotone: $cal")
  }

  test("codeQualityStats: hand-checked classes, thresholds, no shuffle") {
    val df = TextOps.codeQualityStats(docs(
      // 3 lines of 2/6/2 chars; 1 comment line; all alnum+newlines
      1L -> "ab\n# c def\nxy",
      // one 1001-char line → max-line kill
      2L -> ("short\n" + "z" * 1001),
      // punctuation blob → alnum kill
      3L -> ("ok line\n" + "=" * 100),
      // marker → autogen kill (substring, case-insensitive)
      4L -> "fine code\n// Auto-Generated file",
      5L -> "clean single line of code"),
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "codeQualityStats must stay map-side")
    val out = df.as[(Long, Long, Long, Double, Double, Double,
      Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8)))
      .toMap
    val (n1, max1, avg1, cf1, af1, ag1, k1) = out(1L)
    assert(n1 == 3L && max1 == 7L)
    assert(avg1 == (2 + 7 + 2) / 3.0 && cf1 == 1.0 / 3)
    assert(af1 == 8.0 / 13 && !ag1 && k1)
    assert(out(2L)._7 == false && out(2L)._2 == 1001L)
    assert(out(3L)._7 == false && out(3L)._5 < 0.25)
    assert(out(4L)._6 && !out(4L)._7)
    assert(out(5L)._7 && out(5L)._1 == 1L)
  }

  test("nfc normalize: composes NFD/singletons/jamo, ASCII fixed point") {
    val nfd = " cafe\u0301 nai\u0308ve pin\u0303ata u\u0308ber"
    val pre = " caf\u00E9 na\u00EFve pi\u00F1ata \u00FCber"
    assert(nfd != pre) // decomposed fixture really is decomposed
    val df = Seq(
      (0L, "plain" + nfd),
      (1L, "plain" + pre),
      (2L, "\u212B\u2126 e\u0301\u0323x"),
      (3L, "\u1112\u1161\u11AB\u1100\u1173\u11AF"),
      (4L, "pure ascii stays")).toDF("doc_id", "text")
    val out = TextOps.nfcNormalize(df, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // NFD composes to the precomposed form; 4 combining marks gone
    assert(out(0L) == (("plain" + pre, 4L)))
    // precomposed text is a fixed point
    assert(out(1L) == (("plain" + pre, 0L)))
    // canonical singletons (Å, Ω) + mark reorder: acute-then-dot
    // reorders to dot-then-acute, dot composes, acute survives
    assert(out(2L) == (("\u00C5\u03A9 \u1EB9\u0301x", 1L)))
    // Hangul jamo LVT-compose to syllables
    assert(out(3L) == (("\uD55C\uAE00", 4L)))
    assert(out(4L) == (("pure ascii stays", 0L)))
  }

  test("nfc normalize: idempotence, fixture-tail classes, null safety") {
    // every fixture tail normalizes to the SAME precomposed-or-
    // syllable form twice over (nfc ∘ nfc ≡ nfc), and the checked-in
    // class-0/class-1 pair is exactly the (decomposed, composed)
    // twin the gate relies on
    val ts = TextOps.nfcFixtureTails
    assert(java.text.Normalizer.normalize(ts.head,
      java.text.Normalizer.Form.NFC) == ts(1))
    val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = TextOps.nfcNormalize(df, "doc_id", "text")
      .select(col("doc_id"), col("nfc_text").as("text"))
    val twice = TextOps.nfcNormalize(once, "doc_id", "text")
    val o = once.as[(Long, String)].collect().toMap
    val t2 = twice.select(col("doc_id"), col("nfc_text"))
      .as[(Long, String)].collect().toMap
    assert(o == t2)
    assert(twice.select(max(col("n_composed"))).as[Long].head() == 0L)
    // null text stays null through the kernel
    val withNull = Seq((0L, "a"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nulls = TextOps.nfcNormalize(withNull, "doc_id", "text")
      .where(col("nfc_text").isNull).select(col("doc_id"))
      .as[Long].collect().toSeq
    assert(nulls == Seq(1L))
  }

  test("nfkc casefold: every fixture class folds to its checked-in " +
      "prediction; idempotent; stronger than nfc; ascii fast path") {
    val ts = TextOps.nfkcCfFixtureTails
    val df = ts.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("doc_id", "text")
    val out = TextOps.nfkcCasefold(df, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    ts.zipWithIndex.foreach { case ((in, exp), i) =>
      assert(out(i.toLong) == exp, s"class $i: " +
        out(i.toLong).map(c => f"\\u${c.toInt}%04X").mkString)
    }
    // idempotence: folding the folded output is a fixed point
    val once = TextOps.nfkcCasefold(df, "doc_id", "text")
      .select(col("doc_id"), col("folded_text").as("text"))
    val twice = TextOps.nfkcCasefold(once, "doc_id", "text")
      .select(col("doc_id"), col("folded_text"))
      .as[(Long, String)].collect().toMap
    assert(twice == out)
    // subsumes nfc: nfkcCf ∘ nfc ≡ nfkcCf on the NFC fixture classes
    val nfcDf = TextOps.nfcFixtureTails.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val direct = TextOps.nfkcCasefold(nfcDf, "doc_id", "text")
      .select(col("doc_id"), col("folded_text"))
      .as[(Long, String)].collect().toMap
    val viaNfc = TextOps.nfkcCasefold(
      TextOps.nfcNormalize(nfcDf, "doc_id", "text")
        .select(col("doc_id"), col("nfc_text").as("text")),
      "doc_id", "text")
      .select(col("doc_id"), col("folded_text"))
      .as[(Long, String)].collect().toMap
    assert(direct == viaNfc)
    // pinned choice: Default Case Conversion, NOT full case folding
    // (ß stays ß — the gate depends on this being stable)
    val eszett = TextOps.nfkcCasefold(
      Seq((0L, "GRÜßE")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select(col("folded_text")).as[String].head()
    assert(eszett == "grüße")
    // ascii-lowercase fast path returns input verbatim; null safe
    val plain = TextOps.nfkcCasefold(
      Seq((0L, "already folded 123"), (1L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(plain(0L) == "already folded 123" && plain(1L) == null)
  }

  test("langProfile vs langId: both call the English corpus English") {
    val docs = Tables(spark, sf, "documents").limit(200)
    val both = TextOps.langProfile(docs, "doc_id", "text")
      .select(col("doc_id"), col("lang_pred"))
      .join(TextOps.langId(docs, "doc_id", "text")
        .withColumnRenamed("lang_pred", "old_pred"), "doc_id")
    val rows = both.as[(Long, String, String)].collect()
    assert(rows.nonEmpty)
    val agree = rows.count(r => r._2 == "en" && r._3 == "en")
    assert(agree >= rows.length * 9 / 10,
      s"profile/marker agreement only $agree/${rows.length}")
  }

  test("specialTokenScrub: every token stripped, nested injection " +
      "healed by the second pass, idempotent, clean docs untouched") {
    val injected = TextOps.specialTokens.mkString("safe ", " mid ", " end")
    val nested = "x <|endof<|im_start|>text|> y"
    val df = Seq((1L, injected), (2L, nested), (3L, "plain text"))
      .toDF("doc_id", "text")
    val out = TextOps.specialTokenScrub(df, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // no special token survives any output
    out.values.foreach { case (txt, _) =>
      TextOps.specialTokens.foreach(tok =>
        assert(!txt.contains(tok), s"'$tok' survived in '$txt'")) }
    assert(out(2L)._1 == "x  y", s"nested heal: '${out(2L)._1}'")
    assert(out(3L)._1 == "plain text" && out(3L)._2 == 0L)
    assert(out(1L)._2 ==
      TextOps.specialTokens.map(_.length).sum.toLong)
    // idempotence: scrubbing the scrubbed corpus is a no-op
    val again = TextOps.specialTokenScrub(
      Seq((1L, out(1L)._1), (2L, out(2L)._1)).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, String, Long)].collect()
    assert(again.forall(_._3 == 0L))
    // ONE pass is provably not enough on the nested form — the
    // second pass is load-bearing, not belt-and-braces
    val once = TextOps.specialTokenScrub(
      Seq((1L, nested)).toDF("doc_id", "text"), "doc_id", "text",
      passes = 1).as[(Long, String, Long)].head()
    assert(once._2.contains("<|endoftext|>"), once._2)
  }

  test("ngramDiversity: repetition collapses diversity, all-unique " +
      "text scores 1.0, short docs skip large n") {
    val df = Seq(
      ("spam", "buy now buy now buy now buy now"),
      ("spam", "buy now buy now"),
      ("fresh", "one two three four five six seven eight"),
      ("tiny", "ab")).toDF("source", "text")
    val out = TextOps.ngramDiversity(df, "source", "text")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // fresh: every gram unique at every n
    Seq(1L, 2L, 3L).foreach { n =>
      val (tot, dist, div) = out(("fresh", n))
      assert(tot == dist && div == 1.0, s"fresh n=$n: $tot/$dist") }
    // spam: 12 unigrams, 2 distinct
    assert(out(("spam", 1L)) == ((12L, 2L, 2.0 / 12)))
    // spam 3-grams: 6 + 2 occurrences, only the 2 alternating
    // patterns "buy now buy" / "now buy now" are distinct
    val (t3, d3, div3) = out(("spam", 3L))
    assert(t3 == 8L && d3 == 2L && div3 == 2.0 / 8, s"$t3 $d3 $div3")
    // a 1-word source has no 2-grams or 3-grams at all
    assert(out.contains(("tiny", 1L)) && !out.contains(("tiny", 2L)) &&
      !out.contains(("tiny", 3L)))
  }

  test("homoglyphNormalize: idempotent, attack-recovery, restores " +
      "dedup and classifier keys") {
    // the attack: Latin → Cyrillic lookalikes on a real sentence
    val clean = "click here to subscribe for free prizes"
    val attacked = clean
      .replace('c', 'с').replace('e', 'е').replace('o', 'о')
      .replace('p', 'р').replace('x', 'х').replace('y', 'у')
    assert(attacked != clean)
    val df = Seq((1L, clean), (2L, attacked)).toDF("doc_id", "text")
    val scrub = TextOps.homoglyphScrub(df, "doc_id", "text")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // recovery: normalized attack equals the clean text
    assert(scrub(2L)._1 == clean && scrub(2L)._2)
    assert(scrub(1L)._1 == clean && !scrub(1L)._2)
    // idempotence: the target alphabet is disjoint from the source
    val twice = TextOps.homoglyphScrub(
      Seq((1L, scrub(2L)._1)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Boolean)].head()
    assert(twice._2 == scrub(2L)._1 && !twice._3)
    // composition: scrubbing restores ONE dedup fingerprint and the
    // word-keyed classifier logit the attack had broken
    val scrubbed = TextOps.homoglyphScrub(df, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    assert(graft.ns.Dedup.exactDedup(scrubbed, "doc_id", "text")
      .count() == 1, "scrub must merge the attacked twin")
    assert(graft.ns.Dedup.exactDedup(df, "doc_id", "text")
      .count() == 2, "the attack really evades raw dedup")
    val logits = scrubbed
      .select(col("doc_id"), TextOps.linearLogitCol(col("text"))
        .as("l")).as[(Long, Long)].collect().toMap
    assert(logits(1L) == logits(2L) && logits(1L) < 0,
      s"spam logit must survive the scrub: $logits")
  }

  test("docChunks: coverage, overlap, offsets, chunk-count formula") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.docChunks(df, "doc_id", "text",
        window = 10, stride = 7)
      .as[(Long, Long, Long, Long, String)].collect()
    // empty doc drops; short doc gets exactly one whole-doc chunk
    assert(!out.exists(_._1 == 3L))
    val shortChunks = out.filter(_._1 == 2L)
    assert(shortChunks.toSeq == Seq((2L, 0L, 0L, 3L, "a b c")))
    val chunks = out.filter(_._1 == 1L).sortBy(_._2)
    // 1 + ceil((100-10)/7) = 1 + 13 = 14 chunks
    assert(chunks.length == 14, s"got ${chunks.length}")
    chunks.zipWithIndex.foreach { case ((_, cid, start, n, txt), i) =>
      assert(cid == i && start == 7L * i)
      val words = txt.split(" ")
      assert(n == words.length && n <= 10)
      // offset correctness: first word of the chunk is w{start+1}
      assert(words.head == s"w${start + 1}", s"chunk $cid: ${words.head}")
    }
    // the LAST chunk reaches the final word
    assert(chunks.last._5.split(" ").last == "w100")
    // adjacent chunks overlap by window - stride = 3 words
    chunks.sliding(2).foreach { case Array(a, b) =>
      val ov = a._5.split(" ").toSet.intersect(b._5.split(" ").toSet)
      assert(b._3 - a._3 == 7 &&
        (a._3 + a._4 - b._3 == 3 || a._4 < 10),
        s"overlap broken between ${a._2} and ${b._2} ($ov)")
    }
  }

  test("prCurve: cumulative counts, monotone recall, endpoints") {
    // scores 4,3,2,1 with labels pos,pos,neg,pos
    val df = Seq((4L, true), (3L, true), (2L, false), (1L, true))
      .toDF("score", "label")
    val out = TextOps.prCurve(df, "score", "label")
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy(-_._1)
    assert(out.map(_._1).toSeq == Seq(4L, 3L, 2L, 1L))
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L), "n_pred cumsum")
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 2L, 3L), "tp cumsum")
    assert(out.map(_._4).toSeq ==
      Seq(1.0, 1.0, 2.0 / 3, 3.0 / 4), "precision")
    assert(out.map(_._5).toSeq ==
      Seq(1.0 / 3, 2.0 / 3, 2.0 / 3, 1.0), "recall")
    // recall is monotone along descending thresholds; the loosest
    // operating point always has recall exactly 1
    assert(out.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    // all-negative corpus: recall pinned to 0.0, no NaN
    val neg = TextOps.prCurve(
      Seq((5L, false), (6L, false)).toDF("score", "label"),
      "score", "label").as[(Long, Long, Long, Double, Double)]
      .collect()
    assert(neg.forall(r => r._5 == 0.0 && !r._4.isNaN))
  }

  test("domainReweight: hard domains upweighted, token-weighted excess is 1") {
    // "common" repeats one token (cheap under its own LM); "rare"
    // is all-distinct tokens (max NLL per token)
    val docs = (
      (0L until 8L).map(i => (i, "common", "alpha alpha alpha alpha")) ++
      (0L until 8L).map(i => (100L + i, "rare",
        s"zq${i}a zq${i}b zq${i}c zq${i}d"))
    ).toDF("doc_id", "source", "text")
    val out = TextOps.domainReweight(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5))))
      .toMap
    val (nc, _, exC, wC) = out("common")
    val (nr, _, exR, wR) = out("rare")
    assert(nc == 32L && nr == 32L)
    assert(exR > 1.0 && exC < 1.0 && wR > 1000000L && wC < 1000000L)
    // token-weighted mean excess is exactly 1 by construction
    val meanEx = (nc * exC + nr * exR) / (nc + nr).toDouble
    assert(math.abs(meanEx - 1.0) < 1e-9, s"mean excess $meanEx")
  }

  test("token_set_count kernel equals the HOF filter form (r18): " +
      "multiset counts, null elements skipped, null array is NULL, " +
      "empty array is 0") {
    val words = Seq("the", "and", "of")
    val rows = Seq(
      (1L, Seq("the", "cat", "and", "the", "dog")), // 3 hits, dup 'the'
      (2L, Seq("un", "chat")),                      // 0 hits
      (3L, Seq[String]()),                          // empty -> 0
      (4L, Seq("the", null, "of")),                 // null element skipped
      (5L, null)                                    // null array -> NULL
    ).toDF("id", "toks")
    val hof = size(filter(col("toks"),
      t => array_contains(array(words.map(lit): _*), t)))
    val out = rows.select(col("id"),
      graft.functions.functions.token_set_count(col("toks"), words)
        .as("k"),
      hof.as("h"))
      .as[(Long, Option[Int], Option[Int])].collect()
      .map { case (id, k, h) => id -> ((k, h)) }.toMap
    assert(out(1L)._1.contains(3) && out(2L)._1.contains(0) &&
      out(3L)._1.contains(0) && out(4L)._1.contains(2) &&
      out(5L)._1.isEmpty)
    // law: kernel == HOF on every row (size(null-array HOF) is -1 or
    // null depending on conf; compare where the HOF is non-negative)
    out.values.foreach { case (k, h) =>
      h.filter(_ >= 0).foreach(hv => assert(k.contains(hv)))
    }
  }

  test("curationGateCol equals the composed quality+langid gate " +
      "(r18 fused-kernel law): fixture corpus plus whitespace, " +
      "empty, non-ASCII, and null edges") {
    val fixture = Tables(spark, sf, "documents")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val edges = Seq(
      ("e1", "\t the and of " + ("hello world the and of it is " * 8)),
      ("e3", "   "), // collapses to one space: leading-empty token
      ("e5", "the " * 60), // high stopword, short words
      ("e6", ("der und ist nicht ein " * 10) + "x"),
      ("e7", "caf\u00e9 \u00dcber stra\u00dfe the and of " +
        ("plain words the of and in it is " * 6)),
      ("e8", ("a" * 200) + " the and of in it is to a an or " * 5))
      .toDF("id", "text")
    Seq(fixture, edges.select(col("id"), col("text"))).foreach { df =>
      val composed = TextOps.qualityScoreCol(col("text")) === 1.0 &&
        TextOps.langIdCol(col("text")) === "en"
      val rows = df.select(col("id"),
        TextOps.curationGateCol(col("text")).as("fused"),
        composed.as("comp"))
        .as[(String, Option[Boolean], Option[Boolean])].collect()
      rows.foreach { case (id, f, c) =>
        assert(f == c, s"gate mismatch on $id: fused=$f composed=$c")
      }
    }
    // divergence pinned, not hidden: on EMPTY text the composed form
    // raises DIVIDE_BY_ZERO under ANSI (the punct-ratio denominator)
    // while the gate is definitionally false (chk_chars needs >= 50);
    // the kernel answers false, and NULL stays NULL
    val empt = Seq(("e2", ""), ("e4", null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), TextOps.curationGateCol(col("text")).as("g"))
      .as[(String, Option[Boolean])].collect().toMap
    assert(empt("e2").contains(false) && empt("e4").isEmpty)
  }
}
