package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ns.Dedup

class NsDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def assertNoCartesian(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in plan:\n$plan")
  }

  test("provenance edges complement the survivors exactly: " +
      "dropped = corpus minus exactDedup, kept ids are survivors, " +
      "one shuffle") {
    val df = docs(
      1L -> "alpha beta", 2L -> "ALPHA  beta", 3L -> "gamma",
      4L -> "alpha beta ", 5L -> "delta", 6L -> "Gamma")
      .withColumn("source", concat(lit("s"), col("doc_id") % 2))
    val edges = Dedup.exactDedupProvenance(df, "doc_id", "text",
      carry = Seq("source"))
    val got = edges
      .select(col("dropped_id"), col("kept_id"), col("dropped_source"),
        col("kept_source"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, 1L, "s0", "s1"), (4L, 1L, "s0", "s1"), (6L, 3L, "s0", "s1")))
    val survivors = Dedup.exactDedup(df, "doc_id", "text")
      .select(col("doc_id")).as[Long].collect().toSet
    val dropped = edges.select(col("dropped_id")).as[Long].collect().toSet
    assert(dropped == Set(1L, 2L, 3L, 4L, 5L, 6L) -- survivors,
      "edges must cover exactly the non-survivors")
    assert(edges.select(col("kept_id")).as[Long].collect()
      .forall(survivors), "every kept_id must be a survivor")
    val plan = edges.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r
      .findAllMatchIn(plan).size == 1,
      s"provenance must shuffle once, on the fingerprint:\n$plan")
  }

  test("source dup matrix: cells partition the edge set, within-" +
      "source replays land on the diagonal (r14 datasheet law)") {
    // s0 docs 1/2 duplicate each other (diagonal cell), s1 doc 3
    // copies s0's survivor 1 (off-diagonal), 5 copies 3's content
    // but 3 itself dropped into 1's group -> 5 also maps to 1
    val df = docs(
      1L -> "alpha beta", 2L -> "alpha  BETA", 3L -> "Alpha beta",
      4L -> "gamma", 5L -> "alpha beta ")
      .withColumn("source",
        when(col("doc_id") <= 2, "s0").otherwise("s1"))
    val edges = Dedup.exactDedupProvenance(df, "doc_id", "text",
      carry = Seq("source"))
    val matrix = edges
      .groupBy(col("kept_source"), col("dropped_source"))
      .agg(count(lit(1)).as("n_dups"),
        countDistinct(col("kept_id")).as("n_groups"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(matrix == Set(("s0", "s0", 1L, 1L), ("s0", "s1", 2L, 1L)))
    // cells partition the edges: totals agree
    assert(matrix.toSeq.map(_._3).sum == edges.count())
  }

  test("minhash bucket cap: capped candidates stay a subset of the " +
      "complete banding, the cap actually fires on a dense bucket, " +
      "and every dense-bucket member keeps its edge to the bucket " +
      "min (r14 — the conversation-grain density knob)") {
    // one 30-member near-dup group (identical user turn, per-id
    // assistant tail — the templated-transcript shape that makes
    // bucket occupancy grow with the corpus) plus one unrelated chat
    val turns = ((0L until 30L).flatMap { c =>
      Seq((c, 0L, "user",
        "the quick brown fox jumps over the lazy dog again and " +
          "again today for emphasis"),
        (c, 1L, "assistant", s"done$c fin$c"))
    } ++ Seq(
      (500L, 0L, "user",
        "completely unrelated words entirely here nothing shared"),
      (500L, 1L, "assistant", "acknowledged and closed out")))
      .toDF("conversation_id", "turn_idx", "role", "content")
    def pairs(cap: Option[Int]): Set[(Long, Long)] =
      Dedup.conversationNearDup(turns, "conversation_id", "turn_idx",
        "role", "content", bucketCap = cap)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
    val capped = pairs(Some(4))
    val full = pairs(None)
    assert(capped.subsetOf(full), "cap invented a candidate")
    assert(capped.size < full.size, "cap never fired on a 30-bucket")
    // min-id survivorship: the bucket min (conv 0) is always in the
    // low-id core, so every group member keeps its edge to it
    (1L until 30L).foreach { c =>
      assert(capped.contains((0L, c)), s"lost the min edge for $c")
    }
    // the exact-Jaccard verify still prunes: the unrelated chat
    // never pairs under either setting
    assert(!full.exists(p => p._1 == 500L || p._2 == 500L))
  }

  test("conversation near-dup: transcripts render in turn order; " +
      "planted edited twins surface while unrelated chats don't " +
      "(r14 — both idioms through the same machinery)") {
    // 20 conversations, 2 turns each; twins = id+100 with "hi "
    // prepended to the user turn (the re-upload-with-greeting class).
    // Content words are per-conversation (no shared sentence
    // template) so unrelated chats share no 3-gram — only the
    // <|...|> markers, which never form a full gram alone.
    val base = (0L until 20L).flatMap { c =>
      Seq((c, 0L, "user",
        s"alpha$c beta$c gamma$c delta$c epsilon$c zeta$c eta$c " +
          s"theta$c iota$c kappa$c"),
        (c, 1L, "assistant", s"mu$c nu$c xi$c omicron$c pi$c rho$c"))
    }
    val twins = base.map { case (c, t, r, txt) =>
      (c + 100L, t, r, if (r == "user") s"hi $txt" else txt)
    }
    val turns = (base ++ twins).toDF("conversation_id", "turn_idx",
      "role", "content")
    // rendering law: ordered, space-joined, template-marked
    val tx = Dedup.conversationTranscripts(turns, "conversation_id",
      "turn_idx", "role", "content")
      .filter(col("conversation_id") === 0L)
      .select(col("transcript")).as[String].head()
    assert(tx == "<|user|> alpha0 beta0 gamma0 delta0 epsilon0 " +
      "zeta0 eta0 theta0 iota0 kappa0 <|end|> <|assistant|> mu0 " +
      "nu0 xi0 omicron0 pi0 rho0 <|end|>")
    // both idioms: every planted twin pair surfaces (long shared
    // transcript → Jaccard well inside the threshold), nothing else
    // does (per-id content makes unrelated chats distant)
    Seq(
      Dedup.conversationNearDup(turns, "conversation_id", "turn_idx",
        "role", "content"),
      Dedup.conversationNearDupExact(turns, "conversation_id",
        "turn_idx", "role", "content")).foreach { pairs =>
      val got = pairs.select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == (0L until 20L).map(c => (c, c + 100L)).toSet,
        s"wrong pair set: $got")
    }
  }

  test("simhashNearDupNewVsStore equals the whole-corpus self-join " +
      "restricted to cross pairs") {
    // ids 0..9 = store, 100..109 = new; new 100/102 are planted
    // twins (same sig / 2-bit flip) of store 0/1
    val rnd = new scala.util.Random(11L)
    val store = (0L to 9L).map(i => (i, rnd.nextLong()))
    val newer = Seq(
      (100L, store(0)._2), (102L, store(1)._2 ^ 0x11L)) ++
      (0 until 8).map(j => (104L + j, rnd.nextLong()))
    val storeDf = store.toDF("img_id", "simhash")
    val newDf = newer.toDF("img_id", "simhash")
    val cross = Dedup.simhashNearDupNewVsStore(newDf, storeDf,
      "img_id", maxHamming = 7, bands = 8)
      .as[(Long, Long, Int)].collect().toSet
    val self = Dedup.simhashNearDupPairs(
      storeDf.unionByName(newDf), "img_id", maxHamming = 7, bands = 8)
      .as[(Long, Long, Int)].collect()
      // keep (store, new) pairs only, reorient to (new, store)
      .filter { case (a, b, _) => a < 100L && b >= 100L }
      .map { case (a, b, h) => (b, a, h) }.toSet
    assert(cross == self,
      "cross form must equal the self-join's cross slice")
    assert(cross.contains((100L, 0L, 0)) &&
      cross.exists { case (n, st, h) => n == 102L && st == 1L && h == 2 },
      s"planted twins must surface: $cross")
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = docs(
      1L -> "The  Quick\tBrown Fox",
      2L -> "  the quick brown fox ",
      3L -> "the quick brown ox")
      .select(Dedup.fingerprint(col("text")).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("exactDedup keeps the min id per group with multiplicity") {
    val out = Dedup.exactDedup(
      docs(5L -> "a b c", 3L -> "A  b C", 9L -> "x y z"),
      "doc_id", "text")
      .select(col("doc_id"), col("dup_count"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 2L), (9L, 1L)))
  }

  test("shingles emits distinct word n-grams, none for short docs") {
    val out = Dedup.shingles(
      docs(1L -> "a b c d", 2L -> "a b c a b c", 3L -> "too short"),
      "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "a b c"), (1L, "b c d"),
      (2L, "a b c"), (2L, "b c a"), (2L, "c a b")))
  }

  test("ngramJaccardPairs matches hand-computed jaccard, no cartesian") {
    // doc1 grams: {a b c, b c d, c d e}; doc2 grams: {a b c, b c d, c d x}
    // common=2, union=4 → jaccard 0.5. doc3 shares nothing.
    val d = docs(1L -> "a b c d e", 2L -> "a b c d x", 3L -> "p q r s t")
    val out = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.4)
    assertNoCartesian(out)
    val rows = out.as[(Long, Long, Double)].collect().toSet
    assert(rows == Set((1L, 2L, 0.5)))
  }

  test("ngramJaccardPairs maxDocFreq drops stop-shingles") {
    // "a b c" appears in all 3 docs; cap=2 removes it, leaving no
    // shingle shared by docs 1 and 3.
    val d = docs(1L -> "a b c x", 2L -> "a b c y", 3L -> "a b c z")
    val all = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.01)
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.01,
      maxDocFreq = Some(2))
    assert(all.count() == 3) // all pairs share "a b c"
    assert(capped.count() == 0)
  }

  test("ngramContainmentPairs: a subset doc scores containment 1.0 " +
      "where jaccard misses it, directions correct") {
    // doc 1 is the first third of doc 2: every doc-1 gram is in
    // doc 2 → C(1→2) = 1.0, but jaccard = |A|/|B| = 3/13 ≈ 0.23.
    val short = "a b c d e"
    val long = short + " f g h i j k l m n o"
    val d = docs(1L -> short, 2L -> long, 3L -> "p q r s t")
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .count() == 0, "jaccard must miss the subset pair")
    val out = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.9)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L)),
      s"only doc 1 is contained in doc 2: ${out.toSeq}")
    val r = out.head
    assert(r._3 == 3L && r._4 == 3L && r._5 == 1.0,
      s"3 shared grams over |A|=3: $r")
  }

  test("ngramContainmentPairs: both directions emitted, each " +
      "containment = common/|contained|") {
    // docs 1 and 2 overlap partially: common=2 grams,
    // |A|=3, |B|=3 → both directions 2/3 at threshold 0.5
    val d = docs(1L -> "a b c d e", 2L -> "a b c d x")
    val out = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 2L, 3L, 2.0 / 3),
      (2L, 1L, 2L, 3L, 2.0 / 3)), s"got $out")
  }

  // NOTE the tempting "capped ⊆ uncapped" law is FALSE for thresholded
  // output: dropping a stop-shingle shrinks the union, so a pair's
  // jaccard over the surviving shingles can RISE above the threshold.
  // The sound law is equality once the cap clears every document
  // frequency — the capped two-pass plan (df count + broadcast cut)
  // must then be a semantic no-op.
  test("ngramJaccardPairs: cap above max document frequency is a no-op") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val unc = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5,
      maxDocFreq = Some(1000000))
      .as[(Long, Long, Double)].collect().toSet
    assert(unc.nonEmpty)
    assert(capped == unc)
  }

  test("ngramJaccardPairs computes shingles ONCE (exchange reuse)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
    out.collect() // materialize so AQE finalizes its stage graph
    val plan = out.queryExecution.executedPlan.toString
    // Only the FINAL adaptive plan counts (the printout appends the
    // pre-AQE "Initial Plan", where the subtree legitimately repeats).
    val finalPlan = plan.split("== Initial Plan ==").head
    val gramExchanges = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      // the r18 hashed-gram form shuffles `gh` (xxhash64 of the
      // word tuple) where the string form shuffled `gram`
      .filter(l => l.contains("gh#") || l.contains("gram")).toSeq
    val (reused, materialized) =
      gramExchanges.partition(_.contains("ReusedExchange"))
    // One real shingle exchange; every other consumer (second join
    // side, sizes) must hit AQE's stage cache — i.e. the shingle scan
    // + explode + distinct runs exactly once however many times the
    // self-join references it.
    assert(materialized.size == 1,
      s"shingle exchange materialized ${materialized.size}x:\n$finalPlan")
    assert(reused.size >= 2,
      s"expected >=2 reused shingle exchanges:\n$finalPlan")
  }

  test("contaminationScores: hand-checked overlap fractions, no cartesian") {
    // eval doc 1: trigrams {a b c, b c d, c d e} — corpus contains
    // "a b c" and "b c d" (via doc 10) but not "c d e" → 2/3
    // eval doc 2: no trigram in corpus → 0.0
    // eval doc 3: shorter than n words → 0 grams, 0.0
    val eval = docs(
      1L -> "a b c d e",
      2L -> "x y z w",
      3L -> "too short")
    val train = docs(
      10L -> "q a b c d q",
      11L -> "unrelated words entirely here")
    val out = Dedup.contaminationScores(eval, train, "doc_id", "text", 3)
    assertNoCartesian(out)
    // the train side must meet the eval gram set via broadcast — a
    // sort-merge join here would mean the corpus gram stream shuffles
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "contamination must broadcast the eval gram set")
    val m = out.as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) == ((3L, 2L, 2.0 / 3)))
    assert(m(2L) == ((2L, 0L, 0.0)))
    assert(m(3L) == ((0L, 0L, 0.0)))
  }

  test("simhash banding: bands=4 and bands=8 agree within hamming 3") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val sig = Dedup.simhash(d, "doc_id", "text")
    def pairs(bands: Int) =
      Dedup.simhashNearDupPairs(sig, "doc_id", maxHamming = 3,
        bands = bands)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
    // maxHamming=3 < 4 <= bands: BOTH bandings are pigeonhole-complete
    // at this radius, so they must return exactly the same pair set —
    // band width trades bucket size, never completeness inside radius.
    assert(pairs(4) == pairs(8))
  }

  test("minhash LSH finds planted near-dups with high recall, no cartesian") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    val lsh = Dedup.minhashNearDupPairs(d, "doc_id", "text", 3,
      maxJaccardDist = 0.5, numHashTables = 8, seed = 42L)
    assertNoCartesian(lsh)
    val got = lsh.select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    // candidate verification keeps precision exact w.r.t. vector jaccard:
    // every reported pair really is within the distance threshold.
    val dists = lsh.select(col("jaccard_dist")).as[Double].collect()
    assert(dists.forall(_ <= 0.5))
  }

  test("md5-exact minhash twin: same recall contract, precision " +
      "exact, and pair set equals the xxhash path on this fixture") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val twin = Dedup.minhashNearDupPairsExact(d, "doc_id", "text",
      n = 3, maxJaccardDist = 0.5)
    assertNoCartesian(twin)
    val got = twin.select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    assert(twin.select(col("jaccard_dist")).as[Double].collect()
      .forall(_ <= 0.5))
    // near-identical planted dups collide in every band under ANY
    // hash family — both paths find the same pairs here
    val xx = Dedup.minhashNearDupPairs(d, "doc_id", "text", 3,
      maxJaccardDist = 0.5, numHashTables = 8, seed = 42L)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == xx)
  }

  test("minhashNewVsStore == full self-join restricted to cross pairs") {
    // the law that makes the incremental path trustworthy: banding
    // the batch against the store finds EXACTLY the pairs the full
    // (store ∪ batch) self-join would report between the two halves —
    // same seed, same bands, same exact verify, bit-equal distances.
    // COMPLETE banding on both sides (explicit None — r15 flipped
    // the defaults to capped): this is the algebra law; the capped
    // default's containment law follows below.
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val batch = d.filter(col("doc_id") % 2 === 1)
    val store = d.filter(col("doc_id") % 2 === 0)
    val full = Dedup.minhashNearDupPairs(d, "doc_id", "text", 3,
      maxJaccardDist = 0.5, numHashTables = 8, seed = 42L,
      bucketCap = None)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 2) != (b % 2) } // cross only
      .map { case (a, b, dist) =>
        if (a % 2 == 1) (a, b, dist) else (b, a, dist) }
      .toSet
    val inc = Dedup.minhashNearDupNewVsStore(batch, store,
      "doc_id", "text", 3, maxJaccardDist = 0.5, numHashTables = 8,
      seed = 42L, storeBucketCap = None)
      .as[(Long, Long, Double)].collect().toSet
    assert(full.nonEmpty, "fixture should contain cross-half near-dups")
    assert(inc == full, s"incremental ${inc.size} vs full-cross ${full.size}")
    // the DEFAULT (store-capped) path is a subset of complete matching
    val incDefault = Dedup.minhashNearDupNewVsStore(batch, store,
      "doc_id", "text", 3, maxJaccardDist = 0.5, numHashTables = 8,
      seed = 42L)
      .as[(Long, Long, Double)].collect().toSet
    assert(incDefault.subsetOf(inc), "store cap invented a candidate")
    assertNoCartesian(Dedup.minhashNearDupNewVsStore(batch, store,
      "doc_id", "text", 3, 0.5))
  }

  test("the UNCONFIGURED banded paths are density-capped (r15 — the " +
      "uncapped path requires an explicit None): DefaultBucketCap is " +
      "set, a default call equals the explicitly-capped call on a " +
      "planted dense bucket, and differs from complete banding") {
    assert(Dedup.DefaultBucketCap == Some(8))
    // 30 near-identical docs: one dense bucket per band, occupancy 30
    val dense = (0L until 30L).map(i => (i,
      "the quick brown fox jumps over the lazy dog again and again " +
        s"today for emphasis tail$i"))
      .toDF("doc_id", "text")
    def pairs(cap: Option[Int]): Set[(Long, Long)] =
      Dedup.minhashNearDupPairs(dense, "doc_id", "text", 3,
        maxJaccardDist = 0.9, bucketCap = cap)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
    val byDefault = Dedup.minhashNearDupPairs(dense, "doc_id",
      "text", 3, maxJaccardDist = 0.9)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val capped = pairs(Dedup.DefaultBucketCap)
    val complete = pairs(None)
    assert(byDefault == capped,
      "the unconfigured call did not take the default cap")
    assert(capped.size < complete.size,
      "cap did not fire on a 30-dense bucket")
    assert(capped.subsetOf(complete))
    // min-id survivorship under the default: every member keeps its
    // edge to the bucket min
    (1L until 30L).foreach { i =>
      assert(byDefault.contains((0L, i)), s"lost the min edge for $i")
    }
  }

  test("simhash: identical docs agree, near-identical docs are close") {
    val sig = Dedup.simhash(docs(
      1L -> "spark shuffles the partition keys across executors today",
      2L -> "spark  SHUFFLES the partition keys across executors today",
      3L -> "spark shuffles the partition keys across machines today",
      4L -> "completely different words about cooking pasta dinner"),
      "doc_id", "text")
    val m = sig.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
  }

  test("simhashNearDupPairs: banded join finds close pairs, no cartesian") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val sig = Dedup.simhash(d, "doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(sig, "doc_id",
      maxHamming = 7, bands = 8)
    assertNoCartesian(pairs)
    val got = pairs.select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    // exact near-dups (jaccard >= 0.8 on trigrams) should mostly land
    // within hamming 7 of each other in simhash space (the banded join
    // is pigeonhole-complete there with 8 bands, so misses are solely
    // simhash approximation, not candidate generation).
    val strong = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    val recall = strong.count(got.contains).toDouble / strong.size
    assert(recall >= 0.9, s"recall $recall over ${strong.size} strong pairs")
  }

  test("md5-exact simhash twin: banded result EQUALS brute-force " +
      "hamming pairs (pigeonhole-complete at 7 < 10 bands), recall " +
      "holds on strong near-dups") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val sig = Dedup.simhash60Md5(d, "doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(sig, "doc_id",
      maxHamming = 7, bands = 10, bits = 60)
    assertNoCartesian(pairs)
    val got = pairs.select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Int)].collect().toSet
    // completeness: with maxHamming < bands every qualifying pair
    // shares at least one identical band — banded == brute force
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= 7)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"banded (${got.size}) must equal " +
      s"brute force (${brute.size})")
    val strong = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    val gotIds = got.map(p => (p._1, p._2))
    val recall = strong.count(gotIds.contains).toDouble / strong.size
    assert(recall >= 0.9, s"recall $recall over ${strong.size} strong pairs")
  }

  test("segmentDedup: keep-first across docs, ordered reassembly") {
    // 2-word segments: doc 1 = [a b][c d], doc 2 = [c d][e f],
    // doc 3 = [a b] — only doc 1's copies of [a b] and [c d] survive.
    val out = Dedup.segmentDedup(
      docs(1L -> "a b c d", 2L -> "c d e f", 3L -> "a b"),
      "doc_id", "text", segWords = 2)
      .select(col("doc_id"), col("n_segments"), col("n_kept"),
        col("dedup_text"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 1L, 0L, "")))
  }

  test("segmentDedup: intra-doc repeats keep only the first position") {
    val out = Dedup.segmentDedup(
      docs(7L -> "x y x y z"), "doc_id", "text", segWords = 2)
      .select(col("n_segments"), col("n_kept"), col("dedup_text"))
      .as[(Long, Long, String)].collect().toSeq
    // Segments: [x y][x y][z] — the second [x y] is a duplicate.
    assert(out == Seq((3L, 2L, "x y z")))
  }

  test("segmentDedup: dedup-free corpus reassembles to the input text") {
    val in = docs(1L -> "p q r s t", 2L -> "u v w")
    val out = Dedup.segmentDedup(in, "doc_id", "text", segWords = 2)
      .select(col("doc_id"), col("dedup_text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "p q r s t", 2L -> "u v w"))
  }

  test("segmentDedup: empty text yields no row; plan stays equi-only") {
    val df = Dedup.segmentDedup(
      docs(1L -> "", 2L -> "a b"), "doc_id", "text", segWords = 2)
    assertNoCartesian(df)
    assert(df.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("boilerplateRemoval strips shared segments from EVERY doc") {
    // "hdr one two" is shared chrome in docs 1/2/4; unique tails stay.
    val d = docs(
      1L -> "hdr one two uniq a b",
      2L -> "hdr one two uniq c d",
      3L -> "solo e f",
      4L -> "hdr one two")
    val out = Dedup.boilerplateRemoval(d, "doc_id", "text",
      segWords = 3, maxDocs = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, "uniq a b")))
    assert(out(2L) == ((2L, 2L, 1L, "uniq c d")))
    assert(out(3L) == ((3L, 1L, 1L, "solo e f")))
    // all-boilerplate doc survives as a row with empty clean_text —
    // unlike segmentDedup, NO doc keeps the shared segment
    assert(out(4L) == ((4L, 1L, 0L, "")))
  }

  test("boilerplateRemoval: maxDocs tolerance and intra-doc repeats") {
    val d = docs(
      1L -> "hdr one two uniq a b",
      2L -> "hdr one two uniq c d",
      // intra-doc repetition counts ONE distinct doc toward df
      5L -> "rep p q rep p q")
    val keep2 = Dedup.boilerplateRemoval(d, "doc_id", "text",
      segWords = 3, maxDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // df("hdr one two") = 2 <= maxDocs → kept everywhere
    assert(keep2(1L)._4 == "hdr one two uniq a b")
    assert(keep2(2L)._4 == "hdr one two uniq c d")
    // df("rep p q") = 1 → kept, both positions
    assert(keep2(5L) == ((5L, 2L, 2L, "rep p q rep p q")))
    // the dictionary join is a broadcast, never a segment exchange of
    // the corpus side
    val p = Dedup.boilerplateRemoval(d, "doc_id", "text",
      segWords = 3, maxDocs = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("dupSpanProfile: run lengths, intra-doc repeats, no cartesian") {
    // doc 1 and 2 share the 5-word prefix "c1 c2 c3 c4 c5" → trigram
    // positions 0,1,2 duplicated in both (run 3). doc 3 is clean.
    val d = docs(
      1L -> "c1 c2 c3 c4 c5 u1a u1b u1c",
      2L -> "c1 c2 c3 c4 c5 u2a u2b u2c",
      3L -> "z1 z2 z3 z4 z5")
    val out = Dedup.dupSpanProfile(d, "doc_id", "text", n = 3)
    assertNoCartesian(out)
    val rows = out.as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, 6L, 3L, 3L, 0.5)))
    assert(rows(2L) == ((2L, 6L, 3L, 3L, 0.5)))
    assert(rows(3L) == ((3L, 3L, 0L, 0L, 0.0)))
  }

  test("dupSpanProfile: disjoint dup runs report the longest") {
    // "a b c" at positions 0 and 4 of doc 9 repeats INTRA-doc (cnt 2
    // from the same doc) → two runs of 1; longest = 1
    val d = docs(9L -> "a b c x a b c")
    val rows = Dedup.dupSpanProfile(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
    // grams: [a b c][b c x][c x a][x a b][a b c] — only "a b c" dups
    assert(rows.toSeq == Seq((9L, 5L, 2L, 1L, 0.4)))
  }

  test("dupSpanRemoval strips every occurrence of a long-enough run") {
    // docs 1 and 2 share a 6-word span → 4 consecutive dup trigrams
    // (run >= 3), covering token positions 0..5 in both; doc 3 clean.
    val d = docs(
      1L -> "c1 c2 c3 c4 c5 c6 u1a u1b u1c",
      2L -> "c1 c2 c3 c4 c5 c6 u2a u2b u2c",
      3L -> "z1 z2 z3 z4 z5")
    val out = Dedup.dupSpanRemoval(d, "doc_id", "text", n = 3, minRun = 3)
    assertNoCartesian(out)
    val rows = out.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, 9L, 6L, "u1a u1b u1c")))
    assert(rows(2L) == ((2L, 9L, 6L, "u2a u2b u2c")))
    assert(rows(3L) == ((3L, 5L, 0L, "z1 z2 z3 z4 z5")))
  }

  test("dupSpanRemoval: short runs survive, full coverage empties a doc") {
    // docs 5/6 share only a 5-word span → 3 dup trigram positions =
    // run 3 (removed at minRun 3, kept at minRun 4)
    val d = docs(
      5L -> "c1 c2 c3 c4 c5 u5a u5b u5c",
      6L -> "c1 c2 c3 c4 c5 u6a u6b u6c")
    val strict = Dedup.dupSpanRemoval(d, "doc_id", "text", 3, minRun = 4)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(strict(5L)._3 == 0L && strict(5L)._4.startsWith("c1 c2"))
    val loose = Dedup.dupSpanRemoval(d, "doc_id", "text", 3, minRun = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(loose(5L) == ((5L, 8L, 5L, "u5a u5b u5c")))
    // identical docs are fully covered → row kept, clean_text empty
    val dup = docs(7L -> "a b c d e", 8L -> "a b c d e")
    val gone = Dedup.dupSpanRemoval(dup, "doc_id", "text", 3, minRun = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(gone(7L) == ((7L, 5L, 5L, "")))
    assert(gone(8L) == ((8L, 5L, 5L, "")))
  }

  test("adaptiveBands never drops below the completeness floor") {
    // small corpus: density wants 8 bands, floor satisfied
    assert(Dedup.adaptiveBands(1000L, maxHamming = 7) == 8)
    // huge corpus: density wants 2-4 bands but maxHamming 7 needs >= 8
    assert(Dedup.adaptiveBands(1000000000L, maxHamming = 7) == 8)
    // spending radius buys density back
    assert(Dedup.adaptiveBands(1000000000L, maxHamming = 1) == 2)
    assert(Dedup.adaptiveBands(100000000L, maxHamming = 3) == 4)
  }

  // Exactness law for the Bloom prefilter: "no" is definite, every
  // "maybe" is verified — so output EQUALS the plain incremental
  // anti-join at any fpp, including an aggressive one where false
  // positives certainly occur.
  test("bloom-prefiltered incremental dedup equals the exact path at any fpp") {
    val all = (0L until 200L).map(i => i -> s"doc text ${i % 120}")
    val df = docs(all: _*)
    val known = df.filter(col("doc_id") < 120)
      .select(Dedup.fingerprint(col("text")).as("fingerprint"))
    val batch = df.filter(col("doc_id") >= 100)
    val exact = Dedup.incrementalExactDedup(batch, known, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    for (fpp <- Seq(0.5, 0.03, 0.001)) {
      val bloom = Dedup.incrementalExactDedupBloom(batch, known,
        "doc_id", "text", expectedItems = 200L, fpp = fpp)
        .as[(String, Long, Long)].collect().toSet
      assert(bloom == exact, s"fpp=$fpp diverged")
    }
  }

  test("conversationDedup: id-independent, but turn ORDER and role " +
      "both distinguish; partition-independent") {
    val turns = Seq(
      // convs 1 and 2: identical ordered turns (different ids) → dup
      (1L, 0L, "user", "hello there"), (1L, 1L, "assistant", "hi"),
      (2L, 0L, "user", "hello there"), (2L, 1L, "assistant", "hi"),
      // conv 3: SAME turns, swapped order → distinct
      (3L, 0L, "assistant", "hi"), (3L, 1L, "user", "hello there"),
      // conv 4: same order + content, one role flipped → distinct
      (4L, 0L, "user", "hello there"), (4L, 1L, "user", "hi"))
      .toDF("conv", "turn_idx", "role", "content")
    val out = Dedup.conversationDedup(turns, "conv", "turn_idx",
      "role", "content")
      .select(col("conv"), col("dup_count"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    val re = Dedup.conversationDedup(turns.repartition(5), "conv",
      "turn_idx", "role", "content")
      .select(col("conv"), col("dup_count"))
      .as[(Long, Long)].collect().toMap
    assert(re == out)
  }
}
