package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines (SURVEY.md
  * §2.8 [NS]): exact dedup, exact n-gram Jaccard similarity join, and
  * MinHash-LSH / SimHash approximate near-dup detection over a text
  * column.
  *
  * Scale design (the point of every choice here):
  *  - Exact dedup is a hash aggregation on a 128-bit fingerprint — one
  *    shuffle keyed on the fingerprint, map-side combinable, no row
  *    text shipped after the fingerprint is computed.
  *  - The exact Jaccard join is an INVERTED-INDEX join (explode
  *    shingles, equi-join on the shingle), never an all-pairs cross
  *    join: cost is Σ bucket² over shingle buckets, linear-ish for
  *    natural text. A document-frequency cap drops stop-shingles whose
  *    buckets would dominate that sum at corpus scale.
  *  - MinHash-LSH banding (pure DataFrame: seeded xxhash64 minima,
  *    2-row bands) reduces candidate generation to equi-joins on band
  *    signatures — the standard sublinear path when even the inverted
  *    index is too big — and verifies candidates with the exact
  *    Jaccard recomputed for candidate documents only.
  *  - SimHash packs a document into 64 bits; banded self-join on
  *    16-bit chunks finds all pairs within Hamming distance 3 by the
  *    pigeonhole principle, again equi-join only.
  */
object Dedup {

  /** The opt-OUT LSH density cap (r14 verdict #4): every banded
    * candidate join defaults to keep-min-K per (band, chunk) bucket
    * so candidate volume is corpus-LINEAR (Σ occ·K) even when a new
    * data grain turns out template-heavy (ns194's measured 50× wall
    * at 10× rows). Min-id survivorship is provably unaffected — the
    * bucket MIN is always in the kept core, so every member keeps
    * its edge to the min. Reaching complete banding (md5 gate twins,
    * recall studies) requires an EXPLICIT `bucketCap = None`. */
  val DefaultBucketCap: Option[Int] = Some(8)

  /** Canonical text: trimmed, lower-cased, whitespace collapsed. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** 128-bit content fingerprint of the canonical text. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Exact dedup via fingerprint groups: one survivor (minimum id) per
    * distinct canonical text, with the group's multiplicity. `carry`
    * columns ride along with the SURVIVOR's values (min_by on id) —
    * cheaper than the join-back a consumer would otherwise pay to
    * recover payload columns. Output:
    * (fingerprint, idCol, dup_count, carry...). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val aggs = Seq(min(col(idCol)).as(idCol),
      count(lit(1)).as("dup_count")) ++
      carry.map(c => min_by(col(c), col(idCol)).as(c))
    df.withColumn("fingerprint", fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Duplicate → survivor provenance edges from exact dedup: one row
    * per DROPPED document mapping it to its fingerprint group's
    * surviving id — the mapping [[exactDedup]] itself discards but
    * downstream bookkeeping needs: the funnel (ns60) can attribute
    * every dropped row, and a takedown on a dropped id can propagate
    * to its kept twin (o16's delete list joined through this table).
    *
    * Plan shape: ONE shuffle on the fingerprint (a window min — no
    * groupBy + corpus-sized join-back); the survivor's `carry`
    * columns ride in the same window via the struct-min trick
    * (idCol-first struct ⇒ lexicographic min = min-id row), the
    * dropped row's own `carry` values come straight off the row.
    * Output: (dropped_id, kept_id, fingerprint, dropped_<carry>...,
    * kept_<carry>...). */
  def exactDedupProvenance(df: DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp"))
    val kept = min(struct(col(idCol) +: carry.map(col): _*)).over(w)
    df.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__kept", kept)
      .filter(col(idCol) =!= col("__kept")(idCol))
      .select(col(idCol).as("dropped_id") +:
        col("__kept")(idCol).as("kept_id") +:
        col("__fp").as("fingerprint") +:
        (carry.map(c => col(c).as(s"dropped_$c")) ++
          carry.map(c => col("__kept")(c).as(s"kept_$c"))): _*)
  }

  /** Generic exact dedup on explicit key columns (`dropDuplicates`):
    * arbitrary-survivor semantics, one shuffle on the keys. */
  def dropExactDups(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Incremental exact dedup: dedupe a NEW ingest batch against the
    * fingerprint store of everything already in the corpus — the
    * daily-ingest shape, where re-running [[exactDedup]] over the
    * whole corpus for each batch would rescan 100 TB to admit 100 GB.
    * New docs whose fingerprint is already known are dropped
    * (anti-join on `fingerprint`); the remainder is deduped
    * within-batch as usual, yielding the rows (and fingerprints) to
    * append to the store. The anti-join shuffles the NEW batch plus
    * a fingerprint-only projection of the store; keep the store
    * bucketed by fingerprint (`ops/Bucketing`) and the store side
    * arrives co-located with no exchange at all.
    * Output: (fingerprint, idCol, dup_count) — [[exactDedup]] schema,
    * batch-new content only. The fingerprint computed for the
    * anti-join is carried into the group-by rather than recomputed
    * (the regex+md5 chain is the expensive part of the row). */
  def incrementalExactDedup(newDocs: DataFrame,
      knownFingerprints: DataFrame, idCol: String,
      textCol: String): DataFrame =
    newDocs
      .withColumn("fingerprint", fingerprint(col(textCol)))
      .join(knownFingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** [[incrementalExactDedup]] with a Bloom-filter pre-filter on the
    * store's fingerprints — the canonical 100-TB membership shape.
    * The plain incremental anti-join still SHUFFLES the whole new
    * batch plus the store's fingerprint projection; at corpus scale
    * the store side dwarfs every batch. A Bloom filter over the
    * store's fingerprints (built once per batch — or maintained
    * incrementally alongside the store in production) is megabytes
    * for billions of entries, ships task-broadcast, and answers
    * "definitely new" locally: only the maybe-present survivors
    * (true duplicates + fpp × batch) reach the exact anti-join, so
    * the exchange carries ~the duplicate rate instead of the batch.
    *
    * EXACTNESS IS PRESERVED — Bloom "no" is definite, and every
    * Bloom "maybe" is verified by the real anti-join — so this is
    * hash-gated against the SAME oracle as ns25 (identical output),
    * and NsDedupSpec proves equality across fpp settings.
    *
    * The membership probe is a Scala UDF over the broadcast bitset —
    * the one deliberate UDF in the codebase: ~100 ns/row of probe
    * against removing the store-sized exchange entirely; it sits
    * behind a fingerprint projection, not inside a codegen'd
    * expression chain. */
  def incrementalExactDedupBloom(newDocs: DataFrame,
      knownFingerprints: DataFrame, idCol: String, textCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = knownFingerprints.stat.bloomFilter(
      "fingerprint", expectedItems, fpp)
    val mightContain = udf((fp: String) => bf.mightContainString(fp))
    val fp = newDocs.withColumn("fingerprint", fingerprint(col(textCol)))
    val definitelyNew = fp.filter(!mightContain(col("fingerprint")))
    val maybe = fp.filter(mightContain(col("fingerprint")))
      .join(knownFingerprints.select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
    definitelyNew.unionByName(maybe)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
  }

  /** Distinct word n-grams (shingles) per document:
    * (idCol, gram). Documents shorter than n words contribute none.
    *
    * The trailing not-null filter is a PLAN-SHAPE device, not
    * semantics (concat_ws never yields null; null ids are useless to
    * every consumer): the pair join pushes exactly these IsNotNull
    * predicates into its two shingle branches, so carrying them here
    * makes every consumer's distinct-exchange subtree canonically
    * IDENTICAL — AQE's stage cache then computes the shingle scan +
    * explode + distinct ONCE and wires ReusedExchange into the other
    * consumers (sizes, both join sides). Without it the sizes branch
    * recomputed the whole shingle pipeline (verified on the executed
    * plan). */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingleStream(df, idCol, textCol, n).distinct()

  /** [[shingles]] WITHOUT the per-(id, gram) distinct — the raw
    * exploded gram stream, still map-side only. For consumers that
    * reduce the stream some cheaper way (e.g. [[contaminationScores]]
    * broadcast-filters it before any shuffle), the distinct would be
    * a full corpus-wide exchange bought for nothing. */
  def shingleStream(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // materialize the tokenized array behind a projection boundary
    // BEFORE the per-gram lambda: common-subexpression elimination
    // does not reach inside higher-order-function lambda bodies, so
    // an inline `slice(split(regexp_replace(...)))` re-runs the
    // regex + split once PER GRAM (~word-count× redundant work per
    // document — measured 10× on the gram family at sf1)
    val words = col("__words")
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), split(normText(col(textCol)), " ").as("__words"))
      .select(col(idCol), explode(grams).as("gram"))
      .filter(col("gram").isNotNull)
  }

  /** Hashed-identity shingle stream: (idCol, gh) where `gh` is the
    * xxhash64 of the n-word TUPLE (variadic — no gram string is ever
    * built, no slice array materialized), the r17 dup-span form
    * generalized. Downstream exchanges shuffle 8-byte longs instead
    * of ~n-word strings (guide §2.3 "narrower types": the r18 sf1
    * A/B measured the string-gram distinct at 6.1 s vs 3.4 s hashed,
    * and ns02b end-to-end 7.9 → 4.6 s). For consumers that never
    * EXPOSE gram identity — pair generators, membership counts —
    * hash-gram equality stands in for string equality modulo 64-bit
    * collisions, the same trade the repo's fingerprint/minhash-verify
    * idiom already makes everywhere. Consumers that output grams
    * (ngramTopK) or pin a hash basis (minhash signatures, md5 gate
    * twins) stay on [[shingleStream]].
    *
    * The trailing not-null filter mirrors [[shingles]]' plan-shape
    * device: consumers' subtrees stay canonically identical so AQE
    * reuses the distinct exchange across branches. */
  def shingleHashStream(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val words = col("__words")
    val ghash = (i: Column) =>
      xxhash64((1 to n).map(j => element_at(words, i + j)): _*)
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n), i => ghash(i)))
      .otherwise(array().cast("array<long>"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), split(normText(col(textCol)), " ").as("__words"))
      .select(col(idCol), explode(grams).as("gh"))
      .filter(col("gh").isNotNull)
  }

  /** Distinct hashed shingles per document: (idCol, gh) — the
    * [[shingles]]/[[shingleHashStream]] relationship. */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingleHashStream(df, idCol, textCol, n).distinct()

  /** Exact n-gram Jaccard similarity join via inverted index: all
    * document pairs with Jaccard(shingles(a), shingles(b)) >= threshold.
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * `maxDocFreq`: drop shingles appearing in more than this many
    * documents before pairing. At fixture scale leave it None for
    * oracle parity; at corpus scale a cap (say 1000) bounds the worst
    * shingle bucket and therefore the join's quadratic term.
    *
    * Gram identity is the hashed tuple ([[shingleHashStream]], r18):
    * nothing downstream exposes the gram, so the whole pipeline —
    * df-cap count, inverted-index join, per-doc sizes — runs on
    * 8-byte longs (sf1 A/B: 7.9 → 4.6 s at cap 5).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val g0 = shingleHashes(df, idCol, textCol, n)
    val g = maxDocFreq match {
      case Some(cap) =>
        // Two-pass stop-shingle cut: tiny (gram, df) side, broadcast
        // back. Keeps the pair join's Σ bucket² bounded by cap².
        val rare = g0.groupBy(col("gh"))
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= cap)
          .select(col("gh"))
        g0.join(rare, "gh")
      case None => g0
    }
    val sizes = g.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    // Alias both sides of the self-join: `a("gh") === b("gh")`
    // resolves both sides to the SAME attribute (a and b share g's
    // lineage), which Spark only untangles via its self-join
    // heuristic — with a trivially-true-predicate warning per run.
    val a = g.select(col(idCol).as("id_a"), col("gh")).as("ga")
    val b = g.select(col(idCol).as("id_b"), col("gh")).as("gb")
    val common = a.join(b,
      col("ga.gh") === col("gb.gh") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Directed n-gram CONTAINMENT pairs — the asymmetric complement
    * of [[ngramJaccardPairs]] (Broder 1997 defines both):
    * C(A→B) = |A∩B| / |A| over distinct word n-gram sets. Catches
    * SUBSET duplication that symmetric Jaccard structurally misses —
    * a short doc quoted whole inside a long digest has containment
    * 1.0 but Jaccard ≈ |A|/|B|, far below any near-dup threshold —
    * which is exactly the syndication/quotation/boilerplate-wrapper
    * shape a web corpus is full of.
    *
    * Same scale machinery as Jaccard: candidates from the shared-
    * shingle equi-join (never an all-pairs product), intersection
    * counted ONCE per unordered pair, sizes joined back, then each
    * surviving pair emits its two directions. `maxDocFreq` caps the
    * per-gram bucket like ns02b. Output:
    * (contained_id, container_id, common, sz_contained, containment)
    * — one row per DIRECTED pair with containment ≥ `threshold`. */
  def ngramContainmentPairs(df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      maxDocFreq: Option[Int] = None): DataFrame = {
    // hashed gram identity, same as [[ngramJaccardPairs]] (r18):
    // the output exposes ids and counts, never grams
    val g0 = shingleHashes(df, idCol, textCol, n)
    val g = maxDocFreq match {
      case Some(cap) =>
        val rare = g0.groupBy(col("gh"))
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= cap)
          .select(col("gh"))
        g0.join(rare, "gh")
      case None => g0
    }
    val sizes = g.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = g.select(col(idCol).as("id_a"), col("gh")).as("ca")
    val b = g.select(col(idCol).as("id_b"), col("gh")).as("cb")
    val common = a.join(b,
      col("ca.gh") === col("cb.gh") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")),
        "id_b")
    // both directions from ONE evaluation of the pair join (a
    // two-branch union would re-run the join per branch): map-side
    // explode of the two directed structs
    common
      .select(explode(array(
        struct(col("id_a").as("contained_id"),
          col("id_b").as("container_id"), col("common"),
          col("sz_a").as("sz_contained")),
        struct(col("id_b").as("contained_id"),
          col("id_a").as("container_id"), col("common"),
          col("sz_b").as("sz_contained")))).as("p"))
      .select(col("p.contained_id"), col("p.container_id"),
        col("p.common"), col("p.sz_contained"),
        (col("p.common").cast("double") /
          col("p.sz_contained").cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Benchmark decontamination (the GPT-3 appendix-C / C4-analysis
    * overlap check): for each eval document, the fraction of its
    * distinct word n-grams that occur ANYWHERE in the training
    * corpus. The train side collapses to its distinct gram set first
    * (one map-combinable distinct — corpus text is never shipped),
    * then grams meet in an inverted-index equi-join on `gram` —
    * never an eval×train document product — so cost scales with gram
    * volume, not corpus size × eval size. Eval docs with zero overlap
    * (or shorter than n words) are kept with contamination 0.0: a
    * decontamination report that silently drops clean docs can't be
    * diffed against the eval manifest.
    *
    * Plan shape (the part that must survive 100 TB): the eval
    * benchmark is small by the nature of the check, so its distinct
    * gram set BROADCASTS; the train corpus's raw gram stream
    * ([[shingleStream]] — no distinct, pure map side) is semi-joined
    * against that broadcast, so the corpus contributes zero
    * shuffles — the only exchange after the broadcast filter is a
    * distinct over the surviving grams, bounded by |eval gram set|.
    * If even raw grams are too wide, swap both sides to
    * [[graft.ns.TextOps.shingleFingerprints]] (mod-p sampled hashes)
    * — the shape is identical on `fp`.
    * Output: (idCol, n_grams, n_hit, contamination). */
  def contaminationScores(evalDocs: DataFrame, train: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val eg = shingles(evalDocs, idCol, textCol, n)
    val hitGrams = shingleStream(train, idCol, textCol, n)
      .select(col("gram"))
      .join(broadcast(eg.select(col("gram")).distinct()),
        Seq("gram"), "leftsemi")
      .distinct()
    val hits = eg
      .join(broadcast(hitGrams.withColumn("__hit", lit(1L))),
        Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    evalDocs.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, 0.0)
          .otherwise(col("n_hit").cast("double") /
            col("n_grams").cast("double")).as("contamination"))
  }

  /** Per-source contamination MATRIX — [[contaminationScores]]
    * resolved by training group: for each `groupCol` value, how many
    * eval documents have ≥ tauNum/tauDen of their distinct n-grams
    * contained in THAT group's text (the per-dataset attribution a
    * decontamination report needs: which SOURCE leaked the benchmark,
    * not just whether something did). The threshold compares
    * cross-multiplied exact integers — no float fractions anywhere.
    *
    * Plan shape: the train side streams (group, gram) through the
    * same broadcast eval-gram prefilter as contaminationScores
    * BEFORE its distinct — the exchange carries each group's
    * eval-intersecting grams only (bounded by |eval grams| × groups,
    * never corpus grams); the hit join is gram-keyed equi, never
    * eval × train. Groups with zero contaminated docs are absent
    * (sparse matrix). Output: (groupCol, n_eval_docs,
    * n_contaminated). */
  def contaminationMatrix(evalDocs: DataFrame, train: DataFrame,
      idCol: String, textCol: String, groupCol: String, n: Int,
      tauNum: Int = 3, tauDen: Int = 10): DataFrame = {
    require(tauNum >= 1 && tauDen >= tauNum,
      "need 0 < tauNum/tauDen <= 1")
    val eg = shingles(evalDocs, idCol, textCol, n)
    val egN = eg.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val tg = shingleStream(train, groupCol, textCol, n)
      .select(col(groupCol), col("gram"))
      .join(broadcast(eg.select(col("gram")).distinct()),
        Seq("gram"), "leftsemi")
      .distinct()
    // bounded driver scalar: the matrix denominator
    val nEval = evalDocs.select(col(idCol)).distinct().count()
    eg.join(tg, Seq("gram"))
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("n_hit"))
      .join(egN, idCol)
      .filter(col("n_hit") * tauDen >= col("n_grams") * tauNum)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col(groupCol), lit(nEval).as("n_eval_docs"),
        col("n_contaminated"))
  }

  /** Per-document MinHash signature: `numHashes` independent min-hash
    * values, h_j(doc) = min over the doc's shingles of
    * xxhash64(j, xxhash64(seed, shingle)) — the string is hashed once,
    * then k cheap long-mixes derive the hash family. One map-combinable
    * aggregation over the shingle stream — k running minima per
    * document, no text and no gram set shipped past the map side.
    * Output: (idCol, mh0..mh_{k-1}). */
  def minhashSignature(grams: DataFrame, idCol: String, numHashes: Int,
      seed: Long): DataFrame = {
    val gh = xxhash64(lit(seed), col("gram"))
    val mins = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), gh)).as(s"mh$j"))
    grams.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH approximate near-dup pairs, pure DataFrame: documents
    * are shingled, signed with `numHashTables`×2 min-hashes, and banded
    * into `numHashTables` bands of 2 rows; candidate pairs come from
    * the equi-join on (band, band-signature) — never an all-pairs
    * product — and the EXACT Jaccard over shingle sets (recomputed for
    * candidate documents only, a join bounded by the candidate volume)
    * filters them, so reported distances carry no approximation.
    * Bands of 2 rows make the candidate probability s² per band (s =
    * true Jaccard): pairs at the s≈0.8 planted-near-dup level survive
    * ≥1 of 8 bands with p≈0.9997, while s≈0.2 background pairs are
    * band-joined only 28% of the time — the sublinear cut the
    * single-row banding of a generic LSH library doesn't give.
    * Output: (id_a, id_b, jaccard_dist), id_a < id_b, jaccard_dist <=
    * maxJaccardDist. Deterministic for a fixed seed. */
  /** Banded rows (idCol, band, chunk) from a signature frame: bands
    * of 2 signature rows each, the shape both the self-join and the
    * batch-vs-store join consume. */
  private def bandedSig(sig: DataFrame, idCol: String,
      numHashTables: Int): DataFrame = {
    val rowsPerBand = 2
    sig.select(col(idCol),
      posexplode(array((0 until numHashTables).map { b =>
        struct(col(s"mh${rowsPerBand * b}").as("h0"),
          col(s"mh${rowsPerBand * b + 1}").as("h1"))
      }: _*)).as(Seq("band", "chunk")))
  }

  /** Per-document compact shingle-hash set: one sorted array of gram
    * xxhash64s per doc — the exact-verify operand (per-doc state ~
    * document size, never fanned out per gram). */
  private def gramSets(g: DataFrame, idCol: String,
      seed: Long): DataFrame =
    g.select(col(idCol), xxhash64(lit(seed), col("gram")).as("gh"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("gh"))).as("ghs"))

  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxJaccardDist: Double, numHashTables: Int = 8,
      seed: Long = 42L,
      // The 100-TB density knob (r14, the ns194 sf1 finding): with a
      // cap K, each (band, chunk) bucket contributes only its K
      // LOWEST ids on the left side of the candidate join, so
      // candidate volume is Σ occ·K ≈ corpus-LINEAR instead of the
      // uncapped Σ occ² (measured 50× wall at 10× rows on template-
      // heavy conversation transcripts, where bucket occupancy grows
      // with the corpus). Every bucket member still pairs with the
      // bucket MIN (the min is always in the core), so min-id
      // survivorship — what dedup consumes — is unaffected; what the
      // cap trades away is pair recall between two mid-bucket
      // members neither of whom is in the low-id core, and the
      // exact-Jaccard verify still prunes every surviving candidate.
      // ON BY DEFAULT since r15 (r14 verdict #4): ns194's 50×-at-10×
      // incident was a caller inheriting the then-uncapped default at
      // a new (templated, short-text) grain — the trap recurs at
      // every future grain, so the safe behavior is the unconfigured
      // one. Complete banding (the md5 gate twins, recall studies)
      // now requires an EXPLICIT None at the call site.
      bucketCap: Option[Int] = Dedup.DefaultBucketCap): DataFrame = {
    val rowsPerBand = 2
    val g = shingles(df, idCol, textCol, n)
    val sig = minhashSignature(g, idCol, numHashTables * rowsPerBand, seed)
    val banded = bandedSig(sig, idCol, numHashTables)
    val left = bucketCap match {
      case Some(k) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("chunk")).orderBy(col(idCol))
        banded.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k).drop("__rk")
      case None => banded
    }
    val cand = left.select(col(idCol).as("id_a"), col("band"),
      col("chunk"))
      .join(banded.select(col(idCol).as("id_b"), col("band"),
        col("chunk")), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // Exact verification, candidates only. Each doc's shingle set is
    // one compact sorted array of 64-bit gram hashes (per-doc state ~
    // document size — the same bound any minhash verifier carries);
    // candidate pairs attach the two arrays by id equi-join and an
    // array_intersect computes the exact Jaccard. Crucially this never
    // fans a candidate pair out by its gram count: an earlier
    // inverted-index verify did (candidates × ~300 grams of shuffled
    // string rows) and was 20-30× slower at sf0.1.
    val docsets = gramSets(g, idCol, seed)
    cand
      .join(docsets.select(col(idCol).as("id_a"), col("ghs").as("ghs_a")),
        "id_a")
      .join(docsets.select(col(idCol).as("id_b"), col("ghs").as("ghs_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ghs_a"), col("ghs_b"))).as("common"),
        size(col("ghs_a")).as("sz_a"), size(col("ghs_b")).as("sz_b"))
      .select(col("id_a"), col("id_b"),
        (lit(1.0) - col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common"))).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= maxJaccardDist)
  }

  /** Incremental MinHash near-dup: match a NEW batch against an
    * existing corpus WITHOUT any store-side self-join — the fuzzy
    * twin of [[incrementalDedup]], and the shape nightly ingest
    * actually runs. Band rows from the batch equi-join band rows
    * from the store (batch×store buckets only), so adding a batch
    * costs |batch bands| × matching store buckets — the store is
    * NEVER paired with itself, and a 100-TB store contributes one
    * banding pass (in production, persist [[minhashSignature]]
    * output alongside the corpus and feed the saved signatures here
    * instead of re-shingling; this self-contained form recomputes
    * them from text for the oracle's sake). Candidates are
    * exact-verified with the same compact gram-hash arrays as
    * [[minhashNearDupPairs]]; NsDedupSpec proves this equals the
    * full self-join restricted to cross (batch, store) pairs.
    * Output: (batch_id, store_id, jaccard_dist), dist <=
    * maxJaccardDist. Deterministic for a fixed seed. */
  /** Oracle-exact MinHash twin of [[minhashNearDupPairs]]: identical
    * banding semantics (16 min-hashes, 8 bands × 2 rows, band-collision
    * candidates, exact-Jaccard verify) but every hash is the repo's
    * DuckDB-replicable md5 idiom — so candidate generation AND the
    * verify are reproducible in SQL and the whole operator hash-gates
    * (ns03b), where ns03 is rows-only by its xxhash64. Production
    * keeps ns03 (one 64-bit hash per gram vs 16 md5s here, and long
    * arrays in the verify vs gram strings); this twin pins the
    * ALGORITHM — which pairs band-collide, completeness of the
    * verification — against an independent engine at fixture scale. */
  /** The [[minhashNearDupPairsExact]] banding stage as a standalone,
    * STORABLE projection — the signature-bank row a near-dup index
    * persists: one (idCol, band, chunk) row per document per band,
    * every hash the repo's DuckDB-replicable md5 idiom, the chunk
    * rendered as the canonical "h0:h1" string (two longs, ':'
    * unambiguous) so the bank parquet-roundtrips and hash-gates.
    * Two docs band-collide iff they share a (band, chunk) row —
    * the LSH candidate surface. Used by the batch pair join here
    * and by the streaming bank maintenance
    * ([[graft.streaming.EventStream.startMinhashBankStream]]).
    * Output: (idCol, band, chunk). */
  def minhashBandRowsExact(df: DataFrame, idCol: String,
      textCol: String, n: Int, numHashTables: Int = 8): DataFrame = {
    val rowsPerBand = 2
    val g = shingles(df, idCol, textCol, n)
    def mhash(j: Int) =
      conv(substring(md5(concat(col("gram"), lit(s":mh$j"))), 1, 15),
        16, 10).cast("long")
    val mins = (0 until numHashTables * rowsPerBand).map(j =>
      min(mhash(j)).as(s"mh$j"))
    val sig = g.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    bandedSig(sig, idCol, numHashTables)
      .select(col(idCol), col("band").cast("long").as("band"),
        concat(col("chunk.h0").cast("string"), lit(":"),
          col("chunk.h1").cast("string")).as("chunk"))
  }

  /** PRODUCTION-tier signature-bank rows — [[minhashBandRowsExact]]'s
    * storable (idCol, band, chunk) projection built from the ns03
    * xxhash64 idiom: ONE 64-bit string hash per gram, then k cheap
    * long-mixes ([[minhashSignature]]), vs the md5 twin's 16 md5
    * evaluations per gram. Identical banding semantics (16 min-hashes,
    * 8 bands × 2 rows, chunk = "h0:h1"), so two docs band-collide iff
    * they share a (band, chunk) row — same candidate surface, same
    * storability, ~an order of magnitude less hash work. Rows-only by
    * its xxhash64 (like ns03); the md5 twin is the hash-gated
    * algorithm pin (ns03b / s18), and the bank≡batch + replay laws in
    * StreamingSpec hold for BOTH builders through the same streaming
    * machinery. Output: (idCol, band, chunk). */
  def minhashBandRows(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashTables: Int = 8, seed: Long = 42L): DataFrame = {
    val rowsPerBand = 2
    val g = shingles(df, idCol, textCol, n)
    val sig = minhashSignature(g, idCol, numHashTables * rowsPerBand,
      seed)
    bandedSig(sig, idCol, numHashTables)
      .select(col(idCol), col("band").cast("long").as("band"),
        concat(col("chunk.h0").cast("string"), lit(":"),
          col("chunk.h1").cast("string")).as("chunk"))
  }

  def minhashNearDupPairsExact(df: DataFrame, idCol: String,
      textCol: String, n: Int, maxJaccardDist: Double,
      numHashTables: Int = 8): DataFrame = {
    val g = shingles(df, idCol, textCol, n)
    val banded = minhashBandRowsExact(df, idCol, textCol, n,
      numHashTables)
    val cand = banded.select(col(idCol).as("id_a"), col("band"),
      col("chunk"))
      .join(banded.select(col(idCol).as("id_b"), col("band"),
        col("chunk")), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val docsets = g.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("gram"))).as("ghs"))
    cand
      .join(docsets.select(col(idCol).as("id_a"), col("ghs").as("ghs_a")),
        "id_a")
      .join(docsets.select(col(idCol).as("id_b"), col("ghs").as("ghs_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ghs_a"), col("ghs_b"))).as("common"),
        size(col("ghs_a")).as("sz_a"), size(col("ghs_b")).as("sz_b"))
      .select(col("id_a"), col("id_b"),
        (lit(1.0) - col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common"))).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= maxJaccardDist)
  }

  def minhashNearDupNewVsStore(batch: DataFrame, store: DataFrame,
      idCol: String, textCol: String, n: Int, maxJaccardDist: Double,
      numHashTables: Int = 8, seed: Long = 42L,
      // Keep-min-K on the STORE side of the match join, on by
      // default ([[DefaultBucketCap]], r15): a hot store bucket —
      // the templated-text density trap at batch-vs-store grain —
      // otherwise costs every batch arrival its full occupancy per
      // band. The bucket MIN is always in the kept core, so a batch
      // doc in a dense dup group still finds the group's min-id
      // representative; complete matching requires an explicit None.
      storeBucketCap: Option[Int] = Dedup.DefaultBucketCap)
      : DataFrame = {
    val rowsPerBand = 2
    val gb = shingles(batch, idCol, textCol, n)
    val gs = shingles(store, idCol, textCol, n)
    val bb = bandedSig(
      minhashSignature(gb, idCol, numHashTables * rowsPerBand, seed),
      idCol, numHashTables)
    val bs0 = bandedSig(
      minhashSignature(gs, idCol, numHashTables * rowsPerBand, seed),
      idCol, numHashTables)
    val bs = storeBucketCap match {
      case Some(k) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("chunk")).orderBy(col(idCol))
        bs0.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k).drop("__rk")
      case None => bs0
    }
    val cand = bb
      .select(col(idCol).as("batch_id"), col("band"), col("chunk"))
      .join(bs.select(col(idCol).as("store_id"), col("band"),
        col("chunk")), Seq("band", "chunk"))
      .select(col("batch_id"), col("store_id"))
      .distinct()
    cand
      .join(gramSets(gb, idCol, seed)
        .select(col(idCol).as("batch_id"), col("ghs").as("ghs_a")),
        "batch_id")
      .join(gramSets(gs, idCol, seed)
        .select(col(idCol).as("store_id"), col("ghs").as("ghs_b")),
        "store_id")
      .select(col("batch_id"), col("store_id"),
        size(array_intersect(col("ghs_a"), col("ghs_b"))).as("common"),
        size(col("ghs_a")).as("sz_a"), size(col("ghs_b")).as("sz_b"))
      .select(col("batch_id"), col("store_id"),
        (lit(1.0) - col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common"))).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= maxJaccardDist)
  }

  /** Conversation-level exact dedup — the dedup-before-SFT step a
    * chat corpus needs that document dedup cannot provide: two
    * conversations are duplicates iff their ORDERED turn sequences
    * (role AND content, rendered through the ns141/ns179 template)
    * match exactly, regardless of conversation id — the re-crawled /
    * re-uploaded chat export case. Fingerprint = md5 of the
    * template-rendered turns concatenated in turn order (array_sort
    * over (turn, text) structs makes the order total and
    * partition-independent; the `<|end|>` delimiter prevents
    * cross-turn splice collisions). One conversation-keyed
    * aggregation + one group-sized aggregation — the exactDedup
    * shape one level up. Output: (fingerprint, convCol = min
    * surviving id, dup_count). */
  def conversationDedup(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String,
      contentCol: String): DataFrame = {
    val rendered = concat(lit("<|"), col(roleCol), lit("|>"),
      coalesce(col(contentCol), lit("")), lit("<|end|>"))
    turns
      .select(col(convCol), col(turnCol).cast("long").as("__turn"),
        rendered.as("__t"))
      .groupBy(col(convCol))
      .agg(md5(array_join(transform(array_sort(collect_list(
        struct(col("__turn"), col("__t")))),
        e => e.getField("__t")), "")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(convCol)).as(convCol),
        count(lit(1)).as("dup_count"))
  }

  /** Render each conversation's ORDERED turns to one whitespace-
    * joined transcript string — "<|role|> content <|end|> …" — the
    * ns100 session-transcript trick at conversation grain, with
    * spaces around the template markers so word-shingling treats
    * them as ordinary tokens. One conversation-keyed aggregation
    * (array_sort over (turn, text) structs makes the order total and
    * partition-independent — [[conversationDedup]]'s convention).
    * Output: (convCol, transcript). */
  def conversationTranscripts(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String,
      contentCol: String): DataFrame = {
    val rendered = concat(lit("<|"), col(roleCol), lit("|> "),
      coalesce(col(contentCol), lit("")), lit(" <|end|>"))
    turns
      .select(col(convCol), col(turnCol).cast("long").as("__turn"),
        rendered.as("__t"))
      .groupBy(col(convCol))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("__turn"), col("__t")))),
        e => e.getField("__t")), " ").as("transcript"))
  }

  /** Conversation-level NEAR-dup — what [[conversationDedup]] cannot
    * catch (r13 verdict gap #8): a re-uploaded chat with a trivial
    * edit (greeting variant, appended thanks) renders to a DIFFERENT
    * exact fingerprint but an almost-identical transcript. MinHash
    * over word shingles of the rendered transcript (the ns03
    * machinery at conversation grain): banded candidates, exact
    * Jaccard verify, same sublinear-LSH scale shape. Production uses
    * the xxhash64 idiom (rows-only, like ns03); the md5 twin
    * ([[conversationNearDupExact]]) hash-gates the algorithm.
    * Output: (id_a, id_b, jaccard_dist), id_a < id_b. */
  def conversationNearDup(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String, contentCol: String,
      n: Int = 3, maxJaccardDist: Double = 0.5,
      numHashTables: Int = 8, seed: Long = 42L,
      // ON by default ([[DefaultBucketCap]]): short templated
      // transcripts (greeting/ack turns) make bucket occupancy grow
      // WITH the corpus, and the uncapped self-join measured 50× wall
      // at 10× rows (SCALE.md r14). Fixture-scale buckets sit far
      // below the cap, so the planted-twin laws and the md5 gate
      // twin ([[conversationNearDupExact]], uncapped by design) are
      // untouched.
      bucketCap: Option[Int] = Dedup.DefaultBucketCap): DataFrame =
    minhashNearDupPairs(
      conversationTranscripts(turns, convCol, turnCol, roleCol,
        contentCol),
      convCol, "transcript", n, maxJaccardDist, numHashTables, seed,
      bucketCap)

  /** md5-idiom twin of [[conversationNearDup]] — the hash-gated
    * algorithm pin (the ns03/ns03b split at conversation grain). */
  def conversationNearDupExact(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String, contentCol: String,
      n: Int = 3, maxJaccardDist: Double = 0.5,
      numHashTables: Int = 8): DataFrame =
    minhashNearDupPairsExact(
      conversationTranscripts(turns, convCol, turnCol, roleCol,
        contentCol),
      convCol, "transcript", n, maxJaccardDist, numHashTables)

  /** 64-bit SimHash of the canonical token stream: each token votes
    * ±1 on every bit of its 64-bit hash; the sign of the vote sum
    * becomes the fingerprint bit. One explode + one 64-way map-side-
    * combinable aggregation — no shuffle of document text. Output:
    * (idCol, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(normText(col(textCol)), " ")).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val votes = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val packed = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** SimHash near-dup candidate pairs within `maxHamming`: banded
    * equi-join on (64/bands)-bit chunks, then exact Hamming filter.
    * By pigeonhole the result is COMPLETE whenever maxHamming < bands
    * (a pair within that distance must agree on at least one whole
    * band); more bands buy recall at the cost of bigger band buckets.
    *
    * Sizing `bands` for corpus scale: each band's chunk space has
    * 2^(64/bands) values, and the expected band-bucket size is
    * corpus / 2^(64/bands) — the join cost is Σ bucket² over buckets.
    * bands=8 (8-bit chunks, 256 values) saturates around 10⁵ docs;
    * for 10⁸+ docs use bands=4 (16-bit chunks, 65 536 values) and for
    * full-web scale bands=2 (32-bit chunks), accepting the smaller
    * guaranteed-complete Hamming radius (maxHamming < bands). Any
    * divisor of 64 works; NsDedupSpec proves bands=4 and bands=8 agree
    * wherever both are complete.
    * Output: (id_a, id_b, hamming). */
  /** Corpus-adaptive band count for [[simhashNearDupPairs]] — the
    * registered mitigation for the fixed-band density trap (SCALE.md
    * ns04: 23.9× at 10× corpus). Picks the SMALLEST chunk width
    * w ∈ {8, 16, 32} whose expected band-bucket occupancy
    * corpus/2^w stays ≤ `maxOcc`, and returns bands = 64/w: the
    * band join's Σ bucket² cost then stays ~linear in corpus size.
    * Fewer, wider bands shrink the guaranteed-complete Hamming
    * radius (pigeonhole: complete iff maxHamming < bands) — beyond
    * it recall is probabilistic, concentrated on the closest pairs
    * (a pair at Hamming h keeps P ≈ 1-(1-((64-w)/64)^h)^bands of
    * colliding on some whole band). That trade is inherent: banded
    * completeness at a fixed RELATIVE radius needs width ≤
    * 64/(maxHamming+1), so width growth must spend the radius.
    * NsDedupSpec's agreement law (bands=4 ≡ bands=8 wherever both
    * are complete) covers the contract.
    *
    * `maxHamming` is the radius the CALLER will filter at: the result
    * is clamped to the completeness floor bands ≥ maxHamming+1, so
    * density can never silently push a complete configuration into
    * the probabilistic regime (a rows-only gate cannot see a recall
    * drop). When density WANTED fewer bands the clamp logs it — at
    * that corpus scale the caller must spend radius (lower
    * maxHamming) to buy density, explicitly. */
  def adaptiveBands(corpusCount: Long, maxHamming: Int = 7,
      maxOcc: Double = 32.0): Int = {
    require(maxHamming >= 0 && maxHamming < 64, s"bad maxHamming")
    val w = Seq(8, 16, 32)
      .find(w => corpusCount / math.pow(2.0, w) <= maxOcc)
      .getOrElse(32)
    val density = 64 / w
    // smallest divisor of 64 that keeps pigeonhole completeness
    val floor = Seq(1, 2, 4, 8, 16, 32, 64)
      .find(_ >= maxHamming + 1).getOrElse(64)
    if (density < floor)
      System.err.println(s"[graft] adaptiveBands: corpus=$corpusCount " +
        s"wants $density bands but maxHamming=$maxHamming needs ≥$floor " +
        s"for completeness — clamped to $floor; lower maxHamming to " +
        s"trade radius for density at this scale")
    math.max(density, floor)
  }

  /** 60-bit SimHash over md5 token hashes — the oracle-exact twin of
    * [[simhash]] (same TF-weighted bit votes; 60 bits because the
    * md5-prefix long idiom yields 15 hex chars, keeping the value
    * non-negative and the SQL replication clean). Feeds
    * [[simhashNearDupPairs]] with `bits = 60`. */
  def simhash60Md5(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(normText(col(textCol)), " ")).as("token"))
      .withColumn("h",
        conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val packed = (0 until 60).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }
  /** (idCol, simhash, band, chunk) band keys of a signature table —
    * shared by the self-join ([[simhashNearDupPairs]]) and
    * new-vs-store ([[simhashNearDupNewVsStore]]) forms. */
  private def simhashBands(sig: DataFrame, idCol: String,
      bands: Int, bits: Int): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val width = bits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    sig.select(col(idCol), col("simhash"),
      explode(array((0 until bands).map { band =>
        struct(lit(band).as("band"),
          shiftrightunsigned(col("simhash"), band * width)
            .bitwiseAND(lit(mask)).as("chunk"))
      }: _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.band").as("band"), col("bk.chunk").as("chunk"))
  }

  /** Public band-row face of the Hamming banding — (idCol, band,
    * chunk), the shape [[graft.streaming.EventStream
    * .startMinhashBankStream]] injects via `bandRows`. Any 64-bit
    * signature source drops in: SimHash text signatures, dHash image
    * bits, [[graft.ns.Multimodal.audioFingerprint]] words (the r15
    * audio bank). */
  def simhashBandRows(sig: DataFrame, idCol: String, bands: Int = 8,
      bits: Int = 64): DataFrame =
    simhashBands(sig, idCol, bands, bits)
      .select(col(idCol), col("band"), col("chunk"))

  def simhashNearDupPairs(sig: DataFrame, idCol: String,
      maxHamming: Int, bands: Int = 8, bits: Int = 64): DataFrame = {
    val banded = simhashBands(sig, idCol, bands, bits)
    val a = banded.select(col(idCol).as("id_a"),
      col("simhash").as("sig_a"), col("band"), col("chunk"))
    val b = banded.select(col(idCol).as("id_b"),
      col("simhash").as("sig_b"), col("band"), col("chunk"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      // filter BEFORE distinct (r16): a pair colliding in k bands
      // appears k times with the SAME hamming, so the order is
      // equivalence-preserving — but the dedup exchange then carries
      // only QUALIFYING pairs, not every band collision (at sf1 the
      // collision volume is ~78M rows vs thousands of qualifiers;
      // the old order shuffled all of them through the distinct)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental Hamming-banded near-dup: a NEW batch of signatures
    * banded against the STORED signature bank only — the ns41
    * delta-cost shape for SimHash/dHash families (daily image or
    * document ingest vs an accumulated bank; the bank never
    * self-joins, so a batch costs batch × collision work, not
    * bank²). Same pigeonhole completeness as the self-join form:
    * maxHamming < bands ⇒ every qualifying cross pair shares at
    * least one exact band chunk. Output: (new_id, store_id,
    * hamming). */
  def simhashNearDupNewVsStore(newSig: DataFrame, storeSig: DataFrame,
      idCol: String, maxHamming: Int, bands: Int = 8,
      bits: Int = 64): DataFrame = {
    val n = simhashBands(newSig, idCol, bands, bits)
      .select(col(idCol).as("new_id"), col("simhash").as("sig_n"),
        col("band"), col("chunk"))
    val s = simhashBands(storeSig, idCol, bands, bits)
      .select(col(idCol).as("store_id"), col("simhash").as("sig_s"),
        col("band"), col("chunk"))
    n.join(s, Seq("band", "chunk"))
      .select(col("new_id"), col("store_id"),
        bit_count(col("sig_n").bitwiseXOR(col("sig_s"))).as("hamming"))
      // filter before distinct — same equivalence-preserving
      // reorder as the self-join form (r16)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Sub-document (segment-level) exact dedup with reassembly — the
    * paragraph-dedup pass of C4/Dolma-style curation, at segment
    * granularity: split each document into fixed-width word segments,
    * keep only the globally FIRST occurrence of each distinct segment
    * (ordered by (id, position) — deterministic), and stitch each
    * document back together from its surviving segments in original
    * order. Boilerplate repeated across documents (headers, footers,
    * license blocks) survives exactly once, in the earliest document.
    *
    * Plan shape (the scale story): segment explode is map-side;
    * keep-first is ONE shuffle keyed on the segment text (row_number
    * over the segment's occurrences — bucket size = the segment's
    * corpus frequency, no all-pairs anything); reassembly is ONE
    * groupBy(id) whose collect_list partially aggregates map-side.
    * Two exchanges total over segment rows — the floor for any
    * global sub-document dedup that must restore document order.
    * At 100 TB the segment shuffle carries (segment, id, idx) rows;
    * text rides the exchange once, which is inherent because the
    * reassembled output needs it back.
    *
    * Output: (idCol, n_segments, n_kept, dedup_text) — one row per
    * input document that produced ≥1 segment (empty/whitespace-only
    * text yields none); dedup_text is "" when every segment was a
    * duplicate. */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10): DataFrame = {
    require(segWords > 0, "segWords must be > 0")
    val segs = segmentRows(df, idCol, textCol, segWords)
    val firstOcc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("segment"))
      .orderBy(col(idCol), col("seg_idx"))
    val kept = segs.withColumn("__keep",
      row_number().over(firstOcc) === 1)
    kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("seg_idx"), col("segment"))))),
          s => s.getField("segment"))).as("dedup_text"))
  }

  /** Fixed-width word segments of each document, exploded to one row
    * per (document, position, segment). Map-side only — the shared
    * front half of [[segmentDedup]] and [[boilerplateRemoval]].
    * split("") is [""] — one empty word — so empty/whitespace-only
    * documents are filtered explicitly rather than relying on an
    * empty sequence (null text already drops via posexplode(null)). */
  private def segmentRows(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    // words materialized behind a projection boundary — see
    // shingleStream: lambda bodies re-evaluate inline splits per
    // element
    val words = col("__words")
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), split(col(textCol), " ").as("__words"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            ceil(size(words) / lit(segWords.toDouble)).cast("long") - 1),
          i => concat_ws(" ",
            slice(words, (i * segWords + 1).cast("int"),
              lit(segWords)))))
          .as(Seq("seg_idx", "segment")))
  }

  /** Boilerplate removal (the CCNet/RefinedWeb cleaning pass):
    * segments that occur in MORE than `maxDocs` distinct documents
    * are boilerplate (navigation chrome, cookie banners, license
    * headers) and are removed from EVERY document — unlike
    * [[segmentDedup]], which keeps the first occurrence. Documents
    * are reassembled from their surviving segments in original order.
    *
    * Plan shape (the scale story): the document-frequency side
    * collapses segment rows to one row per distinct segment (a
    * distinct-count aggregation, partial map-side both phases), and
    * the boilerplate DICTIONARY — segments with df > maxDocs — is
    * tiny by construction (the repeated head of the segment
    * distribution, Zipf-bounded the same way a vocabulary is), so it
    * is BROADCAST back as a left join and the corpus itself never
    * shuffles on segment text for the marking step. The corpus pays
    * exactly one exchange: the per-document reassembly groupBy, whose
    * collect_list partially aggregates map-side. An adversarial
    * threshold (maxDocs = 0-ish at web scale) would inflate the
    * dictionary; callers size maxDocs so the dictionary stays
    * broadcast-sized, which is also what makes it boilerplate.
    *
    * Output: (idCol, n_segments, n_kept, clean_text) — one row per
    * document with ≥1 segment; clean_text is "" when every segment
    * was boilerplate. */
  /** Duplicated-span profile — the per-document diagnostic behind
    * substring-level dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499): an n-gram
    * occurring ANYWHERE else in the corpus (another document or
    * another position of the same one) is a duplicated span witness,
    * and a run of consecutive duplicated gram positions is a
    * copy-pasted span of run+n−1 words. Curation gates on
    * dup_frac / max_dup_run the way Lee et al. cut 50-token repeats —
    * without building a distributed suffix array, which is the
    * genuinely-suffix-structured part Spark cannot express as a
    * relational plan; consecutive-gram runs are the equi-join
    * approximation of it.
    *
    * Plan shape (v3, r18 — hot-key-safe): the gram stream
    * (scan→normText→split→per-position gram build→posexplode) is
    * `localCheckpoint`ed ONCE — the r17 window form existed only to
    * avoid re-running that lineage on a join probe side, and the
    * checkpoint kills the recompute without giving up partial
    * aggregation. The materialized stream feeds (1) a
    * MAP-COMBINABLE `groupBy(gram).count` — a boilerplate gram in 30%
    * of all documents costs each map task ONE partial row, so the
    * count exchange is hot-key-safe by construction — filtered to the
    * duplicated grams only (`cnt > 1`, the Zipf head plus true dups),
    * and (2) a join of the stream back against that much smaller dup
    * dictionary. The join broadcasts when the dictionary is small; at
    * scale it shuffles, where AQE's skew-join split handles a hot
    * gram's probe partition — unlike the r17 `Window.partitionBy
    * (gram)`, which materialized EVERY occurrence of the hottest gram
    * in one unsplittable partition with no partial aggregation (the
    * straggler/spill bomb these operators exist to find). Then ONE
    * per-document aggregation whose run-length scan is a codegen'd
    * `aggregate` fold over the doc's own sorted dup positions —
    * per-document bounded, never corpus-wide. The gram identity is
    * the 8-byte xxhash64 of the word TUPLE (variadic `xxhash64(w_i,
    * …, w_i+n−1)` — no gram string and no slice array is ever built;
    * the ns11 trick): the
    * explode emits longs, the count exchange and the join sort carry
    * longs, and a collision between two distinct word tuples only
    * overcounts dups at ~2⁻⁶⁴ — deterministic on a given corpus, and
    * the exact-string DuckDB oracle stays green on the fixture. The
    * r17 string form paid ~2× of the whole query in per-position
    * `concat_ws` string building alone.
    *
    * Output: (idCol, n_grams, n_dup, max_dup_run, dup_frac); docs
    * with fewer than n words emit no grams and no row. */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // words materialized behind a projection boundary — see
    // shingleStream: lambda bodies re-evaluate inline splits per
    // element
    val words = col("__words")
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => xxhash64((0 until n).map(k =>
          element_at(words, i + k + 1)): _*)))
      .otherwise(array().cast("array<long>"))
    // the gram stream is checkpointed AFTER the explode so both
    // consumers read it materialized (id, pos, 8-byte gram id) —
    // never recomputing the scan→normText→split lineage
    val stream = df.filter(col(idCol).isNotNull)
      .select(col(idCol), split(normText(col(textCol)), " ").as("__words"))
      .select(col(idCol), posexplode(grams).as(Seq("pos", "gram")))
      .localCheckpoint(true)
    // duplicated-gram dictionary: map-combinable count, dup head only
    val dupGrams = stream.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    val dupPos = array_sort(collect_list(
      when(col("cnt").isNotNull, col("pos").cast("long"))))
    // longest run of consecutive positions: fold (best, cur, prev)
    // across the sorted array — empty array yields best = 0
    val maxRun = aggregate(dupPos,
      struct(lit(0L).as("best"), lit(0L).as("cur"), lit(-2L).as("prev")),
      (acc, x) => {
        val cur = when(x === acc.getField("prev") + 1,
          acc.getField("cur") + 1).otherwise(lit(1L))
        struct(greatest(acc.getField("best"), cur).as("best"),
          cur.as("cur"), x.as("prev"))
      },
      acc => acc.getField("best"))
    // a missed left join = unique gram (cnt null); cnt >= 2 otherwise
    stream.join(dupGrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("cnt").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        maxRun.as("max_dup_run"))
      .withColumn("dup_frac",
        col("n_dup").cast("double") / col("n_grams").cast("double"))
  }

  /** Corpus-wide duplicated-span REMOVAL — the acting counterpart of
    * [[dupSpanProfile]]'s diagnostic (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" substring-dedup pass,
    * at word-gram granularity): a span is any maximal run of >= `minRun`
    * consecutive gram positions whose grams each occur more than once
    * corpus-wide; every occurrence of every span is stripped (the
    * aggressive C4-style form — corpus-frequent spans are boilerplate)
    * and each document is reassembled from its surviving tokens in
    * original order.
    *
    * Plan shape (v3, r18 — hot-key-safe; see dupSpanProfile for the
    * full rationale): the gram stream is `localCheckpoint`ed once, the
    * dup-gram dictionary comes from a MAP-COMBINABLE
    * `groupBy(gram).count` (a hot gram costs one partial row per map
    * task), and the dup stream is a semi-join of the gram stream
    * against that dictionary — broadcast when small, AQE-skew-split
    * when shuffled — replacing the r17 `Window.partitionBy(gram)`
    * count that materialized every occurrence of the hottest gram in
    * one unsplittable partition; islands (gaps-and-islands on per-doc dup
    * positions) need one id-keyed window; from there everything is
    * PER-DOC INTERVAL ARITHMETIC — span sets collapse to one small
    * array per document (Σ spans ≤ corpus tokens / minRun) and the
    * reassembly is a single HOF pass over each doc's own words array
    * (position ∉ any span). The v1 shape instead EXPLODED every
    * token of the corpus, expanded spans to covered positions,
    * anti-joined the two streams, and re-aggregated with
    * collect_list + array_sort — three extra full-corpus exchanges
    * that dominated the sf1 profile (18.8 s; the gram-count exchange
    * itself is ~a third of that). Every remaining exchange is keyed
    * on idCol or the gram — nothing quadratic, nothing driver-side.
    *
    * Output: (idCol, n_words, n_removed, clean_text); a fully-covered
    * document keeps the row with clean_text = "". */
  def dupSpanRemoval(df: DataFrame, idCol: String, textCol: String,
      n: Int, minRun: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minRun >= 1, "minRun must be >= 1")
    val words = col("__words")
    // 8-byte gram identity, no gram string built — see dupSpanProfile
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => xxhash64((0 until n).map(k =>
          element_at(words, i + k + 1)): _*)))
      .otherwise(array().cast("array<long>"))
    val toks = df.filter(col(idCol).isNotNull)
      .select(col(idCol), split(normText(col(textCol)), " ").as("__words"))
    // checkpointed AFTER the explode — the per-position gram build is
    // the expensive half of the lineage (see dupSpanProfile)
    val gramStream = toks
      .select(col(idCol), posexplode(grams).as(Seq("gpos", "gram")))
      .localCheckpoint(true)
    // duplicated-gram dictionary (map-combinable, hot-key-safe), then
    // a semi-join of the stream against it
    val dupGrams = gramStream.groupBy(col("gram"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .select(col("gram"))
    val dup = gramStream.join(dupGrams, Seq("gram"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("gpos"))
    val spans = dup
      .withColumn("__isl", col("gpos") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("gpos")).as("__s"), max(col("gpos")).as("__e"),
        count(lit(1)).as("__len"))
      .filter(col("__len") >= minRun)
      .select(col(idCol), col("__s"),
        (col("__e") + lit(n - 1)).as("__e"))
    // one SMALL array of [start, end] intervals per affected doc —
    // the groupBy reuses the islands window's id partitioning
    val spanSets = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    // reassembly: drop every token whose position falls in a span —
    // a per-row HOF pass over the doc's own words, no token explode,
    // no covered-position expansion, no anti-join, no re-collect
    val indexed = transform(words,
      (wd, i) => struct(i.as("pos"), wd.as("token")))
    val keptArr = filter(indexed, t =>
      !exists(col("__spans"), s =>
        t.getField("pos") >= s.getField("__s") &&
          t.getField("pos") <= s.getField("__e")))
    toks.join(spanSets, Seq(idCol), "left")
      .select(col(idCol),
        size(words).cast("long").as("n_words"),
        // null-propagating zero: a null words array (null text) keeps
        // v1's null n_removed instead of a fabricated 0
        when(col("__spans").isNull,
          size(words).cast("long") - size(words).cast("long"))
          .otherwise(size(words).cast("long") -
            size(keptArr).cast("long")).as("n_removed"),
        when(col("__spans").isNull,
          concat_ws(" ", words))
          .otherwise(concat_ws(" ",
            transform(keptArr, t => t.getField("token"))))
          .as("clean_text"))
  }

  def boilerplateRemoval(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, maxDocs: Int = 1): DataFrame = {
    require(segWords > 0, "segWords must be > 0")
    require(maxDocs >= 1, "maxDocs must be >= 1")
    val segs = segmentRows(df, idCol, textCol, segWords)
    val boiler = segs
      .groupBy(col("segment"))
      .agg(count_distinct(col(idCol)).as("seg_df"))
      .filter(col("seg_df") > maxDocs)
      .select(col("segment"), lit(true).as("__bp"))
    segs.join(broadcast(boiler), Seq("segment"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__bp").isNull,
            struct(col("seg_idx"), col("segment"))))),
          s => s.getField("segment"))).as("clean_text"))
  }
}
