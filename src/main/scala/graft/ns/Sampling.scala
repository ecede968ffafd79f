package graft.ns

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Deterministic sampling and splitting for training-data pipelines
  * (SURVEY.md §2.8 [NS]).
  *
  * Training corpora need CONTENT-ADDRESSED splits, not random ones: a
  * row's train/val/test assignment must survive reruns, repartitioning,
  * corpus growth, and engine changes, or evaluation sets silently leak
  * into training. Hashing the row's identity gives exactly that — a
  * pure projection (no shuffle, no state, no RNG), reproducible by any
  * engine that can compute md5, which also makes it one of the few
  * sampling operators that can sit behind a cross-engine SQL oracle.
  *
  * Per-group quotas bound any one source's contribution to the corpus
  * (a handful of crawler domains would otherwise dominate): top-k rows
  * per group by a preference order, planned as a window group limit so
  * each partition prunes to k BEFORE the exchange.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from md5(id ":" salt), taking the
    * first 8 hex chars as an integer. Changing `salt` re-deals every
    * assignment; everything else (order, partitioning, corpus size)
    * is irrelevant by construction. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("long") % buckets

  /** Label every row with a split name by cumulative fraction over
    * [[hashBucket]] (1000 buckets → 0.1% granularity). `fractions`
    * must sum to 1, e.g. Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1). Output: input row + (bucket, split). */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val buckets = 1000
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "hashSplit writes `bucket` and `split`; input already has one of them")
    val bucket = hashBucket(col(idCol), salt, buckets)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(f => math.round(f * buckets))
    val split = fractions.map(_._1).zip(bounds)
      .foldRight(lit(null).cast("string")) { case ((name, hi), els) =>
        when(bucket < hi, lit(name)).otherwise(els)
      }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** At most `quota` rows per group, preferring by `order`: the
    * bounded per-group cap (window group limit prunes per partition
    * before the shuffle — no group ever materializes whole). Output:
    * input row + rn (1-based rank within its group). */
  def groupQuota(df: DataFrame, groupCols: Seq[Column], quota: Int,
      order: Seq[Column]): DataFrame =
    Relational.topKPerGroup(df, quota, groupCols, order)

  /** Deterministic data mixing: keep each row with its group's target
    * sampling rate (per-domain/per-source mixture weights — the knob
    * that turns a raw crawl into a weighted training mixture). The
    * keep/drop decision is content-addressed like [[hashSplit]]
    * (md5 of id+salt, 0.01% granularity), so the realized mixture is
    * reproducible across reruns, engines, and corpus growth, and a
    * row's fate never depends on partitioning or scan order. Groups
    * absent from `rates` fall back to `defaultRate`. Pure filter
    * projection — no shuffle, no RNG. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r =>
      r >= 0.0 && r <= 1.0), "sampling rates must be in [0, 1]")
    val buckets = 10000
    val rate = rates.toSeq.sortBy(_._1)
      .foldRight(lit(defaultRate)) { case ((g, r), els) =>
        when(col(groupCol) === g, lit(r)).otherwise(els)
      }
    df.filter(hashBucket(col(idCol), salt, buckets).cast("double") <
      rate * buckets)
  }

  /** Epoch-aware upsampling: repeat each row according to its group's
    * mixture WEIGHT, which — unlike [[mixtureSample]]'s rates — may
    * exceed 1. A weight w yields floor(w) guaranteed copies plus one
    * more for the deterministic hash-selected frac(w) of rows, so
    * every group's expected multiplicity is exactly w and re-runs are
    * reproducible row-for-row (content-addressed, like every sampler
    * here). The standard move when a mixture asks for more of a
    * source than exists: repeat it for multiple training epochs
    * (data-constrained scaling, Muennighoff et al. 2023) — the
    * `epoch` column (1-based) lets downstream dedup-by-epoch or
    * curriculum stages tell copies apart.
    *
    * Scale: zero shuffle — a pure projection plus an explode of a
    * sequence bounded by ceil(max weight); output size is the point
    * (Σ_g w_g·n_g rows), not a blow-up risk, since weights are
    * small constants by construction. Weight 0 drops the group.
    *
    * Output: input row + epoch. Rows with 0 repeats are dropped
    * BEFORE explode (Spark's sequence(1, 0) would step backwards). */
  def upsampleEpochs(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      salt: String): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "upsample weights must be >= 0")
    require(!df.columns.contains("epoch"),
      "upsampleEpochs writes `epoch`; input already has it")
    val buckets = 10000
    val w = weights.toSeq.sortBy(_._1)
      .foldRight(lit(defaultWeight)) { case ((g, r), els) =>
        when(col(groupCol) === g, lit(r)).otherwise(els)
      }
    val reps = floor(w).cast("long") +
      (hashBucket(col(idCol), salt, buckets).cast("double") <
        (w - floor(w)) * buckets).cast("long")
    df.withColumn("__reps", reps)
      .filter(col("__reps") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__reps"))))
      .drop("__reps")
  }

  /** Temperature-weighted mixture rates at T = 2 (the common
    * UniMax/multilingual setting): rate(s) = √n_s / Σ_s √n_s —
    * upweights small sources relative to proportional sampling
    * without letting any source dominate. Feeds [[mixtureSample]]
    * (its `rates` map is this frame, collected — bounded by the
    * source count, not the corpus; the composition law is
    * spec-tested). T = 2 is the registered setting because √ is an
    * IEEE correctly-rounded operation on both engines, so ns39
    * hash-gates bit-exactly; arbitrary T needs `pow`, whose libm
    * implementations differ across engines — documented, not hidden.
    *
    * The Σ √n fold runs over the per-source weights sorted by source
    * name (a dimension-bounded array on one row), so the double
    * summation order is fixed and engine-independent. One
    * map-combinable count shuffle; the total joins back as a 1-row
    * broadcast.
    *
    * Output: (source, n_docs, rate), Σ rate = 1 up to fp rounding. */
  def temperatureMixRates(df: DataFrame, srcCol: String): DataFrame = {
    val counts = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts
      .agg(array_sort(collect_list(struct(col("source"),
        sqrt(col("n_docs").cast("double")).as("w")))).as("ws"))
      .select(aggregate(col("ws"), lit(0.0),
        (a, x) => a + x.getField("w")).as("total_w"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        (sqrt(col("n_docs").cast("double")) / col("total_w")).as("rate"))
  }

  /** Driver-side prefix sum of one long per bucket, returned as a
    * broadcastable (__bucket, __prefix) frame — the shared second
    * phase of [[packOffsets]] and [[pseudoShuffle]]'s two-phase
    * global-rank scheme. Input is (bucket, total) pairs already
    * collected (bounded by the caller's bucket count). */
  private def broadcastPrefix(perBucket: Array[(Long, Long)],
      spark: SparkSession): DataFrame = {
    var acc = 0L
    val rows = perBucket.sortBy(_._1).toSeq.map { case (b, t) =>
      val p = acc; acc += t; (b, p)
    }
    import spark.implicits._
    broadcast(rows.toDF("__bucket", "__prefix"))
  }

  /** Deterministic corpus shuffle: a content-addressed pseudo-random
    * permutation rank for training order. Sorting by a hash of the id
    * is the standard trick (reproducible, engine-independent, no RNG
    * state); the rank is materialized WITHOUT a single-partition
    * global window by the same two-phase scheme as [[packOffsets]]:
    * rows hash into `buckets` groups, each group ranks locally by
    * (md5, id) — a window over ~N/buckets rows — and the per-bucket
    * row counts (exactly `buckets` rows on the driver) are
    * prefix-summed and broadcast back. The total order is
    * (bucket, md5, id): any fixed pseudorandom total order is a valid
    * shuffle, and this one both engines can compute bit-identically.
    * Changing `salt` re-deals the whole permutation.
    * Output: (idCol, shuffle_rank), ranks exactly 1..N. */
  def pseudoShuffle(df: DataFrame, idCol: String, salt: String,
      buckets: Int = 1000): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    val withB = df.select(col(idCol))
      .withColumn("__h",
        md5(concat(col(idCol).cast("string"), lit(":" + salt))))
      // bucket DERIVED from __h (first 8 hex chars, same arithmetic
      // as hashBucket): the bucket/hash consistency the total order
      // depends on is structural, and md5 runs once per row
      .withColumn("__bucket",
        conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % buckets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col("__h"), col(idCol))
    val local = withB.withColumn("__lr",
      row_number().over(w).cast("long"))
    val counts = withB.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__c"))
      .collect().map { r =>
        require(!r.isNullAt(0), s"pseudoShuffle requires non-null " +
          s"$idCol — a null id hashes to a null bucket and cannot " +
          "be ranked")
        (r.getLong(0), r.getLong(1))
      }
    local.join(broadcastPrefix(counts, spark), "__bucket")
      .select(col(idCol),
        (col("__prefix") + col("__lr")).as("shuffle_rank"))
  }

  /** Concat-and-chunk sequence packing offsets (the GPT-style
    * pretraining layout: concatenate all documents in a fixed order,
    * then cut fixed-size context windows): each row gets its global
    * start offset in the concatenation and the chunk (pack) index
    * that offset falls in.
    *
    * The global running sum is computed scalably in two phases, not
    * with a single-partition window: rows are bucketed by
    * `orderCol div bucketSize`, each bucket computes its LOCAL
    * running sum (a window over at most `bucketSize` ids' worth of
    * rows), and the per-bucket totals are prefix-summed on the driver
    * and broadcast back — vs. the single reducer a global ORDER BY
    * window would funnel every row through.
    *
    * The driver holds ONE ROW PER NON-EMPTY BUCKET, i.e. at most
    * max(orderCol)/bucketSize rows: with DENSE ids (the corpus-manifest
    * norm this operator targets) that is ~1e5 rows at 100 TB with
    * bucketSize = 1e6. With SPARSE ids (content hashes as ids) the
    * bucket count degrades toward the row count — size bucketSize to
    * the ID RANGE, not the row count, or re-key to a dense manifest id
    * first. The totals pass re-scans only (orderCol, weightCol) —
    * column-pruned at the source — before the windowed pass scans the
    * full rows.
    *
    * `orderCol` must be non-negative (require'd); `weightCol` is any
    * per-row length (tokens, chars) — null weights count as width 0.
    * All arithmetic is integral (`div`), so offsets stay exact past
    * 2^53 where double division would round.
    * Output: (orderCol, weightCol, start_offset, pack_id). */
  def packOffsets(df: DataFrame, orderCol: String, weightCol: String,
      chunkSize: Long, bucketSize: Long = 1000000L): DataFrame = {
    require(chunkSize > 0 && bucketSize > 0,
      "chunkSize and bucketSize must be positive")
    val spark = df.sparkSession
    val withB = df
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__ord", col(orderCol).cast("long"))
      .withColumn("__bucket", expr(s"__ord div ${bucketSize}L"))
      // materialized once (r18): the two-phase prefix path evaluates
      // this lineage for the driver-side bucket totals AND the output
      // action — an expensive upstream (ns69 feeds the whole
      // qualityScore projection in) would otherwise run 2-3x
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val local = withB.withColumn("__local_start",
      coalesce(sum(col("__w")).over(w), lit(0L)))
    val totals = withB.groupBy(col("__bucket"))
      .agg(sum(col("__w")).as("__tot"), min(col("__ord")).as("__mn"))
      .collect().map { r =>
        require(!r.isNullAt(r.fieldIndex("__mn")),
          s"packOffsets requires non-null $orderCol — a null order " +
            "value hashes to a null bucket and cannot be offset")
        require(r.getLong(r.fieldIndex("__mn")) >= 0,
          s"packOffsets needs non-negative $orderCol")
        (r.getLong(0), r.getLong(1))
      }
    local.join(broadcastPrefix(totals, spark), "__bucket")
      .withColumn("__start", col("__prefix") + col("__local_start"))
      .select(col(orderCol), col(weightCol),
        col("__start").as("start_offset"),
        expr(s"__start div ${chunkSize}L").as("pack_id"))
  }

  /** Token-budget-constrained corpus selection: spend a fixed token
    * budget on the best documents first. The greedy rule every
    * curation recipe ends with — rank by quality, take documents in
    * rank order until the budget is exhausted: a document is kept iff
    * the total weight of all STRICTLY BETTER documents plus its own
    * still fits. "Better" is the total order (score desc, id asc),
    * with the score quantized to 1e-9 (`round(score·1e9)`) so the
    * order key is integral and cross-engine exact; scores must lie in
    * [0, 1] (normalized quality scores).
    *
    * Scalably ranked with NO global sort — the [[packOffsets]]
    * two-phase scheme with a composite bucket: rows group by
    * (quantized-score, id div bucketSize), each bucket window-sums
    * locally (≤ bucketSize ids' worth of rows), and the per-bucket
    * totals (one driver row per non-empty score×id-range cell) are
    * prefix-summed in bucket order and broadcast back. Driver row
    * count is bounded by distinct-scores × id-range/bucketSize — with
    * coarse scores (e.g. the 6-valued Gopher score) and dense ids
    * that is ~6·(maxId/bucketSize), far from the row count.
    *
    * Output: ALL input rows as (idCol, scoreCol, weight, cum_before,
    * kept) — kept = cum_before + weight <= budget; emitting the
    * rejected rows too keeps the budget decision auditable (the
    * curation-funnel shape, ns60). Null weights count 0; ids must be
    * non-null and non-negative (require'd at totals time). */
  /** Length-bucketed batching manifest — the dataloader layout that
    * minimizes padding waste: rank documents by (length desc, id),
    * cut fixed-size batches in that order, and account each batch's
    * exact padding cost (n·max_len − Σlen — the tokens a rectangular
    * batch tensor pads). Sorting by length is THE standard packing
    * heuristic (each batch's members have near-equal lengths, so the
    * max ≈ every member); the id tiebreak keeps the layout
    * content-addressed and reproducible.
    *
    * NO global sort: the global rank is the ns69 two-phase scheme
    * with unit weights — a window per (length, id-range-bucket)
    * composite key plus a driver-side prefix COUNT over the bounded
    * composite-bucket table, broadcast back. (length, id-bucket, id)
    * ordering equals (length desc, id) globally because id-buckets
    * partition id ranges. Equivalence with the one-global-window
    * form is law-tested. Output: (batch_id, n_docs, max_len,
    * sum_len, padding_waste). */
  def lengthBatches(df: DataFrame, idCol: String, lenCol: String,
      batchSize: Int, bucketSize: Long = 1000000L): DataFrame =
    lengthBatchAssignments(df, idCol, lenCol, batchSize, bucketSize)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .select(col("batch_id"), col("n_docs"), col("max_len"),
        col("sum_len"),
        (col("n_docs") * col("max_len") - col("sum_len"))
          .as("padding_waste"))

  /** Per-document face of [[lengthBatches]] (r15 — the p14 manifest
    * column): the (idCol, __len, batch_id) assignment BEFORE the
    * batch-grain aggregation, for consumers that need each
    * document's rectangular-batch id. `lengthBatches ≡ assignments
    * → groupBy` is law-tested. */
  def lengthBatchAssignments(df: DataFrame, idCol: String,
      lenCol: String, batchSize: Int,
      bucketSize: Long = 1000000L): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val spark = df.sparkSession
    val withB = df
      .withColumn("__len", col(lenCol).cast("long"))
      .withColumn("__neg", -col("__len"))
      .withColumn("__ib", expr(s"$idCol div ${bucketSize}L"))
      .localCheckpoint(true) // see packOffsets (r18)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__neg"), col("__ib")).orderBy(col(idCol))
    val local = withB.withColumn("__local",
      row_number().over(w).cast("long") - 1L)
    val totals = withB.groupBy(col("__neg"), col("__ib"))
      .agg(count(lit(1)).as("__tot"), min(col(idCol)).as("__mn"))
      .collect().map { r =>
        require(!r.isNullAt(r.fieldIndex("__neg")) &&
          !r.isNullAt(r.fieldIndex("__mn")),
          s"lengthBatches requires non-null $lenCol and $idCol")
        require(r.getLong(r.fieldIndex("__mn")) >= 0,
          s"lengthBatches needs non-negative $idCol")
        (r.getLong(r.fieldIndex("__neg")),
          r.getLong(r.fieldIndex("__ib")),
          r.getLong(r.fieldIndex("__tot")))
      }
    var acc = 0L
    val prefixRows = totals.sortBy(t => (t._1, t._2)).toSeq.map {
      case (neg, ib, tot) => val p = acc; acc += tot; (neg, ib, p)
    }
    import spark.implicits._
    val prefix = broadcast(prefixRows.toDF("__neg", "__ib", "__prefix"))
    local.join(prefix, Seq("__neg", "__ib"))
      .withColumn("__rank0", col("__prefix") + col("__local"))
      .withColumn("batch_id",
        expr(s"__rank0 div ${batchSize}L").cast("long"))
      .select(col(idCol), col("__len"), col("batch_id"))
  }

  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      weightCol: String, budget: Long,
      bucketSize: Long = 1000000L): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(bucketSize > 0, "bucketSize must be positive")
    val spark = df.sparkSession
    val withB = df
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__neg",
        lit(1000000000L) - round(col(scoreCol) * 1e9).cast("long"))
      .withColumn("__ib", expr(s"$idCol div ${bucketSize}L"))
      .localCheckpoint(true) // see packOffsets (r18)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__neg"), col("__ib")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val local = withB.withColumn("__local",
      coalesce(sum(col("__w")).over(w), lit(0L)))
    val totals = withB.groupBy(col("__neg"), col("__ib"))
      .agg(sum(col("__w")).as("__tot"), min(col(idCol)).as("__mn"))
      .collect().map { r =>
        require(!r.isNullAt(r.fieldIndex("__neg")) &&
          !r.isNullAt(r.fieldIndex("__mn")),
          s"tokenBudgetSelect requires non-null $scoreCol and $idCol")
        require(r.getLong(r.fieldIndex("__mn")) >= 0,
          s"tokenBudgetSelect needs non-negative $idCol")
        val neg = r.getLong(r.fieldIndex("__neg"))
        require(neg >= 0L && neg <= 1000000000L,
          s"tokenBudgetSelect needs $scoreCol in [0, 1]")
        (neg, r.getLong(r.fieldIndex("__ib")),
          r.getLong(r.fieldIndex("__tot")))
      }
    var acc = 0L
    val prefixRows = totals.sortBy(t => (t._1, t._2)).toSeq.map {
      case (neg, ib, tot) => val p = acc; acc += tot; (neg, ib, p)
    }
    import spark.implicits._
    val prefix = broadcast(prefixRows.toDF("__neg", "__ib", "__prefix"))
    local.join(prefix, Seq("__neg", "__ib"))
      .withColumn("cum_before", col("__prefix") + col("__local"))
      .select(col(idCol), col(scoreCol), col("__w").as("weight"),
        col("cum_before"),
        (col("cum_before") + col("__w") <= budget).as("kept"))
  }

  /** Shard-level output manifest: assign documents to ~`shardTokens`-
    * token output shards (the [[packOffsets]] two-phase prefix sum at
    * file granularity — shard k owns rows whose cumulative start
    * falls in [k·S, (k+1)·S), id order, no global sort), then emit
    * one audit row per shard: doc count, token total, the id range,
    * and a content checksum (sum of each member id's md5-derived
    * 32-bit word — order-independent exact integer arithmetic, so
    * any engine can re-derive and verify shard membership without
    * reading payloads). This is the reproducibility artifact a
    * training run stores next to its shards: "which documents, in
    * which file, verifiably".
    *
    * Consecutive shards partition the id order: ranges never overlap
    * and every shard except the last lands within one document of
    * its token target (documents are never split — that is ns24's
    * sequence-level job). Output: (shard_id, n_docs, n_tokens,
    * min_id, max_id, id_checksum). */
  def shardManifest(df: DataFrame, idCol: String, weightCol: String,
      shardTokens: Long): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    val checksum = conv(substring(md5(col(idCol).cast("string")),
      1, 8), 16, 10).cast("long")
    packOffsets(df, idCol, weightCol, shardTokens)
      .groupBy(col("pack_id").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("n_tokens"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(checksum).as("id_checksum"))
  }

  /** Weighted sampling WITHOUT replacement, content-addressed: the
    * Efraimidis–Spirakis (2006) one-pass scheme with the RNG replaced
    * by the repo's md5 hash — u = (first-8-hex(md5(id:salt)) + 0.5) /
    * 2^32 ∈ (0,1), priority ln(u)/w, keep the k largest. A row's
    * inclusion probability is proportional to its weight, yet the
    * realized sample is a pure function of (id, salt, weight): rerun,
    * repartition, engine, and corpus ORDER all wash out — the same
    * reproducibility contract as [[hashSplit]]/[[mixtureSample]],
    * extended to weighted-without-replacement.
    *
    * The priority is quantized ONCE to nano fixed-point (ns58's
    * proven idiom — both engines' libm ln agree bit-for-bit on this
    * host, and one round() makes the comparison integer), so the
    * top-k cut is deterministic with ties broken by id. Selection
    * plans as TakeOrdered: each partition ships at most k rows, never
    * a global sort — at 100 TB the cut costs one map pass plus a
    * k-row merge. Output: (idCol, weight, key_fp), the k winners. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val v = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long").cast("double")
    val u = (v + lit(0.5)) / lit(4294967296.0)
    val keyFp = round(log(u) / col(weightCol).cast("double") * 1e9)
      .cast("long")
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        keyFp.as("key_fp"))
      .orderBy(col("key_fp").desc, col(idCol))
      .limit(k)
  }

  /** EXACT stratified split: where [[hashSplit]] hits its fractions
    * only in expectation, this assigns per-group COUNTS exactly —
    * rank each group's rows by (content hash, id) and cut at
    * floor(f·n) boundaries, so every group lands within one row of
    * its target fraction and the whole assignment is still a pure
    * function of (id, salt). One shuffle on the group key (the rank
    * window) plus a broadcast of per-group totals; the rank is the
    * bounded ns18 window shape, NOT a global sort. Fractions are
    * (name, fraction) with sum ≤ 1; the remainder goes to `rest`.
    * Output: (idCol, groupCol, rn, split). */
  def stratifiedSplit(df: DataFrame, idCol: String, groupCol: String,
      salt: String, fractions: Seq[(String, Double)],
      rest: String = "test"): DataFrame = {
    require(fractions.nonEmpty &&
      fractions.forall { case (_, f) => f >= 0 && f <= 1 } &&
      fractions.map(_._2).sum <= 1.0 + 1e-9,
      "fractions must be in [0,1] and sum to at most 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt, 1000000), col(idCol))
    val ranked = df.select(col(idCol), col(groupCol))
      .withColumn("rn", row_number().over(w).cast("long"))
    val totals = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    // cumulative floor boundaries: split i covers
    // (floor(cum_{i-1}·n), floor(cum_i·n)]
    val cums = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail
    val split = fractions.zip(cums).reverse
      .foldLeft(lit(rest)) { case (els, ((name, _), cum)) =>
        when(col("rn") <= floor(lit(cum) * col("__n")), lit(name))
          .otherwise(els)
      }
    ranked.join(broadcast(totals), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("rn"), split.as("split"))
  }

  /** Deterministic multi-source interleave schedule — the dataloader
    * ordering that reads every source at its own proportion with no
    * RNG (smooth weighted round-robin): row r of a source with n_s
    * rows gets key floor((2r−1)·prec / n_s), i.e. the midpoint of
    * its 1/n_s-wide slot on a [0, 2·prec) axis, so sorting by
    * (interleave_key, groupCol, idCol) interleaves sources at their
    * size ratio — every prefix holds each source within ~±1 of its
    * proportional share (the law in NsSamplingSpec). Exact integer
    * floors, engine-reproducible; `prec` 10⁶ keeps 2r·prec below
    * 2⁶³ for any plausible per-source row count while key ties
    * (sub-1e-6 slot differences) break on (group, id).
    *
    * Plan shape: ONE exchange on the source key — rank and source
    * size are two window functions over the same partition; no
    * global sort is performed here (the key IS the order; a consumer
    * range-partitions by it to write shards). Output: (idCol,
    * groupCol, rank_in_source, n_source, interleave_key). */
  def interleaveSchedule(df: DataFrame, idCol: String,
      groupCol: String, prec: Long = 1000000L): DataFrame = {
    require(prec > 0, "prec must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .withColumn("n_source", count(lit(1)).over(wAll))
      .withColumn("interleave_key",
        expr(s"((2 * rank_in_source - 1) * ${prec}L) div n_source"))
  }

  /** Attention-segment table for packed sequences — the second half
    * of the packing contract: [[packOffsets]] lets a document SPAN
    * chunk boundaries (offsets are a pure prefix sum), so a trainer
    * consuming packed sequences needs, per pack, the list of
    * (document, in-pack offset, length) segments to reset attention
    * at document boundaries (the block-diagonal attention mask every
    * packed-SFT trainer builds). This derives that table from the
    * offsets alone — exact integer interval arithmetic, no second
    * pass over content: a doc occupying [start, start+n) intersects
    * packs floor(start/chunk) .. floor((start+n−1)/chunk), one
    * explode(sequence) over that (usually 1-element) range.
    *
    * Laws (NsSamplingSpec): per doc, segment lengths sum to its
    * length; per pack, segments tile [0, chunk) exactly (the final
    * pack tiles a prefix); zero-length docs emit no segments.
    *
    * Input: [[packOffsets]] output (idCol, lenCol, start_offset,
    * pack_id ignored). Output: (pack_id, idCol, seg_start, seg_len). */
  def packSegments(packed: DataFrame, idCol: String, lenCol: String,
      chunkSize: Long): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    packed.filter(col(lenCol) > 0)
      .select(col(idCol), col(lenCol).cast("long").as("__n"),
        col("start_offset"))
      .withColumn("__p0", expr(s"start_offset div ${chunkSize}L"))
      .withColumn("__p1",
        expr(s"(start_offset + __n - 1) div ${chunkSize}L"))
      .select(col(idCol), col("__n"), col("start_offset"),
        explode(sequence(col("__p0"), col("__p1"))).as("pack_id"))
      .select(col("pack_id"), col(idCol),
        (greatest(col("start_offset"), col("pack_id") * chunkSize) -
          col("pack_id") * chunkSize).as("seg_start"),
        (least(col("start_offset") + col("__n"),
          (col("pack_id") + 1) * chunkSize) -
          greatest(col("start_offset"), col("pack_id") * chunkSize))
          .as("seg_len"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling" — the
    * DCLM/DoReMi-era selection shape): estimate per-document
    * importance weights w(x) = p_target(x)/p_base(x) over HASHED
    * n-gram features (the [[TextOps.featureHash]] grid — ns98's
    * gated machinery; the paper hashes unigrams+bigrams, this
    * restatement hashes the unigram bag, a documented
    * simplification), then Gumbel-top-fraction sample so selection
    * follows the weights instead of a hard argmax.
    *
    * Determinism (every step the hash-gate recipe): per-CELL log
    * probabilities are add-one-smoothed ratios of exact longs,
    * quantized ONCE to nano units (floor(ln·1e9) — the ns58 libm-ln
    * idiom), so the per-doc log weight Σ cnt·(lt − lb) is exact
    * integer arithmetic; the Gumbel key is content-addressed (md5 →
    * exact uniform (h+0.5)/2³² → −ln(−ln u), each ln bit-stable on
    * identical double inputs, floored once to nano units) — no RNG,
    * rerun/partition/engine independent; and the keep cut is the
    * exact integer quantile of the key COARSENED to 2²⁴-nano
    * (~0.017 ln-unit) buckets — the ns92/ns172 grid machinery, no
    * global sort. Coarsening is what keeps the cut scale-honest:
    * raw nano keys are near-unique (a histogram over them would be
    * corpus-sized through one partition), while the bucketed
    * histogram is bounded by the KEY RANGE / 2²⁴ (a few hundred
    * thousand rows at any corpus size), and a boundary-bucket
    * all-or-nothing keep is well inside DSIR's own sampling
    * variance. Bucketing divides by a power of two, so the floor
    * is exact in both engines.
    *
    * Scale shape: features are one map-side explode + (id, cell)
    * count (ns98's bound: ≤ min(tokens, dim) rows per doc); the
    * cell table is ≤ dim rows and BROADCASTS; target-side counts
    * cost one pass over the (small) target corpus; the threshold is
    * a histogram over ≤ |distinct keys| cells. Docs whose canonical
    * text has no tokens carry no features and are dropped (no
    * evidence either way — the encodeDocs-vs-packing contrast).
    *
    * Output: (idCol, logw_nano, gumbel_nano, key_nano, selected). */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetIdCol: String, targetTextCol: String,
      dim: Int = 1024, keepFrac: Double = 0.3,
      salt: String = "dsir"): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "keepFrac must be in (0, 1)")
    val baseFeat = TextOps.featureHash(docs, idCol, textCol, dim)
    val targetFeat = TextOps.featureHash(target, targetIdCol,
      targetTextCol, dim)
    val baseCells = baseFeat.groupBy(col("cell"))
      .agg(sum(col("cnt")).as("__b"))
    val targetCells = targetFeat.groupBy(col("cell"))
      .agg(sum(col("cnt")).as("__t"))
    val totals = baseCells.agg(sum(col("__b")).as("__bt"))
      .crossJoin(targetCells.agg(sum(col("__t")).as("__tt")))
    // per-cell nano log probs, each quantized ONCE; absent target
    // cells smooth to count 0 (add-one keeps the ratio finite)
    val cellLr = baseCells
      .join(targetCells, Seq("cell"), "left")
      .crossJoin(broadcast(totals))
      .select(col("cell"),
        (floor(log((coalesce(col("__t"), lit(0L)).cast("double") + 1.0) /
            (col("__tt").cast("double") + dim.toDouble)) * 1e9)
          .cast("long") -
          floor(log((col("__b").cast("double") + 1.0) /
            (col("__bt").cast("double") + dim.toDouble)) * 1e9)
          .cast("long")).as("__lr"))
    val logw = baseFeat.join(broadcast(cellLr), Seq("cell"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("__lr")).as("logw_nano"))
    // content-addressed Gumbel perturbation on the SAME nano scale
    val h32 = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long")
    val u = (h32.cast("double") + 0.5) / 4294967296.0
    val keyed = logw.select(col(idCol), col("logw_nano"),
        floor(-log(-log(u)) * 1e9).cast("long").as("gumbel_nano"))
      .withColumn("key_nano", col("logw_nano") + col("gumbel_nano"))
    // exact integer quantile of the BUCKETED key — keep the top
    // keepFrac; 2^24 divides exactly (power of two), so the bucket
    // floor is bit-identical cross-engine even for negative keys
    val bucketed = keyed.withColumn("__kb",
      floor(col("key_nano").cast("double") / 16777216.0).cast("long"))
    val cutP = 1.0 - keepFrac
    val cut = graft.ns.Sketches.exactGridQuantiles(
        bucketed.withColumn("__g", lit("all")), Seq(col("__g")),
        "__kb", Seq(cutP), scale = 1L)
      .select(col(s"p${(cutP * 100).round}").cast("long").as("__cut"))
    bucketed.crossJoin(broadcast(cut))
      .select(col(idCol), col("logw_nano"), col("gumbel_nano"),
        col("key_nano"), (col("__kb") >= col("__cut")).as("selected"))
  }
}
