package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training data construction and training-order scheduling
  * (SURVEY.md §2.8 [NS] — no reference citation by definition: the
  * reference pipeline stops at curated corpora; these are the
  * operators the NEXT stage of a production LLM pipeline runs on
  * them).
  *
  * Two families:
  *
  *  - [[preferencePairs]]: turn scored generations into the
  *    (chosen, rejected) pair table DPO/RLHF reward modeling trains
  *    on. The pairing policy must be deterministic — a rerun that
  *    pairs differently silently changes the training distribution —
  *    so ties break on the candidate id, never on scan order.
  *  - [[curriculumPhases]]: assign every document an equal-size
  *    training phase from a quality ordering (curriculum learning's
  *    easy-to-hard schedule). Equal-size means EXACT global rank,
  *    which at scale must not be a global sort: this reuses the
  *    registry's two-phase prefix-sum idiom (ns69/ns80/ns116) —
  *    per-(score, id-bucket) local ranks plus a driver-side prefix
  *    over the bounded (score, bucket) summary.
  */
object Posttrain {

  /** DPO-style preference-pair construction from scored candidates:
    * within each prompt group, the top-scoring candidate (ties → the
    * smallest id — a total order, so the chosen one is unique and
    * rerun-stable) is `chosen`, and each of the next `maxPairs`
    * candidates whose reward trails by MORE than `minMargin` becomes
    * one (chosen, rejected) row. Strict inequality means a tied
    * candidate never forms a pair — a tie is not a preference.
    *
    * Plan shape: ONE window over the prompt key computes the rank,
    * the chosen id, and the chosen reward together (`first_value`
    * over the same sort — no self-join back onto the group), then a
    * map-side filter emits at most `maxPairs` rows per prompt. One
    * exchange total, output bounded by prompts × maxPairs; at 100 TB
    * of generations the shuffle carries each candidate row once.
    *
    * Output: (prompt_id, chosen_id, rejected_id, chosen_reward,
    * rejected_reward, pair_rank) — pair_rank 1-based in reward order.
    */
  def preferencePairs(df: DataFrame, promptCol: String, candIdCol: String,
      rewardCol: String, maxPairs: Int = 3,
      minMargin: Double = 0.0): DataFrame = {
    require(maxPairs >= 1, "maxPairs must be positive")
    require(minMargin >= 0.0, "minMargin must be non-negative")
    val w = Window.partitionBy(col(promptCol))
      .orderBy(col(rewardCol).desc, col(candIdCol))
    df.select(
        col(promptCol).as("prompt_id"),
        col(candIdCol).as("rejected_id"),
        col(rewardCol).as("rejected_reward"),
        row_number().over(w).cast("long").as("__rn"),
        first(col(candIdCol)).over(w).as("chosen_id"),
        first(col(rewardCol)).over(w).as("chosen_reward"))
      .filter(col("__rn").between(2L, maxPairs + 1L) &&
        col("chosen_reward") - col("rejected_reward") > minMargin)
      .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_reward"), col("rejected_reward"),
        (col("__rn") - 1L).as("pair_rank"))
  }

  /** Equal-size curriculum phases from an integer quality score:
    * rank every row in the (score DESC, id ASC) total order and cut
    * the order into `phases` contiguous blocks —
    * phase = floor(rank0 · P / N) — so phase 0 holds the
    * highest-quality ceil(N/P)-ish slice and phase P−1 the tail.
    * The easy-to-hard schedule a curriculum dataloader consumes
    * (Bengio et al. 2009), with "easy" = the corpus's own quality
    * signal.
    *
    * Exact global rank WITHOUT a global sort (the ns116 two-phase
    * shape): rows get a local row_number within their
    * (score, id div bucketSize) cell — a bounded keyed window — and
    * the per-cell totals, a summary of |distinct scores| × |id
    * buckets| longs (scoreCol's contract is a LOW-CARDINALITY
    * integer signal: quantized micro-unit logits, lengths, band
    * ids), are prefix-summed on the driver in (−score, bucket) order
    * and broadcast back. rank0 · P stays far below 2^63 for any
    * plausible P.
    *
    * Output: (idCol, scoreCol, rank, phase) — rank 1-based global,
    * phase in [0, phases). */
  def curriculumPhases(df: DataFrame, idCol: String, scoreCol: String,
      phases: Int, bucketSize: Long = 1000000L,
      maxSummaryCells: Long = 4000000L): DataFrame = {
    require(phases >= 1, "phases must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val withB = df
      .select(col(idCol), col(scoreCol).cast("long").as("__s"))
      .withColumn("__neg", -col("__s"))
      .withColumn("__ib", expr(s"$idCol div ${bucketSize}L"))
    val w = Window.partitionBy(col("__neg"), col("__ib"))
      .orderBy(col(idCol))
    val local = withB.withColumn("__local",
      row_number().over(w).cast("long") - 1L)
    // The low-cardinality-score contract, ENFORCED (round-11 verdict
    // item 3): the driver summary is |distinct scores| × |id buckets|
    // rows, and a high-cardinality score (e.g. an unquantized double
    // cast to micro-units per row) would silently grow it to corpus
    // size — a driver OOM at 100 TB. Count the aggregated frame (one
    // cluster-side job over the same exchange the collect reuses) and
    // fail as a contract error BEFORE collecting; callers pre-quantize
    // the score instead.
    val totalsDf = withB.groupBy(col("__neg"), col("__ib"))
      .agg(count(lit(1)).as("__tot"), min(col(idCol)).as("__mn"))
    val cells = totalsDf.count()
    require(cells <= maxSummaryCells,
      s"curriculumPhases summary would hold $cells (score, bucket) " +
        s"cells > maxSummaryCells=$maxSummaryCells — quantize " +
        s"$scoreCol to fewer distinct values or raise bucketSize")
    val totals = totalsDf
      .collect().map { r =>
        require(!r.isNullAt(r.fieldIndex("__neg")) &&
          !r.isNullAt(r.fieldIndex("__mn")),
          s"curriculumPhases requires non-null $scoreCol and $idCol")
        require(r.getLong(r.fieldIndex("__mn")) >= 0,
          s"curriculumPhases needs non-negative $idCol")
        (r.getLong(r.fieldIndex("__neg")),
          r.getLong(r.fieldIndex("__ib")),
          r.getLong(r.fieldIndex("__tot")))
      }
    var acc = 0L
    val prefixRows = totals.sortBy(t => (t._1, t._2)).toSeq.map {
      case (neg, ib, tot) => val p = acc; acc += tot; (neg, ib, p)
    }
    val n = acc
    val prefix = broadcast(prefixRows.toDF("__neg", "__ib", "__prefix"))
    local.join(prefix, Seq("__neg", "__ib"))
      .withColumn("__rank0", col("__prefix") + col("__local"))
      .select(col(idCol), col("__s").as(scoreCol),
        (col("__rank0") + 1L).as("rank"),
        expr(s"(__rank0 * ${phases}L) div ${n}L").cast("long")
          .as("phase"))
  }

  /** Group-relative advantage over scored generations — the GRPO
    * normalization (group-relative policy optimization: advantage of
    * a candidate = its reward standardized against its own prompt
    * group's mean and std, no learned value baseline) plus best-of-n
    * selection in the same pass. The dq03 determinism recipe: rewards
    * quantize to cent longs once, per-group (n, Σ, Σ²) are exact
    * integer sums, mean/var/z are a fixed-operand-order IEEE dag
    * (sqrt is correctly rounded, hence bit-stable), and degenerate
    * groups (var ≤ 0, incl. n = 1) get advantage 0 — the standard
    * GRPO guard, not NaN.
    *
    * Plan shape: ONE exchange on the prompt key — the group stats
    * come from window aggregates sharing the candidate sort, so no
    * join-back; best_rank rides the same window. Output:
    * (prompt_id, cand_id, reward_cents, n_group, advantage,
    * best_rank) — best_rank 1 = the best-of-n winner. */
  def groupAdvantage(df: DataFrame, promptCol: String,
      candIdCol: String, rewardCol: String): DataFrame = {
    val wAll = Window.partitionBy(col("prompt_id"))
    val wOrd = Window.partitionBy(col("prompt_id"))
      .orderBy(col("__c").desc, col("cand_id"))
    val base = df.select(col(promptCol).as("prompt_id"),
      col(candIdCol).as("cand_id"),
      round(col(rewardCol) * 100).cast("long").as("__c"))
    val stats = base
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s1", sum(col("__c")).over(wAll))
      .withColumn("__s2", sum(col("__c") * col("__c")).over(wAll))
      .withColumn("__var",
        (col("__s2").cast("double") -
          col("__s1").cast("double") * col("__s1") / col("__n")) /
          col("__n"))
      .withColumn("__mean",
        col("__s1").cast("double") / col("__n").cast("double"))
    stats.select(col("prompt_id"), col("cand_id"),
      col("__c").as("reward_cents"),
      col("__n").as("n_group"),
      when(col("__var") <= 0d, lit(0.0))
        .otherwise((col("__c").cast("double") - col("__mean")) /
          sqrt(col("__var"))).as("advantage"),
      row_number().over(wOrd).cast("long").as("best_rank"))
  }

  /** Inter-annotator agreement — Cohen's kappa per rater pair
    * (Cohen 1960): the labeling-QA number a post-training data
    * pipeline computes before trusting human (or judge-model)
    * labels. For each unordered rater pair, over the items BOTH
    * rated: observed agreement po = agree/n, chance agreement
    * pe = Σ_k P_A(k)·P_B(k) from the pair's own marginals, and
    * kappa = (po − pe)/(1 − pe); kappa is 0 when pe = 1 (both
    * marginals degenerate — agreement is indistinguishable from
    * chance, and the standard estimator is 0/0).
    *
    * Determinism: n, agree, and chance = Σ_k cA_k·cB_k are exact
    * integers; po, pe are each one IEEE division (pe's denominator
    * the exact product n·n), and kappa one fixed subtract/divide
    * dag — bit-stable in any engine, no tolerance needed.
    *
    * Scale shape: the item-keyed self-join emits r(r−1)/2 rows per
    * item (r = raters per item, a small constant), then everything
    * reduces to per-(pair) and per-(pair, label) aggregates —
    * map-combinable, output bounded by rater-pairs × labels. No
    * all-pairs product over items, no window.
    * Output: (rater_a, rater_b, n_items, agree, po, pe, kappa). */
  def annotatorAgreement(df: DataFrame, itemCol: String,
      raterCol: String, labelCol: String): DataFrame = {
    val a = df.select(col(itemCol).as("__it"),
      col(raterCol).as("rater_a"), col(labelCol).as("__la"))
    val b = df.select(col(itemCol).as("__it"),
      col(raterCol).as("rater_b"), col(labelCol).as("__lb"))
    val pairs = a.join(b, Seq("__it"))
      .filter(col("rater_a") < col("rater_b"))
    val base = pairs.groupBy(col("rater_a"), col("rater_b"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__la") === col("__lb"), 1L).otherwise(0L))
          .as("agree"))
    val cA = pairs.groupBy(col("rater_a"), col("rater_b"),
        col("__la").as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cB = pairs.groupBy(col("rater_a"), col("rater_b"),
        col("__lb").as("__k"))
      .agg(count(lit(1)).as("__cb"))
    val chance = cA.join(cB, Seq("rater_a", "rater_b", "__k"))
      .groupBy(col("rater_a"), col("rater_b"))
      .agg(sum(col("__ca") * col("__cb")).as("__chance"))
    base.join(chance, Seq("rater_a", "rater_b"))
      .select(col("rater_a"), col("rater_b"), col("n_items"),
        col("agree"),
        (col("agree").cast("double") / col("n_items").cast("double"))
          .as("po"),
        (col("__chance").cast("double") /
          (col("n_items").cast("double") * col("n_items").cast("double")))
          .as("pe"))
      .select(col("rater_a"), col("rater_b"), col("n_items"),
        col("agree"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(0.0)).as("kappa"))
  }

  /** Conversation-level quality gates — the SFT corpus's Gopher:
    * document gates cannot see TURN-STRUCTURE defects, and a trainer
    * fed a conversation that opens with the assistant, repeats a
    * role back-to-back, or carries empty turns learns the template
    * wrong. Battery (each a named count/flag so a datasheet can
    * report WHY a conversation dropped, the ns129 convention):
    * turn count, consecutive-same-role violations, empty-content
    * turns, opens-with-user, closes-with-assistant; `keep` is the
    * conjunction (≥ 2 turns, zero violations, zero empties, right
    * endpoints). One conversation-keyed exchange: a lag window for
    * adjacency plus min/max-(turn, role) structs for the endpoints,
    * both over template-bounded turn counts.
    * Output: (convCol, n_turns, n_violations, n_empty,
    * starts_with_user, ends_with_assistant, keep). */
  def conversationQuality(turns: DataFrame, convCol: String,
      turnCol: String, roleCol: String,
      contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col("__turn"))
    val flagged = turns
      .select(col(convCol), col(turnCol).cast("long").as("__turn"),
        col(roleCol).as("__role"),
        coalesce(col(contentCol), lit("")).as("__c"))
      .withColumn("__prev", lag(col("__role"), 1).over(w))
      .withColumn("__viol",
        when(col("__prev").isNotNull &&
          col("__prev") === col("__role"), 1L).otherwise(0L))
      .withColumn("__empty",
        when(length(trim(col("__c"))) === 0, 1L).otherwise(0L))
    flagged.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("__viol")).as("n_violations"),
        sum(col("__empty")).as("n_empty"),
        min(struct(col("__turn"), col("__role"))).as("__first"),
        max(struct(col("__turn"), col("__role"))).as("__last"))
      .select(col(convCol), col("n_turns"), col("n_violations"),
        col("n_empty"),
        (col("__first.__role") === "user").as("starts_with_user"),
        (col("__last.__role") === "assistant").as("ends_with_assistant"))
      .withColumn("keep",
        col("n_turns") >= 2 && col("n_violations") === 0 &&
          col("n_empty") === 0 && col("starts_with_user") &&
          col("ends_with_assistant"))
  }

  /** Token-aligned SFT assembly — the step that turns a curated chat
    * corpus into what a dataloader actually reads: every turn renders
    * into the deterministic template `<|role|>content<|end|>` (the
    * [[graft.ops.Sessionize.chatTurnOffsets]] convention, here in
    * TOKEN space instead of char space), encodes to BPE ids with the
    * checked-in [[Bpe]] codec, and emits one row per TOKEN carrying
    * its global position in the conversation's token stream and the
    * per-token LOSS flag (true exactly on assistant-turn tokens — the
    * mask an SFT trainer multiplies into the cross-entropy).
    *
    * Why per-turn encoding concatenates losslessly: BPE pre-tokens
    * are letter runs, digit runs, or single marks, and whitespace
    * never tokenizes — since every rendered turn ends in `>` (a
    * single mark), no pre-token can span a turn boundary, so
    * concat(encode(turn_i)) ≡ encode(concat(turns)) exactly
    * (PosttrainPrivacySpec pins this law on real fixture text). That
    * equivalence is what lets token offsets be one prefix-sum window
    * per conversation instead of a conversation-level re-encode: the
    * rendered conversation never materializes.
    *
    * Plan shape: encode is map-side (broadcast codec, per-partition
    * batches — the [[Bpe.encodeDocs]] shape, keyed by (conversation,
    * turn)); the only exchange is the conversation-keyed window for
    * the token-offset prefix sums, partitioned by conversation id —
    * turn counts are template-bounded, so the window's state is tiny
    * and the shuffle is one row per TURN (arrays unexploded), never
    * one per token. posexplode fans out AFTER the window.
    *
    * Output: (convCol, turnCol, tok_pos, token_id, loss) — tok_pos
    * 0-based and contiguous per conversation; the per-turn spans
    * [start, start + n_turn_tokens) tile [0, n_conv_tokens) exactly
    * in turn order. */
  def sftTokenMask(turns: DataFrame, convCol: String, turnCol: String,
      roleCol: String, contentCol: String,
      c: Bpe.Codec = Bpe.default, batchSize: Int = 64): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    val rendered = turns.select(
        col(convCol).cast("long"), col(turnCol).cast("long"),
        concat(lit("<|"), col(roleCol), lit("|>"),
          coalesce(col(contentCol), lit("")), lit("<|end|>")),
        col(roleCol) === "assistant")
      .as[(Long, Long, String, Boolean)]
    val enc = rendered.mapPartitions { it =>
      val cod = bc.value
      it.grouped(batchSize).flatMap(_.map { case (cid, t, text, loss) =>
        (cid, t, Bpe.encode(text, cod), loss)
      })
    }.toDF(convCol, turnCol, "__ids", "loss")
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    enc
      .withColumn("__start",
        coalesce(sum(size(col("__ids"))).over(w), lit(0))
          .cast("long"))
      .select(col(convCol), col(turnCol), col("__start"), col("loss"),
        posexplode(col("__ids")).as(Seq("__pos", "token_id")))
      .select(col(convCol), col(turnCol),
        (col("__start") + col("__pos")).cast("long").as("tok_pos"),
        col("token_id").cast("long").as("token_id"), col("loss"))
  }
}
