package graft

import org.apache.spark.sql.functions._

import graft.ns.{Posttrain, Privacy}

/** Laws for the post-training pair/schedule operators and the
  * k-anonymity release audit (ns142/ns143/ns144). */
class PosttrainPrivacySpec extends SparkSpec {
  import spark.implicits._

  // (prompt, candidate, reward): prompt 1 has a reward tie at the
  // top (cands 10/11 both 5.0 — the chosen must be the smaller id
  // and the tied one must NOT pair), prompt 2 has 5 candidates
  // (maxPairs must cap), prompt 3 is a singleton (no pairs).
  private def cands = Seq(
    (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 3.0), (1L, 13L, 1.0),
    (2L, 20L, 9.0), (2L, 21L, 8.0), (2L, 22L, 7.0), (2L, 23L, 6.0),
    (2L, 24L, 5.0),
    (3L, 30L, 2.0)
  ).toDF("prompt", "cand", "reward")

  test("preferencePairs: chosen is the (reward desc, id) head; strict margin; capped") {
    val out = Posttrain.preferencePairs(cands, "prompt", "cand", "reward",
      maxPairs = 2, minMargin = 0.0)
      .orderBy("prompt_id", "pair_rank").collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getLong(5)))
    // prompt 1: chosen = 10 (tie broken by id); cand 11 ties at 5.0
    // so it is rank 2 but margin 0 is NOT > 0 — excluded; cand 12 is
    // rank 3 = pair_rank 2 and pairs.
    assert(rows.filter(_._1 == 1L).toSeq ===
      Seq((1L, 10L, 12L, 5.0, 3.0, 2L)))
    // prompt 2: exactly maxPairs pairs, best rejected first
    assert(rows.filter(_._1 == 2L).toSeq ===
      Seq((2L, 20L, 21L, 9.0, 8.0, 1L), (2L, 20L, 22L, 9.0, 7.0, 2L)))
    // prompt 3: singleton emits nothing
    assert(!rows.exists(_._1 == 3L))
    // global law: every pair strictly prefers chosen
    assert(rows.forall(r => r._4 > r._5))
  }

  test("preferencePairs: minMargin excludes close pairs") {
    val out = Posttrain.preferencePairs(cands, "prompt", "cand", "reward",
      maxPairs = 4, minMargin = 1.5)
      .select("prompt_id", "rejected_id").as[(Long, Long)].collect().toSet
    // prompt 2: 9.0 vs 8.0 (margin 1.0) excluded; 7.0 onward kept
    assert(out === Set((1L, 12L), (1L, 13L), (2L, 22L), (2L, 23L),
      (2L, 24L)))
  }

  test("curriculumPhases equals the global-sort oracle") {
    // scores with heavy duplication across id buckets (bucketSize 4
    // forces multi-bucket cells)
    val rows = (0L until 40L).map(i => (i, (i % 5) * 1000L))
    val df = rows.toDF("id", "score")
    val out = Posttrain.curriculumPhases(df, "id", "score",
      phases = 4, bucketSize = 4L)
      .select("id", "rank", "phase").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val expectRank = rows.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val n = rows.size
    out.foreach { case (id, rank, phase) =>
      assert(rank === expectRank(id), s"rank of $id")
      assert(phase === (rank - 1) * 4 / n, s"phase of $id")
    }
    // equal-size law: phase sizes differ by at most 1
    val sizes = out.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("curriculumPhases: high-cardinality scores fail the summary " +
      "bound as a contract error, not a silent driver collect") {
    // every row a distinct score => cells = rows > maxSummaryCells
    val df = (0L until 64L).map(i => (i, i * 7L)).toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      Posttrain.curriculumPhases(df, "id", "score", phases = 4,
        bucketSize = 4L, maxSummaryCells = 16L).collect()
    }
    assert(e.getMessage.contains("maxSummaryCells"))
    // and the same data passes once quantized below the bound
    // (scores collapse to one level => cells = 16 id buckets)
    val q = df.withColumn("score", expr("(score div 1000) * 1000"))
    val ok = Posttrain.curriculumPhases(q, "id", "score", phases = 4,
      bucketSize = 4L, maxSummaryCells = 16L)
    assert(ok.count() === 64L)
  }

  // QI fixture: fine class = (t, day, b10), coarse = (t, b50).
  // Type "a" day-1 decade-0 has 4 rows (level 0 at k=4); type "b"
  // rows are spread one per day (all escalate) but share a coarse
  // class of 5 (level 1); type "c" is a 2-row rarity that stays
  // below k even coarsened (suppressed).
  private def events = (
    (1L to 4L).map(i => (i, "a", s"2024-01-01 0$i:00:00", 5.0)) ++
    (1L to 5L).map(i => (10L + i, "b", s"2024-01-0$i 01:00:00", 7.0)) ++
    Seq((21L, "c", "2024-01-01 01:00:00", 9.0),
        (22L, "c", "2024-01-02 01:00:00", 9.0))
  ).toDF("event_id", "event_type", "ts_s", "value")
    .withColumn("ts", col("ts_s").cast("timestamp"))

  private def audit = Privacy.kAnonymityLevels(
    events, "event_id",
    qi0 = Seq(
      "event_type" -> col("event_type"),
      "qi_day" -> date_trunc("day", col("ts")),
      "band10" -> floor(col("value") / 10)),
    qi1 = Seq(
      "qi1_type" -> col("event_type"),
      "band50" -> floor(col("value") / 50)),
    k = 4)

  test("groupAdvantage: hand-computed standardization, best-of-n " +
      "rank, degenerate-group guard") {
    // prompt 1: rewards 1.00, 2.00, 3.00 -> cents 100/200/300
    // mean 200, var = ((100-200)^2+0+ (300-200)^2)/3 = 20000/3
    // prompt 2: constant rewards -> var 0 -> advantage 0, not NaN
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0),
      (2L, 20L, 5.0), (2L, 21L, 5.0)).toDF("p", "c", "r")
    val out = Posttrain.groupAdvantage(df, "p", "c", "r")
      .as[(Long, Long, Long, Long, Double, Long)].collect()
      .map(x => x._2 -> x).toMap
    val std = math.sqrt(20000.0 / 3.0)
    assert(out(10L)._5 == (100.0 - 200.0) / std)
    assert(out(11L)._5 == 0.0)
    assert(out(12L)._5 == (300.0 - 200.0) / std)
    // best-of-n: highest reward ranks 1; ties break on candidate id
    assert(out(12L)._6 == 1L && out(11L)._6 == 2L && out(10L)._6 == 3L)
    assert(out(20L)._5 == 0.0 && out(21L)._5 == 0.0)
    assert(out(20L)._6 == 1L && out(21L)._6 == 2L)
    assert(out.values.forall(_._4 > 0))
  }

  test("annotatorAgreement: hand-computed kappa, perfect and " +
      "degenerate endpoints") {
    import spark.implicits._
    // items 1-4: A and B agree on 3 of 4; marginals A: 3T/1F,
    // B: 2T/2F → pe = (3·2 + 1·2)/16 = 0.5, po = 0.75, kappa = 0.5
    val df = Seq(
      (1L, "A", true), (1L, "B", true),
      (2L, "A", true), (2L, "B", true),
      (3L, "A", true), (3L, "B", false),
      (4L, "A", false), (4L, "B", false)).toDF("item", "rater", "label")
    val out = Posttrain.annotatorAgreement(df, "item", "rater", "label")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect()
    assert(out.length == 1)
    val (ra, rb, n, agree, po, pe, kappa) = out.head
    assert(ra == "A" && rb == "B" && n == 4L && agree == 3L)
    assert(po == 0.75 && pe == 0.5 && kappa == 0.5, out.head.toString)
    // perfect agreement with mixed marginals → kappa 1
    val perfect = Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", false), (2L, "B", false)).toDF("item", "rater", "label")
    val pk = Posttrain.annotatorAgreement(perfect, "item", "rater",
      "label").select(col("kappa")).as[Double].head()
    assert(pk == 1.0)
    // degenerate marginals (both raters always true): pe = 1 → the
    // 0/0 estimator is pinned to 0, not NaN
    val degen = Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", true), (2L, "B", true)).toDF("item", "rater", "label")
    val dk = Posttrain.annotatorAgreement(degen, "item", "rater",
      "label").select(col("kappa")).as[Double].head()
    assert(dk == 0.0 && !dk.isNaN)
    // an item rated by only one rater contributes to no pair
    val partial = Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", true)).toDF("item", "rater", "label")
    val pn = Posttrain.annotatorAgreement(partial, "item", "rater",
      "label").select(col("n_items")).as[Long].head()
    assert(pn == 1L)
  }

  test("annotatorAgreement: noisier raters score lower kappa on the " +
      "registry's synthetic panel") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
    val base = docs.select(col("doc_id"),
      (graft.ns.TextOps.linearLogitCol(col("text")) > 0).as("__keep"))
    val rated = base.select(col("doc_id"), col("__keep"),
      explode(array(lit("r1"), lit("r2"), lit("r3"))).as("rater"))
    val noise = conv(substring(md5(concat(col("doc_id"), lit(":"),
      col("rater"))), 1, 2), 16, 10).cast("long")
    val thr = when(col("rater") === "r1", 16L)
      .when(col("rater") === "r2", 48L).otherwise(96L)
    val k = Posttrain.annotatorAgreement(
      rated.select(col("doc_id"), col("rater"),
        (col("__keep") =!= (noise < thr)).as("label")),
      "doc_id", "rater", "label")
      .select(col("rater_a"), col("rater_b"), col("kappa"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // r3 is the noisiest: every pair containing it scores below the
    // cleanest pair (r1, r2)
    assert(k(("r1", "r2")) > k(("r1", "r3")) &&
      k(("r1", "r2")) > k(("r2", "r3")), k.toString)
    assert(k.values.forall(v => v > 0.0 && v < 1.0), k.toString)
  }

  test("kAnonymityLevels: ladder levels land as planted") {
    val byType = audit.select("event_type", "level", "kept")
      .as[(String, Long, Boolean)].collect().groupBy(_._1)
    assert(byType("a").forall(r => r._2 == 0L && r._3))
    assert(byType("b").forall(r => r._2 == 1L && r._3))
    assert(byType("c").forall(r => r._2 == -1L && !r._3))
  }

  test("kAnonymityLevels: released classes are k-anonymous, n1 only on escalation") {
    val rows = audit.collect()
    val k = 4L
    // level-0 releases: fine class has >= k members
    rows.filter(_.getAs[Long]("level") == 0L)
      .foreach(r => assert(r.getAs[Long]("n0") >= k))
    // level-1 releases: coarse class among ESCALATED rows has >= k
    rows.filter(_.getAs[Long]("level") == 1L)
      .foreach(r => assert(r.getAs[Long]("n0") < k &&
        r.getAs[Long]("n1") >= k))
    // suppressed: below k at both granularities
    rows.filter(_.getAs[Long]("level") == -1L)
      .foreach(r => assert(r.getAs[Long]("n0") < k &&
        r.getAs[Long]("n1") < k))
    // n1 is null exactly when the row never escalated
    rows.foreach(r => assert(r.isNullAt(r.fieldIndex("n1")) ===
      (r.getAs[Long]("n0") >= k)))
  }

  test("kAnonymityLevels: level-1 counts exclude level-0 releases") {
    // Make the "a" coarse class overlap "b"'s: if level-1 counted
    // ALL rows, a 3-row "d" class coarsening onto "a"'s band would
    // reach 4+3 >= k and leak; counting escalated-only keeps it at 3.
    val withD = events.unionByName(Seq(
      (31L, "d", "2024-01-01 01:00:00", 5.0),
      (32L, "d", "2024-01-02 01:00:00", 5.0),
      (33L, "d", "2024-01-03 01:00:00", 5.0))
      .toDF("event_id", "event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")))
    // coarse key here is (type, band50) so "d" cannot borrow "a"'s
    // rows anyway; drop type from the coarse key to force overlap
    val out = Privacy.kAnonymityLevels(
      withD, "event_id",
      qi0 = Seq(
        "event_type" -> col("event_type"),
        "qi_day" -> date_trunc("day", col("ts")),
        "band10" -> floor(col("value") / 10)),
      qi1 = Seq("band50" -> floor(col("value") / 50)),
      k = 4)
    val d = out.filter(col("event_type") === "d")
      .select("level").as[Long].collect()
    // "a" (4 rows, band50 = 0) released at level 0; the 3 "d" rows
    // coarsen onto band50 = 0 but only escalated rows count: 3 < 4.
    // (b=7.0 and c=9.0 share band50 = 0 too: 5 b-rows + 2 c-rows +
    // 3 d-rows = 10 escalated rows in band 0 — so drop b and c to
    // keep the band pure... instead assert via n1 directly.)
    val dn1 = out.filter(col("event_type") === "d")
      .select("n1").as[Long].collect()
    // escalated rows in band50=0: 5 (b) + 2 (c) + 3 (d) = 10 — but
    // NOT the 4 released "a" rows; n1 must be exactly 10, not 14.
    assert(dn1.toSet === Set(10L))
    assert(d.toSet === Set(1L))
  }

  test("conversationQuality: each battery column fires on exactly " +
      "its defect class; clean conversations keep") {
    val turns = Seq(
      // conv 1: clean two-turn
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
      // conv 2: opens with assistant
      (2L, 0L, "assistant", "hi"), (2L, 1L, "user", "ok"),
      // conv 3: consecutive assistant turns (still ends assistant)
      (3L, 0L, "user", "hi"), (3L, 1L, "assistant", "a"),
      (3L, 2L, "assistant", "b"),
      // conv 4: whitespace-only user turn
      (4L, 0L, "user", "   "), (4L, 1L, "assistant", "x"),
      // conv 5: singleton user turn (too short, wrong close)
      (5L, 0L, "user", "alone"))
      .toDF("conv", "turn_idx", "role", "content")
    val out = Posttrain.conversationQuality(turns, "conv",
      "turn_idx", "role", "content")
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 0L, 0L, true, true, true)))
    assert(out(2L) == ((2L, 2L, 0L, 0L, false, false, false)))
    assert(out(3L) == ((3L, 3L, 1L, 0L, true, true, false)))
    assert(out(4L) == ((4L, 2L, 0L, 1L, true, true, false)))
    assert(out(5L) == ((5L, 1L, 0L, 0L, true, false, false)))
  }

  test("sftTokenMask: per-turn spans tile the conversation token " +
      "stream, and per-turn encoding equals whole-conversation " +
      "encoding on real fixture text") {
    val docs = Tables(spark, sf, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    // two-turn conversations in the chat-fixture shape: user content
    // from the doc text, assistant reply keyed by id
    val turns = docs.select(col("doc_id").as("conv"),
        lit(0L).as("turn_idx"), lit("user").as("role"),
        col("text").as("content"))
      .unionByName(docs.select(col("doc_id").as("conv"),
        lit(1L).as("turn_idx"), lit("assistant").as("role"),
        concat(lit("ok "), col("doc_id").cast("string")).as("content")))
    val out = Posttrain.sftTokenMask(turns, "conv", "turn_idx",
      "role", "content")
    val rows = out.select(col("conv"), col("turn_idx"), col("tok_pos"),
        col("token_id"), col("loss"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val byConv = rows.groupBy(_._1)
    val texts = docs.as[(Long, String)].collect().toMap
    byConv.foreach { case (conv, rs) =>
      // spans tile: tok_pos is exactly 0..n-1, turn 0's positions all
      // precede turn 1's, and loss is true exactly on turn-1 tokens
      val positions = rs.map(_._3).sorted
      assert(positions.sameElements(0L until rs.length),
        s"conv $conv: positions do not tile the stream")
      val maxT0 = rs.filter(_._2 == 0L).map(_._3).max
      val minT1 = rs.filter(_._2 == 1L).map(_._3).min
      assert(maxT0 < minT1, s"conv $conv: turn spans interleave")
      assert(rs.forall(r => r._5 == (r._2 == 1L)),
        s"conv $conv: loss flag drifts from the assistant turn")
      // per-turn ≡ whole-conversation: the id stream in tok_pos order
      // equals one encode of the concatenated rendered conversation
      val whole = graft.ns.Bpe.encode(
        s"<|user|>${texts(conv)}<|end|>" +
          s"<|assistant|>ok $conv<|end|>", graft.ns.Bpe.default)
      val streamed = rs.sortBy(_._3).map(_._4.toInt)
      assert(streamed.sameElements(whole),
        s"conv $conv: per-turn concat diverges from whole-render encode")
    }
  }
}
