package graft

import org.apache.spark.sql.functions._

import graft.ns.Sampling

class NsSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val fractions =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("lengthBatches: two-phase rank equals one global window; " +
      "max_len non-increasing; repartition-stable") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(graft.ns.TextOps.wordTokens(col("text")))
          .cast("long").as("n_words"))
    val got = Sampling.lengthBatches(docs, "doc_id", "n_words",
      batchSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.nonEmpty)
    // reference: ONE global window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_words").desc, col("doc_id").asc)
    val ref = docs
      .withColumn("rk", row_number().over(w).cast("long") - 1L)
      .withColumn("batch_id", expr("rk div 16L"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_words")).as("max_len"),
        sum(col("n_words")).as("sum_len"))
      .select(col("batch_id"), col("n_docs"), col("max_len"),
        col("sum_len"),
        (col("n_docs") * col("max_len") - col("sum_len"))
          .as("padding_waste"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == ref, "two-phase must equal the global window")
    // length-sorted batches: max_len never increases with batch_id
    got.map(_._3).sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b, s"max_len must be non-increasing: $a then $b")
    case _ => () }
    val re = Sampling.lengthBatches(docs.repartition(7), "doc_id",
      "n_words", batchSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got, "layout must be partition-independent")
  }

  test("hashSplit: disjoint-exhaustive labels near declared fractions") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val split = Sampling.hashSplit(d.select(col("doc_id")),
      "doc_id", "v1", fractions)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = d.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n.toLong) // every row labeled once
    // md5 buckets are uniform; 500 rows → sd(train share) ≈ 1.8%
    assert(math.abs(counts("train") / n - 0.8) < 0.08,
      s"train share ${counts("train") / n}")
  }

  test("hashSplit: content-addressed — stable under subsetting and rerun") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    def labels(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSplit(df.select(col("doc_id")), "doc_id", "v1",
        fractions)
        .select(col("doc_id"), col("split"))
        .as[(Long, String)].collect().toMap
    val full = labels(d)
    val subset = labels(d.filter(col("doc_id") % 3 === 0))
    // THE property a random split cannot give: a row's assignment
    // depends only on its identity, so subsetting/growing the corpus
    // never relabels surviving rows (no eval-set leakage on reruns)
    subset.foreach { case (id, s) => assert(full(id) == s) }
    assert(labels(d) == full) // rerun-deterministic
  }

  test("hashSplit: changing the salt re-deals assignments") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val a = Sampling.hashSplit(d.select(col("doc_id")), "doc_id", "v1",
      fractions).select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    val b = Sampling.hashSplit(d.select(col("doc_id")), "doc_id", "v2",
      fractions).select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(a != b)
  }

  test("mixtureSample: realized rates track targets, stable on rerun") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))
    def run() = Sampling.mixtureSample(d, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.25), defaultRate = 0.0,
      salt = "t1")
    val kept = run().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val tot = d.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(kept("src0") == tot("src0"))          // rate 1.0 keeps all
    assert(!kept.contains("src2"))               // default 0.0 drops all
    val share = kept("src1").toDouble / tot("src1")
    assert(math.abs(share - 0.25) < 0.15, s"src1 share $share")
    // content-addressed: identical keep set on rerun
    assert(run().select("doc_id").as[Long].collect().sorted
      .sameElements(run().select("doc_id").as[Long].collect().sorted))
  }

  test("temperatureMixRates: sqrt weighting, sums to 1, upweights tails") {
    // planted power-law: 100/25/4/1 rows → √n = 10/5/2/1, Σ = 18
    val d = ((1 to 100).map(i => (i.toLong, "big")) ++
      (1 to 25).map(i => (1000L + i, "mid")) ++
      (1 to 4).map(i => (2000L + i, "small")) ++
      Seq((3001L, "tiny"))).toDF("doc_id", "source")
    val r = Sampling.temperatureMixRates(d, "source")
      .as[(String, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("big") == (("big", 100L, 10.0 / 18)))
    assert(r("mid") == (("mid", 25L, 5.0 / 18)))
    assert(r("small") == (("small", 4L, 2.0 / 18)))
    assert(r("tiny") == (("tiny", 1L, 1.0 / 18)))
    assert(math.abs(r.values.map(_._3).sum - 1.0) < 1e-12)
    // the point of temperature: tiny's share rises vs proportional
    // (1/130 → 1/18), big's falls (100/130 → 10/18)
    assert(r("tiny")._3 > 1.0 / 130 && r("big")._3 < 100.0 / 130)
  }

  test("temperatureMixRates feeds mixtureSample (composition law)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))
    val rates = Sampling.temperatureMixRates(d, "source")
      .as[(String, Long, Double)].collect()
      .map(x => x._1 -> x._3).toMap // bounded by the source count
    val kept = Sampling.mixtureSample(d, "doc_id", "source", rates,
      defaultRate = 0.0, salt = "t2")
    // every source survives at its (nonzero) temperature rate, and
    // the realized corpus-wide keep share tracks Σ n_s · rate_s
    val expected = d.groupBy("source").count()
      .as[(String, Long)].collect()
      .map { case (s, n) => n * rates(s) }.sum
    val got = kept.count().toDouble
    assert(math.abs(got - expected) / expected < 0.35,
      s"kept $got vs expected $expected")
  }

  test("packOffsets: contiguous global offsets, bucket-boundary exact") {
    // bucketSize 3 forces multiple buckets; weights chosen so pack
    // boundaries land mid-bucket and across buckets
    val d = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L))
      .toDF("id", "w")
    val out = Sampling.packOffsets(d, "id", "w",
      chunkSize = 6, bucketSize = 3)
      .orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // concat order 0..4, each 4 wide: starts 0,4,8,12,16; chunk 6 →
    // packs 0,0,1,2,2
    assert(out == Seq((0L, 4L, 0L, 0L), (1L, 4L, 4L, 0L),
      (2L, 4L, 8L, 1L), (3L, 4L, 12L, 2L), (4L, 4L, 16L, 2L)))
  }

  test("pseudoShuffle: exact permutation, salt-sensitive, no global sort") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"))
    val n = d.count()
    val out = Sampling.pseudoShuffle(d, "doc_id", "s1", buckets = 7)
    assert(!out.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"),
      "pseudoShuffle must not plan a single-partition window")
    val ranks = out.select("shuffle_rank").as[Long].collect().sorted
    assert(ranks.sameElements(1L to n))     // exact permutation 1..N
    // content-addressed: rerun identical; new salt re-deals
    def perm(salt: String) =
      Sampling.pseudoShuffle(d, "doc_id", salt, buckets = 7)
        .orderBy("shuffle_rank").select("doc_id").as[Long].collect().toSeq
    assert(perm("s1") == perm("s1"))
    assert(perm("s1") != perm("s2"))
  }

  test("packOffsets plans no single-partition exchange") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val out = Sampling.packOffsets(d, "doc_id", "n_chars",
      chunkSize = 2048, bucketSize = 100L)
    // the whole point of the two-phase prefix: the global cumsum must
    // NOT funnel every row through one reducer
    assert(!out.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"),
      "packOffsets must not plan a single-partition global window")
    // and offsets are still globally consistent: sorted by doc_id,
    // each start equals the previous start + previous weight
    val rows = out.orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((_, w1, s1, _), (_, _, s2, _)) => assert(s2 == s1 + w1)
      case _ => ()
    }
  }

  test("groupQuota: no group exceeds the cap; group-limit plan shape") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val capped = Sampling.groupQuota(
      d.select(col("source"), col("doc_id"), col("n_chars")),
      Seq(col("source")), 5,
      Seq(col("n_chars").desc, col("doc_id").asc))
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"no per-partition group limit:\n$plan")
    val perGroup = capped.groupBy("source").count()
      .as[(String, Long)].collect()
    assert(perGroup.nonEmpty)
    assert(perGroup.forall(_._2 <= 5))
    // kept rows are each group's longest docs
    val worst = capped.groupBy("source").agg(min("n_chars").as("kept_min"))
    val dropped = d.join(capped.select("doc_id"), Seq("doc_id"),
      "left_anti").groupBy("source").agg(max("n_chars").as("drop_max"))
    val bad = worst.join(dropped, "source")
      .filter(col("drop_max") > col("kept_min"))
    assert(bad.isEmpty, "a dropped doc outranked a kept one")
  }

  test("upsampleEpochs: integer weights exact, fractional tracks, drop at 0") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "grp")
    val out = graft.ns.Sampling.upsampleEpochs(df, "id", "grp",
      Map("g0" -> 3.0, "g1" -> 0.0, "g2" -> 1.5), defaultWeight = 1.0,
      salt = "t1")
    val byGrp = out.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    // integer weight: exactly 3 copies of each of the 100 g0 rows
    assert(byGrp("g0") == 300L)
    // weight 0: group dropped entirely
    assert(!byGrp.contains("g1"))
    // fractional 1.5: every row >= 1 copy, realized mean near 1.5
    assert(byGrp("g2") >= 100L && math.abs(byGrp("g2") - 150L) <= 25L,
      s"g2 realized ${byGrp("g2")}")
    // epochs are 1..reps per id: distinct (id, epoch) == total rows
    assert(out.select("id", "epoch").distinct().count() == out.count())
    val maxE = out.filter(col("grp") === "g0")
      .groupBy("id").agg(max("epoch").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= 3 || col("n") =!= 3).count()
    assert(maxE == 0, "g0 ids must carry epochs exactly 1,2,3")
    // content-addressed: rerun is row-identical
    val again = graft.ns.Sampling.upsampleEpochs(df, "id", "grp",
      Map("g0" -> 3.0, "g1" -> 0.0, "g2" -> 1.5), defaultWeight = 1.0,
      salt = "t1")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // zero shuffle: projection + generator only
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"upsampleEpochs must not shuffle:\n$plan")
  }

  test("tokenBudgetSelect: equals the global greedy; budget respected") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (col("doc_id") % 5).cast("double") / 5.0 as "score",
        col("n_chars"))
    val budget = 20000L
    val out = Sampling.tokenBudgetSelect(d, "doc_id", "score",
      "n_chars", budget, bucketSize = 50L)
    // reference: ONE global window in (score desc, id) order — the
    // semantics the two-phase prefix-sum must reproduce exactly
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val ref = d.withColumn("cum_before",
        coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .select(col("doc_id"), col("cum_before"),
        (col("cum_before") + col("n_chars") <= budget).as("kept"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = out.select("doc_id", "cum_before", "kept")
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == ref.size)
    got.foreach { case (id, cum, k) =>
      assert(ref(id) == ((cum, k)), s"doc $id: got ($cum,$k) want ${ref(id)}")
    }
    // the kept set's total weight fits the budget; adding the best
    // rejected row would overflow it
    val keptW = out.filter(col("kept")).agg(sum("weight"))
      .as[Long].head()
    assert(keptW <= budget)
    val minRejCum = out.filter(!col("kept"))
      .agg(min(col("cum_before") + col("weight"))).as[Long].head()
    assert(minRejCum > budget)
    // stable under repartition
    val again = Sampling.tokenBudgetSelect(d.repartition(7), "doc_id",
      "score", "n_chars", budget, bucketSize = 50L)
      .select("doc_id", "cum_before", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(again == got.map(t => (t._1, t._2, t._3)).toSet)
  }

  test("weightedSample: weight bias, TakeOrdered plan, reproducible") {
    // 50 heavy rows (w=5000) among 450 light (w=5): ES sampling must
    // overwhelmingly pick heavy rows, deterministically per salt
    val d = (0L until 500L).map(i =>
        (i, if (i < 50) 5000L else 5L)).toDF("doc_id", "w")
    val out = Sampling.weightedSample(d, "doc_id", "w", 50, "s1")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      s"weightedSample must plan as TakeOrdered, not a global sort:\n$plan")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 50)
    val heavy = ids.count(_ < 50L)
    assert(heavy >= 40, s"only $heavy/50 heavy rows sampled")
    // reproducible under repartition and input reordering
    val again = Sampling
      .weightedSample(d.repartition(7).orderBy(col("doc_id").desc),
        "doc_id", "w", 50, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    // a different salt re-deals the light minority, not the heavy mass
    val other = Sampling.weightedSample(d, "doc_id", "w", 50, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(other != ids && other.count(_ < 50L) >= 40)
    // k >= survivors with positive weight → everything positive kept
    val all = Sampling.weightedSample(d, "doc_id", "w", 600, "s1")
    assert(all.count() == 500)
  }

  test("shardManifest: shards partition the id order, sizes near " +
      "target, checksums re-derivable") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val s = 25000L
    val m = Sampling.shardManifest(d, "doc_id", "n_chars", s)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(m.nonEmpty)
    // id ranges are disjoint and ordered; doc counts cover everything
    m.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"shard ${a._1} range overlaps shard ${b._1}")
      case _ =>
    }
    assert(m.map(_._2).sum == d.count())
    // every shard except the last is within one straddling document
    // of its token target
    val maxDoc = d.agg(max("n_chars")).as[Long].head()
    m.dropRight(1).foreach { sh =>
      assert(sh._3 >= s - maxDoc && sh._3 <= s + maxDoc,
        s"shard ${sh._1} tokens ${sh._3} far from target $s")
    }
    // checksum is re-derivable from membership (id range is dense
    // per shard because input ids are dense)
    val chk = d.select(col("doc_id"),
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
      .as[(Long, Long)].collect().toMap
    m.foreach { sh =>
      val expect = (sh._4 to sh._5).map(chk).sum
      assert(sh._6 == expect, s"shard ${sh._1} checksum")
    }
  }

  test("stratifiedSplit: per-group counts exact, stable, exhaustive") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.stratifiedSplit(d, "doc_id", "source", "t1",
      Seq("train" -> 0.8, "val" -> 0.1)).cache()
    val bySrc = out.groupBy("source", "split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ns = d.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    ns.foreach { case (src, n) =>
      val train = bySrc.getOrElse((src, "train"), 0L)
      val vl = bySrc.getOrElse((src, "val"), 0L)
      val test = bySrc.getOrElse((src, "test"), 0L)
      assert(train == math.floor(0.8 * n).toLong,
        s"$src train $train of $n")
      assert(train + vl ==
        math.floor((0.8 + 0.1) * n).toLong, s"$src val $vl")
      assert(train + vl + test == n, s"$src total")
    }
    // every row assigned exactly once
    assert(out.count() == d.count())
    assert(out.select("doc_id").distinct().count() == d.count())
    // pure function of (id, salt): repartition + reorder change nothing
    val again = Sampling
      .stratifiedSplit(d.repartition(11).orderBy(col("doc_id").desc),
        "doc_id", "source", "t1", Seq("train" -> 0.8, "val" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again ==
      out.select("doc_id", "split").as[(Long, String)].collect().toSet)
    out.unpersist()
  }

  test("interleaveSchedule: every prefix of the key order holds each " +
      "source within ~1 of its proportional share; deterministic") {
    // skewed sizes: 60 / 30 / 10
    val rows = (0L until 60L).map(i => (i, "big")) ++
      (100L until 130L).map(i => (i, "mid")) ++
      (200L until 210L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.interleaveSchedule(df, "doc_id", "source")
      .select(col("doc_id"), col("source"), col("interleave_key"))
      .as[(Long, String, Long)].collect()
      .sortBy(r => (r._3, r._2, r._1))
    val n = rows.size.toDouble
    val sizes = rows.groupBy(_._2).map { case (s, xs) => s -> xs.size }
    out.indices.foreach { k =>
      val prefix = out.take(k + 1)
      sizes.foreach { case (s, ns) =>
        val got = prefix.count(_._2 == s)
        val want = (k + 1) * ns / n
        assert(math.abs(got - want) <= 1.5,
          s"prefix ${k + 1}: source $s has $got, expected ~$want")
      }
    }
    // determinism under repartitioning
    val re = Sampling.interleaveSchedule(df.repartition(7),
      "doc_id", "source")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val base = Sampling.interleaveSchedule(df, "doc_id", "source")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(re == base)
  }

  test("lengthBatches ≡ lengthBatchAssignments → groupBy (r15 — the " +
      "per-doc face aggregates to the batch manifest exactly)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val fromAssign = Sampling.lengthBatchAssignments(d, "doc_id",
        "n_chars", batchSize = 16)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .select(col("batch_id"), col("n_docs"), col("max_len"),
        col("sum_len"),
        (col("n_docs") * col("max_len") - col("sum_len"))
          .as("padding_waste"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val direct = Sampling.lengthBatches(d, "doc_id", "n_chars",
        batchSize = 16)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fromAssign == direct)
    // the assignment is a partition: every doc in exactly one batch,
    // batches full except possibly the last
    val assign = Sampling.lengthBatchAssignments(d, "doc_id",
      "n_chars", batchSize = 16)
      .as[(Long, Long, Long)].collect()
    assert(assign.map(_._1).distinct.length == assign.length)
    val byBatch = assign.groupBy(_._3).view.mapValues(_.length).toMap
    val maxB = byBatch.keys.max
    byBatch.foreach { case (b, n) =>
      assert(if (b == maxB) n >= 1 else n == 16) }
  }

  test("packSegments: per-doc lengths conserved, per-pack segments " +
      "tile [0, chunk) exactly, zero-length docs emit nothing") {
    // lengths engineered so docs straddle chunk boundaries: chunk 10,
    // lens 7, 6 (spans packs 0-1), 0 (must vanish), 12 (spans 1-2), 4
    val lens = Seq((1L, 7L), (2L, 6L), (3L, 0L), (4L, 12L), (5L, 4L))
      .toDF("doc_id", "n")
    val packed = Sampling.packOffsets(lens, "doc_id", "n",
      chunkSize = 10, bucketSize = 100L)
    val segs = Sampling.packSegments(packed, "doc_id", "n",
      chunkSize = 10)
      .as[(Long, Long, Long, Long)].collect()
    // conservation: each doc's segment lengths sum to its length
    val byDoc = segs.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(byDoc == Map(1L -> 7L, 2L -> 6L, 4L -> 12L, 5L -> 4L))
    assert(!byDoc.contains(3L), "zero-length doc must emit no segment")
    // tiling: within each pack, sorted segments are contiguous from 0
    segs.groupBy(_._1).foreach { case (pack, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"pack $pack does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 == b._3, s"gap in pack $pack")
        case _ =>
      }
      assert(sorted.map(_._4).sum <= 10L, s"pack $pack overflows")
    }
    // every pack except the last is FULL (total 29 tokens → packs
    // 0..2: 10, 10, 9)
    val packTotals = segs.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(packTotals.toMap == Map(0L -> 10L, 1L -> 10L, 2L -> 9L))
  }

  test("dsirResample: planted distribution shift — target-vocab docs " +
      "upweighted above every background doc; selection tracks " +
      "keepFrac; deterministic under repartitioning") {
    // 100 background docs over one vocabulary, 100 "domain" docs over
    // a disjoint one; the target sees only domain docs, so every
    // domain doc's importance log-weight must strictly dominate every
    // background doc's (the DSIR planted-shift shape).
    val docs = (0L until 100L).map(i =>
        (i, s"alpha beta gamma delta epsilon run$i common filler"))
      .++((100L until 200L).map(i =>
        (i, s"quantum flux entangle qubit decohere run$i common filler")))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") >= 150)
    val out = Sampling.dsirResample(docs, "doc_id", "text",
      target, "doc_id", "text", keepFrac = 0.3)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.length == 200)
    val (domain, bg) = out.partition(_._1 >= 100L)
    assert(domain.map(_._2).min > bg.map(_._2).max,
      "every domain doc must outweigh every background doc")
    // the Gumbel perturbation is bounded (~[-2, 22] ln-units here vs
    // a >> that logw gap), so the kept set is dominated by domain
    // docs and its size tracks keepFrac within the boundary bucket
    val kept = out.filter(_._5)
    assert(kept.nonEmpty && kept.length <= 100,
      s"kept ${kept.length} of 200 at keepFrac 0.3")
    assert(kept.count(_._1 >= 100L) > kept.length * 3 / 4,
      "kept set not dominated by target-like docs")
    // determinism: content-addressed end to end
    val re = Sampling.dsirResample(docs.repartition(7), "doc_id",
      "text", target.repartition(3), "doc_id", "text", keepFrac = 0.3)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(re == out.toSet)
  }
}
