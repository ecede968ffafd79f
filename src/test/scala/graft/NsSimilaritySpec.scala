package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ns.Similarity

class NsSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("cosine: identity, orthogonality, opposition") {
    val df = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f),
      3L -> Seq(-2f, 0f, 0f), 4L -> Seq(3f, 0f, 0f))
    val c = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(math.abs(c((1L, 4L)) - 1.0) < 1e-12)
    assert(math.abs(c((1L, 2L))) < 1e-12)
    assert(math.abs(c((1L, 3L)) + 1.0) < 1e-12)
  }

  test("ns06b path equivalence: the oracle-exact twin IS annTopK's " +
      "core with md5-parity planes; recall@5 vs exact >= 0.7") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val twin = Similarity.annTopKExact(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, minCosine = 0.15)
    // rebuild the twin's plane matrix from the PUBLIC sign formula
    // and feed it to the production core: identical output proves the
    // twin diverges from the scale default in the plane matrix ONLY
    val planes = Array.tabulate(8)(j => Array.tabulate(64)(i =>
      graft.ns.Embeddings.projectionSign(i, j, "annb").toDouble))
    val core = Similarity.annTopKCore(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 5, 0.15, planes, 1.0)
    assert(twin.collect().toSet == core.collect().toSet,
      "annTopKExact must equal the shared core under the same planes")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val ts = twin.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty &&
      ts.intersect(exact).size >= exact.size * 0.7,
      s"twin recall ${ts.intersect(exact).size}/${exact.size}")
  }

  test("incremental IVF: stored-index delta assignment equals " +
      "assigning the combined corpus against the same centroids") {
    val emb = Tables(spark, sf, "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val (baseAssign, centers) = Similarity.buildIvfIndex(
      base, "vec_id", "embedding", nlist = 8)
    val incremental = baseAssign.unionByName(
      Similarity.assignWithIndex(delta, centers, "vec_id", "embedding"))
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    val full = Similarity.assignWithIndex(emb, centers,
      "vec_id", "embedding")
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    assert(incremental == full,
      "delta-path assignments must equal whole-corpus assignment " +
        "against the same centroids")
    // and the assignment is a map-side projection: no exchange
    val plan = Similarity.assignWithIndex(delta, centers,
      "vec_id", "embedding").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignWithIndex must not shuffle:\n$plan")
  }

  test("PCA refit from the addition-merged summary store is " +
      "bit-equal to the direct corpus fit") {
    val emb = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ns107_law").toString
    val store = s"$dir/summaries"
    Seq(0L, 1L, 2L).foreach { b =>
      graft.ns.Embeddings.writeSummaryPartial(
        emb.filter(pmod(col("vec_id"), lit(3)) === b),
        store, b, "embedding", dim = 64)
    }
    val fromStore = graft.ns.Embeddings.pcaProjectFromStore(
      emb, "vec_id", "embedding",
      graft.ns.Embeddings.readSummaryStore(spark, store),
      dim = 64, k = 4)
      .as[(Long, Int, Double)].collect().toSet
    val direct = graft.ns.Embeddings.pcaProject(
      emb, "vec_id", "embedding", dim = 64, k = 4)
      .as[(Long, Int, Double)].collect().toSet
    assert(fromStore == direct,
      "store-merged fit must equal direct fit bit-for-bit")
    // replay idempotency: re-landing a batch REPLACES its partition
    graft.ns.Embeddings.writeSummaryPartial(
      emb.filter(pmod(col("vec_id"), lit(3)) === 1L),
      store, 1L, "embedding", dim = 64)
    val replayed = graft.ns.Embeddings.pcaProjectFromStore(
      emb, "vec_id", "embedding",
      graft.ns.Embeddings.readSummaryStore(spark, store),
      dim = 64, k = 4)
      .as[(Long, Int, Double)].collect().toSet
    assert(replayed == direct, "batch replay must not double-add")
  }

  test("IvfAssignExpr kernel matches an independent driver-side " +
      "assignment (direct euclidean argmin)") {
    val emb = Tables(spark, sf, "embeddings").limit(200)
    val (_, centers) = Similarity.buildIvfIndex(
      emb, "vec_id", "embedding", nlist = 8)
    val got = Similarity.assignWithIndex(emb, centers,
      "vec_id", "embedding")
      .select(col("vec_id"), col("cell")).as[(Long, Int)]
      .collect().toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(vecs.nonEmpty && got.nonEmpty)
    vecs.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n > 0) {
        val u = v.map(_ / n)
        // independent formulation: direct squared euclidean distance
        val d2 = centers.map(c => u.zip(c)
          .map { case (a, b) => (a - b) * (a - b) }.sum)
        val best = d2.zipWithIndex.minBy { case (d, i) => (d, i) }
        val margin = d2.sorted.take(2).toSeq match {
          case Seq(a, b) => b - a
          case _ => 1.0
        }
        // near-ties can legitimately differ between the two float
        // formulations; everywhere else they must agree
        if (margin > 1e-9)
          assert(got(id) == best._2,
            s"vec $id: kernel ${got(id)} vs reference ${best._2}")
      } else assert(!got.contains(id), s"zero-norm vec $id kept")
    }
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val corpus = vecs(
      10L -> Seq(1f, 0f), 11L -> Seq(0.9f, 0.1f),
      12L -> Seq(0f, 1f), 13L -> Seq(1f, 0f))
    val queries = vecs(1L -> Seq(1f, 0f))
    val out = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "vec_id", "embedding", 3)
      .select(col("rank"), col("vec_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // cos: 10→1.0, 13→1.0, 11→~0.994, 12→0.0; tie 10 vs 13 → id asc.
    assert(out.toSeq == Seq((1L, 10L), (2L, 13L), (3L, 11L)))
  }

  test("annTopK approximates brute-force top-k with high recall, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, minCosine = 0.15)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    val got = ann.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} exact pairs")
  }

  test("ivfTopK: high recall via cell probing; equi-join-only plan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    // nlist=16/nprobe=6 probes 3/8 of the cells; measured recall@5 on
    // this fixture: 0.79 (the 64-dim noisy vectors are a hard case —
    // the sweep read 0.64/0.79/0.86 at nprobe 4/6/8)
    val ivf = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
    val plan = ivf.queryExecution.executedPlan.toString
    // centroid probing is a literal projection, so the ONLY join in
    // the plan is the corpus equi-join on cell — nothing quadratic
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop:\n$plan")
    val got = ivf.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} exact pairs")
    // determinism: same seed → same result set
    val again = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(again == got)
  }

  test("ivfTopK indexKey: cached index returns the identical result") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    def run() = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6, indexKey = Some(s"$sf/embeddings"))
      .select(col("query_id"), col("vec_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    val first = run() // builds + caches the index
    assert(run() == first) // served from the cached index
    // and matches the uncached build (same seed → same quantizer)
    val uncached = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
      .select(col("query_id"), col("vec_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    assert(uncached == first)
  }

  test("ivfTopK sampled fit: deterministic, decent recall; dropIndex unpins") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet") // 500 rows
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    // cap < corpus size forces the 100-TB path: quantizer fit on a
    // deterministic 128-row sample, full corpus assigned afterwards
    def run() = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 8, fitSampleCap = 128)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val got = run()
    assert(run() == got) // same seed + same sample → same quantizer
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.5, s"sampled-fit recall $recall")
    // cached sampled-fit index can be dropped: the persisted cell
    // assignments are unpinned and the cache entry removed
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 8, fitSampleCap = 128,
      indexKey = Some("spec-sampled")).count()
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    Similarity.dropIndex(spark, "spec-sampled")
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("IVF index save/load round-trips with identical query results") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val built = Similarity.buildIvfIndex(
      emb, "vec_id", "embedding", nlist = 16)
    def query(idx: (org.apache.spark.sql.DataFrame,
        Array[Array[Double]])) =
      Similarity.ivfTopKWithIndex(idx._1, idx._2, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nprobe = 6)
        .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
        .as[(Long, Long, Double, Long)].collect().toSet
    val fresh = query(built)
    assert(fresh.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toFile
    dir.deleteOnExit()
    Similarity.saveIvfIndex(built, dir.getPath)
    val loaded = Similarity.loadIvfIndex(spark, dir.getPath)
    // centroids survive the JSON round-trip bit-exactly, in cell order
    assert(loaded._2.length == built._2.length)
    assert(loaded._2.zip(built._2).forall { case (a, b) =>
      a.sameElements(b) })
    // and a RESTARTED application's index (the loaded one) answers
    // queries identically — cosine included, not just ids
    assert(query(loaded) == fresh)
    // ivfTopK over the same corpus/seed agrees with the offline split
    val inline = Similarity.ivfTopK(
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(inline == fresh)
  }

  test("cosineNearDupPairs finds high-cosine pairs via bucketed join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // exact truth by brute force (test-only; the operator is bucketed)
    val exact = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    val got = pairs
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall over ${exact.size} exact pairs")
    // verified candidates: no false positives w.r.t. the threshold
    assert(got.subsetOf(
      emb.as("a").crossJoin(emb.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
        .filter(col("c") >= 0.39) // tiny fp slack from distance round-trip
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet))
  }

  test("quantizeInt8: range, half-quantum error bound, zero guard") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = graft.ns.Embeddings.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("q_scale"), col("max_abs_err"),
        array_min(col("q")).as("lo"), array_max(col("q")).as("hi"))
      .as[(Double, Double, Int, Int)].collect()
    assert(q.nonEmpty)
    q.foreach { case (scale, err, lo, hi) =>
      assert(lo >= -127 && hi <= 127, s"q out of int8 range [$lo,$hi]")
      // round() is at most half a quantum off; the scale element
      // itself maps exactly to ±127.
      assert(err <= scale / 254.0 * (1 + 1e-12),
        s"err $err exceeds half-quantum ${scale / 254.0}")
    }
  }

  test("quantizeInt8: all-zero vector quantizes to zeros, not NaN") {
    val out = graft.ns.Embeddings.quantizeInt8(
      vecs(1L -> Seq(0f, 0f, 0f), 2L -> Seq(0f, 2f, -4f)),
      "vec_id", "embedding")
      .select(col("vec_id"), col("q_scale"), col("q"),
        col("max_abs_err"))
      .as[(Long, Double, Seq[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0.0, Seq(0, 0, 0), 0.0)))
    assert(out(2L)._3 == Seq(0, 64, -127)) // round(2*127/4) = 64
    assert(out(2L)._2 == 4.0)
  }

  test("quantizeInt8 is a pure projection: no exchange in the plan") {
    val plan = graft.ns.Embeddings.quantizeInt8(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantize must not shuffle:\n$plan")
  }

  test("dequantizeInt8 round-trip achieves exactly max_abs_err") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = graft.ns.Embeddings.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb, "vec_id")
    val rt = graft.ns.Embeddings.dequantizeInt8(q)
      .select(col("max_abs_err"),
        array_max(zip_with(col("embedding"), col("dq"),
          (x, y) => abs(x.cast("double") - y))).as("rt_err"))
      .as[(Double, Double)].collect()
    assert(rt.nonEmpty)
    rt.foreach { case (reported, actual) =>
      assert(actual == reported,
        s"round-trip err $actual != reported $reported")
    }
  }

  test("l2Normalize: unit norm, zero guard, cosine = dot of units") {
    val df = vecs(
      1L -> Seq(3f, 4f), 2L -> Seq(0f, 0f), 3L -> Seq(-1f, 1f))
    val out = graft.ns.Embeddings.l2Normalize(df, "vec_id", "embedding")
      .select(col("vec_id"), col("norm"), col("unit"))
      .as[(Long, Double, Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 5.0 && out(1L)._3 == Seq(0.6, 0.8))
    assert(out(2L)._2 == 0.0 && out(2L)._3 == Seq(0.0, 0.0))
    // unit vector really has L2 norm 1 (within one ulp of the fold)
    val n3 = out(3L)._3.map(x => x * x).sum
    assert(math.abs(n3 - 1.0) < 1e-12)
  }

  test("pq parity twin: kernel codes achieve the minimal independent " +
      "squared distance per subspace") {
    val emb = Tables(spark, sf, "embeddings")
    val cb = Similarity.parityCodebooks(64, 8, 16)
    val got = Similarity.pqCodesScalar(emb, cb, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, c) => (id, s) -> c.toInt }.toMap
    val raw = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(raw.nonEmpty && got.nonEmpty)
    var checked = 0
    raw.foreach { case (id, e) =>
      val v = e.map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) {
        for (s <- 0 until 8) {
          // independent formulation: plain squared distance over the
          // unit subvector (the kernel scores 2·dot − ‖c‖² instead)
          def d2(j: Int): Double = (0 until 8).map { i =>
            val diff = v(s * 8 + i) / n - cb(s)(j)(i); diff * diff
          }.sum
          val best = (0 until 16).map(d2).min
          val chosen = got((id, s.toLong))
          assert(d2(chosen) <= best + 1e-9,
            s"vec $id subspace $s: code $chosen not a distance argmin")
          checked += 1
        }
      }
    }
    assert(checked >= 800, s"only $checked subspace codes checked")
  }

  test("pqFit: bit-reproducible, right shapes, codes in range, " +
      "zero-norm rows dropped") {
    val emb = Tables(spark, sf, "embeddings")
    val cb1 = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val cb2 = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    assert(cb1.length == 8 && cb1.forall(_.length == 16) &&
      cb1.forall(_.forall(_.length == 8)))
    // refit must reproduce the codebooks EXACTLY (content-addressed
    // sample + ordered Lloyd — no MLlib reduction-order drift)
    (cb1.flatten.flatten, cb2.flatten.flatten).zipped.foreach((a, b) =>
      assert(a == b, "refit drifted"))
    val codes = Similarity.pqEncode(emb, cb1, "vec_id", "embedding")
      .select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).head()
    assert(codes.getInt(0) >= 0 && codes.getInt(1) < 16)
    // zero-norm: no direction, dropped like the IVF assign path
    val withZero = vecs(1L -> Seq(1f, 2f, 3f, 4f),
      2L -> Seq(0f, 0f, 0f, 0f))
    val enc = Similarity.pqEncode(withZero,
      Similarity.parityCodebooks(4, 2, 2), "vec_id", "embedding")
      .select(col("vec_id")).as[Long].collect()
    assert(enc.toSeq == Seq(1L))
  }

  test("pqTopKAdc: recall@5 vs exact >= 0.6, reported cosines are " +
      "EXACT (rerank), deterministic") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val cb = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val pq = Similarity.pqTopKAdc(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, rerank = 50)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val pqPairs = pq.map(r => (r._1, r._2)).toSet
    assert(exactPairs.nonEmpty &&
      pqPairs.intersect(exactPairs).size >= exactPairs.size * 0.6,
      s"recall ${pqPairs.intersect(exactPairs).size}/${exactPairs.size}")
    // rerank exactness: where PQ and exact agree on a pair, the
    // reported cosine is the exact one (no quantization error)
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (qid, id, c) =>
      exactCos.get((qid, id)).foreach(e =>
        assert(math.abs(c - e) < 1e-9, s"($qid,$id): $c vs $e"))
    }
    val pq2 = Similarity.pqTopKAdc(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, rerank = 50)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
    assert(pq.toSet == pq2.toSet, "ADC search must be deterministic")
  }

  test("ivfPqTopK: recall@5 >= 0.5 at nprobe=6, full probe with big " +
      "rerank recovers the subset relation vs pure ADC, exact cosines") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val cb = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, nlist = 16, nprobe = 6,
      rerank = 50)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val got = ivfpq.map(r => (r._1, r._2)).toSet
    assert(exactPairs.nonEmpty &&
      got.intersect(exactPairs).size >= exactPairs.size * 0.5,
      s"recall ${got.intersect(exactPairs).size}/${exactPairs.size}")
    // reported cosines are exact (rerank), matching brute force
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    ivfpq.foreach { case (qid, id, c) =>
      exactCos.get((qid, id)).foreach(e =>
        assert(math.abs(c - e) < 1e-9, s"($qid,$id): $c vs $e"))
    }
    // probing EVERY cell with rerank >> k makes IVF-PQ degrade to
    // pure ADC search: same candidates survive, same top-k
    val full = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, nlist = 16, nprobe = 16,
      rerank = 50)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val adc = Similarity.pqTopKAdc(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", cb, k = 5, rerank = 50)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(full == adc,
      "nprobe = nlist must equal the unpruned ADC search")
  }

  test("hardNegatives: positive is rank 1, margin excludes " +
      "near-ties, generator-agnostic over ANN neighbors") {
    val neighbors = Seq(
      // query 7: positive 1 at 0.9; 2 at 0.88 is inside the margin
      // (unlabeled-positive guard), 3 at 0.6 and 4 at 0.2 mine
      (7L, 1L, 0.9, 1L), (7L, 2L, 0.88, 2L),
      (7L, 3L, 0.6, 3L), (7L, 4L, 0.2, 4L),
      // query 8: everything ties the positive — nothing mines
      (8L, 5L, 0.7, 1L), (8L, 6L, 0.7, 2L))
      .toDF("query_id", "vec_id", "cosine", "rank")
    val out = Similarity.hardNegatives(neighbors, "vec_id",
      margin = 0.05)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSet
    assert(out == Set((7L, 1L, 3L, 0.9, 0.6, 2L),
      (7L, 1L, 4L, 0.9, 0.2, 3L)), out.toString)
    // the same miner runs unchanged over an approximate generator
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val ann = Similarity.hardNegatives(
      Similarity.annTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 10, minCosine = 0.0),
      "vec_id", margin = 0.05)
    assert(ann.columns.toSeq == Seq("query_id", "positive_id",
      "negative_id", "pos_cosine", "neg_cosine", "neg_rank"))
    assert(ann.count() > 0)
  }

  test("pq codebooks round-trip save/load bit-exactly; incremental " +
      "encode against loaded codebooks equals fit-time encode") {
    val emb = Tables(spark, sf, "embeddings")
    val cb = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_rt").toString
    Similarity.savePqCodebooks(spark, cb, dir)
    val back = Similarity.loadPqCodebooks(spark, dir)
    val flatBack: Seq[Double] = back.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    val flatCb: Seq[Double] = cb.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    assert(back.length == cb.length && flatBack == flatCb,
      "codebooks must round-trip bit-exactly")
    // the incremental contract: encoding a delta batch against the
    // LOADED codebooks is the same function as fit-time encoding
    val delta = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val a = Similarity.pqCodesScalar(delta, back, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val b = Similarity.pqCodesScalar(emb, cb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(a.nonEmpty && a.forall { case (k, v) => b(k) == v })
  }

  test("pqEncode is a pure projection: no exchange in the plan") {
    val plan = Similarity.pqEncode(Tables(spark, sf, "embeddings"),
      Similarity.parityCodebooks(64, 8, 16), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("l2Normalize is a pure projection: no exchange in the plan") {
    val plan = graft.ns.Embeddings.l2Normalize(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
  }

  test("int8 storage path preserves search: top-k on dequantized ≈ exact") {
    // the law that makes ns35 a legitimate storage format for ns05-
    // style search: brute-force top-5 over the round-tripped corpus
    // recovers ≥ 90% of the exact top-5 (d=64, err ≤ scale/254/elem)
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
    val rt = graft.ns.Embeddings.dequantizeInt8(
        graft.ns.Embeddings.quantizeInt8(emb, "vec_id", "embedding"))
      .select(col("vec_id"),
        transform(col("dq"), x => x.cast("float")).as("embedding"))
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("vec_id"))
        .as[(Long, Long)].collect().toSet
    val exact = topk(emb)
    val quant = topk(rt)
    val overlap = exact.intersect(quant).size.toDouble / exact.size
    assert(overlap >= 0.9, s"quantized top-k overlap $overlap")
  }

  test("Int8DotExpr kernel ≡ interpreted zip-fold, and int8MipsTopK " +
      "ranking is unchanged by the kernel promotion") {
    // the TopGramKernel/IvfAssignExpr promotion law: the codegen'd
    // static kernel must compute the IDENTICAL long sum as the HOF
    // formulation it replaced, over real corpus vectors
    val emb = Tables(spark, sf, "embeddings").limit(300)
    val dq = graft.ns.Embeddings.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("q"))
    val q = dq.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
    val both = dq.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        graft.functions.functions.int8_dot(col("qq"), col("q"))
          .as("kernel"),
        aggregate(zip_with(col("qq"), col("q"),
          (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x).as("hof"))
    val bad = both.filter(col("kernel") =!= col("hof")).count()
    assert(bad == 0L, s"$bad pairs disagree between kernel and HOF")
    // and the full operator still produces a deterministic ranking
    // over a repartitioned corpus (the kernel changed no semantics)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val a = Similarity.int8MipsTopK(emb, "vec_id", "embedding",
      queries, "q_id", "q_emb", k = 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    val b = Similarity.int8MipsTopK(emb.repartition(7), "vec_id",
      "embedding", queries, "q_id", "q_emb", k = 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("VecDotExpr kernel ≡ interpreted zip-fold BIT-EXACTLY over " +
      "real float vectors, unit double vectors, and the mismatch/" +
      "null-element cases (r16 — the promotion law for the " +
      "similarity hot path)") {
    val emb = Tables(spark, sf, "embeddings").limit(300)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // float × float: raw corpus vectors
    val both = emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        graft.functions.functions.vec_dot(col("embedding"), col("qv"))
          .as("kernel"),
        aggregate(zip_with(
          transform(col("embedding"), x => x.cast("double")),
          transform(col("qv"), x => x.cast("double")),
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x).as("hof"))
    // BIT-exact: compare the raw IEEE bits driver-side, not an epsilon
    val rows = both.select(col("kernel"), col("hof")).collect()
    val bad = rows.count { r =>
      r.isNullAt(0) != r.isNullAt(1) || (!r.isNullAt(0) &&
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) !=
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    assert(bad == 0, s"$bad pairs disagree bitwise between kernel and HOF")
    // double × double through the public cosine (3 dots in one stage)
    val c = emb.limit(20).crossJoin(broadcast(q))
      .select(Similarity.cosine(col("embedding"), col("qv")).as("k"),
        (aggregate(zip_with(
          transform(col("embedding"), x => x.cast("double")),
          transform(col("qv"), x => x.cast("double")),
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(zip_with(
            transform(col("embedding"), x => x.cast("double")),
            transform(col("embedding"), x => x.cast("double")),
            (a, b) => a * b), lit(0.0), (acc, x) => acc + x)) *
           sqrt(aggregate(zip_with(
             transform(col("qv"), x => x.cast("double")),
             transform(col("qv"), x => x.cast("double")),
             (a, b) => a * b), lit(0.0), (acc, x) => acc + x))))
          .as("h"))
    val cosBad = c.collect().count { r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) !=
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    }
    assert(cosBad == 0, s"$cosBad cosine rows disagree bitwise")
    // mismatch and null element → NULL, like the zip_with twin
    val edge = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.functions.vec_dot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(edge(1L).contains(11.0))
    assert(edge(2L).isEmpty, "length mismatch must be NULL")
    assert(edge(3L).isEmpty, "null element must be NULL")
    // every castable numeric element type the HOF accepted keeps
    // computing (r16 ADVICE #2): short, byte, and decimal arrays
    // must not fail analysis, and must match the cast-to-double fold
    val mixed = Seq((1L, Seq(1, -2, 3), Seq(10, 20, 30)))
      .toDF("id", "ai", "bi")
      .select(col("id"),
        col("ai").cast("array<smallint>").as("as"),
        col("bi").cast("array<tinyint>").as("bb"),
        col("ai").cast("array<decimal(10,2)>").as("ad"),
        col("bi").cast("array<double>").as("bd"))
    val m = mixed.select(
      graft.functions.functions.vec_dot(col("as"), col("bb")).as("sb"),
      graft.functions.functions.vec_dot(col("ad"), col("bd")).as("dd"))
      .as[(Double, Double)].collect().head
    assert(m._1 == (1 * 10 + -2 * 20 + 3 * 30).toDouble)
    assert(m._2 == (1.0 * 10 + -2.0 * 20 + 3.0 * 30))
  }

  test("Int8DotExpr: dimension mismatch yields NULL, never a " +
      "truncated score (round-13 ADVICE — the zip_with twin's law)") {
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq(4, 5, 6)),
      (2L, Seq(1, 2, 3), Seq(4, 5)), // mismatched: must be null
      (3L, Seq(7), Seq(-7)))
      .toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.functions.int8_dot(col("a"), col("b"))
          .as("dot"))
      .as[(Long, Option[Long])].collect().toMap
    assert(df(1L).contains(32L))
    assert(df(2L).isEmpty, "mismatched lengths must score null")
    assert(df(3L).contains(-49L))
  }

  test("labelCentroids: exact means on representable values") {
    // values with ≤ 24 fractional bits are fixed-point-exact, so the
    // centroid is the EXACT arithmetic mean — no fp tolerance needed.
    val df = Seq(
      (1L, 0, Seq(1.0f, 2.0f)), (2L, 0, Seq(3.0f, 6.0f)),
      (3L, 1, Seq(-1.5f, 0.25f))).toDF("vec_id", "label", "embedding")
    val out = graft.ns.Embeddings.labelCentroids(df, "label", "embedding")
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0) == ((0, 2L, Seq(2.0, 4.0))))
    assert(out(1) == ((1, 1L, Seq(-1.5, 0.25))))
  }

  test("labelCentroids: quantization error bounded by half a quantum") {
    val emb = Tables(spark, sf, "embeddings")
    val cents = graft.ns.Embeddings.labelCentroids(
      emb, "label", "embedding")
    // recompute the float mean per label the naive way and compare:
    // |fixed-point mean − float mean| ≤ 2^-25 per element (the one
    // rounding), far below any downstream cosine's sensitivity
    val naive = emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x").cast("double")).as("m"))
    val drift = cents
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "c")))
      .join(naive, Seq("label", "pos"))
      .select(max(abs(col("c") - col("m")))).as[Double].head()
    assert(drift < 1e-6, s"fixed-point drift $drift")
  }

  test("labelCentroids aggregates map-side: partial agg before exchange") {
    val plan = graft.ns.Embeddings.labelCentroids(
        Tables(spark, sf, "embeddings"), "label", "embedding")
      .queryExecution.executedPlan.toString
    // partial sum(fx) must appear below the exchange (map-combinable)
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"expected partial aggregation in:\n$plan")
  }

  test("knnClassify: planted clusters recovered, vote tiebreak") {
    // labeled corpus: three +x vectors labeled 0, three +y labeled 1
    // (small jitter keeps neighbors unambiguous); queries near each
    // axis must take the axis's label with all 3 votes.
    val corpus = Seq(
      (10L, Seq(1f, 0.01f), 0), (11L, Seq(1f, -0.01f), 0),
      (12L, Seq(0.99f, 0f), 0),
      (20L, Seq(0.01f, 1f), 1), (21L, Seq(-0.01f, 1f), 1),
      (22L, Seq(0f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val queries = vecs(1L -> Seq(0.9f, 0.1f), 2L -> Seq(0.1f, 0.9f))
    val out = Similarity.knnClassify(corpus, "vec_id", "embedding",
        "label", queries, "vec_id", "embedding", k = 3)
      .as[(Long, Int, Long)].collect()
      .map { case (q, l, v) => q -> ((l, v)) }.toMap
    assert(out == Map(1L -> (0, 3L), 2L -> (1, 3L)))
    // k=6 → 3 votes each → tie → smaller label wins (deterministic)
    val tied = Similarity.knnClassify(corpus, "vec_id", "embedding",
        "label", queries, "vec_id", "embedding", k = 6)
      .select(col("pred_label")).as[Int].collect()
    assert(tied.forall(_ == 0))
  }

  test("semanticContamination: planted leak flagged, zero-shuffle plan") {
    val evalSet = vecs(100L -> Seq(1f, 0f, 0f), 101L -> Seq(0f, 1f, 0f))
    val corpus = vecs(
      1L -> Seq(2f, 0f, 0f),   // parallel to eval 100 → cosine 1
      2L -> Seq(0f, 0f, 5f),   // orthogonal to both → max 0
      3L -> Seq(1f, 1f, 0f))   // 45° to both → ~0.707
    val out = Similarity.semanticContamination(corpus, "vec_id",
      "embedding", evalSet, "embedding", minCosine = 0.9)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"contamination must be a pure projection:\n$plan")
    val m = out.as[(Long, Double, Boolean)].collect()
      .map { case (id, c, f) => id -> (c, f) }.toMap
    assert(m(1L)._2 && math.abs(m(1L)._1 - 1.0) < 1e-12)
    assert(!m(2L)._2 && math.abs(m(2L)._1) < 1e-12)
    assert(!m(3L)._2 && math.abs(m(3L)._1 - math.sqrt(0.5)) < 1e-9)
    // zero-norm corpus rows are excluded (no direction, no cosine)
    val z = Similarity.semanticContamination(
      vecs(7L -> Seq(0f, 0f, 0f), 8L -> Seq(1f, 0f, 0f)),
      "vec_id", "embedding", evalSet, "embedding", minCosine = 0.5)
    assert(z.select(col("vec_id")).as[Long].collect().toSeq == Seq(8L))
  }

  test("matryoshkaTruncate: unit prefix, energy ratio laws, d'=d is l2Normalize") {
    import graft.ns.Embeddings
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Embeddings.matryoshkaTruncate(emb, "vec_id", "embedding", 16)
    val rows = out.select(col("vec_id"), col("energy_ratio"),
      aggregate(col("unit"), lit(0.0), (a, x) => a + x * x).as("sq"),
      size(col("unit")).as("d"))
      .as[(Long, Double, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, ratio, sq, d) =>
      assert(d == 16, s"vec $id truncated to $d dims")
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-12, s"vec $id ratio $ratio")
      assert(math.abs(sq - 1.0) < 1e-9, s"vec $id prefix not unit: $sq")
    }
    // no shuffle: pure projection
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be zero-shuffle:\n$plan")
    // d' = d degenerates to l2Normalize (same folds, ratio 1)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val full = Embeddings.matryoshkaTruncate(emb, "vec_id", "embedding", dim)
      .select(col("vec_id"), col("energy_ratio"), col("unit"))
      .as[(Long, Double, Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val l2 = Embeddings.l2Normalize(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("unit"))
      .as[(Long, Seq[Double])].collect().toMap
    l2.foreach { case (id, u) =>
      val (ratio, tu) = (full(id)._1, full(id)._2)
      assert(math.abs(ratio - 1.0) < 1e-12)
      assert(tu == u, s"vec $id: d'=d truncation != l2Normalize")
    }
  }

  // The production-case law for the density-adaptive bucket cap
  // (maxBucketSize): when near-dup pairs are GENUINELY close (planted
  // perturbed copies, cosine ≥ ~0.95 — the real shape of web-scale
  // duplicate text/embeddings), subdividing over-occupied buckets
  // keeps recall while bounding the candidate join. The driver fixture
  // cannot exercise this (its ≥0.4 pairs are chance tail, pair
  // distance ≈ corpus distance — SCALE.md), which is exactly why the
  // registered ns07 leaves the cap off there and this law carries the
  // scale claim instead.
  test("maxBucketSize keeps planted near-dup recall, sheds only chance pairs") {
    val d = 32
    val rnd = new scala.util.Random(7L)
    def gauss(): Array[Float] = Array.fill(d)(rnd.nextGaussian().toFloat)
    val base = (0L until 400L).map(i => i -> gauss().toSeq)
    // 80 perturbed copies of the first 80 vectors: cosine ≥ ~0.99
    val dups = (0L until 80L).map { i =>
      val v = base(i.toInt)._2
      (1000L + i) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val planted = (0L until 80L).map(i => (i, 1000L + i)).toSet
    val capped = Similarity.cosineNearDupPairs(emb, "vec_id",
      "embedding", minCosine = 0.9, numHashTables = 8,
      bucketLength = 0.2, maxBucketSize = Some(32))
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val recall = planted.count(capped.contains).toDouble / planted.size
    assert(recall >= 0.9, s"capped recall $recall on planted pairs")
    // precision is 1.0 by construction (exact verify) — every emitted
    // pair really has cosine >= 0.9
    assert(capped.forall { case (a, b) => a < b })
    // determinism: same seed, same output
    val again = Similarity.cosineNearDupPairs(emb, "vec_id",
      "embedding", minCosine = 0.9, numHashTables = 8,
      bucketLength = 0.2, maxBucketSize = Some(32))
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(again == capped)
  }

  test("label-noise composition: a planted mislabel in a tight " +
      "cluster is out-voted; clean labels are not flagged") {
    import graft.ns.Similarity
    // two tight clusters around orthogonal axes; vec 5 sits in
    // cluster A but carries cluster B's label
    def v(axis: Int, eps: Double, at: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(axis) = 1.0f; a(at) = a(at) + eps.toFloat; a
    }
    val rows = (0 until 5).map(i => (i.toLong, v(0, 0.01 * i, 3), 0)) ++
      Seq((5L, v(0, 0.02, 4), 1)) ++  // mislabeled: geometry A, label B
      (6 until 11).map(i => (i.toLong, v(1, 0.01 * (i - 6), 5), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val audited = emb
    val pred = Similarity.knnClassify(emb, "vec_id", "embedding",
      "label", audited, "vec_id", "embedding", k = 3)
    val flags = pred.join(audited.select(col("vec_id").as("query_id"),
        col("label").as("own_label")), Seq("query_id"))
      .select(col("query_id"),
        (col("pred_label") =!= col("own_label")).as("suspect"))
      .as[(Long, Boolean)].collect().toMap
    assert(flags(5L), "the planted mislabel must be flagged")
    assert((0 until 5).forall(i => !flags(i.toLong)))
    assert((6 until 11).forall(i => !flags(i.toLong)))
    // the ANN scale twin recovers the same verdicts on this fixture
    val annPred = Similarity.voteLabels(
      Similarity.annTopK(emb, "vec_id", "embedding", audited,
        "vec_id", "embedding", k = 3, minCosine = -1.0,
        numHashTables = 8, bucketLength = 0.2),
      emb, "vec_id", "label")
    val annFlags = annPred.join(audited
        .select(col("vec_id").as("query_id"),
          col("label").as("own_label")), Seq("query_id"))
      .select(col("query_id"),
        (col("pred_label") =!= col("own_label")).as("suspect"))
      .as[(Long, Boolean)].collect().toMap
    assert(annFlags(5L) && (0 until 5).forall(i => !annFlags(i.toLong)))
  }

  test("gramMatrix: equals a brute-force computation, merges by " +
      "addition bit-exactly, diagonal non-negative") {
    import graft.ns.Embeddings
    val dim = 4
    val rows = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.5f, 0.5f, -1.0f, 0.75f)),
      (3L, Array(-0.25f, 1.0f, 0.125f, -0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Embeddings.gramMatrix(df, "embedding", dim)
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap
    // independent impl over the same Spark-round quantization
    def quant(x: Float): Long =
      BigDecimal(x.toDouble * 4096.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (i <- 0 until dim; j <- i until dim) {
      val want = rows.map { case (_, v) => quant(v(i)) * quant(v(j)) }.sum
      assert(got((i, j)) == want, s"cell ($i, $j)")
    }
    assert((0 until dim).forall(i => got((i, i)) >= 0L))
    // mergeability: per-part triangles summed == whole
    val whole = got
    val partA = Embeddings.gramMatrix(df.filter($"vec_id" <= 1), "embedding", dim)
      .as[(Int, Int, Long)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    val partB = Embeddings.gramMatrix(df.filter($"vec_id" > 1), "embedding", dim)
      .as[(Int, Int, Long)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    assert(whole.keySet.forall(k => partA(k) + partB(k) == whole(k)))
    // partition independence
    val again = Embeddings.gramMatrix(df.repartition(5), "embedding", dim)
      .as[(Int, Int, Long)].collect().map { case (i, j, s) => (i, j) -> s }.toMap
    assert(again == whole)
  }

  test("reduced-dimension near-dup: planted dups survive the " +
      "PCA-16 -> LSH path with high recall") {
    import graft.ns.Embeddings
    val d = 32
    val rnd = new scala.util.Random(11L)
    def gauss(): Array[Float] = Array.fill(d)(rnd.nextGaussian().toFloat)
    val base = (0L until 300L).map(i => i -> gauss().toSeq)
    val dups = (0L until 60L).map { i =>
      val v = base(i.toInt)._2
      (1000L + i) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val planted = (0L until 60L).map(i => (i, 1000L + i)).toSet
    val reduced = Embeddings.pcaProject(emb, "vec_id", "embedding",
      dim = d, k = 16)
    val vecs = reduced.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("comp"))))
        .as("ps"))
      .select(col("vec_id"),
        transform(col("ps"), p => p.getField("comp").cast("float"))
          .as("emb16"))
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "emb16",
      minCosine = 0.9, numHashTables = 8, bucketLength = 0.2,
      maxBucketSize = Some(32))
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.9, s"reduced-path recall $recall on planted pairs")
  }

  test("jacobiEigen: orthonormal vectors, reconstructs the matrix, " +
      "eigenvalues descending") {
    import graft.ns.Embeddings
    // symmetric matrix with known structure
    val m = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.0),
      Array(0.0, 0.1, 0.0, 1.0))
    val (evals, evecs) = Embeddings.jacobiEigen(m)
    val d = 4
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(i => evecs(a)(i) * evecs(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"orthonormality ($a, $b): $dot")
      val rec = (0 until d).map(k => evals(k) * evecs(k)(a) * evecs(k)(b)).sum
      assert(math.abs(rec - m(a)(b)) < 1e-9, s"reconstruct ($a, $b)")
    }
    // trace preserved
    assert(math.abs(evals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
  }

  test("pcaProject: planted 2-D subspace recovered in the top-2 " +
      "components, projections partition-independent") {
    import graft.ns.Embeddings
    val dim = 6
    // vectors in span{e0, e1} plus tiny noise on e5
    val rows = (0 until 40).map { r =>
      val a = (r % 7 - 3).toDouble; val b = (r % 5 - 2).toDouble
      val v = Array.fill(dim)(0.0f)
      v(0) = a.toFloat; v(1) = b.toFloat; v(5) = (r % 3).toFloat * 0.01f
      (r.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = Embeddings.pcaProject(df, "vec_id", "embedding", dim, k = dim)
      .as[(Long, Int, Double)].collect()
    // variance by component: top-2 must carry ~all of it
    val byJ = proj.groupBy(_._2).view.mapValues { xs =>
      val m = xs.map(_._3).sum / xs.length
      xs.map(x => (x._3 - m) * (x._3 - m)).sum
    }.toMap
    val total = byJ.values.sum
    assert((byJ(0) + byJ(1)) / total > 0.999,
      s"top-2 variance share ${(byJ(0) + byJ(1)) / total}")
    // determinism across partitioning
    val again = Embeddings.pcaProject(df.repartition(7), "vec_id",
      "embedding", dim, k = dim).as[(Long, Int, Double)].collect()
    assert(again.toSet == proj.toSet)
  }

  test("signedProjection: matches an independent brute-force impl, " +
      "maps zero vectors to zero, and plans with no exchange") {
    import graft.ns.Embeddings
    val dim = 8
    val rows = Seq(
      (1L, Array(1.0f, -2.0f, 3.0f, 0.5f, -0.25f, 4.0f, -1.5f, 2.5f)),
      (2L, Array.fill(dim)(0.0f)),                  // zero vector
      (3L, Array(1.0f, -2.0f, 3.0f, 0.5f, -0.25f, 4.0f, -1.5f, 2.5f)),
      (4L, Array(-3.0f, 1.0f, 0.0f, 2.0f, 5.0f, -0.5f, 0.75f, -4.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val k = 6
    val got = Embeddings.signedProjection(df, "vec_id", "embedding",
      dim = dim, k = k)
      .as[(Long, Int, Long)].collect()
      .map { case (id, j, c) => (id, j) -> c }.toMap
    // Independent impl: re-quantize and project in plain Scala.
    def quant(xs: Array[Float]): Array[Long] = {
      val sc = xs.map(x => math.abs(x.toDouble)).max
      // HALF_UP away from zero — Spark's and DuckDB's round, which
      // differs from math.round on negative .5 boundaries
      if (sc == 0) xs.map(_ => 0L)
      else xs.map(x => BigDecimal(x.toDouble * 127.0 / sc)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    for ((id, xs) <- rows; j <- 0 until k) {
      val q = quant(xs)
      val want = (0 until dim).map(i =>
        q(i) * Embeddings.projectionSign(i, j, "rp")).sum
      assert(got((id, j)) == want, s"(id=$id, j=$j)")
    }
    // zero vector → all-zero projection; identical inputs agree
    assert((0 until k).forall(j => got((2L, j)) == 0L))
    assert((0 until k).forall(j => got((1L, j)) == got((3L, j))))
    // map-side law: the plan contains no shuffle
    val plan = Embeddings.signedProjection(df, "vec_id", "embedding",
      dim = dim, k = k).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
  }
}
