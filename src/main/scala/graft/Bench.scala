package graft
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * The timed action is a `noop`-format write — it fully evaluates every
  * output column on the executors (unlike `.count()`, which lets
  * Catalyst prune unevaluated projections down to a parquet row count)
  * so the bench measures exactly what Verify verifies.
  *
  * Timing design. Two prior rounds lost their number to the wall
  * budget: round 3 (warm-up + 3 full rounds × 43 queries) was killed
  * externally at rc=124, and round 4's warm-up ALONE blew the soft
  * deadline because one query rode a CPU-steal window to 917 s (vs
  * ~10 s calm) and nothing bounded a single evaluation. Hence:
  *
  *  - EVERY evaluation — warm-up included — runs under a watchdog
  *    that cancels the query's Spark job group once a per-query cap
  *    elapses. The cancel is re-issued until the query returns, so a
  *    multi-job query (pipeline, streaming gate) cannot slip a fresh
  *    job in after the first cancel. A capped query records the cap
  *    it hit and is listed in `capped` in the output — a lower bound,
  *    visibly distinguished from a clean time.
  *  - Warm-up exists to buy JIT/codegen/shuffle-file warmth, not to
  *    produce numbers — so it is budgeted at `warmupFrac` (40%) of the
  *    soft deadline, and the budget is a HARD STOP: a pooled task that
  *    starts past it runs nothing and queues for the timed rounds as a
  *    never-warmed query. (Rounds 10–11 merely downgraded the cap past
  *    the budget, so a contended host still warmed all 228 queries —
  *    337.7 s of a 360 s deadline — and shipped `rounds_completed: 0`
  *    twice.) Known-heavy queries — and, since r14, EVERY streaming
  *    query and every p0 pipeline — warm under `capMin` ALWAYS (a
  *    10 s slice compiles their codegen, seeds their shuffle files,
  *    and pays stream-startup/state-store-init cold cost; their real
  *    number comes from the guaranteed-first retime below, or for p0s
  *    from the sequential timed pass). Round 13's driver artifact is
  *    the cautionary tale: five streaming queries finished a
  *    contended warm-up clean-but-cold at 31–45 s — past `retimeCap`,
  *    so the old rule never retimed them and 14–23×-steady values
  *    shipped as final. Clean warm-up times above `retimeCap` on
  *    production queries are now SUSPECT and retried under `capMax`.
  *    Round 8 shipped the opposite policy — heavy warmed last under
  *    the full 60 s cap — and warm-up ate 266 s of a 366 s wall:
  *    `rounds_completed: 0` with cold values 6–10× above steady state.
  *  - Warm-up runs CONCURRENTLY (`warmupThreads`, default 6): at
  *    159 registered queries a sequential once-through costs ~190 s
  *    of a 360 s wall by itself, leaving no budget for steady
  *    rounds. A small pool overlaps the many sub-second queries
  *    (each codegen compile is driver-side anyway, and `local[32]`
  *    is idle-heavy under them); warm-up wall drops ~2×. Warm-up
  *    numbers carry contention noise — which is fine, they are
  *    placeholders: the timed rounds below re-measure SEQUENTIALLY,
  *    and any query whose only number is a warm-up number is by
  *    construction one the retime rounds deemed sub-significant
  *    (< 1 s). Job groups are thread-local in SparkContext, so each
  *    eval's watchdog cancels only its own jobs.
  *  - Warm-up order is heavy-FIRST (the queries whose steady number
  *    depends on warmth get their slice before the hard stop can
  *    fire), then the ns/s extensions, with the cheap q/o/j/dq core
  *    last: whatever the hard stop skips cold-retimes in the rounds,
  *    and the core's cold cost is 1–2 s per query vs 10–30 s for a
  *    skipped heavy one.
  *  - Then up to TWO timed rounds run ROUND-ROBIN over the re-timable
  *    subset, reporting the per-query minimum. Round-robin matters on
  *    this host: CPU-steal windows of ~30 s inflate back-to-back
  *    repeats together but cannot hit the same query in all
  *    spaced-out rounds. The rounds phase has a FLOOR of half the
  *    deadline to itself: if warm-up + the sequential p0 section ate
  *    the nominal deadline, roundsEnd extends (bounded at 1.25× of
  *    the deadline) so `rounds_completed >= 1` survives a 2–3× host
  *    slowdown. Each round visits production-tier queries before the
  *    declared diagnostics/algorithm-gates; within a tier, capped and
  *    never-warmed queries FIRST and then the rest in descending
  *    warm-up time, so the queries whose recorded numbers are phony
  *    (capped), absent (skipped), or coldest get their spaced retime
  *    while wall budget remains. Re-timable = warm-up succeeded under
  *    `retimeCap` (a 30 s query does not need steady-state precision,
  *    it needs to not eat the budget again), was capped (lower bound —
  *    the retry runs under the full `capMax`), or was skipped by the
  *    warm-up hard stop (first visit doubles as warm-up, bounded at
  *    `retimeCap`); p0 pipelines are ~10-job correctness gates and run
  *    exactly once. A final coverage sweep gives any still-unvisited
  *    query one `capMin` attempt so the artifact is complete.
  *  - Output says what actually happened: `rounds_completed`,
  *    `retimed` (count), `capped` (names), `warmup_wall_sec`. A
  *    consumer can tell steady-state minima from cold or capped
  *    numbers (round-4 ADVICE).
  *
  * Failures are not swallowed: a failed query reports -1 and forces
  * total = -1 so a regression can never read as a speedup. Capped
  * queries keep their (lower-bound) elapsed time instead — a steal
  * window must not read as an engine failure — but are flagged.
  *
  * Output: `value` = sum over ALL queries; `core_total` = sum over the
  * relational/operator core (names starting q, o, or j — not the ns
  * LLM-data suite, the p0 pipelines, or the s0 streaming queries) —
  * comparable against round 1's 20-query total after subtracting its
  * since-fixed o10 file storm. `tier_totals` splits the total by
  * registry tier (SparkEntry.queryTier): `production` is the number
  * that predicts scale behavior; `diagnostic`/`algorithm_gate` are
  * declared fixture-scale tooling, and at sf >= 1 they run under
  * `capMin` so they can never dominate the headline. `not_retimed`
  * names the queries whose number is a warm-up measurement, not a
  * spaced steady-state one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    // 30 s: above any query's calm time at sf0.1 (heaviest ~17 s) so a
    // clean warm-up is always retimable; the caps bound the worst case.
    val retimeCap =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETIME_CAP_SEC", "30").toDouble
    val deadline =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "360").toDouble
    val capMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_CAP_SEC", "60").toDouble
    val capMin =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_CAP_MIN_SEC", "10").toDouble
    val warmupFrac =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP_FRAC", "0.4").toDouble
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    /** One evaluation under a watchdog. Returns Right(sec) on a clean
      * finish, Left(sec) if the watchdog cancelled it at ~capSec.
      */
    val evalSeq = new java.util.concurrent.atomic.AtomicInteger(0)
    def runCapped(name: String, capSec: Double): Either[Double, Double] = {
      val group = s"bench-$name-${evalSeq.incrementAndGet()}"
      val fired = new AtomicBoolean(false)
      val watchdog = new Thread(() => {
        try {
          Thread.sleep((capSec * 1000).toLong)
          fired.set(true)
          // Re-issue: cancelJobGroup only kills ACTIVE jobs; a query
          // that starts another job after the first cancel needs the
          // next tick to die too.
          while (!Thread.interrupted()) {
            sc.cancelJobGroup(group)
            Thread.sleep(500)
          }
        } catch { case _: InterruptedException => }
      }, s"bench-watchdog-$name")
      watchdog.setDaemon(true)
      sc.setJobGroup(group, s"bench $name", interruptOnCancel = true)
      val s0 = System.nanoTime()
      try {
        watchdog.start()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - s0) / 1e9)
      } catch {
        case e: Throwable if fired.get() =>
          Left((System.nanoTime() - s0) / 1e9)
      } finally {
        watchdog.interrupt()
        sc.clearJobGroup()
      }
    }

    val names = SparkEntry.queries.keys.toSeq
    // Registry tiers (SparkEntry.queryTier): at sf >= 1 the declared
    // diagnostics/algorithm-gates — superlinear BY DESIGN, with
    // registered sublinear twins — run under `capMin` in every phase,
    // so the headline total measures the scale paths and a fixture-
    // scale gate can never dominate bench wall. Their capped entries
    // stay visibly flagged in `capped`.
    val tier = SparkEntry.queryTier
    val sfScale = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.0)
    val capDiagnostics = sfScale >= 1.0
    def tierCap(n: String, cap: Double): Double =
      if (capDiagnostics && tier.getOrElse(n, "production") != "production")
        math.min(cap, capMin)
      else cap
    // Known-heavy at sf0.1 (LSH/ANN candidate joins, streaming gates):
    // warm them up LAST so a budget blow-out costs extensions, not core.
    val heavySet = Set("ns02_ngram_jaccard_pairs", "ns02b_ngram_jaccard_capped",
      "ns03_minhash_near_dup", "ns05_topk_cosine", "ns07_embedding_near_dup",
      "ns16_ivf_topk_cosine",
      "ns40_semantic_dedup",
      "ns54_knn_labels_ann",
      "ns07b_embedding_near_dup_capped", "ns40b_semantic_dedup_capped",
      "ns99_label_noise", "ns99b_label_noise_ann", "ns03b_minhash_exact",
      // The cluster
      // family ns37/ns49/ns52 is absent since round 11: ns37 is the
      // FixtureCache producer whose single ~14 s cold build must
      // COMPLETE in warm-up (capMin would cancel it — the poisoned-
      // warm-up trap) so the consumers warm against the stored map.
      "ns04b_simhash_exact", "ns106_ivf_incremental",
      // r11 session 4: PQ family (fit+encode producer, ADC consumer)
      // and the capped containment pair join — cold paths 4-6 s at
      // sf0.1, all measured under the capMin slice (QueryProbe)
      "ns146_pq_encode", "ns147_pq_adc_topk", "ns150_containment_pairs",
      "ns153_ivfpq_topk",
      // r12: the cross-corpus containment join (ns150's machinery
      // over eval ∪ planted quotes) — cold ~12 s at sf0.1
      "ns178_contamination_attribution",
      // r14: conversation-grain MinHash (LSH candidate join family)
      "ns194_conversation_near_dup",
      "ns194b_conversation_near_dup_exact")
    // r14 (round-13 verdict #1): EVERY streaming query warms under
    // capMin, not just the six that were hand-listed. On the r13
    // driver host, s03/s04/s09–s11 finished their contended warm-up
    // COLD at 31–45 s — past retimeCap, so they were never retimable
    // and the 14–23×-steady numbers shipped as final (652 s total,
    // rounds_completed: 0). A stream's cold cost is startup + state-
    // store init + codegen, all bought by a 10 s slice; the real
    // number comes from the guaranteed-first retime (a capped slice
    // marks the query capped, and capped queries retime first).
    def streamingQ(n: String): Boolean =
      n.length > 2 && n.charAt(0) == 's' && n.charAt(1).isDigit &&
        n.charAt(2).isDigit
    def heavy(n: String): Boolean = heavySet(n) || streamingQ(n)
    // The p0 PIPELINE family, by shape not by prefix-literal (r14):
    // `startsWith("p0")` silently excluded p10 from the sequential
    // once-through AND from the retime rounds — its 50 s cold pooled
    // number shipped as final in BENCH_r13. Any pNN query is a
    // multi-job end-to-end gate: pooled capMin warmth slice, then one
    // sequential contention-free timed pass, never retimed.
    def pipelineQ(n: String): Boolean =
      n.length > 2 && n.charAt(0) == 'p' && n.charAt(1).isDigit &&
        n.charAt(2).isDigit
    // Warm-up order is heavy-FIRST (r12): heavy queries are the ones
    // whose steady number depends on the warmth slice, and under the
    // hard stop whatever warm-up does not reach cold-retimes in the
    // rounds — so the skip tail should be the cheap core (cold cost
    // ~1–2 s each), not the heavy extensions (cold cost 10–30 s each,
    // which under contention would eat the whole rounds floor).
    // Before the hard stop + coverage sweep existed the order was
    // inverted so a budget death still left core numbers; now every
    // query is guaranteed a number downstream.
    def famRank(n: String): Int =
      if (heavy(n) || pipelineQ(n)) 0
      else if (n.startsWith("q") || n.startsWith("o") || n.startsWith("j") ||
        n.startsWith("dq")) 2
      else 1
    val warmupOrder = names.sortBy(n => (famRank(n), n))

    val times = scala.collection.mutable.Map.empty[String, Double]
    val cappedAt = scala.collection.mutable.Map.empty[String, Double]
    val retimed = scala.collection.mutable.Set.empty[String]
    // Per-query provenance of the RECORDED number (r15 verdict #3 —
    // the artifact must explain its own outliers): which phase
    // produced it, how many evaluations the query got, and the
    // engine-cache hit/miss delta of the recording evaluation (so a
    // cold-fit number is visibly cold). Cache deltas from pooled
    // warm-up evals can bleed across overlapping queries — warm-up
    // numbers are placeholders; the sequential/retime phases, which
    // produce the numbers that matter, measure their deltas cleanly.
    final case class Prov(phase: String, attempts: Int,
      cacheHits: Long, cacheMisses: Long)
    val prov = scala.collection.mutable.Map.empty[String, Prov]
    val lock = new Object
    def attempt(name: String, capSec: Double, isRetime: Boolean,
        phase: String): Unit =
      try {
        val wasCapped = lock.synchronized(cappedAt.contains(name))
        val (h0, m0) = CacheStats.totals()
        def recordProv(): Unit = {
          val (h1, m1) = CacheStats.totals()
          prov(name) = Prov(phase,
            prov.get(name).map(_.attempts).getOrElse(0) + 1,
            h1 - h0, m1 - m0)
        }
        def bumpAttempts(): Unit =
          prov.get(name) match {
            case Some(p) => prov(name) = p.copy(attempts = p.attempts + 1)
            case None => prov(name) = Prov("none", 1, 0L, 0L)
          }
        runCapped(name, capSec) match {
          case Right(sec) => lock.synchronized {
            if (isRetime) retimed += name
            cappedAt.remove(name)
            // A capped prior time is a lower bound, not a measurement:
            // a clean run REPLACES it even when slower.
            if (wasCapped || (times.getOrElse(name, Double.MaxValue) > sec &&
              times.getOrElse(name, 0.0) >= 0)) {
              times(name) = sec; recordProv()
            } else bumpAttempts()
          }
          case Left(sec) =>
            System.err.println(f"[bench] $name CAPPED at $sec%.1f s")
            lock.synchronized {
              if (!times.contains(name)) {
                times(name) = sec; cappedAt(name) = capSec
                recordProv()
              } else bumpAttempts()
            }
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          lock.synchronized {
            times(name) = -1.0
            // the -1 sentinel's provenance must say so, not carry a
            // stale earlier recording (r16 review)
            prov(name) = Prov("failed",
              prov.get(name).map(_.attempts).getOrElse(0) + 1, 0L, 0L)
          }
      }
    // Warm-up: heavy queries get a capMin warmth slice (their number
    // comes from the guaranteed-first retime); everything else runs
    // under the full cap while inside the warm-up budget. A small pool
    // overlaps evaluations (see timing design note above).
    //
    // The budget is a HARD STOP (round-11 verdict #1, two degraded
    // artifacts running): a pooled task that STARTS past the budget
    // does not run at all — it is recorded as skipped and enters the
    // retime rounds as a never-warmed query, ordered with the capped
    // ones. Round 11 only downgraded the cap past the budget, so on a
    // contended host all 228 queries still warmed (337.7 s of a 360 s
    // deadline) and the timed rounds got the scraps:
    // rounds_completed: 0 two rounds in a row.
    val warmupBudget = deadline * warmupFrac
    // 8 since r15 (was 6): at 289 queries the pooled warm-up is the
    // wall item that grows with every registry addition — the
    // contended r14 host spent 171 s of a 144 s budget and skipped
    // the tail. Two more lanes cut the wall ~20% at the cost of
    // placeholder-number noise the retime rounds re-measure anyway;
    // local[32] is idle-heavy under the many sub-second queries.
    val warmupThreads =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP_THREADS", "8").toInt
    val skippedWarmup =
      scala.collection.mutable.Set.empty[String] // guarded by `lock`
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, warmupThreads))
    // p0 pipelines run their TIMED pass exactly once (excluded from
    // retime rounds — they are ~10-job correctness gates), so their
    // single number must be contention-free: sequentially, after the
    // pool drains. Since r14 they ALSO get a capMin warmth slice in
    // the pool first (round-13 verdict #1b: p10 shipped a 50 s cold
    // number — codec + fixture build + first-run codegen — vs 3.5 s
    // steady; the slice buys that warmth, and the sequential clean
    // run REPLACES the slice's number by the capped-replace /
    // min-of-clean-times rule, so the artifact never keeps a pooled
    // contended time a clean sequential run beat).
    val seqOnce = warmupOrder.filter(pipelineQ)
    warmupOrder.foreach { n =>
      pool.submit(new Runnable {
        def run(): Unit =
          if (elapsed >= warmupBudget) {
            // p0s are not "skipped": their timed pass runs sequentially
            // below regardless of whether the warmth slice fit.
            if (!pipelineQ(n))
              lock.synchronized { skippedWarmup += n }
          }
          else attempt(n,
            tierCap(n, if (heavy(n) || pipelineQ(n)) capMin else capMax),
            isRetime = false, phase = "warmup")
      })
    }
    pool.shutdown()
    pool.awaitTermination(3600, java.util.concurrent.TimeUnit.SECONDS)
    seqOnce.foreach(n =>
      attempt(n, tierCap(n, capMax), isRetime = false,
        phase = "sequential"))
    val warmupWall = elapsed
    val warmupTimes = times.toMap
    def production(n: String): Boolean =
      tier.getOrElse(n, "production") == "production"
    // r14: a production query whose warm-up finished ABOVE retimeCap is
    // retimable too — under capMax, not retimeCap. On the r13 driver
    // host five streaming queries finished their contended warm-up at
    // 31–45 s (vs 2–3 s steady): past retimeCap they were "too slow to
    // bother retiming" by the old rule, so the cold numbers shipped as
    // final. A clean-but-slow warm-up time on a production query is
    // SUSPECT (cold + contention), and the retry is safe: a capped
    // retry never overwrites an existing clean time, so a genuinely
    // 40 s query keeps its 40 s while a cold-inflated one recovers.
    def retimable(name: String): Boolean =
      (skippedWarmup.contains(name) || cappedAt.contains(name) ||
        times.get(name).exists(t => t >= 0 &&
          (t <= retimeCap || production(name)))) &&
        !pipelineQ(name)
    // Timed-rounds floor (round-11 verdict #1b, re-derived r15): the
    // rounds phase gets at least 80% of the deadline OF ITS OWN,
    // measured from where the rounds actually start (after warm-up
    // AND the sequential p0 section). The old floor keyed off
    // warm-up wall + 0.5·deadline, which at 289 queries no longer
    // covers the significant production set (~250 s of steady time):
    // the r15 rehearsal run was cut at the nominal deadline with
    // 90 s of the 1.25× allowance unused and rounds_completed
    // stayed 0. Bounded at 1.25× of the deadline as before (the
    // driver's external kill sits well above that; r13's sbt wall
    // was 652 s of a 360 s deadline without a kill). On a calm host
    // where warm-up + p0s fit 20% of the deadline, roundsEnd ==
    // deadline and nothing changes.
    val roundsEnd = math.min(deadline * 1.25,
      math.max(deadline, elapsed + deadline * 0.8))
    // A round counts as COMPLETE when every SIGNIFICANT query — capped,
    // skipped in warm-up, or warm-up ≥ 1 s (cold-start inflation on a
    // sub-second query is bounded by that second) — got its spaced
    // retime. Only PRODUCTION-tier queries gate completeness: the
    // declared diagnostics/algorithm-gates (superlinear twins, md5
    // fixture gates) retime opportunistically, ordered last, so a slow
    // host truncates fixture-scale tooling precision, never the scale
    // paths, and rounds_completed still reports the fact that matters.
    def significant(n: String): Boolean =
      production(n) && (cappedAt.contains(n) || skippedWarmup.contains(n) ||
        warmupTimes.getOrElse(n, 0.0) >= 1.0)
    var roundsCompleted = 0
    for (r <- 1 to rounds) {
      var preempted = false
      // Production before tooling tiers; within a tier: capped and
      // never-warmed first (their numbers are phony or absent), then
      // coldest-first, so a budget blow-out truncates the cheap tail,
      // not the heavy head.
      val order = names.filter(retimable).sortBy(n =>
        (if (production(n)) 0 else 1,
          if (cappedAt.contains(n) || skippedWarmup.contains(n)) 0 else 1,
          -warmupTimes.getOrElse(n, 0.0), n))
      for (name <- order)
        if (elapsed < roundsEnd)
          attempt(name, tierCap(name,
            // Capped lower bounds and suspect-slow clean warm-ups
            // (> retimeCap — cold/contended inflation) retry under the
            // full cap: a capped retry never overwrites a clean time,
            // so this can only improve the artifact.
            if (cappedAt.contains(name) ||
              warmupTimes.getOrElse(name, 0.0) > retimeCap) capMax
            // A never-warmed query's first visit doubles as its
            // warm-up: bound it at retimeCap so one pathological cold
            // path cannot eat the rounds floor.
            else retimeCap),
            isRetime = true, phase = s"round$r")
        else if (significant(name)) preempted = true
      if (!preempted) roundsCompleted = r
    }
    // Coverage sweep: any query that was skipped in warm-up AND never
    // reached by the rounds still needs a number in the artifact (a
    // missing entry would read as an engine failure). One capMin
    // attempt each, flagged capped when cut short — an honest lower
    // bound, visibly distinguished from a steady minimum. The sweep
    // itself is BOUNDED (round-12 advice): on a host contended enough
    // to leave many queries unvisited, an unguarded sweep could add
    // #skipped × capMin past the documented 1.25× deadline wall and
    // re-risk the external driver kill the rounds floor was built to
    // avoid. Hard end: roundsEnd + 15% of the deadline; per-query
    // caps shrink to the remaining margin, and once past the end the
    // rest record a 0-second CAPPED entry — explicitly "skipped, out
    // of budget" in the artifact, never a silent hole.
    val sweepEnd = roundsEnd + deadline * 0.15
    // Names whose recorded 0.0 is "sweep ran out of budget", not a
    // measurement (round-13 ADVICE): a dedicated artifact field so a
    // consumer comparing round-over-round totals can tell that this
    // run's total omits these queries' real cost, without cross-
    // referencing the capped list.
    val sweepSkipped = scala.collection.mutable.ArrayBuffer.empty[String]
    names.filterNot(times.contains).foreach { n =>
      if (elapsed < sweepEnd)
        attempt(n, math.min(tierCap(n, capMin),
          math.max(2.0, sweepEnd - elapsed)), isRetime = false,
          phase = "sweep")
      else lock.synchronized {
        System.err.println(s"[bench] $n SWEEP-SKIPPED (out of budget)")
        times(n) = 0.0; cappedAt(n) = 0.0; sweepSkipped += n
      }
    }
    // Phase decomposition to stderr: which queries' FIRST runs carry
    // the cold-start cost (codegen compile, index builds, shuffle-file
    // creation) that the steady-state minima no longer show.
    System.err.println(f"[bench] warmup_wall=$warmupWall%.1f " +
      f"rounds_wall=${elapsed - warmupWall}%.1f retimed=${retimed.size} " +
      s"warmup_skipped=${skippedWarmup.size} " +
      f"rounds_end=$roundsEnd%.1f " +
      s"capped=${cappedAt.keys.toSeq.sorted.mkString(",")}")
    warmupTimes.toSeq.sortBy(-_._2).take(12).foreach { case (n, s) =>
      System.err.println(f"[bench] warmup $n%-36s $s%8.2f s " +
        f"(steady ${times(n)}%.2f)")
    }
    val results = names.sorted.map(n => n -> times(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def sumOr(rs: Seq[(String, Double)]): Double =
      if (rs.exists(_._2 < 0)) -1.0 else rs.map(_._2).sum
    val total = sumOr(results)
    // core = the r01-comparable relational/operator families (q/o/j);
    // the ns suite, pipelines, and streaming queries are extensions
    val core = sumOr(results.filter { case (n, _) =>
      n.startsWith("q") || n.startsWith("o") || n.startsWith("j") })
    val cappedJson = cappedAt.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-tier totals: the production number is the one that predicts
    // scale behavior; diagnostics/algorithm-gates are declared
    // fixture-scale tooling (see SparkEntry.queryTier).
    val tierTotalsJson = Seq("production", "diagnostic", "algorithm_gate")
      .map { t =>
        s"\"$t\":" + sumOr(results.filter { case (n, _) =>
          tier.getOrElse(n, "production") == t })
      }.mkString("{", ",", "}")
    // Names whose reported number is NOT a spaced steady-state retime
    // (round-9 VERDICT item 1): warm-up-grade measurements, taken
    // under pool contention. p0 pipelines are excluded — they run
    // exactly once, sequentially, after the pool drains.
    val notRetimedJson = names.sorted
      .filter(n => !retimed.contains(n) && !pipelineQ(n))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Freshness stamp (round-7/8 ADVICE): a rerun is verifiably new.
    val runTs = java.time.Instant.now().toString
    val sweepSkippedJson = sweepSkipped.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-query provenance (r15 verdict #3): phase that produced the
    // recorded number, evaluation count, and the recording eval's
    // cache hit/miss delta — so an outlier explains itself (a
    // retimed number with cache_misses > 0 paid a cold fit; a
    // "warmup"-phase number was never retimed).
    val provJson = names.sorted.map { n =>
      val p = prov.getOrElse(n, Prov("none", 0, 0L, 0L))
      s""""$n":{"phase":"${p.phase}","attempts":${p.attempts},""" +
        s""""cache_hits":${p.cacheHits},"cache_misses":${p.cacheMisses}}"""
    }.mkString("{", ",", "}")
    val cacheStatsJson = CacheStats.snapshot().map { case (c, h, m) =>
      s""""$c":{"hits":$h,"misses":$m}"""
    }.mkString("{", ",", "}")
    val metricLine = s"""{"metric":"total","value":$total,"unit":"sec","run_ts":"$runTs","n_queries":${results.size},"core_total":$core,"tier_totals":$tierTotalsJson,"bench_wall_sec":$elapsed,"warmup_wall_sec":$warmupWall,"warmup_skipped":${skippedWarmup.size},"rounds_completed":$roundsCompleted,"retimed":${retimed.size},"not_retimed":$notRetimedJson,"capped":$cappedJson,"sweep_skipped":$sweepSkippedJson,"provenance":$provJson,"cache_stats":$cacheStatsJson,"queries":$qs,"sf":"$sfDir"}"""
    // The full line is ~4 KB at 64 queries and can start BEFORE the
    // driver's fixed-size tail window, leaving it a parse-proof
    // fragment (round-6 artifact: parsed=null despite the line being
    // present). A second, short, totals-only line — printed LAST —
    // always fits the window whole.
    val shortLine = s"""{"metric":"total","value":$total,"unit":"sec","run_ts":"$runTs","core_total":$core,"tier_totals":$tierTotalsJson,"n_queries":${results.size},"rounds_completed":$roundsCompleted,"capped":$cappedJson,"sweep_skipped":$sweepSkippedJson,"sf":"$sfDir"}"""
    // Durability: three of five rounds lost this line to tail spam
    // (watchdog-cancel stack traces through shutdown) or external
    // kills. So: silence logging, stop Spark FIRST so nothing can
    // print after us, then emit the line LAST on both streams, and
    // persist it to a file the driver can always read.
    sc.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => }
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_out.json"),
      (metricLine + "\n" + shortLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    System.err.println(metricLine)
    System.err.println(shortLine)
    System.err.flush()
    println(metricLine)
    println(shortLine)
    System.out.flush()
  }
}
