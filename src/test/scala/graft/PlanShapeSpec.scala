package graft

/** Physical-plan shape gates for the relational core: the claims in
  * README "Scale design rules (enforced, not aspirational)" as
  * assertions. These inspect the pre-execution physical plan — the
  * shapes (scan pushdown/pruning, partial aggregation, top-k
  * operators, broadcast dims, shuffle-free map plans) are decided at
  * planning time, so nothing needs to run. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q01: shipdate predicate reaches the parquet scan; partial aggs") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
    // map-side combine: partial aggregate below the exchange
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
  }

  test("q02: lineitem scan pruned to the 3 needed columns") {
    val p = plan("q02_revenue_by_brand")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .getOrElse(fail(s"no lineitem scan:\n$p"))
    assert(scanLine.contains("l_partkey") &&
      scanLine.contains("l_extendedprice") &&
      scanLine.contains("l_discount"))
    assert(!scanLine.contains("l_comment") &&
      !scanLine.contains("l_shipdate"),
      s"lineitem scan reads unneeded columns:\n$scanLine")
  }

  test("q03: constant-size dims (nation, region) are broadcast") {
    val p = plan("q03_local_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q06: sort+limit plans as TakeOrdered, not a global sort") {
    val p = plan("q06_top100_orders")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
  }

  test("q07: per-group top-k prunes per-partition before the exchange") {
    val p = plan("q07_top3_orders_per_customer")
    // WindowGroupLimit appears twice: Partial (before the shuffle,
    // bounding what ships) and Final. The Partial one is the scale win.
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial"), s"no partial group-limit:\n$p")
  }

  test("q08 lateral flatten and ns08 text stats are shuffle-free") {
    for (name <- Seq("q08_lateral_flatten", "ns08_text_stats")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("r11 map-side gates are shuffle-free: lang profile, mojibake " +
      "repair, WARC walk (plain + gzip)") {
    // ns121/ns122 are one projection chain per row; ns120/ns125 read
    // the cached container frame and fan records out map-side — at
    // 100 TB each costs exactly one scan, and the plan must prove it
    for (name <- Seq("ns121_lang_profile", "ns122_mojibake_repair",
      "ns120_warc_parse", "ns125_warc_gzip")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("ns121: the language scorer runs as the fused kernel inside " +
      "WholeStageCodegen, not an interpreted HOF tree") {
    val p = plan("ns121_lang_profile")
    val kernelLine = p.linesIterator.find(_.contains("lang_scores"))
      .getOrElse(fail(s"kernel expression absent:\n$p"))
    // "*(n)" prefixes are executedPlan.toString's WholeStageCodegen
    // stage markers: the scoring projection must sit inside one
    assert(kernelLine.trim.startsWith("+- *(") ||
      kernelLine.trim.startsWith("*("),
      s"kernel projection not codegen-fused:\n$kernelLine")
    assert(!p.contains("aggregate(") && !p.contains("zip_with"),
      s"interpreted HOF fold left in the plan:\n$p")
  }

  test("r11 stage-0 additions are shuffle-free: NFC normalize, " +
      "markdown extract, code-quality battery") {
    for (name <- Seq("ns127_nfc_normalize", "ns128_markdown_extract",
      "ns129_code_quality")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("ns127: NFC runs as the codegen'd kernel inside " +
      "WholeStageCodegen") {
    val p = plan("ns127_nfc_normalize")
    val kernelLine = p.linesIterator.find(_.contains("nfc_normalize"))
      .getOrElse(fail(s"kernel expression absent:\n$p"))
    assert(kernelLine.trim.startsWith("+- *(") ||
      kernelLine.trim.startsWith("*("),
      s"kernel projection not codegen-fused:\n$kernelLine")
  }

  test("ns126: the near-dup sweep reads the stored cluster map with a " +
      "broadcast equi-join — no re-clustering, no cartesian") {
    val p = plan("ns126_takedown_near_dup")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unbounded join:\n$p")
  }

  test("r12 map-side additions are shuffle-free: NFKC casefold and " +
      "chat-JSONL ingest; the fold runs as the codegen'd kernel") {
    for (name <- Seq("ns159_nfkc_casefold", "ns169_chat_jsonl")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
    val p = plan("ns159_nfkc_casefold")
    val kernelLine = p.linesIterator.find(_.contains("nfkc_casefold"))
      .getOrElse(fail(s"kernel expression absent:\n$p"))
    assert(kernelLine.trim.startsWith("+- *(") ||
      kernelLine.trim.startsWith("*("),
      s"kernel projection not codegen-fused:\n$kernelLine")
  }

  test("ns164: BM25 broadcasts the query/vocabulary sides and never " +
      "plans a cartesian; the posting cap plans as a window group " +
      "limit") {
    val p = plan("ns164_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    // the 1-row corpus-stats attach is a deliberate broadcast cross
    // join (BroadcastNestedLoopJoin); only a true cartesian is banned
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"posting cap not partition-pruned:\n$p")
  }

  test("ns166: the MIPS scan broadcasts the pinned query side (the " +
      "declared bounded-|Q| cross join)") {
    val p = plan("ns166_int8_mips")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("Manifest.readAt: snapshot scans stay ordinary parquet scans — " +
      "data-column filters and column pruning reach every per-key " +
      "scan (r15; the partition pruning is the path list itself)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_plan").toString + "/t"
    val spark2 = spark
    import spark2.implicits._
    val t0 = Seq((1L, "alpha", 10L), (2L, "beta", 20L))
      .toDF("id", "name", "part")
    graft.ops.Manifest.commitReplacePartitions(t0, dir, "part", "init")
    graft.ops.Manifest.commitReplacePartitions(
      Seq((3L, "gamma", 20L)).toDF("id", "name", "part"),
      dir, "part", "fix20")
    val p = graft.ops.Manifest.read(spark, dir, "part")
      .filter(col("id") > 1L).select(col("id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"id filter not pushed to the snapshot scans:\n$p")
    // projection pruned to the one needed data column
    assert(p.contains("ReadSchema: struct<id:bigint>"),
      s"snapshot scan not column-pruned:\n$p")
    assert(!p.contains("name"), s"unneeded column read:\n$p")
  }
}
