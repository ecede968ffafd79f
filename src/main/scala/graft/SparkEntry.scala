package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.functions.py_to_json
import graft.ingest.JsonIngest
import graft.dq.{Checks, Metadata}
import graft.model.Schemas
import graft.ns.{Dedup, Linkage, Multimodal, Sampling, Similarity, Sketches, TextOps}
import graft.ops.{IdempotentWriter, Relational}
import graft.pipeline.Run
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here,
  * plus (where ANSI-SQL-expressible) a DuckDB oracle in [[oracleSql]].
  * Column names and types are aligned between the Spark plan and the
  * oracle SQL because the driver's compare hashes values under sorted
  * column names.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(
      t(spark, "/root/testdata/sf0.001", "lineitem"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregation (hash agg, partial+final) ----
    "q01_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(t(s, d, "lineitem"))),

    // ---- §2.3 joins: broadcast fact⋈dim ----
    "q02_revenue_by_brand" -> ((s, d) =>
      Relational.revenueByBrand(t(s, d, "lineitem"), t(s, d, "part"))),

    // ---- §3 templated-SQL lifecycle: parameterized spark.sql ----
    // The reference renders Jinja parameters into SQL text
    // (run_hr/xcom pulls) and ships it to a warehouse. The Spark
    // analogue is the PARAMETERIZED sql API — named markers bound
    // server-side, no string splicing (the injection-safe form of
    // templating). Gated: the rendered query is q01's SQL and must
    // hash-match q01's oracle exactly, proving the SQL entry point
    // and the DataFrame entry point are the same engine.
    "q15_parameterized_sql" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE) AS sum_charge,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
          |  MIN(l_quantity) AS min_qty,
          |  MAX(l_extendedprice) AS max_price,
          |  COUNT(*) AS count_order
          |FROM lineitem_v
          |WHERE l_shipdate <= :cutoff
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,
        Map("cutoff" -> "1998-09-01 00:00:00"))
    }),

    // ---- §2.1 declared-schema CSV load with quarantine ----
    // CSV face of the bronze→silver ingest: fixture lines derived
    // from documents (the ns29 trick) plus two planted malformed
    // rows; PERMISSIVE parse lands bad rows as data (raw line kept),
    // and the oracle reproduces both the clean and quarantined rows.
    "j04_csv_ingest" -> ((s, d) => {
      val dir = newScratchDir("graft_csv")
      val lines = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("source"),
          length(col("text")).as("n_chars"))
        .collect()
        .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getInt(2)}")
      val planted = Seq("not_a_number,srcX,12", "13,srcY,not_an_int")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getPath, "docs.csv"),
        (lines.toSeq ++ planted).mkString("\n").getBytes("UTF-8"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("source", StringType),
        StructField("n_chars", IntegerType)))
      materializeAndDrop(
        graft.ingest.CsvIngest.readQuarantined(s, dir.getPath, schema)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col(graft.ingest.CsvIngest.corruptCol).isNotNull
              .as("quarantined")), dir)
    }),

    // ---- §2.3 joins: multi-table star join ----
    "q03_local_supplier_revenue" -> ((s, d) =>
      Relational.localSupplierRevenue(
        t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem"),
        t(s, d, "supplier"), t(s, d, "nation"), t(s, d, "region"), "ASIA")),

    // ---- §2.3 semi/anti joins (EXISTS / NOT EXISTS) ----
    "q04_customers_with_open_orders" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      Relational.semiJoin(c, o, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"))
    }),
    "q05_customers_without_partial_orders" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "P")
      Relational.antiJoin(c, o, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // ---- §2.4 sort + limit (TakeOrderedAndProject, no global sort) ----
    "q06_top100_orders" -> ((s, d) =>
      Relational.topK(
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        100, col("o_totalprice").desc, col("o_orderkey").asc)),

    // ---- §2.4 window: per-group top-k ----
    "q07_top3_orders_per_customer" -> ((s, d) =>
      Relational.topKPerGroup(
        t(s, d, "orders"), 3,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))),

    // ---- §2.3 J1: lateral flatten (CROSS JOIN UNNEST) ----
    // Per-row arrays only (split of a string column): the flatten is a
    // pure map-side Generate, no aggregation, nothing unbounded — the
    // shape the reference's CROSS JOIN UNNEST over a JSON array field
    // actually has. (The old q08 materialized every order key of a
    // customer through collect_list first; an aggregation a hot key
    // would OOM at corpus scale. The collect_list ∘ explode ≡ id law
    // it proved lives on as a bounded-sample test in RelationalSpec,
    // and the real JSON-array flatten is gated by p02.)
    "q08_lateral_flatten" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"),
          (col("pos") + 1).cast("long").as("word_idx"),
          col("col").as("word"))),

    // ---- §2.3 U1: UNION ALL ----
    "q09_union_all_counts" -> ((s, d) => {
      val a = t(s, d, "orders").groupBy(col("o_orderstatus").as("category"))
        .agg(count(lit(1)).as("n"))
      val b = t(s, d, "events").groupBy(col("event_type").as("category"))
        .agg(count(lit(1)).as("n"))
      a.unionAll(b)
    }),

    // ---- §2.3 set ops: INTERSECT / EXCEPT (distinct semantics) ----
    "q13_intersect" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .intersect(t(s, d, "customer").filter(col("c_acctbal") > 0)
          .select(col("c_custkey").as("custkey")))),
    "q14_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))),

    // ---- §2.7 UDAF: bounded top-k Aggregator (vs q07's window) ----
    "q12_topk_aggregator" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(graft.ops.TopKAgg.top_k(3)(
          col("o_totalprice"), col("o_orderkey")).as("topk"))
        .select(col("o_custkey"), posexplode(col("topk")))
        .select(col("o_custkey"), col("col.id").as("o_orderkey"),
          col("col.score").as("o_totalprice"),
          (col("pos") + 1).cast("long").as("rn"))),

    // ---- §2.4 multi-level grouping: ROLLUP / CUBE in one pass ----
    "q10_rollup_agg" -> ((s, d) =>
      Relational.rollupAgg(t(s, d, "orders"),
        "o_orderstatus", "o_orderpriority", "o_totalprice")),
    "q11_cube_agg" -> ((s, d) =>
      Relational.cubeAgg(t(s, d, "orders"),
        "o_orderstatus", "o_orderpriority", "o_totalprice")),

    // ---- §2.2 O1/O2: nested-field projection + struct rebuild ----
    "o01_nested_struct_projection" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("ord", struct(
          col("o_orderdate").as("odate"),
          col("o_totalprice").as("price"),
          struct(col("o_orderstatus").as("status"),
            col("o_orderpriority").as("priority")).as("meta")))
        .select(col("o_orderkey"),
          col("ord.price").as("price"),
          col("ord.meta.status").as("status"),
          year(col("ord.odate")).cast("long").as("order_year"))),

    // ---- §2.2 O3: JSON path extraction (VARIANT-style) ----
    "o03_json_path_extract" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"))),

    // ---- §2.2 O4/O5: explicit cast chains ----
    "o04_cast_chain" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 2).cast("int").cast("boolean").as("is_even"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_shipdate").cast("date").cast("string").as("ship_date_str"))),

    // ---- §2.2 O6: timestamp munging (append :00, parse, trunc) ----
    "o06_timestamp_munging" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        to_timestamp(
          concat(date_format(col("ts"), "yyyy-MM-dd HH:mm"), lit(":00")),
          "yyyy-MM-dd HH:mm:ss").as("parsed_ts"),
        date_trunc("hour", col("ts")).as("hour_ts"))),

    // ---- §2.2 O7: run-hour derivation + per-run rollup ----
    "o07_run_hr_rollup" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(JsonIngest.runHr(col("ts")).as("run_hr"))
        .agg(count(lit(1)).as("n"),
          Relational.exactSum(col("value")).as("total"))),

    // ---- §2.2 O8: key normalization ----
    "o08_key_normalization" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderpriority")).distinct()
        .select(col("o_orderpriority"),
          JsonIngest.normKey(col("o_orderpriority")).as("norm_key"))),

    // ---- §2.2 O9: python-repr JSON repair (custom expression) ----
    "o09_json_repair_roundtrip" -> ((s, d) => {
      val dirty = concat(
        lit("{'lang': '"), col("lang"),
        lit("', 'n': "), col("n_chars"),
        lit(", 'flag': True, 'src': '"), col("source"), lit("',}"))
      t(s, d, "documents")
        .select(col("doc_id"), py_to_json(dirty).as("repaired"))
        .select(col("doc_id"),
          get_json_object(col("repaired"), "$.lang").as("lang2"),
          get_json_object(col("repaired"), "$.n").cast("long").as("n2"),
          get_json_object(col("repaired"), "$.flag").cast("boolean")
            .as("flag"),
          get_json_object(col("repaired"), "$.src").as("src2"))
    }),

    // ---- §2.2 O10: idempotent dynamic-partition-overwrite write ----
    // One write only (the write∘write≡write replay law is proven in
    // IngestSpec); repartition on run_hr first so each partition
    // directory receives ONE file instead of shuffle-partitions tiny
    // ones. The reference replaces exactly one run's partition per run
    // (delete+insert keyed on run_hr), so the benched write covers one
    // day's 24 run_hr partitions — not the fixture's full 720-directory
    // history, whose file-creation storm was 75% of the round-1 bench
    // and models nothing the pipeline ever does. The scratch dir is
    // unique per invocation (no cross-run races) and deleted eagerly
    // once the result is materialized.
    "o10_idempotent_partition_overwrite" -> ((s, d) => {
      val gold = t(s, d, "events")
        .filter(col("ts") >= lit("2024-01-30 00:00:00"))
        .groupBy(JsonIngest.runHr(col("ts")).as("run_hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          Relational.exactSum(col("value")).as("total"))
      val dir = newScratchDir("graft_o10")
      val path = s"${dir.getPath}/gold"
      IdempotentWriter.replacePartitions(
        gold.repartition(col("run_hr")), path, Seq("run_hr"))
      materializeAndDrop(
        s.read.parquet(path).select(col("run_hr").cast("long").as("run_hr"),
          col("event_type"), col("n"), col("total")), dir)
    }),

    // ---- §2.2 O12: audit columns, gated with an INJECTED clock ----
    // created_at_ts is statement-constant in the reference warehouses
    // (DEFAULT CURRENT_TIMESTAMP evaluates once per statement);
    // withAuditCols(at=...) injects that batch instant explicitly —
    // the replay/backfill form — which is what makes the gate
    // deterministic. The wall-clock default stays covered by
    // PipelineSpec.
    // The instant is written in UTC to match the oracle's naive
    // TIMESTAMP literal under spark.sql.session.timeZone=UTC; an
    // Instant literal is deterministic on any JVM default TZ.
    "o12_audit_columns" -> ((s, d) =>
      graft.pipeline.Run.withAuditCols(t(s, d, "nation"),
        runHr = 202608121100L,
        at = Some(java.time.Instant.parse("2026-08-12T11:00:00Z")))),

    // ---- §2.2 O12/O13: literal injection (run_hr) ----
    "o13_literal_injection" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        lit(202608121100L).as("run_hr"))),

    // ---- §2.1 S12: query→notification render, driver-gated ----
    // The reference's SqlToSlackOperator templates a query result into
    // a message string. Deterministic here: a sorted 5-row query and a
    // fixed template; the oracle rebuilds the identical string with
    // string_agg. renderMessage's bounded collect is the operator
    // (notification queries are small by contract).
    "s12_notification_render" -> ((s, d) => {
      import s.implicits._
      val msg = graft.pipeline.Notify.renderMessage(
        t(s, d, "region").select(col("r_name")).orderBy("r_name"),
        "Regions loaded:\n{{ results_df }}")
      Seq(msg).toDF("message")
    }),

    // ---- §2.2 O14: data-driven column rename map ----
    "o14_rename_map" -> ((s, d) => {
      val renames = Seq(
        "p_partkey" -> "part_key", "p_name" -> "part_name",
        "p_brand" -> "brand", "p_type" -> "part_type",
        "p_size" -> "part_size", "p_retailprice" -> "retail_price")
      t(s, d, "part").select(
        renames.map { case (o, n) => col(o).as(n) }: _*)
    }),

    // ---- §2.2 O15: keyed MERGE (upsert), partition-pruned COW ----
    // Target = nation partitioned by n_regionkey; delta = updated
    // names for region-1 keys < 10 plus one inserted key. The merge
    // reads and rewrites ONLY the region-1 directory (byte-identical
    // untouched-partition law in MergeUpsertSpec); the gate checks the
    // read-back table against the same anti-join+union in SQL.
    "o15_keyed_merge" -> ((s, d) => {
      val dir = newScratchDir("graft_o15")
      val path = s"${dir.getPath}/target"
      val nation = t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
      graft.ops.MergeUpsert.init(nation, path, "n_regionkey")
      val delta = nation
        .filter(col("n_regionkey") === 1 && col("n_nationkey") < 10)
        .select(col("n_nationkey"),
          concat(col("n_name"), lit("_v2")).as("n_name"),
          col("n_regionkey"))
        .unionByName(s.range(1).select(
          lit(990L).as("n_nationkey"), lit("NEWLAND").as("n_name"),
          lit(1L).as("n_regionkey")))
      graft.ops.MergeUpsert.merge(delta, path,
        Seq("n_nationkey"), "n_regionkey")
      materializeAndDrop(
        s.read.parquet(path).select(
          col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey")), dir)
    }),

    // ---- §2.1 schema evolution across landed batches ----
    // Production tables GROW columns across runs; readers must take
    // the union schema and null-fill history. Fixture: an early batch
    // written WITHOUT n_chars, a later batch with it; a mergeSchema
    // read returns the union with nulls where the column predates —
    // the reference's staging-table evolution, on parquet.
    "j05_schema_evolution" -> ((s, d) => {
      val dir = newScratchDir("graft_evo")
      val docs = t(s, d, "documents")
      docs.filter(col("doc_id") < 50)
        .select(col("doc_id"), col("source"))
        .coalesce(1).write.parquet(s"${dir.getPath}/batch=0")
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
        .select(col("doc_id"), col("source"),
          length(col("text")).as("n_chars"))
        .coalesce(1).write.parquet(s"${dir.getPath}/batch=1")
      materializeAndDrop(
        s.read.option("mergeSchema", "true").parquet(dir.getPath)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("batch").cast("int").as("batch")), dir)
    }),

    // ---- §2.1 small-file compaction ----
    // The lakehouse hygiene op: a fragmented landing (64 files) is
    // compacted to a handful and must read back content-identical.
    // IngestSpec pins the file counts; the gate pins the content.
    "j08_compaction" -> ((s, d) => {
      val dir = newScratchDir("graft_compact")
      t(s, d, "documents").repartition(64)
        .write.parquet(s"${dir.getPath}/frag")
      s.read.parquet(s"${dir.getPath}/frag").coalesce(2)
        .write.parquet(s"${dir.getPath}/compact")
      materializeAndDrop(
        s.read.parquet(s"${dir.getPath}/compact")
          .select(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")), dir)
    }),

    // ---- §3 SQL-function surface (SparkSessionExtensions) ----
    // The same custom expression nodes, reached through SQL: the
    // extension registers py_to_json and top_gram in the function
    // registry, and this gate re-proves ns70's n=2 slice through the
    // SQL front door plus a constant-folded repair.
    "q16_sql_function_surface" -> ((s, d) => {
      t(s, d, "documents").createOrReplaceTempView("documents_v")
      s.sql("""SELECT doc_id,
        |  top_gram(text, 2).gram AS top2_gram,
        |  top_gram(text, 2).frac AS top2_frac,
        |  py_to_json('{''cnt'': 1, ''ok'': True}') AS repaired
        |FROM documents_v""".stripMargin)
    }),

    // ---- §2.1 ORC sink + source roundtrip ----
    // Columnar interchange beyond parquet: write a typed slice
    // (ints, strings, doubles, dates) to ORC, read it back, gate
    // against the parquet oracle — fidelity across the format
    // boundary is the whole test.
    "j06_orc_roundtrip" -> ((s, d) => {
      val dir = newScratchDir("graft_orc")
      t(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"))
        .write.orc(s"${dir.getPath}/orc")
      materializeAndDrop(s.read.orc(s"${dir.getPath}/orc"), dir)
    }),

    // ---- §2.3 J2: VARIANT parse-once + field access ----
    "j02_variant_single_parse" -> ((s, d) =>
      JsonIngest.variantParsed(
        t(s, d, "events").select(col("event_id"), col("props")),
        StructType(Seq(StructField("k", IntegerType))), "props")
        .select(col("event_id"), col("parsed.k").as("k"))),

    // ---- §2.2 O3 Spark-4-native: true VariantType path access ----
    "j03_variant_native" -> ((s, d) =>
      JsonIngest.variantNative(
        t(s, d, "events").select(col("event_id"), col("props")), "props")
        .select(col("event_id"),
          variant_get(col("variant"), "$.k", "int").as("k"))),

    // ---- §2.6/§4.2: one-pass multi-column profile ----
    // approx_distinct is engine-specific, so the oracle-gated output
    // keeps the exact metrics; the sketch column is covered in
    // ProfileVariantSpec.
    "ns15_column_profile" -> ((s, d) =>
      graft.dq.Profile.profile(t(s, d, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey"))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("min_str"), col("max_str"))),

    // ---- §2.6 Q4: DQ run → metadata assertion-run records ----
    // The reference's DataHub emission re-expressed as a projection of
    // dq_results; deterministic URNs, no wall-clock columns, so the
    // whole metadata surface sits behind a DuckDB oracle.
    "dq01_assertion_events" -> ((s, d) => {
      val dq = Checks.runChecks(t(s, d, "orders"), "orders",
        202608121100L,
        Checks.CheckConfig(minRows = 1,
          maxNullRate = Map("o_custkey" -> 0.0),
          uniqueKey = Some(Seq("o_orderkey"))))
      Metadata.assertionRunEvents(dq, "graft")
    }),

    // ---- Q4: DataHub link/tag aspects per monitored dataset ----
    // Monitored set = the distinct document sources; the reference's
    // per-dataset add_link (institutionalMemory + Monitored_By tag)
    // becomes one projection emitting both aspect records per source.
    "dq02_datahub_aspects" -> ((s, d) => {
      val monitored = t(s, d, "documents")
        .select(col("source").as("table_name"))
      Metadata.monitoringAspects(monitored, "graft",
        concat(lit("https://dq.example/runbook/"), col("table_name")),
        concat(lit("DQ runbook for "), col("table_name")))
    }),

    // ---- §2.6 Q1+ metric anomaly detection, gated ----
    // The volume-spike/drop check on every hourly metric series:
    // z-score vs the group's own history over exact cent-grid sums
    // (ns91's fixed-operand-order derivation makes z hash-stable).
    "dq03_metric_anomaly" -> ((s, d) =>
      graft.dq.Checks.metricAnomalies(t(s, d, "events"),
        "event_type", "ts", "value")),

    // ---- §2.6 Q1+ referential integrity (FK orphans) ----
    // Silent join loss, measured: child rows with no parent key.
    "dq04_fk_orphans" -> ((s, d) =>
      graft.dq.Checks.fkOrphans(t(s, d, "orders"), "o_custkey",
          t(s, d, "customer"), "c_custkey", "orders")
        .unionByName(graft.dq.Checks.fkOrphans(t(s, d, "lineitem"),
          "l_orderkey", t(s, d, "orders"), "o_orderkey", "lineitem"))),

    // ---- §2.6 Q1+ series completeness (hour gaps) ----
    // Missing hours per event_type; an empty result IS the check.
    "dq05_series_gaps" -> ((s, d) =>
      graft.dq.Checks.seriesGaps(t(s, d, "events"), "event_type", "ts")),

    // ---- §2.6 Q1+ PSI distribution drift between snapshots ----
    // The pre-retraining "did this feature move" gate: unit-bin
    // histograms, Laplace smoothing over union bins, per-bin
    // (q-p)ln(q/p) nano-quantized once (ns79's trick) then summed
    // exactly.
    "ns97_psi_drift" -> ((s, d) => {
      val ev = t(s, d, "events")
      graft.ns.Sketches.psiDrift(
        ev.filter(col("event_id") % 10 =!= 3), ev,
        "event_type", "value")
    }),

    // ---- §2.8 [NS] exact dedup: fingerprint-grouped survivors ----
    "ns01_exact_dedup" -> ((s, d) =>
      Dedup.exactDedup(t(s, d, "documents"), "doc_id", "text")),

    // ---- §2.8 [NS] exact near-dup: inverted-index n-gram Jaccard ----
    "ns02_ngram_jaccard_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)),

    // Oracle-exact MinHash twin: same banding algorithm as ns03 with
    // every hash in the md5 idiom — the whole LSH pipeline (which
    // pairs band-collide + the exact verify) hash-gates against SQL.
    "ns03b_minhash_exact" -> ((s, d) =>
      Dedup.minhashNearDupPairsExact(t(s, d, "documents"), "doc_id",
        "text", n = 3, maxJaccardDist = 0.5)),

    // ---- §2.8 [NS] capped inverted-index join: the 100-TB path ----
    // Same operator with the document-frequency cap ENGAGED (df <= 5
    // bites on this fixture: max df is 7). The cap bounds the worst
    // shingle bucket, so the pair join's Σ bucket² term — quadratic in
    // the hottest stop-shingle without it — stays <= cap² per gram.
    // Hash-gated: the oracle applies the identical df cut, and
    // NsDedupSpec proves capped ⊆ uncapped + equality when the cap
    // clears the max document frequency.
    "ns02b_ngram_jaccard_capped" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = Some(5))),

    // ---- §2.8 [NS] approx near-dup: banded MinHash LSH ----
    // No SQL oracle (LSH recall is probabilistic); the driver records
    // a rows-only check and NsDedupSpec proves >=90% recall against
    // the exact ns02 pairs plus a no-cartesian plan shape.
    "ns03_minhash_near_dup" -> ((s, d) =>
      Dedup.minhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
        n = 3, maxJaccardDist = 0.5, numHashTables = 8, seed = 42L)),

    // ---- §2.8 [NS] SimHash fingerprints + banded near-dup pairs ----
    // Band count adapts to corpus size (Dedup.adaptiveBands): 8-bit
    // bands below ~8k docs (complete at maxHamming 7), widening as
    // density grows so the band join stays ~linear. The count() that
    // sizes it is one cheap scan of a single column.
    "ns04_simhash_near_dup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.simhashNearDupPairs(
        Dedup.simhash(docs, "doc_id", "text"),
        "doc_id", maxHamming = 7,
        bands = Dedup.adaptiveBands(docs.count(), maxHamming = 7))
    }),

    // Oracle-exact SimHash twin: 60-bit md5 signature, 10 bands of 6
    // bits (complete at maxHamming 7 < 10 by pigeonhole) — signature
    // construction, banding, AND the Hamming verify hash-gate
    // against SQL (ns04 stays rows-only by its xxhash64).
    "ns04b_simhash_exact" -> ((s, d) =>
      Dedup.simhashNearDupPairs(
        Dedup.simhash60Md5(t(s, d, "documents"), "doc_id", "text"),
        "doc_id", maxHamming = 7, bands = 10, bits = 60)),

    // ---- §2.8 [NS] exact brute-force cosine top-k neighbors ----
    "ns05_topk_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
    }),

    // ---- §2.8 [NS] approximate top-k via random-projection LSH ----
    // No SQL oracle (probabilistic recall); NsSimilaritySpec proves
    // >=70% recall@5 against ns05's exact answer and a bucketed
    // (non-cartesian) plan.
    "ns06_ann_topk_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.annTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, minCosine = 0.15)
    }),

    // ---- §2.8 [NS] IVF approximate top-k (k-means coarse quantizer) ----
    // The other ANN scale path: cell assignment is a one-time batch
    // job, probing is a literal projection, and the only join is the
    // corpus equi-join on cell. No SQL oracle (k-means cells are
    // engine-specific) → rows-only; NsSimilaritySpec proves >=70%
    // recall@5 vs exact ns05, join-only plan shape, and determinism.
    "ns16_ivf_topk_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      // indexKey: the quantizer is fitted once per corpus path and
      // cached — index build is offline, queries are the online path.
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, indexKey = Some(s"$d/embeddings"))
    }),

    // ---- §2.8 [NS] embedding-cosine near-dup pairs (LSH-bucketed) ----
    // bucketLength 0.2 (vs the 0.5 default): narrower buckets cut the
    // candidate-pair volume at this threshold while measured recall on
    // the fixture stays 1.0 with 8 OR-ed projections (both SFs).
    // bucketLength 0.1 is the sweep-derived scale setting (SCALE.md:
    // recall 0.94/0.93 at sf0.1/sf1 — stable across 10× density —
    // for 1.7× less wall at sf1 than 0.2). The density-adaptive
    // maxBucketSize cap stays OFF here by MEASUREMENT: this fixture's
    // ≥0.4 pairs are pure chance tail (max true cosine 0.60, zero
    // pairs ≥0.7), i.e. pair distance ≈ corpus distance, so any
    // bucket-bounding scheme sheds them (measured recall 0.18 capped).
    // The cap is the right default when near-dups are genuinely close
    // (production corpora) — the planted-pair law in NsSimilaritySpec
    // proves recall ≥0.9 there with candidates bounded.
    "ns07_embedding_near_dup" -> ((s, d) =>
      Similarity.cosineNearDupPairs(
        t(s, d, "embeddings"), "vec_id", "embedding", minCosine = 0.4,
        numHashTables = 8, bucketLength = 0.1)),

    // ns07's registered 100-TB twin (the ns02b pattern): the
    // density-adaptive bucket cap ON, so candidate volume is bounded
    // per bucket regardless of corpus density. On THIS fixture's
    // chance-tail threshold the capped recall is partial by
    // information theory (SCALE.md "Why ns07's cap stays OFF"); the
    // planted-dup recall ≥ 0.9 law lives in NsSimilaritySpec, and
    // this registration is the measured sublinear path for corpora
    // with genuine near-dups. Rows-only like ns07.
    "ns07b_embedding_near_dup_capped" -> ((s, d) =>
      Similarity.cosineNearDupPairs(
        t(s, d, "embeddings"), "vec_id", "embedding", minCosine = 0.4,
        numHashTables = 8, bucketLength = 0.1,
        maxBucketSize = Some(64))),

    // ---- §2.8 [NS] text analysis: stats, quality gate, language id ----
    "ns08_text_stats" -> ((s, d) =>
      TextOps.textStats(t(s, d, "documents"), "doc_id", "text")),
    "ns09_quality_score" -> ((s, d) =>
      TextOps.qualityScore(t(s, d, "documents"), "doc_id", "text")),
    "ns10_lang_id" -> ((s, d) =>
      TextOps.langId(t(s, d, "documents"), "doc_id", "text")),

    // ---- §2.8 [NS] PII redaction (C4-style scrub pass) ----
    // The fixture text carries no PII, so each doc gets a
    // deterministic synthetic email/phone/IPv4 tail derived from
    // doc_id (fixture plumbing, ns14-style) — every row then
    // exercises all three patterns and the oracle rebuilds the same
    // tail before applying the same sequential count+replace chain.
    "ns19_pii_redaction" -> ((s, d) => {
      val doc = t(s, d, "documents").select(col("doc_id"),
        withPiiTail(col("text"), col("doc_id")).as("text"))
      TextOps.redactPii(doc, "doc_id", "text")
    }),

    // ---- §2.8 [NS] repetition metrics (Gopher A1.1) ----
    // Lines are synthesized by turning ' table ' separators into
    // newlines (same rewrite in the oracle); the word-soup fixture
    // then yields real duplicate lines. Oracle computes the same
    // excess-copy fractions relationally (unnest + group by).
    "ns20_repetition_stats" -> ((s, d) =>
      TextOps.repetitionStats(
        t(s, d, "documents").select(col("doc_id"),
          regexp_replace(col("text"), " table ", "\n").as("text")),
        "doc_id", "text")
        .filter(col("n_lines") > 0)),

    // ---- §2.8 [NS] corpus vocabulary top-k ----
    "ns21_vocab_topk" -> ((s, d) =>
      TextOps.vocab(t(s, d, "documents"), "text", 20)),

    // ---- §2.8 [NS] per-source token accounting ----
    "ns27_token_accounting" -> ((s, d) =>
      TextOps.tokenAccounting(t(s, d, "documents"),
        Seq(col("source")), "text")),

    // ---- §2.8 [NS] tf-idf keyword extraction (linear idf) ----
    "ns26_tfidf_terms" -> ((s, d) =>
      TextOps.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text", 5)
        .select(col("doc_id"), col("word"), col("tf"), col("score"),
          col("rn").cast("long").as("rn"))),

    // ---- §2.8 [NS] incremental dedup of a new ingest batch ----
    // Known store = fingerprints of docs < 250; "new batch" = docs
    // >= 200, so the 200-249 overlap must be anti-joined away and
    // only genuinely fresh content survives with its fingerprint.
    "ns25_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val known = docs.filter(col("doc_id") < 250)
        .select(Dedup.fingerprint(col("text")).as("fingerprint"))
      Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") >= 200), known, "doc_id", "text")
    }),

    // ---- §2.8 [NS] Bloom-prefiltered incremental dedup ----
    // Same task as ns25 and hash-gated against the SAME oracle:
    // Bloom "no" is definite and every "maybe" is exactly verified,
    // so outputs are identical — only the exchange shrinks (the
    // store-membership answer moves into a broadcast bitset). The
    // 100-TB shape for "have we seen this content before".
    "ns55_bloom_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val known = docs.filter(col("doc_id") < 250)
        .select(Dedup.fingerprint(col("text")).as("fingerprint"))
      Dedup.incrementalExactDedupBloom(
        docs.filter(col("doc_id") >= 200), known, "doc_id", "text",
        expectedItems = 1000L, fpp = 0.03)
    }),

    // ---- §2.8 [NS] benchmark decontamination overlap check ----
    // Eval set = first 50 docs, train corpus = the rest; each eval
    // doc reports what fraction of its distinct trigrams the corpus
    // contains. Exact inverted-index path here (oracle parity); the
    // registered 100 TB path swaps grams for mod-p fingerprints.
    "ns22_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.contaminationScores(
        docs.filter(col("doc_id") < 50),
        docs.filter(col("doc_id") >= 50),
        "doc_id", "text", n = 3)
    }),

    // ---- §2.8 [NS] mod-p sampled shingle fingerprints ----
    // xxhash64 has no DuckDB twin → rows-only check; determinism and
    // sampling laws are proven in NsTextOpsSpec.
    "ns11_shingle_fingerprints" -> ((s, d) =>
      TextOps.shingleFingerprints(t(s, d, "documents"), "doc_id", "text",
        n = 3, p = 4)),

    // ---- §2.8 [NS] HLL++ approx distinct (sketch, mergeable) ----
    // The estimate is engine-specific → rows-only check; the <=5%
    // relative-error law is proven in NsSketchesMultimodalSpec.
    "ns12_approx_distinct" -> ((s, d) =>
      Sketches.approxDistinct(t(s, d, "events"),
        Seq(col("event_type")), col("user_id"))),

    // ---- §2.8 [NS] quantile sketch; exact at this accuracy ----
    "ns13_quantiles" -> ((s, d) =>
      Sketches.quantiles(t(s, d, "events"), Seq(col("event_type")),
        col("value"), Seq(0.5, 0.9, 0.99))),

    // ---- §2.8 [NS] multimodal: binary source + batched decode ----
    // Payload files are materialized once per invocation from the
    // documents fixture (50 tiny files, driver-side write of a
    // dimension-sized set), then flow binaryFile → metadata projection
    // → batched stub decode. sha256/byte_len are REAL payload facts
    // the oracle reproduces from the source text; dims come from the
    // size-keyed stub, pinned EXPLICITLY so the gate stays stable even
    // if a doc's text happens to start with a PNM magic — the real
    // header-parse path is gated separately by ns29.
    "ns14_multimodal_features" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_q")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
        .collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath,
              s"doc_${r.getLong(0)}.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
      materializeAndDrop(Multimodal.decodeFeatures(
        Multimodal.readBinaryDir(s, dir.getPath, "*.txt"),
        decode = batch => batch.map(Multimodal.stubDims)).toDF(), dir)
    }),

    // ---- §2.8 [NS] multimodal: REAL header decode, oracle-gated ----
    // Per-doc BMP payloads are materialized with dims derived from the
    // text length (w = len%31+1, h = len*7%17+1), then flow through
    // the SAME binaryFile → batched-decode path as ns14 — but here the
    // default decoder PARSES the BMP header, so width/height/byte_len
    // are real payload facts the oracle recomputes from the
    // construction arithmetic (byte_len = 54 + ((w*3+3) div 4 * 4)·h,
    // the exact size Multimodal.writeBmp emits). sha256 is omitted:
    // DuckDB cannot reconstruct the binary payload.
    "ns29_bmp_decode" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_bmp")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), length(col("text")).as("len"))
        .collect().foreach { r =>
          val id = r.getLong(0)
          val len = r.getInt(1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath, s"doc_$id.bmp"),
            Multimodal.writeBmp(len % 31 + 1, (len * 7) % 17 + 1,
              seed = id))
        }
      materializeAndDrop(Multimodal.decodeFeatures(
        Multimodal.readBinaryDir(s, dir.getPath, "*.bmp"))
        .toDF().select(col("file_name"), col("byte_len"),
          col("width"), col("height")), dir)
    }),

    // Real RIFF/WAVE PCM16 decode (chunk-walking header parse + exact
    // integer sample fold), same fixture trick as ns29: files are
    // synthesized from documents rows with a closed-form waveform, so
    // the oracle predicts every decoded field — including peak and
    // the exact energy sum — from the generation formulas in SQL.
    "ns56_wav_decode" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_wav")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), length(col("text")).as("len"))
        .collect().foreach { r =>
          val id = r.getLong(0)
          val len = r.getInt(1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath, s"doc_$id.wav"),
            Multimodal.writeWav(len % 8000 + 8000,
              (len * 13) % 2000 + 100))
        }
      materializeAndDrop(Multimodal.decodeWavFeatures(
        Multimodal.readBinaryDir(s, dir.getPath, "*.wav"))
        .toDF().select(col("file_name"), col("byte_len"),
          col("sample_rate"), col("channels"), col("n_samples"),
          col("duration_ms"), col("peak_abs"), col("energy")), dir)
    }),

    // ---- §2.9 [NS] temporal joins: as-of and range ----
    // Spark has no native ASOF JOIN; a raw inequality join plans as a
    // broadcast-nested-loop. ops/TemporalJoin expresses both as
    // single-shuffle equi-plans. Times are exact epoch micros on both
    // engines (unix_micros / epoch_us both truncate the fixture's
    // nanos). Tolerance: purchases only match a view ≤ 1 h older.
    "ns30_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("vts_us"),
          col("event_id").as("view_event_id"),
          col("value").as("view_value"))
      graft.ops.TemporalJoin.asofJoin(p, v, Seq("user_id"),
        "ts_us", "vts_us", payload = Seq("view_event_id", "view_value"),
        tolerance = Some(3600L * 1000000L),
        rightTieBreak = Some("view_event_id"),
        matchedTimeAs = "view_ts_us")
    }),

    // The CHUNKED as-of variant, driver-gated against the SAME DuckDB
    // ASOF oracle as ns30: partitioning by (key, 6h time-chunk) with
    // carry-in seeds must be output-identical to the keyed-window
    // plan. This is the hot-key scale path (SCALE.md: a single-key
    // window serializes on one reducer — 171.7 max/p50 task skew —
    // while chunking spreads the same timeline 4× on 32 cores), and
    // the gate proves the rewrite is semantics-preserving.
    "ns53_asof_join_chunked" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("vts_us"),
          col("event_id").as("view_event_id"),
          col("value").as("view_value"))
      graft.ops.TemporalJoin.asofJoinChunked(p, v, Seq("user_id"),
        "ts_us", "vts_us", payload = Seq("view_event_id", "view_value"),
        chunk = 6L * 3600L * 1000000L,
        tolerance = Some(3600L * 1000000L),
        rightTieBreak = Some("view_event_id"),
        matchedTimeAs = "view_ts_us")
    }),

    // Clicks in the hour BEFORE each purchase (attribution window).
    // binSize = the window length, so each interval spans ≤ 2 bins.
    "ns31_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_ts_us"))
        .withColumn("w_start_us", col("p_ts_us") - 3600L * 1000000L)
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user_id"),
          unix_micros(col("ts")).as("click_ts_us"))
      graft.ops.TemporalJoin.rangeJoin(p, c,
        keys = Seq("user_id" -> "c_user_id"),
        startCol = "w_start_us", endCol = "p_ts_us",
        pointCol = "click_ts_us", binSize = 3600L * 1000000L)
        .select(col("purchase_id"), col("user_id"), col("p_ts_us"),
          col("click_id"), col("click_ts_us"))
    }),

    // Purchase attribution windows [ts-1h, ts] overlapping error
    // windows [ts-15m, ts+15m] per user — interval × interval, the
    // dup-free reporting-bin plan.
    "ns32_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val hourUs = 3600L * 1000000L
      val qtrUs = 900L * 1000000L
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (unix_micros(col("ts")) - hourUs).as("p_start_us"),
          unix_micros(col("ts")).as("p_end_us"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          col("user_id").as("e_user_id"),
          (unix_micros(col("ts")) - qtrUs).as("e_start_us"),
          (unix_micros(col("ts")) + qtrUs).as("e_end_us"))
      graft.ops.TemporalJoin.intervalJoin(p, e,
        keys = Seq("user_id" -> "e_user_id"),
        aStart = "p_start_us", aEnd = "p_end_us",
        bStart = "e_start_us", bEnd = "e_end_us", binSize = hourUs)
        .select(col("purchase_id"), col("user_id"),
          col("error_id"), col("e_start_us"), col("e_end_us"))
    }),

    // Segment-level (paragraph-analogue) exact dedup with reassembly:
    // 10-word segments, global keep-first, documents stitched back in
    // order. Two exchanges (segment keep-first + per-doc reassembly).
    "ns33_segment_dedup" -> ((s, d) =>
      graft.ns.Dedup.segmentDedup(t(s, d, "documents"),
        "doc_id", "text", segWords = 10)),

    // Batch gap-sessionization over events (30-min gap): one keyed
    // window + a map-combinable session rollup. The batch twin of the
    // streaming s02 path.
    "ns34_batch_sessionize" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
      graft.ops.Sessionize.sessionSummary(ev, Seq("user_id"), "ts_us",
        gapUs = 1800L * 1000000L, tieBreak = "event_id",
        valueCol = "value")
    }),

    // Symmetric int8 embedding quantization — pure projection, the
    // 4x storage path for the widest column in a curated corpus.
    // Gate-facing projection posexplodes the int array to one
    // (vec_id, idx, q_val) row per element: the driver's oracle
    // harness sorts/hashes SCALAR columns only (raw arrays die in
    // pandas sort_values — round-7 red). The array form stays the
    // operator's output and is law-tested in EmbeddingsSpec.
    "ns35_quantize_int8" -> ((s, d) =>
      graft.ns.Embeddings.quantizeInt8(t(s, d, "embeddings"),
        "vec_id", "embedding")
        .select(col("vec_id"), col("q_scale"), col("max_abs_err"),
          posexplode(col("q")).as(Seq("idx", "q_val")))),

    // L2 normalization — the stored form cosine consumers want (dot
    // on unit vectors IS cosine). Pure zero-shuffle projection;
    // bit-exact vs DuckDB via identical left-fold norm accumulation.
    // Scalarized for the gate like ns35 (arrays → (idx, unit_val)).
    "ns36_l2_normalize" -> ((s, d) =>
      graft.ns.Embeddings.l2Normalize(t(s, d, "embeddings"),
        "vec_id", "embedding")
        .select(col("vec_id"), col("norm"),
          posexplode(col("unit")).as(Seq("idx", "unit_val")))),

    // Near-dup CLUSTERING: transitive closure of the ns02b pair graph
    // (connected components, hash-to-min), every doc assigned a
    // cluster + keep-one representative flag. The iterative work is
    // bounded by the pair graph; the corpus pays one left join.
    // The registered generator is the DF-CAPPED one (the 100-TB scale
    // path — bounds the worst shingle bucket's quadratic term); the
    // oracle applies the identical df cut.
    "ns37_dedup_clusters" -> ((s, d) =>
      graft.ns.Clusters.dedupClusters(
        t(s, d, "documents"), "doc_id",
        Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id",
          "text", n = 3, threshold = 0.5, maxDocFreq = Some(5)),
        "id_a", "id_b")),

    // Per-source curation FUNNEL report — the counts dashboard every
    // curation run publishes: total → quality-pass → +language-pass →
    // unique survivors, per source. Exact integer counts (hash-gated);
    // one pass over the corpus for the gate flags plus the dedup agg,
    // all map-combinable. Survivor attribution follows exactDedup's
    // min_by carry (the earliest doc's source owns the group).
    "ns60_curation_funnel" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val q = TextOps.qualityScoreCol(col("text")) === 1.0
      val l = TextOps.langIdCol(col("text")) === "en"
      val surv = Dedup.exactDedup(
        docs.filter(q && l), "doc_id", "text", carry = Seq("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
      docs.withColumn("__q", q).withColumn("__l", l)
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_total"),
          sum(when(col("__q"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("__q") && col("__l"), 1L).otherwise(0L))
            .as("n_lang"))
        .join(surv, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("n_quality"),
          col("n_lang"), coalesce(col("n_unique"), lit(0L)).as("n_unique"))
    }),

    // Mergeable HLL sketch columns: per-source sketches of content
    // fingerprints plus the merged-global estimate — the store-the-
    // sketch-not-the-data pattern. Rows-only (DataSketches binary
    // layout is engine-specific); the exact merge law (union of part
    // sketches ≡ sketch of the whole) and 5%-accuracy law live in
    // NsSketchesMultimodalSpec.
    "ns59_hll_sketch_union" -> ((s, d) => {
      val sk = Sketches.hllSketches(t(s, d, "documents"),
        Seq(col("source")), Dedup.fingerprint(col("text")))
      sk.select(col("source"),
          hll_sketch_estimate(col("sketch")).as("distinct_estimate"))
        .unionByName(
          Sketches.hllMergeEstimate(sk)
            .select(lit("__ALL__").as("source"),
              col("distinct_estimate")))
    }),

    // Unigram-LM mean NLL (perplexity-proxy quality signal),
    // self-scored against the corpus vocabulary. Hash-gated (was
    // rows-only through r8): each distinct token's nll is rounded
    // ONCE to 2^-24 quanta, so bit equality only needs JVM Math.log
    // and DuckDB ln() to land on the same rounding side — measured
    // on this host: 500/500 docs bit-exact at sf0.01. A 1-ulp libm
    // divergence flips the gate only if some token's -ln(p)·2^24
    // sits within ~2e-8 of x.5 (~3e-8 odds per token); the
    // determinism laws stay in NsTextOpsSpec.
    "ns58_unigram_nll" -> ((s, d) =>
      TextOps.unigramNll(t(s, d, "documents"), "doc_id", "text")),

    // ---- §2.8 [NS] real BPE tokenization to ids (r9) ----
    // Encode-to-ids with the checked-in merge table (resources/graft/
    // bpe/merges.txt): map-side broadcast-codec mapPartitions batches,
    // scalarized (doc_id, pos, token_id) like ns35/ns36. The oracle is
    // an INDEPENDENT Python BPE implementation's output over the same
    // fixture text (tools/gen_bpe.py writes the parquet the oracle SQL
    // reads), so the gate is a cross-implementation bit equality on
    // real text, not a self-check. Restricted to doc_id < 100, the
    // slice the checked-in oracle covers; full-corpus throughput is
    // probed in SCALE.md.
    "ns61_bpe_encode" -> ((s, d) =>
      graft.ns.Bpe.encodeDocs(
        t(s, d, "documents").filter(col("doc_id") < 100),
        "doc_id", "text")
        .toDF()
        .select(col("doc_id"),
          posexplode(col("token_ids")).as(Seq("pos", "token_id")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("token_id").cast("long").as("token_id"))),

    // Sequence packing on TRUE tokenized lengths — ns24 packs the
    // n_chars proxy; this packs size(token_ids) from the real encoder
    // through the same two-phase packOffsets (no global-window
    // reducer). Gated against per-doc counts of the same independent
    // oracle table.
    "ns62_pack_bpe" -> ((s, d) =>
      Sampling.packOffsets(
        graft.ns.Bpe.encodeDocs(
          t(s, d, "documents").filter(col("doc_id") < 100),
          "doc_id", "text")
          .toDF()
          .select(col("doc_id"),
            size(col("token_ids")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", chunkSize = 512, bucketSize = 100L)),

    // ---- §2.8 [NS] perceptual image hashing (dHash) (r9) ----
    // 60 closed-form 72×64 BMPs (seed = (i div 2)·1000, so each even/
    // odd pair is pixel-identical); the engine parses REAL payload
    // bytes back through parseBmpGray and packs the 9×8 dHash — the
    // oracle re-derives every hash bit from the generation formula
    // alone (the ns29/ns56 trick, here over the full pixel grid).
    "ns63_image_dhash" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_dhash")
      (0 until 60).foreach { i =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir.getPath, s"img_$i.bmp"),
          Multimodal.writeBmp(72, 64, seed = (i / 2).toLong * 1000L))
      }
      materializeAndDrop(
        Multimodal.dhashImages(
          Multimodal.readBinaryDir(s, dir.getPath, "*.bmp"))
          .toDF()
          .select(col("file_name"), col("width"), col("height"),
            col("dhash")),
        dir)
    }),

    // Hamming-banded image near-dup over the same dHashes — EXACTLY
    // the SimHash band-join machinery (ns04) on a different signature
    // source, and unlike ns04 this one is hash-GATED: maxHamming 7 <
    // bands 8 makes the banded join provably complete, so it must
    // reproduce the oracle's brute-force all-pairs answer bit for bit.
    "ns64_image_near_dup" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_neardup")
      (0 until 60).foreach { i =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir.getPath, s"img_$i.bmp"),
          Multimodal.writeBmp(72, 64, seed = (i / 2).toLong * 1000L))
      }
      val hashes = Multimodal.dhashImages(
        Multimodal.readBinaryDir(s, dir.getPath, "*.bmp"))
        .toDF()
        .select(regexp_extract(col("file_name"), "img_(\\d+)\\.bmp", 1)
          .cast("long").as("img_id"),
          col("dhash").as("simhash"))
      materializeAndDrop(
        Dedup.simhashNearDupPairs(hashes, "img_id",
          maxHamming = 7, bands = 8)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming")),
        dir)
    }),

    // ---- §2.8 [NS] duplicated-span REMOVAL (r9) ----
    // ns47 only diagnoses duplicated spans; this strips every run of
    // >= 3 consecutive corpus-duplicated trigrams and reassembles the
    // survivors — Lee et al. 2022 substring dedup, oracle-gated on
    // the reassembled text itself (exact integer span arithmetic).
    "ns65_dup_span_removal" -> ((s, d) =>
      Dedup.dupSpanRemoval(t(s, d, "documents"), "doc_id", "text",
        n = 3, minRun = 3)),

    // ---- §2.8 [NS] per-DOMAIN curation keys (r9) ----
    // Registrable-domain extraction (public-suffix decision as pure
    // codegen'd string ops) over deterministic synthetic URLs, then
    // the ns18 quota per derived domain. URLs exercise subdomain
    // stripping AND two-level suffixes; both engines construct and
    // parse them from the same closed form.
    "ns66_domain_quota" -> ((s, d) => {
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("www."))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit("cdn.media."))
          .otherwise(lit("")),
        col("source"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(".co.uk"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit(".org"))
          .otherwise(lit(".com")),
        lit("/p/"), col("doc_id").cast("string"))
      Sampling.groupQuota(
        t(s, d, "documents").select(col("doc_id"), col("n_chars"),
          TextOps.registrableDomain(url,
            Seq("co.uk", "com.au", "co.jp")).as("domain")),
        Seq(col("domain")), 20,
        Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("domain"), col("doc_id"), col("n_chars"),
          col("rn").cast("long").as("rn"))
    }),

    // ---- §2.8 [NS] perplexity-band filter (r9) ----
    // CCNet/DCLM-style middle-band selection over ns58's unigram-LM
    // NLL: drop the easiest 10% and hardest 10%, quantile thresholds
    // from a 2^16-cell histogram (kilobytes) instead of a global
    // sort. Bit-stable: bin = floor(mean_nll·2048) over the
    // identically-derived ns58 doubles, then pure integer cuts.
    "ns67_perplexity_band" -> ((s, d) =>
      TextOps.perplexityBandKeep(t(s, d, "documents"), "doc_id",
        "text", loFrac = 0.1, hiFrac = 0.9)),

    // ---- §2.8 [NS] URL canonicalization + blocklist filter (r9) ----
    // Closed-form messy URLs (case-shifted scheme/host, default
    // ports, tracking params, fragments) canonicalized map-side, then
    // a broadcast anti-join drops blocklisted registrable domains —
    // the crawl-curation front gate. Hash-gated: the oracle rebuilds
    // the same URLs and applies the same RFC-3986-safe rules in SQL.
    "ns68_url_blocklist" -> ((s, d) => {
      val url = concat(
        when(pmod(col("doc_id"), lit(5)) === 0, lit("HTTP://"))
          .otherwise(lit("https://")),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("WWW."))
          .otherwise(lit("")),
        col("source"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(".co.uk"))
          .otherwise(lit(".com")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          when(pmod(col("doc_id"), lit(5)) === 0, lit(":80"))
            .otherwise(lit(":443"))).otherwise(lit("")),
        lit("/p/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("?utm_source=feed&q="),
            col("doc_id").cast("string"), lit("&fbclid=xyz")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 1, lit("#frag"))
          .otherwise(lit("")))
      val canon = t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.canonicalizeUrl(url).as("url_canon"))
        .withColumn("domain", TextOps.registrableDomain(
          col("url_canon"), Seq("co.uk", "com.au", "co.jp")))
      val block = s.createDataFrame(
        Seq(Tuple1("src3.com"), Tuple1("src7.co.uk"),
          Tuple1("src15.com"))).toDF("domain")
      canon.join(broadcast(block), Seq("domain"), "left_anti")
        .select(col("doc_id"), col("url_canon"), col("domain"))
    }),

    // ---- §2.8 [NS] token-budget corpus selection (r9) ----
    // Greedy quality-first selection under a hard token budget (the
    // final step of every curation recipe): rank by (Gopher score
    // desc, id), keep while the running weight still fits. Ranked by
    // the packOffsets two-phase prefix-sum — no global-sort window.
    // Budget 60k chars ≈ 40% of the sf0.01 corpus, so the cut lands
    // mid-corpus and both kept and rejected rows gate the arithmetic.
    "ns69_token_budget_select" -> ((s, d) =>
      Sampling.tokenBudgetSelect(
        TextOps.qualityScore(t(s, d, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("quality_score"), col("n_chars")),
        "doc_id", "quality_score", "n_chars", budget = 60000L)),

    // ---- §2.8 [NS] Gopher top-n-gram repetition fractions ----
    // The Rae et al. repetition block ns20 doesn't cover: fraction
    // of chars inside the single most frequent word 2/3/4-gram.
    // Map-side array fold — zero shuffles.
    "ns70_topgram_repetition" -> ((s, d) =>
      TextOps.topGramRepetition(t(s, d, "documents"),
        "doc_id", "text")),

    // ---- §2.8 [NS] C4-style line-level cleaning ----
    // The fixture's docs are single-line, so lines are synthesized
    // the ns20 way (" table " → sentence break) plus three injected
    // tails that exercise every rule: a lorem-ipsum placeholder
    // (doc_id%7), a code line with braces (doc_id%11), a too-short
    // line, and a well-formed closing sentence. The oracle replays
    // the identical construction.
    "ns71_c4_line_filter" -> ((s, d) =>
      TextOps.c4LineFilter(
        t(s, d, "documents").select(col("doc_id"), concat(
          regexp_replace(col("text"), " table ", ".\n"),
          when(col("doc_id") % 7 === 0,
            lit("\nlorem ipsum dolor sit amet placeholder text here."))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nfunction f() { return 1; }")).otherwise(lit("")),
          lit("\ntoo short."),
          lit("\nthis is a good closing sentence for the document."))
          .as("text")),
        "doc_id", "text")),

    // ---- §2.8 [NS] language-balanced per-language quota ----
    // Per-LANGUAGE caps (composition of ns10's langid and ns18's
    // bounded group quota): top-40 docs per predicted language by
    // (n_chars desc, doc_id) — the knob that stops one dominant
    // language from swamping a multilingual mixture.
    "ns72_lang_balanced_quota" -> ((s, d) =>
      Sampling.groupQuota(
        t(s, d, "documents").select(col("doc_id"), col("n_chars"),
          TextOps.langIdCol(col("text")).as("lang_pred")),
        Seq(col("lang_pred")), 40,
        Seq(col("n_chars").desc, col("doc_id")))
        .select(col("doc_id"), col("n_chars"), col("lang_pred"),
          col("rn").cast("long").as("rn"))),

    // ---- §2.8 [NS] linear quality classifier (integer weights) ----
    "ns73_linear_quality" -> ((s, d) =>
      TextOps.linearQualityScore(t(s, d, "documents"),
        "doc_id", "text")),

    // ---- §2.8 [NS] BPE decode ∘ encode losslessness, corpus-wide --
    // The decoder inverts the checked-in merge table; on canonical
    // text the composition loses exactly the whitespace the
    // pre-tokenizer discards, so the oracle is a pure string
    // prediction over the ORIGINAL documents — every token id must
    // carry its full surface form for this to hash-match.
    "ns77_bpe_decode_roundtrip" -> ((s, d) =>
      graft.ns.Bpe.decodeDocs(
        graft.ns.Bpe.encodeDocs(t(s, d, "documents"),
          "doc_id", "text").toDF(),
        "doc_id", "token_ids")
        .select(col("doc_id"), col("decoded"),
          length(col("decoded")).cast("long").as("n_chars_decoded"))),

    // ---- §2.8 [NS] quality-signal ensemble ----
    // Three independent keep signals stacked as COLUMNS in one
    // map-side projection (no self-joins): heuristic score, linear
    // classifier, top-2-gram repetition. Majority vote keeps.
    "ns78_quality_ensemble" -> ((s, d) =>
      TextOps.qualityEnsemble(t(s, d, "documents"), "doc_id", "text")),

    // ---- §2.8 [NS] cross-snapshot vocabulary drift ----
    // Old snapshot = p04's doc_id%10!=3 split, new = the full corpus;
    // top-50 symmetric-KL contributor tokens, nano-quantized once.
    "ns79_vocab_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextOps.vocabDrift(docs.filter(col("doc_id") % 10 =!= 3),
        docs, "text", k = 50)
    }),

    // ---- §2.8 [NS] output-shard manifest ----
    // ~25k-token shards over the id order (two-phase prefix sum, no
    // global window) + one audit row per shard with an exact-integer
    // membership checksum — the artifact that makes a training run's
    // output shards verifiable.
    "ns80_shard_manifest" -> ((s, d) =>
      Sampling.shardManifest(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", shardTokens = 25000L)),

    // ---- §2.8 [NS] session transcript assembly ----
    // Interaction logs → ordered training examples: ns34's
    // sessionization + a per-session transcript string in total
    // (ts, event_id) order. Same single exchange as ns34.
    "ns81_session_transcripts" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type"))
      graft.ops.Sessionize.sessionTranscripts(ev, Seq("user_id"),
        "ts_us", gapUs = 1800L * 1000000L, tieBreak = "event_id",
        typeCol = "event_type")
        .select(col("user_id"),
          col("session_id").cast("long").as("session_id"),
          col("session_start_us"), col("n_events"), col("transcript"))
    }),

    // ---- §2.8 [NS] exact mergeable moment columns ----
    // ns59's store-once/merge-forever shape for numeric profiling:
    // integer power sums on the cent grid, derived mean/variance.
    "ns91_moment_columns" -> ((s, d) =>
      graft.ns.Sketches.momentColumns(
        t(s, d, "events").select(col("event_type"), col("value")),
        Seq(col("event_type")), "value")),

    // ---- §2.8 [NS] exact per-group grid quantiles, no sort ----
    "ns92_exact_quantiles" -> ((s, d) =>
      graft.ns.Sketches.exactGridQuantiles(
        t(s, d, "events").select(col("event_type"), col("value")),
        Seq(col("event_type")), "value", Seq(0.25, 0.5, 0.75))),

    // ---- §4.3 [NS] Z-order (Morton) layout key, gated ----
    // The multi-column file-skipping layout: ns96 pins the bit
    // interleave itself (pure codegen'd shifts, one map-side
    // projection); the layout write + bounding-box skipping law live
    // in ZOrderSpec.
    "ns96_zorder_key" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        graft.ops.ZOrder.zValue(col("o_custkey").cast("long"),
          col("o_orderkey").cast("long")).as("z"))),

    // ---- §2.8 [NS] exact mergeable Gram matrix (§2.7 UDAF) ----
    // One-pass Σ x xᵀ triangle over fixed-point embeddings: the
    // covariance/PCA/whitening sketch, 16 KB per partial, merge by
    // addition.
    "ns101_embedding_gram" -> ((s, d) =>
      graft.ns.Embeddings.gramMatrix(t(s, d, "embeddings"),
        "embedding", dim = 64)),

    // ---- §2.8 [NS] PCA projection (fit on summaries, project
    // map-side) ----
    // Fit = ns101's exact Gram triangle + exact mean sums (kilobytes)
    // eigendecomposed by a fixed-order Jacobi on the driver; project
    // = eigenvectors as literals, one map-side pass. Rows-only by
    // declared design (no SQL eigensolver); orthonormality /
    // reconstruction / planted-subspace laws in NsSimilaritySpec.
    "ns102_pca_project" -> ((s, d) =>
      graft.ns.Embeddings.pcaProject(t(s, d, "embeddings"),
        "vec_id", "embedding", dim = 64, k = 8)),

    // ---- §2.8 [NS] signed random projection (exact, map-side) ----
    // Achlioptas ±1 dim-reduction over int8-quantized embeddings:
    // 64 floats -> 16 exact longs before LSH/ANN, one projection,
    // no exchange (plan law in NsSimilaritySpec).
    "ns95_signed_projection" -> ((s, d) =>
      graft.ns.Embeddings.signedProjection(t(s, d, "embeddings"),
        "vec_id", "embedding", dim = 64, k = 16)),

    // ---- §4.3 [NS] skew-salted two-stage aggregation, gated ----
    // The hot-key aggregation rewrite registered with the PLAIN
    // groupBy as its oracle — the ns53 trick: the gate itself proves
    // the salt spreader semantics-preserving. Plan law (two
    // exchanges, partial on (key, salt)) in BucketingSkewSpec.
    "ns94_salted_agg" -> ((s, d) =>
      graft.ops.Skew.saltedCountSum(t(s, d, "events"),
        Seq(col("event_type")), col("value"), saltFactor = 8)),

    // ---- §2.8 [NS] label-noise detection (confident-learning) ----
    // Leave-one-out kNN disagreement over an audited slice: a row
    // whose 5 nearest neighbors (self excluded by bruteForceTopK)
    // out-vote its own label is a relabel/review candidate. The exact
    // kNN core is ns48's; ns54's ANN twin is the large-slice path.
    "ns99_label_noise" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val audited = emb.filter(col("vec_id") < 100)
      val pred = Similarity.knnClassify(emb, "vec_id", "embedding",
        "label", audited, "vec_id", "embedding", k = 5)
      pred.join(audited.select(col("vec_id").as("query_id"),
          col("label").as("own_label")), Seq("query_id"))
        .select(col("query_id"), col("own_label"), col("pred_label"),
          col("votes"),
          (col("pred_label") =!= col("own_label")).as("suspect"))
    }),

    // The large-slice label-noise scale twin: neighbors from ns54's
    // LSH candidate generation instead of the exact all-pairs scan
    // (ns99 measures linear-in-corpus by design, the diagnostic;
    // this path is the one a full-corpus audit takes). Rows-only by
    // the same declared design as ns54: candidates are LSH-dependent.
    "ns99b_label_noise_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val audited = emb.filter(col("vec_id") < 100)
      val pred = Similarity.voteLabels(
        Similarity.annTopK(emb, "vec_id", "embedding",
          audited, "vec_id", "embedding",
          k = 5, minCosine = -1.0, numHashTables = 8,
          bucketLength = 0.2),
        emb, "vec_id", "label")
      pred.join(audited.select(col("vec_id").as("query_id"),
          col("label").as("own_label")), Seq("query_id"))
        .select(col("query_id"), col("own_label"), col("pred_label"),
          col("votes"),
          (col("pred_label") =!= col("own_label")).as("suspect"))
    }),

    // ---- §2.8 [NS] bot-session detection (behavior dedup) ----
    // Sessions sharing an IDENTICAL event-type transcript across ≥2
    // sessions — scripted/bot traffic surfaces as repeated behavior.
    // Exact dedup on the transcript key scales like ns01 (groupBy on
    // a string key, map-side combine); gram-similarity variants are
    // wrong here by design: the event-type alphabet is tiny, so
    // trigram buckets degenerate (the ns02b df-cap would have to
    // drop everything). minEvents=2 because this fixture's sessions
    // top out at 3 events (production scripts run longer; the length
    // gate is the knob). ns81's sessionization feeds it.
    "ns100_bot_sessions" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type"))
      graft.ops.Sessionize.sessionTranscripts(ev, Seq("user_id"),
        "ts_us", gapUs = 1800L * 1000000L, tieBreak = "event_id",
        typeCol = "event_type")
        .filter(col("n_events") >= 2)
        .groupBy(col("transcript"))
        .agg(count(lit(1)).as("n_sessions"),
          count_distinct(col("user_id")).as("n_users"))
        .filter(col("n_sessions") >= 2)
    }),

    // ---- §2.8 [NS] reduced-dimension near-dup (PCA → LSH) ----
    // The dim-reduction-feeds-ANN composition registered end-to-end:
    // ns102's 16-component projection (4× smaller vectors through
    // every LSH exchange) re-assembled and fed to ns07's banded
    // cosine pair generator with the density cap ON. Rows-only by
    // the same declared design as ns07 (LSH candidates + no SQL
    // eigensolver); planted-dup recall law through the REDUCED path
    // in NsSimilaritySpec.
    "ns104_reduced_near_dup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val reduced = graft.ns.Embeddings.pcaProject(emb, "vec_id",
        "embedding", dim = 64, k = 16)
      val vecs = reduced.groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("j"), col("comp"))))
          .as("ps"))
        .select(col("vec_id"),
          transform(col("ps"), p => p.getField("comp").cast("float"))
            .as("emb16"))
      Similarity.cosineNearDupPairs(vecs, "vec_id", "emb16",
        minCosine = 0.4, numHashTables = 8, bucketLength = 0.1,
        maxBucketSize = Some(64))
    }),

    // ---- §2.8 [NS] CMS point queries (the sketch-store read side) ----
    // Heavy-hitter frequency estimates from the stored ns93 sketch
    // for a deterministic probe set (the corpus top-8 vocabulary):
    // min over seeds of the probed cells, absent cells = 0. Exact
    // arithmetic end-to-end, so even the ESTIMATES hash-gate.
    "ns103_cms_estimates" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sketch = graft.ns.Sketches.cmsSketch(docs,
        Seq(col("source")), "text")
      val probes = graft.ns.TextOps.vocab(docs, "text", 8)
        .select(col("word")).collect().map(_.getString(0)).toSeq.sorted
      graft.ns.Sketches.cmsEstimate(sketch, Seq("source"), probes)
    }),

    // ---- §2.8 [NS] feature hashing (hashing-trick vectorizer) ----
    // Vocabulary-free bag-of-words onto a fixed 1024-cell grid;
    // sparse exact rows, the text front end for linear models.
    "ns98_feature_hashing" -> ((s, d) =>
      graft.ns.TextOps.featureHash(t(s, d, "documents"),
        "doc_id", "text")),

    // ---- §2.8 [NS] count-min sketch columns, exact-oracle ----
    // Frequency complement to ns59's HLL: sparse (seed, cell, cnt)
    // rows per source whose md5-derived cells make the WHOLE sketch
    // hash-gatable; exchange bounded by depth x width per group.
    "ns93_cms_sketch" -> ((s, d) =>
      graft.ns.Sketches.cmsSketch(t(s, d, "documents"),
        Seq(col("source")), "text")),

    // ---- §2.8 [NS] winsorization at exact grid quantiles ----
    // Metric clipping at PERCENTILE_DISC p01/p99 with no global sort:
    // the value grid is cents, so the histogram cut is exact.
    "ns82_winsorize" -> ((s, d) =>
      graft.ns.Sketches.winsorize(
        t(s, d, "events").select(col("event_id"), col("value")),
        "event_id", "value", loQ = 0.01, hiQ = 0.99)),

    // ---- §2.8 [NS] corpus content fingerprint ----
    // Dataset versioning: one audit row per table with an order-
    // independent exact-integer content checksum (pairs with ns80's
    // shard manifest).
    "ns83_corpus_fingerprint" -> ((s, d) =>
      graft.ns.Snapshot.corpusFingerprint(t(s, d, "documents"),
        "documents", Seq("doc_id", "text"))
        .unionAll(graft.ns.Snapshot.corpusFingerprint(
          t(s, d, "events"), "events", Seq("event_id", "event_type")))
        .unionAll(graft.ns.Snapshot.corpusFingerprint(
          t(s, d, "embeddings"), "embeddings",
          Seq("vec_id", "label")))),

    // ---- §2.8 [NS] image resize (2×2 box downsample) ----
    // The multimodal resize step: decode → exact-integer box filter;
    // the oracle re-derives every resized pixel from the BMP
    // generation formula (ns29's fixture, ns63's grid trick).
    "ns84_image_resize" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_resize")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), length(col("text")).as("len"))
        .collect().foreach { r =>
          val id = r.getLong(0)
          val len = r.getInt(1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath, s"doc_$id.bmp"),
            Multimodal.writeBmp(len % 31 + 1, (len * 7) % 17 + 1,
              seed = id))
        }
      materializeAndDrop(Multimodal.resizeImages(
        Multimodal.readBinaryDir(s, dir.getPath, "*.bmp")).toDF(), dir)
    }),

    // ---- §2.1 JSONL sink + source roundtrip ----
    // Training corpora ship as JSON Lines; the gate proves the
    // write→read composition is content-faithful (escaping included)
    // against the parquet oracle.
    "j07_jsonl_roundtrip" -> ((s, d) => {
      val dir = newScratchDir("graft_jsonl")
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .write.json(s"${dir.getPath}/json")
      materializeAndDrop(
        s.read.schema("doc_id LONG, text STRING, lang STRING, " +
            "source STRING")
          .json(s"${dir.getPath}/json"), dir)
    }),

    // ---- §2.8 [NS] canary-string scan ----
    // Eval-canary sweep over the corpus; markers planted on
    // doc_id%13 docs so every canary and the no-hit path are
    // exercised.
    "ns86_canary_scan" -> ((s, d) =>
      TextOps.canaryScan(
        t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 13 === 0, concat(lit(" canary:"),
              when(col("doc_id") % 3 === 0, lit("aa11"))
                .when(col("doc_id") % 3 === 1, lit("bb22"))
                .otherwise(lit("cc33"))))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text",
        Seq("canary:aa11", "canary:bb22", "canary:cc33"))),

    // ---- §2.8 [NS] BPE tokenizer TRAINING on-corpus ----
    // Learn the merge table from the fixture corpus (one distributed
    // pre-token count, then the driver-side merge loop on the
    // compacted vocab) and gate rank-for-rank against the checked-in
    // table the INDEPENDENT Python trainer produced — the same
    // two-implementations proof as ns61, now for training instead of
    // encoding. k mirrors the Python default; both stop at the
    // no-pair-twice point (89 merges on this corpus).
    "ns88_bpe_learn" -> ((s, d) => {
      import s.implicits._
      graft.ns.Bpe.learnMerges(t(s, d, "documents"), "text", k = 384)
        .zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "left", "right")
    }),

    // ---- §2.8 [NS] tokenizer fertility / compression report ----
    // Tokens-per-character by source — the standard tokenizer-quality
    // metric (fertility): one encode pass + a map-combinable agg.
    // The ratio divides two exact integers, and the oracle recomputes
    // token counts from the INDEPENDENT Python encoder's table.
    "ns89_tokenizer_fertility" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
      val enc = graft.ns.Bpe.encodeDocs(docs, "doc_id", "text").toDF()
        .select(col("doc_id"), size(col("token_ids")).cast("long")
          .as("n_tokens"))
      docs.select(col("doc_id"), col("source"),
          length(Dedup.normText(col("text"))).as("n_chars"))
        .join(enc, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          (sum(col("n_tokens")).cast("double") /
            sum(col("n_chars")).cast("double")).as("tokens_per_char"))
    }),

    // ---- §2.8 [NS] record linkage (blocked fuzzy join) ----
    // Entity resolution: hex entity names + planted single-deletion
    // typo variants (deleted position always PAST the 4-char blocking
    // prefix, so every planted pair stays blockable); verify =
    // builtin levenshtein, identical classic definition in DuckDB,
    // so the whole operator is integer-exact.
    "ns90_record_linkage" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nm = substring(md5(col("doc_id").cast("string")), 1, 10)
      val k = (col("doc_id") % 6 + lit(5)).cast("int") // delete pos 5..10
      val base = docs.select(col("doc_id").as("ent_id"),
        nm.as("name"))
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000L).as("ent_id"),
          concat(nm.substr(lit(1), k - 1),
            nm.substr(k + 1, lit(10))).as("name"))
      Linkage.blockedFuzzyPairs(base.unionAll(variants),
        "ent_id", "name", substring(col("name"), 1, 4), maxDist = 2)
    }),

    // ---- §2.8 [NS] phrase blocklist via Aho–Corasick ----
    // ns86's contract at dictionary scale: one automaton pass
    // instead of per-pattern contains. Planted tails exercise
    // nested patterns (blk:alpha ⊂ blk:alphabet ⊃ lphabet),
    // shared prefixes, repeats, and the no-hit path; the oracle is
    // pattern-agnostic contains, so AC must agree exactly.
    "ns87_phrase_blocklist" -> ((s, d) =>
      graft.ns.MultiPattern.scan(
        t(s, d, "documents").select(col("doc_id"),
          concat(col("text"), when(col("doc_id") % 4 === 0,
            lit(" blk:alphabet"))
            .when(col("doc_id") % 4 === 1, lit(" blk:beta"))
            .when(col("doc_id") % 4 === 2,
              lit(" say beta twice beta"))
            .otherwise(lit(""))).as("text")),
        "doc_id", "text",
        Seq("blk:alpha", "blk:alphabet", "lphabet", "blk:beta",
          "beta"))),

    // ---- §2.8 [NS] frame sampling over a binary column ----
    // The video-ish multimodal step: deterministic byte-slice frames
    // from an opaque payload. Payload bytes are a printable-ASCII
    // formula (33 + (id+i) % 94), so the oracle reconstructs every
    // frame STRING and sha256-matches the engine's hash of the raw
    // slice — byte-exact gate for binary substring plumbing.
    "ns85_frame_sample" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_frames")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), length(col("text")).as("len"))
        .collect().foreach { r =>
          val id = r.getLong(0)
          val len = r.getInt(1)
          val sz = len % 977 + 64
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath, s"doc_$id.bin"),
            Array.tabulate(sz)(i => (33 + ((id + i) % 94)).toByte))
        }
      materializeAndDrop(Multimodal.frameSample(
        Multimodal.readBinaryDir(s, dir.getPath, "*.bin"),
        nFrames = 4), dir)
    }),

    // ---- §2.8 [NS] weighted sampling without replacement ----
    // Efraimidis–Spirakis with the RNG replaced by the content hash:
    // inclusion ∝ n_chars, yet fully reproducible. TakeOrdered cut —
    // k rows per partition cross the wire, never a sort.
    "ns75_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100, salt = "es1")),

    // ---- §2.8 [NS] exact stratified split ----
    // hashSplit's fractions hold only in expectation; this cuts each
    // source's hash-ranked rows at floor(f·n) so realized counts are
    // exact per group.
    "ns76_stratified_split" -> ((s, d) =>
      Sampling.stratifiedSplit(t(s, d, "documents"), "doc_id",
        "source", "strat1", Seq("train" -> 0.8, "val" -> 0.1))),

    // ---- §2.8 [NS] audio dominant frequency (Goertzel argmax) ----
    // Clip lengths are multiples of the 64-bin grid, so every probe
    // frequency is an exact DFT bin and the sawtooth's fundamental
    // (rate/4, grid j=16) wins with zero leakage — the oracle
    // predicts a DSP result from the generation formula (ns56's
    // closed-form trick, one rung up).
    "ns74_wav_dominant_freq" -> ((s, d) => {
      val dir = newScratchDir("graft_mm_wavdom")
      t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), length(col("text")).as("len"))
        .collect().foreach { r =>
          val id = r.getLong(0)
          val len = r.getInt(1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir.getPath, s"doc_$id.wav"),
            Multimodal.writeWav(len % 8000 + 8000,
              ((len * 7) % 30 + 2) * 64))
        }
      materializeAndDrop(Multimodal.dominantFrequency(
        Multimodal.readBinaryDir(s, dir.getPath, "*.wav")).toDF(), dir)
    }),

    // Matryoshka truncation to d'=16 — the embedding storage/latency
    // ladder; scalarized for the gate like ns35/ns36.
    "ns57_matryoshka_truncate" -> ((s, d) =>
      graft.ns.Embeddings.matryoshkaTruncate(t(s, d, "embeddings"),
        "vec_id", "embedding", dPrime = 16)
        .select(col("vec_id"), col("full_norm"), col("kept_norm"),
          col("energy_ratio"),
          posexplode(col("unit")).as(Seq("idx", "unit_val")))),

    // Per-label centroids (mean pooling) via EXACT fixed-point sums —
    // order-independent integer accumulation is what lets a float
    // mean hash-match across engines. Scalarized for the gate like
    // ns35 (centroid array → (idx, centroid_val) rows).
    "ns38_label_centroids" -> ((s, d) =>
      graft.ns.Embeddings.labelCentroids(t(s, d, "embeddings"),
        "label", "embedding")
        .select(col("label"), col("n_vectors"),
          posexplode(col("centroid")).as(Seq("idx", "centroid_val")))),

    // Temperature-weighted (T=2) mixture rates per source — the
    // UniMax-style upweighting that feeds mixtureSample.
    "ns39_temperature_mixture" -> ((s, d) =>
      graft.ns.Sampling.temperatureMixRates(t(s, d, "documents"),
        "source")),

    // Semantic dedup: cosine near-dup pairs → connected components →
    // keep-one. Rows-only (LSH bucketing is engine-specific, like
    // ns07 it builds on); partition/representative laws in
    // ClustersSpec. Same sweep-derived setting as ns07 (bl 0.1,
    // recall 0.94, cap off — see the ns07 comment for the measured
    // rationale).
    "ns40_semantic_dedup" -> ((s, d) =>
      graft.ns.Clusters.semanticDedup(t(s, d, "embeddings"),
        "vec_id", "embedding", minCosine = 0.4, numHashTables = 8,
        bucketLength = 0.1)),

    // ns40's registered 100-TB twin: semantic dedup over the CAPPED
    // pair generator (see ns07b) — bounded candidates at any corpus
    // density, the path a tail-threshold workload takes at scale.
    "ns40b_semantic_dedup_capped" -> ((s, d) =>
      graft.ns.Clusters.semanticDedup(t(s, d, "embeddings"),
        "vec_id", "embedding", minCosine = 0.4, numHashTables = 8,
        bucketLength = 0.1, maxBucketSize = Some(64))),

    // Incremental MinHash near-dup: the NEW half of the corpus
    // banded against the stored half, no store self-join. Rows-only
    // (xxhash64 family); NsDedupSpec proves equality with the full
    // self-join restricted to cross pairs.
    "ns41_incremental_minhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.minhashNearDupNewVsStore(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 3, maxJaccardDist = 0.5)
    }),

    // Boilerplate removal: segments appearing in >1 distinct doc are
    // chrome, stripped from EVERY doc (vs ns33's keep-first). The
    // boilerplate dictionary is broadcast; the corpus shuffles once.
    "ns42_boilerplate_removal" -> ((s, d) =>
      graft.ns.Dedup.boilerplateRemoval(t(s, d, "documents"),
        "doc_id", "text", segWords = 10, maxDocs = 1)),

    // Sliding-window chunking for retrieval/embedding prep: 32-word
    // windows, stride 8 (24-word overlap). Zero-shuffle projection.
    "ns43_chunk_windows" -> ((s, d) =>
      graft.ns.TextOps.chunkWindows(t(s, d, "documents"),
        "doc_id", "text", windowWords = 32, strideWords = 8)),

    // Snapshot reconciliation: two deterministic synthetic snapshots
    // of the documents fixture (old drops ids ≡3 mod 10; new drops
    // ids ≡7 mod 10 and rewrites ids ≡0 mod 5), diffed by content
    // md5 in ONE full-outer join over (id, fingerprint) pairs.
    "ns44_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.ns.Snapshot.snapshotDiff(
        docs.filter(col("doc_id") % 10 =!= 3)
          .select(col("doc_id"), col("text")),
        docs.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text")),
        "doc_id", "text")
    }),

    // Rare-token (OOV-rate) quality signal: tokens with corpus df < 3
    // counted per doc; the common vocabulary (Zipf head) is broadcast,
    // the corpus pays one per-doc exchange.
    "ns45_rare_token_stats" -> ((s, d) =>
      graft.ns.TextOps.rareTokenStats(t(s, d, "documents"),
        "doc_id", "text", minDf = 3)),

    // Corpus trigram count table, top 100: map-combinable agg +
    // TakeOrdered, vocab's n-gram generalization.
    "ns46_ngram_topk" -> ((s, d) =>
      graft.ns.TextOps.ngramTopK(t(s, d, "documents"),
        "doc_id", "text", n = 3, k = 100)),

    // Substring-dedup diagnostic: per-doc duplicated-trigram profile
    // with the longest consecutive duplicated run (copy-paste span).
    "ns47_dup_span_profile" -> ((s, d) =>
      graft.ns.Dedup.dupSpanProfile(t(s, d, "documents"),
        "doc_id", "text", n = 3)),

    // kNN label propagation: the first 50 vectors are the "unlabeled"
    // queries, the rest the labeled corpus; each query takes the
    // majority label of its 5 nearest labeled neighbors (exact
    // cosine). Votes are integers and every tie has a deterministic
    // break, so the gate is exact.
    "ns48_knn_labels" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.knnClassify(
        emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
        "label",
        emb.filter(col("vec_id") < 50), "vec_id", "embedding", k = 5)
    }),

    // The large-|Q| kNN-labeling scale path: neighbors from the LSH
    // ANN generator instead of the exact broadcast scan (ns48 is
    // linear in corpus × |Q| by design; annTopK is the sublinear
    // candidate path — 6.5× at 10× data, SCALE.md), fed to the SAME
    // generator-agnostic vote. Rows-only (LSH bucketing is
    // engine-specific); NsSimilaritySpec carries the recall law and
    // the vote's exactness is gated via ns48.
    "ns54_knn_labels_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.voteLabels(
        Similarity.annTopK(
          emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 5, minCosine = -1.0, numHashTables = 8,
          bucketLength = 0.2),
        emb.filter(col("vec_id") >= 50), "vec_id", "label")
    }),

    // Quality-aware survivor selection over the ns37 cluster
    // assignment: keep the highest-quality member of each near-dup
    // cluster (not the smallest-id one). Quality = the ns09 gate
    // score — exact fifths, so ordering is engine-independent.
    "ns49_cluster_survivors" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.ns.Clusters.survivorSelection(
        graft.ns.Clusters.dedupClusters(docs, "doc_id",
          Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.5, maxDocFreq = Some(5)),
          "id_a", "id_b"),
        "doc_id", "cluster_id",
        docs.select(col("doc_id").as("qid"),
          TextOps.qualityScoreCol(col("text")).as("q")),
        "qid", "q")
    }),

    // Leakage-safe splitting: hash-split on the near-dup CLUSTER id,
    // not the doc id, so near-duplicates can never straddle
    // train/val/test (the classic eval-leakage bug a doc-level split
    // invites). Composition of ns37's clustering with ns17's
    // content-addressed split; every member inherits its cluster's
    // assignment by construction.
    "ns52_cluster_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Sampling.hashSplit(
        graft.ns.Clusters.dedupClusters(docs, "doc_id",
          Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.5, maxDocFreq = Some(5)),
          "id_a", "id_b")
          .select(col("doc_id"), col("cluster_id")),
        "cluster_id", "cl1",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("cluster_id"), col("split"))
    }),

    // Epoch-aware upsampling: per-source weights above AND below 1
    // (src0 2.5 epochs, src2 downsampled, others 1.2); each row gets
    // floor(w) copies plus a hash-selected extra, tagged 1-based
    // `epoch`. Deterministic, so the gate is exact.
    "ns51_epoch_upsample" -> ((s, d) =>
      graft.ns.Sampling.upsampleEpochs(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4),
        defaultWeight = 1.2, salt = "ep1")),

    // Semantic decontamination: vectors 0-19 stand in for a held-out
    // eval set; every other vector is scored by its max cosine to any
    // eval vector (eval embedded as literals — zero-shuffle
    // projection) and flagged at 0.3. The embedding analogue of the
    // n-gram ns22 gate.
    "ns50_semantic_contamination" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.semanticContamination(
        emb.filter(col("vec_id") >= 20), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "embedding", minCosine = 0.3)
    }),

    // ---- §7.4.6 streaming restatement, driver-gated ----
    // Runs the WHOLE streaming path per invocation: file-source stream
    // over the events fixture (AvailableNow trigger), watermarked
    // 1-hour tumbling rollup, idempotent run_hr-partitioned gold sink,
    // then reads the gold back. Deterministic because append mode
    // emits exactly the windows the final watermark (max ts − 30 min)
    // closed — a condition the DuckDB oracle reproduces in SQL — and
    // the value sums are decimal-exact. Stream ≡ batch is ALSO proven
    // as a property in StreamingSpec; this entry puts it behind the
    // driver's hash gate.
    "s01_streaming_rollup" -> ((s, d) => {
      val base = newScratchDir("graft_s01")
      // The file stream source needs a DIRECTORY; stage the fixture
      // file into one (driver-side copy of a small file, fixture
      // plumbing like ns14's payload materialization).
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
      // declared schema from the parquet footer; Tables.normalizeTs
      // branches on whatever ts type the fixture shipped (Long nanos,
      // TIMESTAMP_NTZ, or native timestamp) — the SAME helper the batch
      // reads use, so a fixture regeneration cannot split the two paths.
      val raw = s.read.parquet(srcDir.getPath).schema
      // One day of the fixture, not all 30: each gold write dynamically
      // replaces one run_hr directory per closed window, and 720
      // directories per evaluation is the same file-creation storm the
      // o10 gate already retired — production restates a handful of
      // recent partitions per batch, never a month at once.
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-30 00:00:00"))
      val q = EventStream.startGoldStream(
        EventStream.hourlyRollup(stream),
        s"${base.getPath}/gold", s"${base.getPath}/ckpt")
      q.awaitTermination()
      materializeAndDrop(
        s.read.parquet(s"${base.getPath}/gold")
          .select(col("run_hr").cast("long").as("run_hr"),
            col("event_type"), col("n"), col("total")), base)
    }),

    // ---- §7.4.6 arbitrary stateful streaming, driver-gated ----
    // flatMapGroupsWithState sessionization behind the hash gate: the
    // emitted set is deterministic — every session closed in-batch by
    // a later event, plus each user's final session iff the final
    // watermark passed its timeout — and the oracle reproduces both
    // rules with gaps-and-islands SQL. total_value is a sequential
    // double fold in event order; rounding to 2 decimals makes it
    // comparable (the true sum IS a 2-decimal rational, so both
    // engines round to the same double).
    "s02_sessionize" -> ((s, d) => {
      import s.implicits._
      val base = newScratchDir("graft_s02")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
      val raw = s.read.parquet(srcDir.getPath).schema
      // Bounded to the fixture's last 11 days: session semantics are
      // fully exercised (multi-event sessions, in-batch closes,
      // timeout closes) without paying for a month of state churn per
      // evaluation; the oracle applies the identical cut.
      val events = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-20 00:00:00"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStream.Event]
      val out = s"${base.getPath}/sessions"
      val q = EventStream.sessionize(events, gapMinutes = 720,
        watermark = "1 hour")
        .toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", s"${base.getPath}/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      materializeAndDrop(
        s.read.parquet(out).select(col("user_id"), col("session_start"),
          col("session_end"), col("n_events"),
          round(col("total_value"), 2).as("total_value")), base)
    }),

    // ---- §7.4.6 streaming at-least-once dedup, driver-gated ----
    // The source dir gets TWO copies of the events fixture — a
    // replayed delivery, the at-least-once failure mode — and
    // dropDuplicatesWithinWatermark(event_id) must emit each event
    // exactly once. Deterministic: both deliveries are byte-identical,
    // so whichever arrival wins, the emitted row is the same; the
    // oracle is simply the distinct source rows. Bounded to the
    // fixture's last 11 days like s02 to cap per-evaluation state.
    "s03_stream_dedup" -> ((s, d) => {
      val base = newScratchDir("graft_s03")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      Seq("events_a.parquet", "events_b.parquet").foreach { f =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          java.nio.file.Paths.get(srcDir.getPath, f))
      }
      val raw = s.read.parquet(srcDir.getPath).schema
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-20 00:00:00"))
      val out = s"${base.getPath}/deduped"
      val q = EventStream.dedupWithinWatermark(stream, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"${base.getPath}/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      materializeAndDrop(s.read.parquet(out), base)
    }),

    // ---- §7.4.6 stream-stream range join, driver-gated ----
    // The streaming twin of ns31: clicks in the hour before each
    // purchase, as a watermarked stream-stream inner join whose
    // drained output must EQUAL the batch range join — the DuckDB
    // oracle is ns31's SQL with the same date cut. Gates the claim
    // that the streaming restatement extends to joins, not just
    // aggregations/dedup/sessionization.
    "s05_stream_stream_join" -> ((s, d) => {
      val base = newScratchDir("graft_s05")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
      val raw = s.read.parquet(srcDir.getPath).schema
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-20 00:00:00"))
      val out = s"${base.getPath}/joined"
      val q = EventStream.clickAttribution(stream)
        .select(col("purchase_id"), col("user_id"),
          unix_micros(col("p_ts")).as("p_ts_us"),
          col("click_id"), unix_micros(col("c_ts")).as("click_ts_us"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"${base.getPath}/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      materializeAndDrop(s.read.parquet(out), base)
    }),

    // ---- §7.4.6 stream-static broadcast enrichment join ----
    // The one streaming join shape s01–s05 didn't cover: stream ⋈
    // static dimension (broadcast, stateless) → windowed rollup per
    // dim attribute. Same fixture day and window-close rule as s01.
    "s06_stream_static_join" -> ((s, d) => {
      val base = newScratchDir("graft_s06")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(srcDir.getPath, "events.parquet"))
      val raw = s.read.parquet(srcDir.getPath).schema
      val stream = Tables.normalizeTs(
        EventStream.fileSource(s, srcDir.getPath, raw))
        .filter(col("ts") >= lit("2024-01-30 00:00:00"))
      val out = s"${base.getPath}/enriched"
      val q = EventStream.enrichedRollup(stream,
        t(s, d, "customer"), "c_custkey", "c_mktsegment")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"${base.getPath}/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      materializeAndDrop(
        s.read.parquet(out)
          .select(col("run_hr").cast("long").as("run_hr"),
            col("c_mktsegment"), col("n"), col("total")), base)
    }),

    // ---- §7.4.6 streaming keyed upsert (CDC apply), driver-gated ----
    // A "latest row per user" table maintained by startUpsertStream:
    // target seeded from pre-cut1 history, then two time-split update
    // files merged as separate micro-batches (maxFilesPerTrigger=1).
    // Batches arrive in time order, so the final table must equal the
    // global argmax-by-(ts, event_id) per user — the oracle computes
    // exactly that over ALL events in one window.
    "s07_stream_upsert" -> ((s, d) => {
      val base = newScratchDir("graft_s07")
      val cut1 = "2024-01-15 00:00:00"
      val cut2 = "2024-01-30 00:00:00"
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("ts"), col("event_type"), col("value"),
        pmod(col("user_id"), lit(8L)).as("part"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val seed = ev.filter(col("ts") < lit(cut1))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val path = s"${base.getPath}/target"
      graft.ops.MergeUpsert.init(seed, path, "part")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      // Two flat, mtime-ordered batch files: the file source processes
      // oldest-first, so the CDC in-order contract holds by layout.
      Seq(col("ts") >= lit(cut1) && col("ts") < lit(cut2),
        col("ts") >= lit(cut2)).zipWithIndex.foreach { case (p, i) =>
        val tmp = new java.io.File(base, s"tmp$i")
        ev.filter(p).coalesce(1).write.parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(srcDir, s"batch$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        deleteRecursively(tmp)
      }
      val stream = EventStream.fileSource(s, srcDir.getPath,
        s.read.parquet(srcDir.getPath).schema, maxFilesPerTrigger = 1)
      val q = EventStream.startUpsertStream(stream, path,
        s"${base.getPath}/ckpt", keyCols = Seq("user_id"),
        versionCols = Seq("ts", "event_id"), partitionCol = "part")
      q.awaitTermination()
      materializeAndDrop(
        s.read.parquet(path).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"),
          col("value"), col("part").cast("long").as("part")), base)
    }),

    // ---- §7.4.6 streaming sketch maintenance, driver-gated ----
    // Documents stream in two micro-batches; per-batch CMS deltas
    // land as idempotent batch_id partitions and the merged read must
    // BIT-EQUAL the whole-corpus batch sketch — same oracle as ns93.
    "s08_stream_sketch" -> ((s, d) => {
      val base = newScratchDir("graft_s08")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      val docs = t(s, d, "documents")
      Seq(col("doc_id") % 2 === 0, col("doc_id") % 2 =!= 0)
        .zipWithIndex.foreach { case (p, i) =>
          val tmp = new java.io.File(base, s"tmp$i")
          docs.filter(p).coalesce(1).write.parquet(tmp.getPath)
          val part = tmp.listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(srcDir, s"batch$i.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1700000000000L + i * 60000L)
          deleteRecursively(tmp)
        }
      val stream = EventStream.fileSource(s, srcDir.getPath,
        s.read.parquet(srcDir.getPath).schema, maxFilesPerTrigger = 1)
      val store = s"${base.getPath}/sketch"
      val q = EventStream.startSketchStream(stream, store,
        s"${base.getPath}/ckpt", "source", "text")
      q.awaitTermination()
      materializeAndDrop(
        EventStream.readSketchStore(s, store, "source"), base)
    }),

    // ---- §7.4.6 streaming curation pass, driver-gated ----
    // The curation operators are stateless projections, so they run
    // UNCHANGED on a stream: quality + language gates as pure-column
    // filters, then the ns19 PII scrub (same synthetic tail), inside
    // one micro-batched file stream. No watermark needed — nothing
    // here holds state. Gates the claim that batch curation and
    // stream curation are the same code.
    "s04_stream_curation" -> ((s, d) => {
      val base = newScratchDir("graft_s04")
      val srcDir = new java.io.File(base, "src")
      srcDir.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/documents.parquet"),
        java.nio.file.Paths.get(srcDir.getPath, "documents.parquet"))
      val raw = s.read.parquet(srcDir.getPath).schema
      val kept = s.readStream.schema(raw).parquet(srcDir.getPath)
        .filter(TextOps.qualityScoreCol(col("text")) === 1.0 &&
          TextOps.langIdCol(col("text")) === "en")
        .select(col("doc_id"),
          withPiiTail(col("text"), col("doc_id")).as("text"))
      val out = s"${base.getPath}/curated"
      val q = TextOps.redactPii(kept, "doc_id", "text")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"${base.getPath}/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      materializeAndDrop(s.read.parquet(out), base)
    }),

    // ---- §2.8 [NS] deterministic content-addressed split ----
    // Train/val/test assignment that survives reruns, repartitioning,
    // and corpus growth — a pure projection on md5 buckets, so the
    // whole sampling surface sits behind the cross-engine hash gate.
    "ns17_hash_split" -> ((s, d) =>
      Sampling.hashSplit(t(s, d, "documents").select(col("doc_id")),
        "doc_id", "v1",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),

    // ---- §2.8 [NS] per-source quota cap (bounded group top-k) ----
    "ns18_source_quota" -> ((s, d) =>
      Sampling.groupQuota(
        t(s, d, "documents").select(col("source"), col("doc_id"),
          col("n_chars")),
        Seq(col("source")), 50,
        Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("source"), col("doc_id"), col("n_chars"),
          col("rn").cast("long").as("rn"))),

    // ---- §2.8 [NS] deterministic mixture sampling ----
    // Per-source target rates turn the raw corpus into a weighted
    // training mixture; content-addressed keep/drop (md5 buckets like
    // ns17) keeps the realized mixture reproducible cross-engine.
    "ns23_mixture_sample" -> ((s, d) =>
      Sampling.mixtureSample(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.1, salt = "mix1")),

    // ---- §2.8 [NS] deterministic corpus shuffle (training order) ----
    "ns28_pseudo_shuffle" -> ((s, d) =>
      Sampling.pseudoShuffle(t(s, d, "documents"), "doc_id", "shuf1")),

    // ---- §2.8 [NS] concat-and-chunk packing offsets ----
    // Global start offset of each doc in the doc_id-ordered
    // concatenation (by n_chars) and the context-window index it
    // falls in. Small bucketSize so the two-phase prefix path (not a
    // single-partition window) is what the fixture actually executes.
    "ns24_pack_offsets" -> ((s, d) =>
      Sampling.packOffsets(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", chunkSize = 2048, bucketSize = 100L)),

    // ---- §3.1 pipeline composition, driver-gated end to end ----
    // The full bronze→silver→gold→DQ flow over payloads synthesized
    // deterministically from fixture dimensions, so the WHOLE pipeline
    // (python-repr repair, declared-schema staged read, gold
    // transforms, DQ gate, partition-overwrite write, gold read-back)
    // sits behind a DuckDB oracle expressed over the source table.
    "p01_weather_pipeline" -> ((s, d) => p01WeatherPipeline(s, d)),
    "p02_cocktails_pipeline" -> ((s, d) => p02CocktailsPipeline(s, d)),

    // ---- §2.8 [NS] end-to-end curation pipeline, driver-gated ----
    // The LLM-data analogue of p01/p02: raw corpus (with a simulated
    // re-crawl — every 10th doc re-ingested under a new id) →
    // Gopher quality gate → language gate → exact dedup (original id
    // survives, dup_count records the replay) → per-source mixture
    // sampling → train/val/test split. Every stage is an
    // already-gated operator; this entry gates their COMPOSITION in
    // one DuckDB oracle. The text gates are pure-column FILTERS and
    // the survivor's source rides through the dedup agg (carry), so
    // the whole pipeline is ONE shuffle — the dedup groupBy — plus
    // pure filters/projections at any scale.
    // Incremental curation: the 100-TB operating mode — NOTHING
    // corpus-sized is recurated. snapshotDiff (fingerprint-only
    // full-outer, payloads never shuffle) isolates added/changed
    // docs; only that delta pays the quality/lang gates; the
    // already-curated store contributes a fingerprint projection to
    // the anti-join (bucketed store ⇒ no exchange); the admitted
    // batch gets split assignments. Cost ∝ delta, not corpus.
    "p04_incremental_curation" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      // ns44's deterministic snapshot pair: old drops ids ≡3 (mod
      // 10), new drops ≡7 (mod 10) and rewrites ids ≡0 (mod 5)
      val oldSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      val newSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .select(col("doc_id"), col("source"),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val delta = graft.ns.Snapshot.snapshotDiff(
          oldSnap, newSnap, "doc_id", "text")
        .filter(col("status").isin("added", "changed"))
        .select(col("doc_id").as("delta_id"))
      val fresh = newSnap
        .join(delta, newSnap("doc_id") === col("delta_id"))
        .drop("delta_id")
      val kept = fresh
        .filter(TextOps.qualityScoreCol(col("text")) === 1.0 &&
          TextOps.langIdCol(col("text")) === "en")
      // the store holds what ITS ingest admitted: same gates, run at
      // the old snapshot's own ingest time — fingerprints only
      val store = oldSnap
        .filter(TextOps.qualityScoreCol(col("text")) === 1.0 &&
          TextOps.langIdCol(col("text")) === "en")
        .select(Dedup.fingerprint(col("text")).as("fingerprint"))
      val admitted = Dedup.incrementalExactDedup(
        kept, store, "doc_id", "text")
      Sampling.hashSplit(
        admitted.select(col("doc_id"), col("dup_count")),
        "doc_id", "p04split",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("dup_count"), col("split"))
    }),

    // ---- §3 curation pipeline v2: the round-9 operator chain ----
    // C4 line cleaning → exact dedup on the CLEANED text → linear-
    // classifier quality gate → per-source quota, end-to-end: the
    // modern curation recipe as one composition, every stage an
    // already-gated operator, the whole chain re-gated in SQL.
    "p05_curation_v2" -> ((s, d) => {
      val lined = t(s, d, "documents").select(col("doc_id"),
        col("source"), concat(
          regexp_replace(col("text"), " table ", ".\n"),
          when(col("doc_id") % 7 === 0,
            lit("\nlorem ipsum dolor sit amet placeholder text here."))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nfunction f() { return 1; }")).otherwise(lit("")),
          lit("\ntoo short."),
          lit("\nthis is a good closing sentence for the document."))
          .as("text"))
      val clean = TextOps.c4LineFilter(lined, "doc_id", "text")
        .join(lined.select(col("doc_id"), col("source")), "doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp")).orderBy(col("doc_id"))
      val surv = clean
        .withColumn("__fp", Dedup.fingerprint(col("clean_text")))
        .withColumn("__rnfp", row_number().over(w))
        .filter(col("__rnfp") === 1).drop("__rnfp", "__fp")
      val scored = surv.join(
        TextOps.linearQualityScore(
          surv.select(col("doc_id"), col("clean_text").as("text")),
          "doc_id", "text")
          .select(col("doc_id"), col("logit_micro")), "doc_id")
        .filter(col("logit_micro") > 0L)
      Sampling.groupQuota(
        scored.select(col("doc_id"), col("source"), col("n_kept"),
          col("logit_micro")),
        Seq(col("source")), 20,
        Seq(col("n_kept").desc, col("doc_id")))
        .select(col("doc_id"), col("source"), col("n_kept"),
          col("logit_micro"), col("rn").cast("long").as("rn"))
    }),

    "p03_curation_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val replay = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val corpus = docs.unionAll(replay)
      val kept = corpus
        .filter(TextOps.qualityScoreCol(col("text")) === 1.0 &&
          TextOps.langIdCol(col("text")) === "en")
      // the survivor's source rides through the dedup agg (carry) —
      // no corpus-sized join-back to recover it
      val surv = Dedup.exactDedup(kept, "doc_id", "text",
        carry = Seq("source"))
      val mixed = Sampling.mixtureSample(surv, "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25,
        salt = "p03mix")
      Sampling.hashSplit(
        mixed.select(col("doc_id"), col("source"), col("dup_count")),
        "doc_id", "p03split",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("source"), col("dup_count"),
          col("split"))
    }),
  )

  private val pipelineRunHr = 202608121000L

  /** Deterministic synthetic PII tail for the redaction gates (the
    * fixture text carries no PII): email + phone + IPv4 derived from
    * doc_id. ONE definition shared by ns19 and s04 so the two gates
    * can't silently diverge; the SQL oracles rebuild the identical
    * tail. */
  private def withPiiTail(text: Column, id: Column): Column =
    concat(text,
      lit(" contact user"), id.cast("string"),
      lit("@mail.example.com call +1-555-"),
      lpad(pmod(id, lit(1000)).cast("string"), 3, "0"),
      lit("-"),
      lpad(pmod(id * 7, lit(10000)).cast("string"), 4, "0"),
      lit(" from 10.0."),
      pmod(id, lit(256)).cast("string"), lit("."),
      pmod(id * 3, lit(256)).cast("string"),
      lit(" card 4111-1111-1111-"),
      lpad(pmod(id, lit(10000)).cast("string"), 4, "0"),
      lit(" ssn "),
      lpad(pmod(id, lit(1000)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(id * 3, lit(100)).cast("string"), 2, "0"), lit("-"),
      lpad(pmod(id * 9, lit(10000)).cast("string"), 4, "0"))

  /** Weather flow: one bronze doc per nation row (python-repr for odd
    * keys — the reference's unrepaired-weather quirk), S11 sensor,
    * S6 staged read, flat gold transform, Q2 gate, O10 write. */
  private def p01WeatherPipeline(s: SparkSession, d: String): DataFrame = {
    val base = newScratchDir("graft_p01")
    val bronze = s"${base.getPath}/bronze/weather/run_hr=$pipelineRunHr"
    val nations = t(s, d, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val payloads = nations.toSeq.map { case (key, name, region) =>
      val quote = if (key % 2 == 1) "'" else "\""
      def q(v: Any) = s"$quote$v$quote"
      val doc = s"{${q("location")}: {${q("name")}: ${q(name)}, " +
        s"${q("country")}: ${q("US")}, " +
        s"${q("localtime")}: ${q(f"2026-08-12 10:$key%02d")}}, " +
        s"${q("current")}: {${q("temp_c")}: ${key + 0.5}, " +
        s"${q("temp_f")}: ${(key + 0.5) * 2}, ${q("is_day")}: ${key % 2}, " +
        s"${q("condition")}: {${q("text")}: ${q(s"Cond $region")}, " +
        s"${q("code")}: ${1000 + region}}, " +
        s"${q("humidity")}: ${40 + key}, ${q("cloud")}: $key}}"
      (name, doc)
    }
    Run.writeRawText(s, bronze, payloads.map { case (name, doc) =>
      (name.toLowerCase.replace(" ", "_") + ".json", doc)
    })
    require(Run.awaitFiles(s, bronze,
      payloads.map(_._1 + ".json"), timeoutMs = 5000, pollMs = 20),
      "p01 bronze objects missing")
    val stage = JsonIngest.readStaged(s, s"$bronze/*.json",
      Schemas.weatherStage)
    val gold = Run.withAuditCols(Run.weatherGoldFlat(stage), pipelineRunHr)
    Checks.gate(gold, "p01_weather", pipelineRunHr,
      Checks.CheckConfig(minRows = 1,
        maxNullRate = Map("city" -> 0.0, "temp_c" -> 0.0),
        expectedRunHr = Some(pipelineRunHr),
        uniqueKey = Some(Seq("city_key"))))(_ => ())
    IdempotentWriter.replacePartitions(gold,
      s"${base.getPath}/gold/weather", Seq("run_hr"))
    materializeAndDrop(
      s.read.parquet(s"${base.getPath}/gold/weather")
        .select(col("city_key"), col("city"), col("country"),
          col("localtime_ts"), col("temp_c"), col("temp_f"), col("is_day"),
          col("condition_text"), col("condition_code"), col("humidity"),
          col("cloud"), col("run_hr").cast("long").as("run_hr")), base)
  }

  /** Cocktails flow: ONE bronze doc holding a dirty python-repr drinks
    * array built from part rows (raw CR/LF in a string field, trailing
    * commas), J1 explode + O14 rename gold, Q2 gate, O10 write. */
  private def p02CocktailsPipeline(s: SparkSession, d: String): DataFrame = {
    val base = newScratchDir("graft_p02")
    val bronze = s"${base.getPath}/bronze/cocktails/run_hr=$pipelineRunHr"
    val parts = t(s, d, "part")
      .filter(col("p_partkey") < 20)
      .select(col("p_partkey").cast("long"), col("p_name"),
        col("p_brand"), col("p_type"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val drinks = parts.toSeq.map { case (key, name, brand, ptype) =>
      s"{'idDrink': '$key', 'strDrink': '$name', " +
        "'strAlcoholic': 'Alcoho\rli\n\rc', " +
        s"'strCategory': '$ptype', 'strGlass': '$brand', " +
        s"'strIngredient1': '$brand', 'strMeasure1': '2 oz',}"
    }.mkString(", ")
    Run.writeRawText(s, bronze,
      Seq(("cocktails.json", s"{'drinks': [$drinks],}")))
    val stage = JsonIngest.readStaged(s, s"$bronze/*.json",
      Schemas.cocktailsStage)
    val gold = Run.withAuditCols(Run.cocktailsGold(stage), pipelineRunHr)
    Checks.gate(gold, "p02_cocktails", pipelineRunHr,
      Checks.CheckConfig(minRows = 1,
        maxNullRate = Map("id_drink" -> 0.0, "drink" -> 0.0),
        expectedRunHr = Some(pipelineRunHr),
        uniqueKey = Some(Seq("id_drink"))))(_ => ())
    IdempotentWriter.replacePartitions(gold,
      s"${base.getPath}/gold/cocktails", Seq("run_hr"))
    materializeAndDrop(
      s.read.parquet(s"${base.getPath}/gold/cocktails")
        .select(col("id_drink").cast("long").as("id_drink"), col("drink"),
          col("category"), col("glass"), col("ingredient1"),
          col("measure1"), col("alcoholic"),
          col("run_hr").cast("long").as("run_hr")), base)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Per-evaluation scratch dirs. ONE shared JVM shutdown hook sweeps
    * whatever is still registered (the crash path); the happy path is
    * [[materializeAndDrop]], which deletes each dir the moment the
    * entry's result no longer depends on its files — under the bench
    * (warm-up + retime rounds) and Verify, per-evaluation hooks and
    * staged copies otherwise accumulate for the whole JVM lifetime
    * (round-4 ADVICE). */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  private lazy val scratchHookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchDirs.forEach(d => deleteRecursively(d))
    }))
    true
  }
  private def newScratchDir(prefix: String): java.io.File = {
    require(scratchHookInstalled)
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    scratchDirs.add(dir)
    dir
  }

  /** Collect a DIMENSION-SIZED result into driver memory, eagerly
    * delete the scratch dir it reads from, and return a local-backed
    * DataFrame with the identical schema — so the caller can still
    * evaluate the result (noop write, parquet dump) after the files
    * are gone. Every scratch-backed entry returns at most a few
    * thousand rows by construction (gold rollups, 50-doc fixtures,
    * 25-row dimensions), so the collect is bounded, not a data path. */
  private def materializeAndDrop(df: DataFrame,
      dir: java.io.File): DataFrame = {
    val s = df.sparkSession
    val rows = df.collect()
    deleteRecursively(dir)
    scratchDirs.remove(dir)
    s.createDataFrame(s.sparkContext.makeRDD(rows.toSeq, 1), df.schema)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | MIN(l_quantity) AS min_qty,
        | MAX(l_extendedprice) AS max_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // Parameterized-SQL entry point ≡ the DataFrame entry point:
    // q01's oracle verbatim.
    "q15_parameterized_sql" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | MIN(l_quantity) AS min_qty,
        | MAX(l_extendedprice) AS max_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // CSV quarantine: PERMISSIVE nulls the unparsable FIELD and keeps
    // the rest, with the raw line in the corrupt column → quarantined
    // flag; both planted rows reproduced literally.
    "j04_csv_ingest" ->
      """SELECT doc_id, source, CAST(length(text) AS INTEGER) AS n_chars,
        |  FALSE AS quarantined
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), 'srcX', 12, TRUE
        |UNION ALL
        |SELECT 13, 'srcY', CAST(NULL AS INTEGER), TRUE""".stripMargin,
    "q02_revenue_by_brand" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q03_local_supplier_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey  = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation   ON s_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q04_customers_with_open_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin,
    "q05_customers_without_partial_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin,
    "q06_top100_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q07_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q08_lateral_flatten" ->
      """SELECT p_partkey, CAST(i AS BIGINT) AS word_idx, w[i] AS word
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part),
        |  UNNEST(range(1, len(w)+1)) AS t(i)""".stripMargin,
    "q09_union_all_counts" ->
      """SELECT o_orderstatus AS category, COUNT(*) AS n FROM orders GROUP BY 1
        |UNION ALL
        |SELECT event_type AS category, COUNT(*) AS n FROM events GROUP BY 1""".stripMargin,
    "q13_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""".stripMargin,
    "q14_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q12_topk_aggregator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q10_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q11_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "o01_nested_struct_projection" ->
      """SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status,
        | CAST(year(o_orderdate) AS BIGINT) AS order_year FROM orders""".stripMargin,
    "o03_json_path_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events",
    "o04_cast_chain" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_linenumber % 2 AS INT) AS BOOLEAN) AS is_even,
        | CAST(l_shipdate AS DATE) AS ship_date,
        | CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str
        |FROM lineitem""".stripMargin,
    "o06_timestamp_munging" ->
      """SELECT event_id,
        | strptime(strftime(ts, '%Y-%m-%d %H:%M') || ':00', '%Y-%m-%d %H:%M:%S') AS parsed_ts,
        | date_trunc('hour', ts) AS hour_ts
        |FROM events""".stripMargin,
    "o07_run_hr_rollup" ->
      """SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,
    "o08_key_normalization" ->
      """SELECT DISTINCT o_orderpriority,
        | lower(replace(o_orderpriority, ' ', '_')) AS norm_key
        |FROM orders""".stripMargin,
    "o09_json_repair_roundtrip" ->
      """SELECT doc_id, lang AS lang2, n_chars AS n2, TRUE AS flag,
        | source AS src2 FROM documents""".stripMargin,
    "o10_idempotent_partition_overwrite" ->
      """SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "o12_audit_columns" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(202608121100 AS BIGINT) AS run_hr,
        | TIMESTAMP '2026-08-12 11:00:00' AS created_at_ts
        |FROM nation""".stripMargin,
    "o13_literal_injection" ->
      """SELECT o_orderkey, o_totalprice,
        | CAST(202608121100 AS BIGINT) AS run_hr FROM orders""".stripMargin,
    // MERGE semantics as anti-join + union: delta wins on key match,
    // target rows survive otherwise, inserts are new keys.
    "o15_keyed_merge" ->
      """WITH target AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation),
        |delta AS (
        |  SELECT n_nationkey, n_name || '_v2' AS n_name, n_regionkey
        |  FROM target WHERE n_regionkey = 1 AND n_nationkey < 10
        |  UNION ALL
        |  SELECT CAST(990 AS BIGINT), 'NEWLAND', CAST(1 AS BIGINT))
        |SELECT * FROM delta
        |UNION ALL
        |SELECT t.* FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM delta d
        |  WHERE d.n_nationkey = t.n_nationkey
        |    AND d.n_regionkey = t.n_regionkey)""".stripMargin,
    // chr(10)-joined pipe table: byte-identical to Notify.renderMessage
    "s12_notification_render" ->
      """SELECT 'Regions loaded:' || chr(10) || 'r_name' || chr(10) ||
        |  string_agg(r_name, chr(10) ORDER BY r_name) AS message
        |FROM region""".stripMargin,
    "o14_rename_map" ->
      """SELECT p_partkey AS part_key, p_name AS part_name, p_brand AS brand,
        | p_type AS part_type, p_size AS part_size,
        | p_retailprice AS retail_price FROM part""".stripMargin,
    // Union schema with null-filled history + the partition column.
    "j05_schema_evolution" ->
      """SELECT doc_id, source, CAST(NULL AS INTEGER) AS n_chars,
        |  0 AS batch
        |FROM documents WHERE doc_id < 50
        |UNION ALL
        |SELECT doc_id, source, CAST(length(text) AS INTEGER), 1
        |FROM documents WHERE doc_id >= 50 AND doc_id < 100""".stripMargin,
    "j06_orc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate
        |FROM orders WHERE o_orderkey < 2000""".stripMargin,
    "j07_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "j08_compaction" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents""".stripMargin,
    // ns70's n=2 slice through the SQL surface + the known repair of
    // the python literal (json.dumps spacing).
    "q16_sql_function_surface" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks,
        |    length(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g')) AS n_chars
        |  FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks)), i ->
        |    array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 2),
        |t2 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram)
        |SELECT b.doc_id,
        |  t2.gram AS top2_gram,
        |  coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top2_frac,
        |  '{"cnt": 1, "ok": true}' AS repaired
        |FROM base b
        |LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |  USING (doc_id)""".stripMargin,
    // Token counts from the independent encoder's table; chars from
    // the canonical text; one division of exact integer sums.
    "ns89_tokenizer_fertility" ->
      """WITH tok AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')
        |  GROUP BY doc_id),
        |base AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(length(regexp_replace(lower(trim(d.text)),
        |      '\s+', ' ', 'g')) AS BIGINT) AS n_chars,
        |    coalesce(t.n_tokens, 0) AS n_tokens
        |  FROM documents d LEFT JOIN tok t USING (doc_id)
        |  WHERE d.doc_id < 100)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_tokens) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
        |    AS tokens_per_char
        |FROM base GROUP BY source""".stripMargin,
    // Same synthetic entities + typo variants; join within 4-char
    // blocks; levenshtein values and the <= 2 cut are integer-exact.
    "ns90_record_linkage" ->
      """WITH base AS (
        |  SELECT doc_id AS ent_id,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS name
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    substr(substr(md5(CAST(doc_id AS VARCHAR)), 1, 10),
        |      1, CAST(doc_id % 6 + 4 AS INT))
        |    || substr(substr(md5(CAST(doc_id AS VARCHAR)), 1, 10),
        |      CAST(doc_id % 6 + 6 AS INT), 10)
        |  FROM documents WHERE doc_id % 5 = 0),
        |blocked AS (
        |  SELECT ent_id, name, substr(name, 1, 4) AS blk FROM base)
        |SELECT a.ent_id AS id_a, b.ent_id AS id_b,
        |  a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM blocked a JOIN blocked b
        |  ON a.blk = b.blk AND a.ent_id < b.ent_id
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,
    "ns88_bpe_learn" ->
      """SELECT "rank", "left", "right" FROM read_parquet(
        |'/root/repo/src/test/resources/graft/bpe_merges_sf001.parquet')
        |""".stripMargin,
    "ns87_phrase_blocklist" ->
      """WITH built AS (
        |  SELECT doc_id, text ||
        |    CASE doc_id % 4 WHEN 0 THEN ' blk:alphabet'
        |      WHEN 1 THEN ' blk:beta'
        |      WHEN 2 THEN ' say beta twice beta'
        |      ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, p AS pattern
        |FROM built, unnest(['blk:alpha','blk:alphabet','lphabet',
        |  'blk:beta','beta']) t2(p)
        |WHERE contains(t, p)""".stripMargin,
    // Same planted markers; hit rows only.
    "ns86_canary_scan" ->
      """WITH built AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' canary:' ||
        |      CASE WHEN doc_id % 3 = 0 THEN 'aa11'
        |           WHEN doc_id % 3 = 1 THEN 'bb22'
        |           ELSE 'cc33' END
        |    ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, c AS canary
        |FROM built, unnest(['canary:aa11','canary:bb22',
        |  'canary:cc33']) t2(c)
        |WHERE contains(t, c)""".stripMargin,
    "j02_variant_single_parse" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,
    "j03_variant_native" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,
    // DuckDB SUM over integers yields HUGEINT, which pandas widens to
    // float64 and the value-hash then sees 0.0 vs Spark's int64 0 —
    // every oracle SUM whose result is a PROJECTED integer column must
    // be CAST(... AS BIGINT). (COUNT(*) is already BIGINT; SUMs that
    // only feed arithmetic are fine.)
    "ns15_column_profile" ->
      """SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(MIN(c_custkey) AS VARCHAR) AS min_str,
        |  CAST(MAX(c_custkey) AS VARCHAR) AS max_str
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', COUNT(*),
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR)
        |FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(*),
        |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
        |FROM customer""".stripMargin,
    "ns01_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        | min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "ns02_ngram_jaccard_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) AS jaccard
        |FROM pairs p
        | JOIN sizes sa ON p.id_a = sa.doc_id
        | JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5""".stripMargin,
    // The full SimHash pipeline in SQL: TF-weighted per-bit votes
    // from md5 token hashes (bits CTE, not 60 columns), packed
    // 60-bit signature, 10×6-bit band collisions, bit_count(xor)
    // Hamming verify.
    "ns04b_simhash_exact" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
        |  FROM toks),
        |votes AS (
        |  SELECT doc_id, b.bit,
        |    SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hashed, UNNEST(range(60)) AS b(bit)
        |  GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
        |      ELSE 0 END) AS simhash
        |  FROM votes GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, simhash, b.band,
        |    (simhash >> (b.band * 6)) & 63 AS chunk
        |  FROM sig, UNNEST(range(10)) AS b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.chunk = b.chunk
        |    AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
        |FROM cand WHERE hamming <= 7""".stripMargin,
    // The full LSH pipeline in SQL: 16 md5 min-hashes, 8 two-row
    // bands (chunk = decimal-concat of the pair, injective), band
    // collisions as candidates, exact distinct-gram Jaccard verify.
    "ns03b_minhash_exact" -> {
      val minCols = (0 until 16).map(j =>
        s"    min(CAST(('0x' || substr(md5(g || ':mh$j'), 1, 15)) " +
          s"AS BIGINT)) AS mh$j").mkString(",\n")
      val branches = (0 until 8).map(b =>
        s"WHEN $b THEN CAST(mh${2 * b} AS VARCHAR) || ':' || " +
          s"CAST(mh${2 * b + 1} AS VARCHAR)").mkString(" ")
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
         |sig AS (
         |  SELECT doc_id,
         |$minCols
         |  FROM grams GROUP BY 1),
         |banded AS (
         |  SELECT doc_id, b.band,
         |    CASE b.band $branches END AS chunk
         |  FROM sig, UNNEST(range(8)) AS b(band)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.chunk = b.chunk
         |    AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |common AS (
         |  SELECT c.id_a, c.id_b, count(*) AS cm
         |  FROM cand c
         |    JOIN grams ga ON ga.doc_id = c.id_a
         |    JOIN grams gb ON gb.doc_id = c.id_b AND ga.g = gb.g
         |  GROUP BY 1, 2)
         |SELECT c.id_a, c.id_b,
         |  1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) AS jaccard_dist
         |FROM common c
         |  JOIN sizes sa ON c.id_a = sa.doc_id
         |  JOIN sizes sb ON c.id_b = sb.doc_id
         |WHERE 1.0 - CAST(cm AS DOUBLE) / (sa.sz + sb.sz - cm) <= 0.5""".stripMargin
    },
    "ns02b_ngram_jaccard_capped" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) AS jaccard
        |FROM pairs p
        | JOIN sizes sa ON p.id_a = sa.doc_id
        | JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5""".stripMargin,
    "dq01_assertion_events" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
        |    COUNT(DISTINCT o_orderkey) AS d
        |  FROM orders),
        |checks AS (
        |  SELECT 'row_count' AS native_type, n >= 1 AS ok,
        |    'rows=' || n || ' min=1' AS native_results FROM m
        |  UNION ALL
        |  SELECT 'null_rate_o_custkey', CAST(nulls AS DOUBLE)/n <= 0.0,
        |    printf('null_rate=%.4f max=%.4f', CAST(nulls AS DOUBLE)/n, 0.0)
        |  FROM m
        |  UNION ALL
        |  SELECT 'unique_key_o_orderkey', d = n,
        |    'distinct=' || d || ' rows=' || n FROM m)
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,orders,PROD)' AS assertee_urn,
        |  'urn:li:assertion:' || md5('graft:' || native_type ||
        |    ':urn:li:dataset:(urn:li:dataPlatform:graft,orders,PROD)') AS assertion_urn,
        |  native_type, native_results,
        |  CASE WHEN ok THEN 'SUCCESS' ELSE 'FAILURE' END AS result_type,
        |  CAST(202608121100 AS BIGINT) AS run_hr,
        |  'COMPLETE' AS run_status
        |FROM checks""".stripMargin,
    "dq02_datahub_aspects" ->
      """WITH m AS (SELECT DISTINCT source AS table_name FROM documents)
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,' || table_name ||
        |    ',PROD)' AS dataset_urn,
        |  'dataset' AS entity_type, 'UPSERT' AS change_type,
        |  'institutionalMemory' AS aspect_name,
        |  'https://dq.example/runbook/' || table_name AS url,
        |  'DQ runbook for ' || table_name AS description,
        |  CAST(NULL AS VARCHAR) AS tag_urn
        |FROM m
        |UNION ALL
        |SELECT
        |  'urn:li:dataset:(urn:li:dataPlatform:graft,' || table_name ||
        |    ',PROD)',
        |  'dataset', 'UPSERT', 'globalTags',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  'urn:li:tag:Monitored_By_Anomalo'
        |FROM m""".stripMargin,
    // LEFT JOIN against distinct parent keys; orphans = unmatched.
    "dq04_fk_orphans" ->
      """WITH ck AS (SELECT DISTINCT c_custkey FROM customer),
        |ok AS (SELECT DISTINCT o_orderkey FROM orders)
        |SELECT 'orders' AS child_table,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(ck.c_custkey) AS BIGINT) AS n_orphans
        |FROM orders LEFT JOIN ck ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(ok.o_orderkey) AS BIGINT)
        |FROM lineitem LEFT JOIN ok ON l_orderkey = o_orderkey""".stripMargin,
    // lead() over distinct (group, hour); a >1h step is a gap.
    "dq05_series_gaps" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hr
        |  FROM events),
        |l AS (
        |  SELECT event_type, hr,
        |    lead(hr) OVER (PARTITION BY event_type ORDER BY hr) AS nxt
        |  FROM h)
        |SELECT event_type,
        |  CAST(strftime(hr, '%Y%m%d%H') || '00' AS BIGINT)
        |    AS gap_after_hr,
        |  CAST((epoch(nxt) - epoch(hr)) / 3600 - 1 AS BIGINT)
        |    AS missing_hours
        |FROM l
        |WHERE nxt IS NOT NULL AND epoch(nxt) - epoch(hr) > 3600""".stripMargin,
    // ns91's derivation operand-for-operand: exact cent sums, then
    // mean/var/z as the same IEEE double expression tree.
    "dq03_metric_anomaly" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS x_cents
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(x_cents) AS s1, SUM(x_cents * x_cents) AS s2
        |  FROM h GROUP BY 1),
        |d AS (
        |  SELECT event_type,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
        |      AS var FROM st),
        |zc AS (
        |  SELECT h.event_type, run_hr, x_cents,
        |    CASE WHEN var <= 0 THEN 0.0
        |      ELSE (CAST(x_cents AS DOUBLE) - mean) / sqrt(var)
        |    END AS z
        |  FROM h JOIN d ON h.event_type = d.event_type)
        |SELECT event_type, run_hr, x_cents, z,
        |  abs(z) > 3.0 AS is_anomaly
        |FROM zc""".stripMargin,
    // ns79's smoothing and fixed-point quantization over unit value
    // bins; the long sum per group is then exact.
    "ns97_psi_drift" ->
      """WITH ha AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
        |    count(*) AS n_old
        |  FROM events WHERE event_id % 10 != 3 GROUP BY 1, 2),
        |hb AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
        |    count(*) AS n_new
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(ha.event_type, hb.event_type) AS event_type,
        |    coalesce(ha.bin, hb.bin) AS bin,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM ha FULL OUTER JOIN hb
        |    ON ha.event_type = hb.event_type AND ha.bin = hb.bin),
        |tot AS (
        |  SELECT event_type, SUM(n_old) AS ta, SUM(n_new) AS tb,
        |    COUNT(*) AS v
        |  FROM j GROUP BY 1),
        |c AS (
        |  SELECT j.event_type,
        |    CAST(round(
        |      ((CAST(n_new AS DOUBLE) + 0.5) /
        |         (CAST(tb AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0))
        |       - (CAST(n_old AS DOUBLE) + 0.5) /
        |         (CAST(ta AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0)))
        |      * ln(((CAST(n_new AS DOUBLE) + 0.5) /
        |         (CAST(tb AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0)))
        |        / ((CAST(n_old AS DOUBLE) + 0.5) /
        |         (CAST(ta AS DOUBLE) + 0.5 * (CAST(v AS DOUBLE) + 1.0))))
        |      * 16777216.0) AS BIGINT) AS cfx
        |  FROM j JOIN tot ON j.event_type = tot.event_type)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(cfx) AS BIGINT) AS psi_fx
        |FROM c GROUP BY event_type""".stripMargin,
    // cosine arithmetic mirrors Similarity.dot exactly: element-wise
    // CAST to DOUBLE, multiply, sequential-fold sum — bit-identical to
    // Spark's aggregate(zip_with(...)), so scores hash-match.
    "ns05_topk_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM embeddings e, q WHERE e.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS "rank"
        |  FROM scored)
        |SELECT query_id, vec_id, cosine, "rank" FROM ranked
        |WHERE "rank" <= 5""".stripMargin,
    "ns08_text_stats" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |FROM base""".stripMargin,
    "ns09_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base)
        |SELECT *,
        |  CAST(CAST(chk_chars AS INT) + CAST(chk_words AS INT)
        |     + CAST(chk_avg_word_len AS INT) + CAST(chk_punct AS INT)
        |     + CAST(chk_stopwords AS INT) AS DOUBLE) / 5 AS quality_score
        |FROM (
        |  SELECT *,
        |    n_chars BETWEEN 50 AND 100000 AS chk_chars,
        |    n_words BETWEEN 10 AND 50000 AS chk_words,
        |    avg_word_len BETWEEN 2.0 AND 12.0 AS chk_avg_word_len,
        |    punct_ratio <= 0.2 AS chk_punct,
        |    stopword_ratio >= 0.01 AS chk_stopwords
        |  FROM stats)""".stripMargin,
    "ns10_lang_id" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
        |       WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
        |       WHEN fr >= es AND fr > 0 THEN 'fr'
        |       WHEN es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM hits""".stripMargin,
    "ns19_pii_redaction" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com call +1-555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 3) % 256 AS VARCHAR)
        |      || ' card 4111-1111-1111-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0') AS t0
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM base),
        |s2 AS (SELECT doc_id, n_email,
        |  len(regexp_extract_all(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |  regexp_replace(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_phone,
        |  len(regexp_extract_all(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}')) AS n_cc,
        |  regexp_replace(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CC>', 'g') AS t3
        |  FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_phone, n_cc,
        |  len(regexp_extract_all(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn,
        |  regexp_replace(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t4
        |  FROM s3)
        |SELECT doc_id,
        |  CAST(n_email AS BIGINT) AS n_email,
        |  CAST(n_phone AS BIGINT) AS n_phone,
        |  CAST(n_cc AS BIGINT) AS n_cc,
        |  CAST(n_ssn AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |  regexp_replace(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g') AS redacted_text
        |FROM s4""".stripMargin,
    "ns20_repetition_stats" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_replace(text, ' table ', chr(10), 'g') AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(t, chr(10)),
        |      x -> length(x) > 0)) AS line
        |  FROM base),
        |grp AS (
        |  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
        |  FROM lines GROUP BY doc_id, line),
        |agg AS (
        |  SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS n_uniq,
        |    SUM(c * len) AS tot_chars, SUM((c - 1) * len) AS dup_chars
        |  FROM grp GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(n_uniq AS BIGINT) AS n_unique_lines,
        |  CAST(n_lines - n_uniq AS DOUBLE) / CAST(n_lines AS DOUBLE)
        |    AS dup_line_frac,
        |  CAST(dup_chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)
        |    AS dup_char_frac
        |FROM agg""".stripMargin,
    "ns21_vocab_topk" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS word
        |  FROM documents)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM toks GROUP BY word
        |ORDER BY n DESC, word ASC LIMIT 20""".stripMargin,
    "ns27_token_accounting" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS total_words,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source""".stripMargin,
    "ns26_tfidf_terms" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |words AS (
        |  SELECT doc_id,
        |    unnest(list_filter(toks, x -> length(x) > 0)) AS word
        |  FROM base),
        |tf AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |  FROM words GROUP BY 1, 2),
        |dfreq AS (SELECT word, count(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.word, t.tf,
        |    CAST(t.tf AS DOUBLE) * n.n / d.dfreq AS score
        |  FROM tf t JOIN dfreq d ON t.word = d.word, n)
        |SELECT doc_id, word, tf, score, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 5""".stripMargin,
    "ns25_incremental_dedup" ->
      """WITH fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |known AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id < 250),
        |fresh AS (
        |  SELECT f.fingerprint, f.doc_id FROM fps f
        |  WHERE f.doc_id >= 200
        |    -- NOT EXISTS, not NOT IN: a NULL fingerprint in the known
        |    -- store would make NOT IN return zero rows while Spark's
        |    -- left_anti keeps null-keyed rows
        |    AND NOT EXISTS (SELECT 1 FROM known k
        |                    WHERE k.fingerprint = f.fingerprint))
        |SELECT fingerprint, min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS dup_count
        |FROM fresh GROUP BY 1""".stripMargin,
    // Bloom prefilter preserves exactness — IDENTICAL oracle to ns25.
    "ns55_bloom_incremental_dedup" ->
      """WITH fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |known AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id < 250),
        |fresh AS (
        |  SELECT f.fingerprint, f.doc_id FROM fps f
        |  WHERE f.doc_id >= 200
        |    AND NOT EXISTS (SELECT 1 FROM known k
        |                    WHERE k.fingerprint = f.fingerprint))
        |SELECT fingerprint, min(doc_id) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS dup_count
        |FROM fresh GROUP BY 1""".stripMargin,
    // WAV oracle: every decoded field predicted from the generation
    // formulas. The sawtooth (i*8192 mod 32768) - 16384 cycles through
    // {-16384,-8192,0,8192}, so peak is 16384 and energy per full
    // cycle is 16384^2 + 8192^2 + 0 + 8192^2 = 402653184, plus the
    // partial-cycle prefix.
    "ns56_wav_decode" ->
      """SELECT 'doc_' || doc_id || '.wav' AS file_name,
        |  CAST(44 + 2 * n AS BIGINT) AS byte_len,
        |  CAST(r AS INTEGER) AS sample_rate,
        |  1 AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST((n * 1000) // r AS BIGINT) AS duration_ms,
        |  CASE WHEN n > 0 THEN 16384 ELSE 0 END AS peak_abs,
        |  CAST((n // 4) * 402653184
        |    + CASE n % 4 WHEN 0 THEN 0 WHEN 1 THEN 268435456
        |      ELSE 335544320 END AS BIGINT) AS energy
        |FROM (SELECT doc_id, length(text) % 8000 + 8000 AS r,
        |        (length(text) * 13) % 2000 + 100 AS n
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
    // Drained stream-static broadcast join ≡ the batch join + s01's
    // window-close rule (append emits a window once the final
    // watermark passes its end).
    "s06_stream_static_join" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT)
        |  AS run_hr,
        | c.c_mktsegment, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |CROSS JOIN mx
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        | AND date_trunc('hour', ts) + INTERVAL 1 HOUR
        |     <= m - INTERVAL 30 MINUTE
        |GROUP BY 1, 2""".stripMargin,
    // Drained sketch store ≡ the whole-corpus CMS: merge-by-addition
    // is exact, so this is ns93's oracle VERBATIM.
    "s08_stream_sketch" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |cells AS (
        |  SELECT source, seed,
        |    CAST(('0x' || substr(md5(tok || ':cms' || CAST(seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell
        |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS seed))
        |SELECT source, CAST(seed AS INT) AS seed, cell,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(256 AS INTEGER) AS width
        |FROM cells GROUP BY 1, 2, 3""".stripMargin,
    // Drained streaming upsert ≡ latest-per-key over ALL events: the
    // within-batch window keeps the batch's max (ts, event_id) per
    // user and time-ordered batches make the last writer the global
    // argmax, so one window over the whole table is the exact oracle.
    "s07_stream_upsert" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    value, user_id % 8 AS part,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts_us, event_type, value, part
        |FROM ranked WHERE rn = 1""".stripMargin,
    // Drained stream-stream inner join ≡ the batch range join (ns31's
    // SQL) on the same bounded window — see the s05 registration note.
    "s05_stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(p.ts) AS p_ts_us,
        |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND epoch_us(c.ts)
        |     BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND p.ts >= TIMESTAMP '2024-01-20 00:00:00'
        |  AND c.ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "s04_stream_curation" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars, len(toks) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS sw,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |keep AS (
        |  SELECT doc_id FROM stats
        |  WHERE n_chars BETWEEN 50 AND 100000
        |    AND n_words BETWEEN 10 AND 50000
        |    AND awl BETWEEN 2.0 AND 12.0 AND punct <= 0.2 AND sw >= 0.01
        |    AND en >= de AND en >= fr AND en >= es AND en > 0),
        |pii AS (
        |  SELECT b.doc_id,
        |    b.text || ' contact user' || CAST(b.doc_id AS VARCHAR)
        |      || '@mail.example.com call +1-555-'
        |      || lpad(CAST(b.doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST((b.doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(b.doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((b.doc_id * 3) % 256 AS VARCHAR)
        |      || ' card 4111-1111-1111-'
        |      || lpad(CAST(b.doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' ssn ' || lpad(CAST(b.doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((b.doc_id * 3) % 100 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST((b.doc_id * 9) % 10000 AS VARCHAR), 4, '0') AS t0
        |  FROM base b JOIN keep k ON b.doc_id = k.doc_id),
        |s1 AS (SELECT doc_id,
        |  len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM pii),
        |s2 AS (SELECT doc_id, n_email,
        |  len(regexp_extract_all(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |  regexp_replace(t1, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_phone,
        |  len(regexp_extract_all(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}')) AS n_cc,
        |  regexp_replace(t2, '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CC>', 'g') AS t3
        |  FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_phone, n_cc,
        |  len(regexp_extract_all(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn,
        |  regexp_replace(t3, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t4
        |  FROM s3)
        |SELECT doc_id,
        |  CAST(n_email AS BIGINT) AS n_email,
        |  CAST(n_phone AS BIGINT) AS n_phone,
        |  CAST(n_cc AS BIGINT) AS n_cc,
        |  CAST(n_ssn AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |  regexp_replace(t4, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g') AS redacted_text
        |FROM s4""".stripMargin,
    "ns22_contamination" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |train AS (
        |  SELECT DISTINCT g FROM grams WHERE doc_id >= 50),
        |hits AS (
        |  SELECT e.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END) AS n_hit
        |  FROM grams e LEFT JOIN train tr ON e.g = tr.g
        |  WHERE e.doc_id < 50
        |  GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CASE WHEN coalesce(h.n_grams, 0) = 0 THEN 0.0
        |    ELSE CAST(h.n_hit AS DOUBLE) / CAST(h.n_grams AS DOUBLE)
        |  END AS contamination
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 50) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    "ns13_quantiles" ->
      """SELECT event_type,
        | quantile_disc(value, 0.5) AS p50,
        | quantile_disc(value, 0.9) AS p90,
        | quantile_disc(value, 0.99) AS p99
        |FROM events GROUP BY 1""".stripMargin,
    "ns14_multimodal_features" ->
      """SELECT 'doc_' || doc_id || '.txt' AS file_name,
        | CAST(length(text) AS BIGINT) AS byte_len,
        | sha256(text) AS sha256,
        | CAST(length(text) % 640 + 1 AS INT) AS width,
        | CAST((length(text) * 7) % 480 + 1 AS INT) AS height
        |FROM documents WHERE doc_id < 50""".stripMargin,
    // Recomputes the BMP construction arithmetic: the engine parsed
    // these numbers out of real payload headers; the oracle re-derives
    // them from the text length the payloads were built from.
    "ns29_bmp_decode" ->
      """SELECT 'doc_' || doc_id || '.bmp' AS file_name,
        | CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS byte_len,
        | CAST(w AS INT) AS width,
        | CAST(h AS INT) AS height
        |FROM (SELECT doc_id, length(text) % 31 + 1 AS w,
        |        (length(text) * 7) % 17 + 1 AS h
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN is the as-of oracle; tolerance
    // is applied as a post-hoc CASE exactly like the engine nulls
    // out-of-tolerance matches. epoch_us(ts) == Spark unix_micros
    // (both truncate the fixture's nanos to micros). The fixture has
    // no (user_id, ts) ties among views (verified), so DuckDB's
    // unspecified tie pick can't diverge from the engine's
    // view_event_id tiebreak.
    "ns30_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS vts_us,
        |             event_id AS view_event_id, value AS view_value
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_event_id END AS view_event_id,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_value END AS view_value,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.vts_us END AS view_ts_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.vts_us""".stripMargin,
    // The chunked variant must reproduce the IDENTICAL as-of result —
    // same oracle SQL as ns30 (the whole point of the gate: the
    // skew-spreading rewrite is semantics-preserving).
    "ns53_asof_join_chunked" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS vts_us,
        |             event_id AS view_event_id, value AS view_value
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_event_id END AS view_event_id,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.view_value END AS view_value,
        |  CASE WHEN p.ts_us - v.vts_us <= 3600000000
        |    THEN v.vts_us END AS view_ts_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.vts_us""".stripMargin,
    // The range oracle is the plain inequality join the engine's
    // binned equi-join must exactly reproduce.
    "ns31_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(p.ts) AS p_ts_us,
        |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND epoch_us(c.ts)
        |     BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'""".stripMargin,
    // Overlap oracle = the plain inequality join the reporting-bin
    // plan must reproduce exactly once per pair.
    "ns32_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  e.event_id AS error_id,
        |  epoch_us(e.ts) - 900000000 AS e_start_us,
        |  epoch_us(e.ts) + 900000000 AS e_end_us
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND epoch_us(p.ts) - 3600000000 <= epoch_us(e.ts) + 900000000
        | AND epoch_us(e.ts) - 900000000 <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase' AND e.event_type = 'error'""".stripMargin,
    // Segment dedup oracle: identical split → keep-first → ordered
    // reassembly. DuckDB list slices are 1-based inclusive and clamp
    // exactly like Spark's slice(arr, start, length).
    "ns33_segment_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(len(words) / 10.0) AS BIGINT))) AS i
        |  FROM w),
        |segs AS (SELECT doc_id, i AS seg_idx,
        |  array_to_string(words[(i*10+1):(i*10+10)], ' ') AS segment
        |  FROM idx),
        |kept AS (SELECT *,
        |  ROW_NUMBER() OVER (PARTITION BY segment
        |    ORDER BY doc_id, seg_idx) = 1 AS keep
        |  FROM segs)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN segment END, ' '
        |    ORDER BY seg_idx), '') AS dedup_text
        |FROM kept GROUP BY doc_id""".stripMargin,
    // Boilerplate oracle: identical split; df per segment over
    // distinct docs; segments with df > 1 stripped everywhere.
    "ns42_boilerplate_removal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(len(words) / 10.0) AS BIGINT))) AS i
        |  FROM w),
        |segs AS (SELECT doc_id, i AS seg_idx,
        |  array_to_string(words[(i*10+1):(i*10+10)], ' ') AS segment
        |  FROM idx),
        |sdf AS (SELECT segment, COUNT(DISTINCT doc_id) AS seg_df
        |        FROM segs GROUP BY segment),
        |m AS (SELECT s.doc_id, s.seg_idx, s.segment,
        |        d.seg_df <= 1 AS keep
        |      FROM segs s JOIN sdf d ON s.segment = d.segment)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN segment END, ' '
        |    ORDER BY seg_idx), '') AS clean_text
        |FROM m GROUP BY doc_id""".stripMargin,
    // Chunking oracle: same start grid (0, 8, 16, …, first multiple
    // of 8 reaching len−32); DuckDB's 1-based inclusive list slice
    // clamps at the tail exactly like Spark's slice(arr, start, len).
    "ns43_chunk_windows" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE trim(text) <> ''),
        |idx AS (SELECT doc_id, words,
        |  unnest(range(CAST(ceil(greatest(len(words) - 32, 0) / 8.0)
        |    AS BIGINT) + 1)) AS i
        |  FROM w)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  array_to_string(words[(i*8+1):(i*8+32)], ' ') AS chunk_text,
        |  CAST(len(words[(i*8+1):(i*8+32)]) AS BIGINT) AS n_words
        |FROM idx""".stripMargin,
    // Snapshot-diff oracle: same synthetic snapshots, FULL OUTER
    // JOIN on id; the fp equality is null-unsafe in both engines
    // (NULL = NULL falls through to 'changed' in the CASE).
    "ns44_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp
        |           FROM documents WHERE doc_id % 10 <> 3),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |            ELSE text END) AS fp
        |      FROM documents WHERE doc_id % 10 <> 7)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  o.fp AS old_fp, n.fp AS new_fp
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // Rare-token oracle: normalized tokens (the ns08 CTE), df over
    // distinct docs, rare = df < 3; the one division is double/int
    // in both engines (bit-exact IEEE divide).
    "ns45_rare_token_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS word
        |  FROM documents),
        |t2 AS (SELECT doc_id, word FROM toks WHERE length(word) > 0),
        |dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS dfreq
        |          FROM t2 GROUP BY word),
        |common AS (SELECT word FROM dfreq WHERE dfreq >= 3)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT t2.word) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c.word IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rare,
        |  CAST(SUM(CASE WHEN c.word IS NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS rare_frac
        |FROM t2 LEFT JOIN common c ON t2.word = c.word
        |GROUP BY doc_id""".stripMargin,
    // Self-scored unigram NLL: every token is in-vocab so no OOV arm.
    // Bit equality holds because the nll is fixed-point-quantized per
    // DISTINCT token (see the ns58 registry comment); the mean is then
    // exact long arithmetic divided once.
    "ns58_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n_token
        |           FROM t2 GROUP BY token),
        |tot AS (SELECT CAST(SUM(n_token) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
        |lp AS (
        |  SELECT token,
        |    CAST(round(-ln((n_token + 0.5) / (total + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM counts, tot)
        |SELECT t2.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 16777216.0) AS mean_nll
        |FROM t2 JOIN lp USING (token)
        |GROUP BY t2.doc_id""".stripMargin,
    // BPE oracle: the expected id stream was produced by the
    // INDEPENDENT Python encoder in tools/gen_bpe.py from the same
    // fixture text + checked-in merges; the SQL just reads it. If the
    // driver regenerates documents with different text, rerun
    // gen_bpe.py and recommit (BpeFixturePinSpec fails loudly first).
    "ns61_bpe_encode" ->
      """SELECT doc_id, pos, token_id
        |FROM read_parquet('/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')""".stripMargin,
    // True-length packing oracle: ns24's window arithmetic over the
    // per-doc token counts of the same independent oracle table.
    "ns62_pack_bpe" ->
      """WITH lens AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM read_parquet('/root/repo/src/test/resources/graft/bpe_oracle_sf001.parquet')
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS DOUBLE) / 512) AS BIGINT) AS pack_id
        |FROM lens""".stripMargin,
    // dHash oracle: every hash bit re-derived from the BMP generation
    // formula (pixel v = seed + y*72 + x, gray = v%251+v%241+v%239),
    // cell sums over exact 8×8 blocks, bit = left sum > right sum.
    // The 64-bit pack runs in HUGEINT and converts to signed BIGINT
    // (bit 63 is the sign bit on the Spark side).
    "ns63_image_dhash" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 60) t(i)),
        |cells AS (
        |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits USING (img_id) GROUP BY img_id)
        |SELECT 'img_' || img_id || '.bmp' AS file_name,
        |  CAST(72 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
        |  CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |    THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dhash
        |FROM hv""".stripMargin,
    // Near-dup oracle: brute-force all-pairs Hamming over the same
    // closed-form hashes — the banded join is complete at
    // maxHamming 7 < bands 8, so it must match this exactly.
    "ns64_image_near_dup" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS img_id,
        |         CAST((i // 2) * 1000 AS BIGINT) AS seed
        |  FROM range(0, 60) t(i)),
        |cells AS (
        |  SELECT img_id, x // 8 AS cx, y // 8 AS cy,
        |    SUM((seed + y*72 + x) % 251 + (seed + y*72 + x) % 241
        |        + (seed + y*72 + x) % 239) AS s
        |  FROM imgs, range(0, 64) ty(y), range(0, 72) tx(x)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, CAST(l.cy * 8 + l.cx AS INTEGER) AS idx
        |  FROM cells l JOIN cells r
        |    ON l.img_id = r.img_id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8 AND l.s > r.s),
        |hv AS (
        |  SELECT img_id,
        |    coalesce(SUM(CAST(1 AS HUGEINT) << idx), 0) AS hraw
        |  FROM imgs LEFT JOIN bits USING (img_id) GROUP BY img_id),
        |h AS (
        |  SELECT img_id,
        |    CAST(hraw - CASE WHEN hraw >= CAST(1 AS HUGEINT) << 63
        |      THEN CAST(1 AS HUGEINT) << 64 ELSE 0 END AS BIGINT) AS dh
        |  FROM hv)
        |SELECT a.img_id AS id_a, b.img_id AS id_b,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.img_id < b.img_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 7""".stripMargin,
    // Duplicated-span removal oracle: same trigram stream (ns46's gram
    // arithmetic), corpus counts, gaps-and-islands runs >= 3, covered
    // token interval [start, end+2], anti-join + ordered string_agg.
    "ns65_dup_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, i - 1 AS pos, w[i] AS token
        |  FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
        |grams AS (
        |  SELECT doc_id, i - 1 AS gpos,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(i)
        |  WHERE len(w) >= 3),
        |dupg AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |dup AS (SELECT g.doc_id, g.gpos FROM grams g JOIN dupg USING (gram)),
        |isl AS (
        |  SELECT doc_id, gpos,
        |    gpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY gpos) AS k
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, min(gpos) AS s, max(gpos) + 2 AS e
        |  FROM isl GROUP BY doc_id, k HAVING count(*) >= 3),
        |cov AS (
        |  SELECT DISTINCT doc_id, s + j AS pos
        |  FROM spans, UNNEST(range(0, e - s + 1)) AS t(j)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.token
        |  FROM tok t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(token, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(clean_text, '') AS clean_text
        |FROM toks d LEFT JOIN agg USING (doc_id)""".stripMargin,
    // Per-domain quota oracle: same closed-form URL construction, same
    // public-suffix decision (two labels, three under a two-level
    // suffix), ns18's quota window keyed on the derived domain.
    "ns66_domain_quota" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' ||
        |    CASE doc_id % 4 WHEN 0 THEN 'www.'
        |      WHEN 1 THEN 'cdn.media.' ELSE '' END ||
        |    source ||
        |    CASE doc_id % 3 WHEN 0 THEN '.co.uk'
        |      WHEN 1 THEN '.org' ELSE '.com' END ||
        |    '/p/' || doc_id AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url, '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) AS host
        |  FROM u),
        |p AS (SELECT doc_id, n_chars, host,
        |        string_split(host, '.') AS parts FROM h),
        |d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN len(parts) >= 3 AND (parts[-2] || '.' || parts[-1])
        |           IN ('co.uk', 'com.au', 'co.jp')
        |         THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
        |         WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
        |         ELSE host END AS domain
        |  FROM p)
        |SELECT domain, doc_id, n_chars, rn FROM (
        |  SELECT domain, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM d) WHERE rn <= 20""".stripMargin,
    // Perplexity-band oracle: ns58's NLL CTE verbatim, then the same
    // histogram-grid quantile cut in pure integer arithmetic —
    // bin = floor(mean_nll·2048) (2^16 bins over [0,32)), loBin/hiBin
    // the cells holding positions floor(0.1·n)+1 and ceil(0.9·n).
    "ns67_perplexity_band" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n_token
        |           FROM t2 GROUP BY token),
        |tot AS (SELECT CAST(SUM(n_token) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS v FROM counts),
        |lp AS (
        |  SELECT token,
        |    CAST(round(-ln((n_token + 0.5) / (total + 0.5*(v+1)))
        |      * 16777216.0) AS BIGINT) AS fx
        |  FROM counts, tot),
        |nll AS (
        |  SELECT t2.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 16777216.0) AS mean_nll
        |  FROM t2 JOIN lp USING (token)
        |  GROUP BY t2.doc_id),
        |binned AS (
        |  SELECT *, least(CAST(floor(mean_nll * 2048.0) AS BIGINT),
        |                  65535) AS nll_bin
        |  FROM nll),
        |cum AS (
        |  SELECT nll_bin, SUM(c) OVER (ORDER BY nll_bin) AS cum
        |  FROM (SELECT nll_bin, CAST(count(*) AS BIGINT) AS c
        |        FROM binned GROUP BY nll_bin)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM binned),
        |cuts AS (
        |  SELECT
        |    (SELECT min(nll_bin) FROM cum, n
        |      WHERE cum > CAST(floor(0.1 * n) AS BIGINT)) AS lo_bin,
        |    (SELECT min(nll_bin) FROM cum, n
        |      WHERE cum >= CAST(ceil(0.9 * n) AS BIGINT)) AS hi_bin)
        |SELECT doc_id, n_tokens, mean_nll, nll_bin
        |FROM binned, cuts
        |WHERE nll_bin BETWEEN lo_bin AND hi_bin""".stripMargin,
    // URL canonicalization oracle: rebuild the same messy URLs and
    // apply the same rules — lowercase scheme/host, strip default
    // port / fragment / tracking params, '/' for the empty path —
    // then the ns66 registrable-domain decision and the blocklist
    // anti-join, all in SQL.
    "ns68_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'HTTP://' ELSE 'https://' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
        |    source ||
        |    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
        |      ELSE '' END ||
        |    '/p/' || doc_id ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&q=' || doc_id || '&fbclid=xyz'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN (scheme = 'http' AND auth LIKE '%:80')
        |            OR (scheme = 'https' AND auth LIKE '%:443')
        |          THEN regexp_replace(auth, ':[0-9]+$', '')
        |          ELSE auth END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN query = '' OR len(kept) = 0 THEN ''
        |          ELSE '?' || array_to_string(kept, '&') END) AS url_canon
        |  FROM (SELECT *,
        |          list_filter(string_split(query, '&'), p ->
        |            NOT (starts_with(p, 'utm_') OR
        |                 starts_with(p, 'fbclid=') OR
        |                 starts_with(p, 'gclid=') OR
        |                 starts_with(p, 'ref=') OR p = '')) AS kept
        |        FROM parts)),
        |dom AS (
        |  SELECT doc_id, url_canon,
        |    CASE WHEN len(hp) >= 3 AND (hp[-2] || '.' || hp[-1])
        |           IN ('co.uk', 'com.au', 'co.jp')
        |         THEN hp[-3] || '.' || hp[-2] || '.' || hp[-1]
        |         WHEN len(hp) >= 2 THEN hp[-2] || '.' || hp[-1]
        |         ELSE host END AS domain
        |  FROM (SELECT doc_id, url_canon,
        |          regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1) AS host,
        |          string_split(regexp_extract(url_canon,
        |            '^[a-z][a-z0-9+.\-]*://([^/:?#]+)', 1), '.') AS hp
        |        FROM canon))
        |SELECT doc_id, url_canon, domain FROM dom
        |WHERE domain NOT IN ('src3.com', 'src7.co.uk', 'src15.com')""".stripMargin,
    // Token-budget oracle: ns09's score CTE, then ONE window in the
    // (score desc, id) total order — the two-phase prefix-sum must
    // equal exactly this global cumulative sum.
    "ns69_token_budget_select" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE)
        |      / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
        |      AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it'], t)))
        |      AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(n_chars BETWEEN 50 AND 100000 AS INT)
        |       + CAST(n_words BETWEEN 10 AND 50000 AS INT)
        |       + CAST(avg_word_len BETWEEN 2.0 AND 12.0 AS INT)
        |       + CAST(punct_ratio <= 0.2 AS INT)
        |       + CAST(stopword_ratio >= 0.01 AS INT) AS DOUBLE) / 5
        |      AS quality_score
        |  FROM stats)
        |SELECT doc_id, quality_score, n_chars AS weight, cum_before,
        |  cum_before + n_chars <= 60000 AS kept
        |FROM (
        |  SELECT *, CAST(coalesce(SUM(n_chars) OVER (
        |    ORDER BY quality_score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum_before
        |  FROM scored)""".stripMargin,
    // Per-doc argmax restated relationally: unnest each n-gram table,
    // count, rank (count desc, gram asc). The double is one division
    // of two exact integers — deterministic across engines (ns20's
    // proven trick).
    "ns70_topgram_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks,
        |    length(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g')) AS n_chars
        |  FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks)), i ->
        |    array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 2),
        |t2 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram),
        |g3 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks) - 1), i ->
        |    array_to_string(toks[i:i+2], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 3),
        |t3 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g3 GROUP BY doc_id, gram),
        |g4 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks) - 2), i ->
        |    array_to_string(toks[i:i+3], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 4),
        |t4 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g4 GROUP BY doc_id, gram)
        |SELECT b.doc_id,
        |  t2.gram AS top2_gram,
        |  coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top2_frac,
        |  t3.gram AS top3_gram,
        |  coalesce(CAST(t3.c * length(t3.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top3_frac,
        |  t4.gram AS top4_gram,
        |  coalesce(CAST(t4.c * length(t4.gram) AS DOUBLE)
        |    / b.n_chars, 0.0) AS top4_frac
        |FROM base b
        |LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |  USING (doc_id)
        |LEFT JOIN (SELECT doc_id, gram, c FROM t3 WHERE rn = 1) t3
        |  USING (doc_id)
        |LEFT JOIN (SELECT doc_id, gram, c FROM t4 WHERE rn = 1) t4
        |  USING (doc_id)""".stripMargin,
    // Replays the registered fixture construction (sentence breaks +
    // injected rule-exercising tails), then the identical regex-free
    // line predicates via list_filter.
    "ns71_c4_line_filter" ->
      """WITH built AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' table ', '.' || chr(10), 'g')
        |    || CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet placeholder text here.'
        |      ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |      'function f() { return 1; }' ELSE '' END
        |    || chr(10) || 'too short.'
        |    || chr(10) ||
        |    'this is a good closing sentence for the document.' AS t
        |  FROM documents),
        |ls AS (SELECT doc_id,
        |    list_transform(string_split(t, chr(10)),
        |      l -> trim(l)) AS lines
        |  FROM built),
        |k AS (SELECT doc_id, len(lines) AS n_lines,
        |    list_filter(lines, l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
        |        OR l LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '),
        |        w -> length(w) > 0)) >= 5
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS keep
        |  FROM ls)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS clean_text,
        |  CAST(len(keep) AS BIGINT) AS n_kept,
        |  CAST(n_lines - len(keep) AS BIGINT) AS n_dropped
        |FROM k WHERE len(keep) >= 3""".stripMargin,
    // ns10's langid CTE + ns18's quota window, composed.
    "ns72_lang_balanced_quota" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |lang AS (
        |  SELECT doc_id,
        |    CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
        |         WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
        |         WHEN fr >= es AND fr > 0 THEN 'fr'
        |         WHEN es > 0 THEN 'es'
        |         ELSE 'und' END AS lang_pred
        |  FROM hits)
        |SELECT doc_id, n_chars, lang_pred, rn FROM (
        |  SELECT d.doc_id, d.n_chars, l.lang_pred,
        |    ROW_NUMBER() OVER (PARTITION BY l.lang_pred
        |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM documents d JOIN lang l USING (doc_id))
        |WHERE rn <= 40""".stripMargin,
    // The same fixed micro-weight table inlined as a CASE lambda;
    // integer sums are order-independent, so logit_micro hash-gates.
    "ns73_linear_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_transform(toks, t -> CASE t
        |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |    WHEN 'http' THEN -60000 ELSE NULL END) AS ws
        |  FROM base)
        |SELECT doc_id,
        |  CAST(len(list_filter(ws, x -> x IS NOT NULL)) AS BIGINT)
        |    AS n_hits,
        |  CAST(-50000 + coalesce(list_sum(list_transform(ws,
        |    x -> coalesce(x, 0))), 0) AS BIGINT) AS logit_micro,
        |  (-50000 + coalesce(list_sum(list_transform(ws,
        |    x -> coalesce(x, 0))), 0)) > 0 AS keep
        |FROM w""".stripMargin,
    // decode∘encode = canonical text minus the whitespace the
    // pre-tokenizer discards — a pure string prediction; any id that
    // dropped its surface form breaks the hash.
    "ns77_bpe_decode_roundtrip" ->
      """SELECT doc_id,
        |  replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |    ' ', '') AS decoded,
        |  CAST(length(replace(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ', '')) AS BIGINT) AS n_chars_decoded
        |FROM documents""".stripMargin,
    // ns09's score CTE + ns73's weight CASE + ns70's 2-gram argmax,
    // composed; every vote is an integer/exact-division comparison.
    "ns78_quality_ensemble" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS avg_word_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS stopword_ratio
        |  FROM base),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(CAST(n_chars BETWEEN 50 AND 100000 AS INT)
        |       + CAST(n_words BETWEEN 10 AND 50000 AS INT)
        |       + CAST(avg_word_len BETWEEN 2.0 AND 12.0 AS INT)
        |       + CAST(punct_ratio <= 0.2 AS INT)
        |       + CAST(stopword_ratio >= 0.01 AS INT) AS DOUBLE) / 5
        |      AS quality_score
        |  FROM stats),
        |lg AS (
        |  SELECT doc_id, -50000 + coalesce(list_sum(
        |    list_transform(toks, t -> CASE t
        |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |    WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS logit
        |  FROM base),
        |g2 AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(toks)), i ->
        |    array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM base WHERE len(toks) >= 2),
        |t2 AS (SELECT doc_id, gram, count(*) AS c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram),
        |rep AS (
        |  SELECT b.doc_id,
        |    coalesce(CAST(t2.c * length(t2.gram) AS DOUBLE)
        |      / length(b.norm), 0.0) AS top2_frac
        |  FROM base b
        |  LEFT JOIN (SELECT doc_id, gram, c FROM t2 WHERE rn = 1) t2
        |    USING (doc_id))
        |SELECT s.doc_id,
        |  s.quality_score >= 0.6 AS q_ok,
        |  l.logit > 0 AS logit_ok,
        |  r.top2_frac <= 0.2 AS rep_ok,
        |  CAST(CAST(s.quality_score >= 0.6 AS INT)
        |     + CAST(l.logit > 0 AS INT)
        |     + CAST(r.top2_frac <= 0.2 AS INT) AS BIGINT) AS votes,
        |  CAST(s.quality_score >= 0.6 AS INT)
        |     + CAST(l.logit > 0 AS INT)
        |     + CAST(r.top2_frac <= 0.2 AS INT) >= 2 AS keep
        |FROM scored s
        |JOIN lg l USING (doc_id)
        |JOIN rep r USING (doc_id)""".stripMargin,
    // Smoothed symmetric-KL contributions with the identical operand
    // order; every libm input is a ratio of exact integers.
    "ns79_vocab_drift" ->
      """WITH oldtok AS (
        |  SELECT t AS token FROM (
        |    SELECT unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS t
        |    FROM documents WHERE doc_id % 10 != 3)
        |  WHERE length(t) > 0),
        |newtok AS (
        |  SELECT t AS token FROM (
        |    SELECT unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0),
        |ca AS (SELECT token, count(*) AS n_old FROM oldtok GROUP BY 1),
        |cb AS (SELECT token, count(*) AS n_new FROM newtok GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ca.token, cb.token) AS token,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        |tot AS (
        |  SELECT CAST(sum(n_old) AS BIGINT) AS ta,
        |    CAST(sum(n_new) AS BIGINT) AS tb, count(*) AS v FROM j)
        |SELECT token, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CAST(round((
        |    (n_old + 0.5) / (ta + 0.5 * (v + 1.0))
        |      * ln(((n_old + 0.5) / (ta + 0.5 * (v + 1.0)))
        |         / ((n_new + 0.5) / (tb + 0.5 * (v + 1.0))))
        |    + (n_new + 0.5) / (tb + 0.5 * (v + 1.0))
        |      * ln(((n_new + 0.5) / (tb + 0.5 * (v + 1.0)))
        |         / ((n_old + 0.5) / (ta + 0.5 * (v + 1.0))))
        |  ) * 16777216.0) AS BIGINT) AS skl_fx
        |FROM j CROSS JOIN tot
        |ORDER BY skl_fx DESC, token LIMIT 50""".stripMargin,
    // ns34's gaps-and-islands CTEs + an ORDER BY string_agg — the
    // transcript must reproduce the exact total event order.
    "ns81_session_transcripts" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             event_type FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us,
        |  COUNT(*) AS n_events,
        |  string_agg(event_type, '>' ORDER BY ts_us, event_id)
        |    AS transcript
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    // ns81's sessionization CTE, then exact transcript dedup.
    "ns100_bot_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             event_type FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked),
        |tr AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id)
        |      AS transcript
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT transcript, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM tr WHERE n_events >= 2
        |GROUP BY transcript HAVING COUNT(*) >= 2""".stripMargin,
    // Integer power sums are exact at any order/partitioning; the
    // derived doubles use sub-2^53 operands in a fixed order.
    "ns91_moment_columns" ->
      """WITH b AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(v) AS BIGINT) AS s1,
        |  CAST(SUM(v * v) AS BIGINT) AS s2,
        |  CAST(SUM(v * v * v) AS BIGINT) AS s3,
        |  CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_cents,
        |  (CAST(SUM(v * v) AS DOUBLE)
        |    - CAST(SUM(v) AS DOUBLE) * SUM(v) / COUNT(*)) / COUNT(*)
        |    AS var_cents
        |FROM b GROUP BY event_type""".stripMargin,
    // Same histogram-cut rule as ns82, per group and per quantile.
    "ns92_exact_quantiles" ->
      """WITH b AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, v, count(*) AS c
        |  FROM b GROUP BY 1, 2),
        |cum AS (SELECT event_type, v,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cm,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.25 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p25,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.5 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p50,
        |  CAST(MIN(CASE WHEN cm >= ceil(0.75 * n) THEN v END)
        |    AS DOUBLE) / 100 AS p75
        |FROM cum GROUP BY event_type""".stripMargin,
    // The same 32 shift/mask terms, summed (bit positions disjoint,
    // so + ≡ OR); generated to match zValue(bits = 16) exactly.
    "ns96_zorder_key" -> {
      val terms = (0 until 16).flatMap(b => Seq(
        s"(((o_custkey >> $b) & 1) << ${2 * b})",
        s"(((o_orderkey >> $b) & 1) << ${2 * b + 1})"))
      s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         | CAST(o_custkey AS BIGINT) AS o_custkey,
         | CAST(${terms.mkString(" + ")} AS BIGINT) AS z
         |FROM orders""".stripMargin
    },
    // Same Spark-round quantization as the fixed-point family, then
    // the exact integer triangle sum per (i, j).
    "ns101_embedding_gram" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS e
        |  FROM embeddings),
        |cells AS (
        |  SELECT t1.i AS i, t2.j AS j, e[t1.i + 1] * e[t2.j + 1] AS p
        |  FROM q, UNNEST(range(0, 64)) AS t1(i),
        |       UNNEST(range(0, 64)) AS t2(j)
        |  WHERE t2.j >= t1.i)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(SUM(p) AS BIGINT) AS s_fx
        |FROM cells GROUP BY 1, 2""".stripMargin,
    // ns35's quantization CTE, then an exact integer projection whose
    // ±1 signs come from the same md5-nibble parity per (i, j).
    "ns95_signed_projection" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) AS q_scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
        |          AS INTEGER))
        |    END AS q
        |  FROM s),
        |e AS (
        |  SELECT vec_id, i - 1 AS i, CAST(q[i] AS BIGINT) AS qi
        |  FROM q, UNNEST(range(1, len(q) + 1)) AS t(i)),
        |cells AS (
        |  SELECT e.vec_id, jj.j AS j, e.qi * (CASE WHEN
        |      CAST(('0x' || substr(md5(CAST(e.i AS VARCHAR) || ':' ||
        |        CAST(jj.j AS VARCHAR) || ':rp'), 1, 1)) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END) AS term
        |  FROM e, UNNEST(range(0, 16)) AS jj(j))
        |SELECT vec_id, CAST(j AS INTEGER) AS j,
        |  CAST(SUM(term) AS BIGINT) AS comp
        |FROM cells GROUP BY 1, 2""".stripMargin,
    // The salted rewrite must equal the aggregation it replaces.
    "ns94_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type""".stripMargin,
    // ns48's leave-one-out kNN SQL over the audited slice, plus the
    // own-label join and the disagreement flag.
    "ns99_label_noise" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS own_label
        |  FROM embeddings WHERE vec_id < 100),
        |c AS (
        |  SELECT vec_id, embedding, label FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
        |          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM c, q WHERE c.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, label AS pred_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT query_id, pred_label, votes,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, pred_label) AS vr
        |  FROM votes)
        |SELECT b.query_id, q.own_label, b.pred_label, b.votes,
        |  b.pred_label != q.own_label AS suspect
        |FROM best b JOIN q ON b.query_id = q.query_id
        |WHERE vr = 1""".stripMargin,
    // ns93's sketch CTE + ns21's top-8 vocab as the probe set; the
    // estimate is min over seeds of coalesce(cell count, 0).
    "ns103_cms_estimates" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |sk AS (
        |  SELECT source, seed,
        |    CAST(('0x' || substr(md5(tok || ':cms' || CAST(seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS seed)
        |  GROUP BY 1, 2, 3),
        |v AS (
        |  SELECT word FROM (
        |    SELECT unnest(list_filter(
        |      string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |      x -> length(x) > 0)) AS word
        |    FROM documents) t
        |  GROUP BY word ORDER BY count(*) DESC, word ASC LIMIT 8),
        |probes AS (
        |  SELECT word, s.seed,
        |    CAST(('0x' || substr(md5(word || ':cms' || CAST(s.seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell
        |  FROM v CROSS JOIN (SELECT unnest(range(4)) AS seed) AS s),
        |exp AS (
        |  SELECT g.source, p.word, p.seed, p.cell
        |  FROM (SELECT DISTINCT source FROM documents) g
        |  CROSS JOIN probes p),
        |j AS (
        |  SELECT e.source, e.word, e.seed,
        |    coalesce(sk.cnt, 0) AS c
        |  FROM exp e LEFT JOIN sk
        |    ON e.source = sk.source AND e.seed = sk.seed
        |    AND e.cell = sk.cell)
        |SELECT source, word AS token, CAST(MIN(c) AS BIGINT) AS est
        |FROM j GROUP BY 1, 2""".stripMargin,
    // ns21's word split, the ns17 md5-prefix cell, exact counts.
    "ns98_feature_hashing" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(('0x' || substr(md5(tok || ':fh'), 1, 8)) AS BIGINT)
        |    % 1024 AS cell,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM toks GROUP BY 1, 2""".stripMargin,
    // The whole CMS is exact: ns21's word split, the ns17 md5-prefix
    // hash per (token, seed), integer counts per (source, seed, cell).
    "ns93_cms_sketch" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    x -> length(x) > 0)) AS tok
        |  FROM documents),
        |cells AS (
        |  SELECT source, seed,
        |    CAST(('0x' || substr(md5(tok || ':cms' || CAST(seed AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS cell
        |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS seed))
        |SELECT source, CAST(seed AS INT) AS seed, cell,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(256 AS INTEGER) AS width
        |FROM cells GROUP BY 1, 2, 3""".stripMargin,
    // PERCENTILE_DISC cuts from the exact cent-grid histogram; the
    // ceil boundaries use the identical doubles.
    "ns82_winsorize" ->
      """WITH b AS (SELECT event_id, value,
        |    CAST(round(value * 100) AS BIGINT) AS bin FROM events),
        |h AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
        |cum AS (SELECT bin,
        |    SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cm
        |  FROM h),
        |tot AS (SELECT count(*) AS n FROM b),
        |lo AS (SELECT min(bin) AS lo FROM cum, tot
        |       WHERE cm >= ceil(0.01 * n)),
        |hi AS (SELECT min(bin) AS hi FROM cum, tot
        |       WHERE cm >= ceil(0.99 * n))
        |SELECT event_id, value,
        |  CAST(greatest(least(bin, hi), lo) AS DOUBLE) / 100
        |    AS value_wins
        |FROM b, lo, hi""".stripMargin,
    // Every resized pixel re-derived from the generation formula
    // (gray(v) = v%251 + v%241 + v%239, v = seed + y·w + x, seed =
    // doc_id), floor-mean over each 2×2 block, summed.
    "ns84_image_resize" ->
      """WITH imgs AS (
        |  SELECT doc_id, length(text) % 31 + 1 AS w,
        |    (length(text) * 7) % 17 + 1 AS h
        |  FROM documents WHERE doc_id < 50),
        |cells AS (
        |  SELECT doc_id,
        |    doc_id + (2*y) * w + 2*x AS a,
        |    doc_id + (2*y) * w + 2*x + 1 AS b,
        |    doc_id + (2*y + 1) * w + 2*x AS c,
        |    doc_id + (2*y + 1) * w + 2*x + 1 AS d
        |  FROM imgs, range(0, 16) tx(x), range(0, 9) ty(y)
        |  WHERE x < w // 2 AND y < h // 2),
        |sums AS (
        |  SELECT doc_id,
        |    SUM((a % 251 + a % 241 + a % 239
        |       + b % 251 + b % 241 + b % 239
        |       + c % 251 + c % 241 + c % 239
        |       + d % 251 + d % 241 + d % 239) // 4) AS chk
        |  FROM cells GROUP BY doc_id)
        |SELECT 'doc_' || i.doc_id || '.bmp' AS file_name,
        |  CAST(i.w AS INT) AS in_w, CAST(i.h AS INT) AS in_h,
        |  CAST(i.w // 2 AS INT) AS out_w,
        |  CAST(i.h // 2 AS INT) AS out_h,
        |  CAST(coalesce(s.chk, 0) AS BIGINT) AS gray_checksum
        |FROM imgs i LEFT JOIN sums s USING (doc_id)""".stripMargin,
    // Frames reconstructed as ASCII strings from the byte formula,
    // sha256'd — identical bytes ⇒ identical hex. All frames are
    // exactly step = sz // 4 bytes (the floor-step slicing drops the
    // sz % 4 tail by construction).
    "ns85_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, length(text) % 977 + 64 AS sz
        |  FROM documents WHERE doc_id < 50),
        |params AS (
        |  SELECT doc_id, sz, greatest(sz // 4, 1) AS step FROM f),
        |frames AS (
        |  SELECT doc_id, step, fi FROM params, range(0, 4) t(fi)),
        |bytes AS (
        |  SELECT doc_id, fi,
        |    string_agg(chr(CAST(33 + (doc_id + i) % 94 AS INTEGER)),
        |      '' ORDER BY i) AS s
        |  FROM frames, range(0, 1100) t2(i)
        |  WHERE i >= fi * step AND i < fi * step + step
        |  GROUP BY doc_id, fi)
        |SELECT 'doc_' || doc_id || '.bin' AS file_name,
        |  CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(length(s) AS BIGINT) AS frame_len,
        |  sha256(s) AS frame_sha256
        |FROM bytes""".stripMargin,
    // Order-independent md5-word sums per table, chr(1)-joined
    // fields; each field null-coalesced to the chr(0)||'null'
    // sentinel, mirroring corpusFingerprint (concat_ws skips nulls).
    "ns83_corpus_fingerprint" ->
      """SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(text, chr(0) || 'null')
        |    ), 1, 8)) AS BIGINT)) AS BIGINT)
        |    AS content_checksum
        |FROM documents
        |UNION ALL
        |SELECT 'events', COUNT(*),
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(event_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(event_type, chr(0) || 'null')
        |    ), 1, 8)) AS BIGINT)) AS BIGINT)
        |FROM events
        |UNION ALL
        |SELECT 'embeddings', COUNT(*),
        |  CAST(SUM(CAST(('0x' || substr(md5(
        |    coalesce(CAST(vec_id AS VARCHAR), chr(0) || 'null')
        |    || chr(1) || coalesce(CAST(label AS VARCHAR),
        |      chr(0) || 'null')), 1, 8)) AS BIGINT))
        |    AS BIGINT)
        |FROM embeddings""".stripMargin,
    // The two-phase shard cut must equal ONE global running sum in id
    // order; checksum is an order-independent integer sum of md5
    // words, so the whole manifest is exact arithmetic.
    "ns80_shard_manifest" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |    CAST(coalesce(SUM(CAST(n_chars AS BIGINT)) OVER (
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS s
        |  FROM documents)
        |SELECT s // 25000 AS shard_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |  CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |    1, 8)) AS BIGINT)) AS BIGINT) AS id_checksum
        |FROM a GROUP BY 1""".stripMargin,
    // Same hash→uniform→ln(u)/w priority, quantized once to nano
    // fixed-point (ns58 proved libm ln bit-stable across engines on
    // this host); operand order matches the Spark expression exactly.
    "ns75_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |    CAST(round(ln((CAST(('0x' || substr(md5(
        |      CAST(doc_id AS VARCHAR) || ':es1'), 1, 8)) AS BIGINT)
        |      + 0.5) / 4294967296.0) / n_chars * 1000000000)
        |      AS BIGINT) AS key_fp
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, weight, key_fp FROM s
        |ORDER BY key_fp DESC, doc_id LIMIT 100""".stripMargin,
    // Boundary literals are the EXACT doubles the Scala scanLeft
    // accumulates (0.8 + 0.1 = 0.9000000000000001 in IEEE), CAST to
    // DOUBLE so DuckDB's decimal literals don't change the floor.
    "ns76_stratified_split" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY CAST(('0x' || substr(md5(
        |        CAST(doc_id AS VARCHAR) || ':strat1'), 1, 8))
        |        AS BIGINT) % 1000000, doc_id) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, rn,
        |  CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
        |       WHEN rn <= floor(CAST(0.9000000000000001 AS DOUBLE)
        |         * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM ranked""".stripMargin,
    // Closed-form DSP oracle: period-4 sawtooth → fundamental at
    // rate/4 = grid bin 16 of 64, |X(N/4)| = √2·|X(N/2)|, so the
    // argmax is an exact integer prediction (see the ns74
    // registration note).
    "ns74_wav_dominant_freq" ->
      """SELECT 'doc_' || doc_id || '.wav' AS file_name,
        |  CAST(r AS INTEGER) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  16 AS dom_idx,
        |  CAST(r AS DOUBLE) / 4 AS dominant_hz
        |FROM (SELECT doc_id, length(text) % 8000 + 8000 AS r,
        |        ((length(text) * 7) % 30 + 2) * 64 AS n
        |      FROM documents WHERE doc_id < 50)""".stripMargin,
    // n-gram table oracle: the ns02 gram CTE without DISTINCT
    // (occurrence counts, not document frequency); the (n desc, gram
    // asc) tiebreak makes the top-100 cut deterministic.
    "ns46_ngram_topk" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i))
        |SELECT gram, CAST(count(*) AS BIGINT) AS n
        |FROM grams GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 100""".stripMargin,
    // Dup-span oracle: same gram stream WITH positions; corpus-wide
    // occurrence counts; the longest consecutive duplicated run via
    // the pos − row_number island trick.
    "ns47_dup_span_profile" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        |j AS (SELECT doc_id, pos, c FROM grams JOIN cnt USING (g)),
        |d AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY pos) AS isl
        |      FROM j WHERE c > 1),
        |runs AS (SELECT doc_id, count(*) AS run
        |         FROM d GROUP BY doc_id, isl),
        |mx AS (SELECT doc_id, max(run) AS mr FROM runs GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |          CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_dup
        |        FROM j GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams, t.n_dup,
        |  CAST(coalesce(m.mr, 0) AS BIGINT) AS max_dup_run,
        |  CAST(t.n_dup AS DOUBLE) / t.n_grams AS dup_frac
        |FROM tot t LEFT JOIN mx m ON t.doc_id = m.doc_id""".stripMargin,
    // kNN-vote oracle: ns05's exact-cosine ranking (identical fold ⇒
    // identical doubles ⇒ identical row_number cut), then integer
    // votes with the same (votes DESC, label) break.
    "ns48_knn_labels" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 50),
        |c AS (
        |  SELECT vec_id, embedding, label
        |  FROM embeddings WHERE vec_id >= 50),
        |scored AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
        |          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
        |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM c, q WHERE c.vec_id != q.query_id),
        |ranked AS (
        |  SELECT query_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, vec_id) AS rk
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, label AS pred_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT query_id, pred_label, votes,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, pred_label) AS vr
        |  FROM votes)
        |SELECT query_id, pred_label, votes FROM best WHERE vr = 1""".stripMargin,
    // Survivor oracle: ns37's recursive closure (SQL verbatim) joined
    // to ns09's quality score (exact fifths), keep = top of each
    // cluster under (score DESC, doc_id).
    "ns49_cluster_survivors" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
        |assign AS (
        |  SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        |base AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |qual AS (
        |  SELECT doc_id, CAST(
        |      CAST(length(text) BETWEEN 50 AND 100000 AS INT)
        |    + CAST(len(toks) BETWEEN 10 AND 50000 AS INT)
        |    + CAST(CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks)
        |        BETWEEN 2.0 AND 12.0 AS INT)
        |    + CAST(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |        /length(text) <= 0.2 AS INT)
        |    + CAST(CAST(len(list_filter(toks, t -> list_contains(
        |        ['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
        |        /len(toks) >= 0.01 AS INT)
        |    AS DOUBLE)/5 AS score
        |  FROM base)
        |SELECT a.doc_id, a.cluster_id, q.score,
        |  (ROW_NUMBER() OVER (PARTITION BY a.cluster_id
        |     ORDER BY q.score DESC, a.doc_id) = 1) AS keep
        |FROM assign a JOIN qual q ON a.doc_id = q.doc_id""".stripMargin,
    // Cluster-split oracle: ns37's recursive closure (SQL verbatim)
    // with ns17's bucket CASE applied to cluster_id.
    "ns52_cluster_split" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
        |assign AS (
        |  SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':cl1'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':cl1'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM assign""".stripMargin,
    // Upsample oracle: same md5 bucket as ns23, same floor/frac
    // split on literal weights (identical double arithmetic), epochs
    // via range(1, reps+1) — empty when reps = 0, matching the
    // pre-explode filter.
    "ns51_epoch_upsample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
        |      WHEN 'src2' THEN 0.4 ELSE 1.2 END AS wt,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep1'), 1, 8)) AS BIGINT) % 10000 AS b
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(floor(wt) AS BIGINT)
        |      + CASE WHEN b < (wt - floor(wt)) * 10000
        |          THEN 1 ELSE 0 END AS reps
        |  FROM w)
        |SELECT doc_id, source, CAST(t.e AS BIGINT) AS epoch
        |FROM r, UNNEST(range(1, reps + 1)) AS t(e)""".stripMargin,
    // Contamination oracle: per-pair cosine exactly as ns05 (same
    // fold, same division grouping), max per corpus vector; the
    // driver-side eval norms are the same sequential fold, so the
    // doubles are bit-identical.
    "ns50_semantic_contamination" ->
      """WITH e AS (
        |  SELECT embedding AS ee,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS en
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS cn
        |  FROM embeddings WHERE vec_id >= 20),
        |s AS (
        |  SELECT c.vec_id,
        |    max(list_sum(list_transform(range(1, len(c.embedding)+1),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(e.ee[i] AS DOUBLE)))
        |      / (c.cn * e.en)) AS max_eval_cosine
        |  FROM c, e WHERE c.cn > 0 AND e.en > 0 GROUP BY 1)
        |SELECT vec_id, max_eval_cosine,
        |  max_eval_cosine >= 0.3 AS contaminated FROM s""".stripMargin,
    // Sessionize oracle: same lag/cumsum construction; the DECIMAL
    // path keeps the double sum order-independent across engines.
    "ns34_batch_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             value FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) - 1
        |    AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    // Quantization oracle: float→double promotion is exact and both
    // engines round doubles half-away-from-zero, so the int arrays
    // and the order-independent max error hash-match bit-exactly.
    "ns35_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) AS q_scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding, q_scale,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / q_scale)
        |          AS INTEGER))
        |    END AS q
        |  FROM s),
        |o AS (
        |  SELECT vec_id, q_scale, q,
        |    list_max(list_transform(list_zip(embedding, q),
        |      p -> abs(CAST(p[1] AS DOUBLE)
        |        - CAST(p[2] AS DOUBLE) * q_scale / 127.0)))
        |      AS max_abs_err
        |  FROM q)
        |SELECT vec_id, q_scale, max_abs_err,
        |  CAST(i - 1 AS INTEGER) AS idx, q[i] AS q_val
        |FROM o, UNNEST(range(1, len(q) + 1)) AS t(i)""".stripMargin,
    // L2-normalize oracle: both engines fold the squared norm left-
    // to-right in doubles (Spark `aggregate` with 0.0 seed, DuckDB
    // `list_reduce` seeded by the first element — IEEE 0.0 + x²
    // is bitwise x²), so norm and elements hash-match bit-exactly.
    "ns36_l2_normalize" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS norm
        |  FROM embeddings),
        |o AS (
        |  SELECT vec_id, norm,
        |    CASE WHEN norm = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(embedding, x -> CAST(x AS DOUBLE) / norm)
        |    END AS unit
        |  FROM n)
        |SELECT vec_id, norm,
        |  CAST(i - 1 AS INTEGER) AS idx, unit[i] AS unit_val
        |FROM o, UNNEST(range(1, len(unit) + 1)) AS t(i)""".stripMargin,
    // Matryoshka oracle: same left-fold bit-exactness argument as
    // ns36, applied to the 16-prefix and the full vector.
    "ns57_matryoshka_truncate" ->
      """WITH p AS (
        |  SELECT vec_id, embedding, embedding[1:16] AS pe
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, pe,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS full_norm,
        |    sqrt(list_reduce(list_transform(pe,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b)) AS kept_norm
        |  FROM p),
        |o AS (
        |  SELECT vec_id, full_norm, kept_norm,
        |    CASE WHEN full_norm = 0 THEN 0.0
        |      ELSE kept_norm / full_norm END AS energy_ratio,
        |    CASE WHEN kept_norm = 0
        |      THEN list_transform(pe, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(pe, x -> CAST(x AS DOUBLE) / kept_norm)
        |    END AS unit
        |  FROM n)
        |SELECT vec_id, full_norm, kept_norm, energy_ratio,
        |  CAST(i - 1 AS INTEGER) AS idx, unit[i] AS unit_val
        |FROM o, UNNEST(range(1, len(unit) + 1)) AS t(i)""".stripMargin,
    // Clustering oracle: recursive closure over the SAME pair set as
    // ns02 (SQL repeated verbatim), min reachable id per vertex ==
    // hash-to-min's fixpoint; docs off the pair graph are singleton
    // clusters via the left join.
    "ns37_dedup_clusters" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |grams0 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM docs, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)),
        |rare AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 5),
        |grams AS (SELECT grams0.doc_id, grams0.g FROM grams0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |   JOIN sizes sa ON p.id_a = sa.doc_id
        |   JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)/(sa.sz + sb.sz - p.common) >= 0.5),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM jp
        |  UNION SELECT id_b, id_a FROM jp),
        |reach(id, lab) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id),
        |cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(cc.comp, d.doc_id) AS cluster_id,
        |  (COALESCE(cc.comp, d.doc_id) = d.doc_id) AS is_representative
        |FROM documents d LEFT JOIN cc ON cc.id = d.doc_id""".stripMargin,
    // Centroid oracle: identical fixed-point pipeline — one round to
    // 2^-24 quanta (power-of-two scaling is exact; both engines round
    // half away from zero), exact BIGINT sums, one double division.
    "ns38_label_centroids" ->
      """WITH e AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 16777216.0)
        |      AS BIGINT) AS fx
        |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        |s AS (
        |  SELECT label, pos, SUM(fx) AS sfx, COUNT(*) AS n
        |  FROM e GROUP BY 1, 2),
        |nv AS (
        |  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors
        |  FROM s GROUP BY label)
        |SELECT s.label, nv.n_vectors, CAST(s.pos AS INTEGER) AS idx,
        |  CAST(s.sfx AS DOUBLE) / (s.n * 16777216.0) AS centroid_val
        |FROM s JOIN nv ON s.label = nv.label""".stripMargin,
    // Rates oracle: sqrt is IEEE-exact on both engines; the Σ √n fold
    // is ordered by source on both sides (list(... ORDER BY) here,
    // array_sort'd collect there), so the total is bit-identical.
    "ns39_temperature_mixture" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (
        |  SELECT list_reduce(
        |    list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
        |    (a, b) -> a + b) AS total_w FROM c)
        |SELECT source, n_docs,
        |  sqrt(CAST(n_docs AS DOUBLE)) / t.total_w AS rate
        |FROM c, t""".stripMargin,
    // Spark conv(hex,16,10) and DuckDB CAST('0x'||hex AS BIGINT) agree
    // on the first-8-hex-chars bucket (verified value-identical).
    "ns17_hash_split" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 AS bucket,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 < 800 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM documents""".stripMargin,
    // Incremental-curation oracle: same snapshot pair, raw-md5 delta
    // (snapshotDiff semantics), p03's gate SQL over delta and store,
    // ns25's NOT EXISTS anti-join, ns17's split buckets.
    "p04_incremental_curation" ->
      """WITH oldsnap AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3),
        |newsnap AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 != 7),
        |delta AS (
        |  SELECT n.doc_id, n.text FROM newsnap n
        |  LEFT JOIN oldsnap o ON n.doc_id = o.doc_id
        |  WHERE o.doc_id IS NULL OR md5(o.text) != md5(n.text)),
        |obase AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM oldsnap),
        |okeep AS (
        |  SELECT doc_id, md5(norm) AS fingerprint FROM obase
        |  WHERE length(text) BETWEEN 50 AND 100000
        |    AND len(toks) BETWEEN 10 AND 50000
        |    AND CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)/length(text) <= 0.2
        |    AND CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)/len(toks) >= 0.01
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) > 0),
        |store AS (SELECT DISTINCT fingerprint FROM okeep),
        |dbase AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM delta),
        |dkeep AS (
        |  SELECT doc_id, md5(norm) AS fingerprint FROM dbase
        |  WHERE length(text) BETWEEN 50 AND 100000
        |    AND len(toks) BETWEEN 10 AND 50000
        |    AND CAST(length(replace(norm, ' ', '')) AS DOUBLE)/len(toks) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)/length(text) <= 0.2
        |    AND CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)/len(toks) >= 0.01
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
        |      >= len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t)))
        |    AND len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) > 0),
        |fresh AS (
        |  SELECT k.fingerprint, k.doc_id FROM dkeep k
        |  WHERE NOT EXISTS (SELECT 1 FROM store s
        |                    WHERE s.fingerprint = k.fingerprint)),
        |adm AS (
        |  SELECT min(doc_id) AS doc_id,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM fresh GROUP BY fingerprint)
        |SELECT doc_id, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p04split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p04split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM adm""".stripMargin,
    // ns71's line filter + exact dedup on the cleaned text + ns73's
    // weight CASE + ns18's quota window, chained.
    "p05_curation_v2" ->
      """WITH built AS (
        |  SELECT d.doc_id, d.source,
        |    regexp_replace(d.text, ' table ', '.' || chr(10), 'g')
        |    || CASE WHEN d.doc_id % 7 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet placeholder text here.'
        |      ELSE '' END
        |    || CASE WHEN d.doc_id % 11 = 0 THEN chr(10) ||
        |      'function f() { return 1; }' ELSE '' END
        |    || chr(10) || 'too short.'
        |    || chr(10) ||
        |    'this is a good closing sentence for the document.' AS t
        |  FROM documents d),
        |ls AS (SELECT doc_id, source,
        |    list_transform(string_split(t, chr(10)),
        |      l -> trim(l)) AS lines
        |  FROM built),
        |k AS (SELECT doc_id, source,
        |    list_filter(lines, l ->
        |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
        |        OR l LIKE '%"')
        |      AND len(list_filter(string_split(l, ' '),
        |        w -> len(w) > 0)) >= 5
        |      AND NOT contains(lower(l), 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS keep
        |  FROM ls),
        |clean AS (SELECT doc_id, source,
        |    array_to_string(keep, chr(10)) AS clean_text,
        |    CAST(len(keep) AS BIGINT) AS n_kept
        |  FROM k WHERE len(keep) >= 3),
        |fp AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(clean_text)),
        |      '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rnfp
        |  FROM clean),
        |surv AS (SELECT doc_id, source, clean_text, n_kept
        |  FROM fp WHERE rnfp = 1),
        |lg AS (SELECT doc_id, -50000 + coalesce(list_sum(
        |    list_transform(string_split(regexp_replace(
        |      lower(trim(clean_text)), '\s+', ' ', 'g'), ' '),
        |    t -> CASE t
        |    WHEN 'the' THEN 40000 WHEN 'and' THEN 30000
        |    WHEN 'of' THEN 30000 WHEN 'to' THEN 25000
        |    WHEN 'a' THEN 25000 WHEN 'in' THEN 20000
        |    WHEN 'is' THEN 20000 WHEN 'it' THEN 15000
        |    WHEN 'for' THEN 15000 WHEN 'with' THEN 15000
        |    WHEN 'lorem' THEN -250000 WHEN 'ipsum' THEN -250000
        |    WHEN 'click' THEN -120000 WHEN 'subscribe' THEN -150000
        |    WHEN 'cookie' THEN -100000 WHEN 'buy' THEN -90000
        |    WHEN 'winner' THEN -120000 WHEN 'free' THEN -80000
        |    WHEN 'http' THEN -60000 ELSE 0 END)), 0) AS logit
        |  FROM surv),
        |keepq AS (SELECT s.doc_id, s.source, s.n_kept,
        |    CAST(l.logit AS BIGINT) AS logit_micro
        |  FROM surv s JOIN lg l USING (doc_id) WHERE l.logit > 0)
        |SELECT doc_id, source, n_kept, logit_micro, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_kept DESC, doc_id) AS rn
        |  FROM keepq)
        |WHERE rn <= 20""".stripMargin,
    "p03_curation_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, source, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |base AS (
        |  SELECT doc_id, source, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM corpus),
        |stats AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars, len(toks) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS sw,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |keep AS (
        |  SELECT doc_id FROM stats
        |  WHERE n_chars BETWEEN 50 AND 100000
        |    AND n_words BETWEEN 10 AND 50000
        |    AND awl BETWEEN 2.0 AND 12.0 AND punct <= 0.2 AND sw >= 0.01
        |    AND en >= de AND en >= fr AND en >= es AND en > 0),
        |surv AS (
        |  SELECT min(b.doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
        |  FROM base b JOIN keep k ON b.doc_id = k.doc_id
        |  GROUP BY md5(b.norm)),
        |enr AS (
        |  SELECT s.doc_id, c.source, s.dup_count
        |  FROM surv s JOIN corpus c ON s.doc_id = c.doc_id),
        |mixed AS (
        |  SELECT * FROM enr
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03mix'), 1, 8)) AS BIGINT) % 10000
        |    < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |        ELSE 0.25 END) * 10000)
        |SELECT doc_id, source, dup_count,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03split'), 1, 8)) AS BIGINT) % 1000 < 900 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':p03split'), 1, 8)) AS BIGINT) % 1000 < 950 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM mixed""".stripMargin,
    // Funnel oracle: p03's gate CTEs without the replay union, rolled
    // to per-source counts; survivor source = the min-doc_id member's
    // source (exactDedup's min_by carry).
    "ns60_curation_funnel" ->
      """WITH base AS (
        |  SELECT doc_id, source, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, source, norm,
        |    length(text) AS n_chars, len(toks) AS n_words,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS awl,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct,
        |    CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE) / len(toks) AS sw,
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','les','et','est','dans','une','pour'], t))) AS fr,
        |    len(list_filter(toks, t -> list_contains(['el','los','las','y','es','una','por'], t))) AS es
        |  FROM base),
        |flags AS (
        |  SELECT doc_id, source, norm,
        |    (n_chars BETWEEN 50 AND 100000
        |      AND n_words BETWEEN 10 AND 50000
        |      AND awl BETWEEN 2.0 AND 12.0
        |      AND punct <= 0.2 AND sw >= 0.01) AS q,
        |    (en >= de AND en >= fr AND en >= es AND en > 0) AS l
        |  FROM stats),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id FROM flags
        |  WHERE q AND l GROUP BY md5(norm)),
        |survsrc AS (
        |  SELECT f.source, CAST(count(*) AS BIGINT) AS n_unique
        |  FROM surv s JOIN flags f ON f.doc_id = s.doc_id
        |  GROUP BY 1),
        |funnel AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |    CAST(sum(CASE WHEN q AND l THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
        |  FROM flags GROUP BY 1)
        |SELECT fu.source, fu.n_total, fu.n_quality, fu.n_lang,
        |  COALESCE(ss.n_unique, 0) AS n_unique
        |FROM funnel fu LEFT JOIN survsrc ss ON fu.source = ss.source""".stripMargin,
    "ns23_mixture_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 8)) AS BIGINT) % 10000
        |  < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |      WHEN 'src2' THEN 0.25 ELSE 0.1 END) * 10000""".stripMargin,
    "ns28_pseudo_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':shuf1') AS h,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf1'), 1, 8)) AS BIGINT) % 1000 AS b
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY b, h, doc_id) AS BIGINT) AS shuffle_rank
        |FROM h""".stripMargin,
    "ns24_pack_offsets" ->
      """SELECT doc_id, n_chars,
        |  CAST(coalesce(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(coalesce(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS DOUBLE) / 2048) AS BIGINT) AS pack_id
        |FROM documents""".stripMargin,
    "ns18_source_quota" ->
      """SELECT source, doc_id, n_chars, rn FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 50""".stripMargin,
    // Window close rule: append mode emits a 1-hour window once the
    // final watermark (max event time − 30 min) passes window end =
    // date_trunc(hour) + 1 hour. The fixture's max ts never lands on
    // a half-hour boundary, so <= vs < is immaterial.
    "s01_streaming_rollup" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT CAST(strftime(ts, '%Y%m%d%H') || '00' AS BIGINT) AS run_hr,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events, mx
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        | AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 30 MINUTE
        |GROUP BY 1, 2""".stripMargin,
    // Emission rules (see the s02 query comment): a session is visible
    // iff it is not its user's last session (closed in-batch by the
    // next event) OR its timeout (end + gap) is strictly before the
    // final watermark (max ts − 1 h). Fixture timestamps are
    // micro-exact (ns remainder 0), so no precision slack is needed.
    // DISTINCT states the dedup semantics explicitly: the fixture's
    // event_ids are unique within one file copy, but the oracle must
    // not silently rely on that.
    "s03_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "s02_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
        |mx AS (SELECT max(ts) AS m FROM ev),
        |marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, min(ts) AS session_start,
        |    max(ts) AS session_end, COUNT(*) AS n_events,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS total_value
        |  FROM sess GROUP BY user_id, sid),
        |flagged AS (
        |  SELECT *, sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        |  FROM agg)
        |SELECT user_id, session_start, session_end, n_events, total_value
        |FROM flagged, mx
        |WHERE NOT is_last OR session_end + INTERVAL 12 HOUR < m - INTERVAL 1 HOUR""".stripMargin,
    "p01_weather_pipeline" ->
      """SELECT lower(replace(n_name, ' ', '_')) AS city_key,
        | n_name AS city, 'US' AS country,
        | strptime('2026-08-12 10:' ||
        |   lpad(CAST(n_nationkey AS VARCHAR), 2, '0') || ':00',
        |   '%Y-%m-%d %H:%M:%S') AS localtime_ts,
        | CAST(n_nationkey + 0.5 AS DOUBLE) AS temp_c,
        | CAST((n_nationkey + 0.5) * 2 AS DOUBLE) AS temp_f,
        | n_nationkey % 2 = 1 AS is_day,
        | 'Cond ' || n_regionkey AS condition_text,
        | CAST(1000 + n_regionkey AS BIGINT) AS condition_code,
        | CAST(40 + n_nationkey AS BIGINT) AS humidity,
        | CAST(n_nationkey AS BIGINT) AS cloud,
        | CAST(202608121000 AS BIGINT) AS run_hr
        |FROM nation""".stripMargin,
    "p02_cocktails_pipeline" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id_drink,
        | p_name AS drink, p_type AS category, p_brand AS glass,
        | p_brand AS ingredient1, '2 oz' AS measure1,
        | 'Alcoholic' AS alcoholic,
        | CAST(202608121000 AS BIGINT) AS run_hr
        |FROM part WHERE p_partkey < 20""".stripMargin,
  )
}
