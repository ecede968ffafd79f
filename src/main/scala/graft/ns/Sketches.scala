package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches (SURVEY.md §2.4/§2.8 [NS]):
  * HyperLogLog++ distinct counts and mergeable quantile summaries.
  * Both are one-pass, map-side-combinable aggregates whose sketch
  * buffers merge associatively — the only kind of "distinct/quantile"
  * that survives 100 TB (an exact global COUNT(DISTINCT) re-shuffles
  * every key; a sketch ships kilobytes per partition).
  */
object Sketches {

  /** Approximate distinct count of `valueCol` per group (HLL++,
    * default rsd 5%). */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))

  /** Approx + exact distinct side by side with the relative error —
    * the test/measurement harness for [[approxDistinct]]. */
  def distinctWithError(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"),
        count_distinct(valueCol).as("exact_distinct"))
      .withColumn("rel_err",
        abs(col("approx_distinct") - col("exact_distinct"))
          .cast("double") / col("exact_distinct"))

  /** Mergeable HLL sketch COLUMNS (Apache DataSketches HllSketch,
    * `hll_sketch_agg`): unlike [[approxDistinct]]'s scalar answer,
    * this keeps the sketch BINARY per group — the storable form. The
    * 100-TB pattern: sketch each partition/day/source once, store
    * kilobytes, and answer any later union (all sources, a month of
    * days) by merging registers instead of rescanning raw data.
    * Merging is associative (HLL-mode registers combine by max), so
    * any grouping of parts converges to one answer; note the union of
    * SMALL parts is not bit-identical to the whole-data sketch —
    * DataSketches keeps low-cardinality sketches in exact list/set
    * mode and a union can promote them to estimating HLL mode — so
    * the law tested in NsSketchesMultimodalSpec is accuracy (merged
    * estimate within the sketch's error bound of exact) plus
    * partition-independence, not register identity. */
  def hllSketches(df: DataFrame, groupCols: Seq[Column],
      valueCol: Column, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Merge stored sketches to one distinct-count estimate (long).
    * Strict merge: all sketches must share lgK (the flag allows
    * heterogeneous configs; keeping it false preserves the
    * union-equals-whole register identity). */
  def hllMergeEstimate(sketches: DataFrame,
      sketchCol: String = "sketch"): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col(sketchCol), lit(false)))
      .as("distinct_estimate"))

  /** Per-group quantiles via the Greenwald-Khanna summary
    * (`percentile_approx`). With `accuracy` >= the group row count the
    * summary degrades gracefully to EXACT discrete quantiles (the
    * returned value is always an actual element), which is what makes
    * the DuckDB `quantile_disc` oracle hash-match at fixture scale
    * while the same plan stays a bounded-memory sketch at 100 TB.
    * Output: one `p<NN>` column per requested probability. */
  def quantiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      probs: Seq[Double], accuracy: Int = 1000000): DataFrame = {
    val arr = percentile_approx(valueCol,
      array(probs.map(lit): _*), lit(accuracy))
    val qs = df.groupBy(groupCols: _*).agg(arr.as("__q"))
    probs.zipWithIndex.foldLeft(qs) { case (acc, (p, i)) =>
      acc.withColumn(s"p${(p * 100).round}", element_at(col("__q"), i + 1))
    }.drop("__q")
  }

  /** Winsorization (outlier clipping) at EXACT discrete quantiles
    * with no global sort: values live on a fixed decimal grid
    * (`scale` = 100 → cents), so binning by `round(value·scale)` is
    * lossless and the loQ/hiQ cuts come from a cumulative histogram
    * whose row count is the number of DISTINCT grid points — the
    * ns67 histogram-quantile trick, exact here because the grid is.
    * Cut rule is PERCENTILE_DISC: the smallest grid value whose
    * cumulative count reaches ceil(q·n). The corpus pass is one
    * map-side bin projection + a map-combinable histogram agg;
    * clipping is a second stateless projection. Feature-prep for
    * metric columns that long-tail (session values, doc lengths)
    * where a single extreme row would dominate a mean or a norm.
    * Output: (idCol, valCol, value_wins). */
  /** Exact mergeable moment columns: per group, the count and the
    * raw power sums Σx, Σx², Σx³ over the value's fixed decimal grid
    * (cents) — all EXACT 64-bit integers, so two sketches merge by
    * plain addition and the merged result is bit-equal to a full
    * recompute at any partitioning (the ns59 store-once/merge-forever
    * shape, for numeric profiling instead of cardinality). Derived
    * mean/variance are emitted as one deterministic double expression
    * each (exact-integer operands, fixed operation order). At cent
    * scale the s3 sum overflows 64 bits only past ~10¹² rows per
    * group; shard the group key before that (documented bound).
    * Output: (groupCols, n, s1, s2, s3, mean_cents, var_cents). */
  def momentColumns(df: DataFrame, groupCols: Seq[Column],
      valCol: String, scale: Long = 100L): DataFrame = {
    require(scale > 0, "scale must be positive")
    val bin = round(col(valCol) * scale).cast("long")
    val agg = df.withColumn("__b", bin)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__b")).as("s1"),
        sum(col("__b") * col("__b")).as("s2"),
        sum(col("__b") * col("__b") * col("__b")).as("s3"))
    agg.select(groupCols ++ Seq(col("n"), col("s1"), col("s2"),
      col("s3"),
      (col("s1").cast("double") / col("n").cast("double"))
        .as("mean_cents"),
      ((col("s2").cast("double") -
        col("s1").cast("double") * col("s1") / col("n")) / col("n"))
        .as("var_cents")): _*)
  }

  /** EXACT per-group discrete quantiles with NO sort: values live on
    * a fixed decimal grid, so a per-(group, grid-point) histogram +
    * one cumulative window over the (tiny) histogram yields
    * PERCENTILE_DISC cuts exactly — the smallest grid value whose
    * cumulative count reaches ceil(q·n). Contrast ns13: Spark's
    * approx_percentile trades exactness for generality; on gridded
    * metrics (money, counts, latencies in ms) exactness is free.
    * The corpus pass is one map-combinable histogram agg; the window
    * runs over distinct (group, bin) rows only. Output: (groupCols,
    * p{q} per requested quantile, as value units). */
  def exactGridQuantiles(df: DataFrame, groupCols: Seq[Column],
      valCol: String, probs: Seq[Double],
      scale: Long = 100L): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must lie in (0, 1]")
    require(scale > 0, "scale must be positive")
    val names = groupCols.map(_.toString)
    val hist = df
      .withColumn("__b", round(col(valCol) * scale).cast("long"))
      .groupBy(groupCols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val cuts = probs.map { p =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__b")))
        .cast("double").divide(scale.toDouble)
        .as(s"p${(p * 100).round}")
    }
    cum.groupBy(names.map(col): _*).agg(cuts.head, cuts.tail: _*)
  }

  /** Count-min sketch COLUMNS in sparse coordinate form: per group,
    * one row per (seed, cell) with the exact count of tokens hashing
    * there — the frequency complement to [[hllSketches]]'s
    * cardinality. Cell indices come from the repo's standard
    * DuckDB-replicable hash (md5 hex prefix → long, the ns17 idiom),
    * so unlike ns59's engine-specific HLL registers the WHOLE sketch
    * is hash-gatable: counts are exact integer sums over a pure
    * function of the token.
    *
    * The 100-TB shape: the exchange carries one row per DISTINCT
    * (group, seed, cell) — at depth 4 × width 256 that is ≤ 1024 rows
    * per group regardless of corpus size, with map-side combine doing
    * the heavy summing. Sketches merge by ADDING counts per (seed,
    * cell) — bit-exact, any partitioning (law in spec) — giving the
    * store-once/merge-forever pattern for heavy-hitter and frequency
    * queries: estimate(t) = min over seeds of cell count ≥ true
    * frequency, with the classic (ε=e/w, δ=e^-d) overestimate bound.
    *
    * The build `width` is stored in every row: a sketch consumed at
    * probe time with a DIFFERENT width hashes probes into cells the
    * build wrapped elsewhere, silently under-estimating — so the
    * sketch carries its own parameter and [[cmsEstimate]] reads it
    * instead of trusting the caller. Output: (groupCols, seed, cell,
    * cnt, width). */
  def cmsSketch(df: DataFrame, groupCols: Seq[Column], textCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    val toks = df.select(groupCols :+
      explode(TextOps.wordTokens(col(textCol))).as("__tok"): _*)
      .filter(length(col("__tok")) > 0)
    val seeds = explode(sequence(lit(0), lit(depth - 1))).as("seed")
    val names = groupCols.map(_.toString)
    // Count token OCCURRENCES first, hash DISTINCT tokens after
    // (r16): a cell is a pure function of the token, so the md5 work
    // is depth × |vocab per group|, not depth × |token stream| —
    // at sf1 that is ~200× fewer digests for an identical sketch
    // (integer counts sum the same either side of the hash). The
    // first groupBy carries (group, token) rows with map-side
    // combine; the second is the same bounded (group, seed, cell)
    // exchange as before.
    toks.groupBy((names.map(col) :+ col("__tok")): _*)
      .agg(count(lit(1)).as("__c"))
      .select((names.map(col) :+ col("__tok") :+ col("__c") :+ seeds): _*)
      .withColumn("cell",
        conv(substring(md5(concat(col("__tok"), lit(":cms"),
          col("seed").cast("string"))), 1, 8), 16, 10)
          .cast("long") % width)
      .groupBy((names.map(col) :+ col("seed") :+ col("cell")): _*)
      .agg(sum(col("__c")).as("cnt"))
      .withColumn("width", lit(width))
  }

  /** Point-frequency estimates from a stored [[cmsSketch]]: for each
    * probe token, min over seeds of its cell's count (0 if the cell
    * row is absent — sparse form). Broadcast-joins the (token, seed,
    * cell) probe rows against the kilobyte sketch; never rescans the
    * corpus. Output: (groupCols..., token, est).
    *
    * Probe parameters are NOT caller-supplied guesses (a probe width
    * different from the build width hashes probes into cells the
    * build wrapped elsewhere, silently UNDER-estimating and voiding
    * the CMS >= true-frequency guarantee): depth is DERIVED from the
    * stored sketch (`max(seed) + 1` — every seed row 0..depth-1
    * exists for any non-empty sketch because cmsSketch explodes the
    * full seed sequence per token), and width is READ from the
    * sketch's own `width` column, asserting it is consistent across
    * rows and that every stored cell lies under it. One bounded agg
    * over the kilobyte sketch. */
  def cmsEstimate(sketch: DataFrame, groupNames: Seq[String],
      tokens: Seq[String]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    // Bounded collect: one row, over a sketch whose size is capped by
    // depth × width per group.
    val dims = sketch.agg(
      max(col("seed")).cast("long").as("max_seed"),
      max(col("cell")).cast("long").as("max_cell"),
      min(col("width")).cast("long").as("min_w"),
      max(col("width")).cast("long").as("max_w")).collect()(0)
    require(!dims.isNullAt(0), "cmsEstimate: empty sketch")
    val depth = dims.getLong(0).toInt + 1
    require(dims.getLong(2) == dims.getLong(3),
      s"cmsEstimate: inconsistent widths ${dims.getLong(2)} vs " +
        s"${dims.getLong(3)} — refusing to mix sketches built with " +
        "different parameters")
    val width = dims.getLong(2).toInt
    require(dims.getLong(1) < width,
      s"cmsEstimate: sketch has cell ${dims.getLong(1)} >= its " +
        s"declared width $width — corrupt sketch")
    val probes = tokens.toDF("token")
      .select(col("token"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("cell",
        conv(substring(md5(concat(col("token"), lit(":cms"),
          col("seed").cast("string"))), 1, 8), 16, 10)
          .cast("long") % width)
    // A missing (seed, cell) row means that cell counted ZERO tokens;
    // the min must see the 0, so probe rows are expanded per group
    // (bounded: #groups × #tokens × depth) and left-joined.
    val groups = sketch.select(groupNames.map(col): _*).distinct()
    val expanded = groups.crossJoin(broadcast(probes))
    expanded.join(sketch, groupNames ++ Seq("seed", "cell"), "left")
      .withColumn("__c", coalesce(col("cnt"), lit(0L)))
      .groupBy((groupNames.map(col) :+ col("token")): _*)
      .agg(min(col("__c")).as("est"))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column, per group — the standard "did this feature's
    * distribution move" gate in front of (re)training: PSI < 0.1
    * stable, > 0.25 drifted. Values are binned on the integer grid
    * (unit bins via floor), counts Laplace-smoothed over the union of
    * observed bins, and each bin's (q−p)·ln(q/p) contribution is
    * nano-quantized ONCE (ns79's fixed-point trick: libm ln is
    * bit-stable vs DuckDB, and a single round makes the long sum
    * partition- and order-independent ⇒ hash-gatable).
    *
    * Scale shape: two corpus passes that reduce to one row per
    * DISTINCT (group, bin) before the full-outer join — exchanges
    * carry histograms, not rows; totals broadcast-join back on the
    * group key. Output: (groupCol, n_bins, psi_fx) with psi =
    * psi_fx / 2^fracBits. */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
      valCol: String, alpha: Double = 0.5,
      fracBits: Int = 24): DataFrame = {
    require(alpha > 0 && fracBits >= 1 && fracBits <= 30,
      "bad psiDrift parameters")
    val scale = (1L << fracBits).toDouble
    def hist(df: DataFrame, as: String) = df
      .select(col(groupCol), floor(col(valCol)).cast("long").as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as(as))
    val j = hist(oldDf, "n_old")
      .join(hist(newDf, "n_new"), Seq(groupCol, "bin"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val tot = j.groupBy(col(groupCol))
      .agg(sum(col("n_old")).as("ta"), sum(col("n_new")).as("tb"),
        count(lit(1)).as("v"))
    val w = j.join(broadcast(tot), Seq(groupCol))
    val p = (col("n_old").cast("double") + lit(alpha)) /
      (col("ta").cast("double") +
        lit(alpha) * (col("v").cast("double") + lit(1.0)))
    val q = (col("n_new").cast("double") + lit(alpha)) /
      (col("tb").cast("double") +
        lit(alpha) * (col("v").cast("double") + lit(1.0)))
    val contrib = round((q - p) * log(q / p) * scale).cast("long")
    w.select(col(groupCol), contrib.as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_bins"), sum(col("__c")).as("psi_fx"))
  }

  def winsorize(df: DataFrame, idCol: String, valCol: String,
      loQ: Double, hiQ: Double, scale: Long = 100L): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "need 0 <= loQ < hiQ <= 1")
    require(scale > 0, "scale must be positive")
    val binned = df.withColumn("__bin",
      round(col(valCol) * scale).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = binned.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
    val n = cum.agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
    if (n == 0L)
      return df.select(col(idCol), col(valCol))
        .limit(0).withColumn("value_wins", lit(0.0))
    val loCut = cum.filter(col("__cum") >= math.ceil(loQ * n).toLong)
      .agg(min(col("__bin"))).head().getLong(0)
    val hiCut = cum.filter(col("__cum") >= math.ceil(hiQ * n).toLong)
      .agg(min(col("__bin"))).head().getLong(0)
    binned.select(col(idCol), col(valCol),
      (greatest(least(col("__bin"), lit(hiCut)), lit(loCut))
        .cast("double") / scale.toDouble).as("value_wins"))
  }
}
