package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column storage operators for LLM-data pipelines: vector
  * quantization for the 100-TB shelf. An `array<float>` embedding
  * column is typically the widest thing in a curated corpus (d=1k
  * floats = 4 KB/row); symmetric int8 quantization cuts it 4× with a
  * per-vector scale, which is what production vector stores ship to
  * disk. Everything here is a pure projection — map-side, zero
  * shuffle, codegen'd `transform`/`zip_with` lambdas over the array,
  * so it composes with any scan without changing the plan shape.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization:
    * q_i = round(x_i * 127 / scale), scale = max_i |x_i|, so q_i ∈
    * [-127, 127] and dequantization is q_i * scale / 127. The
    * all-zero vector (scale 0) quantizes to zeros rather than NaN.
    * `max_abs_err` is the exact per-vector reconstruction bound
    * actually achieved (≤ scale/254 by construction — half a quantum
    * — a law the spec asserts); max is order-independent, so the
    * value is deterministic under any partitioning.
    *
    * All arithmetic is float→double promotion (exact) followed by
    * double ops in a fixed order — bit-reproducible across engines,
    * which is why the ns35 gate can hash-match DuckDB.
    *
    * Output: (idCol, q_scale double, q array<int>, max_abs_err
    * double). */
  def quantizeInt8(df: DataFrame, idCol: String,
      embCol: String): DataFrame =
    df.select(col(idCol), col(embCol),
        array_max(transform(col(embCol), x => abs(x)))
          .cast("double").as("q_scale"))
      .select(col(idCol), col(embCol), col("q_scale"),
        when(col("q_scale") === 0d,
            transform(col(embCol), _ => lit(0)))
          .otherwise(transform(col(embCol),
            x => round(x.cast("double") * 127.0 / col("q_scale"))
              .cast("int"))).as("q"))
      .select(col(idCol), col("q_scale"), col("q"),
        array_max(zip_with(col(embCol), col("q"),
          (x, qi) => abs(x.cast("double") -
            qi.cast("double") * col("q_scale") / 127.0)))
          .as("max_abs_err"))

  /** Inverse of [[quantizeInt8]]: x̂_i = q_i * scale / 127 as doubles.
    * Round-trip law (spec-asserted): max_i |x_i − x̂_i| equals the
    * `max_abs_err` quantizeInt8 reported, ≤ scale/254. Pure
    * projection; expects the (q, q_scale) columns quantizeInt8
    * emits. */
  def dequantizeInt8(df: DataFrame, qCol: String = "q",
      scaleCol: String = "q_scale"): DataFrame =
    df.withColumn("dq", transform(col(qCol),
      qi => qi.cast("double") * col(scaleCol) / 127.0))

  /** L2 normalization: unit_i = x_i / ‖x‖₂, plus the norm itself —
    * the projection every cosine-similarity consumer wants
    * pre-computed (dot product on unit vectors IS cosine), and the
    * stored form that makes downstream top-k a pure fused
    * multiply-add. The all-zero vector maps to zeros, not NaN.
    *
    * Cross-engine bit-exactness (ns36 hash-gates this vs DuckDB):
    * the squared-norm accumulation is a LEFT FOLD over the array in
    * doubles (`aggregate` here, `list_reduce` there — both
    * sequential left-to-right, and IEEE adds/sqrt/divides are
    * correctly rounded), so norm and every element agree bitwise.
    * Pure zero-shuffle projection, one codegen'd higher-order
    * function per output column.
    *
    * Output: (idCol, norm double, unit array<double>). */
  def l2Normalize(df: DataFrame, idCol: String,
      embCol: String): DataFrame =
    df.select(col(idCol), col(embCol),
        sqrt(aggregate(col(embCol), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("norm"))
      .select(col(idCol), col("norm"),
        when(col("norm") === 0d,
            transform(col(embCol), _ => lit(0.0)))
          .otherwise(transform(col(embCol),
            x => x.cast("double") / col("norm"))).as("unit"))

  /** Matryoshka truncation (MRL-style): keep the first `dPrime`
    * dimensions of each embedding and L2-renormalize — the storage/
    * latency ladder modern embedding models are trained for (nested
    * prefixes carry most of the signal, so a 4–16× narrower vector
    * serves coarse retrieval and the full vector reranks).
    * `energy_ratio` = ‖x[1..d']‖/‖x‖ is the exact per-vector retained
    * signal — the number that tells a pipeline whether d' is safe for
    * its corpus. Pure zero-shuffle projection; the norm folds are the
    * same sequential left folds as [[l2Normalize]], so every output
    * is bit-reproducible against a SQL engine (ns57 hash-gates it).
    * All-zero prefixes map to zero vectors, not NaN.
    *
    * Output: (idCol, full_norm, kept_norm, energy_ratio,
    * unit array<double> of length dPrime). */
  def matryoshkaTruncate(df: DataFrame, idCol: String, embCol: String,
      dPrime: Int): DataFrame = {
    require(dPrime >= 1, s"dPrime must be >= 1, got $dPrime")
    def sq(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
    df.select(col(idCol), col(embCol),
        slice(col(embCol), 1, dPrime).as("__p"))
      .select(col(idCol), col("__p"),
        sq(col(embCol)).as("full_norm"), sq(col("__p")).as("kept_norm"))
      .select(col(idCol), col("full_norm"), col("kept_norm"),
        when(col("full_norm") === 0d, lit(0.0))
          .otherwise(col("kept_norm") / col("full_norm"))
          .as("energy_ratio"),
        when(col("kept_norm") === 0d,
            transform(col("__p"), _ => lit(0.0)))
          .otherwise(transform(col("__p"),
            x => x.cast("double") / col("kept_norm"))).as("unit"))
  }

  /** Per-group embedding centroids (mean pooling) — the SemDeDup /
    * diversity-balancing primitive: one representative vector per
    * cluster, label, or source. The mean is computed over EXACT
    * fixed-point sums: each element is rounded once to `fracBits`
    * fractional bits (x·2^f is exact — power-of-two scaling — and
    * the single round is the only quantization, error ≤ 2^-(f+1)),
    * then accumulated as longs. Integer addition is associative and
    * commutative, so the sum is order- and partition-independent —
    * that is what lets ns38 hash-match a SQL engine bit-for-bit,
    * where a float summation would be order-dependent noise.
    *
    * Scale shape: posexplode → groupBy(group, pos) sum(long) is
    * map-combinable (partial aggregation before the exchange; state
    * per (group, pos) is two longs), and the final per-group array
    * rebuild collects exactly d elements per group — bounded by the
    * embedding dimension, not the corpus. Overflow bound: safe while
    * group_size · max|x| < 2^(63-fracBits) (≈5·10¹¹ rows per group
    * at |x| ≤ 1, f = 24). Ragged arrays are averaged per-position
    * over the rows that have that position; `n_vectors` is the
    * group's row count (max position count).
    *
    * Output: (groupCol, n_vectors, centroid array<double>). */
  def labelCentroids(df: DataFrame, groupCol: String, embCol: String,
      fracBits: Int = 24): DataFrame = {
    require(fracBits >= 1 && fracBits <= 30,
      s"fracBits must be in [1, 30], got $fracBits")
    val scale = (1L << fracBits).toDouble
    df.select(col(groupCol),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .select(col(groupCol), col("pos"),
        round(col("x").cast("double") * scale).cast("long").as("fx"))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum("fx").as("sfx"), count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(max("n").as("n_vectors"),
        array_sort(collect_list(struct(col("pos"),
          (col("sfx").cast("double") / (col("n").cast("double") * scale))
            .as("m")))).as("pm"))
      .select(col(groupCol), col("n_vectors"),
        transform(col("pm"), p => p.getField("m")).as("centroid"))
  }

  /** Exact mergeable Gram matrix Σ x xᵀ over fixed-point embeddings —
    * the one-pass sketch behind covariance/PCA/whitening: store the
    * triangle once per corpus slice, merge slices by ADDITION
    * (bit-exact, any partitioning), derive covariance/eigen work
    * offline from kilobytes. Quantization happens in the DATAFRAME
    * layer with Spark's own `round` (the ns35/ns38-proven oracle
    * match); the Aggregator is pure integer multiply-accumulate, so
    * determinism needs no JVM-vs-SQL rounding argument at all.
    *
    * Shape: the partial buffer is the d(d+1)/2 triangle (d=64 →
    * 2 080 longs ≈ 16 KB), map-side combined — the exchange carries
    * one triangle per partition, never rows. Overflow bound: with
    * |x| ≤ 1 and fracBits 12, each product ≤ 2^24, so ~2^38 rows per
    * merge tree fit 2^63 — shard the corpus key far before that.
    * Output (via [[gramMatrix]]): scalarized (i, j, s_fx) triangle
    * rows, i ≤ j. */
  final class GramAggregator(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](tri)
    override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v != null && v.length == dim) {
        val q = v.toArray
        var p = 0; var a = 0
        while (a < dim) {
          val qa = q(a); var b = a
          while (b < dim) { buf(p) += qa * q(b); p += 1; b += 1 }
          a += 1
        }
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Corpus Gram matrix as scalarized triangle rows (i, j, s_fx),
    * i ≤ j, over `round(x·2^fracBits)` fixed-point embeddings. */
  def gramMatrix(df: DataFrame, embCol: String, dim: Int,
      fracBits: Int = 12): DataFrame = {
    val scale = (1L << fracBits).toDouble
    val q = df.select(transform(col(embCol),
      x => round(x.cast("double") * scale).cast("long")).as("q"))
    val agg = org.apache.spark.sql.functions.udaf(
      new GramAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val idx = (0 until dim).flatMap(a => (a until dim).map(b => (a, b)))
    val idxLit = array(idx.map { case (a, b) =>
      struct(lit(a).as("i"), lit(b).as("j")) }: _*)
    q.agg(agg(col("q")).as("gram"))
      .select(explode(arrays_zip(idxLit.as("ij"), col("gram").as("s")))
        .as("z"))
      .select(col("z.ij.i").as("i"), col("z.ij.j").as("j"),
        col("z.s").as("s_fx"))
  }

  /** Deterministic cyclic-Jacobi eigendecomposition of a symmetric
    * d×d matrix: fixed sweep order (upper triangle, row-major), fixed
    * sweep count — no pivot search, no data-dependent branching
    * beyond the rotation-skip threshold, so the result is a pure
    * function of the input matrix. Returns (eigenvalues, vectors) as
    * parallel arrays sorted by eigenvalue DESC with index tie-break;
    * each vector's sign is fixed by making its largest-|component|
    * entry positive (eigenvectors are sign-ambiguous otherwise).
    * O(sweeps·d³) on the DRIVER — the fit side of fit/project, run
    * on a d×d summary, never on data. */
  def jacobiEigen(m: Array[Array[Double]],
      sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x   => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val big = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(big) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** PCA projection, fit/project split (the IVF pattern): FIT runs on
    * summaries — the exact [[gramMatrix]] triangle plus exact
    * fixed-point mean sums, both kilobytes, eigendecomposed
    * driver-side by [[jacobiEigen]] — and PROJECT is one map-side
    * pass with the top-k eigenvectors baked in as literals (the
    * [[signedProjection]] shape, double arithmetic). Deterministic
    * end-to-end: exact integer inputs → a fixed-order eigensolver →
    * fixed-fold projections; registered rows-only (no SQL
    * eigensolver), laws in NsSimilaritySpec. Centered covariance:
    * C = Σxxᵀ/n − μμᵀ over the quantized grid.
    * Output: (idCol, j, comp) for j < k. */
  def pcaProject(df: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int, fracBits: Int = 12): DataFrame = {
    require(k >= 1 && k <= dim, "need 1 <= k <= dim")
    val scale = (1L << fracBits).toDouble
    val gram = gramMatrix(df, embCol, dim, fracBits)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val sums = df
      .select(posexplode(transform(col(embCol),
        x => round(x.cast("double") * scale).cast("long"))))
      .groupBy(col("pos")).agg(sum(col("col")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val n = sums.values.headOption.map(_._2).getOrElse(0L)
    projectWithFit(df, idCol, embCol, dim, k, fracBits, gram,
      sums.view.mapValues(_._1).toMap, n)
  }

  /** Shared PROJECT half of [[pcaProject]] / [[pcaProjectFromStore]]:
    * fit (mean + covariance + Jacobi) from the exact summaries, then
    * one map-side projection pass with the eigenvectors as literals.
    * Both entry points reduce to THIS function on identical
    * summaries, so refit-from-store equals direct refit bit-for-bit
    * (law in NsSimilaritySpec). */
  private def projectWithFit(df: DataFrame, idCol: String,
      embCol: String, dim: Int, k: Int, fracBits: Int,
      gram: Map[(Int, Int), Long], sums: Map[Int, Long],
      n: Long): DataFrame = {
    require(n > 0, "PCA fit needs at least one vector")
    val scale = (1L << fracBits).toDouble
    val nd = n.toDouble
    val mu = Array.tabulate(dim)(i => sums(i).toDouble / nd / scale)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val s = gram(if (i <= j) (i, j) else (j, i)).toDouble / (scale * scale)
      s / nd - mu(i) * mu(j)
    }
    val (_, evecs) = jacobiEigen(cov)
    val comps = (0 until k).map { j =>
      val w = array(evecs(j).map(lit): _*)
      aggregate(
        zip_with(col(embCol), w, (x, wi) => x.cast("double") * wi),
        lit(0.0), (acc, x) => acc + x)
    }
    df.select(col(idCol), posexplode(array(comps: _*)))
      .select(col(idCol), col("pos").cast("int").as("j"),
        col("col").as("comp"))
  }

  /** Mergeable embedding summary of a corpus slice — the store-once/
    * merge-forever form of the PCA fit inputs (the ns59/s08 pattern
    * for second moments): the exact fixed-point Gram triangle
    * (`kind='gram'`, (i, j) → v) plus the per-position quantized mean
    * sums (`kind='sum'`, (pos, -1) → v) and the slice's row count
    * (`kind='n'`, (-1, -1) → v). All three are integer sums, so
    * slices merge by ADDITION per (kind, i, j) — bit-exact under any
    * batching — and a PCA refit on snapshot N+1 pays one summary
    * over the DELTA instead of a corpus-sized recompute.
    * Output: (kind, i, j, v) — ≤ d(d+1)/2 + d + 1 rows. */
  def embeddingSummary(df: DataFrame, embCol: String, dim: Int,
      fracBits: Int = 12): DataFrame = {
    val scale = (1L << fracBits).toDouble
    val sums = df
      .select(posexplode(transform(col(embCol),
        x => round(x.cast("double") * scale).cast("long"))))
      .groupBy(col("pos")).agg(sum(col("col")).as("s"),
        count(lit(1)).as("n"))
    gramMatrix(df, embCol, dim, fracBits)
      .select(lit("gram").as("kind"), col("i"), col("j"),
        col("s_fx").as("v"))
      .unionByName(sums.select(lit("sum").as("kind"),
        col("pos").cast("int").as("i"), lit(-1).as("j"),
        col("s").as("v")))
      .unionByName(sums.filter(col("pos") === 0)
        .select(lit("n").as("kind"), lit(-1).as("i"), lit(-1).as("j"),
          col("n").as("v")))
  }

  /** Land one slice's [[embeddingSummary]] as an idempotent
    * `batch_id` partition of a summary store (the s08 shape): a
    * re-delivered batch REPLACES its own partition, never
    * double-adds. */
  def writeSummaryPartial(df: DataFrame, path: String, batchId: Long,
      embCol: String, dim: Int, fracBits: Int = 12): Unit =
    graft.ops.IdempotentWriter.replacePartitions(
      embeddingSummary(df, embCol, dim, fracBits)
        .withColumn("batch_id", lit(batchId)).coalesce(1),
      path, Seq("batch_id"))

  /** Merge a summary store to the current whole-corpus summary:
    * exact integer addition per (kind, i, j). */
  def readSummaryStore(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("kind"), col("i"), col("j"))
      .agg(sum(col("v")).as("v"))

  /** PCA projection fit from a MERGED summary store instead of a
    * corpus recompute — the delta-cost refit: snapshot N+1 writes one
    * partial for its delta ([[writeSummaryPartial]]), and the fit
    * consumes the addition-merged store. Bit-equal to [[pcaProject]]
    * over the same corpus because both reduce to the same fit on the
    * same exact integers (law in NsSimilaritySpec). */
  def pcaProjectFromStore(df: DataFrame, idCol: String,
      embCol: String, summary: DataFrame, dim: Int, k: Int,
      fracBits: Int = 12): DataFrame = {
    require(k >= 1 && k <= dim, "need 1 <= k <= dim")
    // Bounded collect: the summary is ≤ d(d+1)/2 + d + 1 rows.
    val rows = summary.select(col("kind"), col("i"), col("j"),
      col("v")).collect()
    val gram = rows.filter(_.getString(0) == "gram")
      .map(r => ((r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    val sums = rows.filter(_.getString(0) == "sum")
      .map(r => (r.getInt(1), r.getLong(3))).toMap
    val n = rows.filter(_.getString(0) == "n")
      .map(_.getLong(3)).sum
    projectWithFit(df, idCol, embCol, dim, k, fracBits, gram, sums, n)
  }

  /** Deterministic ±1 sign for projection cell (i, j): parity of the
    * first hex nibble of md5("i:j:salt") — the ns17 md5 idiom, so the
    * oracle derives the SAME matrix in SQL. */
  def projectionSign(i: Int, j: Int, salt: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j:$salt".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Signed random projection (Achlioptas ±1) over int8-QUANTIZED
    * embeddings: out_j = Σ_i sign(i,j)·q_i with q from
    * [[quantizeInt8]] — all-integer arithmetic, so the projection is
    * EXACT and hash-gatable (the JL guarantee needs only ±1 signs
    * with per-cell fair parity; md5 nibble parity provides it
    * deterministically, no RNG). The dimensionality-reduction step
    * in front of LSH/ANN: 64 floats → k exact longs per vector,
    * shrinking every downstream candidate join's shuffle by D/k.
    *
    * Scale shape: the sign matrix is D×k literal arrays baked into
    * the plan (kilobytes); the whole op is one map-side projection —
    * no join, no exchange (plan law in spec). Scalarized output
    * (idCol, j, comp) rows, the ns35 posexplode idiom. */
  def signedProjection(df: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int = 16, salt: String = "rp"): DataFrame = {
    require(dim >= 1 && k >= 1, "need dim >= 1, k >= 1")
    val q = quantizeInt8(df, idCol, embCol)
      .select(col(idCol), col("q"))
    val comps = (0 until k).map { j =>
      val signs = array((0 until dim).map(i =>
        lit(projectionSign(i, j, salt).toLong)): _*)
      aggregate(
        zip_with(col("q"), signs, (a, s) => a.cast("long") * s),
        lit(0L), (acc, x) => acc + x)
    }
    q.select(col(idCol), posexplode(array(comps: _*)))
      .select(col(idCol), col("pos").cast("int").as("j"),
        col("col").as("comp"))
  }
}
