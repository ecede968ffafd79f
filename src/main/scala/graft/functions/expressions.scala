package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static (Java-callable) kernel for [[PyToJson]] codegen: generated
  * whole-stage code calls this directly, one virtual call per row, no
  * Row boxing and no interpreted-expression detour. */
object PyToJsonKernel {
  def repair(s: UTF8String): UTF8String = {
    val out = PyLiteral.repairOrNull(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** Catalyst-native scalar expression for the O9 JSON repair with full
  * codegen support: inside a WholeStageCodegen stage this emits a
  * direct static call into [[PyToJsonKernel]], so the surrounding
  * operators stay fused (no CodegenFallback row materialization, no
  * UDF serialization). The repair itself is a per-string parse either
  * way; what codegen buys is keeping the REST of the stage fused.
  */
case class PyToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // Pure function of the input → Catalyst's ConstantFolding collapses
  // repairs of literals at plan time.
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(v: Any): Any =
    PyToJsonKernel.repair(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PyToJsonKernel.repair($c);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  override def prettyName: String = "py_to_json"
  override protected def withNewChildInternal(c: Expression): PyToJson =
    copy(child = c)
}

/** Static kernel for [[TopGramExpr]]: one tight JVM pass per row —
  * canonicalize (graft.ns.Bpe.norm, the SAME JVM restatement of
  * Dedup.normText the BPE gates pin), split, hash-count the n-grams,
  * argmax with the binary-UTF8 tie-break. Exists because the
  * HOF-composed version (TextOps.topGramCol) evaluates as an
  * INTERPRETED expression tree: per-element lambda dispatch plus a
  * sort make it the hottest map-side op in the registry (measured —
  * see SCALE.md round 9). The kernel does the identical computation
  * as straight-line code; NsTextOpsSpec pins kernel ≡ HOF, including
  * a randomized sweep. */
object TopGramKernel {
  private val EMPTY = new org.apache.spark.sql.catalyst.expressions
    .GenericInternalRow(Array[Any](null, 0L, 0.0))

  def topGram(s: UTF8String, n: Int): org.apache.spark.sql.catalyst
      .InternalRow = {
    if (s == null) return EMPTY
    val norm = graft.ns.Bpe.norm(s.toString)
    val toks = norm.split(" ", -1)
    if (toks.length < n) return EMPTY
    val m = toks.length - n + 1
    val counts = new java.util.HashMap[String, Long](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var best: UTF8String = null
    var bestCnt = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c > bestCnt) {
        bestCnt = c; best = UTF8String.fromString(e.getKey)
      } else if (c == bestCnt) {
        val u = UTF8String.fromString(e.getKey)
        if (u.compareTo(best) < 0) best = u
      }
    }
    val nChars = UTF8String.fromString(norm).numChars()
    val frac =
      if (bestCnt == 0L || nChars == 0) 0.0
      else (bestCnt * best.numChars().toLong).toDouble / nChars.toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestCnt, frac))
  }
}

/** Catalyst-native struct<gram,cnt,frac> most-frequent-n-gram: same
  * semantics as [[graft.ns.TextOps.topGramCol]] (null/short texts →
  * (null, 0, 0.0)), evaluated as ONE kernel call per row. Codegen
  * emits the static call directly so the surrounding stage stays
  * fused; output is never null, which lets downstream field
  * extraction skip null branches entirely. */
case class TopGramExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = true),
    StructField("cnt", LongType, nullable = false),
    StructField("frac", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TopGramKernel.topGram(
      child.eval(input).asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |InternalRow ${ev.value} = graft.functions.TopGramKernel.topGram(
        |  ${childGen.isNull} ? null : ${childGen.value}, $n);
        |""".stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }
  override def prettyName: String = "top_gram"
  override protected def withNewChildInternal(c: Expression): TopGramExpr =
    copy(child = c)
}

/** Static kernel for [[IvfAssignExpr]]: one tight JVM pass per row —
  * unit-normalize, score every centroid by argmax (2·u·c − ‖c‖²)
  * (≡ argmin euclidean for fixed ‖u‖), strict-> comparison keeps the
  * SMALLEST cell on ties. Exists because the HOF-composed assignment
  * (transform over nlist cells, each an aggregate over d elements)
  * evaluates as an INTERPRETED expression tree — measured 11 s for
  * 40k × 16 × 64-d at sf0.1 vs ~0.3 s through this kernel (the
  * TopGramKernel story, round 10). Fold order matches the HOF
  * version exactly: (v_i / n) · c_i summed ascending. */
object IvfAssignKernel {
  /** Returns the winning cell, or -1 for a zero-norm vector (no
    * direction — the caller maps it to null and drops the row). */
  def assign(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      centers: Array[Array[Double]], normSq: Array[Double]): Int = {
    val v = arr.toDoubleArray()
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    if (!(ss > 0)) return -1
    val n = math.sqrt(ss)
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var dot = 0.0
      var j = 0
      val d = math.min(v.length, ctr.length)
      while (j < d) { dot += (v(j) / n) * ctr(j); j += 1 }
      val score = 2.0 * dot - normSq(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }
}

/** Catalyst-native IVF cell assignment: `array<double>` vector in,
  * nearest-centroid cell out (null for zero-norm vectors). The
  * centroid matrix rides as a plan reference object (kilobytes);
  * codegen emits one static kernel call per row so the surrounding
  * stage stays fused — the batch-assignment half of the IVF index,
  * shared by fit-time and incremental maintenance. */
case class IvfAssignExpr(child: Expression,
    centers: Array[Array[Double]]) extends UnaryExpression {
  require(centers.nonEmpty, "need at least one centroid")
  @transient private lazy val normSq: Array[Double] =
    centers.map(c => c.map(x => x * x).sum)
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val cell = IvfAssignKernel.assign(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      centers, normSq)
    if (cell < 0) null else cell
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("ivfCenters", centers,
      "double[][]")
    val normSqRef = ctx.addReferenceObj("ivfNormSq", normSq,
      "double[]")
    val cell = ctx.freshName("ivfCell")
    nullSafeCodeGen(ctx, ev, c => s"""
      |int $cell = graft.functions.IvfAssignKernel.assign(
      |  $c, $centersRef, $normSqRef);
      |if ($cell < 0) { ${ev.isNull} = true; }
      |else { ${ev.value} = $cell; }
      |""".stripMargin)
  }
  override def prettyName: String = "ivf_assign"
  override protected def withNewChildInternal(c: Expression): IvfAssignExpr =
    copy(child = c)
}

/** Static kernel for [[LangScoreExpr]]: one tight pass over the
  * padded text accumulating all `nLangs` language-evidence sums at
  * once — singles keyed by char, bigrams by the packed char pair.
  * Exists because the HOF formulation (a chars∪bigrams array build +
  * one interpreted fold PER LANGUAGE over ~2·len elements) measured
  * 28 s for 50k docs at sf1; the kernel does the same integer sums
  * in one fused pass (the IvfAssignKernel story). Sum equivalence
  * with the gram-array form is exact: integer addition over the
  * same (char, pair) multiset, table misses contribute 0. */
object LangScoreKernel {
  def score(u: UTF8String,
      singles: java.util.HashMap[Character, Array[Long]],
      pairs: java.util.HashMap[Integer, Array[Long]],
      nLangs: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = u.toString
    val out = new Array[Long](nLangs)
    val len = s.length
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      val w1 = singles.get(Character.valueOf(c))
      if (w1 != null) {
        var k = 0; while (k < nLangs) { out(k) += w1(k); k += 1 }
      }
      if (i + 1 < len) {
        val w2 = pairs.get(
          Integer.valueOf((c.toInt << 16) | s.charAt(i + 1).toInt))
        if (w2 != null) {
          var k = 0; while (k < nLangs) { out(k) += w2(k); k += 1 }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Catalyst-native language-evidence scorer: padded text in,
  * `array<long>` of per-language micro-unit sums out. The weight
  * table rides as plan reference objects (two small hash maps);
  * codegen emits one static kernel call per row so the language-ID
  * projection stays inside WholeStageCodegen. Table grams must be
  * 1–2 UTF-16 code units (all BMP — asserted at construction). */
case class LangScoreExpr(child: Expression,
    grams: Seq[(String, Seq[Long])], nLangs: Int)
    extends UnaryExpression {
  require(grams.nonEmpty && grams.forall(_._2.length == nLangs),
    "every gram needs one weight per language")
  require(grams.forall(g => g._1.length == 1 || g._1.length == 2),
    "profile grams must be 1 or 2 UTF-16 code units (BMP)")
  @transient private lazy val singles = {
    val m = new java.util.HashMap[Character, Array[Long]]
    grams.collect { case (g, ws) if g.length == 1 =>
      m.put(Character.valueOf(g.charAt(0)), ws.toArray) }
    m
  }
  @transient private lazy val pairs = {
    val m = new java.util.HashMap[Integer, Array[Long]]
    grams.collect { case (g, ws) if g.length == 2 =>
      m.put(Integer.valueOf((g.charAt(0).toInt << 16) |
        g.charAt(1).toInt), ws.toArray) }
    m
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    LangScoreKernel.score(v.asInstanceOf[UTF8String], singles, pairs,
      nLangs)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val singlesRef = ctx.addReferenceObj("langSingles", singles,
      "java.util.HashMap")
    val pairsRef = ctx.addReferenceObj("langPairs", pairs,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.LangScoreKernel.score(
      |  $c, $singlesRef, $pairsRef, $nLangs);
      |""".stripMargin)
  }
  override def prettyName: String = "lang_scores"
  override protected def withNewChildInternal(c: Expression): LangScoreExpr =
    copy(child = c)
}

/** Static kernel for [[NfcNormalizeExpr]]: Unicode NFC (canonical
  * decomposition + canonical composition, UAX #15) via the JDK's
  * `java.text.Normalizer`. Normalization of assigned characters is
  * STABILIZED by the Unicode standard — every conformant
  * implementation (JDK here, ICU/utf8proc in other engines) returns
  * byte-identical results — which is what makes a cross-engine
  * hash gate on the output possible at all. The `isNormalized`
  * fast path skips the decompose/compose allocation for text that
  * is already NFC — the overwhelmingly common case in a web corpus,
  * so at 100 TB the stage costs one quick-check scan per string. */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** Catalyst-native Unicode NFC normalization with full codegen
  * support (the [[PyToJson]] tier): inside WholeStageCodegen this
  * emits one static call into [[NfcKernel]] per row, so the
  * normalization stage stays fused with the rest of the curation
  * projection — no UDF boundary, no interpreted fallback. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // Pure function of the input → ConstantFolding collapses literals.
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(v: Any): Any =
    NfcKernel.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.NfcKernel.nfc($c);
      |""".stripMargin)
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

/** Static kernel for [[NfkcCasefoldExpr]]: the NFKC + case-fold
  * normalization tier (the Unicode NFKC_Casefold direction) — the
  * standard dedup/match normalization for web text, one level
  * stronger than NFC: compatibility forms collapse (full-width
  * ASCII, ligatures ﬁ→fi, superscripts ²→2, half-width katakana,
  * Roman-numeral compatibility chars) AND case distinctions drop.
  * Composition: NFKC, then Unicode Default Case Conversion
  * lowercasing (JDK `toLowerCase(Locale.ROOT)` — deliberately NOT
  * full case folding: ß stays ß rather than becoming ss; the choice
  * is pinned by the ns159 gate), then NFKC again because
  * lowercasing can denormalize (İ → i + combining dot). NFKC is
  * Unicode-stabilized like NFC; the lowercase step follows the
  * published UnicodeData/SpecialCasing tables, so conformant
  * engines agree. Fast path: pure-ASCII text with no uppercase —
  * the common case after upstream cleaning — returns the input
  * buffer untouched. */
object NfkcCfKernel {
  def nfkcCf(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var asciiLower = true
    while (asciiLower && i < n) {
      val b = s.getByte(i)
      if (b < 0 || (b >= 'A' && b <= 'Z')) asciiLower = false
      i += 1
    }
    if (asciiLower) return s
    val str = s.toString
    val form = java.text.Normalizer.Form.NFKC
    val nfkc =
      if (java.text.Normalizer.isNormalized(str, form)) str
      else java.text.Normalizer.normalize(str, form)
    val low = nfkc.toLowerCase(java.util.Locale.ROOT)
    val out =
      if (java.text.Normalizer.isNormalized(low, form)) low
      else java.text.Normalizer.normalize(low, form)
    if (out == str) s else UTF8String.fromString(out)
  }
}

/** Catalyst-native NFKC + case-fold normalization with full codegen
  * support (the [[NfcNormalizeExpr]] tier): one static call into
  * [[NfkcCfKernel]] per row inside WholeStageCodegen. */
case class NfkcCasefoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(v: Any): Any =
    NfkcCfKernel.nfkcCf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.NfkcCfKernel.nfkcCf($c);
      |""".stripMargin)
  override def prettyName: String = "nfkc_casefold"
  override protected def withNewChildInternal(c: Expression): NfkcCasefoldExpr =
    copy(child = c)
}

/** Static kernels for the product-quantization expressions: one
  * tight JVM pass per row, shared by interpreted eval and generated
  * code (the [[IvfAssignKernel]] story). PQ splits a d-dim unit
  * vector into `m` contiguous subvectors and snaps each to one of
  * `ksub` per-subspace centroids, so a vector stores as m small
  * codes (m·log2(ksub) bits) instead of d floats — the memory/
  * bandwidth path that keeps a 100 TB embedding corpus scannable
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011). Scoring fold order is pinned:
  * per subspace, (v_i / n)·c_i summed over ascending i, score =
  * 2·dot − ‖c‖², strict-> comparison keeps the SMALLEST code on
  * ties — the exact [[IvfAssignKernel]] convention, which is what
  * lets the md5-parity-codebook twin hash-gate in DuckDB. */
object PqKernels {
  /** m codes for one vector (null for zero-norm: no direction). */
  def encode(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      cb: Array[Array[Array[Double]]], normSq: Array[Array[Double]]):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val v = arr.toDoubleArray()
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    if (!(ss > 0)) return null
    val n = math.sqrt(ss)
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    var base = 0
    while (s < m) {
      val codes = cb(s)
      val ns = normSq(s)
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < codes.length) {
        val c = codes(j)
        var dot = 0.0
        var t = 0
        val d = math.min(c.length, math.max(0, v.length - base))
        while (t < d) { dot += (v(base + t) / n) * c(t); t += 1 }
        val score = 2.0 * dot - ns(j)
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      out(s) = best
      base += codes(0).length
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-QUERY ADC lookup table: m·ksub dot products of the unit
    * query's subvectors against every sub-centroid, laid out
    * [s·ksub + j]. Computed ONCE per query row; each (query, code
    * row) pair then costs m array reads in [[adc]] — that asymmetry
    * (ksub·d mults per query, m adds per candidate) is the whole
    * point of ADC. Null for zero-norm queries. */
  def table(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      cb: Array[Array[Array[Double]]]):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val v = arr.toDoubleArray()
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    if (!(ss > 0)) return null
    val n = math.sqrt(ss)
    val m = cb.length
    val ksub = cb(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    var base = 0
    while (s < m) {
      val codes = cb(s)
      var j = 0
      while (j < ksub) {
        val c = codes(j)
        var dot = 0.0
        var t = 0
        val d = math.min(c.length, math.max(0, v.length - base))
        while (t < d) { dot += (v(base + t) / n) * c(t); t += 1 }
        out(s * ksub + j) = dot
        j += 1
      }
      base += codes(0).length
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Asymmetric-distance score of one code row against one query
    * table: Σ_s table[s·ksub + code_s] ≈ cosine(query, reconstructed
    * vector). ksub is recovered from the shapes (table has m·ksub
    * entries, codes has m), so the expression needs no config. */
  def adc(table: org.apache.spark.sql.catalyst.util.ArrayData,
      codes: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val ksub = table.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }
}

/** Catalyst-native PQ encoder: `array<double>` vector in, m-element
  * `array<int>` of per-subspace codes out (null for zero-norm). The
  * codebook tensor rides as a plan reference object (m·ksub·dsub
  * doubles — kilobytes); codegen emits one static [[PqKernels]] call
  * per row so the encode projection stays inside WholeStageCodegen —
  * the batch half of the PQ index, shared by fit-time corpus encoding
  * and incremental (encode-new-batch-against-stored-codebooks)
  * maintenance, which are therefore the same function. */
case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need at least one subspace with at least one code")
  require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "all sub-centroids must share one subspace width")
  @transient private lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum))
  override def dataType: DataType = org.apache.spark.sql.types
    .ArrayType(org.apache.spark.sql.types.IntegerType,
      containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codebooks, normSq)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks,
      "double[][][]")
    val nsRef = ctx.addReferenceObj("pqNormSq", normSq, "double[][]")
    val codes = ctx.freshName("pqCodes")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.GenericArrayData $codes =
      |  graft.functions.PqKernels.encode($c, $cbRef, $nsRef);
      |if ($codes == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $codes; }
      |""".stripMargin)
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** Catalyst-native ADC table builder: `array<double>` query vector
  * in, m·ksub `array<double>` lookup table out (null for zero-norm).
  * One call per QUERY row — the expensive half of the ADC asymmetry. */
case class PqTableExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need at least one subspace with at least one code")
  require(codebooks.forall(_.length == codebooks(0).length),
    "all subspaces must share one ksub")
  override def dataType: DataType = org.apache.spark.sql.types
    .ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqKernels.table(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codebooks)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks,
      "double[][][]")
    val tab = ctx.freshName("pqTab")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.GenericArrayData $tab =
      |  graft.functions.PqKernels.table($c, $cbRef);
      |if ($tab == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $tab; }
      |""".stripMargin)
  }
  override def prettyName: String = "pq_table"
  override protected def withNewChildInternal(c: Expression): PqTableExpr =
    copy(child = c)
}

/** Asymmetric-distance score: (query table, code row) in, approximate
  * cosine out — m array lookups per pair, fully codegen'd, so the
  * candidate scan stays fused and each pair costs m adds instead of
  * the d multiplies a raw-vector scan pays. */
case class PqAdcScoreExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any, c: Any): Any =
    PqKernels.adc(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => s"""
      |${ev.value} = graft.functions.PqKernels.adc($t, $c);
      |""".stripMargin)
  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScoreExpr =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[Int8DotExpr]]: the exact integer dot product
  * of two int8-code vectors (stored as `array<int>` holding values
  * in [-127, 127]) as one tight JVM loop — the scoring inner loop of
  * the scalar-quantized MIPS scan. Exists because the HOF
  * formulation (`aggregate(zip_with(q, d, a·b), 0, +)`) evaluates as
  * an INTERPRETED expression tree with per-element lambda dispatch —
  * the measured 8–11× cost class that earned TopGramKernel and
  * IvfAssignKernel their kernels; the |Q|·N scoring scan is exactly
  * the shape that must stay fused. Sum is exact in long arithmetic
  * (|a_i·b_i| ≤ 127² = 16 129; any real dim fits), iteration runs
  * over min(len) ascending — for equal-length codes (the quantizer's
  * invariant) that is element-for-element the zip-fold's sum, which
  * is what the kernel≡HOF law in NsSimilaritySpec pins. The kernel is
  * only reached on equal lengths: [[Int8DotExpr]] returns NULL on a
  * dimension mismatch (round-13 ADVICE — the zip_with twin's
  * semantics; a truncated score must never rank). */
object Int8DotKernel {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }
}

/** Static kernel for [[VecDotExpr]]: the DOUBLE-precision dot
  * product of two numeric arrays as one tight JVM loop, widening
  * each element to double exactly like the HOF it replaces
  * (`aggregate(zip_with(toD(a), toD(b), x·y), 0.0, +)` — a
  * SEQUENTIAL left fold, so the kernel's ascending-index loop is the
  * IDENTICAL IEEE operation sequence and every cosine hash gate
  * stays bit-exact; law in NsSimilaritySpec). Exists because that
  * HOF is the interpreted per-element-lambda cost class (the
  * Int8Dot/TopGram/IvfAssign story) sitting in the hottest
  * similarity path of all: LSH candidate verification evaluates one
  * dot per CANDIDATE PAIR (r16 probe: ~40 s of ns07b's sf1 time).
  * Element types are resolved ONCE at bind time (the `code`s), not
  * per element. Null semantics mirror the HOF exactly: mismatched
  * lengths (zip_with pads with null) and null elements both yield
  * NULL. */
object VecDotKernel {
  // element accessor codes: 0 = double, 1 = float, 2 = int, 3 = long,
  // 4 = short, 5 = byte; decimal(p, s) rides as 10000 + p*100 + s
  // (r16 ADVICE #2: the HOF this kernel replaced accepted ANY
  // castable numeric element — short/byte/decimal embeddings must
  // keep computing, not fail analysis)
  def code(t: DataType): Int = t match {
    case DoubleType => 0
    case FloatType => 1
    case IntegerType => 2
    case LongType => 3
    case ShortType => 4
    case ByteType => 5
    case d: DecimalType => 10000 + d.precision * 100 + d.scale
    case other => throw new IllegalArgumentException(
      s"vec_dot: unsupported element type $other")
  }
  def supported(t: DataType): Boolean = t match {
    case DoubleType | FloatType | IntegerType | LongType | ShortType |
      ByteType => true
    case _: DecimalType => true
    case _ => false
  }
  private def get(a: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, c: Int): Double = c match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getInt(i).toDouble
    case 3 => a.getLong(i).toDouble
    case 4 => a.getShort(i).toDouble
    case 5 => a.getByte(i).toDouble
    case _ =>
      a.getDecimal(i, (c - 10000) / 100, (c - 10000) % 100).toDouble
  }
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      ca: Int, cb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ca) * get(b, i, cb)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Catalyst-native double dot product over numeric arrays — the
  * codegen'd twin of `Similarity.dot`'s sequential zip-fold. One
  * static [[VecDotKernel]] call per pair keeps the LSH-verify /
  * brute-force / IVF-probe scoring scans inside WholeStageCodegen. */
case class VecDotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(t, _) => VecDotKernel.supported(t)
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"vec_dot needs numeric arrays, got ${left.dataType} and " +
          s"${right.dataType}")
  }
  private lazy val codeL = VecDotKernel.code(
    left.dataType.asInstanceOf[ArrayType].elementType)
  private lazy val codeR = VecDotKernel.code(
    right.dataType.asInstanceOf[ArrayType].elementType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotKernel.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      codeL, codeR)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh per instance: several vec_dots can share one codegen
      // stage (cosine = three dots), and a fixed local would collide
      val r = ctx.freshName("vecDotRes")
      s"""
      |java.lang.Double $r =
      |  graft.functions.VecDotKernel.dot($a, $b, $codeL, $codeR);
      |if ($r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = $r.doubleValue();
      |}
      |""".stripMargin
    })
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Catalyst-native exact int8-code dot product: two `array<int>`
  * code vectors in, long sum of element products out. Codegen emits
  * one static [[Int8DotKernel]] call per pair so the |Q|·N MIPS
  * scoring scan stays inside WholeStageCodegen — no interpreted
  * per-element lambda dispatch in the hot path. */
case class Int8DotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // Length mismatch → NULL (round-13 ADVICE): the interpreted
  // zip_with/aggregate formulation this kernel replaced returned null
  // on mismatched dimensions, and a silently TRUNCATED dot product
  // would hand a wrong-dimension corpus row a plausible score that
  // could crack the top-k. Null sorts out of the ranking, same as the
  // HOF twin — so nullable is unconditionally true.
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else Int8DotKernel.dot(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.Int8DotKernel.dot($a, $b);
      |}
      |""".stripMargin)
  override def prettyName: String = "int8_dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int8DotExpr =
    copy(left = newLeft, right = newRight)
}

/** Compiled pattern set + single-pass scrub for [[PiiScrubExpr]].
  * One instance rides into generated code via `addReferenceObj`;
  * patterns compile lazily PER EXECUTOR (transient). Semantics are
  * exactly the sequential `regexp_count(cur) + regexp_replace(cur)`
  * fold it replaces: per pattern, count matches and replace them in
  * the SAME matcher pass over the text as left by the previous
  * pattern (Java regex — the engine Spark's own RegExpReplace uses;
  * replacements are literal-quoted exactly like the fold's literal
  * placeholder tokens). `witness` is a non-empty any-of character
  * set that every match of the pattern must contain (an '@' for
  * emails, a digit for number shapes): one indexOf-scan decides
  * whether the regex engine runs at all — exact, because a text
  * without any witness character cannot contain a match. */
final case class PiiScrubSpec(
    patterns: Seq[(String, String, String, String)]) extends Serializable {
  @transient private lazy val compiled: Array[(java.util.regex.Pattern,
      String, String)] =
    patterns.map { case (_, re, repl, wit) =>
      (java.util.regex.Pattern.compile(re),
        java.util.regex.Matcher.quoteReplacement(repl), wit)
    }.toArray
  private def witnessHit(s: String, wit: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (wit.indexOf(s.charAt(i).toInt) >= 0) return true
      i += 1
    }
    false
  }
  def scrub(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var cur = text.toString
    val n = compiled.length
    val out = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      val (p, qrepl, wit) = compiled(i)
      var cnt = 0L
      if (wit.isEmpty || witnessHit(cur, wit)) {
        val m = p.matcher(cur)
        if (m.find()) {
          val sb = new StringBuffer(cur.length)
          var more = true
          while (more) {
            cnt += 1
            m.appendReplacement(sb, qrepl)
            more = m.find()
          }
          m.appendTail(sb)
          cur = sb.toString
        }
      }
      out(i) = cnt
      i += 1
    }
    out(n) = UTF8String.fromString(cur)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** Catalyst-native PII scrub — the 10th kernel (r17, from the s04
  * stage probe: the scrub was +9.7 s of s04's 15.4 s at sf1, and it
  * runs on EVERY row of a training corpus). The fold it replaces
  * evaluated 2 regex passes per pattern (count on `cur`, replace on
  * `cur`) and materialized an intermediate string per replace — 10
  * engine passes + 5 materializations per document; this emits ONE
  * static call per row that counts WHILE replacing (5 passes worst
  * case, 0 when the witness scan clears the text) inside
  * WholeStageCodegen. Output struct: (n_<name>... per pattern,
  * redacted_text). Bit-exact to the fold (law in NsTextOpsSpec). */
case class PiiScrubExpr(child: Expression,
    patterns: Seq[(String, String, String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StructType(
    patterns.map(p =>
      StructField(s"n_${p._1}", LongType, nullable = false)) :+
      StructField("redacted_text", StringType))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"pii_scrub needs a string, got ${child.dataType}")
  private lazy val spec = PiiScrubSpec(patterns)
  override def nullSafeEval(t: Any): Any =
    spec.scrub(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("piiScrubSpec", spec,
      classOf[PiiScrubSpec].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $specRef.scrub($t);")
  }
  override def prettyName: String = "pii_scrub"
  override protected def withNewChildInternal(
      newChild: Expression): PiiScrubExpr = copy(child = newChild)
}

/** Static kernel for [[TokenSetCountExpr]]: one hash probe per
  * token. */
object TokenSetCountKernel {
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    val n = a.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }
}

/** Catalyst-native closed-set token counter (r18 — the 11th codegen
  * kernel): `array<string>` tokens in, count of elements present in
  * a fixed word set out (multiset semantics — every occurrence
  * counts; null elements never match; null array yields NULL) —
  * exactly `size(filter(toks, t => array_contains(array(lits), t)))`,
  * whose per-ELEMENT interpreted lambda re-built the literal array
  * for every token of every document (the s04 probe measured the
  * stopword/marker counts as ~6 s of the 10 s sf1 wall across
  * quality + langid gates). The set rides as ONE plan reference
  * object; codegen emits one static kernel call per row, one hash
  * probe per token. */
case class TokenSetCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"token_set_count needs array<string>, got $other")
    }
  @transient private lazy val set = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)): Unit)
    s
  }
  override def nullSafeEval(v: Any): Any =
    TokenSetCountKernel.count(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetCountKernel.count($c, " +
        s"$setRef);")
  }
  override def prettyName: String = "token_set_count"
  override protected def withNewChildInternal(
      newChild: Expression): TokenSetCountExpr = copy(child = newChild)
}

/** Static kernel for [[CurationGateExpr]]: the whole
  * quality-and-English gate in ONE pass. Every primitive is the SAME
  * one Spark's own expressions call — `UTF8String.trim/toLowerCase`
  * (StringTrim/Lower), `java.util.regex` with default flags
  * (RegExpReplace/RegExpCount/StringSplit), code-point counts
  * (Length) — so the kernel is semantics-identical to the Column
  * composition it fuses, including the NaN-comparison and
  * empty-string edge cases (equivalence law in NsTextOpsSpec). */
/** The five Gopher gate thresholds as a value, so the Column forms
  * (graft.ns.TextOps.qualityChecks) and the fused kernel read ONE
  * definition (r18 review — the kernel must not restate them). */
final case class GateThresholds(minChars: Int, maxChars: Int,
    minWords: Int, maxWords: Int, minAwl: Double, maxAwl: Double,
    maxPunct: Double, minStopword: Double)

object CurationGateKernel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Sp = java.util.regex.Pattern.compile(" ")
  private val Punct =
    java.util.regex.Pattern.compile("[^A-Za-z0-9\\s]")

  def gate(text: UTF8String, sw: java.util.HashSet[String],
      de: java.util.HashSet[String], fr: java.util.HashSet[String],
      es: java.util.HashSet[String], th: GateThresholds): Boolean = {
    val nChars = text.numChars()
    // normText: trimmed, lower-cased (UTF8String semantics — NOT
    // java.lang.String's locale-dependent toLowerCase), whitespace
    // collapsed with the exact `\s+` ASCII class regexp_replace uses
    val norm = Ws.matcher(text.trim().toLowerCase.toString)
      .replaceAll(" ")
    // split(" ", -1) — StringSplit keeps leading/trailing empties
    val toks = Sp.split(norm, -1)
    val nWords = toks.length
    var swN = 0; var deN = 0; var frN = 0; var esN = 0
    var nonSpace = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      nonSpace += t.codePointCount(0, t.length)
      if (sw.contains(t)) swN += 1
      if (de.contains(t)) deN += 1
      if (fr.contains(t)) frN += 1
      if (es.contains(t)) esN += 1
      i += 1
    }
    var punctN = 0
    val m = Punct.matcher(text.toString)
    while (m.find()) punctN += 1
    val awl = nonSpace.toDouble / nWords
    val punctRatio = punctN.toDouble / nChars // 0/0 → NaN → false
    val swRatio = swN.toDouble / nWords
    val quality = nChars >= th.minChars && nChars <= th.maxChars &&
      nWords >= th.minWords && nWords <= th.maxWords &&
      awl >= th.minAwl && awl <= th.maxAwl &&
      punctRatio <= th.maxPunct &&
      swRatio >= th.minStopword
    quality && swN >= deN && swN >= frN && swN >= esN && swN > 0
  }
}

/** Catalyst-native fused curation gate (r18 — the 12th codegen
  * kernel): `quality_score(text) == 1.0 AND lang_id(text) == 'en'`
  * as ONE boolean kernel call per row. Exists because the Column
  * composition re-evaluates its shared normText+split lineage per
  * consumer inside a codegen'd FILTER (FilterExec predicates get no
  * subexpression elimination, and predicate pushdown re-inlines any
  * pre-projected gate column): the s04 probe measured the composed
  * predicate at 6.5–8 s per sf1 pass interpreted (where CSE applies)
  * and ~15 s codegen'd — this kernel does one normalize, one split,
  * one token pass probing all four marker sets, one punct regex.
  * One deliberate divergence: on EMPTY text the composed form raises
  * DIVIDE_BY_ZERO under ANSI (punct-ratio denominator) where the
  * gate is definitionally false (chk_chars needs ≥ 50 chars) — the
  * kernel answers false (the law pins both behaviors). */
case class CurationGateExpr(child: Expression,
    stopwords: Seq[String], markersDe: Seq[String],
    markersFr: Seq[String], markersEs: Seq[String],
    thresholds: GateThresholds)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"curation_gate needs string, got $other")
    }
  private def toSet(ws: Seq[String]) = {
    val s = new java.util.HashSet[String](ws.size * 2)
    ws.foreach(w => s.add(w): Unit)
    s
  }
  @transient private lazy val swSet = toSet(stopwords)
  @transient private lazy val deSet = toSet(markersDe)
  @transient private lazy val frSet = toSet(markersFr)
  @transient private lazy val esSet = toSet(markersEs)
  override def nullSafeEval(v: Any): Any =
    CurationGateKernel.gate(v.asInstanceOf[UTF8String],
      swSet, deSet, frSet, esSet, thresholds)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val refs = Seq(swSet, deSet, frSet, esSet).map(s =>
      ctx.addReferenceObj("gateSet", s, "java.util.HashSet"))
    val thRef = ctx.addReferenceObj("gateThresholds", thresholds,
      classOf[GateThresholds].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CurationGateKernel.gate($c, " +
        refs.mkString(", ") + s", $thRef);")
  }
  override def prettyName: String = "curation_gate"
  override protected def withNewChildInternal(
      newChild: Expression): CurationGateExpr = copy(child = newChild)
}

/** Column-API entry points for graft's custom expressions. */
object functions {
  /** Repair python-repr "JSON" (single quotes, True/None, trailing
    * commas, stray CR/LF) into strict JSON; null on unparseable input. */
  def py_to_json(c: Column): Column =
    Shim.column(PyToJson(Shim.expression(c)))

  /** struct(gram, cnt, frac) of the most frequent word n-gram —
    * kernel-evaluated twin of TextOps.topGramCol. */
  def top_gram(c: Column, n: Int): Column =
    Shim.column(TopGramExpr(Shim.expression(c), n))

  /** Nearest-centroid cell of an array<double> vector (null for
    * zero-norm) — the IVF assignment kernel. */
  def ivf_assign(c: Column, centers: Array[Array[Double]]): Column =
    Shim.column(IvfAssignExpr(Shim.expression(c), centers))

  /** Per-language integer evidence sums over padded text — the
    * language-ID scoring kernel. */
  def lang_scores(c: Column, grams: Seq[(String, Seq[Long])],
      nLangs: Int): Column =
    Shim.column(LangScoreExpr(Shim.expression(c), grams, nLangs))

  /** Unicode NFC normalization (UAX #15), codegen'd — identical
    * output in every conformant engine by Unicode stabilization. */
  def nfc_normalize(c: Column): Column =
    Shim.column(NfcNormalizeExpr(Shim.expression(c)))

  /** NFKC + lowercase + NFKC (the NFKC_Casefold direction), codegen'd
    * — the strong dedup/match normalization tier. */
  def nfkc_casefold(c: Column): Column =
    Shim.column(NfkcCasefoldExpr(Shim.expression(c)))

  /** Per-subspace PQ codes of an array<double> vector (null for
    * zero-norm) — the product-quantization encode kernel. */
  def pq_encode(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Shim.column(PqEncodeExpr(Shim.expression(c), codebooks))

  /** m·ksub ADC lookup table for one query vector (null for
    * zero-norm) — the per-query half of asymmetric distance. */
  def pq_table(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Shim.column(PqTableExpr(Shim.expression(c), codebooks))

  /** Asymmetric-distance score of a code row against a query table —
    * m lookups per pair. */
  def pq_adc(table: Column, codes: Column): Column =
    Shim.column(PqAdcScoreExpr(Shim.expression(table),
      Shim.expression(codes)))

  /** Exact long dot product of two int8-code `array<int>` vectors —
    * the fused MIPS scoring kernel. */
  def int8_dot(a: Column, b: Column): Column =
    Shim.column(Int8DotExpr(Shim.expression(a), Shim.expression(b)))

  /** Double dot product of two numeric arrays (float widened to
    * double per element) — the fused similarity scoring kernel,
    * bit-identical to the sequential zip-fold it replaces. */
  def vec_dot(a: Column, b: Column): Column =
    Shim.column(VecDotExpr(Shim.expression(a), Shim.expression(b)))

  /** Single-pass sequential PII scrub: struct(n_<name>...,
    * redacted_text), one kernel call per row — bit-exact to the
    * regexp_count+regexp_replace fold. `patterns` rows are
    * (name, regex, literalReplacement, witnessAnyOfChars). */
  def pii_scrub(c: Column,
      patterns: Seq[(String, String, String, String)]): Column =
    Shim.column(PiiScrubExpr(Shim.expression(c), patterns))

  /** Count of tokens present in a closed word set (multiset — every
    * occurrence counts), the fused form of
    * `size(filter(toks, t => array_contains(array(lits...), t)))`. */
  def token_set_count(tokens: Column, words: Seq[String]): Column =
    Shim.column(TokenSetCountExpr(Shim.expression(tokens), words))

  /** The fused quality+English curation gate — one kernel call per
    * row, equal to `quality_score == 1.0 AND lang_id == 'en'`. */
  def curation_gate(text: Column, stopwords: Seq[String],
      de: Seq[String], fr: Seq[String], es: Seq[String],
      thresholds: GateThresholds): Column =
    Shim.column(CurationGateExpr(Shim.expression(text),
      stopwords, de, fr, es, thresholds))
}
