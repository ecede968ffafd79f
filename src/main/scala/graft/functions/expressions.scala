package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
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
}
