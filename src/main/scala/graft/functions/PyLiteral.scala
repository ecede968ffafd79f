package graft.functions

/** Repair of "dirty" Python-repr JSON (SURVEY.md §2.2 O9): API payloads
  * written as `str(dict)` — single-quoted strings, `True/False/None`
  * literals, trailing commas, stray CR/LF — normalized to strict JSON.
  *
  * Reference behavior (cited, not copied): the reference strips `[\n\r]`
  * then round-trips through `ast.literal_eval` + `json.dumps`
  * (/root/reference/dags/sandbox_data_pipeline.py:123-126); its golden
  * test pair lives at
  * /root/reference/tests/test_sandbox_data_pipeline.py:45-48.
  *
  * This is a real recursive-descent parser over the Python literal
  * grammar subset (dict/list/tuple/str/num/bool/None), not a quote-swap
  * regex — embedded quotes and escapes are handled, matching what
  * `ast.literal_eval ∘ json.dumps` produces.
  */
object PyLiteral {

  /** Full repair: strip CR/LF, then python-literal → strict JSON.
    * Throws IllegalArgumentException on unparseable input. */
  def repair(dirty: String): String =
    toJson(dirty.replaceAll("[\\n\\r]", ""))

  /** Null-safe repair: null/blank/bad input → null (ingest-friendly). */
  def repairOrNull(dirty: String): String =
    if (dirty == null) null
    else try repair(dirty) catch { case _: IllegalArgumentException => null }

  /** Parse one Python literal and emit compact JSON (json.dumps-style
    * with ", " / ": " separators to match the reference golden output). */
  def toJson(s: String): String = {
    val p = new Parser(s)
    p.skipWs()
    val sb = new StringBuilder
    p.value(sb)
    p.skipWs()
    if (!p.eof) p.fail("trailing characters")
    sb.toString
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PyLiteral: $msg at $i in: $s")
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (eof) fail("unexpected end") else s.charAt(i)
    private def next(): Char = { val c = peek; i += 1; c }
    private def expect(c: Char): Unit =
      if (next() != c) fail(s"expected '$c'")

    def value(sb: StringBuilder): Unit = {
      skipWs()
      peek match {
        case '{' => dict(sb)
        case '[' => seq(sb, '[', ']')
        case '(' => seq(sb, '(', ')') // tuple → JSON array
        case '\'' | '"' => str(sb)
        case c if c == '-' || c == '+' || c.isDigit || c == '.' => num(sb)
        case 'T' => word("True"); sb.append("true")
        case 'F' => word("False"); sb.append("false")
        case 'N' => word("None"); sb.append("null")
        case c => fail(s"unexpected '$c'")
      }
    }

    private def word(w: String): Unit = {
      if (!s.startsWith(w, i)) fail(s"expected $w")
      i += w.length
    }

    private def dict(sb: StringBuilder): Unit = {
      expect('{'); sb.append('{'); skipWs()
      var first = true
      while (peek != '}') {
        if (!first) { expect(','); skipWs(); if (peek == '}') {
          // trailing comma
        } else { sb.append(", ") } }
        if (peek != '}') {
          if (first) first = false
          str(sb) // python dict keys in this payload domain are strings
          skipWs(); expect(':'); sb.append(": ")
          value(sb); skipWs()
        }
      }
      expect('}'); sb.append('}')
    }

    private def seq(sb: StringBuilder, open: Char, close: Char): Unit = {
      expect(open); sb.append('['); skipWs()
      var first = true
      while (peek != close) {
        if (!first) { expect(','); skipWs(); if (peek == close) {
          // trailing comma
        } else sb.append(", ") }
        if (peek != close) {
          if (first) first = false
          value(sb); skipWs()
        }
      }
      expect(close); sb.append(']')
    }

    /** One decoded char → its json.dumps(ensure_ascii=True) spelling. */
    private def emitChar(sb: StringBuilder, c: Char): Unit = c match {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }

    private def str(sb: StringBuilder): Unit = {
      val quote = next()
      if (quote != '\'' && quote != '"') fail("expected string")
      sb.append('"')
      var done = false
      while (!done) {
        val c = next()
        if (c == quote) done = true
        else if (c == '\\') {
          val e = next()
          e match {
            case '\'' => emitChar(sb, '\'')
            case '"'  => emitChar(sb, '"')
            case '\\' => emitChar(sb, '\\')
            case 'n'  => emitChar(sb, '\n')
            case 'r'  => emitChar(sb, '\r')
            case 't'  => emitChar(sb, '\t')
            case 'b'  => emitChar(sb, '\b')
            case 'f'  => emitChar(sb, '\f')
            case 'a'  => emitChar(sb, 7.toChar)  // \a BEL
            case 'v'  => emitChar(sb, 11.toChar) // \v VT
            case 'u'  =>
              val h = new StringBuilder
              var k = 0
              while (k < 4) { h.append(next()); k += 1 }
              emitChar(sb, Integer.parseInt(h.toString, 16).toChar)
            case 'x'  =>
              val h = new StringBuilder
              h.append(next()).append(next())
              emitChar(sb, Integer.parseInt(h.toString, 16).toChar)
            case d if d >= '0' && d <= '7' =>
              // Python octal escape: up to 3 octal digits.
              var v = d - '0'
              var k = 1
              while (k < 3 && !eof && s.charAt(i) >= '0' &&
                s.charAt(i) <= '7') { v = v * 8 + (next() - '0'); k += 1 }
              emitChar(sb, v.toChar)
            // Python keeps unrecognized escapes as backslash+char.
            case other => emitChar(sb, '\\'); emitChar(sb, other)
          }
        } else emitChar(sb, c)
      }
      sb.append('"')
    }

    private def num(sb: StringBuilder): Unit = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
        ((s.charAt(i) == '-' || s.charAt(i) == '+') &&
          (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
      if (i == start) fail("bad number")
      val tok = s.substring(start, i)
      val unsigned = if (tok.startsWith("+")) tok.substring(1) else tok
      // json.dumps emits ints verbatim (arbitrary precision) but floats
      // through Python float.__repr__ — reproduce that split exactly.
      if (unsigned.exists(c => c == '.' || c == 'e' || c == 'E'))
        sb.append(pyFloatRepr(unsigned.toDouble))
      else sb.append(unsigned)
    }
  }

  /** Python `float.__repr__` reconstruction: shortest round-trip
    * digits rendered fixed-point for decimal exponents in [-4, 16),
    * scientific (`d.ddde±EE`, two-digit zero-padded exponent)
    * outside. Digit strings come from Java's Double.toString, which
    * is round-trip-minimal for the short decimals that occur in API
    * payloads — the domain this repair exists for. */
  private[functions] def pyFloatRepr(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, "non-finite literal")
    val neg = d < 0.0 || (d == 0.0 && 1.0 / d < 0.0)
    val js = java.lang.Double.toString(math.abs(d))
    val (mant, exp) = js.split('E') match {
      case Array(m) => (m, 0)
      case Array(m, e) => (m, e.toInt)
    }
    val dot = mant.indexOf('.')
    val rawDigits = mant.replace(".", "")
    val lead = rawDigits.indexWhere(_ != '0') match {
      case -1 => 0
      case k => k
    }
    val digits = rawDigits.drop(lead)
      .reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case ds => ds
    }
    val sign = if (neg) "-" else ""
    if (digits == "0") return sign + "0.0"
    // pointPos: decimal-point position within `digits`
    val pointPos = dot + exp - lead
    val e10 = pointPos - 1
    if (e10 >= 16 || e10 < -4) {
      val m = if (digits.length == 1) digits
        else digits.head + "." + digits.tail
      f"$sign$m%se${if (e10 >= 0) "+" else "-"}${math.abs(e10)}%02d"
    } else if (pointPos <= 0) {
      sign + "0." + ("0" * -pointPos) + digits
    } else if (pointPos >= digits.length) {
      sign + digits + ("0" * (pointPos - digits.length)) + ".0"
    } else {
      sign + digits.take(pointPos) + "." + digits.drop(pointPos)
    }
  }
}
