package graft.ns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data curation (SURVEY.md
  * §2.8 [NS]): token counting, document quality scoring, language
  * identification, and shingle fingerprinting.
  *
  * Everything here is a narrow, map-side-only projection — no
  * shuffles at all — so the operators scale embarrassingly: each
  * executor scores its own partition of documents and the plan stays
  * inside one WholeStageCodegen span. Quality heuristics follow the
  * published Gopher data-curation rules (Rae et al. 2021, "Scaling
  * Language Models", appendix A1.1) in spirit: length bounds,
  * word-shape bounds, symbol ratios, stop-word presence.
  */
object TextOps {

  /** Small closed-class marker sets. English set doubles as the
    * quality filter's stop-word list. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  val markersDe: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val markersFr: Seq[String] =
    Seq("le", "les", "et", "est", "dans", "une", "pour")
  val markersEs: Seq[String] =
    Seq("el", "los", "las", "y", "es", "una", "por")

  /** Whitespace word tokens of the canonical text. */
  def wordTokens(c: Column): Column = split(Dedup.normText(c), " ")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — the standard
    * cheap stand-in for a real tokenizer's token count. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Tokens present in a closed word set, every occurrence counted —
    * via the codegen'd [[graft.functions.TokenSetCountExpr]] kernel
    * (r18): the previous `size(filter(toks, t => array_contains(
    * array(lits), t)))` form re-built the literal array in an
    * interpreted lambda PER TOKEN, and the s04 probe measured the
    * stopword/marker counts as the dominant stage of the curation
    * gates (~6 s of 10 s at sf1). Same semantics, hash gates
    * unchanged (equivalence law in NsTextOpsSpec). */
  private def countIn(tokens: Column, words: Seq[String]): Column =
    graft.functions.functions.token_set_count(tokens, words)

  /** Per-document surface statistics. Output: (idCol, n_chars,
    * n_words, n_bpe_tokens, avg_word_len, punct_ratio,
    * stopword_ratio). */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wordTokens(col(textCol))
    val nWords = size(toks)
    val nChars = length(col(textCol))
    df.select(col(idCol),
      nChars.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      bpeTokenCount(col(textCol)).cast("long").as("n_bpe_tokens"),
      (length(regexp_replace(Dedup.normText(col(textCol)), " ", ""))
        .cast("double") / nWords).as("avg_word_len"),
      (regexp_count(col(textCol), lit("[^A-Za-z0-9\\s]")).cast("double")
        / nChars).as("punct_ratio"),
      (countIn(toks, stopwordsEn).cast("double") / nWords)
        .as("stopword_ratio"))
  }

  /** The five Gopher gate thresholds — ONE definition shared by the
    * DataFrame form ([[qualityScore]]), the Column form
    * ([[qualityScoreCol]]), AND the fused kernel
    * ([[curationGateCol]], via [[GateThresholds]] — r18 review: the
    * kernel must not restate these as literals in another file), so
    * a threshold change can't make the gates drift. */
  private[graft] val gateThresholds = graft.functions.GateThresholds(
    minChars = 50, maxChars = 100000,
    minWords = 10, maxWords = 50000,
    minAwl = 2.0, maxAwl = 12.0,
    maxPunct = 0.2, minStopword = 0.01)

  /** Given the five stats columns, the named boolean checks in
    * order, from [[gateThresholds]]. */
  private def qualityChecks(nChars: Column, nWords: Column,
      avgWordLen: Column, punctRatio: Column,
      stopwordRatio: Column): Seq[(String, Column)] = {
    val t = gateThresholds
    Seq(
      "chk_chars" -> nChars.between(t.minChars, t.maxChars),
      "chk_words" -> nWords.between(t.minWords, t.maxWords),
      "chk_avg_word_len" -> avgWordLen.between(t.minAwl, t.maxAwl),
      "chk_punct" -> (punctRatio <= t.maxPunct),
      "chk_stopwords" -> (stopwordRatio >= t.minStopword))
  }

  private def scoreOf(checks: Seq[(String, Column)]): Column =
    checks.map { case (_, c) => c.cast("int") }
      .reduce(_ + _).cast("double") / checks.size

  /** [[qualityScore]]'s final score as a pure COLUMN, for pipelines
    * that can't join (a streaming select, a single-projection filter).
    * Same five checks as the DataFrame form — shared via
    * [[qualityChecks]], and the agreement is additionally a tested
    * law (NsTextOpsSpec), so the two can gate interchangeably. */
  def qualityScoreCol(text: Column): Column = {
    val norm = Dedup.normText(text)
    val toks = split(norm, " ")
    val nWords = size(toks)
    val nChars = length(text)
    val awl = length(regexp_replace(norm, " ", "")).cast("double") / nWords
    val punct =
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / nChars
    val sw = countIn(toks, stopwordsEn).cast("double") / nWords
    scoreOf(qualityChecks(nChars, nWords, awl, punct, sw))
  }

  /** The fused curation gate: EXACTLY
    * `qualityScoreCol(text) === 1.0 && langIdCol(text) === "en"`,
    * as ONE codegen'd kernel call per row
    * ([[graft.functions.CurationGateExpr]]; equivalence law in
    * NsTextOpsSpec). Use THIS form inside filters: a codegen'd
    * FilterExec predicate gets no subexpression elimination, so the
    * composed form re-evaluates its shared normalize+split lineage
    * per check there (~2–4× the gate's one-pass cost at sf1 — the
    * r18 s04 probe). The Column composition stays for projections,
    * where codegen CSE already shares the lineage. */
  def curationGateCol(text: Column): Column =
    graft.functions.functions.curation_gate(text,
      stopwordsEn, markersDe, markersFr, markersEs, gateThresholds)

  /** [[langId]]'s prediction as a pure COLUMN (same marker sets, same
    * preference order). */
  def langIdCol(text: Column): Column = {
    val toks = split(Dedup.normText(text), " ")
    val en = countIn(toks, stopwordsEn)
    val de = countIn(toks, markersDe)
    val fr = countIn(toks, markersFr)
    val es = countIn(toks, markersEs)
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Gopher-style quality gate over [[textStats]]: five boolean checks
    * plus the fraction passed as a score. A training pipeline keeps
    * documents with quality_score = 1.0 (or a chosen cut). */
  def qualityScore(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val s = textStats(df, idCol, textCol)
    val checks = qualityChecks(col("n_chars"), col("n_words"),
      col("avg_word_len"), col("punct_ratio"), col("stopword_ratio"))
    val withChecks = checks.foldLeft(s) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    withChecks.withColumn("quality_score",
      scoreOf(checks.map { case (n, _) => n -> col(n) }))
  }

  /** Marker-token language identification: count hits from each
    * language's closed-class marker set, take the argmax with a fixed
    * preference order (en, de, fr, es), 'und' when nothing hits.
    * Pure heuristic — by design cheap, deterministic, and expressible
    * in ANSI SQL for the oracle. Output: (idCol, lang_pred).
    * Kept as the cheap fallback; the production path is the
    * char-bigram profile classifier [[langProfile]]. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), langIdCol(col(textCol)).as("lang_pred"))

  /** Checked-in char-bigram log-evidence table for the profile
    * language classifier, in integer micro-units (the ns73 weight
    * idiom: integer sums are associative, so scores are bit-exact on
    * any engine or partitioning). One row per bigram over the
    * space-padded normalized text; the four weights are (en, de, fr,
    * es). Values are hand-set from public letter-pair frequency
    * knowledge (Cavnar–Trenkle-style n-gram profiles, shrunk to the
    * discriminating pairs); shared VERBATIM with the oracle SQL,
    * which interpolates this table into its CASE arm
    * ([[graft.oracles.NsTextOracles]]) so the two cannot drift.
    * Swapping in trained profiles is a data change, not a plan
    * change (same contract as ns73's weights). */
  val langProfileGrams: Seq[(String, Seq[Long])] = Seq(
    // strongly English: th/wh/gh/ng/ck pairs, 'the'/'of' boundaries
    "th" -> Seq(90000L, 5000L, 0L, 0L),
    "he" -> Seq(50000L, 15000L, 0L, 0L),
    "wh" -> Seq(60000L, 0L, 0L, 0L),
    "gh" -> Seq(40000L, 0L, 0L, 0L),
    "ck" -> Seq(30000L, 25000L, 0L, 0L),
    "ng" -> Seq(40000L, 15000L, 0L, 0L),
    "of" -> Seq(45000L, 5000L, 0L, 0L),
    "ed" -> Seq(30000L, 5000L, 0L, 0L),
    "is" -> Seq(25000L, 20000L, 0L, 10000L),
    "it" -> Seq(25000L, 10000L, 10000L, 5000L),
    " w" -> Seq(35000L, 25000L, 0L, 0L),
    "y " -> Seq(35000L, 0L, 0L, 25000L),
    "w " -> Seq(45000L, 0L, 0L, 0L),
    "ow" -> Seq(50000L, 0L, 0L, 0L),
    "sh" -> Seq(45000L, 5000L, 0L, 0L),
    "ry" -> Seq(40000L, 0L, 0L, 0L),
    "rt" -> Seq(35000L, 10000L, 5000L, 10000L),
    "rg" -> Seq(25000L, 5000L, 5000L, 5000L),
    "ta" -> Seq(25000L, 10000L, 15000L, 20000L),
    "or" -> Seq(30000L, 10000L, 20000L, 25000L),
    "ha" -> Seq(35000L, 25000L, 5000L, 10000L),
    "nd" -> Seq(35000L, 30000L, 5000L, 5000L),
    "jo" -> Seq(25000L, 0L, 5000L, 10000L),
    "lu" -> Seq(20000L, 5000L, 10000L, 10000L),
    "sm" -> Seq(25000L, 0L, 0L, 0L),
    "in" -> Seq(30000L, 25000L, 15000L, 10000L),
    "at" -> Seq(30000L, 10000L, 10000L, 15000L),
    "ro" -> Seq(25000L, 10000L, 15000L, 15000L),
    // strongly German: ich/sch/ei/tz clusters, -en endings, umlauts
    "ch" -> Seq(25000L, 60000L, 15000L, 20000L),
    "ei" -> Seq(10000L, 60000L, 5000L, 10000L),
    "ie" -> Seq(15000L, 50000L, 20000L, 15000L),
    "sc" -> Seq(20000L, 40000L, 5000L, 5000L),
    "tz" -> Seq(0L, 50000L, 0L, 0L),
    "zu" -> Seq(0L, 45000L, 0L, 0L),
    "un" -> Seq(15000L, 40000L, 25000L, 25000L),
    "ge" -> Seq(20000L, 35000L, 10000L, 10000L),
    "be" -> Seq(15000L, 35000L, 0L, 5000L),
    "mi" -> Seq(10000L, 30000L, 5000L, 15000L),
    "ä" -> Seq(0L, 60000L, 0L, 0L),
    "ö" -> Seq(0L, 60000L, 0L, 0L),
    "ü" -> Seq(0L, 60000L, 0L, 0L),
    "ß" -> Seq(0L, 80000L, 0L, 0L),
    // strongly French: qu/oi/eu/ux pairs, c-cedilla, accents
    "qu" -> Seq(20000L, 0L, 45000L, 35000L),
    "oi" -> Seq(5000L, 0L, 60000L, 0L),
    "eu" -> Seq(0L, 15000L, 55000L, 5000L),
    "ux" -> Seq(0L, 0L, 60000L, 0L),
    "ai" -> Seq(10000L, 0L, 45000L, 10000L),
    "ou" -> Seq(20000L, 0L, 45000L, 10000L),
    "es" -> Seq(15000L, 10000L, 35000L, 40000L),
    "le" -> Seq(15000L, 10000L, 40000L, 15000L),
    "ç" -> Seq(0L, 0L, 70000L, 0L),
    "è" -> Seq(0L, 0L, 65000L, 0L),
    "é" -> Seq(0L, 0L, 55000L, 25000L),
    "à" -> Seq(0L, 0L, 65000L, 0L),
    // strongly Spanish: ll/rr doubles, -os/-ue endings, ñ, ó/í
    "ll" -> Seq(15000L, 5000L, 15000L, 55000L),
    "rr" -> Seq(0L, 0L, 10000L, 50000L),
    "os" -> Seq(10000L, 5000L, 5000L, 50000L),
    "ue" -> Seq(25000L, 10000L, 20000L, 40000L),
    "ad" -> Seq(10000L, 0L, 5000L, 35000L),
    "ar" -> Seq(10000L, 10000L, 15000L, 35000L),
    " y" -> Seq(10000L, 0L, 5000L, 40000L),
    "ñ" -> Seq(0L, 0L, 0L, 80000L),
    "ó" -> Seq(0L, 0L, 0L, 60000L),
    "í" -> Seq(0L, 0L, 0L, 60000L),
    // shared-but-weighted everyday pairs
    "en" -> Seq(20000L, 35000L, 25000L, 25000L),
    "er" -> Seq(25000L, 35000L, 20000L, 20000L),
    "an" -> Seq(25000L, 20000L, 20000L, 20000L),
    "on" -> Seq(20000L, 5000L, 35000L, 25000L),
    "nt" -> Seq(20000L, 10000L, 35000L, 20000L),
    "re" -> Seq(25000L, 15000L, 30000L, 15000L),
    "de" -> Seq(10000L, 30000L, 35000L, 35000L),
    "la" -> Seq(5000L, 5000L, 35000L, 35000L),
    "st" -> Seq(30000L, 30000L, 5000L, 10000L),
    "to" -> Seq(30000L, 0L, 5000L, 15000L))

  /** Mojibake confusion table: UTF-8 byte sequences mis-decoded as
    * cp1252 (the classic web-corpus defect — ftfy's core case),
    * checked in as (mojibake, repaired) CODEPOINT sequences. Longest
    * patterns first (the E2-prefix triples before the C3/C2 pairs)
    * so a punctuation triple is never half-eaten by a pair rule.
    * Bytes 0xA0/0xAD/0x9D have no cp1252 glyph and surface as
    * U+00A0/U+00AD/U+009D — they appear here as explicit codepoints,
    * and the oracle SQL is generated from THIS table as chr() concat
    * chains, so both engines read the exact same sequences
    * ([[graft.oracles.NsTextOracles]]). */
  val mojibakeTable: Seq[(String, String)] = Seq(
    // Generated (tools-style, checked in) from the "sloppy"
    // cp1252 round-trip: UTF-8 bytes of the target char decoded
    // as cp1252 with unmapped bytes (0x81/8D/8F/90/9D) passed
    // through as U+00XX. The target set is the common-web base
    // (curly punctuation, the Latin-1 letters of en/de/fr/es,
    // nbsp/symbol pairs) CLOSED over its own pattern characters,
    // so k-times-encoded text repairs one full layer per pass.
    // Longest patterns first; written as \u escapes because
    // several chars are invisible (nbsp, soft hyphen, 0x9D).
    "\u00E2\u20AC\u201C" -> "\u2013", // –
    "\u00E2\u20AC\u201D" -> "\u2014", // —
    "\u00E2\u20AC\u02DC" -> "\u2018", // ‘
    "\u00E2\u20AC\u2122" -> "\u2019", // ’
    "\u00E2\u20AC\u0161" -> "\u201A", // ‚
    "\u00E2\u20AC\u0153" -> "\u201C", // “
    "\u00E2\u20AC\u009D" -> "\u201D", // ”
    "\u00E2\u20AC\u017E" -> "\u201E", // „
    "\u00E2\u20AC\u00A0" -> "\u2020", // †
    "\u00E2\u20AC\u00A2" -> "\u2022", // •
    "\u00E2\u20AC\u00A6" -> "\u2026", // …
    "\u00E2\u20AC\u00B9" -> "\u2039", // ‹
    "\u00E2\u201A\u00AC" -> "\u20AC", // €
    "\u00E2\u201E\u00A2" -> "\u2122", // ™
    "\u00C2\u009D" -> "\u009D", // 
    "\u00C2\u00A0" -> "\u00A0", // U+00A0
    "\u00C2\u00A1" -> "\u00A1", // ¡
    "\u00C2\u00A2" -> "\u00A2", // ¢
    "\u00C2\u00A4" -> "\u00A4", // ¤
    "\u00C2\u00A6" -> "\u00A6", // ¦
    "\u00C2\u00A7" -> "\u00A7", // §
    "\u00C2\u00A8" -> "\u00A8", // ¨
    "\u00C2\u00A9" -> "\u00A9", // ©
    "\u00C2\u00AA" -> "\u00AA", // ª
    "\u00C2\u00AB" -> "\u00AB", // «
    "\u00C2\u00AC" -> "\u00AC", // ¬
    "\u00C2\u00AD" -> "\u00AD", // ­
    "\u00C2\u00AE" -> "\u00AE", // ®
    "\u00C2\u00AF" -> "\u00AF", // ¯
    "\u00C2\u00B0" -> "\u00B0", // °
    "\u00C2\u00B1" -> "\u00B1", // ±
    "\u00C2\u00B3" -> "\u00B3", // ³
    "\u00C2\u00B4" -> "\u00B4", // ´
    "\u00C2\u00B6" -> "\u00B6", // ¶
    "\u00C2\u00B8" -> "\u00B8", // ¸
    "\u00C2\u00B9" -> "\u00B9", // ¹
    "\u00C2\u00BA" -> "\u00BA", // º
    "\u00C2\u00BB" -> "\u00BB", // »
    "\u00C2\u00BC" -> "\u00BC", // ¼
    "\u00C2\u00BE" -> "\u00BE", // ¾
    "\u00C3\u201A" -> "\u00C2", // Â
    "\u00C3\u0192" -> "\u00C3", // Ã
    "\u00C3\u2026" -> "\u00C5", // Å
    "\u00C3\u2020" -> "\u00C6", // Æ
    "\u00C3\u2039" -> "\u00CB", // Ë
    "\u00C3\u0178" -> "\u00DF", // ß
    "\u00C3\u00A0" -> "\u00E0", // à
    "\u00C3\u00A1" -> "\u00E1", // á
    "\u00C3\u00A2" -> "\u00E2", // â
    "\u00C3\u00A4" -> "\u00E4", // ä
    "\u00C3\u00A7" -> "\u00E7", // ç
    "\u00C3\u00A8" -> "\u00E8", // è
    "\u00C3\u00A9" -> "\u00E9", // é
    "\u00C3\u00AA" -> "\u00EA", // ê
    "\u00C3\u00AB" -> "\u00EB", // ë
    "\u00C3\u00AD" -> "\u00ED", // í
    "\u00C3\u00AE" -> "\u00EE", // î
    "\u00C3\u00AF" -> "\u00EF", // ï
    "\u00C3\u00B1" -> "\u00F1", // ñ
    "\u00C3\u00B3" -> "\u00F3", // ó
    "\u00C3\u00B4" -> "\u00F4", // ô
    "\u00C3\u00B6" -> "\u00F6", // ö
    "\u00C3\u00B9" -> "\u00F9", // ù
    "\u00C3\u00BA" -> "\u00FA", // ú
    "\u00C3\u00BB" -> "\u00FB", // û
    "\u00C3\u00BC" -> "\u00FC", // ü
    "\u00C5\u201C" -> "\u0153", // œ
    "\u00C5\u00A1" -> "\u0161", // š
    "\u00C5\u00B8" -> "\u0178", // Ÿ
    "\u00C5\u00BE" -> "\u017E", // ž
    "\u00C6\u2019" -> "\u0192", // ƒ
    "\u00CB\u0153" -> "\u02DC", // ˜
    "\u0020" -> "\u0020") // U+0020

  /** "Sloppy" cp1252 decode of a string's UTF-8 bytes — the fixture
    * util that MANUFACTURES mojibake (what a lenient web decoder
    * does to UTF-8 content): each byte through cp1252, the five
    * unmapped bytes (0x81/8D/8F/90/9D) passed through as U+00XX.
    * Java's decoder yields U+FFFD for those, hence the explicit
    * fallback. Applying this k times builds k-times-encoded text;
    * [[repairMojibakeCol]] with `passes` >= k inverts it exactly for
    * every char covered by [[mojibakeTable]]. */
  def sloppyCp1252(s: String): String = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map { b =>
      val d = new String(Array(b), cs)
      if (d == "\uFFFD") (b & 0xff).toChar else d.charAt(0)
    }.mkString
  }

  /** The planted repair fixture tail (clean form) shared by the
    * ns122 gate and its oracle generator: accents, curly
    * punctuation, nbsp-adjacent symbols — one char per rule family.
    */
  val mojibakeFixtureTail: String =
    " café naïve zürich façade – “quoted”… ©2026 señor°"

  /** Mojibake/encoding repair — curation stage 0.5, between raw
    * extraction and the quality gates (double-encoded text tanks
    * every downstream signal: token counts, n-gram profiles, dedup
    * fingerprints). One literal-`replace` chain per pass over
    * [[mojibakeTable]] — codegen'd string ops, no regex, no UDF,
    * zero shuffles — applied `passes` times because k-times-encoded
    * text repairs one layer per pass (the "ÃƒÂ©" cascade: each pass
    * peels one mis-decode). Clean text is a fixed point, so the
    * stage is safe to run unconditionally; `passes` = 2 covers the
    * double-encode, the worst case seen in practice.
    *
    * Fast path (r17 — the p05 stage probe found this chain was ~8.7 s
    * of p05's ~14 s at sf1): every occurrence of a table key contains
    * every character of that key, so ONE witness character per rule —
    * the rule's first non-ASCII char, chosen over the head because
    * one key LEADS with a plain space, which would mark every
    * document dirty — is a sound containment test: a document
    * containing no witness character cannot match any rule in any
    * pass (pass 1 is then the identity, so later passes are too).
    * One `translate` scan decides, and the ~140-replace chain (each
    * replace a full materializing pass over the string) runs only on
    * rows that might actually be dirty. On a clean corpus (the
    * overwhelming case at 100 TB) the stage collapses to a single
    * scan; guarded ≡ unguarded bit-exactly (the ns122 gate's
    * every-row-dirty fixture still drives the chain). */
  def repairMojibakeCol(text: Column, passes: Int = 2): Column = {
    require(passes >= 1, "passes must be positive")
    // the closure generation leaves IDENTITY rules (" " -> " ") in
    // the table — semantic no-ops that would still cost a full
    // materializing replace pass each AND (space!) defeat the
    // witness guard below; provably droppable (replace(x, a, a) ≡ x)
    val rules = mojibakeTable.filter { case (bad, good) => bad != good }
    val witnesses = rules
      .map(r => r._1.find(_ >= 0x80.toChar).getOrElse(r._1.head))
      .distinct.mkString
    val chain = (1 to passes).foldLeft(text) { case (c, _) =>
      rules.foldLeft(c) { case (acc, (bad, good)) =>
        replace(acc, lit(bad), lit(good)) }
    }
    when(length(translate(text, witnesses, "")) === length(text), text)
      .otherwise(chain)
  }

  /** DataFrame form of [[repairMojibakeCol]] with the audit column a
    * scrub pass reports: `n_removed` = chars dropped by the repair
    * (every rule maps k>=2 chars to 1, so the length delta counts
    * repaired sequences weighted by their depth — 0 means the doc
    * was clean). Output: (idCol, repaired_text, n_removed). */
  def repairMojibake(df: DataFrame, idCol: String, textCol: String,
      passes: Int = 2): DataFrame = {
    val fixed = repairMojibakeCol(col(textCol), passes)
    df.select(col(idCol), fixed.as("repaired_text"),
      (length(col(textCol)) - length(fixed)).cast("long").as("n_removed"))
  }

  /** Planted NFC fixture tails, one per doc_id%4 class — each class
    * exercises one arm of UAX #15 composition (shared by the ns127
    * gate and its oracle generator, which rebuilds the SAME code
    * points with chr() chains so both engines normalize identical
    * inputs):
    *  0. NFD-decomposed Latin (base + combining marks) — composes;
    *  1. precomposed Latin — the already-NFC fixed point;
    *  2. canonical singletons (U+212B ANGSTROM→Å, U+2126 OHM→Ω) plus
    *     out-of-order marks (acute ccc=230 BEFORE dot-below ccc=220,
    *     which canonical ordering must swap before composing);
    *  3. Hangul jamo — algorithmic LVT composition to syllables. */
  val nfcFixtureTails: Seq[String] = Seq(
    " cafe\u0301 nai\u0308ve pin\u0303ata u\u0308ber",
    " caf\u00E9 na\u00EFve pi\u00F1ata \u00FCber",
    " \u212B\u2126 e\u0301\u0323x",
    " \u1112\u1161\u11AB\u1100\u1173\u11AF")

  /** Planted NFKC_Casefold fixture tails, one (input, expected) pair
    * per doc_id%4 class — each class exercises one compatibility/case
    * arm (shared by the ns159 gate and its oracle generator, which
    * rebuilds BOTH sides with chr() chains — DuckDB has no NFKC, so
    * the expected side is a closed-form prediction, the ns122/ns154
    * convention):
    *  0. full-width ASCII + ideographic space — compatibility forms
    *     collapse to plain ASCII, then case folds;
    *  1. ligatures (ﬁﬂ), Roman-numeral compatibility char (Ⅸ),
    *     superscripts — expand/decompose THEN fold (Ⅸ→IX→ix: the
    *     order-sensitivity trap a fold-then-NFKC impl gets wrong);
    *  2. NFD-decomposed uppercase Latin — composes AND folds (the
    *     NFC tier alone leaves the case distinction);
    *  3. half-width katakana with voiced-sound marks — composes to
    *     full-width (case-stable: no Latin to fold). */
  val nfkcCfFixtureTails: Seq[(String, String)] = Seq(
    (" \uFF28\uFF45\uFF2C\uFF2C\uFF4F\u3000" +
      "\uFF57\uFF4F\uFF52\uFF4C\uFF44\uFF11\uFF12\uFF13",
      " hello world123"),
    (" \uFB01\uFB02 \u2168 x\u00B2y\u00B3", " fifl ix x2y3"),
    (" CAFE\u0301 NAI\u0308VE", " caf\u00E9 na\u00EFve"),
    (" \uFF76\uFF9E\uFF9D\uFF80\uFF9E\uFF91" +
      " \uFF83\uFF9E\uFF70\uFF80",
      " \u30AC\u30F3\u30C0\u30E0 \u30C7\u30FC\u30BF"))

  /** NFKC + case-fold normalization — the stronger dedup/match tier
    * above [[nfcNormalize]] (full-width forms, ligatures,
    * superscripts, half-width katakana collapse; case drops). One
    * codegen'd [[graft.functions.NfkcCasefoldExpr]] kernel call per
    * row, zero shuffles, ASCII-lowercase fast path. Output:
    * (idCol, folded_text, n_delta) — n_delta = signed char-count
    * change (compatibility expansion can LENGTHEN text: Ⅸ→ix). */
  def nfkcCasefold(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val f = graft.functions.functions.nfkc_casefold(col(textCol))
    df.select(col(idCol), f.as("folded_text"),
      (length(col(textCol)) - length(f)).cast("long").as("n_delta"))
  }

  /** Unicode NFC normalization — curation stage 0.6, right after the
    * mojibake repair (mixed NFC/NFD forms of the SAME text hash to
    * different dedup fingerprints, count different n-grams, and leak
    * through exact-match decontamination; one canonical form fixes
    * all three). Evaluated by the codegen'd
    * [[graft.functions.NfcNormalizeExpr]] kernel — one static call
    * per row inside WholeStageCodegen, zero shuffles, linear in
    * bytes, with an isNormalized fast path so already-canonical text
    * (the common case) costs a check, not a rebuild. Normalization
    * of assigned code points is STABILIZED by Unicode, so the output
    * is engine-independent — the rare text operator whose gate can
    * be a true cross-engine oracle rather than a planted fixture.
    * Output: (idCol, nfc_text, n_composed) — n_composed = code
    * points removed by composition (0 = already canonical). */
  def nfcNormalize(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val n = graft.functions.functions.nfc_normalize(col(textCol))
    df.select(col(idCol), n.as("nfc_text"),
      (length(col(textCol)) - length(n)).cast("long").as("n_composed"))
  }

  /** Unicode-script detection patterns (public Unicode block
    * ranges), applied with `regexp_count` in both engines: the
    * pattern strings hold literal range endpoints, so Java regex and
    * RE2-family engines read them identically. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-zÀ-ɏ]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "arabic" -> "[؀-ۿ]",
    "cjk" -> "[぀-ヿ一-鿿가-힯]")

  /** Dominant script as a Column: argmax of per-script char counts
    * (ties to the listed order), 'other' when nothing matches. */
  def scriptCol(text: Column): Column = {
    val counts = scriptRanges.map { case (name, re) =>
      name -> regexp_count(text, lit(re)) }
    val best = greatest(counts.map(_._2): _*)
    counts.init.foldLeft(when(best <= 0, "other")) {
      case (acc, (name, c)) => acc.when(c === best, name)
    }.otherwise(scriptRanges.last._1)
  }

  /** Char-bigram profile language identification — the production
    * replacement for the [[langId]] marker toy. Bigrams of the
    * space-padded normalized text (padding turns word boundaries
    * into ' x'/'x ' evidence, the strongest short-text signal) are
    * scored against [[langProfileGrams]]; per-language scores are
    * integer micro-unit sums, so the whole classifier hash-gates.
    *
    * Prediction: argmax score (ties to en > de > fr > es), demoted
    * to 'und' when the winner is not positive, when its MARGIN over
    * the runner-up is below `marginMicro` (low confidence), or when
    * the dominant script is one the latin-profile table cannot see.
    *
    * Plan shape: one codegen'd projection chain per doc — normalize,
    * then ONE fused [[graft.functions.LangScoreExpr]] kernel call
    * accumulating all four language sums in a single pass over the
    * padded text (chars + consecutive pairs; exactly the chars ∪
    * zip-slice-bigram multiset the HOF formulation scores, whose
    * interpreted folds measured 28 s for 50k docs at sf1 — the
    * IvfAssignExpr replacement tier). Zero shuffles, zero joins; at
    * 100 TB this costs exactly one scan, like every other map-side
    * gate.
    *
    * Output: (idCol, script, lang_pred, score_micro, margin_micro).
    */
  def langProfile(df: DataFrame, idCol: String, textCol: String,
      marginMicro: Long = 100000L, carry: Seq[String] = Nil): DataFrame = {
    require(marginMicro >= 0, "marginMicro must be non-negative")
    val langs = Seq("en", "de", "fr", "es")
    val cs = carry.map(col)
    val s1 = df.select(col(idCol) +: cs :+
      scriptCol(col(textCol)).as("script") :+
      concat(lit(" "), Dedup.normText(col(textCol)), lit(" ")).as("__p"): _*)
    // one fused kernel call per row: all four language sums over
    // chars ∪ consecutive pairs (single-char profile keys — ñ, ß,
    // accents — match as chars, pair keys as the bigrams)
    val s4 = s1.select(col(idCol) +: cs :+ col("script") :+
      graft.functions.functions.lang_scores(col("__p"),
        langProfileGrams, langs.size).as("__s"): _*)
    val s5 = s4.select((col(idCol) +: cs :+ col("script")) ++
      langs.indices.map(i =>
        element_at(col("__s"), i + 1).as(s"__s$i")): _*)
    val scores = langs.indices.map(i => col(s"__s$i"))
    val best = greatest(scores: _*)
    val pred = langs.indices.init.foldLeft(
      when(lit(false), "und")) { case (acc, i) =>
        acc.when(scores(i) === best, langs(i))
      }.otherwise(langs.last)
    val second = langs.indices.map { i =>
      when(pred === langs(i),
        greatest(scores.indices.filter(_ != i).map(scores): _*))
    }.reduce((a, b) => coalesce(a, b))
    val margin = best - second
    s5.select(col(idCol) +: cs :+ col("script") :+
      when(col("script") =!= "latin" || best <= 0L ||
        margin < marginMicro, "und").otherwise(pred).as("lang_pred") :+
      best.as("score_micro") :+ margin.as("margin_micro"): _*)
  }

  /** PII scrub patterns, applied IN ORDER: each pattern is counted and
    * redacted on the text as left by the previous one, so a dotted
    * quad inside an email's domain is counted as email, not as ipv4 —
    * sequential semantics any engine can reproduce. Patterns are kept
    * RE2-safe (no lookaround, no backreferences) so they behave
    * identically under Spark's Java regex and the RE2-family engines
    * (DuckDB, Go) a cross-engine pipeline may also run them on. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    // card before ssn: both are dash-grouped digit runs, and fixing
    // the order fixes which pattern owns an ambiguous span in BOTH
    // engines. 16-digit 4-4-4-4 grouping (dash or space), the public
    // card-number display format; Luhn validation is out of scope —
    // a scrub pass prefers the false positive.
    ("cc", "[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}", "<CC>"),
    // SSN display format AAA-GG-SSSS (public format spec)
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
      "<IPV4>"))

  /** Witness character set per PII pattern — a necessary any-of
    * containment condition every match must satisfy, so the scrub
    * kernel can clear clean text with one indexOf scan instead of
    * engaging the regex engine (exact: no '@' → no email match, no
    * digit → no number shape, no '.' → no dotted quad). */
  private val piiWitness: Map[String, String] = Map(
    "email" -> "@",
    "phone" -> "+",
    "cc" -> "0123456789",
    "ssn" -> "0123456789",
    "ipv4" -> ".")

  /** PII redaction for training corpora (the C4/CCNet-style scrub
    * pass): replace emails, phone numbers, card numbers, SSNs, and
    * IPv4 addresses with typed placeholder tokens and report how many
    * of each were hit. Pure map-side projection, zero shuffle —
    * since r17 ONE codegen'd kernel call per row
    * ([[graft.functions.PiiScrubExpr]]: count-while-replace, 5 regex
    * passes worst case instead of the fold's 10 + 5 intermediate
    * strings; the s04 probe measured the fold at ~9.7 s of s04's
    * 15.4 s at sf1). [[redactPiiFold]] is the reference twin the law
    * test compares bit-exactly. The two-step select is deliberate:
    * Spark's CollapseProject never duplicates a non-cheap producer
    * consumed more than once, so the kernel runs ONCE per row (plan
    * law in NsTextOpsSpec). Output:
    * (idCol, n_email, n_phone, n_cc, n_ssn, n_ipv4, redacted_text). */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spec = piiPatterns.map { case (name, re, repl) =>
      (name, re, repl, piiWitness.getOrElse(name, "")) }
    df.select(col(idCol),
      graft.functions.functions.pii_scrub(col(textCol), spec).as("__pii"))
      .select(col(idCol) +:
        piiPatterns.map { case (n, _, _) =>
          col(s"__pii.n_$n").as(s"n_$n") } :+
        col("__pii.redacted_text").as("redacted_text"): _*)
  }

  /** The pre-kernel regexp_count + regexp_replace fold — retained as
    * the REFERENCE implementation the kernel law-gates against
    * (kernel ≡ fold bit-exactly in NsTextOpsSpec). */
  def redactPiiFold(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val (redacted, counts) = piiPatterns
      .foldLeft((col(textCol), Seq.empty[(String, Column)])) {
        case ((cur, cs), (name, re, repl)) =>
          (regexp_replace(cur, lit(re), lit(repl)),
            cs :+ (name -> regexp_count(cur, lit(re))))
      }
    df.select(col(idCol) +:
      counts.map { case (n, c) => c.cast("long").as(s"n_$n") } :+
      redacted.as("redacted_text"): _*)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, A1.1):
    * fraction of lines, and of characters, that are EXCESS copies of
    * a line already seen in the same document. Pure map-side array
    * arithmetic — sort the document's lines once, compare adjacent
    * entries — so no shuffle and no per-line explode; lines-per-doc
    * is bounded by document size, which a curation pipeline caps
    * anyway. Docs with no (non-empty) lines report 0 lines and 0.0
    * fractions. Output: (idCol, n_lines, n_unique_lines,
    * dup_line_frac, dup_char_frac). */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(l) > 0)
    val sorted = sort_array(lines)
    val n = size(sorted)
    val runLen = greatest(n - 1, lit(0))
    val curr = slice(sorted, lit(2), runLen)
    val prev = slice(sorted, lit(1), runLen)
    val nDup = aggregate(
      zip_with(curr, prev, (a, b) => (a === b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val dupChars = aggregate(
      zip_with(curr, prev,
        (a, b) => when(a === b, length(a).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val totChars = aggregate(transform(sorted, l => length(l).cast("long")),
      lit(0L), (acc, x) => acc + x)
    df.select(col(idCol),
      n.cast("long").as("n_lines"),
      (n.cast("long") - nDup).as("n_unique_lines"),
      when(n === 0, 0.0)
        .otherwise(nDup.cast("double") / n.cast("double"))
        .as("dup_line_frac"),
      when(n === 0, 0.0)
        .otherwise(dupChars.cast("double") / totChars.cast("double"))
        .as("dup_char_frac"))
  }

  /** Autogenerated-file markers (case-insensitive substring match) —
    * the published The Stack/StarCoder heuristic list shape: build
    * artifacts waste training tokens and leak license headers. */
  val autogenMarkers: Seq[String] = Seq(
    "auto-generated", "autogenerated", "do not edit", "generated by")

  /** Language-agnostic comment-line prefixes (after trim). */
  val commentMarkers: Seq[String] = Seq("#", "//", "--", ";", "/*", "*")

  /** Code-quality heuristics for code corpora — the public The
    * Stack-style filter battery: max/avg line length (minified and
    * data-blob files), alphanumeric character fraction (binary-ish
    * blobs), comment-line fraction (read side of a docs-vs-code
    * mixture policy), and autogenerated-marker detection. Pure
    * map-side projection: one line split per doc, per-line work via
    * array ops behind a projection boundary (lines are materialized
    * and trimmed ONCE — the topGramCol interpreted-HOF discipline),
    * total line chars derived from length(text) and the line count
    * instead of a second fold. No shuffle; linear in bytes. The
    * `keep` verdict applies the published thresholds (line <= 1000,
    * avg <= 100, alnum >= 0.25, no autogen marker). Output: (idCol,
    * n_lines, max_line_len, avg_line_len, comment_line_frac,
    * alnum_frac, autogen, keep). */
  def codeQualityStats(df: DataFrame, idCol: String, textCol: String,
      maxLineLen: Long = 1000L, maxAvgLineLen: Double = 100.0,
      minAlnumFrac: Double = 0.25): DataFrame = {
    val s1 = df.select(col(idCol), col(textCol),
      split(col(textCol), "\n").as("__lines"))
    val s2 = s1.select(col(idCol), col(textCol),
      size(col("__lines")).cast("long").as("__n"),
      transform(col("__lines"), l => length(l).cast("long"))
        .as("__lens"),
      transform(col("__lines"), l => trim(l)).as("__tl"))
    val s3 = s2.select(col(idCol),
      col("__n"),
      array_max(col("__lens")).as("__maxl"),
      size(filter(col("__tl"), l =>
        commentMarkers.map(m => l.startsWith(m)).reduce(_ || _)))
        .cast("long").as("__nc"),
      length(col(textCol)).cast("long").as("__chars"),
      regexp_count(col(textCol), lit("[A-Za-z0-9]")).cast("long")
        .as("__alnum"),
      autogenMarkers.map(m => lower(col(textCol)).contains(m))
        .reduce(_ || _).as("autogen"))
    val avg = (col("__chars") - (col("__n") - 1)) / col("__n")
    val alnumFrac = col("__alnum") / col("__chars")
    s3.select(col(idCol),
      col("__n").as("n_lines"),
      col("__maxl").as("max_line_len"),
      avg.as("avg_line_len"),
      (col("__nc") / col("__n")).as("comment_line_frac"),
      alnumFrac.as("alnum_frac"),
      col("autogen"),
      (col("__maxl") <= maxLineLen && avg <= maxAvgLineLen &&
        alnumFrac >= minAlnumFrac && !col("autogen")).as("keep"))
  }

  /** Corpus vocabulary: word-token histogram, deterministic top-k by
    * (count desc, word asc). The groupBy partial-aggregates map-side
    * (each executor ships one row per distinct word, not per token)
    * and orderBy+limit plans as TakeOrdered — k rows per partition
    * cross the wire, never the full histogram sorted. Output:
    * (word, n). */
  def vocab(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(wordTokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)

  /** Corpus token accounting: documents and token/word/char totals
    * per group (source, split, language — whatever the mixture is
    * budgeted by). One map-combinable aggregation over map-side
    * stats — the number that decides how many epochs of each source a
    * token budget buys. Output: (groupCols..., n_docs, total_tokens,
    * total_words, total_chars). */
  def tokenAccounting(df: DataFrame, groupCols: Seq[Column],
      textCol: String): DataFrame =
    df.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n_docs"),
      sum(bpeTokenCount(col(textCol))).as("total_tokens"),
      sum(size(wordTokens(col(textCol)))).as("total_words"),
      sum(length(col(textCol))).as("total_chars"))

  /** Per-document salient terms by tf-idf with a LINEAR idf
    * (tf · N / df instead of tf · log(N/df)): log would rank the same
    * way but ties the score to libm's ln, which differs in the last
    * bits across engines — the linear form is one multiply and one
    * divide on exact integers, so the scores are bit-identical in any
    * engine and the operator can sit behind the cross-engine hash
    * gate. Ranking is deterministic via the (score desc, word asc)
    * tiebreak.
    *
    * Plan: term counts are a map-combinable groupBy(id, word); the
    * document-frequency side collapses to one row per vocabulary word
    * (Zipf-bounded — millions of rows at web scale, megabytes) and is
    * BROADCAST back, so the corpus shuffles once for tf and never for
    * the join. The final per-doc top-k plans as a window group limit
    * (partition-local prune before the exchange).
    *
    * `minDf` caps the broadcast side against adversarial vocabularies
    * (an unfiltered web crawl's long tail of unique garbage tokens can
    * push "one row per word" to GBs): words seen in fewer than minDf
    * documents are cut BEFORE the broadcast. The inner join then also
    * drops those words' tf rows — at minDf = 1 (default) nothing is
    * cut, and any minDf > 1 run scores a subset of the minDf = 1 rows
    * (cutting can promote surviving words into the per-doc top-k, so
    * the subset law holds for (doc, word, tf, score), not for rn).
    *
    * `knownN` short-circuits the corpus-count side: by default N is a
    * broadcast 1-row aggregate, which keeps the operator a pure lazy
    * plan but DOES execute a second full scan of `df` at runtime
    * (deferred, not avoided — at 100 TB that is a real extra pass,
    * even though it prunes to zero columns). A caller that already
    * knows the corpus size (catalog stats, a prior accounting pass,
    * the ingest manifest) passes it here and the plan scans the
    * corpus exactly once. Same N ⇒ bit-identical output either way.
    * Output: (idCol, word, tf, score, rn). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Int = 1, knownN: Option[Long] = None): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    require(knownN.forall(_ > 0), "knownN must be > 0 when given")
    val toks = df.select(col(idCol),
      explode(wordTokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val tf = toks.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") >= minDf)
    val withN = knownN match {
      case Some(n) => tf.join(broadcast(dfreq), "word")
        .withColumn("__n", lit(n))
      case None => tf.join(broadcast(dfreq), "word")
        .crossJoin(broadcast(df.agg(count(lit(1)).as("__n"))))
    }
    val scored = withN.withColumn("score",
      col("tf").cast("double") * col("__n") / col("dfreq"))
    graft.ops.Relational.topKPerGroup(
      scored.select(col(idCol), col("word"), col("tf"), col("score")),
      k, Seq(col(idCol)), Seq(col("score").desc, col("word").asc))
  }

  /** Mod-p sampled shingle fingerprints (document sketching in the
    * winnowing family, Schleimer et al. 2003): hash every word
    * n-gram, keep the deterministic ~1/p sample with hash ≡ 0 (mod p).
    * Two documents sharing content share fingerprints, so an
    * inverted-index join on `fp` finds overlap candidates at corpus
    * scale with p× less index than full shingling. Output:
    * (idCol, fp). */
  def shingleFingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int, p: Int): DataFrame =
    // hash the RAW gram stream and mod-p filter before any exchange:
    // the one distinct then shuffles (id, long) pairs already cut p× —
    // never gram strings, and never a pre-distinct of the full gram
    // set (stream duplicates collapse in the same final distinct)
    Dedup.shingleStream(df, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("gram")).as("fp"))
      .filter(pmod(col("fp"), lit(p)) === 0)
      .distinct()

  /** Overlapping sliding-window chunks — the retrieval/embedding prep
    * step that turns each document into windows of `windowWords`
    * words advancing by `strideWords` (stride < window ⇒ adjacent
    * chunks overlap by window − stride words, so no boundary-spanning
    * context is lost to the embedder). Chunk starts are 0, S, 2S, …;
    * the last start is the first multiple of S reaching the tail, so
    * every word lands in ≥1 chunk and a short document yields exactly
    * one chunk. The final chunk clamps at the document end (it may be
    * shorter than `windowWords`) rather than padding.
    *
    * Pure zero-shuffle projection (sequence + slice + posexplode, all
    * codegen'd) — at 100 TB the cost is the inherent ~window/stride×
    * output inflation, not coordination; chunk rows inherit the
    * scan's partitioning so a downstream embedder maps straight over
    * them. Output: (idCol, chunk_idx, chunk_text, n_words). */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      windowWords: Int, strideWords: Int): DataFrame = {
    require(windowWords > 0, "windowWords must be > 0")
    require(strideWords > 0 && strideWords <= windowWords,
      "strideWords must be in [1, windowWords]")
    // words materialized behind a projection boundary — see
    // Dedup.shingleStream: lambda bodies re-evaluate inline splits
    // per element
    val words = col("__words")
    // last chunk index = ceil(max(len - window, 0) / stride); the
    // max(0) clamp makes len <= window yield exactly one chunk.
    val lastIdx = ceil(
      greatest(size(words) - windowWords, lit(0))
        / lit(strideWords.toDouble)).cast("long")
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), split(col(textCol), " ").as("__words"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0L), lastIdx),
          i => concat_ws(" ",
            slice(words, (i * strideWords + 1).cast("int"),
              lit(windowWords)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_words"))
  }

  /** Corpus n-gram table, top-k by occurrence count — [[vocab]]'s
    * n-gram generalization, the count table behind classical LM
    * smoothing, novelty scoring, and stop-gram lists. Same scale
    * shape as vocab: the groupBy partial-aggregates map-side (one
    * row per distinct gram per executor, never per occurrence) and
    * orderBy+limit plans as TakeOrdered, so only k rows per
    * partition cross the wire. Ties break deterministically by
    * (count desc, gram asc). Output: (gram, n). */
  def ngramTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    Dedup.shingleStream(df, idCol, textCol, n)
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)

  /** Rare-token statistics — the vocabulary-based quality signal
    * (OOV-rate filtering): per document, how many of its word tokens
    * have corpus document frequency BELOW `minDf`. A high rare
    * fraction flags hash garbage, boilerplate IDs, OCR noise, or
    * off-distribution text; curation gates on rare_frac the same way
    * [[qualityScore]] gates on punctuation.
    *
    * Plan shape: the document-frequency pass collapses to one row per
    * distinct word (distinct + map-combinable count — the same
    * Zipf-bounded vocabulary side tf-idf broadcasts), the COMMON
    * vocabulary (df ≥ minDf — the Zipf head, small by construction)
    * is broadcast back, and the scoring pass is a map-side broadcast
    * left join + one per-document exchange of partially-aggregated
    * counts. The corpus is scanned twice (df pass + scoring pass),
    * which is inherent to any corpus-relative signal unless the
    * vocabulary is precomputed — pass a persisted `vocabDf` from a
    * prior run to make this one pass. rare_frac is a single integer
    * division in doubles, bit-identical across engines.
    *
    * Output: (idCol, n_tokens, n_types, n_rare, rare_frac). */
  def rareTokenStats(df: DataFrame, idCol: String, textCol: String,
      minDf: Int, vocabDf: Option[DataFrame] = None): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    val toks = df.select(col(idCol),
      explode(wordTokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val dfreq = vocabDf.getOrElse(
      toks.select(col(idCol), col("word")).distinct()
        .groupBy(col("word")).agg(count(lit(1)).as("dfreq")))
    val common = dfreq.filter(col("dfreq") >= minDf)
      .select(col("word"), lit(true).as("__common"))
    toks.join(broadcast(common), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count_distinct(col("word")).as("n_types"),
        sum(when(col("__common").isNull, 1L).otherwise(0L))
          .as("n_rare"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_tokens").cast("double"))
  }

  /** Registrable-domain extraction from a URL column — the per-DOMAIN
    * curation key real web corpora quota/report on (per-`source` keys
    * are a warehouse convenience; crawl governance works on
    * registrable domains). Pure codegen'd string ops, no UDF:
    * scheme-authority parse via one regexp, label split, and a
    * public-suffix decision against `twoLevelSuffixes` — a tiny
    * excerpt of the public-suffix list compiled INTO the plan as a
    * literal IN (production would broadcast-join the full PSL table;
    * the decision shape is the same). Hosts under a two-level suffix
    * (e.g. `a.b.site.co.uk`) keep three labels, others two; bare or
    * degenerate hosts pass through unchanged. try_element_at keeps the
    * expression total under ANSI mode. */
  def registrableDomain(url: Column,
      twoLevelSuffixes: Seq[String]): Column = {
    val host = regexp_extract(url, "^[a-z][a-z0-9+.\\-]*://([^/:?#]+)", 1)
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".",
      try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
    when(n >= 3 && last2.isInCollection(twoLevelSuffixes),
      concat_ws(".", try_element_at(parts, lit(-3)), last2))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** URL canonicalization — the normalization every web-corpus
    * curation key (dedup-by-url, per-domain quota, blocklist) wants
    * applied FIRST, so `HTTP://Example.COM:80/a?utm_source=x#frag`
    * and `http://example.com/a` collapse to one key. Rules (the
    * RFC 3986 §6 safe set plus tracking-param stripping):
    * scheme and host lowercased; default ports dropped (`:80` for
    * http, `:443` for https); the fragment dropped; tracking query
    * parameters removed (`utm_*`, `fbclid`, `gclid`, `ref`) with the
    * survivors kept in their original order; `?` dropped when no
    * parameter survives; an empty path becomes `/`. Pure codegen'd
    * string ops — one regexp parse into (scheme, host+port, path,
    * query), a higher-order `filter` over the split parameter list,
    * no UDF — so the canonicalization runs map-side at scan speed.
    * Non-URL strings (no `scheme://`) pass through unchanged. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val host = when(
      (scheme === "http" && auth.endsWith(":80")) ||
        (scheme === "https" && auth.endsWith(":443")),
      regexp_replace(auth, ":[0-9]+$", "")).otherwise(auth)
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p.startsWith("ref=") || p === ""))
    val canonQuery = when(query === "" || size(keptParams) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(keptParams, "&")))
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), host,
      when(path === "", "/").otherwise(path), canonQuery))
  }

  /** Crawl-frontier construction — the politeness-aware fetch list
    * every crawl round starts from, composed from the gated URL
    * machinery: canonicalize ([[canonicalizeUrl]]) → exact dedup on
    * the canonical form (tracking params, fragments, default ports,
    * and case variants of the SAME resource collapse; min-id
    * survivor + variant multiplicity, the ns01 shape) → blocklisted
    * registrable domains dropped (broadcast anti-join, the ns68
    * shape) → at most `perDomainQuota` URLs per registrable domain
    * (window group limit — per-partition pruning before the shuffle,
    * the politeness cap that stops one host from monopolizing a
    * fetch round). Output: (idCol, url_canon, domain, n_variants,
    * rn) with rn the 1-based within-domain fetch slot. */
  def crawlFrontier(urls: DataFrame, idCol: String, urlCol: String,
      blockDomains: Seq[String], perDomainQuota: Int,
      multiLabelTlds: Seq[String] = Seq("co.uk", "com.au", "co.jp"))
      : DataFrame = {
    require(perDomainQuota >= 1, "quota must be positive")
    val spark = urls.sparkSession
    val ded = urls
      .select(col(idCol), canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_variants"))
      .withColumn("domain",
        registrableDomain(col("url_canon"), multiLabelTlds))
    val block = spark.createDataFrame(blockDomains.map(Tuple1(_)))
      .toDF("domain")
    val kept = ded.join(broadcast(block), Seq("domain"), "left_anti")
    graft.ops.Relational
      .topKPerGroup(kept, perDomainQuota, Seq(col("domain")),
        Seq(col(idCol)))
      .select(col(idCol), col("url_canon"), col("domain"),
        col("n_variants"), col("rn").cast("long").as("rn"))
  }

  /** Fill-in-the-middle (FIM) transform — the document-level
    * rearrangement code models train on (Bavarian et al. 2022, PSM
    * format): split the text at two cut points, emit
    * `pre‖prefix‖suf‖suffix‖mid‖middle` so the model learns to
    * infill. Everything content-addressed (the hashSplit idiom —
    * md5-derived buckets, no RNG): the two cuts and the
    * apply-or-passthrough decision (`rateBuckets`/1000 of docs) are
    * pure functions of the id, so the transformed corpus is
    * reproducible across engines, reruns, and partitionings — and
    * the whole transform is one codegen'd map-side projection.
    * Output: (idCol, fim_applied, prefix_len, middle_len, text_out)
    * with zero lengths on passthrough rows. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rateBuckets: Int = 600,
      pre: String = "<|fim_pre|>", suf: String = "<|fim_suf|>",
      mid: String = "<|fim_mid|>"): DataFrame = {
    require(rateBuckets >= 0 && rateBuckets <= 1000,
      "rateBuckets is out of 1000")
    val n = length(col(textCol))
    val b1 = Sampling.hashBucket(col(idCol), "fim1", 1000)
    val b2 = Sampling.hashBucket(col(idCol), "fim2", 1000)
    // Empty docs pass through (round-11 ADVICE: with n=0 the cut
    // arithmetic yields plen=-1 and a sentinel-only text_out,
    // violating the non-negative-lengths contract).
    val applied =
      Sampling.hashBucket(col(idCol), "fimr", 1000) < rateBuckets && n > 0
    // floor of small positive integer products — exact in doubles
    val plen = floor(least(b1, b2) * (n - 1) / 1000).cast("int")
    val tot = floor(greatest(b1, b2) * (n - 1) / 1000).cast("int")
    val t = col(textCol)
    val fim = concat(lit(pre), t.substr(lit(1), plen),
      lit(suf), t.substr(tot + 1, n - tot),
      lit(mid), t.substr(plen + 1, tot - plen))
    df.select(col(idCol),
      applied.as("fim_applied"),
      when(applied, plen).otherwise(0).cast("long").as("prefix_len"),
      when(applied, tot - plen).otherwise(0).cast("long")
        .as("middle_len"),
      when(applied, fim).otherwise(t).as("text_out"))
  }

  /** Incremental frontier delta — the batch-vs-store form of
    * [[crawlFrontier]] (the ns25/ns41/ns119 delta-cost shape for
    * URLs): canonicalize the newly-discovered batch, collapse its
    * internal variants, then anti-join against the STORED seen-set
    * of canonical URLs so a crawl round only pays for what it has
    * never fetched. The exchange carries one row per distinct new
    * canonical URL; the seen-set side is the big one at scale — a
    * Bloom prefilter (the ns55 shape) slots in front of the
    * anti-join when the store outgrows comfortable shuffles. Output:
    * (idCol, url_canon, n_variants). */
  def frontierDelta(batch: DataFrame, store: DataFrame,
      idCol: String, urlCol: String): DataFrame = {
    val ded = batch
      .select(col(idCol), canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_variants"))
    ded.join(store.select(col("url_canon")).distinct(),
      Seq("url_canon"), "left_anti")
      .select(col(idCol), col("url_canon"), col("n_variants"))
  }

  /** Unigram-LM mean negative log-likelihood per document — the
    * perplexity-filter proxy (the CCNet/Gopher "LM quality" signal)
    * computable exactly without a model: with additive smoothing
    * `alpha`, p(w) = (count(w) + alpha) / (total + alpha·(V + 1)),
    * unseen tokens get the +alpha mass, and
    * mean_nll = −(1/n)·Σ ln p(w_i) (perplexity = exp(mean_nll)).
    * Low mean_nll ⇒ the document is made of corpus-typical tokens;
    * high ⇒ rare/garbled content — the standard keep/drop axis.
    *
    * `vocabCounts` (token, n_token): score against a PRECOMPUTED
    * (possibly foreign) LM vocabulary — the production form, where
    * the unigram table comes from a reference corpus and this pass
    * is one join; None self-scores against the input corpus.
    *
    * Determinism at any partitioning: each DISTINCT token's nll is
    * computed once in the vocabulary table and rounded once to
    * 2^-fracBits quanta; per-document accumulation is then exact
    * long arithmetic (the labelCentroids scheme), so the mean is
    * order- and partition-independent. (ln itself is platform libm
    * — 1-ulp — which is why this is registered rows-only with laws
    * in NsTextOpsSpec rather than hash-gated.)
    *
    * Plan shape: one map-combinable token count (skipped when
    * `vocabCounts` is supplied), a 2-scalar driver agg, one
    * token-keyed equi-join of the stream against the vocabulary,
    * one per-document groupBy of partially-aggregated longs. No
    * per-row UDFs, no driver-side token data.
    *
    * Output: (idCol, n_tokens, mean_nll); documents with zero
    * tokens after canonicalization are absent (nothing to score). */
  def unigramNll(df: DataFrame, idCol: String, textCol: String,
      vocabCounts: Option[DataFrame] = None, alpha: Double = 0.5,
      fracBits: Int = 24): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    require(fracBits >= 1 && fracBits <= 30, s"bad fracBits $fracBits")
    val scale = (1L << fracBits).toDouble
    val tok = df
      .select(col(idCol), explode(wordTokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = vocabCounts.getOrElse(
      tok.groupBy(col("token")).agg(count(lit(1)).as("n_token")))
    // sum() over zero rows is null — coalesce so an empty corpus/vocab
    // short-circuits to an empty result instead of an NPE.
    val totals = counts
      .agg(coalesce(sum(col("n_token")).cast("long"), lit(0L)).as("total"),
        count(lit(1)).as("v"))
      .head()
    if (totals.getLong(0) == 0L)
      return df.select(col(idCol)).limit(0)
        .withColumn("n_tokens", lit(0L))
        .withColumn("mean_nll", lit(0.0))
    val denom = totals.getLong(0) + alpha * (totals.getLong(1) + 1.0)
    val lp = counts.select(col("token"),
      round(-log((col("n_token").cast("double") + alpha) / denom) * scale)
        .cast("long").as("__fx"))
    val oovFx = math.round(-math.log(alpha / denom) * scale)
    tok.join(lp, Seq("token"), "left")
      .select(col(idCol), coalesce(col("__fx"), lit(oovFx)).as("__fx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__fx")).cast("double") /
          (count(lit(1)).cast("double") * scale)).as("mean_nll"))
  }

  /** Adjacent word pairs of the canonical token stream — the
    * zip-slice gram idiom (no per-element re-split): pairs (w_i,
    * w_{i+1}); the zip's null-padded tail pair and empty tokens are
    * filtered. Output: (idCol, w1, w2). */
  private def bigramStream(df: DataFrame, idCol: String,
      textCol: String): DataFrame = df
    .select(col(idCol), wordTokens(col(textCol)).as("__w"))
    .select(col(idCol), explode(zip_with(col("__w"),
      slice(col("__w"), lit(2), size(col("__w"))),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
    .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    .filter(col("w2").isNotNull &&
      length(col("w1")) > 0 && length(col("w2")) > 0)

  /** Bigram-LM NLL — [[unigramNll]] one conditioning level up, the
    * shape of the real CCNet/KenLM perplexity filter (a unigram LM
    * cannot see word ORDER; a bigram LM penalizes shuffled or
    * disfluent text that unigram stats score as fluent): score =
    * mean −ln P(w2|w1) over a document's adjacent word pairs, with
    * Laplace smoothing P(w2|w1) = (C(w1,w2)+α)/(C1(w1)+α(V+1)),
    * C1(w1) = Σ_w2 C(w1,w2), V = distinct second-words in the
    * training stream. Backoff for pairs the LM never saw: seen-w1
    * context mass (per-w1 table), then a global OOV constant.
    *
    * Determinism is ns58's idiom one level up: every DISTINCT bigram
    * (and every w1 backoff) gets its −ln quantized to fixed-point
    * ONCE in the model table, then document scores are exact long
    * sums and one final division — partition- and order-independent,
    * so the whole signal hash-gates. `train` defaults to the scored
    * corpus (self-scoring); pass a subset to exercise backoff /
    * train-vs-apply splits.
    *
    * Plan shape: the model is TWO map-combinable aggs over the train
    * bigram stream (distinct bigrams, then per-w1 sums) + a 1-row
    * driver scalar for V; scoring is two equi-joins (pair, then w1
    * backoff) and one per-doc groupBy of longs. At 100 TB the
    * exchanges carry distinct bigrams — Zipf-bounded — never the
    * token stream.
    * Output: (idCol, n_bigrams, mean_nll); docs with no bigram are
    * absent. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
      train: Option[DataFrame] = None, alpha: Double = 0.5,
      fracBits: Int = 24): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    require(fracBits >= 1 && fracBits <= 30, s"bad fracBits $fracBits")
    val scale = (1L << fracBits).toDouble
    val scoreBig = bigramStream(df, idCol, textCol)
    val trainBig = train
      .map(t => bigramStream(t, idCol, textCol))
      .getOrElse(scoreBig)
    val counts = trainBig.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val c1 = counts.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = trainBig.agg(
      coalesce(count_distinct(col("w2")), lit(0L))).head().getLong(0)
    if (v == 0L)
      return df.select(col(idCol)).limit(0)
        .withColumn("n_bigrams", lit(0L))
        .withColumn("mean_nll", lit(0.0))
    val denomAdd = alpha * (v + 1.0)
    val lp = counts.join(c1, "w1")
      .select(col("w1"), col("w2"),
        round(-log((col("c").cast("double") + alpha) /
          (col("c1").cast("double") + denomAdd)) * scale)
          .cast("long").as("__fx"))
    val bo = c1.select(col("w1"),
      round(-log(lit(alpha) / (col("c1").cast("double") + denomAdd))
        * scale).cast("long").as("__bfx"))
    val oovFx = math.round(-math.log(alpha / denomAdd) * scale)
    scoreBig
      .join(lp, Seq("w1", "w2"), "left")
      .join(bo, Seq("w1"), "left")
      .select(col(idCol),
        coalesce(col("__fx"), col("__bfx"), lit(oovFx)).as("__fx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__fx")).cast("double") /
          (count(lit(1)).cast("double") * scale)).as("mean_nll"))
  }

  /** Loss-aware domain mixture reweighting — the DoReMi direction
    * (Xie et al. 2023: upweight the domains the model finds hard)
    * with the proxy-model loss replaced by the corpus's own
    * unigram-LM NLL ([[unigramNll]]'s exact fixed-point machinery,
    * aggregated per domain instead of per document). Each domain's
    * weight is its excess-loss ratio
    * mean_nll_domain / mean_nll_corpus — > 1 for harder-than-average
    * domains — normalizable downstream into [[Sampling.mixtureSample]]
    * rates.
    *
    * Why a RATIONAL tilt and not DoReMi's exponential one: exp() is
    * measurably NOT bit-stable between this host's JVM and DuckDB
    * (360/4073 probed values differ by 1 ulp — unlike ln, which
    * ns58/ns75/ns79 proved identical), so an exp weight cannot sit
    * behind a cross-engine hash gate. The ratio needs only the
    * proven pieces: integer fixed-point NLL sums, then a FIXED dag
    * of three IEEE divisions — bit-deterministic in any engine.
    * (An η-tempered tilt excess^η stays gateable for integer η.)
    *
    * Scale shape: token explode → one vocab count (map-combinable),
    * fx join, one per-domain aggregate (a |domains|-row result), and
    * the corpus totals come from summing THAT summary — no second
    * corpus scan, broadcast back as one row. Output: (groupCol,
    * n_tokens, sum_fx, mean_nll, excess, weight_micro). */
  def domainReweight(df: DataFrame, groupCol: String,
      textCol: String, alpha: Double = 0.5,
      fracBits: Int = 24): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    require(fracBits >= 1 && fracBits <= 30, s"bad fracBits $fracBits")
    val scale = (1L << fracBits).toDouble
    val tok = df
      .select(col(groupCol),
        explode(wordTokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("n_token"))
    val totals = counts
      .agg(coalesce(sum(col("n_token")).cast("long"), lit(0L)).as("total"),
        count(lit(1)).as("v"))
      .head()
    if (totals.getLong(0) == 0L)
      return df.select(col(groupCol)).limit(0)
        .withColumn("n_tokens", lit(0L))
        .withColumn("sum_fx", lit(0L))
        .withColumn("mean_nll", lit(0.0))
        .withColumn("excess", lit(0.0))
        .withColumn("weight_micro", lit(0L))
    val denom = totals.getLong(0) + alpha * (totals.getLong(1) + 1.0)
    val lp = counts.select(col("token"),
      round(-log((col("n_token").cast("double") + alpha) / denom) * scale)
        .cast("long").as("__fx"))
    // vocab is the corpus's own, so the join is total (no OOV arm)
    val dom = tok.join(lp, Seq("token"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__fx")).as("sum_fx"))
    val tot = dom.agg(sum(col("n_tokens")).as("__n_all"),
      sum(col("sum_fx")).as("__fx_all"))
    val excess = (col("sum_fx").cast("double") /
        col("n_tokens").cast("double")) /
      (col("__fx_all").cast("double") / col("__n_all").cast("double"))
    dom.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"), col("sum_fx"),
        (col("sum_fx").cast("double") /
          (col("n_tokens").cast("double") * scale)).as("mean_nll"),
        excess.as("excess"),
        round(excess * 1e6).cast("long").as("weight_micro"))
  }

  /** PMI collocation mining — the corpus-level phrase table (Church &
    * Hanks 1990): the top-`k` word pairs whose co-occurrence most
    * exceeds chance, PMI = ln((C(w1,w2)/Nb) / ((U(w1)/Nt)·(U(w2)/Nt)))
    * over adjacent pairs, restricted to pairs seen ≥ `minCount` times
    * (unsmoothed PMI is dominated by hapax pairs otherwise). The
    * canonical phrase-vocabulary builder in front of tokenizer
    * training (ns88) and boilerplate mining.
    *
    * Determinism: each DISTINCT surviving pair's PMI is computed once
    * in the pair table with a fixed operand order (corpus scalars Nb,
    * Nt ride as driver double literals) and quantized to fixed point
    * ONCE — the ns58 idiom — so ranking and values hash-gate.
    *
    * Plan shape: one map-combinable token count + one bigram count
    * (exchanges carry distinct words/pairs, Zipf-bounded), a
    * broadcast-sized 2-scalar driver agg, two equi-joins of the
    * minCount-filtered pair table against the word table, and a
    * distributed TakeOrdered — no global sort, no corpus re-scan.
    * Output: (w1, w2, c, pmi_fx, rank), pmi = pmi_fx / 2^fracBits. */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, k: Int = 50, fracBits: Int = 24): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    require(fracBits >= 1 && fracBits <= 30, s"bad fracBits $fracBits")
    val scale = (1L << fracBits).toDouble
    val toks = df
      .select(explode(wordTokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("u"))
    val pairs = bigramStream(df, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val totals = uni.agg(
      coalesce(sum(col("u")), lit(0L)).as("nt")).head()
    val nt = totals.getLong(0)
    if (nt == 0L)
      return df.sparkSession.emptyDataFrame
        .withColumn("w1", lit("")).limit(0)
        .select(col("w1"), lit("").as("w2"), lit(0L).as("c"),
          lit(0L).as("pmi_fx"), lit(0L).as("rank"))
    // Nb from the unfiltered pair stream (a second tiny agg over the
    // already-shuffled pair counts, reused by AQE)
    val nb = bigramStream(df, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val ntD = nt.toDouble
    val nbD = nb.toDouble
    val scored = pairs
      .join(uni.select(col("w").as("w1"), col("u").as("u1")), "w1")
      .join(uni.select(col("w").as("w2"), col("u").as("u2")), "w2")
      .select(col("w1"), col("w2"), col("c"),
        round(log((col("c").cast("double") / nbD) /
          ((col("u1").cast("double") / ntD) *
            (col("u2").cast("double") / ntD))) * scale)
          .cast("long").as("pmi_fx"))
    val top = scored
      .orderBy(col("pmi_fx").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_fx").desc, col("w1").asc, col("w2").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Perplexity-band document filter — the CCNet/DCLM selection rule
    * on top of [[unigramNll]]: drop the lowest-NLL tail (boilerplate /
    * degenerate repetition the LM finds too easy) and the highest-NLL
    * tail (garbled or out-of-distribution text), keep the middle band.
    *
    * Band boundaries are QUANTILE-derived but computed on a fixed
    * histogram grid rather than with a global sort: mean_nll is
    * binned into `bins` equal-width cells over [0, maxNll) (values
    * past maxNll clamp into the last cell), the per-cell counts are
    * cumulated (`bins` rows — kilobytes, regardless of corpus size),
    * and loBin/hiBin are the cells holding the loFrac/hiFrac quantile
    * positions. A document is kept iff its cell lies in
    * [loBin, hiBin] — i.e. the band snaps to bin granularity, which
    * at the default 2^16 bins is an NLL resolution of 2^-11 nats.
    * Everything is integer arithmetic on identically-derived doubles
    * (the ns58 fixed-point values), so the selection is bit-stable
    * across engines and partitionings — and there is NO global sort:
    * the only non-map-side work is one `bins`-row aggregation, vs.
    * the single-reducer ORDER BY window a rank-based cut would cost
    * at 100 TB.
    *
    * Output: the kept documents as (idCol, n_tokens, mean_nll,
    * nll_bin), nll_bin included so the band decision is auditable. */
  def perplexityBandKeep(df: DataFrame, idCol: String, textCol: String,
      loFrac: Double, hiFrac: Double,
      vocabCounts: Option[DataFrame] = None,
      bins: Int = 65536, maxNll: Double = 32.0): DataFrame = {
    require(loFrac >= 0 && hiFrac <= 1 && loFrac < hiFrac,
      s"need 0 <= loFrac < hiFrac <= 1, got ($loFrac, $hiFrac)")
    require(bins > 0 && maxNll > 0, "bins and maxNll must be positive")
    // Persisted: the NLL pipeline feeds three actions (histogram,
    // total, final filter) — without the pin each would re-tokenize
    // the corpus. Caller unpersists via the returned plan's lineage
    // ending; at 100 TB substitute a scratch parquet for the pin.
    val nll = unigramNll(df, idCol, textCol, vocabCounts).persist()
    val binned = nll.withColumn("nll_bin",
      least(floor(col("mean_nll") * (bins / maxNll)).cast("long"),
        lit(bins - 1L)))
    // `bins`-row histogram; the cumulative pass and the two quantile
    // scalars run on this tiny frame, never on the corpus.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("nll_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = binned.groupBy(col("nll_bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
    val n = cum.agg(coalesce(sum(col("__c")), lit(0L))).head().getLong(0)
    if (n == 0L) return binned.limit(0)
    val loCut = math.floor(loFrac * n).toLong // docs to drop below
    val hiCut = math.ceil(hiFrac * n).toLong  // last doc position kept
    val loBin = cum.filter(col("__cum") > loCut)
      .agg(min(col("nll_bin"))).head().getLong(0)
    val hiBin = cum.filter(col("__cum") >= hiCut)
      .agg(min(col("nll_bin"))).head().getLong(0)
    binned.filter(col("nll_bin").between(loBin, hiBin))
  }

  /** Gopher repetition block the ns20 stats don't cover: for each n
    * in `ns`, the fraction of the document's characters contained in
    * its single most-frequent word n-gram (Rae et al. 2021, appendix
    * A1.1 "fraction of characters in most common n-gram"; their
    * filter drops docs where the 2/3/4-gram fraction exceeds
    * 0.20/0.18/0.16).
    *
    * Everything is a per-row array computation: tokenize once, build
    * the n-gram array with `transform(sequence(..))`, sort it, and
    * fold a run-length counter over the sorted array — the plan is
    * one shuffle-free projection pair, so at 100 TB each executor
    * scores its own partition and nothing crosses the wire. Cost is
    * O(len·log len) per doc, bounded by the corpus's max doc length
    * exactly like ns20.
    *
    * Determinism: the fraction is one IEEE division of two exact
    * integers (occurrences × gram length over canonical-text length),
    * so it hash-gates across engines. Ties pick the lexicographically
    * smallest gram. Docs with fewer than n tokens (or empty text)
    * report a NULL gram and fraction 0.0.
    *
    * Output: (idCol, top{n}_gram, top{n}_frac) per requested n. */
  /** struct(gram, cnt, frac) of the most frequent word n-gram of
    * `text`, as ONE aggregate expression: the run-length fold over
    * the sorted gram array computes the char fraction in its FINISH
    * lambda, so the whole signal is a single evaluation.
    *
    * Evaluation-cost contract: higher-order-function expressions are
    * INTERPRETED (no codegen common-subexpression elimination), so
    * referencing this column from several output expressions re-runs
    * the fold per reference. Materialize it under an alias and
    * extract fields in a SEPARATE projection — CollapseProject keeps
    * a multi-referenced non-cheap alias in its own Project, which
    * pins the fold to one evaluation per row (the
    * [[topGramRepetition]] / [[qualityEnsemble]] shape). */
  def topGramCol(text: Column, n: Int): Column = {
    val toks = wordTokens(text)
    val nChars = length(Dedup.normText(text))
    // n-grams via n shifted slices zipped together: the token array
    // is evaluated O(n) times PER ROW. (The tempting alternative —
    // transform(sequence(1, m), i => slice(toks, i, n)) — puts
    // `toks` inside the lambda body, where interpreted evaluation
    // recomputes the split+regex PER ELEMENT: O(len²) per document.
    // Measured 2.6× on ns70 at sf0.1.)
    val m = size(toks) - n + 1
    val parts = (1 to n).map(k =>
      slice(toks, lit(k), greatest(m, lit(0))))
    val grams = when(size(toks) >= n,
      parts.reduceLeft((acc, p) =>
        zip_with(acc, p, (a, b) => concat_ws(" ", a, b))))
      .otherwise(array().cast("array<string>"))
    aggregate(
      sort_array(grams),
      struct(lit(null).cast("string").as("bg"), lit(0L).as("bc"),
        lit(null).cast("string").as("cg"), lit(0L).as("cc")),
      (acc, g) => {
        val cc = when(g === acc.getField("cg"),
          acc.getField("cc") + 1L).otherwise(1L)
        struct(
          when(cc > acc.getField("bc"), g)
            .otherwise(acc.getField("bg")).as("bg"),
          when(cc > acc.getField("bc"), cc)
            .otherwise(acc.getField("bc")).as("bc"),
          g.as("cg"), cc.as("cc"))
      },
      acc => {
        val bg = acc.getField("bg")
        val bc = acc.getField("bc")
        struct(bg.as("gram"), bc.as("cnt"),
          when(bc === 0L || nChars === 0, 0.0)
            .otherwise((bc * length(bg)).cast("double") /
              nChars.cast("double")).as("frac"))
      })
  }

  def topGramRepetition(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "need n >= 1")
    // kernel-evaluated Catalyst expression (functions.top_gram) —
    // measured ~6× over the interpreted HOF fold; topGramCol stays
    // as the reference implementation the spec equivalence law pins.
    // Two-stage projection: each kernel evaluates ONCE under its
    // alias; the outer select only extracts fields (see topGramCol).
    val withTops = df.select(col(idCol) +:
      ns.map(n => graft.functions.functions.top_gram(col(textCol), n)
        .as(s"__top$n")): _*)
    withTops.select(col(idCol) +: ns.flatMap { n =>
      Seq(col(s"__top$n").getField("gram").as(s"top${n}_gram"),
        col(s"__top$n").getField("frac").as(s"top${n}_frac"))
    }: _*)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2): a line
    * survives iff it ends in terminal punctuation (. ! ? or a closing
    * double quote), carries at least `minWordsPerLine` words, and
    * contains neither a curly brace (code markers) nor the phrase
    * "lorem ipsum" (placeholder text); a document survives iff at
    * least `minKeptLines` of its lines do. Kept lines are re-joined
    * in original order — line order is positional in the array, so no
    * sort is ever needed.
    *
    * All per-row array ops (split → trim → filter → join): one
    * codegen'd projection, zero shuffles, linear in document size.
    * The predicates are deliberately regex-free string ops so the
    * DuckDB oracle can restate them verbatim.
    *
    * Output: (idCol, clean_text, n_kept, n_dropped) for surviving
    * documents. */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3): DataFrame = {
    require(minWordsPerLine >= 1 && minKeptLines >= 1,
      "line and doc thresholds must be positive")
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val kept = filter(lines, { l =>
      val terminal = l.endsWith(".") || l.endsWith("!") ||
        l.endsWith("?") || l.endsWith("\"")
      val words =
        size(filter(split(l, " "), w => length(w) > 0)) >=
          minWordsPerLine
      terminal && words && !lower(l).contains("lorem ipsum") &&
        !l.contains("{")
    })
    df.select(col(idCol),
        array_join(kept, "\n").as("clean_text"),
        size(kept).cast("long").as("n_kept"),
        (size(lines) - size(kept)).cast("long").as("n_dropped"))
      .filter(col("n_kept") >= minKeptLines)
  }

  /** Fixed linear-classifier weights for [[linearQualityScore]], in
    * micro-units (1e-6) so the whole model evaluates in exact 64-bit
    * integer arithmetic. Positive mass on closed-class English
    * function words (the fastText-style "looks like running prose"
    * signal), negative mass on boilerplate/spam markers — the same
    * shape as the quality classifiers used for web-corpus curation
    * (e.g. CCNet / GPT-3's WebText classifier), shrunk to a
    * checked-in table so the gate is bit-exact. */
  val defaultQualityWeights: Seq[(String, Long)] = Seq(
    "the" -> 40000L, "and" -> 30000L, "of" -> 30000L, "to" -> 25000L,
    "a" -> 25000L, "in" -> 20000L, "is" -> 20000L, "it" -> 15000L,
    "for" -> 15000L, "with" -> 15000L,
    "lorem" -> -250000L, "ipsum" -> -250000L, "click" -> -120000L,
    "subscribe" -> -150000L, "cookie" -> -100000L, "buy" -> -90000L,
    "winner" -> -120000L, "free" -> -80000L, "http" -> -60000L)

  /** Linear (fastText-style) document quality classifier with a
    * FIXED, checked-in weight table: logit = bias + Σ weight(token)
    * over every token occurrence, all in integer micro-units so the
    * score is bit-exact on any engine, partitioning, or evaluation
    * order (integer addition is associative — no float-sum drift).
    *
    * The weight table is tiny and rides into codegen as a literal
    * MAP lookup per token — no broadcast join, no UDF, no shuffle;
    * the plan is one map-side projection. Swapping in a real trained
    * model is a data change (a bigger `weightsMicro`), not a plan
    * change; past literal-map size (~thousands of entries) switch to
    * a broadcast-join on exploded tokens.
    *
    * Output: (idCol, n_hits, logit_micro, keep) where n_hits counts
    * weighted-token occurrences and keep = logit_micro > 0. */
  /** The classifier logit as a Column (see [[linearQualityScore]]),
    * exposed for one-projection ensembles. */
  def linearLogitCol(text: Column,
      weightsMicro: Seq[(String, Long)] = defaultQualityWeights,
      biasMicro: Long = -50000L): Column = {
    require(weightsMicro.nonEmpty, "need at least one weight")
    val wmap = map(weightsMicro.flatMap {
      case (t, w) => Seq(lit(t), lit(w)) }: _*)
    val ws = transform(wordTokens(text), t => element_at(wmap, t))
    aggregate(ws, lit(biasMicro), (acc, w) => acc + coalesce(w, lit(0L)))
  }

  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
      weightsMicro: Seq[(String, Long)] = defaultQualityWeights,
      biasMicro: Long = -50000L): DataFrame = {
    require(weightsMicro.nonEmpty, "need at least one weight")
    val wmap = map(weightsMicro.flatMap {
      case (t, w) => Seq(lit(t), lit(w)) }: _*)
    val ws = transform(wordTokens(col(textCol)),
      t => element_at(wmap, t))
    val logit = aggregate(ws, lit(biasMicro),
      (acc, w) => acc + coalesce(w, lit(0L)))
    df.select(col(idCol),
      size(filter(ws, w => w.isNotNull)).cast("long").as("n_hits"),
      logit.as("logit_micro"),
      (logit > 0L).as("keep"))
  }

  /** Element-wise Long-vector sum — the d-sized map-combinable
    * partial the training loop aggregates per epoch (the ns101
    * GramAggregator shape: the exchange carries one d-vector per
    * partition, never rows; integer addition is associative, so the
    * sum is bit-exact under any partitioning). */
  final class VecSumAggregator(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](dim)
    override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      if (v != null && v.length == dim) {
        var i = 0; while (i < dim) { buf(i) += v(i); i += 1 }
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

  /** Linear quality-classifier TRAINING — the fit side of ns73's
    * apply path (which has applied fixed checked-in weights since
    * round 6; nothing produced them until now). A deterministic
    * batch perceptron distills the Gopher heuristic gate
    * ([[qualityScoreCol]] == 1.0 as teacher labels) into token
    * weights over a fixed feature vocabulary:
    *
    *   w ← 0;  per epoch:  w ← w + Σ_{y·(w·x) ≤ 0} y·x
    *
    * Everything is INTEGER: features are token counts (+ a bias
    * count of 1), the margin is a dot product of longs, the epoch
    * gradient is an element-wise long sum. The update depends only
    * on the SET of misclassified docs — order- and partition-
    * independent — so an independent trainer over the same corpus
    * reproduces the weights bit-for-bit (tools/gen_linear.py, the
    * ns88 two-implementation convention).
    *
    * Scale shape: the (y, x) feature frame is projected once and
    * localCheckpointed (d+1 longs per doc); each epoch is ONE scan
    * of it with a d-sized [[VecSumAggregator]] partial merged
    * map-side — at 100 TB an epoch costs a scan, and the driver
    * holds only the d-vector (the ns102 summary rule). On a cluster
    * the checkpoint becomes a stored feature table.
    *
    * fit∘apply composition: the returned (feature, weight) rows
    * plug straight into [[linearLogitCol]] (bias = the `__bias` row)
    * and reproduce the trainer's own margins — a tested law.
    *
    * Output: (feature, weight) — vocabulary order, `__bias` last. */
  def trainLinearQuality(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String] = defaultQualityWeights.map(_._1),
      epochs: Int = 16): DataFrame = {
    require(vocab.nonEmpty && vocab.distinct.size == vocab.size,
      "vocab must be non-empty and duplicate-free")
    require(epochs >= 1, "epochs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = vocab.size + 1
    val s1 = df.select(
      when(qualityScoreCol(col(textCol)) === 1.0, 1L).otherwise(-1L)
        .as("y"),
      wordTokens(col(textCol)).as("__toks"))
    val feats = s1.select(col("y"),
      array(vocab.map(wd =>
        size(filter(col("__toks"), t => t === lit(wd))).cast("long")) :+
        lit(1L): _*).as("x"))
      .localCheckpoint(true)
    val vecsum = org.apache.spark.sql.functions.udaf(
      new VecSumAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    var w = new Array[Long](dim)
    for (_ <- 1 to epochs) {
      val wLit = array(w.toSeq.map(lit): _*)
      val g = feats
        .filter(col("y") * aggregate(
          zip_with(col("x"), wLit, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v) <= 0L)
        .select(transform(col("x"), xi => xi * col("y")).as("g"))
        .agg(vecsum(col("g")).as("g"))
        .head.getSeq[Long](0)
      w = w.zip(g).map { case (a, b) => a + b }
    }
    (vocab :+ "__bias").zip(w.toSeq).toDF("feature", "weight")
  }

  /** Pool-adjacent-violators over per-bucket (n_pos, n) label
    * summaries — EXACT integer isotonic regression (violation test
    * and pooling are cross-multiplied longs; no float means until
    * the final micro-unit readout). Input must be sorted by bucket.
    * Returns one (bucket, pooledPos, pooledN) row per input bucket.
    * Driver-side by design: the input is a B-row summary (the
    * ns102 rule — drivers hold summaries, never rows). */
  def pavPools(buckets: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long)] = {
    case class Pool(var pos: Long, var n: Long,
        members: scala.collection.mutable.ArrayBuffer[Long])
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    buckets.foreach { case (bk, n, pos) =>
      pools += Pool(pos, n,
        scala.collection.mutable.ArrayBuffer(bk))
      // merge while the tail pool's mean dips below its predecessor
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val c = pools.last
        c.pos * a.n < a.pos * c.n
      }) {
        val c = pools.remove(pools.length - 1)
        val a = pools.last
        a.pos += c.pos; a.n += c.n; a.members ++= c.members
      }
    }
    pools.flatMap(p => p.members.map(m => (m, p.pos, p.n))).toSeq
      .sortBy(_._1)
  }

  /** Isotonic (PAV) calibration of an integer score against a
    * binary label — the read-out that turns a classifier logit into
    * a monotone P(label=1) estimate (Zadrozny & Elkan 2002's
    * isotonic option; chosen over Platt scaling because PAV is
    * EXACT in integer arithmetic — no sigmoid, no float fitting, so
    * an independent implementation agrees bit-for-bit).
    *
    * Scale shape: two map-combinable aggregations over the scored
    * frame — a (min, max) pair, then a B-bucket (n, n_pos) summary —
    * and the driver sees only the B-row table it runs PAV on (the
    * ns102 summary rule). Bucketing is fixed-width integer floor
    * over [min, max]; all quantities stay far below 2^52, so the
    * floor is exact. Output: (bucket, n, n_pos, cal_micro) for
    * occupied buckets, cal_micro = floor(1e6 · pooledPos/pooledN) —
    * non-decreasing in bucket by construction (a tested law). */
  def isotonicCalibrate(scored: DataFrame, scoreCol: String,
      labelCol: String, nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val spark = scored.sparkSession
    import spark.implicits._
    val (lo, hi) = scored.agg(
      min(col(scoreCol)).cast("long"), max(col(scoreCol)).cast("long"))
      .as[(Long, Long)].head()
    val width = hi - lo + 1L
    val bucket = floor((col(scoreCol).cast("long") - lo) * nBuckets
      / width).cast("long").as("bucket")
    val perBucket = scored
      .select(bucket, col(labelCol).cast("long").as("__y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val pooled = pavPools(perBucket)
      .map { case (bk, pos, n) => bk -> ((pos, n)) }.toMap
    perBucket.map { case (bk, n, pos) =>
      val (ps, pn) = pooled(bk)
      (bk, n, pos, 1000000L * ps / pn)
    }.toDF("bucket", "n", "n_pos", "cal_micro")
  }

  /** ns130 entry: score the corpus with the checked-in ns73 linear
    * classifier, label it with the ns09 Gopher gate (the same
    * teacher ns123 trains against), and calibrate score → P(pass)
    * isotonically. One projection computes both signals; see
    * [[isotonicCalibrate]] for the aggregation shape. */
  def isotonicQualityCalibration(df: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 16): DataFrame = {
    val scored = df.select(col(idCol),
      linearLogitCol(col(textCol)).as("score"),
      when(qualityScoreCol(col(textCol)) === 1.0, 1L).otherwise(0L)
        .as("label"))
    isotonicCalibrate(scored, "score", "label", nBuckets)
  }

  /** Majority-vote quality ensemble: three independent signals —
    * the Gopher-rule heuristic score ([[qualityScoreCol]]), the
    * linear classifier logit ([[linearLogitCol]]), and the top-2-gram
    * repetition fraction ([[topGramCol]]) — each cast to a boolean
    * vote, kept iff at least `minVotes` agree. Ensembling filters is
    * how production curation hedges any one signal's blind spots
    * (each individual filter over-rejects somewhere); stacking them
    * as COLUMNS in one projection means the whole ensemble is still
    * a single map-side pass with no joins, no shuffles, no second
    * scan of the corpus. All three votes are deterministic integer/
    * exact-division comparisons. Output: (idCol, q_ok, logit_ok,
    * rep_ok, votes, keep). */
  def qualityEnsemble(df: DataFrame, idCol: String, textCol: String,
      minScore: Double = 0.6, maxTop2Frac: Double = 0.2,
      minVotes: Int = 2): DataFrame = {
    // two-stage projection: each signal evaluates ONCE under its
    // alias (the interpreted folds must not re-run per reference —
    // see topGramCol); the outer select is cheap boolean arithmetic
    val sig = df.select(col(idCol),
      (qualityScoreCol(col(textCol)) >= minScore).as("q_ok"),
      (linearLogitCol(col(textCol)) > 0L).as("logit_ok"),
      (graft.functions.functions.top_gram(col(textCol), 2)
        .getField("frac") <= maxTop2Frac).as("rep_ok"))
    val votes = col("q_ok").cast("long") + col("logit_ok").cast("long") +
      col("rep_ok").cast("long")
    sig.select(col(idCol), col("q_ok"), col("logit_ok"), col("rep_ok"),
      votes.as("votes"), (votes >= minVotes).as("keep"))
  }

  /** Canary-string scan: report every (document, canary) hit for a
    * small fixed set of marker strings — the eval-set canary sweep
    * (à la BIG-bench's canary GUID) a training corpus runs before
    * release, plus the generic "did our own test fixtures leak into
    * the corpus" audit. The canary set is tiny by nature, so it
    * rides into the row expression as an array literal: one map-side
    * contains() scan per canary per document, no join, no shuffle;
    * non-matching documents emit nothing (explode of an empty
    * filter). At a larger marker set, switch to an Aho-Corasick
    * mapPartitions pass — the contract (substring hit report) stays.
    * Output: (idCol, canary), hit rows only. */
  /** Content-addressed canary INSERTION — the write side of
    * [[canaryScan]] (the BIG-bench-GUID discipline run proactively:
    * plant unique markers in a known, content-addressed subset of
    * YOUR corpus before release, then any model or derived dataset
    * that reproduces a marker provably trained on this corpus
    * version). Selection and marker text are both md5-derived (the
    * ns17 idiom): no RNG, reproducible across reruns and engines,
    * and the planted set is recoverable from (salt, rateDen) alone.
    * One map-side projection. Output: (idCol, text_out, planted,
    * canary — null when unplanted). */
  def plantCanaries(df: DataFrame, idCol: String, textCol: String,
      salt: String = "canary", rateDen: Int = 20): DataFrame = {
    require(rateDen >= 1, "rateDen must be positive")
    val sel = Sampling.hashBucket(col(idCol), salt, rateDen) === 0
    val canary = concat(lit("CANARY-"),
      substring(md5(concat(col(idCol).cast("string"),
        lit(":" + salt + ":tok"))), 1, 16))
    df.select(col(idCol),
      when(sel, concat(col(textCol), lit(" "), canary))
        .otherwise(col(textCol)).as("text_out"),
      sel.as("planted"),
      when(sel, canary).otherwise(lit(null).cast("string"))
        .as("canary"))
  }

  /** Deterministic email pseudonymization — tokenization, not
    * redaction: every occurrence of an address is replaced by a
    * STABLE md5-derived pseudonym, so the same address maps to the
    * same token corpus-wide and cross-document joins / reply threads
    * survive the scrub (the property ns19's `<EMAIL>` placeholder
    * destroys, and the reason tokenization exists). Map-side only:
    * addresses are extracted per document, the replacement fold runs
    * over that (short) list. Caveat: addresses that are substrings
    * of other extracted addresses in the SAME document can interact
    * in the fold — not a shape real addresses take.
    * Output: (idCol, text_out, n_emails). */
  def pseudonymizeEmails(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    def pseudo(e: Column): Column = concat(lit("user-"),
      substring(md5(e), 1, 12), lit("@anon.invalid"))
    df.select(col(idCol), col(textCol),
        regexp_extract_all(col(textCol), lit(emailRe), lit(0))
          .as("__em"))
      .select(col(idCol),
        aggregate(col("__em"), col(textCol),
          (acc, e) => replace(acc, e, pseudo(e))).as("text_out"),
        size(col("__em")).cast("long").as("n_emails"))
  }

  def canaryScan(df: DataFrame, idCol: String, textCol: String,
      canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "need at least one canary string")
    df.select(col(idCol),
      explode(filter(array(canaries.map(lit): _*),
        c => col(textCol).contains(c))).as("canary"))
  }

  /** Cross-snapshot vocabulary drift: symmetric-KL contribution per
    * token between an old and a new corpus snapshot — the
    * distribution-shift monitor a recurring curation pipeline runs
    * before promoting a new crawl (did the token mix move, and WHICH
    * tokens moved it). Laplace-smoothed over the union vocabulary so
    * tokens absent from one side still score; the per-token
    * contribution p·ln(p/q) + q·ln(q/p) is quantized ONCE to
    * 2^fracBits fixed-point (ns58's idiom — every input to the libm
    * calls is a ratio of exact integers, so both engines see
    * identical doubles), and the top-k cut is (skl_fx desc, token).
    *
    * Two token-count aggregations + one full-outer join on the token
    * key + a k-row TakeOrdered: the exchanges carry one row per
    * DISTINCT token (map-side partial aggs), never the corpus.
    * Output: (token, n_old, n_new, skl_fx). */
  def vocabDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      k: Int = 50, alpha: Double = 0.5,
      fracBits: Int = 24): DataFrame = {
    require(k >= 1 && alpha > 0 && fracBits >= 1 && fracBits <= 30,
      "bad vocabDrift parameters")
    val scale = (1L << fracBits).toDouble
    def counts(df: DataFrame, as: String) = df
      .select(explode(wordTokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as(as))
    val j = counts(oldDf, "n_old")
      .join(counts(newDf, "n_new"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val tot = j.agg(coalesce(sum(col("n_old")), lit(0L)),
      coalesce(sum(col("n_new")), lit(0L)), count(lit(1))).head()
    val (ta, tb, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    if (ta == 0L || tb == 0L)
      return j.select(col("token"), col("n_old"), col("n_new"))
        .limit(0).withColumn("skl_fx", lit(0L))
    val da = ta + alpha * (v + 1.0)
    val db = tb + alpha * (v + 1.0)
    val p = (col("n_old").cast("double") + alpha) / da
    val q = (col("n_new").cast("double") + alpha) / db
    val contrib = round((p * log(p / q) + q * log(q / p)) * scale)
      .cast("long")
    j.select(col("token"), col("n_old"), col("n_new"),
        contrib.as("skl_fx"))
      .orderBy(col("skl_fx").desc, col("token")).limit(k)
  }

  /** Feature hashing (the hashing trick): bag-of-words folded onto a
    * fixed `dim`-cell grid by the repo's DuckDB-replicable md5 hash —
    * the vocabulary-free text vectorizer in front of a linear model
    * or [[graft.ns.Embeddings.signedProjection]]-style reduction. No
    * vocab table to build, broadcast, or drift (contrast ns73's fixed
    * weight table): the "vocabulary" is the hash function, so the op
    * is one map-side explode + one (id, cell) count — sparse rows
    * out, exact integer counts, collisions deterministic.
    *
    * Scale shape: the exchange carries ≤ min(tokens, dim) rows per
    * document (nnz law in spec); dim bounds the vector, not the
    * corpus. Output: (idCol, cell, cnt). */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    df.select(col(idCol),
        explode(wordTokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .withColumn("cell",
        conv(substring(md5(concat(col("__tok"), lit(":fh"))), 1, 8),
          16, 10).cast("long") % dim)
      .groupBy(col(idCol), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Zipf rank–frequency fit over the head of the vocabulary — the
    * corpus-health exponent (Zipf 1949: natural text has
    * freq ∝ rank^(−s) with s ≈ 1; template spam, dedup failures,
    * and synthetic floods bend the head visibly before any
    * per-document gate fires). Least-squares slope of ln(freq) on
    * ln(rank) over the top `topRanks` tokens.
    *
    * Determinism (the ns58 idiom): each ln is quantized ONCE to
    * 2^fracBits fixed-point (libm ln is bit-stable between this
    * JVM and DuckDB — measured, ns58/ns75/ns79), every regression
    * sum is an exact integer, and the closed-form slope is one IEEE
    * division of two exact longs. Magnitude audit at fracBits=20,
    * topRanks=100: x ≤ ln(100)·2^20 < 5e6, y ≤ ln(2^63)·2^20 <
    * 4.6e7, Σxy ≤ 100·2.3e14 — every sum far inside long range.
    *
    * Scale shape: one map-combinable vocab count, a top-`topRanks`
    * head (WindowGroupLimit keeps k rows per partition before the
    * single exchange), and a 1-row aggregate. Output one row:
    * (n_ranks, sum_x, sum_y, sum_xy, sum_xx, slope, zipf_exponent
    * = −slope). */
  def zipfFit(df: DataFrame, textCol: String, topRanks: Int = 100,
      fracBits: Int = 20): DataFrame = {
    require(topRanks >= 2, "need at least 2 ranks to fit a slope")
    require(fracBits >= 1 && fracBits <= 24, s"bad fracBits $fracBits")
    val scale = (1L << fracBits).toDouble
    val counts = df
      .select(explode(wordTokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    val head = counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topRanks)
      .select(
        round(log(col("rank").cast("double")) * scale).cast("long")
          .as("__x"),
        round(log(col("cnt").cast("double")) * scale).cast("long")
          .as("__y"))
    val num = col("n_ranks") * col("sum_xy") -
      col("sum_x") * col("sum_y")
    val den = col("n_ranks") * col("sum_xx") -
      col("sum_x") * col("sum_x")
    head.agg(count(lit(1)).as("n_ranks"),
        coalesce(sum(col("__x")), lit(0L)).as("sum_x"),
        coalesce(sum(col("__y")), lit(0L)).as("sum_y"),
        coalesce(sum(col("__x") * col("__y")), lit(0L)).as("sum_xy"),
        coalesce(sum(col("__x") * col("__x")), lit(0L)).as("sum_xx"))
      .select(col("n_ranks"), col("sum_x"), col("sum_y"),
        col("sum_xy"), col("sum_xx"),
        when(den > 0, num.cast("double") / den.cast("double"))
          .otherwise(lit(0.0)).as("slope"))
      .withColumn("zipf_exponent", -col("slope"))
  }

  /** Control/special tokens that must never appear in raw training
    * text: chat-template and tokenizer sentinels that, left in a web
    * corpus, let a crawled page inject turn boundaries or
    * end-of-text markers into training examples (the
    * delimiter-injection defense). Literal strings — scrubbed by
    * exact replace, no regex. */
  val specialTokens: Seq[String] = Seq(
    "<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|system|>",
    "<|user|>", "<|assistant|>", "<|pad|>", "</s>", "<s>",
    "[INST]", "[/INST]")

  /** Strip [[specialTokens]] from text — the [[repairMojibakeCol]]
    * chain shape: one ordered literal-replace pass per `passes`, so
    * a token NESTED inside another (crafted so that removing the
    * inner one re-forms the outer: `<|endof<|im_start|>text|>`)
    * heals one layer per pass; two passes cover every single
    * nesting (law in NsTextOpsSpec). Fully codegen'd. */
  def specialTokenScrubCol(text: Column, passes: Int = 2): Column = {
    require(passes >= 1, "passes must be positive")
    (1 to passes).foldLeft(text) { case (c, _) =>
      specialTokens.foldLeft(c) { case (acc, tok) =>
        replace(acc, lit(tok), lit("")) }
    }
  }

  /** DataFrame form of [[specialTokenScrubCol]] with the audit
    * column: n_stripped = chars removed (0 = clean doc).
    * Output: (idCol, clean_text, n_stripped). */
  def specialTokenScrub(df: DataFrame, idCol: String, textCol: String,
      passes: Int = 2): DataFrame = {
    val cleaned = specialTokenScrubCol(col(textCol), passes)
    df.select(col(idCol), cleaned.as("clean_text"),
      (length(col(textCol)) - length(cleaned)).cast("long")
        .as("n_stripped"))
  }

  /** Per-group n-gram diversity — the repetitiveness axis of a
    * corpus datasheet (distinct-n over total-n, the self-repetition
    * complement of Self-BLEU): a source whose 3-gram diversity
    * collapses is template spam or near-dup flooding even when
    * per-document quality gates pass. One gram pass per n
    * ([[Dedup.shingleStream]] — map-side), one map-combinable
    * aggregate each; diversity = one IEEE division of exact longs.
    * Output: (groupCol, n, total_grams, distinct_grams, diversity). */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "need n >= 1")
    ns.map { n =>
      Dedup.shingleStream(df.select(col(groupCol), col(textCol)),
          groupCol, textCol, n)
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("total_grams"),
          countDistinct(col("gram")).as("distinct_grams"))
        .withColumn("n", lit(n.toLong))
    }.reduce(_.unionByName(_))
      .select(col(groupCol), col("n"), col("total_grams"),
        col("distinct_grams"),
        (col("distinct_grams").cast("double") /
          col("total_grams").cast("double")).as("diversity"))
  }

  /** Confusable-to-Latin homoglyph table: Cyrillic and Greek code
    * points that render (near-)identically to Basic Latin letters —
    * the classic dedup-evasion / spam-cloaking substitution set
    * (Unicode TR #39's confusables, restricted to the
    * single-codepoint 1:1 cases `translate` can map). Paired
    * (confusable, latin), both BMP. */
  val homoglyphPairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase lookalikes
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
    'х' -> 'x', 'у' -> 'y', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
    // Cyrillic uppercase
    'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K', 'М' -> 'M',
    'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P', 'С' -> 'C', 'Т' -> 'T',
    'Х' -> 'X', 'І' -> 'I', 'Ѕ' -> 'S', 'Ј' -> 'J',
    // Greek uppercase + the two strong lowercase confusables
    'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E', 'Ζ' -> 'Z', 'Η' -> 'H',
    'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M', 'Ν' -> 'N', 'Ο' -> 'O',
    'Ρ' -> 'P', 'Τ' -> 'T', 'Υ' -> 'Y', 'Χ' -> 'X',
    'ο' -> 'o', 'ν' -> 'v')

  /** Map confusable Cyrillic/Greek homoglyphs to their Latin
    * lookalikes — one codegen'd `translate` (a per-codepoint table
    * lookup, no regex). The dedup-evasion defense: a spam corpus
    * that swaps Latin 'o' for Cyrillic 'о' defeats fingerprint
    * dedup, n-gram decontamination, AND the word-keyed quality
    * classifier at once; scrubbing restores one canonical key for
    * all three (composition law in NsTextOpsSpec). Idempotent by
    * construction: the target alphabet is disjoint from the source
    * alphabet. */
  def homoglyphNormalize(c: Column): Column =
    translate(c, homoglyphPairs.map(_._1).mkString,
      homoglyphPairs.map(_._2).mkString)

  /** [[homoglyphNormalize]] over a corpus with a changed flag —
    * curation stage 0.7 (after mojibake repair and NFC, before
    * fingerprinting). Output: (idCol, clean_text, changed). */
  def homoglyphScrub(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), col(textCol),
        homoglyphNormalize(col(textCol)).as("clean_text"))
      .select(col(idCol), col("clean_text"),
        (col(textCol) =!= col("clean_text")).as("changed"))

  /** Sliding-window document chunking — the retrieval-index /
    * long-context prep step: each document becomes overlapping
    * `window`-word chunks at `stride`-word steps (stride < window ⇒
    * adjacent chunks share window−stride words, so no boundary
    * sentence is ever split across ALL chunks containing it). Chunks
    * are cut over the canonical whitespace-normalized token stream
    * ([[wordTokens]] — the convention every gram operator here
    * shares), and each row carries its word offset so a consumer can
    * map retrieval hits back into the source document.
    *
    * Scale shape: one map-side projection — tokenize once behind a
    * projection boundary (the shingleStream idiom), explode a
    * per-doc chunk-index sequence, and `slice` per output row; no
    * join, no shuffle, no per-element re-tokenization (the
    * interpreted-HOF trap). Chunk count per doc is
    * 1 + ceil(max(n−window, 0) / stride) — the last chunk always
    * reaches the final word. Empty docs produce no chunks.
    * Output: (idCol, chunk_id, start_word, n_words, chunk_text). */
  def docChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val words = df
      .select(col(idCol), wordTokens(col(textCol)).as("__words"))
      .select(col(idCol),
        filter(col("__words"), w => length(w) > 0).as("__words"))
      .filter(size(col("__words")) > 0)
    val extra = floor((greatest(size(col("__words")) - lit(window),
      lit(0)).cast("double") + (stride - 1)) / stride).cast("int")
    words
      .select(col(idCol), col("__words"),
        explode(sequence(lit(0), extra)).as("__c"))
      .select(col(idCol),
        col("__c").cast("long").as("chunk_id"),
        (col("__c").cast("long") * stride).as("start_word"),
        slice(col("__words"), col("__c") * stride + 1, lit(window))
          .as("__cw"))
      .select(col(idCol), col("chunk_id"), col("start_word"),
        size(col("__cw")).cast("long").as("n_words"),
        array_join(col("__cw"), " ").as("chunk_text"))
  }

  /** Precision/recall operating curve of a score column against a
    * boolean label — the threshold sweep a filtering pipeline runs
    * BEFORE committing to a quality-gate cutoff (each output row is
    * the operating point "predict positive at score ≥ this row's
    * score"). Complements [[isotonicCalibrate]]: calibration fixes
    * the probabilities, the curve picks the cutoff.
    *
    * Scale shape: one aggregate per DISTINCT score (map-combinable
    * corpus pass), then the cumulative window runs over the
    * |distinct scores|-row summary — the ns144 bounded-summary
    * convention, no corpus-sized global window — and the positive
    * total comes from summing that same summary. Deterministic:
    * integer counts; precision/recall are each ONE IEEE division of
    * two exact longs.
    * Output: (scoreCol, n_pred, tp, precision, recall), descending
    * operating thresholds. */
  def prCurve(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(labelCol).cast("long")).as("__pos"))
    val wc = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val tot = per.agg(coalesce(sum(col("__pos")), lit(0L)).as("__p_all"))
    per
      .withColumn("n_pred", sum(col("__n")).over(wc))
      .withColumn("tp", sum(col("__pos")).over(wc))
      .crossJoin(broadcast(tot))
      .select(col(scoreCol), col("n_pred"), col("tp"),
        (col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        when(col("__p_all") > 0,
          col("tp").cast("double") / col("__p_all").cast("double"))
          .otherwise(lit(0.0)).as("recall"))
  }
}
