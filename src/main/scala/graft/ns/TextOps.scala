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

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t)))

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

  /** Gopher-style quality gate over [[textStats]]: five boolean checks
    * plus the fraction passed as a score. A training pipeline keeps
    * documents with quality_score = 1.0 (or a chosen cut). */
  def qualityScore(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val s = textStats(df, idCol, textCol)
    val checks = Seq(
      "chk_chars" -> col("n_chars").between(50, 100000),
      "chk_words" -> col("n_words").between(10, 50000),
      "chk_avg_word_len" -> col("avg_word_len").between(2.0, 12.0),
      "chk_punct" -> (col("punct_ratio") <= 0.2),
      "chk_stopwords" -> (col("stopword_ratio") >= 0.01))
    val withChecks = checks.foldLeft(s) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    withChecks.withColumn("quality_score",
      checks.map { case (n, _) => col(n).cast("int") }
        .reduce(_ + _).cast("double") / checks.size)
  }

  /** Marker-token language identification: count hits from each
    * language's closed-class marker set, take the argmax with a fixed
    * preference order (en, de, fr, es), 'und' when nothing hits.
    * Pure heuristic — by design cheap, deterministic, and expressible
    * in ANSI SQL for the oracle. Output: (idCol, lang_pred). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wordTokens(col(textCol))
    val en = countIn(toks, stopwordsEn)
    val de = countIn(toks, markersDe)
    val fr = countIn(toks, markersFr)
    val es = countIn(toks, markersEs)
    df.select(col(idCol),
      when(en >= de && en >= fr && en >= es && en > 0, "en")
        .when(de >= fr && de >= es && de > 0, "de")
        .when(fr >= es && fr > 0, "fr")
        .when(es > 0, "es")
        .otherwise("und").as("lang_pred"))
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
    Dedup.shingles(df, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("gram")).as("fp"))
      .filter(pmod(col("fp"), lit(p)) === 0)
      .distinct()
}
