package graft.ns

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization to token IDS (SURVEY.md §2.8 [NS])
  * — the step beyond [[TextOps.bpeTokenCount]]'s count proxy: emit the
  * actual id sequence a training pipeline packs into context windows.
  *
  * The merge table is FIXED and checked in
  * (`src/main/resources/graft/bpe/merges.txt`, trained offline by
  * `tools/gen_bpe.py` on the fixture corpus with classic
  * highest-pair-count/lexicographic-tie-break BPE training); the
  * engine only APPLIES merges — training is an offline concern, as in
  * any production tokenizer. Vocabulary ids are a pure function of the
  * merge table: `<unk>`=0, printable ASCII 0x21..0x7E in codepoint
  * order = 1..94, then one id per merge in file order = 95+k. No id
  * table needs shipping — both sides derive it.
  *
  * Encoding semantics (the GPT-2 shape, public knowledge):
  *  1. canonicalize like [[Dedup.normText]] (trim spaces, lowercase,
  *     collapse whitespace) so ids are partition/replay stable;
  *  2. pre-tokenize into letter runs / digit runs / single marks —
  *     the SAME class split [[TextOps.bpeTokenCount]] counts, so
  *     `size(token_ids) >= bpeTokenCount(norm)` always (merges only
  *     join within a pre-token, unknowns map to one id each);
  *  3. per pre-token, repeatedly merge the LOWEST-RANK adjacent
  *     symbol pair (all its non-overlapping occurrences, left to
  *     right) until no pair is in the table;
  *  4. map symbols to ids; symbols outside the derived vocabulary
  *     (non-ASCII input) become `<unk>`.
  *
  * Execution shape: the ranks map is a few KB — broadcast once and
  * applied map-side in per-partition batches (the
  * [[Multimodal.decodeFeatures]] pattern; no per-row UDF, no driver
  * data path). Encoding is embarrassingly parallel: at 100 TB this is
  * a pure map stage that pipelines with whatever shuffle follows.
  */
object Bpe {

  /** One encoded document: id + the token-id sequence. */
  final case class Encoded(doc_id: Long, token_ids: Array[Int])

  /** Compiled codec: merge ranks + symbol→id table. */
  final case class Codec(ranks: Map[(String, String), Int],
      ids: Map[String, Int]) extends Serializable {
    val unkId: Int = 0
    /** id → symbol, for [[Bpe.decode]]. Lazy: rebuilt per executor
      * JVM after broadcast, never serialized. */
    @transient lazy val symbols: Map[Int, String] =
      ids.map(_.swap)
  }

  /** [[Dedup.normText]] in plain JVM code (trim spaces, lowercase,
    * collapse ASCII whitespace) — the encoder runs in mapPartitions,
    * not in a Column expression, and MUST agree with the SQL-side
    * canonicalization used everywhere else. */
  def norm(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
  }

  /** Pre-tokenizer over canonical text: letter runs, digit runs,
    * single non-alphanumeric marks. Matches
    * [[TextOps.bpeTokenCount]]'s class split (lowercased input). */
  private val preToken = java.util.regex.Pattern
    .compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  def preTokens(normed: String): Iterator[String] = {
    val m = preToken.matcher(normed)
    new Iterator[String] {
      private var ready = m.find()
      def hasNext: Boolean = ready
      def next(): String = { val g = m.group(); ready = m.find(); g }
    }
  }

  /** Derive the full codec from an ordered merge list. */
  def codec(merges: Seq[(String, String)]): Codec = {
    val base = (0x21 to 0x7e).map(_.toChar.toString)
    val ids = Map("<unk>" -> 0) ++
      base.zipWithIndex.map { case (s, i) => s -> (i + 1) } ++
      merges.zipWithIndex.map { case ((a, b), k) =>
        (a + b) -> (base.size + 1 + k) }
    Codec(merges.zipWithIndex.map { case (p, k) => p -> k }.toMap, ids)
  }

  /** The checked-in default merge table (classpath resource). */
  lazy val default: Codec = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "missing resource graft/bpe/merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try codec(src.getLines().filter(_.nonEmpty).map { line =>
      val i = line.indexOf(' ')
      (line.substring(0, i), line.substring(i + 1))
    }.toSeq)
    finally src.close()
  }

  /** The greedy merge loop shared by both id mappings: merge ALL
    * non-overlapping occurrences of the lowest-rank adjacent pair,
    * repeat until no pair ranks. Returns the final symbol sequence. */
  private def mergeSyms(word: String,
      c: Codec): scala.collection.mutable.ArrayBuffer[String] = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    // split by CODE POINT, not Java char: an astral code point must be
    // ONE symbol (the Python twin's list(word) semantics) — split by
    // char it becomes two lone surrogates, which is one spurious extra
    // <unk> in the strict codec and mojibake ('?' bytes) under byte
    // fallback
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue; var bi = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = c.ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val pa = syms(bi); val pb = syms(bi + 1)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == pa && syms(k + 1) == pb) {
            out += pa + pb; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Greedy BPE over one pre-token: merge ALL non-overlapping
    * occurrences of the lowest-rank adjacent pair, repeat until no
    * pair ranks. */
  def encodeWord(word: String, c: Codec): Array[Int] =
    mergeSyms(word, c).iterator
      .map(s => c.ids.getOrElse(s, c.unkId)).toArray

  /** Encode a full text: canonicalize, pre-tokenize, BPE per
    * pre-token, concatenate. */
  def encode(text: String, c: Codec): Array[Int] =
    preTokens(norm(text)).flatMap(encodeWord(_, c)).toArray

  /** Corpus encode: (idCol long, textCol string) → [[Encoded]] rows.
    * Map-side only; the codec is broadcast once per job and applied in
    * per-partition batches (vectorized-UDF shape, no row-at-a-time
    * driver involvement). Docs whose canonical text yields no
    * pre-tokens emit an EMPTY id array (kept, not dropped — packing
    * needs the row to account for the document). */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
      c: Codec = default, batchSize: Int = 64): Dataset[Encoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cod = bc.value
        it.grouped(batchSize).flatMap(_.map { case (id, text) =>
          Encoded(id, encode(if (text == null) "" else text, cod))
        })
      }
  }

  /** Decode a token-id sequence back to text: every id maps to its
    * symbol (merge symbols expand to the character pair they joined),
    * concatenated. The base alphabet covers all printable ASCII, so
    * on canonical lowercase text decode∘encode loses exactly the
    * whitespace the pre-tokenizer discards and NOTHING else — the
    * losslessness contract the ns77 gate checks corpus-wide.
    * Unknown ids render as an empty string (an <unk> already lost
    * its surface form at encode time). */
  def decode(ids: Array[Int], c: Codec): String = {
    val sb = new java.lang.StringBuilder(ids.length * 2)
    var i = 0
    while (i < ids.length) {
      val s = c.symbols.getOrElse(ids(i), "")
      if (ids(i) != c.unkId) sb.append(s)
      i += 1
    }
    sb.toString
  }

  /** BPE merge-table LEARNING (Sennrich et al. 2016, the public
    * algorithm): iteratively merge the most frequent adjacent symbol
    * pair until `k` merges are learned.
    *
    * Scale shape — the part that matters at 100 TB: the ONLY corpus-
    * sized work is one distributed pre-token count (explode →
    * groupBy, map-side combined; the exchange carries one row per
    * DISTINCT pre-token). Learning then iterates on that compacted
    * (word → freq) table — thousands of rows, driver-side — which is
    * exactly how production tokenizer trainers are structured
    * (corpus → word counts once, then in-memory merge loop).
    *
    * Determinism contract (pinned by the independent-oracle gate):
    * pair counts sum word frequencies over ALL adjacent positions
    * (overlaps counted: "aaa" has (a,a) twice); the winning pair is
    * (max count, then lexicographically smallest (left, right));
    * merges apply left-to-right non-overlapping within each word
    * (the [[encodeWord]] convention). Output: merges in rank order. */
  def learnMerges(df: DataFrame, textCol: String,
      k: Int): Seq[(String, String)] = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(textCol)).as[String]
      .mapPartitions(_.flatMap(t =>
        preTokens(norm(if (t == null) "" else t))))
      .toDF("w").groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    // compacted vocab: symbol sequence → corpus frequency
    var vocab: Map[Vector[String], Long] = counts
      .groupBy(c => c._1.toVector.map(_.toString))
      .view.mapValues(_.map(_._2).sum).toMap
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val pairCounts =
        scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        // singleton pairs carry no compression — stop (the
        // tools/gen_bpe.py trainer's rule; the ns88 gate pins it)
        if (pairCounts(best) < 2L) done = true
        else {
          merges += best
          vocab = vocab.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                  syms(j + 1) == best._2) {
                out += best._1 + best._2; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          i += 1
        }
      }
    }
    merges.result()
  }

  /** Corpus decode — the inverse of [[encodeDocs]], same broadcast +
    * per-partition batch shape. Output: (doc_id, decoded). */
  def decodeDocs(df: DataFrame, idCol: String, idsCol: String,
      c: Codec = default, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    df.select(col(idCol).cast("long"), col(idsCol))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val cod = bc.value
        it.grouped(batchSize).flatMap(_.map { case (id, ids) =>
          (id, decode(if (ids == null) Array.empty[Int] else ids, cod))
        })
      }
      .toDF(idCol, "decoded")
  }

  // --------------------------------------------------------------
  // Byte-fallback tier (r14): the production-tokenizer contract —
  // NOTHING maps to <unk>. A symbol outside the derived vocabulary
  // decomposes into its UTF-8 bytes, each mapping to one of 256
  // byte tokens appended AFTER the merge block, and the
  // pre-tokenizer additionally emits whitespace runs (canonical
  // text collapses them to single spaces) so decode∘encode
  // reproduces canonical text EXACTLY — true byte-losslessness, no
  // whitespace caveat (the ns77 gate). Byte ids are a pure function
  // of the merge table, like every other id: byte b → 95 + |merges|
  // + b, so every strict-vocab id (<unk>, ASCII base, merges) is
  // UNCHANGED and the bf codec is a strict superset — ns61's gated
  // id stream stays valid verbatim. This is the public
  // byte-fallback design (SentencePiece/LLaMA-style fallback over a
  // character-level vocab); tools/gen_bpe.py carries the
  // independent Python twin the ns190 gate compares against.
  // --------------------------------------------------------------

  /** Byte-fallback pre-tokenizer: [[preToken]]'s three classes plus
    * whitespace runs as pre-tokens of their own. */
  private val preTokenBf = java.util.regex.Pattern
    .compile("[a-z]+|[0-9]+|\\s+|[^a-z0-9\\s]")

  def preTokensBf(normed: String): Iterator[String] = {
    val m = preTokenBf.matcher(normed)
    new Iterator[String] {
      private var ready = m.find()
      def hasNext: Boolean = ready
      def next(): String = { val g = m.group(); ready = m.find(); g }
    }
  }

  /** First id of the 256-token byte alphabet — appended after the
    * merge block, so it is a pure function of the merge table. */
  def byteBase(c: Codec): Int = 95 + c.ranks.size

  /** [[encodeWord]] with byte fallback: the same greedy merge loop,
    * but a final symbol outside the vocabulary becomes its UTF-8
    * bytes' tokens instead of `<unk>`. Emits ≥ 1 id per input char —
    * never zero, never unk. */
  def encodeWordBf(word: String, c: Codec): Array[Int] = {
    val base = byteBase(c)
    mergeSyms(word, c).iterator.flatMap { s =>
      c.ids.get(s) match {
        case Some(id) => Iterator.single(id)
        case None => s.getBytes("UTF-8").iterator
          .map(b => base + (b & 0xff))
      }
    }.toArray
  }

  /** Byte-fallback encode of a full text: canonicalize, pre-tokenize
    * INCLUDING whitespace runs, BPE-with-fallback per pre-token. */
  def encodeBf(text: String, c: Codec): Array[Int] =
    preTokensBf(norm(text)).flatMap(encodeWordBf(_, c)).toArray

  /** Corpus byte-fallback encode — [[encodeDocs]]'s broadcast +
    * per-partition batch shape over [[encodeBf]]. */
  def encodeDocsBf(df: DataFrame, idCol: String, textCol: String,
      c: Codec = default, batchSize: Int = 64): Dataset[Encoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cod = bc.value
        it.grouped(batchSize).flatMap(_.map { case (id, text) =>
          Encoded(id, encodeBf(if (text == null) "" else text, cod))
        })
      }
  }

  /** Byte-fallback decode: maximal runs of byte tokens decode as
    * UTF-8; every other id appends its symbol. On any [[encodeBf]]
    * output this reproduces the canonical input text exactly. */
  def decodeBf(ids: Array[Int], c: Codec): String = {
    val base = byteBase(c)
    val bytes = new java.io.ByteArrayOutputStream()
    val sb = new java.lang.StringBuilder(ids.length * 2)
    def flush(): Unit = if (bytes.size > 0) {
      sb.append(new String(bytes.toByteArray, "UTF-8"))
      bytes.reset()
    }
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id >= base && id < base + 256) bytes.write(id - base)
      else {
        flush()
        if (id != c.unkId) sb.append(c.symbols.getOrElse(id, ""))
      }
      i += 1
    }
    flush()
    sb.toString
  }

  /** Corpus byte-fallback decode — [[decodeDocs]]'s shape over
    * [[decodeBf]]. Output: (doc_id, decoded). */
  def decodeDocsBf(df: DataFrame, idCol: String, idsCol: String,
      c: Codec = default, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    df.select(col(idCol).cast("long"), col(idsCol))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val cod = bc.value
        it.grouped(batchSize).flatMap(_.map { case (id, ids) =>
          (id, decodeBf(if (ids == null) Array.empty[Int] else ids, cod))
        })
      }
      .toDF(idCol, "decoded")
  }
}
