package graft

import org.apache.spark.sql.functions._

import graft.ns.{Bpe, TextOps}

/** BPE encode-to-ids laws + the fixture/oracle staleness pin.
  *
  * The cross-IMPLEMENTATION gate (Scala encoder ≡ the independent
  * Python encoder in tools/gen_bpe.py) runs right here as well as at
  * the driver: the checked-in oracle parquet is a test resource, so
  * "oracle went stale after a fixture regeneration" fails this suite
  * loudly instead of silently reddening the driver round.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val codec = Bpe.default

  test("vocabulary ids are a pure function of the merge table") {
    // '!'(0x21) is id 1, 'a'(0x61) is 0x61-0x21+1 = 65, unk is 0
    assert(codec.ids("!") == 1)
    assert(codec.ids("a") == 65)
    assert(codec.ids("~") == 94)
    assert(codec.unkId == 0)
    // merge symbols take 95+rank in file order
    val byRank = codec.ranks.toSeq.sortBy(_._2)
    byRank.zipWithIndex.foreach { case (((a, b), _), k) =>
      assert(codec.ids(a + b) == 95 + k)
    }
  }

  test("greedy encode merges lowest rank first, all occurrences") {
    val c = Bpe.codec(Seq(("a", "b"), ("ab", "c")))
    // "abcab" -> ab c ab -> abc ab
    assert(Bpe.encodeWord("abcab", c).toSeq ==
      Seq(c.ids("abc"), c.ids("ab")))
    // rank order matters: (b,c) unranked pairs never merge
    assert(Bpe.encodeWord("bc", c).toSeq == Seq(c.ids("b"), c.ids("c")))
  }

  test("decode∘encode reconstructs the pre-token stream exactly") {
    val inv = codec.ids.map(_.swap)
    val texts = Seq("Hello, world! 42 times",
      "  spark   SPARK spark  ", "a", "", "mixed: key-value_7 (agg)")
    texts.foreach { t =>
      val ids = Bpe.encode(t, codec)
      val decoded = ids.map(inv).mkString
      val expected = Bpe.preTokens(Bpe.norm(t)).mkString
      assert(decoded == expected, s"round-trip failed for '$t'")
    }
  }

  test("decode API: inverse table, <unk> drops silently, corpus shape") {
    import spark.implicits._
    // decode == the hand-rolled inverse used by the round-trip test
    val ids = Bpe.encode("the quick brown fox!", codec)
    assert(Bpe.decode(ids, codec) ==
      Bpe.preTokens(Bpe.norm("the quick brown fox!")).mkString)
    // unk carries no surface form — decoded as empty, not "<unk>"
    assert(Bpe.decode(Array(codec.unkId), codec) == "")
    assert(Bpe.decode(Array.empty[Int], codec) == "")
    // corpus decode mirrors encodeDocs' batch shape and null contract
    val enc = Bpe.encodeDocs(
      Seq((1L, "spark and flink"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", codec).toDF()
    val dec = Bpe.decodeDocs(enc, "doc_id", "token_ids", codec)
      .as[(Long, String)].collect().toMap
    assert(dec(1L) == "sparkandflink" && dec(2L) == "")
  }

  test("learnMerges: hand-computed merge sequence, overlap counting, " +
      "stop rules") {
    import spark.implicits._
    // "aaab"x2 + "ab": (a,a)=4 (overlaps counted) beats (a,b)=3;
    // after the merge, (a,b)=3 beats (aa,a)=2; then (aa,ab)=2; then
    // no pairs remain.
    val d = Seq("aaab aaab ab").toDF("text")
    assert(Bpe.learnMerges(d, "text", k = 10) ==
      Seq("a" -> "a", "a" -> "b", "aa" -> "ab"))
    // k caps the table
    assert(Bpe.learnMerges(d, "text", k = 2) ==
      Seq("a" -> "a", "a" -> "b"))
    // singleton-pair stop: every pair unique → nothing merged twice
    assert(Bpe.learnMerges(Seq("xy").toDF("text"), "text", 5).isEmpty)
    // input order/partitioning wash out (groupBy'd corpus pass)
    val big = Seq("aaab", "ab", "aaab").toDF("text")
    assert(Bpe.learnMerges(big.repartition(3), "text", 10) ==
      Bpe.learnMerges(big, "text", 10))
  }

  test("non-ASCII symbols become <unk>, never crash") {
    val ids = Bpe.encode("café 世界", codec)
    assert(ids.contains(codec.unkId))
    assert(ids.forall(i => i == 0 || codec.ids.values.exists(_ == i)))
  }

  test("token count law: ids per doc >= bpeTokenCount of canonical text") {
    val docs = Seq((1L, "one two three!"), (2L, "a-b c"), (3L, ""))
      .toDF("doc_id", "text")
    val counts = Bpe.encodeDocs(docs, "doc_id", "text").toDF()
      .select(col("doc_id"), size(col("token_ids")).as("n_ids"))
      .join(docs.select(col("doc_id"),
        TextOps.bpeTokenCount(
          lower(col("text"))).as("n_pre")), "doc_id")
      .collect()
    counts.foreach(r => assert(r.getAs[Int]("n_ids") >= r.getAs[Int]("n_pre")))
  }

  test("empty-token docs keep their row with an empty id array") {
    val docs = Seq((1L, "   "), (2L, "real text")).toDF("doc_id", "text")
    val out = Bpe.encodeDocs(docs, "doc_id", "text").collect()
      .map(e => e.doc_id -> e.token_ids.length).toMap
    assert(out(1L) == 0)
    assert(out(2L) > 0)
  }

  test("Scala encoder ≡ independent Python oracle on real fixture text " +
    "(staleness pin)") {
    val oraclePath = getClass.getResource("/graft/bpe_oracle_sf001.parquet")
    assert(oraclePath != null, "checked-in BPE oracle parquet missing")
    val oracle = spark.read.parquet(oraclePath.getPath)
    val docsPath = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(docsPath).exists(), s"fixture absent: $docsPath")
    val docs = spark.read.parquet(docsPath).filter(col("doc_id") < 100)
    val mine = Bpe.encodeDocs(docs, "doc_id", "text").toDF()
      .select(col("doc_id"),
        posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id").cast("long").as("token_id"))
    val diff = mine.exceptAll(oracle).count() + oracle.exceptAll(mine).count()
    assert(diff == 0,
      "Scala BPE output diverged from the checked-in Python oracle — " +
        "if the driver regenerated documents, rerun tools/gen_bpe.py " +
        "and recommit merges.txt + bpe_oracle_sf001.parquet")
  }

  test("byte fallback: decodeBf∘encodeBf = canonical text EXACTLY — " +
      "whitespace, non-ASCII, and 4-byte code points all roundtrip") {
    val texts = Seq("Hello, world! 42 times",
      "  spark   SPARK spark  ", "café 世界 — naïve Grüße",
      "emoji 😀 tail", "tabs\tand\nnewlines", "", "   ",
      "mixed: key-value_7 (agg) é μ")
    texts.foreach { t =>
      val ids = Bpe.encodeBf(t, codec)
      assert(Bpe.decodeBf(ids, codec) == Bpe.norm(t),
        s"bf round-trip failed for '$t'")
      // the production-tokenizer contract: nothing maps to <unk>
      assert(!ids.contains(codec.unkId), s"bf emitted unk for '$t'")
    }
  }

  test("byte fallback is a strict superset: vocab ids unchanged, " +
      "byte ids disjoint after the merge block") {
    // strict-vocab pre-tokens encode to the IDENTICAL id sequence
    Seq("the", "12345", "!", "agg").foreach { w =>
      assert(Bpe.encodeWordBf(w, codec).toSeq ==
        Bpe.encodeWord(w, codec).toSeq, s"ids drifted for '$w'")
    }
    // byte ids start exactly where the derived vocab ends
    assert(Bpe.byteBase(codec) == codec.ids.size)
    // a space falls back to its single UTF-8 byte token
    assert(Bpe.encodeWordBf(" ", codec).toSeq ==
      Seq(Bpe.byteBase(codec) + 0x20))
    // é (2 UTF-8 bytes) and 😀 (4 bytes) decompose byte-for-byte
    assert(Bpe.encodeWordBf("é", codec).length == 2)
    assert(Bpe.encodeWordBf("😀", codec).length == 4)
  }

  test("Scala byte-fallback encoder ≡ independent Python bf oracle " +
      "on real fixture text with planted non-ASCII tails") {
    val oraclePath =
      getClass.getResource("/graft/bpe_bf_oracle_sf001.parquet")
    assert(oraclePath != null, "checked-in bf oracle parquet missing")
    val oracle = spark.read.parquet(oraclePath.getPath)
    val docsPath = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(docsPath).exists(), s"fixture absent: $docsPath")
    val docs = spark.read.parquet(docsPath).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(9)) === 0,
            lit(" é μ")).otherwise(lit(""))).as("text"))
    val mine = Bpe.encodeDocsBf(docs, "doc_id", "text").toDF()
      .select(col("doc_id"),
        posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id").cast("long").as("token_id"))
    val diff = mine.exceptAll(oracle).count() + oracle.exceptAll(mine).count()
    assert(diff == 0,
      "Scala byte-fallback output diverged from the checked-in Python " +
        "bf oracle — rerun tools/gen_bpe.py and recommit if the " +
        "documents fixture was regenerated")
  }
}
