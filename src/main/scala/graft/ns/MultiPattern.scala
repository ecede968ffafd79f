package graft.ns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring search at corpus scale: the Aho–Corasick
  * automaton (Aho & Corasick 1975, public classic) over a broadcast
  * pattern dictionary.
  *
  * [[TextOps.canaryScan]]'s array-literal `contains` scan is O(doc ·
  * patterns) — right for a handful of canaries, wrong for a real
  * phrase blocklist (C4's bad-word list, license-text markers,
  * eval-set shingles) with 10⁴–10⁵ entries. The automaton matches ALL
  * patterns in one O(doc + hits) pass: build once on the driver
  * (linear in total pattern length), broadcast, scan per partition.
  * The contract matches `contains` exactly — every pattern that
  * occurs as a substring is reported, including overlapping patterns,
  * patterns inside other patterns, and shared prefixes (dictionary
  * suffix links propagate outputs) — and the spec pins AC ≡ naive
  * contains, including under a randomized sweep.
  */
object MultiPattern {

  /** Frozen automaton. `next` holds per-state transition maps (trie
    * edges only — misses resolve through `fail` at scan time), `out`
    * the pattern indices ending at each state INCLUDING dictionary
    * suffixes. */
  final case class Automaton(next: Array[Map[Char, Int]],
      fail: Array[Int], out: Array[Array[Int]],
      patterns: Array[String]) extends Serializable {

    /** Distinct indices of patterns occurring in `text`. */
    def findAllDistinct(text: String): Array[Int] = {
      val seen = new java.util.BitSet(patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        s = next(s).getOrElse(c, 0)
        val hits = out(s)
        var j = 0
        while (j < hits.length) { seen.set(hits(j)); j += 1 }
        i += 1
      }
      val res = new Array[Int](seen.cardinality())
      var k = 0
      var b = seen.nextSetBit(0)
      while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
      res
    }
  }

  /** Build the automaton: trie + BFS failure links, outputs merged
    * down the suffix chain. Linear in total pattern length. */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(
      List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          ends += Nil
          next.length - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = Array.fill(n)(List.empty[Int])
    var i = 0
    while (i < n) { out(i) = ends(i); i += 1 }
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s)) // dictionary suffix outputs
      next(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t)
          next(f)(c) else 0
        queue += t
      }
    }
    Automaton(next.map(_.toMap).toArray, fail,
      out.map(_.toArray.sorted), patterns.toArray)
  }

  /** Corpus scan: (idCol, pattern) hit rows, distinct per document —
    * the same output contract as [[TextOps.canaryScan]], scaled to
    * large dictionaries. One broadcast + one mapPartitions pass, no
    * shuffle; downstream groupBys (per-pattern counts, doc drops)
    * partial-aggregate map-side as usual. */
  def scan(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(patterns))
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = bc.value
        it.grouped(batchSize).flatMap(_.flatMap { case (id, t) =>
          a.findAllDistinct(if (t == null) "" else t)
            .map(pi => (id, a.patterns(pi)))
        })
      }
      .toDF(idCol, "pattern")
  }

  /** Doc-level blocklist gate support: the ids hitting at least
    * `minHits` DISTINCT blocklisted phrases, with the count — the
    * C4/Dolma badword-gate shape ([[scan]] + one map-combinable
    * aggregate). The result is hit-sized (≪ corpus), so a curation
    * chain drops blocked docs with a broadcast left_anti join and
    * corpus rows never shuffle. Output: (idCol, n_patterns). */
  def blockedIds(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], minHits: Int = 1): DataFrame = {
    require(minHits >= 1, "minHits must be positive")
    scan(df, idCol, textCol, patterns)
      .groupBy(col(idCol))
      .agg(countDistinct(col("pattern")).as("n_patterns"))
      .filter(col("n_patterns") >= minHits)
  }
}
