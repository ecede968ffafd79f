package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ns.MultiPattern

class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def naive(text: String, patterns: Seq[String]): Set[String] =
    patterns.filter(text.contains).toSet

  private def ac(text: String, patterns: Seq[String]): Set[String] = {
    val a = MultiPattern.build(patterns)
    a.findAllDistinct(text).map(a.patterns).toSet
  }

  test("aho-corasick: overlaps, nested patterns, shared prefixes, " +
      "repeats — all ≡ naive contains") {
    val ps = Seq("abc", "ab", "bc", "c", "abcd", "cab")
    Seq("abcd",       // abc, ab, bc, c, abcd (nested + extension)
      "cabcab",       // cab overlapping itself + ab/abc/bc/c inside
      "xxabyy",       // shared prefix only
      "ccc",          // repeated single char pattern
      "",             // empty text
      "zzz")          // no hits
      .foreach { t =>
        assert(ac(t, ps) == naive(t, ps), s"text '$t'")
      }
    // a pattern fully inside another is still reported (suffix links)
    assert(ac("abcd", ps).contains("bc"))
  }

  test("aho-corasick ≡ naive contains on randomized small-alphabet " +
      "sweeps") {
    val text = Gen.stringOfN(40, Gen.oneOf('a', 'b', 'c'))
    val pat = Gen.choose(1, 4)
      .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val pats = Gen.nonEmptyListOf(pat).map(_.distinct)
    check(Prop.forAll(text, pats) { (t: String, ps: List[String]) =>
      ps.isEmpty || ac(t, ps) == naive(t, ps)
    })
  }

  test("scan: distinct per doc, null-safe, matches canaryScan's " +
      "contract on the same inputs") {
    val d = Seq((1L, "has GUID-A embedded"),
      (2L, "both GUID-A and GUID-B present"),
      (3L, "GUID-A GUID-A twice reports once"),
      (4L, "clean"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ps = Seq("GUID-A", "GUID-B")
    val got = MultiPattern.scan(d, "doc_id", "text", ps)
      .as[(Long, String)].collect().toSet
    assert(got == Set(1L -> "GUID-A", 2L -> "GUID-A", 2L -> "GUID-B",
      3L -> "GUID-A"))
    val viaContains = graft.ns.TextOps
      .canaryScan(d.filter(org.apache.spark.sql.functions.col("text")
        .isNotNull), "doc_id", "text", ps)
      .as[(Long, String)].collect().toSet
    assert(got == viaContains)
  }
}
