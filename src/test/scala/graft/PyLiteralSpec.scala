package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.PyLiteral

class PyLiteralSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // The reference's golden pair, verbatim
  // (/root/reference/tests/test_sandbox_data_pipeline.py:45-48).
  test("golden: dirty cocktail JSON repairs to reference output") {
    val dirty =
      "{'drinks': [{'idDrink': '11470', 'strAlcoholic': 'Alcoho\rli\n\rc',}]}"
    val expected =
      """{"drinks": [{"idDrink": "11470", "strAlcoholic": "Alcoholic"}]}"""
    assert(PyLiteral.repair(dirty) == expected)
  }

  test("python literals: True/False/None, tuples, numbers") {
    assert(PyLiteral.repair("{'a': True, 'b': False, 'c': None}") ==
      """{"a": true, "b": false, "c": null}""")
    assert(PyLiteral.repair("{'t': (1, 2, 3)}") == """{"t": [1, 2, 3]}""")
    // floats render through python float.__repr__, ints verbatim
    assert(PyLiteral.repair("{'n': -1.5e3, 'm': .5, 'k': +7}") ==
      """{"n": -1500.0, "m": 0.5, "k": 7}""")
    assert(PyLiteral.repair("{'a': -.5, 'b': 1., 'c': 2.e3}") ==
      """{"a": -0.5, "b": 1.0, "c": 2000.0}""")
  }

  test("embedded quotes and escapes survive") {
    assert(PyLiteral.repair("{'q': 'it\\'s \"quoted\"'}") ==
      """{"q": "it's \"quoted\""}""")
    // Input holds an escaped backslash then 'n' (value = a,\,n,b);
    // json.dumps∘ast.literal_eval re-escapes the backslash: a\\nb.
    assert(PyLiteral.repair("""{"d": "a\\nb"}""") == """{"d": "a\\nb"}""")
    // Python passes unrecognized escapes through as backslash+char;
    // JSON must escape that backslash.
    assert(PyLiteral.repair("""{'e': 'a\qb'}""") == """{"e": "a\\qb"}""")
  }

  test("trailing commas tolerated everywhere") {
    assert(PyLiteral.repair("[1, 2, 3,]") == "[1, 2, 3]")
    assert(PyLiteral.repair("{'a': 1,}") == """{"a": 1}""")
    assert(PyLiteral.repair("{}") == "{}")
    assert(PyLiteral.repair("[]") == "[]")
  }

  test("bad input → null via repairOrNull, throws via repair") {
    assert(PyLiteral.repairOrNull("{'unclosed': ") == null)
    assert(PyLiteral.repairOrNull(null) == null)
    intercept[IllegalArgumentException](PyLiteral.repair("{'x': }"))
  }

  test("property: repaired output is parseable JSON that round-trips") {
    val safeStr = Gen.alphaNumStr.map(_.take(12))
    val pyVal: Gen[(String, String)] = Gen.oneOf(
      safeStr.map(v => (s"'$v'", s""""$v"""")),
      Gen.choose(-1000000, 1000000).map(n => (n.toString, n.toString)),
      Gen.oneOf(("True", "true"), ("False", "false"), ("None", "null")))
    val kv = for {
      k <- Gen.identifier.map(_.take(8)); v <- pyVal
    } yield ((s"'$k': ${v._1}"), (s""""$k": ${v._2}"""))
    val prop = Prop.forAll(Gen.listOfN(4, kv)) { kvs =>
      // last-key-wins duplicate semantics aren't modeled; keep keys unique
      val uniq = kvs.distinctBy(_._1.split(":")(0)).toList
      val py = uniq.map(_._1).mkString("{", ", ", "}")
      val js = uniq.map(_._2).mkString("{", ", ", "}")
      PyLiteral.repair(py) == js
    }
    check(prop)
  }
}
