package graft

import org.apache.spark.sql.functions.col

import graft.functions.PyLiteral

/** Golden-corpus parity with CPython: every case in
  * src/test/resources/pyliteral_golden.jsonl was produced by running
  * `json.dumps(ast.literal_eval(re.sub(r"[\n\r]", "", s)))` under
  * CPython 3 — the exact reference transform
  * (/root/reference/dags/sandbox_data_pipeline.py:123-126). The repair
  * must reproduce each output byte for byte. */
class PyLiteralGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("py_to_json of a literal constant-folds at plan time") {
    import graft.functions.functions.py_to_json
    import org.apache.spark.sql.functions.lit
    val df = spark.range(1)
      .select(py_to_json(lit("{'a': 1}")).as("j"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("""{"a": 1}"""),
      s"expected folded literal in plan:\n$optimized")
    assert(df.as[String].collect().head == """{"a": 1}""")
  }

  test("repair matches CPython json.dumps∘ast.literal_eval on the corpus") {
    val cases = spark.read
      .json("src/test/resources/pyliteral_golden.jsonl")
      .select(col("in"), col("out")).as[(String, String)].collect()
    assert(cases.length >= 25, "golden corpus should be present")
    cases.foreach { case (in, expected) =>
      assert(PyLiteral.repair(in) == expected,
        s"input: ${in.replace("\n", "\\n").replace("\r", "\\r")}")
    }
  }
}
