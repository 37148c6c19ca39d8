package graft

import graft.jmespath.JmesPath
import org.scalatest.funsuite.AnyFunSuite

/** Compliance battery for the full JMESPath engine — cases drawn from the
  * jmespath.org specification/tutorial examples, plus the reference's error
  * model (parse error = fatal, runtime error / non-JSON input = no match).
  */
class JmesPathSpec extends AnyFunSuite {
  /** Search and serialize canonically; "<null>" marks null/no result —
    * including runtime errors, which the reference's search arm swallows
    * into "no match" (src/rules.rs:79: `if let Ok(result) = expr.search`). */
  private def q(expr: String, json: String): String =
    try JmesPath.search(expr, json) match {
      case Some(r) if !r.isNull && !r.isMissingNode => JmesPath.serialize(r)
      case _ => "<null>"
    } catch { case _: JmesPath.JmesPathRuntimeException => "<null>" }

  test("identifiers, sub-expressions, quoted identifiers") {
    assert(q("a", """{"a": "foo"}""") == "\"foo\"")
    assert(q("a.b.c.d", """{"a":{"b":{"c":{"d":"value"}}}}""") == "\"value\"")
    assert(q("b", """{"a": "foo"}""") == "<null>")
    assert(q("\"with space\"", """{"with space": 42}""") == "42")
    assert(q("a.\"b.c\"", """{"a":{"b.c": 1}}""") == "1")
  }

  test("index and negative index") {
    assert(q("[1]", """["a","b","c"]""") == "\"b\"")
    assert(q("[-1]", """["a","b","c"]""") == "\"c\"")
    assert(q("[3]", """["a","b","c"]""") == "<null>")
    assert(q("a[0].b", """{"a":[{"b":1},{"b":2}]}""") == "1")
    assert(q("[0]", """{"a":1}""") == "<null>") // index on non-array
  }

  test("slices (python semantics, step, negative step)") {
    val arr = """[0,1,2,3,4,5,6,7,8,9]"""
    assert(q("[0:5]", arr) == "[0,1,2,3,4]")
    assert(q("[5:10]", arr) == "[5,6,7,8,9]")
    assert(q("[:5]", arr) == "[0,1,2,3,4]")
    assert(q("[::2]", arr) == "[0,2,4,6,8]")
    assert(q("[::-1]", arr) == "[9,8,7,6,5,4,3,2,1,0]")
    assert(q("[-3:]", arr) == "[7,8,9]")
    assert(q("[8:2:-2]", arr) == "[8,6,4]")
    // slice is a projection: RHS applies per element
    assert(q("a[0:2].b", """{"a":[{"b":1},{"b":2},{"b":3}]}""") == "[1,2]")
  }

  test("list / object / flatten projections with null-dropping") {
    assert(q("a[*].first", """{"a":[{"first":"x"},{"second":"y"},{"first":"z"}]}""")
      == "[\"x\",\"z\"]")
    assert(q("*.n", """{"a":{"n":1},"b":{"n":2},"c":{"x":3}}""") == "[1,2]")
    assert(q("[]", """[[0,1],[2],3,[4,[5]]]""") == "[0,1,2,3,4,[5]]")
    assert(q("a[].b", """{"a":[[{"b":1}],[{"b":2},{"b":3}]]}""") == "[1,2,3]")
    // projection on a non-array/object is null
    assert(q("a[*]", """{"a": 3}""") == "<null>")
    assert(q("*.n", """[1,2]""") == "<null>")
    // projections stop at pipes
    assert(q("a[*].b | [0]", """{"a":[{"b":1},{"b":2}]}""") == "1")
    assert(q("a[*].b[0]", """{"a":[{"b":[1]},{"b":[2]}]}""") == "[1,2]")
  }

  test("filter projections, comparators, booleans") {
    val people = """{"people":[{"age":20,"name":"a"},{"age":30,"name":"b"},{"age":40,"name":"c"}]}"""
    assert(q("people[?age > `25`].name", people) == "[\"b\",\"c\"]")
    assert(q("people[?age >= `30` && name != 'c'].name", people) == "[\"b\"]")
    assert(q("people[?age == `20` || age == `40`].name", people) == "[\"a\",\"c\"]")
    assert(q("people[?!(age < `30`)].name", people) == "[\"b\",\"c\"]")
    // string equality with raw strings
    assert(q("[?name == 'b'] | [0].age", """[{"name":"a","age":1},{"name":"b","age":2}]""") == "2")
    // ordering comparators on non-numbers yield null → filtered out
    assert(q("[?name > `1`]", """[{"name":"a"}]""") == "[]")
    // numeric equality across int/float representations
    assert(q("[?v == `1.0`]", """[{"v":1}]""") == "[{\"v\":1}]")
  }

  test("multi-select lists and hashes") {
    val j = """{"a":1,"b":2,"c":3}"""
    assert(q("[a, b]", j) == "[1,2]")
    assert(q("{x: a, y: c}", j) == "{\"x\":1,\"y\":3}")
    assert(q("[a, missing]", j) == "[1,null]") // multiselect keeps nulls
    // against a null current node, multiselect is null
    assert(q("missing.[a]", j) == "<null>")
    assert(q("a[*].[b, c]", """{"a":[{"b":1,"c":2},{"b":3,"c":4}]}""") == "[[1,2],[3,4]]")
  }

  test("pipe, or, and, not — truthiness rules") {
    assert(q("a || b", """{"b": 2}""") == "2")
    assert(q("a || b", """{"a": 1, "b": 2}""") == "1")
    assert(q("'' || 'fallback'", "{}") == "\"fallback\"") // empty string falsy
    assert(q("a && b", """{"a": 1, "b": 2}""") == "2")
    assert(q("a && b", """{"a": [], "b": 2}""") == "[]") // empty array falsy, returned
    assert(q("!a", """{"a": []}""") == "true")
    assert(q("!a", """{"a": 0}""") == "false") // all numbers truthy
  }

  test("literals, raw strings, current node") {
    assert(q("`{\"x\": 1}`.x", "{}") == "1")
    assert(q("'raw string'", "{}") == "\"raw string\"")
    assert(q("@", """{"a":1}""") == "{\"a\":1}")
    assert(q("a[?@ > `2`]", """{"a":[1,2,3,4]}""") == "[3,4]")
    assert(q("`foo`", "{}") == "\"foo\"") // legacy elided-quote literal
  }

  test("functions: arithmetic and aggregation") {
    assert(q("abs(`-5`)", "{}") == "5")
    assert(q("ceil(`1.2`)", "{}") == "2")
    assert(q("floor(`1.8`)", "{}") == "1")
    assert(q("sum(@)", "[1,2,3]") == "6")
    assert(q("avg(@)", "[1,2,3]") == "2")
    assert(q("avg(@)", "[]") == "<null>")
    assert(q("min(@)", "[3,1,2]") == "1")
    assert(q("max(@)", """["a","c","b"]""") == "\"c\"")
    assert(q("length(@)", """"hello"""") == "5")
    assert(q("length(@)", "[1,2]") == "2")
    assert(q("length(@)", """{"a":1}""") == "1")
  }

  test("functions: strings, arrays, objects") {
    assert(q("starts_with(@, 'ab')", """"abc"""") == "true")
    assert(q("ends_with(@, 'bc')", """"abc"""") == "true")
    assert(q("contains(@, 'b')", """["a","b"]""") == "true")
    assert(q("contains(@, 'ell')", """"hello"""") == "true")
    assert(q("join(', ', @)", """["a","b"]""") == "\"a, b\"")
    assert(q("reverse(@)", "[1,2,3]") == "[3,2,1]")
    assert(q("reverse(@)", """"abc"""") == "\"cba\"")
    assert(q("keys(@)", """{"a":1,"b":2}""") == "[\"a\",\"b\"]")
    assert(q("values(@)", """{"a":1,"b":2}""") == "[1,2]")
    assert(q("merge(`{\"a\":1}`, `{\"b\":2}`, `{\"a\":3}`)", "{}") == "{\"a\":3,\"b\":2}")
    assert(q("not_null(a, b, c)", """{"b": 2}""") == "2")
    assert(q("to_array(`1`)", "{}") == "[1]")
    assert(q("to_string(`{\"a\":1}`)", "{}") == "\"{\\\"a\\\":1}\"")
    assert(q("to_number('42')", "{}") == "42")
    assert(q("to_number('xyz')", "{}") == "<null>")
    assert(q("type(@)", "[1]") == "\"array\"")
    assert(q("sort(@)", "[3,1,2]") == "[1,2,3]")
    assert(q("sort(@)", """["b","a"]""") == "[\"a\",\"b\"]")
  }

  test("functions: expression references (map, sort_by, min_by, max_by)") {
    val j = """[{"name":"b","age":30},{"name":"a","age":20},{"name":"c","age":40}]"""
    assert(q("sort_by(@, &age)[0].name", j) == "\"a\"")
    assert(q("sort_by(@, &name)[-1].age", j) == "40")
    assert(q("min_by(@, &age).name", j) == "\"a\"")
    assert(q("max_by(@, &age).name", j) == "\"c\"")
    assert(q("map(&age, @)", j) == "[30,20,40]")
    // map keeps nulls (unlike projections)
    assert(q("map(&x, @)", """[{"x":1},{"y":2}]""") == "[1,null]")
  }

  test("runtime errors are no-match, exactly like the reference search arm") {
    // invalid-type: sum over strings
    assert(q("sum(@)", """["a"]""") == "<null>")
    // invalid-arity
    assert(q("length(@, @)", "[1]") == "<null>")
    // unknown function
    assert(q("no_such_fn(@)", "[1]") == "<null>")
    // input not valid JSON at all (Variable::from_json Err, src/rules.rs:76)
    assert(q("a", "this is not json") == "<null>")
  }

  test("parse errors throw at compile time — fatal config errors") {
    // the reference's invalid fixture (test/configs/single-rule-with-invalid-jmespath.yml)
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile(". 0 meta.topic"))
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile(""))
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile("a."))
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile("a[1:2:0]")) // step 0
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile("a ="))
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile("'unterminated"))
    assertThrows[JmesPath.JmesPathParseException](JmesPath.compile("\"q\"(@)"))
  }

  test("spec tutorial composite: nested projections + filter + functions") {
    val j =
      """{"reservations": [
        |  {"instances": [{"state": "running", "tags": ["web"]},
        |                 {"state": "stopped", "tags": ["db","backup"]}]},
        |  {"instances": [{"state": "running", "tags": ["web","prod"]}]}
        |]}""".stripMargin
    assert(q("reservations[*].instances[*].state", j)
      == "[[\"running\",\"stopped\"],[\"running\"]]")
    assert(q("reservations[].instances[?state=='running'][] | length(@)", j) == "2")
    assert(q("reservations[].instances[].tags[]", j)
      == "[\"web\",\"db\",\"backup\",\"web\",\"prod\"]")
    assert(q("reservations[].instances[] | [?length(tags) >= `2`] | length(@)", j) == "2")
  }

  test("jmespath_qv: one search feeds both the match and the value binding") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq("""{"a": {"b": "hit"}}""", """{"a": 1}""", "not json")
      .toDF("doc")
      .repartition(1) // keep the projection out of ConvertToLocalRelation
      .select(org.apache.spark.sql.functions.call_function(
        "jmespath_qv", org.apache.spark.sql.functions.col("doc"),
        org.apache.spark.sql.functions.lit("a.b")).as("qv"))
      .select($"qv.q", $"qv.v")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // string result: q serialized, v raw; no-match and invalid json: both null
    assert(rows.sortBy(_._1 == null) ==
      Seq(("\"hit\"", "hit"), (null, null), (null, null)))
    // the two field refs must share ONE evaluation: whole-stage codegen's
    // subexpression elimination emits a single searchRow call
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    val calls = "searchRow".r.findAllIn(code).length
    assert(calls == 1, s"expected one searchRow call in generated code, got $calls")
  }
}
