package graft

import graft.functions.JsonMerge
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Merge-lattice cases from the reference's tests (src/merge.rs:137-234) plus
  * perform_merge edge cases (src/connection.rs:310-335).
  */
class JsonMergeSpec extends AnyFunSuite {
  /** Sample-based property check (scalatestplus bridge not on the classpath). */
  private def forAllSampled[A](g: Gen[A], n: Int = 200)(p: A => Boolean): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    (1 to n).foreach { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      assert(p(a), s"property failed for: $a")
    }
  }
  private def m(a: String, b: String): String = JsonMerge.mergeStrings(a, b)

  test("empty ⊕ empty (src/merge.rs tests)") {
    assert(m("{}", "{}") == "{}")
    assert(m("{}", """{"hello":1}""") == """{"hello":1}""")
  }

  test("object ⊕ object: recursive, RHS wins on conflict") {
    assert(m("""{"value1":"a","value2":"b"}""",
             """{"value1":"a","value2":"c","value3":"d"}""")
      == """{"value1":"a","value2":"c","value3":"d"}""")
  }

  test("array ⊕ array: concat + consecutive dedup (Vec::dedup)") {
    // fragment must be an object at the top level to merge; test via nested arrays
    assert(m("""{"a":["a","b"]}""", """{"a":["b","c"]}""")
      == """{"a":["a","b","c"]}""")
    // NON-adjacent duplicates survive — Vec::dedup is consecutive-only
    assert(m("""{"a":["a","b"]}""", """{"a":["a"]}""")
      == """{"a":["a","b","a"]}""")
  }

  test("array ⊕ object: push + dedup") {
    assert(m("""{"a":[{"value":"a"}]}""", """{"a":{"value":"b"}}""")
      == """{"a":[{"value":"a"},{"value":"b"}]}""")
    assert(m("""{"a":[{"value":"b"}]}""", """{"a":{"value":"b"}}""")
      == """{"a":[{"value":"b"}]}""")
  }

  test("scalar ⊕ scalar: RHS replaces") {
    assert(m("""{"v":"a"}""", """{"v":"b"}""") == """{"v":"b"}""")
    assert(m("""{"v":1}""", """{"v":{"x":2}}""") == """{"v":{"x":2}}""")
  }

  test("non-object fragment → target returned unmerged byte-for-byte") {
    assert(m("""{"k": 1}""", """[1,2]""") == """{"k": 1}""")
    assert(m("""{"k": 1}""", """"str"""") == """{"k": 1}""")
  }

  test("non-JSON target → null (abort marker, src/connection.rs:331-334)") {
    assert(m("not json", "{}") == null)
  }

  test("deep nesting merges recursively") {
    assert(m("""{"meta":{"topic":"t"}}""",
             """{"meta":{"hotdog":{"version":"1"}}}""")
      == """{"meta":{"hotdog":{"version":"1"},"topic":"t"}}""")
  }

  test("output keys are sorted at every level (serde_json BTreeMap parity)") {
    assert(m("""{"b":1,"a":2}""", "{}") == """{"a":2,"b":1}""")
  }

  // --- properties -----------------------------------------------------

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.choose(-99, 99).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(5) + "\""),
    Gen.oneOf("true", "false", "null"))

  private def objGen(depth: Int): Gen[String] =
    for {
      n <- Gen.choose(0, 3)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
      vals <- Gen.listOfN(n, if (depth <= 0) scalarGen else Gen.frequency(
        3 -> scalarGen, 1 -> Gen.lzy(objGen(depth - 1))))
    } yield keys.distinct.zip(vals)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def mi(a: String, p: String, b: String): String =
    JsonMerge.mergeInStrings(a, p, b)

  test("merge_in: array into a field path (src/merge.rs:181-187)") {
    assert(mi("""{"my_array":[{"a":"t"}]}""", "/my_array", """["b","c"]""")
      == """{"my_array":[{"a":"t"},"b","c"]}""")
  }

  test("merge_in: object into a field path (src/merge.rs:188-194)") {
    assert(mi("""{"my_array":[{"a":"t"}]}""", "/my_array", """{"b":"c"}""")
      == """{"my_array":[{"a":"t"},{"b":"c"}]}""")
  }

  test("merge_in: object at an existing array position (src/merge.rs:195-201)") {
    assert(mi("""{"my_array":[{"a":"t"}]}""", "/my_array/0", """{"b":"c"}""")
      == """{"my_array":[{"a":"t","b":"c"}]}""")
  }

  test("merge_in: object at a missing array position appends (src/merge.rs:202-208)") {
    assert(mi("""{"my_array":[{"a":"t"}]}""", "/my_array/1", """{"b":"c"}""")
      == """{"my_array":[{"a":"t"},{"b":"c"}]}""")
  }

  test("merge_in: scalar replace through a deep pointer (src/merge.rs:50-54 doc)") {
    assert(mi("""{"my_array":[{"a":"t"}]}""", "/my_array/0/a", """{"b":"c"}""")
      == """{"my_array":[{"a":{"b":"c"}}]}""")
  }

  test("merge_in: builds missing objects/arrays from null root (src/merge.rs:209-219)") {
    var v = "null"
    v = mi(v, "/field", "\"value\"")
    v = mi(v, "/object", "{}")
    v = mi(v, "/array", "[]")
    assert(v == """{"array":[],"field":"value","object":{}}""")
  }

  test("merge_in: root pointer merges arrays and objects (src/merge.rs:220-234)") {
    assert(mi("""["value"]""", "/", """["new_value"]""")
      == """["value","new_value"]""")
    assert(mi("""{"field":"value"}""", "/", """{"field2":"value2"}""")
      == """{"field":"value","field2":"value2"}""")
  }

  test("merge_in: create-missing-path scaffolds {step:null} then merges") {
    assert(mi("""{"k":1}""", "/meta/depth", "7")
      == """{"k":1,"meta":{"depth":7}}""")
  }

  test("merge_in: RFC 6901 escaped tokens address keys with '/' and '~'") {
    // serde's pointer unescapes ~1 then ~0 in the lookup; the reference's
    // CREATE branch inserts the raw token (then can never find it — a
    // live-lock); we unescape on both sides
    assert(mi("""{"a/b":1}""", "/a~1b", "2") == """{"a/b":2}""")
    assert(mi("""{"a~b":{"c":1}}""", "/a~0b/c", "5") == """{"a~b":{"c":5}}""")
    assert(mi("{}", "/x~1y", "3") == """{"x/y":3}""")
  }

  test("merge_in edges: bad pointer aborts, bad fragment is a no-op, no live-lock") {
    // the reference would panic on a pointer without '/'; we surface the
    // abort marker (null) like an unparseable LHS
    assert(mi("""{"a":1}""", "a", "{}") == null)
    assert(mi("not json", "/a", "{}") == null)
    assert(mi("""{"a":1}""", "/a", "not json") == """{"a":1}""")
    // reference live-locks here (array dedup swallows the null scaffold);
    // we bail after one retry with the target returned UNCHANGED — the
    // scaffold is trialled on a copy, so no scaffold-only mutation leaks
    assert(mi("""{"a":[null]}""", "/a/5", "7") == """{"a":[null]}""")
  }

  test("property: merge_in output is always valid canonical JSON (or null abort)") {
    val ptrGen = for {
      depth <- Gen.choose(1, 3)
      toks <- Gen.listOfN(depth,
        Gen.oneOf(Gen.alphaLowerStr.map(_.take(3)), Gen.choose(0, 3).map(_.toString)))
    } yield "/" + toks.mkString("/")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    forAllSampled(Gen.zip(objGen(2), ptrGen, objGen(1))) { case (a, p, b) =>
      val out = JsonMerge.mergeInStrings(a, p, b)
      // never throws; result parses back and is already in canonical form
      // (re-serializing the parse tree is a fixpoint). NOT checked via
      // ⊕{}: a numeric first step can lawfully replace an object root
      // with an array (the reference lattice), where ⊕{} appends.
      out == null || JsonMerge.serialize(mapper.readTree(out)) == out
    }
  }

  test("property: merge with {} is canonicalizing identity") {
    forAllSampled(objGen(2)) { o =>
      val c = m(o, "{}")
      c != null && m(c, "{}") == c
    }
  }

  test("property: RHS object keys always present in result") {
    forAllSampled(Gen.zip(objGen(2), objGen(2))) { case (a, b) =>
      val out = m(a, b)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val bn = mapper.readTree(b)
      val on = mapper.readTree(out)
      val it = bn.fieldNames()
      var ok = true
      while (it.hasNext) { if (!on.has(it.next())) ok = false }
      ok
    }
  }

  test("property: idempotence — (a ⊕ b) ⊕ b = a ⊕ b for object-valued b") {
    forAllSampled(Gen.zip(objGen(1), objGen(1))) { case (a, b) =>
      val once = m(a, b)
      m(once, b) == once
    }
  }
}
