package graft

import graft.config._
import graft.queries.Synth
import graft.rules.{RuleCompiler, Template, TestMode}
import graft.streaming.GraftPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end rule-cascade semantics over the shipped hotdog.yml rules
  * (hotdog.yml:26-68) and targeted edge-case configs.
  */
class CascadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def routeRaw(cfg: GraftConfig, msgs: Seq[String]): Seq[Option[(String, String)]] = {
    val fields = RuleCompiler.FieldCols(col("msg"), lit(null).cast("string"),
      lit(null).cast("string"), col("host"), lit(null).cast("string"))
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = msgs.toDF("msg").withColumn("host", lit("testhost"))
      .withColumn("r", RuleCompiler.cascade(cfg, fields, lit("0.1.0"), lit("TS")))
    df.select("r.topic", "r.value").collect()
      .map(r => if (r.isNullAt(0)) None else Some((r.getString(0), r.getString(1)))).toSeq
  }

  test("hotdog.yml cascade: regex rule → replace+forward to test") {
    val out = routeRaw(Synth.HotdogConfig, Seq("hello there"))
    val (topic, value) = out.head.get
    assert(topic == "test")
    assert(value == "This is the total message: hello there\n\nAnd the name is: there\n")
  }

  test("hotdog.yml cascade: optional capture absent renders empty") {
    val out = routeRaw(Synth.HotdogConfig, Seq("hello  "))
    assert(out.head.get._2.endsWith("And the name is: \n"))
  }

  test("hotdog.yml cascade: jmespath rule → merge + dynamic topic") {
    val msg = """{"this": "is data", "meta": {"topic": "test"}}"""
    val (topic, value) = routeRaw(Synth.HotdogConfig, Seq(msg)).head.get
    assert(topic == "test")
    // deep-merged, compact, sorted keys, hotdog metadata injected
    assert(value ==
      """{"meta":{"hotdog":{"timestamp":"TS","version":"0.1.0"},"topic":"test"},"this":"is data"}""")
  }

  test("hotdog.yml cascade: junk → catch-all logs-unknown with raw msg") {
    val (topic, value) = routeRaw(Synth.HotdogConfig, Seq("some junk")).head.get
    assert(topic == "logs-unknown")
    assert(value == "some junk")
  }

  test("full JMESPath rule: filter+function expression routes dynamically") {
    // beyond the dotted-path subset: a filter projection + pipe picks the
    // WA location's name as the dynamic topic (src/rules.rs:74-94 parity)
    val cfg = Synth.HotdogConfig.copy(rules = List(
      Rule(Field.Msg, None, Some("locations[?state == 'WA'].name | [0]"), List(
        Action.Forward("{{value}}"), Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(
        Action.Forward("unmatched"), Action.Stop))))
    val hit = """{"locations":[{"name":"seattle","state":"WA"},{"name":"sf","state":"CA"}]}"""
    val miss = """{"locations":[{"name":"sf","state":"CA"}]}"""
    val out = routeRaw(cfg, Seq(hit, miss, "not json"))
    assert(out(0).get._1 == "seattle")
    // empty projection result → null → rule does not match → catch-all
    assert(out(1).get._1 == "unmatched")
    assert(out(2).get._1 == "unmatched")
  }

  test("full JMESPath rule: non-string result matches but binds no value") {
    // the reference only binds `value` for string results (src/rules.rs:80-88);
    // a matching rule with a number result forwards with an empty-render topic
    val cfg = Synth.HotdogConfig.copy(rules = List(
      Rule(Field.Msg, None, Some("length(items)"), List(
        Action.Forward("n-{{value}}"), Action.Stop))))
    val out = routeRaw(cfg, Seq("""{"items":[1,2,3]}"""))
    assert(out.head.get._1 == "n-") // matched; {{value}} rendered as ""
  }

  test("first-match-wins: hello-JSON hits rule 1, not rule 2") {
    // a msg matching BOTH rule1's regex and rule2's jmespath goes to rule1
    val msg = """hello {"meta":{"topic":"x"}}"""
    assert(!routeRaw(Synth.HotdogConfig, Seq(msg)).head.get._1.startsWith("x"))
  }

  test("merge failure aborts ALL remaining rules (claimed-and-dropped)") {
    val rules = List(
      Rule(Field.Msg, Some("^x"), None, List(
        Action.Merge("""{"a":1}"""))), // no terminal action
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    val out = routeRaw(cfg, Seq("x-not-json", "other"))
    assert(out(0).isEmpty) // matched rule1, merge failed → dropped, rule2 never ran
    assert(out(1).get._1 == "rest") // rule1 unmatched → rule2
  }

  test("merge failure does NOT cancel a forward in the SAME rule (no break in the action loop)") {
    // src/connection.rs:213-224: the Merge error arm sets continue_rules
    // without breaking, so the rule's later actions still run
    val rules = List(
      Rule(Field.Msg, Some("^x"), None, List(
        Action.Merge("""{"a":1}"""), Action.Forward("t1"), Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    val out = routeRaw(cfg, Seq("x-not-json", """{"k":1}"""))
    // merge failed, but the forward still emits the raw msg to t1
    assert(out(0).contains(("t1", "x-not-json")))
    // unmatched by rule1 → rule2
    assert(out(1).get._1 == "rest")
  }

  test("merge success without forward leaves message for later rules UNMODIFIED") {
    val rules = List(
      Rule(Field.Msg, Some("^\\{"), None, List(Action.Merge("""{"added":true}"""))),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    val out = routeRaw(cfg, Seq("""{"k":1}"""))
    // output buffer is rule-local (src/connection.rs:117): rule2 forwards the RAW msg
    assert(out.head.get._2 == """{"k":1}""")
  }

  test("builtin msg overrides a same-named capture (code wins over README)") {
    val rules = List(
      Rule(Field.Msg, Some("^(?P<msg>h)ello"), None, List(
        Action.Replace("{{msg}}"), Action.Forward("t"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    // capture would bind msg="h"; builtin insert happens after → full message
    assert(routeRaw(cfg, Seq("hello world")).head.get._2 == "hello world")
  }

  test("rule with BOTH matchers: jmespath wins, regex ignored (src/rules.rs:74-94)") {
    val rules = List(
      Rule(Field.Msg, Some(".*"), Some("meta.topic"), List(Action.Forward("jm"), Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    val out = routeRaw(cfg, Seq("""{"meta":{"topic":"t"}}""", "plain text"))
    assert(out(0).get._1 == "jm")   // jmespath matched
    assert(out(1).get._1 == "rest") // regex .* on rule 1 is IGNORED → falls through
  }

  test("null field silently non-matches (src/connection.rs:121-145)") {
    val rules = List(
      Rule(Field.Severity, Some(".*"), None, List(Action.Forward("sev"), Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    // severity column is null in routeRaw → rule 1 skipped
    assert(routeRaw(cfg, Seq("m")).head.get._1 == "rest")
  }

  test("stop without forward drops the message") {
    val rules = List(
      Rule(Field.Msg, Some("^drop"), None, List(Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    val out = routeRaw(cfg, Seq("drop me", "keep me"))
    assert(out(0).isEmpty && out(1).get._1 == "rest")
  }

  test("replace rendering empty falls back to raw msg on forward") {
    val rules = List(
      Rule(Field.Msg, Some(".*"), None, List(
        Action.Replace("{{missing_var}}"), Action.Forward("t"), Action.Stop)))
    val cfg = Synth.HotdogConfig.copy(rules = rules)
    // rendered output is "" → forward sends msg (src/connection.rs:185-187)
    assert(routeRaw(cfg, Seq("raw")).head.get._2 == "raw")
  }

  test("example.log test-mode matches (README.adoc:85-98)") {
    val lines = Seq(
      "hello there",
      "This is a somewhat longer line of logs?",
      "This is a MUCH longer log line and it should not be truncated, hopefully",
      """{"this": "is some JSON data", "which": "should also be transmitted properly", "meta" : {"topic" : "test"}}""")
    val out = lines.toDF("line")
      .select(TestMode.matchesStr(Synth.HotdogConfig, col("line")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("0,2", "2", "2", "1,2"))
  }

  test("pipeline transform end-to-end on syslog lines") {
    val lines = Seq(
      """<13>1 2020-04-15T21:16:43.268478-07:00 coconut tyler - - - {"meta":{"topic":"tp"}}""",
      """<13>1 2020-04-15T21:16:43.268478-07:00 coconut tyler - - - some junk""",
      "unparseable")
    val out = GraftPipeline.transform(Synth.HotdogConfig, lines.toDF("line"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out.length == 2)
    assert(out.exists(_._1 == "tp"))
    assert(out.exists { case (t, v) => t == "logs-unknown" && v == "some junk" })
  }

  test("template renderStatic") {
    assert(Template.renderStatic("a {{x}} b {{ y }} c", Map("x" -> "1", "y" -> "2"))
      == "a 1 b 2 c")
    assert(Template.renderStatic("{{gone}}", Map.empty) == "")
  }

  test("template default escape matches handlebars-rust html_escape") {
    // {{var}} escapes & < > " ' (and nothing else — unlike handlebars.js,
    // backtick/equals pass through); {{{var}}} is raw
    val v = Map("x" -> """a&b<c>d"e'f`g=h""")
    assert(Template.renderStatic("{{x}}", v)
      == "a&amp;b&lt;c&gt;d&quot;e&#x27;f`g=h")
    assert(Template.renderStatic("{{{x}}}", v) == """a&b<c>d"e'f`g=h""")
    // escape order: a pre-existing entity double-escapes its ampersand,
    // exactly as handlebars does
    assert(Template.renderStatic("{{y}}", Map("y" -> "&lt;")) == "&amp;lt;")
  }

  test("template #if / #unless / else with nesting and string truthiness") {
    val t = "{{#if name}}hi {{name}}{{else}}{{#unless name}}anon{{/unless}}{{/if}}!"
    assert(Template.renderStatic(t, Map("name" -> "bob")) == "hi bob!")
    assert(Template.renderStatic(t, Map("name" -> "")) == "anon!")
    assert(Template.renderStatic(t, Map.empty) == "anon!")
    assert(Template.renderStatic(
      "{{#unless x}}no-x{{else}}has-x{{/unless}}", Map("x" -> "1")) == "has-x")
  }

  test("template rejects unsupported helpers and malformed blocks at compile") {
    def bad(t: String) = intercept[IllegalArgumentException] {
      Template.renderStatic(t, Map.empty)
    }
    assert(bad("{{#each items}}x{{/each}}").getMessage.contains("unsupported"))
    assert(bad("{{uppercase x}}").getMessage.contains("unsupported"))
    assert(bad("{{a.b}}").getMessage.contains("unsupported"))
    assert(bad("{{#if x}}never closed").getMessage.contains("unterminated block"))
    assert(bad("{{x").getMessage.contains("unterminated"))
    assert(bad("{{/if}}").getMessage.contains("unsupported"))
  }

  test("template column compile agrees with renderStatic on escapes and blocks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = """{{#if name}}hello-from {{name}}{{else}}[{{msg}}]{{/if}} raw: {{{msg}}}"""
    val rows = Seq(
      ("""{"a":1,"b":"x&y<z>"}""", ""),
      ("plain 'quoted' text", ""),
      ("anything", "bob")).toDF("msg", "name")
    val got = rows.select(
      Template.compile(t, Map("msg" -> col("msg"), "name" -> col("name"))).as("v"))
      .as[String].collect().toSeq
    val want = Seq(
      ("""{"a":1,"b":"x&y<z>"}""", ""),
      ("plain 'quoted' text", ""),
      ("anything", "bob")).map { case (m, n) =>
      Template.renderStatic(t, Map("msg" -> m, "name" -> n))
    }
    assert(got == want)
    assert(want.head == """[{&quot;a&quot;:1,&quot;b&quot;:&quot;x&amp;y&lt;z&gt;&quot;}] raw: {"a":1,"b":"x&y<z>"}""")
  }
}
