package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite

/** Config loading against the shipped fixtures' shapes
  * (hotdog.yml and the test/configs fixtures — SURVEY.md §5 group 2).
  */
class ConfigSpec extends AnyFunSuite {
  private val hotdogYaml =
    """---
      |global:
      |  listen:
      |    address: '127.0.0.1'
      |    port: 6514
      |  kafka:
      |    buffer: 1024
      |    conf:
      |      bootstrap.servers: '127.0.0.1:9092'
      |    topic: 'test'
      |  metrics:
      |    statsd: 'localhost:8125'
      |rules:
      |  - regex: '^hello\s+(?P<name>\w+)?'
      |    field: msg
      |    actions:
      |      - type: replace
      |        template: |
      |          This is the total message: {{msg}}
      |
      |          And the name is: {{name}}
      |      - type: forward
      |        topic: test
      |      - type: stop
      |  - jmespath: 'meta.topic'
      |    field: msg
      |    actions:
      |      - type: merge
      |        json:
      |          meta:
      |            hotdog:
      |              version: '{{version}}'
      |              timestamp: '{{iso8601}}'
      |      - type: forward
      |        topic: '{{value}}'
      |      - type: stop
      |  - regex: '.*'
      |    field: msg
      |    actions:
      |      - type: forward
      |        topic: 'logs-unknown'
      |      - type: stop
      |""".stripMargin

  test("hotdog.yml shape loads: 3 rules, actions in order") {
    val cfg = GraftConfig.fromYamlString(hotdogYaml)
    assert(cfg.rules.length == 3)
    assert(cfg.defaultTopic.contains("test"))
    assert(cfg.kafkaBuffer == 1024)
    assert(cfg.kafkaConf("bootstrap.servers") == "127.0.0.1:9092")
    val r1 = cfg.rules.head
    assert(r1.field == Field.Msg && r1.regex.isDefined)
    assert(r1.actions.length == 3)
    assert(r1.actions(0).isInstanceOf[Action.Replace])
    assert(r1.actions(1) == Action.Forward("test"))
    assert(r1.actions(2) == Action.Stop)
    // replace template: YAML block scalar with blank line, trailing newline
    val Action.Replace(t) = r1.actions(0): @unchecked
    assert(t == "This is the total message: {{msg}}\n\nAnd the name is: {{name}}\n")
    // merge fragment pre-serialized to canonical JSON (src/settings.rs:80-87)
    val Action.Merge(frag) = cfg.rules(1).actions.head: @unchecked
    assert(frag == """{"meta":{"hotdog":{"timestamp":"{{iso8601}}","version":"{{version}}"}}}""")
    assert(cfg.rules(1).actions(1) == Action.Forward("{{value}}"))
  }

  test("invalid jmespath fails at load (test/configs/single-rule-with-invalid-jmespath.yml)") {
    val bad =
      """rules:
        |  - jmespath: '. 0 meta.topic'
        |    field: msg
        |    actions:
        |      - type: stop
        |""".stripMargin
    assertThrows[GraftConfigException](GraftConfig.fromYamlString(bad))
  }

  test("invalid regex fails at load (src/settings.rs:95-96 parity)") {
    val bad =
      """rules:
        |  - regex: '([unclosed'
        |    field: msg
        |    actions: []
        |""".stripMargin
    assertThrows[Exception](GraftConfig.fromYamlString(bad))
  }

  test("field routing config (single-rule-with-hostname-field.yml shape)") {
    val yml =
      """rules:
        |  - regex: '^coconut$'
        |    field: hostname
        |    actions:
        |      - type: forward
        |        topic: test
        |""".stripMargin
    assert(GraftConfig.fromYamlString(yml).rules.head.field == Field.Hostname)
  }

  test("declared schemas load name-sorted with nested structs (FIXTURES.md §4)") {
    val yml =
      """schemas:
        |  - topic: test
        |    fields:
        |      version: { type: string }
        |      meta:
        |        type: struct
        |        fields:
        |          topic: { type: string }
        |      count: { type: long }
        |      ratio: { type: float }
        |      at: { type: timestamp }
        |      ok: { type: boolean }
        |""".stripMargin
    val cfg = GraftConfig.fromYamlString(yml)
    val s = cfg.schemas("test")
    assert(s.fields.map(_._1) == List("at", "count", "meta", "ok", "ratio", "version"))
    assert(s.fields.toMap.apply("meta") == FieldType.Struct(List("topic" -> FieldType.Str)))
    val st = graft.sinks.SchemaConv.forTopic(s)
    import org.apache.spark.sql.types._
    assert(st("ratio").dataType == DoubleType) // reference float = 64-bit
    assert(st("at").dataType == TimestampType)
    assert(st.forall(_.nullable))
  }

  test("declared schema decodes all seven field types (src/schema.rs:24-41)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val st = graft.sinks.SchemaConv.toStructType(List(
      "b" -> FieldType.Bool, "f" -> FieldType.Flt, "i" -> FieldType.Int,
      "l" -> FieldType.Lng, "s" -> FieldType.Str,
      "t" -> FieldType.Ts,
      "n" -> FieldType.Struct(List("x" -> FieldType.Lng))))
    val json = """{"b":true,"f":1.5,"i":7,"l":123456789012,"s":"hi","t":"2024-01-02T03:04:05.678Z","n":{"x":9}}"""
    val r = Seq(json).toDF("v").select(from_json($"v", st).as("j")).select("j.*").head()
    assert(r.getAs[Boolean]("b"))
    assert(r.getAs[Double]("f") == 1.5) // reference float = 64-bit
    assert(r.getAs[Int]("i") == 7)
    assert(r.getAs[Long]("l") == 123456789012L)
    assert(r.getAs[String]("s") == "hi")
    assert(r.getAs[java.sql.Timestamp]("t").toInstant.toString == "2024-01-02T03:04:05.678Z")
    assert(r.getAs[org.apache.spark.sql.Row]("n").getAs[Long]("x") == 9L)
  }

  test("env overlay overrides yaml (src/settings.rs:28-44 layering)") {
    val cfg = GraftConfig.fromYamlString(hotdogYaml)
    val over = GraftConfig.withEnvOverlay(cfg, Map(
      "HOTDOG_GLOBAL__KAFKA__TOPIC" -> "overridden",
      "HOTDOG_GLOBAL__KAFKA__BUFFER" -> "99",
      "HOTDOG_GLOBAL__KAFKA__TIMEOUT_MS" -> "1234",
      "HOTDOG_GLOBAL__PARQUET__FLUSH_MS" -> "5000",
      "HOTDOG_GLOBAL__KAFKA__CONF__BOOTSTRAP__SERVERS" -> "other:9092",
      "S3_OUTPUT_URL" -> "s3://bucket/streams/",
      "UNRELATED" -> "x"))
    assert(over.defaultTopic.contains("overridden"))
    assert(over.kafkaBuffer == 99)
    assert(over.kafkaTimeoutMs == 1234L)
    assert(over.flushMs == 5000L)
    assert(over.kafkaConf("bootstrap.servers") == "other:9092")
    assert(over.parquetUrl.contains("s3://bucket/streams/"))
    // no env → unchanged
    assert(GraftConfig.withEnvOverlay(cfg, Map.empty) == cfg)
  }

  test("regex named-group index mapping") {
    assert(Regexes.namedGroups("^hello\\s+(?P<name>\\w+)?") == List(("name", 1)))
    assert(Regexes.namedGroups("(a)(?P<x>b)(?:c)(?<y>d)") == List(("x", 2), ("y", 3)))
  }

  test("jmespath subset: dotted paths with array indexes") {
    assert(JmesPathSubset.isValid("meta.topic"))
    assert(JmesPathSubset.isValid("a.b[0].c[12]"))
    assert(!JmesPathSubset.isValid(". 0 meta.topic"))
    assert(!JmesPathSubset.isValid("length(@)"))
    assert(!JmesPathSubset.isValid(""))
    assert(JmesPathSubset.toJsonPath("a.b[0]") == "$.a.b[0]")
    // array-index extraction works through get_json_object
    val spark = TestSpark.spark
    import spark.implicits._
    val v = Seq("""{"a":{"b":[{"c":"hit"},{"c":"miss"}]}}""").toDF("j")
      .select(org.apache.spark.sql.functions.get_json_object(
        $"j", JmesPathSubset.toJsonPath("a.b[0].c")))
      .head().getString(0)
    assert(v == "hit")
  }

  test("GraftConfig.load: full file round-trip with rules + schemas") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".yml")
    java.nio.file.Files.writeString(f,
      hotdogYaml +
        """schemas:
          |  - topic: test
          |    fields:
          |      k: { type: long }
          |""".stripMargin)
    val cfg = GraftConfig.load(f.toString)
    assert(cfg.rules.length == 3)
    assert(cfg.schemas("test").fields == List("k" -> FieldType.Lng))
  }
}
