package graft.config

import java.io.{File, FileInputStream, InputStream}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Rule field selector — which parsed syslog column a rule's predicate is
  * applied to (reference: src/settings.rs:53-61).
  */
sealed abstract class Field(val name: String)
object Field {
  case object Msg      extends Field("msg")
  case object Appname  extends Field("appname")
  case object Hostname extends Field("hostname")
  case object Severity extends Field("severity")
  case object Facility extends Field("facility")
  val all: List[Field] = List(Msg, Appname, Hostname, Severity, Facility)
  def fromString(s: String): Field =
    all.find(_.name == s).getOrElse(throw new GraftConfigException(s"unknown field: $s"))
}

/** Per-rule actions, run in order on a matched message
  * (reference: src/settings.rs:63-92, src/connection.rs:167-242).
  */
sealed trait Action
object Action {
  /** Render `topicTemplate` over the variable map and emit
    * `(topic, output-or-msg)`; terminates rule processing for the message. */
  final case class Forward(topicTemplate: String) extends Action
  /** Deep-merge the (template-rendered) JSON fragment into the message
    * (reference: src/connection.rs:310-335, src/merge.rs:67-86). The fragment
    * is pre-serialized to canonical JSON at config-load time, mirroring
    * src/settings.rs:80-87. */
  final case class Merge(fragmentJson: String) extends Action
  /** Render a template over the variable map into the rule-local output
    * buffer (reference: src/connection.rs:226-236). */
  final case class Replace(template: String) extends Action
  /** Cease rule processing for this message (reference: src/connection.rs:238-240). */
  case object Stop extends Action
}

/** One rule of the ordered cascade (reference: src/settings.rs:90-117).
  * At least one of `regex` / `jmespath` is set; when both are, jmespath
  * wins and the regex is ignored — the reference checks jmespath first
  * (src/rules.rs:74-94 `if let Some(expression) … else if let Some(regex)`).
  */
final case class Rule(
    field: Field,
    regex: Option[String],
    jmespath: Option[String],
    actions: List[Action]) {
  require(regex.isDefined || jmespath.isDefined,
    "rule must declare a regex or jmespath matcher")
}

/** Declared output-schema field types (reference: src/schema.rs:13-21).
  * Note the reference maps `float` to 64-bit (src/schema.rs:31) and
  * `timestamp` to millisecond precision (src/schema.rs:32).
  */
sealed trait FieldType
object FieldType {
  case object Str  extends FieldType
  case object Lng  extends FieldType
  case object Int  extends FieldType
  case object Ts   extends FieldType
  case object Flt  extends FieldType
  case object Bool extends FieldType
  /** Recursive struct nesting (reference: src/schema.rs:45-49). Field lists
    * are name-sorted: the reference stores fields in a HashMap so its order
    * is nondeterministic (src/settings.rs:163-170); we pick a deterministic
    * order instead (SURVEY.md §1.2). */
  final case class Struct(fields: List[(String, FieldType)]) extends FieldType
  def fromString(s: String): FieldType = s match {
    case "string"    => Str
    case "long"      => Lng
    case "integer"   => Int
    case "timestamp" => Ts
    case "float"     => Flt
    case "boolean"   => Bool
    case other       => throw new GraftConfigException(s"unknown field type: $other")
  }
}

/** Declared schema for one output destination (reference: src/settings.rs:163-170). */
final case class TopicSchema(topic: String, fields: List[(String, FieldType)])

class GraftConfigException(msg: String) extends RuntimeException(msg)

/** The compiled configuration — the engine's "logical plan" source of truth
  * (reference: src/settings.rs:172-179). Listener/TLS/statsd endpoints are
  * deployment config, not query semantics, and are carried as raw maps.
  */
final case class GraftConfig(
    rules: List[Rule],
    schemas: Map[String, TopicSchema],
    defaultTopic: Option[String],
    kafkaBuffer: Int,
    kafkaTimeoutMs: Long,
    parquetUrl: Option[String],
    parquetBufferBytes: Option[Long],
    flushMs: Long,
    kafkaConf: Map[String, String])

object GraftConfig {
  val Version = "0.1.0"

  def load(path: String): GraftConfig = {
    val in = new FileInputStream(new File(path))
    try withEnvOverlay(fromInputStream(in), sys.env) finally in.close()
  }

  /** Environment overlay, mirroring the reference's layered config load
    * (yaml file, then HOTDOG_-prefixed environment variables override —
    * src/settings.rs:28-44). Double underscore separates nesting:
    * HOTDOG_GLOBAL__KAFKA__TOPIC=t overrides global.kafka.topic. Only the
    * engine-relevant knobs are modeled (listener/statsd endpoints are
    * deployment config).
    */
  def withEnvOverlay(cfg: GraftConfig, env: Map[String, String]): GraftConfig = {
    def get(key: String): Option[String] =
      env.get("HOTDOG_" + key.toUpperCase.replace(".", "__"))
    val kafkaConf = cfg.kafkaConf ++ env.collect {
      case (k, v) if k.startsWith("HOTDOG_GLOBAL__KAFKA__CONF__") =>
        k.stripPrefix("HOTDOG_GLOBAL__KAFKA__CONF__").toLowerCase.replace("__", ".") -> v
    }
    cfg.copy(
      defaultTopic = get("global.kafka.topic").orElse(cfg.defaultTopic),
      kafkaBuffer = get("global.kafka.buffer").map(_.toInt).getOrElse(cfg.kafkaBuffer),
      kafkaTimeoutMs =
        get("global.kafka.timeout_ms").map(_.toLong).getOrElse(cfg.kafkaTimeoutMs),
      parquetUrl = get("global.parquet.url")
        .orElse(env.get("S3_OUTPUT_URL")).orElse(cfg.parquetUrl),
      parquetBufferBytes =
        get("global.parquet.buffer").map(_.toLong).orElse(cfg.parquetBufferBytes),
      flushMs = get("global.parquet.flush_ms").map(_.toLong).getOrElse(cfg.flushMs),
      kafkaConf = kafkaConf)
  }

  def fromYamlString(yaml: String): GraftConfig =
    fromAny(new Yaml().load[Any](yaml))

  def fromInputStream(in: InputStream): GraftConfig =
    fromAny(new Yaml().load[Any](in))

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> x }.toMap
    case null => Map.empty
    case other => throw new GraftConfigException(s"expected mapping, got $other")
  }

  private def asList(v: Any): List[Any] = v match {
    case l: java.util.List[_] => l.asScala.toList
    case null => Nil
    case other => throw new GraftConfigException(s"expected sequence, got $other")
  }

  private def fromAny(root0: Any): GraftConfig = {
    val root = asMap(root0)
    val global = asMap(root.getOrElse("global", null))
    val kafka = asMap(global.getOrElse("kafka", null))
    val parquet = asMap(global.getOrElse("parquet", null))

    val rules = asList(root.getOrElse("rules", null)).map(parseRule)
    val schemas = asList(root.getOrElse("schemas", null)).map(parseSchema)
      .map(s => s.topic -> s).toMap

    GraftConfig(
      rules = rules,
      schemas = schemas,
      defaultTopic = kafka.get("topic").map(_.toString),
      kafkaBuffer = kafka.get("buffer").map(_.toString.toInt).getOrElse(1024),
      // produce timeout, default 60 s (src/sink/kafka.rs:140,229-231)
      kafkaTimeoutMs = kafka.get("timeout_ms").map(_.toString.toLong).getOrElse(60000L),
      // object-store destination; S3_OUTPUT_URL env fallback
      // (src/sink/parquet.rs:306-311, README TIP)
      parquetUrl = parquet.get("url").map(_.toString),
      parquetBufferBytes = parquet.get("buffer").map(_.toString.toLong),
      flushMs = parquet.get("flush_ms").map(_.toString.toLong).getOrElse(60000L),
      kafkaConf = asMap(kafka.getOrElse("conf", null)).map { case (k, v) => k -> v.toString })
  }

  private def parseRule(v: Any): Rule = {
    val m = asMap(v)
    val regex = m.get("regex").map(_.toString)
    val jmespath = m.get("jmespath").map(_.toString)
    // Validate eagerly, mirroring the reference's startup-time compilation:
    // regex at config-deserialize (src/settings.rs:95-96), jmespath before
    // serving (src/connection.rs:293-307) — an invalid expression is a fatal
    // config error (asserted by test/configs/single-rule-with-invalid-jmespath.yml).
    regex.foreach(r => java.util.regex.Pattern.compile(Regexes.toJava(r)))
    jmespath.foreach { p =>
      try graft.jmespath.JmesPath.compile(p)
      catch {
        case e: graft.jmespath.JmesPath.JmesPathParseException =>
          throw new GraftConfigException(
            s"invalid jmespath expression: $p (${e.getMessage})")
      }
    }
    Rule(
      field = Field.fromString(m.getOrElse("field", "msg").toString),
      regex = regex,
      jmespath = jmespath,
      actions = asList(m.getOrElse("actions", null)).map(parseAction))
  }

  private def parseAction(v: Any): Action = {
    val m = asMap(v)
    m.getOrElse("type", "").toString match {
      case "forward" => Action.Forward(m.getOrElse("topic", "").toString)
      case "merge"   => Action.Merge(CanonicalJson.fromYamlValue(m.getOrElse("json", null)))
      case "replace" => Action.Replace(m.getOrElse("template", "").toString)
      case "stop"    => Action.Stop
      case other     => throw new GraftConfigException(s"unknown action type: $other")
    }
  }

  private def parseSchema(v: Any): TopicSchema = {
    val m = asMap(v)
    TopicSchema(m.getOrElse("topic", "").toString, parseFields(m.getOrElse("fields", null)))
  }

  private def parseFields(v: Any): List[(String, FieldType)] =
    asMap(v).map { case (name, spec) =>
      val sm = asMap(spec)
      // struct recursion: `type: struct` carries a nested `fields` block
      // (reference: src/schema.rs:45-49)
      val t = sm.getOrElse("type", "").toString match {
        case "struct" => FieldType.Struct(parseFields(sm.getOrElse("fields", null)))
        case other    => FieldType.fromString(other)
      }
      name -> t
    }.toList.sortBy(_._1)
}

/** Helpers shared between config validation and the rule compiler. */
object Regexes {
  /** The reference's patterns use Rust/RE2 named-group syntax `(?P<name>…)`
    * (e.g. hotdog.yml:27); Java regex spells it `(?<name>…)`. */
  def toJava(pattern: String): String = pattern.replace("(?P<", "(?<")

  /** Named capture groups in order of their group index (1-based), as
    * (name, groupIndex). Group index counts ALL capturing groups, named or
    * not, left to right — matching both Java and RE2 numbering. */
  def namedGroups(pattern: String): List[(String, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int)]
    var i = 0
    var group = 0
    var inClass = false
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (i + 1 < pattern.length && pattern.charAt(i + 1) == '?') {
            // (?P<name>  or (?<name>  are capturing; other (?… are not
            val rest = pattern.substring(i + 2)
            val named = if (rest.startsWith("P<")) Some(rest.drop(2))
              else if (rest.startsWith("<") && !rest.startsWith("<=") && !rest.startsWith("<!"))
                Some(rest.drop(1))
              else None
            named match {
              case Some(r) =>
                group += 1
                out += ((r.takeWhile(_ != '>'), group))
              case None => ()
            }
          } else group += 1
        case _ => ()
      }
      i += 1
    }
    out.toList
  }

  /** Total capturing group count (for validation). */
  def groupCount(pattern: String): Int =
    java.util.regex.Pattern.compile(toJava(pattern)).matcher("").groupCount()
}

/** The dotted-path JMESPath subset the shipped configs use (e.g. `meta.topic`,
  * hotdog.yml:46): identifiers separated by `.`, each optionally followed by
  * `[n]` indexes. This subset compiles to the codegen'd `get_json_object`
  * FAST PATH in the rule compiler; everything else goes through the full
  * [[graft.jmespath.JmesPath]] evaluator (validated at config load, matching
  * the reference's startup compilation, src/connection.rs:293-307).
  */
object JmesPathSubset {
  private val Segment = "[A-Za-z_][A-Za-z0-9_]*(\\[[0-9]+\\])*".r
  def isValid(expr: String): Boolean =
    expr.nonEmpty && expr.split("\\.", -1).forall(s => Segment.pattern.matcher(s).matches())
  /** Translate to a Spark/DuckDB JSONPath: `meta.topic` → `$.meta.topic`. */
  def toJsonPath(expr: String): String = "$." + expr
}

/** Canonical JSON serialization of a YAML-loaded value: compact, object keys
  * sorted. The reference serializes merge fragments with serde_json whose
  * default Map is a BTreeMap — i.e. keys come out sorted there as well
  * (src/settings.rs:80-87).
  */
object CanonicalJson {
  def fromYamlValue(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }
  private def write(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case m: java.util.Map[_, _] =>
      sb.append('{')
      val entries = m.asScala.toList.map { case (k, x) => k.toString -> x }.sortBy(_._1)
      entries.zipWithIndex.foreach { case ((k, x), i) =>
        if (i > 0) sb.append(',')
        writeString(k, sb); sb.append(':'); write(x, sb)
      }
      sb.append('}')
    case l: java.util.List[_] =>
      sb.append('[')
      l.asScala.zipWithIndex.foreach { case (x, i) =>
        if (i > 0) sb.append(',')
        write(x, sb)
      }
      sb.append(']')
    case s: String => writeString(s, sb)
    case b: java.lang.Boolean => sb.append(b.toString)
    case n: java.lang.Number => sb.append(n.toString)
    case other => writeString(other.toString, sb)
  }
  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
