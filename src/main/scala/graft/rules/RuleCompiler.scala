package graft.rules

import graft.config._
import graft.functions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Handlebars template compiler, at parity with the reference's renderer
  * (handlebars-rust v6 via `Handlebars::new()`, src/connection.rs:22-33)
  * over its actual template context — a flat `HashMap<String, String>` of
  * captures + built-ins (src/connection.rs:154-157). Supported, matching
  * what stock handlebars does on that context:
  *
  *   - `{{var}}` — interpolation through the DEFAULT escape fn, which
  *     HTML-escapes `& < > " '` (handlebars-rust `html_escape`; note: unlike
  *     handlebars.js it does not touch backtick/equals)
  *   - `{{{var}}}` — raw, unescaped interpolation
  *   - `{{#if var}}…{{else}}…{{/if}}` and `{{#unless var}}…{{/unless}}`,
  *     nested arbitrarily — on a string context, truthy ⇔ non-empty
  *   - missing / null variables render as "" and are falsy (strict mode off,
  *     the default; non-participating capture groups are simply absent from
  *     the map, src/rules.rs:98-103)
  *
  * Anything else (`#each`/`#with`/custom helpers/paths) is rejected at
  * compile time with the template position — the analog of the reference
  * panicking at startup when a template fails to precompile
  * (src/connection.rs:27-30: "Failed to precompile the handlebars
  * templates"). `#each`/`#with` never iterate a flat string map usefully,
  * so the rejection loses no reference behavior.
  *
  * The reference precompiles at startup and renders per message; we go one
  * better and compile the whole template — conditionals included — to a
  * Catalyst `when`/`concat` tree at PLAN time: constant segments fold, and
  * the render (escaping included: a `replace` chain) stays inside
  * whole-stage codegen.
  */
object Template {
  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Interp(name: String, raw: Boolean) extends Node
  private final case class Cond(name: String, negate: Boolean,
      yes: List[Node], no: List[Node]) extends Node

  /** handlebars-rust v6 default escape set, `&` first so entities from the
    * later passes survive. */
  private val EscapePairs = List(
    "&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;", "'" -> "&#x27;")

  private val Name = "[A-Za-z_][A-Za-z0-9_]*"
  private val NameRe = Name.r

  private def fail(template: String, at: Int, what: String): Nothing =
    throw new IllegalArgumentException(
      s"template compile failed at offset $at: $what (in template: $template)")

  /** Recursive-descent parse. Returns (nodes, closer-tag-or-"" , next index). */
  private def parseNodes(t: String, from: Int, inBlock: Boolean): (List[Node], String, Int) = {
    val nodes = scala.collection.mutable.ListBuffer.empty[Node]
    var i = from
    while (i < t.length) {
      val open = t.indexOf("{{", i)
      if (open < 0) { nodes += Text(t.substring(i)); i = t.length }
      else {
        if (open > i) nodes += Text(t.substring(i, open))
        val raw = t.startsWith("{{{", open)
        val closeTok = if (raw) "}}}" else "}}"
        val close = t.indexOf(closeTok, open + (if (raw) 3 else 2))
        if (close < 0) fail(t, open, "unterminated tag")
        val body = t.substring(open + (if (raw) 3 else 2), close).trim
        val next = close + closeTok.length
        body match {
          case "else" | "/if" | "/unless" if inBlock && !raw =>
            return (nodes.toList, body, next)
          case "else" => fail(t, open, "{{else}} outside a block")
          case NameRe() => nodes += Interp(body, raw); i = next
          case _ if raw => fail(t, open, s"raw tag must be a plain variable: {{{$body}}}")
          case s if s.startsWith("#if") || s.startsWith("#unless") =>
            val negate = s.startsWith("#unless")
            val arg = s.stripPrefix(if (negate) "#unless" else "#if").trim
            if (!NameRe.matches(arg))
              fail(t, open, s"block argument must be a plain variable, got '$arg'")
            val (yes, stop1, i1) = parseNodes(t, next, inBlock = true)
            val closer = if (negate) "/unless" else "/if"
            val (no, stop2, i2) =
              if (stop1 == "else") parseNodes(t, i1, inBlock = true)
              else (Nil, stop1, i1)
            val stop = if (stop1 == "else") stop2 else stop1
            if (stop != closer) fail(t, open, s"unclosed {{${if (negate) "#unless" else "#if"} $arg}}")
            nodes += Cond(arg, negate, yes, no)
            i = i2
          case other =>
            fail(t, open, s"unsupported helper or path '{{$other}}' — the engine " +
              "supports interpolation, {{{raw}}}, #if/#unless/else over the " +
              "flat variable map (reference context is HashMap<String,String>)")
        }
      }
    }
    if (inBlock) fail(t, t.length, "unterminated block")
    (nodes.toList, "", i)
  }

  private def parse(template: String): List[Node] =
    parseNodes(template, 0, inBlock = false)._1

  // one codegen'd pass ([[graft.functions.HtmlEscape]]) instead of five
  // chained replace()es — five intermediate UTF8Strings per row per
  // variable was the cascade family's hottest allocation site. Resolved
  // by name like parse_syslog: every cascade session registers the graft
  // expressions (GraftExtensions / ensureRegistered).
  private def escapeCol(c: Column): Column = call_function("html_escape", c)

  private def escapeStr(s: String): String =
    EscapePairs.foldLeft(s) { case (acc, (a, b)) => acc.replace(a, b) }

  private def compileNodes(nodes: List[Node], vars: Map[String, Column]): Column = {
    def varCol(name: String) = vars.get(name).map(c => coalesce(c, lit("")))
    val cols = nodes.map {
      case Text(s) => lit(s)
      case Interp(n, raw) =>
        varCol(n).map(c => if (raw) c else escapeCol(c)).getOrElse(lit(""))
      case Cond(n, negate, yes, no) =>
        val t = varCol(n).map(c => c =!= lit("")).getOrElse(lit(false))
        val cond = if (negate) !t else t
        when(cond, compileNodes(yes, vars)).otherwise(compileNodes(no, vars))
    }
    cols match {
      case Nil      => lit("")
      case c :: Nil => c
      case cs       => concat(cs: _*)
    }
  }

  /** Compile to a Catalyst column over runtime variable columns. */
  def compile(template: String, vars: Map[String, Column]): Column =
    compileNodes(parse(template), vars)

  /** Static render for plan-time-constant variable maps (used by tests and
    * the config inspector). Identical semantics to [[compile]]. */
  def renderStatic(template: String, vars: Map[String, String]): String = {
    def render(nodes: List[Node]): String = nodes.map {
      case Text(s) => s
      case Interp(n, raw) =>
        val v = vars.getOrElse(n, "")
        if (raw) v else escapeStr(v)
      case Cond(n, negate, yes, no) =>
        val t = vars.getOrElse(n, "").nonEmpty
        if (t != negate) render(yes) else render(no)
    }.mkString
    render(parse(template))
  }
}

/** Compiles the ordered rule cascade (reference: src/connection.rs:107-243)
  * into ONE Catalyst `CASE WHEN` chain producing `struct(topic, value)`,
  * NULL when the message is dropped (unclaimed, stopped, or aborted by a
  * merge failure).
  *
  * Key semantics preserved from the reference:
  *   - rules evaluate strictly in config order; the first rule that
  *     *terminates* (forward / stop / merge-failure) claims the message
  *     (src/connection.rs:112-114). `CASE WHEN` short-circuits in generated
  *     code, so no message evaluates later predicates once claimed.
  *   - a matched rule that runs off the end of its action list has NO effect
  *     on later rules: the output buffer is rule-local
  *     (src/connection.rs:117) and merge does not mutate the message.
  *   - built-in variables msg/version/iso8601 are inserted AFTER captures and
  *     so override same-named captures (src/connection.rs:155-157 — the code,
  *     not README.adoc:348-353, wins; SURVEY.md §7.5).
  *   - forward with an empty output buffer sends the raw msg
  *     (src/connection.rs:185-187) — a runtime emptiness check, so a replace
  *     that rendered "" also falls back to msg.
  *   - merge on a non-JSON msg sets continue_rules=false WITHOUT breaking
  *     the current rule's action loop (src/connection.rs:213-224 has no
  *     break): later actions in the SAME rule still run — a subsequent
  *     forward still emits (with the unmerged buffer) — but no LATER rule
  *     sees the message; a failing merge with no subsequent forward drops it.
  */
object RuleCompiler {
  /** `err` tags the drop reason for the metrics surface: 1 = merge target
    * not JSON (the claimed-and-dropped state). A dropped row is either a
    * NULL struct (unclaimed / stop) or `topic IS NULL` with `err` set. */
  val OutputType = "struct<topic:string,value:string,err:int>"
  val ErrMergeTargetNotJson = 1

  /** The five addressable fields (reference: src/settings.rs:53-61). */
  final case class FieldCols(
      msg: Column, severity: Column, facility: Column, hostname: Column, appname: Column) {
    def apply(f: Field): Column = f match {
      case Field.Msg      => msg
      case Field.Severity => severity
      case Field.Facility => facility
      case Field.Hostname => hostname
      case Field.Appname  => appname
    }
  }

  /** Outcome of one rule, evaluated per row: `claims` = this rule terminates
    * the cascade for the row; `result` = emitted (topic, value), null = drop.
    */
  private final case class Compiled(claims: Column, result: Column)

  def cascade(cfg: GraftConfig, fields: FieldCols, version: Column, iso8601: Column): Column = {
    val nullOut = lit(null).cast(OutputType)
    val chain = cfg.rules
      .map(compileRule(_, fields, version, iso8601))
      .foldRight(nullOut)((r, rest) => when(r.claims, r.result).otherwise(rest))
    // Opaque: keep the cascade evaluated ONCE per row even when callers
    // reference .topic/.value/.isNotNull separately (see graft.functions.Opaque).
    call_function("opaque", chain)
  }

  private def compileRule(
      rule: Rule, fields: FieldCols, version: Column, iso8601: Column): Compiled = {
    val fieldCol = fields(rule.field)

    // Predicate + extracted variables (src/rules.rs:69-104). A null field
    // silently non-matches (src/connection.rs:121-145). jmespath is checked
    // BEFORE regex, matching the reference's arm order (src/rules.rs:74-94).
    val (matches, extracted): (Column, Map[String, Column]) = (rule.jmespath, rule.regex) match {
      case (None, Some(p)) =>
        val jp = Regexes.toJava(p)
        val caps = Regexes.namedGroups(p).map { case (name, idx) =>
          name -> regexp_extract(fieldCol, jp, idx)
        }.toMap
        (fieldCol.isNotNull && fieldCol.rlike(jp), caps)
      case (Some(expr), _) if JmesPathSubset.isValid(expr) =>
        // Dotted-path fast path via get_json_object: non-null result =
        // match, string result bound as `value` (src/rules.rs:75-93).
        // Divergence (documented): a non-string result binds its JSON text
        // here, where the reference leaves `value` unset.
        val v = get_json_object(fieldCol, JmesPathSubset.toJsonPath(expr))
        (fieldCol.isNotNull && v.isNotNull, Map("value" -> v))
      case (Some(expr), _) =>
        // Full JMESPath (functions, slices, filters, projections — parity
        // with src/rules.rs:74-94 via the jmespath crate): non-null search
        // result = match; ONLY a string result binds `value`
        // (src/rules.rs:80-88) — the v field is null otherwise, and
        // Template renders a null variable as "". Match and binding read
        // two fields of ONE jmespath_qv struct, so codegen's subexpression
        // elimination parses + searches the document once per rule per row.
        val qv = call_function("jmespath_qv", fieldCol, lit(expr))
        (fieldCol.isNotNull && qv.getField("q").isNotNull,
          Map("value" -> qv.getField("v")))
      case _ => (lit(false), Map.empty[String, Column])
    }

    // Built-ins inserted after captures → they override (src/connection.rs:155-157).
    val vars = extracted ++ Map(
      "msg" -> fields.msg, "version" -> version, "iso8601" -> iso8601)

    // Symbolic walk of the action chain (src/connection.rs:167-242).
    var out: Column = lit("")
    var failed: Column = lit(false) // continue_rules=false via merge failure
    var terminal: Option[Column] = None // Some(result): forward/stop reached
    val it = rule.actions.iterator
    while (it.hasNext && terminal.isEmpty) {
      it.next() match {
        case Action.Replace(t) =>
          out = Template.compile(t, vars)
        case Action.Merge(fragment) =>
          val rendered = Template.compile(fragment, vars)
          val merged = GraftFunctions.jsonDeepMerge(fields.msg, rendered)
          failed = failed || merged.isNull
          // on failure the output buffer is left as-is (src/connection.rs:218-222
          // only assigns on Ok) and the action loop CONTINUES
          out = coalesce(merged, out)
        case Action.Forward(topicTmpl) =>
          val topic = Template.compile(topicTmpl, vars)
          val value = when(length(out) === 0, fields.msg).otherwise(out)
          terminal = Some(struct(topic.as("topic"), value.as("value"),
            lit(null).cast("int").as("err")))
        case Action.Stop =>
          terminal = Some(lit(null).cast(OutputType))
      }
    }

    terminal match {
      case Some(result) =>
        // Every matched row terminates here with the forward/stop result —
        // an earlier merge failure does NOT cancel a forward in the same
        // rule (it only stopped later rules, which `claims` already does).
        Compiled(matches, result)
      case None =>
        // No terminal action: only merge-failures terminate (and drop) —
        // tagged so the metrics surface can count them
        // (error.merge_target_not_json, README.adoc:512-515); other matched
        // rows flow on to later rules.
        Compiled(matches && failed,
          struct(lit(null).cast("string").as("topic"),
            lit(null).cast("string").as("value"),
            lit(ErrMergeTargetNotJson).as("err")))
    }
  }
}
