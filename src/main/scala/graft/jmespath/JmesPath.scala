package graft.jmespath

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** A complete JMESPath (jmespath.org) implementation over Jackson trees —
  * tokenizer, Pratt parser, and tree-walking evaluator, on the public JDK +
  * Jackson only (no external JMESPath dependency is available offline).
  *
  * This is what gives graft parity with the reference's rule language
  * beyond the dotted-path subset: the reference compiles arbitrary JMESPath
  * through the jmespath crate (src/rules.rs:74-94), pre-compiling at startup
  * and treating an uncompilable expression as a fatal config error
  * (src/connection.rs:290-307).
  *
  * Error model mirrors the reference exactly:
  *   - compile (parse) errors throw [[JmesPathParseException]] — config load
  *     rejects the rule (test/configs/single-rule-with-invalid-jmespath.yml);
  *   - runtime errors (invalid types for a function, bad arity) abort the
  *     search — the reference's `if let Ok(result) = expr.search(..)` turns
  *     them into "no match", and so does [[JmesPathEval]];
  *   - an unparseable input document is "no match"
  *     (`Variable::from_json` Err arm, src/rules.rs:76).
  *
  * Implemented surface: identifiers (raw + quoted), sub-expressions, index /
  * negative index, slices with step, list/object/flatten/filter projections,
  * multi-select lists and hashes, pipes, `||` / `&&` / `!`, comparators,
  * raw-string and JSON literals, `@`, expression references `&`, and all 26
  * spec built-in functions.
  */
object JmesPath {
  final class JmesPathParseException(msg: String)
    extends IllegalArgumentException(msg)
  /** Search-time failure (invalid-type / invalid-arity / unknown-function) —
    * maps to "rule does not match", never to a query error. */
  final class JmesPathRuntimeException(msg: String) extends RuntimeException(msg)

  private val mapper = new ObjectMapper()
  private def fail(msg: String): Nothing = throw new JmesPathParseException(msg)
  private def err(msg: String): Nothing = throw new JmesPathRuntimeException(msg)

  // ------------------------------------------------------------------ AST

  sealed trait Ast
  private object Ast {
    case object Identity extends Ast // also `@` (current node)
    final case class Field(name: String) extends Ast
    final case class Sub(l: Ast, r: Ast) extends Ast
    final case class Index(l: Ast, i: Long) extends Ast
    final case class Slice(l: Ast, start: Option[Long], stop: Option[Long],
        step: Long, r: Ast) extends Ast
    final case class Proj(l: Ast, r: Ast) extends Ast        // [*]
    final case class ValueProj(l: Ast, r: Ast) extends Ast   // .*
    final case class FlattenProj(l: Ast, r: Ast) extends Ast // []
    final case class FilterProj(l: Ast, cond: Ast, r: Ast) extends Ast // [?…]
    final case class MultiList(items: List[Ast]) extends Ast
    final case class MultiHash(pairs: List[(String, Ast)]) extends Ast
    final case class Pipe(l: Ast, r: Ast) extends Ast
    final case class OrE(l: Ast, r: Ast) extends Ast
    final case class AndE(l: Ast, r: Ast) extends Ast
    final case class NotE(e: Ast) extends Ast
    final case class Cmp(op: String, l: Ast, r: Ast) extends Ast
    final case class Func(name: String, args: List[Ast]) extends Ast
    final case class ExpRef(e: Ast) extends Ast
    final case class Lit(node: JsonNode) extends Ast
  }
  import Ast._

  // ------------------------------------------------------------- tokenizer

  private sealed abstract class Tok(val lbp: Int)
  private object Tok {
    final case class Id(name: String) extends Tok(0)
    final case class QuotedId(name: String) extends Tok(0)
    final case class Num(n: Long) extends Tok(0)
    final case class RawStr(s: String) extends Tok(0)
    final case class Literal(node: JsonNode) extends Tok(0)
    case object Dot extends Tok(40)
    case object Star extends Tok(20)
    case object PipeT extends Tok(1)
    case object OrT extends Tok(2)
    case object AndT extends Tok(3)
    case object NotT extends Tok(45)
    final case class CmpT(op: String) extends Tok(5)
    case object LParen extends Tok(60)
    case object RParen extends Tok(0)
    case object LBracket extends Tok(55)
    case object RBracket extends Tok(0)
    case object LBrace extends Tok(50)
    case object RBrace extends Tok(0)
    case object Comma extends Tok(0)
    case object Colon extends Tok(0)
    case object Amp extends Tok(0)    // & expression reference
    case object At extends Tok(0)     // @
    case object Flatten extends Tok(9)  // []
    case object Filter extends Tok(21)  // [?
    case object Eof extends Tok(0)
  }

  private def tokenize(s: String): Array[Tok] = {
    import Tok._
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    def more = i < s.length
    while (more) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case _ if c.isLetter || c == '_' =>
          val start = i
          while (more && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          out += Id(s.substring(start, i))
        case _ if c.isDigit || c == '-' =>
          val start = i
          i += 1
          while (more && s.charAt(i).isDigit) i += 1
          val text = s.substring(start, i)
          if (text == "-") fail("bare '-' is not a number")
          out += Num(text.toLong)
        case '"' =>
          // JSON string semantics — delegate unescaping to Jackson
          val start = i
          i += 1
          while (more && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\') i += 1
            i += 1
          }
          if (!more) fail("unterminated quoted identifier")
          i += 1
          val parsed = try mapper.readTree(s.substring(start, i))
            catch { case _: Exception => fail(s"bad quoted identifier in: $s") }
          out += QuotedId(parsed.textValue())
        case '\'' =>
          val sb = new StringBuilder
          i += 1
          while (more && s.charAt(i) != '\'') {
            if (s.charAt(i) == '\\' && i + 1 < s.length &&
                (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '\\')) {
              sb.append(s.charAt(i + 1)); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          if (!more) fail("unterminated raw string")
          i += 1
          out += RawStr(sb.toString)
        case '`' =>
          val sb = new StringBuilder
          i += 1
          while (more && s.charAt(i) != '`') {
            if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == '`') {
              sb.append('`'); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          if (!more) fail("unterminated literal")
          i += 1
          val text = sb.toString
          val node = try mapper.readTree(text) catch {
            // legacy elided-quotes form: `foo` ≡ `"foo"`
            case _: Exception => TextNode.valueOf(text.trim)
          }
          out += Literal(if (node == null) TextNode.valueOf(text.trim) else node)
        case '.' => out += Dot; i += 1
        case '*' => out += Star; i += 1
        case ',' => out += Comma; i += 1
        case ':' => out += Colon; i += 1
        case '@' => out += At; i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '{' => out += LBrace; i += 1
        case '}' => out += RBrace; i += 1
        case ']' => out += RBracket; i += 1
        case '[' =>
          if (i + 1 < s.length && s.charAt(i + 1) == ']') { out += Flatten; i += 2 }
          else if (i + 1 < s.length && s.charAt(i + 1) == '?') { out += Filter; i += 2 }
          else { out += LBracket; i += 1 }
        case '|' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '|') { out += OrT; i += 2 }
          else { out += PipeT; i += 1 }
        case '&' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '&') { out += AndT; i += 2 }
          else { out += Amp; i += 1 }
        case '!' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpT("!="); i += 2 }
          else { out += NotT; i += 1 }
        case '=' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpT("=="); i += 2 }
          else fail("'=' is not a JMESPath operator (did you mean '=='?)")
        case '<' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpT("<="); i += 2 }
          else { out += CmpT("<"); i += 1 }
        case '>' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpT(">="); i += 2 }
          else { out += CmpT(">"); i += 1 }
        case other => fail(s"unexpected character '$other' in: $s")
      }
    }
    out += Eof
    out.toArray
  }

  // ---------------------------------------------------------------- parser
  // Pratt parser with the standard JMESPath binding powers.

  private final class Parser(tokens: Array[Tok]) {
    import Tok._
    private var pos = 0
    private def peek: Tok = tokens(pos)
    private def peek2: Tok = if (pos + 1 < tokens.length) tokens(pos + 1) else Eof
    private def advance(): Tok = { val t = tokens(pos); pos += 1; t }
    private def expect(t: Tok): Unit =
      if (advance() != t) fail(s"expected $t")

    def parse(): Ast = {
      val e = expression(0)
      if (peek != Eof) fail(s"trailing tokens after expression: $peek")
      e
    }

    def expression(rbp: Int): Ast = {
      var left = nud(advance())
      while (peek.lbp > rbp) left = led(advance(), left)
      left
    }

    private def nud(t: Tok): Ast = t match {
      case Literal(n) => Lit(n)
      case RawStr(s) => Lit(TextNode.valueOf(s))
      case Id(name) => Field(name)
      case QuotedId(name) =>
        if (peek == LParen) fail("quoted identifier cannot be a function name")
        Field(name)
      case Star => ValueProj(Identity, projectionRhs(Star.lbp))
      case Filter => filterRest(Identity)
      case LBrace => multiHash()
      case LBracket =>
        peek match {
          case Num(_) | Colon => indexOrSlice(Identity)
          case Star if peek2 == RBracket =>
            advance(); advance()
            // projection RHS binds at star power (20), not bracket power:
            // `[*].b[0]` keeps the [0] INSIDE the projection
            Proj(Identity, projectionRhs(Star.lbp))
          case _ => multiList()
        }
      case Flatten => FlattenProj(Identity, projectionRhs(Flatten.lbp))
      case NotT => NotE(expression(NotT.lbp))
      case At => Identity
      case Amp => ExpRef(expression(0))
      case LParen =>
        val e = expression(0); expect(RParen); e
      case other => fail(s"unexpected token $other")
    }

    private def led(t: Tok, left: Ast): Ast = t match {
      case Dot =>
        if (peek == Star) { advance(); ValueProj(left, projectionRhs(Dot.lbp)) }
        else Sub(left, dotRhs(Dot.lbp))
      case PipeT => Pipe(left, expression(PipeT.lbp))
      case OrT => OrE(left, expression(OrT.lbp))
      case AndT => AndE(left, expression(AndT.lbp))
      case CmpT(op) => Cmp(op, left, expression(5))
      case Flatten => FlattenProj(left, projectionRhs(Flatten.lbp))
      case Filter => filterRest(left)
      case LBracket =>
        peek match {
          case Num(_) | Colon => indexOrSlice(left)
          case Star if peek2 == RBracket =>
            advance(); advance()
            // star power (20): `a[*].b[0]` applies b[0] per element
            Proj(left, projectionRhs(Star.lbp))
          case other => fail(s"expected number, ':' or '*' after '[', got $other")
        }
      case LParen =>
        left match {
          case Field(name) =>
            val args = ArrayBuffer.empty[Ast]
            if (peek != RParen) {
              args += expression(0)
              while (peek == Comma) { advance(); args += expression(0) }
            }
            expect(RParen)
            Func(name, args.toList)
          case _ => fail("function call on a non-identifier")
        }
      case other => fail(s"unexpected infix token $other")
    }

    /** `[n]` or `[start:stop:step]` after `[` has been consumed; `left` is
      * the expression being indexed/sliced. Slices create projections. */
    private def indexOrSlice(left: Ast): Ast = {
      var parts = List.empty[Option[Long]]
      var cur: Option[Long] = None
      var sawColon = 0
      var done = false
      while (!done) {
        peek match {
          case Num(n) => advance(); cur = Some(n)
          case Colon =>
            advance(); sawColon += 1
            if (sawColon > 2) fail("too many ':' in slice")
            parts :+= cur; cur = None
          case RBracket => advance(); parts :+= cur; done = true
          case other => fail(s"unexpected token in brackets: $other")
        }
      }
      if (sawColon == 0) parts.head match {
        case Some(n) => Index(left, n)
        case None => fail("empty brackets")
      } else {
        val start = parts.head
        val stop = if (parts.size > 1) parts(1) else None
        val step = (if (parts.size > 2) parts(2) else None).getOrElse(1L)
        if (step == 0) fail("slice step cannot be 0")
        Slice(left, start, stop, step, projectionRhs(Star.lbp))
      }
    }

    private def filterRest(left: Ast): Ast = {
      val cond = expression(0)
      expect(Tok.RBracket)
      FilterProj(left, cond, projectionRhs(Tok.Filter.lbp))
    }

    private def projectionRhs(bp: Int): Ast =
      peek match {
        case t if t.lbp < 10 => Identity
        case Tok.LBracket | Tok.Filter => expression(bp)
        case Tok.Dot => advance(); dotRhs(bp)
        case other => fail(s"bad projection right-hand side: $other")
      }

    private def dotRhs(bp: Int): Ast =
      peek match {
        case Tok.Id(_) | Tok.QuotedId(_) | Tok.Star => expression(bp)
        case Tok.LBracket => advance(); multiList()
        case Tok.LBrace => advance(); multiHash()
        case other => fail(s"expected identifier, '*', '[' or '{' after '.', got $other")
      }

    private def multiList(): Ast = {
      val items = ArrayBuffer[Ast](expression(0))
      while (peek == Tok.Comma) { advance(); items += expression(0) }
      expect(Tok.RBracket)
      MultiList(items.toList)
    }

    private def multiHash(): Ast = {
      def pair(): (String, Ast) = {
        val key = advance() match {
          case Tok.Id(n) => n
          case Tok.QuotedId(n) => n
          case other => fail(s"expected identifier key in multi-select hash, got $other")
        }
        expect(Tok.Colon)
        key -> expression(0)
      }
      val pairs = ArrayBuffer[(String, Ast)](pair())
      while (peek == Tok.Comma) { advance(); pairs += pair() }
      expect(Tok.RBrace)
      MultiHash(pairs.toList)
    }
  }

  /** Compile an expression — throws [[JmesPathParseException]] on syntax
    * errors (the config loader turns that into a fatal config error, as the
    * reference does at startup). */
  def compile(expr: String): Compiled = {
    if (expr.trim.isEmpty) fail("empty expression")
    new Compiled(new Parser(tokenize(expr)).parse(), expr)
  }

  /** Convenience: full search on JSON text; None = input not valid JSON. */
  def search(expr: String, json: String): Option[JsonNode] =
    compile(expr).searchText(json)

  // ------------------------------------------------------------- evaluator

  final class Compiled private[JmesPath] (private val ast: Ast, val source: String)
      extends Serializable {
    def searchText(json: String): Option[JsonNode] = {
      val doc = try mapper.readTree(json) catch { case _: Exception => return None }
      if (doc == null) None else Some(searchNode(doc))
    }
    def searchNode(doc: JsonNode): JsonNode = eval(ast, doc)
  }

  private val Null: JsonNode = NullNode.getInstance

  private def truthy(n: JsonNode): Boolean = n match {
    case _ if n.isNull || n.isMissingNode => false
    case b: BooleanNode => b.booleanValue()
    case t: TextNode => t.textValue().nonEmpty
    case a: ArrayNode => a.size() > 0
    case o: ObjectNode => o.size() > 0
    case _ => true // all numbers are truthy
  }

  /** Numeric-aware deep equality (1 == 1.0; Jackson's equals is type-strict). */
  private def deepEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.doubleValue() == b.doubleValue()
    else if (a.isArray && b.isArray)
      a.size() == b.size() &&
        (0 until a.size()).forall(i => deepEq(a.get(i), b.get(i)))
    else if (a.isObject && b.isObject) {
      val ka = a.fieldNames().asScala.toSet
      ka == b.fieldNames().asScala.toSet && ka.forall(k => deepEq(a.get(k), b.get(k)))
    } else a.equals(b)

  /** Whole doubles collapse to longs so `sum([1,2])` serializes as `3`. */
  private def num(d: Double): JsonNode =
    if (d.isWhole && math.abs(d) <= 9007199254740992.0) LongNode.valueOf(d.toLong)
    else DoubleNode.valueOf(d)

  private def arr(items: Seq[JsonNode]): ArrayNode = {
    val a = mapper.createArrayNode()
    items.foreach(a.add)
    a
  }

  private def eval(node: Ast, cur: JsonNode): JsonNode = node match {
    case Identity => cur
    case Lit(n) => n
    case Field(name) =>
      if (cur.isObject && cur.has(name)) cur.get(name) else Null
    case Sub(l, r) =>
      val v = eval(l, cur)
      if (v.isNull || v.isMissingNode) Null else eval(r, v)
    case Index(l, i) =>
      val v = eval(l, cur)
      if (!v.isArray) Null
      else {
        val idx = if (i < 0) v.size() + i else i
        if (idx < 0 || idx >= v.size()) Null else v.get(idx.toInt)
      }
    case Slice(l, start, stop, step, r) =>
      val v = eval(l, cur)
      if (!v.isArray) Null
      else project(slice(v.asInstanceOf[ArrayNode], start, stop, step), r)
    case Proj(l, r) =>
      val v = eval(l, cur)
      if (!v.isArray) Null
      else project(v.elements().asScala.toSeq, r)
    case ValueProj(l, r) =>
      val v = eval(l, cur)
      if (!v.isObject) Null
      else project(v.properties().asScala.toSeq.map(_.getValue), r)
    case FlattenProj(l, r) =>
      val v = eval(l, cur)
      if (!v.isArray) Null
      else {
        val flat = v.elements().asScala.toSeq.flatMap { e =>
          if (e.isArray) e.elements().asScala.toSeq else Seq(e)
        }
        project(flat, r)
      }
    case FilterProj(l, cond, r) =>
      val v = eval(l, cur)
      if (!v.isArray) Null
      else project(v.elements().asScala.toSeq.filter(e => truthy(eval(cond, e))), r)
    case MultiList(items) =>
      if (cur.isNull || cur.isMissingNode) Null
      else arr(items.map(eval(_, cur)))
    case MultiHash(pairs) =>
      if (cur.isNull || cur.isMissingNode) Null
      else {
        val o = mapper.createObjectNode()
        pairs.foreach { case (k, e) => o.set[JsonNode](k, eval(e, cur)); () }
        o
      }
    case Pipe(l, r) => eval(r, eval(l, cur))
    case OrE(l, r) =>
      val a = eval(l, cur)
      if (truthy(a)) a else eval(r, cur)
    case AndE(l, r) =>
      val a = eval(l, cur)
      if (truthy(a)) eval(r, cur) else a
    case NotE(e) => BooleanNode.valueOf(!truthy(eval(e, cur)))
    case Cmp(op, l, r) =>
      val a = eval(l, cur)
      val b = eval(r, cur)
      op match {
        case "==" => BooleanNode.valueOf(deepEq(a, b))
        case "!=" => BooleanNode.valueOf(!deepEq(a, b))
        case _ =>
          // ordering is defined for numbers only; otherwise null (spec)
          if (!a.isNumber || !b.isNumber) Null
          else {
            val (x, y) = (a.doubleValue(), b.doubleValue())
            BooleanNode.valueOf(op match {
              case "<" => x < y
              case "<=" => x <= y
              case ">" => x > y
              case ">=" => x >= y
            })
          }
      }
    case Func(name, args) => callFunction(name, args, cur)
    case ExpRef(_) => err("expression reference used as a value")
  }

  /** Apply a projection RHS to each element, dropping null results. */
  private def project(items: Seq[JsonNode], r: Ast): JsonNode =
    arr(items.map(eval(r, _)).filterNot(v => v.isNull || v.isMissingNode))

  private def slice(a: ArrayNode, start: Option[Long], stop: Option[Long],
      step: Long): Seq[JsonNode] = {
    val n = a.size()
    def clamp(v: Long, lo: Long, hi: Long): Int = math.max(lo, math.min(v, hi)).toInt
    def resolve(v: Option[Long], default: Long, endDefault: Long): Int = v match {
      case Some(x) if x < 0 => clamp(n + x, if (step < 0) -1 else 0, n)
      case Some(x) => clamp(x, if (step < 0) -1 else 0, if (step < 0) n - 1 else n)
      case None => (if (step < 0) endDefault else default).toInt
    }
    val s0 = resolve(start, 0, n - 1)
    val e0 = resolve(stop, n, -1)
    val out = ArrayBuffer.empty[JsonNode]
    var i = s0.toLong
    if (step > 0) while (i < e0) { out += a.get(i.toInt); i += step }
    else while (i > e0) { out += a.get(i.toInt); i += step }
    out.toSeq
  }

  // ------------------------------------------------------------- functions

  private def callFunction(name: String, argAsts: List[Ast], cur: JsonNode): JsonNode = {
    def arity(n: Int): Unit =
      if (argAsts.size != n) err(s"invalid-arity: $name expects $n arguments")
    def value(a: Ast): JsonNode = a match {
      case ExpRef(_) => err(s"invalid-type: $name does not take an expression reference here")
      case other => eval(other, cur)
    }
    def expref(a: Ast): Ast = a match {
      case ExpRef(e) => e
      case _ => err(s"invalid-type: $name requires an &expression argument")
    }
    def numArg(a: Ast): Double = {
      val v = value(a)
      if (!v.isNumber) err(s"invalid-type: $name requires a number") else v.doubleValue()
    }
    def strArg(a: Ast): String = {
      val v = value(a)
      if (!v.isTextual) err(s"invalid-type: $name requires a string") else v.textValue()
    }
    def arrArg(a: Ast): Seq[JsonNode] = {
      val v = value(a)
      if (!v.isArray) err(s"invalid-type: $name requires an array")
      else v.elements().asScala.toSeq
    }
    def numArr(a: Ast): Seq[Double] = arrArg(a).map { e =>
      if (!e.isNumber) err(s"invalid-type: $name requires an array of numbers")
      else e.doubleValue()
    }
    /** array entirely numbers or entirely strings (for min/max/sort). */
    def ordArr(a: Ast): Seq[JsonNode] = {
      val items = arrArg(a)
      val ok = items.forall(_.isNumber) || items.forall(_.isTextual)
      if (!ok) err(s"invalid-type: $name requires all-number or all-string array")
      items
    }
    def ordKey(e: JsonNode): Either[Double, String] =
      if (e.isNumber) Left(e.doubleValue())
      else if (e.isTextual) Right(e.textValue())
      else err(s"invalid-type: $name key must be number or string")

    name match {
      case "abs" => arity(1); num(math.abs(numArg(argAsts.head)))
      case "ceil" => arity(1); num(math.ceil(numArg(argAsts.head)))
      case "floor" => arity(1); num(math.floor(numArg(argAsts.head)))
      case "avg" =>
        arity(1)
        val xs = numArr(argAsts.head)
        if (xs.isEmpty) Null else num(xs.sum / xs.size)
      case "sum" => arity(1); num(numArr(argAsts.head).sum)
      case "min" | "max" =>
        arity(1)
        val items = ordArr(argAsts.head)
        if (items.isEmpty) Null
        else if (items.head.isNumber) {
          val xs = items.map(_.doubleValue())
          num(if (name == "min") xs.min else xs.max)
        } else {
          val xs = items.map(_.textValue())
          TextNode.valueOf(if (name == "min") xs.min else xs.max)
        }
      case "min_by" | "max_by" =>
        arity(2)
        val items = arrArg(argAsts.head)
        val key = expref(argAsts(1))
        if (items.isEmpty) Null
        else {
          val keyed = items.map(e => (e, ordKey(eval(key, e))))
          val better: ((JsonNode, Either[Double, String]), (JsonNode, Either[Double, String])) => Boolean = {
            case ((_, Left(a)), (_, Left(b))) => if (name == "min_by") a < b else a > b
            case ((_, Right(a)), (_, Right(b))) => if (name == "min_by") a < b else a > b
            case _ => err(s"invalid-type: $name keys must be homogeneous")
          }
          keyed.reduceLeft((best, e) => if (better(e, best)) e else best)._1
        }
      case "sort" =>
        arity(1)
        val items = ordArr(argAsts.head)
        if (items.isEmpty) arr(Nil)
        else if (items.head.isNumber) arr(items.sortBy(_.doubleValue()))
        else arr(items.sortBy(_.textValue()))
      case "sort_by" =>
        arity(2)
        val items = arrArg(argAsts.head)
        val key = expref(argAsts(1))
        if (items.isEmpty) arr(Nil)
        else {
          val keyed = items.map(e => (e, ordKey(eval(key, e))))
          if (keyed.forall(_._2.isLeft))
            arr(keyed.sortBy(_._2.swap.getOrElse(0.0)).map(_._1))
          else if (keyed.forall(_._2.isRight))
            arr(keyed.sortBy(_._2.getOrElse("")).map(_._1))
          else err("invalid-type: sort_by keys must be homogeneous")
        }
      case "map" =>
        arity(2)
        val f = expref(argAsts.head)
        // map does NOT drop null results (unlike projections)
        arr(arrArg(argAsts(1)).map(eval(f, _)))
      case "length" =>
        arity(1)
        val v = value(argAsts.head)
        if (v.isTextual) num(v.textValue().codePointCount(0, v.textValue().length).toDouble)
        else if (v.isArray || v.isObject) num(v.size().toDouble)
        else err("invalid-type: length requires string, array or object")
      case "keys" =>
        arity(1)
        val v = value(argAsts.head)
        if (!v.isObject) err("invalid-type: keys requires an object")
        else arr(v.fieldNames().asScala.toSeq.map(TextNode.valueOf))
      case "values" =>
        arity(1)
        val v = value(argAsts.head)
        if (!v.isObject) err("invalid-type: values requires an object")
        else arr(v.properties().asScala.toSeq.map(_.getValue))
      case "contains" =>
        arity(2)
        val v = value(argAsts.head)
        val x = value(argAsts(1))
        if (v.isArray) BooleanNode.valueOf(v.elements().asScala.exists(deepEq(_, x)))
        else if (v.isTextual) {
          if (!x.isTextual) BooleanNode.FALSE
          else BooleanNode.valueOf(v.textValue().contains(x.textValue()))
        } else err("invalid-type: contains requires array or string")
      case "starts_with" =>
        arity(2); BooleanNode.valueOf(strArg(argAsts.head).startsWith(strArg(argAsts(1))))
      case "ends_with" =>
        arity(2); BooleanNode.valueOf(strArg(argAsts.head).endsWith(strArg(argAsts(1))))
      case "join" =>
        arity(2)
        val glue = strArg(argAsts.head)
        val items = arrArg(argAsts(1)).map { e =>
          if (!e.isTextual) err("invalid-type: join requires an array of strings")
          else e.textValue()
        }
        TextNode.valueOf(items.mkString(glue))
      case "reverse" =>
        arity(1)
        val v = value(argAsts.head)
        if (v.isArray) arr(v.elements().asScala.toSeq.reverse)
        else if (v.isTextual) TextNode.valueOf(v.textValue().reverse)
        else err("invalid-type: reverse requires array or string")
      case "merge" =>
        if (argAsts.isEmpty) err("invalid-arity: merge expects at least 1 argument")
        val o = mapper.createObjectNode()
        argAsts.foreach { a =>
          val v = value(a)
          if (!v.isObject) err("invalid-type: merge requires objects")
          v.properties().asScala.foreach { e => o.set[JsonNode](e.getKey, e.getValue); () }
        }
        o
      case "not_null" =>
        if (argAsts.isEmpty) err("invalid-arity: not_null expects at least 1 argument")
        argAsts.iterator.map(value)
          .find(v => !v.isNull && !v.isMissingNode).getOrElse(Null)
      case "to_array" =>
        arity(1)
        val v = value(argAsts.head)
        if (v.isArray) v else arr(Seq(v))
      case "to_string" =>
        arity(1)
        val v = value(argAsts.head)
        if (v.isTextual) v else TextNode.valueOf(serialize(v))
      case "to_number" =>
        arity(1)
        val v = value(argAsts.head)
        if (v.isNumber) v
        else if (v.isTextual) {
          try num(v.textValue().toDouble) catch { case _: NumberFormatException => Null }
        } else Null
      case "type" =>
        arity(1)
        TextNode.valueOf(value(argAsts.head) match {
          case v if v.isTextual => "string"
          case v if v.isBoolean => "boolean"
          case v if v.isNumber => "number"
          case v if v.isArray => "array"
          case v if v.isObject => "object"
          case _ => "null"
        })
      case other => err(s"unknown-function: $other")
    }
  }

  /** Canonical compact serialization (object keys sorted — graft's engine-
    * wide canonical JSON form, same as json_deep_merge output). */
  def serialize(n: JsonNode): String = graft.functions.JsonMerge.serialize(n)
}
