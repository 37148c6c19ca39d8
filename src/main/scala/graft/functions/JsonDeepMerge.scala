package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deep JSON merge with the reference's exact lattice
  * (reference: src/merge.rs:67-86, imported there from json_value_merge):
  *
  *   - object ⊕ object: recursive, RHS wins on scalar conflict
  *   - array  ⊕ array : concatenate, then *consecutive* dedup (Rust
  *     `Vec::dedup` removes adjacent equal elements only)
  *   - array  ⊕ object: push object, then consecutive dedup
  *   - anything else  : RHS replaces LHS
  *
  * Inputs/outputs are JSON text. Behavior at the edges mirrors
  * src/connection.rs:310-335 (`perform_merge`):
  *   - unparseable LHS → NULL (the rule compiler maps this to "abort all
  *     remaining rules for this message")
  *   - non-object RHS fragment → LHS returned byte-for-byte unmerged
  *
  * Output is compact JSON with object keys sorted — the same observable
  * order as the reference, whose serde_json Map is a BTreeMap.
  */
object JsonMerge {
  private val mapper = new ObjectMapper()

  /** UTF8String entry point shared by interpreted eval and generated code
    * (the codegen emits a single static call to this — see
    * [[JsonDeepMerge.doGenCode]]). */
  def mergeUTF8(target: UTF8String, fragment: UTF8String): UTF8String = {
    val out = mergeStrings(target.toString, fragment.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** null result = LHS was not valid JSON (abort marker). */
  def mergeStrings(target: String, fragment: String): String = {
    val t = try mapper.readTree(target) catch { case _: Exception => return null }
    if (t == null) return null
    val f = try mapper.readTree(fragment) catch { case _: Exception => return target }
    if (f == null || !f.isObject) return target
    serialize(merge(t, f))
  }

  def merge(a: JsonNode, b: JsonNode): JsonNode = (a, b) match {
    case (ao: ObjectNode, bo: ObjectNode) =>
      val it = bo.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        val v = bo.get(k)
        val existing = ao.get(k)
        if (existing == null) ao.set(k, v.deepCopy[JsonNode]())
        else ao.set(k, merge(existing, v))
      }
      ao
    case (aa: ArrayNode, ba: ArrayNode) =>
      val it = ba.elements()
      while (it.hasNext) aa.add(it.next().deepCopy[JsonNode]())
      dedupConsecutive(aa)
    case (aa: ArrayNode, bo: ObjectNode) =>
      aa.add(bo.deepCopy[JsonNode]())
      dedupConsecutive(aa)
    case (_, other) => other.deepCopy[JsonNode]()
  }

  private def dedupConsecutive(a: ArrayNode): ArrayNode = {
    val out = mapper.createArrayNode()
    var prev: JsonNode = null
    val it = a.elements()
    while (it.hasNext) {
      val e = it.next()
      if (prev == null || !prev.equals(e)) out.add(e)
      prev = e
    }
    out
  }

  /** UTF8String entry point for the pointer-addressed variant. */
  def mergeInUTF8(target: UTF8String, pointer: UTF8String,
      fragment: UTF8String): UTF8String = {
    val out = mergeInStrings(target.toString, pointer.toString, fragment.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** Pointer-addressed merge (reference: src/merge.rs:88-133, `merge_in`):
    * navigate `pointer` (RFC 6901-style, serde lookup semantics: object →
    * key, array → index without leading zeros), creating missing path steps
    * on the way — a numeric step scaffolds `[null]`, any other step
    * `{step: null}`, merged in via the same lattice — then [[merge]] the
    * fragment at the target node. Pointer "/" (empty first step) merges at
    * the current level. Unlike [[mergeStrings]], the fragment may be ANY
    * JSON value — that is merge_in's documented surface (its own tests
    * merge arrays and scalars into pointed-at nodes).
    *
    * null result = LHS not valid JSON, or the pointer does not start with
    * '/' (the reference would panic on the latter; we surface the abort
    * marker instead). Unparseable fragment → LHS returned unmerged, the
    * same edge contract as [[mergeStrings]]. */
  def mergeInStrings(target: String, pointer: String, fragment: String): String = {
    val t = try mapper.readTree(target) catch { case _: Exception => return null }
    if (t == null) return null
    val f = try mapper.readTree(fragment) catch { case _: Exception => return target }
    if (f == null) return target
    val out = mergeIn(t, pointer, f)
    if (out == null) null else serialize(out)
  }

  def mergeIn(root: JsonNode, pointer: String, value: JsonNode): JsonNode = {
    if (!pointer.startsWith("/")) return null
    val fields = pointer.substring(1).split("/", -1).toList
    mergeInFields(root, fields, value)
  }

  /** RFC 6901 token unescape, applied by serde's pointer lookup in the
    * same step as the index rule: ~1 → '/', then ~0 → '~'. The reference's
    * CREATE branch inserts the RAW token as a key — which its own lookup
    * then never finds, a live-lock; we unescape consistently on both
    * sides (divergence documented). */
  private def unescape(tok: String): String =
    tok.replace("~1", "/").replace("~0", "~")

  private def mergeInFields(node: JsonNode, fields: List[String],
      value: JsonNode): JsonNode = {
    val first = unescape(fields.head)
    // empty step = "merge here" (pointer "/" at the top, "//…" mid-path —
    // the reference stops and merges at the current level, src/merge.rs:95)
    if (first.isEmpty) return merge(node, value)
    childAt(node, first) match {
      case Some(sub) =>
        val merged =
          if (fields.tail.nonEmpty) mergeInFields(sub, fields.tail, value)
          else merge(sub, value)
        // merge returns a replacement node for scalar/array results —
        // write it back into the parent slot
        if (merged ne sub) setChild(node, first, merged)
        node
      case None =>
        // create-missing-path (src/merge.rs:115-130): numeric step → [null],
        // other step → {step: null}, merged via the SAME lattice, then
        // retry. The reference retries unboundedly and can live-lock when
        // array dedup swallows the null scaffold (e.g. pointer /5 onto
        // [null]); we retry once, and the scaffold is trialled on a DEEP
        // COPY so a failed retry returns the node untouched — the edge
        // contract stays two-state (merged, or returned unmerged), never a
        // scaffold-only mutation with no fragment applied.
        val scaffold: JsonNode =
          if (first.nonEmpty && first.forall(_.isDigit)) {
            val a = mapper.createArrayNode(); a.addNull(); a
          } else {
            val o = mapper.createObjectNode(); o.putNull(first); o
          }
        val grown = merge(node.deepCopy[JsonNode](), scaffold)
        childAt(grown, first) match {
          case Some(_) => mergeInFields(grown, fields, value)
          case None => node
        }
    }
  }

  /** serde_json pointer-lookup semantics: objects match the literal key;
    * arrays index only with a canonical integer (no leading zeros). */
  private def childAt(node: JsonNode, field: String): Option[JsonNode] = node match {
    case o: ObjectNode => Option(o.get(field))
    case a: ArrayNode => serdeIndex(field).flatMap(i => Option(a.get(i)))
    case _ => None
  }

  private def serdeIndex(s: String): Option[Int] =
    if (s == "0") Some(0)
    else if (s.nonEmpty && s.length <= 9 && !s.startsWith("0") && s.forall(_.isDigit))
      Some(s.toInt)
    else None

  private def setChild(node: JsonNode, field: String, v: JsonNode): Unit = node match {
    case o: ObjectNode => o.set[JsonNode](field, v); ()
    case a: ArrayNode => serdeIndex(field).foreach(i => a.set(i, v))
    case _ => ()
  }

  /** Compact serialization, object keys recursively sorted. */
  def serialize(n: JsonNode): String = {
    val sb = new StringBuilder
    write(n, sb)
    sb.toString
  }

  private def write(n: JsonNode, sb: StringBuilder): Unit = {
    if (n.isObject) {
      sb.append('{')
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = n.fieldNames()
      while (it.hasNext) names += it.next()
      names.sorted.zipWithIndex.foreach { case (k, i) =>
        if (i > 0) sb.append(',')
        sb.append(quote(k)).append(':')
        write(n.get(k), sb)
      }
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      var i = 0
      val it = n.elements()
      while (it.hasNext) {
        if (i > 0) sb.append(',')
        write(it.next(), sb)
        i += 1
      }
      sb.append(']')
    } else if (n.isTextual) sb.append(quote(n.textValue()))
    else sb.append(n.toString) // numbers, booleans, null
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}

/** Catalyst expression wrapper: `json_deep_merge(target, fragment)`.
  * Full codegen: the generated code is one static call into
  * [[JsonMerge.mergeUTF8]] (the body is Jackson tree manipulation — nothing
  * to inline further), so the expression participates in whole-stage codegen
  * instead of forcing a CodegenFallback island that splits the cascade's
  * generated span.
  */
case class JsonDeepMerge(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_deep_merge"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonDeepMerge =
    copy(left = l, right = r)
  override protected def nullSafeEval(target: Any, fragment: Any): Any =
    JsonMerge.mergeUTF8(target.asInstanceOf[UTF8String], fragment.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f) => {
      val out = ctx.freshName("merged")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $out =
         |  graft.functions.JsonMerge.mergeUTF8($t, $f);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
}

object JsonDeepMerge {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("json_deep_merge"),
    new ExpressionInfo(classOf[JsonDeepMerge].getName, "json_deep_merge"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "json_deep_merge(target, fragment) takes 2 arguments")
      JsonDeepMerge(children.head, children(1))
    })
}

/** `json_merge_in(target, pointer, fragment)` — the reference merge trait's
  * pointer-addressed variant (src/merge.rs:88-133), with the same codegen
  * shape as [[JsonDeepMerge]]: one static call into [[JsonMerge]]. */
case class JsonMergeIn(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_merge_in"
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): JsonMergeIn = copy(first = f, second = s, third = t)
  override protected def nullSafeEval(target: Any, pointer: Any, fragment: Any): Any =
    JsonMerge.mergeInUTF8(target.asInstanceOf[UTF8String],
      pointer.asInstanceOf[UTF8String], fragment.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p, f) => {
      val out = ctx.freshName("merged")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $out =
         |  graft.functions.JsonMerge.mergeInUTF8($t, $p, $f);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
}

object JsonMergeIn {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("json_merge_in"),
    new ExpressionInfo(classOf[JsonMergeIn].getName, "json_merge_in"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "json_merge_in(target, pointer, fragment) takes 3 arguments")
      JsonMergeIn(children.head, children(1), children(2))
    })
}
