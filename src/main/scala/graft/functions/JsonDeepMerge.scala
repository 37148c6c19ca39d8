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
