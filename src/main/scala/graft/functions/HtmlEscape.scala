package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_escape(text)` — the handlebars default escape set
  * (`& < > " '` → entities, handlebars-rust v6 `html_escape`, the
  * function every `{{var}}` interpolation in the reference's replace
  * templates runs through, src/connection.rs:22-33) as ONE codegen'd
  * pass.
  *
  * The composed alternative (5 chained `replace(replace(...))` calls)
  * allocates five intermediate UTF8Strings per row per variable; this
  * expression scans the UTF-8 bytes once and — the dominant case for log
  * text — returns the INPUT object untouched when no escapable byte
  * exists (all five targets are single ASCII bytes, so the byte scan is
  * exact under UTF-8). The cascade family compiles every escaped
  * interpolation through this.
  */
case class HtmlEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_escape"
  override protected def withNewChildInternal(newChild: Expression): HtmlEscape =
    copy(child = newChild)
  override protected def nullSafeEval(input: Any): Any =
    HtmlEscape.escape(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEscape.escape($c)")
}

object HtmlEscape {
  /** Called from generated code — keep signature stable. */
  def escape(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var extra = 0
    while (i < bytes.length) {
      (bytes(i): @annotation.switch) match {
        case '&' => extra += 4 // &amp;
        case '<' | '>' => extra += 3 // &lt; &gt;
        case '"' | '\'' => extra += 5 // &quot; &#x27;
        case _ => ()
      }
      i += 1
    }
    if (extra == 0) return s // untouched fast path — zero allocation
    val out = new Array[Byte](bytes.length + extra)
    var o = 0
    def put(rep: String): Unit = {
      var k = 0
      while (k < rep.length) { out(o) = rep.charAt(k).toByte; o += 1; k += 1 }
    }
    i = 0
    while (i < bytes.length) {
      (bytes(i): @annotation.switch) match {
        case '&' => put("&amp;")
        case '<' => put("&lt;")
        case '>' => put("&gt;")
        case '"' => put("&quot;")
        case '\'' => put("&#x27;")
        case b => out(o) = b; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("html_escape"),
    new ExpressionInfo(classOf[HtmlEscape].getName, "html_escape"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "html_escape(text) takes 1 argument")
      HtmlEscape(children.head)
    })
}
