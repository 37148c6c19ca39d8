package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `poly_hash16(token)` — 16-bit polynomial rolling hash
  * (fold acc*31 + codepoint mod 2^16), fully codegen'd.
  *
  * Bit-for-bit equal to the built-in-functions form it replaces
  * (`aggregate(transform(sequence(1, length(t)), i -> ascii(substr(t,i,1))),
  * 0, (a,c) -> (a*31+c)%65536)`, cross-checked in tests): iteration is by
  * codepoint, matching substr/ascii character semantics. The DuckDB oracle
  * twin is the identical integer fold (ExtQueries `dedup_simhash`).
  */
case class PolyHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash16"
  override protected def withNewChildInternal(newChild: Expression): PolyHash16 =
    copy(child = newChild)
  override protected def nullSafeEval(input: Any): Any =
    PolyHash16.hash16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash16.hash16($c)")
}

object PolyHash16 {
  /** Called from generated code — keep signature stable. */
  def hash16(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 65536
      i += Character.charCount(cp)
    }
    acc
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash16"),
    new ExpressionInfo(classOf[PolyHash16].getName, "poly_hash16"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "poly_hash16(token) takes 1 argument")
      PolyHash16(children.head)
    })
}
