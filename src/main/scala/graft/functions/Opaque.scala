package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer cannot see through.
  *
  * Why it exists: an expensive `when(cond, struct(…))` value gets torn apart
  * by SimplifyExtractValueOps — every `x.field` reference is rewritten to a
  * copy of the full conditional, so a rule-cascade result (which embeds
  * regexes and json_deep_merge) is re-evaluated once per referencing field.
  * Wrapping the struct in Opaque leaves field access as a cheap
  * GetStructField, and CollapseProject's cost check then keeps the single
  * evaluation in its own projection. Codegen is passed through unchanged, so
  * this costs nothing at runtime.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opaque"
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
}

object Opaque {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("opaque"),
    new ExpressionInfo(classOf[Opaque].getName, "opaque"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "opaque(expr) takes 1 argument")
      Opaque(children.head)
    })
}
