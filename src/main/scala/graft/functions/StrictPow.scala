package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `strict_pow(x, y)` — `java.lang.StrictMath.pow`, i.e. the fdlibm
  * algorithm the JVM spec pins BIT-FOR-BIT on every platform and in every
  * compilation tier.
  *
  * Why not the built-in `pow`: `Math.pow` is only specified to 1 ulp and
  * HotSpot legitimately returns DIFFERENT last bits for the same inputs
  * depending on code path (C2 intrinsic vs interpreter) — measured in this
  * repo as 5/120 one-ulp mismatches between a codegen'd `pow` column and
  * the same `math.pow` call on the driver. Any operator whose contract is
  * "stream state byte-equals the batch column" (the A-ES weighted
  * reservoir) must therefore route BOTH sides through StrictMath, which
  * trades a few ns per call for reproducibility — the right trade anywhere
  * a result is persisted, compared, or resumed across heterogeneous
  * executors.
  */
case class StrictPow(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "strict_pow"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrictPow =
    copy(left = l, right = r)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    StrictMath.pow(l.asInstanceOf[Double], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.StrictMath.pow($a, $b)")
}

object StrictPow {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("strict_pow"),
    new ExpressionInfo(classOf[StrictPow].getName, "strict_pow"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "strict_pow(x, y) takes 2 arguments")
      StrictPow(children.head, children(1))
    })
}
