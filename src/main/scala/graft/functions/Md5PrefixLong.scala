package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix_long(str, start, len)` — the hex digits [start, start+len)
  * (1-based, as SQL `substring`) of md5(str)'s 32-char hex form, read as a
  * base-16 long. Bit-for-bit equal to the built-in chain it replaces:
  *
  *   conv(substring(md5(str), start, len), 16, 10).cast("long")
  *
  * which materializes the full 32-char hex string, a substring copy, a
  * DECIMAL-STRING rendering (conv returns base-10 text), and a string→long
  * cast — four allocations plus two parses per call, on the per-token hot
  * path of every md5-keyed sketch (CMS/HLL/KMV/minhash banding/bucketing).
  * Here: one digest, nibbles assembled straight into the long. Requires
  * len ≤ 15 (≤ 60 bits — every call site; conv would overflow past 16
  * anyway). start/len must be foldable, matching the literal call sites.
  *
  * Same SURVEY §"custom operators" (b) tier as [[MinhashSig]]: scalar
  * Expression with doGenCode so whole-stage codegen keeps the loop tight.
  */
case class Md5PrefixLong(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (first.dataType != StringType || second.dataType != IntegerType ||
        third.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_long(str, start, len) requires (string, int, int), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
    else if (!second.foldable || !third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "md5_prefix_long(str, start, len): start and len must be literals")
    else {
      val s = second.eval().asInstanceOf[Int]
      val l = third.eval().asInstanceOf[Int]
      if (s < 1 || l < 1 || s + l > 33 || l > 15)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix_long: need 1 ≤ start, 1 ≤ len ≤ 15, start+len ≤ 33 " +
            s"(got start=$s len=$l)")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Md5PrefixLong =
    copy(first = newFirst, second = newSecond, third = newThird)

  override protected def nullSafeEval(str: Any, start: Any, len: Any): Any =
    Md5PrefixLong.prefixLong(str.asInstanceOf[UTF8String],
      start.asInstanceOf[Int], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, st, ln) => {
      s"${ev.value} = graft.functions.Md5PrefixLong.prefixLong($s, $st, $ln);"
    })
}

object Md5PrefixLong {
  // one digest instance per task thread — getInstance is a provider lookup
  // + allocation, far too heavy for a per-token call (digest() leaves the
  // instance reset, so reuse is safe)
  private val mdTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — keep signature stable. Named so the
    * static forwarder exists: a companion method named `eval` clashes
    * with Expression.eval and Scala then emits NO forwarder, which made
    * the generated call unresolvable and silently dropped whole stages
    * to interpreted mode. */
  def prefixLong(str: UTF8String, start: Int, len: Int): Long = {
    val d = mdTl.get().digest(str.getBytes)
    var v = 0L
    var k = start - 1
    val end = start - 1 + len
    while (k < end) {
      val b = d(k >> 1) & 0xff
      v = (v << 4) | (if ((k & 1) == 0) b >> 4 else b & 0xf)
      k += 1
    }
    v
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_prefix_long"),
    new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "md5_prefix_long(str, start, len) takes 3 arguments")
      Md5PrefixLong(children.head, children(1), children(2))
    })
}
