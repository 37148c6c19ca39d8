package graft.functions

import graft.jmespath.JmesPath
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jmespath_query(json, path)` / `jmespath_value(json, path)` — full
  * JMESPath over a JSON text column (evaluator: [[graft.jmespath.JmesPath]]).
  *
  * The path must be a plan-time constant; it is compiled ONCE per expression
  * instance, mirroring the reference's startup precompilation
  * (src/connection.rs:290-307) — a syntax error surfaces at analysis time,
  * not per row. Codegen is a single static-shaped call on a referenced
  * object, so the expression stays inside whole-stage codegen.
  *
  * Result semantics (reference: src/rules.rs:74-94):
  *   - NULL when the input is not valid JSON, the result is null, or the
  *     search hits a runtime error (invalid function types/arity) — all the
  *     cases the reference treats as "rule does not match";
  *   - `jmespath_query`: otherwise the canonical compact serialization of
  *     the result (sorted object keys, graft's engine-wide JSON form);
  *   - `jmespath_value`: the raw string when the result IS a string, else
  *     NULL — exactly the binding rule for the `value` variable
  *     (src/rules.rs:80-88: only string results bind).
  */
case class JmesPathEval(left: Expression, right: Expression, stringOnly: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (stringOnly) "jmespath_value" else "jmespath_query"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JmesPathEval =
    copy(left = l, right = r)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ${left.dataType.sql}, ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName path must be a constant")
    else try {
      JmesPath.compile(String.valueOf(right.eval()))
      TypeCheckResult.TypeCheckSuccess
    } catch {
      case e: JmesPath.JmesPathParseException =>
        TypeCheckResult.TypeCheckFailure(s"invalid JMESPath: ${e.getMessage}")
    }
  }

  @transient private lazy val compiled = JmesPath.compile(String.valueOf(right.eval()))

  /** Shared by interpreted eval and generated code. */
  def searchUTF8(json: UTF8String): UTF8String = {
    if (json == null) return null
    try {
      compiled.searchText(json.toString) match {
        case Some(r) if !r.isNull && !r.isMissingNode =>
          if (stringOnly) {
            if (r.isTextual) UTF8String.fromString(r.textValue()) else null
          } else UTF8String.fromString(JmesPath.serialize(r))
        case _ => null
      }
    } catch {
      case _: JmesPath.JmesPathRuntimeException => null
    }
  }

  override protected def nullSafeEval(json: Any, path: Any): Any =
    searchUTF8(json.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jmesEval", this, classOf[JmesPathEval].getName)
    nullSafeCodeGen(ctx, ev, (j, _) => {
      val out = ctx.freshName("jmesOut")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $out = $ref.searchUTF8($j);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }
}

object JmesPathEval {
  private def descriptor(name: String, stringOnly: Boolean)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[JmesPathEval].getName, name),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$name(json, path) takes 2 arguments")
      JmesPathEval(children.head, children(1), stringOnly)
    })

  val queryDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptor("jmespath_query", stringOnly = false)
  val valueDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptor("jmespath_value", stringOnly = true)
}

/** `jmespath_qv(json, path)` — ONE parse + search returning
  * `struct<q string, v string>`: `q` = [[JmesPathEval]]'s `jmespath_query`
  * result (non-null ⇔ rule matches), `v` = its `jmespath_value` string
  * binding. The rule compiler reads both fields off this single expression,
  * so the two GetStructField refs share one deterministic subtree and
  * whole-stage codegen's subexpression elimination evaluates the document
  * search ONCE per rule per row — the separate query/value expressions it
  * replaces parsed and searched the document twice. */
case class JmesPathQV(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("q", StringType, nullable = true),
    StructField("v", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "jmespath_qv"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JmesPathQV =
    copy(left = l, right = r)

  override def checkInputDataTypes(): TypeCheckResult =
    JmesPathEval(left, right, stringOnly = false).checkInputDataTypes()

  @transient private lazy val compiled = JmesPath.compile(String.valueOf(right.eval()))

  /** Shared by interpreted eval and generated code. */
  def searchRow(json: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    if (json == null) return null
    val r =
      try compiled.searchText(json.toString)
      catch { case _: JmesPath.JmesPathRuntimeException => None }
    r match {
      case Some(n) if !n.isNull && !n.isMissingNode =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(JmesPath.serialize(n)),
          if (n.isTextual) UTF8String.fromString(n.textValue()) else null)
      case _ =>
        org.apache.spark.sql.catalyst.InternalRow(null, null)
    }
  }

  override protected def nullSafeEval(json: Any, path: Any): Any =
    searchRow(json.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jmesQv", this, classOf[JmesPathQV].getName)
    nullSafeCodeGen(ctx, ev, (j, _) => {
      val out = ctx.freshName("jmesQvOut")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out = $ref.searchRow($j);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }
}

object JmesPathQV {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jmespath_qv"),
    new ExpressionInfo(classOf[JmesPathQV].getName, "jmespath_qv"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "jmespath_qv(json, path) takes 2 arguments")
      JmesPathQV(children.head, children(1))
    })
}
