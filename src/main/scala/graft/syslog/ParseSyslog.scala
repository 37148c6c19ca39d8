package graft.syslog

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_syslog(line)` — general syslog parse as a Catalyst expression
  * (RFC 5424 with RFC 3164 fallback, reference src/parse.rs:21-60). Returns
  * the 5-field SyslogMessage struct, NULL for unparseable lines.
  */
case class ParseSyslog(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ParseSyslog.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_syslog"
  override protected def withNewChildInternal(newChild: Expression): ParseSyslog =
    copy(child = newChild)
  override protected def nullSafeEval(input: Any): Any =
    Syslog.parseLine(input.toString) match {
      case Some(m) =>
        InternalRow(
          UTF8String.fromString(m.msg),
          m.severity.map(UTF8String.fromString).orNull,
          m.facility.map(UTF8String.fromString).orNull,
          m.hostname.map(UTF8String.fromString).orNull,
          m.appname.map(UTF8String.fromString).orNull)
      case None => null
    }
}

object ParseSyslog {
  val schema: StructType = StructType(Seq(
    StructField("msg", StringType, nullable = false),
    StructField("severity", StringType),
    StructField("facility", StringType),
    StructField("hostname", StringType),
    StructField("appname", StringType)))

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("parse_syslog"),
    new ExpressionInfo(classOf[ParseSyslog].getName, "parse_syslog"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "parse_syslog(line) takes 1 argument")
      ParseSyslog(children.head)
    })
}
