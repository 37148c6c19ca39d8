package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode NFC (canonical composition)
  * normalization, fully codegen'd. Spark has no Unicode-normalization
  * builtin, yet corpus curation needs one early in the pipeline: the same
  * visible text arrives both precomposed (é = U+00E9) and decomposed
  * (e + U+0301) from different crawls, and every downstream content hash,
  * shingle, and dedup key treats those byte sequences as different
  * documents unless normalization runs first.
  *
  * Backed by `java.text.Normalizer` (the JDK's ICU-derived NFC — the same
  * canonical composition tables DuckDB's `nfc_normalize` implements, so
  * the oracle twin is exact). ASCII-only strings short-circuit via
  * `Normalizer.isNormalized`, which fast-paths Latin-1, so the common case
  * costs one scan and zero allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")
}

object NfcNormalize {
  /** Called from generated code — keep signature stable. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "nfc_normalize(text) takes 1 argument")
      NfcNormalize(children.head)
    })
}
