package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text)` — the document's winnowing fingerprint set
  * (Schleimer/Wilkerson/Aiken, w = 4 over 5-token grams), fully codegen'd.
  *
  * Bit-for-bit the shifted-array zip_with chain it replaces
  * ([[graft.streaming.WinnowingStream.fingerprintHits]]'s former body,
  * itself pinned to the batch `text_winnowing` oracle): tokens =
  * split(text, '\\s+'); gram hash = 40-bit md5 hex prefix of the
  * space-joined 5-gram; packed = h·2²⁰ + (2²⁰−1−pos) (rightmost-min
  * tie-break); fingerprints = distinct window-of-4 minima, ≫ 20, in
  * first-occurrence order. NULL for docs under 8 tokens (no full
  * window), matching the size filter.
  *
  * Same rationale as [[MinhashSig]]: higher-order functions are
  * CodegenFallback, and the interpreted per-lambda eval dominated the
  * streaming replay's wall time (ReplayProbe receipts, PLANS.md r13).
  */
case class WinnowFps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
  override protected def nullSafeEval(text: Any): Any =
    WinnowFps.fps(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val out = ctx.freshName("wfps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.WinnowFps.fps($t);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
}

object WinnowFps {
  /** Called from generated code — keep signature stable. Null for docs
    * under 8 tokens (fewer than w + k − 1 = 8 ⇒ no full 4-window). */
  def fps(text: UTF8String): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < 8) return null
    val m = toks.length - 4 // number of full 5-grams
    val packed = new Array[Long](m)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2)).append(' ').append(toks(i + 3)).append(' ')
        .append(toks(i + 4))
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // 40-bit hash = first 10 hex nibbles of the digest
      var h = 0L
      var k = 0
      while (k < 10) { h = (h << 4) | nibble(d, k); k += 1 }
      // pos is 1-based in the chain this replaces
      packed(i) = h * 1048576L + (1048575L - (i + 1))
      i += 1
    }
    // distinct window-of-4 minima in first-occurrence order
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i + 3 < m) {
      var mn = packed(i)
      var j = i + 1
      while (j <= i + 3) { if (packed(j) < mn) mn = packed(j); j += 1 }
      seen.add(java.lang.Long.valueOf(mn >>> 20)): Unit
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Nibble `idx` of the digest's hex form (hi nibble first). */
  private def nibble(d: Array[Byte], idx: Int): Long = {
    val b = d(idx >> 1) & 0xff
    (if ((idx & 1) == 0) b >> 4 else b & 0xf).toLong
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "winnow_fps(text) takes 1 argument")
      WinnowFps(children.head)
    })
}
