package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(text, n)` — the n-component Kirsch–Mitzenmacher MinHash
  * signature over a document's 3-shingles, fully codegen'd.
  *
  * Bit-for-bit equal to the built-in-functions chain it replaces
  * (tokens = split(text, '\\s+'); 3-shingles via concat_ws(' ', ...);
  * ONE md5 per shingle split into two 60-bit hex halves h1 = hex[0,15),
  * h2 = hex[16,31) mod p = 1e9+7; component i = min over shingles of
  * (h1 + i·h2) mod p — the chain `TextAnalysis.minhashSignatureRows`
  * aggregates and `NearDupStream.bucketHits` computed row-locally with
  * transform/zip_with HOFs, cross-checked in `ExtSpec`). Returns NULL for
  * docs under 3 tokens (no shingles), matching the HOF chain's
  * array_min([]) = null.
  *
  * Why an Expression: Spark's higher-order functions are CodegenFallback —
  * each lambda application is an interpreted Expression.eval with boxed
  * closures, which made the row-local signature the dominant cost of the
  * streaming near-dup path (measured 10 ms/doc interpreted vs ~0.05 ms/doc
  * through the batch explode+agg codegen path; ReplayProbe receipts in
  * PLANS.md round-13). This is the SURVEY §"custom operators" (b) tier:
  * a scalar Expression with doGenCode, shared by streaming and batch.
  */
case class MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinhashSig = copy(left = newLeft, right = newRight)
  override protected def nullSafeEval(text: Any, n: Any): Any =
    MinhashSig.sig(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val out = ctx.freshName("mhsig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.MinhashSig.sig($t, $n);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
}

object MinhashSig {
  private val P = 1000000007L

  /** Called from generated code — keep signature stable. Null (no
    * shingles) for docs under 3 whitespace tokens. */
  def sig(text: UTF8String, n: Int): ArrayData = {
    // Java String.split("\\s+") semantics exactly (Spark's split builtin):
    // leading empty token kept when the text starts with whitespace
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < 3) return null
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hex[0,15) and hex[16,31): 60-bit halves of the 32-char hex form.
      // hex char 2k/2k+1 = byte k's hi/lo nibble; assemble nibbles 0..14
      // and 16..30 directly — no hex-string materialization
      var h1 = 0L; var h2 = 0L
      var k = 0
      while (k < 15) {
        h1 = (h1 << 4) | nibble(d, k)
        h2 = (h2 << 4) | nibble(d, k + 16)
        k += 1
      }
      h1 %= P; h2 %= P
      var j = 0
      var v = h1 // (h1 + j*h2) built incrementally, stays < 33*P << 2^63
      while (j < n) {
        val m = v % P
        if (m < mins(j)) mins(j) = m
        v += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Nibble `idx` of the digest's hex form (hi nibble first). */
  private def nibble(d: Array[Byte], idx: Int): Long = {
    val b = d(idx >> 1) & 0xff
    (if ((idx & 1) == 0) b >> 4 else b & 0xf).toLong
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "minhash_sig(text, n) takes 2 arguments")
      MinhashSig(children.head, children(1))
    })
}
