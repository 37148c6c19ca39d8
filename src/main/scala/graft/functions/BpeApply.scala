package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(word, merges)` — apply a learned BPE merge table to one word
  * as ONE tight loop per row.
  *
  * `merges` must be a foldable `array<array<string>>` literal (merge rank →
  * [p1, p2], in learned order); it is materialized once at plan/codegen time
  * and referenced from the generated code. Applying a 32k-entry merge table
  * is then O(merges · |word symbols|) string comparisons per DISTINCT word —
  * the shape that keeps BPE token counting a narrow projection over the
  * vocabulary at any corpus size. The equivalent built-in-expression chain
  * (one nested `aggregate` higher-order function per merge) computes the
  * same fold but adds a plan level per merge: fine at 8 merges, a
  * janino/optimizer cliff at a production merge count.
  *
  * Semantics (bit-equal to [[graft.ext.BpeTrainer.foldMerge]] and the
  * DuckDB recursive-CTE oracle twin in ExtQueries."text_bpe_train"):
  *   - the word splits into Unicode code points (Spark `substr` / DuckDB
  *     `substr` character semantics);
  *   - each merge rewrites left-to-right, greedy, non-overlapping:
  *     [a, a, a] under (a, a) becomes [aa, a];
  *   - merges apply in table order, each over the full symbol array.
  * Empty word → empty array. NULL word → NULL.
  */
case class BpeApply(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bpe_apply"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeApply =
    copy(left = l, right = r)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val wOk = left.dataType == StringType
    val mOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => true
      case _ => false
    })
    if (wOk && mOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable array<array<string>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** merges as a JVM array, evaluated once per plan. */
  @transient private lazy val merges: Array[Array[String]] = {
    val outer = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      val pair = outer.getArray(i)
      require(pair.numElements() == 2, s"$prettyName merge entries must be [p1, p2]")
      Array(pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BpeApply.applyMerges(l.asInstanceOf[UTF8String].toString, merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.BpeApply.applyMerges($w.toString(), $mRef);")
  }
}

object BpeApply {
  /** Split into code points, then run each greedy-leftmost merge pass. */
  def applyMerges(w: String, merges: Array[Array[String]]): GenericArrayData = {
    var syms = splitCodePoints(w)
    var mi = 0
    while (mi < merges.length) {
      syms = mergePass(syms, merges(mi)(0), merges(mi)(1))
      mi += 1
    }
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  private def splitCodePoints(w: String): Array[String] = {
    val buf = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      buf += w.substring(i, i + n)
      i += n
    }
    buf.toArray
  }

  /** One greedy left-to-right non-overlapping (p1, p2) merge pass. */
  def mergePass(s: Array[String], p1: String, p2: String): Array[String] = {
    // cheap pre-scan: most vocabulary words don't contain a given pair
    var hit = false
    var i = 0
    while (!hit && i + 1 < s.length) {
      if (s(i) == p1 && s(i + 1) == p2) hit = true
      i += 1
    }
    if (!hit) return s
    val out = new ArrayBuffer[String](s.length)
    i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == p1 && s(i + 1) == p2) {
        out += p1 + p2
        i += 2
      } else {
        out += s(i)
        i += 1
      }
    }
    out.toArray
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_apply"),
    new ExpressionInfo(classOf[BpeApply].getName, "bpe_apply"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "bpe_apply(word, merges) takes 2 arguments")
      BpeApply(children.head, children(1))
    })
}
