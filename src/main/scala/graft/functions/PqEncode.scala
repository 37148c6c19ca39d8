package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `pq_encode(embedding, codebook)` — product-quantization encoder as ONE
  * tight codegen'd loop per row.
  *
  * `codebook` must be a foldable `array<array<array<double>>>` literal
  * (sub-space → codeword → components); it is flattened once at plan/codegen
  * time and referenced from the generated code, so encoding a vector costs
  * m·ksub·d fused multiply-adds with no per-row allocation beyond the m-int
  * result — the shape that makes PQ encoding of a 100 TB corpus a pure
  * CPU-bound scan. The equivalent built-in-expression tree (m·ksub separate
  * d²-sum expressions + array_min/array_position) evaluates the same math
  * but as thousands of expression nodes per row — measured ~20× slower at
  * sf0.1.
  *
  * Semantics (bit-equal to the DuckDB oracle twin in ExtQueries."ann_pq"):
  * per sub-space s, code = the FIRST j minimizing the left-to-right
  * accumulated squared L2 distance between the s-th subvector and codeword
  * j (strict `<` = first-min tie-break; doubles accumulate sequentially).
  * NULL if the input array is NULL, shorter than m·d, or has NULL elements.
  */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    })
    if (embOk && cbOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** (flat codebook in [s][j][i] order, m, ksub, d) — evaluated once. */
  @transient private lazy val cb: (Array[Double], Int, Int, Int) =
    PqCodebook.flatten(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (flat, m, ksub, d) = cb
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() < m * d) return null
    var i0 = 0
    while (i0 < m * d) {
      if (a.isNullAt(i0)) return null
      i0 += 1
    }
    val f = isFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.MaxValue
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var i = 0
        while (i < d) {
          val x = if (f) a.getFloat(s * d + i).toDouble else a.getDouble(s * d + i)
          val diff = x - flat(((s * ksub) + j) * d + i)
          acc += diff * diff
          i += 1
        }
        if (acc < best) { best = acc; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, m, ksub, d) = cb
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    def read(v: String, i: String): String =
      if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val diff = ctx.freshName("diff")
      val k0 = ctx.freshName("k")
      s"""
         |if ($a.numElements() < ${m * d}) { ${ev.isNull} = true; }
         |for (int $k0 = 0; !${ev.isNull} && $k0 < ${m * d}; $k0++) {
         |  if ($a.isNullAt($k0)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $best = Double.MAX_VALUE;
         |    int $bestJ = 0;
         |    for (int $j = 0; $j < $ksub; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $d; $i++) {
         |        double $diff = ${read(a, s"$s * $d + $i")}
         |          - $cbRef[(($s * $ksub) + $j) * $d + $i];
         |        $acc += $diff * $diff;
         |      }
         |      if ($acc < $best) { $best = $acc; $bestJ = $j; }
         |    }
         |    $codes[$s] = $bestJ;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }
}

object PqEncode {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_encode"),
    new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "pq_encode(embedding, codebook) takes 2 arguments")
      PqEncode(children.head, children(1))
    })
}

/** `pq_lut(embedding, codebook)` — the query-side ADC lookup table as ONE
  * loop: lut[s][j] = left-to-right-accumulated squared L2 distance between
  * the s-th subvector and codeword j. Same codebook contract and fold
  * order as [[PqEncode]]. Building this as built-in expressions (m·ksub
  * separate d²-sum trees) costs seconds of optimizer/codegen time on a
  * ~2000-node plan; here it is m·ksub·d fused ops behind one expression
  * node.
  */
case class PqLut(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqLut =
    copy(left = l, right = r)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    })
    if (embOk && cbOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cb: (Array[Double], Int, Int, Int) =
    PqCodebook.flatten(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (flat, m, ksub, d) = cb
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() < m * d) return null
    var i0 = 0
    while (i0 < m * d) {
      if (a.isNullAt(i0)) return null
      i0 += 1
    }
    val f = isFloat
    val out = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val row = new Array[Double](ksub)
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var i = 0
        while (i < d) {
          val x = if (f) a.getFloat(s * d + i).toDouble else a.getDouble(s * d + i)
          val diff = x - flat(((s * ksub) + j) * d + i)
          acc += diff * diff
          i += 1
        }
        row(j) = acc
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, m, ksub, d) = cb
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    def read(v: String, i: String): String =
      if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val k0 = ctx.freshName("k")
      s"""
         |if ($a.numElements() < ${m * d}) { ${ev.isNull} = true; }
         |for (int $k0 = 0; !${ev.isNull} && $k0 < ${m * d}; $k0++) {
         |  if ($a.isNullAt($k0)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  Object[] $out = new Object[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double[] $row = new double[$ksub];
         |    for (int $j = 0; $j < $ksub; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $d; $i++) {
         |        double $diff = ${read(a, s"$s * $d + $i")}
         |          - $cbRef[(($s * $ksub) + $j) * $d + $i];
         |        $acc += $diff * $diff;
         |      }
         |      $row[$j] = $acc;
         |    }
         |    $out[$s] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }
}

object PqLut {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_lut"),
    new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "pq_lut(embedding, codebook) takes 2 arguments")
      PqLut(children.head, children(1))
    })
}

/** Shared codebook-literal flattening for [[PqEncode]]/[[PqLut]]. */
private[functions] object PqCodebook {
  def flatten(right: Expression): (Array[Double], Int, Int, Int) = {
    val outer = right.eval().asInstanceOf[ArrayData]
    val m = outer.numElements()
    val mid0 = outer.getArray(0)
    val ksub = mid0.numElements()
    val d = mid0.getArray(0).numElements()
    val flat = new Array[Double](m * ksub * d)
    var s = 0
    while (s < m) {
      val mid = outer.getArray(s)
      var j = 0
      while (j < ksub) {
        val inner = mid.getArray(j)
        var i = 0
        while (i < d) {
          flat(((s * ksub) + j) * d + i) = inner.getDouble(i)
          i += 1
        }
        j += 1
      }
      s += 1
    }
    (flat, m, ksub, d)
  }
}
