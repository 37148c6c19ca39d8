package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `ivf_assign(embedding, centroids)` — nearest-centroid (argmax cosine)
  * coarse-quantizer assignment as ONE tight codegen'd loop per row.
  *
  * `centroids` must be a foldable `array<array<double>>` literal (cell
  * position → components); it is flattened once at plan/codegen time —
  * centroid norms precomputed — and referenced from the generated code, so
  * assignment is a narrow k·d fused-multiply-add projection with NO join and
  * NO exchange. This replaces the crossJoin(broadcast reps) +
  * groupBy(vec_id).max_by argmax, whose hash exchange carried N full-width
  * embedding rows per index build — the difference between "assignment is a
  * scan" and "assignment reshuffles the corpus" when the corpus is 100 TB.
  *
  * Semantics (bit-equal to the plan it replaces, and to the DuckDB oracle
  * twins): sim(j) = dot(a, c_j) / (sqrt(dot(a, a)) * sqrt(dot(c_j, c_j))),
  * every accumulation sequential left-to-right in double precision (float
  * elements widen exactly); result = the 0-based position of the max sim,
  * FIRST max on ties (= lower cell when centroids are ordered by cell) —
  * the max_by(struct(sim, -cell)) ordering it replaces, including NaN
  * ranking LARGEST (Spark double ordering). NULL if the input array is
  * NULL, not exactly d elements (the dot_product length contract), or has
  * NULL elements.
  */
case class IvfAssign(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_assign"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfAssign =
    copy(left = l, right = r)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (embOk && cOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<double>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** (flat centroids in [j][i] order, per-centroid norms, k, d) — once. */
  @transient private lazy val ix: (Array[Double], Array[Double], Int, Int) = {
    val outer = right.eval().asInstanceOf[ArrayData]
    val k = outer.numElements()
    require(k > 0, s"$prettyName requires a non-empty centroid list")
    val d = outer.getArray(0).numElements()
    val flat = new Array[Double](k * d)
    val normC = new Array[Double](k)
    var j = 0
    while (j < k) {
      val inner = outer.getArray(j)
      require(inner.numElements() == d, s"$prettyName centroids must share one dimension")
      var acc = 0.0
      var i = 0
      while (i < d) {
        val v = inner.getDouble(i)
        flat(j * d + i) = v
        acc += v * v
        i += 1
      }
      normC(j) = math.sqrt(acc)
      j += 1
    }
    (flat, normC, k, d)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (flat, normC, k, d) = ix
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() != d) return null
    var i0 = 0
    while (i0 < d) {
      if (a.isNullAt(i0)) return null
      i0 += 1
    }
    val f = isFloat
    var naa = 0.0
    var i = 0
    while (i < d) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      naa += x * x
      i += 1
    }
    val na = math.sqrt(naa)
    var bestJ = -1
    var best = 0.0
    var j = 0
    while (j < k) {
      var dot = 0.0
      i = 0
      while (i < d) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * flat(j * d + i)
        i += 1
      }
      val sim = dot / (na * normC(j))
      if (bestJ < 0 || (sim.isNaN && !best.isNaN) || sim > best) {
        best = sim; bestJ = j
      }
      j += 1
    }
    bestJ
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, normC, k, d) = ix
    val cRef = ctx.addReferenceObj("ivfCentroids", flat, "double[]")
    val nRef = ctx.addReferenceObj("ivfNorms", normC, "double[]")
    def read(v: String, i: String): String =
      if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val naa = ctx.freshName("naa")
      val na = ctx.freshName("na")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val take = ctx.freshName("take")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k0 = ctx.freshName("k")
      s"""
         |if ($a.numElements() != $d) { ${ev.isNull} = true; }
         |for (int $k0 = 0; !${ev.isNull} && $k0 < $d; $k0++) {
         |  if ($a.isNullAt($k0)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  double $naa = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $naa += ${read(a, i)} * ${read(a, i)};
         |  }
         |  double $na = Math.sqrt($naa);
         |  int $bestJ = -1;
         |  double $best = 0.0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $dot += ${read(a, i)} * $cRef[$j * $d + $i];
         |    }
         |    double $sim = $dot / ($na * $nRef[$j]);
         |    boolean $take = $bestJ < 0;
         |    if (!$take) {
         |      // Spark double ordering: NaN ranks largest, first max wins
         |      if (Double.isNaN($sim)) { $take = !Double.isNaN($best); }
         |      else { $take = $sim > $best; }
         |    }
         |    if ($take) { $best = $sim; $bestJ = $j; }
         |  }
         |  ${ev.value} = $bestJ;
         |}
       """.stripMargin
    })
  }
}

object IvfAssign {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ivf_assign"),
    new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "ivf_assign(embedding, centroids) takes 2 arguments")
      IvfAssign(children.head, children(1))
    })
}
