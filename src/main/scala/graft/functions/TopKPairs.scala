package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs(id, score, k, asc)` — BOUNDED per-group top-k aggregate.
  *
  * This is the scalable replacement for the per-group
  * `Window.partitionBy(g).orderBy(score)` + `row_number <= k` idiom: a window
  * funnels EVERY row of a group into one task (parallelism = |groups|, shuffle
  * volume = all scored rows), while this aggregate runs as a partial/final
  * ObjectHashAggregate — each input partition reduces its rows to at most `k`
  * entries per group map-side, so the shuffle carries only
  * |groups|·partitions·k rows and no task ever holds more than O(k) state per
  * group. That is the plan shape that survives a 100× corpus scale-up.
  *
  * Ordering contract (bit-compatible with the window it replaces):
  * primary score ascending (`asc=true`, for distances) or descending
  * (`asc=false`, for similarities) via `java.lang.Double.compare` (NaN sorts
  * last exactly like Spark's sort), ties broken by lower id. NULL id/score
  * rows are skipped (the window idiom ranked them last; callers filter to
  * `rank <= k` with k < group size, so they never surfaced there either).
  *
  * Returns `array<struct<n_id long, score double>>` of the best `k` in rank
  * order — `posexplode` it to get (rank-1, pair) rows.
  */
case class TopKPairs(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    ascExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val asc: Boolean = ascExpr.eval().asInstanceOf[Boolean]

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr, ascExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable || !ascExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_pairs(id, score, k, asc): k and asc must be literals")
    else if (idExpr.dataType != LongType || scoreExpr.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (bigint, double) inputs, got " +
          s"${idExpr.dataType.sql} and ${scoreExpr.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "topk_pairs"

  /** true iff (s1,i1) ranks strictly before (s2,i2). */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c < 0 else c > 0 } else i1 < i2
  }

  private def sortedTopK(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    buf.sortWith((a, b) => beats(a._1, a._2, b._1, b._2)).take(k)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow)
      : ArrayBuffer[(Double, Long)] = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    if (id == null || sc == null) buf
    else {
      buf += ((sc.asInstanceOf[Double], id.asInstanceOf[Long]))
      // amortized trim keeps the buffer O(k) without a sort per row
      if (buf.length > 4 * k + 16) sortedTopK(buf) else buf
    }
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length > 4 * k + 16) sortedTopK(buf) else buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = sortedTopK(buf)
    new GenericArrayData(top.map(p => InternalRow(p._2, p._1): Any).toArray)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // trim BEFORE the shuffle: a partial result is never more than k pairs
    val top = sortedTopK(buf)
    val bb = ByteBuffer.allocate(4 + top.length * 16)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression])
      : TopKPairs =
    copy(idExpr = children(0), scoreExpr = children(1),
      kExpr = children(2), ascExpr = children(3))
}

object TopKPairs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_pairs"),
    new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
    (children: Seq[Expression]) => {
      require(children.length == 4, "topk_pairs(id, score, k, asc) takes 4 arguments")
      TopKPairs(children(0), children(1), children(2), children(3))
    })
}
