package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs_distinct(id, score, k, asc)` — [[TopKPairs]] with EXACT
  * duplicate-pair elimination folded into the aggregate.
  *
  * Equivalent by construction to `distinct`-then-`topk_pairs` over
  * (group, id, score) rows, without the distinct's extra Exchange: the
  * candidate generators that feed it (nnDescent's shared-neighbor pair
  * emission) produce the same (id, score) pair once per shared neighbor,
  * and the score is a pure function of the pair, so copies are bit-equal
  * and removing them inside the aggregate is exactly the pre-shuffle
  * `.distinct()` it replaces (guide §2.3/§2.4 — aggregate before you
  * shuffle; don't pay an exchange to dedup what a bounded buffer can).
  *
  * Every trim point dedups BEFORE taking k (a plain take(k) over a
  * buffer holding duplicates could evict a unique pair that belongs in
  * the distinct top-k); a duplicate arriving after its twin was evicted
  * ranks strictly worse than the kept k-th element, so it can never
  * re-enter — the result is independent of arrival order, like the
  * distinct-then-topk form.
  *
  * Ordering contract identical to [[TopKPairs]]: score asc/desc via
  * `java.lang.Double.compare`, ties broken by lower id; NULL inputs
  * skipped. Returns `array<struct<n_id long, score double>>` in rank
  * order.
  */
case class TopKPairsDistinct(
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
        "topk_pairs_distinct(id, score, k, asc): k and asc must be literals")
    else if (idExpr.dataType != LongType || scoreExpr.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pairs_distinct requires (bigint, double) inputs, got " +
          s"${idExpr.dataType.sql} and ${scoreExpr.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "topk_pairs_distinct"

  /** true iff (s1,i1) ranks strictly before (s2,i2). */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c < 0 else c > 0 } else i1 < i2
  }

  /** Sort, drop exact duplicates (adjacent after the sort: equal score
    * bits AND equal id sort together), take k. */
  private def sortedTopKDistinct(buf: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    val sorted = buf.sortWith((a, b) => beats(a._1, a._2, b._1, b._2))
    val out = new ArrayBuffer[(Double, Long)](math.min(k, sorted.length))
    var i = 0
    while (i < sorted.length && out.length < k) {
      val p = sorted(i)
      if (out.isEmpty || out.last._2 != p._2 ||
          java.lang.Double.compare(out.last._1, p._1) != 0) out += p
      i += 1
    }
    out
  }

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
      if (buf.length > 4 * k + 16) sortedTopKDistinct(buf) else buf
    }
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length > 4 * k + 16) sortedTopKDistinct(buf) else buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = sortedTopKDistinct(buf)
    new GenericArrayData(top.map(p => InternalRow(p._2, p._1): Any).toArray)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // trim BEFORE the shuffle: a partial result is never more than k pairs
    val top = sortedTopKDistinct(buf)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression])
      : TopKPairsDistinct =
    copy(idExpr = children(0), scoreExpr = children(1),
      kExpr = children(2), ascExpr = children(3))
}

object TopKPairsDistinct {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_pairs_distinct"),
    new ExpressionInfo(classOf[TopKPairsDistinct].getName, "topk_pairs_distinct"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "topk_pairs_distinct(id, score, k, asc) takes 4 arguments")
      TopKPairsDistinct(children(0), children(1), children(2), children(3))
    })
}
