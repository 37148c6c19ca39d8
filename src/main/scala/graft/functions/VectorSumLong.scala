package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `vector_sum_long(array<bigint>)` — element-wise sum of long vectors as a
  * partial/final aggregate.
  *
  * The distributed-moment primitive: second-moment (Gram) matrices,
  * histograms, per-dimension tallies — anything of the form Σ f(row) with a
  * fixed-width integer vector f — reduces map-side to ONE vector per
  * partition, so the shuffle carries |groups|·partitions rows regardless of
  * corpus size. Integer addition is associative-commutative with no
  * rounding, so the result is EXACTLY reproducible under any partitioning
  * (the float version of this would be order-dependent — that is why graft
  * quantizes before aggregating, see [[graft.ext.Embeddings]]).
  *
  * NULL input vectors are skipped; all non-null inputs must share one
  * length (enforced — a width mismatch is a data bug worth failing loudly
  * on, not averaging over). Empty groups return NULL. Overflow wraps (Spark
  * `sum` semantics under ANSI-off); size inputs so |values| · rows stays
  * inside 2^63.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum_long requires array<bigint>, got ${other.sql}")
    }

  override def prettyName: String = "vector_sum_long"

  // null = no input seen yet (distinguishes an empty group from a sum of
  // zero-length vectors)
  override def createAggregationBuffer(): Array[Long] = null

  private def addInto(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (buf == null) v
    else {
      require(buf.length == v.length,
        s"vector_sum_long: width mismatch ${buf.length} vs ${v.length}")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) buf
    else addInto(buf,
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray())
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buf else addInto(buf, other)

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = if (buf == null) -1 else buf.length
    val bb = ByteBuffer.allocate(4 + math.max(0, n) * 8)
    bb.putInt(n)
    if (n > 0) buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) null
    else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = bb.getLong; i += 1 }
      out
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression])
      : VectorSumLong =
    copy(child = children(0))
}

object VectorSumLong {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_sum_long"),
    new ExpressionInfo(classOf[VectorSumLong].getName, "vector_sum_long"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "vector_sum_long(vec) takes 1 argument")
      VectorSumLong(children(0))
    })
}
