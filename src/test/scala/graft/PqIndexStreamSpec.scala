package graft

import graft.streaming.PqIndexStream
import graft.streaming.PqIndexStream.CodebookEpoch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming IVF/PQ index maintenance: the per-row projection must compute
  * the batch cell assignment + PQ codes, and the maintenance loop must
  * re-encode each micro-batch against the codebook epoch current AT THAT
  * MOMENT (index rotation without a stream restart).
  */
class PqIndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dim 4, m=2 sub-spaces of d=2, ksub=2 codewords each
  private val cbA: Array[Array[Array[Double]]] = Array(
    Array(Array(1.0, 0.0), Array(0.0, 1.0)),
    Array(Array(1.0, 0.0), Array(0.0, 1.0)))
  // epoch B swaps the codewords → every code flips
  private val cbB: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 1.0), Array(1.0, 0.0)),
    Array(Array(0.0, 1.0), Array(1.0, 0.0)))
  private val reps = Seq(
    0 -> Seq(1.0, 0.0, 0.0, 0.0),
    1 -> Seq(0.0, 0.0, 0.0, 1.0))

  test("encode: nearest-rep cell (first-max tie to lower) + pq codes") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),   // cell 0; subvecs (1,0),(0,0)→codes 0,0
      (11L, Array(0f, 1f, 0f, 1f)),   // cell 1; subvecs (0,1),(0,1)→codes 1,1
      (12L, Array(1f, 1f, 1f, 1f)))   // cosine ties across reps → lower cell 0
      .toDF("vec_id", "embedding")
    val out = PqIndexStream.encode(vecs, CodebookEpoch(1L, reps, cbA))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2), r.getLong(3))))
      .toMap
    assert(out(10L) == ((0, Seq(0, 0), 1L)))
    assert(out(11L) == ((1, Seq(1, 1), 1L)))
    assert(out(12L)._1 == 0, "cosine tie must break to the lower cell")
    // (0,0) subvector is equidistant from both codewords → first-min code 0
    assert(out(10L)._2 == Seq(0, 0))
  }

  test("maintain: each micro-batch encodes against the epoch current at that moment") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    @volatile var epoch = CodebookEpoch(1L, reps, cbA)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Seq[Int], Long)]
    val q = PqIndexStream.maintain(vecs, () => epoch) { df =>
      got.synchronized {
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getLong(3)))
      }
    }
    try {
      input.addData((10L, Array(1f, 0f, 0f, 0f)))
      q.processAllAvailable()
      // rotate the codebook — NO stream restart
      epoch = CodebookEpoch(2L, reps, cbB)
      input.addData((20L, Array(1f, 0f, 0f, 0f)))
      q.processAllAvailable()
      val byId = got.synchronized(got.groupBy(_._1))
      assert(byId(10L).head == ((10L, 0, Seq(0, 0), 1L)))
      // same vector, new epoch: sub-space 0's codewords swapped → its code
      // flips to 1; sub-space 1's (0,0) is equidistant again → first-min 0
      assert(byId(20L).head == ((20L, 0, Seq(1, 0), 2L)))
    } finally q.stop()
  }
}
