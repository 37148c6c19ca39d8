package graft

import graft.streaming.SemDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SemDeDup: row-local cluster assignment must equal the batch
  * `ivf_assign` projection, and the stateful admission stage must reject
  * arrivals that near-duplicate an ACCEPTED member across micro-batches.
  */
class SemDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))

  test("assign matches the batch ivf_assign cell for every vector") {
    val vs = Seq(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)), (2L, Seq(0.1, 0.9, 0.0, 0.0)),
      (3L, Seq(0.5, 0.5, 0.1, 0.0)), (4L, Seq(0.0, 0.0, 1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val streaming = SemDedupStream.assign(vs, cents)
      .collect().map(a => a.vec_id -> a.cluster.toLong).toMap
    val batch = graft.ext.Similarity.assignCells(vs, cents)
      .select("vec_id", "ivf_cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streaming == batch, s"$streaming vs $batch")
  }

  test("admission across micro-batches: dup rejected, retention cap evicts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    val dec = SemDedupStream.decisions(
      SemDedupStream.assign(vecs, cents), threshold = 0.995, maxPerCluster = 1)
    val q = dec.writeStream.format("memory").queryName("semdedup")
      .outputMode("append").start()
    def decisions() = spark.table("semdedup").as[SemDedupStream.Decision]
      .collect().map(d => d.vec_id -> ((d.kept, d.dup_of))).toMap
    try {
      // batch 1: two distinct vectors seed their clusters
      input.addData((1L, Seq(0.9, 0.1, 0.0, 0.0)), (2L, Seq(0.1, 0.9, 0.0, 0.0)))
      q.processAllAvailable()
      assert(decisions() == Map(1L -> ((true, -1L)), 2L -> ((true, -1L))))
      // batch 2: an exact copy of 1 → rejected against the accepted member;
      // a same-cluster-but-distant vector → accepted (and, at cap 1,
      // evicts 1 oldest-first)
      input.addData((3L, Seq(0.9, 0.1, 0.0, 0.0)), (4L, Seq(0.7, 0.0, 0.7, 0.0)))
      q.processAllAvailable()
      val d2 = decisions()
      assert(d2(3L) == ((false, 1L)), s"3 must be a dup of 1: ${d2(3L)}")
      assert(d2(4L) == ((true, -1L)), s"4 is distant (cos~0.70): ${d2(4L)}")
      // batch 3: a copy of 1 AFTER 1 was evicted by the cap → admitted
      // (dedup spans only the retained window — the documented trade)
      input.addData((5L, Seq(0.9, 0.1, 0.0, 0.0)))
      q.processAllAvailable()
      assert(decisions()(5L) == ((true, -1L)),
        "post-eviction copy is outside the retention window")
    } finally q.stop()
  }
}
