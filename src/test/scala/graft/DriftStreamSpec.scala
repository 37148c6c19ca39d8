package graft

import graft.streaming.DriftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cluster moments: bounded additive state across micro-batches,
  * batch == stream parity for the maintained sums.
  */
class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated 4-dim centroids
  private val cents = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 0.0, 0.0, 1.0))

  private val batch1 = Seq(
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // cluster 0
    (2L, Seq(0.1f, 0.0f, 0.1f, 0.95f))) // cluster 1
  private val batch2 = Seq(
    (3L, Seq(0.8f, 0.2f, 0.0f, 0.1f)),   // cluster 0 again
    (4L, Seq(0.85f, 0.0f, 0.0f, 0.05f))) // cluster 0

  private def toDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("moments accumulate across micro-batches and equal the batch sums") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = DriftStream.moments(
        DriftStream.assigned(input.toDF().toDF("vec_id", "embedding"), cents))
      .writeStream.format("memory").queryName("driftm")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val updates = spark.table("driftm").as[DriftStream.ClusterMoments].collect()
      val finalM = updates.zipWithIndex.groupBy(_._1.cluster)
        .map { case (_, v) => v.maxBy(_._2)._1 }.toSeq

      // batch twin on the union: same row-local projection, plain agg
      val expected = DriftStream.assigned(toDf(batch1 ++ batch2), cents)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          call_function("vector_sum_long", col("q")).as("s"))
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      assert(finalM.size == expected.size)
      finalM.foreach { m =>
        val (n, s) = expected(m.cluster)
        assert(m.n == n && m.s == s, s"cluster ${m.cluster}")
      }
      // cluster 0 saw three vectors, cluster 1 one — state is K entries
      assert(finalM.map(m => m.cluster -> m.n).toMap == Map(0L -> 3L, 1L -> 1L))
    } finally q.stop()
  }

  test("transition merges additively; untouched clusters emit nothing") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[(Long, Seq[Long])](
      Optional.of((2L, Seq(10L, 20L))), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out = DriftStream.transition(0L,
      Iterator(DriftStream.Assigned(0L, Seq(1L, 2L)),
        DriftStream.Assigned(0L, Seq(3L, 4L))), st).toSeq
    assert(out == Seq(DriftStream.ClusterMoments(0L, 4L, Seq(14L, 26L))))
    assert(DriftStream.transition(0L, Iterator.empty, st).isEmpty)
  }
}
