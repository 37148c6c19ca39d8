package graft

import graft.streaming.CmsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Count-Min sketch: bounded cell state across micro-batches,
  * batch == stream sketch parity, point-query correctness.
  */
class CmsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val batch1 = Seq(
    1L -> "apple apple banana cherry",
    2L -> "apple durian elder fig")
  private val batch2 = Seq(
    3L -> "apple banana banana grape",
    4L -> "fig grape honey iris")

  private def finalCells(updates: Seq[CmsStream.Cell]): Map[Long, Long] =
    updates.zipWithIndex.groupBy(_._1.cell)
      .map { case (c, v) => c -> v.maxBy(_._2)._1.count }

  test("cells converge to the batch sketch; point query bounds exact count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CmsStream.cells(
        CmsStream.cellHits(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("cmscells")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = finalCells(
        spark.table("cmscells").as[CmsStream.Cell].collect().toSeq)

      // batch twin over the union corpus: plain groupBy-count of the same
      // row-local cell projection
      val expected = CmsStream.cellHits(
          (batch1 ++ batch2).toDF("doc_id", "text"))
        .groupBy("cell").agg(sum("inc").as("count"))
        .as[CmsStream.Cell].collect()
        .map(c => c.cell -> c.count).toMap
      assert(got == expected)

      // state is bounded by construction: cells live in [0, d·w)
      assert(got.keys.forall(c => c >= 0 && c < 4 * 64))

      // CMS guarantee: estimate ≥ exact, and with this tiny vocabulary the
      // planted heavy token is exact (5 apples across both batches)
      val est = CmsStream.estimate(got, "apple")
      assert(est >= 4L, s"apple arrived 4 times, estimate $est must be ≥")
      val estAbsent = CmsStream.estimate(got, "zucchini")
      assert(estAbsent >= 0L && est >= estAbsent)
    } finally q.stop()
  }

  test("transition accumulates across batches and emits only touched cells") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[Long](
      Optional.of(10L), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out = CmsStream.transition(5L,
      Iterator(CmsStream.CellHit(5L, 1L), CmsStream.CellHit(5L, 1L)), st).toSeq
    assert(out == Seq(CmsStream.Cell(5L, 12L)) && st.get == 12L)
    assert(CmsStream.transition(5L, Iterator.empty, st).isEmpty)
  }

  test("estimate hashing matches the batch sketch's KM family") {
    // the stream point-query and the batch cell projection must agree on
    // where a token lands — derive apple's cells both ways
    val cells = CmsStream.cellHits(Seq(1L -> "apple").toDF("doc_id", "text"))
      .collect().map(_.cell).sorted
    val viaEstimatePath = {
      val counts = cells.map(_ -> 7L).toMap
      CmsStream.estimate(counts, "apple")
    }
    assert(cells.length == 4)
    assert(viaEstimatePath == 7L,
      "estimate must find all 4 planted cells (same hash family)")
  }
}
