package graft

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FEvt, FunnelState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel: per-user GroupState stage tracking must progress
  * across micro-batches and agree with the batch q_funnel acceptance rule
  * (a stage counts only strictly after the previous stage's minimum). */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("advance: strict ordering rule matches the batch funnel semantics") {
    val s0 = FunnelState(None, None, None)
    // click before any view is rejected; view then click then purchase land
    val s1 = FunnelStream.advance(s0, Seq(
      FEvt(1, "click", 3), FEvt(1, "view", 5), FEvt(1, "click", 7)))
    assert(s1 == FunnelState(Some(5), Some(7), None))
    // an earlier view arriving later lowers t_view but cannot resurrect
    // the pre-view click (cross-batch late-data contract)
    val s2 = FunnelStream.advance(s1, Seq(FEvt(1, "view", 1)))
    assert(s2 == FunnelState(Some(1), Some(7), None))
    // purchase must follow the established click
    val s3 = FunnelStream.advance(s2, Seq(FEvt(1, "purchase", 6)))
    assert(s3.t_purchase.isEmpty)
    val s4 = FunnelStream.advance(s2, Seq(FEvt(1, "purchase", 9)))
    assert(s4 == FunnelState(Some(1), Some(7), Some(9)))
  }

  test("stages progress across micro-batches; no-view users stay out") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FEvt]
    val q = FunnelStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_live")
      .outputMode("update").start()
    try {
      input.addData(FEvt(1, "view", 10), FEvt(1, "click", 20),
        FEvt(2, "click", 5))
      q.processAllAvailable()
      val b1 = spark.table("funnel_live").collect()
        .map(r => r.getLong(0) -> r.getLong(4)).toMap
      assert(b1 == Map(1L -> 2L), s"batch1 rows: $b1 (user 2 has no view)")
      input.addData(FEvt(1, "purchase", 30), FEvt(2, "view", 6))
      q.processAllAvailable()
      val b2 = spark.table("funnel_live").collect()
        .groupBy(_.getLong(0)).map { case (u, rs) =>
          u -> rs.map(_.getLong(4)).max }
      assert(b2 == Map(1L -> 3L, 2L -> 1L), s"after batch2: $b2")
    } finally q.stop()
  }
}
