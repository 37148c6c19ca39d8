package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Evt, SessionState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Gap = 30L * 60 * 1000000L // 30 min in µs
  // keep clear of epoch 0: the initial watermark is 0 and drops rows at/below it
  private def us(sec: Long): Long = (1000000000L + sec) * 1000000L

  private def evt(u: Long, t: Long) =
    Evt(u, t, new java.sql.Timestamp(t / 1000))

  test("advance: gap splits sessions, within-gap extends") {
    val (open, closed) = Sessionize.advance(None,
      Seq(evt(1, us(0)), evt(1, us(10)), evt(1, us(10 + 1801)), evt(1, us(10 + 1810))), Gap)
    assert(closed == Seq(SessionState(us(0), us(10), 2)))
    assert(open.contains(SessionState(us(1811), us(1820), 2)))
  }

  test("advance: resumes an open session across batches") {
    val (open, closed) = Sessionize.advance(
      Some(SessionState(us(0), us(5), 3)), Seq(evt(1, us(20))), Gap)
    assert(closed.isEmpty)
    assert(open.contains(SessionState(us(0), us(20), 4)))
  }

  test("streaming sessions: gap-close inline, watermark-timeout close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .withColumn("et", timestamp_micros(col("ts_us")))
      .withWatermark("et", "0 seconds")
      .as[Evt]
    val q = Sessionize.sessions(events, Gap).writeStream
      .outputMode("append").format("memory").queryName("sess").start()
    try {
      // batch 1: user 1 two events (one session); user 2 one event
      input.addData((1L, us(0)), (1L, us(10)), (2L, us(5)))
      q.processAllAvailable()
      // batch 2: user 1 far-future event — closes user 1's first session
      // inline AND advances the watermark past user 2's end + gap
      input.addData((1L, us(7200)))
      q.processAllAvailable()
      // batch 3: any data so the timed-out state for user 2 is swept
      input.addData((3L, us(7300)))
      q.processAllAvailable()
      val out = spark.table("sess")
        .as[Sessionize.Session].collect().map(s => (s.user_id, s.start_us, s.end_us, s.n_events))
      assert(out.contains((1L, us(0), us(10), 2L)), s"got ${out.toSeq}")
      assert(out.contains((2L, us(5), us(5), 1L)), s"got ${out.toSeq}")
    } finally q.stop()
  }
}
