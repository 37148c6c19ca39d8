package graft

import graft.streaming.NativeSessionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native session_window streaming aggregation: sessions must emit when
  * the watermark passes their close and equal the batch q_session_window
  * boundary semantics (gap ≥ timeout splits). */
class NativeSessionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val GapUs = 30L * 60 * 1000000L
  private def us(sec: Long): Long = (1000000000L + sec) * 1000000L

  test("native session windows close on watermark and match batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .withColumn("et", timestamp_micros(col("ts_us")))
    val q = NativeSessionStream.sessions(events, "30 minutes", "0 seconds", GapUs)
      .writeStream.outputMode("append").format("memory")
      .queryName("native_sess").start()
    try {
      // user 1: two events 10 s apart (one session), then a far-future
      // event that closes it; user 2: one event, closed by the same
      // watermark advance; exact-gap boundary: user 3's two events exactly
      // 30 min apart MERGE (only a strictly-larger gap splits)
      input.addData((1L, us(0)), (1L, us(10)), (2L, us(5)),
        (3L, us(0)), (3L, us(1800)))
      q.processAllAvailable()
      input.addData((1L, us(7200)))
      q.processAllAvailable()
      input.addData((9L, us(100000)))
      q.processAllAvailable()
      val out = spark.table("native_sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(out.contains((1L, us(0), us(10), 2L)), s"got $out")
      assert(out.contains((2L, us(5), us(5), 1L)), s"got $out")
      assert(out.contains((3L, us(0), us(1800), 2L)),
        s"exact-gap events must merge into one session, got $out")
    } finally q.stop()
  }
}
