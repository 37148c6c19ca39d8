package graft

import graft.streaming.OhlcStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming OHLC: bars must emit when the watermark passes the window end,
  * open/close must follow (ts, id) order across micro-batch boundaries
  * (arrival order ≠ event-time order), and a drained stream must equal the
  * batch aggregation over the union of all batches.
  */
class OhlcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Base = 1699999200000000L // µs, 15-min-aligned window start

  test("bars close on watermark; open/close by event time across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "event_id", "ts_us", "value")
    val q = OhlcStream.bars(events, "15 minutes", "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("ohlc_stream").start()
    try {
      // batch 1 delivers the LATER event first; batch 2 back-fills an
      // earlier event of the same window (allowed: watermark still 0)
      input.addData((1L, 2L, Base + 60000000L, 9.0))
      q.processAllAvailable()
      input.addData((1L, 1L, Base + 1000000L, 2.0), (1L, 3L, Base + 120000000L, 4.0))
      q.processAllAvailable()
      // far-future event advances the watermark and closes the window
      input.addData((9L, 99L, Base + 86400000000L, 1.0))
      q.processAllAvailable()
      val out = spark.table("ohlc_stream")
        .as[(Long, Long, Double, Double, Double, Double, Long)].collect().toSet
      val bucket = Base / 900000000L * 900000000L
      assert(out.contains((1L, bucket, 2.0, 9.0, 2.0, 4.0, 3L)),
        s"open must be the event-time-earliest (2.0), close the latest (4.0); got $out")

      // drained stream == batch aggregation over the union of all batches
      val batch = OhlcStream.bars(
        Seq((1L, 2L, Base + 60000000L, 9.0), (1L, 1L, Base + 1000000L, 2.0),
          (1L, 3L, Base + 120000000L, 4.0), (9L, 99L, Base + 86400000000L, 1.0))
          .toDF("user_id", "event_id", "ts_us", "value"),
        "15 minutes", "0 seconds")
        .as[(Long, Long, Double, Double, Double, Double, Long)].collect().toSet
      val emitted = out.filter(_._1 == 1L)
      assert(batch.filter(_._1 == 1L) === emitted, "stream must equal batch on closed windows")
    } finally q.stop()
  }
}
