package graft

import graft.streaming.ZscoreStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming rolling z-score: flags must match the batch key bit-for-bit
  * on the union of batches (in-order arrival), warm-up windows stay
  * silent, and state is bounded at the window size.
  */
class ZscoreStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Base = 1700000000000000L
  // 15 calm readings, then an outlier, then calm again (ids give order)
  private val events: Seq[(String, Long, Long, Double)] =
    (1 to 15).map(i => ("view", i.toLong, Base + i * 1000000L, 10.0 + (i % 3) * 0.5)) ++
      Seq(("view", 16L, Base + 16000000L, 999.0),
        ("view", 17L, Base + 17000000L, 10.5))

  test("stream flags equal the batch rolling z-score on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val q = ZscoreStream.flag(
        input.toDF().toDF("event_type", "event_id", "ts_us", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("zscore_stream").start()
    try {
      val (b1, b2) = events.splitAt(12)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("zscore_stream")
        .as[ZscoreStream.Flagged].collect().toSet

      // batch twin: the exact q_rolling_zscore computation on the union
      val dir = java.nio.file.Files.createTempDirectory("graft-zscore").toString
      events.toDF("event_type", "event_id", "ts_us", "value")
        .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
          lit(1L).as("user_id"), col("event_type"), col("value"),
          lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("q_rolling_zscore")(spark, dir)
        .select(col("event_type"), col("event_id"), col("value"), col("z"))
        .as[ZscoreStream.Flagged].collect().toSet
      assert(streamed === batch, s"stream $streamed vs batch $batch")
      assert(streamed.map(_.event_id) === Set(16L),
        "exactly the planted outlier is flagged; warm-up rows stay silent")
      val z16 = streamed.head.z
      assert(z16 > ZscoreStream.Threshold, s"outlier z must exceed threshold: $z16")
    } finally q.stop()
  }
}
