package graft

import graft.streaming.AttributionJoinStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: matches emit across micro-batch
  * boundaries (either side may arrive first), the time bound filters, and
  * the drained stream equals the batch interval join on the union.
  */
class AttributionJoinStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Base = 1700000000000000L
  private val Horizon = 600000000L // 10 min

  test("interval matches emit across batches; out-of-horizon pairs never join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)]
    val purchases = MemoryStream[(Long, Long, Long)]
    val joined = AttributionJoinStream.attribute(
      clicks.toDF().toDF("user_id", "click_id", "ts_us"),
      purchases.toDF().toDF("user_id", "purchase_id", "ts_us"),
      "0 seconds", Horizon)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attrib").start()
    try {
      // batch 1: a click, and a purchase for a DIFFERENT user
      clicks.addData((1L, 100L, Base))
      purchases.addData((2L, 900L, Base + 1000000L))
      q.processAllAvailable()
      // batch 2: user 1's purchase arrives later, within horizon → joins
      // with the click buffered in state; user 3's purchase PRECEDES its
      // click (wrong direction); user 4's purchase is past the horizon
      clicks.addData((3L, 300L, Base + 5000000L), (4L, 400L, Base))
      purchases.addData((1L, 901L, Base + 60000000L),
        (3L, 903L, Base + 1000000L), (4L, 904L, Base + Horizon + 1000000L))
      q.processAllAvailable()
      val out = spark.table("attrib")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(out === Set((1L, 100L, 901L, 60000000L)),
        s"only the within-horizon forward pair joins, got $out")

      // batch parity on the union of everything fed
      val bc = Seq((1L, 100L, Base), (3L, 300L, Base + 5000000L), (4L, 400L, Base))
        .toDF("user_id", "click_id", "ts_us")
      val bp = Seq((2L, 900L, Base + 1000000L), (1L, 901L, Base + 60000000L),
        (3L, 903L, Base + 1000000L), (4L, 904L, Base + Horizon + 1000000L))
        .toDF("user_id", "purchase_id", "ts_us")
      val batch = AttributionJoinStream.attribute(bc, bp, "0 seconds", Horizon)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(batch === out, "drained stream must equal the batch interval join")
    } finally q.stop()
  }

  test("native dropDuplicatesWithinWatermark dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val dedup = input.toDF().toDF("event_id", "ts_us")
      .withColumn("et", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
      .withWatermark("et", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("native_dedup").start()
    try {
      input.addData((1L, Base), (2L, Base + 1000000L), (1L, Base + 2000000L))
      q.processAllAvailable()
      input.addData((2L, Base + 3000000L), (3L, Base + 4000000L))
      q.processAllAvailable()
      val ids = spark.table("native_dedup").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids === Seq(1L, 2L, 3L),
        s"re-deliveries within the watermark horizon must collapse, got $ids")
    } finally q.stop()
  }
}
