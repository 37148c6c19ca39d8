package graft

import graft.streaming.Scd2Stream
import graft.streaming.Scd2Stream.{CEvt, OpenVersion, Scd2Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD2 maintenance: per-entity GroupState holds only the open
  * version; the emitted history must equal the batch q_scd2_build rows
  * when changes arrive in order across batches. */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("advance closes versions in event-time order and flags the open row") {
    // advance expects time-sorted input (versions() sorts each batch)
    val (rows, open) = Scd2Stream.advance(None, 7L, Seq(
      CEvt(7, 2, "b", 20), CEvt(7, 1, "a", 10)).sortBy(e => (e.ts_us, e.event_id)))
    assert(rows == Seq(
      Scd2Row(7, 1, "a", 10, Some(20), is_current = false),
      Scd2Row(7, 2, "b", 20, None, is_current = true)))
    assert(open.contains(OpenVersion(2, "b", 20)))
    // next batch closes the carried-over open row
    val (rows2, _) = Scd2Stream.advance(open, 7L, Seq(CEvt(7, 3, "c", 30)))
    assert(rows2 == Seq(
      Scd2Row(7, 2, "b", 20, Some(30), is_current = false),
      Scd2Row(7, 3, "c", 30, None, is_current = true)))
  }

  test("streamed history equals the batch SCD2 build across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = graft.queries.Synth.eventsTs(spark, sf)
      .select("user_id", "event_id", "event_type", "ts_us").as[CEvt]
      .collect().sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[CEvt]
    val q = Scd2Stream.versions(input.toDS())
      .writeStream.format("memory").queryName("scd2_live")
      .outputMode("update").start()
    try {
      val (h1, h2) = all.splitAt(all.length / 2)
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      // LAST emission per (user, event) wins (closed beats current)
      val streamed = spark.table("scd2_live").collect().zipWithIndex
        .groupBy(r => (r._1.getLong(0), r._1.getLong(1)))
        .map { case (_, rs) => rs.maxBy(_._2)._1 }
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
        .toSet
      val batch = SparkEntry.queries("q_scd2_build")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
        .toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }
}
