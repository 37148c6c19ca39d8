package graft

import graft.queries.{CoreQueries, RelQueries, Synth}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-golden guard for the event time axis (round-6 regression: the driver
  * regenerated `events.ts` from TIMESTAMP(NANOS) to timestamp[us] and the
  * forced-long read silently compressed all event time 1000×). This spec
  * synthesizes an events table with LITERAL known timestamps in every parquet
  * encoding the driver has shipped and pins exact window counts / µs values,
  * so a future unit flip fails here instead of in the oracle run.
  */
class TimeUnitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 2024-01-01T00:00:00Z in µs since epoch. */
  private val BaseUs = 1704067200000000L
  private val Min = 60L * 1000000L

  // (event_id, ts_us, user_id, event_type, value)
  //   user 1: view → click → purchase, 10 min apart (funnel stage 3)
  //   user 2: two views 70 min apart (two sessions; second ts has a
  //           sub-second µs component to pin exact µs arithmetic)
  private val rows = Seq(
    (1L, BaseUs, 1L, "view", 1.0),
    (2L, BaseUs + 10 * Min, 1L, "click", 2.0),
    (3L, BaseUs + 20 * Min, 1L, "purchase", 3.0),
    (4L, BaseUs + 40 * Min, 2L, "view", 4.0),
    (5L, BaseUs + 110 * Min + 123456L, 2L, "view", 5.0))

  private def writeEvents(encoding: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tsunit-$encoding")
    dir.toFile.deleteOnExit()
    val df = spark.createDataFrame(rows.map { case (id, us, u, et, v) =>
        Row(id, us, u, et, v, "{}")
      }.asJava_(),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts_us", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    val withTs = encoding match {
      case "micros" => // timestamp[us], isAdjustedToUTC=true
        df.withColumn("ts", timestamp_micros(col("ts_us")))
      case "micros_ntz" => // timestamp[us] without tz — the driver's footer
        df.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      case "nanos_long" => // legacy TIMESTAMP(NANOS) read surface: raw long ns
        df.withColumn("ts", col("ts_us") * 1000L)
    }
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  // Seq → java List without importing scala/java converters at top level
  implicit private class SeqOps[T](s: Seq[T]) {
    def asJava_(): java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add)
      l
    }
  }

  private def tsUsMap(dir: String): Map[Long, Long] =
    Synth.eventsTs(spark, dir).select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val expectedUs = rows.map(r => r._1 -> r._2).toMap

  test("eventsTs yields exact µs for timestamp[us] (adjusted-UTC) parquet") {
    assert(tsUsMap(writeEvents("micros")) == expectedUs)
  }

  test("eventsTs yields exact µs for timestamp[us] NTZ parquet (driver footer)") {
    assert(tsUsMap(writeEvents("micros_ntz")) == expectedUs)
  }

  test("eventsTs yields exact µs for legacy raw-nanos long parquet") {
    assert(tsUsMap(writeEvents("nanos_long")) == expectedUs)
  }

  test("tumbling 15-min windows land in the literal expected buckets") {
    val dir = writeEvents("micros_ntz")
    val got = RelQueries.queries("q_tumbling_window")(spark, dir)
      .select("w_start_us", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      BaseUs -> 2L,                 // 00:00, 00:10
      BaseUs + 15 * Min -> 1L,      // 00:20
      BaseUs + 30 * Min -> 1L,      // 00:40
      BaseUs + 105 * Min -> 1L))    // 01:50
  }

  test("sessionize splits user 2 at the 70-min gap and keeps exact µs bounds") {
    val dir = writeEvents("micros_ntz")
    val got = RelQueries.queries("sessionize_events")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, BaseUs, BaseUs + 20 * Min),
      (2L, 1L, 1L, BaseUs + 40 * Min, BaseUs + 40 * Min),
      (2L, 2L, 1L, BaseUs + 110 * Min + 123456L, BaseUs + 110 * Min + 123456L)))
  }

  test("funnel reaches stage 3 for user 1 with literal µs stage times") {
    val dir = writeEvents("micros_ntz")
    val got = RelQueries.queries("q_funnel")(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, BaseUs, Some(BaseUs + 10 * Min), Some(BaseUs + 20 * Min), 3L),
      (2L, BaseUs + 40 * Min, None, None, 1L)))
  }

  test("range join finds the one click within the purchase's preceding hour") {
    val dir = writeEvents("micros_ntz")
    val got = RelQueries.queries("q_range_join_binned")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((3L, 1L)))
  }

  test("as-of join resolves the latest prior click through the shared ts_us") {
    val dir = writeEvents("micros_ntz")
    val got = RelQueries.queries("q_asof_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((3L, 2L)))
  }

  test("scalar surface formats the literal wall-clock second") {
    val dir = writeEvents("micros_ntz")
    val got = CoreQueries.queries("scalar_surface")(spark, dir)
      .select("event_id", "tstr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "2024-01-01 00:00:00")
    assert(got(5L) == "2024-01-01 01:50:00") // µs fraction truncates, hour survives
  }
}
