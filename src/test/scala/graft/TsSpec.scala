package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-series asserts for the time-series keys: EWMA fold order and
  * α=1/2 semantics, OHLC selection under in-bucket reordering, cohort
  * week arithmetic. Runs the real query functions against a parquet
  * fixture shaped like the driver's events table.
  */
class TsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  // (event_id, ts µs, user, type, value, props) — deliberately OUT of time
  // order in the file so ordering must come from the sort, not the scan.
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ts-spec").toString
    val base = 1700000000000000L // µs
    Seq(
      (3L, base + 2000000L, 1L, "view", 8.0, "{}"),
      (1L, base, 1L, "view", 2.0, "{}"),
      (2L, base + 1000000L, 1L, "view", 4.0, "{}"),
      // user 2: single event → ewma = value; own bucket
      (4L, base + 86400000000L * 21, 2L, "click", 5.5, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }
  private def col(n: String) = org.apache.spark.sql.functions.col(n)
  private def expr(e: String) = org.apache.spark.sql.functions.expr(e)

  test("ewma folds left in (ts, id) order with alpha = 1/2") {
    val r = SparkEntry.queries("q_ewma")(s, dir)
      .as[(Long, Int, Double)].collect()
      .map { case (u, n, e) => (u, (n, e)) }.toMap
    // user 1: ((2/2 + 4/2)/2 + 8/2) = 5.5 ; user 2: single → 5.5
    assert(r(1L) === ((3, 5.5)) && r(2L) === ((1, 5.5)))
  }

  test("ohlc open/close select by (ts, id), high/low by value") {
    val r = SparkEntry.queries("q_ohlc_bars")(s, dir)
      .select("user_id", "open", "high", "low", "close", "volume")
      .as[(Long, Double, Double, Double, Double, Long)].collect()
      .groupBy(_._1)
    // user 1's three events land in one 15-min bucket: open=2 (earliest ts),
    // close=8 (latest), high=8, low=2 — even though the file order is 8,2,4
    assert(r(1L).toSeq === Seq((1L, 2.0, 8.0, 2.0, 8.0, 3L)))
    assert(r(2L).toSeq === Seq((2L, 5.5, 5.5, 5.5, 5.5, 1L)))
  }

  test("retention cohorts: week-0 always counts every user") {
    val r = SparkEntry.queries("q_retention_cohorts")(s, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // both users are week-0 of their own cohort; user 2's single event
    // 21 days after base lands in a different cohort week
    assert(r.map(_._3).sum === 2L && r.forall(_._2 === 0L))
  }
}
