package graft

import graft.streaming.TransitionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition extraction must match the batch Markov key's
  * counts when batches respect per-user event-time order, with state
  * carrying the last event across micro-batches.
  */
class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed transition counts equal the batch window-lead counts " +
    "across scrambled micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real events, first 200 by (ts, id), split into 3 arbitrary-size
    // micro-batches in global ts order (per-user order follows)
    val ev = graft.queries.Synth.eventsTs(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .orderBy("ts_us", "event_id").limit(200)
      .as[TransitionStream.Ev].collect().toSeq
    val input = MemoryStream[TransitionStream.Ev]
    val q = TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      Seq(ev.slice(0, 67), ev.slice(67, 150), ev.slice(150, 200)).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("trans")
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      val batch = ev.toDF()
        .withColumn("dst", lead("event_type", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts_us", "event_id")))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("first event per user emits nothing; state links across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TransitionStream.Ev]
    val q = TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans2")
      .outputMode("append").start()
    try {
      input.addData(TransitionStream.Ev(1L, 10L, 1L, "a"))
      q.processAllAvailable()
      assert(spark.table("trans2").isEmpty)
      input.addData(TransitionStream.Ev(1L, 20L, 2L, "b"))
      q.processAllAvailable()
      val got = spark.table("trans2").as[TransitionStream.Trans].collect()
      assert(got.toSeq === Seq(TransitionStream.Trans(1L, "a", "b", 20L)))
    } finally q.stop()
  }
}
