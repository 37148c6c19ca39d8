package graft

import graft.streaming.MomentsStream
import graft.streaming.MomentsStream.{MEvt, MomentState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming per-key moments: the decimal-exact (n, Σv, Σv²) state must
  * reproduce the batch q_anomaly_zscore statistics BIT-FOR-BIT under any
  * batch split — the mergeable-moments guarantee. */
class MomentsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("advance is merge-order-independent and matches the decimal cast") {
    val vs = Seq(1.25, -2.0000005, 3.9999994, 0.1)
    val whole = MomentsStream.advance(MomentState(0, 0, 0), vs)
    val split = MomentsStream.advance(
      MomentsStream.advance(MomentState(0, 0, 0), vs.take(2)), vs.drop(2))
    assert(whole == split)
    // HALF_UP at scale 6 on the shortest decimal repr (the batch cast)
    assert(MomentsStream.quant(-2.0000005) == BigDecimal("-2.000001") ||
      MomentsStream.quant(-2.0000005) == BigDecimal("-2.000000"))
    assert(MomentsStream.quant(1.25) == BigDecimal("1.250000"))
  }

  test("streamed moments equal the batch stats bit-for-bit; z-scores match") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = graft.queries.Synth.events(spark, sf)
      .select(col("event_type"), col("value")).as[MEvt].collect()
    val input = MemoryStream[MEvt]
    val q = MomentsStream.moments(input.toDS())
      .writeStream.format("memory").queryName("moments_live")
      .outputMode("update").start()
    try {
      val (h1, h2) = all.splitAt(all.length / 3)
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      val streamed = spark.table("moments_live").collect().zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rs) =>
          val r = rs.maxBy(_._2)._1
          k -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
        }
      val batch = graft.queries.Synth.events(spark, sf)
        .groupBy("event_type")
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"),
          sum((col("value") * col("value")).cast("decimal(18,6)")).cast("double").as("sv2"),
          count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val (sv, sv2, n) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
          val mean = sv / n
          r.getString(0) -> ((n, mean, math.sqrt(sv2 / n - mean * mean)))
        }.toMap
      assert(streamed == batch,
        s"diff=${streamed.toSet.diff(batch.toSet).take(2)} vs ${batch.toSet.diff(streamed.toSet).take(2)}")
      // and the z-score helper reproduces the batch key's flagged values
      val m = streamed.map { case (k, (n, mean, std)) =>
        k -> graft.streaming.MomentsStream.MomentRow(k, n, mean, std) }
      val flagged = all.filter(e => math.abs(MomentsStream.zscore(e.value, m(e.event_type))) > 2.0)
      val batchFlagged = SparkEntry.queries("q_anomaly_zscore")(spark, sf).collect()
      assert(flagged.length == batchFlagged.length)
    } finally q.stop()
  }
}
