package graft

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets

import graft.metrics.{Observe, StatsdEmitter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` → statsd bridge: metrics computed inside the running
  * plan land as hotdog.observe.* counters with no second scan.
  */
class ObserveMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observed long metrics emit as counters on query success") {
    import spark.implicits._
    val receiver = new DatagramSocket(0)
    receiver.setSoTimeout(10000)
    val emitter = new StatsdEmitter("127.0.0.1", receiver.getLocalPort)
    val listener = Observe.attach(spark, emitter)
    try {
      Seq(1L, 2L, 3L, 4L).toDF("v")
        .observe("batch_stats", count(lit(1)).as("rows"),
          sum(when(col("v") % 2 === 0, 1L).otherwise(0L)).as("even_rows"))
        .filter(col("v") > 0)
        .write.format("noop").mode("overwrite").save()
      def recv(): String = {
        val p = new DatagramPacket(new Array[Byte](512), 512)
        receiver.receive(p)
        new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
      }
      // listener callbacks are async — collect until both counters land
      val got = scala.collection.mutable.Set.empty[String]
      while (got.size < 2) got += recv()
      assert(got == Set("hotdog.observe.batch_stats.rows:4|c",
        "hotdog.observe.batch_stats.even_rows:2|c"), s"got $got")
    } finally {
      Observe.detach(spark, listener)
      emitter.close(); receiver.close()
    }
  }
}
