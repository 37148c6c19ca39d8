package graft

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.tools.EmbeddedKafka.LoopbackBroker
import graft.queries.Synth
import graft.sources.SyslogSocketSource
import graft.tools.Daemon
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._
import scala.util.Try

/** The daemon→Kafka composition (r10 verdict residual #3): the reference's
  * PRIMARY operating mode is syslog server → cascade → Kafka producer
  * (src/serve/mod.rs:81-117 picks the sink, src/sink/kafka.rs:107-198
  * delivers)
  * — DaemonSpec exhibits the parquet alternative; this drives the same
  * continuous assembly into the raw-wire Kafka client against the loopback
  * broker, on the ProcessingTime cadence, then drains cleanly.
  */
class DaemonKafkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def generatedLine(i: Int): String =
    s"""<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - """ +
      s"""{"meta":{"topic":"test"},"i":$i}"""

  test("daemon: TCP source -> cascade -> Kafka wire sink on ProcessingTime; " +
    "dynamic topics land on the broker; drain is clean") {
    val out = Files.createTempDirectory("graft-daemon-kafka").toString
    val broker = new LoopbackBroker()
    val n = 40
    val h = Daemon.start(spark, Synth.HotdogConfig, out,
      sourceName = "daemon-kafka-spec", listenPort = 0, statusPort = 0,
      triggerMs = 200L, kafkaBootstrap = Some(broker.broker))
    try {
      val deadline = System.currentTimeMillis() + 30000
      var port = SyslogSocketSource.boundPort("daemon-kafka-spec")
      while (port.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); port = SyslogSocketSource.boundPort("daemon-kafka-spec")
      }
      assert(port.nonEmpty, "daemon source never bound its listen port")

      val sock = new Socket("127.0.0.1", port.get)
      val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      (0 until n).foreach(i => w.write(generatedLine(i) + "\n"))
      w.flush(); sock.close()

      // no manual trigger: the ProcessingTime cadence must deliver on its
      // own — that's the operating-mode claim
      while (broker.received.size < n &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      // duplicate-delivery window: poll until the received count is STABLE
      // across two consecutive trigger-interval reads (a fixed sleep could
      // both miss a GC-delayed replayed micro-batch and flake on a slow
      // legitimate one)
      var stable = 0
      var lastN = broker.received.size
      while (stable < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200L)
        val nowN = broker.received.size
        if (nowN == lastN) stable += 1 else { stable = 0; lastN = nowN }
      }
      val got = broker.received.asScala.toVector
      assert(got.size == n, s"expected $n produced records, got ${got.size}")
      // dynamic routing: every record landed on the meta.topic destination
      assert(got.forall(_._1 == "test"), s"unexpected topics: ${got.map(_._1).distinct}")
      // payloads are the cascade's rendered values, one per generated line
      val is = got.map(_._2).flatMap(
        "\"i\":(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).sorted
      assert(is == (0 until n).toVector,
        s"payload counters mangled: ${is.take(10)}...")

      h.drainAndStop()
      assert(!h.query.isActive, "query still active after drain")
      h.drainAndStop() // idempotent
    } finally {
      Try(h.drainAndStop())
      broker.close()
    }
  }
}
