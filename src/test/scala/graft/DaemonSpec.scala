package graft

import java.io.OutputStreamWriter
import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.cert.X509Certificate
import javax.net.ssl.{SSLContext, X509TrustManager}

import graft.queries.Synth
import graft.sources.SyslogSocketSource
import graft.tools.Daemon
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Try

/** The continuous-daemon exhibit (r9 verdict #4): the reference's actual
  * operating mode — TLS syslog server source → cascade → routed parquet on
  * a ProcessingTime trigger, with the status server and statsd live — run
  * in-process, fed by a generator mirroring
  * reference/scripts/generate-stdout.rb:15-21, then drained cleanly.
  */
class DaemonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tlsRes(f: String): String =
    getClass.getResource(s"/tls/$f").getPath

  /** generate-stdout.rb's exact line shape: RFC 5424, JSON msg carrying
    * `meta.topic` (dynamic routing) and a counter. */
  private def generatedLine(i: Int): String =
    s"""<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler - - - """ +
      s"""{"meta":{"topic":"test"},"i":$i}"""

  test("daemon: TLS source -> cascade -> routed parquet on ProcessingTime; " +
    "/stats advances; statsd emits; SIGTERM-style drain is clean") {
    val out = Files.createTempDirectory("graft-daemon-out").toString
    val statsdRx = new DatagramSocket(0)
    statsdRx.setSoTimeout(30000)
    val n = 40
    val h = Daemon.start(spark, Synth.HotdogConfig, out,
      sourceName = "daemon-spec", listenPort = 0, statusPort = 0,
      statsdTarget = Some(("127.0.0.1", statsdRx.getLocalPort)),
      tlsOptions = Map(
        "tls.cert" -> tlsRes("cert.pem"),
        "tls.key" -> tlsRes("pkcs8-key.pem")),
      triggerMs = 200L)
    try {
      // the source registers its ephemeral port once the first micro-batch
      // planning instantiates it
      val deadline = System.currentTimeMillis() + 30000
      var port = SyslogSocketSource.boundPort("daemon-spec")
      while (port.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); port = SyslogSocketSource.boundPort("daemon-spec")
      }
      assert(port.nonEmpty, "daemon source never bound its listen port")

      // client: the generator over TLS (generate-stdout.rb | openssl s_client)
      val trustAll = new X509TrustManager {
        override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
        override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
      }
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, Array(trustAll), null)
      val sock = ctx.getSocketFactory.createSocket("127.0.0.1", port.get)
      val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      (0 until n).foreach(i => w.write(generatedLine(i) + "\n"))
      w.flush(); sock.close()

      // NO manual processAllAvailable: the ProcessingTime trigger must land
      // the rows on its own cadence — that's the operating-mode claim
      def landed(): Long =
        Try(spark.read.parquet(out).count()).getOrElse(0L)
      while (landed() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(landed() == n, s"expected $n routed rows, got ${landed()}")

      // /stats must serve advancing counters over real HTTP
      def stats(): String = {
        val url = new java.net.URI(
          s"http://127.0.0.1:${h.status.boundPort}/stats").toURL
        val in = url.openStream()
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      while (!stats().contains("\"hotdog.lines\":") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val body = stats()
      assert(body.contains("\"hotdog.lines\":"),
        s"status server never surfaced hotdog.lines: $body")
      assert(body.contains("\"hotdog.kafka.submitted.test\":"),
        s"per-topic submitted counter missing: $body")

      // statsd: at least one hotdog.* counter datagram arrived
      val buf = new Array[Byte](65536)
      val pkt = new DatagramPacket(buf, buf.length)
      statsdRx.receive(pkt)
      val dgram = new String(pkt.getData, 0, pkt.getLength, StandardCharsets.UTF_8)
      assert(dgram.startsWith("hotdog.") &&
        (dgram.endsWith("|c") || dgram.endsWith("|g") || dgram.endsWith("|ms")),
        s"unexpected statsd datagram: $dgram")

      // clean drain (the SIGTERM hook's path): stop completes, all rows
      // remain landed, and calling it twice is safe
      h.drainAndStop()
      assert(!h.query.isActive, "query still active after drain")
      assert(landed() == n, "drain lost rows")
      h.drainAndStop() // idempotent
    } finally {
      Try(h.drainAndStop())
      statsdRx.close()
    }
  }
}
