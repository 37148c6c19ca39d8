package graft

import java.io.OutputStreamWriter
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.cert.X509Certificate
import javax.net.ssl.{SSLContext, X509TrustManager}

import graft.queries.Synth
import graft.sinks.RoutedSink
import graft.sources.{Pem, SyslogSocketSource}
import graft.streaming.GraftPipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Try

/** The `graft-syslog` DSv2 server source end-to-end: real clients connect
  * over TCP (and TLS), push syslog lines, and the full cascade routes them
  * into partitioned parquet — the reference's entire daemon path
  * (src/serve/mod.rs accept loop → connection.rs read_logs → sink).
  */
class SocketSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tlsRes(f: String): String =
    getClass.getResource(s"/tls/$f").getPath

  /** Push lines over a socket, then drive the query until `expected` rows
    * landed in `out` (socket delivery is async w.r.t. the micro-batch
    * planner, so poll-and-process rather than one processAllAvailable). */
  private def runPipe(options: Map[String, String], expected: Long,
      send: Int => Unit): DataFrame = {
    val name = options("name")
    val out = Files.createTempDirectory(s"graft-$name-out")
    val routed = GraftPipeline.tcpStream(spark, Synth.HotdogConfig,
      "127.0.0.1", 0, options)
    val q = routed.writeStream
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        RoutedSink.writeRouted(batch, Synth.HotdogConfig, out.toString)
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var port = SyslogSocketSource.boundPort(name)
      while (port.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); port = SyslogSocketSource.boundPort(name)
      }
      assert(port.nonEmpty, "source never registered its bound port")
      send(port.get)
      def landed(): Long =
        Try(spark.read.parquet(out.toString).count()).getOrElse(0L)
      while (landed() < expected && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); q.processAllAvailable()
      }
      assert(landed() == expected, s"expected $expected routed rows")
      spark.read.parquet(out.toString)
    } finally q.stop()
  }

  private val lines = Seq(
    """<13>1 2020-04-18T15:16:09Z host app - - - hello there""",
    """<13>1 2020-04-18T15:16:09Z host app - - - {"meta":{"topic":"t-sock"},"k":3}""",
    "not syslog at all")

  private def plainSend(ls: Seq[String])(port: Int): Unit = {
    val sock = new java.net.Socket("127.0.0.1", port)
    val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
    ls.foreach(l => w.write(l + "\n"))
    w.flush(); sock.close()
  }

  test("TCP server source: client pushes syslog lines through cascade to routed parquet") {
    val result = runPipe(Map("name" -> "t-plain"), expected = 2, plainSend(lines))
    val byTopic = result.collect().map(r =>
      r.getAs[String]("topic") -> r.getAs[String]("value")).toMap
    assert(byTopic("test").startsWith("This is the total message: hello there"))
    assert(byTopic("t-sock").contains("\"k\":3"))
    // the malformed line was dropped by the parse filter, not routed
    assert(byTopic.size == 2)
  }

  test("TLS server source: handshake, then the same line loop (PKCS#8 key)") {
    val trustAll = new X509TrustManager {
      override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
    }
    def tlsSend(port: Int): Unit = {
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, Array(trustAll), null)
      val sock = ctx.getSocketFactory.createSocket("127.0.0.1", port)
      val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      lines.foreach(l => w.write(l + "\n"))
      w.flush(); sock.close()
    }
    val result = runPipe(Map(
      "name" -> "t-tls",
      "tls.cert" -> tlsRes("cert.pem"),
      "tls.key" -> tlsRes("pkcs8-key.pem")), expected = 2, tlsSend)
    assert(result.select("topic").collect().map(_.getString(0)).toSet ==
      Set("test", "t-sock"))
  }

  test("PEM key loading: PKCS#8 and PKCS#1 RSA accepted, like the reference") {
    // src/serve/tls.rs:106-124 — rustls_pemfile accepts RSAKey | PKCS8Key
    assert(Pem.readKey(tlsRes("pkcs8-key.pem")).getAlgorithm == "RSA")
    assert(Pem.readKey(tlsRes("rsa-key.pem")).getAlgorithm == "RSA")
    // both encode the same key material
    assert(Pem.readKey(tlsRes("pkcs8-key.pem")).getEncoded.toSeq ==
      Pem.readKey(tlsRes("rsa-key.pem")).getEncoded.toSeq)
  }

  test("PEM key loading failure modes match the reference") {
    // a file with zero keys → "Failed to load keys properly, 0 found"
    val none = intercept[IllegalArgumentException] {
      Pem.readKey(tlsRes("cert.pem"))
    }
    assert(none.getMessage.contains("Failed to load keys properly, 0 found"))
    // cert file must contain certs
    val cert = intercept[IllegalArgumentException] {
      Pem.readCerts(tlsRes("pkcs8-key.pem"))
    }
    assert(cert.getMessage.contains("Failed to load certs"))
  }

  test("custom CA option rejected, as in the reference") {
    // src/serve/tls.rs:82-83
    val e = intercept[Exception] {
      val routed = GraftPipeline.tcpStream(spark, Synth.HotdogConfig,
        "127.0.0.1", 0, Map(
          "name" -> "t-ca",
          "tls.cert" -> tlsRes("cert.pem"),
          "tls.key" -> tlsRes("pkcs8-key.pem"),
          "tls.ca" -> tlsRes("cert.pem")))
      val q = routed.writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ca").toString + "/_cp")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("Certificate Authority is not currently supported"))
  }

}
