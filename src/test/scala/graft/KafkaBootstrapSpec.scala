package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket

import graft.sinks.KafkaBootstrap
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka bootstrap gate (src/sink/kafka.rs:60-104): ApiVersions
  * handshake against a fake broker, refusal against non-brokers, broker
  * fail-over, and the reference's runtime env overrides.
  */
class KafkaBootstrapSpec extends AnyFunSuite {

  /** Minimal fake broker: accepts one connection, parses the ApiVersions
    * request frame, echoes the correlation id with error_code 0. */
  private def fakeBroker(): (ServerSocket, Thread) = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        val size = in.readInt()
        val frame = new Array[Byte](size)
        in.readFully(frame)
        val apiKey = ((frame(0) & 0xff) << 8) | (frame(1) & 0xff)
        assert(apiKey == 18, s"expected ApiVersions, got api_key=$apiKey")
        val corr = java.nio.ByteBuffer.wrap(frame, 4, 4).getInt
        out.writeInt(4 + 2) // correlation_id + error_code
        out.writeInt(corr)
        out.writeShort(0)
        out.flush()
        s.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    (server, t)
  }

  test("probe succeeds against a broker that answers ApiVersions") {
    val (server, _) = fakeBroker()
    try {
      val broker = s"127.0.0.1:${server.getLocalPort}"
      assert(KafkaBootstrap.probe(broker, 5000) == broker)
    } finally server.close()
  }

  test("probe fails over dead brokers to the live one") {
    val dead = new ServerSocket(0)
    val deadPort = dead.getLocalPort
    dead.close() // nothing listens here any more
    val (server, _) = fakeBroker()
    try {
      val live = s"127.0.0.1:${server.getLocalPort}"
      assert(KafkaBootstrap.probe(s"127.0.0.1:$deadPort, $live", 5000) == live)
    } finally server.close()
  }

  test("probe refuses a silent non-broker listener (timeout)") {
    val silent = new ServerSocket(0) // accepts, never replies
    try {
      val e = intercept[IllegalStateException] {
        KafkaBootstrap.probe(s"127.0.0.1:${silent.getLocalPort}", 300)
      }
      assert(e.getMessage.contains("Failed to connect to a Kafka broker"))
    } finally silent.close()
  }

  test("probe refuses when no broker is reachable") {
    val gone = new ServerSocket(0)
    val port = gone.getLocalPort
    gone.close()
    intercept[IllegalStateException] { KafkaBootstrap.probe(s"127.0.0.1:$port", 300) }
  }

  test("KAFKA_BROKER and SASL_SCRAM_* env overrides (src/sink/kafka.rs:69-84)") {
    val (servers, conf) = KafkaBootstrap.withEnvOverrides(
      "cfg:9092", Map("acks" -> "all"),
      Map("KAFKA_BROKER" -> "env:9092",
        "SASL_SCRAM_USERNAME" -> "u", "SASL_SCRAM_PASSWORD" -> "p"))
    assert(servers == "env:9092")
    assert(conf == Map("acks" -> "all", "sasl.username" -> "u", "sasl.password" -> "p"))
    // no env → config passes through untouched
    val (s2, c2) = KafkaBootstrap.withEnvOverrides("cfg:9092", Map("acks" -> "all"), Map.empty)
    assert(s2 == "cfg:9092" && c2 == Map("acks" -> "all"))
  }
}
