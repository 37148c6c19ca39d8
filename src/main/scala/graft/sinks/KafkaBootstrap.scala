package graft.sinks

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets

/** The reference's Kafka bootstrap gate (src/sink/kafka.rs:60-104): before
  * serving, it fetches cluster metadata with `timeout_ms` and PANICS if no
  * broker answers — hotdog refuses to start against an unreachable cluster
  * rather than buffering into the void. This reproduces that gate without a
  * Kafka client on the classpath by speaking the public Kafka wire protocol
  * directly: one ApiVersions (api_key 18, v0) request per bootstrap server —
  * the handshake every client (including librdkafka's metadata fetch) opens
  * with — accepting the first broker that answers with our correlation id.
  *
  * Env overrides mirror src/sink/kafka.rs:69-84: `KAFKA_BROKER` replaces
  * `bootstrap.servers`; `SASL_SCRAM_USERNAME`/`SASL_SCRAM_PASSWORD` set
  * `sasl.username`/`sasl.password` at runtime.
  */
object KafkaBootstrap {

  /** Runtime env overrides applied before probe + producer start. Returns
    * the effective bootstrap servers and the kafka conf with SASL creds
    * overlaid. */
  def withEnvOverrides(bootstrap: String, conf: Map[String, String],
      env: Map[String, String] = sys.env): (String, Map[String, String]) = {
    val servers = env.getOrElse("KAFKA_BROKER", bootstrap)
    val sasl = List(
      "sasl.username" -> env.get("SASL_SCRAM_USERNAME"),
      "sasl.password" -> env.get("SASL_SCRAM_PASSWORD"))
      .collect { case (k, Some(v)) => k -> v }
    (servers, conf ++ sasl)
  }

  /** Probe every `host:port` in the comma-separated `bootstrap` list until
    * one completes the ApiVersions handshake; returns the answering broker.
    * Throws IllegalStateException when none do — the analog of the
    * reference's `panic!("Failed to connect to a Kafka broker")`
    * (src/sink/kafka.rs:103).
    */
  def probe(bootstrap: String, timeoutMs: Int): String = {
    val brokers = bootstrap.split(',').map(_.trim).filter(_.nonEmpty)
    require(brokers.nonEmpty, "empty bootstrap.servers")
    val budget = math.max(1, timeoutMs)
    var lastErr: Throwable = null
    brokers.foreach { broker =>
      try { apiVersionsHandshake(broker, budget); return broker }
      catch { case e: Exception => lastErr = e }
    }
    throw new IllegalStateException(
      s"Failed to connect to a Kafka broker: bootstrap.servers=$bootstrap " +
        s"timeout_ms=$timeoutMs", lastErr)
  }

  /** One ApiVersions v0 round-trip: request frame out, response frame with
    * the echoed correlation id back. Anything else (timeout, EOF, wrong
    * correlation id, junk frame) is a failure — a plain TCP listener that is
    * not a Kafka broker does not pass. */
  private def apiVersionsHandshake(broker: String, timeoutMs: Int): Unit = {
    val (host, port) = broker.lastIndexOf(':') match {
      case -1 => (broker, 9092)
      case i  => (broker.substring(0, i), broker.substring(i + 1).toInt)
    }
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val out = new DataOutputStream(socket.getOutputStream)
      val in = new DataInputStream(socket.getInputStream)
      val clientId = "graft".getBytes(StandardCharsets.UTF_8)
      val correlationId = 0x67726166 // "graf"
      // frame: size, api_key=18 (ApiVersions), api_version=0, correlation_id,
      // client_id (int16-length string)
      out.writeInt(2 + 2 + 4 + 2 + clientId.length)
      out.writeShort(18)
      out.writeShort(0)
      out.writeInt(correlationId)
      out.writeShort(clientId.length)
      out.write(clientId)
      out.flush()
      val size = in.readInt()
      if (size < 4 || size > (1 << 20))
        throw new IllegalStateException(s"$broker: implausible frame size $size")
      if (in.readInt() != correlationId)
        throw new IllegalStateException(s"$broker: correlation id mismatch")
    } catch {
      case e: SocketTimeoutException =>
        throw new IllegalStateException(s"$broker: no ApiVersions response", e)
      case e: EOFException =>
        throw new IllegalStateException(s"$broker: connection closed mid-handshake", e)
    } finally socket.close()
  }
}
