package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, Executors, Future, TimeUnit}
import java.util.concurrent.atomic.LongAdder

import graft.metrics.{Stats, StatsdEmitter}

/** The reference's Kafka delivery semantics (src/sink/kafka.rs:137-191)
  * over the public Produce v0 wire protocol — no Kafka client library:
  *
  *   - every payload is sent DETACHED (the reference spawns a detached task
  *     per message); [[flush]] is the barrier that awaits all in-flight
  *     sends (the sink's batch-end contract)
  *   - acks=1 with a delivery timeout (the reference's 60 s send timeout,
  *     src/sink/kafka.rs:140)
  *   - success → `kafka.submitted.<topic>` counter + `kafka.producer.sent`
  *     timer; a broker error code → `kafka.producer.error.<errcode>` where
  *     errcode is the lowercase first word of the error description
  *     (src/sink/kafka.rs:203-208 `metric_name_for`); a local timeout →
  *     the same mapping over "Message timed out"
  *
  * Counters accumulate in-process (the reference's stats facade) and
  * optionally emit statsd datagrams. One connection per send keeps the
  * framing trivially correct; a production path would pool connections —
  * the delivery/accounting semantics, which is what this class pins, are
  * identical.
  *
  * `tlsCaCert` reaches a TLS-listening cluster (the reference passes the
  * full librdkafka config — including `security.protocol=ssl` +
  * `ssl.ca.location` — through to its producer, src/sink/kafka.rs:63-84):
  * the produce socket is wrapped in an SSLSocket trusting the named PEM
  * bundle (`Some("")` = the JVM default trust store). A handshake failure
  * surfaces as the transport-failure counter, like any broken broker.
  *
  * `sasl` = (username, password) runs SCRAM-SHA-256 ([[ScramAuth]]) on
  * every connection before the produce frame — the mechanism behind the
  * reference's `SASL_SCRAM_*` env overrides. Composes with TLS
  * (`security.protocol=sasl_ssl`): auth runs inside the SSL session.
  */
final class KafkaProduceClient(broker: String, timeoutMs: Int = 60000,
    statsd: Option[StatsdEmitter] = None, maxInFlight: Int = 1024,
    tlsCaCert: Option[String] = None,
    sasl: Option[(String, String)] = None,
    saslAlgo: ScramAuth.Algo = ScramAuth.Sha256)
    extends AutoCloseable {

  private val (host, port) = broker.lastIndexOf(':') match {
    case -1 => (broker, 9092)
    case i  => (broker.substring(0, i), broker.substring(i + 1).toInt)
  }

  private val sslCtx: Option[javax.net.ssl.SSLContext] =
    tlsCaCert.map(graft.sources.Pem.clientContext)

  private val pool = Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "graft-kafka-produce"); t.setDaemon(true); t
  })
  private val inFlight = new ConcurrentLinkedQueue[Future[_]]()
  // the reference's bounded channel (kafka.buffer, default 1024,
  // src/sink/kafka.rs:224-226): senders BLOCK when the sink lags, so a
  // fast partition cannot balloon the heap with queued payloads
  private val slots = new java.util.concurrent.Semaphore(maxInFlight)

  /** In-process metric counts, keyed by full statsd name. */
  val counters = new ConcurrentHashMap[String, LongAdder]()

  private def count(name: String): Unit = {
    counters.computeIfAbsent(name, _ => new LongAdder).increment()
    statsd.foreach(_.counter(name, 1))
  }

  /** Detached send — returns immediately while under `maxInFlight`
    * queued payloads, blocks past it (the reference's bounded-channel
    * backpressure); [[flush]] awaits delivery. Completed futures are
    * discarded from the queue head here so a large partition (millions of
    * rows) does not retain millions of done FutureTasks until the
    * partition-end flush — the semaphore bounds concurrency, this bounds
    * queue length to ~maxInFlight plus out-of-order stragglers. */
  def send(topic: String, payload: String): Unit = {
    slots.acquire()
    var h = inFlight.peek()
    while (h != null && h.isDone && inFlight.remove(h)) h = inFlight.peek()
    inFlight.add(pool.submit(new Runnable {
      override def run(): Unit =
        try sendSync(topic, payload) finally slots.release()
    }))
  }

  /** One blocking produce round-trip with the reference's accounting. */
  def sendSync(topic: String, payload: String): Unit = {
    val t0 = System.nanoTime()
    try {
      val code = produceRoundTrip(topic, payload)
      if (code == 0) {
        count(Stats.kafkaSubmitted(topic))
        statsd.foreach(_.timerMs(Stats.KafkaProducerSent,
          TimeUnit.NANOSECONDS.toMillis(System.nanoTime() - t0)))
      } else count(Stats.kafkaProducerError(errcodeName(code)))
    } catch {
      case _: SocketTimeoutException =>
        count(Stats.kafkaProducerError(Stats.metricNameFor("Message timed out")))
      case _: Exception =>
        count(Stats.kafkaProducerError(Stats.metricNameFor("Transport failure")))
    }
  }

  /** Await every detached send issued so far. */
  def flush(): Unit = {
    var f = inFlight.poll()
    while (f != null) { try f.get() catch { case _: Exception => () }; f = inFlight.poll() }
  }

  override def close(): Unit = {
    flush()
    pool.shutdown()
    statsd.foreach(_.close())
  }

  /** Public Kafka protocol error descriptions for the codes a v0 produce
    * can return, run through the reference's first-word mapping. */
  private def errcodeName(code: Int): String = Stats.metricNameFor(code match {
    case 1 => "Offset out of range"
    case 2 => "Invalid message"
    case 3 => "Unknown topic or partition"
    case 4 => "Invalid message size"
    case 5 => "Leader not available"
    case 6 => "Not leader for partition"
    case 7 => "Request timed out"
    case _ => "Unknown error"
  })

  /** Produce v0 (api_key 0): one message, acks=1. Returns the partition
    * error code from the response. */
  private def produceRoundTrip(topic: String, payload: String): Int = {
    val plain = new Socket()
    var socket: Socket = plain
    try {
      // a connect-phase timeout is a TRANSPORT failure (broker unreachable),
      // not the delivery timeout — resurface it as such so the error
      // taxonomy matches the reference's (send-timeout vs connection error)
      try plain.connect(new InetSocketAddress(host, port), timeoutMs)
      catch {
        case e: SocketTimeoutException =>
          throw new java.net.ConnectException(s"connect timed out: ${e.getMessage}")
      }
      plain.setSoTimeout(timeoutMs)
      sslCtx.foreach { ctx =>
        val s = ctx.getSocketFactory.createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        s.setSoTimeout(timeoutMs)
        s.setUseClientMode(true)
        s.startHandshake() // chain-verified against the configured anchors
        socket = s
      }
      val out = new DataOutputStream(socket.getOutputStream)
      val in = new DataInputStream(socket.getInputStream)

      // authenticate before the first produce frame (one connection per
      // send → one SCRAM exchange per delivery; a pooled client would
      // authenticate once per pooled connection)
      sasl.foreach { case (u, p) =>
        ScramAuth.authenticate(in, out, u, p, algo = saslAlgo)
      }

      val clientId = "graft".getBytes(StandardCharsets.UTF_8)
      val topicB = topic.getBytes(StandardCharsets.UTF_8)
      val valueB = payload.getBytes(StandardCharsets.UTF_8)
      val correlationId = 0x70726f64 // "prod"

      // v0 message: crc, magic=0, attributes=0, key=null, value
      val msgBody = new java.io.ByteArrayOutputStream()
      val mb = new DataOutputStream(msgBody)
      mb.writeByte(0); mb.writeByte(0)
      mb.writeInt(-1) // null key
      mb.writeInt(valueB.length); mb.write(valueB)
      val crc = new java.util.zip.CRC32()
      crc.update(msgBody.toByteArray)
      val messageSize = 4 + msgBody.size() // crc + body
      val messageSetSize = 8 + 4 + messageSize // offset + size + message

      val size = 2 + 2 + 4 + (2 + clientId.length) + // header
        2 + 4 + // acks + timeout
        4 + (2 + topicB.length) + 4 + // topic array
        4 + 4 + messageSetSize // partition + set size + set
      out.writeInt(size)
      out.writeShort(0) // api_key Produce
      out.writeShort(0) // api_version
      out.writeInt(correlationId)
      out.writeShort(clientId.length); out.write(clientId)
      out.writeShort(1) // required_acks
      out.writeInt(timeoutMs)
      out.writeInt(1) // one topic
      out.writeShort(topicB.length); out.write(topicB)
      out.writeInt(1) // one partition
      out.writeInt(0) // partition 0
      out.writeInt(messageSetSize)
      out.writeLong(0L) // offset (ignored by brokers on produce)
      out.writeInt(messageSize)
      out.writeInt(crc.getValue.toInt)
      out.write(msgBody.toByteArray)
      out.flush()

      val respSize = in.readInt()
      if (respSize < 4 || respSize > (1 << 20))
        throw new IllegalStateException(s"implausible produce response size $respSize")
      if (in.readInt() != correlationId)
        throw new IllegalStateException("correlation id mismatch")
      val nTopics = in.readInt()
      var err = 0
      var t = 0
      while (t < nTopics) {
        val tl = in.readShort(); in.skipBytes(tl)
        val nParts = in.readInt()
        var p = 0
        while (p < nParts) {
          in.skipBytes(4) // partition id
          val e = in.readShort().toInt
          in.skipBytes(8) // offset
          if (err == 0) err = e
          p += 1
        }
        t += 1
      }
      err
    } finally socket.close() // closing the SSL wrapper closes the transport
  }
}

object KafkaProduceClient {
  /** librdkafka-style conf → the client's TLS setting (the reference feeds
    * its whole `[kafka]` table to librdkafka, src/sink/kafka.rs:63-84):
    * `security.protocol` of ssl/sasl_ssl enables TLS with
    * `ssl.ca.location` as the trust anchor ("" → JVM default store). */
  def tlsFromConf(conf: Map[String, String]): Option[String] =
    conf.getOrElse("security.protocol", "plaintext").toLowerCase match {
      case "ssl" | "sasl_ssl" => Some(conf.getOrElse("ssl.ca.location", ""))
      case _ => None
    }

  /** librdkafka-style conf → SCRAM credentials: the `sasl.username`/
    * `sasl.password` keys the reference's `SASL_SCRAM_*` env overrides
    * populate ([[KafkaBootstrap.withEnvOverrides]]). */
  def saslFromConf(conf: Map[String, String]): Option[(String, String)] =
    for (u <- conf.get("sasl.username"); p <- conf.get("sasl.password"))
      yield (u, p)

  /** librdkafka-style conf → SCRAM mechanism: the `sasl.mechanisms` key
    * (librdkafka's name — singular value), SCRAM-SHA-256 by default. */
  def saslAlgoFromConf(conf: Map[String, String]): ScramAuth.Algo =
    ScramAuth.algoFor(conf.getOrElse("sasl.mechanisms", "SCRAM-SHA-256"))
}
