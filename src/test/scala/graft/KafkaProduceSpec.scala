package graft

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.net.{DatagramPacket, DatagramSocket, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import graft.sinks.{KafkaProduceClient, RoutedSink}
import graft.tools.EmbeddedKafka.LoopbackBroker
import org.scalatest.funsuite.AnyFunSuite

/** Produce-path delivery semantics (src/sink/kafka.rs:137-191) against an
  * in-process loopback broker speaking Produce v0: detached sends + flush
  * barrier, per-topic submitted counters, per-error-code error counters,
  * and local-timeout accounting. The bootstrap gate has its own spec
  * (KafkaBootstrapSpec); together they cover the reference sink's
  * observable behavior minus only a real cluster's config surface.
  */
class KafkaProduceSpec extends AnyFunSuite {


  private def counts(c: KafkaProduceClient): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    c.counters.forEach((k, v) => b += k -> v.sum())
    b.result()
  }

  test("detached sends deliver payloads; per-topic submitted counters") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000)
    try {
      client.send("logs-a", "m1")
      client.send("logs-a", "m2")
      client.send("logs-b", "m3")
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("logs-a" -> "m1", "logs-a" -> "m2", "logs-b" -> "m3"))
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.logs-a") == 2L)
      assert(c("hotdog.kafka.submitted.logs-b") == 1L)
      assert(!c.keys.exists(_.startsWith("hotdog.kafka.producer.error")))
    } finally { client.close(); broker.close() }
  }

  test("sendBatch coalesces N payloads into ONE wire request (librdkafka " +
    "batch.num.messages), legacy set and v3 record batch alike") {
    // v3: one magic-2 record batch carrying all records
    val b3 = new LoopbackBroker()
    val c3 = new KafkaProduceClient(b3.broker, timeoutMs = 5000,
      apiVersion = 3)
    try {
      c3.sendBatch("logs", (1 to 50).map(i => s"m$i"))
      c3.flush()
      val got = b3.received.toArray(Array.empty[(String, String)]).toSeq
      assert(got.map(_._2).sorted == (1 to 50).map(i => s"m$i").sorted)
      assert(b3.frames.size() == 1,
        s"50 payloads must ride one Produce frame, got ${b3.frames.size()}")
      assert(counts(c3)("hotdog.kafka.submitted.logs") == 50L)
    } finally { c3.close(); b3.close() }
    // legacy v0: one message set with 50 entries (frames records one tuple
    // per set ENTRY — delivery and counters are the observable contract)
    val b0 = new LoopbackBroker()
    val c0 = new KafkaProduceClient(b0.broker, timeoutMs = 5000)
    try {
      c0.sendBatch("logs", (1 to 50).map(i => s"m$i"))
      c0.flush()
      assert(b0.received.size() == 50)
      assert(counts(c0)("hotdog.kafka.submitted.logs") == 50L)
    } finally { c0.close(); b0.close() }
    // oversized members are screened individually, survivors still ship
    val bx = new LoopbackBroker()
    val cx = new KafkaProduceClient(bx.broker, timeoutMs = 5000,
      maxMessageBytes = 8)
    try {
      cx.sendBatch("logs", Seq("ok-1", "way-too-large-payload", "ok-2"))
      cx.flush()
      assert(bx.received.size() == 2)
      val c = counts(cx)
      assert(c("hotdog.kafka.submitted.logs") == 2L)
      assert(c("hotdog.kafka.producer.error.message") == 1L)
    } finally { cx.close(); bx.close() }
  }

  test("idempotent sendBatch: base sequence advances by record count; a " +
    "resent batch is absorbed once") {
    val broker = new LoopbackBroker(dropResponses = 1)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, acks = 1, idempotent = true)
    try {
      client.sendBatchSync("logs", (1 to 10).map(i => s"b1-$i"))
      client.sendBatchSync("logs", (1 to 10).map(i => s"b2-$i"))
      client.flush()
      // KIP-98: batch 1 base seq 0, batch 2 base seq 10
      val ids = broker.batchIds.toArray(Array.empty[(Long, Short, Int)])
        .toSeq.map(_._3).distinct.sorted
      assert(ids.take(2) == Seq(0, 10),
        s"base sequences must advance by record count: $ids")
      // the dropped-ack first attempt was resent with the SAME frame: all
      // 20 records land exactly once
      val got = broker.received.toArray(Array.empty[(String, String)]).toSeq
      assert(got.size == 20, s"exactly-once per batch: ${got.size}")
    } finally { client.close(); broker.close() }
  }

  test("broker error code maps to kafka.producer.error.<first-word>") {
    // code 3 = "Unknown topic or partition" → errcode "unknown"
    // (src/sink/kafka.rs:203-208 metric_name_for)
    val broker = new LoopbackBroker(errorFor = t => if (t == "bad") 3 else 0)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000)
    try {
      client.send("good", "x")
      client.send("bad", "y")
      client.flush()
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.good") == 1L)
      assert(c("hotdog.kafka.producer.error.unknown") == 1L)
      assert(!c.contains("hotdog.kafka.submitted.bad"))
    } finally { client.close(); broker.close() }
  }

  test("no response within the delivery timeout → timed-out error counter") {
    val broker = new LoopbackBroker(silent = true)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 300)
    try {
      val t0 = System.nanoTime()
      client.send("t", "x")
      client.flush()
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(elapsedMs < 5000, s"timeout must bound the send, took ${elapsedMs}ms")
      // the reference maps the local timeout through the same first-word
      // rule: "Message timed out" → "message"
      assert(counts(client)("hotdog.kafka.producer.error.message") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("connection refused → transport error counter, flush still returns") {
    val dead = new ServerSocket(0)
    val port = dead.getLocalPort
    dead.close()
    val client = new KafkaProduceClient(s"127.0.0.1:$port", timeoutMs = 500)
    try {
      client.send("t", "x")
      client.flush()
      assert(counts(client)("hotdog.kafka.producer.error.transport") == 1L)
    } finally client.close()
  }

  private def tlsRes(f: String): String =
    getClass.getResource(s"/tls/$f").getPath

  test("produce path over TLS: delivery + counters through an SSL broker") {
    // the reference reaches SASL/SSL clusters by passing the librdkafka
    // config through (src/sink/kafka.rs:63-84); here the wire client
    // completes a real handshake against the same PEM material the syslog
    // TLS source serves
    val ctx = graft.sources.Pem.serverContext(
      tlsRes("cert.pem"), tlsRes("pkcs8-key.pem"))
    val broker = new LoopbackBroker(ssl = Some(ctx))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      tlsCaCert = Some(tlsRes("cert.pem")))
    try {
      client.send("tls-topic", "secret payload")
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("tls-topic" -> "secret payload"))
      assert(counts(client)("hotdog.kafka.submitted.tls-topic") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("TLS client against an untrusted broker fails closed as transport error") {
    val ctx = graft.sources.Pem.serverContext(
      tlsRes("cert.pem"), tlsRes("pkcs8-key.pem"))
    val broker = new LoopbackBroker(ssl = Some(ctx))
    // trust store = JVM default, which does NOT contain the loopback cert:
    // chain validation must REJECT (no silent fallback to plaintext)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      tlsCaCert = Some(""))
    try {
      client.send("t", "x")
      client.flush()
      assert(counts(client)("hotdog.kafka.producer.error.transport") == 1L)
      assert(broker.received.isEmpty)
    } finally { client.close(); broker.close() }
  }

  test("tlsFromConf: librdkafka security.protocol dispatch") {
    import graft.sinks.KafkaProduceClient.tlsFromConf
    assert(tlsFromConf(Map.empty).isEmpty)
    assert(tlsFromConf(Map("security.protocol" -> "PLAINTEXT")).isEmpty)
    assert(tlsFromConf(Map("security.protocol" -> "ssl",
      "ssl.ca.location" -> "/ca.pem")) == Some("/ca.pem"))
    assert(tlsFromConf(Map("security.protocol" -> "SASL_SSL")) == Some(""))
  }

  test("SCRAM-SHA-256 matches the RFC 7677 test vector") {
    // user=user pass=pencil, the published SCRAM-SHA-256 example exchange
    import graft.sinks.ScramAuth
    val salt = java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val sp = ScramAuth.saltedPassword("pencil", salt, 4096)
    val clientKey = ScramAuth.hmac(sp, "Client Key".getBytes)
    val storedKey = ScramAuth.sha256(clientKey)
    val authMsg = "n=user,r=rOprNGfwEbeRWgbNEkqO," +
      "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096," +
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val proof = clientKey.zip(ScramAuth.hmac(storedKey, authMsg.getBytes))
      .map { case (a, b) => (a ^ b).toByte }
    assert(java.util.Base64.getEncoder.encodeToString(proof)
      == "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    val serverKey = ScramAuth.hmac(sp, "Server Key".getBytes)
    assert(java.util.Base64.getEncoder.encodeToString(
      ScramAuth.hmac(serverKey, authMsg.getBytes))
      == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("SCRAM-authenticated produce: delivery through a credentialed broker") {
    val broker = new LoopbackBroker(scram = Some(("alice", "wonder")))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some(("alice", "wonder")))
    try {
      client.send("auth-topic", "hello")
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("auth-topic" -> "hello"))
      assert(counts(client)("hotdog.kafka.submitted.auth-topic") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("SCRAM-SHA-512: same RFC 5802 exchange over the other broker mechanism") {
    import graft.sinks.ScramAuth
    val broker = new LoopbackBroker(scram = Some(("alice", "wonder")),
      scramAlgo = ScramAuth.Sha512)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some(("alice", "wonder")), saslAlgo = ScramAuth.Sha512)
    try {
      client.send("auth-512", "hello")
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("auth-512" -> "hello"))
    } finally { client.close(); broker.close() }
    // conf dispatch: librdkafka's sasl.mechanisms key selects the algo
    assert(KafkaProduceClient.saslAlgoFromConf(
      Map("sasl.mechanisms" -> "SCRAM-SHA-512")) == ScramAuth.Sha512)
    assert(KafkaProduceClient.saslAlgoFromConf(Map.empty) == ScramAuth.Sha256)
    intercept[IllegalArgumentException] {
      KafkaProduceClient.saslAlgoFromConf(Map("sasl.mechanisms" -> "GSSAPI"))
    }
  }

  test("SCRAM composes with TLS (sasl_ssl): auth runs inside the SSL session") {
    val ctx = graft.sources.Pem.serverContext(
      tlsRes("cert.pem"), tlsRes("pkcs8-key.pem"))
    val broker = new LoopbackBroker(ssl = Some(ctx), scram = Some(("u", "p")))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      tlsCaCert = Some(tlsRes("cert.pem")), sasl = Some(("u", "p")))
    try {
      client.send("sasl-ssl", "payload")
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("sasl-ssl" -> "payload"))
    } finally { client.close(); broker.close() }
  }

  test("wrong password fails closed: nothing delivered, transport counter") {
    val broker = new LoopbackBroker(scram = Some(("alice", "right")))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some(("alice", "wrong")))
    try {
      client.send("t", "x")
      client.flush()
      assert(broker.received.isEmpty)
      assert(counts(client)("hotdog.kafka.producer.error.transport") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("mutual auth: a server not holding the credential is rejected") {
    // server verifies our proof but signs server-final with a different
    // password — the client must refuse to talk produce to it
    val broker = new LoopbackBroker(scram = Some(("alice", "secret")),
      scramSignPassword = Some("imposter"))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some(("alice", "secret")))
    try {
      client.send("t", "x")
      client.flush()
      assert(broker.received.isEmpty,
        "no payload may follow an unverified server signature")
      assert(counts(client)("hotdog.kafka.producer.error.transport") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("saslFromConf picks up the reference's env-overlaid credentials") {
    import graft.sinks.{KafkaBootstrap, KafkaProduceClient}
    val (_, conf) = KafkaBootstrap.withEnvOverrides("b:9092", Map.empty,
      env = Map("SASL_SCRAM_USERNAME" -> "svc", "SASL_SCRAM_PASSWORD" -> "pw"))
    assert(KafkaProduceClient.saslFromConf(conf) == Some(("svc", "pw")))
    assert(KafkaProduceClient.saslFromConf(Map("sasl.username" -> "only-u")).isEmpty)
  }

  test("statsd datagrams ride along with the in-process counters") {
    val udp = new DatagramSocket()
    udp.setSoTimeout(5000)
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      statsd = Some(new graft.metrics.StatsdEmitter("127.0.0.1", udp.getLocalPort)))
    try {
      client.send("t", "x")
      client.flush()
      val lines = scala.collection.mutable.Buffer.empty[String]
      // one counter + one timer datagram
      (1 to 2).foreach { _ =>
        val p = new DatagramPacket(new Array[Byte](512), 512)
        udp.receive(p)
        lines += new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
      }
      assert(lines.contains("hotdog.kafka.submitted.t:1|c"), lines)
      assert(lines.exists(_.matches("hotdog\\.kafka\\.producer\\.sent:\\d+\\|ms")), lines)
    } finally { client.close(); broker.close(); udp.close() }
  }

  test("gzip produce: v2 wrapper framing, payload recovered by decompression") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      compression = "gzip")
    try {
      val body = "z" * 4096 // compressible: the wire frame must be smaller
      client.send("zip-topic", body)
      client.flush()
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("zip-topic" -> body))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.toSeq == Seq((2.toShort, 1.toShort, 1.toByte)),
        s"gzip must ride Produce v2 with codec bits 1, got ${frames.toSeq}")
      assert(counts(client)("hotdog.kafka.submitted.zip-topic") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("plain Produce v2: magic-1 timestamped message, v2 response parsed") {
    val broker = new LoopbackBroker(errorFor = t => if (t == "bad") 3 else 0)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 2)
    try {
      client.send("v2-topic", "payload")
      client.send("bad", "y")
      client.flush()
      assert(broker.received.contains("v2-topic" -> "payload"))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.forall(fr => fr._1 == 2 && fr._3 == 0))
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.v2-topic") == 1L)
      // the longer v2 response (log_append_time + throttle) parses cleanly
      // enough to surface the broker's error code, not a framing error
      assert(c("hotdog.kafka.producer.error.unknown") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("Produce v3: magic-2 record batch, crc32c verified, varints decoded") {
    val broker = new LoopbackBroker(errorFor = t => if (t == "bad") 3 else 0)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3)
    try {
      client.send("v3-topic", "modern payload")
      client.send("bad", "y")
      client.flush()
      assert(broker.received.contains("v3-topic" -> "modern payload"))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.forall(fr => fr._1 == 3 && fr._3 == 0),
        s"v3 uncompressed batches must carry attribute bits 0: ${frames.toSeq}")
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.v3-topic") == 1L)
      // the v3 response (same shape as v2) surfaces the broker error code
      assert(c("hotdog.kafka.producer.error.unknown") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("Produce v3 + gzip: records section deflates in place, codec in batch attributes") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, compression = "gzip")
    try {
      val body = "q" * 4096
      client.send("v3-zip", body)
      client.flush()
      assert(broker.received.toArray(Array.empty[(String, String)]).toSet ==
        Set("v3-zip" -> body))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.toSeq == Seq((3.toShort, 1.toShort, 1.toByte)),
        s"gzip under v3 stays v3 with batch codec bits 1 (no wrapper message), got ${frames.toSeq}")
      assert(counts(client)("hotdog.kafka.submitted.v3-zip") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("Produce v3 snappy/lz4/zstd: batch codec bits 2/3/4, payload recovered") {
    Seq(("snappy", 2.toByte), ("lz4", 3.toByte), ("zstd", 4.toByte)).foreach {
      case (codec, bits) =>
        val broker = new LoopbackBroker()
        val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
          apiVersion = 3, compression = codec)
        try {
          val body = s"$codec " + ("r" * 4096)
          client.send(s"v3-$codec", body)
          client.flush()
          assert(broker.received.toArray(Array.empty[(String, String)]).toSet ==
            Set(s"v3-$codec" -> body), s"$codec payload must round-trip")
          val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
          assert(frames.toSeq == Seq((3.toShort, 1.toShort, bits)),
            s"$codec must ride v3 with batch codec bits $bits, got ${frames.toSeq}")
          assert(counts(client)(s"hotdog.kafka.submitted.v3-$codec") == 1L)
        } finally { client.close(); broker.close() }
    }
  }

  test("SASL/PLAIN authenticates and produces; wrong password fails closed") {
    import graft.sinks.ScramAuth
    val broker = new LoopbackBroker(scram = Some(("svc", "pw1")),
      scramAlgo = ScramAuth.Plain)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some(("svc", "pw1")), saslAlgo = ScramAuth.Plain)
    try {
      client.send("t-plain", "hello")
      client.flush()
      assert(broker.received.contains("t-plain" -> "hello"))
      assert(counts(client)("hotdog.kafka.submitted.t-plain") == 1L)
    } finally { client.close(); broker.close() }
    val broker2 = new LoopbackBroker(scram = Some(("svc", "pw1")),
      scramAlgo = ScramAuth.Plain)
    val bad = new KafkaProduceClient(broker2.broker, timeoutMs = 5000,
      sasl = Some(("svc", "WRONG")), saslAlgo = ScramAuth.Plain)
    try {
      bad.send("t-plain2", "x")
      bad.flush()
      assert(broker2.received.isEmpty, "bad credentials must never produce")
      assert(!counts(bad).contains("hotdog.kafka.submitted.t-plain2"))
    } finally { bad.close(); broker2.close() }
    assert(ScramAuth.algoFor("plain") == ScramAuth.Plain)
  }

  test("message.max.bytes: oversized payload rejected locally, never sent") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      maxMessageBytes = 64)
    try {
      client.send("big", "x" * 65) // 65 UTF-8 bytes > 64
      client.send("ok", "y" * 64)  // exactly at the limit passes
      client.flush()
      assert(broker.received.toArray(Array.empty[(String, String)]).toSet ==
        Set("ok" -> ("y" * 64)), "only the in-limit payload may reach the wire")
      val c = counts(client)
      assert(c("hotdog.kafka.producer.error.message") == 1L)
      assert(c("hotdog.kafka.submitted.ok") == 1L)
      assert(!c.contains("hotdog.kafka.submitted.big"))
    } finally { client.close(); broker.close() }
    import graft.sinks.KafkaProduceClient.maxMessageBytesFromConf
    assert(maxMessageBytesFromConf(Map.empty) == 1000000)
    assert(maxMessageBytesFromConf(Map("message.max.bytes" -> "2048")) == 2048)
  }

  test("record-batch codecs reject pre-v3 Produce at construction") {
    Seq("snappy", "lz4", "zstd").foreach { codec =>
      val e = intercept[IllegalArgumentException] {
        new KafkaProduceClient("localhost:1", apiVersion = 2, compression = codec)
      }
      assert(e.getMessage.contains("requires Produce v3"),
        s"$codec at v2 must fail at submit time: ${e.getMessage}")
    }
  }

  test("acks=all is passed on the wire and acknowledged normally") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      acks = -1)
    try {
      client.send("t-all", "x")
      client.flush()
      assert(broker.received.contains("t-all" -> "x"))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.toSeq.map(_._2) == Seq((-1).toShort))
      assert(counts(client)("hotdog.kafka.submitted.t-all") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("acks=0 is fire-and-forget: no response read, still delivered") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      acks = 0)
    try {
      client.send("t0", "x")
      client.flush()
      // the broker records the payload but never answers; the client must
      // count the submit WITHOUT waiting on a response
      val deadline = System.nanoTime() + 5000000000L
      while (broker.received.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(broker.received.contains("t0" -> "x"))
      assert(counts(client)("hotdog.kafka.submitted.t0") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("acks/compression conf dispatch follows librdkafka key names") {
    import graft.sinks.KafkaProduceClient.{acksFromConf, compressionFromConf}
    assert(acksFromConf(Map.empty) == 1)
    assert(acksFromConf(Map("acks" -> "all")) == -1)
    assert(acksFromConf(Map("request.required.acks" -> "-1")) == -1)
    assert(acksFromConf(Map("acks" -> "0")) == 0)
    intercept[IllegalArgumentException](acksFromConf(Map("acks" -> "7")))
    assert(compressionFromConf(Map.empty) == "none")
    assert(compressionFromConf(Map("compression.codec" -> "gzip")) == "gzip")
    assert(compressionFromConf(Map("compression.type" -> "GZIP")) == "gzip")
    import graft.sinks.KafkaProduceClient.produceVersionFromConf
    assert(produceVersionFromConf(Map.empty) == 0)
    assert(produceVersionFromConf(Map("broker.version.fallback" -> "0.9.0")) == 0)
    assert(produceVersionFromConf(Map("broker.version.fallback" -> "0.10.2.1")) == 2)
    assert(produceVersionFromConf(Map("broker.version.fallback" -> "0.11.0")) == 3)
    assert(produceVersionFromConf(Map("broker.version.fallback" -> "3.6")) == 3)
    assert(compressionFromConf(Map("compression.codec" -> "zstd")) == "zstd")
    assert(compressionFromConf(Map("compression.type" -> "LZ4")) == "lz4")
    assert(compressionFromConf(Map("compression.codec" -> "snappy")) == "snappy")
    intercept[IllegalArgumentException](
      compressionFromConf(Map("compression.codec" -> "brotli")))
  }

  test("RoutedSink.produceKafka threads acks/codec conf to executor clients") {
    val spark = TestSpark.spark
    import spark.implicits._
    val broker = new LoopbackBroker()
    try {
      val routed = Seq(("t-z", "gzipped row")).toDF("topic", "value")
      RoutedSink.produceKafka(routed, broker.broker, timeoutMs = 5000,
        kafkaConf = Map("compression.codec" -> "gzip", "acks" -> "all"))
      assert(broker.received.toArray(Array.empty[(String, String)]).toSet
        == Set("t-z" -> "gzipped row"))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.toSeq == Seq((2.toShort, (-1).toShort, 1.toByte)))
    } finally broker.close()
  }

  test("produceKafkaWithConf: the whole librdkafka-style conf drives the client") {
    val spark = TestSpark.spark
    import spark.implicits._
    // credentialed broker; conf carries SASL + gzip + acks=all, like the
    // reference's full [kafka] table passthrough
    val broker = new LoopbackBroker(scram = Some(("svc", "pw")))
    try {
      val cfg = graft.config.GraftConfig(
        rules = Nil, schemas = Map.empty, defaultTopic = None,
        kafkaBuffer = 1024, kafkaTimeoutMs = 5000L, parquetUrl = None,
        parquetBufferBytes = None, flushMs = 60000L,
        kafkaConf = Map(
          "sasl.username" -> "svc", "sasl.password" -> "pw",
          "compression.codec" -> "gzip", "acks" -> "all"))
      val routed = Seq(("t-conf", "full conf payload")).toDF("topic", "value")
      RoutedSink.produceKafkaWithConf(routed, broker.broker, cfg)
      assert(broker.received.toArray(Array.empty[(String, String)]).toSet
        == Set("t-conf" -> "full conf payload"))
      val frames = broker.frames.toArray(Array.empty[(Short, Short, Byte)])
      assert(frames.toSeq == Seq((2.toShort, (-1).toShort, 1.toByte)),
        s"conf must reach the wire: $frames")
    } finally broker.close()
  }

  test("RoutedSink.produceKafka: executor-side delivery of a routed frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val broker = new LoopbackBroker()
    try {
      val routed = Seq(("t-a", "v1"), ("t-a", "v2"), ("t-b", "v3"))
        .toDF("topic", "value").repartition(2)
      RoutedSink.produceKafka(routed, broker.broker, timeoutMs = 5000)
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("t-a" -> "v1", "t-a" -> "v2", "t-b" -> "v3"))
    } finally broker.close()
  }

  test("pooled connections: 40 sends share the 8 sender sockets, SCRAM once per socket") {
    val broker = new LoopbackBroker(scram = Some("alice" -> "pw1"))
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      sasl = Some("alice" -> "pw1"))
    try {
      (1 to 40).foreach(i => client.send("pool-t", s"m$i"))
      client.flush()
      assert(broker.received.size == 40)
      assert(counts(client)("hotdog.kafka.submitted.pool-t") == 40L)
      // 8 sender threads → at most 8 connections (each SCRAM-authenticated
      // exactly once; per-send auth was the round-8 weakness)
      assert(broker.connections.get() <= 8,
        s"40 sends must reuse pooled sockets, opened ${broker.connections.get()}")
    } finally { client.close(); broker.close() }
  }

  test("broker restart: stale pooled socket reconnects and redelivers") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000)
    try {
      client.sendSync("r-t", "before-restart")
      broker.dropAllConnections() // listener stays up — the restart exhibit
      client.sendSync("r-t", "after-restart")
      val got = broker.received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set("r-t" -> "before-restart", "r-t" -> "after-restart"))
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.r-t") == 2L)
      assert(!c.keys.exists(_.startsWith("hotdog.kafka.producer.error")),
        s"the reconnect must be silent to the error taxonomy: $c")
      assert(broker.connections.get() >= 2, "the retry must have reconnected")
    } finally { client.close(); broker.close() }
  }

  test("idempotent produce: batches carry broker-assigned pid + per-topic sequences") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, idempotent = true)
    try {
      client.sendSync("seq-a", "a0")
      client.sendSync("seq-a", "a1")
      client.sendSync("seq-a", "a2")
      client.sendSync("seq-b", "b0")
      assert(broker.received.size == 4)
      val ids = broker.batchIds.toArray(Array.empty[(Long, Short, Int)]).toSeq
      assert(ids.map(_._1).distinct.size == 1 && ids.head._1 >= 1000L,
        s"one InitProducerId-assigned pid across all batches: $ids")
      assert(ids.forall(_._2 == 0.toShort))
      assert(ids.map(_._3).sorted == Seq(0, 0, 1, 2),
        s"per-topic sequences 0,1,2 (seq-a) and 0 (seq-b): $ids")
    } finally { client.close(); broker.close() }
  }

  test("idempotent: lost ack → same-sequence resend, broker dedups, exactly one append") {
    val broker = new LoopbackBroker(dropResponses = 1)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, idempotent = true)
    try {
      client.sendSync("once-t", "only-once")
      val got = broker.received.toArray(Array.empty[(String, String)]).toSeq
      assert(got == Seq("once-t" -> "only-once"),
        s"the replayed sequence must not re-append: $got")
      val ids = broker.batchIds.toArray(Array.empty[(Long, Short, Int)]).toSeq
      assert(ids.size == 2 && ids.distinct.size == 1,
        s"the retry must resend the IDENTICAL (pid, epoch, seq): $ids")
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.once-t") == 1L)
      assert(!c.keys.exists(_.startsWith("hotdog.kafka.producer.error")))
    } finally { client.close(); broker.close() }
  }

  test("partitioner: Metadata discovery + round-robin across 3 partitions") {
    val broker = new LoopbackBroker(partitions = 3)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000)
    try {
      (1 to 6).foreach(i => client.sendSync("part-t", s"m$i"))
      assert(broker.received.size == 6)
      val parts = broker.partitionsSeen.toArray(Array.empty[Integer]).map(_.intValue())
      assert(parts.toSet == Set(0, 1, 2),
        s"round-robin must reach every advertised partition: ${parts.toSeq}")
      assert(parts.groupBy(identity).values.map(_.length).toSet == Set(2),
        s"6 keyless sends over 3 partitions spread 2-2-2: ${parts.toSeq}")
    } finally { client.close(); broker.close() }
  }

  test("idempotent sequences are per (topic, partition)") {
    val broker = new LoopbackBroker(partitions = 2)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, idempotent = true)
    try {
      (1 to 4).foreach(i => client.sendSync("seq-p", s"m$i"))
      assert(broker.received.size == 4)
      val parts = broker.partitionsSeen.toArray(Array.empty[Integer]).map(_.intValue())
      val seqs = broker.batchIds.toArray(Array.empty[(Long, Short, Int)]).map(_._3)
      // 4 round-robin sends over 2 partitions → each partition sees its OWN
      // 0,1 sequence (a shared counter would show 0,1,2,3 and desync the
      // broker's per-partition dedup window)
      val perPart = parts.zip(seqs).groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
      assert(perPart.toMap.values.toSet == Set(Seq(0, 1)),
        s"per-partition sequences must each start at 0: ${perPart.toMap}")
    } finally { client.close(); broker.close() }
  }

  test("without idempotence the same lost ack is at-least-once: duplicate append") {
    val broker = new LoopbackBroker(dropResponses = 1)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000)
    try {
      client.sendSync("dup-t", "maybe-twice")
      val got = broker.received.toArray(Array.empty[(String, String)]).toSeq
      assert(got == Seq("dup-t" -> "maybe-twice", "dup-t" -> "maybe-twice"),
        s"plain retry without sequences duplicates — the contrast exhibit: $got")
      assert(counts(client)("hotdog.kafka.submitted.dup-t") == 1L)
    } finally { client.close(); broker.close() }
  }

  test("byte-bounded batch split: a count-coalesced batch past " +
    "message.max.bytes re-splits into multiple produce requests") {
    // brokers enforce message.max.bytes against the WHOLE set/batch: 10
    // individually-small 400B payloads must not ship as one 4KB set when
    // the cap is 2000B. cap = 2000-512; per-payload 400+64 → 3 per request
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, maxMessageBytes = 2000)
    try {
      val payload = "x" * 400
      client.sendBatch("big", Seq.fill(10)(payload))
      client.flush()
      assert(broker.received.size == 10, "every payload must deliver")
      assert(broker.frames.size() == 4,
        s"10×464B against a 1488B cap must ship as 3+3+3+1 requests, " +
          s"got ${broker.frames.size()}")
      assert(counts(client)("hotdog.kafka.submitted.big") == 10L)
    } finally { client.close(); broker.close() }
  }

  test("linger.ms: a partial batch ships on the timer, without flush") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, batchNumMessages = 1000, lingerMs = 150L)
    try {
      (1 to 3).foreach(i => client.enqueue("ling", s"m$i"))
      // no flush(): only the linger sweep can ship these
      val deadline = System.currentTimeMillis() + 10000
      while (broker.received.size < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(broker.received.size == 3,
        "the expired partial buffer must ship on the linger timer alone")
      assert(broker.frames.size() == 1,
        s"the lingered trio must COALESCE into one request: ${broker.frames.size()}")
    } finally { client.close(); broker.close() }
  }

  test("enqueue ships on the batch.num.messages count trigger while " +
    "linger is still pending") {
    val broker = new LoopbackBroker()
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, batchNumMessages = 2, lingerMs = 60000L)
    try {
      client.enqueue("cnt", "m1")
      client.enqueue("cnt", "m2") // count reached — must not wait a minute
      val deadline = System.currentTimeMillis() + 10000
      while (broker.received.size < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(broker.received.size == 2 && broker.frames.size() == 1,
        s"count trigger must ship one coalesced request immediately: " +
          s"${broker.received.size} msgs / ${broker.frames.size()} frames")
    } finally { client.close(); broker.close() }
  }

  test("retries: a retriable broker code resends the identical frame " +
    "until success, within the retry budget") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    // REQUEST_TIMED_OUT(7) twice, then healthy — a leader failover blip
    val broker = new LoopbackBroker(
      errorFor = _ => if (attempts.incrementAndGet() <= 2) 7 else 0)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      retries = 3, retryBackoffMs = 10L)
    try {
      client.sendSync("blip", "m1")
      assert(broker.frames.size() == 3,
        s"two refused attempts + the success: ${broker.frames.size()}")
      val c = counts(client)
      assert(c("hotdog.kafka.submitted.blip") == 1L,
        "the delivery counts ONCE despite the resends")
      assert(!c.keys.exists(_.startsWith("hotdog.kafka.producer.error")),
        s"a within-budget recovery is not an error: $c")
    } finally { client.close(); broker.close() }
  }

  test("retries exhausted: the retriable code surfaces as the error " +
    "counter after retries+1 attempts") {
    val broker = new LoopbackBroker(errorFor = _ => 7) // never recovers
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      retries = 1, retryBackoffMs = 10L)
    try {
      client.sendSync("down", "m1")
      assert(broker.frames.size() == 2,
        s"retries=1 → exactly original + one resend: ${broker.frames.size()}")
      assert(counts(client)("hotdog.kafka.producer.error.request") == 1L,
        "exhausted retries surface the reference's first-word error counter")
    } finally { client.close(); broker.close() }
  }

  test("linger.ms=0 keeps coalescing: messages queued while sends are " +
    "in flight batch together — zero DELAY, not zero batching") {
    // a slow broker (20 ms/request) + a tight in-flight window: once the
    // permits are held, queued messages MUST pile into the accumulator
    // and ship coalesced — the old behavior (one Produce request per
    // enqueue at linger=0) would emit exactly 200 frames here
    val broker = new LoopbackBroker(responseDelayMs = 20L)
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, batchNumMessages = 10000, lingerMs = 0L,
      maxInFlight = 4)
    try {
      (1 to 200).foreach(i => client.enqueue("z0", s"m$i"))
      client.flush()
      assert(broker.received.size == 200, "every message must deliver")
      assert(broker.frames.size() < 100,
        s"linger=0 must coalesce queued messages (librdkafka semantics): " +
          s"${broker.frames.size()} frames for 200 msgs")
    } finally { client.close(); broker.close() }
  }

  test("queue.buffering.max.kbytes: a large-payload burst force-ships at " +
    "the byte cap — accumulator heap bounded, enqueue order preserved") {
    val broker = new LoopbackBroker()
    // count trigger (100k) and linger (10 min) can never fire: ONLY the
    // byte cap can move these 100 × ~1 KiB payloads out of the heap
    val client = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, batchNumMessages = 100000, lingerMs = 600000L,
      queueBufferingMaxBytes = 8192L)
    try {
      (1 to 100).foreach(i => client.enqueue("cap", f"m$i%04d-" + "x" * 1000))
      client.flush()
      import scala.jdk.CollectionConverters._
      val got = broker.received.asScala.toSeq.map(_._2.take(5))
      assert(got.size == 100, s"every payload must deliver: ${got.size}")
      assert(got == (1 to 100).map(i => f"m$i%04d"),
        "cap-forced ships must preserve the enqueue order")
      // ~1064 B/record against an 8 KiB cap → ships roughly every 8 msgs:
      // the burst coalesces but can never sit whole in the accumulator
      assert(broker.frames.size() >= 5 && broker.frames.size() <= 25,
        s"the byte cap must force intermediate ships: ${broker.frames.size()}")
    } finally { client.close(); broker.close() }
  }

  test("retry conf dispatch follows librdkafka key names and defaults") {
    import KafkaProduceClient._
    assert(lingerMsFromConf(Map.empty) == 5L)
    assert(lingerMsFromConf(Map("linger.ms" -> "250")) == 250L)
    assert(lingerMsFromConf(Map("queue.buffering.max.ms" -> "0")) == 0L)
    assert(retriesFromConf(Map.empty) == 2)
    assert(retriesFromConf(Map("message.send.max.retries" -> "7")) == 7)
    assert(retriesFromConf(Map("retries" -> "0")) == 0)
    assert(retryBackoffMsFromConf(Map.empty) == 100L)
    assert(retryBackoffMsFromConf(Map("retry.backoff.ms" -> "5")) == 5L)
    assert(queueBufferingMaxBytesFromConf(Map.empty) == (1L << 30))
    assert(queueBufferingMaxBytesFromConf(
      Map("queue.buffering.max.kbytes" -> "64")) == 64L * 1024)
  }
}
