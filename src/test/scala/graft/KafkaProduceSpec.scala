package graft

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.net.{DatagramPacket, DatagramSocket, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import graft.sinks.{KafkaProduceClient, RoutedSink}
import org.scalatest.funsuite.AnyFunSuite

/** Produce-path delivery semantics (src/sink/kafka.rs:137-191) against an
  * in-process loopback broker speaking Produce v0: detached sends + flush
  * barrier, per-topic submitted counters, per-error-code error counters,
  * and local-timeout accounting. The bootstrap gate has its own spec
  * (KafkaBootstrapSpec); together they cover the reference sink's
  * observable behavior minus only a real cluster's config surface.
  */
class KafkaProduceSpec extends AnyFunSuite {

  /** Loopback broker: one Produce v0 request per connection; records each
    * (topic, payload) and answers with `errorFor(topic)`. `silent = true`
    * reads the request and never answers (drives the client timeout). */
  /** Server side of SCRAM-SHA-256 over SaslHandshake v0 + raw tokens:
    * verifies the client proof against `password`, signs server-final with
    * `signPassword` (defaults to the real one — pass a different value to
    * simulate a server that doesn't hold the credential). Returns false
    * (after an e= token) when the client proof doesn't verify. */
  private def scramServer(in: DataInputStream, out: DataOutputStream,
      user: String, password: String, signPassword: String,
      algo: graft.sinks.ScramAuth.Algo = graft.sinks.ScramAuth.Sha256): Boolean = {
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    def sendTok(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.flush()
    }
    def readTok(): String = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
    // SaslHandshake v0
    val frame = new Array[Byte](in.readInt()); in.readFully(frame)
    val f = new DataInputStream(new ByteArrayInputStream(frame))
    assert(f.readShort() == 17, "expected SaslHandshake")
    f.readShort()
    val corr = f.readInt()
    f.skipBytes(f.readShort()) // client_id
    val mb = new Array[Byte](f.readShort()); f.readFully(mb)
    assert(new String(mb, StandardCharsets.UTF_8) == algo.mechanism)
    val mecb = algo.mechanism.getBytes(StandardCharsets.UTF_8)
    out.writeInt(4 + 2 + 4 + 2 + mecb.length)
    out.writeInt(corr); out.writeShort(0)
    out.writeInt(1); out.writeShort(mecb.length); out.write(mecb)
    out.flush()
    if (algo.mechanism == "PLAIN") {
      // RFC 4616: authzid NUL authcid NUL password in ONE token
      val tok = readTok().split('\u0000')
      // split of "\0u\0p" yields ["", u, p]
      if (tok.length == 3 && tok(1) == user && tok(2) == password) {
        sendTok(""); return true
      }
      return false
    }
    // SCRAM exchange
    val clientFirst = readTok()
    assert(clientFirst.startsWith("n,,"), s"gs2 header: $clientFirst")
    val bare = clientFirst.drop(3)
    val fields = bare.split(',').map(a => a.charAt(0) -> a.drop(2)).toMap
    assert(fields('n') == user, s"unexpected user ${fields('n')}")
    val salt = "loopback-salt".getBytes(StandardCharsets.UTF_8)
    val serverNonce = fields('r') + "-srv-ext"
    val serverFirst = s"r=$serverNonce,s=${b64(salt)},i=4096"
    sendTok(serverFirst)
    val clientFinal = readTok()
    val pIdx = clientFinal.lastIndexOf(",p=")
    val withoutProof = clientFinal.substring(0, pIdx)
    val proof = java.util.Base64.getDecoder.decode(clientFinal.drop(pIdx + 3))
    val authMsg = s"$bare,$serverFirst,$withoutProof"
    val sp = graft.sinks.ScramAuth.saltedPassword(password, salt, 4096, algo)
    val ck = graft.sinks.ScramAuth.hmac(sp, "Client Key".getBytes, algo)
    val sig = graft.sinks.ScramAuth.hmac(
      graft.sinks.ScramAuth.hash(ck, algo), authMsg.getBytes, algo)
    val expProof = ck.zip(sig).map { case (a, b) => (a ^ b).toByte }
    if (!java.util.Arrays.equals(proof, expProof)) {
      sendTok("e=invalid-proof")
      return false
    }
    val spSign = graft.sinks.ScramAuth.saltedPassword(signPassword, salt, 4096, algo)
    val sk = graft.sinks.ScramAuth.hmac(spSign, "Server Key".getBytes, algo)
    sendTok(s"v=${b64(graft.sinks.ScramAuth.hmac(sk, authMsg.getBytes, algo))}")
    true
  }

  private final class LoopbackBroker(errorFor: String => Int = _ => 0,
      silent: Boolean = false,
      ssl: Option[javax.net.ssl.SSLContext] = None,
      scram: Option[(String, String)] = None,
      scramSignPassword: Option[String] = None,
      scramAlgo: graft.sinks.ScramAuth.Algo = graft.sinks.ScramAuth.Sha256,
      dropResponses: Int = 0,
      partitions: Int = 1)
      extends AutoCloseable {
    val received = new ConcurrentLinkedQueue[(String, String)]()
    /** (api_version, acks, wire attributes of the outermost message) per
      * request — lets tests pin the framing the client actually sent. */
    val frames = new ConcurrentLinkedQueue[(Short, Short, Byte)]()
    /** (pid, epoch, seq) of every magic-2 batch — idempotence exhibits. */
    val batchIds = new ConcurrentLinkedQueue[(Long, Short, Int)]()
    /** Target partition of every produce request — partitioner exhibits. */
    val partitionsSeen = new ConcurrentLinkedQueue[Integer]()
    /** Total connections accepted — the pooling exhibit. */
    val connections = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Accepted sockets still open — lets tests simulate a broker restart. */
    private val liveSockets = new ConcurrentLinkedQueue[java.net.Socket]()
    private val nextPid = new java.util.concurrent.atomic.AtomicLong(1000L)
    // KIP-98 dedup window: last appended seq per (pid, topic); a replayed
    // or older seq is acknowledged but NOT appended again
    private val lastSeq = new ConcurrentHashMap[(Long, String), Integer]()
    private val toDrop = new java.util.concurrent.atomic.AtomicInteger(dropResponses)

    /** Close every accepted connection (the broker-restart exhibit) —
      * the listener stays up, so clients can reconnect. */
    def dropAllConnections(): Unit = {
      var s = liveSockets.poll()
      while (s != null) { try s.close() catch { case _: Exception => () }; s = liveSockets.poll() }
    }
    private val server: ServerSocket = ssl match {
      case Some(ctx) =>
        val s = ctx.getServerSocketFactory.createServerSocket()
        s.bind(new java.net.InetSocketAddress("127.0.0.1", 0)); s
      case None => new ServerSocket(0)
    }
    def port: Int = server.getLocalPort
    def broker: String = s"127.0.0.1:$port"

    private val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        connections.incrementAndGet()
        liveSockets.add(s)
        val t = new Thread(() => {
          try {
            val in = new DataInputStream(s.getInputStream)
            val out = new DataOutputStream(s.getOutputStream)
            val authed = scram.forall { case (u, p) =>
              scramServer(in, out, u, p, scramSignPassword.getOrElse(p), scramAlgo)
            }
            if (!authed) { s.close(); throw new java.io.IOException("auth failed") }
            // pooled-connection broker: serve REQUESTS until the client
            // closes (or a test drops the socket) — the real broker model
            while (true) {
            val size = in.readInt()
            val frame = new Array[Byte](size)
            in.readFully(frame)
            val f = new DataInputStream(new ByteArrayInputStream(frame))
            val apiKey = f.readShort()
            assert(apiKey == 0 || apiKey == 3 || apiKey == 22,
              s"expected Produce/Metadata/InitProducerId, got api_key=$apiKey")
            val version = f.readShort()
            val corr = f.readInt()
            f.skipBytes(f.readShort()) // client_id
            if (apiKey == 3) { // Metadata v0: advertise `partitions` per topic
              val nT = f.readInt()
              val names = (0 until nT).map { _ =>
                val b = new Array[Byte](f.readShort()); f.readFully(b)
                new String(b, StandardCharsets.UTF_8)
              }
              val body = new java.io.ByteArrayOutputStream()
              val bo = new DataOutputStream(body)
              bo.writeInt(corr)
              bo.writeInt(1) // one broker
              bo.writeInt(0) // node id
              val hostB = "127.0.0.1".getBytes(StandardCharsets.UTF_8)
              bo.writeShort(hostB.length); bo.write(hostB)
              bo.writeInt(port)
              bo.writeInt(names.size)
              names.foreach { n =>
                bo.writeShort(0) // topic error
                val nb = n.getBytes(StandardCharsets.UTF_8)
                bo.writeShort(nb.length); bo.write(nb)
                bo.writeInt(partitions)
                (0 until partitions).foreach { p =>
                  bo.writeShort(0) // partition error
                  bo.writeInt(p) // partition id
                  bo.writeInt(0) // leader
                  bo.writeInt(1); bo.writeInt(0) // replicas [0]
                  bo.writeInt(1); bo.writeInt(0) // isr [0]
                }
              }
              if (!silent) { out.writeInt(body.size()); body.writeTo(out); out.flush() }
            } else if (apiKey == 22) { // InitProducerId v0 (KIP-98)
              val tl = f.readShort() // nullable transactional_id
              if (tl >= 0) f.skipBytes(tl)
              f.readInt() // transaction_timeout_ms
              out.writeInt(4 + 4 + 2 + 8 + 2)
              out.writeInt(corr)
              out.writeInt(0) // throttle_time_ms
              out.writeShort(0) // error
              out.writeLong(nextPid.getAndIncrement())
              out.writeShort(0) // epoch
              out.flush()
            } else {
            if (version >= 3) { // nullable transactional_id (KIP-98)
              val tl = f.readShort()
              if (tl >= 0) f.skipBytes(tl)
            }
            val acks = f.readShort()
            f.readInt() // timeout

            // MessageSet walker: v0 entries are magic-0, v2 magic-1 (adds
            // the timestamp); a gzip-coded entry's value IS an inner
            // message set — decompress and recurse, like a real broker's
            // deep-iteration validation path.
            def parseSet(setB: Array[Byte], topic: String, outer: Boolean): Unit = {
              val ms = new DataInputStream(new ByteArrayInputStream(setB))
              while (ms.available() >= 12) {
                ms.readLong() // offset
                ms.readInt() // message size
                ms.readInt() // crc
                val magic = ms.readByte()
                val attributes = ms.readByte()
                if (outer) frames.add((version, acks, attributes))
                assert(magic == (if (version >= 2) 1 else 0),
                  s"message magic $magic does not match request version $version")
                if (magic >= 1) ms.readLong() // timestamp
                val keyLen = ms.readInt()
                if (keyLen >= 0) ms.skipBytes(keyLen)
                val vb = new Array[Byte](ms.readInt()); ms.readFully(vb)
                (attributes & 7) match {
                  case 0 => received.add(topic -> new String(vb, StandardCharsets.UTF_8))
                  case 1 =>
                    val gz = new java.util.zip.GZIPInputStream(
                      new ByteArrayInputStream(vb))
                    parseSet(gz.readAllBytes(), topic, outer = false)
                  case c => fail(s"unsupported codec bits $c")
                }
              }
            }

            // Magic-2 RecordBatch walker (v3+): crc32c-verified header,
            // varint-decoded records, codec named by batch attributes —
            // the validation a modern broker runs on every append.
            def readVarlong(ms: DataInputStream): Long = {
              var z = 0L; var shift = 0; var b = 0
              do {
                b = ms.readUnsignedByte()
                z |= (b & 0x7fL) << shift; shift += 7
              } while ((b & 0x80) != 0)
              (z >>> 1) ^ -(z & 1) // un-zigzag
            }
            def parseBatch(setB: Array[Byte], topic: String, partId: Int): Unit = {
              val ms = new DataInputStream(new ByteArrayInputStream(setB))
              ms.readLong() // baseOffset
              val batchLen = ms.readInt()
              ms.readInt() // partitionLeaderEpoch
              val magic = ms.readByte()
              assert(magic == 2, s"v$version produce must carry magic-2, got $magic")
              val crc = ms.readInt()
              val section = new Array[Byte](batchLen - 9)
              ms.readFully(section)
              val c = new java.util.zip.CRC32C(); c.update(section)
              assert(c.getValue.toInt == crc, "record batch crc32c mismatch")
              val sec = new DataInputStream(new ByteArrayInputStream(section))
              val attributes = sec.readShort()
              frames.add((version, acks, (attributes & 0xff).toByte))
              sec.readInt() // lastOffsetDelta
              sec.readLong(); sec.readLong() // timestamps
              val pid = sec.readLong()
              val epoch = sec.readShort()
              val seq = sec.readInt()
              if (pid >= 0) batchIds.add((pid, epoch, seq))
              // KIP-98 dedup: a replayed sequence is acknowledged, never
              // re-appended — the broker half of idempotent produce
              val dup = pid >= 0 && {
                val k = (pid, s"$topic/$partId")
                val last = lastSeq.get(k)
                if (last != null && seq <= last.intValue()) true
                else { lastSeq.put(k, Integer.valueOf(seq)); false }
              }
              val n = sec.readInt()
              val rawRecords = new Array[Byte](sec.available()); sec.readFully(rawRecords)
              val records = (attributes & 7) match {
                case 0 => rawRecords
                case 1 => new java.util.zip.GZIPInputStream(
                  new ByteArrayInputStream(rawRecords)).readAllBytes()
                case 2 => new org.xerial.snappy.SnappyInputStream(
                  new ByteArrayInputStream(rawRecords)).readAllBytes()
                case 3 => new net.jpountz.lz4.LZ4FrameInputStream(
                  new ByteArrayInputStream(rawRecords)).readAllBytes()
                case 4 => new com.github.luben.zstd.ZstdInputStream(
                  new ByteArrayInputStream(rawRecords)).readAllBytes()
                case codec => fail(s"unsupported batch codec $codec")
              }
              val rs = new DataInputStream(new ByteArrayInputStream(records))
              (0 until n).foreach { _ =>
                readVarlong(rs) // record length
                rs.readByte() // record attributes
                readVarlong(rs); readVarlong(rs) // timestamp/offset deltas
                val keyLen = readVarlong(rs)
                if (keyLen >= 0) rs.skipBytes(keyLen.toInt)
                val vb = new Array[Byte](readVarlong(rs).toInt); rs.readFully(vb)
                val nHeaders = readVarlong(rs)
                assert(nHeaders == 0, s"unexpected record headers $nHeaders")
                if (!dup) received.add(topic -> new String(vb, StandardCharsets.UTF_8))
              }
            }

            val nTopics = f.readInt()
            var topic = ""
            (0 until nTopics).foreach { _ =>
              val tb = new Array[Byte](f.readShort()); f.readFully(tb)
              topic = new String(tb, StandardCharsets.UTF_8)
              val nParts = f.readInt()
              (0 until nParts).foreach { _ =>
                val partId = f.readInt()
                partitionsSeen.add(Integer.valueOf(partId))
                val setB = new Array[Byte](f.readInt()) // message_set_size
                f.readFully(setB)
                if (version >= 3) parseBatch(setB, topic, partId)
                else parseSet(setB, topic, outer = true)
              }
            }
            if (acks != 0 && toDrop.getAndDecrement() > 0) {
              // forced-resend exhibit: the request was fully processed but
              // the ack is lost with the connection — the ambiguous-
              // delivery window idempotent produce exists for
              s.close()
            } else if (acks != 0 && !silent) {
              val tb = topic.getBytes(StandardCharsets.UTF_8)
              val partBytes = 4 + 2 + 8 + (if (version >= 2) 8 else 0)
              val throttle = if (version >= 1) 4 else 0
              out.writeInt(4 + 4 + 2 + tb.length + 4 + partBytes + throttle)
              out.writeInt(corr)
              out.writeInt(1) // one topic
              out.writeShort(tb.length); out.write(tb)
              out.writeInt(1) // one partition
              out.writeInt(0) // partition 0
              out.writeShort(errorFor(topic))
              out.writeLong(42L) // assigned base offset
              if (version >= 2) out.writeLong(-1L) // log_append_time
              if (version >= 1) out.writeInt(0) // throttle_time_ms
              out.flush()
            } // acks=0: nothing to send; silent: starve the client timeout
            } // produce vs InitProducerId dispatch
            } // per-connection request loop
          } catch { case _: Exception => () }
        })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    override def close(): Unit = server.close()
  }

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
}
