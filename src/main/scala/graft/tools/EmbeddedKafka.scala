package graft.tools

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** In-process embedded Kafka broker + SCRAM server side — the library's
  * integration-test harness (the kafka-testkit pattern): a wire-honest
  * counterpart every delivery spec, the daemon exhibits, and the
  * `src_kafka_roundtrip` oracle key run against, in-process and
  * dependency-free. Speaks Metadata v0, InitProducerId v0, Produce v0-v9
  * (magic-0/1 message sets and crc32c-verified magic-2 record batches, all
  * four compression codecs), and Fetch v4 over a real per-partition log of
  * the produced record batches (served verbatim, the broker zero-copy
  * model — a compressed produce round-trips compressed), with optional TLS
  * and SASL PLAIN/SCRAM fronts. Lives in main (not test) scope so the
  * correctness gate's produce→consume round-trip key can host a broker
  * inside the query closure, the same discipline as the O25 status-server
  * HTTP round-trip key.
  */
object EmbeddedKafka {

  /** Loopback broker: one Produce v0 request per connection; records each
    * (topic, payload) and answers with `errorFor(topic)`. `silent = true`
    * reads the request and never answers (drives the client timeout). */
  /** Server side of SCRAM-SHA-256 over SaslHandshake v0 + raw tokens:
    * verifies the client proof against `password`, signs server-final with
    * `signPassword` (defaults to the real one — pass a different value to
    * simulate a server that doesn't hold the credential). Returns false
    * (after an e= token) when the client proof doesn't verify. */
  def scramServer(in: DataInputStream, out: DataOutputStream,
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

  final class LoopbackBroker(errorFor: String => Int = _ => 0,
      silent: Boolean = false,
      ssl: Option[javax.net.ssl.SSLContext] = None,
      scram: Option[(String, String)] = None,
      scramSignPassword: Option[String] = None,
      scramAlgo: graft.sinks.ScramAuth.Algo = graft.sinks.ScramAuth.Sha256,
      dropResponses: Int = 0,
      partitions: Int = 1,
      responseDelayMs: Long = 0L)
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

    /** Per-(topic, partition) log of the magic-2 record batches as
      * PRODUCED (bytes kept verbatim apart from the assigned baseOffset —
      * the real broker's zero-copy model, so compressed batches
      * round-trip compressed through Fetch). Legacy magic-0/1 produces
      * are recorded in [[received]] but not fetchable. */
    private final class PartitionLog {
      val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Byte])]
      var end: Long = 0L
    }
    private val logs = new ConcurrentHashMap[(String, Int), PartitionLog]()

    private def appendLog(topic: String, partId: Int, n: Int,
        batch: Array[Byte]): Unit = {
      val log = logs.computeIfAbsent((topic, partId), _ => new PartitionLog)
      log.synchronized {
        val base = log.end
        val withOffset = batch.clone()
        // rewrite baseOffset (bytes 0-7); the batch CRC covers attributes
        // onward, so no recompute — exactly the real broker's append path
        var i = 0
        while (i < 8) {
          withOffset(i) = (base >>> (8 * (7 - i))).toByte; i += 1
        }
        log.batches += ((base, n, withOffset))
        log.end = base + n
      }
    }
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
            // a slow broker: per-request service latency, so accumulator
            // specs can prove coalescing under in-flight pressure
            if (responseDelayMs > 0) Thread.sleep(responseDelayMs)
            val f = new DataInputStream(new ByteArrayInputStream(frame))
            val apiKey = f.readShort()
            assert(apiKey == 0 || apiKey == 1 || apiKey == 3 || apiKey == 22,
              s"expected Produce/Fetch/Metadata/InitProducerId, got api_key=$apiKey")
            val version = f.readShort()
            val corr = f.readInt()
            f.skipBytes(f.readShort()) // client_id
            if (apiKey == 1) { // Fetch v4: serve the appended batches verbatim
              assert(version == 4, s"the embedded broker serves Fetch v4, got v$version")
              f.readInt() // replica_id
              f.readInt() // max_wait_ms
              f.readInt() // min_bytes
              f.readInt() // max_bytes
              f.readByte() // isolation_level
              val nT = f.readInt()
              val wants = (0 until nT).map { _ =>
                val tb = new Array[Byte](f.readShort()); f.readFully(tb)
                val t = new String(tb, StandardCharsets.UTF_8)
                val nP = f.readInt()
                t -> (0 until nP).map { _ =>
                  val p = f.readInt(); val off = f.readLong()
                  f.readInt() // partition_max_bytes
                  (p, off)
                }
              }
              val body = new java.io.ByteArrayOutputStream()
              val bo = new DataOutputStream(body)
              bo.writeInt(corr)
              bo.writeInt(0) // throttle_time_ms
              bo.writeInt(wants.size)
              wants.foreach { case (t, parts) =>
                val tb = t.getBytes(StandardCharsets.UTF_8)
                bo.writeShort(tb.length); bo.write(tb)
                bo.writeInt(parts.size)
                parts.foreach { case (p, off) =>
                  val log = logs.get((t, p))
                  val (hw, recs) =
                    if (log == null) (0L, Array.emptyByteArray)
                    else log.synchronized {
                      // serve every batch whose range reaches past the
                      // fetch offset; the consumer skips sub-offset records
                      val out = new java.io.ByteArrayOutputStream()
                      log.batches.foreach { case (base, n, bytes) =>
                        if (base + n > off) out.write(bytes)
                      }
                      (log.end, out.toByteArray)
                    }
                  bo.writeInt(p)
                  bo.writeShort(0) // error
                  bo.writeLong(hw) // high_watermark
                  bo.writeLong(hw) // last_stable_offset
                  bo.writeInt(0) // aborted_transactions: none
                  bo.writeInt(recs.length); bo.write(recs)
                }
              }
              if (!silent) { out.writeInt(body.size()); body.writeTo(out); out.flush() }
            } else if (apiKey == 3) { // Metadata v0: advertise `partitions` per topic
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
                  case c => throw new AssertionError(s"unsupported codec bits $c")
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
                case codec => throw new AssertionError(s"unsupported batch codec $codec")
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
              if (!dup && errorFor(topic) == 0) appendLog(topic, partId, n, setB)
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
}
