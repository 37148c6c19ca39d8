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
  * optionally emit statsd datagrams. Connections are POOLED: each sender
  * thread keeps one persistent broker connection (≤ pool-size sockets
  * total), authenticated once (TLS handshake + SCRAM/PLAIN per
  * connection, not per send), with correlation ids incrementing per
  * request — librdkafka's connection model. A transport failure
  * (broker restart, stale pooled socket) reconnects and resends the
  * frame ONCE; without idempotence that is at-least-once delivery
  * (librdkafka's retries>0 semantics), with [[idempotent]] the broker
  * dedups on (pid, epoch, seq) and the retry is exactly-once per
  * partition. Delivery timeouts stay terminal — never retried.
  *
  * Partitioning follows librdkafka's keyless behavior: the partition
  * count is discovered once per topic via the public Metadata API
  * (api 3, over the pooled connection) and sends round-robin across the
  * partitions; discovery failure falls back to partition 0. With
  * idempotence, sequences are kept per (topic, partition) — the KIP-98
  * dedup domain.
  *
  * `idempotent = true` (requires Produce v3 record batches) runs the
  * KIP-98 idempotent producer: InitProducerId (api 22) fetches a
  * producer id once per client, every batch carries (pid, epoch,
  * per-topic sequence), and sends to the same topic serialize (the
  * max.in.flight=1 safe mode — sequences must reach partition 0 in
  * order). A terminal delivery failure resets the producer id (the
  * KIP-98 epoch-bump analogue): the next send re-initializes under a
  * fresh pid, starting a new dedup domain rather than tripping
  * OUT_OF_ORDER_SEQUENCE forever.
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
    saslAlgo: ScramAuth.Algo = ScramAuth.Sha256,
    acks: Short = 1,
    compression: String = "none",
    apiVersion: Short = 0,
    maxMessageBytes: Int = 1000000,
    idempotent: Boolean = false,
    batchNumMessages: Int = 10000,
    lingerMs: Long = 0L,
    retries: Int = 1,
    retryBackoffMs: Long = 100L,
    queueBufferingMaxBytes: Long = 1L << 30)
    extends AutoCloseable {

  require(acks == -1 || acks == 0 || acks == 1, s"unsupported acks $acks")
  require(!idempotent || apiVersion >= 3,
    "idempotent produce needs Produce v3 record batches (KIP-98)")
  require(!idempotent || acks != 0,
    "idempotent produce needs an acknowledged send (acks=1|all)")
  require(KafkaProduceClient.Codecs.contains(compression),
    s"unsupported compression codec '$compression' " +
      s"(${KafkaProduceClient.Codecs.keys.toSeq.sorted.mkString("|")})")
  require(apiVersion == 0 || apiVersion == 2 || apiVersion == 3,
    s"unsupported Produce version $apiVersion (0|2|3)")
  // snappy/lz4/zstd ship as RECORD-BATCH codecs only (magic-2, Produce v3):
  // their magic-1 message-set framings carry legacy quirks (the xerial
  // block header, KIP-57's broken-HC frame) that modern brokers only keep
  // for compatibility, and KIP-110 made zstd v2-batches-only outright —
  // a misconfigured codec/version pair fails HERE at submit, not per task
  require(compression == "none" || compression == "gzip" || apiVersion >= 3,
    s"codec '$compression' requires Produce v3 record batches (got v$apiVersion)")
  // compressed message sets use the magic-1 wrapper-message framing, which
  // rides the v2 request; under v3 compression is a RecordBatch attribute
  // (the records section deflates in place), so v3 keeps its version
  private val effectiveVersion: Short =
    if (compression == "gzip" && apiVersion < 2) 2 else apiVersion

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

  private def count(name: String): Unit = count(name, 1L)

  private def count(name: String, n: Long): Unit = {
    counters.computeIfAbsent(name, _ => new LongAdder).add(n)
    statsd.foreach(_.counter(name, n)) // statsd counters carry a value
  }

  /** Detached send — returns immediately while under `maxInFlight`
    * queued payloads, blocks past it (the reference's bounded-channel
    * backpressure); [[flush]] awaits delivery. Completed futures are
    * discarded from the queue head here so a large partition (millions of
    * rows) does not retain millions of done FutureTasks until the
    * partition-end flush — the semaphore bounds concurrency, this bounds
    * queue length to ~maxInFlight plus out-of-order stragglers. */
  def send(topic: String, payload: String): Unit = sendBatch(topic, Seq(payload))

  /** Detached COALESCED send (librdkafka's batch.num.messages behavior —
    * the reason the reference sustains 100k+ msgs/s over one socket
    * instead of paying a round-trip per message). The bounded channel
    * counts MESSAGES: a batch larger than `maxInFlight` is chunked so
    * every buffered payload holds a real permit — the heap bound is
    * maxInFlight messages, not max(batch, maxInFlight). */
  def sendBatch(topic: String, payloads: Seq[String]): Unit = {
    payloads.grouped(math.max(1, maxInFlight)).foreach { chunk =>
      val permits = chunk.size
      slots.acquire(permits)
      var h = inFlight.peek()
      while (h != null && h.isDone && inFlight.remove(h)) h = inFlight.peek()
      inFlight.add(pool.submit(new Runnable {
        override def run(): Unit =
          try sendBatchSync(topic, chunk) finally slots.release(permits)
      }))
    }
  }

  // ------------------------------------------- producer-side accumulator

  /** Per-topic pending buffer behind [[enqueue]] — librdkafka's message
    * accumulator, where `batch.num.messages`, `linger.ms` and the
    * `queue.buffering.max.kbytes` byte bound live. */
  private final class Pending {
    val buf = new scala.collection.mutable.ArrayBuffer[String]()
    var firstNs = 0L
    var bytes = 0L
    val drainQueued = new java.util.concurrent.atomic.AtomicBoolean(false)
  }
  private val pending = new ConcurrentHashMap[String, Pending]()

  /** Total bytes held across ALL topic accumulators — the
    * queue.buffering.max.kbytes accounting (librdkafka counts the whole
    * producer queue; here the accumulator half — the detached-send half
    * is already bounded by the maxInFlight message permits, so the heap
    * ceiling is cap + maxInFlight × message.max.bytes). */
  private val accumulatedBytes = new java.util.concurrent.atomic.AtomicLong(0)

  /** UTF-8 byte length without the getBytes allocation (each payload is
    * re-encoded once more at send time; the accounting pass must not
    * double the garbage). Surrogate halves count 2 each = 4 per pair. */
  private def utf8Len(s: String): Long = {
    var n = 0L; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1 else if (c < 0x800) 2
            else if (Character.isSurrogate(c)) 2 else 3)
      i += 1
    }
    n
  }

  /** Take a topic's buffer (caller holds pb's lock), releasing its byte
    * accounting. */
  private def takeLocked(pb: Pending): Seq[String] = {
    val s = pb.buf.toSeq
    pb.buf.clear()
    accumulatedBytes.addAndGet(-pb.bytes)
    pb.bytes = 0L
    s
  }

  private val lingerTimer =
    if (lingerMs <= 0) None
    else Some {
      val t = Executors.newSingleThreadScheduledExecutor(r => {
        val th = new Thread(r, "graft-kafka-linger"); th.setDaemon(true); th
      })
      val cadence = math.max(1L, lingerMs / 2)
      t.scheduleWithFixedDelay(() => lingerSweep(),
        cadence, cadence, TimeUnit.MILLISECONDS)
      t
    }

  /** linger.ms=0 drain thread: librdkafka's linger.ms=0 still COALESCES
    * messages that queued while a send was in flight — only the *delay*
    * is zero. Buffered payloads are handed to this single drainer
    * immediately, so whatever accumulated between its turns ships as one
    * request instead of one round-trip per row. A dedicated thread (not
    * the send pool) so a permit-blocked drain can never occupy every pool
    * thread and deadlock against the queued sends holding the permits. */
  private val zeroLingerDrainer =
    if (lingerMs > 0) None
    else Some(Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-kafka-drain0"); t.setDaemon(true); t
    }))

  /** Accumulated enqueue — librdkafka's produce() contract: the payload
    * buffers per topic and SHIPS when the pending count reaches
    * `batch.num.messages`, when `linger.ms` expires on the buffer's
    * oldest message (the timer sweep), when total accumulator bytes cross
    * `queue.buffering.max.kbytes` (every buffer force-ships — the heap
    * bound), or at [[flush]]. `lingerMs <= 0` keeps coalescing on the
    * count trigger plus an immediate async drain (librdkafka's
    * linger.ms=0: zero DELAY, not zero batching). */
  def enqueue(topic: String, payload: String): Unit = {
    val pb = pending.computeIfAbsent(topic, _ => new Pending)
    val sz = utf8Len(payload) + 64 // payload + per-record framing allowance
    val ship: Seq[String] = pb.synchronized {
      if (pb.buf.isEmpty) pb.firstNs = System.nanoTime()
      pb.buf += payload
      pb.bytes += sz
      accumulatedBytes.addAndGet(sz)
      if (pb.buf.length >= batchNumMessages) takeLocked(pb) else null
    }
    if (ship != null) sendBatch(topic, ship)
    else if (accumulatedBytes.get() >= queueBufferingMaxBytes)
      // byte cap crossed: force-ship everything SYNCHRONOUSLY in this
      // thread — librdkafka BLOCKS produce() on a full queue, and the
      // block is the point: the producer stalls instead of the heap
      // growing, and a single-threaded enqueuer keeps strict send order
      drainPendingSync()
    else if (lingerMs <= 0 && pb.drainQueued.compareAndSet(false, true))
      zeroLingerDrainer.foreach(_.submit(new Runnable {
        override def run(): Unit = {
          pb.drainQueued.set(false)
          val s = pb.synchronized { if (pb.buf.nonEmpty) takeLocked(pb) else null }
          if (s != null) sendBatch(topic, s)
        }
      }))
  }

  /** Timer sweep: ship every buffer whose oldest pending message has
    * waited `lingerMs` — the time-bounded half of the coalescing contract
    * (a paced trickle must not sit in the accumulator indefinitely). */
  private def lingerSweep(): Unit =
    pending.forEach { (topic: String, pb: Pending) =>
      val ship: Seq[String] = pb.synchronized {
        if (pb.buf.nonEmpty &&
          (System.nanoTime() - pb.firstNs) / 1000000L >= lingerMs)
          takeLocked(pb)
        else null
      }
      if (ship != null) sendBatch(topic, ship)
    }

  /** Drain every pending (lingering) buffer into detached sends. */
  private def drainPending(): Unit =
    pending.forEach { (topic: String, pb: Pending) =>
      val ship: Seq[String] = pb.synchronized {
        if (pb.buf.nonEmpty) takeLocked(pb) else null
      }
      if (ship != null) sendBatch(topic, ship)
    }

  /** Drain every pending buffer with BLOCKING round-trips — the
    * queue-full path: the enqueuing thread pays the delivery latency
    * itself, which is the backpressure the byte cap exists to apply. */
  private def drainPendingSync(): Unit =
    pending.forEach { (topic: String, pb: Pending) =>
      val ship: Seq[String] = pb.synchronized {
        if (pb.buf.nonEmpty) takeLocked(pb) else null
      }
      if (ship != null) sendBatchSync(topic, ship)
    }

  /** One blocking produce round-trip with the reference's accounting. */
  def sendSync(topic: String, payload: String): Unit =
    sendBatchSync(topic, Seq(payload))

  /** Blocking coalesced round-trip: size-screens each payload, re-splits
    * the survivors into byte-bounded sub-batches, ships each as one
    * request, counts per-message submissions. */
  def sendBatchSync(topic: String, payloads: Seq[String]): Unit = {
    // librdkafka's message.max.bytes contract: an oversized payload is
    // rejected LOCALLY before any wire traffic, surfacing through the
    // same first-word error-counter scheme ("Message size too large" →
    // `producer.error.message`, collapsing with timeouts exactly as the
    // reference's split_whitespace().next() mapping does)
    val (fit, oversized) = payloads
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .partition(_.length <= maxMessageBytes)
    if (oversized.nonEmpty)
      count(Stats.kafkaProducerError(
        Stats.metricNameFor("Message size too large")), oversized.size.toLong)
    if (fit.isEmpty) return
    // brokers enforce message.max.bytes against the WHOLE message set /
    // record batch, so count-coalesced batches must ALSO split by
    // accumulated bytes (librdkafka's batch.size ceiling) — 10k
    // individually-small lines would otherwise ship as one >1MB set and
    // bounce wholesale with MESSAGE_TOO_LARGE. The estimate is the
    // UNCOMPRESSED size (librdkafka's accounting): per-record framing is
    // ≤ ~40 bytes in either wire format (magic-1 entry: 8 offset + 4 size
    // + 4 crc + 2 + 8 ts + 4 key + 4 len; magic-2 record: varints), and
    // the batch header/wrapper rides in the allowance.
    val perRecordAllowance = 64
    val headerAllowance = 512
    val byteCap = math.max(1L, maxMessageBytes.toLong - headerAllowance)
    val subs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Array[Byte]])
    var subBytes = 0L
    fit.foreach { v =>
      val w = v.length.toLong + perRecordAllowance
      if (subs.last.nonEmpty && subBytes + w > byteCap) {
        subs += scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        subBytes = 0L
      }
      subs.last += v
      subBytes += w
    }
    subs.foreach(sub => shipSubBatch(topic, sub.toSeq))
  }

  /** One sub-batch produce round-trip with the reference's accounting. */
  private def shipSubBatch(topic: String, fit: Seq[Array[Byte]]): Unit = {
    val t0 = System.nanoTime()
    try {
      // idempotent mode serializes same-partition sends (max.in.flight=1,
      // the KIP-98 safe mode): the per-partition sequence must arrive in
      // allocation order or the broker rejects the gap. The partition is
      // chosen BEFORE the lock so round-robin still spreads load.
      val code =
        if (idempotent) {
          val part = choosePartition(topic)
          topicLocks.computeIfAbsent(s"$topic/$part", _ => new Object)
            .synchronized { produceRoundTrip(topic, part, fit) }
        } else produceRoundTrip(topic, choosePartition(topic), fit)
      if (code == 0) {
        count(Stats.kafkaSubmitted(topic), fit.size.toLong)
        statsd.foreach(_.timerMs(Stats.KafkaProducerSent,
          TimeUnit.NANOSECONDS.toMillis(System.nanoTime() - t0)))
      } else count(Stats.kafkaProducerError(errcodeName(code)), fit.size.toLong)
    } catch {
      case _: SocketTimeoutException =>
        if (idempotent) resetPid() // KIP-98 epoch-bump analogue
        count(Stats.kafkaProducerError(
          Stats.metricNameFor("Message timed out")), fit.size.toLong)
      case _: Exception =>
        if (idempotent) resetPid()
        count(Stats.kafkaProducerError(
          Stats.metricNameFor("Transport failure")), fit.size.toLong)
    }
  }

  /** Drain the lingering accumulator, then await every detached send
    * issued so far. The linger-0 drainer is barriered FIRST: it is
    * single-threaded FIFO, so awaiting a no-op task proves every earlier
    * drain completed its sendBatch hand-off — otherwise a drain that had
    * already TAKEN a buffer but not yet queued the send would slip past
    * both the drainPending() and the in-flight await (message loss at the
    * batch barrier). */
  def flush(): Unit = {
    zeroLingerDrainer.foreach { d =>
      try d.submit(new Runnable { override def run(): Unit = () }).get()
      catch { case _: Exception => () } // already shut down: nothing queued
    }
    drainPending()
    var f = inFlight.poll()
    while (f != null) { try f.get() catch { case _: Exception => () }; f = inFlight.poll() }
  }

  override def close(): Unit = {
    flush()
    lingerTimer.foreach(_.shutdown())
    zeroLingerDrainer.foreach(_.shutdown())
    pool.shutdown()
    allConns.forEach(_.close())
    statsd.foreach(_.close())
  }

  // ------------------------------------------------ pooled connections

  /** One persistent, authenticated broker connection (socket + streams +
    * per-connection correlation counter). Owned by exactly one sender
    * thread at a time (ThreadLocal), so no frame interleaving is
    * possible; registered in [[allConns]] for close(). */
  private final class Conn extends AutoCloseable {
    val (socket, in, out) = {
      val plain = new Socket()
      // a connect-phase timeout is a TRANSPORT failure (broker
      // unreachable), not the delivery timeout — resurface it as such so
      // the error taxonomy matches the reference's
      try plain.connect(new InetSocketAddress(host, port), timeoutMs)
      catch {
        case e: SocketTimeoutException =>
          throw new java.net.ConnectException(s"connect timed out: ${e.getMessage}")
      }
      plain.setSoTimeout(timeoutMs)
      plain.setTcpNoDelay(true)
      val s = sslCtx.fold(plain: Socket) { ctx =>
        val ss = ctx.getSocketFactory.createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ss.setSoTimeout(timeoutMs)
        ss.setUseClientMode(true)
        ss.startHandshake() // chain-verified against the configured anchors
        ss
      }
      val i = new DataInputStream(s.getInputStream)
      val o = new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream))
      // authenticate ONCE per pooled connection (the librdkafka model),
      // not once per send
      sasl.foreach { case (u, p) => ScramAuth.authenticate(i, o, u, p, algo = saslAlgo) }
      (s, i, o)
    }
    private var corr = 0
    def nextCorr(): Int = { corr += 1; corr }
    override def close(): Unit = try socket.close() catch { case _: Exception => () }
  }

  private val allConns = new ConcurrentLinkedQueue[Conn]()
  private val localConn = new ThreadLocal[Conn]

  /** The calling thread's pooled connection, (re)opened on demand. */
  private def conn(): Conn = {
    var c = localConn.get()
    if (c == null || c.socket.isClosed) {
      c = new Conn
      allConns.add(c)
      localConn.set(c)
    }
    c
  }

  private def dropConn(): Unit = {
    val c = localConn.get()
    if (c != null) { c.close(); allConns.remove(c); localConn.set(null) }
  }

  // ------------------------------------------- idempotent-producer state

  // ------------------------------------------- partitioner (Metadata v0)

  // librdkafka's keyless-payload behavior: partition count discovered via
  // the public Metadata API (api 3) once per topic, sends round-robin
  // across the partitions. Discovery failure (old broker, transport)
  // falls back to partition 0 — the pre-partitioner behavior.
  private val partitionCounts = new ConcurrentHashMap[String, Integer]()
  private val rrCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def partitionsFor(topic: String): Int = {
    val cached = partitionCounts.get(topic)
    if (cached != null) return cached.intValue()
    val n =
      try metadataPartitions(topic)
      catch {
        case e: SocketTimeoutException => dropConn(); throw e
        case _: Exception => dropConn(); 1
      }
    partitionCounts.putIfAbsent(topic, Integer.valueOf(n))
    n
  }

  /** Metadata v0 round-trip: partition count for one topic. */
  private def metadataPartitions(topic: String): Int = {
    val c = conn()
    val clientId = "graft".getBytes(StandardCharsets.UTF_8)
    val topicB = topic.getBytes(StandardCharsets.UTF_8)
    val corr = c.nextCorr()
    c.out.writeInt(2 + 2 + 4 + (2 + clientId.length) + 4 + 2 + topicB.length)
    c.out.writeShort(3) // api_key Metadata
    c.out.writeShort(0) // v0
    c.out.writeInt(corr)
    c.out.writeShort(clientId.length); c.out.write(clientId)
    c.out.writeInt(1) // one topic
    c.out.writeShort(topicB.length); c.out.write(topicB)
    c.out.flush()
    val respSize = c.in.readInt()
    if (respSize < 4 || respSize > (1 << 20))
      throw new IllegalStateException(s"implausible Metadata response $respSize")
    if (c.in.readInt() != corr)
      throw new IllegalStateException("correlation id mismatch (Metadata)")
    val nBrokers = c.in.readInt()
    (0 until nBrokers).foreach { _ =>
      c.in.skipBytes(4) // node id
      c.in.skipBytes(c.in.readShort()) // host
      c.in.skipBytes(4) // port
    }
    val nTopics = c.in.readInt()
    var count = 1
    (0 until nTopics).foreach { _ =>
      c.in.skipBytes(2) // topic error
      val nameB = new Array[Byte](c.in.readShort()); c.in.readFully(nameB)
      val nParts = c.in.readInt()
      var p = 0
      while (p < nParts) {
        c.in.skipBytes(2 + 4 + 4) // error, partition id, leader
        c.in.skipBytes(4 * c.in.readInt()) // replicas
        c.in.skipBytes(4 * c.in.readInt()) // isr
        p += 1
      }
      if (new String(nameB, StandardCharsets.UTF_8) == topic && nParts > 0)
        count = nParts
    }
    count
  }

  // KIP-98 producer identity: fetched from the broker (InitProducerId,
  // api 22) once per client, reset after a terminal delivery failure so
  // the next send opens a fresh dedup domain instead of a sequence gap
  private val pidLock = new Object
  @volatile private var producerId: Long = -1L
  @volatile private var producerEpoch: Short = 0
  private val seqs = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
  private val topicLocks = new ConcurrentHashMap[String, Object]()

  private def resetPid(): Unit = pidLock.synchronized {
    producerId = -1L
    seqs.clear()
  }

  /** InitProducerId v0 round-trip (public KIP-98 protocol): null
    * transactional id, broker-assigned pid + epoch. */
  private def ensureProducerId(): Unit = {
    if (producerId != -1L) return
    pidLock.synchronized {
      if (producerId != -1L) return
      val c = conn()
      val clientId = "graft".getBytes(StandardCharsets.UTF_8)
      val corr = c.nextCorr()
      c.out.writeInt(2 + 2 + 4 + (2 + clientId.length) + 2 + 4)
      c.out.writeShort(22) // api_key InitProducerId
      c.out.writeShort(0)  // v0
      c.out.writeInt(corr)
      c.out.writeShort(clientId.length); c.out.write(clientId)
      c.out.writeShort(-1) // null transactional_id
      c.out.writeInt(timeoutMs) // transaction_timeout_ms
      c.out.flush()
      val respSize = c.in.readInt()
      if (respSize < 4 || respSize > (1 << 16))
        throw new IllegalStateException(s"implausible InitProducerId response $respSize")
      if (c.in.readInt() != corr)
        throw new IllegalStateException("correlation id mismatch (InitProducerId)")
      c.in.readInt() // throttle_time_ms
      val err = c.in.readShort()
      if (err != 0) throw new java.io.IOException(s"InitProducerId error $err")
      producerId = c.in.readLong()
      producerEpoch = c.in.readShort()
    }
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

  /** Messages framed for the configured version (one set entry per
    * payload — librdkafka's batch.num.messages coalescing, the reason the
    * reference sustains 100k+ msgs/s over ONE socket):
    *   - v0 → MessageSet v0 (magic 0): crc, magic, attributes, key, value;
    *   - v2 → MessageSet v1 (magic 1): adds the create-time timestamp;
    *     with gzip, the payload message set is deflated and carried as the
    *     value of a magic-1 WRAPPER message whose attributes name the codec
    *     (the classic compressed-set framing every broker still accepts).
    * Returns the full message-set bytes (offset + size + message, per
    * entry). */
  private def messageSet(values: Seq[Array[Byte]]): Array[Byte] = {
    def oneMessage(magic: Byte, attributes: Byte, value: Array[Byte],
        offset: Long): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      val mb = new DataOutputStream(body)
      mb.writeByte(magic)
      mb.writeByte(attributes)
      if (magic >= 1) mb.writeLong(System.currentTimeMillis()) // CreateTime
      mb.writeInt(-1) // null key
      mb.writeInt(value.length); mb.write(value)
      val crc = new java.util.zip.CRC32()
      crc.update(body.toByteArray)
      val out = new java.io.ByteArrayOutputStream()
      val ob = new DataOutputStream(out)
      ob.writeLong(offset)
      ob.writeInt(4 + body.size()) // crc + body
      ob.writeInt(crc.getValue.toInt)
      ob.write(body.toByteArray)
      out.toByteArray
    }
    // KIP-31 relative inner offsets: producers since 0.10 write 0..n-1
    // inside a compressed magic-1 wrapper (wrapper offset = n-1, the last
    // inner's) so the broker can offset-assign by patching the wrapper
    // alone; all-zero inner offsets force its slow deep-decompress
    // validation path on every batch. Uncompressed entries carry the same
    // index — the broker overwrites them on append either way.
    val magic: Byte = if (effectiveVersion >= 2) 1 else 0
    val plain = new java.io.ByteArrayOutputStream()
    values.zipWithIndex.foreach { case (v, i) =>
      plain.write(oneMessage(magic, 0, v, i.toLong))
    }
    val plainSet = plain.toByteArray
    if (compression != "gzip") plainSet
    else {
      val zipped = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(zipped)
      gz.write(plainSet); gz.close()
      // attributes bits 0-2: 1 = gzip
      oneMessage(1, 1, zipped.toByteArray, (values.size - 1).toLong)
    }
  }

  /** Zigzag varint (the protobuf encoding KIP-98 records use). */
  private def writeVarlong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }

  /** Magic-2 RecordBatch (KIP-98, Produce v3+): the modern on-disk/wire
    * format — one batch header (crc32c over attributes→end, idempotence
    * fields stubbed at -1 for a non-transactional producer) + varint-coded
    * records. Compression deflates the RECORDS section in place and is
    * named by attributes bits, not a wrapper message. */
  private def recordBatch(values: Seq[Array[Byte]], pid: Long = -1L,
      epoch: Short = -1, seq: Int = -1): Array[Byte] = {
    val now = System.currentTimeMillis()
    // one record per value: offsetDelta = index, timestampDelta 0,
    // null key, no headers — librdkafka's coalesced-batch shape
    val framed = new java.io.ByteArrayOutputStream()
    values.zipWithIndex.foreach { case (valueB, i) =>
      val rec = new java.io.ByteArrayOutputStream()
      rec.write(0) // record attributes
      writeVarlong(rec, 0L) // timestampDelta
      writeVarlong(rec, i.toLong) // offsetDelta
      writeVarlong(rec, -1L) // null key
      writeVarlong(rec, valueB.length.toLong)
      rec.write(valueB)
      writeVarlong(rec, 0L) // header count
      writeVarlong(framed, rec.size().toLong)
      rec.writeTo(framed)
    }
    val records =
      if (compression == "none") framed.toByteArray
      else {
        val z = new java.io.ByteArrayOutputStream()
        val cs = KafkaProduceClient.compressOut(compression, z)
        framed.writeTo(cs); cs.close()
        z.toByteArray
      }
    val attributes: Short = KafkaProduceClient.Codecs(compression)
    val section = new java.io.ByteArrayOutputStream()
    val sb = new DataOutputStream(section)
    sb.writeShort(attributes)
    sb.writeInt(values.size - 1) // lastOffsetDelta
    sb.writeLong(now); sb.writeLong(now) // base/max timestamp
    sb.writeLong(pid); sb.writeShort(epoch); sb.writeInt(seq) // KIP-98 identity
    sb.writeInt(values.size) // record count
    sb.write(records)
    val crc = new java.util.zip.CRC32C()
    crc.update(section.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    val ob = new DataOutputStream(out)
    ob.writeLong(0L) // baseOffset
    ob.writeInt(4 + 1 + 4 + section.size()) // from partitionLeaderEpoch on
    ob.writeInt(-1) // partitionLeaderEpoch
    ob.writeByte(2) // magic
    ob.writeInt(crc.getValue.toInt)
    section.writeTo(ob)
    out.toByteArray
  }

  /** Builds one complete Produce request frame (size prefix included) at
    * the configured version/acks/codec. The correlation id is patched in
    * per attempt ([[patchCorr]]) so a RESEND reuses the identical batch —
    * same (pid, epoch, seq) under idempotence — on a fresh correlation. */
  private def buildProduceFrame(topic: String, partition: Int,
      payloads: Seq[Array[Byte]], pid: Long, epoch: Short, seq: Int): Array[Byte] = {
    val clientId = "graft".getBytes(StandardCharsets.UTF_8)
    val topicB = topic.getBytes(StandardCharsets.UTF_8)
    val set =
      if (effectiveVersion >= 3) recordBatch(payloads, pid, epoch, seq)
      else messageSet(payloads)
    // v3 (KIP-98) prefixes a nullable transactional_id before acks
    val txnBytes = if (effectiveVersion >= 3) 2 else 0
    val size = 2 + 2 + 4 + (2 + clientId.length) + // header
      txnBytes + 2 + 4 + // [transactional_id] + acks + timeout
      4 + (2 + topicB.length) + 4 + // topic array
      4 + 4 + set.length // partition + set size + set
    val buf = new java.io.ByteArrayOutputStream(4 + size)
    val out = new DataOutputStream(buf)
    out.writeInt(size)
    out.writeShort(0) // api_key Produce
    out.writeShort(effectiveVersion)
    out.writeInt(0) // correlation id — patched per attempt
    out.writeShort(clientId.length); out.write(clientId)
    if (effectiveVersion >= 3) out.writeShort(-1) // null transactional_id
    out.writeShort(acks)
    out.writeInt(timeoutMs)
    out.writeInt(1) // one topic
    out.writeShort(topicB.length); out.write(topicB)
    out.writeInt(1) // one partition entry
    out.writeInt(partition)
    out.writeInt(set.length)
    out.write(set)
    buf.toByteArray
  }

  /** Correlation id sits at a fixed offset: size(4) + api_key(2) +
    * version(2). */
  private def patchCorr(frame: Array[Byte], corr: Int): Unit = {
    frame(8) = (corr >> 24).toByte; frame(9) = (corr >> 16).toByte
    frame(10) = (corr >> 8).toByte; frame(11) = corr.toByte
  }

  /** One produce exchange over the thread's pooled connection, with ONE
    * reconnect-and-resend on a transport error (stale pooled socket,
    * broker restart). Returns the partition error code (acks=0 is
    * fire-and-forget — no response exists to read). Delivery timeouts
    * propagate without retry — a slow broker must surface as the timeout
    * counter, never as a duplicate-risking resend. */
  /** Keyless-partitioner: round-robin over the discovered count. */
  private def choosePartition(topic: String): Int = {
    val n = partitionsFor(topic)
    if (n <= 1) 0 else (rrCounter.getAndIncrement() % n).toInt
  }

  private def produceRoundTrip(topic: String, partition: Int,
      payloads: Seq[Array[Byte]]): Int = {
    if (idempotent)
      try ensureProducerId()
      catch { // a stale pooled connection can surface here too — once
        case _: java.io.IOException => dropConn(); ensureProducerId()
      }
    // the frame is built ONCE: an idempotent retry must resend the SAME
    // (pid, epoch, seq) so the broker's dedup window absorbs the
    // ambiguous first attempt — rebuilding would mint a fresh sequence
    // and turn the retry into a duplicate
    val frame =
      if (idempotent) {
        // KIP-98: the base sequence covers the whole batch; the next batch
        // starts at base + recordCount
        val s = seqs.computeIfAbsent(s"$topic/$partition",
          _ => new java.util.concurrent.atomic.AtomicInteger(0))
        buildProduceFrame(topic, partition, payloads, producerId,
          producerEpoch, s.getAndAdd(payloads.size))
      } else buildProduceFrame(topic, partition, payloads, -1L, -1, -1)
    // librdkafka's retry policy (`retries`/`message.send.max.retries` +
    // `retry.backoff.ms`, bounded overall by the send timeout — its
    // message.timeout.ms role): TRANSPORT failures and RETRIABLE broker
    // codes resend the identical frame — at-least-once without
    // idempotence, exactly-once per partition with it (broker dedups the
    // seq). Delivery timeouts stay terminal — never retried.
    val deadlineNs = System.nanoTime() + timeoutMs * 1000000L
    var retriesLeft = retries
    def mayRetry(): Boolean =
      retriesLeft > 0 && System.nanoTime() < deadlineNs && {
        retriesLeft -= 1
        if (retryBackoffMs > 0) Thread.sleep(retryBackoffMs)
        true
      }
    while (true) {
      val code =
        try exchange(frame)
        catch {
          case e: SocketTimeoutException => dropConn(); throw e
          case e: java.io.IOException =>
            dropConn()
            if (!mayRetry()) throw e
            -1 // retry sentinel
          case e: Exception => dropConn(); throw e
        }
      if (code >= 0 && !(KafkaProduceClient.RetriableCodes(code) && mayRetry()))
        return code
    }
    0 // unreachable
  }

  /** Writes one frame on the pooled connection and reads its response. */
  private def exchange(frame: Array[Byte]): Int = {
    val c = conn()
    patchCorr(frame, c.nextCorr())
    c.out.write(frame)
    c.out.flush()
    // acks=0: the broker sends nothing back — delivery is handed to the
    // transport and the only observable failures are connection-level
    if (acks == 0) return 0
    val in = c.in
    val respSize = in.readInt()
    if (respSize < 4 || respSize > (1 << 20))
      throw new IllegalStateException(s"implausible produce response size $respSize")
    val corrSeen = in.readInt()
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
        in.skipBytes(8) // base offset
        if (effectiveVersion >= 2) in.skipBytes(8) // log_append_time
        if (err == 0) err = e
        p += 1
      }
      t += 1
    }
    // v1+ responses end with throttle_time_ms — MUST be consumed on a
    // pooled connection or the next response misparses
    if (effectiveVersion >= 1) in.readInt()
    // corr checked AFTER draining the frame so a mismatch doesn't leave
    // unread bytes behind
    if (corrSeen != frameCorr(frame))
      throw new IllegalStateException("correlation id mismatch")
    err
  }

  private def frameCorr(frame: Array[Byte]): Int =
    ((frame(8) & 0xff) << 24) | ((frame(9) & 0xff) << 16) |
      ((frame(10) & 0xff) << 8) | (frame(11) & 0xff)
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

  /** librdkafka-style conf → acks: the `acks` key (alias
    * `request.required.acks`), accepting librdkafka's `all` spelling for
    * -1. Default 1 — librdkafka's classic default and the reference's
    * effective setting. */
  def acksFromConf(conf: Map[String, String]): Short = {
    val raw = conf.get("acks")
      .orElse(conf.get("request.required.acks")).getOrElse("1")
    raw.trim.toLowerCase match {
      case "all" | "-1" => -1
      case "0"          => 0
      case "1"          => 1
      case other => throw new IllegalArgumentException(
        s"unsupported acks '$other' (0|1|all)")
    }
  }

  /** librdkafka-style conf → Produce version: librdkafka negotiates the
    * newest supported format via ApiVersions and falls back to
    * `broker.version.fallback` when the probe is unavailable; this client
    * doesn't negotiate, so the fallback key IS the dispatch — ≥0.11 speaks
    * v3 (magic-2 record batches, KIP-98), ≥0.10 v2 (magic-1 timestamped
    * message sets), older brokers v0. Absent → v0, the most compatible. */
  def produceVersionFromConf(conf: Map[String, String]): Short = {
    val raw = conf.get("broker.version.fallback").map(_.trim).getOrElse(return 0)
    val parts = raw.split("\\.").take(2).map(p =>
      p.takeWhile(_.isDigit) match { case "" => 0; case d => d.toInt })
    val (maj, min) = (parts.headOption.getOrElse(0),
      if (parts.length > 1) parts(1) else 0)
    if (maj > 0 || min >= 11) 3
    else if (min >= 10) 2
    else 0
  }

  /** librdkafka-style conf → compression codec: `compression.codec`
    * (alias `compression.type`). Gzip is the JDK-native codec this client
    * implements; the other librdkafka codecs need native libs and fail
    * loudly rather than silently sending uncompressed. */
  def compressionFromConf(conf: Map[String, String]): String = {
    val c = conf.get("compression.codec")
      .orElse(conf.get("compression.type")).getOrElse("none").trim.toLowerCase
    if (Codecs.contains(c)) c
    else throw new IllegalArgumentException(
      s"unsupported compression.codec '$c' " +
        s"(${Codecs.keys.toSeq.sorted.mkString("|")})")
  }

  /** librdkafka `message.max.bytes` (default 1000000, the librdkafka
    * default): payloads above it are rejected locally with the producer
    * error counter, never sent. */
  def maxMessageBytesFromConf(conf: Map[String, String]): Int =
    conf.get("message.max.bytes").map(_.trim.toInt).getOrElse(1000000)

  /** librdkafka `batch.num.messages` (default 10000, the librdkafka
    * default): how many same-topic payloads the sink coalesces into one
    * Produce request. 1 restores a round-trip per message. */
  def batchNumMessagesFromConf(conf: Map[String, String]): Int =
    math.max(1, conf.get("batch.num.messages").map(_.trim.toInt).getOrElse(10000))

  /** librdkafka `linger.ms` (alias `queue.buffering.max.ms`, default 5 —
    * librdkafka's): how long a partial batch may wait in the accumulator
    * for more messages before it ships anyway. 0 disables lingering
    * (every enqueue ships immediately). */
  def lingerMsFromConf(conf: Map[String, String]): Long =
    math.max(0L, conf.get("linger.ms")
      .orElse(conf.get("queue.buffering.max.ms"))
      .map(_.trim.toLong).getOrElse(5L))

  /** librdkafka `queue.buffering.max.kbytes` (default 1048576 KiB =
    * 1 GiB, librdkafka's default): total bytes the producer accumulator
    * may hold across all topics; crossing it force-ships every pending
    * buffer, so a burst of large payloads is heap-bounded by the cap
    * plus the in-flight permits rather than
    * batch.num.messages × topics × payload. */
  def queueBufferingMaxBytesFromConf(conf: Map[String, String]): Long =
    math.max(1L, conf.get("queue.buffering.max.kbytes")
      .map(_.trim.toLong).getOrElse(1048576L)) * 1024L

  /** librdkafka `retries` (alias `message.send.max.retries`): resend
    * budget for transport failures and retriable broker codes. Default 2
    * (classic librdkafka) — the overall send deadline (timeoutMs, the
    * message.timeout.ms role) bounds the attempts either way. */
  def retriesFromConf(conf: Map[String, String]): Int =
    math.max(0, conf.get("retries")
      .orElse(conf.get("message.send.max.retries"))
      .map(_.trim.toInt).getOrElse(2))

  /** librdkafka `retry.backoff.ms` (default 100): pause before a resend. */
  def retryBackoffMsFromConf(conf: Map[String, String]): Long =
    math.max(0L, conf.get("retry.backoff.ms").map(_.trim.toLong).getOrElse(100L))

  /** Produce error codes a resend can fix (public protocol):
    * LEADER_NOT_AVAILABLE(5), NOT_LEADER_FOR_PARTITION(6),
    * REQUEST_TIMED_OUT(7) — the retriable set librdkafka resends on. */
  val RetriableCodes: Set[Int] = Set(5, 6, 7)

  /** librdkafka `enable.idempotence` (default false, as librdkafka's):
    * true runs the KIP-98 idempotent producer — which needs record
    * batches, so the version/acks requirements fail at construction if
    * the rest of the conf contradicts it. */
  def idempotenceFromConf(conf: Map[String, String]): Boolean =
    conf.get("enable.idempotence").exists(_.trim.equalsIgnoreCase("true"))

  /** Codec → RecordBatch attributes bits 0-2 (KIP-98; gzip also valid as
    * the magic-1 wrapper codec on Produce v0/v2). */
  val Codecs: Map[String, Short] =
    Map("none" -> 0, "gzip" -> 1, "snappy" -> 2, "lz4" -> 3, "zstd" -> 4)

  /** The compression stream each codec's records section runs through —
    * the same stream implementations Kafka's own clients use (xerial
    * block stream for snappy, LZ4 frame format, zstd frames), all already
    * on the Spark classpath. */
  private[sinks] def compressOut(codec: String,
      out: java.io.OutputStream): java.io.OutputStream = codec match {
    case "gzip"   => new java.util.zip.GZIPOutputStream(out)
    case "snappy" => new org.xerial.snappy.SnappyOutputStream(out)
    case "lz4"    => new net.jpountz.lz4.LZ4FrameOutputStream(out)
    case "zstd"   => new com.github.luben.zstd.ZstdOutputStream(out)
    case other    => throw new IllegalArgumentException(s"no stream for '$other'")
  }

  /** The inverse streams, keyed by RecordBatch attributes bits 0-2 — the
    * consumer ([[graft.sources.KafkaFetchClient]]) decompresses fetched
    * batches through exactly the codecs the producer wrote with. */
  private[graft] def compressIn(codecBits: Int,
      in: java.io.InputStream): java.io.InputStream = codecBits match {
    case 0 => in
    case 1 => new java.util.zip.GZIPInputStream(in)
    case 2 => new org.xerial.snappy.SnappyInputStream(in)
    case 3 => new net.jpountz.lz4.LZ4FrameInputStream(in)
    case 4 => new com.github.luben.zstd.ZstdInputStream(in)
    case c => throw new IllegalArgumentException(s"no stream for codec bits $c")
  }
}
