package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Optional
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import javax.net.ssl.{KeyManagerFactory, SSLContext}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReportsSourceMetrics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-syslog` — a DataSource V2 micro-batch streaming source that IS the
  * reference's front door: a TCP (optionally TLS) *server* accepting client
  * connections and splitting each byte stream on newlines
  * (reference: src/serve/mod.rs:73-172 accept loop, src/serve/plain.rs:4-6,
  * src/connection.rs:69-85 `reader.lines()`; TLS handshake-then-same-loop
  * src/serve/tls.rs:41-69). Spark's built-in `socket` source is the opposite
  * shape (a client that dials out) and has no TLS.
  *
  * Output schema: a single `line: string` column — feed it straight into
  * [[graft.streaming.GraftPipeline.transform]].
  *
  * Options:
  *   - `port` (default 1514; 0 = ephemeral) and `host` (default 0.0.0.0)
  *   - `tls.cert`, `tls.key` — PEM server certificate chain + private key;
  *     both set ⇒ TLS on. Key may be PKCS#8 ("BEGIN PRIVATE KEY") or PKCS#1
  *     RSA ("BEGIN RSA PRIVATE KEY"), exactly the two the reference accepts
  *     (src/serve/tls.rs:106-124); anything else, or a file with more or
  *     fewer than one key block, fails with the reference's error text.
  *   - `tls.ca` — rejected, as in the reference (src/serve/tls.rs:82-83).
  *   - `name` — registers the bound port in [[SyslogSocketSource.boundPort]]
  *     so harnesses can use an ephemeral port without racing.
  *   - `numPartitions` — read-side split of each micro-batch slice.
  *   - `maxBufferedLines` (default 2²⁰) — driver buffer cap; past it the
  *     connection reader threads block, so TCP flow control backpressures
  *     the senders (the reference's bounded-channel behavior,
  *     src/sink/kafka.rs:224-226) instead of the heap growing unboundedly.
  *
  * Delivery semantics: lines are buffered on the driver from the accept
  * threads; a micro-batch is the buffered slice between two counter offsets,
  * and `commit(end)` trims everything below `end`. Once a batch is planned
  * it is replayable (the slice ships inside the InputPartitions), so sink
  * checkpointing gives exactly-once downstream — strictly stronger than the
  * reference's best-effort detached produces (SURVEY.md §7.5) — WITHIN one
  * source instance's lifetime. What a TCP stream cannot give is replay of
  * data the PROCESS never durably owned: lines still in the driver buffer
  * when the driver dies are lost, the same loss window as the reference's
  * in-memory channel. Offsets carry the instance epoch, so a restart from
  * checkpoint fails loudly at replan (see [[SyslogOffset]]) rather than
  * silently aliasing a dead instance's counters onto the fresh buffer. At 100 TB the ingest
  * tier is many of these sources (or a durable bus like Kafka) in front of
  * the one logical pipeline; this source is the protocol-fidelity entry.
  */
object SyslogSocketSource {
  val Schema: StructType = StructType(Seq(StructField("line", StringType, nullable = false)))

  /** name-option → bound listener port, for ephemeral-port tests/harnesses. */
  private val registry = new ConcurrentHashMap[String, Integer]()
  def boundPort(name: String): Option[Int] = Option(registry.get(name)).map(_.intValue())
  private[sources] def register(name: String, port: Int): Unit = registry.put(name, port)
}

// ---------------------------------------------------------------- PEM / TLS

/** Minimal PEM material loading on the public JDK only — cert chain via
  * CertificateFactory, keys via PKCS8EncodedKeySpec; PKCS#1 RSA keys are
  * DER-wrapped into PKCS#8 (outer SEQUENCE { v0, rsaEncryption AlgId,
  * OCTET STRING pkcs1 }) rather than hand-parsed. Mirrors
  * src/serve/tls.rs:73-124 including its failure modes.
  */
private[graft] object Pem {
  private def blocks(path: String, label: String): Seq[Array[Byte]] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.US_ASCII)
    val re = ("(?s)-----BEGIN " + label + "-----(.*?)-----END " + label + "-----").r
    re.findAllMatchIn(text).map { m =>
      java.util.Base64.getMimeDecoder.decode(m.group(1))
    }.toSeq
  }

  def readCerts(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val certs = blocks(path, "CERTIFICATE").map { der =>
      cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
    }
    if (certs.isEmpty) throw new IllegalArgumentException(s"Failed to load certs: $path")
    certs
  }

  /** DER length prefix for a value of `n` bytes. */
  private def derLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else {
      val b = BigInt(n).toByteArray.dropWhile(_ == 0)
      (0x80 | b.length).toByte +: b
    }

  private def derWrap(tag: Int, content: Array[Byte]): Array[Byte] =
    tag.toByte +: (derLen(content.length) ++ content)

  /** PKCS#1 RSAPrivateKey → PKCS#8 PrivateKeyInfo (rsaEncryption OID). */
  private def pkcs1ToPkcs8(pkcs1: Array[Byte]): Array[Byte] = {
    val version = Array[Byte](0x02, 0x01, 0x00) // INTEGER 0
    // AlgorithmIdentifier: SEQUENCE { OID 1.2.840.113549.1.1.1, NULL }
    val algId = derWrap(0x30,
      Array[Byte](0x06, 0x09, 0x2a, 0x86.toByte, 0x48, 0x86.toByte,
        0xf7.toByte, 0x0d, 0x01, 0x01, 0x01, 0x05, 0x00))
    derWrap(0x30, version ++ algId ++ derWrap(0x04, pkcs1))
  }

  /** Loads the single private key in `path` — RSA (PKCS#1) or PKCS#8, the
    * two formats the reference accepts; 0 or >1 key blocks is an error
    * (src/serve/tls.rs:112-123). */
  def readKey(path: String): PrivateKey = {
    val pkcs8 = blocks(path, "PRIVATE KEY").map(identity)
    val pkcs1 = blocks(path, "RSA PRIVATE KEY").map(pkcs1ToPkcs8)
    val ec = blocks(path, "EC PRIVATE KEY")
    if (ec.nonEmpty)
      throw new IllegalArgumentException(
        s"Failed to load keys properly found SEC1 EC key (use PKCS#8): $path")
    val all = pkcs8 ++ pkcs1
    if (all.size != 1)
      throw new IllegalArgumentException(
        s"Failed to load keys properly, ${all.size} found: $path")
    val spec = new PKCS8EncodedKeySpec(all.head)
    Seq("RSA", "EC", "DSA").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: Exception => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"TLS key could not be properly loaded! This is fatal!: $path"))
  }

  /** Client SSLContext trusting a PEM CA/cert bundle — the librdkafka
    * `ssl.ca.location` contract the reference passes through to its Kafka
    * producer (src/sink/kafka.rs:63-84): the named certs are the trust
    * anchors for broker verification. Empty path → the JVM default trust
    * store (public-CA brokers). */
  def clientContext(caCertPath: String): SSLContext =
    if (caCertPath.isEmpty) SSLContext.getDefault
    else {
      val ks = KeyStore.getInstance("PKCS12")
      ks.load(null, null)
      readCerts(caCertPath).zipWithIndex.foreach { case (c, i) =>
        ks.setCertificateEntry(s"ca-$i", c)
      }
      val tmf = javax.net.ssl.TrustManagerFactory
        .getInstance(javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, new SecureRandom())
      ctx
    }

  /** Server SSLContext from a PEM cert chain + key (no client auth,
    * src/serve/tls.rs:93-97). */
  def serverContext(certPath: String, keyPath: String): SSLContext = {
    val certs = readCerts(certPath)
    val key = readKey(keyPath)
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("server", key, Array.emptyCharArray, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, new SecureRandom())
    ctx
  }
}

// ------------------------------------------------------------- line server

/** Driver-side accept loop + per-connection reader threads (the Spark analog
  * of the reference's per-connection smol tasks, src/serve/mod.rs:142-167).
  * Received lines land in an offset-addressed buffer the micro-batch planner
  * slices.
  */
private[sources] final class LineServer(host: String, port: Int,
    ssl: Option[SSLContext], maxBufferedLines: Int = LineServer.DefaultMaxBuffered) {
  /** Instance identity, stamped into every offset this instance plans. A
    * restarted driver gets a NEW epoch, so offsets checkpointed by a
    * previous instance can never silently alias into this instance's
    * (fresh, near-empty) buffer — replanning them fails loudly instead
    * (a TCP stream cannot replay data a dead process never durably owned). */
  val epoch: Long = System.nanoTime()
  private val server: ServerSocket = ssl match {
    case Some(ctx) => ctx.getServerSocketFactory.createServerSocket()
    case None => new ServerSocket()
  }
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress(host, port))

  def boundPort: Int = server.getLocalPort

  private val lines = ArrayBuffer.empty[String]
  private var base = 0L // offset of lines(0)
  @volatile private var closed = false
  /** `connections` gauge (src/serve/mod.rs:149-162). */
  val activeConnections = new AtomicInteger(0)
  val totalLines = new AtomicInteger(0)

  /** Bounded append with BLOCKING backpressure: past the cap the reader
    * thread waits (so the client's socket send buffer fills and TCP flow
    * control pushes back on the sender — the same effect as the reference's
    * bounded channel, src/sink/kafka.rs:224-226) instead of growing the
    * driver heap without limit. `trim` (micro-batch commit) wakes waiters.
    * Returns false if the server closed while waiting. */
  private def append(line: String): Boolean = lines.synchronized {
    while (lines.size >= maxBufferedLines && !closed) lines.wait(100)
    if (closed) false
    else { lines += line; true }
  }

  private def handle(sock: Socket): Unit = {
    activeConnections.incrementAndGet()
    try {
      val r = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      var line = r.readLine()
      while (line != null && !closed && append(line)) {
        totalLines.incrementAndGet()
        line = r.readLine()
      }
    } catch {
      case _: java.io.IOException => () // connection reset — drop, as the reference logs+continues
    } finally {
      activeConnections.decrementAndGet()
      try sock.close() catch { case _: Exception => () }
    }
  }

  private val acceptor = new Thread(() => {
    try {
      while (!closed) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"graft-syslog-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      }
    } catch {
      case _: SocketException => () // closed
    }
  }, s"graft-syslog-accept-$boundPort")
  acceptor.setDaemon(true)
  acceptor.start()

  def latest: Long = lines.synchronized { base + lines.size }

  def slice(from: Long, until: Long): Array[String] = lines.synchronized {
    require(from >= base,
      s"offsets [$from, $until) no longer buffered (trimmed below $base); " +
        "a TCP stream cannot replay data from before this source instance started")
    // an upper bound past the buffer would silently plan a short (wrong)
    // batch — that can only mean offsets from a different instance/epoch
    require(until <= base + lines.size,
      s"offsets [$from, $until) exceed the buffered range " +
        s"[$base, ${base + lines.size}); these offsets were not planned by " +
        "this source instance — a TCP stream cannot replay them")
    lines.slice((from - base).toInt, (until - base).toInt).toArray
  }

  def trim(until: Long): Unit = lines.synchronized {
    if (until > base) {
      lines.dropInPlace((until - base).toInt)
      base = until
      lines.notifyAll() // wake readers blocked on the buffer cap
    }
  }

  def close(): Unit = {
    closed = true
    lines.synchronized { lines.notifyAll() }
    try server.close() catch { case _: Exception => () }
  }
}

private[sources] object LineServer {
  /** Default buffer cap (lines). The reference bounds its in-memory channel
    * at 1024 messages (src/sink/kafka.rs:224-226); a micro-batch buffer
    * amortizes over the trigger interval, so the default is larger but
    * still a hard bound on driver heap. */
  val DefaultMaxBuffered: Int = 1 << 20
}

// ------------------------------------------------------------------ DSv2

class SyslogSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-syslog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyslogSocketSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyslogTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class SyslogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-syslog(${options.getOrDefault("host", "0.0.0.0")}:${options.getOrDefault("port", "1514")})"
  override def schema(): StructType = SyslogSocketSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SyslogSocketSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SyslogMicroBatchStream(options)
      }
    }
}

/** Counter offset stamped with the owning instance's epoch. The json form
  * `"<epoch>:<n>"` survives checkpointing; a legacy bare-counter form
  * (pre-epoch checkpoints) deserializes with epoch 0, which can never match
  * a live instance — both restart cases fail loudly at replan instead of
  * silently aliasing a dead instance's counters onto this instance's
  * buffer. */
private[sources] case class SyslogOffset(epoch: Long, n: Long) extends Offset {
  override def json(): String = s"$epoch:$n"
}

private[sources] object SyslogOffset {
  def parse(json: String): SyslogOffset = json.split(":", 2) match {
    case Array(e, n) => SyslogOffset(e.toLong, n.toLong)
    case Array(n) => SyslogOffset(0L, n.toLong) // legacy pre-epoch checkpoint
  }
}

private[sources] class SyslogMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with ReportsSourceMetrics {
  private val host = options.getOrDefault("host", "0.0.0.0")
  private val port = options.getInt("port", 1514)
  private val numPartitions = options.getInt("numPartitions", 4)

  private val ssl: Option[SSLContext] = {
    val cert = Option(options.get("tls.cert"))
    val key = Option(options.get("tls.key"))
    if (options.containsKey("tls.ca"))
      // src/serve/tls.rs:82-83
      throw new IllegalArgumentException(
        "Using a custom Certificate Authority is not currently supported!")
    (cert, key) match {
      case (Some(c), Some(k)) => Some(Pem.serverContext(c, k))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "TLS requires both tls.cert and tls.key")
    }
  }

  private val server = new LineServer(host, port, ssl,
    options.getInt("maxBufferedLines", LineServer.DefaultMaxBuffered))
  Option(options.get("name")).foreach(SyslogSocketSource.register(_, server.boundPort))

  /** Offsets from another instance (a restart from checkpoint) must never
    * alias into this instance's buffer — fail with the restart story, not
    * an index error. */
  private def own(o: Offset): SyslogOffset = {
    val so = o.asInstanceOf[SyslogOffset]
    if (so.epoch != server.epoch)
      throw new IllegalStateException(
        s"graft-syslog offset epoch ${so.epoch} does not match this source " +
          s"instance (${server.epoch}): offsets were checkpointed by a " +
          "previous driver instance, and a TCP stream cannot replay data a " +
          "dead process never durably owned. Clear the checkpoint (accepting " +
          "the loss window) or front the pipeline with a durable bus.")
    so
  }

  override def initialOffset(): Offset = SyslogOffset(server.epoch, 0L)
  override def latestOffset(): Offset = SyslogOffset(server.epoch, server.latest)
  override def deserializeOffset(json: String): Offset = SyslogOffset.parse(json)
  override def commit(end: Offset): Unit = server.trim(own(end).n)
  override def stop(): Unit = server.close()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = own(start).n
    val e = own(end).n
    val slice = server.slice(s, e)
    if (slice.isEmpty) Array.empty
    else slice.grouped(math.max(1, (slice.length + numPartitions - 1) / numPartitions))
      .map(chunk => SyslogInputPartition(chunk): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[SyslogInputPartition].lines
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(rows(i)))
        override def close(): Unit = ()
      }
    }

  /** Surfaces the reference's `connections` gauge and `lines` counter
    * (src/status.rs:45-50) in StreamingQueryProgress.sources[].metrics. */
  override def metrics(latestConsumedOffset: Optional[Offset]): java.util.Map[String, String] =
    Map(
      "connections" -> server.activeConnections.get().toString,
      "lines" -> server.totalLines.get().toString).asJava
}

private[sources] case class SyslogInputPartition(lines: Array[String]) extends InputPartition
