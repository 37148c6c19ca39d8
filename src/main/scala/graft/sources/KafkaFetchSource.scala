package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal Kafka *consumer* wire client — the read half the produce-only
  * reference daemon never needed (src/sink/kafka.rs is produce-only), but
  * the natural completion of graft's wire story: with it, the oracle gate
  * can assert a full produce→consume round trip against a broker instead
  * of trusting the producer's own accounting.
  *
  * Speaks the public protocol with no client library, mirroring
  * [[graft.sinks.KafkaProduceClient]]'s discipline:
  *
  *   - Metadata v0 (api 3) for partition discovery;
  *   - Fetch v4 (api 1) — the first version that serves magic-2
  *     RecordBatches natively — parsing crc32c-verified batch headers and
  *     varint-encoded records, decompressing gzip/snappy/lz4/zstd record
  *     sections through the same codec streams the producer writes with;
  *   - the high watermark from each response bounds the read, so a batch
  *     scan is a SNAPSHOT: records appended after planning are excluded.
  *
  * TLS (`tlsCaCert`, PEM trust anchors — `Some("")` = JVM default store)
  * and SASL SCRAM/PLAIN (`sasl`, authenticated once per connection)
  * compose exactly as on the produce path — the same deployment contract
  * on both halves of the wire story.
  */
final class KafkaFetchClient(broker: String, timeoutMs: Int = 30000,
    tlsCaCert: Option[String] = None,
    sasl: Option[(String, String)] = None,
    saslAlgo: graft.sinks.ScramAuth.Algo = graft.sinks.ScramAuth.Sha256)
    extends AutoCloseable {
  private val (host, port) = broker.lastIndexOf(':') match {
    case -1 => (broker, 9092)
    case i  => (broker.substring(0, i), broker.substring(i + 1).toInt)
  }

  private val socket: Socket = {
    val plain = new Socket()
    plain.connect(new InetSocketAddress(host, port), timeoutMs)
    plain.setSoTimeout(timeoutMs)
    plain.setTcpNoDelay(true)
    tlsCaCert.map(Pem.clientContext) match {
      case None => plain
      case Some(ctx) =>
        val ss = ctx.getSocketFactory.createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ss.setSoTimeout(timeoutMs)
        ss.setUseClientMode(true)
        ss.startHandshake() // chain-verified against the configured anchors
        ss
    }
  }
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(socket.getOutputStream))
  // authenticate ONCE per connection, before any fetch traffic
  sasl.foreach { case (u, p) =>
    graft.sinks.ScramAuth.authenticate(in, out, u, p, algo = saslAlgo)
  }
  private var corr = 0

  private def header(o: DataOutputStream, apiKey: Short, version: Short): Int = {
    corr += 1
    o.writeShort(apiKey); o.writeShort(version); o.writeInt(corr)
    val cid = "graft-fetch".getBytes(StandardCharsets.UTF_8)
    o.writeShort(cid.length); o.write(cid)
    corr
  }

  private def roundTrip(body: java.io.ByteArrayOutputStream,
      expectCorr: Int): DataInputStream = {
    out.writeInt(body.size()); body.writeTo(out); out.flush()
    val resp = new Array[Byte](in.readInt())
    in.readFully(resp)
    val r = new DataInputStream(new ByteArrayInputStream(resp))
    val c = r.readInt()
    require(c == expectCorr, s"correlation mismatch: $c != $expectCorr")
    r
  }

  /** Partition count for `topic` via Metadata v0. */
  def partitionCount(topic: String): Int = {
    val body = new java.io.ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    val c = header(o, 3, 0)
    val tb = topic.getBytes(StandardCharsets.UTF_8)
    o.writeInt(1); o.writeShort(tb.length); o.write(tb)
    val r = roundTrip(body, c)
    val nBrokers = r.readInt()
    (0 until nBrokers).foreach { _ =>
      r.readInt(); r.skipBytes(r.readShort()); r.readInt()
    }
    val nTopics = r.readInt()
    require(nTopics == 1, s"expected 1 topic in metadata, got $nTopics")
    r.readShort() // topic error
    r.skipBytes(r.readShort()) // name
    r.readInt() // partition count ← the answer, but walk for validity
  }

  /** One Fetch v4 round trip: (highWatermark, records at offset ≥ `offset`
    * as (absoluteOffset, value)). */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 8 << 20): (Long, Seq[(Long, String)]) = {
    val body = new java.io.ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    val c = header(o, 1, 4)
    o.writeInt(-1) // replica_id: consumer
    o.writeInt(500) // max_wait_ms
    o.writeInt(1) // min_bytes
    o.writeInt(maxBytes)
    o.writeByte(0) // isolation_level: read_uncommitted
    val tb = topic.getBytes(StandardCharsets.UTF_8)
    o.writeInt(1); o.writeShort(tb.length); o.write(tb)
    o.writeInt(1); o.writeInt(partition); o.writeLong(offset); o.writeInt(maxBytes)
    val r = roundTrip(body, c)
    r.readInt() // throttle_time_ms
    val nT = r.readInt()
    require(nT == 1, s"expected 1 topic in fetch response, got $nT")
    r.skipBytes(r.readShort()) // topic name
    val nP = r.readInt()
    require(nP == 1, s"expected 1 partition in fetch response, got $nP")
    r.readInt() // partition index
    val err = r.readShort()
    require(err == 0, s"fetch error code $err for $topic/$partition")
    val hw = r.readLong()
    r.readLong() // last_stable_offset
    val nAborted = r.readInt()
    (0 until nAborted).foreach { _ => r.readLong(); r.readLong() }
    val recs = new Array[Byte](r.readInt())
    r.readFully(recs)
    (hw, parseBatches(recs, offset))
  }

  private def readVarlong(ms: DataInputStream): Long = {
    var z = 0L; var shift = 0; var b = 0
    do {
      b = ms.readUnsignedByte()
      z |= (b & 0x7fL) << shift; shift += 7
    } while ((b & 0x80) != 0)
    (z >>> 1) ^ -(z & 1) // un-zigzag
  }

  /** Walk concatenated magic-2 RecordBatches, crc-verified, codec by batch
    * attributes; emit records at absolute offset ≥ `from`. */
  private def parseBatches(blob: Array[Byte], from: Long): Seq[(Long, String)] = {
    val outRecs = ArrayBuffer.empty[(Long, String)]
    val ms = new DataInputStream(new ByteArrayInputStream(blob))
    while (ms.available() >= 12) {
      val baseOffset = ms.readLong()
      val batchLen = ms.readInt()
      if (ms.available() < batchLen) return outRecs.toSeq // truncated tail
      ms.readInt() // partitionLeaderEpoch
      val magic = ms.readByte()
      require(magic == 2, s"fetch consumer reads magic-2 batches, got $magic")
      val crc = ms.readInt()
      val section = new Array[Byte](batchLen - 9)
      ms.readFully(section)
      val c = new java.util.zip.CRC32C(); c.update(section)
      require(c.getValue.toInt == crc, "record batch crc32c mismatch on fetch")
      val sec = new DataInputStream(new ByteArrayInputStream(section))
      val attributes = sec.readShort()
      sec.readInt() // lastOffsetDelta
      sec.readLong(); sec.readLong() // timestamps
      sec.readLong(); sec.readShort(); sec.readInt() // pid/epoch/baseSeq
      val n = sec.readInt()
      val raw = new Array[Byte](sec.available()); sec.readFully(raw)
      val records = graft.sinks.KafkaProduceClient
        .compressIn(attributes & 7, new ByteArrayInputStream(raw)).readAllBytes()
      val rs = new DataInputStream(new ByteArrayInputStream(records))
      (0 until n).foreach { _ =>
        readVarlong(rs) // record length
        rs.readByte() // record attributes
        readVarlong(rs) // timestamp delta
        val offsetDelta = readVarlong(rs)
        val keyLen = readVarlong(rs)
        if (keyLen >= 0) rs.skipBytes(keyLen.toInt)
        val vb = new Array[Byte](readVarlong(rs).toInt); rs.readFully(vb)
        val nHeaders = readVarlong(rs)
        (0L until nHeaders).foreach { _ =>
          rs.skipBytes(readVarlong(rs).toInt) // header key
          val hv = readVarlong(rs) // header value (nullable)
          if (hv >= 0) rs.skipBytes(hv.toInt)
        }
        val abs = baseOffset + offsetDelta
        if (abs >= from)
          outRecs += abs -> new String(vb, StandardCharsets.UTF_8)
      }
    }
    outRecs.toSeq
  }

  override def close(): Unit =
    try socket.close() catch { case _: Exception => () }
}

/** Serializable connection settings threaded from DSv2 options to every
  * executor-side reader: `broker`, `tls.ca` (PEM path, "" = JVM default
  * store), `sasl.username`/`sasl.password`/`sasl.mechanisms` — the same
  * option names the produce path's librdkafka-style conf uses. */
private[sources] case class KafkaFetchConf(broker: String,
    tlsCa: Option[String], saslUser: Option[String],
    saslPass: Option[String], saslMech: String) {
  def open(): KafkaFetchClient = new KafkaFetchClient(broker,
    tlsCaCert = tlsCa,
    sasl = for (u <- saslUser; p <- saslPass) yield (u, p),
    saslAlgo = graft.sinks.ScramAuth.algoFor(saslMech))
}

private[sources] object KafkaFetchConf {
  def fromOptions(options: CaseInsensitiveStringMap): KafkaFetchConf =
    KafkaFetchConf(options.get("broker"),
      Option(options.get("tls.ca")),
      Option(options.get("sasl.username")),
      Option(options.get("sasl.password")),
      Option(options.get("sasl.mechanisms")).getOrElse("SCRAM-SHA-256"))
}

object KafkaFetchSource {
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** An offset safely past any loopback log end — a fetch from here
    * returns zero records but the CURRENT high watermark, which is the
    * snapshot bound planning needs. */
  private[sources] val ProbeOffset: Long = 1L << 62
}

/** `graft-kafka` — a DataSource V2 source over [[KafkaFetchClient]]:
  * one Spark input partition per Kafka partition (the natural parallelism
  * — at 1000 executors each task owns whole partitions, no coordination).
  * BATCH scans read `[0, highWatermark-at-planning)` — a consistent
  * snapshot; MICRO_BATCH streams read `[checkpointed, latest)` per
  * trigger with offsets durable in the checkpoint, so produce→consume
  * replay across query restarts is exactly-once
  * ([[KafkaStreamOffset]]). Options: `broker` (host:port), `topic`
  * (comma-separated list). Schema: (topic, partition, offset, value).
  */
class KafkaFetchSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaFetchSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KafkaFetchTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class KafkaFetchTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val conf = KafkaFetchConf.fromOptions(options)
  private val topics = options.get("topic").split(',').map(_.trim).filter(_.nonEmpty)
  require(conf.broker != null && topics.nonEmpty,
    "graft-kafka needs options broker=host:port and topic=a[,b,...]")

  override def name(): String = s"graft-kafka(${conf.broker}/${topics.mkString(",")})"
  override def schema(): StructType = KafkaFetchSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaFetchSource.Schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            // snapshot bound per partition, captured once on the driver
            val c = conf.open()
            try topics.flatMap { t =>
              (0 until c.partitionCount(t)).map { p =>
                val (hw, _) = c.fetch(t, p, KafkaFetchSource.ProbeOffset, 1024)
                KafkaFetchPartition(conf, t, p, 0L, hw): InputPartition
              }
            } finally c.close()
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new KafkaFetchReaderFactory
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaFetchMicroBatchStream(conf, topics.toSeq,
            fromLatest = "latest".equalsIgnoreCase(
              options.getOrDefault("startingOffsets", "earliest")))
      }
    }
}

/** Per-(topic, partition) consumed positions — durable in the query
  * checkpoint, which is what makes resumption EXACTLY-ONCE: unlike the
  * TCP line source (whose dead process cannot replay), a broker log
  * replays any committed range on demand, so a restart re-plans from the
  * checkpointed offsets and no record is lost or doubled. */
private[sources] case class KafkaStreamOffset(offsets: Map[(String, Int), Long])
    extends Offset {
  // kafka topic names cannot contain ':' (legal chars: [a-zA-Z0-9._-])
  override def json(): String = offsets.toSeq.sortBy(x => (x._1._1, x._1._2))
    .map { case ((t, p), o) => s"$t:$p:$o" }.mkString(";")
}

private[sources] object KafkaStreamOffset {
  def parse(json: String): KafkaStreamOffset = KafkaStreamOffset(
    if (json.isEmpty) Map.empty
    else json.split(';').map { s =>
      val Array(t, p, o) = s.split(":")
      (t, p.toInt) -> o.toLong
    }.toMap)
}

/** Micro-batch half of `graft-kafka`: latestOffset probes each
  * partition's high watermark, each micro-batch reads the
  * [checkpointed, latest) range — one Spark partition per Kafka
  * partition with a non-empty range. commit() is a no-op: the broker
  * retains its log and the checkpoint owns the positions (the standard
  * Kafka-source contract, no consumer-group state on the broker). */
private[sources] class KafkaFetchMicroBatchStream(conf: KafkaFetchConf,
    topics: Seq[String], fromLatest: Boolean = false) extends MicroBatchStream {
  private def withClient[T](f: KafkaFetchClient => T): T = {
    val c = conf.open()
    try f(c) finally c.close()
  }

  private lazy val parts: Seq[(String, Int)] = withClient { c =>
    topics.flatMap(t => (0 until c.partitionCount(t)).map(t -> _))
  }

  /** `startingOffsets=earliest` (default) replays the whole retained log
    * on first start; `latest` begins at the CURRENT watermarks — the
    * tail-follow mode. Only consulted on a fresh checkpoint: a restart
    * resumes from the checkpointed positions either way. */
  override def initialOffset(): Offset =
    if (!fromLatest) KafkaStreamOffset(parts.map(_ -> 0L).toMap)
    else latestOffset()

  override def latestOffset(): Offset = KafkaStreamOffset(withClient { c =>
    parts.map { case (t, p) =>
      (t, p) -> c.fetch(t, p, KafkaFetchSource.ProbeOffset, 1024)._1
    }.toMap
  })

  override def deserializeOffset(json: String): Offset =
    KafkaStreamOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaStreamOffset].offsets
    val e = end.asInstanceOf[KafkaStreamOffset].offsets
    e.toSeq.sortBy(x => (x._1._1, x._1._2)).collect {
      case ((t, p), eo) if eo > s.getOrElse((t, p), 0L) =>
        KafkaFetchPartition(conf, t, p, s.getOrElse((t, p), 0L), eo): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaFetchReaderFactory
}

private[sources] case class KafkaFetchPartition(conf: KafkaFetchConf,
    topic: String, partition: Int, startOffset: Long, endOffset: Long)
    extends InputPartition

private[sources] class KafkaFetchReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KafkaFetchPartition]
    new PartitionReader[InternalRow] {
      private val client = kp.conf.open()
      private val topicU = UTF8String.fromString(kp.topic)
      private var cur = kp.startOffset
      private var batch: Seq[(Long, String)] = Nil
      private var i = -1

      override def next(): Boolean = {
        i += 1
        if (i < batch.length) return true
        while (cur < kp.endOffset) {
          val (_, recs) = client.fetch(kp.topic, kp.partition, cur)
          // past-snapshot records are excluded; an empty in-range fetch
          // with offsets still below the bound would mean a broker hole —
          // fail loudly rather than spin
          val inRange = recs.filter(_._1 < kp.endOffset)
          require(recs.nonEmpty,
            s"fetch at $cur below snapshot end ${kp.endOffset} returned nothing")
          cur = recs.map(_._1).max + 1
          if (inRange.nonEmpty) { batch = inRange; i = 0; return true }
        }
        false
      }

      override def get(): InternalRow = {
        val (off, v) = batch(i)
        InternalRow(topicU, kp.partition, off,
          if (v == null) null else UTF8String.fromString(v))
      }

      override def close(): Unit = client.close()
    }
  }
}
