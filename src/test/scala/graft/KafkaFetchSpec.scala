package graft

import graft.sinks.KafkaProduceClient
import graft.sources.KafkaFetchClient
import graft.tools.EmbeddedKafka.LoopbackBroker
import org.scalatest.funsuite.AnyFunSuite

/** Consumer-side wire proof: what [[KafkaProduceClient]] ships is read
  * back off the embedded broker's per-partition log through the Fetch v4
  * client and the `graft-kafka` DSv2 batch source — produce→consume
  * round-trip, every codec, multi-partition, offsets contiguous. */
class KafkaFetchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("produce→fetch round trip preserves every payload across " +
    "partitions, for all five codecs") {
    Seq("none", "gzip", "snappy", "lz4", "zstd").foreach { codec =>
      val broker = new LoopbackBroker(partitions = 3)
      val producer = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
        apiVersion = 3, compression = codec)
      val expected = (1 to 90).map(i => s"$codec-m$i")
      try {
        // per-message sends round-robin the partitioner: every partition
        // log gets real multi-batch content
        expected.foreach(m => producer.sendSync("rt", m))
      } finally producer.close()
      val fc = new KafkaFetchClient(broker.broker)
      try {
        assert(fc.partitionCount("rt") == 3)
        val got = (0 until 3).flatMap { p =>
          val (hw, recs) = fc.fetch("rt", p, 0L)
          assert(recs.size == hw, s"[$codec p$p] full read to the watermark")
          // offsets are dense from 0 within each partition log
          assert(recs.map(_._1) == (0L until hw),
            s"[$codec p$p] offsets must be contiguous")
          recs.map(_._2)
        }
        assert(got.sorted == expected.sorted,
          s"[$codec] every produced payload must fetch back exactly once")
      } finally { fc.close(); broker.close() }
    }
  }

  private def tlsRes(f: String): String =
    getClass.getResource(s"/tls/$f").getPath

  test("consumer over TLS + SCRAM: the same deployment contract as the " +
    "produce path, end-to-end through the secured broker") {
    val ctx = graft.sources.Pem.serverContext(
      tlsRes("cert.pem"), tlsRes("pkcs8-key.pem"))
    val broker = new LoopbackBroker(ssl = Some(ctx),
      scram = Some(("svc", "s3cret")))
    val producer = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, tlsCaCert = Some(tlsRes("cert.pem")),
      sasl = Some(("svc", "s3cret")))
    try (1 to 15).foreach(m => producer.sendSync("sec", s"m$m"))
    finally producer.close()
    val fc = new KafkaFetchClient(broker.broker,
      tlsCaCert = Some(tlsRes("cert.pem")), sasl = Some(("svc", "s3cret")))
    try {
      val (hw, recs) = fc.fetch("sec", 0, 0L)
      assert(hw == 15L && recs.map(_._2) == (1 to 15).map(i => s"m$i"),
        "the secured consumer must read back the secured produce")
    } finally { fc.close(); broker.close() }
  }

  test("fetch from a mid-log offset serves only records at or past it") {
    val broker = new LoopbackBroker() // single partition
    val producer = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3)
    try (1 to 20).foreach(m => producer.sendSync("mid", s"m$m"))
    finally producer.close()
    val fc = new KafkaFetchClient(broker.broker)
    try {
      val (hw, recs) = fc.fetch("mid", 0, 13L)
      assert(hw == 20L)
      assert(recs.map(_._1) == (13L until 20L))
    } finally { fc.close(); broker.close() }
  }

  test("graft-kafka micro-batch stream: produce waves consume exactly " +
    "once across checkpointed query restarts") {
    val broker = new LoopbackBroker(partitions = 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-kafka-stream").toString
    def produce(prefix: String, n: Int): Unit = {
      val p = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
        apiVersion = 3)
      try (1 to n).foreach(i => p.sendSync("replay", s"$prefix-$i"))
      finally p.close()
    }
    // AvailableNow + foreachBatch (a recovery-capable sink): each run
    // drains what the broker holds into a shared ledger, then stops —
    // the deterministic replay harness
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): Int = {
      val before = seen.size
      val q = spark.readStream.format("graft-kafka")
        .option("broker", broker.broker)
        .option("topic", "replay")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => seen.add(r.getString(3)))
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      seen.size - before
    }
    try {
      produce("a", 20)
      assert(run() == 20, "first run drains wave A")
      produce("b", 25)
      // a RESTARTED query must see ONLY wave B: the checkpointed offsets
      // make resumption exactly-once — no replay of A, no loss of B
      assert(run() == 25,
        "restart must consume exactly the new wave, nothing twice")
      produce("c", 30)
      assert(run() == 30)
      val all = seen.toArray.map(_.toString).toSeq
      assert(all.distinct.size == 75, "no payload may arrive twice, ever")
    } finally broker.close()
  }

  test("startingOffsets=latest: a fresh stream tails the log — history " +
    "skipped, new waves still exactly-once across restarts") {
    val broker = new LoopbackBroker()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-kafka-latest").toString
    def produce(prefix: String, n: Int): Unit = {
      val p = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
        apiVersion = 3)
      try (1 to n).foreach(i => p.sendSync("tail", s"$prefix-$i"))
      finally p.close()
    }
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): Int = {
      val before = seen.size
      val q = spark.readStream.format("graft-kafka")
        .option("broker", broker.broker)
        .option("topic", "tail")
        .option("startingOffsets", "latest")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => seen.add(r.getString(3)))
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      seen.size - before
    }
    try {
      produce("old", 30) // history a tailing consumer must NOT replay
      assert(run() == 0, "latest start skips the retained history")
      produce("new", 10)
      assert(run() == 10,
        "the checkpointed tail position picks up ONLY the new wave")
      assert(seen.toArray.map(_.toString).forall(_.startsWith("new-")))
    } finally broker.close()
  }

  test("graft-kafka DSv2 batch scan: one input partition per Kafka " +
    "partition, snapshot-consistent, values intact") {
    val broker = new LoopbackBroker(partitions = 4)
    val producer = new KafkaProduceClient(broker.broker, timeoutMs = 5000,
      apiVersion = 3, compression = "zstd")
    val expected = (1 to 200).map(i => f"v$i%03d")
    try expected.foreach(m => producer.sendSync("scan", m))
    finally producer.close()
    try {
      val df = spark.read.format("graft-kafka")
        .option("broker", broker.broker)
        .option("topic", "scan")
        .load()
      assert(df.rdd.getNumPartitions == 4,
        "parallelism must be one Spark partition per Kafka partition")
      val rows = df.collect()
      assert(rows.length == 200)
      assert(rows.map(_.getString(3)).sorted.toSeq == expected.sorted)
      // per-partition offsets dense from zero
      rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
        val offs = rs.map(_.getLong(2)).sorted.toSeq
        assert(offs == (0L until offs.length.toLong))
      }
    } finally broker.close()
  }
}
