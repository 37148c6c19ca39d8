package graft.sinks

import graft.config.GraftConfig
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch/foreachBatch delivery of the cascade's `(topic, value)` rows.
  *
  * Kafka (reference: src/sink/kafka.rs:107-198): Spark's Kafka sink natively
  * routes on a `topic` column and passes `kafka.`-prefixed configs through, so
  * the whole reference sink is [[kafkaShape]] + `.format("kafka")` — no custom
  * code. No key is attached, matching src/sink/kafka.rs:138-139.
  *
  * Parquet (reference: src/sink/parquet.rs:127-290): the per-destination
  * buffer map is a group-by-destination; `partitionBy("topic")` expresses it
  * with one dynamic-partition write (the system's only shuffle, SURVEY.md §2.1
  * O18). Destinations with a declared schema are decoded to typed columns
  * (src/sink/parquet.rs:177-184); the rest default to inference semantics
  * handled by the caller (src/sink/parquet.rs:186-212).
  */
object RoutedSink {
  /** The Kafka producer contract: exactly (topic, value) string columns. */
  def kafkaShape(routed: DataFrame): DataFrame =
    routed.select(col("topic").cast("string"), col("value").cast("string"))

  /** Per-topic coalescing pump: rows feed the client's accumulator
    * ([[KafkaProduceClient.enqueue]]), which ships each topic's buffer as
    * ONE Produce request every `batch.num.messages` payloads or when
    * `linger.ms` expires on a partial buffer (librdkafka's two coalescing
    * triggers) — the difference between ~1k and ~100k msgs/s through one
    * broker socket. Remainders drain at the partition-end flush. */
  private def pumpRows(rows: Iterator[org.apache.spark.sql.Row],
      client: KafkaProduceClient): Unit = {
    rows.foreach(r => client.enqueue(r.getString(0), r.getString(1)))
    client.flush()
  }

  /** Deliver `(topic, value)` rows to a Kafka broker over the wire
    * protocol, one [[KafkaProduceClient]] per partition: sends are detached
    * within the partition (the reference's per-message spawn,
    * src/sink/kafka.rs:137) and flushed at partition end (the sink's
    * batch-delivery barrier). Per-error-code statsd accounting rides with
    * each executor-side client — at 1000 executors this is exactly the
    * reference's N-producer deployment, one per daemon. */
  def produceKafka(routed: DataFrame, broker: String, timeoutMs: Int = 60000,
      statsdHostPort: Option[(String, Int)] = None,
      tlsCaCert: Option[String] = None,
      kafkaConf: Map[String, String] = Map.empty): Unit = {
    // resolve the librdkafka-style conf ON THE DRIVER so a bad acks /
    // codec value fails the job at submit, not per executor partition
    val acks = KafkaProduceClient.acksFromConf(kafkaConf)
    val codec = KafkaProduceClient.compressionFromConf(kafkaConf)
    val version = KafkaProduceClient.produceVersionFromConf(kafkaConf)
    val batchN = KafkaProduceClient.batchNumMessagesFromConf(kafkaConf)
    val linger = KafkaProduceClient.lingerMsFromConf(kafkaConf)
    val nRetries = KafkaProduceClient.retriesFromConf(kafkaConf)
    val backoff = KafkaProduceClient.retryBackoffMsFromConf(kafkaConf)
    val queueCap = KafkaProduceClient.queueBufferingMaxBytesFromConf(kafkaConf)
    kafkaShape(routed).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      // TLS context built HERE, per executor — only the PEM path ships
      val client = new KafkaProduceClient(broker, timeoutMs,
        statsdHostPort.map { case (h, p) => new graft.metrics.StatsdEmitter(h, p) },
        tlsCaCert = tlsCaCert, acks = acks, compression = codec,
        apiVersion = version, batchNumMessages = batchN, lingerMs = linger,
        retries = nRetries, retryBackoffMs = backoff,
        queueBufferingMaxBytes = queueCap)
      try pumpRows(rows, client)
      finally client.close()
    }
  }

  /** The COMPLETE conf-driven wire delivery — the reference feeds its whole
    * `[kafka]` table plus env overrides to librdkafka
    * (src/sink/kafka.rs:63-84, 224-231); this is the one call site mapping
    * the same librdkafka-style conf (env-overlaid, [[KafkaBootstrap
    * .withEnvOverrides]]) to EVERY wire-client knob: bootstrap fail-over
    * list, TLS trust anchors (`security.protocol`/`ssl.ca.location`), SCRAM
    * credentials + mechanism (`sasl.*`), acks, compression codec, and the
    * produce timeout. Conf resolves ON THE DRIVER so a bad value fails at
    * submit; executors get plain resolved scalars. */
  def produceKafkaWithConf(routed: DataFrame, bootstrap: String,
      cfg: graft.config.GraftConfig,
      statsdHostPort: Option[(String, Int)] = None): Unit = {
    val (servers, conf) = KafkaBootstrap.withEnvOverrides(bootstrap, cfg.kafkaConf)
    val broker = servers.split(',').head.trim
    val tls = KafkaProduceClient.tlsFromConf(conf)
    val sasl = KafkaProduceClient.saslFromConf(conf)
    val algo = KafkaProduceClient.saslAlgoFromConf(conf)
    val acks = KafkaProduceClient.acksFromConf(conf)
    val codec = KafkaProduceClient.compressionFromConf(conf)
    val version = KafkaProduceClient.produceVersionFromConf(conf)
    val maxBytes = KafkaProduceClient.maxMessageBytesFromConf(conf)
    val idem = KafkaProduceClient.idempotenceFromConf(conf)
    val batchN = KafkaProduceClient.batchNumMessagesFromConf(conf)
    val linger = KafkaProduceClient.lingerMsFromConf(conf)
    val nRetries = KafkaProduceClient.retriesFromConf(conf)
    val backoff = KafkaProduceClient.retryBackoffMsFromConf(conf)
    val queueCap = KafkaProduceClient.queueBufferingMaxBytesFromConf(conf)
    val timeoutMs = cfg.kafkaTimeoutMs.toInt
    kafkaShape(routed).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val client = new KafkaProduceClient(broker, timeoutMs,
        statsdHostPort.map { case (h, p) => new graft.metrics.StatsdEmitter(h, p) },
        tlsCaCert = tls, sasl = sasl, saslAlgo = algo,
        acks = acks, compression = codec, apiVersion = version,
        maxMessageBytes = maxBytes, idempotent = idem,
        batchNumMessages = batchN, lingerMs = linger,
        retries = nRetries, retryBackoffMs = backoff,
        queueBufferingMaxBytes = queueCap)
      try pumpRows(rows, client)
      finally client.close()
    }
  }

  /** Write one parquet tree partitioned by destination:
    * `<url>/topic=<destination>/part-*.parquet` — the Spark-native analog of
    * the reference's `{destination}/{uuid}.parquet` objects
    * (src/sink/parquet.rs:258).
    *
    * With `inferUndeclared = true`, destinations without a declared schema
    * get the reference's inference semantics (src/sink/parquet.rs:186-221):
    * the schema is inferred from the FIRST buffered line of the batch, and a
    * destination whose first line doesn't yield a usable schema has its
    * whole batch discarded. With `inferUndeclared = false` (default) the
    * raw payload string is written instead — lossless, and readers can
    * infer at scan time (divergence documented in SURVEY.md §7.5).
    */
  def writeRouted(routed: DataFrame, cfg: GraftConfig, rawUrl: String,
      inferUndeclared: Boolean = false): Unit = {
    // Object-store targeting: scheme + env select/configure the store (the
    // reference's parse_url_opts contract, src/sink/parquet.rs:58-61)
    val url = ObjectStoreConfig(routed.sparkSession, rawUrl)
    // Standard foreachBatch multi-sink pattern: this method runs 1+|schemas|
    // write actions (more in infer mode) — without a persist each one would
    // re-execute the whole upstream parse/cascade pipeline per micro-batch.
    routed.persist()
    try {
      val schemas = cfg.schemas
      val declaredTopics = schemas.keySet
      // Declared destinations: decode JSON payloads to the typed schema.
      schemas.values.foreach { ts =>
        val st = SchemaConv.forTopic(ts)
        routed.filter(col("topic") === ts.topic)
          .select(from_json(col("value"), st).as("v"))
          .select(col("v.*"))
          .write.mode(SaveMode.Append).parquet(s"$url/topic=${ts.topic}")
      }
      val rest =
        if (declaredTopics.isEmpty) routed
        else routed.filter(!col("topic").isInCollection(declaredTopics.toSeq))
      if (!inferUndeclared) {
        rest.write.mode(SaveMode.Append).partitionBy("topic").parquet(url)
      } else {
        val spark = routed.sparkSession
        import spark.implicits._
        // destination count is bounded (it's a routing topic set), so the
        // driver-side loop mirrors the reference's per-destination buffer map
        rest.select("topic").distinct().as[String].collect().sorted.foreach { t =>
          val vals = rest.filter(col("topic") === t).select("value")
          // The reference infers from its first BUFFERED line — arrival order,
          // which Spark doesn't preserve. Any deterministic representative is
          // equally faithful; min(value) is stable across partitionings where
          // a bare limit(1) is not.
          vals.agg(min("value")).as[String].collect().headOption
              .filter(_ != null).foreach { first =>
            val schema = try {
              org.apache.spark.sql.types.DataType.fromDDL(
                spark.range(1).select(schema_of_json(lit(first)).as("s"))
                  .head().getString(0))
            } catch { case _: Exception => null }
            schema match {
              case st: org.apache.spark.sql.types.StructType if st.nonEmpty =>
                vals.select(from_json(col("value"), st).as("v")).select(col("v.*"))
                  .write.mode(SaveMode.Append).parquet(s"$url/topic=$t")
              case _ => () // not a JSON object head → batch discarded, as the
                           // reference does on inference failure
            }
          }
        }
      }
    } finally routed.unpersist()
  }

  /** EXACTLY-ONCE routed parquet delivery for foreachBatch — the parquet
    * sibling of the Kafka client's idempotent produce: Spark replays a
    * micro-batch after recovery with the SAME epoch id, so the write is
    * made idempotent the standard way — epoch-scoped output
    * (`url/epoch=<id>/topic=.../...`, readable as one partitioned tree)
    * committed by marker file:
    *
    *   1. `_commits/<id>` exists → the epoch already landed in a previous
    *      attempt; the replay is SKIPPED entirely (returns false);
    *   2. else any partial `epoch=<id>` directory (a crash between data
    *      write and marker) is deleted, the batch writes fresh, and the
    *      marker is created LAST — so the marker's existence implies
    *      complete data, and its absence makes the data invisible to the
    *      replay path (readers should filter `epoch` dirs against
    *      `_commits`, or simply trust the stream: an uncommitted epoch is
    *      always rewritten before its marker appears).
    *
    * `_commits` is underscore-prefixed, so Spark/parquet discovery skips
    * it. One marker file per epoch — driver-side metadata only. */
  def writeRoutedExactlyOnce(batch: DataFrame, epochId: Long,
      cfg: GraftConfig, url: String): Boolean = {
    val commits = java.nio.file.Paths.get(url, "_commits")
    java.nio.file.Files.createDirectories(commits)
    val marker = commits.resolve(epochId.toString)
    if (java.nio.file.Files.exists(marker)) return false // replayed epoch
    val epochDir = java.nio.file.Paths.get(url, s"epoch=$epochId")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(epochDir.toFile) // partial write from a crashed attempt
    writeRouted(batch, cfg, epochDir.toString)
    java.nio.file.Files.createFile(marker) // commit point
    true
  }
}
