package graft.streaming

import graft.config.GraftConfig
import graft.functions.GraftFunctions
import graft.rules.RuleCompiler
import graft.queries.Synth
import graft.sinks.RoutedSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** The whole reference daemon as ONE Structured Streaming query
  * (SURVEY.md §3.1): `source lines → parse → rule cascade → routed sink`,
  * with `Trigger.ProcessingTime(flush_ms)` standing in for the reference's
  * flush timer (src/sink/parquet.rs:103-113) and `observe` + a listener for
  * its statsd counters (src/status.rs:42-71).
  *
  * Unlike the reference, delivery is checkpointed exactly-once per sink —
  * strictly stronger than hotdog's best-effort detached produces
  * (SURVEY.md §7.5).
  */
object GraftPipeline {
  /** Core transformation, identical in batch and streaming: a DataFrame with
    * a string `line` column → `(topic, value)` rows (dropped rows filtered),
    * with operational metrics observed on the way through.
    */
  def transform(cfg: GraftConfig, lines: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(lines.sparkSession)
    val iso8601 = date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssxxx")
    val parsed = lines
      .withColumn("p", call_function("parse_syslog", col("line")))
      .observe("graft", count(lit(1)).as("lines"),
        count(when(col("p").isNull, 1)).as("error.log_parse"))
      .filter(col("p").isNotNull)
    // statically-known destinations get per-topic submitted counters
    // (hotdog.kafka.submitted.<topic>, README.adoc:487-489); dynamic
    // (templated) topics are covered by the total
    val staticTopics = cfg.rules.flatMap(_.actions).collect {
      case graft.config.Action.Forward(t) if !t.contains("{{") => t
    }.distinct
    val routed = parsed
      .withColumn("r", RuleCompiler.cascade(cfg, Synth.fieldCols(col("p")),
        lit(GraftConfig.Version), iso8601))
    routed
      .observe("graft_route",
        count(when(col("r.err") === RuleCompiler.ErrMergeTargetNotJson, 1))
          .as("error.merge_target_not_json"),
        (count(when(col("r.topic").isNotNull, 1)).as("kafka.submitted") +:
          staticTopics.map(t =>
            count(when(col("r.topic") === t, 1)).as(s"kafka.submitted.$t"))): _*)
      // plain filter: the batch-side pushdown fence (Synth.noPushFilter)
      // uses monotonically_increasing_id, which streaming plans reject —
      // and streaming has no spread exchange to fence against.
      // topic IS NULL also drops the tagged merge-failure state.
      .filter(col("r").isNotNull && col("r.topic").isNotNull)
      .select(col("r.topic").as("topic"), col("r.value").as("value"))
  }

  /** File-based streaming entry (the v1 production stream source —
    * SURVEY.md §7.5). Reads text lines appearing under `inputDir`.
    */
  def fileStream(spark: SparkSession, cfg: GraftConfig, inputDir: String): DataFrame =
    transform(cfg, spark.readStream.text(inputDir).withColumnRenamed("value", "line"))

  /** TCP/TLS syslog SERVER source (reference O1/O2 at full fidelity): the
    * `graft-syslog` DSv2 source accepts client connections and splits each
    * byte stream on newlines, exactly the reference's front door
    * (src/serve/mod.rs:73-172, src/serve/plain.rs:4-6); TLS via PEM
    * cert+key options mirroring src/serve/tls.rs:73-124. Extra options
    * (`name`, `numPartitions`, `tls.*`) pass through.
    */
  def tcpStream(spark: SparkSession, cfg: GraftConfig, host: String, port: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    transform(cfg,
      options.foldLeft(
        spark.readStream.format("graft-syslog")
          .option("host", host).option("port", port)) {
        case (r, (k, v)) => r.option(k, v)
      }.load())

  /** Plaintext TCP line source via Spark's built-in CLIENT socket source
    * (dials out to host:port — the inverse shape of [[tcpStream]]'s server;
    * kept for dev parity with `nc -lk`). Test/dev only — not fault-tolerant,
    * no TLS. */
  def socketStream(spark: SparkSession, cfg: GraftConfig, host: String, port: Int): DataFrame =
    transform(cfg,
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
        .withColumnRenamed("value", "line"))

  /** Kafka line source: consume raw lines from topics and route them through
    * the same cascade (the reference never consumes Kafka, but a Spark
    * deployment fed by a syslog→Kafka shipper enters here). */
  def kafkaStream(spark: SparkSession, cfg: GraftConfig, bootstrap: String,
      topics: String): DataFrame =
    transform(cfg,
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics).load()
        .selectExpr("CAST(value AS STRING) AS line"))

  /** Routed parquet delivery: one dynamic-partition write per micro-batch —
    * the group-by-destination buffer flush (src/sink/parquet.rs:127-230). */
  def startParquetSink(routed: DataFrame, cfg: GraftConfig, url: String,
      checkpoint: String): StreamingQuery =
    routed.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        RoutedSink.writeRouted(batch, cfg, url)
      }
      .start()

  /** Exactly-once routed parquet delivery: same per-trigger cadence as
    * [[startParquetSink]], but each micro-batch lands through
    * [[RoutedSink.writeRoutedExactlyOnce]] — epoch-scoped output + commit
    * marker, so a recovery replay of a delivered epoch is a no-op
    * (`ExactlyOnceSinkSpec` pins replay, crash-window, and restart). The
    * strongest delivery tier next to the reference-faithful buffered sink's
    * documented loss window. */
  def startExactlyOnceParquetSink(routed: DataFrame, cfg: GraftConfig,
      url: String, checkpoint: String): StreamingQuery =
    routed.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        RoutedSink.writeRoutedExactlyOnce(batch, id, cfg, url): Unit
      }
      .start()

  /** Routed parquet delivery with the reference's EXACT flush triggers
    * (src/sink/parquet.rs:89-230): payload bytes accumulate across
    * micro-batches per destination, any destination reaching
    * `parquet.buffer` bytes flushes ALL of them, the `flush_ms` interval
    * fires the same drain, and query termination drains the remainder
    * (shutdown flush, O21 — wired via a StreamingQueryListener so the
    * contract holds however the query ends). The trigger runs faster than
    * `flush_ms` (quarter interval) so arrivals reach the buffer at a
    * cadence the timer can observe, like the reference's channel recv
    * loop. See [[graft.sinks.ByteThresholdParquetSink]] for the
    * durability trade vs [[startParquetSink]]. */
  def startBufferedParquetSink(routed: DataFrame, cfg: GraftConfig, url: String,
      checkpoint: String, triggerMs: Long = 0L)
      : (StreamingQuery, graft.sinks.ByteThresholdParquetSink) = {
    val sink = new graft.sinks.ByteThresholdParquetSink(cfg, url)
    val cadence = if (triggerMs > 0) triggerMs else math.max(1L, cfg.flushMs / 4)
    val spark = routed.sparkSession
    // listener registered BEFORE start so a query that dies on its very
    // first trigger still gets its shutdown drain; the id to match arrives
    // via the holder right after start() returns (the listener bus
    // delivers asynchronously). A query can terminate — and its event be
    // DELIVERED — before the assignment below; such early events are
    // RECORDED (never parked — blocking here would stall the shared
    // listener-bus dispatch thread for every other streaming query on the
    // session) and reconciled right after the id is published. The
    // `early.remove` claim ticket makes the drain exactly-once whichever
    // side wins the race. sink.close() is idempotent — callers may also
    // invoke it after awaitTermination.
    val qid = new java.util.concurrent.atomic.AtomicReference[java.util.UUID]()
    val early = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = {
        val id = qid.get()
        if (id != null) {
          if (e.id == id) { sink.close(); spark.streams.removeListener(this) }
        } else {
          early.add(e.id)
          // publish may have landed between the null read and the add —
          // re-check, claiming the event so only one side drains
          if (e.id == qid.get() && early.remove(e.id)) {
            sink.close(); spark.streams.removeListener(this)
          }
        }
      }
    }
    spark.streams.addListener(listener)
    val q =
      try routed.writeStream
        .trigger(Trigger.ProcessingTime(cadence))
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink.addBatch _)
        .start()
      catch { case e: Throwable =>
        spark.streams.removeListener(listener)
        sink.close()
        throw e
      }
    qid.set(q.id)
    // reconcile a termination delivered before the id was published
    if (early.remove(q.id)) { sink.close(); spark.streams.removeListener(listener) }
    (q, sink)
  }

  /** Kafka delivery: native topic-column routing + `kafka.` conf passthrough
    * (reference: src/sink/kafka.rs:63-84,138-139). Like the reference, the
    * sink refuses to start until a broker answers the bootstrap probe
    * (src/sink/kafka.rs:86-104); `KAFKA_BROKER`/`SASL_SCRAM_*` env overrides
    * apply first. Pass `probe = false` to skip the gate (tests, shape-only
    * plans). */
  def startKafkaSink(routed: DataFrame, cfg: GraftConfig, bootstrap: String,
      checkpoint: String, probe: Boolean = true): StreamingQuery = {
    val (servers, conf) = graft.sinks.KafkaBootstrap.withEnvOverrides(bootstrap, cfg.kafkaConf)
    if (probe) graft.sinks.KafkaBootstrap.probe(servers, cfg.kafkaTimeoutMs.toInt)
    val w = routed.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      // produce timeout (reference default 60 s, src/sink/kafka.rs:140)
      .option("kafka.message.timeout.ms", cfg.kafkaTimeoutMs.toString)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(cfg.flushMs))
    conf.foldLeft(w) { case (acc, (k, v)) => acc.option(s"kafka.$k", v) }
      .start()
  }

  /** Event-time windowed delivery counts with late-data handling — the
    * watermarked tumbling-window aggregation the reference's
    * processing-time-only design lacks (SURVEY.md §2.2). `routed` must
    * carry an event-time column `et`. State is bounded by the watermark;
    * the window+topic grouping is one keyed shuffle. */
  def windowedTopicCounts(routed: DataFrame, watermarkDelay: String,
      windowLength: String): DataFrame =
    routed
      .withWatermark("et", watermarkDelay)
      .groupBy(window(col("et"), windowLength).as("w"), col("topic"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("topic"), col("n"))

  /** Listener translating query progress to the reference's complete statsd
    * metric name surface (graft.metrics.Stats, README.adoc:469-516) —
    * logged always, emitted over UDP when an emitter is supplied. Per
    * micro-batch it surfaces:
    *   - `hotdog.lines` / `hotdog.error.log_parse` (observe on the parse),
    *   - `hotdog.kafka.submitted(.<topic>)` and
    *     `hotdog.error.merge_target_not_json` (observe on the cascade),
    *   - `hotdog.connections` gauge + line counter from the graft-syslog
    *     source's ReportsSourceMetrics,
    *   - `hotdog.kafka.producer.sent` timer from the batch's addBatch
    *     duration — the sink-write analog of the reference's produce timer
    *     (src/sink/kafka.rs:130-155).
    *
    * Every value also lands in the optional [[graft.metrics.StatusServer]]
    * registry, so `GET /stats` serves live per-batch numbers (strictly more
    * than the reference's empty map, src/status.rs:30-36).
    */
  final class MetricsListener(emitter: Option[graft.metrics.StatsdEmitter] = None,
      status: Option[graft.metrics.StatusServer] = None)
      extends StreamingQueryListener {
    import graft.metrics.Stats
    private val log = org.apache.log4j.Logger.getLogger(classOf[MetricsListener])

    private def counter(name: String, v: Long): Unit = {
      log.info(s"$name=$v")
      emitter.foreach(_.counter(name, v))
      status.foreach(_.update(name, v))
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      log.info(s"graft query started: ${e.id}")

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val obs = p.observedMetrics
      if (obs.containsKey("graft")) {
        val row = obs.get("graft")
        counter(Stats.Lines, row.getLong(0))
        counter(Stats.LogParseError, row.getLong(1))
      }
      if (obs.containsKey("graft_route")) {
        val row = obs.get("graft_route")
        row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
          counter(s"${Stats.Prefix}.$f", row.getLong(i))
        }
      }
      p.sources.foreach { s =>
        val m = s.metrics
        if (m != null && m.containsKey("connections")) {
          val v = m.get("connections").toLong
          log.info(s"${Stats.Connections}=$v")
          emitter.foreach(_.gauge(Stats.Connections, v))
          status.foreach(_.update(Stats.Connections, v))
        }
      }
      val add = p.durationMs.get("addBatch")
      if (add != null) {
        log.info(s"${Stats.KafkaProducerSent}=${add}ms")
        emitter.foreach(_.timerMs(Stats.KafkaProducerSent, add))
        status.foreach(_.update(Stats.KafkaProducerSent, add))
      }
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      log.info(s"graft query terminated: ${e.id}")
  }
}
