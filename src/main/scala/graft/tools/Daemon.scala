package graft.tools

import graft.config.GraftConfig
import graft.metrics.{StatsdEmitter, StatusServer}
import graft.queries.Synth
import graft.sinks.RoutedSink
import graft.streaming.GraftPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's ACTUAL operating mode as one continuous process
  * (src/main.rs:52-118 + hotdog.yml): a `graft-syslog` TCP/TLS server
  * source feeding the rule cascade, routed parquet landing on a
  * `Trigger.ProcessingTime` cadence (the flush timer,
  * src/sink/parquet.rs:103-113), a live HTTP status server
  * (src/status.rs:23-40), statsd counter emission (src/main.rs:113-118),
  * and a clean drain on SIGTERM (the shutdown hook stops the query, which
  * flushes the in-flight micro-batch before the JVM exits — the
  * reference's shutdown flush, src/sink/parquet.rs:214-230).
  *
  * `StreamDemo` drains a directory with `Trigger.AvailableNow`; this is
  * the long-running twin — it serves until stopped. The composition is
  * pure reuse: every part (source, cascade, sink, listener, status,
  * statsd) is an already-tested component; `DaemonSpec` drives the whole
  * assembly in-process with a generator mirroring
  * reference/scripts/generate-stdout.rb:15-21.
  */
object Daemon {

  /** A running daemon: the streaming query plus its ops surfaces. */
  final class Handle private[Daemon] (
      val query: StreamingQuery,
      val status: StatusServer,
      val statsd: Option[StatsdEmitter],
      val sourceName: String) extends AutoCloseable {

    /** Clean drain: stop the query (completing the in-flight micro-batch),
      * wait for termination, then release the ops surfaces. Idempotent —
      * both the SIGTERM hook and a normal exit path may call it. */
    def drainAndStop(): Unit = synchronized {
      if (query.isActive) {
        query.stop()
        query.awaitTermination()
      }
      statsd.foreach(s => try s.close() catch { case _: Throwable => () })
      try status.close() catch { case _: Throwable => () }
    }

    override def close(): Unit = drainAndStop()
  }

  /** Assembles and starts the daemon on `spark`. `listenPort`/`statusPort`
    * 0 binds ephemeral ports (the spec's mode; production passes fixed
    * ones). `tlsOptions` carries the source's `tls.cert`/`tls.key` (and
    * optional `tls.ca`) paths for the reference's TLS front door. The
    * bound listen port is discoverable via
    * `SyslogSocketSource.boundPort(sourceName)`. */
  def start(spark: SparkSession, cfg: GraftConfig, outDir: String,
      sourceName: String, listenPort: Int = 0, statusPort: Int = 0,
      statsdTarget: Option[(String, Int)] = None,
      tlsOptions: Map[String, String] = Map.empty,
      triggerMs: Long = 0L,
      kafkaBootstrap: Option[String] = None): Handle = {
    val status = new StatusServer(statusPort)
    val emitter = statsdTarget.map { case (h, p) => new StatsdEmitter(h, p) }
    spark.streams.addListener(
      new GraftPipeline.MetricsListener(emitter, Some(status)))
    val routed = GraftPipeline.tcpStream(spark, cfg, "127.0.0.1", listenPort,
      tlsOptions + ("name" -> sourceName))
    val cadence = if (triggerMs > 0) triggerMs else cfg.flushMs
    // The reference's PRIMARY sink is Kafka (src/sink/kafka.rs:107-198) with
    // parquet the alternative (src/serve/mod.rs:81-117 picks the sink —
    // Kafka if configured, else file — from settings);
    // `kafkaBootstrap` selects the same way: every micro-batch's (topic,
    // value) rows go out over the raw wire client (conf-driven TLS/SCRAM/
    // acks/codec, per-partition producers), checkpointed exactly like the
    // parquet path so a restart resumes from the last delivered batch.
    val deliver: (DataFrame, Long) => Unit = kafkaBootstrap match {
      case Some(bootstrap) => (batch: DataFrame, _: Long) =>
        RoutedSink.produceKafkaWithConf(batch, bootstrap, cfg, statsdTarget)
      case None => (batch: DataFrame, _: Long) =>
        RoutedSink.writeRouted(batch, cfg, outDir)
    }
    val q = routed.writeStream
      .trigger(Trigger.ProcessingTime(cadence))
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(deliver)
      .start()
    new Handle(q, status, emitter, sourceName)
  }

  /** CLI entry: `Daemon <outDir> [configYml]`. Ports/targets via env:
    * GRAFT_PORT (listen, default 1514), GRAFT_STATUS_PORT (default 8585 —
    * the reference's default, hotdog.yml), GRAFT_STATSD (host:port,
    * optional), GRAFT_TLS_CERT/GRAFT_TLS_KEY (optional PEM paths). Runs
    * until SIGTERM/SIGINT; the shutdown hook drains cleanly. */
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val cfg = if (args.length > 1) GraftConfig.load(args(1))
              else Synth.HotdogConfig
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tls = (sys.env.get("GRAFT_TLS_CERT"), sys.env.get("GRAFT_TLS_KEY")) match {
      case (Some(c), Some(k)) => Map("tls.cert" -> c, "tls.key" -> k)
      case _ => Map.empty[String, String]
    }
    val statsd = sys.env.get("GRAFT_STATSD").map { s =>
      val Array(h, p) = s.split(":", 2); (h, p.toInt)
    }
    val h = start(spark, cfg, outDir, sourceName = "graft-daemon",
      listenPort = sys.env.getOrElse("GRAFT_PORT", "1514").toInt,
      statusPort = sys.env.getOrElse("GRAFT_STATUS_PORT", "8585").toInt,
      statsdTarget = statsd, tlsOptions = tls,
      // GRAFT_KAFKA=host:port[,host:port...] selects the Kafka sink (the
      // reference's default); unset routes parquet to <outDir>
      kafkaBootstrap = sys.env.get("GRAFT_KAFKA"))
    // SIGTERM/SIGINT land here: drain the in-flight batch, then exit —
    // the reference's shutdown flush contract
    Runtime.getRuntime.addShutdownHook(new Thread(() => h.drainAndStop()))
    h.query.awaitTermination()
    h.drainAndStop()
    spark.stop()
  }
}
