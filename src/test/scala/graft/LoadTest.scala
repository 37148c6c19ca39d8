package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.tools.EmbeddedKafka.LoopbackBroker
import graft.queries.Synth
import graft.sources.SyslogSocketSource
import graft.tools.Daemon
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-ingest measurement of the daemon assembly against the
  * reference's published load envelope — the one reference baseline
  * artifact (r11 verdict item 1) with no repo counterpart until now.
  *
  * The reference publishes two load shapes:
  *   - `scripts/generate-stdout.rb:6-12` — 100,000 RFC 5424 lines with a
  *     `{"meta":{"topic":"test"},"i":N}` JSON payload, piped over TCP
  *     (optionally via `parallel -j4`);
  *   - `tsung.xml:13-15` — 100 connections/s arrival, 100k ceiling,
  *     against the same syslog port.
  *
  * This main drives the SAME assembly the reference runs (TCP socket
  * server source → rule cascade → routed sink on a ProcessingTime
  * cadence) with that message shape at ≥100k messages over ≥100
  * concurrent connections, and reports:
  *   - `msgs_per_sec_e2e`  — total messages / (first byte sent → last
  *     message DURABLE in the sink);
  *   - `msgs_per_sec_send` — the offered load the generator sustained;
  *   - `p50/p95/p99_ms`    — per-message ingest latency, send timestamp
  *     (embedded as `"t"` in the payload, surviving the cascade) →
  *     parquet file mtime (durability instant). For a micro-batch engine
  *     this is bounded below by the trigger cadence — that bound is the
  *     honest number, so the trigger is reported alongside;
  *   - `flush_median_ms`   — median gap between distinct sink-write
  *     instants (the observed flush cadence vs the configured trigger).
  *
  * Modes (GRAFT_LT_MODE): `parquet` (reference file-sink mode; full
  * latency stats) and `kafka` (reference primary mode, delivered into the
  * in-process loopback broker over the real Produce wire path;
  * throughput + delivery-lag stats). Run via
  * `scripts/loadtest.sh [msgs] [conns] [mode]`; results are recorded in
  * BASELINE.md's "daemon envelope" table.
  */
object LoadTest {
  private def env(k: String, d: String): String = sys.env.getOrElse(k, d)

  def main(args: Array[String]): Unit = {
    val total = env("GRAFT_LT_MSGS", "100000").toInt
    val conns = env("GRAFT_LT_CONNS", "100").toInt
    val mode = env("GRAFT_LT_MODE", "parquet")
    val triggerMs = env("GRAFT_LT_TRIGGER_MS", "1000").toLong
    // offered-load pacing in msgs/s across ALL connections (0 = blast):
    // a held rate measures steady-state latency (arrival → durable) the
    // way tsung's arrivalrate does, instead of burst-absorb throughput
    val rate = env("GRAFT_LT_RATE", "0").toDouble
    val cpus = env("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-loadtest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = Files.createTempDirectory("graft-loadtest").toString
    val broker = if (mode == "kafka") Some(new LoopbackBroker()) else None
    val srcName = s"graft-loadtest-${System.nanoTime()}"
    val h = Daemon.start(spark, Synth.HotdogConfig, outDir,
      sourceName = srcName, listenPort = 0, statusPort = 0,
      triggerMs = triggerMs, kafkaBootstrap = broker.map(_.broker))
    val deadline = System.currentTimeMillis() + 15 * 60 * 1000L
    var port = SyslogSocketSource.boundPort(srcName)
    while (port.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); port = SyslogSocketSource.boundPort(srcName)
    }
    require(port.nonEmpty, "daemon never bound its listen port")

    def line(n: Long): String =
      "<13>1 2020-04-18T15:16:09.956153-07:00 coconut tyler " +
        s"""- - - {"meta":{"topic":"test"},"i":$n,""" +
        s""""t":${System.currentTimeMillis()}}\n"""

    // landing poll: committed parquet rows / broker deliveries
    def landed(): Long = mode match {
      case "kafka" => broker.get.received.size.toLong
      case _ =>
        try spark.read.parquet(outDir).count()
        catch { case _: Throwable => 0L } // tree not created yet
    }

    // warmup: the first trigger pays stream-initialization (~4 s on this
    // host); send a small prelude and wait for it to land so the measured
    // window is steady-state, not query startup
    val warmupN = env("GRAFT_LT_WARMUP", "500").toInt
    locally {
      val sock = new Socket("127.0.0.1", port.get)
      val w = new BufferedWriter(new OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8), 1 << 16)
      (0 until warmupN).foreach(i => w.write(line(-1000000L - i)))
      w.flush(); sock.close()
    }
    while (landed() < warmupN && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    require(landed() >= warmupN, "warmup prelude never landed")

    // generator: the generate-stdout.rb line shape + an embedded send
    // timestamp; `conns` concurrent sockets (tsung's conn-parallel shape),
    // each sending its share as fast as the socket accepts
    val perConn = Array.tabulate(conns)(c =>
      total / conns + (if (c < total % conns) 1 else 0))
    val tStart = System.currentTimeMillis()
    val senders = (0 until conns).map { c =>
      val t = new Thread(() => {
        val sock = new Socket("127.0.0.1", port.get)
        sock.setTcpNoDelay(false)
        val w = new BufferedWriter(new OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8), 1 << 16)
        val perConnRate = rate / conns // msgs/s this connection owes
        val t0 = System.nanoTime()
        var i = 0
        while (i < perConn(c)) {
          if (rate > 0) {
            // token-bucket pacing: message i is due at i/perConnRate secs;
            // flush each paced message so it actually leaves the buffer
            val due = t0 + (i / perConnRate * 1e9).toLong
            var now = System.nanoTime()
            while (now < due) {
              val ms = (due - now) / 1000000L
              if (ms > 0) Thread.sleep(ms) else Thread.onSpinWait()
              now = System.nanoTime()
            }
          }
          w.write(line(c.toLong * 1000000L + i))
          if (rate > 0) w.flush()
          i += 1
        }
        w.flush(); sock.close()
      }, s"lt-sender-$c")
      t.start(); t
    }
    senders.foreach(_.join())
    val tSendDone = System.currentTimeMillis()

    val target = warmupN.toLong + total
    var n = landed()
    while (n < target && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); n = landed()
    }
    val tLandDone = System.currentTimeMillis()
    h.drainAndStop()
    require(n >= target,
      s"only $n of $target messages landed before timeout")

    val extra: String = mode match {
      case "kafka" =>
        broker.foreach(_.close())
        "" // wire-delivery throughput is the kafka-mode headline
      case _ =>
        import spark.implicits._
        val files = new java.io.File(outDir).listFiles()
          .filter(_.getName.startsWith("topic="))
          .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        val mtime = files.map(f => f.getAbsolutePath -> f.lastModified()).toMap
        val rows = spark.read.parquet(outDir)
          .select(get_json_object(col("value"), "$.t").cast("long").as("t"),
            get_json_object(col("value"), "$.i").cast("long").as("i"),
            input_file_name().as("f"))
          .filter(col("i") >= 0L) // measured window only, not the warmup
          .select("t", "f")
          .as[(Long, String)].collect()
        val lats = rows.map { case (t, f) =>
          val path = f.stripPrefix("file://").stripPrefix("file:")
          mtime.getOrElse(path, tLandDone) - t
        }.sorted
        def pct(p: Double): Long = lats((lats.length * p).toInt.min(lats.length - 1))
        // one flush writes several part files within ~ms of each other:
        // cluster mtimes (200 ms tolerance) so the cadence is between
        // FLUSHES, not between files of the same flush
        val writes = mtime.values.toSeq.distinct.sorted
          .foldLeft(List.empty[Long]) {
            case (acc, t) if acc.headOption.exists(t - _ <= 200L) => acc
            case (acc, t) => t :: acc
          }.reverse
        val gaps = writes.zip(writes.drop(1)).map { case (a, b) => b - a }
          .sorted
        val flushMed = if (gaps.isEmpty) 0L else gaps(gaps.length / 2)
        s""""p50_ms":${pct(0.50)},"p95_ms":${pct(0.95)},""" +
          s""""p99_ms":${pct(0.99)},"max_ms":${lats.last},""" +
          s""""flushes":${writes.length},"flush_median_ms":$flushMed,"""
    }

    val e2eSec = (tLandDone - tStart) / 1000.0
    val sendSec = math.max(1L, tSendDone - tStart) / 1000.0
    println(s"""{"metric":"daemon_ingest","mode":"$mode","msgs":$total,""" +
      s""""conns":$conns,"trigger_ms":$triggerMs,""" +
      s""""offered_rate":${rate.toLong},""" +
      s""""msgs_per_sec_send":${math.round(total / sendSec)},""" +
      s""""msgs_per_sec_e2e":${math.round(total / e2eSec)},""" +
      s""""elapsed_sec":$e2eSec,$extra""" +
      s""""landed":$n}""")
    spark.stop()
  }
}
