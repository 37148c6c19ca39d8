package graft

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.config._
import graft.metrics.{Stats, StatsdEmitter}
import graft.queries.Synth
import graft.streaming.GraftPipeline
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The complete statsd metric surface: reference name composition, the
  * producer-error mapping (src/sink/kafka.rs:203-208 + its tests), the UDP
  * line protocol, and the listener's progress → metric-name translation
  * end-to-end over a stream containing parse AND merge failures.
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("metric names compose exactly as the reference documents") {
    assert(Stats.Lines == "hotdog.lines")
    assert(Stats.Connections == "hotdog.connections")
    assert(Stats.kafkaSubmitted("t") == "hotdog.kafka.submitted.t")
    assert(Stats.kafkaProducerError("messagetimedout") ==
      "hotdog.kafka.producer.error.messagetimedout")
    assert(Stats.LogParseError == "hotdog.error.log_parse")
    assert(Stats.TopicParseFailed == "hotdog.error.topic_parse_failed")
    assert(Stats.MergeTargetNotJson == "hotdog.error.merge_target_not_json")
    assert(Stats.MergeInvalidJson == "hotdog.error.merge_of_invalid_json")
    assert(Stats.FullInternalQueue == "hotdog.error.full_internal_queue")
    assert(Stats.InternalPushFailed == "hotdog.error.internal_push_failed")
    assert(Stats.KafkaProducerSent == "hotdog.kafka.producer.sent")
  }

  test("producer-error mapping mirrors the reference's kafka tests") {
    // src/sink/kafka.rs:260-276
    assert(Stats.metricNameFor("MessageTimedOut") == "messagetimedout")
    assert(Stats.metricNameFor("UnknownTopic") == "unknowntopic")
    assert(Stats.metricNameFor("ReadOnly") == "readonly")
    // multi-word error strings keep the first word; empty → unknown
    assert(Stats.metricNameFor("Message timed out") == "message")
    assert(Stats.metricNameFor("") == "unknown")
  }

  test("statsd emitter speaks the line protocol over UDP") {
    val receiver = new DatagramSocket(0)
    receiver.setSoTimeout(5000)
    val emitter = new StatsdEmitter("127.0.0.1", receiver.getLocalPort)
    try {
      emitter.counter(Stats.Lines, 42)
      emitter.gauge(Stats.Connections, 3)
      emitter.timerMs(Stats.KafkaProducerSent, 17)
      def recv(): String = {
        val p = new DatagramPacket(new Array[Byte](512), 512)
        receiver.receive(p)
        new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
      }
      assert(Set(recv(), recv(), recv()) == Set(
        "hotdog.lines:42|c", "hotdog.connections:3|g", "hotdog.kafka.producer.sent:17|ms"))
    } finally { emitter.close(); receiver.close() }
  }

  private def httpGet(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    is.close()
    (code, body)
  }

  test("status server serves the reference's routes: banner, /stats, 404") {
    val srv = new graft.metrics.StatusServer(0)
    try {
      assert(httpGet(srv.boundPort, "/") == (200, "hotdog status server"))
      // at startup the reference serializes an EMPTY map (src/status.rs:30-36)
      assert(httpGet(srv.boundPort, "/stats") == (200, "{}"))
      assert(httpGet(srv.boundPort, "/nope")._1 == 404)
      srv.update(Stats.Lines, 42)
      srv.update(Stats.Connections, 3)
      assert(httpGet(srv.boundPort, "/stats") ==
        (200, """{"hotdog.connections":3,"hotdog.lines":42}"""))
    } finally srv.close()
  }

  test("listener translates one batch into the reference's metric names over UDP") {
    val receiver = new DatagramSocket(0)
    receiver.setSoTimeout(10000)
    val emitter = new StatsdEmitter("127.0.0.1", receiver.getLocalPort)
    val status = new graft.metrics.StatusServer(0)
    val listener = new GraftPipeline.MetricsListener(Some(emitter), Some(status))
    spark.streams.addListener(listener)
    try {
      val in = Files.createTempDirectory("graft-metrics-in")
      val out = Files.createTempDirectory("graft-metrics-out")
      // 4 lines: 1 routed to test, 1 unparseable, 1 merge failure, 1 catch-all
      Files.write(in.resolve("a.txt"), String.join("\n",
        "<13>1 2020-01-01T00:00:00Z h a - - - hello there",
        "garbage!",
        "<13>1 2020-01-01T00:00:00Z h a - - - mergeme not json",
        "<13>1 2020-01-01T00:00:00Z h a - - - other").getBytes)
      val cfg = Synth.HotdogConfig.copy(rules = List(
        Synth.HotdogRules.head,
        Rule(Field.Msg, Some("^mergeme"), None, List(Action.Merge("""{"a":1}"""))),
        Rule(Field.Msg, Some(".*"), None, List(Action.Forward("logs-unknown"), Action.Stop))))
      val routed = GraftPipeline.transform(cfg,
        spark.readStream.text(in.toString).withColumnRenamed("value", "line"))
      val q = routed.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$out/_cp")
        .format("noop")
        .start()
      q.awaitTermination()
      // drain datagrams until the expected counter set arrived
      val got = scala.collection.mutable.Map.empty[String, String]
      val deadline = System.currentTimeMillis() + 15000
      val want = Map(
        Stats.Lines -> "4|c",
        Stats.LogParseError -> "1|c",
        s"${Stats.Prefix}.kafka.submitted" -> "2|c",
        s"${Stats.Prefix}.kafka.submitted.test" -> "1|c",
        s"${Stats.Prefix}.kafka.submitted.logs-unknown" -> "1|c",
        Stats.MergeTargetNotJson -> "1|c")
      def done() = want.forall { case (k, v) => got.get(k).contains(v) } &&
        got.contains(Stats.KafkaProducerSent)
      while (!done() && System.currentTimeMillis() < deadline) {
        val p = new DatagramPacket(new Array[Byte](512), 512)
        try {
          receiver.receive(p)
          val line = new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
          val Array(name, value) = line.split(":", 2)
          got(name) = value
        } catch { case _: java.net.SocketTimeoutException => () }
      }
      want.foreach { case (k, v) =>
        assert(got.get(k).contains(v), s"metric $k: expected $v, got ${got.get(k)} (all: $got)")
      }
      // the sink-write timer fired too
      assert(got.keys.exists(_ == Stats.KafkaProducerSent), s"no timer in $got")
      // the same values are live on GET /stats
      val (code, body) = httpGet(status.boundPort, "/stats")
      assert(code == 200)
      assert(body.contains(s""""${Stats.Lines}":4"""), body)
      assert(body.contains(s""""${Stats.MergeTargetNotJson}":1"""), body)
      assert(body.contains(s""""${Stats.KafkaProducerSent}":"""), body)
    } finally {
      spark.streams.removeListener(listener)
      emitter.close(); receiver.close(); status.close()
    }
  }
}
