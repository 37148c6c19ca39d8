package graft.metrics

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** The reference's complete statsd metric name surface
  * (src/status.rs:42-71, README.adoc:469-516), composed under the `hotdog.`
  * prefix (src/main.rs:115 `.named("hotdog")`).
  *
  * Code-vs-README divergence in the reference, resolved in the README's
  * favor here: the code's strum `IntoStaticStr` drops the `{topic}` /
  * `{errcode}` struct fields, so it actually emits bare `kafka.submitted` /
  * `kafka.producer.error` — while README.adoc:487-495 documents the suffixed
  * `kafka.submitted.<topicname>` / `kafka.producer.error.*` forms. The
  * suffixed names are strictly more useful and are what we emit. Also:
  * `error.full_internal_queue`, `error.internal_push_failed`, and the two
  * merge-error counters are DECLARED in src/status.rs but have no emission
  * call sites; we emit `error.merge_target_not_json` for real (the cascade
  * tags merge failures) and document the rest as structurally absent —
  * graft's plan-time template compilation cannot fail per row
  * (`error.topic_parse_failed`), and its bounded `observe` side-channel has
  * no internal queue to overflow.
  */
object Stats {
  val Prefix = "hotdog"

  // gauges
  val Connections = s"$Prefix.connections"
  // counters
  val Lines = s"$Prefix.lines"
  val KafkaSubmitted = s"$Prefix.kafka.submitted"
  def kafkaSubmitted(topic: String) = s"$Prefix.kafka.submitted.$topic"
  def kafkaProducerError(errcode: String) = s"$Prefix.kafka.producer.error.$errcode"
  val LogParseError = s"$Prefix.error.log_parse"
  val TopicParseFailed = s"$Prefix.error.topic_parse_failed"
  val MergeTargetNotJson = s"$Prefix.error.merge_target_not_json"
  val MergeInvalidJson = s"$Prefix.error.merge_of_invalid_json"
  val FullInternalQueue = s"$Prefix.error.full_internal_queue"
  val InternalPushFailed = s"$Prefix.error.internal_push_failed"
  // timers
  val KafkaProducerSent = s"$Prefix.kafka.producer.sent"

  /** The reference's producer-error → metric-name mapping
    * (src/sink/kafka.rs:203-208): lowercase, first whitespace-separated
    * word of the error string, "unknown" when empty. */
  def metricNameFor(err: String): String =
    err.toLowerCase.split(' ').headOption.filter(_.nonEmpty).getOrElse("unknown")
}

/** Minimal statsd UDP emitter (the line protocol is public:
  * `<name>:<value>|c` counters, `|g` gauges, `|ms` timers). One datagram per
  * metric, fire-and-forget — operationally identical to the reference's
  * dipstick queue draining to UDP (src/main.rs:113-118).
  */
final class StatsdEmitter(host: String, port: Int) extends AutoCloseable {
  private val socket = new DatagramSocket()
  private val addr = InetAddress.getByName(host)

  private def send(line: String): Unit = {
    val bytes = line.getBytes(StandardCharsets.UTF_8)
    try socket.send(new DatagramPacket(bytes, bytes.length, addr, port))
    catch { case _: java.io.IOException => () } // fire-and-forget, like statsd itself
  }

  def counter(name: String, value: Long): Unit = if (value != 0) send(s"$name:$value|c")
  def gauge(name: String, value: Long): Unit = send(s"$name:$value|g")
  def timerMs(name: String, millis: Long): Unit = send(s"$name:$millis|ms")

  override def close(): Unit = socket.close()
}
