package graft

import java.nio.file.{Files, Paths}

import graft.queries.Synth
import graft.sinks.RoutedSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once contract of [[RoutedSink.writeRoutedExactlyOnce]] — the
  * parquet sibling of the Kafka client's idempotent produce: a replayed
  * foreachBatch epoch (Spark's recovery semantics) must not duplicate
  * rows, a crashed half-written epoch must be rewritten cleanly, and a
  * full stop/restart over one checkpoint must land every input row
  * exactly once.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = Synth.HotdogConfig.copy(schemas = Map.empty)

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def routedBatch(rows: (String, String)*) =
    rows.toDF("topic", "value")

  test("replayed epoch is skipped; distinct epochs append") {
    val out = tmp("eo-out")
    val b = routedBatch("t-a" -> "v1", "t-b" -> "v2")
    assert(RoutedSink.writeRoutedExactlyOnce(b, 7L, cfg, out))
    assert(!RoutedSink.writeRoutedExactlyOnce(b, 7L, cfg, out),
      "the replay of a committed epoch must be a no-op")
    assert(spark.read.parquet(out).count() == 2L,
      "replaying epoch 7 must not duplicate its rows")
    assert(RoutedSink.writeRoutedExactlyOnce(b, 8L, cfg, out))
    val df = spark.read.parquet(out)
    assert(df.count() == 4L)
    // the epoch partition column is discoverable — readers see one tree
    assert(df.select("epoch").distinct().as[Long].collect().sorted.toSeq ==
      Seq(7L, 8L))
  }

  test("a crashed half-written epoch (data, no marker) is rewritten, not doubled") {
    val out = tmp("eo-crash")
    val b = routedBatch("t-a" -> "v1", "t-a" -> "v2", "t-b" -> "v3")
    // simulate the crash window: data landed, marker never created
    RoutedSink.writeRouted(b, cfg, Paths.get(out, "epoch=3").toString)
    assert(spark.read.parquet(out).count() == 3L)
    // recovery replays epoch 3 — the partial tree must be replaced
    assert(RoutedSink.writeRoutedExactlyOnce(b, 3L, cfg, out))
    assert(spark.read.parquet(out).count() == 3L,
      "the partial epoch must be deleted before the rewrite")
    assert(Files.exists(Paths.get(out, "_commits", "3")))
  }

  test("stop/restart over one checkpoint: every row exactly once end to end") {
    val in = tmp("eo-in"); val out = tmp("eo-sink"); val ck = tmp("eo-ck")
    def writeInput(name: String, lines: Seq[String]): Unit =
      Files.writeString(Paths.get(in, name), lines.mkString("", "\n", "\n"))
    def runOnce(): Unit = {
      val routed = spark.readStream.schema("topic string, value string")
        .json(in)
      val q = routed.writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          RoutedSink.writeRoutedExactlyOnce(batch, id, cfg, out): Unit
        }
        .start()
      q.awaitTermination(60000)
    }
    writeInput("a.json", Seq(
      """{"topic":"t-a","value":"r1"}""", """{"topic":"t-b","value":"r2"}"""))
    runOnce()
    writeInput("b.json", Seq("""{"topic":"t-a","value":"r3"}"""))
    runOnce()
    val got = spark.read.parquet(out)
      .select("topic", "value").as[(String, String)].collect().sorted.toSeq
    assert(got == Seq("t-a" -> "r1", "t-a" -> "r3", "t-b" -> "r2"),
      s"restart must neither lose nor duplicate rows: $got")
  }
}
