package graft

import java.nio.file.Files
import graft.config._
import graft.queries.Synth
import graft.sinks.RoutedSink
import graft.streaming.GraftPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming surface end-to-end: file source → cascade → routed parquet
  * sink with a DECLARED schema destination (typed decode), checkpointed
  * AvailableNow execution, and exactly-once restart behavior.
  */
class StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeLines(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)

  test("file stream → declared-schema routed parquet, then restart is a no-op") {
    val in = Files.createTempDirectory("graft-stream-in")
    val out = Files.createTempDirectory("graft-stream-out")
    writeLines(in, "a.txt", Seq(
      """<13>1 2020-04-15T21:16:43.268478-07:00 coconut tyler - - - {"meta":{"topic":"tp"},"k":7}""",
      """<13>1 2020-04-15T21:16:43.268478-07:00 coconut tyler - - - some junk""",
      "not syslog"))

    // declare a typed schema for destination tp
    val cfg = Synth.HotdogConfig.copy(schemas = Map("tp" -> TopicSchema("tp", List(
      "k" -> FieldType.Lng,
      "meta" -> FieldType.Struct(List("topic" -> FieldType.Str))))))

    def runOnce(): Unit = {
      val routed = GraftPipeline.transform(cfg,
        spark.readStream.text(in.toString).withColumnRenamed("value", "line"))
      val q = routed.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$out/_checkpoint")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          RoutedSink.writeRouted(batch, cfg, out.toString)
        }
        .start()
      q.awaitTermination()
    }
    runOnce()

    // declared destination decoded to typed columns
    val tp = spark.read.parquet(s"$out/topic=tp")
    assert(tp.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val row = tp.collect().head
    assert(row.getAs[Long]("k") == 7L)
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("topic") == "tp")

    // undeclared destination: raw value payload, topic partition dir
    val unknown = spark.read.parquet(out.toString)
    assert(unknown.filter(unknown("topic") === "logs-unknown").count() == 1)

    // restart with no new input: checkpoint makes it a no-op (no dup rows)
    runOnce()
    assert(spark.read.parquet(s"$out/topic=tp").count() == 1)
  }

  test("inferred-schema sink: JSON destinations typed, non-JSON batch discarded") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-infer-out")
    val routed = Seq(
      ("tj", """{"k": 1, "s": "x"}"""),
      ("tj", """{"k": 2, "s": "y"}"""),
      ("raw", "not json at all")).toDF("topic", "value")
    RoutedSink.writeRouted(routed, Synth.HotdogConfig, out.toString, inferUndeclared = true)
    val tj = spark.read.parquet(s"$out/topic=tj")
    assert(tj.schema("k").dataType == org.apache.spark.sql.types.LongType)
    assert(tj.count() == 2)
    // non-JSON destination: inference fails → batch discarded (reference
    // src/sink/parquet.rs:213-221)
    assert(!Files.exists(out.resolve("topic=raw")))
  }

  test("watermarked tumbling windows: on-time counted, too-late dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val routed = input.toDF().toDF("sec", "topic")
      .withColumn("et", org.apache.spark.sql.functions.timestamp_seconds($"sec" + 1000000000L))
    val counts = GraftPipeline.windowedTopicCounts(routed, "10 seconds", "60 seconds")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("wtc").start()
    try {
      input.addData((5L, "a"), (15L, "a"), (65L, "b"))
      q.processAllAvailable()
      // advance watermark far past the first windows → they close and emit
      input.addData((500L, "c"))
      q.processAllAvailable()
      // an event for an already-closed window is dropped by the watermark
      input.addData((6L, "a"), (505L, "c"))
      q.processAllAvailable()
      input.addData((900L, "d"))
      q.processAllAvailable()
      val out = spark.table("wtc")
        .select($"topic", $"n").as[(String, Long)].collect().toSet
      assert(out.contains(("a", 2L)), s"got $out") // late (6,"a") NOT recounted
      assert(out.contains(("b", 1L)), s"got $out")
    } finally q.stop()
  }

  test("streaming exact dedup: duplicates within the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val deduped = input.toDF().toDF("sec", "value")
      .withColumn("et", timestamp_seconds($"sec" + 1000000000L))
      .withWatermark("et", "60 seconds")
      .dropDuplicatesWithinWatermark("value")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddw").start()
    try {
      input.addData((1L, "a"), (2L, "a"), (3L, "b")) // dup "a" within watermark
      q.processAllAvailable()
      input.addData((500L, "c"))
      q.processAllAvailable()
      val vals = spark.table("ddw").select("value").as[String].collect().toSeq
      assert(vals.count(_ == "a") == 1, s"got $vals")
      assert(vals.contains("b") && vals.contains("c"))
    } finally q.stop()
  }

  test("observed metrics reach query progress (lines / error.log_parse)") {
    val in = Files.createTempDirectory("graft-obs-in")
    val out = Files.createTempDirectory("graft-obs-out")
    writeLines(in, "a.txt", Seq(
      "<13>1 2020-01-01T00:00:00Z h a - - - ok line",
      "garbage!"))
    @volatile var seen: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val obs = e.progress.observedMetrics
        if (obs.containsKey("graft")) {
          val r = obs.get("graft")
          seen = Some((r.getLong(0), r.getLong(1)))
        }
      }
    }
    spark.streams.addListener(listener)
    try {
      val routed = GraftPipeline.transform(Synth.HotdogConfig,
        spark.readStream.text(in.toString).withColumnRenamed("value", "line"))
      val q = routed.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$out/_checkpoint")
        .format("noop")
        .start()
      q.awaitTermination()
      // listener delivery is async; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.contains((2L, 1L)), s"observed metrics: $seen")
    } finally spark.streams.removeListener(listener)
  }
}
