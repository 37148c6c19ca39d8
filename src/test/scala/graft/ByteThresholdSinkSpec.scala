package graft

import java.nio.file.Files

import graft.queries.Synth
import graft.sinks.ByteThresholdParquetSink
import graft.streaming.GraftPipeline
import org.scalatest.funsuite.AnyFunSuite

/** The reference parquet sink's flush-trigger semantics
  * (src/sink/parquet.rs:89-230): cross-batch byte accounting, ANY
  * destination over `parquet.buffer` flushes ALL destinations, the
  * flush-interval timer fires the same drain, shutdown drains the rest.
  */
class ByteThresholdSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cfg(bufferBytes: Long, flushMs: Long = 3600000L) =
    Synth.HotdogConfig.copy(schemas = Map.empty,
      parquetBufferBytes = Some(bufferBytes), flushMs = flushMs)

  private def routedDf(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("topic", "value")
  }

  private def topicsWritten(url: String): Set[String] = {
    val d = new java.io.File(url)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.startsWith("topic=")).map(_.getName).toSet
  }

  test("byte threshold on ONE destination flushes ALL destinations") {
    val out = Files.createTempDirectory("graft-bts").toString
    val sink = new ByteThresholdParquetSink(cfg(bufferBytes = 100), out)
    // under threshold: both topics buffer, nothing is written
    sink.addBatch(routedDf("a" -> "tiny", "b" -> "small"), 0L)
    assert(topicsWritten(out).isEmpty, "no flush below the byte threshold")
    assert(sink.bufferedBytes.keySet == Set("a", "b"))
    // push ONLY topic a over 100 bytes: the reference drains the whole
    // buffer map (parquet.rs:160-168), so b's rows must land too
    sink.addBatch(routedDf("a" -> ("x" * 120)), 1L)
    assert(topicsWritten(out) == Set("topic=a", "topic=b"))
    assert(sink.bufferedBytes.isEmpty, "flush clears the byte tally")
    val rows = spark.read.parquet(out).count()
    assert(rows == 3L)
  }

  test("tally counts payload UTF-8 bytes only — no newline, bytes not chars") {
    // parquet.rs:152: bufsize += payload.len() — Rust String::len() is
    // UTF-8 bytes; the newline stored at :158 is NOT counted
    val out = Files.createTempDirectory("graft-bts-b").toString
    val sink = new ByteThresholdParquetSink(cfg(bufferBytes = 1 << 30), out)
    try {
      sink.addBatch(routedDf("a" -> "abc", "a" -> "éé"), 0L) // 3 + 4 bytes
      assert(sink.bufferedBytes == Map("a" -> 7L),
        "3 ASCII bytes + 2 two-byte chars, zero newline bytes")
    } finally sink.close()
  }

  test("flush interval drains independently of the byte threshold") {
    val out = Files.createTempDirectory("graft-bts-t").toString
    // flushMs = 0: every arrival is past the timer deadline
    val sink = new ByteThresholdParquetSink(cfg(bufferBytes = 1 << 30, flushMs = 0L), out)
    sink.addBatch(routedDf("a" -> "x"), 0L)
    assert(topicsWritten(out) == Set("topic=a"))
  }

  test("no byte threshold configured → only timer/shutdown flush") {
    val out = Files.createTempDirectory("graft-bts-n").toString
    val none = Synth.HotdogConfig.copy(schemas = Map.empty,
      parquetBufferBytes = None, flushMs = 3600000L)
    val sink = new ByteThresholdParquetSink(none, out)
    sink.addBatch(routedDf("a" -> ("x" * 100000)), 0L)
    assert(topicsWritten(out).isEmpty, "no threshold → no byte-triggered flush")
    sink.flush()
    assert(topicsWritten(out) == Set("topic=a"))
  }

  test("idle stream still drains on the flush interval (real timer)") {
    // Spark never invokes foreachBatch for empty micro-batches, so the
    // interval drain must come from the sink's own timer thread
    val out = Files.createTempDirectory("graft-bts-idle").toString
    val sink = new ByteThresholdParquetSink(
      cfg(bufferBytes = 1 << 30, flushMs = 300L), out)
    try {
      sink.addBatch(routedDf("a" -> "x"), 0L)
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (topicsWritten(out).isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(topicsWritten(out) == Set("topic=a"),
        "timer must drain the idle buffer without further arrivals")
    } finally sink.close()
  }

  test("retried micro-batch (same epoch) lands exactly once — no duplicate " +
    "rows, no double-counted tally") {
    // Spark's recovery unit: a failed foreachBatch attempt is REPLAYED
    // under the same epoch id. Inject the retry directly — add epoch 5,
    // then add it again (as the engine does after a failed attempt) —
    // and assert replace-not-append semantics end to end.
    val out = Files.createTempDirectory("graft-bts-retry").toString
    val sink = new ByteThresholdParquetSink(cfg(bufferBytes = 1 << 30), out)
    try {
      val b5 = routedDf("a" -> "first", "b" -> "second")
      sink.addBatch(b5, 5L)
      val tallyOnce = sink.bufferedBytes
      sink.addBatch(b5, 5L) // the retry
      assert(sink.bufferedBytes == tallyOnce,
        "replayed epoch must not inflate the flush tally")
      sink.addBatch(routedDf("a" -> "next"), 6L) // a later epoch appends
      sink.flush()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 3L,
        "retried epoch 5 must land its 2 rows exactly once (+1 from epoch 6)")
      import spark.implicits._
      assert(rows.select("value").as[String].collect().sorted.toSeq ==
        Seq("first", "next", "second"))
    } finally sink.close()
  }

  test("streaming end-to-end: buffered sink + shutdown flush on termination") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft-bts-s").toString
    val ckpt = Files.createTempDirectory("graft-bts-c").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val routed = input.toDF().toDF("topic", "value")
    val (q, sink) = GraftPipeline.startBufferedParquetSink(
      routed, cfg(bufferBytes = 1 << 20), out, ckpt, triggerMs = 100L)
    try {
      input.addData("a" -> "v1", "b" -> "v2")
      q.processAllAvailable()
      assert(topicsWritten(out).isEmpty, "under threshold, long timer: buffered")
      assert(sink.bufferedBytes.nonEmpty)
    } finally q.stop()
    q.awaitTermination()
    // the termination listener issues the shutdown drain (O21); listener
    // delivery is async — poll briefly
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (topicsWritten(out).isEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(topicsWritten(out) == Set("topic=a", "topic=b"))
    assert(spark.read.parquet(out).count() == 2L)
  }
}
