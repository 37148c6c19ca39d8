package graft

import graft.ext.TextAnalysis
import graft.streaming.PackStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming packing: cross-batch cumulative fill per shard, and
  * stream == batch under the in-order arrival contract.
  */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bins fill across micro-batches; stream equals batch packBins") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)] // (shard, doc_id, n_tokens)
    val q = PackStream.pack(input.toDF().toDF("shard", "doc_id", "n_tokens"), 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_stream").start()
    try {
      // shard 0: 4+5 tokens in batch 1 (bin 0), batch 2's doc starts at
      // cum=9 → bin 0 (start-offset rule: 9/10=0), next at 16 → bin 1
      input.addData((0L, 1L, 4L), (0L, 2L, 5L), (1L, 3L, 12L))
      q.processAllAvailable()
      input.addData((0L, 4L, 7L), (0L, 5L, 3L), (1L, 6L, 1L))
      q.processAllAvailable()
      val out = spark.table("pack_stream")
        .as[PackStream.PackedDoc].collect().map(p => p.doc_id -> p.bin).toMap
      assert(out === Map(1L -> 0L, 2L -> 0L, 4L -> 0L, 5L -> 1L,
        3L -> 0L, 6L -> 1L), s"got $out")

      // parity with the batch window rule on the same rows, same order
      val docs = Seq((1L, "a b c d"), (2L, "a b c d e"), (4L, "a b c d e f g"),
        (5L, "a b c"), (3L, "a b c d e f g h i j k l"), (6L, "a"))
        .toDF("doc_id", "text")
      // batch shards by doc_id % shards — feed ids chosen so shard ≡ stream
      val batch = TextAnalysis.packBins(docs, 10L, shards = 2)
        .select(col("doc_id"), col("bin")).as[(Long, Long)].collect().toMap
      // shard of id: 1,3,5 → 1? batch shard = doc_id % 2: ids 1,3,5 shard 1;
      // 2,4,6 shard 0 — different grouping than the stream fixture, so
      // compare per-shard sequences instead: re-run the stream grouping
      val streamTwin = PackStream.pack(
        docs.select((col("doc_id") % 2).as("shard"), col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        10L).as[PackStream.PackedDoc].collect().map(p => p.doc_id -> p.bin).toMap
      assert(streamTwin === batch,
        s"batch rule and stream rule must agree: $streamTwin vs $batch")
    } finally q.stop()
  }
}
