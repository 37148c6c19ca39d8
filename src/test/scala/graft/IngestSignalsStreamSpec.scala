package graft

import graft.ext.{BpeTrainer, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time curation signals: the row-local twins (repetition stats,
  * BPE token counts) must agree with their batch/relational forms and run
  * unchanged on a stream — pure projections, no state, no shuffle, so the
  * gate decisions happen in the micro-batch that admits the document.
  */
class IngestSignalsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val trainDocs = Seq(
    (10L, "aaa aaa ab aaa"),
    (11L, "ab ab aaa ab")).toDF("doc_id", "text")

  test("tokensInline equals the vocab-join tokenCounts, zero shuffle") {
    val merges = BpeTrainer.train(trainDocs, merges = 2)
    val inline = BpeTrainer.tokensInline(trainDocs, merges)
      .select("doc_id", "ws_tokens", "bpe_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val joined = BpeTrainer.tokenCounts(trainDocs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(inline == joined, s"inline twin diverged: $inline vs $joined")
    val plan = BpeTrainer.tokensInline(trainDocs, merges)
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "tokensInline must not shuffle (ingest-time row-local count)")
  }

  test("repetition + BPE counting run on a stream, values match batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val merges = BpeTrainer.train(trainDocs, merges = 2)
    val input = MemoryStream[(Long, String)]
    val signals = BpeTrainer.tokensInline(
      TextAnalysis.repetitionInline(input.toDF().toDF("doc_id", "text")),
      merges)
    val q = signals.writeStream.format("memory").queryName("ingest_signals")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b c a b c a b c"), (2L, "aaa ab unique"))
      q.processAllAvailable()
      val out = spark.table("ingest_signals").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("dup3_x10000"), r.getAs[Long]("bpe_tokens")))).toMap
      // doc 1: all 3-grams duplicated; no merge applies to single chars →
      // bpe = char count 9. doc 2: aaa→[aa,a]=2, ab→[ab]=1, unique→6 chars
      assert(out(1L) == ((10000L, 9L)))
      assert(out(2L) == ((0L, 9L)))
    } finally q.stop()
  }
}
