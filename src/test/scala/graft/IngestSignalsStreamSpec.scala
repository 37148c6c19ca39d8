package graft

import graft.ext.{BpeTrainer, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
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

  test("DSIR inline twin equals the batch explode+reduce form, zero shuffle") {
    import graft.ext.Selection
    // read directly: Synth's loader repartitions small files (a source
    // artifact, not part of the scoring plan under test)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 5 = 0 THEN text || ' wikipedia citation' ELSE text END AS text",
        "CAST(doc_id % 5 = 0 AS BIGINT) AS y")
    val m = Selection.dsirTrain(docs)
    val batch = Selection.dsirScore(docs, m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val inline = Selection.dsirBitsInline(docs.select("doc_id", "text"), m)
      .select("doc_id", "n_tokens", "dsir_bits").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(inline == batch, "inline DSIR twin diverged from batch")
    val plan = Selection.dsirBitsInline(
      docs.select("doc_id", "text"), m).queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "dsirBitsInline must not shuffle (ingest-time row-local fold)")
  }

  test("classifier + DSIR scoring run on a stream, values match batch") {
    import graft.ext.Selection
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq(
      (1L, "the of and to in is the of and to in is", 1L),
      (2L, "big data column batch vector merge quack", 0L),
      (3L, "the of and to in is the of and scan row", 1L),
      (4L, "scan join filter order group window sort", 0L))
      .toDF("doc_id", "text", "y")
    val w = Selection.trainQualityLsq(train)
    val m = Selection.dsirTrain(train)
    val batchScores = Selection.scoreQuality(train, w).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val input = MemoryStream[(Long, String, Long)]
    val inDf = input.toDF().toDF("doc_id", "text", "y")
    // dsirBitsInline preserves its input columns, so the classifier score
    // chains after it — both signals ride one row-local projection
    val q = Selection.scoreQuality(Selection.dsirBitsInline(inDf, m)
        .withColumnRenamed("dsir_bits", "db"), w)
      .writeStream.format("memory").queryName("sel_scores")
      .outputMode("append").start()
    val q2 = Selection.dsirBitsInline(inDf, m)
      .select("doc_id", "dsir_bits")
      .writeStream.format("memory").queryName("sel_dsir")
      .outputMode("append").start()
    try {
      input.addData((1L, "the of and to in is the of and to in is", 1L),
        (2L, "big data column batch vector merge quack", 0L))
      q.processAllAvailable(); q2.processAllAvailable()
      val scores = spark.table("sel_scores").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      val bits = spark.table("sel_dsir").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_bits")).toMap
      assert(scores(1L) == batchScores(1L), "stream score != batch score")
      assert(scores(2L) == batchScores(2L))
      assert(bits(1L) > bits(2L),
        "target-domain doc must carry higher importance at ingest")
    } finally { q.stop(); q2.stop() }
  }

  test("Bloom membership tests at ingest: stream == batch, zero shuffle, no FN") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val standing = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bloom = graft.ext.Dedup.bloomBuild(standing)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .withColumn("bloom_hit", graft.ext.Dedup.bloomHitCol(col("text"), bloom))
      .writeStream.format("memory").queryName("bloom_ingest")
      .outputMode("append").start()
    try {
      input.addData((10L, "alpha beta gamma"), (11L, "totally fresh content"))
      q.processAllAvailable()
      val out = spark.table("bloom_ingest").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("bloom_hit")).toMap
      assert(out(10L), "a standing-corpus duplicate must hit at ingest (no FN)")
      // batch twin agrees row-for-row
      val batch = Seq((10L, "alpha beta gamma"), (11L, "totally fresh content"))
        .toDF("doc_id", "text")
        .withColumn("bloom_hit", graft.ext.Dedup.bloomHitCol(col("text"), bloom))
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(out == batch, "stream Bloom decisions diverged from batch")
      val plan = standing
        .withColumn("bloom_hit", graft.ext.Dedup.bloomHitCol(col("text"), bloom))
        .queryExecution.executedPlan
      assert(!plan.toString.contains("Exchange"),
        "Bloom membership must not shuffle (frozen filter literal)")
    } finally q.stop()
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
