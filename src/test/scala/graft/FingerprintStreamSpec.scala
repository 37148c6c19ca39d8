package graft

import graft.streaming.FingerprintStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streamed provenance receipts must EQUAL the batch manifest — every
  * fingerprint component is a commutative monoid, so arrival order and
  * micro-batch splits cannot change a bit.
  */
class FingerprintStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed shard fingerprints equal the batch manifest bit for bit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // batch truth: the oracle-checked key itself
    val batch = SparkEntry.queries("corpus_dataset_fingerprint")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // stream the same docs in a scrambled order across three micro-batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        conv(substring(md5(col("text")), 1, 13), 16, 10).cast("long").as("h"),
        col("n_chars"))
      .select(expr("h % 16").as("shard"), col("h"), col("n_chars").as("nChars"))
      .as[FingerprintStream.Doc]
      .collect().toSeq
      .sortBy(d => d.h ^ 0x5DEECE66DL)
    val input = MemoryStream[FingerprintStream.Doc]
    val q = FingerprintStream.fingerprints(input.toDS())
      .writeStream.format("memory").queryName("fps")
      .outputMode("update").start()
    try {
      docs.grouped(math.max(1, docs.size / 3)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      // last emission per shard is the converged receipt
      val rows = spark.table("fps").as[FingerprintStream.ShardFP].collect()
      val streamed = rows.zipWithIndex.groupBy(_._1.shard)
        .map { case (s, v) => val fp = v.maxBy(_._2)._1
          s -> (fp.n, fp.chars, fp.xor, fp.sum, fp.min, fp.max) }
      assert(streamed == batch,
        s"streamed receipts must equal the batch manifest\n$streamed\nvs\n$batch")
    } finally q.stop()
  }
}
