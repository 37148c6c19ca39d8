package graft

import graft.streaming.WinnowingStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming winnowing admission dedup: the row-local fingerprint set must
  * byte-match the batch operator's, and the stateful stage must link
  * fingerprint-sharing arrivals across micro-batches.
  */
class WinnowingStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(n: Int, p: String): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  test("fingerprintHits: row-local set equals the batch winnowing " +
    "selections on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val streaming = WinnowingStream.fingerprintHits(docs)
      .collect().map(h => (h.doc_id, h.h)).toSet
    val batch = graft.ext.TextAnalysis.winnowingSelections(docs)
      .select("doc_id", "h").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streaming === batch)
  }

  test("fingerprintHits: docs under 8 tokens emit nothing (no full window)") {
    val docs = Seq((1L, toks(7, "a")), (2L, toks(8, "b"))).toDF("doc_id", "text")
    val got = WinnowingStream.fingerprintHits(docs).collect()
    assert(got.forall(_.doc_id == 2L) && got.nonEmpty)
  }

  test("streaming candidates link fingerprint-sharing docs across " +
    "micro-batches; pair recovery matches batch winnowingPairs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shared = toks(20, "s")
    val d1 = (1L, shared + " " + toks(15, "a"))
    val d2 = (2L, toks(15, "b") + " " + shared)
    val d9 = (9L, toks(40, "z"))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val cands = WinnowingStream.candidates(
      WinnowingStream.fingerprintHits(docs))
    val q = cands.writeStream.format("memory").queryName("winnow")
      .outputMode("append").start()
    try {
      input.addData(d2, d9) // d2 seeds the shared-run hashes
      q.processAllAvailable()
      assert(spark.table("winnow").isEmpty, "no overlap yet")
      input.addData(d1) // overlaps d2 in a later micro-batch
      q.processAllAvailable()
      val pairs = spark.table("winnow").as[WinnowingStream.Cand].collect()
      val counted = pairs.groupBy(c => (c.ida, c.idb))
        .view.mapValues(_.map(_.h).distinct.length).toMap
      val strong = counted.filter(_._2 >= 3).keySet
      val batchPairs = graft.ext.Dedup.winnowingPairs(
        Seq(d1, d2, d9).toDF("doc_id", "text"), minShared = 3)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(strong === batchPairs, s"streamed $counted vs batch $batchPairs")
      assert(!counted.keySet.exists { case (a, b) => a == 9L || b == 9L })
    } finally q.stop()
  }
}
