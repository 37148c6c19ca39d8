package graft

import graft.streaming.ExactDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** CDC-style exact dedup: one canonical per content key across
  * micro-batches, decision rows for every arrival (the ablation log).
  */
class ExactDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical-set maintenance across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = ExactDedupStream.keyed(input.toDF().toDF("doc_id", "text"))
    val q = ExactDedupStream.decisions(docs)
      .writeStream.format("memory").queryName("exdedup")
      .outputMode("append").start()
    try {
      // batch 1: two copies of A (min id 3 wins), one B
      input.addData((7L, "content A"), (3L, "content A"), (5L, "content B"))
      q.processAllAvailable()
      // batch 2: another A arrives later → rejected against canonical 3;
      // a fresh C is kept
      input.addData((1L, "content C"), (9L, "content A"))
      q.processAllAvailable()
      val d = spark.table("exdedup").as[ExactDedupStream.Decision]
        .collect().map(x => x.doc_id -> ((x.canonical, x.kept))).toMap
      assert(d(3L) == ((3L, true)))
      assert(d(7L) == ((3L, false)))
      assert(d(5L) == ((5L, true)))
      assert(d(9L) == ((3L, false))) // cross-batch: state remembers canonical
      assert(d(1L) == ((1L, true)))
      assert(d.size == 5)
    } finally q.stop()
  }
}
