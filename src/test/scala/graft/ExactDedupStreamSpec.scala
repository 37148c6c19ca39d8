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

  test("TTL eviction: timeout removes the canonical; a re-arrival is fresh") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // an established canonical whose retention window has passed
    val timedOut = TestGroupState.create[Long](
      Optional.of(3L), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val none = ExactDedupStream.transition(Iterator.empty, timedOut, ttlMs = 60000L)
    assert(none.isEmpty && timedOut.isRemoved)
    // the next arrival of the same content is admitted as a NEW canonical
    val fresh = TestGroupState.create[Long](
      Optional.empty[Long](), GroupStateTimeout.ProcessingTimeTimeout,
      2000L, Optional.empty[Long](), hasTimedOut = false)
    val out = ExactDedupStream.transition(
      Iterator(ExactDedupStream.Keyed("ck", 9L)), fresh, ttlMs = 60000L).toSeq
    assert(out == Seq(ExactDedupStream.Decision(9L, 9L, kept = true)))
    assert(fresh.get == 9L)
  }

  test("streaming chunk dedup: a later identical doc's chunks all reject") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val chunks = ExactDedupStream.keyedChunks(
      input.toDF().toDF("doc_id", "text"), window = 4, stride = 3)
    val q = ExactDedupStream.decisions(chunks)
      .writeStream.format("memory").queryName("chunkdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, text))
      q.processAllAvailable()
      val seed = spark.table("chunkdedup").as[ExactDedupStream.Decision].collect()
      assert(seed.nonEmpty && seed.forall(_.kept), "doc 1 seeds every chunk")
      // identical doc later: every chunk rejects to doc 1's SAME chunk_id
      // (composite id = doc·2^20 + chunk preserves the batch keeper order)
      input.addData((2L, text))
      q.processAllAvailable()
      val later = spark.table("chunkdedup").as[ExactDedupStream.Decision]
        .collect().filter(_.doc_id >= (2L << 20))
      assert(later.length == seed.length, "same fan-out for the identical doc")
      later.foreach { d =>
        assert(!d.kept, s"chunk ${d.doc_id} must reject")
        assert(d.canonical == (1L << 20) + (d.doc_id - (2L << 20)),
          s"must point at doc 1's same-position chunk: $d")
      }
    } finally q.stop()
  }
}
