package graft

import graft.streaming.NearDupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup detection: row-local buckets must equal
  * the batch operator's, and the stateful stage must link arrivals across
  * micro-batches to the bucket canonical.
  */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // same text as ExtSpec's doc 0 — a pair proven to band-collide at 8×4
  private val a0 = "the quick brown fox jumps over the lazy dog again and again today " +
    "while the patient heron waits beside the quiet river watching silver " +
    "fish drift slowly between the smooth stones under the morning light"
  private val b0 = "spark engines shuffle partitions across executors with hash exchanges " +
    "while catalyst rewrites logical plans into efficient physical operators"
  private val unrelated = "completely different content about databases and optimizers " +
    "running deterministic benchmarks across many scale factors tonight"

  test("bucketHits: row-local signature equals the batch band buckets") {
    val docs = Seq((1L, a0), (2L, b0)).toDF("doc_id", "text")
    val streamingHits = NearDupStream.bucketHits(docs)
      .collect().map(h => (h.band, h.bucket, h.doc_id)).toSet
    // batch path: the INDEPENDENT explode+agg reference chain → same
    // band/bucket construction (minhashSignatureRows itself now routes
    // through minhash_sig, so comparing against it would be circular)
    val sig = graft.ext.TextAnalysis.minhashSignatureRowsAgg(docs, 32)
    val rows = 8
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (0 until rows).map(r => col(s"h${b * rows + r}").cast("string")): _*)).as("bucket"))
    }
    val batchHits = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(streamingHits == batchHits)
  }

  test("bucketHits: short docs (no shingles) produce no hits") {
    val docs = Seq((9L, "two tokens")).toDF("doc_id", "text")
    assert(NearDupStream.bucketHits(docs).collect().isEmpty)
  }

  test("streaming candidates link near-dups across micro-batches to the canonical") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // 8 bands × 4 rows: recall-leaning banding for short test docs (the
    // production default is the precision-leaning 4×8, as in batch)
    val cands = NearDupStream.candidates(NearDupStream.bucketHits(docs, bands = 8))
    val q = cands.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      // batch 1: two distinct docs seed their buckets
      input.addData((1L, a0), (50L, unrelated))
      q.processAllAvailable()
      val afterSeed = spark.table("neardup").as[NearDupStream.Cand].collect()
      assert(afterSeed.isEmpty, s"distinct docs must not pair: ${afterSeed.toSeq}")
      // batch 2: a near-dup of doc 1 arrives → candidate edge to canonical 1
      input.addData((7L, a0 + " with a small tail"))
      q.processAllAvailable()
      val pairs = spark.table("neardup").as[NearDupStream.Cand].collect()
        .map(c => (c.ida, c.idb)).distinct
      assert(pairs.contains((1L, 7L)), s"expected (1,7) in ${pairs.toSeq}")
      assert(!pairs.exists { case (x, y) => Set(x, y).contains(50L) })
      // batch 3: an exact copy with a SMALLER id takes over as canonical —
      // the old canonical is linked to it
      input.addData((0L, a0))
      q.processAllAvailable()
      val after = spark.table("neardup").as[NearDupStream.Cand].collect()
        .map(c => (c.ida, c.idb)).distinct
      assert(after.contains((0L, 1L)), s"expected takeover edge (0,1) in ${after.toSeq}")
    } finally q.stop()
  }
}
