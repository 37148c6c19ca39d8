package graft

import graft.streaming.HllStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HyperLogLog: bounded register state across micro-batches,
  * batch == stream register/estimate parity.
  */
class HllStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  // enough tokens that shingles exist (shingle needs ≥3 tokens)
  private val batch1 = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "zeta eta theta iota kappa lambda")
  private val batch2 = Seq(
    3L -> "alpha beta gamma delta epsilon", // pure duplicate: no reg change
    4L -> "mu nu xi omicron pi rho sigma")

  test("registers converge to the batch sketch; duplicates change nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = HllStream.registers(
        HllStream.bucketRanks(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      val after1 = spark.table("hllregs").as[HllStream.Register].collect()

      input.addData(batch2: _*)
      q.processAllAvailable()
      val updates = spark.table("hllregs").as[HllStream.Register].collect()

      // latest state per bucket = last emitted update
      val finalRegs = updates.zipWithIndex
        .groupBy(_._1.bucket).map { case (_, v) => v.maxBy(_._2)._1 }.toSeq

      // batch twin over the UNION corpus: same projection, plain max
      val expected = HllStream.bucketRanks(docsDf(batch1 ++ batch2))
        .groupBy("bucket").agg(max("rank").as("reg"))
        .as[HllStream.Register].collect()
      assert(finalRegs.map(r => r.bucket -> r.reg).toMap ==
        expected.map(r => r.bucket -> r.reg).toMap)

      // a pure duplicate doc can only re-assert existing maxima: every
      // post-batch-2 register is ≥ its batch-1 value
      val a1 = after1.map(r => r.bucket -> r.reg).toMap
      finalRegs.foreach(r => assert(a1.get(r.bucket).forall(_ <= r.reg)))
    } finally q.stop()
  }

  test("stream estimate equals the batch hllDistinct estimate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = HllStream.registers(
        HllStream.bucketRanks(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("hllest")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val updates = spark.table("hllest").as[HllStream.Register].collect()
      val finalRegs = updates.zipWithIndex
        .groupBy(_._1.bucket).map { case (_, v) => v.maxBy(_._2)._1 }.toSeq
      val streamEst = HllStream.estimate(finalRegs)
      val batchEst = graft.ext.TextAnalysis.hllDistinct(docsDf(batch1 ++ batch2))
        .select("hll_est").head().getDouble(0)
      assert(streamEst == batchEst,
        s"stream $streamEst must equal batch $batchEst bit-for-bit")
    } finally q.stop()
  }

  test("state is bounded: at most m register entries however much arrives") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // transition keeps ONE long per bucket and emits only on increase
    val st = TestGroupState.create[Long](
      Optional.of(7L), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    // lower rank: no emission, state untouched
    val none = HllStream.transition(3L,
      Iterator(HllStream.BucketRank(3L, 5L)), st)
    assert(none.isEmpty && st.get == 7L)
    // higher rank: single update row
    val one = HllStream.transition(3L,
      Iterator(HllStream.BucketRank(3L, 9L), HllStream.BucketRank(3L, 8L)), st).toSeq
    assert(one == Seq(HllStream.Register(3L, 9L)) && st.get == 9L)
  }
}
