package graft

import graft.streaming.WeightedReservoirStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A-ES weighted reservoir: priority contract vs the batch expression,
  * batch==stream parity under scrambled micro-batch splits, order
  * independence, bounded state, weight-proportional selection.
  */
class WeightedReservoirStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed planted weights: doc_id 1..120, weight = 1 + (id*7 mod 40)
  private val docs: Seq[(Long, Long)] =
    (1L to 120L).map(i => (i, 1L + (i * 7) % 40))

  test("stream-side priority equals the batch strict_pow column bit for bit") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fromSql = docs.toDF("doc_id", "w")
      .select(call_function("strict_pow",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("long") + 1).cast("double") / lit(4503599627370496L).cast("double"),
        lit(1.0) / col("w").cast("double")))
      .as[Double].collect()
    val fromJvm = docs.map { case (id, w) =>
      WeightedReservoirStream.priority(id, w) }
    assert(fromSql.toSeq == fromJvm,
      "fdlibm on both sides ⇒ bitwise-equal priorities")
  }

  test("streamed reservoir equals the batch top-k, priorities included") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 16
    val input = MemoryStream[WeightedReservoirStream.Doc]
    val q = WeightedReservoirStream.sample(input.toDS(), k)
      .writeStream.format("memory").queryName("wres")
      .outputMode("update").start()
    try {
      // scrambled micro-batches with cross-batch re-arrivals
      val all = docs ++ docs.take(30)
      val perm = all.sortBy { case (id, _) =>
        graft.streaming.KmvStream.hash52(s"perm$id") }
      perm.grouped(45).foreach { chunk =>
        input.addData(chunk.map { case (id, w) =>
          WeightedReservoirStream.Doc("g", id, w) }: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("wres")
        .as[WeightedReservoirStream.ResRow].collect()
        .filter(_.group == "g")
        .groupBy(_.rank).map { case (_, rows) => rows.last }
        .toSeq.sortBy(_.rank)
        .map(r => (r.rank, r.docId, r.weight, r.priority))
      val batch = graft.ext.Selection.weightedReservoir(
        docs.toDF("doc_id", "n_chars"), k)
        .as[(Int, Long, Long, Double)].collect().toSeq
      assert(streamed == batch,
        "final streamed reservoir must byte-equal the batch draw")
    } finally q.stop()
  }

  test("transition is order-independent; re-arrivals are no-ops; state ≤ k") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def run(items: Seq[(Long, Long)], k: Int): List[WeightedReservoirStream.Entry] = {
      val st = TestGroupState.create[WeightedReservoirStream.Reservoir](
        Optional.empty[WeightedReservoirStream.Reservoir](),
        GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long](),
        hasTimedOut = false)
      WeightedReservoirStream.transition("g",
        items.map { case (id, w) =>
          WeightedReservoirStream.Doc("g", id, w) }.iterator, st, k)
        .foreach(_ => ())
      st.get.entries
    }
    val a = run(docs, 8)
    val b = run(docs.reverse ++ docs, 8)
    assert(a == b, "reservoir must not depend on arrival order or repeats")
    assert(a.size == 8 &&
      a.map(_.priority) == a.map(_.priority).sorted.reverse)
  }

  test("selection is weight-proportional: heavy docs dominate the draw") {
    // 200 docs: even ids weight 40, odd ids weight 1 — the reservoir
    // should be nearly all heavy (deterministic given the hash)
    val mixed = (1L to 200L).map(i => (i, if (i % 2 == 0) 40L else 1L))
    val r = graft.ext.Selection.weightedReservoir(
      mixed.toDF("doc_id", "n_chars"), 16)
      .as[(Int, Long, Long, Double)].collect()
    val heavy = r.count(_._3 == 40L)
    assert(heavy >= 13, s"expected heavy-weight dominance, got $heavy/16")
  }
}
