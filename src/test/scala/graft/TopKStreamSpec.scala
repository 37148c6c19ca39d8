package graft

import graft.streaming.TopKStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Space-saving top-k stream: exactness under capacity, the overestimate
  * guarantee beyond it, bounded state, deterministic eviction.
  */
class TopKStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lastBatchTop(rows: Seq[TopKStream.TopEntry], group: String)
      : Seq[TopKStream.TopEntry] = {
    // Update mode re-emits per batch; the LAST emission per (group, rank)
    // is the converged table
    rows.zipWithIndex.filter(_._1.group == group)
      .groupBy(_._1.rank).toSeq
      .map { case (_, v) => v.maxBy(_._2)._1 }
      .sortBy(_.rank)
  }

  test("under capacity the counter table is exact across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TopKStream.Item]
    val q = TopKStream.topK(input.toDS(), k = 3, capacity = 16)
      .writeStream.format("memory").queryName("sstop")
      .outputMode("update").start()
    try {
      input.addData(Seq("a", "a", "b", "c", "a").map(TopKStream.Item("g1", _)): _*)
      q.processAllAvailable()
      input.addData(Seq("b", "b", "b", "a", "d").map(TopKStream.Item("g1", _)): _*)
      q.processAllAvailable()
      val top = lastBatchTop(
        spark.table("sstop").as[TopKStream.TopEntry].collect().toSeq, "g1")
      // exact counts: a=4, b=4, c=1, d=1; rank ties break item ASC
      assert(top.map(e => (e.rank, e.item, e.count, e.err)) ==
        Seq((1, "a", 4L, 0L), (2, "b", 4L, 0L), (3, "c", 1L, 0L)))
    } finally q.stop()
  }

  test("beyond capacity: bounded state, count >= true >= count - err, heavy item kept") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[TopKStream.SS](
      Optional.empty[TopKStream.SS](), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    // 30 arrivals, 10 distinct, capacity 4: "hot" arrives 12 times,
    // "warm" 6, the rest singletons interleaved to force evictions
    val items = (Seq.fill(6)("hot") ++ Seq("x1", "x2") ++ Seq.fill(3)("warm") ++
      Seq("x3", "x4", "x5") ++ Seq.fill(6)("hot") ++ Seq("x6", "x7") ++
      Seq.fill(3)("warm") ++ Seq("x8")).map(TopKStream.Item("g", _))
    val out = TopKStream.transition("g", items.iterator, st, k = 4, capacity = 4).toSeq
    val stateEntries = st.get.entries
    assert(stateEntries.size <= 4, s"state must stay bounded: $stateEntries")
    val n = items.size.toLong
    val trueCounts = items.groupBy(_.item).map { case (i, v) => i -> v.size.toLong }
    stateEntries.foreach { c =>
      val t = trueCounts(c.item)
      assert(c.count >= t && c.count - c.err <= t,
        s"space-saving envelope violated for $c (true $t)")
    }
    // any item with true frequency > n/capacity is guaranteed tracked
    val guaranteed = trueCounts.filter(_._2 > n / 4).keys.toSet
    assert(guaranteed.subsetOf(stateEntries.map(_.item).toSet),
      s"heavy items $guaranteed must survive, state $stateEntries")
    assert(out.head.item == "hot" && out.head.count >= 12L)
  }

  test("eviction tie-break is deterministic: largest item string goes first") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[TopKStream.SS](
      Optional.empty[TopKStream.SS](), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    // fill capacity 3 with equal-count a/b/c, then overflow with d:
    // min count ties on all three, the LARGEST (c) must be evicted
    val items = Seq("a", "b", "c", "d").map(TopKStream.Item("g", _))
    TopKStream.transition("g", items.iterator, st, k = 3, capacity = 3)
      .foreach(_ => ())
    val kept = st.get.entries.map(_.item).toSet
    assert(kept == Set("a", "b", "d"), s"expected c evicted, kept $kept")
    assert(st.get.entries.find(_.item == "d").get == TopKStream.Counter("d", 2L, 1L))
  }
}
