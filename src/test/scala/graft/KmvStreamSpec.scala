package graft

import graft.streaming.KmvStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV stream: hash contract vs the batch SQL expression, batch==stream
  * parity under any micro-batch split, order independence, small regime.
  */
class KmvStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words =
    (1 to 200).map(i => s"tok$i ngram shingle $i") // 200 distinct items

  test("hash52 matches conv(substring(md5(x),1,13),16,10) bit for bit") {
    val fromSql = words.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 13), 16, 10).cast("long"))
      .as[Long].collect()
    assert(fromSql.toSeq == words.map(KmvStream.hash52),
      "stream-side hash must equal the batch SQL hash")
  }

  test("stream state across micro-batches equals the direct k-min set; estimate pinned") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 16
    val input = MemoryStream[KmvStream.Item]
    val q = KmvStream.distinctEstimate(input.toDS(), k)
      .writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      // three batches, shuffled deterministically, with cross-batch repeats
      val all = words ++ words.take(50)
      val perm = all.sortBy(s => KmvStream.hash52(s.reverse))
      perm.grouped(90).foreach { chunk =>
        input.addData(chunk.map(KmvStream.Item("g", _)): _*)
        q.processAllAvailable()
      }
      val last = spark.table("kmv").as[KmvStream.KmvRow].collect()
        .filter(_.group == "g").last
      val direct = words.map(KmvStream.hash52).distinct.sorted.take(k)
      assert(last.nTracked == k)
      assert(last.kthHash.contains(direct.last),
        "streamed kth-min must equal the direct kth smallest distinct hash")
      val expectEst = (k - 1).toDouble * 4503599627370496L.toDouble /
        direct.last.toDouble
      assert(last.est.contains(expectEst), "estimate must be the pinned expression")
    } finally q.stop()
  }

  test("transition is order-independent: two interleavings, identical state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def run(items: Seq[String]): List[Long] = {
      val st = TestGroupState.create[KmvStream.Sketch](
        Optional.empty[KmvStream.Sketch](), GroupStateTimeout.NoTimeout,
        1000L, Optional.empty[Long](), hasTimedOut = false)
      KmvStream.transition("g", items.map(KmvStream.Item("g", _)).iterator,
        st, 8).foreach(_ => ())
      st.get.mins
    }
    val a = run(words)
    val b = run(words.reverse ++ words) // reversed + full repeat
    assert(a == b, "KMV state must not depend on arrival order or repeats")
    assert(a.size == 8 && a == a.sorted && a.distinct == a)
  }

  test("below k the tracked count is the exact distinct count") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[KmvStream.Sketch](
      Optional.empty[KmvStream.Sketch](), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out = KmvStream.transition("g",
      Seq("a", "b", "a", "c", "b").map(KmvStream.Item("g", _)).iterator,
      st, 64).toSeq
    assert(out.head.nTracked == 3 && out.head.kthHash.isEmpty &&
      out.head.est.isEmpty)
  }
}
