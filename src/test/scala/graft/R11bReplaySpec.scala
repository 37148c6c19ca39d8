package graft

import graft.queries.R11bQueries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the wave-2 oracle-asserted streaming replay keys — the
  * DuckDB hash-match is the gate; these pin that each replay actually
  * exercises CROSS-BATCH state (not three independent runs) and the
  * operator-level contracts a refactor could silently break.
  */
class R11bReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream_kmv_replay: sketches grow across batches, bounded at k") {
    val rows = R11bQueries.queries("stream_kmv_replay")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 <= 64L), "sketch exceeded k")
    // cross-batch: some group must emit DIFFERENT tracked counts across its
    // touched batches (the sketch grew over a boundary)
    assert(rows.groupBy(_._1).exists(_._2.map(_._2).distinct.size >= 2),
      "no KMV sketch grew across a batch boundary")
  }

  test("stream_hll_replay: registers rise strictly per bucket") {
    val rows = R11bQueries.queries("stream_hll_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val regs = rs.map(_._2).sorted
      assert(regs.distinct.size == regs.size, s"bucket $b re-emitted a register")
    }
    assert(rows.groupBy(_._1).exists(_._2.size >= 2),
      "no register rose across a batch boundary")
  }

  test("stream_cms_replay: per-cell running counts strictly increase") {
    val rows = R11bQueries.queries("stream_cms_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.map(_._2).distinct.size == rs.size, s"cell $c count stalled")
    }
    assert(rows.groupBy(_._1).exists(_._2.size >= 3),
      "no cell was touched in all three batches")
  }

  test("stream_fingerprint_replay: shard manifests accumulate monotonically") {
    val rows = R11bQueries.queries("stream_fingerprint_replay")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val ns = rs.map(_._2).sorted
      assert(ns.distinct.size == ns.size, s"shard $shard n_docs stalled")
      val byN = rs.sortBy(_._2)
      assert(byN.zip(byN.tail).forall { case (a, b) => a._3 <= b._3 },
        s"shard $shard total_chars not monotone")
    }
    assert(rows.groupBy(_._1).exists(_._2.size >= 3),
      "no shard was touched in all three batches")
  }

  test("stream_funnel_replay: stages are valid and progress across batches") {
    val rows = R11bQueries.queries("stream_funnel_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getLong(4)
      assert(stage >= 1L && stage <= 3L)
      assert((stage >= 2L) == !r.isNullAt(2), "stage/t_click mismatch")
      assert((stage == 3L) == !r.isNullAt(3), "stage/t_purchase mismatch")
      if (!r.isNullAt(2)) assert(r.getLong(2) > r.getLong(1), "click not after view")
      if (!r.isNullAt(3)) assert(r.getLong(3) > r.getLong(2), "purchase not after click")
    }
    // cross-batch: some user must emit at two different stages (progressed
    // over a batch boundary)
    assert(rows.groupBy(_.getLong(0))
      .exists(_._2.map(_.getLong(4)).distinct.size >= 2),
      "no user progressed across a batch boundary")
  }

  test("stream_transitions_replay: edges chain consecutively per user") {
    val rows = R11bQueries.queries("stream_transitions_replay")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    // per user: n_transitions = n_events - 1 (the Last state never drops an
    // edge at a batch boundary)
    val ev = graft.queries.Synth.eventsTs(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.length.toLong }
    got.foreach { case (u, n) =>
      assert(n == ev(u) - 1, s"user $u lost a cross-batch edge: $n vs ${ev(u) - 1}")
    }
  }

  test("stream_attribution_replay: matches respect the horizon strictly") {
    val rows = R11bQueries.queries("stream_attribution_replay")(spark, sf)
      .collect().map(_.getLong(3))
    assert(rows.nonEmpty)
    assert(rows.forall(l => l > 0L && l <= 3600L * 1000000L),
      "a match escaped the (0, horizon] bound")
  }

  test("stream_ohlc_replay: bars are internally consistent") {
    val rows = R11bQueries.queries("stream_ohlc_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c, v) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6))
      assert(l <= h && o >= l && o <= h && c >= l && c <= h && v >= 1L,
        s"malformed bar $r")
      assert(r.getLong(1) % 3600000000L == 0L, "bucket not hour-aligned")
    }
  }
}
