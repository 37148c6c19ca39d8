package graft

import graft.queries.R11Queries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-11 oracle-asserted streaming replay keys (the
  * DuckDB hash-match is the driver's gate; these pin the replay SEMANTICS
  * — in particular that the tercile batching actually exercises
  * cross-batch state — so a refactor that silently stops crossing batch
  * boundaries fails fast locally).
  */
class R11ReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream_scd2_replay: versions close across batch boundaries") {
    val rows = R11Queries.queries("stream_scd2_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
    // exactly-once discipline: per (user, event) at most one closed row and
    // at most one current row; closed rows carry valid_to, current rows not
    byKey.foreach { case (k, rs) =>
      assert(rs.count(_.getBoolean(5)) <= 1, s"$k emitted current twice")
      assert(rs.count(!_.getBoolean(5)) <= 1, s"$k closed twice")
    }
    rows.foreach { r =>
      if (r.getBoolean(5)) assert(r.isNullAt(4), "current row with valid_to")
      else assert(!r.isNullAt(4), "closed row without valid_to")
    }
    // cross-batch state: some version must be BOTH current (batch-final at
    // open time) and closed (by a later batch's event) — a version whose
    // open row survived a micro-batch boundary before closing
    val crossed = byKey.values.count(rs =>
      rs.exists(_.getBoolean(5)) && rs.exists(!_.getBoolean(5)))
    assert(crossed > 0, "no version crossed a batch boundary — the replay " +
      "stopped exercising cross-batch SCD2 state")
  }

  test("stream_session_replay: drained sessions respect the strict-gap rule") {
    val rows = R11Queries.queries("stream_session_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val gapUs = 1800L * 1000000L
    rows.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, st, en, n) =>
        assert(st <= en && n >= 1, s"user $u malformed session")
      }
      // consecutive sessions of one user must be separated by MORE than the
      // gap (otherwise the store would have merged them)
      sorted.sliding(2).foreach {
        case Array((_, _, en1, _), (_, st2, _, _)) =>
          assert(st2 - en1 > gapUs, s"user $u sessions closer than the gap")
        case _ =>
      }
    }
    // the sentinel user must never leak into the output
    assert(rows.forall(_._1 >= 0))
  }

  test("stream_weighted_reservoir_replay: reservoirs persist across batches") {
    val rows = R11Queries.queries(
        "stream_weighted_reservoir_replay")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // weights restricted to {1,2}; priorities in (0,1]; ranks 1..16
    assert(rows.forall(r => r._4 == 1L || r._4 == 2L))
    assert(rows.forall(r => r._5 > 0.0 && r._5 <= 1.0))
    assert(rows.forall(r => r._2 >= 1L && r._2 <= 16L))
    // cross-batch state: some doc must be emitted in more than one batch
    // (n ≥ 2 means it survived at the same rank across ≥2 touched batches)
    assert(rows.exists(_._6 >= 2L),
      "no reservoir entry survived a batch boundary at a stable rank")
    // the A-ES bitwise contract the oracle relies on: w=1 ⇒ p = u,
    // w=2 ⇒ p = sqrt(u) with u = (hash52+1)/2^52
    rows.foreach { case (_, _, id, w, p, _) =>
      val u = (graft.streaming.KmvStream.hash52(id.toString) + 1).toDouble /
        4503599627370496L.toDouble
      val expect = if (w == 1L) u else math.sqrt(u)
      assert(p == expect, s"doc $id priority not bitwise fdlibm-reproducible")
    }
  }
}
