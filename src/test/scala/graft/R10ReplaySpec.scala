package graft

import graft.queries.R10Queries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the oracle-asserted streaming replay keys (the DuckDB
  * hash-match is the driver's gate; these pin the replay SEMANTICS so a
  * refactor that breaks the state machine fails fast locally).
  */
class R10ReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream_neardup_replay: canonical is a strict running minimum") {
    val rows = R10Queries.queries("stream_neardup_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the canonical is the min of everything the bucket has seen, so every
    // emitted edge points DOWN-id; no self-edges survive the filter
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)),
      "found an edge whose canonical is not the strict minimum")
  }

  test("stream_neardup_replay: batch-0 high-id seeds are dethroned and re-emitted") {
    val rows = R10Queries.queries("stream_neardup_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // takeover edges: the wave-0 canonical (id in [1M, 2M)) must reappear as
    // idb once the smaller organic id arrives in batch 1
    val takeovers = rows.filter { case (a, b) =>
      a < 1000000L && b >= 1000000L && b < 2000000L }
    assert(takeovers.nonEmpty, "no batch-0 canonical was dethroned — the " +
      "takeover path of the state machine went unexercised")
    // wave-2 arrivals (ids ≥ 2M) are pure rejects against organic canonicals
    val wave2 = rows.filter(_._2 >= 2000000L)
    assert(wave2.nonEmpty && wave2.forall(_._1 < 1000000L),
      s"wave-2 rows must reject to organic canonicals: ${wave2.take(5).toSeq}")
  }

  test("stream_exact_dedup_replay: copy waves reject to batch-0 canonicals") {
    val rows = R10Queries.queries("stream_exact_dedup_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val copies = rows.filter(_._1 >= 1000000L)
    assert(copies.nonEmpty && copies.forall { case (_, canon, kept) =>
      canon < 1000000L && !kept },
      "every copy-wave doc must reject to an organic canonical")
  }
}
