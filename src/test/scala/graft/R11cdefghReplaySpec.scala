package graft

import graft.queries.{R11cQueries, R11dQueries, R11eQueries, R11fQueries, R11gQueries, R11hQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the wave-3..8 oracle-asserted streaming replay keys —
  * the DuckDB hash-match is the gate; these pin that each replay
  * exercises CROSS-BATCH state and the operator contracts a refactor
  * could silently break (the R10ReplaySpec / R11ReplaySpec discipline,
  * extended over the rest of the family).
  */
class R11cdefghReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream_topk_replay: sub-capacity regime is exact and err-free") {
    val rows = R11cQueries.queries("stream_topk_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) == 0L), "exact regime must have err = 0")
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 5L))
    // cross-batch: some (group, rank) must appear with different counts
    assert(rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .exists(_._2.map(_.getLong(3)).distinct.size >= 2),
      "no counter grew across a batch boundary")
  }

  test("stream_pack_replay: bins are contiguous per shard") {
    val rows = R11cQueries.queries("stream_pack_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val bins = rs.sortBy(_._2).map(_._4)
      assert(bins.head == 0L, s"shard $shard first bin not 0")
      bins.zip(bins.tail).foreach { case (a, b) =>
        assert(b - a <= 1L && b >= a, s"shard $shard bins skipped: $a -> $b")
      }
    }
  }

  test("stream_sessionize_replay equals stream_session_replay (two state " +
    "machines, one gap rule)") {
    val custom = R11cQueries.queries("stream_sessionize_replay")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val native = graft.queries.R11Queries.queries("stream_session_replay")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(custom == native,
      "custom GroupState sessionizer and native session_window diverged")
  }

  test("stream_regression_replay: derived stats are internally consistent") {
    val rows = R11cQueries.queries("stream_regression_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L,
        "denominators n·Σx²−(Σx)² must be non-negative")
    }
    assert(rows.groupBy(_.getString(0)).forall(_._2.map(_.getLong(1)).distinct.size >= 2),
      "every flag should accumulate across at least two touched batches")
  }

  test("stream_winnowing_replay: copy waves reject to organic canonicals") {
    val rows = R11dQueries.queries("stream_winnowing_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b) => a < b }, "canonical must be the minimum")
    // the dethrone path: some batch-0 seed (id in [1M,2M)) must appear as
    // idb after an organic id took its hash over
    assert(rows.exists { case (a, b) => a < 1000000L && b >= 1000000L && b < 2000000L },
      "no batch-0 canonical was dethroned")
  }

  test("stream_lev_admission_replay: verdicts are chain-consistent") {
    val rows = R11gQueries.queries("stream_lev_admission_replay")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val matched = rows.filter(_._3 >= 0)
    assert(matched.nonEmpty, "replay produced no duplicate verdicts")
    assert(matched.forall { case (id, _, canon, dist) =>
      canon < id && dist >= 0 && dist <= 4 },
      "canonical must be an earlier doc within maxDist")
    // every named canonical must itself have been ADMITTED into that block
    // (verdict -1 there) — the chain property a closed-form oracle misses
    val admitted = rows.filter(_._3 == -1L).map(r => (r._2, r._1)).toSet
    assert(matched.forall { case (_, bkey, canon, _) => admitted((bkey, canon)) },
      "a verdict names a canonical that was never admitted to its block")
  }

  test("stream_semdedup_replay: planted copies reject across two batch " +
    "boundaries") {
    val rows = R11gQueries.queries("stream_semdedup_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val copies = rows.filter(_._1 >= 1000000L)
    assert(copies.nonEmpty && copies.forall(c => !c._3 && c._4 < 1000000L),
      "every planted copy must reject to an organic accepted member")
    val kept = rows.filter(_._3)
    assert(kept.forall(_._4 == -1L), "kept rows must carry dup_of = -1")
  }

  test("stream_pqindex_replay: epoch rotation re-encodes batch 2") {
    val rows = R11hQueries.queries("stream_pqindex_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val epochs = rows.map(_._5).distinct.sorted.toSeq
    assert(epochs == Seq(1L, 2L), s"expected both epochs, got $epochs")
    // epoch is monotone in vec_id (tercile rotation)
    val maxE1 = rows.filter(_._5 == 1L).map(_._1).max
    val minE2 = rows.filter(_._5 == 2L).map(_._1).min
    assert(maxE1 < minE2, "epoch must rotate at the tercile boundary")
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 15L), "codes out of range")
  }

  test("corpus_embed_cap_audit: gate-scale buckets are cap-free and " +
    "account for every chunk") {
    val rows = R11hQueries.queries("corpus_embed_cap_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getBoolean(3)), "cap must not bind at gate SFs")
    assert(rows.forall(r => r.getLong(2) == r.getLong(1)),
      "candidates_kept must equal n_chunks when untruncated")
    assert(rows.forall(_.getLong(4) == 0L),
      "chunks_at_risk (missed-drop upper bound) must be 0 when cap-free")
    val total = rows.map(_.getLong(1)).sum
    val nChunks = graft.ext.EmbedPipeline
      .chunkVectors(graft.queries.Synth.documents(spark, sf)).count()
    assert(total == nChunks, "bucket histogram must cover every chunk")
  }

  test("stream_moments_replay / stream_drift_replay: counts accumulate") {
    val m = R11eQueries.queries("stream_moments_replay")(spark, sf).collect()
    assert(m.nonEmpty)
    assert(m.groupBy(_.getString(0)).forall(_._2.map(_.getLong(1)).distinct.size >= 2),
      "per-type moment state must grow across batches")
    val d = R11eQueries.queries("stream_drift_replay")(spark, sf).collect()
    assert(d.nonEmpty)
    assert(d.groupBy(_.getLong(0)).exists(_._2.map(_.getLong(1)).distinct.size >= 2),
      "per-cluster drift state must grow across batches")
  }

  test("stream_nngraph_replay: neighbors are earlier same-bucket vectors") {
    val rows = R11fQueries.queries("stream_nngraph_replay")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, _, _, n) => n < v }, "neighbor must precede")
    rows.groupBy(_._1).foreach { case (v, rs) =>
      val ranks = rs.map(_._3).sorted.toSeq
      assert(ranks == (1L to ranks.size).toSeq, s"vec $v ranks not contiguous")
      assert(rs.map(_._4).distinct.size == rs.size, s"vec $v repeated neighbor")
    }
  }
}
