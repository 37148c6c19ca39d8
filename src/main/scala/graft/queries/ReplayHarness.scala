package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared state-partition sizing for the deterministic replay harnesses.
  *
  * Every stateful micro-batch commits ONE state store per shuffle
  * partition (four for a stream-stream join), and HDFSBackedStateStore
  * commits are per-partition file writes — at the session's 32 partitions
  * a 3-batch replay over a bounded corpus (~10³–10⁴ keys) pays hundreds
  * of store commits that dwarf the operator logic (ReplayProbe receipts,
  * PLANS.md r13: attribution 22.3 → 7.7 s at 4 partitions; the same
  * shape taxes every GroupState twin ~2–4 s per key). Production sizes
  * state partitions to state VOLUME — this helper applies the same rule
  * to the replays' bounded corpora: the query starts under 4 shuffle
  * partitions (pinned for the query's lifetime by its first batch's
  * offset log) and the session conf is restored immediately after.
  *
  * Emission CONTENT is partition-invariant for every twin (keyed state,
  * deterministic per-key transitions; final row order is pinned by each
  * key's orderBy), so oracle hashes are unchanged — spec- and
  * gate-verified.
  */
object ReplayHarness {
  /** State-partition count for the bounded replay corpora. Default 4 —
    * the r13-measured knee; overridable (SPARK_GRAFT_REPLAY_PARTS) so
    * sizing experiments don't need a rebuild. Production sizes state
    * partitions to state volume; this is that rule applied to the
    * replays' 10³–10⁴-key corpora. */
  private val Parts: String =
    sys.env.getOrElse("SPARK_GRAFT_REPLAY_PARTS", "4")

  /** State-store provider for the replay queries. Default: RocksDB with
    * changelog checkpointing — the r15 A/B at the bench point measured it
    * ≥ the HDFS-backed provider on EVERY replay key in both sittings
    * (8-key totals 50.5→32.6 s in a loaded window, 1.01–1.09× per key in
    * a quiet one; receipts in OPTIMIZATION_r15.md): the HDFS provider
    * deep-copies its whole map per version and commits a full snapshot
    * file per partition per batch, while changelog checkpointing commits
    * only the batch's delta. At production state volumes (state ≫
    * executor heap) RocksDB is the standard choice anyway, so the bench
    * default and the deployment default agree. `SPARK_GRAFT_REPLAY_STATE`
    * overrides (`hdfs` restores the Spark default provider, or pass a
    * provider class FQN). Emission CONTENT is provider-invariant (keyed
    * state, deterministic transitions), so oracle hashes do not move —
    * gate-verified. */
  private val StateProvider: Option[String] =
    sys.env.get("SPARK_GRAFT_REPLAY_STATE").orElse(Some("rocksdb")).flatMap {
      case "rocksdb" => Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case "hdfs" => None
      case other => Some(other)
    }

  def sized[T](s: SparkSession)(startQuery: => T): T = {
    val PK = "spark.sql.streaming.stateStore.providerClass"
    val CK = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val prevProv = s.conf.getOption(PK)
    s.conf.set("spark.sql.shuffle.partitions", Parts)
    StateProvider.foreach { p =>
      s.conf.set(PK, p)
      if (p.contains("RocksDB")) s.conf.set(CK, "true")
    }
    try startQuery
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      if (StateProvider.isDefined) {
        prevProv match {
          case Some(p) => s.conf.set(PK, p)
          case None    => s.conf.unset(PK)
        }
      }
    }
  }
}
