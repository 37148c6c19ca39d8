package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming HyperLogLog — cross-batch distinct counting with BOUNDED
  * state: the ingest twin of the batch
  * [[graft.ext.TextAnalysis.hllDistinct]]. An exact streaming distinct
  * count needs state proportional to the distinct universe (the
  * [[ExactDedupStream]] shape — right for dedup, wrong for a monitoring
  * counter); the HLL register state is m longs TOTAL regardless of
  * arrival volume, and registers merge by per-bucket max — the property
  * that also makes the sketch unionable across epochs, shards, and
  * pipelines.
  *
  * Layout: the (bucket, rank) projection is row-local (streaming-append-
  * safe, identical math to the batch sketch — spec-pinned); the only
  * stateful shuffle keys on the bucket id, so state is ONE long per
  * bucket, ≤ m entries, and each micro-batch emits at most m updated
  * register rows in Update mode. The estimate is computed from the
  * register table downstream (one bounded fold), exactly as in batch.
  */
object HllStream {
  final case class BucketRank(bucket: Long, rank: Long)
  final case class Register(bucket: Long, reg: Long)

  /** Row-local (bucket, rank) projection over arriving documents —
    * byte-identical to the batch sketch's hashing (spec-pinned): 60-bit
    * md5 prefix, bucket = h mod m, rank = leading-zero count of the
    * remaining bits + 1 capped at 50. */
  def bucketRanks(docs: DataFrame, p: Int = 6): Dataset[BucketRank] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val m = 1 << p
    val toks = graft.ext.TextAnalysis.shingleRows(docs)
    val h = graft.functions.GraftFunctions.md5PrefixLong(col("shingle"), 1, 15)
    toks.select((h % m).as("bucket"), (h / m).cast("long").as("rest"))
      .select(col("bucket"),
        least(lit(50L), lit(55L) - when(col("rest") === 0, lit(0))
          .otherwise(length(bin(col("rest"))))).as("rank"))
      .as[BucketRank]
  }

  /** Register maintenance: per-bucket running max rank. Update-mode
    * emission — a bucket row appears in a micro-batch's output only when
    * its register changed (or on first touch), so the downstream register
    * table converges with at most m live rows. */
  def registers(ranks: Dataset[BucketRank]): Dataset[Register] = {
    implicit val brEnc = Encoders.product[BucketRank]
    implicit val longEnc = Encoders.scalaLong // key AND state encoder
    implicit val outEnc = Encoders.product[Register]
    ranks
      // per-partition combine before the stateful shuffle (the map-side
      // partial agg groupByKey can't do; see CmsStream.cells): max per
      // bucket is commutative/idempotent, so the post-batch register and
      // the emit-on-increase decision are bit-identical while the
      // exchange carries ≤ m rows per partition instead of one per shingle
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long]()
        it.foreach(r => m.merge(r.bucket, r.rank, (a, b) => math.max(a, b)))
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => BucketRank(e.getKey, e.getValue))
      }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[Long, Register](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, it: Iterator[BucketRank], state: GroupState[Long]) =>
          transition(bucket, it, state)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(bucket: Long, it: Iterator[BucketRank],
      state: GroupState[Long]): Iterator[Register] = {
    var mx = Long.MinValue
    it.foreach(r => if (r.rank > mx) mx = r.rank)
    val prev = state.getOption
    if (mx == Long.MinValue || prev.exists(_ >= mx)) Iterator.empty
    else {
      state.update(mx)
      Iterator.single(Register(bucket, mx))
    }
  }

  /** The estimate from a (bucket, reg) register table — the same pinned
    * arithmetic as the batch sketch: exact integer harmonic sum
    * Σ 2^(50−reg) with empty buckets at 2^50, one double division. */
  def estimate(regs: Seq[Register], p: Int = 6): Double = {
    val m = 1 << p
    val present = regs.map(_.bucket).toSet
    require(regs.map(_.bucket).distinct.size == regs.size, "one reg per bucket")
    val s = regs.map(r => 1L << (50 - r.reg.toInt)).sum +
      (m - present.size).toLong * (1L << 50)
    0.709 * (m.toLong * m).toDouble * (1L << 50).toDouble / s.toDouble
  }
}
