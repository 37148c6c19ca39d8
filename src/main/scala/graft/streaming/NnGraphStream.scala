package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-NN-graph ADMISSION — the ingest twin of the batch
  * NN-Descent index ([[graft.ext.Similarity.nnDescent]]): every arriving
  * vector receives its approximate nearest neighbors AT ADMISSION, so the
  * online index is queryable immediately while the offline descent pass
  * refines epochs in the background (the standard incremental-ANN
  * deployment split).
  *
  * Stage 1 is the SAME row-local hyperplane bucketing the batch builder
  * seeds from (no shuffle, streaming-append-safe). Stage 2 is one
  * stateful shuffle keyed by the bucket: per-bucket GroupState holds the
  * retained member vectors, and an arrival's neighbors are the exact
  * top-k by cosine (ties → lower id) among EARLIER same-bucket arrivals
  * — precisely the batch LSH-seed neighborhood restricted to the
  * admission-time prefix, which is what "neighbors at admission" can
  * ever see (the online/offline contract [[SemDedupStream]] and
  * [[NearDupStream]] document for their families).
  *
  * Cosine runs in the same pinned left-to-right fold as the codegen'd
  * `dot_product`, so streamed scores agree bit-for-bit with batch scores
  * (`NnGraphStreamSpec` byte-compares the streamed neighbor lists across
  * scrambled micro-batches against the batch prefix rule).
  *
  * State = `maxPerBucket` retained (id, vector) pairs per bucket
  * (oldest-first eviction — the retention window production indexes
  * bound ingest state with), `ttlMs` evicts idle buckets whole. With B
  * buckets the total state is ≤ B·maxPerBucket vectors regardless of
  * stream length. */
object NnGraphStream {
  final case class Arrival(bucket: Long, vec_id: Long, emb: Seq[Double])
  final case class Neighbors(vec_id: Long, bucket: Long, n_ids: Seq[Long])

  private def cos(a: Seq[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Row-local bucket assignment — identical to the batch seed
    * ([[graft.ext.Similarity.lshBucket]]); batch or streaming frame. */
  def assign(vectors: DataFrame, planes: Array[Array[Double]]): Dataset[Arrival] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(
      graft.ext.Similarity.lshBucket(col("embedding"), planes).as("bucket"),
      col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("emb"))
      .as[Arrival]
  }

  /** Stateful admission: exact top-`k` (cosine desc, id asc) among the
    * bucket's retained earlier arrivals; admission order is ascending
    * vec_id within a micro-batch (deterministic). */
  def decisions(arrivals: Dataset[Arrival], k: Int,
      maxPerBucket: Int = 10000, ttlMs: Long = 0L): Dataset[Neighbors] = {
    implicit val arrEnc = Encoders.product[Arrival]
    implicit val outEnc = Encoders.product[Neighbors]
    implicit val stEnc = Encoders.kryo[List[(Long, Array[Double])]]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    arrivals
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState[List[(Long, Array[Double])], Neighbors](
        OutputMode.Append(), timeout) {
        (bucket: Long, it: Iterator[Arrival],
            state: GroupState[List[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else transition(bucket, it, state, k, maxPerBucket, ttlMs)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(bucket: Long, it: Iterator[Arrival],
      state: GroupState[List[(Long, Array[Double])]], k: Int,
      maxPerBucket: Int, ttlMs: Long): Iterator[Neighbors] = {
    var members = state.getOption.getOrElse(Nil) // newest-first
    val out = it.toSeq.sortBy(_.vec_id).map { a =>
      val top = members
        .map { case (id, e) => (id, cos(a.emb, e)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).map(_._1)
      members = (a.vec_id, a.emb.toArray) :: members
      if (members.length > maxPerBucket) members = members.take(maxPerBucket)
      Neighbors(a.vec_id, bucket, top)
    }
    state.update(members)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }
}
