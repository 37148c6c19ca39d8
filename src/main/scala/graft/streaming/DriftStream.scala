package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-cluster embedding moments — the ingest twin of the batch
  * [[graft.queries.ExtQueries]] `emb_drift` monitor, and the third
  * mergeable-state family next to [[HllStream]] (max-merge) and
  * [[CmsStream]] (sum-merge): cluster assignment is the same row-local
  * `ivf_assign` projection as batch (centroids ride as plan literals), and
  * the maintained state per cluster is (count, Σ quantized components) —
  * K·(d+1) longs TOTAL however many vectors arrive, merged by addition, so
  * a refresh can compare its running means against any persisted epoch's
  * without replaying data.
  *
  * Emission is Update-mode: a cluster row appears in a micro-batch's
  * output only when it received vectors, carrying the NEW running count
  * and quantized mean numerators. Mean = sum / (n · 10000) downstream,
  * exactly the batch arithmetic.
  */
object DriftStream {
  final case class Assigned(cluster: Long, q: Seq[Long])
  final case class ClusterMoments(cluster: Long, n: Long, s: Seq[Long])

  /** Row-local (cluster, quantized components) projection — identical
    * math to the batch monitor (floor ×10000 quantization, spec-pinned). */
  def assigned(vectors: DataFrame,
      centroids: Array[Array[Double]]): Dataset[Assigned] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.ext.Similarity.kmeansAssign(vectors, centroids)
      .select(col("cluster"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000.0) as long))")
          .as("q"))
      .as[Assigned]
  }

  /** Moment maintenance: running (count, component-sum vector) per
    * cluster. */
  def moments(rows: Dataset[Assigned]): Dataset[ClusterMoments] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[ClusterMoments]
    implicit val stateEnc = Encoders.product[(Long, Seq[Long])]
    rows
      .groupByKey(_.cluster)
      .flatMapGroupsWithState[(Long, Seq[Long]), ClusterMoments](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cluster: Long, it: Iterator[Assigned],
         state: GroupState[(Long, Seq[Long])]) =>
          transition(cluster, it, state)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(cluster: Long, it: Iterator[Assigned],
      state: GroupState[(Long, Seq[Long])]): Iterator[ClusterMoments] = {
    var add = 0L
    var sum: Array[Long] = null
    it.foreach { a =>
      if (sum == null) sum = new Array[Long](a.q.length)
      var i = 0
      while (i < a.q.length) { sum(i) += a.q(i); i += 1 }
      add += 1
    }
    if (add == 0L) Iterator.empty
    else {
      val (n0, s0) = state.getOption.getOrElse(
        (0L, Seq.fill(sum.length)(0L)))
      val merged = s0.toArray
      var i = 0
      while (i < sum.length) { merged(i) += sum(i); i += 1 }
      val next = (n0 + add, merged.toSeq)
      state.update(next)
      Iterator.single(ClusterMoments(cluster, next._1, next._2))
    }
  }
}
