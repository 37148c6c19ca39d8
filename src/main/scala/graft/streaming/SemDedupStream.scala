package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SemDeDup — admission-time semantic dedup for a corpus that
  * GROWS (the ingest twin of `graft.ext.Dedup.semanticDedup`): does this
  * new embedding near-duplicate anything already ACCEPTED in its cluster?
  *
  * Stage 1 is a row-local projection (no shuffle, streaming-append-safe):
  * the arriving vector is assigned to its k-means cluster by cosine
  * against the centroid literals — the same frozen-quantizer contract as
  * [[PqIndexStream]] epochs and the batch operator (first-max tie-break to
  * the lower cell). Stage 2 is ONE stateful shuffle keyed by the cluster:
  * per-cluster GroupState holds the accepted member set, and an arrival is
  * kept iff no accepted member sits at cosine ≥ τ. Admission order is
  * ascending vec_id within a micro-batch (deterministic); `dup_of` records
  * the best-matching accepted member (highest cosine, ties → lower id) —
  * the ablation-log row.
  *
  * Like [[NearDupStream]]'s star-vs-clique, admission-order keep differs
  * from the batch operator's global keeper rule (lowest centroid-cosine):
  * online you cannot prefer a duplicate that has not arrived yet. The
  * batch op remains the offline/backfill pass.
  *
  * State is the accepted (unique-content) member set per cluster — the
  * irreducible working set of online semantic dedup — so it grows with
  * UNIQUE volume ÷ K, not stream length; `maxPerCluster` is the retention
  * cap (oldest-first eviction, the usual production trade: dedup then only
  * spans the retained window), and `ttlMs` evicts idle clusters whole. */
object SemDedupStream {
  final case class Arrival(cluster: Int, vec_id: Long, emb: Seq[Double])
  final case class Decision(vec_id: Long, cluster: Int, kept: Boolean, dup_of: Long)

  /** Sequential left-to-right cosine — the same pinned fold order as the
    * codegen'd `dot_product` expression, so streaming decisions agree
    * bit-for-bit with batch scores. */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Row-local cluster assignment over `vectors(vec_id, embedding)` —
    * works on a streaming OR batch frame unchanged. `centroids(i)` is
    * cluster i (ascending, the first-max tie-break = batch `cellAssign`
    * ordering). */
  def assign(vectors: DataFrame, centroids: Array[Array[Double]]): Dataset[Arrival] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val sims = array(centroids.map { c =>
      graft.ext.Similarity.cosine(col("embedding"), typedLit(c.toSeq))
    }: _*)
    vectors.select(
      (array_position(sims, array_max(sims)).cast("int") - 1).as("cluster"),
      col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("emb"))
      .as[Arrival]
  }

  /** Stateful admission: per-cluster accepted set; kept iff no accepted
    * member at cosine ≥ `threshold`. */
  def decisions(arrivals: Dataset[Arrival], threshold: Double,
      maxPerCluster: Int = 10000, ttlMs: Long = 0L): Dataset[Decision] = {
    implicit val arrEnc = Encoders.product[Arrival]
    implicit val decEnc = Encoders.product[Decision]
    implicit val stEnc = Encoders.kryo[List[(Long, Array[Double])]]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    arrivals
      .groupByKey(_.cluster)(Encoders.scalaInt)
      .flatMapGroupsWithState[List[(Long, Array[Double])], Decision](
        OutputMode.Append(), timeout) {
        (cluster: Int, it: Iterator[Arrival],
            state: GroupState[List[(Long, Array[Double])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // accepted members oldest-first; admission in vec_id order
            var accepted = state.getOption.getOrElse(Nil)
            val out = it.toSeq.sortBy(_.vec_id).map { a =>
              val scored = accepted.iterator
                .map { case (id, e) => (id, cos(a.emb, e)) }
                .filter(_._2 >= threshold).toSeq
              if (scored.isEmpty) {
                accepted = accepted :+ (a.vec_id -> a.emb.toArray)
                if (accepted.length > maxPerCluster)
                  accepted = accepted.drop(accepted.length - maxPerCluster)
                Decision(a.vec_id, cluster, kept = true, dup_of = -1L)
              } else {
                // best match: highest cosine, ties to the lower id
                val best = scored.minBy { case (id, s) => (-s, id) }
                Decision(a.vec_id, cluster, kept = false, dup_of = best._1)
              }
            }
            state.update(accepted)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }
}
