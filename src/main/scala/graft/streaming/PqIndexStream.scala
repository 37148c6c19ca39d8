package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming IVF/PQ index maintenance — the incremental twin of
  * `graft.ext.Similarity.ivfPqTopK`'s index-construction side, for a vector
  * corpus that GROWS: each arriving vector is assigned to its coarse cell
  * and PQ-encoded against the CURRENT codebook epoch, producing the
  * (vec_id, cell, codes, codebook_epoch) rows an inverted-list store
  * appends. Queries then probe exactly as in batch; re-training publishes a
  * new epoch and only re-encodes lazily (the epoch column records which
  * codebook each row was coded with — standard FAISS-style index rotation).
  *
  * Both steps are row-local projections (no shuffle, no state), so the plan
  * is streaming-append-safe by construction and scales linearly with
  * arrival rate:
  *   - cell assignment: cosine against each broadcast representative as a
  *     literal array (`dot_product` per rep — same codegen'd fold as
  *     batch), first-max tie-break to the lower cell, exactly the batch
  *     `cellAssign` ordering (`_sim` desc, cell asc);
  *   - encoding: the same codegen'd `pq_encode` the batch operators use,
  *     with the epoch's codebook as the referenced constant.
  */
object PqIndexStream {
  /** One published codebook generation. `reps` must be sorted by cell id —
    * the first-max tie-break relies on ascending cell order. */
  final case class CodebookEpoch(
      epoch: Long,
      reps: Seq[(Int, Seq[Double])],
      codebook: Array[Array[Array[Double]]]) {
    require(reps.map(_._1) == reps.map(_._1).sorted, "reps must be sorted by cell")
  }

  /** Narrow projection: (vec_id, cell, codes, codebook_epoch) for every
    * arriving vector. Works on a streaming OR batch `vectors(vec_id,
    * embedding)` frame unchanged. */
  def encode(vectors: DataFrame, ce: CodebookEpoch): DataFrame = {
    val sims = array(ce.reps.map { case (_, rep) =>
      Similarity.cosine(col("embedding"), typedLit(rep))
    }: _*)
    val cells = typedLit(ce.reps.map(_._1))
    val cwLit = typedLit(ce.codebook.map(_.map(_.toSeq).toSeq).toSeq)
    vectors.select(
      col("vec_id"),
      // array_position finds the FIRST max → lowest cell on ties, matching
      // the batch cellAssign window ordering
      element_at(cells, array_position(sims, array_max(sims)).cast("int"))
        .as("cell"),
      call_function("pq_encode", col("embedding"), cwLit).as("codes"),
      lit(ce.epoch).as("codebook_epoch"))
  }

  /** Maintenance loop: encode each micro-batch against whatever epoch
    * `current()` publishes AT THAT MOMENT (re-training rotates the epoch
    * without restarting the stream) and hand the rows to `sink` (the
    * inverted-list append). Returns the started query.
    *
    * `checkpoint` makes the loop RESTARTABLE: source offsets commit per
    * micro-batch, so a stopped/crashed maintainer resumes where it left
    * off — already-encoded vectors are not re-encoded (no duplicate
    * inverted-list rows), and rows arriving after a codebook rotation
    * encode under the NEW epoch ([[GroupStateRecovery2Spec]] proves the
    * stop → rotate → resume sequence). */
  def maintain(vectors: DataFrame, current: () => CodebookEpoch,
      checkpoint: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(encode(batch, current()))
      }
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
