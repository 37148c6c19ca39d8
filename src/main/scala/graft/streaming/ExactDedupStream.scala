package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental exact dedup — the CDC-style canonical-set maintenance a
  * training-data ingest runs: as documents arrive, each content key
  * (md5(text)) admits exactly ONE canonical document; later arrivals are
  * emitted as rejections pointing at the canonical. The exact-dup sibling
  * of [[NearDupStream]]'s bucket canonicals, and the streaming twin of the
  * batch `Dedup.exact` groupBy.
  *
  * Spark's own `dropDuplicatesWithinWatermark` silently drops the
  * duplicates; this operator instead emits a decision row per document
  * (`kept` + canonical id), which is what a pipeline audit needs — the
  * reject stream is the dedup ablation log.
  *
  * One stateful shuffle on the content key; state is one long per distinct
  * content (bounded by distinct corpus size; production adds TTL eviction
  * per retention contract).
  */
object ExactDedupStream {
  final case class Keyed(ck: String, doc_id: Long)
  final case class Decision(doc_id: Long, canonical: Long, kept: Boolean)

  def keyed(docs: DataFrame): Dataset[Keyed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col("text")).as("ck"), col("doc_id")).as[Keyed]
  }

  /** Chunk-granular keying — streaming CHUNK dedup by composition:
    * [[graft.ext.TextAnalysis.chunkDocs]] is row-local (streaming-append-
    * safe), so feeding its chunk_md5 rows through the same canonical-set
    * state dedups context windows as they arrive (the ingest twin of the
    * batch `Dedup.chunkDedup`). The composite id (doc_id · 2²⁰ + chunk_id)
    * preserves the batch keeper order — min doc_id, then min chunk_id —
    * under the single-long state; chunk_id is bounded by ⌈tokens/stride⌉,
    * far below 2²⁰ for any context-window corpus. */
  def keyedChunks(docs: DataFrame, window: Int = 64,
      stride: Int = 48): Dataset[Keyed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ext.TextAnalysis.chunkDocs(docs, window, stride)
      .select(col("chunk_md5").as("ck"),
        (col("doc_id") * (1L << 20) + col("chunk_id")).as("doc_id"))
      .as[Keyed]
  }

  /** `ttlMs > 0` evicts content keys idle longer than the TTL (dedup then
    * spans only the retention window; state bounded by active content). */
  def decisions(docs: Dataset[Keyed], ttlMs: Long = 0L): Dataset[Decision] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[Decision]
    implicit val stateEnc = Encoders.scalaLong
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .groupByKey(_.ck)
      .flatMapGroupsWithState[Long, Decision](OutputMode.Append(), timeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Long]) =>
          transition(it, state, ttlMs)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(it: Iterator[Keyed], state: GroupState[Long],
      ttlMs: Long): Iterator[Decision] =
    if (state.hasTimedOut) {
      // retention window passed with no arrivals: forget the canonical
      state.remove()
      Iterator.empty
    } else {
      val ids = it.map(_.doc_id).toSeq.sorted.distinct
      val out = state.getOption match {
        case Some(canonical) =>
          state.update(canonical)
          ids.map(d => Decision(d, canonical, kept = false))
        case None =>
          // min id of the first batch is the canonical — deterministic
          // under any within-batch arrival order
          val canonical = ids.head
          state.update(canonical)
          ids.map(d => Decision(d, canonical, kept = d == canonical))
      }
      if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
      out.iterator
    }
}
