package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming winnowing-fingerprint near-dup detection — the incremental
  * twin of [[graft.ext.Dedup.winnowingPairs]] (the admission question:
  * does this arriving document share fingerprints with anything already
  * accepted?).
  *
  * Stage 1 computes each document's winnowing fingerprint SET row-locally
  * (streaming-safe: no window over the token stream — the batch operator's
  * doc-partitioned windows become array ops inside the row, producing the
  * IDENTICAL 40-bit hash set, spec-asserted). See [[fingerprintHits]] for
  * the construction rule that keeps the array lambdas out of the
  * interpreted-HOF re-evaluation trap.
  *
  * Stage 2 is one stateful shuffle keyed by the fingerprint hash: per-hash
  * GroupState holds the hash's canonical (minimum) owner doc, and every
  * other arrival emits a candidate edge to that canonical — a star per
  * hash, like [[NearDupStream]]'s per-bucket star; the caller thresholds
  * shared-edge counts per pair (≥ minShared) exactly as in batch, and the
  * full clique/cluster view stays the offline CC path. State is ONE long
  * per distinct fingerprint hash — bounded by content vocabulary, with the
  * same optional TTL retention contract as the other admission twins.
  */
object WinnowingStream {
  final case class FpHit(h: Long, doc_id: Long)
  final case class Cand(ida: Long, idb: Long, h: Long)

  /** Row-local (fingerprint-hash, doc_id) hits; docs under 8 tokens have
    * no full winnowing window (n_grams < w) and emit nothing — identical
    * to the batch selection filter.
    *
    * Construction rule (round 11, measured): NO lambda body may reference
    * an outer ARRAY column — the optimizer can inline the array's
    * defining expression into the lambda, and interpreted higher-order
    * eval then re-runs it PER ELEMENT (the original element_at(t, i)
    * shape re-split the document per gram: 220 s of one-core eval on 100
    * replay docs). Every step below is a zip_with/transform whose lambda
    * touches only its element variables; shifted-array zips build the
    * 5-gram strings, and a two-level sparse-table least() builds the
    * 4-window minima. Values are identical to the old shape (same gram
    * strings, same packed tie-break), only the eval cost changed. */
  def fingerprintHits(docs: DataFrame): Dataset[FpHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // the codegen'd winnow_fps Expression (bit-equal to the shifted-array
    // zip_with chain it replaces — HOFs are CodegenFallback, and the
    // interpreted per-lambda eval dominated the streaming replay's wall
    // time; ReplayProbe receipts, PLANS.md r13). winnow_fps is NULL for
    // docs under 8 tokens and explode skips null arrays, preserving the
    // old size filter.
    docs
      .select(explode(call_function("winnow_fps", col("text"))).as("h"),
        col("doc_id"))
      .as[FpHit]
  }

  /** Stateful stage: per-hash canonical owner in GroupState; every other
    * document arriving at the hash emits a candidate edge to it. Same
    * takeover rule as [[NearDupStream.candidates]]: a smaller id assumes
    * the canonical role and links the previous canonical. */
  def candidates(hits: Dataset[FpHit], ttlMs: Long = 0L): Dataset[Cand] = {
    implicit val hitEnc = Encoders.product[FpHit]
    implicit val outEnc = Encoders.product[Cand]
    implicit val stateEnc = Encoders.scalaLong
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    hits
      .groupByKey(_.h)(Encoders.scalaLong)
      .flatMapGroupsWithState[Long, Cand](OutputMode.Append(), timeout) {
        (key: Long, it: Iterator[FpHit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = it.map(_.doc_id).toSeq.sorted.distinct
            val prev = state.getOption
            val canonical = math.min(prev.getOrElse(Long.MaxValue), ids.head)
            state.update(canonical)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            (ids ++ prev).distinct.filterNot(_ == canonical)
              .map(d => Cand(canonical, d, key)).iterator
          }
      }
  }
}
