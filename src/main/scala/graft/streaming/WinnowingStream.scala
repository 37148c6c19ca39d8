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
  * IDENTICAL 40-bit hash set, spec-asserted). Each intermediate array
  * materializes as an attribute before a lambda indexes it — the
  * interpreted-HOF re-evaluation trap recorded in PLANS.md.
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
    * to the batch selection filter. */
  def fingerprintHits(docs: DataFrame): Dataset[FpHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col("t")
    val grams = transform(sequence(lit(1), size(t) - 4), i =>
      conv(substring(md5(concat_ws(" ",
        element_at(t, i), element_at(t, i + 1), element_at(t, i + 2),
        element_at(t, i + 3), element_at(t, i + 4))), 1, 10), 16, 10)
        .cast("long"))
    docs
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 8) // n_grams >= w = 4
      .withColumn("gh", grams)
      // pack (hash, pos) exactly like the batch operator: h·2²⁰ +
      // (2²⁰−1−pos) — rightmost-min tie-break, integer-exact
      .withColumn("packed", expr(
        "transform(sequence(1, size(gh)), p -> " +
          "element_at(gh, p) * 1048576L + (1048575L - p))"))
      .withColumn("fps", expr(
        "array_distinct(transform(" +
          "transform(sequence(1, size(gh) - 3), p -> " +
          "  array_min(slice(packed, p, 4)))," +
          "  v -> v div 1048576L))"))
      .select(explode(col("fps")).as("h"), col("doc_id"))
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
