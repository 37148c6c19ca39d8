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
    val t = col("t")
    def shift(n: Int) = slice(t, lit(n), greatest(size(t) - (n - 1), lit(0)))
    val sp = lit(" ")
    // 5-gram strings via shifted zips: g5[i] = t[i] ' ' t[i+1] .. t[i+4]
    // (null past the full range — sliced away below)
    val g2 = zip_with(t, shift(2), (a, b) => concat(a, sp, b))
    val g5 = zip_with(
      zip_with(g2, shift(3), (a, b) => concat(a, sp, b)),
      zip_with(shift(4), shift(5), (a, b) => concat(a, sp, b)),
      (a, b) => concat(a, sp, b))
    docs
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 8) // n_grams >= w = 4
      // gram hashes: 40-bit md5 prefix per full 5-gram
      .withColumn("gh", transform(slice(g5, lit(1), size(t) - 4),
        s => conv(substring(md5(s), 1, 10), 16, 10).cast("long")))
      // pack (hash, pos) exactly like the batch operator: h·2²⁰ +
      // (2²⁰−1−pos) — rightmost-min tie-break, integer-exact
      .withColumn("packed", zip_with(col("gh"),
        sequence(lit(1L), size(col("gh")).cast("long")),
        (h, p) => h * lit(1048576L) + (lit(1048575L) - p)))
      // 4-window minima by doubling: w2[i] = min(p[i], p[i+1]);
      // w4[i] = min(w2[i], w2[i+2]) = min(p[i..i+3])
      .withColumn("w2", zip_with(col("packed"),
        slice(col("packed"), lit(2), greatest(size(col("packed")) - 1, lit(0))),
        (a, b) => least(a, b)))
      .withColumn("fps", array_distinct(transform(
        slice(zip_with(col("w2"),
            slice(col("w2"), lit(3), greatest(size(col("w2")) - 2, lit(0))),
            (a, b) => least(a, b)),
          lit(1), size(col("packed")) - 3),
        // packed is non-negative, so h = packed div 2²⁰ = a right shift
        v => shiftright(v, 20))))
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
