package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming edit-distance admission dedup — the incremental twin of
  * [[graft.ext.Dedup.levenshteinBlockPairs]] for a corpus that GROWS: is
  * this new document within `maxDist` character edits of anything already
  * admitted? (The character-level sibling of [[NearDupStream]]'s
  * token-set admission and [[SemDedupStream]]'s embedding admission.)
  *
  * Stage 1 is a row-local projection (no shuffle): the same
  * ASCII-normalized `sigLen`-char signature and head/tail block keys as
  * the batch operator, so a document lands in IDENTICAL blocks in both.
  * Stage 2 is one stateful shuffle keyed by the block: per-block
  * GroupState holds the admitted members' (doc_id, len, sig), capped at
  * `maxBlock`; an arriving document is scanned against them under the
  * batch verifier (|Δlen| ≤ maxDist prefilter, then signature
  * levenshtein ≤ maxDist) and emits its verdict with the canonical =
  * LOWEST matching admitted id.
  *
  * Because a doc carries TWO block keys, its per-block verdicts are
  * partial: the caller ORs them (a doc is a duplicate if EITHER block
  * found a match — `admittedIds` does this reduction in-spec). Admission
  * semantics deliberately differ from the batch CC composition on CHAINS:
  * online, a doc is compared against ADMITTED members only, so A←B(4
  * edits)←C(8 edits from A) admits C where batch keep-canonical clusters
  * all three — the standard admission-vs-retrospective contrast every
  * admission twin in this repo documents; on chain-free (star-shaped)
  * duplicate populations the two agree exactly, which the spec pins.
  * A second chain-only artifact of per-block independence: a doc
  * rejected via one block is still admitted into its OTHER block's state
  * when that block holds no match (blocks are separate state keys and
  * cannot coordinate mid-pass), so a later doc can name a rejected doc
  * as canonical — again impossible on star populations, where a copy
  * shares BOTH blocks with its origin (interior edits preserve both
  * ends) and is rejected from both.
  *
  * State is ≤ maxBlock (id, len, sig) tuples per distinct block key —
  * bounded by the block vocabulary, not stream length; `ttlMs` adds the
  * usual retention-contract eviction.
  */
object LevAdmissionStream {
  final case class BlockHit(bkey: String, doc_id: Long, len: Long, sig: String)
  /** Per-block verdict: `canonical` = lowest admitted match, or -1 when
    * the block holds no match (the doc was admitted INTO this block). */
  final case class Verdict(doc_id: Long, bkey: String, canonical: Long,
      dist: Long)
  final case class Member(doc_id: Long, len: Long, sig: String)
  final case class BlockState(members: Seq[Member])

  /** Row-local signature + the two block keys — byte-identical to the
    * batch operator's derivation. */
  def blockHits(docs: DataFrame, sigLen: Int = 96,
      blockLen: Int = 16): Dataset[BlockHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          1, sigLen).as("sig"))
      .withColumn("len", length(col("sig")).cast("long"))
      .select(col("doc_id"), col("len"), col("sig"),
        explode(array(
          concat(lit("p:"), substring(col("sig"), 1, blockLen)),
          concat(lit("s:"), expr(s"right(sig, $blockLen)")))).as("bkey"))
      .select("bkey", "doc_id", "len", "sig").as[BlockHit]
  }

  /** Pure per-block admission step (exposed for direct unit testing):
    * scans arrivals (sorted by doc_id — the ordering contract) against
    * the admitted members, returns (verdicts, next members). */
  def admitBlock(members: Seq[Member], arrivals: Seq[BlockHit],
      maxDist: Long, maxBlock: Int): (Seq[Verdict], Seq[Member]) = {
    var ms = members
    val out = arrivals.sortBy(_.doc_id).map { a =>
      val m = ms.iterator
        .filter(m => math.abs(m.len - a.len) <= maxDist)
        .map(m => (m, levenshtein(m.sig, a.sig, maxDist)))
        .filter(_._2 >= 0)
        .reduceOption((x, y) => if (x._1.doc_id <= y._1.doc_id) x else y)
      m match {
        case Some((hit, d)) => Verdict(a.doc_id, a.bkey, hit.doc_id, d)
        case None =>
          if (ms.size < maxBlock) ms = ms :+ Member(a.doc_id, a.len, a.sig)
          Verdict(a.doc_id, a.bkey, -1L, -1L)
      }
    }
    (out, ms)
  }

  /** Banded Levenshtein with early exit: returns the distance if
    * ≤ maxDist, else -1. O(len · maxDist) — the verifier never pays the
    * full DP table for far-apart strings. */
  def levenshtein(a: String, b: String, maxDist: Long): Long = {
    if (math.abs(a.length - b.length) > maxDist) return -1L
    val k = maxDist.toInt
    val (n, m) = (a.length, b.length)
    var prev = Array.tabulate(m + 1)(j => if (j <= k) j else k + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, k + 1)
      cur(0) = if (i <= k) i else k + 1
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      var j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m).toLong else -1L
  }

  def verdicts(hits: Dataset[BlockHit], maxDist: Long = 4L,
      maxBlock: Int = 64, ttlMs: Long = 0L): Dataset[Verdict] = {
    implicit val hitEnc = Encoders.product[BlockHit]
    implicit val outEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[BlockState]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    hits
      .groupByKey(_.bkey)(Encoders.STRING)
      .flatMapGroupsWithState[BlockState, Verdict](
        OutputMode.Append(), timeout) {
        (key: String, it: Iterator[BlockHit], state: GroupState[BlockState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (out, ms) = admitBlock(
              state.getOption.map(_.members).getOrElse(Seq.empty),
              it.toSeq, maxDist, maxBlock)
            state.update(BlockState(ms))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }

  /** The cross-block reduction: a doc is a DUPLICATE if either of its two
    * blocks matched; its canonical is the lowest matching id. Runs on the
    * collected verdict table (a streaming aggregation in production). */
  def duplicates(verdicts: Seq[Verdict]): Map[Long, Long] =
    verdicts.filter(_.canonical >= 0).groupBy(_.doc_id)
      .map { case (id, vs) => id -> vs.map(_.canonical).min }
}
