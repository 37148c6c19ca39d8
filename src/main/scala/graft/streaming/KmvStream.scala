package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV (k-minimum-values) distinct estimator: the fourth member
  * of the bounded-state sketch family (HLL = cardinality via registers,
  * CMS = per-point frequency bounds, space-saving = top-k, KMV =
  * cardinality via order statistics) and the one whose state transition is
  * PURE SET-MIN — insert-if-smaller over a ≤k-element sorted set. That
  * makes it the only family member that is exactly order- and
  * partitioning-independent with no caveats: any interleaving of arrivals,
  * any micro-batch split, any merge of per-node sketches produces the
  * byte-identical state (min-k of a union is the trimmed union of min-ks —
  * the same exact-merge property `sketch_kmv_distinct` proves in batch).
  *
  * Hash contract: 52-bit prefix of the md5 hex digest — bit-equal to the
  * batch side's `conv(substring(md5(x), 1, 13), 16, 10)` — so stream state
  * is directly comparable to the batch sketch (parity spec-pinned).
  * Estimate = (k−1)·2⁵² / h₍ₖ₎ once k values are tracked; below k the
  * tracked count IS the exact distinct count (the sketch's small regime).
  *
  * State per group: ≤ k longs, forever. Emission: Update mode, each batch
  * re-emits the group's current (n_tracked, kth hash, estimate).
  */
object KmvStream {
  final case class Item(group: String, item: String)
  final case class Sketch(mins: List[Long]) // ascending, distinct, size ≤ k
  final case class KmvRow(group: String, nTracked: Int, kthHash: Option[Long],
      est: Option[Double])

  private val Pow52 = 4503599627370496L // 2^52

  /** 52-bit md5-prefix hash — the exact integer the batch SQL
    * `conv(substring(md5(s), 1, 13), 16, 10)` produces. */
  def hash52(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 13 hex digits = the top 6.5 bytes of the digest
    val hex = d.take(7).map(b => f"$b%02x").mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16)
  }

  def distinctEstimate(items: Dataset[Item], k: Int = 64): Dataset[KmvRow] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[KmvRow]
    implicit val stateEnc = Encoders.product[Sketch]
    items
      .groupByKey(_.group)
      .flatMapGroupsWithState[Sketch, KmvRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Item], state: GroupState[Sketch]) =>
          transition(g, it, state, k)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(group: String, it: Iterator[Item],
      state: GroupState[Sketch], k: Int): Iterator[KmvRow] = {
    var mins = state.getOption.map(_.mins.toVector).getOrElse(Vector.empty)
    var touched = false
    it.foreach { row =>
      touched = true
      val h = hash52(row.item)
      // insert-if-smaller into the sorted ≤k set; duplicates are no-ops
      if (mins.size < k || h < mins.last) {
        val i = searchInsert(mins, h)
        if (i == mins.size || mins(i) != h)
          mins = (mins.take(i) :+ h) ++ mins.drop(i)
        if (mins.size > k) mins = mins.dropRight(1)
      }
    }
    if (!touched) Iterator.empty
    else {
      state.update(Sketch(mins.toList))
      val kth = if (mins.size == k) Some(mins.last) else None
      val est = kth.map(h => (k - 1).toDouble * Pow52.toDouble / h.toDouble)
      Iterator.single(KmvRow(group, mins.size, kth, est))
    }
  }

  /** Lowest index at which h can be inserted keeping `v` sorted. */
  private def searchInsert(v: Vector[Long], h: Long): Int = {
    var lo = 0; var hi = v.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}
