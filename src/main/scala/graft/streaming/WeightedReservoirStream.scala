package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted reservoir sampling WITHOUT replacement — the
  * Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 97(5), 2006, public
  * paper): each item draws priority u^(1/w) with u uniform on (0,1], and
  * the reservoir is simply the top-k by priority. Like [[KmvStream]] (the
  * unweighted-cardinality sibling), the state transition is a pure bounded
  * order-statistic merge — top-k of a union is the merge of top-ks — so
  * the reservoir is EXACTLY order- and micro-batch-split-independent, and
  * per-node reservoirs on a cluster merge losslessly. A-ES is the
  * canonical way to take an exact-size weighted draw from an unbounded
  * stream with O(k) state; the batch twin is
  * [[graft.ext.Selection.weightedReservoir]] (spec byte-compares the two,
  * priorities included — both sides evaluate StrictMath.pow over the SAME
  * 52-bit md5 hash, so equality is bitwise by JVM spec).
  *
  * Determinism contract: u = (hash52(doc_id) + 1) / 2⁵², the repo's
  * md5-prefix convention — replayable, leakage-free (content-independent),
  * and strictly positive so ln u is finite. Ties (u = 1 twice) break by
  * smaller doc_id. Re-arrivals of a doc_id are no-ops.
  *
  * State per group: ≤ k (docId, weight, priority) entries, forever.
  * Emission: Update mode — each touched group re-emits its current
  * reservoir with 1-based ranks.
  */
object WeightedReservoirStream {
  final case class Doc(group: String, docId: Long, weight: Long)
  final case class Entry(docId: Long, weight: Long, priority: Double)
  final case class Reservoir(entries: List[Entry]) // priority desc, docId asc
  final case class ResRow(group: String, rank: Int, docId: Long,
      weight: Long, priority: Double)

  private val Pow52 = 4503599627370496L // 2^52

  /** A-ES priority: ((hash52(id)+1)/2⁵²)^(1/w) via StrictMath.pow — the
    * fdlibm algorithm the JVM pins bit-for-bit on every platform, matching
    * the batch side's `strict_pow` expression exactly. (Math.pow is only
    * specified to 1 ulp and HotSpot's intrinsic vs interpreted paths DO
    * differ in the last bit — measured here; see
    * [[graft.functions.StrictPow]].) Requires w ≥ 1. */
  def priority(docId: Long, weight: Long): Double = {
    require(weight >= 1L, s"A-ES needs positive weight, got $weight for $docId")
    val u = (KmvStream.hash52(docId.toString) + 1).toDouble / Pow52.toDouble
    StrictMath.pow(u, 1.0 / weight.toDouble)
  }

  def sample(docs: Dataset[Doc], k: Int = 16): Dataset[ResRow] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[ResRow]
    implicit val stateEnc = Encoders.product[Reservoir]
    docs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Reservoir, ResRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Doc], state: GroupState[Reservoir]) =>
          transition(g, it, state, k)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(group: String, it: Iterator[Doc],
      state: GroupState[Reservoir], k: Int): Iterator[ResRow] = {
    val ord = Ordering.by[Entry, (Double, Long)](e => (-e.priority, e.docId))
    var res = state.getOption.map(_.entries.toVector).getOrElse(Vector.empty)
    var touched = false
    it.foreach { d =>
      touched = true
      if (!res.exists(_.docId == d.docId)) {
        val e = Entry(d.docId, d.weight, priority(d.docId, d.weight))
        // insert-if-better into the (priority desc, docId asc) top-k
        if (res.size < k || ord.lt(e, res.last)) {
          res = (res :+ e).sorted(ord)
          if (res.size > k) res = res.dropRight(1)
        }
      }
    }
    if (!touched) Iterator.empty
    else {
      state.update(Reservoir(res.toList))
      res.iterator.zipWithIndex.map { case (e, i) =>
        ResRow(group, i + 1, e.docId, e.weight, e.priority)
      }
    }
  }
}
