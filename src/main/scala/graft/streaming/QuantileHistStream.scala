package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantile sketch — the fifth member of the bounded-state sketch
  * family (KMV = cardinality, HLL = cardinality via registers, CMS =
  * frequency, space-saving = top-k, THIS = order statistics). The sketch is
  * the HDR-style log-histogram of the batch `sketch_quantile_histogram`
  * key: values quantize to µs, bucket = the value itself below 32 µs, else
  * 16·ilog2(v) + the next 4 mantissa bits (relative error ≤ 2⁻⁴); state is
  * the (bucket → count) map. Chosen over GK (whose compress steps depend on
  * arrival order) and KLL (randomized) because pure counting is the only
  * quantile state that is EXACTLY order-independent and mergeable — any
  * micro-batch split, any shuffle of arrivals, any union of per-node maps
  * produces the byte-identical histogram, so stream output equals the batch
  * key on the same rows (parity spec-pinned).
  *
  * State per group: ≤ 16·63 + 32 long counters, forever. Emission: Update
  * mode — each touched group re-emits (n, p50/p95/p99 lower bounds). */
object QuantileHistStream {
  final case class Obs(group: String, value: Double)
  final case class Hist(buckets: Map[Int, Long])
  final case class QRow(group: String, n: Long, p50Us: Long, p95Us: Long,
      p99Us: Long)

  /** The batch key's bucket code: CASE WHEN vq < 32 THEN vq ELSE
    * 16·ilog2(vq) + ((vq >> (ilog2(vq)−4)) & 15). */
  def bucketOf(value: Double): Int = {
    val vq = math.max(1L, math.floor(value * 1000000d).toLong)
    if (vq < 32) vq.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(vq)
      (16L * e + ((vq >> (e - 4)) & 15L)).toInt
    }
  }

  /** Bucket lower bound in µs — the batch key's decode expression. */
  def lowerOf(b: Int): Long =
    if (b < 32) b.toLong else (16L + b % 16) << (b / 16 - 4)

  /** ⌈q·n/100⌉-rank walk over the ascending bucket codes. */
  private[graft] def quantile(buckets: Map[Int, Long], n: Long, q: Int): Long = {
    val rank = (q * n + 99) / 100
    var cum = 0L
    for ((b, c) <- buckets.toSeq.sortBy(_._1)) {
      cum += c
      if (cum >= rank) return lowerOf(b)
    }
    0L
  }

  def quantiles(obs: Dataset[Obs]): Dataset[QRow] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[QRow]
    implicit val stateEnc = Encoders.product[Hist]
    obs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Hist, QRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Obs], state: GroupState[Hist]) =>
          transition(g, it, state)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(group: String, it: Iterator[Obs],
      state: GroupState[Hist]): Iterator[QRow] = {
    var m = state.getOption.map(_.buckets).getOrElse(Map.empty[Int, Long])
    var touched = false
    it.foreach { o =>
      touched = true
      val b = bucketOf(o.value)
      m = m.updated(b, m.getOrElse(b, 0L) + 1L)
    }
    if (!touched) Iterator.empty
    else {
      state.update(Hist(m))
      val n = m.valuesIterator.sum
      Iterator.single(QRow(group, n,
        quantile(m, n, 50), quantile(m, n, 95), quantile(m, n, 99)))
    }
  }
}
