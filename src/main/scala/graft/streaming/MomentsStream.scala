package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-key moments — the streaming twin of the
  * `q_anomaly_zscore` relational key: per metric key the GroupState holds
  * (n, Σv, Σv²) with the sums kept EXACTLY as scale-6 BigDecimals — the
  * identical quantization the batch key's `CAST(value AS DECIMAL(18,6))`
  * sum applies — so the streamed moments are bit-equal to the batch
  * aggregate under ANY batch split or arrival order (decimal addition is
  * associative/commutative; this is the mergeable-moments discipline the
  * emb_gram/drift family uses, applied to scalar metrics). State is
  * O(|keys|) · 3 numbers, however much traffic arrives — the bounded
  * ingest statistic an anomaly monitor keeps.
  */
object MomentsStream {
  final case class MEvt(event_type: String, value: Double)
  final case class MomentState(n: Long, s: BigDecimal, s2: BigDecimal)
  final case class MomentRow(event_type: String, n: Long, mean: Double,
      std: Double)

  private val Scale = 6

  /** The batch cast's exact quantization: double → DECIMAL(18,6), HALF_UP
    * on the canonical (shortest) decimal representation — Spark's
    * `Decimal.set(Double)` contract. */
  def quant(v: Double): BigDecimal =
    BigDecimal.decimal(v).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  /** Pure mergeable fold (exposed for direct unit testing). */
  def advance(st: MomentState, batch: Seq[Double]): MomentState =
    batch.foldLeft(st) { (s, v) =>
      MomentState(s.n + 1, s.s + quant(v), s.s2 + quant(v * v))
    }

  /** The batch key's exact IEEE expression shape: mean = Σv/n (decimal →
    * double, then double division), var = Σv²/n − mean², std = √var. */
  def rowOf(key: String, s: MomentState): MomentRow = {
    val mean = s.s.toDouble / s.n
    val std = math.sqrt(s.s2.toDouble / s.n - mean * mean)
    MomentRow(key, s.n, mean, std)
  }

  /** Z-score of a value against streamed moments — what the batch key
    * computes per event against the full-corpus stats. */
  def zscore(v: Double, m: MomentRow): Double = (v - m.mean) / m.std

  def moments(events: Dataset[MEvt], idleTtlMs: Long = 0L): Dataset[MomentRow] = {
    implicit val evtEnc = Encoders.product[MEvt]
    implicit val stateEnc = Encoders.product[MomentState]
    implicit val outEnc = Encoders.product[MomentRow]
    val timeout =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState[MomentState, MomentRow](
        OutputMode.Update(), timeout) {
        (key: String, it: Iterator[MEvt], state: GroupState[MomentState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val next = advance(
              state.getOption.getOrElse(MomentState(0L, BigDecimal(0), BigDecimal(0))),
              it.map(_.value).toSeq)
            state.update(next)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            Iterator.single(rowOf(key, next))
          }
      }
  }
}
