package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-key simple linear regression — the streaming twin of the
  * batch `q_regression_stats` key (closed-form OLS slope + Pearson r over
  * integerized (x, y) pairs).
  *
  * State per key is the five sufficient statistics
  * (n, Σx, Σy, Σx², Σy², Σxy), all EXACT Longs over the same integerized
  * inputs the batch key uses (`floor(v + 0.5)` quantization applied by
  * the caller) — integer addition is associative/commutative, so the
  * streamed statistics are bit-equal to the batch aggregate under ANY
  * micro-batch split or arrival order: the mergeable-moments discipline
  * of [[MomentsStream]], extended to the bivariate case. The derived
  * slope numerator/denominators are recomputed from state on every emit,
  * never incrementally, so there is nothing to drift.
  *
  * State is O(|keys|) · 6 longs however much traffic arrives. Overflow
  * headroom: with |x|,|y| ≤ 10⁴ the Σxy magnitude reaches 2⁶³ only past
  * ~10¹⁴ rows per key; the n·Σxy products in the derived columns bind
  * earlier (~10⁹ rows per key at the same magnitudes) — the same margin
  * documented on the batch key.
  */
object RegressionStream {
  final case class XY(key: String, x: Long, y: Long)
  final case class RegState(n: Long, sx: Long, sy: Long, sxx: Long,
      syy: Long, sxy: Long)
  /** num = n·Σxy − Σx·Σy; denx = n·Σx² − (Σx)²; deny = n·Σy² − (Σy)² —
    * slope = num/denx, r = num/√(denx·deny), both re-entered in doubles
    * by the caller exactly as the batch key's final expression does. */
  final case class RegRow(key: String, n: Long, num: Long, denx: Long,
      deny: Long)

  /** Pure mergeable fold (exposed for direct unit testing). */
  def advance(st: RegState, batch: Seq[(Long, Long)]): RegState =
    batch.foldLeft(st) { case (s, (x, y)) =>
      RegState(s.n + 1, s.sx + x, s.sy + y, s.sxx + x * x,
        s.syy + y * y, s.sxy + x * y)
    }

  def rowOf(key: String, s: RegState): RegRow =
    RegRow(key, s.n, s.n * s.sxy - s.sx * s.sy,
      s.n * s.sxx - s.sx * s.sx, s.n * s.syy - s.sy * s.sy)

  def regress(points: Dataset[XY], idleTtlMs: Long = 0L): Dataset[RegRow] = {
    implicit val xyEnc = Encoders.product[XY]
    implicit val stateEnc = Encoders.product[RegState]
    implicit val outEnc = Encoders.product[RegRow]
    val timeout =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[RegState, RegRow](
        OutputMode.Update(), timeout) {
        (key: String, it: Iterator[XY], state: GroupState[RegState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val next = advance(
              state.getOption.getOrElse(RegState(0L, 0L, 0L, 0L, 0L, 0L)),
              it.map(p => (p.x, p.y)).toSeq)
            state.update(next)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            Iterator.single(rowOf(key, next))
          }
      }
  }
}
