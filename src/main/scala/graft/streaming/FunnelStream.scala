package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time conversion funnel — the streaming twin of the `q_funnel`
  * relational key (view → click → purchase, strictly time-ordered): each
  * user's stage timestamps live in per-user GroupState (three optional
  * longs — state is O(|users|), never O(|events|)), advanced by folding
  * each micro-batch's events in event-time order under the SAME
  * acceptance rule as the batch query (a stage counts only if it happens
  * strictly after the previous stage's established minimum). The updated
  * funnel row emits every batch a user progresses — the live dashboard
  * shape.
  *
  * Contract vs batch: equal when events arrive watermark-respecting
  * (within-batch disorder is handled by the event-time sort; CROSS-batch
  * late data that predates an established earlier stage can under-admit a
  * later stage — the standard streaming-funnel trade, bounded by the
  * pipeline's watermark). `idleTtlMs` > 0 evicts users idle longer than
  * the TTL (processing-time), bounding state under user churn. */
object FunnelStream {
  final case class FEvt(user_id: Long, event_type: String, ts_us: Long)
  final case class FunnelState(t_view: Option[Long], t_click: Option[Long],
      t_purchase: Option[Long])
  final case class FunnelRow(user_id: Long, t_view: Long,
      t_click: Option[Long], t_purchase: Option[Long], stage: Long)

  /** Pure per-group transition (exposed for direct unit testing): fold
    * time-sorted events under the strict-ordering acceptance rule. */
  def advance(st: FunnelState, sorted: Seq[FEvt]): FunnelState =
    sorted.foldLeft(st) { (s, e) =>
      e.event_type match {
        case "view" =>
          s.copy(t_view = Some(s.t_view.fold(e.ts_us)(math.min(_, e.ts_us))))
        case "click" => s.t_view match {
          case Some(v) if e.ts_us > v =>
            s.copy(t_click = Some(s.t_click.fold(e.ts_us)(math.min(_, e.ts_us))))
          case _ => s
        }
        case "purchase" => s.t_click match {
          case Some(c) if e.ts_us > c =>
            s.copy(t_purchase = Some(s.t_purchase.fold(e.ts_us)(math.min(_, e.ts_us))))
          case _ => s
        }
        case _ => s
      }
    }

  private def rowOf(user: Long, s: FunnelState): Option[FunnelRow] =
    s.t_view.map { v =>
      FunnelRow(user, v, s.t_click, s.t_purchase,
        1L + s.t_click.map(_ => 1L).getOrElse(0L)
          + s.t_purchase.map(_ => 1L).getOrElse(0L))
    }

  /** Streaming operator: emits a user's current funnel row each batch the
    * user has events AND has entered the funnel (a view seen) — the batch
    * `q_funnel` population rule. */
  def funnel(events: Dataset[FEvt], idleTtlMs: Long = 0L): Dataset[FunnelRow] = {
    implicit val evtEnc = Encoders.product[FEvt]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelRow]
    val timeout =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update(), timeout) {
        (user: Long, it: Iterator[FEvt], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val next = advance(
              state.getOption.getOrElse(FunnelState(None, None, None)),
              it.toSeq.sortBy(_.ts_us))
            state.update(next)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            rowOf(user, next).iterator
          }
      }
  }
}
