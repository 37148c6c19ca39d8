package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-user event-transition extraction — the incremental twin
  * of the batch `q_markov_transitions` key (first-order Markov view of
  * the event stream, maintained online).
  *
  * State is the user's LAST event (ts_us, event_id, event_type) — one
  * small tuple per active user, the same bound as the sessionizer; the
  * optional TTL evicts idle users under a retention contract. Each
  * arriving event emits the (src = last type, dst = this type) transition
  * row; downstream counting is an ordinary streaming aggregation.
  *
  * Ordering contract (same as the other admission twins): events are
  * sequenced by (ts_us, event_id) WITHIN a micro-batch, and batches are
  * assumed to arrive in event-time order per user — the processing-time
  * admission semantics. A production deployment fronting an out-of-order
  * source adds a watermark + event-time sort upstream; the batch key is
  * the exact retrospective answer either way.
  */
object TransitionStream {
  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class Trans(user_id: Long, src: String, dst: String,
      ts_us: Long)
  final case class Last(ts_us: Long, event_id: Long, event_type: String)

  def transitions(events: Dataset[Ev], ttlMs: Long = 0L): Dataset[Trans] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Trans]
    implicit val stateEnc = Encoders.product[Last]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Last, Trans](OutputMode.Append(), timeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Last]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var last = state.getOption
            val out = sorted.flatMap { e =>
              val t = last.map(l => Trans(uid, l.event_type, e.event_type, e.ts_us))
              last = Some(Last(e.ts_us, e.event_id, e.event_type))
              t
            }
            last.foreach(state.update)
            if (ttlMs > 0 && last.nonEmpty) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }
}
