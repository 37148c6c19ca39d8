package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the custom-state streaming operator the
  * reference lacks (SURVEY.md §2.2: "no dedup, no sessionization").
  * Event-time sessions with an inactivity gap, kept in per-user
  * GroupState and emitted when the watermark passes the gap
  * (EventTimeTimeout). The batch twin (identical session boundaries) is the
  * `sessionize_events` query key in graft.queries.RelQueries.
  */
object Sessionize {
  /** One input event: user, event-time in µs, and the watermarked
    * TimestampType twin of the same instant (`et = timestamp_micros(ts_us)`)
    * — the analyzer requires the watermark column to flow into the stateful
    * operator. */
  final case class Evt(user_id: Long, ts_us: Long, et: java.sql.Timestamp)
  /** An open session accumulator. */
  final case class SessionState(start_us: Long, end_us: Long, n_events: Long)
  /** A closed session. */
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Pure per-group transition: fold sorted new events into the open
    * session, emitting every session closed by a gap. Exposed for direct
    * unit testing; the streaming operator below wraps it. */
  def advance(open: Option[SessionState], sorted: Seq[Evt], gapUs: Long)
      : (Option[SessionState], Seq[SessionState]) =
    sorted.foldLeft((open, Vector.empty[SessionState])) {
      case ((None, closed), e) =>
        (Some(SessionState(e.ts_us, e.ts_us, 1L)), closed)
      case ((Some(s), closed), e) if e.ts_us - s.end_us > gapUs =>
        (Some(SessionState(e.ts_us, e.ts_us, 1L)), closed :+ s)
      case ((Some(s), closed), e) =>
        (Some(s.copy(end_us = math.max(s.end_us, e.ts_us), n_events = s.n_events + 1)), closed)
    } match { case (o, c) => (o, c) }

  /** Streaming operator: requires a watermark on the event-time column the
    * caller derived `ts_us` from; sessions close `gapUs` after their last
    * event (state timeout = watermark-driven). Output mode: Append. */
  def sessions(events: Dataset[Evt], gapUs: Long): Dataset[Session] = {
    implicit val evtEnc = Encoders.product[Evt]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Evt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(user, s.start_us, s.end_us, s.n_events)).toSeq
            state.remove()
            out.iterator
          } else {
            val (open, closed) =
              advance(state.getOption, it.toSeq.sortBy(e => (e.ts_us)), gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                // close the session once the watermark passes end + gap
                state.setTimeoutTimestamp(s.end_us / 1000 + gapUs / 1000)
              case None => state.remove()
            }
            closed.map(s => Session(user, s.start_us, s.end_us, s.n_events)).iterator
          }
      }
  }
}
