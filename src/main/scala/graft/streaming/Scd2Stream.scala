package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental SCD2 maintenance — the streaming twin of the
  * `q_scd2_build` relational key: per entity the GroupState holds exactly
  * the OPEN version row (state is O(|entities|), one small row each —
  * never the history, which lives in the sink); each arriving change
  * closes the open row (emitting it with `valid_to` and
  * `is_current = false`) and opens its own. The current open row re-emits
  * every batch its entity changes, so an Update-mode sink always holds
  * the latest view and each closed version exactly once (keyed by
  * (user_id, event_id): the LAST emission wins).
  *
  * Contract vs batch: identical when changes arrive in event-time order
  * per entity ACROSS batches (within-batch disorder is handled by the
  * event-time sort); a cross-batch late change would close the wrong
  * version — the same watermark-bounded trade every streaming SCD2
  * maintainer makes. `idleTtlMs` > 0 evicts entities idle past the TTL,
  * emitting nothing (their open row is already in the sink as current).
  */
object Scd2Stream {
  final case class CEvt(user_id: Long, event_id: Long, event_type: String,
      ts_us: Long)
  final case class OpenVersion(event_id: Long, event_type: String,
      valid_from: Long)
  final case class Scd2Row(user_id: Long, event_id: Long, event_type: String,
      valid_from: Long, valid_to: Option[Long], is_current: Boolean)

  /** Pure per-entity transition (exposed for direct unit testing):
    * fold time-sorted changes, returning (closed rows ++ current row,
    * next open state). */
  def advance(open: Option[OpenVersion], user: Long, sorted: Seq[CEvt])
      : (Seq[Scd2Row], Option[OpenVersion]) = {
    var cur = open
    val out = Seq.newBuilder[Scd2Row]
    sorted.foreach { e =>
      cur.foreach { o =>
        out += Scd2Row(user, o.event_id, o.event_type, o.valid_from,
          Some(e.ts_us), is_current = false)
      }
      cur = Some(OpenVersion(e.event_id, e.event_type, e.ts_us))
    }
    cur.foreach { o =>
      out += Scd2Row(user, o.event_id, o.event_type, o.valid_from,
        None, is_current = true)
    }
    (out.result(), cur)
  }

  def versions(changes: Dataset[CEvt], idleTtlMs: Long = 0L): Dataset[Scd2Row] = {
    implicit val evtEnc = Encoders.product[CEvt]
    implicit val stateEnc = Encoders.product[OpenVersion]
    implicit val outEnc = Encoders.product[Scd2Row]
    val timeout =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    changes
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenVersion, Scd2Row](
        OutputMode.Update(), timeout) {
        (user: Long, it: Iterator[CEvt], state: GroupState[OpenVersion]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (rows, next) = advance(state.getOption, user,
              it.toSeq.sortBy(e => (e.ts_us, e.event_id)))
            next.foreach(state.update)
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            rows.iterator
          }
      }
  }
}
