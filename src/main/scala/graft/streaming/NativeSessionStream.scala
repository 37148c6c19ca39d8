package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NATIVE session-window streaming aggregation — the built-in
  * `session_window` operator in Append mode, next to the custom-GroupState
  * twin ([[Sessionize]]): Spark merges per-key session intervals in its
  * own session-window state store and emits a session once the watermark
  * passes its close (start + last gap). Same boundary rule as the batch
  * `q_session_window` key (an exact-gap event still MERGES — a session
  * splits only when the gap strictly exceeds the timeout; spec-probed in
  * both modes), so a drained stream equals the batch result.
  *
  * State is O(open sessions) — bounded by the watermark: closed sessions
  * leave the store on emission. Input contract: `user_id` plus an
  * event-time TimestampType column `et` the caller watermarks from.
  */
object NativeSessionStream {
  def sessions(events: DataFrame, gap: String, watermark: String,
      gapUs: Long): DataFrame =
    events
      .withWatermark("et", watermark)
      .groupBy(session_window(col("et"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        // session end = last event + gap; report the last-event time the
        // batch twin reports
        (unix_micros(col("session_window.end")) - gapUs).as("end_us"),
        col("n_events"))
}
