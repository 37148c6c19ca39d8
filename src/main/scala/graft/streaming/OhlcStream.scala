package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC bars — the live twin of the batch `q_ohlc_bars` key:
  * native tumbling-window aggregation in Append mode, with open/close as
  * `min_by`/`max_by` on the zero-padded (ts, id) key. Both are
  * DeclarativeAggregates, so their partial states merge associatively in
  * the window state store — the same merge that makes the batch agg
  * map-side combinable makes the streaming agg incremental; no GroupState
  * machinery needed.
  *
  * State is O(open windows × users-per-window) single rows; a window
  * leaves the store when the watermark passes its end. Input contract:
  * `user_id`, `event_id`, `ts_us` (µs long), `value`; emitted bars carry
  * the same (user_id, bucket_us, open, high, low, close, volume) shape as
  * the batch key.
  */
object OhlcStream {
  def bars(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withColumn("et", timestamp_micros(col("ts_us")))
      .withColumn("k", format_string("%020d-%020d", col("ts_us"), col("event_id")))
      .withWatermark("et", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("et"), window), col("user_id"))
      .agg(
        min_by(col("value"), col("k")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("k")).as("close"),
        count(lit(1)).as("volume"))
      .select(col("user_id"), unix_micros(col("window.start")).as("bucket_us"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
}
