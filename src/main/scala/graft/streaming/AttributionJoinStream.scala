package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL JOIN — the operator class the other twins don't
  * cover: two live inputs joined on key + time bound (click → purchase
  * within the horizon), Spark buffering BOTH sides in state and emitting
  * matches as they meet. The time-bound predicate is what makes unbounded
  * state bounded: with watermarks on both sides and a range condition,
  * Spark derives per-side state retention (a click can be evicted once the
  * purchase watermark passes click-time + horizon) — an unconstrained
  * stream-stream join would grow state forever and is rejected in Append
  * mode.
  *
  * Batch parity: the same function applied to two batch frames is the
  * plain interval join, so the spec pins stream == batch on the union.
  * At scale both sides shuffle on `user_id` once; state per key is the
  * horizon's worth of events, not history.
  */
object AttributionJoinStream {
  /** clicks(user_id, click_id, ts_us) ⋈ purchases(user_id, purchase_id,
    * ts_us): purchase within (click, click + horizon]. */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      watermark: String, horizonUs: Long): DataFrame = {
    val c = clicks
      .withColumn("c_et", timestamp_micros(col("ts_us")))
      .withColumnRenamed("ts_us", "c_ts_us")
      .withWatermark("c_et", watermark)
    val p = purchases
      .withColumn("p_et", timestamp_micros(col("ts_us")))
      .withColumnRenamed("ts_us", "p_ts_us")
      .withWatermark("p_et", watermark)
    c.join(p,
        c("user_id") === p("user_id") &&
        col("p_et") > col("c_et") &&
        col("p_et") <= col("c_et") + expr(s"INTERVAL ${horizonUs / 1000000} SECONDS"))
      .select(c("user_id").as("user_id"), col("click_id"), col("purchase_id"),
        (col("p_ts_us") - col("c_ts_us")).as("lag_us"))
  }
}
