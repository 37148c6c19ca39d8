package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series depth over the events stream (SURVEY.md §2.3 `q_*` family):
  * the metrics-engine surface a log-analytics deployment layers on top of
  * the reference's raw routing — smoothed series, OHLC rollups, cohort
  * retention. All deterministic across engines:
  *   - EWMA folds LEFT over an explicitly (ts, id)-sorted list on both
  *     engines, so every IEEE rounding happens in the same sequence —
  *     bit-equal results without banning floats.
  *   - OHLC open/close selection uses a zero-padded `(ts, id)` string key
  *     (total order at any scale; DuckDB's arg_min takes only scalar
  *     keys) — selection, not arithmetic, so doubles pass through exact.
  *   - Retention is pure integer calendar math.
  *
  * Scale notes: EWMA's per-group list is bounded by a single user's event
  * count (the per-entity history, not the corpus); OHLC and retention are
  * plain map-side-combined aggregations on high-cardinality composite
  * keys. Nothing here windows over the raw stream unpartitioned.
  */
object TsQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** 15-minute bucket in µs. */
  private val BucketUs = 900000000L

  // ------------------------------------------------------------------ ewma

  /** Per-user exponentially-weighted moving average (α = 1/2) of `value`
    * in (ts, id) order: e₀ = v₀, eᵢ = eᵢ₋₁/2 + vᵢ/2. The fold order is
    * pinned by an explicit array_sort, so the oracle's list_reduce over
    * its own ordered list performs the identical IEEE op sequence. */
  private val qEwma: Q = (s, dir) =>
    eventsTs(s, dir)
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_id"), col("value"))).as("evs"))
      .select(col("user_id"),
        expr("transform(array_sort(evs), e -> e.value)").as("vs"))
      .select(col("user_id"),
        size(col("vs")).as("n"),
        expr("aggregate(slice(vs, 2, size(vs) - 1), CAST(vs[0] AS DOUBLE)," +
          " (acc, x) -> acc / 2D + x / 2D)").as("ewma"))
      .orderBy("user_id")

  // ------------------------------------------------------------------ ohlc

  /** OHLC candlestick rollup: per (user, 15-min bucket) open/high/low/
    * close/volume plus a decimal-exact value sum. Open/close are min_by/
    * max_by on the padded (ts, id) key — pure selection of stored doubles,
    * no float arithmetic to drift. */
  private val qOhlc: Q = (s, dir) => {
    val key = format_string("%020d-%020d", col("ts_us"), col("event_id"))
    eventsTs(s, dir)
      .withColumn("bucket_us", expr(s"ts_us div ${BucketUs}L * ${BucketUs}L"))
      .withColumn("k", key)
      .groupBy("user_id", "bucket_us")
      .agg(
        min_by(col("value"), col("k")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("k")).as("close"),
        count(lit(1)).as("volume"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "bucket_us")
  }

  // ------------------------------------------- retention cohort matrix

  /** Weekly cohort retention: users grouped by first-seen week, counted
    * distinct in each subsequent week offset — the (cohort × week) matrix
    * every product-analytics stack ships. Two map-side-combined aggs
    * joined on user_id (broadcast when cohorts are small, co-partitioned
    * hash join at scale). */
  private val qRetention: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000 div 7").as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .distinct()
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  // ------------------------------------------------- sliding distinct WAU

  /** Rolling 7-day distinct users per active day (the DAU/WAU board
    * metric). A naive `countDistinct` over a sliding window would carry
    * every user id through every window frame; instead the stream
    * pre-collapses to the (day, user) distinct grid — bounded by
    * days × active users, ~raw-volume/events-per-user-day smaller — and
    * the 7-day membership becomes an integer range join on the day axis
    * followed by a plain distinct count. At 100 TB the grid is the only
    * thing that shuffles twice, never the raw events. */
  private val qWau: Q = (s, dir) => {
    val dayUser = eventsTs(s, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = dayUser.select("day").distinct()
    days.join(dayUser.withColumnRenamed("day", "d2"),
        col("d2") >= col("day") - 6 && col("d2") <= col("day"))
      .select("day", "user_id").distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
      .join(dayUser.groupBy("day").agg(count(lit(1)).as("dau")), "day")
      .orderBy("day")
  }

  // ------------------------------------------------ cumulative distinct

  /** Cumulative unique users per day (the growth curve). A running
    * `countDistinct` window would re-scan every user id per frame; the
    * scalable form counts each user ONCE at their first-seen day, then
    * running-sums the per-day first-seen counts — a window over ≤ |days|
    * rows, not over the stream. */
  private val qCumulativeUsers: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = eventsTs(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .groupBy("user_id").agg(min("day").as("first_day"))
      .groupBy("first_day").agg(count(lit(1)).as("new_users"))
    firstSeen
      .withColumn("cum_users",
        sum("new_users").over(Window.orderBy("first_day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("first_day")
  }

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, Q] = Map(
    "q_ewma" -> qEwma,
    "q_ohlc_bars" -> qOhlc,
    "q_retention_cohorts" -> qRetention,
    "q_wau_sliding_distinct" -> qWau,
    "q_cumulative_users" -> qCumulativeUsers)

  val oracle: Map[String, String] = Map(
    "q_ewma" ->
      """SELECT user_id, CAST(count(*) AS INT) AS n,
        |  list_reduce(list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id),
        |              (a, b) -> a / 2 + b / 2) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_ohlc_bars" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         |    epoch_us(ts) // $BucketUs * $BucketUs AS bucket_us,
         |    printf('%020d-%020d', epoch_us(ts), event_id) AS k
         |  FROM events)
         |SELECT user_id, bucket_us,
         |  arg_min(value, k) AS open, max(value) AS high,
         |  min(value) AS low, arg_max(value, k) AS close,
         |  count(*) AS volume,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM e GROUP BY user_id, bucket_us
         |ORDER BY user_id, bucket_us""".stripMargin,

    "q_wau_sliding_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |w AS (
        |  SELECT DISTINCT days.day, du.user_id
        |  FROM days JOIN du ON du.day BETWEEN days.day - 6 AND days.day),
        |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY day),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day)
        |SELECT day, wau, dau FROM wau JOIN dau USING (day)
        |ORDER BY day""".stripMargin,

    "q_cumulative_users" ->
      """WITH fs AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY user_id),
        |nd AS (SELECT first_day, count(*) AS new_users FROM fs GROUP BY 1)
        |SELECT first_day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY first_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM nd ORDER BY first_day""".stripMargin,

    "q_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT e.user_id, c.cohort_week,
        |    e.week - c.cohort_week AS weeks_since
        |  FROM e JOIN c USING (user_id))
        |SELECT cohort_week, weeks_since, count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
