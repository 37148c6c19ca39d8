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

  // ------------------------------------------------------------ TWAP

  /** Time-weighted average value per user (the monitoring/billing metric:
    * each reading weighted by how long it was current, at SECOND
    * resolution). lead() pairs each event with its successor; durations
    * floor to whole seconds so the Σ value·duration decimal sum keeps its
    * unscaled value inside 2⁵³ — the envelope where a decimal→double cast
    * is a SINGLE rounding in both engines (DuckDB converts the unscaled
    * int then divides by 10^scale: two roundings once the int leaves the
    * exact-double range, which is exactly where a µs-weighted numerator
    * landed and diverged by 1 ulp). The final division is one pinned
    * double op. Zero-duration users report their earliest reading. */
  private val qTwap: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    eventsTs(s, dir)
      .withColumn("next_ts", lead(col("ts_us"), 1).over(w))
      .withColumn("dur_s",
        expr("coalesce(next_ts - ts_us, 0L) div 1000000"))
      .groupBy("user_id")
      .agg(
        sum((col("value") * col("dur_s")).cast("decimal(18,6)")).cast("double").as("wsum"),
        sum("dur_s").as("tot_s"),
        min_by(col("value"),
          format_string("%020d-%020d", col("ts_us"), col("event_id"))).as("first_v"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        when(col("tot_s") === 0, col("first_v"))
          .otherwise(col("wsum") / col("tot_s").cast("double")).as("twap"),
        col("tot_s"), col("n"))
      .orderBy("user_id")
  }

  // ------------------------------------------------- rolling z-score

  /** Per-event anomaly score against the TRAILING 20 same-type events
    * (strictly before the current row — the streaming-friendly form of
    * q_anomaly_zscore's global stats). Decimal window sums are exact, the
    * mean/var/σ expression shape is pinned identically in the oracle, and
    * NaN never reaches the filter: the variance guard runs on bit-equal
    * doubles in both engines (DuckDB orders NaN above everything, Spark
    * does not — an unguarded |z| > 2 would diverge on zero-variance
    * windows). */
  private val qRollingZscore: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts_us"), col("event_id")).rowsBetween(-20, -1)
    val dsumW = (c: org.apache.spark.sql.Column) =>
      sum(c.cast("decimal(18,6)")).over(w).cast("double")
    eventsTs(s, dir)
      .withColumn("sv", dsumW(col("value")))
      .withColumn("sv2", dsumW(col("value") * col("value")))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") >= 10)
      .withColumn("varg",
        col("sv2") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")))
      .filter(col("varg") > 0)
      .withColumn("z", (col("value") - col("sv") / col("n")) / sqrt(col("varg")))
      .filter(abs(col("z")) > lit(3.0))
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  // -------------------------------------------------- gaps and islands

  /** Longest consecutive-day activity streak per user (the gaps-and-
    * islands shape): on the (user, day) distinct grid, `day − row_number`
    * is constant within a run of consecutive days, so one window + one
    * two-level agg finds every streak. The window partitions by user and
    * consumes at most that user's distinct DAYS (grid rows, not events). */
  private val qActivityStreaks: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val du = eventsTs(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    du.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"), count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  // ----------------------------------------------------- per-group HLL

  /** HyperLogLog distinct-user estimate PER GROUP (event_type) next to the
    * exact count — the sketch-partitioned form of `text_hll_distinct`:
    * registers key on (group, bucket), so state is m rows per group
    * however many users stream through, and per-group sketches are
    * mergeable across shards/epochs by register max. Same integer register
    * chain + ONE pinned double division as the global key (oracle
    * bit-equal); p=6 → ±~13% — the err column is part of the output. */
  private val qHllPerGroup: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val m = 64L
    val ev = eventsTs(s, dir).select(col("event_type"), col("user_id"))
    val h = graft.functions.GraftFunctions.md5PrefixLong(
      col("user_id").cast("string"), 1, 15)
    val hashed = ev.select(col("event_type"),
      (h % m).as("bucket"), (h / m).cast("long").as("rest"))
    val rank = least(lit(50),
      lit(55) - when(col("rest") === 0, lit(0)).otherwise(length(bin(col("rest")))))
    val regs = hashed.select(col("event_type"), col("bucket"), rank.as("rank"))
      .groupBy("event_type", "bucket").agg(max("rank").as("reg"))
    val sums = regs.groupBy("event_type").agg(
      sum(expr("shiftleft(1L, cast(50 - reg as int))")).as("s_present"),
      count(lit(1)).as("nb"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sums
      .select(col("event_type"),
        (col("s_present") + (lit(m) - col("nb")) * lit(1L << 50)).as("s"))
      .join(exact, "event_type")
      .select(col("event_type"), col("exact_distinct"),
        (lit(0.709) * lit((m * m).toDouble) * lit((1L << 50).toDouble) /
          col("s").cast("double")).as("hll_est"))
      .withColumn("err_x10000",
        floor(lit(10000.0) * abs(col("hll_est") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).cast("long"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, Q] = Map(
    "q_ewma" -> qEwma,
    "q_ohlc_bars" -> qOhlc,
    "q_retention_cohorts" -> qRetention,
    "q_wau_sliding_distinct" -> qWau,
    "q_cumulative_users" -> qCumulativeUsers,
    "q_hll_per_group" -> qHllPerGroup,
    "q_activity_streaks" -> qActivityStreaks,
    "q_rolling_zscore" -> qRollingZscore,
    "q_time_weighted_avg" -> qTwap)

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

    "q_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |d AS (
        |  SELECT user_id, value, ts_us, event_id,
        |    coalesce(lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) - ts_us, 0) // 1000000 AS dur_s
        |  FROM e),
        |a AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(value * dur_s AS DECIMAL(18,6))) AS DOUBLE) AS wsum,
        |    CAST(sum(dur_s) AS BIGINT) AS tot_s,
        |    arg_min(value, printf('%020d-%020d', ts_us, event_id)) AS first_v,
        |    count(*) AS n
        |  FROM d GROUP BY user_id)
        |SELECT user_id,
        |  CASE WHEN tot_s = 0 THEN first_v
        |       ELSE wsum / CAST(tot_s AS DOUBLE) END AS twap,
        |  tot_s, n
        |FROM a ORDER BY user_id""".stripMargin,

    "q_rolling_zscore" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT event_id, event_type, value,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sv,
        |    CAST(sum(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sv2,
        |    count(*) OVER w AS n
        |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT *, sv2 / n - (sv / n) * (sv / n) AS varg
        |  FROM s WHERE n >= 10),
        |z AS (
        |  SELECT event_id, event_type, value,
        |    (value - sv / n) / sqrt(varg) AS z
        |  FROM g WHERE varg > 0)
        |SELECT event_id, event_type, value, z FROM z
        |WHERE abs(z) > 3.0 ORDER BY event_id""".stripMargin,

    "q_activity_streaks" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM du),
        |runs AS (
        |  SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |  count(*) AS n_streaks
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_hll_per_group" -> {
      val hexFold = ExtQueries.hexFoldSql(1, 15)
      s"""WITH hh AS (
         |  SELECT event_type, $hexFold AS h
         |  FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
         |        FROM events)),
         |hb AS (SELECT event_type, h % 64 AS bucket, h // 64 AS rest FROM hh),
         |regs AS (SELECT event_type, bucket,
         |    max(least(50, 55 - CASE WHEN rest = 0 THEN 0
         |                           ELSE length(bin(rest)) END)) AS reg
         |  FROM hb GROUP BY 1, 2),
         |sums AS (SELECT event_type,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(50 - reg AS INT)) AS BIGINT)
         |      AS s_present,
         |    CAST(count(*) AS BIGINT) AS nb FROM regs GROUP BY 1),
         |st AS (SELECT event_type,
         |    s_present + (64 - nb) * (CAST(1 AS BIGINT) << 50) AS s FROM sums),
         |ex AS (SELECT event_type,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |  FROM events GROUP BY 1),
         |est AS (SELECT st.event_type, exact_distinct,
         |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |      * CAST(1125899906842624 AS DOUBLE) / CAST(s AS DOUBLE) AS hll_est
         |  FROM st JOIN ex ON st.event_type = ex.event_type)
         |SELECT event_type, exact_distinct, hll_est,
         |  CAST(floor(CAST(10000 AS DOUBLE)
         |    * abs(hll_est - CAST(exact_distinct AS DOUBLE))
         |    / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_x10000
         |FROM est ORDER BY event_type""".stripMargin
    },

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
