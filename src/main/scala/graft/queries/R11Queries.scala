package graft.queries

import graft.streaming.{NativeSessionStream, Scd2Stream, WeightedReservoirStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave: three more streaming twins converted from spec-asserted
  * to ORACLE-asserted via the deterministic-replay pattern R10Queries
  * established (r10 verdict #2 named these three as the richest uncovered
  * state machines). Each key drives the REAL stateful operator through a
  * pinned micro-batch schedule and registers its full emission log (not
  * just the final state) as a keyed query whose DuckDB twin recomputes the
  * identical log in SQL — so cross-batch state survival AND the per-batch
  * emission discipline are both gate-checked.
  *
  * Shared replay conventions (same scaffolding caveats as R10Queries: the
  * driver-side collect feeding MemoryStream exists because a deterministic
  * oracle requires pinned batch membership; production ingest is the
  * socket/kafka readStream path):
  *  - time-keyed operators (SCD2, session window) batch by TS TERCILE —
  *    b = 0/1/2 as ts_us falls below tmin+(tmax-tmin)/3, below
  *    tmin+2(tmax-tmin)/3, or above (integer floor division, exact in both
  *    engines). A tercile rule is monotone in event time, so per-entity
  *    arrival order matches event-time order across batches (the SCD2
  *    contract) and no event is ever behind the watermark (the session
  *    contract) — while still forcing entity state to survive two real
  *    batch boundaries;
  *  - the order-independent operator (weighted reservoir) batches by
  *    doc_id % 3 — membership only, order free by the operator's merge
  *    contract.
  */
object R11Queries {

  type Q = (SparkSession, String) => DataFrame

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Tercile batch id for `ts` given the corpus [tmin, tmax] — floor
    * division on µs longs, mirrored verbatim by the oracle SQL
    * ([[TercileCaseSql]]). Shared with the wave-2 replays (R11bQueries). */
  private[queries] def tercileOf(ts: Long, tmin: Long, tmax: Long): Int =
    if (ts < tmin + (tmax - tmin) / 3) 0
    else if (ts < tmin + 2 * (tmax - tmin) / 3) 1
    else 2

  /** Deterministic 3-batch replay of the events table through the
    * streaming SCD2 maintainer (graft.streaming.Scd2Stream): per user the
    * GroupState holds exactly the OPEN version; each arriving change
    * closes it (one `is_current=false` row with `valid_to`) and opens its
    * own; the batch-final version re-emits as current.
    *
    * The emission log is a pure function of (global (ts_us, event_id)
    * order, batch membership): every version emits its CLOSED row exactly
    * once (in the batch its successor arrives — for a version opened in
    * batch b and closed in batch b' > b, that row is cross-batch state
    * surviving b'-b boundaries), and emits a CURRENT row iff it is the
    * last event of its user within its own batch (successor in a LATER
    * batch or none). The DuckDB twin rebuilds the version chain with
    * lead() over (user, ts, event_id) and the same tercile rule. */
  private val streamScd2Replay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .as[Scd2Stream.CEvt].collect().toSeq
    val (tmin, tmax) = (evs.map(_.ts_us).min, evs.map(_.ts_us).max)
    val batches = (0 to 2).map(b => evs.filter(e => tercileOf(e.ts_us, tmin, tmax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Scd2Stream.CEvt]
    val sinkName = s"graft_scd2_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(Scd2Stream.versions(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    val rows =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        s.table(sinkName).as[Scd2Stream.Scd2Row].collect().toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    // bounded: ≤ 2 emission rows per event (one closed + at most one
    // current), materialized so the result outlives the stopped query
    rows.toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("user_id", "event_id", "is_current")
  }

  /** Deterministic replay of the events table through the NATIVE
    * session-window streaming aggregation (graft.streaming
    * .NativeSessionStream — Spark's own session_window state store, Append
    * mode): three tercile batches, then a single far-future sentinel event
    * (user −1, tmax + 100 days) whose watermark advance closes and emits
    * every real session. The sentinel's own session can never emit (the
    * watermark never passes it), so filtering user_id ≥ 0 yields exactly
    * the full session set.
    *
    * Because Append-mode sessions emit exactly once and the session
    * partition is a pure function of the event multiset (the gap rule —
    * split only when the gap STRICTLY exceeds 30 min), the drained log
    * equals the batch sessionization verbatim: the oracle is the SAME SQL
    * as the q_session_window key, which is precisely the batch≡stream
    * claim, now hash-checked instead of spec-asserted. */
  private val streamSessionReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val gapUs = 1800L * 1000000L
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("ts_us"))
      .as[(Long, Long)].collect().toSeq
    val (tmin, tmax) = (evs.map(_._2).min, evs.map(_._2).max)
    val batches = (0 to 2).map(b => evs.filter(e => tercileOf(e._2, tmin, tmax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .withColumn("et", timestamp_micros(col("ts_us")))
    val sinkName = s"graft_sess_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(NativeSessionStream.sessions(events, "30 minutes", "0 seconds", gapUs)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    val rows =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        input.addData((-1L, tmax + 100L * 86400L * 1000000L))
        q.processAllAvailable()
        s.table(sinkName).as[(Long, Long, Long, Long)].collect().toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    rows.toDF("user_id", "start_us", "end_us", "n_events")
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "start_us")
  }

  /** Deterministic 3-batch replay through the streaming A-ES weighted
    * reservoir (graft.streaming.WeightedReservoirStream, Update mode):
    * groups g0..g7 by doc_id % 8, batches by doc_id % 3, k = 16. Every
    * touched group re-emits its FULL current reservoir each batch, so the
    * memory sink accumulates a multiset whose per-row counts are exact:
    * emission(b, g) = ranked top-16 by (priority desc, doc_id) over the
    * docs of g with batch ≤ b. The key outputs that multiset grouped with
    * counts — batch-0 survivors showing up under batch-1/2 emissions is
    * the cross-batch state the oracle verifies.
    *
    * Priorities are REAL A-ES doubles, u^(1/w) with u = (md5-52(doc_id)
    * + 1)/2⁵², yet still bitwise DuckDB-replayable because the replay
    * weights are restricted to {1, 2} (w = 1 + doc_id % 2): fdlibm pow —
    * what StrictMath and the operator evaluate — special-cases y = 1 to x
    * and y = 0.5 to sqrt(x), and IEEE sqrt is correctly rounded in both
    * engines, so CASE weight WHEN 1 THEN u ELSE sqrt(u) END reproduces the
    * exact bits. (General weights are NOT SQL-replayable — fdlibm pow vs
    * libm pow differ in the last ulp, measured in StrictPow's scaladoc —
    * which is why the unrestricted twin stays byte-compared against the
    * batch draw in WeightedReservoirStreamSpec instead.) */
  private val streamWeightedReservoirReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir).select(col("doc_id"))
      .as[Long].collect().sorted.toSeq
      .map(id => WeightedReservoirStream.Doc(s"g${id % 8}", id, 1 + id % 2))
    val batches = (0 to 2).map(b => docs.filter(_.docId % 3 == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[WeightedReservoirStream.Doc]
    val sinkName = s"graft_wres_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(WeightedReservoirStream.sample(input.toDS(), k = 16)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    val rows =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        s.table(sinkName).as[WeightedReservoirStream.ResRow].collect().toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    // bounded: ≤ 3 batches × 8 groups × 16 ranks emission rows
    rows.toDF()
      .groupBy(col("group").as("grp"), col("rank").cast("long").as("rnk"),
        col("docId").as("doc_id"), col("weight"), col("priority"))
      .agg(count(lit(1)).as("n"))
      .select("grp", "rnk", "doc_id", "weight", "priority", "n")
      .orderBy("grp", "rnk", "doc_id")
  }

  val queries: Map[String, Q] = Map(
    "stream_scd2_replay" -> streamScd2Replay,
    "stream_session_replay" -> streamSessionReplay,
    "stream_weighted_reservoir_replay" -> streamWeightedReservoirReplay)

  /** Shared tercile SQL fragment over a CTE `e(user_id, ..., ts_us)` with
    * bounds CTE `r(tmin, tmax)`. */
  private[queries] val TercileCaseSql =
    """CASE WHEN ts_us < tmin + (tmax - tmin) // 3 THEN 0
      |     WHEN ts_us < tmin + 2 * (tmax - tmin) // 3 THEN 1
      |     ELSE 2 END""".stripMargin

  val oracle: Map[String, String] = Map(
    // SQL replay of the SCD2 emission log: version chain via lead() over
    // (user, ts, event_id); CLOSED row for every non-final version;
    // CURRENT row iff the successor is in a strictly later tercile batch
    // (or absent) — i.e. the version was batch-final for its user.
    "stream_scd2_replay" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |r AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM e),
         |b AS (SELECT e.*, $TercileCaseSql AS bt FROM e, r),
         |v AS (SELECT user_id, event_id, event_type, ts_us AS valid_from,
         |    lead(ts_us) OVER w AS valid_to, bt, lead(bt) OVER w AS next_bt
         |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
         |SELECT user_id, event_id, event_type, valid_from, valid_to,
         |  FALSE AS is_current
         |FROM v WHERE valid_to IS NOT NULL
         |UNION ALL
         |SELECT user_id, event_id, event_type, valid_from,
         |  CAST(NULL AS BIGINT), TRUE
         |FROM v WHERE next_bt IS NULL OR next_bt > bt
         |ORDER BY user_id, event_id, is_current""".stripMargin,

    // the batch≡stream claim verbatim: the drained native-session stream
    // must hash-equal the batch sessionization (same SQL as the
    // q_session_window oracle — strictly-greater-gap split rule)
    "stream_session_replay" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,

    // SQL replay of the reservoir emission multiset: per (group, batch)
    // with ≥1 arrival, rank the batch-prefix docs by (priority desc,
    // doc_id), keep rank ≤ 16, and count identical emission rows across
    // batches. u is exact in a double (52-bit int + 1, /2⁵²); weights
    // {1,2} make u^(1/w) = u or sqrt(u) — bitwise-equal to fdlibm.
    "stream_weighted_reservoir_replay" ->
      s"""WITH d AS (SELECT doc_id, 'g' || CAST(doc_id % 8 AS VARCHAR) AS grp,
         |    1 + doc_id % 2 AS weight, doc_id % 3 AS bt,
         |    md5(CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents),
         |p AS (SELECT doc_id, grp, weight, bt,
         |    CAST(${ExtQueries.hexFoldSql(1, 13)} + 1 AS DOUBLE)
         |      / 4503599627370496.0 AS u
         |  FROM d),
         |pr AS (SELECT doc_id, grp, weight, bt,
         |    CASE WHEN weight = 1 THEN u ELSE sqrt(u) END AS priority FROM p),
         |touched AS (SELECT DISTINCT grp, bt FROM pr),
         |em AS (SELECT t.bt, p.grp, p.doc_id, p.weight, p.priority,
         |    row_number() OVER (PARTITION BY t.grp, t.bt
         |      ORDER BY p.priority DESC, p.doc_id) AS rnk
         |  FROM touched t JOIN pr p ON p.grp = t.grp AND p.bt <= t.bt)
         |SELECT grp, rnk, doc_id, weight, priority, count(*) AS n
         |FROM em WHERE rnk <= 16
         |GROUP BY grp, rnk, doc_id, weight, priority
         |ORDER BY grp, rnk, doc_id""".stripMargin)
}
