package graft.queries

import graft.streaming.{AttributionJoinStream, CmsStream, FingerprintStream,
  FunnelStream, HllStream, KmvStream, OhlcStream, TransitionStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 2: eight more streaming twins converted from
  * spec-asserted to ORACLE-asserted replay keys (after wave 1's SCD2 /
  * native-session / weighted-reservoir — R11Queries, which also documents
  * the shared replay conventions). Selection rule for this wave: operators
  * whose emission log is EXACTLY SQL-replayable —
  *  - the bounded-state sketch family (KMV / HLL / CMS / fingerprint):
  *    order-free integer state transitions, batched by id mod 3;
  *  - the event-time admission family (funnel / transitions / OHLC):
  *    tercile-batched so arrival order equals event-time order;
  *  - the stream-stream INTERVAL JOIN (attribution): the operator class
  *    none of the GroupState twins cover — both sides buffered in state,
  *    matches emitted as they meet, state evicted by the other side's
  *    watermark. Tercile batching makes the watermark accurate, so
  *    eviction provably never races an unmatched future row.
  *
  * Update-mode operators emit their CURRENT state per touched group per
  * batch; the memory sink accumulates every emission, so those keys output
  * the emission MULTISET (grouped with a count when identical rows can
  * legitimately repeat across batches, raw when a state component is
  * strictly monotone and rows cannot repeat). Append-mode operators emit
  * exactly once and are output raw.
  */
object R11bQueries {

  type Q = (SparkSession, String) => DataFrame

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  import scala.jdk.CollectionConverters._

  /** Run `batches` through a started streaming query feeding `input`,
    * then return the sink table's rows materialized. */
  private def drain[T](s: SparkSession,
      input: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T],
      batches: Seq[Seq[T]], sinkName: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val rows =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val t = s.table(sinkName)
        t.sparkSession.createDataFrame(t.collect().toSeq.asJava, t.schema)
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    rows
  }

  // ---------------------------------------------------------------- KMV

  /** 3-batch replay (event_id mod 3) of per-event-type KMV distinct-user
    * sketches: state = the ≤64 smallest 52-bit item hashes, pure set-min —
    * the transition is exactly order- and split-independent, so each
    * touched (group, batch) emission is the sketch over the id-mod prefix.
    * est = 63·2⁵²/h₍₆₄₎ is one exact-product double division, bitwise equal
    * in DuckDB. */
  private val streamKmvReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.events(s, dir)
      .select(col("event_type"), col("user_id").cast("string"), col("event_id"))
      .as[(String, String, Long)].collect().toSeq
    val batches = (0 to 2).map(b => evs.filter(_._3 % 3 == b)
      .map(e => KmvStream.Item(e._1, e._2)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[KmvStream.Item]
    val sinkName = s"graft_kmv_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(KmvStream.distinctEstimate(input.toDS(), k = 64)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .groupBy(col("group").as("grp"),
        col("nTracked").cast("long").as("n_tracked"),
        col("kthHash").as("kth_hash"), col("est"))
      .agg(count(lit(1)).as("n"))
      .select("grp", "n_tracked", "kth_hash", "est", "n")
      .orderBy("grp", "n_tracked")
  }

  // ---------------------------------------------------------------- HLL

  /** 3-batch replay (doc_id mod 3) of the HLL register stream over the
    * document shingles: a bucket emits only when its register INCREASES,
    * so the emission log is exactly the distinct prefix-max increase
    * points per bucket — unique rows, no multiset counting needed. */
  private val streamHllReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batches = (0 to 2).map(b => docs.filter(_._1 % 3 == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sinkName = s"graft_hll_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(HllStream.registers(
        HllStream.bucketRanks(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .select("bucket", "reg").orderBy("bucket", "reg")
  }

  // ---------------------------------------------------------------- CMS

  /** 3-batch replay (doc_id mod 3) of the Count-Min cell stream over the
    * document tokens: every touched cell emits its new running count each
    * batch — counts strictly increase per cell, so rows are unique and the
    * log is the per-cell prefix-sum sequence at batch granularity. */
  private val streamCmsReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batches = (0 to 2).map(b => docs.filter(_._1 % 3 == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sinkName = s"graft_cms_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(CmsStream.cells(
        CmsStream.cellHits(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .select(col("cell"), col("count").as("running_count"))
      .orderBy("cell", "running_count")
  }

  // -------------------------------------------------------- fingerprint

  /** 3-batch replay (doc_id mod 3) of the dataset-fingerprint stream: per
    * content-hash shard the state is six commutative-monoid longs, so each
    * touched (shard, batch) emission is the exact manifest of the prefix —
    * n_docs strictly increases per shard, rows unique. */
  private val streamFingerprintReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (id, text, nc) =>
        val h = KmvStream.hash52(text)
        (id, FingerprintStream.Doc(h % 16, h, nc))
      }
    val batches = (0 to 2).map(b => docs.filter(_._1 % 3 == b).map(_._2))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FingerprintStream.Doc]
    val sinkName = s"graft_fp_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(FingerprintStream.fingerprints(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .select(col("shard"), col("n").as("n_docs"),
        col("chars").as("total_chars"), col("xor").as("xor_hash"),
        col("sum").as("sum_hash"), col("min").as("min_hash"),
        col("max").as("max_hash"))
      .orderBy("shard", "n_docs")
  }

  // -------------------------------------------------------------- funnel

  /** Tercile 3-batch replay of the streaming conversion funnel: per
    * touched (user, batch) with a view seen, the emission is the funnel
    * state over the time prefix. Tercile batching makes the global fold
    * order equal event-time order, so the prefix state has the closed
    * form the batch q_funnel key uses (stage minima with strict-after
    * admission). */
  private val streamFunnelReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[FunnelStream.FEvt].collect().toSeq
    val (tmin, tmax) = (evs.map(_.ts_us).min, evs.map(_.ts_us).max)
    val batches = (0 to 2).map(b =>
      evs.filter(e => R11Queries.tercileOf(e.ts_us, tmin, tmax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FunnelStream.FEvt]
    val sinkName = s"graft_funnel_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(FunnelStream.funnel(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .groupBy("user_id", "t_view", "t_click", "t_purchase", "stage")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "stage", "t_view")
  }

  // --------------------------------------------------------- transitions

  /** Tercile 3-batch replay of the per-user transition extractor (Append
    * mode — every event with a predecessor emits its (src → dst) edge
    * exactly once, cross-batch via the Last-event GroupState). The oracle
    * is the batch lag() — equality IS the batch≡stream claim, independent
    * of the batching because emission is exactly-once and in-order. */
  private val streamTransitionsReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[TransitionStream.Ev].collect().toSeq
    val (tmin, tmax) = (evs.map(_.ts_us).min, evs.map(_.ts_us).max)
    val batches = (0 to 2).map(b =>
      evs.filter(e => R11Queries.tercileOf(e.ts_us, tmin, tmax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TransitionStream.Ev]
    val sinkName = s"graft_trans_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, batches, sinkName, q)
      .select("user_id", "src", "dst", "ts_us")
      .orderBy("user_id", "ts_us", "src", "dst")
  }

  // --------------------------------------------------------- attribution

  /** Tercile 3-batch replay of the stream-stream interval join (clicks ⋈
    * purchases within the 1-hour horizon): both sides fed the same tercile
    * schedule, so every match meets in some batch (the purchase's click is
    * never in a later batch) and watermark-driven click eviction is
    * provably safe (evicted ⇒ every future purchase is past the horizon).
    * Emission is exactly-once inner-join output: the drained log equals
    * the batch interval join verbatim. */
  private val streamAttributionReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .as[(Long, Long, String, Long)].collect().toSeq
    val clicks = evs.filter(_._3 == "click").map(e => (e._1, e._2, e._4))
    val purchases = evs.filter(_._3 == "purchase").map(e => (e._1, e._2, e._4))
    val (tmin, tmax) = (evs.map(_._4).min, evs.map(_._4).max)
    def tb(ts: Long): Int = R11Queries.tercileOf(ts, tmin, tmax)
    val cIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val pIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val sinkName = s"graft_attr_replay_${replaySeq.incrementAndGet()}"
    // state partitions sized to the bounded replay corpus — a
    // stream-stream join commits FOUR stores per partition per
    // micro-batch, ~900 commits at 32 partitions for ~40k buffered rows
    // (measured 22.3 → 7.7 s; ReplayProbe attr receipts, PLANS.md r13)
    val q = ReplayHarness.sized(s)(AttributionJoinStream.attribute(
        cIn.toDF().toDF("user_id", "click_id", "ts_us"),
        pIn.toDF().toDF("user_id", "purchase_id", "ts_us"),
        "0 seconds", 3600L * 1000000L)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    val rows =
      try {
        (0 to 2).foreach { b =>
          cIn.addData(clicks.filter(e => tb(e._3) == b))
          pIn.addData(purchases.filter(e => tb(e._3) == b))
          q.processAllAvailable()
        }
        val t = s.table(sinkName)
        s.createDataFrame(t.collect().toSeq.asJava, t.schema)
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    rows.select("user_id", "click_id", "purchase_id", "lag_us")
      .orderBy("click_id", "purchase_id")
  }

  // ---------------------------------------------------------------- OHLC

  /** Tercile 3-batch replay of the native tumbling-window OHLC bars plus a
    * far-future sentinel (user −1) whose watermark advance closes every
    * real window: Append-mode bars emit exactly once, so the drained log
    * (sentinel filtered) equals the batch q_ohlc_bars aggregation. */
  private val streamOhlcReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val (tmin, tmax) = (evs.map(_._3).min, evs.map(_._3).max)
    val batches = (0 to 2).map(b =>
      evs.filter(e => R11Queries.tercileOf(e._3, tmin, tmax) == b)) :+
      Seq((-1L, -1L, tmax + 100L * 86400L * 1000000L, 0.0))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Double)]
    val sinkName = s"graft_ohlc_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(OhlcStream.bars(
        input.toDF().toDF("user_id", "event_id", "ts_us", "value"),
        "1 hour", "0 seconds")
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, batches, sinkName, q)
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "bucket_us")
  }

  val queries: Map[String, Q] = Map(
    "stream_kmv_replay" -> streamKmvReplay,
    "stream_hll_replay" -> streamHllReplay,
    "stream_cms_replay" -> streamCmsReplay,
    "stream_fingerprint_replay" -> streamFingerprintReplay,
    "stream_funnel_replay" -> streamFunnelReplay,
    "stream_transitions_replay" -> streamTransitionsReplay,
    "stream_attribution_replay" -> streamAttributionReplay,
    "stream_ohlc_replay" -> streamOhlcReplay)

  val oracle: Map[String, String] = Map(
    // per (group, id-mod-3 prefix): the 64 smallest distinct item hashes;
    // kth/est only once the sketch is full; identical emissions across
    // touched batches collapse to a count
    "stream_kmv_replay" ->
      s"""WITH eb AS (SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item,
         |    event_id % 3 AS bt FROM events),
         |bs AS (SELECT unnest(range(0, 3)) AS b),
         |pre AS (SELECT DISTINCT b, grp, item FROM eb JOIN bs ON eb.bt <= bs.b),
         |hd AS (SELECT DISTINCT b, grp, ${ExtQueries.hexFoldSql(1, 13)} AS h
         |  FROM (SELECT b, grp, md5(item) AS hx FROM pre)),
         |rk AS (SELECT b, grp, h,
         |    row_number() OVER (PARTITION BY b, grp ORDER BY h) AS rn FROM hd),
         |st AS (SELECT b, grp, CAST(least(count(*), 64) AS BIGINT) AS n_tracked,
         |    max(CASE WHEN rn = 64 THEN h END) AS kth_hash
         |  FROM rk GROUP BY 1, 2),
         |touched AS (SELECT DISTINCT bt AS b, grp FROM eb),
         |em AS (SELECT grp, n_tracked, kth_hash,
         |    CASE WHEN kth_hash IS NOT NULL THEN
         |      CAST(63 AS DOUBLE) * 4503599627370496.0 / CAST(kth_hash AS DOUBLE)
         |    END AS est
         |  FROM st JOIN touched USING (b, grp))
         |SELECT grp, n_tracked, kth_hash, est, count(*) AS n
         |FROM em GROUP BY grp, n_tracked, kth_hash, est
         |ORDER BY grp, n_tracked""".stripMargin,

    // per bucket: the distinct prefix-max increase points of the shingle
    // rank register (60-bit hash, bucket mod 64, rank = 55 - bitlength
    // capped at 50 — the text_hll_distinct chain, batched by doc_id mod 3)
    "stream_hll_replay" ->
      s"""WITH corpus AS (SELECT doc_id, doc_id % 3 AS bt, text FROM documents),
         |tok AS (SELECT bt, regexp_split_to_array(text, '\\s+') AS t FROM corpus),
         |sh AS (SELECT bt, CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |    ELSE list_transform(range(1, len(t)-1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS sg FROM tok),
         |tr AS (SELECT bt, unnest(sg) AS tok FROM sh),
         |hh AS (SELECT bt, ${ExtQueries.hexFoldSql(1, 15)} AS h
         |  FROM (SELECT bt, md5(tok) AS hx FROM tr)),
         |hb AS (SELECT bt, h % 64 AS bucket, h // 64 AS rest FROM hh),
         |rk AS (SELECT bucket, bt,
         |    max(least(50, 55 - CASE WHEN rest = 0 THEN 0
         |                           ELSE length(bin(rest)) END)) AS bmax
         |  FROM hb GROUP BY 1, 2),
         |pm AS (SELECT bucket, bt,
         |    max(bmax) OVER (PARTITION BY bucket ORDER BY bt) AS pm,
         |    max(bmax) OVER (PARTITION BY bucket ORDER BY bt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         |  FROM rk)
         |SELECT bucket, pm AS reg FROM pm WHERE prev IS NULL OR pm > prev
         |ORDER BY bucket, reg""".stripMargin,

    // per cell: the running token-count prefix sums at batch granularity
    // (Kirsch-Mitzenmacher d=4 w=64 cells — the text_cms_heavy_hitters
    // hash chain, batched by doc_id mod 3); strictly increasing, unique
    "stream_cms_replay" ->
      s"""WITH tr AS (SELECT doc_id % 3 AS bt,
         |    unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents),
         |hh AS (SELECT bt,
         |    ${ExtQueries.hexFoldSql(1, 15)} % 1000000007 AS h1,
         |    ${ExtQueries.hexFoldSql(17, 15)} % 1000000007 AS h2
         |  FROM (SELECT bt, md5(tok) AS hx FROM tr)),
         |cells AS (SELECT bt,
         |    r.r * 64 + (h1 + r.r * h2) % 1000000007 % 64 AS cell
         |  FROM hh, (SELECT unnest(range(0, 4)) AS r) r),
         |g AS (SELECT cell, bt, count(*) AS inc FROM cells GROUP BY 1, 2)
         |SELECT cell, CAST(sum(inc) OVER (PARTITION BY cell ORDER BY bt)
         |    AS BIGINT) AS running_count
         |FROM g ORDER BY cell, running_count""".stripMargin,

    // per (shard, id-mod-3 prefix) with an arrival in that batch: the six
    // commutative-monoid manifest components over the prefix
    "stream_fingerprint_replay" ->
      s"""WITH h0 AS (SELECT doc_id % 3 AS bt, ${ExtQueries.hexFoldSql(1, 13)} AS h,
         |    n_chars FROM (SELECT doc_id, md5(text) AS hx, n_chars FROM documents)),
         |hs AS (SELECT bt, h % 16 AS shard, h, n_chars FROM h0),
         |touched AS (SELECT DISTINCT shard, bt FROM hs)
         |SELECT t.shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(x.n_chars) AS BIGINT) AS total_chars,
         |  bit_xor(x.h) AS xor_hash, CAST(sum(x.h) AS BIGINT) AS sum_hash,
         |  min(x.h) AS min_hash, max(x.h) AS max_hash
         |FROM touched t JOIN hs x ON x.shard = t.shard AND x.bt <= t.bt
         |GROUP BY t.shard, t.bt ORDER BY t.shard, n_docs""".stripMargin,

    // per touched (user, tercile prefix) with a view: the closed-form
    // funnel state (q_funnel's strict-after stage minima, per prefix)
    "stream_funnel_replay" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |r AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM e),
         |eb AS (SELECT e.*, ${R11Queries.TercileCaseSql} AS bt FROM e, r),
         |bs AS (SELECT unnest(range(0, 3)) AS b),
         |pre AS (SELECT b, user_id, event_type, ts_us
         |  FROM eb JOIN bs ON eb.bt <= bs.b),
         |s1 AS (SELECT b, user_id, min(ts_us) AS t_view FROM pre
         |  WHERE event_type = 'view' GROUP BY 1, 2),
         |s2 AS (SELECT p.b, p.user_id, min(ts_us) AS t_click
         |  FROM pre p JOIN s1 USING (b, user_id)
         |  WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1, 2),
         |s3 AS (SELECT p.b, p.user_id, min(ts_us) AS t_purchase
         |  FROM pre p JOIN s2 USING (b, user_id)
         |  WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1, 2),
         |touched AS (SELECT DISTINCT bt AS b, user_id FROM eb),
         |em AS (SELECT user_id, t_view, t_click, t_purchase,
         |    CAST(1 + CAST(t_click IS NOT NULL AS INT)
         |           + CAST(t_purchase IS NOT NULL AS INT) AS BIGINT) AS stage
         |  FROM touched JOIN s1 USING (b, user_id)
         |    LEFT JOIN s2 USING (b, user_id) LEFT JOIN s3 USING (b, user_id))
         |SELECT user_id, t_view, t_click, t_purchase, stage, count(*) AS n
         |FROM em GROUP BY user_id, t_view, t_click, t_purchase, stage
         |ORDER BY user_id, stage, t_view""".stripMargin,

    // the batch lag() verbatim: exactly-once in-order emission makes the
    // drained transition log the retrospective answer
    "stream_transitions_replay" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |s AS (SELECT user_id, event_type AS dst, ts_us,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS src
        |  FROM e)
        |SELECT user_id, src, dst, ts_us FROM s WHERE src IS NOT NULL
        |ORDER BY user_id, ts_us, src, dst""".stripMargin,

    // the batch interval join verbatim — exactly-once inner-join emission
    "stream_attribution_replay" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_ts FROM e
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_ts FROM e
        |  WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, purchase_id, p_ts - c_ts AS lag_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p_ts > c_ts AND p_ts <= c_ts + 3600000000
        |ORDER BY click_id, purchase_id""".stripMargin,

    // the batch OHLC bars verbatim (1-hour epoch-aligned buckets,
    // open/close by the zero-padded (ts, id) key)
    "stream_ohlc_replay" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |    epoch_us(ts) // 3600000000 * 3600000000 AS bucket_us,
        |    printf('%020d-%020d', epoch_us(ts), event_id) AS k
        |  FROM events)
        |SELECT user_id, bucket_us,
        |  arg_min(value, k) AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, k) AS close,
        |  count(*) AS volume
        |FROM e GROUP BY user_id, bucket_us
        |ORDER BY user_id, bucket_us""".stripMargin)
}
