package graft.queries

import graft.streaming.{PackStream, Sessionize, TopKStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 3: four more streaming twins converted to oracle-asserted
  * replay keys (conventions in R11Queries/R11bQueries). Per-operator
  * determinism notes:
  *  - space-saving top-k is replayed in its EXACT regime (item domain 12 <
  *    capacity 16, so no eviction ever fires and the counter table is the
  *    exact prefix histogram — eviction-order determinism is pinned
  *    separately in TopKStreamSpec); cross-batch counter state is what the
  *    oracle checks;
  *  - sequence packing requires per-shard arrival order = doc_id order, so
  *    batches are doc_id TERCILES (monotone); the bin recurrence is one
  *    integer cumulative sum;
  *  - the custom-GroupState sessionizer closes sessions two ways — inline
  *    on a gap-exceeding event and by EventTimeTimeout sweep — the replay
  *    exercises BOTH (tercile batches close most sessions inline; two
  *    trailing sentinel batches advance the watermark and then sweep the
  *    still-open tails);
  *  - running OLS regression state is six exact longs (mergeable moments),
  *    so any id-mod batching replays exactly.
  */
object R11cQueries {

  type Q = (SparkSession, String) => DataFrame

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  import scala.jdk.CollectionConverters._

  private def drain[T](s: SparkSession,
      input: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T],
      batches: Seq[Seq[T]], sinkName: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val t = s.table(sinkName)
      t.sparkSession.createDataFrame(t.collect().toSeq.asJava, t.schema)
    } finally {
      q.stop()
      s.catalog.dropTempView(sinkName)
    }
  }

  /** 3-batch replay (event_id mod 3) of space-saving top-5 per event type
    * over a 12-item domain ("u0".."u11" by user_id mod 12): sub-capacity,
    * so every emission is the exact ranked prefix histogram. */
  private val streamTopkReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.events(s, dir)
      .select(col("event_type"), col("user_id") % 12, col("event_id"))
      .as[(String, Long, Long)].collect().toSeq
    val batches = (0 to 2).map(b => evs.filter(_._3 % 3 == b)
      .map(e => TopKStream.Item(e._1, s"u${e._2}")))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TopKStream.Item]
    val sinkName = s"graft_topk_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(TopKStream.topK(input.toDS(), k = 5, capacity = 16)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .groupBy(col("group").as("grp"), col("rank").cast("long").as("rnk"),
        col("item"), col("count").as("cnt"), col("err"))
      .agg(count(lit(1)).as("n"))
      .select("grp", "rnk", "item", "cnt", "err", "n")
      .orderBy("grp", "rnk", "item")
  }

  /** Tercile 3-batch replay (by doc_id — the shard-order contract) of
    * streaming sequence packing: bin = cumulative n_chars before the doc,
    * integer-divided by the budget; Append mode, one exact row per doc. */
  private val streamPackReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir).select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect().toSeq
    val (idMin, idMax) = (docs.map(_._1).min, docs.map(_._1).max)
    val batches = (0 to 2).map(b =>
      docs.filter(d => R11Queries.tercileOf(d._1, idMin, idMax) == b)
        .map(d => (d._1 % 8, d._1, d._2)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val sinkName = s"graft_pack_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(PackStream.pack(
        input.toDF().toDF("shard", "doc_id", "n_tokens"), budgetTokens = 16384L)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, batches, sinkName, q)
      .orderBy("shard", "doc_id")
  }

  /** Tercile 3-batch replay of the CUSTOM GroupState sessionizer (the
    * native-session twin's sibling — same gap rule, different state
    * machine) plus two far-future sentinel batches: the first advances the
    * watermark past every real session's close, the second triggers the
    * EventTimeTimeout sweep that emits the still-open tails. Drained
    * output = the batch sessionization. */
  private val streamSessionizeReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val gapUs = 1800L * 1000000L
    val evs = Synth.eventsTs(s, dir)
      .select(col("user_id"), col("ts_us"))
      .as[(Long, Long)].collect().toSeq
    val (tmin, tmax) = (evs.map(_._2).min, evs.map(_._2).max)
    val far = tmax + 100L * 86400L * 1000000L
    val batches = (0 to 2).map(b =>
      evs.filter(e => R11Queries.tercileOf(e._2, tmin, tmax) == b)) ++
      Seq(Seq((-1L, far)), Seq((-1L, far + 86400L * 1000000L)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .withColumn("et", timestamp_micros(col("ts_us")))
      .withWatermark("et", "0 seconds")
      .as[Sessionize.Evt]
    val sinkName = s"graft_sessionize_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(Sessionize.sessions(events, gapUs)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, batches, sinkName, q)
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "start_us")
  }

  /** 3-batch replay (l_orderkey mod 3) of the running OLS regression over
    * the batch key's integerized (quantity, discount) pairs: state is six
    * exact longs, so each touched (key, batch) emission is the closed-form
    * prefix statistic — n strictly increases, rows unique. */
  private val streamRegressionReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Synth.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)"),
        expr("CAST(floor(l_discount * 100D + 0.5D) AS BIGINT)"),
        col("l_orderkey"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val batches = (0 to 2).map(b => rows.filter(_._4 % 3 == b)
      .map(r => graft.streaming.RegressionStream.XY(r._1, r._2, r._3)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.RegressionStream.XY]
    val sinkName = s"graft_reg_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(graft.streaming.RegressionStream.regress(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .select(col("key").as("rkey"), col("n"), col("num"),
        col("denx"), col("deny"))
      .orderBy("rkey", "n")
  }

  val queries: Map[String, Q] = Map(
    "stream_topk_replay" -> streamTopkReplay,
    "stream_pack_replay" -> streamPackReplay,
    "stream_sessionize_replay" -> streamSessionizeReplay,
    "stream_regression_replay" -> streamRegressionReplay)

  val oracle: Map[String, String] = Map(
    // exact-regime space-saving: per touched (group, prefix), the ranked
    // prefix histogram cut at k=5, err 0; repeats across batches counted
    "stream_topk_replay" ->
      """WITH eb AS (SELECT event_type AS grp,
        |    'u' || CAST(user_id % 12 AS VARCHAR) AS item,
        |    event_id % 3 AS bt FROM events),
        |bs AS (SELECT unnest(range(0, 3)) AS b),
        |pre AS (SELECT b, grp, item, count(*) AS cnt
        |  FROM eb JOIN bs ON eb.bt <= bs.b GROUP BY 1, 2, 3),
        |rk AS (SELECT b, grp, item, cnt,
        |    row_number() OVER (PARTITION BY b, grp
        |      ORDER BY cnt DESC, item) AS rnk FROM pre),
        |touched AS (SELECT DISTINCT bt AS b, grp FROM eb),
        |em AS (SELECT grp, CAST(rnk AS BIGINT) AS rnk, item, cnt,
        |    CAST(0 AS BIGINT) AS err
        |  FROM rk JOIN touched USING (b, grp) WHERE rnk <= 5)
        |SELECT grp, rnk, item, cnt, err, count(*) AS n
        |FROM em GROUP BY grp, rnk, item, cnt, err
        |ORDER BY grp, rnk, item""".stripMargin,

    // the batch packing rule verbatim: bin = floor(per-shard running
    // n_chars before the doc, in doc_id order, / budget)
    "stream_pack_replay" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard, n_chars AS n_tokens
        |  FROM documents),
        |c AS (SELECT shard, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM d)
        |SELECT shard, doc_id, n_tokens, CAST(cum // 16384 AS BIGINT) AS bin
        |FROM c ORDER BY shard, doc_id""".stripMargin,

    // the batch sessionization verbatim (strict-gap split — identical rule
    // to the native-session twin, different operator under test)
    "stream_sessionize_replay" ->
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

    // per touched (flag, prefix): the six exact sums folded to the same
    // derived (num, denx, deny) longs the batch q_regression_stats builds
    "stream_regression_replay" ->
      """WITH m AS (SELECT l_returnflag AS rkey,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
        |    l_orderkey % 3 AS bt
        |  FROM lineitem),
        |bs AS (SELECT unnest(range(0, 3)) AS b),
        |pre AS (SELECT b, rkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM m JOIN bs ON m.bt <= bs.b GROUP BY 1, 2),
        |touched AS (SELECT DISTINCT bt AS b, rkey FROM m)
        |SELECT rkey, n, n * sxy - sx * sy AS num,
        |  n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
        |FROM pre JOIN touched USING (b, rkey)
        |ORDER BY rkey, n""".stripMargin)
}
