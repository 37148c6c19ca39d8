package graft.queries

import graft.streaming.{QuantileHistStream, WinnowingStream, ZscoreStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 4: three more streaming twins converted to
  * oracle-asserted replay keys (conventions in R11Queries):
  *  - the winnowing-fingerprint admission operator — the same per-key
  *    canonical/takeover state machine as the near-dup twin, keyed by
  *    40-bit winnowing fingerprints instead of MinHash band buckets; the
  *    replay reuses the r10 copy-wave schedule (high-id copies FIRST so
  *    every shared hash exercises the dethrone path);
  *  - the rolling z-score ring buffer — decimal-quantized sums make the
  *    20-value window bit-replayable; tercile batches keep arrival order
  *    equal to the batch window's (ts, event_id) order, so the drained
  *    Append log equals the q_rolling_zscore rows;
  *  - the HDR-log-histogram quantile sketch — pure counting, exactly
  *    order-independent; each touched (group, prefix) emission is the
  *    closed-form histogram walk.
  */
object R11dQueries {

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

  /** 3-batch copy-wave replay of the winnowing admission operator:
    * batch 0 = every-10th doc at id+1M (identical text ⇒ identical
    * fingerprint set — seeds every shared hash with a LARGE canonical),
    * batch 1 = the organic every-5th corpus (small ids take over and the
    * dethroned canonical re-emits as an edge), batch 2 = a second copy
    * wave at id+2M (pure rejects against two-batch-old state). */
  private val streamWinnowingReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = Synth.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val copies = base.filter(_._1 % 10 == 0)
    val wave0 = copies.map { case (id, t) => (id + 1000000L, t) }
    val wave2 = copies.map { case (id, t) => (id + 2000000L, t) }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sinkName = s"graft_winnow_replay_${replaySeq.incrementAndGet()}"
    // re-spread the single-partition MemoryStream batch before the n-gram
    // fingerprint projection (same scaffolding-parity fix as the neardup
    // replay: production sources arrive pre-partitioned; without this the
    // replay serializes the operator's heaviest row-local stage)
    val q = ReplayHarness.sized(s)(WinnowingStream.candidates(
        WinnowingStream.fingerprintHits(
          input.toDF().toDF("doc_id", "text").repartition(col("doc_id"))))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, Seq(wave0, base, wave2), sinkName, q)
      .select("ida", "idb", "h")
      .orderBy("h", "ida", "idb")
  }

  /** Tercile 3-batch replay of the rolling z-score ring buffer: Append
    * emission, arrival order = event-time order, so the drained flags are
    * the batch q_rolling_zscore rows verbatim. */
  private val streamZscoreReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.eventsTs(s, dir)
      .select(col("event_type"), col("event_id"), col("ts_us"), col("value"))
      .as[(String, Long, Long, Double)].collect().toSeq
    val (tmin, tmax) = (evs.map(_._3).min, evs.map(_._3).max)
    val batches = (0 to 2).map(b =>
      evs.filter(e => R11Queries.tercileOf(e._3, tmin, tmax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, Double)]
    val sinkName = s"graft_zscore_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(ZscoreStream.flag(
        input.toDF().toDF("event_type", "event_id", "ts_us", "value"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    drain(s, input, batches, sinkName, q)
      .orderBy("event_id")
  }

  /** 3-batch replay (event_id mod 3) of the log-histogram quantile
    * sketch over per-type event values: every touched (group, prefix)
    * emission is the exact rank walk over the prefix histogram. */
  private val streamQuantileReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)].collect().toSeq
    val batches = (0 to 2).map(b => evs.filter(_._3 % 3 == b)
      .map(e => QuantileHistStream.Obs(e._1, e._2)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[QuantileHistStream.Obs]
    val sinkName = s"graft_qh_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(QuantileHistStream.quantiles(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .groupBy(col("group").as("grp"), col("n"), col("p50Us").as("p50_us"),
        col("p95Us").as("p95_us"), col("p99Us").as("p99_us"))
      .agg(count(lit(1)).as("n_emit"))
      .select("grp", "n", "p50_us", "p95_us", "p99_us", "n_emit")
      .orderBy("grp", "n")
  }

  val queries: Map[String, Q] = Map(
    "stream_winnowing_replay" -> streamWinnowingReplay,
    "stream_zscore_replay" -> streamZscoreReplay,
    "stream_quantile_replay" -> streamQuantileReplay)

  /** Fingerprint CTE chain mirroring WinnowingStream.fingerprintHits
    * EXACTLY (full 4-gram windows only, docs with ≥ 8 tokens): 40-bit
    * gram hash packed with the rightmost-min position tie-break, distinct
    * per (doc, hash). Table `wcorpus(doc_id, text)` must precede. */
  private val FpHitsCtes: String =
    s"""toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
       |  FROM wcorpus),
       |glist AS (SELECT doc_id, list_transform(range(1, len(t) - 3),
       |    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
       |             t[i+3] || ' ' || t[i+4])) AS gl
       |  FROM toks WHERE len(t) >= 8),
       |grams AS (SELECT doc_id, CAST(unnest(range(1, len(gl) + 1)) AS BIGINT)
       |    AS pos, unnest(gl) AS hx FROM glist),
       |hashed AS (SELECT doc_id, pos, ${ExtQueries.hexFoldSql(1, 10)} AS h,
       |    count(*) OVER (PARTITION BY doc_id) AS n_grams FROM grams),
       |wins AS (SELECT doc_id, pos, n_grams,
       |    min(h * 1048576 + (1048575 - pos))
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |  FROM hashed),
       |hits AS (SELECT DISTINCT doc_id, fp // 1048576 AS h
       |  FROM wins WHERE pos <= n_grams - 3)""".stripMargin

  val oracle: Map[String, String] = Map(
    // per fingerprint hash: the canonical running-min recurrence over
    // batch order (id-coded: [1M,2M) = batch 0, < 1M = batch 1, ≥ 2M =
    // batch 2) — batch arrivals edge to the batch's canonical, a dethroned
    // previous canonical re-emits (the NearDupStream grp/edges SQL, keyed
    // by winnowing fingerprints)
    "stream_winnowing_replay" ->
      s"""WITH wcorpus AS (
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |    WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0),
         |$FpHitsCtes,
         |hb AS (SELECT h, doc_id,
         |    CASE WHEN doc_id >= 2000000 THEN 2
         |         WHEN doc_id >= 1000000 THEN 0 ELSE 1 END AS bt FROM hits),
         |grp AS (SELECT h, bt,
         |    min(min(doc_id)) OVER (PARTITION BY h ORDER BY bt) AS canonical,
         |    min(min(doc_id)) OVER (PARTITION BY h ORDER BY bt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         |  FROM hb GROUP BY h, bt),
         |edges AS (
         |  SELECT g.canonical AS ida, x.doc_id AS idb, x.h
         |  FROM hb x JOIN grp g USING (h, bt)
         |  WHERE x.doc_id <> g.canonical
         |  UNION ALL
         |  SELECT canonical, prev, h FROM grp
         |  WHERE prev IS NOT NULL AND prev <> canonical)
         |SELECT ida, idb, h FROM edges ORDER BY h, ida, idb""".stripMargin,

    // the batch q_rolling_zscore rows verbatim (Append + in-order arrival
    // ⇒ the ring buffer IS the 20-row trailing frame)
    "stream_zscore_replay" ->
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
        |SELECT event_type, event_id, value, z FROM z
        |WHERE abs(z) > 3.0 ORDER BY event_id""".stripMargin,

    // per touched (group, id-mod-3 prefix): the sketch_quantile_histogram
    // bucket/rank-walk SQL over the prefix, emissions counted
    "stream_quantile_replay" ->
      """WITH eb AS (SELECT event_type AS grp, value, event_id % 3 AS bt
        |  FROM events),
        |bs AS (SELECT unnest(range(0, 3)) AS b),
        |pre AS (SELECT b, grp,
        |    greatest(1, CAST(floor(value * 1000000) AS BIGINT)) AS vq
        |  FROM eb JOIN bs ON eb.bt <= bs.b),
        |ee AS (SELECT b, grp, vq,
        |    CAST(strlen(bin(vq)) - 1 AS BIGINT) AS e FROM pre),
        |bk AS (SELECT b, grp,
        |    CASE WHEN vq < 32 THEN vq
        |         ELSE 16*e + ((vq >> CAST(e-4 AS INT)) & 15) END AS bucket
        |  FROM ee),
        |c AS (SELECT b, grp, bucket, CAST(count(*) AS BIGINT) AS c
        |  FROM bk GROUP BY 1, 2, 3),
        |cum AS (SELECT b, grp, bucket, c,
        |    sum(c) OVER (PARTITION BY b, grp ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY b, grp) AS n FROM c),
        |agg AS (SELECT b, grp, max(n) AS n,
        |    min(CASE WHEN cum >= (50*n + 99)//100 THEN bucket END) AS b50,
        |    min(CASE WHEN cum >= (95*n + 99)//100 THEN bucket END) AS b95,
        |    min(CASE WHEN cum >= (99*n + 99)//100 THEN bucket END) AS b99
        |  FROM cum GROUP BY b, grp),
        |touched AS (SELECT DISTINCT bt AS b, grp FROM eb),
        |em AS (SELECT grp, CAST(n AS BIGINT) AS n,
        |    CAST(CASE WHEN b50 < 32 THEN b50
        |         ELSE (16 + b50 % 16) << CAST(b50//16 - 4 AS INT) END AS BIGINT) AS p50_us,
        |    CAST(CASE WHEN b95 < 32 THEN b95
        |         ELSE (16 + b95 % 16) << CAST(b95//16 - 4 AS INT) END AS BIGINT) AS p95_us,
        |    CAST(CASE WHEN b99 < 32 THEN b99
        |         ELSE (16 + b99 % 16) << CAST(b99//16 - 4 AS INT) END AS BIGINT) AS p99_us
        |  FROM agg JOIN touched USING (b, grp))
        |SELECT grp, n, p50_us, p95_us, p99_us, count(*) AS n_emit
        |FROM em GROUP BY grp, n, p50_us, p95_us, p99_us
        |ORDER BY grp, n""".stripMargin)
}
