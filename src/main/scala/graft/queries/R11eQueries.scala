package graft.queries

import graft.streaming.{DriftStream, MomentsStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 5: the two mergeable-moments twins converted to
  * oracle-asserted replay keys (conventions in R11Queries). Both carry
  * EXACT sums (scale-6 decimals for scalar moments, floor-×10⁴ quantized
  * longs for embedding components), so any id-mod batching replays
  * bit-identically; the derived mean/std doubles re-enter through the
  * same pinned IEEE expression shapes the batch twins already prove.
  */
object R11eQueries {

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

  /** 3-batch replay (event_id mod 3) of the running per-type moments:
    * each touched (type, prefix) emission is the exact decimal-sum state
    * folded to (n, mean, std) — n strictly increases, rows unique. */
  private val streamMomentsReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evs = Synth.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)].collect().toSeq
    val batches = (0 to 2).map(b => evs.filter(_._3 % 3 == b)
      .map(e => MomentsStream.MEvt(e._1, e._2)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MomentsStream.MEvt]
    val sinkName = s"graft_moments_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(MomentsStream.moments(input.toDS())
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .orderBy("event_type", "n")
  }

  /** 3-batch replay (vec_id mod 3) of the per-cluster embedding moments
    * (cluster = the trained coarse k-means assignment, same centroids as
    * the batch emb_drift monitor): each touched (cluster, prefix)
    * emission is (n, Σ floor-×10⁴ components) — emitted component sums
    * are EXPLODED to (cluster, n, dim, s) rows because the driver compare
    * cannot sort array columns. */
  private val streamDriftReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = Synth.embeddings(s, dir)
    val cents = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val rows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batches = (0 to 2).map(b => rows.filter(_._1 % 3 == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    val sinkName = s"graft_drift_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(DriftStream.moments(DriftStream.assigned(vecs, cents))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("update").start())
    drain(s, input, batches, sinkName, q)
      .select(col("cluster"), col("n"), posexplode(col("s")))
      .select(col("cluster"), col("n"),
        (col("pos") + 1).cast("long").as("dim"), col("col").as("s"))
      .orderBy("cluster", "n", "dim")
  }

  val queries: Map[String, Q] = Map(
    "stream_moments_replay" -> streamMomentsReplay,
    "stream_drift_replay" -> streamDriftReplay)

  val oracle: Map[String, String] = Map(
    // per touched (type, id-mod-3 prefix): decimal-exact sums folded to
    // the same (mean, std) IEEE expression shape as the stream's rowOf
    "stream_moments_replay" ->
      """WITH eb AS (SELECT event_type, value, event_id % 3 AS bt FROM events),
        |bs AS (SELECT unnest(range(0, 3)) AS b),
        |pre AS (SELECT b, event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
        |    CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS sv2
        |  FROM eb JOIN bs ON eb.bt <= bs.b GROUP BY 1, 2),
        |touched AS (SELECT DISTINCT bt AS b, event_type FROM eb)
        |SELECT event_type, n, sv / n AS mean,
        |  sqrt(sv2 / n - (sv / n) * (sv / n)) AS std
        |FROM pre JOIN touched USING (b, event_type)
        |ORDER BY event_type, n""".stripMargin,

    // per touched (trained k-means cluster, id-mod-3 prefix): the exact
    // per-dim quantized component sums, exploded to rows
    "stream_drift_replay" ->
      s"""WITH RECURSIVE
         |${ExtQueries.CoarseKmCtes},
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${ExtQueries.cosSql("e.embedding", "r.rep")} DESC,
         |          r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |q AS (SELECT vec_id, CAST(ivf_cell AS BIGINT) AS cluster,
         |    vec_id % 3 AS bt,
         |    list_transform(range(1, 65), i ->
         |      CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
         |  FROM assigned),
         |bs AS (SELECT unnest(range(0, 3)) AS b),
         |sums AS (SELECT b, cluster, CAST(i AS BIGINT) AS dim,
         |    CAST(sum(qv[i]) AS BIGINT) AS s
         |  FROM q JOIN bs ON q.bt <= bs.b, range(1, 65) r(i)
         |  GROUP BY 1, 2, 3),
         |cnt AS (SELECT b, cluster, CAST(count(*) AS BIGINT) AS n
         |  FROM q JOIN bs ON q.bt <= bs.b GROUP BY 1, 2),
         |touched AS (SELECT DISTINCT bt AS b, cluster FROM q)
         |SELECT cluster, n, dim, s
         |FROM sums JOIN cnt USING (b, cluster) JOIN touched USING (b, cluster)
         |ORDER BY cluster, n, dim""".stripMargin)
}
