package graft.queries

import graft.streaming.NnGraphStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 6: the streaming k-NN-graph admission twin converted to
  * an oracle-asserted replay key (conventions in R11Queries).
  *
  * Replay determinism: batches are vec_id TERCILES (monotone), so the
  * admission order equals global vec_id order and every arrival's
  * neighbor set is the exact top-k (cosine desc, id asc) over ALL earlier
  * same-bucket vectors — the retention cap (10000 default) never binds at
  * replay scale, so "retained earlier arrivals" = "all earlier arrivals"
  * and the emission log has the closed form the DuckDB twin computes with
  * one ranked self-join. Cosines agree bitwise (the operator's fold is
  * the cosSql pinned order). Neighbor lists are EXPLODED to (vec_id,
  * bucket, rank, n_id) rows — the driver compare cannot sort arrays —
  * and a first-in-bucket arrival (empty neighbor set) emits no rows on
  * either side.
  */
object R11fQueries {

  type Q = (SparkSession, String) => DataFrame

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  import scala.jdk.CollectionConverters._

  private val NPlanes = 4
  private val K = 8

  private val streamNnGraphReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val planes = graft.ext.Similarity.hyperplanes(NPlanes, 64)
    val rows = Synth.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (idMin, idMax) = (rows.map(_._1).min, rows.map(_._1).max)
    val batches = (0 to 2).map(b =>
      rows.filter(r => R11Queries.tercileOf(r._1, idMin, idMax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val sinkName = s"graft_nng_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(NnGraphStream.decisions(
        NnGraphStream.assign(input.toDF().toDF("vec_id", "embedding"), planes),
        k = K)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    val collected =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val t = s.table(sinkName)
        s.createDataFrame(t.collect().toSeq.asJava, t.schema)
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    collected
      .select(col("vec_id"), col("bucket"), posexplode(col("n_ids")))
      .select(col("vec_id"), col("bucket"),
        (col("pos") + 1).cast("long").as("rank"), col("col").as("n_id"))
      .orderBy("vec_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "stream_nngraph_replay" -> streamNnGraphReplay)

  val oracle: Map[String, String] = Map(
    // the admission-prefix rule in closed form: for every vector, rank ALL
    // smaller-id same-bucket vectors by (cosine desc, id asc), keep ≤ k
    "stream_nngraph_replay" -> {
      val planes = graft.ext.Similarity.hyperplanes(NPlanes, 64)
      s"""WITH b AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         |    ${ExtQueries.lshBucketSqlN("embedding", planes)} AS bucket
         |  FROM embeddings),
         |ranked AS (SELECT x.vec_id, x.bucket,
         |    a.vec_id AS n_id,
         |    row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY ${ExtQueries.cosSqlN("x.emb", "a.emb", 64)} DESC,
         |        a.vec_id) AS rank
         |  FROM b x JOIN b a ON a.bucket = x.bucket AND a.vec_id < x.vec_id)
         |SELECT vec_id, bucket, CAST(rank AS BIGINT) AS rank, n_id
         |FROM ranked WHERE rank <= $K
         |ORDER BY vec_id, rank""".stripMargin
    })
}
