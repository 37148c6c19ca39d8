package graft.queries

import graft.streaming.PqIndexStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 8: the IVF/PQ index-maintenance twin converted to an
  * oracle-asserted replay key — the LAST of the 26 streaming twins, making
  * the whole family oracle-asserted.
  *
  * The operator is two row-local projections driven by `maintain`'s
  * foreachBatch loop, so what the replay verifies is the maintenance
  * CONTRACT: every arriving vector is encoded against the codebook epoch
  * current AT ITS BATCH (epoch rotation without restarting the stream),
  * cells assigned by first-max cosine, codes by per-subspace argmin.
  * Batches are vec_id terciles; epoch 1 (the trained codebook) covers
  * batches 0–1, then the epoch rotates before batch 2 to a synthetic
  * epoch 2 whose codebook is the elementwise NEGATION of epoch 1 —
  * replay scaffolding with an exact SQL mirror (what is under test is
  * that rotation re-encodes later arrivals against the new constants and
  * stamps the epoch column; retraining quality is the trainer spec's
  * concern). The sink-side collect is the replay's inverted-list append.
  */
object R11hQueries {

  type Q = (SparkSession, String) => DataFrame

  import scala.jdk.CollectionConverters._

  private val streamPqIndexReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = Synth.embeddings(s, dir)
    val coarse = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val reps = coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
    val cb1 = graft.ext.PqTrainer.trainCodebook(e)
    val cb2 = cb1.map(_.map(_.map(x => -x)))
    val epoch1 = PqIndexStream.CodebookEpoch(1L, reps, cb1)
    val epoch2 = PqIndexStream.CodebookEpoch(2L, reps, cb2)
    val rows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (idMin, idMax) = (rows.map(_._1).min, rows.map(_._1).max)
    val batches = (0 to 2).map(b =>
      rows.filter(r => R11Queries.tercileOf(r._1, idMin, idMax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val epochRef = new java.util.concurrent.atomic.AtomicReference(epoch1)
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val schema = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.types.StructType](null)
    val q = PqIndexStream.maintain(
        input.toDF().toDF("vec_id", "embedding"), () => epochRef.get()) { df =>
      schema.set(df.schema)
      df.collect().foreach(sunk.add)
    }
    try {
      input.addData(batches(0)); q.processAllAvailable()
      input.addData(batches(1)); q.processAllAvailable()
      epochRef.set(epoch2)
      input.addData(batches(2)); q.processAllAvailable()
    } finally q.stop()
    s.createDataFrame(sunk.asScala.toSeq.asJava, schema.get())
      .select(col("vec_id"), col("cell"), col("codebook_epoch"),
        posexplode(col("codes")))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("pos").cast("long").as("m"), col("col").cast("long").as("code"),
        col("codebook_epoch"))
      .orderBy("vec_id", "m")
  }

  /** The bounded-verify receipt of the embed pipeline's CandidateCap —
    * per-bucket population + candidates served + truncation flag (all
    * false at gate SFs, where the cap is provably free). */
  private val corpusEmbedCapAudit: Q = (s, dir) =>
    graft.ext.EmbedPipeline.capAudit(Synth.documents(s, dir))

  val queries: Map[String, Q] = Map(
    "stream_pqindex_replay" -> streamPqIndexReplay,
    "corpus_embed_cap_audit" -> corpusEmbedCapAudit)

  val oracle: Map[String, String] = Map(
    // the shared chunk→vector→angular-bucket chain, grouped per bucket
    // with the same least/cap arithmetic as EmbedPipeline.capAudit
    "corpus_embed_cap_audit" ->
      s"""WITH ${ExtQueries.EmbedBucketCtes}
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(least(count(*), ${graft.ext.EmbedPipeline.CandidateCap})
         |    AS BIGINT) AS candidates_kept,
         |  count(*) > ${graft.ext.EmbedPipeline.CandidateCap} AS truncated,
         |  CAST(greatest(
         |    count(*) - ${graft.ext.EmbedPipeline.CandidateCap + 1}, 0)
         |    AS BIGINT) AS chunks_at_risk
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // trained coarse reps (first-max cosine cell) + per-subspace argmin
    // codes against the epoch of each vector's tercile batch: epoch 1 =
    // the SQL-trained codebook, epoch 2 = its elementwise negation
    "stream_pqindex_replay" ->
      s"""WITH RECURSIVE
         |${ExtQueries.PqKmCtes},
         |${ExtQueries.CoarseKmCtes},
         |r AS (SELECT min(vec_id) AS tmin, max(vec_id) AS tmax
         |  FROM embeddings),
         |ep AS (SELECT vec_id,
         |    CASE WHEN vec_id < tmin + 2 * (tmax - tmin) // 3 THEN 1
         |         ELSE 2 END AS epoch
         |  FROM embeddings, r),
         |asg AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${ExtQueries.cosSql("e.embedding", "r.rep")} DESC,
         |          r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |cw2 AS (SELECT m, j, c FROM cw
         |  UNION ALL
         |  SELECT m, j + 16, list_transform(c, x -> -x) FROM cw),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
         |  FROM embeddings, ms),
         |d2 AS (SELECT s.vec_id, s.m, w.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - w.c[i]) * (s.s[i] - w.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN ep ON s.vec_id = ep.vec_id
         |  JOIN cw2 w ON s.m = w.m
         |    AND ((ep.epoch = 1 AND w.j < 16) OR (ep.epoch = 2 AND w.j >= 16))),
         |codes AS (SELECT vec_id, m, j % 16 AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1)
         |SELECT c.vec_id, CAST(a.ivf_cell AS BIGINT) AS cell,
         |  CAST(c.m AS BIGINT) AS m, CAST(c.code AS BIGINT) AS code,
         |  CASE WHEN ep.epoch = 1 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(2 AS BIGINT) END AS codebook_epoch
         |FROM codes c JOIN asg a ON c.vec_id = a.vec_id
         |  JOIN ep ON c.vec_id = ep.vec_id
         |ORDER BY c.vec_id, c.m""".stripMargin)
}
