package graft.queries

import graft.streaming.{LevAdmissionStream, SemDedupStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 7: the edit-distance admission twin converted to an
  * oracle-asserted replay key. This one's emission log has NO closed form
  * — admission is a sequential chain (a doc joins its block's state only
  * if nothing already-admitted matches it, and later verdicts depend on
  * who joined) — so the DuckDB twin replays the chain itself with a
  * RECURSIVE CTE: one iteration per within-block arrival rank, the
  * admitted member list carried forward as a LIST(STRUCT) column, every
  * iteration emitting that arrival's verdict row. All blocks advance in
  * parallel per iteration, so recursion depth = the largest block's
  * arrival count. The chain was validated against an independent
  * simulation of `admitBlock` before wiring (exact row equality at
  * sf0.001, including the maxBlock=64 admission cap and the
  * min-id-match canonical/dist rule).
  *
  * Replay determinism: batches are doc_id TERCILES and the operator sorts
  * within batch by doc_id, so the admission order is global doc_id order;
  * DuckDB's `levenshtein` equals the operator's banded verifier on every
  * pair that passes the |Δlen| ≤ maxDist prefilter (the band only prunes
  * distances the ≤ maxDist comparison would reject anyway).
  */
object R11gQueries {

  type Q = (SparkSession, String) => DataFrame

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  import scala.jdk.CollectionConverters._

  private val streamLevAdmissionReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = Synth.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (idMin, idMax) = (docs.map(_._1).min, docs.map(_._1).max)
    val batches = (0 to 2).map(b =>
      docs.filter(d => R11Queries.tercileOf(d._1, idMin, idMax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sinkName = s"graft_lev_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(LevAdmissionStream.verdicts(
        LevAdmissionStream.blockHits(input.toDF().toDF("doc_id", "text")))
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
      .select("doc_id", "bkey", "canonical", "dist")
      .orderBy("doc_id", "bkey")
  }

  /** Tercile 3-batch replay of the SemDeDup admission operator over the
    * batch key's planted-copy corpus (organics + every-50th vector copied
    * at id+1M — the copies land in the LAST tercile, so they reject
    * against accepted state that crossed two batch boundaries). Same
    * sequential-chain situation as the lev twin: the DuckDB twin replays
    * admission with a recursive CTE per k-means cluster, members carried
    * as (id, double[64]) structs, cosine in the pinned cosSql fold, best
    * match = (cosine desc, id asc) via a struct-min over (-cos, id). */
  private val streamSemDedupReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = Synth.embeddings(s, dir)
    val cents = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val organics = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val corpus = organics ++ organics.filter(_._1 % 50 == 0)
      .map { case (id, v) => (id + 1000000L, v) }
    val (idMin, idMax) = (corpus.map(_._1).min, corpus.map(_._1).max)
    val batches = (0 to 2).map(b =>
      corpus.filter(r => R11Queries.tercileOf(r._1, idMin, idMax) == b))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val sinkName = s"graft_semdedup_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(SemDedupStream.decisions(
        SemDedupStream.assign(input.toDF().toDF("vec_id", "embedding"), cents),
        threshold = 0.99)
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
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("kept"), col("dup_of"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "stream_lev_admission_replay" -> streamLevAdmissionReplay,
    "stream_semdedup_replay" -> streamSemDedupReplay)

  val oracle: Map[String, String] = Map(
    // recursive admission replay: members list carried per block, one
    // arrival rank per iteration; canonical = min admitted id matching
    // (|Δlen| ≤ 4 AND levenshtein ≤ 4), dist = that member's distance;
    // a no-match arrival is admitted while the block holds < 64 members
    "stream_lev_admission_replay" ->
      """WITH RECURSIVE lc AS (SELECT doc_id, text FROM documents),
        |sig0 AS (SELECT doc_id,
        |    substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |           1, 96) AS sig
        |  FROM lc),
        |sigt AS (SELECT doc_id, sig, CAST(length(sig) AS BIGINT) AS len
        |  FROM sig0),
        |keyed AS (
        |  SELECT doc_id, sig, len, 'p:' || substr(sig, 1, 16) AS bkey FROM sigt
        |  UNION ALL
        |  SELECT doc_id, sig, len, 's:' || right(sig, 16) AS bkey FROM sigt),
        |h AS (SELECT bkey, doc_id, len, sig,
        |    row_number() OVER (PARTITION BY bkey ORDER BY doc_id) AS rn
        |  FROM keyed),
        |adm AS (
        |  SELECT bkey, CAST(0 AS BIGINT) AS rn,
        |    CAST([] AS STRUCT(id BIGINT, mlen BIGINT, msig VARCHAR)[]) AS members,
        |    CAST(NULL AS BIGINT) AS doc_id,
        |    CAST(NULL AS BIGINT) AS canonical, CAST(NULL AS BIGINT) AS dist
        |  FROM (SELECT DISTINCT bkey FROM h)
        |  UNION ALL
        |  SELECT bkey, rn,
        |    CASE WHEN canonical IS NULL AND len(members) < 64
        |         THEN list_append(members,
        |                {'id': doc_id, 'mlen': hlen, 'msig': hsig})
        |         ELSE members END AS members,
        |    doc_id, canonical, dist
        |  FROM (
        |    SELECT h.bkey, adm.rn + 1 AS rn, adm.members, h.doc_id,
        |      h.len AS hlen, h.sig AS hsig,
        |      list_min(list_transform(
        |        list_filter(adm.members, m -> abs(m.mlen - h.len) <= 4
        |          AND levenshtein(m.msig, h.sig) <= 4), m -> m.id)) AS canonical
        |    FROM adm JOIN h ON h.bkey = adm.bkey AND h.rn = adm.rn + 1) t
        |  , LATERAL (SELECT CASE WHEN canonical IS NULL THEN NULL
        |      ELSE CAST(levenshtein(
        |        (list_filter(members, m -> m.id = canonical)[1]).msig,
        |        hsig) AS BIGINT)
        |      END AS dist) d
        |)
        |SELECT doc_id, bkey, coalesce(canonical, -1) AS canonical,
        |  coalesce(dist, -1) AS dist
        |FROM adm WHERE rn >= 1 ORDER BY doc_id, bkey""".stripMargin,

    // recursive SemDeDup admission replay: the dedup_semantic k-means
    // centroids + first-max cell assignment over the planted-copy corpus,
    // then the per-cluster chain — members carried as (id, double[64])
    // structs, pinned-fold cosines, best match = min over (-cos, id)
    "stream_semdedup_replay" -> {
      val cosMV = ExtQueries.cosSqlN("m.e", "v.e", 64)
      s"""WITH RECURSIVE
         |${ExtQueries.CoarseKmCtes},
         |corp AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |asg AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${ExtQueries.cosSql("e.embedding", "r.rep")} DESC,
         |          r.cell) AS rn
         |    FROM corp e, reps r) WHERE rn = 1),
         |v AS (SELECT c.vec_id, CAST(a.ivf_cell AS BIGINT) AS cluster,
         |    list_transform(c.embedding, x -> CAST(x AS DOUBLE)) AS e,
         |    row_number() OVER (PARTITION BY a.ivf_cell
         |      ORDER BY c.vec_id) AS rn
         |  FROM corp c JOIN asg a USING (vec_id)),
         |adm AS (
         |  SELECT cluster, CAST(0 AS BIGINT) AS rn,
         |    CAST([] AS STRUCT(id BIGINT, e DOUBLE[])[]) AS members,
         |    CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BOOLEAN) AS kept,
         |    CAST(NULL AS BIGINT) AS dup_of
         |  FROM (SELECT DISTINCT cluster FROM v)
         |  UNION ALL
         |  SELECT cluster, rn,
         |    CASE WHEN kept THEN list_append(members, {'id': vec_id, 'e': ve})
         |         ELSE members END AS members,
         |    vec_id, kept, dup_of
         |  FROM (
         |    SELECT t.*, len(cands) = 0 AS kept,
         |      CASE WHEN len(cands) = 0 THEN CAST(-1 AS BIGINT)
         |        ELSE list_min(list_transform(
         |          list_filter(cands,
         |            c -> c.negc = list_min(list_transform(cands, c2 -> c2.negc))),
         |          c -> c.id)) END AS dup_of
         |    FROM (
         |      SELECT v.cluster, adm.rn + 1 AS rn, adm.members, v.vec_id,
         |        v.e AS ve,
         |        list_transform(
         |          list_filter(adm.members, m -> $cosMV >= 0.99),
         |          m -> {'negc': -($cosMV), 'id': m.id}) AS cands
         |      FROM adm JOIN v ON v.cluster = adm.cluster
         |        AND v.rn = adm.rn + 1) t) s
         |)
         |SELECT vec_id, cluster, kept, dup_of
         |FROM adm WHERE rn >= 1 ORDER BY vec_id""".stripMargin
    })
}
