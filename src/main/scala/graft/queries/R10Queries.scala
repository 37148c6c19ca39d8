package graft.queries

import graft.streaming.{ExactDedupStream, NearDupStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 wave: oracle-checked STREAMING replay. The 32 streaming twins
  * are spec-asserted (checkpoint recovery, batch≡stream parity), but until
  * this round none routed through the DuckDB oracle (r9 verdict #3). This
  * key drives the real `flatMapGroupsWithState` operator with a
  * deterministic 3-micro-batch replay and registers its DECISION LOG as a
  * keyed query whose DuckDB twin replays the identical admission order in
  * SQL — converting the parity claim from spec-asserted to oracle-asserted.
  */
object R10Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Monotone suffix for memory-sink names: a key can run several times in
    * one session (Bench runs each key twice), and memory sinks refuse to
    * reuse a live query name. */
  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Deterministic 3-batch replay of the corpus-with-planted-copies through
    * the streaming exact-dedup operator (graft.streaming.ExactDedupStream):
    *
    *   batch 0 — every organic document;
    *   batch 1 — byte-identical copies of every 10th doc, id + 1,000,000;
    *   batch 2 — a second copy wave, id + 2,000,000.
    *
    * The operator's contract makes the decision log a pure function of
    * (batch membership, id): the FIRST batch where a content key appears
    * admits its minimum doc_id as canonical; every later arrival rejects
    * against that canonical. Organic exact duplicates (the synthetic corpus
    * has many — short docs over a small vocabulary) resolve within batch 0
    * by min id, and both copy waves must reject cross-batch to the batch-0
    * canonical — state surviving micro-batch boundaries is exactly what the
    * oracle verifies.
    *
    * The driver-side `.collect()` feeding the MemoryStream is replay
    * scaffolding, not the operator's scale path (production is readStream
    * from the socket/kafka sources; deterministic oracle replay REQUIRES
    * pinning batch membership, which only a driver-fed source can do). The
    * id offsets assume max organic doc_id < 1,000,000 — pinned by the
    * id-space guard spec (R9ePlanSpec) at every local SF. */
  private val streamExactDedupReplay: Q = (s, dir) => {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = Synth.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val copies = base.filter(_._1 % 10 == 0)
    val wave1 = copies.map { case (id, t) => (id + 1000000L, t) }
    val wave2 = copies.map { case (id, t) => (id + 2000000L, t) }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sinkName = s"graft_exdedup_replay_${replaySeq.incrementAndGet()}"
    val q = ReplayHarness.sized(s)(ExactDedupStream.decisions(
        ExactDedupStream.keyed(input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    val rows =
      try {
        input.addData(base); q.processAllAvailable()
        input.addData(wave1); q.processAllAvailable()
        input.addData(wave2); q.processAllAvailable()
        s.table(sinkName).as[ExactDedupStream.Decision].collect()
          .sortBy(_.doc_id).toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    // materialized locally: the result must outlive the stopped query and
    // dropped sink view (Verify writes it to parquet after this returns);
    // size = |corpus| + 2·|copies| decision rows — bounded replay output
    rows.toDF().select(col("doc_id"), col("canonical"), col("kept"))
      .orderBy("doc_id")
  }

  /** Deterministic 3-batch replay through the streaming MinHash-LSH
    * operator (graft.streaming.NearDupStream) — the second oracle-asserted
    * twin, and the one whose state machine is richer than exact dedup's:
    * per-(band,bucket) GroupState holds a running-minimum canonical that a
    * LATER batch can take over.
    *
    *   batch 0 — byte-identical copies of every 10th doc at id + 1,000,000
    *             (high ids arrive FIRST, seeding every shared bucket with a
    *             large canonical);
    *   batch 1 — the organic base corpus (every 5th doc) — smaller ids WIN
    *             the buckets, so this batch exercises the takeover path:
    *             the dethroned batch-0 canonical must itself be re-emitted
    *             as a candidate edge to the new canonical;
    *   batch 2 — a second copy wave at id + 2,000,000 — pure rejects
    *             against state that has survived two batch boundaries.
    *
    * The operator's output is a pure function of (bucket membership, batch
    * membership, id): per (band, bucket) and batch, canonical = min(state,
    * batch ids); edges = (batch ids ∪ {previous state}) \ {canonical}. The
    * DuckDB twin recomputes the SAME 32-component KM signature / 4×8 band
    * buckets (the shared MinhashSigCtes chain that already twins the batch
    * operator) and replays that recurrence with a running-min window over
    * batch order — bucket state surviving micro-batch boundaries AND the
    * canonical takeover are both oracle-verified.
    *
    * Same replay-scaffolding caveats as [[streamExactDedupReplay]]: the
    * driver-side collect feeds the MemoryStream because a deterministic
    * oracle requires pinned batch membership; id offsets assume max organic
    * doc_id < 1,000,000 (guarded in R9ePlanSpec). */
  private val streamNearDupReplay: Q = (s, dir) => {
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
    val sinkName = s"graft_neardup_replay_${replaySeq.incrementAndGet()}"
    // MemoryStream delivers each replay batch as ONE partition; production
    // sources (socket/Kafka) arrive pre-partitioned, so re-spread the batch
    // before the 32-permutation signature projection — otherwise the
    // replay serializes the operator's heaviest row-local stage on a
    // single core and the bench reads scaffolding, not operator cost
    // (measured 17.7 s → ~5 s at sf0.1; content unchanged, deterministic
    // hash partitioning on doc_id)
    val q = ReplayHarness.sized(s)(NearDupStream.candidates(
        NearDupStream.bucketHits(
          input.toDF().toDF("doc_id", "text").repartition(col("doc_id"))))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start())
    val rows =
      try {
        input.addData(wave0); q.processAllAvailable()
        input.addData(base); q.processAllAvailable()
        input.addData(wave2); q.processAllAvailable()
        s.table(sinkName).as[NearDupStream.Cand].collect().toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sinkName)
      }
    // bounded: ≤ bands × |replay corpus| candidate edges, materialized so
    // the result outlives the stopped query (Verify writes it after return)
    rows.toDF().select(col("ida"), col("idb"), col("band"), col("bucket"))
      .orderBy("band", "bucket", "ida", "idb")
  }

  val queries: Map[String, Q] = Map(
    "stream_exact_dedup_replay" -> streamExactDedupReplay,
    "stream_neardup_replay" -> streamNearDupReplay)

  val oracle: Map[String, String] = Map(
    // SQL replay of the identical admission order: canonical(ck) = the min
    // doc_id within the MINIMUM batch containing ck (row_number over
    // (batch, doc_id)); kept = "I am that canonical". Cross-batch state is
    // what makes wave-1/2 rows reject to batch-0 ids.
    "stream_exact_dedup_replay" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, 0 AS b FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 1 FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, 2 FROM documents WHERE doc_id % 10 = 0),
        |k AS (SELECT doc_id, b, md5(text) AS ck FROM corpus),
        |canon AS (
        |  SELECT ck, doc_id AS canonical FROM (
        |    SELECT ck, doc_id,
        |           row_number() OVER (PARTITION BY ck ORDER BY b, doc_id) AS rn
        |    FROM k) WHERE rn = 1)
        |SELECT k.doc_id, c.canonical, k.doc_id = c.canonical AS kept
        |FROM k JOIN canon c USING (ck)
        |ORDER BY doc_id""".stripMargin,

    // SQL replay of the stateful bucket recurrence: per (band, bucket) and
    // batch bt, canonical = running min over batches ≤ bt; edges = batch
    // ids joined to that canonical, PLUS the dethroned previous canonical
    // when a smaller id takes over (the Scala operator re-emits it). Batch
    // membership is id-coded ([1M,2M)=batch 0, <1M=batch 1, ≥2M=batch 2),
    // and the signature/band chain is the SAME MinhashSigCtes that twins
    // the batch dedup_minhash_lsh operator.
    "stream_neardup_replay" ->
      s"""WITH corpus AS (
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0),
         |${ExtQueries.MinhashSigCtes},
         |hits AS (SELECT CAST(b AS INT) AS band,
         |  md5(array_to_string(sig[b*8+1 : b*8+8], ',')) AS bucket, doc_id,
         |  CASE WHEN doc_id >= 2000000 THEN 2
         |       WHEN doc_id >= 1000000 THEN 0 ELSE 1 END AS bt
         |  FROM sigl, range(0,4) r(b)),
         |grp AS (SELECT band, bucket, bt,
         |    min(min(doc_id)) OVER (PARTITION BY band, bucket ORDER BY bt) AS canonical,
         |    min(min(doc_id)) OVER (PARTITION BY band, bucket ORDER BY bt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         |  FROM hits GROUP BY band, bucket, bt),
         |edges AS (
         |  SELECT g.canonical AS ida, h.doc_id AS idb, h.band, h.bucket
         |  FROM hits h JOIN grp g USING (band, bucket, bt)
         |  WHERE h.doc_id <> g.canonical
         |  UNION ALL
         |  SELECT canonical, prev, band, bucket FROM grp
         |  WHERE prev IS NOT NULL AND prev <> canonical)
         |SELECT ida, idb, band, bucket FROM edges
         |ORDER BY band, bucket, ida, idb""".stripMargin)
}
