package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The embedding-side composed pipeline: text → overlapping chunks →
  * model-free chunk embeddings → bucketed semantic dedup → one disposition
  * row per chunk. The embedding is a HASHED BAG-OF-WORDS vector (token →
  * md5-hashed dimension, per-dimension counts) — the deterministic,
  * engine-mirrorable stand-in for a neural encoder that still carries
  * GRADED similarity (shared vocabulary ⇒ high cosine), unlike a content
  * hash, so the semantic-dedup stage has something real to measure. A
  * production deployment swaps [[chunkVectors]] for a model server call
  * behind the same (doc_id, chunk_id, vec) seam; every stage downstream is
  * unchanged.
  *
  * Scale shape: chunking and hashing are row-local; the vector build is
  * two map-side-combined aggregations keyed by the high-cardinality
  * (doc, chunk[, dim]) composites; dedup buckets by sign-LSH over the
  * vectors (planes ∝ log N — the [[Similarity.knnGraph]] contract) and is
  * quadratic only within buckets; the disposition join keys on
  * (doc, chunk). Nothing is collected; vectors are `dims` doubles.
  */
object EmbedPipeline {
  /** Chunk rows WITH their token arrays (the [[TextAnalysis.chunkDocs]]
    * windows, keeping the tokens for vectorization). */
  private def chunkToks(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    val toks = col("toks")
    val chunks = when(size(toks) === 0, array().cast("array<array<string>>"))
      .otherwise(transform(
        sequence(lit(0), ((size(toks) - 1) / stride).cast("int")),
        s => slice(toks, s * stride + 1, lit(window))))
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(chunks))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("ctoks"),
        md5(concat_ws(" ", col("col"))).as("chunk_md5"))
  }

  /** (doc_id, chunk_id, chunk_md5, vec) — the hashed-BoW embedding:
    * dimension = 60-bit md5 fold of the token mod `dims`, value = token
    * count in that dimension, materialized dense via a map lookup. */
  def chunkVectors(docs: DataFrame, dims: Int = 16, window: Int = 32,
      stride: Int = 24): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val dim = graft.functions.GraftFunctions
      .md5PrefixLong(col("tok"), 1, 15) % dims
    // KEPT as the two codegen'd count aggregations. r15 tried the
    // "aggregate before you shuffle" rewrite (per-token one-hot arrays →
    // ONE map-side vector_sum_long keyed (doc, chunk, md5)): shuffle
    // bytes dropped 3.3× (50.1 → 15.1 MB, jobs 35 → 27 at sf0.1) but the
    // sf30 rung REGRESSED 312 → 475 s — the per-token 16-long array
    // allocation plus the non-codegen TypedImperativeAggregate update
    // loop costs far more CPU than the saved exchange; the two-level
    // count() form runs entirely inside whole-stage codegen with
    // primitive hash-map counters. Guide §1.1's warning made concrete:
    // the "ideal shuffle" plan lost to per-task work. Receipts in
    // OPTIMIZATION_r15.md.
    val cells = chunkToks(docs, window, stride)
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        explode(col("ctoks")).as("tok"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"), dim.as("dim"))
      .groupBy("doc_id", "chunk_id", "chunk_md5", "dim")
      .agg(count(lit(1)).as("c"))
    cells
      .groupBy("doc_id", "chunk_id", "chunk_md5")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("c")))).as("m"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => coalesce(element_at(col("m"), d.cast("long")), lit(0L))
            .cast("double")).as("vec"))
  }

  /** The composed dedup: sign-LSH buckets over the chunk vectors, a chunk
    * DROPPED iff an earlier chunk (by (doc_id, chunk_id)) in the same
    * bucket has cosine ≥ `tau`; keeper = the minimal such predecessor —
    * the pairwise-local SemDeDup-style rule, no connected components.
    * Output: one disposition row per chunk.
    *
    * The plane count GROWS with the corpus (the "planes ∝ log N" contract
    * made real — the sf10 rung caught the fixed-4-plane version at 16
    * buckets producing a Σ|bucket|² ≈ 1.2e11-row self-join over 1.36M
    * chunks): starting from the `nPlanes` floor, planes are added until
    * expected occupancy nChunks/2^nP ≤ 1024, capped at [[MaxPlanes]].
    * Pure integer recurrence (shift-and-compare, no float log) so the
    * DuckDB twin reproduces the count exactly; the plane family is the
    * fixed prefix of hyperplanes(MaxPlanes) (row-major seeded draws, so
    * the first nP rows never change as the count grows). At the oracle
    * gate SFs (≤ 16384 chunks) the recurrence stays at the floor — the
    * adaptivity only engages on the timing rungs and beyond. */
  val MaxPlanes = 14

  /** Bounded-verify width W: each chunk is checked against at most the W
    * smallest-(doc_id, chunk_id) predecessors of its LSH bucket, bounding
    * total verify work at N·W whatever the bucket distribution (Zipf token
    * mass makes direction clusters — and therefore bucket sizes — heavy-
    * tailed at every plane count). Chosen above the largest oracle-gate
    * bucket (~850 at sf0.1), so gate results are cap-free. */
  val CandidateCap = 1024

  def planeCount(nChunks: Long, floor: Int = 4): Int = {
    var nP = floor
    while (nP < MaxPlanes && (nChunks >> nP) > 1024) nP += 1
    nP
  }

  /** The constant direction-space centering offset: the component every
    * dim of a UNIT vector has when mass is spread uniformly (1/√dims —
    * exactly 0.25 at dims = 16). A compile-time constant, so both engines
    * embed the identical literal — no data-dependent statistic to mirror. */
  def uniformDirComponent(dims: Int): Double = 1.0 / math.sqrt(dims.toDouble)

  def semanticChunkDedup(docs: DataFrame, dims: Int = 16, window: Int = 32,
      stride: Int = 24, tau: Double = 0.95, nPlanes: Int = 4): DataFrame = {
    val v0 = chunkVectors(docs, dims, window, stride)
    // ANGULAR sign-LSH + bounded verify (sf10 rung, round 11). History:
    // uncentered sign bits over positive count vectors concentrated mass
    // (r10 fix: subtract the corpus mean) — but MEAN-centering has its
    // own Θ(N²) cell: every SHORT chunk (tail windows; 9.5% of the sf10
    // corpus) has a near-zero vector, so v − mean ≈ −mean and they ALL
    // share the sign pattern of −mean (measured at sf10: one bucket held
    // 118,576 of 1.36M chunks = 69% of Σ|bucket|² = 2.03e10 — a single
    // 9-CPU-minute straggler task). Two changes, each measured:
    //  1. Bucket in DIRECTION space, where the tau-cosine verifier
    //     actually lives: normalize to the unit sphere (scale-invariant,
    //     like cosine), then subtract the constant uniform direction
    //     1/√dims so the typical full-window direction sits at the
    //     hyperplane origin. This dissolves the degenerate short-chunk
    //     cell (they spread by WHICH dims are hot) and removes the
    //     data-dependent mean entirely — everything is ROW-LOCAL and
    //     bit-deterministic (Σv² is an exact integer sum, sqrt correctly
    //     rounded, division/subtraction single IEEE ops, plane dots fold
    //     in the twin's pinned order). Measured at sf10: top bucket
    //     118,576 → 54,908. But Zipf token mass hashes into a few hot
    //     dims, so directions CLUSTER genuinely — Σ|bucket|² stays Θ(N²)
    //     (2.4e10) under any plane count: near-parallel directions never
    //     split.
    //  2. Therefore bound the verify itself: each chunk checks only the
    //     [[CandidateCap]] smallest-(doc,chunk) predecessors of its
    //     bucket — the same linear-by-construction discipline as the
    //     levenshtein block cap and the nnDescent representative cap.
    //     Work ≤ N·W regardless of bucket shape. The keeper is still the
    //     EXACT min tau-similar predecessor whenever that predecessor
    //     ranks ≤ W in its bucket (candidates are the smallest ids, and
    //     keeper = min); a drop is missed only when ALL of a chunk's
    //     tau-similar predecessors rank > W. At the oracle gate SFs the
    //     cap never binds (≤ 850-chunk buckets at sf0.1 vs W = 1024), so
    //     this is purely the 100×-scale contract, mirrored verbatim in
    //     the DuckDB twin's QUALIFY.
    val nChunks = v0.count()
    if (nChunks == 0L) {
      // empty corpus: nothing to bucket — return the empty disposition
      // frame with the same schema as the populated path.
      return v0.select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        lit(true).as("kept"),
        col("doc_id").as("keeper_doc"), col("chunk_id").as("keeper_chunk"))
    }
    val planes = Similarity.hyperplanes(MaxPlanes, dims)
      .take(planeCount(nChunks, nPlanes))
    // The lambda body touches ONLY its element variables (the HOF inlining
    // trap this file's sibling WinnowingStream documents: a lambda that
    // references an outer column can get that column's defining fold
    // INLINED and re-run per element). The norm fold rides in via
    // array_repeat — evaluated once per row, then zipped.
    val norm = sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x))
    val dir = zip_with(col("vec"), array_repeat(norm, dims),
      (x, n) => x / n - lit(uniformDirComponent(dims)))
    val v = v0.withColumn("bucket", Similarity.lshBucket(dir, planes))
    // bounded-verify candidate set: the W smallest (doc, chunk) per bucket
    // (a 55k-row per-bucket sort is N log N — the skewed SORT is cheap,
    // it is the skewed JOIN PRODUCT the cap removes)
    val earlier = v.select(col("bucket"), col("doc_id").as("a_doc"),
      col("chunk_id").as("a_chunk"), col("vec").as("a_vec"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("a_doc", "a_chunk")))
      .filter(col("rn") <= CandidateCap).drop("rn")
    val drops = v.join(earlier, "bucket")
      .filter(col("a_doc") < col("doc_id") ||
        (col("a_doc") === col("doc_id") && col("a_chunk") < col("chunk_id")))
      .filter(Similarity.cosine(col("a_vec"), col("vec")) >= tau)
      .groupBy("doc_id", "chunk_id")
      .agg(min(struct(col("a_doc"), col("a_chunk"))).as("kp"))
      .select(col("doc_id"), col("chunk_id"),
        col("kp.a_doc").as("keeper_doc"), col("kp.a_chunk").as("keeper_chunk"))
    v.join(drops, Seq("doc_id", "chunk_id"), "left_outer")
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        col("keeper_doc").isNull.as("kept"),
        col("keeper_doc"), col("keeper_chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Bounded-verify RECEIPT: one row per LSH bucket with its population,
    * the predecessor-candidate count actually served (min(n, W)), and
    * whether [[CandidateCap]] truncated it — the same drop-accounting
    * discipline as the minhash maxBucket cap, as a gate-checked key
    * instead of a log line. At the oracle gates every `truncated` is
    * false (the cap-free regime); on the timing rungs this is the receipt
    * for exactly which cells pay the recall trade. */
  def capAudit(docs: DataFrame, dims: Int = 16, window: Int = 32,
      stride: Int = 24, nPlanes: Int = 4): DataFrame = {
    val v0 = chunkVectors(docs, dims, window, stride)
    val nChunks = v0.count()
    val planes = Similarity.hyperplanes(MaxPlanes, dims)
      .take(planeCount(math.max(nChunks, 1L), nPlanes))
    // element-local lambda (see semanticChunkDedup): one norm fold per row
    val norm = sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x))
    val dir = zip_with(col("vec"), array_repeat(norm, dims),
      (x, n) => x / n - lit(uniformDirComponent(dims)))
    v0.withColumn("bucket", Similarity.lshBucket(dir, planes))
      .groupBy("bucket").agg(count(lit(1)).as("n_chunks"))
      .select(col("bucket"), col("n_chunks"),
        least(col("n_chunks"), lit(CandidateCap.toLong)).as("candidates_kept"),
        (col("n_chunks") > CandidateCap).as("truncated"),
        // upper bound on MISSED drops in this bucket: a chunk at bucket
        // rank r sees all its predecessors iff r ≤ W+1, so at most
        // n − W − 1 chunks can have a tau-similar predecessor outside
        // their candidate window. 0 everywhere the cap doesn't bind.
        greatest(col("n_chunks") - lit(CandidateCap.toLong + 1L), lit(0L))
          .as("chunks_at_risk"))
      .orderBy("bucket")
  }
}
