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
    val dim = conv(substring(md5(col("tok")), 1, 15), 16, 10)
      .cast("long") % dims
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

  def planeCount(nChunks: Long, floor: Int = 4): Int = {
    var nP = floor
    while (nP < MaxPlanes && (nChunks >> nP) > 1024) nP += 1
    nP
  }

  def semanticChunkDedup(docs: DataFrame, dims: Int = 16, window: Int = 32,
      stride: Int = 24, tau: Double = 0.95, nPlanes: Int = 4): DataFrame = {
    val v0 = chunkVectors(docs, dims, window, stride)
    // CENTERED sign-LSH (sf10 rung, round 10): hashed-BoW count vectors
    // all live in the positive orthant, so uncentered sign bits
    // concentrate mass in a few buckets no matter how many planes —
    // subtracting the corpus mean splits each hyperplane ~50/50. The
    // mean is BIT-DETERMINISTIC across engines: each component is a sum
    // of integer-valued doubles (exact in IEEE up to 2^53, order-free)
    // divided once by the chunk count, so the DuckDB twin reproduces it
    // exactly; the tau-cosine verify still runs on the RAW vectors —
    // centering only moves the candidate-bucket boundary.
    // (means + count are 16 doubles + a long — index construction,
    // the IVF-centroid collect contract)
    val mRow = v0.agg(
      count(lit(1)).as("n"),
      (0 until dims).map(i => sum(col("vec").getItem(i)).as(s"s$i")): _*).head()
    val nChunks = mRow.getLong(0)
    if (nChunks == 0L) {
      // empty corpus: the sums above are null (getDouble would NPE) and
      // there is nothing to bucket — return the empty disposition frame
      // with the same schema as the populated path.
      return v0.select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        lit(true).as("kept"),
        col("doc_id").as("keeper_doc"), col("chunk_id").as("keeper_chunk"))
    }
    val mean = (0 until dims).map(i => mRow.getDouble(i + 1) / nChunks).toArray
    val planes = Similarity.hyperplanes(MaxPlanes, dims)
      .take(planeCount(nChunks, nPlanes))
    val centered = zip_with(col("vec"), typedLit(mean.toSeq), (a, b) => a - b)
    val v = v0
      .withColumn("bucket", Similarity.lshBucket(centered, planes))
    val earlier = v.select(col("bucket"), col("doc_id").as("a_doc"),
      col("chunk_id").as("a_chunk"), col("vec").as("a_vec"))
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
}
