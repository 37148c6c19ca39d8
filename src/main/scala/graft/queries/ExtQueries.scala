package graft.queries

import scala.util.chaining._

import graft.ext.{Contamination, Dedup, EmbedPipeline, Embeddings, Multimodal, PqTrainer, Selection, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline extension operators (build brief): dedup family,
  * similarity search, text analysis, multimodal plumbing — each with a
  * DuckDB oracle twin. Near-dup corpora plant duplicates deterministically
  * (the base documents are all-distinct), so dedup outputs are non-trivial
  * and identical across engines.
  */
object ExtQueries {
  import Synth.{documents, embeddings}

  type Q = (SparkSession, String) => DataFrame

  private val Suffix = " almost identical suffix tokens"

  /** documents ∪ near-dup copies (every 20th, suffixed) ∪ exact copies
    * (every 25th). */
  private[queries] def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000000).as("doc_id"),
          concat(col("text"), lit(Suffix)).as("text")))
      .unionAll(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000000).as("doc_id"), col("text")))
  }

  private[queries] val CorpusCte: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 100000000, text || '$Suffix' FROM documents WHERE doc_id % 20 = 0
       |  UNION ALL SELECT doc_id + 200000000, text FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  // ------------------------------------------------------------- dedup

  private val dedupExact: Q = (s, dir) =>
    Dedup.exact(dupCorpus(s, dir)).orderBy("keep_id")

  private val dedupMinhashLsh: Q = (s, dir) =>
    Dedup.minhashLshPairs(dupCorpus(s, dir)).orderBy("ida", "idb")

  private val dedupClusters: Q = (s, dir) =>
    Dedup.connectedComponents(Dedup.minhashLshPairs(dupCorpus(s, dir)))
      .orderBy("doc_id")

  /** MinHash signature fidelity — est vs exact Jaccard on the planted
    * pairs (the signature-quality audit: how well do 32 hashes estimate
    * the true resemblance the LSH thresholds act on): est = matching
    * components / 32, next to the exact token Jaccard. */
  private val dedupMinhashJaccardEst: Q = (s, dir) => {
    val base = documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select("doc_id", "text")
    val twin = base.select(col("doc_id"),
      concat(col("text"), lit(Suffix)).as("text"))
    val sa = TextAnalysis.minhashSignatureRows(base, 32)
    val sb = TextAnalysis.minhashSignatureRows(twin, 32)
      .select(col("doc_id") +: (0 until 32).map(i => col(s"h$i").as(s"g$i")): _*)
    val eq = (0 until 32)
      .map(i => when(col(s"h$i") === col(s"g$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val exact = base.select(col("doc_id"),
      Dedup.jaccardX10000(
        TextAnalysis.tokens(col("text")),
        TextAnalysis.tokens(concat(col("text"), lit(Suffix)))).as("jacc_x10000"))
    sa.join(sb, "doc_id")
      .select(col("doc_id"), (lit(10000L) * eq / lit(32L)).cast("long").as("est_x10000"))
      .join(exact, "doc_id")
      .orderBy("doc_id")
  }

  /** Duplicate-cluster size histogram — the dedup report a pipeline ships
    * (how much mass sits in how-big clusters): two bounded aggregations
    * over the CC labels (cluster sizes, then the size histogram — output
    * bounded by the size DOMAIN, not the corpus). */
  private val dedupClusterStats: Q = (s, dir) =>
    Dedup.connectedComponents(Dedup.minhashLshPairs(dupCorpus(s, dir)))
      .groupBy("comp").agg(count(lit(1)).as("n_members"))
      .groupBy("n_members").agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_members")

  private val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashSignatures(dupCorpus(s, dir)).orderBy("doc_id")

  private val dedupNgramJaccard: Q = (s, dir) =>
    documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        Dedup.jaccardX10000(
          TextAnalysis.tokens(col("text")),
          TextAnalysis.tokens(concat(col("text"), lit(Suffix)))).as("jacc_x10000"))
      .orderBy("doc_id")

  /** Directional containment on the planted (base, base+suffix) pairs —
    * next to their Jaccard: base→twin containment is exactly 10000 (the
    * base is wholly inside its suffixed twin) while Jaccard < 10000,
    * demonstrating the asymmetric signal whole-doc dedup needs for
    * quote-expansion / appended-boilerplate cases. */
  private val dedupContainment: Q = (s, dir) =>
    documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        Dedup.containmentX10000(
          TextAnalysis.tokens(col("text")),
          TextAnalysis.tokens(concat(col("text"), lit(Suffix)))).as("cont_ab_x10000"),
        Dedup.containmentX10000(
          TextAnalysis.tokens(concat(col("text"), lit(Suffix))),
          TextAnalysis.tokens(col("text"))).as("cont_ba_x10000"),
        Dedup.jaccardX10000(
          TextAnalysis.tokens(col("text")),
          TextAnalysis.tokens(concat(col("text"), lit(Suffix)))).as("jacc_x10000"))
      .orderBy("doc_id")

  private val dedupEmbeddingCosine: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val copies = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000000).as("vec_id"), col("embedding"))
    Dedup.embeddingCosinePairs(e, copies, Planes, threshold = 0.999)
      .orderBy("ida", "idb")
  }

  /** Measured cosine-dedup detection under bucketing — the embedding twin
    * of `dedup_recall`, and the recall case for Hamming-1 multi-probe in
    * the DEDUP family (ann_lsh_multiprobe's trick applied to
    * [[Dedup.embeddingCosinePairs]]): plant one perturbed copy per 50th
    * vector (+0.5 on the first dimension — enough to push some probes
    * across one hyperplane), then count how many planted (probe → origin)
    * pairs each path finds: `all_pairs` = the bucket-free cosine
    * denominator, `lsh` = single sign-LSH bucket, `lsh_multiprobe` = the
    * probe list of one-bit flips. The multiprobe row closes (part of) the
    * gap between lsh and all_pairs — measured, not asserted. */
  private val dedupCosineRecall: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val thr = 0.8
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") + when(i === 0, lit(0.5)).otherwise(lit(0.0)))
          .as("embedding"))
    def planted(df: DataFrame) = df.filter(col("idb") === col("ida") - 100000000)
      .agg(count(lit(1)).as("detected"))
    def row(name: String, df: DataFrame) =
      df.select(lit(name).as("method"), col("detected"))
    val allPairs = probes.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("idb"), col("embedding")),
        col("idb") === col("ida") - 100000000)
      .filter(Similarity.cosine(col("ea"), col("embedding")) >= thr)
      .agg(count(lit(1)).as("detected"))
    row("all_pairs", allPairs)
      .unionAll(row("lsh",
        planted(Dedup.embeddingCosinePairs(e, probes, Planes, thr))))
      .unionAll(row("lsh_multiprobe",
        planted(Dedup.embeddingCosinePairs(e, probes, Planes, thr, multiProbe = true))))
      .orderBy("method")
  }

  /** Measured dedup detection — the dedup twin of `ann_recall`: how many
    * of the PLANTED duplicates (1M+ = suffixed near-dups, 2M+ = exact
    * copies) does each method flag? exact = content-hash group ≥2;
    * minhash_lsh = an endpoint of a verified pair; simhash = a shared
    * 16-bit signature. The accuracy axis of the dedup family as an
    * oracle-checked query. */
  private val dedupRecall: Q = (s, dir) => {
    val c = dupCorpus(s, dir)
    val planted = c.filter(col("doc_id") >= 100000000).select("doc_id")
    def row(name: String, det: DataFrame) =
      planted.join(det.select("doc_id").distinct(), "doc_id")
        .agg(count(lit(1)).as("detected"))
        .select(lit(name).as("method"), col("detected"))
    val ck = c.select(col("doc_id"), md5(col("text")).as("ck"))
    val exactDet = ck.join(
      ck.groupBy("ck").agg(count(lit(1)).as("n")).filter(col("n") >= 2), "ck")
    val mh = Dedup.minhashLshPairs(c)
    val mhDet = mh.select(col("ida").as("doc_id"))
      .unionAll(mh.select(col("idb").as("doc_id")))
    val sh = Dedup.simhashSignatures(c)
    val shDet = sh.join(
      sh.groupBy("simhash").agg(count(lit(1)).as("n")).filter(col("n") >= 2),
      "simhash")
    row("exact", exactDet)
      .unionAll(row("minhash_lsh", mhDet))
      .unionAll(row("simhash", shDet))
      .orderBy("method")
  }

  /** Cross-source exact dups: identical content under ≥2 sources — the
    * mirror/syndication leakage signal. A mirrored copy of every 25th doc
    * is planted under a synthetic 'mirror' source. */
  private val dedupCrossSource: Q = (s, dir) => {
    val d = documents(s, dir).select("doc_id", "text", "source")
    val mirrored = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 200000000).as("doc_id"), col("text"),
        lit("mirror").as("source"))
    Dedup.crossSourceDups(d.unionByName(mirrored)).orderBy("keep_id")
  }

  /** SemDeDup: trained k-means clusters as dedup buckets, within-cluster
    * cosine ≥ 0.99, keeper = lowest centroid-cosine (ties → lower id).
    * Copies of every 50th vector planted as the semantic duplicates. */
  private val dedupSemantic: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val copies = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000000).as("vec_id"), col("embedding"))
    Dedup.semanticDedup(e.select("vec_id", "embedding").unionByName(copies),
        PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0), threshold = 0.99)
      .orderBy("vec_id")
  }

  // -------------------------------------------------------- similarity

  private val annBruteForce: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** SQ8 scalar-quantized ANN: per-dim absmax scales (one aggregate job),
    * int8 codes scanned + decoded in-projection, nCand exact re-rank. */
  private val annSq8: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.sq8TopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** IVF × SQ8 (FAISS IndexIVFScalarQuantizer): cell-pruned int8 scan. */
  private val annIvfSq8: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfSq8TopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** Build-once/probe-many SQ8 index: int8 codes persisted partitioned by
    * cell (completes the persisted × {flat, SQ8, PQ} matrix). */
  private val annIvfSq8Persisted: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfSq8PersistedTopK(e, e.filter(col("vec_id") < 10), 5,
        indexSlot("ivfsq8", dir))
      .orderBy("q_id", "rank")
  }

  /** Multi-probe IVF × SQ8 at nprobe=2 — the nprobe recall lever over the
    * int8 code lists (completes the nprobe × {flat, SQ8, PQ} matrix). */
  private val annIvfSq8Nprobe: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfSq8NprobeTopK(e, e.filter(col("vec_id") < 10), 5, 2)
      .orderBy("q_id", "rank")
  }

  private val Planes: Array[Array[Double]] = Similarity.hyperplanes(nPlanes = 6)

  private val annLsh: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.lshTopK(e, e.filter(col("vec_id") < 10), 5, Planes)
      .orderBy("q_id", "rank")
  }

  private val annLshMultiprobe: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.lshMultiProbeTopK(e, e.filter(col("vec_id") < 10), 5, Planes)
      .orderBy("q_id", "rank")
  }

  /** Top-3 neighbor graph over the WHOLE corpus (every vector a query) —
    * the bucketed self-join shape; see [[Similarity.knnGraph]]. */
  private val annKnnGraph: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Similarity.knnGraph(embeddings(s, dir), 3, Planes)
      .orderBy("q_id", "rank")
  }

  /** Measured recall@5 of the approximate ANN methods against the exact
    * brute-force baseline — the accuracy side of the ANN speed/recall
    * trade, as a first-class query ("measure, don't guess"). */
  private val annRecall: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val q = e.filter(col("vec_id") < 10)
    // the exact baseline feeds all nine union branches — materialize its
    // |Q|·k rows once (within-query lineage cut) instead of paying nine
    // brute-force corpus passes, one per branch
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
      .transform(graft.config.Lineage.cut)
    def hits(name: String, m: DataFrame) =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"))
    hits("ivf", Similarity.ivfTopK(e, q, 5))
      .unionAll(hits("ivf_nprobe", Similarity.ivfNprobeTopK(e, q, 5, 2)))
      .unionAll(hits("ivf_pq", Similarity.ivfPqTopK(e, q, 5)))
      .unionAll(hits("lsh", Similarity.lshTopK(e, q, 5, Planes)))
      .unionAll(hits("lsh_multiprobe", Similarity.lshMultiProbeTopK(e, q, 5, Planes)))
      .unionAll(hits("pq", Similarity.pqTopK(e, q, 5)))
      .unionAll(hits("sq8", Similarity.sq8TopK(e, q, 5)))
      .unionAll(hits("ivf_sq8", Similarity.ivfSq8TopK(e, q, 5)))
      .unionAll(hits("ivf_sq8_nprobe", Similarity.ivfSq8NprobeTopK(e, q, 5, 2)))
      .orderBy("method")
  }

  /** NN-DESCENT graph ANN with measured recall (the graph-family rung
    * the r8 verdict listed as the optional gap next to IVF/PQ/LSH): the
    * deterministic ring-initialized k-NN graph is refined by 2
    * neighbor-of-neighbor rounds ([[Similarity.nnDescent]]), and the
    * output grades the descent itself — per probe query, exact-top-k
    * overlap of the INITIAL graph vs the REFINED graph (hits_final ≫
    * hits_init is the operator working). Fully deterministic, so the
    * DuckDB twin replays both graphs exactly. */
  private val annNnDescentRecall: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    // feeds both grade joins — one brute-force pass, not two
    val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 8)
      .select("q_id", "n_id")
      .transform(graft.config.Lineage.cut)
    def hits(g: DataFrame, name: String) = g
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("n_id"))
      .join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as(name))
    // the seeded init graph feeds BOTH sides of the grade — compute it
    // once (within-query lineage cut, the bandSweep discipline) instead
    // of re-deriving it under the 4-round descent
    val init = Similarity.nnDescent(e, 8, 0, Some(Planes))
      .transform(graft.config.Lineage.cut)
    e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"))
      .join(hits(init, "hits_init"), Seq("q_id"), "left")
      .join(hits(Similarity.nnDescentFrom(e, init, 8, 4), "hits_final"),
        Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits_init"), lit(0L)).as("hits_init"),
        coalesce(col("hits_final"), lit(0L)).as("hits_final"))
      .orderBy("q_id")
  }

  /** The QUERY half of the graph-ANN pair: beam search over the
    * NN-Descent graph ([[Similarity.graphBeamSearch]]) — per hop each
    * query expands its beam through the prebuilt adjacency and keeps the
    * `beam` best by exact cosine; the corpus is never scanned (per-query
    * cost O(beam·k·hops), corpus-size-independent — the production
    * search shape). Output: per probe, beam results found + exact-top-5
    * overlap. */
  private val annGraphSearch: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val g = Similarity.nnDescent(e, 8, 4, Some(Planes))
    // the beam result feeds the n_found agg AND the overlap join — one
    // search, not two (within-query lineage cut; |Q|·k rows)
    val res = Similarity.graphBeamSearch(e, g, e.filter(col("vec_id") < 10),
      k = 5, beam = 8, hops = 3)
      .transform(graft.config.Lineage.cut)
    val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 5)
      .select("q_id", "n_id")
    val overlap = res.select("q_id", "n_id")
      .join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    res.groupBy("q_id").agg(count(lit(1)).as("n_found"))
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"), col("n_found"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy("q_id")
  }

  private val annIvf: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** Multi-cell probing at nprobe=2 over the same medoid index — the
    * standard FAISS recall lever (probe the 2 nearest cells, exact
    * re-rank inside them). */
  private val annIvfNprobe: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfNprobeTopK(e, e.filter(col("vec_id") < 10), 5, 2)
      .orderBy("q_id", "rank")
  }

  private val annPq: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.pqTopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** The production PQ path: codebook from the deterministic sampled
    * k-means trainer instead of the medoid stand-in. The oracle twin
    * re-runs the SAME training as a recursive CTE (fixed sample, first-ksub
    * init, 10 iterations, first-min ties, vec_id-ordered accumulation) —
    * bit-equal centroids, so codes/ADC/re-rank all agree exactly. */
  private val annPqTrained: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.pqTopK(e, e.filter(col("vec_id") < 10), 5,
        trained = Some(PqTrainer.trainCodebook(e)))
      .orderBy("q_id", "rank")
  }

  /** The production IVF path: coarse-quantizer cells from the deterministic
    * sampled k-means trainer ([[PqTrainer.trainCodebook]] with m=1 over the
    * full dimension) instead of the per-label medoid. The oracle twin
    * re-runs the SAME training as a recursive CTE (fixed sample, first-16
    * init, 10 iterations, first-min ties, vec_id-ordered accumulation) —
    * bit-equal centroids, so assignment/probe/re-rank agree exactly. */
  private val annIvfTrained: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfTrainedTopK(e, e.filter(col("vec_id") < 10), 5,
        PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0))
      .orderBy("q_id", "rank")
  }

  /** The fully-trained production index: coarse k-means cells AND k-means
    * PQ codewords, both from the bounded-sample deterministic trainer —
    * index construction never scans the corpus. Oracle twin composes the
    * two recursive-CTE trainings. */
  private val annIvfPqTrained: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqTrainedTopK(e, e.filter(col("vec_id") < 10), 5,
        PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0),
        PqTrainer.trainCodebook(e))
      .orderBy("q_id", "rank")
  }

  /** Filtered vector search: top-5 under `label % 3 = 0` — the metadata
    * predicate pre-filters the corpus BEFORE bucketing. */
  private val annFilteredSearch: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.filteredLshTopK(e, e.filter(col("vec_id") < 10), 5, Planes,
        col("label") % 3 === 0)
      .orderBy("q_id", "rank")
  }

  /** HYBRID retrieval — dense + lexical fusion, the shape every modern
    * retrieval stack runs: sign-LSH buckets generate the candidate set
    * (the ANN stage), then each candidate is re-scored by a FUSED rank of
    * vector cosine and lexical token-set Jaccard between the query's and
    * candidate's TEXT (embeddings ⋈ documents on id). The fusion is
    * integer-exact: floor(5000·cos) + jacc_x10000/2 — equal weights on a
    * 0..10000-ish scale, no float accumulation across rows. Candidates
    * stay bucket-bounded (never all-pairs); the text join touches only
    * candidates; ranking is the bounded topk_pairs aggregate. */
  private val annHybridSearch: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val d = documents(s, dir).select(col("doc_id"), col("text"))
    val bucketed = e.withColumn("bucket", Similarity.lshBucket(col("embedding"), Planes))
    val q = broadcast(bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket")))
    val cand = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        Similarity.cosine(col("q_emb"), col("embedding")).as("cos"))
    val scored = cand
      .join(d.select(col("doc_id").as("n_id"), col("text").as("n_text")), "n_id")
      .join(broadcast(d.select(col("doc_id").as("q_id"), col("text").as("q_text"))), "q_id")
      .withColumn("jacc", Dedup.jaccardX10000(TextAnalysis.tokens(col("q_text")),
        TextAnalysis.tokens(col("n_text"))))
      // integer div — no .5 fractions whose long-cast rounding differs
      // between engines
      .select(col("q_id"), col("n_id"),
        (floor(col("cos") * 5000.0).cast("long") + expr("jacc div 2"))
          .cast("double").as("hybrid"))
    Similarity.rankTopKPublic(scored, 5, "hybrid", asc = false)
      .select(col("q_id"), col("rank"), col("n_id"),
        col("hybrid").cast("long").as("hybrid_x10000"))
      .orderBy("q_id", "rank")
  }

  /** Persisted filtered search: bucketed index partitioned by label —
    * the predicate prunes DIRECTORIES before any row is read; results
    * identical to ann_filtered_search (shared oracle). */
  private val annFilteredPersisted: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.filteredPersistedLshTopK(e, e.filter(col("vec_id") < 10), 5,
        Planes, "label", col("label") % 3 === 0, indexSlot("lshlabel", dir))
      .orderBy("q_id", "rank")
  }

  /** Embedding DRIFT monitor: per-cluster centroid shift between two
    * epochs (vec_id halves) — the distribution-shift check a production
    * embedding pipeline runs on every refresh. Per epoch and cluster the
    * mean is exact (integer-quantized component sums ÷ count); the shift
    * is the cosine between the two epoch means. Bounded output (K rows);
    * the heavy work is one map-side-combined vector_sum_long agg per
    * epoch. */
  private val embDrift: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val cents = PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val half = e.agg(max("vec_id")).head().getLong(0) / 2
    def epochMeans(pred: org.apache.spark.sql.Column) =
      Similarity.kmeansAssign(e.filter(pred), cents)
        .select(col("cluster"),
          // floor (not round) — no half-tie semantics to match cross-engine
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000.0) as long))")
            .as("q"))
        .groupBy("cluster")
        .agg(call_function("vector_sum_long", col("q")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cluster"),
          expr("transform(s, x -> cast(x as double) / (n * 10000.0))").as("mean"),
          col("n"))
    val e1 = epochMeans(col("vec_id") <= half)
      .select(col("cluster"), col("mean").as("m1"), col("n").as("n1"))
    val e2 = epochMeans(col("vec_id") > half)
      .select(col("cluster"), col("mean").as("m2"), col("n").as("n2"))
    e1.join(e2, Seq("cluster"), "inner")
      .select(col("cluster"), col("n1"), col("n2"),
        Similarity.cosine(col("m1"), col("m2")).as("mean_cosine"))
      .orderBy("cluster")
  }

  /** k-means cluster report over the trained coarse centroids: sizes +
    * cohesion (decimal-exact sums) — clustering as its own operator. */
  private val corpusKmeans: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.kmeansReport(e, PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0))
  }

  /** Threshold retrieval at cosine ≥ 0.25, multiprobe-bucket-pruned. */
  private val annRangeSearch: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.rangeSearch(e, e.filter(col("vec_id") < 10), 0.25, Planes)
      .orderBy("q_id", "n_id")
  }

  /** One STABLE index slot per (kind, sf dir) — overwrite-rewritten per
    * build, so repeated bench/verify invocations reuse the slot instead
    * of accumulating a fresh temp directory per call. */
  private def indexSlot(kind: String, dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-ivf-index",
      s"$kind-${java.lang.Integer.toHexString(dir.hashCode)}").toString

  /** Build-once/probe-many IVF: the index persists as a parquet table
    * partitioned by cell; the probe scans only its inverted lists. */
  private val annIvfPersisted: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPersistedTopK(e, e.filter(col("vec_id") < 10), 5,
        indexSlot("ivf", dir))
      .orderBy("q_id", "rank")
  }

  /** Build-once/probe-many for the FULL compressed index: 8-byte PQ codes
    * persisted partitioned by cell; probes pay partition-pruned code
    * scans + an nCand-bounded exact re-rank. */
  private val annIvfPqPersisted: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqPersistedTopK(e, e.filter(col("vec_id") < 10), 5,
        indexSlot("ivfpq", dir))
      .orderBy("q_id", "rank")
  }

  /** nprobe=2 over the compressed code lists — both recall/cost levers of
    * the production index composed. */
  private val annIvfPqNprobe: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqNprobeTopK(e, e.filter(col("vec_id") < 10), 5, 2)
      .orderBy("q_id", "rank")
  }

  /** Multi-probe residual IVF+PQ: per-probed-cell LUTs (the residual ADC
    * distance depends on the probed cell's centroid — FAISS's per-list
    * LUT semantics). */
  private val annIvfPqResidualNprobe: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqResidualNprobeTopK(e, e.filter(col("vec_id") < 10), 5, 2)
      .orderBy("q_id", "rank")
  }

  /** The COMPLETE production index: trained coarse + trained PQ codebook,
    * codes persisted partitioned by cell, nprobe=2 probing. */
  private val annIvfPqFull: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqFullTopK(e, e.filter(col("vec_id") < 10), 5,
        PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0),
        PqTrainer.trainCodebook(e), indexSlot("ivfpqfull", dir), nprobe = 2)
      .orderBy("q_id", "rank")
  }

  private val annIvfPq: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** Residual IVF+PQ with both quantizers trained — the FAISS production
    * default, sample-bounded training end-to-end. */
  private val annIvfPqResidualTrained: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqResidualTrainedTopK(e, e.filter(col("vec_id") < 10), 5,
        PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0))
      .orderBy("q_id", "rank")
  }

  private val annIvfPqResidual: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    Similarity.ivfPqResidualTopK(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  // ------------------------------------------------------ text analysis

  private val textTokens: Q = (s, dir) =>
    documents(s, dir).select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("ws_tokens"),
      TextAnalysis.reTokenCount(col("text")).as("re_tokens"))
      .orderBy("doc_id")

  private val textQuality: Q = (s, dir) =>
    documents(s, dir).select(
      col("doc_id") +: col("n_chars") +: TextAnalysis.qualityCols(col("text")): _*)
      .orderBy("doc_id")

  private val textLangid: Q = (s, dir) =>
    documents(s, dir).select(col("doc_id"),
      (regexp_count(col("text"), lit("\\bthe\\b")) +
        regexp_count(col("text"), lit("\\band\\b"))).cast("long").as("en_markers"),
      TextAnalysis.langId(col("text")).as("guess"))
      .orderBy("doc_id")

  /** Distribution-drift report between two corpus slices (en vs zh): for
    * every token frequent enough in the union, the integer log-ratio
    * delta_bits = ilog2((cA+1)·(NB+1)) − ilog2((cB+1)·(NA+1)) — the
    * add-one-smoothed, corpus-size-normalized drift in exact bits (the
    * DSIR/importance-weight quantity as a REPORT instead of a weight).
    * Top-20 by (|delta| desc, token asc) — both ends of the report are the
    * tokens that most distinguish the slices. */
  private val textDomainDrift: Q = (s, dir) => {
    val toks = TextAnalysis.tokenRows(
        documents(s, dir).filter(col("lang").isin("en", "zh")))
      .join(documents(s, dir).select(col("doc_id"), col("lang")), "doc_id")
    val counts = toks.groupBy("tok")
      .agg(count_if(col("lang") === "en").as("c_en"),
        count_if(col("lang") === "zh").as("c_zh"))
    val totals = toks.agg(
      count_if(col("lang") === "en").as("n_en"),
      count_if(col("lang") === "zh").as("n_zh"))
    def ilog2(c: org.apache.spark.sql.Column) = (length(bin(c)) - 1).cast("long")
    counts.crossJoin(totals)
      .filter(col("c_en") + col("c_zh") >= 10)
      .select(col("tok"), col("c_en"), col("c_zh"),
        (ilog2((col("c_en") + 1) * (col("n_zh") + 1)) -
          ilog2((col("c_zh") + 1) * (col("n_en") + 1))).as("delta_bits"))
      .orderBy(abs(col("delta_bits")).desc, col("tok"))
      .limit(20)
  }

  private val textFingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprintRows(documents(s, dir)).orderBy("doc_id")

  /** Gopher repetition filters; every 10th doc self-concatenated so the
    * intra-doc duplicate-gram signal is non-trivial. */
  private val textRepetition: Q = (s, dir) => {
    val docs = documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 10 === 0, concat_ws(" ", col("text"), col("text")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.repetitionStats(docs).orderBy("doc_id")
  }

  /** Unigram-LM (CCNet-style) corpus-trained quality scoring — integer
    * surprisal bits, vocab never collected. */
  private val textUnigramLm: Q = (s, dir) =>
    TextAnalysis.unigramLmScore(documents(s, dir)).orderBy("doc_id")

  /** Bigram-LM (contextual) quality scoring — integer conditional
    * surprisal bits, bigram table never collected. */
  private val textBigramLm: Q = (s, dir) =>
    TextAnalysis.bigramLmScore(documents(s, dir)).orderBy("doc_id")

  /** Exact top-30%-by-quality selection via the bounded-integer score
    * histogram — no global sort. (The synthetic corpus is score-degenerate
    * — most docs share one surprisal value — so the boundary bucket
    * dominates here, which EXERCISES the threshold-inclusive contract;
    * the spec shows exact-fraction selection on a score-diverse corpus.) */
  private val corpusSelectTopQuality: Q = (s, dir) =>
    TextAnalysis.selectTopQuality(documents(s, dir), pct = 30).orderBy("doc_id")

  /** mT5-style temperature sampling (α=0.5): per-domain keep rates flatten
    * the mixture toward √count; content-hash bucket decision. */
  private val corpusTemperatureSample: Q = (s, dir) =>
    TextAnalysis.temperatureSample(documents(s, dir)).orderBy("doc_id")

  /** Cross-epoch Bloom pre-filter: standing corpus summarized once as a
    * 16384-bit Bloom (one bounded aggregate); the arriving epoch (planted:
    * exact copies of every 25th doc + fresh suffixed docs) tests
    * membership row-locally; only hits reach the exact join. */
  private val dedupBloomPrefilter: Q = (s, dir) => {
    val d = documents(s, dir).select("doc_id", "text")
    val epoch = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000000).as("doc_id"),
        concat(col("text"), lit(Suffix)).as("text"))
      .unionAll(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000000).as("doc_id"), col("text")))
    Dedup.bloomPrefilter(epoch, d).orderBy("doc_id")
  }

  /** Planted "reference domain" for the quality classifier: every 5th doc
    * is the weak-positive class, suffixed with stopword-rich text so the
    * stop-ratio feature carries real signal (the synthetic corpus's lang
    * tags all draw from one shared vocabulary, so — like the dedup keys'
    * planted duplicates — the domain label must be planted to be
    * learnable). */
  private val StopSuffix =
    " the of and to in is the of and to in is the of"

  private def classifierCorpus(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(StopSuffix)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 5 === 0, 1L).otherwise(0L).as("y"))

  /** Closed-form least-squares quality classifier (train + score in one
    * key): ONE normal-equations aggregate (14 exact integer sums) → 4×4
    * Cramer solve on the driver → weights as plan literals → narrow
    * scoring projection. The oracle re-derives the weights from the SAME
    * integer sums through the SAME pinned cofactor expansion. */
  private val corpusQualityClassifier: Q = (s, dir) => {
    val d = classifierCorpus(s, dir)
    Selection.scoreQuality(d, Selection.trainQualityLsq(d)).orderBy("doc_id")
  }

  /** Calibration curve of the quality classifier: documents bucketed by
    * score decile (clamped — the LPM score can leave [0,1]), per-bin count
    * and planted-positive rate in ppm. A well-calibrated bin-0.7 should
    * run ~70% positive; the reliability diagram is how a selection
    * pipeline decides whether classifier scores can be USED as keep
    * probabilities (DSIR-style) or only as a ranking. Bin edges are
    * floor(score·10) over the bit-equal pinned score, so binning is
    * engine-exact. */
  private val classifierCalibration: Q = (s, dir) => {
    val d = classifierCorpus(s, dir)
    Selection.scoreQuality(d, Selection.trainQualityLsq(d))
      .withColumn("bin",
        greatest(lit(0L), least(lit(9L), floor(col("score") * 10).cast("long"))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_ppm", expr("n_pos * 1000000 div n"))
      .orderBy("bin")
  }

  /** Measured holdout accuracy of the quality classifier — the accuracy
    * axis as a first-class oracle-checked key (the classifier twin of
    * `ann_recall`/`dedup_recall`): 2-fold content-hash cross-validation
    * (train one half, score the other — leakage-safe by the same bucket
    * discipline as corpus_split), confusion counts per fold. */
  private val classifierHoldoutAccuracy: Q = (s, dir) => {
    val d = classifierCorpus(s, dir)
      .withColumn("bucket", TextAnalysis.contentBucket(md5(col("text"))))
    def fold(f: Int): DataFrame = {
      val isTrain = if (f == 0) col("bucket") < 50 else col("bucket") >= 50
      val w = Selection.trainQualityLsq(d.filter(isTrain))
      Selection.scoreQuality(d.filter(!isTrain), w)
        .agg(
          count(lit(1)).as("n_scored"),
          sum(when(col("pred") === (col("label") === 1L), 1L).otherwise(0L))
            .as("n_correct"),
          sum(when(col("pred") && col("label") === 1L, 1L).otherwise(0L))
            .as("true_pos"),
          sum(when(col("pred") && col("label") === 0L, 1L).otherwise(0L))
            .as("false_pos"))
        .select(lit(f.toLong).as("fold"), col("n_scored"), col("n_correct"),
          col("true_pos"), col("false_pos"))
    }
    fold(0).unionAll(fold(1)).orderBy("fold")
  }

  /** Selection-centric pipeline composition — the GPT-3-style "keep what
    * looks like the reference domain, then flatten the mixture" chain:
    * classifier gate (trained on the full corpus, one normal-equations
    * agg) → temperature sampling over the surviving domain mix. One
    * disposition row per input doc (classifier_drop / sampled_out /
    * kept + the classifier score) — the ablation-log shape of
    * corpus_pipeline_e2e applied to the model-based selection stages.
    * Stage costs shrink monotonically: scoring is narrow over everything,
    * domain counts aggregate only survivors, the sample decision is a
    * narrow filter. */
  private val corpusSelectPipeline: Q = (s, dir) => {
    val d = classifierCorpus(s, dir)
    val w = Selection.trainQualityLsq(d)
    val scored = Selection.scoreQuality(d, w)
      .join(documents(s, dir).select("doc_id", "lang"), "doc_id")
      .join(d.select("doc_id", "text"), "doc_id")
    val kept = scored.filter(col("pred"))
    val sampled = TextAnalysis.temperatureSample(kept)
      .select(col("doc_id"), lit(true).as("t_keep"))
    scored.join(sampled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("score"),
        when(!col("pred"), "classifier_drop")
          .when(col("t_keep").isNull, "sampled_out")
          .otherwise("kept").as("status"))
      .orderBy("doc_id")
  }

  /** Planted target domain for DSIR: every 5th doc carries distinctive
    * reference-corpus tokens absent from the base vocabulary, so the
    * hashed-unigram likelihood ratio separates. */
  private val DsirSuffix =
    " wikipedia encyclopedia citation reference verifiable notable"

  private def dsirCorpus(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(DsirSuffix)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 5 === 0, 1L).otherwise(0L).as("y"))

  /** DSIR importance weights in exact integer bits: hashed-unigram
    * target-vs-raw likelihood ratio per bucket (bounded model, collected
    * once as plan literals), summed per doc. */
  private val corpusDsirImportance: Q = (s, dir) =>
    Selection.dsirBits(dsirCorpus(s, dir)).orderBy("doc_id")

  /** TF-IDF top-3 keywords per doc, ranked via the bounded topk_pairs
    * aggregate (integer idf bits, md5-prefix term keys). */
  private val textTfidfTopk: Q = (s, dir) =>
    TextAnalysis.tfidfTopK(documents(s, dir), 3).orderBy("doc_id", "rank")

  /** Count-Min heavy hitters: exact top-20 tokens vs their 4×64 integer
    * sketch estimates. */
  private val textCmsHeavyHitters: Q = (s, dir) =>
    TextAnalysis.cmsHeavyHitters(documents(s, dir))
      .orderBy(desc("exact"), asc("tok"))

  /** HyperLogLog distinct-token estimate vs exact: the cardinality sketch
    * next to CMS's frequency sketch, all register math oracle-exact. */
  private val textHllDistinct: Q = (s, dir) =>
    TextAnalysis.hllDistinct(documents(s, dir))

  /** Cross-doc duplicated 8-token spans at stride 4 over the planted-dup
    * corpus — the distributed stand-in for exact substring dedup. */
  private val dedupSpanExact: Q = (s, dir) =>
    Dedup.spanDupStats(dupCorpus(s, dir)).orderBy("doc_id")

  /** BPE merge-table training on the full corpus at a 64-merge vocabulary:
    * ONE distributed histogram job + the driver merge loop — wall-time
    * sublinear in merge count (the round-per-job loop survives only as the
    * spec cross-check). */
  private val textBpeTrain: Q = (s, dir) => {
    import s.implicits._
    graft.ext.BpeTrainer.train(documents(s, dir), merges = 64).zipWithIndex
      .map { case ((p1, p2, n), i) => (i + 1L, p1, p2, n) }
      .toDF("rank", "p1", "p2", "n").orderBy("rank")
  }

  /** Token counting under the trained 64-merge BPE: the codegen'd
    * `bpe_apply` loop runs over the distinct-word vocabulary, the token
    * stream only joins on the word. */
  private val textBpeTokens: Q = (s, dir) => {
    val docs = documents(s, dir)
    graft.ext.BpeTrainer
      .tokenCounts(docs, graft.ext.BpeTrainer.train(docs, merges = 64))
      .orderBy("doc_id")
  }

  /** The per-document curation report: every quality signal the round-5
    * surface computes, assembled into ONE wide disposition table — the
    * ablation log a data team keeps alongside the cleaned corpus. Each
    * signal is an independent aggregation joined back on doc_id (all
    * high-cardinality, all map-side combined); signals that omit rows
    * (contamination) coalesce to zero. */
  private val corpusCurationReport: Q = (s, dir) => {
    val docs = documents(s, dir)
    val quality = TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), col("reason"), col("keep"))
    val rep = TextAnalysis.repetitionStats(docs)
      .select(col("doc_id"), col("dup3_x10000"), col("top2_x10000"))
    val lm = TextAnalysis.unigramLmScore(docs)
      .select(col("doc_id"), col("surprisal_x100"))
    val contam = Contamination
      .contaminatedDocs(docs, docs.filter(col("doc_id") % 100 === 0))
    docs.select("doc_id", "lang")
      .join(quality, "doc_id")
      .join(rep, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("reason"), col("keep"),
        col("dup3_x10000"), col("top2_x10000"), col("surprisal_x100"),
        coalesce(col("hits"), lit(0L)).as("contam_hits"))
      .orderBy("doc_id")
  }

  /** Gate-composed corpus filter: a document survives only if it passes
    * EVERY round-5 signal (quality gate, repetition ≤ 50%, surprisal
    * sanity bound, zero benchmark contamination); survivors get the
    * leakage-safe content-hash split. The executable form of the
    * curation report — same per-signal aggregations, one AND. */
  private val corpusFilterPipeline: Q = (s, dir) => {
    val docs = documents(s, dir)
    val q = TextAnalysis.qualityFilter(docs).select(col("doc_id"), col("keep"))
    val rep = TextAnalysis.repetitionStats(docs)
      .select(col("doc_id"), col("dup3_x10000"))
    val lm = TextAnalysis.unigramLmScore(docs)
      .select(col("doc_id"), col("surprisal_x100"))
    val contam = Contamination
      .contaminatedDocs(docs, docs.filter(col("doc_id") % 100 === 0))
      .select(col("doc_id"), col("hits"))
    val bucket = TextAnalysis.contentBucket(md5(col("text")))
    docs.select(col("doc_id"), col("text"))
      .join(q, "doc_id")
      .join(rep, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .filter(col("keep") &&
        coalesce(col("dup3_x10000"), lit(0L)) <= 5000 &&
        coalesce(col("surprisal_x100"), lit(0L)) <= 2000 &&
        col("hits").isNull)
      .select(col("doc_id"), bucket.as("bucket"),
        TextAnalysis.splitFor(bucket).as("split"))
      .orderBy("doc_id")
  }

  /** Mixture rebalancing to target proportions: zh deliberately over-target
    * (its rate caps at 100%), en downsampled. */
  private val corpusMixDomains: Q = (s, dir) =>
    TextAnalysis.mixToTargets(documents(s, dir),
      Map("en" -> 30, "zh" -> 50, "de" -> 10, "es" -> 5, "fr" -> 5),
      budgetTokens = 20000L)
      .orderBy("doc_id")

  private val dedupKeepCanonical: Q = (s, dir) =>
    Dedup.keepCanonicalLsh(dupCorpus(s, dir)).orderBy("doc_id")

  private val corpusQualityFilter: Q = (s, dir) =>
    TextAnalysis.qualityFilter(documents(s, dir)).orderBy("doc_id")

  /** Benchmark decontamination: docs sharing an 8-gram with the probe set
    * (every 100th doc stands in for the benchmark). The synthetic corpus
    * has no organic cross-doc verbatim 8-gram, so a fixed 8-token phrase is
    * PLANTED on every 50th doc — half of those (doc_id % 100 == 0) are
    * probes, the other half (doc_id % 100 == 50) become true contamination
    * the oracle must also find (r9 verdict: the un-planted key passed with
    * 0 oracle rows, leaving the positive path oracle-unexercised). The
    * plant tokens are outside the corpus vocabulary so each planted doc
    * collides on exactly the grams both engines can count identically. */
  private val corpusDecontaminate: Q = (s, dir) => {
    val docs = documents(s, dir)
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 50 === 0,
        concat(col("text"), lit(" " + ContaminationPlant))).otherwise(col("text"))
        .as("text"))
    Contamination.contaminatedDocs(planted,
      planted.filter(col("doc_id") % 100 === 0))
      .orderBy("doc_id")
  }

  /** 8 tokens deliberately outside the synthetic corpus vocabulary. */
  private val ContaminationPlant =
    "qleak0 qleak1 qleak2 qleak3 qleak4 qleak5 qleak6 qleak7"

  private val corpusStratifiedSample: Q = (s, dir) =>
    TextAnalysis.stratifiedSample(documents(s, dir), Map("en" -> 20), defaultRate = 50)
      .orderBy("doc_id")

  /** PII scrubbing over a corpus with planted identifiers (every 7th doc
    * gains an email + phone + SSN + IPv4): per-category counts + redacted
    * digest, all row-local. */
  private val corpusRedactPii: Q = (s, dir) => {
    val planted = documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-123-4567 ssn 123-45-6789 ip 10.0.42.7")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.redactPii(planted).orderBy("doc_id")
  }

  /** Text normalization — the step that runs BEFORE every content hash in
    * a real crawl pipeline: Unicode NFC (via the codegen'd `nfc_normalize`
    * expression — Spark has no builtin) + whitespace collapse + trim. The
    * corpus plants decomposed accents (e + U+0301 etc.) and messy spacing
    * on every 4th doc; the output pins that NFC actually composed them
    * (char count shrinks, md5 of the composed form matches the oracle's
    * nfc_normalize). Pure row-local projection, exchange-free. */
  private val corpusNormalizeText: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val planted = documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        // DECOMPOSED plants (e+U+0301, A+U+030A) — the byte sequences NFC
        // must compose; a precomposed literal would make the key vacuous
        concat(lit("  cafe\u0301 A\u030Abo  "), col("text"), lit("  ")))
        .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"),
        length(col("text")).cast("long").as("len_raw"),
        call_function("nfc_normalize",
          trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
      .select(col("doc_id"), col("len_raw"),
        length(col("norm")).cast("long").as("len_norm"),
        md5(col("norm")).as("norm_md5"))
      .orderBy("doc_id")
  }

  /** The embedding-side composed pipeline: chunk → hashed-BoW embed →
    * sign-LSH bucketed semantic dedup → per-chunk disposition. */
  private val corpusEmbedPipeline: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    EmbedPipeline.semanticChunkDedup(documents(s, dir))
  }

  /** Overlapping 64-token context windows at stride 48 — the chunking
    * step of an embedding/retrieval pipeline. */
  private val corpusChunk: Q = (s, dir) =>
    TextAnalysis.chunkDocs(documents(s, dir)).orderBy("doc_id", "chunk_id")

  /** Chunk-level dedup: identical 64-token context windows collapse to
    * one canonical chunk (RAG corpora embed boilerplate once). */
  private val corpusChunkDedup: Q = (s, dir) =>
    Dedup.chunkDedup(documents(s, dir)).orderBy("doc_id", "chunk_id")

  /** Multi-line corpus for line dedup: each doc reshaped into 8-token
    * lines, plus a planted boilerplate footer on every 3rd doc (the
    * cookie-banner case line dedup exists for). The tiny synthetic vocab
    * also yields natural cross-doc duplicate lines. */
  private def lineCorpus(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val lines = transform(sequence(lit(0), ((size(toks) - 1) / 8).cast("int")),
      i => concat_ws(" ", slice(toks, i * 8 + 1, lit(8))))
    documents(s, dir).select(col("doc_id"),
      concat(array_join(lines, "\n"),
        when(col("doc_id") % 3 === 0,
          lit("\nsubscribe to the newsletter today")).otherwise(lit("")))
        .as("text"))
  }

  /** C4-style corpus-wide line dedup: every duplicated line keeps only
    * its first occurrence; docs re-assembled from surviving lines. */
  private val corpusLineDedup: Q = (s, dir) =>
    TextAnalysis.lineDedup(lineCorpus(s, dir)).orderBy("doc_id")

  private val embRandomProjection: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Embeddings.randomProjection(embeddings(s, dir)).orderBy("vec_id")
  }

  /** dupCorpus with the lang column carried through (copies inherit it) —
    * the e2e pipeline's quality gate needs it. */
  private def dupCorpusLang(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select("doc_id", "text", "lang")
    d.unionAll(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000000).as("doc_id"),
          concat(col("text"), lit(Suffix)).as("text"), col("lang")))
      .unionAll(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000000).as("doc_id"), col("text"), col("lang")))
  }

  private val corpusPipelineE2e: Q = (s, dir) =>
    graft.ext.CorpusPipeline.run(dupCorpusLang(s, dir)).orderBy("doc_id")

  private val corpusPackBins: Q = (s, dir) =>
    TextAnalysis.packBins(documents(s, dir), budgetTokens = 2048, shards = 8)
      .orderBy("doc_id")

  private val corpusSplit: Q = (s, dir) =>
    TextAnalysis.hashSplit(documents(s, dir)).orderBy("doc_id")

  private val textVocabTopk: Q = (s, dir) =>
    TextAnalysis.vocabTopK(documents(s, dir), 100)

  // -------------------------------------------------------- embeddings

  private val embQuantizeInt8: Q = (s, dir) =>
    Embeddings.quantizeInt8(embeddings(s, dir)).orderBy("vec_id")

  private val embNormalize: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Embeddings.normalizeScaled(embeddings(s, dir)).orderBy("vec_id")
  }

  /** Distributed exact second-moment matrix: one vector_sum_long partial/
    * final aggregation, shuffle = one d² vector per partition. */
  private val embGram: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Embeddings.gramMatrix(embeddings(s, dir)).orderBy("j", "l")
  }

  /** Full-corpus-trained PCA projection: exact integer moments → driver
    * power iteration → narrow projection with plan-constant components. */
  private val embPca: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    graft.ext.PcaTrainer.pcaProjection(embeddings(s, dir)).orderBy("vec_id")
  }

  /** PCA whitening: the projection variance-normalized by the captured
    * eigenvalues (Mahalanobis-ish preprocessing for cosine dedup/ANN) —
    * same trained-on-everything / narrow-scoring shape as emb_pca. */
  private val embWhiten: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    graft.ext.PcaTrainer.whitenProjection(embeddings(s, dir)).orderBy("vec_id")
  }

  // -------------------------------------------------------- multimodal

  /** Real container-header decode over the synthesized multimodal corpus:
    * PNG IHDR / JPEG SOF0 dimensions parsed structurally from the bytes
    * (spec-verified against ImageIO-encoded files); the oracle re-derives
    * the synthesis closed-form. */
  private val multimodalMeta: Q = (s, dir) =>
    Multimodal.decode(Multimodal.synthBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id")

  /** WAV/RIFF structural audio decode over synthesized PCM containers. */
  private val multimodalAudioMeta: Q = (s, dir) =>
    Multimodal.decodeAudio(Multimodal.synthAudioBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id")

  /** Sample-level PCM feature extraction through the REAL decode path —
    * the oracle re-derives every 16-bit word from the generating text, so
    * the decode is value-checked end to end (not rows-only). */
  private val multimodalAudioEnergy: Q = (s, dir) =>
    Multimodal.decodeAudioFeatures(Multimodal.synthAudioBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id")

  /** Channel sums through the REAL PNG decode — the oracle rebuilds the
    * expected sums from the closed-form (x, y, doc_id) pattern without
    * ever touching a PNG, so the whole encode→decode→reduce path is
    * value-checked. */
  private val multimodalImageStats: Q = (s, dir) =>
    Multimodal.imageStats(Multimodal.synthRealImages(documents(s, dir)))
      .toDF().orderBy("doc_id")

  /** MP4/ISO-BMFF structural video decode (mvhd timescale/duration). */
  private val multimodalVideoMeta: Q = (s, dir) =>
    Multimodal.decodeVideo(Multimodal.synthVideoBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id")

  private val multimodalResize: Q = (s, dir) =>
    Multimodal.resize(Multimodal.asBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id")

  private val multimodalFrames: Q = (s, dir) =>
    Multimodal.frameSample(Multimodal.asBlobs(documents(s, dir)))
      .toDF().orderBy("doc_id", "frame_idx")

  /** REAL pixel decode + nearest-neighbor resize (ImageIO) over a
    * deterministic genuinely-encoded PNG corpus — the pixel-level upgrade
    * of the structural multimodal path. No DuckDB oracle (a SQL engine
    * cannot decode PNG) → the driver records the rows-only check; the
    * cross-engine determinism is spec-pinned instead (ExtSpec). */
  private val multimodalDecodePixels: Q = (s, dir) =>
    Multimodal.decodeResize(Multimodal.synthRealImages(documents(s, dir)))
      .toDF().orderBy("doc_id")

  /** Perceptual-hash image dedup: aHash signatures for each image and its
    * two planted re-entries (2× NN upscale — provably Hamming 0 — and a
    * +8 brightness shift — small distance), with the near-dup verdicts a
    * perceptual bucket join would emit. No DuckDB oracle (SQL cannot
    * decode PNG) → rows-only driver check; the invariance and distance
    * band are spec-pinned (ExtSpec). */
  private val multimodalPhashDedup: Q = (s, dir) => {
    val docs = documents(s, dir).filter(col("doc_id") % 10 === 0)
    def hashes(scale: Int, redOff: Int, name: String) =
      Multimodal.averageHash(
        Multimodal.synthRealImageVariant(docs, scale, redOff))
        .toDF().select(col("doc_id"), col("phash").as(name))
    hashes(1, 0, "h_base")
      .join(hashes(2, 0, "h_up2x"), "doc_id")
      .join(hashes(1, 8, "h_bright"), "doc_id")
      .select(col("doc_id"), col("h_base"),
        expr("bit_count(h_base ^ h_up2x)").cast("long").as("dist_up2x"),
        expr("bit_count(h_base ^ h_bright)").cast("long").as("dist_bright"))
      .withColumn("near_up2x", col("dist_up2x") <= 10)
      .withColumn("near_bright", col("dist_bright") <= 10)
      .orderBy("doc_id")
  }

  /** Edit-distance verification metric over the planted near-dup pairs:
    * the character-level confirmation step LSH candidates feed at the end
    * of a dedup funnel (token Jaccard is blind to within-token edits).
    * Inputs are CAPPED at 256 chars — levenshtein is O(len²) per pair, so
    * production verification always bounds the window; the cap is part of
    * the operator contract, not a shortcut. */
  private val dedupEditDistance: Q = (s, dir) => {
    val L = 256
    val pairs = documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        substring(col("text"), 1, L).as("a"),
        substring(concat(col("text"), lit(Suffix)), 1, L).as("b"))
    val dist = levenshtein(col("a"), col("b"))
    val maxLen = greatest(length(col("a")), length(col("b"))).cast("long")
    pairs.select(col("doc_id"), dist.cast("long").as("dist"),
        ((lit(10000L) * (maxLen - dist)) / maxLen).cast("long").as("sim_x10000"))
      .orderBy("doc_id")
  }

  /** Epoch-over-epoch NEAR-dup admission: the standing corpus's LSH band
    * buckets persist once as a band-partitioned parquet index; the
    * arriving epoch (suffix-mutated twins) signs only itself and probes
    * the index. The near-dup sibling of dedup_bloom_prefilter's
    * exact-hash epoch gate. */
  private val dedupLshIncremental: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val base = documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"))
    val epoch = base.select((col("doc_id") + 100000000L).as("doc_id"),
      concat(col("text"), lit(Suffix)).as("text"))
    Dedup.incrementalLshNewDups(base, epoch, indexSlot("lshinc", dir))
      .orderBy("ida", "idb")
  }

  /** Per-cluster periphery sample: the 3 most peripheral members of each
    * medoid cluster — diversity-keeping selection (the coverage complement
    * of SemDeDup's redundancy pruning). */
  private val corpusDiversitySample: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    Similarity.peripherySample(embeddings(s, dir), 3)
  }

  /** Token-budget selection: top-quality docs until 60% of corpus tokens
    * (banded prefix — no global cumsum task; see
    * [[Selection.selectTokenBudget]]). */
  private val corpusSelectBudget: Q = (s, dir) =>
    Selection.selectTokenBudget(documents(s, dir))

  /** OOV rate vs the corpus top-25 vocabulary (tokenizer coverage). */
  private val textOovRate: Q = (s, dir) =>
    TextAnalysis.oovRate(documents(s, dir))

  /** Shard manifest — the LAST step of a curation pipeline: deterministic
    * content-hash shard assignment (byte-identical docs land in the same
    * shard at any epoch) + the per-shard accounting a dataloader reads
    * (doc/token/char totals). Assignment is a narrow projection; the
    * manifest is one map-side-combined agg onto S cells; at 100 TB the
    * same `shard` column IS the dynamic-partition write key. */
  private val corpusShardManifest: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val shards = 16
    documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("tok_n"),
        (graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 8) % shards)
          .as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("tok_n").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard")
  }

  /** TRAIN/VAL LEAKAGE AUDIT — the check a benchmark-honest pipeline runs
    * after splitting: near-dup pairs that STRADDLE split boundaries.
    * Byte-identical docs can never leak (the split buckets by content
    * hash, so they share a split by construction — that invariant is the
    * first thing this audit proves); the residual risk is near-dups,
    * found with the same banded MinHash chain as dedup_minhash_lsh and
    * joined to each side's split label. Output = the leaking pairs a
    * decontamination pass must break. */
  private val corpusLeakageAudit: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val corpus = dupCorpus(s, dir)
    val pairs = Dedup.minhashLshPairs(corpus)
    val splits = corpus.select(col("doc_id"),
      (graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 8) % 100)
        .as("bucket"))
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
    pairs
      .join(splits.select(col("doc_id").as("ida"), col("split").as("split_a")), "ida")
      .join(splits.select(col("doc_id").as("idb"), col("split").as("split_b")), "idb")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("ida"), col("idb"), col("split_a"), col("split_b"),
        col("jacc_x10000"))
      .orderBy("ida", "idb")
  }

  /** Compression-ratio boilerplate signal with a planted highly-repetitive
    * variant every 8th doc — the cheap model-free quality heuristic. No
    * DuckDB oracle (SQL cannot deflate) → rows-only check; the planted
    * ordering (repetitive ≪ natural) is spec-pinned. */
  private val textCompressionRatio: Q = (s, dir) => {
    val planted = documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 8 === 0,
        concat_ws(" ", Seq.fill(40)(lit("boiler plate row")): _*))
        .otherwise(col("text")).as("text"))
    TextAnalysis.compressionRatio(planted).toDF()
      .withColumn("boilerplate_suspect", col("ratio_x10000") < 2000)
      .orderBy("doc_id")
  }

  /** Token-count histogram in power-of-2 buckets — the length-distribution
    * profile a tokenizer/packing decision reads (know-your-data op).
    * Bucket = floor(log2(tok_n)) via binary-string length (the repo's
    * integer-ilog2 idiom — no float logs); ONE map-side-combined agg onto
    * ≤64 cells. */
  private val corpusTokenHistogram: Q = (s, dir) =>
    documents(s, dir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("tok_n"))
      .select(col("tok_n"), (length(bin(col("tok_n"))) - 1).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("tok_n").as("total_tokens"),
        min("tok_n").as("min_tokens"), max("tok_n").as("max_tokens"))
      .orderBy("bucket")

  /** LSH S-curve sweep over the planted dup corpus: candidate volume vs
    * verified yield at 2/4/8 bands of the same 32-hash signature — the
    * recall/cost knob measured before a full dedup pass commits. */
  private val dedupBandSweep: Q = (s, dir) =>
    Dedup.bandSweep(dupCorpus(s, dir), 32, Seq(2, 4, 8))

  val queries: Map[String, Q] = Map(
    "dedup_band_sweep" -> dedupBandSweep,
    "corpus_token_histogram" -> corpusTokenHistogram,
    "text_compression_ratio" -> textCompressionRatio,
    "corpus_leakage_audit" -> corpusLeakageAudit,
    "multimodal_phash_dedup" -> multimodalPhashDedup,
    "corpus_select_budget" -> corpusSelectBudget,
    "corpus_shard_manifest" -> corpusShardManifest,
    "text_oov_rate" -> textOovRate,
    "dedup_edit_distance" -> dedupEditDistance,
    "dedup_lsh_incremental" -> dedupLshIncremental,
    "corpus_diversity_sample" -> corpusDiversitySample,
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_cluster_components" -> dedupClusters,
    "dedup_cluster_stats" -> dedupClusterStats,
    "dedup_minhash_jaccard_est" -> dedupMinhashJaccardEst,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_containment" -> dedupContainment,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "dedup_cosine_recall" -> dedupCosineRecall,
    "dedup_semantic" -> dedupSemantic,
    "dedup_cross_source" -> dedupCrossSource,
    "dedup_recall" -> dedupRecall,
    "ann_brute_force" -> annBruteForce,
    "ann_lsh" -> annLsh,
    "ann_lsh_multiprobe" -> annLshMultiprobe,
    "ann_knn_graph" -> annKnnGraph,
    "ann_filtered_search" -> annFilteredSearch,
    "ann_filtered_persisted" -> annFilteredPersisted,
    "ann_hybrid_search" -> annHybridSearch,
    "corpus_kmeans" -> corpusKmeans,
    "emb_drift" -> embDrift,
    "ann_range_search" -> annRangeSearch,
    "ann_recall" -> annRecall,
    "ann_nndescent_recall" -> annNnDescentRecall,
    "ann_graph_search" -> annGraphSearch,
    "ann_ivf" -> annIvf,
    "ann_ivf_nprobe" -> annIvfNprobe,
    "ann_ivf_persisted" -> annIvfPersisted,
    "ann_ivf_trained" -> annIvfTrained,
    "ann_pq" -> annPq,
    "ann_pq_trained" -> annPqTrained,
    "ann_sq8" -> annSq8,
    "ann_ivf_sq8" -> annIvfSq8,
    "ann_ivf_sq8_nprobe" -> annIvfSq8Nprobe,
    "ann_ivf_sq8_persisted" -> annIvfSq8Persisted,
    "ann_ivf_pq" -> annIvfPq,
    "ann_ivf_pq_persisted" -> annIvfPqPersisted,
    "ann_ivf_pq_nprobe" -> annIvfPqNprobe,
    "ann_ivf_pq_residual_nprobe" -> annIvfPqResidualNprobe,
    "ann_ivf_pq_full" -> annIvfPqFull,
    "ann_ivf_pq_trained" -> annIvfPqTrained,
    "ann_ivf_pq_residual" -> annIvfPqResidual,
    "ann_ivf_pq_residual_trained" -> annIvfPqResidualTrained,
    "dedup_keep_canonical" -> dedupKeepCanonical,
    "corpus_quality_filter" -> corpusQualityFilter,
    "corpus_split" -> corpusSplit,
    "corpus_pack_bins" -> corpusPackBins,
    "corpus_decontaminate" -> corpusDecontaminate,
    "corpus_stratified_sample" -> corpusStratifiedSample,
    "corpus_redact_pii" -> corpusRedactPii,
    "corpus_normalize_text" -> corpusNormalizeText,
    "corpus_chunk" -> corpusChunk,
    "corpus_chunk_dedup" -> corpusChunkDedup,
    "corpus_embed_pipeline" -> corpusEmbedPipeline,
    "corpus_line_dedup" -> corpusLineDedup,
    "corpus_pipeline_e2e" -> corpusPipelineE2e,
    "text_vocab_topk" -> textVocabTopk,
    "emb_quantize_int8" -> embQuantizeInt8,
    "emb_normalize" -> embNormalize,
    "emb_gram" -> embGram,
    "emb_pca" -> embPca,
    "emb_whiten" -> embWhiten,
    "emb_random_projection" -> embRandomProjection,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_domain_drift" -> textDomainDrift,
    "text_fingerprint" -> textFingerprint,
    "text_repetition" -> textRepetition,
    "text_unigram_lm" -> textUnigramLm,
    "text_bigram_lm" -> textBigramLm,
    "corpus_select_top_quality" -> corpusSelectTopQuality,
    "corpus_quality_classifier" -> corpusQualityClassifier,
    "classifier_calibration" -> classifierCalibration,
    "classifier_holdout_accuracy" -> classifierHoldoutAccuracy,
    "corpus_dsir_importance" -> corpusDsirImportance,
    "corpus_temperature_sample" -> corpusTemperatureSample,
    "corpus_select_pipeline" -> corpusSelectPipeline,
    "dedup_bloom_prefilter" -> dedupBloomPrefilter,
    "text_bpe_train" -> textBpeTrain,
    "text_bpe_tokens" -> textBpeTokens,
    "text_tfidf_topk" -> textTfidfTopk,
    "text_cms_heavy_hitters" -> textCmsHeavyHitters,
    "text_hll_distinct" -> textHllDistinct,
    "dedup_span_exact" -> dedupSpanExact,
    "corpus_mix_domains" -> corpusMixDomains,
    "corpus_curation_report" -> corpusCurationReport,
    "corpus_filter_pipeline" -> corpusFilterPipeline,
    "multimodal_meta" -> multimodalMeta,
    "multimodal_audio_meta" -> multimodalAudioMeta,
    "multimodal_audio_energy" -> multimodalAudioEnergy,
    "multimodal_image_stats" -> multimodalImageStats,
    "multimodal_video_meta" -> multimodalVideoMeta,
    "multimodal_resize" -> multimodalResize,
    "multimodal_decode_pixels" -> multimodalDecodePixels,
    "multimodal_frames" -> multimodalFrames)

  // ------------------------------------------------------ oracle SQL

  /** Sequential left-fold dot product in DuckDB — mirrors Spark's
    * aggregate-over-zip_with bit for bit. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1,65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(x,y) -> x + y)"

  private[queries] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Unrolled NN-Descent CTE chain (`nb0` … `nb$iters`) — the DuckDB twin
    * of [[graft.ext.Similarity.nnDescent]], shared by the build key and
    * the graph-search key. */
  private def nnDescentCtes(k: Int, iters: Int): String = {
    def iterCtes(i: Int): String = {
      val prev = s"nb${i - 1}"
      s"""rev$i AS MATERIALIZED (SELECT n_id AS vec_id, vec_id AS n_id FROM (
         |    SELECT vec_id, n_id,
         |      row_number() OVER (PARTITION BY n_id ORDER BY vec_id) AS rn
         |    FROM $prev) WHERE rn <= $k),
         |und$i AS MATERIALIZED (SELECT vec_id, n_id FROM $prev
         |          UNION SELECT vec_id, n_id FROM rev$i),
         |cand$i AS MATERIALIZED (
         |  SELECT a.vec_id, b.n_id FROM und$i a JOIN und$i b ON a.n_id = b.vec_id
         |  WHERE a.vec_id <> b.n_id
         |  UNION SELECT vec_id, n_id FROM und$i),
         |sc$i AS MATERIALIZED (SELECT c.vec_id, c.n_id,
         |    ${cosSql("e1.embedding", "e2.embedding")} AS sim
         |  FROM cand$i c JOIN embeddings e1 ON e1.vec_id = c.vec_id
         |                JOIN embeddings e2 ON e2.vec_id = c.n_id),
         |nb$i AS MATERIALIZED (SELECT vec_id, n_id FROM (
         |    SELECT vec_id, n_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, n_id) AS rn
         |    FROM sc$i) WHERE rn <= $k)""".stripMargin
    }
    s"""ring AS (
       |  SELECT vec_id,
       |    (vec_id + j) % (SELECT count(*) FROM embeddings) AS n_id
       |  FROM embeddings, range(1, ${k + 1}) r(j)),
       |bk AS MATERIALIZED (SELECT vec_id, ${bucketExpr("embedding")} AS bucket
       |  FROM embeddings),
       |reps AS (SELECT vec_id AS n_id, bucket FROM (
       |    SELECT vec_id, bucket,
       |      row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
       |    FROM bk) WHERE rn <= ${2 * k}),
       |mates AS (SELECT a.vec_id, b.n_id
       |  FROM bk a JOIN reps b USING (bucket) WHERE a.vec_id <> b.n_id),
       |nb0 AS MATERIALIZED (SELECT vec_id, n_id FROM (
       |    SELECT vec_id, n_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY src, n_id) AS rn
       |    FROM (SELECT vec_id, n_id, min(src) AS src FROM (
       |            SELECT vec_id, n_id, 0 AS src FROM mates
       |            UNION ALL SELECT vec_id, n_id, 1 AS src FROM ring)
       |          GROUP BY vec_id, n_id))
       |  WHERE rn <= $k),
       |${(1 to iters).map(iterCtes).mkString(",\n")}""".stripMargin
  }

  /** dims-parameterized twin of [[dotSql]] (that one is pinned to the
    * 64-dim embeddings table). */
  private def dotSqlN(a: String, b: String, n: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1,${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(x,y) -> x + y)"

  private[queries] def cosSqlN(a: String, b: String, n: Int): String =
    s"(${dotSqlN(a, b, n)} / (sqrt(${dotSqlN(a, a, n)}) * sqrt(${dotSqlN(b, b, n)})))"

  /** Shared twin of the filtered-search pair (in-memory and persisted
    * produce identical rows; partition pruning is a plan property). */
  private lazy val AnnFilteredOracle: String =
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${bucketExpr("embedding")} AS bucket
       |  FROM embeddings WHERE label % 3 = 0),
       |q AS (SELECT vec_id AS q_id, embedding AS qe,
       |    ${bucketExpr("embedding")} AS bucket
       |  FROM embeddings WHERE vec_id < 10),
       |scored AS (SELECT q_id, e.vec_id AS n_id,
       |  ${cosSql("qe", "e.embedding")} AS sim
       |  FROM bucketed e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
       |ranked AS (SELECT q_id, n_id, sim,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** Sign-LSH bucket over an n-dim vector with the given plane literals —
    * the [[lshBucketSql]] generalization for the embed-pipeline vectors. */
  private[queries] def lshBucketSqlN(emb: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      val lit = p.map(d => s"CAST($d AS DOUBLE)").mkString("([", ", ", "])")
      s"(CASE WHEN ${dotSqlN(emb, lit, p.length)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of `Similarity.lshBucket(emb, Planes)`: the sign bit of
    * each plane dot (same sequential fold, plane embedded as a literal —
    * Scala's shortest-round-trip Double.toString parses back to the
    * identical double) ORed into a bucket id. Mirroring the bucketing in
    * the oracle keeps the candidate sets structurally identical on ANY
    * corpus — near-identical-but-not-equal vectors straddling a hyperplane
    * drop out of BOTH sides, not just Spark's. */
  private def lshBucketSql(emb: String): String =
    Planes.zipWithIndex.map { case (p, j) =>
      val lit = p.map(d => s"CAST($d AS DOUBLE)").mkString("([", ", ", "])")
      s"(CASE WHEN ${dotSql(emb, lit)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val TokCte =
    """tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corpus)"""

  /** DuckDB twin of Spark's `conv(substring(hx, start, len), 16, 10)`:
    * left fold acc*16 + hexdigit over md5-hex positions [start, start+len). */
  private[queries] def hexFoldSql(start: Int, len: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range($start, ${start + len}), " +
      "j -> CAST(strpos('0123456789abcdef', substr(hx, CAST(j AS INT), 1)) - 1 AS BIGINT))), " +
      "(x,y) -> x*16 + y)"

  private val ShingleCte =
    """sh AS (SELECT doc_id,
      |  CASE WHEN len(t) < 3 THEN []::VARCHAR[]
      |       ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS sg FROM tok)""".stripMargin

  /** DuckDB twin of TextAnalysis.polyHash16 applied to every token. */
  private val HashesCte =
    """hs AS (SELECT doc_id,
      |  list_transform(t, tk -> list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, strlen(tk)+1),
      |        i -> CAST(ascii(substr(tk, CAST(i AS INT), 1)) AS BIGINT))),
      |    (a, c) -> (a*31 + c) % 65536)) AS h FROM tok)""".stripMargin

  /** DuckDB twin of TextAnalysis.simhash16 — bit positions unrolled. */
  private val SimhashExpr: String = (0 until 16).map { j =>
    s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(h, x -> ((x >> $j) % 2)*2 - 1)), (a,b) -> a+b) > 0
       |  THEN ${1L << j} ELSE 0 END""".stripMargin
  }.mkString(" + ")

  private def planeSql(p: Array[Double]): String =
    p.map(_.toString).mkString("[", ",", "]")

  /** DuckDB twin of Similarity.lshBucket over the 6 fixed hyperplanes. */
  private def bucketExpr(v: String): String = Planes.zipWithIndex.map { case (p, j) =>
    s"CASE WHEN ${dotSql(v, planeSql(p))} > 0 THEN ${1L << j} ELSE 0 END"
  }.mkString("(", " + ", ")")

  /** Shared minhash pipeline CTEs ending in `scored(ida, idb, jacc_x10000)`
    * — the DuckDB twin of Dedup.minhashLshPairs before thresholding. */
  private val MinhashScoredCtes: String = s"$CorpusCte,\n$MinhashFromCorpus"

  /** BpeTrainer twin: the recursive merge-training CTE, ending in `bpe`
    * whose iter=`merges` rows hold the fully-merged vocabulary and whose
    * iter=i≥1 rows carry the rule learned at round i (mp1, mp2, mn). */
  private[queries] def BpeCtes(merges: Int): String = {
    val symPat = s"chr(1) || '([^' || chr(2) || ']*)' || chr(2)"
    s"""WITH RECURSIVE w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
       |  GROUP BY w),
       |v0 AS (SELECT w, cnt,
       |  array_to_string(list_transform(range(1, length(w) + 1),
       |    i -> chr(1) || substr(w, CAST(i AS INT), 1) || chr(2)), '') AS s
       |  FROM w0),
       |bpe AS (
       |  SELECT 0 AS iter, w, cnt, s,
       |    CAST(NULL AS VARCHAR) AS mp1, CAST(NULL AS VARCHAR) AS mp2,
       |    CAST(NULL AS BIGINT) AS mn
       |  FROM v0
       |  UNION ALL
       |  SELECT b.iter + 1, b.w, b.cnt,
       |    replace(b.s, chr(1) || t.p1 || chr(2) || chr(1) || t.p2 || chr(2),
       |            chr(1) || t.p1 || t.p2 || chr(2)),
       |    t.p1, t.p2, t.n
       |  FROM bpe b, (
       |    SELECT split_part(pr, chr(3), 1) AS p1,
       |           split_part(pr, chr(3), 2) AS p2, n
       |    FROM (
       |      SELECT pr, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |        SELECT b2.cnt, unnest(list_transform(range(1, len(sy)),
       |          i -> sy[CAST(i AS INT)] || chr(3) || sy[CAST(i + 1 AS INT)])) AS pr
       |        FROM (SELECT cnt, regexp_extract_all(s, $symPat, 1) AS sy
       |              FROM bpe) b2) px
       |      GROUP BY pr)
       |    ORDER BY n DESC, pr LIMIT 1) t
       |  WHERE b.iter < $merges)""".stripMargin
  }

  private val BpeTrainSelect: String =
    """SELECT DISTINCT CAST(iter AS BIGINT) AS rank, mp1 AS p1, mp2 AS p2, mn AS n
      |FROM bpe WHERE iter >= 1 ORDER BY rank""".stripMargin

  /** The per-sub-space k-means recursion (PqTrainer.trainCodebook twin):
    * first-16 init, 10 iterations, first-min ties, vec_id-ordered
    * accumulation — over a `samp(vec_id, m, s)` CTE named `samp`,
    * producing the recursive CTE named `km`. */
  private def pqKmRecursion(samp: String, km: String): String =
    s"""$km AS (
       |  SELECT 0 AS iter, m, CAST(vec_id AS INT) AS j, s AS c
       |  FROM $samp WHERE vec_id < 16
       |  UNION ALL
       |  SELECT o.iter + 1, o.m, o.j, COALESCE(a.mc, o.c)
       |  FROM $km o LEFT JOIN (
       |    SELECT asg.m, asg.bj,
       |      list_transform(range(1, 9), i ->
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(asg.xs, v -> v[i])), (x, y) -> x + y)
       |        / CAST(asg.cnt AS DOUBLE)) AS mc
       |    FROM (
       |      SELECT m, bj, list(s ORDER BY vec_id) AS xs, count(*) AS cnt
       |      FROM (
       |        SELECT d.m, d.vec_id, any_value(d.s) AS s, min(d.j) AS bj
       |        FROM (
       |          SELECT s.m, s.vec_id, s.s, k.j,
       |            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |              list_transform(range(1, 9),
       |                i -> (s.s[i] - k.c[i]) * (s.s[i] - k.c[i]))),
       |              (x, y) -> x + y) AS d
       |          FROM $samp s JOIN $km k ON s.m = k.m) d
       |        JOIN (
       |          SELECT d2.m, d2.vec_id, min(d2.d) AS dmin
       |          FROM (
       |            SELECT s.m, s.vec_id, k.j,
       |              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |                list_transform(range(1, 9),
       |                  i -> (s.s[i] - k.c[i]) * (s.s[i] - k.c[i]))),
       |                (x, y) -> x + y) AS d
       |            FROM $samp s JOIN $km k ON s.m = k.m) d2
       |          GROUP BY d2.m, d2.vec_id) b
       |        ON d.m = b.m AND d.vec_id = b.vec_id AND d.d = b.dmin
       |        GROUP BY d.m, d.vec_id) grp
       |      GROUP BY m, bj) asg
       |    ) a
       |  ON a.m = o.m AND a.bj = o.j
       |  WHERE o.iter < 10
       |)""".stripMargin

  /** Recursive k-means over per-sub-space subvectors of the raw
    * embeddings: fixed sample (vec_id < 256). Ends in `cw(m, j, c)`. */
  private[queries] val PqKmCtes: String =
    s"""ms AS (SELECT unnest(range(0, 8)) AS m),
       |samp AS (SELECT vec_id, m,
       |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
       |  FROM embeddings, ms WHERE vec_id < 256),
       |${pqKmRecursion("samp", "km")},
       |cw AS (SELECT m, j, c FROM km WHERE iter = 10)""".stripMargin

  /** Recursive k-means over FULL 64-dim vectors (trainCodebook with m=1):
    * the coarse-quantizer twin. Ends in `reps(cell, rep)`. */
  /** Shared chunk→vector→angular-bucket CTE chain of the embed
    * pipeline twins, ending in `b(doc_id, chunk_id, chunk_md5, vec,
    * bucket)` — used by corpus_embed_pipeline and the cap-audit
    * receipt key (R11hQueries). */
  private[queries] val EmbedBucketCtes: String = {
    val planes16 = graft.ext.Similarity.hyperplanes(
      graft.ext.EmbedPipeline.MaxPlanes, 16)
    s"""tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
         |  FROM documents),
         |st AS (SELECT doc_id, t, unnest(range(0, (len(t)-1)//24 + 1)) AS s
         |  FROM tok WHERE len(t) > 0),
         |ch AS (SELECT doc_id, CAST(s AS BIGINT) AS chunk_id,
         |    t[s*24+1 : s*24+32] AS c,
         |    md5(array_to_string(t[s*24+1 : s*24+32], ' ')) AS chunk_md5
         |  FROM st),
         |cells AS (SELECT doc_id, chunk_id, chunk_md5,
         |    ${hexFoldSql(1, 15)} % 16 AS dim, count(*) AS c
         |  FROM (SELECT doc_id, chunk_id, chunk_md5, md5(tok) AS hx
         |        FROM (SELECT doc_id, chunk_id, chunk_md5, unnest(c) AS tok
         |              FROM ch))
         |  GROUP BY 1, 2, 3, 4),
         |vecs AS (SELECT doc_id, chunk_id, chunk_md5,
         |    map_from_entries(list({'k': dim, 'v': c})) AS m
         |  FROM cells GROUP BY 1, 2, 3),
         |v AS (SELECT doc_id, chunk_id, chunk_md5,
         |    list_transform(range(0, 16), d ->
         |      CAST(coalesce(list_extract(map_extract(m, d), 1), 0) AS DOUBLE))
         |      AS vec
         |  FROM vecs),
         |np AS (SELECT CAST(1 AS BIGINT) << min(j) AS nb FROM
         |    (SELECT unnest(range(4, ${graft.ext.EmbedPipeline.MaxPlanes + 1})) AS j),
         |    (SELECT count(*) AS n FROM v)
         |  WHERE (n >> j) <= 1024 OR j = ${graft.ext.EmbedPipeline.MaxPlanes}),
         |cv AS (SELECT doc_id, chunk_id, chunk_md5, vec,
         |    list_transform(range(1, 17),
         |      i -> vec[CAST(i AS INT)]
         |        / sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |            list_transform(range(1, 17),
         |              j -> vec[CAST(j AS INT)] * vec[CAST(j AS INT)])),
         |            (x, y) -> x + y))
         |        - ${graft.ext.EmbedPipeline.uniformDirComponent(16)}) AS c16
         |  FROM v),
         |b AS (SELECT doc_id, chunk_id, chunk_md5, vec,
         |    ${lshBucketSqlN("c16", planes16)} % nb AS bucket FROM cv, np)""".stripMargin
  }

  private[queries] val CoarseKmCtes: String = {
    val sqd = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, 65), i -> (s.s[i] - k.c[i]) * (s.s[i] - k.c[i]))), " +
      "(x, y) -> x + y)"
    s"""csamp AS (SELECT vec_id,
       |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS s
       |  FROM embeddings WHERE vec_id < 256),
       |ckm AS (
       |  SELECT 0 AS iter, CAST(vec_id AS INT) AS j, s AS c
       |  FROM csamp WHERE vec_id < 16
       |  UNION ALL
       |  SELECT o.iter + 1, o.j, COALESCE(a.mc, o.c)
       |  FROM ckm o LEFT JOIN (
       |    SELECT asg.bj,
       |      list_transform(range(1, 65), i ->
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(asg.xs, v -> v[i])), (x, y) -> x + y)
       |        / CAST(asg.cnt AS DOUBLE)) AS mc
       |    FROM (
       |      SELECT bj, list(s ORDER BY vec_id) AS xs, count(*) AS cnt
       |      FROM (
       |        SELECT d.vec_id, any_value(d.s) AS s, min(d.j) AS bj
       |        FROM (
       |          SELECT s.vec_id, s.s, k.j, $sqd AS d
       |          FROM csamp s CROSS JOIN ckm k) d
       |        JOIN (
       |          SELECT d2.vec_id, min(d2.d) AS dmin
       |          FROM (
       |            SELECT s.vec_id, k.j, $sqd AS d
       |            FROM csamp s CROSS JOIN ckm k) d2
       |          GROUP BY d2.vec_id) b
       |        ON d.vec_id = b.vec_id AND d.d = b.dmin
       |        GROUP BY d.vec_id) grp
       |      GROUP BY bj) asg
       |    ) a
       |  ON a.bj = o.j
       |  WHERE o.iter < 10
       |),
       |reps AS (SELECT j AS cell, c AS rep FROM ckm WHERE iter = 10)""".stripMargin
  }

  /** Nearest-trained-cell assignment (cosine, ties → lower cell) over a
    * `reps(cell, rep)` CTE. Ends in `assigned(vec_id, ivf_cell)`. */
  private val TrainedAssignIdCte: String =
    s"""assigned AS (
       |  SELECT vec_id, ivf_cell FROM (
       |    SELECT e.vec_id, r.cell AS ivf_cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
       |    FROM embeddings e, reps r) WHERE rn = 1)""".stripMargin

  /** Encode/LUT/ADC/re-rank chain downstream of a `cw(m, j, c)` codebook
    * CTE — the ann_pq twin; with `cellPruned` the ADC join is additionally
    * restricted to the query's cell (the ann_ivf_pq twin). `subExpr` /
    * `subFrom` choose the encoded-vector source (raw embeddings, or a
    * residual CTE); `cellTable` is the (vec_id, ivf_cell) map used by the
    * pruning joins. */
  private def pqDownstreamSql(cellPruned: Boolean,
      subExpr: String = "CAST(embedding[m*8 + i] AS DOUBLE)",
      subFrom: String = "embeddings",
      cellTable: String = "assigned",
      qaTable: String = ""): String = {
    val qaT = if (qaTable.isEmpty) cellTable else qaTable
    val cellJoin =
      if (cellPruned)
        s"""
           |  JOIN $cellTable ca ON ca.vec_id = codes.vec_id
           |  JOIN $qaT qa ON qa.vec_id = dq.q_id AND qa.ivf_cell = ca.ivf_cell""".stripMargin
      else ""
    s"""sub AS (SELECT vec_id, m,
       |    list_transform(range(1, 9), i -> $subExpr) AS s
       |  FROM $subFrom, ms),
       |d2 AS (SELECT s.vec_id, s.m, cw.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
       |      (a, b) -> a + b) AS d
       |  FROM sub s JOIN cw ON s.m = cw.m),
       |codes AS (SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM d2) WHERE rn = 1),
       |dq AS (SELECT vec_id AS q_id, m, j, d FROM d2 WHERE vec_id < 10),
       |adc AS (SELECT dq.q_id, codes.vec_id AS n_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(dq.d ORDER BY dq.m)), (a, b) -> a + b) AS adist
       |  FROM codes JOIN dq ON codes.m = dq.m AND codes.code = dq.j$cellJoin
       |  WHERE codes.vec_id <> dq.q_id GROUP BY 1, 2),
       |cand AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
       |    FROM adc) WHERE arn <= 32),
       |rr AS (SELECT c.q_id, c.n_id,
       |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
       |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
       |              JOIN embeddings nv ON c.n_id = nv.vec_id),
       |ranked AS (SELECT q_id, n_id, sim,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
       |  FROM rr)
       |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  /** The minhash CTE chain over a PRE-EXISTING `corpus(doc_id, text)` CTE —
    * reused by the e2e pipeline key, whose corpus is mid-pipeline. */
  /** The signature-building prefix (corpus tokens → 32-hash minhash sig
    * list `sigl`) shared by the fixed-band pipeline below and the band
    * -curve key's parametric banding. */
  private[queries] lazy val MinhashSigCtes: String =
    s"""$TokCte,
       |$ShingleCte,
       |shx AS (SELECT doc_id, md5(s) AS hx
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM sh)),
       |hashes AS (SELECT doc_id,
       |  ${hexFoldSql(1, 15)} % 1000000007 AS h1m,
       |  ${hexFoldSql(17, 15)} % 1000000007 AS h2m
       |  FROM shx),
       |sigs AS (SELECT doc_id,
       |  ${(0 until 32).map(i => s"min((h1m + $i*h2m) % 1000000007) AS h$i")
            .mkString(", ")}
       |  FROM hashes GROUP BY doc_id),
       |sigl AS (SELECT doc_id,
       |  list_transform([${(0 until 32).map(i => s"h$i").mkString(",")}],
       |    x -> CAST(x AS VARCHAR)) AS sig
       |  FROM sigs)""".stripMargin

  private lazy val MinhashFromCorpus: String =
    s"""$MinhashSigCtes,
       |bands AS (SELECT doc_id, b,
       |  md5(array_to_string(sig[b*8+1 : b*8+8], ',')) AS bucket
       |  FROM sigl, range(0,4) r(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
       |  FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket
       |  WHERE a.doc_id < c.doc_id),
       |ts AS (SELECT doc_id, list_distinct(regexp_split_to_array(text, '\\s+')) AS t FROM corpus),
       |scored AS (SELECT ida, idb,
       |  10000 * len(list_distinct(list_intersect(x.t, y.t)))
       |    // (len(x.t) + len(y.t) - len(list_distinct(list_intersect(x.t, y.t)))) AS jacc_x10000
       |  FROM cand JOIN ts x ON ida = x.doc_id JOIN ts y ON idb = y.doc_id)""".stripMargin

  /** The shared IVF oracle (medoid reps, nearest-cell assignment,
    * in-cell probe + re-rank) — twin of ivfTopK AND ivfPersistedTopK. */
  private val AnnIvfOracle: String =
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, ivf_cell
         |      FROM assigned WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM assigned e JOIN q USING (ivf_cell) WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin

  /** ann_ivf's CTEs with the query probing its top-2 cells (cos desc,
    * ties → lower cell) — the nprobe=2 twin. */
  /** Shared recursive-CTE PCA trainer twin (power iteration + deflation,
    * [[graft.ext.PcaTrainer]]'s pinned fold orders): `comps` carries each
    * component's eigenvector AND its deflation-step eigenvalue `lam`, so
    * both the raw projection (emb_pca) and the whitened one (emb_whiten)
    * derive from one builder. `pExpr` is the per-(vec, comp) value over
    * columns `c` (centered vector), `v` (component), `lam`. */
  private def pcaRecursiveOracle(pExpr: String, outCol: String): String = {
    val fold0 = "list_prepend(CAST(0.0 AS DOUBLE), "
    // w_j: row j of the deflated matrix `a` dotted with v, l-ascending
    def rowDot(j: String) =
      s"list_reduce(${fold0}list_transform(range(1, 65), " +
        s"l -> a[CAST(($j - 1) * 64 + l AS INT)] * v[CAST(l AS INT)])), (x, y) -> x + y)"
    val wList = s"list_transform(range(1, 65), j -> ${rowDot("j")})"
    val nrm = s"sqrt(list_reduce(${fold0}list_transform($wList, x -> x * x)), (x, y) -> x + y))"
    val vNext = s"list_transform($wList, x -> x / $nrm)"
    val lam = s"list_reduce(${fold0}list_transform(range(1, 65), " +
      s"j -> v[CAST(j AS INT)] * ${rowDot("j")})), (x, y) -> x + y)"
    val deflated = s"list_transform(range(0, 4096), i -> a[CAST(i + 1 AS INT)] " +
      s"- ($lam) * v[CAST(i // 64 + 1 AS INT)] * v[CAST(i % 64 + 1 AS INT)])"
    val eNext = "list_transform(range(0, 64), i -> CASE WHEN i = comp + 1 " +
      "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
    s"""WITH RECURSIVE qe AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
       |  FROM embeddings),
       |mom AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM qe),
       |m AS (SELECT list(CAST(sj AS DOUBLE) / n ORDER BY j) AS mean
       |  FROM (SELECT j, sum(q[CAST(j AS INT)]) AS sj
       |        FROM qe, (SELECT unnest(range(1, 65)) AS j) GROUP BY j), mom),
       |gm AS (SELECT list(CAST(gv AS DOUBLE) ORDER BY j, l) AS g
       |  FROM (SELECT j, l, sum(q[CAST(j AS INT)] * q[CAST(l AS INT)]) AS gv
       |        FROM qe, (SELECT unnest(range(1, 65)) AS j),
       |                 (SELECT unnest(range(1, 65)) AS l) GROUP BY j, l)),
       |cov AS (SELECT list_transform(range(0, 4096), i ->
       |    g[CAST(i + 1 AS INT)] / n
       |    - mean[CAST(i // 64 + 1 AS INT)] * mean[CAST(i % 64 + 1 AS INT)]) AS a
       |  FROM gm, m, mom),
       |pca AS (
       |  SELECT 0 AS comp, 0 AS iter,
       |    list_transform(range(0, 64), i -> CASE WHEN i = 0
       |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS v,
       |    a
       |  FROM cov
       |  UNION ALL
       |  SELECT CASE WHEN iter < 20 THEN comp ELSE comp + 1 END,
       |    CASE WHEN iter < 20 THEN iter + 1 ELSE 0 END,
       |    CASE WHEN iter < 20 THEN $vNext ELSE $eNext END,
       |    CASE WHEN iter < 20 THEN a ELSE $deflated END
       |  FROM pca WHERE NOT (comp = 3 AND iter = 20)),
       |comps AS (SELECT comp, v, ($lam) AS lam FROM pca WHERE iter = 20),
       |ctr AS (SELECT vec_id, list_transform(range(1, 65),
       |    j -> CAST(q[CAST(j AS INT)] AS DOUBLE) - mean[CAST(j AS INT)]) AS c
       |  FROM qe, m),
       |p AS (SELECT vec_id, comp,
       |    $pExpr AS pv
       |  FROM ctr, comps)
       |SELECT vec_id, array_to_string(list(CAST(pv AS VARCHAR) ORDER BY comp), ',') AS $outCol
       |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** Quality-classifier twin: exact integer normal-equation sums, Cramer
    * weights via [[Selection.det4Sql]] (the same cofactor expansion the
    * Scala driver solve uses — one source of truth for the IEEE
    * expression tree), then the same left-associated scoring chain. */
  /** Cramer-weight SELECT list shared by every classifier oracle (the
    * [[Selection.det4Sql]] expression tree — one source of truth). */
  private val ClassifierWeightSql: String = {
    val A = IndexedSeq(
      "dn", "d1", "d2", "d3",
      "d1", "d11r", "d12", "d13",
      "d2", "d12", "d22r", "d23",
      "d3", "d13", "d23", "d33r")
    val bvec = IndexedSeq("dy", "d1y", "d2y", "d3y")
    def withB(j: Int): IndexedSeq[String] =
      A.zipWithIndex.map { case (v, idx) => if (idx % 4 == j) bvec(idx / 4) else v }
    val den = Selection.det4Sql(A)
    (0 until 4).map(j => s"(${Selection.det4Sql(withB(j))}) / ($den) AS w$j")
      .mkString(",\n    ")
  }

  /** base + feats CTE bodies: planted stopword-suffix domain, the exact
    * integer features, and the content-hash fold bucket. */
  private val ClassifierFeatsCtes: String =
    s"""base AS (SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || '$StopSuffix'
       |         ELSE text END AS text,
       |    CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM documents),
       |feats AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS x1,
       |    CAST(10000 * len(list_filter(regexp_split_to_array(text, '\\s+'),
       |        t -> t IN ('the','a','of','and','to','in','is')))
       |      // len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS x2,
       |    CAST(10000 * len(regexp_extract_all(text, '[^\\w\\s]'))
       |      // length(text) AS BIGINT) AS x3,
       |    y,
       |    ${hexFoldSql(1, 8)} % 100 AS bucket
       |  FROM (SELECT *, md5(text) AS hx FROM base))""".stripMargin

  /** m/md/w CTE bodies solving the ridge normal equations over `src`. */
  private def classifierSolveCtes(src: String): String =
    s"""m AS (SELECT
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |    CAST(sum(x3) AS BIGINT) AS s3,
       |    CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x1*x2) AS BIGINT) AS s12,
       |    CAST(sum(x1*x3) AS BIGINT) AS s13, CAST(sum(x2*x2) AS BIGINT) AS s22,
       |    CAST(sum(x2*x3) AS BIGINT) AS s23, CAST(sum(x3*x3) AS BIGINT) AS s33,
       |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x1*y) AS BIGINT) AS s1y,
       |    CAST(sum(x2*y) AS BIGINT) AS s2y, CAST(sum(x3*y) AS BIGINT) AS s3y
       |  FROM $src),
       |md AS (SELECT
       |    CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
       |    CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
       |    CAST(s11 + 1 AS DOUBLE) AS d11r, CAST(s12 AS DOUBLE) AS d12,
       |    CAST(s13 AS DOUBLE) AS d13, CAST(s22 + 1 AS DOUBLE) AS d22r,
       |    CAST(s23 AS DOUBLE) AS d23, CAST(s33 + 1 AS DOUBLE) AS d33r,
       |    CAST(sy AS DOUBLE) AS dy, CAST(s1y AS DOUBLE) AS d1y,
       |    CAST(s2y AS DOUBLE) AS d2y, CAST(s3y AS DOUBLE) AS d3y
       |  FROM m),
       |w AS (SELECT
       |    $ClassifierWeightSql
       |  FROM md)""".stripMargin

  private val QualityClassifierOracle: String =
    s"""WITH $ClassifierFeatsCtes,
       |${classifierSolveCtes("feats")},
       |sc AS (SELECT doc_id,
       |    w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
       |       + w3 * CAST(x3 AS DOUBLE) AS score,
       |    y AS label
       |  FROM feats, w)
       |SELECT doc_id, score, score >= 0.5 AS pred, label
       |FROM sc ORDER BY doc_id""".stripMargin

  /** One holdout fold as a complete parenthesized sub-query: train on one
    * content-hash half, score the other, report confusion counts. */
  private def classifierFoldSql(f: Int): String = {
    val trainCond = if (f == 0) "bucket < 50" else "bucket >= 50"
    val scoreCond = if (f == 0) "bucket >= 50" else "bucket < 50"
    s"""(WITH $ClassifierFeatsCtes,
       |tr AS (SELECT * FROM feats WHERE $trainCond),
       |${classifierSolveCtes("tr")},
       |sc AS (SELECT
       |    w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
       |       + w3 * CAST(x3 AS DOUBLE) >= 0.5 AS pred,
       |    y AS label
       |  FROM feats, w WHERE $scoreCond)
       |SELECT CAST($f AS BIGINT) AS fold,
       |  CAST(count(*) AS BIGINT) AS n_scored,
       |  CAST(sum(CASE WHEN pred = (label = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(sum(CASE WHEN pred AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS true_pos,
       |  CAST(sum(CASE WHEN pred AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
       |FROM sc)""".stripMargin
  }

  private val AnnIvfNprobeOracle: String =
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |qprobe AS (
         |  SELECT q_id, qe, ivf_cell FROM (
         |    SELECT e.vec_id AS q_id, e.embedding AS qe, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM assigned e JOIN qprobe q USING (ivf_cell) WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin

  /** redactPii twin generated from the SAME pattern table — counts on the
    * planted text, sequential 'g'-replace for the digest. Patterns live in
    * the Java-regex ∩ RE2 common dialect, so the strings paste verbatim. */
  private val RedactPiiOracle: String = {
    val counts = TextAnalysis.PiiPatterns.map { case (n, p, _) =>
      s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS $n"
    }.mkString(",\n  ")
    val repl = TextAnalysis.PiiPatterns.foldLeft("text") {
      case (e, (_, p, r)) => s"regexp_replace($e, '$p', '$r', 'g')"
    }
    s"""WITH pii AS (SELECT doc_id,
       |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
       |    CAST(doc_id AS VARCHAR) ||
       |    '@example.com or 555-123-4567 ssn 123-45-6789 ip 10.0.42.7'
       |  ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  $counts,
       |  md5($repl) AS redacted_md5
       |FROM pii ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // ---- fixture-backed oracles for the 3 computations DuckDB cannot run
    // natively (deflate / PNG pixel decode / aHash). The fixtures under
    // /root/repo/oracle_fixtures are INDEPENDENT CPython re-computations
    // (zlib + a closed-form replay of the synth pixel pattern) committed as
    // parquet — scripts/gen_oracle_fixtures.py regenerates them in one
    // command if the testdata corpus is ever regenerated. Joining on content
    // md5 (deflate) / doc_id (pixels, phash — the pattern is a pure function
    // of doc_id) makes the join key SF-independent.
    "text_compression_ratio" -> {
      val boiler = Seq.fill(40)("boiler plate row").mkString(" ")
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 8 = 0 THEN '$boiler' ELSE text END AS text
         |  FROM documents),
         |j AS (SELECT p.doc_id, CAST(strlen(p.text) AS BIGINT) AS raw_len,
         |    f.gz_len
         |  FROM planted p
         |  JOIN '/root/repo/oracle_fixtures/deflate.parquet' f
         |    ON md5(p.text) = f.text_md5)
         |SELECT doc_id, raw_len, gz_len,
         |  CAST(CASE WHEN raw_len = 0 THEN 10000
         |       ELSE 10000 * gz_len // raw_len END AS BIGINT) AS ratio_x10000,
         |  (CASE WHEN raw_len = 0 THEN 10000
         |        ELSE 10000 * gz_len // raw_len END) < 2000
         |    AS boilerplate_suspect
         |FROM j ORDER BY doc_id""".stripMargin
    },

    "multimodal_decode_pixels" ->
      """SELECT f.doc_id, f.width, f.height, f.out_w, f.out_h, f.pixel_md5,
        |  f.decodable
        |FROM documents d
        |JOIN '/root/repo/oracle_fixtures/pixels.parquet' f
        |  ON d.doc_id = f.doc_id
        |ORDER BY f.doc_id""".stripMargin,

    "multimodal_phash_dedup" ->
      """SELECT f.doc_id, f.h_base, f.dist_up2x, f.dist_bright, f.near_up2x,
        |  f.near_bright
        |FROM documents d
        |JOIN '/root/repo/oracle_fixtures/phash.parquet' f
        |  ON d.doc_id = f.doc_id
        |WHERE d.doc_id % 10 = 0
        |ORDER BY f.doc_id""".stripMargin,

    // the oracle is the naive single-order cumsum — the banded Spark plan
    // must reproduce it exactly
    "corpus_select_budget" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS tok_n,
        |    n_chars
        |  FROM documents),
        |t AS (SELECT CAST(sum(tok_n) AS BIGINT) AS total FROM d),
        |c AS (SELECT doc_id, tok_n,
        |  CAST(sum(tok_n) OVER (ORDER BY n_chars DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |  FROM d)
        |SELECT doc_id, tok_n, cum_tokens FROM c, t
        |WHERE cum_tokens <= total * 6 // 10
        |ORDER BY cum_tokens""".stripMargin,

    "dedup_band_sweep" -> {
      def jaccSql =
        "10000 * len(list_distinct(list_intersect(x.t, y.t))) // " +
          "(len(x.t) + len(y.t) - len(list_distinct(list_intersect(x.t, y.t))))"
      def cfg(b: Int): String = {
        val r = 32 / b
        s"""bands$b AS (SELECT doc_id, b,
           |  md5(array_to_string(sig[b*$r+1 : b*$r+$r], ',')) AS bucket
           |  FROM sigl, range(0,$b) r(b)),
           |cand$b AS (SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
           |  FROM bands$b a JOIN bands$b c ON a.b = c.b AND a.bucket = c.bucket
           |  WHERE a.doc_id < c.doc_id),
           |agg$b AS (SELECT CAST($b AS BIGINT) AS bands,
           |  CAST($r AS BIGINT) AS rows_per_band,
           |  count(*) AS n_candidates,
           |  COALESCE(CAST(sum(CASE WHEN $jaccSql >= 5000 THEN 1 ELSE 0 END)
           |    AS BIGINT), 0) AS n_verified
           |  FROM cand$b JOIN ts x ON ida = x.doc_id JOIN ts y ON idb = y.doc_id)"""
          .stripMargin
      }
      s"""$MinhashScoredCtes,
         |${cfg(2)},
         |${cfg(8)},
         |agg4 AS (SELECT CAST(4 AS BIGINT) AS bands,
         |  CAST(8 AS BIGINT) AS rows_per_band,
         |  count(*) AS n_candidates,
         |  COALESCE(CAST(sum(CASE WHEN jacc_x10000 >= 5000 THEN 1 ELSE 0 END)
         |    AS BIGINT), 0) AS n_verified FROM scored)
         |SELECT * FROM agg2 UNION ALL SELECT * FROM agg4
         |UNION ALL SELECT * FROM agg8
         |ORDER BY bands""".stripMargin
    },

    // ilog2 bucket via bit_length-of-binary minus leading zeros twin:
    // DuckDB's bit_length(bin()) differs, so use length(lpad-free bin)
    // — floor(log2(n)) = length of n's binary repr minus 1, both engines
    "corpus_token_histogram" ->
      """WITH d AS (
        |  SELECT CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS tok_n
        |  FROM documents),
        |b AS (SELECT tok_n,
        |  CAST(length(bin(tok_n)) - 1 AS BIGINT) AS bucket FROM d)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(sum(tok_n) AS BIGINT) AS total_tokens,
        |  min(tok_n) AS min_tokens, max(tok_n) AS max_tokens
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "corpus_leakage_audit" ->
      s"""$MinhashScoredCtes,
         |sh2 AS (SELECT doc_id, md5(text) AS hx FROM corpus),
         |sp AS (SELECT doc_id,
         |  CASE WHEN ${hexFoldSql(1, 8)} % 100 < 80 THEN 'train'
         |       WHEN ${hexFoldSql(1, 8)} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM sh2)
         |SELECT ida, idb, a.split AS split_a, b.split AS split_b, jacc_x10000
         |FROM scored JOIN sp a ON ida = a.doc_id JOIN sp b ON idb = b.doc_id
         |WHERE jacc_x10000 >= 5000 AND a.split <> b.split
         |ORDER BY ida, idb""".stripMargin,

    "corpus_shard_manifest" ->
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS tok_n,
         |    md5(text) AS hx
         |  FROM documents),
         |b AS (SELECT doc_id, n_chars, tok_n,
         |  ${hexFoldSql(1, 8)} % 16 AS shard FROM h)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(tok_n) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM b GROUP BY 1 ORDER BY shard""".stripMargin,

    "text_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
        |  FROM documents),
        |vc AS (SELECT t FROM (
        |  SELECT t, count(*) AS c FROM tok GROUP BY 1
        |  ORDER BY c DESC, t LIMIT 25)),
        |pd AS (SELECT doc_id, count(*) AS n,
        |  count(CASE WHEN t NOT IN (SELECT t FROM vc) THEN 1 END) AS oov
        |  FROM tok GROUP BY 1)
        |SELECT doc_id, n, oov, 10000 * oov // n AS oov_x10000
        |FROM pd ORDER BY doc_id""".stripMargin,

    "dedup_edit_distance" ->
      s"""WITH pairs AS (
         |  SELECT doc_id, substr(text, 1, 256) AS a,
         |    substr(text || '$Suffix', 1, 256) AS b
         |  FROM documents WHERE doc_id % 20 = 0)
         |SELECT doc_id, CAST(levenshtein(a, b) AS BIGINT) AS dist,
         |  10000 * (greatest(length(a), length(b)) - levenshtein(a, b))
         |    // greatest(length(a), length(b)) AS sim_x10000
         |FROM pairs ORDER BY doc_id""".stripMargin,

    // the incremental probe's survivors equal the batch chain's
    // cross-epoch collision pairs: band collision is symmetric, so
    // filtering the all-pairs scored set to (standing, epoch) pairs is
    // exactly what the index join produces
    "dedup_lsh_incremental" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 100000000, text || '$Suffix'
         |    FROM documents WHERE doc_id % 20 = 0),
         |$MinhashFromCorpus
         |SELECT ida, idb, jacc_x10000 FROM scored
         |WHERE ida < 100000000 AND idb >= 100000000 AND jacc_x10000 >= 5000
         |ORDER BY ida, idb""".stripMargin,

    // medoid reps (min-id per label), nearest-rep assignment (cos desc,
    // ties → lower cell), then the 3 LOWEST-cosine members per cluster
    "corpus_diversity_sample" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, cluster, cos FROM (
         |    SELECT e.vec_id, r.cell AS cluster,
         |      ${cosSql("e.embedding", "r.rep")} AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |ranked AS (
         |  SELECT cluster, vec_id, cos,
         |    CAST(row_number() OVER (PARTITION BY cluster
         |      ORDER BY cos ASC, vec_id) AS INT) AS rank
         |  FROM assigned)
         |SELECT cluster, rank, vec_id, cos FROM ranked WHERE rank <= 3
         |ORDER BY cluster, rank""".stripMargin,

    "ann_ivf_nprobe" -> AnnIvfNprobeOracle,

    "corpus_redact_pii" -> RedactPiiOracle,

    // normalization twin: DuckDB's nfc_normalize implements the same
    // Unicode canonical composition as java.text.Normalizer; the
    // decomposed plants arrive via chr() so no source encoding is trusted;
    // regexp_replace needs the 'g' flag (DuckDB replaces first-only by
    // default, Spark replaces all)
    "corpus_normalize_text" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |         THEN '  cafe' || chr(769) || ' A' || chr(778) || 'bo  '
        |              || text || '  '
        |         ELSE text END AS text
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
        |    nfc_normalize(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS n
        |  FROM planted)
        |SELECT doc_id, len_raw, CAST(length(n) AS BIGINT) AS len_norm,
        |  md5(n) AS norm_md5
        |FROM norm ORDER BY doc_id""".stripMargin,

    // 64-token windows at stride 48, trailing partials kept — 1-based
    // inclusive list slice mirrors Spark's slice(toks, s*48+1, 64)
    // embed-pipeline twin: 32/24 chunking, hashed-BoW dims via the hex
    // fold, dense vectors through map_from_entries/map_extract, the
    // ADAPTIVE sign-bucket (all 14 prefix-plane bits computed, masked to
    // the same integer plane-count recurrence EmbedPipeline.planeCount
    // runs: smallest nP in [4,14] with nChunks >> nP <= 1024) over
    // ANGULAR direction vectors (v/|v| − 1/√16: Σv² is an exact integer
    // sum, sqrt correctly rounded, division/subtraction single IEEE ops —
    // all ROW-LOCAL, so bit-equal to Spark with no corpus statistic to
    // mirror), candidate predecessors capped at the bucket's CandidateCap
    // smallest (doc, chunk) via QUALIFY (the Spark side's bounded-verify
    // row_number filter, verbatim), sequential cosine folds on the RAW
    // vectors; keeper = min lexicographic predecessor via the
    // doc·2^20+chunk composite (chunk_id bounded far below 2^20)
    "corpus_embed_pipeline" -> {
      val planes16 = graft.ext.Similarity.hyperplanes(
        graft.ext.EmbedPipeline.MaxPlanes, 16)
      s"""WITH ${EmbedBucketCtes},
         |drops AS (SELECT b2.doc_id, b2.chunk_id,
         |    min(a.a_doc * 1048576 + a.a_chunk) AS kp
         |  FROM b b2 JOIN (SELECT bucket, doc_id AS a_doc,
         |      chunk_id AS a_chunk, vec AS a_vec FROM b
         |    QUALIFY row_number() OVER (PARTITION BY bucket
         |      ORDER BY doc_id, chunk_id)
         |        <= ${graft.ext.EmbedPipeline.CandidateCap}) a
         |    ON a.bucket = b2.bucket
         |  WHERE (a.a_doc < b2.doc_id
         |         OR (a.a_doc = b2.doc_id AND a.a_chunk < b2.chunk_id))
         |    AND ${cosSqlN("a.a_vec", "b2.vec", 16)} >= 0.95
         |  GROUP BY 1, 2)
         |SELECT b.doc_id, b.chunk_id, b.chunk_md5,
         |  kp IS NULL AS kept,
         |  CAST(kp // 1048576 AS BIGINT) AS keeper_doc,
         |  CAST(kp % 1048576 AS BIGINT) AS keeper_chunk
         |FROM b LEFT JOIN drops ON b.doc_id = drops.doc_id
         |  AND b.chunk_id = drops.chunk_id
         |ORDER BY b.doc_id, b.chunk_id""".stripMargin
    },

    "corpus_chunk" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(0, (len(t)-1)//48 + 1)) AS s
        |  FROM tok WHERE len(t) > 0),
        |ch AS (SELECT doc_id, s, t[s*48+1 : s*48+64] AS c FROM st)
        |SELECT doc_id, CAST(s AS BIGINT) AS chunk_id,
        |  CAST(len(c) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(c, ' ')) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    // chunk dedup twin: the corpus_chunk chunking + canonical-member
    // disposition per chunk_md5 group (min doc_id, then min chunk_id)
    "corpus_chunk_dedup" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |st AS (SELECT doc_id, t, unnest(range(0, (len(t)-1)//48 + 1)) AS s
        |  FROM tok WHERE len(t) > 0),
        |chm AS (SELECT doc_id, CAST(s AS BIGINT) AS chunk_id,
        |  md5(array_to_string(t[s*48+1 : s*48+64], ' ')) AS chunk_md5
        |  FROM st),
        |canon AS (SELECT chunk_md5, doc_id AS canon_doc,
        |    chunk_id AS canon_chunk FROM (
        |    SELECT chunk_md5, doc_id, chunk_id,
        |      row_number() OVER (PARTITION BY chunk_md5
        |        ORDER BY doc_id, chunk_id) AS rn
        |    FROM chm) WHERE rn = 1),
        |cnt AS (SELECT chunk_md5, count(*) AS n_copies FROM chm GROUP BY 1)
        |SELECT m.doc_id, m.chunk_id, m.chunk_md5,
        |  (m.doc_id = c.canon_doc AND m.chunk_id = c.canon_chunk) AS kept,
        |  c.canon_doc, c.canon_chunk, n.n_copies
        |FROM chm m JOIN canon c USING (chunk_md5) JOIN cnt n USING (chunk_md5)
        |ORDER BY m.doc_id, m.chunk_id""".stripMargin,

    // line-dedup twin: same 8-token-line reshape + boilerplate plant,
    // first-occurrence canonical per line hash, kept-lines re-assembly
    "corpus_line_dedup" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |lc AS (SELECT doc_id, array_to_string(
        |    list_transform(range(0, (len(t)-1)//8 + 1),
        |      i -> array_to_string(t[i*8+1 : i*8+8], ' ')), chr(10))
        |  || CASE WHEN doc_id % 3 = 0
        |       THEN chr(10) || 'subscribe to the newsletter today'
        |       ELSE '' END AS text FROM tok),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS sp FROM lc),
        |l0 AS (SELECT doc_id, sp, unnest(range(0, len(sp))) AS i FROM ls),
        |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no,
        |  sp[CAST(i AS INT)+1] AS line FROM l0),
        |canon AS (SELECT lk, doc_id AS cd, line_no AS cl FROM (
        |    SELECT md5(line) AS lk, doc_id, line_no,
        |      row_number() OVER (PARTITION BY md5(line)
        |        ORDER BY doc_id, line_no) AS rn
        |    FROM lines) WHERE rn = 1),
        |k AS (SELECT l.doc_id, l.line_no, l.line,
        |    (l.doc_id = c.cd AND l.line_no = c.cl) AS kept
        |  FROM lines l JOIN canon c ON md5(l.line) = c.lk)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS lines_total,
        |  CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS lines_kept,
        |  coalesce(string_agg(line, chr(10) ORDER BY line_no)
        |    FILTER (WHERE kept), '') AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""$CorpusCte
         |SELECT min(doc_id) AS keep_id, count(*) AS n FROM corpus
         |GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""$MinhashScoredCtes
         |SELECT ida, idb, jacc_x10000 FROM scored
         |WHERE jacc_x10000 >= 5000 ORDER BY ida, idb""".stripMargin,

    "dedup_cluster_components" ->
      s"""${MinhashScoredCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT ida, idb FROM scored WHERE jacc_x10000 >= 5000),
         |edges AS (SELECT ida AS a, idb AS b FROM pairs
         |          UNION SELECT idb, ida FROM pairs),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a)
         |SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS comp
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_simhash" ->
      s"""$CorpusCte,
         |$TokCte,
         |$HashesCte
         |SELECT doc_id, CAST($SimhashExpr AS BIGINT) AS simhash
         |FROM hs ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH pairs AS (
         |  SELECT doc_id,
         |    list_distinct(regexp_split_to_array(text, '\\s+')) AS ta,
         |    list_distinct(regexp_split_to_array(text || '$Suffix', '\\s+')) AS tb
         |  FROM documents WHERE doc_id % 20 = 0)
         |SELECT doc_id,
         |  10000 * len(list_distinct(list_intersect(ta, tb)))
         |    // (len(ta) + len(tb) - len(list_distinct(list_intersect(ta, tb)))) AS jacc_x10000
         |FROM pairs ORDER BY doc_id""".stripMargin,

    // signature-fidelity twin: the shared minhash CTE chain over the
    // planted (base, base+100000000=suffixed) corpus; est = equal signature
    // components // 32 vs the exact token Jaccard from the same `ts` CTE
    "dedup_minhash_jaccard_est" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 100000000, text || '$Suffix'
         |    FROM documents WHERE doc_id % 20 = 0),
         |$MinhashFromCorpus,
         |est AS (SELECT a.doc_id,
         |    CAST(10000 * (${(0 until 32)
              .map(i => s"CAST(a.h$i = b.h$i AS INT)").mkString(" + ")})
         |      // 32 AS BIGINT) AS est_x10000
         |  FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 100000000),
         |ex AS (SELECT x.doc_id,
         |    10000 * len(list_distinct(list_intersect(x.t, y.t)))
         |      // (len(x.t) + len(y.t)
         |         - len(list_distinct(list_intersect(x.t, y.t)))) AS jacc_x10000
         |  FROM ts x JOIN ts y ON y.doc_id = x.doc_id + 100000000)
         |SELECT doc_id, est_x10000, jacc_x10000
         |FROM est JOIN ex USING (doc_id) ORDER BY doc_id""".stripMargin,

    // containment twin: |A∩B|/|A| both directions next to the Jaccard —
    // base→twin exactly 10000 (wholly contained), twin→base < 10000
    "dedup_containment" ->
      s"""WITH pairs AS (
         |  SELECT doc_id,
         |    list_distinct(regexp_split_to_array(text, '\\s+')) AS ta,
         |    list_distinct(regexp_split_to_array(text || '$Suffix', '\\s+')) AS tb
         |  FROM documents WHERE doc_id % 20 = 0)
         |SELECT doc_id,
         |  10000 * len(list_distinct(list_intersect(ta, tb))) // len(ta) AS cont_ab_x10000,
         |  10000 * len(list_distinct(list_intersect(tb, ta))) // len(tb) AS cont_ba_x10000,
         |  10000 * len(list_distinct(list_intersect(ta, tb)))
         |    // (len(ta) + len(tb) - len(list_distinct(list_intersect(ta, tb)))) AS jacc_x10000
         |FROM pairs ORDER BY doc_id""".stripMargin,

    // candidate generation mirrors Spark's sign-LSH bucket join exactly
    // (same plane literals, same sequential dot fold) — the oracle and the
    // operator agree on ANY corpus, not just one with bit-identical dups
    "dedup_embedding_cosine" ->
      s"""WITH copies AS (
         |  SELECT vec_id + 100000000 AS ida, embedding AS ea,
         |    ${lshBucketSql("embedding")} AS bucket
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |corpus AS (
         |  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket
         |  FROM embeddings),
         |scored AS (SELECT ida, e.vec_id AS idb,
         |  ${cosSql("ea", "e.embedding")} AS sim
         |  FROM corpus e JOIN copies c ON e.bucket = c.bucket)
         |SELECT ida, idb, sim FROM scored WHERE sim >= 0.999
         |ORDER BY ida, idb""".stripMargin,

    // cosine-recall twin: same perturbed probes (double arithmetic — the
    // +0.5 lands on the DOUBLE-cast float, exact in both engines), same
    // plane literals and sequential dot folds; multiprobe = the 6 one-bit
    // xor buckets next to the home bucket
    "dedup_cosine_recall" -> {
      val mpOr = (0 until 6).map(j => s"e.bucket = xor(p.bucket0, ${1L << j})")
        .mkString(" OR ")
      s"""WITH probes AS (
         |  SELECT vec_id + 100000000 AS ida,
         |    list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)
         |      + CASE WHEN i = 1 THEN 0.5 ELSE 0.0 END) AS ea
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |corpus AS (
         |  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket
         |  FROM embeddings),
         |pb AS (SELECT ida, ea, ${lshBucketSql("ea")} AS bucket0 FROM probes)
         |SELECT method, detected FROM (
         |  SELECT 'all_pairs' AS method, CAST(count(*) AS BIGINT) AS detected
         |    FROM probes p JOIN embeddings e ON e.vec_id = p.ida - 100000000
         |    WHERE ${cosSql("p.ea", "e.embedding")} >= 0.8
         |  UNION ALL
         |  SELECT 'lsh', CAST(count(*) AS BIGINT)
         |    FROM pb p JOIN corpus e
         |      ON e.vec_id = p.ida - 100000000 AND e.bucket = p.bucket0
         |    WHERE ${cosSql("p.ea", "e.embedding")} >= 0.8
         |  UNION ALL
         |  SELECT 'lsh_multiprobe', CAST(count(*) AS BIGINT)
         |    FROM pb p JOIN corpus e
         |      ON e.vec_id = p.ida - 100000000 AND (e.bucket = p.bucket0 OR $mpOr)
         |    WHERE ${cosSql("p.ea", "e.embedding")} >= 0.8)
         |ORDER BY method""".stripMargin
    },

    // dedup-recall twin: the minhash scored chain + simhash signature CTEs
    // over the same planted corpus; detection = group/pair membership
    "dedup_recall" ->
      s"""$MinhashScoredCtes,
         |$HashesCte,
         |planted AS (SELECT doc_id FROM corpus WHERE doc_id >= 100000000),
         |ckd AS (SELECT DISTINCT c.doc_id FROM corpus c JOIN (
         |    SELECT md5(text) AS k FROM corpus GROUP BY 1 HAVING count(*) >= 2) g
         |  ON md5(c.text) = g.k),
         |mhd AS (SELECT ida AS doc_id FROM scored WHERE jacc_x10000 >= 5000
         |        UNION SELECT idb FROM scored WHERE jacc_x10000 >= 5000),
         |shs AS (SELECT doc_id, $SimhashExpr AS sig FROM hs),
         |shd AS (SELECT DISTINCT s.doc_id FROM shs s JOIN (
         |    SELECT sig FROM shs GROUP BY 1 HAVING count(*) >= 2) g USING (sig))
         |SELECT method, detected FROM (
         |  SELECT 'exact' AS method, CAST(count(*) AS BIGINT) AS detected
         |    FROM planted JOIN ckd USING (doc_id)
         |  UNION ALL
         |  SELECT 'minhash_lsh', CAST(count(*) AS BIGINT)
         |    FROM planted JOIN (SELECT DISTINCT doc_id FROM mhd) m USING (doc_id)
         |  UNION ALL
         |  SELECT 'simhash', CAST(count(*) AS BIGINT)
         |    FROM planted JOIN shd USING (doc_id))
         |ORDER BY method""".stripMargin,

    // cross-source twin: same planted mirror corpus, one content-hash
    // group, sorted-distinct source list as a comma scalar
    "dedup_cross_source" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL SELECT doc_id + 200000000, text, 'mirror'
        |  FROM documents WHERE doc_id % 25 = 0),
        |g AS (SELECT md5(text) AS ck,
        |    CAST(min(doc_id) AS BIGINT) AS keep_id,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    array_to_string(list_sort(list_distinct(list(source))), ',') AS sources
        |  FROM corpus GROUP BY 1)
        |SELECT keep_id, n_docs, n_sources, sources FROM g
        |WHERE n_sources >= 2 ORDER BY keep_id""".stripMargin,

    // SemDeDup twin: the CoarseKmCtes k-means centroids, nearest-cell
    // assignment + centroid cosine over the planted-copy corpus, then the
    // pairwise-local keeper rule (drop v iff a same-cluster neighbor at
    // cosine >= tau ranks before it under (centroid-cosine asc, id asc))
    "dedup_semantic" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |corp AS (SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000000, embedding FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |asg AS (
         |  SELECT vec_id, ivf_cell, csim FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      ${cosSql("e.embedding", "r.rep")} AS csim,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM corp e, reps r) WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM asg a JOIN asg b ON a.ivf_cell = b.ivf_cell AND a.vec_id <> b.vec_id
         |  JOIN corp ea ON ea.vec_id = a.vec_id
         |  JOIN corp eb ON eb.vec_id = b.vec_id
         |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.99
         |    AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id)))
         |SELECT a.vec_id, CAST(a.ivf_cell AS BIGINT) AS cluster,
         |  (d.vec_id IS NULL) AS kept
         |FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    "ann_brute_force" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // SQ8 twin: per-dim absmax scales as a single-row list, floor-encode /
    // exact-decode per element, asymmetric cosine (raw query vs decoded),
    // nCand=32 candidate cut, exact re-rank — every fold the same pinned
    // left-to-right double accumulation as the Spark side
    "ann_sq8" ->
      s"""WITH scales AS (
         |  SELECT list(s ORDER BY i) AS sc FROM (
         |    SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
         |    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d
         |    GROUP BY i)),
         |dec AS (
         |  SELECT vec_id, list_transform(
         |    list_transform(range(1, 65), i ->
         |      CASE WHEN sc[i] = 0 THEN 0
         |           ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / sc[i] * 127)
         |                AS BIGINT) END),
         |    c -> CAST(c AS DOUBLE) / 127) AS cn
         |  FROM embeddings, scales),
         |decv AS (
         |  SELECT vec_id, list_transform(range(1, 65), i -> cn[i] * sc[i]) AS dv
         |  FROM dec, scales),
         |scored AS (SELECT e.vec_id AS q_id, d.vec_id AS n_id,
         |    ${cosSql("e.embedding", "d.dv")} AS asim
         |  FROM embeddings e, decv d
         |  WHERE e.vec_id < 10 AND d.vec_id <> e.vec_id),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |    FROM scored) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // IVF x SQ8 twin: medoid reps + nearest-cell assignment restrict the
    // SQ8 asymmetric scan to the query's inverted list
    "ann_ivf_sq8" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |scales AS (
         |  SELECT list(s ORDER BY i) AS sc FROM (
         |    SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
         |    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d
         |    GROUP BY i)),
         |dec AS (
         |  SELECT vec_id, list_transform(
         |    list_transform(range(1, 65), i ->
         |      CASE WHEN sc[i] = 0 THEN 0
         |           ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / sc[i] * 127)
         |                AS BIGINT) END),
         |    c -> CAST(c AS DOUBLE) / 127) AS cn
         |  FROM embeddings, scales),
         |decv AS (
         |  SELECT vec_id, list_transform(range(1, 65), i -> cn[i] * sc[i]) AS dv
         |  FROM dec, scales),
         |scored AS (SELECT e.vec_id AS q_id, d.vec_id AS n_id,
         |    ${cosSql("e.embedding", "d.dv")} AS asim
         |  FROM embeddings e
         |  JOIN assigned qa ON qa.vec_id = e.vec_id
         |  JOIN assigned ca ON ca.ivf_cell = qa.ivf_cell
         |  JOIN decv d ON d.vec_id = ca.vec_id
         |  WHERE e.vec_id < 10 AND d.vec_id <> e.vec_id),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |    FROM scored) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // multi-probe IVF x SQ8 twin: the ann_ivf_sq8 CTEs with the query side
    // probing its 2 nearest cells (rn <= 2) instead of only the top one
    "ann_ivf_sq8_nprobe" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |qprobe AS (
         |  SELECT q_id, ivf_cell FROM (
         |    SELECT e.vec_id AS q_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |scales AS (
         |  SELECT list(s ORDER BY i) AS sc FROM (
         |    SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
         |    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d
         |    GROUP BY i)),
         |dec AS (
         |  SELECT vec_id, list_transform(
         |    list_transform(range(1, 65), i ->
         |      CASE WHEN sc[i] = 0 THEN 0
         |           ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / sc[i] * 127)
         |                AS BIGINT) END),
         |    c -> CAST(c AS DOUBLE) / 127) AS cn
         |  FROM embeddings, scales),
         |decv AS (
         |  SELECT vec_id, list_transform(range(1, 65), i -> cn[i] * sc[i]) AS dv
         |  FROM dec, scales),
         |scored AS (SELECT e.vec_id AS q_id, d.vec_id AS n_id,
         |    ${cosSql("e.embedding", "d.dv")} AS asim
         |  FROM embeddings e
         |  JOIN qprobe qp ON qp.q_id = e.vec_id
         |  JOIN assigned ca ON ca.ivf_cell = qp.ivf_cell
         |  JOIN decv d ON d.vec_id = ca.vec_id
         |  WHERE d.vec_id <> e.vec_id),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |    FROM scored) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // kNN-graph twin: the ann_lsh bucket self-join with EVERY vector as a
    // query, ranked identically (sim desc, n_id asc)
    "ann_knn_graph" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding,
         |    ${bucketExpr("embedding")} AS bucket
         |  FROM embeddings),
         |scored AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |  ${cosSql("q.embedding", "e.embedding")} AS sim
         |  FROM bucketed e JOIN bucketed q USING (bucket)
         |  WHERE e.vec_id <> q.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 3
         |ORDER BY q_id, rank""".stripMargin,

    "ann_lsh" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding,
         |    ${bucketExpr("embedding")} AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM bucketed WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM bucketed e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // multi-probe twin: the ann_lsh CTEs with the query side unnested over
    // its probe list (own bucket + each single-bit flip; DuckDB xor())
    // range-search twin: same multiprobe candidate structure, threshold
    // filter instead of ranking
    "ann_range_search" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding,
         |    ${bucketExpr("embedding")} AS bucket
         |  FROM embeddings),
         |q0 AS (SELECT vec_id AS q_id, embedding AS qe, bucket AS qb
         |       FROM bucketed WHERE vec_id < 10),
         |q AS (SELECT q_id, qe,
         |  unnest([qb, ${Planes.indices.map(j => s"xor(qb, ${1L << j})").mkString(", ")}]) AS bucket
         |  FROM q0)
         |SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |FROM bucketed e JOIN q USING (bucket)
         |WHERE e.vec_id <> q.q_id AND ${cosSql("qe", "e.embedding")} >= 0.25
         |ORDER BY q_id, n_id""".stripMargin,

    "ann_lsh_multiprobe" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding,
         |    ${bucketExpr("embedding")} AS bucket
         |  FROM embeddings),
         |q0 AS (SELECT vec_id AS q_id, embedding AS qe, bucket AS qb
         |       FROM bucketed WHERE vec_id < 10),
         |q AS (SELECT q_id, qe,
         |  unnest([qb, ${Planes.indices.map(j => s"xor(qb, ${1L << j})").mkString(", ")}]) AS bucket
         |  FROM q0),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM bucketed e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // recall twin: brute-force top-5 + each approximate method's top-5 as
    // CTEs, counted through the same (q_id, n_id) intersection joins
    // replays the full deterministic descent: ring init, reverse cap,
    // neighbor-of-neighbor candidates, cosine re-rank — four unrolled rounds
    "ann_nndescent_recall" -> {
      val k = 8
      s"""WITH ${nnDescentCtes(k, 4)},
         |bf AS MATERIALIZED (SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10) WHERE rn <= $k),
         |hi AS (SELECT nb0.vec_id AS q_id, count(*) AS hits_init
         |  FROM nb0 JOIN bf ON bf.q_id = nb0.vec_id AND bf.n_id = nb0.n_id
         |  GROUP BY 1),
         |hf AS (SELECT nb4.vec_id AS q_id, count(*) AS hits_final
         |  FROM nb4 JOIN bf ON bf.q_id = nb4.vec_id AND bf.n_id = nb4.n_id
         |  GROUP BY 1)
         |SELECT q.vec_id AS q_id,
         |  coalesce(hi.hits_init, 0) AS hits_init,
         |  coalesce(hf.hits_final, 0) AS hits_final
         |FROM embeddings q LEFT JOIN hi ON hi.q_id = q.vec_id
         |                  LEFT JOIN hf ON hf.q_id = q.vec_id
         |WHERE q.vec_id < 10 ORDER BY q_id""".stripMargin
    },

    // graph build (shared descent CTEs) + 3 unrolled beam hops from the
    // fixed entry node, self excluded only from the final answer
    "ann_graph_search" -> {
      val (k, beam, hops, topK) = (8, 8, 3, 5)
      def hopCtes(i: Int): String = {
        val prev = s"beam${i - 1}"
        s"""exp$i AS MATERIALIZED (SELECT b.q_id, g.n_id FROM $prev b
           |            JOIN nb4 g ON g.vec_id = b.n_id
           |          UNION SELECT q_id, n_id FROM $prev),
           |bsc$i AS MATERIALIZED (SELECT x.q_id, x.n_id,
           |    ${cosSql("q.embedding", "e.embedding")} AS sim
           |  FROM exp$i x JOIN embeddings q ON q.vec_id = x.q_id
           |               JOIN embeddings e ON e.vec_id = x.n_id),
           |beam$i AS MATERIALIZED (SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id,
           |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
           |    FROM bsc$i) WHERE rn <= $beam)""".stripMargin
      }
      s"""WITH ${nnDescentCtes(k, 4)},
         |beam0 AS (SELECT vec_id AS q_id, CAST(0 AS BIGINT) AS n_id
         |          FROM embeddings WHERE vec_id < 10),
         |${(1 to hops).map(hopCtes).mkString(",\n")},
         |fin AS MATERIALIZED (SELECT q_id, n_id FROM (
         |    SELECT b.q_id, b.n_id,
         |      row_number() OVER (PARTITION BY b.q_id
         |        ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, b.n_id) AS rn
         |    FROM beam$hops b JOIN embeddings q ON q.vec_id = b.q_id
         |                     JOIN embeddings e ON e.vec_id = b.n_id
         |    WHERE b.q_id <> b.n_id) WHERE rn <= $topK),
         |bf5 AS MATERIALIZED (SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10) WHERE rn <= $topK),
         |ov AS (SELECT fin.q_id, count(*) AS hits
         |  FROM fin JOIN bf5 ON bf5.q_id = fin.q_id AND bf5.n_id = fin.n_id
         |  GROUP BY 1),
         |nf AS (SELECT q_id, count(*) AS n_found FROM fin GROUP BY 1)
         |SELECT nf.q_id, nf.n_found, coalesce(ov.hits, 0) AS hits
         |FROM nf LEFT JOIN ov ON ov.q_id = nf.q_id
         |ORDER BY nf.q_id""".stripMargin
    },

    "ann_recall" ->
      s"""WITH bfq AS (SELECT vec_id AS q_id, embedding AS qe
         |       FROM embeddings WHERE vec_id < 10),
         |bf AS MATERIALIZED (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM (SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS sim
         |          FROM embeddings e, bfq WHERE e.vec_id <> bfq.q_id))
         |  WHERE rank <= 5),
         |bucketed AS (SELECT vec_id, embedding,
         |    ${bucketExpr("embedding")} AS bucket FROM embeddings),
         |q0 AS (SELECT vec_id AS q_id, embedding AS qe, bucket AS qb
         |       FROM bucketed WHERE vec_id < 10),
         |lsh AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM (SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS sim
         |          FROM bucketed e JOIN q0 q ON e.bucket = q.qb
         |          WHERE e.vec_id <> q.q_id))
         |  WHERE rank <= 5),
         |probes AS (SELECT q_id, qe,
         |  unnest([qb, ${Planes.indices.map(j => s"xor(qb, ${1L << j})").mkString(", ")}]) AS bucket
         |  FROM q0),
         |mp AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM (SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS sim
         |          FROM bucketed e JOIN probes q USING (bucket)
         |          WHERE e.vec_id <> q.q_id))
         |  WHERE rank <= 5),
         |reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |ivfq AS (SELECT vec_id AS q_id, embedding AS qe, ivf_cell
         |        FROM assigned WHERE vec_id < 10),
         |ivf AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM (SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS sim
         |          FROM assigned e JOIN ivfq q USING (ivf_cell)
         |          WHERE e.vec_id <> q.q_id))
         |  WHERE rank <= 5),
         |ivfqp AS (SELECT q_id, qe, ivf_cell FROM (
         |    SELECT e.vec_id AS q_id, e.embedding AS qe, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |ivfp AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM (SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS sim
         |          FROM assigned e JOIN ivfqp q USING (ivf_cell)
         |          WHERE e.vec_id <> q.q_id))
         |  WHERE rank <= 5),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS c
         |  FROM embeddings, ms WHERE vec_id < 16),
         |psub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
         |  FROM embeddings, ms),
         |pd2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM psub s JOIN cw ON s.m = cw.m),
         |pcodes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM pd2) WHERE rn = 1),
         |pdq AS (SELECT vec_id AS q_id, m, j, d FROM pd2 WHERE vec_id < 10),
         |padc AS (SELECT pdq.q_id, pcodes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(pdq.d ORDER BY pdq.m)), (a, b) -> a + b) AS adist
         |  FROM pcodes JOIN pdq ON pcodes.m = pdq.m AND pcodes.code = pdq.j
         |  WHERE pcodes.vec_id <> pdq.q_id GROUP BY 1, 2),
         |pq5 AS (SELECT q_id, n_id FROM (
         |    SELECT c.q_id, c.n_id, row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY ${cosSql("qv.embedding", "nv.embedding")} DESC, c.n_id) AS rank
         |    FROM (SELECT q_id, n_id FROM (
         |        SELECT q_id, n_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |        FROM padc) WHERE arn <= 32) c
         |    JOIN embeddings qv ON c.q_id = qv.vec_id
         |    JOIN embeddings nv ON c.n_id = nv.vec_id)
         |  WHERE rank <= 5),
         |iadc AS (SELECT pdq.q_id, pcodes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(pdq.d ORDER BY pdq.m)), (a, b) -> a + b) AS adist
         |  FROM pcodes JOIN pdq ON pcodes.m = pdq.m AND pcodes.code = pdq.j
         |  JOIN assigned ca ON ca.vec_id = pcodes.vec_id
         |  JOIN assigned qa ON qa.vec_id = pdq.q_id AND qa.ivf_cell = ca.ivf_cell
         |  WHERE pcodes.vec_id <> pdq.q_id GROUP BY 1, 2),
         |ivfpq5 AS (SELECT q_id, n_id FROM (
         |    SELECT c.q_id, c.n_id, row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY ${cosSql("qv.embedding", "nv.embedding")} DESC, c.n_id) AS rank
         |    FROM (SELECT q_id, n_id FROM (
         |        SELECT q_id, n_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |        FROM iadc) WHERE arn <= 32) c
         |    JOIN embeddings qv ON c.q_id = qv.vec_id
         |    JOIN embeddings nv ON c.n_id = nv.vec_id)
         |  WHERE rank <= 5),
         |sqsc AS (SELECT list(s ORDER BY i) AS sc FROM (
         |    SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
         |    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d GROUP BY i)),
         |sqdec AS (SELECT vec_id, list_transform(
         |    list_transform(range(1, 65), i ->
         |      CASE WHEN sc[i] = 0 THEN 0
         |           ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / sc[i] * 127)
         |                AS BIGINT) END),
         |    c -> CAST(c AS DOUBLE) / 127) AS cn
         |  FROM embeddings, sqsc),
         |sqdv AS (SELECT vec_id,
         |    list_transform(range(1, 65), i -> cn[i] * sc[i]) AS dv
         |  FROM sqdec, sqsc),
         |sqscored AS (SELECT q.q_id, d.vec_id AS n_id,
         |    ${cosSql("q.qe", "d.dv")} AS asim
         |  FROM bfq q, sqdv d WHERE d.vec_id <> q.q_id),
         |sq85 AS (SELECT q_id, n_id FROM (
         |    SELECT c.q_id, c.n_id, row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY ${cosSql("qv.embedding", "nv.embedding")} DESC, c.n_id) AS rank
         |    FROM (SELECT q_id, n_id FROM (
         |        SELECT q_id, n_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |        FROM sqscored) WHERE arn <= 32) c
         |    JOIN embeddings qv ON c.q_id = qv.vec_id
         |    JOIN embeddings nv ON c.n_id = nv.vec_id)
         |  WHERE rank <= 5),
         |isqscored AS (SELECT s.q_id, s.n_id, s.asim FROM sqscored s
         |  JOIN assigned qa ON qa.vec_id = s.q_id
         |  JOIN assigned ca ON ca.vec_id = s.n_id
         |                  AND ca.ivf_cell = qa.ivf_cell),
         |isq85 AS (SELECT q_id, n_id FROM (
         |    SELECT c.q_id, c.n_id, row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY ${cosSql("qv.embedding", "nv.embedding")} DESC, c.n_id) AS rank
         |    FROM (SELECT q_id, n_id FROM (
         |        SELECT q_id, n_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |        FROM isqscored) WHERE arn <= 32) c
         |    JOIN embeddings qv ON c.q_id = qv.vec_id
         |    JOIN embeddings nv ON c.n_id = nv.vec_id)
         |  WHERE rank <= 5),
         |isqpscored AS (SELECT s.q_id, s.n_id, s.asim FROM sqscored s
         |  JOIN ivfqp q ON q.q_id = s.q_id
         |  JOIN assigned ca ON ca.vec_id = s.n_id
         |                  AND ca.ivf_cell = q.ivf_cell),
         |isqp5 AS (SELECT q_id, n_id FROM (
         |    SELECT c.q_id, c.n_id, row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY ${cosSql("qv.embedding", "nv.embedding")} DESC, c.n_id) AS rank
         |    FROM (SELECT q_id, n_id FROM (
         |        SELECT q_id, n_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, n_id) AS arn
         |        FROM isqpscored) WHERE arn <= 32) c
         |    JOIN embeddings qv ON c.q_id = qv.vec_id
         |    JOIN embeddings nv ON c.n_id = nv.vec_id)
         |  WHERE rank <= 5)
         |SELECT method, hits FROM (
         |  SELECT 'ivf' AS method, count(*) AS hits FROM bf JOIN ivf USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'ivf_nprobe', count(*) FROM bf JOIN ivfp USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'ivf_pq', count(*) FROM bf JOIN ivfpq5 USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'lsh', count(*) FROM bf JOIN lsh USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'lsh_multiprobe', count(*) FROM bf JOIN mp USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'pq', count(*) FROM bf JOIN pq5 USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'sq8', count(*) FROM bf JOIN sq85 USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'ivf_sq8', count(*) FROM bf JOIN isq85 USING (q_id, n_id)
         |  UNION ALL
         |  SELECT 'ivf_sq8_nprobe', count(*) FROM bf JOIN isqp5 USING (q_id, n_id))
         |ORDER BY method""".stripMargin,

    "ann_ivf" -> AnnIvfOracle,

    // identical semantics through the persisted partitioned index —
    // ann_ivf's oracle IS the twin
    "ann_ivf_persisted" -> AnnIvfOracle,


    // filtered-search twin: the ann_lsh CTEs with the label predicate
    // pre-filtering the CORPUS side only (queries bucket from their own
    // embeddings regardless)
    "ann_filtered_search" -> AnnFilteredOracle,

    // identical semantics through the label-partitioned persisted index —
    // the filtered oracle IS the twin (directory pruning is a plan
    // property, not a result property)
    "ann_filtered_persisted" -> AnnFilteredOracle,

    // hybrid twin: the lsh candidate CTEs + the containment-key token
    // Jaccard over the joined texts, fused with the same integer formula
    "ann_hybrid_search" -> {
      def inter(a: String, b: String) =
        s"len(list_distinct(list_intersect($a, $b)))"
      val jacc = s"(10000 * ${inter("qt.t", "nt.t")}) " +
        s"// (len(qt.t) + len(nt.t) - ${inter("qt.t", "nt.t")})"
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding, ${bucketExpr("embedding")} AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket
         |      FROM bucketed WHERE vec_id < 10),
         |cand AS (SELECT q_id, e.vec_id AS n_id,
         |    ${cosSql("qe", "e.embedding")} AS cos
         |  FROM bucketed e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
         |tx AS (SELECT doc_id,
         |    list_distinct(regexp_split_to_array(text, '\\s+')) AS t
         |  FROM documents),
         |sc AS (SELECT q_id, n_id,
         |    CAST(floor(cos * 5000.0) AS BIGINT) + ($jacc) // 2 AS hybrid
         |  FROM cand JOIN tx nt ON nt.doc_id = cand.n_id
         |            JOIN tx qt ON qt.doc_id = cand.q_id),
         |ranked AS (SELECT q_id, n_id, hybrid,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY hybrid DESC, n_id) AS INT) AS rank
         |  FROM sc)
         |SELECT q_id, rank, n_id, CAST(hybrid AS BIGINT) AS hybrid_x10000
         |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
    },

    // drift twin: coarse k-means + trained assignment, per-epoch
    // quantized component sums (floor — no tie semantics), exact means,
    // cosine between epoch means via the shared sequential folds
    "emb_drift" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |half AS (SELECT max(vec_id) // 2 AS h FROM embeddings),
         |q AS (SELECT vec_id, ivf_cell,
         |    list_transform(range(1, 65), i ->
         |      CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
         |  FROM assigned),
         |s1 AS (SELECT ivf_cell AS cluster, i, CAST(sum(qv[i]) AS BIGINT) AS s
         |  FROM q, half, range(1, 65) r(i) WHERE vec_id <= h GROUP BY 1, 2),
         |n1 AS (SELECT ivf_cell AS cluster, CAST(count(*) AS BIGINT) AS n1
         |  FROM q, half WHERE vec_id <= h GROUP BY 1),
         |m1 AS (SELECT cluster, list(CAST(s AS DOUBLE) / (n1 * 10000.0)
         |    ORDER BY i) AS m1 FROM s1 JOIN n1 USING (cluster) GROUP BY cluster, n1),
         |s2 AS (SELECT ivf_cell AS cluster, i, CAST(sum(qv[i]) AS BIGINT) AS s
         |  FROM q, half, range(1, 65) r(i) WHERE vec_id > h GROUP BY 1, 2),
         |n2 AS (SELECT ivf_cell AS cluster, CAST(count(*) AS BIGINT) AS n2
         |  FROM q, half WHERE vec_id > h GROUP BY 1),
         |m2 AS (SELECT cluster, list(CAST(s AS DOUBLE) / (n2 * 10000.0)
         |    ORDER BY i) AS m2 FROM s2 JOIN n2 USING (cluster) GROUP BY cluster, n2)
         |SELECT cluster, n1, n2, ${cosSql("m1", "m2")} AS mean_cosine
         |FROM m1 JOIN m2 USING (cluster) JOIN n1 USING (cluster)
         |  JOIN n2 USING (cluster)
         |ORDER BY cluster""".stripMargin,

    // k-means report twin: the coarse k-means CTEs + the same trained-cell
    // assignment, aggregated per cell (decimal cohesion sums, order-free
    // min/max)
    "corpus_kmeans" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell, rep FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell, r.rep,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1)
         |SELECT ivf_cell AS cluster, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(${cosSql("embedding", "rep")} AS DECIMAL(18,6)))
         |    AS DOUBLE) AS sum_cos,
         |  min(${cosSql("embedding", "rep")}) AS min_cos,
         |  max(${cosSql("embedding", "rep")}) AS max_cos
         |FROM assigned GROUP BY 1 ORDER BY cluster""".stripMargin,

    // trained-IVF twin: coarse k-means (CoarseKmCtes) + the ann_ivf
    // assignment/probe CTEs with reps = the trained centroids
    "ann_ivf_trained" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |assigned AS (
         |  SELECT vec_id, embedding, ivf_cell FROM (
         |    SELECT e.vec_id, e.embedding, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, ivf_cell
         |      FROM assigned WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${cosSql("qe", "e.embedding")} AS sim
         |  FROM assigned e JOIN q USING (ivf_cell) WHERE e.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // fully-trained IVF+PQ twin: BOTH k-means CTEs (coarse cells + PQ
    // codewords), trained-cell assignment, then the cell-pruned
    // encode/LUT/ADC/re-rank chain
    "ann_ivf_pq_trained" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |$TrainedAssignIdCte,
         |$PqKmCtes,
         |${pqDownstreamSql(cellPruned = true)}""".stripMargin,

    // the complete production index twin: ann_ivf_pq_trained with the
    // query side joined through its top-2 probe cells (persistence does
    // not change results — same contract as ann_ivf_pq_persisted)
    "ann_ivf_pq_full" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |$TrainedAssignIdCte,
         |qprobe AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |$PqKmCtes,
         |${pqDownstreamSql(cellPruned = true, qaTable = "qprobe")}""".stripMargin,

    // fully-trained RESIDUAL IVF+PQ twin: coarse k-means cells, residuals
    // of the whole corpus w.r.t. them (wr), a k-means over the SAMPLE's
    // residual subvectors, then the cell-pruned chain over rv
    "ann_ivf_pq_residual_trained" ->
      s"""WITH RECURSIVE
         |$CoarseKmCtes,
         |$TrainedAssignIdCte,
         |wr AS (SELECT a.vec_id, a.ivf_cell,
         |    list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - r.rep[i]) AS rv
         |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
         |                  JOIN reps r ON a.ivf_cell = r.cell),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |rsamp AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS s
         |  FROM wr, ms WHERE vec_id < 256),
         |${pqKmRecursion("rsamp", "rkm")},
         |cw AS (SELECT m, j, c FROM rkm WHERE iter = 10),
         |${pqDownstreamSql(cellPruned = true,
             subExpr = "rv[m*8 + i]", subFrom = "wr", cellTable = "wr")}""".stripMargin,

    // IVF+PQ twin: the ann_ivf assignment CTEs + the ann_pq code CTEs, with
    // the ADC join additionally restricted to the query's cell
    "ann_ivf_pq" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS c
         |  FROM embeddings, ms WHERE vec_id < 16),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
         |  FROM embeddings, ms),
         |d2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cw ON s.m = cw.m),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1),
         |dq AS (SELECT vec_id AS q_id, m, j, d FROM d2 WHERE vec_id < 10),
         |adc AS (SELECT dq.q_id, codes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dq.d ORDER BY dq.m)), (a, b) -> a + b) AS adist
         |  FROM codes
         |  JOIN dq ON codes.m = dq.m AND codes.code = dq.j
         |  JOIN assigned ca ON ca.vec_id = codes.vec_id
         |  JOIN assigned qa ON qa.vec_id = dq.q_id AND qa.ivf_cell = ca.ivf_cell
         |  WHERE codes.vec_id <> dq.q_id GROUP BY 1, 2),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |    FROM adc) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // nprobe=2 IVF+PQ twin: ann_ivf_pq with the QUERY side joined through
    // its top-2 probe cells (qprobe, rank <= 2) instead of the single
    // assignment — corpus codes/cells identical
    "ann_ivf_pq_nprobe" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |qprobe AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS c
         |  FROM embeddings, ms WHERE vec_id < 16),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
         |  FROM embeddings, ms),
         |d2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cw ON s.m = cw.m),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1),
         |dq AS (SELECT vec_id AS q_id, m, j, d FROM d2 WHERE vec_id < 10),
         |adc AS (SELECT dq.q_id, codes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dq.d ORDER BY dq.m)), (a, b) -> a + b) AS adist
         |  FROM codes
         |  JOIN dq ON codes.m = dq.m AND codes.code = dq.j
         |  JOIN assigned ca ON ca.vec_id = codes.vec_id
         |  JOIN qprobe qa ON qa.vec_id = dq.q_id AND qa.ivf_cell = ca.ivf_cell
         |  WHERE codes.vec_id <> dq.q_id GROUP BY 1, 2),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |    FROM adc) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // residual IVF+PQ twin: identical to ann_ivf_pq but every subvector is
    // taken from rv = embedding − assigned-cell rep (elementwise doubles)
    "ann_ivf_pq_residual" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |wr AS (SELECT a.vec_id, a.ivf_cell,
         |    list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(r.rep[i] AS DOUBLE)) AS rv
         |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
         |                  JOIN reps r ON a.ivf_cell = r.cell),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS c
         |  FROM wr, ms WHERE vec_id < 16),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS s
         |  FROM wr, ms),
         |d2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cw ON s.m = cw.m),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1),
         |dq AS (SELECT vec_id AS q_id, m, j, d FROM d2 WHERE vec_id < 10),
         |adc AS (SELECT dq.q_id, codes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dq.d ORDER BY dq.m)), (a, b) -> a + b) AS adist
         |  FROM codes
         |  JOIN dq ON codes.m = dq.m AND codes.code = dq.j
         |  JOIN wr ca ON ca.vec_id = codes.vec_id
         |  JOIN wr qa ON qa.vec_id = dq.q_id AND qa.ivf_cell = ca.ivf_cell
         |  WHERE codes.vec_id <> dq.q_id GROUP BY 1, 2),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |    FROM adc) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // multi-probe residual twin: ann_ivf_pq_residual with the query side
    // fanned out over its top-2 cells (qprobe) and ONE RESIDUAL PER
    // PROBED CELL (wrq) — the candidate is scored under the LUT of its
    // own cell (d2q.ivf_cell = corpus cell), FAISS's per-list semantics
    "ann_ivf_pq_residual_nprobe" ->
      s"""WITH reps AS (
         |  SELECT label AS cell, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assigned AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r) WHERE rn = 1),
         |wr AS (SELECT a.vec_id, a.ivf_cell,
         |    list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(r.rep[i] AS DOUBLE)) AS rv
         |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
         |                  JOIN reps r ON a.ivf_cell = r.cell),
         |qprobe AS (
         |  SELECT vec_id, ivf_cell FROM (
         |    SELECT e.vec_id, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 2),
         |wrq AS (SELECT qp.vec_id, qp.ivf_cell,
         |    list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(r.rep[i] AS DOUBLE)) AS rv
         |  FROM qprobe qp JOIN embeddings e ON qp.vec_id = e.vec_id
         |                 JOIN reps r ON qp.ivf_cell = r.cell),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS c
         |  FROM wr, ms WHERE vec_id < 16),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS s
         |  FROM wr, ms),
         |d2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cw ON s.m = cw.m),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1),
         |subq AS (SELECT vec_id, ivf_cell, m,
         |    list_transform(range(1, 9), i -> rv[m*8 + i]) AS s
         |  FROM wrq, ms),
         |d2q AS (SELECT s.vec_id, s.ivf_cell, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM subq s JOIN cw ON s.m = cw.m),
         |adc AS (SELECT d2q.vec_id AS q_id, codes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(d2q.d ORDER BY d2q.m)), (a, b) -> a + b) AS adist
         |  FROM codes
         |  JOIN wr ca ON ca.vec_id = codes.vec_id
         |  JOIN d2q ON codes.m = d2q.m AND codes.code = d2q.j
         |          AND d2q.ivf_cell = ca.ivf_cell
         |  WHERE codes.vec_id <> d2q.vec_id GROUP BY 1, 2),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |    FROM adc) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // PQ-ADC twin: codebook = subvectors of vec_id < 16; d² folds are
    // list_reduce with a 0.0 prepend = Spark's left-associated sums; the
    // ADC sum is an m-ordered list fold (= Spark's c0..c7 column sum)
    "ann_pq" ->
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |cw AS (SELECT m, CAST(vec_id AS INT) AS j,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS c
         |  FROM embeddings, ms WHERE vec_id < 16),
         |sub AS (SELECT vec_id, m,
         |    list_transform(range(1, 9), i -> CAST(embedding[m*8 + i] AS DOUBLE)) AS s
         |  FROM embeddings, ms),
         |d2 AS (SELECT s.vec_id, s.m, cw.j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, 9), i -> (s.s[i] - cw.c[i]) * (s.s[i] - cw.c[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cw ON s.m = cw.m),
         |codes AS (SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM d2) WHERE rn = 1),
         |dq AS (SELECT vec_id AS q_id, m, j, d FROM d2 WHERE vec_id < 10),
         |adc AS (SELECT dq.q_id, codes.vec_id AS n_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(dq.d ORDER BY dq.m)), (a, b) -> a + b) AS adist
         |  FROM codes JOIN dq ON codes.m = dq.m AND codes.code = dq.j
         |  WHERE codes.vec_id <> dq.q_id GROUP BY 1, 2),
         |cand AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS arn
         |    FROM adc) WHERE arn <= 32),
         |rr AS (SELECT c.q_id, c.n_id,
         |    ${cosSql("qv.embedding", "nv.embedding")} AS sim
         |  FROM cand c JOIN embeddings qv ON c.q_id = qv.vec_id
         |              JOIN embeddings nv ON c.n_id = nv.vec_id),
         |ranked AS (SELECT q_id, n_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM rr)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // trained-PQ twin: the PqKmCtes k-means codebook (fixed sample,
    // first-16 init, 10 iterations, first-min ties, vec_id-ordered
    // accumulation, empty clusters keep the old centroid) + the ann_pq
    // downstream chain
    "ann_pq_trained" ->
      s"""WITH RECURSIVE
         |$PqKmCtes,
         |${pqDownstreamSql(cellPruned = false)}""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, n_chars,
        |  len(regexp_split_to_array(text, '\s+')) AS words,
        |  100 * length(regexp_replace(text, '\s+', '', 'g'))
        |    // len(regexp_split_to_array(text, '\s+')) AS avg_wlen_x100,
        |  10000 * len(list_filter(regexp_split_to_array(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is')))
        |    // len(regexp_split_to_array(text, '\s+')) AS stop_x10000,
        |  10000 * len(regexp_extract_all(text, '[^\w\s]')) // length(text) AS punct_x10000
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\band\b')) AS en_markers,
        |  CASE WHEN len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\band\b')) > 0
        |       THEN 'en' ELSE 'und' END AS guess
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_domain_drift" ->
      """WITH toks AS (
        |  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents WHERE lang IN ('en', 'zh')),
        |counts AS (
        |  SELECT tok,
        |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_en,
        |    CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS c_zh
        |  FROM toks GROUP BY tok),
        |totals AS (
        |  SELECT CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
        |    CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh
        |  FROM toks)
        |SELECT tok, c_en, c_zh,
        |  CAST(length(bin((c_en + 1) * (n_zh + 1))) - 1 AS BIGINT)
        |    - CAST(length(bin((c_zh + 1) * (n_en + 1))) - 1 AS BIGINT)
        |    AS delta_bits
        |FROM counts, totals
        |WHERE c_en + c_zh >= 10
        |ORDER BY abs(delta_bits) DESC, tok LIMIT 20""".stripMargin,

    "text_fingerprint" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$TokCte,
         |$ShingleCte
         |SELECT doc_id, list_min(list_transform(sg, s -> md5(s))) AS fp
         |FROM sh ORDER BY doc_id""".stripMargin,

    // intra-doc repetition: 3-gram duplicate-occurrence fraction + top
    // 2-gram occupancy, every 10th doc self-concatenated
    "text_repetition" ->
      """WITH docs AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN text || ' ' || text ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM docs),
        |g3 AS (SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS g
        |  FROM tok),
        |g2 AS (SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) END) AS g
        |  FROM tok),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id, sum(c) AS grams3,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3 FROM c3 GROUP BY 1),
        |s2 AS (SELECT doc_id, sum(c) AS grams2, max(c) AS top2 FROM c2 GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(s3.grams3, 0) AS BIGINT) AS grams3,
        |  CAST(coalesce(10000 * s3.dup3 // s3.grams3, 0) AS BIGINT) AS dup3_x10000,
        |  CAST(coalesce(10000 * s2.top2 // s2.grams2, 0) AS BIGINT) AS top2_x10000
        |FROM docs d
        |LEFT JOIN s3 ON d.doc_id = s3.doc_id
        |LEFT JOIN s2 ON d.doc_id = s2.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // unigram-LM surprisal in integer bits: ilog2(x) = strlen(bin(x)) - 1
    "text_unigram_lm" ->
      """WITH tokr AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tokr GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
        |b AS (SELECT doc_id,
        |    (strlen(bin(t)) - 1) - (strlen(bin(c)) - 1) AS bits
        |  FROM tokr JOIN v USING (tok) CROSS JOIN tt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // bigram twin: adjacency from per-row index ranges (t[i], t[i+1]),
    // conditional bits = ilog2(left count) - ilog2(bigram count)
    "text_bigram_lm" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |pr AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM tok WHERE len(t) >= 2)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM pr GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pr GROUP BY 1),
        |b AS (SELECT doc_id,
        |    (strlen(bin(c1)) - 1) - (strlen(bin(c2)) - 1) AS bits
        |  FROM pr JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // top-quality selection twin: the unigram-LM scored CTE + a cumulative
    // histogram threshold (smallest score reaching ceil(30%*N)), boundary
    // bucket inclusive — same contract as the Spark driver scan
    "corpus_select_top_quality" ->
      """WITH tokr AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tokr GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
        |b AS (SELECT doc_id,
        |    (strlen(bin(t)) - 1) - (strlen(bin(c)) - 1) AS bits
        |  FROM tokr JOIN v USING (tok) CROSS JOIN tt),
        |scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
        |  FROM b GROUP BY 1),
        |hist AS (SELECT surprisal_x100 AS sc, count(*) AS c FROM scored GROUP BY 1),
        |cum AS (SELECT sc, sum(c) OVER (ORDER BY sc) AS cm FROM hist),
        |nn AS (SELECT count(*) AS n FROM scored),
        |thr AS (SELECT min(sc) AS thr FROM cum, nn WHERE cm >= (n * 30 + 99) // 100)
        |SELECT doc_id, n_tokens, surprisal_x100 FROM scored, thr
        |WHERE surprisal_x100 <= thr ORDER BY doc_id""".stripMargin,

    // temperature-sampling twin: same bounded domain counts, same
    // floor(sqrt) isqrt (IEEE-identical in both engines), same integer
    // rate division and content-hash bucket decision
    "corpus_temperature_sample" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1),
         |mn AS (SELECT min(c) AS cmin FROM c),
         |r AS (SELECT lang,
         |    10000 * CAST(floor(sqrt(CAST(cmin * c AS DOUBLE))) AS BIGINT) // c AS rate
         |  FROM c, mn),
         |h AS (SELECT doc_id, lang, md5(text) AS hx FROM documents),
         |b AS (SELECT doc_id, lang, ${hexFoldSql(1, 8)} % 10000 AS bucket FROM h)
         |SELECT doc_id, b.lang, bucket, CAST(rate AS BIGINT) AS rate_x10000
         |FROM b JOIN r USING (lang) WHERE bucket < rate
         |ORDER BY doc_id""".stripMargin,

    // selection-pipeline twin: classifier fragments -> pred gate ->
    // temperature CTEs over survivors -> disposition left-join
    "corpus_select_pipeline" ->
      s"""WITH $ClassifierFeatsCtes,
         |${classifierSolveCtes("feats")},
         |scd AS (SELECT doc_id,
         |    w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
         |       + w3 * CAST(x3 AS DOUBLE) AS score,
         |    w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
         |       + w3 * CAST(x3 AS DOUBLE) >= 0.5 AS pred
         |  FROM feats, w),
         |kl AS (SELECT s.doc_id, d.lang, b.text
         |  FROM scd s JOIN documents d USING (doc_id) JOIN base b USING (doc_id)
         |  WHERE s.pred),
         |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM kl GROUP BY 1),
         |mn AS (SELECT min(c) AS cmin FROM c),
         |r AS (SELECT lang,
         |    10000 * CAST(floor(sqrt(CAST(cmin * c AS DOUBLE))) AS BIGINT) // c AS rate
         |  FROM c, mn),
         |tb AS (SELECT k2.doc_id, ${hexFoldSql(1, 8)} % 10000 AS tbucket, r.rate
         |  FROM (SELECT doc_id, lang, md5(text) AS hx FROM kl) k2
         |  JOIN r USING (lang))
         |SELECT s.doc_id, s.score,
         |  CASE WHEN NOT s.pred THEN 'classifier_drop'
         |       WHEN tb.tbucket >= tb.rate THEN 'sampled_out'
         |       ELSE 'kept' END AS status
         |FROM scd s LEFT JOIN tb USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Bloom prefilter twin: same double-hash bit family (md5 halves, the
    // CMS convention), bit_or word build, row-wise AND membership test,
    // exact-dup audit via content-hash EXISTS
    "dedup_bloom_prefilter" -> {
      def bitsOf = s"(((${hexFoldSql(1, 15)} % 1000000007) " +
        s"+ i.i * (${hexFoldSql(17, 15)} % 1000000007)) % 1000000007) % 16384"
      s"""WITH ep AS (
         |  SELECT doc_id + 100000000 AS doc_id, text || '$Suffix' AS text
         |    FROM documents WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 200000000, text
         |    FROM documents WHERE doc_id % 25 = 0),
         |sh AS (SELECT md5(text) AS hx FROM documents),
         |bits AS (SELECT $bitsOf AS bit
         |  FROM sh, (SELECT unnest(range(0, 4)) AS i) i),
         |words AS (SELECT bit // 32 AS w,
         |    bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS m
         |  FROM bits GROUP BY 1),
         |eh AS (SELECT doc_id, md5(text) AS hx FROM ep),
         |ebits AS (SELECT doc_id, hx, $bitsOf AS bit
         |  FROM eh, (SELECT unnest(range(0, 4)) AS i) i),
         |hits AS (SELECT doc_id,
         |    bool_and((COALESCE(m, 0) &
         |      (CAST(1 AS BIGINT) << CAST(bit % 32 AS INT))) <> 0) AS bloom_hit
         |  FROM ebits LEFT JOIN words ON bit // 32 = w GROUP BY 1),
         |dup AS (SELECT e.doc_id, TRUE AS is_dup FROM eh e
         |  WHERE EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = e.hx))
         |SELECT h.doc_id, h.bloom_hit, COALESCE(dup.is_dup, FALSE) AS is_dup
         |FROM hits h LEFT JOIN dup USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    // least-squares classifier twin: SAME exact integer sums, SAME pinned
    // Cramer cofactor expansion (emitted by Selection.det4Sql — one
    // source of truth for the expression tree), SAME left-associated
    // scoring chain, so weights and scores agree bit-for-bit
    "corpus_quality_classifier" -> QualityClassifierOracle,

    "classifier_calibration" ->
      s"""WITH $ClassifierFeatsCtes,
         |${classifierSolveCtes("feats")},
         |sc AS (SELECT
         |    w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
         |       + w3 * CAST(x3 AS DOUBLE) AS score,
         |    y AS label
         |  FROM feats, w),
         |b AS (SELECT
         |    greatest(0, least(9, CAST(floor(score * 10) AS BIGINT))) AS bin,
         |    label
         |  FROM sc)
         |SELECT bin, count(*) AS n,
         |  CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // count(*) AS pos_ppm
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // holdout twin: each fold is a complete parenthesized sub-query over
    // the shared feats/solve fragments; folds split on the content-hash
    // bucket (the corpus_split discipline — leakage-safe)
    "classifier_holdout_accuracy" ->
      s"""SELECT * FROM (${classifierFoldSql(0)}
         |UNION ALL
         |${classifierFoldSql(1)}) ORDER BY fold""".stripMargin,

    // DSIR twin: md5-fold bucket hash (minhash/CMS convention), add-one
    // smoothed target/raw ratio in integer ilog2 bits, summed per doc
    "corpus_dsir_importance" ->
      s"""WITH base AS (SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || '$DsirSuffix'
         |         ELSE text END AS text,
         |    CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS y
         |  FROM documents),
         |tokr AS (SELECT doc_id, y,
         |    unnest(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM base),
         |tb AS (SELECT doc_id, y, ${hexFoldSql(1, 15)} % 64 AS b
         |  FROM (SELECT doc_id, y, md5(tok) AS hx FROM tokr)),
         |st AS (SELECT b, CAST(sum(y) AS BIGINT) AS t,
         |    CAST(count(*) AS BIGINT) AS r
         |  FROM tb GROUP BY 1),
         |tot AS (SELECT CAST(sum(t) AS BIGINT) AS bigt,
         |    CAST(sum(r) AS BIGINT) AS bigr FROM st),
         |lam AS (SELECT b,
         |    (strlen(bin((t + 1) * (bigr + 64))) - 1)
         |  - (strlen(bin((r + 1) * (bigt + 64))) - 1) AS lam
         |  FROM st, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(lam) AS BIGINT) AS dsir_bits
         |FROM tb JOIN lam USING (b) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Count-Min twin: the KM hash family over md5 halves (same fold as the
    // minhash twin), d=4 rows x w=64 buckets, estimate = min over rows
    "text_cms_heavy_hitters" ->
      s"""WITH tr AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |hh AS (SELECT tok,
         |    ${hexFoldSql(1, 15)} % 1000000007 AS h1,
         |    ${hexFoldSql(17, 15)} % 1000000007 AS h2
         |  FROM (SELECT tok, md5(tok) AS hx FROM tr)),
         |cells AS (SELECT r.r, (h1 + r.r * h2) % 1000000007 % 64 AS b
         |  FROM hh, (SELECT unnest(range(0, 4)) AS r) r),
         |sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
         |  FROM cells GROUP BY 1, 2),
         |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM tr
         |  GROUP BY 1 ORDER BY exact DESC, tok LIMIT 20),
         |eh AS (SELECT e.tok, e.exact, r.r,
         |    (${hexFoldSql(1, 15)} % 1000000007
         |      + r.r * (${hexFoldSql(17, 15)} % 1000000007)) % 1000000007 % 64 AS b
         |  FROM (SELECT tok, exact, md5(tok) AS hx FROM ex) e,
         |       (SELECT unnest(range(0, 4)) AS r) r)
         |SELECT eh.tok, eh.exact, CAST(min(sk.c) AS BIGINT) AS cms_estimate
         |FROM eh JOIN sk ON eh.r = sk.r AND eh.b = sk.b
         |GROUP BY 1, 2 ORDER BY exact DESC, tok""".stripMargin,

    // HLL twin: identical 60-bit hash, bucket/rank split, integer register
    // sum (exact powers of two — no float accumulation anywhere), and the
    // SAME pinned multiplication chain for the one floating-point division
    "text_hll_distinct" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$TokCte,
         |$ShingleCte,
         |tr AS (SELECT unnest(sg) AS tok FROM sh),
         |hh AS (SELECT ${hexFoldSql(1, 15)} AS h
         |  FROM (SELECT md5(tok) AS hx FROM tr)),
         |hb AS (SELECT h % 64 AS bucket, h // 64 AS rest FROM hh),
         |regs AS (SELECT bucket,
         |    max(least(50, 55 - CASE WHEN rest = 0 THEN 0
         |                           ELSE length(bin(rest)) END)) AS reg
         |  FROM hb GROUP BY 1),
         |sums AS (SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(50 - reg AS INT))
         |      AS BIGINT) AS s_present,
         |    CAST(count(*) AS BIGINT) AS nb FROM regs),
         |st AS (SELECT s_present + (64 - nb) * (CAST(1 AS BIGINT) << 50) AS s
         |  FROM sums),
         |ex AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
         |  FROM tr),
         |est AS (SELECT CAST(64 AS BIGINT) AS m, exact_distinct,
         |    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |      * CAST(1125899906842624 AS DOUBLE) / CAST(s AS DOUBLE) AS hll_est
         |  FROM st CROSS JOIN ex)
         |SELECT m, exact_distinct, hll_est,
         |  CAST(floor(CAST(10000 AS DOUBLE)
         |    * abs(hll_est - CAST(exact_distinct AS DOUBLE))
         |    / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_x10000
         |FROM est""".stripMargin,

    // TF-IDF twin: integer idf bits (ilog2 = bin-string length), ranked by
    // (score desc, md5-prefix term key asc) — the exact topk_pairs order
    "text_tfidf_topk" ->
      s"""WITH tr AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM tr GROUP BY 1, 2),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
         |sc AS (SELECT doc_id, tok, hx,
         |    tf * ((strlen(bin(n)) - 1) - (strlen(bin(df)) - 1)) AS score
         |  FROM (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df, md5(tf.tok) AS hx
         |        FROM tf JOIN dfq USING (tok)) x CROSS JOIN nn),
         |rk AS (SELECT doc_id, tok, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, ${hexFoldSql(1, 15)}) AS rank
         |  FROM sc)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, CAST(score AS BIGINT) AS score
         |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // BPE twin: the whole 8-round merge training rederives as a recursive
    // CTE. Symbol sequences travel as chr(1)<sym>chr(2)-bracketed strings
    // so one replace() IS the greedy-leftmost merge fold (matches can
    // never share delimiter characters); pairs count via the same
    // bracket-parse; ties break on the chr(3)-joined pair string, which
    // orders identically to (p1, p2) because chr(3) sorts below any
    // symbol byte.
    "text_bpe_train" -> s"${BpeCtes(64)}\n$BpeTrainSelect",

    "text_bpe_tokens" ->
      s"""${BpeCtes(64)},
         |v8 AS (SELECT w, len(regexp_extract_all(s,
         |    chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS n_bpe
         |  FROM bpe WHERE iter = 64),
         |tokr2 AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS ws_tokens,
         |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens
         |FROM tokr2 JOIN v8 USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // cross-doc duplicated 8-token spans at stride 4 (list slice is
    // 1-based inclusive: t[s*4+1 : s*4+8] is the 8-token window)
    "dedup_span_exact" ->
      s"""$CorpusCte,
         |tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM corpus),
         |sp AS (SELECT doc_id, md5(g) AS sh FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(t) < 8 THEN []::VARCHAR[]
         |      ELSE list_transform(range(0, (len(t)-8)//4 + 1),
         |        s -> array_to_string(t[s*4+1 : s*4+8], ' ')) END) AS g
         |  FROM tok)),
         |dup AS (SELECT sh FROM sp GROUP BY sh HAVING count(DISTINCT doc_id) > 1),
         |per AS (SELECT doc_id, count(*) AS spans FROM sp GROUP BY 1),
         |dupc AS (SELECT doc_id, count(*) AS dup_spans FROM sp
         |  WHERE sh IN (SELECT sh FROM dup) GROUP BY 1)
         |SELECT p.doc_id, CAST(p.spans AS BIGINT) AS spans,
         |  CAST(coalesce(d.dup_spans, 0) AS BIGINT) AS dup_spans,
         |  CAST(coalesce(10000 * d.dup_spans // p.spans, 0) AS BIGINT) AS dup_x10000
         |FROM per p LEFT JOIN dupc d ON p.doc_id = d.doc_id
         |ORDER BY p.doc_id""".stripMargin,

    // the composed per-doc curation report: quality reason + repetition +
    // unigram surprisal + contamination hits, one row per document
    "corpus_curation_report" -> {
      val gram8 = (0 until 8).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH q AS (SELECT doc_id, lang,
         |  len(regexp_split_to_array(text, '\\s+')) AS words,
         |  100 * length(regexp_replace(text, '\\s+', '', 'g'))
         |    // len(regexp_split_to_array(text, '\\s+')) AS avg_wlen_x100,
         |  10000 * len(list_filter(regexp_split_to_array(text, '\\s+'),
         |      t -> t IN ('the','a','of','and','to','in','is')))
         |    // len(regexp_split_to_array(text, '\\s+')) AS stop_x10000,
         |  10000 * len(regexp_extract_all(text, '[^\\w\\s]')) // length(text) AS punct_x10000
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |  CASE WHEN words < 25 THEN 'too_short'
         |       WHEN words > 5000 THEN 'too_long'
         |       WHEN avg_wlen_x100 < 380 OR avg_wlen_x100 > 1200 THEN 'word_length'
         |       WHEN stop_x10000 < 400 THEN 'low_stopword'
         |       WHEN punct_x10000 > 120 THEN 'high_punct'
         |       WHEN lang <> 'en' THEN 'non_english'
         |       ELSE NULL END AS reason
         |  FROM q),
         |rtok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
         |g3 AS (SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |    ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS g
         |  FROM rtok),
         |g2 AS (SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
         |    ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) END) AS g
         |  FROM rtok),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
         |s3 AS (SELECT doc_id, sum(c) AS grams3,
         |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3 FROM c3 GROUP BY 1),
         |s2 AS (SELECT doc_id, sum(c) AS grams2, max(c) AS top2 FROM c2 GROUP BY 1),
         |ltok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents),
         |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ltok GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
         |lb AS (SELECT doc_id,
         |    (strlen(bin(t)) - 1) - (strlen(bin(c)) - 1) AS bits
         |  FROM ltok JOIN v USING (tok) CROSS JOIN tt),
         |lm AS (SELECT doc_id, CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
         |  FROM lb GROUP BY 1),
         |dg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(t) - 6), i -> md5($gram8))) AS gh
         |  FROM rtok WHERE len(t) >= 8),
         |dp AS (SELECT DISTINCT gh FROM dg WHERE doc_id % 100 = 0),
         |ct AS (SELECT dg.doc_id, CAST(count(DISTINCT dg.gh) AS BIGINT) AS hits
         |  FROM dg JOIN dp USING (gh) WHERE dg.doc_id % 100 <> 0 GROUP BY 1)
         |SELECT d.doc_id, d.lang, r.reason, r.reason IS NULL AS keep,
         |  CAST(coalesce(10000 * s3.dup3 // s3.grams3, 0) AS BIGINT) AS dup3_x10000,
         |  CAST(coalesce(10000 * s2.top2 // s2.grams2, 0) AS BIGINT) AS top2_x10000,
         |  lm.surprisal_x100,
         |  coalesce(ct.hits, 0) AS contam_hits
         |FROM documents d
         |JOIN r ON d.doc_id = r.doc_id
         |LEFT JOIN s3 ON d.doc_id = s3.doc_id
         |LEFT JOIN s2 ON d.doc_id = s2.doc_id
         |LEFT JOIN lm ON d.doc_id = lm.doc_id
         |LEFT JOIN ct ON d.doc_id = ct.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // the executable AND of the curation signals + content-hash split
    "corpus_filter_pipeline" -> {
      val gram8 = (0 until 8).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH q AS (SELECT doc_id, lang,
         |  len(regexp_split_to_array(text, '\\s+')) AS words,
         |  100 * length(regexp_replace(text, '\\s+', '', 'g'))
         |    // len(regexp_split_to_array(text, '\\s+')) AS avg_wlen_x100,
         |  10000 * len(list_filter(regexp_split_to_array(text, '\\s+'),
         |      t -> t IN ('the','a','of','and','to','in','is')))
         |    // len(regexp_split_to_array(text, '\\s+')) AS stop_x10000,
         |  10000 * len(regexp_extract_all(text, '[^\\w\\s]')) // length(text) AS punct_x10000
         |  FROM documents),
         |r AS (SELECT doc_id,
         |  CASE WHEN words < 25 THEN 'too_short'
         |       WHEN words > 5000 THEN 'too_long'
         |       WHEN avg_wlen_x100 < 380 OR avg_wlen_x100 > 1200 THEN 'word_length'
         |       WHEN stop_x10000 < 400 THEN 'low_stopword'
         |       WHEN punct_x10000 > 120 THEN 'high_punct'
         |       WHEN lang <> 'en' THEN 'non_english'
         |       ELSE NULL END AS reason
         |  FROM q),
         |rtok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
         |g3 AS (SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |    ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS g
         |  FROM rtok),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
         |s3 AS (SELECT doc_id, sum(c) AS grams3,
         |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3 FROM c3 GROUP BY 1),
         |ltok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents),
         |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ltok GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
         |lb AS (SELECT doc_id,
         |    (strlen(bin(t)) - 1) - (strlen(bin(c)) - 1) AS bits
         |  FROM ltok JOIN v USING (tok) CROSS JOIN tt),
         |lm AS (SELECT doc_id, CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
         |  FROM lb GROUP BY 1),
         |dg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(t) - 6), i -> md5($gram8))) AS gh
         |  FROM rtok WHERE len(t) >= 8),
         |dp AS (SELECT DISTINCT gh FROM dg WHERE doc_id % 100 = 0),
         |ct AS (SELECT dg.doc_id, count(DISTINCT dg.gh) AS hits
         |  FROM dg JOIN dp USING (gh) WHERE dg.doc_id % 100 <> 0 GROUP BY 1),
         |hb AS (SELECT doc_id, ${hexFoldSql(1, 8)} % 100 AS bucket
         |  FROM (SELECT doc_id, md5(text) AS hx FROM documents))
         |SELECT d.doc_id, hb.bucket,
         |  CASE WHEN hb.bucket < 80 THEN 'train'
         |       WHEN hb.bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d
         |JOIN r ON d.doc_id = r.doc_id
         |LEFT JOIN s3 ON d.doc_id = s3.doc_id
         |LEFT JOIN lm ON d.doc_id = lm.doc_id
         |LEFT JOIN ct ON d.doc_id = ct.doc_id
         |JOIN hb ON d.doc_id = hb.doc_id
         |WHERE r.reason IS NULL
         |  AND coalesce(10000 * s3.dup3 // s3.grams3, 0) <= 5000
         |  AND coalesce(lm.surprisal_x100, 0) <= 2000
         |  AND ct.hits IS NULL
         |ORDER BY d.doc_id""".stripMargin
    },

    // mixture rebalancing: rate = min(100%, budget·weight / stratum_tokens),
    // sampled on the same 8-hex-digit content bucket as the split twin
    "corpus_mix_domains" ->
      s"""WITH wt AS (SELECT doc_id, lang, md5(text) AS hx,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS stratum_tokens,
         |    least(10000, CAST(20000 * (CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 50
         |        WHEN 'de' THEN 10 WHEN 'es' THEN 5 WHEN 'fr' THEN 5 ELSE 0 END) * 100
         |      // sum(n_tokens) AS BIGINT)) AS rate_x10000
         |  FROM wt GROUP BY 1)
         |SELECT w.doc_id, w.lang, w.n_tokens, r.stratum_tokens, r.rate_x10000
         |FROM wt w JOIN r ON w.lang = r.lang
         |WHERE (${hexFoldSql(1, 8)} % 100) * 100 < r.rate_x10000
         |ORDER BY w.doc_id""".stripMargin,

    // synthesis twin: the corpus plants PNG (33-byte sig+IHDR+CRC) or JFIF
    // JPEG (39-byte SOI+APP0+SOF0) headers with dimensions a closed form of
    // doc_id; Spark must recover them by PARSING the bytes (the structural
    // parse itself is spec-verified against ImageIO-encoded real files)
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39
        |    ELSE 0 END AS BIGINT) AS bytes,
        |  md5(text) AS payload_md5,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |    ELSE doc_id % 1920 + 1 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0
        |    ELSE (doc_id * 7) % 1080 + 1 END AS BIGINT) AS height,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'raw'
        |    END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // audio twin: the synthesized 44-byte PCM WAV params are a closed form
    // of doc_id (the header bytes themselves are spec-valid and verified
    // against javax.sound in ExtSpec); n_samples = data bytes / block align
    "multimodal_audio_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) + 44 AS BIGINT) AS bytes,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |    ELSE 44100 END AS BIGINT) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(strlen(text) // ((doc_id % 2 + 1) * 2) AS BIGINT) AS n_samples,
        |  'wav' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // full-value decode check: every 16-bit LE PCM word is two consecutive
    // ASCII text bytes (lo + 256·hi, always in [0, 32768) — no sign
    // handling), so the oracle rebuilds the sample stream from the text
    // and must match the Spark side's real WAV-decode reduction exactly
    "multimodal_audio_energy" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    ord(substr(text, CAST(2 * i + 1 AS INT), 1))
        |      + 256 * ord(substr(text, CAST(2 * i + 2 AS INT), 1)) AS word
        |  FROM (SELECT doc_id, text,
        |          unnest(range(0, strlen(text) // 2)) AS i
        |        FROM documents))
        |SELECT doc_id, count(*) AS n_samples,
        |  CAST(sum(word * word) AS BIGINT) AS energy,
        |  CAST(max(word) AS BIGINT) AS peak
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // full-value image check: the pattern is r=(x·31+id)%256,
    // g=(y·17+3id)%256, b=(x·y+7id)%256 over a w×h = (id%13+4)×(id%11+4)
    // grid — the oracle sums the formula directly; Spark must reproduce it
    // through the real PNG encode + ImageIO decode
    "multimodal_image_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
        |pxy AS (SELECT doc_id, x, unnest(range(0, h)) AS y, w, h FROM px)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum((x * 31 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((y * 17 + doc_id * 3) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x * y + doc_id * 7) % 256) AS BIGINT) AS sum_b,
        |  true AS decodable
        |FROM pxy GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // video twin: the synthesized MP4 skeleton (ftyp 20 + moov 116 + mdat
    // header 8 = 144 bytes) carries closed-form mvhd params of doc_id;
    // duration_ms = whole seconds * 1000 exactly
    "multimodal_video_meta" ->
      """SELECT doc_id,
        |  CAST(strlen(text) + 144 AS BIGINT) AS bytes,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |    ELSE 90000 END AS BIGINT) AS timescale,
        |  CAST((doc_id % 120 + 1) * CASE doc_id % 3 WHEN 0 THEN 600
        |    WHEN 1 THEN 1000 ELSE 90000 END AS BIGINT) AS duration,
        |  CAST((doc_id % 120 + 1) * 1000 AS BIGINT) AS duration_ms,
        |  'mp4' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // strided byte subsample — documents are all-ASCII so SQL char positions
    // equal the stub's byte offsets (substr is 1-based, the stub 0-based)
    "multimodal_resize" ->
      """WITH p AS (SELECT doc_id, text, strlen(text) AS len,
        |  greatest(1, strlen(text) // 64) AS k FROM documents)
        |SELECT doc_id, CAST(len AS BIGINT) AS src_bytes, CAST(k AS BIGINT) AS stride,
        |  CAST(least(64, len) AS BIGINT) AS out_bytes,
        |  md5(array_to_string(list_transform(range(0, least(64, len)),
        |    i -> substr(text, CAST(1 + i*k AS INT), 1)), '')) AS digest
        |FROM p ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(substr(text, CAST(i*64 + 1 AS INT), 64)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, strlen(text) // 64)) AS i FROM documents)
        |WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin,

    "dedup_keep_canonical" ->
      s"""${MinhashScoredCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (SELECT ida, idb FROM scored WHERE jacc_x10000 >= 5000),
         |edges AS (SELECT ida AS a, idb AS b FROM pairs
         |          UNION SELECT idb, ida FROM pairs),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS comp
         |         FROM reach GROUP BY 1)
         |SELECT c.doc_id, coalesce(m.comp, c.doc_id) AS cluster
         |FROM corpus c LEFT JOIN comp m ON c.doc_id = m.doc_id
         |WHERE m.comp IS NULL OR m.comp = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "corpus_quality_filter" ->
      """WITH q AS (SELECT doc_id, lang,
        |  len(regexp_split_to_array(text, '\s+')) AS words,
        |  100 * length(regexp_replace(text, '\s+', '', 'g'))
        |    // len(regexp_split_to_array(text, '\s+')) AS avg_wlen_x100,
        |  10000 * len(list_filter(regexp_split_to_array(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is')))
        |    // len(regexp_split_to_array(text, '\s+')) AS stop_x10000,
        |  10000 * len(regexp_extract_all(text, '[^\w\s]')) // length(text) AS punct_x10000
        |  FROM documents),
        |r AS (SELECT doc_id, words, avg_wlen_x100, stop_x10000, punct_x10000,
        |  CASE WHEN words < 25 THEN 'too_short'
        |       WHEN words > 5000 THEN 'too_long'
        |       WHEN avg_wlen_x100 < 380 OR avg_wlen_x100 > 1200 THEN 'word_length'
        |       WHEN stop_x10000 < 400 THEN 'low_stopword'
        |       WHEN punct_x10000 > 120 THEN 'high_punct'
        |       WHEN lang <> 'en' THEN 'non_english'
        |       ELSE NULL END AS reason
        |  FROM q)
        |SELECT doc_id, words, avg_wlen_x100, stop_x10000, punct_x10000,
        |  reason, reason IS NULL AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // e2e pipeline twin: quality gate → exact dedup → minhash/CC near-dup
    // dedup → hash split, each stage over the previous stage's survivors.
    // `corpus` is the minhash chain's input CTE, here defined mid-pipeline.
    "corpus_pipeline_e2e" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 100000000, text || '$Suffix', lang FROM documents WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 200000000, text, lang FROM documents WHERE doc_id % 25 = 0),
         |qm AS (SELECT doc_id, lang,
         |  len(regexp_split_to_array(text, '\\s+')) AS words,
         |  100 * length(regexp_replace(text, '\\s+', '', 'g'))
         |    // len(regexp_split_to_array(text, '\\s+')) AS awl,
         |  10000 * len(list_filter(regexp_split_to_array(text, '\\s+'),
         |      t -> t IN ('the','a','of','and','to','in','is')))
         |    // len(regexp_split_to_array(text, '\\s+')) AS stopr,
         |  10000 * len(regexp_extract_all(text, '[^\\w\\s]')) // length(text) AS punctr
         |  FROM base),
         |q AS (SELECT doc_id,
         |  CASE WHEN words < 25 THEN 'too_short'
         |       WHEN words > 5000 THEN 'too_long'
         |       WHEN awl < 380 OR awl > 1200 THEN 'word_length'
         |       WHEN stopr < 400 THEN 'low_stopword'
         |       WHEN punctr > 120 THEN 'high_punct'
         |       WHEN lang <> 'en' THEN 'non_english'
         |       ELSE NULL END AS reason
         |  FROM qm),
         |qdrops AS (SELECT doc_id, 'quality:' || reason AS status
         |  FROM q WHERE reason IS NOT NULL),
         |kept1 AS (SELECT b.doc_id, b.text FROM base b
         |  JOIN q ON b.doc_id = q.doc_id WHERE q.reason IS NULL),
         |ckd AS (SELECT doc_id, text, md5(text) AS k FROM kept1),
         |canon AS (SELECT k, min(doc_id) AS keep_id FROM ckd GROUP BY 1),
         |exdrops AS (SELECT c.doc_id, 'exact_dup' AS status
         |  FROM ckd c JOIN canon USING (k) WHERE c.doc_id <> keep_id),
         |corpus AS (SELECT c.doc_id, c.text FROM ckd c
         |  JOIN canon ON c.k = canon.k AND c.doc_id = canon.keep_id),
         |$MinhashFromCorpus,
         |pairs AS (SELECT ida, idb FROM scored WHERE jacc_x10000 >= 5000),
         |edges AS (SELECT ida AS a, idb AS b FROM pairs
         |          UNION SELECT idb, ida FROM pairs),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS comp
         |         FROM reach GROUP BY 1),
         |neardrops AS (SELECT c.doc_id, 'near_dup' AS status
         |  FROM corpus c JOIN comp m USING (doc_id) WHERE m.comp <> c.doc_id),
         |keptfinal AS (SELECT c.doc_id, c.text FROM corpus c
         |  LEFT JOIN comp m USING (doc_id)
         |  WHERE m.comp IS NULL OR m.comp = c.doc_id),
         |buckets AS (SELECT doc_id, ${hexFoldSql(1, 8)} % 100 AS bucket
         |  FROM (SELECT doc_id, md5(text) AS hx FROM keptfinal)),
         |keptrows AS (SELECT doc_id, 'kept' AS status,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM buckets)
         |SELECT doc_id, status, split FROM (
         |  SELECT doc_id, status, CAST(NULL AS VARCHAR) AS split FROM qdrops
         |  UNION ALL SELECT doc_id, status, CAST(NULL AS VARCHAR) FROM exdrops
         |  UNION ALL SELECT doc_id, status, CAST(NULL AS VARCHAR) FROM neardrops
         |  UNION ALL SELECT doc_id, status, split FROM keptrows)
         |ORDER BY doc_id""".stripMargin,

    // 8-gram exact-collision decontamination: grams built positionally
    // (t[i]..t[i+7]), md5-hashed, probe = every 100th doc; the same fixed
    // 8-token phrase is planted on every 50th doc so contamination exists
    "corpus_decontaminate" -> {
      val gram = (0 until 8).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN doc_id % 50 = 0 THEN text || ' $ContaminationPlant'
         |         ELSE text END AS text
         |  FROM documents),
         |tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
         |  FROM d),
         |g AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(t) - 6), i -> md5($gram))) AS gh
         |  FROM tok WHERE len(t) >= 8),
         |p AS (SELECT DISTINCT gh FROM g WHERE doc_id % 100 = 0)
         |SELECT g.doc_id, CAST(count(DISTINCT g.gh) AS BIGINT) AS hits
         |FROM g JOIN p USING (gh)
         |WHERE g.doc_id % 100 <> 0
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin
    },

    // per-language content-hash sampling: same 8-hex-digit fold as the
    // split twin; en downsampled to 20%, everything else 50%
    "corpus_stratified_sample" ->
      s"""WITH h AS (SELECT doc_id, lang, md5(text) AS hx FROM documents),
         |b AS (SELECT doc_id, lang, ${hexFoldSql(1, 8)} % 100 AS bucket FROM h)
         |SELECT doc_id, lang, bucket FROM b
         |WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
         |ORDER BY doc_id""".stripMargin,

    // shard-local greedy packing twin: same start-offset window cumsum
    "corpus_pack_bins" ->
      """SELECT doc_id, doc_id % 8 AS shard,
        |  len(regexp_split_to_array(text, '\s+')) AS n_tokens,
        |  CAST((sum(len(regexp_split_to_array(text, '\s+')))
        |          OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |        - len(regexp_split_to_array(text, '\s+'))) // 2048 AS BIGINT) AS bin
        |FROM documents ORDER BY doc_id""".stripMargin,

    // content-hash split: same 8-hex-digit fold as the minhash twin
    "corpus_split" ->
      s"""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
         |b AS (SELECT doc_id, ${hexFoldSql(1, 8)} % 100 AS bucket FROM h)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "text_vocab_topk" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin,

    // evaluation order pinned both sides: (x / scale) * 127, then floor —
    // IEEE-deterministic elementwise, no accumulation
    "emb_quantize_int8" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS scale FROM e)
        |SELECT vec_id, scale,
        |  array_to_string(
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(floor(x / scale * 127) AS BIGINT))
        |    END, ',') AS q
        |FROM s ORDER BY vec_id""".stripMargin,

    // JL random projection twin: the same seeded plane literals as the
    // Spark side (Double.toString round-trips), each component one
    // sequential dot fold, floor-scaled to ints, CSV-joined
    "emb_random_projection" -> {
      val comps = Embeddings.projectionPlanes(16, 64, 7L).map { p =>
        val planeLit = p.map(d => s"CAST($d AS DOUBLE)").mkString("([", ", ", "])")
        s"CAST(floor(${dotSql("v", planeLit)} * 1000000) AS BIGINT)"
      }
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
         |SELECT vec_id,
         |  array_to_string([${comps.mkString(",\n    ")}], ',') AS proj_x1e6
         |FROM e ORDER BY vec_id""".stripMargin
    },

    "emb_normalize" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |s AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) AS norm FROM e)
         |SELECT vec_id, norm,
         |  array_to_string(
         |    CASE WHEN norm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
         |         ELSE list_transform(v, x -> CAST(floor(x / norm * 1000000) AS BIGINT))
         |    END, ',') AS unit_x1e6
         |FROM s ORDER BY vec_id""".stripMargin,

    // PCA twin: the ENTIRE training rederives in SQL — integer moments
    // (order-free sums), covariance, then the power-iteration/deflation
    // recursion with the same pinned fold orders as PcaTrainer.trainPca
    "emb_pca" -> pcaRecursiveOracle(
      pExpr = s"CAST(floor(${dotSql("c", "v")}) AS BIGINT)",
      outCol = "pca"),

    // whitening twin: the SAME recursive power-iteration CTE, with the
    // deflation-step eigenvalue surfaced per component and the projection
    // divided by sqrt(lam) then x1000-floored (pinned left-to-right)
    "emb_whiten" -> pcaRecursiveOracle(
      pExpr = s"CAST(floor(${dotSql("c", "v")} / sqrt(lam) * 1000.0) AS BIGINT)",
      outCol = "whitened"),

    // integer-quantized second-moment matrix: long sums are order-free, so
    // a plain SQL group-by reproduces the distributed aggregate bit for bit
    "emb_gram" ->
      """WITH q AS (SELECT
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |idx AS (SELECT j.j, l.l
        |  FROM (SELECT unnest(range(0, 64)) AS j) j,
        |       (SELECT unnest(range(0, 64)) AS l) l)
        |SELECT idx.j, idx.l,
        |  CAST(sum(q.q[CAST(idx.j + 1 AS INT)] * q.q[CAST(idx.l + 1 AS INT)]) AS BIGINT) AS g
        |FROM q, idx GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    // persisted IVF+PQ / IVF+SQ8 are result-identical to the in-memory
    // plans — the in-memory oracles ARE the twins (the ann_ivf_persisted
    // contract)
    .pipe(m => m + ("ann_ivf_pq_persisted" -> m("ann_ivf_pq"))
      + ("ann_ivf_sq8_persisted" -> m("ann_ivf_sq8"))
      // cluster-size histogram wraps the CC oracle as a subquery
      + ("dedup_cluster_stats" ->
        s"""SELECT n_members, CAST(count(*) AS BIGINT) AS n_clusters
           |FROM (SELECT comp, CAST(count(*) AS BIGINT) AS n_members
           |      FROM (${m("dedup_cluster_components")}) GROUP BY comp)
           |GROUP BY n_members ORDER BY n_members""".stripMargin))
}
