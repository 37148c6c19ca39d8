package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a (id, text) corpus. Designed for the
  * 100 TB shape: every variant is a bounded number of shuffles on keys
  * derived per-row (hash / signature / bucket), never an all-pairs compare —
  * except the explicitly-naive exact-verification step, which only runs on
  * LSH candidate pairs.
  */
object Dedup {
  /** Exact dedup: hash-groupBy on content, keep the minimum id. One shuffle
    * on a (hashable) content key; at scale, group on md5(text) instead of
    * raw text to bound shuffle width. */
  def exact(corpus: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    corpus.groupBy(md5(col(text)).as("content_key"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n"))
      .select("keep_id", "n")

  /** CROSS-SOURCE exact-duplicate groups — the mirror/syndication signal:
    * identical content appearing under MORE THAN ONE source is how
    * train/test leakage and over-represented boilerplate usually enter a
    * crawl (the same article syndicated across domains). One
    * map-side-combined agg on md5(text): per duplicated content, the
    * canonical doc (min id), copy count, distinct-source count, and the
    * sorted source list (bounded by the source vocabulary) — only groups
    * spanning ≥2 sources survive.
    *
    * Output: `(keep_id, n_docs, n_sources, sources)` — `sources` is a
    * comma-joined sorted distinct list (a sortable scalar, per the
    * harness-compare contract). */
  def crossSourceDups(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("content_key"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        concat_ws(",", array_sort(collect_set(col("source")))).as("sources"))
      .filter(col("n_sources") >= 2)
      .select("keep_id", "n_docs", "n_sources", "sources")

  /** Cross-document duplicated-SPAN statistics — the window-hash
    * approximation of exact substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": remove
    * verbatim ≥50-token substrings shared across documents; suffix arrays
    * don't distribute, overlapping fixed windows do). Each document emits
    * hashed `window`-token spans at `stride`; a span whose hash occurs in
    * MORE THAN ONE document is a cross-doc duplicate. Output per doc:
    * total spans, duplicated spans, and the scaled duplicated fraction —
    * the per-document signal a pipeline uses to clip or drop boilerplate
    * regions that whole-document and near-dup dedup both miss. (Docs under
    * `window` tokens emit no spans and therefore no row.)
    *
    * Scale shape: spans build row-locally (strided slice of the token
    * array — no token shuffle), explode once into a PERSISTED
    * (sh, doc_id, occ) table — compact: ~tokens/stride rows, an eighth
    * of the token stream at the defaults, MEMORY_AND_DISK so it spills
    * rather than OOMs. The three consumers (duplicate-span set, per-doc
    * duplicated occurrences, per-doc totals) prune different columns, so
    * exchange reuse cannot unify them — without the persist each one
    * re-scans, re-tokenizes and re-hashes the full corpus. Every shuffle
    * key is high-cardinality with map-side partial aggregation; no
    * per-group funnel, no broadcast of anything corpus-sized. */
  def spanDupStats(corpus: DataFrame, window: Int = 8, stride: Int = 4): DataFrame = {
    val spansCol = {
      val toks = col("toks")
      when(size(toks) < window, array().cast("array<string>"))
        .otherwise(transform(
          // start positions 1, 1+stride, … while start+window−1 ≤ size
          sequence(lit(0), ((size(toks) - window) / stride).cast("int")),
          s => concat_ws(" ",
            (0 until window).map(k => element_at(toks, s * stride + k + 1)): _*)))
    }
    // ONE (sh, doc_id) pre-aggregation feeds all three consumers below;
    // grouping on the pair also replaces a two-phase countDistinct with a
    // plain count of pre-distinct rows
    val spanDocs = corpus
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(spansCol).as("span"))
      .select(col("doc_id"), md5(col("span")).as("sh"))
      .groupBy("sh", "doc_id").agg(count(lit(1)).as("occ"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dupSh = spanDocs.groupBy("sh").agg(count(lit(1)).as("nd"))
        .filter(col("nd") > 1).select("sh")
      val dupPerDoc = spanDocs.join(dupSh, Seq("sh"), "left_semi")
        .groupBy("doc_id").agg(sum("occ").as("dup_spans"))
      spanDocs.groupBy("doc_id").agg(sum("occ").as("spans"))
        .join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("spans"),
          coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
          coalesce((lit(10000L) * col("dup_spans") / col("spans")).cast("long"),
            lit(0L)).as("dup_x10000"))
        // eagerly materialize the (|docs|-row) RESULT and cut its lineage,
        // so the big span-table cache can be dropped HERE instead of
        // accumulating across calls in a long-lived session (the returned
        // frame would otherwise keep depending on it). Output blocks are
        // ContextCleaner-managed: freed when the frame is GC'd.
        .transform(graft.config.Lineage.cut)
    } finally spanDocs.unpersist()
  }

  /** The REMOVAL half of exact substring dedup (Lee et al. 2022) that
    * [[spanDupStats]] only measures: mark every non-first occurrence of a
    * repeated `window`-token span (global keep-first by (doc_id, start)),
    * merge the marked occurrences' token ranges into maximal islands, cut
    * those tokens out, and emit per doc the token totals, removed count,
    * island count, and the md5 of the REBUILT text — the fingerprint pins
    * the exact surviving byte stream without shipping corpus-sized strings
    * through the compare.
    *
    * Scale shape — everything is linear in the token stream:
    *   - tokens posexplode row-locally; spans build with `window−1`
    *     `lead`s over a doc_id-partitioned window (docs are bounded, so
    *     partitions are; NO array-indexed-from-lambda anywhere — the
    *     interpreted-HOF inlining trap measured at 181 s/key in round 9);
    *   - keep-first marking is one groupBy on the high-cardinality span
    *     hash with map-side partial agg, joined back once;
    *   - removed positions explode from ranges (≤ token count rows),
    *     dedupe, and anti-join the token rows;
    *   - the rebuild is a per-doc sort-free aggregate: array_sort over a
    *     collect_list of (pos, tok) structs — the array a lambda then
    *     reads comes OUT OF AN AGGREGATE, the trap-safe source.
    * No driver collect, no all-pairs, no corpus-sized broadcast. */
  def spanClean(corpus: DataFrame, window: Int = 8, stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tokRows = corpus
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .persist(mem)
    try {
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val spanStr = concat_ws(" ",
        col("tok") +: (1 until window).map(k => lead(col("tok"), k).over(wDoc)): _*)
      // spans start at every stride-th position with a full window ahead
      // (lead(window−1) non-null ⇔ start+window ≤ n) — the spanDupStats
      // span set, but carrying its start position
      val occ = tokRows
        .select(col("doc_id"), col("pos").as("start"),
          lead(col("tok"), window - 1).over(wDoc).as("last"), spanStr.as("span"))
        .filter(col("start") % stride === 0 && col("last").isNotNull)
        .select(col("doc_id"), col("start"), md5(col("span")).as("sh"))
        .persist(mem)
      try {
        val grp = occ.groupBy("sh").agg(count(lit(1)).as("cnt"),
          min(struct(col("doc_id"), col("start"))).as("first"))
        val dup = occ.join(grp, "sh")
          .filter(col("cnt") > 1 &&
            !(struct(col("doc_id"), col("start")) === col("first")))
          .select(col("doc_id"), col("start"),
            (col("start") + window - 1).as("e"))
        val rem = dup
          .select(col("doc_id"), explode(sequence(col("start"), col("e"))).as("pos"))
          .distinct()
          .persist(mem)
        try {
          val isl = rem
            .withColumn("prev", lag(col("pos"), 1).over(wDoc))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("removed_tokens"),
              sum(when(col("prev").isNull || col("pos") - col("prev") > 1, 1L)
                .otherwise(0L)).as("n_islands"))
          val clean = tokRows.join(rem, Seq("doc_id", "pos"), "left_anti")
            .groupBy("doc_id")
            .agg(md5(array_join(
              transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
                x => x.getField("tok")), " ")).as("clean_md5"))
          tokRows.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
            .join(isl, Seq("doc_id"), "left")
            .join(clean, Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_tokens"),
              coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
              coalesce(col("n_islands"), lit(0L)).as("n_islands"),
              coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
            .transform(graft.config.Lineage.cut)
        } finally rem.unpersist()
      } finally occ.unpersist()
    } finally tokRows.unpersist()
  }

  /** Distinct-token set (order-preserving ops not needed for Jaccard). */
  private def tokSet(text: Column): Column = array_distinct(TextAnalysis.tokens(text))

  /** Scaled-integer Jaccard over two token arrays: floor(10000·|∩|/|∪|). */
  def jaccardX10000(ta: Column, tb: Column): Column = {
    val da = array_distinct(ta)
    val db = array_distinct(tb)
    val inter = size(array_intersect(da, db)).cast("long")
    val uni = size(da).cast("long") + size(db) - inter
    (lit(10000L) * inter / uni).cast("long")
  }

  /** Scaled-integer CONTAINMENT (Broder 1997's asymmetric resemblance):
    * floor(10000·|A∩B|/|A|) — "how much of A is inside B". The signal
    * Jaccard under-reports when one document wholly contains another
    * (quote expansion, article + appended boilerplate): a short doc fully
    * embedded in a long one has low Jaccard but containment 10000. */
  def containmentX10000(ta: Column, tb: Column): Column = {
    val da = array_distinct(ta)
    val db = array_distinct(tb)
    val inter = size(array_intersect(da, db)).cast("long")
    (lit(10000L) * inter / size(da).cast("long")).cast("long")
  }

  /** MinHash + LSH near-dup pairs: exact-dup pre-collapse → shingle →
    * n-hash signature → band buckets → bucket-join for candidates → exact
    * Jaccard verify at `thresholdX10000`. The candidate join shuffles on
    * (band, bucket) — collision groups, not the corpus cross product.
    *
    * The pre-collapse is the hot-bucket defense: byte-identical documents
    * (boilerplate — the dominant duplication mode in web corpora, and the
    * one way an LSH bucket degenerates quadratically) share ALL band
    * buckets by construction. Collapsing them to one representative per
    * md5(text) BEFORE signing keeps every bucket's occupancy at the
    * near-dup rate, and the output is recovered exactly: identical docs
    * have identical token sets, so a representative pair's verified
    * Jaccard is every member pair's Jaccard, and within-group pairs are
    * Jaccard 10000 by definition. Both expansions are content-key
    * equi-joins — the per-group quadratic that remains is intrinsic to the
    * requested all-pairs OUTPUT, not an artifact of the bucket shuffle.
    *
    * `maxBucket` (opt-in) additionally drops residual oversized buckets —
    * near-identical-but-not-equal templated text — trading recall for a
    * hard bound; dropped buckets are counted and logged loudly, never
    * silently.
    */
  def minhashLshPairs(corpus: DataFrame, n: Int = 32, bands: Int = 4,
      thresholdX10000: Long = 5000L, maxBucket: Int = 0): DataFrame = {
    val (groups, repPairs) = lshRepState(corpus, n, bands, thresholdX10000, maxBucket)
    // expand representative pairs to every cross-group member pair (content
    // keys partition docs, so each unordered pair is produced exactly once)
    val repIds = groups.select(col("r.doc_id").as("rep"), col("ids"))
    val expanded = repPairs
      .join(repIds.select(col("rep").as("ida"), col("ids").as("idsa")), "ida")
      .join(repIds.select(col("rep").as("idb"), col("ids").as("idsb")), "idb")
      .select(explode(col("idsa")).as("ma"), col("idsb"), col("jacc_x10000"))
      .select(col("ma"), explode(col("idsb")).as("mb"), col("jacc_x10000"))
      .select(least(col("ma"), col("mb")).as("ida"),
        greatest(col("ma"), col("mb")).as("idb"), col("jacc_x10000"))
    // within-group pairs: byte-identical docs are Jaccard 10000 and always
    // bucket-collide, so they are unconditionally in the exact output
    // (ids is sorted, so the generated (x, y) honor ida < idb)
    val identical = groups
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y ->
          |    struct(x AS ida, y AS idb))))""".stripMargin)).as("p"))
      .select(col("p.ida"), col("p.idb"), lit(10000L).as("jacc_x10000"))
    if (thresholdX10000 <= 10000L) expanded.unionAll(identical) else expanded
  }

  /** The representative-level LSH state shared by [[minhashLshPairs]] and
    * [[keepCanonicalLsh]]: `groups` = one row per distinct content
    * (representative struct `r` + sorted member-id array `ids`, ONE content
    * shuffle), and `repPairs` = Jaccard-verified near-dup pairs between
    * representatives only. Everything member-level (pair expansion,
    * cluster attachment) derives from `groups` afterwards — the clustering
    * itself never sees the O(group²) member pairs. */
  private def lshRepState(corpus: DataFrame, n: Int, bands: Int,
      thresholdX10000: Long, maxBucket: Int): (DataFrame, DataFrame) = {
    // ONE content shuffle: per distinct text, the representative (min id +
    // text) and the sorted member-id list. Everything downstream — the
    // identical pairs and the member expansion — reads the id arrays, so no
    // further corpus-wide shuffle exists (the expansion joins are against
    // the tiny verified-pair set, which AQE broadcasts), and Catalyst
    // reuses this exchange across the three consumers. Member arrays are
    // bounded by the identical-group size — the same bound the all-pairs
    // OUTPUT itself carries.
    val groups = corpus
      .select(col("doc_id"), col("text"), md5(col("text")).as("ck"))
      .groupBy("ck")
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"),
        sort_array(collect_list(col("doc_id"))).as("ids"))
    val reps = groups.select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    // (doc_id, band, bucket) over DISTINCT texts — ids only; token arrays
    // stay out of the bucket shuffle.
    val allBuckets = bandBuckets(reps, n, bands)
    val buckets =
      if (maxBucket <= 0) allBuckets
      else {
        // LAZY cap: building the DataFrame must not run a Spark job. Sizes
        // come from a groupBy + same-key join (the size agg reuses the
        // (band,bucket) exchange the candidate join needs anyway, vs. the
        // extra unpartitioned-ordered window shuffle), and drop counts are
        // surfaced through an `observe` metric in the SAME job that does the
        // filtering — readable in the UI / QueryExecutionListener — instead
        // of an eager side-count action here.
        org.apache.log4j.Logger.getLogger(getClass).warn(
          s"minhashLshPairs: bucket cap ACTIVE (maxBucket=$maxBucket) — " +
            "recall is bounded, not exact; dropped counts are in the " +
            "'minhash_lsh_bucket_cap' observed metric " +
            "(dropped_doc_slots, dropped_buckets)")
        val sizes = allBuckets.groupBy("band", "bucket")
          .agg(count(lit(1)).as("bsz"))
        allBuckets.join(sizes, Seq("band", "bucket"))
          .observe("minhash_lsh_bucket_cap",
            sum(when(col("bsz") > maxBucket, 1L).otherwise(0L))
              .as("dropped_doc_slots"),
            // each dropped bucket contributes bsz · (1/bsz) = exactly 1
            sum(when(col("bsz") > maxBucket, lit(1.0) / col("bsz")))
              .as("dropped_buckets"))
          .filter(col("bsz") <= maxBucket).drop("bsz")
      }
    val cand = buckets.as("a")
      .join(buckets.as("b"), Seq("band", "bucket"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .filter(col("ida") < col("idb"))
      .distinct()
    // Exact verification only on the candidate (representative) pairs.
    val toks = reps.select(col("doc_id"), tokSet(col("text")).as("t"))
    val repPairs = cand
      .join(toks.select(col("doc_id").as("ida"), col("t").as("ta")), "ida")
      .join(toks.select(col("doc_id").as("idb"), col("t").as("tb")), "idb")
      .select(col("ida"), col("idb"), jaccardX10000(col("ta"), col("tb")).as("jacc_x10000"))
      .filter(col("jacc_x10000") >= thresholdX10000)
    (groups, repPairs)
  }

  /** SimHash signatures for the corpus (near-dups ⇒ small Hamming distance);
    * pair-finding groups on the signature (or banded bit-prefixes at scale). */
  def simhashSignatures(corpus: DataFrame): DataFrame =
    TextAnalysis.simhash16Rows(corpus)

  /** Direct n-gram-Jaccard score between paired docs (the verification
    * primitive; pair GENERATION at scale comes from [[minhashLshPairs]]). */
  def ngramJaccardPairs(pairs: DataFrame, ta: String, tb: String): DataFrame =
    pairs.withColumn("jacc_x10000",
      jaccardX10000(TextAnalysis.tokens(col(ta)), TextAnalysis.tokens(col(tb))))

  /** Embedding near-dup pairs at cosine ≥ `threshold` — the bucketed scale
    * path (replaces an O(|corpus|·|probes|) cross join). Both sides are
    * bucketed by the SAME sign-LSH in one narrow pass each; candidate pairs
    * come from the bucket equi-join (the small probe side broadcast, so the
    * corpus never shuffles); the exact cosine verify runs on candidates only
    * — expected |corpus|·|probes| / 2^planes compares. At a threshold this
    * close to 1 the true pairs are (near-)identical vectors, which bucket
    * identically by construction; raise the plane count as the corpus grows
    * to keep expected bucket occupancy bounded.
    *
    * Inputs: `corpus(vec_id, embedding)`, `probes(vec_id, embedding)`.
    * Output: `(ida = probe id, idb = corpus id, sim)`.
    */
  def embeddingCosinePairs(corpus: DataFrame, probes: DataFrame,
      planes: Array[Array[Double]], threshold: Double,
      multiProbe: Boolean = false): DataFrame = {
    val bucketed = corpus
      .withColumn("bucket", Similarity.lshBucket(col("embedding"), planes))
    val pb = probes
      .select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .withColumn("bucket0", Similarity.lshBucket(col("ea"), planes))
    // Hamming-1 multi-probe (the ann_lsh_multiprobe recall repair, applied
    // to the dedup family): each probe also visits the one-bit-flip
    // buckets, catching near-dups whose perturbation crosses ONE
    // hyperplane. Only the broadcast probe side fans out ×(nPlanes+1); the
    // corpus bucketing is untouched, and since a corpus vector has exactly
    // one bucket and the probe list is distinct, no pair can double-count.
    val probed =
      if (!multiProbe) pb.withColumnRenamed("bucket0", "bucket")
      else pb.withColumn("bucket", explode(array(
          col("bucket0") +: planes.indices.map(j =>
            col("bucket0").bitwiseXOR(lit(1L << j))): _*)))
        .drop("bucket0")
    bucketed.join(broadcast(probed), "bucket")
      .select(col("ida"), col("vec_id").as("idb"),
        Similarity.cosine(col("ea"), col("embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Chunk-level exact dedup — the RAG/embedding-pipeline composition of
    * [[TextAnalysis.chunkDocs]] × content-hash dedup: identical context
    * windows across (or within) documents collapse to one canonical
    * chunk, so repeated boilerplate is embedded/indexed ONCE. One row per
    * chunk with its disposition (the ablation-log shape): kept iff it is
    * the (min doc_id, min chunk_id) member of its chunk_md5 group.
    *
    * Scale shape: chunking is row-local fan-out; the canonical map is one
    * map-side-combined min(struct) agg on the high-cardinality chunk_md5
    * key; the disposition join shuffles on the same key. Nothing is
    * collected, nothing is windowed. */
  def chunkDedup(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    val ch = TextAnalysis.chunkDocs(docs, window, stride)
    val canon = ch.groupBy("chunk_md5")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("c"),
        count(lit(1)).as("n_copies"))
      .select(col("chunk_md5"), col("c.doc_id").as("canon_doc"),
        col("c.chunk_id").as("canon_chunk"), col("n_copies"))
    ch.join(canon, "chunk_md5")
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"),
        (col("doc_id") === col("canon_doc") &&
          col("chunk_id") === col("canon_chunk")).as("kept"),
        col("canon_doc"), col("canon_chunk"), col("n_copies"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means clusters as the dedup buckets, pairwise
    * cosine only WITHIN a cluster, and in each duplicate neighborhood the
    * paper's keeper rule — keep the item with the LOWEST cosine to its
    * cluster centroid (the most "edge" example preserves diversity), ties
    * to the lower id. A vector is dropped iff some same-cluster neighbor
    * with cosine ≥ `threshold` ranks before it under (centroid-cosine asc,
    * id asc) — a pairwise-local rule, so no connected-components pass is
    * needed and each decision is one equi-join lookup.
    *
    * Scale shape: assignment is the narrow `ivf_assign` projection
    * (centroids ride as a plan literal, zero joins/exchanges); the pair
    * join shuffles both sides once on the cluster id; within-cluster work
    * is quadratic in cluster SIZE, which is the SemDeDup contract — K is
    * chosen ∝ corpus size so clusters stay ~10³-10⁴ rows (the paper uses
    * 50k clusters for LAION-440M). The trainer's sample bound caps K here;
    * at production scale the same literal-centroid plan takes any K the
    * trainer yields. Cluster-id shuffle cardinality = K, so K also keeps
    * the shuffle balanced — for skewed corpora compose with the hot-bucket
    * cap of [[minhashLshPairs]].
    *
    * Input: `corpus(vec_id, embedding)`. Output: one row per vector —
    * `(vec_id, cluster, kept)`. */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val a = Similarity.assignCells(corpus, centroids, withRep = true)
      .select(col("vec_id"), col("embedding"), col("ivf_cell"),
        Similarity.cosine(col("embedding"), col("rep")).as("csim"))
    val dropped = a
      .join(a.select(col("ivf_cell"), col("vec_id").as("o_id"),
        col("embedding").as("o_emb"), col("csim").as("o_csim")), "ivf_cell")
      .filter(col("vec_id") =!= col("o_id"))
      .filter(Similarity.cosine(col("embedding"), col("o_emb")) >= threshold)
      .filter(col("o_csim") < col("csim") ||
        (col("o_csim") === col("csim") && col("o_id") < col("vec_id")))
      .select("vec_id").distinct()
      .withColumn("is_dropped", lit(true))
    a.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("ivf_cell").as("cluster"),
        col("is_dropped").isNull.as("kept"))
  }

  /** Connected components over near-dup pairs — the clustering step that
    * turns pairwise matches into dedup groups (keep min-id per component).
    * Pregel-style min-label propagation: each iteration is one
    * edge⋈label shuffle + a min aggregation; iterations ≤ graph diameter
    * (checked via a converged count, capped). Scales as O(E) per round —
    * no transitive-closure blowup.
    */
  /** `pointerDoubling` adds a label-shortcut pass (comp ← comp(comp)) after
    * each propagation round: the remaining distance to the component min
    * halves per round, so convergence needs O(log diameter) rounds instead
    * of O(diameter) — one extra self-join shuffle per round, the classic
    * trade for corpora whose near-dup graphs form long template chains.
    * Labels at convergence are identical (comp(x) only ever moves DOWN
    * within x's component, and the convergence test — no neighbor with a
    * smaller label anywhere — is exactly label-constancy per component). */
  /** Plain label-prop rounds before the loop escalates to fused pointer
    * doubling (0-based: rounds ≥ this index double). 4 covers the
    * measured short-diameter common case without the shortcut join. */
  private val DoublingEscalationRound = 4

  def connectedComponents(pairs: DataFrame, maxIter: Int = 15,
      reliableCheckpoint: Boolean = false,
      pointerDoubling: Boolean = false): DataFrame = {
    // Lineage-cut strategy: localCheckpoint locally (fastest), reliable
    // checkpoint() on clusters — either via the explicit parameter or the
    // session-wide spark.graft.checkpoint.reliable conf (Lineage.cut), so
    // every iterative operator flips together at deployment time.
    if (reliableCheckpoint)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "connectedComponents(reliableCheckpoint=true) needs " +
          "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first")
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint()
      else df.transform(graft.config.Lineage.cut)
    // materialize the edge list once: every iteration (and its convergence
    // count) would otherwise re-derive the full upstream pipeline (e.g. the
    // whole MinHash candidate generation) through lineage
    val edges = ckpt(pairs.select(col("ida").as("a"), col("idb").as("b"))
      .unionAll(pairs.select(col("idb").as("a"), col("ida").as("b")))
      .distinct())
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("comp", col("doc_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val msgs = edges
        .join(labels.withColumnRenamed("doc_id", "a"), "a")
        .groupBy(col("b").as("doc_id"))
        .agg(min("comp").as("nbr_min"))
      // The convergence signal rides INSIDE the propagation job as an
      // `observe` metric (CollectMetrics), so each iteration costs exactly
      // ONE driver-synchronous action — the eager checkpoint. The previous
      // shape carried a `chg` column through the checkpoint and re-scanned
      // the materialized blocks with a second agg job; at bench scale that
      // doubled the per-iteration driver round-trips across every CC
      // consumer (probe receipts, OPTIMIZATION_r14.md).
      val prop = labels.join(msgs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"),
          (col("nbr_min") < col("comp")).as("chg"))
      // Pointer doubling rides in the SAME checkpoint job (r15: the r14
      // shape paid a second eager checkpoint per round for the shortcut
      // pass): comp ← comp(comp) — every comp value IS a node id present
      // in prop, so the self-join always resolves (coalesce for safety).
      // At a converged round the doubling is the identity (comp is already
      // the component min), so fusing it — for any subset of rounds —
      // cannot change the final labels; ExtSpec/R15OptSpec pin doubling ≡
      // plain label-prop.
      //
      // ADAPTIVE escalation (r15): short-diameter graphs (the common
      // near-dup case — sf0.1 converges in 3 rounds, measured) never pay
      // the shortcut join; a graph still unconverged after
      // `DoublingEscalationRound` plain rounds has proven its diameter
      // long, and every later round doubles — remaining distance to the
      // component min then halves per round (O(log diameter) tail instead
      // of O(diameter), the 100-TB chain-template case; sf30 receipt in
      // OPTIMIZATION_r15.md).
      // The shortcut jumps through the PREVIOUS round's CHECKPOINTED
      // labels (comp ← prev(comp)): a self-join against `prop` would
      // recompute the whole propagation subtree twice per round (measured
      // slower at sf30 — receipts in OPTIMIZATION_r15.md), while the
      // checkpointed map is a cheap RDD scan. Correctness: every comp is
      // a node id of the same component and prev(y) ≤ y (labels only
      // ever decrease from init=self), so the jump is monotone and
      // component-internal; the convergence test stays the propagation
      // fixed point, at which labels are the component min — identical
      // final output (R15OptSpec/ExtSpec pin it).
      val doubleNow = pointerDoubling || i >= DoublingEscalationRound
      val stepped =
        if (!doubleNow) prop
        else prop
          .join(labels.select(col("doc_id").as("comp"), col("comp").as("comp2")),
            Seq("comp"), "left")
          .select(col("doc_id"),
            coalesce(col("comp2"), col("comp")).as("comp"), col("chg"))
      val obs = org.apache.spark.sql.Observation(s"cc_converged_$i")
      val next = ckpt(stepped
        .observe(obs, max(coalesce(col("chg"), lit(false))).as("any_chg"))
      ) // truncate the iterative lineage + materialize (delivers the metric)
      // Bounded wait + loud failure (r14 advice): the metric is delivered
      // by the eager checkpoint above — if a refactor ever makes the cut
      // lazy or drops the observe node, fail with the iteration index
      // instead of blocking forever on Observation.get.
      converged = !graft.config.Metrics.awaitBool(obs, "any_chg",
        s"connectedComponents iteration $i")
      labels = next.drop("chg")
      i += 1
    }
    if (sys.env.contains("SPARK_GRAFT_CC_LOG")) System.err.println(
      s"[cc] converged=$converged rounds=$i pointerDoubling=$pointerDoubling")
    if (!converged)
      // min-label propagation needs `diameter` rounds; silently returning
      // partial labels would split components without any oracle catching it
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(component diameter exceeds maxIter); raise maxIter")
    labels
  }

  /** End-to-end corpus dedup: near-dup pairs → [[connectedComponents]]
    * clusters → keep ONE canonical document per cluster (the min doc_id,
    * which IS the component label) plus every unclustered document. This is
    * the operation a training-data pipeline actually runs; the pairwise and
    * clustering keys exist for auditing it. The only addition over the
    * clustering is one left join of the corpus ids against the (small)
    * component map — broadcastable whenever the duplicate population is a
    * fraction of the corpus. */
  def keepCanonical(corpus: DataFrame, pairs: DataFrame): DataFrame =
    corpus.select("doc_id")
      .join(connectedComponents(pairs), Seq("doc_id"), "left")
      .filter(col("comp").isNull || col("comp") === col("doc_id"))
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"))

  /** [[keepCanonical]] fused with the MinHash/LSH pipeline — the form a
    * training-data pipeline actually runs, and the SCALE-SAFE one: connected
    * components runs on REPRESENTATIVE pairs only (one node per distinct
    * content), never the member-expanded pair set, whose edge count is
    * O(group²) per identical-content group (quadratic in the boilerplate
    * rate — the dominant duplication mode at 100 TB). Members attach to
    * their representative's component afterwards through the content-key
    * group map: one equi-join against the (small) label set.
    *
    * Equivalent to `keepCanonical(corpus, minhashLshPairs(corpus, ...))`
    * row-for-row: a member's component label is its representative's label
    * (identical docs share every band bucket, so in the expanded graph they
    * are directly connected to the rep), each rep is its group's min id,
    * and a component label is the min over its reps — hence the global min
    * member id, exactly what min-label propagation over the expanded graph
    * yields. Kept = each component's label doc + all singletons. */
  def keepCanonicalLsh(corpus: DataFrame, n: Int = 32, bands: Int = 4,
      thresholdX10000: Long = 5000L, maxBucket: Int = 0,
      reliableCheckpoint: Boolean = false): DataFrame = {
    val (groups, repPairs) = lshRepState(corpus, n, bands, thresholdX10000, maxBucket)
    val comps = connectedComponents(repPairs, reliableCheckpoint = reliableCheckpoint)
    // identical members cluster with their rep iff identical content counts
    // as a duplicate at this threshold (Jaccard 10000); above that, every
    // doc stands alone
    val members =
      if (thresholdX10000 <= 10000L)
        groups.select(col("r.doc_id").as("rep"), explode(col("ids")).as("doc_id"))
      else corpus.select(col("doc_id").as("rep"), col("doc_id"))
    members
      .join(comps.withColumnRenamed("doc_id", "rep"), Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("rep")).as("cluster"))
      .filter(col("doc_id") === col("cluster"))
  }

  // -------------------------------------------------- cross-epoch Bloom

  /** k Bloom bit positions for a content hash — the double-hashing family
    * of [[TextAnalysis.cmsHeavyHitters]] (h1 + i·h2 over md5 halves), so
    * the oracle replays it verbatim. */
  private def bloomBits(text: Column, mBits: Int, k: Int): Column = {
    val P = 1000000007L
    val h1 = graft.functions.GraftFunctions.md5PrefixLong(text, 1, 15) % P
    val h2 = graft.functions.GraftFunctions.md5PrefixLong(text, 17, 15) % P
    transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * h2) % P % mBits)
  }

  /** Build the standing corpus's Bloom filter: mBits bits as mBits/32
    * 32-bit words (32, not 64, so the oracle's overflow-checked `<<`
    * never shifts into a sign bit). ONE aggregate — per doc the k bit
    * positions explode, group by word index with a bitwise-OR combine
    * (map-side combined, ≤ mBits/32 rows out), collected as the
    * (bounded, model-sized) word array. At
    * 100 TB this is the canonical "yesterday's corpus as a membership
    * sketch" build: the filter is KBs–GBs regardless of corpus size. */
  def bloomBuild(corpus: DataFrame, mBits: Int = 16384, k: Int = 4,
      text: String = "text"): Array[Long] = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val words = corpus
      .select(explode(bloomBits(col(text), mBits, k)).as("bit"))
      .groupBy((col("bit") / 32).cast("long").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("bit") % 32).cast("int"))).as("m"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate(mBits / 32)(i => words.getOrElse(i, 0L))
  }

  /** Cross-epoch Bloom pre-filter — the epoch-over-epoch dedup shape:
    * yesterday's corpus is summarized ONCE as a Bloom filter
    * ([[bloomBuild]]); today's arriving epoch tests membership ROW-LOCALLY
    * against the word-array literal (no join against the standing corpus
    * at all), and only the bloom-hits proceed to the exact content join.
    * Bloom guarantees no false negatives, so the pre-filter never loses a
    * true duplicate; the output carries both `bloom_hit` and the exact
    * `is_dup` so it doubles as a false-positive audit.
    *
    * Scale: the standing corpus is touched once at build time; the epoch
    * pass is a narrow projection + a semi-join ONLY for the hit subset —
    * at a few-% FP rate, the exact join's input shrinks by the epoch's
    * non-dup fraction (the whole point at 100 TB). */
  /** Row-local Bloom membership test against a built filter's word-array
    * literal — the INGEST-TIME seam: a stream maps this column in the
    * admitting micro-batch (the filter is a frozen plan constant; no
    * state, no shuffle), routing probable-dups to the expensive exact
    * path and everything else straight through.
    *
    * NOTE: the bit positions hash via the registered `md5_prefix_long`
    * function, so the consuming session must have passed through
    * [[graft.functions.GraftFunctions.ensureRegistered]] (every graft
    * entry point does; a standalone consumer session must call it before
    * analyzing a plan containing this column). */
  def bloomHitCol(text: Column, bloom: Array[Long], mBits: Int = 16384,
      k: Int = 4): Column = {
    val wLit = typedLit(bloom.toSeq)
    aggregate(
      bloomBits(text, mBits, k), lit(true),
      (acc, bit) => acc &&
        (element_at(wLit, (bit / 32).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (bit % 32).cast("int"))) =!= 0L))
  }

  def bloomPrefilter(epoch: DataFrame, standing: DataFrame,
      mBits: Int = 16384, k: Int = 4): DataFrame = {
    // bloomBits emits the registered md5_prefix_long — make the seam safe
    // for sessions that never passed a registering graft entry point
    graft.functions.GraftFunctions.ensureRegistered(epoch.sparkSession)
    val bloom = bloomBuild(standing, mBits, k)
    val hit = bloomHitCol(col("text"), bloom, mBits, k)
    val tested = epoch.select(col("doc_id"), col("text"), hit.as("bloom_hit"))
    val standingKeys = standing.select(md5(col("text")).as("ck")).distinct()
    // only the HIT subset reaches the exact content join — non-hits are
    // is_dup=false by Bloom's no-false-negative guarantee
    val hitDups = tested.filter(col("bloom_hit"))
      .join(standingKeys, md5(col("text")) === col("ck"), "left_semi")
      .select(col("doc_id"), lit(true).as("is_dup"))
    tested.join(hitDups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** (doc_id, band, bucket) LSH band rows for a corpus — the unit the
    * incremental index stores and probes. */
  private def bandBuckets(corpus: DataFrame, n: Int, bands: Int): DataFrame =
    bandBucketsFromSig(TextAnalysis.minhashSignatureRows(corpus, n), n, bands)

  /** Band rows from a PRECOMPUTED signature frame — split out so sweeps
    * that derive several band splits from one signature (bandSweep)
    * compute/materialize the signature exactly once: the row-local
    * minhash_sig projection has no Exchange for Catalyst to reuse across
    * union branches, so without the split each branch would re-sign the
    * corpus. */
  private def bandBucketsFromSig(sig: DataFrame, n: Int, bands: Int): DataFrame = {
    val rows = n / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (0 until rows).map(r => col(s"h${b * rows + r}").cast("string")): _*)).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH BAND SWEEP — the S-curve knob measured: candidate volume and
    * verified-pair yield at several (bands × rows-per-band) splits of the
    * same n-hash signature. More bands with shorter rows catch lower
    * Jaccard pairs (recall ↑) at the cost of more candidates to verify
    * (precision ↓); this is THE tuning decision a 100-TB dedup run makes
    * before committing a full pass, made on exactly this table. One
    * signature computation per config (the sweep is index construction,
    * run on a sample in production). */
  def bandSweep(corpus: DataFrame, n: Int, bandsList: Seq[Int],
      thresholdX10000: Long = 5000L): DataFrame = {
    val toks = corpus.select(col("doc_id"), tokSet(col("text")).as("t"))
    // one signature pass shared by every band split: eager checkpoint cuts
    // the lineage so the |docs|×n frame materializes exactly once (the
    // per-branch re-sign this replaces was measured at +50% on the key)
    val sig = TextAnalysis.minhashSignatureRows(corpus, n).transform(graft.config.Lineage.cut)
    bandsList.map { bands =>
      val buckets = bandBucketsFromSig(sig, n, bands)
      val cand = buckets.as("a")
        .join(buckets.as("b"), Seq("band", "bucket"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .filter(col("ida") < col("idb"))
        .distinct()
      cand
        .join(toks.select(col("doc_id").as("ida"), col("t").as("ta")), "ida")
        .join(toks.select(col("doc_id").as("idb"), col("t").as("tb")), "idb")
        .select(jaccardX10000(col("ta"), col("tb")).as("j"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(when(col("j") >= thresholdX10000, 1L).otherwise(0L)),
            lit(0L)).as("n_verified"))
        .select(lit(bands.toLong).as("bands"),
          lit((n / bands).toLong).as("rows_per_band"),
          col("n_candidates"), col("n_verified"))
    }.reduce(_ unionAll _).orderBy("bands")
  }

  /** INCREMENTAL near-dup detection — the epoch-over-epoch shape of
    * [[minhashLshPairs]]: the standing corpus's band buckets persist ONCE
    * as a parquet index partitioned by band (build-once/probe-many, like
    * the IVF index family); each arriving epoch signs only its own
    * documents and equi-joins its buckets against the index, so per-epoch
    * cost is O(epoch) signing + a collision-group join — the standing
    * corpus is never re-shingled. Jaccard verification runs only on the
    * colliding cross-epoch pairs. Near-dup twin of the exact-hash
    * [[bloomPrefilter]]; returns (ida = standing doc, idb = epoch doc,
    * jacc_x10000 ≥ threshold).
    */
  def incrementalLshNewDups(standing: DataFrame, epoch: DataFrame,
      indexDir: String, n: Int = 32, bands: Int = 4,
      thresholdX10000: Long = 5000L): DataFrame = {
    bandBuckets(standing, n, bands).write
      .mode("overwrite").partitionBy("band").parquet(indexDir)
    val idx = standing.sparkSession.read.parquet(indexDir)
    val cand = bandBuckets(epoch, n, bands).as("b")
      .join(idx.as("a"), Seq("band", "bucket"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    val ta = standing.select(col("doc_id").as("ida"), tokSet(col("text")).as("ta"))
    val tb = epoch.select(col("doc_id").as("idb"), tokSet(col("text")).as("tb"))
    cand.join(ta, "ida").join(tb, "idb")
      .select(col("ida"), col("idb"),
        jaccardX10000(col("ta"), col("tb")).as("jacc_x10000"))
      .filter(col("jacc_x10000") >= thresholdX10000)
  }

  /** EXACT-Jaccard self-join via prefix filtering (the PPJoin/AllPairs
    * family — Chaudhuri et al. 2006, Xiao et al. 2008): the deterministic
    * complement to [[minhashLshPairs]]. MinHash+LSH is probabilistic (band
    * collisions can miss true pairs); the prefix filter is COMPLETE at the
    * threshold: if Jaccard(A,B) ≥ t then |A∩B| ≥ t·max(|A|,|B|), so when
    * both documents order their k=3-shingle sets by a GLOBAL rarity order
    * (ascending document frequency, ties on the shingle string) and keep
    * only the first |X| − ⌈t·|X|⌉ + 1 elements, any qualifying pair shares
    * a prefix element. Candidates = the prefix-token equi-join (plus the
    * |Y| ≥ t·|X| length filter); exact set intersection verifies.
    *
    * Scale shape: NO all-pairs product and NO vocabulary-wide sort — the
    * global rarity order is realized per document by joining exploded
    * shingles to their df and sorting the (df, shingle) structs row-locally,
    * so ranking never needs a window over the shingle vocabulary. The
    * candidate join keys on prefix shingles, which the rarity order biases
    * toward the df≈1 tail: collision groups stay near the near-dup rate,
    * the same bound LSH buckets carry. All thresholds are exact integer
    * arithmetic (t = tNum/tDen, cross-multiplied) — no float compare in
    * either engine. */
  def prefixFilterPairs(corpus: DataFrame, tNum: Long = 6L, tDen: Long = 10L): DataFrame = {
    // the shingle-set table feeds FOUR consumers (df build, rarity
    // ordering, both verify sides) — persist once, checkpoint the small
    // pair result, drop the cache (the spanDupStats discipline; measured
    // 5.4 s → 3.3 s at sf0.1)
    val ss = shingleSets(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try prefixPairsFromSets(ss, tNum, tDen).transform(graft.config.Lineage.cut)
    finally ss.unpersist()
  }

  /** Per-doc distinct-shingle SETS, built through the explode-first
    * shingleRows shape (the narrow, measured-fast path) and ONE doc_id
    * aggregation — building the array in a projection instead lets
    * Catalyst inline the token array into the shingle lambda and
    * re-evaluate the split per element access (the O(tokens²)
    * interpreted-HOF trap shingleRows' doc describes; measured 15 s →
    * ~1 s at sf0.1 for this builder). Docs under k tokens have no set and
    * no row — they cannot pair.
    *
    * k = 5, not the minhash family's 3: prefix filtering is only
    * sub-quadratic when prefix elements are RARE, and the synthetic
    * corpus's 31-word vocabulary saturates the 3-shingle space (~30k
    * combinations — df ≈ 87 at 50k docs, 23M candidate pairs, measured).
    * The 5-shingle space cannot saturate (31⁵), and candidates == verified
    * pairs at every SF (28 / 256 / 256 — perfect prefix selectivity,
    * DuckDB-counted). Real-web shingle spaces behave like the latter. */
  private[graft] def shingleSets(corpus: DataFrame): DataFrame =
    TextAnalysis.shingleRows(corpus.select(col("doc_id"), col("text")), 5)
      .groupBy("doc_id")
      .agg(array_sort(array_distinct(collect_list(col("shingle")))).as("s"))

  /** The prefix-filter join proper, pre-persist/checkpoint — separated so
    * specs pin the REAL plan (the public method's executed plan is the
    * checkpointed-RDD scan). */
  private[graft] def prefixPairsFromSets(ss: DataFrame, tNum: Long,
      tDen: Long): DataFrame = {
    val tok = ss.select(col("doc_id"), size(col("s")).cast("long").as("sz"),
      explode(col("s")).as("w"))
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    // per-doc global-order shingle list WITHOUT a vocabulary-wide window:
    // (df, w) structs sort row-locally after a df equi-join
    val ordered = tok.join(dfreq, "w")
      .groupBy("doc_id")
      .agg(max("sz").as("sz"),
        sort_array(collect_list(struct(col("df"), col("w")))).as("ord"))
    // prefix length p = sz − ⌈tNum·sz/tDen⌉ + 1  (≥ 1 for any sz ≥ 1)
    val pref = ordered.select(col("doc_id"), col("sz"),
      explode(expr(s"transform(slice(ord, 1, CAST(sz - (($tNum * sz + ${tDen - 1}) div $tDen) + 1 AS INT)), x -> x.w)")).as("w"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          lit(tNum) * greatest(col("a.sz"), col("b.sz")) <=
            lit(tDen) * least(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    cand
      .join(ss.select(col("doc_id").as("ida"), col("s").as("sa")), "ida")
      .join(ss.select(col("doc_id").as("idb"), col("s").as("sb")), "idb")
      .select(col("ida"), col("idb"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        (size(col("sa")).cast("long") + size(col("sb"))).as("ssum"))
      .select(col("ida"), col("idb"), col("inter"),
        (col("ssum") - col("inter")).as("uni"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("uni"))
      .select(col("ida"), col("idb"),
        (lit(10000L) * col("inter") / col("uni")).cast("long").as("jacc_x10000"))
  }

  /** Content-defined chunking dedup (the Gear/FastCDC boundary rule of
    * Xia et al. 2016, at token granularity): chunk boundaries fall where a
    * rolling hash of the last 4 token hashes has its low 4 bits zero
    * (expected chunk ≈ 16 tokens), so an insertion near the head of a
    * document shifts only the chunks it touches — boundaries re-synchronize
    * after one hash window, where the fixed-stride windows of
    * [[spanDupStats]] shift EVERY downstream span. Per document: chunk
    * count, chunks whose content hash appears in >1 document, and the
    * scaled duplicated fraction.
    *
    * The boundary rule is position-local (h_i = Σ_{k<4} g(w_{i−k})·2^k
    * mod 16 — higher shifts vanish mod 16), so chunking runs entirely
    * row-locally in codegen'd array expressions: no token ever shuffles,
    * exactly the [[spanDupStats]] discipline. The (hash, doc) table
    * persists once for its three consumers, then the |docs|-row result is
    * checkpointed and the cache dropped. g(w) = md5-prefix mod 16 — the
    * same hex-fold both engines share. */
  def cdcChunkStats(corpus: DataFrame): DataFrame = {
    val chunkDocs = cdcChunkArrays(corpus)
      .select(col("doc_id"), explode(col("chunk")).as("c"))
      .select(col("doc_id"), md5(col("c")).as("h"))
      .groupBy("h", "doc_id").agg(count(lit(1)).as("occ"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dupH = chunkDocs.groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") > 1).select("h")
      val dupPerDoc = chunkDocs.join(dupH, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(sum("occ").as("dup_chunks"))
      chunkDocs.groupBy("doc_id").agg(sum("occ").as("chunks"))
        .join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("chunks"),
          coalesce(col("dup_chunks"), lit(0L)).as("dup_chunks"),
          coalesce((lit(10000L) * col("dup_chunks") / col("chunks")).cast("long"),
            lit(0L)).as("dup_x10000"))
        .transform(graft.config.Lineage.cut)
    } finally chunkDocs.unpersist()
  }

  /** The row-local CDC chunker shared by [[cdcChunkStats]] and
    * [[cdcClean]]: (doc_id, chunk array) — see [[cdcChunkStats]] for the
    * boundary rule. Runs in the codegen'd
    * [[graft.functions.CdcChunks]] expression (one O(tokens) pass per
    * row); the equivalent built-in transform/filter/zip_with chain was
    * O(tokens²·md5) per document once Catalyst inlined the gear array
    * into the lambdas — 146 s → <1 s at sf0.1. */
  private[graft] def cdcChunkArrays(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      call_function("cdc_chunks", TextAnalysis.tokens(col("text"))).as("chunk"))

  /** CDC-chunk-level corpus CLEANING — the actionable form of
    * [[cdcChunkStats]] and the Lee et al. 2022 exact-substring removal
    * realized at content-defined granularity: every chunk whose content
    * hash appears in MORE THAN ONE document is removed from every document
    * except the minimum-id owner (keep-first), and each document's
    * surviving chunks reassemble in original order. Whole-document dedup
    * keeps one copy of a page; THIS keeps one copy of a syndicated
    * paragraph while preserving the hosts' unique prose around it.
    * Within-document repeats of a non-cross-doc chunk are untouched (they
    * are the document's own structure, [[spanDupStats]] territory).
    *
    * Output: (doc_id, n_kept, n_removed, clean_text) — one row per doc,
    * clean_text = '' when everything was someone else's boilerplate.
    *
    * Scale shape: chunking is row-local ([[cdcChunkArrays]]); ownership is
    * one map-side-combined groupBy on the content hash; the keep decision
    * joins instances to owners on that same high-cardinality hash; the
    * rebuild is one groupBy(doc_id) whose per-group state is the
    * document's own chunk list — the two corpus-sized shuffles (hash,
    * doc_id) are intrinsic to an output that IS the corpus. */
  def cdcClean(corpus: DataFrame): DataFrame = {
    val inst = cdcChunkArrays(corpus)
      .select(col("doc_id"), posexplode(col("chunk")))
      .toDF("doc_id", "idx", "c")
      .withColumn("h", md5(col("c")))
    val own = inst.groupBy("h")
      .agg(min("doc_id").as("owner"), countDistinct("doc_id").as("nd"))
    inst.join(own, "h")
      .withColumn("keep", col("nd") === 1 || col("doc_id") === col("owner"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        concat_ws(" ", expr(
          "transform(filter(sort_array(collect_list(struct(idx, IF(keep, c, CAST(NULL AS STRING)) AS c))), x -> x.c IS NOT NULL), x -> x.c)"))
          .as("clean_text"))
  }

  /** MOSS-style near-dup candidate pairs from winnowing fingerprints
    * (Schleimer/Wilkerson/Aiken, SIGMOD '03 §5 — the use the sampler was
    * built for): two docs are candidates when their fingerprint SETS share
    * ≥ `minShared` hashes. Winnowing's guarantee makes the candidate set
    * principled: any shared token run of ≥ w+k−1 = 8 tokens lands ≥ 1
    * common fingerprint, so real overlaps of ~minShared·(w+1)/2 tokens
    * can't hide.
    *
    * Scale shape: the fingerprint table is |docs|·density(≈2/(w+1)) rows;
    * pairing is a self-join keyed on the 40-bit hash. The hub defense is
    * the same as the LSH bucket cap: a hash present in more than
    * `hashCap` docs is boilerplate (license headers, navigation chrome)
    * and is EXCLUDED from pairing — Σ min(n_h, cap)² bounds the wedge
    * volume where Σ n_h² would let one viral snippet go quadratic.
    * Deterministic, so the DuckDB oracle replays it; bias documented:
    * pairs whose entire overlap is boilerplate are not reported, which
    * for dedup is the wanted behavior. `shared` counts capped hashes;
    * `n_a`/`n_b` are the full fingerprint-set sizes, so the caller's
    * resemblance estimate shared/(n_a+n_b−shared) is conservative.
    *
    * Output: (doc_a, doc_b, shared, n_a, n_b), doc_a < doc_b, integers.
    */
  def winnowingPairs(corpus: DataFrame, minShared: Int = 3,
      hashCap: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // pairing consumes only the distinct (doc_id, h) set — exactly what
    // the codegen'd winnow_fps expression emits row-locally (bit-equal to
    // winnowingSelections' h column, WinnowFpsSpec), so the two window
    // passes + distinct shuffle of the selection chain drop out entirely
    // (<8-token docs: winnow_fps is NULL, explode emits nothing — the
    // same doc set the selection chain's size filters pass)
    val fp = corpus.select(col("doc_id"),
      explode(call_function("winnow_fps", col("text"))).as("h"))
    val eligible = fp.join(
      fp.groupBy("h").agg(count(lit(1)).as("nh"))
        .filter(col("nh") <= hashCap).select("h"),
      "h")
    val pairs = eligible.select(col("h"), col("doc_id").as("doc_a"))
      .join(eligible.select(col("h"), col("doc_id").as("doc_b")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select("doc_a", "doc_b", "shared", "n_a", "n_b")
  }

  /** Edit-distance fuzzy-dup pairs — the CHARACTER-level rung of the dedup
    * ladder (typo/OCR noise, single-character mutations), which the
    * token-set rungs (MinHash/Jaccard/winnowing) treat as near-identical
    * shingle sets and the exact rung misses entirely. Classical blocking +
    * verify: each doc is keyed by the head AND tail `blockLen`-char slice
    * of an ASCII-normalized `sigLen`-char signature; a single edit run
    * cannot alter both ends of the signature (for signatures longer than
    * 2·blockLen), so every pair within `maxDist` edits confined to the
    * interior is caught by at least one of the two block families — the
    * documented recall contract (edits inside the first or last `blockLen`
    * chars can drop a pair; resemblance-style overlap is the other rungs'
    * job). One further documented mode: the contract holds in the
    * NORMALIZED signature domain, so a raw-text substitution whose
    * replaced character is itself stripped by the normalization (e.g. 'x'
    * over a punctuation char) becomes an effective INSERTION that shifts
    * the tail block; if that insertion point also lies inside the head
    * block, both families miss the pair. Planted-edit recall tests must
    * therefore plant edits that survive normalization as substitutions
    * (replace a kept `[a-z0-9 ]` char), or plant directly in the signature
    * domain, for the detected==planted guarantee to be structural rather
    * than data-dependent. Verification is `levenshtein` on the SIGNATURES
    * only, never the full text, after the `|len_a − len_b| ≤ maxDist`
    * lower-bound prefilter.
    *
    * The normalization (lowercase, strip non-`[a-z0-9 ]`) also pins the
    * cross-engine semantics: DuckDB's `levenshtein` edits BYTES while
    * Spark's edits CODEPOINTS ('café'→'cafe' is 2 vs 1), so signatures are
    * forced to pure ASCII where the two definitions coincide.
    *
    * Scale: pairing is per-block with a deterministic per-block cap
    * (`maxBlock` members kept by (len, id) — partitioned row_number, no
    * global sort), so candidate volume is Σ min(n_b, cap)² over blocks —
    * a boilerplate prefix shared by a million docs costs cap², not 10¹².
    * Capped-out members fall back to their OTHER block key; a doc capped
    * from both families is skipped, surfaced by the recall key as data.
    *
    * Output: (ida, idb, dist), ida < idb, dist = signature edit distance.
    */
  def levenshteinBlockPairs(corpus: DataFrame, sigLen: Int = 96,
      blockLen: Int = 16, maxDist: Int = 4, maxBlock: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = corpus.select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          1, sigLen).as("sig"))
      .withColumn("len", length(col("sig")).cast("long"))
    val keyed = sig.select(col("doc_id"), col("sig"), col("len"),
      explode(array(
        concat(lit("p:"), substring(col("sig"), 1, blockLen)),
        concat(lit("s:"), expr(s"right(sig, $blockLen)")))).as("bkey"))
    val capped = keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy("bkey").orderBy("len", "doc_id")))
      .filter(col("rn") <= maxBlock).drop("rn")
    capped.as("a").join(capped.as("b"),
        col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        levenshtein(col("a.sig"), col("b.sig")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .groupBy("ida", "idb").agg(min("dist").as("dist"))
  }

  /** The maxBlock cap's RECEIPT for [[levenshteinBlockPairs]] — one row
    * per (prefix/suffix) block with its population, the members actually
    * admitted (min(n, maxBlock)), the truncation flag, and the dropped
    * count: exactly the drop-accounting discipline of the minhash
    * maxBucket metrics and the embed pipeline's CandidateCap receipt, as
    * a gate-checked key. The sf30 decade rung measured the cap's work
    * ceiling directly (pair candidates ≤ C(maxBlock,2) per block ⇒ hard
    * linear bound ~2016·|blocks|; the sf10→sf30 7.7× step is sub-cap
    * blocks transiting the quadratic region toward that ceiling) — this
    * key receipts the OTHER side of the same cap: how many members each
    * saturated block silently excludes from pairing. Cap-free at every
    * oracle SF (max block 63 even at sf1). */
  def levCapAudit(corpus: DataFrame, sigLen: Int = 96, blockLen: Int = 16,
      maxBlock: Int = 64): DataFrame = {
    val sig = corpus.select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        1, sigLen).as("sig"))
    sig.select(col("doc_id"),
        explode(array(
          concat(lit("p:"), substring(col("sig"), 1, blockLen)),
          concat(lit("s:"), expr(s"right(sig, $blockLen)")))).as("bkey"))
      .groupBy("bkey").agg(count(lit(1)).as("n_docs"))
      .select(col("bkey"), col("n_docs"),
        least(col("n_docs"), lit(maxBlock.toLong)).as("admitted"),
        (col("n_docs") > maxBlock).as("truncated"),
        greatest(col("n_docs") - maxBlock, lit(0L)).as("docs_dropped"))
      .orderBy("bkey")
  }
}
