package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search. Cosine is computed as a LEFT-TO-RIGHT double
  * accumulation over the element products: sequential IEEE operations are
  * bit-deterministic, so results are reproducible across engines and
  * partitionings — unlike a parallel float reduction. The accumulation runs
  * in the codegen'd [[graft.functions.DotProduct]] expression (a tight JVM
  * loop); [[foldDot]] is the equivalent built-in-functions form, kept for
  * cross-checking in tests.
  */
object Similarity {
  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** NN-DESCENT approximate k-NN graph construction (Dong, Moses,
    * Li 2011 — the graph-ANN family rung next to the IVF/PQ/LSH matrix;
    * public algorithm, original implementation): start from a
    * deterministic ring initialization (neighbor j of v = (v + j) mod N),
    * then iterate "a neighbor of my neighbor is probably my neighbor":
    * each round the candidate set is the current UNDIRECTED k-NN graph
    * plus all neighbor-of-neighbor pairs, re-ranked to the top-k by exact
    * cosine. Every step is Spark-relational: candidate generation is a
    * self-join on the shared neighbor, re-ranking is the bounded
    * [[graft.functions.TopKPairs]] aggregate — no windows over the
    * corpus, no driver state, per-round `localCheckpoint` lineage cuts
    * like the Pregel-shaped graph ops.
    *
    * Scale contract: REVERSE degree is capped at k per node (the
    * classic ρ·K reverse sample, deterministic by source id) so
    * candidate volume is ≤ (2k)² per node per round — a popular
    * neighbor cannot generate a quadratic wedge (the hub-wedge bound,
    * same argument as GraphQueries.capPerKey). Total work per round is
    * O(N·k²) exact-cosine evaluations, embarrassingly parallel.
    *
    * Determinism: ring init is id-arithmetic; re-rank ties break on
    * n_id; the reverse cap ranks by source id — every round is a pure
    * function of the input, so the DuckDB oracle replays it exactly.
    */
  def nnDescent(emb: DataFrame, k: Int = 8, iters: Int = 2,
      lshPlanes: Option[Array[Array[Double]]] = None): DataFrame = {
    val n = emb.count()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    // ring init: id-arithmetic, always k neighbors, no locality. With
    // `lshPlanes`, hyperplane bucket-mates SEED the graph with likely-close
    // neighbors (the production init — LSH gets the descent near the right
    // neighborhood so fixed rounds converge further); the ring stays
    // unioned in so singleton-bucket nodes are never stranded, and the
    // per-node cap keeps init degree at k (deterministic by n_id).
    val ring = emb.select(col("vec_id"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("vec_id"), ((col("vec_id") + col("j")) % n).as("n_id"))
    var nbrs = lshPlanes match {
      case None => ring
      case Some(planes) =>
        val b = emb.select(col("vec_id"),
          lshBucket(col("embedding"), planes).as("bucket"))
        // Seed-join volume bound (found by the sf10 rung: the UNCAPPED
        // bucket self-join is Σ|bucket|² rows — 625M at 200k vectors over
        // 64 buckets, growing quadratically). Every node links only to its
        // bucket's 2k smallest-id REPRESENTATIVES, so init volume is
        // ≤ N·2k. This is RESULT-IDENTICAL to the uncapped join at every
        // scale: the per-node cap below keeps only the k smallest mate ids
        // (src=0 ranked by n_id), and the k smallest ids of B\{x} are
        // always contained in the 2k smallest ids of B (2k ≥ k+1) — the
        // dropped rows could never survive the cap.
        val reps = b
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("bucket")
              .orderBy("vec_id")))
          .filter(col("rn") <= 2 * k)
          .select(col("vec_id").as("n_id"), col("bucket"))
        val mates = b
          .join(reps, "bucket")
          .select(col("vec_id"), col("n_id"))
          .filter(col("vec_id") =!= col("n_id"))
        // mates (src=0) outrank ring fallbacks (src=1) in the per-node cap
        mates.withColumn("src", lit(0))
          .union(ring.withColumn("src", lit(1)))
          .groupBy("vec_id", "n_id").agg(min(col("src")).as("src"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
              .orderBy("src", "n_id")))
          .filter(col("rn") <= k)
          .select("vec_id", "n_id")
    }
    nnDescentFrom(emb, nbrs, k, iters)
  }

  /** Run `iters` descent rounds from an EXISTING k-NN graph — split out of
    * [[nnDescent]] so a consumer that needs both the init graph and the
    * refined graph (ann_nndescent_recall grades init vs final) computes
    * the seeded initialization once instead of once per consumer.
    *
    * The loop keeps the graph in ADJACENCY-LIST form between rounds: the
    * edge→list aggregation happens once at entry instead of once per
    * round, each round's eager checkpoint materializes N array rows
    * instead of N·k edge rows, and the round output (the per-node top-k
    * aggregate) is already a list — the per-round re-grouping exchange of
    * the edge-state loop disappears (guide §2.4). */
  def nnDescentFrom(emb: DataFrame, init: DataFrame, k: Int,
      iters: Int): DataFrame = {
    if (iters <= 0) return init
    val vecs = emb.select(col("vec_id"), col("embedding"))
    var state = init.groupBy("vec_id").agg(collect_list(col("n_id")).as("fl"))
    for (_ <- 1 to iters)
      state = nnDescentArrayRound(vecs, state, k)
        .transform(graft.config.Lineage.cut)
    state.select(col("vec_id"), explode(col("fl")).as("n_id"))
  }

  /** BEAM SEARCH over a prebuilt k-NN graph (the query half of the
    * graph-ANN pair — [[nnDescent]] builds, this searches, HNSW-style
    * without the hierarchy): every query starts at the deterministic
    * entry node (vec_id 0), and each hop expands the current beam
    * through the graph's adjacency (beam·k candidates per query — the
    * corpus is NEVER scanned), scores candidates by exact cosine to the
    * query, and keeps the best `beam`. After `hops` rounds the beam's
    * top-k is the answer. Per-hop cost is |Q|·beam·k cosine rows —
    * independent of corpus size, the property that makes graph ANN the
    * production search path at 100 TB (the graph build amortizes over
    * all queries; the search touches O(beam·k·hops) vectors).
    * Deterministic: ties break on n_id everywhere. */
  def graphBeamSearch(corpus: DataFrame, graph: DataFrame, queries: DataFrame,
      k: Int, beam: Int = 8, hops: Int = 3): DataFrame = {
    val vecs = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb")))
    var beamDf = q.select(col("q_id"), lit(0L).as("n_id"))
    for (_ <- 1 to hops) {
      // self may ride in the beam (it scores 1.0 — one slot, like HNSW's
      // visited set); it is excluded only from the FINAL answer below
      // The beam is |Q|·beam rows — broadcast it against the graph and
      // the corpus (r15: the hinted side is always the bounded one, so
      // neither the adjacency nor the vectors are ever exchanged per hop;
      // guide §3.1 — size estimates after an iterative checkpoint are
      // unreliable, hint explicitly)
      val expanded = broadcast(beamDf)
        .join(graph.select(col("vec_id").as("n_id"), col("n_id").as("next")), "n_id")
        .select(col("q_id"), col("next").as("n_id"))
        .union(beamDf)
        .distinct()
      val scored = broadcast(expanded).join(vecs, "n_id").join(q, "q_id")
        .select(col("q_id"), col("n_id"),
          cosine(col("q_emb"), col("n_emb")).as("sim"))
      beamDf = rankTopK(scored, beam, "sim", asc = false)
        .select("q_id", "n_id")
        .transform(graft.config.Lineage.cut)
    }
    beamDf.filter(col("q_id") =!= col("n_id"))
      .transform(b => broadcast(b))
      .join(vecs, "n_id").join(q, "q_id")
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("sim"))
      .groupBy("q_id")
      .agg(call_function("topk_pairs", col("n_id"), col("sim"), lit(k), lit(false))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"), col("col.n_id").as("n_id"))
  }

  /** One descent round, pre-lineage-cut — separated so specs can pin the
    * REAL plan (the looped version's executed plan is the checkpointed-RDD
    * scan).
    *
    * r15 shape — the guide-§8 "decide with small rows, move big rows once"
    * rewrite of [[nnDescentRoundRef]] (kept below as the bit-equal
    * reference; R15OptSpec pins round-output equality). The r14 round
    * joined embeddings onto the EXPLODED candidate set: the O(N·(2k)²)
    * neighbor-of-neighbor pairs crossed an exchange once for the distinct
    * and twice more to pick up each endpoint's embedding — pair-volume ×
    * embedding-width shuffle bytes, the first thing that dies at 100 TB.
    * Here the pairs NEVER cross the wire: each node ships its (id,
    * embedding) once to every shared neighbor (N·2k messages — candidate
    * DISCOVERY volume, not candidate volume), the shared neighbor emits
    * scored pairs row-locally, and the bounded `topk_pairs_distinct`
    * aggregate dedups cross-neighbor copies map-side (≤ k pairs per node
    * per partition reach the final exchange). The reverse-side k-cap is a
    * bounded aggregate instead of the r14 Window pass (no per-partition
    * sort; ids tie-break exactly, so the cap set is identical).
    *
    * Message correctness: und is a DIRECTED edge set (fwd ∪ k-capped
    * reverse). The reference's candidate pair (v, c) exists iff some mid
    * has (v→mid) ∈ und ∧ (mid→c) ∈ und (plus und itself, which is the
    * mid=v slice once mid joins its own in-list). v knows (v→mid) locally
    * after the reverse-cap join (its own und list), so in-messages need no
    * extra pass; out-members (mid→c needs emb_c at mid) are told where to
    * send by the exploded und edge — the notification carries ids only. */
  private[graft] def nnDescentRound(vecs: DataFrame, nbrs: DataFrame,
      k: Int): DataFrame = {
    // edge-interface wrapper (specs, plan pins): the loop itself stays in
    // array form between rounds via nnDescentFrom/nnDescentArrayRound
    val fwd = nbrs.groupBy("vec_id").agg(collect_list(col("n_id")).as("fl"))
    nnDescentArrayRound(vecs, fwd, k)
      .select(col("vec_id"), explode(col("fl")).as("n_id"))
  }

  /** One descent round over ARRAY state `(vec_id, fl: array<long>)`. */
  private[graft] def nnDescentArrayRound(vecs: DataFrame, fwd: DataFrame,
      k: Int): DataFrame = {
    val emptyLongs = typedLit(Seq.empty[Long])
    val nbrs = fwd.select(col("vec_id"), explode(col("fl")).as("n_id"))
    // reverse side capped at k per node (k smallest source ids — the
    // classic ρ·K reverse sample). topk_pairs with score = (double)id and
    // id tie-break ranks ids EXACTLY over the full long domain (equal
    // doubles fall back to the id comparison).
    val rev = nbrs.select(col("n_id").as("t"), col("vec_id").as("s"))
      .groupBy("t")
      .agg(call_function("topk_pairs",
        col("s"), col("s").cast("double"), lit(k), lit(true)).as("rt"))
      .select(col("t").as("vec_id"),
        expr("transform(rt, x -> x.n_id)").as("rl"))
    val und = fwd.join(rev, Seq("vec_id"), "left")
      .select(col("vec_id"),
        array_distinct(concat(col("fl"), coalesce(col("rl"), emptyLongs)))
          .as("ul"))
    // out-member notifications (ids only): member c of und(mid) must ship
    // its embedding to mid
    val notif = und.select(col("vec_id").as("mid"),
      explode(col("ul")).as("member"))
    val outMsgs = notif
      .join(vecs.withColumnRenamed("vec_id", "member"), "member")
      .select(col("mid"), lit(0).as("tag"), col("member").as("id"),
        col("embedding").as("emb"))
    // in-members: v owns its und list, so it ships (v, emb_v) directly
    val inMsgs = und.join(vecs, "vec_id")
      .select(explode(col("ul")).as("mid"), lit(1).as("tag"),
        col("vec_id").as("id"), col("embedding").as("emb"))
    val gathered = outMsgs.unionAll(inMsgs)
      .groupBy("mid")
      .agg(
        collect_list(when(col("tag") === 0, struct(col("id"), col("emb"))))
          .as("outs"),
        collect_list(when(col("tag") === 1, struct(col("id"), col("emb"))))
          .as("ins"))
    // mid itself joins its in-list (the "∪ und" term: pairs (mid, c))
    val pairs = gathered
      .join(vecs.withColumnRenamed("vec_id", "mid"), "mid")
      .select(col("outs"),
        array_append(col("ins"),
          struct(col("mid").as("id"), col("embedding").as("emb"))).as("ins2"))
      .select(explode(col("ins2")).as("v"), col("outs"))
      .select(col("v"), explode(col("outs")).as("c"))
      .filter(col("v.id") =!= col("c.id"))
      .select(col("v.id").as("q_id"), col("c.id").as("n_id"),
        cosine(col("v.emb"), col("c.emb")).as("sim"))
    // distinct-topk: cross-neighbor duplicate pairs are bit-equal (same
    // cosine inputs), so the in-aggregate dedup IS the reference's
    // pre-score .distinct(). Output stays in array form — the next
    // round's state, no re-grouping.
    pairs.groupBy("q_id")
      .agg(call_function("topk_pairs_distinct",
        col("n_id"), col("sim"), lit(k), lit(false)).as("top"))
      .select(col("q_id").as("vec_id"),
        expr("transform(top, x -> x.n_id)").as("fl"))
  }

  /** The r14 relational round — kept as the independent parity reference
    * for [[nnDescentRound]] (R15OptSpec compares outputs row-for-row). */
  private[graft] def nnDescentRoundRef(vecs: DataFrame, nbrs: DataFrame,
      k: Int): DataFrame = {
    // undirected view with the reverse side capped at k per node
    val rev = nbrs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("n_id")
          .orderBy("vec_id")))
      .filter(col("rn") <= k)
      .select(col("n_id").as("vec_id"), col("vec_id").as("n_id"))
    val und = nbrs.union(rev).distinct()
    val cand = und.select(col("vec_id"), col("n_id").as("mid"))
      .join(und.select(col("vec_id").as("mid"), col("n_id").as("cand")), "mid")
      .select(col("vec_id"), col("cand").as("n_id"))
      .filter(col("vec_id") =!= col("n_id"))
      .union(und)
      .distinct()
    val scored = cand
      .join(vecs, "vec_id")
      .join(vecs.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        "n_id")
      .select(col("vec_id").as("q_id"), col("n_id"),
        cosine(col("embedding"), col("n_emb")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select(col("q_id").as("vec_id"), col("n_id"))
  }

  /** Interpreted reference implementation: aggregate-over-zip_with fold. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Two-phase per-query top-k over `scored(q_id, n_id, scoreCol)` via the
    * bounded [[graft.functions.TopKPairs]] aggregate: partial per-partition
    * top-k map-side, final merge over |Q|·partitions·k pairs. Replaces the
    * `Window.partitionBy("q_id")` + row_number idiom, whose parallelism is
    * capped at |queries| and which shuffles EVERY scored row — this shape
    * survives a 100× corpus scale-up. Ordering (score, then n_id asc on ties)
    * is identical to the window it replaces. */
  /** Public alias of [[rankTopK]] for composed retrieval operators that
    * bring their own scoring (e.g. hybrid fusion). */
  def rankTopKPublic(scored: DataFrame, k: Int, scoreCol: String,
      asc: Boolean): DataFrame = rankTopK(scored, k, scoreCol, asc)

  private def rankTopK(scored: DataFrame, k: Int, scoreCol: String,
      asc: Boolean): DataFrame =
    scored.groupBy("q_id")
      .agg(call_function("topk_pairs", col("n_id"), col(scoreCol), lit(k), lit(asc))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.n_id").as("n_id"), col("col.score").as(scoreCol))

  /** Brute-force cosine top-k: the exact baseline. The (small) query set is
    * broadcast against the corpus — cost O(|queries|·N), one pass, no
    * shuffle beyond the per-query top-k aggregation.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val scored = corpus.crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE recipe,
    * public technique): per query, the top-k most-similar corpus vectors
    * whose LABEL differs from the query's — the negatives that actually
    * move a contrastive loss. Exact baseline shape = [[bruteForceTopK]]
    * with the label predicate fused into the scan (broadcast queries, one
    * corpus pass, bounded topk_pairs ranking); at scale the candidate
    * generation swaps to any ANN rung — the label filter composes with
    * IVF/PQ probes exactly like ann_filtered_search's predicate. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("label").as("q_label")))
    val scored = corpus.crossJoin(q)
      .filter(col("vec_id") =!= col("q_id") &&
        col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR '98):
    * greedy diversified re-ranking — pick kOut results that are relevant
    * to the query but not redundant with each other,
    * mmr(c) = λ·sim(q,c) − μ·max_{s∈S} sim(c,s), highest first. The
    * training-data use is diverse few-shot/context selection where plain
    * top-k returns kOut copies of the same near-duplicate.
    *
    * Shape: candidate generation is the exact [[bruteForceTopK]] here
    * (swap in any ANN rung at scale); the greedy loop is kOut−1 joins
    * over the BOUNDED candidate table (|Q|·kCand rows, localCheckpointed
    * once) — per-query work is O(kOut·kCand) similarity evaluations,
    * independent of corpus size, distributed by q_id. Ties break on
    * (score desc, n_id asc) via struct-max, so the selection is a pure
    * function of the input and the DuckDB oracle replays every round.
    * λ/μ are pinned literals in BOTH engines — never derived as 1−λ,
    * which in binary floating point is not the literal 0.3. */
  def mmrDiversify(corpus: DataFrame, queries: DataFrame, kCand: Int = 12,
      kOut: Int = 5, lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    val cand = bruteForceTopK(corpus, queries, kCand)
      .join(corpus.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb")), "n_id")
      .select("q_id", "rank", "n_id", "sim", "n_emb")
      .transform(graft.config.Lineage.cut) // bounded: |Q|·kCand rows
    // first pick: argmax λ·sim ≡ the rank-1 candidate (same tie-break)
    var selected = cand.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"), col("sim"),
        (lit(lam) * col("sim")).as("mmr"), lit(1).as("sel_rank"),
        col("n_emb"))
    for (r <- 2 to kOut) {
      val selEmb = selected.select(col("q_id"), col("n_emb").as("s_emb"))
      val rem = cand.join(selected.select("q_id", "n_id"),
        Seq("q_id", "n_id"), "left_anti")
      val msim = rem.join(selEmb, Seq("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(col("n_emb"), col("s_emb")).as("cs"))
        .groupBy("q_id", "n_id").agg(max("cs").as("msim"))
      val pick = rem.join(msim, Seq("q_id", "n_id"))
        .withColumn("score", lit(lam) * col("sim") - lit(mu) * col("msim"))
        .groupBy("q_id")
        .agg(max(struct(col("score"), (-col("n_id")).as("negid"),
          col("n_id").as("nid"), col("sim").as("psim"))).as("m"))
        .select(col("q_id"), col("m.nid").as("n_id"),
          col("m.psim").as("sim"), col("m.score").as("mmr"),
          lit(r).as("sel_rank"))
        .join(cand.select("q_id", "n_id", "n_emb"), Seq("q_id", "n_id"))
        .select("q_id", "n_id", "sim", "mmr", "sel_rank", "n_emb")
      selected = selected.union(pick).transform(graft.config.Lineage.cut)
    }
    selected.select("q_id", "sel_rank", "n_id", "sim", "mmr")
  }

  /** Deterministic random-hyperplane LSH: 16 sign bits → bucket id. At scale
    * the corpus is bucketed once (one narrow pass), queries probe only their
    * bucket — the IVF-style scale path for ANN. */
  def hyperplanes(nPlanes: Int = 16, dim: Int = 64, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(emb, typedLit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: a deterministic coarse quantizer (one representative
    * vector per `label` cell — the min-id member, a medoid stand-in for a
    * trained centroid) partitions the corpus into inverted lists; a query
    * probes only its nearest cell and re-ranks exactly inside it. At scale:
    * the (bounded — it is the cell count) centroid set rides into the plan
    * as a literal, the corpus is assigned in ONE narrow projection with no
    * join and no exchange, and a probe touches ~N/cells vectors.
    */
  /** The collected coarse-quantizer index: (cell ids ascending, one centroid
    * per cell, same order). Bounded by the cell count — this is index
    * CONSTRUCTION (the same contract as the PQ codebook collect), never a
    * data-path collect. Cells sorted ascending so the expression's
    * first-max tie-break lands on the LOWER cell. */
  private type CoarseIndex = (Array[Long], Array[Array[Double]])

  private def collectIndex(reps: DataFrame): CoarseIndex = {
    val rows = reps.collect().map { r =>
      val cell = r.get(0) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long => l.longValue
        case s: java.lang.Short => s.longValue
        case x => sys.error(s"unsupported cell id type: $x")
      }
      val cent: Array[Double] = r.getSeq[Any](1).iterator.map {
        case f: Float => f.toDouble // exact widening — bit-equal cosine
        case d: Double => d
      }.toArray
      (cell, cent)
    }.sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Medoid coarse quantizer: the min-vec_id member of each label cell. A
    * partial/final `min_by` aggregate, NOT a per-label window: the map-side
    * combine collapses each partition to at most |cells| rows before the
    * shuffle; vec_id is unique, so min_by is deterministic. One bounded
    * collect at index-build time. */
  private def medoidIndex(corpus: DataFrame): CoarseIndex =
    collectIndex(corpus.groupBy(col("label").as("cell"))
      .agg(min_by(col("embedding"), col("vec_id")).as("rep")))

  /** Trained centroids as the index: cells are the centroid positions. */
  private def centroidIndex(centroids: Array[Array[Double]]): CoarseIndex =
    (Array.tabulate(centroids.length)(_.toLong), centroids)

  private def centLit(ix: CoarseIndex): Column =
    typedLit(ix._2.map(_.toSeq).toSeq)

  /** Nearest-cell assignment (cosine to each centroid; ties → lower cell) —
    * a PURE NARROW PROJECTION: the codegen'd `ivf_assign` argmax runs over
    * the centroid literal row-locally, so assignment adds zero joins and
    * zero exchanges at any corpus size (it previously crossJoined broadcast
    * reps and hash-exchanged N full-width rows through a groupBy(vec_id)
    * argmax). Ordering is unchanged: higher cosine wins, ties to the lower
    * cell, NaN ranks largest. `withRep` also attaches the assigned cell's
    * centroid (for residual encoding) from the same literal — replacing a
    * reps join. */
  private def cellAssign(ix: CoarseIndex, df: DataFrame, emb: String,
      out: String, withRep: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df
      .withColumn("_cidx", call_function("ivf_assign", col(emb), centLit(ix)))
      .withColumn(out, element_at(typedLit(ix._1.toSeq), col("_cidx") + 1))
    (if (withRep)
       base.withColumn("rep", element_at(centLit(ix), col("_cidx") + 1))
     else base).drop("_cidx")
  }

  /** Deterministic PQ codebook: codeword j of sub-space s = the s-th
    * subvector of the corpus vector with vec_id = j. Bounded O(ksub)
    * index-construction collect (a sampled k-means fit would broadcast the
    * same way at scale). */
  private def codebook(corpus: DataFrame, m: Int, ksub: Int, d: Int)
      : Array[Array[Array[Double]]] = {
    val cwRows = corpus.filter(col("vec_id") < ksub)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .collect().map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray).toMap
    Array.tabulate(m, ksub, d)((s, j, i) => cwRows(j)(s * d + i))
  }

  /** The IVF probe shared by the medoid and trained variants: assign corpus
    * and queries to their nearest cell (one narrow projection each over the
    * centroid literal), then score a query only against its own inverted
    * list and re-rank with the bounded top-k aggregate. */
  private def ivfProbe(ix: CoarseIndex, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val bucketed = cellAssign(ix, corpus, "embedding", "ivf_cell")
    val q = cellAssign(ix, queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("ivf_cell"))
    val scored = bucketed.join(broadcast(q), "ivf_cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    ivfProbe(medoidIndex(corpus), corpus, queries, k)

  /** Public assignment surface (and the plan-spec hook): corpus +
    * `ivf_cell` under the given trained centroids, as one narrow
    * projection — zero joins, zero exchanges at any corpus size. */
  def assignCells(corpus: DataFrame, centroids: Array[Array[Double]],
      withRep: Boolean = false): DataFrame =
    cellAssign(centroidIndex(centroids), corpus, "embedding", "ivf_cell", withRep)

  /** Multi-cell IVF probing — the standard FAISS recall lever: each query
    * probes its `nprobe` nearest cells (cosine desc, ties → lower cell)
    * instead of only the top one, so neighbors straddling a cell boundary
    * become reachable at probe cost ×nprobe. The corpus side is UNCHANGED
    * (assigned once, narrowly — each vector lives in exactly one inverted
    * list, so probe lists never produce duplicate candidates); only the
    * tiny broadcast query side fans out, ranking its cells through the
    * same bounded topk_pairs aggregate as the result ranking. */
  /** Top-`nprobe` probe cells per query (cosine desc, ties → lower cell) —
    * the query-side fan-out shared by every multi-probe variant: |Q|×cells
    * scored rows (both sides tiny — queries and the bounded centroid
    * literal), cells ranked through the same bounded topk_pairs aggregate
    * as result ranking. Returns (q_id, ivf_cell), one row per probe. */
  private def probeCells(ix: CoarseIndex, queries: DataFrame,
      nprobe: Int): DataFrame = {
    val qScored = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(col("q_id"), col("q_emb"),
        posexplode(centLit(ix)).as(Seq("cpos", "cvec")))
      .select(col("q_id"),
        element_at(typedLit(ix._1.toSeq), col("cpos") + 1).as("cell"),
        cosine(col("q_emb"), col("cvec")).as("csim"))
    qScored.groupBy("q_id")
      .agg(call_function("topk_pairs", col("cell"), col("csim"),
        lit(nprobe), lit(false)).as("top"))
      .select(col("q_id"), explode(col("top")).as("p"))
      .select(col("q_id"), col("p.n_id").as("ivf_cell"))
  }

  def ivfNprobeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val ix = medoidIndex(corpus)
    val bucketed = cellAssign(ix, corpus, "embedding", "ivf_cell")
    val q = broadcast(probeCells(ix, queries, nprobe).join(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      "q_id"))
    val scored = bucketed.join(q, "ivf_cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Persisted-index IVF — the build-once / probe-many layout a 100 TB
    * deployment actually runs: cell assignments are written ONCE as a
    * parquet table PARTITIONED BY cell, so every later query batch scans
    * only the inverted lists it probes (partition pruning at the file
    * level — the directory layout IS the inverted index), instead of
    * re-deriving assignments per query batch. Results are identical to
    * [[ivfTopK]] (same reps, same assignment, same probe); the oracle twin
    * is ann_ivf's. Returns the probe result; the index persists at
    * `indexPath` for reuse. */
  def ivfPersistedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      indexPath: String): DataFrame = {
    val ix = medoidIndex(corpus)
    cellAssign(ix, corpus, "embedding", "ivf_cell")
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(indexPath)
    val index = corpus.sparkSession.read.parquet(indexPath)
    val q = cellAssign(ix, queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("ivf_cell"))
    val scored = index.join(broadcast(q), "ivf_cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Trained-quantizer IVF: cells are k-means centroids from
    * [[PqTrainer.trainCodebook]] run with m=1 over the full dimension — the
    * same bounded-sample deterministic trainer the PQ codebook uses — so
    * index construction is sample-bounded end-to-end instead of scanning
    * the full corpus for medoids. The kCells centroid vectors arrive as a
    * plan literal (they ARE the broadcast index) and everything downstream
    * is the shared [[ivfProbe]] plan. */
  def ivfTrainedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]]): DataFrame =
    ivfProbe(centroidIndex(centroids), corpus, queries, k)

  /** FILTERED vector search — the modern vector-DB staple: top-k under a
    * metadata predicate ("nearest docs WHERE label = X"). Pre-filtering is
    * the only correct strategy when the filter is selective (post-filtering
    * a top-k can return < k survivors); here the predicate pushes into the
    * corpus scan BEFORE bucketing, so the probe cost shrinks WITH the
    * filter instead of paying full-corpus retrieval and discarding. Same
    * broadcast-query / bucket-probe shape as [[lshTopK]]; with a
    * partition-pruned layout ([[ivfPersistedTopK]]'s directory index) a
    * label-partitioned write makes the filter a pure partition prune. */
  def filteredLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Double]], predicate: Column): DataFrame = {
    val filtered = corpus.filter(predicate)
    val bucketed = filtered
      .withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes)))
    val scored = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Build-once/filter-many FILTERED search: the corpus persists
    * bucketed AND partitioned by the metadata column, so a later query's
    * predicate never scans excluded data at all — the filter resolves to
    * DIRECTORY pruning before a single row is read (spec-asserted via the
    * scan's partition filters), and the sign buckets are stored, not
    * recomputed. Result-identical to [[filteredLshTopK]] over the same
    * predicate (shared oracle). This is the 100-TB layout for
    * "top-k WHERE tenant/lang/label = X" retrieval: pay the partitioned
    * write once, every filtered probe reads only its partitions. */
  def filteredPersistedLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Double]], partitionCol: String, predicate: Column,
      indexDir: String): DataFrame = {
    val spark = corpus.sparkSession
    corpus
      .withColumn("bucket", lshBucket(col("embedding"), planes))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(indexDir)
    val idx = spark.read.parquet(indexDir).filter(predicate)
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes)))
    val scored = idx.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Public nearest-centroid assignment (the narrow `ivf_assign`
    * projection) — (input columns ++ `cluster`). */
  def kmeansAssign(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    cellAssign(centroidIndex(centroids), corpus, "embedding", "cluster")

  /** k-means clustering REPORT: cluster sizes + cohesion over trained
    * centroids — the clustering operator surfaced on its own (SemDeDup's
    * bucketing and IVF's coarse quantizer both embed it; a curation
    * pipeline also ships the report: how big are the content clusters and
    * how tight). Assignment is the same narrow codegen'd `ivf_assign`
    * projection as the IVF family (centroids ride as a plan literal, zero
    * joins); the report is ONE map-side-combined aggregate onto K cells.
    * Cohesion sums go through DECIMAL so they are partition-order-free;
    * min/max are order-free by nature. */
  def kmeansReport(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val assigned = cellAssign(centroidIndex(centroids), corpus,
      "embedding", "cluster", withRep = true)
    assigned
      .select(col("cluster"), cosine(col("embedding"), col("rep")).as("cos"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum(col("cos").cast("decimal(18,6)")).cast("double").as("sum_cos"),
        min("cos").as("min_cos"), max("cos").as("max_cos"))
      .orderBy("cluster")
  }

  /** DIVERSITY sample: the `m` most PERIPHERAL members of each cluster
    * (lowest cosine to the cluster medoid — the vectors a centroid-mean
    * summary represents worst). The coverage-keeping half of cluster-based
    * selection: SemDeDup prunes the redundant core, this keeps the edge
    * cases a training mix under-samples. Assignment is the narrow
    * `ivf_assign` projection; ranking is the bounded per-cluster
    * `topk_pairs` aggregate (map-side partial top-m — never a window over
    * the corpus), so the whole operator is one narrow pass + one
    * K-cardinality agg shuffle carrying ≤ m rows per cluster per
    * partition. */
  def peripherySample(corpus: DataFrame, m: Int): DataFrame = {
    val ix = medoidIndex(corpus)
    cellAssign(ix, corpus, "embedding", "cluster", withRep = true)
      .select(col("cluster").as("q_id"), col("vec_id").as("n_id"),
        cosine(col("embedding"), col("rep")).as("cos"))
      .transform(rankTopK(_, m, "cos", asc = true))
      .select(col("q_id").as("cluster"), col("rank"),
        col("n_id").as("vec_id"), col("cos"))
      .orderBy("cluster", "rank")
  }

  /** Product-quantization ANN (ADC flavor): the 100-TB-scale compression
    * path — each vector is encoded once into `m` sub-space codebook indices
    * (8 bytes here vs 256 for raw floats), and query scans touch only the
    * codes plus a per-query distance LUT, never the full-dimensional data.
    *
    *   - "training" is deterministic for oracle parity: codeword j of
    *     sub-space s is the s-th subvector of the corpus vector with
    *     vec_id = j (a medoid stand-in for k-means, same contract).
    *     The codebook collect is O(ksub) index construction, not a
    *     data-path collect; at scale it would be a sampled k-means fit
    *     broadcast the same way.
    *   - encoding is a PURE PROJECTION (no join, no shuffle): argmin over
    *     ksub literal codewords per sub-space, ties to the lower index.
    *   - the query side materializes its LUT (m × ksub sub-distances) ONCE
    *     per query and broadcasts it; the corpus-side ADC scan is then m
    *     array lookups + a pinned left-to-right sum per (query, code) row.
    *   - exact cosine re-ranks only the top-`nCand` ADC candidates.
    *
    * All distance folds are sequential left-to-right doubles, so candidate
    * sets and ranks are bit-deterministic across engines and partitionings.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, nCand: Int = 32,
      trained: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val dim = 64
    val d = dim / m
    // cw(s)(j)(i): codeword j of sub-space s — the deterministic medoid
    // codebook by default (what the DuckDB oracle pins); pass a
    // PqTrainer.trainCodebook result for the production path
    val cw = trained.getOrElse(codebook(corpus, m, ksub, d))

    // one narrow pass: vec_id + m small ints (the compressed index). The
    // argmin-over-codewords runs in the codegen'd pq_encode expression —
    // one tight m·ksub·d loop per row with the codebook as a referenced
    // constant. The equivalent built-in-expression formulation (m·ksub
    // separate d²-sum trees + array_min/array_position, ~2000 plan nodes)
    // computes the same math but costs seconds of optimizer + janino time
    // per run and ~20× the per-row work at sf0.1 — the custom expression
    // IS the operator here, per the build-brief preference order.
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = corpus.select(col("vec_id").as("n_id"),
      call_function("pq_encode", col("embedding"), cwLit).as("codes"))
    // per-query LUT: lut[s][j] = d²(q_sub_s, cw[s][j]), computed once per
    // query row (same codegen'd loop), broadcast with it
    val qlut = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      call_function("pq_lut", col("embedding"), cwLit).as("lut")))
    val adc = codes.crossJoin(qlut)
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(s =>
            element_at(element_at(col("lut"), s + 1),
              element_at(col("codes"), s + 1) + 1))
          .foldLeft(lit(0.0))(_ + _).as("adist"))
    val cand = rankTopK(adc, nCand, "adist", asc = true).select("q_id", "n_id")
    // exact re-rank over the tiny candidate set only
    val rer = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(cand), "n_id")
      .join(qlut.select(col("q_id"), col("q_emb")), "q_id")
      .select(col("q_id"), col("n_id"), cosine(col("q_emb"), col("n_emb")).as("sim"))
    rankTopK(rer, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** IVF+PQ — the full FAISS-style index as one plan: the coarse quantizer
    * prunes the search to the query's cell (~N/cells candidates), PQ codes
    * make scoring those candidates a LUT lookup sum instead of
    * full-dimensional math, and exact cosine re-ranks only the top-`nCand`.
    * At 100 TB: reps + codebook broadcast, the corpus is assigned and
    * encoded in ONE narrow pass (8-byte codes + a cell id per vector), and
    * a probe reads one inverted list of codes. PQ here encodes raw vectors
    * (production FAISS encodes residuals x − centroid; raw-vector PQ keeps
    * the same plan shape and exact oracle parity — the residual variant is
    * one extra subtraction in the same codegen'd expressions). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, nCand: Int = 32): DataFrame =
    ivfPqProbe(medoidIndex(corpus), codebook(corpus, m, ksub, 64 / m),
      corpus, queries, k, m, nCand)

  /** The full production FAISS-style index: BOTH quantizers trained by the
    * bounded-sample deterministic k-means — coarse cells from
    * [[PqTrainer.trainCodebook]] with m=1 (full dimension), PQ codewords
    * from the same trainer over subvectors — so index construction never
    * scans the corpus (sample-bounded end-to-end), and the data path is
    * the shared cell-pruned ADC probe. */
  def ivfPqTrainedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Array[Array[Double]], cw: Array[Array[Array[Double]]],
      nCand: Int = 32): DataFrame =
    ivfPqProbe(centroidIndex(coarse), cw, corpus, queries, k,
      cw.length, nCand)

  private def ivfPqProbe(ix: CoarseIndex, cw: Array[Array[Array[Double]]],
      corpus: DataFrame, queries: DataFrame, k: Int, m: Int,
      nCand: Int): DataFrame = {
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    // one narrow pass: cell id + m-int code per corpus vector
    val codes = cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        call_function("pq_encode", col("embedding"), cwLit).as("codes"))
    ivfPqAdcProbe(codes, ix, cwLit, corpus, queries, k, m, nCand)
  }

  /** The shared cell-pruned ADC scan + exact re-rank over an encoded
    * `codes(n_id, ivf_cell, codes)` index frame — in-memory or read back
    * from a persisted parquet index. */
  private def ivfPqAdcProbe(codes: DataFrame, ix: CoarseIndex, cwLit: Column,
      corpus: DataFrame, queries: DataFrame, k: Int, m: Int,
      nCand: Int): DataFrame = {
    val q = broadcast(cellAssign(ix, queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("ivf_cell"),
        call_function("pq_lut", col("embedding"), cwLit).as("lut")))
    ivfPqAdcScan(codes, q, corpus, k, m, nCand)
  }

  /** ADC + exact re-rank given a prepared broadcast query frame
    * `q(q_id, q_emb, ivf_cell, lut)` — one row per probed cell (a corpus
    * vector lives in exactly one cell, so multi-probe rows cannot
    * duplicate candidates). */
  private def ivfPqAdcScan(codes: DataFrame, q: DataFrame,
      corpus: DataFrame, k: Int, m: Int, nCand: Int): DataFrame = {
    // cell-pruned ADC: the join key IS the inverted list
    val adc = codes.join(q, "ivf_cell")
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(s =>
            element_at(element_at(col("lut"), s + 1),
              element_at(col("codes"), s + 1) + 1))
          .foldLeft(lit(0.0))(_ + _).as("adist"))
    val cand = rankTopK(adc, nCand, "adist", asc = true).select("q_id", "n_id")
    // q carries one row per PROBED CELL — collapse to one per query for
    // the re-rank join (q_emb is identical across a query's probe rows)
    val rer = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(cand), "n_id")
      .join(q.select(col("q_id"), col("q_emb")).dropDuplicates("q_id"), "q_id")
      .select(col("q_id"), col("n_id"), cosine(col("q_emb"), col("n_emb")).as("sim"))
    rankTopK(rer, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Persisted IVF+PQ — the build-once / probe-many layout of the FULL
    * production index: (n_id, codes) written ONCE as parquet PARTITIONED
    * BY cell (8-byte codes per vector — the directory layout is the
    * inverted index AND the storage is the compressed representation, ~3%
    * of raw float width), so a later query batch scans only the code
    * lists it probes with file-level partition pruning, paying neither
    * re-assignment nor re-encoding. The (bounded) centroids + codebook
    * travel as plan constants, exactly how a FAISS index file carries its
    * quantizers next to the codes. Result-identical to [[ivfPqTopK]]
    * (ann_ivf_pq's oracle is the twin); the exact re-rank still reads the
    * corpus — at scale that is the standard refine-from-source step, and
    * it touches only nCand rows per query. */
  def ivfPqPersistedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      indexPath: String, m: Int = 8, ksub: Int = 16,
      nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val cw = codebook(corpus, m, ksub, 64 / m)
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        call_function("pq_encode", col("embedding"), cwLit).as("codes"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(indexPath)
    val codes = corpus.sparkSession.read.parquet(indexPath)
    ivfPqAdcProbe(codes, ix, cwLit, corpus, queries, k, m, nCand)
  }

  /** Multi-probe IVF+PQ: nprobe nearest cells per query over the
    * compressed code lists — the two recall/cost levers of the production
    * index composed (cell pruning × nprobe, ADC over 8-byte codes, exact
    * re-rank of nCand). Corpus side identical to [[ivfPqTopK]]; only the
    * tiny broadcast query side fans out, its (cell-independent) LUT
    * computed once per query. */
  def ivfPqNprobeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, m: Int = 8, ksub: Int = 16, nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val cw = codebook(corpus, m, ksub, 64 / m)
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        call_function("pq_encode", col("embedding"), cwLit).as("codes"))
    val q = broadcast(probeCells(ix, queries, nprobe)
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id")
      .select(col("q_id"), col("q_emb"), col("ivf_cell"),
        call_function("pq_lut", col("q_emb"), cwLit).as("lut")))
    ivfPqAdcScan(codes, q, corpus, k, m, nCand)
  }

  /** The COMPLETE production index in one plan — every lever composed:
    * TRAINED coarse quantizer (k-means cells), TRAINED PQ codebook, codes
    * PERSISTED once as parquet PARTITIONED BY cell (build-once /
    * probe-many: the directory layout is the inverted index, the storage
    * is ~3% of raw float width), and nprobe>1 multi-cell probing for
    * recall. A query batch pays: partition-pruned scans of its probe
    * cells' code lists, LUT-sum ADC over 8-byte codes, and an
    * nCand-bounded exact re-rank — never a full-corpus scan, never
    * full-dimensional math outside the re-rank. This is the FAISS
    * IVF-PQ deployment shape (index file = quantizers + coded lists)
    * expressed as Spark-native parquet + plan constants. */
  /** One narrow assign+encode pass of `batch` under the index's frozen
    * quantizers: (n_id, ivf_cell, codes). */
  private def ivfPqEncodeRows(batch: DataFrame, ix: CoarseIndex,
      cwLit: Column): DataFrame =
    cellAssign(ix, batch, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        call_function("pq_encode", col("embedding"), cwLit).as("codes"))

  /** Build the persisted IVF-PQ index from scratch (overwrite). */
  def ivfPqBuildIndex(corpus: DataFrame, coarse: Array[Array[Double]],
      cw: Array[Array[Array[Double]]], indexPath: String): Unit =
    ivfPqEncodeRows(corpus, centroidIndex(coarse),
        typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(indexPath)

  /** Incremental index maintenance — the epoch-over-epoch shape
    * (yesterday's index + today's crawl): assign+encode ONLY the new
    * batch under the index's FROZEN quantizers and append its code rows;
    * a dynamic-partition append touches only the cell directories the
    * batch lands in, and the standing corpus is never re-read or
    * re-encoded. (Re-TRAINING the quantizers is a rebuild by definition —
    * codes are meaningless across codebooks — which is why FAISS indexes
    * freeze them at train time too.) */
  def ivfPqAppendToIndex(batch: DataFrame, coarse: Array[Array[Double]],
      cw: Array[Array[Array[Double]]], indexPath: String): Unit =
    ivfPqEncodeRows(batch, centroidIndex(coarse),
        typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq))
      .write.mode("append").partitionBy("ivf_cell").parquet(indexPath)

  /** Probe an already-persisted index: partition-pruned scans of the probe
    * cells' code lists, LUT-sum ADC, nCand exact re-rank against `corpus`
    * (the raw-embedding store — touched only for the bounded re-rank). */
  def ivfPqProbeIndex(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Array[Array[Double]], cw: Array[Array[Array[Double]]],
      indexPath: String, nprobe: Int, nCand: Int = 32): DataFrame = {
    val ix = centroidIndex(coarse)
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = corpus.sparkSession.read.parquet(indexPath)
    val q = broadcast(probeCells(ix, queries, nprobe)
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id")
      .select(col("q_id"), col("q_emb"), col("ivf_cell"),
        call_function("pq_lut", col("q_emb"), cwLit).as("lut")))
    ivfPqAdcScan(codes, q, corpus, k, cw.length, nCand)
  }

  def ivfPqFullTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Array[Array[Double]], cw: Array[Array[Array[Double]]],
      indexPath: String, nprobe: Int, nCand: Int = 32): DataFrame = {
    ivfPqBuildIndex(corpus, coarse, cw, indexPath)
    ivfPqProbeIndex(corpus, queries, k, coarse, cw, indexPath, nprobe, nCand)
  }

  /** Residual-encoding IVF+PQ — production FAISS semantics: PQ encodes
    * x − centroid(cell(x)) instead of x, so codewords model the (much
    * tighter) within-cell displacement distribution and ADC error drops.
    * Same plan shape as [[ivfPqTopK]]: the residual is one elementwise
    * zip_with subtraction feeding the same codegen'd `pq_encode`/`pq_lut`
    * (at 100 TB the subtraction would be fused into those expressions —
    * one extra operand read per element). Codebook = residuals of the
    * first `ksub` corpus vectors w.r.t. their assigned cells. */
  private def residCol: Column =
    zip_with(toDouble(col("embedding")), toDouble(col("rep")), (a, b) => a - b)

  /** Medoid residual codebook: residuals of the first `ksub` assigned
    * vectors w.r.t. their cells — bounded index-construction collect. */
  private def residualCodebook(assigned: DataFrame, m: Int, ksub: Int)
      : Array[Array[Array[Double]]] = {
    val d = 64 / m
    val cwRows = assigned.filter(col("vec_id") < ksub)
      .select(col("vec_id"), residCol.as("r"))
      .collect().map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray).toMap
    Array.tabulate(m, ksub, d)((s, j, i) => cwRows(j)(s * d + i))
  }

  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val assigned = cellAssign(ix, corpus, "embedding", "ivf_cell", withRep = true)
    ivfPqResidualProbe(ix, residualCodebook(assigned, m, ksub),
      corpus, queries, k, nCand)
  }

  /** Multi-probe RESIDUAL IVF+PQ — the full FAISS production default's
    * recall lever. Residual semantics make multi-probe genuinely
    * different from the raw-vector case: the ADC distance for a
    * candidate in cell c compares q − centroid(c) against the
    * candidate's residual code, so the query needs ONE LUT PER PROBED
    * CELL (FAISS computes exactly these per-list LUTs). Each probe row
    * carries its own cell-specific LUT — built row-locally from the
    * centroid map literal on the tiny broadcast query side; the corpus
    * stays one narrow assign+encode pass, and since a vector lives in
    * exactly one cell the ADC join scores each candidate under exactly
    * the LUT of its own cell. */
  def ivfPqResidualNprobeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, m: Int = 8, ksub: Int = 16, nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val assigned = cellAssign(ix, corpus, "embedding", "ivf_cell", withRep = true)
    val cw = residualCodebook(assigned, m, ksub)
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = assigned.select(col("vec_id").as("n_id"), col("ivf_cell"),
      call_function("pq_encode", residCol, cwLit).as("codes"))
    // per-probe LUT: residual of q w.r.t. the PROBED cell's centroid,
    // looked up row-locally in the (bounded) cell → centroid map literal
    val repMap = map_from_arrays(typedLit(ix._1.toSeq), centLit(ix))
    val q = broadcast(probeCells(ix, queries, nprobe)
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id")
      .select(col("q_id"), col("q_emb"), col("ivf_cell"),
        call_function("pq_lut",
          zip_with(toDouble(col("q_emb")),
            element_at(repMap, col("ivf_cell")), (a, b) => a - b),
          cwLit).as("lut")))
    ivfPqAdcScan(codes, q, corpus, k, m, nCand)
  }

  /** Residual IVF+PQ with BOTH quantizers trained — the FAISS production
    * default: coarse cells from the full-dimension k-means, PQ codewords
    * from k-means over the RESIDUALS of the (bounded) training sample
    * w.r.t. those cells. Training never scans the corpus: only the sample
    * is assigned for residual computation. */
  def ivfPqResidualTrainedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Array[Array[Double]], sampleN: Int = 256,
      nCand: Int = 32): DataFrame = {
    val ix = centroidIndex(coarse)
    val sampleResid = cellAssign(ix, corpus.filter(col("vec_id") < sampleN),
        "embedding", "ivf_cell", withRep = true)
      .select(col("vec_id"), residCol.as("embedding"))
    val cw = PqTrainer.trainCodebook(sampleResid, sampleN = sampleN)
    ivfPqResidualProbe(ix, cw, corpus, queries, k, nCand)
  }

  private def ivfPqResidualProbe(ix: CoarseIndex, cw: Array[Array[Array[Double]]],
      corpus: DataFrame, queries: DataFrame, k: Int, nCand: Int): DataFrame = {
    val m = cw.length
    val assigned = cellAssign(ix, corpus, "embedding", "ivf_cell", withRep = true)
    val cwLit = typedLit(cw.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = assigned.select(col("vec_id").as("n_id"), col("ivf_cell"),
      call_function("pq_encode", residCol, cwLit).as("codes"))
    val q = broadcast(cellAssign(ix, queries, "embedding", "ivf_cell", withRep = true)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("ivf_cell"),
        call_function("pq_lut", residCol, cwLit).as("lut")))
    val adc = codes.join(q, "ivf_cell")
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (0 until m).map(s =>
            element_at(element_at(col("lut"), s + 1),
              element_at(col("codes"), s + 1) + 1))
          .foldLeft(lit(0.0))(_ + _).as("adist"))
    val cand = rankTopK(adc, nCand, "adist", asc = true).select("q_id", "n_id")
    val rer = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(cand), "n_id")
      .join(q.select(col("q_id"), col("q_emb")), "q_id")
      .select(col("q_id"), col("n_id"), cosine(col("q_emb"), col("n_emb")).as("sim"))
    rankTopK(rer, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** ANN via LSH buckets: exact re-rank restricted to the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes)))
    val scored = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Multi-probe LSH: each query also probes the buckets at Hamming
    * distance 1 (one sign bit flipped) — the standard recall repair for
    * near neighbors straddling a hyperplane, at probe cost ×(nPlanes+1)
    * instead of a second table. The corpus stays bucketed ONCE (same
    * narrow pass as [[lshTopK]]); only the tiny broadcast query side
    * explodes over its probe list, and since probe buckets are distinct a
    * corpus vector matches at most one probe — no candidate dedup needed. */
  /** k-NN GRAPH: top-k cosine neighbors for EVERY corpus vector — the
    * primitive under graph-based dedup, SemDeDup neighborhoods, and label
    * propagation, where the query set IS the corpus. A broadcast-probe
    * plan is impossible here (the probe side is corpus-sized), so this is
    * the bucketed SELF-JOIN shape: one narrow sign-LSH bucketing pass,
    * a shuffle equi-join of the corpus against itself on the bucket key,
    * quadratic work only WITHIN buckets, then the bounded `topk_pairs`
    * per-vector ranking (never a per-key window over all scored pairs).
    *
    * Scale contract: nPlanes must grow with the corpus — buckets ≈
    * 2^nPlanes is both the shuffle-key cardinality and the occupancy
    * divisor, so planes ∝ log₂(N) keeps bucket size (the quadratic term)
    * constant while the shuffle stays balanced. Recall is bounded by
    * same-bucket membership, the standard LSH-graph trade; the
    * [[lshMultiProbeTopK]] probe-list repair composes if needed. */
  def knnGraph(corpus: DataFrame, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val bucketed = corpus
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), planes).as("bucket"))
    val q = bucketed
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val scored = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Cosine RANGE search (threshold retrieval, the other half of the ANN
    * API next to top-k): all corpus vectors within `threshold` cosine of
    * each query, candidate-pruned by the same Hamming-1 multi-probe
    * buckets as [[lshMultiProbeTopK]] — corpus bucketed once narrowly,
    * only the broadcast query side explodes over its probe list, exact
    * verify on candidates only. Like every bucketed retrieval, recall is
    * bounded by the probe list (neighbors ≥2 sign bits away are not
    * candidates); the oracle mirrors the bucketing so the candidate sets
    * agree structurally on any corpus. No ranking state at all — the
    * output is the filtered candidate set. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, threshold: Double,
      planes: Array[Array[Double]]): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val probeList = (b: Column) =>
      array(b +: planes.indices.map(j => b.bitwiseXOR(lit(1L << j))): _*)
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", explode(probeList(lshBucket(col("q_emb"), planes)))))
    bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val probeList = (b: Column) =>
      array(b +: planes.indices.map(j => b.bitwiseXOR(lit(1L << j))): _*)
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", explode(probeList(lshBucket(col("q_emb"), planes)))))
    val scored = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    rankTopK(scored, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  // ------------------------------------------------------ scalar quantizer

  /** Per-dimension symmetric SQ8 scales: s_i = max(|x_i|) over the corpus.
    * ONE aggregate job — posexplode then a map-side-combined per-dim max,
    * so the shuffle carries at most |partitions|·d rows at any corpus
    * size — collected as d doubles (index construction, bounded by the
    * dimension like the PQ codebook / coarse-centroid collects). */
  def sq8Train(corpus: DataFrame, dim: Int = 64): Array[Double] = {
    val rows = corpus
      .select(posexplode(toDouble(col("embedding"))).as(Seq("i", "x")))
      .groupBy("i").agg(max(abs(col("x"))).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Array.tabulate(dim)(rows(_))
  }

  /** code_i = floor(x_i / s_i · 127) ∈ [−127, 127] (floor, not round —
    * round-half modes differ across engines; all-zero dims code to 0). */
  private def sq8EncodeCol(emb: Column, sLit: Column): Column =
    zip_with(toDouble(emb), sLit, (x, s) =>
      when(s === 0d, lit(0L)).otherwise(floor(x / s * lit(127d))))

  /** Reconstruction x̂_i = code_i / 127 · s_i — exact double arithmetic on
    * integer codes, so Spark and the oracle decode bit-identically. */
  private def sq8DecodeCol(codes: Column, sLit: Column): Column =
    zip_with(codes, sLit, (c, s) => c.cast("double") / lit(127d) * s)

  /** Scalar-quantized ANN — the FAISS SQ8 rung of the capacity ladder
    * (flat > SQ8 > PQ): each vector stored as d int8 codes against ONE
    * shared per-dimension scale vector, 4× narrower than raw float32, with
    * per-dim fidelity kept (no subvector codebook), so recall sits between
    * brute force and PQ at intermediate compression. At 100 TB the scan
    * reads only the compressed code table; raw embeddings are touched
    * for the nCand exact re-rank alone. Scoring is asymmetric (raw query
    * against the decoded reconstruction); the decode is a narrow zip_with
    * against the d-element scale literal, materialized as an attribute
    * INSIDE the scan projection — the reconstruction never hits storage
    * and feeds the three cosine folds once per row. Candidate selection
    * and re-rank run through the same bounded topk_pairs two-phase
    * aggregate as every ANN family here — no window, no data-sized
    * collect. Composes with IVF via [[assignCells]] the same way PQ does. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCand: Int = 32, scales0: Option[Array[Double]] = None): DataFrame = {
    val sLit = typedLit(scales0.getOrElse(sq8Train(corpus)).toSeq)
    val codes = corpus.select(col("vec_id").as("n_id"),
      sq8EncodeCol(col("embedding"), sLit).as("codes"))
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb")))
    val scored = codes.crossJoin(q)
      .filter(col("n_id") =!= col("q_id"))
      // decode materializes as an ATTRIBUTE before the cosine (same
      // discipline as quantizeInt8): a captured non-attribute subtree
      // would re-evaluate the zip_with per fold in interpreted HOF eval
      .select(col("q_id"), col("n_id"), col("q_emb"),
        sq8DecodeCol(col("codes"), sLit).as("dec"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("dec")).as("asim"))
    exactRerank(corpus, q, rankTopK(scored, nCand, "asim", asc = false), k)
  }

  /** Exact cosine re-rank of a bounded candidate set against the raw
    * embedding store — the shared tail of every approximate family:
    * `cand(q_id, n_id)` is ≤ |Q|·nCand rows (broadcast), `q(q_id, q_emb)`
    * is the broadcast query side; the corpus is touched only to fetch the
    * candidates' embeddings. */
  private def exactRerank(corpus: DataFrame, q: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val rer = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(cand.select("q_id", "n_id")), "n_id")
      .join(q.select("q_id", "q_emb"), "q_id")
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("sim"))
    rankTopK(rer, k, "sim", asc = false)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** IVF × SQ8 — the FAISS IndexIVFScalarQuantizer: coarse cells prune the
    * scan to the query's inverted list; within it candidates score over
    * int8 codes (asymmetric in-projection decode), then the nCand exact
    * re-rank. The persisted layout composes the same way as IVF-PQ's
    * (codes partitioned by cell); at 100 TB a probe reads one cell's worth
    * of 64-byte codes instead of raw vectors. */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val sLit = typedLit(sq8Train(corpus).toSeq)
    val codes = cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        sq8EncodeCol(col("embedding"), sLit).as("codes"))
    val q = broadcast(cellAssign(ix, queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("ivf_cell")))
    val scored = codes.join(q, "ivf_cell")
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), col("q_emb"),
        sq8DecodeCol(col("codes"), sLit).as("dec"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("dec")).as("asim"))
    exactRerank(corpus, q, rankTopK(scored, nCand, "asim", asc = false), k)
  }

  /** Persisted IVF × SQ8 — the build-once / probe-many layout of the
    * scalar-quantized index (the SQ8 sibling of [[ivfPqPersistedTopK]]):
    * (n_id, codes) written ONCE as parquet PARTITIONED BY cell — the
    * directory layout is the inverted index and the storage is the 4×-
    * compressed int8 representation — so a later query batch pays a
    * partition-pruned scan of its probed cell's code list, the
    * in-projection asymmetric decode, and the nCand exact re-rank.
    * Result-identical to [[ivfSq8TopK]] (same reps, scales, assignment),
    * so ann_ivf_sq8's oracle is the twin. */
  def ivfSq8PersistedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      indexPath: String, nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val sLit = typedLit(sq8Train(corpus).toSeq)
    cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        sq8EncodeCol(col("embedding"), sLit).as("codes"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(indexPath)
    val codes = corpus.sparkSession.read.parquet(indexPath)
    val q = broadcast(cellAssign(ix, queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("ivf_cell")))
    val scored = codes.join(q, "ivf_cell")
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), col("q_emb"),
        sq8DecodeCol(col("codes"), sLit).as("dec"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("dec")).as("asim"))
    exactRerank(corpus, q, rankTopK(scored, nCand, "asim", asc = false), k)
  }

  /** Multi-probe IVF × SQ8 — the nprobe recall lever composed with the
    * scalar-quantized scan (the SQ8 sibling of [[ivfPqNprobeTopK]]): each
    * query probes its `nprobe` nearest cells and scores their int8 code
    * lists asymmetrically (shared per-dim scale vector — unlike residual
    * PQ, the SQ8 decode is cell-independent, so one decode expression
    * serves every probed cell). Corpus side unchanged from [[ivfSq8TopK]]
    * (one narrow assign+encode pass; a vector lives in exactly one
    * inverted list, so probe fan-out never duplicates candidates); only
    * the tiny broadcast query side fans out ×nprobe. At 100 TB a probe
    * reads nprobe cells' worth of 64-byte codes, then the nCand exact
    * re-rank touches raw embeddings. */
  def ivfSq8NprobeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, nCand: Int = 32): DataFrame = {
    val ix = medoidIndex(corpus)
    val sLit = typedLit(sq8Train(corpus).toSeq)
    val codes = cellAssign(ix, corpus, "embedding", "ivf_cell")
      .select(col("vec_id").as("n_id"), col("ivf_cell"),
        sq8EncodeCol(col("embedding"), sLit).as("codes"))
    val q = broadcast(probeCells(ix, queries, nprobe).join(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      "q_id"))
    val scored = codes.join(q, "ivf_cell")
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), col("q_emb"),
        sq8DecodeCol(col("codes"), sLit).as("dec"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("dec")).as("asim"))
    exactRerank(corpus, q.select("q_id", "q_emb").dropDuplicates("q_id"),
      rankTopK(scored, nCand, "asim", asc = false), k)
  }

  /** Recall-vs-nprobe CURVE in one pass — the operating-curve view of the
    * single-point `ann_recall` measurement: for each nprobe in `nprobes`,
    * hits@k of the multi-probe IVF against the exact brute-force top-k.
    * This is the dial a 100 TB deployment actually tunes (probe more
    * cells → scan more inverted lists → higher recall), measured rather
    * than guessed.
    *
    * Cost discipline: the corpus is assigned ONCE (narrow projection),
    * queries probe their top max(nprobes) cells ONCE (each probe cell
    * carries its rank `pr`), candidates are scored ONCE against the
    * widest probe set and localCheckpointed; each curve point then only
    * re-ranks the scored table filtered to `pr ≤ nprobe` through the
    * bounded top-k aggregate — never re-assigning, re-probing or
    * re-scoring. The exact baseline is computed once and checkpointed
    * for the same reason. Output: (nprobe, hits), hits out of k·|Q|. */
  def ivfNprobeCurve(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobes: Seq[Int]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val maxNp = nprobes.max
    val ix = medoidIndex(corpus)
    val bucketed = cellAssign(ix, corpus, "embedding", "ivf_cell")
    // probeCells with the probe RANK kept: topk_pairs orders by
    // (csim desc, cell asc) — identical to the single-point variant
    val qScored = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(col("q_id"), col("q_emb"),
        posexplode(centLit(ix)).as(Seq("cpos", "cvec")))
      .select(col("q_id"),
        element_at(typedLit(ix._1.toSeq), col("cpos") + 1).as("cell"),
        cosine(col("q_emb"), col("cvec")).as("csim"))
    val probed = qScored.groupBy("q_id")
      .agg(call_function("topk_pairs", col("cell"), col("csim"),
        lit(maxNp), lit(false)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("pr"),
        col("p.n_id").as("ivf_cell"))
    val q = broadcast(probed.join(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      "q_id"))
    val scored = bucketed.join(q, "ivf_cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("pr"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
      .transform(graft.config.Lineage.cutLazy)
    val exact = bruteForceTopK(corpus, queries, k).select("q_id", "n_id")
      .transform(graft.config.Lineage.cutLazy)
    nprobes.map { np =>
      exact.join(
          rankTopK(scored.filter(col("pr") <= np), k, "sim", asc = false)
            .select("q_id", "n_id"),
          Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(np.toLong).as("nprobe"), col("hits"))
    }.reduce(_ unionAll _)
  }
}
