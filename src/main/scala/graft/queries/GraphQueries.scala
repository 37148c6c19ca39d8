package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over an event-derived interaction graph (SURVEY.md §2.3
  * extension family `graph_*`). A web-scale training-data pipeline needs
  * graph signals — link-graph PageRank for domain quality (the CommonCrawl
  * ranking signal), triangle/clustering structure for community spam
  * detection, k-hop candidate generation for link-prediction data — and
  * each of those is an iterative/self-join shape whose SCALE behavior (not
  * its per-row math) is the hard part.
  *
  * Everything here is integer-exact by construction — fixed-point ranks
  * with truncating division, integer counts — so the DuckDB oracle matches
  * bit-for-bit regardless of partitioning or summation order (no float
  * drift, unlike a naive double PageRank whose `sum` order would differ
  * per plan).
  *
  * The edge set is synthesized deterministically from `events` (the
  * testdata carries no link table): `src = user_id`,
  * `dst = event_id mod 150`, keeping only ~30% of click/view events so the
  * graph is sparse-ish. Both engines derive it with the same SQL, so the
  * graph — like the syslog lines in [[Synth]] — is part of the shared
  * contract, not a private fixture.
  *
  * Scale notes (the 100-TB design):
  *   - Edges are the big table; node state (ranks/labels) is |V|-sized.
  *     Every iteration joins edges⋈state on src and re-aggregates on dst —
  *     the canonical Pregel data movement. Edges are persisted ONCE
  *     pre-partitioned on `src` so each iteration's state join reuses the
  *     same partitioning instead of re-shuffling the big side 5×.
  *   - Triangle counting uses the degree-orientation trick: orient every
  *     undirected edge from its lower-(degree,id) endpoint to the higher
  *     one, making each triangle a DAG with exactly ONE two-out-edge apex.
  *     Wedge generation at the apex is then O(Σ out_deg²) with out-degrees
  *     bounded by √|E| — the hub blowup (a 10⁶-degree node generating
  *     10¹² wedges) cannot happen by construction.
  *   - Label propagation / two-hop are bounded-round self-joins; rounds are
  *     fixed (not run-to-convergence) so cost is predictable and the
  *     result is a pure function of the input on both engines.
  */
object GraphQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** Fixed-point scale for PageRank ranks: 1 rank unit = 1e-12. */
  private val Scale = 1000000000000L
  private val PrIters = 5
  private val LpIters = 8

  /** The shared deterministic edge contract (see class doc). Distinct
    * directed edges, self-loops dropped. */
  def edges(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type").isin("click", "view") && col("event_id") % 10 < 3)
      .select(col("user_id").as("src"), (col("event_id") % 150).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  private val EdgesSql =
    """SELECT DISTINCT user_id AS src, event_id % 150 AS dst FROM events
      |  WHERE event_type IN ('click','view') AND event_id % 10 < 3
      |    AND user_id <> event_id % 150""".stripMargin

  /** Node set = every endpoint. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

  // ---------------------------------------------------------------- degree

  /** In/out/total degree per node — the profile every other graph op's cost
    * model starts from. One union + one shuffle on `node`. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"), lit(1L).as("o"), lit(0L).as("i"))
      .union(edges.select(col("dst").as("node"), lit(0L).as("o"), lit(1L).as("i")))
      .groupBy("node")
      .agg(sum("o").as("out_deg"), sum("i").as("in_deg"))
      .withColumn("total_deg", col("out_deg") + col("in_deg"))

  private val qDegree: Q = (s, dir) =>
    degrees(edges(s, dir)).orderBy("node")

  // -------------------------------------------------------------- pagerank

  /** PageRank, [[PrIters]] synchronous iterations, damping 0.85, in 1e-12
    * fixed point with truncating division (all operands positive, so Spark
    * `div` == DuckDB `//`). Dangling mass is dropped — both engines apply
    * the same rule, and at web scale the redistribution term is usually
    * folded into the teleport constant anyway. Returns (node, rank_e12). */
  def pagerank(s: SparkSession, edgeDf: DataFrame, iters: Int = PrIters): DataFrame = {
    val nd = nodes(edgeDf).persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree rides on the edge rows so the per-iteration join is ONE
    // state⋈edges join on src (pre-partitioned), then the dst re-agg.
    val eDeg = edgeDf.join(
        edgeDf.groupBy("src").agg(count(lit(1)).as("out_deg")), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nd.count() // |V|-sized driver scalar, same role as the oracle's subquery
      val init = Scale / n
      val base = (15L * Scale / 100L) / n
      var ranks = nd.withColumn("rank_e12", lit(init))
      for (_ <- 1 to iters) {
        val inbound = eDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_e12 div out_deg").as("contrib"))
          .groupBy("node").agg(sum("contrib").as("inb"))
        // eager per-round lineage cut — the iterative-graph discipline
        // (GraphX checkpoint cadence): without it round k's plan replays
        // rounds 1..k-1, turning k rounds into O(k²) recompute (and
        // EXPONENTIAL when the state is referenced twice per round).
        // Cost: one |V|-row materialization per round.
        ranks = nd.join(inbound, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("85 * coalesce(inb, 0L) div 100")).as("rank_e12"))
          .transform(graft.config.Lineage.cut)
      }
      ranks.orderBy("node")
    } finally { eDeg.unpersist(); nd.unpersist() }
  }

  private val qPagerank: Q = (s, dir) => pagerank(s, edges(s, dir))

  /** Personalized PageRank: random walk with restart to a SEED set (nodes
    * ≡ 0 mod 10) — the recommendation / related-items primitive. Identical
    * iteration shape and fixed-point discipline as [[pagerank]]; only the
    * teleport term changes (mass restarts at seeds, so rank concentrates
    * in the seeds' neighborhoods instead of spreading globally). */
  def personalizedPagerank(s: SparkSession, edgeDf: DataFrame,
      iters: Int = PrIters): DataFrame = {
    val nd = nodes(edgeDf).persist(StorageLevel.MEMORY_AND_DISK)
    val eDeg = edgeDf.join(
        edgeDf.groupBy("src").agg(count(lit(1)).as("out_deg")), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val isSeed = col("node") % 10 === 0
      val nSeeds = nd.filter(isSeed).count()
      require(nSeeds > 0, "seed set empty — personalization undefined")
      val init = Scale / nSeeds
      val base = (15L * Scale / 100L) / nSeeds
      var ranks = nd.withColumn("rank_e12",
        when(isSeed, lit(init)).otherwise(lit(0L)))
      for (_ <- 1 to iters) {
        val inbound = eDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("rank_e12 div out_deg").as("contrib"))
          .groupBy("node").agg(sum("contrib").as("inb"))
        // per-round lineage cut — see pagerank
        ranks = nd.join(inbound, Seq("node"), "left")
          .select(col("node"),
            (when(isSeed, lit(base)).otherwise(lit(0L)) +
              expr("85 * coalesce(inb, 0L) div 100")).as("rank_e12"))
          .transform(graft.config.Lineage.cut)
      }
      ranks.orderBy("node")
    } finally { eDeg.unpersist(); nd.unpersist() }
  }

  private val qPpr: Q = (s, dir) => personalizedPagerank(s, edges(s, dir))

  // ------------------------------------------------------------- triangles

  /** Exact global triangle + wedge count and clustering coefficient (ppm,
    * truncating) via degree orientation (see class doc). One row. */
  def triangles(edgeDf: DataFrame): DataFrame = {
    val und = edgeDf.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a—b from the lower (deg, id) endpoint to the higher
    val oriented = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val e1 = oriented.select(col("u"), col("v").as("v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"))
    val wedgeApex = e1.join(e2, "u").filter(col("v1") < col("v2"))
    val tri = wedgeApex.join(und,
        least(col("v1"), col("v2")) === col("a") &&
        greatest(col("v1"), col("v2")) === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    tri.crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        expr("CASE WHEN n_wedges = 0 THEN 0L ELSE 3 * n_triangles * 1000000 div n_wedges END")
          .as("clustering_ppm"))
  }

  private val qTriangles: Q = (s, dir) => triangles(edges(s, dir))

  /** Per-node triangle counts + LOCAL clustering coefficient (ppm) — the
    * node-granular spam/community signal next to the global coefficient.
    * Same degree-oriented wedge join as [[triangles]]; each matched
    * triangle credits its three corners via a 3-row explode, so the extra
    * cost over the global count is one |triangles|-sized shuffle. */
  def localClustering(edgeDf: DataFrame): DataFrame = {
    val und = edgeDf.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val tri = oriented.select(col("u"), col("v").as("v1"))
      .join(oriented.select(col("u"), col("v").as("v2")), "u")
      .filter(col("v1") < col("v2"))
      .join(und, least(col("v1"), col("v2")) === col("a") &&
        greatest(col("v1"), col("v2")) === col("b"))
    val perNode = tri.select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("local_cc_ppm",
        when(col("deg") < 2, lit(0L))
          .otherwise(expr("2 * n_triangles * 1000000 div (deg * (deg - 1))")))
      .orderBy("node")
  }

  private val qLocalClustering: Q = (s, dir) => localClustering(edges(s, dir))

  // --------------------------------------------------------------- two-hop

  /** Per-source count of nodes reachable in exactly two directed hops that
    * are NOT already direct neighbors (and not the source) — the
    * friend-of-friend candidate set behind link-prediction training pairs.
    * Distinct-pair dedup happens on (src, dst2) BEFORE the count, and the
    * direct-edge exclusion is a left-anti join, not a NOT IN collect. */
  /** Deterministic per-key adjacency cap: keeps at most `cap` rows per
    * `key` value, lowest (deg(other), other) first — the hub-wedge bound
    * production link-prediction systems apply before a shared-neighbor
    * join. Wedge volume through a node w is deg(w)² (10¹² rows for one
    * 10⁶-degree hub); the cap turns it into min(deg(w), cap)². The
    * estimator BIAS is documented at the call sites: scores through capped
    * hubs undercount, deterministically (same survivors on every run /
    * engine, because the keep-order is a total order). The partitioned
    * row_number window scales — each hub's neighbor list sorts within its
    * own partition. */
  private def capPerKey(adj: DataFrame, key: String, other: String,
      cap: Int): DataFrame = {
    val deg = adj.groupBy(other).agg(count(lit(1)).as("__odeg"))
    adj.join(deg, other)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(key)
          .orderBy(col("__odeg"), col(other))))
      .filter(col("__rn") <= cap)
      .drop("__rn", "__odeg")
  }

  /** @param maxNbrs optional hub cap (default off = exact): bounds each
    *   mid-node's fan-in/fan-out to the `maxNbrs` lowest-(degree, id)
    *   neighbors before the wedge join, making the two-hop candidate
    *   volume Σ min(deg,cap)² instead of Σ deg² — counts through capped
    *   hubs are deterministic undercounts. */
  def twoHop(edgeDf: DataFrame, maxNbrs: Option[Int] = None): DataFrame = {
    val left0 = edgeDf.select(col("src"), col("dst").as("mid"))
    val right0 = edgeDf.select(col("src").as("mid"), col("dst").as("dst2"))
    val (left, right) = maxNbrs match {
      case Some(cap) =>
        (capPerKey(left0, "mid", "src", cap), capPerKey(right0, "mid", "dst2", cap))
      case None => (left0, right0)
    }
    val hop2 = left.join(right, "mid")
      .filter(col("dst2") =!= col("src"))
      .select("src", "dst2").distinct()
    hop2.join(edgeDf.withColumnRenamed("dst", "dst2"), Seq("src", "dst2"), "left_anti")
      .groupBy("src").agg(count(lit(1)).as("n_two_hop"))
  }

  private val qTwoHop: Q = (s, dir) => twoHop(edges(s, dir)).orderBy("src")

  // ----------------------------------------- neighbor-set similarity

  /** Common-neighbor counts + neighbor-Jaccard (×10000, truncating) for
    * every unordered node pair sharing at least one undirected neighbor —
    * the classic link-prediction score. Candidate pairs come from the
    * wedge join (never all pairs): only nodes with a common neighbor meet,
    * and the wedge volume is degree-bounded like [[triangles]]. */
  /** @param maxNbrs optional hub cap (default off = exact): bounds each
    *   SHARED neighbor w's adjacency to the `maxNbrs` lowest-(degree, id)
    *   endpoints before the wedge join (volume Σ min(deg(w),cap)², not
    *   Σ deg(w)²). With a binding cap, `common` and the Jaccard numerator
    *   deterministically undercount pairs that meet only through capped
    *   hubs; `da`/`dc` stay exact. */
  def commonNeighbors(edgeDf: DataFrame, maxNbrs: Option[Int] = None): DataFrame = {
    val sym = edgeDf.select(col("src").as("n"), col("dst").as("nbr"))
      .union(edgeDf.select(col("dst").as("n"), col("src").as("nbr")))
      .distinct()
    val deg = sym.groupBy("n").agg(count(lit(1)).as("deg"))
    val wedgeAdj = maxNbrs match {
      case Some(cap) => capPerKey(sym, "nbr", "n", cap)
      case None => sym
    }
    val pairs = wedgeAdj.select(col("n").as("a"), col("nbr"))
      .join(wedgeAdj.select(col("n").as("c"), col("nbr")), "nbr")
      .filter(col("a") < col("c"))
      .groupBy("a", "c").agg(count(lit(1)).as("common"))
    pairs
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("n", "c").withColumnRenamed("deg", "dc"), "c")
      .select(col("a"), col("c"), col("common"),
        expr("10000 * common div (da + dc - common)").as("jaccard_x10000"))
      .orderBy("a", "c")
  }

  private val qCommonNeighbors: Q = (s, dir) => commonNeighbors(edges(s, dir))

  /** The capped variant AS ITS OWN ORACLE-CHECKED KEY: cap=64 with the
    * DuckDB twin implementing the SAME deterministic (deg, id) cap, so
    * the key is exact at every SF — and at 10x data it stays bounded
    * while the exact key's wedge volume grows quadratically (measured:
    * sf1 wedge volume 264M vs sf0.1's 2.8M on the 150 planted hub
    * nodes; the exact key ran 140x slower at 10x data, the capped one
    * is the production path). */
  private val qCommonNeighborsCapped: Q = (s, dir) =>
    commonNeighbors(edges(s, dir), maxNbrs = Some(64))

  // ------------------------------------------------------------- k-core

  /** Fixed-round k-core peeling over the undirected graph: [[KcoreIters]]
    * rounds of "drop every node with degree < k, drop incident edges" —
    * the standard web-graph quality/spam filter (a node surviving the
    * 3-core has 3 independent mutual-linkage witnesses). Fixed rounds keep
    * the result a pure function of the input; on this graph peeling
    * reaches its fixed point well inside the budget, and either way both
    * engines compute the same rounds. Returns surviving (node, core_deg). */
  def kcore(edgeDf: DataFrame, k: Int = 3, iters: Int = KcoreIters): DataFrame = {
    var e = edgeDf.select(col("src").as("u"), col("dst").as("v"))
      .union(edgeDf.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .transform(graft.config.Lineage.cut)
    for (_ <- 1 to iters) {
      val alive = e.groupBy("u").agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select("u")
      // per-round lineage cut — e is referenced twice (two semi-joins)
      e = e.join(alive, "u")
        .join(alive.withColumnRenamed("u", "v"), "v")
        .select("u", "v")
        .transform(graft.config.Lineage.cut)
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy("node")
  }

  private val KcoreIters = 8
  private val qKcore: Q = (s, dir) => kcore(edges(s, dir))

  /** Log-binned degree histogram (ilog2 buckets) — the power-law profile
    * read before choosing skew defenses. ONE agg onto ≤ 64 cells. */
  private val qDegreeHist: Q = (s, dir) =>
    degrees(edges(s, dir))
      .select(expr("length(bin(total_deg)) - 1").cast("long").as("bucket_ilog2"))
      .groupBy("bucket_ilog2").agg(count(lit(1)).as("n_nodes"))
      .orderBy("bucket_ilog2")

  // -------------------------------------------------------- BFS layers

  private val BfsIters = 4

  /** Multi-source BFS from the seed set (node ≡ 0 mod 10, the ppr seeds):
    * after [[BfsIters]] fixed rounds each reached node carries its exact
    * hop distance to the nearest seed (min-plus propagation over the
    * undirected graph — same iteration scaffold and per-round lineage cut
    * as [[labelProp]], state = the REACHED frontier only, so early rounds
    * move |frontier|-sized tables, not |V|). Unreached nodes are absent.
    * Null handling in the min-merge is explicit CASE (never `least`):
    * Spark's least skips nulls, SQL's returns null — the one place the
    * engines' built-ins disagree. */
  def bfsLayers(edgeDf: DataFrame, iters: Int = BfsIters): DataFrame = {
    val sym = edgeDf.select(col("src").as("u"), col("dst").as("v"))
      .union(edgeDf.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sym.count()
      var dist = nodes(edgeDf).filter(col("node") % 10 === 0)
        .withColumn("dist", lit(0L))
      for (_ <- 1 to iters) {
        val viaNbr = sym
          .join(dist.withColumnRenamed("node", "v"), "v")
          .groupBy(col("u").as("node")).agg(min(col("dist") + 1).as("nd"))
        // per-round lineage cut — see labelProp
        dist = dist.join(viaNbr, Seq("node"), "full_outer")
          .select(col("node"),
            when(col("dist").isNull, col("nd"))
              .when(col("nd").isNull, col("dist"))
              .otherwise(least(col("dist"), col("nd"))).as("dist"))
          .transform(graft.config.Lineage.cut)
      }
      dist.orderBy("node")
    } finally sym.unpersist()
  }

  private val qBfsLayers: Q = (s, dir) => bfsLayers(edges(s, dir))

  // ------------------------------------------- resource allocation

  /** Resource-allocation link-prediction index (Zhou–Lü–Zhang): for every
    * unordered pair with ≥1 common undirected neighbor,
    * RA = Σ_w 1/deg(w) over common neighbors w — in exact 1e-12 fixed
    * point with truncating division, so no float drift (the reason this
    * index is here instead of Adamic–Adar's 1/log deg). Same wedge-join
    * candidate generation as [[commonNeighbors]]: pairs meet only through
    * a shared neighbor, volume degree-bounded, never all-pairs. */
  /** @param maxNbrs optional hub cap (default off = exact) — same
    *   deterministic wedge bound as [[commonNeighbors]]; RA scores through
    *   capped hubs undercount by exactly the dropped wedges' 1/deg(w)
    *   terms. */
  def resourceAlloc(edgeDf: DataFrame, maxNbrs: Option[Int] = None): DataFrame = {
    val sym = edgeDf.select(col("src").as("n"), col("dst").as("nbr"))
      .union(edgeDf.select(col("dst").as("n"), col("src").as("nbr")))
      .distinct()
    val deg = sym.groupBy("n").agg(count(lit(1)).as("deg"))
    val wedgeAdj = maxNbrs match {
      case Some(cap) => capPerKey(sym, "nbr", "n", cap)
      case None => sym
    }
    wedgeAdj.select(col("n").as("a"), col("nbr"))
      .join(wedgeAdj.select(col("n").as("c"), col("nbr")), "nbr")
      .filter(col("a") < col("c"))
      .join(deg.withColumnRenamed("n", "nbr").withColumnRenamed("deg", "dw"), "nbr")
      .groupBy("a", "c")
      .agg(count(lit(1)).as("common"),
        sum(expr(s"${Scale}L div dw")).as("ra_score_e12"))
      .orderBy("a", "c")
  }

  private val qResourceAlloc: Q = (s, dir) => resourceAlloc(edges(s, dir))

  /** The capped production shape (cap 64, non-binding on the synth graph
    * — GraphSpec pins capped == uncapped there). The session-7 full-sf1
    * run measured WHY this key exists: the uncapped twin goes 2.3 s →
    * 266 s at 10x data (the Σ deg(w)² wedge quadratic) while the capped
    * common-neighbors variant stays flat — this key gives the RA scorer
    * the same measured rung. */
  private val qResourceAllocCapped: Q = (s, dir) =>
    resourceAlloc(edges(s, dir), maxNbrs = Some(64))

  // ---------------------------------------------- label-prop components

  /** Fixed-round ([[LpIters]]) minimum-label propagation over the
    * UNDIRECTED graph: label(v) starts at v and each round takes the min
    * over v and its neighbors. After k rounds every node holds the minimum
    * node id within k hops — on a graph with diameter ≤ k that IS the
    * connected-component id, and either way it's a pure, engine-agnostic
    * function of the input (no convergence race). */
  def labelProp(edgeDf: DataFrame, iters: Int = LpIters): DataFrame = {
    val sym = edgeDf.select(col("src").as("u"), col("dst").as("v"))
      .union(edgeDf.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sym.count()
      var labels = nodes(edgeDf).withColumn("label", col("node"))
      for (_ <- 1 to iters) {
        val fromNbr = sym
          .join(labels.withColumnRenamed("node", "v"), "v")
          .groupBy(col("u").as("node")).agg(min("label").as("nbr_min"))
        // the per-round lineage cut is LOAD-BEARING here: `labels` is
        // referenced twice per round (neighbor join + carry-over), so an
        // uncut plan DOUBLES per round — 2⁸ recompute by round 8 (measured
        // 106 s at sf0.1 before the cut). One |V|-row materialization per
        // round is the price of linear cost.
        labels = labels.join(fromNbr, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
          .transform(graft.config.Lineage.cut)
      }
      labels
    } finally sym.unpersist()
  }

  private val qLabelProp: Q = (s, dir) => labelProp(edges(s, dir)).orderBy("node")

  // ------------------------------------- star-contraction components

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds —
    * the Alternating algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond" (SoCC '14, §3; public paper). Where min-label
    * propagation ([[labelProp]]) needs DIAMETER rounds — a chain-shaped
    * component at 100 TB means thousands of shuffles — star contraction
    * converges in O(log² n) rounds regardless of diameter: large-star
    * rewires every strictly-larger neighbor of each node onto the minimum
    * of its closed neighborhood, small-star does the same for the
    * not-larger side, and together the edge set collapses geometrically
    * toward the star forest rooted at each component's minimum id. Per
    * round the shuffle volume is edge-linear (grouped min + re-emit +
    * distinct), i.e. the same order as ONE label-prop round, but distances
    * shrink multiplicatively instead of by one hop.
    *
    * Convergence = the canonical edge set is EXACTLY unchanged by a full
    * round, tested with count + `except` emptiness on the checkpointed
    * sets (not a checksum: a colliding checksum could silently bless a
    * partial contraction). Every intermediate cuts lineage via
    * localCheckpoint — the repo-wide iterative-operator discipline
    * ([[labelProp]]'s measured 2^rounds replay without it). At
    * convergence each component is one star (a=root=component min,
    * b=member), so labels are a single left join from the node set. */
  def starContractCC(edgeDf: DataFrame, maxRounds: Int = 25): DataFrame = {
    val allNodes = nodes(edgeDf).transform(graft.config.Lineage.cut)
    var e = edgeDf.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .transform(graft.config.Lineage.cut)
    var eCount = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star: every v ∈ Γ(u) with v > u attaches to m(u) = min(Γ⁺(u))
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val lMins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(lMins, "u").filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .transform(graft.config.Lineage.cut)
      // small-star: orient big→small; u and its smaller neighbors N(u)
      // all attach to m(u) = min(N(u))
      val d = ls.select(col("b").as("u"), col("a").as("v")) // v < u by canon
      val sMins = d.groupBy("u").agg(min("v").as("m"))
      // BOTH convergence signals ride the checkpoint job as observe
      // metrics — one driver-synchronous action per half-step (the
      // CC-loop discipline; see Dedup.connectedComponents). Set equality
      // is |ss| == |e| ∧ ss ⊆ e; the subset test is a left join against
      // the (checkpointed, canonical-unique) previous edge set counting
      // unmatched rows — this replaces the converging round's separate
      // `except` action (its own multi-stage job, r14 verdict item 10).
      val obs = org.apache.spark.sql.Observation(s"star_count_$round")
      val ss = d.join(sMins, "u").select(col("v").as("x"), col("m"))
        .unionAll(sMins.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(least(col("x"), col("m")).as("a"),
          greatest(col("x"), col("m")).as("b"))
        .distinct()
        // e is canonical-distinct, so the marker join is row-preserving
        .join(e.select(col("a"), col("b"), lit(1).as("seen")),
          Seq("a", "b"), "left")
        .observe(obs, count(lit(1)).as("n"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"))
        .select(col("a"), col("b"))
        .transform(graft.config.Lineage.cut)
      def metric(k: String): Long = graft.config.Metrics.awaitLong(
        obs, k, s"starContractCC round $round")
      val ssCount = metric("n")
      converged = ssCount == eCount && metric("n_new") == 0L
      e = ss
      eCount = ssCount
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starContractCC did not converge in $maxRounds rounds — " +
          "theoretically impossible under O(log² n) convergence at this " +
          "scale; raise maxRounds only after inspecting the edge set")
    // star forest: every member node has exactly ONE edge, to its root.
    // The min() re-agg is belt-and-braces (a violated star invariant would
    // otherwise duplicate rows); GraphSpec pins uniqueness directly.
    allNodes
      .join(e.select(col("b").as("node"), col("a").as("root")), Seq("node"), "left")
      .groupBy("node").agg(min(coalesce(col("root"), col("node"))).as("label"))
  }

  private val qStarContract: Q = (s, dir) =>
    starContractCC(edges(s, dir)).orderBy("node")

  // --------------------------------------------------------- modularity

  /** Newman modularity of the label-propagation communities — EXACT, in
    * integers: Q = Σ_c [L_c/m − (D_c/2m)²] over communities c with L_c
    * intra-community edges, D_c total degree, m undirected edges. Instead
    * of floating division, report the exact rational Q = num / (4m²):
    * num = Σ_c (4·m·L_c − D_c²) — every term integer, so the score is
    * bit-independent of partitioning and the oracle matches exactly.
    * Per-community rows carry (label, n_nodes, intra_edges, total_deg);
    * the __total__ row carries (num, den). */
  def modularity(s: SparkSession, edgeDf: DataFrame): DataFrame = {
    val und = edgeDf.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().transform(graft.config.Lineage.cut)
    val labels = labelProp(edgeDf, ModularityRounds)
    val m = und.count()
    val withLa = und
      .join(labels.withColumnRenamed("node", "a").withColumnRenamed("label", "la"), "a")
      .join(labels.withColumnRenamed("node", "b").withColumnRenamed("label", "lb"), "b")
    val intra = withLa.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("intra_edges"))
    val degByLabel = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .join(labels, "node")
      .groupBy("label").agg(count(lit(1)).as("total_deg"))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val per = sizes
      .join(degByLabel, Seq("label"), "left")
      .join(intra, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        coalesce(col("total_deg"), lit(0L)).as("total_deg"))
    val total = per.agg(
        sum(expr(s"4 * ${m}L * intra_edges - total_deg * total_deg")).as("num"))
      .select(lit(-1L).as("label"), lit(0L).as("n_nodes"),
        col("num").as("intra_edges"), lit(4L * m * m).as("total_deg"))
    // the __total__ row reuses the numeric columns as (num, den) — flagged
    // by label = -1 (node ids are nonnegative)
    per.unionAll(total).orderBy("label")
  }

  private val qModularity: Q = (s, dir) => modularity(s, edges(s, dir))

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, Q] = Map(
    "graph_degree" -> qDegree,
    "graph_pagerank" -> qPagerank,
    "graph_ppr" -> qPpr,
    "graph_triangles" -> qTriangles,
    "graph_local_clustering" -> qLocalClustering,
    "graph_kcore" -> qKcore,
    "graph_degree_hist" -> qDegreeHist,
    "graph_common_neighbors" -> qCommonNeighbors,
    "graph_common_neighbors_capped" -> qCommonNeighborsCapped,
    "graph_modularity" -> qModularity,
    "graph_two_hop" -> qTwoHop,
    "graph_cc_labelprop" -> qLabelProp,
    "graph_cc_starcontract" -> qStarContract,
    "graph_bfs_layers" -> qBfsLayers,
    "graph_resource_alloc" -> qResourceAlloc,
    "graph_resource_alloc_capped" -> qResourceAllocCapped)

  private val prOracle: String = {
    val base = s"(15 * ${Scale}::BIGINT // 100) // (SELECT count(*) FROM n0)"
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT n0.node,
         |    $base + (85 * coalesce(s.c, 0)) // 100 AS rank_e12
         |  FROM n0 LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank_e12 // d.out_deg) AS BIGINT) AS c
         |    FROM e JOIN r${k - 1} r ON r.node = e.src
         |           JOIN od d ON d.node = e.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    s"""WITH e AS ($EdgesSql),
       |n0 AS (SELECT DISTINCT src AS node FROM e
       |       UNION SELECT DISTINCT dst FROM e),
       |od AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, ${Scale}::BIGINT // (SELECT count(*) FROM n0) AS rank_e12
       |       FROM n0),
       |${(1 to PrIters).map(iter).mkString(",\n")}
       |SELECT node, rank_e12 FROM r$PrIters ORDER BY node""".stripMargin
  }

  /** Shared label-propagation CTE chain (WITH-prefix, final table
    * `l{rounds}`). MATERIALIZED: each round references the prior label
    * table twice — see the kcore oracle note (11 s → sub-second at sf0.1). */
  private def lpCtes(rounds: Int = LpIters): String = {
    def iter(k: Int): String =
      s"""l$k AS MATERIALIZED (
         |  SELECT l.node,
         |    least(l.label, coalesce(m.nbr_min, l.label)) AS label
         |  FROM l${k - 1} l LEFT JOIN (
         |    SELECT sym.u AS node, min(p.label) AS nbr_min
         |    FROM sym JOIN l${k - 1} p ON p.node = sym.v
         |    GROUP BY sym.u) m USING (node))""".stripMargin
    s"""WITH e AS ($EdgesSql),
       |sym AS (SELECT src AS u, dst AS v FROM e
       |        UNION SELECT dst, src FROM e),
       |n0 AS (SELECT DISTINCT src AS node FROM e
       |       UNION SELECT DISTINCT dst FROM e),
       |l0 AS (SELECT node, node AS label FROM n0),
       |${(1 to rounds).map(iter).mkString(",\n")}""".stripMargin
  }

  private val lpOracle: String =
    s"${lpCtes()}\nSELECT node, label FROM l$LpIters ORDER BY node"

  /** TRUE-component oracle for [[starContractCC]] (which runs to
    * convergence, unlike the fixed-round [[labelProp]]): the [[lpCtes]]
    * min-label rounds plus two pointer-doubling steps
    * (label ← min(label, label(label))) — coverage radius
    * LpIters·2² = 32 hops, far past the events graph's diameter at any SF
    * (every dst lands in a 150-hub space). A diameter beyond 32 fails the
    * driver compare loudly rather than silently blessing a partial label.
    * `label` is always itself a node id, so the doubling join is total. */
  private val starOracle: String =
    s"""${lpCtes()},
       |d1 AS MATERIALIZED (
       |  SELECT l.node, least(l.label, r.label) AS label
       |  FROM l$LpIters l JOIN l$LpIters r ON r.node = l.label),
       |d2 AS (SELECT l.node, least(l.label, r.label) AS label
       |       FROM d1 l JOIN d1 r ON r.node = l.label)
       |SELECT node, label FROM d2 ORDER BY node""".stripMargin

  /** Modularity is scored on the EARLY (2-round) label-prop partition:
    * full propagation on this connected graph collapses to one community
    * (Q trivially ~0), while the 2-hop-minimum partition gives the
    * non-degenerate community structure the metric is for. */
  private val ModularityRounds = 2

  private val modularityOracle: String =
    s"""${lpCtes(ModularityRounds)},
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |        FROM e),
       |mm AS (SELECT count(*) AS m FROM und),
       |lab AS (SELECT node, label FROM l$ModularityRounds),
       |wl AS (SELECT la.label AS la, lb.label AS lb
       |       FROM und u JOIN lab la ON la.node = u.a
       |                  JOIN lab lb ON lb.node = u.b),
       |intra AS (SELECT la AS label, count(*) AS intra_edges
       |          FROM wl WHERE la = lb GROUP BY 1),
       |degl AS (SELECT lab.label, count(*) AS total_deg
       |         FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und) x
       |         JOIN lab ON lab.node = x.node GROUP BY 1),
       |sizes AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1),
       |per AS (SELECT s.label, CAST(s.n_nodes AS BIGINT) AS n_nodes,
       |    CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
       |    CAST(coalesce(d.total_deg, 0) AS BIGINT) AS total_deg
       |  FROM sizes s LEFT JOIN degl d USING (label)
       |               LEFT JOIN intra i USING (label)),
       |tot AS (SELECT CAST(-1 AS BIGINT) AS label, CAST(0 AS BIGINT) AS n_nodes,
       |    CAST(sum(4 * mm.m * intra_edges - total_deg * total_deg) AS BIGINT)
       |      AS intra_edges,
       |    CAST(4 * mm.m * mm.m AS BIGINT) AS total_deg
       |  FROM per, mm GROUP BY mm.m)
       |SELECT label, n_nodes, intra_edges, total_deg FROM per
       |UNION ALL SELECT * FROM tot ORDER BY label""".stripMargin

  private val pprOracle: String = {
    val base = s"CASE WHEN n0.node % 10 = 0 THEN " +
      s"(15 * ${Scale}::BIGINT // 100) // (SELECT count(*) FROM n0 WHERE node % 10 = 0) ELSE 0 END"
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT n0.node,
         |    $base + (85 * coalesce(s.c, 0)) // 100 AS rank_e12
         |  FROM n0 LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank_e12 // d.out_deg) AS BIGINT) AS c
         |    FROM e JOIN r${k - 1} r ON r.node = e.src
         |           JOIN od d ON d.node = e.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    s"""WITH e AS ($EdgesSql),
       |n0 AS (SELECT DISTINCT src AS node FROM e
       |       UNION SELECT DISTINCT dst FROM e),
       |od AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
       |r0 AS (SELECT node,
       |    CASE WHEN node % 10 = 0 THEN ${Scale}::BIGINT
       |      // (SELECT count(*) FROM n0 WHERE node % 10 = 0) ELSE 0 END AS rank_e12
       |  FROM n0),
       |${(1 to PrIters).map(iter).mkString(",\n")}
       |SELECT node, rank_e12 FROM r$PrIters ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "graph_ppr" -> pprOracle,
    "graph_degree" ->
      s"""WITH e AS ($EdgesSql),
         |d AS (
         |  SELECT node, CAST(sum(o) AS BIGINT) AS out_deg,
         |         CAST(sum(i) AS BIGINT) AS in_deg
         |  FROM (SELECT src AS node, 1 AS o, 0 AS i FROM e
         |        UNION ALL SELECT dst, 0, 1 FROM e)
         |  GROUP BY node)
         |SELECT node, out_deg, in_deg, out_deg + in_deg AS total_deg
         |FROM d ORDER BY node""".stripMargin,

    "graph_pagerank" -> prOracle,

    "graph_kcore" -> {
      // AS MATERIALIZED is load-bearing: each round references the prior
      // round TWICE, so inlined CTEs would replay the whole chain per
      // reference — the SQL form of the loop-lineage blowup the Spark side
      // cuts with per-round localCheckpoint
      def round(i: Int): String =
        s"""a$i AS MATERIALIZED (
           |  SELECT u FROM (SELECT u, count(*) AS c FROM e${i - 1} GROUP BY u)
           |  WHERE c >= 3),
           |e$i AS MATERIALIZED (
           |  SELECT e.u, e.v FROM e${i - 1} e
           |  JOIN a$i x ON e.u = x.u JOIN a$i y ON e.v = y.u)""".stripMargin
      s"""WITH raw AS ($EdgesSql),
         |e0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM raw
         |       UNION SELECT dst, src FROM raw),
         |${(1 to KcoreIters).map(round).mkString(",\n")}
         |SELECT u AS node, count(*) AS core_deg
         |FROM e$KcoreIters GROUP BY u ORDER BY node""".stripMargin
    },

    "graph_common_neighbors" ->
      s"""WITH e AS ($EdgesSql),
         |sym AS (SELECT src AS n, dst AS nbr FROM e
         |        UNION SELECT dst, src FROM e),
         |deg AS (SELECT n, count(*) AS deg FROM sym GROUP BY n),
         |pairs AS (
         |  SELECT s1.n AS a, s2.n AS c, count(*) AS common
         |  FROM sym s1 JOIN sym s2 ON s1.nbr = s2.nbr AND s1.n < s2.n
         |  GROUP BY 1, 2)
         |SELECT a, c, common,
         |  10000 * common // (da.deg + dc.deg - common) AS jaccard_x10000
         |FROM pairs JOIN deg da ON da.n = a JOIN deg dc ON dc.n = c
         |ORDER BY a, c""".stripMargin,

    // same cap, same total order — the oracle replays the row_number cut
    "graph_common_neighbors_capped" ->
      s"""WITH e AS ($EdgesSql),
         |sym AS (SELECT src AS n, dst AS nbr FROM e
         |        UNION SELECT dst, src FROM e),
         |deg AS (SELECT n, count(*) AS deg FROM sym GROUP BY n),
         |ranked AS (
         |  SELECT s.n, s.nbr,
         |    row_number() OVER (PARTITION BY s.nbr ORDER BY d.deg, s.n) AS rn
         |  FROM sym s JOIN deg d ON d.n = s.n),
         |adj AS (SELECT n, nbr FROM ranked WHERE rn <= 64),
         |pairs AS (
         |  SELECT s1.n AS a, s2.n AS c, count(*) AS common
         |  FROM adj s1 JOIN adj s2 ON s1.nbr = s2.nbr AND s1.n < s2.n
         |  GROUP BY 1, 2)
         |SELECT a, c, common,
         |  10000 * common // (da.deg + dc.deg - common) AS jaccard_x10000
         |FROM pairs JOIN deg da ON da.n = a JOIN deg dc ON dc.n = c
         |ORDER BY a, c""".stripMargin,

    "graph_degree_hist" ->
      s"""WITH e AS ($EdgesSql),
         |d AS (
         |  SELECT node, CAST(sum(o) + sum(i) AS BIGINT) AS total_deg
         |  FROM (SELECT src AS node, 1 AS o, 0 AS i FROM e
         |        UNION ALL SELECT dst, 0, 1 FROM e)
         |  GROUP BY node)
         |SELECT CAST(length(bin(total_deg)) - 1 AS BIGINT) AS bucket_ilog2,
         |  count(*) AS n_nodes
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_local_clustering" ->
      s"""WITH e AS ($EdgesSql),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM e),
         |deg AS (SELECT node, count(*) AS deg
         |        FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
         |        GROUP BY node),
         |o AS (
         |  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND und.a < und.b)
         |              THEN und.a ELSE und.b END AS u,
         |         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND und.a < und.b)
         |              THEN und.b ELSE und.a END AS v
         |  FROM und JOIN deg da ON da.node = und.a
         |           JOIN deg db ON db.node = und.b),
         |tri AS (
         |  SELECT o1.u AS u, o1.v AS v1, o2.v AS v2
         |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v
         |    JOIN und ON und.a = least(o1.v, o2.v) AND und.b = greatest(o1.v, o2.v)),
         |pn AS (
         |  SELECT node, count(*) AS n_triangles FROM (
         |    SELECT u AS node FROM tri
         |    UNION ALL SELECT v1 FROM tri
         |    UNION ALL SELECT v2 FROM tri) GROUP BY node)
         |SELECT deg.node, deg.deg, coalesce(pn.n_triangles, 0) AS n_triangles,
         |  CASE WHEN deg.deg < 2 THEN 0
         |       ELSE 2 * coalesce(pn.n_triangles, 0) * 1000000
         |            // (deg.deg * (deg.deg - 1)) END AS local_cc_ppm
         |FROM deg LEFT JOIN pn USING (node) ORDER BY deg.node""".stripMargin,

    "graph_triangles" ->
      s"""WITH e AS ($EdgesSql),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM e),
         |deg AS (SELECT node, count(*) AS deg
         |        FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
         |        GROUP BY node),
         |o AS (
         |  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND und.a < und.b)
         |              THEN und.a ELSE und.b END AS u,
         |         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND und.a < und.b)
         |              THEN und.b ELSE und.a END AS v
         |  FROM und JOIN deg da ON da.node = und.a
         |           JOIN deg db ON db.node = und.b),
         |tri AS (
         |  SELECT count(*) AS n_triangles
         |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v
         |    JOIN und ON und.a = least(o1.v, o2.v) AND und.b = greatest(o1.v, o2.v)),
         |w AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
         |SELECT n_triangles, n_wedges,
         |  CASE WHEN n_wedges = 0 THEN 0
         |       ELSE 3 * n_triangles * 1000000 // n_wedges END AS clustering_ppm
         |FROM tri, w""".stripMargin,

    "graph_two_hop" ->
      s"""WITH e AS ($EdgesSql),
         |h2 AS (
         |  SELECT DISTINCT e1.src, e2.dst AS dst2
         |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
         |  WHERE e2.dst <> e1.src)
         |SELECT h2.src, count(*) AS n_two_hop
         |FROM h2 LEFT JOIN e ON e.src = h2.src AND e.dst = h2.dst2
         |WHERE e.src IS NULL
         |GROUP BY h2.src ORDER BY h2.src""".stripMargin,

    "graph_cc_labelprop" -> lpOracle,
    "graph_cc_starcontract" -> starOracle,
    "graph_modularity" -> modularityOracle,
    "graph_bfs_layers" -> bfsOracle,
    "graph_resource_alloc" ->
      s"""WITH e AS ($EdgesSql),
         |sym AS (SELECT src AS n, dst AS nbr FROM e
         |        UNION SELECT dst, src FROM e),
         |deg AS (SELECT n, count(*) AS deg FROM sym GROUP BY n)
         |SELECT s1.n AS a, s2.n AS c, count(*) AS common,
         |  CAST(sum($Scale // dw.deg) AS BIGINT) AS ra_score_e12
         |FROM sym s1 JOIN sym s2 ON s1.nbr = s2.nbr AND s1.n < s2.n
         |     JOIN deg dw ON dw.n = s1.nbr
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same wedge-cap discipline as graph_common_neighbors_capped, with the
    // resource-allocation score over the CAPPED shared-neighbor adjacency
    "graph_resource_alloc_capped" ->
      s"""WITH e AS ($EdgesSql),
         |sym AS (SELECT src AS n, dst AS nbr FROM e
         |        UNION SELECT dst, src FROM e),
         |deg AS (SELECT n, count(*) AS deg FROM sym GROUP BY n),
         |ranked AS (
         |  SELECT s.n, s.nbr,
         |    row_number() OVER (PARTITION BY s.nbr ORDER BY d.deg, s.n) AS rn
         |  FROM sym s JOIN deg d ON d.n = s.n),
         |adj AS (SELECT n, nbr FROM ranked WHERE rn <= 64)
         |SELECT s1.n AS a, s2.n AS c, count(*) AS common,
         |  CAST(sum($Scale // dw.deg) AS BIGINT) AS ra_score_e12
         |FROM adj s1 JOIN adj s2 ON s1.nbr = s2.nbr AND s1.n < s2.n
         |     JOIN deg dw ON dw.n = s1.nbr
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** BFS oracle: the min-plus rounds unrolled as MATERIALIZED full-join
    * CTEs (each round references the prior table twice — the same
    * inline-replay hazard as the kcore oracle). */
  private lazy val bfsOracle: String = {
    def round(k: Int): String =
      s"""d$k AS MATERIALIZED (
         |  SELECT coalesce(d.node, m.node) AS node,
         |    CASE WHEN d.dist IS NULL THEN m.nd
         |         WHEN m.nd IS NULL THEN d.dist
         |         ELSE least(d.dist, m.nd) END AS dist
         |  FROM d${k - 1} d FULL JOIN (
         |    SELECT sym.u AS node, min(p.dist + 1) AS nd
         |    FROM sym JOIN d${k - 1} p ON p.node = sym.v
         |    GROUP BY sym.u) m ON m.node = d.node)""".stripMargin
    s"""WITH e AS ($EdgesSql),
       |sym AS (SELECT src AS u, dst AS v FROM e
       |        UNION SELECT dst, src FROM e),
       |n0 AS (SELECT DISTINCT src AS node FROM e
       |       UNION SELECT DISTINCT dst FROM e),
       |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM n0 WHERE node % 10 = 0),
       |${(1 to BfsIters).map(round).mkString(",\n")}
       |SELECT node, dist FROM d$BfsIters ORDER BY node""".stripMargin
  }
}
