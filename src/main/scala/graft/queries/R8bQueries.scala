package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Round-8 second wave: time-series self-correlation, interval coverage
  * (the union-length sweep, banded per entity), and degree-mixing
  * assortativity — each an integer-moments exhibit of the repo's
  * float-determinism rule (exact BIGINT sums through every shuffle, ONE
  * pinned IEEE expression at the end shared verbatim with the oracle).
  */
object R8bQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  private val SessUs = 1800000000L // 30-min interval per event
  private val DayUs = 86400000000L

  // ------------------------------------------------------- autocorrelation

  /** Lag-k autocorrelation (k = 1, 7) of the daily event-count series —
    * the periodicity probe behind ingest-seasonality detection. The series
    * itself is one map-side-combined agg onto the |days| axis (bounded);
    * each lag is an equi-join of the series against itself shifted
    * (day-keyed, |days| rows — trivially broadcastable), and the Pearson r
    * over (c_t, c_{t+k}) pairs runs through exact BIGINT moment sums
    * (daily counts < 2²⁰, days < 2⁷ → every product < 2⁵³, so the final
    * pinned expression's operands are exactly-representable doubles). */
  private val qAutocorr: Q = (s, dir) => {
    val daily = eventsTs(s, dir)
      .groupBy(expr(s"ts_us div ${DayUs}L").as("day"))
      .agg(count(lit(1)).as("c"))
    def lagCorr(lag: Int): DataFrame =
      daily
        .join(
          daily.select((col("day") - lag).as("day"), col("c").as("c2")),
          "day")
        .agg(count(lit(1)).as("n_pairs"),
          sum("c").as("sx"), sum("c2").as("sy"),
          sum(col("c") * col("c")).as("sxx"),
          sum(col("c2") * col("c2")).as("syy"),
          sum(col("c") * col("c2")).as("sxy"))
        .select(lit(lag.toLong).as("lag"), col("n_pairs"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("denx"),
          (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("deny"))
        .select(col("lag"), col("n_pairs"),
          when(col("denx") === 0 || col("deny") === 0, lit(0.0))
            .otherwise(col("num").cast("double") /
              (sqrt(col("denx").cast("double")) *
                sqrt(col("deny").cast("double"))))
            .as("acf"))
    lagCorr(1).unionAll(lagCorr(7)).orderBy("lag")
  }

  // ------------------------------------------------------ interval union

  /** Per-user total covered time under 30-min activity intervals — the
    * interval-UNION length (overlaps counted once), the billing/uptime twin
    * of q_max_concurrency's sweep. No global sort: the running
    * max-end window is PARTITIONED BY USER (each user's history is one
    * independent task), and the increment
    * `greatest(0, e − greatest(s, max_prev_end))` telescopes to exactly the
    * measure of ∪[s,e) per user. Events share a fixed interval length, so
    * order ties (equal s ⇒ equal e) contribute 0 either way — the window
    * order is total for every row that matters. All-integer µs arithmetic;
    * the only output transform is a truncating div to minutes. */
  private val qIntervalUnion: Q = (s, dir) => {
    val iv = eventsTs(s, dir)
      .select(col("user_id"), col("ts_us").as("st"),
        (col("ts_us") + SessUs).as("en"))
    val w = Window.partitionBy("user_id").orderBy("st", "en")
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("pmax", max("en").over(w))
      .withColumn("inc",
        greatest(lit(0L),
          col("en") - greatest(col("st"), coalesce(col("pmax"), col("st")))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"), sum("inc").as("covered_us"))
      .withColumn("covered_min", expr("covered_us div 60000000L"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------- assortativity

  /** Degree-mixing (assortativity) coefficient: Pearson r of
    * (deg(src), deg(dst)) over the directed edge set — positive means hubs
    * link hubs (social graphs), negative means hubs link leaves (web/biology).
    * Degree table = one node-keyed agg; the two endpoint joins are
    * node-keyed against a |V|-row table (AQE broadcasts at bench scale,
    * SMJ at 100 TB — both correct); moments are exact BIGINTs (deg ≤ |V|
    * < 2¹⁶, |E| < 2³² → products < 2⁵³). One row out. */
  private val qAssortativity: Q = (s, dir) => {
    val ed = GraphQueries.edges(s, dir)
    val deg = GraphQueries.degrees(ed).select(col("node"), col("total_deg"))
    ed.join(deg.withColumnRenamed("node", "src")
          .withColumnRenamed("total_deg", "dx"), "src")
      .join(deg.withColumnRenamed("node", "dst")
          .withColumnRenamed("total_deg", "dy"), "dst")
      .agg(count(lit(1)).as("n_edges"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n_edges"),
        (col("n_edges") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_edges") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n_edges") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n_edges"),
        when(col("denx") === 0 || col("deny") === 0, lit(0.0))
          .otherwise(col("num").cast("double") /
            (sqrt(col("denx").cast("double")) *
              sqrt(col("deny").cast("double"))))
          .as("assortativity"))
  }

  // ------------------------------------------------------- zipf slope

  /** Zipf-law fit over the top-1000 vocabulary: regression slope of
    * ilog2(count) on ilog2(rank) — the rank-frequency power-law check a
    * corpus-health dashboard runs (natural text sits near −1; template
    * spam flattens it). Token counts are one map-side-combined agg; the
    * top-1000 cut is a TakeOrdered over the (count DESC, token ASC) total
    * order; the rank window then runs over the BOUNDED 1000-row set (the
    * one place an unpartitioned window is safe — its input is a constant
    * few KB however big the corpus). Integer log₂ bits both sides (the
    * repo's ilog2-via-bin-length idiom), exact BIGINT moments, pinned
    * final slope/r. */
  private val qZipf: Q = (s, dir) => {
    val counts = documents(s, dir)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(desc("cnt"), asc("tok")).limit(1000)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(desc("cnt"), asc("tok"))))
    ranked
      .select((length(bin(col("rank"))) - 1).cast("long").as("xb"),
        (length(bin(col("cnt"))) - 1).cast("long").as("yb"))
      .agg(count(lit(1)).as("n_top"),
        sum("xb").as("sx"), sum("yb").as("sy"),
        sum(col("xb") * col("xb")).as("sxx"),
        sum(col("yb") * col("yb")).as("syy"),
        sum(col("xb") * col("yb")).as("sxy"))
      .select(col("n_top"),
        (col("n_top") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_top") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n_top") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n_top"),
        when(col("denx") === 0, lit(0.0))
          .otherwise(col("num").cast("double") / col("denx").cast("double"))
          .as("zipf_slope"),
        when(col("denx") === 0 || col("deny") === 0, lit(0.0))
          .otherwise(col("num").cast("double") /
            (sqrt(col("denx").cast("double")) *
              sqrt(col("deny").cast("double"))))
          .as("corr_r"))
  }

  // ----------------------------------------------------------- KMV sketch

  private val KmvK = 64
  private val Pow52 = 4503599627370496L // 2^52

  /** KMV (k-minimum-values) distinct sketch per source, PLUS an exact
    * merge proof. The sketch is the k smallest distinct 52-bit hashes of
    * the 3-gram shingle universe (52 bits so every hash is an exactly-
    * representable double); estimate = (k−1)·2⁵² / h₍ₖ₎ — one pinned
    * division. Unlike HLL's lossy registers, KMV's merge is EXACT set
    * algebra: the union of per-source k-min sets trimmed back to k IS the
    * global k-min set (any globally-k-smallest hash is k-smallest in its
    * own source), so the `__merged__` row — built only from the ≤
    * |sources|·k pooled sketch entries — must equal the oracle's direct
    * global computation bit for bit. That is the property that lets 1000
    * executors sketch independently and a coordinator combine receipts
    * without rescanning.
    *
    * Scale shape: one distinct on (source, h) — high-cardinality,
    * map-side-combined — then the BOUNDED topk_pairs aggregate (each
    * partition emits ≤ k entries per source); the merge pool is
    * |sources|·k rows. Sources with < k hashes surface a NULL estimate in
    * both engines. `exact_distinct` counts distinct hashes (collisions at
    * |universe|²·2⁻⁵³ accepted, identically on both sides). */
  /** Distinct (source, 52-bit hash) set — the shared input of [[qKmv]]. */
  private[graft] def kmvHashed(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.TextAnalysis
    graft.functions.GraftFunctions.ensureRegistered(s)
    documents(s, dir)
      .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("source"), explode(TextAnalysis.shingles(col("toks"))).as("shingle"))
      .select(col("source"),
        graft.functions.GraftFunctions.md5PrefixLong(col("shingle"), 1, 13).as("h"))
      .distinct()
  }

  /** KMV pipeline over a (possibly cached) hash set — separated from the
    * persist lifecycle so specs can pin the REAL plan. */
  private[graft] def kmvResult(hashed: DataFrame): DataFrame = {
    val per = hashed.groupBy("source")
      .agg(count(lit(1)).as("exact_distinct"),
        expr(s"topk_pairs(h, cast(h as double), $KmvK, true)").as("arr"))
    // try_element_at, not element_at: Spark 4 runs ANSI-on by default and a
    // source with < k hashes must surface a NULL kth (matching the oracle's
    // LEFT JOIN), not throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    val perRows = per.select(col("source").as("scope"), col("exact_distinct"),
      try_element_at(col("arr"), lit(KmvK)).getField("n_id").as("kth_hash"))
    // merged sketch: pool the per-source entries (≤ |sources|·k rows),
    // dedup (one shingle in two sources hashes identically), re-trim to k
    val pool = per.select(explode(col("arr")).as("p"))
      .select(col("p.n_id").as("h")).distinct()
    val mergedKth = pool
      .agg(expr(s"topk_pairs(h, cast(h as double), $KmvK, true)").as("arr"))
      .select(try_element_at(col("arr"), lit(KmvK)).getField("n_id").as("kth_hash"))
    val globalExact = hashed.select("h").distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    val mergedRow = mergedKth.crossJoin(globalExact)
      .select(lit("__merged__").as("scope"), col("exact_distinct"),
        col("kth_hash"))
    perRows.unionAll(mergedRow)
      .withColumn("kmv_est",
        lit((KmvK - 1).toDouble) * lit(Pow52.toDouble) /
          col("kth_hash").cast("double"))
      .withColumn("err_x10000",
        floor(lit(10000.0) * abs(col("kmv_est") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).cast("long"))
      .orderBy("scope")
  }

  private val qKmv: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    // distinct (source, h) feeds the per-source sketch AND the global
    // exact baseline — persist so the corpus is tokenized+hashed once
    val hashed = kmvHashed(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try kmvResult(hashed).transform(graft.config.Lineage.cut)
    finally hashed.unpersist()
  }

  // ----------------------------------------------------- HLL union merge

  /** Per-source HLL sketches PLUS the register-merge proof — the lossy-
    * sketch counterpart of [[qKmv]]'s exact KMV merge. Each source keeps
    * m=64 registers (max leading-zero rank per bucket, the
    * text_hll_distinct construction); the `__merged__` row is built ONLY
    * from the per-source register table by bucket-wise max — and because
    * max is associative/commutative, that IS the register table a direct
    * global pass would build, so the merged estimate must match the
    * oracle's direct global computation bit for bit. This is how 1000
    * executors (or 1000 daily epochs) each keep 64 integers and the
    * coordinator still answers "distinct shingles overall" without a
    * rescan. All register arithmetic is integer; the single α·m²·2⁵⁰/S
    * division is the pinned shared expression. */
  private val qHllUnion: Q = (s, dir) => {
    import graft.ext.TextAnalysis
    graft.functions.GraftFunctions.ensureRegistered(s)
    val m = 64
    // distinct (source, shingle) feeds FOUR consumers (registers, the
    // merged registers, per-source exact, global exact) — persist so the
    // corpus is tokenized once (registers are duplicate-insensitive, so
    // pre-distincting changes nothing)
    val ss = documents(s, dir)
      .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("source"), explode(TextAnalysis.shingles(col("toks"))).as("shingle"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val h = graft.functions.GraftFunctions.md5PrefixLong(col("shingle"), 1, 15)
      val hashed = ss.select(col("source"), (h % m).as("bucket"),
        (h / m).cast("long").as("rest"))
      val rank = least(lit(50), lit(55) -
        when(col("rest") === 0, lit(0)).otherwise(length(bin(col("rest")))))
      val regs = hashed.select(col("source"), col("bucket"), rank.as("rank"))
        .groupBy("source", "bucket").agg(max("rank").as("reg"))
      def estimate(regTable: DataFrame, grp: Seq[String]): DataFrame = {
        val sums =
          (if (grp.isEmpty) regTable.groupBy() else regTable.groupBy(grp.head))
            .agg(sum(expr("shiftleft(1L, cast(50 - reg as int))")).as("s_present"),
              count(lit(1)).as("nb"))
        sums.select(
          (if (grp.isEmpty) lit("__merged__") else col(grp.head)).as("scope"),
          ((col("s_present") +
            (lit(m.toLong) - col("nb")) * lit(1L << 50))).as("s"))
      }
      val perSrc = estimate(regs, Seq("source"))
      // merge = bucket-wise max over the per-source registers ONLY
      val merged = estimate(
        regs.groupBy("bucket").agg(max("reg").as("reg")), Seq.empty)
      val exactSrc = ss
        .groupBy("source").agg(count(lit(1)).as("exact_distinct"))
        .withColumnRenamed("source", "scope")
      val exactAll = ss.select("shingle").distinct()
        .agg(count(lit(1)).as("exact_distinct"))
        .select(lit("__merged__").as("scope"), col("exact_distinct"))
      perSrc.unionAll(merged)
        .join(exactSrc.unionAll(exactAll), "scope")
        .select(col("scope"), lit(m.toLong).as("m"), col("exact_distinct"),
          (lit(0.709) * lit((m.toLong * m).toDouble) * lit((1L << 50).toDouble) /
            col("s").cast("double")).as("hll_est"))
        .orderBy("scope")
        .transform(graft.config.Lineage.cut)
    } finally ss.unpersist()
  }

  // ------------------------------------------------ perplexity filter

  /** LM-based quality gate (the CCNet middle-perplexity band): score every
    * document with the corpus-trained bigram-LM surprisal
    * (integer-bits, [[TextAnalysis.bigramLmScore]]) and keep the middle
    * band [med/2, 1.5·med] — too predictable is boilerplate, too
    * surprising is gibberish. The threshold is distribution-adaptive: the
    * exact median of the integer scores (dyadic ⇒ 2·median is an exact
    * integer in both engines), and the band is ±1% of the median in pure
    * integer algebra — |2·score − 2·med| vs (2·med) div 50 — sized to the
    * synthetic corpus's tight surprisal spread (±2% std) so both drop
    * buckets are actually exercised. One bounded 1-row agg broadcast
    * back; the scored corpus is never re-shuffled for its own filter. */
  private val qPerplexityFilter: Q = (s, dir) => {
    val scored = graft.ext.TextAnalysis.bigramLmScore(documents(s, dir))
      .select(col("doc_id"), col("surprisal_x100"))
    val med2 = scored.agg(
      expr("CAST(2 * percentile(surprisal_x100, 0.5D) AS BIGINT)").as("med2"))
    scored.crossJoin(broadcast(med2))
      .select(col("doc_id"), col("surprisal_x100"),
        when(col("surprisal_x100") * 2 < col("med2") - expr("med2 div 50"),
          lit("drop_low"))
          .when(col("surprisal_x100") * 2 > col("med2") + expr("med2 div 50"),
            lit("drop_high"))
          .otherwise(lit("keep")).as("verdict"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ weighted median

  /** Quantity-weighted median price (cents) per returnflag: the smallest
    * price whose cumulative weight reaches half the group total. The raw
    * stream first collapses to (flag, cents) — a map-side-combined
    * high-cardinality agg — so the running-sum window scans the
    * DOMAIN-bounded aggregated rows (distinct cent values per flag), not
    * the corpus; same boundedness argument as corpus_select_budget's
    * banded cumsum. All comparisons integer (2·cum vs tot). */
  private val qWeightedMedian: Q = (s, dir) => {
    val g = lineitem(s, dir)
      .select(col("l_returnflag").as("f"),
        expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)").as("cents"),
        expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)").as("w"))
      .groupBy("f", "cents").agg(sum("w").as("w"))
    val wRun = Window.partitionBy("f").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("f")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum", sum("w").over(wRun))
      .withColumn("tot", sum("w").over(wTot))
      .groupBy(col("f").as("l_returnflag"))
      .agg(max("tot").as("total_weight"),
        min(when(col("cum") * 2 >= col("tot"), col("cents")))
          .as("w_median_cents"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------- source overlap

  /** Pairwise source-overlap matrix: distinct-shingle Jaccard between
    * every source pair — the cross-domain contamination/diversity
    * diagnostic (two "different" crawl slices sharing half their shingles
    * are one slice). The self-join keys on the SHINGLE (high-cardinality;
    * per-shingle fan-out bounded by |sources|² = 400), the pair agg is
    * |sources|²-bounded, and sizes broadcast back. Integer ppm.
    *
    * The distinct (source, shingle) set feeds THREE consumers (both join
    * sides + sizes) whose differing column pruning defeats ReuseExchange
    * (the dedup_span_exact lesson), so it persists MEMORY_AND_DISK — one
    * corpus tokenize+shingle pass instead of three. */
  /** Distinct (source, shingle) set — the shared input of [[qSourceOverlap]]. */
  private[graft] def sourceShingles(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.TextAnalysis
    documents(s, dir)
      .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("source"), explode(TextAnalysis.shingles(col("toks"))).as("shingle"))
      .distinct()
  }

  /** Overlap pipeline over a (possibly cached) distinct shingle set —
    * separated from the persist lifecycle so specs can pin the REAL plan
    * (after localCheckpoint the executed plan is just an RDD scan). */
  private[graft] def sourceOverlapResult(ss: DataFrame): DataFrame = {
    val sizes = ss.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = ss.select(col("source").as("s1"), col("shingle"))
      .join(ss.select(col("source").as("s2"), col("shingle")), "shingle")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("sz").as("n1"))), "s1")
      .join(broadcast(sizes.select(col("source").as("s2"), col("sz").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("n_common"), col("n1"), col("n2"),
        expr("n_common * 1000000 div (n1 + n2 - n_common)").as("jaccard_ppm"))
      .orderBy("s1", "s2")
  }

  private val qSourceOverlap: Q = (s, dir) => {
    val ss = sourceShingles(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager |sources|²-row result, lineage cut → the cache drops here
    try sourceOverlapResult(ss).transform(graft.config.Lineage.cut)
    finally ss.unpersist()
  }

  // -------------------------------------------------------- chi-square

  /** Chi-square independence statistic for event_type × day-of-week — the
    * seasonality/independence test over the contingency table. Observed,
    * row, column and grand totals are exact BIGINTs (three
    * map-side-combined aggs over the same pass); each cell's
    * (o − rc/n)²/(rc/n) term is ONE pinned double expression from exact
    * integers, and the cross-cell sum — the one place float ADDITION
    * ORDER could diverge — runs as a fold over the (etype, dow)-sorted
    * 35-element array (the q_ewma pinned-fold rule), identical in both
    * engines. Output: n, df, chi2. */
  private val qChiSquare: Q = (s, dir) => {
    val base = eventsTs(s, dir)
      .select(col("event_type").as("et"),
        expr(s"(ts_us div ${DayUs}L) % 7").as("dow"))
    val obs = base.groupBy("et", "dow").agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("et").agg(sum("o").as("r"))
    val ct = obs.groupBy("dow").agg(sum("o").as("c"))
    val n = obs.agg(sum("o").as("n"))
    val cells = obs.join(broadcast(rt), "et").join(broadcast(ct), "dow")
      .crossJoin(broadcast(n))
      .select(col("et"), col("dow"), col("n"),
        ((col("o").cast("double") -
          (col("r") * col("c")).cast("double") / col("n").cast("double")) *
          (col("o").cast("double") -
            (col("r") * col("c")).cast("double") / col("n").cast("double")) /
          ((col("r") * col("c")).cast("double") / col("n").cast("double")))
          .as("term"))
    val nRt = rt.agg(count(lit(1)).as("nr"))
    val nCt = ct.agg(count(lit(1)).as("nc"))
    cells
      .agg(max("n").as("n"),
        collect_list(struct(col("et"), col("dow"), col("term"))).as("cs"))
      .crossJoin(broadcast(nRt)).crossJoin(broadcast(nCt))
      .select(col("n"), ((col("nr") - 1) * (col("nc") - 1)).as("df"),
        expr("aggregate(array_sort(cs), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)")
          .as("chi2"))
  }

  // ------------------------------------------------------ robust z-score

  /** Median/MAD outlier detection per event_type — the robust twin of
    * q_anomaly_zscore (mean/σ breaks down when the outliers ARE the
    * contamination). Entirely integer: values integerize to cents, the
    * median doubles to the exact integer 2·med (dyadic percentile), the
    * deviation axis stays doubled (dev2 = |2x − m2|), and the MAD doubles
    * again (mad4 = 2·median(dev2)); the 3σ-equivalent cut
    * |x−med| > 3·1.4826·MAD becomes dev2·20000 > 44478·mad4 — pure BIGINT
    * comparison, no float anywhere. Two bounded percentile aggs (per-group
    * value multisets, the q_percentile_cont cost class) + one broadcast-
    * back; the event stream is never re-shuffled. */
  private val qRobustZscore: Q = (s, dir) => {
    val v = eventsTs(s, dir).select(col("event_type"),
      expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("cents"))
    val med = v.groupBy("event_type")
      .agg(expr("CAST(2 * percentile(cents, 0.5D) AS BIGINT)").as("m2"))
    val dev = v.join(broadcast(med), "event_type")
      .select(col("event_type"), col("cents"),
        abs(col("cents") * 2 - col("m2")).as("dev2"), col("m2"))
    val mad = dev.groupBy("event_type")
      .agg(expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("m2").as("median_x2"),
        max("mad4").as("mad_x4"),
        sum(when(col("dev2") * 20000 > lit(44478L) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------- Benford digits

  /** First-significant-digit profile of the value column vs Benford's
    * expectation — the classic fabricated-data screen. The digit comes
    * from the INTEGER cents rendering (integer→string is engine-identical;
    * a double's string form is not), counts are one bounded agg onto ≤9
    * cells, and the observed share is integer ppm. benford_ppm is the
    * rounded closed-form log10(1+1/d) table as a literal CASE — no float
    * logs at query time. */
  private val qBenford: Q = (s, dir) => {
    val benford = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val digitExpr = expr(
      "CAST(substring(CAST(CAST(floor(value * 100D + 0.5D) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
    val d = eventsTs(s, dir)
      .filter(col("value") > 0.005)
      .select(digitExpr.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = d.agg(sum("n").as("tot"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div tot").as("observed_ppm"),
        benford.foldLeft(lit(0L)) { case (acc, (k, v)) =>
          when(col("digit") === k, lit(v)).otherwise(acc)
        }.as("benford_ppm"))
      .orderBy("digit")
  }

  // ------------------------------------------------------ SQL text API

  /** TPC-H Q6 (forecast revenue change) through the spark.sql TEXT entry
    * point — the API-surface proof that a SQL-string user needs nothing
    * beyond a registered view. Revenue is exact: cents × discount-percent
    * products summed as BIGINT (every factor integerized by the shared
    * floor(x+0.5) rule), surfaced as revenue_x10000. The plan is the
    * classic scan→filter→partial/final agg with predicate pushdown. */
  private val qSqlQ6: Q = (s, dir) => {
    lineitem(s, dir).createOrReplaceTempView("graft_lineitem_q6")
    s.sql(
      """SELECT CAST(sum(CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)
        |                * CAST(floor(l_discount * 100D + 0.5D) AS BIGINT))
        |       AS BIGINT) AS revenue_x10000,
        |       count(*) AS n_rows
        |FROM graft_lineitem_q6
        |WHERE l_shipdate >= DATE '1994-01-01'
        |  AND l_shipdate < DATE '1995-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24D""".stripMargin)
  }

  // ------------------------------------------------- NOT IN null traps

  /** NOT IN's three-valued-logic trap as an executable exhibit: the same
    * anti-membership question against a null-free subquery (normal anti
    * join), a null-containing one (NOT IN col, NULL, … is never TRUE — the
    * correct answer is 0 rows, the classic production surprise), and IN
    * over the null-containing set (nulls ignored). Spark plans the
    * null-aware anti join for case two; both engines implement the same
    * SQL-standard semantics, which is exactly what this key pins. Runs
    * through the spark.sql text API (NOT IN is subquery syntax). */
  private val qNotInNull: Q = (s, dir) => {
    customer(s, dir).createOrReplaceTempView("graft_nin_customer")
    orders(s, dir).createOrReplaceTempView("graft_nin_orders")
    s.sql(
      """SELECT
        |  (SELECT count(*) FROM graft_nin_customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM graft_nin_orders
        |                           WHERE o_orderstatus = 'F')) AS n_nullfree,
        |  (SELECT count(*) FROM graft_nin_customer
        |   WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 97 = 0
        |                                       THEN NULL ELSE o_custkey END
        |                           FROM graft_nin_orders
        |                           WHERE o_orderstatus = 'F')) AS n_withnull,
        |  (SELECT count(*) FROM graft_nin_customer
        |   WHERE c_custkey IN (SELECT CASE WHEN o_orderkey % 97 = 0
        |                                   THEN NULL ELSE o_custkey END
        |                       FROM graft_nin_orders
        |                       WHERE o_orderstatus = 'F')) AS n_in_withnull""".stripMargin)
  }

  // ------------------------------------------------------------- CUSUM

  /** CUSUM change-point statistic per event_type over the daily-count
    * series — the drift detector for ingest monitoring. Deviations are
    * scaled by the day count so everything stays integer: S_t =
    * Σ_{i≤t} (D·c_i − T) (T = the type's total, D = its day count), and
    * the detectability statistic is max S − min S. The running sum windows
    * PARTITIONED BY TYPE over the |days|-bounded aggregated series. */
  private val qCusum: Q = (s, dir) => {
    val daily = eventsTs(s, dir)
      .groupBy(col("event_type"), expr(s"ts_us div ${DayUs}L").as("day"))
      .agg(count(lit(1)).as("c"))
    val tot = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val run = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("t_total", sum("c").over(tot))
      .withColumn("n_days", count(lit(1)).over(tot))
      .withColumn("s_t",
        sum(col("c") * col("n_days") - col("t_total")).over(run))
      .groupBy("event_type")
      .agg(max("n_days").as("n_days"), max("t_total").as("total"),
        max("s_t").as("max_cusum"), min("s_t").as("min_cusum"))
      .withColumn("cusum_range", col("max_cusum") - col("min_cusum"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------- reciprocity

  /** Directed-graph reciprocity: the share of edges whose reverse edge
    * also exists (social graphs ≫ web graphs on this measure). ONE
    * composite-key equi-join of the edge set against its own transpose;
    * integer ppm. */
  private val qReciprocity: Q = (s, dir) => {
    val ed = GraphQueries.edges(s, dir)
    val rec = ed.join(
      ed.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    ed.agg(count(lit(1)).as("n_edges"))
      .crossJoin(rec.agg(count(lit(1)).as("n_reciprocal")))
      .select(col("n_edges"), col("n_reciprocal"),
        expr("n_reciprocal * 1000000 div n_edges").as("reciprocity_ppm"))
  }

  // --------------------------------------------------- k-NN classification

  /** k-NN label classification over the embedding table with MEASURED
    * accuracy — the "does my embedding space carry the label" probe every
    * retrieval/curation pipeline runs before trusting cosine distances.
    * Every 5th vector is held out as a test probe; its 5 nearest training
    * neighbors (cosine, the codegen'd dot fold) vote, ties broken toward
    * the SMALLER label via the scalar arg-max key (cnt·1000 − label, the
    * q_mode rule); per-label accuracy in integer ppm. Ranking runs through
    * the bounded topk_pairs aggregate (rankTopK) — no per-probe window. */
  private val qKnnAccuracy: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    val train = e.filter(col("vec_id") % 5 =!= 0)
    val test = e.filter(col("vec_id") % 5 === 0)
    val votes = Similarity.bruteForceTopK(train, test, 5)
      .select("q_id", "n_id")
      .join(train.select(col("vec_id").as("n_id"),
        col("label").cast("long").as("label")), "n_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("cnt"))
      .groupBy("q_id")
      .agg(max_by(col("label"), col("cnt") * 1000 - col("label")).as("pred"))
    votes
      .join(test.select(col("vec_id").as("q_id"),
        col("label").cast("long").as("true_label")), "q_id")
      .groupBy("true_label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n"))
      .orderBy("true_label")
  }

  // ------------------------------------------------------- lateral top-n

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — top-3 orders per
    * customer through the dependent-join SQL surface (Spark decorrelates
    * the limit into a per-customer rank under the hood; the textual API is
    * what this key pins). Deterministic inner order (price DESC, key ASC). */
  private val qLateralTopN: Q = (s, dir) => {
    customer(s, dir).createOrReplaceTempView("graft_lat_customer")
    orders(s, dir).createOrReplaceTempView("graft_lat_orders")
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.price_cents
        |FROM graft_lat_customer c,
        |LATERAL (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT) AS price_cents
        |  FROM graft_lat_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY price_cents DESC, o_orderkey
        |  LIMIT 3) o
        |ORDER BY c_custkey, price_cents DESC, o_orderkey""".stripMargin)
  }

  // ------------------------------------------------------ BPE fertility

  /** Tokenizer fertility per source: BPE pieces per whitespace word under
    * the corpus-trained 64-merge vocabulary (×10000, truncating) — the
    * compression-quality metric tokenizer teams track per domain (a
    * domain whose fertility spikes is being shredded into bytes and will
    * dominate the token budget). Reuses the driver-local trainer + the
    * codegen'd bpe_apply over the DISTINCT-word vocabulary; the token
    * stream only joins on the word key. */
  private val qBpeFertility: Q = (s, dir) => {
    val docs = documents(s, dir)
    val perDoc = graft.ext.BpeTrainer
      .tokenCounts(docs, graft.ext.BpeTrainer.train(docs, merges = 64))
    perDoc.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum("ws_tokens").as("ws_tokens"), sum("bpe_tokens").as("bpe_tokens"))
      .withColumn("fertility_x10000",
        expr("bpe_tokens * 10000 div ws_tokens"))
      .orderBy("source")
  }

  // ------------------------------------------------------ nearest as-of

  /** NEAREST-match as-of join (pandas merge_asof direction='nearest'):
    * each purchase matches its closest click in EITHER direction, ties to
    * the earlier side. Completes the as-of family (backward, forward,
    * tolerance, nearest) in the same single-pass union+window shape — the
    * backward and forward candidates are IGNORE-NULLS window lookups over
    * one user-keyed sort, never a join explosion. */
  private val qAsofNearest: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val clickTs = when(col("event_type") === "click", col("ts_us"))
    val clickId = when(col("event_type") === "click", col("event_id"))
    ev
      .withColumn("prev_ts", last(clickTs, ignoreNulls = true).over(wPrev))
      .withColumn("prev_id", last(clickId, ignoreNulls = true).over(wPrev))
      .withColumn("next_ts", first(clickTs, ignoreNulls = true).over(wNext))
      .withColumn("next_id", first(clickId, ignoreNulls = true).over(wNext))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        when(col("next_ts").isNull ||
          (col("prev_ts").isNotNull &&
            col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us")),
          col("prev_id")).otherwise(col("next_id")).as("nearest_click"),
        when(col("next_ts").isNull ||
          (col("prev_ts").isNotNull &&
            col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us")),
          col("ts_us") - col("prev_ts"))
          .otherwise(col("next_ts") - col("ts_us")).as("gap_us"))
      .orderBy("event_id")
  }

  // ------------------------------------------- theta-sketch intersection

  /** Set-INTERSECTION estimates from per-source KMV sketches (the Theta
    * sketch operation): θ = min of the two sources' k-th minima, the
    * estimate counts sketch entries below θ in BOTH sketches and scales
    * by 2⁵²/θ — computed ONLY from the pooled ≤ k-entry sketch arrays,
    * next to the exact intersection as the measured-error baseline.
    * Together with [[qKmv]]'s exact union merge this completes the sketch
    * set algebra a federated pipeline runs on receipts instead of data:
    * per-node sketches answer both |A∪B| (exactly, for KMV) and |A∩B|
    * (approximately, with measured error) without rescanning either side.
    * A source with fewer than k hashes keeps θ = 2⁵² (its sketch IS its
    * set). Pair fan-out is |sources|² over k-entry arrays — constant. */
  /** Per-source θ-sketch: the ≤ k-entry hash array plus θ_s (= k-th
    * minimum, or 2⁵² for a source whose whole set fits in the sketch) —
    * separated so the sub-k fallback is spec-reachable. */
  private[graft] def thetaPerSource(hashed: DataFrame): DataFrame =
    hashed.groupBy("source")
      .agg(expr(s"topk_pairs(h, cast(h as double), $KmvK, true)").as("arr"))
      .select(col("source"),
        expr("transform(arr, x -> x.n_id)").as("hs"),
        coalesce(try_element_at(col("arr"), lit(KmvK)).getField("n_id"),
          lit(Pow52)).as("theta_s"))

  private val qThetaIntersect: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val hashed = kmvHashed(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val per = thetaPerSource(hashed)
      val pairs = per.select(col("source").as("s1"), col("hs").as("h1"),
          col("theta_s").as("t1"))
        .crossJoin(per.select(col("source").as("s2"), col("hs").as("h2"),
          col("theta_s").as("t2")))
        .filter(col("s1") < col("s2"))
        .select(col("s1"), col("s2"), least(col("t1"), col("t2")).as("theta"),
          expr("size(array_intersect(filter(h1, h -> h < least(t1, t2)), " +
            "filter(h2, h -> h < least(t1, t2))))").cast("long")
            .as("n_below_theta"))
      val exact = hashed.select(col("source").as("s1"), col("h"))
        .join(hashed.select(col("source").as("s2"), col("h")), "h")
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("exact_common"))
      pairs.join(exact, Seq("s1", "s2"), "left")
        .select(col("s1"), col("s2"), col("theta"), col("n_below_theta"),
          (col("n_below_theta").cast("double") * lit(Pow52.toDouble) /
            col("theta").cast("double")).as("theta_est"),
          coalesce(col("exact_common"), lit(0L)).as("exact_common"))
        .orderBy("s1", "s2")
        .transform(graft.config.Lineage.cut)
    } finally hashed.unpersist()
  }

  // -------------------------------------------------------- grouping id

  /** GROUPING()/GROUPING_ID() over a rollup with PLANTED NULLs in a
    * grouping column — the disambiguation those functions exist for: a
    * real-NULL status group and the all-statuses subtotal row render the
    * same NULL cell, and only the grouping flags (g_st) tell them apart.
    * Bitmask order pinned to the SQL standard (first rollup column = MSB)
    * in both engines. */
  private val qGroupingId: Q = (s, dir) =>
    orders(s, dir)
      .select(
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("st"),
        col("o_orderpriority").as("pr"))
      .rollup("st", "pr")
      .agg(count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"),
        grouping(col("st")).cast("long").as("g_st"))
      .select(coalesce(col("st"), lit("(null)")).as("st"),
        coalesce(col("pr"), lit("(all)")).as("pr"),
        col("n"), col("gid"), col("g_st"))
      .orderBy("gid", "st", "pr")

  // ------------------------------------------------------ null ordering

  /** NULLS FIRST/LAST pinned as DATA: the engines disagree on the default
    * (Spark sorts nulls first ascending, DuckDB last), so any ORDER BY
    * over a nullable key silently diverges unless the placement is
    * explicit. Ranks materialize the ordering into hashable rows; the
    * orderkey tie-break makes both total orders unique. Windows run per
    * status group (partitioned). */
  private val qNullOrdering: Q = (s, dir) => {
    val o = orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus").as("grp"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)"))
          .as("cents"))
    val wNl = Window.partitionBy("grp")
      .orderBy(col("cents").asc_nulls_last, col("o_orderkey"))
    val wNf = Window.partitionBy("grp")
      .orderBy(col("cents").desc_nulls_first, col("o_orderkey"))
    o.withColumn("rank_asc_nulls_last", row_number().over(wNl))
      .withColumn("rank_desc_nulls_first", row_number().over(wNf))
      .filter(col("rank_asc_nulls_last") <= 5 ||
        col("rank_desc_nulls_first") <= 5)
      .select(col("grp"), col("o_orderkey"), col("cents"),
        col("rank_asc_nulls_last").cast("long").as("rank_asc_nulls_last"),
        col("rank_desc_nulls_first").cast("long").as("rank_desc_nulls_first"))
      .orderBy("grp", "o_orderkey")
  }

  // ---------------------------------------------- dataset fingerprint

  /** Content-addressed dataset manifest: per content-hash shard, the doc
    * count, byte total, XOR and sum of 52-bit content hashes, and hash
    * extrema — an order-free fingerprint (XOR/sum/min/max are commutative
    * monoids) that two independent pipeline runs can compare to PROVE
    * they produced the identical dataset without moving a byte. This is
    * the provenance receipt a dataset card carries; any single changed/
    * added/dropped document flips the shard's xor and sum. One map-side-
    * combined agg onto |shards| cells. */
  private val qDatasetFingerprint: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    documents(s, dir)
      .select(
        graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 13).as("h"),
        col("n_chars"))
      .groupBy(expr("h % 16").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        expr("bit_xor(h)").as("xor_hash"),
        sum("h").as("sum_hash"),
        min("h").as("min_hash"), max("h").as("max_hash"))
      .orderBy("shard")
  }

  // --------------------------------------------------------- epoch diff

  /** Dataset DIFF between two epochs by content hash — the add/remove/
    * change/unchanged census a versioned corpus publishes per release.
    * Epoch B is derived in-query: docs ≡0 mod 17 get revised text (a
    * content change under the same doc_id), docs ≡0 mod 13 are dropped,
    * and a shifted id range is added. A full-outer join on doc_id
    * classifies each id; counts + a per-class content-hash XOR land in
    * one bounded result. */
  private val qEpochDiff: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val base = documents(s, dir).select(col("doc_id"), col("text"))
    val a = base.select(col("doc_id"),
      graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 13).as("ha"))
    val b = base
      .filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 13).as("hb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        when(col("ha").isNull, lit("added"))
          .when(col("hb").isNull, lit("removed"))
          .when(col("ha") === col("hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("kind"),
        coalesce(col("hb"), col("ha")).as("h"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("xor_hash"))
      .orderBy("kind")
  }

  // ------------------------------------------------------- SCD2 lookup

  /** Point-in-time dimension lookup against the SCD2 build — the consumer
    * side of q_scd2_build: every click resolves the purchase-version row
    * valid AT its event time ([valid_from, valid_to) half-open, so a
    * version is matched by at most one interval per user and zero-length
    * versions match nothing, in both engines). The join is EQUI on the
    * entity key — the interval predicate is a residual filter, so the
    * volume rides a hash join keyed by user, never a range-join blowup;
    * per-user version chains are the small side by construction. */
  private val qScd2Lookup: Q = (s, dir) => {
    val e = eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val dim = e.filter(col("event_type") === "purchase")
      .withColumn("valid_to", lead("ts_us", 1).over(w))
      .select(col("user_id"), col("event_id").as("version_id"),
        col("ts_us").as("valid_from"), col("valid_to"))
    val facts = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          facts("ts_us") >= dim("valid_from") &&
          (dim("valid_to").isNull || facts("ts_us") < dim("valid_to")),
        "left")
      .select(facts("event_id"), col("version_id"), col("valid_from"))
      .orderBy("event_id")
  }

  // -------------------------------------------------------- burstiness

  /** Token burstiness (Fano factor) for the top-20 corpus tokens: the
    * variance-to-mean ratio of per-document counts, zeros included —
    * function words sit near Poisson (≈1), topical/template words burst
    * far above it; the signal that separates vocabulary to keep from
    * boilerplate markers. Kept entirely rational-integer:
    * fano·1000 = 1000·(D·ss − s²) div (D·s) with D the doc count and
    * s/ss the per-token sum / sum-of-squares over documents CONTAINING
    * the token (absent docs contribute zero to both, so the formula
    * already includes them through D). One (doc, tok) agg, one token
    * agg, a TakeOrdered(20) cut over the (count DESC, token ASC) total
    * order. */
  private val qBurstiness: Q = (s, dir) => {
    val docs = documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("d"))
    val perDoc = docs
      .select(col("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    perDoc.groupBy("tok")
      .agg(sum("c").as("s"), sum(col("c") * col("c")).as("ss"),
        count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("s").as("total_count"), col("doc_freq"),
        expr("1000 * (d * ss - s * s) div (d * s)").as("fano_x1000"))
      .orderBy(desc("total_count"), asc("tok")).limit(20)
  }

  // -------------------------------------------------------- Heaps curve

  /** Heaps-law vocabulary-growth curve WITHOUT rescanning per point:
    * each token's first appearance (min doc_id) lands it in a corpus
    * decile, and the cumulative bucket counts ARE V(n) at each prefix
    * boundary — one token-keyed agg + a 10-row window instead of ten
    * distinct-count passes. Sub-linear growth (each decile adding less)
    * is the natural-corpus signature; linear growth screams
    * machine-generated vocabulary. */
  private val qHeapsCurve: Q = (s, dir) => {
    val docs = documents(s, dir)
    val maxDoc = docs.agg(max("doc_id").as("m"))
    val firstSeen = docs
      .select(col("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(min("doc_id").as("first_doc"))
    val buckets = firstSeen.crossJoin(broadcast(maxDoc))
      .select(least(lit(9L), expr("first_doc * 10 div (m + 1)")).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_tokens"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the window runs over ≤10 aggregated rows — bounded input
    buckets.withColumn("vocab_size", sum("new_tokens").over(w))
      .orderBy("decile")
  }

  // --------------------------------------------------- Hamming retrieval

  /** Binary-embedding retrieval: each vector collapses to a 63-bit sign
    * code (one BIGINT — dims 1..63; 63 keeps the code inside signed-64 in
    * both engines), candidates rank by `bit_count(xor)` Hamming distance,
    * and the measured top-5 overlap against full-precision brute force is
    * the recall column. This is the 1-bit-per-dim first stage that turns
    * a 256-byte float scan into an 8-byte popcount scan — the 32× memory
    * cut that makes a 100 TB corpus RAM-resident; ranking runs through
    * the bounded topk_pairs aggregate (ties at equal distance to the
    * lower id, same contract both engines). */
  private val qHammingSearch: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val codeExpr = expr(
      "aggregate(sequence(1, 63), 0L, (acc, i) -> acc + " +
        "CASE WHEN element_at(embedding, CAST(i AS INT)) > CAST(0 AS FLOAT) " +
        "THEN shiftleft(1L, CAST(i - 1 AS INT)) ELSE 0L END)")
    val e = embeddings(s, dir)
    val coded = e.select(col("vec_id"), codeExpr.as("code"))
    val qs = broadcast(coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("code").as("q_code")))
    val ham = coded.crossJoin(qs)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("bit_count(code ^ q_code)").cast("double").as("dist"))
      .groupBy("q_id")
      .agg(expr("topk_pairs(n_id, dist, 5, true)").as("arr"))
      .select(col("q_id"), explode(expr("transform(arr, x -> x.n_id)")).as("n_id"))
    val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 5)
      .select("q_id", "n_id")
    val overlap = ham.join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    ham.groupBy("q_id").agg(count(lit(1)).as("n_binary"))
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"), col("n_binary"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy("q_id")
  }

  // --------------------------------------------- Hamming + exact re-rank

  /** The production two-stage retrieval contract: the 63-bit Hamming code
    * pre-selects 50 candidates per query (popcount scan), the exact
    * cosine re-ranks only those 50 (|Q|·50 float rows instead of the
    * corpus), and the measured top-5 overlap vs full brute force shows
    * how much of [[qHammingSearch]]'s recall loss the re-rank recovers —
    * the speed/recall knob is the candidate width, and the cost of the
    * float stage no longer scales with the corpus at all. */
  private val qHammingRerank: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val codeExpr = expr(
      "aggregate(sequence(1, 63), 0L, (acc, i) -> acc + " +
        "CASE WHEN element_at(embedding, CAST(i AS INT)) > CAST(0 AS FLOAT) " +
        "THEN shiftleft(1L, CAST(i - 1 AS INT)) ELSE 0L END)")
    val e = embeddings(s, dir)
    val coded = e.select(col("vec_id"), col("embedding"), codeExpr.as("code"))
    val qs = broadcast(coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("code").as("q_code")))
    val cand50 = coded.crossJoin(qs.select("q_id", "q_code"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("bit_count(code ^ q_code)").cast("double").as("dist"))
      .groupBy("q_id")
      .agg(expr("topk_pairs(n_id, dist, 50, true)").as("arr"))
      .select(col("q_id"), explode(expr("transform(arr, x -> x.n_id)")).as("n_id"))
    val rer = cand50
      .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
      .join(qs.select("q_id", "q_emb"), "q_id")
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("q_emb"), col("embedding")).as("sim"))
      .groupBy("q_id")
      .agg(expr("topk_pairs(n_id, sim, 5, false)").as("arr"))
      .select(col("q_id"), explode(expr("transform(arr, x -> x.n_id)")).as("n_id"))
    val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), 5)
      .select("q_id", "n_id")
    val overlap = rer.join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    rer.groupBy("q_id").agg(count(lit(1)).as("n_reranked"))
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"), col("n_reranked"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .orderBy("q_id")
  }

  // ----------------------------------------------------- null-safe join

  /** NULL-safe equi join (`<=>` / IS NOT DISTINCT FROM): two halves of
    * the order stream grouped by a null-planted status key and joined —
    * the NULL group survives as a real match where plain `=` silently
    * drops it (the other classic three-valued-logic production surprise,
    * the join-side sibling of q_not_in_null). Still a hash-joinable equi
    * key in both engines. */
  private val qNullSafeJoin: Q = (s, dir) => {
    val o = orders(s, dir).select(
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("st"),
      col("o_orderkey"))
    val a = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy("st").agg(count(lit(1)).as("n_even"))
    val b = o.filter(col("o_orderkey") % 2 === 1)
      .groupBy(col("st").as("st_b")).agg(count(lit(1)).as("n_odd"))
    a.join(b, col("st") <=> col("st_b"))
      .select(coalesce(col("st"), lit("(null)")).as("st"),
        col("n_even"), col("n_odd"))
      .orderBy("st")
  }

  // -------------------------------------------------------------- HITS

  private val HitsM = 1000000L
  private val HitsRounds = 4

  /** HITS hubs & authorities (Kleinberg), 4 synchronous rounds —
    * completing the canonical centrality pair next to PageRank. The usual
    * L2 normalization is float; determinism comes from the INTEGER
    * max-normalization x div (max(x) div 10⁶ + 1) instead — values stay
    * ≤ ~10⁶ (so every per-round sum fits a BIGINT at any |V|), truncating
    * div is identical in both engines, and relative ordering is
    * preserved. Per round: two edge joins + two dst/src aggs (the
    * pagerank movement pattern), a 1-row max collect per phase (bounded),
    * and the per-round localCheckpoint lineage cut of the iterative-graph
    * discipline. */
  private val qHits: Q = (s, dir) => {
    val ed = GraphQueries.edges(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = GraphQueries.nodes(ed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        def normalize(raw: DataFrame): DataFrame = {
          // the scalar max rides into the SAME job as a broadcast 1-row
          // cross join instead of a separate agg().first() driver action:
          // one eager checkpoint job per half-step instead of two (the agg
          // subtree's exchange is reused, so `raw` is still computed once).
          // (r15 note: fusing BOTH half-steps into one tagged-union
          // checkpoint per round was tried and measurably REGRESSED —
          // probe jobs 84→139, tasks 1697→2837 — because the authority
          // half-step's subtree is not exchange-reused under AQE inside
          // the union; receipts in OPTIMIZATION_r15.md.)
          val mx = raw.agg(max("x").as("mx"))
          nd.join(raw, Seq("node"), "left")
            .crossJoin(broadcast(mx))
            .select(col("node"),
              expr(s"coalesce(x, 0L) div (mx div ${HitsM}L + 1L)").as("v"))
            .transform(graft.config.Lineage.cut)
        }
        var h = nd.select(col("node"), lit(HitsM).as("v"))
        var a: DataFrame = h
        for (_ <- 1 to HitsRounds) {
          a = normalize(ed
            .join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node")).agg(sum("v").as("x")))
          h = normalize(ed
            .join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum("v").as("x")))
        }
        h.withColumnRenamed("v", "hub")
          .join(a.withColumnRenamed("v", "auth"), "node")
          .orderBy("node")
      } finally nd.unpersist()
    } finally ed.unpersist()
  }

  // ---------------------------------------------------------- wiring

  val queries: Map[String, Q] = Map(
    "graph_hits" -> qHits,
    "q_null_safe_join" -> qNullSafeJoin,
    "emb_hamming_rerank" -> qHammingRerank,
    "emb_hamming_search" -> qHammingSearch,
    "text_burstiness" -> qBurstiness,
    "text_heaps_curve" -> qHeapsCurve,
    "q_scd2_lookup" -> qScd2Lookup,
    "corpus_dataset_fingerprint" -> qDatasetFingerprint,
    "corpus_epoch_diff" -> qEpochDiff,
    "q_null_ordering" -> qNullOrdering,
    "q_grouping_id" -> qGroupingId,
    "q_asof_nearest" -> qAsofNearest,
    "sketch_theta_intersection" -> qThetaIntersect,
    "corpus_bpe_fertility" -> qBpeFertility,
    "emb_knn_accuracy" -> qKnnAccuracy,
    "q_lateral_topn" -> qLateralTopN,
    "q_not_in_null" -> qNotInNull,
    "q_cusum_changepoint" -> qCusum,
    "graph_reciprocity" -> qReciprocity,
    "q_autocorr" -> qAutocorr,
    "q_interval_union" -> qIntervalUnion,
    "graph_assortativity" -> qAssortativity,
    "text_zipf_slope" -> qZipf,
    "sketch_kmv_distinct" -> qKmv,
    "sketch_hll_union" -> qHllUnion,
    "corpus_perplexity_filter" -> qPerplexityFilter,
    "q_weighted_median" -> qWeightedMedian,
    "corpus_source_overlap" -> qSourceOverlap,
    "q_chi_square" -> qChiSquare,
    "q_robust_zscore" -> qRobustZscore,
    "q_benford_digits" -> qBenford,
    "q6_revenue" -> qSqlQ6)

  // ---------------------------------------------------------- oracles

  private val EdgesSql =
    """SELECT DISTINCT user_id AS src, event_id % 150 AS dst FROM events
      |  WHERE event_type IN ('click','view') AND event_id % 10 < 3
      |    AND user_id <> event_id % 150""".stripMargin

  /** DuckDB twin of Spark's `conv(substring(hx, 1, 13), 16, 10)` (the
    * ExtQueries.hexFoldSql family, re-stated here for the 52-bit width). */
  private val HexFold13 =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 14), " +
      "j -> CAST(strpos('0123456789abcdef', substr(hx, CAST(j AS INT), 1)) - 1 AS BIGINT))), " +
      "(x,y) -> x*16 + y)"

  private val HexFold15 =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 16), " +
      "j -> CAST(strpos('0123456789abcdef', substr(hx, CAST(j AS INT), 1)) - 1 AS BIGINT))), " +
      "(x,y) -> x*16 + y)"

  /** Shared source-keyed shingle CTEs (tok → sh → tr). */
  private val SourceShingleCtes =
    """tok AS (SELECT source, regexp_split_to_array(text, '\s+') AS t
      |        FROM documents),
      |sh AS (SELECT source,
      |  CASE WHEN len(t) < 3 THEN []::VARCHAR[]
      |       ELSE list_transform(range(1, len(t)-1),
      |                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS sg FROM tok),
      |tr AS (SELECT source, unnest(sg) AS shingle FROM sh)""".stripMargin

  /** DuckDB sequential-fold dot/cosine twins (the established shape that
    * matches the codegen'd dot_product bit for bit). */
  private def knnDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(x,y) -> x + y)"

  private def knnCos(a: String, b: String): String =
    s"(${knnDot(a, b)} / (sqrt(${knnDot(a, a)}) * sqrt(${knnDot(b, b)})))"

  private def hitsRound(r: Int): String = {
    val hp = if (r == 1) "h0" else s"h${r - 1}"
    s"""a${r}r AS (SELECT e.dst AS node, CAST(sum($hp.v) AS BIGINT) AS x
       |  FROM edges e JOIN $hp ON e.src = $hp.node GROUP BY e.dst),
       |a${r}m AS (SELECT CAST(max(x) AS BIGINT) AS mx FROM a${r}r),
       |a$r AS (SELECT n.node,
       |    CAST(coalesce(x, 0) // (mx // $HitsM + 1) AS BIGINT) AS v
       |  FROM n LEFT JOIN a${r}r ON n.node = a${r}r.node CROSS JOIN a${r}m),
       |h${r}r AS (SELECT e.src AS node, CAST(sum(a$r.v) AS BIGINT) AS x
       |  FROM edges e JOIN a$r ON e.dst = a$r.node GROUP BY e.src),
       |h${r}m AS (SELECT CAST(max(x) AS BIGINT) AS mx FROM h${r}r),
       |h$r AS (SELECT n.node,
       |    CAST(coalesce(x, 0) // (mx // $HitsM + 1) AS BIGINT) AS v
       |  FROM n LEFT JOIN h${r}r ON n.node = h${r}r.node CROSS JOIN h${r}m)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "graph_hits" ->
      s"""WITH edges AS ($EdgesSql),
         |n AS (SELECT DISTINCT src AS node FROM edges
         |      UNION SELECT dst FROM edges),
         |h0 AS (SELECT node, CAST($HitsM AS BIGINT) AS v FROM n),
         |${(1 to HitsRounds).map(hitsRound).mkString(",\n")}
         |SELECT h$HitsRounds.node, h$HitsRounds.v AS hub,
         |  a$HitsRounds.v AS auth
         |FROM h$HitsRounds JOIN a$HitsRounds
         |  ON h$HitsRounds.node = a$HitsRounds.node
         |ORDER BY h$HitsRounds.node""".stripMargin,

    "q_null_safe_join" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |              ELSE o_orderstatus END AS st, o_orderkey
        |  FROM orders),
        |a AS (SELECT st, count(*) AS n_even FROM o
        |      WHERE o_orderkey % 2 = 0 GROUP BY st),
        |b AS (SELECT st, count(*) AS n_odd FROM o
        |      WHERE o_orderkey % 2 = 1 GROUP BY st)
        |SELECT coalesce(a.st, '(null)') AS st, n_even, n_odd
        |FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
        |ORDER BY st""".stripMargin,

    "emb_hamming_rerank" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 64),
         |        i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (x, y) -> x + y) AS code
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qe, code AS q_code
         |      FROM c WHERE vec_id < 10),
         |h AS (SELECT q_id, c.vec_id AS n_id, c.embedding AS ne,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY bit_count(xor(code, q_code)), c.vec_id) AS rank
         |  FROM c, q WHERE c.vec_id <> q.q_id),
         |h50 AS (SELECT q_id, n_id, ne FROM h WHERE rank <= 50),
         |rr AS (SELECT q_id, n_id FROM (
         |    SELECT h50.q_id, n_id,
         |      row_number() OVER (PARTITION BY h50.q_id
         |        ORDER BY ${knnCos("qe", "ne")} DESC, n_id) AS rank
         |    FROM h50 JOIN q ON h50.q_id = q.q_id)
         |  WHERE rank <= 5),
         |bf AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY ${knnCos("qe", "e.embedding")} DESC, e.vec_id) AS rank
         |    FROM embeddings e, q WHERE e.vec_id <> q.q_id)
         |  WHERE rank <= 5),
         |nb AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_reranked
         |       FROM rr GROUP BY 1),
         |ov AS (SELECT rr.q_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM rr JOIN bf ON rr.q_id = bf.q_id AND rr.n_id = bf.n_id
         |  GROUP BY 1)
         |SELECT nb.q_id, n_reranked, coalesce(hits, 0) AS hits
         |FROM nb LEFT JOIN ov ON nb.q_id = ov.q_id
         |ORDER BY nb.q_id""".stripMargin,

    "emb_hamming_search" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 64),
         |        i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (x, y) -> x + y) AS code
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, code AS q_code FROM c WHERE vec_id < 10),
         |h AS (SELECT q_id, c.vec_id AS n_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY bit_count(xor(code, q_code)), c.vec_id) AS rank
         |  FROM c, q WHERE c.vec_id <> q.q_id),
         |h5 AS (SELECT q_id, n_id FROM h WHERE rank <= 5),
         |bfq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
         |        WHERE vec_id < 10),
         |bf AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY ${knnCos("qe", "e.embedding")} DESC, e.vec_id) AS rank
         |    FROM embeddings e, bfq WHERE e.vec_id <> bfq.q_id)
         |  WHERE rank <= 5),
         |nb AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_binary
         |       FROM h5 GROUP BY 1),
         |ov AS (SELECT h5.q_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM h5 JOIN bf ON h5.q_id = bf.q_id AND h5.n_id = bf.n_id
         |  GROUP BY 1)
         |SELECT nb.q_id, n_binary, coalesce(hits, 0) AS hits
         |FROM nb LEFT JOIN ov ON nb.q_id = ov.q_id
         |ORDER BY nb.q_id""".stripMargin,

    "text_burstiness" ->
      """WITH d AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
        |w AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |      FROM documents),
        |pc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |       FROM w WHERE tok <> '' GROUP BY 1, 2),
        |t AS (SELECT tok, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c * c) AS BIGINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS doc_freq
        |  FROM pc GROUP BY tok)
        |SELECT tok, s AS total_count, doc_freq,
        |  1000 * (d * ss - s * s) // (d * s) AS fano_x1000
        |FROM t CROSS JOIN d
        |ORDER BY total_count DESC, tok LIMIT 20""".stripMargin,

    "text_heaps_curve" ->
      """WITH m AS (SELECT CAST(max(doc_id) AS BIGINT) AS m FROM documents),
        |w AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |      FROM documents),
        |fs AS (SELECT tok, CAST(min(doc_id) AS BIGINT) AS first_doc
        |       FROM w WHERE tok <> '' GROUP BY tok),
        |b AS (SELECT least(9, first_doc * 10 // (m + 1)) AS decile,
        |    CAST(count(*) AS BIGINT) AS new_tokens
        |  FROM fs CROSS JOIN m GROUP BY 1)
        |SELECT decile, new_tokens,
        |  CAST(sum(new_tokens) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_size
        |FROM b ORDER BY decile""".stripMargin,

    "q_scd2_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |dim AS (
        |  SELECT user_id, event_id AS version_id, ts_us AS valid_from,
        |    lead(ts_us) OVER (PARTITION BY user_id
        |                      ORDER BY ts_us, event_id) AS valid_to
        |  FROM e WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, event_id, ts_us FROM e
        |      WHERE event_type = 'click')
        |SELECT f.event_id, dim.version_id, dim.valid_from
        |FROM f LEFT JOIN dim
        |  ON f.user_id = dim.user_id
        | AND f.ts_us >= dim.valid_from
        | AND (dim.valid_to IS NULL OR f.ts_us < dim.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    "corpus_dataset_fingerprint" ->
      s"""WITH h AS (
         |  SELECT $HexFold13 AS h, n_chars
         |  FROM (SELECT md5(text) AS hx, n_chars FROM documents))
         |SELECT h % 16 AS shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  bit_xor(h) AS xor_hash,
         |  CAST(sum(h) AS BIGINT) AS sum_hash,
         |  min(h) AS min_hash, max(h) AS max_hash
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_epoch_diff" ->
      s"""WITH a AS (
         |  SELECT doc_id, $HexFold13 AS ha
         |  FROM (SELECT doc_id, md5(text) AS hx FROM documents)),
         |bsrc AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 17 = 0 THEN text || ' rev2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 13 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 13 = 0),
         |b AS (
         |  SELECT doc_id, $HexFold13 AS hb
         |  FROM (SELECT doc_id, md5(text) AS hx FROM bsrc)),
         |j AS (
         |  SELECT
         |    CASE WHEN ha IS NULL THEN 'added'
         |         WHEN hb IS NULL THEN 'removed'
         |         WHEN ha = hb THEN 'unchanged'
         |         ELSE 'changed' END AS kind,
         |    coalesce(hb, ha) AS h
         |  FROM a FULL OUTER JOIN b USING (doc_id))
         |SELECT kind, count(*) AS n, bit_xor(h) AS xor_hash
         |FROM j GROUP BY kind ORDER BY kind""".stripMargin,

    "q_null_ordering" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus AS grp,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |         ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents
        |  FROM orders),
        |r AS (SELECT grp, o_orderkey, cents,
        |    CAST(row_number() OVER (PARTITION BY grp
        |      ORDER BY cents ASC NULLS LAST, o_orderkey) AS BIGINT)
        |      AS rank_asc_nulls_last,
        |    CAST(row_number() OVER (PARTITION BY grp
        |      ORDER BY cents DESC NULLS FIRST, o_orderkey) AS BIGINT)
        |      AS rank_desc_nulls_first
        |  FROM o)
        |SELECT grp, o_orderkey, cents, rank_asc_nulls_last,
        |  rank_desc_nulls_first
        |FROM r
        |WHERE rank_asc_nulls_last <= 5 OR rank_desc_nulls_first <= 5
        |ORDER BY grp, o_orderkey""".stripMargin,

    "q_grouping_id" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |              ELSE o_orderstatus END AS st,
        |    o_orderpriority AS pr
        |  FROM orders)
        |SELECT coalesce(st, '(null)') AS st, coalesce(pr, '(all)') AS pr,
        |  count(*) AS n,
        |  CAST(GROUPING(st, pr) AS BIGINT) AS gid,
        |  CAST(GROUPING(st) AS BIGINT) AS g_st
        |FROM o GROUP BY ROLLUP (st, pr)
        |ORDER BY gid, st, pr""".stripMargin,

    "q_asof_nearest" ->
      """SELECT event_id,
        |  CASE WHEN next_ts IS NULL OR (prev_ts IS NOT NULL AND ts - prev_ts <= next_ts - ts)
        |       THEN prev_id ELSE next_id END AS nearest_click,
        |  CASE WHEN next_ts IS NULL OR (prev_ts IS NOT NULL AND ts - prev_ts <= next_ts - ts)
        |       THEN ts - prev_ts ELSE next_ts - ts END AS gap_us
        |FROM (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER wp AS prev_ts,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER wp AS prev_id,
        |    first_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER wn AS next_ts,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER wn AS next_id
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wn AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "sketch_theta_intersection" ->
      s"""WITH tok AS (SELECT source, regexp_split_to_array(text, '\\s+') AS t
         |             FROM documents),
         |sh AS (SELECT source,
         |  CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |       ELSE list_transform(range(1, len(t)-1),
         |                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |  END AS sg FROM tok),
         |tr AS (SELECT source, unnest(sg) AS shingle FROM sh),
         |hh AS (SELECT DISTINCT source, $HexFold13 AS h
         |  FROM (SELECT source, md5(shingle) AS hx FROM tr)),
         |rk AS (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
         |sk AS (SELECT source, h FROM rk WHERE rn <= $KmvK),
         |th AS (SELECT source,
         |    coalesce(max(CASE WHEN rn = $KmvK THEN h END), $Pow52) AS theta_s
         |  FROM rk GROUP BY source),
         |p AS (SELECT ta.source AS s1, tb.source AS s2,
         |    least(ta.theta_s, tb.theta_s) AS theta
         |  FROM th ta, th tb WHERE ta.source < tb.source),
         |cb AS (SELECT p.s1, p.s2, CAST(count(*) AS BIGINT) AS n_below_theta
         |  FROM p JOIN sk a ON a.source = p.s1
         |         JOIN sk b ON b.source = p.s2 AND a.h = b.h
         |  WHERE a.h < p.theta GROUP BY 1, 2),
         |ex AS (SELECT a.source AS s1, b.source AS s2,
         |    CAST(count(*) AS BIGINT) AS exact_common
         |  FROM hh a JOIN hh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT p.s1, p.s2, p.theta,
         |  coalesce(cb.n_below_theta, 0) AS n_below_theta,
         |  CAST(coalesce(cb.n_below_theta, 0) AS DOUBLE)
         |    * CAST($Pow52 AS DOUBLE) / CAST(p.theta AS DOUBLE) AS theta_est,
         |  coalesce(ex.exact_common, 0) AS exact_common
         |FROM p LEFT JOIN cb ON p.s1 = cb.s1 AND p.s2 = cb.s2
         |       LEFT JOIN ex ON p.s1 = ex.s1 AND p.s2 = ex.s2
         |ORDER BY p.s1, p.s2""".stripMargin,

    "corpus_bpe_fertility" ->
      s"""${ExtQueries.BpeCtes(64)},
         |v8 AS (SELECT w, len(regexp_extract_all(s,
         |    chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS n_bpe
         |  FROM bpe WHERE iter = 64),
         |tokr2 AS (SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS ws_tokens,
         |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(n_bpe) AS BIGINT) * 10000 // count(*) AS fertility_x10000
         |FROM tokr2 JOIN v8 USING (w)
         |GROUP BY source ORDER BY source""".stripMargin,

    "emb_knn_accuracy" ->
      s"""WITH tr AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS label
         |  FROM embeddings WHERE vec_id % 5 <> 0),
         |te AS (SELECT vec_id AS q_id, embedding AS qe,
         |    CAST(label AS BIGINT) AS true_label
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |r AS (SELECT q_id, tr.label,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${knnCos("qe", "tr.embedding")} DESC, tr.vec_id) AS rank
         |  FROM tr, te WHERE tr.vec_id <> te.q_id),
         |v AS (SELECT q_id, label, count(*) AS cnt FROM r WHERE rank <= 5
         |      GROUP BY 1, 2),
         |p AS (SELECT q_id, arg_max(label, cnt * 1000 - label) AS pred
         |      FROM v GROUP BY 1)
         |SELECT true_label, count(*) AS n,
         |  CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // count(*) AS acc_ppm
         |FROM p JOIN te USING (q_id) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.price_cents
        |FROM customer c,
        |LATERAL (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        |  FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY price_cents DESC, o_orderkey
        |  LIMIT 3) o
        |ORDER BY c_custkey, price_cents DESC, o_orderkey""".stripMargin,

    "q_not_in_null" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                           WHERE o_orderstatus = 'F')) AS n_nullfree,
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 97 = 0
        |                                       THEN NULL ELSE o_custkey END
        |                           FROM orders
        |                           WHERE o_orderstatus = 'F')) AS n_withnull,
        |  (SELECT count(*) FROM customer
        |   WHERE c_custkey IN (SELECT CASE WHEN o_orderkey % 97 = 0
        |                                   THEN NULL ELSE o_custkey END
        |                       FROM orders
        |                       WHERE o_orderstatus = 'F')) AS n_in_withnull""".stripMargin,

    "q_cusum_changepoint" ->
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // $DayUs AS day, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, day, c,
         |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t_total,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
         |  FROM daily),
         |r AS (SELECT event_type, n_days, t_total,
         |    CAST(sum(c * n_days - t_total) OVER (PARTITION BY event_type
         |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS s_t
         |  FROM w)
         |SELECT event_type, max(n_days) AS n_days, max(t_total) AS total,
         |  max(s_t) AS max_cusum, min(s_t) AS min_cusum,
         |  max(s_t) - min(s_t) AS cusum_range
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_reciprocity" ->
      s"""WITH edges AS ($EdgesSql),
         |rec AS (SELECT a.src, a.dst FROM edges a
         |  WHERE EXISTS (SELECT 1 FROM edges b
         |                WHERE b.src = a.dst AND b.dst = a.src))
         |SELECT (SELECT count(*) FROM edges) AS n_edges,
         |  (SELECT count(*) FROM rec) AS n_reciprocal,
         |  (SELECT count(*) FROM rec) * 1000000
         |    // (SELECT count(*) FROM edges) AS reciprocity_ppm""".stripMargin,

    "q_autocorr" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, count(*) AS c
         |  FROM events GROUP BY 1),
         |pairs AS (
         |  SELECT a.c AS x, b.c AS y, a.day AS day, CAST(1 AS BIGINT) AS lag
         |  FROM daily a JOIN daily b ON b.day - 1 = a.day
         |  UNION ALL
         |  SELECT a.c, b.c, a.day, CAST(7 AS BIGINT)
         |  FROM daily a JOIN daily b ON b.day - 7 = a.day),
         |m AS (
         |  SELECT lag, count(*) AS n_pairs,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM pairs GROUP BY lag),
         |d AS (
         |  SELECT lag, n_pairs,
         |    n_pairs * sxy - sx * sy AS num,
         |    n_pairs * sxx - sx * sx AS denx,
         |    n_pairs * syy - sy * sy AS deny
         |  FROM m)
         |SELECT lag, n_pairs,
         |  CASE WHEN denx = 0 OR deny = 0 THEN 0.0
         |       ELSE CAST(num AS DOUBLE)
         |            / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
         |  END AS acf
         |FROM d ORDER BY lag""".stripMargin,

    "q_interval_union" ->
      s"""WITH iv AS (
         |  SELECT user_id, epoch_us(ts) AS st, epoch_us(ts) + $SessUs AS en
         |  FROM events),
         |r AS (
         |  SELECT user_id, st, en,
         |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM iv)
         |SELECT user_id, count(*) AS n_intervals,
         |  CAST(sum(greatest(0, en - greatest(st, coalesce(pmax, st)))) AS BIGINT)
         |    AS covered_us,
         |  CAST(sum(greatest(0, en - greatest(st, coalesce(pmax, st)))) AS BIGINT)
         |    // 60000000 AS covered_min
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "graph_assortativity" ->
      s"""WITH edges AS ($EdgesSql),
         |deg AS (
         |  SELECT node, CAST(sum(o) + sum(i) AS BIGINT) AS total_deg FROM (
         |    SELECT src AS node, 1 AS o, 0 AS i FROM edges
         |    UNION ALL
         |    SELECT dst, 0, 1 FROM edges)
         |  GROUP BY node),
         |p AS (
         |  SELECT a.total_deg AS dx, b.total_deg AS dy
         |  FROM edges e
         |  JOIN deg a ON e.src = a.node
         |  JOIN deg b ON e.dst = b.node),
         |m AS (
         |  SELECT count(*) AS n_edges,
         |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
         |    CAST(sum(dy * dy) AS BIGINT) AS syy,
         |    CAST(sum(dx * dy) AS BIGINT) AS sxy
         |  FROM p),
         |d AS (
         |  SELECT n_edges,
         |    n_edges * sxy - sx * sy AS num,
         |    n_edges * sxx - sx * sx AS denx,
         |    n_edges * syy - sy * sy AS deny
         |  FROM m)
         |SELECT n_edges,
         |  CASE WHEN denx = 0 OR deny = 0 THEN 0.0
         |       ELSE CAST(num AS DOUBLE)
         |            / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
         |  END AS assortativity
         |FROM d""".stripMargin,

    "text_zipf_slope" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
        |           FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM w WHERE tok <> '' GROUP BY tok),
        |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 1000),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
        |      FROM top),
        |b AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS xb,
        |             CAST(length(bin(cnt)) - 1 AS BIGINT) AS yb FROM r),
        |m AS (SELECT count(*) AS n_top,
        |    CAST(sum(xb) AS BIGINT) AS sx, CAST(sum(yb) AS BIGINT) AS sy,
        |    CAST(sum(xb * xb) AS BIGINT) AS sxx,
        |    CAST(sum(yb * yb) AS BIGINT) AS syy,
        |    CAST(sum(xb * yb) AS BIGINT) AS sxy
        |  FROM b),
        |d AS (SELECT n_top,
        |    n_top * sxy - sx * sy AS num,
        |    n_top * sxx - sx * sx AS denx,
        |    n_top * syy - sy * sy AS deny
        |  FROM m)
        |SELECT n_top,
        |  CASE WHEN denx = 0 THEN 0.0
        |       ELSE CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END AS zipf_slope,
        |  CASE WHEN denx = 0 OR deny = 0 THEN 0.0
        |       ELSE CAST(num AS DOUBLE)
        |            / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
        |  END AS corr_r
        |FROM d""".stripMargin,

    "sketch_kmv_distinct" ->
      s"""WITH tok AS (SELECT source, regexp_split_to_array(text, '\\s+') AS t
         |             FROM documents),
         |sh AS (SELECT source,
         |  CASE WHEN len(t) < 3 THEN []::VARCHAR[]
         |       ELSE list_transform(range(1, len(t)-1),
         |                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |  END AS sg FROM tok),
         |tr AS (SELECT source, unnest(sg) AS shingle FROM sh),
         |hh AS (SELECT DISTINCT source, $HexFold13 AS h
         |  FROM (SELECT source, md5(shingle) AS hx FROM tr)),
         |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
         |  FROM hh GROUP BY source),
         |rk AS (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
         |kth AS (SELECT source, h AS kth_hash FROM rk WHERE rn = $KmvK),
         |per AS (SELECT ex.source AS scope, exact_distinct, kth_hash
         |  FROM ex LEFT JOIN kth ON ex.source = kth.source),
         |g AS (SELECT DISTINCT h FROM hh),
         |gex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM g),
         |gkth AS (SELECT h AS kth_hash FROM
         |    (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM g)
         |  WHERE rn = $KmvK),
         |u AS (SELECT scope, exact_distinct, kth_hash FROM per
         |  UNION ALL
         |  SELECT '__merged__', gex.exact_distinct, gkth.kth_hash
         |  FROM gex LEFT JOIN gkth ON TRUE),
         |est AS (SELECT scope, exact_distinct, kth_hash,
         |    CAST(${KmvK - 1} AS DOUBLE) * CAST($Pow52 AS DOUBLE)
         |      / CAST(kth_hash AS DOUBLE) AS kmv_est
         |  FROM u)
         |SELECT scope, exact_distinct, kth_hash, kmv_est,
         |  CAST(floor(CAST(10000 AS DOUBLE)
         |    * abs(kmv_est - CAST(exact_distinct AS DOUBLE))
         |    / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_x10000
         |FROM est ORDER BY scope""".stripMargin,

    // direct per-source + direct GLOBAL registers; Spark's __merged__ row is
    // built only from per-source registers, so a hash-match proves the merge
    "sketch_hll_union" ->
      s"""WITH $SourceShingleCtes,
         |hh AS (SELECT source, $HexFold15 AS h
         |  FROM (SELECT source, md5(shingle) AS hx FROM tr)),
         |hb AS (SELECT source, h % 64 AS bucket, h // 64 AS rest FROM hh),
         |hr AS (SELECT source, bucket,
         |    least(50, 55 - CASE WHEN rest = 0 THEN 0
         |                        ELSE length(bin(rest)) END) AS rank
         |  FROM hb),
         |regs AS (SELECT source, bucket, max(rank) AS reg FROM hr GROUP BY 1, 2),
         |gregs AS (SELECT bucket, max(rank) AS reg FROM hr GROUP BY 1),
         |sums AS (
         |  SELECT source AS scope,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(50 - reg AS INT)) AS BIGINT)
         |      AS s_present,
         |    CAST(count(*) AS BIGINT) AS nb
         |  FROM regs GROUP BY 1
         |  UNION ALL
         |  SELECT '__merged__',
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(50 - reg AS INT)) AS BIGINT),
         |    CAST(count(*) AS BIGINT)
         |  FROM gregs),
         |st AS (SELECT scope,
         |    s_present + (64 - nb) * (CAST(1 AS BIGINT) << 50) AS s
         |  FROM sums),
         |ex AS (SELECT source AS scope,
         |    CAST(count(DISTINCT shingle) AS BIGINT) AS exact_distinct
         |  FROM tr GROUP BY 1
         |  UNION ALL
         |  SELECT '__merged__', CAST(count(DISTINCT shingle) AS BIGINT) FROM tr)
         |SELECT scope, CAST(64 AS BIGINT) AS m, exact_distinct,
         |  CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |    * CAST(1125899906842624 AS DOUBLE) / CAST(s AS DOUBLE) AS hll_est
         |FROM st JOIN ex USING (scope) ORDER BY scope""".stripMargin,

    "corpus_perplexity_filter" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |pr AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM tok WHERE len(t) >= 2)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM pr GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pr GROUP BY 1),
        |b AS (SELECT doc_id,
        |    (strlen(bin(c1)) - 1) - (strlen(bin(c2)) - 1) AS bits
        |  FROM pr JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
        |sc AS (SELECT doc_id,
        |    CAST(100 * sum(bits) // count(*) AS BIGINT) AS surprisal_x100
        |  FROM b GROUP BY 1),
        |md AS (SELECT CAST(2 * quantile_cont(surprisal_x100, 0.5) AS BIGINT)
        |    AS med2 FROM sc)
        |SELECT doc_id, surprisal_x100,
        |  CASE WHEN surprisal_x100 * 2 < med2 - med2 // 50 THEN 'drop_low'
        |       WHEN surprisal_x100 * 2 > med2 + med2 // 50 THEN 'drop_high'
        |       ELSE 'keep' END AS verdict
        |FROM sc CROSS JOIN md ORDER BY doc_id""".stripMargin,

    "q_weighted_median" ->
      """WITH m AS (
        |  SELECT l_returnflag AS f,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
        |  FROM lineitem),
        |g AS (SELECT f, cents, CAST(sum(w) AS BIGINT) AS w FROM m GROUP BY 1, 2),
        |r AS (SELECT f, cents,
        |    CAST(sum(w) OVER (PARTITION BY f ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(w) OVER (PARTITION BY f) AS BIGINT) AS tot
        |  FROM g)
        |SELECT f AS l_returnflag, max(tot) AS total_weight,
        |  min(CASE WHEN cum * 2 >= tot THEN cents END) AS w_median_cents
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_source_overlap" ->
      s"""WITH $SourceShingleCtes,
         |ss AS (SELECT DISTINCT source, shingle FROM tr),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM ss GROUP BY 1),
         |iv AS (SELECT a.source AS s1, b.source AS s2,
         |    CAST(count(*) AS BIGINT) AS n_common
         |  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s1, s2, n_common, x.sz AS n1, y.sz AS n2,
         |  n_common * 1000000 // (x.sz + y.sz - n_common) AS jaccard_ppm
         |FROM iv JOIN sz x ON iv.s1 = x.source JOIN sz y ON iv.s2 = y.source
         |ORDER BY s1, s2""".stripMargin,

    "q_chi_square" ->
      s"""WITH b AS (SELECT event_type AS et,
         |    (epoch_us(ts) // $DayUs) % 7 AS dow FROM events),
         |o AS (SELECT et, dow, CAST(count(*) AS BIGINT) AS o FROM b GROUP BY 1, 2),
         |r AS (SELECT et, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
         |c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
         |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         |t AS (SELECT et, dow, n,
         |    (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
         |  * (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
         |  / (CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)) AS term
         |  FROM o JOIN r USING (et) JOIN c USING (dow) CROSS JOIN n),
         |a AS (SELECT max(n) AS n, list(term ORDER BY et, dow) AS cs FROM t),
         |d AS (SELECT (SELECT count(*) FROM r) AS nr,
         |             (SELECT count(*) FROM c) AS nc)
         |SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs), (x,y) -> x + y)
         |    AS chi2
         |FROM a CROSS JOIN d""".stripMargin,

    "q_robust_zscore" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |md AS (SELECT event_type,
        |    CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2
        |  FROM v GROUP BY 1),
        |dv AS (SELECT v.event_type, cents, abs(cents * 2 - m2) AS dev2, m2
        |  FROM v JOIN md ON v.event_type = md.event_type),
        |ma AS (SELECT event_type,
        |    CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        |  FROM dv GROUP BY 1)
        |SELECT dv.event_type, count(*) AS n, max(m2) AS median_x2,
        |  max(mad4) AS mad_x4,
        |  CAST(sum(CASE WHEN dev2 * 20000 > 44478 * mad4 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dv JOIN ma ON dv.event_type = ma.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_benford_digits" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events WHERE value > 0.005),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT digit, n, n * 1000000 // tot AS observed_ppm,
        |  CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |    WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
        |    ELSE 0 END AS benford_ppm
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,

    "q6_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |               * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS revenue_x10000,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1994-01-01'
        |  AND l_shipdate < DATE '1995-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin)
}
