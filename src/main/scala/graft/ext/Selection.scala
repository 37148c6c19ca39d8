package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based data selection — the two standard "pick the best training
  * data" levers of an LLM corpus pipeline, both expressed scale-first:
  *
  *   - a closed-form least-squares QUALITY CLASSIFIER over the curation
  *     signals (the GPT-3/LLaMA-style "does this look like the reference
  *     domain" filter, with linear-probability least squares standing in
  *     for logistic regression so training is a CLOSED FORM: one
  *     normal-equations aggregate + a 4×4 solve on the driver);
  *   - DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169) over
  *     hashed token buckets, in the repo's exact-integer surprisal-bits
  *     convention.
  *
  * Scale shape (both): training/statistics = ONE full-corpus aggregate
  * whose output is bounded by the MODEL size (14 scalars for the
  * classifier, `buckets` rows for DSIR), never by the corpus; the learned
  * model returns to the plan as literals and scoring is a pure narrow
  * row-local projection — the [[PcaTrainer]] "trained on everything,
  * still oracle-checkable" template. At 100 TB the scoring pass fuses
  * into whatever scan already reads the text column; nothing shuffles.
  *
  * Oracle-exactness: the normal-equation entries are EXACT integer sums
  * of the (all-integer, [[TextAnalysis.qualityCols]]-derived) features,
  * so both engines see bit-identical matrices; the 4×4 solve is Cramer's
  * rule with a PINNED cofactor-expansion order (see [[det3]]/[[det4]] and
  * their SQL emitters [[det3Sql]]/[[det4Sql]] — the same expression tree,
  * so IEEE doubles agree bit-for-bit); scoring is the same
  * left-associated fused multiply-add chain in both engines. DSIR avoids
  * floating logs entirely via the ilog2 integer-bits trick. */
object Selection {
  import TextAnalysis.tokens

  // ---------------------------------------------------------- classifier

  /** All-integer per-doc features over a WEAKLY LABELED corpus
    * (doc_id, text, y): x1 = word count, x2 = stopword ratio ×10000,
    * x3 = punctuation ratio ×10000 (exactly [[TextAnalysis.qualityCols]]'s
    * definitions); y ∈ {0,1} is the caller's weak domain label (a curated
    * seed set, a source tag, a language id — whatever plays the
    * "reference domain" in the GPT-3-style quality-classifier setup). */
  def classifierFeatures(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val words = size(toks).cast("long")
    val stops = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is"))).cast("long")
    val punct = regexp_count(col("text"), lit("[^\\w\\s]")).cast("long")
    docs.select(col("doc_id"),
      words.as("x1"),
      (lit(10000L) * stops / words).cast("long").as("x2"),
      (lit(10000L) * punct / length(col("text")).cast("long")).cast("long").as("x3"),
      col("y").cast("long").as("y"))
  }

  /** 3×3 determinant, cofactor expansion along the first row with pinned
    * association — [[det3Sql]] emits the SAME tree for the oracle. */
  private def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
      f: Double, g: Double, h: Double, i: Double): Double =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** 4×4 determinant (row-major), first-row cofactor expansion. */
  private def det4(m: Array[Double]): Double =
    m(0) * det3(m(5), m(6), m(7), m(9), m(10), m(11), m(13), m(14), m(15)) -
      m(1) * det3(m(4), m(6), m(7), m(8), m(10), m(11), m(12), m(14), m(15)) +
      m(2) * det3(m(4), m(5), m(7), m(8), m(9), m(11), m(12), m(13), m(15)) -
      m(3) * det3(m(4), m(5), m(6), m(8), m(9), m(10), m(12), m(13), m(14))

  /** SQL twin of [[det3]] — identical parenthesization, so DuckDB builds
    * the same IEEE expression tree. */
  def det3Sql(a: String, b: String, c: String, d: String, e: String,
      f: String, g: String, h: String, i: String): String =
    s"$a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g)"

  /** SQL twin of [[det4]] over 16 row-major operand strings. */
  def det4Sql(m: IndexedSeq[String]): String =
    s"${m(0)} * (${det3Sql(m(5), m(6), m(7), m(9), m(10), m(11), m(13), m(14), m(15))}) - " +
      s"${m(1)} * (${det3Sql(m(4), m(6), m(7), m(8), m(10), m(11), m(12), m(14), m(15))}) + " +
      s"${m(2)} * (${det3Sql(m(4), m(5), m(7), m(8), m(9), m(11), m(12), m(13), m(15))}) - " +
      s"${m(3)} * (${det3Sql(m(4), m(5), m(6), m(8), m(9), m(10), m(12), m(13), m(14))})"

  /** Closed-form ridge least squares over [[classifierFeatures]]:
    * solve (XᵀX + λ·diag(0,1,1,1)) w = Xᵀy by Cramer's rule. ONE
    * distributed aggregate produces the 14 exact integer sums (the whole
    * driver working set — model-sized, corpus-independent); the solve is
    * O(1) driver arithmetic. λ is integer so every matrix entry stays an
    * exact Long before its (exact, < 2⁵³) double conversion.
    *
    * Returns (w0, w1, w2, w3) — intercept first. Integer-sum overflow is
    * bounded by Σ x_i·x_j ≤ n·10⁸ (ratios are ×10000-scaled, word counts
    * ≤ 10⁴ here): fine to ~10¹⁰ docs; past that, switch the sums to
    * DOUBLE and give up bit-exactness (documented trade). */
  def trainQualityLsq(docs: DataFrame, lambda: Long = 1L): Array[Double] = {
    val f = classifierFeatures(docs)
    val r = f.agg(
      count(lit(1)).cast("long").as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("x3")).as("s13"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x2") * col("x3")).as("s23"),
      sum(col("x3") * col("x3")).as("s33"),
      sum("y").as("sy"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("x3") * col("y")).as("s3y")).head()
    def L(i: Int): Long = r.getLong(i)
    val (n, s1, s2, s3) = (L(0), L(1), L(2), L(3))
    val (s11, s12, s13, s22, s23, s33) = (L(4), L(5), L(6), L(7), L(8), L(9))
    val (sy, s1y, s2y, s3y) = (L(10), L(11), L(12), L(13))
    // row-major A with the ridge on the non-intercept diagonal
    val a = Array[Double](
      n, s1, s2, s3,
      s1, s11 + lambda, s12, s13,
      s2, s12, s22 + lambda, s23,
      s3, s13, s23, s33 + lambda)
    val b = Array[Double](sy, s1y, s2y, s3y)
    val den = det4(a)
    require(den != 0.0, "singular normal equations — raise lambda")
    Array.tabulate(4) { j =>
      val aj = a.clone()
      for (i <- 0 until 4) aj(i * 4 + j) = b(i)
      det4(aj) / den
    }
  }

  /** Score every document under the trained weights: one narrow
    * projection, score = ((w0 + w1·x1) + w2·x2) + w3·x3 (pinned
    * left-association — the oracle writes the same chain), pred = score
    * ≥ 0.5 (the linear-probability decision rule). Carries the weak
    * label through so the output doubles as a training-accuracy audit. */
  def scoreQuality(docs: DataFrame, w: Array[Double]): DataFrame =
    classifierFeatures(docs).select(
      col("doc_id"),
      (lit(w(0)) + lit(w(1)) * col("x1").cast("double")
        + lit(w(2)) * col("x2").cast("double")
        + lit(w(3)) * col("x3").cast("double")).as("score"),
      col("y").as("label"))
      .withColumn("pred", (col("score") >= 0.5).cast("boolean"))
      .select("doc_id", "score", "pred", "label")

  // ---------------------------------------------------------------- DSIR

  /** Token → hash bucket in [0, buckets): 60-bit md5 prefix mod buckets —
    * the [[TextAnalysis.cmsHeavyHitters]] hashing convention, replayable
    * verbatim in DuckDB. */
  private def bucketOf(tok: Column, buckets: Int): Column =
    graft.functions.GraftFunctions.md5PrefixLong(tok, 1, 15) % buckets

  /** DSIR importance weights in exact integer bits over a weakly labeled
    * corpus (doc_id, text, y): per hashed token bucket b, the
    * target-vs-raw log-likelihood ratio
    *   λ_b = ilog2((t_b+1)·(R+B)) − ilog2((r_b+1)·(T+B))
    * (add-one smoothing; ilog2 = floor(log₂) via bit length — the
    * [[TextAnalysis.unigramLmScore]] integer-surprisal convention, so no
    * engine-dependent floating log anywhere), and per document
    *   dsir_bits = Σ_b c_b(doc)·λ_b,
    * positive ⇒ the doc's hashed unigram profile looks more like the
    * target (docs with y = 1) than the raw corpus — the paper's
    * importance weight, resolved to whole bits.
    *
    * Scale shape: bucket statistics = ONE token-explode aggregate with
    * map-side combine, output bounded by `buckets` (the model, not the
    * corpus), collected ONCE as two plan literals (t_b, r_b arrays); the
    * per-doc score re-explodes tokens and reduces on doc_id —
    * high-cardinality keys, map-side combined, no joins at all (bucket
    * stats are literals, the DSIR deployment shape: the hashed-ngram
    * model is tiny and ships with the job). */
  /** The trained DSIR model: per-bucket target counts `t`, raw counts
    * `r`, and their totals — everything the scoring pass needs, bounded
    * by `buckets` (collected from ONE distributed aggregate). */
  final case class DsirModel(t: Array[Long], r: Array[Long],
      bigT: Long, bigR: Long, buckets: Int)

  /** Train the hashed-unigram bucket statistics: one token-explode
    * aggregate, map-side combined, output and collect bounded by
    * `buckets`. */
  def dsirTrain(docs: DataFrame, buckets: Int = 64): DsirModel = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val stats = docs
      .select(col("y").cast("long").as("y"), explode(tokens(col("text"))).as("tok"))
      .select(col("y"), bucketOf(col("tok"), buckets).as("b"))
      .groupBy("b").agg(sum("y").as("t"), count(lit(1)).as("r"))
      .collect().map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getLong(2))))
      .toMap
    DsirModel(
      Array.tabulate(buckets)(i => stats.get(i).map(_._1).getOrElse(0L)),
      Array.tabulate(buckets)(i => stats.get(i).map(_._2).getOrElse(0L)),
      stats.valuesIterator.map(_._1).sum,
      stats.valuesIterator.map(_._2).sum,
      buckets)
  }

  private def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")

  /** λ for a bucket column under the model literals. */
  private def lamCol(b: Column, m: DsirModel): Column =
    ilog2((element_at(typedLit(m.t.toSeq), b.cast("int") + 1) + 1L) *
      lit(m.bigR + m.buckets)) -
      ilog2((element_at(typedLit(m.r.toSeq), b.cast("int") + 1) + 1L) *
        lit(m.bigT + m.buckets))

  /** Score per doc under a trained model: explode + one doc_id reduction
    * (high-cardinality key, map-side combined — the batch/relational
    * form). */
  def dsirScore(docs: DataFrame, m: DsirModel): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        lamCol(bucketOf(col("tok"), m.buckets), m).as("lam"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lam").as("dsir_bits"))
  }

  /** Train + score in one call (the registry key's form). */
  def dsirBits(docs: DataFrame, buckets: Int = 64): DataFrame =
    dsirScore(docs, dsirTrain(docs, buckets))

  /** INGEST-TIME twin of [[dsirScore]]: the per-doc sum folds over the
    * token array ROW-LOCALLY (aggregate HOF over the bucket-stat
    * literals) — zero explode, zero shuffle, so the importance weight is
    * available in the micro-batch that admits the document (the
    * [[TextAnalysis.repetitionInline]] discipline). Spec-pinned equal to
    * the batch form. */
  def dsirBitsInline(docs: DataFrame, m: DsirModel): DataFrame = {
    val toks = tokens(col("text"))
    docs.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("dsir_bits",
        aggregate(toks, lit(0L),
          (acc, tok) => acc + lamCol(bucketOf(tok, m.buckets), m)))
  }

  /** TOKEN-BUDGET selection: keep the best documents (quality proxy
    * descending, doc_id tiebreak) until the cumulative token count
    * reaches `num/den` of the corpus — "give me the top-quality X% of
    * tokens", the cut every scheduled data mix makes.
    *
    * A global running sum over a total order is the textbook scale trap
    * (one task). This is the BANDED shape: per-band token totals are one
    * bounded aggregate (output = |quality-value domain|, a model-sized
    * collect); the driver prefix-sums the band ladder and broadcasts each
    * surviving band's starting offset back; the intra-band running sum is
    * a window PARTITIONED by band — every band accumulates in parallel
    * and the global cumulative is prefix + intra. Identical output to the
    * single-order cumsum, no serial stage anywhere. */
  def selectTokenBudget(docs: DataFrame, num: Long = 6, den: Long = 10)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("tok_n"), col("n_chars"))
    val bands = d.groupBy("n_chars").agg(sum("tok_n").as("band_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val total = bands.map(_._2).sum
    val budget = total * num / den
    var acc = 0L
    val prefixes = bands.map { case (b, t) => val p = acc; acc += t; (b, p) }
      .filter(_._2 <= budget) // bands starting past the budget are pruned
    val spark = docs.sparkSession
    import spark.implicits._
    val prefixDf = broadcast(prefixes.toSeq.toDF("n_chars", "prefix"))
    val w = Window.partitionBy("n_chars").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(prefixDf, "n_chars")
      .withColumn("cum_tokens", col("prefix") + sum("tok_n").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("tok_n"), col("cum_tokens"))
      .orderBy("cum_tokens")
  }

  /** Deterministic systematic PPS (probability-proportional-to-size)
    * sampling: order documents by a 60-bit content-hash key (the repo's
    * md5-fold convention — a deterministic shuffle both engines replay
    * bit-equal), lay the k grid points (j + ½)·W/k over the cumulative
    * weight line W = Σw, and pick every document whose weight interval
    * contains a grid point. `hits` = contained grid points — exactly
    * ⌊w·k/W⌋ or ⌈w·k/W⌉ per doc, Σhits = k ALWAYS, inclusion probability
    * ∝ weight: the one-pass weighted sampler a mixture pipeline uses when
    * it needs an exact-size draw (rejection/temperature rates only hit
    * their target in expectation). Pure integer arithmetic — grid
    * membership is n(x) = ⌊(2xk + W) / 2W⌋, long-safe while 2·W·k < 2⁶³
    * (W < 4.6·10¹⁶ at k=100 — beyond a 100-TB character count; past that
    * the same formula moves to DECIMAL).
    *
    * Scale shape — the [[selectTokenBudget]] banded-prefix-sum discipline,
    * with hash-range bands instead of quality bands: per-band weight sums
    * are a 256-row aggregate (driver prefix + broadcast back), the
    * intra-band running sum is a window PARTITIONED by band, and the
    * global cumulative is prefix + intra. No single-ordered window, no
    * corpus-sized collect, one shuffle. */
  def ppsSample(docs: DataFrame, k: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    // 60-bit fold of md5 hex chars [1,16); band = top 8 bits — band order
    // IS hash order, so per-band offsets compose to the global prefix sum
    val h = graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 15)
    val base = docs.select(col("doc_id"), col("n_chars").as("w"), h.as("h"))
      .withColumn("bkt", (col("h") / (1L << 52)).cast("int"))
    val bands = base.groupBy("bkt").agg(sum("w").as("bw"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val wTot = bands.map(_._2).sum
    var acc = 0L
    val offsets = bands.map { case (b, t) => val p = acc; acc += t; (b, p) }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("bkt", "off"))
    val win = Window.partitionBy("bkt").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    require(wTot > 0, "ppsSample needs a positive total weight")
    base.join(offDf, "bkt")
      .withColumn("ci", col("off") + sum("w").over(win))
      // integer grid-point counts (div, not /: Spark's / on longs is double)
      .withColumn("hits",
        expr(s"(2 * ci * $k + $wTot) div ${2L * wTot} " +
          s"- (2 * (ci - w) * $k + $wTot) div ${2L * wTot}"))
      .filter(col("hits") > 0)
      .select(col("doc_id"), col("w").as("weight"), col("hits"))
  }

  /** Batch A-ES weighted reservoir (Efraimidis–Spirakis): top-k docs by
    * priority u^(1/w), u = (52-bit md5 fold + 1)/2⁵² — the EXACT doubles
    * [[graft.streaming.WeightedReservoirStream]] maintains online (same
    * JVM Math.pow over the same hash; parity is bitwise, spec-pinned).
    * Inclusion probability is proportional-to-weight without replacement;
    * where [[ppsSample]] is the exact-size SYSTEMATIC draw (integer, DuckDB
    * -replayable), A-ES is the MERGEABLE one — per-partition top-ks union
    * losslessly, which is also why it streams with O(k) state.
    *
    * Scale shape: one narrow projection + TakeOrderedAndProject (no global
    * sort — each partition ships k rows). */
  def weightedReservoir(docs: DataFrame, k: Int = 16,
      weightCol: String = "n_chars"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val u = (graft.functions.GraftFunctions.md5PrefixLong(
      col("doc_id").cast("string"), 1, 13)
      + 1).cast("double") / lit(4503599627370496L).cast("double")
    // strict_pow, not pow: Math.pow is 1-ulp-loose across JIT tiers; the
    // stream twin's byte-parity contract needs fdlibm on both sides
    val p = call_function("strict_pow", u,
      lit(1.0) / col(weightCol).cast("double"))
    val top = docs
      .select(col("doc_id"), col(weightCol).cast("long").as("weight"),
        p.as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("priority").desc, col("doc_id"))))
      .select("rank", "doc_id", "weight", "priority")
  }

  /** Poisson-bootstrap inverse-CDF thresholds for λ=1 on the 60-bit
    * uniform scale: t(j) = ⌊CDF(j)·2⁶⁰⌋ for j = 0..8 (mass beyond 8 is
    * 1.1e-6 — capped to 9). Computed ONCE here and inlined verbatim into
    * BOTH the Spark expression and the DuckDB oracle, so engine parity is
    * by construction, independent of floating-point quality. */
  val PoissonThresholds: IndexedSeq[Long] = {
    var term = math.exp(-1.0)
    var cum = 0.0
    (0 to 8).map { j =>
      cum += term
      term /= (j + 1).toDouble
      (cum * math.pow(2.0, 60)).toLong
    }
  }

  /** Deterministic Poisson bootstrap of the mean-n_chars statistic:
    * `reps` resamples where doc i's multiplicity in replicate b is
    * Poisson(1), inverse-CDF'd from the 60-bit md5 fold of "doc_id_b" —
    * the classic streaming bootstrap (Poisson counts ≈ multinomial
    * resampling, no global coordination), made replayable by hashing
    * instead of drawing. Output: the point estimate and the rank-⌊0.025B⌋
    * / rank-⌈0.975B⌉ replicate means — a 95% percentile-bootstrap CI, all
    * ⌊·10⁴⌋ integer.
    *
    * Scale shape: the B× row multiplication never moves data — the
    * explode is row-local and the per-replicate Σcx / Σc aggregate is
    * map-side partial, so the shuffle carries B·partitions partial rows,
    * not B·N. The final ranking windows over exactly B rows (bounded by
    * design). Long-safe while 10⁴·9·Σ n_chars < 2⁶³. */
  def bootstrapCi(docs: DataFrame, reps: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val t = PoissonThresholds
    val u = graft.functions.GraftFunctions.md5PrefixLong(
      concat(col("doc_id").cast("string"), lit("_"),
        col("b").cast("string")), 1, 15)
    val cCol = t.zipWithIndex.foldRight(lit(9): Column) {
      case ((thr, j), other) => when(col("u") < thr, j).otherwise(other)
    }.cast("long")
    val means = docs
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("u", u)
      .select(col("b"), col("n_chars"), cCol.as("c"))
      .groupBy("b")
      .agg(expr("10000 * sum(c * n_chars) div sum(c)").as("m"))
    val loRank = (25 * reps) / 1000   // ⌊0.025·B⌋, 1-indexed
    val hiRank = reps + 1 - loRank
    val ranked = means
      .withColumn("rn", row_number().over(Window.orderBy("m")))
    val ci = ranked.agg(
      max(when(col("rn") === loRank, col("m"))).as("lo_x10000"),
      max(when(col("rn") === hiRank, col("m"))).as("hi_x10000"))
    val point = docs.agg(
      expr("10000 * sum(n_chars) div count(*)").as("mean_x10000"))
    point.crossJoin(ci)
      .select(col("mean_x10000"), col("lo_x10000"), col("hi_x10000"),
        lit(reps.toLong).as("n_reps"))
  }
}
