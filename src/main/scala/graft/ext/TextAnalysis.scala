package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines — all
  * pure Catalyst column expressions (whole-stage codegen'd, no UDFs), and
  * all engineered for exact cross-engine determinism: integer arithmetic or
  * md5 digests, never order-sensitive float accumulation.
  */
object TextAnalysis {
  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish tokenization: word pieces + individual punctuation. */
  def reTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]")).cast("long")

  /** Flesch reading-ease readability, all-integer (×1000): syllables ≈
    * vowel groups over the whole lowercased text (whitespace breaks groups,
    * so this equals the per-word sum without any per-token loop), sentences
    * = sentence-final punctuation runs floored at 1. score_x1000 =
    * 206835 − 1015·⌊1000w/s⌋/1000 − 84600·⌊1000y/w⌋/1000 with pinned
    * floor order — replayable bit-equal in any engine. A curation signal
    * (too-easy ≈ boilerplate/lists, too-hard ≈ OCR noise/code) computed in
    * three regexp_counts: one narrow row-local projection, no shuffle, no
    * token fan-out. */
  def readability(docs: DataFrame): DataFrame = {
    val words = size(tokens(col("text"))).cast("long")
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val syllables = regexp_count(lower(col("text")), lit("[aeiouy]+"))
      .cast("long")
    docs.select(col("doc_id"), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("flesch_x1000",
        expr("206835 - 1015 * (1000 * words div sentences) div 1000" +
          " - 84600 * (1000 * syllables div words) div 1000"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): 5-token grams hashed to 40 bits
    * (md5 prefix fold), a w=4 sliding window over the gram-hash sequence,
    * per window the MINIMUM hash selected with the RIGHTMOST-occurrence
    * tie-break, selections deduplicated. Guarantees every shared token run
    * of length ≥ w+k-1 = 8 contributes at least one common fingerprint,
    * while keeping only ~2/(w+1) of the grams — the sampled-but-guaranteed
    * middle ground between full shingle sets (dedup_ngram_jaccard) and a
    * single whole-doc hash (text_fingerprint).
    *
    * Shape: posexplode (a Generate — no array indexed from a lambda, see
    * PLANS.md's interpreted-HOF trap), grams via window `lead`s, the
    * window minimum via a doc-partitioned ROWS frame; both window passes
    * and the final groupBy share the doc_id partitioning, so the whole
    * operator costs ONE token-stream shuffle. Tie-break packs (hash, pos)
    * into one long: h·2²⁰ + (2²⁰−1−pos) — larger pos ⇒ smaller packed
    * value among equal hashes; documents are capped at 2²⁰ grams (a 1M-
    * token doc is a pathology upstream length filters remove first). */
  /** The selected (gram-hash, position) pairs — winnowing's raw output,
    * exposed so the detection guarantee is spec-checkable: a shared token
    * run of ≥ 8 selects at least one common HASH in both docs. */
  def winnowingSelections(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val byDoc = Window.partitionBy("doc_id")
    val seq = byDoc.orderBy("pos")
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val grams = toks
      .withColumn("n_toks", count(lit(1)).over(byDoc))
      .withColumn("gram", concat_ws(" ", col("tok"),
        lead("tok", 1).over(seq), lead("tok", 2).over(seq),
        lead("tok", 3).over(seq), lead("tok", 4).over(seq)))
      .filter(col("pos") <= col("n_toks") - 5)
      .select(col("doc_id"), (col("pos") + 1).as("pos1"),
        (col("n_toks") - 4).as("n_grams"),
        graft.functions.GraftFunctions.md5PrefixLong(col("gram"), 1, 10).as("h"))
    grams
      .withColumn("fp", min(col("h") * lit(1048576L) +
          (lit(1048575L) - col("pos1")))
        .over(Window.partitionBy("doc_id").orderBy("pos1")
          .rowsBetween(Window.currentRow, 3)))
      .filter(col("pos1") <= col("n_grams") - 3)
      .select(col("doc_id"), col("n_grams"),
        // integer div, NOT `/`: fp reaches 2^60 and a double round-trip
        // would corrupt the low bits the position lives in
        expr("fp div 1048576L").as("h"),
        expr("1048575L - fp % 1048576L").as("sel_pos"))
      .distinct()
  }

  def winnowingFingerprints(docs: DataFrame): DataFrame =
    winnowingSelections(docs).groupBy("doc_id")
      .agg(max("n_grams").as("n_grams"),
        count(lit(1)).as("n_fp"),
        // the cross-doc-comparable fingerprint SET is the hashes alone —
        // positions located the selections but never enter the digest
        md5(expr("array_join(transform(array_sort(array_distinct(" +
          "collect_list(h))), x -> cast(x as string)), ',')"))
          .as("fp_digest"))

  /** k-token shingles (default 3); empty array when the doc has fewer
    * than k tokens. */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))

  /** Document fingerprint: minimum md5 over the k=3 shingle set (a 1-hash
    * MinHash — winnowing-style representative). Null for docs under 3 tokens.
    */
  def fingerprint(toks: Column): Column = array_min(transform(shingles(toks), sh => md5(sh)))

  /** 16-bit polynomial rolling hash of a token: fold acc*31+codepoint
    * mod 2^16. Integer-exact in any engine (the basis for [[simhash16]]);
    * runs in the codegen'd [[graft.functions.PolyHash16]] expression. */
  def polyHash16(tok: Column): Column = call_function("poly_hash16", tok)

  /** Interpreted built-in-functions form, kept as the cross-check reference
    * for [[polyHash16]]. */
  def polyHash16Fold(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)), i => ascii(substr(tok, i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 65536)

  /** 16-bit SimHash over the token multiset: per-bit majority vote of token
    * hashes. Near-duplicate docs land at small Hamming distance. */
  def simhash16(toks: Column): Column = {
    val hs = transform(toks, t => polyHash16(t))
    (0 until 16).map { j =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // ---- relational forms -------------------------------------------------
  // Nested higher-order functions re-evaluate their (inlined) inputs per
  // lambda iteration in interpreted eval — an O(seeds × shingles × tokens)
  // blowup. The flows below explode ONCE and aggregate, which is also the
  // shape that scales: narrow passes + a single doc_id-partitioned
  // window/groupBy (the groupBy reuses the window's partitioning — one
  // shuffle total).

  /** (doc_id, pos, tok) rows — the split runs once per document. */
  def tokenRows(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")

  /** (doc_id, shingle) k=3 shingle rows, built NARROWLY: the row-local
    * [[shingles]] array is exploded in place — token adjacency never leaves
    * the row, so the tokenized corpus (the largest intermediate in the dedup
    * pipeline) never shuffles. The earlier window-lead formulation shuffled
    * every (doc_id, pos, tok) row just to rebuild adjacency the row already
    * had; with this shape the downstream signature groupBy's map-side
    * partial min is the ONLY exchange, carrying |docs|·n rows. */
  def shingleRows(corpus: DataFrame, k: Int = 3): DataFrame =
    // tokens materialize as an ATTRIBUTE before the shingle lambda: inlining
    // the split into the higher-order function would re-run it per element
    // access in interpreted HOF eval (the O(shingles × tokens) blowup this
    // section's comment describes — measured 2.2× on the whole minhash key).
    // CollapseProject keeps the two projections separate because split is
    // not duplicable-cheap.
    corpus.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingles(col("toks"), k)).as("shingle"))

  /** Modulus for the Kirsch-Mitzenmacher hash family (fits i·h2m in a long). */
  val MinhashP = 1000000007L

  /** MinHash signature columns h0..h{n-1} via the Kirsch-Mitzenmacher
    * 2-hash family: ONE md5 per shingle split into two 60-bit halves
    * (h1, h2), seed-i hash = (h1 + i·h2) mod p — 16× less hashing than
    * md5-per-seed with equivalent MinHash quality. One aggregation over the
    * shingle rows; integer arithmetic keeps the DuckDB oracle exact. */
  def minhashSignatureRows(corpus: DataFrame, n: Int): DataFrame = {
    // the codegen'd row-local expression (bit-equal to the explode+agg
    // reference chain below, cross-checked in ExtSpec/NearDupStreamSpec):
    // zero shingle-row materialization, zero doc_id exchange — the whole
    // signature is a narrow projection, so every LSH consumer
    // (bandBuckets → all dedup_* keys) loses one shuffle and the explode
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val sig = call_function("minhash_sig", col("text"), lit(n))
    corpus
      .select(col("doc_id"), sig.as("sig"))
      .filter(col("sig").isNotNull) // <3 tokens = no shingles = no row (agg parity)
      .select(col("doc_id") +:
        (0 until n).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)
  }

  /** The explode+agg reference chain for [[minhashSignatureRows]] — kept
    * as the independent implementation the parity specs compare the
    * expression against (and as the shape the DuckDB oracle mirrors). */
  def minhashSignatureRowsAgg(corpus: DataFrame, n: Int): DataFrame = {
    val hx = md5(col("shingle"))
    val h1m = conv(substring(hx, 1, 15), 16, 10).cast("long") % MinhashP
    val h2m = conv(substring(hx, 17, 15), 16, 10).cast("long") % MinhashP
    val hashed = shingleRows(corpus)
      .select(col("doc_id"), h1m.as("h1m"), h2m.as("h2m"))
    val aggs = (0 until n).map(i =>
      min((col("h1m") + lit(i.toLong) * col("h2m")) % MinhashP).as(s"h$i"))
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, simhash) via one aggregation of per-token votes. Same values
    * as [[simhash16]]. */
  def simhash16Rows(corpus: DataFrame): DataFrame = {
    val hs = tokenRows(corpus).select(col("doc_id"), polyHash16(col("tok")).as("h"))
    val votes = (0 until 16).map(j =>
      sum((shiftright(col("h"), j) % 2) * 2 - 1).as(s"v$j"))
    hs.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** (doc_id, fp) min-shingle-md5 fingerprints: a pure row-local projection
    * of [[fingerprint]] — zero shuffles, zero joins. Docs under 3 tokens get
    * a NULL fp (`array_min` of the empty shingle array). */
  def fingerprintRows(corpus: DataFrame): DataFrame =
    // same attribute-materialization as [[shingleRows]] — and the shingle
    // array too, since the md5 map re-evaluates ITS input per element
    corpus.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sg"))
      .select(col("doc_id"),
        array_min(transform(col("sg"), sh => md5(sh))).as("fp"))

  /** Sequence packing: assign documents to fixed token-budget bins — the
    * step that turns a cleaned corpus into context-window-sized training
    * rows. Greedy in doc_id order WITHIN a shard: a document is assigned
    * to the bin its START offset (running token total before it) falls
    * in — documents straddle bin boundaries, as in packed pretraining
    * where the token stream is cut into fixed windows.
    *
    * Scale note: packing is inherently order-dependent, so a window is the
    * RIGHT tool here — but partitioned by `shard` (doc_id mod `shards`),
    * never global: each shard packs independently and parallelism equals
    * `shards`, a knob that scales with the cluster (a global
    * orderBy-cumsum would funnel the corpus into one task). Bin ids are
    * (shard, bin) pairs; exact within-shard determinism by doc_id order. */
  def packBins(docs: DataFrame, budgetTokens: Long, shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    docs
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bin",
        ((sum(col("n_tokens")).over(w) - col("n_tokens")) / budgetTokens)
          .cast("long"))
  }

  /** Content-addressed train/val/test split: bucket = first 8 hex digits of
    * md5(text) mod 100. Hashing the CONTENT (not the id) pins byte-identical
    * documents to the same split — the standard defense against train/test
    * leakage through duplicates — and the assignment is stable under
    * re-sharding, re-ingestion, and id reassignment. Narrow, no shuffle. */
  /** 0–99 bucket from a hex content hash: first 8 hex digits mod 100 —
    * THE content-addressing fold shared by [[hashSplit]],
    * [[stratifiedSample]], and the pipeline's split stage (one definition
    * so the paths can never diverge on identical bytes). */
  def contentBucket(hexHash: Column): Column =
    conv(substring(hexHash, 1, 8), 16, 10).cast("long") % 100

  /** train/val/test label for a [[contentBucket]] value. */
  def splitFor(bucket: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  def hashSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = contentBucket(md5(col("text")))
    docs.select(col("doc_id"), bucket.as("bucket"),
      splitFor(bucket, trainPct, valPct).as("split"))
  }

  /** Deterministic stratified sampling: per-language keep rates over a
    * content-hash bucket (same fold as [[hashSplit]]). Content addressing
    * makes the sample stable under re-sharding and pins byte-identical
    * documents to the same keep/drop decision; per-stratum rates are the
    * standard data-mixture lever (e.g. downsample the dominant language).
    * Narrow single pass, no shuffle, any corpus size. */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
      defaultRate: Int): DataFrame = {
    val bucket = contentBucket(md5(col("text")))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, r).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
  }

  /** Temperature-based mixture sampling (the mT5 / multilingual-T5 α=0.5
    * rate flattening, arXiv:2010.11934 §3.1): per-domain keep rate chosen
    * so the SAMPLED counts go as √(domain count) — large domains
    * down-sampled toward the small ones:
    *   rate_x10000(d) = ⌊10000·⌊√(c_min·c_d)⌋ / c_d⌋
    * (so kept_d ≈ √c_min·√c_d; the smallest domain keeps everything).
    * The per-doc decision is the same content-hash bucket as
    * [[stratifiedSample]] — stable under re-sharding, byte-identical docs
    * decide identically (leakage-safe).
    *
    * Scale shape: domain counts = ONE bounded aggregate (|domains| rows,
    * collected); rates return as a literal CASE chain; the keep decision
    * is a narrow row-local filter — no join, no shuffle, any corpus size.
    *
    * Engine parity: the inner isqrt is floor(IEEE sqrt) in BOTH engines
    * (Math.sqrt and DuckDB sqrt are correctly rounded, identical bits);
    * exact for products < 2⁴⁴ — far beyond any real domain-count product
    * divided at this scale factor, and at 100 TB the counts would move to
    * exact BigInt isqrt on the driver with the same contract. */
  def temperatureSample(docs: DataFrame, domainCol: String = "lang"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cmin = counts.values.min
    val rates = counts.map { case (d, c) =>
      d -> 10000L * math.floor(math.sqrt((cmin * c).toDouble)).toLong / c }
    val rate = rates.foldLeft(lit(0L)) { case (acc, (d, r)) =>
      when(col(domainCol) === d, r).otherwise(acc) }
    val bucket =
      graft.functions.GraftFunctions.md5PrefixLong(col("text"), 1, 8) % 10000
    docs.select(col("doc_id"), col(domainCol), bucket.as("bucket"),
        rate.as("rate_x10000"))
      .filter(col("bucket") < col("rate_x10000"))
  }

  /** Vocabulary building: token → frequency, top `k` by count with a
    * deterministic token tie-break. Map-side partial agg + one token-key
    * shuffle; the top-k is TakeOrderedAndProject (no global sort) — the
    * exact shape this takes over a 100 TB corpus. */
  def vocabTopK(corpus: DataFrame, k: Int = 100): DataFrame =
    tokenRows(corpus)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)

  /** Marker-token language id (n-gram heuristic floor): deterministic and
    * cheap; a real model slots into the same column contract. */
  def langId(text: Column): Column = {
    val en = regexp_count(text, lit("\\bthe\\b")) + regexp_count(text, lit("\\band\\b"))
    when(en > 0, lit("en")).otherwise(lit("und"))
  }

  /** Gopher-style corpus quality gate over [[qualityCols]] + the corpus
    * language label: each document gets the FIRST failing rule as its drop
    * `reason` (null = kept), so the output doubles as a filter audit — the
    * shape a production data pipeline keeps for ablations. One narrow pass,
    * no shuffle, pure Catalyst. */
  def qualityFilter(docs: DataFrame): DataFrame = {
    val q = docs.select(
      col("doc_id") +: col("lang") +: qualityCols(col("text")): _*)
    q.select(col("doc_id"), col("words"), col("avg_wlen_x100"),
        col("stop_x10000"), col("punct_x10000"),
        when(col("words") < 25, "too_short")
          .when(col("words") > 5000, "too_long")
          .when(col("avg_wlen_x100") < 380 || col("avg_wlen_x100") > 1200, "word_length")
          .when(col("stop_x10000") < 400, "low_stopword")
          .when(col("punct_x10000") > 120, "high_punct")
          .when(col("lang") =!= "en", "non_english")
          .otherwise(lit(null).cast("string")).as("reason"))
      .withColumn("keep", col("reason").isNull)
  }

  /** Quality stats, all integer or scaled-integer (floor) for exactness:
    * word count, avg word length ×100, stopword ratio ×10000, punctuation
    * ratio ×10000. */
  def qualityCols(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val words = size(toks).cast("long")
    val charsNoWs = length(regexp_replace(text, "\\s+", "")).cast("long")
    val stops = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is"))).cast("long")
    val punct = regexp_count(text, lit("[^\\w\\s]")).cast("long")
    Seq(
      words.as("words"),
      (lit(100L) * charsNoWs / words).cast("long").as("avg_wlen_x100"),
      (lit(10000L) * stops / words).cast("long").as("stop_x10000"),
      (lit(10000L) * punct / length(text).cast("long")).cast("long").as("punct_x10000"))
  }

  /** Gopher-style intra-document repetition statistics (the MassiveText
    * repetition filters): per document,
    *   - `dup3_x10000` — fraction of word-3-gram OCCURRENCES whose gram
    *     appears more than once in the SAME document,
    *   - `top2_x10000` — share of all word-2-gram occurrences taken by the
    *     single most frequent 2-gram.
    * High values flag boilerplate/spam/self-repeating text that
    * whole-document dedup cannot catch. All-integer (scaled ×10000).
    *
    * Scale shape: n-gram arrays build ROW-LOCALLY ([[Contamination.ngramsInline]]
    * — token adjacency never leaves the row, no token-stream shuffle),
    * explode once, then reduce (doc_id, gram) → doc_id: both shuffle keys
    * are high-cardinality with map-side partial aggregation, so no
    * per-group funnel exists at any corpus size. Documents too short for
    * an n-gram are restored by the left joins with zeroed stats. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    def gramCounts(n: Int) = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(Contamination.ngramsInline(col("toks"), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val s3 = gramCounts(3).groupBy("doc_id").agg(
      sum("c").as("grams3"),
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup3"))
    val s2 = gramCounts(2).groupBy("doc_id").agg(
      sum("c").as("grams2"), max("c").as("top2"))
    docs.select("doc_id")
      .join(s3, Seq("doc_id"), "left")
      .join(s2, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("grams3"), lit(0L)).as("grams3"),
        coalesce((lit(10000L) * col("dup3") / col("grams3")).cast("long"),
          lit(0L)).as("dup3_x10000"),
        coalesce((lit(10000L) * col("top2") / col("grams2")).cast("long"),
          lit(0L)).as("top2_x10000"))
  }

  /** Ingest-time repetition stats: the ROW-LOCAL twin of
    * [[repetitionStats]] — identical values, zero shuffle and zero state,
    * so the gate runs inside the admitting micro-batch (the same
    * streaming-admission contract as
    * [[Contamination.flagContaminated]]). Duplicate counting works on the
    * SORTED gram array: every occurrence of a gram with count > 1 has an
    * equal neighbor there, and the top-2-gram occupancy is the longest
    * run. Input columns pass through untouched. */
  def repetitionInline(docs: DataFrame): DataFrame = {
    val tc = "__graft_rep_toks"
    val a3 = "__graft_rep_g3"
    val a2 = "__graft_rep_g2"
    def dupCount(g: Column): Column = {
      val n = size(g)
      // sequence(1, 0) would generate a DESCENDING range — guard empties
      when(n === 0, lit(0L)).otherwise(
        size(filter(transform(sequence(lit(1), n), i =>
          (i > lit(1) && element_at(g, i) === element_at(g, i - 1)) ||
            (i < n && element_at(g, i) === element_at(g, i + 1))),
          b => b)).cast("long"))
    }
    def maxRun(g: Column): Column =
      aggregate(g,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    val passThrough = docs.columns.map(col).toSeq
    docs
      .withColumn(tc, tokens(col("text")))
      .withColumn(a3, array_sort(Contamination.ngramsInline(col(tc), 3)))
      .withColumn(a2, array_sort(Contamination.ngramsInline(col(tc), 2)))
      .select(passThrough ++ Seq(
        size(col(a3)).cast("long").as("grams3"),
        when(size(col(a3)) === 0, lit(0L))
          .otherwise((lit(10000L) * dupCount(col(a3)) / size(col(a3)))
            .cast("long")).as("dup3_x10000"),
        when(size(col(a2)) === 0, lit(0L))
          .otherwise((lit(10000L) * maxRun(col(a2)) / size(col(a2)))
            .cast("long")).as("top2_x10000")): _*)
  }

  /** Unigram-LM quality scoring (the CCNet-style perplexity proxy): train a
    * unigram model ON the corpus (token → count, one map-side-combined
    * token shuffle), then score each document by its mean per-token
    * surprisal. Surprisal is INTEGER bits — ilog2(total) − ilog2(count)
    * where ilog2(x) = length(bin(x)) − 1 — so the score is exact in any
    * engine (no float log, no order-sensitive accumulation). Low scores =
    * high-probability (common-token) text; high scores = rare-token text.
    * Output: (doc_id, n_tokens, surprisal_x100 = mean bits ×100).
    *
    * Scale shape: the vocab is NOT collected — scoring joins token rows to
    * the count table on `tok` (both sides hash-partitioned on the same
    * high-cardinality key; Catalyst reuses the agg exchange), then one
    * doc_id reduction. Three shuffles total, all map-side combined, no
    * driver state — the vocab can be billions of rows. */
  def unigramLmScore(corpus: DataFrame): DataFrame = {
    val toks = tokenRows(corpus).select("doc_id", "tok")
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("t"))
    def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), (ilog2(col("t")) - ilog2(col("c"))).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (lit(100L) * sum("bits") / count(lit(1))).cast("long").as("surprisal_x100"))
  }

  /** Corpus-trained BIGRAM-LM quality scoring — the contextual upgrade of
    * [[unigramLmScore]] (CCNet ships a 5-gram KenLM; a corpus-trained
    * bigram MLE is the Spark-first stand-in): per-bigram surprisal of
    * w₂ given w₁ in EXACT integer bits, ilog2(c₁(w₁)) − ilog2(c₂(w₁,w₂)),
    * where c₁ counts w₁'s occurrences as a bigram LEFT (so the MLE is
    * self-consistent: Σ_w₂ c₂/c₁ = 1), averaged per doc ×100. Docs with
    * fewer than 2 tokens have no bigrams and no row.
    *
    * Scale shape: bigram adjacency is built ROW-LOCALLY (element_at pairs
    * over the token array, exploded in place — the token stream never
    * shuffles to rebuild adjacency); then (w₁,w₂) counts, w₁ counts, the
    * count joins, and one doc_id reduction — every shuffle key
    * high-cardinality and map-side combined, the [[tfidfTopK]] discipline.
    * The bigram table is never collected. */
  def bigramLmScore(corpus: DataFrame): DataFrame = {
    def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    val t = col("t")
    val prs = when(size(t) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1), i =>
        struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
    val pairs = corpus.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(prs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), (ilog2(col("c1")) - ilog2(col("c2"))).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (lit(100L) * sum("bits") / count(lit(1))).cast("long").as("surprisal_x100"))
  }

  /** Exact global "keep the best `pct`%" selection by quality score
    * WITHOUT a global sort — the CCNet-style head-of-corpus cut done
    * scale-correctly: the score is a BOUNDED INTEGER
    * ([[unigramLmScore]]'s surprisal_x100, domain ≤ 100·log₂(corpus
    * tokens) ≈ a few thousand distinct values), so its histogram is a
    * map-side-combined aggregate of |distinct scores| rows — bounded by
    * the score DOMAIN, not the corpus — collected once and scanned
    * cumulatively on the driver; the resulting threshold returns to the
    * plan as a literal for a narrow filter. (An orderBy + limit(p·N)
    * would be a full global sort of N rows; a per-partition window would
    * be wrong.)
    *
    * Threshold-inclusive contract (deterministic, both engines): keep
    * score ≤ thr where thr is the smallest score whose cumulative count
    * reaches ceil(p·N/100) — the whole boundary bucket keeps, so output
    * may exceed p·N by at most that bucket (the documented trade vs a
    * doc-id tiebreak, which would force the global sort back). Lower
    * surprisal = more fluent under the corpus LM = kept first. */
  def selectTopQuality(corpus: DataFrame, pct: Int): DataFrame = {
    val scored = unigramLmScore(corpus)
    val hist = scored.groupBy("surprisal_x100").agg(count(lit(1)).as("c"))
      .orderBy("surprisal_x100")
      .collect() // bounded by the score domain (index-construction collect)
    val n = hist.iterator.map(_.getLong(1)).sum
    val target = (n * pct + 99) / 100
    var cum = 0L
    var thr = Long.MaxValue
    val it = hist.iterator
    while (cum < target && it.hasNext) {
      val r = it.next(); cum += r.getLong(1); thr = r.getLong(0)
    }
    scored.filter(col("surprisal_x100") <= thr)
      .select("doc_id", "n_tokens", "surprisal_x100")
  }

  /** Count-Min-sketch heavy hitters: estimate token frequencies from a
    * d×w integer sketch (d Kirsch-Mitzenmacher hash rows over the same
    * md5-split family as MinHash) and report the top-N exact tokens with
    * their sketch estimates — the one-pass bounded-memory frequency
    * structure a 100 TB pipeline keeps when the exact vocab is too large,
    * shown here against exact counts so over-estimation is observable.
    * All integer arithmetic: the sketch itself is oracle-exact.
    *
    * Scale shape: the sketch build is d rows per token reduced by a
    * map-side-combined groupBy onto ≤ d·w cells — each partition emits at
    * most d·w rows no matter how many tokens it holds; the estimate join
    * broadcasts the tiny sketch. (The exact top-N here exists only as the
    * comparison baseline; a production use keeps just the sketch.) */
  def cmsHeavyHitters(corpus: DataFrame, d: Int = 4, w: Int = 64,
      topN: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    def h1(tok: Column): Column =
      graft.functions.GraftFunctions.md5PrefixLong(tok, 1, 15) % MinhashP
    def h2(tok: Column): Column =
      graft.functions.GraftFunctions.md5PrefixLong(tok, 17, 15) % MinhashP
    def cells(tok: Column): Column =
      transform(sequence(lit(0), lit(d - 1)), i =>
        struct(i.cast("long").as("r"),
          ((h1(tok) + i * h2(tok)) % MinhashP % w).as("b")))
    val toks = tokenRows(corpus).select("tok")
    val sketch = toks
      .select(col("tok"))
      .select(explode(cells(col("tok"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(desc("exact"), asc("tok")).limit(topN)
    top
      .select(col("tok"), col("exact"), explode(cells(col("tok"))).as("rb"))
      .select(col("tok"), col("exact"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy("tok", "exact")
      .agg(min("c").as("cms_estimate"))
  }

  /** HyperLogLog distinct-token estimate (Flajolet et al. 2007) next to
    * the exact count — the other bounded-memory sketch a 100 TB pipeline
    * keeps (CMS answers "how often", HLL answers "how many distinct"
    * in m integers). Deliberately built from oracle-mirrorable primitives
    * instead of Spark's opaque `approx_count_distinct` binary sketch:
    *   - 60-bit md5 hash (the established `conv(substring(md5…))` family);
    *   - bucket = h mod m, rank = leading-zero count of the remaining
    *     54 bits + 1, capped at 50 so 2^(50−rank) stays an exact BIGINT;
    *   - registers = max rank per bucket; the harmonic sum
    *     Σ 2^(−M_j) is computed as the exact integer Σ 2^(50−M_j)
    *     (order-free — no float accumulation), empty buckets contributing
    *     2^50; only the final α·m²/S division is floating point, in ONE
    *     pinned expression shape both engines evaluate identically.
    *
    * Scale shape: one map-side-combined groupBy onto ≤ m register cells
    * (each partition emits at most m rows regardless of token count), one
    * bounded agg over the registers. The exact distinct count exists only
    * as the comparison baseline — production keeps the m-integer sketch.
    * The sketched universe is distinct 3-gram SHINGLES, not tokens: a
    * synthetic vocabulary is a few dozen words (HLL's small-range regime,
    * where raw estimates need the linear-counting correction — whose ln()
    * is not bit-pinned across engines), while shingles put the corpus in
    * the asymptotic regime the raw estimator is built for — and "how many
    * distinct n-grams" is the question a contamination/novelty pipeline
    * actually asks at 100 TB.
    * Output: one row (m, exact_distinct, hll_est, err_x10000). */
  def hllDistinct(corpus: DataFrame, p: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val m = 1 << p
    val h = graft.functions.GraftFunctions.md5PrefixLong(col("shingle"), 1, 15)
    val toks = shingleRows(corpus).select(col("shingle"))
    val hashed = toks.select((h % m).as("bucket"), (h / m).cast("long").as("rest"))
    val rank = least(lit(50),
      lit(55) - when(col("rest") === 0, lit(0)).otherwise(length(bin(col("rest")))))
    val regs = hashed.select(col("bucket"), rank.as("rank"))
      .groupBy("bucket").agg(max("rank").as("reg"))
    val sums = regs.agg(
      sum(expr("shiftleft(1L, cast(50 - reg as int))")).as("s_present"),
      count(lit(1)).as("nb"))
    val exact = toks.agg(countDistinct(col("shingle")).as("exact_distinct"))
    // α₆₄ = 0.709; est = α·m²·2⁵⁰ / S — the multiplication chain is written
    // identically in the oracle so the doubles match bit for bit
    val s = (col("s_present") + (lit(m.toLong) - col("nb")) * lit(1L << 50)).as("s")
    val est = (lit(0.709) * lit((m.toLong * m).toDouble) * lit((1L << 50).toDouble) /
      col("s").cast("double")).as("hll_est")
    sums.select(s).crossJoin(exact)
      .select(lit(m.toLong).as("m"), col("exact_distinct"), est)
      .withColumn("err_x10000",
        floor(lit(10000.0) * abs(col("hll_est") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).cast("long"))
  }

  /** TF-IDF keyword extraction: top-k terms per document by
    * tf · idf_bits, where idf_bits = ilog2(N) − ilog2(df) — the integer
    * surprisal trick of [[unigramLmScore]] applied to document frequency,
    * so scores are exact in any engine. Ranking runs through the BOUNDED
    * `topk_pairs` partial/final aggregate (terms keyed by a 60-bit md5
    * prefix, ties to the lower key both sides), never a per-doc window;
    * the term dictionary joins back on the same key. Shuffles: (doc, tok)
    * tf, tok df, doc top-k, tok_id dictionary join — all high-cardinality,
    * map-side combined. */
  def tfidfTopK(corpus: DataFrame, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    // COLLISION ASSUMPTION: two distinct tokens sharing a 60-bit md5 prefix
    // (P ≈ |vocab|²·2⁻⁶¹) would merge in topk_pairs and duplicate dict
    // join-back rows; accepted at ~2⁻⁶⁰ per pair — full-digest keying would
    // cost a string (not long) ranking key in the bounded aggregate.
    def tokId(tok: Column): Column =
      graft.functions.GraftFunctions.md5PrefixLong(tok, 1, 15)
    val tf = tokenRows(corpus).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = corpus.select(countDistinct(col("doc_id")).as("n"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        (col("tf") * (ilog2(col("n")) - ilog2(col("df")))).as("score"),
        tokId(col("tok")).as("tok_id"))
    val top = scored.groupBy("doc_id")
      .agg(call_function("topk_pairs",
        col("tok_id"), col("score").cast("double"), lit(k), lit(false)).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.n_id").as("tok_id"), col("col.score").cast("long").as("score"))
    val dict = dfreq.select(col("tok"), tokId(col("tok")).as("tok_id"))
    top.join(dict, "tok_id")
      .select(col("doc_id"), col("rank"), col("tok"), col("score"))
  }

  /** Data-mixture rebalancing to TARGET proportions (the static-mixture
    * lever of DoReMi/palm-style pipelines): given per-stratum target
    * weights (percent) and a total token budget, compute each stratum's
    * keep-rate = min(100%, budget·weight / stratum_tokens) and sample by
    * the content-hash bucket (same fold as [[hashSplit]] — byte-identical
    * docs share one decision; stable under re-sharding). Strata with fewer
    * tokens than their allocation keep everything (rate capped at 100%) —
    * the standard behavior when a minority language can't fill its quota.
    * Output keeps the audit columns (stratum totals and applied rate).
    *
    * Scale shape: stratum totals are ONE partial-aggregated groupBy on the
    * (low-cardinality, but map-side combined) stratum key; the tiny rate
    * table broadcast-joins back; the keep decision is a narrow filter. No
    * per-group window, no driver collect. */
  def mixToTargets(docs: DataFrame, targetsPct: Map[String, Int],
      budgetTokens: Long): DataFrame = {
    val withTok = docs.select(col("doc_id"), col("lang"), col("text"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val targets = targetsPct.foldLeft(lit(0L)) { case (acc, (lang, w)) =>
      when(col("lang") === lang, w.toLong).otherwise(acc)
    }
    val rates = withTok.groupBy("lang")
      .agg(sum("n_tokens").as("stratum_tokens"))
      .select(col("lang"), col("stratum_tokens"),
        // budget·weightPct/100 tokens wanted, ×10000 scale → ×100 combined
        least(lit(10000L),
          (lit(budgetTokens) * targets * 100L / col("stratum_tokens"))
            .cast("long")).as("rate_x10000"))
    withTok
      .join(broadcast(rates), "lang")
      .filter(contentBucket(md5(col("text"))) * 100L < col("rate_x10000"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("stratum_tokens"), col("rate_x10000"))
  }

  /** PII categories as (name, pattern, replacement) — the regex subset
    * every curation pipeline scrubs before training (emails, US-style
    * SSNs/phones, IPv4). Patterns stay inside the Java-regex ∩ RE2 common
    * dialect so the DuckDB oracle replays them verbatim; categories are
    * constructed non-overlapping (an SSN's 3-2-4 digit grouping cannot
    * match the 3-3-4 phone pattern and vice versa), so counting on the
    * original text and replacing sequentially agree. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssns", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phones", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("ips", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** PII redaction report: per-category match counts on the ORIGINAL text
    * plus the digest of the sequentially-redacted text. A pure row-local
    * projection — streaming-append-safe by construction (the
    * [[Contamination.flagContaminated]] contract), zero shuffle at any
    * corpus size. */
  def redactPii(docs: DataFrame): DataFrame = {
    val counts = PiiPatterns.map { case (n, p, _) =>
      regexp_count(col("text"), lit(p)).cast("long").as(n)
    }
    val redacted = PiiPatterns.foldLeft(col("text")) {
      case (c, (_, p, r)) => regexp_replace(c, p, r)
    }
    docs.select(col("doc_id") +: counts :+ md5(redacted).as("redacted_md5"): _*)
  }

  /** Overlapping fixed-size token windows — the chunking step feeding an
    * embedding/retrieval pipeline (context windows of `window` tokens at
    * `stride`; trailing partial chunks kept). ROW-LOCAL: the chunk array
    * builds inside the row ([[Dedup.spanDupStats]]'s span machinery) and
    * explodes in place — token adjacency never shuffles, fan-out is
    * ⌈tokens/stride⌉ rows per doc. */
  def chunkDocs(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    val toks = col("toks")
    val chunks = when(size(toks) === 0, array().cast("array<array<string>>"))
      .otherwise(transform(
        sequence(lit(0), ((size(toks) - 1) / stride).cast("int")),
        s => slice(toks, s * stride + 1, lit(window))))
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(chunks))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("col"))).as("chunk_md5"))
  }

  /** Corpus-wide line-level exact dedup — the C4 discipline (Raffel et al.
    * 2020 §2.2: "we discarded all but one of any three-sentence span
    * occurring more than once", applied at the line granularity RefinedWeb
    * and Dolma ship): every duplicated LINE keeps only its first occurrence
    * (min doc_id, then min line_no) across the whole corpus, and each
    * document is re-assembled from its surviving lines. Catches the
    * boilerplate whole-document dedup cannot — navigation footers, cookie
    * banners, license headers repeated across otherwise-distinct pages.
    *
    * Output: one row per document — `(doc_id, lines_total, lines_kept,
    * clean_text)`; `clean_text` is the kept lines re-joined in original
    * order ('' when every line was a later duplicate).
    *
    * Scale shape: the line fan-out is row-local (posexplode of a split —
    * no shuffle); the canonical map is ONE map-side-combined min(struct)
    * aggregation on the high-cardinality line-hash key; the disposition
    * join shuffles on the same key; re-assembly is one doc_id shuffle
    * whose groups are doc-bounded (a document's own line count), so no
    * per-group funnel exists at any corpus size. Nothing is collected,
    * nothing is windowed. */
  def lineDedup(docs: DataFrame): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("pos").cast("long").as("line_no"),
        col("col").as("line"), md5(col("col")).as("lk"))
    val canon = lines.groupBy("lk")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("c"))
      .select(col("lk"), col("c.doc_id").as("canon_doc"),
        col("c.line_no").as("canon_line"))
    lines.join(canon, "lk")
      .select(col("doc_id"), col("line_no"), col("line"),
        (col("doc_id") === col("canon_doc") &&
          col("line_no") === col("canon_line")).as("kept"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("lines_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`k` vocabulary
    * (count desc, token asc tiebreak — fully deterministic): the tokenizer
    * -coverage signal a vocab size decision reads. The vocabulary is one
    * map-side-combined token count + TakeOrdered (k rows to the driver —
    * model-sized by construction); scoring is a pure narrow pass over the
    * materialized token array (r4 HOF rule: the array is an attribute,
    * never an inlined split). Integer-exact rate ×10000. */
  final case class CompressionRow(doc_id: Long, raw_len: Long, gz_len: Long,
      ratio_x10000: Long)

  /** Compression-ratio quality signal (deflate level 6): highly
    * compressible text is repetitive/templated — the cheap boilerplate
    * detector (CCNet/RefinedWeb-family heuristic) that needs no model and
    * no corpus statistics. Runs through the typed mapPartitions seam
    * (justified: zlib has no Catalyst builtin) — per-row CPU in a narrow
    * pass, one Deflater reset-reused per partition. No SQL oracle (DuckDB
    * cannot deflate) → rows-only driver check; the planted-signal
    * ordering is spec-pinned. */
  def compressionRatio(docs: DataFrame): org.apache.spark.sql.Dataset[CompressionRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, false)
        val buf = new Array[Byte](8192)
        it.map { case (id, t) =>
          val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset(); d.setInput(bytes); d.finish()
          var gz = 0L
          while (!d.finished()) gz += d.deflate(buf)
          CompressionRow(id, bytes.length.toLong, gz,
            if (bytes.length == 0) 10000L else 10000L * gz / bytes.length)
        }
      }
  }

  def oovRate(docs: DataFrame, k: Int = 25): DataFrame = {
    val vocab = docs
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(k)
      .collect().map(_.getString(0)).toSeq.sorted
    val vLit = typedLit(vocab)
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n"),
        size(filter(col("tk"), t => !array_contains(vLit, t)))
          .cast("long").as("oov"))
      .withColumn("oov_x10000",
        ((lit(10000L) * col("oov")) / col("n")).cast("long"))
      .orderBy("doc_id")
  }

  /** BM25 top-k retrieval over the k=3-shingle index — the sparse-retrieval
    * operator of a data-curation stack (query-relevant corpus selection,
    * retrieval-based decontamination). Terms are shingles (phrase-ish
    * matching that survives the synthetic corpus's tiny word vocabulary);
    * the query is a deterministic probe — the 5 lexicographically-first
    * distinct shingles of doc 0 — so both engines rank the same terms.
    *
    * Scoring is Robertson–Spärck Jones BM25 (k1 = 1.2, b = 0.75) made
    * integer-exact: idf_bits = ilog2(N) − ilog2(df) (the [[tfidfTopK]]
    * surprisal trick), and the tf-saturation fraction
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) clears denominators with
    * avgdl = T/N to the all-integer form 22·T·tf / (10·T·tf + 3·T + 9·dl·N),
    * scaled ×10000 before one integer division per term. Headroom: the
    * widest product 22·10⁴·T·tf stays under 2⁶³ through corpus token counts
    * T ≈ 4·10¹³ — beyond that swap the score column to decimal(38,0).
    *
    * Scale shape: the broadcast query-term semi-join prunes the exploded
    * shingle stream BEFORE any aggregation (the inverted-index probe —
    * only postings for query terms ever shuffle); doc-frequency and the
    * corpus totals are map-side-combined aggs; the 1-row totals broadcast;
    * global top-k is TakeOrdered with the (score desc, doc_id) tie-break,
    * never a window. */
  def bm25TopK(corpus: DataFrame, k: Int = 10): DataFrame = {
    def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    // postings through the explode-first shingleRows shape (building the
    // shingle ARRAY in a projection re-evaluates the inlined split per
    // element access — the O(tokens²) interpreted-HOF trap)
    val sgRows = shingleRows(corpus).withColumnRenamed("shingle", "w")
    // N counts EVERY doc (shingle-less ones included); T counts postings
    val stats = corpus.agg(count(lit(1)).as("n"))
      .crossJoin(sgRows.agg(count(lit(1)).cast("long").as("tt")))
    val q = sgRows.filter(col("doc_id") === 0)
      .groupBy("doc_id")
      .agg(slice(array_sort(array_distinct(collect_list(col("w")))), 1, 5).as("qs"))
      .select(explode(col("qs")).as("w"))
    val dl = sgRows.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = sgRows
      .join(broadcast(q), "w")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "w").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        ((ilog2(col("n")) - ilog2(col("df"))) *
          expr("(10000L * 22L * tt * tf) div (10L * tt * tf + 3L * tt + 9L * dl * n)")).as("s"))
      .groupBy("doc_id").agg(sum("s").as("score_x10000"))
      .orderBy(col("score_x10000").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_x10000"))
  }

  /** Per-document character-collision diversity — the Simpson index
    * D = Σ cᵢ(cᵢ−1) / (n(n−1)) over the char histogram, reported as
    * diversity = 1 − D scaled ×10⁶ by integer division. This is the
    * exact-integer member of the entropy family (Rényi-2 entropy is
    * −log2 D): `log2` is libm-dependent and NOT bit-portable across
    * engines, so a Shannon-entropy double could never hash-match a DuckDB
    * oracle — collision probability carries the same curation signal
    * (low diversity = repeated-char boilerplate, high = natural text)
    * with every intermediate a BIGINT.
    *
    * Chars are Java `split("")` units = UTF-16 code units; identical to
    * DuckDB's per-codepoint split for BMP text (the corpus is checked
    * ASCII; astral input would diverge — documented, not defended).
    * Docs with n < 2 surface NULL diversity. Shape: one linear char
    * explode + two doc-keyed aggregates — token-stream scaling. */
  def charDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "") // Java split(limit=-1) keeps a trailing ""
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("distinct_chars"),
        sum(col("c") * (col("c") - 1)).as("coll_num"))
      .withColumn("coll_den", col("n") * (col("n") - 1))
      .withColumn("diversity_x1e6",
        when(col("n") >= 2,
          expr("((coll_den - coll_num) * 1000000L) div coll_den")))
      .select("doc_id", "n", "distinct_chars", "coll_num", "coll_den",
        "diversity_x1e6")
}
