package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 fifth continuation wave.
  *
  * The centerpiece is the CHARACTER-level dedup rung
  * ([[graft.ext.Dedup.levenshteinBlockPairs]]): blocked edit-distance
  * pairs, the keep-canonical composition, and the measured recall AND
  * precision counters over a planted single-edit corpus — typo/OCR noise
  * is the duplication mode the token-set rungs (MinHash / winnowing /
  * exact-Jaccard) see as ~identical shingle sets and the exact rung
  * misses entirely; a real curation pipeline runs both.
  *
  * Alongside: the join-key skew diagnostic every 100 TB engagement runs
  * before sizing a shuffle (frequency-of-frequencies over a foreign key),
  * and a robust second-order curation gate (per-source median + MAD of
  * doc length via two bounded-histogram passes — never a per-group value
  * buffer) with exact-integer outlier counts.
  */
object R9eQueries {
  import Synth.documents

  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ single-character-edited copies (every 20th doc, the
    * char at position 40 replaced by 'x') — the planted TYPO corpus the
    * levenshtein rung is graded on. +300000000 keeps the id space disjoint
    * from [[ExtQueries.dupCorpus]]'s +1e8/+2e8 plantings. The mutation is
    * SQL-expressible so the DuckDB twin rebuilds the identical corpus. */
  private[graft] def levCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 300000000).as("doc_id"),
        concat(substring(col("text"), 1, 39), lit("x"),
          expr("substring(text, 41)")).as("text")))
  }

  private[queries] val LevCorpusCte: String =
    """WITH lc AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000000, substr(text, 1, 39) || 'x' || substr(text, 41)
      |  FROM documents WHERE doc_id % 20 = 0)""".stripMargin

  /** The DuckDB twin of [[graft.ext.Dedup.levenshteinBlockPairs]] at the
    * default (sigLen=96, blockLen=16, maxDist=4, maxBlock=64) operating
    * point, as a `pairs` CTE chain over a corpus relation named `lc`. */
  private[queries] val LevPairsCtes: String =
    """sig0 AS (
      |  SELECT doc_id,
      |         substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |                1, 96) AS sig
      |  FROM lc),
      |sigt AS (SELECT doc_id, sig, CAST(length(sig) AS BIGINT) AS len
      |         FROM sig0),
      |keyed AS (
      |  SELECT doc_id, sig, len, 'p:' || substr(sig, 1, 16) AS bkey FROM sigt
      |  UNION ALL
      |  SELECT doc_id, sig, len, 's:' || right(sig, 16) AS bkey FROM sigt),
      |capped AS (
      |  SELECT doc_id, sig, len, bkey FROM (
      |    SELECT *, row_number() OVER (PARTITION BY bkey
      |                                 ORDER BY len, doc_id) AS rn
      |    FROM keyed) WHERE rn <= 64),
      |pairs AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb,
      |         CAST(min(levenshtein(a.sig, b.sig)) AS BIGINT) AS dist
      |  FROM capped a JOIN capped b
      |    ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      |   AND abs(a.len - b.len) <= 4
      |  WHERE levenshtein(a.sig, b.sig) <= 4
      |  GROUP BY 1, 2)""".stripMargin

  /** Blocked edit-distance fuzzy-dup pairs —
    * [[graft.ext.Dedup.levenshteinBlockPairs]]. */
  private val dedupLevBlock: Q = (s, dir) =>
    graft.ext.Dedup.levenshteinBlockPairs(levCorpus(s, dir))
      .orderBy("ida", "idb")

  /** Complete-dedup e2e over the edit-distance pairs: pairs → connected
    * components → one canonical doc per cluster + every unpaired doc (the
    * fourth keep-canonical rung, next to LSH, exact-Jaccard-prefix and
    * winnowing). */
  private val dedupKeepCanonicalLev: Q = (s, dir) => {
    val c = levCorpus(s, dir)
    graft.ext.Dedup.keepCanonical(c,
      graft.ext.Dedup.levenshteinBlockPairs(c).select("ida", "idb"))
      .orderBy("doc_id")
  }

  /** Measured recall AND precision counters of the levenshtein rung on
    * the planted typo corpus: `planted` copies, `detected` = planted ids
    * appearing in ≥1 pair (recall numerator), `pairs_total` emitted
    * pairs, `pairs_planted` = pairs that are exactly an (origin, typo
    * copy) planting (precision numerator). Organic lev≤4 signature pairs
    * in `pairs_total − pairs_planted` are not false positives per se —
    * the corpus genuinely contains near-identical texts — which is why
    * both counters are surfaced as data rather than folded into one
    * score. */
  private val dedupLevRecall: Q = (s, dir) => {
    val c = levCorpus(s, dir)
    val pairs = graft.ext.Dedup.levenshteinBlockPairs(c)
    val planted = c.filter(col("doc_id") >= 300000000).select("doc_id")
    val det = pairs.select(col("ida").as("doc_id"))
      .unionAll(pairs.select(col("idb").as("doc_id"))).distinct()
    planted.agg(count(lit(1)).as("planted"))
      .crossJoin(planted.join(det, "doc_id")
        .agg(count(lit(1)).as("detected")))
      .crossJoin(pairs.agg(count(lit(1)).as("pairs_total")))
      .crossJoin(pairs
        .filter(col("idb") - col("ida") === 300000000 && col("ida") % 20 === 0)
        .agg(count(lit(1)).as("pairs_planted")))
  }

  /** Join-key skew profile — the frequency-of-frequencies histogram over
    * a foreign key (orders.o_custkey), the diagnostic that sizes every
    * downstream shuffle decision (salting? AQE skew thresholds? broadcast
    * cut-off?). Two map-side-combined aggregates, both on healthy keys:
    * the first on the (high-cardinality) key itself, the second on the
    * (small-domain) frequency. Never a global sort, never a collect —
    * the profile is ≤ max-frequency rows however large the fact table. */
  private val qKeySkewProfile: Q = (s, dir) => {
    Synth.orders(s, dir).createOrReplaceTempView("graft_r9e_orders")
    s.sql("""
      WITH f AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS freq
        FROM graft_r9e_orders GROUP BY 1)
      SELECT freq, CAST(count(*) AS BIGINT) AS n_keys
      FROM f GROUP BY 1 ORDER BY freq""")
  }

  /** Robust per-source length gate: exact lower-median and MAD (median
    * absolute deviation) of n_chars via TWO bounded-histogram passes —
    * the q_median_histogram technique composed on itself (deviations are
    * a derived bounded domain), then an exact-integer count of docs
    * outside med ± 3·MAD. The robust twin of z-score outlier gating:
    * immune to the very outliers it hunts, and at 100 TB each pass is a
    * map-side-combined (source, value) count plus a window over ≤|domain|
    * rows per source — no per-group value buffering anywhere. */
  private val textMadOutliers: Q = (s, dir) => {
    documents(s, dir).createOrReplaceTempView("graft_r9e_docs")
    s.sql("""
      WITH hist AS (
        SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        FROM graft_r9e_docs GROUP BY 1, 2),
      cum AS (
        SELECT source, n_chars, c,
               sum(c) OVER (PARTITION BY source ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM hist),
      med AS (
        SELECT source, min(n_chars) AS med FROM cum
        WHERE cum * 2 >= n + 1 GROUP BY 1),
      dhist AS (
        SELECT d.source, abs(d.n_chars - m.med) AS dev,
               CAST(count(*) AS BIGINT) AS c
        FROM graft_r9e_docs d JOIN med m ON d.source = m.source
        GROUP BY 1, 2),
      dcum AS (
        SELECT source, dev, c,
               sum(c) OVER (PARTITION BY source ORDER BY dev
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM dhist),
      mad AS (
        SELECT source, min(dev) AS mad FROM dcum
        WHERE cum * 2 >= n + 1 GROUP BY 1)
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             min(m.med) AS med, min(a.mad) AS mad,
             CAST(sum(CASE WHEN abs(d.n_chars - m.med) > 3 * a.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM graft_r9e_docs d
      JOIN med m ON d.source = m.source
      JOIN mad a ON d.source = a.source
      GROUP BY d.source ORDER BY d.source""")
  }

  /** Recall-vs-nprobe operating curve —
    * [[graft.ext.Similarity.ivfNprobeCurve]]: hits@5 of multi-probe IVF
    * at nprobe ∈ {1,2,4,8} against the exact baseline, assign/probe/score
    * each done ONCE. The curve form of the single-point ann_recall
    * measurement — the dial a deployment tunes. */
  private val annNprobeCurve: Q = (s, dir) =>
    graft.ext.Similarity.ivfNprobeCurve(Synth.embeddings(s, dir),
      Synth.embeddings(s, dir).filter(col("vec_id") < 10), 5, Seq(1, 2, 4, 8))
      .orderBy("nprobe")

  /** TextRank keyword extraction (Mihalcea/Tarau EMNLP '04, the public
    * classic): PageRank over the word co-occurrence graph — an edge links
    * words ADJACENT anywhere in the corpus ≥ 3 times (undirected, so both
    * directions enter the directed PR), ranked by the SAME integer
    * fixed-point iteration as [[GraphQueries.pagerank]] (rank_e12 longs,
    * div-based damping — bit-replayable by the oracle, unlike any
    * floating-point PR). Top-20 by (rank desc, word). The text→graph→rank
    * composition exhibit: corpus keywording is what a curation pipeline
    * runs to label domains/topics cheaply. Scale: the graph is
    * vocabulary-sized (|V| = distinct words, |E| ≤ distinct adjacent
    * pairs), NOT corpus-sized — the heavy step is the one adjacency
    * count, a (pair)-keyed map-side-combined aggregate; the PR rounds run
    * on the small graph with the usual per-round lineage cuts. */
  private val textTextrank: Q = (s, dir) => {
    // adjacent-token pairs are ROW-LOCAL (bigram i = (t[i], t[i+1])):
    // zipping the token array against its own tail replaces the previous
    // posexplode + lead-window formulation, whose per-doc ordered window
    // re-shuffled and sorted the whole token stream just to look one
    // element ahead (guide §2.4: remove shuffles outright) — the codegen'd
    // slice/arrays_zip pair emits the identical (w, nxt) multiset
    val t = graft.ext.TextAnalysis.tokens(col("text"))
    val adj = documents(s, dir)
      .select(t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("z"))
      .select(col("z.0").as("w"), col("z.1").as("nxt"))
      .filter(col("w") =!= col("nxt"))
      .select(least(col("w"), col("nxt")).as("u"),
        greatest(col("w"), col("nxt")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
    val edges = adj.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(adj.select(col("v").as("src"), col("u").as("dst")))
    GraphQueries.pagerank(s, edges)
      .orderBy(col("rank_e12").desc, col("node"))
      .limit(20)
      .select(col("node").as("word"), col("rank_e12"))
  }

  /** Kneser–Ney smoothed bigram LM table (Kneser/Ney ICASSP '95, the
    * classic n-gram smoothing) in EXACT RATIONALS — the smoothing rung
    * above the corpus-trained MLE unigram/bigram surprisal keys. With
    * discount d = 3/4,
    *   P(w2|w1) = max(c12 − 3/4, 0)/c1 + (3/4)·(N1+(w1·)/c1)·(N1+(·w2)/N1+(··))
    * multiplied through by 4·c1·N1+(··) gives the integer pair
    *   num = max(4·c12 − 3, 0)·Ntot + 3·n1p_w1·ncont_w2,  den = 4·c1·Ntot
    * — both BIGINT-exact (num < 4·c12·Ntot ≈ 4·10¹⁷ even at c12 ~ 10⁹
    * bigram tokens over 10⁸ bigram types), so the smoothed LM is
    * hash-checkable where any log-space perplexity never could be
    * (libm). Emitted for the top-100 bigrams by count. The continuation
    * counts are the KN insight: P_cont ranks w2 by how many DISTINCT
    * contexts it follows, not raw frequency — 'francisco' is frequent
    * but only ever follows 'san'.
    *
    * Scale: one corpus-sized (pair)-keyed count (map-side combined),
    * three vocabulary-sized aggregates derived from it, broadcast-sized
    * joins back. Ntot is a driver-free scalar carried by a 1-row cross
    * join. */
  private val textKneserNey: Q = (s, dir) => {
    documents(s, dir).createOrReplaceTempView("graft_r9e_kn_docs")
    s.sql("""
      WITH toks AS (
        SELECT doc_id, posexplode(split(text, '\\s+')) AS (pos, w)
        FROM graft_r9e_kn_docs),
      big AS (
        SELECT doc_id, w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks),
      c AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2),
      ctx AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p
        FROM c GROUP BY 1),
      cont AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM c GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM c)
      SELECT c.w1, c.w2, c.c12,
             greatest(4 * c.c12 - 3, 0) * t.ntot
               + 3 * x.n1p * o.ncont AS num,
             4 * x.c1 * t.ntot AS den
      FROM c
      JOIN ctx x ON c.w1 = x.w1
      JOIN cont o ON c.w2 = o.w2
      CROSS JOIN tot t
      ORDER BY c.c12 DESC, c.w1, c.w2 LIMIT 100""")
  }

  /** LSH band-count RECALL curve — the accuracy half of the band
    * operating picture whose COST half is the existing
    * `dedup_band_sweep` (candidate volume + verified yield per config):
    * planted-duplicate detection of the 32-hash MinHash pipeline at
    * bands ∈ {2, 4, 8} (rows/band 16, 8, 4 — collision threshold
    * t ≈ (1/b)^(1/r) ≈ 0.96 / 0.84 / 0.59). Together the two keys are
    * the table a 100 TB dedup run tunes on: recall climbs (31→42→45/45
    * at sf0.001) as candidates grow; the deployment picks the knee. The
    * S-curve sibling of [[annNprobeCurve]] on the dedup side. Output:
    * (bands, planted, detected) under the same exact-Jaccard ≥ 0.5
    * verification as the production rung. */
  private val dedupLshBandCurve: Q = (s, dir) => {
    val c = ExtQueries.dupCorpus(s, dir)
    val planted = c.filter(col("doc_id") >= 100000000).select("doc_id")
    Seq(2, 4, 8).map { b =>
      val p = graft.ext.Dedup.minhashLshPairs(c, 32, b)
      val det = p.select(col("ida").as("doc_id"))
        .unionAll(p.select(col("idb").as("doc_id"))).distinct()
      planted.agg(count(lit(1)).as("planted"))
        .crossJoin(planted.join(det, "doc_id")
          .agg(count(lit(1)).as("detected")))
        .select(lit(b.toLong).as("bands"), col("planted"), col("detected"))
    }.reduce(_ unionAll _).orderBy("bands")
  }

  /** b-bit minwise hashing (Li & König CACM '11) — the storage-optimal
    * end of the signature ladder, with its estimation error MEASURED: a
    * b-bit minhash keeps only the lowest b bits of each of the 32 hashes
    * (32 bits total at b=1 — a 60x compression of the 60-bit family),
    * and the match fraction m/32 estimates J through the bias correction
    * Ĵ = (m/32 − 2⁻ᵇ)/(1 − 2⁻ᵇ), here in exact integers
    * est = max(0, (m·2ᵇ − 32)·10⁴ div (32·(2ᵇ−1))). Per planted
    * (origin, suffixed-twin) pair: the exact Jaccard next to the b=1/2/4
    * estimates — the storage/accuracy trade as data, beside
    * dedup_minhash_jaccard_est's full-width fidelity row. One signature
    * chain over origins ∪ twins, matched by a self-join on the planted
    * id offset. */
  private val dedupBbitMinhash: Q = (s, dir) => {
    import graft.ext.{Dedup, TextAnalysis}
    val origins = documents(s, dir).filter(col("doc_id") % 20 === 0)
      .select("doc_id", "text")
    val both = origins.unionAll(origins.select(
      (col("doc_id") + 100000000).as("doc_id"),
      concat(col("text"), lit(" almost identical suffix tokens")).as("text")))
    val sigs = TextAnalysis.minhashSignatureRows(both, 32)
    val twin = sigs.select(
      col("doc_id") +: (0 until 32).map(i => col(s"h$i").as(s"g$i")): _*)
      .withColumn("doc_id", col("doc_id") - 100000000)
    def m(b: Int) = (0 until 32).map(i =>
      when(col(s"h$i") % (1L << b) === col(s"g$i") % (1L << b), 1L)
        .otherwise(0L)).reduce(_ + _)
    def est(mc: String, b: Int) = expr(
      s"greatest(0L, (($mc * ${1L << b} - 32) * 10000) div ${32L * ((1L << b) - 1)})")
    val exact = origins.select(col("doc_id"),
      Dedup.jaccardX10000(
        TextAnalysis.tokens(col("text")),
        TextAnalysis.tokens(concat(col("text"),
          lit(" almost identical suffix tokens")))).as("jacc_x10000"))
    sigs.filter(col("doc_id") < 100000000).join(twin, "doc_id")
      .select(col("doc_id"), m(1).as("m1"), m(2).as("m2"), m(4).as("m4"))
      .select(col("doc_id"), col("m1"), est("m1", 1).as("est1_x10000"),
        col("m2"), est("m2", 2).as("est2_x10000"),
        col("m4"), est("m4", 4).as("est4_x10000"))
      .join(exact, "doc_id")
      .orderBy("doc_id")
  }

  /** MATTR — moving-average type-token ratio (Covington & McFall, JQL
    * 2010): mean distinct-token count over every sliding 25-token window,
    * ×10⁶ by integer division. THE length-robust lexical-diversity
    * signal: plain TTR falls mechanically with document length (types
    * saturate while tokens grow), so a TTR quality gate silently biases
    * against long documents — MATTR's fixed window removes the length
    * confound. Complements the entropy-family char diversity and the
    * corpus-level Heaps curve. Row-local HOF over the token array
    * (windows per doc ≤ len − W + 1, each a bounded slice) — zero
    * shuffles beyond the per-source rollup; docs shorter than the window
    * emit their plain distinct count (the standard MATTR fallback). */
  private val textMattr: Q = (s, dir) => {
    documents(s, dir).createOrReplaceTempView("graft_r9e_mattr_docs")
    s.sql("""
      WITH toks AS (
        SELECT doc_id, source, split(text, '\\s+') AS t
        FROM graft_r9e_mattr_docs),
      win AS (
        SELECT doc_id, source,
          CASE WHEN size(t) <= 25 THEN size(array_distinct(t))
               ELSE aggregate(sequence(1, size(t) - 24),
                      0L, (acc, i) -> acc + size(array_distinct(slice(t, i, 25))))
          END AS sum_distinct,
          CASE WHEN size(t) <= 25 THEN size(t)
               ELSE 25 * (size(t) - 24) END AS denom
        FROM toks WHERE size(t) > 0)
      SELECT doc_id, source,
             CAST(1000000 * sum_distinct AS BIGINT) div denom AS mattr_x1e6
      FROM win ORDER BY doc_id""")
  }

  val queries: Map[String, Q] = Map(
    "text_mattr" -> textMattr,
    "dedup_bbit_minhash" -> dedupBbitMinhash,
    "dedup_lsh_band_curve" -> dedupLshBandCurve,
    "text_kneser_ney_bigram" -> textKneserNey,
    "text_textrank_keywords" -> textTextrank,
    "dedup_levenshtein_block" -> dedupLevBlock,
    "dedup_lev_cap_audit" -> ((s, dir) =>
      graft.ext.Dedup.levCapAudit(levCorpus(s, dir))),
    "dedup_keep_canonical_lev" -> dedupKeepCanonicalLev,
    "dedup_lev_recall" -> dedupLevRecall,
    "q_key_skew_profile" -> qKeySkewProfile,
    "text_mad_outliers" -> textMadOutliers,
    "ann_nprobe_curve" -> annNprobeCurve)

  /** One unrolled integer-fixed-point PR round over the word graph —
    * identical arithmetic to [[GraphQueries]]' prOracle (rank_e12 longs,
    * // damping) so the replay is bit-exact. */
  private def trIter(k: Int): String =
    s"""r$k AS MATERIALIZED (
       |  SELECT n0.node,
       |    (15 * 1000000000000::BIGINT // 100) // (SELECT count(*) FROM n0)
       |      + (85 * coalesce(s.c, 0)) // 100 AS rank_e12
       |  FROM n0 LEFT JOIN (
       |    SELECT e.dst AS node,
       |           CAST(sum(r.rank_e12 // d.out_deg) AS BIGINT) AS c
       |    FROM e JOIN r${k - 1} r ON r.node = e.src
       |           JOIN od d ON d.node = e.src
       |    GROUP BY e.dst) s USING (node))""".stripMargin

  private val TextrankOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
       |  FROM documents),
       |prs AS (
       |  SELECT unnest(list_transform(range(1, len(t)),
       |    i -> {'u': least(t[i], t[i+1]), 'v': greatest(t[i], t[i+1])})) AS p
       |  FROM toks WHERE len(t) >= 2),
       |adj AS (
       |  SELECT (p).u AS u, (p).v AS v FROM prs WHERE (p).u <> (p).v
       |  GROUP BY 1, 2 HAVING count(*) >= 3),
       |e AS (SELECT u AS src, v AS dst FROM adj
       |      UNION ALL SELECT v, u FROM adj),
       |n0 AS (SELECT DISTINCT src AS node FROM e
       |       UNION SELECT DISTINCT dst FROM e),
       |od AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
       |r0 AS (SELECT node,
       |         1000000000000::BIGINT // (SELECT count(*) FROM n0) AS rank_e12
       |       FROM n0),
       |${(1 to 5).map(trIter).mkString(",\n")}
       |SELECT node AS word, CAST(rank_e12 AS BIGINT) AS rank_e12
       |FROM r5 ORDER BY rank_e12 DESC, node LIMIT 20""".stripMargin

  /** Parametric banding over the shared `sigl` signatures: bands of
    * 32/b rows, candidate = any same-band bucket collision, detection
    * under exact-Jaccard ≥ 0.5 — one CTE chain per curve point. */
  private def lshBandPoint(b: Int): String = {
    val rows = 32 / b
    s"""bands$b AS (SELECT doc_id, b,
       |  md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
       |  FROM sigl, range(0,$b) r(b)),
       |cand$b AS (SELECT DISTINCT a.doc_id AS ida, c.doc_id AS idb
       |  FROM bands$b a JOIN bands$b c ON a.b = c.b AND a.bucket = c.bucket
       |  WHERE a.doc_id < c.doc_id),
       |ver$b AS (SELECT ida, idb FROM cand$b
       |  JOIN ts x ON ida = x.doc_id JOIN ts y ON idb = y.doc_id
       |  WHERE 10000 * len(list_distinct(list_intersect(x.t, y.t)))
       |    // (len(x.t) + len(y.t) - len(list_distinct(list_intersect(x.t, y.t)))) >= 5000),
       |det$b AS (SELECT DISTINCT doc_id FROM (
       |  SELECT ida AS doc_id FROM ver$b UNION ALL SELECT idb FROM ver$b))""".stripMargin
  }

  private val LshBandCurveOracle: String =
    s"""${ExtQueries.CorpusCte},
       |${ExtQueries.MinhashSigCtes},
       |ts AS (SELECT doc_id,
       |  list_distinct(regexp_split_to_array(text, '\\s+')) AS t
       |  FROM corpus),
       |pl AS (SELECT doc_id FROM corpus WHERE doc_id >= 100000000),
       |${Seq(2, 4, 8).map(lshBandPoint).mkString(",\n")}
       |${Seq(2, 4, 8).map(b =>
          s"""SELECT CAST($b AS BIGINT) AS bands,
             |  (SELECT CAST(count(*) AS BIGINT) FROM pl) AS planted,
             |  (SELECT CAST(count(*) AS BIGINT)
             |   FROM pl JOIN det$b ON pl.doc_id = det$b.doc_id) AS detected""".stripMargin)
         .mkString("\nUNION ALL\n")}
       |ORDER BY bands""".stripMargin

  private def bbitMatchSql(b: Int): String = {
    val mod = 1L << b
    (0 until 32).map(i =>
      s"CASE WHEN a.h$i % $mod = t.h$i % $mod THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
  }

  private def bbitEstSql(mc: String, b: Int): String =
    s"greatest(0, (($mc * ${1L << b} - 32) * 10000) // ${32L * ((1L << b) - 1)})"

  private val BbitMinhashOracle: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
       |  UNION ALL
       |  SELECT doc_id + 100000000, text || ' almost identical suffix tokens'
       |  FROM documents WHERE doc_id % 20 = 0),
       |${ExtQueries.MinhashSigCtes},
       |ts AS (SELECT doc_id,
       |  list_distinct(regexp_split_to_array(text, '\\s+')) AS t
       |  FROM corpus),
       |mm AS (
       |  SELECT a.doc_id,
       |    CAST(${bbitMatchSql(1)} AS BIGINT) AS m1,
       |    CAST(${bbitMatchSql(2)} AS BIGINT) AS m2,
       |    CAST(${bbitMatchSql(4)} AS BIGINT) AS m4
       |  FROM sigs a JOIN sigs t ON t.doc_id = a.doc_id + 100000000),
       |ex AS (
       |  SELECT x.doc_id,
       |    10000 * len(list_distinct(list_intersect(x.t, y.t)))
       |      // (len(x.t) + len(y.t)
       |          - len(list_distinct(list_intersect(x.t, y.t)))) AS jacc_x10000
       |  FROM ts x JOIN ts y ON y.doc_id = x.doc_id + 100000000)
       |SELECT mm.doc_id, mm.m1,
       |  CAST(${bbitEstSql("mm.m1", 1)} AS BIGINT) AS est1_x10000,
       |  mm.m2, CAST(${bbitEstSql("mm.m2", 2)} AS BIGINT) AS est2_x10000,
       |  mm.m4, CAST(${bbitEstSql("mm.m4", 4)} AS BIGINT) AS est4_x10000,
       |  CAST(ex.jacc_x10000 AS BIGINT) AS jacc_x10000
       |FROM mm JOIN ex ON mm.doc_id = ex.doc_id
       |ORDER BY mm.doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_mattr" ->
      """WITH toks AS (
        |  SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, source,
        |    CASE WHEN len(t) <= 25 THEN len(list_distinct(t))
        |         ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                list_transform(range(1, len(t) - 23),
        |                  i -> CAST(len(list_distinct(t[i:i+24])) AS BIGINT))),
        |              (acc, x) -> acc + x)
        |    END AS sum_distinct,
        |    CASE WHEN len(t) <= 25 THEN len(t)
        |         ELSE 25 * (len(t) - 24) END AS denom
        |  FROM toks WHERE len(t) > 0)
        |SELECT doc_id, source,
        |       CAST(1000000 * sum_distinct // denom AS BIGINT) AS mattr_x1e6
        |FROM win ORDER BY doc_id""".stripMargin,

    "dedup_bbit_minhash" -> BbitMinhashOracle,
    "dedup_lsh_band_curve" -> LshBandCurveOracle,
    "text_kneser_ney_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
        |  FROM documents),
        |big AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> {'w1': t[i], 'w2': t[i+1]})) AS p
        |  FROM toks WHERE len(t) >= 2),
        |c AS (
        |  SELECT (p).w1 AS w1, (p).w2 AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM big GROUP BY 1, 2),
        |ctx AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |         CAST(count(*) AS BIGINT) AS n1p
        |  FROM c GROUP BY 1),
        |cont AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM c GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM c)
        |SELECT c.w1, c.w2, c.c12,
        |       CAST(greatest(4 * c.c12 - 3, 0) * t.ntot
        |         + 3 * x.n1p * o.ncont AS BIGINT) AS num,
        |       CAST(4 * x.c1 * t.ntot AS BIGINT) AS den
        |FROM c
        |JOIN ctx x ON c.w1 = x.w1
        |JOIN cont o ON c.w2 = o.w2
        |CROSS JOIN tot t
        |ORDER BY c.c12 DESC, c.w1, c.w2 LIMIT 100""".stripMargin,

    "text_textrank_keywords" -> TextrankOracle,
    "dedup_levenshtein_block" ->
      s"""$LevCorpusCte,
         |$LevPairsCtes
         |SELECT ida, idb, dist FROM pairs ORDER BY ida, idb""".stripMargin,

    // the maxBlock cap's receipt: per-block population + admitted +
    // truncation + dropped count over the same signature/block chain as
    // the pairs key (cap-free at every oracle SF — max block 63 at sf1)
    "dedup_lev_cap_audit" ->
      s"""$LevCorpusCte,
         |sig0 AS (
         |  SELECT doc_id,
         |         substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
         |                1, 96) AS sig
         |  FROM lc),
         |keyed AS (
         |  SELECT doc_id, 'p:' || substr(sig, 1, 16) AS bkey FROM sig0
         |  UNION ALL
         |  SELECT doc_id, 's:' || right(sig, 16) AS bkey FROM sig0)
         |SELECT bkey, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(least(count(*), 64) AS BIGINT) AS admitted,
         |  count(*) > 64 AS truncated,
         |  CAST(greatest(count(*) - 64, 0) AS BIGINT) AS docs_dropped
         |FROM keyed GROUP BY bkey ORDER BY bkey""".stripMargin,

    "dedup_keep_canonical_lev" ->
      s"""WITH RECURSIVE lc AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 300000000, substr(text, 1, 39) || 'x' || substr(text, 41)
         |  FROM documents WHERE doc_id % 20 = 0),
         |$LevPairsCtes,
         |edges AS (SELECT ida AS a, idb AS b FROM pairs
         |          UNION SELECT idb, ida FROM pairs),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT v AS doc_id, min(r) AS comp FROM reach GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster
         |FROM lc d LEFT JOIN comp c ON d.doc_id = c.doc_id
         |WHERE c.comp IS NULL OR c.comp = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dedup_lev_recall" ->
      s"""$LevCorpusCte,
         |$LevPairsCtes,
         |det AS (SELECT DISTINCT doc_id FROM (
         |  SELECT ida AS doc_id FROM pairs
         |  UNION ALL SELECT idb FROM pairs)),
         |pl AS (SELECT doc_id FROM lc WHERE doc_id >= 300000000)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM pl) AS planted,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM pl JOIN det ON pl.doc_id = det.doc_id) AS detected,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS pairs_total,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pairs
         |   WHERE idb - ida = 300000000 AND ida % 20 = 0) AS pairs_planted""".stripMargin,

    // the DuckDB twin replays assignment/probing/scoring at the widest
    // probe set with the probe rank kept, then ranks each curve point
    // from the shared scored table — the same one-pass discipline as the
    // Spark side; LEFT JOIN from the curve axis so a zero-hit operating
    // point still emits its row (Spark's global agg always returns one)
    "ann_nprobe_curve" -> {
      import ExtQueries.cosSql
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
         |  SELECT q_id, qe, ivf_cell, CAST(rn AS BIGINT) AS pr FROM (
         |    SELECT e.vec_id AS q_id, e.embedding AS qe, r.cell AS ivf_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "r.rep")} DESC, r.cell) AS rn
         |    FROM embeddings e, reps r WHERE e.vec_id < 10) WHERE rn <= 8),
         |scored AS (
         |  SELECT q_id, pr, e.vec_id AS n_id,
         |         ${cosSql("qe", "e.embedding")} AS sim
         |  FROM assigned e JOIN qprobe q USING (ivf_cell)
         |  WHERE e.vec_id <> q.q_id),
         |exact AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
         |    FROM embeddings q, embeddings e
         |    WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id) WHERE rank <= 5),
         |curve AS (SELECT unnest([1, 2, 4, 8]) AS np),
         |ranked AS (
         |  SELECT np, q_id, n_id FROM (
         |    SELECT c.np, s.q_id, s.n_id,
         |      row_number() OVER (PARTITION BY c.np, s.q_id
         |        ORDER BY s.sim DESC, s.n_id) AS rank
         |    FROM curve c JOIN scored s ON s.pr <= c.np) WHERE rank <= 5),
         |pts AS (
         |  SELECT np, CAST(count(*) AS BIGINT) AS hits
         |  FROM ranked r JOIN exact e USING (q_id, n_id) GROUP BY 1)
         |SELECT CAST(c.np AS BIGINT) AS nprobe,
         |       CAST(coalesce(p.hits, 0) AS BIGINT) AS hits
         |FROM curve c LEFT JOIN pts p ON c.np = p.np
         |ORDER BY nprobe""".stripMargin
    },

    "q_key_skew_profile" ->
      """WITH f AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS freq
        |  FROM orders GROUP BY 1)
        |SELECT freq, CAST(count(*) AS BIGINT) AS n_keys
        |FROM f GROUP BY 1 ORDER BY freq""".stripMargin,

    "text_mad_outliers" ->
      """WITH hist AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, n_chars, c,
        |         sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(c) OVER (PARTITION BY source) AS n
        |  FROM hist),
        |med AS (
        |  SELECT source, min(n_chars) AS med FROM cum
        |  WHERE cum * 2 >= n + 1 GROUP BY 1),
        |dhist AS (
        |  SELECT d.source, abs(d.n_chars - m.med) AS dev,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM documents d JOIN med m ON d.source = m.source
        |  GROUP BY 1, 2),
        |dcum AS (
        |  SELECT source, dev, c,
        |         sum(c) OVER (PARTITION BY source ORDER BY dev
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(c) OVER (PARTITION BY source) AS n
        |  FROM dhist),
        |mad AS (
        |  SELECT source, min(dev) AS mad FROM dcum
        |  WHERE cum * 2 >= n + 1 GROUP BY 1)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(m.med) AS med, min(a.mad) AS mad,
        |       CAST(sum(CASE WHEN abs(d.n_chars - m.med) > 3 * a.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM documents d
        |JOIN med m ON d.source = m.source
        |JOIN mad a ON d.source = a.source
        |GROUP BY d.source ORDER BY d.source""".stripMargin)
}
